package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{TextAnalysis, TextIndex}

/** Pins the persisted-inverted-index store contracts behind q113/q117/q118
  * (the score agreement itself is those oracles' job): pruned
  * O(query-terms) postings reads with a planted positive, append ≡ rebuild
  * including the summed stats increments, crash-replay idempotence of
  * appends and ingest batches, tombstone-delete semantics, and
  * compaction ≡ rebuild with O(dirs) files afterward. */
class TextIndexSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private def freshDir(): String =
    Files.createTempDirectory("graft-textindex-spec").toString

  private def results(dir: String): Seq[Seq[Any]] =
    TextIndex.search(spark, dir, TextAnalysis.Bm25QueryTerms, 10)
      .collect().map(_.toSeq).toSeq

  test("search reads only the query terms' postings partitions (planted positive)") {
    val dir = freshDir()
    TextIndex.write(docs, dir)
    val all = spark.read.parquet(s"$dir/postings")
    assert(all.select(col("pfx")).distinct().count() > 4,
      "tokens collapsed into <=4 prefixes — pruning assertion would be vacuous")

    // search's own posts frame hides its file lineage once the shared
    // persist kicks in (InMemoryRelation), so inspect the IDENTICAL
    // readPruned call search issues for these terms
    val wantPfx = TextAnalysis.Bm25QueryTerms
      .map(t => "h" + org.apache.commons.codec.digest.DigestUtils
        .md5Hex(t).substring(0, TextIndex.PfxLen)).toSet
    val pruned = graft.dedup.LshIndex.readPruned(
      spark, s"$dir/postings", "pfx", wantPfx.toSeq)
    val read = pruned.inputFiles.toSet
    assert(read.nonEmpty, "planted positive: no postings file in the scan")
    assert(read.forall(f => wantPfx.exists(p => f.contains(s"/pfx=$p/"))),
      s"scan leaked outside the query prefixes $wantPfx: $read")
    assert(read.size < all.inputFiles.length,
      "pruning read every partition — the detector is vacuous")
    // and the pruned slice really is what search consumes: its term rows
    // match the full table's (nothing a pruned-out partition held is used)
    val full = all.filter(col("tok").isin(TextAnalysis.Bm25QueryTerms: _*))
      .select(col("doc_id"), col("tok"), col("tf")).collect().map(_.toSeq).toSet
    val slim = pruned.filter(col("tok").isin(TextAnalysis.Bm25QueryTerms: _*))
      .select(col("doc_id"), col("tok"), col("tf")).collect().map(_.toSeq).toSet
    assert(full == slim && full.nonEmpty)
  }

  test("append == rebuild: postings rows, doc lengths, and the summed stats") {
    val dir = freshDir()
    TextIndex.write(docs.filter(col("doc_id") % 5 =!= 0), dir)
    TextIndex.append(docs.filter(col("doc_id") % 5 === 0), dir, "b1")
    val dir2 = freshDir()
    TextIndex.write(docs, dir2)
    def posts(d: String) = spark.read.parquet(s"$d/postings")
      .select(col("doc_id"), col("tok"), col("tf")).collect()
      .map(_.toSeq).toSet
    assert(posts(dir) == posts(dir2))
    assert(TextIndex.readStats(spark, dir) == TextIndex.readStats(spark, dir2),
      "incremental stats drifted from a rebuild's counts")
    // and the search result through the appended store equals the one-shot
    // corpus pass (same integers -> same micro scores)
    val viaIndex = results(dir)
    val direct = TextAnalysis.bm25TopK(docs, TextAnalysis.Bm25QueryTerms, 10)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex == direct)
    assert(viaIndex.nonEmpty, "vacuous: no document matched the query terms")
  }

  test("crash replay: a re-run append (same tag) converges to the clean state") {
    val clean = freshDir()
    TextIndex.write(docs, clean)
    val dir = freshDir()
    TextIndex.write(docs.filter(col("doc_id") % 5 =!= 0), dir)
    // the torn-append replay: the batch landed once (marker missing), the
    // caller re-runs it wholesale under the SAME tag
    TextIndex.append(docs.filter(col("doc_id") % 5 === 0), dir, "b1")
    TextIndex.append(docs.filter(col("doc_id") % 5 === 0), dir, "b1")
    // physical duplicates exist (planted positive for the dedup reads)...
    val dupRows = spark.read.parquet(s"$dir/postings")
      .groupBy(col("doc_id"), col("tok")).count()
      .filter(col("count") > 1).count()
    assert(dupRows > 0, "replay left no duplicate rows — tolerance untested")
    // ...but stats and every search result match the clean store
    assert(TextIndex.readStats(spark, dir) ==
      TextIndex.readStats(spark, clean))
    assert(results(dir) == results(clean))
  }

  test("ingestBatch is exactly-once: a marker-complete replay is a no-op") {
    val root = freshDir()
    TextIndex.create(spark, s"$root/index")
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    TextIndex.ingestBatch(spark, root, b0, 0L)
    val once = spark.read.parquet(s"$root/out/batch=0").collect()
      .map(_.toSeq).toSet
    val statsOnce = TextIndex.readStats(spark, s"$root/index")
    // full replay with the marker present: wholesale skip
    TextIndex.ingestBatch(spark, root, b0, 0L)
    assert(TextIndex.readStats(spark, s"$root/index") == statsOnce)
    assert(spark.read.parquet(s"$root/out/batch=0").collect()
      .map(_.toSeq).toSet == once)
    // marker-less replay (crash after apply, before marker): converges
    StoreMaintAccess.deleteMarker(spark, s"$root/applied/0")
    TextIndex.ingestBatch(spark, root, b0, 0L)
    assert(TextIndex.readStats(spark, s"$root/index") == statsOnce)
    assert(spark.read.parquet(s"$root/out/batch=0").collect()
      .map(_.toSeq).toSet == once)
  }

  test("delete: tombstoned docs stop matching, stats shrink to rebuild values") {
    val dir = freshDir()
    TextIndex.write(docs, dir)
    val before = results(dir)
    // plant the positive: delete the current TOP result
    val topDoc = before.head.head.asInstanceOf[Long]
    TextIndex.delete(spark, dir,
      spark.range(topDoc, topDoc + 1).select(col("id").as("doc_id")), "d1")
    val after = results(dir)
    assert(before.exists(_.head == topDoc))
    assert(!after.exists(_.head == topDoc), "deleted doc still matches")
    // stats == rebuild-without-it
    val rebuilt = freshDir()
    TextIndex.write(docs.filter(col("doc_id") =!= topDoc), rebuilt)
    assert(TextIndex.readStats(spark, dir) ==
      TextIndex.readStats(spark, rebuilt))
    assert(after == results(rebuilt),
      "post-delete search drifted from the rebuild-without-deleted")
    // replaying the SAME delete tag converges; a SECOND tag for an
    // already-deleted doc must not double-subtract
    TextIndex.delete(spark, dir,
      spark.range(topDoc, topDoc + 1).select(col("id").as("doc_id")), "d1")
    assert(TextIndex.readStats(spark, dir) ==
      TextIndex.readStats(spark, rebuilt))
    TextIndex.delete(spark, dir,
      spark.range(topDoc, topDoc + 1).select(col("id").as("doc_id")), "d2")
    assert(TextIndex.readStats(spark, dir) ==
      TextIndex.readStats(spark, rebuilt))
    assert(results(dir) == results(rebuilt))
  }

  test("compact == rebuild-without-deleted, with O(dirs) files afterward") {
    val dir = freshDir()
    TextIndex.write(docs.filter(col("doc_id") % 3 === 0), dir)
    TextIndex.append(docs.filter(col("doc_id") % 3 === 1), dir, "b1")
    TextIndex.append(docs.filter(col("doc_id") % 3 === 2), dir, "b2")
    TextIndex.delete(spark, dir,
      docs.select(col("doc_id")).filter(col("doc_id") % 7 === 3), "d1")
    val preCompact = results(dir)
    TextIndex.compact(spark, dir)
    val rebuilt = freshDir()
    TextIndex.write(docs.filter(col("doc_id") % 7 =!= 3), rebuilt)
    assert(results(dir) == preCompact,
      "compaction changed the search result")
    assert(results(dir) == results(rebuilt))
    assert(TextIndex.readStats(spark, dir) ==
      TextIndex.readStats(spark, rebuilt),
      "compaction's recomputed stats differ from the rebuild")
    // file growth collapsed: one file per partition dir
    val perDir = spark.read.parquet(s"$dir/postings").inputFiles
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perDir.nonEmpty && perDir.forall(_._2.length == 1),
      s"a compacted dir still holds multiple files: " +
        perDir.filter(_._2.length > 1).keys.toSeq.sorted.take(3))
    // tombstones physically purged, dir dropped
    assert(spark.read.parquet(s"$dir/dlen")
      .filter(col("doc_id") % 7 === 3).count() == 0)
    assert(!StoreMaintAccess.exists(spark, s"$dir/tombstones"))
  }

  test("compaction interleaves with the ingest loop (the every-Nth-batch deployment recipe)") {
    val plain = freshDir()
    TextIndex.create(spark, s"$plain/index")
    val compacted = freshDir()
    TextIndex.create(spark, s"$compacted/index")
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    TextIndex.ingestBatch(spark, plain, b0, 0L)
    TextIndex.ingestBatch(spark, plain, b1, 1L)
    TextIndex.ingestBatch(spark, compacted, b0, 0L)
    TextIndex.compact(spark, s"$compacted/index") // between micro-batches
    TextIndex.ingestBatch(spark, compacted, b1, 1L)
    def outs(root: String) = spark.read.parquet(s"$root/out")
      .select(col("batch").cast("long"), col("doc_id"), col("score"),
        col("rnk")).collect().map(_.toSeq).toSet
    assert(outs(plain) == outs(compacted),
      "a mid-loop compaction changed the per-batch search results")
    assert(TextIndex.readStats(spark, s"$plain/index") ==
      TextIndex.readStats(spark, s"$compacted/index"))
  }

  test("layout knobs are a pinned contract: pfxLen=2/docPfxMod=64 store answers identically") {
    val dir = freshDir()
    TextIndex.write(docs, dir, pfxLen = 2, docPfxMod = 64L)
    // the layout really took: 2-hex-char dirs, 64-mod dlen dirs
    val pfxVals = spark.read.parquet(s"$dir/postings")
      .select(col("pfx")).distinct().collect().map(_.getString(0))
    assert(pfxVals.forall(_.length == 3), // "h" + 2 hex chars
      s"pfx dirs ignore the pinned pfxLen: ${pfxVals.take(3).toSeq}")
    val dpfxMax = spark.read.parquet(s"$dir/dlen")
      .agg(max(col("dpfx").cast("long"))).head().getLong(0)
    assert(dpfxMax >= 16L, "docPfxMod=64 never exceeded the default's range " +
      "— knob not applied (or corpus too small to witness it)")
    // append + delete + search all follow the PIN, not the defaults
    val deflt = freshDir()
    TextIndex.write(docs, deflt)
    assert(results(dir) == results(deflt))
    TextIndex.delete(spark, dir,
      docs.select(col("doc_id")).filter(col("doc_id") % 7 === 3), "d1")
    TextIndex.delete(spark, deflt,
      docs.select(col("doc_id")).filter(col("doc_id") % 7 === 3), "d1")
    assert(results(dir) == results(deflt))
    assert(TextIndex.readStats(spark, dir) ==
      TextIndex.readStats(spark, deflt))
  }
}

/** Test-side FS helpers (the specs must not depend on store internals). */
object StoreMaintAccess {
  import org.apache.hadoop.fs.Path
  def exists(s: org.apache.spark.sql.SparkSession, p: String): Boolean = {
    val hp = new Path(p)
    hp.getFileSystem(s.sessionState.newHadoopConf()).exists(hp)
  }
  def deleteMarker(s: org.apache.spark.sql.SparkSession, p: String): Unit = {
    val hp = new Path(p)
    hp.getFileSystem(s.sessionState.newHadoopConf()).delete(hp, false)
    ()
  }
}
