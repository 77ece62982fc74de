package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, LshIndex}

/** Pins the persisted-LSH-index contracts behind q106: semantic equivalence
  * with the one-shot pipeline, O(touched-partition) reads (with a planted
  * positive so the detector can't be vacuous), append ≡ rebuild, and the
  * end-to-end incremental-ingest loop.
  */
class LshIndexSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private def freshDirs(): (String, String) = {
    val root = Files.createTempDirectory("graft-lshindex-spec").toString
    (s"$root/idx", s"$root/feat")
  }

  test("dedupAgainst == the one-shot LSH pipeline restricted to (batch <- corpus|earlier batch)") {
    val (idxDir, featDir) = freshDirs()
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    val batch = docs.filter(col("doc_id") % 10 === 9)
    LshIndex.write(Dedup.lshFeatures(corpus), idxDir, featDir)

    val got = LshIndex.dedupAgainst(spark, idxDir, featDir, batch)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    // independent expectation: full-corpus verified pairs, restricted
    val pairs = Dedup.lshVerifiedPairs(Dedup.lshFeatures(docs))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = batch.select(col("doc_id")).collect().map(_.getLong(0)).map { b =>
      val partners =
        pairs.collect { case (a, x) if x == b => a } ++ // smaller id: corpus or earlier batch
          pairs.collect { case (x, a) if x == b && a % 10 != 9 => a } // larger corpus id
      b -> (if (partners.isEmpty) None else Some(partners.min))
    }.toMap
    assert(got == expected)
    assert(got.values.exists(_.isDefined), "vacuous: no duplicate found at all")
    assert(got.values.exists(_.isEmpty), "vacuous: everything was a duplicate")
  }

  test("index reads are partition-pruned to the batch's band prefixes (planted positive included)") {
    val (idxDir, featDir) = freshDirs()
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    LshIndex.write(Dedup.lshFeatures(corpus), idxDir, featDir)

    val all = LshIndex.readPruned(spark, idxDir, "pfx",
      (0 until 16).map(i => "h" + Integer.toHexString(i)))
    val allFiles = all.inputFiles.toSet
    assert(allFiles.nonEmpty)

    // a single-doc batch touches at most NumBands prefixes
    val one = docs.filter(col("doc_id") === 9)
    val bandPfxs = Dedup.lshFeatures(one)
      .select(explode(Dedup.md5BandKeys(col("msig"))).as("b"))
      .select(concat(lit("h"), substring(col("b.band_key"), 1, 1)))
      .collect().map(_.getString(0)).distinct.toSeq
    assert(bandPfxs.size <= Dedup.NumBands)
    val pruned = LshIndex.readPruned(spark, idxDir, "pfx", bandPfxs)
    val prunedFiles = pruned.inputFiles.toSet
    // planted positive: the touched prefixes ARE present...
    assert(prunedFiles.nonEmpty)
    assert(bandPfxs.exists(p => prunedFiles.exists(_.contains(s"/pfx=$p/"))))
    // ...and nothing outside them leaks into the scan
    assert(prunedFiles.subsetOf(allFiles))
    assert(prunedFiles.forall(f => bandPfxs.exists(p => f.contains(s"/pfx=$p/"))))
    assert(prunedFiles.size < allFiles.size,
      "pruning read every partition — the detector is vacuous")
  }

  test("append == rebuild, and a re-ingested copy dedups against the appended batch") {
    val (idxDir, featDir) = freshDirs()
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    val batch = docs.filter(col("doc_id") % 10 === 9)
    LshIndex.write(Dedup.lshFeatures(corpus), idxDir, featDir)
    LshIndex.append(Dedup.lshFeatures(batch), idxDir, featDir)

    val (idx2, feat2) = freshDirs()
    LshIndex.write(Dedup.lshFeatures(docs), idx2, feat2)
    def rows(dir: String, cols: Seq[org.apache.spark.sql.Column]) =
      spark.read.parquet(dir).select(cols: _*)
        .collect().map(_.toSeq).toSet
    val icols = Seq("band_id", "band_key", "doc_id", "ns", "pfx").map(col)
    assert(rows(idxDir, icols) == rows(idx2, icols))
    // the shingle SETS too (canonicalized): an append that corrupted sh
    // while preserving counts must fail this, not just the count columns
    val fcols = Seq(col("doc_id"), col("ns"), col("dpfx"),
      array_sort(col("sh")).as("sh"))
    assert(rows(featDir, fcols) == rows(feat2, fcols))

    // the ingest loop: an exact copy of an appended doc must dedup against
    // the now-complete index. The copy's band keys equal the original's, so
    // its verified partner set is {orig} ∪ orig's own verified partners —
    // dup_of is the minimum of that set (not necessarily orig itself).
    val orig = batch.orderBy(col("doc_id")).limit(1)
    val origId = orig.collect()(0).getLong(0)
    val copy = orig.select((col("doc_id") + 500000).as("doc_id"), col("text"))
    val origPartners = Dedup.lshVerifiedPairs(Dedup.lshFeatures(docs))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if a == origId => b; case (a, b) if b == origId => a }
    val expectedDup = (origPartners :+ origId).min
    val verdict = LshIndex.dedupAgainst(spark, idxDir, featDir, copy).collect()
    assert(verdict.length == 1)
    assert(verdict(0).getLong(1) == expectedDup)
    if (expectedDup == origId) assert(verdict(0).getDouble(2) == 1.0)
    else assert(verdict(0).getDouble(2) >= 0.5)
  }

  test("replayed ingest micro-batch is exactly-once (marker skip), and a " +
      "marker-less re-append still verifies correctly") {
    import graft.dedup.LshIndex
    val root = Files.createTempDirectory("graft-lshindex-replay").toString
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250)
    LshIndex.ingestBatch(spark, root, b0, 0L)
    def storeRows() = spark.read.parquet(s"$root/idx")
      .select(col("band_id"), col("band_key"), col("doc_id")).collect().length
    def verdicts() = spark.read.parquet(s"$root/out")
      .select(col("doc_id"), col("dup_of")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    val (rows0, v0) = (storeRows(), verdicts())
    // the foreachBatch replay path: same batch id re-delivered after a
    // crash-before-checkpoint — the applied marker makes it a no-op
    LshIndex.ingestBatch(spark, root, b0, 0L)
    assert(storeRows() == rows0, "replayed batch re-appended to the index")
    assert(verdicts() == v0)
    // the one non-atomic window: the index append landed but the marker
    // didn't — simulate by re-appending the batch rows directly, then
    // ingest the NEXT batch: duplicate store rows must not change verdicts
    LshIndex.append(Dedup.lshFeatures(b0), s"$root/idx", s"$root/feat")
    assert(storeRows() == rows0 * 2) // duplicates really are in the store
    LshIndex.ingestBatch(spark, root, b1, 1L)
    val got = verdicts().filter(_._1 >= 250)
    val (cleanRoot) = Files.createTempDirectory("graft-lshindex-clean").toString
    LshIndex.ingestBatch(spark, cleanRoot, b0, 0L)
    LshIndex.ingestBatch(spark, cleanRoot, b1, 1L)
    val expected = spark.read.parquet(s"$cleanRoot/out")
      .select(col("doc_id"), col("dup_of")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq.filter(_._1 >= 250)
    assert(got == expected,
      "duplicate store rows changed the verdicts of the next batch")
    assert(got.exists(_._2 >= 0), "vacuous: batch 1 found no duplicates")
  }

  test("delete: a tombstoned partner stops matching, the next-best live one takes over") {
    val (idxDir, featDir) = freshDirs()
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    LshIndex.write(Dedup.lshFeatures(corpus), idxDir, featDir)
    // planted positive: find a batch doc whose best partner is corpus-side
    val batch = docs.filter(col("doc_id") % 10 === 9)
    val before = LshIndex.dedupAgainst(spark, idxDir, featDir, batch)
      .filter(col("dup_of").isNotNull && col("dup_of") % 10 =!= 9)
      .orderBy(col("doc_id")).limit(1).collect()
    assert(before.nonEmpty, "vacuous: no corpus-partnered duplicate to delete")
    val victim = before(0).getLong(1)
    LshIndex.delete(spark, idxDir, featDir,
      spark.range(victim, victim + 1).select(col("id").as("doc_id")), "d1")
    val after = LshIndex.dedupAgainst(spark, idxDir, featDir, batch)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(!after.values.toSet.contains(victim),
      "a deleted doc is still handed out as a duplicate partner")
    // equivalence with the rebuild-without-it (the q119 oracle's contract,
    // pinned here independently of SQL)
    val (idx2, feat2) = freshDirs()
    LshIndex.write(Dedup.lshFeatures(
      corpus.filter(col("doc_id") =!= victim)), idx2, feat2)
    val rebuilt = LshIndex.dedupAgainst(spark, idx2, feat2, batch)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(after == rebuilt)
  }

  test("compact == rebuild-without-deleted; file growth collapses to one per dir") {
    val (idxDir, featDir) = freshDirs()
    LshIndex.write(Dedup.lshFeatures(
      docs.filter(col("doc_id") % 10 =!= 9 && col("doc_id") % 3 === 0)),
      idxDir, featDir)
    LshIndex.append(Dedup.lshFeatures(
      docs.filter(col("doc_id") % 10 =!= 9 && col("doc_id") % 3 =!= 0)),
      idxDir, featDir)
    val deleted = docs.select(col("doc_id"))
      .filter(col("doc_id") % 10 =!= 9 && col("doc_id") % 4 === 1)
    LshIndex.delete(spark, idxDir, featDir, deleted, "d1")
    val batch = docs.filter(col("doc_id") % 10 === 9)
    def verdicts(i: String, f: String) =
      LshIndex.dedupAgainst(spark, i, f, batch).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).sortBy(_._1).toSeq
    val pre = verdicts(idxDir, featDir)
    LshIndex.compact(spark, idxDir, featDir)
    assert(verdicts(idxDir, featDir) == pre, "compaction changed verdicts")
    // physically purged and rebuilt-equal
    val (idx2, feat2) = freshDirs()
    LshIndex.write(Dedup.lshFeatures(
      docs.filter(col("doc_id") % 10 =!= 9 && col("doc_id") % 4 =!= 1)),
      idx2, feat2)
    def rows(dir: String, cols: Seq[org.apache.spark.sql.Column]) =
      spark.read.parquet(dir).select(cols: _*).collect().map(_.toSeq).toSet
    val icols = Seq("band_id", "band_key", "doc_id", "ns").map(col)
    assert(rows(idxDir, icols) == rows(idx2, icols),
      "compacted index rows differ from the rebuild-without-deleted")
    val fcols = Seq(col("doc_id"), col("ns"), array_sort(col("sh")).as("sh"))
    assert(rows(featDir, fcols) == rows(feat2, fcols))
    // one file per partition dir afterward (the append growth collapsed)
    for (d <- Seq(idxDir, featDir)) {
      val perDir = spark.read.parquet(d).inputFiles
        .groupBy(f => f.substring(0, f.lastIndexOf('/')))
      assert(perDir.nonEmpty && perDir.forall(_._2.length == 1),
        s"$d still holds multi-file dirs after compact")
    }
    assert(!new java.io.File(s"$idxDir-tombstones").exists(),
      "tombstones survived the compaction that purged them")
  }

  test("compaction interleaves with the ingest loop (the every-Nth-batch deployment recipe)") {
    val plain = Files.createTempDirectory("graft-lsh-nocompact").toString
    val compacted = Files.createTempDirectory("graft-lsh-midcompact").toString
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250)
    LshIndex.ingestBatch(spark, plain, b0, 0L)
    LshIndex.ingestBatch(spark, plain, b1, 1L)
    LshIndex.ingestBatch(spark, compacted, b0, 0L)
    LshIndex.compact(spark, s"$compacted/idx", s"$compacted/feat")
    LshIndex.ingestBatch(spark, compacted, b1, 1L)
    def outs(root: String) = spark.read.parquet(s"$root/out")
      .select(col("doc_id"), col("dup_of"), col("jac"))
      .collect().map(_.toSeq).toSet
    assert(outs(plain) == outs(compacted),
      "a mid-loop compaction changed the ingest verdicts")
  }

  test("partitioning knobs are a pinned contract: pfxLen=2/docPfxMod=64 answers identically") {
    val (idxDir, featDir) = freshDirs()
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    LshIndex.write(Dedup.lshFeatures(corpus), idxDir, featDir,
      SaveMode.Overwrite, pfxLen = 2, docPfxMod = 64L)
    // the layout really took
    val pfxVals = spark.read.parquet(idxDir).select(col("pfx")).distinct()
      .collect().map(_.getString(0))
    assert(pfxVals.nonEmpty && pfxVals.forall(_.length == 3), // "h" + 2 hex
      s"pfx dirs ignore the pinned pfxLen: ${pfxVals.take(3).toSeq}")
    val dpfxMax = spark.read.parquet(featDir)
      .agg(max(col("dpfx").cast("long"))).head().getLong(0)
    assert(dpfxMax >= 16L,
      "docPfxMod=64 never exceeded the default's range — knob not applied")
    // lookups and appends follow the PIN: results identical to the
    // default-knob store for the same corpus and batch
    val (dIdx, dFeat) = freshDirs()
    LshIndex.write(Dedup.lshFeatures(corpus), dIdx, dFeat)
    val batch = docs.filter(col("doc_id") % 10 === 9)
    def verdicts(i: String, f: String) =
      LshIndex.dedupAgainst(spark, i, f, batch).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(_._1).toSeq
    assert(verdicts(idxDir, featDir) == verdicts(dIdx, dFeat))
    LshIndex.append(Dedup.lshFeatures(batch), idxDir, featDir)
    // appended rows landed under the pinned layout, not the defaults
    val appendedPfx = spark.read.parquet(idxDir)
      .select(col("pfx")).distinct().collect().map(_.getString(0))
    assert(appendedPfx.forall(_.length == 3),
      "append fell back to the default pfxLen instead of the pin")
  }

  test("empty prefix set degrades to an empty frame with the index schema") {
    val (idxDir, featDir) = freshDirs()
    LshIndex.write(Dedup.lshFeatures(docs.limit(20)), idxDir, featDir)
    val none = LshIndex.readPruned(spark, idxDir, "pfx", Seq("hzz"))
    assert(none.count() == 0)
    assert(none.columns.contains("band_key"))
  }
}
