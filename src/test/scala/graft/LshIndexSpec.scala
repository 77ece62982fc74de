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

  test("empty prefix set degrades to an empty frame with the index schema") {
    val (idxDir, featDir) = freshDirs()
    LshIndex.write(Dedup.lshFeatures(docs.limit(20)), idxDir, featDir)
    val none = LshIndex.readPruned(spark, idxDir, "pfx", Seq("hzz"))
    assert(none.count() == 0)
    assert(none.columns.contains("band_key"))
  }
}
