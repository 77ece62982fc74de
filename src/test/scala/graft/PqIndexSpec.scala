package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.{PqIndex, Similarity}

/** Pins the persisted IVF-PQ store contracts behind q121: the resident
  * half really is codes-only (no raw vector in its schema or scan), reads
  * of both halves are pruned (codes to probed cells, the cold store to the
  * shortlist's id prefixes), append ≡ rebuild under the persisted
  * quantizer+codebooks, the ADC-shortlist/re-rank composition recovers the
  * exact answer when un-approximated, and the cold-store partition knob is
  * a pinned contract. Semantic equivalence with the unrolled pipeline is
  * the q121 oracle's job — these are the STORE contracts an oracle can't
  * see. */
class PqIndexSpec extends SparkSpec {

  private def emb: DataFrame = Tables.embeddings(spark, sfDir)

  private def freshDir(): String =
    Files.createTempDirectory("graft-pqindex-spec").toString

  private def queries(n: Int): DataFrame =
    emb.filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))

  test("codes store is codes-only; both halves read pruned (planted positives)") {
    val dir = freshDir()
    PqIndex.write(emb, dir)
    // the resident half carries 8 small ints per vector — never the vector
    val codeCols = spark.read.parquet(s"$dir/codes").schema.fieldNames.toSet
    assert(codeCols == (Set("vec_id", "cell") ++
      (0 until Similarity.PqSubspaces).map(m => s"c$m")),
      s"codes store leaked extra columns: $codeCols")

    val allCodes = spark.read.parquet(s"$dir/codes")
    assert(allCodes.select(col("cell")).distinct().count() > 2,
      "corpus collapsed into <=2 cells — the pruning assertion is vacuous")
    // re-derive the probed cells independently of the store path, then
    // make the operator's own pruned-read call (localCheckpoint severs the
    // final frame's lineage, so inputFiles must be probed on this frame)
    val (cents, cn2s) = Similarity.seedCentroids(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      Similarity.NumCells)
    val probed = queries(2)
      .select(explode(
        Similarity.probeCells(cents, cn2s, PqIndex.NumProbe)(col("qv"))))
      .collect().map(_.getInt(0)).toSet
    assert(probed.size < Similarity.NumCells)
    val pruned = graft.dedup.LshIndex.readPruned(spark, s"$dir/codes",
      "cell", probed.map(_.toString).toSeq)
    val read = pruned.inputFiles.toSet
    assert(read.nonEmpty, "planted positive: no codes file in the scan")
    assert(read.forall(f => probed.exists(c => f.contains(s"/cell=$c/"))),
      s"codes scan leaked outside probed cells $probed: $read")
    assert(read.size < allCodes.inputFiles.length,
      "codes pruning read every partition — the detector is vacuous")

    // cold half: one query's shortlist is <= Rerank ids, so its read must
    // touch a strict subset of the vpfx dirs (and include every hit's)
    val hits = PqIndex.topK(spark, dir, queries(1))
    val hitPfx = hits.collect().map(_.getLong(2) % PqIndex.VecModDefault).toSet
    val vecsRead = hits.inputFiles.filter(_.contains("/vecs/")).toSet
    assert(vecsRead.nonEmpty, "planted positive: no vecs file in the scan")
    assert(hitPfx.forall(p => vecsRead.exists(_.contains(s"/vpfx=$p/"))))
    val allVecs = spark.read.parquet(s"$dir/vecs").inputFiles.length
    assert(vecsRead.size < allVecs,
      "cold-store read touched every vpfx dir — shortlist pruning is vacuous")
  }

  test("append == rebuild under the persisted quantizer and codebooks") {
    val dir = freshDir()
    val corpus = emb.filter(col("vec_id") >= 100 || col("vec_id") < 50)
    val batch = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    PqIndex.write(corpus, dir)
    PqIndex.append(batch, dir)
    val dir2 = freshDir()
    PqIndex.write(emb, dir2)
    def codes(d: String) = spark.read.parquet(s"$d/codes")
      .collect().map(_.toSeq).toSet
    def vecs(d: String) = spark.read.parquet(s"$d/vecs")
      .select(col("vec_id"), col("vpfx"), col("n2")).collect()
      .map(_.toSeq).toSet
    assert(codes(dir) == codes(dir2),
      "appended codes diverge from a rebuild — the codebook contract broke")
    assert(vecs(dir) == vecs(dir2))
    def hits(d: String) = PqIndex.topK(spark, d, queries(4))
      .collect().map(_.toSeq).toSet
    assert(hits(dir) == hits(dir2))
  }

  test("un-approximated (all cells probed, unbounded shortlist) == exact cosine top-k") {
    val dir = freshDir()
    PqIndex.write(emb, dir)
    val n = emb.count().toInt
    val got = PqIndex.topK(spark, dir, queries(2),
        nprobe = Similarity.NumCells, rerank = n)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(_.toSeq).toSet
    // independent exact reference: brute-force cosine, same tie-break
    val w = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", Dedup.sqNorm(col("v")))
    val brute = queries(2).crossJoin(w)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(Dedup.cosineFromDot(
        Dedup.dot(col("qv"), col("v")), Dedup.sqNorm(col("qv")),
        col("n2")), 6))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= PqIndex.K)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .collect().map(_.toSeq).toSet
    assert(got == brute,
      "ADC shortlist + exact re-rank failed to recover the exact top-k " +
        "when un-approximated")
  }

  test("delete: a tombstoned vector frees its shortlist slot, like a rebuild-without-it") {
    val dir = freshDir()
    PqIndex.write(emb, dir)
    // planted positive: the top-1 neighbor of query 0 gets deleted
    val victim = PqIndex.topK(spark, dir, queries(1))
      .filter(col("rank") === 1).head().getLong(2)
    def victimIds = spark.range(victim, victim + 1)
      .select(col("id").as("vec_id"))
    PqIndex.delete(spark, dir, victimIds, "d1")
    def hits(d: String) = PqIndex.topK(spark, d, queries(4)).collect()
      .map(_.toSeq).toSet
    val after = hits(dir)
    assert(!after.exists(_(2) == victim),
      "a deleted vector is still handed out as a neighbor")
    // equivalence with the physically-purged store (the q124 contract)
    val dir2 = freshDir()
    PqIndex.write(emb, dir2)
    PqIndex.delete(spark, dir2, victimIds, "d1")
    PqIndex.compact(spark, dir2)
    assert(after == hits(dir2),
      "tombstone-masked reads diverge from the physically-purged store")
  }

  test("compact == same answers, one file per dir in both halves, tombstones purged") {
    val dir = freshDir()
    val corpus = emb.filter(col("vec_id") >= 100 || col("vec_id") < 50)
    val batch = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    PqIndex.write(corpus, dir)
    PqIndex.append(batch, dir)
    PqIndex.delete(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 5 === 2), "d1")
    def hits() = PqIndex.topK(spark, dir, queries(4)).collect()
      .map(_.toSeq).toSet
    val pre = hits()
    PqIndex.compact(spark, dir)
    assert(hits() == pre, "compaction changed the ANN answers")
    Seq("codes", "vecs").foreach { half =>
      assert(spark.read.parquet(s"$dir/$half")
        .filter(col("vec_id") % 5 === 2).count() == 0,
        s"tombstoned $half rows survived the physical purge")
      val perDir = spark.read.parquet(s"$dir/$half").inputFiles
        .groupBy(f => f.substring(0, f.lastIndexOf('/')))
      assert(perDir.nonEmpty && perDir.forall(_._2.length == 1),
        s"a compacted $half dir still holds multiple files")
    }
    assert(!new java.io.File(s"$dir/tombstones").exists())
  }

  test("replayed PQ-ingest micro-batch is exactly-once; duplicate store rows don't change answers") {
    val root = freshDir()
    PqIndex.writeContracts(emb, root)
    def wire(f: org.apache.spark.sql.DataFrame) =
      f.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val standing = queries(4)
    PqIndex.ingestBatch(spark, root, wire(emb.filter(col("vec_id") < 250)),
      0L, standing)
    def codesRows() = spark.read.parquet(s"$root/codes").count()
    def out() = spark.read.parquet(s"$root/out").collect()
      .map(_.toSeq).toSet
    val (r0, v0) = (codesRows(), out())
    // foreachBatch replay: the applied marker makes it a no-op
    PqIndex.ingestBatch(spark, root, wire(emb.filter(col("vec_id") < 250)),
      0L, standing)
    assert(codesRows() == r0, "replayed batch re-appended codes")
    assert(out() == v0)
    // the non-atomic window: append landed, marker didn't — planted
    // duplicate rows must not change the next batch's answers
    PqIndex.append(emb.filter(col("vec_id") < 250), root)
    assert(codesRows() == r0 * 2)
    PqIndex.ingestBatch(spark, root, wire(emb.filter(col("vec_id") >= 250)),
      1L, standing)
    val got = spark.read.parquet(s"$root/out/batch=1").collect()
      .map(_.toSeq).toSet
    val clean = freshDir()
    PqIndex.writeContracts(emb, clean)
    PqIndex.ingestBatch(spark, clean, wire(emb.filter(col("vec_id") < 250)),
      0L, standing)
    PqIndex.ingestBatch(spark, clean, wire(emb.filter(col("vec_id") >= 250)),
      1L, standing)
    val expected = spark.read.parquet(s"$clean/out/batch=1").collect()
      .map(_.toSeq).toSet
    assert(got == expected,
      "duplicate store rows changed the post-batch ANN answers")
    assert(got.nonEmpty, "vacuous: batch 1 answered nothing")
  }

  test("an unbounded query side is refused before any driver collect") {
    val dir = freshDir()
    PqIndex.write(emb, dir)
    val big = spark.range(PqIndex.MaxQueryBatch + 1)
      .select(col("id").as("query_id"),
        transform(sequence(lit(1), lit(64)),
          x => x.cast("double")).as("qv"))
    val e = intercept[IllegalArgumentException] {
      PqIndex.topK(spark, dir, big)
    }
    assert(e.getMessage.contains("knnJoin"))
    // the bound itself still admits a full legal batch
    assert(PqIndex.topK(spark, dir, queries(8)).count() > 0)
  }

  test("cold-store partition knob is a pinned contract appends follow") {
    val dir = freshDir()
    val corpus = emb.filter(col("vec_id") >= 100 || col("vec_id") < 50)
    val batch = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    PqIndex.write(corpus, dir, vecMod = 8L)
    PqIndex.append(batch, dir)
    val pfxs = spark.read.parquet(s"$dir/vecs")
      .select(col("vpfx").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(pfxs.max < 8 && pfxs.size == 8,
      s"append ignored the pinned vecMod=8 layout: $pfxs")
    val dirD = freshDir()
    PqIndex.write(emb, dirD)
    def hits(d: String) = PqIndex.topK(spark, d, queries(4))
      .collect().map(_.toSeq).toSet
    assert(hits(dir) == hits(dirD),
      "ANN answers changed across cold-store partition knob settings")
  }
}
