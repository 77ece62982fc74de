package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.{Similarity, VecIndex}

/** Pins the persisted-IVF-index contracts behind q107: pruned
  * O(probed-cells) postings reads (with a planted positive), append ≡
  * rebuild under the persisted quantizer, and the ingest loop finding an
  * appended duplicate. Semantic equivalence with the inline pipeline is
  * the q107 oracle's job — these are the STORE contracts an oracle can't
  * see. */
class VecIndexSpec extends SparkSpec {

  private def emb: DataFrame = Tables.embeddings(spark, sfDir)

  private def freshDir(): String =
    Files.createTempDirectory("graft-vecindex-spec").toString

  private def queries(n: Int): DataFrame =
    emb.filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))

  test("postings reads are pruned to the probed cells (planted positive included)") {
    val dir = freshDir()
    VecIndex.write(emb, dir, Similarity.NumCells)
    val all = spark.read.parquet(s"$dir/postings")
    assert(all.inputFiles.nonEmpty)
    assert(all.select(col("cell")).distinct().count() > 2,
      "corpus collapsed into <=2 cells — the pruning assertion would be vacuous")

    val hits = VecIndex.topK(spark, dir, queries(2))
    // re-derive the probed cells independently of the store path
    val (cents, cn2s) = Similarity.seedCentroids(
      emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")),
      Similarity.NumCells)
    val probed = queries(2)
      .select(explode(
        Similarity.probeCells(cents, cn2s, VecIndex.NumProbe)(col("qv"))))
      .collect().map(_.getInt(0)).toSet
    assert(probed.size < Similarity.NumCells)

    val read = hits.inputFiles.filter(_.contains("/postings/")).toSet
    assert(read.nonEmpty, "planted positive: no postings file in the scan")
    assert(read.forall(f => probed.exists(c => f.contains(s"/cell=$c/"))),
      s"scan leaked outside probed cells $probed: $read")
    assert(read.size < all.inputFiles.length,
      "pruning read every partition — the detector is vacuous")
  }

  test("append == rebuild under the persisted quantizer, and an appended copy is found") {
    val dir = freshDir()
    val corpus = emb.filter(col("vec_id") >= 100 || col("vec_id") < 50)
    val batch = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    VecIndex.write(corpus, dir, Similarity.NumCells)
    VecIndex.append(batch, dir)

    val dir2 = freshDir()
    VecIndex.write(emb, dir2, Similarity.NumCells)
    def rows(d: String) = spark.read.parquet(s"$d/postings")
      .select(col("vec_id"), col("cell"), col("n2")).collect()
      .map(_.toSeq).toSet
    assert(rows(dir) == rows(dir2))

    // ingest loop: an exact copy of an indexed vector must surface it as
    // the top-1 neighbor at cos 1.0 through the store query
    val copy = emb.filter(col("vec_id") === 60)
      .select(lit(999999L).as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val top = VecIndex.topK(spark, dir, copy)
      .filter(col("rank") === 1).collect()
    assert(top.length == 1)
    assert(top(0).getLong(1) == 60L, s"top-1 was ${top(0)}")
    assert(top(0).getDouble(3) == 1.0)
  }

  test("replayed vector-ingest micro-batch is exactly-once; duplicate postings don't change top-1s") {
    val root = freshDir()
    VecIndex.writeQuantizer(emb, root, Similarity.NumCells)
    def wire(f: DataFrame) = f.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val b0 = wire(emb.filter(col("vec_id") < 250))
    val b1 = wire(emb.filter(col("vec_id") >= 250))
    VecIndex.ingestBatch(spark, root, b0, 0L)
    def postRows() = spark.read.parquet(s"$root/postings").count()
    def out() = spark.read.parquet(s"$root/out")
      .select(col("vec_id"), col("nn_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    val (rows0, v0) = (postRows(), out())
    // foreachBatch replay: the applied marker makes it a no-op
    VecIndex.ingestBatch(spark, root, b0, 0L)
    assert(postRows() == rows0, "replayed batch re-appended postings")
    assert(out() == v0)
    // the non-atomic window: append landed, marker didn't — planted
    // duplicate postings must not change the next batch's links
    VecIndex.append(emb.filter(col("vec_id") < 250), root)
    assert(postRows() == rows0 * 2)
    VecIndex.ingestBatch(spark, root, b1, 1L)
    val got = out().filter(_._1 >= 250)
    val clean = freshDir()
    VecIndex.writeQuantizer(emb, clean, Similarity.NumCells)
    VecIndex.ingestBatch(spark, clean, b0, 0L)
    VecIndex.ingestBatch(spark, clean, b1, 1L)
    val expected = spark.read.parquet(s"$clean/out")
      .select(col("vec_id"), col("nn_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq.filter(_._1 >= 250)
    assert(got == expected,
      "duplicate postings changed the next batch's nearest-neighbor links")
    assert(got.exists(_._2 >= 0), "vacuous: batch 1 linked nothing")
  }

  test("delete: a tombstoned vector stops being a neighbor; ranks re-fill like a rebuild") {
    val dir = freshDir()
    VecIndex.write(emb, dir, Similarity.NumCells)
    // planted positive: the top-1 neighbor of query 0 gets deleted
    val victim = VecIndex.topK(spark, dir, queries(1))
      .filter(col("rank") === 1).head().getLong(1)
    VecIndex.delete(spark, dir,
      spark.range(victim, victim + 1).select(col("id").as("vec_id")), "d1")
    def hits(d: String) = VecIndex.topK(spark, d, queries(4)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
      .sortBy(t => (t._1, t._4)).toSeq
    val after = hits(dir)
    assert(!after.exists(_._2 == victim),
      "a deleted vector is still handed out as a neighbor")
    // equivalence with the rebuild-without-it (the q120 oracle's contract)
    val dir2 = freshDir()
    VecIndex.write(emb, dir2, Similarity.NumCells)
    // rebuild keeps the same quantizer contract (victim >= NumCells seeds
    // would be required otherwise); drop only its postings
    VecIndex.delete(spark, dir2,
      spark.range(victim, victim + 1).select(col("id").as("vec_id")), "d1")
    VecIndex.compact(spark, dir2)
    assert(after == hits(dir2),
      "tombstone-masked reads diverge from the physically-purged store")
  }

  test("compact == same answers with one file per cell dir, tombstones purged") {
    val dir = freshDir()
    val corpus = emb.filter(col("vec_id") >= 100 || col("vec_id") < 50)
    val batch = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    VecIndex.write(corpus, dir, Similarity.NumCells)
    VecIndex.append(batch, dir)
    VecIndex.delete(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 5 === 2), "d1")
    def hits() = VecIndex.topK(spark, dir, queries(4)).collect()
      .map(_.toSeq).toSeq
    val pre = hits()
    VecIndex.compact(spark, dir)
    assert(hits() == pre, "compaction changed the ANN answers")
    assert(spark.read.parquet(s"$dir/postings")
      .filter(col("vec_id") % 5 === 2).count() == 0,
      "tombstoned postings survived the physical purge")
    val perDir = spark.read.parquet(s"$dir/postings").inputFiles
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perDir.nonEmpty && perDir.forall(_._2.length == 1),
      "a compacted cell dir still holds multiple files")
    assert(!new java.io.File(s"$dir/tombstones").exists())
  }

  test("filtered topK pushes the predicate into the postings scan; ranks re-fill within it") {
    val dir = freshDir()
    VecIndex.write(emb, dir, Similarity.NumCells)
    val hits = VecIndex.topK(spark, dir, queries(4),
      where = Some(col("label") <= 4))
    val plain = VecIndex.topK(spark, dir, queries(4))
    // planted positive: the unfiltered plan carries no label pushdown
    assert(!plain.queryExecution.executedPlan.toString
      .contains("LessThanOrEqual(label,4)"))
    assert(hits.queryExecution.executedPlan.toString
      .contains("LessThanOrEqual(label,4)"),
      "label predicate did not reach the postings scan as a PushedFilter")
    val fil = hits.collect()
    assert(fil.forall(_.getInt(2) <= 4))
    // filter-then-rank: every unfiltered hit that satisfies the predicate
    // keeps its place, and vacated ranks re-fill (so the filtered result
    // is a strict superset of post-filtering the unfiltered top-k)
    val post = plain.collect().filter(_.getInt(2) <= 4)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val filSet = fil.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(post.subsetOf(filSet))
    assert(filSet.size > post.size,
      "no rank re-filled — the filter-vs-post-filter distinction is vacuous")
  }

  test("literal and broadcast-row quantizer delivery produce identical assignments") {
    val dir = freshDir()
    VecIndex.write(emb, dir, Similarity.NumCells)
    val plain = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    // the BROADCAST-ROW branch, forced via the injectable limit (the
    // default NumCells <= LiteralCellLimit would never take it)
    val bcast = VecIndex.withStoreProbeCells(spark, dir, plain, 1,
        col("v"), "p", literalLimit = 0)
      .select(col("vec_id"), element_at(col("p"), 1).cast("int").as("cell"))
    // the literal branch through Similarity's path
    val litCells = Similarity
      .withProbeCells(plain, plain, Similarity.NumCells, 1, col("v"), "p")
      .select(col("vec_id"), element_at(col("p"), 1).cast("int").as("cell"))
    val stored = spark.read.parquet(s"$dir/postings")
      .select(col("vec_id"), col("cell").cast("int").as("cell"))
    assert(litCells.except(stored).count() == 0 &&
      stored.except(litCells).count() == 0)
    assert(bcast.except(stored).count() == 0 &&
      stored.except(bcast).count() == 0,
      "broadcast-row quantizer delivery diverged from the literal path")
  }
}
