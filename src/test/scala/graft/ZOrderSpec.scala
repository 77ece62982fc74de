package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

/** Pins what the q123 oracle can't see: the z-clustered layout prunes
  * FILES for selective predicates on EITHER clustered column, the linear
  * (single-column-sorted) baseline cannot prune on the second column, the
  * residual filter still applies inside surviving files, and stat-less
  * columns degrade to always-read instead of wrong skipping. */
class ZOrderSpec extends SparkSpec {

  private val NumFiles = 16

  private def li = Tables.lineitem(spark, sfDir)

  private def bounds(): (Long, Long, Long, Long) = {
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
  }

  test("z-layout prunes on either column; linear layout only on its sort key") {
    val zDir = Files.createTempDirectory("graft-z").toString
    val linDir = Files.createTempDirectory("graft-lin").toString
    ZOrder.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), NumFiles)
    // the linear baseline: same machinery, 1-D curve = a plain sort on
    // l_partkey, but stats recorded for both columns
    ZOrder.writeZOrdered(li, linDir, Seq("l_partkey"), NumFiles,
      statCols = Seq("l_partkey", "l_suppkey"))
    val (pmn, pmx, smn, smx) = bounds()
    val pBand = ("l_partkey", pmn + (pmx - pmn) * 2 / 10,
      pmn + (pmx - pmn) * 3 / 10)
    val sBand = ("l_suppkey", smn + (smx - smn) * 4 / 10,
      smn + (smx - smn) * 5 / 10)
    def files(dir: String, preds: (String, Long, Long)*): Int =
      ZOrder.readZRange(spark, dir, preds).inputFiles
        .count(!_.contains("_zmanifest"))
    val total = spark.read.parquet(zDir).inputFiles.length
    assert(total >= NumFiles / 2, s"layout collapsed to $total files")
    // z-curve: BOTH 10%-band predicates open a strict fraction
    assert(files(zDir, pBand) <= total * 6 / 10,
      s"partkey band read ${files(zDir, pBand)}/$total z-files")
    assert(files(zDir, sBand) <= total * 6 / 10,
      s"suppkey band read ${files(zDir, sBand)}/$total z-files")
    // planted negative: the linear layout prunes its sort key but must
    // read EVERY file for the other column (suppkey uniform per file)
    val linTotal = spark.read.parquet(linDir).inputFiles.length
    assert(files(linDir, pBand) <= linTotal / 2)
    assert(files(linDir, sBand) == linTotal,
      "linear layout 'pruned' on a column it isn't clustered by — " +
        "the z-vs-linear comparison is vacuous")
  }

  test("residual filter applies inside surviving files; rows match the plain filter") {
    val zDir = Files.createTempDirectory("graft-z2").toString
    ZOrder.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), NumFiles)
    val (pmn, pmx, smn, smx) = bounds()
    val preds = Seq(
      ("l_partkey", pmn + (pmx - pmn) * 2 / 10, pmn + (pmx - pmn) * 3 / 10),
      ("l_suppkey", smn + (smx - smn) * 4 / 10, smn + (smx - smn) * 5 / 10))
    val got = ZOrder.readZRange(spark, zDir, preds)
    // planted positive for the residual: the surviving files hold MORE
    // rows than the answer, so skipping the filter would leak
    val surviving = spark.read.parquet(got.inputFiles
      .filterNot(_.contains("_zmanifest")): _*).count()
    assert(surviving > got.count(),
      "every surviving row matched — the residual-filter check is vacuous")
    val expect = li.filter(
      col("l_partkey").between(preds(0)._2, preds(0)._3) &&
        col("l_suppkey").between(preds(1)._2, preds(1)._3))
      .select(got.columns.map(col): _*)
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
    assert(expect.count() > 0, "empty band — the equivalence is vacuous")
  }

  test("manifest is the commit point: orphans invisible, retried append lands once, vacuum cleans") {
    val dir = Files.createTempDirectory("graft-z4").toString
    val corpus = li.filter(col("l_orderkey") % 10 =!= 9)
    val batch = li.filter(col("l_orderkey") % 10 === 9)
    ZOrder.writeZOrdered(corpus, dir, Seq("l_partkey", "l_suppkey"), NumFiles)
    ZOrder.appendZOrdered(batch, dir, Seq("l_partkey", "l_suppkey"), 2)
    val (pmn, pmx, _, _) = bounds()
    val preds = Seq(("l_partkey", pmn, pmn + (pmx - pmn) / 10))
    val got = ZOrder.readZRange(spark, dir, preds)
    val expect = li.filter(
      col("l_partkey").between(preds(0)._2, preds(0)._3))
      .select(got.columns.map(col): _*)
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0,
      "appended rows diverge from the plain filter")
    // every committed file got manifest stats (the incremental harvest)
    val manFiles = spark.read.parquet(s"$dir/_zmanifest")
      .select(col("f")).distinct().count()
    val dataFiles = spark.read.parquet(dir).inputFiles
      .count(!_.contains("_zmanifest"))
    assert(manFiles == dataFiles, s"$manFiles stats rows for $dataFiles files")
    val pre = got.count()
    // crashed append: its data file landed, its manifest append didn't —
    // the orphan must be INVISIBLE (partial batches never surface, and a
    // retry must not double rows)
    val retryBatch = li.limit(1).withColumn("l_partkey", lit(pmn))
    val extraSrc = Files.createTempDirectory("graft-z4x").toString
    retryBatch.coalesce(1).write.mode("overwrite").parquet(extraSrc)
    val src = new java.io.File(extraSrc).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    java.nio.file.Files.copy(src,
      java.nio.file.Paths.get(dir, "part-orphan.snappy.parquet"))
    assert(ZOrder.readZRange(spark, dir, preds).count() == pre,
      "a crashed append's orphan file became visible")
    // the retry commits the batch exactly once
    ZOrder.appendZOrdered(retryBatch, dir, Seq("l_partkey", "l_suppkey"), 1)
    assert(ZOrder.readZRange(spark, dir, preds).count() == pre + 1,
      "retried append did not land exactly once")
    // vacuum removes only the orphan; committed rows stay
    val removed = ZOrder.vacuumOrphans(spark, dir)
    assert(removed == Seq("part-orphan.snappy.parquet"), removed.toString)
    assert(ZOrder.readZRange(spark, dir, preds).count() == pre + 1)
  }

  test("z-order writers run in the enforced single-writer slot") {
    val dir = Files.createTempDirectory("graft-z5").toString
    ZOrder.writeZOrdered(li.limit(100), dir,
      Seq("l_partkey", "l_suppkey"), 2)
    graft.sources.Lease.withLease(spark, dir, "other-writer") {
      intercept[graft.sources.Lease.HeldException] {
        ZOrder.appendZOrdered(li.limit(10), dir,
          Seq("l_partkey", "l_suppkey"), 1)
      }
      intercept[graft.sources.Lease.HeldException] {
        ZOrder.vacuumOrphans(spark, dir)
      }
    }
    // slot released on exit: the same append now lands
    ZOrder.appendZOrdered(li.limit(10), dir,
      Seq("l_partkey", "l_suppkey"), 1)
  }

  test("a predicate on a stat-less column is refused, not silently unpruned") {
    val zDir = Files.createTempDirectory("graft-z3").toString
    ZOrder.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), 4)
    val e = intercept[IllegalArgumentException] {
      ZOrder.readZRange(spark, zDir, Seq(("l_orderkey", 0L, 10L)))
    }
    assert(e.getMessage.contains("l_orderkey"))
  }
}
