package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.StoreMaint

/** Pins the shared store-maintenance plumbing: the layout pin round-trip
  * and — the load-bearing one — that a reader concurrent with
  * [[StoreMaint.compactPartitioned]] sees a correct result at EVERY swap
  * state (old-only, old+new, new-only), because the stores' reads
  * deduplicate by functional key. The mid-states are PLANTED here
  * deterministically rather than raced: each is an exact on-disk state
  * the swap passes through (new files renamed in; old files then
  * deleted), so asserting on the planted state covers what a racing
  * reader can observe on a rename-then-delete filesystem. */
class StoreMaintSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-storemaint-spec").toString

  test("layout pin round-trips and survives unrelated files") {
    val dir = freshDir()
    StoreMaint.writeLayout(spark, dir, StoreMaint.Layout(2, 64L))
    assert(StoreMaint.readLayout(spark, dir, StoreMaint.Layout(1, 16L)) ==
      StoreMaint.Layout(2, 64L))
    // default only when the pin is absent
    assert(StoreMaint.readLayout(spark, s"$dir/nope",
      StoreMaint.Layout(1, 16L)) == StoreMaint.Layout(1, 16L))
  }

  test("compaction swap states are invisible to a deduplicating reader") {
    val dir = freshDir()
    val table = s"$dir/t"
    // a store table with REAL duplicates (two appends of the same rows)
    // across several partition dirs and several files per dir
    def batch(): Unit = spark.range(200)
      .select(col("id"), (col("id") * 7 % 100).as("payload"),
        pmod(col("id"), lit(4)).as("part"))
      .repartition(3) // several files per dir per append
      .write.mode("append").partitionBy("part").parquet(table)
    batch(); batch(); batch()
    def canon(df: DataFrame) = df.dropDuplicates("id")
    def readBack(): Set[Seq[Any]] = canon(spark.read.parquet(table))
      .select(col("id"), col("payload")).collect().map(_.toSeq).toSet
    val expected = readBack()
    assert(expected.size == 200)
    val preFiles = spark.read.parquet(table).inputFiles
    assert(preFiles.length > 8, "not enough files to make the swap states real")

    // plant the OLD+NEW overlap state: snapshot the old files, compact,
    // then copy the old files back in beside the compacted ones
    val fs = new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
    val stash = new Path(s"$dir/stash")
    fs.mkdirs(stash)
    preFiles.foreach { f =>
      val p = new Path(f.stripPrefix("file:"))
      val dst = new Path(stash, p.getParent.getName + "__" + p.getName)
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, dst, false,
        spark.sessionState.newHadoopConf())
    }
    StoreMaint.compactPartitioned(spark, table, "part", canon)
    assert(readBack() == expected, "new-only state changed the read")
    val postFiles = spark.read.parquet(table).inputFiles
    val perDir = postFiles.groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(perDir.forall(_._2.length == 1), "compaction left multi-file dirs")

    // old+new coexistence (what a reader sees mid-swap, before deletes)
    fs.listStatus(stash).foreach { st =>
      val Array(dirName, fname) = st.getPath.getName.split("__", 2)
      fs.rename(st.getPath, new Path(s"$table/$dirName/$fname"))
    }
    assert(spark.read.parquet(table).inputFiles.length >
      postFiles.length, "planted overlap state did not materialize")
    assert(readBack() == expected,
      "a reader in the old+new swap state saw a wrong result")

    // partial-delete state: half the old files gone
    val planted = spark.read.parquet(table).inputFiles
      .filterNot(postFiles.contains)
    planted.zipWithIndex.filter(_._2 % 2 == 0).foreach { case (f, _) =>
      fs.delete(new Path(f.stripPrefix("file:")), false)
    }
    assert(readBack() == expected,
      "a reader in the partially-deleted swap state saw a wrong result")
  }

  test("a fully-purged partition dir is dropped, not left empty") {
    val dir = freshDir()
    val table = s"$dir/t"
    spark.range(100)
      .select(col("id"), pmod(col("id"), lit(4)).as("part"))
      .write.mode("append").partitionBy("part").parquet(table)
    // canon drops everything in partition 3
    StoreMaint.compactPartitioned(spark, table, "part",
      df => df.filter(pmod(col("id"), lit(4)) =!= 3))
    val fs = new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(s"$table/part=3")),
      "an all-purged dir must disappear so pruned reads skip it")
    assert(spark.read.parquet(table).count() == 75)
  }
}
