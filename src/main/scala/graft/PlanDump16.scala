package graft

import java.nio.file.{Files, Paths}

/** Round-16 optimization deliverable: dump `.explain("formatted")` for the
  * named queries to `plans/r16/<query>_<suffix>.txt`.
  *
  *   sbt "runMain graft.PlanDump16 before q141_zorder_cdc_merge q75_pagerank"
  *
  * Uses sf0.001 by default (plan SHAPE is scale-invariant; fixture builds
  * are cheap there) — override with SPARK_GRAFT_SF_DIR.
  */
object PlanDump16 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump16 <suffix> <query>...")
    val suffix = args.head
    val names = args.tail.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ArrayExprs.register(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(Paths.get("plans/r16"))
    SparkEntry.registry.filter(r => names.contains(r.name)).foreach { r =>
      val df = r.fn(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r16/${r.name}_$suffix.txt"), txt)
      println(s"[plandump] plans/r16/${r.name}_$suffix.txt")
    }
    spark.stop()
  }
}
