package graft
import org.apache.spark.sql.functions._

/** Dev-only steady-state profiler — edit probes freely. */
object DbgProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ArrayExprs.register(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"[prof] $label out=$n time=${math.round((System.nanoTime() - t0) / 1e7) / 100.0}")
    }
    for (q <- Seq(graft.sources.ZOrder.q132ZOrderStreamIngest,
        graft.sources.ZOrder.q123ZOrderRead)) {
      time(q.name + "-1")(q.fn(spark, d).count())
      time(q.name + "-2")(q.fn(spark, d).count())
    }
    spark.stop()
  }
}
