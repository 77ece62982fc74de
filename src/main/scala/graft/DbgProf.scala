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
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"[prof] $label out=$n time=${math.round((System.nanoTime() - t0) / 1e7) / 100.0}")
    }
    val d01 = "/root/testdata/sf0.1"
    time("q38-1")(graft.streaming.Streaming.q38StreamMaterializedView.fn(spark, d01).count())
    time("q38-2")(graft.streaming.Streaming.q38StreamMaterializedView.fn(spark, d01).count())
    time("q57-1")(graft.streaming.Streaming.q57StreamSinkRoundtrip.fn(spark, d01).count())
    spark.stop()
  }
}
