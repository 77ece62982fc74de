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
    time("warmup")(Tables.documents(spark, d).count())
    time("q35-1")(graft.streaming.Streaming.q35StreamStreamJoin.fn(spark, d).count())
    time("q35-2")(graft.streaming.Streaming.q35StreamStreamJoin.fn(spark, d).count())
    // batch equivalent of the interval join for comparison
    def batchJoin = {
      val ev = Tables.events(spark, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      p.join(c, col("c_user") === col("user_id") && col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 DAY"))
    }
    time("q35-batch")(batchJoin.count())
    time("q33-2nd")(graft.streaming.Streaming.q33StreamSessionWindow.fn(spark, d).count())
    spark.stop()
  }
}
