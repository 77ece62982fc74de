package graft
import org.apache.spark.sql.functions._

/** Dev-only steady-state profiler: runs every registry query twice and
  * prints the SECOND time — separates real per-query cost from one-time
  * codegen/scan warmup and bench noise. */
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
    Tables.documents(spark, d).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      fn(spark, d).count()
      val t0 = System.nanoTime()
      fn(spark, d).count()
      name -> (System.nanoTime() - t0) / 1e9
    }
    results.sortBy(-_._2).take(8).foreach { case (n, t) =>
      println(f"[prof] $n%-28s ${t}%6.2f")
    }
    println(f"[prof] TOTAL ${results.map(_._2).sum}%.1f")
    spark.stop()
  }
}
