package graft
import org.apache.spark.sql.functions._
object DbgProf2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.constraintPropagation.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ArrayExprs.register(spark)
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"$label out=$n time=${math.round((System.nanoTime()-t0)/1e7)/100.0}")
    }
    import graft.dedup.Dedup._
    val docs = Tables.documents(spark, d)
    time("warmup")(docs.count())
    time("shingles-1task")(docs.select(shingleHashes(col("text")).as("sh"))
      .agg(sum(size(col("sh")))).collect()(0).getLong(0))
    time("shingles-repart32")(docs.repartition(32).select(shingleHashes(col("text")).as("sh"))
      .agg(sum(size(col("sh")))).collect()(0).getLong(0))
    time("words-only")(docs.repartition(32).select(split(col("text"), "\\s+").as("w"))
      .agg(sum(size(col("w")))).collect()(0).getLong(0))
    spark.stop()
  }
}
