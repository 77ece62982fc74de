package graft
import org.apache.spark.sql.functions._
object DbgProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ArrayExprs.register(spark)
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"$label rows=$n time=${math.round((System.nanoTime()-t0)/1e7)/100.0}")
    }
    import graft.dedup.Dedup._
    def mkBase = Tables.documents(spark, d).select(
      col("doc_id"), col("lang"), floor(col("n_chars")/100).as("band"),
      shingleHashes(col("text")).as("s")).withColumn("ns", size(col("s")))
    def run(label: String, constraints: Boolean): Unit = {
      spark.conf.set("spark.sql.constraintPropagation.enabled", constraints)
      val base = mkBase
      val a = base.select(col("doc_id").as("doc_a"), col("lang").as("la"), col("band").as("ba"), col("s").as("sa"), col("ns").as("na"))
      val b = base.select(col("doc_id").as("doc_b"), col("lang").as("lb"), col("band").as("bb"), col("s").as("sb"), col("ns").as("nb"))
      val inter = call_function("graft_intersect_size", col("sa"), col("sb"))
      time(label)(a.repartition(32).join(broadcast(b),
        col("la")===col("lb") && col("ba")===col("bb") && col("doc_a")<col("doc_b") &&
        least(col("na"),col("nb"))*2 >= greatest(col("na"),col("nb")) &&
        inter*3 >= col("na")+col("nb")).count())
    }
    run("warmup", true)
    run("with-constraints", true)
    run("no-constraints", false)
    run("no-constraints2", false)
    spark.stop()
  }
}
