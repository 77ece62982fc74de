package graft
import org.apache.spark.sql.functions._
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
    time("q03-cur")(graft.relational.Relational.q03TopOrders.fn(spark, d).count())
    time("q03-cur2")(graft.relational.Relational.q03TopOrders.fn(spark, d).count())
    // variant: pre-aggregate lineitem per order, then join orders
    def v2 = {
      val li = Tables.lineitem(spark, d)
        .groupBy(col("l_orderkey"))
        .agg(Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      Tables.orders(spark, d).filter(col("o_orderstatus") =!= "F")
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }
    time("q03-preagg")(v2.count())
    time("q03-preagg2")(v2.count())
    spark.stop()
  }
}
