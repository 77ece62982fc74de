package graft
import org.apache.spark.sql.functions._
object DbgProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq("ab c").toDF("t").select(split(col("t"), "").as("l")).show(false)
    spark.stop()
  }
}
