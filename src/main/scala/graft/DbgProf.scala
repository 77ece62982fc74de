package graft
import org.apache.spark.sql.functions._

/** Dev-only steady-state profiler — edit probes freely. */
object DbgProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // standing default: storage-partitioned joins over bucketed z-tables
      // (q161) plan exchange-free; a no-op for every non-bucketed scan
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ArrayExprs.register(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/dbg_v")
    val names = args.toSet
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    new java.io.File(out).mkdirs()
    val picked = SparkEntry.registry.filter(r => names.contains(r.name))
    picked.foreach { r =>
      val t0 = System.nanoTime()
      r.fn(spark, d).coalesce(1).write.mode("overwrite").parquet(s"$out/${r.name}")
      println(s"[prof] ${r.name} time=${math.round((System.nanoTime() - t0) / 1e7) / 100.0}")
    }
    val json = picked.flatMap(r => r.oracle.map(sql => s"${q(r.name)}: ${q(sql)}"))
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
