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
    time("q66-1")(graft.text.TextAnalysis.q66Tfidf.fn(spark, d).count())
    time("q66-2")(graft.text.TextAnalysis.q66Tfidf.fn(spark, d).count())
    time("q66-3")(graft.text.TextAnalysis.q66Tfidf.fn(spark, d).count())
    time("q46-1")(graft.dedup.Dedup.q46Decontaminate.fn(spark, d).count())
    time("q46-2")(graft.dedup.Dedup.q46Decontaminate.fn(spark, d).count())
    time("q48-1")(graft.dedup.Dedup.q48RecordLinkage.fn(spark, d).count())
    time("q48-2")(graft.dedup.Dedup.q48RecordLinkage.fn(spark, d).count())
    // q45 decomposition: pair generation vs CC loop (the SAME corpus
    // builder q45 uses — an inline copy would silently drift). pairs is
    // MATERIALIZED (localCheckpoint) before the CC timing so the loop's
    // number doesn't re-run pair generation.
    val feat = graft.dedup.Dedup
      .lshFeatures(graft.dedup.Dedup.threeGenCorpus(spark, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("q45-pairs")(graft.dedup.Dedup.lshVerifiedPairs(feat).count())
    val pairs = graft.dedup.Dedup.lshVerifiedPairs(feat)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    time("q45-cc")(graft.dedup.Dedup.connectedComponents(pairs).count())
    spark.stop()
  }
}
