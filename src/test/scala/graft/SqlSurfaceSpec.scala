package graft

/** The SQL front-end over the engine: every test table registered as a
  * view and the ANSI oracle SQL of representative queries run through
  * `spark.sql` itself — the same string the DuckDB gate executes — must
  * produce exactly the DataFrame-API result. A user of the reference who
  * writes SQL (not Scala) gets the same engine: same views, same Catalyst
  * planning, same answers. (Queries whose oracle uses DuckDB-only syntax
  * — list functions, `//`, string_split_regex — are exercised by the
  * DuckDB gate instead; GraftExtensions pins the custom graft_* functions
  * in pure SQL.) */
class SqlSurfaceSpec extends SparkSpec {

  private val ansiCompatible = Seq(
    "q02_revenue_by_nation", // multi-join + two-level decimal aggregate
    "q10_topk_per_group",    // window + join + outer filter on rn
    "q11_window_lag",        // LAG over partition
    "q13_distinct",          // DISTINCT projection
  )

  test("ANSI oracle SQL through spark.sql matches the DataFrame formulation") {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    ansiCompatible.foreach { name =>
      val q = byName(name)
      val viaSql = spark.sql(q.oracle.get).collect().map(_.toSeq).toSeq
      val viaDf = q.fn(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(viaSql == viaDf, s"$name: SQL and DataFrame results differ")
    }
  }
}
