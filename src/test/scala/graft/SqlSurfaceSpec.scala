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

  test("graftz catalog: CREATE / INSERT / SELECT / INSERT OVERWRITE / SHOW / DROP z-stores in pure SQL") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-zcat").toString
    spark.conf.set("spark.sql.catalog.graftz", "graft.sources.ZCatalog")
    spark.conf.set("spark.sql.catalog.graftz.root", root)
    try {
      spark.sql("CREATE NAMESPACE graftz.lake")
      // PARTITIONED BY declares the z-clustering keys (recorded as store
      // policy — option-less INSERTs cluster by them)
      spark.sql("""CREATE TABLE graftz.lake.t1
        (k1 BIGINT, k2 BIGINT, s STRING) PARTITIONED BY (k1, k2)""")
      spark.sql("""INSERT INTO graftz.lake.t1
        SELECT id, id % 8, concat('x', id) FROM range(1000)""")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 1000)
      // manifest skipping serves ordinary SQL WHERE clauses
      assert(spark.sql(
        "SELECT count(*) FROM graftz.lake.t1 WHERE k1 BETWEEN 10 AND 19")
        .head().getLong(0) == 10)
      assert(spark.sql("SELECT s FROM graftz.lake.t1 WHERE k1 = 55")
        .head().getString(0) == "x55")
      // a second INSERT is a lock-free z-append (clustered by the
      // recorded keys); counts accumulate
      spark.sql("""INSERT INTO graftz.lake.t1
        SELECT id, id % 8, concat('x', id) FROM range(1000, 1100)""")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 1100)
      // INSERT OVERWRITE = the versioned epoch rebuild
      Thread.sleep(120) // separate the commit instants for TIMESTAMP AS OF
      val cutoff = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneId.of("UTC"))
        .format(java.time.Instant.now())
      Thread.sleep(120)
      spark.sql("""INSERT OVERWRITE graftz.lake.t1
        SELECT id, id % 3, concat('y', id) FROM range(50)""")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 50)
      // pure-SQL time travel: the pre-overwrite snapshot by commit
      // coordinate and by wall clock (read-only; past schema governs)
      assert(spark.sql(
        "SELECT count(*) FROM graftz.lake.t1 VERSION AS OF '0:2'")
        .head().getLong(0) == 1100)
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1 " +
        s"TIMESTAMP AS OF '$cutoff'").head().getLong(0) == 1100)
      val eTv = intercept[Exception] {
        spark.sql("SELECT * FROM graftz.lake.t1 VERSION AS OF 'banana'")
          .collect()
      }
      assert(eTv.getMessage.contains("epoch"), eTv.getMessage)
      // the catalog lists what the directory tree holds
      assert(spark.sql("SHOW TABLES IN graftz.lake").collect()
        .map(_.getString(1)).toSeq == Seq("t1"))
      // the history read option = DESCRIBE HISTORY (create + appends +
      // the overwrite epoch, in commit order)
      val hist = spark.read.format("graft-z").option("history", true)
        .load(s"$root/lake/t1")
        .select(col("op")).collect().map(_.getString(0)).toSeq
      assert(hist.take(3) == Seq("create", "append", "append") &&
        hist.contains("create"), hist.mkString(","))
      // SQL DELETE = the copy-on-write band delete (exact conversion or
      // loud refusal — a delete may not approximate); the deleted state
      // stays a travel coordinate
      spark.sql("""INSERT INTO graftz.lake.t1
        SELECT id, id % 3, concat('y', id) FROM range(50, 1000)""")
      spark.sql("DELETE FROM graftz.lake.t1 WHERE k1 BETWEEN 100 AND 199")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 900)
      spark.sql("DELETE FROM graftz.lake.t1 WHERE k1 = 500 AND k2 = 2")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 899)
      val eDel = intercept[Exception] {
        spark.sql("DELETE FROM graftz.lake.t1 WHERE k1 > 5 OR k2 = 1")
      }
      assert(eDel.getMessage.toLowerCase.contains("delete"),
        eDel.getMessage)
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 899, "a refused DELETE must change nothing")
      // maintenance verbs in pure SQL: CALL procedures (Spark 4's
      // ProcedureCatalog — the piece Delta needs a parser extension for)
      val folded = spark.sql(
        "CALL graftz.optimize(tbl => 'lake.t1', small_bytes => 16777216)")
        .head().getLong(0)
      assert(folded >= 2, s"optimize folded $folded small files")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 899, "optimize changed visible rows")
      // restore by CALL: roll the table back to the pre-DELETE snapshot
      val hist2 = spark.read.format("graft-z").option("history", true)
        .load(s"$root/lake/t1").collect()
      val (de, dv) = { // the coordinate just before the first delete
        val r = hist2.filter(_.getString(2) == "delete").head
        val prev = hist2.filter(x => x.getLong(0) < r.getLong(0))
          .maxBy(x => (x.getLong(0), x.getLong(1)))
        (prev.getLong(0), prev.getLong(1))
      }
      val restored = spark.sql(
        s"CALL graftz.restore(tbl => 'lake.t1', epoch => $de, version => $dv)")
        .head().getLong(0)
      assert(restored == 1000, s"restore brought back $restored rows")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 1000)
      // vacuum with a huge retention window removes nothing
      assert(spark.sql(
        "CALL graftz.vacuum(tbl => 'lake.t1', min_age_ms => 86400000)")
        .head().getLong(0) == 0L)
      val eProc = intercept[Exception] {
        spark.sql("CALL graftz.flurble(tbl => 'lake.t1')")
      }
      assert(eProc.getMessage.contains("flurble"), eProc.getMessage)
      // DESCRIBE HISTORY reachable from pure SQL too
      val histOps = spark.sql("CALL graftz.history(tbl => 'lake.t1')")
        .select(col("op")).collect().map(_.getString(0)).toSeq
      assert(histOps.head == "create" && histOps.contains("delete") &&
        histOps.contains("restore"), histOps.mkString(","))
      // ALTER TABLE ADD COLUMN: metadata-only evolution — old rows read
      // null, new batches carry values; everything else refuses
      spark.sql("ALTER TABLE graftz.lake.t1 ADD COLUMN extra BIGINT")
      assert(spark.sql(
        "SELECT count(*) FROM graftz.lake.t1 WHERE extra IS NULL")
        .head().getLong(0) == 1000, "pre-evolution rows must read null")
      spark.sql("""INSERT INTO graftz.lake.t1
        SELECT id, id % 3, concat('e', id), 7L FROM range(5000, 5010)""")
      assert(spark.sql(
        "SELECT count(*) FROM graftz.lake.t1 WHERE extra = 7")
        .head().getLong(0) == 10)
      val eAlter = intercept[Exception] {
        spark.sql("ALTER TABLE graftz.lake.t1 RENAME COLUMN extra TO e2")
      }
      assert(eAlter.getMessage.contains("add-only"), eAlter.getMessage)
      val eAlter2 = intercept[Exception] {
        spark.sql("ALTER TABLE graftz.lake.t1 ADD COLUMN dup ARRAY<INT>")
      }
      assert(eAlter2.getMessage.contains("wire surface"), eAlter2.getMessage)
      // TRUNCATE = rebuild to empty (schema + clustering policy survive)
      spark.sql("TRUNCATE TABLE graftz.lake.t1")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 0)
      spark.sql("""INSERT INTO graftz.lake.t1
        SELECT id, id, concat('z', id), CAST(NULL AS BIGINT)
        FROM range(10)""")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 10)
      // refusal shapes: missing clustering declaration, ALTER, RENAME
      val e1 = intercept[Exception] {
        spark.sql("CREATE TABLE graftz.lake.bad (a BIGINT, b STRING)")
      }
      assert(e1.getMessage.contains("PARTITIONED BY"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("CREATE TABLE graftz.lake.bad (a BIGINT, b STRING) " +
          "PARTITIONED BY (b)")
      }
      assert(e2.getMessage.contains("BIGINT"), e2.getMessage)
      spark.sql("DROP TABLE graftz.lake.t1")
      intercept[Exception] {
        spark.sql("SELECT * FROM graftz.lake.t1").collect()
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.graftz")
      spark.conf.unset("spark.sql.catalog.graftz.root")
    }
  }
}
