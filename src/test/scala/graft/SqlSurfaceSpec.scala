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
      // a DELETE the exact-band conversion can NOT express (OR) falls
      // through to the GROUP-BASED copy-on-write row-level operation
      // (since r13) instead of refusing: same rows gone, exact semantics
      spark.sql("DELETE FROM graftz.lake.t1 WHERE k1 = 600 OR k1 = 601")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 897,
        "an OR-shaped DELETE must run group-based")
      // maintenance verbs in pure SQL: CALL procedures (Spark 4's
      // ProcedureCatalog — the piece Delta needs a parser extension for)
      val folded = spark.sql(
        "CALL graftz.optimize(tbl => 'lake.t1', small_bytes => 16777216)")
        .head().getLong(0)
      assert(folded >= 2, s"optimize folded $folded small files")
      assert(spark.sql("SELECT count(*) FROM graftz.lake.t1")
        .head().getLong(0) == 897, "optimize changed visible rows")
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
      // column RENAME/DROP are SUPPORTED since r16 (column mapping —
      // metadata-only commits; the r13 add-only-forever decision was
      // revisited when it became the last Delta-parity hole). The
      // dedicated lifecycle test below pins them; here pin that the
      // renamed/dropped surface keeps working in THIS table's flow.
      spark.sql("ALTER TABLE graftz.lake.t1 RENAME COLUMN extra TO e2")
      assert(spark.sql(
        "SELECT count(*) FROM graftz.lake.t1 WHERE e2 = 7")
        .head().getLong(0) == 10)
      spark.sql("ALTER TABLE graftz.lake.t1 RENAME COLUMN e2 TO extra")
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

  test("graftz catalog: SQL UPDATE / MERGE INTO — group-based copy-on-write row-level operations") {
    import org.apache.spark.sql.functions._
    import graft.sources.ZOrder
    val root = java.nio.file.Files.createTempDirectory("graft-zdml").toString
    spark.conf.set("spark.sql.catalog.graftdml", "graft.sources.ZCatalog")
    spark.conf.set("spark.sql.catalog.graftdml.root", root)
    try {
      val dir = s"$root/dml/t"
      spark.sql("CREATE NAMESPACE graftdml.dml")
      spark.sql("""CREATE TABLE graftdml.dml.t
        (k BIGINT, grp BIGINT, v BIGINT, s STRING) PARTITIONED BY (k, grp)""")
      spark.sql("""INSERT INTO graftdml.dml.t
        SELECT id, id % 10, id * 2, concat('s', id) FROM range(1000)""")
      val filesBefore = ZOrder.listDataFiles(spark, dir).toSet

      // UPDATE with arithmetic SET expressions and a band condition
      spark.sql("""UPDATE graftdml.dml.t
        SET v = v + 1000, s = concat(s, '!') WHERE k BETWEEN 100 AND 199""")
      assert(spark.sql(
        "SELECT count(*) FROM graftdml.dml.t WHERE s LIKE '%!'")
        .head().getLong(0) == 100)
      val wantSum = (0 until 1000).map(_ * 2L).sum + 100 * 1000L
      assert(spark.sql("SELECT sum(v) FROM graftdml.dml.t")
        .head().getLong(0) == wantSum, "UPDATE must touch only the band")
      assert(spark.sql("SELECT count(*) FROM graftdml.dml.t")
        .head().getLong(0) == 1000, "UPDATE must not change cardinality")
      // copy-on-write at FILE granularity: the band's files rewrote, the
      // rest carried by reference into the new epoch
      val filesAfter = ZOrder.listDataFiles(spark, dir).toSet
      // a 10% band on a 2-D z-curve overlaps more than 10% of files (k
      // interleaves with grp), but far less than all of them
      val carried = (filesBefore intersect filesAfter).size
      assert(carried >= filesBefore.size / 2 && carried < filesBefore.size,
        s"banded UPDATE must rewrite O(band) files: ${filesBefore.size} " +
          s"before, $carried carried")
      // ... and the pre-update state is still a travel coordinate
      val hist = ZOrder.describeHistory(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(hist.exists(_._3 == "update"), hist.mkString(","))
      val (pe, pv, _) = hist.filter(_._3 != "update")
        .maxBy(h => (h._1, h._2))
      assert(spark.sql("SELECT sum(v) FROM graftdml.dml.t " +
        s"VERSION AS OF '$pe:$pv'").head().getLong(0) ==
        (0 until 1000).map(_ * 2L).sum)

      // an UPDATE whose condition provably matches no file is a no-op:
      // no new epoch, no version, no rewrite
      val versBefore = ZOrder.listVersions(spark, dir)
      spark.sql("UPDATE graftdml.dml.t SET v = 0 WHERE k = 123456")
      assert(ZOrder.listVersions(spark, dir) == versBefore,
        "a no-match UPDATE must not commit anything")

      // MERGE INTO: matched rows update, unmatched source rows insert
      spark.range(990, 1010)
        .selectExpr("id AS k", "id % 10 AS grp", "id * 100 AS v",
          "concat('m', id) AS s")
        .createOrReplaceTempView("updates")
      spark.sql("""MERGE INTO graftdml.dml.t t USING updates u ON t.k = u.k
        WHEN MATCHED THEN UPDATE SET v = u.v, s = u.s
        WHEN NOT MATCHED THEN INSERT (k, grp, v, s)
          VALUES (u.k, u.grp, u.v, u.s)""")
      assert(spark.sql("SELECT count(*) FROM graftdml.dml.t")
        .head().getLong(0) == 1010, "10 source rows must INSERT")
      // runtime GROUP filtering: the merge condition can never push
      // statically, but the dynamic-pruning subquery narrows the rewrite
      // to the files actually holding matched keys (990-999 = the top
      // z-band) — most files must carry by reference
      val filesPostMerge = ZOrder.listDataFiles(spark, dir).toSet
      val carriedMerge = (filesAfter intersect filesPostMerge).size
      assert(carriedMerge >= filesAfter.size / 2 &&
        carriedMerge < filesAfter.size,
        s"MERGE must rewrite O(matched files): ${filesAfter.size} before, " +
          s"$carriedMerge carried")
      assert(spark.sql(
        "SELECT count(*) FROM graftdml.dml.t WHERE s LIKE 'm%'")
        .head().getLong(0) == 20, "20 source rows must land their s")
      assert(spark.sql(
        "SELECT sum(v) FROM graftdml.dml.t WHERE k >= 990")
        .head().getLong(0) == (990 until 1010).map(_ * 100L).sum)
      assert(spark.sql(
        "SELECT count(*) FROM graftdml.dml.t WHERE s LIKE '%!'")
        .head().getLong(0) == 100, "MERGE must not disturb earlier rows")

      // MERGE with WHEN NOT MATCHED BY SOURCE (delete stragglers)
      spark.sql("""MERGE INTO graftdml.dml.t t USING updates u ON t.k = u.k
        WHEN MATCHED THEN UPDATE SET v = u.v
        WHEN NOT MATCHED BY SOURCE AND t.k >= 1000 THEN DELETE""")
      assert(spark.sql("SELECT count(*) FROM graftdml.dml.t")
        .head().getLong(0) == 1010,
        "k >= 1000 rows all came from `updates`; none may delete")

      // the change-feed switch through the CALL surface: DML after
      // enabling records its change set (the Delta enableChangeDataFeed
      // lifecycle in pure SQL); the pre-enable DMLs recorded nothing
      assert(!new java.io.File(dir, "_zchanges").exists)
      assert(spark.sql("CALL graftdml.set_change_feed(tbl => 'dml.t', " +
        "enabled => true)").head().getBoolean(0))
      spark.sql("UPDATE graftdml.dml.t SET v = v + 1 WHERE k = 5")
      val feedE = ZOrder.listVersions(spark, dir).map(_._1).max
      assert(new java.io.File(dir, s"_zchanges/e$feedE").exists,
        "an enabled table's DML must record its change set")
      // the group-based SQL path pairs EXACT pre/postimages on the
      // hidden stable row id (r15 — it used to emit a multiset
      // delete+insert because no identity existed to pair on), and
      // carried-unchanged rows of the scanned files emit NOTHING
      val feed = ZOrder.readChangeFeed(spark, dir, feedE - 1, 0)
        .groupBy(org.apache.spark.sql.functions.col("_change_type"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(feed ==
        Map("update_preimage" -> 1L, "update_postimage" -> 1L),
        feed.toString)

      // CHECK constraints — added through the CALL surface — validate
      // the REPLACEMENT rows before a byte lands: an UPDATE that would
      // violate refuses and changes nothing
      assert(spark.sql("CALL graftdml.add_constraint(tbl => 'dml.t', " +
        "name => 'v_nonneg', expr => 'v >= 0')").head().getLong(0) == 1L)
      val before = spark.sql("SELECT sum(v) FROM graftdml.dml.t")
        .head().getLong(0)
      val eCon = intercept[Exception] {
        spark.sql("UPDATE graftdml.dml.t SET v = -1 WHERE k = 10")
      }
      assert(eCon.getMessage.contains("v_nonneg"), eCon.getMessage)
      assert(spark.sql("SELECT sum(v) FROM graftdml.dml.t")
        .head().getLong(0) == before,
        "a CHECK-refused UPDATE must change nothing")
      // list → drop → the formerly-violating UPDATE lands
      assert(spark.sql("CALL graftdml.list_constraints(tbl => 'dml.t')")
        .collect().map(_.getString(0)).toSeq == Seq("v_nonneg"))
      assert(spark.sql("CALL graftdml.drop_constraint(tbl => 'dml.t', " +
        "name => 'v_nonneg')").head().getLong(0) == 1L)
      spark.sql("UPDATE graftdml.dml.t SET v = -1 WHERE k = 10")
      assert(spark.sql("SELECT sum(v) FROM graftdml.dml.t")
        .head().getLong(0) == before - 21,
        "the post-drop UPDATE must land (k=10 held v=20)")

      // a row-level verb against a travel-pinned table refuses
      val eTv = intercept[Exception] {
        spark.sql(s"UPDATE graftdml.dml.t VERSION AS OF '$pe:$pv' SET v = 0")
      }
      assert(eTv != null)
    } finally {
      spark.conf.unset("spark.sql.catalog.graftdml")
      spark.conf.unset("spark.sql.catalog.graftdml.root")
    }
  }

  test("MERGE INTO schema evolution is REFUSED, pinned both ways: a NOT MATCHED INSERT naming a new column fails at analysis; extra source columns not named pass through") {
    val root = java.nio.file.Files.createTempDirectory("graft-zmev").toString
    spark.conf.set("spark.sql.catalog.graftmev", "graft.sources.ZCatalog")
    spark.conf.set("spark.sql.catalog.graftmev.root", root)
    try {
      spark.sql("CREATE NAMESPACE graftmev.dml")
      spark.sql("""CREATE TABLE graftmev.dml.t
        (k BIGINT, v BIGINT) PARTITIONED BY (k)""")
      spark.sql(
        "INSERT INTO graftmev.dml.t SELECT id, id * 2 FROM range(100)")
      spark.range(90, 110)
        .selectExpr("id AS k", "id * 100 AS v", "concat('n', id) AS note")
        .createOrReplaceTempView("mev_src")
      // the chosen contract (r13 verdict item 3): SQL MERGE does NOT
      // evolve the table schema — a NOT MATCHED INSERT that names a
      // column the table lacks refuses at ANALYSIS (Spark resolves the
      // assignment list against the table schema before the connector
      // sees anything), and the table is untouched. Add-only evolution
      // remains the programmatic path: StoreMaint.evolveSchema /
      // ZOrder.mergeByKey with an evolving source.
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("""MERGE INTO graftmev.dml.t t USING mev_src u
          ON t.k = u.k
          WHEN MATCHED THEN UPDATE SET v = u.v
          WHEN NOT MATCHED THEN INSERT (k, v, note)
            VALUES (u.k, u.v, u.note)""")
      }
      assert(e.getMessage.toLowerCase.contains("note"), e.getMessage)
      assert(spark.sql("SELECT count(*) FROM graftmev.dml.t")
        .head().getLong(0) == 100, "a refused MERGE must change nothing")
      assert(spark.sql("SELECT sum(v) FROM graftmev.dml.t")
        .head().getLong(0) == (0 until 100).map(_ * 2L).sum)
      // a source CARRYING extra columns is fine as long as the merge
      // only names table columns — the extra column is simply unused
      spark.sql("""MERGE INTO graftmev.dml.t t USING mev_src u ON t.k = u.k
        WHEN MATCHED THEN UPDATE SET v = u.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (u.k, u.v)""")
      assert(spark.sql("SELECT count(*) FROM graftmev.dml.t")
        .head().getLong(0) == 110)
      assert(spark.sql("SELECT sum(v) FROM graftmev.dml.t WHERE k >= 90")
        .head().getLong(0) == (90 until 110).map(_ * 100L).sum)
      // and the schema did not evolve
      assert(!spark.table("graftmev.dml.t").schema.fieldNames
        .contains("note"))
    } finally {
      spark.conf.unset("spark.sql.catalog.graftmev")
      spark.conf.unset("spark.sql.catalog.graftmev.root")
    }
  }

  test("graftz catalog: CTAS, DESCRIBE/SHOW CREATE layout surface, unconditional DELETE") {
    val root = java.nio.file.Files.createTempDirectory("graft-zinfo").toString
    spark.conf.set("spark.sql.catalog.graftinfo", "graft.sources.ZCatalog")
    spark.conf.set("spark.sql.catalog.graftinfo.root", root)
    try {
      spark.sql("CREATE NAMESPACE graftinfo.lake")
      spark.sql("""CREATE TABLE graftinfo.lake.src
        (k1 BIGINT, k2 BIGINT, s STRING) PARTITIONED BY (k1, k2)""")
      spark.sql("""INSERT INTO graftinfo.lake.src
        SELECT id, id % 8, concat('x', id) FROM range(200)""")

      // CTAS: schema + rows from the query, clustering keys recorded
      spark.sql("""CREATE TABLE graftinfo.lake.ctas PARTITIONED BY (k1)
        AS SELECT k1, s FROM graftinfo.lake.src""")
      assert(spark.sql("SELECT count(*) FROM graftinfo.lake.ctas")
        .head().getLong(0) == 200)
      val ctasProps = spark.sql("SHOW TBLPROPERTIES graftinfo.lake.ctas")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(ctasProps.get("z.clustering").contains("k1"),
        s"CTAS must record its clustering keys: $ctasProps")

      // DESCRIBE EXTENDED / SHOW CREATE TABLE show the store layout —
      // the informational surface a SQL user reads instead of manifests
      val desc = spark.sql("DESCRIBE TABLE EXTENDED graftinfo.lake.src")
        .collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("# Partition Information"), desc)
      val ddl = spark.sql("SHOW CREATE TABLE graftinfo.lake.src")
        .head().getString(0)
      assert(ddl.contains("PARTITIONED BY (k1, k2)"), ddl)
      assert(ddl.contains("'z.clustering' = 'k1,k2'"), ddl)
      val props = spark.sql("SHOW TBLPROPERTIES graftinfo.lake.src")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("z.epoch").contains("0") &&
        props.contains("z.versions"), props.toString)

      // `_file` is reserved (the row-metadata column the row-level
      // rewrite prunes by — a data column would shadow it)
      val eRes = intercept[Exception] {
        spark.sql("""CREATE TABLE graftinfo.lake.bad
          (k1 BIGINT, _file STRING) PARTITIONED BY (k1)""")
      }
      assert(eRes.getMessage.contains("reserved"), eRes.getMessage)

      // unconditional DELETE = the truncate path (new epoch; the old one
      // remains a travel coordinate)
      spark.sql("DELETE FROM graftinfo.lake.ctas")
      assert(spark.sql("SELECT count(*) FROM graftinfo.lake.ctas")
        .head().getLong(0) == 0)
      // v0 is CTAS's empty create-commit; v1 is the query's write
      assert(spark.sql(
        "SELECT count(*) FROM graftinfo.lake.ctas VERSION AS OF '0:1'")
        .head().getLong(0) == 200,
        "pre-delete snapshot must stay reachable")
    } finally {
      spark.conf.unset("spark.sql.catalog.graftinfo")
      spark.conf.unset("spark.sql.catalog.graftinfo.root")
    }
  }

  test("graftz catalog: ALTER TABLE RENAME/DROP COLUMN — metadata-only column mapping through SQL") {
    val root = java.nio.file.Files.createTempDirectory("graft-zcatmap").toString
    spark.conf.set("spark.sql.catalog.graftmap", "graft.sources.ZCatalog")
    spark.conf.set("spark.sql.catalog.graftmap.root", root)
    try {
      spark.sql("CREATE NAMESPACE graftmap.lake")
      spark.sql("""CREATE TABLE graftmap.lake.t
        (k BIGINT, v BIGINT, s STRING) PARTITIONED BY (k)""")
      spark.sql("""INSERT INTO graftmap.lake.t
        SELECT id, id % 100, concat('x', id) FROM range(1000)""")
      val dir = s"$root/lake/t"
      val filesBefore = graft.sources.ZOrder.listDataFiles(spark, dir)

      spark.sql("ALTER TABLE graftmap.lake.t RENAME COLUMN v TO score")
      // metadata-only: zero data files touched
      assert(graft.sources.ZOrder.listDataFiles(spark, dir) == filesBefore)
      assert(spark.table("graftmap.lake.t").columns.toSeq ==
        Seq("k", "score", "s"))
      // filters on the NEW name answer (and prune) via the OLD stats
      assert(spark.sql(
        "SELECT count(*) FROM graftmap.lake.t WHERE score = 55")
        .head().getLong(0) == 10)
      assert(spark.sql(
        "SELECT sum(score) FROM graftmap.lake.t WHERE k BETWEEN 0 AND 9")
        .head().getLong(0) == 45)
      // the old name is gone from the SQL surface
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT v FROM graftmap.lake.t").collect() }
      // INSERT after the rename speaks the new name
      spark.sql("""INSERT INTO graftmap.lake.t
        SELECT id, id % 100, concat('x', id) FROM range(1000, 1100)""")
      assert(spark.sql("SELECT count(*) FROM graftmap.lake.t")
        .head().getLong(0) == 1100)
      // SQL row-level UPDATE through the mapped schema
      spark.sql("UPDATE graftmap.lake.t SET score = score + 1000 " +
        "WHERE k BETWEEN 0 AND 4")
      assert(spark.sql(
        "SELECT count(*) FROM graftmap.lake.t WHERE score >= 1000")
        .head().getLong(0) == 5)

      spark.sql("ALTER TABLE graftmap.lake.t DROP COLUMN s")
      assert(spark.table("graftmap.lake.t").columns.toSeq ==
        Seq("k", "score"))
      // the retired physical slots may not be re-added
      def chainMsg(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(_.getMessage).mkString(" | ")
      val ex = intercept[Exception] {
        spark.sql("ALTER TABLE graftmap.lake.t ADD COLUMNS (v BIGINT)") }
      assert(chainMsg(ex).contains("retired"), chainMsg(ex))
      val ex2 = intercept[Exception] {
        spark.sql("ALTER TABLE graftmap.lake.t ADD COLUMNS (s STRING)") }
      assert(chainMsg(ex2).contains("retired"), chainMsg(ex2))
      // TYPE WIDENING through SQL: metadata-only promotion; narrowing
      // refuses (r16 item 6 — the same _zschema machinery)
      spark.sql("ALTER TABLE graftmap.lake.t ALTER COLUMN score TYPE BIGINT")
      assert(spark.table("graftmap.lake.t").schema("score").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(spark.sql(
        "SELECT count(*) FROM graftmap.lake.t WHERE score >= 1000")
        .head().getLong(0) == 5)
      val exW = intercept[Exception] {
        spark.sql("ALTER TABLE graftmap.lake.t ALTER COLUMN score TYPE INT") }
      // Spark's analyzer refuses the down-cast before the catalog can
      // (NOT_SUPPORTED_CHANGE_COLUMN); the catalog's own narrowing
      // refusal is pinned programmatically in ZOrderSpec
      assert(chainMsg(exW).contains("narrow") ||
        chainMsg(exW).contains("NOT_SUPPORTED_CHANGE_COLUMN"), chainMsg(exW))
      // DESCRIBE HISTORY records both ops
      val hist = graft.sources.ZOrder.describeHistory(spark, dir)
        .select(org.apache.spark.sql.functions.col("op"))
        .collect().map(_.getString(0)).toSeq
      assert(hist.contains("rename-column") && hist.contains("drop-column"),
        hist.toString)
      // time travel through the catalog shows the PAST's names
      // (coordinate 1 = the first INSERT; coordinate 0 is the empty CREATE)
      val (e0, v0) = graft.sources.ZOrder.listVersions(spark, dir)(1)
      val past = spark.sql(
        s"SELECT * FROM graftmap.lake.t VERSION AS OF '$e0:$v0'")
      assert(past.columns.toSeq == Seq("k", "v", "s"), past.columns.toSeq)
      assert(past.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.catalog.graftmap")
      spark.conf.unset("spark.sql.catalog.graftmap.root")
    }
  }
}
