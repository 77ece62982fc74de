package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The group-based row-level operation's commit contract
  * ([[ZOrder.replaceScannedFiles]]): scan-snapshot vs commit-time world
  * reconciliation, concurrent-append rollforward, staging hygiene. Lives
  * in `graft.sources` to drive the private scan/commit halves directly —
  * the SQL-visible behavior is pinned in SqlSurfaceSpec and q154. */
class ZRowLevelSpec extends SparkSpec {

  private def mkStore(n: Long): String = {
    val dir = Files.createTempDirectory("graft-zrlo").toString
    ZOrder.writeZOrdered(
      spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v")),
      dir, Seq("k"), 4)
    dir
  }

  test("a concurrent CONFLICTING rewrite between scan and commit refuses loudly; a DISJOINT one rebases and both land (r15 OCC)") {
    val dir = mkStore(1000)
    val (snap, files, schema) =
      ZOrder.planRowLevelScan(spark, dir, Seq(("k", Some(100L), Some(199L))),
        Seq.empty)
    assert(files.nonEmpty)
    // a concurrent writer REPLACES the scanned files (a full rebuild)
    // after the scan resolved its snapshot: the replacement rows
    // describe a table that no longer exists — refuse, land nothing
    ZOrder.writeZOrdered(
      spark.range(500).select(col("id").as("k"), (col("id") * 2).as("v")),
      dir, Seq("k"), 4)
    val replacement = spark.range(100, 200)
      .select(col("id").as("k"), lit(-1L).as("v"))
    val e = intercept[ZOrder.ConcurrentZRewriteException] {
      ZOrder.replaceScannedFiles(spark, dir, snap, files.map(_._1),
        replacement, "update")
    }
    assert(e.getMessage.contains("concurrent"), e.getMessage)
    // nothing landed: the table is exactly the rewrite's 500 rows
    assert(ZOrder.readSnapshot(spark, dir).count() == 500)
    assert(ZOrder.readSnapshot(spark, dir)
      .filter(col("v") === -1L).count() == 0)
    // DISJOINT concurrency rebases: a new scan, then a concurrent
    // delete of a DIFFERENT band commits first — the row-level commit
    // must land ON TOP of it (both effects visible), not refuse
    val (snap2, files2, schema2) =
      ZOrder.planRowLevelScan(spark, dir, Seq(("k", Some(0L), Some(99L))),
        Seq.empty)
    assert(files2.nonEmpty)
    val disjointDeleted = ZOrder.deleteZRange(spark, dir,
      Seq(("k", 400L, 499L)), Seq("k"))
    assert(disjointDeleted == 100L)
    // files2 (the low band) must have survived the high-band delete —
    // otherwise this scenario is silently the conflicting one
    val live = ZOrder.listDataFiles(spark, dir).toSet
    assert(files2.map(_._1).forall(live.contains),
      "precondition: the delete must not touch the scanned files")
    val scanned2 = spark.read.schema(schema2)
      .parquet(files2.map(f => s"$dir/${f._1}"): _*)
    val replacement2 = scanned2.select(col("k"),
      when(col("k").between(0L, 99L), lit(-7L)).otherwise(col("v")).as("v"))
    ZOrder.replaceScannedFiles(spark, dir, snap2, files2.map(_._1),
      replacement2, "update")
    val after = ZOrder.readSnapshot(spark, dir)
    assert(after.count() == 400, s"got ${after.count()}") // 500 - 100
    assert(after.filter(col("v") === -7L).count() == 100,
      "the row-level update must land")
    assert(after.filter(col("k").between(400L, 499L)).count() == 0,
      "the concurrent disjoint delete must land too")
  }

  test("a concurrent lock-free APPEND between scan and commit rolls forward: no row lost, the operation's rewrite lands") {
    val dir = mkStore(1000)
    val bounds = Seq(("k", Some(0L), Some(99L)))
    val (snap, files, schema) =
      ZOrder.planRowLevelScan(spark, dir, bounds, Seq.empty)
    // a concurrent appender lands AFTER the scan's snapshot resolved
    ZOrder.appendZOrdered(
      spark.range(5000, 5100).select(col("id").as("k"),
        (col("id") * 2).as("v")),
      dir, Seq("k"), 1, Seq.empty, Some("late-append"))
    // the operation's replacement: the scanned band with v zeroed, plus
    // the scanned files' untouched rows carried through (what Spark's
    // ReplaceData computes) — here simulated over the scanned file set
    val scanned = spark.read.schema(schema)
      .parquet(files.map(f => s"$dir/${f._1}"): _*)
    val replacement = scanned.select(col("k"),
      when(col("k").between(0L, 99L), lit(0L)).otherwise(col("v")).as("v"))
    ZOrder.replaceScannedFiles(spark, dir, snap, files.map(_._1),
      replacement, "update")
    val after = ZOrder.readSnapshot(spark, dir)
    assert(after.count() == 1100, "the concurrent append must roll forward")
    assert(after.filter(col("k") >= 5000L).count() == 100)
    assert(after.filter(col("v") === 0L).count() == 100,
      "the operation's own rewrite must land")
    // ... and the rolled-forward append keeps its exactly-once tag: a
    // replay of the same tagged batch stays a no-op
    ZOrder.appendZOrdered(
      spark.range(5000, 5100).select(col("id").as("k"),
        (col("id") * 2).as("v")),
      dir, Seq("k"), 1, Seq.empty, Some("late-append"))
    assert(ZOrder.readSnapshot(spark, dir).count() == 1100,
      "a replayed tagged append after the rollforward must not re-land")
  }

  test("SQL row-level statements leave no staging residue under _ztmp (success AND refusal paths)") {
    val root = Files.createTempDirectory("graft-zrlostage").toString
    spark.conf.set("spark.sql.catalog.graftrlo", "graft.sources.ZCatalog")
    spark.conf.set("spark.sql.catalog.graftrlo.root", root)
    try {
      spark.sql("CREATE NAMESPACE graftrlo.ns")
      spark.sql("""CREATE TABLE graftrlo.ns.t (k BIGINT, v BIGINT)
        PARTITIONED BY (k)""")
      spark.sql("INSERT INTO graftrlo.ns.t SELECT id, id FROM range(100)")
      spark.sql("UPDATE graftrlo.ns.t SET v = v + 1 WHERE k < 50")
      ZOrder.addCheckConstraint(spark, s"$root/ns/t", "v_pos", "v >= 0")
      intercept[Exception] {
        spark.sql("UPDATE graftrlo.ns.t SET v = -5 WHERE k = 1")
      }
      val tmp = new Path(s"$root/ns/t/_ztmp")
      val fs = tmp.getFileSystem(spark.sessionState.newHadoopConf())
      assert(!fs.exists(tmp) || fs.listStatus(tmp).isEmpty,
        "row-level staging dirs must be cleaned on commit AND abort")
      assert(spark.sql(
        "SELECT sum(v) FROM graftrlo.ns.t").head().getLong(0) ==
        (0 until 100).map(_.toLong).sum + 50,
        "the refused UPDATE must have changed nothing")
    } finally {
      spark.conf.unset("spark.sql.catalog.graftrlo")
      spark.conf.unset("spark.sql.catalog.graftrlo.root")
    }
  }

  test("_file metadata column: SELECT _file matches the manifest's file identities; a data column shadows it") {
    val dir = mkStore(500)
    val got = spark.read.format("graft-z").load(dir)
      .select(org.apache.spark.sql.functions.col("_file"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(got == ZOrder.listDataFiles(spark, dir).toSet,
      "_file must be the store-relative manifest identity")
    // per-row consistency: every row's _file really contains that row
    val sample = spark.read.format("graft-z").load(dir)
      .filter(col("k") === 123L)
      .select(col("_file"), col("k")).head()
    val inFile = spark.read.parquet(s"$dir/${sample.getString(0)}")
      .filter(col("k") === 123L).count()
    assert(inFile == 1L, "_file must name the file holding the row")
  }

  test("stable row identity (r15): two IDENTICAL rows update distinguishably through SQL — keyed pre/postimages on __rid, ids stable across the rewrite") {
    val root = Files.createTempDirectory("graft-zridsql").toString
    val cat = "graftrid" + math.abs(root.hashCode)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.ZCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      spark.sql(s"CREATE NAMESPACE $cat.ns")
      spark.sql(s"""CREATE TABLE $cat.ns.t (k BIGINT, v BIGINT)
        PARTITIONED BY (k) TBLPROPERTIES ('changeFeed' = 'true')""")
      // TWO IDENTICAL rows (k=1, v=10) plus a bystander — the exact case
      // no multiset diff can pair and no key column can distinguish
      spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 10), (1, 10), (2, 20)")
      val ridsBefore = spark.sql(
        s"SELECT __rid FROM $cat.ns.t WHERE k = 1")
        .collect().map(_.getLong(0)).toSet
      assert(ridsBefore.size == 2,
        s"two identical rows must carry two DISTINCT row ids: $ridsBefore")
      spark.sql(s"UPDATE $cat.ns.t SET v = v + 5 WHERE k = 1")
      val dir = s"$root/ns/t"
      val feedE = ZOrder.listVersions(spark, dir).map(_._1).max
      // window from the PRE-UPDATE head (the insert version is history)
      val baseV = ZOrder.listVersions(spark, dir)
        .filter(_._1 == feedE - 1).map(_._2).max
      val feed = ZOrder.readChangeFeed(spark, dir, feedE - 1, baseV)
      val byType = feed.groupBy(col(ZOrder.ChangeTypeCol)).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == Map("update_preimage" -> 2L,
        "update_postimage" -> 2L),
        s"identical rows must pair as keyed images, got $byType")
      assert(feed.filter(col("v") === 10L).count() == 2 &&
        feed.filter(col("v") === 15L).count() == 2)
      // the feed never leaks the hidden id
      assert(!feed.columns.contains(ZOrder.RidCol))
      // IDENTITY STABILITY: the updated rows keep their ids
      val ridsAfter = spark.sql(
        s"SELECT __rid FROM $cat.ns.t WHERE k = 1")
        .collect().map(_.getLong(0)).toSet
      assert(ridsAfter == ridsBefore,
        s"row ids must survive the rewrite: $ridsBefore -> $ridsAfter")
      // the bystander keeps its id too, and all ids stay unique
      val all = spark.sql(s"SELECT __rid FROM $cat.ns.t")
        .collect().map(_.getLong(0))
      assert(all.length == all.distinct.length, "row ids must be unique")
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }

  test("stable row identity survives append, band delete, optimize and recluster; fresh rows mint unique ids") {
    val dir = mkStore(400) // k in [0,400), v = 2k
    def ridMap(): Map[Long, Long] =
      spark.read.format("graft-z").load(dir)
        .select(col("k"), col(ZOrder.RidCol))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = ridMap()
    assert(base.size == 400 && base.values.toSet.size == 400)
    ZOrder.appendZOrdered(
      spark.range(400, 450).select(col("id").as("k"),
        (col("id") * 2).as("v")), dir, Seq("k"), 1)
    val afterAppend = ridMap()
    assert(afterAppend.filterKeys(_ < 400).toMap == base,
      "append must not disturb existing identities")
    assert(afterAppend.values.toSet.size == 450, "fresh ids must be unique")
    ZOrder.deleteZRange(spark, dir, Seq(("k", 100L, 199L)), Seq("k"))
    val afterDelete = ridMap()
    assert(afterDelete == afterAppend.filterKeys(k =>
      k < 100 || k > 199).toMap,
      "survivors of a copy-on-write delete must keep their identities")
    ZOrder.compactSmallFiles(spark, dir, Seq("k"), 1024L * 1024)
    assert(ridMap() == afterDelete,
      "optimize must carry identities through the bin-pack rewrite")
    ZOrder.reclusterZOrdered(spark, dir, Seq("k"), 4)
    assert(ridMap() == afterDelete,
      "recluster must never re-mint row ids")
  }

  test("map-typed schema: SQL-op change set now pairs keyed pre/postimages on __rid (was delete-all+insert-all)") {
    val dir = Files.createTempDirectory("graft-zridmap").toString
    ZOrder.writeZOrdered(
      spark.range(100).select(col("id").as("k"),
        map(lit("n"), col("id")).as("m")),
      dir, Seq("k"), 2)
    ZOrder.setChangeFeedEnabled(spark, dir, on = true)
    val (snap, files, schema) =
      ZOrder.planRowLevelScan(spark, dir, Seq(("k", Some(0L), Some(9L))),
        Seq.empty)
    // the replacement Spark would compute, WITH identity carried (the
    // real SQL path stages __rid through the metadata projection)
    val scanned = spark.read.schema(ZOrder.ridded(schema))
      .parquet(files.map(f => s"$dir/${f._1}"): _*)
    val replacement = scanned.select(col("k"),
      when(col("k") < 10L, map(lit("n"), col("k") + 1000L))
        .otherwise(col("m")).as("m"),
      col(ZOrder.RidCol))
    ZOrder.replaceScannedFiles(spark, dir, snap, files.map(_._1),
      replacement, "update")
    val feedE = ZOrder.listVersions(spark, dir).map(_._1).max
    val feed = ZOrder.readChangeFeed(spark, dir, feedE - 1, 0)
    val byType = feed.groupBy(col(ZOrder.ChangeTypeCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // maps cannot value-compare, so EVERY scanned row pairs (carried
    // pairs fold to a no-op) — but they pair KEYED, never the coarse
    // delete-all+insert-all of the pre-identity fallback
    val scannedRows = scanned.count()
    assert(byType == Map("update_preimage" -> scannedRows,
      "update_postimage" -> scannedRows), byType.toString)
    // and the images FOLD exactly: postimages minus preimages = the delta
    val posts = feed.filter(col(ZOrder.ChangeTypeCol) ===
      "update_postimage").filter(col("k") < 10L)
    assert(posts.count() == 10)
    assert(posts.selectExpr("m['n']").collect()
      .map(_.getLong(0)).sorted.toSeq == (1000L to 1009L).toSeq)
  }

  test("an UPDATE matching no rows in scanned files still commits exact state (best-effort pruning keeps files)") {
    val dir = mkStore(200)
    // bounds that PRUNE nothing (every file overlaps) but match no row:
    // k is even-valued nowhere… use a condition inside range with no hits
    val (snap, files, schema) =
      ZOrder.planRowLevelScan(spark, dir, Seq(("k", Some(50L), Some(50L))),
        Seq.empty)
    // Spark's replacement for "SET v=0 WHERE k=50": all scanned rows,
    // one transformed
    val scanned = spark.read.schema(schema)
      .parquet(files.map(f => s"$dir/${f._1}"): _*)
    val replacement = scanned.select(col("k"),
      when(col("k") === 50L, lit(0L)).otherwise(col("v")).as("v"))
    ZOrder.replaceScannedFiles(spark, dir, snap, files.map(_._1),
      replacement, "update")
    val after = ZOrder.readSnapshot(spark, dir)
    assert(after.count() == 200)
    assert(after.filter(col("k") === 50L).head().getLong(1) == 0L)
    assert(after.filter(col("v") === col("k") * 2).count() == 199)
  }

  test("planted out-of-order runtime group filter: a filter() AFTER the write consumed its target refuses loudly (the scan/write ordering contract)") {
    val dir = mkStore(1000)
    val op = new ZRowLevelOperation(dir,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE)
    val scan = new ZRowLevelScan(op, dir, None,
      Seq(("k", Some(0L), Some(999L))), Seq.empty)
    def groupFilter(keep: Seq[String]) = {
      import org.apache.spark.sql.connector.expressions.Expressions
      import org.apache.spark.sql.connector.expressions.filter.Predicate
      new Predicate("IN",
        (Expressions.column(ZBatch.FileCol).asInstanceOf[
            org.apache.spark.sql.connector.expressions.Expression]
          +: keep.map(f => Expressions.literal(f).asInstanceOf[
              org.apache.spark.sql.connector.expressions.Expression]))
          .toArray)
    }
    // in-order narrowing works (today's Spark call order: plan, filter —
    // possibly repeatedly under AQE — then the write's commit)
    val all = op.planned.get._2
    assert(all.size >= 2)
    assert(scan.planInputPartitions().nonEmpty) // AQE pre-plan is fine
    scan.filter(Array(groupFilter(all.take(1))))
    assert(op.planned.get._2 == all.take(1))
    assert(scan.planInputPartitions().nonEmpty)
    // once the write's commit consumed the planned target, a late filter
    // must fail loudly, not silently desynchronize scan and write
    op.targetConsumed = true
    val e = intercept[IllegalStateException] {
      scan.filter(Array(groupFilter(all)))
    }
    assert(e.getMessage.contains("AFTER the write committed"),
      e.getMessage)
    assert(op.planned.get._2 == all.take(1),
      "the planned set must be untouched by the refused filter")
  }

  test("change feed delivers a RACED lock-free append exactly once: base versions cap at the rebase watermark, the rolled copy emits from the new epoch") {
    import ZOrder.{ChangeTypeCol, CommitEpochCol}
    val dir = java.nio.file.Files.createTempDirectory("graft-zrowcdfrace").toString
    ZOrder.setChangeFeedEnabled(spark, dir, on = true)
    ZOrder.writeZOrdered(spark.range(100)
      .select(col("id").as("k"), (col("id") * 2).as("v")), dir, Seq("k"), 4)
    // a row-level scan resolves its snapshot, then an append races in
    val (snap, files, schema) = ZOrder.planRowLevelScan(spark, dir,
      Seq(("k", Some(0L), Some(9L))), Seq.empty)
    ZOrder.appendZOrdered(spark.range(900, 910)
      .select(col("id").as("k"), lit(7L).as("v")), dir, Seq("k"), 1,
      Seq.empty, Some("raced"))
    // the DML commits against its scan snapshot; the raced append rolls
    // forward into the new epoch
    val scanned = spark.read.schema(schema)
      .parquet(files.map(f => s"$dir/${f._1}"): _*)
    val replacement = scanned.filter(col("k") >= 5L) // delete k in [0,4]
    ZOrder.replaceScannedFiles(spark, dir, snap, files.map(_._1),
      replacement, "delete")
    val feed = ZOrder.readChangeFeed(spark, dir, 0, 0)
      .select(col("k"), col(ChangeTypeCol)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // raced rows appear EXACTLY once, as inserts, and the deletes land
    val racedRows = feed.filter { case (k, _) => k >= 900L }
    assert(racedRows.length == 10, s"raced rows seen ${racedRows.length}x")
    assert(racedRows.forall(_._2 == "insert"))
    assert(feed.filter(_._2 == "delete").map(_._1).sorted.toSeq ==
      (0L until 5L).toSeq, feed.filter(_._2 == "delete").mkString(","))
    assert(ZOrder.readSnapshot(spark, dir).count() == 105)
  }

}
