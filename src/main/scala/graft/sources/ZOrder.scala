package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructType}
import org.apache.spark.storage.StorageLevel

import graft.{Q, Tables}

/** Multi-dimensional clustering + file-level data skipping: the
  * OPTIMIZE-ZORDER shape of the lakehouse world (Delta/Iceberg publish the
  * same recipe — Morton-interleave the clustering keys, range-partition by
  * the interleaved value, keep per-file min/max stats in a manifest the
  * reader prunes against). A single-column sort gives tight file ranges on
  * ONE column; the z-curve gives usefully-tight ranges on EVERY clustered
  * column at once, so a 100 TB fact table serves selective predicates on
  * either key by opening a small fraction of its files — the planted
  * negative in ZOrderSpec shows the linear layout reading 100% of files
  * for the second column where the z-layout prunes.
  *
  * The z-value is layout-internal (never an output), so it needs no oracle
  * mirroring; correctness of the SKIPPING itself is under q123's exact
  * oracle — a manifest that pruned a file containing matching rows would
  * hash-fail against the plain-filter SQL.
  *
  * ON-DISK LAYOUT — the manifest is the COMMIT LOG, epochs make rebuilds
  * a versioned swap:
  * {{{
  *   root/
  *     d-<uuid>/part-*.parquet     one immutable data dir per write batch
  *     _zmanifest/e<E>/v<N>/       per-version stats parquet; committed
  *                                 when its _SUCCESS exists
  * }}}
  * Readers resolve the HIGHEST epoch with a committed `v0`, then union
  * that epoch's committed versions; they trust ONLY manifest-listed files.
  * So:
  *  - an append becomes visible atomically when its `v<N>` commits; a
  *    crash before that leaves an invisible data dir (never a partial
  *    batch), and the RETRY lands the rows exactly once —
  *    availability-biased "read unknown files too" would double them;
  *  - a rebuild/re-cluster ([[reclusterZOrdered]], [[writeZOrdered]] over
  *    an existing store) writes fresh data dirs and commits a NEW epoch:
  *    a concurrent reader resolves the old epoch or the new one, never a
  *    mix — the torn-rebuild silent-partial-result window of the old
  *    in-place delete-then-rewrite is structurally gone;
  *  - a manifest-listed file that is MISSING fails the read loudly
  *    (Spark's path-existence check on the explicit file list) instead of
  *    silently dropping rows — listed ⇒ present is an invariant of the
  *    append/vacuum flow ([[vacuumOrphans]] deletes only UNlisted dirs
  *    and superseded epochs, under the writer lease).
  *  - the read path never lists the data directories — O(epoch versions)
  *    manifest metadata + the surviving files themselves (ZOrderSpec pins
  *    this with a listing-recording FileSystem), the listing cost the
  *    commit log exists to avoid on object stores.
  *
  * Stats are harvested from the parquet footers the write already
  * produced — a SPARK JOB over the batch's files (O(batch files) work,
  * distributed; an initial 100 TB build harvests thousands of footers in
  * parallel instead of serially on the driver), through the same
  * canonical encoding + soundness rules as the upsert table's manifest
  * ([[Sources.footerColStats]]: long/string/double/timestamp ranges;
  * INT96, NaN-poisoned doubles and surrogate-bearing string bounds
  * degrade to "always read" — skipping is only ever an optimization,
  * never a correctness gamble; an all-null file is prunable by any range
  * predicate).
  */
object ZOrder {

  /** Quantization width per clustered column (16 bits × 2 columns = a
    * 32-bit z-value; plenty below the per-file row counts that matter). */
  val Bits = 16

  /** Rank-normalize a long column into [0, 2^Bits) — monotone, which is
    * all the curve needs. */
  private def quant(c: Column, mn: Long, mx: Long): Column =
    if (mx == mn) lit(0L)
    else floor((c - lit(mn)).cast("double") *
      lit(((1L << Bits) - 1).toDouble / (mx - mn).toDouble)).cast("long")

  /** Morton interleave: bit i of column j lands at position i*n+j, so the
    * curve alternates one bit of each dimension from the top down. n=1
    * degenerates to a plain sort (the linear baseline ZOrderSpec plants). */
  private def interleave(qs: Seq[Column]): Column = {
    val n = qs.length
    val terms = for {
      (q, j) <- qs.zipWithIndex
      i <- 0 until Bits
    } yield shiftleft(q.bitwiseAND(lit(1L << i)), i * (n - 1) + j)
    terms.reduce(_ bitwiseOR _)
  }

  // ---- commit-log plumbing ------------------------------------------------

  /** Manifest row key of the per-version recorded-schema row (`mn` holds
    * the DDL); every other row is a per-(file, column) stat. */
  private val DdlKey = "__ddl__"

  /** Manifest row key of the per-file SIZE row (`mn` holds the byte
    * length): recorded at harvest so maintenance ops ([[compactSmallFiles]])
    * pick their candidates from the manifest instead of issuing O(table
    * files) HEAD calls — the reason Delta keeps sizes in its log. Never a
    * pruning column; [[statRows]] filters it out of the stats plane. */
  private val SizeKey = "__size__"

  /** Manifest row key of the per-file ROW-COUNT row (`mn` holds the
    * count): recorded at harvest so [[countZRange]] answers a
    * fully-covered file from the manifest alone — Delta's
    * metadata-only `SELECT COUNT(*)`. */
  private val CountKey = "__count__"

  /** Manifest row-key PREFIX of the per-(file, column) NULL-COUNT rows
    * (`mn` holds the count, or null when the footer didn't record it):
    * a file counts as fully covered by a range predicate only when its
    * predicate column provably holds ZERO nulls — null rows never match
    * a range, so counting them from the manifest would overcount. */
  private val NullsPfx = "__nulls__:"

  /** The per-(file, column) PRUNING stats — excludes the DDL rows and the
    * `__`-prefixed per-file metadata rows (size/count/nulls). */
  private def statRows(man: DataFrame): DataFrame =
    man.filter(!col("c").startsWith("__"))

  private def manifestRoot(path: String) = new Path(path, "_zmanifest")

  private def parseIdx(name: String, pfx: String): Option[Long] =
    if (name.startsWith(pfx)) name.drop(pfx.length).toLongOption else None

  private def isCommitted(fs: org.apache.hadoop.fs.FileSystem,
      v: Path): Boolean = fs.exists(new Path(v, "_SUCCESS"))

  private[sources] final case class ZSnapshot(epoch: Long, epochDir: Path,
      vdirs: Seq[Path])

  /** Resolve the current committed snapshot: the highest epoch whose v0
    * committed, with that epoch's committed versions in order. O(epochs +
    * versions) manifest-dir metadata; the data dirs are never listed. */
  private[sources] def currentSnapshot(s: SparkSession,
      path: String): Option[ZSnapshot] = {
    val mroot = manifestRoot(path)
    val fs = StoreMaint.fsFor(s, mroot)
    if (!fs.exists(mroot)) return None
    val epochs = fs.listStatus(mroot).filter(_.isDirectory)
      .flatMap(st => parseIdx(st.getPath.getName, "e").map(_ -> st.getPath))
      .sortBy(-_._1)
    epochs.find { case (_, p) => isCommitted(fs, new Path(p, "v0")) }
      .map { case (e, edir) =>
        val vdirs = fs.listStatus(edir).filter(_.isDirectory)
          .flatMap(st => parseIdx(st.getPath.getName, "v").map(_ -> st.getPath))
          .filter { case (_, v) => isCommitted(fs, v) }
          .sortBy(_._1).map(_._2).toSeq
        ZSnapshot(e, edir, vdirs)
      }
  }

  /** The snapshot's manifest rows and its recorded table schema (the
    * LATEST committed version's DDL, deep-nullable so files predating a
    * column null-fill — the upsert table's read-schema discipline). */
  private def manifestAndSchema(s: SparkSession,
      snap: ZSnapshot): (DataFrame, StructType) = {
    val man = s.read.parquet(snap.vdirs.map(_.toString): _*)
    val ddl = man.filter(col("c") === lit(DdlKey))
      .orderBy(col("ver").desc).select(col("mn")).head().getString(0)
    val schema = Sources.deepNullable(StructType.fromDDL(ddl))
      .asInstanceOf[StructType]
    (man, schema)
  }

  private def requireSnapshot(s: SparkSession, path: String): ZSnapshot =
    currentSnapshot(s, path).getOrElse(throw new IllegalArgumentException(
      s"no committed z-store under $path"))

  /** Manifest-listed relative data-file paths of the current snapshot —
    * ops/spec surface; O(table files) driver rows by nature. */
  def listDataFiles(s: SparkSession, path: String): Seq[String] = {
    val snap = requireSnapshot(s, path)
    val (man, _) = manifestAndSchema(s, snap)
    man.filter(col("c") =!= lit(DdlKey)).select(col("f")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
  }

  // ---- write paths --------------------------------------------------------

  /** Build (or REBUILD) `df` z-clustered on `zcols` (long-typed) into
    * `numFiles` range-partitioned files under a NEW EPOCH — over an
    * existing store this is a versioned swap, not an in-place rewrite:
    * old epoch and files stay readable until [[vacuumOrphans]]. Stats for
    * `statCols` (default: the z columns) ride the epoch's v0 manifest. */
  def writeZOrdered(df: DataFrame, path: String, zcols: Seq[String],
      numFiles: Int, statCols: Seq[String] = Seq.empty): Unit =
    Lease.withLease(df.sparkSession, path, "zorder-write") {
      commitNewEpoch(df, path, zcols, numFiles, statCols)
    }

  /** Re-cluster the CURRENT snapshot into a fresh epoch — the periodic
    * OPTIMIZE that restores clustering quality after appends degrade it.
    * Same versioned-swap commit as [[writeZOrdered]]: concurrent readers
    * see the old snapshot or the new one, never a mix. */
  def reclusterZOrdered(s: SparkSession, path: String, zcols: Seq[String],
      numFiles: Int, statCols: Seq[String] = Seq.empty): Unit =
    Lease.withLease(s, path, "zorder-recluster") {
      // batch tags carry into the new epoch: a replayed tagged append
      // stays a no-op even when the re-cluster already folded its rows in
      val snap = requireSnapshot(s, path)
      val (man, schema) = manifestAndSchema(s, snap)
      val files = man.filter(col("c") =!= lit(DdlKey)).select(col("f"))
        .distinct().collect().map(_.getString(0)).sorted
      val df =
        if (files.isEmpty)
          s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
        else s.read.schema(schema).parquet(files.map(f => s"$path/$f"): _*)
      commitNewEpoch(df, path, zcols, numFiles, statCols, manifestTags(man))
    }

  /** Append a batch: z-sort it by its OWN bounds into a fresh data dir of
    * `numFiles` files, harvest those footers, and commit the stats as the
    * epoch's next manifest version — the batch becomes visible atomically
    * at that commit. An EMPTY batch is a complete no-op (no dir, no
    * version) — the realistic retry/filtered-source edge. Clustering
    * quality degrades as appends accumulate ([[reclusterZOrdered]]
    * restores it); skipping soundness never does: stats are actual footer
    * ranges. */
  /** `tag` (unique per logical batch) makes the append EXACTLY-ONCE under
    * at-least-once replay: a committed version already carrying the tag
    * turns the replay into a no-op — the z-store has no key-dedup read
    * tolerance to lean on (rows aren't functional in a key), so the tag
    * IS the idempotence mechanism, riding the version commit itself
    * (crash after data, before the version: invisible orphan, retry
    * lands once; crash after the version, before the caller's own
    * marker: the tag skips the re-append). */
  def appendZOrdered(df: DataFrame, path: String, zcols: Seq[String],
      numFiles: Int, statCols: Seq[String] = Seq.empty,
      tag: Option[String] = None): Unit = {
    val s = df.sparkSession
    Lease.withLease(s, path, "zorder-append") {
      currentSnapshot(s, path) match {
        case None => commitNewEpoch(df, path, zcols, numFiles, statCols,
          tag.toSeq)
        case Some(snap) =>
          val (man, recorded) = manifestAndSchema(s, snap)
          val replayed = tag.exists(t =>
            man.filter(col("c") === lit(DdlKey) && col("mx") === lit(t))
              .limit(1).count() > 0)
          if (!replayed) {
            // the recorded table schema evolves by the same add-only
            // union as the index stores (StoreMaint.unionSchemas): an
            // append may ADD columns (old files null-fill), may OMIT
            // recorded columns (its rows read null — recording only the
            // batch schema here would silently hide carried columns from
            // every later read), and refuses a type change BEFORE any
            // data lands
            val union = StoreMaint.unionSchemas(s"$path (z-store)",
              Some(recorded), df.schema)
            zWrite(df, path, zcols, numFiles).foreach { dname =>
              val stats = harvestStats(s, path, dname,
                if (statCols.nonEmpty) statCols else zcols, df.schema)
              val fs = StoreMaint.fsFor(s, snap.epochDir)
              // next version past EVERY existing v-dir, committed or
              // crashed — an uncommitted leftover is never reused
              val nextV = fs.listStatus(snap.epochDir).filter(_.isDirectory)
                .flatMap(st => parseIdx(st.getPath.getName, "v"))
                .maxOption.getOrElse(-1L) + 1
              writeManifestVersion(s, snap.epochDir, nextV, union.toDDL,
                stats, tag.toSeq)
            }
          }
      }
    }
  }

  /** Next epoch number past EVERY existing epoch dir, committed or
    * crashed — an uncommitted leftover is never reused. */
  private def nextEpoch(s: SparkSession, path: String): Long = {
    val mroot = manifestRoot(path)
    val fs = StoreMaint.fsFor(s, mroot)
    (if (!fs.exists(mroot)) Seq.empty[Long]
     else fs.listStatus(mroot).filter(_.isDirectory).toSeq
       .flatMap(st => parseIdx(st.getPath.getName, "e")))
      .maxOption.getOrElse(-1L) + 1
  }

  private def commitNewEpoch(df: DataFrame, path: String, zcols: Seq[String],
      numFiles: Int, statCols: Seq[String],
      tags: Seq[String] = Seq.empty): Unit = {
    val s = df.sparkSession
    val mroot = manifestRoot(path)
    val nextE = nextEpoch(s, path)
    // data first, then the epoch's v0 manifest: v0/_SUCCESS is the commit
    // point that flips readers to the new epoch
    val stats = zWrite(df, path, zcols, numFiles) match {
      case Some(dname) => harvestStats(s, path, dname,
        if (statCols.nonEmpty) statCols else zcols, df.schema)
      case None => Seq.empty // empty table: schema-only manifest
    }
    writeManifestVersion(s, new Path(mroot, s"e$nextE"), 0L, df.schema.toDDL,
      stats, tags)
  }

  /** Write one z-clustered batch into a FRESH data dir; returns its name,
    * or None when the batch has no rows (the empty-append guard — no
    * files, no manifest version, no NPE on the null bounds row). */
  private def zWrite(df: DataFrame, path: String, zcols: Seq[String],
      numFiles: Int): Option[String] = {
    val aggs = count(lit(1)).as("cnt") +:
      zcols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    if (b.getLong(0) == 0L) return None
    val qs = zcols.zipWithIndex.map { case (c, i) =>
      // an all-null clustering column contributes a constant (its rows
      // still land; the other dimensions keep clustering)
      if (b.isNullAt(2 * i + 1)) lit(0L)
      else quant(col(c), b.getLong(2 * i + 1), b.getLong(2 * i + 2))
    }
    val dname = "d-" + java.util.UUID.randomUUID().toString.replace("-", "")
      .take(12)
    // INT64 TIMESTAMP_MICROS, not the legacy INT96 default: INT96 footers
    // carry no usable min/max, which would leave timestamp stat columns
    // permanently unprunable (Sources.writeMicros, same contract)
    Sources.writeMicros(df.sparkSession) {
      df.withColumn("__z", interleave(qs))
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(s"$path/$dname")
    }
    Some(dname)
  }

  /** Per-file (relPath, col, mn, mx, allnull) stats of a just-written data
    * dir, from the parquet footers the write produced — as a SPARK JOB
    * over the file list (the driver lists ONE batch dir; footer I/O runs
    * distributed), via the canonical [[Sources.footerColStats]] encoding.
    * Ineligible stat-column types refuse loudly at write time — better
    * than recording stats a reader can't compare. */
  private def harvestStats(s: SparkSession, path: String, dname: String,
      statCols: Seq[String], schema: StructType)
      : Seq[(String, String, Option[String], Option[String], Boolean)] = {
    val fields = statCols.map { c =>
      val f = schema.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"stat column $c is not in the batch schema"))
      require(Sources.statsEligible(f.dataType),
        s"stat column $c: ${f.dataType.simpleString} has no canonical " +
          "stat encoding (long/int/double/string/timestamp do)")
      f
    }
    val ddir = new Path(s"$path/$dname")
    val fs = StoreMaint.fsFor(s, ddir)
    val files = fs.listStatus(ddir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq.sorted
    if (files.isEmpty) return Seq.empty
    val bc = s.sparkContext.broadcast(new org.apache.spark.SerializableWritable(
      s.sessionState.newHadoopConf()))
    try {
      s.sparkContext.parallelize(files, math.min(files.size, 32))
        .flatMap { p =>
          val conf = bc.value.value
          val hp = new Path(p)
          val st = hp.getFileSystem(conf).getFileStatus(hp)
          val accs = Sources.footerColStats(st, conf, fields)
          val rel = s"$dname/${hp.getName}"
          (rel, SizeKey, Option(st.getLen.toString), None: Option[String],
            false) +:
            fields.map { f =>
              accs(f.name.toLowerCase) match {
                case None => (rel, f.name, None, None, false) // unknown: read
                case Some((None, None)) => (rel, f.name, None, None, true)
                case Some((mn, mx)) => (rel, f.name, mn, mx, false)
              }
            }
        }.collect().toSeq
    } finally bc.destroy()
  }

  /** The DDL rows' otherwise-unused `mx` slot carries batch TAGS — the
    * idempotence tokens [[appendZOrdered]] checks on replay (one row per
    * tag; all carry the same ddl in `mn`, so the schema read is
    * order-insensitive). No extra row kind, so every consumer's
    * `c =!= DdlKey` filter keeps working unchanged. [[compactManifest]]
    * and [[reclusterZOrdered]] CARRY the epoch's tags forward — a
    * replayed append stays a no-op across manifest rewrites. */
  private def writeManifestVersion(s: SparkSession, edir: Path, ver: Long,
      ddl: String,
      stats: Seq[(String, String, Option[String], Option[String], Boolean)],
      tags: Seq[String] = Seq.empty): Unit = {
    import s.implicits._
    val rows = stats.map { case (f, c, mn, mx, an) =>
      (ver, f, c, mn, mx, an)
    } ++ tags.distinct.map(t =>
      (ver, "", DdlKey, Option(ddl), Option(t), false)) :+
      ((ver, "", DdlKey, Option(ddl), None: Option[String], false))
    rows.toDF("ver", "f", "c", "mn", "mx", "allnull")
      .coalesce(1).write.mode("overwrite")
      .parquet(new Path(edir, s"v$ver").toString)
  }

  /** Every batch tag recorded in the snapshot's manifest. */
  private def manifestTags(man: DataFrame): Seq[String] =
    man.filter(col("c") === lit(DdlKey) && col("mx").isNotNull)
      .select(col("mx")).distinct().collect().map(_.getString(0)).toSeq

  /** The distinct stat columns recorded anywhere in the snapshot's
    * manifest that still exist in `schema` — the coverage a
    * copy-on-write rewrite preserves for its fresh files. */
  private def recordedStatCols(man: DataFrame,
      schema: StructType): Seq[String] =
    statRows(man).select(col("c")).distinct().collect().map(_.getString(0))
      .filter(c => schema.exists(_.name.equalsIgnoreCase(c))).toSeq.sorted

  /** The manifest's stat + size rows for every file EXCEPT `drop`, as
    * [[writeManifestVersion]] tuples — the carry-by-reference half of a
    * copy-on-write commit (same driver-bounded collect as
    * [[compactManifest]]). */
  private def carriedStats(man: DataFrame, drop: Set[String])
      : Seq[(String, String, Option[String], Option[String], Boolean)] =
    man.filter(col("c") =!= lit(DdlKey))
      .select(col("f"), col("c"), col("mn"), col("mx"), col("allnull"))
      .collect()
      .filter(r => !drop.contains(r.getString(0)))
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)),
        Option(r.getString(3)), r.getBoolean(4))).toSeq

  // ---- read paths ---------------------------------------------------------

  /** Typed manifest-vs-bound comparisons in the column's canonical string
    * encoding ([[Sources.encodeBound]]/[[Sources.encodeParquetStat]]). */
  private def statLt(dt: DataType, c: Column, bound: String): Column =
    dt match {
      case DoubleType => c.cast("double") < lit(bound.toDouble)
      case StringType => c < lit(bound)
      case _ => c.cast("long") < lit(bound.toLong) // int/long/ts-micros
    }
  private def statGt(dt: DataType, c: Column, bound: String): Column =
    dt match {
      case DoubleType => c.cast("double") > lit(bound.toDouble)
      case StringType => c > lit(bound)
      case _ => c.cast("long") > lit(bound.toLong)
    }

  /** Range read with manifest skipping: open only the MANIFEST-LISTED
    * files of the current snapshot that no predicate definitively
    * excludes (recorded range disjoint from [lo, hi], or all-null), then
    * apply the predicates as residual filters (a surviving file still
    * holds out-of-range rows — the manifest prunes, the filter decides).
    * Bounds may be long/int/double/string/timestamp, matching
    * [[Sources.readTableRange]]'s encoding. Unknown-stat files are always
    * read; a predicate on a column with NO stats anywhere refuses loudly.
    *
    * The pruning DECISION runs distributed over the manifest; the driver
    * collects column names (bounded by the stat-column count) and
    * SURVIVING file names (bounded by what will be read anyway). The data
    * directories are never listed; a listed-but-missing file fails the
    * read loudly (a store violating the listed ⇒ present invariant must
    * never silently drop rows). */
  def readZRange(s: SparkSession, path: String,
      preds: Seq[(String, Any, Any)]): DataFrame =
    readZRangeSnap(s, path, requireSnapshot(s, path), preds)

  /** [[readZRange]] against a PAST committed snapshot (time travel) —
    * readable until [[vacuumOrphans]] collects it; sizing the vacuum's
    * `minAgeMs` past the travel horizon is the retention contract. */
  def readZRangeAt(s: SparkSession, path: String, epoch: Long, version: Long,
      preds: Seq[(String, Any, Any)]): DataFrame =
    readZRangeSnap(s, path, snapshotAt(s, path, epoch, version), preds)

  private def readZRangeSnap(s: SparkSession, path: String, snap: ZSnapshot,
      preds: Seq[(String, Any, Any)]): DataFrame = {
    require(preds.nonEmpty, "readZRange needs at least one predicate")
    val (man0, schema) = manifestAndSchema(s, snap)
    val man = man0.filter(col("c") =!= lit(DdlKey))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val keep =
      try {
        val have = statRows(man).select(col("c")).distinct()
          .collect().map(_.getString(0)).toSet
        preds.foreach(p => require(have.contains(p._1),
          s"no manifest stats for column ${p._1} " +
            s"(have ${have.toSeq.sorted.mkString(", ")})"))
        val typed = preds.map { case (c0, lo, hi) =>
          val f = schema.find(_.name.equalsIgnoreCase(c0)).getOrElse(
            throw new IllegalArgumentException(
              s"column $c0 is not in the z-store schema"))
          (c0, f.dataType, Sources.encodeBound(f.dataType, lo),
            Sources.encodeBound(f.dataType, hi))
        }
        // exclusion needs DEFINITE evidence: a known disjoint range, or an
        // all-null file (no row can match a range predicate). Unknown
        // stats — or no stats row for this column in the file's version —
        // keep the file. Sound under per-version statCols drift.
        val excluded = typed.map { case (c0, dt, loE, hiE) =>
          man.filter(col("c") === c0 && (col("allnull") ||
              (col("mn").isNotNull &&
                (statLt(dt, col("mx"), loE) || statGt(dt, col("mn"), hiE)))))
            .select(col("f"))
        }.reduce(_ union _)
        man.select(col("f")).distinct().except(excluded)
          .collect().map(_.getString(0)).sorted.toSeq
      } finally man.unpersist(blocking = false)
    val base =
      if (keep.nonEmpty)
        s.read.schema(schema).parquet(keep.map(f => s"$path/$f"): _*)
      else s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    preds.foldLeft(base) { case (d, (c, lo, hi)) =>
      d.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
  }

  /** Full current-snapshot read (explicit recorded schema, manifest-listed
    * files) — the OPTIMIZE-path input ([[reclusterZOrdered]]) and the
    * no-predicate table read. O(table files) driver file names, like any
    * whole-table plan. */
  def readSnapshot(s: SparkSession, path: String): DataFrame =
    readSnapshotOf(s, path, requireSnapshot(s, path))

  private def readSnapshotOf(s: SparkSession, path: String,
      snap: ZSnapshot): DataFrame = {
    val (man, schema) = manifestAndSchema(s, snap)
    val files = man.filter(col("c") =!= lit(DdlKey)).select(col("f"))
      .distinct().collect().map(_.getString(0)).sorted
    if (files.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema).parquet(files.map(f => s"$path/$f"): _*)
  }

  // ---- time travel --------------------------------------------------------

  /** Every committed snapshot, as (epoch, version) in commit order — the
    * travel coordinates for [[readSnapshotAt]]/[[readZRangeAt]]. A version
    * of epoch e means "epoch e's state after its first version+1 commits";
    * epochs whose v0 never committed (crashed rebuilds) are not snapshots. */
  def listVersions(s: SparkSession, path: String): Seq[(Long, Long)] = {
    val mroot = manifestRoot(path)
    val fs = StoreMaint.fsFor(s, mroot)
    if (!fs.exists(mroot)) return Seq.empty
    fs.listStatus(mroot).filter(_.isDirectory).toSeq
      .flatMap(st => parseIdx(st.getPath.getName, "e").map(_ -> st.getPath))
      .filter { case (_, p) => isCommitted(fs, new Path(p, "v0")) }
      .flatMap { case (e, edir) =>
        fs.listStatus(edir).filter(_.isDirectory)
          .flatMap(st => parseIdx(st.getPath.getName, "v"))
          .filter(v => isCommitted(fs, new Path(edir, s"v$v")))
          .map(v => (e, v))
      }.sorted
  }

  /** Resolve a PAST committed snapshot — epoch e at version v = the state
    * the store exposed after that commit. Refuses loudly on a
    * never-committed or vacuumed coordinate (a silently-empty past would
    * be the worst possible answer to an audit query). */
  private def snapshotAt(s: SparkSession, path: String, epoch: Long,
      version: Long): ZSnapshot = {
    val edir = new Path(manifestRoot(path), s"e$epoch")
    val fs = StoreMaint.fsFor(s, edir)
    require(fs.exists(edir) && isCommitted(fs, new Path(edir, "v0")),
      s"no committed epoch e$epoch under $path (vacuumed, or never " +
        "committed) — see listVersions")
    val vdirs = fs.listStatus(edir).filter(_.isDirectory)
      .flatMap(st => parseIdx(st.getPath.getName, "v").map(_ -> st.getPath))
      .filter { case (v, p) => v <= version && isCommitted(fs, p) }
      .sortBy(_._1)
    require(vdirs.exists(_._1 == version),
      s"epoch e$epoch has no committed version v$version — see listVersions")
    ZSnapshot(epoch, edir, vdirs.map(_._2).toSeq)
  }

  /** Incremental change feed: the rows ADDED after committed coordinate
    * (`epoch`, `version`) — the z-store's CDF half. The store is
    * append-only within an epoch (inserts only), so the delta is exactly
    * the manifest versions `version+1 .. current` and their files —
    * O(delta files) I/O and metadata, the incremental-view primitive (the
    * upsert table's keyed CDF is q100's `readChanges`; this is the
    * fact-stream form a downstream view tails). A delete, re-cluster,
    * bin-pack or manifest compaction commits a NEW epoch, and incremental
    * consumption across epochs REFUSES loudly: rewritten history can't be
    * expressed as a row delta, so the consumer must full-refresh and
    * resume from the new epoch — Delta's own contract when CDF meets a
    * data rewrite. The base coordinate itself is validated (a bogus base
    * would silently replay the whole store as "changes"). */
  def readChangesSince(s: SparkSession, path: String, epoch: Long,
      version: Long): DataFrame = {
    val snap = requireSnapshot(s, path)
    require(snap.epoch == epoch,
      s"z-store at $path was rewritten since e$epoch (current: " +
        s"e${snap.epoch}) — a row delta across an epoch swap does not " +
        "exist; full-refresh and resume from the current epoch")
    snapshotAt(s, path, epoch, version) // loud refusal on a bogus base
    val (man, schema) = manifestAndSchema(s, snap)
    val files = man.filter(col("c") =!= lit(DdlKey) &&
        col("ver") > lit(version))
      .select(col("f")).distinct().collect().map(_.getString(0)).sorted
    if (files.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema).parquet(files.map(f => s"$path/$f"): _*)
  }

  /** Full read of a PAST committed snapshot (time travel): reproduce what
    * a query saw before later appends/deletes/re-clusters — readable until
    * [[vacuumOrphans]] collects the superseded epoch (its `minAgeMs` is
    * the retention horizon, exactly Delta's contract). The recorded schema
    * is the SNAPSHOT's: columns added later don't exist in the past. */
  def readSnapshotAt(s: SparkSession, path: String, epoch: Long,
      version: Long): DataFrame =
    readSnapshotOf(s, path, snapshotAt(s, path, epoch, version))

  /** Collapse the current epoch's accumulated manifest versions into ONE
    * (a new epoch whose v0 carries the same stats rows, re-pointing the
    * SAME data files) — the Delta-checkpoint move: reader metadata stays
    * O(1) versions after any number of appends WITHOUT paying
    * [[reclusterZOrdered]]'s data rewrite. Commit and concurrency are the
    * epoch swap's: old-or-new, never partial; the superseded epoch's
    * manifest (only — the data is still referenced) falls to
    * [[vacuumOrphans]]. */
  def compactManifest(s: SparkSession, path: String): Unit =
    Lease.withLease(s, path, "zorder-manifest-compact") {
      val snap = requireSnapshot(s, path)
      val (man, schema) = manifestAndSchema(s, snap)
      val stats = man.filter(col("c") =!= lit(DdlKey))
        .select(col("f"), col("c"), col("mn"), col("mx"), col("allnull"))
        .collect().map(r => (r.getString(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3)), r.getBoolean(4)))
        .toSeq
      writeManifestVersion(s,
        new Path(manifestRoot(path), s"e${nextEpoch(s, path)}"), 0L,
        schema.toDDL, stats, manifestTags(man))
    }

  /** Copy-on-write range DELETE — the takedown/right-to-erasure pass a
    * 100 TB training-data store eventually serves: remove every row
    * matching ALL `preds` (the [[readZRange]] predicate language; a NULL
    * in a predicate column never matches, so those rows survive). The
    * manifest stats drive the WRITE the way they drive reads: a file
    * whose recorded range definitively can't contain a matching row
    * CARRIES into the new epoch by reference (its stat rows re-pointed,
    * zero I/O); only possibly-affected files are read, and their
    * survivors re-z-cluster into a fresh data dir — a delete touching one
    * band rewrites O(affected files), never the table. Commit is the
    * epoch swap (concurrent readers see old-or-new, never partial); batch
    * TAGS carry, so a replayed tagged append stays a no-op AFTER the
    * delete instead of resurrecting its rows; the superseded epoch falls
    * to [[vacuumOrphans]] after the retention window (until then it
    * remains time-travel-readable — the audit trail of the deletion).
    * Returns the number of rows deleted; 0 = no commit, store untouched. */
  def deleteZRange(s: SparkSession, path: String,
      preds: Seq[(String, Any, Any)], zcols: Seq[String],
      numFiles: Int = 0): Long = {
    require(preds.nonEmpty, "deleteZRange needs at least one predicate")
    Lease.withLease(s, path, "zorder-delete") {
      val snap = requireSnapshot(s, path)
      val (man0, schema) = manifestAndSchema(s, snap)
      val man = man0.filter(col("c") =!= lit(DdlKey))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val typed = preds.map { case (c0, lo, hi) =>
          val f = schema.find(_.name.equalsIgnoreCase(c0)).getOrElse(
            throw new IllegalArgumentException(
              s"column $c0 is not in the z-store schema"))
          (c0, f.dataType, Sources.encodeBound(f.dataType, lo),
            Sources.encodeBound(f.dataType, hi))
        }
        // a file is AFFECTED unless some predicate definitively excludes
        // it (disjoint recorded range, or all-null) — the read path's
        // evidence rule, here bounding rewrite I/O instead of scan I/O.
        // A predicate column with no stats rows simply excludes nothing:
        // correct (full rewrite), just not pruned.
        val excluded = typed.map { case (c0, dt, loE, hiE) =>
          man.filter(col("c") === c0 && (col("allnull") ||
              (col("mn").isNotNull &&
                (statLt(dt, col("mx"), loE) || statGt(dt, col("mn"), hiE)))))
            .select(col("f"))
        }.reduce(_ union _)
        val affected = man.select(col("f")).distinct().except(excluded)
          .collect().map(_.getString(0)).sorted.toSeq
        if (affected.isEmpty) 0L
        else {
          val aff = s.read.schema(schema)
            .parquet(affected.map(f => s"$path/$f"): _*)
          val matchAll = preds.map { case (c, lo, hi) =>
            col(c) >= lit(lo) && col(c) <= lit(hi)
          }.reduce(_ && _)
          val nDel = aff.filter(matchAll).count()
          if (nDel > 0L) {
            // NULL-predicate rows survive: !(null) is null, so coalesce
            val survivors = aff.filter(coalesce(!matchAll, lit(true)))
            val nf = if (numFiles > 0) numFiles else affected.size
            val newStats = zWrite(survivors, path, zcols, nf) match {
              case Some(dname) =>
                harvestStats(s, path, dname, recordedStatCols(man, schema),
                  schema)
              case None => Seq.empty
            }
            writeManifestVersion(s,
              new Path(manifestRoot(path), s"e${nextEpoch(s, path)}"), 0L,
              schema.toDDL, carriedStats(man, affected.toSet) ++ newStats,
              manifestTags(man0))
          }
          nDel
        }
      } finally man.unpersist(blocking = false)
    }
  }

  /** What a [[mergeByKey]] did: target rows replaced (all rows bearing a
    * matched key) and source rows inserted (key matched nothing, or null). */
  final case class MergeResult(updated: Long, inserted: Long)

  /** The column in its canonical COMPARABLE form (the type-respecting
    * order [[Sources.encodeBound]] strings decode to): long for
    * int/long, micros-long for timestamp, native for string/double. */
  private def comparableKey(dt: DataType, c: Column): Column = dt match {
    case DoubleType => c.cast("double")
    case StringType => c
    case org.apache.spark.sql.types.TimestampType => unix_micros(c)
    case _ => c.cast("long") // int / long
  }

  /** Decode a manifest stat string to the same comparable form. */
  private def decodeStat(dt: DataType, c: Column): Column = dt match {
    case DoubleType => c.cast("double")
    case StringType => c
    case _ => c.cast("long") // int/long/ts-micros
  }

  /** Keyed copy-on-write MERGE — the lakehouse upsert (Delta's
    * `MERGE … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
    * INSERT *`), whole-row semantics: every target row bearing a key
    * present in `source` is REPLACED by the source row; source rows whose
    * key matches nothing (or is null — SQL equality never matches null)
    * INSERT. Target rows with a null key always survive. A source with
    * two rows for one non-null key refuses loudly (the merge would be
    * nondeterministic — Delta raises the same error).
    *
    * The manifest stats bound the rewrite the way they bound reads, but
    * per KEY rather than by the source's global [min, max] (a batch
    * mixing low-key updates with beyond-max inserts would otherwise span
    * the whole table): a file carries into the new epoch by reference
    * unless its recorded key range contains AT LEAST ONE source key — a
    * distributed range join of the manifest's key rows against the
    * source's distinct keys, so a CDC batch touching one band rewrites
    * O(affected files), never O(table). All-null-key files carry; a file
    * with unknown/absent key stats is read (no evidence = no carry).
    *
    * Commit is the epoch swap (concurrent readers see old-or-new, never
    * partial); the source schema may evolve the store add-only (new
    * columns null-fill carried files, type change refuses before data
    * lands); batch TAGS carry, and `tag` makes the merge itself
    * exactly-once under at-least-once delivery (a replayed tagged merge
    * no-ops) — the foreachBatch CDC-apply loop's idempotence token. The
    * superseded epoch stays time-travel-readable until [[vacuumOrphans]]
    * — the audit trail of what the merge changed. */
  def mergeByKey(s: SparkSession, path: String, source: DataFrame,
      keyCol: String, zcols: Seq[String], numFiles: Int = 0,
      tag: Option[String] = None): MergeResult =
    Lease.withLease(s, path, "zorder-merge") {
      val snap = requireSnapshot(s, path)
      val (man0, recorded) = manifestAndSchema(s, snap)
      val replayed = tag.exists(t =>
        man0.filter(col("c") === lit(DdlKey) && col("mx") === lit(t))
          .limit(1).count() > 0)
      if (replayed) MergeResult(0L, 0L)
      else {
        // add-only union BEFORE any work: a type change refuses here
        val union = StoreMaint.unionSchemas(s"$path (z-store)",
          Some(recorded), source.schema)
        val keyField = source.schema.find(_.name.equalsIgnoreCase(keyCol))
          .getOrElse(throw new IllegalArgumentException(
            s"merge key $keyCol is not in the source schema"))
        require(Sources.statsEligible(keyField.dataType),
          s"merge key $keyCol: ${keyField.dataType.simpleString} has no " +
            "canonical stat encoding (long/int/double/string/timestamp do)")
        require(recorded.exists(_.name.equalsIgnoreCase(keyCol)),
          s"merge key $keyCol is not a column of the z-store at $path")
        val dt = keyField.dataType
        val src = source.persist(StorageLevel.MEMORY_AND_DISK)
        val man = man0.filter(col("c") =!= lit(DdlKey))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val srcCnt = src.count()
          if (srcCnt == 0L) MergeResult(0L, 0L)
          else {
            val dup = src.filter(col(keyCol).isNotNull)
              .groupBy(col(keyCol)).count()
              .filter(col("count") > 1).limit(1).count() > 0
            require(!dup, s"merge source has multiple rows for one " +
              s"$keyCol — a whole-row upsert would be nondeterministic")
            val srcKeys = src.select(
              comparableKey(dt, col(keyCol)).as("__mk"))
              .filter(col("__mk").isNotNull).distinct()
            // per-key carry evidence: a file carries unless its recorded
            // key range CONTAINS some source key (all-null files carry;
            // unknown/absent stats keep the file in the rewrite set)
            val keyRows = man.filter(lower(col("c")) === keyCol.toLowerCase)
            val allnullF = keyRows.filter(col("allnull")).select(col("f"))
            val ranged = keyRows.filter(!col("allnull") && col("mn").isNotNull)
            val hit = ranged.join(srcKeys,
              decodeStat(dt, ranged("mn")) <= col("__mk") &&
                col("__mk") <= decodeStat(dt, ranged("mx")), "leftsemi")
              .select(col("f"))
            val carry = allnullF.union(ranged.select(col("f")).except(hit))
            val affected = man.select(col("f")).distinct().except(carry)
              .collect().map(_.getString(0)).sorted.toSeq
            val affDf =
              if (affected.isEmpty)
                s.createDataFrame(s.sparkContext.emptyRDD[Row], recorded)
              else s.read.schema(recorded)
                .parquet(affected.map(f => s"$path/$f"): _*)
            val eqKey = comparableKey(dt, affDf(keyCol)) === col("__mk")
            val updated = affDf.join(srcKeys, eqKey, "leftsemi").count()
            val matchedKeys = srcKeys.join(affDf, eqKey, "leftsemi").count()
            val survivors = affDf.join(srcKeys, eqKey, "left_anti")
            val merged = survivors.unionByName(src,
              allowMissingColumns = true)
            val nf = if (numFiles > 0) numFiles
              else math.max(affected.size, 1)
            val newStats = zWrite(merged, path, zcols, nf) match {
              case Some(dname) =>
                harvestStats(s, path, dname, recordedStatCols(man, union),
                  union)
              case None => Seq.empty
            }
            writeManifestVersion(s,
              new Path(manifestRoot(path), s"e${nextEpoch(s, path)}"), 0L,
              union.toDDL, carriedStats(man, affected.toSet) ++ newStats,
              manifestTags(man0) ++ tag.toSeq)
            MergeResult(updated, srcCnt - matchedKeys)
          }
        } finally {
          man.unpersist(blocking = false)
          src.unpersist(blocking = false)
        }
      }
    }

  /** Bin-pack OPTIMIZE — the maintenance pass continuous ingest makes
    * necessary: every append (q132's micro-batches above all) lands its
    * own small files, and after N batches the snapshot is N small dirs.
    * [[reclusterZOrdered]] fixes that at an O(table) rewrite;
    * this rewrites ONLY the files below `smallBytes` — sizes come from
    * the manifest's per-file size rows (no per-file HEAD calls; a
    * pre-size manifest falls back to one getFileStatus per unknown
    * file) — re-z-clustering them TOGETHER into ~`smallBytes`-sized
    * outputs (restoring clustering across batch boundaries) while every
    * larger file carries by reference. Same epoch-swap commit, tags
    * carried, superseded epoch to [[vacuumOrphans]]. Returns the number
    * of small files folded; fewer than 2 candidates = no-op, no commit. */
  def compactSmallFiles(s: SparkSession, path: String, zcols: Seq[String],
      smallBytes: Long): Int =
    Lease.withLease(s, path, "zorder-optimize") {
      val snap = requireSnapshot(s, path)
      val (man0, schema) = manifestAndSchema(s, snap)
      val man = man0.filter(col("c") =!= lit(DdlKey))
      val sizes = man.filter(col("c") === lit(SizeKey))
        .select(col("f"), col("mn")).collect()
        .map(r => r.getString(0) -> r.getString(1).toLong).toMap
      val all = man.select(col("f")).distinct().collect()
        .map(_.getString(0)).sorted.toSeq
      val fs = StoreMaint.fsFor(s, new Path(path))
      val sized = all.map(f => f -> sizes.getOrElse(f,
        fs.getFileStatus(new Path(path, f)).getLen))
      val small = sized.filter(_._2 < smallBytes)
      if (small.size < 2) 0
      else {
        val smallNames = small.map(_._1)
        val df = s.read.schema(schema)
          .parquet(smallNames.map(f => s"$path/$f"): _*)
        val nf = math.max(1,
          ((small.map(_._2).sum + smallBytes - 1) / smallBytes).toInt)
        val newStats = zWrite(df, path, zcols, nf) match {
          case Some(dname) =>
            harvestStats(s, path, dname, recordedStatCols(man, schema),
              schema)
          case None => Seq.empty
        }
        writeManifestVersion(s,
          new Path(manifestRoot(path), s"e${nextEpoch(s, path)}"), 0L,
          schema.toDDL, carriedStats(man, smallNames.toSet) ++ newStats,
          manifestTags(man0))
        small.size
      }
    }

  /** Garbage-collect everything the current snapshot doesn't reference:
    * data dirs of crashed appends and superseded epochs, manifest dirs of
    * old epochs, and uncommitted version dirs in the current epoch. Runs
    * in the ENFORCED writer slot ([[Lease]]) so it can't race an
    * in-flight append's pre-commit window. Lock-free readers that
    * resolved a SUPERSEDED epoch before the vacuum fail loudly, never
    * partially — `minAgeMs` is the retention delay that closes even that:
    * candidates modified within the window are kept, so sizing it past
    * the longest query (exactly Delta's VACUUM retention contract) means
    * no live reader's epoch disappears underneath it. Returns the removed
    * root-relative names. */
  def vacuumOrphans(s: SparkSession, path: String,
      minAgeMs: Long = 0L): Seq[String] =
    Lease.withLease(s, path, "zorder-vacuum") {
      currentSnapshot(s, path) match {
        case None => Seq.empty
        case Some(snap) =>
          val (man, _) = manifestAndSchema(s, snap)
          val liveDirs = man.filter(col("c") =!= lit(DdlKey))
            .select(col("f")).distinct()
            .collect().map(_.getString(0).split('/').head).toSet
          val fs = StoreMaint.fsFor(s, new Path(path))
          val cutoff = System.currentTimeMillis() - minAgeMs
          val removed = scala.collection.mutable.ArrayBuffer.empty[String]
          def rm(p: Path, name: String): Unit =
            if (fs.getFileStatus(p).getModificationTime <= cutoff) {
              fs.delete(p, true)
              removed += name
            }
          fs.listStatus(new Path(path))
            .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
            .foreach { st =>
              if (!liveDirs.contains(st.getPath.getName))
                rm(st.getPath, st.getPath.getName)
            }
          fs.listStatus(manifestRoot(path)).filter(_.isDirectory)
            .foreach { st =>
              if (st.getPath.getName != snap.epochDir.getName)
                rm(st.getPath, s"_zmanifest/${st.getPath.getName}")
              else
                fs.listStatus(st.getPath).filter(_.isDirectory).foreach { v =>
                  if (!isCommitted(fs, v.getPath))
                    rm(v.getPath,
                      s"_zmanifest/${st.getPath.getName}/${v.getPath.getName}")
                }
            }
          removed.sorted.toSeq
      }
    }

  // ---- q123: exact-oracle query over the z-clustered layout ---------------

  private val NumFiles = 32

  /** Per-dataset-dir layout cache (the storeFor discipline): clustered
    * once per JVM, range-read per pass — the deployment profile. */
  private val stores = scala.collection.mutable.Map.empty[String, String]

  private def storeFor(s: SparkSession, d: String): String =
    synchronized {
      stores.getOrElseUpdate(d, {
        val dir = Files.createTempDirectory("graft-zorder").toString
        val li = Tables.lineitem(s, d)
        // build + one incremental batch + a manifest-only compaction: the
        // oracle (the plain filter over the WHOLE table) then covers
        // append visibility AND the compacted-epoch read path, not just
        // the initial layout
        writeZOrdered(li.filter(col("l_orderkey") % 10 =!= 9), dir,
          Seq("l_partkey", "l_suppkey"), NumFiles)
        appendZOrdered(li.filter(col("l_orderkey") % 10 === 9), dir,
          Seq("l_partkey", "l_suppkey"), math.max(NumFiles / 10, 1))
        compactManifest(s, dir)
        dir
      })
    }

  /** q133's store: the full table z-clustered, then a partkey band
    * copy-on-write DELETED — the store state every q133 pass reads. */
  private val delStores = scala.collection.mutable.Map.empty[String, String]

  private def delStoreFor(s: SparkSession, d: String): String =
    synchronized {
      delStores.getOrElseUpdate(d, {
        val dir = Files.createTempDirectory("graft-zdelete").toString
        val li = Tables.lineitem(s, d)
        writeZOrdered(li, dir, Seq("l_partkey", "l_suppkey"), NumFiles)
        val b = li.agg(min(col("l_partkey")), max(col("l_partkey"))).head()
        val (pmn, pmx) = (b.getLong(0), b.getLong(1))
        deleteZRange(s, dir,
          Seq(("l_partkey", pmn + (pmx - pmn) * 2 / 10,
            pmn + (pmx - pmn) * 3 / 10)),
          Seq("l_partkey", "l_suppkey"))
        dir
      })
    }

  /** q138's store: the documents table z-clustered, then one CDC-style
    * merge applied — a band of "re-crawled" docs (n_chars grown by 1000)
    * plus a slice of brand-new ids beyond the old max. */
  private val mergeStores = scala.collection.mutable.Map.empty[String, String]

  private def mergeStoreFor(s: SparkSession, d: String): String =
    synchronized {
      mergeStores.getOrElseUpdate(d, {
        val dir = Files.createTempDirectory("graft-zmerge").toString
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        writeZOrdered(docs, dir, Seq("doc_id", "n_chars"), 8)
        val b = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
        val (dmn, dmx) = (b.getLong(0), b.getLong(1))
        val (lo, hi) = (dmn + (dmx - dmn) * 2 / 10, dmn + (dmx - dmn) * 3 / 10)
        val upd = docs.filter(col("doc_id").between(lo, hi))
          .withColumn("n_chars", col("n_chars") + lit(1000L))
        val ins = docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + lit(dmx + 1))
        mergeByKey(s, dir, upd.unionByName(ins), "doc_id",
          Seq("doc_id", "n_chars"), 4)
        dir
      })
    }

  /** q136's store: a documents z-store with a build slice then one
    * appended batch, history kept in ONE epoch (no compaction) so the
    * change feed has a live base coordinate. */
  private val cdfStores = scala.collection.mutable.Map.empty[String, String]

  private def cdfStoreFor(s: SparkSession, d: String): String =
    synchronized {
      cdfStores.getOrElseUpdate(d, {
        val dir = Files.createTempDirectory("graft-zcdf").toString
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars"))
        writeZOrdered(docs.filter(col("doc_id") % 10 =!= 9), dir,
          Seq("n_chars", "doc_id"), 8)
        appendZOrdered(docs.filter(col("doc_id") % 10 === 9), dir,
          Seq("n_chars", "doc_id"), 2)
        dir
      })
    }

  /** q137's materialized base view over q136's store: the per-lang
    * aggregate at coordinate (e0, v0), persisted once — the artifact an
    * incremental refresh starts from instead of re-scanning the base. */
  private val viewStores = scala.collection.mutable.Map.empty[String, String]

  private def viewStoreFor(s: SparkSession, d: String): String =
    synchronized {
      viewStores.getOrElseUpdate(d, {
        val root = cdfStoreFor(s, d)
        val vdir = Files.createTempDirectory("graft-zview").toString
        readSnapshotAt(s, root, 0, 0)
          .groupBy(col("lang"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .coalesce(1).write.mode("overwrite").parquet(s"$vdir/v0")
        vdir
      })
    }

  /** Drop the store-pointer cache (cold-run probes). */
  def clearCaches(): Unit = synchronized {
    stores.clear(); delStores.clear(); cdfStores.clear(); viewStores.clear()
    mergeStores.clear()
  }

  /** q123: selective two-column range read THROUGH the z-clustered layout —
    * a 10%-band on `l_partkey` × a 10%-band on `l_suppkey` (bounds derived
    * from the data, integer floor arithmetic both engines). Oracle = the
    * plain filter over the source table, so a manifest that wrongly
    * skipped a file, a broken residual filter, or a row lost in the
    * re-layout all hash-fail. The pruning itself (both single-column
    * bands open a fraction of the files; the linear baseline cannot) is
    * pinned in ZOrderSpec — an oracle can't see I/O. */
  val q123ZOrderRead: Q = Q(
    "q123_zorder_read",
    """WITH b AS (SELECT MIN(l_partkey) AS pmn, MAX(l_partkey) AS pmx,
      |    MIN(l_suppkey) AS smn, MAX(l_suppkey) AS smx FROM lineitem)
      |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
      |  l.l_quantity
      |FROM lineitem l, b
      |WHERE l.l_partkey BETWEEN b.pmn + (b.pmx-b.pmn)*2//10
      |                      AND b.pmn + (b.pmx-b.pmn)*3//10
      |  AND l.l_suppkey BETWEEN b.smn + (b.smx-b.smn)*4//10
      |                      AND b.smn + (b.smx-b.smn)*5//10
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
  ) { (s, d) =>
    val dir = storeFor(s, d)
    val b = Tables.lineitem(s, d).agg(
      min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (pmn, pmx, smn, smx) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    readZRange(s, dir, Seq(
        ("l_partkey", pmn + (pmx - pmn) * 2 / 10, pmn + (pmx - pmn) * 3 / 10),
        ("l_suppkey", smn + (smx - smn) * 4 / 10, smn + (smx - smn) * 5 / 10)))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q133: range DELETE through the z-store — build the full table
    * z-clustered, copy-on-write delete a 10%-band on `l_partkey`
    * ([[deleteZRange]]: stats-pruned rewrite, epoch-swap commit), then
    * answer a `l_suppkey` band query through the post-delete snapshot.
    * Oracle = the plain suppkey-band filter EXCLUDING the deleted
    * partkey band, so a row surviving the delete, a row wrongly deleted
    * (carried-file mishandling), or a file lost in the rewrite all
    * hash-fail. The carry-by-reference I/O shape (unaffected files are
    * re-pointed, not rewritten) is pinned in ZOrderSpec — an oracle
    * can't see I/O. */
  val q133ZOrderDelete: Q = Q(
    "q133_zorder_delete",
    """WITH b AS (SELECT MIN(l_partkey) AS pmn, MAX(l_partkey) AS pmx,
      |    MIN(l_suppkey) AS smn, MAX(l_suppkey) AS smx FROM lineitem)
      |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
      |  l.l_quantity
      |FROM lineitem l, b
      |WHERE l.l_suppkey BETWEEN b.smn + (b.smx-b.smn)*4//10
      |                      AND b.smn + (b.smx-b.smn)*5//10
      |  AND NOT (l.l_partkey BETWEEN b.pmn + (b.pmx-b.pmn)*2//10
      |                           AND b.pmn + (b.pmx-b.pmn)*3//10)
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
  ) { (s, d) =>
    val dir = delStoreFor(s, d)
    val b = Tables.lineitem(s, d).agg(
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (smn, smx) = (b.getLong(0), b.getLong(1))
    readZRange(s, dir, Seq(
        ("l_suppkey", smn + (smx - smn) * 4 / 10, smn + (smx - smn) * 5 / 10)))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q134: TIME TRAVEL — answer q123's partkey band at epoch 0 version 0,
    * i.e. the store state BEFORE the incremental append (and before the
    * manifest compaction that moved the current snapshot to a new epoch).
    * Oracle = the band filter restricted to the build slice
    * (`l_orderkey % 10 != 9`), so a travel read that leaks the appended
    * batch, loses a build row, or resolves the wrong coordinate
    * hash-fails. Shares q123's store (build → append → compactManifest),
    * which is exactly what makes the coordinate meaningful. */
  val q134ZOrderTimeTravel: Q = Q(
    "q134_zorder_time_travel",
    """WITH b AS (SELECT MIN(l_partkey) AS pmn, MAX(l_partkey) AS pmx
      |  FROM lineitem)
      |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
      |  l.l_quantity
      |FROM lineitem l, b
      |WHERE l.l_orderkey % 10 != 9
      |  AND l.l_partkey BETWEEN b.pmn + (b.pmx-b.pmn)*2//10
      |                      AND b.pmn + (b.pmx-b.pmn)*3//10
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
  ) { (s, d) =>
    val dir = storeFor(s, d)
    val b = Tables.lineitem(s, d).agg(
      min(col("l_partkey")), max(col("l_partkey"))).head()
    val (pmn, pmx) = (b.getLong(0), b.getLong(1))
    readZRangeAt(s, dir, 0, 0, Seq(
        ("l_partkey", pmn + (pmx - pmn) * 2 / 10, pmn + (pmx - pmn) * 3 / 10)))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q136: CHANGE FEED — tail the rows a z-store append added after a
    * committed base coordinate ([[readChangesSince]]): build slice at
    * (e0, v0), one appended batch at v1, delta-since-(0,0) ≡ exactly the
    * appended slice. Oracle = the plain filter to the appended slice, so
    * a delta that leaks base rows (bogus-base validation), misses
    * appended rows, or double-counts a file hash-fails. The refusal
    * shapes (cross-epoch, bogus base) are pinned in ZOrderSpec. */
  val q136ZOrderChangeFeed: Q = Q(
    "q136_zorder_change_feed",
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE doc_id % 10 = 9 ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    readChangesSince(s, cdfStoreFor(s, d), 0, 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** q137: INCREMENTAL VIEW MAINTENANCE over the change feed — what
    * [[readChangesSince]] exists FOR: a per-lang aggregate view is
    * materialized once at the base coordinate (e0, v0), and the refresh
    * after the append is `view ⊎ agg(delta)` — the refresh plan reads the
    * tiny view parquet plus O(delta files), NEVER the base data (pinned
    * via `inputFiles` in ZOrderSpec with the full-re-agg planted
    * positive; q100 is the keyed upsert-CDF sibling — this is the
    * append-only fact-stream form, where the delta is inserts-only so
    * the merge is a pure additive union). Oracle = the straight
    * aggregate over the WHOLE table: a refresh that misses delta rows,
    * double-counts, or drifts from the base view hash-fails. */
  val q137ZOrderIvm: Q = Q(
    "q137_zorder_ivm",
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  ) { (s, d) =>
    val root = cdfStoreFor(s, d)
    val base = s.read.parquet(s"${viewStoreFor(s, d)}/v0")
    val delta = readChangesSince(s, root, 0, 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
    base.unionByName(delta).groupBy(col("lang"))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_chars")).cast("long").as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** q138: keyed copy-on-write MERGE through the z-store — build the
    * documents table z-clustered, apply ONE CDC-style merge
    * ([[mergeByKey]]: a doc_id band of whole-row updates + a slice of
    * beyond-max inserts, per-key stats-pruned rewrite, epoch-swap
    * commit), then answer the full-table query through the post-merge
    * snapshot. Oracle = unchanged ∪ updated ∪ inserted as plain SQL, so a
    * lost update, a surviving stale row (carried-file mishandling), a
    * dropped insert, or a row lost in the rewrite all hash-fail. The
    * carry-by-reference I/O shape and the refusal/null edges are pinned
    * in ZOrderSpec — an oracle can't see I/O. */
  val q138ZOrderMerge: Q = Q(
    "q138_zorder_merge",
    """WITH b AS (SELECT MIN(doc_id) AS dmn, MAX(doc_id) AS dmx
      |  FROM documents)
      |SELECT d.doc_id, d.lang, d.n_chars FROM documents d, b
      |WHERE NOT (d.doc_id BETWEEN b.dmn + (b.dmx-b.dmn)*2//10
      |                        AND b.dmn + (b.dmx-b.dmn)*3//10)
      |UNION ALL
      |SELECT d.doc_id, d.lang, d.n_chars + 1000 AS n_chars
      |FROM documents d, b
      |WHERE d.doc_id BETWEEN b.dmn + (b.dmx-b.dmn)*2//10
      |                   AND b.dmn + (b.dmx-b.dmn)*3//10
      |UNION ALL
      |SELECT d.doc_id + b.dmx + 1 AS doc_id, d.lang, d.n_chars
      |FROM documents d, b
      |WHERE d.doc_id % 5 = 0
      |ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    readSnapshot(s, mergeStoreFor(s, d))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  // ---- q132: continuous z-store ingest (exactly-once) ---------------------

  private val TargetBatches = 2L

  /** One z-ingest micro-batch: derive the clustering keys, append the
    * batch under its TAG, then answer the STANDING band query through the
    * store — the q117 append-then-answer shape for the fifth persisted
    * store. Exactly-once is two-layer like every ingest loop here: the
    * applied-marker skips a fully-replayed batch wholesale, and the
    * marker-missed window (crash after the version commit, before the
    * marker) is closed by the batch TAG riding the manifest version —
    * the z-store's rows aren't functional in a key, so duplicate-tolerant
    * reads can't absorb a re-append the way the other four stores do;
    * the tag makes the re-append itself a no-op. */
  private[graft] def ingestBatch(s: SparkSession, root: String,
      df: DataFrame, id: Long, lo: Long, hi: Long): Unit = {
    if (StoreMaint.batchAlreadyApplied(s, root, id)) return
    val conf = s.conf
    val prevSp = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val store = s"$root/store"
      appendZOrdered(
        df.select(col("doc_id"),
          length(col("text")).cast("long").as("k1"),
          pmod(col("doc_id"), lit(997L)).as("k2")),
        store, Seq("k1", "k2"), 2, tag = Some(s"b$id"))
      readZRange(s, store, Seq(("k1", lo, hi)))
        .select(col("doc_id"), col("k1"), col("k2"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$root/out/batch=$id")
      StoreMaint.markApplied(s, root, id)
    } finally conf.set("spark.sql.shuffle.partitions", prevSp)
  }

  /** q132: CONTINUOUS z-store ingest — documents arrive over the
    * graft-shards stream (explicit doc_id-mod routing) in two
    * rate-limited micro-batches; each derives clustering keys
    * (k1 = text length, k2 = doc_id mod 997 — both engine-mirrorable),
    * z-appends itself to the store (which starts EMPTY), and answers the
    * standing k1-band query through the manifest-pruned read, so batch
    * b's rows are the store state after batches ≤ b. EXACT oracle by the
    * q108/q117 recipe: batch membership is rank-in-shard div limit in
    * SQL, the band bounds derive from the full corpus, and the per-batch
    * answer is the plain filter over member docs — a double-appended
    * batch (broken tag/marker), a lost batch, a wrongly-pruned file, or
    * a broken residual filter all hash-fail. Completes the symmetry:
    * all FIVE persisted stores have exactly-once streaming ingest. */
  val q132ZOrderStreamIngest: Q = Q(
    "q132_zorder_stream_ingest",
    s"""WITH b0 AS (SELECT MIN(LENGTH(text)) AS mn, MAX(LENGTH(text)) AS mx
       |  FROM documents),
       |shardseq AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id % ${GraftShards.NumShards}
       |      ORDER BY doc_id) - 1 AS seq
       |  FROM documents),
       |lim AS (SELECT CAST(CEIL(CAST(MAX(c) AS DOUBLE) / $TargetBatches) AS BIGINT) AS r
       |  FROM (SELECT COUNT(*) AS c FROM documents
       |        GROUP BY doc_id % ${GraftShards.NumShards})),
       |batched AS (
       |  SELECT s.doc_id, CAST(s.seq // l.r AS BIGINT) AS batch FROM shardseq s, lim l),
       |bs AS (SELECT DISTINCT batch FROM batched),
       |member AS (
       |  SELECT bs.batch, bt.doc_id FROM bs JOIN batched bt ON bt.batch <= bs.batch)
       |SELECT m.batch, d.doc_id, LENGTH(d.text) AS k1, d.doc_id % 997 AS k2
       |FROM member m JOIN documents d USING (doc_id), b0
       |WHERE LENGTH(d.text) BETWEEN b0.mn + (b0.mx - b0.mn) * 3 // 10
       |                         AND b0.mn + (b0.mx - b0.mn) * 7 // 10
       |ORDER BY m.batch, d.doc_id""".stripMargin,
  ) { (s, d) =>
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val numShards = GraftShards.NumShards
    val shardDir = GraftShards.documentsShards(s, d)
    val maxShardCnt = Tables.documents(s, d)
      .groupBy(pmod(col("doc_id"), lit(numShards))).count()
      .agg(max(col("count"))).head().getLong(0)
    val limit = (maxShardCnt + TargetBatches - 1) / TargetBatches
    // the standing band derives from the full corpus — a constant of the
    // deployment, mirrored by the oracle's b0 CTE
    val b = Tables.documents(s, d)
      .agg(min(length(col("text"))), max(length(col("text")))).head()
    val (mn, mx) = (b.getInt(0).toLong, b.getInt(1).toLong)
    val (lo, hi) = (mn + (mx - mn) * 3 / 10, mn + (mx - mn) * 7 / 10)
    val root = Files.createTempDirectory("graft-zorder-ingest").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = s.readStream.format("graft-shards")
      .option("startingPosition", "TRIM_HORIZON")
      .option("maxRecordsPerShardPerTrigger", limit.toString)
      .load(shardDir)
      .select(from_json(col("data"), docSchema).as("r"))
      .select(col("r.*"))
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        ingestBatch(s, root, df, id, lo, hi)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(s"$root/out")
      .select(col("batch").cast("long").as("batch"), col("doc_id"),
        col("k1"), col("k2"))
      .orderBy(col("batch"), col("doc_id"))
  }

  val all: Seq[Q] = Seq(q123ZOrderRead, q132ZOrderStreamIngest,
    q133ZOrderDelete, q134ZOrderTimeTravel, q136ZOrderChangeFeed,
    q137ZOrderIvm, q138ZOrderMerge)
}
