package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the parquet scans the query set already
  * exercises (SURVEY.md §2.b "File-format scans" / "Sinks" rows).
  *
  * The reference's storage layer is: JSON documents point-read/overwritten
  * whole per key on S3 (R1 `readInputDataJSON` aprocess.js:15-32, R5
  * `writeBodyObj` aprocess.js:34-45). Here that becomes:
  *  - schema-explicit JSON/CSV scans (schema given, not inferred — an
  *    inference pass over 100 TB is a full extra read of the data);
  *  - partitioned parquet writes, so downstream point-lookups and range
  *    scans prune to one partition directory instead of the full table;
  *  - a whole-row keyed upsert sink ([[upsert]]) with an atomic
  *    staging-directory swap — the R5 "overwrite the document at its key"
  *    semantics, batched: one job rewrites the table once per batch no
  *    matter how many keys changed, instead of one S3 put per document;
  *  - [[upsertBatch]], the same sink as a `foreachBatch` function, which is
  *    how a streaming pipeline upserts micro-batches (R5's streaming form;
  *    exactly-once per batch since the swap is last).
  *
  * All paths are driver-visible filesystem URIs; on a cluster the same code
  * runs against HDFS/S3A (Path/FileSystem are scheme-agnostic).
  */
object Sources {

  /** JSON-lines scan with explicit schema (no inference pass). */
  def readJson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Fault-tolerant JSON-lines scan for dirty corpora: malformed lines do
    * NOT fail the job (one bad crawl record must not kill a 100 TB read) —
    * they land intact in a `_corrupt_record` column for quarantine, valid
    * rows parse normally. Callers split on `_corrupt_record IS NULL`.
    *
    * CAVEAT: Spark refuses a query over raw JSON whose referenced columns
    * are ONLY `_corrupt_record` — `.cache()` the returned frame (or carry
    * a data column) before a quarantine-only select, as SourcesSpec does. */
  def readJsonPermissive(s: SparkSession, path: String,
      schema: StructType): DataFrame =
    s.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV scan with explicit schema + header. */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC scan/sink — the other columnar format Spark bundles. Same
    * pushdown/pruning properties as parquet (predicate pushdown via ORC
    * search arguments, column projection via the schema — SourcesSpec pins
    * both), so a deployment standardized on ORC swaps formats without
    * losing the scan-side scale levers. */
  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Hive-style partitioned parquet write: reads filtered on `partCols`
    * prune to matching directories (partition pruning — verified in
    * SourcesSpec via inputFiles). */
  def writePartitioned(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Binary-file ingestion — how a multimodal corpus (image/audio/video
    * files on object storage) actually enters the engine: each file
    * becomes one row `(path, modificationTime, length, content: binary)`,
    * ready for the `multimodal` operators' payload+metadata shape.
    * `pathGlobFilter` selects a modality by extension WITHOUT opening
    * non-matching files, and the scan parallelizes per file — a million
    * images fan out across executors with no driver-side listing
    * bottleneck beyond the initial index. */
  def readBinaryFiles(s: SparkSession, path: String,
      glob: String = "*"): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Range-sharded sorted export — the training-shard layout writer:
    * `repartitionByRange` splits the keyspace into `numShards` contiguous
    * ranges (one output file each, ranges disjoint), and each shard is
    * sorted by the key within its file. Readers that want "shard i of N"
    * open exactly one file; a sequential consumer (a training loader
    * streaming packed chunks in q92 order) reads the files in name order
    * and sees the full corpus globally sorted — WITHOUT any global
    * single-partition sort having run (range partitioning samples the key
    * distribution, then each shard sorts locally in parallel).
    * maxRecordsPerFile bounds file size at scale. */
  def writeRangeSharded(df: DataFrame, path: String, key: String,
      numShards: Int, maxRecordsPerFile: Long = 0L): Unit =
    df.repartitionByRange(numShards, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Version-directory names: v1, v2, … */
  private val VersionRe = "^v(\\d+)$".r

  /** One listing of an upsert-table root, split into what the protocol
    * needs: committed versions (ascending; a version counts only once the
    * writer's job committer has placed `_SUCCESS` — without it the
    * directory is an in-flight or crashed write), ALL version numbers
    * (committed or not, for collision-free allocation), and any foreign
    * entries — data that is NOT in the versioned layout. */
  private case class TableListing(
      committed: Seq[(Long, Path)], allVersionNums: Seq[Long], foreign: Seq[Path])

  private def listTable(s: SparkSession, path: String): TableListing = {
    val root = new Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) TableListing(Seq.empty, Seq.empty, Seq.empty)
    else {
      val entries = fs.listStatus(root).toSeq
      val (versionDirs, foreign) = entries.partition(st =>
        st.isDirectory && VersionRe.matches(st.getPath.getName))
      val nums = versionDirs.map(st =>
        st.getPath.getName match { case VersionRe(n) => n.toLong })
      val committed = versionDirs.zip(nums)
        .filter { case (st, _) => fs.exists(new Path(st.getPath, "_SUCCESS")) }
        .map { case (st, n) => (n, st.getPath) }
        .sortBy(_._1)
      TableListing(committed, nums, foreign.map(_.getPath))
    }
  }

  /** Refuse to operate on a root holding non-versioned data: silently
    * treating it as an empty table would drop those rows on the first
    * upsert. */
  private def requireVersionedLayout(l: TableListing, path: String): Unit =
    require(l.foreign.isEmpty,
      s"$path contains non-versioned entries (${l.foreign.map(_.getName).mkString(", ")}); " +
        "refusing to treat it as an upsert table")

  /** Read the current committed version of an upsert table. */
  def readTable(s: SparkSession, path: String): DataFrame = {
    val listing = listTable(s, path)
    requireVersionedLayout(listing, path)
    listing.committed.lastOption match {
      case Some((_, p)) => s.read.parquet(p.toString)
      case None => throw new IllegalArgumentException(
        s"no committed version under $path")
    }
  }

  /** Keyed whole-row upsert into a parquet table (R5): rows in `batch`
    * replace existing rows with the same key; other rows carry over.
    *
    * Crash safety WITHOUT a rename window: each upsert writes a brand-new
    * immutable version directory (v1, v2, …), which becomes current only
    * when the job committer drops `_SUCCESS` as its final act. [[readTable]]
    * resolves the highest committed version — so a reader never sees a
    * half-written table and a crash mid-write leaves the previous version
    * current (the orphaned uncommitted directory is swept by the next
    * successful upsert). This is the poor-man's snapshot pattern the real
    * table formats (Iceberg/Delta) formalize with a metadata log.
    *
    * Scale: the anti-join broadcasts only the BATCH's keys (a micro-batch
    * is small; the table is not), so the carry-over side streams through
    * map-side. The rewrite cost is one pass over the table per batch — for
    * point-update-heavy workloads at 100 TB, partition the table and
    * restrict the rewrite to touched partitions (writePartitioned +
    * filtering carried rows by the batch's partition values).
    *
    * SINGLE WRITER: version allocation has no lock/CAS, so exactly one
    * writer may upsert a path at a time — which `foreachBatch` guarantees
    * (micro-batches are sequential). Concurrent writers would race on vN.
    */
  def upsert(batch: DataFrame, keys: Seq[String], path: String): Unit = {
    val s = batch.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val listing = listTable(s, path)
    requireVersionedLayout(listing, path)
    val deduped = batch.dropDuplicates(keys)
    val merged = listing.committed.lastOption match {
      case Some((_, cur)) =>
        s.read.parquet(cur.toString)
          .join(org.apache.spark.sql.functions.broadcast(
            deduped.select(keys.map(col): _*)), keys, "left_anti")
          .unionByName(deduped)
      case None => deduped
    }
    // number past EVERY existing version dir, committed or crashed — a
    // crashed vN must not collide with the next write
    val nextN = listing.allVersionNums.maxOption.getOrElse(0L) + 1
    merged.write.parquet(new Path(root, s"v$nextN").toString)
    // Retention: keep the new version AND its committed predecessor (a
    // reader that resolved the old current just before this commit can
    // finish its scan); sweep older committed versions and crashed
    // in-flight directories. State stays bounded at two versions.
    val keep: Set[Long] = Set(nextN) ++ listing.committed.lastOption.map(_._1)
    (listing.allVersionNums.toSet -- keep).filter(_ < nextN).foreach { n =>
      fs.delete(new Path(root, s"v$n"), true)
    }
  }

  /** [[upsert]] as a `foreachBatch` sink:
    * `df.writeStream.foreachBatch(upsertBatch(keys, path)).start()`. */
  def upsertBatch(keys: Seq[String], path: String): (DataFrame, Long) => Unit =
    (batch, _) => upsert(batch, keys, path)
}
