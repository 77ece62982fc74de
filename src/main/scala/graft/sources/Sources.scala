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

  /** CSV scan with explicit schema + header. */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Hive-style partitioned parquet write: reads filtered on `partCols`
    * prune to matching directories (partition pruning — verified in
    * SourcesSpec via inputFiles). */
  def writePartitioned(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Keyed whole-row upsert into a parquet table (R5): rows in `batch`
    * replace existing rows with the same key; other rows carry over. The
    * merge is one anti-join + union job writing to a staging directory,
    * then an atomic directory swap — readers never see a half-written
    * table, and a failed job leaves the target untouched.
    *
    * Scale: the anti-join broadcasts only the BATCH's keys (a micro-batch
    * is small; the table is not), so the carry-over side streams through
    * map-side. The rewrite cost is one pass over the table per batch — for
    * point-update-heavy workloads at 100 TB, partition the table and
    * restrict the rewrite to touched partitions (writePartitioned +
    * filtering carried rows by the batch's partition values).
    */
  def upsert(batch: DataFrame, keys: Seq[String], path: String): Unit = {
    val s = batch.sparkSession
    val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val deduped = batch.dropDuplicates(keys)
    val merged =
      if (fs.exists(target))
        s.read.parquet(path)
          .join(org.apache.spark.sql.functions.broadcast(
            deduped.select(keys.map(col): _*)), keys, "left_anti")
          .unionByName(deduped)
      else deduped
    val staging = new Path(path + ".__staging__")
    merged.write.mode("overwrite").parquet(staging.toString)
    val old = new Path(path + ".__old__")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(staging, target)
    fs.delete(old, true)
  }

  /** [[upsert]] as a `foreachBatch` sink:
    * `df.writeStream.foreachBatch(upsertBatch(keys, path)).start()`. */
  def upsertBatch(keys: Seq[String], path: String): (DataFrame, Long) => Unit =
    (batch, _) => upsert(batch, keys, path)
}
