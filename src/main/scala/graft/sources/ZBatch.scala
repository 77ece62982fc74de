package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The z-store as a PLAIN SPARK TABLE — `spark.read.format("graft-z")
  * .load(storeDir)`: the DSv2 batch completion of the explicit API
  * surface ([[ZOrder.readZRange]] et al.), so any SQL consumer queries
  * the store with ordinary filters and the MANIFEST does the file
  * skipping invisibly, the way Delta/Iceberg readers consume their commit
  * logs. `df.filter($"k" between (lo, hi))` plans only the files whose
  * recorded ranges can hold matches.
  *
  * Pushdown contract (the parquet source's own): range/equality filters
  * on stat-eligible columns are REPORTED as pushed and drive manifest
  * pruning, but every filter is also returned as unhandled so Spark keeps
  * the full predicate on top — pruning is best-effort; correctness never
  * depends on it (a column with no recorded stats prunes nothing and is
  * still filtered exactly). Column pruning reaches the wire: the reader
  * materializes only the projected fields.
  *
  * Scale: planning is the read path's distributed manifest job + the
  * surviving file-name list; each InputPartition is ONE data file decoded
  * executor-side through parquet-hadoop's Group materializer against the
  * RECORDED schema (absent column = null — the add-only evolution
  * contract; the driver never touches row data). The snapshot is resolved
  * ONCE at scan build: a concurrent epoch rewrite can't tear the file
  * list mid-query (old-or-new, never a mix), and a listed-but-missing
  * file fails the read loudly. */
class ZBatchProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-z"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZcdfStream.wireSchema(SparkSession.active, ZcdfStream.pathOf(options),
      "graft-z", ZBatch.travelOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ZBatchTable(ZcdfStream.pathOf(properties), schema)
}

object ZBatch {
  /** Time-travel coordinates from read options — Delta's two travel
    * forms through the table surface: `epoch` + `version` (versionAsOf —
    * both or neither) or `timestampAsOf` (epoch-millis, resolved to the
    * latest commit at-or-before via [[ZOrder.versionAsOfTimestamp]]).
    * The snapshot's own schema governs the read; vacuumed/bogus
    * coordinates refuse at load. */
  private[sources] def travelOf(
      options: java.util.Map[String, String]): Option[(Long, Long)] = {
    val e = Option(options.get("epoch"))
    val v = Option(options.get("version"))
    val ts = Option(options.get("timestampAsOf"))
    require(e.isEmpty == v.isEmpty,
      "graft-z time travel needs BOTH .option(\"epoch\", …) and " +
        ".option(\"version\", …)")
    require(ts.isEmpty || e.isEmpty,
      "graft-z time travel takes EITHER epoch/version OR timestampAsOf, " +
        "not both")
    ts match {
      case Some(t) => Some(ZOrder.versionAsOfTimestamp(SparkSession.active,
        ZcdfStream.pathOf(options), t.toLong))
      case None => e.zip(v).map { case (a, b) => (a.toLong, b.toLong) }
    }
  }
}

class ZBatchTable(path: String, tschema: StructType) extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-z:$path"
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZBatchScanBuilder(path, tschema, ZBatch.travelOf(options))

  /** The WRITE half of the table surface, via the V1 insert bridge (the
    * Kafka-sink pattern): the z-append/rebuild commit protocol is
    * driver-orchestrated (z-sort job + footer harvest + manifest-version
    * CAS), so the table delegates to [[ZOrder.appendZOrdered]] /
    * [[ZOrder.writeZOrdered]] rather than reimplementing it as per-task
    * writers — `df.write.format("graft-z").option("zcols", "k1,k2")
    * .mode("append"|"overwrite").save(dir)`, with `numFiles`, `statCols`
    * and the exactly-once `tag` as options. Append schema evolution
    * through the TABLE surface follows Spark's by-name output resolution
    * (extra columns refuse at analysis); the programmatic API remains
    * the add-only evolution path. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ZBatchWriteBuilder(path, info)
}

class ZBatchWriteBuilder(path: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var overwrite = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwrite = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation
          : org.apache.spark.sql.sources.InsertableRelation =
        new org.apache.spark.sql.sources.InsertableRelation {
          override def insert(data: org.apache.spark.sql.DataFrame,
              overwriteArg: Boolean): Unit = {
            val opts = info.options
            val zcols = Option(opts.get("zcols"))
              .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(throw new IllegalArgumentException(
                "graft-z write needs .option(\"zcols\", \"c1,c2\") — " +
                  "the clustering keys of the batch"))
            val numFiles = Option(opts.get("numFiles"))
              .map(_.toInt).getOrElse(32)
            val statCols = Option(opts.get("statCols"))
              .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(Seq.empty)
            val tag = Option(opts.get("tag"))
            if (overwrite || overwriteArg)
              ZOrder.writeZOrdered(data, path, zcols, numFiles, statCols)
            else
              ZOrder.appendZOrdered(data, path, zcols, numFiles, statCols,
                tag)
          }
        }
    }
}

class ZBatchScanBuilder(path: String, tschema: StructType,
    travel: Option[(Long, Long)])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tschema

  /** Fold one source filter into the per-column (lo, hi) bound map —
    * only shapes the manifest's range stats can act on; strict
    * inequalities widen to inclusive (sound: never prunes more). */
  private def boundsOf(f: Filter,
      acc: Map[String, (Option[Any], Option[Any])])
      : Option[Map[String, (Option[Any], Option[Any])]] = {
    def merge(c: String, lo: Option[Any], hi: Option[Any]) = {
      val (l0, h0) = acc.getOrElse(c, (None, None))
      // several bounds on one column: keep any one per side (pruning is
      // best-effort; the tightest-vs-any choice only affects efficiency)
      Some(acc.updated(c, (lo.orElse(l0), hi.orElse(h0))))
    }
    f match {
      case EqualTo(c, v) if v != null => merge(c, Some(v), Some(v))
      case GreaterThan(c, v) if v != null => merge(c, Some(v), None)
      case GreaterThanOrEqual(c, v) if v != null => merge(c, Some(v), None)
      case LessThan(c, v) if v != null => merge(c, None, Some(v))
      case LessThanOrEqual(c, v) if v != null => merge(c, None, Some(v))
      case And(l, r) => boundsOf(l, acc).flatMap(boundsOf(r, _))
      case _ => None
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => boundsOf(f, Map.empty).isDefined)
    filters // ALL filters stay with Spark: pruning is best-effort
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = {
    val bounds = pushed.foldLeft(Map.empty[String, (Option[Any], Option[Any])]) {
      (acc, f) => boundsOf(f, acc).getOrElse(acc)
    }.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
    new ZBatchScan(path, required, bounds, travel)
  }
}

class ZBatchScan(path: String, required: StructType,
    bounds: Seq[(String, Option[Any], Option[Any])],
    travel: Option[(Long, Long)]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-z $path${travel.map(t => s" @ (e${t._1}, v${t._2})")
      .getOrElse("")}, pruned on [${bounds.map(_._1).sorted.mkString(", ")}]"

  /** Surviving files BIN-PACKED into partitions at
    * `spark.sql.files.maxPartitionBytes` (the FileSourceScan discipline):
    * at 1M small files, one-task-per-file is a scheduler storm — sizes
    * come from the manifest's `__size__` rows (no per-file HEADs at plan
    * time; a pre-size manifest row with no size gets its own partition),
    * and packing runs over the z-SORTED file list so a partition's files
    * stay curve-adjacent (one task reads one z-range neighborhood). */
  override def planInputPartitions(): Array[InputPartition] = {
    val s = SparkSession.active
    val (files, _) = ZOrder.pruneFilesForScan(s, path, bounds, travel)
    val maxBytes = s.sessionState.conf.filesMaxPartitionBytes
    val bins = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
    var cur = Vector.empty[String]
    var curBytes = 0L
    files.foreach { case (f, szOpt) =>
      val sz = szOpt.getOrElse(maxBytes) // unknown size: own partition
      if (cur.nonEmpty && curBytes + sz > maxBytes) {
        bins += cur; cur = Vector.empty; curBytes = 0L
      }
      cur :+= s"$path/$f"; curBytes += sz
    }
    if (cur.nonEmpty) bins += cur
    bins.map(fs => ZBatchPartition(fs): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZBatchReaderFactory(
      GraftShardsSource.confOverrides(SparkSession.active),
      required.fields.map(f => (f.name, f.dataType.catalogString)))
}

case class ZBatchPartition(files: Seq[String]) extends InputPartition

/** Executor-side parquet reader for one manifest-listed z-store file:
  * the zcdf wire decode ([[ZcdfStream.decodeGroup]]) over the PROJECTED
  * columns only — the projection is pushed into the parquet reader
  * itself (requested-schema = the file schema restricted to the
  * projected names, so only those column chunks are decoded; a file
  * predating an evolved column simply omits it and the row reads null),
  * not merely applied after a full-row materialization. */
case class ZBatchReaderFactory(confOverrides: Map[String, String],
    fields: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZBatchPartition]
    val types: Array[DataType] =
      fields.map { case (_, ddl) => DataType.fromDDL(ddl) }
    new PartitionReader[InternalRow] {
      private val it = p.files.iterator
      private var reader: org.apache.parquet.hadoop.ParquetReader[
        org.apache.parquet.example.data.Group] = _
      private var current: InternalRow = _

      /** Open the next file of the bin with a PRIVATE conf copy (the
        * per-file projection must never leak into the shared session
        * configuration): requested-schema = file schema ∩ projection,
        * so only projected chunks decode; a file where every projected
        * column is absent falls back to the full schema (rows still
        * count for e.g. COUNT(*)). */
      private def openNext(): Boolean =
        if (!it.hasNext) false
        else {
          val file = it.next()
          val conf = new org.apache.hadoop.conf.Configuration(
            GraftShardsSource.hadoopConf(confOverrides))
          import scala.jdk.CollectionConverters._
          val inFile = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(file), conf)
          val fileSchema = {
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(inFile)
            try r.getFooter.getFileMetaData.getSchema finally r.close()
          }
          val wanted = fields.map(_._1.toLowerCase).toSet
          val kept = fileSchema.getFields.asScala
            .filter(f => wanted.contains(f.getName.toLowerCase)).asJava
          if (!kept.isEmpty)
            conf.set(org.apache.parquet.hadoop.api.ReadSupport
                .PARQUET_READ_SCHEMA,
              new org.apache.parquet.schema.MessageType("spark_schema",
                kept).toString)
          reader = org.apache.parquet.hadoop.ParquetReader
            .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
              new Path(file))
            .withConf(conf)
            .build()
          true
        }

      override def next(): Boolean = {
        while (true) {
          if (reader == null) { if (!openNext()) return false }
          val g = reader.read()
          if (g != null) {
            current = new GenericInternalRow(
              ZcdfStream.decodeGroup(g, fields, types, extra = 0))
            return true
          }
          reader.close()
          reader = null
        }
        false // unreachable
      }

      override def get(): InternalRow = current
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}
