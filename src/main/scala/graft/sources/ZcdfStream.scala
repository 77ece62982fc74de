package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming CHANGE-FEED source over the z-store commit log — the DSv2
  * MicroBatchStream completion of [[ZOrder.readChangesSince]]'s batch
  * half: `.readStream.format("graft-zcdf").load(storeDir)` tails the
  * rows each manifest-version commit ADDED, which is how Delta users
  * consume a table's CDF first (`readStream.option("readChangeFeed",
  * true)`). The z-store is insert-only within an epoch, so the stream is
  * exactly the appended rows in commit order.
  *
  * Offsets are the store's own commit coordinates `(epoch, version)` —
  * checkpoint/restart resumes mid-epoch from the last committed version
  * with nothing re-emitted (StreamingSpec). An EPOCH SWAP (delete,
  * merge, re-cluster, optimize, manifest compaction) REFUSES loudly with
  * the full-refresh message, mapped to a source error: rewritten history
  * cannot be expressed as a row delta, so the consumer must full-refresh
  * and restart from the new epoch — precisely Delta's contract when CDF
  * meets a data rewrite.
  *
  * Batching is DETERMINISTIC: `maxVersionsPerTrigger` (default 1) caps
  * each micro-batch at whole manifest versions under
  * `SupportsAdmissionControl` + `SupportsTriggerAvailableNow` (without
  * the latter, AvailableNow would ignore the limit — the GraftShards
  * lesson), so micro-batch membership is pure commit topology and q140's
  * oracle can mirror it as SQL. A file "arrives" in the version that
  * recorded its SIZE row — metadata-attach versions (bloom stats etc.)
  * re-point files without re-emitting them.
  *
  * Scale: `latestOffset` is O(manifest versions) directory metadata;
  * `planInputPartitions` reads only the delta versions' manifest rows;
  * each InputPartition is ONE data file read executor-side through
  * parquet-hadoop's Group reader (the driver never touches row data).
  * Output schema = the store's recorded schema + `_epoch`/`_ver` commit
  * coordinates; columns are restricted to the z-store's primitive
  * surface (long/int/double/float/string/boolean/timestamp-micros) and
  * anything else refuses at schema inference, not mid-stream. */
object ZcdfStream {
  val EpochCol = "_epoch"
  val VerCol = "_ver"
  val ChangeCol = "_change_type"

  private[sources] def pathOf(options: java.util.Map[String, String]): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-zcdf needs a path: .load(<z-store dir>)"))

  private[sources] def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         BooleanType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  def tableSchema(s: SparkSession, path: String,
      changeFeed: Boolean = false): StructType = {
    val recorded = wireSchema(s, path, "graft-zcdf")
    recorded.fields.foreach { f =>
      require(!f.name.equalsIgnoreCase(EpochCol) &&
        !f.name.equalsIgnoreCase(VerCol) &&
        !(changeFeed && f.name.equalsIgnoreCase(ChangeCol)),
        s"graft-zcdf: column ${f.name} collides with the commit-coordinate " +
          "metadata columns")
    }
    StructType(recorded.fields.toSeq ++
      (if (changeFeed)
        Seq(StructField(ChangeCol, StringType, nullable = false))
      else Nil) :+
      StructField(EpochCol, LongType, nullable = false) :+
      StructField(VerCol, LongType, nullable = false))
  }

  private[sources] def changeFeedOf(
      options: java.util.Map[String, String]): Boolean =
    Option(options.get("changeFeed")).exists(_.toBoolean)

  /** The store's recorded schema (current snapshot, or a PAST committed
    * coordinate for time-travel reads — a past snapshot's schema is the
    * PAST's), validated against the primitive wire surface the
    * executor-side Group reader can decode — shared by the change-feed
    * stream and the graft-z batch table ([[ZBatch]]). */
  private[sources] def wireSchema(s: SparkSession, path: String,
      source: String, at: Option[(Long, Long)] = None): StructType = {
    val physical = at match {
      case Some((e, v)) => ZOrder.recordedSchemaAt(s, path, e, v)
      case None => ZOrder.streamState(s, path)._3
    }
    // the table surface speaks LOGICAL names (r16 column mapping):
    // renames applied, dropped columns hidden; the reader factories
    // translate requested names back to physical at plan time
    val recorded = ZOrder.logicalSchemaFor(s, path, at, physical)
    recorded.fields.foreach { f =>
      require(supported(f.dataType),
        s"$source: column ${f.name} has type ${f.dataType.simpleString}; " +
          "the wire supports long/int/double/float/string/" +
          "boolean/timestamp[_ntz]")
    }
    recorded
  }

  /** Decode one parquet-hadoop Group into `fields`-ordered values: fields
    * resolve by case-insensitive name, a column the file predates reads
    * null (the add-only evolution contract), timestamps are INT64 micros
    * by the z-store write contract ([[Sources.writeMicros]]). Shared by
    * the zcdf streaming reader and the graft-z batch reader. */
  private[sources] def decodeGroup(g: org.apache.parquet.example.data.Group,
      fields: Array[(String, String)], types: Array[DataType],
      extra: Int): Array[Any] = {
    val gt = g.getType
    val vals = new Array[Any](fields.length + extra)
    var i = 0
    while (i < fields.length) {
      val name = fields(i)._1
      val idx = (0 until gt.getFieldCount)
        .find(j => gt.getFieldName(j).equalsIgnoreCase(name))
      vals(i) = idx match {
        case Some(j) if g.getFieldRepetitionCount(j) > 0 =>
          import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
          def fileIs(t: PrimitiveTypeName): Boolean =
            gt.getType(j).isPrimitive &&
              gt.getType(j).asPrimitiveType().getPrimitiveTypeName == t
          types(i) match {
            // both timestamp flavors are INT64 micros on the wire
            // (Sources.writeMicros); NTZ vs UTC is a logical-type label.
            // TYPE WIDENING (r16): a file written before an INT->BIGINT
            // (FLOAT->DOUBLE) promotion still stores the narrow physical
            // type — widen at decode, like Spark's own readers do
            case LongType if fileIs(PrimitiveTypeName.INT32) =>
              g.getInteger(j, 0).toLong
            case LongType | TimestampType | TimestampNTZType =>
              g.getLong(j, 0)
            case IntegerType => g.getInteger(j, 0)
            case DoubleType if fileIs(PrimitiveTypeName.FLOAT) =>
              g.getFloat(j, 0).toDouble
            case DoubleType => g.getDouble(j, 0)
            case FloatType => g.getFloat(j, 0)
            case BooleanType => g.getBoolean(j, 0)
            case StringType => UTF8String.fromString(g.getString(j, 0))
            case dt => throw new IllegalStateException(
              s"unreachable: $dt passed schema inference")
          }
        case _ => null // absent or null: pre-evolution file
      }
      i += 1
    }
    vals
  }
}

case class ZcdfOffset(epoch: Long, ver: Long) extends Offset {
  override def json(): String = s"""{"epoch":$epoch,"ver":$ver}"""
}

object ZcdfOffset {
  private val Re = """"epoch"\s*:\s*(-?\d+).*"ver"\s*:\s*(-?\d+)""".r.unanchored
  def fromJson(j: String): ZcdfOffset = j match {
    case Re(e, v) => ZcdfOffset(e.toLong, v.toLong)
    case _ => throw new IllegalArgumentException(s"bad zcdf offset: $j")
  }
}

class ZcdfProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zcdf"
  // a user-supplied .schema() is accepted (e.g. a column subset, or a
  // pre-evolution shape) but ZcdfTable validates it ends with the
  // commit-coordinate columns — the wire mapping treats the last two
  // fields as metadata, so a schema without them would silently drop
  // the last two DATA columns (the r10 advisor finding)
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZcdfStream.tableSchema(SparkSession.active, ZcdfStream.pathOf(options),
      ZcdfStream.changeFeedOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ZcdfTable(ZcdfStream.pathOf(properties), schema,
      ZcdfStream.changeFeedOf(properties))
}

class ZcdfTable(path: String, tschema: StructType,
    changeFeed: Boolean = false) extends Table
    with SupportsRead {
  // the wire mapping treats the LAST TWO fields as the _epoch/_ver commit
  // coordinates — a user-supplied .schema() without them would silently
  // drop the last two real data columns (the r10 advisor finding), so a
  // schema that doesn't end with them refuses at load time
  require(tschema.fields.length >= 2 && {
    val Array(e, v) = tschema.fields.takeRight(2)
    e.name.equalsIgnoreCase(ZcdfStream.EpochCol) && e.dataType == LongType &&
    v.name.equalsIgnoreCase(ZcdfStream.VerCol) && v.dataType == LongType
  }, s"graft-zcdf: the read schema must end with the commit-coordinate " +
    s"columns ${ZcdfStream.EpochCol} BIGINT, ${ZcdfStream.VerCol} BIGINT " +
    s"(got: ${tschema.simpleString}) — omit .schema() to use the store's " +
    "recorded schema")
  // changeFeed mode maps the THIRD-from-last field to _change_type (the
  // reader pins per-partition constants by that ordinal) — a user
  // .schema() without it would silently overwrite a data column
  require(!changeFeed || (tschema.fields.length >= 3 && {
    val ct = tschema.fields(tschema.fields.length - 3)
    ct.name.equalsIgnoreCase(ZcdfStream.ChangeCol) &&
      ct.dataType == StringType
  }), s"graft-zcdf changeFeed: the read schema must carry " +
    s"${ZcdfStream.ChangeCol} STRING immediately before the " +
    "commit-coordinate columns — omit .schema() to use the inferred one")
  override def name(): String = s"graft-zcdf:$path"
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    if (changeFeed)
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_READ)
    else java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      // a changeFeed TABLE (the `<table>.changes` metadata table) is in
      // changeFeed mode BY IDENTITY — the wire mode must follow the
      // table, not the read options (a table-name read passes none)
      private val effOpts =
        if (!changeFeed || ZcdfStream.changeFeedOf(options)) options
        else {
          val m = new java.util.HashMap[String, String](options)
          m.put("changeFeed", "true")
          new CaseInsensitiveStringMap(m)
        }
      override def build(): Scan = this
      override def readSchema(): StructType = tschema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ZcdfMicroBatchStream(path, tschema, effOpts)
      // BATCH read of the `<table>.changes` metadata table (r15): the
      // FULL recorded history, earliest committed epoch to the current
      // snapshot — the same feed walk and readers as the stream, planned
      // as one batch (Delta's table_changes shape). A history crossing a
      // no-record rewrite refuses with the full-refresh contract, like
      // every feed read.
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        new org.apache.spark.sql.connector.read.Batch {
          private val opts = new java.util.HashMap[String, String](options)
          locally {
            // a user-supplied startingVersion is HONORED (r16 advisor:
            // it used to be silently overridden); absent, the batch
            // reads the full recorded history
            if (!options.containsKey("startingVersion"))
              opts.put("startingVersion", "earliest")
            opts.put("changeFeed", "true")
          }
          private val ms = new ZcdfMicroBatchStream(path, tschema,
            new CaseInsensitiveStringMap(opts))
          // offsets resolve ONCE per Batch instance: Spark plans a DSv2
          // scan's partitions twice per query (AQE), and a commit landing
          // between the two passes must not yield two different partition
          // sets for one logical read (r16 advisor)
          private lazy val range = (ms.initialOffset(), ms.latestOffset())
          override def planInputPartitions(): Array[InputPartition] =
            ms.planInputPartitions(range._1, range._2)
          override def createReaderFactory(): PartitionReaderFactory =
            ms.createReaderFactory()
        }
    }
}

/** The graft-z TABLE's streaming read — what makes
  * `spark.readStream.table("graftz.ns.t")` (and `spark.readStream
  * .format("graft-z").load(dir)`) tail the store without switching to
  * the `graft-zcdf` format+path incantation (the r12 verdict's item 4:
  * "one table, all verbs"). A thin projection over the change-feed
  * stream: the TABLE's streaming schema is its own columns (Spark
  * resolves the streaming relation against the table schema), so the
  * `_epoch`/`_ver` commit coordinates the zcdf wire carries are
  * projected away (consumers who want them keep the zcdf format). Same
  * offsets, same admission control, same epoch-rewrite refusal
  * contract — spec-pinned through the catalog name. */
private[sources] class ZTableMicroBatchStream(path: String,
    required: StructType, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  require(!ZcdfStream.changeFeedOf(options),
    "changeFeed mode adds the _change_type wire column, which the BASE " +
      "table's stream cannot carry (Spark resolves the streaming " +
      "relation against the table schema; read options never reach " +
      "it) — stream the CHANGES METADATA TABLE instead: " +
      "spark.readStream.table(\"<catalog>.<ns>.<table>.changes\") " +
      "(or spark.readStream.format(\"graft-zcdf\")" +
      ".option(\"changeFeed\", \"true\").load(<store dir>))")
  private val full = ZcdfStream.tableSchema(SparkSession.active, path)
  private val inner = new ZcdfMicroBatchStream(path, full, options)

  override def initialOffset(): Offset = inner.initialOffset()
  override def latestOffset(): Offset = inner.latestOffset()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    inner.latestOffset(start, limit)
  override def getDefaultReadLimit: ReadLimit = inner.getDefaultReadLimit
  override def prepareForTriggerAvailableNow(): Unit =
    inner.prepareForTriggerAvailableNow()
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] =
    inner.planInputPartitions(start, end)
  override def createReaderFactory(): PartitionReaderFactory = {
    val ordinals = required.fields.map { f =>
      val i = full.fields.indexWhere(_.name.equalsIgnoreCase(f.name))
      require(i >= 0, s"graft-z stream: column ${f.name} is not in the " +
        s"store schema (${full.fieldNames.mkString(", ")})")
      i
    }
    ZTableProjectingFactory(inner.createReaderFactory(), ordinals,
      required.fields.map(f => (f.name, f.dataType.catalogString)))
  }
  override def deserializeOffset(json: String): Offset =
    inner.deserializeOffset(json)
  override def commit(end: Offset): Unit = inner.commit(end)
  override def stop(): Unit = inner.stop()
}

/** Executor-side projection of the zcdf wire row (data ++ coordinates)
  * onto the TABLE's requested columns. */
private[sources] case class ZTableProjectingFactory(
    inner: PartitionReaderFactory, ordinals: Array[Int],
    fields: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val in = inner.createReader(partition)
    val schema = StructType(fields.map { case (n, ddl) =>
      org.apache.spark.sql.types.StructField(n, DataType.fromDDL(ddl))
    })
    val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
      schema, ordinals.toIndexedSeq)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = in.next()
      override def get(): InternalRow = { proj.project(in.get()); proj }
      override def close(): Unit = in.close()
    }
  }
}

class ZcdfMicroBatchStream(path: String, tschema: StructType,
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def s = SparkSession.active
  private val maxVersions: Long = {
    val v = options.getLong("maxVersionsPerTrigger", 1L)
    require(v != 0, "maxVersionsPerTrigger must be positive (or <0 = all)")
    v
  }
  private val startingVersion: String =
    options.getOrDefault("startingVersion", "earliest")

  /** `.option("changeFeed", "true")` — Delta's streaming
    * `readChangeFeed`: the wire gains [[ZcdfStream.ChangeCol]], version
    * arrivals emit as `insert` rows, and the stream CROSSES DML epoch
    * rewrites by emitting their recorded change sets at the new epoch's
    * v0 coordinate ([[ZOrder.feedSteps]] — the same walk, watermark
    * capping and refuse-on-no-record contract as the batch
    * readChangeFeed). Without the option the r13 contract is unchanged:
    * any epoch swap refuses with full-refresh. */
  private val changeFeed = ZcdfStream.changeFeedOf(options)
  @volatile private var availableNowEnd: Option[ZcdfOffset] = None

  private def refuseSwap(cur: Long, seen: Long): Nothing =
    throw new IllegalStateException(
      s"z-store at $path was rewritten since e$seen (current: e$cur) — a " +
        "row delta across an epoch swap does not exist; full-refresh the " +
        "consumer and restart the stream from the current epoch")

  override def initialOffset(): Offset = {
    val (e, maxVer, _) = ZOrder.streamState(s, path)
    startingVersion match {
      case "earliest" if changeFeed =>
        // the feed can cross epochs, so earliest = the OLDEST committed
        // epoch still on disk (full history replay, Delta's
        // startingVersion 0)
        ZcdfOffset(ZOrder.listVersions(s, path).map(_._1).min, -1L)
      case "earliest" => ZcdfOffset(e, -1L) // v0 onward
      case "latest" => ZcdfOffset(e, maxVer) // only future commits
      case v => ZcdfOffset(e, v.toLong) // resume AFTER version v
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    if (maxVersions < 0) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxVersions) // "rows" = whole manifest versions

  private def cap(limit: ReadLimit): Long = limit match {
    case r: ReadMaxRows => r.maxRows()
    case c: CompositeReadLimit =>
      c.getReadLimits.map(cap).filter(_ != Long.MaxValue)
        .reduceOption(_ min _).getOrElse(Long.MaxValue)
    case _ => Long.MaxValue
  }

  override def prepareForTriggerAvailableNow(): Unit = {
    val (e, maxVer, _) = ZOrder.streamState(s, path)
    availableNowEnd = Some(ZcdfOffset(e, maxVer))
  }

  override def latestOffset(): Offset = {
    val (e, maxVer, _) = ZOrder.streamState(s, path)
    ZcdfOffset(e, maxVer)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val st = start.asInstanceOf[ZcdfOffset]
    val (curE, curMax) = availableNowEnd match {
      case Some(pinned) => (pinned.epoch, pinned.ver)
      case None =>
        val (e, maxVer, _) = ZOrder.streamState(s, path)
        (e, maxVer)
    }
    if (changeFeed) {
      // the feed-coordinate chain after the consumed offset, capped at
      // whole coordinates per trigger (a transition counts as one) —
      // pure metadata (withFiles = false); a transition without a
      // change record refuses HERE, at poll time
      val chain = ZOrder.feedSteps(s, path, (st.epoch, st.ver),
        Some((curE, curMax)), withFiles = false)
      val c = cap(limit)
      val take = if (c >= chain.size) chain
        else chain.take(math.max(c, 0L).toInt)
      take.lastOption.map(u => ZcdfOffset(u.epoch, u.ver)).getOrElse(st)
    } else {
      if (curE != st.epoch) refuseSwap(curE, st.epoch)
      val c = cap(limit)
      // saturating step (the GraftShards overflow lesson)
      val end = if (c == Long.MaxValue || curMax - st.ver <= c) curMax
        else st.ver + c
      ZcdfOffset(curE, math.max(end, st.ver))
    }
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val st = start.asInstanceOf[ZcdfOffset]
    val en = end.asInstanceOf[ZcdfOffset]
    if (changeFeed) {
      if (Ordering[(Long, Long)].lteq((en.epoch, en.ver),
          (st.epoch, st.ver))) return Array.empty
      ZOrder.feedSteps(s, path, (st.epoch, st.ver),
          Some((en.epoch, en.ver)), withFiles = true)
        .flatMap {
          case ZOrder.FeedInsert(e, v, files) => files.map(f =>
            ZcdfPartition(s"$path/$f", e, v, Some("insert"))
              : InputPartition)
          case ZOrder.FeedTransition(e, files) => files.map(f =>
            ZcdfPartition(f, e, 0L, None): InputPartition)
        }.toArray
    } else {
      if (st.epoch != en.epoch) refuseSwap(en.epoch, st.epoch)
      if (en.ver <= st.ver) return Array.empty
      ZOrder.changeFiles(s, path, en.epoch, st.ver, en.ver)
        .map { case (ver, f) =>
          ZcdfPartition(s"$path/$f", en.epoch, ver): InputPartition
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZcdfReaderFactory(GraftShardsSource.confOverrides(s),
      // requested names translate LOGICAL→physical at plan time (r16
      // column mapping): files and change records store physical names;
      // the wire row is positional, so the output schema stays logical
      ZOrder.physicalReadFields(s, path, None,
        tschema.fields.dropRight(2)
          .map(f => (f.name, f.dataType.catalogString))),
      // in changeFeed mode the LAST data field is _change_type: read
      // from the file (a transition's change set carries it as data)
      // unless the partition pins a constant (version arrivals =
      // 'insert')
      ctIdx = if (changeFeed) tschema.fields.length - 3 else -1)

  override def deserializeOffset(json: String): Offset =
    ZcdfOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ZcdfPartition(file: String, epoch: Long, ver: Long,
    changeType: Option[String] = None) extends InputPartition

/** Executor-side parquet reader for one change-feed file: parquet-hadoop's
  * example Group materializer (public API, on every Spark classpath)
  * decodes rows without any SparkSession; fields resolve by
  * case-insensitive name, a column the file predates reads null (the
  * add-only evolution contract), and timestamps are INT64 micros by the
  * z-store write contract ([[Sources.writeMicros]]). */
case class ZcdfReaderFactory(confOverrides: Map[String, String],
    fields: Array[(String, String)], ctIdx: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ZcdfPartition]
    val types: Array[DataType] =
      fields.map { case (_, ddl) => DataType.fromDDL(ddl) }
    new PartitionReader[InternalRow] {
      private val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new Path(p.file))
        .withConf(GraftShardsSource.hadoopConf(confOverrides))
        .build()
      private var current: InternalRow = _

      override def next(): Boolean = {
        val g = reader.read()
        if (g == null) false
        else { current = convert(g); true }
      }

      private def convert(
          g: org.apache.parquet.example.data.Group): InternalRow = {
        val vals = ZcdfStream.decodeGroup(g, fields, types, extra = 2)
        if (ctIdx >= 0) p.changeType.foreach(ct =>
          vals(ctIdx) = UTF8String.fromString(ct))
        vals(fields.length) = p.epoch
        vals(fields.length + 1) = p.ver
        new GenericInternalRow(vals)
      }

      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
    }
  }
}
