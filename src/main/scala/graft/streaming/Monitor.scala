package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.StructType

/** Live pipeline monitoring — the reference's CloudWatch dashboard analog
  * (s3-for-process-data dashboard.yml:14-57, 70-149: executions
  * started/succeeded/failed and average latency, charted per minute for a
  * RUNNING pipeline). The reference pushes metrics to a managed service;
  * here metrics are JUST A TABLE: a [[StreamingQueryListener]] publishes
  * one row per completed micro-batch (and one per query start/stop) into
  * an append-only JSON-lines progress directory, and the dashboard is
  * ordinary Spark SQL over it — queryable live while the stream runs.
  *
  * Scale/deployment notes:
  *  - each progress event is ONE small file published atomically
  *    (temp + rename, the chunk-publication pattern): no append mutation,
  *    so the layout works on object stores, and a dashboard reader never
  *    sees a torn record. Volume is dashboard-granularity (one row per
  *    trigger per query — seconds to minutes apart), so small files are
  *    bounded by trigger cadence, not data volume; compact or TTL the
  *    directory like any log table if a deployment runs months.
  *  - the listener is ASYNC (Spark delivers events off the micro-batch
  *    path), so publishing never blocks or slows the measured query.
  *  - reads use an explicit schema ([[ProgressSchema]]) — no inference
  *    pass, same stance as every other scan in the engine.
  */
object Monitor {

  /** One row per listener event. `kind` is `progress` for a completed
    * micro-batch, `started`/`terminated` for lifecycle events (the
    * dashboard's "executions started/succeeded/failed" — a terminated row
    * carries the exception text when the query failed). */
  val ProgressSchema: StructType = StructType.fromDDL(
    "kind STRING, query_name STRING, run_id STRING, batch_id BIGINT, " +
      "ts TIMESTAMP, num_input_rows BIGINT, input_rows_per_sec DOUBLE, " +
      "processed_rows_per_sec DOUBLE, batch_duration_ms BIGINT, " +
      "state_rows BIGINT, state_bytes BIGINT, sink STRING, error STRING")

  /** Publishes every streaming-progress event of the session as one
    * atomically-renamed JSON-lines file under `path`. Register via
    * [[attach]]; `queryNames` (if non-empty) restricts capture to those
    * query names — one listener per monitored pipeline, not per session.
    */
  final class ProgressListener(s: SparkSession, path: String,
      queryNames: Set[String], detachOnTerminate: Boolean = false)
      extends StreamingQueryListener {
    private val root = new Path(path)
    private val conf = new org.apache.hadoop.conf.Configuration(
      s.sparkContext.hadoopConfiguration)
    // runs of the monitored names seen so far: terminated events carry no
    // name, so membership decides whether a termination belongs to us
    private val runs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    private def wants(name: String): Boolean =
      queryNames.isEmpty || (name != null && queryNames.contains(name))

    private def jstr(v: String): String =
      if (v == null) "null"
      else org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JString(v)))

    /** Atomic one-event publish: write a temp file, rename to the final
      * name. The name is (runId, kind, batchId)-keyed, so a re-delivered
      * event overwrites its own record idempotently instead of
      * duplicating a dashboard row. */
    private def publish(name: String, line: String): Unit = {
      val f = root.getFileSystem(conf)
      f.mkdirs(root)
      val tmp = new Path(root,
        s"_tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, true)
      out.write((line + "\n").getBytes(StandardCharsets.UTF_8))
      out.close()
      val dst = new Path(root, name)
      if (!f.rename(tmp, dst)) {
        f.delete(tmp, false)
        // ONLY an idempotent re-delivery (dst already published) is
        // benign; anything else (throttle, permissions, quota) must
        // surface — Spark logs listener exceptions — instead of silently
        // under-reporting the dashboard
        if (!f.exists(dst))
          throw new java.io.IOException(s"progress publish failed: $dst")
      }
    }

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit =
      if (wants(e.name)) {
        runs.add(e.runId.toString)
        publish(s"ev-${e.runId}-started.jsonl",
          s"""{"kind":"started","query_name":${jstr(e.name)},"run_id":"${e.runId}","ts":${jstr(e.timestamp)}}""")
      }

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (!wants(p.name)) return
      runs.add(p.runId.toString) // attach may have raced the started event
      val stateRows = p.stateOperators.map(_.numRowsTotal).sum
      val stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum
      def num(d: Double): String =
        if (d.isNaN || d.isInfinite) "null" else d.toString
      publish(s"ev-${p.runId}-b${p.batchId}.jsonl",
        s"""{"kind":"progress","query_name":${jstr(p.name)},"run_id":"${p.runId}","batch_id":${p.batchId},"ts":${jstr(p.timestamp)},"num_input_rows":${p.numInputRows},"input_rows_per_sec":${num(p.inputRowsPerSecond)},"processed_rows_per_sec":${num(p.processedRowsPerSecond)},"batch_duration_ms":${p.batchDuration},"state_rows":$stateRows,"state_bytes":$stateBytes,"sink":${jstr(p.sink.description)}}""")
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      // the terminated event carries no name: membership in `runs` decides
      // ownership (publish-all when the listener is unfiltered)
      if (queryNames.isEmpty || runs.contains(e.runId.toString)) {
        publish(s"ev-${e.runId}-terminated.jsonl",
          s"""{"kind":"terminated","run_id":"${e.runId}","error":${jstr(e.exception.orNull)}}""")
        if (detachOnTerminate && runs.remove(e.runId.toString) && runs.isEmpty)
          s.streams.removeListener(this)
      }
  }

  /** Register a progress listener on the session and return it (keep the
    * handle: [[detach]] it when the monitored pipeline stops — the shared
    * session outlives any one query). */
  def attach(s: SparkSession, path: String,
      queryNames: Set[String] = Set.empty): ProgressListener = {
    val l = new ProgressListener(s, path, queryNames)
    s.streams.addListener(l)
    l
  }

  def detach(s: SparkSession, l: ProgressListener): Unit =
    s.streams.removeListener(l)

  /** Block (bounded) until the run's terminated marker is published. The
    * listener bus delivers events asynchronously but IN ORDER, so the
    * marker's presence guarantees every earlier progress row of the run is
    * on disk — the barrier a test or a bounded pipeline needs between
    * `awaitTermination` and reading the progress table. */
  def awaitRunPublished(s: SparkSession, path: String, runId: String,
      timeoutMs: Long = 30000): Unit = {
    val p = new Path(path, s"ev-$runId-terminated.jsonl")
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!f.exists(p)) {
      require(System.nanoTime() < deadline,
        s"progress publication of run $runId not observed within ${timeoutMs}ms")
      Thread.sleep(20)
    }
  }

  /** The raw progress table (explicit schema, no inference). A real
    * directory + pathGlobFilter, NOT a glob path: DataFrameReader's
    * FileStreamSink-metadata probe stats a glob string literally and logs
    * a full FileNotFoundException stack trace (benign but it pollutes
    * every log triage) before falling back. */
  def progressTable(s: SparkSession, path: String): DataFrame =
    s.read.schema(ProgressSchema)
      .option("pathGlobFilter", "ev-*.jsonl").json(path)

  /** The dashboard view (dashboard.yml:14-57 analog): per query name and
    * minute — batches completed, rows ingested, average ingest rate,
    * average batch latency, and the state-store footprint's high-water
    * mark. Plain aggregate over [[progressTable]]; run it WHILE the
    * pipeline runs for the live view. */
  def dashboard(s: SparkSession, path: String): DataFrame =
    progressTable(s, path)
      .filter(col("kind") === "progress")
      .groupBy(col("query_name"),
        date_trunc("minute", col("ts")).as("minute"))
      .agg(
        count(lit(1)).as("n_batches"),
        sum(col("num_input_rows")).as("rows_in"),
        avg(col("input_rows_per_sec")).as("avg_rows_per_sec"),
        avg(col("batch_duration_ms")).as("avg_batch_ms"),
        max(col("state_rows")).as("max_state_rows"))
      .orderBy(col("query_name"), col("minute"))
}
