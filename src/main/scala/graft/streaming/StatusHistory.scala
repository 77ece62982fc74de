package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.streaming.Correlate.StatusEvent

/** The reference's correlation state machine on Spark 4's
  * `transformWithState` — the successor API to `flatMapGroupsWithState`
  * used by [[Correlate]]. What the new API buys at scale:
  *
  *  - **Composite state types**: the status TRAIL is a [[ListState]] the
  *    store appends to in place. `flatMapGroupsWithState` has one opaque
  *    state value per key, so an append rewrites the whole accumulated
  *    object every event — quadratic in trail length; here each event
  *    writes only itself.
  *  - **Per-state TTL** (`TTLConfig`) instead of hand-armed timeout
  *    timestamps.
  *  - **RocksDB-only by design** — state lives off-heap from the start,
  *    the terabyte-state deployment path proven in StreamingSpec.
  *
  * Semantics (pinned in StreamingSpec): statuses accumulate per txn in
  * event order across micro-batches; the first terminal status emits one
  * record carrying the FULL delivery trail (the observability record the
  * reference's CloudWatch dashboard approximates per-execution) and
  * clears the key's state. Events for a completed txn re-open a fresh
  * trail — tombstone hardening stays with [[Correlate]]; this operator
  * demonstrates the API surface.
  */
object StatusHistory {

  /** One completed txn with its full status trail. */
  case class HistoryResult(
      txnId: String, finalStatus: String, nEvents: Int, trail: String)

  class HistoryProcessor
      extends StatefulProcessor[String, StatusEvent, HistoryResult] {

    @transient private var trail: ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      trail = getHandle.getListState[String](
        "trail", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(
        txnId: String,
        rows: Iterator[StatusEvent],
        timerValues: TimerValues): Iterator[HistoryResult] = {
      val batch = rows.toSeq.sortBy(e => (e.ts.getTime, e.status))
      val out = Seq.newBuilder[HistoryResult]
      batch.foreach { e =>
        trail.appendValue(e.status)
        if (e.status == "SUCCEEDED" || e.status == "FAILED") {
          val full = trail.get().toSeq
          out += HistoryResult(txnId, e.status, full.size, full.mkString(","))
          trail.clear() // completed: next event opens a fresh trail
        }
      }
      out.result().iterator
    }
  }

  /** Requires the RocksDB state-store provider (a `transformWithState`
    * constraint — set `spark.sql.streaming.stateStore.providerClass`
    * before starting the query). */
  def statusHistory(events: Dataset[StatusEvent]): Dataset[HistoryResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.txnId)
      .transformWithState(
        new HistoryProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** The timeout half of the correlator on the new API: EVENT-TIME TIMERS
    * (`registerTimer` / `handleExpiredTimer`) instead of
    * `flatMapGroupsWithState`'s single hand-armed timeout timestamp — a
    * processor can hold many independent timers per key, and expiry
    * arrives as its own callback rather than a flag checked at the top of
    * the input handler. Semantics mirror [[Correlate]]'s core: a terminal
    * status completes the txn (and cancels its timer); a txn that sees no
    * terminal within 20 s of event time times out. */
  class TimeoutProcessor
      extends StatefulProcessor[String, StatusEvent, HistoryResult] {

    @transient private var lastTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastTs = getHandle.getValueState[Long](
        "lastTs", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        txnId: String,
        rows: Iterator[StatusEvent],
        timerValues: TimerValues): Iterator[HistoryResult] = {
      val batch = rows.toSeq.sortBy(_.ts.getTime)
      val terminal = batch.find(e =>
        e.status == "SUCCEEDED" || e.status == "FAILED")
      terminal match {
        case Some(e) =>
          if (lastTs.exists()) {
            getHandle.deleteTimer(lastTs.get() + Correlate.TimeoutMs)
            lastTs.clear()
          }
          Iterator(HistoryResult(txnId, e.status, batch.size, e.status))
        case None =>
          val maxTs = batch.map(_.ts.getTime).max
          if (lastTs.exists()) // re-arm: drop the stale timer
            getHandle.deleteTimer(lastTs.get() + Correlate.TimeoutMs)
          lastTs.update(maxTs)
          getHandle.registerTimer(maxTs + Correlate.TimeoutMs)
          Iterator.empty
      }
    }

    override def handleExpiredTimer(
        txnId: String,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[HistoryResult] = {
      lastTs.clear()
      Iterator(HistoryResult(txnId, "TIMEOUT", 0, "TIMEOUT"))
    }
  }

  /** Event-time variant: requires a watermark on `ts` (timers fire when
    * the watermark passes their expiry) and the RocksDB provider. */
  def correlateWithTimers(events: Dataset[StatusEvent]): Dataset[HistoryResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.txnId)
      .transformWithState(
        new TimeoutProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
