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
      // same-ts ties order terminals LAST: a {RUNNING, FAILED} tie must
      // record RUNNING in the trail before FAILED closes it — an
      // alphabetical tiebreak ('F' < 'R' < 'S') would close the trail
      // first for FAILED but not for SUCCEEDED, asymmetrically
      val batch = rows.toSeq.sortBy(e =>
        (e.ts.getTime, e.status == "SUCCEEDED" || e.status == "FAILED", e.status))
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
    * the input handler. Semantics mirror [[Correlate]]'s, tombstones
    * included: a terminal status completes the txn once (cancelling its
    * pending timer) and leaves a bounded-lifetime DONE tombstone, so a
    * re-delivered terminal or a late RUNNING re-stamped above the
    * watermark can neither duplicate the completion nor arm a spurious
    * timeout; a txn with no terminal within 20 s of event time emits
    * TIMEOUT (and keeps the same tombstone). Two timers per key at most:
    * the pending timeout and the tombstone expiry — per-key MULTI-timer
    * bookkeeping is exactly what the new API adds over fMGWS.
    * `nEvents` counts every event observed for the txn up to completion
    * (post-completion re-deliveries are suppressed, not counted). */
  class TimeoutProcessor
      extends StatefulProcessor[String, StatusEvent, HistoryResult] {

    @transient private var lastTs: ValueState[Long] = _   // pending txns
    @transient private var doneTs: ValueState[Long] = _   // tombstone
    @transient private var nSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastTs = getHandle.getValueState[Long]("lastTs", Encoders.scalaLong, TTLConfig.NONE)
      doneTs = getHandle.getValueState[Long]("doneTs", Encoders.scalaLong, TTLConfig.NONE)
      nSeen = getHandle.getValueState[Long]("nSeen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        txnId: String,
        rows: Iterator[StatusEvent],
        timerValues: TimerValues): Iterator[HistoryResult] = {
      if (doneTs.exists()) return Iterator.empty // completed: suppress all
      val batch = rows.toSeq.sortBy(_.ts.getTime)
      val untilTerminal = {
        val idx = batch.indexWhere(e =>
          e.status == "SUCCEEDED" || e.status == "FAILED")
        if (idx < 0) batch else batch.take(idx + 1)
      }
      val seen = (if (nSeen.exists()) nSeen.get() else 0L) + untilTerminal.size
      val terminal = untilTerminal.lastOption.filter(e =>
        e.status == "SUCCEEDED" || e.status == "FAILED")
      terminal match {
        case Some(e) =>
          if (lastTs.exists()) {
            getHandle.deleteTimer(lastTs.get() + Correlate.TimeoutMs)
            lastTs.clear()
          }
          nSeen.clear()
          // done tombstone, expiring on its own timer (bounded state);
          // the watermark may sit far ahead of the event time, so the
          // expiry must clear BOTH horizons or it would fire immediately
          // (Correlate's same guard)
          val doneAt = e.ts.getTime
          doneTs.update(doneAt)
          getHandle.registerTimer(math.max(doneAt + 2 * Correlate.TimeoutMs,
            timerValues.getCurrentWatermarkInMs() + Correlate.TimeoutMs))
          Iterator(HistoryResult(txnId, e.status, seen.toInt, e.status))
        case None =>
          // deadline only ever advances: an out-of-order row below the
          // prior max must not pull the timeout earlier
          val maxTs = (batch.map(_.ts.getTime) ++
            (if (lastTs.exists()) Seq(lastTs.get()) else Nil)).max
          if (lastTs.exists()) // re-arm: drop the stale timer
            getHandle.deleteTimer(lastTs.get() + Correlate.TimeoutMs)
          lastTs.update(maxTs)
          nSeen.update(seen)
          getHandle.registerTimer(maxTs + Correlate.TimeoutMs)
          Iterator.empty
      }
    }

    override def handleExpiredTimer(
        txnId: String,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[HistoryResult] = {
      if (doneTs.exists()) {
        // tombstone expiry. The timer may fire in a batch whose watermark
        // has already jumped far past the expiry (the arming batch saw an
        // older watermark) — clearing now would cut the suppression
        // horizon short, so roll the timer forward ONCE to a
        // watermark-relative expiry (fMGWS gets this for free: its
        // timeout callback reads the post-jump watermark). The roll is
        // bounded: a rolled timer's expiry exceeds doneTs + 2·timeout and
        // therefore clears on its next firing — no tombstone outlives two
        // timer rounds.
        val wm = timerValues.getCurrentWatermarkInMs()
        val expiry = expiredTimerInfo.getExpiryTimeInMs()
        if (expiry < wm && expiry <= doneTs.get() + 2 * Correlate.TimeoutMs) {
          getHandle.registerTimer(wm + Correlate.TimeoutMs)
        } else doneTs.clear()
        Iterator.empty
      } else if (lastTs.exists()) {
        // pending txn timed out; leave a tombstone like Correlate does so
        // a terminal re-stamped above the watermark stays suppressed
        val expiry = expiredTimerInfo.getExpiryTimeInMs()
        val seen = if (nSeen.exists()) nSeen.get() else 0L
        lastTs.clear(); nSeen.clear()
        doneTs.update(expiry)
        getHandle.registerTimer(math.max(expiry + 2 * Correlate.TimeoutMs,
          timerValues.getCurrentWatermarkInMs() + Correlate.TimeoutMs))
        Iterator(HistoryResult(txnId, "TIMEOUT", seen.toInt, "TIMEOUT"))
      } else Iterator.empty
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
