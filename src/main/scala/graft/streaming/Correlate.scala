package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed stream-to-state correlation with timeout eviction — the typed
  * Dataset re-expression of the reference's request/response correlator
  * (SURVEY.md §2.a R11–R14).
  *
  * Reference semantics (svcsample/svckinesis.js): an in-memory
  * `txnToResponseMap` holds pending HTTP responses keyed by txnId
  * (svckinesis.js:66); each Kinesis status record looks up its txn
  * (handleStatusEvent, :173-185), `RUNNING` passes through without
  * completing (:92-95), terminal statuses complete the response and delete
  * the key (:90-106), and a 20-second timeout abandons the txn, with late
  * results discarded (headersSentForTransaction, :80-88; timeout
  * `pollingsvc.js:133`).
  *
  * Spark design: `flatMapGroupsWithState` keyed by txnId IS that map —
  * distributed, fault-tolerant, exactly-once. Event-time timeout plus
  * watermark replaces the wall-clock HTTP timeout; state removal on
  * terminal status is the dedup-by-completion (late duplicates find no
  * state and emit nothing). At scale the state store shards by key across
  * executors — no single-process map, no transition buffer (R14) needed.
  *
  * No batch/SQL oracle exists for timeout semantics, so this operator is
  * pinned by StreamingSpec (MemoryStream, multi-batch, watermark-driven
  * timeouts) rather than a `queries` entry.
  */
object Correlate {

  /** A status record on the stream — `{txnId, status}` as built at
    * aprocess.js:150-153, plus the event-time we always carry. */
  case class StatusEvent(txnId: String, status: String, ts: Timestamp)

  /** A completed request: terminal status, or TIMEOUT after [[TimeoutMs]]
    * with no terminal event. */
  case class Completion(txnId: String, finalStatus: String)

  /** 20 s — the reference's end-to-end HTTP timeout (pollingsvc.js:133). */
  val TimeoutMs: Long = 20000L

  def correlate(events: Dataset[StatusEvent]): Dataset[Completion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.txnId)
      .flatMapGroupsWithState[Long, Completion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (txnId: String, evs: Iterator[StatusEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // R13: evict; a late terminal event will find no state and be
            // dropped (svckinesis.js:80-88 "headers already sent")
            state.remove()
            Iterator(Completion(txnId, "TIMEOUT"))
          } else {
            val batch = evs.toSeq
            val terminal = batch
              .filter(e => e.status == "SUCCEEDED" || e.status == "FAILED")
              .sortBy(_.ts.getTime)
              .headOption
            terminal match {
              case Some(e) =>
                // complete + delete key (svckinesis.js:105); duplicates in
                // the same batch collapse to the first terminal event
                if (state.exists) state.remove()
                Iterator(Completion(txnId, e.status))
              case None =>
                // RUNNING pass-through (svckinesis.js:92-95): keep waiting,
                // arm/refresh the 20 s timeout from the latest event time
                val maxTs = batch.map(_.ts.getTime).max
                state.update(maxTs)
                state.setTimeoutTimestamp(maxTs + TimeoutMs)
                Iterator.empty
            }
          }
      }
  }

  /** Convenience: run the correlator over a bounded typed stream and
    * collect completions (used by specs and ad-hoc runs). */
  def correlateBatchLike(s: SparkSession, events: Seq[StatusEvent]): Seq[Completion] = {
    import s.implicits._
    // batch path shares the terminal-dispatch semantics (no timeouts):
    events.toDS().groupByKey(_.txnId).flatMapGroups { (txn, evs) =>
      evs.toSeq.filter(e => e.status == "SUCCEEDED" || e.status == "FAILED")
        .sortBy(_.ts.getTime).headOption
        .map(e => Completion(txn, e.status)).iterator
    }.collect().toSeq
  }
}
