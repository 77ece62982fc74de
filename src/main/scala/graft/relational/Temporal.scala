package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Temporal dimension modeling: the SCD type-2 build — turn a change
  * stream into validity-range history rows, the warehouse-side sibling of
  * the reference's per-document status timeline (SURVEY.md §2.a R8/R17:
  * status events ordered per key) and the batch complement of the LOCF /
  * as-of operators (q94, q80) that CONSUME such histories.
  */
object Temporal {

  /** q130: SCD2 history of each user's event-type "status": consecutive
    * same-status events collapse into one row (change detection — the
    * type-2 rule that only CHANGES version the dimension), each surviving
    * change opens a validity range closed by the next change
    * (`effective_to` = next change's ts; null = current). Deterministic
    * under same-timestamp bursts via the (ts, event_id) total order, the
    * same tie-break both engines.
    *
    * Scale shape: one user-keyed shuffle serves BOTH windows (lag for
    * change detection, lead for range close — identical partitioning, so
    * Catalyst plans a single exchange); no corpus-wide window, no driver
    * state. Exact oracle incl. the timestamps and the is_current flags. */
  val q130Scd2: Q = Q(
    "q130_scd2_history",
    """WITH c AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |ch AS (
      |  SELECT user_id, event_type, ts, event_id FROM c
      |  WHERE prev IS NULL OR prev <> event_type),
      |r AS (
      |  SELECT user_id, event_type AS status, ts AS effective_from,
      |    LEAD(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS effective_to
      |  FROM ch)
      |SELECT user_id, status, effective_from, effective_to,
      |  effective_to IS NULL AS is_current
      |FROM r ORDER BY user_id, effective_from""".stripMargin,
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("effective_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("status"),
        col("ts").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("effective_from"))
  }

  val all: Seq[Q] = Seq(q130Scd2)
}
