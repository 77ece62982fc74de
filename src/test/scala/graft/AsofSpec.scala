package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{Asof, AsofJoinExec, AsofJoinPlan}

/** Native as-of join (plans.Asof) vs the composable window formulation,
  * edge semantics, and the custom optimizer rule. */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def native(p: DataFrame, c: DataFrame): DataFrame =
    Asof.join(p, c, Seq("user_id" -> "user_id"), "ts" -> "c_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("c_ts"))

  private lazy val events = Tables.events(spark, sfDir)
  private lazy val purchases = events.filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"), col("ts"))
  private lazy val clicks = events.filter(col("event_type") === "click")
    .select(col("user_id"), col("ts").as("c_ts"))

  test("native as-of equals the union+carry-forward window formulation") {
    val got = native(purchases, clicks)
    // reference: tag both streams, carry last click ts forward per user
    val tagged = events.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "click", col("ts")).as("c_src"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), when(col("event_type") === "click", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = tagged
      .withColumn("c_ts", last(col("c_src"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("c_ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("c_ts"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("edge semantics: inclusive match, no-match drop, per-key isolation") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val p = Seq((1L, 10L, ts(100)), (2L, 10L, ts(50)), (3L, 20L, ts(100)),
      (4L, 30L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val c = Seq((10L, ts(100)), (10L, ts(60)), (20L, ts(999)))
      .toDF("user_id", "c_ts")
    val got = native(p, c).as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSet
    assert(got == Set(
      (1L, 10L, ts(100), ts(100)), // inclusive: c_ts == ts wins over ts(60)
      // event 2: both clicks are later -> dropped (inner)
      // event 3: user 20's only click is later -> dropped
      // event 4: user 30 has no clicks -> dropped
    ))
  }

  test("empty sides: no right rows -> empty result; no left rows -> empty result") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val p = Seq((1L, 10L, ts(100))).toDF("event_id", "user_id", "ts")
    val c = Seq((10L, ts(50))).toDF("user_id", "c_ts")
    assert(native(p, c.filter(col("user_id") < 0)).count() == 0)
    assert(native(p.filter(col("user_id") < 0), c).count() == 0)
    assert(native(p, c).count() == 1)
  }

  test("multi-key as-of join isolates on every key column") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val p = Seq((1L, 10L, "a", ts(100)), (2L, 10L, "b", ts(100)))
      .toDF("event_id", "user_id", "seg", "ts")
    val c = Seq((10L, "a", ts(90)), (10L, "b", ts(95)), (10L, "a", ts(99)))
      .toDF("user_id", "seg", "c_ts")
    val got = graft.plans.Asof.join(p, c,
      Seq("user_id" -> "user_id", "seg" -> "seg"), "ts" -> "c_ts")
      .select(col("event_id"), col("c_ts"))
      .as[(Long, java.sql.Timestamp)].collect().toSet
    assert(got == Set((1L, ts(99)), (2L, ts(95))))
  }

  test("physical plan is the streaming merge exec with sorted co-partitioned inputs") {
    val df = native(purchases, clicks)
    val execs = df.queryExecution.sparkPlan.collect { case e: AsofJoinExec => e }
    assert(execs.size == 1)
    // EnsureRequirements plants the (keys, ts) sorts; unwrap AQE to see
    // the final physical plan
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // QueryStageExec nodes are leaves — recurse into their plans
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan)(
        pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, Unit]): Int = {
      val here = p.collect(pf).size
      val stages = p.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
      }
      here + stages.map(collectAll(_)(pf)).sum
    }
    val sorts = collectAll(finalPlan) {
      case _: org.apache.spark.sql.execution.SortExec => ()
    }
    assert(sorts >= 2, s"expected local (keys, ts) sorts on both children:\n$finalPlan")
  }

  test("key-equality filters push into BOTH children (custom rule)") {
    val filtered = native(purchases, clicks).filter(col("user_id") === 7L)
    val optimized = filtered.queryExecution.optimizedPlan
    val j = optimized.collect { case a: AsofJoinPlan => a }.head
    def hasKeyFilter(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.references.map(_.name).toSet.contains("user_id") => f
      }.nonEmpty
    assert(hasKeyFilter(j.left), "filter not pushed to left child")
    assert(hasKeyFilter(j.right), "filter not pushed to right child")
    // and the result matches post-filtering the unpushed join
    val ref = native(purchases, clicks).where(col("user_id") === 7L)
    assert(filtered.exceptAll(ref).isEmpty && ref.exceptAll(filtered).isEmpty)
  }
}
