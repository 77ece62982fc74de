package graft

import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, Literal}
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Pins STREAMING plan shapes the way PlanSpec pins batch ones, over the
  * executed plans captured from each query's last micro-batch
  * (Streaming.lastPlans via the PlanBridge shim):
  *
  *  - q39's sentinel drop must live on the BATCH read-back, never inside
  *    the streaming plan: a `p_id >= 0` filter there is pushed below the
  *    `EventTimeWatermark` operator and un-advances the watermark, so the
  *    outer join's null-matches never flush (measured: 3 rows short).
  *  - no ScalaUDF in any q30–q39 streaming plan: every expression stays
  *    codegen-friendly native.
  *
  * Both detectors carry planted-positive self-checks — the round-3 lesson
  * (a vacuous broadcast-hint detector hid four real hints). */
class StreamingPlanSpec extends SparkSpec {

  /** Id-guard comparisons (`id >= literal`) sitting in filters BELOW any
    * EventTimeWatermark node — exactly the shape of a sentinel drop that
    * got pushed under the watermark. Plain `event_type = …` dispatch
    * filters and isnotnull pushdowns below the watermark are legitimate
    * and do not match. */
  private def idGuardsBelowWatermark(plan: SparkPlan): Seq[String] =
    plan.collect {
      case w if w.nodeName.contains("EventTimeWatermark") => w
    }.flatMap { w =>
      w.children.flatMap(_.collect { case f: FilterExec => f })
    }.flatMap { f =>
      f.condition.collect {
        // the guarded column may be a bare attribute OR a pushed-down
        // struct-field extraction (from_json(data).event_id after the
        // filter sinks below the parse projection)
        case GreaterThanOrEqual(left, Literal(v, _))
            if "\\b(p_id|c_id|event_id|user_id)\\b".r
              .findFirstIn(left.toString).isDefined =>
          s"${"\\b(p_id|c_id|event_id|user_id)\\b".r.findFirstIn(left.toString).get} >= $v"
      }
    }

  private def scalaUdfs(plan: SparkPlan): Seq[String] =
    plan.collect { case n => n }.flatMap(_.expressions)
      .flatMap(_.collect { case e if e.nodeName == "ScalaUDF" => e.toString })

  test("q39's sentinel drop stays out of the streaming plan (above the watermark)") {
    Streaming.q39StreamLeftOuter.fn(spark, sfDir).count()
    val plan = Streaming.lastPlans.get("q39_sink")
    assert(plan.isDefined, "q39's streaming plan was not captured")
    assert(plan.get.collect {
      case w if w.nodeName.contains("EventTimeWatermark") => w
    }.size == 2, s"expected both sides watermarked:\n${plan.get}")
    val guards = idGuardsBelowWatermark(plan.get)
    assert(guards.isEmpty,
      s"sentinel-drop filter pushed below the watermark: $guards\n${plan.get}")
  }

  test("planted positive: an in-stream sentinel filter IS detected below the watermark") {
    // the buggy variant — the drop applied inside the streaming plan; the
    // detector must fire or the test above proves nothing
    val shardDir =
      graft.sources.GraftShards.ensureShardedEventsWithSentinels(spark, sfDir)
    val planted = spark.readStream.format("graft-shards")
      .option("startingPosition", "TRIM_HORIZON")
      .load(shardDir)
      .select(from_json(col("data"), Streaming.eventsRawSchema).as("e"))
      .select(col("e.*"))
      .withColumn("ts", timestamp_micros(col("ts")))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 day")
      // THE trap, verbatim: a drop applied above the watermark that the
      // optimizer pushes below it
      .filter(col("p_id") >= 0)
      .groupBy(window(col("p_ts"), "1 day")).count()
    Streaming.runToTable(spark, planted, "q39_planted_sink", "complete")
    val plan = Streaming.lastPlans("q39_planted_sink")
    val guards = idGuardsBelowWatermark(plan)
    // after pushdown the guard reads the pre-alias column (event_id)
    assert(guards.nonEmpty,
      s"detector is vacuous — planted in-stream sentinel filter not found:\n$plan")
  }

  test("no ScalaUDF in any q30–q39 streaming plan") {
    // q39 (and anything else already run) reuses its captured plan; run
    // the rest so every streaming query's plan is present
    Streaming.all.foreach { q =>
      val sink = q.name.replaceFirst("_.*$", "_sink")
        .replaceFirst("^q(\\d+)_sink$", "q$1_sink")
      if (!Streaming.lastPlans.contains(sink)) q.fn(spark, sfDir).count()
    }
    // assert over EXACTLY the q30–q39 (+q57 sink) plans — lastPlans is a
    // JVM-global map other specs also write to (planted UDFs included)
    val scope = (30 to 39).map(i => s"q${i}_sink") :+ "q57_sink"
    val plans = Streaming.lastPlans.toMap
    scope.foreach(n =>
      assert(plans.contains(n), s"missing streaming plan for $n: ${plans.keySet}"))
    for (name <- scope) {
      val udfs = scalaUdfs(plans(name))
      assert(udfs.isEmpty, s"$name has ScalaUDF in its streaming plan: $udfs")
    }
  }

  test("planted positive: a ScalaUDF in a streaming plan IS detected") {
    val toUpper = udf((s: String) => if (s == null) null else s.toUpperCase)
    val shardDir = graft.sources.GraftShards.ensureShardedEvents(spark, sfDir)
    val planted = spark.readStream.format("graft-shards")
      .option("startingPosition", "TRIM_HORIZON")
      .load(shardDir)
      .select(toUpper(col("shard")).as("s")).groupBy(col("s")).count()
    Streaming.runToTable(spark, planted, "udf_planted_sink", "complete")
    val udfs = scalaUdfs(Streaming.lastPlans("udf_planted_sink"))
    Streaming.lastPlans.remove("udf_planted_sink")
    assert(udfs.nonEmpty, "detector is vacuous — planted ScalaUDF not found")
  }
}
