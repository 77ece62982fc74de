package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.pipeline.DocPipeline

/** Pins the document-pipeline semantics from the reference
  * (aprocess.js:47-62 doStep, :192-214 predicates): monotone field growth,
  * gate-failure short-circuit, terminal status dispatch. */
class DocPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: (String, String, Double, java.lang.Long)*) =
    rows.toSeq.toDF("txn_id", "event_type", "value", "k")

  private lazy val out = DocPipeline.withStatus(DocPipeline.pipeline(mkDocs(
    ("t1", "click", 0.10, 3L),    // clean run → SUCCEEDED
    ("t2", "error", 0.20, 14L),   // k % 7 == 0 → fails step-c
    ("t3", "view", 0.99, 5L),     // value ≥ 0.95 → fails step-d
    ("t4", "signup", 0.40, null), // null k → fails step-c
  ))).collect().map(r => r.getString(r.fieldIndex("txn_id")) -> r).toMap

  test("clean document runs all six steps and succeeds") {
    val r = out("t1")
    assert(r.getAs[String]("status") == "SUCCEEDED")
    assert(r.getAs[String]("failed_at") == null)
    val f = r.getAs[Row]("step_f_output")
    assert(f.getAs[Row]("downstream").getAs[String]("downstreamExecutionArn")
      == "arn:local:exec:t1")
  }

  test("precondition failure at step-c stops the chain with FAILED") {
    for (t <- Seq("t2", "t4")) {
      val r = out(t)
      assert(r.getAs[String]("status") == "FAILED", t)
      assert(r.getAs[String]("failed_at") == "step-c", t)
      assert(r.getAs[Row]("step_b_output") != null, t) // ran up to b
      assert(r.getAs[Row]("step_c_output") == null, t)
      assert(r.getAs[Row]("step_f_output") == null, t)
    }
  }

  test("step-d value gate fails extreme values") {
    val r = out("t3")
    assert(r.getAs[String]("status") == "FAILED")
    assert(r.getAs[String]("failed_at") == "step-d")
    assert(r.getAs[Row]("step_c_output") != null)
    assert(r.getAs[Row]("step_d_output") == null)
  }

  test("monotonicity invariant: step X present implies all earlier present") {
    // the invariant encoded by the reference's predicates (aprocess.js:196-214)
    val df = DocPipeline.withStatus(DocPipeline.pipeline(
      DocPipeline.documents(spark, sfDir)))
    val steps = Seq("a", "b", "c", "d", "e", "f").map(x => s"step_${x}_output")
    val violations = steps.sliding(2).map { case Seq(prev, next) =>
      df.filter(col(next).isNotNull && col(prev).isNull).count()
    }.sum
    assert(violations == 0)
  }

  test("step A result mirrors the reference's typed output shape") {
    val r = out("t1").getAs[Row]("step_a_output")
    assert(r.getAs[String]("status") == "ok")
    assert(r.getAs[String]("out1") == "CLICK")   // string
    assert(r.getAs[Boolean]("out2") == false)    // boolean (0.10 < 0.5)
    assert(r.getAs[Long]("out3") == 10L)         // long
  }
}
