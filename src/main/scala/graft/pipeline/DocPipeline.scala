package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** The reference's document pipeline re-expressed Spark-first (SURVEY.md §2.a
  * R1–R9, §3.2).
  *
  * Reference semantics (d-smith/sfs3-kinesis): each Step Functions step reads
  * a JSON "process data" document from S3 by txn-id key
  * (`s3-for-process-data/aprocess.js:15-32`), asserts a field-existence
  * precondition (`aprocess.js:25-31,192-214`), appends one `step-<x>-output`
  * struct field (`aprocess.js:47-62`, mutation at :57), writes the document
  * back (`aprocess.js:34-45`), and on failure/success emits a
  * `{txnId, status}` event (`aprocess.js:148-163,182`). The terminal step
  * also fans out a downstream execution and records its ARN as a nested
  * struct (`aprocess.js:165-190`).
  *
  * Spark design: the document table is a DataFrame keyed by `txn_id`; each
  * step is a pure `DataFrame => DataFrame` that adds one nullable StructType
  * column guarded by the previous step's existence predicate — the
  * throw/retry path of the reference collapses into `when(gate, struct)
  * .otherwise(null)` because Spark batch reads are consistent snapshots
  * (SURVEY.md §4). The whole 6-step chain is narrow (zero shuffles, one
  * whole-stage-codegen span), so at 100 TB it runs embarrassingly parallel
  * over input partitions; the reference instead paid 13 serial S3
  * round-trips per document (SURVEY.md §6).
  */
object DocPipeline {

  /** Lift the events table into process-data documents: txn_id is the
    * flake-id analog (hex-formatted, mirroring `pollingsvc.js:26-27`),
    * payload fields come from the event row. */
  def documents(s: SparkSession, d: String): DataFrame =
    project(Tables.events(s, d))

  /** The document projection over (a subset of) events — split out so point
    * lookups can filter the SOURCE first (see [[q24PointLookup]]). */
  private def project(events: DataFrame): DataFrame =
    events.select(
      format_string("0x%x", col("event_id")).as("txn_id"),
      col("event_type"),
      col("value"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
    )

  // --- gates: field-existence / consistency predicates (R2/R3) ----------
  private def has(step: String): Column = col(s"step_${step}_output").isNotNull

  /** stepA (aprocess.js:64-83): no precondition (predicate `true`,
    * aprocess.js:193-195); result mirrors the shape at aprocess.js:68-74
    * (status + typed outs: string / boolean / long). */
  def stepA(df: DataFrame): DataFrame =
    df.withColumn("step_a_output", struct(
      lit("ok").as("status"),
      upper(col("event_type")).as("out1"),
      (col("value") > 0.5).as("out2"),
      floor(col("value") * 100).as("out3"),
    ))

  /** stepB (aprocess.js:85-101): requires step-a-output. */
  def stepB(df: DataFrame): DataFrame =
    df.withColumn("step_b_output", when(has("a"), struct(
      lit("ok").as("status"),
      concat_ws("-", col("step_a_output.out1"), col("step_a_output.out3")).as("combined"),
    )))

  /** stepC (aprocess.js:103-116): requires step-b-output; additionally
    * models a data precondition that can fail (the reference's
    * S3DataPreconditionError path, aprocess.js:6-12): docs whose `k` is
    * null or divisible by 7 stop here and take the FAILED notification
    * path (aprocess.js:113). */
  def stepC(df: DataFrame): DataFrame =
    df.withColumn("step_c_output",
      when(has("b") && col("k").isNotNull && col("k") % 7 =!= 0, struct(
        lit("ok").as("status"),
        (col("k") % 10).as("k_bucket"),
      )))

  /** stepD (aprocess.js:118-125): requires step-c-output; second failure
    * mode — extreme values stop here. */
  def stepD(df: DataFrame): DataFrame =
    df.withColumn("step_d_output", when(has("c") && col("value") < 0.95, struct(
      lit("ok").as("status"),
      (col("value") * 2.0).as("dval"),
    )))

  /** stepE (aprocess.js:127-135): requires step-d-output. */
  def stepE(df: DataFrame): DataFrame =
    df.withColumn("step_e_output", when(has("d"), struct(
      lit("ok").as("status"),
      substring(col("txn_id"), 3, 2).as("etag"),
    )))

  /** stepF, terminal (aprocess.js:165-190): requires step-e-output; fans
    * out the downstream machine (R9, aprocess.js:137-146) and records its
    * execution ARN as a nested struct (aprocess.js:177-179). */
  def stepF(df: DataFrame): DataFrame =
    df.withColumn("step_f_output", when(has("e"), struct(
      lit("ok").as("status"),
      struct(concat(lit("arn:local:exec:"), col("txn_id")).as("downstreamExecutionArn"))
        .as("downstream"),
    )))

  /** The full chain — plain function composition, exactly the Step Functions
    * state order (serverless.yml:68-129). */
  val pipeline: DataFrame => DataFrame =
    Seq[DataFrame => DataFrame](stepA, stepB, stepC, stepD, stepE, stepF)
      .reduceLeft(_ andThen _)

  /** Terminal status (R8): SUCCEEDED iff stepF ran (aprocess.js:182), else
    * FAILED with the first step whose gate failed (the reference emits
    * FAILED from each step's catch: aprocess.js:80,98,113,123,132,187). */
  def withStatus(df: DataFrame): DataFrame =
    df.withColumn("status", when(has("f"), "SUCCEEDED").otherwise("FAILED"))
      .withColumn("failed_at",
        when(has("f"), lit(null).cast("string"))
          .when(!has("c"), "step-c")
          .when(!has("d"), "step-d")
          .otherwise("step-?"))

  // Oracle-side twins of the step computations (DuckDB SQL). The gates
  // compose exactly like the `when` chain above.
  private val oracleDoc =
    """SELECT printf('0x%x', event_id) AS txn_id, event_type, value,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin
  private val gateC = "(k IS NOT NULL AND k % 7 <> 0)"
  private val gateD = s"($gateC AND value < 0.95)"

  /** q21: the fully enriched document table, flattened to scalar columns
    * (the struct enrichment itself is exercised by the implementation and
    * the ScalaTest spec; flattening keeps the DuckDB compare exact). */
  val q21DocPipeline: Q = Q(
    "q21_doc_pipeline",
    s"""WITH doc AS ($oracleDoc)
       |SELECT txn_id,
       |  UPPER(event_type) AS a_out1,
       |  value > 0.5 AS a_out2,
       |  CAST(FLOOR(value * 100) AS BIGINT) AS a_out3,
       |  CONCAT_WS('-', UPPER(event_type), CAST(FLOOR(value * 100) AS BIGINT)) AS b_combined,
       |  CASE WHEN $gateC THEN k % 10 END AS c_k_bucket,
       |  CASE WHEN $gateD THEN value * 2.0 END AS d_dval,
       |  CASE WHEN $gateD THEN SUBSTRING(txn_id, 3, 2) END AS e_etag,
       |  CASE WHEN $gateD THEN 'arn:local:exec:' || txn_id END AS f_downstream_arn,
       |  CASE WHEN $gateD THEN 'SUCCEEDED' ELSE 'FAILED' END AS status,
       |  CASE WHEN $gateD THEN NULL
       |       WHEN NOT $gateC THEN 'step-c'
       |       ELSE 'step-d' END AS failed_at
       |FROM doc
       |ORDER BY txn_id""".stripMargin,
  ) { (s, d) =>
    withStatus(pipeline(documents(s, d))).select(
      col("txn_id"),
      col("step_a_output.out1").as("a_out1"),
      col("step_a_output.out2").as("a_out2"),
      col("step_a_output.out3").as("a_out3"),
      col("step_b_output.combined").as("b_combined"),
      col("step_c_output.k_bucket").as("c_k_bucket"),
      col("step_d_output.dval").as("d_dval"),
      col("step_e_output.etag").as("e_etag"),
      col("step_f_output.downstream.downstreamExecutionArn").as("f_downstream_arn"),
      col("status"), col("failed_at"),
    ).orderBy(col("txn_id"))
  }

  /** q22: the status-event stream (R8) — the union of every step's FAILED
    * path and stepF's SUCCEEDED path, partition-keyed by txn_id exactly as
    * the reference sets `PartitionKey: key` (aprocess.js:157). Aggregated
    * per status×failure-site (the CloudWatch dashboard counts, R17 /
    * dashboard.yml:115-147). */
  val q22StatusEvents: Q = Q(
    "q22_status_events",
    s"""WITH doc AS ($oracleDoc)
       |SELECT CASE WHEN $gateD THEN 'SUCCEEDED' ELSE 'FAILED' END AS status,
       |  CASE WHEN $gateD THEN NULL
       |       WHEN NOT $gateC THEN 'step-c'
       |       ELSE 'step-d' END AS failed_at,
       |  COUNT(*) AS n_txns
       |FROM doc
       |GROUP BY 1, 2
       |ORDER BY status, failed_at""".stripMargin,
  ) { (s, d) =>
    withStatus(pipeline(documents(s, d)))
      .groupBy(col("status"), col("failed_at"))
      .agg(count(lit(1)).as("n_txns"))
      .orderBy(col("status"), col("failed_at"))
  }

  /** q23: request/response correlation (R11/R12) — join the status events
    * to the service's pending-request map (modeled as the subset of txns the
    * service started: user-facing event types). Unmatched events are dropped
    * (inner-join semantics, svckinesis.js:178-181); the dispatch CASE mirrors
    * sendResponseBasedOnState (svckinesis.js:90-106). */
  val q23Correlate: Q = Q(
    "q23_correlate",
    s"""WITH doc AS ($oracleDoc),
       |statuses AS (
       |  SELECT txn_id,
       |    CASE WHEN $gateD THEN 'SUCCEEDED' ELSE 'FAILED' END AS status
       |  FROM doc),
       |pending AS (SELECT txn_id FROM doc WHERE event_type IN ('signup','purchase'))
       |SELECT s.txn_id, s.status,
       |  CASE WHEN s.status = 'SUCCEEDED' THEN 'http_200' ELSE 'http_500' END AS response
       |FROM statuses s JOIN pending p ON s.txn_id = p.txn_id
       |ORDER BY s.txn_id""".stripMargin,
  ) { (s, d) =>
    val docs = withStatus(pipeline(documents(s, d)))
    val statuses = docs.select(col("txn_id"), col("status"))
    val pending = docs.filter(col("event_type").isin("signup", "purchase"))
      .select(col("txn_id").as("p_txn_id"))
    statuses.join(pending, col("txn_id") === col("p_txn_id"))
      .select(col("txn_id"), col("status"),
        when(col("status") === "SUCCEEDED", "http_200").otherwise("http_500")
          .as("response"))
      .orderBy(col("txn_id"))
  }

  /** q24: point lookup by txn-id key (R1) — the reference's S3 get-by-key
    * (aprocess.js:15-32). txn_id is hex(event_id), so the lookup inverts
    * the key DRIVER-side and filters the source column: the equality
    * predicate reaches the parquet scan as `event_id = 42` (PushedFilters
    * — PlanSpec pins this), skipping non-matching row groups via min/max
    * stats. A filter on the computed txn_id string could never push past
    * the format_string projection. */
  val q24PointLookup: Q = Q(
    "q24_point_lookup",
    s"""WITH doc AS ($oracleDoc)
       |SELECT txn_id, event_type, value, k FROM doc
       |WHERE txn_id = '0x2a'""".stripMargin,
  ) { (s, d) =>
    val key = java.lang.Long.decode("0x2a")
    project(Tables.events(s, d).filter(col("event_id") === key))
  }

  /** q78: R1 point lookup at UPSERT-TABLE scale — q24 pushes the key into
    * a parquet scan's row-group stats; this one goes further and prunes at
    * the table layout itself: the orders table is loaded into the bucketed
    * upsert store once (content-stamped dir, committed `_SUCCESS` gates
    * reuse across runs), then `readTableKeyed` hashes each requested key
    * to its bucket and opens ONLY those dirs — O(keys) I/O on a 100 TB
    * view. The oracle is the plain key filter on the source table, so any
    * round-trip or pruning defect breaks the hash match. */
  val q78KeyedLookup: Q = Q(
    "q78_keyed_lookup",
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey IN (7, 42, 777)
      |ORDER BY o_orderkey""".stripMargin,
  ) { (s, d) =>
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_q78_table_${graft.sources.GraftShards.contentStamp(d, "orders.parquet")}").toString
    if (!new java.io.File(path, "v1/_SUCCESS").exists())
      graft.sources.Sources.upsert(Tables.orders(s, d), Seq("o_orderkey"), path)
    graft.sources.Sources
      .readTableKeyed(s, path, Seq("o_orderkey"), Seq(Seq(7L), Seq(42L), Seq(777L)))
      .orderBy(col("o_orderkey"))
  }

  /** q100: incremental view maintenance over the upsert table's change-data
    * feed — the consumption half of the CDF story as a driver-checked
    * query. The base table receives two batches: v1 holds two-thirds of
    * `orders` with every `%7` key's total zeroed (bad early data), v2
    * delivers the late third plus the corrections. The materialized view
    * (revenue + order count per priority) is then brought to v2 WITHOUT
    * rescanning the table: `readChanges(v1, v2, preimages = true)` emits
    * Delta-CDF-style insert / update_preimage / update_postimage rows from
    * the CHANGED BUCKETS ONLY, and the view update is
    * `view ⊎ (post − pre)` — one aggregation over the delta stream.
    *
    * At 100 TB this is the difference between an O(table) nightly rebuild
    * and an O(changed-buckets) refresh per batch. Exactness: sums stay
    * DECIMAL(18,2) through both legs (associative), ONE final double cast;
    * the oracle is the straight aggregate over the source table, so any
    * defect in the CDF classification, the preimage values, or the merge
    * breaks the hash. */
  val q100IncrementalView: Q = Q(
    "q100_incremental_view",
    """SELECT o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin,
  ) { (s, d) =>
    import graft.sources.Sources
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val wide = org.apache.spark.sql.types.DecimalType(30, 2)
    val o = Tables.orders(s, d)
    val path = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_q100_table_${graft.sources.GraftShards.contentStamp(d, "orders.parquet")}").toString
    if (!new java.io.File(path, "v2/_SUCCESS").exists()) {
      val early = o.filter(col("o_orderkey") % 3 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, lit(0.0)).otherwise(col("o_totalprice")))
      val late = o.filter(col("o_orderkey") % 3 === 0 ||
        (col("o_orderkey") % 7 === 0 && col("o_orderkey") % 3 =!= 0))
      Sources.upsert(early, Seq("o_orderkey"), path)
      Sources.upsert(late, Seq("o_orderkey"), path)
    }
    def agg(df: DataFrame, sign: Column): DataFrame = df
      .groupBy(col("o_orderpriority"))
      .agg(sum(sign * col("o_totalprice").cast(dec)).cast(wide).as("rev"),
        sum(sign).cast("long").as("n"))
    val view1 = agg(Sources.readTableAt(s, path, 1), lit(1L))
    val changes = Sources.readChanges(s, path, 1L, 2L, Seq("o_orderkey"),
      preimages = true)
    val delta = agg(changes,
      when(col("_change") === "update_preimage", lit(-1L)).otherwise(lit(1L)))
    view1.unionByName(delta)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("rev")).as("revsum"), sum(col("n")).as("n_orders"))
      .select(col("o_orderpriority"), col("n_orders"),
        col("revsum").cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val all: Seq[Q] = Seq(q21DocPipeline, q22StatusEvents, q23Correlate,
    q24PointLookup, q78KeyedLookup, q100IncrementalView)
}
