package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.Tables.{moneySum, moneySumSql}

/** Second relational wave (SURVEY.md §2.b rows not covered by Relational):
  * as-of join, GROUPING SETS, pivot, lateral explode with ordinality, full
  * outer join, range (interval) join, scalar + correlated subqueries,
  * statistical aggregates, exact percentiles, and ordered string
  * aggregation.
  */
object Relational2 {

  /** q80: AS-OF join — for each purchase event, the user's most recent
    * prior-or-equal click. Spark has no asof operator, so this uses the
    * NATIVE one from graft.plans (LogicalPlan + Rule + Strategy +
    * SparkPlan): one hash-shuffle per side on user_id, local spillable
    * (key, ts) sorts, then a single streaming merge pass — no
    * range-explosion (a naive theta join is O(clicks×purchases) per user)
    * and no whole-union window sort (the composable fallback, kept as the
    * reference formulation in AsofSpec). Oracle: DuckDB's ASOF JOIN. */
  val q80AsofJoin: Q = Q(
    "q80_asof_join",
    """SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin,
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    graft.plans.Asof.join(p, c, Seq("user_id" -> "user_id"), "ts" -> "click_ts")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** q81: explicit GROUPING SETS (beyond rollup/cube): totals by
    * (status, priority), by status alone, and grand total — with
    * GROUPING() flags disambiguating real NULLs from subtotal rows. */
  val q81GroupingSets: Q = Q(
    "q81_grouping_sets",
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       |  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       |  GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS grouping_level,
       |  COUNT(*) AS n_orders,
       |  ${moneySumSql("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
       |ORDER BY grouping_level, o_orderstatus, o_orderpriority""".stripMargin,
  ) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
         |  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
         |  CAST(GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS BIGINT)
         |    AS grouping_level,
         |  COUNT(*) AS n_orders,
         |  ${moneySumSql("o_totalprice")} AS total_price
         |FROM orders_v
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
         |ORDER BY grouping_level, o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** q82: pivot — event counts per user bucket × event type, value columns
    * named by the pivoted key (oracle: conditional aggregation). */
  val q82Pivot: Q = Q(
    "q82_pivot",
    """SELECT user_id % 10 AS user_bucket,
      |  COUNT(*) FILTER (event_type = 'click')    AS click,
      |  COUNT(*) FILTER (event_type = 'error')    AS error,
      |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (event_type = 'signup')   AS signup,
      |  COUNT(*) FILTER (event_type = 'view')     AS view
      |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_bucket"))
  }

  /** q83: lateral view / posexplode with ordinality — one row per token
    * with its position, for the first part names (bounded; generators at
    * scale are sized by the filter BEFORE exploding). */
  val q83Posexplode: Q = Q(
    "q83_posexplode",
    """SELECT p_partkey,
      |  generate_subscripts(string_split(p_name, ' '), 1) - 1 AS pos,
      |  unnest(string_split(p_name, ' ')) AS tok
      |FROM part WHERE p_partkey < 100
      |ORDER BY p_partkey, pos""".stripMargin,
  ) { (s, d) =>
    Tables.part(s, d).filter(col("p_partkey") < 100)
      .select(col("p_partkey"),
        posexplode(split(col("p_name"), " ")).as(Seq("pos", "tok")))
      .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("tok"))
      .orderBy(col("p_partkey"), col("pos"))
  }

  /** q84: FULL OUTER join — customer vs supplier account balance per
    * nation; nations present on only one side survive with NULL-coalesced
    * totals. */
  val q84FullOuter: Q = Q(
    "q84_full_outer",
    s"""WITH c AS (SELECT c_nationkey AS nk, ${moneySumSql("c_acctbal")} AS cust_bal,
       |    COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
       |s AS (SELECT s_nationkey AS nk, ${moneySumSql("s_acctbal")} AS supp_bal,
       |    COUNT(*) AS n_supp FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
       |SELECT COALESCE(c.nk, s.nk) AS nationkey,
       |  COALESCE(cust_bal, 0.0) AS cust_bal, COALESCE(n_cust, 0) AS n_cust,
       |  COALESCE(supp_bal, 0.0) AS supp_bal, COALESCE(n_supp, 0) AS n_supp
       |FROM c FULL OUTER JOIN s ON c.nk = s.nk
       |ORDER BY nationkey""".stripMargin,
  ) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("cnk"))
      .agg(moneySum(col("c_acctbal")).as("cust_bal"), count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("snk"))
      .agg(moneySum(col("s_acctbal")).as("supp_bal"), count(lit(1)).as("n_supp"))
    c.join(sup, col("cnk") === col("snk"), "full_outer")
      .select(
        coalesce(col("cnk"), col("snk")).cast("int").as("nationkey"),
        coalesce(col("cust_bal"), lit(0.0)).as("cust_bal"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("supp_bal"), lit(0.0)).as("supp_bal"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** q85: range (interval) join — events bucketed into value bands defined
    * by a small ranges table (derived from nation keys). The band table is
    * broadcast; the range predicate runs as a broadcast nested-loop join —
    * the right plan when one side is tiny. */
  val q85RangeJoin: Q = Q(
    "q85_range_join",
    """WITH bands AS (
      |  SELECT n_nationkey AS band_id,
      |    n_nationkey * 20.0 AS lo, (n_nationkey + 1) * 20.0 AS hi
      |  FROM nation)
      |SELECT band_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN bands ON value >= lo AND value < hi
      |GROUP BY band_id ORDER BY band_id""".stripMargin,
  ) { (s, d) =>
    val bands = Tables.nation(s, d)
      .select(col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 20.0).as("lo"),
        ((col("n_nationkey") + 1) * 20.0).as("hi"))
    Tables.events(s, d)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("total_value"))
      .select(col("band_id").cast("int").as("band_id"), col("n_events"), col("total_value"))
      .orderBy(col("band_id"))
  }

  /** q86: scalar + correlated subqueries — customers whose balance exceeds
    * their nation's average (correlated agg subquery decorrelated by
    * Catalyst into a join). */
  val q86Subqueries: Q = Q(
    "q86_subqueries",
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c1
      |WHERE c_acctbal > (SELECT AVG(c_acctbal) + 4000 FROM customer c2
      |                   WHERE c2.c_nationkey = c1.c_nationkey)
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer_v c1
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) + 4000 FROM customer_v c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q87: statistical aggregates — correlation, sample stddev/variance,
    * covariance of price vs quantity per return flag (rounded to absorb
    * accumulation-order ulps). */
  val q87Stats: Q = Q(
    "q87_stats",
    """SELECT l_returnflag,
      |  ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
      |  ROUND(STDDEV_SAMP(l_quantity), 6) AS qty_stddev,
      |  ROUND(VAR_SAMP(l_discount), 6) AS disc_var,
      |  ROUND(COVAR_SAMP(l_quantity, l_tax), 6) AS qty_tax_covar
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin,
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(stddev_samp(col("l_quantity")), 6).as("qty_stddev"),
        round(var_samp(col("l_discount")), 6).as("disc_var"),
        round(covar_samp(col("l_quantity"), col("l_tax")), 6).as("qty_tax_covar"))
      .orderBy(col("l_returnflag"))
  }

  /** q88: exact percentiles (linear interpolation) of order totals per
    * priority — Spark `percentile` ≡ DuckDB `quantile_cont`. */
  val q88Percentiles: Q = Q(
    "q88_percentiles",
    """SELECT o_orderpriority,
      |  ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      |  ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin,
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
        round(percentile(col("o_totalprice"), lit(0.50)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
        round(percentile(col("o_totalprice"), lit(0.95)), 4).as("p95"))
      .orderBy(col("o_orderpriority"))
  }

  /** q89: ordered string aggregation (collect + sort inside the group —
    * deterministic regardless of partial-agg merge order). */
  val q89StringAgg: Q = Q(
    "q89_string_agg",
    """SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |  COUNT(*) AS n_customers
      |FROM customer GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin,
  ) { (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        concat_ws(",", sort_array(collect_set(col("c_mktsegment")))).as("segments"),
        count(lit(1)).as("n_customers"))
      .select(col("c_nationkey").cast("int").as("c_nationkey"), col("segments"),
        col("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  /** q90: stratified sampling — per-stratum rates (downsample the dominant
    * classes, keep all of the rare one), the class-rebalancing operator of
    * training-data pipelines. Assignment is md5-of-key bucketed (the q27
    * discipline): stable across runs, engines, partitionings, and retries
    * — never `rand()`. The per-stratum rate arrives via a 3-row broadcast
    * join, so rates can live in config/catalog tables at scale; the pass
    * itself stays narrow (no shuffle of the fact table). */
  val q90StratifiedSample: Q = Q(
    "q90_stratified_sample",
    """WITH rates AS (
      |  SELECT * FROM (VALUES ('O', 100), ('F', 500), ('P', 1000))
      |    AS t(status, rate_pm)),
      |h AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |    CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INTEGER)
      |      % 1000 AS bucket
      |  FROM orders)
      |SELECT h.o_orderkey, h.o_orderstatus, h.o_totalprice
      |FROM h JOIN rates r ON h.o_orderstatus = r.status
      |WHERE h.bucket < r.rate_pm
      |ORDER BY h.o_orderkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val rates = Seq(("O", 100), ("F", 500), ("P", 1000))
      .toDF("status", "rate_pm")
    val bucket = (conv(substring(md5($"o_orderkey".cast("string")), 1, 4), 16, 10)
      .cast("long") % 1000).cast("int")
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
        bucket.as("bucket"))
      .join(broadcast(rates), $"o_orderstatus" === $"status")
      .filter($"bucket" < $"rate_pm")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** q91: approximate percentiles — the sketch form of q88 for the
    * 100 TB path, where exact `percentile` needs a full sort per group
    * while `approx_percentile` (Greenwald-Khanna) merges bounded-size
    * summaries in one partial+final aggregation pass. Sketch internals are
    * engine-specific → rows-only driver check; ApproxSpec pins the
    * rank-error guarantee against the exact q88 values. */
  val q91ApproxPercentiles: Q = Q.rowsOnly("q91_approx_percentiles") { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(approx_percentile(col("o_totalprice"), lit(0.5), lit(1000)), 4).as("p50_approx"),
        round(approx_percentile(col("o_totalprice"), lit(0.95), lit(1000)), 4).as("p95_approx"))
      .orderBy(col("o_orderpriority"))
  }

  /** q92: sequence packing (concat-and-chunk) — assign every document its
    * training-chunk id and offset under a fixed token budget, the layout
    * step before writing packed training shards. The global running token
    * count is computed as a DISTRIBUTED PREFIX SUM: per-bucket window
    * cumsums run in parallel over contiguous doc_id ranges, the ~B bucket
    * totals get their own tiny prefix pass, and a broadcast join adds the
    * bucket prefix back — no global single-partition window sort (what a
    * naive `Window.orderBy(doc_id)` would execute as; at 100 TB that one
    * task IS the job). Oracle: the naive global window, which DuckDB can
    * afford at test scale. */
  val q92SequencePacking: Q = Q(
    "q92_sequence_packing",
    """WITH t AS (
      |  SELECT doc_id, LEN(string_split_regex(text, '\s+')) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cum
      |  FROM t)
      |SELECT doc_id, n_tokens,
      |  (cum - n_tokens) // 2048 AS pack_id,
      |  (cum - n_tokens) % 2048 AS pack_offset
      |FROM c ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val budget = 2048L
    val t = Tables.documents(s, d)
      .select($"doc_id",
        size(split($"text", "\\s+")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr("doc_id div 1000"))
    val localW = Window.partitionBy($"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = t.withColumn("local_cum", sum($"n_tokens").over(localW))
    // bucket prefix table: one row per contiguous doc_id range — tiny, so
    // its global-ordered window is a deliberate single small task
    val prefixW = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = t.groupBy($"bucket").agg(sum($"n_tokens").as("btotal"))
      .withColumn("prefix", coalesce(sum($"btotal").over(prefixW), lit(0L)))
      .select($"bucket", $"prefix")
    // no hardcoded broadcast: the prefix table is ~corpus/1000 rows — small
    // here, but SF-scaled, so AQE must own the strategy (CLAUDE.md rule)
    local.join(prefixes, "bucket")
      .withColumn("start", $"prefix" + $"local_cum" - $"n_tokens")
      .select($"doc_id", $"n_tokens",
        expr(s"start div $budget").as("pack_id"),
        ($"start" % budget).as("pack_offset"))
      .orderBy($"doc_id")
  }

  /** q93: value-based RANGE window frame — trailing 6-hour per-user sum
    * and count, the sliding-by-TIME (not by-rows) aggregate the ROWS
    * frames elsewhere (q12/q26) can't express. Ordering is exact integer
    * MICROSECONDS on both engines (`unix_micros` ≡ `epoch_us`) — DuckDB's
    * `epoch()` returns fractional double seconds while a Spark
    * timestamp→long cast truncates, so seconds-based frames would
    * silently disagree on sub-second data. One shuffle on user_id serves
    * both window functions. */
  val q93RangeFrame: Q = Q(
    "q93_range_frame",
    """WITH t AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events)
      |SELECT event_id, user_id,
      |  CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY us
      |    RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS v6h,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY us
      |    RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW) AS n6h
      |FROM t ORDER BY event_id""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-21600000000L, 0L)
    Tables.events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
        $"value".cast("decimal(18,2)").as("v"))
      .select($"event_id", $"user_id",
        sum($"v").over(w).cast("double").as("v6h"),
        count(lit(1)).over(w).as("n6h"))
      .orderBy($"event_id")
  }

  /** q94: LOCF gap-fill (last observation carried forward) — impute
    * missing sensor/metric values from the same key's most recent
    * non-null reading via `last(..., ignoreNulls)` over a running ROWS
    * frame. Nulls are modeled in-query (readings below 0.2 dropped); a
    * key's LEADING nulls have nothing to carry forward and stay null in
    * both engines. The oracle window orders by `epoch_us(ts)` — DuckDB
    * sees the file's full NANOsecond timestamps while Spark reads
    * microsecond-truncated ones (Tables.events), so ordering raw ts could
    * pick a different predecessor for events tied at the microsecond (the
    * q93 lesson). Narrow after the one user_id shuffle. */
  val q94GapFill: Q = Q(
    "q94_gap_fill",
    """WITH t AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN value < 0.2 THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_id, user_id, v,
      |  LAST_VALUE(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ROWS UNBOUNDED PRECEDING) AS v_filled
      |FROM t ORDER BY event_id""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select($"event_id", $"user_id", $"ts",
        when($"value" < 0.2, lit(null)).otherwise($"value").as("v"))
      .select($"event_id", $"user_id", $"v",
        last($"v", ignoreNulls = true).over(w).as("v_filled"))
      .orderBy($"event_id")
  }

  /** q95: table profiling — per-column row/null/distinct counts and
    * min/max in ONE pass over the table (the data-quality report a
    * pipeline runs before training). All 4 columns' metrics are computed
    * in a single aggregate (multiple exact DISTINCTs — Spark plans one
    * scan with an Expand; the at-scale variant swaps in
    * `approx_count_distinct` to drop the Expand, same query shape), then
    * the 1-row result unpivots to a (column, metric…) row per column —
    * the oracle's UNION ALL of per-column scans reads the table 4 times
    * for the same answer. Numerics format through DECIMAL(18,2) so both
    * engines render identical strings. */
  val q95Profile: Q = Q(
    "q95_profile",
    """SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
      |  COUNT(*) - COUNT(o_custkey) AS n_null,
      |  COUNT(DISTINCT o_custkey) AS n_distinct,
      |  CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
      |  CAST(MAX(o_custkey) AS VARCHAR) AS max_v
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
      |  COUNT(DISTINCT o_orderpriority),
      |  MIN(o_orderpriority), MAX(o_orderpriority)
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
      |  COUNT(DISTINCT o_orderstatus),
      |  MIN(o_orderstatus), MAX(o_orderstatus)
      |FROM orders
      |UNION ALL
      |SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
      |  COUNT(DISTINCT o_totalprice),
      |  CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
      |  CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
      |FROM orders
      |ORDER BY col_name""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    def metrics(c: String, minMax: Column => Column) = Seq(
      count(lit(1)).as(s"${c}__n"),
      (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct"),
      min(minMax(col(c))).cast("string").as(s"${c}__min"),
      max(minMax(col(c))).cast("string").as(s"${c}__max"))
    val cols = Seq[(String, Column => Column)](
      "o_custkey" -> identity,
      "o_orderpriority" -> identity,
      "o_orderstatus" -> identity,
      "o_totalprice" -> (_.cast("decimal(18,2)")))
    val aggs = cols.flatMap { case (c, f) => metrics(c, f) }
    val onePass = Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
    onePass.select(explode(array(cols.map { case (c, _) =>
      struct(lit(c).as("col_name"),
        col(s"${c}__n").as("n_rows"), col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_v"), col(s"${c}__max").as("max_v"))
    }: _*)).as("m"))
      .select($"m.col_name", $"m.n_rows", $"m.n_null", $"m.n_distinct",
        $"m.min_v", $"m.max_v")
      .orderBy($"col_name")
  }

  /** q49: heavy hitters by count-min-sketch prefilter — EXACT result via
    * the q46 overadmit-only pattern: the sketch can only over-count (CM
    * guarantee: estimate >= true count), so filtering rows to keys whose
    * ESTIMATE clears the threshold admits a superset of the true heavy
    * hitters, and the exact groupBy that follows touches only those rows.
    * At 100 TB this replaces a full-cardinality shuffle (billions of
    * distinct keys, most singletons) with a fixed-size sketch aggregate
    * (map-side mergeable array) + a shuffle of ONLY the hot keys' rows.
    *
    * TESTDATA is uniform, so the power-law key is synthesized from
    * md5(event_id) with INTEGER-ONLY math (exact cross-engine — no
    * pow/floor boundary risk): 25% of rows draw a zipf-ish head
    * (`65536 div (h div 4 + 1)` — key 1 gets ~half of them), 75% a
    * near-unique tail, giving both hot keys and a large distinct count.
    * Heavy hitter = key holding >= 0.5% of all events (count*200 >= N,
    * integer compare). Sketch: Spark's native `count_min_sketch`
    * aggregate, probed by [[graft.functions.CmEstimate]] via scalar
    * subquery — codegen'd, no ScalaUDF. */
  val q49HeavyHitters: Q = Q(
    "q49_heavy_hitters",
    """WITH k AS (
      |  SELECT CASE WHEN h16 % 4 = 0 THEN 65536 // (h16 // 4 + 1)
      |              ELSE 100000 + (tail % 500000) END AS key
      |  FROM (SELECT
      |      CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4)) AS BIGINT) AS h16,
      |      CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 5, 8)) AS BIGINT) AS tail
      |    FROM events))
      |SELECT key, COUNT(*) AS n_events FROM k
      |GROUP BY key
      |HAVING COUNT(*) * 200 >= (SELECT COUNT(*) FROM events)
      |ORDER BY key""".stripMargin,
  ) { (s, d) =>
    graft.functions.ArrayExprs.register(s)
    import s.implicits._
    val keyed = Tables.events(s, d)
      .select(md5($"event_id".cast("string")).as("h"))
      .select(
        conv(substring($"h", 1, 4), 16, 10).cast("long").as("h16"),
        conv(substring($"h", 5, 8), 16, 10).cast("long").as("tail"))
      .select(when($"h16" % 4 === 0, expr("65536 div (h16 div 4 + 1)"))
        .otherwise(lit(100000L) + $"tail" % 500000L).as("key"))
    val total = Tables.events(s, d).count() // one footer-answered scalar
    // sketch sized for ~0.1% of N per-key error — far under the 0.5%
    // threshold, so overadmission stays a small candidate set
    keyed.agg(expr("count_min_sketch(key, 0.001d, 0.99d, 42)").as("cm"))
      .createOrReplaceTempView("q49_cm")
    keyed
      .filter(expr("graft_cm_estimate((SELECT cm FROM q49_cm), key)") * 200 >= total)
      .groupBy($"key")
      .agg(count(lit(1)).as("n_events"))
      .filter($"n_events" * 200 >= total)
      .orderBy($"key")
  }

  /** q56: mergeable distinct-count rollup — per-day HLL sketches of the
    * user population, UNIONED upward instead of rescanned. This is the
    * sketch-table architecture behind every large-scale "daily/weekly/
    * monthly uniques" dashboard: at 100 TB you materialize one tiny
    * sketch per (day, dimension) ONCE, and every coarser rollup is a
    * cheap union of sketches — no second pass over the raw events, and
    * the union is order/partitioning-independent (datasketches HLL is
    * deterministic, no RNG), so the result is stable across cluster
    * layouts. Spark ships the full surface natively: `hll_sketch_agg`,
    * `hll_union_agg`, `hll_sketch_estimate`.
    *
    * Output: per-day estimated uniques plus an all-days row (day NULL)
    * whose estimate comes from the SKETCH UNION, not from the raw data.
    * DuckDB's approx_distinct is a different sketch → rows-only check;
    * ApproxSpec pins the estimates against exact distincts and the
    * union-vs-direct consistency. */
  val q56SketchRollup: Q = Q.rowsOnly("q56_sketch_rollup") { (s, d) =>
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val perDay = daily.select($"day", hll_sketch_estimate($"sk").as("est_users"))
    val merged = daily.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est_users"))
      .select(lit(null).cast("timestamp").as("day"), $"est_users")
    perDay.unionByName(merged).orderBy($"day".asc_nulls_first)
  }

  /** q76: mergeable equi-width histogram sketch → approximate quantiles,
    * the deterministic sibling of q91's approx_percentile and q56's HLL
    * rollup. The sketch is a (group, bin, count) table over FIXED bin
    * boundaries (64 bins spanning the l_extendedprice domain), built
    * per-(group, linestatus) partition and MERGED by summing counts —
    * the mergeability that makes it a sketch: at 100 TB the per-partition
    * histograms are 64 longs each, partial aggregation collapses them
    * map-side, and any coarser rollup (per-day → per-month) is a sum over
    * sketch rows, never a second pass over raw data. Quantile estimation
    * is linear interpolation inside the covering bin.
    *
    * Exactness (unlike HLL/approx_percentile, this sketch IS
    * oracle-checkable): bin assignment is IEEE double arithmetic identical
    * in both engines (W = 1626.5625 is a dyadic rational), counts and rank
    * targets are integer (`div` ≡ `//` on positives), and the interpolation
    * is the same double formula — so the DuckDB mirror hash-matches
    * bit-for-bit while still being an *approximate* quantile (ApproxSpec
    * pins the estimate within one bin width of the exact percentile). */
  val q76HistogramQuantiles: Q = Q(
    "q76_histogram_quantiles",
    """WITH binned AS (
      |  SELECT l_returnflag AS grp, l_linestatus AS part,
      |         LEAST(63, GREATEST(0, CAST(FLOOR((l_extendedprice - 900.0) / 1626.5625) AS INTEGER))) AS bin,
      |         COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2, 3),
      |merged AS (SELECT grp, bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM binned GROUP BY 1, 2),
      |cum AS (SELECT grp, bin, cnt,
      |        CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS BIGINT) AS cum FROM merged),
      |target AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS total,
      |           (CAST(SUM(cnt) AS BIGINT) + 1) // 2 AS t50,
      |           (95 * CAST(SUM(cnt) AS BIGINT) + 99) // 100 AS t95 FROM merged GROUP BY 1),
      |pick AS (
      |  SELECT t.grp, t.total, t.t50, t.t95,
      |    (SELECT MIN(c.bin) FROM cum c WHERE c.grp = t.grp AND c.cum >= t.t50) AS b50,
      |    (SELECT MIN(c.bin) FROM cum c WHERE c.grp = t.grp AND c.cum >= t.t95) AS b95
      |  FROM target t)
      |SELECT p.grp AS l_returnflag, p.total AS total_cnt,
      |  ROUND(900.0 + 1626.5625 * (c50.bin + CAST(p.t50 - (c50.cum - c50.cnt) AS DOUBLE) / c50.cnt), 6) AS est_p50,
      |  ROUND(900.0 + 1626.5625 * (c95.bin + CAST(p.t95 - (c95.cum - c95.cnt) AS DOUBLE) / c95.cnt), 6) AS est_p95
      |FROM pick p
      |JOIN cum c50 ON c50.grp = p.grp AND c50.bin = p.b50
      |JOIN cum c95 ON c95.grp = p.grp AND c95.bin = p.b95
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    val lo = 900.0
    val w = 1626.5625 // (105000 - 900) / 64 — dyadic, exactly representable
    // build: one histogram per (grp, part) — the mergeable sketch unit
    val binned = Tables.lineitem(s, d)
      .groupBy($"l_returnflag".as("grp"), $"l_linestatus".as("part"),
        least(lit(63), greatest(lit(0),
          floor(($"l_extendedprice" - lo) / w).cast("int"))).as("bin"))
      .agg(count(lit(1)).as("cnt"))
    // merge: sum counts across parts — sketch union, no raw-data pass
    val merged = binned.groupBy($"grp", $"bin").agg(sum($"cnt").as("cnt"))
    val cum = merged.withColumn("cum",
      sum($"cnt").over(Window.partitionBy($"grp").orderBy($"bin")))
    val target = merged.groupBy($"grp").agg(sum($"cnt").as("total"))
      .withColumn("t50", expr("(total + 1) div 2"))
      .withColumn("t95", expr("(95 * total + 99) div 100"))
    val b50 = cum.join(target, "grp").filter($"cum" >= $"t50")
      .groupBy($"grp").agg(min($"bin").as("b50"))
    val b95 = cum.join(target, "grp").filter($"cum" >= $"t95")
      .groupBy($"grp").agg(min($"bin").as("b95"))
    def est(c: String, tcol: Column): Column = round(
      lit(lo) + lit(w) * (col(s"$c.bin") +
        (tcol - (col(s"$c.cum") - col(s"$c.cnt"))).cast("double") / col(s"$c.cnt")), 6)
    target.join(b50, "grp").join(b95, "grp").as("t")
      .join(cum.as("c50"), $"t.grp" === $"c50.grp" && $"t.b50" === $"c50.bin")
      .join(cum.as("c95"), $"t.grp" === $"c95.grp" && $"t.b95" === $"c95.bin")
      .select($"t.grp".as("l_returnflag"), $"t.total".as("total_cnt"),
        est("c50", $"t.t50").as("est_p50"), est("c95", $"t.t95").as("est_p95"))
      .orderBy($"l_returnflag")
  }

  /** q79: per-key exponentially weighted moving average over the event
    * stream — a LINEAR RECURRENCE (s' = s + α(x − s)), which no standard
    * window frame can express: RANGE/ROWS frames recompute aggregates per
    * row, they cannot thread state. The recurrence runs as an ordered
    * array fold per key: one shuffle groups the key's events, `array_sort`
    * fixes the (ts, event_id) order, and `aggregate` folds the tail onto
    * the head — seed-with-head + left fold is EXACTLY DuckDB's
    * `list_reduce` contract, and both engines execute the identical IEEE
    * sequence, so the oracle hash-matches despite float arithmetic
    * (α = 0.25 is dyadic but any double works — same ops, same order).
    *
    * Scale: per-key sequences must fit a task (true of any
    * collect-ordered-state operator; a million-event key would move to
    * flatMapGroupsWithState streaming form — q23's machinery). The
    * shuffle carries (ts, id, value) triples only. */
  val q79Ewma: Q = Q(
    "q79_ewma",
    """SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  ROUND(list_reduce(list(value ORDER BY ts, event_id),
      |    (s, x) -> s + 0.25 * (x - s)), 6) AS ewma
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val seq = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"ts", $"event_id", $"value")))
        .as("seq"))
      .select($"user_id",
        transform($"seq", p => p("value")).as("vals"))
    seq.select($"user_id",
        size($"vals").cast("long").as("n_events"),
        round(aggregate(
          slice($"vals", lit(2), size($"vals") - 1),
          element_at($"vals", 1),
          (s0, x) => s0 + lit(0.25) * (x - s0)), 6).as("ewma"))
      .orderBy($"user_id")
  }

  // ---- q104: sequential funnel analysis ----------------------------------

  /** q104: three-step conversion funnel (view → click → purchase, each step
    * within one day of the previous) over the event stream — the product
    * analytics staple (Amplitude/Mixpanel funnels; MATCH_RECOGNIZE's most
    * common use). Per user: the earliest time each step completes given
    * the previous step's completion, plus the reached depth.
    *
    * Scale: each step is one filtered scan joined against the previous
    * step's per-user scalar frame (one timestamp per converted user —
    * orders of magnitude smaller than the event stream; AQE broadcasts it
    * while it fits, shuffle-joins beyond) followed by a map-side-combined
    * min. Linear in events, state bounded by users — the same shape as a
    * streaming funnel's keyed state. Timestamps compare exactly (both
    * engines see the same microsecond-truncated values — Tables.events).
    */
  val q104Funnel: Q = Q(
    "q104_funnel",
    """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |u AS (SELECT DISTINCT user_id FROM ev),
      |s1 AS (SELECT user_id, MIN(ts) AS t_view FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM ev e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t_view
      |    AND e.ts <= s1.t_view + INTERVAL 1 DAY GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM ev e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      |    AND e.ts <= s2.t_click + INTERVAL 1 DAY GROUP BY e.user_id)
      |SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
      |  CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
      |            WHEN s2.t_click IS NOT NULL THEN 2
      |            WHEN s1.t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
      |FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
      |  LEFT JOIN s2 ON u.user_id = s2.user_id
      |  LEFT JOIN s3 ON u.user_id = s3.user_id
      |ORDER BY u.user_id""".stripMargin,
  ) { (s, d) =>
    funnel(Tables.events(s, d),
      Seq("view" -> "t_view", "click" -> "t_click", "purchase" -> "t_purchase"),
      expr("INTERVAL 1 DAY"))
  }

  /** [[q104Funnel]]'s operator body: an N-step earliest-completion funnel
    * over (user_id, event_type, ts). `steps` maps each step's event type
    * to its output timestamp column; each step must complete within
    * `within` of the previous step's completion time. Returns one row per
    * user with the step timestamps (null once the funnel breaks) and the
    * reached depth. */
  def funnel(events: DataFrame, steps: Seq[(String, String)], within: Column): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    val u = ev.select(col("user_id")).distinct()
    val outCols = steps.map(_._2)
    // step i's frame: earliest qualifying ts per user, scoped by step i-1
    val stepFrames = steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, ((step, out), i)) =>
        val base = ev.filter(col("event_type") === step)
        val scoped = acc.headOption match {
          case None => base
          case Some(prev) =>
            val pc = col(outCols(i - 1))
            base.join(prev, "user_id")
              .filter(col("ts") > pc && col("ts") <= pc + within)
        }
        scoped.groupBy(col("user_id")).agg(min(col("ts")).as(out)) :: acc
    }.reverse
    val joined = stepFrames.foldLeft(u)((acc, f) =>
      acc.join(f.select(col("user_id"), col(f.columns.last)), Seq("user_id"), "left"))
    // deepest step wins, so the deepest check must be the OUTERMOST branch
    val depth = steps.indices.foldLeft(lit(0)) { (els, i) =>
      when(col(outCols(i)).isNotNull, i + 1).otherwise(els)
    }
    joined
      .select(col("user_id") +: outCols.map(col) :+ depth.cast("long").as("depth"): _*)
      .orderBy(col("user_id"))
  }

  // ---- q105: cohort retention ---------------------------------------------

  /** q105: cohort retention matrix — users grouped by first-activity day,
    * counted on each later day they return (the other product-analytics
    * staple next to q104's funnel). Two map-side-combined aggregations
    * (first day per user, distinct active (user, day)) and one join keyed
    * by user — linear in events, output bounded by cohorts × days. */
  val q105CohortRetention: Q = Q(
    "q105_cohort_retention",
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |fst AS (SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY user_id),
      |act AS (SELECT DISTINCT user_id, day FROM ev)
      |SELECT f.cohort, CAST(a.day - f.cohort AS BIGINT) AS day_offset,
      |  COUNT(*) AS n_users
      |FROM act a JOIN fst f ON a.user_id = f.user_id
      |GROUP BY f.cohort, a.day - f.cohort
      |ORDER BY cohort, day_offset""".stripMargin,
  ) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val fst = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val act = ev.distinct()
    act.join(fst, "user_id")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort"), col("day_offset").cast("long").as("day_offset"),
        col("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  // ---- q115: market-basket co-occurrence --------------------------------

  private val BasketMinSupport = 2
  private val BasketTopK = 5

  /** q115: market-basket co-occurrence — the collaborative-filtering /
    * frequent-itemset prep step: parts bought together in one order form
    * pairs, pairs aggregate to support counts, and each part keeps its
    * top-[[BasketTopK]] partners with support ≥ [[BasketMinSupport]].
    *
    * Scale shape: the self-join is keyed on the ORDER (baskets are small
    * and bounded — ~4 items — so per-order pair fan-out is constant, the
    * classic A-priori candidate bound); pair counts partial-aggregate
    * map-side; the per-part rank windows over the SUPPORT-FILTERED pair
    * set, which is corpus-sparse. No step depends on |parts|² anywhere.
    * Ordered-pair symmetrization (union of both directions) avoids
    * counting each unordered pair twice while still ranking partners for
    * BOTH endpoints. */
  val q115MarketBasket: Q = Q(
    "q115_market_basket",
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $BasketMinSupport),
       |sym AS (
       |  SELECT pa AS part, pb AS partner, support FROM pairs
       |  UNION ALL
       |  SELECT pb, pa, support FROM pairs),
       |ranked AS (
       |  SELECT part, partner, CAST(support AS BIGINT) AS support,
       |    ROW_NUMBER() OVER (PARTITION BY part
       |      ORDER BY support DESC, partner) AS rnk
       |  FROM sym)
       |SELECT part, partner, support, rnk FROM ranked
       |WHERE rnk <= $BasketTopK ORDER BY part, rnk""".stripMargin,
  ) { (s, d) =>
    // Pair generation as ONE order-keyed aggregation instead of
    // distinct + self-join (r17; guide §2.4): collect_set per order IS
    // the distinct (partial-aggregated map-side), and the ordered pairs
    // of a ~4-item basket enumerate in-array with a sorted-array double
    // transform — pa < pb ≡ position order after sort_array. The former
    // plan paid an Exchange for the distinct and re-shuffled BOTH join
    // sides on l_orderkey (3 Exchanges before the support groupBy); now
    // exactly one order-keyed Exchange feeds the pair explosion. Same
    // pair multiset, same support counts — the oracle is unchanged.
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y ->
          |    struct(x AS pa, y AS pb))))""".stripMargin)).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= BasketMinSupport)
    val sym = pairs.select(col("pa").as("part"), col("pb").as("partner"),
        col("support"))
      .unionAll(pairs.select(col("pb").as("part"), col("pa").as("partner"),
        col("support")))
    val w = Window.partitionBy(col("part"))
      .orderBy(col("support").desc, col("partner"))
    sym.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= BasketTopK)
      .select(col("part"), col("partner"), col("support"), col("rnk"))
      .orderBy(col("part"), col("rnk"))
  }

  // ---- q116: batch sessionization + path mining --------------------------

  private val SessionGapMin = 720L // 12 h: the corpus is ~1 event/user/day, so a web-style 30-min gap yields singleton sessions
  private val PathLen = 3
  private val PathTopK = 10

  /** q116: sessionize-then-mine — the batch sibling of q33's streaming
    * `session_window`: sessions are gap-cut with the classic two-window
    * recipe (lag → new-session flag → running sum = session id; both
    * windows key on user, so the whole cut is one shuffle), then each
    * session reduces to its first-[[PathLen]] event-type PATH and the
    * corpus's most common paths rank by frequency — the navigation-path /
    * user-journey analysis next to q104's funnel.
    *
    * Exactness: the in-session order is the total (ts, event_id) key;
    * Spark sorts struct(ts, event_id, type) lexicographically and DuckDB
    * lists with the same ORDER BY, so the path strings agree; counts are
    * integers, ties rank by path text (ASCII). */
  val q116SessionPaths: Q = Q(
    "q116_session_paths",
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events),
       |flagged AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN prev_ts IS NULL
       |           OR ts - prev_ts > INTERVAL ${SessionGapMin} MINUTE
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM ev),
       |sessions AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    SUM(new_session) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS session_id
       |  FROM flagged),
       |paths AS (
       |  SELECT user_id, session_id,
       |    array_to_string(
       |      (list(event_type ORDER BY ts, event_id))[1:$PathLen], '>') AS path
       |  FROM sessions GROUP BY user_id, session_id)
       |SELECT path, n_sessions, rnk FROM (
       |  SELECT path, COUNT(*) AS n_sessions,
       |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rnk
       |  FROM paths GROUP BY path)
       |WHERE rnk <= $PathTopK ORDER BY rnk""".stripMargin,
  ) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            SessionGapMin * 60L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
    val paths = ev.groupBy(col("user_id"), col("session_id"))
      .agg(concat_ws(">", transform(
        slice(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))), 1, PathLen),
        x => x.getField("event_type"))).as("path"))
    val w = Window.orderBy(col("n_sessions").desc, col("path"))
    // corpus-wide top-k: aggregate first (paths are low-cardinality after
    // the groupBy), then TakeOrdered via orderBy+limit before the tiny
    // ranking window — the q102 discipline
    val counts = paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
    counts.orderBy(col("n_sessions").desc, col("path")).limit(PathTopK)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .orderBy(col("rnk"))
  }

  val all: Seq[Q] = Seq(q80AsofJoin, q81GroupingSets, q82Pivot, q83Posexplode,
    q84FullOuter, q85RangeJoin, q86Subqueries, q87Stats, q88Percentiles,
    q89StringAgg, q90StratifiedSample, q91ApproxPercentiles,
    q92SequencePacking, q93RangeFrame, q94GapFill, q95Profile,
    q49HeavyHitters, q56SketchRollup, q76HistogramQuantiles, q79Ewma,
    q104Funnel, q105CohortRetention, q115MarketBasket, q116SessionPaths)
}
