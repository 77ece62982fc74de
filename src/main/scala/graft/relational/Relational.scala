package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.Tables.{moneySum, moneySumSql}

/** The relational operator suite (SURVEY.md §2.b): scans, joins (broadcast /
  * shuffle / semi / anti / theta), aggregations (hash agg, distinct, approx
  * distinct, rollup, cube), window functions (rank / lag / frames / top-k),
  * sorts and limits, set operations, and scalar function coverage
  * (string / date / math / array / json).
  *
  * All queries are declarative DataFrame plans: Catalyst pushes filters and
  * prunes columns into the parquet scans, AQE handles join-strategy and skew
  * at runtime. Only FIXED-cardinality dimension tables (region 5 rows,
  * nation 25 — constant at every SF) carry explicit `broadcast()` hints so
  * the big fact tables never shuffle for those joins. SF-scaled tables
  * (customer, supplier, part, …) are never hinted: AQE picks broadcast vs
  * shuffle from actual sizes, so the same plan survives a 100× scale-up.
  *
  * Reference basis: the reference itself (d-smith/sfs3-kinesis) contains no
  * relational operators — see SURVEY.md §2.b (verified absent); this suite is
  * the engine surface mandated by BASELINE.json's north star.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: filter → hash agg (partial+final) →
    * sort. Filter pushes into the parquet scan; sums are decimal-exact. */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("2000-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        moneySum($"l_quantity").as("sum_qty"),
        moneySum($"l_extendedprice").as("sum_base_price"),
        moneySum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("sum_disc_price"),
        moneySum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 6).as("sum_charge"),
        (moneySum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"),
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q5-shaped revenue rollup through the full star join. Fixed-size
    * dims (nation 25 rows, region 5) are hint-broadcast; customer is
    * SF-scaled so its join strategy is left to AQE (a hardcoded hint would
    * force a multi-GB broadcast at 100×); the orders⋈lineitem join shuffles
    * on orderkey (or broadcasts under AQE when orders is small). */
  val q02RevenueByNation: Q = Q(
    "q02_revenue_by_nation",
    s"""SELECT n_name, r_name,
       |  ${moneySumSql("l_extendedprice*(1-l_discount)", 4)} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey  = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY n_name, r_name
       |ORDER BY revenue DESC, n_name""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    // pre-aggregate lineitem per order, so the one shuffle join carries a
    // quarter of the rows; dims broadcast. rev stays DECIMAL through both
    // aggregation levels (exact, associative) and casts to double once at
    // the end — summing per-order doubles would be order-dependent.
    val li = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("rev"),
        count(lit(1)).as("cnt"))
    li.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name", $"r_name")
      .agg(
        sum($"rev").cast("double").as("revenue"),
        sum($"cnt").as("n_items"),
      )
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q3-shaped top-10: join, agg, global top-k (sort+limit — Spark
    * runs this as TakeOrderedAndProject, no full sort at scale). */
  val q03TopOrders: Q = Q(
    "q03_top_orders",
    s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
       |  ${moneySumSql("l_extendedprice*(1-l_discount)", 4)} AS revenue
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE o_orderstatus <> 'F'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    // aggregate lineitem BEFORE the join: the join then carries one
    // (orderkey, revenue) row per order instead of ~4 raw lineitems, and
    // the shuffle on orderkey is shared by the agg and the join. Exact
    // (decimal sums are associative), so identical to agg-after-join.
    val revenue = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(moneySum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
    Tables.orders(s, d).filter($"o_orderstatus" =!= "F")
      .join(revenue, $"l_orderkey" === $"o_orderkey")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority", $"revenue")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** Left-semi join (EXISTS): order-priority counts for orders having at
    * least one returned lineitem. Semi-join never duplicates the left side. */
  val q04SemiJoin: Q = Q(
    "q04_semi_join",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .join(
        Tables.lineitem(s, d).filter($"l_returnflag" === "R"),
        $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** Left-anti join (NOT EXISTS): customers that never placed an order. */
  val q05AntiJoin: Q = Q(
    "q05_anti_join",
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"o_custkey" === $"c_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** TPC-H Q6-shaped selective filter + scalar agg — the whole predicate
    * pushes into the parquet scan (PushedFilters), the agg is a single
    * partial+final reduction with no shuffle of raw rows. */
  val q06SelectiveAgg: Q = Q(
    "q06_selective_agg",
    s"""SELECT ${moneySumSql("l_extendedprice*l_discount", 4)} AS revenue,
       |  COUNT(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
       |  AND l_shipdate < TIMESTAMP '1999-01-01'
       |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1999-01-01").cast("timestamp") &&
        $"l_discount".between(0.02, 0.06) && $"l_quantity" < 25)
      .agg(
        moneySum($"l_extendedprice" * $"l_discount", 4).as("revenue"),
        count(lit(1)).as("n_rows"),
      )
  }

  /** Theta (non-equi) join: nation pairs sharing a region. Both sides are
    * tiny dims → broadcast nested-loop join; never reaches the fact tables. */
  val q07ThetaJoin: Q = Q(
    "q07_theta_join",
    """SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, r_name
      |FROM nation n1
      |JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
      |               AND n1.n_nationkey < n2.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |ORDER BY nation_a, nation_b""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val n1 = Tables.nation(s, d).select(
      $"n_nationkey".as("k1"), $"n_name".as("nation_a"), $"n_regionkey".as("rk1"))
    val n2 = Tables.nation(s, d).select(
      $"n_nationkey".as("k2"), $"n_name".as("nation_b"), $"n_regionkey".as("rk2"))
    n1.join(broadcast(n2), $"rk1" === $"rk2" && $"k1" < $"k2")
      .join(broadcast(Tables.region(s, d)), $"rk1" === $"r_regionkey")
      .select($"nation_a", $"nation_b", $"r_name")
      .orderBy($"nation_a", $"nation_b")
  }

  /** ROLLUP grouping sets over the geography hierarchy. NULL group keys are
    * coalesced to 'ALL' so the oracle needs no null-ordering pinning. */
  val q08Rollup: Q = Q(
    "q08_rollup",
    s"""SELECT COALESCE(r_name,'ALL') AS r_name, COALESCE(n_name,'ALL') AS n_name,
       |  COUNT(*) AS n_customers,
       |  ${moneySumSql("c_acctbal")} AS total_acctbal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY r_name, n_name""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), moneySum($"c_acctbal").as("total_acctbal"))
      .select(
        coalesce($"r_name", lit("ALL")).as("r_name"),
        coalesce($"n_name", lit("ALL")).as("n_name"),
        $"n_customers", $"total_acctbal")
      .orderBy($"r_name", $"n_name")
  }

  /** CUBE over order status × priority (all four grouping sets). */
  val q09Cube: Q = Q(
    "q09_cube",
    s"""SELECT COALESCE(o_orderstatus,'ALL') AS o_orderstatus,
       |  COALESCE(o_orderpriority,'ALL') AS o_orderpriority,
       |  COUNT(*) AS n_orders,
       |  ${moneySumSql("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), moneySum($"o_totalprice").as("total_price"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("o_orderstatus"),
        coalesce($"o_orderpriority", lit("ALL")).as("o_orderpriority"),
        $"n_orders", $"total_price")
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  /** Top-k per group via ranking window — the scalable top-k idiom (no
    * global sort; one shuffle on the partition key). */
  val q10TopkPerGroup: Q = Q(
    "q10_topk_per_group",
    """SELECT * FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 3
      |ORDER BY c_mktsegment, rn""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, d)
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .orderBy($"c_mktsegment", $"rn")
  }

  /** LAG window: per-customer order-over-order price delta. The delta is a
    * single double subtraction of identical operands in both engines →
    * bit-deterministic without rounding. */
  val q11WindowLag: Q = Q(
    "q11_window_lag",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  o_totalprice - LAG(o_totalprice) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS price_delta
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        ($"o_totalprice" - lag($"o_totalprice", 1).over(w)).as("price_delta"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Running-total window frame (ROWS UNBOUNDED PRECEDING), decimal-exact. */
  val q12RunningSum: Q = Q(
    "q12_running_sum",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey",
        sum($"o_totalprice".cast("decimal(18,2)")).over(w).cast("double")
          .as("running_spend"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** DISTINCT (shuffle-dedup on the projected key). */
  val q13Distinct: Q = Q(
    "q13_distinct",
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.customer(s, d).select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** Approximate distinct (HyperLogLog++). Sketch values are
    * implementation-specific → no SQL oracle (rows-only check); exactness is
    * covered by the unit test comparing against true counts within rsd. */
  val q14ApproxDistinct: Q = Q.rowsOnly("q14_approx_distinct") { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.01).as("approx_parts"),
        approx_count_distinct($"l_suppkey", 0.01).as("approx_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Set operations: INTERSECT and EXCEPT branches unioned with a tag. */
  val q15SetOps: Q = Q(
    "q15_set_ops",
    """SELECT 'both' AS op, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT
      |  SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT 'only_seg' AS op, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT
      |  SELECT o_custkey FROM orders)
      |ORDER BY op, c_custkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val seg = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ordered = Tables.orders(s, d).select($"o_custkey".as("c_custkey"))
    seg.intersect(ordered).select(lit("both").as("op"), $"c_custkey")
      .unionAll(seg.except(ordered).select(lit("only_seg").as("op"), $"c_custkey"))
      .orderBy($"op", $"c_custkey")
  }

  /** String function coverage: case, substring, length, concat, regexp
    * extract/replace — all codegen'd builtins, no UDFs. */
  val q16StringFns: Q = Q(
    "q16_string_fns",
    """SELECT p_partkey,
      |  UPPER(p_brand) AS brand_upper,
      |  LOWER(p_type) AS type_lower,
      |  SUBSTRING(p_name, 1, 12) AS name_prefix,
      |  LENGTH(p_name) AS name_len,
      |  CONCAT_WS('/', p_brand, p_type) AS brand_type,
      |  REGEXP_EXTRACT(p_type, '(\w+)$', 1) AS type_last_word,
      |  REPLACE(p_name, ' ', '_') AS name_snake
      |FROM part ORDER BY p_partkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.part(s, d).select(
      $"p_partkey",
      upper($"p_brand").as("brand_upper"),
      lower($"p_type").as("type_lower"),
      substring($"p_name", 1, 12).as("name_prefix"),
      length($"p_name").cast("long").as("name_len"),
      concat_ws("/", $"p_brand", $"p_type").as("brand_type"),
      regexp_extract($"p_type", "(\\w+)$", 1).as("type_last_word"),
      regexp_replace($"p_name", " ", "_").as("name_snake"),
    ).orderBy($"p_partkey")
  }

  /** Date/time coverage: trunc, extract, day arithmetic, epoch — grouped to
    * a monthly order summary. */
  val q17DateFns: Q = Q(
    "q17_date_fns",
    s"""SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
       |  YEAR(o_orderdate) AS order_year,
       |  MONTH(o_orderdate) AS order_month_num,
       |  COUNT(*) AS n_orders,
       |  ${moneySumSql("o_totalprice")} AS total_price,
       |  MIN(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate)) AS min_days_since_epoch
       |FROM orders
       |GROUP BY 1, 2, 3
       |ORDER BY order_month""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .groupBy(
        date_trunc("month", $"o_orderdate").as("order_month"),
        year($"o_orderdate").cast("long").as("order_year"),
        month($"o_orderdate").cast("long").as("order_month_num"))
      .agg(
        count(lit(1)).as("n_orders"),
        moneySum($"o_totalprice").as("total_price"),
        min(datediff($"o_orderdate", lit("1995-01-01").cast("timestamp")))
          .cast("long").as("min_days_since_epoch"))
      .orderBy($"order_month")
  }

  /** Math function coverage on per-row values (deterministic: same input
    * double → same IEEE result; ln rounded to dodge libm last-ulp drift). */
  val q18MathFns: Q = Q(
    "q18_math_fns",
    """SELECT l_orderkey, l_linenumber,
      |  ABS(l_extendedprice - 1000.0) AS abs_delta,
      |  CAST(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)) AS DOUBLE) AS disc_amt,
      |  CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
      |  CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_kilo,
      |  ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
      |  ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln,
      |  MOD(l_orderkey, 97) AS key_mod
      |FROM lineitem
      |WHERE l_linenumber = 1 AND l_orderkey < 5000
      |ORDER BY l_orderkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_linenumber" === 1 && $"l_orderkey" < 5000)
      .select(
        $"l_orderkey", $"l_linenumber",
        abs($"l_extendedprice" - 1000.0).as("abs_delta"),
        ($"l_extendedprice" * $"l_discount").cast("decimal(18,4)").cast("double").as("disc_amt"),
        floor($"l_quantity" / 7.0).as("qty_bucket"),
        ceil($"l_extendedprice" / 1000.0).as("price_kilo"),
        round(sqrt($"l_extendedprice"), 4).as("price_sqrt"),
        round(log($"l_extendedprice" + 1.0), 6).as("price_ln"),
        ($"l_orderkey" % 97).as("key_mod"),
      ).orderBy($"l_orderkey")
  }

  /** Array/higher-order-function coverage over the embedding vectors:
    * size, element access, slice, and a fold (dot-product) — the building
    * blocks of the similarity operators in graft.sim. Elements are cast
    * float→double before arithmetic so both engines accumulate in double. */
  val q19ArrayFns: Q = Q(
    "q19_array_fns",
    """SELECT vec_id, label,
      |  LEN(embedding) AS dim,
      |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
      |  ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))), 6) AS sq_norm,
      |  ROUND(LIST_MAX(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 6) AS max_elem
      |FROM embeddings ORDER BY vec_id""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.embeddings(s, d).select(
      $"vec_id", $"label",
      size($"embedding").cast("long").as("dim"),
      round(element_at($"embedding", 1).cast("double"), 6).as("first_elem"),
      round(
        aggregate(
          transform($"embedding", x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x),
        6).as("sq_norm"),
      round(array_max(transform($"embedding", _.cast("double"))), 6).as("max_elem"),
    ).orderBy($"vec_id")
  }

  /** JSON extraction over the events.props payload column — the engine's
    * analog of the reference's JSON-native documents (SURVEY §1.2:
    * aprocess.js:24 JSON.parse / :36 stringify). */
  val q20JsonFns: Q = Q(
    "q20_json_fns",
    """SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  CAST(json_object('k_bucket', CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10,
      |                   'n_events', COUNT(*)) AS VARCHAR) AS json_out
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    // schema-full parse (from_json) rather than path extraction, plus a
    // to_json re-serialization — the parse/serialize pair of §2.b's JSON
    // row (formats agree byte-for-byte with DuckDB's json_object)
    Tables.events(s, d)
      .groupBy((from_json($"props",
        org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
        .getField("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total_value"))
      .withColumn("json_out", to_json(struct($"k_bucket", $"n_events")))
      .orderBy($"k_bucket")
  }

  /** q29: NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM): null
    * keys match each other instead of dropping — the semantics required
    * when the join key is itself derived and legitimately null. Join
    * output is aggregated (null-key pairs form a real group, proving the
    * nulls joined). */
  val q29NullSafeJoin: Q = Q(
    "q29_nullsafe_join",
    """WITH k AS (
      |  SELECT CASE WHEN value < 0.1 THEN NULL ELSE event_type END AS k
      |  FROM events)
      |SELECT a.k IS NULL AS null_key, COUNT(*) AS n_pairs
      |FROM k a JOIN k b ON a.k IS NOT DISTINCT FROM b.k
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    // The operator under test is the null-safe equi-join (`<=>`); the pair
    // COUNT is computed by pre-aggregating BOTH sides to (k, cnt) and
    // multiplying across the join — identical arithmetic to counting the
    // joined rows, but the join carries one row per key instead of
    // materializing |k|² pairs (68 s → 0.3 s at sf0.1; at 100 TB the raw
    // self-join would be quadratic in the events table).
    def keyed = Tables.events(s, d)
      .select(when($"value" < 0.1, lit(null)).otherwise($"event_type").as("k"))
    val ca = keyed.groupBy($"k").agg(count(lit(1)).as("na"))
    val cb = ca.select($"k".as("bk"), $"na".as("nb"))
    ca.join(cb, $"k" <=> $"bk")
      .groupBy($"k".isNull.as("null_key"))
      .agg(sum($"na" * $"nb").as("n_pairs"))
      .orderBy($"null_key")
  }

  /** q28: UNPIVOT (melt) — wide money columns to long (metric, v) rows,
    * the inverse of q82's pivot. Narrow per-row generate (each input row
    * emits 3), no shuffle until the ORDER BY for the compare. */
  val q28Unpivot: Q = Q(
    "q28_unpivot",
    """SELECT l_orderkey, l_linenumber, 'extendedprice' AS metric, l_extendedprice AS v
      |FROM lineitem WHERE l_orderkey < 100
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'discount', l_discount
      |FROM lineitem WHERE l_orderkey < 100
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'tax', l_tax
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    Tables.lineitem(s, d).filter($"l_orderkey" < 100)
      .select($"l_orderkey", $"l_linenumber",
        $"l_extendedprice".as("extendedprice"), $"l_discount".as("discount"),
        $"l_tax".as("tax"))
      .unpivot(Array($"l_orderkey", $"l_linenumber"),
        Array($"extendedprice", $"discount", $"tax"), "metric", "v")
      .orderBy($"l_orderkey", $"l_linenumber", $"metric")
  }

  /** q27: deterministic hash-based sampling and train/valid/test
    * splitting — the reproducible-shard operator every training-data
    * pipeline needs. The bucket is md5-derived from the KEY (not rand()),
    * so assignment is stable across runs, engines, partitionings, and
    * retries — a re-crawled document lands in the same split forever.
    * Narrow per-row pass; exact cross-engine oracle (md5 is md5). */
  val q27HashSplit: Q = Q(
    "q27_hash_split",
    """WITH h AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
      |      AS bucket
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
      |  bucket < 10 AS in_sample
      |FROM h ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val bucket = (conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
      .cast("long") % 100).cast("int")
    Tables.documents(s, d).select(
      $"doc_id",
      when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
        .as("split"),
      (bucket < 10).as("in_sample"),
    ).orderBy($"doc_id")
  }

  /** q26: the rest of the ranking/analytic window family over one
    * deterministic ordering — rank, dense_rank, ntile, percent_rank,
    * cume_dist, lead, and first/last over an explicit ROWS frame. One
    * shuffle on the partition key serves all eight functions (a single
    * Window node — PlanSpec-style sanity by construction). */
  val q26WindowSuite: Q = Q(
    "q26_window_suite",
    """SELECT o_custkey, o_orderkey,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |  ROUND(CUME_DIST() OVER w, 6) AS cume,
      |  LEAD(o_orderkey, 2) OVER w AS lead2_key,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_key,
      |  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS next_or_self
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wf = w.rowsBetween(Window.currentRow, 1)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey",
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        lead($"o_orderkey", 2).over(w).as("lead2_key"),
        first($"o_orderkey").over(w).as("first_key"),
        last($"o_orderkey").over(wf).as("next_or_self"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** q25: MapType operators — construction, keys/values, lookup,
    * entry-wise filter and value transform, concat. The oracle computes
    * the same RESULT scalars directly (keys are literals to DuckDB), so
    * the check pins Spark's map semantics without needing cross-engine
    * map type agreement. All per-row and codegen'd — maps are the
    * document-as-dictionary shape of the reference's JS objects (R4). */
  val q25MapFns: Q = Q(
    "q25_map_fns",
    """SELECT event_id,
      |  'type,bucket' AS keys_csv,
      |  2 AS n_entries,
      |  event_type AS type_val,
      |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS n_purchase_entries,
      |  UPPER(event_type) || ',' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS VARCHAR)
      |    AS upper_vals_csv,
      |  3 AS n_after_concat
      |FROM events ORDER BY event_id""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val m = map(
      lit("type"), $"event_type",
      lit("bucket"), (get_json_object($"props", "$.k").cast("long") % 10).cast("string"))
    Tables.events(s, d).select(
      $"event_id",
      concat_ws(",", map_keys(m)).as("keys_csv"),
      size(m).as("n_entries"),
      element_at(m, "type").as("type_val"),
      size(map_filter(m, (_, v) => v === "purchase")).as("n_purchase_entries"),
      concat_ws(",", map_values(transform_values(m, (_, v) => upper(v))))
        .as("upper_vals_csv"),
      size(map_concat(m, map(lit("extra"), lit("x")))).as("n_after_concat"),
    ).orderBy($"event_id")
  }

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02RevenueByNation, q03TopOrders, q04SemiJoin,
    q05AntiJoin, q06SelectiveAgg, q07ThetaJoin, q08Rollup, q09Cube,
    q10TopkPerGroup, q11WindowLag, q12RunningSum, q13Distinct,
    q14ApproxDistinct, q15SetOps, q16StringFns, q17DateFns, q18MathFns,
    q19ArrayFns, q20JsonFns, q25MapFns, q26WindowSuite, q27HashSplit,
    q28Unpivot, q29NullSafeJoin,
  )
}
