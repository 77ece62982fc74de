package graft.relational

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Declarative data-quality expectations — the enforcement sibling of
  * q95's profiling report and the shape every ingestion gate takes
  * (Deequ/Great-Expectations/dbt-test): a rule set evaluated in as few
  * passes as the rules allow, producing one (rule, violations, pass) row
  * per expectation instead of failing opaquely downstream.
  *
  * Scale shape: all single-table rules for a table fold into ONE
  * aggregate scan of it (a rule is just a conditional counter — adding a
  * rule adds an expression, not a pass); referential rules are the only
  * joins, planned as a plain equi-join AQE can broadcast when the
  * dimension side is small. Nothing is driver-side: the report frame IS
  * the three one-row aggregates cross-joined (1×1×1) and unpivoted.
  *
  * Reference tie-in: the reference's consistency predicates
  * (SURVEY.md §2.a R2/R3) gate single documents in-pipeline; this is the
  * corpus-level audit of the same idea.
  */
object Quality {

  /** q125: a six-rule expectation suite over orders/lineitem with both
    * outcomes represented on the synthetic data (uniqueness/not-null/FK/
    * positivity pass; the tightened quantity range and returnflag value
    * set fire) — so the hash check covers firing counts AND the pass
    * booleans. */
  val q125Expectations: Q = Q(
    "q125_expectations",
    """SELECT rule, violations, violations = 0 AS pass FROM (
      |  SELECT 'accepted_values_returnflag' AS rule, COUNT(*) AS violations
      |  FROM lineitem WHERE l_returnflag NOT IN ('A', 'N')
      |  UNION ALL
      |  SELECT 'fk_lineitem_orderkey', COUNT(*)
      |  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_orderkey IS NULL
      |  UNION ALL
      |  SELECT 'not_null_custkey', COUNT(*)
      |  FROM orders WHERE o_custkey IS NULL
      |  UNION ALL
      |  SELECT 'positive_extendedprice', COUNT(*)
      |  FROM lineitem WHERE l_extendedprice <= 0
      |  UNION ALL
      |  SELECT 'range_quantity_1_25', COUNT(*)
      |  FROM lineitem WHERE l_quantity NOT BETWEEN 1 AND 25
      |  UNION ALL
      |  SELECT 'unique_orderkey', COUNT(*) - COUNT(DISTINCT o_orderkey)
      |  FROM orders)
      |ORDER BY rule""".stripMargin,
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    // one aggregate scan per table: every single-table rule is a counter
    val oAgg = o.agg(
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("uq"))
    val lAgg = li.agg(
      sum(when(!col("l_quantity").between(1, 25), 1L).otherwise(0L))
        .as("rng"),
      sum(when(!col("l_returnflag").isin("A", "N"), 1L).otherwise(0L))
        .as("av"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("pos"))
    val fk = li.join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("fk"))
    oAgg.crossJoin(lAgg).crossJoin(fk)
      .select(explode(array(
        struct(lit("accepted_values_returnflag").as("rule"),
          col("av").as("violations")),
        struct(lit("fk_lineitem_orderkey").as("rule"),
          col("fk").as("violations")),
        struct(lit("not_null_custkey").as("rule"),
          col("nn").as("violations")),
        struct(lit("positive_extendedprice").as("rule"),
          col("pos").as("violations")),
        struct(lit("range_quantity_1_25").as("rule"),
          col("rng").as("violations")),
        struct(lit("unique_orderkey").as("rule"),
          col("uq").as("violations")))).as("r"))
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        (col("r.violations") === 0).as("pass"))
      .orderBy(col("rule"))
  }

  val all: Seq[Q] = Seq(q125Expectations)
}
