package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.relational.Quality

/** Pins q125's cost contract: every single-table rule folds into the
  * table's ONE aggregate scan (adding a rule must add an expression, not
  * a pass), only the referential rule re-reads, and both rule outcomes
  * are represented on the synthetic data (so the oracle's pass booleans
  * aren't vacuously all-true). */
class QualitySpec extends SparkSpec {

  test("six rules cost two scans per table, and both outcomes appear") {
    val df = Quality.q125Expectations.fn(spark, sfDir)
    val scans = df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation =>
          f.location.rootPaths.map(_.toString).mkString(",")
      }
    }
    def n(t: String) = scans.count(_.contains(s"$t.parquet"))
    assert(n("lineitem") > 0 && n("orders") > 0,
      "scan detector matched nothing — vacuous")
    // agg scan + FK-join scan per table; a per-rule scan regression fails
    assert(n("lineitem") == 2, s"lineitem scanned ${n("lineitem")}x")
    assert(n("orders") == 2, s"orders scanned ${n("orders")}x")
    assert(scans.length == 4, s"unexpected extra scans: $scans")

    val rows = df.collect()
    assert(rows.length == 6)
    val pass = rows.map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!pass("range_quantity_1_25") && !pass("accepted_values_returnflag"),
      "no firing rule on this data — the violation path is untested")
    assert(pass("fk_lineitem_orderkey") && pass("unique_orderkey") &&
      pass("not_null_custkey") && pass("positive_extendedprice"))
    assert(rows.forall(r => (r.getLong(1) == 0) == r.getBoolean(2)))
  }
}
