package graft

import graft.relational.Temporal

/** Pins q130's cost and shape contracts: both window passes (change
  * detection + range close) ride ONE user-keyed hash exchange, and the
  * emitted history is a well-formed SCD2 chain — adjacent rows always
  * change status, ranges tile without gaps, exactly one open row per
  * user. */
class TemporalSpec extends SparkSpec {

  test("both windows share one hash exchange; history chains are well-formed") {
    val df = Temporal.q130Scd2.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx >= 1, "plan detector matched nothing — vacuous")
    assert(hashEx == 1,
      s"$hashEx user-keyed exchanges — the two windows stopped sharing")

    val rows = df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2), if (r.isNullAt(3)) null else r.getTimestamp(3),
      r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs0) =>
      val rs = rs0.sortBy(_._3.getTime)
      rs.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._2 != b._2, s"user $u: adjacent rows share status ${a._2}")
        assert(a._4 == b._3,
          s"user $u: range chain broken at ${a._4} -> ${b._3}")
      }
      assert(rs.init.forall(!_._5) && rs.last._5 && rs.last._4 == null,
        s"user $u: is_current/open-range invariant broken")
    }
  }
}
