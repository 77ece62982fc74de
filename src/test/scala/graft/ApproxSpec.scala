package graft

import org.apache.spark.sql.functions._

/** Error bounds for the approximate operators that have no SQL oracle
  * (q14 is a rows-only driver check): HLL++ relative error stays inside
  * its configured rsd on the real test tables. */
class ApproxSpec extends SparkSpec {

  private def relErr(exact: Long, approx: Long): Double =
    math.abs(approx - exact).toDouble / math.max(exact, 1L)

  test("approx_count_distinct tracks exact distinct within 5% (default rsd)") {
    val events = Tables.events(spark, sfDir)
    Seq("user_id", "event_type").foreach { c =>
      val exact = events.select(countDistinct(col(c))).head().getLong(0)
      val approx = events.select(approx_count_distinct(col(c))).head().getLong(0)
      assert(relErr(exact, approx) < 0.05, s"column $c: exact=$exact approx=$approx")
    }
  }

  test("tighter rsd tightens the estimate") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val tight = li.select(approx_count_distinct(col("l_orderkey"), 0.005))
      .head().getLong(0)
    assert(relErr(exact, tight) < 0.015, s"exact=$exact tight=$tight")
  }
}
