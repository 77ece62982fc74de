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

  test("q91 approx_percentile stays within the GK rank-error bound") {
    // accuracy=1000 ⇒ rank error ≤ n/1000; the returned value is an actual
    // group element whose rank is within that of the target quantile.
    val approx = graft.relational.Relational2.q91ApproxPercentiles
      .fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val groups = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(approx.keySet == groups.keySet)
    groups.foreach { case (prio, sorted) =>
      val n = sorted.length
      val slack = n / 1000 + 1 // GK bound, +1 for nearest-rank rounding
      Seq(0.5 -> approx(prio)._1, 0.95 -> approx(prio)._2).foreach {
        case (p, got) =>
          val target = (p * (n - 1)).round.toInt
          val lo = sorted(math.max(0, target - slack))
          val hi = sorted(math.min(n - 1, target + slack))
          // query rounds to 4 decimals — compare with the same rounding
          def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
          assert(r4(lo) <= got && got <= r4(hi),
            s"$prio p$p: got=$got outside [$lo, $hi] (n=$n)")
      }
    }
  }

  test("q56 sketch rollup: estimates track exact uniques; union consistent with direct") {
    import spark.implicits._
    val out = graft.relational.Relational2.q56SketchRollup.fn(spark, sfDir)
      .collect().map(r => Option(r.getTimestamp(0)) -> r.getLong(1)).toMap
    val events = Tables.events(spark, sfDir)
    // per-day estimates vs exact per-day distincts
    val exactDaily = events.groupBy(date_trunc("day", $"ts").as("day"))
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => Option(r.getTimestamp(0)) -> r.getLong(1)).toMap
    for ((day, exact) <- exactDaily)
      assert(relErr(exact, out(day)) < 0.05, s"$day: exact=$exact est=${out(day)}")
    // the all-days row comes from the sketch UNION — it must agree with a
    // sketch built directly over the full input (mergeability) and with
    // the exact overall distinct within the error bound
    val direct = events.agg(
      hll_sketch_estimate(hll_sketch_agg($"user_id"))).head().getLong(0)
    val exactAll = events.select(countDistinct($"user_id")).head().getLong(0)
    assert(out(None) == direct,
      s"union estimate ${out(None)} != direct-sketch estimate $direct")
    assert(relErr(exactAll, out(None)) < 0.05)
  }

  test("graft_cm_estimate never under-counts — the q49 prefilter is lossless") {
    graft.functions.ArrayExprs.register(spark)
    import spark.implicits._
    // every key's CM estimate must be >= its true count (the one-sided
    // guarantee the sketch-prefiltered-exact pattern rests on)
    val keys = Tables.events(spark, sfDir)
      .select((col("event_id") % 97).as("key")) // 97 distinct keys, exact truth cheap
    keys.agg(expr("count_min_sketch(key, 0.001d, 0.99d, 42)").as("cm"))
      .createOrReplaceTempView("cmspec")
    val both = keys.groupBy($"key")
      .agg(count(lit(1)).as("true_n"))
      .withColumn("est",
        expr("graft_cm_estimate((SELECT cm FROM cmspec), key)"))
      .as[(Long, Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (k, t, e) =>
      assert(e >= t, s"key $k under-counted: est=$e true=$t")
    }

    // and end to end: q49's sketch-prefiltered result equals the plain
    // unfiltered groupBy-having on the same synthesized key
    val viaSketch = graft.relational.Relational2.q49HeavyHitters
      .fn(spark, sfDir).as[(Long, Long)].collect().toSet
    val keyed = Tables.events(spark, sfDir)
      .select(md5($"event_id".cast("string")).as("h"))
      .select(
        conv(substring($"h", 1, 4), 16, 10).cast("long").as("h16"),
        conv(substring($"h", 5, 8), 16, 10).cast("long").as("tail"))
      .select(when($"h16" % 4 === 0, expr("65536 div (h16 div 4 + 1)"))
        .otherwise(lit(100000L) + $"tail" % 500000L).as("key"))
    val total = Tables.events(spark, sfDir).count()
    val plain = keyed.groupBy($"key").agg(count(lit(1)).as("n_events"))
      .filter($"n_events" * 200 >= total)
      .as[(Long, Long)].collect().toSet
    assert(viaSketch == plain)
    // the probe is codegen'd, not a closure
    val planStr = graft.relational.Relational2.q49HeavyHitters
      .fn(spark, sfDir).queryExecution.sparkPlan.toString
    assert(!planStr.contains("ScalaUDF"))
    assert(planStr.contains("graft_cm_estimate"), planStr.take(2000))
  }

  test("q76 histogram sketch: estimates within one bin width of exact percentiles; sketch is mergeable") {
    import spark.implicits._
    val w = 1626.5625
    val got = graft.relational.Relational2.q76HistogramQuantiles
      .fn(spark, sfDir)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (g, (e50, e95)) =>
      assert(math.abs(e50 - exact(g)._1) <= w, s"$g p50: $e50 vs ${exact(g)._1}")
      assert(math.abs(e95 - exact(g)._2) <= w, s"$g p95: $e95 vs ${exact(g)._2}")
    }

    // mergeability: the histogram of the whole table equals the summed
    // histograms of ANY disjoint split (here: by linestatus, the same
    // split the query merges over)
    def bin = least(lit(63), greatest(lit(0),
      floor(($"l_extendedprice" - 900.0) / w).cast("int")))
    val li = Tables.lineitem(spark, sfDir)
    val whole = li.groupBy($"l_returnflag".as("grp"), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val merged = li.groupBy($"l_returnflag".as("grp"), $"l_linestatus".as("part"), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"grp", $"bin").agg(sum($"cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }
}
