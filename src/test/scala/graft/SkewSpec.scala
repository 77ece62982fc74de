package graft

import org.apache.spark.sql.functions._
import graft.relational.Skew

/** Salted-join equivalence and mechanics (SURVEY.md §2.b scale notes). */
class SkewSpec extends SparkSpec {

  // events.user_id joined to customer: a natural big->small equi join
  private lazy val events = Tables.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), col("event_type"))
  private lazy val customer = Tables.customer(spark, sfDir)
    .select(col("c_custkey").as("user_id"), col("c_mktsegment"))

  test("salted join returns exactly the plain join's rows") {
    val plain = events.join(customer, Seq("user_id"))
    val salted = Skew.saltedEquiJoin(events, customer, "user_id", salts = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("a skewed key is spread over the salt space") {
    // all events collapsed onto ONE hot key — the worst case
    val hot = events.withColumn("user_id", lit(1L))
    val salted = hot.withColumn("__graft_salt",
      pmod(xxhash64(struct(hot.columns.map(col).toIndexedSeq: _*)), lit(8)))
    val used = salted.select(countDistinct(col("__graft_salt"))).head().getLong(0)
    assert(used == 8, s"hot key used only $used of 8 salts")
  }

  test("salt is stable under recomputation (no rand())") {
    val a = Skew.saltedEquiJoin(events, customer, "user_id", 4).count()
    val b = Skew.saltedEquiJoin(events, customer, "user_id", 4).count()
    assert(a == b)
  }

  test("bench-scale zipf fixture: naive, AQE-split and salted plans agree (sf0.1 volume)") {
    // the same fixture Bench times (10M rows, half on one key), here at a
    // spec-friendly 1M: all three plans must produce the identical join —
    // checksum AND row count — with broadcast off (the non-broadcastable-
    // dim scenario skew mitigation exists for)
    val big = Skew.zipfBig(spark, 1000000L)
    val dim = Skew.skewDim(spark)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // confs are read at ACTION time — run each plan fully under its own
      def under[A](skewJoin: Boolean)(f: => A): A = {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
        f
      }
      val naive = under(skewJoin = false)(
        (Skew.checksum(big.join(dim, "key")), big.join(dim, "key").count()))
      val aqe = under(skewJoin = true)(
        (Skew.checksum(big.join(dim, "key")), big.join(dim, "key").count()))
      val salted = under(skewJoin = false) {
        val j = Skew.saltedEquiJoin(big, dim, "key", 8)
        (Skew.checksum(j), j.count())
      }
      assert(Seq(naive, aqe, salted).distinct.size == 1,
        s"plans diverge: naive=$naive aqe=$aqe salted=$salted")
      assert(naive._2 == 1000000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }
  }
}
