package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Pins the custom codegen expressions against their builtin/HOF
  * equivalents — interpreted eval and codegen must agree, and graft_dot
  * must be bit-identical to the sequential-fold HOF form. */
class ArrayExprsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.1, -0.2), Seq(0.3, 0.7)),
    (Seq.empty[Double], Seq.empty[Double]),
  ).toDF("a", "b")

  test("graft_dot equals the sequential HOF fold bit-for-bit") {
    val rows = vecs.select(
      call_function("graft_dot", col("a"), col("b")).as("fast"),
      Dedup.dot(col("a"), col("b")).as("ref"),
    ).as[(Double, Double)].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("graft_intersect_size equals array_intersect size on sorted distinct arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)), // 2 common
      (Seq(1L, 2L), Seq(3L, 4L)),                  // disjoint
      (Seq(7L, 8L, 9L), Seq(7L, 8L, 9L)),          // identical
    ).toDF("x", "y")
    val rows = df.select(
      call_function("graft_intersect_size", col("x"), col("y")).as("fast"),
      size(array_intersect(col("x"), col("y"))).as("ref"),
    ).as[(Int, Int)].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("graft_minhash: 16 hashes, set-order invariant, identical sets agree") {
    val df = Seq(
      Tuple1(Seq(10L, 20L, 30L)),
      Tuple1(Seq(30L, 10L, 20L)), // same set, different order
      Tuple1(Seq(40L, 50L, 60L)),
    ).toDF("h")
    val sigs = df.select(call_function("graft_minhash", col("h")))
      .as[Seq[Long]].collect()
    assert(sigs.forall(_.size == 16))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val out = df.select(call_function("graft_dot", col("a"), col("b")))
      .collect()(0)
    assert(out.isNullAt(0))
  }
}
