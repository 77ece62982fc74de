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

  test("graft_bpe_apply: single-pass fold == per-merge window rounds, adversarial runs/overlaps") {
    import org.apache.spark.sql.expressions.Window
    val shim = org.apache.spark.sql.graftshim.PlanBridge
    // adversarial sequences: odd runs ([b,b,b] folds to [b_b] under the
    // round semantics), overlapping pairs, chained merges where a later
    // merge consumes an earlier merge's output, empty and 1-token docs
    val docs = Seq(
      (1L, "a b a b"), (2L, "b b b"), (3L, "a a b"), (4L, "a b b"),
      (5L, "x a b y a b"), (6L, "a"), (7L, "a_b c a b c"),
      (8L, "b a b a b a"), (9L, "c c c c"), (10L, "a b c a b c"),
    ).toDF("doc_id", "text")
    val table = Seq(("a", "b"), ("a_b", "c"), ("b", "b"))
    // reference: one lead/lag window round per merge over exploded tokens
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    var t = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\\s+")).as(Seq("i", "w")))
    table.foreach { case (a, b) =>
      t = t.select(col("doc_id"), col("i"), col("w"),
          lead(col("w"), 1).over(byDoc).as("nx"),
          lag(col("w"), 1).over(byDoc).as("pv"))
        .filter(col("pv").isNull || !(col("pv") === a && col("w") === b))
        .select(col("doc_id"), row_number().over(byDoc).as("i"),
          when(col("w") === a && col("nx").isNotNull && col("nx") === b,
            lit(s"${a}_$b")).otherwise(col("w")).as("w"))
    }
    val ref = t.groupBy(col("doc_id"))
      .agg(array_join(array_sort(collect_list(struct(col("i"), col("w"))))
        .getField("w"), " ").as("toks"))
      .orderBy(col("doc_id")).as[(Long, String)].collect()
    val fold = docs.select(col("doc_id"),
        array_join(shim.column(graft.functions.BpeApply(
          shim.expression(split(col("text"), "\\s+")), table)), " ").as("toks"))
      .orderBy(col("doc_id")).as[(Long, String)].collect()
    assert(fold.toSeq == ref.toSeq)
    // and the expected nasty-run results, pinned literally
    val byId = fold.toMap
    assert(byId(2L) == "b_b") // odd run folds lossy, exactly like the round
    assert(byId(1L) == "a_b a_b")
    assert(byId(4L) == "a_b b") // drop uses ORIGINAL left neighbor
    assert(byId(10L) == "a_b_c a_b_c") // later merge consumes earlier output
  }
}
