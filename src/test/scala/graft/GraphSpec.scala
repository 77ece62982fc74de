package graft

import org.apache.spark.sql.functions._
import graft.graph.Graph

/** PageRank semantics (q75): pinned against an independent single-machine
  * reference implementation of the same fixed-point recurrence, plus
  * partition-independence and mass-conservation invariants. */
class GraphSpec extends SparkSpec {

  /** Reference implementation: plain Scala Maps, same integer recurrence as
    * Graph.pageRank (rank0 = Scale div N; r' = T + 85*(contrib+share) div
    * 100). Deliberately NOT sharing any code with the Spark version. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val r0 = Graph.Scale / n
    val t = 15L * r0 / 100L
    var rank = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val share = dangling / n
      val contrib = edges
        .map { case (u, v) => v -> rank(u) / out(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = nodes.map(v => v -> (t + 85L * (contrib.getOrElse(v, 0L) + share) / 100L)).toMap
    }
    rank
  }

  private def toDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  test("matches the independent reference on a cyclic graph with a dangling node") {
    // 1..4: cycle 1->2->3->1, 3->4 (4 dangles), plus a high-in-degree hub 2
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (3, 4), (4L -> 2L))
      .map { case (a, b) => (a.asInstanceOf[Long], b.asInstanceOf[Long]) }
    val expected = refPageRank(edges, 5)
    val got = Graph.pageRank(toDf(edges), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("dangling-only sink graph: star into one node") {
    val edges = (1L to 9L).map(i => (i, 100L))
    val expected = refPageRank(edges, 5)
    val got = Graph.pageRank(toDf(edges), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // the sink must out-rank every spoke
    assert(got(100L) > got(1L))
  }

  test("result is partitioning-independent") {
    val g = Graph.purchaseGraph(spark, sfDir)
    val a = Graph.pageRank(g, 3).orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Graph.pageRank(g.repartition(7, col("dst")), 3).orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("mass is conserved up to floor-division loss") {
    val g = Graph.purchaseGraph(spark, sfDir)
    val e = g.count()
    val ranks = Graph.pageRank(g, 5)
    val n = ranks.count()
    val total = ranks.agg(sum(col("rank"))).head().getLong(0)
    // every div floors, so mass only leaks DOWN; per round the loss is
    // bounded by one unit per edge (rank div outdeg, summed over outdeg
    // edges loses < outdeg) plus the damping div (1/node) plus the
    // dangling share div (1/node)
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale - 5L * (e + 2L * n), s"total=$total n=$n e=$e")
  }
}
