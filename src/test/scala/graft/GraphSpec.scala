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

  // ---- triangle counting (q101) -------------------------------------------

  /** Independent reference: brute-force enumeration of all node triples.
    * Deliberately shares no code (or orientation trick) with the Spark
    * version. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tri = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((a, c)) && es((b, c))
    } yield (a, b, c)
    val perNode = tri.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    nodes.map(n => n -> perNode.getOrElse(n, 0L)).toMap
  }

  private def triDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toDF("a", "b")
  }

  test("triangles: matches brute-force reference on K4 plus a pendant chain") {
    // K4 on 1..4 (4 triangles, lcc 1.0 per node), chain 4-5-6 (no triangles)
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (4, 5), (5, 6))
    val expected = refTriangles(edges)
    val rows = Graph.triangleCount(triDf(edges)).collect()
    val got = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
    val lcc = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(lcc(1L) == 1.0 && lcc(2L) == 1.0 && lcc(3L) == 1.0)
    assert(lcc(5L) == 0.0 && lcc(6L) == 0.0) // deg-2 open wedge and deg-1 leaf
    // node 4: deg 4 (K4 neighbors + pendant 5), 3 triangles → 2·3/(4·3)
    assert(lcc(4L) == 0.5)
  }

  test("triangles: matches brute-force reference on a hub-heavy random graph") {
    // a hub (0) connected to everything plus a pseudo-random sparse layer —
    // exercises the degree orientation on exactly the shape that breaks
    // unoriented wedge counting
    val rnd = new scala.util.Random(7)
    val layer = for (_ <- 1 to 60) yield {
      val x = rnd.nextInt(20) + 1; val y = rnd.nextInt(20) + 1
      (x.toLong, y.toLong)
    }
    val edges = ((1 to 20).map(i => (0L, i.toLong)) ++ layer.filter(e => e._1 != e._2))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val expected = refTriangles(edges)
    val got = Graph.triangleCount(triDf(edges)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("triangles: result is partitioning-independent") {
    val edges = graft.dedup.Dedup
      .embedNearDupPairs(spark, sfDir, graft.sim.Similarity.NumCells, 0.25)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    val one = Graph.triangleCount(edges).collect().toSeq
    val two = Graph.triangleCount(edges.repartition(7, col("b"))).collect().toSeq
    assert(one == two)
    assert(one.map(_.getLong(2)).sum > 0, "demo graph should contain triangles")
  }

  // ---- label propagation ---------------------------------------------------

  /** Independent synchronous-LPA reference: every node adopts the most
    * frequent previous-round neighbor label, smallest label on ties. */
  private def refLabelProp(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = adj.map { case (n, nbrs) =>
        val cnt = nbrs.map(labels).groupBy(identity).view
          .mapValues(_.size).toMap
        n -> cnt.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    labels
  }

  test("label propagation: matches the reference on two cliques and a bridge") {
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (1, 4), (2, 3), (2, 4),
      (3, 4), (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
      (4, 10))
    val got = Graph.labelPropagation(triDf(edges), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refLabelProp(edges, 3))
    // the two cliques must resolve to different communities
    assert(got(1L) != got(11L),
      "bridge merged the cliques — majority vote not working")
    assert(Seq(1L, 2L, 3L).map(got).distinct.size == 1)
    assert(Seq(11L, 12L, 13L).map(got).distinct.size == 1)
  }

  test("label propagation: matches the reference on a hub-heavy random graph") {
    val rnd = new scala.util.Random(11)
    val layer = for (_ <- 1 to 60) yield {
      val x = rnd.nextInt(20) + 1; val y = rnd.nextInt(20) + 1
      (x.toLong, y.toLong)
    }
    val edges = ((1 to 20).map(i => (0L, i.toLong)) ++
      layer.filter(e => e._1 != e._2))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val got = Graph.labelPropagation(triDf(edges), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refLabelProp(edges, 3))
  }

  test("label propagation: result is partitioning-independent") {
    val edges = graft.dedup.Dedup
      .embedNearDupPairs(spark, sfDir, graft.sim.Similarity.NumCells, 0.25)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    val one = Graph.labelPropagation(edges, 3).collect().toSeq
    val two = Graph.labelPropagation(edges.repartition(7, col("b")), 3)
      .collect().toSeq
    assert(one == two)
    assert(one.map(_.getLong(1)).distinct.size > 1,
      "demo graph collapsed to one community — vacuous")
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
