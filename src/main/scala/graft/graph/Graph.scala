package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Iterative graph analytics over a derived business graph — the second
  * iterative-loop operator family next to duplicate-group clustering
  * (Dedup.connectedComponents): PageRank by damped power iteration.
  *
  * The reference (d-smith/sfs3-kinesis) has no graph surface; this module is
  * part of the large-scale training-data extension (influence/centrality
  * scoring of a citation- or link-graph is a standard corpus-curation
  * signal). The graph here is derived from the TPC-H-ish tables: customers
  * link to the suppliers they bought from (orders ⋈ lineitem), suppliers
  * link back to customers who RETURNED items (`l_returnflag = 'R'`) — a
  * cyclic directed graph whose rank distribution is non-trivial on both
  * sides.
  *
  * Scale design: edge derivation is one equi-join + DISTINCT (one shuffle,
  * AQE-sized); each power iteration is one join on `src` + one
  * partial-aggregated groupBy on `dst` — O(|E|) per round with map-side
  * combine, the same shape GraphX/Pregel lowers to. The loop
  * `localCheckpoint`s per round to truncate lineage (a cluster deployment
  * uses `checkpoint` to HDFS) and scopes shuffle partitions to graph
  * volume, not corpus volume — same discipline as Dedup's CC loop.
  *
  * Exactness: ranks are FIXED-POINT longs (scale 1e9), all updates integer
  * (`div` floor on positives) — a float PageRank's accumulation order would
  * differ across partitionings and engines, but integer sums are
  * associative, so the DuckDB oracle (the same five iterations unrolled as
  * chained CTEs over hugeint arithmetic) hash-matches bit-for-bit. The
  * dangling-mass scalar per round is a deliberate driver-side aggregate
  * (one long per iteration, like CC's convergence sum), not a data
  * collect.
  */
object Graph {

  /** Fixed-point scale for ranks: 1e9 units = rank 1.0. */
  val Scale = 1000000000L

  /** Damping 0.85 expressed as integer arithmetic: d(x) = 85*x div 100. */
  private val Iters = 5

  /** Directed purchase/return graph. Supplier node ids are offset by 1e6 so
    * the two key spaces cannot collide. */
  def purchaseGraph(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val j = o.join(l, col("o_orderkey") === col("l_orderkey"))
    val fwd = j.select(col("o_custkey").as("src"),
      (col("l_suppkey") + 1000000L).as("dst"))
    val back = j.filter(col("l_returnflag") === "R")
      .select((col("l_suppkey") + 1000000L).as("src"), col("o_custkey").as("dst"))
    fwd.unionAll(back).distinct()
  }

  /** Damped PageRank over an (src, dst) edge frame, `iters` rounds of
    * power iteration in fixed-point long arithmetic. Returns (node, rank).
    *
    * rank_0 = Scale div N for every node;
    * rank_k(v) = T + 85*(Σ_{u→v} rank_{k-1}(u) div outdeg(u) + share) div 100
    * where T = 15*(Scale div N) div 100 is the teleport term and
    * share = (Σ over dangling u of rank_{k-1}(u)) div N redistributes
    * dangling mass. All divisions are positive-integer floor — exact and
    * order-independent.
    */
  def pageRank(edgesRaw: DataFrame, iters: Int = Iters): DataFrame = {
    val s = edgesRaw.sparkSession
    // Materialize the derived edge list ONCE, under the session's
    // corpus-scale confs (this is the only step that touches fact tables)
    // — deg/edges/nodes all hang off this checkpoint instead of re-running
    // the derivation per downstream materialization.
    val base = edgesRaw.localCheckpoint()
    // Iteration shuffles sized to GRAPH volume (nodes/edges), not the
    // corpus-scale session setting — the graph is a distilled fraction of
    // the fact table that produced it. AQE is off for the loop: each round
    // is a fixed tiny-stage shape where adaptive re-planning costs more
    // wall-clock than it saves (a cluster run over a big graph would leave
    // it on and size partitions accordingly). Via the refcounted helper
    // since r16 (thread-safe vs the naive save/restore).
    graft.sources.StoreMaint.withBatchConfs(s, 8) {
      val deg = base.groupBy(col("src"))
        .agg(count(lit(1)).as("outdeg")).localCheckpoint()
      // The src-keyed join partitioning survives the checkpoint, so every
      // round's contrib join is exchange-free on the (constant, |E|-sized)
      // edge side — only the |V|-sized rank frame moves per iteration.
      val edges = base.join(deg, "src").localCheckpoint()
      val nodes = base.select(col("src").as("node"))
        .unionAll(base.select(col("dst").as("node")))
        .distinct().localCheckpoint()
      val n = nodes.count()
      val r0 = Scale / n
      val teleport = 15L * r0 / 100L
      var ranks = nodes.select(col("node"), lit(r0).as("rank")).localCheckpoint()
      for (_ <- 1 to iters) {
        // ONE aggregation per round: the dangling-mass rows ride the same
        // shuffle as the edge contributions, keyed by a sentinel dst (-1
        // can never be a node id — custkeys are positive, suppkeys are
        // offset by 1e6). The round's single heavy action is the
        // lineage-truncating checkpoint of this frame; the share scalar is
        // then a trivial filter over the checkpointed rows (a one-row
        // broadcast, no second materialization chain). Folding the two
        // chains of the previous shape into one halves the sequential
        // driver barriers per round — the thing that made q75 degrade 10×
        // under host load while every peer query degraded ~2×.
        val agg = edges.join(ranks, edges("src") === ranks("node"))
          .select(col("dst"), expr("rank div outdeg").as("c"))
          .unionAll(ranks
            .join(deg, ranks("node") === deg("src"), "left_anti")
            .select(lit(-1L).as("dst"), col("rank").as("c")))
          .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
          .localCheckpoint()
        // global agg over the 0-or-1 sentinel rows: always exactly one
        // row, even when the graph has no dangling node at all
        val shareDf = agg.filter(col("dst") === -1L)
          .agg(coalesce(sum(col("contrib")), lit(0L)).as("dsum"))
          .select(expr(s"dsum div ${n}L").as("share"))
        ranks = nodes
          .join(agg.filter(col("dst") =!= -1L), nodes("node") === col("dst"), "left")
          .crossJoin(broadcast(shareDf))
          .select(col("node"),
            (lit(teleport) +
              expr("85 * (coalesce(contrib, 0L) + share) div 100"))
              .as("rank"))
      }
      // the loop leaves ranks as a SHALLOW plan over the last checkpoint
      // (join + project), so no final materialization is needed
      ranks
    }
  }

  // ---- q75: PageRank over the purchase/return graph -----------------------

  /** The DuckDB oracle unrolls the same five integer iterations as chained
    * CTEs (hugeint arithmetic; `//` is floor division on positives, same as
    * Spark `div`). Generated from the same constants so the two can never
    * drift. */
  private def oracleSql(iters: Int): String = {
    val base =
      """WITH edges_raw AS (
        |  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  UNION
        |  SELECT DISTINCT l.l_suppkey + 1000000 AS src, o.o_custkey AS dst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_returnflag = 'R'),
        |nodes AS (SELECT src AS node FROM edges_raw UNION SELECT dst FROM edges_raw),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges_raw GROUP BY src),
        |edges AS (SELECT e.src, e.dst, d.outdeg FROM edges_raw e JOIN deg d ON e.src = d.src),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS (SELECT node, (1000000000 // (SELECT n FROM nn)) AS rank FROM nodes)""".stripMargin
    val steps = (1 to iters).map { k =>
      val p = s"r${k - 1}"
      s""",
         |dang$k AS (SELECT COALESCE(SUM(r.rank), 0) // (SELECT n FROM nn) AS share
         |  FROM $p r WHERE NOT EXISTS (SELECT 1 FROM deg d WHERE d.src = r.node)),
         |c$k AS (SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS contrib
         |  FROM edges e JOIN $p r ON r.node = e.src GROUP BY e.dst),
         |r$k AS (SELECT n.node,
         |  (15 * (1000000000 // (SELECT n FROM nn))) // 100
         |   + (85 * (COALESCE(c.contrib, 0) + (SELECT share FROM dang$k))) // 100 AS rank
         |  FROM nodes n LEFT JOIN c$k c ON n.node = c.node)""".stripMargin
    }.mkString
    base + steps +
      s"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r$iters ORDER BY node"
  }

  val q75PageRank: Q = Q("q75_pagerank", oracleSql(Iters)) { (s, d) =>
    pageRank(purchaseGraph(s, d), Iters).orderBy(col("node"))
  }

  // ---- q101: triangle counting / local clustering coefficient -------------

  /** Per-node triangle count and local clustering coefficient over an
    * undirected edge frame `(a, b)` (distinct, a < b). Returns
    * (node, deg, triangles, lcc) with lcc = 2T / (deg·(deg−1)) rounded to
    * 6 places (0.0 for deg < 2).
    *
    * Scale design — degree-ordered orientation (Schank/Wagner; the same
    * trick Cohen's MapReduce triangle counter and Spark's GraphX use):
    * each undirected edge is directed from its lower-(deg, id) endpoint to
    * the higher, so every out-neighborhood has size O(√|E|) in the worst
    * case and wedge generation is Σ outdeg² = O(|E|^1.5) total instead of
    * Σ deg² (which a high-degree hub makes quadratic). All steps are
    * equi-joins / partial-aggregated groupBys on AQE-sized shuffles:
    * wedges join on the shared low endpoint, the closing edge check is an
    * equi-join on the (b, c) pair — no driver-side state, no hint on the
    * corpus-derived frames. The tri-corner fan-out is 3 rows per found
    * triangle — output-bounded.
    *
    * Exactness: degrees and triangle counts are integers; the only double
    * is the final lcc division (identical IEEE both engines, rounded).
    * The (deg, id) orientation total-orders nodes identically in Spark
    * (struct comparison) and DuckDB (row comparison), so wedge and
    * closing sets match exactly. */
  def triangleCount(edgesRaw: DataFrame): DataFrame = {
    // Materialize the (usually corpus-derived, expensive) edge generator
    // ONCE — deg, orientation, wedges and the closing join all reference
    // it, and without the checkpoint each reference re-runs the generator
    // (same discipline as pageRank's base checkpoint; measured 2.65 s →
    // ~0.7 s steady on the q101 near-dup graph at sf0.1).
    val ed = edgesRaw.select(col("a"), col("b")).localCheckpoint()
    val deg = ed.select(col("a").as("node")).unionAll(ed.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val da = deg.select(col("node").as("a"), col("deg").as("da"))
    val db = deg.select(col("node").as("b"), col("deg").as("db"))
    val aLower = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oe = ed.join(da, "a").join(db, "b").select(
      when(aLower, col("a")).otherwise(col("b")).as("src"),
      when(aLower, col("b")).otherwise(col("a")).as("dst"),
      when(aLower, col("db")).otherwise(col("da")).as("ddeg"))
    val e1 = oe.select(col("src").as("s1"), col("dst").as("tb"), col("ddeg").as("bdeg"))
    val e2 = oe.select(col("src").as("s2"), col("dst").as("tc"), col("ddeg").as("cdeg"))
    val wedges = e1.join(e2,
        col("s1") === col("s2") &&
          struct(col("bdeg"), col("tb")) < struct(col("cdeg"), col("tc")))
      .select(col("s1").as("ta"), col("tb"), col("tc"))
    val closing = oe.select(col("src").as("tb"), col("dst").as("tc"))
    val tri = wedges.join(closing, Seq("tb", "tc"))
      .select(col("ta"), col("tb"), col("tc"))
    val pn = tri.select(col("ta").as("node"))
      .unionAll(tri.select(col("tb").as("node")))
      .unionAll(tri.select(col("tc").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(pn, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6))
          .as("lcc"))
      .orderBy(col("node"))
  }

  /** Triangle CTEs over a preceding `ed(a, b)` CTE — the DuckDB mirror of
    * [[triangleCount]], appended after a pair-generating chain (q101 uses
    * [[graft.dedup.Dedup.embedPairCtes]]). */
  val triangleCtes: String =
    """deg AS (SELECT node, COUNT(*) AS deg FROM
      |  (SELECT a AS node FROM ed UNION ALL SELECT b AS node FROM ed) GROUP BY node),
      |oe AS (
      |  SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
      |         CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst,
      |         CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS ddeg
      |  FROM ed e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
      |tri AS (
      |  SELECT w.a, w.b, w.c FROM
      |    (SELECT e1.src AS a, e1.dst AS b, e1.ddeg AS bdeg, e2.dst AS c, e2.ddeg AS cdeg
      |     FROM oe e1 JOIN oe e2 ON e1.src = e2.src
      |       AND (e1.ddeg, e1.dst) < (e2.ddeg, e2.dst)) w
      |  JOIN oe e3 ON e3.src = w.b AND e3.dst = w.c),
      |pn AS (SELECT node, COUNT(*) AS triangles FROM
      |  (SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
      |   UNION ALL SELECT c AS node FROM tri) GROUP BY node)""".stripMargin

  private val triangleSelect =
    """SELECT d.node, d.deg, CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
      |  CASE WHEN d.deg < 2 THEN 0.0
      |       ELSE ROUND(2.0 * COALESCE(p.triangles, 0) / (d.deg * (d.deg - 1)), 6) END AS lcc
      |FROM deg d LEFT JOIN pn p ON p.node = d.node
      |ORDER BY d.node""".stripMargin

  /** q101: triangle count + local clustering coefficient of the
    * embedding near-duplicate graph (q44's quantizer-blocked pairs at a
    * looser 0.25 threshold, where the corpus forms real communities) —
    * the cluster-cohesion signal next to CC's cluster membership: a
    * near-dup component whose lcc is high is a true clique of rewrites; a
    * low-lcc component is a chain of borderline matches. Same composed
    * shape as q58 (graph op over a dedup candidate generator). */
  val q101TriangleCount: Q = Q(
    "q101_triangle_count",
    "WITH " + graft.dedup.Dedup.embedPairCtes(graft.sim.Similarity.NumCells, "0.25") +
      ",\ned AS (SELECT vec_a AS a, vec_b AS b FROM pairs),\n" +
      triangleCtes + "\n" + triangleSelect,
  ) { (s, d) =>
    triangleCount(
      graft.dedup.Dedup.embedNearDupPairs(s, d, graft.sim.Similarity.NumCells, 0.25)
        .select(col("vec_a").as("a"), col("vec_b").as("b")))
  }

  // ---- q126: label-propagation community detection -------------------------

  /** Synchronous label propagation (Raghavan et al. 2007, the LPA every
    * graph library ships) over an undirected edge frame `(a, b)`, run for
    * a FIXED `iters` rounds with deterministic tie-breaks: every node
    * starts labeled with its own id, and each round adopts the most
    * frequent label among its neighbors' previous-round labels, ties
    * broken by the smallest label. Fixing the round count and the
    * tie-break makes the asynchronous-and-random textbook algorithm
    * exactly mirrorable: the oracle unrolls the same rounds as CTEs
    * (ROW_NUMBER over (count DESC, label)).
    *
    * Scale shape: one round = the adjacency joined to a (node, label)
    * frame, a (node, label) count, and a per-node argmax window — all
    * keyed exchanges over O(|E|) rows, no driver state. The adjacency is
    * checkpointed ONCE (reused every round); per-round frames checkpoint
    * to cut lineage, and the loop scopes shuffle partitions to graph
    * volume (the q75/q45 iterative-loop discipline). Communities of the
    * near-dup graph = duplicate clusters with majority smoothing — the
    * robust-to-missing-edges sibling of q45's connected components. */
  def labelPropagation(edgesRaw: DataFrame, iters: Int): DataFrame = {
    val s = edgesRaw.sparkSession
    // shuffle partitions scoped to graph volume AND AQE off for the loop
    // (fixed tiny-stage rounds — the q75 pageRank discipline, via the
    // refcounted helper; r16 optimization round)
    graft.sources.StoreMaint.withBatchConfs(s, 8) {
      val ed = edgesRaw.select(col("a"), col("b")).localCheckpoint()
      val adj = ed.select(col("a").as("node"), col("b").as("nbr"))
        .unionAll(ed.select(col("b").as("node"), col("a").as("nbr")))
        .localCheckpoint()
      var labels = adj.select(col("node")).distinct()
        .select(col("node"), col("node").as("label"))
        .localCheckpoint()
      for (_ <- 1 to iters) {
        val w = Window.partitionBy(col("node"))
          .orderBy(col("cnt").desc, col("label"))
        labels = adj
          .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("node"), col("label"))
          .localCheckpoint()
      }
      labels.select(col("node"), col("label").as("community"))
        .orderBy(col("node"))
    }
  }

  private val LpIters = 3

  private def lpRoundCte(r: Int): String = {
    val prev = if (r == 1) "l0" else s"l${r - 1}"
    s"""l$r AS (
       |  SELECT node, label FROM (
       |    SELECT a.node, l.label, COUNT(*) AS cnt,
       |      ROW_NUMBER() OVER (PARTITION BY a.node
       |        ORDER BY COUNT(*) DESC, l.label) AS rn
       |    FROM adj a JOIN $prev l ON l.node = a.nbr
       |    GROUP BY a.node, l.label) WHERE rn = 1)""".stripMargin
  }

  /** q126: label-propagation communities of the embedding near-duplicate
    * graph (q101's edge set) after [[LpIters]] synchronous rounds — exact
    * oracle = the pair CTEs + the same rounds unrolled, so the adjacency,
    * every round's majority vote, and every tie-break are under the hash
    * check. */
  val q126LabelPropagation: Q = Q(
    "q126_label_propagation",
    "WITH " + graft.dedup.Dedup.embedPairCtes(graft.sim.Similarity.NumCells, "0.25") +
      """,
        |ed AS (SELECT vec_a AS a, vec_b AS b FROM pairs),
        |adj AS (SELECT a AS node, b AS nbr FROM ed
        |        UNION ALL SELECT b AS node, a AS nbr FROM ed),
        |l0 AS (SELECT DISTINCT node, node AS label FROM adj),
        |""".stripMargin +
      (1 to LpIters).map(lpRoundCte).mkString(",\n") +
      s"\nSELECT node, label AS community FROM l$LpIters ORDER BY node",
  ) { (s, d) =>
    labelPropagation(
      graft.dedup.Dedup.embedNearDupPairs(s, d, graft.sim.Similarity.NumCells, 0.25)
        .select(col("vec_a").as("a"), col("vec_b").as("b")), LpIters)
  }

  val all: Seq[Q] = Seq(q75PageRank, q101TriangleCount, q126LabelPropagation)
}
