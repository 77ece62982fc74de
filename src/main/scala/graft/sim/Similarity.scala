package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.dedup.Dedup.cosineFromDot
import graft.functions.ArrayExprs

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Three paths, mirroring production vector-search architecture:
  *  - **Brute-force top-k (q50)** — the exact baseline: the small fixed
  *    query set ships as a plan literal, scoring is one narrow codegen'd
  *    pass over the corpus, and per-query top-k is the bounded TopKHits
  *    aggregator (map-side partial top-k; shuffle size independent of
  *    corpus size). Linear scan — the right answer when the query set is
  *    small, and the re-rank stage of the ANN paths.
  *  - **LSH-bucketed ANN (q51)** — random-hyperplane signatures (sign of
  *    dot with fixed pseudo-random planes) bucket the corpus; queries
  *    probe only their own buckets across L signature tables, then
  *    exact-cosine re-rank inside the candidate set. Corpus side is
  *    computed once (narrow), the probe is an equi-join on
  *    (table_id, signature) — no linear scan per query.
  *  - **IVF ANN (q53)** — learned coarse quantizer (deterministic Lloyd
  *    step over the fixed-point centroid UDAF), cell-blocked probing.
  *
  * The reference has no similarity surface (SURVEY.md §2.b north-star).
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private val K = 5
  private val NumQueries = 8 // queries = vec_id < 8

  /** q50: exact brute-force cosine top-k per query vector. Cosine is rounded
    * to 6dp before ranking so Spark and DuckDB order identical values
    * (ties broken by vec_id). */
  val q50KnnBrute: Q = Q(
    "q50_knn_brute",
    s"""WITH e AS (SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
       |    ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos
       |  FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, label, cos, rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin,
  ) { (s, d) =>
    ArrayExprs.register(s)
    import graft.functions.Aggregators
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("n2", call_function("graft_dot", col("v"), col("v")))
    // The tiny fixed query set ships as a plan literal, so scoring is one
    // NARROW pass over the corpus — no join, no per-pair vector
    // materialization (the join formulation copied qv+v ~1 KB per scored
    // pair). Top-k per query via the bounded TopKHits aggregator: each
    // partition keeps at most k rows per query, the shuffle carries
    // k·partitions rows regardless of corpus size — the rank-window
    // formulation shuffled EVERY scored row to one task per query.
    val qs: Seq[(Long, Seq[Double], Double)] = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("v"), col("n2")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq, r.getDouble(2)))
      .toIndexedSeq
    val scored = Tables.fanOut(e)
      .select(col("vec_id").as("neighbor_id"), col("label"),
        explode(transform(typedLit(qs), q =>
          struct(q.getField("_1").as("query_id"),
            round(cosineFromDot(
              call_function("graft_dot", col("v"), q.getField("_2")),
              q.getField("_3"), col("n2")), 6).as("cos")))).as("qc"))
      .select(col("qc.query_id"), col("neighbor_id"), col("label"), col("qc.cos"))
      .filter(col("neighbor_id") =!= col("query_id"))
    scored.groupBy(col("query_id"))
      .agg(Aggregators.topKAgg(K)(col("cos"), col("neighbor_id"), col("label")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.hits")).as(Seq("pos", "h")))
      .select(col("query_id"), col("h.neighborId").as("neighbor_id"),
        col("h.label").cast("int").as("label"), col("h.cos").as("cos"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- random-hyperplane LSH ----------------------------------------------
  val NumTables = 4 // L signature tables
  val BitsPerTable = 6 // 6-bit signatures → ~corpus/64 candidates per probe-table
  val Dim = 64

  /** Fixed pseudo-random hyperplanes (seeded — the same planes on every
    * executor and every run), shipped into the plan as ONE nested-array
    * literal so the sign-bit computation is a compact pair of higher-order
    * functions, not a 2048-term unrolled expression (which blows up codegen
    * compile time — measured 28 s of fixed overhead on the unrolled form). */
  lazy val hyperplanes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumTables * BitsPerTable)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Sign bits of v against every hyperplane: array<long> of 0/1, length
    * NumTables*BitsPerTable. The inner dot is the codegen'd graft_dot. */
  private def signBits(v: Column): Column =
    transform(typedLit(hyperplanes), p =>
      when(call_function("graft_dot", v, p) > 0, lit(1L)).otherwise(lit(0L)))

  /** All (table_id, signature) probes from a materialized bit array: the
    * bits sliced into per-table groups, each packed into a long. Takes the
    * bit column (not the vector) so callers compute [[signBits]] once. */
  private def probes(bits: Column): Column =
    array((0 until NumTables).map { t =>
      struct(lit(t).as("table_id"),
        aggregate(slice(bits, t * BitsPerTable + 1, BitsPerTable),
          lit(0L), (acc, b) => acc * 2 + b).as("sig"))
    }: _*)

  /** q51: ANN top-k via LSH buckets + exact re-rank. Candidates are the
    * union over L tables of same-bucket vectors; the exact cosine then
    * ranks them. Approximate (bucket-dependent) → rows-only driver check;
    * SimilaritySpec pins recall ≥ 0.5 against q50 on the test corpus. */
  val q51AnnLsh: Q = Q.rowsOnly("q51_ann_lsh") { (s, d) =>
    ArrayExprs.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("n2", call_function("graft_dot", col("v"), col("v")))
      .withColumn("bits", signBits(col("v")))
    val corpus = e.select(col("vec_id"), col("label"), col("v"), col("n2"),
      explode(probes(col("bits"))).as("p"))
      .select(col("vec_id"), col("label"), col("v"), col("n2"),
        col("p.table_id"), col("p.sig"))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"),
        explode(probes(col("bits"))).as("p"))
      .select(col("query_id"), col("qv"), col("qn2"), col("p.table_id"), col("p.sig"))
    val cand = broadcast(queries)
      .join(Tables.fanOut(corpus),
        Seq("table_id", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("qn2"), col("vec_id").as("neighbor_id"),
        col("label"), col("v"), col("n2"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .withColumn("cos", round(
        cosineFromDot(call_function("graft_dot", col("qv"), col("v")),
          col("qn2"), col("n2")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), col("label").cast("int").as("label"),
        col("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q52: per-label embedding centroid via the custom typed
    * [[graft.functions.Aggregators.VectorCentroid]] UDAF (the
    * `Aggregator[IN,BUF,OUT]` row of SURVEY.md §2.b). One shuffle of
    * 520-byte buffers per (partition, label) — map-side partial agg means
    * the 100 TB corpus never moves. Fixed-point long sums make the result
    * bit-identical to the DuckDB oracle regardless of merge order. */
  val q52Centroid: Q = Q(
    "q52_centroid",
    """WITH x AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS val
      |  FROM embeddings)
      |SELECT CAST(label AS INT) AS label, CAST(pos AS BIGINT) AS pos,
      |       CAST(SUM(CAST(FLOOR(val*1e7 + 0.5) AS BIGINT)) AS DOUBLE)/1e7/COUNT(*) AS c,
      |       COUNT(*) AS n
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  ) { (s, d) =>
    import graft.functions.Aggregators
    val e = Tables.embeddings(s, d)
      .select(col("label"), asDouble(col("embedding")).as("v"))
    e.groupBy(col("label"))
      .agg(Aggregators.centroidAgg(col("v")).as("cs"))
      .select(col("label").cast("int").as("label"),
        posexplode(col("cs.sums")).as(Seq("pos0", "s")), col("cs.n").as("n"))
      .select(col("label"), (col("pos0") + 1).cast("long").as("pos"),
        (col("s").cast("double") / lit(Aggregators.Scale) / col("n")).as("c"),
        col("n"))
      .orderBy(col("label"), col("pos"))
  }

  // ---- IVF ANN (q53) ------------------------------------------------------
  val NumCells = 16 // coarse-quantizer cells
  val NumProbe = 2 // cells probed per query

  /** Scores of v against each centroid: cn2 − 2·v·c, which orders cells by
    * L2 distance to v (the ‖v‖² term is constant per row). `cents` is the
    * centroid matrix, `cn2s` the per-centroid squared norms, both shipped
    * as plan literals. */
  def cellScores(cents: Seq[Seq[Double]], cn2s: Seq[Double])(v: Column): Column =
    cellScoresCol(typedLit(cents), typedLit(cn2s))(v)

  /** [[cellScores]] over centroid COLUMNS — the same expression tree with
    * the quantizer flowing as data instead of plan literals. */
  def cellScoresCol(cents: Column, cn2s: Column)(v: Column): Column =
    zip_with(cents, cn2s,
      (c, cn) => cn - lit(2.0) * call_function("graft_dot", v, c))

  /** Seed coarse quantizer: centroids = the NumCells lowest-vec_id vectors
    * plus their squared norms. The collect ships NumCells×Dim doubles to
    * the driver — the standard IVF quantizer shape (quantizer tiny, corpus
    * not). Deterministic AND SQL-mirrorable: an oracle can rebuild the
    * identical centroids from the same table. Expects columns (vec_id, v).
    * Norms fold left from 0.0 like [[graft.functions.DotProductD]], so a
    * DuckDB `list_reduce` (head-seeded; +0.0 is exact) matches them
    * bit-for-bit. */
  def seedCentroids(e: DataFrame): (Seq[Seq[Double]], Seq[Double]) =
    seedCentroids(e, NumCells)

  def seedCentroids(e: DataFrame, numCells: Int): (Seq[Seq[Double]], Seq[Double]) = {
    val seeds: Seq[Seq[Double]] = e.filter(col("vec_id") < numCells)
      .orderBy(col("vec_id")).select(col("v")).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    (seeds, seeds.map(c => c.foldLeft(0.0)((acc, x) => acc + x * x)))
  }

  /** The `nprobe` nearest cells of v, deterministically tie-broken by
    * (score, cell id): sort struct(score, idx) pairs lexicographically and
    * keep the first nprobe — the multi-probe assignment used by cell-blocked
    * near-dup (q44) and mirrored exactly by an oracle ROW_NUMBER over
    * (score, cid). Narrow per-row work against plan literals, no shuffle. */
  def probeCells(cents: Seq[Seq[Double]], cn2s: Seq[Double], nprobe: Int)(
      v: Column): Column =
    probeCellsCol(typedLit(cents), typedLit(cn2s), nprobe)(v)

  /** [[probeCells]] over centroid COLUMNS — identical expression, identical
    * (score, cell-id) tie-break; only the quantizer's delivery differs. */
  def probeCellsCol(cents: Column, cn2s: Column, nprobe: Int)(v: Column): Column =
    ArrayExprs.letBind(cellScoresCol(cents, cn2s)(v)) { sc =>
      transform(
        slice(array_sort(zip_with(sc, sequence(lit(0), size(cents) - 1),
          (sco, i) => struct(sco.as("s"), i.as("i")))), 1, nprobe),
        p => p.getField("i"))
    }

  /** Cell count past which the quantizer must flow as DATA, not plan
    * literals: the literal path's plan size, analysis time and codegen
    * constant pool all grow linearly with NumCells (fine at ≤ a few
    * hundred, pathological at 10⁴+). */
  val LiteralCellLimit = 256

  /** The seed quantizer as a SINGLE-ROW frame `(__cents, __cn2s)`, built
    * without any driver collect — same seeding rule and the exact
    * 0.0-seeded norm fold of [[seedCentroids]], so the two delivery paths
    * are bit-identical. Broadcast-joined onto rows needing assignment. */
  def centroidRow(e: DataFrame, numCells: Int): DataFrame =
    e.filter(col("vec_id") < numCells)
      .agg(array_sort(collect_list(struct(col("vec_id"), col("v")))).as("p"))
      .select(
        transform(col("p"), x => x.getField("v")).as("__cents"),
        transform(col("p"), x =>
          aggregate(x.getField("v"), lit(0.0), (a, y) => a + y * y)).as("__cn2s"))

  /** Attach each row's `nprobe` probe cells, choosing the delivery by
    * scale: ≤ [[LiteralCellLimit]] cells ship as plan literals (one driver
    * collect of a tiny quantizer, zero joins); beyond that the centroid
    * matrix rides a broadcast single-row join and the scoring expression
    * reads it as a column — plan size stays O(1) in NumCells. Both paths
    * produce identical assignments (SimilaritySpec pins it). */
  def withProbeCells(df: DataFrame, e: DataFrame, numCells: Int, nprobe: Int,
      v: Column, out: String): DataFrame =
    if (numCells <= LiteralCellLimit) {
      val (cents, cn2s) = seedCentroids(e, numCells)
      df.withColumn(out, probeCells(cents, cn2s, nprobe)(v))
    } else
      df.crossJoin(broadcast(centroidRow(e, numCells)))
        .withColumn(out,
          probeCellsCol(col("__cents"), col("__cn2s"), nprobe)(v))
        .drop("__cents", "__cn2s")

  /** q53: IVF ANN — the classic inverted-file index, fully deterministic:
    *
    *  1. **Train** the coarse quantizer: seed centroids = the NumCells
    *     lowest vec_ids, then one Lloyd iteration where the cell means come
    *     from the fixed-point [[graft.functions.Aggregators.VectorCentroid]]
    *     UDAF — so the learned centroids are bit-identical regardless of
    *     partition layout or merge order (double k-means would not be).
    *     The collect ships NumCells×Dim doubles to the driver — the
    *     standard IVF shape: the quantizer is tiny, the corpus is not.
    *  2. **Index**: each vector's cell = argmin-distance centroid, a
    *     narrow per-row pass against the centroid literal (no shuffle).
    *  3. **Probe**: queries explode their NumProbe nearest cells and
    *     equi-join the index on cell id — candidates ≈ corpus×(nprobe/C)
    *     per query instead of a linear scan — then exact cosine re-ranks.
    *
    * Approximate (recall depends on the quantizer) → rows-only check;
    * SimilaritySpec pins recall against exact q50. */
  val q53AnnIvf: Q = Q.rowsOnly("q53_ann_ivf") { (s, d) =>
    ArrayExprs.register(s)
    import graft.functions.Aggregators
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("n2", call_function("graft_dot", col("v"), col("v")))

    val (seeds, seedN2s) = seedCentroids(e)

    def argminCell(cents: Seq[Seq[Double]], cn2s: Seq[Double])(v: Column): Column =
      ArrayExprs.letBind(cellScores(cents, cn2s)(v)) { sc =>
        (array_position(sc, array_min(sc)) - 1).cast("int")
      }

    // one Lloyd iteration, means via the deterministic fixed-point UDAF
    val cents: Seq[Seq[Double]] = e
      .withColumn("cell", argminCell(seeds, seedN2s)(col("v")))
      .groupBy(col("cell")).agg(Aggregators.centroidAgg(col("v")).as("cs"))
      .select(col("cell"),
        transform(col("cs.sums"),
          x => x.cast("double") / lit(Aggregators.Scale) / col("cs.n")).as("c"))
      .orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val cn2s: Seq[Double] = cents.map(c => c.map(x => x * x).sum)

    val indexed = Tables.fanOut(e)
      .withColumn("cell", argminCell(cents, cn2s)(col("v")))
    // queries probe their NumProbe best cells (ties include extras — still
    // deterministic); kth-best threshold via sorted scores
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
      .withColumn("probe", explode(
        ArrayExprs.letBind(cellScores(cents, cn2s)(col("qv"))) { sc =>
          filter(sequence(lit(0), lit(NumCells - 1)),
            i => element_at(sc, i + 1) <= element_at(array_sort(sc), NumProbe))
        }))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(queries)
      .join(indexed, col("probe") === col("cell") && col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("cos", round(
        cosineFromDot(call_function("graft_dot", col("qv"), col("v")),
          col("qn2"), col("n2")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("label").cast("int").as("label"), col("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q54: embedding normalization + int8 quantization — the storage /
    * serving transform of a vector pipeline (4× smaller than float32,
    * 8× smaller than the double working form). Fully narrow per-row
    * work. Exactness: both engines cast the same parquet floats to
    * double and fold sums sequentially from the left (Spark `aggregate`
    * seeded with 0.0 ≡ DuckDB `list_reduce` seeded with the head — adding
    * 0.0 is exact), so norm, division, and `floor(x·127+0.5)` are
    * bit-identical; the quantized vector round-trips through a CSV string
    * because parquet list columns don't survive the driver's pandas
    * row-equality check. The norm is let-bound — referenced raw inside
    * the transform lambda it would re-evaluate the whole fold per
    * element (64×). */
  val q54Quantize: Q = Q(
    "q54_quantize",
    """WITH e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
      |  FROM e)
      |SELECT vec_id, label, ROUND(nrm, 6) AS l2_norm,
      |  CASE WHEN nrm = 0 THEN NULL ELSE
      |    array_to_string(list_transform(v,
      |      x -> CAST(CAST(FLOOR(x / nrm * 127 + 0.5) AS BIGINT) AS VARCHAR)), ',')
      |  END AS quant_i8
      |FROM n ORDER BY vec_id""".stripMargin,
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("int").as("label"),
        asDouble(col("embedding")).as("v"))
    val quantized = ArrayExprs.letBind(
      sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x))) {
      nrm =>
        struct(
          round(nrm, 6).as("l2_norm"),
          // zero vector → no direction to quantize: NULL (pinned in the
          // oracle's CASE; without the guard Spark's non-ANSI NaN cast
          // would emit zeros while DuckDB errors — divergence, not a
          // shared answer)
          when(nrm === 0.0, lit(null).cast("string"))
            .otherwise(concat_ws(",", transform(col("v"),
              x => floor(x / nrm * 127 + 0.5).cast("long").cast("string"))))
            .as("quant_i8"))
    }
    e.select(col("vec_id"), col("label"), quantized.as("q"))
      .select(col("vec_id"), col("label"), col("q.l2_norm"), col("q.quant_i8"))
      .orderBy(col("vec_id"))
  }

  /** q55: deterministic negative sampling — for each anchor vector, k
    * pseudo-random negatives drawn from OTHER classes, ranked by
    * md5(anchor:candidate) (the q27 discipline: stable across runs,
    * engines, partitionings, and retries — a training pair set that
    * reproduces forever, unlike `rand()` sampling). The anchor set
    * broadcasts (a training batch is bounded); candidates shuffle once on
    * anchor id for the per-anchor rank. At corpus scale the md5 ordering
    * would first prefilter candidates to a hash band sized ~k·margin per
    * anchor, then rank only those — same expression, one extra cheap
    * filter. */
  val NumNegatives = 4

  val q55NegativeSampling: Q = Q(
    "q55_negative_sampling",
    s"""WITH anchors AS (
       |  SELECT vec_id AS a_id, label AS a_label FROM embeddings
       |  WHERE vec_id < $NumQueries),
       |ranked AS (
       |  SELECT a.a_id, e.vec_id AS neg_id, e.label AS neg_label,
       |    ROW_NUMBER() OVER (PARTITION BY a.a_id
       |      ORDER BY md5(a.a_id || ':' || e.vec_id), e.vec_id) AS rnk
       |  FROM anchors a JOIN embeddings e ON e.label != a.a_label)
       |SELECT a_id, neg_id, neg_label, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= $NumNegatives ORDER BY a_id, rnk""".stripMargin,
  ) { (s, d) =>
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    // no broadcast hint on the corpus-derived anchor side: AQE broadcasts
    // from its actual (bounded) size, and widening the anchor predicate
    // later can't silently cap the operator at driver memory
    val anchors = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("a_id"), col("label").as("a_label"))
    val w = Window.partitionBy(col("a_id")).orderBy(
      md5(concat(col("a_id").cast("string"), lit(":"),
        col("vec_id").cast("string"))),
      col("vec_id"))
    anchors.join(e, col("label") =!= col("a_label"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= NumNegatives)
      .select(col("a_id"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"), col("rnk"))
      .orderBy(col("a_id"), col("rnk"))
  }

  // ---- Product quantization (q74) -----------------------------------------

  val PqSubspaces = 8
  val PqSubDim = 8 // 8 × 8 = the 64-dim embedding
  val PqCodebook = 16 // centroids per subspace (seed vectors, like the IVF quantizer)
  private val PqTopK = 5

  /** q74: product-quantization ANN (Jégou et al., TPAMI'11 — the public
    * memory-compression path production vector search uses when vectors no
    * longer fit): the 64-dim embedding splits into 8×8-dim subspaces, each
    * with its own 16-centroid codebook (seed quantizer, like q44/q53), so
    * a vector compresses 512 B → 8 CODE BYTES; search is the asymmetric
    * distance computation — per query, one 8×16 lookup table of exact
    * subspace distances, then each vector's approximate distance is 8
    * table lookups summed. The corpus pass reads only the codes (at scale
    * the 8-byte codes are the resident index; raw vectors stay in cold
    * storage for re-ranking), and the per-query work is a narrow
    * codegen'd scan — the LUT rides the plan as literals the way q50's
    * queries do.
    *
    * EXACT oracle despite the approximation: codebooks are
    * seed-deterministic, encode argmin is min-by-(score, cid) (struct
    * array_min ≡ ROW_NUMBER over (score, cid)), every distance is an
    * ascending fold (`list_reduce` ≡ the driver-side Scala loops,
    * CLAUDE.md recipe), and ADC sums its 8 terms in FIXED m-order as an
    * expression on both engines — never a float aggregate whose
    * accumulation order could differ on same-code ties. */
  val q74AnnPq: Q = Q(
    "q74_ann_pq", {
      val sd = PqSubDim; val cbn = PqCodebook
      val encwCols = (0 until PqSubspaces)
        .map(m => s"MAX(CASE WHEN m=$m THEN code END) AS c$m")
        .mkString(",\n    ")
      val adcExpr = (0 until PqSubspaces)
        .map(m => s"l.ds[${m * cbn}+w.c$m+1]").mkString(" + ")
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |cb AS (
         |  SELECT m.m, e.vec_id AS cid, e.v[m.m*$sd+1 : m.m*$sd+$sd] AS c,
         |    list_reduce(list_transform(range(1, $sd+1),
         |      i -> e.v[m.m*$sd+i] * e.v[m.m*$sd+i]), (a,b) -> a+b) AS cn2
         |  FROM e, LATERAL (SELECT unnest(range(0, $PqSubspaces)) AS m) m
         |  WHERE e.vec_id < $cbn),
         |enc AS (
         |  SELECT vec_id, m, cid AS code FROM (
         |    SELECT e.vec_id, cb.m, cb.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m ORDER BY
         |        cb.cn2 - 2 * list_reduce(list_transform(range(1, $sd+1),
         |          i -> e.v[cb.m*$sd+i] * cb.c[i]), (a,b) -> a+b),
         |        cb.cid) AS rn
         |    FROM e, cb)
         |  WHERE rn = 1),
         |encw AS (SELECT vec_id,
         |    $encwCols
         |  FROM enc GROUP BY vec_id),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
         |lut AS (
         |  SELECT q.qid, cb.m, cb.cid,
         |    list_reduce(list_transform(range(1, $sd+1),
         |      i -> (q.qv[cb.m*$sd+i] - cb.c[i]) * (q.qv[cb.m*$sd+i] - cb.c[i])),
         |      (a,b) -> a+b) AS d2
         |  FROM q, cb),
         |lutq AS (SELECT qid, list(d2 ORDER BY m, cid) AS ds FROM lut GROUP BY qid),
         |adc AS (
         |  SELECT l.qid, w.vec_id, $adcExpr AS dist
         |  FROM encw w, lutq l),
         |ranked AS (
         |  SELECT qid, vec_id, dist,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
         |  FROM adc WHERE qid != vec_id)
         |SELECT qid, rnk, vec_id, ROUND(dist, 6) AS adc_dist
         |FROM ranked WHERE rnk <= $PqTopK ORDER BY qid, rnk""".stripMargin
    },
  ) { (s, d) =>
    ArrayExprs.register(s)
    val plain = Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // codebooks: seed vectors' sub-slices + norms; norms and LUTs use
    // ascending Scala loops — the same fold order as the oracle's
    // list_reduce, so every distance is bit-identical across engines
    val (seeds, _) = seedCentroids(plain, PqCodebook)
    val cent: Array[Array[Array[Double]]] =
      Array.tabulate(PqSubspaces, PqCodebook) { (m, c) =>
        seeds(c).slice(m * PqSubDim, (m + 1) * PqSubDim).toArray
      }
    val cn2: Array[Array[Double]] = cent.map(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < PqSubDim) { acc += c(i) * c(i); i += 1 }
      acc
    })
    val queries = plain.filter(col("vec_id") < NumQueries).orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def lutFor(q: Array[Double]): Seq[Double] =
      for { m <- 0 until PqSubspaces; c <- 0 until PqCodebook } yield {
        var acc = 0.0; var i = 0
        while (i < PqSubDim) {
          val dlt = q(m * PqSubDim + i) - cent(m)(c)(i)
          acc += dlt * dlt; i += 1
        }
        acc
      }
    // ONE encode pass: per subspace, argmin = struct array_min over the 16
    // (score, cid) pairs — min-by-(score, cid), exactly the oracle's
    // ROW_NUMBER pick; the sub-slice is let-bound (16 dots, one slice)
    val coded = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id") +: (0 until PqSubspaces).map { m =>
        ArrayExprs.letBind(slice(col("v"), m * PqSubDim + 1, PqSubDim)) { sb =>
          array_min(array((0 until PqCodebook).map { c =>
            struct(
              (lit(cn2(m)(c)) - lit(2.0) *
                call_function("graft_dot", sb, typedLit(cent(m)(c).toSeq))).as("score"),
              lit(c).as("cid"))
          }: _*)).getField("cid")
        }.as(s"c$m")
      }: _*)
    // ADC: per query a FIXED-ORDER 8-term sum of LUT lookups (plan
    // literals), all queries evaluated in the same single corpus pass
    val withDists = coded.select(col("vec_id") +: queries.map { case (qid, qv) =>
      val lut = typedLit(lutFor(qv))
      (0 until PqSubspaces)
        .map(m => element_at(lut, col(s"c$m") + lit(m * PqCodebook) + 1))
        .reduce(_ + _).as(s"d$qid")
    }: _*)
    val long = withDists.select(col("vec_id"),
        explode(array(queries.map { case (qid, _) =>
          struct(lit(qid).as("qid"), col(s"d$qid").as("dist"))
        }: _*)).as("p"))
      .select(col("p.qid"), col("vec_id"), col("p.dist"))
      .filter(col("qid") =!= col("vec_id"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    long.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= PqTopK)
      .select(col("qid"), col("rnk"), col("vec_id"),
        round(col("dist"), 6).as("adc_dist"))
      .orderBy(col("qid"), col("rnk"))
  }

  // ---- q77: k-means embedding clustering (Lloyd iterations) ---------------

  /** K-means state after `iters` Lloyd rounds: (vec_id, cluster, dist2) —
    * the semantic-clustering primitive of a training-data pipeline (topic
    * bucketing, diversity sampling, the coarse quantizer ANN training).
    *
    * Everything runs in FIXED-POINT LONG space (coordinates scaled 1e6):
    * a float k-means' accumulation order would differ across partitionings
    * and engines, but integer sums are associative, so assignments,
    * centroid updates AND the final distances are bit-identical to the
    * DuckDB oracle (the same `iters` rounds unrolled as chained CTEs).
    * Centroid means use an offset floor division — `(sum + n·1e6) div n −
    * 1e6` — because Spark `div` truncates toward zero while DuckDB `//`
    * floors: offsetting the numerator positive makes them agree on
    * negative sums. Ties in the argmin break on (dist2, cid), the
    * documented q44/q74 recipe (min-of-struct ≡ ROW_NUMBER). Empty
    * clusters keep their previous centroid.
    *
    * Scale: one Lloyd round = a K-row broadcast-size cross join (AQE
    * decides; K is a constant knob) + one partial-aggregated shuffle of
    * K×D update rows — the textbook distributed Lloyd. The loop
    * localCheckpoints per round like the CC/PageRank iteratives; a
    * cluster run would `checkpoint` to HDFS. */
  def kmeans(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    // fixed-point encode once; init: the k smallest vec_ids seed centroids
    val x = vecs.select(col("vec_id"),
      transform(col("embedding"),
        v => floor(v * 1000000d + 0.5d).cast("long")).as("X"))
      .localCheckpoint()
    var cent = x.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("X").as("C"))
      .localCheckpoint()
    // Assignment without an n×k row blow-up: the centroid matrix is
    // BOUNDED (k rows), so it rides a broadcast single-row array and each
    // vector's argmin is one expression — n rows stay n rows, no shuffle.
    // (The previous crossJoin+groupBy form shuffled n×k rows each
    // carrying the 64-long array — the 33×-at-10× path ScaleProbe caught
    // once q129 made k a scale knob.) min-struct over (dist2, cid) keeps
    // the exact q77 tie-break, so results are bit-identical.
    def assigned = {
      val centRow = cent
        .agg(array_sort(collect_list(struct(col("cid"), col("C")))).as("cs"))
      x.crossJoin(broadcast(centRow))
        .select(col("vec_id"), col("X"),
          array_min(transform(col("cs"), c =>
            struct(
              aggregate(zip_with(col("X"), c.getField("C"),
                (a, b) => (a - b) * (a - b)),
                lit(0L), (acc, v) => acc + v).as("dist2"),
              c.getField("cid").as("cid")))).as("m"))
        .select(col("vec_id"), col("X"),
          col("m.cid").as("cluster"), col("m.dist2").as("dist2"))
    }
    for (_ <- 1 until iters) {
      val a = assigned
      val upd = a.select(col("cluster"), posexplode(col("X")).as(Seq("i", "v")))
        .groupBy(col("cluster"), col("i"))
        .agg(expr("(sum(v) + count(1) * 1000000L) div count(1) - 1000000L")
          .as("mean"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("mean")))),
          p => p("mean")).as("Cnew"))
      cent = cent.join(upd, cent("cid") === upd("cluster"), "left")
        .select(col("cid"), coalesce(col("Cnew"), col("C")).as("C"))
        .localCheckpoint()
    }
    assigned.select(col("vec_id"), col("cluster"), col("dist2"))
  }

  private def kmeansOracle(k: Int, iters: Int, dims: Int): String = {
    val base =
      s"""WITH vecs AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS X
         |  FROM embeddings),
         |cent0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, X AS C FROM vecs WHERE vec_id < $k)""".stripMargin
    def assign(r: Int) =
      s""",
         |d$r AS (
         |  SELECT v.vec_id, v.X, c.cid,
         |    CAST(list_sum(list_transform(range(1, ${dims + 1}), i -> (v.X[i] - c.C[i]) * (v.X[i] - c.C[i]))) AS BIGINT) AS dist2
         |  FROM vecs v CROSS JOIN cent${r - 1} c),
         |a$r AS (
         |  SELECT vec_id, X, cid, dist2,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
         |  FROM d$r)""".stripMargin
    def update(r: Int) =
      s""",
         |cent$r AS (
         |  SELECT p.cid, COALESCE(m.C, p.C) AS C
         |  FROM cent${r - 1} p LEFT JOIN (
         |    SELECT cid, list(mean ORDER BY i) AS C FROM (
         |      SELECT a.cid, u.i,
         |        (SUM(a.X[u.i]) + COUNT(*) * 1000000) // COUNT(*) - 1000000 AS mean
         |      FROM (SELECT cid, X FROM a$r WHERE rn = 1) a,
         |           LATERAL (SELECT UNNEST(range(1, ${dims + 1})) AS i) u
         |      GROUP BY a.cid, u.i) GROUP BY cid) m ON p.cid = m.cid)""".stripMargin
    (1 to iters).map(r =>
      assign(r) + (if (r < iters) update(r) else "")).mkString(base, "",
      s"\nSELECT vec_id, cid AS cluster, dist2 FROM a$iters WHERE rn = 1 ORDER BY vec_id")
  }

  /** [[kmeansOracle]]'s CTE chain only, closed by a `km(vec_id, cluster)`
    * CTE — for composed oracles (q129) that consume the clustering. */
  private def kmeansCtes(k: Int, iters: Int, dims: Int): String = {
    val full = kmeansOracle(k, iters, dims)
    full.substring(0, full.lastIndexOf("\nSELECT ")) +
      s",\nkm AS (SELECT vec_id, cid AS cluster FROM a$iters WHERE rn = 1)"
  }

  val q77KMeans: Q = Q("q77_kmeans", kmeansOracle(8, 3, 64)) { (s, d) =>
    kmeans(Tables.embeddings(s, d), 8, 3).orderBy(col("vec_id"))
  }

  // ---- q128: distributed KNN join (corpus × corpus, cell-blocked) ---------

  private val KnnJoinK = 3

  /** q128: every corpus vector finds its top-[[KnnJoinK]] neighbors — the
    * KNN JOIN, the primitive under SemDeDup-style semantic dedup and
    * near-dup graph construction. The query side is the WHOLE corpus, so
    * the bounded-batch forms (q50's plan-literal queries, q107/q121's
    * collected LUTs) don't apply: both sides stay DISTRIBUTED. Each
    * vector multi-probes its 2 nearest coarse cells, each vector is
    * assigned to its 1 nearest cell, and candidates are the cell
    * equi-join of the two — one shuffle keyed on cell, candidate count
    * ~ n²·nprobe/cells, held flat at scale by the cell-count knob (the
    * q44 rule). Exact cosine + a per-query rank window finish it. A
    * query's 2 probe cells are distinct and a neighbor sits in exactly 1
    * cell, so no pair duplicates exist — no DISTINCT needed on either
    * engine.
    *
    * Exact oracle: the q107 recipe with the probe side widened to every
    * vector — seed quantizer, (score, cid) tie-breaks, ROUND(cos, 6) and
    * the (cos DESC, id) rank window all mirrored bit-for-bit. */
  val q128KnnJoin: Q = Q(
    "q128_knn_join",
    s"""WITH e AS (SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cid, v AS c,
       |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i]*v[i]),
       |                (a, b) -> a + b) AS cn2
       |  FROM e WHERE vec_id < $NumCells),
       |sc AS (
       |  SELECT e.vec_id, c.cid,
       |    c.cn2 - 2 * list_reduce(
       |      list_transform(range(1, len(e.v)+1), i -> e.v[i]*c.c[i]),
       |      (a, b) -> a + b) AS s
       |  FROM e, cents c),
       |assign AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cid) AS rn
       |    FROM sc) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cid) AS rn
       |    FROM sc) WHERE rn <= 2),
       |ranked AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id, n.label,
       |    ROUND(list_cosine_similarity(q.v, n.v), 6) AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(list_cosine_similarity(q.v, n.v), 6) DESC,
       |               a.vec_id) AS rank
       |  FROM probes p
       |  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |  JOIN e q ON q.vec_id = p.query_id
       |  JOIN e n ON n.vec_id = a.vec_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, label,
       |  cos
       |FROM ranked WHERE rank <= $KnnJoinK
       |ORDER BY query_id, rank""".stripMargin,
  ) { (s, d) => knnJoin(s, d, NumCells, KnnJoinK) }

  /** [[q128KnnJoin]]'s body with the cell count as the scale knob (the
    * q44 rule: cells grow with the corpus so per-cell candidate counts —
    * the n²·nprobe/cells term — stay put; ScaleProbe runs 16→160). */
  def knnJoin(s: SparkSession, d: String, numCells: Int,
      k: Int): DataFrame = {
    ArrayExprs.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("v"))
      .withColumn("n2", graft.dedup.Dedup.sqNorm(col("v")))
    val probed = withProbeCells(e, e, numCells, 2, col("v"), "probe")
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n2").as("qn2"), explode(col("probe")).as("cell"))
    val assigned = withProbeCells(e, e, numCells, 1, col("v"), "c1")
      .select(element_at(col("c1"), 1).as("cell"), col("vec_id"),
        col("label"), col("v"), col("n2"))
    val cos = round(graft.dedup.Dedup.cosineFromDot(
      call_function("graft_dot", col("qv"), col("v")),
      col("qn2"), col("n2")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probed.join(assigned,
        probed("cell") === assigned("cell") &&
          assigned("vec_id") =!= probed("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("label"), cos.as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("label"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- q129: semantic dedup (SemDeDup — cluster, then dedup within) -------

  private val SemDedupThr = "0.25"

  /** q129: SemDeDup (Abbas et al. 2023 — the public semantic-dedup recipe
    * for web-scale training data): k-means the embedding space, then
    * within each cluster drop every vector that has a smaller-id partner
    * with cosine ≥ threshold, keeping one representative per semantic
    * neighborhood. The clustering IS the blocking — the quadratic term is
    * n²/k per cluster, held flat at scale by growing k with the corpus
    * (the same knob rule as the cells; here k=8 over the demo corpus).
    * Output: (vec_id, cluster, dup_of = the minimum dropping partner,
    * keep). The cosine-≥-threshold predicate sits INSIDE the pair join's
    * condition, so non-duplicate pairs are never materialized (the
    * q41/q44 discipline).
    *
    * Exact oracle: q77's fixed-point Lloyd CTEs ([[kmeansCtes]] — already
    * bit-identical across engines) composed with the mirrored pair
    * predicate and a per-victim MIN aggregate; ROUND(cos, 6) both sides. */
  val q129SemanticDedup: Q = Q(
    "q129_semantic_dedup",
    "WITH " + kmeansCtes(8, 3, 64).stripPrefix("WITH ") +
      s""",
         |e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |dup AS (
         |  SELECT b.vec_id, MIN(a.vec_id) AS dup_of
         |  FROM km a JOIN km b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  JOIN e ea ON ea.vec_id = a.vec_id
         |  JOIN e eb ON eb.vec_id = b.vec_id
         |  WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= $SemDedupThr
         |  GROUP BY b.vec_id)
         |SELECT k.vec_id, k.cluster, d.dup_of, d.dup_of IS NULL AS keep
         |FROM km k LEFT JOIN dup d ON d.vec_id = k.vec_id
         |ORDER BY k.vec_id""".stripMargin,
  ) { (s, d) => semanticDedup(s, d, 8, SemDedupThr.toDouble) }

  /** [[q129SemanticDedup]]'s body with the cluster count as the scale
    * knob (per-cluster pair work is n²/k — k grows with the corpus;
    * ScaleProbe runs 8→80). */
  def semanticDedup(s: SparkSession, d: String, k: Int,
      thr: Double): DataFrame = {
    ArrayExprs.register(s)
    val km = kmeans(Tables.embeddings(s, d), k, 3)
      .select(col("vec_id"), col("cluster")).localCheckpoint()
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n2", graft.dedup.Dedup.sqNorm(col("v")))
    val side = km.join(e, "vec_id")
    val a = side.select(col("vec_id").as("a_id"), col("cluster"),
      col("v").as("av"), col("n2").as("an2"))
    val b = side.select(col("vec_id").as("b_id"),
      col("cluster").as("b_cluster"), col("v").as("bv"),
      col("n2").as("bn2"))
    val cos = round(graft.dedup.Dedup.cosineFromDot(
      call_function("graft_dot", col("av"), col("bv")),
      col("an2"), col("bn2")), 6)
    val dup = a.join(b,
        col("cluster") === col("b_cluster") &&
          col("a_id") < col("b_id") && cos >= lit(thr))
      .groupBy(col("b_id")).agg(min(col("a_id")).as("dup_of"))
      .select(col("b_id").as("vec_id"), col("dup_of"))
    km.join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
      .orderBy(col("vec_id"))
  }

  /** q129's CANDIDATE plane ALONE (the q48-decomposition discipline, r14
    * verdict item 6): k-means clustering + the same-cluster id-ordered
    * pair STRUCTURE, NO cosine verify — timed separately by ScaleProbe so
    * a q129 growth drift is attributable to candidate volume (clusters
    * scale with the corpus: per-cluster pairs ~ density·n, expected
    * ~linear at 10×) vs the per-pair dot products this frame never runs.
    * The kmeans cost is part of the candidate plane by design — the
    * clustering IS the blocking. */
  def semanticDedupCandidates(s: SparkSession, d: String,
      k: Int): DataFrame = {
    val km = kmeans(Tables.embeddings(s, d), k, 3)
      .select(col("vec_id"), col("cluster")).localCheckpoint()
    km.select(col("vec_id").as("a_id"), col("cluster"))
      .join(km.select(col("vec_id").as("b_id"),
        col("cluster").as("b_cluster")),
        col("cluster") === col("b_cluster") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
  }

  val all: Seq[Q] = Seq(q50KnnBrute, q51AnnLsh, q52Centroid, q53AnnIvf,
    q54Quantize, q55NegativeSampling, q74AnnPq, q77KMeans, q128KnnJoin,
    q129SemanticDedup)
}
