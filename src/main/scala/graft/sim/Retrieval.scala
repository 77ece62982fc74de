package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.dedup.Dedup.cosineFromDot
import graft.functions.ArrayExprs
import graft.text.TextAnalysis

/** Hybrid retrieval — the standard two-leg search stack composed from the
  * operators this engine already proves separately: a LEXICAL leg (BM25,
  * q102's fixed-point scoring core) and a SEMANTIC leg (exact cosine over
  * the embedding column, q50's literal-query scan), fused per query by
  * Reciprocal Rank Fusion (Cormack et al., SIGIR'09):
  * `rrf(d) = Σ_leg 1 / (60 + rank_leg(d))`.
  *
  * Query items are the 8 fixed ids — each contributes its document's top
  * terms to the lexical leg and its embedding to the semantic leg (the
  * "query has both a text and a vector" shape of production hybrid
  * search). Both legs exclude the query item itself.
  *
  * Scale shape: the lexical leg is the q102 aggregation (token joins,
  * micro-int weights, map-side combined); the semantic leg is one narrow
  * corpus scan against 8 plan-literal vectors; fusion is a per-query
  * FULL OUTER join of two ≤k-row rank lists — driver-bounded work
  * nowhere, shuffles keyed by (query, doc). RRF ranks are position-only,
  * so the fusion stays exact even though the leg scores live on
  * different scales — exactly why production stacks fuse on rank. */
object Retrieval {

  private val NumQueries = 8
  private val TermsPerQuery = 3
  private val LegK = 10 // depth of each leg's rank list
  private val FusedK = 5
  private val RrfK = 60 // the standard RRF smoothing constant

  val q112HybridRetrieval: Q = Q(
    "q112_hybrid_retrieval",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
       |  FROM documents),
       |qterms AS (
       |  SELECT query_id, tok FROM (
       |    SELECT doc_id AS query_id, tok, COUNT(*) AS c,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id
       |        ORDER BY COUNT(*) DESC, tok) AS rk
       |    FROM toks WHERE doc_id < $NumQueries GROUP BY doc_id, tok)
       |  WHERE rk <= $TermsPerQuery),
       |dlen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tot FROM dlen),
       |tfq AS (
       |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |  WHERE tok IN (SELECT tok FROM qterms) GROUP BY doc_id, tok),
       |dfq AS (SELECT tok, COUNT(*) AS df FROM tfq GROUP BY tok),
       |wm AS (
       |  SELECT t.doc_id, t.tok,
       |    CAST(FLOOR((LN(1.0 + (CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
       |                        / (CAST(f.df AS DOUBLE) + 0.5))
       |      * ((CAST(t.tf AS DOUBLE) * 2.2)
       |         / (CAST(t.tf AS DOUBLE)
       |            + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE)
       |                                    / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE)))))))
       |      * 1000000.0 + 0.5) AS BIGINT) AS wm
       |  FROM tfq t JOIN dlen l USING (doc_id) JOIN dfq f USING (tok)
       |  CROSS JOIN stats s),
       |text_ranks AS (
       |  SELECT query_id, doc_id, rnk FROM (
       |    SELECT q.query_id, w.doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY SUM(w.wm) DESC, w.doc_id) AS rnk
       |    FROM qterms q JOIN wm w USING (tok)
       |    WHERE w.doc_id <> q.query_id
       |    GROUP BY q.query_id, w.doc_id)
       |  WHERE rnk <= $LegK),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |vec_ranks AS (
       |  SELECT query_id, doc_id, rnk FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
       |                 c.vec_id) AS rnk
       |    FROM e q JOIN e c ON q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
       |  WHERE rnk <= $LegK),
       |fused AS (
       |  SELECT COALESCE(t.query_id, v.query_id) AS query_id,
       |    COALESCE(t.doc_id, v.doc_id) AS doc_id,
       |    t.rnk AS text_rank, v.rnk AS vec_rank,
       |    COALESCE(1.0 / ($RrfK + t.rnk), 0) +
       |      COALESCE(1.0 / ($RrfK + v.rnk), 0) AS rrf
       |  FROM text_ranks t FULL OUTER JOIN vec_ranks v
       |    ON t.query_id = v.query_id AND t.doc_id = v.doc_id)
       |SELECT query_id, doc_id, text_rank, vec_rank,
       |  ROUND(rrf, 6) AS rrf, rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf DESC, doc_id) AS rank
       |  FROM fused)
       |WHERE rank <= $FusedK ORDER BY query_id, rank""".stripMargin,
  ) { (s, d) =>
    ArrayExprs.register(s)
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))

    // each query's lexical side: its own document's top terms
    val qtw = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("tok"))
    val qterms = toks.filter(col("doc_id") < NumQueries)
      .groupBy(col("doc_id").as("query_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(qtw))
      .filter(col("rk") <= TermsPerQuery)
      .select(col("query_id"), col("tok"))
      .localCheckpoint() // tiny (8×3 rows), feeds two joins

    val wm = TextAnalysis.bm25Weights(docs, qterms.select(col("tok")))
    val trw = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    val textRanks = qterms.join(wm, "tok")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("wm")).as("score_micro"))
      .withColumn("rnk", row_number().over(trw).cast("long"))
      .filter(col("rnk") <= LegK)
      .select(col("query_id"), col("doc_id"), col("rnk"))

    // semantic leg: q50's shape — 8 query vectors as plan literals, one
    // narrow corpus pass, rounded cosine ranked per query
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", call_function("graft_dot", col("v"), col("v")))
    val qs: Seq[(Long, Seq[Double], Double)] = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("v"), col("n2")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq, r.getDouble(2)))
      .toIndexedSeq
    val vrw = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("doc_id"))
    val vecRanks = Tables.fanOut(e)
      .select(col("vec_id").as("doc_id"),
        explode(transform(typedLit(qs), q =>
          struct(q.getField("_1").as("query_id"),
            round(cosineFromDot(
              call_function("graft_dot", col("v"), q.getField("_2")),
              q.getField("_3"), col("n2")), 6).as("cos")))).as("qc"))
      .select(col("qc.query_id"), col("doc_id"), col("qc.cos"))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("rnk", row_number().over(vrw).cast("long"))
      .filter(col("rnk") <= LegK)
      .select(col("query_id"), col("doc_id"), col("rnk"))

    // rank fusion: position-only, so leg-score scales never meet
    val t = textRanks.withColumnRenamed("rnk", "text_rank")
    val v = vecRanks.withColumnRenamed("rnk", "vec_rank")
    val rrf =
      coalesce(lit(1.0) / (lit(RrfK) + col("text_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0))
    val fw = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    t.join(v, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rank", row_number().over(fw).cast("long"))
      .filter(col("rank") <= FusedK)
      .select(col("query_id"), col("doc_id"), col("text_rank"),
        col("vec_rank"), round(col("rrf"), 6).as("rrf"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[Q] = Seq(q112HybridRetrieval)
}
