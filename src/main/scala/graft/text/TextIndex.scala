package graft.text

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Persisted inverted text index — the third member of the persisted-index
  * family ([[graft.dedup.LshIndex]] dedup, [[graft.sim.VecIndex]] vectors):
  * a 100 TB corpus is tokenized ONCE; every search after that reads
  * O(query terms + candidate docs) of the store. Three on-disk pieces:
  *
  *  - **postings** `(tok, doc_id, tf)`, partitioned by the token's md5 hex
  *    prefix — a query opens only the partitions its own terms hash into
  *    (md5, not first letter: uniform dirs, no hot 's'/'t' partition);
  *  - **doc lengths** `(doc_id, dl)`, partitioned by `doc_id mod 16` — the
  *    BM25 length normalization fetches only candidate docs' partitions;
  *  - **stats** `(n, tot)` — one row, the corpus-global counts BM25 needs;
  *    incrementally maintained on append (integer adds, exactly the values
  *    a rebuild would compute).
  *
  * Reads go through [[graft.dedup.LshIndex.readPruned]]'s explicit-path
  * discipline (`inputFiles`-proven in TextIndexSpec); scoring reuses the
  * micro-int BM25 expression of [[TextAnalysis.bm25Weights]] on the STORED
  * tf/df/dl/n/tot — the same integers a corpus pass would produce, so
  * q113 answers q102's query through the index under q102's own exact
  * oracle: same result, different physical path.
  *
  * SINGLE WRITER (the upsert/compaction exclusion slot): append updates
  * stats read-modify-write. Reference tie-in: no text surface in the
  * reference (SURVEY.md §2.b north-star).
  */
object TextIndex {

  /** Hex-prefix length of the postings partition key (16 dirs per char;
    * grow with the cluster like LshIndex.PfxLen). */
  val PfxLen = 1

  /** Modulus of the doc-length partition key. */
  val DocPfxMod = 16L

  private def postingsRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .withColumn("pfx", concat(lit("h"), substring(md5(col("tok")), 1, PfxLen)))

  private def dlenRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
      .withColumn("dpfx", pmod(col("doc_id"), lit(DocPfxMod)))

  /** Build (or incrementally extend) the index for a document frame. */
  def write(docs: DataFrame, dir: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val s = docs.sparkSession
    val d = docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      postingsRows(d).repartition(col("pfx"))
        .write.mode(mode).partitionBy("pfx").parquet(s"$dir/postings")
      dlenRows(d).repartition(col("dpfx"))
        .write.mode(mode).partitionBy("dpfx").parquet(s"$dir/dlen")
      val batch = dlenRows(d).agg(
        count(lit(1)).as("n"), sum(col("dl")).as("tot")).head()
      val (bn, btot) = (batch.getLong(0), batch.getLong(1))
      val (pn, ptot) =
        if (mode == SaveMode.Append) {
          val prev = s.read.parquet(s"$dir/stats").head()
          (prev.getLong(0), prev.getLong(1))
        } else (0L, 0L)
      // integer increments == what a rebuild would count; write the tiny
      // stats row LAST so a reader never sees stats ahead of the data
      s.range(1).select(lit(pn + bn).as("n"), lit(ptot + btot).as("tot"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/stats")
    } finally d.unpersist(blocking = false)
  }

  def append(docs: DataFrame, dir: String): Unit =
    write(docs, dir, SaveMode.Append)

  /** BM25 top-`k` through the index: pruned postings read for the query's
    * terms, df from the complete per-term postings just read, pruned
    * doc-length fetch for candidate docs only, stored global stats —
    * then the exact [[TextAnalysis.bm25Weights]] scoring expression over
    * the stored integers. Driver-side collects are partition VALUES
    * (bounded by dir counts), never data. */
  def search(s: SparkSession, dir: String, terms: Seq[String],
      k: Int): DataFrame = {
    import graft.dedup.LshIndex.readPruned
    val pfxs = terms.map(t => "h" + org.apache.commons.codec.digest.DigestUtils
      .md5Hex(t).substring(0, PfxLen)).distinct
    val posts = readPruned(s, s"$dir/postings", "pfx", pfxs)
      .filter(col("tok").isin(terms: _*))
      .select(col("doc_id"), col("tok"), col("tf"))
      // lazy persist, not localCheckpoint: three consumers share one read,
      // and the file scan stays in the plan (TextIndexSpec's inputFiles
      // pruning proof inspects it)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfq = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val dpfxs = posts.select(pmod(col("doc_id"), lit(DocPfxMod)).as("p"))
      .distinct().collect().map(_.getLong(0).toString).toSeq
    val dlen = readPruned(s, s"$dir/dlen", "dpfx", dpfxs)
      .select(col("doc_id"), col("dl"))
    val stats = s.read.parquet(s"$dir/stats")
    // the exact q102 weight expression over stored integers
    val idf = log(lit(1.0) +
      (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") /
            (col("tot").cast("double") / col("n").cast("double")))))
    val scored = posts.join(dlen, "doc_id").join(dfq, "tok").crossJoin(stats)
      .select(col("doc_id"),
        floor(idf * tfn * lit(1000000.0) + lit(0.5)).as("wm"))
      .groupBy(col("doc_id")).agg(sum(col("wm")).as("score_micro"))
    // eager top-k materialization (≤k rows) so the shared posts cache can
    // be dropped here — search in a serving loop must not leak one cache
    // entry per call
    val top = scored.orderBy(col("score_micro").desc, col("doc_id")).limit(k)
      .localCheckpoint()
    posts.unpersist(blocking = false)
    val w = Window.orderBy(col("score_micro").desc, col("doc_id"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("doc_id"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("score"),
        col("rnk"))
      .orderBy(col("rnk"))
  }

  // ---- q113 ---------------------------------------------------------------

  private val stores = scala.collection.mutable.Map.empty[String, String]

  private[text] def storeFor(s: SparkSession, d: String): String =
    synchronized {
      stores.getOrElseUpdate(d, {
        val dir = Files.createTempDirectory("graft-textindex").toString
        write(Tables.documents(s, d).select(col("doc_id"), col("text")), dir)
        dir
      })
    }

  def clearCaches(): Unit = synchronized { stores.clear() }

  /** q113: q102's BM25 query answered THROUGH the persisted index — the
    * oracle is q102's own exact SQL (a corpus-pass computation), so the
    * hash check proves the store path (tokenize-once postings, pruned
    * reads, incremental stats) reproduces the from-scratch scores
    * bit-for-bit. */
  val q113Bm25Index: Q = Q(
    "q113_bm25_index",
    TextAnalysis.q102Bm25.oracle.get,
  ) { (s, d) =>
    search(s, storeFor(s, d), TextAnalysis.Bm25QueryTerms, 10)
  }

  val all: Seq[Q] = Seq(q113Bm25Index)
}
