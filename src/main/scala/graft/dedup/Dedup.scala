package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.ArrayExprs

/** Deduplication operators for training-data pipelines over `documents` and
  * `embeddings`: exact (hash groupBy), n-gram Jaccard (blocked pair
  * verification), MinHash+LSH (the at-scale candidate generator), SimHash
  * (pigeonhole-blocked Hamming pairs), and embedding-cosine near-dup.
  *
  * Scale design: every pairwise operator here is *blocked* — pairs are only
  * generated inside a join on a candidate key (LSH band hash, SimHash
  * chunk, quantizer cell, or PassJoin segment), never via an unblocked
  * cross join — and every candidate key is DATA-ADAPTIVE: candidate volume
  * tracks true duplicate density, not a fixed block cardinality (a fixed
  * key's blocks grow linearly with the corpus, so in-block pairs grow
  * quadratically — the round-4 scale break this module no longer has).
  * The blocked self-join shuffles both sides on the candidate key once;
  * within a block the comparison is a cheap long-array intersect or
  * popcount, and skewed blocks are split by AQE skew-join handling.
  * The Jaccard family (q41/q45/q47) uses an md5-salted MinHash the DuckDB
  * oracle reproduces bit-for-bit, so LSH-derived results stay exact
  * hash-checked; q42/q58 are the xxhash64 twins tuned for throughput.
  *
  * The reference (d-smith/sfs3-kinesis) has no dedup surface; its nearest
  * analog is completion-dedup of txn state (SURVEY.md §2.a R11/R14,
  * svckinesis.js:90-106) — the streaming module covers that. This module is
  * the BASELINE.json north-star extension.
  */
object Dedup {

  private def words(c: Column): Column = split(c, "\\s+")

  /** Distinct word-3-gram shingles as strings (oracle-comparable form).
    * The words array is let-bound so the regex split runs once per row, not
    * once per element_at (3 per shingle — measured ~150x on sf0.1 docs). */
  def shingles(c: Column): Column =
    ArrayExprs.letBind(words(c)) { w =>
      when(size(w) >= 3,
        array_distinct(transform(sequence(lit(1), size(w) - 2),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))))
        .otherwise(array(concat_ws(" ", w)))
    }

  /** Shingle sets as SORTED xxhash64 longs — same set sizes as [[shingles]]
    * modulo 64-bit collisions (~1e-13 at this cardinality). Sorted once per
    * document so pairwise intersection is a codegen'd merge loop
    * (`graft_intersect_size`) instead of a per-pair hash set. */
  def shingleHashes(c: Column): Column =
    array_sort(array_distinct(transform(shingles(c), s => xxhash64(s))))

  private val shinglesSql =
    """CASE WHEN LEN(w) >= 3
      |  THEN list_distinct(list_transform(range(1, LEN(w) - 1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      |  ELSE [array_to_string(w, ' ')] END""".stripMargin

  /** q40: exact deduplication — hash groupBy on the full text. Input models
    * a recrawl: the corpus unioned with a second copy in which every 10th
    * document was edited; dedup keeps the smallest doc_id per distinct text
    * and reports the copy count. One shuffle on the text hash; at scale the
    * groupBy key would be the md5/xxhash of the text (same plan shape). */
  val q40DedupExact: Q = Q(
    "q40_dedup_exact",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |    CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents)
      |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM corpus GROUP BY text
      |ORDER BY keep_id""".stripMargin,
  ) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val recrawl = docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text"))
    docs.unionAll(recrawl)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }

  // ---- Engine-neutral (md5) MinHash-LSH ----------------------------------

  val NumHashes = 16
  val NumBands = 4 // 4 rows per band → s-curve threshold ≈ (1/4)^(1/4) ≈ 0.71
  // the oracle's salted-md5 CTEs are generated from NumHashes; the Spark
  // side evaluates through the fused expression — they must agree
  require(NumHashes == graft.functions.Md5MinHashSig.NumHashes,
    "Dedup.NumHashes must match Md5MinHashSig.NumHashes")

  /** Rows per LSH band (NumBands × RowsPerBand = [[NumHashes]]). */
  val RowsPerBand: Int = NumHashes / NumBands

  /** Engine-neutral MinHash signature: element i is the minimum md5 hex
    * digest of `"p<i>|" + shingle` over the document's distinct shingle
    * strings — a salted-hash permutation family. md5 is RFC-1321-fixed and
    * lowercase-hex strings compare bytewise identically in Spark and
    * DuckDB, so — unlike the xxhash64-seeded [[minhashSignature]] — the
    * DuckDB oracle rebuilds this signature bit-for-bit
    * (`list_min(list_transform(s, x -> md5('p<i>|' || x)))`). That is what
    * upgrades the LSH→verify composition (q41) and the clustering over it
    * (q45/q47) from rows-only to exact hash-checked while keeping the
    * data-adaptive candidate generation.
    *
    * Computed by the one-pass [[graft.functions.Md5MinHashSig]] expression
    * (requires [[ArrayExprs.register]]); [[md5MinhashSigHof]] is the
    * interpreted reference formula — DedupSpec pins bit-identity. */
  def md5MinhashSig(shingleStrings: Column): Column =
    call_function("graft_md5_minhash", shingleStrings)

  /** The HOF reference formula for [[md5MinhashSig]] (16 let-bound
    * `array_min(transform(...))` passes) — kept as the readable spec of
    * the signature's semantics and the fuzz target. */
  def md5MinhashSigHof(shingleStrings: Column): Column =
    ArrayExprs.letBind(shingleStrings) { sh =>
      array((0 until NumHashes).map { i =>
        array_min(transform(sh, x => md5(concat(lit(s"p$i|"), x))))
      }: _*)
    }

  /** LSH band keys over an md5-minhash signature: band b hashes signature
    * rows [b·RowsPerBand, (b+1)·RowsPerBand) into one md5 key, so two
    * documents collide on a band iff those RowsPerBand minhashes ALL agree.
    * The AND-composition suppresses random collisions as jac^RowsPerBand
    * (s-curve threshold ≈ (1/NumBands)^(1/RowsPerBand) ≈ 0.71) — which is
    * what keeps candidate volume tracking true duplicate DENSITY instead of
    * corpus², even over a small-vocabulary corpus where pairs of unrelated
    * documents routinely share single shingles (any share-a-token or
    * fixed-band scheme goes quadratic there; measured in
    * BENCH_SCALE_r04.json as q45's old 24.8×-at-10× generator). */
  def md5BandKeys(msig: Column): Column =
    array((0 until NumBands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws("|", slice(msig, b * RowsPerBand + 1, RowsPerBand)))
          .as("band_key"))
    }: _*)

  /** Near-dup feature frame over a corpus(doc_id, text): sorted hashed
    * shingles `sh` (for the codegen'd exact intersect), set size `ns`, and
    * the engine-neutral md5-minhash signature `msig`. One narrow per-row
    * pass; callers persist it when it feeds both candidate generation and
    * verification (see [[FeatCache]]). */
  def lshFeatures(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"),
        shingleHashes(col("text")).as("sh"),
        md5MinhashSig(shingles(col("text"))).as("msig"))
      .withColumn("ns", size(col("sh")))

  /** Deterministic near-dup pairs (doc_a, doc_b, jac): md5-LSH band
    * candidates verified by EXACT Jaccard ≥ 0.5 on the shingle sets — the
    * candidates→verify composition the round-4 verdict asked to become the
    * oracle-checked form. Candidate generation travels WITHOUT the shingle
    * arrays (the q42 lesson): only (band, doc_id, set size) shuffles; each
    * distinct candidate pair ships its two ~2.4 KB sets exactly once, and
    * the integer verify (3·|A∩B| ≥ |A|+|B| ⇔ jac ≥ 0.5) runs on the
    * codegen'd sorted-merge intersect. */
  def lshVerifiedPairs(feat: DataFrame): DataFrame = {
    val banded = feat.select(col("doc_id"), col("ns"),
        explode(md5BandKeys(col("msig"))).as("band"))
      .select(col("doc_id"), col("ns"), col("band.band_id"), col("band.band_key"))
    val a = banded.select(col("band_id"), col("band_key"),
      col("doc_id").as("doc_a"), col("ns").as("na"))
    val b = banded.select(col("band_id"), col("band_key"),
      col("doc_id").as("doc_b"), col("ns").as("nb"))
    // the size bound is lossless at t=0.5 (3·inter ≥ na+nb ⇒ 2·min ≥ max)
    // and prunes candidates BEFORE the pair-dedup shuffle
    val candIds = a.join(b, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")) * 2 >= greatest(col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .dropDuplicates("doc_a", "doc_b")
    val setsA = feat.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
    val setsB = feat.select(col("doc_id").as("doc_b"), col("sh").as("sb0"))
    val interSize = call_function("graft_intersect_size", col("sa"), col("sb0"))
    candIds
      .join(setsA, Seq("doc_a"))
      .join(setsB, Seq("doc_b"))
      .filter(interSize * 3 >= col("na") + col("nb"))
      .withColumn("inter", interSize.cast("double"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6).as("jac"))
  }

  /** The mirrored md5-LSH pipeline as DuckDB CTEs over `src(doc_id, text)`:
    * t → sh → sig → banded → cand → pairs(doc_a, doc_b, jac). Every stage
    * rebuilds the Spark plan exactly — same salts, same band slicing, same
    * integer verify — so the driver's hash check is exact even though the
    * candidate set is LSH-derived. */
  private[dedup] def lshPairCtes(src: String): String = {
    val sigList = (0 until NumHashes)
      .map(i => s"list_min(list_transform(s, x -> md5('p$i|' || x)))")
      .mkString("[\n    ", ",\n    ", "]")
    val b0 = s"b.band_id*$RowsPerBand"
    s"""t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM $src),
sh AS (SELECT doc_id, $shinglesSql AS s FROM t),
sig AS (SELECT doc_id, s, $sigList AS msig FROM sh),
banded AS (
  SELECT doc_id, b.band_id,
    md5(array_to_string(msig[$b0+1 : $b0+$RowsPerBand], '|')) AS band_key
  FROM sig, LATERAL (SELECT unnest(range(0, $NumBands)) AS band_id) b),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
    AND a.doc_id < b.doc_id),
pairs AS (
  SELECT c.doc_a, c.doc_b,
    ROUND(CAST(LEN(list_intersect(x.s, y.s)) AS DOUBLE)
      / (LEN(x.s) + LEN(y.s) - LEN(list_intersect(x.s, y.s))), 6) AS jac
  FROM cand c JOIN sh x ON x.doc_id = c.doc_a JOIN sh y ON y.doc_id = c.doc_b
  WHERE 3 * LEN(list_intersect(x.s, y.s)) >= LEN(x.s) + LEN(y.s))"""
  }

  /** q41: near-duplicate pairs — deterministic md5-MinHash-LSH candidates
    * verified by exact 3-gram-shingle Jaccard ≥ 0.5. This replaces the
    * round-4 fixed (lang, 100-char band) generator, whose blocks grew
    * linearly with the corpus and whose in-block pairs therefore grew
    * quadratically (measured 5.3× at 10× data); LSH candidate volume
    * tracks true duplicate density instead (q42 measured 1.3×). It also
    * MISSES FEWER pairs: at sf0.01 the band boundary was splitting 19 of
    * 25 true near-dup pairs out of the result. Recall follows the LSH
    * s-curve (≈98% at jac 0.9, where this corpus's true pairs live; ~23%
    * at jac exactly 0.5) — deterministic, and mirrored exactly by the
    * oracle, so the driver check stays a hash match. */
  val q41DedupJaccard: Q = Q(
    "q41_dedup_jaccard",
    "WITH " + lshPairCtes("documents") +
      "\nSELECT doc_a, doc_b, jac FROM pairs ORDER BY doc_a, doc_b",
  ) { (s, d) =>
    ArrayExprs.register(s)
    lshVerifiedPairs(md5FeatTable(s, d)).orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- MinHash + LSH (q42) ------------------------------------------------

  /** 16-permutation MinHash signature over pre-hashed shingles via the
    * codegen'd one-pass [[graft.functions.MinHashSig]] expression
    * (sig_j = min over shingle hashes x of A_j·x + B_j — a universal-hash
    * permutation family). Requires [[ArrayExprs.register]] on the session.
    * Per-row, zero-shuffle. */
  def minhashSignature(sh: Column): Column =
    call_function("graft_minhash", sh)

  /** q42: MinHash+LSH near-dup pairs — the at-scale candidate path:
    * signature (narrow) → explode one row per band (4×) → shuffle on
    * (band_id, band_hash) → same-bucket pairs → verify true Jaccard ≥ 0.5.
    * Only same-bucket pairs are ever materialized, so the join cost is
    * proportional to true collisions, not corpus². Hash values are
    * engine-specific → rows-only driver check; DedupSpec pins semantics
    * (finds every identical-shingle-set pair; verified pairs ⊆ q41's). */
  /** Persisted per-(session, dir) MinHash signature table. The signature
    * pass feeds candidate generation (self-join, twice) and verification
    * (twice more), and recomputing the shingle+minhash features 4×
    * dominated q42 (~2× overall) — so it is materialized once
    * (MEMORY_AND_DISK spills instead of OOMing: the build-the-index step
    * every LSH pipeline has). Cached per session/dir so repeated
    * invocations reuse ONE persisted copy instead of leaking a new cache
    * entry per call. */
  /** Size-1 cache (synchronized) of a persisted per-(session, dir) feature
    * table: one (session, dir) is live at a time in every driver main;
    * replacing an entry unpersists the evicted table, so neither stopped
    * sessions nor stale cached plans are pinned for the JVM lifetime (an
    * unbounded map keyed by SparkSession would strongly hold both). */
  private final class FeatCache(build: (SparkSession, String) => DataFrame) {
    private var slot: Option[((SparkSession, String), DataFrame)] = None
    def apply(s: SparkSession, d: String): DataFrame = synchronized {
      slot match {
        case Some(((cs, cd), df)) if (cs eq s) && cd == d => df
        case prev =>
          prev.foreach(_._2.unpersist(blocking = false))
          val df = build(s, d)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          slot = Some(((s, d), df))
          df
      }
    }
    def clear(): Unit = synchronized {
      slot.foreach(_._2.unpersist(blocking = true))
      slot = None
    }
  }

  private val xxSigCache = new FeatCache((s, d) =>
    Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), shingleHashes(col("text")).as("sh"))
      .withColumn("sig", minhashSignature(col("sh")))
      .withColumn("ns", size(col("sh"))))

  private def minhashSigTable(s: SparkSession, d: String): DataFrame =
    xxSigCache(s, d)

  /** Persisted per-(session, dir) md5-LSH feature table over the raw
    * documents corpus — q41's analog of [[minhashSigTable]]: the shingle +
    * 16-permutation md5 pass runs once and feeds candidate generation and
    * verification. Fan-out before the projection for the same single-file
    * scan reason (see Tables.fanOut). */
  private val md5FeatCache = new FeatCache((s, d) =>
    lshFeatures(Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("text"))))

  private def md5FeatTable(s: SparkSession, d: String): DataFrame =
    md5FeatCache(s, d)

  val q42DedupMinhashLsh: Q = Q.rowsOnly("q42_dedup_minhash_lsh") { (s, d) =>
    ArrayExprs.register(s)
    val rowsPerBand = NumHashes / NumBands
    val sig = minhashSigTable(s, d)
    // Candidate generation travels WITHOUT the shingle arrays — only
    // (band, doc_id, set-size). The arrays rejoin after the pair dedup, so
    // each distinct candidate pair ships its two ~2.4 KB sets exactly once
    // (a pair colliding in all 4 bands would otherwise ship them 4×, and
    // the dedup shuffle would carry arrays).
    val banded = sig.select(
      col("doc_id"), col("ns"),
      explode(array((0 until NumBands).map { b =>
        struct(lit(b).as("band_id"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("band_hash"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("ns"), col("band.band_id"), col("band.band_hash"))
    val a = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"), col("ns").as("na"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_b"), col("ns").as("nb"))
    val candIds = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")) * 2 >= greatest(col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .dropDuplicates("doc_a", "doc_b")
    val setsA = sig.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
    val setsB = sig.select(col("doc_id").as("doc_b"), col("sh").as("sb0"))
    val interSize = call_function("graft_intersect_size", col("sa"), col("sb0"))
    candIds
      .join(setsA, Seq("doc_a"))
      .join(setsB, Seq("doc_b"))
      .filter(interSize * 3 >= col("na") + col("nb"))
      .withColumn("inter", interSize.cast("double"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6).as("jac"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- SimHash (q43) ------------------------------------------------------
  val SimhashChunks = 4 // 16 bits each; hamming ≤ 3 ⇒ some chunk equal

  /** 64-bit SimHash over token xxhash64s: bit j is set iff more than half
    * the tokens have bit j set in their hash. The 64 bit-majorities are
    * unrolled at plan-build time (shift amounts must be literals); disjoint
    * bit contributions sum without carries, so the adds are exact (and the
    * sign bit, added as Long.MinValue, can never trip ANSI overflow checks
    * because negative+positive never overflows). Per-row, zero-shuffle. */
  def simhashFromHashes(th: Column, nTok: Column): Column =
    (0 until 64).map { j =>
      val cnt = size(filter(th, h => shiftrightunsigned(h, j).bitwiseAND(lit(1L)) === 1L))
      when(cnt * 2 > nTok, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SimHash of a text column via the codegen'd `graft_simhash` (one fused
    * counting loop; the HOF formula above is its interpreted reference —
    * DedupSpec pins bit-identity between the two). Callers must have run
    * `ArrayExprs.register`. */
  def simhash(text: Column): Column =
    call_function("graft_simhash", transform(words(text), w => xxhash64(w)))

  /** q43: SimHash near-dup pairs at Hamming distance ≤ 3. Pigeonhole
    * blocking: the 64-bit signature splits into 4×16-bit chunks; two
    * signatures within Hamming 3 must agree on ≥1 chunk, so candidate pairs
    * come from equi-joins on (chunk_id, chunk_value) only — no quadratic
    * scan — then popcount(xor) verifies. Hash-seeded → rows-only check;
    * DedupSpec pins the Hamming guarantee. */
  val q43DedupSimhash: Q = Q.rowsOnly("q43_dedup_simhash") { (s, d) =>
    ArrayExprs.register(s)
    // fan out before the expensive projection (single-file scan = 1 task)
    val sigs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), simhash(col("text")).as("sig"))
    val chunked = sigs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until SimhashChunks).map { c =>
        struct(lit(c).as("chunk_id"),
          (shiftrightunsigned(col("sig"), c * 16) % 65536).as("chunk_val"))
      }: _*)).as("ch"))
      .select(col("doc_id"), col("sig"), col("ch.chunk_id"), col("ch.chunk_val"))
    val a = chunked.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- Embedding cosine near-dup (q44) -----------------------------------
  /** Cosine similarity of two double arrays — sequential left fold matching
    * the oracle's evaluation order; last-ulp noise is killed by rounding at
    * the call sites. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(sqNorm(a) * sqNorm(b))

  /** Sequential left-fold dot product (HOF — interpreted, so per-pair work
    * should be ONLY the dot: precompute [[sqNorm]] per vector, not per
    * pair). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm — compute once per vector and carry as a column. */
  def sqNorm(v: Column): Column =
    aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x)

  /** Cosine from a pairwise dot and per-side precomputed squared norms —
    * same expression shape as [[cosine]] (dot / sqrt(na*nb)), so values
    * are bit-identical; only the evaluation count changes. */
  def cosineFromDot(d: Column, na2: Column, nb2: Column): Column =
    d / sqrt(na2 * nb2)

  /** q44: embedding-cosine near-duplicate pairs, blocked by IVF
    * coarse-quantizer cell (reusing q53's quantizer machinery,
    * [[graft.sim.Similarity.seedCentroids]]/[[graft.sim.Similarity.probeCells]]):
    * each vector indexes into its 2 nearest cells (multi-probe, so
    * boundary-straddling near-dups still collide), and only same-cell
    * pairs are compared. Unlike the previous `label` blocking, cell count
    * is a CONFIG knob, not a fixed data cardinality — at 100 TB you raise
    * NumCells with the corpus and per-cell pair work stays bounded
    * (O(n²/cells·nprobe²) instead of O(n²/L) with immovable L). Rounded
    * cosine ≥ 0.35.
    *
    * Exact oracle despite the data-adaptive blocking: the seed quantizer
    * is rebuilt in SQL — `list_reduce` left folds are bit-identical to
    * `graft_dot`'s 0-seeded loop (CLAUDE.md recipe), so cell scores match
    * bit-for-bit and ROW_NUMBER over (score, cid) picks the same 2 cells
    * as the sorted-struct slice in [[graft.sim.Similarity.probeCells]]. */
  val q44DedupEmbed: Q = Q(
    "q44_dedup_embed",
    s"WITH ${embedPairCtes(graft.sim.Similarity.NumCells, "0.35")}\n" +
      "SELECT vec_a, vec_b, cos FROM pairs ORDER BY vec_a, vec_b",
  ) { (s, d) =>
    embedNearDupPairs(s, d, graft.sim.Similarity.NumCells)
  }

  /** The q44 pipeline mirrored as DuckDB CTEs over `embeddings`, ending in
    * `pairs(vec_a, vec_b, cos)` — factored so composed operators (q101
    * triangle counting) can append their own CTEs over the identical pair
    * set. `thr` is the SQL literal of the rounded-cosine threshold; pass
    * the same double to [[embedNearDupPairs]] or the mirrors drift. */
  def embedPairCtes(numCells: Int, thr: String): String =
    s"""e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cid, v AS c,
       |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i]*v[i]),
       |                (a, b) -> a + b) AS cn2
       |  FROM e WHERE vec_id < $numCells),
       |probed AS (
       |  SELECT vec_id, v, cid AS cell FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        c.cn2 - 2 * list_reduce(
       |          list_transform(range(1, len(e.v)+1), i -> e.v[i]*c.c[i]),
       |          (a, b) -> a + b),
       |        c.cid) AS rn
       |    FROM e, cents c)
       |  WHERE rn <= 2),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
       |  FROM probed a JOIN probed b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= $thr)""".stripMargin

  /** The q44 pipeline with the cell count as the explicit scale knob — at
    * 10× the corpus you run 10× the cells and per-cell pair work stays
    * put (ScaleProbe measures exactly this). */
  def embedNearDupPairs(s: SparkSession, d: String, numCells: Int,
      thr: Double = 0.35): DataFrame = {
    val e = embedCellFrame(s, d, numCells)
    val a = e.select(col("vec_id").as("vec_a"), col("cell").as("cell_a"),
      col("v").as("va"), col("n2").as("na2"))
    val b = e.select(col("vec_id").as("vec_b"), col("cell").as("cell_b"),
      col("v").as("vb"), col("n2").as("nb2"))
    // id-order and cosine threshold INSIDE the join condition (the q41
    // lesson): non-matching pairs are never materialized as output rows,
    // so the two ~512 B vectors are copied only for the rare survivors —
    // whose cosine is then recomputed once in the projection. distinct()
    // collapses pairs colliding in both probed cells (survivors only).
    val cos = round(
      cosineFromDot(call_function("graft_dot", col("va"), col("vb")),
        col("na2"), col("nb2")), 6)
    a.join(b,
        col("cell_a") === col("cell_b") && col("vec_a") < col("vec_b") &&
          cos >= thr)
      .select(col("vec_a"), col("vec_b"), cos.as("cos"))
      .distinct()
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** q44's blocking plane, shared by the pair join and its candidates
    * decomposition: every vector fanned out, probed into its 2 nearest
    * seed cells, one row per (vector, cell) with the cast vector and its
    * squared norm riding along for the verify path. */
  private def embedCellFrame(s: SparkSession, d: String,
      numCells: Int): DataFrame = {
    ArrayExprs.register(s)
    import graft.sim.Similarity
    val plain = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    // fan out before the cast/norm projection (single-file scan = 1 task);
    // cell assignment is narrow per-row work, delivered by scale — plan
    // literals at small cell counts, a broadcast centroid row beyond
    // Similarity.LiteralCellLimit (identical assignments either way)
    val base = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", call_function("graft_dot", col("v"), col("v")))
    Similarity
      .withProbeCells(base, plain, numCells, 2, col("v"), "probe")
      .withColumn("cell", explode(col("probe"))).drop("probe")
  }

  /** q44's per-cell OCCUPANCY diagnostics (r16 — the r15 verdict's item
    * 2: "measure the growth model, don't assert it"): over the fanned
    * (vector, cell) rows — (cells used, max occupancy, mean occupancy,
    * Σ n_c·(n_c−1)/2). The pair sum is the EXACT pre-distinct candidate
    * bound, so a super-linear candidate-row growth decomposes into
    * occupancy skew (max/mean ratio) vs knob miscalibration (mean). */
  private[graft] def embedCellOccupancy(s: SparkSession, d: String,
      numCells: Int): (Long, Long, Double, Long) = {
    val occ = embedCellFrame(s, d, numCells).groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
    val r = occ.agg(count(lit(1)), max(col("n")), avg(col("n")),
      sum(col("n") * (col("n") - lit(1)) / lit(2)).cast("long")).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
  }

  /** q44's CANDIDATE plane ALONE (the q48-decomposition discipline, r14
    * verdict item 6): the same-cell id-ordered pair STRUCTURE with the
    * vectors projected away and NO cosine verify — what ScaleProbe times
    * separately so a growth drift in q44 is attributable to candidate
    * volume (cells scale with the corpus, so per-cell pairs ~ density·n
    * and the candidate count should grow ~linearly at 10×) vs per-pair
    * verify cost (the dot products this frame never runs). */
  def embedCellCandidates(s: SparkSession, d: String,
      numCells: Int): DataFrame = {
    val e = embedCellFrame(s, d, numCells)
    e.select(col("vec_id").as("vec_a"), col("cell").as("cell_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("cell").as("cell_b")),
        col("cell_a") === col("cell_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
  }

  // ---- Duplicate-group clustering (q45) -----------------------------------

  /** Connected components by iterative hash-min label propagation: every
    * node starts labeled with its own id; each round propagates labels
    * across edges and keeps the per-node minimum, converging in
    * graph-diameter rounds. Each round is one join + one partial-aggregated
    * groupBy — the standard distributed CC (GraphFrames' algorithm is a
    * skew-hardened variant of the same loop), so it scales to edge sets far
    * beyond single-machine union-find. `localCheckpoint` truncates the
    * per-round lineage (a cluster deployment would use `checkpoint` to
    * HDFS for fault tolerance).
    *
    * Convergence check: labels only ever decrease, so `sum(comp)` is
    * strictly decreasing until fixpoint — one cheap scalar aggregate per
    * round instead of a change-count join.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    // The dup-pair graph is orders of magnitude smaller than the corpus
    // that produced it (sub-% duplicate rates), so the iteration shuffles
    // are sized to EDGE volume, not to the session's corpus-scale setting
    // — same discipline as Streaming.StatePartitions. A deployment with a
    // huge edge set raises this; the algorithm is unchanged.
    graft.sources.StoreMaint.withBatchConfs(s, 8) {
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .localCheckpoint()
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp"))
        .localCheckpoint()
      // coalesce: sum over an EMPTY labels frame is null (no pairs at all
      // — a legal input); 0 == 0 then converges on the first round
      var prevSum = labels.agg(coalesce(sum(col("comp")), lit(0L)))
        .head().getLong(0)
      var converged = false
      while (!converged) {
        val prop = edges.join(labels, edges("src") === labels("id"))
          .select(edges("dst").as("id"), col("comp"))
        val next = labels.unionAll(prop)
          .groupBy(col("id")).agg(min(col("comp")).as("comp"))
          .localCheckpoint()
        val nextSum = next.agg(coalesce(sum(col("comp")), lit(0L)))
          .head().getLong(0)
        converged = nextSum == prevSum
        prevSum = nextSum
        labels = next
      }
      labels
    }
  }

  /** The q45/q47 input: a 3-generation recrawl corpus (original, edited
    * v2, edited v2v3 for every 5th doc). */
  def threeGenCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("text"))
    val fifth = docs.filter(col("doc_id") % 5 === 0)
    docs
      .unionAll(fifth.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" v2")).as("text")))
      .unionAll(fifth.select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" v2 v3")).as("text")))
  }

  /** The shared q45 oracle prefix: the mirrored md5-LSH pair pipeline over
    * the 3-gen corpus ([[lshPairCtes]]) → edges → recursive closure →
    * per-node component. q47 extends it with the keep/drop application. */
  private val ccOracleCtes =
    """WITH RECURSIVE corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text || ' v2'
      |  FROM documents WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' v2 v3'
      |  FROM documents WHERE doc_id % 5 = 0),
      |""".stripMargin + lshPairCtes("corpus") + """,
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
comp AS (SELECT src AS doc_id, MIN(dst) AS comp_id FROM reach GROUP BY src)"""

  /** CC labels over the 3-gen corpus, cached per (session, dir) exactly
    * like [[minhashSigTable]]: q45 reports the groups and q47 applies
    * them — recomputing the blocked pair join + iteration twice would
    * double the cost of the shared build-the-labels step. The labels
    * frame is localCheckpointed (tiny), so the cache holds materialized
    * data, not a live lineage. Keyed (not single-slot) so interleaving
    * two datasets in one session — Verify iterates datasets — doesn't
    * thrash; bounded at [[CcCacheMax]] entries. Eviction DROPS THE
    * REFERENCE, which is the actual reclamation mechanism for
    * localCheckpoint blocks (they free when the RDD is GC'd and the
    * ContextCleaner runs; `Dataset.unpersist` is a no-op for
    * checkpointed-not-cached frames). */
  private val CcCacheMax = 4
  private val ccCache =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, String), DataFrame]

  /** Drop the cross-call caches (minhash signature table, CC labels) —
    * for probes/specs that must measure a genuinely cold execution; a
    * warm-cached 1× run against a cold 10× run would fabricate a growth
    * factor (ScaleProbe measured exactly that before this hook existed). */
  def clearCaches(): Unit = synchronized {
    xxSigCache.clear()
    md5FeatCache.clear()
    ccCache.clear()
  }

  private def threeGenLabels(s: SparkSession, d: String): DataFrame =
    synchronized {
      ccCache.get((s, d)) match {
        case Some(df) => df
        case None =>
          ArrayExprs.register(s) // graft_intersect_size in the verify
          // The feature table feeds candidate generation AND verification;
          // persist for the duration of the CC build (connectedComponents
          // materializes the edges eagerly via localCheckpoint, so the
          // unpersist after it returns is safe).
          val feat = lshFeatures(threeGenCorpus(s, d))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val df =
            try connectedComponents(
              lshVerifiedPairs(feat).select(col("doc_a"), col("doc_b")))
            finally feat.unpersist(blocking = false)
          ccCache.put((s, d), df)
          if (ccCache.size > CcCacheMax)
            ccCache.remove(ccCache.head._1) // LinkedHashMap: insertion order
          df
      }
    }

  /** q45: duplicate-group clustering — the step after pair generation in
    * every dedup pipeline: near-dup PAIRS are clustered into groups
    * (connected components) and each group elects its minimum doc_id as
    * the canonical document to keep. Input models a 3-generation recrawl
    * (original, edited v2, edited v2v3 for every 5th doc), so components
    * chain across generations and the natural near-dup pairs merge chains
    * — transitivity does real work. Pairs come from the deterministic
    * md5-LSH candidates→verify pipeline ([[lshVerifiedPairs]]) — the
    * data-adaptive generator that replaced round 4's fixed lang×band
    * all-pairs form (measured 24.8× at 10× data; candidates now track
    * duplicate density like q42/q58's 1.3–1.9×). Oracle: recursive-CTE
    * transitive closure over the identically mirrored pair set. */
  val q45DupGroups: Q = Q(
    "q45_dup_groups",
    s"""$ccOracleCtes
       |SELECT c.doc_id, c.comp_id, g.n_members
       |FROM comp c JOIN (
       |  SELECT comp_id, COUNT(*) AS n_members FROM comp GROUP BY comp_id) g
       |  ON c.comp_id = g.comp_id
       |ORDER BY c.comp_id, c.doc_id""".stripMargin,
  ) { (s, d) =>
    ArrayExprs.register(s)
    val labels = threeGenLabels(s, d)
    val sizes = labels.groupBy(col("comp")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("comp_id"),
        col("n_members"))
      .orderBy(col("comp_id"), col("doc_id"))
  }

  /** q58: duplicate-group clustering over the xxhash64 MinHash-LSH
    * candidate pairs (q42) — same composition as q45 but with the
    * codegen'd single-pass signature ([[graft.functions.MinHashSig]])
    * instead of q45's oracle-mirrorable md5 permutations, i.e. the form
    * tuned for raw throughput (measured 1.9× per 10× data in
    * BENCH_SCALE_r04). Rows-only like q42 (hash-seeded signatures);
    * DedupSpec pins the semantic relation: every LSH edge is a verified
    * true pair, so these groups REFINE the exhaustive all-pairs
    * components. Groups are reported q45-style: component, size,
    * canonical (minimum) doc. */
  val q58DupGroupsLsh: Q = Q.rowsOnly("q58_dup_groups_lsh") { (s, d) =>
    val pairs = q42DedupMinhashLsh.fn(s, d).select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs)
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("canonical_doc"))
      .orderBy(col("comp"))
  }

  /** q47: dedup application — the step that actually SHRINKS the corpus:
    * left-join the CC labels back onto the 3-gen corpus, keep singletons
    * and each group's canonical (minimum) member, and report kept/dropped
    * counts per recrawl generation. Canonicals are usually generation 0,
    * but not always — when the LSH s-curve drops the orig↔v2 link while
    * v2↔v3 survives, a generation-1 doc is the group minimum, which this
    * query surfaces. The labels table is orders of magnitude smaller than
    * the corpus, so the application join broadcasts at scale (AQE decides
    * from actual size). */
  val q47DedupApply: Q = Q(
    "q47_dedup_apply",
    s"""$ccOracleCtes
       |SELECT corpus.doc_id // 100000 AS generation,
       |  COUNT(*) FILTER (WHERE c.doc_id IS NULL OR c.comp_id = corpus.doc_id)
       |    AS n_kept,
       |  COUNT(*) FILTER (WHERE c.doc_id IS NOT NULL AND c.comp_id != corpus.doc_id)
       |    AS n_dropped
       |FROM corpus LEFT JOIN comp c ON corpus.doc_id = c.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (s, d) =>
    ArrayExprs.register(s)
    val labels = threeGenLabels(s, d)
      .select(col("id"), col("comp"))
    val kept = when(col("comp").isNull || col("comp") === col("doc_id"), 1L)
      .otherwise(0L)
    threeGenCorpus(s, d)
      .join(labels, col("doc_id") === col("id"), "left")
      .groupBy(expr("doc_id div 100000").as("generation"))
      .agg(sum(kept).as("n_kept"), sum(lit(1L) - kept).as("n_dropped"))
      .orderBy(col("generation"))
  }

  // ---- Benchmark decontamination (q46) ------------------------------------

  /** Distinct word-4-grams per document (let-bound split, same shape as
    * [[shingles]]). */
  def grams4(c: Column): Column =
    ArrayExprs.letBind(split(c, "\\s+")) { w =>
      when(size(w) >= 4,
        array_distinct(transform(sequence(lit(1), size(w) - 3),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
            element_at(w, i + 2), element_at(w, i + 3)))))
        .otherwise(array(concat_ws(" ", w)))
    }

  /** q46: benchmark decontamination — flag corpus documents that share any
    * word-4-gram with a held-out benchmark set (every 50th doc), the
    * standard eval-leak check before training. Scale shape: the benchmark
    * gram set is folded into a ~1-bit-per-item Bloom sketch by a
    * distributed aggregate (native `BloomFilterAggregate`), delivered to
    * the probe side as a scalar-subquery plan result; the corpus gram
    * stream is pre-filtered by the sketch BEFORE the shuffle, so the exact
    * semi-join only ever shuffles grams that (probably) hit. False positives are killed by the exact
    * string join that follows — the sketch can only let extra rows
    * THROUGH to the join, never drop a true hit, so the result is exact
    * (DedupSpec pins bloom-on == bloom-off). */
  val q46Decontaminate: Q = Q(
    "q46_decontaminate",
    """WITH g AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN LEN(w) >= 4 THEN array_to_string(w[i:i+3], ' ')
      |         ELSE array_to_string(w, ' ') END AS gram
      |  FROM g, LATERAL (SELECT unnest(range(1, GREATEST(LEN(w) - 2, 2))) AS i)),
      |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
      |hits AS (
      |  SELECT g.doc_id, COUNT(*) AS n_hits
      |  FROM grams g JOIN bench b ON g.gram = b.gram
      |  WHERE g.doc_id % 50 != 0
      |  GROUP BY g.doc_id)
      |SELECT doc_id, n_hits FROM hits ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    ArrayExprs.register(s)
    val grams = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), explode(grams4(col("text"))).as("gram"))
    val bench = grams.filter(col("doc_id") % 50 === 0)
      .select(col("gram")).distinct()
    // Sketch: Spark's NATIVE BloomFilterAggregate/BloomFilterMightContain
    // (the expressions behind runtime row-level filtering), exposed as
    // graft_bloom_agg / graft_might_contain. The sketch is built as a
    // distributed aggregate, lands in the plan as a scalar-subquery result
    // (~1 MB at conf-default 1M-item sizing — benchmark sets are a fixed,
    // knowable corpus; size from stats in a deployment), and the probe is
    // whole-stage-codegen'd — no Scala closure, no per-row boxing.
    bench.agg(call_function("graft_bloom_agg", xxhash64(col("gram"))).as("bf"))
      .createOrReplaceTempView("q46_bench_bloom")
    grams.filter(col("doc_id") % 50 =!= 0)
      .filter(expr(
        "graft_might_contain((SELECT bf FROM q46_bench_bloom), xxhash64(gram))"))
      .join(bench, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  /** q48: record linkage — blocked fuzzy matching by EDIT DISTANCE, the
    * dedup family for near-identical records that shingle/minhash methods
    * over-segment (typos, small in-place edits). Corpus models an edited
    * recrawl (same-length front edit for every 7th doc, so the edit lands
    * INSIDE the 64-char match key).
    *
    * Candidate generation is PassJoin-style segment pigeonhole (Li et al.,
    * VLDB'12 — public algorithm): the 64-char key splits into
    * MaxDist+1 = 6 fixed segments, so any pair within edit distance 5 has
    * at least one segment UNTOUCHED by every edit op, which therefore
    * appears verbatim in the other key at a start position shifted by at
    * most 5 (one shift per indel). One side emits its 6 segments, the
    * other its 61 clamped (segment, ±5-shift) substrings; the equi-join
    * key is (lang, band, seg_id, content) — fine-grained, so candidate
    * volume tracks true near-dup density instead of the O(n²/blocks) of
    * pure fixed-cardinality blocking, and the shape survives a 100×
    * corpus. The bounded `levenshtein(l, r, 5)` verify runs INSIDE the
    * join condition (banded O(threshold·n) DP, aborts past the threshold;
    * non-matches never materialized), and `distinct()` collapses pairs
    * that matched via several segments — survivors only. The prefilter is
    * semantically invisible (lossless at the threshold — DedupSpec proves
    * it, indels included), so the oracle is the plain blocked
    * all-pairs-levenshtein it always was. */
  val q48RecordLinkage: Q = Q(
    "q48_record_linkage",
    """WITH corpus AS (
      |  SELECT doc_id, text, lang FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, 'revA ' || substring(text, 6), lang
      |  FROM documents WHERE doc_id % 7 = 0),
      |k AS (
      |  SELECT doc_id, lang, LENGTH(text) // 100 AS band,
      |    substring(text, 1, 64) AS key FROM corpus)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  levenshtein(a.key, b.key) AS dist
      |FROM k a JOIN k b
      |  ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.key, b.key) <= 5
      |ORDER BY doc_a, doc_b""".stripMargin,
  ) { (s, d) =>
    linkagePairs(linkageKeyed(s, d))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q48's keyed corpus (base docs + the edited recrawl, with the
    * blocking keys) — shared with the scale probe's decomposition. */
  private[graft] def linkageKeyed(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), col("text"), col("lang"))
    val corpus = docs.unionAll(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("revA "), expr("substring(text, 6)")).as("text"),
          col("lang")))
    corpus.select(col("doc_id"), col("lang"),
      floor(length(col("text")) / 100).as("band"),
      substring(col("text"), 1, 64).as("key"))
  }

  /** q48's candidate+verify join over a keyed corpus — split out so the
    * scale probe can decompose candidate volume from verify time.
    *
    * Multi-match-aware shift consistency (the PassJoin paper's second
    * pruning plane, added in r13 for the scale-growth watch item): if
    * a's intact segment appears in b at shift `s`, the edit script needs
    * ≥|s| ops before it (the prefix changes length by s) and ≥|Δ−s| ops
    * after it (the suffix must land the total length change
    * Δ = len(b) − len(a)), so `|s| + |Δ−s| ≤ τ` — for the equal-length
    * keys this corpus produces, that is `2|s| ≤ 5`, i.e. 5 of each
    * segment's 11 shifts survive. LOSSLESS by the same argument that
    * makes the pigeonhole lossless (DedupSpec proves both, indels
    * included); evaluated BEFORE the banded levenshtein in the join
    * condition, so ~60% of content-collision candidates on a
    * low-entropy corpus never reach the O(τ·n) verify.
    *
    * Frequency-split BOILERPLATE defense (r13). The probe decomposition
    * measured candidate PAIRS growing 83× at a 10× corpus while true
    * matches grew 10× — single-segment content collisions on the
    * low-entropy synthetic corpus grow quadratically. Keys above the
    * hot cap therefore additionally require a matching COMPLEMENT
    * sub-piece: every edit of a ≤τ script lives outside the intact
    * segment, so partitioning the complement into 6 sub-pieces leaves
    * ≥1 intact (the same pigeonhole applied to the region that absorbed
    * the edits), appearing in the other key at a consistency-bounded
    * shift (three-region rule: |t| + |s−t| + |Δ−s| ≤ τ when the
    * sub-piece precedes the segment, mirrored when it follows).
    *
    * What the measurements decided (BENCH_SCALE_r13 + a DuckDB floor
    * probe): on the UNIFORM synthetic corpus the composite key cuts
    * candidates only 1.34–1.75× — 75% of random collision pairs also
    * share a second ~8-char window when every window is ~2 words from a
    * 31-word vocabulary — while the probe-side sub-emission costs up to
    * 10×. The candidate set of the direct join is pigeonhole-minimal
    * (exactly the pairs with intact-segment evidence), so its growth on
    * this corpus is a DATA property, not a plan defect. The hot plane
    * is therefore tuned as a SKEW defense, not a uniform-corpus win:
    * the adaptive cap (max(64, 1% of corpus)) engages it only for
    * boilerplate-grade keys — the real 100 TB failure mode, where a
    * shared prefix ("http://www.") would otherwise cross-product the
    * whole corpus. Uniform corpora route everything direct and pay one
    * window pass; DedupSpec pins exactness under a planted boilerplate
    * corpus AND the ≥5× candidate cut the split buys there.
    *
    * Still LOSSLESS at any cap: a true pair's intact segment key is
    * either cold (direct plane catches it) or hot — and then the
    * complement pigeonhole guarantees the second key matches too.
    * DedupSpec pins both planes (hotCap = 0 forces everything through
    * the hot plane) on the corpus and the indel fixtures. */
  private[graft] def linkagePairs(keyed: DataFrame,
      verify: Boolean = true, hotCap: Long = -1L): DataFrame = {
    val segs = keyed.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
      col("band").as("band_a"), col("key").as("key_a"),
      explode(array(LinkSegments.zipWithIndex.map { case ((p, l), i) =>
        struct(lit(i).as("seg_id"), substring(col("key"), p, l).as("piece"))
      }: _*)).as("seg"))
    val subs = keyed.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("band").as("band_b"), col("key").as("key_b"),
      explode(array((for {
        ((p, l), i) <- LinkSegments.zipWithIndex
        start <- math.max(1, p - LinkMaxDist) to (p + LinkMaxDist)
      } yield struct(lit(i).as("seg_id"), lit(start - p).as("shift"),
        substring(col("key"), start, l).as("piece"))): _*)).as("sub"))
    val delta = length(col("key_b")) - length(col("key_a"))
    val shiftOk = abs(col("sub.shift")) +
      abs(delta - col("sub.shift")) <= LinkMaxDist
    val dist = levenshtein(col("key_a"), col("key_b"), LinkMaxDist)
    val keyEq =
      col("lang_a") === col("lang_b") && col("band_a") === col("band_b") &&
        col("seg.seg_id") === col("sub.seg_id") &&
        col("seg.piece") === col("sub.piece")
    val pairOk = col("doc_a") < col("doc_b") && shiftOk
    val verifyOk = if (verify) dist =!= -1 else lit(true)

    // Hot-key detection is ONE aggregation job and a BOUNDED driver-side
    // fold (the q50/q74 plan-literal contract): the corpus total (for the
    // adaptive cap, max(64, corpus/100)) and the over-floor keys ride the
    // same pass — every row emits exactly one seg_id=0 segment, so the
    // doc count is the sum of segment-0 group sizes. The over-floor list
    // is sorted by count and sliced to 10k entries, which provably
    // contains every adaptive-hot key (at most 6 segments x 100 keys can
    // exceed 1% of the corpus); the explicit-cap parameter is a test hook
    // (specs force hotCap = 0 on spec-scale corpora only). Routing
    // between the planes is purely a performance decision — both planes
    // are exact for any key — so a delimiter collision in the encoded
    // key could only mis-route, never lose a pair.
    def keyEnc(lang: Column, band: Column, seg: Column, piece: Column) =
      concat_ws("\u0001", lang, band, seg, piece)
    val collectFloor = if (hotCap >= 0L) hotCap else LinkHotCap.toLong
    val statsRow = segs
      .groupBy(col("lang_a"), col("band_a"), col("seg.seg_id").as("sid"),
        col("seg.piece").as("pc")).count()
      .agg(
        sum(when(col("sid") === 0, col("count")).otherwise(lit(0L)))
          .as("docs"),
        slice(sort_array(collect_list(when(col("count") > collectFloor,
          struct(col("count").as("n"),
            keyEnc(col("lang_a"), col("band_a"), col("sid"), col("pc"))
              .as("k")))), asc = false), 1, 10000).as("top"))
      .head()
    val docs = Option(statsRow.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val cap: Long =
      if (hotCap >= 0L) hotCap
      else math.max(LinkHotCap.toLong, docs / 100L)
    val hotKeys: Seq[String] = statsRow.getSeq[org.apache.spark.sql.Row](1)
      .filter(_.getLong(0) > cap).map(_.getString(1))

    if (hotKeys.isEmpty) {
      // skew-free corpus: exactly the direct pigeonhole join, no split
      val direct = segs.join(subs, keyEq && pairOk && verifyOk)
      if (!verify) direct.select(col("doc_a"), col("doc_b")).distinct()
      else direct.select(col("doc_a"), col("doc_b"),
        dist.cast("long").as("dist")).distinct()
    } else {
      val segHot =
        keyEnc(col("lang_a"), col("band_a"), col("seg.seg_id"),
          col("seg.piece")).isin(hotKeys: _*)
      val subHot =
        keyEnc(col("lang_b"), col("band_b"), col("sub.seg_id"),
          col("sub.piece")).isin(hotKeys: _*)
      val cold = segs.filter(!segHot)
        .join(subs.filter(!subHot), keyEq && pairOk && verifyOk)
        .select(col("doc_a"), col("doc_b"), col("key_a"), col("key_b"))

      // hot plane: explode the complement sub-pieces of the matched
      // segment (positions are literals per (seg_id, sub_id); the probe
      // side emits every consistency-feasible sub-shift)
      val segSub = element_at(array(LinkSubSegments.map { pieces =>
        array(pieces.zipWithIndex.map { case ((p, l, _), j) =>
          struct(lit(j).as("sub_id"),
            substring(col("key_a"), p, l).as("piece"))
        }: _*)
      }: _*), col("seg.seg_id") + 1)
      val subSub = element_at(array(LinkSubSegments.map { pieces =>
        array((for {
          ((p, l, after), j) <- pieces.zipWithIndex
          t <- math.max(1 - p, -LinkMaxDist) to LinkMaxDist
        } yield struct(lit(j).as("sub_id"), lit(t).as("shift"),
          lit(after).as("after"),
          substring(col("key_b"), p + t, l).as("piece"))): _*)
      }: _*), col("sub.seg_id") + 1)
      val s = col("sub.shift")
      val t = col("sub2.shift")
      val threeRegionOk = when(col("sub2.after"),
        abs(s) + abs(t - s) + abs(delta - t))
        .otherwise(abs(t) + abs(s - t) + abs(delta - s)) <= LinkMaxDist
      val hotPairs = segs.filter(segHot)
        .select(col("doc_a"), col("lang_a"), col("band_a"), col("key_a"),
          col("seg"), explode(segSub).as("seg2"))
        .join(subs.filter(subHot)
            .select(col("doc_b"), col("lang_b"), col("band_b"), col("key_b"),
              col("sub"), explode(subSub).as("sub2")),
          keyEq && col("seg2.sub_id") === col("sub2.sub_id") &&
            col("seg2.piece") === col("sub2.piece") &&
            pairOk && threeRegionOk && verifyOk)
        .select(col("doc_a"), col("doc_b"), col("key_a"), col("key_b"))

      val both = cold.unionAll(hotPairs)
      if (!verify) // the probe's candidate plane: pairs entering verify
        both.select(col("doc_a"), col("doc_b")).distinct()
      else
        both.select(col("doc_a"), col("doc_b"),
            levenshtein(col("key_a"), col("key_b"), LinkMaxDist)
              .cast("long").as("dist"))
          .distinct()
    }
  }

  /** PassJoin segmentation of the 64-char linkage key: MaxDist+1 = 6
    * segments (1-based (pos, len): four 11s then two 10s, covering all 64
    * chars) — enough that <=MaxDist edits must leave one segment intact. */
  val LinkMaxDist = 5
  val LinkSegments: Seq[(Int, Int)] =
    Seq((1, 11), (12, 11), (23, 11), (34, 11), (45, 10), (55, 10))

  /** Floor of the adaptive hot cap (the resolved cap is
    * max(LinkHotCap, corpus/100)): keys at or under it always join
    * directly; only boilerplate-grade keys — >1% of the corpus sharing
    * one segment's content — take the complement sub-piece plane. Env
    * override is for scale-probe experiments only. */
  val LinkHotCap = sys.env.get("SPARK_GRAFT_LINK_HOTCAP").map(_.toInt).getOrElse(64)

  /** Complement sub-segmentation for the hot plane: for each segment i,
    * 6 disjoint (pos, len, followsSegment) pieces covering every key char
    * OUTSIDE segment i — the region all ≤τ edits live in when segment i
    * is intact, so ≥1 sub-piece is intact in any ≤τ pair (the pigeonhole
    * again). Pieces never span the segment (each sits wholly before or
    * after it — the `followsSegment` flag drives the three-region shift
    * consistency). */
  val LinkSubSegments: Seq[Seq[(Int, Int, Boolean)]] = LinkSegments.map {
    case (p, l) =>
      val spans = Seq((1, p - 1, false), (p + l, 64 - (p + l) + 1, true))
        .filter(_._2 > 0)
      val total = spans.map(_._2).sum
      val nPieces = 6
      val alloc =
        if (spans.size == 2) {
          val a0 = math.min(nPieces - 1, math.max(1,
            math.round(nPieces.toDouble * spans.head._2 / total).toInt))
          Seq(a0, nPieces - a0)
        } else Seq(nPieces)
      spans.zip(alloc).flatMap { case ((start, len, after), k) =>
        (0 until k).map { j =>
          val s0 = start + j * len / k
          val s1 = start + (j + 1) * len / k
          (s0, s1 - s0, after)
        }
      }
  }

  // ---- q97: duplicated-span removal (sub-document dedup) ------------------

  /** q97: remove every k-token span that occurs more than once in the
    * corpus — the C4/RefinedWeb "drop duplicated lines/spans" curation op,
    * operating BELOW document granularity (q40–q47 drop whole documents;
    * boilerplate and template text duplicate at span level inside otherwise
    * unique documents).
    *
    * Span unit: 8-token windows (the corpus is single-line text, so the
    * "line" unit of classic line-dedup is a fixed token window here). A
    * position is removed if ANY duplicated window covers it; the cleaned
    * document is the remaining tokens in original order.
    *
    * Scale shape — inherently LINEAR, no pairwise anything: one pass
    * explodes ~n_tokens window hashes per doc (md5, 32-byte fixed-width
    * shuffle keys), the occurrence count is map-side combined, and only
    * occurrences of duplicated windows (tracking true duplicate density,
    * like the LSH family) come back to be unioned into per-doc removal
    * masks. Three shuffles total, each O(tokens) worst case and
    * O(duplicated tokens) after the count filter; the rebuild is a narrow
    * positional filter. At 100 TB this is the same plan with more
    * partitions — there is no block-growth failure mode to guard.
    *
    * Exactness: md5 is the cross-engine hash (CLAUDE.md recipe), window
    * text is byte-identical (same tokenizer as q60), and the oracle mirrors
    * the window enumeration, count, coverage union, and positional rebuild
    * over DuckDB ranges — full hash match including the cleaned text. */
  /** [[q97SpanDedup]]'s operator body over any (doc_id, text) frame. */
  def spanDedup(docs: DataFrame, K: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), words(col("text")).as("w"))
    val grams = toks.select(col("doc_id"), explode(ArrayExprs.letBind(col("w")) { w =>
        when(size(w) >= K,
          transform(sequence(lit(1), size(w) - (K - 1)),
            i => struct(i.as("i"), md5(concat_ws(" ", slice(w, i, lit(K)))).as("h"))))
          .otherwise(array().cast("array<struct<i:int,h:string>>"))
      }).as("g"))
      .select(col("doc_id"), col("g.i").as("i"), col("g.h").as("h"))
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("h"))
    val removed = grams.join(dup, "h")
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (K - 1))).as("j"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("j").cast("long"))).as("removed"))
    toks.join(removed, Seq("doc_id"), "left")
      .withColumn("rm", coalesce(col("removed"), array().cast("array<long>")))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        coalesce(size(col("removed")), lit(0)).cast("long").as("n_removed"),
        concat_ws(" ", transform(
          filter(sequence(lit(1L), size(col("w")).cast("long")),
            j => !array_contains(col("rm"), j)),
          j => element_at(col("w"), j.cast("int")))).as("cleaned"))
  }

  val q97SpanDedup: Q = locally {
    val K = 8
    Q(
      "q97_span_dedup",
      s"""WITH w AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
         |g AS (
         |  SELECT doc_id, i, md5(array_to_string(w[i:i+${K - 1}], ' ')) AS h
         |  FROM w, LATERAL (SELECT unnest(range(1, LEN(w) - ${K - 2})) AS i)),
         |dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) > 1),
         |cov AS (
         |  SELECT DISTINCT g.doc_id, j
         |  FROM g JOIN dup USING (h), LATERAL (SELECT unnest(range(i, i + $K)) AS j)),
         |rem AS (SELECT doc_id, list(j ORDER BY j) AS removed FROM cov GROUP BY doc_id)
         |SELECT w.doc_id,
         |  CAST(LEN(w.w) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(LEN(r.removed), 0) AS BIGINT) AS n_removed,
         |  COALESCE(array_to_string(list_transform(
         |    list_filter(range(1, LEN(w.w) + 1),
         |      j -> NOT list_contains(COALESCE(r.removed, CAST([] AS BIGINT[])), j)),
         |    j -> w.w[j]), ' '), '') AS cleaned
         |FROM w LEFT JOIN rem r USING (doc_id) ORDER BY w.doc_id""".stripMargin,
    ) { (s, d) =>
      spanDedup(Tables.documents(s, d), K).orderBy(col("doc_id"))
    }
  }

  val all: Seq[Q] = Seq(q40DedupExact, q41DedupJaccard, q42DedupMinhashLsh,
    q43DedupSimhash, q44DedupEmbed, q45DupGroups, q46Decontaminate,
    q47DedupApply, q48RecordLinkage, q58DupGroupsLsh, q97SpanDedup)
}
