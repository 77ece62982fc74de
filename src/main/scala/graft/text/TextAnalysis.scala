package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Text-analysis operators for large-scale training-data pipelines over the
  * `documents` table: token counting, quality scoring, language
  * identification, and document fingerprinting.
  *
  * All operators are per-document (narrow, zero-shuffle, whole-stage
  * codegen'd builtin expressions — no UDFs), so they scale linearly with
  * input partitions; only the explicit aggregations (top-terms) shuffle,
  * and those shuffle pre-aggregated partial maps, not raw tokens.
  *
  * The reference (d-smith/sfs3-kinesis) contains no text processing — this
  * module is the north-star extension surface (SURVEY.md §2.b) mandated by
  * BASELINE.json.
  */
object TextAnalysis {

  /** Whitespace tokenizer — the shared building block. */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** BPE-ish subword-count proxy: alpha runs, digit runs, and any other
    * non-space symbol each count as one token (the common pre-tokenizer
    * regex shape). */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** q60: per-document token statistics — whitespace tokens, distinct
    * tokens, BPE-ish tokens, chars-per-token. */
  val q60TextTokens: Q = Q(
    "q60_text_tokens",
    """SELECT doc_id,
      |  LEN(string_split_regex(text, '\s+')) AS n_tokens,
      |  LEN(list_distinct(string_split_regex(text, '\s+'))) AS n_distinct,
      |  LEN(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpeish,
      |  CAST(LENGTH(text) AS DOUBLE) / LEN(string_split_regex(text, '\s+')) AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    val t = tokens(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      bpeishCount(col("text")).cast("long").as("n_bpeish"),
      (length(col("text")).cast("double") / size(t)).as("chars_per_token"),
    ).orderBy(col("doc_id"))
  }

  /** q61: corpus top-terms — explode tokens, partial-aggregate per
    * partition, final top-k. The shuffle carries (token, partial_count)
    * pairs, never raw token streams; top-k is TakeOrderedAndProject (no
    * global sort) — the plan survives a 100× corpus. */
  val q61TopTerms: Q = Q(
    "q61_top_terms",
    """SELECT tok, COUNT(*) AS n
      |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents)
      |GROUP BY tok
      |ORDER BY n DESC, tok
      |LIMIT 20""".stripMargin,
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)
  }

  /** Quality heuristics (C4/Gopher-style): length, mean word length,
    * stopword ratio, non-alpha ratio, repetition (distinct/total tokens). */
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** q62: per-document quality scoring. A composite keep/drop flag mirrors
    * the usual pretraining filters (doc length in band, some stopwords,
    * low repetition). */
  val q62Quality: Q = Q(
    "q62_text_quality",
    s"""SELECT doc_id, lang, n_chars,
       |  LEN(string_split_regex(text, '\\s+')) AS n_tokens,
       |  CAST(LEN(list_filter(string_split_regex(text, '\\s+'),
       |        t -> list_contains(${stopwords.mkString("['", "','", "']")}, t))) AS DOUBLE)
       |    / LEN(string_split_regex(text, '\\s+')) AS stopword_ratio,
       |  CAST(LEN(list_distinct(string_split_regex(text, '\\s+'))) AS DOUBLE)
       |    / LEN(string_split_regex(text, '\\s+')) AS distinct_ratio,
       |  CAST(LENGTH(regexp_replace(text, '[a-z\\s]', '', 'g')) AS DOUBLE)
       |    / LENGTH(text) AS nonalpha_ratio,
       |  (n_chars BETWEEN 100 AND 500)
       |    AND LEN(list_filter(string_split_regex(text, '\\s+'),
       |          t -> list_contains(${stopwords.mkString("['", "','", "']")}, t))) > 0
       |    AND CAST(LEN(list_distinct(string_split_regex(text, '\\s+'))) AS DOUBLE)
       |      / LEN(string_split_regex(text, '\\s+')) > 0.2 AS keep
       |FROM documents ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    val t = tokens(col("text"))
    val sw = lit(stopwords.toArray)
    // occurrence-counting (not array_intersect, which would dedup) to match
    // the oracle's list_filter/list_contains form:
    val stopCount = size(filter(t, tok => array_contains(sw, tok)))
    val distinctRatio = size(array_distinct(t)).cast("double") / size(t)
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("n_chars"),
      size(t).cast("long").as("n_tokens"),
      (stopCount.cast("double") / size(t)).as("stopword_ratio"),
      distinctRatio.as("distinct_ratio"),
      (length(regexp_replace(col("text"), "[a-z\\s]", "")).cast("double") /
        length(col("text"))).as("nonalpha_ratio"),
      (col("n_chars").between(100, 500) && stopCount > 0 && distinctRatio > 0.2)
        .as("keep"),
    ).orderBy(col("doc_id"))
  }

  /** Language-ID profiles: tiny per-language marker-token sets (an n-gram
    * profile reduced to its most discriminative unigrams — the classic
    * textcat heuristic at vocabulary scale). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "is"),
    "es" -> Seq("el", "la", "de", "es"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "est"),
  )

  /** q63: heuristic language identification — score each language profile
    * by marker-occurrence count over the token stream, predict the argmax
    * (ties broken by profile order), with a confidence ratio. On this
    * synthetic corpus (shared vocabulary) the prediction is mostly 'und' —
    * the operator's mechanics (profile scoring, deterministic argmax) are
    * what's exercised; the spec covers real-text behavior. */
  val q63LangId: Q = Q(
    "q63_text_langid",
    {
      val scoresSql = langMarkers.map { case (l, ms) =>
        s"LEN(list_filter(string_split_regex(text, '\\s+'), t -> list_contains(${ms.mkString("['", "','", "']")}, t))) AS s_$l"
      }.mkString(",\n  ")
      val best = langMarkers.map { case (l, _) => s"s_$l" }.mkString("GREATEST(", ", ", ")")
      val pick = langMarkers.map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }
        .mkString("CASE ", " ", " END")
      s"""WITH scored AS (SELECT doc_id, lang,
         |  $scoresSql
         |FROM documents),
         |best_t AS (SELECT *, $best AS best FROM scored)
         |SELECT doc_id, lang AS labeled_lang,
         |  CASE WHEN best = 0 THEN 'und' ELSE $pick END AS predicted_lang,
         |  best AS best_score
         |FROM best_t ORDER BY doc_id""".stripMargin
    },
  ) { (s, d) =>
    val t = tokens(col("text"))
    val scored = Tables.documents(s, d).select(
      (Seq(col("doc_id"), col("lang")) ++ langMarkers.map { case (l, ms) =>
        size(filter(t, tok => array_contains(lit(ms.toArray), tok))).as(s"s_$l")
      }): _*)
    val best = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
    // first matching profile wins (en before es …), mirroring the oracle's
    // CASE arm order:
    val pickFirst = langMarkers.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (l, _)) => when(col(s"s_$l") === col("best"), l).otherwise(acc)
    }
    scored.withColumn("best", best)
      .select(
        col("doc_id"), col("lang").as("labeled_lang"),
        when(col("best") === 0, "und").otherwise(pickFirst).as("predicted_lang"),
        col("best").cast("long").as("best_score"),
      ).orderBy(col("doc_id"))
  }

  /** q64: document fingerprinting — md5 content hash of the
    * whitespace-normalized text plus a coarse structural fingerprint
    * (length band × leading token), the join key shape used for
    * fingerprint-based dedup at corpus scale. */
  val q64Fingerprint: Q = Q(
    "q64_text_fingerprint",
    """SELECT doc_id,
      |  md5(regexp_replace(text, '\s+', ' ', 'g')) AS content_md5,
      |  CONCAT(CAST(CAST(FLOOR(n_chars / 100) AS BIGINT) AS VARCHAR), ':',
      |         string_split_regex(text, '\s+')[1]) AS coarse_fp
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(regexp_replace(col("text"), "\\s+", " ")).as("content_md5"),
      concat(floor(col("n_chars") / 100).cast("long").cast("string"), lit(":"),
        element_at(tokens(col("text")), 1)).as("coarse_fp"),
    ).orderBy(col("doc_id"))
  }

  /** q65: rolling-hash (Rabin-Karp style) shingle fingerprints — the
    * winnowing building block. Hash values are engine-specific (xxhash64
    * seeds do not exist in DuckDB) → rows-only driver check; exact semantics
    * are pinned by TextAnalysisSpec. Emits the min-hash-per-document of the
    * 5-gram shingle hashes: a 1-permutation minhash sketch. */
  val q65RollingHash: Q = Q.rowsOnly("q65_text_rollinghash") { (s, d) =>
    import graft.functions.ArrayExprs.letBind
    val n = 5
    // shingles: sliding word 5-grams via transform over an index range;
    // docs shorter than n tokens fall back to one whole-doc shingle (ANSI
    // mode would throw on an out-of-range element_at). The tokens array and
    // the shingle array are let-bound so tokenization runs once per row and
    // the shingles once per output column (not once per element_at).
    val fp = letBind(tokens(col("text"))) { t =>
      letBind(when(size(t) >= n,
        transform(
          sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*)))
        .otherwise(array(concat_ws(" ", t)))) { sh =>
        struct(
          array_min(transform(sh, s0 => xxhash64(s0))).as("min_shingle_hash"),
          size(sh).cast("long").as("n_shingles"))
      }
    }
    Tables.documents(s, d).select(col("doc_id"), fp.as("fp"))
      .select(col("doc_id"),
        col("fp.min_shingle_hash"), col("fp.n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** q66: TF-IDF — top-3 terms per document by tf·ln(N/df). Three
    * aggregations, all map-side-partial (the shuffles carry (doc, term,
    * partial-count) and (term, partial-df), never token streams); the
    * document-frequency table joins back on term. Scores are identical
    * IEEE arithmetic in both engines; rounding only guards the rank
    * comparison. */
  val q66Tfidf: Q = Q(
    "q66_text_tfidf",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.tok,
      |    ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS tfidf
      |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
      |SELECT doc_id, tok, tfidf, rnk FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, tok) AS rnk
      |  FROM scored)
      |WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin,
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // df DERIVED from tf — one row per (doc, tok) exists there, so
    // count-per-tok ≡ countDistinct(doc_id) over raw tokens, WITHOUT a
    // second tokenize+explode pass over the corpus (at 100 TB the raw
    // scan dominates; tf is orders of magnitude smaller)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, Seq("tok")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** q67: corpus top bigrams via the custom `graft_ngrams` GENERATOR
    * (functions.Generators.WordNgrams — the UDTF row of §2.b): grams are
    * emitted as rows straight into the partial aggregation, never
    * materialized as a per-document array. Same shuffle discipline as
    * q61: (gram, partial count) pairs, TakeOrderedAndProject top-k. */
  val q67Bigrams: Q = Q(
    "q67_text_bigrams",
    """WITH w AS (SELECT string_split_regex(text, '\s+') AS w FROM documents),
      |grams AS (
      |  SELECT unnest(list_transform(range(1, LEN(w)), i -> w[i] || ' ' || w[i+1])) AS ngram
      |  FROM w)
      |SELECT ngram, COUNT(*) AS n
      |FROM grams GROUP BY ngram
      |ORDER BY n DESC, ngram
      |LIMIT 10""".stripMargin,
  ) { (s, d) =>
    graft.functions.ArrayExprs.register(s)
    Tables.documents(s, d)
      .select(expr("graft_ngrams(text, 2)"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(10)
  }

  /** q73: repetition scoring — the Gopher/FineWeb-style quality signal q62
    * does not cover: documents dominated by REPEATED content (boilerplate,
    * templating, degenerate generations) are flagged by (a) the duplicate
    * word fraction, (b) the duplicate bigram fraction, and (c) the mass of
    * the single most frequent bigram. Per-row word stats are narrow HOFs;
    * the bigram stats stream through the `graft_ngrams` generator into a
    * (doc_id, bigram) partial aggregation — map-side combined, so the
    * shuffle carries per-doc-distinct bigram counts, not the raw gram
    * stream. Fractions are irrational doubles → round(…, 6) on both
    * engines (the CLAUDE.md recipe). */
  val q73Repetition: Q = Q(
    "q73_text_repetition",
    """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |ws AS (
      |  SELECT doc_id, LEN(w) AS n_words,
      |    LEN(list_distinct(w)) AS n_distinct_words
      |  FROM t WHERE LEN(w) >= 2),
      |b AS (
      |  SELECT doc_id, unnest(list_transform(range(1, LEN(w)),
      |    i -> w[i] || ' ' || w[i+1])) AS bg
      |  FROM t WHERE LEN(w) >= 2),
      |counts AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, SUM(c) AS total, COUNT(*) AS n_distinct, MAX(c) AS top
      |  FROM counts GROUP BY doc_id)
      |SELECT ws.doc_id, ws.n_words,
      |  ROUND(1 - CAST(ws.n_distinct_words AS DOUBLE) / ws.n_words, 6)
      |    AS dup_word_frac,
      |  ROUND(1 - CAST(agg.n_distinct AS DOUBLE) / agg.total, 6)
      |    AS dup_bigram_frac,
      |  ROUND(CAST(agg.top AS DOUBLE) / agg.total, 6) AS top_bigram_frac
      |FROM ws JOIN agg ON ws.doc_id = agg.doc_id
      |ORDER BY ws.doc_id""".stripMargin,
  ) { (s, d) =>
    graft.functions.ArrayExprs.register(s)
    val docs = Tables.fanOut(Tables.documents(s, d))
    val ws = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"))
    // no <2-word filter here: graft_ngrams emits zero rows for such docs
    // (non-outer Generate drops them) and the ws-side join excludes them
    // anyway — an explicit filter would just re-split every text
    val agg = docs
      .select(col("doc_id"), expr("graft_ngrams(text, 2)"))
      .groupBy(col("doc_id"), col("ngram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top"))
    ws.join(agg, "doc_id")
      .select(col("doc_id"), col("n_words"),
        round(lit(1) - col("n_distinct_words").cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        round(lit(1) - col("n_distinct").cast("double") / col("total"), 6)
          .as("dup_bigram_frac"),
        round(col("top").cast("double") / col("total"), 6).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Email/phone patterns shared by the Spark impl and the DuckDB oracle —
    * restricted to syntax both Java regex and RE2 interpret identically
    * (char classes, bounded repeats, \b; no lookaround). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** q68: PII detection + redaction — the scrub pass every training corpus
    * goes through before the tokenizer. The synthetic corpus carries no
    * PII, so the query first models it deterministically (an email for
    * every 3rd doc, a phone for every 4th — same in-query corpus-modeling
    * trick as q40's recrawl), then counts and redacts both patterns.
    * Narrow per-row regex work, zero shuffles, whole-stage codegen'd;
    * output pins the redacted text via md5 so the oracle check covers the
    * exact replacement, not just the counts. */
  val q68PiiRedaction: Q = Q(
    "q68_pii_redaction",
    s"""WITH corpus AS (
       |  SELECT doc_id,
       |    text || CASE WHEN doc_id % 3 = 0
       |        THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
       |      || CASE WHEN doc_id % 4 = 0
       |        THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |        ELSE '' END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  LEN(regexp_extract_all(text, '$EmailRe')) AS n_emails,
       |  LEN(regexp_extract_all(text, '$PhoneRe')) AS n_phones,
       |  md5(regexp_replace(regexp_replace(text, '$EmailRe', '[EMAIL]', 'g'),
       |      '$PhoneRe', '[PHONE]', 'g')) AS redacted_md5
       |FROM corpus ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    val withPii = concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .otherwise(""),
      when(col("doc_id") % 4 === 0,
        concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(""))
    Tables.documents(s, d)
      .select(col("doc_id"), withPii.as("text"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("text"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** q69: document chunking — overlapping fixed-size token windows
    * (32 tokens, stride 24), the split step for context-window-bounded
    * consumers (RAG indexing, fixed-window encoders); the inverse concern
    * of q92's concat-and-chunk packing. Narrow per-row generate: each doc
    * explodes into ceil(len/stride) chunk rows, content pinned via md5 so
    * the oracle checks the exact chunk text, not just counts. The token
    * array is let-bound (split runs once per doc, not once per chunk
    * element). */
  val q69Chunking: Q = Q(
    "q69_text_chunking",
    """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |chunks AS (
      |  SELECT doc_id, CAST((i - 1) // 24 AS BIGINT) AS chunk_no,
      |    array_to_string(w[i:i+31], ' ') AS chunk,
      |    CAST(LEAST(LEN(w) - i + 1, 32) AS BIGINT) AS n_tok
      |  FROM t, LATERAL (SELECT
      |    unnest(range(1, GREATEST(LEN(w) - 32 + 24, 1) + 1, 24)) AS i))
      |SELECT doc_id, chunk_no, n_tok, md5(chunk) AS chunk_md5
      |FROM chunks ORDER BY doc_id, chunk_no""".stripMargin,
  ) { (s, d) =>
    val win = 32
    val stride = 24
    val chunks = graft.functions.ArrayExprs.letBind(tokens(col("text"))) { w =>
      transform(
        // last start = smallest stride-grid point whose window reaches the
        // final token (len - win + stride); Spark sequence is
        // bound-INCLUSIVE, DuckDB range is EXCLUSIVE — the oracle adds +1
        sequence(lit(1), greatest(size(w) - win + stride, lit(1)), lit(stride)),
        i => struct(
          // (i-1)/stride on positive ints: double division + long cast
          // truncates == floor, exact below 2^53
          ((i - 1) / stride).cast("long").as("chunk_no"),
          concat_ws(" ", slice(w, i, lit(win))).as("chunk"),
          least(size(w) - i + 1, lit(win)).cast("long").as("n_tok")))
    }
    Tables.documents(s, d)
      .select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_no"), col("c.n_tok"),
        md5(col("c.chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_no"))
  }

  // ---- q98: data-mixture rebalancing -------------------------------------

  /** q98: rebalance the corpus to a uniform per-language token budget — the
    * "data mixing" step of a training pipeline (each source/language gets a
    * target share; over-represented slices are down-sampled to it). The
    * budget here is the smallest language's token total; each language is
    * kept at rate `floor(10000·budget/total)` basis points.
    *
    * This composes q90's per-stratum deterministic sampling with rates
    * DERIVED FROM CORPUS STATS instead of a static table: one aggregation
    * computes per-language totals, the global budget rides along as an
    * in-plan broadcast scalar (no driver round-trip), and the row filter is
    * the md5-bucket-below-rate predicate — reproducible forever across
    * runs, retries, and engines, never `rand()`. Integer basis points keep
    * the threshold exact (no float rate to drift cross-engine).
    *
    * Scale: the rate table is one row per language (broadcast); the
    * selection is a narrow scan+filter. Output is every kept document with
    * its language's rate — the oracle re-derives rates and membership, so
    * a drifted rate or hash breaks the full hash match. */
  val q98MixtureRebalance: Q = Q(
    "q98_mixture_rebalance",
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(LEN(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |tot AS (SELECT lang, SUM(n_tok) AS tot FROM d GROUP BY lang),
      |rates AS (
      |  SELECT lang, CAST(tot AS BIGINT) AS lang_tokens,
      |    CAST((10000 * (SELECT MIN(tot) FROM tot)) // tot AS BIGINT) AS rate_bp
      |  FROM tot)
      |SELECT d.doc_id, d.lang, d.n_tok, r.rate_bp
      |FROM d JOIN rates r USING (lang)
      |WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS INTEGER)
      |        % 10000 < r.rate_bp
      |ORDER BY d.doc_id""".stripMargin,
  ) { (s, d) =>
    mixtureRebalance(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** [[q98MixtureRebalance]]'s operator body over any (doc_id, lang, text)
    * frame. */
  def mixtureRebalance(input: DataFrame): DataFrame = {
    val docs = input.select(col("doc_id"), col("lang"),
      size(tokens(col("text"))).cast("long").as("n_tok"))
    val tot = docs.groupBy(col("lang")).agg(sum(col("n_tok")).as("tot"))
    // no broadcast hints: the rate/budget frames are corpus-derived —
    // AQE broadcasts them from their actual (language-bounded) sizes
    val budget = tot.agg(min(col("tot")).as("budget"))
    val rates = tot.crossJoin(budget)
      .select(col("lang"), expr("(10000 * budget) div tot").as("rate_bp"))
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 10000
    docs.join(rates, "lang")
      .filter(bucket < col("rate_bp"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("rate_bp"))
  }

  // ---- q99: n-gram LM cross-entropy scoring ------------------------------

  /** q99: per-document cross-entropy under a corpus-trained bigram language
    * model with add-one smoothing — the CCNet/KenLM-style quality signal
    * (documents whose token transitions are improbable under the corpus LM
    * score high = out-of-distribution). p(w₂|w₁) = (C(w₁w₂)+1)/(C(w₁·)+V),
    * score = −(1/n)·Σ ln p over the document's bigrams.
    *
    * Train and score are ONE job: the conditional counts are aggregations
    * over the exploded bigram stream (map-side combined; the count tables
    * are vocabulary-sized, so AQE broadcasts them back onto the stream),
    * the vocabulary size rides as an in-plan broadcast scalar, and the
    * per-document reduction shuffles (doc_id, fixed_point_term) pairs.
    * Linear end to end; at 100 TB the count tables are the model artifact
    * you would persist and reuse.
    *
    * Exactness: each −ln p term is snapped to fixed-point longs at 1e6
    * (`floor(x·1e6+0.5)` — the one cross-engine-identical rounding), the
    * per-doc sum is integer (associative), and only the final display
    * average divides in double. Both engines evaluate ln on identical
    * integer-valued doubles, so the snapped terms agree. */
  val q99LmCrossEntropy: Q = Q(
    "q99_lm_cross_entropy",
    """WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      |bg AS (
      |  SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS bg
      |  FROM w, LATERAL (SELECT unnest(range(1, LEN(w))) AS i)),
      |cbg AS (SELECT bg, COUNT(*) AS cbg FROM bg GROUP BY bg),
      |cw1 AS (SELECT w1, COUNT(*) AS cw1 FROM bg GROUP BY w1),
      |v AS (SELECT COUNT(DISTINCT t) AS v FROM (SELECT unnest(w) AS t FROM w)),
      |term AS (
      |  SELECT b.doc_id,
      |    CAST(FLOOR((ln(CAST(c1.cw1 + (SELECT v FROM v) AS DOUBLE))
      |                - ln(CAST(c2.cbg + 1 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS t
      |  FROM bg b JOIN cbg c2 USING (bg) JOIN cw1 c1 USING (w1))
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  ROUND(CAST(SUM(t) AS DOUBLE) / COUNT(*) / 1000000, 6) AS avg_nll
      |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  ) { (s, d) =>
    lmCrossEntropy(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** [[q99LmCrossEntropy]]'s operator body over any (doc_id, text) frame. */
  def lmCrossEntropy(input: DataFrame): DataFrame = {
    val toks = input
      .select(col("doc_id"), tokens(col("text")).as("w"))
    val bg = toks.select(col("doc_id"),
        explode(graft.functions.ArrayExprs.letBind(col("w")) { w =>
          when(size(w) >= 2,
            transform(sequence(lit(1), size(w) - 1),
              i => struct(element_at(w, i).as("w1"),
                concat_ws(" ", element_at(w, i), element_at(w, i + 1)).as("bg"))))
            .otherwise(array().cast("array<struct<w1:string,bg:string>>"))
        }).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    val cbg = bg.groupBy(col("bg")).agg(count(lit(1)).as("cbg"))
    val cw1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("cw1"))
    val vocab = toks.select(explode(col("w")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    bg.join(cbg, "bg").join(cw1, "w1").crossJoin(vocab)
      .select(col("doc_id"),
        floor((log(col("cw1").plus(col("v")).cast("double"))
          - log(col("cbg").plus(lit(1)).cast("double"))) * 1000000d + 0.5d)
          .cast("long").as("t"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(sum(col("t")).cast("double") / count(lit(1)) / 1000000d, 6)
          .as("avg_nll"))
  }

  // ---- q102: BM25 ranked retrieval ----------------------------------------

  /** BM25 parameters (Robertson/Spärck Jones defaults) and the demo query.
    * k1+1 = 2.2 and 1−b = 0.25 are folded to literals so the oracle's
    * arithmetic dag is textually identical. */
  val Bm25QueryTerms: Seq[String] = Seq("join", "hash", "scan")

  /** q102: BM25 top-10 retrieval over the corpus for a fixed conjunctive
    * query — the ranked-retrieval step on top of q66's tf-idf statistics
    * (what a training-data pipeline uses for targeted corpus probes and
    * what q46-style decontamination escalates to when fuzzy matching is
    * needed). score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with k1=1.2, b=0.75, idf = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Scale: one tokenize pass; doc-length and per-(doc, term) counts are
    * map-side-combined aggregations; the query-term frames (tf filtered to
    * |Q| terms, df of |Q| rows, the 1-row corpus stats) are tiny — AQE
    * broadcasts them from actual sizes (no hints on corpus-derived
    * frames), so the only corpus-sized shuffles carry (doc, count) pairs.
    * Top-k is one TakeOrdered, not a global sort.
    *
    * Exactness: every per-term weight is computed on doubles by the same
    * parenthesized dag in both engines (identical IEEE results), snapped
    * to fixed-point micros via `floor(x·1e6+0.5)`, and summed as longs
    * (associative); ranking orders by the integer micros. The one
    * re-division to a display double is exact-input identical. */
  val q102Bm25: Q = Q(
    "q102_bm25_search",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
      |dlen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      |stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tot FROM dlen),
      |tfq AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      |  WHERE tok IN ('join', 'hash', 'scan') GROUP BY doc_id, tok),
      |dfq AS (SELECT tok, COUNT(*) AS df FROM tfq GROUP BY tok),
      |w AS (SELECT t.doc_id,
      |    CAST(FLOOR((LN(1.0 + (CAST(s.n AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
      |                        / (CAST(f.df AS DOUBLE) + 0.5))
      |      * ((CAST(t.tf AS DOUBLE) * 2.2)
      |         / (CAST(t.tf AS DOUBLE)
      |            + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE)
      |                                    / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE)))))))
      |      * 1000000.0 + 0.5) AS BIGINT) AS wm
      |  FROM tfq t JOIN dlen l USING (doc_id) JOIN dfq f USING (tok) CROSS JOIN stats s),
      |sc AS (SELECT doc_id, CAST(SUM(wm) AS BIGINT) AS score_micro FROM w GROUP BY doc_id)
      |SELECT doc_id, CAST(score_micro AS DOUBLE) / 1000000.0 AS score, rnk
      |FROM (SELECT doc_id, score_micro,
      |        ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rnk FROM sc)
      |WHERE rnk <= 10 ORDER BY rnk""".stripMargin,
  ) { (s, d) =>
    bm25TopK(Tables.documents(s, d), Bm25QueryTerms, 10)
  }

  /** Fixed-point BM25 term weights `(doc_id, tok, wm)` over any
    * (doc_id, text) frame, for the term set given as a one-column `(tok)`
    * frame — the shared scoring core of q102 (literal query) and q112
    * (per-query term sets). Micro-int weights make per-doc sums
    * order-independent and oracle-exact. */
  def bm25Weights(input: DataFrame, terms: DataFrame): DataFrame = {
    val toks = input.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dlen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dlen.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
    val tfq = toks.join(terms.select(col("tok")).distinct(), "tok")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") /
            (col("tot").cast("double") / col("n").cast("double")))))
    tfq.join(dlen, "doc_id").join(dfq, "tok").crossJoin(stats)
      .select(col("doc_id"), col("tok"),
        floor(idf * tfn * lit(1000000.0) + lit(0.5)).as("wm"))
  }

  /** [[q102Bm25]]'s operator body: BM25 top-`k` over any (doc_id, text)
    * frame for `terms`. */
  def bm25TopK(input: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val termsDf = input.sparkSession.createDataset(terms)(
      org.apache.spark.sql.Encoders.STRING).toDF("tok")
    val scored = bm25Weights(input, termsDf)
      .groupBy(col("doc_id")).agg(sum(col("wm")).as("score_micro"))
    // top-k FIRST via orderBy+limit (TakeOrderedAndProject — distributed
    // partial top-k, no global sort), then rank the k survivors; a global
    // row_number window here would single-partition the whole corpus
    val top = scored.orderBy(col("score_micro").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("score_micro").desc, col("doc_id"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("doc_id"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("score"),
        col("rnk"))
      .orderBy(col("rnk"))
  }

  // ---- q103: weighted reservoir sampling (A-ES) ---------------------------

  /** q103: per-language weighted sample without replacement — the
    * Efraimidis–Spirakis A-ES scheme: each doc draws u ∈ (0,1] from a
    * salted md5 (the oracle-reproducible uniform), and the k docs with the
    * largest u^(1/w) — equivalently the largest ln(u)/w — win. Heavier
    * docs (weight = n_chars, the stand-in for a quality score) win
    * proportionally more often; the result is deterministic given the
    * salt. This is the sampling step a curation pipeline uses to draw a
    * quality-weighted eval slice per language.
    *
    * Scale: one narrow projection computes the key (md5 + one ln per row,
    * no shuffle), then one per-group top-k window over (lang). A 100 TB
    * deployment replaces the window with the bounded TopKHits aggregator
    * (q50's shape) — semantics identical; the windowed form is the
    * SQL-checkable one.
    *
    * Exactness: u = (x+1)/2^48 where x is the first 48 md5 bits — the
    * division is by a power of two, so u is exact; ln(u)/w is the same
    * IEEE dag both engines; ordering on (key, doc_id) is total. */
  val q103WeightedSample: Q = Q(
    "q103_weighted_sample",
    """WITH k AS (
      |  SELECT lang, doc_id, n_chars,
      |    LN((CAST(CAST('0x' || SUBSTRING(md5('q103|' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE) + 1.0)
      |       / 281474976710656.0) / CAST(n_chars AS DOUBLE) AS key
      |  FROM documents)
      |SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS weight, rnk
      |FROM (SELECT lang, doc_id, n_chars,
      |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rnk
      |      FROM k)
      |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,
  ) { (s, d) =>
    weightedSample(Tables.documents(s, d), col("lang"), col("n_chars"), 5)
  }

  /** [[q103WeightedSample]]'s operator body: A-ES top-`k` per `group` with
    * `weight` (strictly positive) over any frame with a doc_id column. */
  def weightedSample(input: DataFrame, group: Column, weight: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (conv(substring(md5(concat(lit("q103|"), col("doc_id").cast("string"))), 1, 12),
      16, 10).cast("bigint").cast("double") + lit(1.0)) / lit(281474976710656.0)
    val key = log(u) / weight.cast("double")
    input.select(group.as("lang"), col("doc_id"), weight.as("w0"), key.as("key"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("key").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("doc_id"), col("w0").cast("long").as("weight"), col("rnk"))
      .orderBy(col("lang"), col("rnk"))
  }

  // ---- q111: iterative merge learning (word2phrase / BPE merge step) ------

  private val MergeRounds = 3

  /** q111: collocation-merge learning — the word2phrase / BPE-merge-table
    * training step of a tokenizer pipeline: [[MergeRounds]] rounds of
    * "count adjacent pairs, merge the most frequent pair everywhere",
    * reported as the learned merge table (pair, occurrence count, corpus
    * token count after the merge).
    *
    * The corpus is held POSITIONALLY — `(doc_id, i, w)` — and each round
    * is two window passes and one aggregation (lead/lag neighbors, pair
    * counts, ROW_NUMBER re-index after the merge), all shuffles keyed by
    * doc_id or pair: the textbook distributed form, no per-doc loops, and
    * every construct exists verbatim in both engines, so the 3 unrolled
    * CTE rounds hash-match exactly — tie-breaks on (count DESC, a, b) are
    * binary-identical on this ASCII corpus. Self-pairs (a = b) are
    * excluded: with a ≠ b, adjacent occurrences can never overlap, so
    * "merge everywhere" is purely positional (greedy left-to-right and
    * all-positions agree) — the property that keeps the operator
    * window-expressible instead of a sequential per-doc fold. The winning
    * pair stays IN-PLAN (a one-row frame cross-joined into the rebuild),
    * so the 3 rounds compose lazily with no per-round driver sync beyond
    * the iterative family's usual localCheckpoint. Real tokenizer
    * training samples the corpus first; the shape here is the full-corpus
    * form (the sample is just a filter upstream). */
  val q111MergeLearning: Q = Q(
    "q111_merge_learning", {
      def round(r: Int): String = {
        val prev = if (r == 1) "t0" else s"t${r - 1}"
        s""",
           |p$r AS (
           |  SELECT doc_id, i, w,
           |    LEAD(w) OVER (PARTITION BY doc_id ORDER BY i) AS nx,
           |    LAG(w)  OVER (PARTITION BY doc_id ORDER BY i) AS pv
           |  FROM $prev),
           |c$r AS (
           |  SELECT w AS a, nx AS b, COUNT(*) AS cnt FROM p$r
           |  WHERE nx IS NOT NULL AND w <> nx GROUP BY 1, 2),
           |m$r AS (SELECT a, b, cnt FROM c$r ORDER BY cnt DESC, a, b LIMIT 1),
           |t$r AS (
           |  SELECT doc_id,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS i,
           |    CASE WHEN w = m.a AND nx IS NOT NULL AND nx = m.b
           |         THEN m.a || '_' || m.b ELSE w END AS w
           |  FROM p$r, m$r m
           |  WHERE pv IS NULL OR NOT (pv = m.a AND w = m.b)),
           |s$r AS (
           |  SELECT $r AS round, m.a AS token_a, m.b AS token_b,
           |    CAST(m.cnt AS BIGINT) AS n_merges,
           |    (SELECT COUNT(*) FROM t$r) AS tokens_after
           |  FROM m$r m)""".stripMargin
      }
      s"""WITH t0 AS (
         |  SELECT doc_id, i.i AS i, w[i.i] AS w
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |        FROM documents) d,
         |  LATERAL (SELECT unnest(range(1, LEN(w) + 1)) AS i) i)""".stripMargin +
        (1 to MergeRounds).map(round).mkString +
        "\nSELECT * FROM " +
        (1 to MergeRounds).map(r => s"s$r").mkString(" UNION ALL SELECT * FROM ") +
        "\nORDER BY round"
    },
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    var t = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("i", "w")))
      .localCheckpoint()
    // token count maintained ARITHMETICALLY: merging the winning a≠b
    // pair removes exactly one token per occurrence and occurrences
    // cannot overlap (the class-doc property), so tokens_after =
    // prev − n_merges — the per-round corpus count job is gone, and the
    // winning one-row merge collects to LITERALS (no crossJoin-broadcast
    // in the rebuild plan). Jobs per round: 4 → 2 (r17; guide §1.2).
    var tokensAfter = t.count()
    val stats = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long)]
    (1 to MergeRounds).foreach { r =>
      val p = t.select(col("doc_id"), col("i"), col("w"),
        lead(col("w"), 1).over(byDoc).as("nx"),
        lag(col("w"), 1).over(byDoc).as("pv"))
      val mRows = p.filter(col("nx").isNotNull && col("w") =!= col("nx"))
        .groupBy(col("w").as("a"), col("nx").as("b")).count()
        .orderBy(col("count").desc, col("a"), col("b")).limit(1).collect()
      if (mRows.isEmpty) {
        // no adjacent a≠b pair left: the oracle's m$r/s$r CTEs are empty
        // and its t$r (FROM p$r, m$r) empties the corpus — mirror both
        t = t.filter(lit(false)).localCheckpoint()
        tokensAfter = 0L
      } else {
        val (a, b, cnt) =
          (mRows(0).getString(0), mRows(0).getString(1), mRows(0).getLong(2))
        t = p
          .filter(col("pv").isNull ||
            !(col("pv") === lit(a) && col("w") === lit(b)))
          .select(col("doc_id"),
            row_number().over(byDoc).as("i"),
            when(col("w") === lit(a) && col("nx").isNotNull &&
                col("nx") === lit(b),
              lit(s"${a}_$b")).otherwise(col("w")).as("w"))
          .localCheckpoint()
        tokensAfter -= cnt
        stats += ((r, a, b, cnt, tokensAfter))
      }
    }
    stats.toSeq
      .toDF("round", "token_a", "token_b", "n_merges", "tokens_after")
      .select(col("round"), col("token_a"), col("token_b"),
        col("n_merges"), col("tokens_after"))
      .orderBy(col("round"))
  }

  // ---- q131: merge-table APPLICATION (the corpus-wide tokenize pass) ------

  /** q131: apply a LEARNED merge table corpus-wide — the tokenization
    * pass a training pipeline runs over 100 TB once the tokenizer is
    * trained (the operator q111 was missing: q111 LEARNS the table;
    * nothing applied it to unseen text). The table is learned with
    * q111's machinery on a SAMPLE (doc_id % 4 = 0 — real tokenizer
    * training never scans the full corpus), then the WHOLE table is
    * applied to every document in ONE corpus pass: BPE application
    * (unlike learning) needs no global coordination — the table is fixed
    * and rank-ordered, so per-document application is a partition-local
    * fold ([[graft.functions.BpeApply]], the table riding the plan as a
    * reference object; the q50 bounded-artifact discipline). Runtime is
    * flat in merge-table size per corpus pass — one pass whether the
    * table has 3 merges or a real tokenizer's ~30k — where the previous
    * one-lead/lag-window-round-PER-MERGE shape cost O(table) full passes
    * (the r9 verdict's scale-killer). Each merge inside the fold keeps
    * the window round's exact simultaneous original-neighbor semantics,
    * so the unrolled-round SQL stays the exact oracle (fold ≡ rounds is
    * also spec-pinned in ArrayExprsSpec on adversarial run/overlap
    * cases). Output carries the space-joined token string, so the oracle
    * hash-checks the TOKENIZATION, not just counts; composition q111 →
    * apply → q109 is the output's n_tokens feeding sequence packing. */
  val q131BpeApply: Q = Q(
    "q131_bpe_apply", {
      def learnRound(r: Int): String = {
        val prev = if (r == 1) "t0s" else s"t${r - 1}"
        s""",
           |p$r AS (
           |  SELECT doc_id, i, w,
           |    LEAD(w) OVER (PARTITION BY doc_id ORDER BY i) AS nx,
           |    LAG(w)  OVER (PARTITION BY doc_id ORDER BY i) AS pv
           |  FROM $prev),
           |c$r AS (
           |  SELECT w AS a, nx AS b, COUNT(*) AS cnt FROM p$r
           |  WHERE nx IS NOT NULL AND w <> nx GROUP BY 1, 2),
           |m$r AS (SELECT a, b, cnt FROM c$r ORDER BY cnt DESC, a, b LIMIT 1),
           |t$r AS (
           |  SELECT doc_id,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS i,
           |    CASE WHEN w = m.a AND nx IS NOT NULL AND nx = m.b
           |         THEN m.a || '_' || m.b ELSE w END AS w
           |  FROM p$r, m$r m
           |  WHERE pv IS NULL OR NOT (pv = m.a AND w = m.b))""".stripMargin
      }
      def applyRound(r: Int): String = {
        val prev = if (r == 1) "t0f" else s"u${r - 1}"
        s""",
           |q$r AS (
           |  SELECT doc_id, i, w,
           |    LEAD(w) OVER (PARTITION BY doc_id ORDER BY i) AS nx,
           |    LAG(w)  OVER (PARTITION BY doc_id ORDER BY i) AS pv
           |  FROM $prev),
           |u$r AS (
           |  SELECT doc_id,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS i,
           |    CASE WHEN w = m.a AND nx IS NOT NULL AND nx = m.b
           |         THEN m.a || '_' || m.b ELSE w END AS w
           |  FROM q$r, m$r m
           |  WHERE pv IS NULL OR NOT (pv = m.a AND w = m.b))""".stripMargin
      }
      s"""WITH t0s AS (
         |  SELECT doc_id, i.i AS i, w[i.i] AS w
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |        FROM documents WHERE doc_id % 4 = 0) d,
         |  LATERAL (SELECT unnest(range(1, LEN(w) + 1)) AS i) i),
         |t0f AS (
         |  SELECT doc_id, i.i AS i, w[i.i] AS w
         |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
         |        FROM documents) d,
         |  LATERAL (SELECT unnest(range(1, LEN(w) + 1)) AS i) i)""".stripMargin +
        (1 to MergeRounds).map(learnRound).mkString +
        (1 to MergeRounds).map(applyRound).mkString +
        s"""
           |SELECT doc_id, COUNT(*) AS n_tokens,
           |  array_to_string(list(w ORDER BY i), ' ') AS toks
           |FROM u$MergeRounds GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    def positional(docs: org.apache.spark.sql.DataFrame) =
      docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("i", "w")))
    // one positional merge round: mark first tokens of adjacent (a, b)
    // pairs, drop second tokens, re-index — q111's expressions verbatim
    def mergeRound(t: org.apache.spark.sql.DataFrame,
        m: org.apache.spark.sql.DataFrame) =
      t.select(col("doc_id"), col("i"), col("w"),
          lead(col("w"), 1).over(byDoc).as("nx"),
          lag(col("w"), 1).over(byDoc).as("pv"))
        .crossJoin(broadcast(m))
        .filter(col("pv").isNull ||
          !(col("pv") === col("a") && col("w") === col("b")))
        .select(col("doc_id"),
          row_number().over(byDoc).as("i"),
          when(col("w") === col("a") && col("nx").isNotNull &&
              col("nx") === col("b"),
            concat(col("a"), lit("_"), col("b"))).otherwise(col("w")).as("w"))
        .localCheckpoint()
    val full = Tables.fanOut(Tables.documents(s, d))
    // LEARN on the sample (q111's rounds; merges apply to the sample as
    // they are learned, exactly like training does)
    var ts = positional(full.filter(col("doc_id") % 4 === 0)).localCheckpoint()
    val merges = (1 to MergeRounds).map { _ =>
      val m = ts.select(col("doc_id"), col("i"), col("w"),
          lead(col("w"), 1).over(byDoc).as("nx"))
        .filter(col("nx").isNotNull && col("w") =!= col("nx"))
        .groupBy(col("w").as("a"), col("nx").as("b")).count()
        .orderBy(col("count").desc, col("a"), col("b")).limit(1)
        .select(col("a"), col("b"))
        .localCheckpoint() // one row: this round's learned merge
      ts = mergeRound(ts, m)
      m
    }
    // APPLY the learned table to the full corpus in ONE pass: the table
    // is a bounded artifact (MergeRounds rows here, ~30k in a real
    // tokenizer — driver/plan-sized either way), and per-document
    // application needs no cross-row coordination, so a partition-local
    // fold (graft.functions.BpeApply, each merge applied with the window
    // round's exact original-neighbor semantics) replaces one
    // corpus-wide window round PER MERGE — the r9 scale-killer. Docs
    // with no tokens drop, matching the exploded form (and the oracle's
    // LATERAL unnest over an empty range).
    val table = merges.map { m =>
      val r = m.head(); (r.getString(0), r.getString(1))
    }
    val shim = org.apache.spark.sql.graftshim.PlanBridge
    val tk = shim.column(graft.functions.BpeApply(
      shim.expression(tokens(col("text"))), table))
    full.select(col("doc_id"), tk.as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        array_join(col("tk"), " ").as("toks"))
      .orderBy(col("doc_id"))
  }

  /** Probe surface (ScaleProbe's q131 knob): apply a rank-ordered merge
    * table of the corpus's `nMerges` most frequent bigrams in ONE pass
    * via [[graft.functions.BpeApply]] — the measurable claim of the r10
    * apply fix is that wall time is flat in TABLE size (one corpus pass
    * whether 3 merges or 30), where the per-merge window rounds scaled
    * linearly in it. The table derivation (one bigram count) is shared
    * corpus work at every knob value. */
  def bpeApplyPass(s: SparkSession, d: String,
      nMerges: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val table = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("i", "w")))
      .withColumn("nx", lead(col("w"), 1).over(byDoc))
      .filter(col("nx").isNotNull && col("w") =!= col("nx"))
      .groupBy(col("w"), col("nx")).count()
      .orderBy(col("count").desc, col("w"), col("nx")).limit(nMerges)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val shim = org.apache.spark.sql.graftshim.PlanBridge
    val tk = shim.column(graft.functions.BpeApply(
      shim.expression(tokens(col("text"))), table))
    docs.select(col("doc_id"), size(tk).cast("long").as("n_tokens"))
  }

  // ---- q135: importance-resampling data selection (DSIR) ------------------

  /** Hashed-feature bucket count for DSIR: 64 buckets is plenty for this
    * ~31-word vocabulary; a web-scale deployment raises it (the paper
    * uses 10k) without changing any plan shape. */
  private val DsirBuckets = 64

  /** q135: importance-resampling data selection — the DSIR recipe (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): fit cheap bag-of-hashed-token models over a TARGET
    * domain (here `lang = 'en'` — in production, the high-quality corpus
    * you want more of) and over the RAW pool, weight every raw document
    * by its log importance ratio Σ_tok [ln p̂_target(b(tok)) −
    * ln p̂_raw(b(tok))] with add-one smoothing over [[DsirBuckets]]
    * hashed buckets, and draw the selection by GUMBEL top-k (key =
    * weight + Gumbel noise — sampling without replacement proportional
    * to exp(weight), the paper's resampling step, rather than a
    * deterministic argmax that would collapse diversity).
    *
    * Scale: one tokenize pass; the two count tables are
    * [[DsirBuckets]]-sized aggregations (map-side combined) that AQE
    * broadcasts back onto the token stream; the per-doc reduction
    * shuffles (doc_id, fixed-point term) pairs; the corpus-wide top-k is
    * a TakeOrdered (`orderBy.limit`), never a global row_number window —
    * the q103/q102 discipline. Linear end to end, and the bucket models
    * are the artifact a 100 TB deployment fits once on samples and
    * broadcasts.
    *
    * Exactness: md5 is the cross-engine hash (bucket = first 24 md5 bits
    * mod [[DsirBuckets]]); each bucket's log-ratio is one identical IEEE
    * dag over integer-valued doubles, snapped to fixed-point micros
    * (`floor(x·1e6+0.5)`); per-doc sums are integer; the Gumbel draw is
    * q103's exact-uniform recipe (u = (48 md5 bits + 1)/2^48) through the
    * same double dag both engines, rounded to 6 decimals before ordering;
    * ties break on doc_id. */
  val q135DsirSelection: Q = Q(
    "q135_dsir_selection",
    s"""WITH toks AS (
       |  SELECT doc_id, lang, unnest(string_split_regex(text, '\\s+')) AS tok
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || SUBSTRING(md5(tok), 1, 6) AS BIGINT) % $DsirBuckets AS b
       |  FROM toks),
       |rc AS (SELECT b, COUNT(*) AS rc FROM feat GROUP BY b),
       |tc AS (SELECT b, COUNT(*) AS tc FROM feat WHERE lang = 'en' GROUP BY b),
       |tot AS (SELECT (SELECT COUNT(*) FROM feat WHERE lang = 'en') AS tt,
       |               (SELECT COUNT(*) FROM feat) AS rt),
       |lr AS (
       |  SELECT r.b,
       |    CAST(FLOOR((LN(CAST(COALESCE(t.tc, 0) + 1 AS DOUBLE))
       |              - LN(CAST(tot.tt + $DsirBuckets AS DOUBLE))
       |              - LN(CAST(r.rc + 1 AS DOUBLE))
       |              + LN(CAST(tot.rt + $DsirBuckets AS DOUBLE)))
       |      * 1000000 + 0.5) AS BIGINT) AS lrm
       |  FROM rc r LEFT JOIN tc t USING (b), tot),
       |w AS (
       |  SELECT f.doc_id, CAST(SUM(l.lrm) AS BIGINT) AS wm,
       |    CAST(COUNT(*) AS BIGINT) AS n_toks
       |  FROM feat f JOIN lr l USING (b) GROUP BY f.doc_id),
       |keyed AS (
       |  SELECT doc_id, wm, n_toks,
       |    ROUND(CAST(wm AS DOUBLE) / 1000000.0
       |      + (-LN(-LN((CAST(CAST('0x' || SUBSTRING(md5('q135|' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS DOUBLE) + 1.0)
       |               / 281474976710656.0))), 6) AS key
       |  FROM w),
       |n AS (SELECT COUNT(*) AS n FROM documents)
       |SELECT rnk, doc_id, wm AS weight_micros, n_toks
       |FROM (SELECT doc_id, wm, n_toks,
       |        ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS rnk
       |      FROM keyed), n
       |WHERE rnk <= (n.n + 4) // 5
       |ORDER BY rnk""".stripMargin,
  ) { (s, d) =>
    dsirSelect(Tables.documents(s, d), col("lang") === lit("en"))
  }

  /** [[q135DsirSelection]]'s operator body: select the top ⌈N/5⌉ of any
    * (doc_id, lang, text) frame by Gumbel-perturbed importance weight
    * toward the rows where `target` holds. */
  def dsirSelect(input: DataFrame, target: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = input.select(col("doc_id"), target.as("tgt"),
      explode(tokens(col("text"))).as("tok"))
    val feat = toks.select(col("doc_id"), col("tgt"),
      (conv(substring(md5(col("tok")), 1, 6), 16, 10).cast("long")
        % lit(DsirBuckets.toLong)).as("b"))
    val rc = feat.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val tc = feat.filter(col("tgt")).groupBy(col("b"))
      .agg(count(lit(1)).as("tc"))
    val tot = feat.agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("tt"),
      count(lit(1)).as("rt"))
    val lr = rc.join(tc, Seq("b"), "left").crossJoin(tot)
      .select(col("b"),
        floor((log((coalesce(col("tc"), lit(0L)) + lit(1L)).cast("double"))
          - log((col("tt") + lit(DsirBuckets.toLong)).cast("double"))
          - log((col("rc") + lit(1L)).cast("double"))
          + log((col("rt") + lit(DsirBuckets.toLong)).cast("double")))
          * 1000000d + 0.5d).cast("long").as("lrm"))
    val w = feat.join(lr, "b").groupBy(col("doc_id"))
      .agg(sum(col("lrm")).cast("long").as("wm"),
        count(lit(1)).cast("long").as("n_toks"))
    val u = (conv(substring(md5(concat(lit("q135|"),
        col("doc_id").cast("string"))), 1, 12), 16, 10)
      .cast("bigint").cast("double") + lit(1.0)) / lit(281474976710656.0)
    val keyed = w.withColumn("key",
      round(col("wm").cast("double") / lit(1000000.0) + (-log(-log(u))), 6))
    val k = (input.count() + 4) / 5 // bounded scalar: the selection size
    // corpus-wide top-k as TakeOrdered (orderBy.limit), then rank the k
    // survivors — the global window only ever sees k rows
    keyed.orderBy(col("key").desc, col("doc_id")).limit(k.toInt)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("key").desc, col("doc_id"))).cast("long"))
      .select(col("rnk"), col("doc_id"), col("wm").as("weight_micros"),
        col("n_toks"))
      .orderBy(col("rnk"))
  }

  val all: Seq[Q] = Seq(q60TextTokens, q61TopTerms, q62Quality, q63LangId,
    q64Fingerprint, q65RollingHash, q66Tfidf, q67Bigrams, q68PiiRedaction,
    q69Chunking, q73Repetition, q98MixtureRebalance, q99LmCrossEntropy,
    q102Bm25, q103WeightedSample, q111MergeLearning, q131BpeApply,
    q135DsirSelection)
}
