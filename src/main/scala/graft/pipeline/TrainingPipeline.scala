package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The end-to-end training-data preparation pipeline — the operators of
  * the north-star modules COMPOSED into the job a user actually runs:
  *
  *   quality filter → exact dedup → benchmark decontamination →
  *   chunking → deterministic shard/split assignment → shard stats
  *
  * Everything chains as narrow transforms + the few necessary shuffles
  * (dedup's hash partition on the text hash, decontamination's gram join,
  * the final stats aggregation); nothing materializes between stages, so
  * Catalyst plans the whole pipeline as one job and pushes the cheap
  * filters (token count, benchmark exclusion) below the expensive ones.
  * Every stage is the same code path proven by its standalone query
  * (q62-style quality, q40 dedup, q46 decontamination, q69 chunking, q27
  * md5 bucketing), and the whole composition is exact-oracle-checked.
  */
object TrainingPipeline {

  val q96TrainingPipeline: Q = Q(
    "q96_training_pipeline",
    """WITH tok AS (
      |  SELECT doc_id, text, lang, string_split_regex(text, '\s+') AS w FROM documents),
      |quality AS (
      |  SELECT doc_id, text, lang, w FROM tok
      |  WHERE LEN(w) >= 10 AND CAST(LENGTH(text) AS DOUBLE) / LEN(w) < 12),
      |dedup AS (
      |  SELECT doc_id, text, lang, w FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM quality) WHERE rn = 1),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN LEN(w) >= 4 THEN array_to_string(w[i:i+3], ' ')
      |         ELSE array_to_string(w, ' ') END AS gram
      |  FROM tok, LATERAL (SELECT unnest(range(1, GREATEST(LEN(w) - 2, 2))) AS i)),
      |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
      |contaminated AS (
      |  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b ON g.gram = b.gram
      |  WHERE g.doc_id % 50 != 0),
      |clean AS (
      |  SELECT d.doc_id, d.w FROM dedup d
      |  LEFT JOIN contaminated c ON d.doc_id = c.doc_id
      |  WHERE d.doc_id % 50 != 0 AND c.doc_id IS NULL),
      |chunks AS (
      |  SELECT doc_id, CAST((i - 1) // 24 AS BIGINT) AS chunk_no,
      |    CAST(LEAST(LEN(w) - i + 1, 32) AS BIGINT) AS n_tok
      |  FROM clean, LATERAL (SELECT
      |    unnest(range(1, GREATEST(LEN(w) - 32 + 24, 1) + 1, 24)) AS i)),
      |sharded AS (
      |  SELECT doc_id, chunk_no, n_tok,
      |    CAST(('0x' || substring(md5(doc_id || ':' || chunk_no), 1, 4)) AS INTEGER)
      |      % 100 AS bucket
      |  FROM chunks)
      |SELECT CASE WHEN bucket < 90 THEN 'train' ELSE 'valid' END AS split,
      |  bucket % 4 AS shard,
      |  COUNT(*) AS n_chunks, COUNT(DISTINCT doc_id) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
      |FROM sharded GROUP BY 1, 2 ORDER BY split, shard""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val win = 32
    val stride = 24
    val docs = Tables.fanOut(Tables.documents(s, d))
    val tok = docs.select($"doc_id", $"text",
      TextAnalysis.tokens($"text").as("w"))
    // quality gate (q62's shape): enough tokens, sane chars-per-token
    val quality = tok.filter(size($"w") >= 10 &&
      length($"text").cast("double") / size($"w") < 12)
    // exact dedup (q40's shape): canonical = min doc_id per content hash
    val rnW = Window.partitionBy(md5($"text")).orderBy($"doc_id")
    val deduped = quality.withColumn("rn", row_number().over(rnW))
      .filter($"rn" === 1).drop("rn")
    // decontamination (q46's shape — the standalone query carries the
    // Bloom prefilter; composed here the exact join is the semantics)
    val grams = docs.select($"doc_id", explode(Dedup.grams4($"text")).as("gram"))
    val bench = grams.filter($"doc_id" % 50 === 0).select($"gram").distinct()
    val contaminated = grams.filter($"doc_id" % 50 =!= 0)
      .join(bench, "gram").select($"doc_id").distinct()
    val clean = deduped.filter($"doc_id" % 50 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    // chunking (q69's shape)
    val chunkArr = transform(
      sequence(lit(1), greatest(size($"w") - win + stride, lit(1)), lit(stride)),
      i => struct(
        ((i - 1) / stride).cast("long").as("chunk_no"),
        least(size($"w") - i + 1, lit(win)).cast("long").as("n_tok")))
    val chunks = clean.select($"doc_id", explode(chunkArr).as("c"))
      .select($"doc_id", $"c.chunk_no", $"c.n_tok")
    // shard/split assignment (q27's md5 discipline, keyed on doc+chunk)
    val bucket = (conv(substring(md5(concat($"doc_id".cast("string"), lit(":"),
      $"chunk_no".cast("string"))), 1, 4), 16, 10).cast("long") % 100).cast("int")
    chunks.withColumn("bucket", bucket)
      .groupBy(
        when($"bucket" < 90, "train").otherwise("valid").as("split"),
        ($"bucket" % 4).as("shard"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct($"doc_id").as("n_docs"),
        sum($"n_tok").as("total_tokens"))
      .orderBy($"split", $"shard")
  }

  /** Training-sequence capacity (tokens) and pack-bucket count for q109. */
  private val SeqLen = 64L
  private val PackBuckets = 8

  /** q109: sequence packing — the step between a curated corpus and a
    * training loader: concatenate documents and cut every [[SeqLen]]
    * tokens (the GPT-style pack; documents SPAN sequence boundaries, so
    * no token is padded away). Packing is per-BUCKET, not global: a
    * single global concatenation would serialize the cumsum at 100 TB,
    * so docs first route to md5 buckets (the q27 discipline — sticky,
    * engine-reproducible) and each bucket packs independently in doc_id
    * order — embarrassingly parallel, one window aggregation per bucket,
    * exactly how multi-worker loaders shard packing in production.
    *
    * Output = one row per (document × training sequence it overlaps):
    * `(bucket, doc_id, seq_no, seq_tok_start, doc_tok_start, n_tok)` —
    * sequence assembly for seq k of bucket b is then a sorted gather of
    * its rows. All arithmetic is integer (window cumsum, div, min/max),
    * so the oracle matches bit-for-bit. */
  val q109SequencePacking: Q = Q(
    "q109_sequence_packing",
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(LEN(string_split_regex(text, '\\s+')) AS BIGINT) AS len,
       |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
       |         AS INTEGER) % $PackBuckets AS bucket
       |  FROM documents),
       |offs AS (
       |  SELECT doc_id, bucket, len,
       |    CAST(SUM(len) OVER (PARTITION BY bucket ORDER BY doc_id)
       |         - len AS BIGINT) AS o
       |  FROM toks),
       |spans AS (
       |  SELECT bucket, doc_id, s.seq_no,
       |    GREATEST(o, s.seq_no * $SeqLen) - s.seq_no * $SeqLen AS seq_tok_start,
       |    GREATEST(o, s.seq_no * $SeqLen) - o AS doc_tok_start,
       |    LEAST(o + len, (s.seq_no + 1) * $SeqLen)
       |      - GREATEST(o, s.seq_no * $SeqLen) AS n_tok
       |  FROM offs, LATERAL (SELECT unnest(range(o // $SeqLen,
       |    (o + len - 1) // $SeqLen + 1)) AS seq_no) s)
       |SELECT bucket, doc_id, CAST(seq_no AS BIGINT) AS seq_no,
       |  CAST(seq_tok_start AS BIGINT) AS seq_tok_start,
       |  CAST(doc_tok_start AS BIGINT) AS doc_tok_start,
       |  CAST(n_tok AS BIGINT) AS n_tok
       |FROM spans ORDER BY bucket, doc_id, seq_no""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val toks = Tables.fanOut(Tables.documents(s, d))
      .select($"doc_id",
        size(TextAnalysis.tokens($"text")).cast("long").as("len"))
      .withColumn("bucket",
        (conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
          .cast("long") % PackBuckets).cast("int"))
    val w = Window.partitionBy($"bucket").orderBy($"doc_id")
    val offs = toks.withColumn("o", sum($"len").over(w) - $"len")
    offs
      .select($"bucket", $"doc_id", $"o", $"len",
        explode(sequence(expr(s"o div $SeqLen"),
          expr(s"(o + len - 1) div $SeqLen"))).as("seq_no"))
      .select($"bucket", $"doc_id", $"seq_no",
        (greatest($"o", $"seq_no" * SeqLen) - $"seq_no" * SeqLen)
          .as("seq_tok_start"),
        (greatest($"o", $"seq_no" * SeqLen) - $"o").as("doc_tok_start"),
        (least($"o" + $"len", ($"seq_no" + 1) * SeqLen)
          - greatest($"o", $"seq_no" * SeqLen)).as("n_tok"))
      .orderBy($"bucket", $"doc_id", $"seq_no")
  }

  val all: Seq[Q] = Seq(q96TrainingPipeline, q109SequencePacking)
}
