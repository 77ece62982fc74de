package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus
  * decode / feature-extract / frame-sample operators.
  *
  * Spark-side design (the part that must be real at 100 TB):
  *  - payloads travel as `BinaryType` columns in parquet — columnar,
  *    splittable, prunable; metadata is a sibling `StructType` so filters
  *    on (kind, n_bytes, …) push down WITHOUT touching payload bytes;
  *  - per-item decode/feature work is per-row and narrow — no shuffle; a
  *    partition processes its payloads in place exactly like a
  *    `mapInPandas`/`mapPartitions` batch would;
  *  - frame sampling turns one payload row into N frame rows via a
  *    `transform`+`explode` — the generate is sized by metadata before any
  *    byte is copied.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic fake
  * width/height/channels from the payload bytes. Everything around the
  * stub — schema, pushdown, batch shape, frame explode — is real and
  * oracle-checked. Payloads here are synthesized from `documents.text`
  * (`CAST(text AS BINARY)` ≡ DuckDB `encode(text)`), so the driver can
  * verify byte-level semantics.
  *
  * The reference has no multimodal surface (north-star extension,
  * SURVEY.md §2.b).
  */
object Multimodal {

  val FrameBytes = 32 // fake "frame" stride for the sampler

  /** The media table: payload + typed metadata, derived deterministically
    * from documents. */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("lang").as("source_lang"),
      ).as("meta"),
    )

  /** STUB decoder — deterministic fake dimensions from payload bytes
    * (xxhash64-derived). A real deployment swaps ONLY this function for a
    * JNI/library call; the schema and plan shape stay identical. */
  def decodeStub(payload: Column): Column = struct(
    (pmod(xxhash64(payload), lit(1920)) + 1).cast("int").as("width"),
    (pmod(xxhash64(payload, lit(1)), lit(1080)) + 1).cast("int").as("height"),
    lit(3).as("channels"),
  )

  /** Frame sampler: every FrameBytes-th slice of the payload becomes one
    * frame row (frame_no, frame_bytes). Count is derived from metadata —
    * the explode is sized without reading payload bytes. */
  def sampleFrames(df: DataFrame): DataFrame = {
    val nFrames = ceil(col("meta.n_bytes").cast("double") / FrameBytes).cast("int")
    // guard the empty payload: sequence(0, -1) is the DESCENDING sequence
    // [0, -1] in Spark, not empty — an unguarded explode would emit two
    // phantom frames; an empty array drops the row (zero frames)
    df.withColumn("frame_no",
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame_bytes",
        expr(s"substring(payload, frame_no * $FrameBytes + 1, $FrameBytes)"))
  }

  /** q70: metadata + stub-decode features per media item — binary length,
    * a base64 header fingerprint (first 8 bytes), frame count. Exercises
    * binary slicing/encoding byte-for-byte against DuckDB's blob
    * functions. */
  val q70MultimodalMeta: Q = Q(
    "q70_multimodal_meta",
    s"""SELECT doc_id AS media_id,
       |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
       |  octet_length(encode(text)) AS n_bytes,
       |  to_base64(encode(substring(text, 1, 8))) AS header_b64,
       |  CAST(CEIL(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT) AS n_frames
       |FROM documents ORDER BY media_id""".stripMargin,
  ) { (s, d) =>
    media(s, d).select(
      col("media_id"),
      col("meta.kind").as("kind"),
      col("meta.n_bytes").as("n_bytes"),
      // slice CHARACTERS then encode (matching the oracle's
      // encode(substring(text,…))): a byte-slice of the payload would
      // diverge on multi-byte UTF-8 (DuckDB cannot slice blobs to mirror
      // it); byte-level ops are exercised by n_bytes and frame_bytes
      base64(substring(col("payload").cast("string"), 1, 8).cast("binary"))
        .as("header_b64"),
      ceil(col("meta.n_bytes").cast("double") / FrameBytes).cast("long").as("n_frames"),
    ).orderBy(col("media_id"))
  }

  /** q71: frame sampling + per-frame feature (byte checksum) aggregated
    * back per item — the decode-then-pool pattern of a video/audio feature
    * pipeline. The oracle reproduces frames with a range unnest. */
  val q71FrameSample: Q = Q(
    "q71_frame_sample",
    s"""WITH m AS (SELECT doc_id AS media_id,
       |    octet_length(encode(text)) AS n_bytes FROM documents),
       |frames AS (
       |  SELECT media_id,
       |    unnest(range(0, CAST(CEIL(n_bytes / $FrameBytes.0) AS BIGINT))) AS frame_no,
       |    n_bytes
       |  FROM m)
       |SELECT media_id, COUNT(*) AS n_frames,
       |  CAST(SUM(LEAST($FrameBytes, n_bytes - frame_no * $FrameBytes)) AS BIGINT) AS total_bytes
       |FROM frames GROUP BY media_id
       |ORDER BY media_id""".stripMargin,
  ) { (s, d) =>
    sampleFrames(media(s, d))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("total_bytes"))
      .orderBy(col("media_id"))
  }

  /** STUB resize — recomputes the metadata a real resample would produce
    * (target box, preserved aspect via integer scaling) without touching
    * payload bytes. Like [[decodeStub]], a deployment swaps only this for
    * the codec call; MultimodalSpec pins the metadata contract. */
  def resizeStub(decoded: Column, maxSide: Int): Column = {
    val w = decoded.getField("width")
    val h = decoded.getField("height")
    val scale = least(lit(maxSide) / greatest(w, h), lit(1.0))
    struct(
      greatest(floor(w * scale), lit(1)).cast("int").as("width"),
      greatest(floor(h * scale), lit(1)).cast("int").as("height"),
      decoded.getField("channels").as("channels"))
  }

  /** q72: per-item feature extraction over the payload — the
    * decode→histogram→pool shape of an image/audio feature pipeline, on
    * the byte/char stream: distinct-symbol count, modal symbol count, and
    * Shannon entropy. Explode → two-level aggregation: the shuffle
    * carries (item, symbol, partial count), never the payload; entropy is
    * rounded to absorb sum-order ulps (as q87's stats do). */
  val q72MultimodalFeatures: Q = Q(
    "q72_multimodal_features",
    """WITH chars AS (
      |  SELECT doc_id AS media_id, unnest(string_split(text, '')) AS ch
      |  FROM documents),
      |counts AS (
      |  SELECT media_id, ch, COUNT(*) AS cnt FROM chars GROUP BY 1, 2),
      |tot AS (SELECT media_id, SUM(cnt) AS n FROM counts GROUP BY 1)
      |SELECT c.media_id,
      |  COUNT(*) AS n_distinct_chars,
      |  MAX(cnt) AS modal_count,
      |  ROUND(-SUM((cnt / n) * LN(cnt / n)), 6) AS entropy
      |FROM counts c JOIN tot t ON c.media_id = t.media_id
      |GROUP BY c.media_id ORDER BY c.media_id""".stripMargin,
  ) { (s, d) =>
    val counts = Tables.documents(s, d)
      .select(col("doc_id").as("media_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("media_id"), col("ch")).agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy(col("media_id")).agg(sum(col("cnt")).as("n"))
    val p = col("cnt") / col("n")
    counts.join(tot, Seq("media_id"))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_distinct_chars"),
        max(col("cnt")).as("modal_count"),
        round(-sum(p * log(p)), 6).as("entropy"))
      .orderBy(col("media_id"))
  }

  // ---- q110: media near-dup via perceptual hash ---------------------------

  /** Bits per pigeonhole chunk and chunk count of the 60-bit pHash: with
    * hamming threshold 3 < 4 chunks, any qualifying pair collides on at
    * least one whole chunk (the q43/q48 pigeonhole argument). */
  private val PhBits = 60
  private val PhChunks = 4
  private val PhChunkBits = PhBits / PhChunks // 15 → 32768-way blocking
  private val PhMaxHamming = 3

  /** STUB perceptual hash — 60 bits of md5 over the payload bytes. A real
    * deployment swaps this ONE expression for a pHash/aHash over the
    * decoded image (the [[decodeStub]] discipline); md5 keeps the whole
    * pipeline oracle-mirrorable, at the price that only exact payloads
    * collide at hamming 0 (a real pHash would put near-identical frames
    * within the threshold — the blocking/verify machinery is identical).
    * 60 bits, not 64: both engines parse the hex into a SIGNED long. */
  def phashStub(payload: Column): Column =
    conv(substring(md5(payload), 1, PhBits / 4), 16, 10).cast("long")

  /** q110: near-duplicate media detection over the binary payload column —
    * the image-dedup stage of a multimodal pipeline, composed from the
    * dedup family's machinery: per-item pHash (narrow), pigeonhole chunk
    * blocking (hamming ≤ 3 over 4 chunks ⇒ one chunk equal, so the join
    * is equi on (chunk_no, chunk) — never all-pairs), and an exact
    * popcount-of-xor verify INSIDE the join condition. Scale shape =
    * q43's: candidates per block ~ n²/2^15 per chunk table.
    *
    * Exact oracle: md5 is the one cross-engine hash; chunk extraction is
    * integer shift/mod; DuckDB `bit_count(xor())` ≡ Spark `bit_count(^)`. */
  /** Every 25th asset is re-ingested under a fresh id — the duplicate
    * upload a media pipeline actually deduplicates. The corpus alone has
    * exact payload dups only at sf0.1, so without the twins the verified
    * result would be EMPTY at the driver's sf0.01 (a vacuous pass — the
    * planted-positive rule from PlanSpec applied to data). */
  private val TwinStep = 25
  private val TwinIdOffset = 1000000L

  val q110MediaNearDup: Q = Q(
    "q110_media_near_dup",
    s"""WITH src AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $TwinIdOffset, text FROM documents
       |  WHERE doc_id % $TwinStep = 0),
       |m AS (
       |  SELECT doc_id AS media_id,
       |    CAST(('0x' || substring(md5(text), 1, ${PhBits / 4})) AS BIGINT) AS ph
       |  FROM src),
       |ch AS (
       |  SELECT media_id, ph, i.i AS chunk_no,
       |    (ph // (CAST(1 AS BIGINT) << (${PhChunkBits} * i.i)))
       |      % ${1 << PhChunkBits} AS chunk
       |  FROM m, LATERAL (SELECT unnest(range(0, $PhChunks)) AS i) i),
       |pairs AS (
       |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |    CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
       |  FROM ch a JOIN ch b
       |    ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
       |    AND a.media_id < b.media_id
       |    AND bit_count(xor(a.ph, b.ph)) <= $PhMaxHamming)
       |SELECT media_a, media_b, hamming FROM pairs
       |ORDER BY media_a, media_b""".stripMargin,
  ) { (s, d) =>
    val base = Tables.fanOut(media(s, d))
    val withTwins = base.unionAll(
      base.filter(col("media_id") % TwinStep === 0)
        .withColumn("media_id", col("media_id") + TwinIdOffset))
    val m = withTwins
      .select(col("media_id"), phashStub(col("payload")).as("ph"))
    val ch = m.select(col("media_id"), col("ph"),
        explode(sequence(lit(0), lit(PhChunks - 1))).as("chunk_no"))
      .withColumn("chunk",
        expr(s"(ph div shiftleft(CAST(1 AS BIGINT), $PhChunkBits * chunk_no)) " +
          s"% ${1 << PhChunkBits}"))
    val a = ch.select(col("chunk_no").as("cn_a"), col("chunk").as("ck_a"),
      col("media_id").as("media_a"), col("ph").as("ph_a"))
    val b = ch.select(col("chunk_no").as("cn_b"), col("chunk").as("ck_b"),
      col("media_id").as("media_b"), col("ph").as("ph_b"))
    val hamming = bit_count(col("ph_a").bitwiseXOR(col("ph_b")))
    // verify inside the join condition (the q41/q44 lesson): non-qualifying
    // collisions never materialize as output rows
    a.join(b,
        col("cn_a") === col("cn_b") && col("ck_a") === col("ck_b") &&
          col("media_a") < col("media_b") && hamming <= PhMaxHamming)
      .select(col("media_a"), col("media_b"), hamming.cast("int").as("hamming"))
      .distinct()
      .orderBy(col("media_a"), col("media_b"))
  }

  val all: Seq[Q] = Seq(q70MultimodalMeta, q71FrameSample,
    q72MultimodalFeatures, q110MediaNearDup)
}
