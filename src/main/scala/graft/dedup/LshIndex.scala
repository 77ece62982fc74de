package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.ArrayExprs

/** Persisted MinHash-LSH dedup index: the incremental-ingest form of the
  * q41/q45 pipeline. A 100 TB corpus is deduplicated ONCE; every ingest
  * after that must answer "is this batch a duplicate of anything already
  * kept?" without touching the corpus again. Two on-disk tables make that
  * O(batch):
  *
  *  - the **band index** `(band_id, band_key, doc_id, ns)`, partitioned by
  *    the first hex char of `band_key` — a batch's candidate lookup opens
  *    only the partitions its own band keys hash into;
  *  - the **feature store** `(doc_id, sh, ns)`, partitioned by
  *    `doc_id mod `[[LshIndex.DocPfxMod]] — exact-Jaccard verification
  *    fetches only the partitions holding candidate partners.
  *
  * Both reads are built from EXPLICIT partition-directory paths (not a
  * filter Catalyst might or might not prune), so listing and I/O are
  * genuinely proportional to touched partitions — `inputFiles` proves it
  * in LshIndexSpec — and appending a new batch's rows is a plain parquet
  * append into the same layout (append ≡ rebuild is also spec-pinned).
  * At cluster scale the partition count constants grow ([[PfxLen]] → 2-3
  * hex chars ≈ 256-4096 dirs) and the driver-side partition-value collect
  * stays bounded by the dir count, never the data.
  *
  * The signature family is the md5-salted one ([[Dedup.md5MinhashSig]]),
  * so the whole incremental pipeline — index build, candidate join, size
  * bound, exact verify — is mirrored bit-for-bit by the DuckDB oracle and
  * q106 stays an exact hash-check even though candidates are LSH-derived.
  *
  * Reference tie-in: the reference keeps no dedup index (SURVEY.md §2.a);
  * this is the training-data-pipeline extension mandated alongside it,
  * composed from the same store-shaped pieces as `Sources` (manifest-free
  * here: band rows are append-only facts, so last-write-wins versioning
  * would be wrong — union IS the merge).
  */
object LshIndex {

  /** Hex-prefix length of the band-index partition key (16 dirs per char). */
  val PfxLen = 1

  /** Modulus of the feature-store partition key over doc_id. */
  val DocPfxMod = 16L

  /** Band-index rows for a feature frame ([[Dedup.lshFeatures]] output):
    * one row per (doc, band), partitioned by the band key's hex prefix.
    * The `h` prefix pins partition-type inference to STRING — an all-digit
    * sample of hex values would otherwise come back as ints and break
    * prefix matching. */
  def indexRows(feat: DataFrame): DataFrame =
    feat
      .select(col("doc_id"), col("ns"),
        explode(Dedup.md5BandKeys(col("msig"))).as("band"))
      .select(col("band.band_id").as("band_id"),
        col("band.band_key").as("band_key"), col("doc_id"), col("ns"))
      .withColumn("pfx", concat(lit("h"), substring(col("band_key"), 1, PfxLen)))

  /** Feature-store rows: the shingle sets verification needs, partitioned
    * by doc_id mod [[DocPfxMod]]. */
  def featRows(feat: DataFrame): DataFrame =
    feat.select(col("doc_id"), col("sh"), col("ns"))
      .withColumn("dpfx", pmod(col("doc_id"), lit(DocPfxMod)))

  /** Write (or overwrite) the index + feature store for a corpus feature
    * frame. The feature frame is persisted for the duration: both writes
    * consume it, and the md5-minhash pass is the expensive step. */
  def write(feat: DataFrame, idxDir: String, featDir: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val f = feat.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      indexRows(f).write.mode(mode).partitionBy("pfx").parquet(idxDir)
      featRows(f).write.mode(mode).partitionBy("dpfx").parquet(featDir)
    } finally f.unpersist(blocking = false)
  }

  /** Incremental maintenance: append a new batch's rows into the existing
    * layout. Band rows are append-only facts (a doc's bands never change),
    * so append ≡ rebuild — LshIndexSpec pins the equivalence. */
  def append(feat: DataFrame, idxDir: String, featDir: String): Unit =
    write(feat, idxDir, featDir, SaveMode.Append)

  /** Read only the partition dirs of `dir` whose partition value is in
    * `keys` — explicit paths, so listing/IO/`inputFiles` are all
    * O(touched partitions). Missing dirs (a prefix no corpus doc hashed
    * into) are skipped; zero touched dirs degrades to a footer-only
    * empty read that preserves the schema. */
  private[graft] def readPruned(s: SparkSession, dir: String, part: String,
      keys: Seq[String]): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    val dirs = keys.distinct.sorted.map(k => s"$dir/$part=$k")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (dirs.isEmpty) s.read.parquet(dir).filter(lit(false))
    else s.read.option("basePath", dir).parquet(dirs: _*)
  }

  /** Deduplicate a batch against the persisted index: for every batch doc,
    * `dup_of` = the minimum-id partner with exact 3-gram Jaccard ≥ 0.5
    * among (a) all indexed corpus docs and (b) smaller-id docs of the same
    * batch (the batch-internal half — a batch must also dedup against
    * itself before its rows join the index). `jac` is that partner's
    * similarity; both null when the doc is genuinely new.
    *
    * Cost shape: one narrow feature pass over the BATCH, a candidate join
    * against only the index partitions the batch's ~4·|batch| band keys
    * touch, and a verify join fetching only candidate partners' shingle
    * sets. Nothing scans the corpus. The two driver-side collects are
    * partition VALUES (bounded by the dir counts, ≤16 each here), not
    * data. */
  def dedupAgainst(s: SparkSession, idxDir: String, featDir: String,
      batch: DataFrame): DataFrame = {
    ArrayExprs.register(s)
    val bfeat = Dedup.lshFeatures(batch).localCheckpoint()
    val bands = bfeat
      .select(col("doc_id"), col("ns"),
        explode(Dedup.md5BandKeys(col("msig"))).as("band"))
      .select(col("band.band_id").as("band_id"),
        col("band.band_key").as("band_key"), col("doc_id"), col("ns"))
      .localCheckpoint()

    // ---- corpus half: candidate join through the pruned band index ----
    val pfxs = bands
      .select(concat(lit("h"), substring(col("band_key"), 1, PfxLen)).as("p"))
      .distinct().collect().map(_.getString(0)).toSeq
    val idx = readPruned(s, idxDir, "pfx", pfxs)
      .select(col("band_id"), col("band_key"),
        col("doc_id").as("c_id"), col("ns").as("c_ns"))
    // size bound is lossless at t=0.5 (3·inter ≥ ns+c_ns ⇒ 2·min ≥ max)
    // and prunes before the pair-dedup shuffle, like lshVerifiedPairs
    val cand = bands.join(idx, Seq("band_id", "band_key"))
      .filter(col("c_id") =!= col("doc_id") &&
        least(col("ns"), col("c_ns")) * 2 >= greatest(col("ns"), col("c_ns")))
      .select(col("doc_id"), col("ns"), col("c_id"), col("c_ns"))
      .dropDuplicates("doc_id", "c_id")
      .localCheckpoint()
    val dpfxs = cand.select(pmod(col("c_id"), lit(DocPfxMod)).as("p"))
      .distinct().collect().map(_.getLong(0).toString).toSeq
    val cfeat = readPruned(s, featDir, "dpfx", dpfxs)
      .select(col("doc_id").as("c_id"), col("sh").as("c_sh"))
    val bsh = bfeat.select(col("doc_id"), col("sh"))
    val inter = call_function("graft_intersect_size", col("sh"), col("c_sh"))
    val corpusMatches = cand
      .join(bsh, Seq("doc_id"))
      .join(cfeat, Seq("c_id"))
      .filter(inter * 3 >= col("ns") + col("c_ns"))
      .withColumn("i", inter.cast("double"))
      .select(col("doc_id"), col("c_id").as("partner"),
        round(col("i") / (col("ns") + col("c_ns") - col("i")), 6).as("jac"))

    // ---- batch-internal half: smaller-id partners within the batch ----
    val right = bands.select(col("band_id"), col("band_key"),
      col("doc_id").as("c_id"), col("ns").as("c_ns"))
    val icand = bands.join(right, Seq("band_id", "band_key"))
      .filter(col("c_id") < col("doc_id") &&
        least(col("ns"), col("c_ns")) * 2 >= greatest(col("ns"), col("c_ns")))
      .select(col("doc_id"), col("ns"), col("c_id"), col("c_ns"))
      .dropDuplicates("doc_id", "c_id")
    val csh = bfeat.select(col("doc_id").as("c_id"), col("sh").as("c_sh"))
    val batchMatches = icand
      .join(bsh, Seq("doc_id"))
      .join(csh, Seq("c_id"))
      .filter(inter * 3 >= col("ns") + col("c_ns"))
      .withColumn("i", inter.cast("double"))
      .select(col("doc_id"), col("c_id").as("partner"),
        round(col("i") / (col("ns") + col("c_ns") - col("i")), 6).as("jac"))

    val matches = corpusMatches.unionAll(batchMatches)
    val best = matches.groupBy(col("doc_id"))
      .agg(min(col("partner")).as("dup_of"))
      .join(matches.withColumnRenamed("partner", "dup_of"),
        Seq("doc_id", "dup_of"))
    batch.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"), col("jac"))
  }

  // ---- q106: the incremental-ingest query over the persisted store ------

  /** Per-dataset-dir store cache: the q106 entry builds the corpus index
    * once into a JVM-unique temp dir and both Verify/Bench passes (and the
    * steady-state bench pass) reuse it — exactly how a deployment uses the
    * index: build once, look up per ingest. Keyed by dataset dir only
    * (the store content is a pure function of the input parquet). */
  private val stores = scala.collection.mutable.Map.empty[String, (String, String)]

  private[dedup] def storeFor(s: SparkSession, d: String): (String, String) =
    synchronized {
      stores.getOrElseUpdate(d, {
        ArrayExprs.register(s)
        val root = Files.createTempDirectory("graft-lshindex").toString
        val corpus = Tables.documents(s, d)
          .filter(col("doc_id") % 10 =!= 9)
          .select(col("doc_id"), col("text"))
        write(Dedup.lshFeatures(corpus), s"$root/idx", s"$root/feat")
        (s"$root/idx", s"$root/feat")
      })
    }

  /** Drop the per-dir store cache (cold-run probes; temp dirs are left for
    * JVM-exit cleanup, only the pointer is dropped so the next call
    * rebuilds). */
  def clearCaches(): Unit = synchronized { stores.clear() }

  /** q106: incremental ingest dedup — every 10th document (doc_id % 10 = 9)
    * arrives as a new batch against an index built over the other 90%.
    * Verdicts: `dup_corpus` (matches an indexed doc), `dup_batch` (matches
    * an earlier doc of the same batch), `new`. The oracle rebuilds the
    * identical md5-LSH pipeline over the FULL corpus and restricts the
    * verified pair set to (batch ← corpus) ∪ (batch ← earlier batch) —
    * equal by construction because band keys and the verify predicate are
    * symmetric, so the driver's hash check covers the index build, the
    * pruned candidate join, and the verify join end-to-end. */
  val q106DedupIncremental: Q = Q(
    "q106_dedup_incremental",
    "WITH " + Dedup.lshPairCtes("documents") + """,
matches AS (
  SELECT doc_b AS doc_id, doc_a AS partner, jac FROM pairs WHERE doc_b % 10 = 9
  UNION ALL
  SELECT doc_a, doc_b, jac FROM pairs WHERE doc_a % 10 = 9 AND doc_b % 10 <> 9),
best AS (
  SELECT m.doc_id, m.partner AS dup_of, m.jac
  FROM (SELECT doc_id, MIN(partner) AS p FROM matches GROUP BY doc_id) b
  JOIN matches m ON m.doc_id = b.doc_id AND m.partner = b.p)
SELECT d.doc_id, best.dup_of, best.jac,
  CASE WHEN best.dup_of IS NULL THEN 'new'
       WHEN best.dup_of % 10 = 9 THEN 'dup_batch'
       ELSE 'dup_corpus' END AS verdict
FROM documents d LEFT JOIN best ON d.doc_id = best.doc_id
WHERE d.doc_id % 10 = 9
ORDER BY d.doc_id""",
  ) { (s, d) =>
    val (idxDir, featDir) = storeFor(s, d)
    val batch = Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 9)
      .select(col("doc_id"), col("text"))
    dedupAgainst(s, idxDir, featDir, batch)
      .withColumn("verdict",
        when(col("dup_of").isNull, lit("new"))
          .when(col("dup_of") % 10 === 9, lit("dup_batch"))
          .otherwise(lit("dup_corpus")))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(q106DedupIncremental)
}
