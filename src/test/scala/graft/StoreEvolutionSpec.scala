package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, LshIndex}
import graft.sim.{PqIndex, Similarity, VecIndex}
import graft.text.TextIndex

/** Monotone add-only schema evolution for the four persisted index stores
  * (verdict-r7 lifecycle item), mirroring the upsert table's
  * manifest-union contract: an append may add metadata columns (old
  * partitions null-fill on read — schema-STABLE via the recorded
  * `_schema.ddl`, not footer-sampling luck), a same-name type change
  * refuses loudly, compaction carries evolved columns, and q122's
  * filtered ANN pushes a predicate over the EVOLVED column into the
  * postings scan. */
class StoreEvolutionSpec extends SparkSpec {

  private def emb: DataFrame = Tables.embeddings(spark, sfDir)

  private def docs: DataFrame = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  private def partKeys(dir: String, part: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(part + "="))
      .map(_.getName.stripPrefix(part + "=")).toSeq

  test("VecIndex: evolved metadata column null-fills old partitions; filtered ANN pushes it down; type change refuses") {
    val dir = Files.createTempDirectory("graft-evo-vec").toString
    VecIndex.write(emb.filter(col("vec_id") % 2 === 0), dir,
      Similarity.NumCells)
    // evolve: the second batch carries a new per-vector metadata column
    VecIndex.append(emb.filter(col("vec_id") % 2 === 1)
      .withColumn("src", lit("fresh")), dir)
    val posts = LshIndex.readPruned(spark, s"$dir/postings", "cell",
      partKeys(s"$dir/postings", "cell"))
    assert(posts.columns.contains("src"),
      "recorded schema lost the evolved column")
    val bySrc = posts.groupBy(col("src")).count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(bySrc.keySet == Set(None, Some("fresh")), bySrc.toString)
    assert(bySrc(None) > 0 && bySrc(Some("fresh")) > 0,
      "old partitions did not null-fill / new rows lost the value")
    // q122's filtered form over the EVOLVED column: lands as a pushed
    // parquet filter (planted positive: the plain plan carries none)
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val hits = VecIndex.topK(spark, dir, q,
      where = Some(col("src") === "fresh"))
    val plain = VecIndex.topK(spark, dir, q)
    assert(!plain.queryExecution.executedPlan.toString.contains("EqualTo(src,"))
    assert(hits.queryExecution.executedPlan.toString.contains("EqualTo(src,"),
      "evolved-column predicate did not reach the postings scan")
    val got = hits.collect()
    assert(got.nonEmpty && got.forall(_.getLong(1) % 2 == 1),
      "filtered ANN returned a neighbor the evolved predicate excludes")
    // compaction carries the evolved column (recorded-schema read, not
    // footer sampling of a pre-evolution file)
    VecIndex.compact(spark, dir)
    val after = LshIndex.readPruned(spark, s"$dir/postings", "cell",
      partKeys(s"$dir/postings", "cell"))
    assert(after.columns.contains("src") &&
      after.filter(col("src") === "fresh").count() == bySrc(Some("fresh")),
      "compaction dropped the evolved column or its values")
    // add-only: a same-name type change refuses before anything lands
    val e = intercept[IllegalArgumentException] {
      VecIndex.append(emb.limit(1).withColumn("src", lit(7L)), dir)
    }
    assert(e.getMessage.contains("src") && e.getMessage.contains("add-only"))
  }

  test("TextIndex: per-doc metadata rides postings; old partitions null-fill; type change refuses") {
    val dir = Files.createTempDirectory("graft-evo-text").toString
    TextIndex.write(docs.limit(40), dir)
    TextIndex.append(docs.filter(col("doc_id").between(100, 120))
      .withColumn("lang_tag", lit("lv")), dir, src = "evo1")
    val posts = LshIndex.readPruned(spark, s"$dir/postings", "pfx",
      partKeys(s"$dir/postings", "pfx"))
    assert(posts.columns.contains("lang_tag"))
    assert(posts.filter(col("lang_tag").isNull).count() > 0 &&
      posts.filter(col("lang_tag") === "lv").count() > 0)
    // search is unchanged by the evolution (fixed projection)
    assert(TextIndex.search(spark, dir,
      graft.text.TextAnalysis.Bm25QueryTerms, 5).count() > 0)
    val e = intercept[IllegalArgumentException] {
      TextIndex.append(docs.limit(1).withColumn("lang_tag", lit(1L)),
        dir, src = "evo2")
    }
    assert(e.getMessage.contains("lang_tag"))
  }

  test("LshIndex: feature-store metadata evolves add-only; old partitions null-fill") {
    val idx = Files.createTempDirectory("graft-evo-lshi").toString
    val ft = Files.createTempDirectory("graft-evo-lshf").toString
    LshIndex.write(Dedup.lshFeatures(docs.limit(40)), idx, ft)
    LshIndex.write(Dedup.lshFeatures(docs.filter(col("doc_id")
        .between(100, 120))).withColumn("src", lit("b2")),
      idx, ft, mode = org.apache.spark.sql.SaveMode.Append)
    val feat = LshIndex.readPruned(spark, ft, "dpfx", partKeys(ft, "dpfx"))
    assert(feat.columns.contains("src"))
    assert(feat.filter(col("src").isNull).count() > 0 &&
      feat.filter(col("src") === "b2").count() > 0)
    intercept[IllegalArgumentException] {
      LshIndex.write(Dedup.lshFeatures(docs.limit(1))
          .withColumn("src", lit(1L)),
        idx, ft, mode = org.apache.spark.sql.SaveMode.Append)
    }
  }

  test("PqIndex: cold-row metadata evolves add-only; old partitions null-fill") {
    val dir = Files.createTempDirectory("graft-evo-pq").toString
    // train on the full corpus (a half-corpus can leave empty codebook
    // clusters); evolve with a disjoint-tagged re-append
    PqIndex.write(emb, dir)
    PqIndex.append(emb.filter(col("vec_id") % 7 === 3)
      .withColumn("src", lit("fresh")), dir)
    val vecs = LshIndex.readPruned(spark, s"$dir/vecs", "vpfx",
      partKeys(s"$dir/vecs", "vpfx"))
    assert(vecs.columns.contains("src"))
    assert(vecs.filter(col("src").isNull).count() > 0 &&
      vecs.filter(col("src") === "fresh").count() > 0)
    intercept[IllegalArgumentException] {
      PqIndex.append(emb.limit(1).withColumn("src", lit(1L)), dir)
    }
  }
}
