package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{TextAnalysis, TextIndex}

/** Pins the persisted-inverted-index store contracts behind q113 (the
  * score agreement itself is the q113 oracle's job): pruned
  * O(query-terms) postings reads with a planted positive, and
  * append ≡ rebuild including the incrementally-maintained stats row. */
class TextIndexSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private def freshDir(): String =
    Files.createTempDirectory("graft-textindex-spec").toString

  test("search reads only the query terms' postings partitions (planted positive)") {
    val dir = freshDir()
    TextIndex.write(docs, dir)
    val all = spark.read.parquet(s"$dir/postings")
    assert(all.select(col("pfx")).distinct().count() > 4,
      "tokens collapsed into <=4 prefixes — pruning assertion would be vacuous")

    // search's own posts frame hides its file lineage once the shared
    // persist kicks in (InMemoryRelation), so inspect the IDENTICAL
    // readPruned call search issues for these terms
    val wantPfx = TextAnalysis.Bm25QueryTerms
      .map(t => "h" + org.apache.commons.codec.digest.DigestUtils
        .md5Hex(t).substring(0, TextIndex.PfxLen)).toSet
    val pruned = graft.dedup.LshIndex.readPruned(
      spark, s"$dir/postings", "pfx", wantPfx.toSeq)
    val read = pruned.inputFiles.toSet
    assert(read.nonEmpty, "planted positive: no postings file in the scan")
    assert(read.forall(f => wantPfx.exists(p => f.contains(s"/pfx=$p/"))),
      s"scan leaked outside the query prefixes $wantPfx: $read")
    assert(read.size < all.inputFiles.length,
      "pruning read every partition — the detector is vacuous")
    // and the pruned slice really is what search consumes: its term rows
    // match the full table's (nothing a pruned-out partition held is used)
    val full = all.filter(col("tok").isin(TextAnalysis.Bm25QueryTerms: _*))
      .select(col("doc_id"), col("tok"), col("tf")).collect().map(_.toSeq).toSet
    val slim = pruned.filter(col("tok").isin(TextAnalysis.Bm25QueryTerms: _*))
      .select(col("doc_id"), col("tok"), col("tf")).collect().map(_.toSeq).toSet
    assert(full == slim && full.nonEmpty)
  }

  test("append == rebuild: postings rows, doc lengths, and the stats row") {
    val dir = freshDir()
    TextIndex.write(docs.filter(col("doc_id") % 5 =!= 0), dir)
    TextIndex.append(docs.filter(col("doc_id") % 5 === 0), dir)
    val dir2 = freshDir()
    TextIndex.write(docs, dir2)
    def posts(d: String) = spark.read.parquet(s"$d/postings")
      .select(col("doc_id"), col("tok"), col("tf")).collect()
      .map(_.toSeq).toSet
    assert(posts(dir) == posts(dir2))
    def stats(d: String) = spark.read.parquet(s"$d/stats").head()
    assert(stats(dir) == stats(dir2),
      "incremental stats drifted from a rebuild's counts")
    // and the search result through the appended store equals the one-shot
    // corpus pass (same integers -> same micro scores)
    val viaIndex = TextIndex.search(spark, dir, TextAnalysis.Bm25QueryTerms, 10)
      .collect().map(_.toSeq).toSeq
    val direct = TextAnalysis.bm25TopK(docs, TextAnalysis.Bm25QueryTerms, 10)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex == direct)
    assert(viaIndex.nonEmpty, "vacuous: no document matched the query terms")
  }
}
