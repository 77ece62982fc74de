package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Pins dedup-operator semantics that have no SQL oracle (hash-seeded
  * MinHash/SimHash) plus the shared primitives. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near-dup of 1
    (4L, "completely different words about spark engines here now"),
  ).toDF("doc_id", "text")

  test("shingles: distinct word 3-grams, short-doc fallback") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).head == "the quick brown")
    assert(sh(1L).size == 7) // 9 words → 7 shingles, all distinct
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text"))).as[Seq[String]].head()
    assert(short == Seq("two words"))
  }

  test("identical texts have identical minhash signatures; near-dups share most") {
    val sigs = docs
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh")))
      .select(col("doc_id"), col("sig")).as[(Long, Seq[Long])]
      .collect().toMap
    assert(sigs(1L) == sigs(2L))
    val sharedNear = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    val sharedFar = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(sharedNear > sharedFar)
    assert(sharedFar == 0) // disjoint shingle sets ⇒ no minhash agreement (w.h.p.)
  }

  test("graft_simhash expression is bit-identical to the HOF reference formula") {
    import org.apache.spark.sql.functions.{size, transform, xxhash64, split}
    val th = transform(split(col("text"), "\\s+"), w => xxhash64(w))
    val diff = docs.select(
      Dedup.simhash(col("text")).as("fast"),
      Dedup.simhashFromHashes(th, size(th)).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("simhash: identical → hamming 0, near-dup closer than unrelated") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(2L)) == 0)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("cosine primitive: orthogonal → 0, identical → 1, opposite → -1") {
    val v = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)),
    ).toDF("a", "b")
      .select(round(Dedup.cosine(col("a"), col("b")), 9)).as[Double].collect()
    assert(v.toSeq == Seq(0.0, 1.0, -1.0))
  }

  test("connectedComponents: transitive chains merge, disjoint groups stay apart") {
    // 1-2-3 is a path (1 and 3 share NO edge — only transitivity links
    // them); 10-11 is disjoint. Two propagation rounds needed.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("q45 groups every member of a multi-generation chain under one canonical id") {
    val grouped = Dedup.q45DupGroups.fn(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val byComp = grouped.groupBy(_._2)
    // every component has ≥2 members and the comp_id IS the minimum member
    byComp.foreach { case (comp, members) =>
      assert(members.length >= 2)
      assert(members.map(_._1).min == comp)
      assert(members.forall(_._3 == members.length))
    }
    // the 3-generation recrawl chains exist: some component holds an
    // original (< 100000) AND its v2v3 copy (>= 200000)
    assert(byComp.exists { case (_, m) =>
      m.exists(_._1 < 100000) && m.exists(_._1 >= 200000)
    })
  }

  test("q44 cell blocking: only true pairs, and far better recall than label blocking") {
    // ground truth: brute-force all-pairs cosine >= 0.35 (spec SF only)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n2", call_function("graft_dot", col("v"), col("v")))
    val a = e.select(col("vec_id").as("vec_a"), col("label").as("la"),
      col("v").as("va"), col("n2").as("na2"))
    val b = e.select(col("vec_id").as("vec_b"), col("label").as("lb"),
      col("v").as("vb"), col("n2").as("nb2"))
    val cos = round(Dedup.cosineFromDot(
      call_function("graft_dot", col("va"), col("vb")),
      col("na2"), col("nb2")), 6)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(a.join(b, col("vec_a") < col("vec_b") && cos >= 0.35))
    val byLabel = pairs(a.join(b,
      col("la") === col("lb") && col("vec_a") < col("vec_b") && cos >= 0.35))
    val byCell = pairs(Dedup.q44DedupEmbed.fn(spark, sfDir))
    // blocking can only MISS pairs, never invent them (precision 1)
    assert(byCell.subsetOf(truth))
    val recallCell = byCell.size.toDouble / truth.size
    val recallLabel = byLabel.size.toDouble / truth.size
    // measured at sf0.001: cell 0.54 vs label 0.05 — the quantizer adapts
    // to the data where the fixed label cardinality cannot
    assert(recallCell >= 0.4, s"cell recall $recallCell")
    assert(recallCell > recallLabel,
      s"cell recall $recallCell not above label recall $recallLabel")
  }

  test("q48 segment prefilter loses no pair at the threshold (corpus + indels)") {
    // 1. real corpus: the prefiltered plan emits exactly the pairs of the
    //    plain blocked all-pairs bounded-levenshtein join
    val withPrefilter = Dedup.q48RecordLinkage.fn(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    val corpus = docs.unionAll(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("revA "), expr("substring(text, 6)")).as("text"),
          col("lang")))
    val keyed = corpus.select(col("doc_id"), col("lang"),
      floor(length(col("text")) / 100).as("band"),
      substring(col("text"), 1, 64).as("key"))
    val a = keyed.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
      col("band").as("band_a"), col("key").as("key_a"))
    val b = keyed.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("band").as("band_b"), col("key").as("key_b"))
    val dist = levenshtein(col("key_a"), col("key_b"), 5)
    val plain = a.join(b,
        col("lang_a") === col("lang_b") && col("band_a") === col("band_b") &&
          col("doc_a") < col("doc_b") && dist =!= -1)
      .select(col("doc_a"), col("doc_b"), dist.cast("long").as("dist"))
      .as[(Long, Long, Long)].collect().toSet
    assert(withPrefilter == plain)
    assert(plain.nonEmpty) // the revA edits guarantee true matches exist

    // 2. indels: the corpus's revA edit is substitution-only, so pin the
    //    position-shift window on synthetic inserts/deletes up to the
    //    threshold (the case a naive fixed-grid gram join would lose)
    // keys are 64-char PREFIXES, so a net length increase on a >=64-char
    // text pushes chars out of the key window and doubles the key
    // distance — use a 50-char base (key = whole text) so pure indels
    // keep their nominal distance
    val base = "the quick brown fox jumps over the lazy dog again!"
    assert(base.length == 50)
    val variants = Seq(
      1L -> base,
      2L -> ("XYZWV" + base), // 5 front inserts (shift +5)
      3L -> base.drop(5), // 5 front deletes (shift -5)
      4L -> (base.take(25) + "AB" + base.drop(28)), // mid: 2 ins + 3 del
      5L -> (base.take(10) + base.drop(13) + "xy"), // 3 del + 2 append
      6L -> "completely unrelated text that matches nothing here", // no pair
    )
    val fixtureDir = java.nio.file.Files.createTempDirectory("q48spec").toString
    variants.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$fixtureDir/documents.parquet")
    val found = Dedup.q48RecordLinkage.fn(spark, fixtureDir)
      .as[(Long, Long, Long)].collect().toSet
    // every <=5-edit variant pairs with the base; the unrelated doc never
    for (id <- Seq(2L, 3L, 4L, 5L))
      assert(found.exists(p => p._1 == 1L && p._2 == id),
        s"prefilter lost pair (1,$id) in $found")
    assert(!found.exists(p => p._1 == 6L || p._2 == 6L))

    // 3. the frequency-split HOT plane: hotCap = 0 forces every key
    //    through the composite complement-sub-piece join — it must emit
    //    exactly the plain join's pairs on the corpus AND keep every
    //    indel fixture pair (losslessness of the second pigeonhole)
    val hotAll = Dedup.linkagePairs(Dedup.linkageKeyed(spark, sfDir),
        hotCap = 0).as[(Long, Long, Long)].collect().toSet
    assert(hotAll == plain, "hot plane diverged from the plain join")
    val hotFix = Dedup.linkagePairs(Dedup.linkageKeyed(spark, fixtureDir),
        hotCap = 0).as[(Long, Long, Long)].collect().toSet
    assert(hotFix == found, "hot plane diverged on the indel fixtures")
  }

  test("q48 boilerplate skew: the hot plane cuts the cross-product and stays exact") {
    // the 100 TB failure mode the adaptive cap defends against: every key
    // shares segment 0 ("http://www." — exactly the first 11-char
    // segment), so the direct pigeonhole join cross-products the WHOLE
    // corpus; high-entropy hex suffixes mean the complement sub-piece key
    // keeps only true near-dups. Every 10th doc gets a 3-substitution
    // variant (the planted true pairs).
    val n = 500
    val baseDocs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("http://www."),
        substring(concat(md5(col("id").cast("string")),
          md5((col("id") + 1000000L).cast("string"))), 1, 53)).as("text"))
    val variants = baseDocs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(substring(col("text"), 1, 29), lit("ZZZ"),
          expr("substring(text, 33)")).as("text"))
    val keyed = baseDocs.unionAll(variants).withColumn("lang", lit("en"))
      .select(col("doc_id"), col("lang"),
        floor(length(col("text")) / 100).as("band"),
        substring(col("text"), 1, 64).as("key"))

    val direct = Dedup.linkagePairs(keyed, verify = false,
      hotCap = Long.MaxValue).count()
    val split = Dedup.linkagePairs(keyed, verify = false).count()
    assert(direct > n.toLong * n / 4,
      s"planted skew failed to cross-product the direct plane ($direct)")
    assert(split * 5 <= direct,
      s"hot plane cut candidates only $direct -> $split")

    val got = Dedup.linkagePairs(keyed).as[(Long, Long, Long)].collect().toSet
    val a = keyed.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
      col("band").as("band_a"), col("key").as("key_a"))
    val b = keyed.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("band").as("band_b"), col("key").as("key_b"))
    val dist2 = levenshtein(col("key_a"), col("key_b"), 5)
    val plain2 = a.join(b,
        col("lang_a") === col("lang_b") && col("band_a") === col("band_b") &&
          col("doc_a") < col("doc_b") && dist2 =!= -1)
      .select(col("doc_a"), col("doc_b"), dist2.cast("long").as("dist"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == plain2, "split join diverged from plain under skew")
    assert(plain2.size >= n / 10, "planted variants missing from the truth")
  }

  test("q46 bloom prefilter is exact: identical to the plain semi-join") {
    val withBloom = Dedup.q46Decontaminate.fn(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    // reference without the sketch: same grams, plain join
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(Dedup.grams4(col("text"))).as("gram"))
    val bench = grams.filter(col("doc_id") % 50 === 0).select(col("gram")).distinct()
    val plain = grams.filter(col("doc_id") % 50 =!= 0)
      .join(bench, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .as[(Long, Long)].collect().toSet
    assert(withBloom == plain)
    assert(withBloom.forall(_._1 % 50 != 0)) // benchmark docs never flagged
  }

  /** Exhaustive all-pairs Jaccard ≥ 0.5 components — the ground-truth
    * baseline for the LSH-derived forms (spec SF only: O(n²) intersects). */
  private def exhaustiveComponents(): Map[Long, Long] = {
    import graft.dedup.Dedup
    Dedup.connectedComponents(exhaustivePairs().select($"doc_a", $"doc_b"))
      .as[(Long, Long)].collect().toMap
  }

  private def exhaustivePairs(): org.apache.spark.sql.DataFrame = {
    import graft.dedup.Dedup
    val sh = Tables.documents(spark, sfDir)
      .select($"doc_id", Dedup.shingleHashes($"text").as("s"))
      .withColumn("ns", size($"s"))
    val a = sh.select($"doc_id".as("doc_a"), $"s".as("sa"), $"ns".as("na"))
    val b = sh.select($"doc_id".as("doc_b"), $"s".as("sb"), $"ns".as("nb"))
    val inter = call_function("graft_intersect_size", $"sa", $"sb")
    a.join(b, $"doc_a" < $"doc_b" && inter * 3 >= $"na" + $"nb")
      .withColumn("inter", inter.cast("double"))
      .select($"doc_a", $"doc_b",
        round($"inter" / ($"na" + $"nb" - $"inter"), 6).as("jac"))
  }

  test("graft_md5_minhash expression is bit-identical to the HOF reference formula") {
    // the oracle mirrors the HOF formula's salted md5 mins; the fused
    // expression must produce the identical hex strings on the real corpus
    val diff = Tables.documents(spark, sfDir)
      .select(Dedup.shingles(col("text")).as("sh"))
      .select(Dedup.md5MinhashSig(col("sh")).as("fast"),
        Dedup.md5MinhashSigHof(col("sh")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
    // short-doc fallback path (single shingle) included
    val one = Seq("two words").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
      .select(Dedup.md5MinhashSig(col("sh")).as("fast"),
        Dedup.md5MinhashSigHof(col("sh")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(one == 0)
  }

  test("q41 md5-LSH verified pairs: precision 1 vs exhaustive truth; exact dups guaranteed") {
    import graft.dedup.Dedup
    val truth = exhaustivePairs().as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val found = Dedup.q41DedupJaccard.fn(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(found.nonEmpty)
    // every reported pair is a true pair with the true jac (precision 1)
    found.foreach { case (a, b, j) =>
      assert(truth.get((a, b)).contains(j), s"pair ($a,$b,$j) not in truth")
    }
    // identical shingle sets ⇒ identical md5 signature ⇒ identical in every
    // band ⇒ guaranteed candidate: every jac=1.0 truth pair must be found
    val foundSet = found.map(p => (p._1, p._2)).toSet
    val exactDups = truth.filter(_._2 == 1.0).keySet
    assert(exactDups.subsetOf(foundSet),
      s"missed exact-dup pairs ${exactDups -- foundSet}")
    // determinism: md5 permutations are salt-fixed, not seed-dependent
    val again = Dedup.q41DedupJaccard.fn(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(found.toSeq == again.toSeq)
  }

  test("q41 finds cross-band / cross-lang pairs the round-4 fixed blocking lost") {
    import graft.dedup.Dedup
    // near-identical docs placed in DIFFERENT langs and straddling a
    // 100-char length band boundary — the round-4 (lang, n_chars/100)
    // blocking could never pair these; the planted positive pins that the
    // LSH generator has no such fixed-key blind spot
    // 28 six-char words = 195 chars (band 1); + " tail99" = 202 (band 2);
    // jac = 26/27 ≈ 0.963 — all four md5 bands collide (checked offline
    // against the RFC md5 of the salted shingles; md5 is deterministic,
    // so this planted positive can never flake)
    val base = (1 to 28).map(i => f"word$i%02d").mkString(" ")
    val fixture = Seq(
      (1L, base, "en", "s"),
      (2L, base + " tail99", "fr", "s"),
      (3L, "totally unrelated words that share nothing with the others at all", "en", "s"),
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    assert(fixture.filter($"doc_id" === 1).head().getLong(4) < 200)
    assert(fixture.filter($"doc_id" === 2).head().getLong(4) >= 200)
    val dir = java.nio.file.Files.createTempDirectory("q41spec").toString
    fixture.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val found = Dedup.q41DedupJaccard.fn(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(found == Set((1L, 2L)))
  }

  test("q58 LSH-derived groups refine the exhaustive all-pairs components") {
    import graft.dedup.Dedup
    val exact = exhaustiveComponents()
    // q58's groups come from LSH candidates — a SUBSET of the true pairs
    // (every candidate is Jaccard-verified), so each LSH component must
    // sit wholly inside one exact component
    val lshLabels = Dedup.connectedComponents(
      Dedup.q42DedupMinhashLsh.fn(spark, sfDir).select($"doc_a", $"doc_b"))
      .as[(Long, Long)].collect()
    assert(lshLabels.nonEmpty)
    for ((comp, members) <- lshLabels.groupBy(_._2)) {
      val exactComps = members.map(m => exact(m._1)).distinct
      assert(exactComps.length == 1,
        s"LSH component $comp spans exact components $exactComps")
    }
    // and the reported group shape matches: sizes ≥ 2, canonical = min id
    val groups = Dedup.q58DupGroupsLsh.fn(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(groups.forall(_._2 >= 2))
    val byComp = lshLabels.groupBy(_._2)
    groups.foreach { case (comp, n, canon) =>
      assert(byComp(comp).length == n && byComp(comp).map(_._1).min == canon)
    }
  }

  test("LSH finds every identical-shingle-set pair (guaranteed candidates)") {
    // jac = 1.0 ⇒ identical minhash signature ⇒ identical in every band ⇒
    // guaranteed candidate. Fixture corpus with two exact-dup groups.
    val fixture = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40L),
      (3L, "one two three four five six seven eight nine", "en", "s", 44L),
      (4L, "one two three four five six seven eight nine", "en", "s", 44L),
      (5L, "nothing like anything else in this tiny corpus", "en", "s", 46L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmpDir = java.nio.file.Files.createTempDirectory("dedupspec").toString
    fixture.coalesce(1).write.mode("overwrite").parquet(s"$tmpDir/documents.parquet")
    val lsh = Dedup.q42DedupMinhashLsh.fn(spark, tmpDir)
      .filter(col("jac") === 1.0)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(Set((1L, 2L), (3L, 4L)).subsetOf(lsh))
    assert(!lsh.exists { case (a, b) => Set(a, b).contains(5L) })
  }

  test("q97 span dedup: exactly the corpus-repeated 8-token spans are removed") {
    import spark.implicits._
    val span = (0 until 8).map(i => s"s$i")
    val a = ((0 until 4).map(i => s"a$i") ++ span ++ Seq("a4", "a5", "a6")).mkString(" ")
    val b = (Seq("b0", "b1") ++ span ++ Seq("b2")).mkString(" ")
    val c = "c0 c1 c2 c3 c4" // shorter than k: no spans, must pass untouched
    val dd = (Seq("d0") ++ span ++ Seq("d1") ++ span).mkString(" ") // internal repeat
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, dd)).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, 8).orderBy("doc_id")
      .select($"doc_id", $"n_tokens", $"n_removed", $"cleaned")
      .as[(Long, Long, Long, String)].collect()
    // every position covered by ANY occurrence of the repeated span goes;
    // all single-occurrence grams (fillers, boundary-crossing grams) stay
    assert(out(0) == ((1L, 15L, 8L, "a0 a1 a2 a3 a4 a5 a6")))
    assert(out(1) == ((2L, 11L, 8L, "b0 b1 b2")))
    assert(out(2) == ((3L, 5L, 0L, c)))
    assert(out(3) == ((4L, 18L, 16L, "d0 d1")))
  }
}
