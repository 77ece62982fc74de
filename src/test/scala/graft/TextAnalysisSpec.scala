package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Pins text-operator semantics, including real-text language-ID behavior
  * that the synthetic corpus can't exercise. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("BPE-ish token count: alpha runs, digit runs, symbols") {
    val n = Seq("hello world42 v2.0!").toDF("text")
      .select(TextAnalysis.bpeishCount(col("text"))).as[Int].head()
    // hello | world | 42 | v | 2 | . | 0 | !
    assert(n == 8)
  }

  test("language-ID picks the profile with most marker hits on real text") {
    val docs = Seq(
      (1L, "en-doc", "the cat sat on the mat and the dog is a friend of the cat"),
      (2L, "es-doc", "el gato es de la casa y la cesta es de el perro"),
      (3L, "de-doc", "der hund und die katze und der vogel ist da"),
    ).toDF("doc_id", "lang", "text")
    docs.createOrReplaceTempView("spec_docs")
    // reuse the operator body by swapping the table: run its expressions
    // directly over the fixture
    val t = split(col("text"), "\\s+")
    val markers = Map(
      "en" -> Seq("the", "a", "of", "is"), "es" -> Seq("el", "la", "de", "es"),
      "de" -> Seq("der", "die", "und", "ist"), "fr" -> Seq("le", "la", "de", "est"))
    val scored = docs.select((Seq(col("doc_id")) ++ markers.toSeq.map { case (l, ms) =>
      size(filter(t, tok => array_contains(lit(ms.toArray), tok))).as(s"s_$l")
    }): _*)
    val best = scored.select(col("doc_id"),
      greatest(col("s_en"), col("s_es"), col("s_de"), col("s_fr")).as("best"),
      col("s_en"), col("s_es"), col("s_de")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(best(1L).getAs[Int]("s_en") == best(1L).getAs[Int]("best"))
    assert(best(2L).getAs[Int]("s_es") == best(2L).getAs[Int]("best"))
    assert(best(3L).getAs[Int]("s_de") == best(3L).getAs[Int]("best"))
  }

  test("rolling-hash shingle sketch: identical text → identical min-hash") {
    val df = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "x y z w v u t s"),
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_fixture")
    val out = TextAnalysis.q65RollingHash.fn // sanity: function exists
    val t = split(col("text"), "\\s+")
    val sh = transform(sequence(lit(1), size(t) - 4),
      i => concat_ws(" ", (0 until 5).map(j => element_at(t, i + j)): _*))
    val mins = df.select(col("doc_id"), array_min(transform(sh, x => xxhash64(x))).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(mins(1L) == mins(2L))
    assert(mins(1L) != mins(3L))
  }

  test("quality keep-flag logic") {
    // 300-char doc with stopwords and variety → keep; tiny doc → drop
    val q = graft.text.TextAnalysis.q62Quality.fn(spark, sfDir)
    val kept = q.filter(col("keep")).count()
    val total = q.count()
    assert(kept > 0 && kept < total)
  }

  test("fingerprint md5 is whitespace-normalization invariant") {
    val fps = Seq((1L, "a  b\tc"), (2L, "a b c")).toDF("doc_id", "text")
      .select(md5(regexp_replace(col("text"), "\\s+", " "))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("q73 repetition: a templated doc scores high, unique text scores zero") {
    import graft.text.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("q73spec").toString
    Seq(
      // all-unique words: every metric is exactly 0 except top-bigram 1/n
      (1L, "one two three four five six seven eight nine"),
      // degenerate boilerplate: "buy now" repeated — the doc a repetition
      // filter exists to catch
      (2L, "buy now buy now buy now buy now buy now buy now"),
      (3L, "x"), // single word: below the 2-word floor, excluded entirely
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.q73Repetition.fn(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(1L, 2L))
    val (n1, dw1, db1, tb1) = got(1L)
    assert(n1 == 9 && dw1 == 0.0 && db1 == 0.0 && tb1 == 0.125) // 1/8 bigrams
    val (n2, dw2, db2, tb2) = got(2L)
    // 12 words, 2 distinct → dup_word 10/12; 11 bigrams: "buy now"×6 +
    // "now buy"×5 → 2 distinct → dup_bigram 9/11, top 6/11
    assert(n2 == 12 && dw2 == math.rint((1 - 2.0 / 12) * 1e6) / 1e6)
    assert(db2 == math.rint((1 - 2.0 / 11) * 1e6) / 1e6)
    assert(tb2 == math.rint(6.0 / 11 * 1e6) / 1e6)
    // the signal orders the docs as a filter needs
    assert(db2 > db1 && tb2 > tb1)
  }

  test("q98 mixture rebalance: rates derive from corpus totals; min language keeps everything") {
    // aa: 2 docs x 10 tokens = 20; bb: 10 docs x 10 tokens = 100
    // -> budget 20, rate(aa) = 10000 bp (all kept), rate(bb) = 2000 bp
    def mk(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = ((1 to 2).map(i => (i.toLong, "aa", mk(10))) ++
      (11 to 20).map(i => (i.toLong, "bb", mk(10)))).toDF("doc_id", "lang", "text")
    val out = graft.text.TextAnalysis.mixtureRebalance(docs)
      .select(col("doc_id"), col("lang"), col("rate_bp"))
      .as[(Long, String, Long)].collect()
    val aa = out.filter(_._2 == "aa")
    assert(aa.map(_._1).sorted.toSeq == Seq(1L, 2L) && aa.forall(_._3 == 10000L))
    // bb membership re-derived through an INDEPENDENT md5 path (JDK digest)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16) % 10000
    }
    val expectBb = (11L to 20L).filter(bucket(_) < 2000L)
    val bb = out.filter(_._2 == "bb")
    assert(bb.forall(_._3 == 2000L))
    assert(bb.map(_._1).sorted.toSeq == expectBb)
  }

  test("q102 BM25 matches an independent reference on a controlled corpus") {
    val docs = Seq(
      (1L, "join join hash filter scan"), // two query terms repeated, dl=5
      (2L, "join merge merge merge"), // one weak match, dl=4
      (3L, "sort merge batch"), // no query term — must be absent
      (4L, "hash hash hash hash hash hash")) // saturating tf, dl=6
    val terms = Seq("join", "hash", "scan")
    // independent reference: plain Scala, same formula and snapping
    val tokd = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = tokd.size
    val tot = tokd.map(_._2.size).sum
    val avgdl = tot.toDouble / n
    val df = terms.map(t => t -> tokd.count(_._2.contains(t))).toMap
    val ref = tokd.map { case (id, w) =>
      val micros = terms.flatMap { t =>
        val tf = w.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5))
          val tfn = (tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * (w.size.toDouble / avgdl)))
          Some(math.floor(idf * tfn * 1000000.0 + 0.5).toLong)
        }
      }
      id -> micros.sum
    }
    val expected = ref.filter { case (id, _) => tokd.toMap.apply(id).exists(terms.contains) }
      .sortBy { case (id, m) => (-m, id) }
      .zipWithIndex
      .map { case ((id, m), i) => (id, m.toDouble / 1000000.0, (i + 1).toLong) }
    val got = graft.text.TextAnalysis
      .bm25TopK(docs.toDF("doc_id", "text"), terms, 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == expected)
    // semantics: the no-query-term doc is absent; saturation keeps the
    // six-fold 'hash' doc from drowning the two-term doc
    assert(!got.exists(_._1 == 3L))
    assert(got.map(_._1).contains(1L) && got.map(_._1).contains(4L))
  }

  test("q103 weighted sample: membership matches an independent JDK-md5 A-ES reference") {
    // two groups; extreme weights so the weighting is observable
    val docs = (1 to 40).map { i =>
      val heavy = i % 4 == 0
      (i.toLong, if (i <= 20) "aa" else "bb", if (heavy) 100000L else 1L)
    }
    val out = graft.text.TextAnalysis
      .weightedSample(docs.toDF("doc_id", "lang", "wt"), col("lang"), col("wt"), 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    // independent reference: JDK md5, same salt, same key formula
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(s"q103|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 12)
      val x = java.lang.Long.parseLong(hex, 16)
      math.log((x.toDouble + 1.0) / 281474976710656.0) / w.toDouble
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      ds.map(d => (d._1, d._3, key(d._1, d._3)))
        .sortBy { case (id, _, k) => (-k, id) }
        .take(3).zipWithIndex
        .map { case ((id, w, _), i) => (lang, id, w, (i + 1).toLong) }
    }.sortBy(r => (r._1, r._4))
    assert(out == expected)
    // the 1e5:1 weights must dominate: every winner is a heavy doc
    assert(out.forall(_._3 == 100000L))
  }

  test("q135 DSIR selection matches an independent JDK-md5 reference and prefers target-like docs") {
    // targets speak A-words, half the pool speaks B-words, and the
    // interesting docs mix — selection must order by target affinity
    val aWords = Seq("alpha", "beta", "gamma")
    val bWords = Seq("omega", "sigma", "tau")
    val docs = (1 to 30).map { i =>
      val mk = (ws: Seq[String]) => (0 until 8).map(j => ws(j % ws.size))
      val (lang, text) =
        if (i <= 10) ("tt", mk(aWords))
        else if (i <= 20) ("xx", mk(bWords))
        else ("xx", mk(aWords).take(4) ++ mk(bWords).take(4))
      (i.toLong, lang, text.mkString(" "))
    }
    val out = graft.text.TextAnalysis
      .dsirSelect(docs.toDF("doc_id", "lang", "text"), col("lang") === "tt")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // independent reference: JDK md5 buckets, same model + Gumbel formulas
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def bucket(tok: String): Long =
      java.lang.Long.parseLong(hex(tok).substring(0, 6), 16) % 64
    val toks = docs.map { case (id, lang, text) =>
      (id, lang == "tt", text.split("\\s+").toSeq.map(bucket)) }
    val rc = toks.flatMap(_._3).groupBy(identity).map { case (b, v) => b -> v.size }
    val tc = toks.filter(_._2).flatMap(_._3).groupBy(identity)
      .map { case (b, v) => b -> v.size }
    val tt = toks.filter(_._2).map(_._3.size).sum
    val rt = toks.map(_._3.size).sum
    def lrm(b: Long): Long =
      math.floor((math.log((tc.getOrElse(b, 0) + 1).toDouble)
        - math.log((tt + 64).toDouble)
        - math.log((rc(b) + 1).toDouble)
        + math.log((rt + 64).toDouble)) * 1e6 + 0.5).toLong
    val keyed = toks.map { case (id, _, bs) =>
      val wm = bs.map(lrm).sum
      val x = java.lang.Long.parseLong(hex(s"q135|$id").substring(0, 12), 16)
      val g = -math.log(-math.log((x.toDouble + 1.0) / 281474976710656.0))
      val key = BigDecimal(wm.toDouble / 1e6 + g)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, wm, bs.size.toLong, key)
    }
    val expected = keyed.sortBy { case (id, _, _, k) => (-k, id) }.take(6)
      .zipWithIndex.map { case ((id, wm, nt, _), i) => ((i + 1).toLong, id, wm, nt) }
    assert(out == expected)
    // the model itself must separate the domains: every pure-target doc
    // outweighs every pure-foreign doc, with mixed docs strictly between
    val wmOf = keyed.map(k => k._1 -> k._2).toMap
    val (pureA, pureB, mixed) =
      ((1L to 10L).map(wmOf), (11L to 20L).map(wmOf), (21L to 30L).map(wmOf))
    assert(pureA.min > mixed.max && mixed.min > pureB.max,
      s"DSIR weights failed to separate domains: $pureA / $mixed / $pureB")
  }

  test("q99 LM cross-entropy matches an independent reference model") {
    val texts = Seq((1L, "x y x y x"), (2L, "x x x x"), (3L, "y z"))
    // independent reference: plain Scala maps + math.log, same snapping
    val bigrams = texts.map { case (id, t) =>
      val w = t.split("\\s+"); id -> w.dropRight(1).zip(w.drop(1))
    }
    val cbg = bigrams.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val cw1 = bigrams.flatMap(_._2).groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = texts.flatMap(_._2.split("\\s+")).distinct.size
    val expect = bigrams.map { case (id, bgs) =>
      val terms = bgs.map { bg =>
        math.floor((math.log((cw1(bg._1) + v).toDouble) -
          math.log((cbg(bg) + 1).toDouble)) * 1e6 + 0.5).toLong
      }
      val avg = BigDecimal(terms.sum.toDouble / terms.size / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, terms.size.toLong, avg)
    }.toSet
    val got = graft.text.TextAnalysis.lmCrossEntropy(texts.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expect)
  }
}
