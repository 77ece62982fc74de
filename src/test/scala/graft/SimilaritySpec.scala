package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Pins ANN behavior (no SQL oracle — bucket membership is
  * hyperplane-seeded): exact-duplicate retrieval, recall against the exact
  * brute-force baseline, and result-shape invariants. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val brute = Similarity.q50KnnBrute.fn(spark, sfDir)
    .select(col("query_id"), col("neighbor_id"), col("rank"))
    .as[(Long, Long, Long)].collect()
  private lazy val ann = Similarity.q51AnnLsh.fn(spark, sfDir)
    .select(col("query_id"), col("neighbor_id"), col("rank"))
    .as[(Long, Long, Long)].collect()

  test("table-driven quantizer assigns cells identically to the literal path") {
    graft.functions.ArrayExprs.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    // both below AND above LiteralCellLimit semantics: same cell count,
    // two deliveries — plan literals vs broadcast centroid row — must
    // yield bit-identical probe arrays (same scores, same tie-break)
    for (cells <- Seq(Similarity.NumCells, 48)) {
      val (cents, cn2s) = Similarity.seedCentroids(e, cells)
      val viaLiteral = e
        .withColumn("probe", Similarity.probeCells(cents, cn2s, 2)(col("v")))
        .select(col("vec_id"), col("probe")).as[(Long, Seq[Int])]
        .collect().toMap
      val viaTable = e.crossJoin(broadcast(Similarity.centroidRow(e, cells)))
        .withColumn("probe",
          Similarity.probeCellsCol(col("__cents"), col("__cn2s"), 2)(col("v")))
        .select(col("vec_id"), col("probe")).as[(Long, Seq[Int])]
        .collect().toMap
      assert(viaLiteral.size == viaTable.size)
      val diffs = viaLiteral.collect {
        case (id, p) if viaTable(id) != p => (id, p, viaTable(id))
      }
      assert(diffs.isEmpty, s"cells=$cells diverged: ${diffs.take(5)}")
    }
    // the dispatcher routes a quantizer past the literal limit through the
    // table path and still produces well-formed assignments
    val big = Similarity.withProbeCells(
      e, e, Similarity.LiteralCellLimit + 1, 2, col("v"), "probe")
    assert(!big.columns.contains("__cents"))
    val probes = big.select(col("probe")).as[Seq[Int]].collect()
    assert(probes.forall(p => p.length == 2 && p.forall(c =>
      c >= 0 && c <= Similarity.LiteralCellLimit)))
  }

  test("brute force returns exactly k ranked neighbors per query") {
    val byQuery = brute.groupBy(_._1)
    assert(byQuery.size == 8)
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 5L), s"query $q")
      assert(!rows.map(_._2).contains(q), s"query $q must not match itself")
    }
  }

  test("ANN recall@5 against exact brute force is usable") {
    val bruteSets = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val annSets = ann.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bruteSets.map { case (q, exact) =>
      annSets.get(q).map(a => (a & exact).size.toDouble / exact.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // random-hyperplane LSH on near-orthogonal random vectors is the hard
    // case; the floor just guards against a broken bucket join
    assert(mean >= 0.2, s"mean recall@5 = $mean")
  }

  test("IVF recall@5 beats the per-cell prior and shape holds") {
    val ivf = Similarity.q53AnnIvf.fn(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Long)].collect()
    val bruteSets = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivfSets = ivf.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivfSets.keySet == bruteSets.keySet)
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong), s"query $q ranks")
      assert(!rows.map(_._2).contains(q), s"query $q must not match itself")
    }
    val recalls = bruteSets.map { case (q, exact) =>
      ivfSets.get(q).map(a => (a & exact).size.toDouble / exact.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // probing 2/16 cells scans ~12.5% of the corpus; true neighbors
    // concentrate in the query's own cells, so recall must be far above
    // that prior (a broken quantizer/probe would sit near it)
    assert(mean >= 0.4, s"mean IVF recall@5 = $mean")
  }

  test("PQ ADC recall@5 against exact L2 is far above random; shape holds") {
    val pq = Similarity.q74AnnPq.fn(spark, sfDir)
      .select(col("qid"), col("vec_id"), col("rnk"))
      .as[(Long, Long, Long)].collect()
    // exact squared-L2 top-5 per query — PQ approximates L2, so cosine
    // (q50's metric) would be the wrong ground truth
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val exact = e.filter(_._1 < 8).map { case (q, qv) =>
      q -> e.filter(_._1 != q).map { case (id, v) => (l2(qv, v), id) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    val pqSets = pq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(pqSets.keySet == exact.keySet)
    pq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 5L), s"query $q ranks")
      assert(!rows.map(_._2).contains(q), s"query $q must not match itself")
    }
    val recalls = exact.map { case (q, ex) => (pqSets(q) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    // 8-byte codes vs 512-byte vectors: quantization distortion costs
    // recall (seed codebooks, not k-means-trained — measured 0.25 at
    // sf0.001), but random top-5 from the corpus would sit near 0.01, so
    // the floor guards a broken encode/LUT path, not the training quality
    assert(mean >= 0.15, s"mean PQ recall@5 = $mean")
  }

  test("an exact duplicate vector is always retrieved at rank 1 by ANN") {
    // duplicate of vec 0 under a fresh id: identical vector ⇒ identical
    // sign bits in every table ⇒ guaranteed same bucket ⇒ cosine 1.0
    val e = Tables.embeddings(spark, sfDir)
    val dup = e.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val tmpDir = java.nio.file.Files.createTempDirectory("simspec").toString
    e.select(col("vec_id"), col("embedding"), col("label")).unionByName(dup)
      .coalesce(1).write.mode("overwrite").parquet(s"$tmpDir/embeddings.parquet")
    val top = Similarity.q51AnnLsh.fn(spark, tmpDir)
      .filter(col("query_id") === 0 && col("rank") === 1)
      .select(col("neighbor_id"), col("cos")).as[(Long, Double)].head()
    assert(top == ((100000L, 1.0)))
  }

  test("knn join: equi-join plan (no cartesian) and sane recall@1 vs brute force") {
    val df = Similarity.q128KnnJoin.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "knn join planned as an all-pairs product")
    val top1 = df.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // independent brute-force top-1 (cos DESC, id) over the full corpus
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
      .withColumn("n2", graft.dedup.Dedup.sqNorm(col("v")))
    val l = e.select(col("vec_id").as("q"), col("v").as("qv"),
      col("n2").as("qn2"))
    val r = e.select(col("vec_id").as("n"), col("v"), col("n2"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q"))
      .orderBy(col("cos").desc, col("n"))
    val bruteTop1 = l.crossJoin(r).filter(col("q") =!= col("n"))
      .withColumn("cos", round(graft.dedup.Dedup.cosineFromDot(
        graft.dedup.Dedup.dot(col("qv"), col("v")), col("qn2"),
        col("n2")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .collect().map(rr => rr.getLong(0) -> rr.getLong(3)).toMap
    val hits = top1.count { case (q, n) => bruteTop1.get(q).contains(n) }
    // probing 2/16 cells scans ~12.5% of the corpus, so random blocking
    // would sit near that prior; the q53 recall bound's discipline
    // (measured 0.34 on the near-uniform synthetic embeddings — real
    // clustered corpora sit far higher)
    assert(hits.toDouble / top1.size >= 0.25,
      s"knn-join recall@1 = $hits/${top1.size} — near the 12.5% prior")
    assert(top1.size == e.count(), "some query lost all its neighbors")
  }

  test("semantic dedup: cluster minimum always kept; drops re-verify against raw cosines") {
    val out = Similarity.q129SemanticDedup.fn(spark, sfDir).collect()
    assert(out.exists(_.getBoolean(3)) && out.exists(!_.getBoolean(3)),
      "one-sided outcome — keep/drop split is vacuous")
    // the smallest id of every cluster can have no smaller partner
    out.groupBy(_.getInt(1)).foreach { case (c, rs) =>
      val mn = rs.map(_.getLong(0)).min
      assert(rs.find(_.getLong(0) == mn).get.getBoolean(3),
        s"cluster $c dropped its minimum-id representative")
    }
    // independent re-verification of drops: dup_of is a smaller same-
    // cluster partner whose rounded cosine clears the threshold
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      math.rint(d / math.sqrt(nx * ny) * 1e6) / 1e6
    }
    val cluster = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.filter(r => !r.getBoolean(3)).take(50).foreach { r =>
      val v = r.getLong(0); val d = r.getLong(2)
      assert(d < v && cluster(d) == cluster(v))
      assert(cos(vecs(v), vecs(d)) >= 0.25,
        s"dup link $v -> $d below the threshold")
    }
  }

  test("q54 int8 quantization: values bounded, dequant error within half a step") {
    val rows = Similarity.q54Quantize.fn(spark, sfDir)
      .select(col("vec_id"), col("l2_norm"), col("quant_i8")).collect()
    val raw = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    assert(rows.length == raw.size)
    rows.foreach { r =>
      val nrm = r.getDouble(1)
      val q = r.getString(2).split(",").map(_.toLong)
      val v = raw(r.getLong(0)).map(_.toDouble)
      assert(q.length == v.length)
      assert(q.forall(x => x >= -127 && x <= 127))
      // dequantized unit vector is within half a quantization step
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x / nrm - qi / 127.0) <= 0.5 / 127 + 1e-9)
      }
    }
  }

  test("q77 k-means matches an independent integer reference on the real embeddings") {
    // reference: plain Scala maps/arrays, the same fixed-point recurrence,
    // sharing no code with the Spark implementation
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * 1000000d + 0.5d).toLong)
      }.sortBy(_._1)
    val k = 8; val iters = 3
    var cent: Map[Int, Array[Long]] =
      vecs.take(k).map { case (id, x) => id.toInt -> x }.toMap
    def assign() = vecs.map { case (id, x) =>
      val best = cent.toSeq.map { case (cid, c) =>
        (x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min
      (id, best._2, best._1)
    }
    var a = assign()
    for (_ <- 1 until iters) {
      val byC = a.groupBy(_._2)
      cent = cent.map { case (cid, old) =>
        cid -> byC.get(cid).map { members =>
          val xs = members.map(m => vecs(m._1.toInt)._2)
          val n = xs.length.toLong
          Array.tabulate(64)(i =>
            (xs.map(_(i)).sum + n * 1000000L) / n - 1000000L)
        }.getOrElse(old)
      }
      a = assign()
    }
    val expected = a.map(t => (t._1, t._2, t._3)).toSet
    val got = Similarity.kmeans(Tables.embeddings(spark, sfDir), k, iters)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == expected)
  }

  test("q77 k-means recovers planted well-separated clusters") {
    val seeds = Seq(
      Array.fill(64)(1.0f), Array.fill(64)(-1.0f),
      Array.tabulate(64)(i => if (i < 32) 1.0f else -1.0f),
      Array.tabulate(64)(i => if (i < 32) -1.0f else 1.0f))
    // ids 0..3 are the pure seeds (also the init centroids); 4.. are
    // jittered copies — jitter 0.01 vs inter-seed distance 2
    val rows = seeds.zipWithIndex.map { case (s, i) => (i.toLong, s) } ++
      (0 until 20).map { j =>
        val s = seeds(j % 4)
        ((4 + j).toLong, s.zipWithIndex.map { case (x, i) =>
          x + 0.01f * (((i * 7 + j * 13) % 5) - 2) })
      }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.kmeans(df, 4, 3)
      .as[(Long, Int, Long)].collect().map(t => t._1 -> t._2).toMap
    rows.foreach { case (id, _) =>
      assert(out(id) == (id % 4).toInt, s"vec $id -> cluster ${out(id)}")
    }
  }
}
