package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import graft.sources.Sources

/** Manifest-level data skipping on the bucketed upsert table
  * (Sources.readTableRange): min/max bucket stats recorded at write time,
  * range reads open only intersecting buckets, stats are carried for
  * untouched buckets, evolve with the schema, and are backfilled by
  * compaction. Pruning assertions use values CORRELATED with the bucket id
  * (value = bucket(key)), so the expected kept set is exact, not
  * probabilistic. */
class SkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def bucketOf(k: Long, b: Int = 16): Int =
    Seq(Tuple1(k)).toDF("k").select(pmod(hash($"k"), lit(b))).as[Int].head()

  /** Segment-exact bucket-dir matcher (a "gb=1" substring needle would
    * false-match gb=12 — same discipline as the CDF leak test). */
  private def outsideBuckets(files: Seq[String], buckets: Set[Int]): Seq[String] =
    files.filterNot(f => buckets.exists(b => f.contains(s"/gb=$b/")))

  test("range read opens exactly the intersecting buckets; residual filter exact") {
    val path = tmp("graft-skip")
    // value bval = bucket(key): bucket b's [min,max] is [b, b] exactly
    val data = (1L to 64L).map(k => (k, bucketOf(k).toLong, s"s$k"))
    Sources.upsert(data.toDF("k", "bval", "txt"), Seq("k"), path)

    // the detector itself must flag a planted out-of-set file, or it's vacuous
    assert(outsideBuckets(Seq("/t/v1/data/gb=12/p.parquet"), Set(1)).nonEmpty)
    assert(outsideBuckets(Seq("/t/v1/data/gb=12/p.parquet"), Set(12)).isEmpty)

    val pruned = Sources.readTableRange(spark, path, "bval", 3L, 3L)
    val expected = data.filter(_._2 == 3L).toSet
    assert(pruned.as[(Long, Long, String)].collect().toSet == expected)
    assert(pruned.inputFiles.nonEmpty)
    val leaked = outsideBuckets(pruned.inputFiles.toSeq, Set(3))
    assert(leaked.isEmpty, s"range [3,3] opened non-3 buckets: $leaked")

    // a range covering everything degrades to the full read, never worse
    val full = Sources.readTableRange(spark, path, "bval", 0L, 15L)
    assert(full.count() == 64L)

    // an empty range reads NOTHING (schema preserved)
    val none = Sources.readTableRange(spark, path, "bval", 100L, 200L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "bval", "txt"))

    // string-column pruning uses string order (planted: only "s7"'s bucket)
    val s7 = Sources.readTableRange(spark, path, "txt", "s7", "s7")
    assert(s7.as[(Long, Long, String)].collect().toSet ==
      data.filter(_._3 == "s7").toSet)
  }

  test("carried buckets keep their stats across later upserts") {
    val path = tmp("graft-skip-carry")
    val data = (1L to 64L).map(k => (k, bucketOf(k).toLong))
    Sources.upsert(data.toDF("k", "bval"), Seq("k"), path)
    // v2 touches only key 200's bucket; every other bucket is carried
    Sources.upsert(Seq((200L, bucketOf(200L).toLong)).toDF("k", "bval"),
      Seq("k"), path)
    val target = (bucketOf(200L) + 1) % 16 // a bucket v2 did NOT touch
    val pruned = Sources.readTableRange(spark, path, "bval",
      target.toLong, target.toLong)
    assert(pruned.as[(Long, Long)].collect().toSet ==
      data.filter(_._2 == target.toLong).toSet)
    val leaked = outsideBuckets(pruned.inputFiles.toSeq, Set(target))
    assert(leaked.isEmpty, s"carried-stats pruning leaked: $leaked")
    // the carried bucket's files still live under v1
    assert(pruned.inputFiles.forall(_.contains("/v1/")), "carried dir moved?")
  }

  test("all-null buckets are pruned; NaN disables pruning but not correctness") {
    val path = tmp("graft-skip-null")
    Sources.upsert((1L to 32L).map(k => (k, None: Option[Double]))
      .toDF("k", "x"), Seq("k"), path)
    // every bucket is all-null on x: a range read opens NOTHING
    val none = Sources.readTableRange(spark, path, "x", 0.0, 1e9)
    assert(none.count() == 0 && none.inputFiles.isEmpty)
    // NaN in a bucket: that bucket records no stats entry — always read,
    // and the residual filter keeps the result exact
    Sources.upsert(Seq((1L, Some(Double.NaN)), (2L, Some(5.0)))
      .toDF("k", "x"), Seq("k"), path)
    val got = Sources.readTableRange(spark, path, "x", 4.0, 6.0)
    assert(got.select($"k", $"x").as[(Long, Option[Double])].collect().toSet ==
      Set((2L, Some(5.0))))
  }

  test("timestamp range pruning with java.sql.Timestamp bounds") {
    val path = tmp("graft-skip-ts")
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2026-01-${day + 1}%02d 00:00:00")
    val data = (1L to 64L).map(k => (k, ts(bucketOf(k))))
    Sources.upsert(data.toDF("k", "t"), Seq("k"), path)
    val pruned = Sources.readTableRange(spark, path, "t", ts(5), ts(5))
    assert(pruned.as[(Long, java.sql.Timestamp)].collect().toSet ==
      data.filter(_._2 == ts(5)).toSet)
    val leaked = outsideBuckets(pruned.inputFiles.toSeq, Set(5))
    assert(leaked.isEmpty, s"timestamp pruning leaked: $leaked")
  }

  test("schema evolution: new column unprunable on carried buckets until compaction backfills") {
    val path = tmp("graft-skip-evolve")
    val base = (1L to 64L).map(k => (k, bucketOf(k).toLong))
    Sources.upsert(base.toDF("k", "bval"), Seq("k"), path)
    // v2 introduces w on ONE key — carried buckets have no w stats
    Sources.upsert(Seq((7L, bucketOf(7L).toLong, 5L)).toDF("k", "bval", "w"),
      Seq("k"), path)
    val got = Sources.readTableRange(spark, path, "w", 5L, 5L)
    assert(got.select($"k", $"w").as[(Long, Option[Long])].collect().toSet ==
      Set((7L, Some(5L))))
    // carried buckets CANNOT be pruned on the unknown column — they are read
    assert(got.inputFiles.length > 1, "carried buckets must be read for an unknown column")
    // compaction rewrites every bucket and recomputes stats: now the w
    // range read prunes to key 7's bucket alone (every other bucket is
    // all-null on w)
    Sources.compact(spark, path)
    val after = Sources.readTableRange(spark, path, "w", 5L, 5L)
    assert(after.select($"k", $"w").as[(Long, Option[Long])].collect().toSet ==
      Set((7L, Some(5L))))
    val leaked = outsideBuckets(after.inputFiles.toSeq, Set(bucketOf(7L)))
    assert(leaked.isEmpty, s"post-compaction pruning leaked: $leaked")
  }

  test("a manifest without stats (legacy) reads everything, correctly") {
    val path = tmp("graft-skip-legacy")
    val data = (1L to 64L).map(k => (k, bucketOf(k).toLong))
    Sources.upsert(data.toDF("k", "bval"), Seq("k"), path)
    // strip the stats field from the committed manifest, simulating a
    // table written before stats existed
    val mf = new java.io.File(path, "v1/_MANIFEST.json")
    val json = org.json4s.jackson.JsonMethods.parse(
      new String(Files.readAllBytes(mf.toPath), "UTF-8"))
    val stripped = json.removeField { case (n, _) => n == "stats" }
    Files.write(mf.toPath, org.json4s.jackson.JsonMethods
      .compact(org.json4s.jackson.JsonMethods.render(stripped)).getBytes("UTF-8"))
    // rewriting behind RawLocalFileSystem's back invalidates the checksum
    // sidecar — remove it, as any out-of-band manifest edit would
    new java.io.File(mf.getParent, s"._MANIFEST.json.crc").delete()
    val got = Sources.readTableRange(spark, path, "bval", 3L, 3L)
    assert(got.as[(Long, Long)].collect().toSet ==
      data.filter(_._2 == 3L).toSet)
    // no stats → nothing prunable → every bucket dir is opened
    assert(got.inputFiles.length > 1, "legacy manifest must not prune")
  }

  test("keyed point lookup opens exactly the hashed buckets") {
    val path = tmp("graft-skip-keyed")
    val data = (1L to 64L).map(k => (k, s"v$k"))
    Sources.upsert(data.toDF("k", "v"), Seq("k"), path)
    val got = Sources.readTableKeyed(spark, path, Seq("k"),
      Seq(Seq(7L), Seq(42L)))
    assert(got.as[(Long, String)].collect().toSet ==
      Set((7L, "v7"), (42L, "v42")))
    val expect = Set(bucketOf(7L), bucketOf(42L))
    val leaked = outsideBuckets(got.inputFiles.toSeq, expect)
    assert(leaked.isEmpty, s"keyed lookup leaked: $leaked")
    // a missing key reads its bucket but returns nothing
    assert(Sources.readTableKeyed(spark, path, Seq("k"), Seq(Seq(999L)))
      .count() == 0)
    // composite keys hash as a tuple: same layout written with two key
    // columns resolves through the same codepath
    val path2 = tmp("graft-skip-keyed2")
    Sources.upsert(data.map { case (k, v) => (k, k % 3, v) }
      .toDF("k", "g", "v"), Seq("k", "g"), path2)
    val got2 = Sources.readTableKeyed(spark, path2, Seq("k", "g"),
      Seq(Seq(7L, 7L % 3)))
    assert(got2.as[(Long, Long, String)].collect().toSet ==
      Set((7L, 7L % 3, "v7")))
    assert(got2.inputFiles.length == 1 ||
      got2.inputFiles.map(f => f.slice(0, f.indexOf("part-"))).distinct.length == 1,
      "composite-key lookup must open one bucket dir")
  }
}
