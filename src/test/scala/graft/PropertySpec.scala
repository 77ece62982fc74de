package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties (SURVEY.md §5.3) for the operators whose
  * correctness argument is algebraic rather than example-driven. Each
  * trial runs a real (tiny) Spark job, so trial counts are tuned to keep
  * the suite fast while still exploring the input space. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, trials: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  /** Driver-side union-find — the independent reference implementation
    * for connectedComponents. */
  private def unionFind(n: Int, edges: Seq[(Int, Int)]): Map[Int, Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = minimum member id of the component
    (0 until n).map(i => i -> find(i)).toMap
  }

  test("connectedComponents matches driver-side union-find on random graphs") {
    val genGraph = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, edges.distinct)
    check("cc-vs-union-find", 12)(Prop.forAll(genGraph) { case (n, edges) =>
      val got = graft.dedup.Dedup.connectedComponents(
        edges.map { case (a, b) => (a.toLong, b.toLong) }
          .toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      val ref = unionFind(n, edges)
      // CC labels only nodes that appear in an edge
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      got == touched.map(i => i.toLong -> ref(i).toLong).toMap
    })
  }

  test("connectedComponents on an empty pair set returns an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.dedup.Dedup.connectedComponents(empty).count() == 0)
  }

  test("exact dedup is idempotent and keeps the minimum id per distinct text") {
    val genCorpus = Gen.listOf(for {
      id <- Gen.choose(0L, 999L)
      text <- Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    } yield (id, text)).suchThat(_.nonEmpty)
    check("dedup-idempotent", 12)(Prop.forAll(genCorpus) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      def dedup(in: org.apache.spark.sql.DataFrame) = in
        .groupBy($"text").agg(min($"doc_id").as("doc_id"))
        .select($"doc_id", $"text")
      val once = dedup(df).as[(Long, String)].collect().toSet
      val twice = dedup(dedup(df).select($"doc_id", $"text"))
        .as[(Long, String)].collect().toSet
      // .toSeq first: mapping the Map directly would rebuild a Map keyed
      // by min-id and silently collapse two texts sharing one min id
      val ref = corpus.groupBy(_._2).toSeq
        .map { case (t, xs) => (xs.map(_._1).min, t) }.toSet
      once == ref && twice == once
    })
  }

  test("union of re-delivered sources + keyed dedup is exactly-once (R14)") {
    val genEvents = for {
      ids <- Gen.nonEmptyListOf(Gen.choose(0L, 50L))
      dupFactor <- Gen.choose(1, 3)
    } yield (ids.distinct, dupFactor)
    check("union-dedup-exactly-once", 12)(Prop.forAll(genEvents) {
      case (ids, dupFactor) =>
        val once = ids.toDF("event_id")
        val redelivered = (1 to dupFactor)
          .map(_ => once).reduce(_ unionAll _)
        val got = redelivered.dropDuplicates("event_id")
          .as[Long].collect().sorted.toSeq
        got == ids.sorted
    })
  }

  test("funnel: step order, strict-after, inclusive window boundary (q104)") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hours: Int) = new Timestamp(t0.getTime + hours * 3600 * 1000L)
    val ev = Seq(
      // user 1: clean view→click→purchase inside the window → depth 3
      (1L, "view", at(0)), (1L, "click", at(1)), (1L, "purchase", at(2)),
      // user 2: click 2 days after view (outside 1-day window) → depth 1
      (2L, "view", at(0)), (2L, "click", at(48)),
      // user 3: click before any view — order matters → depth 0
      (3L, "click", at(0)), (3L, "purchase", at(1)),
      // user 4: click at the SAME instant as view (not strictly after)
      // fails; the later click exactly ON the +1 day boundary (inclusive)
      // succeeds → depth 2
      (4L, "view", at(0)), (4L, "click", at(0)), (4L, "click", at(24)),
      // user 5: purchase BEFORE the click that qualifies → depth 2
      (5L, "view", at(0)), (5L, "purchase", at(1)), (5L, "click", at(2)))
      .toDF("user_id", "event_type", "ts")
    val got = graft.relational.Relational2
      .funnel(ev, Seq("view" -> "t_view", "click" -> "t_click",
        "purchase" -> "t_purchase"), expr("INTERVAL 1 DAY"))
      .select(col("user_id"), col("depth")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 2L, 5L -> 2L))
    // user 4's qualifying click is the boundary one, not the same-instant one
    val u4 = graft.relational.Relational2
      .funnel(ev, Seq("view" -> "t_view", "click" -> "t_click"),
        expr("INTERVAL 1 DAY"))
      .filter(col("user_id") === 4L).select(col("t_click"))
      .as[Timestamp].collect()
    assert(u4.toSeq == Seq(at(24)))
  }

  test("cohort retention counts distinct users per (cohort, offset) (q105)") {
    import java.sql.Timestamp
    def day(d: Int, h: Int = 0) =
      Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")
    val ev = Seq(
      // u1: cohort d1, active d1 (twice — must not double count) and d3
      (1L, "view", day(1)), (1L, "click", day(1, 5)), (1L, "view", day(3)),
      // u2: cohort d1, active d1 only
      (2L, "view", day(1)),
      // u3: cohort d2, active d2 and d3
      (3L, "view", day(2)), (3L, "view", day(3)))
      .toDF("user_id", "event_type", "ts")
    val ev2 = ev.select(col("user_id"), to_date(col("ts")).as("day"))
    val fst = ev2.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val got = ev2.distinct().join(fst, "user_id")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("o"))
      .agg(count(lit(1)).as("n"))
      .select(col("cohort").cast("string"), col("o"), col("n"))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 1, 1L)))
  }
}
