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
}
