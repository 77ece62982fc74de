package graft

import org.apache.spark.sql.functions._

/** Edge semantics of the custom graft_ngrams Generator (UDTF). */
class GeneratorsSpec extends SparkSpec {
  import spark.implicits._

  private def grams(text: String, n: Int): Seq[String] =
    Seq(Tuple1(text)).toDF("text")
      .select(expr(s"graft_ngrams(text, $n)"))
      .as[String].collect().toSeq

  test("bigrams slide over the token stream in order") {
    assert(grams("a b c d", 2) == Seq("a b", "b c", "c d"))
  }

  test("documents shorter than n emit no rows (not a partial gram)") {
    assert(grams("solo", 2).isEmpty)
    assert(grams("a b", 3).isEmpty)
  }

  test("n=1 equals Spark's split semantics, including trailing empties") {
    val t = "one two  three"
    assert(grams(t, 1) == t.split("\\s+").toSeq)
    // trailing whitespace keeps an empty token (Spark split / DuckDB
    // string_split_regex semantics — Java's default split would drop it)
    assert(grams("a b ", 2) == Seq("a b", "b "))
  }

  test("null text emits no rows") {
    val got = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(expr("graft_ngrams(text, 2)")).count()
    assert(got == 0)
  }

  test("works as SQL LATERAL VIEW") {
    graft.functions.ArrayExprs.register(spark)
    Seq((1L, "x y z")).toDF("id", "text").createOrReplaceTempView("gen_docs")
    val rows = spark.sql(
      """SELECT id, ngram FROM gen_docs
        |LATERAL VIEW graft_ngrams(text, 2) t AS ngram""".stripMargin)
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "x y"), (1L, "y z")))
  }

  test("non-literal n fails analysis with a clear message") {
    val e = intercept[Exception] {
      Seq(Tuple1("a b")).toDF("text")
        .select(expr("graft_ngrams(text, length(text))")).collect()
    }
    assert(e.getMessage.contains("positive integer literal"))
  }
}
