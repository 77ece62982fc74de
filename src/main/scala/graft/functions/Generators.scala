package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (UDTF) — the `Generator` row of the
  * extension surface (SURVEY.md §2.b: "explode-style built-ins before
  * writing any Generator"; this is the case where a built-in chain falls
  * short): emit word n-grams of a text column as ROWS directly, without
  * first materializing the n-gram array that
  * `explode(transform(sequence(...), ...))` builds per document — for a
  * 10 kB document that array is ~3× the text itself, and at corpus scale
  * the allocation is pure waste when the grams feed straight into an
  * aggregation.
  *
  * Planned like any generator: the analyzer rewrites a Project containing
  * it into `Generate`, so `df.select(col("id"), expr("graft_ngrams(text, 2)"))`
  * and SQL `LATERAL VIEW graft_ngrams(text, 2)` both work.
  */
case class WordNgrams(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  private lazy val n: Int = nExpr match {
    case Literal(v: Int, IntegerType) => v
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_ngrams expects (string, int literal), got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(
        "graft_ngrams n must be a positive integer literal")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      // limit -1: KEEP trailing empty tokens, matching Spark's
      // split(col, "\\s+") and DuckDB's string_split_regex (Java's
      // default limit 0 silently drops them — oracle divergence on any
      // text ending in whitespace)
      val words = t.asInstanceOf[UTF8String].toString.split("\\s+", -1)
      if (words.length < n) Iterator.empty
      else (0 to words.length - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
