package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared manual input-type check (ExpectsInputTypes needs the
  * private[sql] AbstractDataType in Spark 4). */
trait GraftArrayInputCheck { self: Expression =>
  protected def expectedInputs: Seq[DataType]
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.zip(expectedInputs).forall {
      case (c, ArrayType(et, _)) => c.dataType match {
        case ArrayType(aet, _) => aet == et
        case _ => false
      }
      case (c, t) => c.dataType == t
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ${expectedInputs.mkString(", ")}, got " +
        children.map(_.dataType).mkString(", "))
  }
}

/** Custom codegen'd Catalyst expressions for the vector/set hot loops.
  *
  * Why custom `Expression`s (SURVEY.md §4's escape hatch): Spark's
  * higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * interpreted per element — fine for per-row feature extraction, but the
  * pairwise dedup/similarity operators evaluate them millions of times per
  * partition, and there is no builtin one-pass k-minima or sorted-merge
  * intersection. Each expression below implements the loop in `doGenCode`
  * (staying inside whole-stage codegen with zero allocation on the hot
  * path) with an identical interpreted `nullSafeEval` fallback. Measured on
  * the sf0.1 minhash pipeline: 16 interpreted HOF passes → one fused codegen
  * loop, ~10× on signature computation.
  *
  * Numerics: [[DotProductD]] accumulates strictly left-to-right — the same
  * order as `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — so replacing the
  * HOF form changes nothing bit-for-bit and the DuckDB oracle comparisons
  * are unaffected.
  */
object ArrayExprs {

  /** Let-binding for Column expressions: evaluates `v` ONCE per row and
    * makes the value available to `f` as a lambda variable.
    *
    * Why: a lambda inside `transform`/`aggregate` that references a Column
    * built outside it captures the EXPRESSION TREE, not a value — so
    * `transform(seq, i => element_at(w, i))` re-evaluates `w` (e.g. a regex
    * split) for every element. Binding through a 1-element `transform`
    * makes `x` a `NamedLambdaVariable` holding the evaluated value.
    * Measured on the shingle pipeline: ~150 split() evaluations per row → 1.
    */
  def letBind(v: org.apache.spark.sql.Column)(
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, element_at, transform}
    element_at(transform(array(v), x => f(x)), 1)
  }

  /** Arity-checked builder: wrong argument counts fail analysis with a
    * clear message instead of silently dropping extras (zip truncates) or
    * throwing a raw IndexOutOfBounds. */
  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression = es => {
    if (es.length != n) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map("functionName" -> name,
        "expectedNum" -> n.toString, "actualNum" -> es.length.toString,
        "docroot" -> ""))
    b(es)
  }

  /** (name, builder) for every graft function — the single source for both
    * the per-session [[register]] and the [[GraftExtensions]] injection. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> arity("graft_dot", 2)(es => DotProductD(es.head, es(1))),
    "graft_minhash" -> arity("graft_minhash", 1)(es => MinHashSig(es.head)),
    "graft_intersect_size" ->
      arity("graft_intersect_size", 2)(es => SortedIntersectSize(es.head, es(1))),
    "graft_simhash" -> arity("graft_simhash", 1)(es => SimHash64(es.head)),
    "graft_md5_minhash" ->
      arity("graft_md5_minhash", 1)(es => Md5MinHashSig(es.head)),
    "graft_ngrams" -> arity("graft_ngrams", 2)(es => WordNgrams(es.head, es(1))),
    // Spark ships native bloom-filter expressions (used internally by
    // runtime row-level filtering) but does not register them in the
    // public function registry — expose them under graft_* names. Probe
    // stays inside whole-stage codegen, unlike a Scala-closure UDF, and
    // the sketch travels as a scalar-subquery result in the plan.
    // `graft_bloom_agg(xxhash64(x))` → binary sketch (conf-default sizing:
    // 1M items / 8.4M bits ≈ 1 MB); `graft_might_contain(bf, xxhash64(x))`.
    "graft_bloom_agg" -> arity("graft_bloom_agg", 1)(es =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es.head)),
    "graft_might_contain" -> arity("graft_might_contain", 2)(es =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es.head, es(1))),
    // count_min_sketch IS registered in Spark SQL, but no estimator
    // expression exists — graft_cm_estimate(sketch, key) completes the
    // pair (sketch arg: constant or scalar subquery, like might_contain)
    "graft_cm_estimate" -> arity("graft_cm_estimate", 2)(es =>
      CmEstimate(es.head, es(1))),
  )

  /** Register the functions on a session (idempotent). Call from any query
    * body that uses them; they become available to `expr("graft_…(…)")`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "internal")
    }
  }
}

/** `SparkSessionExtensions` packaging of the graft extension surface — the
  * deployment form: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `.withExtensions`) makes every `graft_*` function available to pure
  * SQL and installs the as-of join strategy + its pushdown rule in all
  * sessions, no per-query registration. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ArrayExprs.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ArrayExprs", name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsof)
  }
}

/** Dot product of two double arrays (over the common prefix length), fused
  * into one codegen loop. */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with GraftArrayInputCheck {
  override protected def expectedInputs: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  val NumHashes = 16
  // fixed universal-hash coefficients (odd multipliers), same on every
  // executor — the minhash permutation family h_j(x) = A(j)*x + B(j)
  val A: Array[Long] = {
    val r = new scala.util.Random(2024)
    Array.fill(NumHashes)(r.nextLong() | 1L)
  }
  val B: Array[Long] = {
    val r = new scala.util.Random(4048)
    Array.fill(NumHashes)(r.nextLong())
  }
}

/** One-pass 16-permutation MinHash signature over a long array of element
  * hashes: sig[j] = min over x of (A(j)*x + B(j)). Replaces 16 interpreted
  * `array_min(transform(...))` passes with one fused loop. */
case class MinHashSig(child: Expression)
    extends UnaryExpression with GraftArrayInputCheck {
  import MinHashSig._
  override protected def expectedInputs: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < NumHashes) {
        val h = A(j) * x + B(j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val aRef = ctx.addReferenceObj("graftMinhashA", A, "long[]")
      val bRef = ctx.addReferenceObj("graftMinhashB", B, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$NumHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $xs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $xs.getLong($i);
         |  for (int $j = 0; $j < $NumHashes; $j++) {
         |    long $h = $aRef[$j] * $x + $bRef[$j];
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5MinHashSig {
  val NumHashes = 16
  /** Per-permutation salt prefixes — the SAME strings the DuckDB oracle
    * bakes into `md5('p<i>|' || shingle)`. */
  val Salts: Array[Array[Byte]] = Array.tabulate(NumHashes)(i =>
    s"p$i|".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  // MessageDigest is stateful and Expression instances are shared across
  // concurrently running tasks (codegen reference arrays) — thread-local
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".getBytes
  private def hex(b: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((b(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(b(i) & 0xf)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** One-pass 16-permutation md5 MinHash signature over an array of shingle
  * STRINGS: sig[i] = min over shingles s of lowercaseHex(md5("p<i>|" + s)).
  * Bit-identical to the 16× `array_min(transform(sh, x -> md5(...)))` HOF
  * formulation (DedupSpec pins it) — lowercase hex preserves the unsigned
  * byte order, so digests compare as raw bytes and only the 16 winners are
  * hex-encoded. Replaces 16 interpreted HOF passes (each allocating a
  * corpus-width hex-string array) with one loop; the md5 work itself is
  * inherent to the salted-permutation family the ORACLE can mirror
  * (engine-seeded xxhash permutations are faster — [[MinHashSig]] — but
  * not reproducible in DuckDB). CodegenFallback: per-row feature
  * extraction, not a per-pair hot loop. Input must not contain null
  * elements (shingle arrays never do). */
case class Md5MinHashSig(child: Expression)
    extends UnaryExpression with GraftArrayInputCheck
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import Md5MinHashSig._
  override protected def expectedInputs: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_minhash"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val mins = new Array[Array[Byte]](NumHashes)
    val digest = md.get()
    var i = 0
    while (i < n) {
      val bytes = xs.getUTF8String(i).getBytes
      var j = 0
      while (j < NumHashes) {
        digest.reset()
        digest.update(Salts(j))
        digest.update(bytes)
        val d = digest.digest()
        if (mins(j) == null || unsignedLess(d, mins(j))) mins(j) = d
        j += 1
      }
      i += 1
    }
    // empty input ≡ the HOF form: array_min over an empty array is null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(m => if (m == null) null else hex(m)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array of element hashes: bit j of the output is
  * set iff more than half the elements have bit j set. Replaces 64
  * interpreted `size(filter(...))` passes (each allocating the filtered
  * array) with one fused counting loop — bit-identical to the HOF formula
  * in Dedup.simhashFromHashes (DedupSpec pins the equivalence). */
case class SimHash64(child: Expression)
    extends UnaryExpression with GraftArrayInputCheck {
  override protected def expectedInputs: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](64)
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < 64) { cnt(j) += ((x >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (2 * cnt(j) > n) sig |= (1L << j); j += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      s"""
         |int[] $cnt = new int[64];
         |int $n = $xs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $xs.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) { $cnt[$j] += (int) (($x >>> $j) & 1L); }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if (2 * $cnt[$j] > $n) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection size of two SORTED long arrays (callers sort once per row
  * with `array_sort`): a zero-allocation merge loop, vs `array_intersect`
  * which builds a hash set per evaluation and materializes the result
  * array just to take its size. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with GraftArrayInputCheck {
  override protected def expectedInputs: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; ${ev.value} = 0;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value}++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Point estimate from a count-min sketch built by Spark's native
  * `count_min_sketch` aggregate — the missing read half of that pair
  * (Spark registers the builder but no estimator). The sketch argument
  * must be a CONSTANT or a SCALAR SUBQUERY (the same contract as
  * `BloomFilterMightContain`): it is deserialized once per plan and
  * referenced from generated code, so the per-row probe stays inside
  * whole-stage codegen. Estimates never under-count (CM guarantee), which
  * is what makes sketch-prefiltered-but-exact operators possible (q49,
  * same shape as q46's bloom). */
case class CmEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.util.sketch.CountMinSketch

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cm_estimate"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => left match {
        case e if e.foldable => TypeCheckResult.TypeCheckSuccess
        case _: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: the sketch must be a constant or scalar subquery")
      }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (BINARY, BIGINT), got ($l, $r)")
    }

  // deserialized once per plan lifetime; the sketch side is constant by
  // the checkInputDataTypes contract so eval(null) is legal here
  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (sketch == null) null
    else {
      val k = right.eval(input)
      if (k == null) null else sketch.estimateCount(k.asInstanceOf[Long])
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    if (sketch == null) {
      ev.copy(code =
        code"""
           |boolean ${ev.isNull} = true;
           |long ${ev.value} = -1L;
         """.stripMargin)
    } else {
      val ref = ctx.addReferenceObj("cmSketch", sketch,
        classOf[CountMinSketch].getName)
      val keyGen = right.genCode(ctx)
      ev.copy(code =
        code"""
           |${keyGen.code}
           |boolean ${ev.isNull} = ${keyGen.isNull};
           |long ${ev.value} = -1L;
           |if (!${ev.isNull}) {
           |  ${ev.value} = $ref.estimateCount(
           |    java.lang.Long.valueOf(${keyGen.value}));
           |}
         """.stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeApply {
  import org.apache.spark.unsafe.types.UTF8String

  /** Apply ONE merge round to a token array, with the ORIGINAL-neighbor
    * simultaneous semantics of q111/q131's window rounds (and their
    * unrolled-round DuckDB oracle): position i is DROPPED when its
    * original left neighbor is `a` and it is `b`; a kept position is
    * renamed to `merged` when it is `a` and its original right neighbor
    * is `b`. NOT classic greedy BPE on runs — [b,b,b] under (b,b) folds
    * to [b_b], exactly what one lead/lag round produces — because the
    * oracle IS the round. */
  private[functions] def round(arr: Array[UTF8String], a: UTF8String,
      b: UTF8String, merged: UTF8String): Array[UTF8String] = {
    val n = arr.length
    val out = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!(i > 0 && arr(i - 1).equals(a) && arr(i).equals(b))) {
        out(m) =
          if (arr(i).equals(a) && i + 1 < n && arr(i + 1).equals(b)) merged
          else arr(i)
        m += 1
      }
      i += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }
}

/** Single-pass corpus application of a LEARNED, rank-ordered BPE merge
  * table: each document's token array folds through ALL merges locally —
  * ONE pass over the corpus regardless of table size, no window, no
  * shuffle, no per-merge re-index. This is the scale fix for q131's apply
  * phase: one lead/lag window round PER MERGE costs O(merge-table) full
  * passes over 100 TB (a real tokenizer has ~30k merges); per-document
  * application of a FIXED table needs no cross-row coordination at all,
  * so it belongs in a partition-local expression with the table riding
  * the plan as a reference object. Each merge is applied with EXACTLY the
  * window round's simultaneous original-neighbor semantics
  * ([[BpeApply.round]]) so the unrolled-round SQL stays the exact oracle;
  * ArrayExprsSpec pins fold ≡ rounds on adversarial run/overlap cases.
  * CodegenFallback: per-row feature extraction, not a per-pair hot loop
  * (the Md5MinHashSig precedent). Input arrays must not contain null
  * elements (split() output never does). */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with GraftArrayInputCheck
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.unsafe.types.UTF8String

  override protected def expectedInputs: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val table: Array[Array[UTF8String]] =
    merges.map { case (a, b) => Array(UTF8String.fromString(a),
      UTF8String.fromString(b), UTF8String.fromString(s"${a}_$b"))
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    var arr = xs.toObjectArray(StringType).asInstanceOf[Array[AnyRef]]
      .map(_.asInstanceOf[UTF8String])
    var r = 0
    while (r < table.length) {
      val t = table(r)
      arr = BpeApply.round(arr, t(0), t(1), t(2))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      arr.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
