package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators (`Aggregator[IN, BUF, OUT]`) — the UDAF row of
  * SURVEY.md §2.b. The reference has no aggregation surface at all; these
  * cover the "custom agg the built-ins can't express" case the way Spark
  * wants it done: a typed `Aggregator` registered via `functions.udaf`,
  * which participates in partial (map-side) aggregation like any built-in —
  * the buffer is merged executor-side, so a groupBy over 100 TB ships one
  * small buffer per (partition, group), not the rows.
  *
  * Determinism note: partial-aggregate merge ORDER is not deterministic on a
  * cluster, so a buffer of doubles would produce run-to-run ulp differences
  * (double addition is not associative). The centroid buffer therefore sums
  * fixed-point scaled LONGS (exact, associative, overflow-safe: 1e7 scale ×
  * |x|≲10 × 1e12 rows < 2^63) and converts to double once at the end —
  * bit-identical results on any cluster topology, and exactly reproducible
  * by the DuckDB oracle.
  */
object Aggregators {

  /** Sum buffer for a fixed-dim vector: element-wise scaled-long sums + row
    * count. `sums` is null until the first input (dim learned from data). */
  final case class VecSum(var sums: Array[Long], var n: Long)

  /** Fixed-point scale: 1e7 ≈ float32's 24-bit precision for |x| ≤ 1. */
  final val Scale = 1e7

  /** Element-wise mean of an `array<double>` column, as scaled-long sums +
    * count (callers divide; see [[centroid]] usage in sim.Similarity).
    *
    * `floor(x*Scale + 0.5)` rather than `rint`/`round`: floor is the one
    * rounding primitive every engine (Spark, DuckDB, IEEE) defines
    * identically, so the oracle can reproduce the quantization exactly.
    */
  class VectorCentroid extends Aggregator[Array[Double], VecSum, VecSum] {
    override def zero: VecSum = VecSum(null, 0L)

    private def quantize(x: Double): Long = math.floor(x * Scale + 0.5).toLong

    override def reduce(b: VecSum, a: Array[Double]): VecSum = {
      if (a != null) {
        if (b.sums == null) b.sums = new Array[Long](a.length)
        var i = 0
        while (i < a.length) { b.sums(i) += quantize(a(i)); i += 1 }
        b.n += 1
      }
      b
    }

    override def merge(x: VecSum, y: VecSum): VecSum = {
      if (x.sums == null) y
      else if (y.sums == null) x
      else {
        var i = 0
        while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
        x.n += y.n
        x
      }
    }

    override def finish(r: VecSum): VecSum = r
    override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
    override def outputEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  }

  /** The centroid aggregator as a Column function: struct(sums, n). */
  def centroidAgg(v: Column): Column = udaf(new VectorCentroid).apply(v)

  /** One scored candidate for [[TopKHits]]. */
  final case class Hit(cos: Double, neighborId: Long, label: Int)
  final case class HitBuf(hits: Seq[Hit])

  /** Bounded top-k by (cos DESC, neighborId ASC) as a typed Aggregator —
    * the scale-correct alternative to `row_number().over(partitionBy(q))`
    * for small k: the rank window shuffles EVERY scored row to one task
    * per query, while this keeps at most k rows per (partition, query)
    * map-side and merges k-vs-k buffers — the shuffle carries
    * k·partitions rows regardless of corpus size. Total order on
    * (cos, neighborId) ⇒ result independent of merge order. */
  class TopKHits(k: Int) extends Aggregator[Hit, HitBuf, HitBuf] {
    private val ord: Ordering[Hit] =
      Ordering.by((h: Hit) => (-h.cos, h.neighborId))

    override def zero: HitBuf = HitBuf(Vector.empty)

    override def reduce(b: HitBuf, h: Hit): HitBuf = {
      if (b.hits.length == k && ord.gteq(h, b.hits.last)) b
      else HitBuf(((b.hits :+ h).sorted(ord)).take(k))
    }

    override def merge(x: HitBuf, y: HitBuf): HitBuf =
      HitBuf((x.hits ++ y.hits).sorted(ord).take(k))

    override def finish(r: HitBuf): HitBuf = r
    override def bufferEncoder: Encoder[HitBuf] = Encoders.product[HitBuf]
    override def outputEncoder: Encoder[HitBuf] = Encoders.product[HitBuf]
  }

  /** Top-k hits as a Column function over (cos, neighborId, label). */
  def topKAgg(k: Int)(cos: Column, neighborId: Column, label: Column): Column =
    udaf(new TopKHits(k)).apply(cos, neighborId, label)
}
