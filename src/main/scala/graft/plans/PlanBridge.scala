// Lives in an org.apache.spark.sql subpackage ON PURPOSE: Dataset.ofRows —
// the one blessed way to wrap a custom LogicalPlan as a DataFrame — is
// private[sql]. This shim is the entire surface we take from the internal
// API; everything else in graft.plans uses public/developer-api types.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

object PlanBridge {
  def ofRows(s: org.apache.spark.sql.SparkSession, p: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], p)

  /** Wrap a raw Catalyst Expression as a Column — for expressions carrying
    * a non-Expression constructor parameter (e.g. [[graft.functions.BpeApply]]'s
    * merge table), which the function-registry path can't build. Third
    * private[sql] surface we take. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  /** The inverse: a Column's Catalyst Expression (Column.expr is gone in
    * Spark 4's ColumnNode world). Same shim surface as [[column]]. */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Re-wrap the micro-batch DataFrame a V1 `Sink.addBatch` receives as a
    * standalone BATCH frame (ForeachBatchSink's own recipe —
    * `LogicalRDD.fromDataset` over the executed RDD): the incoming
    * frame's plan belongs to the streaming IncrementalExecution, so
    * running further jobs against it (the z-append's bounds aggregation,
    * CHECK-constraint pass, clustered write) would re-plan the stream.
    * Fourth private[sql] surface we take. */
  def freezeBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cdf = df.asInstanceOf[classic.DataFrame]
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      cdf.queryExecution.toRdd, cdf, isStreaming = false)
    classic.Dataset.ofRows(cdf.sparkSession, node)
  }

  /** A one-row DataFrame's head as a CATALYST InternalRow (UTF8String /
    * epoch-micros / primitives) — what a DSv2 scan that answers an
    * aggregate from the metadata plane embeds in its single partition,
    * skipping the external→internal round trip. Fifth shim surface. */
  def internalHead(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.InternalRow =
    df.asInstanceOf[classic.DataFrame].queryExecution.executedPlan
      .executeCollect()(0)

  /** The EXECUTED physical plan of a streaming query's most recent
    * micro-batch — the streaming analog of `df.queryExecution.executedPlan`,
    * used by StreamingPlanSpec to pin streaming plan shapes the way
    * PlanSpec pins batch ones. Second (and last) private[sql] surface we
    * take: StreamingQueryWrapper → StreamExecution.lastExecution. */
  def lastExecutedPlan(
      q: org.apache.spark.sql.streaming.StreamingQuery): Option[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.streaming.runtime.{StreamExecution, StreamingQueryWrapper}
    val exec: Option[StreamExecution] = q match {
      case w: StreamingQueryWrapper => Some(w.streamingQuery)
      case s: StreamExecution => Some(s)
      case _ => None
    }
    exec.flatMap(se => Option(se.lastExecution)).map(_.executedPlan)
  }
}
