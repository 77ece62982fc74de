package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, EqualTo, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst extension path
  * (SURVEY.md §4 escape hatch (c)): `LogicalPlan` + optimizer `Rule` +
  * `SparkStrategy` + `SparkPlan`, registered per session (or globally via
  * `GraftExtensions`).
  *
  * Semantics (inner, backward): for each left row, the single right row
  * with equal keys and the greatest `rightTs <= leftTs`; left rows with no
  * such row are dropped — DuckDB's `ASOF JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts` (the q80 oracle).
  *
  * Why a custom operator: expressed relationally this is a theta join +
  * per-key argmax — O(|L|·|R|) pairs per key before the filter. The
  * composable workaround (union + carry-forward window, kept as the
  * reference formulation in AsofSpec) is one shuffle but sorts the UNION
  * and carries every left column through the window. The native exec:
  *
  *  - requires `ClusteredDistribution(keys)` on both children — ONE
  *    hash-shuffle each (co-partitioned, like SortMergeJoin), none if the
  *    data is already bucketed/partitioned by key;
  *  - requires child ordering by (keys, ts) — Spark plans local sorts,
  *    which spill instead of exploding memory on 100 TB partitions;
  *  - then streams BOTH sides in one forward pass per partition: zero
  *    buffering beyond one candidate row per side, zero pair blow-up.
  *
  * Null keys/timestamps follow sort-order semantics (nulls first, null
  * keys match each other) — callers filter nulls if SQL-equality drop
  * semantics are needed.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {
  // like join(..., usingColumns): the right key columns are redundant with
  // (and ambiguous against) the left's, so they are not emitted
  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(a => rightKeys.exists(_.semanticEquals(a)))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Key-equality predicate pushdown: a filter above the as-of join that
  * references only left JOIN KEYS holds for the matching right rows too
  * (keys are equal), so it pushes into BOTH children — pruning each side's
  * scan instead of post-filtering the join. Generic Catalyst pushdown
  * cannot know this about an opaque node. */
object PushFilterThroughAsof extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsofJoinPlan) =>
      val keyPairs = j.leftKeys.zip(j.rightKeys)
      val leftKeyAttrs = j.leftKeys.flatMap(_.references)
      val (pushable, rest) = splitConjunctivePredicates(cond).partition { p =>
        p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(org.apache.spark.sql.catalyst.expressions.AttributeSet(leftKeyAttrs))
      }
      if (pushable.isEmpty) f
      else {
        val leftCond = pushable.reduce(org.apache.spark.sql.catalyst.expressions.And)
        // the same predicate over the paired right keys
        val rightCond = leftCond.transform {
          case e: Expression =>
            keyPairs.find(_._1.semanticEquals(e)).map(_._2).getOrElse(e)
        }
        val pushed = j.copy(
          left = Filter(leftCond, j.left),
          right = Filter(rightCond, j.right))
        if (rest.isEmpty) pushed
        else Filter(rest.reduce(org.apache.spark.sql.catalyst.expressions.And), pushed)
      }
  }

  private def splitConjunctivePredicates(c: Expression): Seq[Expression] = c match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoinPlan =>
      AsofJoinExec(j.leftKeys, j.rightKeys, j.leftTs, j.rightTs,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(a => rightKeys.exists(_.semanticEquals(a)))

  // co-partitioned like SortMergeJoin: one hash exchange per unpartitioned
  // child, none when the child is already clustered by the keys
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // local (spillable) sorts by (keys, ts), planned by EnsureRequirements
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsB.dataType))
      // bind by exprId against the full joined row (right keys dropped)
      val resultProj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var lastMatch: InternalRow = null // copy; key checked per left row
        private var out: InternalRow = null

        private def advance(): Unit = {
          out = null
          while (out == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l) // projection buffer, valid until next call
            val lTsRow = lTsProj(l).copy() // survives rTsProj calls below
            // consume right rows at or before (lKey, lTs)
            var continue = rHead != null
            while (continue) {
              val kc = keyOrd.compare(rKeyProj(rHead), lKey)
              if (kc < 0 || (kc == 0 && tsOrd.compare(rTsProj(rHead), lTsRow) <= 0)) {
                if (kc == 0) lastMatch = rHead.copy()
                rHead = if (rIter.hasNext) rIter.next() else null
                continue = rHead != null
              } else continue = false
            }
            if (lastMatch != null && keyOrd.compare(rKeyProj(lastMatch), lKey) == 0) {
              out = resultProj(joined(l, lastMatch))
            }
          }
        }

        override def hasNext: Boolean = {
          if (out == null) advance()
          out != null
        }
        override def next(): InternalRow = {
          if (out == null) advance()
          val r = out
          out = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `Asof.join(purchases, clicks, Seq("user_id" -> "user_id"),
  * "ts" -> "ts")`. Registers the strategy + rule on the session
  * (idempotent); key/ts operands are resolved by NAME from each side so
  * the logical node is born resolved. */
object Asof {
  def ensureRegistered(s: SparkSession): Unit = {
    if (!s.experimental.extraStrategies.contains(AsofJoinStrategy))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsofJoinStrategy
    if (!s.experimental.extraOptimizations.contains(PushFilterThroughAsof))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ PushFilterThroughAsof
  }

  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      ts: (String, String)): DataFrame = {
    val s = left.sparkSession
    ensureRegistered(s)
    val lPlan = left.queryExecution.analyzed
    val rPlanRaw = right.queryExecution.analyzed
    // self-join safety: if the two sides share attribute ids (both built
    // from the same scan), re-alias the right side so every output gets a
    // fresh exprId — otherwise downstream name resolution is ambiguous
    val rPlan: LogicalPlan =
      if (rPlanRaw.outputSet.intersect(lPlan.outputSet).isEmpty) rPlanRaw
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlanRaw.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlanRaw)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(",")}]"))
    org.apache.spark.sql.graftshim.PlanBridge.ofRows(s,
      AsofJoinPlan(lPlan, rPlan,
        keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
        attr(lPlan, ts._1), attr(rPlan, ts._2)))
  }
}
