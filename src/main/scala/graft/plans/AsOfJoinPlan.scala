package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Backward as-of join as a WHOLE-OPERATOR implementation — the
  * SURVEY §2b preference-ladder rung (c): custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Semantics (reference analog R16 "latest matching blob",
  * child.py:183-188): for every left row, attach the LAST right row of
  * the same key whose time is <= the left row's time, or nulls if none.
  *
  * Why a physical operator: the composable formulations either range-
  * join-then-aggregate (join_asof — the match set EXPLODES to every
  * prior right row before the max collapses it) or window-over-union.
  * The merge pass is O(n_left + n_right) per partition with O(1) state:
  * both sides arrive hash-partitioned by key and sorted (key, time) —
  * declared via requiredChildDistribution/Ordering, so EnsureRequirements
  * plans the exchanges and sorts like it does for SortMergeJoin, and AQE
  * still manages them. At 100 TB this is the only shape that neither
  * explodes nor buffers a group.
  *
  * Scope: key, time, and tie-break are LongType attributes; null
  * key/time left rows emit unmatched, null right rows never match (SQL
  * comparison semantics: null <= x is unknown). `rightTie` makes ties
  * deterministic: among right rows sharing the latest (key, time) the
  * HIGHEST tie value wins — without it the winner would be whichever
  * row the (unstable) shuffle happened to order last. */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: AttributeReference,
    leftTime: AttributeReference,
    rightKey: AttributeReference,
    rightTime: AttributeReference,
    rightTie: AttributeReference)
  extends BinaryNode {

  require(Seq(leftKey, leftTime, rightKey, rightTime, rightTie)
    .forall(_.dataType == LongType), "as-of join keys/times must be LONG")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: AttributeReference,
    leftTime: AttributeReference,
    rightKey: AttributeReference,
    rightTime: AttributeReference,
    rightTie: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Both sides clustered on the key — EnsureRequirements inserts
  // compatible hash exchanges (exactly as for a sort-merge join)...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // ...and sorts each side inside every partition: (key, time) on the
  // left; (key, time, tie) on the right, so the merge's keep-last rule
  // deterministically selects the max-tie row among equal times.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0,
      "as-of join keys must come from the respective child outputs")
    val rightWidth = right.output.size
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val rBuf = ri.buffered

      // O(1) merge state: the latest right row for the key being swept.
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null

      li.map { lrow =>
        if (lrow.isNullAt(lkIdx) || lrow.isNullAt(ltIdx)) {
          proj(joined(lrow, nullRight))
        } else {
          val lk = lrow.getLong(lkIdx)
          val lt = lrow.getLong(ltIdx)
          // advance the right side through every row that could still
          // be "the latest <= lt" for key lk
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            if (r.isNullAt(rkIdx) || r.isNullAt(rtIdx)) { rBuf.next() }
            else {
              val rk = r.getLong(rkIdx)
              if (rk < lk) rBuf.next()
              else if (rk == lk && r.getLong(rtIdx) <= lt) {
                matchKey = rk; hasMatch = true
                matchRow = rBuf.next().copy() // UnsafeRow reuse — must copy
              } else advance = false
            }
          }
          if (hasMatch && matchKey == lk) proj(joined(lrow, matchRow))
          else proj(joined(lrow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
