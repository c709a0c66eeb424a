package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The engine's whole-operator Catalyst extension: backward as-of join
  * as a FIRST-CLASS physical operator — logical node + planner strategy
  * + sort-merge exec, registered through `SparkSessionExtensions`
  * (builder) / `experimentalMethods.extraStrategies` (live session).
  *
  * Why a physical operator when the union-LOCF formulation
  * ([[graft.operators.AsOfJoin.asofBackward]]) is already linear:
  * the union form pays ONE sort over left+right CONCATENATED — every
  * left row is widened with null right-struct slots (and vice versa)
  * before the sort, and the window operator buffers a running frame.
  * This exec co-partitions the sides independently (each sort sees
  * only its own columns), then streams a two-pointer merge with O(1)
  * state per partition: the classic trades/quotes merge, at shuffle
  * cost = the two sides' own bytes. Semantics match `asofBackward`:
  * for each left row, the LAST right row with the same key and
  * `rightTime <= leftTime` (right must be one row per (key, time) for
  * a deterministic match); unmatched left rows keep null right
  * columns (left-outer).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; everything else falls
  * through to the built-in strategies.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge backward as-of join. EnsureRequirements satisfies the
  * declared contract: both children hash-co-partitioned on the keys
  * (ClusteredDistribution pair, the SortMergeJoin mechanism) and each
  * sorted by (keys…, time) — so `doExecute` is a pure per-partition
  * two-pointer merge: advance the right cursor while it is ≤ the left
  * row's (key, time), remembering the latest same-key row; O(n+m)
  * time, O(1) match state. Right rows are copied off the UnsafeRow
  * iterator (one live copy at a time — the candidate), left rows
  * stream through un-copied.
  */
case class AsOfJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyGen = () => UnsafeProjection.create(leftKeys, left.output)
    val rKeyGen = () => UnsafeProjection.create(rightKeys, right.output)
    val lTimeGen = () => UnsafeProjection.create(Seq(leftTime), left.output)
    val rTimeGen = () =>
      UnsafeProjection.create(Seq(rightTime), right.output)
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = lKeyGen(); val rKey = rKeyGen()
      val lTime = lTimeGen(); val rTime = rTimeGen()
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the right cursor: rCurRow is the next not-yet-consumed right
        // row (COPIED — UnsafeRow iterators reuse buffers); match* is
        // the latest right row at or before the current left (key,time)
        private var rCurRow: UnsafeRow = _
        private var rCurKey: UnsafeRow = _
        private var rCurTime: UnsafeRow = _
        private var matchRow: UnsafeRow = _
        private var matchKey: UnsafeRow = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rCurRow = rIter.next().asInstanceOf[UnsafeRow].copy()
            rCurKey = rKey(rCurRow).copy()
            rCurTime = rTime(rCurRow).copy()
          } else { rCurRow = null; rCurKey = null; rCurTime = null }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey(l)
          val lt = lTime(l)
          // consume right rows ≤ (lk, lt); the last same-key one is
          // the candidate match
          while (rCurRow != null && {
            val kc = keyOrd.compare(rCurKey, lk)
            kc < 0 || (kc == 0 && timeOrd.compare(rCurTime, lt) <= 0)
          }) {
            if (keyOrd.compare(rCurKey, lk) == 0) {
              matchRow = rCurRow; matchKey = rCurKey
            }
            advanceRight()
          }
          val rSide =
            if (matchRow != null && keyOrd.compare(matchKey, lk) == 0)
              matchRow
            else nullRight
          resultProj(joined(l, rSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
