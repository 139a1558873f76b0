package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class physical operator — the deepest
  * extension seam (custom LogicalPlan + Strategy + SparkPlan, injected
  * via SparkSessionExtensions), used where COMPOSED plans pay real
  * overhead: the engine's other as-of forms (q25/q75/q210) express the
  * semantics through union+window or inequality-join+top-1, which cost
  * either a window over the unioned frames or a candidate blow-up
  * before the top-1. This operator does what a database would: shuffle
  * both sides once on the key, sort (key, time) within partitions, and
  * MERGE-SCAN — each left row picks up the LATEST right row with
  * rTime ≤ lTime for its key in one forward pass, O(|L|+|R|) per
  * partition with zero buffering beyond a single candidate row.
  *
  * Left-outer semantics (unmatched left rows keep nulls on the right),
  * the shape of every "decorate events with the prevailing quote /
  * funding rate / config epoch" pipeline. Time columns are LongType by
  * contract (epoch numbers — what the tables store); key columns must
  * match positionally in type across the two sides.
  *
  * The node is created POST-ANALYSIS from resolved children (see
  * graft.ops.AsOf), so no analyzer work is needed; Catalyst still
  * optimizes below it (pushdown into either side is unaffected), and
  * EnsureRequirements provides the co-partitioned exchanges + sorts
  * declared by requiredChildDistribution/Ordering — the operator
  * composes with AQE like any built-in shuffled join.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs at least one equi key on both sides")
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of time columns must be LongType epochs")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec (one-to-one). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on the key — EnsureRequirements aligns the
    * two hash partitionings exactly as it does for SortMergeJoin. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (key, time) ascending within partitions — the merge-scan order. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against NULLABLE right attributes: binding against the
      // child's original non-nullable output would read unmatched
      // rows' null slots as garbage zeros instead of nulls
      val resultProj = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      val nulls = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one-row lookahead over the right side; `candidate` holds the
        // latest right row whose (key, time) is still ≤ the current
        // left row — the ONLY buffered state, so partition memory is
        // O(1) beyond the sort the planner already inserted
        private var rNext: InternalRow = advanceRight()
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _

        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lT = lTimeProj(l).getLong(0)
          // drop a stale candidate from a previous key group
          if (candidate != null && keyOrd.compare(candidateKey, lKey) != 0) {
            candidate = null; candidateKey = null
          }
          // consume right rows while they are usable for this left row
          // (smaller key, or same key with time ≤ lT); the last same-key
          // one seen is the as-of match. Rows are consumed exactly once
          // across the whole partition — left times ascend within a
          // key, so discarded right rows can never be needed again.
          var advancing = true
          while (advancing && rNext != null) {
            val rKey = rKeyProj(rNext)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              rNext = advanceRight() // key group with no left rows left
            } else if (c == 0 && rTimeProj(rNext).getLong(0) <= lT) {
              candidate = rNext.copy() // row objects are reused: copy
              candidateKey = rKeyProj(candidate).copy()
              rNext = advanceRight()
            } else {
              advancing = false
            }
          }
          if (candidate != null) resultProj(joined(l, candidate))
          else resultProj(joined(l, nulls))
        }
      }
    }
  }
}
