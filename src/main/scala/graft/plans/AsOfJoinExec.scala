package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: a single-pass merge over two inputs that Catalyst
  * has already hash-partitioned by key and sorted by (key, ts) — the
  * requirements below make EnsureRequirements insert exactly the exchanges
  * and sorts needed, and AQE still owns their sizing.
  *
  * Cost: one shuffle + sort per side, then O(n_left + n_right) per
  * partition with O(1) state (the last in-horizon right row per key). This
  * beats the window-function formulation ([[graft.operators.AsOf]]) by not
  * materializing the unioned frame, and beats a range join by never
  * generating candidate pairs. Skew: hot keys are still single-partition —
  * salt upstream if a single key exceeds a partition (operators/Skew).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    // localize everything the task closure needs — referencing `output` or
    // `leftKey` inside zipPartitions would capture the whole plan tree
    val outputAttrs = output
    val keyDataType = leftKey.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // downstream operators (shuffle serializers in particular) expect
      // UnsafeRow — project the JoinedRow through the standard projection
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      val it = new Iterator[InternalRow] {
        private val nullRight = new GenericInternalRow(rightWidth)
        private val joined = new JoinedRow

        private val rBuf = rIter.buffered
        private var matchKey: Any = null
        private var matchRow: InternalRow = null

        private def keyOf(e: Expression, row: InternalRow): Any = e.eval(row)
        /** Long micros/millis for Timestamp/Long ts columns; null → null
          * (SQL: comparisons with NULL are unknown, so no match). Types are
          * validated at plan build ([[graft.operators.AsOf.joinNative]]). */
        private def tsOf(e: Expression, row: InternalRow): java.lang.Long =
          e.eval(row).asInstanceOf[java.lang.Long]

        // keys are simple orderable values (numeric/string); compare via
        // the natural ordering Spark uses for sorts on the same expression
        private val keyOrd: Ordering[Any] =
          org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(keyDataType)
            .asInstanceOf[Ordering[Any]]

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = keyOf(lKey, l)
          val lt = tsOf(lTs, l)
          // SQL semantics: null keys/timestamps never match
          if (lk == null || lt == null) return joined(l, nullRight)
          // drop remembered match from an earlier key
          if (matchRow != null && keyOrd.compare(matchKey, lk) != 0) {
            matchRow = null; matchKey = null
          }
          // advance the right side through everything at-or-before (lk, lt);
          // null right keys sort first and never match — discard them
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rk = keyOf(rKey, r)
            val rt = tsOf(rTs, r)
            if (rk == null || rt == null) { rBuf.next() } // null key/ts: never matches
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next() } // behind on key: discard
              else if (c == 0 && rt <= lt) {
                matchKey = lk match { case s: org.apache.spark.unsafe.types.UTF8String => s.copy(); case v => v }
                matchRow = rBuf.next().copy() // rows are reused buffers
              } else advancing = false
            }
          }
          if (matchRow != null && keyOrd.compare(matchKey, lk) == 0) joined(l, matchRow)
          else joined(l, nullRight)
        }
      }
      it.map(toUnsafe)
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
