package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for each left row, attach the most recent right row
  * with equal key and `rightTs <= leftTs` (left-outer semantics: no match →
  * nulls).
  *
  * Spark has no as-of join operator; this is the (c)-tier extension path
  * (custom LogicalPlan + Strategy + SparkPlan, registered through
  * SparkSessionExtensions) for an operator whose semantics built-ins can't
  * express without either a quadratic range join or a window-function
  * detour (see [[graft.operators.AsOf]] for the compositional form; both
  * implementations are kept and cross-checked against the same DuckDB ASOF
  * oracle).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
