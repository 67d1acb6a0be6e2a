package graft.functions.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native one-pass L2 normalization of a numeric array (doubles out;
  * all-zero vectors normalize to all zeros).
  *
  * Why: the higher-order-function formulation
  * `transform(a, x -> x / norm(a))` re-evaluates the O(d) norm aggregate
  * inside the per-element lambda — O(d²) per row, interpreted (HOF lambdas
  * get no cross-lambda subexpression elimination). This is two passes of
  * primitive-loop JVM code, and the static-call codegen keeps the enclosing
  * projection inside whole-stage codegen. */
case class ArrayL2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_l2normalize requires a float/double array, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    ArrayL2Normalize.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.catalyst.ArrayL2Normalize.compute($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): ArrayL2Normalize =
    copy(child = newChild)

  override def prettyName: String = "graft_l2normalize"
}

object ArrayL2Normalize {
  /** Two primitive passes: norm, then divide. Null elements are read as 0.0
    * — defined explicitly (isNullAt) rather than relying on the unsafe
    * accessor's zeroed-slot behavior; same convention as
    * [[ArrayDotProduct]]. Called from generated code. */
  def compute(arr: ArrayData, isFloat: Boolean): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    def at(i: Int): Double =
      if (arr.isNullAt(i)) 0.0
      else if (isFloat) arr.getFloat(i).toDouble
      else arr.getDouble(i)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = at(i); ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    i = 0
    while (i < n) {
      out(i) = if (norm == 0.0) 0.0 else at(i) / norm
      i += 1
    }
    new GenericArrayData(out)
  }
}
