package graft.functions.catalyst

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, NumericType, TypeCollection}

/** Native, codegen'd dot product over two numeric array columns.
  *
  * Why a custom Catalyst expression: Spark's higher-order functions
  * (`zip_with` + `aggregate`) evaluate their lambda *interpreted, per
  * element* — measured ~6× slower on 64-dim embedding scoring (SURVEY.md
  * §4.2's "custom Expression beats UDF" preference, applied). This is the
  * hot inner loop of every similarity operator, so it earns `doGenCode`:
  * whole-stage codegen sees a tight primitive loop with no virtual calls
  * and no per-element allocation.
  *
  * Semantics are IDENTICAL to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)` for
  * null-free arrays: elements widened to double, products accumulated
  * strictly left-to-right — bit-for-bit the result the DuckDB oracle
  * computes with the mirrored SQL. Nulls: a null ARRAY → null; a null
  * ELEMENT is read as 0.0 (the HOF formulation would return null for the
  * whole sum — don't feed null-element vectors to either).
  * Length mismatch → dot over the common prefix.
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two float/double arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression) = e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lt = elemType(left)
    val rt = elemType(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xa = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yb = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      s += xa * yb
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val lt = elemType(left)
      val rt = elemType(right)
      def get(arr: String, t: DataType, i: String) = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _         => s"$arr.getDouble($i)"
      }
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(x, lt, i)} * ${get(y, rt, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
