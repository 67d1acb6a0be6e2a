package graft.functions.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native int8 quantize→dequantize round trip of an embedding in two
  * primitive passes — bit-identical to
  * `Vectors.dequantizeInt8(Vectors.quantizeInt8(x))` (spec-proven) but
  * ~10× cheaper: the HOF formulation runs three interpreted
  * `transform`/`array_max` lambdas per row, which measured as the dominant
  * cost of the quantized-IVF corpus pass (tools: q67 4.2s → expected ~2s
  * at sf0.1). The SEMANTIC definition stays the HOF pair (q65's oracle
  * mirrors it); this expression is the hot-path twin for operators that
  * only need the dequantized values. */
case class ArrayInt8RoundTrip(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_int8_roundtrip requires a float/double array, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    ArrayInt8RoundTrip.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.catalyst.ArrayInt8RoundTrip.compute($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): ArrayInt8RoundTrip =
    copy(child = newChild)

  override def prettyName: String = "graft_int8_roundtrip"
}

object ArrayInt8RoundTrip {
  /** Pass 1: max |x|; pass 2: `floor(x·scale + 0.5)` clamped through the
    * byte cast, divided back out. Matches the HOF chain exactly: same
    * floor-based rounding, same zero-scale guard, null elements read as
    * 0.0 ([[ArrayDotProduct]] convention). Called from generated code. */
  def compute(arr: ArrayData, isFloat: Boolean): GenericArrayData = {
    val n = arr.numElements()
    def at(i: Int): Double =
      if (arr.isNullAt(i)) 0.0
      else if (isFloat) arr.getFloat(i).toDouble
      else arr.getDouble(i)
    var mx = 0.0
    var i = 0
    while (i < n) { val a = math.abs(at(i)); if (a > mx) mx = a; i += 1 }
    val scale = if (mx > 0.0) 127.0 / mx else 0.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (scale > 0.0) math.floor(at(i) * scale + 0.5).toByte.toDouble / scale
        else 0.0
      i += 1
    }
    new GenericArrayData(out)
  }
}
