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

  // null elements propagate (HOF parity), so the output is nullable exactly
  // when the input is
  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)

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
  /** Pass 1: max |x| over non-null elements (`array_max` skips nulls);
    * pass 2: `floor(x·scale + 0.5)` clamped through the byte cast, divided
    * back out. Matches the HOF chain exactly, including null elements: with
    * scale > 0 a null element round-trips to null (`transform` propagates
    * null through the arithmetic), and with scale == 0 (all-zero or
    * all-null input) every element becomes 0.0 (`when(scale > 0, ...)
    * .otherwise(0.0)` ignores the element). Called from generated code. */
  def compute(arr: ArrayData, isFloat: Boolean): GenericArrayData = {
    val n = arr.numElements()
    def at(i: Int): Double =
      if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    var mx = 0.0
    var hasNaN = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = math.abs(at(i))
        // Spark's array_max orders NaN ABOVE every double, so one NaN
        // element makes the HOF max NaN; Java's `a > mx` would silently
        // skip it — track it explicitly to stay bit-identical
        if (a.isNaN) hasNaN = true else if (a > mx) mx = a
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (hasNaN) {
      // HOF chain: max = NaN → `when(mx > 0.0, ...)` is TRUE under Spark's
      // NaN-is-greatest comparison → scale = 127/NaN = NaN → every non-null
      // element dequantizes to NaN (nulls still propagate)
      i = 0
      while (i < n) {
        out(i) = if (arr.isNullAt(i)) null else Double.NaN
        i += 1
      }
      return new GenericArrayData(out)
    }
    val scale = if (mx > 0.0) 127.0 / mx else 0.0
    i = 0
    while (i < n) {
      out(i) =
        if (scale == 0.0) 0.0
        else if (arr.isNullAt(i)) null
        else math.floor(at(i) * scale + 0.5).toByte.toDouble / scale
      i += 1
    }
    new GenericArrayData(out)
  }
}
