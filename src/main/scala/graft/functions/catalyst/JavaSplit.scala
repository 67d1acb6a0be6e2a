package graft.functions.catalyst

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Regex split with JAVA `String.split(regex)` semantics — intermediate
  * empty strings kept, TRAILING empty strings dropped (limit 0).
  *
  * Why not Spark's `StringSplit`: its `limit <= 0` keeps trailing empty
  * strings, which silently diverges from the reference contract (reference
  * Local.scala:26 evaluates `Split` with Java `String.split`) and from this
  * engine's own `Expr.eval` interpreter — `"a::b::".split("::")` must be
  * `[a, b]`, not `[a, b, ]`. A literal pattern is compiled ONCE at plan
  * time and shared by both the interpreted and codegen paths; a computed
  * pattern compiles per row (the reference evaluates its delimiter
  * expression per element too — same cost model, same semantics). */
case class JavaSplit(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_java_split requires (string, string), got ${left.dataType} / ${right.dataType}")

  /** Plan-time-compiled pattern for a literal delimiter; null otherwise. */
  @transient private lazy val compiled: Pattern = right match {
    case Literal(d: UTF8String, StringType) if d != null => Pattern.compile(d.toString)
    case _                                               => null
  }

  override def nullSafeEval(s: Any, d: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val parts =
      if (compiled ne null) compiled.split(str, 0)
      else str.split(d.asInstanceOf[UTF8String].toString)
    JavaSplit.toArrayData(parts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d) => {
      val cls = JavaSplit.getClass.getName.stripSuffix("$") + "$.MODULE$"
      if (compiled ne null) {
        val ref = ctx.addReferenceObj("pattern", compiled, classOf[Pattern].getName)
        s"${ev.value} = $cls.splitCompiled($s, $ref);"
      } else {
        s"${ev.value} = $cls.splitDynamic($s, $d);"
      }
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JavaSplit =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_java_split"
}

object JavaSplit {
  def splitCompiled(s: UTF8String, p: Pattern): ArrayData =
    toArrayData(p.split(s.toString, 0))

  def splitDynamic(s: UTF8String, d: UTF8String): ArrayData =
    toArrayData(s.toString.split(d.toString))

  private[catalyst] def toArrayData(parts: Array[String]): ArrayData =
    new GenericArrayData(parts.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
}
