package graft.functions.catalyst

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass word n-gram shingling: normalize (lowercase, collapse
  * whitespace) → tokenize → join n-grams.
  *
  * Why a custom expression: the built-in formulation
  * (`when(size(toks)<=n, …).otherwise(transform(sequence(…), i =>
  * concat_ws(" ", slice(toks, i+1, n))))`) references the token array four
  * times, and higher-order functions are evaluated interpreted with no
  * common-subexpression elimination — so normalization+split re-runs 4× per
  * row (measured: 5.4s of an 8.4s MinHash pass at sf0.1 was shingling).
  * Here the whole thing is one pass of JVM code per row.
  *
  * Semantics are IDENTICAL to the built-in formulation (and the DuckDB
  * oracle's mirror): documents with ≤ n tokens yield their whole normalized
  * text as a single shingle; empty text yields [""].
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  /** Codegen emits a call to the static compute — not a fused string loop,
    * but crucially NOT CodegenFallback either: the enclosing projection
    * stays inside whole-stage codegen instead of dropping the entire stage
    * to interpreted mode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.catalyst.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object WordShingles {
  /** One-pass normalize + tokenize + shingle. Called from generated code. */
  def compute(input: UTF8String, n: Int): GenericArrayData = {
    val toks = input.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    val shingles =
      if (toks.length <= n) Array(toks.mkString(" "))
      else Array.tabulate(toks.length - n + 1)(i => {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = i + 1
        while (j < i + n) { sb.append(' ').append(toks(j)); j += 1 }
        sb.toString
      })
    new GenericArrayData(shingles.map(UTF8String.fromString(_): Any))
  }
}
