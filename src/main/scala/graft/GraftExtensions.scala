package graft

import graft.functions.catalyst.{ApproxTopK, ArrayDotProduct, WordShingles}

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extensions installing the engine's native Catalyst functions,
  * for `spark.sql` users:
  * {{{ SparkSession.builder().withExtensions(new GraftExtensions) }}} */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      GraftFunctions.buildDot))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      GraftFunctions.buildShingles))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[ApproxTopK].getName, "graft_topk"),
      GraftFunctions.buildTopK))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {
  private[graft] val buildDot: Seq[Expression] => Expression =
    exprs => ArrayDotProduct(exprs.head, exprs(1))

  private[graft] val buildShingles: Seq[Expression] => Expression = exprs => {
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => sys.error(s"graft_shingles(text, n): n must be an integer literal, got $other")
    }
    WordShingles(exprs.head, n)
  }

  private[graft] val buildTopK: Seq[Expression] => Expression = exprs => {
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => sys.error(s"graft_topk(col, k, capacity): $what must be an integer literal, got $other")
    }
    ApproxTopK(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "capacity"))
  }

  /** Idempotent per-session registration, for sessions not built with
    * [[GraftExtensions]] (e.g. the driver-owned Verify/Bench sessions). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", buildDot, "built-in")
    reg.createOrReplaceTempFunction("graft_shingles", buildShingles, "built-in")
    reg.createOrReplaceTempFunction("graft_topk", buildTopK, "built-in")
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}
