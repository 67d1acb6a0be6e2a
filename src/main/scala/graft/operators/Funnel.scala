package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event log: for a step sequence
  * (s₁, …, sₖ), how many users performed s₁, then s₂ strictly after it,
  * …, each within an optional conversion window. The training-data
  * counterpart of product funnels: acquisition → annotation → acceptance
  * pipelines over contributor event logs.
  *
  * ## Scale shape (100 TB)
  * One hash aggregate + equi-join per step, all keyed on the user — the
  * per-step "reached" sets shrink monotonically, so AQE broadcasts the
  * tail steps once they fit. Each step's event scan pushes
  * `event_type = sᵢ` down to parquet (only that step's rows are read).
  * min() is partial-aggregable, nothing collects, no window over an
  * unpartitioned frame. Conversion windows compare integer MICROSECONDS
  * (`unix_micros`), never truncated milliseconds, so the boundary is
  * exact at full timestamp precision. */
object Funnel {

  /** One row per funnel step: (step 1-based, event_type, users reached).
    * A user reaches step i+1 if an event of that type exists strictly
    * after their step-i time (the earliest qualifying one becomes their
    * step-i+1 time), and within `withinMs` of it when given. */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             steps: Seq[String], withinMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")

    def stepMin(df: DataFrame): DataFrame =
      df.groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))

    val reached = steps.tail.scanLeft(stepMin(events.where(col(typeCol) === steps.head))) {
      (prev, st) =>
        val qualifies: Column = withinMs match {
          case Some(w) =>
            col(tsCol) > col("_tp") &&
              unix_micros(col(tsCol)) <= unix_micros(col("_tp")) + lit(w * 1000L)
          case None => col(tsCol) > col("_tp")
        }
        stepMin(
          events.where(col(typeCol) === st)
            .join(prev.select(col(userCol), col("_t").as("_tp")), Seq(userCol))
            .where(qualifies))
    }

    reached.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"), col("users"))
    }.reduce(_ unionAll _)
  }
}
