package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: assign rows to sessions per key, where a gap
  * greater than `gapMs` starts a new session.
  *
  * The classic distributed formulation: lag-diff → new-session flag →
  * running sum = session index. ONE shuffle (hash by key) + per-partition
  * sort; no state store needed in batch. The streaming twin of this operator
  * is `session_window()` (see [[graft.windows.WindowAssigner.Session]]) —
  * the reference declared session windows but never implemented them
  * (reference Window.scala:23-26, `???`). */
object Sessionize {

  /** Adds `session_id` (0-based per key, in time order).
    * Deterministic given (keyCol, tsCol) unique pairs. */
  def assign(df: DataFrame, keyCol: String, tsCol: String, gapMs: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val prev = lag(col(tsCol), 1).over(byKey)
    // >= gap starts a new session — matching Spark's session_window, whose
    // windows are [start, last+gap): an event at exactly prevEnd does NOT
    // merge. Keeps the batch and streaming twins boundary-consistent.
    val isNew = when(
      prev.isNull ||
        (unix_millis(col(tsCol)) - unix_millis(prev)) >= gapMs, 1L).otherwise(0L)
    df.withColumn("_new_session", isNew)
      .withColumn("session_id",
        sum(col("_new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .drop("_new_session")
  }

  /** Per-session summary: count, start, end, duration millis. */
  def summarize(df: DataFrame, keyCol: String, tsCol: String, gapMs: Long): DataFrame =
    assign(df, keyCol, tsCol, gapMs)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_millis(max(col(tsCol))) - unix_millis(min(col(tsCol)))).as("duration_ms"))
}
