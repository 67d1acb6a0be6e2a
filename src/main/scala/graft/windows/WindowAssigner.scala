package graft.windows

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.concurrent.duration.Duration

/** Event-time window assigners.
  *
  * Mirrors the reference's `WindowAssigner` (reference:
  * src/main/scala/zio/analytics/Window.scala:22-31): tumbling and sliding are
  * `Fixed(size, step)` there; session is declared but unimplemented (`???`,
  * Window.scala:23-26). We compile every assigner to Spark's native
  * `window()` / `session_window()` grouping column, which gives:
  *
  *   - correct sliding semantics — the reference's `firstStart` floors to
  *     `size` instead of scanning back `size-step`, dropping covering windows
  *     (Window.scala:10-20; SURVEY.md §2.3). Spark replicates each element
  *     into all ⌈size/step⌉ covering windows.
  *   - a working session implementation the reference never finished;
  *   - `[start, end)` bounds (the reference's inclusive-upper convention is
  *     normalized here once, per SURVEY.md §7.3 #3).
  *
  * At scale, `window()` is just a generated grouping expression — the shuffle
  * is the same hash-partition-by-(key, window) an explicit implementation
  * would need, and Catalyst prunes replicated rows before the exchange.
  */
sealed trait WindowAssigner {
  /** Grouping column over an event-time column of epoch millis. */
  def toColumn(tsMillis: Column): Column = onTimestamp(timestamp_millis(tsMillis))

  /** Grouping column over a TimestampType column (required form for
    * streaming, where the window must be built on the exact watermarked
    * column). */
  def onTimestamp(ts: Column): Column
}

object WindowAssigner {

  final case class Tumbling(sizeMs: Long) extends WindowAssigner {
    def onTimestamp(ts: Column): Column = window(ts, s"$sizeMs milliseconds")
  }

  final case class Sliding(sizeMs: Long, stepMs: Long) extends WindowAssigner {
    def onTimestamp(ts: Column): Column =
      window(ts, s"$sizeMs milliseconds", s"$stepMs milliseconds")
  }

  final case class Session(gapMs: Long) extends WindowAssigner {
    def onTimestamp(ts: Column): Column = session_window(ts, s"$gapMs milliseconds")
  }

  def tumbling(size: Duration): WindowAssigner = Tumbling(size.toMillis)
  def sliding(size: Duration, step: Duration): WindowAssigner = Sliding(size.toMillis, step.toMillis)
  def session(gap: Duration): WindowAssigner = Session(gap.toMillis)

  /** Convert Spark's `window` struct (timestamps) to the engine's
    * `TimeWindow` struct (epoch millis, `[start, end)`). */
  def toTimeWindow(windowCol: Column): Column =
    struct(
      unix_millis(windowCol.getField("start")).as("start"),
      unix_millis(windowCol.getField("end")).as("end"))
}
