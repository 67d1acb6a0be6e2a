package graft

/** Core element wrapper types of the engine's typed dataflow algebra.
  *
  * These mirror the reference's data model (reference:
  * src/main/scala/zio/analytics/Expression.scala:5-7 for
  * `Grouped`/`Group`/`Timestamped`, Window.scala:33-34 for
  * `Window`/`Windowed`) but are plain case classes whose Spark encoding is a
  * struct with the same field names, so the expression translator
  * ([[graft.expr.Expr]]) can address fields by name.
  */

/** A single key-tagged element (post-`groupBy`, pre-aggregation).
  * Reference: Expression.scala:5. Spark encoding: `struct(key, value)`. */
case class Grouped[K, V](key: K, value: V)

/** A fully materialized group: key plus all values. Only realized when a
  * reducer genuinely needs the whole group (`collect_list`); expressible
  * reducers are rewritten to partial-aggregating native functions instead
  * (SURVEY.md §4.2). Reference: Expression.scala:6. */
case class Group[K, V](key: K, values: Seq[V])

/** An element with an assigned event time in epoch millis.
  * Reference: Expression.scala:7 (raw Long millis, Window.scala:12-13). */
case class Timestamped[A](timestamp: Long, value: A)

/** Window identity in epoch millis, `[start, end)` — Spark's convention.
  * The reference uses inclusive `[lower, lower+size-1]` (Window.scala:17);
  * we normalize once here per SURVEY.md §7.3 #3. */
case class TimeWindow(start: Long, end: Long)

/** An aggregate tagged with the window that produced it.
  * Reference: Window.scala:34. */
case class Windowed[A](window: TimeWindow, value: A)
