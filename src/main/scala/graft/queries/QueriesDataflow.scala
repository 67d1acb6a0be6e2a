package graft

import graft.expr.Expr
import graft.functions.{Text, Vectors}
import graft.operators.{Accumulate, AsOf, Dedup, Sessionize, Similarity}
import graft.sources.Tables
import graft.stream.DataStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataflow gate queries, split out of [[SparkEntry]] (round-10
  * hygiene); the `queries`/`oracleSql` maps in SparkEntry remain the
  * single registry — this trait only hosts the builders verbatim. */
private[graft] trait QueriesDataflow { this: SparkEntry.type =>

  /** The reference's canonical word count (WordCountSpec.scala:9-17 shape)
    * over `documents`, through the reified-expression facade:
    * mapConcat (explode) → filter → groupBy → fold. The reducer
    * `key &&& values.length` is rewritten to a native partial-agg count —
    * no group materialization (SURVEY §4.2). */
  protected def q13(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val docs = DataStream.fromDF[String](
      Tables.documents(s, dir).select(lower(col("text")).as("value")))
    val counts = docs
      .mapConcat(t => t.split("\\s+"))
      .filter(w => !(w === ""))
      .groupBy(w => w)
      .fold(g => Expr.KeyValue(g.key, g.values.length))
    counts.toDF
      .select(col("value.key").as("word"), col("value.value").as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(100)
  }


  /** Tumbling event-time window count via the facade's foldWindow
    * (SURVEY §2.1 #10): assignTimestamps → groupBy → foldWindow, with the
    * `acc + 1` fold rewritten to a native count. */
  protected def q14(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val ev = DataStream.fromDF[(Long, String)](
      Tables.events(s, dir).select(unix_millis(col("ts")).as("_1"), col("event_type").as("_2")))
    val counted = ev
      .assignTimestamps(t => t._1)
      .groupBy(t => t.value._2)
      .foldWindow(graft.windows.WindowAssigner.Tumbling(3600000L), 0L)(t => t._1 + 1L)
    counted.toDF.select(
        col("value.key").as("event_type"),
        col("value.value.window.start").as("ws_ms"),
        col("value.value.value").as("n"))
      .orderBy(col("event_type"), col("ws_ms"))
  }


  /** STREAMING-PATH evidence at the batch gate: q14's tumbling
    * foldWindow run through the ACTUAL Structured Streaming machinery —
    * events replayed through a MemoryStream in one micro-batch and
    * flushed by a far-future sentinel (append mode emits exactly the
    * closed windows, the reference's emit-on-watermark) — then gated
    * against the SAME oracle SQL as q14. Hash equality here means the
    * streaming twins' shared path (assignTimestamps watermark, window
    * state, append-on-watermark emission) produces the batch answer,
    * giving the streaming side a CORRECTNESS row instead of riding on
    * specs alone. The one-batch replay is deliberate: late-drop
    * semantics are spec territory (StreamingSpec pins them); the gate
    * pins no-late-data ≡ batch. The replay rides the
    * [[graft.streaming.Replay]] seam and takes the deterministic
    * FIXED-COUNT slice `event_id < 1000` (mirrored in the oracle):
    * event ids are dense from 0, so the driver-side row set is a
    * CONSTANT at any corpus scale — the evidence is the MACHINERY's
    * bit-parity, which 1000 events prove as fully as all of them. */
  protected def q267(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    import s.implicits._
    val evRows = Tables.events(s, dir)
      .where(col("event_id") < 1000)
      .select(unix_millis(col("ts")).as("_1"), col("event_type").as("_2"))
      .as[(Long, String)].collect().toSeq
    // sentinel a month past the data: advances the watermark so every
    // real window closes and emits; its own window stays open -> no row.
    // maxOption: an empty replay slice must yield the oracle's empty
    // result, not an empty.max crash
    val flush = Seq((evRows.map(_._1).maxOption.getOrElse(0L)
      + 30L * 86400000L, "zzz_flush"))
    graft.streaming.Replay.appendOnce(s, evRows, flush) { in =>
      DataStream.fromDF[(Long, String)](in)
        .assignTimestamps(t => t._1)
        .groupBy(t => t.value._2)
        .foldWindow(graft.windows.WindowAssigner.Tumbling(3600000L), 0L)(t => t._1 + 1L)
        .toDF.select(
          col("value.key").as("event_type"),
          col("value.value.window.start").as("ws_ms"),
          col("value.value.value").as("n"))
    }.orderBy(col("event_type"), col("ws_ms"))
  }


  /** Sliding windows (2h size / 1h step) — each event counted in both
    * covering windows; the reference's sliding assigner drops windows
    * (its firstStart bug, SURVEY §2.3); Spark's window() is correct. */
  protected def q15(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val ev = DataStream.fromDF[(Long, String)](
      Tables.events(s, dir).select(unix_millis(col("ts")).as("_1"), col("event_type").as("_2")))
    val counted = ev
      .assignTimestamps(t => t._1)
      .groupBy(t => t.value._2)
      .foldWindow(graft.windows.WindowAssigner.Sliding(7200000L, 3600000L), 0L)(t => t._1 + 1L)
    counted.toDF.select(
        col("value.key").as("event_type"),
        col("value.value.window.start").as("ws_ms"),
        col("value.value.value").as("n"))
      .orderBy(col("event_type"), col("ws_ms"))
  }


  /** Session windows (30 min gap) per user — batch sessionization
    * (the operator the reference declared but never implemented,
    * reference Window.scala:23-26). Output at epoch-ms granularity. */
  protected def q16(s: SparkSession, dir: String): DataFrame =
    Sessionize.summarize(Tables.events(s, dir), "user_id", "ts", 1800000L)
      .select(col("user_id"),
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_ms"))


  /** The genuinely-sequential global scan (reference MapAccumulate,
    * SURVEY §2.1 #5): a global running sum through the interpreted
    * single-partition path — the documented scalability cliff; the scalable
    * per-key form is q10. */
  protected def q29(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val sorted = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), cents(col("value")).as("vc"))
      .repartition(1)
      .sortWithinPartitions(col("ts").asc, col("event_id").asc)
      .select(col("event_id").as("_1"), col("vc").as("_2"))
    val ds = DataStream.fromDF[(Long, Long)](sorted)
    val scanned = ds.mapAccumulate[Long, (Long, Long)](0L) { t =>
      val ns = t._1 + t._2._2
      ns &&& (t._2._1 &&& ns)
    }
    scanned.toDF
      .select(col("value._1").as("event_id"), col("value._2").as("running_c"))
      .orderBy(col("event_id"))
  }


  /** The keyed mapAccumulate through the facade, auto-rewritten: the
    * running-sum accumulate shape compiles to a per-key window frame (ONE
    * exchange on user_id, codegen'd unbounded-preceding sum — `Window` in
    * the plan, no `coalesce(1)`), hash-checked against the same oracle as
    * the hand-written window form (q10). The facade's global q29 remains the
    * documented sequential cliff; this is its scale path. */
  protected def q41(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val ev = Tables.events(s, dir).select(
      col("event_id").as("_1"), col("user_id").as("_2"),
      unix_millis(col("ts")).as("_3"), cents(col("value")).as("_4"))
    val ds = DataStream.fromDF[(Long, Long, Long, Long)](ev)
    val scanned = ds.mapAccumulateByKey(0L)(t => t._2, t => t._3 &&& t._1) { t =>
      val ns = t._1 + t._2._4
      ns &&& (t._2._1 &&& (t._2._2 &&& ns))
    }
    scanned.toDF.select(
        col("value._1").as("event_id"),
        col("value._2._1").as("user_id"),
        col("value._2._2").as("running_c"))
      .orderBy(col("event_id"))
  }

  // ---- training-data pipeline operators ----


  /** The last two SURVEY §2.1 rows without their own gate: `fromLiterals`
    * (reference DataStream.scala:87-88 — the finite in-memory source) and
    * `mapValues` (reference DataStream.scala:49,76-77 — per-element value
    * transform under a key tag), chained through groupBy → fold so the
    * whole facade path literals → grouped → mapped → native partial agg
    * is what the oracle checks (a DuckDB VALUES clause). */
  protected def q226(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    implicit val spark: SparkSession = s
    val ds = DataStream.fromLiterals(
      ("a", 3L), ("b", 1L), ("a", 4L), ("c", 5L),
      ("b", 9L), ("a", 2L), ("c", 6L), ("b", -7L))
    ds.groupBy(t => t._1)
      .mapValues(v => v._2 * 2L + 1L)
      .fold(g => Expr.KeyValue(g.key, g.values.sum &&& g.values.length))
      .toDF
      .select(col("value.key").as("k"),
        col("value.value._1").as("mapped_sum"),
        col("value.value._2").as("n"))
      .orderBy(col("k"))
  }


  protected def oraclesDataflow: Map[String, String] = Map(

      "q41_keyed_accumulate" ->
        s"""SELECT event_id, user_id,
           CAST(sum(${C.format("value")}) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
           FROM events ORDER BY event_id""",

      "q13_wordcount" ->
        """SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
             SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word FROM documents) t
           WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 100""",

      "q14_tumbling_agg" ->
        """SELECT event_type, CAST(floor(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS ws_ms,
           CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2 ORDER BY event_type, ws_ms""",

      // the STREAMING twin is gated against the IDENTICAL batch-window
      // oracle over the same deterministic FIXED-COUNT replay slice
      // (event ids dense from 0 ⇒ O(1) rows at any scale):
      // replay-through-MemoryStream + watermark flush must equal batch
      "q267_streaming_evidence" ->
        """SELECT event_type, CAST(floor(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS ws_ms,
           CAST(count(*) AS BIGINT) AS n
           FROM events WHERE event_id < 1000
           GROUP BY 1, 2 ORDER BY event_type, ws_ms""",

      "q15_sliding_agg" ->
        """SELECT event_type, ws_ms, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT event_type,
               unnest([CAST(floor(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT),
                       CAST(floor(epoch_ms(ts) / 3600000) * 3600000 - 3600000 AS BIGINT)]) AS ws_ms
             FROM events) t
           GROUP BY 1, 2 ORDER BY event_type, ws_ms""",

      "q16_session_agg" ->
        """WITH flagged AS (
             SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000 THEN 1 ELSE 0 END AS ns
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
           sessions AS (
             SELECT user_id, ts,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM flagged)
           SELECT user_id, CAST(min(epoch_ms(ts)) AS BIGINT) AS start_ms,
             CAST(max(epoch_ms(ts)) AS BIGINT) AS end_ms, count(*) AS n_events
           FROM sessions GROUP BY user_id, sid ORDER BY user_id, start_ms""",

      "q29_map_accumulate" ->
        s"""SELECT event_id,
           CAST(sum(${C.format("value")}) OVER (
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
           FROM events ORDER BY event_id""",

      // fromLiterals + mapValues: the VALUES clause IS the literal source,
      // the mapped expression (2v + 1) sits under the per-key aggregates
      "q226_literals_mapvalues" ->
        """SELECT k, CAST(sum(2 * v + 1) AS BIGINT) AS mapped_sum,
             CAST(count(*) AS BIGINT) AS n
           FROM (VALUES ('a', 3), ('b', 1), ('a', 4), ('c', 5),
                        ('b', 9), ('a', 2), ('c', 6), ('b', -7)) AS t(k, v)
           GROUP BY k ORDER BY k""",
  )
}
