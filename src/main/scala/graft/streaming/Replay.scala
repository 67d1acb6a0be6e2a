package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
// PINNED INTERNAL API — the one non-public Spark surface the engine
// touches. Spark moved MemoryStream's package across majors
// (org.apache.spark.sql.execution.streaming through the 3.x/4.0 line →
// ...execution.streaming.runtime in the 4.1 line this repo builds
// against: /opt/spark/jars, 4.1.2). It is used ONLY by gate/spec
// replay, never by a production operator — an upgrade that moves it
// again fails to compile exactly HERE, with this note explaining why,
// instead of silently breaking scattered gate queries.
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Gate/spec-only streaming REPLAY seam: drive a bounded row set
  * through the ACTUAL Structured Streaming machinery (micro-batch
  * execution, state store, event-time watermark, append-mode emission)
  * and hand back the memory sink's contents as a DataFrame.
  *
  * This exists so streaming twins get CORRECTNESS rows at the batch
  * gate (q267 foldWindow, q273 stateful cardinality) — the replay is
  * gate plumbing, not an operator shape: production ingestion is a
  * real source, and the windowed/keyed state is the same either way.
  * Callers keep the driver-side row set O(1) in corpus size (a
  * fixed-COUNT slice like `event_id < 1000`, mirrored in the oracle),
  * so the replay cost is a constant at any scale. */
object Replay {

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Replay `rows` in one micro-batch through `pipeline`, then `flush`
    * (e.g. a far-future sentinel that advances the watermark / closes
    * the last step) in a second batch; returns the append-mode memory
    * sink table. The sink view stays registered — the returned frame
    * reads it lazily (Verify writes it after this returns). */
  def appendOnce[A: Encoder](spark: SparkSession, rows: Seq[A],
                             flush: Seq[A])
                            (pipeline: DataFrame => DataFrame): DataFrame = {
    // Clone the session for the replay: stateful operators allocate one
    // state-store instance per shuffle partition PER MICRO-BATCH, and the
    // session's partition count is sized for the corpus — while the
    // replay row set is O(1) by contract (fixed-count slices). 32-way
    // state stores for a 1000-row replay measured as the bulk of the
    // replay queries' seconds (r13); 4 is plenty for a bounded slice at
    // ANY corpus scale, and the clone keeps the caller's session conf
    // untouched (Verify runs gate queries concurrently in one session).
    val rs = spark.newSession()
    rs.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = rs.sqlContext
    val input = MemoryStream[A]
    // unique per call: gate queries replay concurrently under Verify's
    // thread pool, and memory-sink names are session-global
    val sink = "graft_replay_p" + ProcessHandle.current().pid() +
      "_" + seq.incrementAndGet()
    val q = pipeline(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName(sink).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      if (flush.nonEmpty) {
        input.addData(flush: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // the sink's temp view lives in the CLONED session's catalog; the
    // returned frame reads it from there (same SparkContext, so callers
    // compose it with parent-session frames freely)
    rs.table(sink)
  }
}
