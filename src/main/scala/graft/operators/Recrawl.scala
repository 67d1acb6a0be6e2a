package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** Re-crawl suppression — TTL-windowed content dedup for continuous
  * ingestion: a crawl pipeline sees the same content again and again
  * (re-crawls, mirrors, syndication), and "keep one copy ever" (exact
  * dedup) is the wrong contract when content freshness matters. The
  * production rule is GREEDY TTL ADMISSION per content fingerprint:
  * keep the first sighting, suppress re-sightings until `ttl` has
  * elapsed since the last KEPT one, then re-admit (refreshing the
  * clock). Between exact dedup (ttl = ∞) and no dedup (ttl = 0), this
  * is the knob crawl economics actually turn.
  *
  * ## Semantics
  * Sightings of one fingerprint are walked in `(ts, id)` order;
  * `kept(first) = true`, and `kept(x) = ts(x) − lastKeptTs ≥ ttl`
  * (a kept sighting resets the clock — suppression windows CHAIN from
  * kept sightings only, not from each other). Same-timestamp ties
  * admit the smallest id. The fold is a per-key sequential transition
  * (a window cumsum cannot express the reset), so it reuses the
  * [[Sampling.takeUntilBudget]] shape: hash-partition on the
  * fingerprint, sort within partitions, walk rows — work per
  * fingerprint is linear, fingerprints partition the corpus. For the
  * oracle the identical transition unrolls as a recursive CTE (the
  * q57/q75 pattern).
  *
  * ## Scale shape (100 TB)
  * The only wide op is the fingerprint hash exchange + per-partition
  * sort. SCALE NOTE for callers (the q75 contract): pre-project to
  * `(fp, id, ts)` metadata and join bodies back by id — a sighting
  * group is typically tiny (re-crawl counts), and a pathological
  * mega-fingerprint (an empty document crawled billions of times) is
  * exactly what [[Sampling.capPerGroup]]'s two-pass pre-thin bounds.
  * Streaming twin: [[graft.streaming.Streams.recrawlSuppressStream]]
  * keeps ONE long (lastKeptTs) per fingerprint.
  */
object Recrawl {

  /** Flags every sighting with `kept` per the TTL rule. `tsCol` must be
    * a BIGINT epoch-micros column (normalize timestamps upstream with
    * `unix_micros` — keeping the operator integer-only keeps the
    * transition engine-exact); `ttlMicros ≥ 0`. Output: the input
    * columns + `kept`; `kept` is reserved. */
  def suppress(df: DataFrame, fpCol: String, idCol: String, tsCol: String,
               ttlMicros: Long): DataFrame = {
    require(ttlMicros >= 0, s"ttlMicros must be >= 0, got $ttlMicros")
    require(!df.columns.contains("kept"),
      "suppress reserves the column name kept — rename before calling")
    // fail at plan build, not mid-task with a cast error: the walk reads
    // the timestamp as a primitive long
    require(df.schema(tsCol).dataType == LongType,
      s"$tsCol must be BIGINT epoch-micros (got ${df.schema(tsCol).dataType}); " +
        "normalize timestamps upstream with unix_micros(...)")
    val ordered = df.repartition(col(fpCol))
      .sortWithinPartitions(col(fpCol), col(tsCol), col(idCol))
    val outSchema = StructType(ordered.schema.fields :+
      StructField("kept", BooleanType, nullable = false))
    val fpIdx = ordered.schema.fieldIndex(fpCol)
    val tsIdx = ordered.schema.fieldIndex(tsCol)
    ordered.mapPartitions { rows =>
      var curFp: Any = null
      var started = false
      var lastKept = 0L
      rows.map { r =>
        val f = r.get(fpIdx)
        val fresh = !started || !java.util.Objects.equals(f, curFp)
        if (fresh) { curFp = f; started = true }
        val ts = r.getLong(tsIdx)
        val keep = fresh || ts - lastKept >= ttlMicros
        if (keep) lastKept = ts
        Row.fromSeq(r.toSeq :+ keep)
      }
    }(Encoders.row(outSchema))
  }
}
