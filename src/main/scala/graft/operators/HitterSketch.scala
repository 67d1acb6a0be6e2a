package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable HEAVY-HITTER summary lifecycle — the frequency member of
  * the sketch family, completing the persisted-model trio next to
  * [[DistinctSketch]] (cardinality, q133) and [[QuantileSketch]]
  * (ranks, q262): build per-group top-`cap` summaries once, persist
  * them bucketed, absorb each batch by MERGING SUMMARIES ONLY — "top
  * domains per language, updated hourly" never re-reads the history.
  *
  * ## The structure (and why not streaming SpaceSaving)
  * The in-stream SpaceSaving aggregate (`graft_topk`, q38) is the
  * single-pass operator; its counter state depends on arrival order,
  * so a persisted merge lifecycle built on it would inherit
  * order-dependent state (the KLL problem — see [[QuantileSketch]]'s
  * why-not note). The summary here is BATCH-CANONICAL: per group the
  * EXACT counts of the top `cap` keys by (count desc, key asc), plus
  * `thr` = the largest dropped count (0 when nothing dropped) — a
  * deterministic function of the input multiset. Rows carry a
  * [lo, up] count bracket; a build has lo = up (counts exact).
  *
  * ## Merge semantics (documented bounds, spec-pinned)
  * For a key in either summary: `lo = lo_a + lo_b` (missing side
  * contributes 0 — it had at most thr there) and
  * `up = (up_a | thr_a) + (up_b | thr_b)`; the merged `thr` is
  * `max(thr_a + thr_b, max cnt_up among rows the keep-cap step
  * dropped)` — the second term is required because a kept row can be
  * evicted by the cap with cnt_up > thr_a + thr_b, and the invariant
  * "any key absent from the summary has true count ≤ thr" must
  * survive CHAINED merges (a later merge re-introducing that key
  * bounds its absent-side mass by thr). True counts always sit in
  * [lo, up] (induction over merges — spec'd against exact recounts,
  * including a chained-merge approximate-regime case), and in the
  * EXACT regime (cap ≥ per-group distinct on every input, thr = 0,
  * nothing dropped) merge ≡ rebuild with exact counts — which is what
  * the gate query runs, hash-checked against the exact SQL top-k (the
  * q38 capacity≥distinct doctrine). Keep rule after a merge: top
  * `cap` by (up desc, lo desc, key asc) — deterministic.
  *
  * ## Scale shape (100 TB)
  * Build: ONE partial-aggregable exchange to (group, key) counts, a
  * group-partitioned top-cap window (never data-sized — the rank frame
  * is the per-group distinct-key universe), one per-group dropped-max.
  * Merge: a full-outer join of two ≤ cap-row-per-group summary tables
  * (bucketed persist co-locates it) + the same window — no base
  * re-scan. */
object HitterSketch {

  /** Per-group top-`cap` summary `(groupCol, key, cnt_lo, cnt_up, thr)`
    * with EXACT counts (lo = up) and `thr` = largest dropped count. */
  def groupHitters(df: DataFrame, groupCol: String, keyCol: String,
                   cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val counts = df
      .where(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(groupCol), col(keyCol).as("key"))
      .agg(count(lit(1)).as("_c"))
    val ranked = counts.withColumn("_rn", row_number().over(
      Window.partitionBy(col(groupCol))
        .orderBy(col("_c").desc, col("key"))))
    val thr = ranked.groupBy(col(groupCol))
      .agg(coalesce(max(when(col("_rn") > cap, col("_c"))), lit(0L)).as("thr"))
    ranked.where(col("_rn") <= cap)
      .join(thr, Seq(groupCol))
      .select(col(groupCol), col("key"), col("_c").as("cnt_lo"),
        col("_c").as("cnt_up"), col("thr"))
  }

  /** Merge two summary tables (either builds or prior merges): count
    * brackets add with the absent side bounded by its threshold; keep
    * the top `cap` by (up desc, lo desc, key asc); thr' =
    * max(thr_a + thr_b, max cnt_up of the rows the cap dropped) so the
    * absent-key bound survives chained merges. */
  def mergeHitters(a: DataFrame, b: DataFrame, groupCol: String,
                   cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    def side(df: DataFrame, tag: String): (DataFrame, DataFrame) = (
      df.select(col(groupCol), col("key"), col("cnt_lo").as(s"_lo$tag"),
        col("cnt_up").as(s"_up$tag")),
      df.select(col(groupCol), col("thr").as(s"_thr$tag")).distinct())
    val (ra, ta) = side(a, "A")
    val (rb, tb) = side(b, "B")
    val grpThr = ta.join(tb, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        coalesce(col("_thrA"), lit(0L)).as("_thrA"),
        coalesce(col("_thrB"), lit(0L)).as("_thrB"))
    val merged = ra.join(rb, Seq(groupCol, "key"), "full_outer")
      .join(grpThr, Seq(groupCol))
      .select(col(groupCol), col("key"),
        (coalesce(col("_loA"), lit(0L)) + coalesce(col("_loB"), lit(0L)))
          .as("cnt_lo"),
        (coalesce(col("_upA"), col("_thrA")) +
          coalesce(col("_upB"), col("_thrB"))).as("cnt_up"),
        (col("_thrA") + col("_thrB")).as("thr"))
    val ranked = merged.withColumn("_rn", row_number().over(
      Window.partitionBy(col(groupCol))
        .orderBy(col("cnt_up").desc, col("cnt_lo").desc, col("key"))))
    // the (cap+1)-st cnt_up per group: a dropped key may carry mass up
    // to its cnt_up, so the absent-key threshold must cover it
    val dropUp = ranked.groupBy(col(groupCol))
      .agg(coalesce(max(when(col("_rn") > cap, col("cnt_up"))), lit(0L))
        .as("_dropUp"))
    ranked.where(col("_rn") <= cap)
      .join(dropUp, Seq(groupCol))
      .select(col(groupCol), col("key"), col("cnt_lo"), col("cnt_up"),
        greatest(col("thr"), col("_dropUp")).as("thr"))
  }

  /** Top-k read: `(groupCol, rank, key, cnt_lo, cnt_up)` by
    * (lo desc, key asc) — in the exact regime (thr = 0) this IS the
    * exact per-group top-k. */
  def topK(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    sketch.withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("cnt_lo").desc, col("key"))))
      .where(col("rank") <= k)
      .select(col(groupCol), col("rank").cast("long").as("rank"),
        col("key"), col("cnt_lo"), col("cnt_up"))
  }
}
