package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable QUANTILE sketch lifecycle — the rank member of the sketch
  * family (HLL cardinality [[DistinctSketch]] / count-min frequency /
  * Bloom membership), on the same persisted-model contract: build
  * per-group sketches once, persist them bucketed on the group, absorb a
  * batch by MERGING SKETCHES ONLY — the 100 TB percentile-monitoring
  * shape ("p99 latency per surface, updated hourly" cannot re-read the
  * history).
  *
  * ## Why not KLL proper
  * KLL (Karnin–Lang–Liberty 2016) gives rank error ε·n in O(1/ε) space,
  * but its compaction keeps odd-or-even survivors by a coin flip, so a
  * merged sketch is NOT a deterministic function of the input multiset —
  * merge ≡ rebuild holds only in distribution, never bitwise, and this
  * engine's doctrine is exact-integer state with bit-replayable
  * lifecycles (the q133 HLL caveat, made worse). The structure here is
  * the DYADIC ADAPTIVE-RESOLUTION HISTOGRAM (the q-digest family,
  * Shrivastava et al. 2004, collapsed to one uniform level): per group,
  * exact counts of `value >> k` at the SMALLEST level k whose distinct
  * bucket count fits the cap. That state IS a deterministic function of
  * the multiset — `distinct_k(A ∪ B) ≥ max(distinct_k(A), distinct_k(B))`
  * means the union's feasible level can never undercut a part's level, so
  * merging at `max(k_a, k_b)` and re-coarsening lands on EXACTLY the
  * level a from-scratch rebuild picks, with counts that are plain sums:
  * merge ≡ rebuild BITWISE, any order, any grouping (spec'd both ways).
  *
  * ## Error bound (documented, spec-pinned)
  * Counts are exact, so the sketch CDF is EXACT at every dyadic bucket
  * boundary. A quantile query returns the bucket containing the true
  * p-quantile: the true value lies in `[q_lo, q_hi] = [b·2^k,
  * (b+1)·2^k − 1]` ALWAYS (value error < 2^k), and the rank of any point
  * inside the returned bucket differs from the target rank by less than
  * that single bucket's count. When the value universe itself has ≤ cap
  * distinct values (micro-quantized scores, cents), k = 0 and quantiles
  * are EXACT — the spec asserts both regimes against exact order
  * statistics. Unlike KLL's distribution-free ε·n rank bound, the bound
  * here is a value-resolution bound — the right trade for this engine's
  * pre-quantized integer universes.
  *
  * ## Scale shape (100 TB)
  * Build: one partial-aggregable exchange to the exact (group, value)
  * histogram — the established cell-histogram scheme (value universes
  * are quantized by contract); level selection explodes the HISTOGRAM
  * (never the data) over the 64 candidate levels and picks per group the
  * smallest feasible one. Merge: a union of two ≤ cap-row-per-group
  * sketch tables + one partial-aggregable re-count — no base re-scan.
  * Query: a cumulative window over ≤ cap rows per group (bucket-spine
  * sized, never data-sized). */
object QuantileSketch {

  private val MaxLevel = 63

  /** Smallest per-group level k (≥ the per-group `floorCol`) whose
    * distinct dyadic bucket count fits `cap`, computed by exploding the
    * (group, bucket) frame over candidate levels — `rows` must already
    * be bucket/value counts `(groupCol, _b, _c)` at level `floorCol`. */
  private def coarsenToCap(rows: DataFrame, groupCol: String,
                           cap: Int): DataFrame = {
    val lvl = rows
      .select(col(groupCol), col("_k0"), col("_b"),
        explode(expr(s"sequence(_k0, $MaxLevel)")).as("_k"))
      .select(col(groupCol), col("_k"),
        expr("shiftright(_b, cast(_k - _k0 AS INT))").as("_bk"))
      .distinct()
      .groupBy(col(groupCol), col("_k")).agg(count(lit(1)).as("_d"))
      .where(col("_d") <= cap)
      .groupBy(col(groupCol)).agg(min(col("_k")).as("_k"))
    rows.join(lvl, Seq(groupCol))
      .groupBy(col(groupCol), col("_k"),
        expr("shiftright(_b, cast(_k - _k0 AS INT))").as("_b2"))
      .agg(sum(col("_c")).as("_c"))
      .select(col(groupCol), col("_k").as("k"), col("_b2").as("bucket"),
        col("_c").as("cnt"))
  }

  /** Per-group sketches `(groupCol, k, bucket, cnt)`: exact counts of
    * `value >> k` at the smallest k with ≤ cap distinct buckets (k is
    * uniform within a group). NULL values/groups drop. */
  def groupSketches(df: DataFrame, groupCol: String, valueCol: Column,
                    cap: Int = 4096): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val hist = df
      .where(valueCol.isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol), valueCol.cast("long").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_k0", lit(0))
    coarsenToCap(hist, groupCol, cap)
  }

  /** Merge two sketch tables: align each group to the coarser of its two
    * levels, sum counts, re-coarsen to the cap. BITWISE equal to
    * rebuilding from the union, in either argument order. Groups present
    * on one side only pass through (re-coarsened, a no-op). */
  def mergeSketches(a: DataFrame, b: DataFrame, groupCol: String,
                    cap: Int = 4096): DataFrame = {
    val u = a.select(col(groupCol), col("k"), col("bucket"), col("cnt"))
      .unionByName(b.select(col(groupCol), col("k"), col("bucket"), col("cnt")))
    val kmax = u.groupBy(col(groupCol)).agg(max(col("k")).as("_k0"))
    val aligned = u.join(kmax, Seq(groupCol))
      .groupBy(col(groupCol), col("_k0"),
        expr("shiftright(bucket, cast(_k0 - k AS INT))").as("_b"))
      .agg(sum(col("cnt")).as("_c"))
    coarsenToCap(aligned, groupCol, cap)
  }

  /** Quantile read: for each percentile p, the dyadic bucket holding the
    * ⌈p·n/100⌉-th smallest value — `(groupCol, pct, q_lo, q_hi, n, k)`;
    * the true p-quantile is ALWAYS inside [q_lo, q_hi], and q_lo = q_hi
    * ( = the exact quantile) when k = 0. */
  def quantiles(sketch: DataFrame, groupCol: String,
                percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got $percents")
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val cum = sketch
      .withColumn("_cum", sum(col("cnt")).over(wCum))
      .withColumn("_n", sum(col("cnt")).over(wAll))
    cum
      .select(col(groupCol), col("k"), col("bucket"), col("cnt"),
        col("_cum"), col("_n"),
        explode(typedLit(percents)).as("pct"))
      // target rank ⌈p·n/100⌉, all-integer; first bucket whose running
      // count reaches it wins (min over qualifying buckets)
      .where(col("_cum") * 100 >= col("pct") * col("_n") &&
        (col("_cum") - col("cnt")) * 100 < col("pct") * col("_n"))
      .select(col(groupCol), col("pct"),
        expr("shiftleft(bucket, cast(k AS INT))").as("q_lo"),
        expr("shiftleft(bucket + 1, cast(k AS INT)) - 1").as("q_hi"),
        col("_n").as("n"), col("k"))
  }
}
