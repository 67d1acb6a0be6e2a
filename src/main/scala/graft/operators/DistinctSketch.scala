package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate distinct-count LIFECYCLE — the HLL member of the sketch
  * family (HLL cardinality / SpaceSaving top-k / GK ranks / Bloom
  * membership / count-min frequency), with the same persisted-model
  * contract as the exact df-stats lifecycles (q66/q119/q123): build
  * per-group sketches once, persist them bucketed on the group, absorb
  * a batch by MERGING SKETCHES ONLY — the base corpus is never
  * re-scanned, which is the entire point at 100 TB ("distinct users
  * per surface, updated hourly" cannot re-read the history).
  *
  * Sketches are Spark's built-in Apache DataSketches HLL
  * (`hll_sketch_agg` — partial-aggregable, a group's sketch is
  * `4/6/8·2^lgK` bits regardless of cardinality). HLL registers merge
  * by element-wise MAX, so union is commutative, associative, and
  * idempotent in principle, and re-sent duplicates are absorbed for
  * free. Two honest caveats the spec pins: a stream-BUILT sketch
  * estimates through DataSketches' HIP estimator, which a union
  * cannot preserve, and the union's result REPRESENTATION (mode/type
  * promotion) depends on argument order — so an incrementally merged
  * model estimates within the configured error of a full rebuild and
  * of the opposite merge order (spec: <1% both ways at lgK 12),
  * not bitwise-equal; the registers dominate correctly either way. Estimates are approximate
  * by nature, so the gate query is rows-only by design (the q30/q52
  * pattern) with the merge and error-bound specs standing in.
  *
  * ## Scale shape (100 TB)
  * Build: one partial-aggregable exchange carrying (group, partial
  * sketch) — map-side combine compresses each task's slice to one
  * sketch per group before the shuffle. Absorb: a full-outer join on
  * the group key between two #groups-row sketch tables (bucketed
  * persist makes it co-located), `hll_union` per row — the batch's
  * scan is the only data-sized work. Estimate: a narrow projection. */
object DistinctSketch {

  /** Per-group HLL sketches: `(groupCol, sketch)`. NULL keys carry no
    * distinct mass (the aggregate skips them, matching COUNT(DISTINCT)
    * semantics); NULL groups form their own group like any groupBy. */
  def groupSketches(df: DataFrame, groupCol: String, keyCol: String,
                    lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))
  }

  /** Absorb a batch into persisted sketches: full-outer on the group —
    * groups only the batch touches merge, new groups enter with their
    * batch sketch, untouched base groups pass through verbatim. Both
    * sides must share `lgK` (DataSketches unions down-sample on
    * mismatch; keep the model homogeneous instead). */
  def updateSketches(base: DataFrame, batch: DataFrame, groupCol: String,
                     keyCol: String, lgK: Int = 12): DataFrame = {
    val b = groupSketches(batch, groupCol, keyCol, lgK)
      .withColumnRenamed("sketch", "_new")
    base.join(b, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        when(col("sketch").isNull, col("_new"))
          .when(col("_new").isNull, col("sketch"))
          .otherwise(hll_union(col("sketch"), col("_new"))).as("sketch"))
  }

  /** Cardinality estimates off a sketch table: `(groupCol,
    * n_distinct_est)` — relative standard error ≈ 1.04/√2^lgK
    * (~1.6% at the default lgK 12). */
  def estimates(stats: DataFrame, groupCol: String): DataFrame =
    stats.select(col(groupCol),
      hll_sketch_estimate(col("sketch")).as("n_distinct_est"))
}
