package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable CARDINALITY sketch with a DETERMINISTIC state — linear
  * counting (Whang et al. 1990) on the persisted-model contract: per
  * group an m-slot bitmap of `md5(key) mod m`, stored as its set-bit
  * rows. The bitmap is a pure function of the key SET — merge is
  * bit-union (`union ∘ distinct`), bitwise equal to a rebuild in any
  * order/grouping — so unlike the HLL lifecycle (q133, rows-only: the
  * HIP estimator and union representation are order-dependent) this
  * distinct-count lifecycle HASH-GATES end to end: the DuckDB oracle
  * replays the same md5 slots and the same site-quantized estimate.
  *
  * ## Estimate and error (documented, spec-pinned)
  * With b of m slots set, the maximum-likelihood distinct count is
  * `n̂ = m·ln(m/(m−b))`, quantized ONCE at its site to micro units
  * (`round(10⁶·m·ln(m/(m−b)))` — the corpusDivergence/Hoeffding-Lq log
  * scheme both engines replay). Standard error ≈ √m·(e^t − t − 1)^½/t·m
  * — in practice ≤ ~2% for load t = n/m ≤ 3 (spec measures ≤ 5% at
  * t ≈ 1.2); a SATURATED bitmap (b = m) has no estimate and returns
  * NULL with `saturated = true` — the monitoring signal to re-size m.
  * Exact when every key lands its own slot and b = n (small groups).
  *
  * ## Scale shape (100 TB)
  * Build: one partial-aggregable distinct over (group, slot) — ≤ m
  * rows per group regardless of data size. Merge: union + distinct of
  * two ≤ m-row tables (bucketed persist co-locates it) — no base
  * re-scan. Estimate: one count per group + one site-quantized ln. */
object CardinalitySketch {

  private def slot(keyCol: String, m: Int) =
    pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(m.toLong))

  /** Per-group set-slot rows `(groupCol, slot)` of the m-slot bitmap. */
  def groupBitmaps(df: DataFrame, groupCol: String, keyCol: String,
                   m: Int): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    df.where(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .select(col(groupCol), slot(keyCol, m).as("slot"))
      .distinct()
  }

  /** Bit-union merge — bitwise equal to rebuilding from the union of
    * the inputs' key sets, in any order. */
  def mergeBitmaps(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("slot"))
      .unionByName(b.select(col(groupCol), col("slot")))
      .distinct()

  /** Linear-counting estimates: `(groupCol, bits_set, est_micro,
    * saturated)`; est_micro NULL when the bitmap saturates. */
  def estimates(bitmap: DataFrame, groupCol: String, m: Int): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    bitmap.groupBy(col(groupCol))
      .agg(count(lit(1)).as("bits_set"))
      .select(col(groupCol), col("bits_set"),
        when(col("bits_set") < m,
          round(log(lit(m.toDouble) /
              (lit(m.toDouble) - col("bits_set").cast("double"))) *
            lit(m.toDouble) * lit(1e6)).cast("long")).as("est_micro"),
        (col("bits_set") >= m).as("saturated"))
  }
}
