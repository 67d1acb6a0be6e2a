package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KAPLAN-MEIER survival estimation (product-limit, 1958) — "how long
  * until a signup converts / a crawl URL goes stale / a shard fails",
  * with right-CENSORING handled correctly (users still unconverted at
  * observation end inform the risk set without faking an event — the
  * mistake a naive mean-time-to-X query always makes).
  *
  * ## Determinism / exactness
  * The KM estimator is a PRODUCT `S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)`, so
  * the micro-quantization doctrine moves to log space: each event day
  * contributes `term = round(ln((n−d)/n)·10⁶)` computed ONCE per
  * distinct day (the [[Colloc]] site — day-universe-sized), and
  * `ln S` is the exact BIGINT running sum of terms. No float product
  * ever accumulates; `exp` is deliberately NOT taken (libm exp drift
  * across engines — consumers exponentiate at the edge if they want
  * the probability).
  *
  * ## Scale shape (100 TB)
  * Per-subject terminations collapse to the (day, d, total) histogram
  * in one partial-aggregable pass; the risk set is `N − cum_before`
  * over that histogram, and the only windows ride the DAY-UNIVERSE
  * table — bounded by the study length in days (model-sized by
  * nature), never by subjects. Days where the whole risk set
  * terminates (n = d, survival exactly 0) end the curve — emission
  * stops there, documented. Returns
  * `(day, n_risk, d_events, term_micro, ln_s_micro)` for event days,
  * day ascending. */
object Survival {

  /** KM curve over `(durationCol: days, eventCol: true = event,
    * false = censored)` subject rows. */
  def kaplanMeier(df: DataFrame, durationCol: Column, eventCol: Column): DataFrame = {
    val base = df.select(durationCol.cast("long").as("_t"),
      eventCol.as("_e"))
    val hist = base.groupBy(col("_t"))
      .agg(sum(when(col("_e"), 1L).otherwise(0L)).as("_d"),
        count(lit(1)).as("_tot"))
      .localCheckpoint() // day-universe-sized; fans into N and the curve
    val n = hist.agg(sum(col("_tot")).as("_n"))
    val wBefore = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .crossJoin(broadcast(n))
      .withColumn("n_risk", col("_n") - coalesce(sum(col("_tot")).over(wBefore), lit(0L)))
      .where(col("_d") > 0L && col("n_risk") > col("_d"))
      // fixed shape: ln((n-d)/n) quantized once per event day
      .withColumn("term_micro",
        round(log((col("n_risk") - col("_d")).cast("double") /
          col("n_risk").cast("double")) * lit(1e6)).cast("long"))
      .withColumn("ln_s_micro", sum(col("term_micro")).over(wCum))
      .select(col("_t").as("day"), col("n_risk"), col("_d").as("d_events"),
        col("term_micro"), col("ln_s_micro"))
  }
}
