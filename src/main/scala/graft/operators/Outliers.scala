package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group outlier handling for training-data pipelines.
  *
  * Length/score distributions in crawled corpora are heavy-tailed; standard
  * practice clips (winsorizes) per-domain rather than globally, because a
  * "normal" length for code is an outlier for chat. */
object Outliers {

  /** Winsorize `valueCol` within each `groupCol` group: values below the
    * `lo` quantile clamp up to it, above the `hi` quantile clamp down.
    * Returns the input plus `v_lo`, `v_hi`, and `<valueCol>_clipped`.
    *
    * Quantiles use exact `percentile` (linear interpolation — the
    * DuckDB-`quantile_cont`-parity baseline proven by q46); at 100 TB swap
    * `exact = false` for `approx_percentile`, which is bounded-memory and
    * mergeable at any group size (the q52 pattern — results then carry the
    * GK rank-error bound instead of being oracle-exact).
    *
    * Scale shape: ONE pass computes the per-group quantile table
    * (#groups × 2 doubles — partial-agg'd for approx; exact buffers
    * per-group values, which is why it is the baseline not the production
    * path), broadcast back onto the fact scan: the data path itself never
    * shuffles. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double, hi: Double, exact: Boolean = true,
                accuracy: Int = 10000): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo < hi, s"need 0 <= lo < hi <= 1, got ($lo, $hi)")
    // Column-based (not string-interpolated expr) so names needing backticks
    // (dots, spaces) work like every other operator in this package.
    val pcts = array(lit(lo), lit(hi))
    val qagg =
      if (exact) percentile(col(valueCol), pcts)
      else percentile_approx(col(valueCol), pcts, lit(accuracy))
    val bounds = df.groupBy(col(groupCol))
      .agg(qagg.as("_q"))
      .select(col(groupCol).as("_g"),
        element_at(col("_q"), 1).cast("double").as("v_lo"),
        element_at(col("_q"), 2).cast("double").as("v_hi"))
    // Null-safe equality so rows whose group is NULL keep the contract
    // ("returns the input plus ..."): they clip against the NULL-group
    // bounds instead of being silently dropped by an equi-join.
    df.join(broadcast(bounds), col(groupCol) <=> col("_g"), "left")
      .drop("_g")
      .withColumn(s"${valueCol}_clipped",
        least(greatest(col(valueCol).cast("double"), col("v_lo")), col("v_hi")))
  }

  /** Per-group ROBUST outlier scoring: the Iglewicz–Hoaglin modified
    * z-score `0.6745 · (x − median) / MAD` with `MAD = median(|x −
    * median|)` — the heavy-tail-safe complement of [[winsorize]] and of
    * moment-based z-scores (one 10⁹-char document shifts a mean/stddev
    * gate and masks its neighbors; it cannot move the median of a large
    * group). Adds `v_med`, `v_mad`, `score`, `is_outlier` (|score| >
    * `sigmas`). Degenerate groups (MAD = 0: ≥ half the group identical)
    * get a NULL score and never flag — a zero-spread group has no robust
    * scale to judge against; use a value-range [[Checks]] assertion
    * there.
    *
    * Exactness: medians are exact interpolated `percentile` (the
    * DuckDB-`quantile_cont` parity baseline q46 proves), the score is a
    * fixed IEEE sequence over them, so even the flag booleans
    * hash-match. `exact = false` swaps both median passes for
    * bounded-memory mergeable `approx_percentile` — the 100 TB path,
    * with the q52 rank-error contract.
    *
    * Scale shape: two aggregation passes over the fact (median, then MAD
    * of deviations — an irreducible data dependency), each producing a
    * #groups-row model table that broadcasts back; the data path never
    * shuffles. Null groups keep [[winsorize]]'s null-safe-join
    * contract. */
  def robustZScore(df: DataFrame, groupCol: String, valueCol: String,
                   sigmas: Double = 3.5, exact: Boolean = true,
                   accuracy: Int = 10000): DataFrame = {
    require(sigmas > 0, s"sigmas must be positive, got $sigmas")
    Seq("v_med", "v_mad", "score", "is_outlier", "_g", "_dev").foreach(r =>
      require(!df.columns.contains(r), s"input must not already contain column $r"))
    def med(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(accuracy)).cast("double")
    val medians = df.groupBy(col(groupCol))
      .agg(med(col(valueCol)).as("v_med"))
      .withColumnRenamed(groupCol, "_g")
    val withDev = df
      .join(broadcast(medians), col(groupCol) <=> col("_g"), "left").drop("_g")
      .withColumn("_dev", abs(col(valueCol).cast("double") - col("v_med")))
    val mads = withDev.groupBy(col(groupCol))
      .agg(med(col("_dev")).as("v_mad"))
      .withColumnRenamed(groupCol, "_g")
    withDev
      .join(broadcast(mads), col(groupCol) <=> col("_g"), "left").drop("_g")
      .withColumn("score",
        when(col("v_mad") === 0.0, lit(null).cast("double"))
          .otherwise(lit(0.6745) * (col(valueCol).cast("double") - col("v_med"))
            / col("v_mad")))
      .withColumn("is_outlier", coalesce(abs(col("score")) > lit(sigmas), lit(false)))
      .drop("_dev")
  }
}
