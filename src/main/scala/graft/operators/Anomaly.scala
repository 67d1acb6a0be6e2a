package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingestion-rate anomaly detection — the data-quality monitor an
  * always-on pipeline runs next to its dedup/decontamination stages: per
  * entity (user, source, crawler), bucket events into hours and flag
  * buckets whose count exceeds the trailing-window mean by `sigmas`
  * standard deviations (the classical z-score control chart).
  *
  * ## Exactness
  * Buckets and the trailing sums are exact BIGINTs (`unix_micros DIV
  * 3600e6`; `Σcnt`, `Σcnt²` over an integer RANGE frame — gaps in the
  * series are handled by value-range, not row-offset, framing). The mean
  * and the variance numerator are then fixed sequences of IEEE double
  * operations over those exact integers, and IEEE-754 `sqrt` is
  * correctly rounded on every engine — so even the flagged booleans
  * hash-match a DuckDB oracle running the same expressions. The variance
  * is clamped at 0 before the sqrt (a ~0 variance can round a hair
  * negative; both engines clamp identically).
  *
  * ## Scale shape (100 TB)
  * One partial-aggregable (entity, hour) count, then ONE window
  * partitioned by entity — per-partition state is an entity's hour
  * series (calendar-bounded: ~9k rows/year), never the corpus; no
  * global frames, no self-joins. Flag emission is a narrow projection.
  */
object Anomaly {

  /** Scores every (entity, hour) bucket: `(keyCol, hour, cnt, n_prior,
    * mu, sigma, is_anomaly)`. `hour` is epoch-hours; `n_prior` counts the
    * non-empty buckets inside the trailing `window`-hour range;
    * `mu`/`sigma` are NULL (and the flag false) until `minPrior` prior
    * buckets exist — a cold entity cannot alarm. */
  def hourlyRateAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                          sigmas: Double = 3.0, window: Int = 24,
                          minPrior: Int = 6): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minPrior >= 1, s"minPrior must be >= 1, got $minPrior")
    require(sigmas > 0, s"sigmas must be positive, got $sigmas")
    val counts = events
      .groupBy(col(keyCol),
        expr(s"unix_micros($tsCol) DIV 3600000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rangeBetween(-window.toLong, -1L)
    val scored = counts
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("_s", sum(col("cnt")).over(w))
      .withColumn("_ss", sum(col("cnt") * col("cnt")).over(w))
    val mu = col("_s").cast("double") / col("n_prior")
    val variance = (col("_ss") - col("_s").cast("double") * col("_s") / col("n_prior")) /
      col("n_prior")
    val sigma = sqrt(greatest(variance, lit(0.0)))
    scored
      .withColumn("mu", when(col("n_prior") >= minPrior, mu))
      .withColumn("sigma", when(col("n_prior") >= minPrior, sigma))
      .withColumn("is_anomaly", coalesce(
        col("cnt") > col("mu") + lit(sigmas) * col("sigma"), lit(false)))
      .select(col(keyCol), col("hour"), col("cnt"), col("n_prior"),
        col("mu"), col("sigma"), col("is_anomaly"))
  }
}
