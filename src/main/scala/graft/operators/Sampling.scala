package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent per partition split — rerunning after a
  * repartition yields a different subset. Pipelines need CONTENT-keyed
  * sampling: whether a row is in the sample depends only on its id, so the
  * sample is stable across runs, partitionings, engines, and incremental
  * loads. Implemented as an md5-prefix threshold (uniform over ids,
  * engine-portable — the DuckDB oracle computes the identical predicate),
  * evaluated as a narrow per-row filter with zero shuffle. */
object Sampling {

  /** Hex threshold on the first 8 md5 digits for the given rate. Rate 1.0
    * returns the sentinel "g": md5 prefixes use only [0-9a-f], all of which
    * sort below 'g', so `prefix < 'g'` keeps EVERY row — a clamped
    * "ffffffff" threshold with a strict `<` would silently drop the ~2⁻³²
    * of rows whose prefix is exactly ffffffff. The sentinel keeps the
    * predicate one uniform string comparison across plain and stratified
    * paths and is mirrored verbatim by the SQL oracle. */
  private[graft] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) "g"
    else f"${math.round(rate * (1L << 32)).min((1L << 32) - 1)}%08x"
  }

  /** Membership predicate: row is sampled iff md5(id)[0,8) < threshold. */
  def samplePredicate(idCol: Column, rate: Double): Column =
    substring(md5(idCol.cast("string")), 1, 8) < lit(thresholdHex(rate))

  /** Keep ~`rate` of rows, keyed by `idCol` — stable under reruns and
    * repartitioning. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.where(samplePredicate(col(idCol), rate))

  /** Deterministic train/val/test split assignment: each row lands in
    * exactly one named split, by md5 range partition on its id. Content-
    * keyed like [[deterministicSample]] — stable across runs, partitionings,
    * engines, and incremental loads, which is what makes a split SAFE for a
    * training pipeline (a seed-based split reshuffles rows between train and
    * test on every rerun — silent eval contamination). Narrow per-row
    * expression, zero shuffle.
    *
    * @param splits ordered (name, weight) list; weights must sum to 1. The
    *               LAST split takes the residual hash range, so rounding
    *               never drops a row. */
  def assignSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                  as: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplit needs at least one split")
    require(splits.forall(_._2 >= 0.0), s"negative split weight in $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    // clamp: fp prefix-sums of weights that pass the 1e-9 total check can
    // still exceed 1.0 by an ulp, which thresholdHex would reject
    val cum = splits.init.scanLeft(0.0)(_ + _._2).tail.map(c => math.min(c, 1.0))
    val h = substring(md5(col(idCol).cast("string")), 1, 8)
    val assigned = splits.init.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), upper), rest) => when(h < lit(thresholdHex(upper)), lit(name)).otherwise(rest)
    }
    df.withColumn(as, assigned)
  }

  /** Temperature-flattened domain mixing — the standard LLM data-mix
    * resampler: the target volume `targetFraction·N` is allocated across
    * domains ∝ n_d^α, so domain d is kept at rate
    * `r_d = min(1, f·N·n_d^α / (Σ_j n_j^α · n_d))`. α=1 reproduces the
    * natural mix (every rate = f); α→0 flattens toward equal per-domain
    * volume, upweighting rare domains; α=0.5 is the common sqrt mix.
    * Membership is content-keyed (the same md5 threshold as
    * [[deterministicSample]], compared as a 32-bit integer), so the
    * resample is stable across runs, partitionings, and engines.
    *
    * Scale shape: the rate table is one tiny partial-agg'd count per
    * domain plus a 1-row total, broadcast back onto the fact scan — the
    * data path is a narrow per-row predicate with ZERO extra shuffle.
    * Rate excess from capped domains (r_d clipped at 1) is NOT
    * redistributed; the realized total can undershoot f·N when α pushes a
    * rare domain past keep-everything.
    *
    * Engine-parity notes (for oracle-checked pipelines): α=0.5 and α=1
    * use `sqrt`/identity — IEEE-exact on every engine; other α go through
    * `pow`, whose last-ulp behavior is platform-specific (fine in
    * production, avoid where bit-parity is asserted). Rows with a NULL
    * domain have no defined rate and are dropped. */
  def temperatureResample(df: DataFrame, idCol: String, domainCol: String,
                          alpha: Double, targetFraction: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction must be in (0,1], got $targetFraction")
    val weight =
      if (alpha == 0.5) sqrt(col("_n").cast("double"))
      else if (alpha == 1.0) col("_n").cast("double")
      else pow(col("_n").cast("double"), lit(alpha))
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", weight)
    // corpus totals via a window over the COUNTS frame (#domains rows) —
    // a separate .agg would make Spark recompute the counts subtree and
    // scan the fact table twice. The unpartitioned window is over the tiny
    // aggregate, never the data (ScaleSpec asserts exactly one domain-key
    // exchange in the plan).
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // threshold on the md5 prefix as a 32-bit integer: rate·2^32, the
    // numeric form of thresholdHex (rates here are data-derived, so the
    // hex-literal formatting path doesn't apply)
    val rates = counts
      .withColumn("_thr",
        round(least(lit(1.0),
          lit(targetFraction) * sum(col("_n")).over(wAll).cast("double") * col("_w")
            / sum(col("_w")).over(wAll) / col("_n").cast("double"))
          * lit(4294967296.0)).cast("long"))
      .select(col(domainCol), col("_thr"))
    df.join(broadcast(rates), Seq(domainCol))
      .where(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long") < col("_thr"))
      .select(df.columns.map(col): _*) // original column order, _thr dropped
  }

  /** Per-stratum rates (e.g. downsample one language, keep another whole).
    * Strata absent from the map fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rateCol = rates.foldLeft(lit(thresholdHex(defaultRate))) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(thresholdHex(r))).otherwise(acc)
    }
    df.where(substring(md5(col(idCol).cast("string")), 1, 8) < rateCol)
  }
}
