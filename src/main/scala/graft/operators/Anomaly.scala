package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** CUSUM CHANGEPOINT — "WHEN did this metric shift?", the follow-up to
    * [[hourlyRateAnomalies]]' "is this bucket odd?": per group, the step
    * that maximizes the centered cumulative deviation
    * `|n·S_i − i·S_n|` (the cross-multiplied form of
    * `|S_i − (i/n)·S_n|` — no float CDF ever compares, the
    * [[Eval.ksTestExact]] doctrine; this IS the KS statistic of the
    * series against time-uniformity, whose argmax is the classical
    * single-changepoint estimate for a mean shift). Ties break to the
    * EARLIEST step — deterministic. The split means export as
    * `⌊10⁶·mean⌋` via exact floor division (pmod-subtract, negatives
    * floor correctly).
    *
    * ## Scale shape (100 TB)
    * Callers pass the series ALREADY aggregated to (group, step, value)
    * — the [[Eval.autocorrAtLag]] convention — so every window here
    * partitions by group over a time-universe-sized frame (days/hours
    * per group, never rows). Products ride DECIMAL(38) (`n·S_i` wraps
    * BIGINT past |S| ≈ 10¹⁵ at day-universe n); the mean numerators
    * `10⁶·S` must fit BIGINT — |S| ≤ 9·10¹², pre-scale values beyond
    * (documented, the [[Eval.theilSenSlope]] budget). Returns one row
    * per group with ≥ 2 steps `(groupCol, n_steps, split_step, split_i,
    * cusum, mean_before_micro, mean_after_micro)` — `split_step` is the
    * LAST step of the before-segment, `cusum` the exact integer
    * statistic as an exactly-converted double; single-step groups are
    * absent (no proper split exists). */
  def cusumChangepoint(series: DataFrame, groupCol: String,
                       stepCol: org.apache.spark.sql.Column,
                       valueCol: org.apache.spark.sql.Column): DataFrame = {
    val dec = "decimal(38,0)"
    val s = series.select(col(groupCol), stepCol.cast("long").as("_t"),
      valueCol.cast("long").as("_y"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("_t"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val scored = s
      .withColumn("_i", row_number().over(wOrd).cast("long"))
      .withColumn("_si", sum(col("_y")).over(wCum))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_sn", sum(col("_y")).over(wAll))
      .where(col("_i") < col("_n")) // a split leaves both sides non-empty
      .withColumn("_stat",
        abs(col("_n").cast(dec) * col("_si") - col("_i").cast(dec) * col("_sn")))
    scored
      .withColumn("_mx", max(col("_stat")).over(wAll))
      .where(col("_stat") === col("_mx"))
      .withColumn("_rn", row_number().over(wOrd))
      .where(col("_rn") === 1)
      .select(col(groupCol), col("_n").as("n_steps"), col("_t").as("split_step"),
        col("_i").as("split_i"), col("_stat").cast("double").as("cusum"),
        expr("(1000000 * _si - pmod(1000000 * _si, _i)) DIV _i")
          .as("mean_before_micro"),
        expr("""(1000000 * (_sn - _si) - pmod(1000000 * (_sn - _si), _n - _i))
                DIV (_n - _i)""").as("mean_after_micro"))
  }

  /** PAGE–HINKLEY drift test (Page 1954; the sequential cousin of
    * [[cusumChangepoint]]): per group, against a FROZEN reference mean
    * `mu0Micro` (micro units — trained upstream, the
    * frozen-reference doctrine of the drift monitors), the cumulative
    * excess `m_t = Σ_{i≤t} (10⁶·y_i − mu0 − delta)` and its running
    * minimum give `PH_t = m_t − min_{i≤t} m_i ≥ 0`; the first step
    * where `PH_t > lambdaMicro` is the alarm. Where [[cusumChangepoint]]
    * answers retrospectively ("where was the shift"), Page–Hinkley
    * answers sequentially ("when would a monitor watching this series
    * have fired") — the online semantics, computed exactly: every
    * quantity stays BIGINT micro, no float ever enters.
    *
    * ## Scale shape (100 TB)
    * Callers pass the series already aggregated to (group, step, value)
    * — every window partitions by group over the step universe, never
    * rows; the summary is one partial-aggregable groupBy plus one
    * group-keyed join back for the alarm row. Budget: |10⁶·Σy| must fit
    * BIGINT (|Σy| ≤ 9·10¹², pre-scale beyond — the
    * [[cusumChangepoint]] convention). Returns one row per group:
    * `(groupCol, n_steps, max_ph_micro, alarm_i, alarm_step,
    * ph_alarm_micro)` — alarm columns NULL when the monitor never
    * fires. */
  def pageHinkley(series: DataFrame, groupCol: String,
                  stepCol: org.apache.spark.sql.Column,
                  valueCol: org.apache.spark.sql.Column,
                  mu0Micro: Long, deltaMicro: Long,
                  lambdaMicro: Long): DataFrame = {
    val s = series.select(col(groupCol), stepCol.cast("long").as("_t"),
      valueCol.cast("long").as("_y"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("_t"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = s
      .withColumn("_i", row_number().over(wOrd).cast("long"))
      .withColumn("_m",
        sum(lit(1000000L) * col("_y") - lit(mu0Micro + deltaMicro)).over(wCum))
      .withColumn("_mn", min(col("_m")).over(wCum))
      .withColumn("_ph", col("_m") - col("_mn"))
    val agg = scored.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_steps"),
        max(col("_ph")).as("max_ph_micro"),
        min(when(col("_ph") > lambdaMicro, col("_i"))).as("alarm_i"))
    agg
      .join(scored.select(col(groupCol), col("_i").as("alarm_i"),
          col("_t").as("alarm_step"), col("_ph").as("ph_alarm_micro")),
        Seq(groupCol, "alarm_i"), "left")
      .select(col(groupCol), col("n_steps"), col("max_ph_micro"),
        col("alarm_i"), col("alarm_step"), col("ph_alarm_micro"))
  }

  /** WALD–WOLFOWITZ RUNS TEST — "is this series RANDOM around its
    * median, or does it clump": the independence sanity check a
    * monitoring pipeline runs before trusting any i.i.d.-assuming
    * statistic on the same series. Steps classify above/below the
    * series' own grand LOWER median (an exact order statistic;
    * equal-to-median steps drop — the standard treatment), R counts
    * the runs of the ± sequence, and
    * `z = (N(R−1) − 2n₁n₂) / √(2n₁n₂(2n₁n₂−N)/(N−1))` standardizes
    * with the exact run moments — integer numerator, one trailing
    * IEEE chain. Clumped regimes (drift, autocorrelation) push R far
    * below its mean → z ≪ 0; oscillation pushes z ≫ 0.
    *
    * ## Scale shape (100 TB)
    * The [[cusumChangepoint]] series contract (steps pre-aggregated,
    * step-universe-sized per group). The median is a group-partitioned
    * cumulative over the per-group sorted frame; the sign sequence and
    * run count ride ONE lag window per group; one partial-aggregable
    * summary. Returns one row per group
    * `(group, n_steps, n_above, n_below, n_runs, z)` — n_steps counts
    * the KEPT (≠ median) steps; z NULL when either side is empty,
    * N < 2, or the run variance degenerates (2n₁n₂ ≤ N). A group whose
    * every step equals its median still returns its row (all-zero
    * counts, NULL z) — the one-row-per-group contract holds. */
  def runsTest(series: DataFrame, groupCol: String, stepCol: Column,
               valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val s = series
      .where(stepCol.isNotNull && valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), stepCol.cast("long").as("_t"),
        valueCol.cast("long").as("_y"))
      .localCheckpoint() // fans into the median build and the sign pass
    val wCum = Window.partitionBy(col("_g")).orderBy(col("_y"), col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("_g"))
    val med = s
      .withColumn("_cum", count(lit(1)).over(wCum))
      .withColumn("_n", count(lit(1)).over(wAll))
      .where(col("_cum") >= expr("(_n + 1) DIV 2"))
      .groupBy(col("_g")).agg(min(col("_y")).as("_med")) // grand lower median
    val wLag = Window.partitionBy(col("_g")).orderBy(col("_t"))
    val kept = s.join(broadcast(med), Seq("_g"))
      .where(col("_y") =!= col("_med"))
      .withColumn("_s", when(col("_y") > col("_med"), 1L).otherwise(0L))
      .withColumn("_prev", lag(col("_s"), 1).over(wLag))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_nn0"),
        sum(col("_s")).as("_n10"),
        sum(when(col("_prev").isNull || col("_prev") =!= col("_s"), 1L)
          .otherwise(0L)).as("_r0"))
    // left from the group universe (med has one row per group): a group
    // whose every step equals its median keeps its row with zero counts
    val runs = med.select(col("_g")).join(kept, Seq("_g"), "left")
      .select(col("_g"),
        coalesce(col("_nn0"), lit(0L)).as("_nn"),
        coalesce(col("_n10"), lit(0L)).as("_n1"),
        coalesce(col("_r0"), lit(0L)).as("_r"))
    val n = col("_nn").cast(dec)
    val p2 = lit(2).cast(dec) * col("_n1") * (col("_nn") - col("_n1"))
    runs
      .select(col("_g").as(groupCol), col("_nn").as("n_steps"),
        col("_n1").as("n_above"), (col("_nn") - col("_n1")).as("n_below"),
        col("_r").as("n_runs"),
        when(col("_n1") > 0L && col("_nn") - col("_n1") > 0L &&
            col("_nn") >= 2L && (p2 - n) > 0,
          (n * (col("_r").cast(dec) - lit(1L)) - p2).cast("double") /
            sqrt((p2 * (p2 - n)).cast("double") /
              (col("_nn") - lit(1L)).cast("double"))).as("z"))
      .orderBy(col(groupCol))
  }

  /** COX–STUART trend test — the sign test on first-half/second-half
    * pairs: step i pairs with step i + ⌈N/2⌉ (the middle element drops
    * when N is odd; tied pairs drop), `n_up` counts later-half wins,
    * and `z = (2·n_up − np)/√np` is the binomial(½) normal read — the
    * assumption-free "is there ANY monotone trend" precursor to
    * theilSen's slope estimate. Exact integer counts, one trailing
    * IEEE chain.
    *
    * ## Scale shape (100 TB)
    * The series contract again; the pairing is ONE group-keyed
    * equi-join of the indexed frame against its shifted self (the
    * autocorrAtLag shape); one partial-aggregable summary. Returns one
    * row per group `(group, n_pairs, n_up, n_down, z)`; z NULL when
    * every pair ties. */
  def coxStuart(series: DataFrame, groupCol: String, stepCol: Column,
                valueCol: Column): DataFrame = {
    val s = series
      .where(stepCol.isNotNull && valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), stepCol.cast("long").as("_t"),
        valueCol.cast("long").as("_y"))
    val wOrd = Window.partitionBy(col("_g")).orderBy(col("_t"))
    val wAll = Window.partitionBy(col("_g"))
    val idx = s
      .withColumn("_i", row_number().over(wOrd).cast("long"))
      .withColumn("_n", count(lit(1)).over(wAll))
      .localCheckpoint() // both sides of the pairing join
    val l = idx.where(col("_i") <= expr("_n DIV 2"))
      .select(col("_g"), col("_i"), col("_y").as("_ya"))
    val r = idx
      .select(col("_g"), (col("_i") - expr("(_n + 1) DIV 2")).as("_i"),
        col("_y").as("_yb"))
    l.join(r, Seq("_g", "_i"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_yb") > col("_ya"), 1L).otherwise(0L)).as("n_up"),
        sum(when(col("_yb") < col("_ya"), 1L).otherwise(0L)).as("n_down"))
      .select(col("_g").as(groupCol), col("n_pairs"), col("n_up"),
        col("n_down"),
        when(col("n_up") + col("n_down") > 0L,
          (lit(2L) * col("n_up") - (col("n_up") + col("n_down"))).cast("double") /
            sqrt((col("n_up") + col("n_down")).cast("double"))).as("z"))
      .orderBy(col(groupCol))
  }

  /** HOEFFDING SPLIT SCAN — the batch face of ADWIN (Bifet & Gavaldà
    * 2007, "Learning from time-changing data with adaptive windowing"):
    * for every prefix of a per-group step series, does SOME split of
    * that prefix into old|recent halves violate the Hoeffding bound
    * `|μ̂₀ − μ̂₁| ≥ √(ln(4n/δ)/(2m))`, `1/m = 1/n₀ + 1/n₁`? The FIRST
    * violating prefix is exactly where a live ADWIN first shrinks its
    * window (no shrink can precede the first violation — the parity
    * contract for [[graft.streaming.Streams.adwinStream]]), and the
    * scan is a bound-CALIBRATED retrospective alarm in its own right:
    * [[cusumChangepoint]] locates the argmax split, this one says
    * whether ANY split clears chance at confidence δ.
    *
    * ## Exactness
    * Values are micro units in [0, 10⁶] (the Hoeffding range
    * contract — shares, rates, normalized scores). Squaring the
    * condition cross-multiplies to integers:
    * `2·Δs² ≥ 10⁶·Lq(n)·(n₀+n₁)·n₀·n₁` with `Δs = S₀·n₁ − S₁·n₀`
    * exact DECIMAL(38) and `Lq(n) = round(10⁶·ln(4·deltaInv·n))`
    * quantized ONCE per prefix length at its site (the
    * corpusDivergence log scheme; `deltaInv = 1/δ` keeps the literal
    * integral). Digit budget: Δs² ≤ 10¹²·(n₀n₁)² rides DECIMAL(38) to
    * T ≈ 3·10⁶ steps.
    *
    * ## Scale shape (100 TB)
    * Callers pass the series ALREADY aggregated to (group, step, micro
    * value) — the [[cusumChangepoint]] contract: the step universe is
    * time-span-sized, never data-sized. Prefix sums ride a
    * group-partitioned window; the split check is a group-keyed
    * triangular self-join (T²/2 step PAIRS per group — day-universe
    * squared, the documented cost of checking every split, bounded by
    * the series contract; for a LONG-LIVED series pass `maxSteps` to
    * scan only the most recent horizon and keep the pair universe at
    * maxSteps²/2 — bit-equal to uncapped while T ≤ maxSteps);
    * per-prefix and per-group summaries
    * partial-aggregate. Returns one row per group `(group, n_steps,
    * first_alarm_i, first_alarm_step, n_alarm_prefixes)`; alarm
    * columns NULL when no prefix violates, including the degenerate
    * single-step group (no split pairs → n_alarm_prefixes = 0). */
  def hoeffdingSplitScan(series: DataFrame, groupCol: String,
                         stepCol: Column, valueCol: Column,
                         deltaInv: Long = 20L, maxSteps: Int = 0): DataFrame = {
    require(deltaInv >= 1L, s"deltaInv must be >= 1, got $deltaInv")
    require(maxSteps >= 0, s"maxSteps must be >= 0, got $maxSteps")
    val dec = "decimal(38,0)"
    val all = series
      .where(stepCol.isNotNull && valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), stepCol.cast("long").as("_t"),
        valueCol.cast("long").as("_y"))
    // recent-horizon bound: an uncapped long-lived series grows the
    // triangular pair universe quadratically; maxSteps > 0 scans only
    // each group's most recent maxSteps steps (bit-equal to uncapped
    // while the series is shorter — the adwinStream cap's batch face)
    val s = if (maxSteps > 0) {
      val wDesc = Window.partitionBy(col("_g")).orderBy(col("_t").desc)
      all.withColumn("_rev", row_number().over(wDesc))
        .where(col("_rev") <= maxSteps).drop("_rev")
    } else all
    val wOrd = Window.partitionBy(col("_g")).orderBy(col("_t"))
    val pre = s
      .withColumn("_i", row_number().over(wOrd).cast("long"))
      .withColumn("_s", sum(col("_y")).over(wOrd))
      .localCheckpoint() // both sides of the triangular join + the readback
    val tot = pre.groupBy(col("_g")).agg(max(col("_i")).as("_n"))
    val l = pre.select(col("_g"), col("_i"), col("_s").as("_s0"))
    val r = pre.select(col("_g"), col("_i").as("_t2"), col("_s").as("_st"))
    val pairs = l.join(r, Seq("_g"))
      .where(col("_i") < col("_t2"))
      .withColumn("_n0", col("_i"))
      .withColumn("_n1", col("_t2") - col("_i"))
      .withColumn("_ds", col("_s0").cast(dec) * col("_n1") -
        (col("_st") - col("_s0")).cast(dec) * col("_n0"))
      .withColumn("_lq", round(log(lit(4.0) * lit(deltaInv.toDouble) *
        col("_t2").cast("double")) * lit(1e6)).cast("long"))
      .withColumn("_viol",
        lit(2).cast(dec) * col("_ds") * col("_ds") >=
          lit(1000000L).cast(dec) * col("_lq") *
            (col("_n0") + col("_n1")) * col("_n0") * col("_n1"))
    val byPrefix = pairs.groupBy(col("_g"), col("_t2"))
      .agg(max(when(col("_viol"), lit(1L)).otherwise(lit(0L))).as("_v"))
    val alarms = byPrefix.groupBy(col("_g"))
      .agg(coalesce(sum(col("_v")), lit(0L)).as("_nap"),
        min(when(col("_v") === 1L, col("_t2"))).as("_first"))
    // left from tot: a single-step group has no split pairs yet still
    // gets its row (n_steps = 1, NULL alarms, 0 alarm prefixes)
    tot.join(alarms, Seq("_g"), "left")
      .join(pre.select(col("_g"), col("_i").as("_first"),
        col("_t").as("first_alarm_step")), Seq("_g", "_first"), "left")
      .select(col("_g").as(groupCol), col("_n").as("n_steps"),
        col("_first").as("first_alarm_i"), col("first_alarm_step"),
        coalesce(col("_nap"), lit(0L)).as("n_alarm_prefixes"))
      .orderBy(col(groupCol))
  }
}
