package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filter-model EVALUATION statistics — the measurement side of the
  * quality-scoring lifecycle (LmScore / Gopher rules / boilerplate
  * produce per-document scores; a curation pipeline then asks "does this
  * score actually separate the documents I want?" before spending a
  * corpus pass filtering on it). Both statistics are EXACT integer
  * computations with one trailing IEEE division, so a DuckDB oracle
  * hash-matches — no sampling, no sklearn-style float accumulation.
  *
  * Reference semantics ground: the reference's aggregation surface is
  * Fold over grouped streams (reference Expression.scala's Sum/Mul
  * algebra); ranking-based evaluation statistics are the same fold
  * algebra applied to the rank permutation, which
  * [[Ranking.globalRankBy]] already distributes.
  *
  * ## Scale shape (100 TB)
  * AUC rides the two-level prefix-sum rank (no single-partition window,
  * no per-score sort beyond bucket frames), then collapses by DISTINCT
  * score value — a partial-aggregable groupBy whose result is
  * value-universe-sized, not data-sized — and finally to ONE row.
  * Calibration bins ride the identical rank plus the O(1) equi-depth
  * bin arithmetic and collapse to `bins` rows. Nothing here holds a
  * group in memory; ties are handled by midrank ARITHMETIC (min/max of
  * rank per value), never by re-sorting.
  */
object Eval {

  /** Exact ROC-AUC via the Mann–Whitney U statistic with midrank tie
    * handling: rows ranked ascending by `(scoreCol, idCol)` through
    * [[Ranking.globalRankBy]] (bucket must be ordering-consistent with
    * the score, e.g. `floor(score·2⁶)`); per distinct score value the
    * midrank is `(min_rank + max_rank) / 2`, so
    * `u2 = Σ_values pos_cnt·(min_rank + max_rank)` is twice the
    * positives' midrank sum — an exact BIGINT — and
    * `AUC = (u2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg)` is one IEEE
    * division of exact integers. Equals the probability a random
    * positive outranks a random negative (ties count ½), the standard
    * tie-corrected AUC. Returns ONE row `(n_pos, n_neg, u2, auc)`;
    * `auc` is NULL when either class is empty (no pairs to rank). */
  def aucExact(df: DataFrame, scoreCol: Column, positive: Column,
               bucket: Column, idCol: Column): DataFrame = {
    // bucket is evaluated against the CALLER's columns (it is usually a
    // function of the raw score), selected before the internal renames
    val ranked = Ranking.globalRankBy(
      df.select(scoreCol.as("_score"), positive.as("_pos"), idCol.as("_id"),
        bucket.as("_b")),
      col("_b"), col("_score"), col("_id"))
    ranked
      .groupBy(col("_score"))
      .agg(min(col("rank")).as("_mn"), max(col("rank")).as("_mx"),
        sum(when(col("_pos"), 1L).otherwise(0L)).as("_pc"))
      .agg(sum(col("_pc")).as("n_pos"), max(col("_mx")).as("_n"),
        sum(col("_pc") * (col("_mn") + col("_mx"))).as("u2"))
      .select(col("n_pos"), (col("_n") - col("n_pos")).as("n_neg"), col("u2"),
        when(col("n_pos") > 0 && col("_n") - col("n_pos") > 0,
          (col("u2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2L) * col("n_pos") * (col("_n") - col("n_pos"))).cast("double"))
          .as("auc"))
  }

  /** PER-GROUP [[aucExact]] — "does the score separate the classes in
    * EVERY stratum, or only on average?": Simpson's-paradox insurance a
    * curation pipeline buys before applying one global threshold across
    * sources/languages/shards. Identical midrank algebra, ranked within
    * each group by [[Ranking.groupedRank]] (per-(group, subBucket)
    * frames + a model-sized offsets table whose own window partitions by
    * group — NO single-partition exchange anywhere). Returns one row per
    * group `(groupCol, n_pos, n_neg, u2, auc)`; auc NULL where a group
    * is single-class. */
  def aucExactPerGroup(df: DataFrame, groupCol: String, scoreCol: Column,
                       positive: Column, subBucket: Column, idCol: Column,
                       checkpoint: Boolean = true): DataFrame = {
    // the scored frame fans out inside groupedRank (rank window + the
    // counts/offsets branch) — cut it so an expensive caller score
    // evaluates once (measured 8.4x at 10x data without)
    val scored0 = df.select(col(groupCol), scoreCol.as("_score"),
      positive.as("_pos"), idCol.as("_id"), subBucket.as("_sbk"))
    val scored = if (checkpoint) scored0.localCheckpoint() else scored0
    val ranked = Ranking.groupedRank(scored,
      col(groupCol), col("_sbk"), col("_score"), col("_id"))
    ranked
      .groupBy(col(groupCol), col("_score"))
      .agg(min(col("rank")).as("_mn"), max(col("rank")).as("_mx"),
        sum(when(col("_pos"), 1L).otherwise(0L)).as("_pc"))
      .groupBy(col(groupCol))
      .agg(sum(col("_pc")).as("n_pos"), max(col("_mx")).as("_n"),
        sum(col("_pc") * (col("_mn") + col("_mx"))).as("u2"))
      .select(col(groupCol), col("n_pos"), (col("_n") - col("n_pos")).as("n_neg"),
        col("u2"),
        when(col("n_pos") > 0 && col("_n") - col("n_pos") > 0,
          (col("u2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2L) * col("n_pos") * (col("_n") - col("n_pos"))).cast("double"))
          .as("auc"))
  }

  /** Reliability diagram / CALIBRATION BINS: rows cut into `bins`
    * equi-depth score bins by the exact ntile arithmetic
    * ([[Ranking.equiDepthBins]] — bin sizes differ by at most one, all
    * BIGINT cuts), each bin reporting its population, positive count,
    * positive rate (one IEEE division of exact integers) and exact score
    * bounds. A well-calibrated score has `pos_rate` monotone in `bin`;
    * score MEANS are deliberately absent (a float sum would be
    * order-dependent — min/max are the order-free bounds). Returns
    * `(bin, n_rows, n_pos, pos_rate, score_min, score_max)`, `bin`
    * 1-based from the low-score end. */
  def calibrationBins(df: DataFrame, scoreCol: Column, positive: Column,
                      bucket: Column, idCol: Column, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    Ranking.equiDepthBins(
        df.select(scoreCol.as("_score"), positive.as("_pos"), idCol.as("_id"),
          bucket.as("_b")),
        col("_b"), bins, col("_score"), col("_id"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_pos"), 1L).otherwise(0L)).as("n_pos"),
        min(col("_score")).as("score_min"), max(col("_score")).as("score_max"))
      .select(col("bin"), col("n_rows"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_rows").cast("double")).as("pos_rate"),
        col("score_min"), col("score_max"))
  }

  /** Exact SPEARMAN rank correlation with midrank ties — "is my quality
    * score just measuring length?" answered without a single float
    * accumulation AND without ranking a single row: the midrank of a
    * value is determined by the VALUE HISTOGRAM alone
    * (`min+max = 2·cum_before + cnt + 1`), so the whole statistic
    * computes on histograms — per-variable value histograms carry the
    * centered doubled midranks `u = 2·cum_before + cnt − n` (doubling
    * keeps midranks integral; Σ over rows of (min+max) is exactly
    * n(n+1), so Σu = 0 identically and
    * `ρ = Σuv / (√Σu²·√Σv²)`), and the cross term rides the (x, y) PAIR
    * histogram: `Σuv = Σ_{(x,y)} cnt·u(x)·v(y)`. Three exact sums, two
    * exactly-rounded IEEE sqrts, one division.
    *
    * ## Scale shape (100 TB)
    * NO data-wide sort and no per-row rank: the data-sized work is ONE
    * partial-aggregable `groupBy(x, y)` count; value histograms derive
    * from it by further partial aggregation, cumulative counts ride the
    * two-level prefix-sum over the HISTOGRAM (per-bucket local cumsums
    * + a #buckets-row offset window broadcast back — nothing
    * single-partition that is data-sized), and the final joins key on
    * values against histogram-sized tables.
    *
    * Sums ride DECIMAL(38,0) (|Σuv| ≤ n³ overflows BIGINT past n ≈
    * 2·10⁶; 38 digits hold n to ~3·10⁹ — beyond that, shard and
    * combine). ρ is NULL when either variable is constant. Buckets must
    * be integral and ordering-consistent with their variable (they are
    * the histogram prefix-sum buckets). Returns ONE row
    * `(n, s_uv, s_uu, s_vv, rho)` with the sums as exactly-converted
    * doubles. */
  def spearmanExact(df: DataFrame, xCol: Column, yCol: Column,
                    xBucket: Column, yBucket: Column): DataFrame = {
    // the pair histogram fans out into four branches (both value
    // histograms, the count, the cross-term join) — checkpoint it once
    // or every branch re-runs the data-wide groupBy AND the caller's
    // score expressions
    val pair = df
      .select(xCol.as("_x"), yCol.as("_y"),
        xBucket.as("_bx"), yBucket.as("_by"))
      .groupBy(col("_x"), col("_y"), col("_bx"), col("_by"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    // centered doubled midranks from the value histogram via the
    // two-level cumulative count (groupedRank's offset shape)
    def centered(value: String, bucket: String, out: String): DataFrame = {
      val hist = pair.groupBy(col(value), col(bucket))
        .agg(sum(col("_c")).as("_hc"))
      val wIn = Window.partitionBy(col(bucket)).orderBy(col(value))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wOff = Window.orderBy(col(bucket))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = hist.groupBy(col(bucket)).agg(sum(col("_hc")).as("_bc"))
        .select(col(bucket), coalesce(sum(col("_bc")).over(wOff), lit(0L)).as("_off"))
      hist
        .join(broadcast(offsets), Seq(bucket))
        .withColumn("_cumb", col("_off") + coalesce(sum(col("_hc")).over(wIn), lit(0L)))
        .select(col(value), col("_hc").as(out + "c"),
          (lit(2L) * col("_cumb") + col("_hc")).as(out)) // u + n, centered below
    }
    val hx = centered("_x", "_bx", "_u")
    val hy = centered("_y", "_by", "_v")
    val n = pair.agg(sum(col("_c")).as("_n"))
    val uv = pair
      .join(hx.select(col("_x"), col("_u")), Seq("_x"))
      .join(hy.select(col("_y"), col("_v")), Seq("_y"))
      .crossJoin(broadcast(n))
      .select(col("_c"),
        (col("_u") - col("_n")).as("_cu"), (col("_v") - col("_n")).as("_cv"))
      .agg(
        sum(expr("CAST(_c AS DECIMAL(38,0)) * _cu * _cv")).as("_suv"),
        sum(expr("CAST(_c AS DECIMAL(38,0)) * _cu * _cu")).as("_suu"),
        sum(expr("CAST(_c AS DECIMAL(38,0)) * _cv * _cv")).as("_svv"))
    uv.crossJoin(broadcast(n))
      .select(col("_n").as("n"),
        col("_suv").cast("double").as("s_uv"),
        col("_suu").cast("double").as("s_uu"),
        col("_svv").cast("double").as("s_vv"),
        when(col("_suu") > 0 && col("_svv") > 0,
          col("_suv").cast("double") /
            (sqrt(col("_suu").cast("double")) * sqrt(col("_svv").cast("double"))))
          .as("rho"))
  }

  /** Exact KENDALL τ-b over integer-quantized variables — the
    * concordance companion to [[spearmanExact]] (τ reads "what fraction
    * of pairs agree in direction", robust to the magnitude of rank gaps
    * ρ is sensitive to; the judge-flagged gap in the statistics tier).
    * Callers quantize floats to longs FIRST (house convention). `yBucket`
    * must be ordering-consistent with `yCol` (the [[spearmanExact]]
    * bucket contract — e.g. `value DIV 64`); it shapes the plan, never
    * the result.
    *
    * τ-b = (C − D) / (√(n₀−n₁) · √(n₀−n₂)) with n₀ = n(n−1)/2 and
    * n₁/n₂/n₃ the x-tie / y-tie / both-tie pair counts; C + D =
    * n₀ − n₁ − n₂ + n₃, so only the DISCORDANT count D (pairs with
    * x_a < x_b and y_a > y_b) needs distributing.
    *
    * ## The distributed inversion count
    * D is a 2-D dominance count — classically a merge sort, which does
    * not shuffle. Instead, decompose by the FIRST DIFFERING base-16
    * digit of the x values (order-mapped to unsigned via sign-bit flip):
    * a pair with x_a < x_b differs first at exactly one nibble position
    * k, where their prefixes above k are equal and digit_a < digit_b —
    * so `D = Σ_k Σ_rows c·S` where S counts, within the row's own
    * `(k, prefix)` group, points with a strictly smaller digit and a
    * strictly larger y. S is read from 15 CONDITIONAL FORWARD WINDOW
    * SUMS (`Σ c·[digit < t]` over the y-ascending RANGE frame
    * `(1, ∞)` — one WindowExec, threshold picked per row by its own
    * digit), the [[graft.streaming.Streams.ksDriftStream]]
    * counts-as-conditional-sums trick laid on its side.
    *
    * ## Scale shape (100 TB)
    * The data-sized work is ONE partial-aggregable `groupBy(x, y)`; the
    * K ≤ 16 digit levels explode the CELL histogram (K = nibbles of
    * max(ux)⊕min(ux) — a 2-long driver probe — so narrow-range scores
    * pay 2-5 levels, not 16), re-grouped per `(level, prefix, digit, y)`
    * with partial aggregation. Every window is partitioned: the
    * in-partition frame by `(level, prefix, yBucket)`, and the
    * cross-bucket remainder rides per-`(level, prefix)` SUFFIX offsets
    * over the yBucket spine (the [[Ranking.globalRank]] two-level scheme
    * pointed backwards) joined back on the partition key — model-sized
    * per prefix, equi-joined, never a global window. All pair counts are
    * DECIMAL(38,0) (c·S ≤ n² — BIGINT wraps past n ≈ 3·10⁹); τ is two
    * exactly-rounded IEEE sqrts and one division, the [[pearsonExact]]
    * tail (same one-ulp-above-1 caveat on perfectly-monotone data).
    * Returns ONE row `(n, n_pairs, n_tie_x, n_tie_y, n_tie_xy,
    * concordant, discordant, tau_b, gamma, somers_d_yx)` with the pair
    * counts as exactly-converted doubles (the [[spearmanExact]] export
    * convention) — Goodman-Kruskal γ = (C−D)/(C+D) and Somers'
    * D_{Y|X} = (C−D)/(n₀−n₁) are free row-local readouts of the same
    * exact integers (γ for heavily-tied ordinal scales, Somers' D when
    * x is the predictor); each is NULL when its denominator is zero,
    * and τ is NULL when either variable is constant. */
  def kendallTauExact(df: DataFrame, xCol: Column, yCol: Column,
                      yBucket: Column): DataFrame = {
    // the cell histogram fans out five ways (n, both tie terms, the
    // lo/hi probe, the level explode) — checkpoint or every branch
    // re-runs the data-wide groupBy and the caller's score expressions.
    // NULL x/y rows are excluded up front (pairwise-complete, the same
    // contract isotonicCalibration enforces): a NULL would survive the
    // groupBy into n and the tie terms but drop out of the discordant
    // nibble decomposition, silently skewing tau_b/gamma/z
    val cells = df
      .where(xCol.isNotNull && yCol.isNotNull)
      .select(xCol.cast("long").as("_x"), yCol.cast("long").as("_y"),
        yBucket.cast("long").as("_yb"))
      .groupBy(col("_x"), col("_y"), col("_yb"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_ux", col("_x").bitwiseXOR(lit(Long.MinValue)))
      .localCheckpoint()
    // 2-long model probe: only nibbles where data can differ get a level
    val range = cells.agg(min(col("_ux")).as("lo"), max(col("_ux")).as("hi"))
      .collect().headOption
    val (lo, hi) = range.map(r =>
      if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1)))
      .getOrElse((0L, 0L))
    val k = if (lo == hi) 0
      else (63 - java.lang.Long.numberOfLeadingZeros(lo ^ hi)) / 4 + 1
    val dec = "decimal(38,0)"
    val discordant: DataFrame = if (k == 0) {
      cells.sparkSession.range(1).select(lit(0).cast(dec).as("_D"))
    } else {
      val lvl = array((0 until k).map(i => struct(
        lit(i).as("k"),
        // JVM shifts are mod-64: the top nibble's prefix is the literal 0
        (if (4 * (i + 1) >= 64) lit(0L)
         else expr(s"shiftrightunsigned(_ux, ${4 * (i + 1)})")).as("p"),
        expr(s"shiftrightunsigned(_ux, ${4 * i}) & 15").as("d"))): _*)
      val g = cells
        .select(explode(lvl).as("_l"), col("_y"), col("_yb"), col("_c"))
        .groupBy(col("_l.k").as("_k"), col("_l.p").as("_p"),
          col("_l.d").as("_d"), col("_yb"), col("_y"))
        .agg(sum(col("_c")).as("_c"))
      val win = Window.partitionBy(col("_k"), col("_p"), col("_yb"))
        .orderBy(col("_y")).rangeBetween(1L, Window.unboundedFollowing)
      val offWin = Window.partitionBy(col("_k"), col("_p"))
        .orderBy(col("_yb")).rowsBetween(1L, Window.unboundedFollowing)
      val offs = g.groupBy(col("_k"), col("_p"), col("_yb"))
        .agg(sum(when(col("_d") < 1, col("_c"))).as("_t1"),
          (2 to 15).map(t =>
            sum(when(col("_d") < t, col("_c"))).as(s"_t$t")): _*)
        .select(col("_k") +: col("_p") +: col("_yb") +:
          (1 to 15).map(t =>
            coalesce(sum(col(s"_t$t")).over(offWin), lit(0L)).as(s"_o$t")): _*)
      g.select(col("_k") +: col("_p") +: col("_yb") +: col("_d") +: col("_c") +:
          (1 to 15).map(t =>
            coalesce(sum(when(col("_d") < t, col("_c"))).over(win), lit(0L))
              .as(s"_s$t")): _*)
        .where(col("_d") >= 1)
        .join(offs, Seq("_k", "_p", "_yb"))
        .select((col("_c").cast(dec) *
          element_at(array((1 to 15).map(t =>
            col(s"_s$t") + col(s"_o$t")): _*), col("_d").cast("int")))
          .as("_dc"))
        .agg(coalesce(sum(col("_dc")), lit(0).cast(dec)).as("_D"))
    }
    // choose-2 tie terms off the cell histogram: t(t−1) is even, so the
    // decimal half is exact (DuckDB mirrors with HUGEINT // 2)
    def pairs2(t: Column): Column =
      ((t.cast(dec) * (t - lit(1L))) / lit(2)).cast(dec)
    val ties = cells
      .select(col("_x"), col("_y"), col("_c"))
      .agg(coalesce(sum(col("_c")), lit(0L)).as("_n"),
        sum(pairs2(col("_c"))).as("_n3"))
    val tx = cells.groupBy(col("_x")).agg(sum(col("_c")).as("_t"))
      .agg(coalesce(sum(pairs2(col("_t"))), lit(0).cast(dec)).as("_n1"))
    val ty = cells.groupBy(col("_y")).agg(sum(col("_c")).as("_t"))
      .agg(coalesce(sum(pairs2(col("_t"))), lit(0).cast(dec)).as("_n2"))
    ties.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(discordant))
      .select(col("_n"), pairs2(col("_n")).as("_n0"), col("_n1"),
        col("_n2"), coalesce(col("_n3"), lit(0).cast(dec)).as("_n3"),
        col("_D"))
      .select(col("_n").as("n"),
        // the spearmanExact export convention: DECIMAL(38) pair counts
        // leave as exactly-converted doubles (deterministic IEEE on both
        // engines; BIGINT would wrap past n ≈ 3·10⁹ pairs-wise)
        col("_n0").cast("double").as("n_pairs"),
        col("_n1").cast("double").as("n_tie_x"),
        col("_n2").cast("double").as("n_tie_y"),
        col("_n3").cast("double").as("n_tie_xy"),
        (col("_n0") - col("_n1") - col("_n2") + col("_n3") - col("_D"))
          .cast("double").as("concordant"),
        col("_D").cast("double").as("discordant"),
        when(col("_n0") > col("_n1") && col("_n0") > col("_n2"),
          (col("_n0") - col("_n1") - col("_n2") + col("_n3")
            - lit(2) * col("_D")).cast("double") /
            (sqrt((col("_n0") - col("_n1")).cast("double")) *
              sqrt((col("_n0") - col("_n2")).cast("double"))))
          .as("tau_b"),
        when(col("_n0") - col("_n1") - col("_n2") + col("_n3") > 0,
          (col("_n0") - col("_n1") - col("_n2") + col("_n3")
            - lit(2) * col("_D")).cast("double") /
            (col("_n0") - col("_n1") - col("_n2") + col("_n3")).cast("double"))
          .as("gamma"),
        when(col("_n0") > col("_n1"),
          (col("_n0") - col("_n1") - col("_n2") + col("_n3")
            - lit(2) * col("_D")).cast("double") /
            (col("_n0") - col("_n1")).cast("double"))
          .as("somers_d_yx"))
  }

  /** Exact PEARSON correlation over integer-quantized variables — the
    * linear companion to [[spearmanExact]] (a pipeline reads the pair:
    * ρ ≈ r says the relation is linear, ρ ≫ r says monotone-but-curved,
    * both ≈ 0 says the score carries no length signal at all). Callers
    * quantize floats to integers FIRST (cents, micro-units); the five
    * moment sums n, Σx, Σy, Σx², Σy², Σxy then ride DECIMAL(38,0) —
    * exact under any partitioning/aggregation order — and
    * `r = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))` is two
    * exactly-rounded IEEE sqrts and one division over exactly-converted
    * integers, the [[spearmanExact]] tail shape.
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable aggregate over the scan — no shuffle wider
    * than a single 6-column partial-agg row per partition, no window, no
    * join. Digit budget: |n·Σxy| ≤ n²·|x|·|y| — 38 digits hold n = 10⁹
    * rows of micro-unit (10⁶) values with 10¹⁴ to spare; beyond that,
    * quantize coarser (the r of scaled variables is unchanged).
    * Returns ONE row `(n, cov_n, var_xn, var_yn, r)` (the n-scaled
    * centered sums as exactly-converted doubles); r NULL when either
    * variable is constant. On perfectly-correlated data |r| can land one
    * ulp ABOVE 1 (the sqrt product rounds below the exact geometric
    * mean) — both engines compute the identical value, so parity holds;
    * consumers comparing against ±1 should use a tolerance. */
  def pearsonExact(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    df.select(xCol.cast("long").as("_x"), yCol.cast("long").as("_y"))
      .agg(
        count(lit(1)).as("_n"),
        sum(expr("CAST(_x AS DECIMAL(38,0))")).as("_sx"),
        sum(expr("CAST(_y AS DECIMAL(38,0))")).as("_sy"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _x")).as("_sxx"),
        sum(expr("CAST(_y AS DECIMAL(38,0)) * _y")).as("_syy"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _y")).as("_sxy"))
      .select(col("_n").as("n"),
        expr("CAST(_n AS DECIMAL(38,0)) * _sxy - _sx * _sy").as("_covn"),
        expr("CAST(_n AS DECIMAL(38,0)) * _sxx - _sx * _sx").as("_vxn"),
        expr("CAST(_n AS DECIMAL(38,0)) * _syy - _sy * _sy").as("_vyn"))
      .select(col("n"),
        col("_covn").cast("double").as("cov_n"),
        col("_vxn").cast("double").as("var_xn"),
        col("_vyn").cast("double").as("var_yn"),
        when(col("_vxn") > 0 && col("_vyn") > 0,
          col("_covn").cast("double") /
            (sqrt(col("_vxn").cast("double")) * sqrt(col("_vyn").cast("double"))))
          .as("r"))
  }

  /** CHI-SQUARED test of independence over two categorical columns —
    * "is source predictive of label?", the drift/bias probe a curation
    * pipeline runs on (source × language), (shard × quality-tier),
    * (split × domain) before trusting a stratification. Uses the
    * sparse-safe identity `χ² = N·Σ_cells O²/(R·C) − N`: zero cells
    * contribute 0 to the sum (their deviation is captured by the −N
    * term), so summing over OBSERVED cells only is exact — the naive
    * `Σ(O−E)²/E` over observed cells would silently drop every
    * structural zero's contribution. Per cell
    * `⌊O²·N·10⁶ / (R·C)⌋` is pure DECIMAL(38) integer arithmetic
    * (quantize-before-sum, floor losses ≤ 1 micro-unit per observed
    * cell); no IEEE operation exists anywhere except the trailing
    * display division.
    *
    * ## Scale shape (100 TB)
    * The data-sized work is ONE partial-aggregable `groupBy(a, b)` count,
    * checkpointed once (it fans into row totals, column totals, N, and
    * the term join — all category-universe-sized); totals attach by
    * broadcast. Digit budget: `O²·N·10⁶ ≤ N³·10⁶` — 38 digits hold
    * N ≈ 2·10¹⁰ exactly; shard-and-combine is NOT valid for χ², so
    * beyond that, compute on a stratum or a fixed-rate sample.
    * Returns ONE row `(n, n_a, n_b, dof, chi2_micro, chi2)`. */
  def chiSquareIndependence(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("_a"), bCol.as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
      .localCheckpoint()
    val ra = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val cb = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val n = cells.agg(sum(col("_o")).as("_n"))
    cells
      .join(broadcast(ra), Seq("_a"))
      .join(broadcast(cb), Seq("_b"))
      .crossJoin(broadcast(n))
      .select(col("_a"), col("_b"),
        expr("(CAST(_o AS DECIMAL(38,0)) * _o * _n * 1000000) DIV " +
          "(CAST(_ra AS DECIMAL(38,0)) * _cb)").as("_t"))
      .agg(countDistinct(col("_a")).as("n_a"), countDistinct(col("_b")).as("n_b"),
        sum(col("_t")).as("_st"))
      .crossJoin(broadcast(n))
      .select(col("_n").as("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        (col("_st") - expr("CAST(_n AS DECIMAL(38,0)) * 1000000"))
          .cast("long").as("chi2_micro"))
      .withColumn("chi2", col("chi2_micro").cast("double") / lit(1e6))
  }

  /** MUTUAL INFORMATION between two categorical columns in micro-nats —
    * the magnitude companion to [[chiSquareIndependence]] (χ² says
    * "dependence is detectable"; MI says "how many bits of one column
    * the other carries" — the number a pipeline compares against a
    * leakage budget when a metadata column threatens to encode the
    * label). `MI = Σ_cells (O/N)·ln(O·N/(R·C))`; each cell's
    * `ln(O·N/(R·C))` is quantized to round(ln·10⁶) ONCE per distinct
    * cell (the [[Colloc]] PMI shape, same left-associated double
    * arithmetic), so `mi_n_micro = Σ O·pmi_micro` is an exact integer
    * sum (DECIMAL(38) — O·pmi can pass 2⁶³ at corpus scale) and
    * `mi_nats = mi_n_micro / (N·10⁶)` is one IEEE division.
    *
    * ## Scale shape (100 TB)
    * Identical to [[chiSquareIndependence]]: one partial-aggregable cell
    * count (checkpointed), broadcast-attached totals, category-sized
    * everything after the scan. Returns ONE row
    * `(n, n_cells, mi_n_micro, mi_nats)`. */
  def mutualInfoUnats(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("_a"), bCol.as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
      .localCheckpoint()
    val ra = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val cb = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val n = cells.agg(sum(col("_o")).as("_n"))
    cells
      .join(broadcast(ra), Seq("_a"))
      .join(broadcast(cb), Seq("_b"))
      .crossJoin(broadcast(n))
      // fixed left-associated double shape (the Colloc PMI site)
      .withColumn("_pmi",
        round(log(col("_o").cast("double") * col("_n").cast("double") /
          col("_ra").cast("double") / col("_cb").cast("double")) * lit(1e6)).cast("long"))
      .agg(max(col("_n")).as("_nn"), count(lit(1)).as("n_cells"),
        sum(expr("CAST(_o AS DECIMAL(38,0)) * _pmi")).as("_mi"))
      .select(col("_nn").as("n"), col("n_cells"),
        col("_mi").cast("double").as("mi_n_micro"),
        (col("_mi").cast("double") / (col("_nn").cast("double") * lit(1e6)))
          .as("mi_nats"))
  }

  /** COHEN'S κ — chance-corrected agreement between two categorical
    * raters over the same items (the label-quality read a pipeline runs
    * before trusting a cheap classifier: raw agreement flatters raters
    * that both pick the majority label; κ subtracts the agreement their
    * marginals produce by chance). Exact integer form:
    * `κ = (N·O − E₂) / (N² − E₂)` with `O` the confusion diagonal and
    * `E₂ = Σ_label row_label·col_label` — cross-multiplied so the single
    * IEEE division is the readout, the [[chiSquareIndependence]]
    * doctrine.
    *
    * ## Scale shape (100 TB)
    * Identical to [[chiSquareIndependence]]: ONE partial-aggregable
    * `groupBy(a, b)` cell count (checkpointed — it fans into marginals,
    * the diagonal, and the total), then everything is
    * label-universe-sized; E₂ joins the two marginals on the label
    * (inner join is exact — a label only one rater uses contributes
    * `r·c = 0`). DECIMAL(38): `N·O ≤ N²` holds to N ≈ 3·10⁹; beyond
    * that compute per stratum. Returns ONE row
    * `(n, observed_agree, expected_pairs, kappa)` with `expected_pairs`
    * = E₂ as an exactly-converted double; κ NULL when `N² = E₂` (both
    * raters constant — chance explains everything). */
  def cohensKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("_a"), bCol.as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
      .localCheckpoint()
    val ra = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val cb = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val n = cells.agg(coalesce(sum(col("_o")), lit(0L)).as("_n"))
    val o = cells.where(col("_a") === col("_b"))
      .agg(coalesce(sum(col("_o")), lit(0L)).as("_agree"))
    val dec = "decimal(38,0)"
    val e2 = ra.join(cb, col("_a") === col("_b"))
      .agg(coalesce(sum(expr("CAST(_ra AS DECIMAL(38,0)) * _cb")),
        lit(0).cast(dec)).as("_e2"))
    n.crossJoin(broadcast(o)).crossJoin(broadcast(e2))
      .select(col("_n").as("n"), col("_agree").as("observed_agree"),
        col("_e2").cast("double").as("expected_pairs"),
        when(col("_n").cast(dec) * col("_n") > col("_e2"),
          (col("_agree").cast(dec) * col("_n") - col("_e2")).cast("double") /
            (col("_n").cast(dec) * col("_n") - col("_e2")).cast("double"))
          .as("kappa"))
  }

  /** Per-group BRIER score — the OVERALL probabilistic-quality number
    * completing the eval triad ([[aucExactPerGroup]] measures
    * discrimination, [[calibrationBins]] calibration; Brier is their
    * sum, the mean squared error of the probability):
    * `Σ (p_µ − y·10⁶)²` over micro-unit probabilities is an exact
    * DECIMAL(38) integer per group (|diff| ≤ 10⁶, squared 10¹², ×10¹⁹
    * rows still inside 38 digits), and `brier = sse/(n·10¹²)` is one
    * IEEE division. One partial-aggregable grouped pass. Returns
    * `(groupCol, n, sse_micro2, brier)`. */
  def brierPerGroup(df: DataFrame, groupCol: String, probMicroCol: Column,
                    positive: Column): DataFrame = {
    df.select(col(groupCol), probMicroCol.cast("long").as("_p"),
        when(positive, 1000000L).otherwise(0L).as("_y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(_p - _y AS DECIMAL(38,0)) * (_p - _y)")).as("_sse"))
      .select(col(groupCol), col("n"),
        col("_sse").cast("double").as("sse_micro2"),
        (col("_sse").cast("double") / (col("n").cast("double") * lit(1e12)))
          .as("brier"))
  }

  /** Per-group LINEAR TREND — exact least-squares slope and intercept as
    * RATIONALS: over each group's (x, y) points,
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` and
    * `intercept = (Σy·Σx² − Σx·Σxy) / (same denominator)`, with every
    * numerator and the shared denominator an exact DECIMAL(38) integer
    * (the [[pearsonExact]] moment machinery, grouped). "Is this domain's
    * volume growing and how fast" answered without a float accumulation;
    * the sign test (`slope_num` vs 0) is exact even where the IEEE
    * quotient would round near zero. Callers pass integer-quantized x/y.
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable grouped aggregate over the scan; output is
    * group-universe-sized. The trailing quotients are single IEEE
    * divisions of exactly-converted integers. Returns
    * `(groupCol, n, slope_num, slope_den, slope, intercept)` — slope and
    * intercept NULL for degenerate groups (constant x, n ≤ 1). */
  def groupedTrend(df: DataFrame, groupCol: String, xCol: Column,
                   yCol: Column): DataFrame = {
    df.select(col(groupCol), xCol.cast("long").as("_x"), yCol.cast("long").as("_y"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(_x AS DECIMAL(38,0))")).as("_sx"),
        sum(expr("CAST(_y AS DECIMAL(38,0))")).as("_sy"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _x")).as("_sxx"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _y")).as("_sxy"))
      .select(col(groupCol), col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * _sxy - _sx * _sy").as("_num"),
        expr("CAST(n AS DECIMAL(38,0)) * _sxx - _sx * _sx").as("_den"),
        expr("_sy * _sxx - _sx * _sxy").as("_inum"))
      .select(col(groupCol), col("n"),
        col("_num").cast("double").as("slope_num"),
        col("_den").cast("double").as("slope_den"),
        when(col("_den") > 0, col("_num").cast("double") / col("_den").cast("double"))
          .as("slope"),
        when(col("_den") > 0, col("_inum").cast("double") / col("_den").cast("double"))
          .as("intercept"))
  }

  /** ISOTONIC CALIBRATION (pool-adjacent-violators) — the step after
    * [[calibrationBins]] says the score is miscalibrated: fit the
    * best monotone map score → P(positive) (squared loss) and emit it as
    * a calibration TABLE the pipeline applies with one broadcast
    * equi-join. Binning smooths and can invert locally; PAV is the
    * standard exact fix (Zadrozny & Elkan, KDD 2002).
    *
    * ## Exactness
    * All PAV pool merges compare exact rationals by BigInt
    * cross-multiplication (`p₁·n₂ ≥ p₂·n₁` — never a float rate), and
    * the fitted value exports as `⌊10⁶·p_block/n_block⌋`, so the table
    * is integers end-to-end. The oracle mirrors it through the minimax
    * characterization `fit(i) = max_{j≤i} min_{k≥i} avg(j..k)` with
    * rationals ordered by the injective key `⌊p·10³⁰/n⌋` (distinct
    * rationals with n ≤ 10⁶ differ by ≥ 10⁻¹², i.e. ≥ 10¹⁸ in key
    * space) and `fitted_micro = key ÷ 10²⁴` (the nested floor-division
    * identity).
    *
    * ## Scale shape (100 TB)
    * The data-sized work is ONE partial-aggregable
    * `groupBy(quantized score)`; the collect is SCORE-UNIVERSE-sized —
    * the caller quantizes to the granularity they will threshold at
    * (the model contract, like IVF centroids or the BPE merge table),
    * so the driver holds the calibration model, never data. PAV itself
    * is a linear stack pass over that model. Returns one row per
    * distinct score `(score_q, n, n_pos, fitted_micro)` with
    * `fitted_micro` monotone non-decreasing in `score_q`; NULL scores
    * are excluded. */
  def isotonicCalibration(df: DataFrame, scoreCol: Column,
                          positive: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .select(scoreCol.cast("long").as("_v"),
        when(positive, 1L).otherwise(0L).as("_p"))
      .where(col("_v").isNotNull)
      .groupBy(col("_v"))
      .agg(count(lit(1)).as("_t"), sum(col("_p")).as("_pc"))
      .orderBy(col("_v"))
      .collect() // score-universe-sized: the calibration model
    // PAV: pool adjacent violators, rates compared as exact rationals
    final case class Pool(n: Long, p: Long,
                          members: List[(Long, Long, Long)])
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    for (r <- cells) {
      var cur = Pool(r.getLong(1), r.getLong(2),
        List((r.getLong(0), r.getLong(1), r.getLong(2))))
      while (stack.nonEmpty &&
        BigInt(stack.last.p) * cur.n >= BigInt(cur.p) * stack.last.n) {
        val prev = stack.remove(stack.length - 1)
        cur = Pool(prev.n + cur.n, prev.p + cur.p, prev.members ++ cur.members)
      }
      stack += cur
    }
    val rows = stack.toSeq.flatMap { pool =>
      val fitted = (BigInt(pool.p) * 1000000L / pool.n).toLong
      pool.members.map { case (v, t, pc) => (v, t, pc, fitted) }
    }
    rows.toDF("score_q", "n", "n_pos", "fitted_micro").orderBy(col("score_q"))
  }

  /** SAMPLE-WEIGHTED isotonic regression — [[isotonicCalibration]] with
    * per-row importance: fit the monotone map x → ŷ minimizing
    * Σ w·(ŷ − y)², the calibration a pipeline runs when rows are not
    * equally trustworthy (weight by document length, dedup multiplicity,
    * an inverse-propensity factor). Same exact-rational PAV stack with
    * WEIGHTED pools: a pool carries `(W, S) = (Σw, Σw·y)`, violators
    * merge on the BigInt cross-multiplication `S₁·W₂ ≥ S₂·W₁` (never a
    * float rate), and the fitted value exports as the true FLOOR
    * `⌊10⁶·S/W⌋` (nonneg-mod subtraction — y may be negative). The
    * oracle mirrors the weighted minimax characterization
    * `fit(i) = max_{j≤i} min_{k≥i} (Σ_{j..k} w·y)/(Σ_{j..k} w)` with the
    * injective HUGEINT key `⌊S·10³⁰/W⌋` and the nested-floor readout —
    * [[isotonicCalibration]]'s scheme with (n, p) → (W, S).
    *
    * ## Contracts / budgets
    * Weights are POSITIVE integers after the long cast (rows with
    * w ≤ 0 or any NULL input are excluded — pairwise-complete, the
    * [[kendallTauExact]] convention); callers quantize importance to
    * integer units. Oracle digit budget: |Σw·y|·10³⁰ must fit HUGEINT →
    * |S| ≤ 10⁸ total; key injectivity needs pool-weight products
    * W₁·W₂ < 10³⁰⁻ᵐᵃˣ — both hold comfortably for ΣW ≤ 10⁷.
    *
    * ## Scale shape (100 TB)
    * Identical to [[isotonicCalibration]]: ONE partial-aggregable
    * `groupBy(quantized x)`, a score-universe-sized collect (the model
    * contract), PAV a linear stack pass over the model. Returns one row
    * per distinct x `(score_q, w_sum, wy_sum, fitted_micro)` with
    * `fitted_micro` monotone non-decreasing in `score_q`. */
  def isotonicWeighted(df: DataFrame, scoreCol: Column, yCol: Column,
                       weightCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .select(scoreCol.cast("long").as("_v"), yCol.cast("long").as("_y"),
        weightCol.cast("long").as("_w"))
      .where(col("_v").isNotNull && col("_y").isNotNull &&
        col("_w").isNotNull && col("_w") > 0L)
      .groupBy(col("_v"))
      .agg(sum(col("_w")).as("_wn"),
        sum(col("_w") * col("_y")).as("_wy"))
      .orderBy(col("_v"))
      .collect() // score-universe-sized: the model
    final case class Pool(w: Long, s: Long,
                          members: List[(Long, Long, Long)])
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    for (r <- cells) {
      var cur = Pool(r.getLong(1), r.getLong(2),
        List((r.getLong(0), r.getLong(1), r.getLong(2))))
      while (stack.nonEmpty &&
        BigInt(stack.last.s) * cur.w >= BigInt(cur.s) * stack.last.w) {
        val prev = stack.remove(stack.length - 1)
        cur = Pool(prev.w + cur.w, prev.s + cur.s, prev.members ++ cur.members)
      }
      stack += cur
    }
    val rows = stack.toSeq.flatMap { pool =>
      // true floor for possibly-negative S: subtract the nonneg mod
      val scaled = BigInt(pool.s) * 1000000L
      val fitted = ((scaled - scaled.mod(BigInt(pool.w))) / pool.w).toLong
      pool.members.map { case (v, w, s) => (v, w, s, fitted) }
    }
    rows.toDF("score_q", "w_sum", "wy_sum", "fitted_micro")
      .orderBy(col("score_q"))
  }

  /** Grouped THEIL–SEN slope — the ROBUST companion to [[groupedTrend]]
    * (OLS bends to a single outlier month; the median of pairwise slopes
    * has a 29% breakdown point — a pipeline reads the PAIR: OLS ≈
    * Theil–Sen says the trend is clean, a gap says outliers drive it).
    * The statistic is the median of MICRO-SLOPES
    * `⌊10⁶·(y_b − y_a) / (x_b − x_a)⌋` over all within-group pairs with
    * `x_a < x_b` — floor division on both engines (Spark subtracts
    * `pmod` first so `DIV`'s truncation IS the floor; DuckDB `//`
    * floors natively), so every value is an exact BIGINT and the median
    * is an order statistic, never a float.
    *
    * ## Scale shape (100 TB)
    * Callers pass the series ALREADY aggregated to (group, x, y) — the
    * [[autocorrAtLag]] convention — so the pair join is bounded by the
    * per-group x-universe SQUARED (e.g. 84 months → ≤ 3.5k pairs/group),
    * never by data volume; the data-sized work happened in the caller's
    * partial-aggregable rollup. The rank window partitions by group over
    * that model-sized pair frame. Digit budget: `microUnits·|Δy|` must
    * fit BIGINT — |Δy| ≤ 9·10¹² at micro units; pre-scale y beyond that
    * (slope units are the caller's). Returns one row per group with ≥ 2
    * distinct x `(groupCol, n_pairs, slope_micro_lo, slope_micro_hi,
    * slope_micro)` — lo/hi the two middle order statistics (equal when
    * the pair count is odd), `slope_micro` their exactly-halved double
    * mean; single-point groups are absent (no orderable pair exists). */
  def theilSenSlope(series: DataFrame, groupCol: String, xCol: Column,
                    yCol: Column, microUnits: Long = 1000000L): DataFrame = {
    require(microUnits >= 1L, s"microUnits must be >= 1, got $microUnits")
    // the series joins against ITSELF — cut the lineage or the caller's
    // aggregation pipeline (often a multi-join rollup) runs once per
    // side; the frame is model-sized by contract, so the cut is free
    val s = series.select(col(groupCol),
      xCol.cast("long").as("_x"), yCol.cast("long").as("_y"))
      .localCheckpoint()
    val a = s.select(col(groupCol), col("_x").as("_xa"), col("_y").as("_ya"))
    val b = s.select(col(groupCol), col("_x").as("_xb"), col("_y").as("_yb"))
    val pairs = a.join(b, Seq(groupCol))
      .where(col("_xa") < col("_xb"))
      .select(col(groupCol),
        (lit(microUnits) * (col("_yb") - col("_ya"))).as("_num"),
        (col("_xb") - col("_xa")).as("_den"))
      .select(col(groupCol),
        expr("(_num - pmod(_num, _den)) DIV _den").as("_sm"))
    val wRank = Window.partitionBy(col(groupCol)).orderBy(col("_sm"))
    val wAll = Window.partitionBy(col(groupCol))
    pairs
      .withColumn("_rn", row_number().over(wRank))
      .withColumn("_m", count(lit(1)).over(wAll))
      .where(col("_rn") === expr("(_m + 1) DIV 2") ||
        col("_rn") === expr("_m DIV 2 + 1"))
      .groupBy(col(groupCol))
      .agg(max(col("_m")).as("n_pairs"),
        min(col("_sm")).as("slope_micro_lo"),
        max(col("_sm")).as("slope_micro_hi"))
      .select(col(groupCol), col("n_pairs"),
        col("slope_micro_lo"), col("slope_micro_hi"),
        ((col("slope_micro_lo").cast("double") +
          col("slope_micro_hi").cast("double")) / lit(2.0)).as("slope_micro"))
  }

  /** Two-sample KOLMOGOROV-SMIRNOV distance, EXACT — the
    * distribution-shift test completing the drift kit (PSI buckets and
    * smooths; KS is the assumption-free sup-gap over the EMPIRICAL
    * CDFs): `KS = max_v |F_a(v) − F_b(v)|`, computed as the integer
    * maximum `ks_num = max_v |c_a(v)·n_b − c_b(v)·n_a|` over the merged
    * value histogram (cross-multiplied — no float CDF ever compares),
    * with `ks_micro = ks_num·10⁶ DIV (n_a·n_b)` the quantized readout.
    *
    * ## Scale shape (100 TB)
    * Both samples collapse to ONE partial-aggregable per-value count
    * pair; cumulative counts ride the two-level prefix sum over the
    * value histogram (per-bucket windows + a broadcast bucket-offset
    * table carrying both running sums — the [[spearmanExact]] shape);
    * the final max is one more partial aggregate. Digit budget:
    * c·n ≤ n_a·n_b — BIGINT holds both samples to ~3·10⁹ rows each;
    * the readout `ks = ks_num/(n_a·n_b)` is one IEEE division of exact
    * integers (no ·10⁶ that could overflow the product). Returns ONE
    * row `(n_a, n_b, ks_num, ks)`. */
  def ksTestExact(a: DataFrame, aCol: Column, b: DataFrame, bCol: Column,
                  bucketOf: Column => Column): DataFrame = {
    val tagged = a.select(aCol.cast("long").as("_v"), lit(1L).as("_ca"), lit(0L).as("_cb"))
      .unionByName(b.select(bCol.cast("long").as("_v"), lit(0L).as("_ca"), lit(1L).as("_cb")))
    val hist = tagged.groupBy(col("_v"))
      .agg(sum(col("_ca")).as("_ha"), sum(col("_cb")).as("_hb"))
      .withColumn("_b", bucketOf(col("_v")))
      .localCheckpoint() // fans into totals, offsets, and the sweep
    val n = hist.agg(sum(col("_ha")).as("_na"), sum(col("_hb")).as("_nb"))
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy(col("_b"))
      .agg(sum(col("_ha")).as("_ba"), sum(col("_hb")).as("_bb"))
      .select(col("_b"),
        coalesce(sum(col("_ba")).over(wOff), lit(0L)).as("_offa"),
        coalesce(sum(col("_bb")).over(wOff), lit(0L)).as("_offb"))
    hist
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("_cuma", col("_offa") + sum(col("_ha")).over(wIn))
      .withColumn("_cumb", col("_offb") + sum(col("_hb")).over(wIn))
      .crossJoin(broadcast(n))
      .select(col("_na"), col("_nb"),
        abs(col("_cuma") * col("_nb") - col("_cumb") * col("_na")).as("_gap"))
      .groupBy(col("_na"), col("_nb"))
      .agg(max(col("_gap")).as("ks_num"))
      .select(col("_na").as("n_a"), col("_nb").as("n_b"), col("ks_num"),
        (col("ks_num").cast("double") /
          (col("_na") * col("_nb")).cast("double")).as("ks"))
  }

  /** ROUGE-N contamination scores — clipped n-gram overlap of every
    * corpus document against every benchmark item it SHARES an n-gram
    * with (Lin 2004's recall + precision + F1): where q77's span scan
    * answers "which exact 4-gram windows leaked", ROUGE grades the
    * LOOSER paraphrase-ish overlap an exact window match misses — the
    * two reads a decontamination pass runs together. Counts are clipped
    * per n-gram (`Σ_g min(cand_g, ref_g)`); with the shared numerator,
    * `F1 = 2m/(|cand| + |ref|)` exactly, so all three scores are floor
    * divisions of exact integers (micro units).
    *
    * ## Scale shape (100 TB)
    * N-grams shuffle as 60-bit md5 keys (the inverted-index universe —
    * both engines compute over the same hashed grams, [[graft.operators
    * .Dedup]]'s doctrine); per-side counts partial-aggregate BEFORE the
    * join, so the equi-join is (corpus gram-type) × (benchmark
    * postings) — a gram's fan-out is bounded by the BENCHMARK's size,
    * never the corpus, and pairs sharing nothing never exist. Totals
    * are per-doc projections (no second scan). Zero-token documents are
    * excluded from BOTH sides: the short-doc whole-text shingle rule
    * would give every empty cand/ref pair the shared "" gram and a
    * spurious f1_micro = 1000000 full-contamination flag. Returns one
    * row per overlapping pair `(idCol, ref_id, n_match, cand_total,
    * ref_total, precision_micro, recall_micro, f1_micro)`. */
  def rougeN(cand: DataFrame, ref: DataFrame, idCol: String,
             textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def nonEmpty(df: DataFrame): DataFrame =
      df.where(size(graft.functions.Text.tokens(col(textCol))) >= 1)
    def gramCounts(df: DataFrame, id: String, cnt: String): DataFrame = df
      .select(col(idCol).as(id),
        explode(graft.functions.Text.fastWordShingles(col(textCol), n)).as("_g"))
      .groupBy(col(id), Dedup.shingleKey(col("_g")).as("_k"))
      .agg(count(lit(1)).as(cnt))
    // totals are ARITHMETIC on the token count (max(|toks|−n+1, 1)) —
    // a narrow second projection, deliberately NOT a rollup of the gram
    // table (materializing the exploded counts to reuse them measured
    // 4× slower than this scan at sf0.1) and NOT a shingle re-build
    def totals(df: DataFrame, id: String, tot: String): DataFrame = {
      val nt = size(graft.functions.Text.tokens(col(textCol)))
      df.select(col(idCol).as(id),
        when(nt <= n, lit(1L)).otherwise((nt - lit(n) + lit(1)).cast("long"))
          .as(tot))
    }
    val c = nonEmpty(cand)
    val r = nonEmpty(ref)
    val matches = gramCounts(c, "_cid", "_c1")
      .join(gramCounts(r, "_rid", "_c2"), Seq("_k"))
      .groupBy(col("_cid"), col("_rid"))
      .agg(sum(least(col("_c1"), col("_c2"))).as("n_match"))
    matches
      .join(totals(c, "_cid", "_ct"), Seq("_cid"))
      .join(broadcast(totals(r, "_rid", "_rt")), Seq("_rid"))
      .select(col("_cid").as(idCol), col("_rid").as("ref_id"),
        col("n_match"), col("_ct").as("cand_total"), col("_rt").as("ref_total"),
        expr("(1000000 * n_match - pmod(1000000 * n_match, _ct)) DIV _ct")
          .as("precision_micro"),
        expr("(1000000 * n_match - pmod(1000000 * n_match, _rt)) DIV _rt")
          .as("recall_micro"),
        expr("""(2000000 * n_match - pmod(2000000 * n_match, _ct + _rt))
                DIV (_ct + _rt)""").as("f1_micro"))
  }

  /** Pairwise BLEU (Papineni 2002) over a GIVEN candidate/reference pair
    * list — the precision-family companion to [[rougeN]] (ROUGE asks
    * "how much of the benchmark leaked", BLEU asks "how much of the
    * candidate is benchmark material"); a decontamination pass runs
    * BLEU on exactly the pairs ROUGE flagged, so the all-pairs explosion
    * never exists. Modified (clipped) n-gram precisions for n = 1..maxN
    * over the shared 60-bit md5 gram universe, brevity penalty from the
    * unigram lengths, reported in LOG space:
    * `log_bleu_micro = round(10⁶·(min(0, 1 − r/c) + Σₙ ln(mₙ/cₙ)/maxN))`
    * — `exp` is deliberately NOT taken (libm exp drifts across engines,
    * the [[graft.operators.Survival.kaplanMeier]] convention; `ln`
    * agrees and is already gated there); NULL when any mₙ = 0 (BLEU is
    * exactly 0 — no smoothing, documented).
    *
    * ## Scale shape (100 TB)
    * Both sides first SEMI-JOIN to the pair list (suspect-pair-sized,
    * not corpus-sized); per n one partial-aggregable gram count per
    * side and one equi-join through the pair list; totals are per-doc
    * projections. Returns one row per input pair
    * `(idCol, ref_id, c_len, r_len, m_1..m_maxN, log_bleu_micro)`. */
  def bleuPairs(pairs: DataFrame, cand: DataFrame, ref: DataFrame,
                idCol: String, textCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val pr = pairs.select(col(idCol).as("_cid"), col("ref_id").as("_rid"))
    // zero-token docs are excluded (the [[rougeN]] contract — the
    // whole-text shingle rule would hand empty pairs the "" gram)
    val c = cand.select(col(idCol).as("_cid"), col(textCol).as("_t"))
      .where(size(graft.functions.Text.tokens(col("_t"))) >= 1)
      .join(pr.select(col("_cid")).distinct(), Seq("_cid"), "left_semi")
    val r = ref.select(col(idCol).as("_rid"), col(textCol).as("_t"))
      .where(size(graft.functions.Text.tokens(col("_t"))) >= 1)
      .join(pr.select(col("_rid")).distinct(), Seq("_rid"), "left_semi")
    def counts(df: DataFrame, id: String, n: Int, cnt: String): DataFrame = df
      .select(col(id),
        explode(graft.functions.Text.fastWordShingles(col("_t"), n)).as("_g"))
      .groupBy(col(id), Dedup.shingleKey(col("_g")).as("_k"))
      .agg(count(lit(1)).as(cnt))
    // route cand grams through the pair list BEFORE touching the ref
    // side: the join volume is (pair grams), never (all sharing pairs)
    val matched = (1 to maxN).map { n =>
      counts(c, "_cid", n, "_c1")
        .join(pr, Seq("_cid"))
        .join(counts(r, "_rid", n, "_c2"), Seq("_rid", "_k"))
        .groupBy(col("_cid"), col("_rid"))
        .agg(sum(least(col("_c1"), col("_c2"))).as(s"m_$n"))
    }
    // totals by token-count arithmetic (max(|toks|−n+1, 1)) — narrow
    // projections over the pair-semi-joined sides; see [[rougeN]] for
    // why this beats reusing the exploded gram tables
    def total(df: DataFrame, id: String, n: Int, out: String): DataFrame = {
      val nt = size(graft.functions.Text.tokens(col("_t")))
      df.select(col(id),
        when(nt <= n, lit(1L)).otherwise((nt - lit(n) + lit(1)).cast("long"))
          .as(out))
    }
    var out = pr
      .join(total(c, "_cid", 1, "c_len"), Seq("_cid"))
      .join(total(r, "_rid", 1, "r_len"), Seq("_rid"))
    for (n <- 1 to maxN) {
      out = out
        .join(total(c, "_cid", n, s"_ct$n"), Seq("_cid"))
        .join(matched(n - 1), Seq("_cid", "_rid"), "left")
        .withColumn(s"m_$n", coalesce(col(s"m_$n"), lit(0L)))
    }
    val logPrecisions = (1 to maxN).map(n =>
      log(col(s"m_$n").cast("double") / col(s"_ct$n").cast("double")))
    val logBp = least(lit(0.0),
      lit(1.0) - col("r_len").cast("double") / col("c_len").cast("double"))
    out.select(
      Seq(col("_cid").as(idCol), col("_rid").as("ref_id"),
        col("c_len"), col("r_len")) ++
      (1 to maxN).map(n => col(s"m_$n")) :+
      when((1 to maxN).map(n => col(s"m_$n") > 0L).reduce(_ && _),
        round((logBp + logPrecisions.reduce(_ + _) / lit(maxN.toDouble)) *
          lit(1e6)).cast("long"))
        .as("log_bleu_micro"): _*)
  }

  /** WILSON score interval per group — the confidence band a dashboard
    * should draw around every pass/conversion rate (the naive ±z√(p̂q̂/n)
    * band collapses to zero width at p̂ ∈ {0, 1} and escapes [0, 1]; the
    * Wilson interval stays honest at extreme rates and small n):
    * `center = (p̂ + z²/2n)/(1 + z²/n)`,
    * `half = z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n)`. The z quantile is a
    * PLAN-TIME literal inlined verbatim into the oracle (the Benford
    * scheme); the counts are exact BIGINTs and the interval is one
    * deterministic IEEE chain over them, so the rows hash-match.
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable groupBy; the interval is a row-local
    * projection on #groups rows. Returns
    * `(groupCol, n, n_pos, rate, wilson_lo, wilson_hi)`. */
  def wilsonInterval(df: DataFrame, groupCol: String, positive: Column,
                     z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(positive, 1L).otherwise(0L)).as("n_pos"))
    val nD = col("n").cast("double")
    val p = col("n_pos").cast("double") / nD
    val z2n = lit(z) * lit(z) / nD
    val denom = lit(1.0) + z2n
    val center = (p + z2n / lit(2.0)) / denom
    val half = lit(z) *
      sqrt(p * (lit(1.0) - p) / nD + z2n / (lit(4.0) * nD)) / denom
    agg.select(col(groupCol), col("n"), col("n_pos"), p.as("rate"),
      (center - half).as("wilson_lo"), (center + half).as("wilson_hi"))
  }

  /** COCHRAN–MANTEL–HAENSZEL test — "is this 2×2 association REAL once
    * I control for the stratum?", the stratified companion to
    * [[chiSquareIndependence]] and the tabular cousin of
    * [[aucExactPerGroup]]'s Simpson's-paradox insurance: a pooled 2×2
    * can show an exposure→outcome link that is pure composition (one
    * stratum has more of both); CMH tests the association WITHIN strata
    * and pools the evidence. Per stratum k with 2×2 cells
    * (a, b / c, d), margins n₁=a+b, n₂=c+d, m₁=a+c, m₀=b+d, T:
    * `E_k = n₁m₁/T`, `V_k = n₁n₂m₁m₀/(T²(T−1))`,
    * `χ² = (Σa − ΣE)² / ΣV` (1 df, no continuity correction —
    * documented, deterministic); the Mantel–Haenszel pooled odds ratio
    * `OR = Σ(ad/T) / Σ(bc/T)` rides along.
    *
    * ## Determinism / exactness
    * Cell counts are exact BIGINTs off ONE partial-aggregable
    * `groupBy(stratum)` with conditional sums; each stratum's E/V/ad/bc
    * terms are ONE mirrored double chain quantized micro at the site
    * (the [[graft.operators.Survival.logRank]] doctrine — same pooled-χ²
    * readout shape), so the sums are exact and the readouts are single
    * trailing IEEE chains. Single-row strata have zero variance (the
    * pinned T−1 convention); χ² is NULL when ΣV = 0, OR when Σbc = 0.
    *
    * ## Scale shape (100 TB)
    * The data-sized work is the one conditional-sum groupBy; everything
    * after lives on #strata rows and collapses to ONE output row
    * `(n, n_strata, sum_a, e_micro, v_micro, chi2, or_num_micro,
    * or_den_micro, or_mh)`. */
  def cmhTest(df: DataFrame, stratumCol: String, exposure: Column,
              outcome: Column): DataFrame = {
    val cells = df.select(col(stratumCol).as("_s"),
        exposure.as("_x"), outcome.as("_y"))
      .groupBy(col("_s"))
      .agg(sum(when(col("_x") && col("_y"), 1L).otherwise(0L)).as("_a"),
        sum(when(col("_x") && !col("_y"), 1L).otherwise(0L)).as("_b"),
        sum(when(!col("_x") && col("_y"), 1L).otherwise(0L)).as("_c"),
        sum(when(!col("_x") && !col("_y"), 1L).otherwise(0L)).as("_d"))
    val t = col("_a") + col("_b") + col("_c") + col("_d")
    val (n1, n2) = (col("_a") + col("_b"), col("_c") + col("_d"))
    val (m1, m0) = (col("_a") + col("_c"), col("_b") + col("_d"))
    val terms = cells.select(col("_a"), col("_b"), col("_c"), col("_d"),
      t.as("_t"),
      round(n1.cast("double") * m1.cast("double") / t.cast("double") * lit(1e6))
        .cast("long").as("_em"),
      when(t > 1L,
        round(n1.cast("double") * n2.cast("double") / t.cast("double") *
          m1.cast("double") / t.cast("double") *
          m0.cast("double") / (t - lit(1L)).cast("double") * lit(1e6))
          .cast("long")).otherwise(lit(0L)).as("_vm"),
      round(col("_a").cast("double") * col("_d").cast("double") /
        t.cast("double") * lit(1e6)).cast("long").as("_on"),
      round(col("_b").cast("double") * col("_c").cast("double") /
        t.cast("double") * lit(1e6)).cast("long").as("_od"))
    terms
      .agg(sum(col("_t")).as("n"), count(lit(1)).as("n_strata"),
        sum(col("_a")).as("sum_a"), sum(col("_em")).as("e_micro"),
        sum(col("_vm")).as("v_micro"), sum(col("_on")).as("or_num_micro"),
        sum(col("_od")).as("or_den_micro"))
      .select(col("n"), col("n_strata"), col("sum_a"), col("e_micro"),
        col("v_micro"), col("or_num_micro"), col("or_den_micro"),
        when(col("v_micro") > 0L,
          (col("sum_a").cast("double") - col("e_micro").cast("double") / lit(1e6)) *
            (col("sum_a").cast("double") - col("e_micro").cast("double") / lit(1e6)) /
            (col("v_micro").cast("double") / lit(1e6)))
          .as("chi2"),
        when(col("or_den_micro") > 0L,
          col("or_num_micro").cast("double") / col("or_den_micro").cast("double"))
          .as("or_mh"))
  }

  /** COCHRAN–ARMITAGE trend test — "does the positive rate move
    * MONOTONically with an ordered factor" (length bucket, quality
    * decile, model version), the 2×k sharpening of a bare χ²
    * independence read (χ² spends k−1 df on ANY deviation; CA puts all
    * power on the linear trend — the go/no-go read before acting on a
    * dose-response-looking table). Rows carry an integer trend SCORE
    * `s` and a boolean outcome; with N rows, R positives,
    * `S1 = Σs, S2 = Σs², Sr = Σ s·[positive]`, the exact-integer core is
    * `U = N·Sr − R·S1` (DECIMAL(38)) and
    * `z = U·√N / √(R·(N−R)·(N·S2 − S1²))` — the standard CA variance
    * `p(1−p)(Σnᵢsᵢ² − (Σnᵢsᵢ)²/N)` cross-multiplied so everything
    * under the radical is ONE exact integer; the single trailing IEEE
    * chain is mirrored verbatim by the oracle (the [[cmhTest]]
    * convention). NULL z when a class is empty or the score is constant.
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable aggregate over the data — five conditional
    * sums, no groupBy, no window, no join. Digit budget: N·S2 rides
    * DECIMAL(38) to N ≈ 10¹⁴ with single-digit scores (quantize scores
    * small — they are ordinal levels, not measurements). NULL-score or
    * NULL-outcome rows are excluded ([[kendallTauExact]]'s
    * pairwise-complete convention). Returns ONE row
    * `(n, r, s1, s2, sr, u, z)` with u as an exactly-converted
    * double. */
  def cochranArmitage(df: DataFrame, scoreCol: Column,
                      positive: Column): DataFrame = {
    val dec = "decimal(38,0)"
    df
      .where(scoreCol.isNotNull && positive.isNotNull)
      .select(scoreCol.cast("long").as("_s"),
        when(positive, 1L).otherwise(0L).as("_p"))
      .agg(count(lit(1)).as("_n"), sum(col("_p")).as("_r"),
        sum(col("_s")).as("_s1"),
        sum(col("_s").cast(dec) * col("_s")).as("_s2"),
        sum(col("_s") * col("_p")).as("_sr"))
      .select(col("_n"), col("_r"), col("_s1"), col("_s2"), col("_sr"),
        (col("_n").cast(dec) * col("_sr") - col("_r").cast(dec) * col("_s1"))
          .as("_u"),
        (col("_r").cast(dec) * (col("_n") - col("_r")) *
          (col("_n").cast(dec) * col("_s2") -
            col("_s1").cast(dec) * col("_s1"))).as("_den"))
      .select(col("_n").as("n"), col("_r").as("r"),
        col("_s1").as("s1"), col("_s2").cast("double").as("s2"),
        col("_sr").as("sr"), col("_u").cast("double").as("u"),
        when(col("_den") > 0,
          col("_u").cast("double") * sqrt(col("_n").cast("double")) /
            sqrt(col("_den").cast("double"))).as("z"))
  }

  /** MANN–WHITNEY U test with tie-corrected normal approximation — the
    * significance companion to [[aucExact]] (AUC says HOW WELL the score
    * separates the classes; U's z-score says whether the separation
    * beats chance at this sample size — the sign-off read before a
    * pipeline acts on an observed gap). Computed entirely on the VALUE
    * HISTOGRAM, no per-row rank: for a score value with count `t` and
    * `cum_before` rows below it, midrank algebra gives
    * `min+max = 2·cum_before + t + 1`, so
    * `u2 = Σ_values pos_cnt·(2·cum_before + t + 1)` (twice the
    * positives' midrank sum) and the tie term `T = Σ_values (t³ − t)`
    * both fall out of one histogram sweep. Readouts, all exact integers
    * until the single trailing IEEE chain:
    * `AUC = (u2 − n₁(n₁+1)) / (2n₁n₂)`,
    * Cliff's δ = (#(pos>neg) − #(pos<neg))/(n₁n₂)
    * = (u2 − n₁(n₁+1) − n₁n₂)/(n₁n₂) (the effect size — ties count 0),
    * and `z = (2U − n₁n₂) / √(n₁n₂·((n+1)n(n−1) − T) / (3n(n−1)))`
    * (the tie-corrected variance, no continuity correction —
    * documented, deterministic, oracle-mirrorable).
    *
    * ## Scale shape (100 TB)
    * The data-sized work is ONE partial-aggregable `groupBy(value)`
    * carrying (count, pos_count); cumulative counts ride the two-level
    * prefix sum over the histogram ([[ksTestExact]]'s shape — per-bucket
    * frames + a broadcast bucket-offset spine, nothing single-partition
    * that is data-sized). Digit budget: u2 ≤ n², T ≤ n³, and the
    * variance product n₁n₂·((n+1)n(n−1) − T) ≈ n⁵ rides DECIMAL(38) to
    * n ≈ 3·10⁷ — past that the three factors convert to double FIRST
    * (deterministic IEEE round-to-nearest on both engines), which the
    * readout does anyway. Returns ONE row
    * `(n_pos, n_neg, u2, t_ties, auc, cliffs_delta, z)` with u2/T as
    * exactly-converted doubles (the [[spearmanExact]] export
    * convention); auc/δ NULL when either class is empty, z additionally
    * NULL when all values tie (zero variance). */
  def mannWhitney(df: DataFrame, scoreCol: Column, positive: Column,
                  bucketOf: Column => Column,
                  checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    // NULL scores are excluded up front (they would land in n and the
    // tie terms but carry no orderable value — same contract as
    // kendallTauExact); a NULL `positive` counts as negative, which the
    // when/otherwise below already encodes
    val hist0 = df
      .where(scoreCol.isNotNull)
      .select(scoreCol.cast("long").as("_v"),
        when(positive, 1L).otherwise(0L).as("_p"))
      .groupBy(col("_v"))
      .agg(count(lit(1)).as("_t"), sum(col("_p")).as("_pc"))
      .withColumn("_b", bucketOf(col("_v")))
    // fans into the offset spine and the sweep — cut or the caller's
    // score expression re-evaluates per branch (the q170 lesson)
    val hist = if (checkpoint) hist0.localCheckpoint() else hist0
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy(col("_b")).agg(sum(col("_t")).as("_bt"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_off"))
    hist
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("_cb", col("_off") + coalesce(sum(col("_t")).over(wIn), lit(0L)))
      .agg(
        coalesce(sum(col("_pc")), lit(0L)).as("_n1"),
        coalesce(sum(col("_t")), lit(0L)).as("_n"),
        coalesce(sum(col("_pc").cast(dec) *
          (lit(2L) * col("_cb") + col("_t") + lit(1L))), lit(0).cast(dec)).as("_u2"),
        coalesce(sum(col("_t").cast(dec) * col("_t") * col("_t") - col("_t")),
          lit(0).cast(dec)).as("_tt"))
      .select(col("_n1"), (col("_n") - col("_n1")).as("_n2"), col("_n"),
        col("_u2"), col("_tt"),
        // 2U − n₁n₂ = #(pos>neg) − #(pos<neg): the shared numerator of δ and z
        (col("_u2") - col("_n1").cast(dec) * (col("_n1") + lit(1L))
          - col("_n1").cast(dec) * (col("_n") - col("_n1"))).as("_num"),
        // (n+1)n(n−1) − T: the tie-corrected variance core (≥ 0, = 0 iff all tied)
        ((col("_n").cast(dec) + lit(1L)) * col("_n") * (col("_n") - lit(1L))
          - col("_tt")).as("_a"))
      .select(col("_n1").as("n_pos"), col("_n2").as("n_neg"),
        col("_u2").cast("double").as("u2"),
        col("_tt").cast("double").as("t_ties"),
        when(col("_n1") > 0 && col("_n2") > 0,
          (col("_u2") - col("_n1").cast(dec) * (col("_n1") + lit(1L)))
            .cast("double") /
            (lit(2L).cast(dec) * col("_n1") * col("_n2")).cast("double"))
          .as("auc"),
        when(col("_n1") > 0 && col("_n2") > 0,
          col("_num").cast("double") /
            (col("_n1").cast(dec) * col("_n2")).cast("double"))
          .as("cliffs_delta"),
        when(col("_n1") > 0 && col("_n2") > 0 && col("_a") > 0,
          col("_num").cast("double") /
            sqrt((col("_n1").cast(dec) * col("_n2")).cast("double") *
              col("_a").cast("double") /
              (lit(3L).cast(dec) * col("_n") * (col("_n") - lit(1L)))
                .cast("double")))
          .as("z"))
  }

  /** KRUSKAL–WALLIS H test — the k-SAMPLE extension of [[mannWhitney]]
    * ("do these k cohorts draw the value from the same distribution",
    * the one-shot read before k·(k−1)/2 pairwise U tests): rank-based,
    * so it asks about stochastic ordering, not means. Computed entirely
    * on the (group, value) CELL HISTOGRAM, no per-row rank: with
    * `cum_before` and tie count `t` per value, midrank algebra gives the
    * DOUBLED group rank sum `2R_g = Σ_values c_{g,v}·(2·cum_before + t
    * + 1)` exactly; each group's term `⌊10⁶·(2R_g)²/n_g⌋` quantizes at
    * its site (pmod-subtract — exact floor on both engines) and the
    * integer term sum feeds the single trailing IEEE chain
    * `H = 3·(Σterm/10⁶)/(N(N+1)) − 3(N+1)` (the algebraic halving of
    * 12·ΣR²/n via doubled ranks) with the tie correction
    * `H' = H / (1 − ΣT/(N³−N))`, `T = Σ(t³−t)`.
    *
    * ## Scale shape (100 TB)
    * Data-sized work is ONE partial-aggregable `groupBy(group, value)`;
    * the value histogram re-aggregates the cells; cumulative counts ride
    * the two-level prefix sum ([[mannWhitney]]'s shape — per-bucket
    * frames + a broadcast bucket-offset spine); the per-group frame is
    * k rows. Digit budget: (2R_g)²·10⁶ ≤ 4N⁴·10⁶ rides DECIMAL(38) to
    * N ≈ 2·10⁷ — past that, drop the micro factor or convert to double
    * first (the [[mannWhitney]] convention). NULL-input rows excluded.
    * Returns ONE row `(n, k_groups, t_ties, h, h_tie)`; h/h_tie NULL
    * when k < 2 or N < 2, h_tie additionally NULL when all values tie
    * (the correction hits 0). */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: Column,
                    bucketOf: Column => Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .where(valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_v"))
      .groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint() // fans into the value histogram and the rank join
    val hist = cells.groupBy(col("_v")).agg(sum(col("_c")).as("_t"))
      .withColumn("_b", bucketOf(col("_v")))
      .localCheckpoint() // fans into offsets, the sweep, and the tie term
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy(col("_b")).agg(sum(col("_t")).as("_bt"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_off"))
    val vcum = hist
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("_cb", col("_off") + coalesce(sum(col("_t")).over(wIn), lit(0L)))
      .select(col("_v"), col("_t"), col("_cb"))
    val perGroup = cells.join(vcum, Seq("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_c")).as("_ng"),
        sum(col("_c").cast(dec) *
          (lit(2L) * col("_cb") + col("_t") + lit(1L))).as("_r2"))
      // ⌊10⁶·(2R_g)²/n_g⌋: subtract the nonneg mod so the decimal
      // division is exact (both operands positive — floor ≡ truncate)
      .select(col("_ng"),
        expr("""CAST((_r2 * _r2 * 1000000 -
                  pmod(_r2 * _r2 * 1000000, CAST(_ng AS DECIMAL(38,0))))
                / _ng AS DECIMAL(38,0))""").as("_tg"))
    val ties = hist.agg(
      coalesce(sum(col("_t").cast(dec) * col("_t") * col("_t") - col("_t")),
        lit(0).cast(dec)).as("_tt"))
    perGroup
      .agg(sum(col("_ng")).as("_n"), count(lit(1)).as("_k"),
        sum(col("_tg")).as("_st"))
      .crossJoin(broadcast(ties)) // 1-row scalar attach
      .select(col("_n").as("n"), col("_k").as("k_groups"),
        col("_tt").cast("double").as("t_ties"),
        when(col("_k") >= 2L && col("_n") >= 2L,
          lit(3.0) * (col("_st").cast("double") / lit(1000000.0)) /
            (col("_n").cast(dec) * (col("_n") + lit(1L))).cast("double") -
            lit(3.0) * (col("_n") + lit(1L)).cast("double")).as("h"),
        when(col("_k") >= 2L && col("_n") >= 2L &&
          (col("_n").cast(dec) * col("_n") * col("_n") - col("_n")) > col("_tt"),
          (lit(3.0) * (col("_st").cast("double") / lit(1000000.0)) /
            (col("_n").cast(dec) * (col("_n") + lit(1L))).cast("double") -
            lit(3.0) * (col("_n") + lit(1L)).cast("double")) /
            (lit(1.0) - col("_tt").cast("double") /
              (col("_n").cast(dec) * col("_n") * col("_n") - col("_n"))
                .cast("double"))).as("h_tie"))
  }

  /** JONCKHEERE–TERPSTRA ordered-alternative trend test (Jonckheere
    * 1954; Hollander & Wolfe §6.2) — the k-sample member [[kruskalWallis]]
    * deliberately isn't: where KW asks "do the k cohorts differ AT ALL",
    * JT puts all its power on the ORDERED alternative θ₁ ≤ θ₂ ≤ … ≤ θₖ
    * (dose-response: does the value tend UP as the ordered group index
    * rises) — [[cochranArmitage]]'s question for a continuous response.
    * J = Σ_{i<j} U_ij sums the pairwise Mann–Whitney counts over ordered
    * group pairs; ties count half, so the DOUBLED statistic
    * `2J = Σ_cells c_{g,v}·(2·LB_{g,v} + LE_{g,v})` (LB = rows in
    * LOWER-ordered groups with SMALLER value, LE = equal-value rows in
    * lower groups) stays exact-integer — the doubled-midrank doctrine.
    *
    * ## Exactness
    * Everything through the centered numerator is integer: null mean
    * E[2J] = (N² − Σn_g²)/2, so `num2 = 2·(2J) − (N² − Σn_g²)` =
    * 4·(J − E[J]) exactly. The two z denominators are single trailing
    * IEEE chains mirrored verbatim by the oracle: the no-tie variance
    * 72·Var = N²(2N+3) − Σn_g²(2n_g+3) is exact-integer under the sqrt;
    * the tie-corrected variance (H&W 6.19) A/72 + B/(36N(N−1)(N−2)) +
    * C/(8N(N−1)) has exact-integer A, C and group/tie factors, with B's
    * two factors multiplied as DOUBLES (each ≤ N³ is exact in DECIMAL(38)
    * to N ≈ 2·10¹²; their product would overflow at N ≈ 2·10⁶ — the
    * double product is the budget-free form and both engines compute it
    * identically).
    *
    * ## Scale shape (100 TB)
    * Data-sized work is ONE partial-aggregable `groupBy(group, value)`.
    * The DENSE (group × distinct-value) frame is k·V rows — k cohorts
    * are few and V is bounded by the caller's quantization, both
    * model-sized next to the data. Within-group cumulatives ride the
    * two-level prefix-sum scheme partitioned by (group, bucket) with a
    * k·buckets broadcast offset spine; the cross-group LB/LE windows
    * partition by VALUE (≤ k rows each). NULL group/value rows excluded.
    * Returns ONE row `(n, k_groups, j2, num2, z, z_tie)`; z NULL when
    * k < 2 or the variance degenerates, z_tie additionally NULL when
    * N < 3 (the B term divides by N−2). */
  def jonckheereTerpstra(df: DataFrame, groupCol: Column, valueCol: Column,
                         bucketOf: Column => Column,
                         checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    def cut(d: DataFrame): DataFrame = if (checkpoint) d.localCheckpoint() else d
    val cells = cut(df
      .where(valueCol.isNotNull && groupCol.isNotNull)
      .select(groupCol.cast("long").as("_g"), valueCol.cast("long").as("_v"))
      .groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_c"))) // fans into groups, hist, dense, ng
    val groups = cells.select(col("_g")).distinct() // k rows
    val hist = cut(cells.groupBy(col("_v")).agg(sum(col("_c")).as("_t"))
      .withColumn("_b", bucketOf(col("_v")))) // fans into dense, offsets, ties
    // dense k·V frame: every (group, value) cell, absent ones at 0 —
    // LB/LE need cumulatives evaluated at values the group may not have
    val dense = hist.select(col("_v"), col("_b"))
      .crossJoin(broadcast(groups))
      .join(cells, Seq("_g", "_v"), "left")
      .na.fill(0L, Seq("_c"))
    // within-group cumulative-below: two-level prefix sum per (g, bucket)
    val wIn = Window.partitionBy(col("_g"), col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOffG = Window.partitionBy(col("_g")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = dense.groupBy(col("_g"), col("_b")).agg(sum(col("_c")).as("_bt"))
      .select(col("_g"), col("_b"),
        coalesce(sum(col("_bt")).over(wOffG), lit(0L)).as("_off"))
    val cum = dense
      .join(broadcast(offsets), Seq("_g", "_b"))
      .withColumn("_cb", col("_off") + coalesce(sum(col("_c")).over(wIn), lit(0L)))
    // cross-group sweep at fixed value: ≤ k rows per partition
    val wV = Window.partitionBy(col("_v")).orderBy(col("_g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val s2 = cum
      .withColumn("_le", coalesce(sum(col("_c")).over(wV), lit(0L)))
      .withColumn("_lb", coalesce(sum(col("_cb")).over(wV), lit(0L)))
      .agg(coalesce(sum(col("_c").cast(dec) *
        (lit(2L) * col("_lb") + col("_le"))), lit(0).cast(dec)).as("_s2"))
    val ga = cells.groupBy(col("_g")).agg(sum(col("_c")).as("_ng"))
      .agg(sum(col("_ng")).as("_n"), count(lit(1)).as("_k"),
        sum(col("_ng").cast(dec) * col("_ng")).as("_sn2"),
        sum(col("_ng").cast(dec) * col("_ng") *
          (lit(2L) * col("_ng") + lit(3L))).as("_sn23"),
        sum(col("_ng").cast(dec) * (col("_ng") - lit(1L)) *
          (lit(2L) * col("_ng") + lit(5L))).as("_g25"),
        sum(col("_ng").cast(dec) * (col("_ng") - lit(1L)) *
          (col("_ng") - lit(2L))).as("_g3"),
        sum(col("_ng").cast(dec) * (col("_ng") - lit(1L))).as("_g2"))
    val ta = hist.agg(
      coalesce(sum(col("_t").cast(dec) * (col("_t") - lit(1L)) *
        (lit(2L) * col("_t") + lit(5L))), lit(0).cast(dec)).as("_t25"),
      coalesce(sum(col("_t").cast(dec) * (col("_t") - lit(1L)) *
        (col("_t") - lit(2L))), lit(0).cast(dec)).as("_t3"),
      coalesce(sum(col("_t").cast(dec) * (col("_t") - lit(1L))),
        lit(0).cast(dec)).as("_t2"))
    ga.crossJoin(broadcast(s2)).crossJoin(broadcast(ta)) // 1-row attaches
      .select(col("_n"), col("_k"), col("_s2"),
        (lit(2L).cast(dec) * col("_s2") -
          (col("_n").cast(dec) * col("_n") - col("_sn2"))).as("_num2"),
        // 72·Var₀ and the tie-corrected variance pieces (H&W 6.19)
        (col("_n").cast(dec) * col("_n") * (lit(2L) * col("_n") + lit(3L)) -
          col("_sn23")).as("_v72"),
        (col("_n").cast(dec) * (col("_n") - lit(1L)) *
          (lit(2L) * col("_n") + lit(5L)) - col("_g25") - col("_t25")).as("_a"),
        col("_g3"), col("_t3"), col("_g2"), col("_t2"))
      .withColumn("_vt", // guarded: the B/C denominators need n >= 3
        when(col("_n") >= 3L,
          col("_a").cast("double") / lit(72.0) +
            col("_g3").cast("double") * col("_t3").cast("double") /
              (lit(36.0) * (col("_n").cast(dec) * (col("_n") - lit(1L)) *
                (col("_n") - lit(2L))).cast("double")) +
            col("_g2").cast("double") * col("_t2").cast("double") /
              (lit(8.0) * (col("_n").cast(dec) * (col("_n") - lit(1L)))
                .cast("double"))))
      .select(col("_n").as("n"), col("_k").as("k_groups"),
        col("_s2").cast("double").as("j2"),
        col("_num2").cast("double").as("num2"),
        when(col("_k") >= 2L && col("_v72") > 0,
          col("_num2").cast("double") /
            (lit(4.0) * sqrt(col("_v72").cast("double") / lit(72.0)))).as("z"),
        when(col("_k") >= 2L && col("_n") >= 3L && col("_vt") > 0,
          col("_num2").cast("double") /
            (lit(4.0) * sqrt(col("_vt")))).as("z_tie"))
  }

  /** MOOD'S SCALE (dispersion) TEST — "do the two cohorts differ in
    * SPREAD around the common center" (Mood 1954), the rank-based
    * companion [[mannWhitney]] (location) and [[brownForsythe]]
    * (parametric spread) leave open: scores are squared centered
    * midranks, so a cohort whose values crowd the EXTREMES of the
    * pooled ordering scores high. Doubled-midrank exact: with
    * `2r̄(v) = 2·cum_before + t + 1`, the centered score
    * `d(v) = 2r̄ − (N+1) = 2·cb + t − N` makes `4·a(v) = d²` integer,
    * so `T4 = Σ_pos c·d²` is the exact quadrupled statistic.
    *
    * The z is the PERMUTATION-EXACT standardization — for a linear rank
    * statistic with fixed scores, E[T] = n₁·ā and
    * Var[T] = n₁n₂ Σ(a−ā)² / (N(N−1)) hold EXACTLY under ties (no
    * textbook tie-correction approximation): with `A = Σ t·d²`,
    * `B = Σ t·d⁴`, the centered numerator `num = N·T4 − n₁·A` is an
    * exact integer and `z = num / √(n₁·n₂·(N·B − A²)/(N−1))` is a
    * single trailing IEEE chain mirrored verbatim by the oracle.
    *
    * ## Scale shape (100 TB)
    * [[mannWhitney]]'s exact shape: ONE partial-aggregable value
    * histogram, the two-level bucket prefix sum, one final aggregate —
    * no data-sized window, no join beyond 1-row attaches. Digit budget:
    * N·B ≤ 16N⁶ rides DECIMAL(38) to N ≈ 8·10⁵; past that the variance
    * product moves to the double side (the z is double anyway) —
    * documented, not silent. NULL scores excluded; NULL `positive`
    * counts negative. Returns ONE row `(n_pos, n_neg, t4, num, z)`;
    * z NULL when either cohort is empty, N < 2, or the score variance
    * degenerates (all values tied). */
  def moodScaleTest(df: DataFrame, scoreCol: Column, positive: Column,
                    bucketOf: Column => Column,
                    checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    val hist0 = df
      .where(scoreCol.isNotNull)
      .select(scoreCol.cast("long").as("_v"),
        when(positive, 1L).otherwise(0L).as("_p"))
      .groupBy(col("_v"))
      .agg(count(lit(1)).as("_t"), sum(col("_p")).as("_pc"))
      .withColumn("_b", bucketOf(col("_v")))
    val hist = if (checkpoint) hist0.localCheckpoint() else hist0
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy(col("_b")).agg(sum(col("_t")).as("_bt"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_off"))
    val tot = hist.agg(coalesce(sum(col("_t")), lit(0L)).as("_n"))
    hist
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("_cb", col("_off") + coalesce(sum(col("_t")).over(wIn), lit(0L)))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      .withColumn("_d", lit(2L) * col("_cb") + col("_t") - col("_n"))
      .agg(
        coalesce(sum(col("_pc")), lit(0L)).as("_n1"),
        first(col("_n")).as("_nn"),
        coalesce(sum(col("_pc").cast(dec) * col("_d") * col("_d")),
          lit(0).cast(dec)).as("_t4"),
        coalesce(sum(col("_t").cast(dec) * col("_d") * col("_d")),
          lit(0).cast(dec)).as("_a"),
        coalesce(sum(col("_t").cast(dec) * col("_d") * col("_d") *
          col("_d") * col("_d")), lit(0).cast(dec)).as("_bb"))
      .select(col("_n1"), (col("_nn") - col("_n1")).as("_n2"), col("_nn"),
        col("_t4"), col("_a"), col("_bb"),
        (col("_nn").cast(dec) * col("_t4") - col("_n1").cast(dec) * col("_a"))
          .as("_num"),
        (col("_nn").cast(dec) * col("_bb") - col("_a") * col("_a")).as("_sv"))
      .select(col("_n1").as("n_pos"), col("_n2").as("n_neg"),
        col("_t4").cast("double").as("t4"),
        col("_num").cast("double").as("num"),
        when(col("_n1") > 0L && col("_n2") > 0L && col("_nn") >= 2L &&
            col("_sv") > 0,
          col("_num").cast("double") /
            sqrt(col("_n1").cast("double") * col("_n2").cast("double") *
              col("_sv").cast("double") /
              (col("_nn") - lit(1L)).cast("double"))).as("z"))
  }

  /** ANSARI–BRADLEY scale test — the rank-from-both-ends dispersion
    * read ([[moodScaleTest]]'s classical sibling): scores fold the
    * pooled ranking inward, `a(r) = min(r, N+1−r)`, so a COMPACT cohort
    * (crowding the center) scores HIGH and a dispersed one LOW —
    * z > 0 reads "positives are LESS spread".
    *
    * ## Ties, exactly
    * The folded score is piecewise linear with a kink at the center, so
    * a tie block straddling the center breaks the midrank shortcut
    * (unlike every other rank statistic here). The exact treatment sums
    * the folded arithmetic series per tie block in closed form —
    * `2S(v) = [k(k+1) − (lo−1)lo] + [2M(hi−j+1) − (hi(hi+1) − (j−1)j)]`
    * with `lo..hi` the block's rank range, `M = N+1`, `k/j` the split at
    * the kink — all integers. The per-row tie-AVERAGED score `S/t` then
    * quantizes ONCE at its site: `a'(v) = ⌊10⁶·2S / (2t)⌋` (nonneg →
    * DIV is floor on both engines). The z is the PERMUTATION-EXACT
    * standardization FOR THESE QUANTIZED SCORES (the fixed-score moment
    * identity of [[moodScaleTest]] — exact under ties by construction,
    * the micro floor being part of the documented score family, not an
    * approximation of it).
    *
    * ## Scale shape (100 TB)
    * [[mannWhitney]]'s exact shape: one partial-aggregable value
    * histogram, the two-level bucket prefix sum, one final aggregate.
    * Digit budget: 10⁶·2S ≤ 10⁶·N² needs BIGINT → N ≤ 3·10⁶ (quantize
    * coarser past that). NULL scores excluded; NULL `positive` counts
    * negative. Returns ONE row `(n_pos, n_neg, t_q, num, z)`; z NULL
    * when either cohort is empty, N < 2, or the scores degenerate. */
  def ansariBradley(df: DataFrame, scoreCol: Column, positive: Column,
                    bucketOf: Column => Column,
                    checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    val hist0 = df
      .where(scoreCol.isNotNull)
      .select(scoreCol.cast("long").as("_v"),
        when(positive, 1L).otherwise(0L).as("_p"))
      .groupBy(col("_v"))
      .agg(count(lit(1)).as("_t"), sum(col("_p")).as("_pc"))
      .withColumn("_b", bucketOf(col("_v")))
    val hist = if (checkpoint) hist0.localCheckpoint() else hist0
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy(col("_b")).agg(sum(col("_t")).as("_bt"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_off"))
    val tot = hist.agg(coalesce(sum(col("_t")), lit(0L)).as("_n"))
    hist
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("_cb", col("_off") + coalesce(sum(col("_t")).over(wIn), lit(0L)))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      // folded block sum, doubled: lo..hi split at the kink M DIV 2
      .withColumn("_lo", col("_cb") + lit(1L))
      .withColumn("_hi", col("_cb") + col("_t"))
      .withColumn("_m", col("_n") + lit(1L))
      .withColumn("_k", least(col("_hi"), expr("_m DIV 2")))
      .withColumn("_j", greatest(col("_lo"), expr("_m DIV 2 + 1")))
      .withColumn("_s2",
        when(col("_k") >= col("_lo"),
          col("_k") * (col("_k") + lit(1L)) -
            (col("_lo") - lit(1L)) * col("_lo")).otherwise(lit(0L)) +
        when(col("_hi") >= col("_j"),
          lit(2L) * col("_m") * (col("_hi") - col("_j") + lit(1L)) -
            (col("_hi") * (col("_hi") + lit(1L)) -
              (col("_j") - lit(1L)) * col("_j"))).otherwise(lit(0L)))
      // micro-quantized tie-averaged score (nonneg → DIV is floor)
      .withColumn("_aq", expr("(1000000 * _s2) DIV (2 * _t)"))
      .agg(
        coalesce(sum(col("_pc")), lit(0L)).as("_n1"),
        first(col("_n")).as("_nn"),
        coalesce(sum(col("_pc").cast(dec) * col("_aq")), lit(0).cast(dec)).as("_tq"),
        coalesce(sum(col("_t").cast(dec) * col("_aq")), lit(0).cast(dec)).as("_a"),
        coalesce(sum(col("_t").cast(dec) * col("_aq") * col("_aq")),
          lit(0).cast(dec)).as("_bb"))
      .select(col("_n1"), (col("_nn") - col("_n1")).as("_n2"), col("_nn"),
        col("_tq"),
        (col("_nn").cast(dec) * col("_tq") - col("_n1").cast(dec) * col("_a"))
          .as("_num"),
        (col("_nn").cast(dec) * col("_bb") - col("_a") * col("_a")).as("_sv"))
      .select(col("_n1").as("n_pos"), col("_n2").as("n_neg"),
        col("_tq").cast("double").as("t_q"),
        col("_num").cast("double").as("num"),
        when(col("_n1") > 0L && col("_n2") > 0L && col("_nn") >= 2L &&
            col("_sv") > 0,
          col("_num").cast("double") /
            sqrt(col("_n1").cast("double") * col("_n2").cast("double") *
              col("_sv").cast("double") /
              (col("_nn") - lit(1L)).cast("double"))).as("z"))
  }

  /** MOOD'S MEDIAN TEST — the quick k-sample member of the cell-histogram
    * family ("do the k cohorts split the same way around the GRAND
    * median"): coarser than [[kruskalWallis]] (it only reads
    * above/below, so it shrugs at outliers and ordinal censoring — the
    * reason pipelines still run it), exact to the last integer here.
    * The grand LOWER median is the order statistic `cum ≥ (N+1) DIV 2`
    * read off the value histogram ([[brownForsythe]]'s per-group median
    * machinery applied globally); the 2×k table's χ² quantizes per cell
    * as `⌊10⁶·(N·O − R·C)² / (N·R·C)⌋` (all factors nonneg integers, so
    * floor ≡ truncate on both engines) and the micro terms sum exactly.
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable `groupBy(group, value)`; the histogram
    * re-aggregates the cells; the median read rides the two-level
    * prefix-sum scheme (bucketed windows + a broadcast offset spine);
    * the 2×k table is k rows. Digit budget: (N·O)²·10⁶ rides
    * DECIMAL(38) to N ≈ 2·10⁷ — quantize coarser past that. NULL
    * group/value rows excluded. Returns ONE row `(n, k_groups,
    * median_q, above_total, chi2_micro)`; chi2_micro NULL when k < 2 or
    * every value sits on one side of the median (a degenerate table). */
  def moodMedianTest(df: DataFrame, groupCol: String, valueCol: Column,
                     bucketOf: Column => Column,
                     checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    def cut(d: DataFrame): DataFrame = if (checkpoint) d.localCheckpoint() else d
    val cells = cut(df
      .where(valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_v"))
      .groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_c"))) // fans into hist and the 2×k table
    val hist = cut(cells.groupBy(col("_v")).agg(sum(col("_c")).as("_t"))
      .withColumn("_b", bucketOf(col("_v")))) // fans into offsets + median
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy(col("_b")).agg(sum(col("_t")).as("_bt"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_off"))
    val tot = hist.agg(coalesce(sum(col("_t")), lit(0L)).as("_n"))
    val med = hist
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("_cum",
        col("_off") + coalesce(sum(col("_t")).over(wIn), lit(0L)) + col("_t"))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      .where(col("_cum") >= expr("(_n + 1) DIV 2"))
      .agg(min(col("_v")).as("_m")) // grand lower median, 1 row
    val pg = cells.crossJoin(broadcast(med))
      .groupBy(col("_g"))
      .agg(sum(col("_c")).as("_ng"),
        sum(when(col("_v") > col("_m"), col("_c")).otherwise(lit(0L))).as("_ag"))
    val totals = pg.agg(sum(col("_ng")).as("_nn"), count(lit(1)).as("_k"),
      sum(col("_ag")).as("_a"))
    // per-group 2-cell χ² micro terms, guarded: both margins must be
    // nonempty (the when short-circuits the divisions)
    def term(o: Column, r: Column, ng: Column, nn: Column): Column = {
      val d = nn.cast(dec) * o - r.cast(dec) * ng
      val x = d * d * lit(1000000L)
      val den = nn.cast(dec) * r * ng
      // divisible by construction after the pmod subtract → the decimal
      // division is exact and the trailing cast just drops the .0 scale
      ((x - pmod(x, den)) / den).cast(dec)
    }
    pg.crossJoin(broadcast(totals)).crossJoin(broadcast(med))
      .withColumn("_tm",
        when(col("_a") > 0L && col("_a") < col("_nn") && col("_k") >= 2L,
          term(col("_ag"), col("_a"), col("_ng"), col("_nn")) +
            term(col("_ng") - col("_ag"), col("_nn") - col("_a"),
              col("_ng"), col("_nn"))))
      .agg(first(col("_nn")).as("_n"), first(col("_k")).as("_kk"),
        first(col("_m")).as("_med"), first(col("_a")).as("_ab"),
        sum(col("_tm")).as("_chi"))
      .select(col("_n").as("n"), col("_kk").as("k_groups"),
        col("_med").as("median_q"), col("_ab").as("above_total"),
        col("_chi").cast("long").as("chi2_micro"))
  }

  /** ONE-WAY ANOVA F — the parametric companion to [[kruskalWallis]]
    * ("do the k cohort MEANS differ", where KW asks about the whole
    * distribution): with per-group exact sums `S_g` over quantized
    * values, the between/within sums of squares come out of the usual
    * identity `SSB = Σ S_g²/n_g − S²/N`, `SSW = Σy² − Σ S_g²/n_g`.
    * Every division quantizes ONCE at its site — `⌊10⁶·S_g²/n_g⌋` per
    * group and `⌊10⁶·S²/N⌋` once (pmod-subtract; numerators are ≥ 0 so
    * floor ≡ truncate on both engines) — then SSB/SSW are pure integer
    * micro sums and `F = (SSB/(k−1)) / (SSW/(N−k))` is the single
    * trailing IEEE chain, mirrored verbatim.
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable `groupBy(group)` (k-row result), one k-row
    * final aggregate — no window, no join beyond the 1-row attach.
    * Digit budget: S_g²·10⁶ ≤ N²·y²·10⁶ rides DECIMAL(38) to
    * N·|y| ≈ 10¹⁶ (quantize y accordingly). NULL-input rows excluded.
    * Returns ONE row `(n, k_groups, ssb_micro, ssw_micro, f)`; f NULL
    * when k < 2, N ≤ k, or SSW = 0 (all groups internally constant). */
  def anovaOneWay(df: DataFrame, groupCol: String,
                  valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val perGroup = df
      .where(valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_y"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_ng"), sum(col("_y")).as("_sg"),
        sum(col("_y").cast(dec) * col("_y")).as("_ssg"))
      // ⌊10⁶·S_g²/n_g⌋ at the site (S_g² ≥ 0, floor ≡ truncate)
      .select(col("_ng"), col("_sg"), col("_ssg"),
        expr("""CAST((_sg * _sg * 1000000 -
                  pmod(_sg * _sg * 1000000, CAST(_ng AS DECIMAL(38,0))))
                / _ng AS DECIMAL(38,0))""").as("_tg"))
    perGroup
      .agg(sum(col("_ng")).as("_n"), count(lit(1)).as("_k"),
        sum(col("_sg")).as("_s"), sum(col("_ssg")).as("_ss"),
        sum(col("_tg")).as("_st"))
      .select(col("_n"), col("_k"), col("_ss"), col("_st"),
        // ⌊10⁶·S²/N⌋, the one grand-term division
        expr("""CAST((_s * _s * 1000000 -
                  pmod(_s * _s * 1000000, CAST(_n AS DECIMAL(38,0))))
                / _n AS DECIMAL(38,0))""").as("_tn"))
      .select(col("_n").as("n"), col("_k").as("k_groups"),
        (col("_st") - col("_tn")).cast("double").as("ssb_micro"),
        (col("_ss") * lit(1000000L) - col("_st")).cast("double").as("ssw_micro"),
        when(col("_k") >= 2L && col("_n") > col("_k") &&
          (col("_ss") * lit(1000000L) - col("_st")) > 0,
          ((col("_st") - col("_tn")).cast("double") /
            (col("_k") - lit(1L)).cast("double")) /
            ((col("_ss") * lit(1000000L) - col("_st")).cast("double") /
              (col("_n") - col("_k")).cast("double"))).as("f"))
  }

  /** FRIEDMAN test (+ Kendall's W) — "do the k treatments rank
    * consistently across matched blocks" (languages across length
    * buckets, model versions across eval slices): the repeated-measures
    * companion to [[kruskalWallis]] — KW pools rows, Friedman ranks
    * WITHIN each block, so block-to-block level shifts cancel. Input is
    * one value per (block, group) CELL (callers aggregate to cells;
    * duplicate cell rows collapse to their MIN — deterministic);
    * incomplete blocks (missing any group) are dropped, the standard
    * complete-design contract. DOUBLED midranks `2r = 2·below + ties
    * + 1` within each block are exact integers from a k-row window;
    * with `D_g = 2R_g − n(k+1)` and `Den₂ = Σ(2r)² − n·k·(k+1)²`, the
    * tie-corrected statistic is `χ² = (k−1)·ΣD_g²/Den₂` — one IEEE
    * division of exact integers (the 4× rescaling of the classic form —
    * both engines compute the identical integers), and Kendall's
    * concordance `W = χ²/(n(k−1))` is a free readout.
    *
    * ## Scale shape (100 TB)
    * Cells are (#blocks × k) rows — the caller's partial-aggregable
    * rollup did the data-sized work (the [[theilSenSlope]] convention);
    * the rank window partitions by block over k-row frames; the group
    * rollup is one k-row aggregate. Returns ONE row `(n_blocks,
    * k_groups, chi2, kendalls_w)`; NULL statistics when n = 0, k < 2,
    * or every block is internally tied (Den₂ = 0). */
  def friedmanTest(df: DataFrame, blockCol: String, groupCol: String,
                   valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .where(col(blockCol).isNotNull && col(groupCol).isNotNull &&
        valueCol.isNotNull)
      .groupBy(col(blockCol).as("_b"), col(groupCol).as("_g"))
      .agg(min(valueCol.cast("long")).as("_y"))
      .localCheckpoint() // fans into the k-probe and the rank pass
    val k = cells.select(col("_g")).distinct().count() // model probe
    val complete = cells
      .withColumn("_kb", count(lit(1)).over(Window.partitionBy(col("_b"))))
      .where(col("_kb") === k)
    val wB = Window.partitionBy(col("_b"))
    // doubled midrank within the block: 2·#{below} + #{ties} + 1
    val ranked = complete
      .withColumn("_below", count(lit(1)).over(
        Window.partitionBy(col("_b")).orderBy(col("_y"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("_ties", count(lit(1)).over(
        Window.partitionBy(col("_b"), col("_y"))))
      .select(col("_b"), col("_g"),
        (lit(2L) * col("_below") + col("_ties") + lit(1L)).as("_r2"))
    val perGroup = ranked.groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_r2")).as("_rg2"),
        sum(col("_r2").cast(dec) * col("_r2")).as("_sq"))
    perGroup
      .agg(max(col("_n")).as("_n"), count(lit(1)).as("_k"),
        sum(col("_sq")).as("_ssq"),
        // Σ D_g² with D_g = 2R_g − n(k+1): k-row exact arithmetic
        sum((col("_rg2").cast(dec) - col("_n").cast(dec) * (lit(k) + lit(1L))) *
          (col("_rg2").cast(dec) - col("_n").cast(dec) * (lit(k) + lit(1L))))
          .as("_dd"))
      .select(col("_n").as("n_blocks"), col("_k").as("k_groups"),
        col("_dd"), col("_ssq"),
        (col("_ssq") - col("_n").cast(dec) * col("_k") *
          (col("_k") + lit(1L)) * (col("_k") + lit(1L))).as("_den"))
      .select(col("n_blocks"), col("k_groups"),
        when(col("n_blocks") > 0L && col("k_groups") >= 2L && col("_den") > 0,
          ((col("k_groups") - lit(1L)).cast(dec) * col("_dd")).cast("double") /
            col("_den").cast("double")).as("chi2"))
      .withColumn("kendalls_w",
        when(col("chi2").isNotNull,
          col("chi2") / (col("n_blocks") * (col("k_groups") - lit(1L)))
            .cast("double")))
  }

  /** BROWN–FORSYTHE homogeneity-of-variance test — "can I trust a
    * pooled-variance read (q233's ANOVA F) across these cohorts at
    * all": one-way ANOVA on the absolute deviations from each group's
    * MEDIAN (Brown & Forsythe 1974 — the median variant of Levene,
    * robust to non-normality). Exact end to end: the per-group median
    * is the LOWER MEDIAN order statistic (the ⌈n_g/2⌉-th smallest — an
    * actual data element, deterministic) read off the (group, value)
    * cell histogram, `z = |y − med_g|` is integer, and the F readout is
    * [[anovaOneWay]] verbatim (site-quantized micro floors, one
    * trailing IEEE chain).
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable `groupBy(group, value)` builds the cell
    * histogram; the median scan is a window over CELLS partitioned by
    * group (value-universe-sized per group, never row-sized); medians
    * join back as a k-row broadcast; then [[anovaOneWay]]'s single
    * groupBy. NULL-input rows excluded. Returns [[anovaOneWay]]'s row
    * `(n, k_groups, ssb_micro, ssw_micro, f)` over the deviations. */
  def brownForsythe(df: DataFrame, groupCol: String,
                    valueCol: Column): DataFrame = {
    val rows = df
      .where(valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_y"))
      .localCheckpoint() // fans into the median build and the deviation scan
    val wCum = Window.partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("_g"))
    val medians = rows
      .groupBy(col("_g"), col("_y").as("_v"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
      // lower median: the smallest v whose cumulative count reaches
      // ceil(n/2) = (n+1) DIV 2
      .where(col("_cum") >= expr("(_n + 1) DIV 2"))
      .groupBy(col("_g"))
      .agg(min(col("_v")).as("_med"))
    anovaOneWay(
      rows.join(broadcast(medians), Seq("_g")),
      "_g", abs(col("_y") - col("_med")))
  }

  /** AUTOCORRELATION of an aggregated time series at a fixed lag —
    * [[pearsonExact]] composed over the series' self-join: pairs are the
    * (t, t+lag) steps where BOTH exist (gaps drop the pair — the "na.or
    * complete" convention, deterministic and oracle-mirrorable), so
    * seasonality probes ("does 4-hourly traffic repeat daily?") come out
    * of the same exact DECIMAL(38) moment machinery. Callers pass the
    * series ALREADY aggregated to (step, integer value) — the step
    * universe is time-span-sized, not data-sized.
    *
    * ## Scale shape (100 TB)
    * One equi-join of the step-universe table against its shifted self
    * (AQE broadcasts it when small), then the single-aggregate moment
    * pass. Returns ONE row `(lag, n, cov_n, var_xn, var_yn, r)`. */
  def autocorrAtLag(series: DataFrame, stepCol: Column, valueCol: Column,
                    lagSteps: Long): DataFrame = {
    require(lagSteps >= 1L, s"lagSteps must be >= 1, got $lagSteps")
    val s = series.select(stepCol.cast("long").as("_t"), valueCol.cast("long").as("_v"))
    val shifted = s.select((col("_t") - lit(lagSteps)).as("_t"), col("_v").as("_v2"))
    pearsonExact(s.join(shifted, Seq("_t")), col("_v"), col("_v2"))
      .select(lit(lagSteps).as("lag"), col("n"), col("cov_n"),
        col("var_xn"), col("var_yn"), col("r"))
  }

  /** 1-D WASSERSTEIN-1 (earth mover) distance between the positive and
    * negative cohorts' score distributions — the drift number with UNITS
    * ([[graft.operators.LmScore.jensenShannon]] and PSI are bounded and
    * unitless; W₁ answers "by how many score points has the
    * distribution moved", the quantity a retraining trigger thresholds
    * on). For empirical CDFs on integers,
    * `W₁ = ∫|F₁−F₂| dx = Σᵢ |F₁(vᵢ)−F₂(vᵢ)|·(vᵢ₊₁−vᵢ)` over the sorted
    * distinct values; with `D(v) = n₂·C₁(v) − n₁·C₂(v)` (inclusive
    * cohort cumulatives, exact integers) the numerator
    * `num = Σ |D(v)|·gap(v)` is an exact DECIMAL(38) sum and
    * `W₁ = num/(n₁·n₂)` is the single trailing IEEE division.
    *
    * ## Scale shape (100 TB)
    * [[moodScaleTest]]'s exact shape: ONE partial-aggregable value
    * histogram, the two-level bucket prefix sum (within-bucket window +
    * a bucket-count-sized offsets spine), one final aggregate. The
    * NEXT-value gap needs no data-sized window either: within a bucket
    * it is a bucket-partitioned `lead`; across the boundary it is the
    * next bucket's min value, carried on the same broadcast spine
    * (requires `bucketOf` monotone in the value, which `shiftright`
    * is). Digit budget: |D| ≤ n₁·n₂ ≤ N²/4 times the value span rides
    * DECIMAL(38) to N·√span ≈ 10¹⁹. NULL scores excluded; NULL
    * `positive` counts negative. Returns ONE row
    * `(n_pos, n_neg, w1_num, w1)`; w1 NULL when either cohort is
    * empty. */
  def wasserstein1(df: DataFrame, scoreCol: Column, positive: Column,
                   bucketOf: Column => Column,
                   checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    val hist0 = df
      .where(scoreCol.isNotNull)
      .select(scoreCol.cast("long").as("_v"),
        when(positive, 1L).otherwise(0L).as("_p"))
      .groupBy(col("_v"))
      .agg(count(lit(1)).as("_t"), sum(col("_p")).as("_pc"))
      .withColumn("_b", bucketOf(col("_v")))
    val hist = if (checkpoint) hist0.localCheckpoint() else hist0
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, 0) // inclusive cumulative
    val wLead = Window.partitionBy(col("_b")).orderBy(col("_v"))
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSpine = Window.orderBy(col("_b"))
    // bucket spine: running offsets for both cohorts + the next bucket's
    // min value (the cross-boundary gap partner) — bucket-count-sized
    val spine = hist.groupBy(col("_b"))
      .agg(sum(col("_t")).as("_bt"), sum(col("_pc")).as("_bp"),
        min(col("_v")).as("_bmin"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_offT"),
        coalesce(sum(col("_bp")).over(wOff), lit(0L)).as("_offP"),
        lead(col("_bmin"), 1).over(wSpine).as("_nbmin"))
    val tot = hist.agg(coalesce(sum(col("_t")), lit(0L)).as("_n"),
      coalesce(sum(col("_pc")), lit(0L)).as("_n1"))
    hist
      .join(broadcast(spine), Seq("_b"))
      .withColumn("_c1", col("_offP") + sum(col("_pc")).over(wIn))
      .withColumn("_ct", col("_offT") + sum(col("_t")).over(wIn))
      .withColumn("_next",
        coalesce(lead(col("_v"), 1).over(wLead), col("_nbmin")))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      .withColumn("_d",
        (col("_n") - col("_n1")).cast(dec) * col("_c1") -
          col("_n1").cast(dec) * (col("_ct") - col("_c1")))
      .agg(
        first(col("_n1")).as("_np"),
        first(col("_n")).as("_nn"),
        coalesce(sum(when(col("_next").isNotNull,
          abs(col("_d")) * (col("_next") - col("_v")).cast(dec))
          .otherwise(lit(0).cast(dec))), lit(0).cast(dec)).as("_num"))
      .select(col("_np").as("n_pos"), (col("_nn") - col("_np")).as("n_neg"),
        col("_num").cast("double").as("w1_num"),
        when(col("_np") > 0L && col("_nn") - col("_np") > 0L,
          col("_num").cast("double") /
            (col("_np").cast("double") *
              (col("_nn") - col("_np")).cast("double"))).as("w1"))
  }

  /** Two-sample CRAMÉR–VON MISES criterion — the whole-distribution
    * drift test that weights the CENTER of the pooled distribution
    * (where the mass is) where [[ksTest]] reads only the single largest
    * CDF gap: `T = (n₁n₂/N²)·Σₖ (F₁(zₖ)−F₂(zₖ))²` over all N pooled
    * observations (Anderson 1962's ties-ready form). On the value
    * histogram each distinct value contributes `t(v)·D(v)²` with
    * `D = n₂·C₁ − n₁·C₂` (inclusive cumulatives), so the numerator
    * `U = Σ t·D²` is an exact DECIMAL(38) integer and
    * `T = U/(N²·n₁·n₂)` is the single trailing IEEE chain.
    *
    * ## Scale shape (100 TB)
    * [[mannWhitney]]'s exact shape: ONE partial-aggregable value
    * histogram, the two-level bucket prefix sum, one final aggregate —
    * no data-sized window, no join beyond the broadcast spine and the
    * 1-row attach. Digit budget: `Σ t·D² ≤ N⁵/16` rides DECIMAL(38) to
    * N ≈ 6·10⁷; past that quantize the score coarser (the documented
    * family). NULL scores excluded; NULL `positive` counts negative.
    * Returns ONE row `(n_pos, n_neg, cvm_num, t_stat)`; t_stat NULL
    * when either cohort is empty. */
  def cramerVonMises(df: DataFrame, scoreCol: Column, positive: Column,
                     bucketOf: Column => Column,
                     checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    val hist0 = df
      .where(scoreCol.isNotNull)
      .select(scoreCol.cast("long").as("_v"),
        when(positive, 1L).otherwise(0L).as("_p"))
      .groupBy(col("_v"))
      .agg(count(lit(1)).as("_t"), sum(col("_p")).as("_pc"))
      .withColumn("_b", bucketOf(col("_v")))
    val hist = if (checkpoint) hist0.localCheckpoint() else hist0
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, 0) // inclusive cumulative
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = hist.groupBy(col("_b"))
      .agg(sum(col("_t")).as("_bt"), sum(col("_pc")).as("_bp"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_offT"),
        coalesce(sum(col("_bp")).over(wOff), lit(0L)).as("_offP"))
    val tot = hist.agg(coalesce(sum(col("_t")), lit(0L)).as("_n"),
      coalesce(sum(col("_pc")), lit(0L)).as("_n1"))
    hist
      .join(broadcast(spine), Seq("_b"))
      .withColumn("_c1", col("_offP") + sum(col("_pc")).over(wIn))
      .withColumn("_ct", col("_offT") + sum(col("_t")).over(wIn))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      .withColumn("_d",
        (col("_n") - col("_n1")).cast(dec) * col("_c1") -
          col("_n1").cast(dec) * (col("_ct") - col("_c1")))
      .agg(
        first(col("_n1")).as("_np"),
        first(col("_n")).as("_nn"),
        coalesce(sum(col("_t").cast(dec) * col("_d") * col("_d")),
          lit(0).cast(dec)).as("_u"))
      .select(col("_np").as("n_pos"), (col("_nn") - col("_np")).as("n_neg"),
        col("_u").cast("double").as("cvm_num"),
        when(col("_np") > 0L && col("_nn") - col("_np") > 0L,
          col("_u").cast("double") /
            (col("_nn").cast("double") * col("_nn").cast("double") *
              col("_np").cast("double") *
              (col("_nn") - col("_np")).cast("double"))).as("t_stat"))
  }

  /** Two-sample ENERGY DISTANCE (Székely & Rizzo 2004) — the
    * mean-pairwise-gap drift read:
    * `E = 2·E|X−Y| − E|X−X′| − E|Y−Y′|`, zero iff the distributions
    * coincide, and in 1-D equal to `2∫(F₁−F₂)²dx` (the Cramér distance
    * doubled — the dx-weighted companion to [[cramerVonMises]]'s
    * dF-weighted criterion). Each pairwise-gap sum is exact WITHOUT a
    * pair join: on the sorted value histogram,
    * `Σ_{u<v}(v−u)·cₐ(u)·c_b(v) = Σ_v c_b(v)·(v·Pₐc(v) − Pₐs(v))` with
    * `Pₐc/Pₐs` the EXCLUSIVE running count/value-sum of cohort a — so
    * Sxy/Sxx/Syy ride four prefix sums through the two-level scheme and
    * `E = 2Sxy/(n₁n₂) − 2Sxx/n₁² − 2Syy/n₂²` is one trailing IEEE
    * chain over exact DECIMAL(38) integers.
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable value histogram; the four running sums ride
    * the within-bucket windows plus a bucket-count-sized broadcast
    * spine; one final aggregate. Digit budget: each sum
    * ≤ N²·max|v| rides DECIMAL(38) to N²·|v| ≈ 10³⁸. NULL scores
    * excluded; NULL `positive` counts negative. Returns ONE row
    * `(n_pos, n_neg, sxy, sxx, syy, e_dist)`; e_dist NULL when either
    * cohort is empty. */
  def energyDistance(df: DataFrame, scoreCol: Column, positive: Column,
                     bucketOf: Column => Column,
                     checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    val hist0 = df
      .where(scoreCol.isNotNull)
      .select(scoreCol.cast("long").as("_v"),
        when(positive, 1L).otherwise(0L).as("_p"))
      .groupBy(col("_v"))
      .agg(count(lit(1)).as("_t"), sum(col("_p")).as("_pc"))
      .withColumn("_nc", col("_t") - col("_pc"))
      .withColumn("_b", bucketOf(col("_v")))
    val hist = if (checkpoint) hist0.localCheckpoint() else hist0
    val wEx = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1) // exclusive cumulative
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = hist.groupBy(col("_b"))
      .agg(sum(col("_pc")).as("_b1c"),
        sum(col("_pc").cast(dec) * col("_v")).as("_b1s"),
        sum(col("_nc")).as("_b2c"),
        sum(col("_nc").cast(dec) * col("_v")).as("_b2s"))
      .select(col("_b"),
        coalesce(sum(col("_b1c")).over(wOff), lit(0L)).as("_off1c"),
        coalesce(sum(col("_b1s")).over(wOff), lit(0).cast(dec)).as("_off1s"),
        coalesce(sum(col("_b2c")).over(wOff), lit(0L)).as("_off2c"),
        coalesce(sum(col("_b2s")).over(wOff), lit(0).cast(dec)).as("_off2s"))
    val tot = hist.agg(coalesce(sum(col("_t")), lit(0L)).as("_n"),
      coalesce(sum(col("_pc")), lit(0L)).as("_n1"))
    hist
      .join(broadcast(spine), Seq("_b"))
      .withColumn("_p1c",
        col("_off1c") + coalesce(sum(col("_pc")).over(wEx), lit(0L)))
      .withColumn("_p1s", col("_off1s") +
        coalesce(sum(col("_pc").cast(dec) * col("_v")).over(wEx),
          lit(0).cast(dec)))
      .withColumn("_p2c",
        col("_off2c") + coalesce(sum(col("_nc")).over(wEx), lit(0L)))
      .withColumn("_p2s", col("_off2s") +
        coalesce(sum(col("_nc").cast(dec) * col("_v")).over(wEx),
          lit(0).cast(dec)))
      // gap-to-all-previous partial sums, per cohort
      .withColumn("_g1", col("_v").cast(dec) * col("_p1c") - col("_p1s"))
      .withColumn("_g2", col("_v").cast(dec) * col("_p2c") - col("_p2s"))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      .agg(
        first(col("_n1")).as("_np"),
        first(col("_n")).as("_nn"),
        coalesce(sum(col("_g1") * col("_nc") + col("_g2") * col("_pc")),
          lit(0).cast(dec)).as("_sxy"),
        coalesce(sum(col("_g1") * col("_pc")), lit(0).cast(dec)).as("_sxx"),
        coalesce(sum(col("_g2") * col("_nc")), lit(0).cast(dec)).as("_syy"))
      .select(col("_np").as("n_pos"), (col("_nn") - col("_np")).as("n_neg"),
        col("_sxy").cast("double").as("sxy"),
        col("_sxx").cast("double").as("sxx"),
        col("_syy").cast("double").as("syy"),
        when(col("_np") > 0L && col("_nn") - col("_np") > 0L,
          lit(2.0) * col("_sxy").cast("double") /
            (col("_np").cast("double") * (col("_nn") - col("_np")).cast("double")) -
            lit(2.0) * col("_sxx").cast("double") /
              (col("_np").cast("double") * col("_np").cast("double")) -
            lit(2.0) * col("_syy").cast("double") /
              ((col("_nn") - col("_np")).cast("double") *
                (col("_nn") - col("_np")).cast("double"))).as("e_dist"))
  }

  /** CONOVER SQUARED-RANK test for equality of variances (Conover &
    * Iman; Conover, Practical Nonparametric Statistics §5.3) — the
    * K-SAMPLE scale test [[moodScaleTest]]/[[ansariBradley]] (two
    * cohorts) and [[brownForsythe]] (parametric) leave open: deviations
    * `u = |y − m_g|` from each group's center are ranked POOLED, scores
    * are squared midranks, and the χ²_(k−1) statistic asks "do the k
    * groups hold different shares of the large deviations".
    *
    * ## Exactness
    * The group center is the SITE-FLOORED integer mean
    * `m_g = ⌊S_g/n_g⌋` (pmod-subtract — negative-safe; the documented
    * center family, same doctrine as [[brownForsythe]]'s median).
    * Doubled midranks make `4·score = d², d = 2·cb + t + 1` exact; the
    * optional `scoreShift` defines the score family as `d² >> shift`
    * (the [[ansariBradley]] fixed-score doctrine: the χ² moments are
    * permutation-exact for ANY fixed scores, so shifting trades digit
    * budget, not exactness). Per group,
    * `term_g = ⌊10⁶·(N·Sq_g − n_g·A)²/n_g⌋` quantizes once at its site;
    * with `A = Σt·aq`, `B = Σt·aq²`, the readout
    * `T = (N−1)·Σterm / (N·(N·B − A²)·10⁶)` is one trailing IEEE chain.
    *
    * ## Scale shape (100 TB)
    * Data-sized work: ONE row pass joined against the k-row broadcast
    * group-stats frame, then ONE partial-aggregable
    * `groupBy(group, deviation)`. The value histogram, two-level
    * prefix-sum ranks, k-row group sums and the 1-row assembly are all
    * [[kruskalWallis]]'s audited shapes. Digit budget at shift 0:
    * `16N⁸·10⁶ ≤ 10³⁸` → N ≲ 7·10³; each +2 of `scoreShift` buys ×2 of
    * N (shift 14 covers N ≈ 6·10⁴, shift 40 covers N ≈ 5·10⁸). NULL
    * group/value rows excluded. Returns ONE row
    * `(n, k_groups, sum_term, t_conover)`; t_conover NULL when k < 2 or
    * the score variance degenerates (all deviations tied). */
  def conoverSquaredRanks(df: DataFrame, groupCol: String, valueCol: Column,
                          bucketOf: Column => Column, scoreShift: Int = 0,
                          checkpoint: Boolean = true): DataFrame = {
    require(scoreShift >= 0 && scoreShift < 63, s"bad scoreShift $scoreShift")
    val dec = "decimal(38,0)"
    def cut(d: DataFrame): DataFrame = if (checkpoint) d.localCheckpoint() else d
    val rows = cut(df
      .where(valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_y")))
    // k-row group centers: site-floored integer means (negative-safe)
    val gstats = rows.groupBy(col("_g"))
      .agg(count(lit(1)).as("_ng0"), sum(col("_y")).as("_sg0"))
      .select(col("_g"), expr("(_sg0 - pmod(_sg0, _ng0)) DIV _ng0").as("_mg"))
    val cells = cut(rows
      .join(broadcast(gstats), Seq("_g"))
      .select(col("_g"), abs(col("_y") - col("_mg")).as("_v"))
      .groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_c"))) // fans into the histogram and the rank join
    val hist = cut(cells.groupBy(col("_v")).agg(sum(col("_c")).as("_t"))
      .withColumn("_b", bucketOf(col("_v"))))
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy(col("_b")).agg(sum(col("_t")).as("_bt"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOff), lit(0L)).as("_off"))
    // aq = (2·midrank)² >> shift — the fixed score family
    val vscore = hist
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("_cb", col("_off") + coalesce(sum(col("_t")).over(wIn), lit(0L)))
      .withColumn("_d", lit(2L) * col("_cb") + col("_t") + lit(1L))
      .select(col("_v"), col("_t"),
        shiftright(col("_d") * col("_d"), scoreShift).as("_aq"))
    val tot = vscore.agg(
      coalesce(sum(col("_t")), lit(0L)).as("_n"),
      coalesce(sum(col("_t").cast(dec) * col("_aq")), lit(0).cast(dec)).as("_a"),
      coalesce(sum(col("_t").cast(dec) * col("_aq") * col("_aq")),
        lit(0).cast(dec)).as("_bb"))
    cells
      .join(vscore.select(col("_v"), col("_aq")), Seq("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_c")).as("_ng"),
        sum(col("_c").cast(dec) * col("_aq")).as("_sq"))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      .withColumn("_num", col("_n").cast(dec) * col("_sq") -
        col("_ng").cast(dec) * col("_a"))
      // ⌊10⁶·num²/n_g⌋ — num² nonneg, so the pmod subtract makes the
      // decimal division exact and floor ≡ truncate on both engines
      .withColumn("_term",
        expr("""CAST((_num * _num * 1000000 -
                  pmod(_num * _num * 1000000, CAST(_ng AS DECIMAL(38,0))))
                / _ng AS DECIMAL(38,0))"""))
      .agg(first(col("_n")).as("_nn"), count(lit(1)).as("_k"),
        first(col("_a")).as("_a1"), first(col("_bb")).as("_b1"),
        coalesce(sum(col("_term")), lit(0).cast(dec)).as("_st"))
      .withColumn("_sv", col("_nn").cast(dec) * col("_b1") - col("_a1") * col("_a1"))
      .select(col("_nn").as("n"), col("_k").as("k_groups"),
        col("_st").cast("double").as("sum_term"),
        when(col("_k") >= 2L && col("_nn") >= 2L && col("_sv") > 0,
          (col("_nn") - lit(1L)).cast("double") * col("_st").cast("double") /
            (col("_nn").cast("double") * col("_sv").cast("double") *
              lit(1000000.0))).as("t_conover"))
  }

  /** K-SAMPLE ANDERSON–DARLING test (Scholz & Stephens 1987, the
    * midrank/ties version A²ₐₖₙ) — the EDF-family member that weights
    * the TAILS where [[ksTest]] reads one gap and [[cramerVonMises]]
    * weights the center: the denominator `B(N−B)` up-weights
    * discrepancies near the extremes, making AD the sensitive read for
    * "did the outlier mass shift", the failure mode quality filters
    * care about most. Completes the EDF trio (KS / CvM / AD).
    *
    * ## Exactness
    * Doubled midpoints keep everything integer: with `b2 = 2·cb + l`
    * (pooled) and `m2 = 2·cbg + f` (per group), the cell term is
    * `l·x²/Dq` with `x = N·m2 − n_g·b2` and
    * `Dq = b2(2N − b2) − N·l` — exactly 4× the textbook
    * `B(N−B) − Nl/4`. Each cell quantizes ONCE:
    * `t = ⌊10⁶·l·x²/Dq⌋` (pmod-subtract; numerator ≥ 0 so floor ≡
    * truncate on both engines); each group floors once more,
    * `s_g = ⌊Σt/n_g⌋`; the readout
    * `A² = (N−1)·Σs / (N²·10⁶)` is one trailing IEEE chain.
    *
    * ## Scale shape (100 TB)
    * [[jonckheereTerpstra]]'s audited dense-frame shape: ONE
    * partial-aggregable `groupBy(group, value)`, the k·V dense frame
    * (model-sized — k cohorts, V bounded by the caller's quantization),
    * within-group cumulatives on the two-level (group, bucket)
    * prefix-sum scheme, the pooled cumulative on the value histogram,
    * k-row group sums, 1-row assembly. Digit budget: `l·x²·10⁶ ≤
    * 4N⁵·10⁶` rides DECIMAL(38) to N ≈ 10⁶ — quantize coarser past
    * that. NULL group/value rows excluded. Returns ONE row
    * `(n, k_groups, sum_s, a2)`; a2 NULL when k < 2 or all values are
    * tied (L < 2 — every denominator degenerates). */
  def andersonDarlingK(df: DataFrame, groupCol: String, valueCol: Column,
                       bucketOf: Column => Column,
                       checkpoint: Boolean = true): DataFrame = {
    val dec = "decimal(38,0)"
    def cut(d: DataFrame): DataFrame = if (checkpoint) d.localCheckpoint() else d
    val cells = cut(df
      .where(valueCol.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"), valueCol.cast("long").as("_v"))
      .groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).as("_c"))) // fans into groups, hist, dense, ng
    val groups = cells.select(col("_g")).distinct() // k rows
    val hist = cut(cells.groupBy(col("_v")).agg(sum(col("_c")).as("_t"))
      .withColumn("_b", bucketOf(col("_v")))) // fans into dense, offsets, pooled cum
    // pooled cumulative-below -> b2 = 2cb + l per distinct value
    val wInV = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOffV = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offV = hist.groupBy(col("_b")).agg(sum(col("_t")).as("_bt"))
      .select(col("_b"),
        coalesce(sum(col("_bt")).over(wOffV), lit(0L)).as("_offv"))
    val vcum = hist
      .join(broadcast(offV), Seq("_b"))
      .withColumn("_cb", col("_offv") + coalesce(sum(col("_t")).over(wInV), lit(0L)))
      .select(col("_v"), col("_t"),
        (lit(2L) * col("_cb") + col("_t")).as("_b2"))
    // dense k·V frame: M must be evaluated at values the group lacks
    val dense = hist.select(col("_v"), col("_b"))
      .crossJoin(broadcast(groups))
      .join(cells, Seq("_g", "_v"), "left")
      .na.fill(0L, Seq("_c"))
    val wInG = Window.partitionBy(col("_g"), col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOffG = Window.partitionBy(col("_g")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offG = dense.groupBy(col("_g"), col("_b")).agg(sum(col("_c")).as("_bt"))
      .select(col("_g"), col("_b"),
        coalesce(sum(col("_bt")).over(wOffG), lit(0L)).as("_offg"))
    val cum = dense
      .join(broadcast(offG), Seq("_g", "_b"))
      .withColumn("_m2",
        lit(2L) * (col("_offg") + coalesce(sum(col("_c")).over(wInG), lit(0L)))
          + col("_c"))
    val ng = cells.groupBy(col("_g")).agg(sum(col("_c")).as("_ng"))
    val tot = hist.agg(coalesce(sum(col("_t")), lit(0L)).as("_n"),
      count(lit(1)).as("_l"))
    val perGroup = cum
      .join(vcum, Seq("_v"))
      .join(broadcast(ng), Seq("_g"))
      .crossJoin(broadcast(tot)) // 1-row scalar attach
      .withColumn("_x", col("_n").cast(dec) * col("_m2") -
        col("_ng").cast(dec) * col("_b2"))
      .withColumn("_dq", col("_b2").cast(dec) *
        (lit(2L) * col("_n") - col("_b2")) - col("_n").cast(dec) * col("_t"))
      // cell micro term ⌊10⁶·l·x²/Dq⌋ — guarded on Dq > 0 (Dq = 0 only
      // when one value holds the whole sample)
      .withColumn("_tm", when(col("_dq") > 0,
        expr("""CAST((_t * _x * _x * 1000000 -
                  pmod(_t * _x * _x * 1000000, _dq)) / _dq AS DECIMAL(38,0))"""))
        .otherwise(lit(0).cast(dec)))
      .groupBy(col("_g"))
      .agg(first(col("_ng")).as("_ng"), first(col("_n")).as("_n"),
        first(col("_l")).as("_l"),
        coalesce(sum(col("_tm")), lit(0).cast(dec)).as("_tg"))
      // per-group floor s_g = ⌊Σt/n_g⌋ (nonneg)
      .withColumn("_sg",
        expr("""CAST((_tg - pmod(_tg, CAST(_ng AS DECIMAL(38,0))))
                / _ng AS DECIMAL(38,0))"""))
    perGroup
      .agg(first(col("_n")).as("_nn"), count(lit(1)).as("_k"),
        first(col("_l")).as("_ll"),
        coalesce(sum(col("_sg")), lit(0).cast(dec)).as("_ss"))
      .select(col("_nn").as("n"), col("_k").as("k_groups"),
        col("_ss").cast("double").as("sum_s"),
        when(col("_k") >= 2L && col("_ll") >= 2L && col("_nn") >= 2L,
          (col("_nn") - lit(1L)).cast("double") * col("_ss").cast("double") /
            (col("_nn").cast("double") * col("_nn").cast("double") *
              lit(1000000.0))).as("a2"))
  }

  /** QUADE TEST (Quade 1979) — the blocked k-treatment test that WEIGHS
    * blocks by how much they discriminate: [[friedmanTest]] gives every
    * block one vote regardless of spread; Quade ranks blocks by their
    * within-block RANGE and weights each block's centered treatment
    * ranks by that block rank — more power when treatment effects scale
    * with block level (exactly the length-bucket / difficulty-tier
    * shape pipeline evals have). Same caller contract as
    * [[friedmanTest]]: cells pre-aggregated, incomplete blocks dropped.
    *
    * ## Exactness — fully integer, no site quantization
    * Doubled midranks twice over: within-block `r2 = 2r̄`, block-range
    * `q2 = 2Q̄` (ranges are exact integers, midranked across blocks),
    * so `4S_ij = q2_b·(r2_ij − (k+1))` is integer. The statistic
    * `T = (n−1)·B/(A−B)` cross-multiplies to
    * `(n−1)·SB / (n·A16 − SB)` with `A16 = ΣΣ(4S)²` and
    * `SB = Σ_g (Σ_b 4S)²` — the 16× scale cancels, leaving ONE
    * trailing IEEE division of exact DECIMAL(38) integers. Digit
    * budget: n·A16 ≲ 16n⁴k³ rides DECIMAL(38) to n ≈ 10⁸ blocks at
    * k = 8.
    *
    * ## Scale shape (100 TB)
    * [[friedmanTest]]'s audited shape: the k-row-per-block windows
    * carry the block partition; the block-range rank runs over the
    * n-row BLOCKS frame (the design dimension — buckets, days, tiers —
    * model-sized by the caller contract, the moodMedian offsets-spine
    * precedent); k-row group sums; 1-row assembly. Returns ONE row
    * `(n_blocks, k_groups, sb, a16, t_quade)`; t_quade NULL when
    * k < 2, n < 1, or the denominator degenerates (every block ranks
    * the treatments identically — then B = A and T is infinite;
    * emitted NULL with the degenerate flag readable from sb = a16·n). */
  def quadeTest(df: DataFrame, blockCol: String, groupCol: String,
                valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .where(col(blockCol).isNotNull && col(groupCol).isNotNull &&
        valueCol.isNotNull)
      .groupBy(col(blockCol).as("_b"), col(groupCol).as("_g"))
      .agg(min(valueCol.cast("long")).as("_y"))
      .localCheckpoint() // fans into the k-probe, ranks, and ranges
    val k = cells.select(col("_g")).distinct().count() // model probe
    val complete = cells
      .withColumn("_kb", count(lit(1)).over(Window.partitionBy(col("_b"))))
      .where(col("_kb") === k)
    val ranked = complete
      .withColumn("_below", count(lit(1)).over(
        Window.partitionBy(col("_b")).orderBy(col("_y"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("_ties", count(lit(1)).over(
        Window.partitionBy(col("_b"), col("_y"))))
      .select(col("_b"), col("_g"),
        (lit(2L) * col("_below") + col("_ties") + lit(1L)).as("_r2"))
    // block ranges midranked ACROSS blocks: the n-row design frame
    val ranges = complete.groupBy(col("_b"))
      .agg((max(col("_y")) - min(col("_y"))).as("_rg"))
    val wRg = Window.orderBy(col("_rg"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val q2 = ranges
      .withColumn("_qbelow", coalesce(count(lit(1)).over(wRg), lit(0L)))
      .withColumn("_qties", count(lit(1)).over(Window.partitionBy(col("_rg"))))
      .select(col("_b"),
        (lit(2L) * col("_qbelow") + col("_qties") + lit(1L)).as("_q2"))
    val s = ranked
      .join(q2, Seq("_b")) // n·k rows; q2 is the n-row design frame
      .select(col("_g"),
        (col("_q2").cast(dec) * (col("_r2") - lit(k + 1L))).as("_s4"))
    val tot = s.agg(
      coalesce(sum(col("_s4") * col("_s4")), lit(0).cast(dec)).as("_a16"))
    val nBlocks = q2.agg(count(lit(1)).as("_n"))
    s.groupBy(col("_g"))
      .agg(sum(col("_s4")).as("_sg"))
      .agg(count(lit(1)).as("_k"),
        coalesce(sum(col("_sg") * col("_sg")), lit(0).cast(dec)).as("_sb"))
      .crossJoin(broadcast(tot)) // 1-row attaches
      .crossJoin(broadcast(nBlocks))
      .withColumn("_den", col("_n").cast(dec) * col("_a16") - col("_sb"))
      .select(col("_n").as("n_blocks"), col("_k").as("k_groups"),
        col("_sb").cast("double").as("sb"),
        col("_a16").cast("double").as("a16"),
        when(col("_k") >= 2L && col("_n") >= 1L && col("_den") > 0,
          (col("_n") - lit(1L)).cast("double") * col("_sb").cast("double") /
            col("_den").cast("double")).as("t_quade"))
  }

  /** DURBIN TEST (Durbin 1951; the tie-robust rank form) —
    * [[friedmanTest]] for BALANCED INCOMPLETE block designs: each block
    * (an eval panel, a judge) ranks only k of the t treatments — the
    * incomplete-judging reality of any large eval program, where no
    * panel can rate every candidate. Per complete-by-design block the k
    * cells take doubled midranks S = 2R (exact integers under ties);
    * with per-treatment rank sums SS_j = ΣS and replication counts r_j,
    * `D = (t−1)·Σ_j (SS_j − r_j·(k+1))² / (ΣS² − b·k·(k+1)²)` — the 4×
    * doubled-rank scales cancel between numerator and denominator, so D
    * is a ratio of exact integers with ONE trailing IEEE division;
    * χ²_(t−1) under within-block exchangeability. Reduces exactly to
    * [[friedmanTest]]'s statistic when k = t (spec'd).
    *
    * ## Scale shape (100 TB)
    * The [[quadeTest]] shape: cells arrive pre-aggregated
    * (block×treatment-universe sized, never data-sized); blocks whose
    * cell count ≠ k drop (the incomplete-block discipline); midranks
    * ride block-partitioned windows; one treatment-keyed aggregate plus
    * two 1-row attaches. Returns ONE row `(n_blocks, t_treatments,
    * k_block_size, d_stat)`; d_stat NULL when t < 2 or the pooled ranks
    * fully tie (denominator ≤ 0). */
  def durbinTest(df: DataFrame, blockCol: String, treatmentCol: String,
                 valueCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"block size k must be >= 2, got $k")
    val dec = "decimal(38,0)"
    val cells = df
      .where(col(blockCol).isNotNull && col(treatmentCol).isNotNull &&
        valueCol.isNotNull)
      .groupBy(col(blockCol).as("_b"), col(treatmentCol).as("_t"))
      .agg(min(valueCol.cast("long")).as("_y"))
    val complete = cells
      .withColumn("_kb", count(lit(1)).over(Window.partitionBy(col("_b"))))
      .where(col("_kb") === k)
      .localCheckpoint() // fans into ranks, the block count, and A
    val ranked = complete
      .withColumn("_below", count(lit(1)).over(
        Window.partitionBy(col("_b")).orderBy(col("_y"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("_ties", count(lit(1)).over(
        Window.partitionBy(col("_b"), col("_y"))))
      .select(col("_b"), col("_t"),
        (lit(2L) * col("_below") + col("_ties") + lit(1L)).as("_s"))
      .localCheckpoint() // fans into the treatment sums and A
    val blocks = complete.select(col("_b")).distinct()
      .agg(count(lit(1)).as("_nb"))
    val a4 = ranked.agg(
      coalesce(sum(col("_s").cast(dec) * col("_s")), lit(0).cast(dec)).as("_a4"))
    ranked.groupBy(col("_t"))
      .agg(sum(col("_s")).as("_ss"), count(lit(1)).as("_r"))
      .select(((col("_ss") - col("_r") * lit(k + 1L)).cast(dec) *
        (col("_ss") - col("_r") * lit(k + 1L))).as("_d2"))
      .agg(count(lit(1)).as("_t2"),
        coalesce(sum(col("_d2")), lit(0).cast(dec)).as("_num"))
      .crossJoin(broadcast(a4))     // 1-row attaches
      .crossJoin(broadcast(blocks))
      .withColumn("_den",
        col("_a4") - col("_nb").cast(dec) * lit(k.toLong * (k + 1L) * (k + 1L)))
      .select(col("_nb").as("n_blocks"), col("_t2").as("t_treatments"),
        lit(k.toLong).as("k_block_size"),
        when(col("_t2") >= 2L && col("_den") > 0,
          (col("_t2") - lit(1L)).cast("double") * col("_num").cast("double") /
            col("_den").cast("double")).as("d_stat"))
  }

  /** PAGE'S TREND TEST (Page 1963) — the ORDERED-alternative member of
    * the blocked family: [[friedmanTest]] asks "do the k treatments
    * differ at all across blocks", Page puts all power on the MONOTONE
    * ordering θ₁ ≤ … ≤ θₖ (difficulty tiers, dose steps, context
    * lengths) — [[jonckheereTerpstra]]'s question inside a blocked
    * design. Treatment weights are the dense ranks 1..k of the ordered
    * group key.
    *
    * ## Exactness
    * `num4 = Σ_b Σ_j (2c_j − (k+1))·(r2_bj − (k+1))` = 4(L − E[L]) is
    * an exact integer (doubled centered weights × doubled centered
    * midranks). The variance is PERMUTATION-EXACT per block, ties and
    * all — for a linear statistic Σ c_j r_π(j) under within-block
    * permutation, `Var = Σ(c−c̄)²·Σ(r−r̄)²/(k−1)` — so
    * `Var[num4] = C·Σ_b D_b/(k−1)` with `C = Σ(2c−(k+1))²` and
    * `D_b = Σ(r2−(k+1))²` exact integers, and
    * `z = num4/√(C·ΣD/(k−1))` is one trailing IEEE chain.
    *
    * ## Scale shape (100 TB)
    * [[friedmanTest]]'s shape plus a k-row broadcast weight frame
    * (dense rank of the distinct ordered groups). Returns ONE row
    * `(n_blocks, k_groups, num4, z)`; z NULL when k < 2 or every
    * block's ranks are fully tied (ΣD = 0). */
  def pageTrendTest(df: DataFrame, blockCol: String, groupCol: Column,
                    valueCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .where(col(blockCol).isNotNull && groupCol.isNotNull &&
        valueCol.isNotNull)
      .groupBy(col(blockCol).as("_b"), groupCol.cast("long").as("_g"))
      .agg(min(valueCol.cast("long")).as("_y"))
      .localCheckpoint() // fans into the k-probe, weights, and ranks
    val k = cells.select(col("_g")).distinct().count() // model probe
    val complete = cells
      .withColumn("_kb", count(lit(1)).over(Window.partitionBy(col("_b"))))
      .where(col("_kb") === k)
    val weights = cells.select(col("_g")).distinct()
      .withColumn("_c", dense_rank().over(Window.orderBy(col("_g"))).cast("long"))
    val ranked = complete
      .withColumn("_below", count(lit(1)).over(
        Window.partitionBy(col("_b")).orderBy(col("_y"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("_ties", count(lit(1)).over(
        Window.partitionBy(col("_b"), col("_y"))))
      .select(col("_b"), col("_g"),
        (lit(2L) * col("_below") + col("_ties") + lit(1L)).as("_r2"))
      .join(broadcast(weights), Seq("_g"))
    val perBlock = ranked.groupBy(col("_b"))
      .agg(sum((lit(2L) * col("_c") - lit(k + 1L)).cast(dec) *
        (col("_r2") - lit(k + 1L))).as("_nb4"),
        sum((col("_r2") - lit(k + 1L)).cast(dec) *
          (col("_r2") - lit(k + 1L))).as("_db"))
    val cSum = weights.agg(coalesce(sum(
      (lit(2L) * col("_c") - lit(k + 1L)).cast(dec) *
        (lit(2L) * col("_c") - lit(k + 1L))), lit(0).cast(dec)).as("_cc"))
    perBlock
      .agg(count(lit(1)).as("_n"),
        coalesce(sum(col("_nb4")), lit(0).cast(dec)).as("_num4"),
        coalesce(sum(col("_db")), lit(0).cast(dec)).as("_dd"))
      .crossJoin(broadcast(cSum)) // 1-row attach
      .select(col("_n").as("n_blocks"), lit(k).as("k_groups"),
        col("_num4").cast("double").as("num4"),
        when(lit(k) >= 2L && col("_dd") > 0 && col("_cc") > 0,
          col("_num4").cast("double") /
            sqrt(col("_cc").cast("double") * col("_dd").cast("double") /
              lit((k - 1).toDouble))).as("z"))
  }

  /** COCHRAN'S Q TEST (Cochran 1950) — "do k binary FILTERS pass the
    * same share of documents, given that they judge the SAME
    * documents": the k-treatment generalization of [[mcnemarTest]] and
    * the binary specialization of [[friedmanTest]] — the question a
    * pipeline asks before swapping one quality filter for another.
    * `Q = (k−1)·(k·ΣCⱼ² − T²) / (k·ΣRᵢ − ΣRᵢ²)` with Cⱼ the
    * per-treatment pass counts, Rᵢ the per-block pass counts, T the
    * grand total — every term an exact integer, Q one trailing IEEE
    * division; χ²_(k−1) under exchangeability.
    *
    * ## Scale shape (100 TB)
    * ONE partial-aggregable `groupBy(block)` (the completeness check
    * and Rᵢ sums ride it) and one k-row `groupBy(treatment)`; blocks
    * with missing treatments drop (the [[friedmanTest]] convention).
    * Returns ONE row `(n_blocks, k_treatments, q_stat)`; q_stat NULL
    * when k < 2 or the denominator degenerates (every block passes
    * everything or nothing — no discordance to test). */
  def cochranQ(df: DataFrame, blockCol: String, treatmentCol: String,
               outcomeCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val rows = df
      .where(col(blockCol).isNotNull && col(treatmentCol).isNotNull &&
        outcomeCol.isNotNull)
      .select(col(blockCol).as("_b"), col(treatmentCol).as("_t"),
        when(outcomeCol, 1L).otherwise(0L).as("_y"))
      .localCheckpoint() // fans into the k-probe, blocks, and columns
    val k = rows.select(col("_t")).distinct().count() // model probe
    val blocks = rows.groupBy(col("_b"))
      .agg(count(lit(1)).as("_kb"), sum(col("_y")).as("_r"))
      .where(col("_kb") === k)
      .localCheckpoint() // complete blocks: both sides below re-read it
    val colSums = rows
      .join(blocks.select(col("_b")), Seq("_b")) // complete blocks only
      .groupBy(col("_t")).agg(sum(col("_y")).as("_c"))
      .agg(coalesce(sum(col("_c")), lit(0L)).as("_tt"),
        coalesce(sum(col("_c").cast(dec) * col("_c")), lit(0).cast(dec))
          .as("_cc"))
    blocks
      .agg(count(lit(1)).as("_n"),
        coalesce(sum(col("_r")), lit(0L)).as("_rt"),
        coalesce(sum(col("_r").cast(dec) * col("_r")), lit(0).cast(dec))
          .as("_rr"))
      .crossJoin(broadcast(colSums)) // 1-row attach
      .withColumn("_den", lit(k).cast(dec) * col("_rt") - col("_rr"))
      .select(col("_n").as("n_blocks"), lit(k).as("k_treatments"),
        when(lit(k) >= 2L && col("_den") > 0,
          (lit(k - 1).cast(dec) *
            (lit(k).cast(dec) * col("_cc") -
              col("_tt").cast(dec) * col("_tt"))).cast("double") /
            col("_den").cast("double")).as("q_stat"))
  }

  /** McNEMAR'S TEST — "did swapping filter A for filter B change WHICH
    * documents pass, beyond noise": the paired 2×2 read on the
    * DISCORDANT cells only (documents both filters pass or both reject
    * carry no information about the swap — the insight that makes this
    * the right A/B test for correlated judgments, where a two-sample
    * χ² would be wrong). `χ²_micro = ⌊10⁶·(b−c)²/(b+c)⌋` with b/c the
    * only-A/only-B counts — exact integers, the floor quantized once
    * at its site (numerator nonneg → floor ≡ truncate both engines).
    * The 10⁶·(b−c)² numerator rides DECIMAL(38,0) (the
    * [[cramerVonMises]]/[[conoverSquaredRanks]] convention), so the
    * statistic is exact to |b−c| ≈ 10¹⁶ discordant documents — no
    * silent BIGINT wrap at corpus scale.
    *
    * Scale shape: ONE partial-aggregable aggregate over a narrow
    * two-flag projection — no groupBy, no join, no window. Returns ONE
    * row `(n, n_only_a, n_only_b, chi2_micro)`; chi2_micro NULL when
    * there are no discordant documents. */
  def mcnemarTest(df: DataFrame, flagA: Column, flagB: Column): DataFrame = {
    df.where(flagA.isNotNull && flagB.isNotNull)
      .select(when(flagA, 1L).otherwise(0L).as("_a"),
        when(flagB, 1L).otherwise(0L).as("_b"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("_a") === 1L && col("_b") === 0L, 1L)
          .otherwise(0L)), lit(0L)).as("n_only_a"),
        coalesce(sum(when(col("_a") === 0L && col("_b") === 1L, 1L)
          .otherwise(0L)), lit(0L)).as("n_only_b"))
      .select(col("n"), col("n_only_a"), col("n_only_b"),
        when(col("n_only_a") + col("n_only_b") > 0L,
          expr("""CAST((CAST(n_only_a - n_only_b AS DECIMAL(38,0))
                    * (n_only_a - n_only_b) * 1000000
                  - pmod(CAST(n_only_a - n_only_b AS DECIMAL(38,0))
                      * (n_only_a - n_only_b) * 1000000,
                      CAST(n_only_a + n_only_b AS DECIMAL(38,0))))
                / (n_only_a + n_only_b) AS BIGINT)""")).as("chi2_micro"))
  }

  /** CRONBACH'S ALPHA — internal consistency of k parallel SCORE
    * components ("do my quality sub-scores measure one underlying
    * thing, or k different things"): the eval-panel / composite-score
    * sanity check next to [[cohenKappa]]'s two-rater agreement.
    * `α = k/(k−1) · (1 − ΣVarᵢ/Var_total)` with every variance the
    * exact integer `n·Σx² − (Σx)²` (the n²-scaled form — the common
    * scale cancels in the ratio), so α is one trailing IEEE chain over
    * exact DECIMAL(38) sums.
    *
    * Scale shape: ONE partial-aggregable aggregate over the k item
    * columns and their row-sum — no groupBy, no join, no window. Digit
    * budget: n·Σx² ≤ n²·x² rides DECIMAL(38) to n·|x| ≈ 10¹⁹. Returns
    * ONE row `(n, k_items, svar, tvar, alpha)`; alpha NULL when n < 2
    * or the total variance degenerates. */
  def cronbachAlpha(df: DataFrame, items: Seq[Column]): DataFrame = {
    require(items.size >= 2, s"need >= 2 items, got ${items.size}")
    val dec = "decimal(38,0)"
    val k = items.size
    val named = df.select(items.zipWithIndex.map { case (c, i) =>
      c.cast("long").as(s"_x$i") }: _*)
      .where(items.indices.map(i => col(s"_x$i").isNotNull).reduce(_ && _))
      .withColumn("_t", items.indices.map(i => col(s"_x$i")).reduce(_ + _))
    val aggs = Seq(count(lit(1)).as("_n")) ++
      items.indices.flatMap(i => Seq(
        sum(col(s"_x$i")).as(s"_s$i"),
        sum(col(s"_x$i").cast(dec) * col(s"_x$i")).as(s"_q$i"))) ++
      Seq(sum(col("_t")).as("_st"),
        sum(col("_t").cast(dec) * col("_t")).as("_qt"))
    val a = named.agg(aggs.head, aggs.tail: _*)
    val svar = items.indices.map(i =>
      col("_n").cast(dec) * col(s"_q$i") -
        col(s"_s$i").cast(dec) * col(s"_s$i")).reduce(_ + _)
    val tvar = col("_n").cast(dec) * col("_qt") -
      col("_st").cast(dec) * col("_st")
    a.select(col("_n").as("n"), lit(k.toLong).as("k_items"),
        svar.as("_sv"), tvar.as("_tv"))
      .select(col("n"), col("k_items"),
        col("_sv").cast("double").as("svar"),
        col("_tv").cast("double").as("tvar"),
        when(col("n") >= 2L && col("_tv") > 0,
          lit(k.toDouble) / lit((k - 1).toDouble) *
            (lit(1.0) - col("_sv").cast("double") / col("_tv").cast("double")))
          .as("alpha"))
  }

  /** nDCG@k of a scored candidate set against graded relevance
    * (Järvelin & Kekäläinen 2002) — the ranking-quality number for a
    * retrieval stage (BM25, embedding search, rank fusion):
    * `DCG = Σ_{r≤k} gain_r · w_r` with `w_r = round(10⁶ / log₂(r+1))`
    * quantized PER RANK (a k-row broadcast table — the micro-unit
    * scheme, so both sums are exact BIGINTs), `IDCG` the same sum over
    * the gain-descending ideal order, `nDCG = DCG/IDCG` one IEEE
    * division. Ties break by id in both orders — a total order, so the
    * cut at k is deterministic.
    *
    * Scale shape: both top-k cuts are `TakeOrdered` (distributed
    * heap top-k — the q04/q137 shape); only the ≤ k survivors meet the
    * weight table, so the k-row rank window is model-sized by
    * construction. Returns ONE row `(k, dcg_u, idcg_u, ndcg)`; ndcg
    * NULL when the candidate set has no positive gain. */
  def ndcgAtK(df: DataFrame, scoreCol: Column, gainCol: Column,
              idCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val weights = broadcast((1 to k).map(r => (r.toLong,
      math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))).toDF("_r", "_w"))
    val base = df.select(scoreCol.as("_score"), gainCol.cast("long").as("_gain"),
      idCol.as("_id"))
    def cut(ordered: Seq[Column]): DataFrame = {
      val win = org.apache.spark.sql.expressions.Window.orderBy(ordered: _*)
      base.orderBy(ordered: _*).limit(k) // TakeOrdered; ranks over <= k rows
        .withColumn("_r", row_number().over(win).cast("long"))
        .join(weights, Seq("_r"))
        .agg(coalesce(sum(col("_gain") * col("_w")), lit(0L)).as("_s"))
    }
    cut(Seq(col("_score").desc, col("_id"))).select(col("_s").as("dcg_u"))
      .crossJoin(cut(Seq(col("_gain").desc, col("_id"))).select(col("_s").as("idcg_u")))
      .select(lit(k.toLong).as("k"), col("dcg_u"), col("idcg_u"),
        when(col("idcg_u") > 0,
          col("dcg_u").cast("double") / col("idcg_u").cast("double")).as("ndcg"))
  }
}
