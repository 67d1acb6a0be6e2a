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
