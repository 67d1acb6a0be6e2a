package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
