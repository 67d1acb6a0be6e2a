package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Composite document-quality RULE filter — the Gopher-style repetition /
  * length / symbol heuristics (Rae et al. 2021, appendix A; carried into
  * MassiveText, RefinedWeb, Dolma): each rule is a cheap deterministic
  * predicate over surface statistics, a document is kept iff it passes
  * ALL of them, and every per-rule verdict is emitted alongside the final
  * flag so a pipeline can audit WHY a document fell (the flags are what a
  * curation dashboard aggregates — "32% dropped, 80% of those for
  * repetition").
  *
  * Every statistic is a pure per-row column expression (token counts,
  * integer length sums, one exact division for the mean, the n-gram
  * distinct ratio [[Text.repetitionRatio]] already oracle-checked by
  * q45) — zero shuffle, whole-stage-codegen'd, lives in the scan stage at
  * any scale. Doubles appear only as single IEEE divisions of exact
  * integers, computed identically by the DuckDB oracle. */
object QualityRules {

  /** Per-document rule verdicts + the conjunction.
    *
    * Rules (inclusive bounds):
    *  - `r_len`:   minTokens <= n_tok <= maxTokens
    *  - `r_wlen`:  minMeanLen <= mean token length <= maxMeanLen
    *               (empty docs fail — no mean to have)
    *  - `r_rep`:   repetitionRatio(text, repN) <= maxRepetition
    *  - `r_stop`:  at least minStopHits DISTINCT words of `stopwords`
    *               occur in the document (the "natural language has
    *               function words" rule)
    *
    * Returns `(idCol, n_tok, mean_len, rep, stop_hits, r_len, r_wlen,
    * r_rep, r_stop, keep)`. */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
                   minTokens: Long, maxTokens: Long,
                   minMeanLen: Double, maxMeanLen: Double,
                   repN: Int, maxRepetition: Double,
                   stopwords: Seq[String], minStopHits: Int): DataFrame = {
    require(minTokens >= 0 && maxTokens >= minTokens, "need 0 <= minTokens <= maxTokens")
    require(minMeanLen <= maxMeanLen, "need minMeanLen <= maxMeanLen")
    require(stopwords.nonEmpty && minStopHits >= 0, "need stopwords and minStopHits >= 0")
    val toks: Column = Text.tokens(col(textCol))
    val nTok = size(toks).cast("long")
    // one exact division of two exact integers — IEEE-identical on both
    // engines; NULL (not 0/0) for the empty document so r_wlen fails it
    val meanLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / nTok.cast("double"))
    val rep = Text.repetitionRatio(col(textCol), repN)
    // distinct-by-construction: iterate the (deduped) stopword list, not
    // the document — hits count each stopword at most once
    val stopHits = size(filter(
      array(stopwords.distinct.map(lit): _*), s => array_contains(toks, s)))
      .cast("long")
    docs.select(col(idCol), nTok.as("n_tok"), meanLen.as("mean_len"),
        rep.as("rep"), stopHits.as("stop_hits"))
      .withColumn("r_len", col("n_tok").between(minTokens, maxTokens))
      .withColumn("r_wlen", coalesce(
        col("mean_len").between(minMeanLen, maxMeanLen), lit(false)))
      .withColumn("r_rep", col("rep") <= maxRepetition)
      .withColumn("r_stop", col("stop_hits") >= minStopHits)
      .withColumn("keep",
        col("r_len") && col("r_wlen") && col("r_rep") && col("r_stop"))
  }
}
