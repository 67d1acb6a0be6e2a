package graft.operators

import graft.functions.Text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-dup THRESHOLD TUNING — the measurement operator that answers
  * "where should I set the Jaccard cut?" before a corpus-wide dedup run:
  * take the LSH candidate universe (band collisions, the same banding
  * [[Dedup.minHashLsh]] dedups with), verify each candidate with the
  * EXACT hashed-shingle Jaccard, and report the decile histogram plus
  * the survivor curve (how many pairs a threshold of d/10 would keep).
  * A spike at decile 9-10 is boilerplate/mirrors (dedup hard); mass at
  * 4-6 is template families (threshold-sensitive — tune here); the
  * curve's knee is the cut. This is [[Dedup]]'s candidate machinery
  * pointed at ITSELF — the tuning read a pipeline does once per corpus
  * before committing to a threshold.
  *
  * ## Determinism / oracle
  * Exact Jaccard as integer rationals over the md5-hashed 60-bit
  * shingle universe (the q20 hashed-key space shared with the whole
  * dedup family): `decile = (inter·10) DIV union` — no float ever
  * compares. The DuckDB oracle replays banding + verification over the
  * identical hashed universe and hash-matches.
  *
  * ## Scale shape (100 TB)
  * Candidates come ONLY from band buckets (never all-pairs); the
  * verification joins are candidate-bounded (pair × per-doc shingle
  * keys, 8-byte hashed); set sizes are a partial-aggregable per-doc
  * count; the survivor curve is a ≤ 11-row window over the decile
  * histogram (model-sized by construction). A zero-intersection band
  * collision (pure hash coincidence) is kept at decile 0 via the left
  * join — the histogram reports the candidate universe faithfully. */
object Tuning {

  /** Decile histogram of exact Jaccard over LSH candidate pairs.
    * Returns `(decile, n_pairs, n_pairs_ge)` — decile 0..10 (10 = the
    * sets are identical), `n_pairs_ge` = pairs at this decile or above
    * (the survivor count at threshold decile/10). */
  def lshThresholdSweep(docs: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int = 3, k: Int = 16,
                        bands: Int = 4): DataFrame = {
    val cands = Dedup.minHashLsh(docs, idCol, textCol, shingleLen, k, bands,
        threshold = 0.0)
      .select(col("id_a"), col("id_b"))
    val sets = docs
      .select(col(idCol).as("_id"),
        explode(array_distinct(Text.fastWordShingles(col(textCol), shingleLen))).as("_s"))
      .select(col("_id"), Dedup.shingleKey(col("_s")).as("_sh"))
      .distinct()
    val sizes = sets.groupBy(col("_id")).agg(count(lit(1)).as("_sz"))
    val inter = cands
      .join(sets.select(col("_id").as("id_a"), col("_sh")), Seq("id_a"))
      .join(sets.select(col("_id").as("id_b"), col("_sh")), Seq("id_b", "_sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("_inter"))
    val hist = cands
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("_id").as("id_a"), col("_sz").as("_sza")), Seq("id_a"))
      .join(sizes.select(col("_id").as("id_b"), col("_sz").as("_szb")), Seq("id_b"))
      .select(coalesce(col("_inter"), lit(0L)).as("_i"),
        (col("_sza") + col("_szb") - coalesce(col("_inter"), lit(0L))).as("_u"))
      .where(col("_u") > 0L)
      .select(expr("(_i * 10) DIV _u").as("decile"))
      .groupBy(col("decile")).agg(count(lit(1)).as("n_pairs"))
    // survivor curve over the <= 11-row histogram
    val wGe = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("n_pairs_ge", sum(col("n_pairs")).over(wGe))
  }
}
