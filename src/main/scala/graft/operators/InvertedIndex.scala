package graft.operators

import graft.functions.Text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Term → document inverted index with boolean retrieval — the exact-match
  * side of corpus search (the ANN family in [[Similarity]] is the fuzzy
  * side). A training-data pipeline uses this to pull every document
  * containing a probe phrase/term set (contamination audits, targeted
  * corpus surgery, eval-set mining) without re-scanning 100 TB of text
  * per question.
  *
  * ## Scale shape (100 TB)
  * The index is (term, doc_id) DISTINCT — tokenization is narrow in the
  * scan, the dedup is a partial-aggregable hash aggregate keyed on the
  * term (stop-word rows collapse map-side before the exchange). Persisted
  * BUCKETED ON TERM ([[writeIndex]]), so every later query's term lookup
  * is a bucket-pruned read + co-partitioned semi/anti join — query cost
  * scales with the probed terms' posting lists, never with the corpus.
  * AND is a `groupBy(doc) having count = |terms|` over only the probed
  * lists; NOT is an anti join. Nothing data-sized reaches the driver. */
object InvertedIndex {

  /** Build the index: one row per distinct (term, doc_id), terms from
    * [[Text.tokens]] (lowercased, whitespace-split) so membership
    * semantics match the rest of the text stack. */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))

  /** Persist the index bucketed on term (the q66/q82 lifecycle: build
    * once, probe forever off the disk copy). */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 name: String, buckets: Int = 8): Unit =
    graft.sources.Tables.writeBucketed(build(docs, idCol, textCol), name, buckets, "term")

  /** Boolean retrieval against a persisted index: doc_ids containing ALL
    * of `all` and NONE of `none`. Term lists are literal (tiny) — they
    * broadcast into the posting-list filters; only the probed lists move. */
  def search(spark: SparkSession, indexName: String,
             all: Seq[String], none: Seq[String] = Nil): DataFrame = {
    require(all.nonEmpty, "need at least one required term")
    val idx = spark.table(indexName)
    val hits = idx.where(col("term").isin(all.distinct: _*))
      .groupBy(col("doc_id")).agg(countDistinct(col("term")).as("_nt"))
      .where(col("_nt") === all.distinct.size)
      .select(col("doc_id"))
    if (none.isEmpty) hits
    else hits.join(
      idx.where(col("term").isin(none.distinct: _*)).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
  }
}
