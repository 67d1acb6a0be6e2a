package graft.operators

import graft.functions.Text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Term → document inverted index with boolean retrieval and BM25 ranked
  * retrieval — the exact-match side of corpus search (the ANN family in
  * [[Similarity]] is the fuzzy side). A training-data pipeline uses this
  * to pull every document containing a probe phrase/term set
  * (contamination audits, targeted corpus surgery, eval-set mining)
  * without re-scanning 100 TB of text per question.
  *
  * ## Scale shape (100 TB)
  * The index is one row per distinct (term, doc_id) with the term
  * frequency AND the document's token count riding the posting entry
  * (classic search-engine denormalization: the doc norm lives next to
  * the posting so scoring never joins a lengths table). Tokenization is
  * narrow in the scan; the posting aggregate is partial-aggregable keyed
  * on the term. Persisted BUCKETED ON TERM ([[writeIndex]]) plus a 1-row
  * meta table (doc count, total tokens), so every later query's term
  * lookup is a bucket-pruned read — query cost scales with the probed
  * terms' posting lists, never with the corpus. AND is a
  * `groupBy(doc) having count = |terms|` over only the probed lists;
  * NOT is an anti join; BM25 is a projection over the probed lists with
  * the #terms-row idf table and the 1-row meta both broadcast. Nothing
  * data-sized reaches the driver. */
object InvertedIndex {

  /** Build the index: one row per distinct (term, doc_id) with `tf` (term
    * count in the doc) and `dl` (the doc's token count — constant per doc,
    * denormalized onto each posting so ranked retrieval needs no second
    * table). Terms come from [[Text.tokens]] (lowercased,
    * whitespace-split) so membership semantics match the rest of the text
    * stack. */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Persist the index bucketed on term plus `<name>_meta` — one row with
    * (n_docs, sum_dl) so ranked retrieval gets N and avgdl without
    * touching the postings (the q66/q82 lifecycle: build once, probe
    * forever off the disk copy). */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 name: String, buckets: Int = 8): Unit = {
    graft.sources.Tables.writeBucketed(build(docs, idCol, textCol), name, buckets, "term")
    val spark = docs.sparkSession
    graft.sources.Tables.saveTable(
      spark.table(name)
        .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")),
      s"${name}_meta")
  }

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

  /** BM25 ranked retrieval (Robertson & Spärck Jones; the `+1` idf form
    * of Lucene/BM25L that keeps idf positive for df > N/2). Returns
    * (doc_id, n_terms, score_unats) for every document matching at least
    * one query term, score in integer micro-nat-ish units.
    *
    * Exactness follows [[LmScore]]'s micro-nat scheme: the per-(term,doc)
    * double score is computed ONCE — a fixed left-associated shape both
    * engines evaluate identically — and quantized to round(·10⁶) BIGINT
    * at that single site, so the per-document summation is exact integer
    * arithmetic: aggregation-order-independent, repartition-stable,
    * oracle-comparable.
    *
    * Plan: probed posting lists (bucket-pruned scan) ⋈ broadcast
    * #terms-row idf table ⋈ broadcast 1-row meta; the only data exchange
    * is the per-doc score sum. */
  def bm25(spark: SparkSession, indexName: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val idx = spark.table(indexName)
    val meta = broadcast(spark.table(s"${indexName}_meta"))
    val probed = idx.where(col("term").isin(terms.distinct: _*))
    // df over the probed lists only — #terms rows, broadcast back
    val dfs = broadcast(probed.groupBy(col("term"))
      .agg(count(lit(1)).as("df")))
    probed
      .join(dfs, Seq("term"))
      .crossJoin(meta)
      .withColumn("_avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("_idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("_s_unats",
        round(col("_idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("_avgdl"))) *
          lit(1e6)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("_s_unats")).as("score_unats"))
  }
}
