package graft.operators

import graft.functions.Text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted document-ENRICHMENT lifecycle — score the corpus ONCE and
  * let every downstream statistics/selection query read the narrow
  * enriched columns instead of re-running the regex/tokenizer scan.
  *
  * At 100 TB a curation pipeline never evaluates `langId`/`qualityScore`
  * per consumer: it runs ONE enrichment pass (build), scores each new
  * ingest batch against the FROZEN scorer model (append), and every
  * monitor/selector reads the persisted `(doc_id, langid, quality, …)`
  * table — the same build / frozen-model append / consume shape as the
  * persisted ANN index lifecycles ([[Similarity.ivfIndexBuild]] family).
  * The scorer model here is the language-marker lists + the stopword
  * list, persisted as a tiny table so the append step provably scores
  * with what is ON DISK, not whatever the code ships that day.
  *
  * ## Scale shape (100 TB)
  * The build is ONE narrow pass: tokenize once behind a Generate barrier
  * (`explode(array(tokens))` — CollapseProject cannot re-inline through
  * it, so the five language-marker filters and the stopword ratio all
  * read the materialized array; measured 3× vs re-tokenizing per
  * expression), then per-row column math — zero shuffle, zero joins.
  * The enriched table is a ~60-byte row regardless of document size, so
  * consumers scan ≈0.1% of the corpus bytes, with column pruning on top.
  * Every stored value is the bit-identical expression consumers
  * previously inlined (`quality` the exact IEEE double,
  * `quality_micro = ⌊10⁶·quality⌋`, `n_tokens`, `langid`), so
  * re-pointing a consumer is hash-neutral by construction.
  */
object Enrich {

  private def defaultStopwords: Seq[String] = Text.langMarkers.toMap.apply("en")

  /** The frozen scorer: one pass over `documents(doc_id, source, lang,
    * n_chars, text)` → `(doc_id, source, lang, n_chars, n_tokens,
    * n_bpeish, langid, quality, c_len, c_punct, c_stop, quality_micro)`.
    * Pure per-row column expressions — no shuffle, no UDFs.
    *
    * `c_len`/`c_punct`/`c_stop` are the three micro-quantized quality
    * SUB-SCORES (length, punctuation, stopword components — exactly the
    * floors q260's reliability analysis inlines), stored so item-level
    * consumers (Cronbach's α, per-component drift monitors) read the
    * narrow table too: +24 bytes on a ~60-byte row — still ≈0.1% of
    * corpus bytes — versus a full tokenizer re-scan per consumer. */
  def scoreDocuments(docs: DataFrame,
                     markers0: Seq[(String, Seq[String])] = Text.langMarkers,
                     stopwords: Seq[String] = defaultStopwords): DataFrame = {
    // langIdFromTokens tie-breaks on FIRST max, so marker order is part
    // of the scorer's semantics: canonicalize to lang-code order here,
    // exactly as scoreAgainstModel does when reloading the persisted
    // model — build/append parity cannot then depend on caller order
    val markers = markers0.sortBy(_._1)
    // tokenize ONCE behind the Generate barrier (the langId hot-path note);
    // spreadRead first: the scorer is the engine's most regex-heavy per-row
    // stage, and a few-row-group corpus would run it on as few cores
    // (measured r13: the whole sf0.1 build scored in ONE 2 s task)
    val tok = graft.sources.Tables.spreadRead(docs)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        col("text"), explode(array(Text.tokens(col("text")))).as("_ts"))
    tok.select(
        col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(col("_ts")).cast("long").as("n_tokens"),
        Text.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
        Text.langIdFromTokens(col("_ts"), markers).as("langid"),
        Text.qualityScoreFromTokens(col("text"), col("_ts"), stopwords)
          .as("quality"),
        floor(least(length(col("text")).cast("double") / lit(200.0),
          lit(1.0)) * lit(1e6)).as("c_len"),
        floor((lit(1.0) - Text.punctRatio(col("text"))) * lit(1e6))
          .as("c_punct"),
        floor(least(Text.stopwordRatioFromTokens(col("_ts"), stopwords)
          * lit(5.0), lit(1.0)) * lit(1e6)).as("c_stop"))
      .withColumn("quality_micro",
        floor(col("quality") * lit(1e6)).cast("long"))
  }

  /** The scorer MODEL as a tiny persistable table `(kind, lang, words)`:
    * `kind = 'lid'` rows are the per-language marker lists, the one
    * `kind = 'stop'` row is the stopword list. Model-sized (6 rows). */
  def scorerModel(spark: SparkSession,
                  markers: Seq[(String, Seq[String])] = Text.langMarkers,
                  stopwords: Seq[String] = defaultStopwords): DataFrame = {
    import spark.implicits._
    (markers.map { case (l, ws) => ("lid", l, ws) } :+
      (("stop", "en", stopwords)))
      .toDF("kind", "lang", "words")
  }

  /** Score a NEW ingest batch against the PERSISTED frozen model — the
    * append half of the lifecycle. The model table is model-sized (6
    * rows), so the collect is the established model-in-the-plan pattern
    * (the [[Similarity.ivfIndexAppend]] centroid read). */
  def scoreAgainstModel(batch: DataFrame, model: DataFrame): DataFrame = {
    val rows = model.select(col("kind"), col("lang"), col("words")).collect()
    val markers = rows.filter(_.getString(0) == "lid")
      .map(r => r.getString(1) -> r.getSeq[String](2).toSeq)
      .toSeq.sortBy(_._1)
    val stopwords = rows.filter(_.getString(0) == "stop")
      .flatMap(_.getSeq[String](2)).toSeq
    require(markers.nonEmpty && stopwords.nonEmpty,
      "scorer model must carry lid marker rows and a stop row")
    scoreDocuments(batch, markers, stopwords)
  }

  /** [[scoreDocuments]] stamped with the scorer MODEL VERSION — the
    * column the selective-refresh lifecycle keys on. */
  def scoreVersioned(docs: DataFrame, model: DataFrame,
                     version: Int): DataFrame =
    scoreAgainstModel(docs, model).withColumn("scorer_version", lit(version))

  /** Selective REFRESH after a scorer rollout — the versioned face of
    * the lifecycle: rows already scored by the CURRENT model version
    * pass through untouched; only STALE rows (older scorer versions)
    * re-score, through the persisted current model. At 100 TB this is
    * the difference between a scorer upgrade costing one filtered
    * re-score of the stale fraction (a doc_id semi-join that pushes
    * into the corpus scan) and re-reading the whole archive. The
    * scorer is deterministic, so a refreshed table is BITWISE equal to
    * a from-scratch rebuild under the current model (spec'd). */
  def refreshStale(enriched: DataFrame, docs: DataFrame, model: DataFrame,
                   currentVersion: Int): DataFrame = {
    val fresh = enriched.where(col("scorer_version") === currentVersion)
    val staleIds = enriched.where(col("scorer_version") =!= currentVersion)
      .select(col("doc_id"))
    val rescored = scoreVersioned(
      docs.join(staleIds, Seq("doc_id"), "left_semi"), model, currentVersion)
    fresh.unionByName(rescored)
  }

  // ---------------------------------------------------------------------
  // Shared memoized enrichment — the build-once/consume-many entry point
  // ---------------------------------------------------------------------

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The per-(process, data-dir) MEMOIZED persisted enrichment: the first
    * consumer in a session pays the one corpus scan and writes the narrow
    * parquet; every later consumer reads it back (column-pruned scan of
    * ~0.1% of the corpus bytes, no regex/tokenizer in its plan). Scratch
    * is PID-suffixed and dead-process debris is swept on first touch
    * (the q227/q240 lifecycle-scratch discipline). Deterministic scorer ⇒
    * reading the table is value-identical to inlining the expressions. */
  def enrichedDocuments(spark: SparkSession, dir: String): DataFrame = {
    val path = cache.computeIfAbsent(dir, d => {
      val suffix = graft.SparkEntry.lifecycleScratchSuffix(spark, "enrich", d)
      val p = s"/tmp/graft_enrich_cache_$suffix"
      if (!new java.io.File(s"$p/_SUCCESS").exists()) {
        // REBALANCE before the write: the scorer stage is spread across
        // cores (spreadRead above), and writing the ~60-byte rows straight
        // from 32 compute tasks hands every consumer 32 tiny files (guide
        // §6). The hint keeps the compute stage wide and lets AQE coalesce
        // only the write side to advisory-sized files.
        scoreDocuments(graft.sources.Tables.documents(spark, d))
          .hint("rebalance")
          .write.mode("overwrite").parquet(p)
      }
      p
    })
    spark.read.parquet(path)
  }
}
