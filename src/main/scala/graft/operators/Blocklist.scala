package graft.operators

import graft.functions.Text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-phrase BLOCKLIST matching — "which documents contain any of
  * these N phrases" at corpus scale: the compliance/safety filter pass
  * of a training pipeline (banned phrases, canary strings, eval-set
  * markers), where N is thousands of phrases and the corpus is 100 TB.
  * A per-row scan of all N patterns (regex alternation, or the classic
  * Aho–Corasick automaton) is O(text · automaton) PER ROW with an
  * opaque per-task trie; this instead re-expresses multi-pattern search
  * as the inverted-index move the engine already owns: a phrase of L
  * tokens appears in a document iff it equals one of the document's
  * L-token shingles, so matching is `explode(shingles) ⋈ phrases` — a
  * broadcast hash join against the (model-sized) blocklist, evaluated
  * inside the scan stage with zero shuffle of document text.
  *
  * Match semantics (exactly mirrorable in SQL, hence oracle-checkable):
  * token-boundary phrase match under [[Text.tokens]] normalization —
  * `"foo bar"` matches "Foo  BAR baz" but not "foobar".
  *
  * ## Scale shape (100 TB)
  * One pass per DISTINCT phrase token-length (the explode emits that
  * length's shingles; lengths are read off the blocklist — a
  * model-sized driver collect of the length SET only, like the IVF
  * centroid count). Each pass: scan-stage Generate → broadcast join →
  * the only exchange is the final distinct over MATCHED (doc, phrase)
  * pairs, which are report-sized. Dropping matched docs
  * ([[dropMatching]]) is a left-anti against matched ids — ids only,
  * bodies never shuffle. */
object Blocklist {

  /** Normalize the blocklist itself: `(phrase_norm, n_tok)` — distinct,
    * tokenized by the corpus tokenizer so "Foo  Bar" and "foo bar" are
    * one phrase. Empty/whitespace phrases are dropped. */
  def normalizedPhrases(spark: SparkSession, phrases: Seq[String]): DataFrame = {
    import spark.implicits._
    phrases.toDF("_raw")
      .select(array_join(Text.tokens(col("_raw")), " ").as("phrase"),
        size(Text.tokens(col("_raw"))).cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
      .distinct()
  }

  /** All `(idCol, phrase)` matches — one row per document × matched
    * phrase (distinct). `phrases` is the raw blocklist; matching is
    * token-boundary under shared normalization. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    // localCheckpoint (not persist): materialized once for the lens probe
    // and the per-length broadcasts, then freed by the ContextCleaner when
    // unreferenced — a bare persist() here leaked executor storage on
    // repeated calls in a long-lived session
    val plist = normalizedPhrases(spark, phrases).localCheckpoint(eager = true)
    // the phrase LENGTH SET is model metadata (like a centroid count):
    // one tiny collect decides how many shingle passes to plan
    val lens = plist.select(col("n_tok")).distinct()
      .collect().map(_.getLong(0).toInt).sorted
    val perLen = lens.map { l =>
      docs
        .select(col(idCol),
          explode(array_distinct(Text.fastWordShingles(col(textCol), l))).as("_sh"))
        .join(broadcast(plist.where(col("n_tok") === l.toLong)
          .select(col("phrase").as("_sh"), col("phrase"))), Seq("_sh"))
        .select(col(idCol), col("phrase"))
    }
    val all = perLen.reduceOption(_ unionAll _)
      .getOrElse(docs.select(col(idCol), lit("").as("phrase")).limit(0))
    all.distinct()
  }

  /** Per-document verdict for every document: `(idCol, n_blocked)` with
    * the count of DISTINCT matched phrases (0 for clean docs) — the
    * report form an audit wants. */
  def matchReport(docs: DataFrame, idCol: String, textCol: String,
                  phrases: Seq[String]): DataFrame =
    docs.select(col(idCol))
      .join(phraseMatches(docs, idCol, textCol, phrases)
        .groupBy(col(idCol)).agg(count(lit(1)).as("n_blocked")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_blocked"), lit(0L)).as("n_blocked"))

  /** The filter ACTION: the input minus every document matching any
    * phrase — a left-anti on matched ids (ids only; text never joins). */
  def dropMatching(docs: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[String]): DataFrame =
    docs.join(
      phraseMatches(docs, idCol, textCol, phrases).select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
