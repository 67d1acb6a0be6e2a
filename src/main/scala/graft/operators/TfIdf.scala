package graft.operators

import graft.functions.Text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction: the classic corpus-statistics text scorer
  * (Sparck Jones 1972 idf; smooth variant `ln((N+1)/(df+1)) + 1`, the
  * formulation scikit-learn popularized — never zero, never divides by
  * zero). */
object TfIdf {

  /** Top-`k` terms per document by tf·idf, ties broken by term ascending.
    * Output: (id, rank, term, tf, df) — the SCORE is deliberately not a
    * column: `ln` is not ulp-identical across engines/libms, so exposing
    * it would make an otherwise-deterministic output hash-flaky; tf and
    * df are the exact integers the score derives from. The RANKS are
    * cross-engine checkable (q73's oracle recomputes them in DuckDB from
    * the same integers): a mathematical score tie between different
    * (tf, df) pairs cannot occur — it would equate a rational with a
    * ratio of shifted logs of rationals — and equal (tf, df) ties break
    * by term on both engines.
    *
    * Scale shape: tf is one aggregation on (doc, term), df one aggregation
    * on term (both partial-agg'd, short keys), the idf join is an
    * equi-join on the term, and the top-k is a per-doc window — no pass
    * ever moves document bodies, and nothing is quadratic. N (corpus size)
    * is a scalar count action: model, not data, like the Bloom sizing. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = docs.count()
    val tf = docs
      .select(col(idCol).as("id"), explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("term"))
      .withColumn("_score",
        col("tf").cast("double") *
          (log((lit(n + 1.0)) / (col("df").cast("double") + 1.0)) + 1.0))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("_score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"))
  }
}
