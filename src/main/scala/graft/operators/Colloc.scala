package graft.operators

import graft.functions.Text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointwise-mutual-information collocation mining (Church & Hanks 1990):
  * adjacent token pairs that co-occur far more than their unigram
  * frequencies predict — multi-word expressions, boilerplate signatures,
  * templated spans. A pipeline uses the top-PMI list to spot machine-
  * generated repetition and to protect phrases from naive tokenization.
  *
  * Exactness follows [[LmScore]]'s micro-nat scheme: PMI is computed ONCE
  * per distinct bigram from exact BIGINT counts, quantized to
  * round(ln·10⁶) at that single site — no float ever rides an aggregation,
  * so results are repartition-stable and oracle-exact (the double
  * arithmetic inside the ln is a fixed left-associated shape both engines
  * evaluate identically; libm-boundary risk is the documented ~1e-10
  * per-term coincidence).
  *
  * ## Scale shape (100 TB)
  * Two partial-aggregable counts (bigram, unigram) off one tokenized scan
  * — document bodies never shuffle; the join of bigram counts to the two
  * unigram sides is vocabulary-sized (AQE handles the stop-word skew);
  * N is a scalar broadcast. Top-k lands in TakeOrdered (per-partition
  * heaps + driver merge of k), never a global sort. */
object Colloc {

  /** Corpus-wide adjacent-bigram PMI in integer micro-nats. Returns
    * (w1, w2, c_pair, pmi_unats) for pairs with c_pair >= minCount. */
  def pmi(docs: DataFrame, idCol: String, textCol: String, minCount: Long = 5L): DataFrame = {
    val base = docs.select(Text.tokens(col(textCol)).as("t"))
    val pairs = base
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
    val uni = base.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val total = broadcast(uni.agg(sum(col("cu")).as("n_total")))

    pairs
      .where(col("c_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("cu").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), Seq("w2"))
      .crossJoin(total)
      // fixed left-associated double shape — the oracle mirrors it verbatim
      .withColumn("pmi_unats",
        round(log(col("c_pair").cast("double") * col("n_total").cast("double") /
          col("c1").cast("double") / col("c2").cast("double")) * lit(1e6)).cast("long"))
      .select(col("w1"), col("w2"), col("c_pair"), col("pmi_unats"))
  }
}
