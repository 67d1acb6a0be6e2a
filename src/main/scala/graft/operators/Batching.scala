package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Length-bucketed training batches: group documents of similar token
  * length, shuffle deterministically within each bucket, and cut the
  * bucket into fixed-size batches. The standard padding-waste reduction
  * for sequence training (uniform-length batch members pad to the bucket
  * ceiling instead of the corpus maximum — the bucketing trick every
  * seq2seq loader ships); the within-bucket order is content-keyed
  * (md5), so the "shuffle" is reproducible and repartition-stable, the
  * q74 shuffle-and-shard contract applied per bucket.
  *
  * ## Scale shape (100 TB)
  * The within-bucket ranking is [[Ranking.groupedRank]] — length buckets
  * are FEW (a handful of coarse bins over the corpus), so a
  * `PARTITION BY bucket` window would push a double-digit share of the
  * corpus through single tasks; groupedRank splits every bucket across
  * 16 md5-prefix sub-buckets with a (bucket × 16)-row broadcast offset
  * table, and its plan contains NO single-partition exchange at all.
  * Everything else is narrow per-row arithmetic.
  */
object Batching {

  /** Assigns every document `(bucket, batch_idx, pos_in_batch)`:
    * `bucket = n_tok DIV bucketWidth`, within-bucket order is
    * `(md5(seed:id), id)`, and consecutive runs of `batchSize` form a
    * batch (the bucket's tail batch may be short). Returns
    * `(idCol, n_tok, bucket, batch_idx, pos_in_batch)`. */
  def lengthBucketBatches(docs: DataFrame, idCol: String, textCol: String,
                          bucketWidth: Int, batchSize: Int,
                          seed: String = "batch"): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = docs.select(col(idCol),
      Text.tokenCount(col(textCol)).cast("long").as("n_tok"),
      // full 32-hex digest as the order key: fixed-length lowercase hex,
      // so lexicographic order IS numeric order and the first hex char is
      // an order-consistent 16-way sub-bucket
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))).as("_okey"))
      .withColumn("bucket", expr(s"n_tok DIV ${bucketWidth}L"))
    val ranked = Ranking.groupedRank(base, col("bucket"),
      substring(col("_okey"), 1, 1), col("_okey"), col(idCol))
    ranked
      .withColumn("batch_idx", expr(s"(rank - 1) DIV ${batchSize}L"))
      .withColumn("pos_in_batch", expr(s"(rank - 1) % ${batchSize}L"))
      .select(col(idCol), col("n_tok"), col("bucket"), col("batch_idx"),
        col("pos_in_batch"))
  }
}
