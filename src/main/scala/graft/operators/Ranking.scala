package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global order statistics without a global sort-to-one-partition:
  * the distributed answer to "rank every row / take the top fraction" that
  * `row_number() OVER (ORDER BY ...)` (a SinglePartition window — the
  * canonical scale-killer) cannot give. Same two-level scheme as
  * [[Packing.packSequences]]: a deterministic VALUE bucket plays the role
  * of the range partition, ranks are local to each bucket, and each
  * bucket's global start offset is a prefix sum over #buckets rows riding
  * a broadcast — data shuffles once, on the bucket key.
  *
  * Buckets come from `floor(value / bucketWidth)` rather than sampled
  * quantiles deliberately: sampled range boundaries are run-dependent
  * (Spark's range partitioner re-samples every execution), while the
  * value-derived bucket makes the whole plan deterministic and
  * oracle-checkable. The trade is that the caller picks `bucketWidth` to
  * match the value distribution (aim for hundreds-to-thousands of
  * buckets); a pathological single-value distribution degrades to one
  * bucket — the same failure mode sampled ranges have on one repeated
  * key. */
object Ranking {

  /** 1-based exact global rank of every row by (`valueCol` asc, `tieCols`
    * asc). `valueCol` must be integral; ties beyond `tieCols` must not
    * exist (supply a unique id as the last tiebreak — ranks are then a
    * permutation, repartition-stable and engine-independent). Adds a
    * `rank` column; `_bkt`/`_rn`/`_off`/`rank` must not already exist. */
  def globalRank(df: DataFrame, valueCol: String, bucketWidth: Long,
                 tieCols: String*): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("_bkt", "_rn", "_off", "rank")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"input must not already contain column $r"))
    // exact floor division (DIV truncates, but v - pmod(v, w) is an exact
    // multiple of w, so truncation IS floor — no double arithmetic)
    val base = df.withColumn("_bkt",
      expr(s"($valueCol - pmod($valueCol, ${bucketWidth}L)) DIV ${bucketWidth}L"))
    val wIn = Window.partitionBy(col("_bkt"))
      .orderBy((col(valueCol) +: tieCols.map(col)).map(_.asc): _*)
    val counts = base.groupBy(col("_bkt")).agg(count(lit(1)).as("_bc"))
    // prefix sum over #buckets rows — a model-sized frame, not a data window
    val wBkt = Window.orderBy(col("_bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(col("_bkt"),
      coalesce(sum(col("_bc")).over(wBkt), lit(0L)).as("_off"))
    base
      .withColumn("_rn", row_number().over(wIn))
      .join(broadcast(offsets), Seq("_bkt"))
      .withColumn("rank", col("_off") + col("_rn"))
      .drop("_bkt", "_rn", "_off")
  }
}
