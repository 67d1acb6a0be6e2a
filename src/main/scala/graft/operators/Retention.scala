package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention over an event log: group users by the time bucket of
  * their FIRST event (the cohort), then count how many of each cohort are
  * still active 0, 1, 2, … buckets later. The corpus-ops use: contributor
  * / source retention — which ingestion cohorts keep producing data.
  *
  * ## Scale shape (100 TB)
  * A single window min over `partition by user` finds each user's first
  * event without a self-join (ONE hash exchange on the user, reused by
  * nothing downstream that needs re-partitioning), then a narrow integer
  * projection and one countDistinct aggregate. Bucket arithmetic is
  * integer `div` on epoch milliseconds — no double division, no date
  * formatting — so cohort and offset are exact BIGINTs on any engine. */
object Retention {

  /** One row per (cohort_bucket, bucket_offset): distinct users from that
    * cohort active in that bucket. Buckets are `floor(epochMs / bucketMs)`
    * (default one week); offset 0 is the cohort's own bucket, so every
    * cohort has at least its offset-0 row. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucketMs: Long = 7L * 24 * 3600 * 1000): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive: $bucketMs")
    val byUser = Window.partitionBy(col(userCol))
    events
      .withColumn("_ms", unix_millis(col(tsCol)))
      .withColumn("_t0ms", min(col("_ms")).over(byUser))
      .select(
        col(userCol),
        expr(s"_t0ms div ${bucketMs}L").as("cohort_bucket"),
        (expr(s"_ms div ${bucketMs}L") - expr(s"_t0ms div ${bucketMs}L")).as("bucket_offset"))
      .groupBy(col("cohort_bucket"), col("bucket_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
  }
}
