package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INTERVAL-OVERLAP analytics WITHOUT a pair join — "how many
  * concurrent maintenance windows / competing sessions / active
  * campaigns does each interval see?" answered by endpoint counting:
  * a closed interval `[s, e]` of A overlaps `b ∈ B` iff
  * `b.start ≤ e ∧ b.end ≥ s`, and since the two disjointness cases
  * (`b.start > e`, `b.end < s`) are mutually exclusive for well-formed
  * intervals,
  *
  *   `n_overlap(a) = #{b.start ≤ a.end} − #{b.end < a.start}`
  *
  * — two order-statistic lookups against B's endpoint multisets. The
  * naive formulation is a range-predicate join whose pair universe is
  * quadratic in per-bucket concurrency (exactly what kills session-
  * overlap jobs at scale); this one never materializes a pair.
  *
  * ## Scale shape (100 TB)
  * Each lookup is a MERGE sweep: union B's endpoints (tag 1) with A's
  * probes (tag 0), then one two-level prefix sum of the tag — per-bucket
  * window partitions (caller supplies the bucketing, e.g. day-of-epoch)
  * plus a broadcast bucket-offset table (the [[Ranking.globalRankBy]] /
  * spearman-histogram shape: nothing single-partition is data-sized).
  * Total work: two sorts of |A|+|B| rows WITHIN buckets + two
  * hash joins back to A by probe id. Counts are exact BIGINTs; ties
  * resolve by tag order (events before probes for ≤, after for <), so
  * the result is independent of any within-tie ordering. */
object Intervals {

  /** For each A interval: the count of B intervals it overlaps (closed
    * endpoints, integer timelines — callers pass epoch-ms). Returns A's
    * (idCol, aStart, aEnd) plus `n_overlap`. `bucketOf` maps a timeline
    * value to its prefix-sum bucket (integral, order-consistent). */
  def overlapCounts(a: DataFrame, idCol: String, aStart: String, aEnd: String,
                    b: DataFrame, bStart: String, bEnd: String,
                    bucketOf: Column => Column): DataFrame = {
    // the counting identity REQUIRES well-formed intervals (start <= end
    // makes the two disjointness cases mutually exclusive); an inverted
    // interval would silently undercount, so refuse it in-plan. The
    // checked zero is folded into the probe value to force evaluation.
    def guard(df: DataFrame, s: String, e: String, side: String): Column =
      when(col(s).cast("long") > col(e).cast("long"), raise_error(concat(
        lit(s"overlapCounts: inverted $side interval: "),
        col(s).cast("string"), lit(".."), col(e).cast("string"))))
        .otherwise(lit(0L))
    val probesLe = a.select(col(idCol).as("_id"),
      (col(aEnd).cast("long") + guard(a, aStart, aEnd, "A")).as("_v"))
    val probesLt = a.select(col(idCol).as("_id"), col(aStart).cast("long").as("_v"))
    val le = mergeCount(probesLe,
      b.select((col(bStart).cast("long") + guard(b, bStart, bEnd, "B")).as("_v")),
      bucketOf, countEqual = true)
    val lt = mergeCount(probesLt,
      b.select(col(bEnd).cast("long").as("_v")), bucketOf, countEqual = false)
    a.join(le.select(col("_id").as(idCol), col("cnt").as("_le")), Seq(idCol))
      .join(lt.select(col("_id").as(idCol), col("cnt").as("_lt")), Seq(idCol))
      .select(col(idCol), col(aStart), col(aEnd),
        (col("_le") - col("_lt")).as("n_overlap"))
  }

  /** For each probe row `(_id, _v)`: the number of event values
    * `≤ _v` (countEqual) or `< _v` (!countEqual) — the merge-sweep
    * order statistic. Probe ids must be unique. */
  private def mergeCount(probes: DataFrame, events: DataFrame,
                         bucketOf: Column => Column,
                         countEqual: Boolean): DataFrame = {
    // event rows carry a NULL id of the PROBES' OWN id type: casting
    // probe ids to long here silently nulled string/uuid ids and the
    // join back in overlapCounts returned an empty frame with no error
    val idType = probes.schema("_id").dataType
    val tagged = events
      .select(col("_v"), lit(null).cast(idType).as("_id"), lit(1L).as("_e"))
      .unionByName(probes.select(col("_v"), col("_id"), lit(0L).as("_e")))
      .withColumn("_b", bucketOf(col("_v")))
    // at equal _v: events sort BEFORE probes for <=, AFTER for <
    val tieOrder = if (countEqual) col("_e").desc else col("_e").asc
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_v").asc, tieOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tagged.groupBy(col("_b")).agg(sum(col("_e")).as("_bc"))
      .select(col("_b"), coalesce(sum(col("_bc")).over(wOff), lit(0L)).as("_off"))
    tagged
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("_cum", col("_off") + sum(col("_e")).over(wIn))
      .where(col("_e") === 0L)
      .select(col("_id"), col("_cum").as("cnt"))
  }
}
