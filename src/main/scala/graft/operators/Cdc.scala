package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: collapse a changelog to latest-wins
  * state, MERGE it into a snapshot, or unroll it into SCD-2 validity
  * history — the ingestion side of a training-data pipeline (upstream
  * crawls and label stores arrive as change streams, not snapshots).
  *
  * Reference scope: zio-analytics models only static `fromLiterals`
  * sources (DataStream.scala:42); changelog semantics are part of this
  * engine's production surface, like the incremental-dedup family
  * (q63/q66).
  *
  * ## Scale shape (100 TB)
  * [[latestState]] is a single partial-aggregable `max_by` over a packed
  * struct — one shuffle on the key, map-side combine collapses hot keys
  * before the exchange (no per-key window, no sort). [[merge]] is one
  * equi-join between the snapshot and the collapsed changelog (key-sized,
  * not event-sized); AQE broadcasts it when a day's changes are small
  * relative to the snapshot. [[scd2]] is per-key window work: one
  * shuffle+sort on the key, then lag/lead within the partition — rows per
  * key are bounded by that key's change count, never by table size. */
object Cdc {

  /** Latest-wins collapse: one row per `keyCol` holding the full row with
    * the greatest `seqCols` tuple (lexicographic; supply a unique final
    * tiebreak — e.g. an event id — so the winner is total-order
    * deterministic). Implemented as `max_by(struct(*), struct(seq))`:
    * partial-aggregable, so a key with a million changes collapses
    * map-side instead of sorting them. */
  def latestState(changelog: DataFrame, keyCol: String, seqCols: Seq[String]): DataFrame = {
    val payload = changelog.columns.filter(_ != keyCol)
    changelog
      .groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col): _*),
        struct(seqCols.map(col): _*)).as("_last"))
      .select(col(keyCol) +: payload.map(c => col(s"_last.$c").as(c)): _*)
  }

  /** MERGE a collapsed changelog into a snapshot. `ops` must hold one row
    * per key (use [[latestState]]) with an `opCol` in {"U","D"} and
    * otherwise the snapshot's schema: "U" upserts (replaces the base row,
    * or inserts when the key is new), "D" removes the key. Keys absent
    * from `ops` pass through untouched. One full-outer equi-join on the
    * key; every output column is `coalesce(change, base)`. */
  def merge(base: DataFrame, ops: DataFrame, keyCol: String, opCol: String = "_op"): DataFrame = {
    require(ops.columns.contains(opCol), s"ops must carry the op column $opCol")
    val valueCols = base.columns.filter(_ != keyCol)
    require(valueCols.forall(ops.columns.contains),
      s"ops must cover the snapshot schema; missing ${valueCols.filterNot(ops.columns.contains).mkString(",")}")
    val b = base.select(col(keyCol) +: valueCols.map(c => col(c).as(s"_b_$c")): _*)
    val o = ops.select((keyCol +: opCol +: valueCols).map(col): _*)
    b.join(o, Seq(keyCol), "full_outer")
      .where(col(opCol).isNull || col(opCol) =!= "D")
      .select(col(keyCol) +: valueCols.map(c =>
        when(col(opCol).isNotNull, col(c)).otherwise(col(s"_b_$c")).as(c)): _*)
  }

  /** SCD-2 history: compress each key's change stream into runs of equal
    * `stateCols` (consecutive duplicates carry no new information) and
    * emit one versioned validity interval per run — (key, version,
    * valid_from, valid_to, state...), `valid_to` null for the open
    * current version. `seqCol` must be integral (epoch millis);
    * `tieCols` break equal timestamps deterministically. Run boundaries
    * via lag-inequality, versions via a per-key running count, interval
    * ends via lead over the boundary rows — all inside one per-key
    * sort, so the whole history build is a single exchange. */
  def scd2(changelog: DataFrame, keyCol: String, seqCol: String,
           stateCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("version", "valid_from", "valid_to", "_chg")
    reserved.foreach(r => require(!changelog.columns.contains(r),
      s"input must not already contain column $r"))
    val ord = (col(seqCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val state = struct(stateCols.map(col): _*)
    // boundary = first event of a run of identical state; null-safe so the
    // first row (null lag) and null-bearing states both compare correctly
    val bounded = changelog.withColumn("_chg", !(lag(state, 1).over(w) <=> state))
    val runs = bounded.where(col("_chg"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
    runs.select((col(keyCol) +: col("version") +: col("valid_from") +:
      col("valid_to") +: stateCols.map(col)): _*)
  }

  /** SNAPSHOT DIFF between two corpus versions, keyed by id and compared
    * by content fingerprint: `added` (id only in the new version),
    * `removed` (only in the old), `changed` (both, different content),
    * `unchanged` — the crawl-to-crawl dataset-versioning report that
    * drives incremental reprocessing (only `added`+`changed` re-enter the
    * pipeline; `removed` propagates deletes). Fingerprints are md5 of the
    * content column computed INSIDE each scan, so the join carries (id,
    * 32-hex) — document bodies never shuffle. One id-keyed full-outer
    * join (bucket both snapshots on id and it co-locates); everything
    * else is narrow. Presence is tracked with explicit per-side flags
    * (NOT fingerprint nullability), so a row with NULL content still
    * reads as present — its fingerprint is NULL and NULL<=>NULL compares
    * as `unchanged`, never as a phantom add/remove. Ids must be unique
    * per snapshot (duplicate ids fan out through the full-outer join —
    * dedup upstream with [[Dedup.exact]] if the source can repeat).
    * Returns `(id, status, old_fp, new_fp)`. */
  def snapshotDiff(oldVer: DataFrame, newVer: DataFrame,
                   idCol: String, contentCol: String): DataFrame = {
    val o = oldVer.select(col(idCol).as("id"), md5(col(contentCol)).as("old_fp"),
      lit(true).as("_in_old"))
    val n = newVer.select(col(idCol).as("id"), md5(col(contentCol)).as("new_fp"),
      lit(true).as("_in_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(col("old_fp") <=> col("new_fp"), "unchanged")
          .otherwise("changed"))
      .select(col("id"), col("status"), col("old_fp"), col("new_fp"))
  }
}
