package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are concatenated in a
  * deterministic global order (ascending id) and the token stream is
  * chunked into fixed-`budget` sequences — concat-then-chunk, the standard
  * GPT-style packing. Each document is assigned the sequence and offset
  * where it STARTS; a document crossing a chunk boundary spans through
  * `end_seq_id`.
  *
  * Scale shape — a distributed prefix sum, NOT a global window: rows are
  * range-bucketed by `id DIV bucketWidth` (monotone in id, so bucket-major
  * order IS global order), the running token count is a per-bucket window
  * frame (parallel across buckets), and each bucket's start offset comes
  * from a tiny per-bucket sum aggregate — #buckets rows, the only global
  * window in the plan — broadcast back onto the data. The data path never
  * collapses to one partition (the documented `mapAccumulate` cliff is
  * exactly what this construction avoids). At 100 TB, pick `bucketWidth`
  * from table stats so each bucket is roughly one shuffle partition.
  */
object Packing {

  /** @param df          input rows; one per document
    * @param idCol       non-negative integral id defining the pack order
    * @param nTokensCol  per-document token count (integral)
    * @param budget      tokens per packed sequence
    * @param bucketWidth id-range width per prefix-sum bucket
    * @return one row per document: `(id, n_tokens, seq_id, seq_off,
    *         end_seq_id)` where `seq_id = start DIV budget`,
    *         `seq_off = start MOD budget`, and `start` is the document's
    *         global token offset in the concatenated stream */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    budget: Long, bucketWidth: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val base = df.select(col(idCol), col(nTokensCol).cast("long").as("n_tokens"))
      .withColumn("_bkt", expr(s"$idCol DIV ${bucketWidth}L"))
    val wIn = Window.partitionBy(col("_bkt")).orderBy(col(idCol))
    // per-bucket totals, then each bucket's global start offset = sum of
    // all EARLIER buckets — a window over #buckets rows, not over data
    val bucketSums = base.groupBy(col("_bkt")).agg(sum(col("n_tokens")).as("_bs"))
    val wBkt = Window.orderBy(col("_bkt")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketSums.select(col("_bkt"),
      coalesce(sum(col("_bs")).over(wBkt), lit(0L)).as("_off"))
    base
      .withColumn("_cum", sum(col("n_tokens")).over(wIn)) // inclusive within bucket
      .join(broadcast(offsets), Seq("_bkt"))
      .withColumn("_start", col("_off") + col("_cum") - col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        expr(s"_start DIV ${budget}L").as("seq_id"),
        pmod(col("_start"), lit(budget)).as("seq_off"),
        // an empty document occupies no tokens: its span is just seq_id
        expr(s"(_start + CASE WHEN n_tokens > 0 THEN n_tokens - 1 ELSE 0L END) DIV ${budget}L")
          .as("end_seq_id"))
  }

  /** Per-key NEXT-FIT bin packing as a reusable operator (q57 runs the
    * same transition through the typed facade): within each `keyCol`
    * group, walk rows in `(orderCol, idCol)` order and assign 0-based
    * `bin_id`s — a row opens a new bin when the current bin's fill plus
    * its `tokensCol` would cross `cap` (an oversized row still gets a
    * bin of its own: next-fit never splits a row — splitting is
    * [[packSequences]]' concat-then-chunk contract instead).
    *
    * The transition state is `(bin, fill)` — a window cumsum cannot
    * express the reset, so this is the [[Sampling.takeUntilBudget]]
    * partition-sort-walk shape: one hash exchange on the key, linear
    * per-key work, keys partition the corpus (the training-assembly
    * caller keys by SHARD, so packing parallelizes across the training
    * fleet with zero global coordination). NULL token counts pack as 0.
    * Output: input columns + `bin_id`, `bin_fill` (fill AFTER placing
    * the row; both reserved names). */
  def nextFitPack(df: DataFrame, keyCol: String, orderCol: String,
                  idCol: String, tokensCol: String, cap: Long): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val reserved = Seq("bin_id", "bin_fill")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"nextFitPack reserves ${reserved.mkString(", ")}; input has ${clash.mkString(", ")}")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val ordered = df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol), col(idCol))
    val outSchema = StructType(ordered.schema.fields ++ Seq(
      StructField("bin_id", LongType, nullable = false),
      StructField("bin_fill", LongType, nullable = false)))
    val keyIdx = ordered.schema.fieldIndex(keyCol)
    val tokIdx = ordered.schema.fieldIndex(tokensCol)
    ordered.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var bin = 0L
      var fill = 0L
      rows.map { r =>
        val k = r.get(keyIdx)
        if (!started || !java.util.Objects.equals(k, curKey)) {
          curKey = k; started = true; bin = 0L; fill = 0L
        }
        val t = if (r.isNullAt(tokIdx)) 0L
                else r.get(tokIdx).asInstanceOf[Number].longValue()
        if (fill > 0L && fill + t > cap) { bin += 1L; fill = 0L }
        fill += t
        Row.fromSeq(r.toSeq :+ bin :+ fill)
      }
    }(Encoders.row(outSchema))
  }
}
