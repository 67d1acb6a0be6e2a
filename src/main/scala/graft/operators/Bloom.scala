package graft.operators

import graft.functions.catalyst.{BloomCountContained, BloomMightContain, BloomOps, BloomPositions}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** A built Bloom filter over 8-byte keys: `words` is the packed bitset
  * (m = 64·words.length bits), `k` the probe count.
  *
  * Model-not-data, like the IVF centroid table ([[Similarity]]): its size is
  * fixed by the CHOSEN capacity (expectedItems, fpp) at build time —
  * ~1.2 GiB per 10⁹ keys at 1% fpp — independent of corpus size, and it
  * rides into executors as a plan-time literal the same way Spark's own
  * runtime-filter bloom does. */
case class BloomModel(words: Array[Long], k: Int) {
  def numBits: Long = words.length.toLong * 64L

  /** Membership probe column — codegen'd, no UDF, stays inside the scan
    * stage's WholeStageCodegen span. */
  def mightContain(key: Column): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expr(key),
      Literal.create(words, ArrayType(LongType, containsNull = false)), k))

  /** How many keys of an ARRAY<BIGINT> column the filter might contain —
    * one codegen'd call per row (see [[BloomCountContained]]). */
  def countContained(keys: Column): Column =
    GraftBridge.column(BloomCountContained(
      GraftBridge.expr(keys),
      Literal.create(words, ArrayType(LongType, containsNull = false)), k))
}

/** Distributed Bloom-filter build.
  *
  * Shape for 100 TB: each key maps to its k bit positions map-side
  * ([[BloomPositions]], codegen'd), the ONLY shuffle is the `bit_or`
  * aggregation keyed on the word index — at most m/64 groups regardless of
  * input size, with partial aggregation collapsing each partition's masks
  * before the exchange. The driver then assembles ≤ m/64 (word, bits) rows
  * into the packed array — collecting the MODEL, never the data (the same
  * contract as `df.stat.bloomFilter`, which also merges sketches at the
  * driver, and as the IVF centroid table).
  */
object Bloom {

  /** Build a filter over `keys(keyCol)` (BIGINT) sized for `expectedItems`
    * distinct keys at false-positive rate `fpp`. */
  def build(keys: DataFrame, keyCol: String, expectedItems: Long, fpp: Double): BloomModel = {
    val (numBits, k) = BloomOps.sizeFor(expectedItems, fpp)
    val numWords = (numBits / 64L).toInt
    val positions = GraftBridge.column(
      BloomPositions(GraftBridge.expr(col(keyCol).cast("long")), numBits, k))
    val rows = keys
      .select(explode(positions).as("pos"))
      .select(shiftright(col("pos"), 6).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("bits"))
      .collect() // ≤ numWords rows — bounded by the model size, not the data
    val words = new Array[Long](numWords)
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    BloomModel(words, k)
  }
}
