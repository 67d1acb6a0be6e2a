package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering of a table
  * on several columns so that a range predicate on ANY prefix-free subset
  * of them prunes most files — the `OPTIMIZE ZORDER BY` idea of the
  * lakehouse table formats (Delta/Iceberg), built from primitives Spark
  * already has: a pure bit-interleave expression + `repartitionByRange` on
  * the interleaved key + a per-file sort.
  *
  * Why this matters at 100 TB: a table laid out by ONE column (the default
  * sort-on-write) prunes scans only on that column — a predicate on any
  * other dimension reads every file. Interleaving the bits of d columns
  * gives every file a bounding BOX over all d dimensions with side
  * ~range/2^(bits/d), so a selective box predicate intersects — and reads
  * — a vanishing fraction of files. The layout pass itself is one range
  * exchange + local sort: no join, no global sort.
  *
  * The key is exact integer arithmetic (shift/mask/or), so unlike layout
  * heuristics it is ORACLE-CHECKABLE bit-for-bit across engines.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of each column: bit `i` of
    * column `k` lands at output bit `i·d + k` (d = number of columns).
    * Inputs must be non-negative and < 2^bits (the caller range-normalizes
    * anything else); `bits·d` must fit a signed long. Pure codegen'd
    * column expression — no UDF, no shuffle. */
  def zOrderKey(bits: Int, cols: Column*): Column = {
    val d = cols.length
    require(d >= 2, s"z-order needs >= 2 columns, got $d")
    require(bits >= 1 && bits * d <= 63, s"bits*cols must fit a long, got $bits*$d")
    val terms = for {
      i <- 0 until bits
      (c, k) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + k)
    terms.reduce(_ bitwiseOR _)
  }

  /** Compact a parquet directory into ~`targetBytes` files — the
    * small-files half of layout maintenance (a 100 TB ingest of per-batch
    * streaming writes leaves millions of KB-sized files; metadata and task
    * scheduling then dominate every scan). Sizing comes from the actual
    * on-disk byte count, and the rewrite is a `coalesce` — a NARROW
    * concatenation of existing partitions, no shuffle; rows never move
    * between executors, so the cost is one read + one write. Pair with
    * [[writeZOrdered]] when the rewrite should also re-cluster (that one
    * pays its range exchange deliberately). */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetBytes: Long = 128L << 20): Unit = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val files = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).coalesce(files)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Rewrite `df` into `files` parquet files under `path`, clustered by
    * the z-order of `cols`: range-partition on the interleaved key (file
    * boundaries = key quantiles, so files are balanced even under skew),
    * sort within each file, drop the scratch key. Downstream scans prune
    * via ordinary parquet min/max stats on the ORIGINAL columns — no
    * reader-side cooperation needed. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    files: Int, bits: Int = 21): Unit =
    df.withColumn("_z", zOrderKey(bits, cols.map(col): _*))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
