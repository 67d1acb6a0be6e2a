package graft.operators

import graft.functions.catalyst.BloomPositions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over 8-byte keys —
  * the point-FREQUENCY member of the sketch family (HLL estimates
  * cardinality, SpaceSaving surfaces the top-k, GK ranks, Bloom answers
  * membership; CMS answers "about how often does THIS key occur" for
  * every key at once in fixed memory). Pipeline use: per-token/shingle
  * frequency service for filtering thresholds without materializing the
  * full count table.
  *
  * Guarantees: `estimate ≥ true` ALWAYS (counts only ever collide
  * upward), and `estimate ≤ true + (e/width)·N` with probability
  * `1 − e^(−depth)` — both spec-measured. Unlike SpaceSaving the
  * structure is LINEAR: cells are plain sums, so the sketch is
  * merge-order independent and `build(a ∪ b)` equals the cellwise sum
  * of `build(a)` and `build(b)` exactly (spec-asserted) — the property
  * that makes per-partition partial aggregation and cross-day sketch
  * merging trivially correct.
  *
  * ## Scale shape (100 TB)
  * [[graft.operators.Bloom]]'s contract verbatim: each key maps to its
  * `depth` row-cells map-side ([[BloomPositions]] — the same
  * Kirsch–Mitzenmacher double hashing over splitmix64, here modulo
  * `width`), the only shuffle is a partial-aggregable sum keyed on the
  * cell index — at most depth·width groups regardless of input size —
  * and the driver collects the MODEL (depth·width longs), never the
  * data. Estimates ride the plan as a literal-array lookup: `depth`
  * O(1) `element_at` probes + one `least`, all codegen'd, no UDF. */
object CountMin {

  /** Build a sketch over `keys(keyCol)` (BIGINT — hash wider values to
    * 8 bytes first, e.g. [[Dedup.shingleKey]]). `weightCol` switches
    * occurrence counting to weighted sums. */
  def build(keys: DataFrame, keyCol: String, depth: Int, width: Int,
            weightCol: Option[String] = None): CmsModel = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    require(depth.toLong * width <= Int.MaxValue, "depth*width must fit an array")
    val pos = GraftBridge.column(BloomPositions(
      GraftBridge.expr(col(keyCol).cast("long")), width.toLong, depth))
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    // min(w) rides the total pass, which runs BEFORE the cell pass: a
    // negative weight voids the one-sided estimate >= true guarantee
    // (cells could undercount), so reject it at build time rather than
    // ship a corrupt sketch
    val totRow = keys.agg(sum(w).as("n"), min(w).as("minw")).collect()(0)
    require(totRow.isNullAt(1) || totRow.getLong(1) >= 0L,
      s"weights must be >= 0 (found min weight ${totRow.getLong(1)}): " +
        "negative weights void the one-sided estimate >= true guarantee")
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val rows = keys
      .select(posexplode(pos).as(Seq("i", "p")), w.as("w"))
      .select((col("i").cast("long") * width + col("p")).as("cell"), col("w"))
      .groupBy(col("cell")).agg(sum(col("w")).as("cnt"))
      .collect() // ≤ depth·width rows — bounded by the model, not the data
    val table = new Array[Long](depth * width)
    rows.foreach(r => table(r.getLong(0).toInt) = r.getLong(1))
    CmsModel(depth, width, table, total)
  }
}

/** A built count-min sketch: `table` is the row-major depth×width counter
  * matrix, `total` the summed insert weight (the N in the ε·N error
  * bound). Model-not-data, exactly like [[BloomModel]] and the IVF
  * centroid table: its size is chosen at build time and it rides into
  * executors as a plan literal. */
case class CmsModel(depth: Int, width: Int, table: Array[Long], total: Long) {

  /** Point-frequency estimate for a BIGINT key column: min over the
    * depth rows of each row's cell — codegen'd literal-array lookups,
    * no UDF, stays inside the scan stage. */
  def estimate(key: Column): Column = {
    val pos = GraftBridge.column(BloomPositions(
      GraftBridge.expr(key.cast("long")), width.toLong, depth))
    val t = lit(table)
    val cells = (0 until depth).map(i =>
      element_at(t, (element_at(pos, i + 1) + lit(i.toLong * width)).cast("int") + 1))
    if (depth == 1) cells.head else least(cells: _*)
  }

  /** Cellwise sum — the exact sketch of the union of the two build
    * inputs (linearity; spec-asserted against a from-scratch build). */
  def merge(other: CmsModel): CmsModel = {
    require(depth == other.depth && width == other.width,
      s"sketch shapes differ: ${depth}x$width vs ${other.depth}x${other.width}")
    val merged = new Array[Long](table.length)
    var i = 0
    while (i < table.length) { merged(i) = table(i) + other.table(i); i += 1 }
    CmsModel(depth, width, merged, total + other.total)
  }

  /** The (e/width)·N additive bound each estimate honors with
    * probability 1 − e^(−depth). */
  def errorBound: Double = math.E / width * total
}
