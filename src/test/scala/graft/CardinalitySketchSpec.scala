package graft

import graft.operators.CardinalitySketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The deterministic mergeable cardinality sketch: bit-union merge is
  * bitwise rebuild-equal in both orders, the estimate stays within the
  * linear-counting error envelope at moderate load, small groups are
  * near-exact, and saturation reports instead of lying. */
class CardinalitySketchSpec extends SparkSuite {

  private def mkDf(rows: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "u")
  }

  test("bit-union merge == rebuild bitwise both orders; duplicates never move the bitmap") {
    val rows = (1 to 5000).map(i => (s"g${i % 3}", (i % 1300).toLong))
    def canon(df: DataFrame): Seq[String] =
      df.orderBy("g", "slot").collect().map(_.toString).toSeq
    val full = canon(CardinalitySketch.groupBitmaps(mkDf(rows), "g", "u", m = 1024))
    for (mod <- Seq(2, 5)) {
      val a = mkDf(rows.zipWithIndex.filter(_._2 % mod != 0).map(_._1))
      val b = mkDf(rows.zipWithIndex.filter(_._2 % mod == 0).map(_._1))
      val sa = CardinalitySketch.groupBitmaps(a, "g", "u", m = 1024)
      val sb = CardinalitySketch.groupBitmaps(b, "g", "u", m = 1024)
      assert(canon(CardinalitySketch.mergeBitmaps(sa, sb, "g")) == full)
      assert(canon(CardinalitySketch.mergeBitmaps(sb, sa, "g")) == full)
    }
    // re-sending every row is absorbed for free (set semantics)
    val doubled = CardinalitySketch.mergeBitmaps(
      CardinalitySketch.groupBitmaps(mkDf(rows), "g", "u", m = 1024),
      CardinalitySketch.groupBitmaps(mkDf(rows ++ rows), "g", "u", m = 1024), "g")
    assert(canon(doubled) == full)
  }

  test("estimate within the linear-counting envelope at load ~1.2; near-exact small groups; saturation reports NULL") {
    // ~1200 true distinct per group over m = 1024 slots (load ~1.17)
    val rows = (1 to 40000).map(i => (s"g${i % 2}", (i % 1200 + (i % 2) * 10000).toLong))
    val est = CardinalitySketch.estimates(
        CardinalitySketch.groupBitmaps(mkDf(rows), "g", "u", m = 1024),
        "g", m = 1024)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getBoolean(3)))).toMap
    for (g <- Seq("g0", "g1")) {
      val (bits, Some(em), sat) = est(g)
      assert(!sat && bits < 1024L)
      val n = 600.0 // 1200 ids split evenly over two groups
      val rel = math.abs(em / 1e6 - n) / n
      assert(rel < 0.05, s"$g: est ${em / 1e6} vs $n (rel $rel)")
    }
    // tiny group: every key its own slot -> estimate ~ exact
    val small = CardinalitySketch.estimates(
        CardinalitySketch.groupBitmaps(
          mkDf((1 to 20).map(i => ("s", i.toLong))), "g", "u", m = 4096),
        "g", m = 4096).collect()(0)
    assert(small.getLong(1) == 20L)
    assert(math.abs(small.getLong(2) / 1e6 - 20.0) < 0.1)
    // saturated bitmap: NULL estimate, flagged
    val satRow = CardinalitySketch.estimates(
        CardinalitySketch.groupBitmaps(
          mkDf((1 to 2000).map(i => ("x", i.toLong))), "g", "u", m = 8),
        "g", m = 8).collect()(0)
    assert(satRow.getBoolean(3) && satRow.isNullAt(2))
  }
}
