package graft

import graft.operators.QuantileSketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The mergeable quantile sketch: bitwise merge ≡ rebuild in both orders
  * (the property textbook KLL cannot give — the reason this sketch is the
  * dyadic histogram), exact quantiles when the universe fits the cap, and
  * the documented value/rank bounds against exact order statistics when
  * it does not. */
class QuantileSketchSpec extends SparkSuite {

  private def mkDf(rows: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  private val rnd = new scala.util.Random(41)
  // three groups with very different spreads; values out to ~1e9 so the
  // 64-bucket cap forces real coarsening (k > 0)
  private val wide = (1 to 3000).map { i =>
    val g = s"g${i % 3}"
    val v = (i % 3) match {
      case 0 => rnd.nextInt(1000).toLong                 // dense small
      case 1 => math.abs(rnd.nextLong()) % 1000000000L   // wide uniform
      case 2 => (1L << rnd.nextInt(30)) + rnd.nextInt(100) // heavy-tailed
    }
    (g, v)
  }

  test("merge == rebuild bitwise, both orders, uneven splits") {
    def canon(df: DataFrame): Seq[String] =
      df.orderBy("g", "bucket").collect().map(_.toString).toSeq
    val all = mkDf(wide)
    val full = canon(QuantileSketch.groupSketches(all, "g", col("v"), cap = 64))
    for (mod <- Seq(2L, 7L)) {
      val a = mkDf(wide.zipWithIndex.filter(_._2 % mod != 0).map(_._1))
      val b = mkDf(wide.zipWithIndex.filter(_._2 % mod == 0).map(_._1))
      val sa = QuantileSketch.groupSketches(a, "g", col("v"), cap = 64)
      val sb = QuantileSketch.groupSketches(b, "g", col("v"), cap = 64)
      val ab = canon(QuantileSketch.mergeSketches(sa, sb, "g", cap = 64))
      val ba = canon(QuantileSketch.mergeSketches(sb, sa, "g", cap = 64))
      assert(ab == full, s"merge(a,b) != rebuild (mod $mod)")
      assert(ba == full, s"merge(b,a) != rebuild (mod $mod)")
    }
  }

  test("cap-fitting universe: k = 0 and quantiles are EXACT order statistics") {
    val rows = (1 to 500).map(i => ("x", (i % 97).toLong)) // 97 distinct << cap
    val sk = QuantileSketch.groupSketches(mkDf(rows), "g", col("v"), cap = 4096)
    assert(sk.select(max(col("k"))).collect()(0).getInt(0) == 0)
    val got = QuantileSketch.quantiles(sk, "g", Seq(1, 25, 50, 90, 99, 100))
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    val sorted = rows.map(_._2).sorted
    for (p <- Seq(1, 25, 50, 90, 99, 100)) {
      val exact = sorted((p * sorted.size + 99) / 100 - 1) // ceil(p*n/100)-th
      assert(got(p) == ((exact, exact)), s"p$p: ${got(p)} vs $exact")
    }
  }

  test("coarse regime: the true quantile always lands inside [q_lo, q_hi]; k is minimal; rank error < bucket count") {
    val cap = 64
    val sk = QuantileSketch.groupSketches(mkDf(wide), "g", col("v"), cap = cap)
    // minimality: one level finer must overflow the cap for some group,
    // and every group's chosen level must be infeasible at k - 1
    val perGroup = sk.groupBy("g")
      .agg(max(col("k")).as("k"), count(lit(1)).as("nb"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val byG = wide.groupBy(_._1)
    perGroup.foreach { case (g, (k, _)) =>
      if (k > 0) {
        val finer = byG(g).map(_._2 >> (k - 1)).distinct.size
        assert(finer > cap, s"$g: level ${k - 1} had $finer <= $cap buckets — k not minimal")
      }
      assert(byG(g).map(_._2 >> k).distinct.size <= cap)
    }
    val qs = QuantileSketch.quantiles(sk, "g", Seq(10, 50, 90, 99)).collect()
    qs.foreach { r =>
      val (g, p, lo, hi) = (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))
      val sorted = byG(g).map(_._2).sorted
      val n = sorted.size
      val exact = sorted((p * n + 99) / 100 - 1)
      assert(exact >= lo && exact <= hi, s"$g p$p: $exact not in [$lo, $hi]")
      // rank bound: every value in the returned bucket sits within one
      // bucket count of the target rank
      val below = sorted.count(_ < lo).toLong
      val inBucket = sorted.count(v => v >= lo && v <= hi).toLong
      val target = (p.toLong * n + 99) / 100
      assert(below < target && target <= below + inBucket,
        s"$g p$p: target $target outside bucket ranks ($below, ${below + inBucket}]")
    }
  }
}
