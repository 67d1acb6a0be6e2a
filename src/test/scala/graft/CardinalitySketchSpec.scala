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

  // the engine's md5 slot, brute-forced on the driver for oracle checks
  private def slotOf(u: Long, size: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % size
  }

  test("auto-resize: level = smallest non-saturated fold; merge across a resize boundary == rebuild at the common level bitwise; saturation only at the final size") {
    val m = 16; val maxLevel = 4 // sizes 16..256
    // three regimes: tiny (level 0), mid (forced past level 0), huge
    // (saturates every size -> maxLevel + saturated flag)
    val rows = (1L to 5L).map(u => ("small", u)) ++
      (1L to 100L).map(u => ("mid", u * 7)) ++
      (1L to 3000L).map(u => ("big", u * 13))
    def bruteLevel(keys: Seq[Long]): Int =
      (0 to maxLevel).find { j =>
        keys.map(slotOf(_, m.toLong << j)).distinct.size < (m << j)
      }.getOrElse(maxLevel)
    def bruteBitmap(keys: Seq[Long], level: Int): Set[Long] =
      keys.map(slotOf(_, m.toLong << level)).toSet
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val auto = CardinalitySketch.groupBitmapsAuto(mkDf(rows), "g", "u",
      m, maxLevel)
    val got = auto.collect()
      .groupBy(_.getString(0)).view
      .mapValues(rs => (rs.head.getInt(1), rs.map(_.getLong(2)).toSet)).toMap
    for ((g, keys) <- byG) {
      val lv = bruteLevel(keys)
      assert(got(g)._1 == lv, s"$g: level ${got(g)._1} vs brute $lv")
      assert(got(g)._2 == bruteBitmap(keys, lv), s"$g bitmap mismatch")
    }
    assert(got("small")._1 == 0 && got("big")._1 == maxLevel)
    // saturated ONLY for the group whose FINAL size is full
    val est = CardinalitySketch.estimatesLeveled(auto, "g", m).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.isNullAt(3), r.getBoolean(4)))).toMap
    assert(est("big")._4 && est("big")._3 && est("big")._1 == maxLevel.toLong)
    assert(!est("small")._4 && !est("small")._3)
    assert(!est("mid")._4 && !est("mid")._3)

    // resize boundary: two builds over DIFFERENT subsets (different auto
    // levels), merged both orders == brute rebuild of the union at the
    // common (min) level
    val a = rows.zipWithIndex.filter(_._2 % 3 != 0).map(_._1)
    val b = rows.zipWithIndex.filter(_._2 % 3 == 0).map(_._1)
    val sa = CardinalitySketch.groupBitmapsAuto(mkDf(a), "g", "u", m, maxLevel)
    val sb = CardinalitySketch.groupBitmapsAuto(mkDf(b), "g", "u", m, maxLevel)
    def canon(df: DataFrame): Seq[String] =
      df.orderBy("g", "level", "slot").collect().map(_.toString).toSeq
    val mAB = canon(CardinalitySketch.mergeLeveled(sa, sb, "g", m))
    assert(mAB == canon(CardinalitySketch.mergeLeveled(sb, sa, "g", m)))
    val byGa = a.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val byGb = b.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val want = byG.keys.toSeq.flatMap { g =>
      val lc = math.min(bruteLevel(byGa(g)), bruteLevel(byGb(g)))
      bruteBitmap((byGa(g) ++ byGb(g)).distinct, lc).toSeq.sorted
        .map(s => s"[$g,$lc,$s]")
    }.sorted
    assert(mAB.sorted == want, "merge != rebuild at common level")

    // maxLevel = 0 degenerates to the fixed-m family exactly
    val flat = CardinalitySketch.groupBitmaps(mkDf(rows), "g", "u", m)
      .withColumn("level", lit(0))
      .select(col("g"), col("level"), col("slot"))
    assert(canon(CardinalitySketch.groupBitmapsAuto(mkDf(rows), "g", "u",
        m, maxLevel = 0)) ==
      canon(flat))
  }
}
