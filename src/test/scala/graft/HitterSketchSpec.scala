package graft

import graft.operators.HitterSketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The mergeable heavy-hitter summary: exact regime (cap ≥ distinct —
  * merge ≡ rebuild bitwise, top-k exact), and the approximate regime's
  * [lo, up] bracket against exact recounts. */
class HitterSketchSpec extends SparkSuite {

  private def mkDf(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "w")
  }

  private val rnd = new scala.util.Random(53)
  // zipf-ish key frequencies over two groups
  private val data = (1 to 4000).map { i =>
    val g = s"g${i % 2}"
    val w = s"w${(math.sqrt(rnd.nextInt(900).toDouble)).toInt}" // ~30 keys, skewed
    (g, w)
  }
  private def exact(rows: Seq[(String, String)]): Map[(String, String), Long] =
    rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact regime: merge == rebuild bitwise both orders; topK is the exact top-k") {
    def canon(df: DataFrame): Seq[String] =
      df.orderBy("g", "key").collect().map(_.toString).toSeq
    val full = canon(HitterSketch.groupHitters(mkDf(data), "g", "w", cap = 64))
    val a = mkDf(data.zipWithIndex.filter(_._2 % 3 != 0).map(_._1))
    val b = mkDf(data.zipWithIndex.filter(_._2 % 3 == 0).map(_._1))
    val sa = HitterSketch.groupHitters(a, "g", "w", cap = 64)
    val sb = HitterSketch.groupHitters(b, "g", "w", cap = 64)
    assert(canon(HitterSketch.mergeHitters(sa, sb, "g", cap = 64)) == full)
    assert(canon(HitterSketch.mergeHitters(sb, sa, "g", cap = 64)) == full)
    val got = HitterSketch.topK(
        HitterSketch.mergeHitters(sa, sb, "g", cap = 64), "g", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val ex = exact(data)
    for (g <- Seq("g0", "g1")) {
      val want = ex.toSeq.collect { case ((gg, w), c) if gg == g => (w, c) }
        .sortBy { case (w, c) => (-c, w) }.take(5)
      val have = got.filter(_._1 == g).sortBy(_._2)
        .map(t => (t._3, t._4))
      assert(have.toSeq == want, s"$g: $have vs $want")
      // exact regime: lo == up
      assert(got.filter(_._1 == g).forall(t => t._4 == t._5))
    }
  }

  test("approximate regime: [lo, up] brackets the true count for every reported key; dominant keys survive the merge") {
    val cap = 8 // far below the ~30 distinct keys
    val a = mkDf(data.zipWithIndex.filter(_._2 % 2 != 0).map(_._1))
    val b = mkDf(data.zipWithIndex.filter(_._2 % 2 == 0).map(_._1))
    val sa = HitterSketch.groupHitters(a, "g", "w", cap)
    val sb = HitterSketch.groupHitters(b, "g", "w", cap)
    val m = HitterSketch.mergeHitters(sa, sb, "g", cap).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ex = exact(data)
    m.foreach { case (g, w, lo, up, thr) =>
      val t = ex.getOrElse((g, w), 0L)
      assert(lo <= t && t <= up, s"($g,$w): true $t outside [$lo, $up]")
      assert(thr >= 0L)
    }
    // the single most frequent key per group (w0, by construction the
    // sqrt skew) clears every bound and must be rank 1 in the merge
    val top = HitterSketch.topK(
        HitterSketch.mergeHitters(sa, sb, "g", cap), "g", k = 1)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val want = Seq("g0", "g1").map { g =>
      g -> ex.toSeq.collect { case ((gg, w), c) if gg == g => (w, c) }
        .maxBy { case (w, c) => (c, w) }._1
    }.toMap
    assert(top == want, s"$top vs $want")
  }

  test("chained merges: a cap-evicted key's mass is absorbed into thr, so a re-introduced key's [lo, up] still brackets its true count") {
    // the round-11 advice's adversarial shape at cap = 1:
    //   batch A: X×10, Z×5  → build keeps X(10,10), thr = 5
    //   batch B: Y×8        → build keeps Y(8,8),  thr = 0
    //   A ⊕ B keeps Y (up = 5+8 = 13) and DROPS X with up = 10 — so
    //   thr' must rise to 10, not stay at thr_a + thr_b = 5
    //   batch C: X×1        → (A ⊕ B) ⊕ C re-introduces X: its bracket
    //   must contain the true total 11
    val cap = 1
    val bA = mkDf(Seq.fill(10)(("g", "X")) ++ Seq.fill(5)(("g", "Z")))
    val bB = mkDf(Seq.fill(8)(("g", "Y")))
    val bC = mkDf(Seq(("g", "X")))
    val sA = HitterSketch.groupHitters(bA, "g", "w", cap)
    val sB = HitterSketch.groupHitters(bB, "g", "w", cap)
    val sAB = HitterSketch.mergeHitters(sA, sB, "g", cap)
    val abRows = sAB.collect().map(r => (r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    assert(abRows.map(_._1).toSet == Set("Y"))
    assert(abRows.head._4 == 10L,
      s"merged thr must cover the dropped X's cnt_up=10, got ${abRows.head._4}")
    val sABC = HitterSketch.mergeHitters(sAB,
      HitterSketch.groupHitters(bC, "g", "w", cap), "g", cap)
    // keep rule at cap=1 picks the larger up; whichever key survives,
    // its bracket must contain its true total (X: 11, Y: 8)
    val truth = Map("X" -> 11L, "Y" -> 8L, "Z" -> 5L)
    sABC.collect().foreach { r =>
      val (w, lo, up) = (r.getString(1), r.getLong(2), r.getLong(3))
      assert(lo <= truth(w) && truth(w) <= up,
        s"$w: true ${truth(w)} outside [$lo, $up]")
    }
    // randomized chained case over three shifted batches: every
    // reported key brackets its true total, and every ABSENT key's
    // true total is <= the group's thr (the invariant the old
    // thr_a + thr_b rule broke)
    val cap2 = 6
    val batches = Seq(0, 1, 2).map(m =>
      data.zipWithIndex.filter(_._2 % 3 == m).map(_._1))
    val chained = batches
      .map(b => HitterSketch.groupHitters(mkDf(b), "g", "w", cap2))
      .reduceLeft((x, y) => HitterSketch.mergeHitters(x, y, "g", cap2))
    val rows = chained.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    val ex = exact(data)
    rows.foreach { case (g, w, lo, up, _) =>
      val t = ex.getOrElse((g, w), 0L)
      assert(lo <= t && t <= up, s"($g,$w): true $t outside [$lo, $up]")
    }
    for (g <- Seq("g0", "g1")) {
      val inG = rows.filter(_._1 == g)
      val present = inG.map(_._2).toSet
      val thr = inG.head._5
      ex.foreach { case ((gg, w), c) =>
        if (gg == g && !present(w))
          assert(c <= thr, s"absent ($g,$w) true $c > thr $thr")
      }
    }
  }
}
