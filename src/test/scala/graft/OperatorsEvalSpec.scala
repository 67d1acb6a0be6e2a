package graft

import graft.operators.{AsOf, Dedup, Sessionize, Similarity}
import graft.functions.{Text, Vectors}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Operator unit tests: statistics/eval-tier operators (split from OperatorsSpec, round 11 — bodies verbatim). */
class OperatorsEvalSpec extends SparkSuite {

  test("aucExact: midrank tie handling, perfect and reversed separation") {
    import spark.implicits._
    import graft.operators.Eval
    def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Long, Double) = {
      val df = rows.zipWithIndex.map { case ((s, p), i) => (s, p, i.toLong) }
        .toDF("s", "pos", "id")
      val r = Eval.aucExact(df, col("s"), col("pos"),
        floor(col("s")).cast("long"), col("id")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    // pos {3, 2}, neg {2, 1}: pairs 3>2, 3>1, 2=2 (half), 2>1 -> 3.5/4
    val (np, nn, _, a) = auc(Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false)))
    assert(np == 2L && nn == 2L && a == 0.875)
    // perfect separation -> 1.0; reversed -> 0.0
    assert(auc(Seq((5.0, true), (4.0, true), (2.0, false), (1.0, false)))._4 == 1.0)
    assert(auc(Seq((1.0, true), (2.0, false)))._4 == 0.0)
    // all ties -> 0.5 exactly (every pair counts half)
    assert(auc(Seq((7.0, true), (7.0, false), (7.0, true), (7.0, false)))._4 == 0.5)
    // single-class input -> NULL auc, not a crash or a lie
    val oneClass = Seq((1.0, true, 1L), (2.0, true, 2L)).toDF("s", "pos", "id")
    val r = Eval.aucExact(oneClass, col("s"), col("pos"),
      floor(col("s")).cast("long"), col("id")).collect()(0)
    assert(r.getLong(1) == 0L && r.isNullAt(3))
  }

  test("calibrationBins: equi-depth sizes, exact rates, order-free bounds") {
    import spark.implicits._
    import graft.operators.Eval
    // scores 1..20; positives are the top half -> low bins rate 0, high 1
    val df = (1L to 20L).map(i => (i.toDouble, i > 10, i)).toDF("s", "pos", "id")
    val out = Eval.calibrationBins(df, col("s"), col("pos"),
        floor(col("s") / 5).cast("long"), col("id"), bins = 4)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._2).toSeq == Seq(5L, 5L, 5L, 5L), "bins must be equi-depth")
    assert(out.map(_._3).toSeq == Seq(0L, 0L, 5L, 5L))
    assert(out.map(_._4).toSeq == Seq(0.0, 0.0, 1.0, 1.0))
  }

  test("spearmanExact: monotone = 1, reversed = -1, ties via midranks, constant = NULL") {
    import spark.implicits._
    import graft.operators.Eval
    def rho(data: Seq[(Long, Double)]): java.lang.Double = {
      val r = Eval.spearmanExact(data.toDF("x", "y"),
        col("x"), col("y"), expr("x DIV 8"),
        floor(col("y")).cast("long")).collect()(0)
      if (r.isNullAt(4)) null else r.getDouble(4)
    }
    assert(rho((1L to 40L).map(i => (i, i * 2.0))) == 1.0)
    assert(rho((1L to 40L).map(i => (i, -3.0 * i))) == -1.0)
    // hand midrank case: x = 1,2,3,4; y = 1,1,2,2 (ties)
    // doubled midranks y: (1+2)=3,3,(3+4)=7,7 - 5 -> u_y = -2,-2,2,2
    // doubled x ranks: 2,4,6,8 - 5 -> -3,-1,1,3; suv = 6+2+2+6 = 16
    // suu = 9+1+1+9 = 20; svv = 16; rho = 16/sqrt(320)
    val t = rho(Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0)))
    assert(math.abs(t - 16.0 / math.sqrt(320.0)) < 1e-15)
    // constant variable: no ordering information -> NULL
    assert(rho((1L to 10L).map(i => (i, 5.0))) == null)
  }

  test("ndcgAtK: exact micro-unit weights, ideal ordering, zero-gain NULL") {
    import spark.implicits._
    import graft.operators.Eval
    // (score, gain, id): system order 1,2,3; ideal order 2,3,1
    val df = Seq((10L, 0L, 1L), (9L, 2L, 2L), (8L, 1L, 3L)).toDF("s", "g", "id")
    val r = Eval.ndcgAtK(df, col("s"), col("g"), col("id"), k = 2).collect()(0)
    // w1 = 1e6, w2 = round(1e6/log2(3)) = 630930
    assert(r.getLong(1) == 2L * 630930L)                 // dcg: gains 0, 2
    assert(r.getLong(2) == 2L * 1000000L + 630930L)      // idcg: gains 2, 1
    assert(math.abs(r.getDouble(3) - 1261860.0 / 2630930.0) < 1e-15)
    // perfect ranking: ndcg = 1 exactly (identical BIGINT sums)
    val perfect = Seq((10L, 5L, 1L), (9L, 3L, 2L), (8L, 1L, 3L)).toDF("s", "g", "id")
    assert(Eval.ndcgAtK(perfect, col("s"), col("g"), col("id"), 3)
      .collect()(0).getDouble(3) == 1.0)
    // all-zero gains: NULL, not 0/0
    val zero = Seq((10L, 0L, 1L)).toDF("s", "g", "id")
    assert(Eval.ndcgAtK(zero, col("s"), col("g"), col("id"), 2).collect()(0).isNullAt(3))
  }

  test("pearsonExact: perfect line, anti-line, constant NULL, exact moments") {
    import spark.implicits._
    import graft.operators.Eval
    def r(pts: Seq[(Long, Long)]): Row =
      Eval.pearsonExact(pts.toDF("x", "y"), col("x"), col("y")).collect()(0)
    // y = 2x + 1 over x = 1,2,3: covn = 3*34-6*15 = 12, vxn = 6, vyn = 24
    val p = r(Seq((1L, 3L), (2L, 5L), (3L, 7L)))
    // sqrt(6)*sqrt(24) rounds one ulp below 12, so r lands one ulp above
    // 1 — the documented sqrt-tail ulp; both engines compute it identically
    assert(p.getLong(0) == 3L && p.getDouble(1) == 12.0 &&
      p.getDouble(2) == 6.0 && p.getDouble(3) == 24.0 &&
      math.abs(p.getDouble(4) - 1.0) < 1e-15)
    assert(math.abs(r((1L to 50L).map(i => (i, 100L - 3L * i))).getDouble(4) + 1.0) < 1e-15)
    assert(r((1L to 10L).map(i => (i, 7L))).isNullAt(4)) // constant y
  }

  test("chiSquareIndependence: sparse-safe identity covers zero cells exactly") {
    import spark.implicits._
    import graft.operators.Eval
    def chi(rows: Seq[(String, String)]): Row =
      Eval.chiSquareIndependence(rows.toDF("a", "b"), col("a"), col("b")).collect()(0)
    // uniform 2x2: perfectly independent -> exactly 0
    val ind = chi(Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2")))
    assert(ind.getLong(0) == 4L && ind.getLong(4) == 0L)
    // diagonal-only 2x2 (counts 2,2): only 2 OBSERVED cells, but the
    // zero cells' deviation is captured by the -N term: chi2 = N = 4
    val dep = chi(Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"), ("a2", "b2")))
    assert(dep.getLong(4) == 4000000L && dep.getLong(3) == 1L) // dof (2-1)(2-1)
  }

  test("mutualInfoUnats: zero for independence, ln2 micro-nats for perfect 2x2") {
    import spark.implicits._
    import graft.operators.Eval
    def mi(rows: Seq[(String, String)]): Row =
      Eval.mutualInfoUnats(rows.toDF("a", "b"), col("a"), col("b")).collect()(0)
    assert(mi(Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2")))
      .getDouble(2) == 0.0) // every cell pmi = ln(1) = 0 exactly
    val dep = mi(Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"), ("a2", "b2")))
    // per cell pmi = round(ln(2)*1e6) = 693147; mi_n = 4 * 693147
    assert(dep.getDouble(2) == 4.0 * 693147.0)
    assert(math.abs(dep.getDouble(3) - math.log(2.0)) < 1e-6)
  }

  test("autocorrAtLag: periodic series, gaps drop pairs") {
    import spark.implicits._
    import graft.operators.Eval
    // period-2 series: lag 2 aligns equal values (r = 1), lag 1 anti (r = -1)
    val s = (0L to 7L).map(t => (t, if (t % 2 == 0) 1L else 5L)).toDF("t", "v")
    assert(math.abs(Eval.autocorrAtLag(s, col("t"), col("v"), 2L)
      .collect()(0).getDouble(5) - 1.0) < 1e-15)
    assert(math.abs(Eval.autocorrAtLag(s, col("t"), col("v"), 1L)
      .collect()(0).getDouble(5) + 1.0) < 1e-15)
    // missing steps drop the pair: steps 0,1,2,5 at lag 1 -> pairs (0,1),(1,2) only
    val g = Seq((0L, 1L), (1L, 2L), (2L, 4L), (5L, 8L)).toDF("t", "v")
    assert(Eval.autocorrAtLag(g, col("t"), col("v"), 1L).collect()(0).getLong(1) == 2L)
  }

  test("groupedTrend: exact rational slope and intercept per group") {
    import spark.implicits._
    import graft.operators.Eval
    val pts = Seq(
      ("g1", 1L, 3L), ("g1", 2L, 5L), ("g1", 3L, 7L),   // y = 2x + 1
      ("g2", 4L, 9L), ("g2", 4L, 11L))                  // constant x: degenerate
      .toDF("g", "x", "y")
    val out = Eval.groupedTrend(pts, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getDouble(2) == 12.0 && g1.getDouble(3) == 6.0) // num, den exact
    assert(g1.getDouble(4) == 2.0 && g1.getDouble(5) == 1.0)  // slope, intercept
    assert(out("g2").isNullAt(4) && out("g2").isNullAt(5))
  }

  test("zipf-style ln-ln trend through groupedTrend matches BigInt hand moments") {
    import spark.implicits._
    import graft.operators.Eval
    val xs = Seq(1L, 2L, 3L).map(r => math.round(math.log(r.toDouble) * 1e6))
    val ys = Seq(4L, 2L, 1L).map(c => math.round(math.log(c.toDouble) * 1e6))
    val pts = xs.zip(ys).map { case (x, y) => ("all", x, y) }.toDF("g", "x", "y")
    val row = Eval.groupedTrend(pts, "g", col("x"), col("y")).collect()(0)
    val (n, sx, sy) = (BigInt(3), xs.map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
    val sxx = xs.map(x => BigInt(x) * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    assert(row.getDouble(2) == num.toDouble && row.getDouble(3) == den.toDouble)
    assert(row.getDouble(4) < -0.9 && row.getDouble(4) > -1.5) // Zipf-ish decay
  }

  test("aucExactPerGroup: per-stratum separation, ties by midrank, one-class NULL") {
    import spark.implicits._
    import graft.operators.Eval
    val rows = Seq(
      // g1: perfect separation (positives outrank all negatives)
      ("g1", 1L, false, 1L), ("g1", 2L, false, 2L), ("g1", 3L, true, 3L), ("g1", 4L, true, 4L),
      // g2: perfectly wrong
      ("g2", 4L, false, 5L), ("g2", 3L, false, 6L), ("g2", 2L, true, 7L), ("g2", 1L, true, 8L),
      // g3: single class
      ("g3", 1L, true, 9L), ("g3", 2L, true, 10L))
      .toDF("g", "s", "pos", "id")
    val out = Eval.aucExactPerGroup(rows, "g", col("s"), col("pos"),
        subBucket = col("s"), idCol = col("id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getDouble(4) == 1.0)
    assert(out("g2").getDouble(4) == 0.0)
    assert(out("g3").isNullAt(4))
    // midrank ties: g4 has one tied score straddling the classes -> 0.5
    val tied = Seq(("g4", 5L, true, 1L), ("g4", 5L, false, 2L))
      .toDF("g", "s", "pos", "id")
    assert(Eval.aucExactPerGroup(tied, "g", col("s"), col("pos"), col("s"), col("id"))
      .collect()(0).getDouble(4) == 0.5)
  }

  test("brierPerGroup: exact micro squared error, perfect and worst groups") {
    import spark.implicits._
    import graft.operators.Eval
    val rows = Seq(
      ("perfect", 1000000L, true), ("perfect", 0L, false),
      ("worst", 0L, true), ("worst", 1000000L, false),
      ("mid", 500000L, true), ("mid", 500000L, false))
      .toDF("g", "p", "pos")
    val out = Eval.brierPerGroup(rows, "g", col("p"), col("pos"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("perfect") == ((2L, 0.0, 0.0)))
    assert(out("worst") == ((2L, 2e12, 1.0)))
    assert(out("mid") == ((2L, 5e11, 0.25)))
  }

  test("ksTestExact: identical samples at 0, disjoint at 1, hand sup-gap with ties") {
    import spark.implicits._
    import graft.operators.Eval
    def ks(a: Seq[Long], b: Seq[Long]): (Long, Long, Long, Double) = {
      val r = Eval.ksTestExact(a.toDF("v"), col("v"), b.toDF("v"), col("v"),
        v => shiftright(v, 2)).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    assert(ks(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))._4 == 0.0)
    assert(ks(Seq(1L, 2L), Seq(10L, 11L))._4 == 1.0)    // fully separated
    // a = {1,2,3,4}, b = {3,4,5,6}: sup gap at v=2: F_a=1/2, F_b=0
    val (na, nb, num, v) = ks(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L))
    assert(na == 4L && nb == 4L && num == 8L && v == 0.5)
  }

  test("stats invariants: KS symmetry, chi2 argument symmetry, transition rows sum to ~1e6") {
    import spark.implicits._
    import graft.operators.Eval
    // KS is symmetric in its arguments — num identical, not just close
    val xs = (1L to 200L).map(i => i * 7 % 31)
    val ys = (1L to 150L).map(i => i * 11 % 37)
    def ksNum(a: Seq[Long], b: Seq[Long]): Long =
      Eval.ksTestExact(a.toDF("v"), col("v"), b.toDF("v"), col("v"),
        v => shiftright(v, 2)).collect()(0).getLong(2)
    assert(ksNum(xs, ys) == ksNum(ys, xs))
    // chi-squared is exactly symmetric under swapping the two columns
    // (per-cell O²·N·10⁶ DIV (R·C) has R·C invariant under the swap)
    val cat = (1L to 500L).map(i => (s"a${i % 7}", s"b${i % 5}"))
    def chi(rows: Seq[(String, String)], swap: Boolean): Long = {
      val df = rows.toDF("a", "b")
      val (x, y) = if (swap) (col("b"), col("a")) else (col("a"), col("b"))
      Eval.chiSquareIndependence(df, x, y).collect()(0).getLong(4)
    }
    assert(chi(cat, swap = false) == chi(cat, swap = true))
    // each transition row's probabilities sum to 1e6 minus bounded floor loss
    val ev = (1L to 400L).map(i => (i % 13, i, s"s${(i * 7) % 5}")).toDF("k", "seq", "st")
    val m = graft.operators.Markov.transitionMatrix(ev, col("k"), col("st"), Seq(col("seq")))
      .collect().map(r => (r.getString(0), r.getLong(4)))
    val sums = m.groupBy(_._1).map { case (f, g) => f -> g.map(_._2).sum }
    assert(sums.values.forall(s => s > 1000000L - 5L && s <= 1000000L))
  }

  test("kendallTauExact: brute-force parity with heavy ties and negatives, 16-level extremes, constant-variable NULL") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      var c = 0L; var d = 0L; var tx = 0L; var ty = 0L; var txy = 0L
      for (i <- pts.indices; j <- i + 1 until pts.length) {
        val (xa, ya) = pts(i); val (xb, yb) = pts(j)
        val sx = java.lang.Long.compare(xa, xb)
        val sy = java.lang.Long.compare(ya, yb)
        if (sx == 0 || sy == 0) {
          if (sx == 0) tx += 1
          if (sy == 0) ty += 1
          if (sx == 0 && sy == 0) txy += 1
        } else if (sx.sign == sy.sign) c += 1 else d += 1
      }
      (c, d, tx, ty, txy)
    }
    def check(pts: Seq[(Long, Long)], yWidth: Long): Unit = {
      val out = Eval.kendallTauExact(pts.toDF("x", "y"),
        col("x"), col("y"), yBucket = expr(s"(y - pmod(y, ${yWidth}L)) DIV ${yWidth}L"))
        .collect()(0)
      val (c, d, tx, ty, txy) = brute(pts)
      val n = pts.length.toLong
      val n0 = n * (n - 1) / 2
      assert(out.getLong(0) == n)
      assert(out.getDouble(1) == n0.toDouble, "n_pairs")
      assert(out.getDouble(2) == tx.toDouble, "n_tie_x")
      assert(out.getDouble(3) == ty.toDouble, "n_tie_y")
      assert(out.getDouble(4) == txy.toDouble, "n_tie_xy")
      assert(out.getDouble(5) == c.toDouble, s"concordant: got ${out.getDouble(5)} want $c")
      assert(out.getDouble(6) == d.toDouble, s"discordant: got ${out.getDouble(6)} want $d")
      val tau = (n0 - tx - ty + txy - 2 * d).toDouble /
        (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble))
      assert(out.getDouble(7) == tau, "tau_b must be the identical IEEE chain")
      assert(out.getDouble(8) == (c - d).toDouble / (c + d).toDouble, "gamma")
      assert(out.getDouble(9) == (c - d).toDouble / (n0 - tx).toDouble,
        "somers_d_yx")
    }

    // heavy ties on both axes + negative values (sign-bit order map)
    val rnd = new scala.util.Random(7)
    check((1 to 300).map(_ => (rnd.nextInt(40) - 20L, rnd.nextInt(25) - 12L)), 4L)
    // full-width extremes: 16 nibble levels incl. the mod-64 shift edge
    check(Seq((Long.MinValue, 3L), (-1L, -5L), (0L, 7L), (1L, -9L),
      (Long.MaxValue, 0L), (Long.MinValue, -2L), (42L, 42L)), 8L)
    // constant x: no orderable pairs on x -> tau NULL, zero discordant
    val const = Eval.kendallTauExact(
      Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y"),
      col("x"), col("y"), yBucket = lit(0L)).collect()(0)
    assert(const.isNullAt(7) && const.isNullAt(8) && const.isNullAt(9) &&
      const.getDouble(6) == 0.0 && const.getDouble(2) == 3.0)
    // perfectly concordant: tau within one ulp of 1 (sqrt-product caveat)
    val mono = Eval.kendallTauExact(
      (1L to 50L).map(i => (i, i * 3)).toDF("x", "y"),
      col("x"), col("y"), yBucket = expr("y DIV 30")).collect()(0)
    assert(math.abs(mono.getDouble(7) - 1.0) < 1e-12)
  }

  test("kendallTauExact/mannWhitney: NULL inputs are excluded, not silently skewed") {
    import spark.implicits._
    import graft.operators.Eval
    // kendall: rows with a NULL x or y must not reach n or the tie terms
    val withNulls = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(2L)), (Some(3L), Some(1L)), (Some(2L), Some(2L)),
      (None, Some(5L)), (Some(4L), None), (None, None))
      .toDF("x", "y")
    val clean = Seq((1L, 2L), (3L, 1L), (2L, 2L)).toDF("x", "y")
    val a = Eval.kendallTauExact(withNulls, col("x"), col("y"), lit(0L)).collect()(0)
    val b = Eval.kendallTauExact(clean, col("x"), col("y"), lit(0L)).collect()(0)
    assert(a == b, s"kendall with NULL rows must equal the non-null subset:\n$a\n$b")
    assert(a.getLong(0) == 3L)
    // mannWhitney: NULL scores drop; NULL positive counts as negative
    val mwNulls = Seq[(Option[Long], Option[Boolean])](
      (Some(10L), Some(true)), (Some(20L), Some(false)), (Some(10L), Some(false)),
      (None, Some(true)), (Some(30L), None))
      .toDF("v", "p")
    val mwClean = Seq((10L, true), (20L, false), (10L, false), (30L, false))
      .toDF("v", "p")
    val ma = Eval.mannWhitney(mwNulls, col("v"), col("p"), v => shiftright(v, 3)).collect()(0)
    val mb = Eval.mannWhitney(mwClean, col("v"), col("p"), v => shiftright(v, 3)).collect()(0)
    assert(ma == mb, s"mannWhitney with NULL scores must equal the non-null subset:\n$ma\n$mb")
    assert(ma.getLong(0) == 1L && ma.getLong(1) == 3L)
  }

  test("mannWhitney: brute-force parity with heavy ties, empty-class NULLs, all-tied zero-variance NULL") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(Long, Boolean)]): Unit = {
      val out = Eval.mannWhitney(pts.toDF("v", "p"), col("v"), col("p"),
        bucketOf = v => shiftright(v, 3)).collect()(0)
      val pos = pts.filter(_._2).map(_._1); val neg = pts.filterNot(_._2).map(_._1)
      val n1 = pos.length.toLong; val n2 = neg.length.toLong; val n = n1 + n2
      val gt = (for (a <- pos; b <- neg) yield (a, b)).count { case (a, b) => a > b }
      val lt = (for (a <- pos; b <- neg) yield (a, b)).count { case (a, b) => a < b }
      val eq = n1 * n2 - gt - lt
      assert(out.getLong(0) == n1 && out.getLong(1) == n2)
      // u2 = 2·(U + n1(n1+1)/2) where U counts (gt + eq/2)
      val u2 = 2L * gt + eq + n1 * (n1 + 1)
      assert(out.getDouble(2) == u2.toDouble, "u2")
      val tt = pts.groupBy(_._1).values.map(_.length.toLong)
        .map(t => t * t * t - t).sum
      assert(out.getDouble(3) == tt.toDouble, "t_ties")
      assert(out.getDouble(4) == (2L * gt + eq).toDouble / (2L * n1 * n2).toDouble, "auc")
      assert(out.getDouble(5) == (gt - lt).toDouble / (n1 * n2).toDouble, "cliffs_delta")
      val a = (n + 1) * n * (n - 1) - tt
      val z = (gt - lt).toDouble /
        math.sqrt((n1 * n2).toDouble * a.toDouble / (3 * n * (n - 1)).toDouble)
      assert(out.getDouble(6) == z, "z must be the identical IEEE chain")
    }
    val rnd = new scala.util.Random(13)
    // heavy ties: 18 distinct values over 400 rows, ~30% positives
    brute((1 to 400).map(_ => (rnd.nextInt(18).toLong, rnd.nextInt(10) < 3)))
    // clear separation, still tied within class
    brute((1 to 50).map(i => (100L + i % 5, true)) ++
      (1 to 70).map(i => (i % 7.toLong, false)))
    // one class empty -> all readouts NULL, counts still real
    val empty = Eval.mannWhitney(
      Seq((3L, false), (5L, false)).toDF("v", "p"), col("v"), col("p"),
      bucketOf = v => v).collect()(0)
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 2L &&
      empty.isNullAt(4) && empty.isNullAt(5) && empty.isNullAt(6))
    // all values tied: auc = 1/2 exactly, z NULL (zero variance)
    val tied = Eval.mannWhitney(
      Seq((7L, true), (7L, false), (7L, true), (7L, false)).toDF("v", "p"),
      col("v"), col("p"), bucketOf = v => v).collect()(0)
    assert(tied.getDouble(4) == 0.5 && tied.getDouble(5) == 0.0 && tied.isNullAt(6))
  }

  test("theilSenSlope: brute-force median of floored micro-slopes, negative-dy floor semantics, outlier robustness, single-point group absent") {
    import spark.implicits._
    import graft.operators.Eval

    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    def brute(pts: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long)] =
      pts.groupBy(_._1).flatMap { case (g, rows) =>
        val slopes = (for {
          (_, xa, ya) <- rows; (_, xb, yb) <- rows if xa < xb
        } yield floorDiv(1000000L * (yb - ya), xb - xa)).sorted
        if (slopes.isEmpty) None
        else {
          val m = slopes.length
          Some(g -> (m.toLong, slopes(((m + 1) / 2) - 1), slopes(m / 2)))
        }
      }

    val rnd = new scala.util.Random(17)
    // two groups with noise + one group with a gross outlier + one
    // single-point group (must be absent), negative slopes included
    val pts =
      (1L to 13L).map(x => ("up", x, 10 * x + rnd.nextInt(3))) ++
      (1L to 12L).map(x => ("down", x, 500 - 7 * x - rnd.nextInt(2))) ++
      ((1L to 9L).map(x => ("outlier", x, 3 * x)) :+ ("outlier", 10L, 100000L)) ++
      Seq(("lonely", 4L, 42L))
    val got = Eval.theilSenSlope(pts.toDF("g", "x", "y"), "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val want = brute(pts)
    assert(got.keySet == want.keySet && !got.contains("lonely"))
    for ((g, (m, lo, hi)) <- want) {
      val (gm, glo, ghi, gmid) = got(g)
      assert(gm == m && glo == lo && ghi == hi, s"$g: got $glo..$ghi want $lo..$hi")
      assert(gmid == (lo.toDouble + hi.toDouble) / 2.0)
    }
    // outlier robustness: the single wild point leaves the median slope
    // at the clean trend (3e6 micro), where OLS would be dragged far off
    assert(got("outlier")._2 >= 2900000L && got("outlier")._3 <= 3200000L)
    // floor semantics on a negative non-divisible slope: dy=-5 over dx=2
    // -> -2500000 exactly via floor, NOT -2499999 (truncation toward 0)
    val neg = Eval.theilSenSlope(
      Seq(("n", 0L, 5L), ("n", 2L, 0L)).toDF("g", "x", "y"),
      "g", col("x"), col("y")).collect()(0)
    assert(neg.getLong(2) == -2500000L && neg.getLong(3) == -2500000L)
  }

  test("isotonicCalibration: hand PAV pools, minimax brute-force parity, monotone output, already-isotone identity") {
    import spark.implicits._
    import graft.operators.Eval

    // brute-force minimax: fit(i) = max_{j<=i} min_{k>=i} avg(j..k)
    def minimax(cells: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val b = cells.sortBy(_._1)
      b.indices.map { i =>
        val best = (0 to i).map { j =>
          (i until b.length).map { k =>
            val seg = b.slice(j, k + 1)
            (BigInt(seg.map(_._3).sum), BigInt(seg.map(_._2).sum))
          }.minBy { case (p, n) => p * 1000000000L * 1000000000L / n } // injective at test sizes
        }.maxBy { case (p, n) => p * 1000000000L * 1000000000L / n }
        val (v, t, pc) = b(i)
        (v, t, pc, (best._1 * 1000000L / best._2).toLong)
      }
    }
    def run(cells: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val rows = cells.flatMap { case (v, t, pc) =>
        (1L to t).map(r => (v, r <= pc))
      }
      Eval.isotonicCalibration(rows.toDF("v", "pos"), col("v"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }

    // classic violation: rates 0.2, 0.8, 0.4 -> last two pool to 0.6
    val hand = run(Seq((1L, 5L, 1L), (2L, 5L, 4L), (3L, 5L, 2L)))
    assert(hand == Seq((1L, 5L, 1L, 200000L), (2L, 5L, 4L, 600000L),
      (3L, 5L, 2L, 600000L)))
    // random histogram: engine PAV == minimax closed form, and monotone
    val rnd = new scala.util.Random(23)
    val cells = (1L to 17L).map(v =>
      (v, 1L + rnd.nextInt(9).toLong, rnd.nextInt(10).toLong min (1L + rnd.nextInt(9).toLong)))
      .map { case (v, t, pc) => (v, t, pc min t) }
    val got = run(cells)
    assert(got == minimax(cells))
    assert(got.sliding(2).forall(w => w.length < 2 || w(0)._4 <= w(1)._4),
      "fitted must be monotone non-decreasing")
    // already isotone: PAV is the identity on per-value rates
    val iso = run(Seq((1L, 4L, 0L), (2L, 4L, 2L), (3L, 4L, 4L)))
    assert(iso.map(_._4) == Seq(0L, 500000L, 1000000L))
  }

  test("cochranArmitage: brute chain parity, planted trend sign, flat-table near-zero, degenerate NULLs, null exclusion") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(Long, Boolean)]): (Long, Long, Long, BigInt, Long, BigInt, Option[Double]) = {
      val n = pts.length.toLong
      val r = pts.count(_._2).toLong
      val s1 = pts.map(_._1).sum
      val s2 = pts.map(p => BigInt(p._1) * p._1).sum
      val sr = pts.filter(_._2).map(_._1).sum
      val u = BigInt(n) * sr - BigInt(r) * s1
      val den = BigInt(r) * (n - r) * (BigInt(n) * s2 - BigInt(s1) * s1)
      val z = if (den > 0)
        Some(u.toDouble * math.sqrt(n.toDouble) / math.sqrt(den.toDouble))
      else None
      (n, r, s1, s2, sr, u, z)
    }
    def run(pts: Seq[(Long, Boolean)]) =
      Eval.cochranArmitage(pts.toDF("s", "p"), col("s"), col("p")).collect()(0)

    val rnd = new scala.util.Random(53)
    // planted trend: pass rate grows with the level -> z > 0 and exact chain
    val trend = (0L to 3L).flatMap(s => (1 to 50).map(_ =>
      (s, rnd.nextInt(10) < 2 + 2 * s)))
    val got = run(trend); val want = brute(trend)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2 &&
      got.getLong(2) == want._3 && got.getDouble(3) == want._4.toDouble &&
      got.getLong(4) == want._5 && got.getDouble(5) == want._6.toDouble)
    assert(got.getDouble(6) == want._7.get && got.getDouble(6) > 2.0,
      s"planted trend must be found: z = ${got.getDouble(6)}")
    // anti-trend: negative z, same exact chain
    val anti = trend.map { case (s, p) => (3L - s, p) }
    assert(run(anti).getDouble(6) == brute(anti)._7.get && run(anti).getDouble(6) < -2.0)
    // flat table: |z| small but still the exact brute chain
    val flat = (0L to 3L).flatMap(s => (1 to 50).map(i => (s, i % 4 == 0)))
    assert(run(flat).getDouble(6) == brute(flat)._7.get)
    // degenerate: constant score, all-positive, all-negative -> NULL z
    assert(run(Seq((2L, true), (2L, false))).isNullAt(6))
    assert(run(Seq((1L, true), (2L, true))).isNullAt(6))
    assert(run(Seq((1L, false), (2L, false))).isNullAt(6))
    // NULL rows are excluded, not counted
    val mixed = Seq[(Option[Long], Option[Boolean])](
      (Some(1L), Some(true)), (Some(2L), Some(false)),
      (None, Some(true)), (Some(3L), None)).toDF("s", "p")
    val cleaned = Eval.cochranArmitage(mixed, col("s"), col("p")).collect()(0)
    assert(cleaned.getLong(0) == 2L && cleaned.getLong(1) == 1L)
  }

  test("kruskalWallis: brute chain parity with heavy ties, textbook sanity, shifted cohort found, degenerate NULLs") {
    import spark.implicits._
    import graft.operators.Eval

    // brute mirror of the engine chain: midranks from the value
    // histogram, doubled rank sums, per-group micro-floored terms
    def brute(pts: Seq[(String, Long)]): (Long, Long, Double, Option[Double], Option[Double]) = {
      val n = pts.length.toLong
      val hist = pts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val sorted = hist.toSeq.sortBy(_._1)
      val cb = sorted.scanLeft(0L)(_ + _._2).init
      val cbOf = sorted.map(_._1).zip(cb).toMap
      val groups = pts.groupBy(_._1)
      val st = groups.values.map { g =>
        val ng = g.size.toLong
        val r2 = g.map { case (_, v) => 2L * cbOf(v) + hist(v) + 1L }.sum
        val x = BigInt(r2) * r2 * 1000000L
        (x - x.mod(BigInt(ng))) / ng
      }.sum
      val tt = hist.values.map(t => BigInt(t) * t * t - t).sum
      val k = groups.size.toLong
      val h = if (k >= 2 && n >= 2)
        Some(3.0 * (st.toDouble / 1000000.0) / (BigInt(n) * (n + 1)).toDouble -
          3.0 * (n + 1).toDouble)
      else None
      val hTie = if (h.isDefined && BigInt(n) * n * n - n > tt)
        Some(h.get / (1.0 - tt.toDouble / (BigInt(n) * n * n - n).toDouble))
      else None
      (n, k, tt.toDouble, h, hTie)
    }
    def run(pts: Seq[(String, Long)]) =
      Eval.kruskalWallis(pts.toDF("g", "v"), "g", col("v"),
        bucketOf = v => shiftright(v, 2)).collect()(0)

    // three cohorts, one shifted up, heavy ties
    val rnd = new scala.util.Random(67)
    val pts = Seq("a", "b", "c").flatMap { g =>
      (1 to 80).map(_ => (g, rnd.nextInt(12).toLong +
        (if (g == "c") 6L else 0L)))
    }
    val got = run(pts); val want = brute(pts)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2 &&
      got.getDouble(2) == want._3)
    assert(got.getDouble(3) == want._4.get, s"h: ${got.getDouble(3)} vs ${want._4.get}")
    assert(got.getDouble(4) == want._5.get, s"h_tie: ${got.getDouble(4)} vs ${want._5.get}")
    // the shifted cohort makes H large (chi2_{2, 0.001} = 13.8)
    assert(got.getDouble(4) > 13.8)
    // textbook sanity on a tie-free table: H' == H and matches the
    // classic 12/(N(N+1))·ΣR²/n − 3(N+1) within the micro-floor error
    val clean = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 5L), ("c", 4L), ("c", 6L))
    val g2 = run(clean)
    val ranks = Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0, 5L -> 5.0, 6L -> 6.0)
    val classic = 12.0 / (6 * 7) * Seq(Seq(1L, 3L), Seq(2L, 5L), Seq(4L, 6L))
      .map(vs => math.pow(vs.map(ranks).sum, 2) / vs.size).sum - 3 * 7
    assert(math.abs(g2.getDouble(3) - classic) < 1e-4)
    assert(g2.getDouble(3) == g2.getDouble(4), "no ties -> correction is 1")
    // degenerate: one group -> NULL; all values tied -> h defined, h_tie NULL
    assert(run(Seq(("a", 1L), ("a", 2L))).isNullAt(3))
    val tied = run(Seq(("a", 5L), ("a", 5L), ("b", 5L)))
    assert(!tied.isNullAt(3) && tied.isNullAt(4))
  }

  test("jonckheereTerpstra: brute pairwise parity with ties, planted trend, degenerate cases") {
    import spark.implicits._
    import graft.operators.Eval

    // brute force: J literally as the sum of pairwise Mann-Whitney counts
    // over ordered group pairs (ties count half -> doubled 2J is integer)
    def brute(pts: Seq[(Long, Long)])
        : (Long, Long, BigInt, BigInt, Option[Double], Option[Double]) = {
      val n = pts.length.toLong
      val groups = pts.groupBy(_._1)
      val k = groups.size.toLong
      val gkeys = groups.keys.toSeq.sorted
      var s2 = BigInt(0)
      for {
        i <- gkeys.indices; j <- (i + 1) until gkeys.size
        x <- groups(gkeys(i)); y <- groups(gkeys(j))
      } {
        if (x._2 < y._2) s2 += 2
        else if (x._2 == y._2) s2 += 1
      }
      val ngs = gkeys.map(g => groups(g).size.toLong)
      val sn2 = ngs.map(x => BigInt(x) * x).sum
      val num2 = 2 * s2 - (BigInt(n) * n - sn2)
      val v72 = BigInt(n) * n * (2 * n + 3) - ngs.map(x => BigInt(x) * x * (2 * x + 3)).sum
      val z = if (k >= 2 && v72 > 0)
        Some(num2.toDouble / (4.0 * math.sqrt(v72.toDouble / 72.0))) else None
      val hist = pts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val a = BigInt(n) * (n - 1) * (2 * n + 5) -
        ngs.map(x => BigInt(x) * (x - 1) * (2 * x + 5)).sum -
        hist.values.map(t => BigInt(t) * (t - 1) * (2 * t + 5)).sum
      val vt = a.toDouble / 72.0 +
        ngs.map(x => BigInt(x) * (x - 1) * (x - 2)).sum.toDouble *
          hist.values.map(t => BigInt(t) * (t - 1) * (t - 2)).sum.toDouble /
          (36.0 * (BigInt(n) * (n - 1) * (n - 2)).toDouble) +
        ngs.map(x => BigInt(x) * (x - 1)).sum.toDouble *
          hist.values.map(t => BigInt(t) * (t - 1)).sum.toDouble /
          (8.0 * (BigInt(n) * (n - 1)).toDouble)
      val zt = if (k >= 2 && n >= 3 && vt > 0)
        Some(num2.toDouble / (4.0 * math.sqrt(vt))) else None
      (n, k, s2, num2, z, zt)
    }
    def run(pts: Seq[(Long, Long)]) =
      Eval.jonckheereTerpstra(pts.toDF("g", "v"), col("g"), col("v"),
        bucketOf = v => shiftright(v, 2)).collect()(0)

    // four ordered dose groups, heavy ties, planted upward trend
    val rnd = new scala.util.Random(53)
    val pts = (0L to 3L).flatMap { g =>
      (1 to 60).map(_ => (g, rnd.nextInt(10).toLong + 2 * g))
    }
    val got = run(pts); val want = brute(pts)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.toDouble, s"j2: ${got.getDouble(2)} vs ${want._3}")
    assert(got.getDouble(3) == want._4.toDouble, s"num2: ${got.getDouble(3)} vs ${want._4}")
    assert(math.abs(got.getDouble(4) - want._5.get) < 1e-12)
    assert(math.abs(got.getDouble(5) - want._6.get) < 1e-12)
    // the planted monotone trend must read as a strong positive z
    assert(got.getDouble(5) > 8.0, s"planted trend z_tie = ${got.getDouble(5)}")
    // a REVERSED trend flips the sign
    val rev = run(pts.map { case (g, v) => (3L - g, v) })
    assert(rev.getDouble(5) < -8.0)
    // ties count half: two groups, all values equal -> 2J = n1*n2, num2 = 0
    val tied = run(Seq((0L, 5L), (0L, 5L), (1L, 5L), (1L, 5L), (1L, 5L)))
    assert(tied.getDouble(2) == 6.0 && tied.getDouble(3) == 0.0)
    // one group -> z NULL; NULL values are excluded up front
    assert(run(Seq((0L, 1L), (0L, 2L))).isNullAt(4))
    val withNull = Eval.jonckheereTerpstra(
      pts.toDF("g", "v").unionByName(
        spark.sql("SELECT CAST(1 AS BIGINT) AS g, CAST(NULL AS BIGINT) AS v")),
      col("g"), col("v"), bucketOf = v => shiftright(v, 2)).collect()(0)
    assert(withNull.getLong(0) == want._1)
  }

  test("wasserstein1: brute grid-integral parity with ties, planted shift measured in score points, degenerates") {
    import spark.implicits._
    import graft.operators.Eval

    // independent brute: W1 = sum over the integer grid of |F1(x) - F2(x)|
    def brute(pts: Seq[(Long, Boolean)]): (Long, Long, BigInt, Option[Double]) = {
      val pos = pts.filter(_._2).map(_._1)
      val neg = pts.filterNot(_._2).map(_._1)
      val (n1, n2) = (pos.length.toLong, neg.length.toLong)
      val num =
        if (pts.isEmpty) BigInt(0)
        else (pts.map(_._1).min until pts.map(_._1).max).map { x =>
          (BigInt(n2) * pos.count(_ <= x) - BigInt(n1) * neg.count(_ <= x)).abs
        }.sum
      val w1 = if (n1 > 0 && n2 > 0)
        Some(num.toDouble / (n1.toDouble * n2.toDouble)) else None
      (n1, n2, num, w1)
    }
    def run(pts: Seq[(Long, Boolean)]) =
      Eval.wasserstein1(pts.toDF("v", "p"), col("v"), col("p"),
        bucketOf = v => shiftright(v, 3)).collect()(0)

    val rnd = new scala.util.Random(211)
    // positives shifted up by ~25 points: W1 should read the shift in UNITS
    val pts = (1 to 90).map(_ => (25L + rnd.nextInt(10), true)) ++
      (1 to 70).map(_ => (rnd.nextInt(10).toLong, false))
    val got = run(pts); val want = brute(pts)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.toDouble)
    assert(got.getDouble(3) == want._4.get)
    assert(math.abs(got.getDouble(3) - 25.0) < 5.0, s"shift read: ${got.getDouble(3)}")
    // identical cohorts -> W1 = 0 exactly
    val same = (1 to 60).flatMap(i => Seq(((i % 7).toLong, true), ((i % 7).toLong, false)))
    assert(run(same).getDouble(3) == 0.0)
    // heavy ties across buckets still exact vs brute
    val tied = (1 to 200).map(i => ((i % 17).toLong * 3, i % 3 == 0))
    val gt = run(tied); val wt = brute(tied)
    assert(gt.getDouble(2) == wt._3.toDouble && gt.getDouble(3) == wt._4.get)
    // one-sided cohort -> w1 NULL
    assert(run(Seq((1L, true), (2L, true))).isNullAt(3))
  }

  test("cramerVonMises: brute pooled-point parity with ties, planted shift found, center-vs-tail reading") {
    import spark.implicits._
    import graft.operators.Eval

    // independent brute: per pooled point z, (F1(z) - F2(z))^2, exact core
    def brute(pts: Seq[(Long, Boolean)]): (Long, Long, BigInt, Option[Double]) = {
      val pos = pts.filter(_._2).map(_._1)
      val neg = pts.filterNot(_._2).map(_._1)
      val (n1, n2) = (pos.length.toLong, neg.length.toLong)
      val n = n1 + n2
      val u = pts.map { case (z, _) =>
        val d = BigInt(n2) * pos.count(_ <= z) - BigInt(n1) * neg.count(_ <= z)
        d * d
      }.sum
      val t = if (n1 > 0 && n2 > 0)
        Some(u.toDouble / (n.toDouble * n.toDouble * n1.toDouble * n2.toDouble))
      else None
      (n1, n2, u, t)
    }
    def run(pts: Seq[(Long, Boolean)]) =
      Eval.cramerVonMises(pts.toDF("v", "p"), col("v"), col("p"),
        bucketOf = v => shiftright(v, 3)).collect()(0)

    val rnd = new scala.util.Random(223)
    val pts = (1 to 80).map(_ => (10L + rnd.nextInt(20), true)) ++
      (1 to 80).map(_ => (rnd.nextInt(20).toLong, false))
    val got = run(pts); val want = brute(pts)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.toDouble)
    assert(got.getDouble(3) == want._4.get)
    assert(got.getDouble(3) > 0.1, s"planted shift: ${got.getDouble(3)}")
    // exchangeable -> small criterion, still exact vs brute
    val fair = (1 to 150).map(i => ((i % 15).toLong, i % 2 == 0))
    val gf = run(fair); val wf = brute(fair)
    assert(gf.getDouble(2) == wf._3.toDouble && gf.getDouble(3) < 0.05)
    // one-sided cohort -> NULL
    assert(run(Seq((1L, false), (2L, false))).isNullAt(3))
  }

  test("energyDistance: brute all-pairs parity with ties, zero on identical cohorts, planted shift") {
    import spark.implicits._
    import graft.operators.Eval

    // independent brute: direct O(n^2) pairwise gaps
    def brute(pts: Seq[(Long, Boolean)]): (BigInt, BigInt, BigInt, Option[Double]) = {
      val pos = pts.filter(_._2).map(_._1)
      val neg = pts.filterNot(_._2).map(_._1)
      val (n1, n2) = (pos.length.toLong, neg.length.toLong)
      val sxy = (for (x <- pos; y <- neg) yield BigInt((x - y).abs)).sum
      def within(s: Seq[Long]) = (for {
        (x, i) <- s.zipWithIndex; (y, j) <- s.zipWithIndex if i < j
      } yield BigInt((x - y).abs)).sum
      val (sxx, syy) = (within(pos), within(neg))
      val e = if (n1 > 0 && n2 > 0)
        Some(2.0 * sxy.toDouble / (n1.toDouble * n2.toDouble) -
          2.0 * sxx.toDouble / (n1.toDouble * n1.toDouble) -
          2.0 * syy.toDouble / (n2.toDouble * n2.toDouble))
      else None
      (sxy, sxx, syy, e)
    }
    def run(pts: Seq[(Long, Boolean)]) =
      Eval.energyDistance(pts.toDF("v", "p"), col("v"), col("p"),
        bucketOf = v => shiftright(v, 3)).collect()(0)

    val rnd = new scala.util.Random(229)
    val pts = (1 to 70).map(_ => (40L + rnd.nextInt(15), true)) ++
      (1 to 90).map(_ => (rnd.nextInt(15).toLong, false))
    val got = run(pts); val want = brute(pts)
    assert(got.getDouble(2) == want._1.toDouble, "sxy")
    assert(got.getDouble(3) == want._2.toDouble, "sxx")
    assert(got.getDouble(4) == want._3.toDouble, "syy")
    assert(got.getDouble(5) == want._4.get)
    assert(got.getDouble(5) > 10.0, s"planted shift: ${got.getDouble(5)}")
    // identical cohorts -> E = 0 exactly (all three terms cancel)
    val same = (1 to 50).flatMap(i => Seq(((i % 9).toLong, true), ((i % 9).toLong, false)))
    assert(run(same).getDouble(5) == 0.0)
    // ties spanning buckets still exact vs brute
    val tied = (1 to 160).map(i => ((i % 13).toLong * 5, i % 4 == 0))
    val gt = run(tied); val wt = brute(tied)
    assert(gt.getDouble(2) == wt._1.toDouble && gt.getDouble(5) == wt._4.get)
    // one-sided -> NULL
    assert(run(Seq((1L, true))).isNullAt(5))
  }

  test("conoverSquaredRanks: brute parity at shift 0 and 14, planted k-sample spread, negative-mean floor, degenerates") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(String, Long)], shift: Int): (Long, Long, BigInt, Option[Double]) = {
      val groups = pts.groupBy(_._1)
      def floorDiv(s: Long, n: Long): Long = (s - ((s % n + n) % n)) / n
      val means = groups.map { case (g, xs) =>
        g -> floorDiv(xs.map(_._2).sum, xs.size.toLong) }
      val devs = pts.map { case (g, y) => (g, (y - means(g)).abs) }
      val hist = devs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val sorted = hist.toSeq.sortBy(_._1)
      val cb = sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._2).init).toMap
      def aq(v: Long): Long = ((2L * cb(v) + hist(v) + 1L) * (2L * cb(v) + hist(v) + 1L)) >> shift
      val n = pts.size.toLong
      val a = hist.map { case (v, t) => BigInt(t) * aq(v) }.sum
      val b = hist.map { case (v, t) => BigInt(t) * aq(v) * aq(v) }.sum
      val st = groups.map { case (g, xs) =>
        val ng = xs.size.toLong
        val sq = xs.map(x => BigInt(aq((x._2 - means(g)).abs))).sum
        val num = BigInt(n) * sq - BigInt(ng) * a
        num * num * 1000000 / ng // nonneg -> / is floor
      }.sum
      val sv = BigInt(n) * b - a * a
      val t = if (groups.size >= 2 && n >= 2 && sv > 0)
        Some((n - 1).toDouble * st.toDouble / (n.toDouble * sv.toDouble * 1e6))
      else None
      (n, groups.size.toLong, st, t)
    }
    def run(pts: Seq[(String, Long)], shift: Int) =
      Eval.conoverSquaredRanks(pts.toDF("g", "y"), "g", col("y"),
        bucketOf = v => shiftright(v, 3), scoreShift = shift).collect()(0)

    val rnd = new scala.util.Random(233)
    // group a spreads wide, b/c stay tight, all centered near 50
    val pts = (1 to 60).map(_ => ("a", 50L + rnd.nextInt(81) - 40L)) ++
      (1 to 60).map(_ => ("b", 50L + rnd.nextInt(7) - 3L)) ++
      (1 to 60).map(_ => ("c", 50L + rnd.nextInt(7) - 3L))
    for (shift <- Seq(0, 14)) {
      val got = run(pts, shift); val want = brute(pts, shift)
      assert(got.getLong(0) == want._1 && got.getLong(1) == want._2, s"shift $shift")
      assert(got.getDouble(2) == want._3.toDouble, s"shift $shift sum_term")
      assert(got.getDouble(3) == want._4.get, s"shift $shift t")
    }
    assert(run(pts, 0).getDouble(3) > 20.0, "planted spread must be found")
    // negative values exercise the pmod floor on the group mean
    val neg = (1 to 40).map(i => ("a", -100L + (i % 9))) ++
      (1 to 40).map(i => ("b", -100L + (i % 41)))
    val gn = run(neg, 0); val wn = brute(neg, 0)
    assert(gn.getDouble(2) == wn._3.toDouble && gn.getDouble(3) == wn._4.get)
    // exchangeable cohorts: small statistic, exact vs brute
    val fair = (1 to 150).map(i => (s"g${i % 3}", (i % 17).toLong))
    val gf = run(fair, 0); val wf = brute(fair, 0)
    assert(gf.getDouble(2) == wf._3.toDouble && gf.getDouble(3) < 3.0)
    // all deviations tied -> degenerate -> NULL
    assert(run(Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L)), 0).isNullAt(3))
  }

  test("andersonDarlingK: brute midrank parity with ties, textbook no-tie agreement, planted shift, degenerates") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(String, Long)]): (Long, Long, BigInt, Option[Double]) = {
      val n = pts.size.toLong
      val hist = pts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val sorted = hist.toSeq.sortBy(_._1)
      val cb = sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._2).init).toMap
      val groups = pts.groupBy(_._1)
      val ss = groups.values.map { xs =>
        val ng = xs.size.toLong
        val gh = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val gs = gh.toSeq.sortBy(_._1)
        val gcb = gs.map(_._1).zip(gs.scanLeft(0L)(_ + _._2).init).toMap
        val tsum = sorted.map { case (v, l) =>
          val b2 = 2L * cb(v) + l
          val m2 = 2L * gcb.get(v).map(c => c).getOrElse(
            // value absent from the group: cumulative-below only
            gs.takeWhile(_._1 < v).map(_._2).sum) + gh.getOrElse(v, 0L)
          val x = BigInt(n) * m2 - BigInt(ng) * b2
          val dq = BigInt(b2) * (2L * n - b2) - BigInt(n) * l
          if (dq > 0) BigInt(l) * x * x * 1000000 / dq else BigInt(0)
        }.sum
        tsum / ng
      }.sum
      val a2 = if (groups.size >= 2 && hist.size >= 2 && n >= 2)
        Some((n - 1).toDouble * ss.toDouble / (n.toDouble * n.toDouble * 1e6))
      else None
      (n, groups.size.toLong, ss, a2)
    }
    def run(pts: Seq[(String, Long)]) =
      Eval.andersonDarlingK(pts.toDF("g", "y"), "g", col("y"),
        bucketOf = v => shiftright(v, 3)).collect()(0)

    val rnd = new scala.util.Random(251)
    val pts = (1 to 70).map(_ => ("a", 30L + rnd.nextInt(20))) ++
      (1 to 70).map(_ => ("b", rnd.nextInt(20).toLong)) ++
      (1 to 60).map(_ => ("c", 15L + rnd.nextInt(20)))
    val got = run(pts); val want = brute(pts)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.toDouble, "sum_s")
    assert(got.getDouble(3) == want._4.get, "a2")
    assert(got.getDouble(3) > 10.0, s"planted shift: ${got.getDouble(3)}")

    // tie-free data: agrees with the textbook midrank formula computed
    // independently in floating point (quantization error only)
    val nf = (1 to 40).map(i => ("a", i * 97L % 1009)) ++
      (1 to 40).map(i => ("b", (i * 89L % 1009) + 2000L))
    val gotNf = run(nf)
    val fp = {
      val all = nf.map(_._2).sorted
      val n = all.size
      nf.groupBy(_._1).values.map { xs =>
        val ng = xs.size
        all.zipWithIndex.map { case (z, idx) =>
          val bj = idx + 0.5 // tie-free: B_j = cb + l/2 = idx + 0.5
          val mij = xs.count(_._2 < z) + 0.5 * xs.count(_._2 == z)
          val dq = bj * (n - bj) - n * 0.25
          if (dq > 0) (n * mij - ng * bj) * (n * mij - ng * bj) / dq / n else 0.0
        }.sum / ng
      }.sum * (n - 1.0) / n
    }
    assert(math.abs(gotNf.getDouble(3) - fp) < 1e-4,
      s"textbook: ${gotNf.getDouble(3)} vs $fp")

    // exchangeable cohorts: exact vs brute, small value
    val fair = (1 to 160).map(i => (s"g${i % 4}", (i % 19).toLong))
    val gf = run(fair); val wf = brute(fair)
    assert(gf.getDouble(2) == wf._3.toDouble && gf.getDouble(3) < 3.0)
    // all values tied -> NULL; one group -> NULL
    assert(run(Seq(("a", 5L), ("b", 5L), ("a", 5L))).isNullAt(3))
    assert(run(Seq(("a", 1L), ("a", 2L))).isNullAt(3))
  }

  test("quadeTest: brute doubled-midrank parity with ties, discrimination weighting beats flat blocks, degenerates") {
    import spark.implicits._
    import graft.operators.Eval

    def midranks2(ys: Seq[Long]): Seq[Long] = {
      val hist = ys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      ys.map(y => 2L * ys.count(_ < y) + hist(y) + 1L)
    }
    def brute(cells: Seq[(Long, String, Long)]): (Long, Long, BigInt, BigInt, Option[Double]) = {
      val k = cells.map(_._2).distinct.size.toLong
      val blocks = cells.groupBy(_._1).filter(_._2.size == k)
      val n = blocks.size.toLong
      val ranges = blocks.view.mapValues(cs => cs.map(_._3).max - cs.map(_._3).min).toMap
      val rgs = ranges.values.toSeq
      val q2 = ranges.map { case (b, rg) =>
        b -> (2L * rgs.count(_ < rg) + rgs.count(_ == rg) + 1L) }
      val s4 = blocks.toSeq.flatMap { case (b, cs) =>
        val r2 = midranks2(cs.map(_._3))
        cs.zip(r2).map { case ((_, g, _), r) =>
          (g, BigInt(q2(b)) * (r - (k + 1))) }
      }
      val a16 = s4.map(s => s._2 * s._2).sum
      val sb = s4.groupBy(_._1).values.map(_.map(_._2).sum).map(x => x * x).sum
      val den = BigInt(n) * a16 - sb
      val t = if (k >= 2 && n >= 1 && den > 0)
        Some((n - 1).toDouble * sb.toDouble / den.toDouble) else None
      (n, k, sb, a16, t)
    }
    def run(cells: Seq[(Long, String, Long)]) =
      Eval.quadeTest(cells.toDF("b", "g", "y"), "b", "g", col("y")).collect()(0)

    val rnd = new scala.util.Random(271)
    // treatment "a" always wins, with margins GROWING in the block id —
    // the discrimination-weighted shape Quade rewards
    val cells = (1L to 12L).flatMap { b =>
      Seq((b, "a", 100L + b * 10L), (b, "bb", 100L - b + rnd.nextInt(3)),
        (b, "cc", 95L + rnd.nextInt(3)))
    }
    val got = run(cells); val want = brute(cells)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.toDouble, "sb")
    assert(got.getDouble(3) == want._4.toDouble, "a16")
    assert(got.getDouble(4) == want._5.get, "t")
    assert(got.getDouble(4) > 10.0, s"planted effect: ${got.getDouble(4)}")
    // heavy ties (incl. tied ranges) still exact vs brute
    val tied = (1L to 10L).flatMap(b => Seq((b, "a", b % 3), (b, "bb", b % 2),
      (b, "cc", 1L)))
    val gt = run(tied); val wt = brute(tied)
    assert(gt.getDouble(2) == wt._3.toDouble &&
      (gt.isNullAt(4) == wt._5.isEmpty))
    // incomplete blocks drop; identical rankings everywhere -> NULL
    val incomplete = cells ++ Seq((99L, "a", 5L))
    assert(run(incomplete).getLong(0) == 12L)
    val same = (1L to 6L).flatMap(b => Seq((b, "a", 3L), (b, "bb", 2L)))
    assert(run(same).isNullAt(4)) // every block ranks identically: B = nA
  }

  test("pageTrendTest: brute parity with ties, textbook no-tie z, monotone trend sign, degenerates") {
    import spark.implicits._
    import graft.operators.Eval

    def midranks2(ys: Seq[Long]): Seq[Long] = {
      val hist = ys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      ys.map(y => 2L * ys.count(_ < y) + hist(y) + 1L)
    }
    def brute(cells: Seq[(String, Long, Long)]): (Long, Long, BigInt, Option[Double]) = {
      val gs = cells.map(_._2).distinct.sorted
      val k = gs.size.toLong
      val c = gs.zipWithIndex.map { case (g, i) => g -> (i + 1L) }.toMap
      val blocks = cells.groupBy(_._1).filter(_._2.size == k)
      val n = blocks.size.toLong
      var num4 = BigInt(0); var dd = BigInt(0)
      blocks.values.foreach { cs =>
        val r2 = midranks2(cs.map(_._3))
        cs.zip(r2).foreach { case ((_, g, _), r) =>
          num4 += BigInt(2L * c(g) - (k + 1)) * (r - (k + 1))
          dd += BigInt(r - (k + 1)) * (r - (k + 1))
        }
      }
      val cc = gs.map(g => BigInt(2L * c(g) - (k + 1)) * (2L * c(g) - (k + 1))).sum
      val z = if (k >= 2 && dd > 0 && cc > 0)
        Some(num4.toDouble / math.sqrt(cc.toDouble * dd.toDouble / (k - 1).toDouble))
      else None
      (n, k, num4, z)
    }
    def run(cells: Seq[(String, Long, Long)]) =
      Eval.pageTrendTest(cells.toDF("b", "g", "y"), "b", col("g"), col("y")).collect()(0)

    val rnd = new scala.util.Random(277)
    // values trend UP with the ordered group across every block
    val up = (1L to 10L).flatMap(b => (0L to 4L).map(g =>
      (s"blk$b", g, g * 10L + rnd.nextInt(4))))
    val got = run(up); val want = brute(up)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.toDouble, "num4")
    assert(got.getDouble(3) == want._4.get, "z")
    assert(got.getDouble(3) > 5.0, s"monotone trend: ${got.getDouble(3)}")
    // reversed trend flips the sign
    val down = up.map { case (b, g, y) => (b, g, -y) }
    assert(run(down).getDouble(3) < -5.0)
    // tie-free: z equals the textbook Var(L) = n(k^3-k)^2/(144(k-1)) form
    val nf = (1L to 8L).flatMap(b => (0L to 3L).map(g =>
      (s"b$b", g, (b * 13 + g * 29) % 101)))
    val gnf = run(nf)
    val (n, k) = (8.0, 4.0)
    val perms = nf.groupBy(_._1).values.map { cs =>
      val order = cs.sortBy(_._3).map(_._2).zipWithIndex
      order.map { case (g, i) => (g + 1) * (i + 1).toLong }.sum.toDouble
    }.sum // L with ranks 1..k (g+1 = c since groups 0..3 dense)
    val el = n * k * (k + 1) * (k + 1) / 4
    val varl = n * math.pow(k * k * k - k, 2) / (144 * (k - 1))
    val zTextbook = (perms - el) / math.sqrt(varl)
    assert(math.abs(gnf.getDouble(3) - zTextbook) < 1e-9,
      s"textbook: ${gnf.getDouble(3)} vs $zTextbook")
    // all-tied blocks -> NULL; one group -> NULL
    assert(run((1L to 4L).flatMap(b => Seq((s"b$b", 1L, 7L), (s"b$b", 2L, 7L)))).isNullAt(3))
    assert(run(Seq(("b1", 1L, 3L))).isNullAt(3))
  }

  test("cochranQ: brute parity, stricter filter flagged, identical filters degenerate, incomplete blocks drop") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(rows: Seq[(Long, String, Boolean)]): (Long, Long, Option[Double]) = {
      val k = rows.map(_._2).distinct.size.toLong
      val blocks = rows.groupBy(_._1).filter(_._2.size == k)
      val n = blocks.size.toLong
      val rs = blocks.values.map(_.count(_._3).toLong).toSeq
      val kept = blocks.values.flatten.toSeq
      val cs = kept.groupBy(_._2).values.map(_.count(_._3).toLong).toSeq
      val t = cs.sum
      val num = BigInt(k - 1) * (BigInt(k) * cs.map(c => BigInt(c) * c).sum - BigInt(t) * t)
      val den = BigInt(k) * rs.sum - rs.map(r => BigInt(r) * r).sum
      val q = if (k >= 2 && den > 0) Some(num.toDouble / den.toDouble) else None
      (n, k, q)
    }
    def run(rows: Seq[(Long, String, Boolean)]) =
      Eval.cochranQ(rows.toDF("b", "t", "y"), "b", "t", col("y")).collect()(0)

    val rnd = new scala.util.Random(307)
    // filter f3 is much stricter than f1/f2 on the same 80 documents
    val rows = (1L to 80L).flatMap { d =>
      val base = rnd.nextInt(100)
      Seq((d, "f1", base < 70), (d, "f2", base + rnd.nextInt(10) < 72),
        (d, "f3", base < 20))
    }
    val got = run(rows); val want = brute(rows)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.get)
    assert(got.getDouble(2) > 30.0, s"strict filter: ${got.getDouble(2)}")
    // identical filters: no discordance -> NULL (den = 0)
    val same = (1L to 40L).flatMap(d => Seq((d, "a", d % 3 == 0), (d, "bb", d % 3 == 0)))
    assert(run(same).isNullAt(2))
    // incomplete blocks drop
    val inc = rows ++ Seq((999L, "f1", true))
    assert(run(inc).getLong(0) == 80L)
    // exchangeable filters: small Q, exact vs brute
    val fair = (1L to 90L).flatMap(d => Seq((d, "a", (d * 7) % 5 < 2),
      (d, "bb", (d * 11) % 5 < 2), (d, "cc", (d * 13) % 5 < 2)))
    val gf = run(fair); val wf = brute(fair)
    assert(gf.getDouble(2) == wf._3.get && gf.getDouble(2) < 8.0)
  }

  test("mcnemarTest: brute parity, asymmetric swap flagged, concordant-only NULL") {
    import spark.implicits._
    import graft.operators.Eval

    def run(flags: Seq[(Boolean, Boolean)]) =
      Eval.mcnemarTest(flags.toDF("a", "b"), col("a"), col("b")).collect()(0)
    // planted: A passes 30 docs B rejects; B passes only 5 A rejects
    val flags = Seq.fill(50)((true, true)) ++ Seq.fill(30)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(15)((false, false))
    val got = run(flags)
    assert(got.getLong(0) == 100L && got.getLong(1) == 30L && got.getLong(2) == 5L)
    assert(got.getLong(3) == 1000000L * 25 * 25 / 35) // floor(1e6*(b-c)^2/(b+c))
    assert(got.getLong(3) > 13_800_000L, "the swap moved the pass set")
    // symmetric discordance: chi2 exactly 0
    assert(run(Seq.fill(10)((true, false)) ++ Seq.fill(10)((false, true))).getLong(3) == 0L)
    // fully concordant -> NULL
    assert(run(Seq.fill(20)((true, true)) ++ Seq.fill(3)((false, false))).isNullAt(3))
    // corpus-scale discordance: 1e6*(b-c)^2 = 9.61e18 exceeds Long.Max —
    // the DECIMAL(38,0) ride keeps the statistic exact where BIGINT wraps
    val big = spark.range(3_100_000L)
      .select(lit(true).as("a"), lit(false).as("b"))
    val bigGot = Eval.mcnemarTest(big, col("a"), col("b")).collect()(0)
    assert(bigGot.getLong(1) == 3_100_000L && bigGot.getLong(2) == 0L)
    assert(bigGot.getLong(3) ==
      (BigInt(1000000) * 3100000L * 3100000L / 3100000L).toLong,
      s"decimal ride must not wrap: ${bigGot.getLong(3)}")
  }

  test("cronbachAlpha: brute parity, perfectly parallel items alpha = 1 exactly, independent items near 0") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(rows: Seq[(Long, Long, Long)]): (Long, BigInt, BigInt, Option[Double]) = {
      val n = rows.size.toLong
      val cols = Seq(rows.map(_._1), rows.map(_._2), rows.map(_._3))
      def v(xs: Seq[Long]): BigInt =
        BigInt(n) * xs.map(x => BigInt(x) * x).sum - BigInt(xs.sum) * xs.sum
      val sv = cols.map(v).sum
      val ts = rows.map(r => r._1 + r._2 + r._3)
      val tv = v(ts)
      val a = if (n >= 2 && tv > 0)
        Some(3.0 / 2.0 * (1.0 - sv.toDouble / tv.toDouble)) else None
      (n, sv, tv, a)
    }
    def run(rows: Seq[(Long, Long, Long)]) =
      Eval.cronbachAlpha(rows.toDF("x0", "x1", "x2"),
        Seq(col("x0"), col("x1"), col("x2"))).collect()(0)

    val rnd = new scala.util.Random(311)
    // correlated items: shared signal + small item noise
    val corr = (1 to 60).map { _ =>
      val s = rnd.nextInt(1000).toLong
      (s + rnd.nextInt(50), s + rnd.nextInt(50), s + rnd.nextInt(50))
    }.map(t => (t._1.toLong, t._2.toLong, t._3.toLong))
    val got = run(corr); val want = brute(corr)
    assert(got.getLong(0) == want._1)
    assert(got.getDouble(2) == want._2.toDouble && got.getDouble(3) == want._3.toDouble)
    assert(got.getDouble(4) == want._4.get)
    assert(got.getDouble(4) > 0.9, s"correlated items: ${got.getDouble(4)}")
    // the same column three times: alpha exactly 1
    val same = (1 to 30).map(i => { val x = (i * 37L) % 101; (x, x, x) })
    assert(run(same).getDouble(4) == 1.0)
    // independent items: alpha near 0 (can be negative), exact vs brute
    val ind = (1 to 200).map(_ => (rnd.nextInt(1000).toLong,
      rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val gi = run(ind); val wi = brute(ind)
    assert(gi.getDouble(4) == wi._4.get && math.abs(gi.getDouble(4)) < 0.3)
    // constant total -> NULL
    assert(run(Seq((1L, 2L, 3L), (3L, 2L, 1L), (2L, 2L, 2L))).isNullAt(4))
  }

  test("ansariBradley: brute folded-rank parity incl. a center-straddling tie block, planted spread, sign semantics") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(Long, Boolean)]): (Long, Long, BigInt, BigInt, Option[Double]) = {
      val n = pts.length.toLong
      val hist = pts.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val sorted = hist.toSeq.sortBy(_._1)
      val cbOf = sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._2).init).toMap
      // per value: literal fold over the block's integer ranks, then the
      // micro-quantized tie average — the documented score family
      def aq(v: Long): Long = {
        val lo = cbOf(v) + 1; val hi = cbOf(v) + hist(v)
        val s2 = 2L * (lo to hi).map(r => math.min(r, n + 1 - r)).sum
        1000000L * s2 / (2L * hist(v))
      }
      val n1 = pts.count(_._2).toLong
      val tq = pts.filter(_._2).map(p => BigInt(aq(p._1))).sum
      // toSeq before map: .keys is a Set and would DEDUPE equal products
      val a = hist.toSeq.map { case (v, t) => BigInt(t) * aq(v) }.sum
      val b = hist.toSeq.map { case (v, t) => BigInt(t) * aq(v) * aq(v) }.sum
      val num = BigInt(n) * tq - BigInt(n1) * a
      val sv = BigInt(n) * b - a * a
      val z = if (n1 > 0 && n1 < n && n >= 2 && sv > 0)
        Some(num.toDouble / math.sqrt(n1.toDouble * (n - n1).toDouble *
          sv.toDouble / (n - 1).toDouble))
      else None
      (n1, n - n1, tq, num, z)
    }
    def run(pts: Seq[(Long, Boolean)]) =
      Eval.ansariBradley(pts.toDF("v", "p"), col("v"), col("p"),
        bucketOf = v => shiftright(v, 3)).collect()(0)

    // heavy ties INCLUDING a big block that straddles the center (the
    // case the midrank shortcut gets wrong): 40 rows of value 10 around
    // the median of 100 points
    val rnd = new scala.util.Random(113)
    val pts = (1 to 40).map(_ => (10L, rnd.nextBoolean())) ++
      (1 to 30).map(_ => (rnd.nextInt(8).toLong, rnd.nextBoolean())) ++
      (1 to 30).map(_ => (13L + rnd.nextInt(8), rnd.nextBoolean()))
    val got = run(pts); val want = brute(pts)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.toDouble, s"t_q: ${got.getDouble(2)} vs ${want._3}")
    assert(got.getDouble(3) == want._4.toDouble)
    want._5.foreach(z => assert(math.abs(got.getDouble(4) - z) < 1e-12))
    // sign semantics: a COMPACT positive cohort (center) scores HIGH -> z > 0
    val planted = (1 to 60).map(_ => (20L + rnd.nextInt(4), true)) ++
      (1 to 60).map(_ => (rnd.nextBoolean() match {
        case true => rnd.nextInt(10).toLong
        case false => 40L + rnd.nextInt(10) }, false))
    val gp = run(planted); val wp = brute(planted)
    assert(gp.getDouble(3) == wp._4.toDouble && gp.getDouble(4) > 5.0,
      s"compact positives must read z > 0: ${gp.getDouble(4)}")
    // degenerate: all tied -> z NULL
    assert(run(Seq((5L, true), (5L, false))).isNullAt(4))
  }

  test("moodScaleTest: brute midrank parity with ties, planted spread found, permutation moments exact") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(Long, Boolean)]): (Long, Long, BigInt, BigInt, Option[Double]) = {
      val n = pts.length.toLong
      val hist = pts.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val sorted = hist.toSeq.sortBy(_._1)
      val cb = sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._2).init).toMap
      def d(v: Long): Long = 2L * cb(v) + hist(v) - n
      val n1 = pts.count(_._2).toLong
      val t4 = pts.filter(_._2).map(p => BigInt(d(p._1)) * d(p._1)).sum
      val a = hist.map { case (v, t) => BigInt(t) * d(v) * d(v) }.sum
      val b = hist.map { case (v, t) =>
        BigInt(t) * d(v) * d(v) * d(v) * d(v) }.sum
      val num = BigInt(n) * t4 - BigInt(n1) * a
      val sv = BigInt(n) * b - a * a
      val z = if (n1 > 0 && n1 < n && n >= 2 && sv > 0)
        Some(num.toDouble / math.sqrt(n1.toDouble * (n - n1).toDouble *
          sv.toDouble / (n - 1).toDouble))
      else None
      (n1, n - n1, t4, num, z)
    }
    def run(pts: Seq[(Long, Boolean)]) =
      Eval.moodScaleTest(pts.toDF("v", "p"), col("v"), col("p"),
        bucketOf = v => shiftright(v, 3)).collect()(0)

    // positives crowd the EXTREMES (high spread), negatives the center
    val rnd = new scala.util.Random(101)
    val pts = (1 to 80).map(_ => (rnd.nextInt(6).toLong +
        (if (rnd.nextBoolean()) 0L else 30L), true)) ++
      (1 to 80).map(_ => (15L + rnd.nextInt(6), false))
    val got = run(pts); val want = brute(pts)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.toDouble && got.getDouble(3) == want._4.toDouble)
    assert(math.abs(got.getDouble(4) - want._5.get) < 1e-12)
    // the spread difference is found, with the right sign (positives high)
    assert(got.getDouble(4) > 5.0, s"planted spread z = ${got.getDouble(4)}")
    // exchangeable cohorts: small z, still exact vs brute
    val fair = (1 to 120).map(i => ((i % 12).toLong, i % 2 == 0))
    val gf = run(fair); val wf = brute(fair)
    assert(gf.getDouble(3) == wf._4.toDouble && math.abs(gf.getDouble(4)) < 2.0)
    // degenerate: all tied -> z NULL; one-sided cohort -> z NULL
    assert(run(Seq((5L, true), (5L, false), (5L, true))).isNullAt(4))
    assert(run(Seq((1L, true), (2L, true))).isNullAt(4))
  }

  test("moodMedianTest: brute parity with ties, planted shift found, degenerate cases") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(String, Long)]): (Long, Long, Long, Long, Option[Long]) = {
      val n = pts.length.toLong
      val m = pts.map(_._2).sorted.apply(((n + 1) / 2 - 1).toInt) // lower median
      val groups = pts.groupBy(_._1)
      val k = groups.size.toLong
      val a = pts.count(_._2 > m).toLong
      val chi = if (a > 0 && a < n && k >= 2)
        Some(groups.values.map { g =>
          val ng = g.size.toLong
          val ag = g.count(_._2 > m).toLong
          def t(o: Long, r: Long): BigInt = {
            val d = BigInt(n) * o - BigInt(r) * ng
            d * d * 1000000L / (BigInt(n) * r * ng) // nonneg -> / == floor
          }
          t(ag, a) + t(ng - ag, n - a)
        }.sum.toLong)
      else None
      (n, k, m, a, chi)
    }
    def run(pts: Seq[(String, Long)]) =
      Eval.moodMedianTest(pts.toDF("g", "v"), "g", col("v"),
        bucketOf = v => shiftright(v, 2)).collect()(0)

    // three cohorts with heavy ties, one shifted up
    val rnd = new scala.util.Random(71)
    val pts = Seq("a", "b", "c").flatMap { g =>
      (1 to 70).map(_ => (g, rnd.nextInt(9).toLong + (if (g == "c") 5L else 0L))) }
    val got = run(pts); val want = brute(pts)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((want._1, want._2, want._3, want._4)))
    assert(got.getLong(4) == want._5.get, s"chi2: ${got.getLong(4)} vs ${want._5.get}")
    // the planted shift dominates: chi2 >> chi2_{2, 0.001} = 13.8
    assert(got.getLong(4) > 13800000L)
    // exchangeable cohorts stay small
    val fair = Seq("a", "b").flatMap(g => (1 to 60).map(i => (g, (i % 10).toLong)))
    assert(run(fair).getLong(4) == brute(fair)._5.get && run(fair).getLong(4) < 13800000L)
    // degenerate: every value on one side (all equal) -> NULL; one group -> NULL
    assert(run(Seq(("a", 5L), ("b", 5L), ("a", 5L))).isNullAt(4))
    assert(run(Seq(("a", 1L), ("a", 9L), ("a", 3L))).isNullAt(4))
  }

  test("anovaOneWay: brute chain parity, textbook F sanity, planted shift, degenerate NULLs, negative values") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(pts: Seq[(String, Long)]): (Long, Long, Double, Double, Option[Double]) = {
      def fl(num: BigInt, d: Long): BigInt = (num - num.mod(BigInt(d))) / d
      val n = pts.length.toLong
      val groups = pts.groupBy(_._1)
      val k = groups.size.toLong
      val ss = pts.map(p => BigInt(p._2) * p._2).sum
      val s = pts.map(_._2).sum
      val st = groups.values.map { g =>
        fl(BigInt(g.map(_._2).sum) * g.map(_._2).sum * 1000000L, g.size.toLong) }.sum
      val tn = fl(BigInt(s) * s * 1000000L, n)
      val ssb = (st - tn).toDouble
      val ssw = (ss * 1000000L - st).toDouble
      val f = if (k >= 2 && n > k && ss * 1000000L - st > 0)
        Some((ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble))
      else None
      (n, k, ssb, ssw, f)
    }
    def run(pts: Seq[(String, Long)]) =
      Eval.anovaOneWay(pts.toDF("g", "y"), "g", col("y")).collect()(0)

    // planted mean shift across three cohorts, negatives included
    val rnd = new scala.util.Random(89)
    val pts = Seq("a" -> 0L, "b" -> 0L, "c" -> 40L).flatMap { case (g, off) =>
      (1 to 70).map(_ => (g, rnd.nextInt(21) - 10L + off)) }
    val got = run(pts); val want = brute(pts)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3 && got.getDouble(3) == want._4)
    assert(got.getDouble(4) == want._5.get && got.getDouble(4) > 100.0,
      s"planted shift must dominate: F = ${got.getDouble(4)}")
    // textbook sanity: micro-floor F within 1e-6 of the float formula
    val grand = pts.map(_._2.toDouble).sum / pts.length
    val byG = pts.groupBy(_._1).values
    val ssbF = byG.map(g => g.size * math.pow(g.map(_._2.toDouble).sum / g.size - grand, 2)).sum
    val sswF = byG.map(g => { val m = g.map(_._2.toDouble).sum / g.size
      g.map(p => math.pow(p._2 - m, 2)).sum }).sum
    val fF = (ssbF / 2) / (sswF / (pts.length - 3))
    assert(math.abs(got.getDouble(4) - fF) / fF < 1e-6)
    // degenerate: one group / all-constant groups -> NULL F
    assert(run(Seq(("a", 1L), ("a", 2L))).isNullAt(4))
    assert(run(Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L))).isNullAt(4))
  }

  test("friedmanTest: brute chain parity with ties, textbook no-tie formula, incomplete blocks dropped, degenerate NULLs") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(cells: Seq[(Long, String, Long)]): (Long, Long, Option[Double], Option[Double]) = {
      val k = cells.map(_._2).distinct.size
      val comp = cells.groupBy(_._1).filter(_._2.map(_._2).distinct.size == k)
        .values.flatten.toSeq
      val ranked = comp.groupBy(_._1).values.flatMap { blk =>
        blk.map { case (b, g, y) =>
          val below = blk.count(_._3 < y); val ties = blk.count(_._3 == y)
          (g, 2L * below + ties + 1L) }
      }.toSeq
      val n = if (ranked.isEmpty) 0L else ranked.groupBy(_._1).values.head.size.toLong
      val kk = ranked.map(_._1).distinct.size.toLong
      val ssq = ranked.map(r => BigInt(r._2) * r._2).sum
      val dd = ranked.groupBy(_._1).values.map { g =>
        val d = BigInt(g.map(_._2).sum) - BigInt(n) * (kk + 1); d * d }.sum
      val den = ssq - BigInt(n) * kk * (kk + 1) * (kk + 1)
      val chi2 = if (n > 0 && kk >= 2 && den > 0)
        Some((BigInt(kk - 1) * dd).toDouble / den.toDouble) else None
      (n, kk, chi2, chi2.map(_ / (n * (kk - 1)).toDouble))
    }
    def run(cells: Seq[(Long, String, Long)]) =
      Eval.friedmanTest(cells.toDF("b", "g", "y"), "b", "g", col("y")).collect()(0)

    // random complete design with heavy ties
    val rnd = new scala.util.Random(113)
    val cells = for (b <- 1L to 20L; g <- Seq("a", "b", "c", "d"))
      yield (b, g, rnd.nextInt(6).toLong)
    val got = run(cells); val want = brute(cells)
    assert(got.getLong(0) == want._1 && got.getLong(1) == want._2)
    assert(got.getDouble(2) == want._3.get && got.getDouble(3) == want._4.get)
    // textbook (no ties): chi2 == 12/(nk(k+1))*SUM R^2 - 3n(k+1)
    val perm = for (b <- 1L to 8L) yield rnd.shuffle(Seq(10L, 20L, 30L))
    val noTies = perm.zipWithIndex.flatMap { case (vs, i) =>
      Seq("x", "y", "z").zip(vs).map { case (g, v) => (i.toLong, g, v) } }
    val g2 = run(noTies)
    val rSums = noTies.groupBy(_._2).values.map(g =>
      g.map(c => Seq(10L, 20L, 30L).sorted.indexOf(c._3) + 1L).sum)
    val classic = 12.0 / (8 * 3 * 4) * rSums.map(r => r.toDouble * r).sum - 3 * 8 * 4
    assert(math.abs(g2.getDouble(2) - classic) < 1e-9, s"${g2.getDouble(2)} vs $classic")
    // an incomplete block (missing group) is dropped, not mis-ranked
    val withHole = cells ++ Seq((99L, "a", 1L), (99L, "b", 2L))
    assert(run(withHole).toString == got.toString)
    // consistent ranking across blocks: W == 1 exactly
    val consistent = for (b <- 1L to 6L; (g, v) <- Seq(("a", 1L), ("b", 2L), ("c", 3L)))
      yield (b, g, v * 10 + b)
    assert(run(consistent).getDouble(3) == 1.0)
    // degenerate: all-tied blocks -> NULL; single group -> NULL
    assert(run(Seq((1L, "a", 5L), (1L, "b", 5L), (2L, "a", 3L), (2L, "b", 3L))).isNullAt(2))
    assert(run(Seq((1L, "a", 1L), (2L, "a", 2L))).isNullAt(2))
  }

  test("brownForsythe: equals anovaOneWay on hand-computed |y - lower median|, spread cohort flags, equal-spread does not") {
    import spark.implicits._
    import graft.operators.Eval

    def run(pts: Seq[(String, Long)]) =
      Eval.brownForsythe(pts.toDF("g", "y"), "g", col("y")).collect()(0)
    def viaAnova(pts: Seq[(String, Long)]) = {
      // lower median: the ceil(n/2)-th smallest, an actual element
      val med = pts.groupBy(_._1).view.mapValues { g =>
        val s = g.map(_._2).sorted; s((s.length + 1) / 2 - 1) }.toMap
      Eval.anovaOneWay(
        pts.map { case (g, y) => (g, math.abs(y - med(g))) }.toDF("g", "y"),
        "g", col("y")).collect()(0)
    }
    val rnd = new scala.util.Random(101)
    // cohort c is 8x more spread than a/b around the same center
    val pts = Seq(("a", 1L), ("b", 1L), ("c", 8L)).flatMap { case (g, sp) =>
      (1 to 61).map(_ => (g, 100L + (rnd.nextInt(21) - 10) * sp)) }
    val got = run(pts)
    assert(got.toString == viaAnova(pts).toString,
      s"BF must equal ANOVA on |y - med_g|:\n$got\n${viaAnova(pts)}")
    assert(got.getDouble(4) > 50.0, s"spread cohort must flag: ${got.getDouble(4)}")
    // equal spreads: F stays small (chi2-ish sanity, not a hash assert)
    val eq = Seq("a", "b", "c").flatMap(g =>
      (1 to 61).map(_ => (g, 100L + rnd.nextInt(21) - 10L)))
    assert(run(eq).getDouble(4) < 5.0)
    // even-count lower median is the n/2-th... ceil(4/2)=2nd smallest:
    // group (1,3,5,9) -> med 3; deviations (2,0,2,6)
    val hand = run(Seq(("x", 1L), ("x", 3L), ("x", 5L), ("x", 9L),
      ("y", 0L), ("y", 0L), ("y", 10L)))
    val handWant = viaAnova(Seq(("x", 1L), ("x", 3L), ("x", 5L), ("x", 9L),
      ("y", 0L), ("y", 0L), ("y", 10L)))
    assert(hand.toString == handWant.toString)
  }

  test("isotonicWeighted: weighted minimax brute parity, unit-weight == unweighted, negative-y floor, excluded rows") {
    import spark.implicits._
    import graft.operators.Eval

    // brute weighted minimax over (x, y, w) points with BigInt rationals
    def minimax(pts: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val cells = pts.groupBy(_._1).toSeq.sortBy(_._1).map { case (v, g) =>
        (v, g.map(_._3).sum, g.map(p => p._2 * p._3).sum) }
      def floorDiv(a: BigInt, b: BigInt): Long =
        ((a - a.mod(b)) / b).toLong
      cells.indices.map { i =>
        val best = (0 to i).map { j =>
          (i until cells.length).map { k =>
            val seg = cells.slice(j, k + 1)
            (BigInt(seg.map(_._3).sum), BigInt(seg.map(_._2).sum))
          }.minBy { case (s, w) => BigDecimal(s) / BigDecimal(w) }
        }.maxBy { case (s, w) => BigDecimal(s) / BigDecimal(w) }
        val (v, w, s) = cells(i)
        (v, w, s, floorDiv(best._1 * 1000000L, best._2))
      }
    }
    def run(pts: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] =
      Eval.isotonicWeighted(pts.toDF("x", "y", "w"), col("x"), col("y"), col("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq

    // hand case: heavy accurate row dominates its pool
    // x=1: y=0 w=9; x=2: y=1 w=1 -> isotone (0 <= 1), identity
    assert(run(Seq((1L, 0L, 9L), (2L, 1L, 1L))) ==
      Seq((1L, 9L, 0L, 0L), (2L, 1L, 1L, 1000000L)))
    // violation pooled by weight: x=1 y=1 w=1; x=2 y=0 w=3 -> pool 1/4
    assert(run(Seq((1L, 1L, 1L), (2L, 0L, 3L))) ==
      Seq((1L, 1L, 1L, 250000L), (2L, 3L, 0L, 250000L)))
    // randomized weighted parity vs brute minimax + monotone output
    val rnd = new scala.util.Random(41)
    val pts = (1 to 60).map(_ => (rnd.nextInt(12).toLong,
      rnd.nextInt(30).toLong - 10L, 1L + rnd.nextInt(7).toLong))
    val got = run(pts)
    assert(got == minimax(pts), s"weighted PAV vs minimax:\n$got\n${minimax(pts)}")
    assert(got.sliding(2).forall(w => w.length < 2 || w(0)._4 <= w(1)._4))
    // negative pooled mean floors (not truncates): y=-1 w=2, y=-2 w=1
    // pooled only if violating; x order makes means -2, -1 -> isotone;
    // reversed x forces the pool: S=-4, W=3 -> floor(-4e6/3) = -1333334
    val negPool = run(Seq((1L, -1L, 2L), (2L, -2L, 1L)))
    assert(negPool.map(_._4) == Seq(-1333334L, -1333334L))
    // unit weights on 0/1 y == isotonicCalibration's fitted table
    val cal = (1 to 40).map(_ => (rnd.nextInt(6).toLong, rnd.nextInt(2).toLong))
    val viaW = run(cal.map { case (v, y) => (v, y, 1L) })
    val viaC = Eval.isotonicCalibration(
        cal.map { case (v, y) => (v, y == 1L) }.toDF("v", "pos"),
        col("v"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(viaW == viaC)
    // NULL / nonpositive-weight rows are excluded, not silently counted
    val mixed = Seq[(Option[Long], Option[Long], Option[Long])](
      (Some(1L), Some(1L), Some(2L)), (Some(1L), Some(0L), Some(0L)),
      (Some(1L), Some(0L), Some(-3L)), (None, Some(1L), Some(1L)),
      (Some(2L), None, Some(1L)), (Some(2L), Some(1L), None))
      .toDF("x", "y", "w")
    val cleaned = Eval.isotonicWeighted(mixed, col("x"), col("y"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(cleaned == Seq((1L, 2L, 2L, 1000000L)))
  }

  test("wilsonInterval: driver-chain parity, extreme rates stay inside [0,1] with non-zero width, naive-band contrast") {
    import spark.implicits._
    import graft.operators.Eval

    val z = 1.959963984540054
    def mirror(n: Long, pos: Long): (Double, Double) = {
      val nD = n.toDouble
      val p = pos.toDouble / nD
      val z2n = z * z / nD
      val denom = 1.0 + z2n
      val center = (p + z2n / 2.0) / denom
      val half = z * math.sqrt(p * (1.0 - p) / nD + z2n / (4.0 * nD)) / denom
      (center - half, center + half)
    }
    val rows = Seq(("a", 40L, 10L), ("b", 10L, 10L), ("c", 7L, 0L),
      ("d", 1000L, 500L))
    val df = rows.flatMap { case (g, n, pos) =>
      (1L to n).map(i => (g, i <= pos)) }.toDF("g", "p")
    val got = Eval.wilsonInterval(df, "g", col("p"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    for ((g, n, pos) <- rows) {
      val (lo, hi) = mirror(n, pos)
      val (gn, gp, glo, ghi) = got(g)
      assert(gn == n && gp == pos)
      assert(glo == lo && ghi == hi, s"$g: got ($glo,$ghi) want ($lo,$hi)")
      assert(glo >= 0.0 && ghi <= 1.0, s"$g: Wilson stays inside [0,1]")
    }
    // at p̂ = 1 the naive band has zero width and lies; Wilson does not
    val (bLo, bHi) = (got("b")._3, got("b")._4)
    assert(bLo < 1.0 && bHi <= 1.0 && bHi - bLo > 0.1)
    // at p̂ = 0 likewise from below
    val (cLo, cHi) = (got("c")._3, got("c")._4)
    assert(cLo >= 0.0 && cHi > 0.2)
  }

  test("cmhTest: brute chain parity, Simpson's-paradox strata give chi2 0 and OR 1, zero-variance and zero-denominator NULLs") {
    import spark.implicits._
    import graft.operators.Eval

    def expand(strata: Seq[(String, Long, Long, Long, Long)]) =
      strata.flatMap { case (g, a, b, c, d) =>
        Seq.fill(a.toInt)((g, true, true)) ++ Seq.fill(b.toInt)((g, true, false)) ++
        Seq.fill(c.toInt)((g, false, true)) ++ Seq.fill(d.toInt)((g, false, false))
      }.toDF("g", "x", "y")
    def run(strata: Seq[(String, Long, Long, Long, Long)]) =
      Eval.cmhTest(expand(strata), "g", col("x"), col("y")).collect()(0)
    def mirror(strata: Seq[(String, Long, Long, Long, Long)])
        : (Long, Long, Long) = {
      var (sa, em, vm) = (0L, 0L, 0L)
      for ((_, a, b, c, d) <- strata) {
        val t = a + b + c + d
        sa += a
        em += math.round((a + b).toDouble * (a + c).toDouble / t.toDouble * 1e6)
        if (t > 1)
          vm += math.round((a + b).toDouble * (c + d).toDouble / t.toDouble *
            (a + c).toDouble / t.toDouble * (b + d).toDouble /
            (t - 1).toDouble * 1e6)
      }
      (sa, em, vm)
    }

    // Simpson's shape: both strata have OR exactly 1 (no within-stratum
    // association) though pooling them would show one -> chi2 exactly 0,
    // OR_MH exactly 1
    val simpson = Seq(("s1", 90L, 10L, 9L, 1L), ("s2", 1L, 9L, 10L, 90L))
    val sOut = run(simpson)
    assert(sOut.getDouble(7) == 0.0, s"chi2: $sOut")
    assert(sOut.getDouble(8) == 1.0, s"or: $sOut")
    assert(sOut.getLong(0) == 220L && sOut.getLong(1) == 2L)

    // random strata: exact chain parity
    val rnd = new scala.util.Random(41)
    val rand = (1 to 4).map(i => (s"g$i", 1L + rnd.nextInt(30),
      1L + rnd.nextInt(30), 1L + rnd.nextInt(30), 1L + rnd.nextInt(30)))
    val rOut = run(rand)
    val (sa, em, vm) = mirror(rand)
    assert(rOut.getLong(2) == sa && rOut.getLong(3) == em && rOut.getLong(4) == vm)
    val chi2 = (sa.toDouble - em.toDouble / 1e6) *
      (sa.toDouble - em.toDouble / 1e6) / (vm.toDouble / 1e6)
    assert(rOut.getDouble(7) == chi2, "chi2 must be the identical IEEE chain")

    // perfect diagonal: bc mass is zero -> OR_MH NULL (chi2 still real)
    val degen = run(Seq(("s", 5L, 0L, 0L, 3L)))
    assert(degen.isNullAt(8) && !degen.isNullAt(7))
    // everyone exposed: n2 = 0 -> zero variance -> chi2 NULL, OR NULL
    val const = run(Seq(("s", 4L, 6L, 0L, 0L)))
    assert(const.isNullAt(7) && const.isNullAt(8))
  }

  test("rougeN: clipped n-gram counts, only shared-gram pairs exist, exact micro floors, self-match is 1") {
    import spark.implicits._
    import graft.operators.Eval

    def run(cand: Seq[(Long, String)], ref: Seq[(Long, String)], n: Int) =
      Eval.rougeN(cand.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
        "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getLong(7))).toMap

    // cand1 bigrams: "a b"x2, "b c", "c a" (total 4); ref10: "a b",
    // "b c", "c c" (total 3) -> clipped match = min(2,1)+min(1,1) = 2
    val got = run(Seq(1L -> "a b c a b", 2L -> "x y z"),
      Seq(10L -> "a b c c", 11L -> "p q r"), n = 2)
    assert(got.keySet == Set((1L, 10L)),
      s"only the overlapping pair exists: ${got.keySet}")
    assert(got((1L, 10L)) == ((2L, 4L, 3L,
      500000L, 666666L, 571428L)), s"got ${got((1L, 10L))}")

    // clipping is real: "a a a a" has the bigram 3x, the ref once ->
    // match clips to 1, not 3
    val clip = run(Seq(1L -> "a a a a"), Seq(9L -> "a a"), n = 2)
    assert(clip((1L, 9L)) == ((1L, 3L, 1L, 333333L, 1000000L, 500000L)))

    // identical texts: precision = recall = f1 = exactly 1e6
    val self = run(Seq(5L -> "w x y z w x"), Seq(6L -> "w x y z w x"), n = 3)
    assert(self((5L, 6L)) == ((4L, 4L, 4L, 1000000L, 1000000L, 1000000L)))

    // sub-n-word docs degrade to the whole-text single shingle
    val tiny = run(Seq(1L -> "hello"), Seq(2L -> "hello"), n = 3)
    assert(tiny((1L, 2L)) == ((1L, 1L, 1L, 1000000L, 1000000L, 1000000L)))

    // zero-token docs are EXCLUDED: without the filter, every empty
    // cand/ref pair shares the "" whole-text shingle and reads as a
    // spurious f1 = 1e6 full-contamination flag
    val empty = run(Seq(1L -> "", 2L -> "   ", 3L -> "a b c"),
      Seq(10L -> "", 11L -> " ", 12L -> "a b c"), n = 2)
    assert(empty.keySet == Set((3L, 12L)),
      s"zero-token docs must not pair: ${empty.keySet}")
  }

  test("bleuPairs: zero-token docs drop out even when the pair list names them") {
    import spark.implicits._
    import graft.operators.Eval
    val out = Eval.bleuPairs(
      Seq(1L -> 10L, 2L -> 11L).toDF("doc_id", "ref_id"),
      Seq(1L -> "a b c", 2L -> "").toDF("doc_id", "text"),
      Seq(10L -> "a b c", 11L -> "  ").toDF("doc_id", "text"),
      "doc_id", "text", maxN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)), s"got $out")
  }

  test("bleuPairs: hand clipped precisions, brevity penalty exact -1e6, zero-gram NULL, pair list bounds output") {
    import spark.implicits._
    import graft.operators.Eval

    def run(pairs: Seq[(Long, Long)], cand: Seq[(Long, String)],
            ref: Seq[(Long, String)]) =
      Eval.bleuPairs(pairs.toDF("doc_id", "ref_id"),
        cand.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
        "doc_id", "text", maxN = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

    val cand = Seq(1L -> "a b c d a b c", 2L -> "a b c d",
      3L -> "zz yy xx ww vv")
    val ref = Seq(10L -> "a b c d", 11L -> "a b c d e f g h")
    // pair (3,10) shares nothing; (1,11) is deliberately NOT listed
    val got = run(Seq(1L -> 10L, 2L -> 11L, 3L -> 10L), cand, ref)
    assert(got.keySet == Set((1L, 10L), (2L, 11L), (3L, 10L)),
      "exactly the listed pairs")

    // (1,10): m = 4/3/2/1, totals 7/6/5/4, c_len 7 > r_len 4 -> bp 0
    val a = got((1L, 10L))
    assert((2 to 7).map(a.getLong) == Seq(7L, 4L, 4L, 3L, 2L, 1L))
    val want = math.round((math.min(0.0, 1.0 - 4.0 / 7.0) +
      (math.log(4.0 / 7.0) + math.log(3.0 / 6.0) + math.log(2.0 / 5.0) +
        math.log(1.0 / 4.0)) / 4.0) * 1e6)
    assert(a.getLong(8) == want, s"got ${a.getLong(8)} want $want")

    // (2,11): every n-gram matches but cand is half the ref length ->
    // log-BLEU is exactly the brevity penalty, -1e6 micro
    val b = got((2L, 11L))
    assert(b.getLong(2) == 4L && b.getLong(3) == 8L && b.getLong(8) == -1000000L)

    // (3,10): zero shared grams at every n -> NULL (BLEU exactly 0)
    val z = got((3L, 10L))
    assert((4 to 7).forall(i => z.getLong(i) == 0L) && z.isNullAt(8))
  }

  test("cohensKappa: hand confusion matrix, disjoint-label raters, perfect agreement, constant raters NULL") {
    import spark.implicits._
    import graft.operators.Eval
    // N=10, O=6; marginals a: en 5, fr 3, de 2 / b: en 5, fr 3, und 2;
    // E2 = 5·5 + 3·3 = 34 (de and und are single-rater labels -> r·c = 0)
    val pairs =
      Seq.fill(4)(("en", "en")) ++ Seq(("en", "fr")) ++
      Seq.fill(2)(("fr", "fr")) ++ Seq(("fr", "en")) ++
      Seq.fill(2)(("de", "und"))
    val out = Eval.cohensKappa(pairs.toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    assert(out.getLong(0) == 10L && out.getLong(1) == 6L)
    assert(out.getDouble(2) == 34.0)
    assert(out.getDouble(3) == (10.0 * 6 - 34) / (100 - 34))
    // disjoint label sets: O = 0, E2 = 0 -> kappa = 0 exactly
    val disj = Eval.cohensKappa(
      Seq(("x", "p"), ("y", "q"), ("x", "q")).toDF("a", "b"),
      col("a"), col("b")).collect()(0)
    assert(disj.getLong(1) == 0L && disj.getDouble(2) == 0.0 &&
      disj.getDouble(3) == 0.0)
    // perfect agreement with >1 label -> kappa = 1 exactly
    val perf = Eval.cohensKappa(
      Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c")).toDF("a", "b"),
      col("a"), col("b")).collect()(0)
    assert(perf.getDouble(3) == 1.0)
    // both raters constant: chance explains everything -> NULL
    val const = Eval.cohensKappa(
      Seq(("a", "a"), ("a", "a")).toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    assert(const.isNullAt(3) && const.getLong(1) == 2L)
  }

  test("durbinTest: brute doubled-midrank parity on a (7,3,1) BIBD with ties, reduces to Friedman when k = t, degenerates NULL") {
    import spark.implicits._
    import graft.operators.Eval

    def brute(cells: Seq[(Long, Long, Long)], k: Int): (Long, Long, Option[Double]) = {
      val blocks = cells.groupBy(_._1).filter(_._2.size == k)
      val b = blocks.size.toLong
      val ss = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      var a4 = BigInt(0)
      blocks.values.foreach { cs =>
        val ys = cs.map(_._3)
        cs.foreach { case (_, t, y) =>
          val s = 2L * ys.count(_ < y) + ys.count(_ == y) + 1L
          a4 += BigInt(s) * s
          val (s0, r0) = ss.getOrElse(t, (0L, 0L))
          ss(t) = (s0 + s, r0 + 1L)
        }
      }
      val tC = ss.size.toLong
      val num = ss.values.map { case (s0, r0) =>
        BigInt(s0 - r0 * (k + 1)) * (s0 - r0 * (k + 1)) }.sum
      val den = a4 - BigInt(b) * k * (k + 1) * (k + 1)
      val d = if (tC >= 2 && den > 0)
        Some((tC - 1).toDouble * num.toDouble / den.toDouble) else None
      (b, tC, d)
    }
    val rnd = new scala.util.Random(63)
    // 14 panels over the cyclic {0,1,3} design on 7 cohorts; tied values
    // on purpose; value grows with the cohort (a planted treatment effect)
    val cells = (0L until 14L).flatMap { b =>
      Seq(0L, 1L, 3L).map(d =>
        (b, (b + d) % 7, rnd.nextInt(6).toLong + ((b + d) % 7) * 3L)) }
    val got = Eval.durbinTest(cells.toDF("b", "t", "y"), "b", "t",
      col("y"), k = 3).collect()(0)
    val want = brute(cells, 3)
    assert((got.getLong(0), got.getLong(1)) == ((want._1, want._2)))
    assert(got.getLong(2) == 3L)
    val gd = if (got.isNullAt(3)) None else Some(got.getDouble(3))
    assert(gd == want._3, s"$gd vs ${want._3}")
    assert(gd.get > 10.0, s"planted cohort effect must flag: $gd")
    // k = t on complete no-tie blocks: Durbin IS Friedman
    val comp = (0L until 10L).flatMap(b =>
      (0L until 4L).map(t => (b, t, rnd.nextInt(1000).toLong * 4L + t)))
    val dAsF = Eval.durbinTest(comp.toDF("b", "t", "y"), "b", "t",
      col("y"), k = 4).collect()(0)
    val fr = Eval.friedmanTest(comp.toDF("b", "t", "y"), "b", "t",
      col("y")).collect()(0)
    assert(math.abs(dAsF.getDouble(3) - fr.getAs[Double]("chi2")) < 1e-9,
      s"${dAsF.getDouble(3)} vs ${fr.getAs[Double]("chi2")}")
    // every cell tied -> denominator 0 -> NULL
    val flat = (0L until 6L).flatMap(b =>
      Seq(0L, 1L, 3L).map(d => (b, (b + d) % 7, 5L)))
    assert(Eval.durbinTest(flat.toDF("b", "t", "y"), "b", "t",
      col("y"), k = 3).collect()(0).isNullAt(3))
  }
}
