package graft.tools

/** Dyadic sketch vs t-digest — the float-tier accuracy companion the
  * ROADMAP called for (the OpqAniso pattern applied to quantiles): the
  * engine's gated mergeable quantile sketch ([[graft.operators
  * .QuantileSketch]], q262) trades KLL/t-digest's distribution-free
  * rank bound for a VALUE-resolution bound with bitwise-exact merges;
  * this tool measures what that trade costs on data the value bound
  * likes least — a heavy-tailed lognormal, where most of the mass
  * crowds a few small-value dyadic buckets.
  *
  * Both sketches get a comparable size budget (cap buckets vs ~cap
  * centroids via the t-digest compression δ = cap) over the same
  * micro-quantized draws; rank error = |rank(answer) − target| / n
  * against the exact sorted truth. The t-digest here is the standard
  * MERGING digest (Dunning & Ertl 2019) with the k₁ scale
  * `k(q) = δ/(2π)·asin(2q−1)` built over sorted data and mid-point
  * interpolation between centroid means — float by construction, which
  * is exactly why it stays a measurement companion and not a gated
  * operator (merge results are order- and interpolation-dependent; the
  * q262 doctrine).
  *
  * Usage: runMain graft.tools.QuantileCompare [n] [cap]
  * Prints one JSON line with per-percentile rank errors for both.
  */
object QuantileCompare {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val cap = if (args.length > 1) args(1).toInt else 512
    val pcts = Seq(0.50, 0.90, 0.99, 0.999)
    val rnd = new scala.util.Random(17L)
    // heavy-tailed micro-quantized draws: floor(1e4 * exp(N(0, 1.5)))
    val xs = Array.fill(n)(math.floor(1e4 * math.exp(rnd.nextGaussian() * 1.5)).toLong)
    val sorted = xs.sorted
    def rankOf(v: Double): Long = sorted.count(_ <= v).toLong

    // --- dyadic adaptive-resolution sketch (the q262 structure) ---
    var k = 0
    var hist = xs.groupBy(identity).map { case (v, a) => v -> a.length.toLong }
    while (hist.size > cap && k < 63) {
      k += 1
      hist = hist.groupBy { case (b, _) => b >> 1 }
        .map { case (b, m) => b -> m.values.sum }
    }
    val buckets = hist.toVector.sortBy(_._1)
    def dyadicQuantile(p: Double): Double = {
      val target = math.ceil(p * n).toLong
      var cum = 0L
      val b = buckets.find { case (_, c) => { cum += c; cum >= target } }.get._1
      // mid-bucket read: [b<<k, ((b+1)<<k)-1]
      ((b << k) + ((b + 1L) << k) - 1L) / 2.0
    }

    // --- merging t-digest, k1 scale, delta = cap ---
    val delta = cap.toDouble
    def kScale(q: Double): Double =
      delta / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
    val cents = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var wSoFar = 0L
    var curMean = sorted(0).toDouble
    var curW = 1L
    var qLeft = 0.0
    var i = 1
    while (i < n) {
      val x = sorted(i).toDouble
      val qRight = (wSoFar + curW + 1.0) / n
      if (kScale(qRight) - kScale(qLeft) <= 1.0) {
        curMean += (x - curMean) / (curW + 1).toDouble
        curW += 1
      } else {
        cents += ((curMean, curW))
        wSoFar += curW
        qLeft = wSoFar.toDouble / n
        curMean = x; curW = 1L
      }
      i += 1
    }
    cents += ((curMean, curW))
    def tdigestQuantile(p: Double): Double = {
      val target = p * n
      var cum = 0.0
      var j = 0
      while (j < cents.length && cum + cents(j)._2 / 2.0 < target) {
        cum += cents(j)._2; j += 1
      }
      if (j >= cents.length) cents.last._1
      else if (j == 0) cents.head._1
      else {
        // interpolate between the straddling centroid means
        val (m1, w1) = cents(j - 1); val (m2, w2) = cents(j)
        val c1 = cum - w1 / 2.0; val c2 = cum + w2 / 2.0
        if (c2 == c1) m2 else m1 + (m2 - m1) * (target - c1) / (c2 - c1)
      }
    }

    def err(v: Double, p: Double): Double =
      math.abs(rankOf(v) - math.ceil(p * n)) / n.toDouble
    def f(v: Double) = BigDecimal(v).setScale(5, BigDecimal.RoundingMode.HALF_UP)
    val parts = pcts.map { p =>
      s""""p${(p * 1000).toInt}":{"dyadic":${f(err(dyadicQuantile(p), p))},"tdigest":${f(err(tdigestQuantile(p), p))}}"""
    }
    println(s"""{"n":$n,"cap":$cap,"dyadic_level":$k,"dyadic_buckets":${buckets.size},"tdigest_centroids":${cents.length},${parts.mkString(",")}}""")
  }
}
