package graft.tools

/** Learned OPQ vs Hadamard·D vs flat PQ on ANISOTROPIC data — the
  * float-tier companion the round-10 Hadamard rotation (q238) called
  * for: on near-isotropic synthetic embeddings the structured rotation
  * measured at PARITY with flat PQ (RECALL.md round 10), exactly as
  * theory predicts; this tool generates vectors with a DECAYING
  * coordinate spectrum (σ_j ∝ (j+1)^−α — the regime OPQ was invented
  * for, Ge et al. 2013 §4) and measures recall@10 for the three
  * rotations under an identical float PQ pipeline:
  *
  *  - flat:     subspaces split the raw coordinates (heavy dims pile
  *              into the first subspace — the motivating failure)
  *  - hadamard: y = H·D·x, the q238 structured rotation (energy
  *              balanced across subspaces, data-oblivious)
  *  - learned:  OPQ-NP — alternate PQ training with the orthogonal
  *              Procrustes update R ← V·Uᵀ from SVD(X·X̂ᵀ) (breeze,
  *              float by construction — the q238 doctrine keeps this
  *              tier out of the exact gates)
  *
  * Everything is deterministic (seeded): data, codebook init, and the
  * alternation. Local (driver-side) on purpose — this is a MEASUREMENT
  * harness for RECALL.md, not a serving path; the serving paths are the
  * gated exact-integer PQ lifecycles (q231/q238/q240).
  *
  * Usage: runMain graft.tools.OpqAniso [n] [dim] [m] [ksub] [alpha]
  * Prints one JSON line with direct-ADC and rerank-100 recall@10 per
  * rotation, for the anisotropic spectrum AND an isotropic control.
  */
object OpqAniso {
  import breeze.linalg.{DenseMatrix, DenseVector, svd, argmin}

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 6000
    val dim = if (args.length > 1) args(1).toInt else 64
    val m = if (args.length > 2) args(2).toInt else 8
    val ksub = if (args.length > 3) args(3).toInt else 64
    val alpha = if (args.length > 4) args(4).toDouble else 0.7
    val nq = 100
    val k = 10
    val dsub = dim / m
    require(dim % m == 0)

    def gen(aniso: Boolean, seed: Long): Array[Array[Double]] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(n) {
        Array.tabulate(dim) { j =>
          val sigma = if (aniso) math.pow(j + 1.0, -alpha) else 1.0
          rnd.nextGaussian() * sigma
        }
      }
    }

    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // deterministic float Lloyd on one subspace slice
    def kmeans(xs: Array[Array[Double]], rounds: Int): Array[Array[Double]] = {
      var cents = Array.tabulate(ksub)(c => xs(c * (xs.length / ksub)).clone())
      for (_ <- 0 until rounds) {
        val sums = Array.fill(ksub)(new Array[Double](xs.head.length))
        val cnts = new Array[Int](ksub)
        xs.foreach { x =>
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < ksub) { val d = l2(x, cents(c)); if (d < bd) { bd = d; best = c }; c += 1 }
          cnts(best) += 1
          var j = 0; while (j < x.length) { sums(best)(j) += x(j); j += 1 }
        }
        cents = Array.tabulate(ksub)(c =>
          if (cnts(c) > 0) sums(c).map(_ / cnts(c)) else cents(c))
      }
      cents
    }

    // PQ pipeline on (possibly rotated) data; returns (recall direct, recall rerank100)
    def pqRecall(xs: Array[Array[Double]], raw: Array[Array[Double]],
                 truth: Array[Array[Int]], qIdx: Array[Int]): (Double, Double) = {
      val books = Array.tabulate(m)(s =>
        kmeans(xs.map(_.slice(s * dsub, (s + 1) * dsub)), rounds = 8))
      val codes = xs.map { x =>
        Array.tabulate(m) { s =>
          val sub = x.slice(s * dsub, (s + 1) * dsub)
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < ksub) { val d = l2(sub, books(s)(c)); if (d < bd) { bd = d; best = c }; c += 1 }
          best
        }
      }
      var hitD = 0; var hitR = 0
      qIdx.zipWithIndex.foreach { case (qi, t) =>
        val q = xs(qi)
        val lut = Array.tabulate(m, ksub)((s, c) =>
          l2(q.slice(s * dsub, (s + 1) * dsub), books(s)(c)))
        val adc = codes.indices.map { i =>
          var s = 0.0; var j = 0
          while (j < m) { s += lut(j)(codes(i)(j)); j += 1 }
          (s, i)
        }.sortBy(x => (x._1, x._2))
        val topD = adc.take(k).map(_._2).toSet
        val short = adc.take(100).map(_._2)
        val topR = short.map(i => (l2(raw(qi), raw(i)), i)).sortBy(identity)
          .take(k).map(_._2).toSet
        val tr = truth(t).toSet
        hitD += topD.intersect(tr).size
        hitR += topR.intersect(tr).size
      }
      (hitD.toDouble / (nq * k), hitR.toDouble / (nq * k))
    }

    def hadamard(x: Array[Double], signs: Array[Int]): Array[Double] = {
      val y = Array.tabulate(dim)(j => x(j) * signs(j))
      var h = 1
      while (h < dim) {
        var i = 0
        while (i < dim) {
          var j = i
          while (j < i + h) {
            val a = y(j); val b = y(j + h)
            y(j) = a + b; y(j + h) = a - b
            j += 1
          }
          i += 2 * h
        }
        h *= 2
      }
      val norm = math.sqrt(dim.toDouble)
      y.map(_ / norm)
    }

    def rotate(xs: Array[Array[Double]], r: DenseMatrix[Double]): Array[Array[Double]] =
      xs.map(x => (r * DenseVector(x)).toArray)

    // OPQ-NP: alternate codebook training and the Procrustes update
    def learnedR(xs: Array[Array[Double]], iters: Int): DenseMatrix[Double] = {
      var r = DenseMatrix.eye[Double](dim)
      for (_ <- 0 until iters) {
        val rx = rotate(xs, r)
        val books = Array.tabulate(m)(s =>
          kmeans(rx.map(_.slice(s * dsub, (s + 1) * dsub)), rounds = 4))
        // reconstruction of each rotated vector from its codes
        val recon = rx.map { x =>
          Array.tabulate(dim) { j =>
            val s = j / dsub
            val sub = x.slice(s * dsub, (s + 1) * dsub)
            var best = 0; var bd = Double.MaxValue
            var c = 0
            while (c < ksub) { val d = l2(sub, books(s)(c)); if (d < bd) { bd = d; best = c }; c += 1 }
            books(s)(best)(j - s * dsub)
          }
        }
        // R <- V U^T from SVD(X^T * Y) with X raw, Y reconstructions
        val xMat = DenseMatrix(xs: _*)      // n x dim
        val yMat = DenseMatrix(recon: _*)   // n x dim
        val c = xMat.t * yMat               // dim x dim
        val svd.SVD(u, _, vt) = svd(c)
        r = (u * vt).t
      }
      r
    }

    def measure(aniso: Boolean): Map[String, (Double, Double)] = {
      val xs = gen(aniso, seed = if (aniso) 101L else 202L)
      val rnd = new scala.util.Random(7L)
      val qIdx = Array.fill(nq)(rnd.nextInt(n))
      val truth = qIdx.map(qi =>
        xs.indices.map(i => (l2(xs(qi), xs(i)), i)).sortBy(identity)
          .take(k).map(_._2).toArray)
      val signs = { val r2 = new scala.util.Random(42L); Array.fill(dim)(if (r2.nextBoolean()) 1 else -1) }
      val had = xs.map(hadamard(_, signs))
      val rl = learnedR(xs, iters = 6)
      val lrn = rotate(xs, rl)
      Map(
        "flat" -> pqRecall(xs, xs, truth, qIdx),
        "hadamard" -> pqRecall(had, xs, truth, qIdx),
        "learned_opq" -> pqRecall(lrn, xs, truth, qIdx))
    }

    val a = measure(aniso = true)
    val iso = measure(aniso = false)
    def f(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val parts = for ((tag, mm) <- Seq("aniso" -> a, "iso" -> iso); (nm, (d, r)) <- mm.toSeq.sortBy(_._1))
      yield s""""${tag}_${nm}":{"direct":${f(d)},"rerank100":${f(r)}}"""
    println(s"""{"n":$n,"dim":$dim,"m":$m,"ksub":$ksub,"alpha":$alpha,${parts.mkString(",")}}""")
  }
}
