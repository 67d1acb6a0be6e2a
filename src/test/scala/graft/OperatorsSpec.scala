package graft

import graft.operators.{AsOf, Dedup, Sessionize, Similarity}
import graft.functions.{Text, Vectors}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSuite {

  private lazy val docsWithDups = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
      (4L, "completely different content about spark query engines and columnar execution plans"),
      (5L, "THE  Quick   Brown fox jumps over the lazy dog near the river bank today") // dup of 1 after normalize
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps min id per normalized fingerprint") {
    val out = Dedup.exact(docsWithDups, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    // fp groups: {1,2,5} -> (1,3), {3} -> (3,1), {4} -> (4,1)
    assert(out.toSeq == Seq((1L, 3L), (3L, 1L), (4L, 1L)))
  }

  test("minhash LSH finds planted near-dups, est_jaccard sane") {
    val pairs = Dedup.minHashLsh(docsWithDups, "doc_id", "text",
        shingleLen = 3, k = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    val ids = pairs.map(t => (t._1, t._2)).toSet
    assert(ids.contains((1L, 2L)) && ids.contains((1L, 5L)) && ids.contains((2L, 5L)))
    assert(pairs.filter(t => Set((1L, 2L), (1L, 5L), (2L, 5L))(t._1 -> t._2)).forall(_._3 == 1.0))
    assert(!ids.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simHashTable equals per-row simHash expression; near-dups closer than random") {
    val fromTable = Dedup.simHashTable(docsWithDups, "doc_id", "text", 32)
      .orderBy("id").collect().map(_.getString(1))
    val fromExpr = docsWithDups.select(col("doc_id"), Dedup.simHash(col("text"), 32).as("sh"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(fromTable.toSeq == fromExpr.toSeq)
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(ham(fromTable(0), fromTable(2)) < ham(fromTable(0), fromTable(3)))
    assert(fromTable(0) == fromTable(1)) // exact dups → identical simhash
  }

  test("ngram jaccard: exact value on planted docs") {
    val pairs = Dedup.ngramJaccard(docsWithDups, "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 5L)) == 1.0)
    // doc 3 differs in last word: 12 shingles each, 11 shared → 11/13
    assert(math.abs(pairs((1L, 3L)) - 11.0 / 13.0) < 1e-12)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("near-dup clustering: components + representative selection on planted docs") {
    val out = Dedup.deduplicateNearDups(docsWithDups, "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // {1,2,3,5} form one cluster (2,5 exact dups of 1; 3 near-dup); 4 alone
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 4L, true), (5L, 1L, false)))
  }

  test("connected components: chain merges transitively") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("connected components: worst-case diameter chain and late-improving star under frontier propagation") {
    import spark.implicits._
    // a 26-node path is the frontier rewrite's worst case: the min label
    // crosses exactly one hop per round (the frontier is a single node),
    // so any frontier bookkeeping bug (dropping a just-changed node,
    // declaring convergence while a change is in flight) breaks the tail
    val chain = (1L until 26L).map(i => (i, i + 1L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain, maxIterations = 40).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 26L).forall(comps(_) == 1L), s"chain labels: $comps")
    // star whose center improves LATE: the center adopts 1 only after the
    // arm delivers it, and must then re-enter the frontier so the other
    // leaves hear about it the round after
    val star = (Seq((50L, 2L)) ++ Seq(60L, 70L, 80L).map(l => (50L, l))
      ++ Seq((1L, 2L))).toDF("id_a", "id_b")
    val starComps = Dedup.connectedComponents(star).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 50L, 60L, 70L, 80L).forall(starComps(_) == 1L),
      s"star labels: $starComps")
  }

  test("connected components: reliable checkpointing matches local and frees superseded rounds") {
    import spark.implicits._
    // without a checkpoint dir the reliable path must fail loudly, not
    // surface Spark's internal assertion from deep inside the first round
    val noDir = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(
        Seq((1L, 2L)).toDF("id_a", "id_b"), reliable = true)
    }
    assert(noDir.getMessage.contains("setCheckpointDir"))

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    try {
      spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
      // a 4-chain needs several propagation rounds → superseded reliable
      // checkpoints must be cleaned up as the iteration advances
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
      val comps = Dedup.connectedComponents(pairs, reliable = true).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
      assert(comps(10L) == 10L && comps(11L) == 10L)
      // only the FINAL label table's files may remain (they back the
      // returned frame); edges + every superseded round must be gone
      def rddDirs = {
        def walk(f: java.io.File): Seq[java.io.File] =
          Option(f.listFiles).toSeq.flatten.flatMap(c => c +: walk(c))
        walk(dir).filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
      }
      assert(rddDirs.size <= 1, s"leaked reliable checkpoints: $rddDirs")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("near-dup dedup: reliable mode end-to-end matches the local-checkpoint result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toFile
    try {
      spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
      val local = Dedup.deduplicateNearDups(docsWithDups, "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50).orderBy("id").collect()
      val rel = Dedup.deduplicateNearDups(docsWithDups, "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50, reliable = true)
        .orderBy("id").collect()
      assert(local.toSeq == rel.toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("simHashPairs: pigeonhole blocking is complete vs brute force; hot buckets stay bounded") {
    import spark.implicits._
    val d = 3
    // completeness: every pair within hamming <= d that brute force finds,
    // the blocked operator must also find (pigeonhole guarantees it)
    val hashes = Dedup.simHashTable(docsWithDups, "doc_id", "text", 32)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ia, sa) <- hashes; (ib, sb) <- hashes if ia < ib
      h = sa.zip(sb).count(p => p._1 != p._2) if h <= d
    } yield (ia, ib, h.toLong)).toSet
    val blocked = Dedup.simHashPairs(docsWithDups, "doc_id", "text",
        bits = 32, maxDistance = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == brute)
    assert(brute.exists(p => p._1 == 1L && p._2 == 2L)) // the planted dups are in there

    // hot bucket: 60 identical docs land every block in one bucket of 60
    // (~1770 pairs per block without the guard); with maxBucketSize = 10
    // those buckets are dropped and only the small-bucket pair survives
    val hot = (100L until 160L).map(i => (i, "spam spam spam spam spam spam spam"))
    val planted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy dog near the rivers"))
    val out = Dedup.simHashPairs((hot ++ planted).toDF("doc_id", "text"),
        "doc_id", "text", bits = 32, maxDistance = 8, maxBucketSize = 10,
        saltHotBuckets = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!out.exists(p => p._1 >= 100L || p._2 >= 100L),
      "hot-bucket pairs must be excluded by the size guard")
    assert(out.contains((1L, 2L)), "small buckets must still produce their pairs")
  }

  test("simHashPairs: salted hot buckets keep completeness with bounded sub-buckets") {
    import spark.implicits._
    // 60 identical docs make every block a hot bucket at cap 10; salting
    // must keep ALL C(60,2) = 1770 intra-hot pairs (plus the planted
    // near-dup pair) — exactly the brute-force set, unlike the drop path
    val hot = (100L until 160L).map(i => (i, "spam spam spam spam spam spam spam"))
    val planted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy dog near the rivers"))
    val docs = (hot ++ planted).toDF("doc_id", "text")
    val d = 8
    val hashes = Dedup.simHashTable(docs, "doc_id", "text", 32)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ia, sa) <- hashes; (ib, sb) <- hashes if ia < ib
      h = sa.zip(sb).count(p => p._1 != p._2) if h <= d
    } yield (ia, ib, h.toLong)).toSet
    val salted = Dedup.simHashPairs(docs, "doc_id", "text",
        bits = 32, maxDistance = d, maxBucketSize = 10, saltHotBuckets = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == brute,
      s"salted pairs (${salted.size}) must equal brute force (${brute.size})")
    assert(salted.count(p => p._1 >= 100L && p._2 >= 100L) == 60 * 59 / 2,
      "all intra-hot-bucket pairs retained")
    assert(salted.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("cross-corpus decontamination: one-sided containment on planted docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // superset of probe 100
      (2L, "completely unrelated training material about distributed query engines")
    ).toDF("doc_id", "text")
    val probe = Seq(
      (100L, "alpha beta gamma delta epsilon"), // 3 shingles, all inside doc 1
      (101L, "nothing shared with training at all whatsoever today")
    ).toDF("doc_id", "text")
    val out = Dedup.crossCorpusOverlap(corpus, probe, "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // probe 100 fully embedded in corpus 1 → containment 1.0 (the one-sided
    // measure; Jaccard would be 3/6 and miss the embedding)
    assert(out == Map((1L, 100L) -> 1.0))
  }

  test("redactPii masks emails, IPv4s, and phones; clean text passes through") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jane.doe+spam@sub.example.co.uk thanks"),
      (2L, "server 192.168.001.1 and backup 10.0.0.254 are up"),
      (3L, "call +14155550123 today"),
      (4L, "nothing sensitive here, just 3.14 and v1.2.3 and a@b"), // a@b: no TLD → kept
      (5L, "mixed: bob@corp.io from 172.16.4.20 or +4915123456789")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), graft.functions.Text.redactPii(col("text")))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "reach me at <EMAIL> thanks")
    assert(out(1) == "server <IP> and backup <IP> are up")
    assert(out(2) == "call <PHONE> today")
    assert(out(3) == "nothing sensitive here, just 3.14 and v1.2.3 and a@b")
    assert(out(4) == "mixed: <EMAIL> from <IP> or <PHONE>")
  }

  test("repetitionRatio: exact duplicated-n-gram fraction on planted text") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a b"),        // 6 tokens, 3 distinct... 1-grams: 6 total, 2 distinct
      (2L, "all distinct words"), // no repetition
      (3L, "x")                   // single token → single shingle → 0.0
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        Text.repetitionRatio(col("text"), 1).as("r1"),
        Text.repetitionRatio(col("text"), 2).as("r2"))
      .orderBy("doc_id").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(out(0) == ((1.0 - 2.0 / 6.0, 1.0 - 2.0 / 5.0))) // 2-grams: [ab,ba,ab,ba,ab] → 2/5 distinct
    assert(out(1) == ((0.0, 0.0)))
    assert(out(2) == ((0.0, 0.0)))
  }

  test("Text.clean strips control chars, collapses whitespace, truncates") {
    import spark.implicits._
    val df = Seq(("  a b\tc  d   e  ", 1L), (("x" * 300), 2L)).toDF("text", "id")
    val out = df.select(col("id"), Text.clean(col("text"), 200).as("c"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out(0) == "a b c d e")
    assert(out(1) == "x" * 200)
  }

  test("assignSplit: total, deterministic, approximately weighted, stable under repartition") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplit(docs, "doc_id", splits)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = Sampling.assignSplit(docs.repartition(17), "doc_id", splits)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.toSeq == b.toSeq)                         // stable under partitioning
    assert(a.length == docs.count())                   // total: every row assigned once
    val frac = a.groupBy(_._2).view.mapValues(_.length.toDouble / a.length).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1 && frac("val") > 0.0 && frac("test") > 0.0, s"$frac")
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.3))
    }
    // fp prefix-sums an ulp over 1.0 must not crash (sum passes the 1e-9
    // check; unclamped cumulative bound would be 1.0000000000000002)
    val fp = Sampling.assignSplit(docs, "doc_id",
      Seq("a" -> 0.63, "b" -> 0.19, "c" -> 0.10000000000000009, "d" -> 0.08, "e" -> 0.0))
    assert(fp.count() == docs.count())
  }

  test("brute-force cosine top-k is exact on hand-computed vectors") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs.where($"vec_id" === 0), vecs, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("LSH ANN: near-perfect recall on planted close neighbors") {
    import spark.implicits._
    // clusters of near-identical vectors (cosine ≈ 0.999) — the regime LSH
    // is built for: sign-collision prob per table ≈ (1-θ/π)^planes ≈ 0.94^6
    val rnd = new scala.util.Random(7)
    val bases = (0 until 5).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 50).map { i =>
      val b = bases(i % 5)
      (i.toLong, b.zipWithIndex.map { case (x, d) => x + 0.01f * ((i * 16 + d) % 7 - 3) })
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(vecs.where($"vec_id" < 5), vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(vecs.where($"vec_id" < 5), vecs, "vec_id", "embedding", 5, planes = 6, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall on planted clusters")
  }

  test("IVF ANN: high recall on planted clusters; sane on real embeddings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val bases = (0 until 5).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 100).map { i =>
      val b = bases(i % 5)
      (i.toLong, b.zipWithIndex.map { case (x, d) => x + 0.01f * ((i * 16 + d) % 7 - 3) })
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(vecs.where($"vec_id" < 5), vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(vecs.where($"vec_id" < 5), vecs, "vec_id", "embedding", 5,
        nCentroids = 8, probes = 2, iterations = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall on planted clusters")

    // multi-round Lloyd refinement (distributed mean re-assembly) must not
    // lose recall vs a single round on well-separated planted clusters
    val ivf3 = Similarity.ivfTopK(vecs.where($"vec_id" < 5), vecs, "vec_id", "embedding", 5,
        nCentroids = 8, probes = 2, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall3 = (exact & ivf3).size.toDouble / exact.size
    assert(recall3 >= recall, s"IVF recall at 3 iterations ($recall3) fell below 1 iteration ($recall)")

    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = emb.where(col("vec_id") % 100 === 0)
    val n = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 10).count()
    assert(n == q.count() * 10)
  }

  test("IVF index lifecycle: build -> write -> read -> search equals in-memory search") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val bases = (0 until 5).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 100).map { i =>
      val b = bases(i % 5)
      (i.toLong, b.zipWithIndex.map { case (x, d) => x + 0.01f * ((i * 16 + d) % 7 - 3) })
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" < 5)
    val idx = Similarity.buildIvfIndex(vecs, "vec_id", "embedding", nCentroids = 8, iterations = 2)
    val direct = Similarity.searchIvfIndex(q, idx, "vec_id", "embedding", 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // ivfTopK IS build + search — the refactor must not change results
    val viaTopK = Similarity.ivfTopK(q, vecs, "vec_id", "embedding", 5,
        nCentroids = 8, probes = 2, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(direct == viaTopK)
    // disk round-trip: the model survives bit-exactly, the search result
    // from the bucketed read-back index is identical
    Similarity.writeIvfIndex(idx, "ivf_spec_idx", buckets = 4)
    val back = Similarity.readIvfIndex(spark, "ivf_spec_idx")
    assert(back.centroids.map(_._1).toSeq == idx.centroids.map(_._1).toSeq)
    assert(back.centroids.zip(idx.centroids).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    val fromDisk = Similarity.searchIvfIndex(q, back, "vec_id", "embedding", 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fromDisk == direct)
  }

  test("LSH ANN sanity on real (diffuse) embeddings; multiprobe lifts recall") {
    // measured: top-10 neighbors here sit at cosine ≈ 0.3 (θ ≈ 72°), where
    // theory gives per-table collision (1-θ/π)^6 ≈ 0.05 → recall ≈ 0.17
    // with 4 tables. Assert we're at least at theory's level.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.where(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallAt(probes: Int): Double = {
      val approx = Similarity.lshTopK(queries, emb, "vec_id", "embedding", 10,
          planes = 6, tables = 4, multiprobe = probes)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val plain = recallAt(0)
    assert(plain >= 0.15, s"LSH recall $plain below theoretical floor")
    // probing all Hamming-1 buckets multiplies per-table collision odds by
    // ~(1 + planes·p·(1-p)/(1-p)) — materially better recall for the cost
    // of ~7× candidates, without more tables
    val probed = recallAt(6)
    assert(probed >= plain, s"multiprobe recall $probed regressed below plain $plain")
    assert(probed >= 0.3, s"multiprobe recall $probed below expected lift")
  }

  test("query-directed multi-probe: recall >= first-planes probing at equal probe volume") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.where(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // at multiprobe = 3 of 6 planes the CHOICE of planes matters (at 6 of 6
    // both strategies probe every plane and coincide)
    def run(directed: Boolean) = {
      val cands = Similarity.lshCandidates(queries, emb, "vec_id", "embedding",
        planes = 6, tables = 4, d = 64, multiprobe = 3, queryDirected = directed).count()
      val hits = Similarity.lshTopK(queries, emb, "vec_id", "embedding", 10,
          planes = 6, tables = 4, multiprobe = 3, queryDirected = directed)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (cands, (exact & hits).size.toDouble / exact.size)
    }
    val (candsFirst, recallFirst) = run(directed = false)
    val (candsDirected, recallDirected) = run(directed = true)
    // identical probe volume (1 + multiprobe buckets per table per query);
    // candidate counts differ only by bucket occupancy
    assert(recallDirected >= recallFirst,
      s"query-directed recall $recallDirected fell below first-planes $recallFirst")
    assert(candsDirected <= candsFirst * 2,
      s"query-directed candidates $candsDirected blew up vs $candsFirst")
    // at full probing both strategies flip the same plane set → same recall
    val all6first = Similarity.lshTopK(queries, emb, "vec_id", "embedding", 10,
        planes = 6, tables = 4, multiprobe = 6, queryDirected = false)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val all6dir = Similarity.lshTopK(queries, emb, "vec_id", "embedding", 10,
        planes = 6, tables = 4, multiprobe = 6, queryDirected = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(all6dir == all6first, "probing all planes must be strategy-independent")
  }

  test("as-of join: <= semantics, equal-ts match, and no-match null") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 300L))
      .toDF("k", "t", "lv").withColumn("t", timestamp_millis($"t"))
    val right = Seq((1L, 10L, 7L), (1L, 15L, 8L), (2L, 6L, 9L))
      .toDF("k", "t", "rv").withColumn("t", timestamp_millis($"t"))
    val out = AsOf.join(left, right, "k", "t", "t", Seq("rv" -> "rv"))
      .orderBy("lv").collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (100L, Some(7L)),  // equal ts matches (<=)
      (200L, Some(8L)),  // latest at-or-before
      (300L, None)))     // right side only after left ts → null
  }

  test("native as-of join (custom LogicalPlan/Strategy/SparkPlan) matches the compositional form") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 300L))
      .toDF("k", "t", "lv").withColumn("t", timestamp_millis($"t"))
    val right = Seq((1L, 10L, 7L), (1L, 15L, 8L), (2L, 6L, 9L))
      .toDF("rk", "rt", "rv")
      .withColumn("rt", timestamp_millis($"rt"))
    val out = graft.operators.AsOf.joinNative(left, right, "k", "rk", "t", "rt")
    // the custom exec must actually be in the plan
    assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val rows = out.orderBy("lv").collect()
      .map(r => (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(rows.toSeq == Seq((100L, Some(7L)), (200L, Some(8L)), (300L, None)))

    // cross-check on real data against the window-function formulation
    val ev = graft.sources.Tables.events(spark, sf0001)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"), col("event_id").as("click_event_id"))
    val native = graft.operators.AsOf.joinNative(purchases, clicks, "user_id", "c_uid", "ts", "c_ts")
      .select(col("event_id"), coalesce(col("click_event_id"), lit(-1L)).as("click"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val composed = graft.operators.AsOf.join(purchases,
        clicks.select(col("c_uid").as("user_id"), col("c_ts").as("ts"), col("click_event_id")),
        "user_id", "ts", "ts", Seq("click_event_id" -> "click_event_id"))
      .select(col("event_id"), coalesce(col("click_event_id"), lit(-1L)).as("click"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(native.toSeq == composed.toSeq)
  }

  test("as-of joins: SQL null semantics — null keys and null timestamps never match (both impls)") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(1L), Some(10L)),  // normal: matches
      (2L, None, Some(10L)),      // null key
      (3L, Some(1L), None))       // null ts
      .toDF("lid", "k", "tms")
      .select(col("lid"), col("k"), timestamp_millis(col("tms")).as("t"))
    val right = Seq(
      (Some(1L), Some(5L), 77L),
      (Option.empty[Long], Some(1L), 88L), // null key on right: matches nothing
      (Some(1L), None, 99L))               // null ts on right: matches nothing
      .toDF("rk", "rtms", "pay")
      .select(col("rk"), timestamp_millis(col("rtms")).as("rt"), col("pay"))

    val native = graft.operators.AsOf.joinNative(left, right, "k", "rk", "t", "rt")
      .select(col("lid"), col("pay")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1).toSeq
    val composed = graft.operators.AsOf.join(left,
        right.select(col("rk").as("k"), col("rt").as("t"), col("pay")),
        "k", "t", "t", Seq("pay" -> "pay"))
      .select(col("lid"), col("pay")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1).toSeq
    val expected = Seq((1L, Some(77L)), (2L, None), (3L, None))
    assert(native == expected, s"native: $native")
    assert(composed == expected, s"composed: $composed")
  }

  test("as-of join carries the matched right row wholesale: null payload fields stay null") {
    import spark.implicits._
    // right rows for key 1: ts=5 has (pay1=50, pay2=500); ts=15 — the MOST
    // RECENT for a left ts of 20 — has pay1=NULL. True as-of semantics
    // return that row's NULL, not a pay1 back-filled from the older ts=5 row
    // (per-column last(ignoreNulls) windows would mix the two rows).
    val left = Seq((1L, 20L, 1L)).toDF("k", "tms", "lid")
      .select(col("k"), timestamp_millis(col("tms")).as("t"), col("lid"))
    val right = Seq(
      (1L, 5L, Some(50L), Some(500L)),
      (1L, 15L, Option.empty[Long], Some(900L)))
      .toDF("k", "tms", "pay1", "pay2")
      .select(col("k"), timestamp_millis(col("tms")).as("t"), col("pay1"), col("pay2"))
    val out = AsOf.join(left, right, "k", "t", "t", Seq("pay1" -> "pay1", "pay2" -> "pay2"))
      .select(col("lid"), col("pay1"), col("pay2")).head()
    assert(out.isNullAt(1), s"pay1 must be the matched row's NULL, got ${out.get(1)}")
    assert(out.getLong(2) == 900L)

    // randomized cross-check vs the native operator with ~30% planted nulls
    // in one of two payload columns (the native merge carries whole rows by
    // construction — it is the semantics oracle here)
    val rnd = new scala.util.Random(13)
    val ls = (0 until 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rs = (0 until 200).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong,
        if (rnd.nextInt(10) < 3) Option.empty[Long] else Some(i.toLong), i.toLong)
    }
    val lf = ls.toDF("k", "tms", "lid")
      .select(col("k"), timestamp_millis(col("tms")).as("t"), col("lid"))
    val rf = rs.toDF("k", "tms", "p1", "p2")
      .select(col("k"), timestamp_millis(col("tms")).as("rt"), col("p1"), col("p2"))
    val composed = AsOf.join(lf, rf.withColumnRenamed("rt", "t"), "k", "t", "t",
        Seq("p1" -> "p1", "p2" -> "p2"))
      .select(col("lid"), col("p1"), col("p2")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1).toSeq
    val native = AsOf.joinNative(lf, rf.withColumnRenamed("k", "rk"), "k", "rk", "t", "rt")
      .select(col("lid"), col("p1"), col("p2")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1).toSeq
    assert(composed == native)
  }

  test("sessionize: gap starts new session; summary is per (key, session)") {
    import spark.implicits._
    val df = Seq((1L, 0L), (1L, 1000L), (1L, 10000L), (2L, 0L))
      .toDF("user_id", "ms").withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val out = Sessionize.summarize(df, "user_id", "ts", gapMs = 5000L)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 2L, 1000L), (1L, 1L, 0L), (2L, 1L, 0L)))
  }

  test("deterministic sampling: stable under repartition, rate approximately honored") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq) // identical subset regardless of partitioning
    val rate = a.length.toDouble / docs.count()
    assert(rate > 0.2 && rate < 0.4, s"empirical rate $rate")
    // stratified: en gets a much lower rate
    val strat = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.05), 0.8)
    val en = strat.where(col("lang") === "en").count().toDouble /
      docs.where(col("lang") === "en").count()
    val rest = strat.where(col("lang") =!= "en").count().toDouble /
      docs.where(col("lang") =!= "en").count()
    assert(en < 0.2 && rest > 0.6, s"en=$en rest=$rest")
  }

  test("plan-time hyperplane lshBucket is bit-identical to the interpreted HOF formulation") {
    graft.GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dim = Vectors.dims(emb, "embedding")
    (0 to 2).foreach { seed =>
      val mismatches = emb.select(
          Vectors.lshBucket(col("embedding"), 6, dim, seed).as("fast"),
          Vectors.lshBucketHof(col("embedding"), 6, seed).as("hof"))
        .where(col("fast") =!= col("hof")).count()
      assert(mismatches == 0L, s"seed=$seed: $mismatches bucket mismatches")
    }
  }

  test("LSH-blocked embedding near-dup: pairs are a subset of exact all-pairs, with real recall") {
    graft.GraftFunctions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val blocked = Similarity.embeddingNearDup(emb, "vec_id", "embedding", threshold = 0.35, planes = 6)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs baseline (fine at spec scale; the quadratic form the
    // blocked operator replaces at 100 TB)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"),
      Vectors.norm(col("embedding")).as("n_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"),
      Vectors.norm(col("embedding")).as("n_b"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .where(when(col("n_a") * col("n_b") === 0.0, lit(0.0))
        .otherwise(Vectors.fastDot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))) >= 0.35)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact), s"blocked pairs must pass the same exact-cosine verify")
    val recall = if (exact.isEmpty) 1.0 else (blocked & exact).size.toDouble / exact.size
    // 6-plane single-table blocking of cosine≥0.35 pairs: collision prob
    // (1-θ/π)^6 with θ≤69° ≈ 0.037 at the threshold, higher for closer
    // pairs — assert above a conservative floor and that SOME pairs survive
    assert(recall >= 0.02 && blocked.nonEmpty, s"recall=$recall n=${blocked.size}")
  }

  test("deterministic sampling at rate 1.0 keeps every row (ffffffff md5 prefixes included)") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() == docs.count())
    assert(Sampling.thresholdHex(1.0) == "g")
    // the sentinel sorts above every hex prefix, including the extreme one
    assert("ffffffff" < "g")
    val strat = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 1.0), 1.0)
    assert(strat.count() == docs.count())
  }

  test("salted join equals plain join (skewed key spread across salts)") {
    import spark.implicits._
    // 90% of the big side lands on one hot key
    val big = (0 until 1000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong)).toDF("k", "v")
    val small = Seq((0L, "hot"), (1L, "a"), (3L, "b"), (99L, "unmatched")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = graft.operators.Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("salting measurably rebalances a planted hot key: max shuffle cell ~ hot/salts") {
    import spark.implicits._
    val salts = 32
    // q54's shape: 70% of rows collapse onto one hot key
    val big = (0 until 20000).map(i => (if (i % 10 < 7) 1L else i.toLong, i.toLong))
      .toDF("k", "v").repartition(8)
    val hot = big.where($"k" === 1L).count()
    // unsalted, the hot key IS one shuffle cell of `hot` rows; salted, the
    // row-uniform salt splits it into ~equal 1/salts shares
    val cells = big.withColumn("_salt", graft.operators.Skew.saltCol(salts))
      .groupBy("k", "_salt").count()
      .agg(max("count")).head().getLong(0)
    assert(hot >= 14000, s"skew plant broken: hot=$hot")
    assert(cells <= hot / salts * 2,
      s"max (key,salt) cell $cells should be ~${hot / salts} (hot=$hot, salts=$salts)")
  }

  test("temperature resampling: alpha=1 is the natural mix; alpha=0.5 upweights rare domains") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // α=1 allocates ∝ n_d, so every domain's rate is exactly the target
    // fraction — identical membership to the plain deterministic sample
    val natural = Sampling.temperatureResample(docs, "doc_id", "lang", alpha = 1.0, targetFraction = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val plain = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(natural.toSeq == plain.toSeq && natural.nonEmpty)
    // α=0.5: the dominant domain (en) is kept at a LOWER rate than rare
    // ones, flattening the mix
    val mixed = Sampling.temperatureResample(docs, "doc_id", "lang", alpha = 0.5, targetFraction = 0.5)
    def rate(df: org.apache.spark.sql.DataFrame, lang: String) =
      df.where(col("lang") === lang).count().toDouble / docs.where(col("lang") === lang).count()
    val en = rate(mixed, "en")
    val rare = rate(mixed, "de")
    assert(en < 0.45 && rare > 0.5, s"en=$en de=$rare — sqrt mix should flatten toward rare domains")
    // content-keyed: identical subset under a different partitioning
    val re = Sampling.temperatureResample(docs.repartition(13), "doc_id", "lang", alpha = 0.5, targetFraction = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(re.toSeq == mixed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("waterfill resampling: capped domains kept whole, realized total hits the target") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val total = docs.count().toDouble
    val target = 0.85
    val fill = Sampling.temperatureResample(docs, "doc_id", "lang",
      alpha = 0.5, targetFraction = target, redistribute = true)
    // at f=0.85 the sqrt mix wants more of the rare languages than exist —
    // the waterfill must keep them WHOLE (rate exactly 1: every row kept,
    // not approximately)
    for (l <- Seq("de", "zh")) {
      val kept = fill.where(col("lang") === l).count()
      val all = docs.where(col("lang") === l).count()
      assert(kept == all, s"$l: waterfill should cap at rate 1 ($kept of $all)")
    }
    // the dominant domain absorbs the re-distributed budget cut
    val en = fill.where(col("lang") === "en").count().toDouble /
      docs.where(col("lang") === "en").count()
    assert(en < 0.8, s"en rate $en should be well below 1")
    // realized total ~ f·N (the whole point of redistribution); the plain
    // single-pass form loses the capped domains' excess
    val realized = fill.count().toDouble
    assert(math.abs(realized - target * total) / total < 0.05,
      s"realized $realized vs target ${target * total}")
    val plain = Sampling.temperatureResample(docs, "doc_id", "lang",
      alpha = 0.5, targetFraction = target).count().toDouble
    assert(realized >= plain, s"waterfill $realized must not undershoot plain $plain")
    // content-keyed: stable under repartitioning
    val re = Sampling.temperatureResample(docs.repartition(11), "doc_id", "lang",
        alpha = 0.5, targetFraction = target, redistribute = true)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(re.toSeq == fill.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("sequence packing: distributed prefix sum equals the sequential reference, any bucketWidth") {
    import spark.implicits._
    import graft.operators.Packing
    val docs = Seq((0L, 5L), (1L, 0L), (2L, 12L), (5L, 3L), (7L, 9L), (11L, 4L), (12L, 10L), (20L, 1L))
    val df = docs.toDF("id", "nt").repartition(5)
    // sequential reference: running start offsets in id order
    val starts = docs.map(_._2).scanLeft(0L)(_ + _).init
    val budget = 8L
    val expected = docs.zip(starts).map { case ((id, n), st) =>
      (id, n, st / budget, st % budget, (st + (if (n > 0) n - 1 else 0L)) / budget) }
    for (w <- Seq(1L, 3L, 100L)) {
      val got = Packing.packSequences(df, "id", "nt", budget, bucketWidth = w)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got.toSeq == expected, s"bucketWidth=$w")
    }
    // invariants on real data: offsets within budget, starts contiguous
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), size(graft.functions.Text.tokens(col("text"))).as("nt"))
    val packed = Packing.packSequences(real, "doc_id", "nt", budget = 256L, bucketWidth = 64L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2) * 256L + r.getLong(3)))
    assert(packed.forall { case (_, start) => start >= 0 })
    packed.sliding(2).foreach { case Array((n, s1), (_, s2)) => assert(s2 == s1 + n) case _ => }
    assert(packed.forall { case (_, st) => st % 256L < 256L })
  }

  test("sliding chunks: coverage, overlap, and lossless reconstruction") {
    import spark.implicits._
    val n = 100
    val text = (1 to n).map(i => s"t$i").mkString(" ")
    val rows = Seq((1L, text), (2L, "short doc"), (3L, "   ")).toDF("doc_id", "text")
      .select(col("doc_id"), explode(Text.slidingChunks(col("text"), 32, 24)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk"), col("c.n_tokens"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // doc 1: ceil((100-1)/24)+1 = 5 chunks; stride-aligned prefixes of each
    // chunk (first 24 tokens, all of the tail) reconstruct the doc exactly
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.length == 5)
    // a chunk is full iff its window fits: start + 32 <= n (with n=100 and
    // stride 24 that is chunks 0-2; chunks 3 and 4 clip to 28 and 4)
    d1.foreach { case (_, idx, _, nt) =>
      assert(nt == math.min(32, n - idx * 24).toLong, s"chunk $idx has $nt tokens") }
    val rebuilt = d1.map(_._3.split(" ").take(24)).flatten.take(n) // overlap dropped
    val full = d1.init.map(_._3.split(" ").take(24)).flatten ++ d1.last._3.split(" ")
    assert(full.mkString(" ") == text)
    assert(rebuilt.sameElements(text.split(" ").take(rebuilt.length)))
    // overlap: chunk i+1 starts with the last 8 tokens of chunk i (full chunks)
    d1.sliding(2).foreach {
      case Array((_, _, a, 32L), (_, _, b, _)) =>
        assert(b.split(" ").take(8).sameElements(a.split(" ").drop(24)))
      case _ =>
    }
    // short doc: one chunk, whole text; whitespace doc: zero chunks
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0, "short doc", 2L)))
    assert(!rows.exists(_._1 == 3L))
  }

  test("tf-idf: rare terms outrank common ones at equal tf; tf dominates within a doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the zebra the the crossing"), // tf: the=3, zebra=1, crossing=1
      (2L, "the quick fox"),
      (3L, "the lazy dog"),
      (4L, "the calm river")
    ).toDF("doc_id", "text")
    val out = operators.TfIdf.topTerms(docs, "doc_id", "text", k = 5)
      .where(col("id") === 1L).orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // within doc 1: 'the' wins on tf (3 * idf_min); among the tf=1 terms,
    // the corpus-unique ones outrank nothing-else-here (both unique, tie
    // broken alphabetically)
    assert(out.map(_._2).toSeq == Seq("the", "crossing", "zebra"))
    assert(out.head._3 == 3L && out.head._4 == 4L) // the: tf 3, df 4
    assert(out(1)._4 == 1L && out(2)._4 == 1L)     // unique terms: df 1
    // and at EQUAL tf, lower df must rank strictly higher: compare doc 2's
    // 'quick' (df 1) vs 'the' (df 4), both tf 1
    val d2 = operators.TfIdf.topTerms(docs, "doc_id", "text", k = 5)
      .where(col("id") === 2L).orderBy("rank").collect().map(_.getString(2))
    assert(d2.indexOf("quick") < d2.indexOf("the"))
  }

  test("text functions: tokens, shingles, fingerprint, langid") {
    import spark.implicits._
    val df = Seq(("  The QUICK  brown ", 1L)).toDF("text", "id")
    val toks = df.select(Text.tokens($"text")).head().getSeq[String](0)
    assert(toks == Seq("the", "quick", "brown"))
    val sh = df.select(Text.wordShingles($"text", 2)).head().getSeq[String](0)
    assert(sh == Seq("the quick", "quick brown"))
    val fp = df.select(Text.fingerprint($"text")).head().getString(0)
    assert(fp == java.security.MessageDigest.getInstance("MD5")
      .digest("the quick brown".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val lang = Seq(("the cat is on the mat and it is happy", 1L)).toDF("text", "id")
      .select(Text.langId($"text")).head().getString(0)
    assert(lang == "en")
  }

  test("SpaceSaving top-k sketch: exact when capacity >= distinct; bounded error under eviction") {
    import spark.implicits._
    graft.GraftFunctions.ensureRegistered(spark)
    // skewed stream: item i appears (i+1)*10 times, i in 0..9
    val rows = (0 until 10).flatMap(i => Seq.fill((i + 1) * 10)(s"item$i"))
    val df = spark.createDataset(rows).toDF("w").repartition(8)

    // exact regime
    val exactTk = df.agg(call_function("graft_topk", col("w"), lit(3), lit(64)).as("tk"))
      .select(explode(col("tk")).as("t")).select(col("t.item"), col("t.count"), col("t.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exactTk.toSeq == Seq(("item9", 100L, 0L), ("item8", 90L, 0L), ("item7", 80L, 0L)))

    // eviction regime: capacity 4 < 10 distinct; heavy hitters must surface
    // with estimate in [true, true+err]
    val approx = df.agg(call_function("graft_topk", col("w"), lit(2), lit(4)).as("tk"))
      .select(explode(col("tk")).as("t")).select(col("t.item"), col("t.count"), col("t.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = Map("item9" -> 100L, "item8" -> 90L)
    assert(approx.exists(_._1 == "item9"))
    approx.filter(t => truth.contains(t._1)).foreach { case (i, est, err) =>
      assert(est >= truth(i) && est - err <= truth(i), s"$i est=$est err=$err true=${truth(i)}")
    }
  }

  test("grouped SpaceSaving: one exact sketch per group, map-side partial aggregation") {
    import spark.implicits._
    graft.GraftFunctions.ensureRegistered(spark)
    // group A: a×5, b×3, c×3, d×1 — tie at the k=2 boundary resolves
    // (count desc, item asc) → b beats c; group B: disjoint vocabulary
    val rows = Seq.fill(5)(("A", "a")) ++ Seq.fill(3)(("A", "b")) ++
      Seq.fill(3)(("A", "c")) ++ Seq(("A", "d")) ++
      Seq.fill(4)(("B", "x")) ++ Seq.fill(2)(("B", "y"))
    val df = rows.toDF("g", "w").repartition(8)
    val out = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("w"), lit(2), lit(64)).as("tk"))
      .select(col("g"), explode(col("tk")).as("t"))
      .select(col("g"), col("t.item"), col("t.count"))
      .orderBy(col("g"), col("t.count").desc, col("t.item"))
    assert(out.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("A", "a", 5L), ("A", "b", 3L), ("B", "x", 4L), ("B", "y", 2L)))
    // the sketch must combine ACROSS partitions map-side like any native
    // aggregate — per-group state is the sketch, never the group's rows
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.toLowerCase.contains("partial_graft_topk") ||
      plan.toLowerCase.contains("partial(graft_topk"),
      s"grouped sketch must partial-aggregate before the exchange:\n$plan")
  }

  test("randomProject: JL geometry — norms preserved in expectation, projected recall holds") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .withColumn("orig", col("embedding"))
    val proj = graft.operators.Similarity.randomProject(emb, "embedding", outDim = 16, dim = 64)
    // norms preserved in EXPECTATION: per-row ratio fluctuates ~1/√16, the
    // corpus mean concentrates — √(12/outDim) scaling is what makes this 1
    val meanRatio = proj
      .where(graft.functions.Vectors.normSq(col("orig")) > 0)
      .select(avg(graft.functions.Vectors.normSq(col("embedding")) /
        graft.functions.Vectors.normSq(col("orig"))).as("r"))
      .head().getDouble(0)
    assert(meanRatio > 0.85 && meanRatio < 1.15, s"mean norm ratio $meanRatio")
    // GENUINE neighbors survive the 64→16 cut: planted Gaussian clusters
    // (the IVF/LSH spec pattern, here in the full 64-d) — within-cluster
    // cosine ≈ 1 vs cross-cluster ≈ 0 dwarfs the JL distortion at k=16.
    // On the DIFFUSE real corpus the same recall@10 measures ~0.12: near-
    // uniform cosine orderings are noise-level gaps no distance-preserving
    // projection can keep, which is exactly JL's contract — distances
    // within (1±ε), not orderings finer than ε.
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val bases = (0 until 5).map(_ => Array.fill(64)(rnd.nextGaussian().toFloat))
    val planted = (0 until 100).map { i =>
      val b = bases(i % 5)
      (i.toLong, b.zipWithIndex.map { case (x, d) => x + 0.01f * ((i * 64 + d) % 7 - 3) })
    }.toDF("vec_id", "embedding")
    val exact = graft.operators.Similarity.bruteForceTopK(
        planted.where(col("vec_id") < 5), planted, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val prj = graft.operators.Similarity.randomProject(planted, "embedding", outDim = 16, dim = 64)
    val projected = graft.operators.Similarity.bruteForceTopK(
        prj.where(col("vec_id") < 5), prj, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & projected).size.toDouble / exact.size
    assert(recall >= 0.9, s"projected recall on planted clusters = $recall")
  }

  test("native functions usable from SQL after registration") {
    graft.GraftFunctions.ensureRegistered(spark)
    val d = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0)
    assert(d == 11.0)
    val sh = spark.sql("SELECT graft_shingles('The quick  Brown fox', 2) AS s").head().getSeq[String](0)
    assert(sh == Seq("the quick", "quick brown", "brown fox"))
  }

  test("csv, json, and orc round-trip through Tables sources") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars")).limit(50)
    val base = java.nio.file.Files.createTempDirectory("graft-src").toString
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    docs.write.mode("overwrite").json(s"$base/json")
    docs.write.mode("overwrite").orc(s"$base/orc")
    val fromCsv = graft.sources.Tables.csv(spark, s"$base/csv", Some("doc_id BIGINT, lang STRING, n_chars BIGINT"))
    val fromJson = graft.sources.Tables.json(spark, s"$base/json")
    val fromOrc = graft.sources.Tables.orc(spark, s"$base/orc")
    assert(fromCsv.count() == 50 && fromJson.count() == 50 && fromOrc.count() == 50)
    val want = docs.agg(sum(col("n_chars"))).head().getLong(0)
    assert(fromCsv.agg(sum(col("n_chars"))).head().getLong(0) == want)
    assert(fromOrc.agg(sum(col("n_chars"))).head().getLong(0) == want)
    // ORC scans take pushdown like parquet
    val plan = fromOrc.where(col("doc_id") === 7).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan)
  }

  test("rolling fingerprint matches a hand-computed polynomial hash") {
    import spark.implicits._
    val df = Seq(("ab c", 1L)).toDF("text", "id")
    val got = df.select(graft.functions.Text.rollingFingerprint($"text")).head().getLong(0)
    val norm = "ab c"
    val want = norm.foldLeft(0L)((a, ch) => (a * 31 + ch.toLong) % 1000000007L)
    assert(got == want)
  }

  test("vector functions: dot/norm/cosine/normalize on knowns") {
    import spark.implicits._
    graft.GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    assert(df.select(Vectors.dot($"a", $"b")).head().getDouble(0) == 24.0)
    assert(df.select(Vectors.norm($"a")).head().getDouble(0) == 5.0)
    assert(math.abs(df.select(Vectors.cosine($"a", $"b")).head().getDouble(0) - 24.0 / 25.0) < 1e-15)
    val n = df.select(Vectors.l2normalize($"a")).head().getSeq[Double](0)
    assert(n == Seq(0.6, 0.8))
    // codegen'd normSq (fastDot(a,a)) bit-matches the interpreted HOF form
    val (fastN, hofN) = (df.select(Vectors.normSq($"a")).head().getDouble(0),
      df.select(Vectors.normSqHof($"a")).head().getDouble(0))
    assert(java.lang.Double.doubleToLongBits(fastN) == java.lang.Double.doubleToLongBits(hofN))
  }

  test("vector functions need no session registration (direct Catalyst nodes)") {
    // a FRESH session whose registry has no graft functions: fastDot /
    // normSq / l2normalize must still analyze (library users shouldn't need
    // ensureRegistered unless they go through SQL strings)
    import spark.implicits._
    val clean = spark.newSession()
    val df = clean.createDataset(Seq((Array(3.0f, 4.0f), Array(1.0f, 0.0f)))).toDF("a", "b")
    assert(df.select(Vectors.fastDot(col("a"), col("b"))).head().getDouble(0) == 3.0)
    assert(df.select(Vectors.norm(col("a"))).head().getDouble(0) == 5.0)
    assert(df.select(Vectors.l2normalize(col("a"))).head().getSeq[Double](0) == Seq(0.6, 0.8))
  }

  test("bloom filter: zero false negatives, measured fpp near the configured bound") {
    import spark.implicits._
    val members = (0L until 2000L).map(i => i * 7919L)
    val bloom = operators.Bloom.build(members.toDF("k"), "k",
      expectedItems = members.size, fpp = 0.01)
    // every inserted key answers true — a Bloom filter's hard guarantee
    val misses = members.toDF("k")
      .where(!bloom.mightContain(col("k"))).count()
    assert(misses == 0L)
    // non-members: the observed false-positive rate should sit near 1%
    // (binomial slack: well under 3x the bound at 20k trials)
    val nonMembers = (0L until 20000L).map(i => i * 7919L + 1L)
    val fp = nonMembers.toDF("k")
      .where(bloom.mightContain(col("k"))).count()
    assert(fp.toDouble / nonMembers.size < 0.03,
      s"observed fpp ${fp.toDouble / nonMembers.size}")
  }

  test("bloom expressions work from SQL after registration") {
    GraftFunctions.ensureRegistered(spark)
    // build positions via SQL, probe via SQL, against the Scala-built model
    val pos = spark.sql(
      "SELECT graft_bloom_positions(CAST(42 AS BIGINT), 640, 3) AS p")
      .head().getSeq[Long](0)
    assert(pos.length == 3 && pos.forall(p => p >= 0 && p < 640))
    import spark.implicits._
    val bloom = operators.Bloom.build(Seq(42L).toDF("k"), "k", 1L, 0.01)
    val hit = spark.sql(
      s"SELECT graft_bloom_contains(CAST(42 AS BIGINT), " +
        s"ARRAY(${bloom.words.mkString("CAST(", " AS BIGINT), CAST(", " AS BIGINT)")}), ${bloom.k})")
      .head().getBoolean(0)
    assert(hit)
  }

  test("bloom decontamination equals the exact path and the prefilter actually prunes") {
    val docs = sources.Tables.documents(spark, sf0001)
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val probe = docs.where(col("doc_id") % 10 === 0)
    val exact = Dedup.crossCorpusOverlap(corpus, probe, "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy("corpus_id", "probe_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bloomed = Dedup.crossCorpusOverlapBloom(corpus, probe, "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50, fpp = 0.01)
      .orderBy("corpus_id", "probe_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(bloomed.toSeq == exact.toSeq)
  }

  test("bloom prefilter prunes a disjoint corpus down to the planted matches plus fpp trickle") {
    import spark.implicits._
    // corpus: 500 docs of doc-unique token streams (zero shingles shared
    // with the probe) plus 5 planted copies of probe text
    val gibberish = (0 until 500).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${i}x$j").mkString(" ")))
    val probeText = "shared evaluation prompt about distributed query planning and shuffles"
    val planted = (500 until 505).map(i => (i.toLong, probeText))
    val corpus = (gibberish ++ planted).toDF("doc_id", "text")
    val probe = Seq((9000L, probeText)).toDF("doc_id", "text")
    def keys(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(array_distinct(Text.fastWordShingles(col("text"), 3))).as("s"))
      .select(expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)").as("sh"))
    val psKeys = keys(probe).distinct()
    val bloom = operators.Bloom.build(psKeys, "sh", psKeys.count(), fpp = 0.01)
    val total = keys(corpus).count()
    val survivors = keys(corpus).where(bloom.mightContain(col("sh"))).count()
    // 505 docs x 28 shingles each; only the 5 planted docs' shingles (x8
    // distinct) should survive, plus ~1% false positives of the rest
    assert(survivors < total / 10,
      s"prefilter barely pruned: $survivors of $total shingle rows survived")
    // and the operator built on it still finds exactly the planted docs
    val hits = Dedup.crossCorpusOverlapBloom(corpus, probe, "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50, fpp = 0.01)
      .select("corpus_id").collect().map(_.getLong(0)).sorted
    assert(hits.toSeq == Seq(500L, 501L, 502L, 503L, 504L))
  }

  test("canonical dedup: clusters keep the argmax-quality member, tiebreak min id") {
    import spark.implicits._
    // 1-2-3 near-dup cluster (2 has the longest, highest-quality text),
    // 4 is a singleton
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today and the calm water is clear and the air is warm"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (4L, "completely different content about spark query engines and columnar execution plans")
    ).toDF("doc_id", "text")
    val stop = Text.langMarkers.toMap.apply("en")
    val out = Dedup.canonicalizeNearDups(docs, "doc_id", "text",
        score = _ => Text.qualityScore(col("text"), stop),
        shingleLen = 3, threshold = 0.3, maxShingleDf = 50)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(t => t._1 -> t).toMap
    // quality is length-driven here: doc 2 must win its cluster
    val canon123 = byId(1L)._2
    assert(canon123 == 2L, s"expected doc 2 as canonical, got $canon123")
    assert(Seq(1L, 3L).forall(id => byId(id)._2 == canon123 && !byId(id)._3))
    assert(byId(2L)._3)
    assert(byId(4L) == ((4L, 4L, true))) // singleton keeps itself
  }

  test("incremental dedup: batch classified against the index, min-id within-batch tie-breaks") {
    import spark.implicits._
    val corpusText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val indexDocs = Seq((1L, corpusText)).toDF("doc_id", "text")
    val index = Dedup.dedupIndex(indexDocs, "doc_id", "text", shingleLen = 3, k = 16, bands = 4)
    val batch = Seq(
      (10L, corpusText),                                            // exact copy of indexed -> exact_dup
      (11L, "THE  Quick  brown fox jumps over the lazy dog near the river bank today"), // normalizes to same fp -> exact_dup
      (12L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near variant -> candidate
      (13L, "completely different content about spark query engines and columnar execution plans"), // fresh -> kept
      (14L, "completely different content about spark query engines and columnar execution plans")  // batch dup of 13 -> exact_dup
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(index, batch, "doc_id", "text",
        shingleLen = 3, k = 16, bands = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == "exact_dup")
    assert(out(11L) == "exact_dup")
    assert(out(12L) == "near_dup_candidate", s"got ${out(12L)}")
    assert(out(13L) == "kept")
    assert(out(14L) == "exact_dup") // 13 is the min-id batch holder of that fp
  }

  test("native int8 round trip is bit-identical to the HOF quantize->dequantize chain") {
    val emb = sources.Tables.embeddings(spark, sf0001)
    val diverged = emb.select(
        Vectors.dequantizeInt8(Vectors.quantizeInt8(col("embedding"))).as("hof"),
        Vectors.int8RoundTrip(col("embedding")).as("native"))
      .where(not(col("hof") === col("native")))
      .count()
    assert(diverged == 0L)
  }

  test("mini-batch IVF refinement keeps planted-cluster recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val bases = (0 until 5).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 100).map { i =>
      val b = bases(i % 5)
      (i.toLong, b.zipWithIndex.map { case (x, d) => x + 0.01f * ((i * 16 + d) % 7 - 3) })
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val mini = Similarity.ivfTopK(q, vecs, "vec_id", "embedding", 5,
        nCentroids = 8, probes = 2, iterations = 3, miniBatchFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & mini).size.toDouble / exact.size
    assert(recall >= 0.9, s"mini-batch IVF recall $recall")
  }

  test("two-stage quantized IVF: recall tracks float IVF on planted clusters, exact rerank scores") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val bases = (0 until 5).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 100).map { i =>
      val b = bases(i % 5)
      (i.toLong, b.zipWithIndex.map { case (x, d) => x + 0.01f * ((i * 16 + d) % 7 - 3) })
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val quant = Similarity.ivfTopKQuantized(q, vecs, "vec_id", "embedding", 5,
        nCentroids = 8, probes = 2, iterations = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val recall = (exact & quant.map(t => (t._1, t._2)).toSet).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized IVF recall $recall on planted clusters")
    // stage-2 scores are float cosines, free of quantization error: any
    // (query, neighbor) pair shared with brute force agrees to rounding
    // (normalize-then-dot vs dot-then-divide differ only in ulps)
    val exactScores = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    quant.foreach { case (qid, nid, c) =>
      exactScores.get((qid, nid)).foreach(e =>
        assert(math.abs(e - c) < 1e-9, s"rerank score $c != exact $e for ($qid, $nid)"))
    }
  }

  test("int8 quantization: codes in range, small reconstruction error, top-k recall survives") {
    import spark.implicits._
    val emb = sources.Tables.embeddings(spark, sf0001)
    val deq = emb.select(col("vec_id"),
      Vectors.dequantizeInt8(Vectors.quantizeInt8(col("embedding"))).as("embedding"))
    // codes bounded to int8, per-component error <= 0.5/scale by construction
    val bad = emb.select(Vectors.quantizeInt8(col("embedding")).as("qs"))
      .where(exists(col("qs.q"), q => q > 127 || q < -127)).count()
    assert(bad == 0L)
    // search over dequantized codes: overlap@10 vs exact must stay high —
    // the operative claim behind the 4x memory cut
    val queries = emb.where(col("vec_id") % 100 === 0)
    val dqQueries = deq.where(col("vec_id") % 100 === 0)
    def topk(q: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(q, c, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topk(queries, emb)
    val quant = topk(dqQueries, deq)
    val recalls = exact.keys.toSeq.map(q => quant.getOrElse(q, Set.empty)
      .intersect(exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"quantized top-10 recall $mean < 0.9")
  }

  test("per-row minhash band keys are bit-identical to the index's flat formulation") {
    val docs = sources.Tables.documents(spark, sf0001).limit(50)
    val flat = Dedup.dedupIndex(docs, "doc_id", "text", shingleLen = 3, k = 16, bands = 4)
      .select(col("id"), col("bands"))
    val perRow = docs.select(col("doc_id").as("id"),
      Dedup.minHashBandKeysPerRow(col("text"), 3, 16, 4).as("bands2"))
    val joined = flat.join(perRow, Seq("id"))
      .where(not(col("bands") === col("bands2")))
    assert(joined.count() == 0L, "per-row band keys diverged from the flat index bands")
  }

  test("winsorize: interpolated per-group bounds clamp the tails, approx twin within rank error") {
    import spark.implicits._
    val df = ((1 to 100).map(v => ("a", v.toLong)) ++ Seq(("b", 1000L), ("b", 2000L)))
      .toDF("grp", "v")
    val out = operators.Outliers.winsorize(df, "grp", "v", lo = 0.05, hi = 0.95)
      .where(col("grp") === "a")
      .select(col("v"), col("v_lo"), col("v_hi"), col("v_clipped")).collect()
    // percentile's linear interpolation on 1..100: rank = p*(n-1)+1
    val (lo, hi) = (0.05 * 99 + 1, 0.95 * 99 + 1) // 5.95, 95.05
    out.foreach { r =>
      assert(r.getDouble(1) == lo && r.getDouble(2) == hi)
      val (v, c) = (r.getLong(0).toDouble, r.getDouble(3))
      assert(c == math.min(math.max(v, lo), hi), s"v=$v clipped to $c")
    }
    // the production (approx_percentile) path: bounds within a value of
    // exact on this dense 1..100 ladder, clip column present
    val approx = operators.Outliers.winsorize(df, "grp", "v", 0.05, 0.95, exact = false)
      .where(col("grp") === "a").select(col("v_lo"), col("v_hi")).head()
    assert(math.abs(approx.getDouble(0) - lo) <= 1.0)
    assert(math.abs(approx.getDouble(1) - hi) <= 1.0)
  }

  test("index update absorbs only kept docs; the next batch sees them as corpus") {
    import spark.implicits._
    val corpusText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val freshText = "completely different content about spark query engines and columnar execution plans"
    val index = Dedup.dedupIndex(Seq((1L, corpusText)).toDF("doc_id", "text"),
      "doc_id", "text", 3, 16, 4)
    val batch = Seq((10L, corpusText), (13L, freshText)).toDF("doc_id", "text")
    val statuses = Dedup.incrementalDedup(index, batch, "doc_id", "text", 3, 16, 4)
    val updated = Dedup.updateDedupIndex(index, batch, statuses, "doc_id", "text", 3, 16, 4)
    // 10 was an exact dup (not absorbed); 13 was kept (absorbed)
    assert(updated.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 13L))
    // the loop: a re-sent copy of the absorbed doc is now an exact dup
    val next = Dedup.incrementalDedup(updated, Seq((20L, freshText)).toDF("doc_id", "text"),
      "doc_id", "text", 3, 16, 4)
    assert(next.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((20L, "exact_dup")))
  }

  test("per-group cap keeps exactly min(k, n) rows per group, stable under repartition") {
    import spark.implicits._
    val df = ((1 to 30).map(i => ("big", i.toLong)) ++ (1 to 3).map(i => ("small", 100L + i)))
      .toDF("grp", "id")
    val capped = operators.Sampling.capPerGroup(df, "grp", "id", 10)
    val byGrp = capped.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp == Map("big" -> 10L, "small" -> 3L))
    // content-keyed: the kept SET is identical under any partitioning
    val kept1 = capped.select("id").collect().map(_.getLong(0)).toSet
    val kept2 = operators.Sampling.capPerGroup(df.repartition(7), "grp", "id", 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept1 == kept2)
  }

  test("interleave: order indexes are a permutation that cycles through groups") {
    import spark.implicits._
    val df = ((1 to 6).map(i => ("a", i.toLong)) ++ (1 to 6).map(i => ("b", 10L + i))
      ++ (1 to 2).map(i => ("c", 20L + i))).toDF("grp", "id")
    val out = operators.Sampling.interleaveByGroup(df, "grp", "id")
      .select("grp", "order_idx").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    // injective slots
    assert(out.map(_._2).distinct.length == out.length)
    // reading in order: the first #groups slots are distinct groups, and
    // slot mod G identifies the group throughout
    val g = 3
    assert(out.take(g).map(_._1).toSet == Set("a", "b", "c"))
    out.foreach { case (grp, idx) =>
      val expected = Seq("a", "b", "c")((idx % g).toInt)
      assert(grp == expected, s"slot $idx carries $grp, expected $expected")
    }
  }

  test("canonical dedup: equal scores fall back to min id") {
    import spark.implicits._
    val docs = Seq(
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = Dedup.canonicalizeNearDups(docs, "doc_id", "text",
        score = _ => lit(1.0), shingleLen = 3, threshold = 0.3, maxShingleDf = 50)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((7L, 7L, true), (9L, 7L, false)))
  }

  test("canonical dedup: string doc ids resolve, tiebreak is lexicographic min") {
    import spark.implicits._
    // the (-score, id) tiebreak must not require a numeric id — UUIDs and
    // string keys are accepted by every other Dedup operator
    val docs = Seq(
      ("doc-b", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      ("doc-a", "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = Dedup.canonicalizeNearDups(docs, "doc_id", "text",
        score = _ => lit(1.0), shingleLen = 3, threshold = 0.3, maxShingleDf = 50)
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("doc-a", "doc-a", true), ("doc-b", "doc-a", false)))
  }

  test("native int8 round trip matches the HOF chain on null elements") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Some(1.0f), None, Some(-3.0f))), // null element, scale > 0
      (2L, Seq[Option[Float]](None, None)),     // all-null: scale 0 -> all 0.0
      (3L, Seq(Some(0.0f), Some(0.0f))),        // all-zero: scale 0 -> all 0.0
      // NaN: Spark's array_max ranks NaN above all doubles -> scale NaN ->
      // every non-null element NaN (a Java `>` max loop would skip it)
      (4L, Seq(Some(5.0f), Some(Float.NaN), None)),
      // Infinity: scale = 127/Inf = 0.0 -> all elements (incl. null) 0.0
      (5L, Seq(Some(1.0f), Some(Float.PositiveInfinity)))
    ).toDF("id", "embedding")
    val diverged = df.select(
        Vectors.dequantizeInt8(Vectors.quantizeInt8(col("embedding"))).as("hof"),
        Vectors.int8RoundTrip(col("embedding")).as("native"))
      .where(not(col("hof") <=> col("native")))
      .count()
    assert(diverged == 0L)
  }

  test("winsorize keeps NULL-group rows and clips them against the NULL group's bounds") {
    import spark.implicits._
    val df = Seq((Some("a"), 1L), (Some("a"), 100L), (None, 5L), (None, 50L))
      .toDF("grp", "v")
    val out = operators.Outliers.winsorize(df, "grp", "v", lo = 0.0, hi = 1.0)
    assert(out.count() == 4L) // no silent drop of the NULL group
    val nulls = out.where(col("grp").isNull)
      .select(col("v_lo"), col("v_hi")).distinct().collect()
    assert(nulls.toSeq.map(r => (r.getDouble(0), r.getDouble(1))) == Seq((5.0, 50.0)))
  }

  test("temperatureRates validates alpha and targetFraction like the batch operator") {
    import spark.implicits._
    val df = Seq(("en", 1L), ("fr", 2L)).toDF("lang", "doc_id")
    intercept[IllegalArgumentException] {
      operators.Sampling.temperatureRates(df, "lang", alpha = 0.0, targetFraction = 0.5)
    }
    intercept[IllegalArgumentException] {
      operators.Sampling.temperatureRates(df, "lang", alpha = 0.5, targetFraction = 1.5)
    }
  }

  test("shuffleShard: dense per-shard positions, a true permutation, repartition-stable") {
    import spark.implicits._
    val df = (0L until 200L).toDF("id")
    val out = operators.Sampling.shuffleShard(df, "id", nShards = 8, seed = "s")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 200 && out.map(_._1).distinct.length == 200) // permutation: every row once
    assert(out.forall(t => t._2 >= 0 && t._2 < 8))
    // positions are dense 0..n-1 within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // content-keyed: identical assignment under any input partitioning
    val out2 = operators.Sampling.shuffleShard(df.repartition(7), "id", nShards = 8, seed = "s")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out.toSet == out2)
    // the seed changes the permutation (sanity: not the identity mapping)
    val other = operators.Sampling.shuffleShard(df, "id", nShards = 8, seed = "t")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(other != out.toSet)
  }

  test("writeShards: each shard directory replays its slice of the permutation in pos order") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      operators.Sampling.writeShards(df, "id", nShards = 4, path = dir, seed = "s")
      val expected = operators.Sampling.shuffleShard(df, "id", nShards = 4, seed = "s")
        .where(col("shard") === 2).orderBy(col("pos"))
        .select("id").collect().map(_.getLong(0)).toSeq
      // a worker's read pattern: its shard directory, streamed in file order
      val got = spark.read.parquet(s"$dir/shard=2")
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got == expected, "shard file order must equal pos order")
      // all four shard directories exist and the union is the full dataset
      val all = spark.read.parquet(dir)
      assert(all.select("shard").distinct().count() == 4)
      assert(all.count() == 100 && all.select("id").distinct().count() == 100)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("takeUntilBudget: greedy skip-and-continue per domain, budget never exceeded") {
    import spark.implicits._
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    // domain a (score order): 5, 4, 4(skip: would hit 13), 1(kept: lands exactly on 10)
    // domain b: 20(skip: alone over budget), 3(kept after the skip)
    val df = Seq(
      (1L, "a", 40, words(5)), (2L, "a", 30, words(4)), (3L, "a", 20, words(4)), (4L, "a", 10, words(1)),
      (10L, "b", 9, words(20)), (11L, "b", 8, words(3))
    ).toDF("id", "dom", "score", "text")
    val out = operators.Sampling.takeUntilBudget(df, "dom", "id",
        scoreCol = col("score"), tokensCol = functions.Text.tokenCount(col("text")), budget = 10L)
      .select("id", "cum_tokens", "kept").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(
      1L -> ((5L, true)), 2L -> ((9L, true)), 3L -> ((9L, false)), 4L -> ((10L, true)),
      10L -> ((0L, false)), 11L -> ((3L, true))))
    // per-domain kept totals never exceed the budget, on any partitioning
    val re = operators.Sampling.takeUntilBudget(df.repartition(5), "dom", "id",
        scoreCol = col("score"), tokensCol = functions.Text.tokenCount(col("text")), budget = 10L)
      .select("id", "cum_tokens", "kept").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(re == out)
  }

  test("takeUntilBudget: reserved output names rejected, NULL scores sort last") {
    import spark.implicits._
    // a pre-existing column named like an output/scratch column would be
    // silently replaced or duplicated — the operator must refuse instead
    val clash = Seq((1L, "a", 5L)).toDF("id", "dom", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      operators.Sampling.takeUntilBudget(clash, "dom", "id",
        scoreCol = col("n_tokens"), tokensCol = col("n_tokens"), budget = 10L)
    }
    assert(e.getMessage.contains("n_tokens"))
    // NULL score = lowest priority, pinned explicitly (desc_nulls_last):
    // the null-scored doc is visited LAST, so with tight budget it loses
    val df = Seq(
      (1L, "a", Some(5L), 6L), (2L, "a", None, 6L), (3L, "a", Some(1L), 6L)
    ).toDF("id", "dom", "score", "toks")
    val out = operators.Sampling.takeUntilBudget(df, "dom", "id",
        scoreCol = col("score"), tokensCol = col("toks"), budget = 12L)
      .select("id", "kept").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // order: id 1 (score 5), id 3 (score 1), id 2 (NULL) — budget 12 admits
    // the first two 6-token docs; the null-scored one arrives over budget
    assert(out == Map(1L -> true, 3L -> true, 2L -> false))
  }

  test("blockDedup: keep-first per distinct block, reassembly, empty docs") {
    import spark.implicits._
    // blockWords=3: doc 1 = [A B C][D E F], doc 2 = [A B C][X Y Z], doc 3
    // repeats its own block, doc 4 is unique, doc 5 is empty after norm
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "p q r p q r"),
      (4L, "unique words only here now"),
      (5L, "   ")
    ).toDF("doc_id", "text")
    val out = Dedup.blockDedup(docs, "doc_id", "text", blockWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 2L, 2L, "a b c d e f")))      // first owner of [a b c]
    assert(out(1) == ((2L, 2L, 1L, "x y z")))            // [a b c] lost to doc 1
    assert(out(2) == ((3L, 2L, 1L, "p q r")))            // self-repeat collapses
    assert(out(3) == ((4L, 2L, 2L, "unique words only here now"))) // short tail kept
    assert(out(4) == ((5L, 0L, 0L, "")))                 // empty doc stays 1:1
    // no-duplicate corpus reconstructs exactly (normalized)
    val clean = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg")).toDF("doc_id", "text")
    val re = Dedup.blockDedup(clean, "doc_id", "text", blockWords = 2)
      .orderBy("doc_id").collect().map(_.getString(3))
    assert(re.toSeq == Seq("aa bb cc dd", "ee ff gg"))
  }

  test("contaminationSpans: overlap coverage not double-counted, short docs zero") {
    import spark.implicits._
    // benchmark holds "w1 w2 w3 w4 w5" → its two 4-gram windows; the corpus
    // doc embeds all 5 tokens at positions 2..6 of 10 → matched windows at
    // i=2,3 overlap on 3 positions; covered = 5, not 8
    val corpus = Seq(
      (1L, "x0 x1 w1 w2 w3 w4 w5 x7 x8 x9"),
      (2L, "totally clean text with other words entirely"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(corpus, bench, "doc_id", "text", gramWords = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out(0) == ((1L, 7L, 2L, 5L, 0.5)))
    assert(out(1) == ((2L, 4L, 0L, 0L, 0.0)))
    assert(out(2) == ((3L, 0L, 0L, 0L, 0.0))) // < gramWords tokens: no windows, still present
  }

  test("spanDedup: all-but-first at token granularity, self-repeats, uniques untouched") {
    import spark.implicits._
    // k=3; doc 1 owns [a b c d e] (3 windows); doc 2 embeds the same run →
    // every position of the run is covered by a duplicated non-winner
    // window; doc 3 repeats a span inside itself; doc 4 is clean
    val docs = Seq(
      (1L, "a b c d e x1 x2"),
      (2L, "y1 a b c d e y2"),
      (3L, "p q r z1 p q r"),
      (4L, "all unique tokens here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.spanDedup(docs, "doc_id", "text", spanWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 7L, 0L, "a b c d e x1 x2")))   // first occurrence untouched
    assert(out(1) == ((2L, 7L, 5L, "y1 y2")))             // embedded run removed whole
    assert(out(2) == ((3L, 7L, 3L, "p q r z1")))          // self-repeat: second copy out
    assert(out(3) == ((4L, 4L, 0L, "all unique tokens here")))
  }

  test("scrubContaminatedSpans: removes exactly the measured coverage, keeps clean text") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "x0 x1 w1 w2 w3 w4 w5 x7 x8 x9"), // 5 covered positions (q77 case)
      (2L, "totally clean text with other words entirely"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.scrubContaminatedSpans(
        corpus, bench, "doc_id", "text", gramWords = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // n_removed must equal contaminationSpans' covered_tokens on the same
    // inputs — the measure/scrub pair is one contract
    val covered = graft.operators.Dedup.contaminationSpans(
        corpus, bench, "doc_id", "text", gramWords = 4)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.map(t => t._1 -> t._3).toMap == covered)
    assert(out(0) == ((1L, 10L, 5L, "x0 x1 x7 x8 x9"))) // benchmark run cut, flanks kept
    assert(out(1)._4 == "totally clean text with other words entirely")
    assert(out(2) == ((3L, 2L, 0L, "too short")))
  }

  test("bigramScore: hand-computed add-1 micro-nat log-likelihoods") {
    import spark.implicits._
    // corpus: uni a:3 b:2 c:1 solo:1, V=4; bigrams d1:(a,b)x2,(b,a)x1  d2:(a,c)x1
    val docs = Seq((1L, "a b A b"), (2L, "a c"), (3L, "solo")).toDF("doc_id", "text")
    val out = graft.operators.LmScore.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (a,b): ln((2+1)/(3+4)) = ln(3/7) -> -847298 (round half-away)
    // (b,a): ln((1+1)/(2+4)) = ln(1/3) -> -1098612
    // (a,c): ln((1+1)/(3+4)) = ln(2/7) -> -1252763
    assert(out(0) == ((1L, 3L, 2L * -847298L + -1098612L)))
    assert(out(1) == ((2L, 1L, -1252763L)))
    assert(out(2) == ((3L, 0L, 0L))) // <2 tokens: no bigrams, score 0
  }

  test("LM lifecycle: scoreWith through persisted tables; OOV falls out of add-1") {
    import spark.implicits._
    // train corpus = bigramScore's hand case: uni a:3 b:2 c:1 solo:1, V=4
    val train = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo")).toDF("doc_id", "text")
    graft.operators.LmScore.writeModel(train, "doc_id", "text", "graft_test_lm", buckets = 2)
    val batch = Seq(
      (10L, "a b"),   // seen transition: ln((2+1)/(3+4)) -> -847298
      (11L, "a zzz"), // seen head, unseen tail: ln((0+1)/(3+4)) = ln(1/7) -> -1945910
      (12L, "qq rr"), // fully OOV: ln(1/(0+4)) = ln(.25) -> -1386294
      (13L, "tiny")   // <2 tokens: zero row
    ).toDF("doc_id", "text")
    val out = graft.operators.LmScore.scoreWith(batch, "doc_id", "text", "graft_test_lm")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 1L, -847298L), (11L, 1L, -1945910L),
      (12L, 1L, -1386294L), (13L, 0L, 0L)))
  }

  test("zOrderKey: hand-computed Morton interleave, bit i of col k at i*d+k") {
    import spark.implicits._
    val out = Seq((3L, 1L), (5L, 9L), (0L, 0L), (255L, 255L))
      .toDF("x", "y")
      .select(graft.sources.Layout.zOrderKey(21, col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // (3,1): x bits 0,1 -> z0,z2 = 5; y bit 0 -> z1 = 2          => 7
    // (5,9): x bits 0,2 -> z0,z4 = 17; y bits 0,3 -> z1,z7 = 130 => 147
    // (255,255): all 16 low bits set                             => 65535
    assert(out.toSeq == Seq(7L, 147L, 0L, 65535L))
  }

  test("globalRank: exact permutation, bucket-width invariant, negative values") {
    import spark.implicits._
    val rows = Seq((1L, -17L), (2L, 5L), (3L, -17L), (4L, 0L), (5L, 42L),
      (6L, -3L), (7L, 5L)).toDF("id", "v")
    // expected: sort by (v, id): (-17,1) (-17,3) (-3,6) (0,4) (5,2) (5,7) (42,5)
    val expected = Map(1L -> 1L, 3L -> 2L, 6L -> 3L, 4L -> 4L, 2L -> 5L, 7L -> 6L, 5L -> 7L)
    for (w <- Seq(3L, 10L, 1000L)) { // widths spanning many/few/one bucket
      val got = graft.operators.Ranking.globalRank(rows, "v", w, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"bucketWidth=$w")
    }
    val reparted = graft.operators.Ranking.globalRank(rows.repartition(7), "v", 3L, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(reparted == expected)
  }

  test("stratifiedQuota: exact total, within-1-of-proportional, deterministic fill") {
    import spark.implicits._
    // strata sizes 6/3/1, total 5 → exact shares 3.0/1.5/0.5; base 3/1/0,
    // leftover 1 goes to the largest remainder ('b' at .5 vs 'c' at .5 —
    // stratum ascending breaks the tie toward 'b')
    val df = (1L to 10L).map(i =>
        (i, if (i <= 6) "a" else if (i <= 9) "b" else "c"))
      .toDF("id", "s")
    val out = graft.operators.Sampling.stratifiedQuota(df, "s", "id", total = 5L)
      .collect().map(r => (r.getLong(1), r.getString(0), r.getLong(2), r.getBoolean(3)))
    val quotas = out.map(t => t._2 -> t._3).toMap
    assert(quotas == Map("a" -> 3L, "b" -> 2L, "c" -> 0L))
    assert(out.count(_._4) == 5)
    // kept set = top-quota per stratum in md5(id) order — replay it
    val byMd5 = out.groupBy(_._2).toSeq.flatMap { case (s, rows) =>
      rows.sortBy(t => (java.security.MessageDigest.getInstance("MD5")
          .digest(t._1.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString, t._1))
        .take(quotas(s).toInt).map(_._1).toSeq
    }.toSet
    assert(out.filter(_._4).map(_._1).toSet == byMd5)
    // reserved names rejected
    val clash = Seq((1L, "a", true)).toDF("id", "s", "kept")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sampling.stratifiedQuota(clash, "s", "id", 1L)
    }
    assert(e.getMessage.contains("kept"))
  }

  test("funnel: strict ordering, inclusive conversion window, per-step counts") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val events = Seq(
      // u1 completes everything comfortably
      (1L, t(1000), "signup"), (1L, t(2000), "click"), (1L, t(3000), "purchase"),
      // u2's click precedes signup → stalls at step 1
      (2L, t(1000), "click"), (2L, t(2000), "signup"), (2L, t(2500), "purchase"),
      // u3's click is outside the 3000 ms window → step 1 only
      (3L, t(1000), "signup"), (3L, t(5000), "click"),
      // u4 never signs up → not even step 1
      (4L, t(1000), "click"), (4L, t(2000), "purchase"),
      // u5's purchase misses the window from their click → step 2
      (5L, t(1000), "signup"), (5L, t(2000), "click"), (5L, t(6000), "purchase"),
      // u6's purchase lands EXACTLY at click+3000 → inclusive, completes
      (6L, t(0), "signup"), (6L, t(1000), "click"), (6L, t(4000), "purchase"),
      // u7's click shares the signup timestamp → strict >, step 1 only
      (7L, t(1000), "signup"), (7L, t(1000), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.operators.Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"), withinMs = Some(3000L))
      .orderBy("step").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "signup", 6L), (2L, "click", 3L), (3L, "purchase", 2L)))
  }

  test("cohortRetention: first-event bucket is the cohort, offsets count distinct actives") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val events = Seq(
      (1L, t(10)), (1L, t(120)), (1L, t(350)),   // cohort 0; active buckets 0,1,3
      (3L, t(30)), (3L, t(140)),                  // cohort 0; active 0,1
      (2L, t(250)), (2L, t(260)), (2L, t(430))    // cohort 2; active 2,2,4 → offsets 0,0,2
    ).toDF("user_id", "ts")
    val out = graft.operators.Retention.cohortRetention(events, "user_id", "ts", bucketMs = 100L)
      .orderBy("cohort_bucket", "bucket_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 2L), (0L, 3L, 1L), (2L, 0L, 1L), (2L, 2L, 1L)))
  }

  test("bm25: scores match the formula exactly (quantize-once micro-nats)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana cherry cherry banana")
    ).toDF("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS graft_opspec_bm25")
    spark.sql("DROP TABLE IF EXISTS graft_opspec_bm25_meta")
    try {
      graft.operators.InvertedIndex.writeIndex(docs, "doc_id", "text", "graft_opspec_bm25", buckets = 2)
      val got = graft.operators.InvertedIndex.bm25(spark, "graft_opspec_bm25", Seq("apple", "cherry"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // n_docs=3, sum_dl=9, avgdl=3; df(apple)=df(cherry)=2
      val (k1, b) = (1.2, 0.75)
      def s(tf: Long, dl: Long, df: Long): Long = {
        val idf = math.log(1.0 + (3.0 - df.toDouble + 0.5) / (df.toDouble + 0.5))
        val x = idf * (tf.toDouble * (k1 + 1.0)) /
          (tf.toDouble + k1 * ((1.0 - b) + b * dl.toDouble / 3.0)) * 1e6
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      val expected = Map(
        1L -> (1L, s(2, 3, 2)),               // apple tf=2
        2L -> (2L, s(1, 2, 2) + s(1, 2, 2)),  // apple + cherry, tf=1 each
        3L -> (1L, s(2, 4, 2)))               // cherry tf=2
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_opspec_bm25")
      spark.sql("DROP TABLE IF EXISTS graft_opspec_bm25_meta")
    }
  }

  test("selfDedup: first in-doc occurrence survives, tail segment distinct, empty doc intact") {
    import spark.implicits._
    val docs = Seq(
      // segs (2 words): "a b" | "c d" | "a b" | "e"  → third is a repeat
      (1L, "a b c d a b e"),
      // no repeats — identity
      (2L, "x y z"),
      // whitespace-only → zero segments, empty text
      (3L, "   "),
      // repeated SHORT tail never matches the full segment "a b", only
      // an equal-length tail would — here it survives
      (4L, "a b a")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.selfDedup(docs, "doc_id", "text", segWords = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, "a b c d e"),
      (2L, 2L, 0L, "x y z"),
      (3L, 0L, 0L, ""),
      (4L, 2L, 0L, "a b a")))
  }

  test("selfDedup plan: zero exchanges — pure scan-stage expression work") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.selfDedup(docs, "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"),
      s"intra-doc dedup must not shuffle:\n$plan")
  }

  test("triangleCount: counts exact triangles; dupes/reversals/self-loops canonicalized") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant 5-1 + noise: duplicate,
    // reversed, and self-loop edges
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L),
      (2L, 1L), (1L, 2L), (3L, 3L)
    ).toDF("src", "dst")
    val out = graft.operators.Graph.triangleCount(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((5L, 7L, 4L)))
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val out = graft.operators.Graph.triangleCount(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((4L, 4L, 0L)))
  }

  test("blockedFuzzyPairs: distance boundary inclusive, cross-block pairs never compared") {
    import spark.implicits._
    val df = Seq(
      (1L, "red widget"),  // lev(red, hot) = 3 → kept at maxDist 3
      (2L, "hot widget"),
      (3L, "crimson widget"), // lev vs "red widget" = 5 → dropped
      (4L, "red gadget"),  // other block: near "red widget" but never compared
      (5L, "red widget")   // exact duplicate name, distance 0
    ).toDF("p_partkey", "p_name")
    val out = graft.operators.Linkage.blockedFuzzyPairs(
        df, "p_partkey", "p_name",
        blockKey = org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("p_name"), " "), -1),
        maxDist = 3)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 3L), (1L, 5L, 0L), (2L, 5L, 3L)))
  }

  test("weightedSample: keys match the Efraimidis-Spirakis formula on the engine's own md5") {
    import spark.implicits._
    val rows = Seq((1L, 100L), (2L, 400L), (3L, 50L), (4L, 0L), (5L, -7L))
    val df = rows.toDF("doc_id", "w")
    val got = graft.operators.Sampling.weightedSample(df, "doc_id", "w", k = 10, seed = "s")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // driver-side recomputation: same md5 60-bit u, same double math
    def key(id: Long, w: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h.toDouble + 1.0) / 1152921504606846976.0
      BigDecimal(-math.log(u) / w.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = rows.filter(_._2 > 0).map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (k, id) }
    assert(got.toSeq == expected, "w <= 0 rows must be excluded; keys exact")
  }

  test("containmentPairs: quote inclusion scores ~1.0 overlap where jaccard stays tiny") {
    import spark.implicits._
    // doc 2 is a verbatim 6-token excerpt of the 24-token doc 1: every
    // trigram of doc 2 appears in doc 1 → containment_b = overlap = 1.0,
    // while jaccard = 4/22 ≈ 0.18 would never trip a sane threshold
    val big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      (1L, big),
      (2L, "lambda mu nu xi omicron pi"),
      (3L, "one two three four five six")  // disjoint — no pair
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.containmentPairs(docs, "doc_id", "text",
        shingleLen = 3, threshold = 0.8, maxShingleDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq == Seq((1L, 2L, 22L, 4L, 4.0 / 22.0, 1.0, 1.0)))
    // the dedup ACTION: the excerpt (smaller side) is dropped, the
    // article and the unrelated doc survive
    val kept = graft.operators.Dedup.containmentDedup(docs, "doc_id", "text",
        shingleLen = 3, threshold = 0.8, maxShingleDf = 50)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L))
    // the same pair at the same shingle length is INVISIBLE to jaccard 0.5
    val jac = graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text",
      shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
    assert(jac.count() == 0)
  }

  test("weightedSamplePerGroup: k per stratum, same keys as the global sampler, partitioned window") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (s"g${i % 3}", i, i % 50 + 1))
      .toDF("grp", "doc_id", "w")
    // buckets = 1 is the explicit naive single-window reference; the
    // default is the de-skewed path, asserted output-identical below
    val out = graft.operators.Sampling.weightedSamplePerGroup(
      df, "grp", "doc_id", "w", k = 7, seed = "s", buckets = 1)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // exactly k per group (every group has >= k rows here), ranks 1..k
    assert(rows.groupBy(_._1).forall { case (_, rs) =>
      rs.length == 7 && rs.map(_._4).sorted.toSeq == (1L to 7L) })
    // the per-group winners are the global ES order restricted to the
    // group: same seed -> same key for the same id as weightedSample
    val globalKeys = graft.operators.Sampling.weightedSample(
        df, "doc_id", "w", k = 300, seed = "s")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    rows.foreach { case (_, id, key, _) => assert(globalKeys(id) == key) }
    val expected = df.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, ids) =>
        g -> ids.map(_._2).sortBy(id => (globalKeys(id), id)).take(7).toSeq }
    assert(rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy(_._4).map(_._2).toSeq } == expected)
    // plan: the ranking window is partitioned by the stratum
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange SinglePartition"),
      s"per-group ranking must not collapse to one partition:\n$plan")
    // the exact two-level de-skew (bucketed pre-thin -> re-rank) must be
    // OUTPUT-IDENTICAL to the single window, rank column included, for
    // every bucket count — k rows never straddle a dropped bucket tail
    Seq(2, 8, 64).foreach { b =>
      val deskewed = graft.operators.Sampling.weightedSamplePerGroup(
          df, "grp", "doc_id", "w", k = 7, seed = "s", buckets = b)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._4))
      assert(deskewed.toSeq == rows.sortBy(t => (t._1, t._4)).toSeq,
        s"buckets=$b diverged from the single-window sample")
    }
  }

  test("weightedSample: top-k is a TakeOrdered, not a global sort") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 97 + 1)).toDF("doc_id", "w")
    val out = graft.operators.Sampling.weightedSample(df, "doc_id", "w", k = 5)
    assert(out.collect().length == 5)
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"k-row sample must plan as per-partition heaps + driver merge:\n$plan")
  }

  test("groupedQuantiles: type-1 rank selection per group, no single-partition window") {
    import spark.implicits._
    import graft.operators.Ranking
    val rows = ((1L to 10L).map(v => ("a", v, v)) :+ (("b", 42L, 99L)))
      .toDF("g", "v", "id")
    val q = Ranking.groupedQuantiles(rows, "g", "v",
      subBucket = expr("(v - pmod(v, 4L)) DIV 4L"), idCol = "id",
      ps = Seq(0.25, 0.5, 1.0))
    val got = q.collect().map(r => ((r.getString(0), r.getDouble(1)), r.getLong(2))).toMap
    // ceil(p·10): 3, 5, 10 — actual elements, no interpolation
    assert(got(("a", 0.25)) == 3L && got(("a", 0.5)) == 5L && got(("a", 1.0)) == 10L)
    // singleton group: every quantile IS the one element
    assert(got(("b", 0.25)) == 42L && got(("b", 1.0)) == 42L)
    assert(!q.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "grouped quantiles must not serialize through one window task")
  }

  test("globalRankBy three-level: identical permutation, only #supers rows pay a global window") {
    import spark.implicits._
    import graft.operators.Ranking
    val rows = (1L to 5000L).map(i => ((i * 2654435761L) % 100000, i)).toDF("v", "id")
    val bucket = expr("(v - pmod(v, 500L)) DIV 500L") // 200 buckets
    val two = Ranking.globalRankBy(rows, bucket, col("v"), col("id"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // third level (supers of 16 buckets): the plan changes, the permutation
    // must not — byte-for-byte equal ranks
    val three = Ranking.globalRankBy(rows, bucket, Some(16L), col("v"), col("id"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(three.sameElements(two))
    // degenerate widths collapse gracefully: w=1 (one bucket per super)
    val w1 = Ranking.globalRankBy(rows, bucket, Some(1L), col("v"), col("id"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(w1.sameElements(two))
  }

  test("globalRankBy: string-keyed rank is the exact global sort order, repartition-stable") {
    import spark.implicits._
    val df = Seq(("delta", 1L), ("alpha", 2L), ("alpha", 3L), ("charlie", 4L),
      ("bravo", 5L)).toDF("name", "id")
    def rankIt(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Ranking.globalRankBy(d,
          substring(col("name"), 1, 1), col("name"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = rankIt(df).sortBy(_._3)
    // ties on the key fall back to the id tiebreak; ranks are 1..n
    assert(got.map(x => (x._1, x._2)).toSeq ==
      Seq(("alpha", 2L), ("alpha", 3L), ("bravo", 5L), ("charlie", 4L), ("delta", 1L)))
    assert(got.map(_._3).toSeq == (1L to 5L))
    assert(rankIt(df.repartition(7)).sortBy(_._3).toSeq == got.toSeq)
  }

  test("sortedNeighborhoodPairs: exact window semantics per pass, union across passes") {
    import spark.implicits._
    val names = Seq("apple pie", "apple pif", "banana split", "candle wax",
      "dapple pie", "maple pie", "pple pie", "zzz end")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong + 1, n) }
      .toDF("id", "name")
    val window = 3
    // maxDist large enough that every candidate survives the distance
    // filter — this test pins the WINDOWING; the banded distance itself is
    // oracle-checked (q95/q102)
    val out = graft.operators.Linkage.sortedNeighborhoodPairs(df, "id", "name",
      passes = Seq(
        (col("name"), substring(col("name"), 1, 1)),
        (reverse(col("name")), substring(reverse(col("name")), 1, 1))),
      window = window, maxDist = 30)
    def passPairs(key: String => String): Set[(Long, Long)] = {
      val sorted = names.zipWithIndex.map { case (n, i) => (i.toLong + 1, n) }
        .sortBy { case (id, n) => (key(n), id) }
      (for {
        i <- sorted.indices
        j <- (i + 1) until math.min(i + window, sorted.length)
      } yield (math.min(sorted(i)._1, sorted(j)._1),
        math.max(sorted(i)._1, sorted(j)._1))).toSet
    }
    val expect = passPairs(identity) ++ passPairs(_.reverse)
    val gotPairs = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotPairs.toSet == expect)
    // exactly-once emission feeds the distinct: no pair may survive twice
    assert(gotPairs.length == gotPairs.toSet.size)
    // distributed: every window over DATA rows partitions by the prefix
    // bucket (q84's contract — the only unpartitioned frame is the
    // #buckets offset table)
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val dataWindows = plan.linesIterator
      .filter(_.contains("row_number"))
      .filter(_.contains("Window")).toSeq
    assert(dataWindows.nonEmpty, s"expected ranking windows:\n$plan")
    assert(dataWindows.forall(_.contains("_bkt")),
      s"ranking windows must be bucket-partitioned:\n${dataWindows.mkString("\n")}")
  }

  test("adaptiveNeighborhoodPairs: runs span dense stretches a fixed window misses, breaks isolate") {
    import spark.implicits._
    // six near-identical names (a duplicate-dense run), plus two unrelated
    // records that sort before and after it
    val rows = Seq(
      (1L, "team aaaa 01"), (2L, "team aaaa 02"), (3L, "team aaaa 03"),
      (4L, "team aaaa 04"), (5L, "team aaaa 05"), (6L, "team aaaa 06"),
      (7L, "zzz unrelated"), (8L, "qqq other"))
    val df = rows.toDF("id", "name")
    // maxDist is permissive so only the RUN structure decides candidacy
    val adaptive = graft.operators.Linkage.adaptiveNeighborhoodPairs(
        df, "id", "name", sortKey = col("name"),
        bucketKey = substring(col("name"), 1, 1),
        boundaryDist = 2, maxRun = 6, maxDist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the whole dense run pairs: C(6,2) = 15, exactly once each
    assert(adaptive.length == 15 && adaptive.toSet.size == 15)
    assert(adaptive.toSet == (for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b)).toSet)
    // the run's ends pair — a fixed window 3 cannot see 5 positions apart
    assert(adaptive.contains((1L, 6L)))
    val fixed = graft.operators.Linkage.sortedNeighborhoodPairs(
        df, "id", "name",
        passes = Seq((col("name"), substring(col("name"), 1, 1))),
        window = 3, maxDist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!fixed.contains((1L, 6L)))
    // rank-adjacent but dissimilar records break the run and never pair —
    // the fixed window DOES waste comparisons on them
    assert(!adaptive.toSet.exists(p => p._1 > 6L || p._2 > 6L))
    assert(fixed.exists(p => p._2 == 8L || p._1 == 7L || p._2 == 7L))
  }

  test("pruneHighDfTokens: inclusive threshold, order preserved, all-boilerplate doc survives") {
    import spark.implicits._
    val docs = Seq((1L, "x y z x"), (2L, "y x"), (3L, "x y"), (4L, "x"), (5L, ""))
      .toDF("doc_id", "text")
    // df: x=4/5, y=3/5, z=1/5; threshold 80/100 — x sits EXACTLY on the
    // boundary (4*100 == 5*80) and must be pruned (>= is inclusive)
    val vocab = graft.operators.Boilerplate.highDfTokens(docs, "doc_id", "text", 80, 100)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(vocab.toSeq == Seq(("x", 4L)))
    val out = graft.operators.Boilerplate.pruneHighDfTokens(docs, "doc_id", "text", 80, 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "y z", 2L, 2L),   // order preserved, both x occurrences dropped
      (2L, "y", 1L, 1L),
      (3L, "y", 1L, 1L),
      (4L, "", 0L, 1L),      // every token was boilerplate: row survives
      (5L, "", 0L, 0L)))     // empty doc: nothing to drop
  }

  test("gopherFilter: inclusive boundaries, empty doc fails r_wlen, stopword hits are distinct") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb cc"), (2L, ""), (3L, "the the the aaa bbbb"))
      .toDF("doc_id", "text")
    val out = graft.operators.QualityRules.gopherFilter(docs, "doc_id", "text",
        minTokens = 3, maxTokens = 3, minMeanLen = 2.0, maxMeanLen = 3.0,
        repN = 2, maxRepetition = 0.5, stopwords = Seq("the", "a"), minStopHits = 1)
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9)),
        r.getLong(4)))
      .sortBy(_._1)
    // doc1: n_tok=3 (inclusive), mean=2.0 (inclusive lower bound), rep 0,
    // no stopwords -> keep false only via r_stop
    assert(out(0)._2 == ((true, true, true, false, false)))
    // doc2: empty -> r_len false AND r_wlen false (NULL mean), rep 0.0 passes
    assert(out(1)._2 == ((false, false, true, false, false)))
    // doc3: 'the' occurs 3 times but counts ONCE
    assert(out(2)._3 == 1L)
    assert(out(2)._2._4 == true)
  }

  test("kCore: unique fixpoint on a hand graph, canonicalization, empty core, loud non-convergence") {
    import spark.implicits._
    // K4 on {1,2,3,4} + pendant path 4-5-6; dupes/reversals/self-loops mixed in
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (2L, 1L), (5L, 5L), (6L, 5L)).toDF("src", "dst")
    val core3 = graft.operators.Graph.kCore(edges, "src", "dst", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(core3.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    assert(graft.operators.Graph.kCore(edges, "src", "dst", k = 4).count() == 0)
    // k=2 needs two peel rounds (6 first, then 5) + the confirming round;
    // a 2-round budget must fail LOUDLY, not return a partial answer
    val e = intercept[IllegalArgumentException] {
      graft.operators.Graph.kCore(edges, "src", "dst", k = 2, maxRounds = 2)
    }
    assert(e.getMessage.contains("fixpoint"))
    val core2 = graft.operators.Graph.kCore(edges, "src", "dst", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(core2.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("globalQuantiles: rank-selected elements match the sorted list, bucket-partitioned windows") {
    import spark.implicits._
    val df = scala.util.Random.shuffle((1L to 100L).toList)
      .map(v => (v, v + 1000L)).toDF("v", "id")
    val out = graft.operators.Ranking.globalQuantiles(
      df, "v", expr("v DIV 10"), "id", Seq(0.01, 0.5, 0.75, 1.0))
    val got = out.collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    // type-1: the element at rank ceil(p*100)
    assert(got.toSeq == Seq((0.01, 1L), (0.5, 50L), (0.75, 75L), (1.0, 100L)))
    // the ranking rides globalRankBy: data windows partition by bucket
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val dataWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(dataWindows.nonEmpty && dataWindows.forall(_.contains("_bkt")),
      s"ranking windows must be bucket-partitioned:\n${dataWindows.mkString("\n")}")
  }

  test("groupedRank: exact within-group ranks, zero single-partition exchanges") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (s"g${i % 3}", i)).toDF("grp", "id")
    // sub-bucket = range of the sort key (monotone within every group)
    val out = graft.operators.Ranking.groupedRank(df, col("grp"),
      expr("id DIV 25"), col("id"))
    val got = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = (1L to 200L).groupBy(i => s"g${i % 3}")
      .flatMap { case (g, ids) =>
        ids.toSeq.sorted.zipWithIndex.map { case (id, i) => (g, id, i + 1L) } }
      .toSet
    assert(got.toSet == expected)
    // unlike globalRankBy, even the offset frame partitions by group:
    // NOTHING in the plan may collapse to one partition
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange SinglePartition"),
      s"groupedRank must have no single-partition exchange:\n$plan")
  }

  test("lengthBucketBatches: homogeneous full batches with one short tail per bucket, deterministic") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val out = graft.operators.Batching.lengthBucketBatches(
      docs, "doc_id", "text", bucketWidth = 16, batchSize = 8)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // bucket is derived from n_tok; batches hold <= batchSize members at
    // contiguous positions; only a bucket's LAST batch may be short
    rows.foreach { case (_, nTok, bucket, _, _) => assert(nTok / 16 == bucket) }
    val byBatch = rows.groupBy(r => (r._3, r._4))
    byBatch.foreach { case ((_, _), rs) =>
      assert(rs.length <= 8)
      assert(rs.map(_._5).sorted.toSeq == (0L until rs.length.toLong))
    }
    byBatch.groupBy(_._1._1).foreach { case (bucket, batches) =>
      val short = batches.filter(_._2.length < 8)
      assert(short.size <= 1, s"bucket $bucket has ${short.size} short batches")
      // the short one is the tail (max batch_idx)
      short.keys.foreach { case (_, bi) =>
        assert(bi == batches.keys.map(_._2).max) }
    }
    // content-keyed order: a rerun reproduces the assignment exactly
    val again = graft.operators.Batching.lengthBucketBatches(
        docs, "doc_id", "text", bucketWidth = 16, batchSize = 8)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSet == rows.toSet)
  }

  test("shingleNovelty: corpus-unique vs shared shingles on a hand corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    // 3-shingles: doc1 {abc, bcd}, doc2 {abc, bce}, doc3 {xyz, yzw};
    // "a b c" is shared (df 2), everything else unique
    val out = graft.operators.Boilerplate.shingleNovelty(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 2L, 2L, 1.0)))
  }

  test("labelPropagation: bridged triangles stay separate communities, no oscillation, no window") {
    import spark.implicits._
    // two triangles joined by ONE weak bridge (3-4): connected components
    // would merge everything to label 1; LPA keeps two communities
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("src", "dst")
    val out = graft.operators.Graph.labelPropagation(edges, "src", "dst", rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)))
    // the self-vote damps the bipartite oscillation: a single edge is
    // stable at the smaller label under an EVEN and an ODD round count
    val pair = Seq((1L, 2L)).toDF("src", "dst")
    for (r <- Seq(3, 4)) {
      val got = graft.operators.Graph.labelPropagation(pair, "src", "dst", rounds = r)
        .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
      assert(got == Set((1L, 1L), (2L, 1L)), s"rounds=$r gave $got")
    }
    // WEIGHTED votes: the same bridged triangles, but the bridge carries
    // weight 10 — the heavy tie binds {3,4} into their own community
    // (stronger than either node's triangle), fragmenting both triangles
    // to their remaining members: weights change the partition, the rule
    // stays deterministic and STABLE (the max-incident self-vote stops
    // the heavy pair from swapping labels forever)
    val wEdges = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (4L, 5L, 1L),
      (4L, 6L, 1L), (5L, 6L, 1L), (3L, 4L, 10L)).toDF("src", "dst", "w")
    def wRun(rounds: Int): Seq[Long] = graft.operators.Graph.labelPropagation(
        wEdges, "src", "dst", rounds = rounds, weightCol = Some("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2).toSeq
    assert(wRun(4) == Seq(1L, 1L, 3L, 3L, 4L, 4L), s"got ${wRun(4)}")
    // stability under odd AND even round counts — no period-2 flip
    assert(wRun(3) == wRun(4))
    // duplicate UNWEIGHTED edges still dedup (a repeat must not
    // double-vote): same result as the clean edge list
    val dupEdges = edges.unionAll(edges)
    val dupOut = graft.operators.Graph.labelPropagation(dupEdges, "src", "dst", rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(dupOut.toSeq == out.toSeq)
    // plan: the argmax is a partial-aggregable max_by, never a per-node
    // sort/window
    val lp = graft.operators.Graph.labelPropagation(edges, "src", "dst",
      rounds = 2, checkpoint = false)
    lp.collect()
    val plan = lp.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.toLowerCase.contains("partial_max_by"),
      s"label argmax must partial-aggregate:\n$plan")
    assert(!plan.contains("WindowExec"),
      s"label argmax must not sort votes through a window:\n$plan")
  }

  test("hourlyRateAnomalies: planted burst flags, cold start never alarms, gaps use value ranges") {
    import spark.implicits._
    def at(hour: Long, i: Long): Long = hour * 3600000000L + i * 1000L
    val rows =
      // user 1: steady 2/hour for hours 0..9, then a 12-event burst at 10
      (for (h <- 0L to 9L; i <- 0L until 2L) yield (1L, at(h, i))) ++
        (0L until 12L).map(i => (1L, at(10L, i))) ++
        // user 2: 7 quiet hours, then a 50-event burst AFTER a >24h gap —
        // the value-range frame sees zero prior buckets, so no alarm
        (0L to 6L).map(h => (2L, at(h, 0L))) ++
        (0L until 50L).map(i => (2L, at(40L, i)))
    val ev = rows.toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = graft.operators.Anomaly.hourlyRateAnomalies(
        ev, "user_id", "ts", sigmas = 3.0, window = 24, minPrior = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(6)))).toMap
    // cold start: hours 0..5 have < 6 prior buckets — never flagged
    for (h <- 0L to 5L) assert(!out((1L, h))._3, s"hour $h must not alarm cold")
    // steady state: cnt == mu, sigma == 0, strict > does not fire
    for (h <- 6L to 9L) assert(!out((1L, h))._3, s"steady hour $h must not alarm")
    // the burst fires: 12 > mu 2 + 3*sigma 0
    assert(out((1L, 10L)) == ((12L, 10L, true)))
    // user 2's burst is outside any prior window: n_prior 0, no alarm
    assert(out((2L, 40L)) == ((50L, 0L, false)))
  }

  test("Checks.validate: per-check null semantics pinned, exact violation counts") {
    import spark.implicits._
    import graft.operators.Checks._
    val df = Seq(
      (Some(1L), Some(1L), Some(10.0)),
      (Some(1L), Some(1L), Some(20.0)),   // duplicate key (1,1)
      (Some(1L), Some(1L), Some(200.0)),  // triple copy + range violation
      (Some(2L), None, None),             // null key part; null value
      (Some(2L), None, Some(5.0)),        // (2, null) duplicated: nulls EQUAL in unique
      (None, Some(3L), Some(30.0)))       // null FK column: passes FK
      .toDF("k1", "k2", "v")
    val dim = Seq(1L, 2L).toDF("dk")     // k1=2 rows pass, any other non-null violates
    val out = validate(df, Seq(
        NotNull("k1"), NotNull("v"),
        Unique(Seq("k1", "k2")),
        InRange("v", 0.0, 100.0),
        ForeignKey("k1", dim, "dk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null(k1)") == ((6L, 1L, false)))
    assert(out("not_null(v)") == ((6L, 1L, false)))
    // groups: (1,1)x3 -> 2 surplus; (2,null)x2 -> 1 surplus; (null,3)x1
    assert(out("unique(k1,k2)") == ((6L, 3L, false)))
    // NULL violates a range assertion; 200.0 is out of range
    assert(out("in_range(v,0.0,100.0)") == ((6L, 2L, false)))
    // NULL passes FK; every non-null k1 value exists in the dim
    assert(out("foreign_key(k1->dk)") == ((6L, 0L, true)))
  }

  test("embeddingDedup: smallest id of each near-dup neighborhood survives") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(1f, 0f)),
      (4L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val kept = Similarity.embeddingDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, planes = 4, dim = 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    // 1,2,3 identical -> pairs (1,2),(1,3),(2,3) -> victims {2,3}; the
    // orthogonal 4 is untouched (different side of at least one plane or
    // cosine 0 < threshold either way)
    assert(kept == Seq(1L, 4L))
  }

  test("coreNumbers: h-index iteration converges to core numbers; canonicalization; histogram frames") {
    import spark.implicits._
    // K4 on {1,2,3,4} + pendant path 4-5-6; dupes/reversals/self-loops mixed in
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (2L, 1L), (5L, 5L), (6L, 5L)).toDF("src", "dst")
    val out = graft.operators.Graph.coreNumbers(edges, "src", "dst", rounds = 6)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // K4 members embed at depth 3; the pendant path is 1-core only
    assert(got.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 1L), (6L, 1L)))
    // converged: one more round changes nothing (fixpoint = core numbers)
    val more = graft.operators.Graph.coreNumbers(edges, "src", "dst", rounds = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(more.toSeq == got.toSeq)
    // the H-index is computed from the per-node value HISTOGRAM: the
    // per-edge rows collapse through a partial-aggregable groupBy before
    // any window, so the plan carries a partial_count for it and never a
    // single-partition sort (checkpoint=false — localCheckpoint would
    // truncate the visible plan to a Scan ExistingRDD)
    val unCut = graft.operators.Graph.coreNumbers(edges, "src", "dst",
      rounds = 2, checkpoint = false)
    val plan = unCut.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("SinglePartition"), s"unexpected SinglePartition:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"histogram counts must partial-aggregate map-side:\n$plan")
  }

  test("coreNumbers agrees with kCore on every k-slice of a deterministic graph") {
    import spark.implicits._
    // pseudo-random but deterministic: two out-edges per node over 40 nodes
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 40), (i, (i * 13 + 5) % 40))).toDF("src", "dst")
    val cn = graft.operators.Graph.coreNumbers(edges, "src", "dst", rounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stable = graft.operators.Graph.coreNumbers(edges, "src", "dst", rounds = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cn == stable, "h-index iteration must have converged at 12 rounds")
    val maxCore = cn.values.max
    (1L to maxCore).foreach { k =>
      val slice = graft.operators.Graph.kCore(edges, "src", "dst", k = k.toInt)
        .collect().map(_.getLong(0)).toSet
      assert(cn.filter(_._2 >= k).keySet == slice,
        s"core>=$k slice disagrees with kCore($k)")
    }
  }

  test("equiDepthBins: bin-for-bin parity with ntile, bucket-partitioned windows") {
    import spark.implicits._
    val df = scala.util.Random.shuffle((1L to 103L).toList)
      .map(v => (v * 3 % 97, v)).toDF("v", "id") // duplicate values, unique ids
    val out = graft.operators.Ranking.equiDepthBins(
      df, expr("v DIV 10"), 5, col("v"), col("id"))
    // oracle twin inside Spark: the SQL-standard ntile over the same order
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))
    val expected = df.withColumn("bin_exp", ntile(5).over(w).cast("long"))
    val joined = out.join(expected, Seq("v", "id"))
    assert(joined.where(col("bin") =!= col("bin_exp")).count() == 0)
    // 103 rows into 5 bins: 21,21,21,20,20 — larger bins first
    val sizes = out.groupBy("bin").count().orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sizes == Seq((1L, 21L), (2L, 21L), (3L, 21L), (4L, 20L), (5L, 20L)))
    // more bins than rows: every row its own bin, bins 1..N
    val tiny = Seq((5L, 1L), (3L, 2L), (9L, 3L)).toDF("v", "id")
    val tb = graft.operators.Ranking.equiDepthBins(
        tiny, expr("v"), 10, col("v"), col("id"))
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("bin"))).sortBy(_._2)
    assert(tb.toSeq == Seq((3L, 1L), (5L, 2L), (9L, 3L)))
    // the ranking window partitions by bucket (no global sort anywhere)
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val dataWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(dataWindows.nonEmpty && dataWindows.forall(_.contains("_bkt")),
      s"ranking windows must be bucket-partitioned:\n${dataWindows.mkString("\n")}")
  }

  test("leakageSafeSplit: near-dup twins share a split; singletons hash as assignSplit would") {
    import spark.implicits._
    val twin = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, twin),
      (2L, twin + " extra"), // near-dup of 1 at 3-shingle jaccard
      (3L, "completely different text about spark partitions and shuffles"),
      (4L, "yet another unrelated document mentioning parquet and arrow")
    ).toDF("doc_id", "text")
    val out = graft.operators.Sampling.leakageSafeSplit(
        docs, "doc_id", "text", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        shingleLen = 3, threshold = 0.3, maxShingleDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    // 1 and 2 cluster together -> same representative -> same split
    assert(byId(1L)._2 == byId(2L)._2 && byId(1L)._3 == byId(2L)._3)
    // singletons: representative = own id, split = plain assignSplit
    val solo = graft.operators.Sampling.assignSplit(
        docs.where(col("doc_id") >= 3L).select(col("doc_id")), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(3L)._2 == 3L && byId(3L)._3 == solo(3L))
    assert(byId(4L)._2 == 4L && byId(4L)._3 == solo(4L))
  }

  test("updateDfStats: incremental merge equals a from-scratch rebuild, empty sides included") {
    import graft.operators.Boilerplate
    import spark.implicits._
    val base = Seq((1L, "alpha beta gamma"), (2L, "alpha beta"), (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val batch = Seq((4L, "beta gamma"), (5L, "epsilon alpha")).toDF("doc_id", "text")
    val all = base.unionAll(batch)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("tok").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merged = Boilerplate.updateDfStats(
      Boilerplate.dfStats(base, "doc_id", "text"), batch, "doc_id", "text")
    // full stats agree with one-pass stats: tok/df rows and the doc count
    assert(canon(merged.select("tok", "df")) ==
      canon(Boilerplate.dfStats(all, "doc_id", "text").select("tok", "df")))
    assert(merged.select("n_docs").distinct().collect().map(_.getLong(0)).toSeq == Seq(5L))
    // thresholded vocabulary agrees with highDfTokens over the union
    assert(canon(Boilerplate.vocabularyFromStats(merged, 50, 100)) ==
      canon(Boilerplate.highDfTokens(all, "doc_id", "text", 50, 100)))
    // empty batch: stats unchanged; empty base: stats = batch stats
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noBatch = Boilerplate.updateDfStats(
      Boilerplate.dfStats(base, "doc_id", "text"), emptyDocs, "doc_id", "text")
    assert(canon(noBatch.select("tok", "df")) ==
      canon(Boilerplate.dfStats(base, "doc_id", "text").select("tok", "df")))
    assert(noBatch.select("n_docs").distinct().collect().map(_.getLong(0)).toSeq == Seq(3L))
    val noBase = Boilerplate.updateDfStats(
      Boilerplate.dfStats(emptyDocs, "doc_id", "text"), batch, "doc_id", "text")
    assert(canon(noBase.select("tok", "df")) ==
      canon(Boilerplate.dfStats(batch, "doc_id", "text").select("tok", "df")))
    assert(noBase.select("n_docs").distinct().collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("groupedPercentRank: exact percent_rank per group incl. singleton-zero, no group serialization") {
    import spark.implicits._
    // group sizes 1, 4, 7 with duplicate values inside groups
    val df = (Seq(("s", 9L, 1L)) ++
      (1L to 4L).map(i => ("m", i % 2, i + 10L)) ++
      (1L to 7L).map(i => ("l", i % 3, i + 20L))).toDF("grp", "v", "id")
    val out = graft.operators.Ranking.groupedPercentRank(
      df, "grp", expr("v"), col("v"), col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"), col("id"))
    val expected = df.withColumn("exp", percent_rank().over(w))
    val joined = out.join(expected, Seq("grp", "v", "id"))
    assert(joined.where(col("pct_rank") =!= col("exp")).count() == 0)
    assert(joined.where(col("grp") === "s").head().getAs[Double]("pct_rank") == 0.0)
    // the data windows partition by (group, sub-bucket) — never one task
    // per whole group, never a global sort
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val dataWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(dataWindows.nonEmpty && dataWindows.forall(l => l.contains("_grp") && l.contains("_sb")),
      s"ranking windows must be (group, sub-bucket)-partitioned:\n${dataWindows.mkString("\n")}")
  }

  test("robustZScore: modified z flags the planted spike, MAD-0 group never flags, null group kept") {
    import spark.implicits._
    // group a (6 values): interpolated median 10.5, devs {2.5,1.5,0.5,0.5,
    // 1.5,89.5} -> MAD 1.5; the spike scores 0.6745*89.5/1.5 = 40.2;
    // group b: all-identical -> MAD 0 -> NULL scores, no flags;
    // null group: must survive the joins (winsorize's contract)
    val df = (Seq(8L, 9L, 10L, 11L, 12L, 100L).map(v => (Option("a"), v)) ++
      Seq(5L, 5L, 5L, 5L).map(v => (Option("b"), v)) ++
      Seq((Option.empty[String], 7L))).toDF("g", "v")
    val out = graft.operators.Outliers.robustZScore(df, "g", "v", sigmas = 3.5)
    val rows = out.collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
      ((Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))).toMap
    assert(rows((Some("a"), 100L))._2, "the spike must flag")
    assert(rows((Some("a"), 100L))._1.get == 0.6745 * 89.5 / 1.5)
    assert(rows((Some("a"), 10L))._1.get == 0.6745 * -0.5 / 1.5)
    Seq(8L, 9L, 11L, 12L).foreach(v => assert(!rows((Some("a"), v))._2, s"a/$v must not flag"))
    Seq(5L).foreach(v => assert(rows((Some("b"), v)) == ((None, false)), "MAD-0 group: NULL score, no flag"))
    // singleton null group: MAD 0 -> NULL score, kept, unflagged
    assert(rows((None, 7L)) == ((None, false)))
    assert(out.count() == 11)
  }

  test("snapshotDiff: all four statuses from content fingerprints") {
    import spark.implicits._
    val v1 = Seq((1L, "same"), (2L, "will change"), (3L, "gone")).toDF("id", "text")
    val v2 = Seq((1L, "same"), (2L, "did change"), (4L, "brand new")).toDF("id", "text")
    val out = graft.operators.Cdc.snapshotDiff(v1, v2, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("updateShingleDfStats: incremental shingle-df merge equals rebuild; shared keys agree") {
    import graft.operators.Boilerplate
    import spark.implicits._
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma zeta eta")).toDF("doc_id", "text")
    val batch = Seq(
      (3L, "alpha beta gamma delta theta"),
      (4L, "iota kappa lambda mu nu")).toDF("doc_id", "text")
    val all = base.unionAll(batch)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("sh").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val merged = Boilerplate.updateShingleDfStats(
      Boilerplate.shingleDfStats(base, "doc_id", "text", 3), batch,
      "doc_id", "text", 3)
    assert(canon(merged.select("sh", "df")) ==
      canon(Boilerplate.shingleDfStats(all, "doc_id", "text", 3).select("sh", "df")))
    assert(merged.select("n_docs").distinct().collect().map(_.getLong(0)).toSeq == Seq(4L))
    // the df >= 2 key set off the merged stats = sharedShingleKeys(all)
    val fromStats = Boilerplate.sharedKeysFromStats(merged)
      .collect().map(_.getLong(0)).sorted.toSeq
    val oneShot = Boilerplate.sharedShingleKeys(all, "doc_id", "text", 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(fromStats == oneShot && fromStats.nonEmpty)
  }

  test("countMin: estimates never undercount, honor the eps*N bound, and merge linearly") {
    import graft.operators.CountMin
    import spark.implicits._
    // 300 keys, key k occurring (k % 13 + 1) times -> N = sum of counts
    val occ = (1L to 300L).flatMap(k => Seq.fill((k % 13).toInt + 1)(k))
    val keys = occ.toDF("key")
    val cms = CountMin.build(keys, "key", depth = 4, width = 2048)
    assert(cms.total == occ.length.toLong)
    val exact = occ.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val est = keys.distinct().withColumn("est", cms.estimate(col("key")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-sided: a CMS can only ever overcount
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"undercount for $k: ${est(k)} < $c") }
    // the eps*N bound holds per-key with prob 1 - e^-depth (~0.98); the
    // fixed hash family makes the outcome deterministic — require >= 95%
    val within = exact.count { case (k, c) => est(k) - c <= cms.errorBound }
    assert(within >= (exact.size * 95) / 100,
      s"only $within/${exact.size} within eps*N = ${cms.errorBound}")
    // linearity: cellwise merge of two half-builds = one build of the union
    val (a, b) = occ.splitAt(occ.length / 2)
    val merged = CountMin.build(a.toDF("key"), "key", 4, 2048)
      .merge(CountMin.build(b.toDF("key"), "key", 4, 2048))
    assert(merged.table.toSeq == cms.table.toSeq && merged.total == cms.total)
    // weighted build: weights sum instead of counting rows
    val wdf = Seq((7L, 5L), (7L, 3L), (9L, 2L)).toDF("key", "w")
    val wcms = CountMin.build(wdf, "key", 2, 64, weightCol = Some("w"))
    val west = wdf.select(col("key")).distinct()
      .withColumn("est", wcms.estimate(col("key")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wcms.total == 10L && west(7L) >= 8L && west(9L) >= 2L)
  }

  test("contentDefinedChunks: boundary locality — an early edit leaves later chunks identical") {
    import graft.operators.Chunking
    import spark.implicits._
    // long synthetic doc; divisor 8 for several chunks at this length
    val words = (1 to 120).map(i => s"w${i % 37}x$i").mkString(" ")
    val edited = "INSERTED " + words // one token prepended at the front
    val docs = Seq((1L, words), (2L, edited)).toDF("doc_id", "text")
    val out = Chunking.contentDefinedChunks(docs, "doc_id", "text", divisor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    val c1 = out.filter(_._1._1 == 1L).toSeq.sortBy(_._1._2).map(_._2)
    val c2 = out.filter(_._1._1 == 2L).toSeq.sortBy(_._1._2).map(_._2)
    assert(c1.size >= 3, s"need several chunks, got ${c1.size}")
    // content-defined: every boundary is a pure function of local content,
    // so the edited doc re-synchronizes — its trailing chunks equal the
    // original's trailing chunks (fixed-stride windows would ALL shift)
    val common = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }.size
    assert(common >= c1.size - 2,
      s"chunks did not re-synchronize after the edit: $common of ${c1.size} shared")
    // reconstruction: chunks tile the token stream exactly, in order
    val rebuilt = Chunking.contentDefinedChunks(docs, "doc_id", "text", divisor = 8)
      .where(col("doc_id") === 1L).orderBy(col("chunk_idx"))
      .collect().map(_.getString(4)).mkString(" ")
    assert(rebuilt == words)
    // tiny docs (< shingle length) never cut
    val tiny = Seq((9L, "just two")).toDF("doc_id", "text")
    val t9 = Chunking.contentDefinedChunks(tiny, "doc_id", "text", divisor = 2)
      .collect()
    assert(t9.length == 1 && t9.head.getLong(2) == 2L && t9.head.getString(4) == "just two")
    // the whole chunker is per-row HOFs + a scan-stage explode: a
    // document's chunks never leave the task that read it — NO exchange
    val chunked = Chunking.contentDefinedChunks(docs, "doc_id", "text", divisor = 8)
    chunked.collect()
    val plan = chunked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunker must not shuffle:\n$plan")
  }

  test("decayedScore: exact dyadic weights, hard expiry, clamp, refPerKey") {
    import spark.implicits._
    import graft.operators.Decay
    val stepU = 14400000000L // 4h in micros
    def ts(step: Long) = step * stepU + 123456L // mid-bucket offset
    val events = Seq(
      (1L, ts(100), 2.5),    // qv 250, age 0  -> 250 << 20
      (1L, ts(99), 1.999),   // qv 199 (floor), age 1 -> 199 << 19
      (1L, ts(80), 1.0),     // qv 100, age 20 -> 100 << 0 (horizon edge)
      (1L, ts(79), 7.0),     // age 21 -> expired, exactly 0, not live
      (2L, ts(100), -5.0),   // clamped to 0: live but weightless
      (3L, ts(50), 1.0)      // global ref 100 -> expired; own ref 50 -> live
    ).toDF("user_id", "raw_ts", "value")
      .select(col("user_id"), timestamp_micros(col("raw_ts")).as("ts"), col("value"))
    val out = Decay.decayedScore(events, "user_id", "ts", "value",
        halfLifeHours = 4, horizonSteps = 20, valueScale = 100L)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, (250L << 20) + (199L << 19) + 100L, 3L, 100L)))
    assert(out(1) == ((2L, 0L, 1L, 100L)))
    assert(out(2) == ((3L, 0L, 0L, 100L)))
    // refPerKey: each key ages against its OWN frontier (the streaming view)
    val perKey = Decay.decayedScore(events, "user_id", "ts", "value",
        halfLifeHours = 4, horizonSteps = 20, valueScale = 100L, refPerKey = true)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(perKey(2) == ((3L, 100L << 20, 1L, 50L)))
    // global path is pure partial-aggregable: no window, no sort anywhere
    val plan = Decay.decayedScore(events, "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"global decayedScore must stay window/sort-free:\n$plan")
  }

  test("writeSortedRange: disjoint range dirs, rows sorted inside, deterministic boundaries") {
    import spark.implicits._
    import graft.sources.Tables
    val rows = (1L to 400L).map(i => ((i * 37) % 400, i)).toDF("v", "id")
    val path = java.nio.file.Files.createTempDirectory("sorted_export").toString
    Tables.writeSortedRange(rows, path,
      expr("(v - pmod(v, 100L)) DIV 100L"), col("v"), col("id"))
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("range=")).sortBy(_.getName)
    assert(dirs.length == 4)
    // each range directory holds ONE task's output, already in (v, id)
    // order on disk — a single-file single-partition read preserves it
    val perRange = dirs.map { d =>
      val vs = spark.read.parquet(d.toString).select("v", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(vs.sameElements(vs.sortBy(identity)),
        s"${d.getName} not sorted on disk")
      (vs.head._1, vs.last._1, vs.length)
    }
    // ranges tile [0, 400) disjointly: global order = dir order
    val sorted = perRange.sortBy(_._1)
    sorted.sliding(2).foreach { case Array(a, b) => assert(a._2 < b._1) }
    assert(perRange.map(_._3).sum == 400)
    // boundaries are value-derived, not sampled: a rerun is byte-stable
    val again = java.nio.file.Files.createTempDirectory("sorted_export2").toString
    Tables.writeSortedRange(rows.repartition(7), again,
      expr("(v - pmod(v, 100L)) DIV 100L"), col("v"), col("id"))
    val names2 = new java.io.File(again).listFiles()
      .filter(_.getName.startsWith("range=")).map(_.getName).sorted
    assert(names2.sameElements(dirs.map(_.getName)))
  }

  test("nextFitPack: bin resets, oversized rows get own bins, keys independent") {
    import spark.implicits._
    import graft.operators.Packing
    val rows = Seq(
      ("s0", 1L, 300L), ("s0", 2L, 200L), // 300+200=500 <= 512 -> bin 0
      ("s0", 3L, 100L),                   // 500+100 > 512 -> bin 1
      ("s0", 4L, 900L),                   // oversized: bin 2, alone
      ("s0", 5L, 10L),                    // fill 900 > cap -> bin 3
      ("s1", 6L, 512L), ("s1", 7L, 1L)    // exact fit bin 0; next opens bin 1
    ).toDF("shard", "id", "toks")
    val out = Packing.nextFitPack(rows, "shard", "id", "id", "toks", cap = 512L)
      .collect().map(r => (r.getLong(1), (r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((0L, 300L)) && out(2L) == ((0L, 500L)))
    assert(out(3L) == ((1L, 100L)))
    assert(out(4L) == ((2L, 900L)), "next-fit never splits an oversized row")
    assert(out(5L) == ((3L, 10L)))
    assert(out(6L) == ((0L, 512L)) && out(7L) == ((1L, 1L)),
      "keys pack independently; exact fit closes the bin")
  }

  test("HLL distinct lifecycle: merge within error of rebuild both orders, new/untouched groups") {
    import spark.implicits._
    import graft.operators.DistinctSketch
    val rows = (1 to 4000).map { i =>
      (s"g${i % 3}", (i * 2654435761L) % 1500) // ~1500-key universe, 3 groups
    }.toDF("grp", "k")
    val (a, b) = (rows.where(col("k") % 4 =!= 0), rows.where(col("k") % 4 === 0))
    def ests(df: org.apache.spark.sql.DataFrame) =
      DistinctSketch.estimates(df, "grp").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
    val rebuilt = ests(DistinctSketch.groupSketches(rows, "grp", "k"))
    val merged = ests(DistinctSketch.updateSketches(
      DistinctSketch.groupSketches(a, "grp", "k"), b, "grp", "k"))
    // union cannot preserve the stream-built HIP estimator, so incremental
    // is within the error bound of rebuild (not bitwise) — <1% at lgK 12
    rebuilt.foreach { case (g, n) =>
      assert(math.abs(merged(g).toDouble - n) / n < 0.01,
        s"group $g: merged ${merged(g)} vs rebuilt $n")
    }
    // merge order: register max is commutative, but DataSketches' union
    // result representation (and hence the estimate's last ulp) depends on
    // promotion order — assert order-independence WITHIN the error bound,
    // same contract as incremental-vs-rebuild
    val swapped = ests(DistinctSketch.updateSketches(
      DistinctSketch.groupSketches(b, "grp", "k"), a, "grp", "k"))
    merged.foreach { case (g, n) =>
      assert(math.abs(swapped(g).toDouble - n) / n < 0.01,
        s"group $g: swapped ${swapped(g)} vs merged $n")
    }
    // ~1.6% RSE at lgK 12; assert a generous 3-sigma 5% against exact
    val exact = rows.groupBy("grp").agg(countDistinct(col("k")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(rebuilt(g).toDouble - n) / n < 0.05,
        s"group $g: est ${rebuilt(g)} vs exact $n")
    }
    // a batch-only group enters the model; an untouched group passes through
    val withNew = ests(DistinctSketch.updateSketches(
      DistinctSketch.groupSketches(a, "grp", "k"),
      Seq(("brand_new", 1L), ("brand_new", 2L)).toDF("grp", "k"), "grp", "k"))
    assert(withNew("brand_new") == 2L)
    assert(withNew("g1") == ests(DistinctSketch.groupSketches(a, "grp", "k"))("g1"))
  }

  test("recrawl suppress: TTL chains from kept sightings, ties admit min id") {
    import spark.implicits._
    import graft.operators.Recrawl
    // one fp, sightings at 0,5,10,14,20 with ttl 10: windows chain from
    // KEPT sightings only -> kept at 0, 10, 20 (5 and 14 suppressed; a
    // per-sighting chain would wrongly suppress 10 and keep 14)
    val log = Seq(
      ("a", 1L, 0L), ("a", 2L, 5L), ("a", 3L, 10L), ("a", 4L, 14L), ("a", 5L, 20L),
      ("b", 6L, 100L), ("b", 7L, 100L) // tie: min id admitted, other suppressed
    ).toDF("fp", "crawl_id", "ts_us")
    val out = Recrawl.suppress(log, "fp", "crawl_id", "ts_us", ttlMicros = 10L)
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> true, 7L -> false))
    // ttl 0 keeps everything; huge ttl = exact dedup (first only)
    val all = Recrawl.suppress(log, "fp", "crawl_id", "ts_us", 0L)
      .collect().map(_.getBoolean(3))
    assert(all.forall(identity))
    val first = Recrawl.suppress(log, "fp", "crawl_id", "ts_us", Long.MaxValue)
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).toMap
    assert(first.count(_._2) == 2 && first(1L) && first(6L))
  }

  test("bucketRepresentatives: exact integer argmin to the bucket centroid, no explode") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.9f, 0.0f, 0.1f)),
      (2L, Array(0.9f, 1.0f, 0.1f, 0.0f)),
      (3L, Array(1.0f, 1.0f, 0.05f, 0.05f)), // central in its bucket
      (4L, Array(-1.0f, -0.9f, 0.2f, 0.1f)),
      (5L, Array(-0.9f, -1.0f, 0.1f, 0.2f))
    ).toDF("vec_id", "embedding")
    val reps = Similarity.bucketRepresentatives(vecs, "vec_id", "embedding",
      planes = 2, dim = 4)
    val got = reps.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute-force the same integer argmin from the operator's own codes
    val codes = vecs.select(col("vec_id"),
        Vectors.lshBucket(col("embedding"), 2, 4).as("b"),
        transform(Vectors.quantizeInt8(col("embedding")).getField("q"),
          _.cast("long")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2).toArray))
    codes.groupBy(_._2).foreach { case (b, members) =>
      val n = members.length.toLong
      val s = members.map(_._3).transpose.map(_.sum)
      val best = members.map { case (id, _, q) =>
        (q.zip(s).map { case (x, sd) => val d = n * x - sd; d * d }.sum, id)
      }.min
      assert(got(b) == ((best._2, best._1, n)),
        s"bucket $b: got ${got(b)}, brute force says $best n=$n")
    }
    // per-dim sums ride as agg columns — the data never explodes to row×dim
    val plan = reps.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"no explode expected:\n$plan")
  }

  test("contrastiveNegatives: k per anchor, never self, partitioning-invariant") {
    import spark.implicits._
    import graft.operators.Sampling
    val ids = (1L to 37L).toDF("doc_id")
    val out = Sampling.contrastiveNegatives(ids, "doc_id", k = 3, seed = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly k draws per anchor (with replacement across j, but never self)
    assert(out.length == 37 * 3)
    assert(out.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L)))
    assert(out.forall(t => t._3 != t._1), "a negative must not be the anchor")
    // content-keyed: the draw is a pure function of (id, seed), not of the
    // physical layout — reshuffled input yields the identical pair set
    val re = Sampling.contrastiveNegatives(ids.repartition(7), "doc_id",
        k = 3, seed = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.toSet == out.toSet)
    // different seed -> different permutation (sanity that seed matters)
    val other = Sampling.contrastiveNegatives(ids, "doc_id", k = 3, seed = "u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(other.toSet != out.toSet)
    // singleton corpus: no negatives exist -> zero rows, not a self-pair
    val one = Sampling.contrastiveNegatives(Seq(9L).toDF("doc_id"), "doc_id", k = 2)
    assert(one.count() == 0L)
  }

  test("mutualBestMatch: symmetric greedy rounds on a shared entity namespace") {
    import spark.implicits._
    import graft.operators.Linkage
    // chain 1-2-3-4 plus isolated pair 5-6; 2's candidates tie on score
    // so the partner id breaks the tie toward 1
    val pairs = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 2L), (5L, 6L, 1L)
    ).toDF("id_a", "id_b", "dist")
    val out = Linkage.mutualBestMatch(pairs, "id_a", "id_b", "dist", rounds = 2)
      .orderBy("id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // round 1: (1,2) mutual (2 prefers 1 on the tie), (5,6) mutual;
    // (2,3) blocked by 2, (3,4) blocked by 3's preference for 2.
    // round 2: with 2 matched, (3,4) becomes mutual on the residue.
    assert(out.toSeq == Seq((1L, 2L, 1L, 1L), (3L, 4L, 2L, 2L), (5L, 6L, 1L, 1L)))
    // an entity is matched at most once even across the id_a/id_b sides
    val all = out.flatMap(t => Seq(t._1, t._2))
    assert(all.distinct.length == all.length, "matching must be a partial matching")
    // similarity mode: larger is better
    val sim = Seq((1L, 2L, 0.9), (2L, 3L, 0.95)).toDF("id_a", "id_b", "s")
    val simOut = Linkage.mutualBestMatch(sim, "id_a", "id_b", "s",
        rounds = 1, smallerIsBetter = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(simOut.toSeq == Seq((2L, 3L)))
  }

  test("contentDefinedChunks: sub-shingle docs report true token counts even in the boundary hash class") {
    import graft.operators.Chunking
    import spark.implicits._
    // 1- and 2-token docs (< shingleLen 3): fastWordShingles emits one
    // whole-text shingle, and with divisor 2 roughly half the docs hash
    // into the boundary class where the unclamped cut used to land past
    // the end (reporting n_tok = shingleLen instead of the real count)
    val docs = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) s"tok$i" else s"tok$i other$i")).toDF("doc_id", "text")
    // the test must actually exercise the boundary class
    val boundaryHits = docs.select(
        explode(Text.fastWordShingles(col("text"), 3)).as("sh"))
      .where(pmod(Dedup.shingleKey(col("sh")), lit(2L)) === 0L).count()
    assert(boundaryHits >= 1, "fixture never hits the boundary hash class")
    val out = Chunking.contentDefinedChunks(docs, "doc_id", "text", divisor = 2)
      .collect()
    assert(out.length == 40, "short docs chunk to exactly one whole-text chunk")
    out.foreach { r =>
      val n = r.getLong(2); val txt = r.getString(4)
      assert(n == txt.split(" ").length.toLong,
        s"n_tok $n != actual tokens in '$txt'")
      assert(r.getLong(1) == 0L, "single chunk must be index 0")
    }
  }

  test("snapshotDiff: NULL content is presence, not absence") {
    import spark.implicits._
    // id 1: present old only (removed) — NULL content must not mask it
    // id 2: NULL in both -> unchanged (NULL <=> NULL), NOT added
    // id 3: NULL -> value  -> changed;  id 4: only new, NULL -> added
    val v1 = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "text")
    val v2 = Seq((2L, Option.empty[String]), (3L, Option("y")),
      (4L, Option.empty[String])).toDF("id", "text")
    val out = graft.operators.Cdc.snapshotDiff(v1, v2, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("CountMin.build rejects negative weights before touching the cell pass") {
    import spark.implicits._
    import graft.operators.CountMin
    val df = Seq((1L, 5L), (2L, -1L)).toDF("key", "w")
    val e = intercept[IllegalArgumentException] {
      CountMin.build(df, "key", depth = 2, width = 64, weightCol = Some("w"))
    }
    assert(e.getMessage.contains("negative weights"))
    // zero weights are legal (they just contribute nothing)
    val ok = CountMin.build(Seq((1L, 0L), (2L, 3L)).toDF("key", "w"),
      "key", depth = 2, width = 64, weightCol = Some("w"))
    assert(ok.total == 3L)
  }

  test("groupedQuantilesRational: integer rank selection immune to double-ceil overshoot") {
    import spark.implicits._
    import graft.operators.Ranking
    val rows = (1L to 100L).map(v => ("a", v, v)).toDF("g", "v", "id")
    val sub = expr("(v - pmod(v, 25L)) DIV 25L")
    // 0.07 of 100: the double path computes 0.07*100 = 7.000000000000001
    // and ceils to rank 8 — the documented float-ceil convention
    val viaDouble = Ranking.groupedQuantiles(rows, "g", "v", sub, "id", Seq(0.07))
      .collect().map(_.getLong(2))
    assert(viaDouble.toSeq == Seq(8L), "double form documents the ceil overshoot")
    // the rational form selects by (r-1)*den < num*n <= r*den: rank 7,
    // the true type-1 element at ceil(7/100 * 100) = 7
    val q = Ranking.groupedQuantilesRational(rows, "g", "v", sub, "id",
      Seq((7L, 100L), (1L, 2L), (1L, 1L)))
    val got = q.collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(got(0.07) == 7L && got(0.5) == 50L && got(1.0) == 100L)
    assert(!q.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "rational quantiles must keep the grouped-rank plan shape")
  }

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

  test("corpusSimilarityMatrix: exact jaccard per group pair, sparse on disjoint") {
    import spark.implicits._
    import graft.operators.Dedup
    // a and b share their first two docs' shingles; c is disjoint
    val docs = Seq(
      ("a", "one two three four"), ("a", "five six seven"),
      ("b", "one two three four"), ("b", "eight nine ten"),
      ("c", "xx yy zz ww")).toDF("g", "text")
    val out = Dedup.corpusSimilarityMatrix(docs, "g", "text", shingleLen = 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.length == 1, s"only (a,b) overlap; got ${out.toSeq}")
    val (ga, gb, na, nb, nc, j) = out.head
    // a: 2 shingles from doc1 + 1 whole-text from doc2; b likewise
    assert(ga == "a" && gb == "b" && na == 3L && nb == 3L && nc == 2L)
    assert(j == 2.0 / 4.0)
  }

  test("ewmaControlChart: spike flagged against prior window, zero-variance repeats stay in-control") {
    import spark.implicits._
    import graft.operators.Decay
    val stepU = 14400000000L // 4h in micros
    def mk(user: Long, step: Long, v: Double, id: Long) = (user, step * stepU + 7L, v, id)
    val rows = (
      (100L to 104L).zipWithIndex.map { case (st, i) => mk(1L, st, 10.0, i.toLong) } ++
      Seq(mk(1L, 105L, 10.0, 50L)) ++                 // exact repeat: in-control
      (100L to 104L).zipWithIndex.map { case (st, i) => mk(2L, st, 10.0, 100L + i) } ++
      Seq(mk(2L, 105L, 99.0, 150L))                   // spike: out-of-control
    ).toDF("user_id", "us", "value", "event_id")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val out = Decay.ewmaControlChart(rows, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(1) -> (r.getLong(4), r.getBoolean(5))).toMap
    // first events have no prior window
    assert(out(0L) == (0L, false) && out(100L) == (0L, false))
    // constant history: zero prior variance, zero deviation -> in-control
    assert(out(50L) == (5L, false))
    // spike against the same zero-variance history -> flagged
    assert(out(150L) == (5L, true))
    // mid-history events see exactly their predecessors
    assert(out(3L)._1 == 3L)
  }

  test("blocklist: token-boundary matching, report counts, drop action") {
    import spark.implicits._
    import graft.operators.Blocklist
    val docs = Seq(
      (1L, "the hash join beats the sort"),   // "hash join"
      (2L, "a hashjoin is one token"),        // no boundary match
      (3L, "Hash  JOIN and table scan here"), // normalization: 2 phrases
      (4L, "scan table join hash"),           // reversed orders: none
      (5L, "")).toDF("doc_id", "text")
    val phrases = Seq("hash join", "table scan", "missing phrase three tokens")
    val report = Blocklist.matchReport(docs, "doc_id", "text", phrases)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report == Map(1L -> 1L, 2L -> 0L, 3L -> 2L, 4L -> 0L, 5L -> 0L))
    val kept = Blocklist.dropMatching(docs, "doc_id", "text", phrases)
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 4L, 5L))
    // duplicate phrase spellings collapse under normalization
    val matches = Blocklist.phraseMatches(docs, "doc_id", "text",
      Seq("hash join", "HASH   Join"))
    assert(matches.collect().length == 2) // docs 1 and 3, one phrase each
  }

  test("winnowing: guarantee on shared runs, density, single-window short docs, no exchange") {
    import spark.implicits._
    import graft.operators.Dedup
    val run = (1 to 30).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"completely different prefix words here $run and another tail"),
      (3L, "nothing in common with anybody at all zz"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs, "doc_id", "text",
      shingleLen = 3, window = 8)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    // the winnowing GUARANTEE: a shared run of >= w + shingleLen - 1 = 10
    // tokens forces a shared fingerprint — doc 1 and 2 share a 30-run
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared run must share a fingerprint")
    assert((byDoc(3L) & byDoc(1L)).isEmpty && (byDoc(3L) & byDoc(2L)).isEmpty)
    // density: ~2/(w+1) of shingle positions, never more than all
    assert(byDoc(1L).size < 36 && byDoc(1L).size >= 36 / 8)
    // a doc shorter than window+shingle is ONE window -> one fingerprint
    assert(byDoc(4L).size == 1)
    // per-row HOFs + scan-stage explode: no exchange
    val plan = fps.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), s"fingerprinting must not shuffle:\n$plan")
    // pair detection finds exactly the planted overlap
    val pairs = Dedup.winnowedPairs(docs, "doc_id", "text", 3, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("frequencySpectrum: count-of-counts, mass conservation") {
    import spark.implicits._
    import graft.operators.Boilerplate
    // a:3, b:2, c:2, d:1, e:1, f:1 -> spectrum 1->3, 2->2, 3->1
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a f")).toDF("id", "text")
    val got = Boilerplate.frequencySpectrum(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // sum(freq * n_types) must equal the corpus token count
    assert(got.map { case (f, n) => f * n }.sum == 10L)
  }

  test("corpusDivergence: zero on identical corpora, positive both ways on disjoint") {
    import spark.implicits._
    import graft.operators.LmScore
    val a = Seq((1L, "alpha beta gamma alpha"), (2L, "beta delta")).toDF("id", "text")
    // unats export as double since the DECIMAL(38) hardening (exact —
    // the decimal sum casts once at the end)
    val same = LmScore.corpusDivergence(a, a, "text").collect()(0)
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0,
      "identical corpora must diverge by exactly zero")
    val b = Seq((3L, "zz yy xx zz ww")).toDF("id", "text")
    val d = LmScore.corpusDivergence(a, b, "text").collect()(0)
    // (n_tok_a, n_tok_b, vocab, kl_ab_unats, kl_ba_unats, kl_ab, kl_ba)
    assert(d.getLong(0) == 6L && d.getLong(1) == 5L && d.getLong(2) == 8L)
    assert(d.getDouble(5) > 0.1 && d.getDouble(6) > 0.1,
      s"disjoint corpora must diverge both ways: $d")
  }

  test("kmvSimilarityMatrix: exact at k >= universe, within KMV tolerance at small k") {
    import spark.implicits._
    import graft.operators.Dedup
    val docs = Seq(
      ("a", "one two three four five six seven eight"),
      ("b", "one two three four five nine ten eleven"),
      ("c", "alpha beta gamma delta epsilon zeta eta theta")).toDF("g", "text")
    // k beyond every group's shingle universe -> the sketch IS the set,
    // so the estimate equals the exact Jaccard
    val exact = Dedup.corpusSimilarityMatrix(docs, "g", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val big = Dedup.kmvSimilarityMatrix(docs, "g", "text", 3, k = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(big(("a", "b")) == exact(("a", "b")))
    assert(big(("a", "c")) == 0.0 && big(("b", "c")) == 0.0)
    // sketch sizes respect k and rank ordering
    val sk = Dedup.kmvSketch(docs, "g", "text", 3, k = 3).collect()
      .groupBy(_.getString(0)).map { case (g, v) => g -> v.map(_.getLong(2)).sorted.toSeq }
    assert(sk.values.forall(_ == Seq(1L, 2L, 3L)))
  }

  test("reciprocalRankFusion: exact quantized fusion, absent ids contribute nothing") {
    import spark.implicits._
    import graft.operators.Ranking
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((3L, 1L), (2L, 2L), (4L, 3L)).toDF("id", "rank")
    val got = Ranking.reciprocalRankFusion(Seq(a, b), "id", "rank")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // round(1e6/61)=16393, /62=16129, /63=15873
    assert(got(1L) == (16393L, 1L))
    assert(got(2L) == (32258L, 2L))
    assert(got(3L) == (16393L + 15873L, 2L))
    assert(got(4L) == (15873L, 1L))
    // the shared-id fusion outranks the single-system leader
    assert(got(3L)._1 > got(1L)._1 && got(2L)._1 > got(1L)._1)
  }

  test("trimmedStats: integer trim cut per group, small groups keep everything") {
    import spark.implicits._
    import graft.operators.Ranking
    val df = ((1L to 10L).map(v => ("big", v, v)) ++
      Seq(("small", 100L, 11L), ("small", 1L, 12L), ("small", 50L, 13L)))
      .toDF("g", "v", "id")
    val out = Ranking.trimmedStats(df, "g", "v",
        subBucket = expr("v DIV 4"), idCol = "id", trimNum = 1L, trimDen = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    // big: n=10, t=1 -> keep ranks 2..9 = values 2..9
    assert(out("big") == (10L, 8L, 44L, 2L, 9L, 5.5))
    // small: n=3, t=0 -> untouched
    assert(out("small") == (3L, 3L, 151L, 1L, 100L, 151.0 / 3.0))
  }

  test("oovRate: per-group OOV fraction against a reference vocabulary") {
    import spark.implicits._
    import graft.operators.Boilerplate
    val docs = Seq(("a", "known words here"), ("a", "unknown stuff"),
      ("b", "known known known")).toDF("src", "text")
    val vocab = Seq("known", "words").toDF("tok")
    val got = Boilerplate.oovRate(docs, "src", "text", vocab)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a: 5 tokens, oov = here, unknown, stuff = 3; b: 3 tokens, 0 oov
    assert(got("a") == (5L, 3L) && got("b") == (3L, 0L))
  }

  test("giniConcentration: zero on balance, known value on 1-vs-9 split") {
    import spark.implicits._
    import graft.operators.Checks
    val even = (1L to 40L).map(i => (s"g${i % 4}", i)).toDF("g", "x")
    val r0 = Checks.giniConcentration(even, "g").collect()(0)
    assert(r0.getLong(0) == 4L && r0.getLong(1) == 40L && r0.getDouble(3) == 0.0)
    val skewed = ((1 to 1).map(_ => ("a", 0)) ++ (1 to 9).map(i => ("b", i))).toDF("g", "x")
    val r1 = Checks.giniConcentration(skewed, "g").collect()(0)
    // sizes (1, 9): num = (2*1-3)*1 + (2*2-3)*9 = 8; gini = 8/(2*10) = 0.4
    assert(r1.getLong(2) == 8L && r1.getDouble(3) == 0.4)
  }

  test("vocabGrowthCurve: nested samples grow monotonically; full rate is the whole corpus") {
    import spark.implicits._
    import graft.operators.Boilerplate
    val docs = (1L to 200L).map(i => (i, s"common w${i % 30} unique$i")).toDF("doc_id", "text")
    val out = Boilerplate.vocabGrowthCurve(docs, "doc_id", "text", Seq(0.1, 0.5, 1.0))
      .orderBy(col("rate")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 3)
    // nesting: every statistic is monotone nondecreasing in the rate
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4 })
    // rate 1.0 is the exact whole corpus: 200 docs, 600 tokens,
    // vocab = common + 30 w-types + 200 unique = 231
    assert(out.last == (1.0, 200L, 600L, 231L))
    // the 10% sample is a real subsample, not empty and not everything
    assert(out.head._2 > 0 && out.head._2 < 200L)
  }

  test("hitsInt: hand-computed two-round max-normalized scores; zero-degree sides at exact 0") {
    import spark.implicits._
    import graft.operators.Graph
    // 1→3, 2→3, 2→4, 3→4 at scale 100:
    // r1: rawAuth {3:200, 4:200} → auth {3:100, 4:100};
    //     rawHub {1:100, 2:200, 3:100} → hub {1:50, 2:100, 3:50}
    // r2: rawAuth {3:150, 4:150} → auth {3:100, 4:100}; hubs repeat
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("s", "d")
    val out = Graph.hitsInt(edges, "s", "d", iterations = 2, scale = 100L,
        checkpoint = false)
      .orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 50L, 0L), (2L, 100L, 0L),
      (3L, 50L, 100L), (4L, 0L, 100L)))
    // duplicate edges must not double-count (distinct contract)
    val dup = Graph.hitsInt(edges.union(edges), "s", "d", iterations = 2,
        scale = 100L, checkpoint = false)
      .orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dup.toSeq == out.toSeq)
  }

  test("bfsDistances: min-hop distances, unreachable absent, maxHops bounds the ring") {
    import spark.implicits._
    import graft.operators.Graph
    // path 1→2→3→4, shortcut 1→3, island 5→6
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (5L, 6L))
      .toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = Graph.bfsDistances(edges, "s", "d", seeds, maxHops = 2,
        checkpoint = false)
      .orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // shortcut wins: dist(3) = 1, so dist(4) = 2; island 5/6 absent
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)))
    // maxHops = 0 returns exactly the seed set
    val only = Graph.bfsDistances(edges, "s", "d", seeds, maxHops = 0,
        checkpoint = false).collect()
    assert(only.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 0L)))
    // multi-source: min over seeds
    val two = Graph.bfsDistances(edges, "s", "d",
        Seq(Tuple1(1L), Tuple1(3L)).toDF("node"), maxHops = 2,
        checkpoint = false)
      .orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(two.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L)))
  }

  test("Bpe: N-round training matches hand merges, stops early when dry; encode compresses") {
    import spark.implicits._
    import graft.operators.Bpe
    // words: abab x2, ab x1, cd x1
    // r1: (a,b) count 2·2+1 = 5 wins; r2: (ab,ab) 2; r3: (c,d) 1; r4: dry
    val docs = Seq((1L, "abab abab ab cd")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(spark, docs, "text", rounds = 4,
        checkpoint = false)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1L, "a", "b", 5L), (2L, "ab", "ab", 2L),
      (3L, "c", "d", 1L)))
    // encode: abab→1 sym, ab→1, cd→1; plus out-of-universe single chars
    val docs2 = Seq((1L, "abab abab ab cd"), (2L, "a x")).toDF("doc_id", "text")
    val enc = Bpe.encodeCorpus(docs2, "doc_id", "text",
        Bpe.trainMerges(spark, docs, "text", rounds = 4, checkpoint = false))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(enc.toSeq == Seq((1L, 4L, 12L, 4L, 3.0), (2L, 2L, 2L, 2L, 1.0)))
  }

  test("weightedQuantilesPerGroup: lower weighted quantile over the value histogram") {
    import spark.implicits._
    import graft.operators.Ranking
    // A: (1,w1) (2,w3) (3,w1), W=5: median = 2 (cum 4·2 >= 5), p90 = 3
    // B: all weight on 7: every quantile = 7
    val df = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 2L, 1L), ("A", 3L, 1L),
      ("B", 7L, 4L), ("B", 5L, 0L)).toDF("g", "v", "w")
    val out = Ranking.weightedQuantilesPerGroup(df, "g", "v", "w",
        subBucket = expr("v DIV 2"), ps = Seq((1L, 2L), (9L, 10L)))
      .orderBy(col("g"), col("p")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq(("A", 0.5, 2L), ("A", 0.9, 3L),
      ("B", 0.5, 7L), ("B", 0.9, 7L)))
    // bucketing must not change the answer (two-level ≡ one-level)
    val coarse = Ranking.weightedQuantilesPerGroup(df, "g", "v", "w",
        subBucket = lit(0L), ps = Seq((1L, 2L), (9L, 10L)))
      .orderBy(col("g"), col("p")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(coarse.toSeq == out.toSeq)
    // negative weights are refused loudly, not silently mis-selected
    val bad = Seq(("A", 1L, -1L)).toDF("g", "v", "w")
    assertThrows[Exception] {
      Ranking.weightedQuantilesPerGroup(bad, "g", "v", "w", lit(0L),
        Seq((1L, 2L))).collect()
    }
  }

  test("temporalEmbargoSplit: exact boundaries, gap excluded from both sides") {
    import spark.implicits._
    import graft.operators.Sampling
    // range [0, 100]: train <= 70, embargo (70, 75], test > 75
    val df = Seq(0L, 50L, 70L, 71L, 75L, 76L, 100L).toDF("ts")
    val out = Sampling.temporalEmbargoSplit(df, "ts", 7L, 10L, 1L, 20L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(0L) == "train" && out(50L) == "train" && out(70L) == "train")
    assert(out(71L) == "embargo" && out(75L) == "embargo")
    assert(out(76L) == "test" && out(100L) == "test")
    // zero embargo: adjacent split, nothing dropped
    val none = Sampling.temporalEmbargoSplit(df, "ts", 7L, 10L, 0L, 1L)
      .collect().map(r => r.getString(1))
    assert(!none.contains("embargo"))
    // train + embargo must leave room for test
    assertThrows[IllegalArgumentException] {
      Sampling.temporalEmbargoSplit(df, "ts", 9L, 10L, 1L, 10L)
    }
  }

  test("maxCoverageSelect: greedy picks by marginal gain, ties by id, stops at saturation") {
    import spark.implicits._
    import graft.operators.Coverage
    // token universes: d1{a,b,c} d2{b,c,d,e} d3{a,e} d4{b,c}
    val docs = Seq((1L, "a b c"), (2L, "b c d e"), (3L, "a e"), (4L, "b c"))
      .toDF("doc_id", "text")
    val out = Coverage.maxCoverageSelect(spark, docs, "doc_id", "text",
        shingleLen = 1, rounds = 3, checkpoint = false)
      .orderBy(col("round")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // r1: d2 covers 4; r2: d1 and d3 both add {a} -> tie, d1 wins;
    // r3: nothing uncovered anywhere -> early stop at 2 picks
    assert(out.toSeq == Seq((1L, 2L, 4L, 4L), (2L, 1L, 1L, 5L)))
  }

  test("psiDrift: identical halves give zero terms; a shifted target shows positive PSI") {
    import spark.implicits._
    import graft.operators.Checks
    val ref = (1L to 400L).map(i => (i % 100, i)).toDF("v", "id")
    // identical distribution: pa = pb in every bin -> every term exactly 0
    val same = Checks.psiDrift(ref, ref.withColumn("id", col("id") + 1000L),
      "v", "id", expr("v DIV 10"), bins = 10).collect()
    assert(same.length == 10)
    assert(same.forall(_.getLong(3) == 0L))
    assert(same.map(_.getLong(1)).sum == 400L && same.map(_.getLong(2)).sum == 400L)
    // shifted target: mass moves to the top bins, PSI sum > 0
    val tgt = (1L to 400L).map(i => (50L + i % 50, i)).toDF("v", "id")
    val drift = Checks.psiDrift(ref, tgt, "v", "id", expr("v DIV 10"), bins = 10)
      .collect()
    assert(drift.map(_.getLong(3)).sum > 100000L, "a half-range shift is > 0.1 PSI")
    // bins with no target mass exist and stay finite (add-1 smoothing)
    assert(drift.exists(r => r.getLong(2) == 0L))
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

  test("Markov.transitionMatrix: counts, totals, truncating micro probabilities") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "A"))
      .toDF("user", "seq", "state")
    val m = graft.operators.Markov.transitionMatrix(ev, col("user"), col("state"),
        Seq(col("seq")))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(("A", "B")) == ((2L, 3L, 666666L))) // 2 of A's 3 exits; floor div
    assert(m(("A", "A")) == ((1L, 3L, 333333L)))
    assert(m(("B", "A")) == ((1L, 1L, 1000000L)))
    assert(m.size == 3) // first event per key contributes nothing
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

  test("Graph.ssspInt: weighted relaxation beats direct edge; rounds bound path length") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L), (3L, 4L, 2L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    def dists(rounds: Int): Map[Long, Long] =
      graft.operators.Graph.ssspInt(edges, "src", "dst", "w", seeds, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dists(1) == Map(1L -> 0L, 2L -> 5L, 3L -> 10L))         // direct only
    assert(dists(2) == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 12L)) // 1-2-3 relaxes
    assert(dists(3)(4L) == 8L)                                      // 1-2-3-4
    // negative weight refused in-plan
    val neg = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    intercept[Exception] {
      graft.operators.Graph.ssspInt(neg, "src", "dst", "w", seeds, 1).collect()
    }
  }

  test("Intervals.overlapCounts: closed endpoints, zero-overlap rows kept") {
    import spark.implicits._
    val a = Seq((1L, 0L, 10L), (2L, 20L, 30L), (3L, 100L, 110L))
      .toDF("id", "s", "e")
    val b = Seq((5L, 15L), (10L, 12L), (28L, 28L), (40L, 50L), (110L, 120L))
      .toDF("s", "e")
    val out = graft.operators.Intervals.overlapCounts(
        a, "id", "s", "e", b, "s", "e", v => shiftright(v, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 1L)) // [100,110] touches [110,120]
    // disjoint B: count 0, row still present
    val far = Seq((500L, 600L)).toDF("s", "e")
    val z = graft.operators.Intervals.overlapCounts(
        a, "id", "s", "e", far, "s", "e", v => shiftright(v, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(z == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
    // inverted interval: refused in-plan, not silently undercounted
    val bad = Seq((9L, 30L, 20L)).toDF("id", "s", "e")
    intercept[Exception] {
      graft.operators.Intervals.overlapCounts(
        bad, "id", "s", "e", far, "s", "e", v => shiftright(v, 4)).collect()
    }
  }

  test("Mmr.mmrSelect: round 1 is max relevance, round 2 trades against redundancy") {
    import spark.implicits._
    // query [1,0]; c1 nearly parallel to q, c2 redundant with c1, c3 diverse
    val items = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.98f, 0.19899748f)),   // rel ~.98
      (2L, Seq(0.95f, 0.31224990f)),   // rel ~.95, sim to c1 ~.993
      (3L, Seq(0.6f, -0.8f)))          // rel .60, sim to c1 ~.429
      .toDF("vec_id", "embedding")
    val out = graft.operators.Mmr.mmrSelect(spark, items, "vec_id", "embedding",
      queryId = 0L, k = 3).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    assert(out.forall(r => r.getLong(4) == r.getLong(2) - r.getLong(3)))
    assert(out(0).getLong(3) == 0L) // round 1 has no selected set
  }

  test("Tuning.lshThresholdSweep: planted dups at decile 10, survivor curve monotone") {
    val out = graft.operators.Tuning.lshThresholdSweep(
        docsWithDups, "doc_id", "text", shingleLen = 3, k = 16, bands = 4)
      .orderBy(col("decile")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDecile = out.map(t => t._1 -> t._2).toMap
    assert(byDecile(10L) == 3L) // {1,2,5} pairwise identical shingle sets
    // doc 3 is an 11/13 near-dup of each of {1,2,5}: banding surfaces all
    // three pairs, decile (11*10) DIV 13 = 8
    assert(byDecile(8L) == 3L)
    // survivor curve: bottom decile's n_pairs_ge equals the total pair count
    assert(out.head._3 == out.map(_._2).sum)
    assert(out.sliding(2).forall(w => w.size < 2 || w(0)._3 >= w(1)._3))
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

  test("PrefixJoin.jaccardSelfJoin: complete at the threshold, exact rational verify") {
    val out = graft.operators.PrefixJoin.jaccardSelfJoin(
        docsWithDups, "doc_id", "text", shingleLen = 3, tNum = 1L, tDen = 2L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // identical trio: inter = uni = 12 shingles; doc 3 is 11/13 vs each
    assert(out.keySet == Set((1L, 2L), (1L, 5L), (2L, 5L),
      (1L, 3L), (2L, 3L), (3L, 5L)))
    assert(out((1L, 2L)) == ((12L, 12L)))
    assert(out((1L, 3L)) == ((11L, 13L)))
    // threshold 1: only exact-set pairs survive
    val exact = graft.operators.PrefixJoin.jaccardSelfJoin(
        docsWithDups, "doc_id", "text", shingleLen = 3, tNum = 1L, tDen = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }

  test("Skyline.paretoFront2D: dominance pruned, duplicates and incomparables kept") {
    import spark.implicits._
    val pts = Seq((1L, 1L, 5L), (2L, 2L, 9L), (3L, 3L, 9L), (4L, 0L, 1L),
      (5L, 2L, 9L), (6L, 5L, 10L), (7L, 6L, 3L)).toDF("id", "x", "y")
    val front = graft.operators.Skyline.paretoFront2D(
        pts, "id", col("x"), col("y"), v => shiftright(v, 1))
      .collect().map(_.getLong(0)).toSet
    // 3 is beaten by 2 (shorter, same quality); 7 by 6; 5 duplicates 2 and
    // duplicates never dominate each other
    assert(front == Set(1L, 2L, 4L, 5L, 6L))
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

  test("Survival.kaplanMeier: censoring shapes the risk set, exact micro-nat terms") {
    import spark.implicits._
    val subjects = Seq(
      (1L, true), (1L, true), (1L, false),     // day 1: 2 events, 1 censored
      (2L, true),                              // day 2: 1 event
      (3L, false), (3L, false),                // day 3: censoring only (no row)
      (4L, true),                              // day 4: 1 event
      (5L, false), (5L, false), (5L, false))   // tail censoring
      .toDF("dur", "ev")
    val out = graft.operators.Survival.kaplanMeier(subjects, col("dur"), col("ev"))
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def term(n: Long, d: Long): Long =
      math.round(math.log((n - d).toDouble / n.toDouble) * 1e6)
    val t1 = term(10, 2); val t2 = term(7, 1); val t4 = term(4, 1)
    assert(out.toSeq == Seq(
      (1L, 10L, 2L, t1, t1),
      (2L, 7L, 1L, t2, t1 + t2),           // day-1 censor left the risk set
      (4L, 4L, 1L, t4, t1 + t2 + t4)))     // day-3 censors gone too
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

  test("Basket: lift from hand supports, precedence strict with ties to neither side") {
    import spark.implicits._
    import graft.operators.Basket
    // 4 sessions: {A,B} {A,B} {A} {B,C}; n=4, sA=3, sB=3, sAB=2
    val rows = Seq(
      (1L, "A", 10L), (1L, "B", 20L),
      (2L, "B", 5L), (2L, "A", 9L),
      (3L, "A", 1L),
      (4L, "B", 2L), (4L, "C", 2L)) // C ties B's first ts
      .toDF("s", "i", "t")
    val lift = Basket.coOccurrenceLift(rows, col("s"), col("i"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // lift(A,B) = 2*4/(3*3) = 8/9 -> 888888 micro
    assert(lift(("A", "B")) == ((2L, 3L, 3L, 4L, 888888L)))
    assert(lift(("B", "C")) == ((1L, 3L, 1L, 4L, 1333333L)))
    val prec = Basket.precedence(rows, col("s"), col("i"), col("t"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(prec(("A", "B")) == ((2L, 1L))) // session 1 A first, session 2 B first
    assert(prec(("B", "A")) == ((2L, 1L)))
    assert(prec(("B", "C")) == ((1L, 0L))) // tied firsts: neither side
    assert(prec(("C", "B")) == ((1L, 0L)))
  }

  test("keyness: add-half log-odds, B-absent terms finite, top-k order") {
    import spark.implicits._
    // corpus A: "x" dominant + shared "c"; corpus B: "y" only + shared "c"
    val a = Seq((1L, "x x x c")).toDF("id", "text")
    val b = Seq((2L, "y c c c")).toDF("id", "text")
    val out = graft.operators.Colloc.keyness(a, b, "text", k = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def lo(ca: Long, na: Long, cb: Long, nb: Long): Long =
      math.round((math.log((ca + 0.5) / (na - ca + 0.5)) -
        math.log((cb + 0.5) / (nb - cb + 0.5))) * 1e6)
    assert(out("x") == ((3L, 0L, lo(3, 4, 0, 4))))   // absent in B, finite
    assert(out("y") == ((0L, 1L, lo(0, 4, 1, 4))))
    assert(out("c") == ((1L, 3L, lo(1, 4, 3, 4))))
    assert(out("x")._3 > 0 && out("y")._3 < 0)
  }

  test("multiScaleSpanDedup: planted 70-token repeat dies at occ 2, idiom survives, hot chrome dies, single-scale ≡ spanDedup") {
    import spark.implicits._
    import graft.operators.Dedup
    val banner = (0 until 70).map(i => s"b$i").mkString(" ")
    val idiom = (0 until 8).map(i => s"i$i").mkString(" ")
    val chrome = (0 until 8).map(i => s"c$i").mkString(" ")
    def uniq(d: Long, n: Int) = (0 until n).map(i => s"u${d}_$i").mkString(" ")
    val docs = (
      // planted LONG repeat: doc 1 carries the banner first, doc 2 repeats it
      Seq(1L -> (uniq(1, 10) + " " + banner), 2L -> (banner + " " + uniq(2, 10))) ++
      // 8-token idiom in 10 docs — occ 10 < minOcc 50, must survive everywhere
      (10L until 20L).map(d => d -> (uniq(d, 4) + " " + idiom + " " + uniq(d + 1000, 4))) ++
      // 8-token chrome in 60 docs — occ 60 >= 50, all but the first cut
      (100L until 160L).map(d => d -> (uniq(d, 4) + " " + chrome))
    ).toDF("doc_id", "text")
    val out = Dedup.multiScaleSpanDedup(docs, "doc_id", "text",
        scales = Seq(8 -> 50L, 16 -> 8L, 64 -> 2L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the 64-scale covers the repeat's FULL 70-token extent in doc 2
    // (stride-1 duplicated windows union to the whole run)...
    assert(out(2L) == ((80L, 70L, uniq(2, 10))), s"got ${out(2L)}")
    // ...while keep-first leaves doc 1 verbatim
    assert(out(1L) == ((80L, 0L, uniq(1, 10) + " " + banner)))
    // mid-frequency idiom: below every scale's threshold, untouched
    (10L until 20L).foreach(d => assert(out(d)._2 == 0L, s"doc $d lost tokens"))
    // hot chrome: the least-id doc keeps it, the other 59 lose exactly it
    assert(out(100L)._2 == 0L && out(100L)._3.endsWith(chrome))
    (101L until 160L).foreach { d =>
      assert(out(d) == ((12L, 8L, uniq(d, 4))), s"doc $d: ${out(d)}")
    }
    // degenerate single scale at minOcc 2 is EXACTLY spanDedup
    val single = Dedup.multiScaleSpanDedup(docs, "doc_id", "text", scales = Seq(8 -> 2L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val span = Dedup.spanDedup(docs, "doc_id", "text", spanWords = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(single == span)
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

  test("benfordDeviation: string leading digit, full spine with zeros, non-positive exclusion, micro-term parity") {
    import spark.implicits._
    import graft.operators.Checks

    // leading digits: 1×4 (1, 19, 1000, 123), 9×2 (9, 987), 3×1 (30);
    // 0, -5, -9000 excluded -> N = 7; digits 2,4,5,6,7,8 are zero rows
    val vals = Seq(1L, 19L, 1000L, 123L, 9L, 987L, 30L, 0L, -5L, -9000L)
    val out = Checks.benfordDeviation(vals.toDF("v"), col("v")).collect()
    assert(out.length == 9 && out.map(_.getLong(0)).toSeq == (1L to 9L))
    val byDigit = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(byDigit(1)._1 == 4 && byDigit(9)._1 == 2 && byDigit(3)._1 == 1)
    assert((2 to 8).filterNot(_ == 3).forall(d => byDigit(d.toLong)._1 == 0))
    // micro-term parity with the driver-side IEEE chain
    for (d <- 1 to 9) {
      val p = math.log10(1.0 + 1.0 / d)
      val e = 7.0 * p
      val o = byDigit(d.toLong)._1.toDouble
      assert(byDigit(d.toLong)._2 == math.floor(e * 1e6).toLong, s"exp d=$d")
      assert(byDigit(d.toLong)._3 == math.floor((o - e) * (o - e) / e * 1e6).toLong,
        s"term d=$d")
    }
    // all-excluded input: spine survives with zero counts and NULL terms
    val none = Checks.benfordDeviation(Seq(-1L, 0L).toDF("v"), col("v")).collect()
    assert(none.length == 9 && none.forall(r =>
      r.getLong(1) == 0L && r.getLong(2) == 0L && r.isNullAt(3)))
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

  test("pageHinkley: brute sequential parity, planted drift alarms, constant series stays silent") {
    import spark.implicits._
    import graft.operators.Anomaly

    def brute(pts: Seq[(String, Long, Long)], mu0: Long, delta: Long,
              lambda: Long): Map[String, (Long, Long, Option[(Long, Long, Long)])] =
      pts.groupBy(_._1).map { case (g, rows) =>
        var m = 0L; var mn = 0L; var maxPh = 0L
        var alarm: Option[(Long, Long, Long)] = None
        var i = 0L
        rows.sortBy(_._2).foreach { case (_, t, y) =>
          i += 1
          m += 1000000L * y - (mu0 + delta)
          mn = if (i == 1L) m else math.min(mn, m)
          val ph = m - mn
          maxPh = math.max(maxPh, ph)
          if (alarm.isEmpty && ph > lambda) alarm = Some((i, t, ph))
        }
        g -> ((i, maxPh, alarm))
      }

    // group a: mean 10 for 12 steps then jumps to 30; group b constant 10
    val pts = (0L until 24L).map(t => ("a", t, if (t < 12) 10L else 30L)) ++
      (0L until 24L).map(t => ("b", t, 10L))
    val (mu0, delta, lambda) = (10000000L, 1000000L, 30000000L)
    val got = Anomaly.pageHinkley(pts.toDF("g", "t", "y"), "g", col("t"), col("y"),
        mu0, delta, lambda)
      .collect().map(r => r.getString(0) -> r).toMap
    val want = brute(pts, mu0, delta, lambda)
    for (g <- Seq("a", "b")) {
      assert(got(g).getLong(1) == want(g)._1 && got(g).getLong(2) == want(g)._2,
        s"$g: ${got(g)} vs ${want(g)}")
      want(g)._3 match {
        case Some((ai, as2, ap)) =>
          assert(got(g).getLong(3) == ai && got(g).getLong(4) == as2 &&
            got(g).getLong(5) == ap, s"$g alarm: ${got(g)} vs ${want(g)}")
        case None =>
          assert(got(g).isNullAt(3) && got(g).isNullAt(4) && got(g).isNullAt(5))
      }
    }
    // the planted drift fires shortly after step 12; the constant series never does
    assert(got("a").getLong(4) >= 12L && !got("a").isNullAt(3))
    assert(got("b").isNullAt(3))
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

  test("dsirSelect: brute hashed-unigram parity, target-alike docs outrank, zero-token docs never selected") {
    import spark.implicits._
    import graft.operators.Sampling

    val F = 64
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def toks(text: String): Seq[String] =
      text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").filter(_.nonEmpty).toSeq
    def roundHalfUp(x: Double): Long =
      java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue
    def brute(raw: Seq[(Long, String)], tgt: Seq[(Long, String)],
              k: Int): Seq[(Long, Long, Long)] = {
      def fs(text: String) = toks(text).map(w => h60("dsir:" + w) % F)
      val rc = raw.flatMap(d => fs(d._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tc = tgt.flatMap(d => fs(d._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (tr, tt) = (rc.values.sum, tc.values.sum)
      def q(f: Long): Long = roundHalfUp(math.log(
        ((tc.getOrElse(f, 0L) + 1).toDouble * (tr + F).toDouble) /
          ((rc.getOrElse(f, 0L) + 1).toDouble * (tt + F).toDouble)) * 1e6)
      raw.map { case (id, text) =>
        val h = fs(text).groupBy(identity).view.mapValues(_.size.toLong).toMap
        (id, h.values.sum, h.map { case (f, c) => c * q(f) }.sum)
      }.filter(_._2 > 0)
        .sortBy { case (id, _, w) => (-w, id) }.take(k)
    }

    // target speaks greek-letter vocab; half the raw pool does too
    val tgt = (1L to 20L).map(i => (i, "alpha beta gamma delta alpha"))
    val raw = (101L to 110L).map(i => (i, s"alpha beta gamma word$i")) ++
      (201L to 210L).map(i => (i, s"stock market ticker word$i")) ++
      Seq((301L, "   ")) // zero-token doc
    val got = Sampling.dsirSelect(raw.toDF("doc_id", "text"),
        tgt.toDF("doc_id", "text"), "doc_id", "text", features = F, k = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = brute(raw, tgt, 12)
    assert(got == want, s"got $got\nwant $want")
    // every greek-vocab doc outranks every ticker doc; 301 never appears
    val rankOf = got.map(_._1).zipWithIndex.toMap
    assert((101L to 110L).forall(g => (201L to 210L).forall(t =>
      rankOf(g) < rankOf.getOrElse(t, Int.MaxValue))))
    assert(!got.exists(_._1 == 301L))
  }

  test("semDedup: k=1 brute parity, planted dup groups keep the farthest-from-centroid member, survivor invariant") {
    import spark.implicits._
    import graft.operators.Similarity

    def quant(v: Seq[Double]): Seq[Long] = v.map(x => math.floor(x * 1e6 + 0.5).toLong)
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val (na, nb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    // two tight near-dup groups + two loners, 4-dim
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.00, 0.01, 0.0, 0.0), 2L -> Seq(0.99, 0.02, 0.0, 0.0),
      3L -> Seq(0.98, 0.00, 0.01, 0.0), // group A (cos ~ 1 pairwise)
      4L -> Seq(0.0, 1.00, 0.01, 0.0), 5L -> Seq(0.0, 0.98, 0.02, 0.0), // group B
      6L -> Seq(0.0, 0.0, 1.0, 0.0), 7L -> Seq(0.5, 0.5, 0.5, 0.5))
    val df = vecs.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")

    // brute for k=1, rounds=1: centroid = floor-div mean of ALL quantized
    def flDiv(s: Long, n: Long): Long = (s - ((s % n + n) % n)) / n
    val q = vecs.map { case (id, v) => id -> quant(v) }.toMap
    val n = vecs.size.toLong
    val cent = (0 until 4).map(d => flDiv(vecs.map(v => q(v._1)(d)).sum, n))
    def d2(id: Long): Long = q(id).zip(cent).map { case (x, c) => (x - c) * (x - c) }.sum
    val thr = 0.9
    val victims = (for {
      (a, _) <- vecs; (b, _) <- vecs if a < b && cos(q(a), q(b)) >= thr
    } yield if (d2(a) < d2(b)) a else if (d2(b) < d2(a)) b else math.max(a, b)).toSet
    val want = vecs.map(_._1).filterNot(victims).sorted

    val got = Similarity.semDedup(df, "vec_id", "embedding",
      k = 1, rounds = 1, threshold = thr).collect()
    assert(got.map(_.getLong(0)).toSeq == want, s"survivors: ${got.mkString(",")}")
    assert(got.forall(r => r.getLong(2) == d2(r.getLong(0))), "dist2 parity")
    // each planted group keeps exactly ONE member - its farthest-from-centroid
    val kept = got.map(_.getLong(0)).toSet
    assert(kept.intersect(Set(1L, 2L, 3L)).size == 1)
    assert(kept.intersect(Set(4L, 5L)).size == 1)
    assert(kept.contains(6L) && kept.contains(7L)) // loners always survive

    // invariant at k=2 on random data: no two same-cluster survivors are
    // above-threshold similar (every such pair produced a victim)
    val rnd = new scala.util.Random(241)
    val rv = (1L to 60L).map(i => (i,
      Array.fill(8)((rnd.nextDouble() - 0.5).toFloat)))
    val rdf = rv.toDF("vec_id", "embedding")
    val out = Similarity.semDedup(rdf, "vec_id", "embedding",
      k = 2, rounds = 2, threshold = 0.8).collect()
    val rq = rv.map { case (id, v) => id -> quant(v.map(_.toDouble).toSeq) }.toMap
    val byCluster = out.groupBy(_.getLong(1))
    for ((_, rows) <- byCluster; a <- rows; b <- rows
         if a.getLong(0) < b.getLong(0))
      assert(cos(rq(a.getLong(0)), rq(b.getLong(0))) < 0.8,
        s"survivors ${a.getLong(0)},${b.getLong(0)} still near-dup")
    assert(out.length <= 60 && out.nonEmpty)
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

  test("rakingWeights: brute IPF parity, marginals converge toward uniform, divisible case stays exactly flat") {
    import spark.implicits._
    import graft.operators.Sampling

    def brute(cells: Seq[(String, String, Long)], rounds: Int)
        : Map[(String, String), BigInt] = {
      val total = cells.map(c => BigInt(c._3)).sum
      val ks = cells.map(_._1).distinct.length
      val bs = cells.map(_._2).distinct.length
      val (tR, tC) = (total * 1000000 / ks, total * 1000000 / bs)
      val nOf = cells.map(c => (c._1, c._2) -> BigInt(c._3)).toMap
      var w = cells.map(c => (c._1, c._2) -> BigInt(1000000)).toMap
      for (_ <- 1 to rounds) {
        val rm = cells.groupBy(_._1).map { case (g, cs) =>
          g -> cs.map(c => nOf((c._1, c._2)) * w((c._1, c._2))).sum }
        w = w.map { case (k, x) => k -> (if (rm(k._1) > 0) x * tR / rm(k._1) else x) }
        val cm = cells.groupBy(_._2).map { case (b, cs) =>
          b -> cs.map(c => nOf((c._1, c._2)) * w((c._1, c._2))).sum }
        w = w.map { case (k, x) => k -> (if (cm(k._2) > 0) x * tC / cm(k._2) else x) }
      }
      w
    }
    // skewed 3x3: english dominates, long docs dominate
    val counts = Seq(("en", "0", 400L), ("en", "1", 200L), ("en", "2", 50L),
      ("de", "0", 80L), ("de", "1", 40L), ("de", "2", 10L),
      ("fr", "0", 30L), ("fr", "1", 15L), ("fr", "2", 5L))
    val rows = counts.flatMap { case (g, b, n) => Seq.fill(n.toInt)((g, b)) }
    val got = Sampling.rakingWeights(rows.toDF("lang", "bucket"),
      "lang", "bucket", rounds = 3).collect()
    val want = brute(counts, 3)
    assert(got.length == 9)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(BigInt(r.getLong(3)) == want(k), s"cell $k")
      assert(r.getLong(4) == (want(k) * counts.find(c => (c._1, c._2) == k).get._3).toLong)
    }
    // after the final column step, weighted column marginals sit within
    // floor error (< one micro-unit per row) of the uniform target
    val total = counts.map(_._3).sum
    val tC = BigInt(total) * 1000000 / 3
    val colM = got.groupBy(_.getString(1)).view.mapValues(
      _.map(r => BigInt(r.getLong(4))).sum)
    colM.foreach { case (b, m) =>
      val nb = counts.filter(_._2 == b).map(_._3).sum
      assert((m - tC).abs <= BigInt(nb), s"col $b marginal $m vs $tC") }
    // row marginals moved decisively toward uniform (en was 650/830)
    val tR = BigInt(total) * 1000000 / 3
    val rowM = got.groupBy(_.getString(0)).view.mapValues(
      _.map(r => BigInt(r.getLong(4))).sum)
    rowM.foreach { case (g, m) =>
      assert((BigDecimal(m) / BigDecimal(tR) - 1).abs < 0.02, s"row $g: $m vs $tR") }
    // exactly divisible uniform table: weights stay exactly 1e6
    val flat = (for (g <- Seq("a", "b"); b <- Seq("x", "y")) yield (g, b, 25L))
      .flatMap { case (g, b, n) => Seq.fill(n.toInt)((g, b)) }
    assert(Sampling.rakingWeights(flat.toDF("g", "b"), "g", "b", 2)
      .collect().forall(_.getLong(3) == 1000000L))
  }

  test("poissonBootstrapCi: brute draw-chain parity, CI covers the mean and narrows with n, weights average ~1") {
    import spark.implicits._
    import graft.operators.Sampling

    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val th = Sampling.poissonThresholds60
    def weight(u: Long): Long = th.count(u >= _).toLong
    def floorDiv(x: BigInt, d: BigInt): BigInt = (x - ((x % d + d) % d)) / d
    def brute(pts: Seq[(String, Long, Long)], b: Int, alphaPct: Int)
        : Map[String, (Long, Long, Option[Long], Option[Long], Long)] = {
      val lo = b * alphaPct / 100 / 2 + 1
      val hi = b - b * alphaPct / 100 / 2
      pts.groupBy(_._1).map { case (g, xs) =>
        val n = xs.size.toLong
        val mean = floorDiv(BigInt(1000000) * xs.map(x => BigInt(x._3)).sum, n).toLong
        val ms = (1 to b).flatMap { bi =>
          val ws = xs.map(x => (weight(h60(s"boot:$bi:${x._2}")), x._3))
          val sw = ws.map(_._1).sum
          if (sw > 0)
            Some(floorDiv(BigInt(1000000) * ws.map(w => BigInt(w._1) * w._2).sum,
              sw).toLong)
          else None
        }.sorted
        val (cl, ch) = if (ms.size >= 2 && lo <= ms.size && hi <= ms.size)
          (Some(ms(lo - 1)), Some(ms(hi - 1))) else (None, None)
        g -> ((n, mean, cl, ch, ms.size.toLong))
      }
    }
    val rnd = new scala.util.Random(263)
    // two cohorts around distinct means; big has 16x the rows of small
    val pts = (1L to 50L).map(i => ("small", i, 100L + rnd.nextInt(41) - 20L)) ++
      (1L to 800L).map(i => ("big", 1000L + i, 500L + rnd.nextInt(41) - 20L))
    val got = Sampling.poissonBootstrapCi(pts.toDF("g", "id", "y"),
      "g", col("id"), col("y"), b = 40, alphaPct = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))).toMap
    val want = brute(pts, 40, 10)
    assert(got == want, s"got $got\nwant $want")
    // CI brackets the point mean; wider cohort = the 16x-smaller one
    for ((g, (_, m, cl, ch, bu)) <- got) {
      assert(bu == 40L, s"$g all replicates present")
      assert(cl.get <= m && m <= ch.get, s"$g CI covers the mean")
    }
    val widthSmall = got("small")._4.get - got("small")._3.get
    val widthBig = got("big")._4.get - got("big")._3.get
    assert(widthSmall > 2L * widthBig,
      s"CI narrows with n: small $widthSmall vs big $widthBig")
    // deterministic Poisson(1) draws average ~1 over many (b, id) pairs
    val draws = for (bi <- 1 to 40; id <- 1L to 200L)
      yield weight(h60(s"boot:$bi:$id"))
    val avg = draws.sum.toDouble / draws.size
    assert(math.abs(avg - 1.0) < 0.03, s"Poisson(1) empirical mean $avg")
  }

  test("hoeffdingSplitScan: brute triangular parity, planted shift alarms near the change, calm series stays silent") {
    import spark.implicits._
    import graft.operators.Anomaly

    def brute(series: Seq[(String, Long, Long)], deltaInv: Long)
        : Map[String, (Long, Option[Long], Option[Long], Long)] = {
      series.groupBy(_._1).map { case (g, xs) =>
        val ys = xs.sortBy(_._2)
        val n = ys.size.toLong
        val pre = ys.map(x => BigInt(x._3)).scanLeft(BigInt(0))(_ + _).tail
        def lq(t: Long): Long =
          Math.round(math.log(4.0 * deltaInv * t.toDouble) * 1e6)
        val alarms = (2L to n).filter { t =>
          (1L until t).exists { i =>
            val ds = pre(i.toInt - 1) * (t - i) -
              (pre(t.toInt - 1) - pre(i.toInt - 1)) * i
            2 * ds * ds >= BigInt(1000000L) * lq(t) * t * i * (t - i)
          }
        }
        val first = alarms.headOption
        g -> ((n, first, first.map(t => ys(t.toInt - 1)._2), alarms.size.toLong))
      }
    }
    def run(series: Seq[(String, Long, Long)]) =
      Anomaly.hoeffdingSplitScan(series.toDF("g", "t", "y"), "g",
        col("t"), col("y")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4)))).toMap

    val rnd = new scala.util.Random(269)
    // "a": mean jumps 100k -> 900k at day 21 (a 0.8 jump - the Hoeffding
    // bound is conservative: it needs ~8 post-change steps to clear);
    // "b": calm around 500k
    val series = (1L to 40L).map(d => ("a", 100L + d,
        (if (d <= 20) 100000L else 900000L) + rnd.nextInt(20001) - 10000L)) ++
      (1L to 40L).map(d => ("b", 100L + d, 500000L + rnd.nextInt(20001) - 10000L))
    val got = run(series); val want = brute(series, 20L)
    assert(got == want, s"got $got\nwant $want")
    // the planted jump alarms once enough post-change mass accumulates
    val aFirst = got("a")._3.get
    assert(aFirst >= 121L && aFirst <= 136L, s"alarm at $aFirst")
    assert(got("b")._2.isEmpty && got("b")._4 == 0L, "calm series silent")
    // tiny-noise exchangeable series never clears the bound
    val calm = (1L to 60L).map(d => ("c", d, 300000L + (d % 7) * 100L))
    assert(run(calm)("c")._2.isEmpty)
    // a single-step group has no split pairs, but keeps its row
    assert(run(Seq(("solo", 5L, 42L))) ==
      Map("solo" -> ((1L, None, None, 0L))),
      "single-step group must keep its row")
    // maxSteps horizon: capped == uncapped while T <= cap, and a capped
    // long series == the uncapped scan over exactly its last cap steps
    def runCap(s: Seq[(String, Long, Long)], cap: Int) =
      Anomaly.hoeffdingSplitScan(s.toDF("g", "t", "y"), "g",
        col("t"), col("y"), maxSteps = cap).collect()
        .map(r => r.getString(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4)))).toMap
    assert(runCap(series, 100) == run(series),
      "cap above the horizon must be bit-equal")
    val recent = series.groupBy(_._1).flatMap {
      case (_, xs) => xs.sortBy(_._2).takeRight(15) }.toSeq
    assert(runCap(series, 15) == run(recent),
      "capped scan must equal the uncapped scan over the recent horizon")
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

  test("runsTest: brute parity, clumped series z << 0, alternating series z >> 0, degenerates") {
    import spark.implicits._
    import graft.operators.Anomaly

    def brute(pts: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long, Long, Option[Double])] = {
      pts.groupBy(_._1).map { case (g, xs) =>
        val sorted = xs.map(_._3).sorted
        val med = sorted(((xs.size + 1) / 2 - 1).toInt) // lower median
        val signs = xs.sortBy(_._2).map(_._3).filter(_ != med).map(_ > med)
        val n = signs.size.toLong
        val n1 = signs.count(identity).toLong
        val r = if (signs.isEmpty) 0L
          else 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
        val p2 = BigInt(2) * n1 * (n - n1)
        val z = if (n1 > 0 && n1 < n && n >= 2 && p2 > n)
          Some((BigInt(n) * (r - 1) - p2).toDouble /
            math.sqrt((p2 * (p2 - n)).toDouble / (n - 1).toDouble))
        else None
        g -> ((n, n1, n - n1, r, z))
      }
    }
    def run(pts: Seq[(String, Long, Long)]) =
      Anomaly.runsTest(pts.toDF("g", "t", "y"), "g", col("t"), col("y"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap

    val rnd = new scala.util.Random(281)
    // "clump": 25 low days then 25 high days (two runs); "alt":
    // strict alternation; "mix": random around the median
    val pts = (1L to 50L).map(d => ("clump", d, if (d <= 25) 10L + rnd.nextInt(3) else 100L + rnd.nextInt(3))) ++
      (1L to 50L).map(d => ("alt", d, if (d % 2 == 0) d else 1000L + d)) ++
      (1L to 50L).map(d => ("mix", d, rnd.nextInt(1000).toLong))
    val got = run(pts); val want = brute(pts)
    assert(got == want, s"got $got\nwant $want")
    assert(got("clump")._5.get < -5.0, s"clumped: ${got("clump")._5}")
    assert(got("alt")._5.get > 5.0, s"alternating: ${got("alt")._5}")
    assert(math.abs(got("mix")._5.get) < 3.0)
    // all values equal to the median: everything drops from the sign
    // sequence, but the one-row-per-group contract still holds
    val flat = (1L to 10L).map(d => ("f", d, 7L))
    assert(run(flat) == Map("f" -> ((0L, 0L, 0L, 0L, None))),
      s"degenerate group must keep its row: ${run(flat)}")
  }

  test("coxStuart: brute half-pairing parity incl. odd length, trend sign, tied pairs drop") {
    import spark.implicits._
    import graft.operators.Anomaly

    def brute(pts: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long, Option[Double])] = {
      pts.groupBy(_._1).map { case (g, xs) =>
        val ys = xs.sortBy(_._2).map(_._3)
        val n = ys.size
        val shift = (n + 1) / 2
        val pairs = (0 until n / 2).map(i => (ys(i), ys(i + shift)))
        val up = pairs.count(p => p._2 > p._1).toLong
        val down = pairs.count(p => p._2 < p._1).toLong
        val z = if (up + down > 0)
          Some((2L * up - (up + down)).toDouble / math.sqrt((up + down).toDouble))
        else None
        g -> ((pairs.size.toLong, up, down, z))
      }
    }
    def run(pts: Seq[(String, Long, Long)]) =
      Anomaly.coxStuart(pts.toDF("g", "t", "y"), "g", col("t"), col("y"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap

    val rnd = new scala.util.Random(283)
    // "up": steady climb; "down": decline; "odd": 21 steps (middle drops)
    val pts = (1L to 30L).map(d => ("up", d, d * 10L + rnd.nextInt(5))) ++
      (1L to 30L).map(d => ("down", d, 1000L - d * 7L + rnd.nextInt(3))) ++
      (1L to 21L).map(d => ("odd", d, d + rnd.nextInt(2).toLong))
    val got = run(pts); val want = brute(pts)
    assert(got == want, s"got $got\nwant $want")
    assert(got("up")._4.get > 3.0 && got("down")._4.get < -3.0)
    assert(got("odd")._1 == 10L, "odd length: middle element drops")
    // constant series: every pair ties -> z NULL
    val const = (1L to 12L).map(d => ("c", d, 5L))
    assert(run(const)("c")._4.isEmpty && run(const)("c")._1 == 6L)
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

  test("persisted rotated-PQ lifecycle: probe equals in-memory pqRotatedTopK, frozen-model append identity") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(307)
    val corpus = (1L to 70L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val queries = (1L to 5L).map(i =>
      (i * 100, Array.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val direct = Similarity.pqRotatedTopK(queries, corpus, "vec_id", "embedding",
        k = 5, m = 2, ksub = 3, rounds = 2, seed = 42L)
      .collect().map(_.toString).toSeq.sorted
    val dirTmp = java.nio.file.Files.createTempDirectory("graft_rpq_life").toString
    val (books, codes) = Similarity.pqRotatedIndexBuild(
      corpus, "vec_id", "embedding", m = 2, ksub = 3, rounds = 2, seed = 42L)
    books.write.parquet(s"$dirTmp/books"); codes.write.parquet(s"$dirTmp/codes")
    val served = Similarity.pqRotatedProbeTopK(queries,
        spark.read.parquet(s"$dirTmp/books"), spark.read.parquet(s"$dirTmp/codes"),
        "vec_id", "embedding", k = 5, seed = 42L)
      .collect().map(_.toString).toSeq.sorted
    assert(served == direct, s"persisted probe must equal in-memory:\n$served\n$direct")
    // frozen-model append: codes for a batch equal build-time codes for
    // the same rows (same seed => same rotation => same argmins)
    val appended = Similarity.pqRotatedIndexAppend(
        corpus.where(col("vec_id") <= 10), spark.read.parquet(s"$dirTmp/books"),
        "vec_id", "embedding", seed = 42L)
      .collect().map(_.toString).toSet
    assert(appended == codes.where(col("id") <= 10).collect().map(_.toString).toSet)
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

  test("cusumChangepoint: planted mean shift found exactly, earliest-step tie-break, negative-mean floor, single-step group absent") {
    import spark.implicits._
    import graft.operators.Anomaly

    // planted shift: 10 days at 5, then 10 days at 50 -> split at day 10
    val shift = (1L to 10L).map(d => ("a", d, 5L)) ++
      (11L to 20L).map(d => ("a", d, 50L))
    // constant series: every split ties at stat 0 -> earliest day wins
    val const = (1L to 6L).map(d => ("b", d, 7L))
    // negative values: mean_before = -5/2 -> floor -2500000 micro
    val neg = Seq(("c", 1L, -2L), ("c", 2L, -3L), ("c", 3L, 100L))
    val lone = Seq(("d", 9L, 1L))
    val got = Anomaly.cusumChangepoint(
      (shift ++ const ++ neg ++ lone).toDF("g", "t", "y"),
      "g", col("t"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(!got.contains("d"), "single-step group has no proper split")
    val a = got("a")
    assert(a.getLong(2) == 10L && a.getLong(3) == 10L)
    // stat at the true split: |20*50 - 10*550| = 4500
    assert(a.getDouble(4) == 4500.0)
    assert(a.getLong(5) == 5000000L && a.getLong(6) == 50000000L)
    val b = got("b")
    assert(b.getDouble(4) == 0.0 && b.getLong(2) == 1L,
      "all-tied stats must break to the earliest step")
    val c = got("c")
    // brute argmax over i=1: |3*(-2) - 1*95| = 101; i=2: |3*(-5) - 2*95| = 205
    assert(c.getLong(3) == 2L && c.getDouble(4) == 205.0)
    assert(c.getLong(5) == -2500000L, "negative mean must floor, not truncate")
    assert(c.getLong(6) == 100000000L)
  }

  test("conformalThreshold: hand rank arithmetic, finite-sample +1, infeasible group NULL, tie insensitivity") {
    import spark.implicits._
    import graft.operators.Ranking

    // group g1: n=19 scores 1..19, alpha=1/10 -> k = ceil(20*9/10) = 18
    // group g2: n=4 -> k = ceil(5*9/10) = 5 > 4 -> NULL threshold
    // group g3: n=10 with heavy ties -> k = ceil(11*9/10) = 10
    val rows =
      (1L to 19L).map(v => ("g1", v * 100, v)) ++
      (1L to 4L).map(v => ("g2", v + 1000, v)) ++
      (1L to 10L).map(v => ("g3", v + 2000, if (v <= 8) 5L else 9L))
    val got = Ranking.conformalThreshold(
      rows.toDF("g", "id", "v"), "g", "v",
      subBucket = expr("v DIV 4"), idCol = "id",
      alphaNum = 1L, alphaDen = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got("g1") == ((19L, 18L, 18L)))
    assert(got("g2") == ((4L, 5L, -1L)), "k > n must report NULL, not clamp")
    assert(got("g3") == ((10L, 10L, 9L)))
    // alpha = 1/2 on n=3: k = ceil(4*1/2) = 2 -> the middle value
    val med = Ranking.conformalThreshold(
      Seq(("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 20L)).toDF("g", "id", "v"),
      "g", "v", subBucket = lit(0L), idCol = "id",
      alphaNum = 1L, alphaDen = 2L).collect()(0)
    assert(med.getLong(1) == 3L && med.getLong(2) == 2L && med.getLong(3) == 20L)
  }

  test("jensenShannon: zero on identical corpora, symmetric, bounded by ln 2, brute micro parity") {
    import spark.implicits._
    import graft.operators.LmScore

    def jsd(a: Seq[String], b: Seq[String]): org.apache.spark.sql.Row =
      LmScore.jensenShannon(a.toDF("text"), b.toDF("text"), "text").collect()(0)

    // identical corpora: every mixture ratio is exactly 1 -> all-zero
    val same = jsd(Seq("x y z x", "y y"), Seq("x y z x", "y y"))
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0 &&
      same.getDouble(5) == 0.0)

    // brute parity: replicate the exact micro-nat chain in Scala
    val aToks = Seq("a", "a", "a", "b"); val bToks = Seq("b", "b", "c")
    val got = jsd(Seq(aToks.mkString(" ")), Seq(bToks.mkString(" ")))
    val vocab = (aToks ++ bToks).distinct
    val (ta, tb, v) = (aToks.size.toLong, bToks.size.toLong, vocab.size.toLong)
    val terms = vocab.map { w =>
      val ca = aToks.count(_ == w).toLong; val cb = bToks.count(_ == w).toLong
      val pa = (ca + 1).toDouble * (tb + v).toDouble
      val pb = (cb + 1).toDouble * (ta + v).toDouble
      val qa = math.round(math.log(2.0 * pa / (pa + pb)) * 1e6)
      val qb = math.round(math.log(2.0 * pb / (pa + pb)) * 1e6)
      ((ca + 1) * qa, (cb + 1) * qb)
    }
    val sa = terms.map(_._1).sum; val sb = terms.map(_._2).sum
    assert(got.getLong(0) == ta && got.getLong(1) == tb && got.getLong(2) == v)
    assert(got.getDouble(3) == sa.toDouble && got.getDouble(4) == sb.toDouble)
    assert(got.getDouble(5) ==
      0.5 * (sa.toDouble / ((ta + v).toDouble * 1e6) +
        sb.toDouble / ((tb + v).toDouble * 1e6)))

    // symmetric: swapping corpora swaps the unat sums, jsd identical
    val rev = jsd(Seq(bToks.mkString(" ")), Seq(aToks.mkString(" ")))
    assert(rev.getDouble(3) == got.getDouble(4) &&
      rev.getDouble(4) == got.getDouble(3) &&
      rev.getDouble(5) == got.getDouble(5))

    // disjoint corpora approach the ln 2 bound from below (smoothing
    // keeps them strictly inside)
    val far = jsd(Seq(Seq.fill(200)("aa").mkString(" ")),
      Seq(Seq.fill(200)("zz").mkString(" ")))
    assert(far.getDouble(5) > 0.5 && far.getDouble(5) < math.log(2.0))
  }

  test("kmeansExact: brute-force Lloyd parity, smallest-cluster tie-break, empty-cluster carry, floor-mean semantics") {
    import spark.implicits._
    import graft.operators.Similarity

    def brute(pts: Seq[(Long, Seq[Long])], k: Int, rounds: Int)
        : (Map[Int, Seq[Long]], Map[Int, Long]) = {
      var cents: Seq[(Int, Seq[Long])] = pts.sortBy(_._1).take(k)
        .zipWithIndex.map { case ((_, v), i) => (i + 1, v) }
      def assign(v: Seq[Long]): Int = cents.minBy { case (c, w) =>
        (v.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }._1
      for (_ <- 1 to rounds) {
        val groups = pts.groupBy(p => assign(p._2))
        cents = cents.map { case (c, old) =>
          groups.get(c).fold((c, old)) { g =>
            (c, old.indices.map(d =>
              Math.floorDiv(g.map(_._2(d)).sum, g.size.toLong)))
          }
        }
      }
      val fin = pts.groupBy(p => assign(p._2)).map { case (c, g) => (c, g.size.toLong) }
      (cents.toMap, fin.toMap)
    }
    def run(pts: Seq[(Long, Seq[Long])], k: Int, rounds: Int): Unit = {
      val df = pts.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
        .toDF("vec_id", "embedding")
      val out = Similarity.kmeansExact(df, "vec_id", "embedding", k, rounds,
        quantScale = 1L).collect()
      val (wc, wn) = brute(pts, k, rounds)
      val gotC = out.groupBy(_.getLong(0).toInt).map { case (c, rows) =>
        c -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
      val gotN = out.map(r => r.getLong(0).toInt -> r.getLong(3)).toMap
      assert(gotC == wc, s"centroids: got $gotC want $wc")
      assert(gotN == wc.keys.map(c => c -> wn.getOrElse(c, 0L)).toMap)
    }

    // duplicate seed vectors: cluster 2 never wins a tie (struct-min
    // breaks to the smaller id) -> stays empty, carries its centroid
    run(Seq(1L -> Seq(0L, 0L), 2L -> Seq(0L, 0L),
      3L -> Seq(10L, 10L), 4L -> Seq(12L, 12L)), k = 3, rounds = 2)
    // floor semantics on a negative mean: (-1 + -2) / 2 -> -2, not -1
    run(Seq(1L -> Seq(-1L, 5L), 2L -> Seq(-2L, 5L), 3L -> Seq(100L, 5L)),
      k = 2, rounds = 1)
    // larger random config, 3 rounds, 4 clusters, 5 dims
    val rnd = new scala.util.Random(31)
    run((1L to 60L).map(i =>
      i -> Seq.fill(5)((rnd.nextInt(2000) - 1000).toLong)), k = 4, rounds = 3)
  }

  test("pqTopK: brute PQ pipeline parity, ksub=n degenerates to exact L2 top-k, dim guard") {
    import spark.implicits._
    import graft.operators.Similarity

    def lloyd(pts: Seq[(Long, Seq[Long])], k: Int, rounds: Int): Seq[(Int, Seq[Long])] = {
      var cents: Seq[(Int, Seq[Long])] = pts.sortBy(_._1).take(k)
        .zipWithIndex.map { case ((_, v), i) => (i + 1, v) }
      def assign(v: Seq[Long]): Int = cents.minBy { case (c, w) =>
        (v.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum, c) }._1
      for (_ <- 1 to rounds) {
        val g = pts.groupBy(p => assign(p._2))
        cents = cents.map { case (c, old) =>
          g.get(c).fold((c, old)) { grp =>
            (c, old.indices.map(d =>
              Math.floorDiv(grp.map(_._2(d)).sum, grp.size.toLong)))
          }
        }
      }
      cents
    }
    def brutePq(pts: Seq[(Long, Seq[Long])], qids: Set[Long], k: Int,
                m: Int, ksub: Int, rounds: Int): Seq[(Long, Long, Long, Long)] = {
      val dsub = pts.head._2.length / m
      val books = (0 until m).map(j =>
        lloyd(pts.map { case (id, v) => (id, v.slice(j * dsub, (j + 1) * dsub)) },
          ksub, rounds))
      def assign(b: Seq[(Int, Seq[Long])], v: Seq[Long]): Int =
        b.minBy { case (c, w) =>
          (v.zip(w).map { case (a, x) => (a - x) * (a - x) }.sum, c) }._1
      val codes = pts.map { case (id, v) =>
        id -> (0 until m).map(j => assign(books(j), v.slice(j * dsub, (j + 1) * dsub))) }
      pts.filter(p => qids(p._1)).flatMap { case (qid, qv) =>
        val dt = (0 until m).map { j =>
          books(j).map { case (c, w) =>
            c -> qv.slice(j * dsub, (j + 1) * dsub).zip(w)
              .map { case (a, b) => (a - b) * (a - b) }.sum }.toMap
        }
        codes.map { case (nid, cs) =>
          (nid, (0 until m).map(j => dt(j)(cs(j))).sum) }
          .sortBy { case (nid, d) => (d, nid) }.take(k).zipWithIndex
          .map { case ((nid, d), i) => (qid, i + 1L, nid, d) }
      }
    }
    val rnd = new scala.util.Random(71)
    val pts = (1L to 50L).map(i => (i, Seq.fill(8)((rnd.nextInt(200) - 100).toLong)))
    val df = pts.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") % 10 === 0)
    val got = Similarity.pqTopK(queries, df, "vec_id", "embedding",
        k = 5, m = 2, ksub = 3, rounds = 2, quantScale = 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).toSeq
      .sortBy(t => (t._1, t._2))
    val want = brutePq(pts, pts.map(_._1).filter(_ % 10 == 0).toSet,
      k = 5, m = 2, ksub = 3, rounds = 2).sortBy(t => (t._1, t._2))
    assert(got == want, s"PQ pipeline parity:\n$got\n$want")

    // ksub = n: every point is its own codeword after enough rounds on
    // distinct seeds -> ADC == true squared L2, PQ == exact top-k
    val tiny = Seq(1L -> Seq(0L, 0L), 2L -> Seq(4L, 0L), 3L -> Seq(0L, 5L),
      4L -> Seq(9L, 9L))
    val tdf = tiny.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
    val exact = Similarity.pqTopK(tdf, tdf, "vec_id", "embedding",
        k = 4, m = 1, ksub = 4, rounds = 1, quantScale = 1L)
      .collect().map(r => ((r.getLong(0), r.getInt(1).toLong), (r.getLong(2), r.getLong(3)))).toMap
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for ((qid, qv) <- tiny) {
      val sorted = tiny.map { case (nid, nv) => (nid, d2(qv, nv)) }
        .sortBy { case (nid, d) => (d, nid) }
      sorted.zipWithIndex.foreach { case ((nid, d), i) =>
        assert(exact((qid, i + 1L)) == ((nid, d)), s"q$qid rank ${i + 1}") }
    }
    // dim not divisible by m is rejected loudly
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(tdf, tdf, "vec_id", "embedding",
        k = 1, m = 3, ksub = 2, rounds = 1)
    }
  }

  test("ivfPqTopK: brute residual pipeline parity, probe restriction real, probes=nCoarse covers all buckets") {
    import spark.implicits._
    import graft.operators.Similarity

    def lloyd(pts: Seq[(Long, Seq[Long])], k: Int, rounds: Int): Seq[(Int, Seq[Long])] = {
      var cents: Seq[(Int, Seq[Long])] = pts.sortBy(_._1).take(k)
        .zipWithIndex.map { case ((_, v), i) => (i + 1, v) }
      def assign(v: Seq[Long]): Int = cents.minBy { case (c, w) =>
        (v.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum, c) }._1
      for (_ <- 1 to rounds) {
        val g = pts.groupBy(p => assign(p._2))
        cents = cents.map { case (c, old) =>
          g.get(c).fold((c, old)) { grp =>
            (c, old.indices.map(d =>
              Math.floorDiv(grp.map(_._2(d)).sum, grp.size.toLong)))
          }
        }
      }
      cents
    }
    def assignTo(b: Seq[(Int, Seq[Long])], v: Seq[Long]): Int =
      b.minBy { case (c, w) =>
        (v.zip(w).map { case (a, x) => (a - x) * (a - x) }.sum, c) }._1
    def brute(pts: Seq[(Long, Seq[Long])], qids: Set[Long], k: Int,
              nCoarse: Int, probes: Int, m: Int, ksub: Int, rounds: Int)
        : Seq[(Long, Long, Long, Long)] = {
      val dsub = pts.head._2.length / m
      val coarse = lloyd(pts, nCoarse, rounds)
      val cMap = coarse.toMap
      val res = pts.map { case (id, v) =>
        val c = assignTo(coarse, v)
        (id, c, v.zip(cMap(c)).map { case (a, b) => a - b }) }
      val books = (0 until m).map(j =>
        lloyd(res.map { case (id, _, r) => (id, r.slice(j * dsub, (j + 1) * dsub)) },
          ksub, rounds))
      val codes = res.map { case (id, c, r) =>
        (id, c, (0 until m).map(j => assignTo(books(j), r.slice(j * dsub, (j + 1) * dsub)))) }
      pts.filter(p => qids(p._1)).flatMap { case (qid, qv) =>
        val pl = coarse.map { case (c, w) =>
          (c, qv.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum) }
          .sortBy { case (c, d) => (d, c) }.take(probes).map(_._1).toSet
        val dt = pl.map { bc =>
          val qr = qv.zip(cMap(bc)).map { case (a, b) => a - b }
          bc -> (0 until m).map { j =>
            books(j).map { case (c, w) =>
              c -> qr.slice(j * dsub, (j + 1) * dsub).zip(w)
                .map { case (a, b) => (a - b) * (a - b) }.sum }.toMap
          }
        }.toMap
        codes.filter(x => pl(x._2)).map { case (nid, bc, cs) =>
          (nid, (0 until m).map(j => dt(bc)(j)(cs(j))).sum) }
          .sortBy { case (nid, d) => (d, nid) }.take(k).zipWithIndex
          .map { case ((nid, d), i) => (qid, i + 1L, nid, d) }
      }
    }
    val rnd = new scala.util.Random(83)
    val pts = (1L to 60L).map(i => (i, Seq.fill(8)((rnd.nextInt(200) - 100).toLong)))
    val df = pts.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") % 12 === 0)
    def run(probes: Int) = Similarity.ivfPqTopK(queries, df, "vec_id", "embedding",
        k = 5, nCoarse = 4, probes = probes, m = 2, ksub = 3, rounds = 2,
        quantScale = 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).toSeq
      .sortBy(t => (t._1, t._2))
    val qids = pts.map(_._1).filter(_ % 12 == 0).toSet
    assert(run(2) == brute(pts, qids, 5, 4, 2, 2, 3, 2).sortBy(t => (t._1, t._2)),
      "IVF-PQ residual pipeline parity (probes = 2)")
    // probes = nCoarse covers every bucket == flat residual-PQ ranking,
    // and the probe restriction is real: the brute model confirms the
    // probes=2 candidate pool is a strict subset of the full corpus
    assert(run(4) == brute(pts, qids, 5, 4, 4, 2, 3, 2).sortBy(t => (t._1, t._2)))
  }

  test("ivfPq persisted lifecycle: table round-trip is lossless vs the in-memory pipeline") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(131)
    val pts = (1L to 50L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val queries = pts.where(col("vec_id") % 10 === 0)
    // one-shot in-memory pipeline (train on ALL rows)
    val direct = Similarity.ivfPqTopK(queries, pts, "vec_id", "embedding",
        k = 5, nCoarse = 4, probes = 2, m = 2, ksub = 3, rounds = 2)
      .collect().map(_.toString).toSeq.sorted
    // persisted: build on all rows, round-trip through parquet, probe
    val dirTmp = java.nio.file.Files.createTempDirectory("graft_pq_life").toString
    val (cent, books, codes) = Similarity.ivfPqIndexBuild(
      pts, "vec_id", "embedding", nCoarse = 4, m = 2, ksub = 3, rounds = 2)
    cent.write.parquet(s"$dirTmp/cent"); books.write.parquet(s"$dirTmp/books")
    graft.sources.Tables.writePartitioned(codes, s"$dirTmp/codes", "cluster")
    val served = Similarity.ivfPqProbeTopK(queries,
        spark.read.parquet(s"$dirTmp/cent"), spark.read.parquet(s"$dirTmp/books"),
        spark.read.parquet(s"$dirTmp/codes"), "vec_id", "embedding",
        k = 5, probes = 2)
      .collect().map(_.toString).toSeq.sorted
    assert(served == direct, s"persisted probe must equal the in-memory pipeline:\n$served\n$direct")
    // append path: codes for a batch against the frozen models equal the
    // build-time codes for the same rows (frozen model => same argmins)
    val appended = Similarity.ivfPqIndexAppend(
        pts.where(col("vec_id") <= 10), spark.read.parquet(s"$dirTmp/cent"),
        spark.read.parquet(s"$dirTmp/books"), "vec_id", "embedding")
      .collect().map(_.toString).toSet
    val builtSubset = codes.where(col("id") <= 10)
      .collect().map(_.toString).toSet
    assert(appended == builtSubset)
  }

  test("kmeans/quality/IVF broadcast fallback above the plan-literal budget: bit-identical to the literal path") {
    import spark.implicits._
    import graft.operators.Similarity
    // Forcing planLiteralBudget = 0 routes every centroid site (round
    // assignment, final sizes, quality top-2, IVF probe list) through
    // the one-broadcast-row array encoding; results must be IDENTICAL
    // rows — same integers, same struct order, same tie-breaks.
    val rnd = new scala.util.Random(97)
    val corpus = (1L to 80L).map(i =>
      (i, Array.fill(6)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val queries = (1L to 5L).map(i =>
      (i * 100, Array.fill(6)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    def all(): (Seq[String], Seq[String], Seq[String]) = (
      Similarity.kmeansExact(corpus, "vec_id", "embedding", k = 4, rounds = 3)
        .collect().map(_.toString).toSeq,
      Similarity.kmeansQuality(corpus, "vec_id", "embedding", k = 4, rounds = 2)
        .collect().map(_.toString).toSeq,
      Similarity.ivfExactTopK(queries, corpus, "vec_id", "embedding",
          k = 3, nCentroids = 4, rounds = 2, probes = 2)
        .collect().map(_.toString).toSeq)
    val literal = all()
    val fallback = Similarity.withPlanLiteralBudget(0L)(all())
    assert(fallback == literal,
      s"fallback must match literal path:\n$fallback\n$literal")
    // and the default budget genuinely keeps small models on the
    // codegen literal path (k·dim = 24 here)
    assert(4L * 6L <= Similarity.planLiteralBudget)
  }

  test("PQ/IVF-PQ budget fallbacks (codebook-in-data + shuffle-join dtab): bit-identical to the literal/broadcast path") {
    import spark.implicits._
    import graft.operators.Similarity
    // Forcing planLiteralBudget = 0 routes the centroid-residual lookup
    // and the ADC distance-table construction through the broadcast
    // model-table encodings; forcing broadcastRowBudget = 0 drops the
    // broadcast hint on every dtab/probe candidate join (shuffle join on
    // the same keys). Results must be IDENTICAL rows in all four
    // combinations — same integers, same tie-breaks.
    val rnd = new scala.util.Random(211)
    val corpus = (1L to 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val queries = (1L to 4L).map(i =>
      (i * 100, Array.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    def all(): Seq[Seq[String]] = {
      val pq = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
          k = 4, m = 2, ksub = 3, rounds = 2)
        .collect().map(_.toString).toSeq.sorted
      val ivfpq = Similarity.ivfPqTopK(queries, corpus, "vec_id", "embedding",
          k = 4, nCoarse = 3, probes = 2, m = 2, ksub = 3, rounds = 2)
        .collect().map(_.toString).toSeq.sorted
      val dirTmp = java.nio.file.Files.createTempDirectory("graft_pq_fb").toString
      val (cent, books, codes) = Similarity.ivfPqIndexBuild(
        corpus, "vec_id", "embedding", nCoarse = 3, m = 2, ksub = 3, rounds = 2)
      cent.write.parquet(s"$dirTmp/cent"); books.write.parquet(s"$dirTmp/books")
      graft.sources.Tables.writePartitioned(codes, s"$dirTmp/codes", "cluster")
      val served = Similarity.ivfPqProbeTopK(queries,
          spark.read.parquet(s"$dirTmp/cent"), spark.read.parquet(s"$dirTmp/books"),
          spark.read.parquet(s"$dirTmp/codes"), "vec_id", "embedding",
          k = 4, probes = 2)
        .collect().map(_.toString).toSeq.sorted
      val appended = Similarity.ivfPqIndexAppend(
          corpus.where(col("vec_id") <= 10), spark.read.parquet(s"$dirTmp/cent"),
          spark.read.parquet(s"$dirTmp/books"), "vec_id", "embedding")
        .collect().map(_.toString).toSeq.sorted
      Seq(pq, ivfpq, served, appended)
    }
    val base = all()
    val smallPlan = Similarity.withPlanLiteralBudget(0L)(all())
    assert(smallPlan == base, "codebook-in-data fallback must match literal path")
    val noBcast = Similarity.withBroadcastRowBudget(0L)(all())
    assert(noBcast == base, "shuffle-join dtab must match broadcast path")
    val both = Similarity.withPlanLiteralBudget(0L)(
      Similarity.withBroadcastRowBudget(0L)(all()))
    assert(both == base, "combined fallbacks must match")
    // default budgets keep the tiny gate configs on the fast path:
    // m·ksub·dsub = 2·3·4 = 24 literals, dtab ≤ |Q|·probes·m·ksub = 48 rows
    assert(24L <= Similarity.planLiteralBudget && 48L <= Similarity.broadcastRowBudget)
  }

  test("pqRotatedTopK: Hadamard rotation exact algebra (orthogonal times d), budget fallback parity") {
    import spark.implicits._
    import graft.operators.Similarity
    val dim = 8
    val hd = Similarity.hadamardSigns(dim, 7L)
    // rows of H·D are ±1, pairwise orthogonal, self-dot = dim
    for (i <- 0 until dim; k <- 0 until dim) {
      val dot = (0 until dim).map(j => hd(i)(j) * hd(k)(j)).sum
      assert(dot == (if (i == k) dim.toLong else 0L), s"($i,$k) -> $dot")
    }
    assert(hd.flatten.forall(v => v == 1L || v == -1L))
    // rotating integer vectors scales EVERY squared distance by exactly
    // dim — the rank-preservation argument, checked literally
    val rnd = new scala.util.Random(13)
    def rot(x: Array[Long]) = (0 until dim).map(i =>
      (0 until dim).map(j => hd(i)(j) * x(j)).sum).toArray
    for (_ <- 1 to 20) {
      val x = Array.fill(dim)(rnd.nextInt(2000000).toLong - 1000000)
      val y = Array.fill(dim)(rnd.nextInt(2000000).toLong - 1000000)
      val d0 = x.zip(y).map { case (a, b) => BigInt(a - b) * (a - b) }.sum
      val d1 = rot(x).zip(rot(y)).map { case (a, b) => BigInt(a - b) * (a - b) }.sum
      assert(d1 == d0 * dim)
    }
    // full pipeline: default path == everything-through-the-fallbacks
    // path (rotation matrix, codebooks, dtab all in data/broadcast form)
    val corpus = (1L to 50L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val queries = (1L to 4L).map(i =>
      (i * 100, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    def run(): Seq[String] = Similarity.pqRotatedTopK(queries, corpus,
        "vec_id", "embedding", k = 5, m = 2, ksub = 3, rounds = 2, seed = 42L)
      .collect().map(_.toString).toSeq.sorted
    val base = run()
    val fb = Similarity.withPlanLiteralBudget(0L)(
      Similarity.withBroadcastRowBudget(0L)(run()))
    assert(fb == base, s"fallback must match literal path:\n$fb\n$base")
    assert(base.nonEmpty && base.length == 4 * 5)
  }

  test("ivfExactTopK: brute pipeline parity, probe restriction is real (missed far neighbor), deterministic ties") {
    import spark.implicits._
    import graft.operators.Similarity

    def lloyd(pts: Seq[(Long, Seq[Long])], k: Int, rounds: Int): Seq[(Int, Seq[Long])] = {
      var cents: Seq[(Int, Seq[Long])] = pts.sortBy(_._1).take(k)
        .zipWithIndex.map { case ((_, v), i) => (i + 1, v) }
      def assign(v: Seq[Long]): Int = cents.minBy { case (c, w) =>
        (v.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum, c) }._1
      for (_ <- 1 to rounds) {
        val g = pts.groupBy(p => assign(p._2))
        cents = cents.map { case (c, old) =>
          g.get(c).fold((c, old)) { m =>
            (c, old.indices.map(d => Math.floorDiv(m.map(_._2(d)).sum, m.size.toLong)))
          }
        }
      }
      cents
    }
    def brute(pts: Seq[(Long, Seq[Long])], qids: Seq[Long], k: Int,
              nc: Int, rounds: Int, probes: Int): Seq[(Long, Int, Long, Long)] = {
      val cents = lloyd(pts, nc, rounds)
      def d2(v: Seq[Long], w: Seq[Long]) =
        v.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum
      val asg = pts.map(p => p._1 -> cents.minBy { case (c, w) => (d2(p._2, w), c) }._1).toMap
      val byId = pts.toMap
      qids.flatMap { q =>
        val probe = cents.map { case (c, w) => (d2(byId(q), w), c) }
          .sorted.take(probes).map(_._2).toSet
        pts.filter(p => probe(asg(p._1)))
          .map(p => (p._1, p._2.zip(byId(q)).map { case (a, b) => a * b }.sum))
          .sortBy { case (nid, dot) => (-dot, nid) }.take(k).zipWithIndex
          .map { case ((nid, dot), i) => (q, i + 1, nid, dot) }
      }
    }

    // seeds (the 3 smallest ids) land one per cluster: A around (10,20),
    // B around (500,-300), and a lone outlier — clean Lloyd convergence
    val pts: Seq[(Long, Seq[Long])] =
      Seq(1L -> Seq(10L, 20L), 2L -> Seq(500L, -300L),
        3L -> Seq[Long](10000L, 10000L)) ++
      (4L to 8L).map(i => i -> Seq(7L + i, 20L)) ++
      (9L to 13L).map(i => i -> Seq(492L + i, -300L))
    val qids = Seq(3L, 5L, 10L)
    val df = pts.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfExactTopK(
      df.where(col("vec_id").isin(qids: _*)), df, "vec_id", "embedding",
      k = 4, nCentroids = 3, rounds = 2, probes = 1, quantScale = 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = brute(pts, qids, k = 4, nc = 3, rounds = 2, probes = 1)
      .sortBy(t => (t._1, t._2))
    assert(got == want, s"got $got want $want")
    // probes = 1 is a REAL restriction: query 5's neighbors all come
    // from its own cluster A = {1, 4..8}, never the far cluster
    val q5 = got.filter(_._1 == 5L).map(_._3).toSet
    assert(q5.nonEmpty && q5.subsetOf(Set(1L) ++ (4L to 8L)))
    // widening probes to every cluster recovers the brute-force order
    val full = Similarity.ivfExactTopK(
      df.where(col("vec_id") === 5L), df, "vec_id", "embedding",
      k = 13, nCentroids = 3, rounds = 2, probes = 3, quantScale = 1L)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    val bf = pts.map { case (nid, v) =>
      (nid, v.zip(pts.toMap.apply(5L)).map { case (a, b) => a * b }.sum) }
      .sortBy { case (nid, dot) => (-dot, nid) }
    assert(full == bf)
  }

  test("logRank: identical cohorts chi2 exactly 0, brute chain parity with censoring, empty cohort NULL, zero-variance convention") {
    import spark.implicits._
    import graft.operators.Survival

    def run(a: Seq[(Long, Boolean)], b: Seq[(Long, Boolean)]) =
      Survival.logRank(a.toDF("dur", "ev"), b.toDF("dur", "ev"),
        col("dur"), col("ev")).collect()
    def brute(a: Seq[(Long, Boolean)], b: Seq[(Long, Boolean)])
        : (Long, Long, Long, Long) = {
      val days = (a ++ b).map(_._1).distinct.sorted
      var (oA, eM, vM) = (0L, 0L, 0L)
      for (t <- days) {
        val ra = a.count(_._1 >= t).toLong; val rb = b.count(_._1 >= t).toLong
        val da = a.count(p => p._1 == t && p._2).toLong
        val db = b.count(p => p._1 == t && p._2).toLong
        val dj = da + db; val nj = ra + rb
        if (dj > 0) {
          oA += da
          eM += math.round(dj.toDouble * ra.toDouble / nj.toDouble * 1e6)
          if (nj > 1)
            vM += math.round(dj.toDouble * ra.toDouble / nj.toDouble *
              rb.toDouble / nj.toDouble * (nj - dj).toDouble /
              (nj - 1).toDouble * 1e6)
        }
      }
      (oA, eM, vM,
        a.length.toLong)
    }

    // identical cohorts: per day da = db and ra = rb, so each E term is
    // exactly da·1e6 -> O == E/1e6 -> chi2 exactly 0
    val s = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (5L, true), (8L, false))
    val same = run(s, s)(0)
    assert(same.getDouble(5) == 0.0 && same.getLong(2) == 4L)

    // randomized cohorts with censoring: exact chain parity
    val rnd = new scala.util.Random(37)
    val ca = (1 to 120).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(4) > 0))
    val cb = (1 to 90).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(3) > 0))
    val got = run(ca, cb)(0)
    val (oA, eM, vM, _) = brute(ca, cb)
    assert(got.getLong(0) == 120L && got.getLong(1) == 90L)
    assert(got.getLong(2) == oA && got.getLong(3) == eM && got.getLong(4) == vM)
    val chi2 = (oA.toDouble - eM.toDouble / 1e6) *
      (oA.toDouble - eM.toDouble / 1e6) / (vM.toDouble / 1e6)
    assert(got.getDouble(5) == chi2, "chi2 must be the identical IEEE chain")

    // empty cohort: E and V collapse to 0 -> chi2 NULL, counts honest
    val empty = run(s, Seq.empty[(Long, Boolean)])(0)
    assert(empty.getLong(0) == 6L && empty.getLong(1) == 0L &&
      empty.getLong(4) == 0L && empty.isNullAt(5))

    // single subject at risk on the last event day: its E term counts
    // (day 9 adds the full 1e6), its V term is 0 (the pinned 0/0
    // convention) — day 1 contributes V = 250000 alone, so
    // chi2 = (1 − 1.5)² / 0.25 = 1 exactly
    val lone = run(Seq((9L, true)), Seq((1L, true)))(0)
    assert(lone.getLong(3) == 1500000L && lone.getLong(4) == 250000L &&
      lone.getDouble(5) == 1.0)
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

  test("kmeansQuality: brute inertia and simplified silhouette parity, on-two-centroids pin, tight-vs-spread ordering") {
    import spark.implicits._
    import graft.operators.Similarity

    def lloyd(pts: Seq[(Long, Seq[Long])], k: Int, rounds: Int): Seq[(Int, Seq[Long])] = {
      var cents: Seq[(Int, Seq[Long])] = pts.sortBy(_._1).take(k)
        .zipWithIndex.map { case ((_, v), i) => (i + 1, v) }
      def assign(v: Seq[Long]): Int = cents.minBy { case (c, w) =>
        (v.zip(w).map { case (x, y) => (x - y) * (x - y) }.sum, c) }._1
      for (_ <- 1 to rounds) {
        val g = pts.groupBy(p => assign(p._2))
        cents = cents.map { case (c, old) =>
          g.get(c).fold((c, old)) { m =>
            (c, old.indices.map(d => Math.floorDiv(m.map(_._2(d)).sum, m.size.toLong)))
          }
        }
      }
      cents
    }
    // cluster A tight around (10,10), cluster B spread around (400,-50);
    // seeds (ids 1, 2) land one per cluster
    val pts: Seq[(Long, Seq[Long])] =
      Seq(1L -> Seq(10L, 10L), 2L -> Seq(400L, -50L)) ++
      (3L to 6L).map(i => i -> Seq(9L + (i % 3), 10L)) ++
      (7L to 10L).map(i => i -> Seq(360L + 20 * (i - 7), -50L))
    val df = pts.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansQuality(df, "vec_id", "embedding",
      k = 2, rounds = 2, quantScale = 1L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap

    val cents = lloyd(pts, 2, 2)
    def d2(v: Seq[Long], w: Seq[Long]) =
      v.zip(w).map { case (x, y) => (x - y) * (x - y) }.sum
    val per = pts.map { case (_, v) =>
      val ds = cents.map { case (c, w) => (d2(v, w), c.toLong) }.sorted
      val (dOwn, own) = ds(0); val dNext = ds(1)._1
      val (sa, sb) = (math.sqrt(dOwn.toDouble), math.sqrt(dNext.toDouble))
      val sm = if (math.max(sa, sb) > 0)
        math.round((sb - sa) / math.max(sa, sb) * 1e6) else 0L
      (own, dOwn, sm)
    }
    val want = per.groupBy(_._1).map { case (c, rows) =>
      c -> (rows.size.toLong, rows.map(_._2).sum.toDouble,
        rows.map(_._3).sum,
        rows.map(_._3).sum.toDouble / 1e6 / rows.size.toDouble)
    }
    assert(got == want, s"got $got want $want")
    // the tight cluster separates better than the spread one
    val tight = got(1L)._4; val spread = got(2L)._4
    assert(tight > spread && tight > 0.9)

    // duplicate seed vectors collapse to identical centroids: every
    // point sits on two centroids at once -> silhouette pinned to 0
    // (zero-max convention), inertia still exact
    val dup = Similarity.kmeansQuality(
      Seq((1L, Array(0f, 0f)), (2L, Array(0f, 0f)), (3L, Array(2f, 0f)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, rounds = 1, quantScale = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    // c1 = c2 = (0,0) after the mean of {(0,0),(0,0),(2,0)} floors to
    // (0,0)? -> verify against the brute mirror instead of hand numbers
    val bCents = lloyd(Seq(1L -> Seq(0L, 0L), 2L -> Seq(0L, 0L),
      3L -> Seq(2L, 0L)), 2, 1)
    assert(bCents(0)._2 == bCents(1)._2,
      s"construction sanity: centroids must collide, got $bCents")
    assert(dup.forall(_._4 == 0L), s"on-two-centroids rows pin to 0: $dup")
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
}
