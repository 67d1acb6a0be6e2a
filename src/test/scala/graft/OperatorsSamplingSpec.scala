package graft

import graft.operators.{AsOf, Dedup, Sessionize, Similarity}
import graft.functions.{Text, Vectors}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Operator unit tests: sampling, splits, mixing, packing, batching, basket (split from OperatorsSpec, round 11 — bodies verbatim). */
class OperatorsSamplingSpec extends SparkSuite {

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
}
