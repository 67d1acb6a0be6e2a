package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the scale mechanisms the engine relies on:
  * bucketing co-locates joins (no exchange), partitioned layout prunes
  * scans, filters and projections reach the parquet reader. */
class ScaleSpec extends SparkSuite {

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    graft.sources.Tables.writeBucketed(o, "orders_b", 8, "o_custkey")
    graft.sources.Tables.writeBucketed(c, "customer_b", 8, "c_custkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge path
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(sum(col("o_totalprice")))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must consume bucket layout directly — the only
      // exchange allowed is the one for the final tiny aggregation
      val joinSection = plan.split("SortMergeJoin").last
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey") &&
        !joinSection.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("LSH-blocked near-dup and ANN plans contain no quadratic join") {
    // the scale property the LSH blocking buys: candidate generation is an
    // EQUI-join on bucket strings — never a cross product / nested loop
    // (the all-pairs form would be O(n²) pairs at 100 TB)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val neardup = graft.operators.Similarity
      .embeddingNearDup(emb, "vec_id", "embedding", threshold = 0.35, planes = 6)
    val ann = graft.operators.Similarity.lshTopK(
      emb.where(col("vec_id") % 100 === 0), emb, "vec_id", "embedding", k = 10,
      planes = 6, tables = 4)
    Seq("neardup" -> neardup, "ann-candidates" -> ann).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$name plan has a quadratic join:\n$plan")
    }
  }

  test("simHashPairs plan: posting-list pairs with the bucket-size guard, no corpus self-join") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = graft.operators.Dedup.simHashPairs(docs, "doc_id", "text",
      bits = 32, maxDistance = 2, maxBucketSize = 500)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"simHashPairs plan has a quadratic join:\n$plan")
    // candidates come from in-bucket Generates over a size-guarded posting
    // list, not a hash-table self equi-join on the block key
    assert(plan.contains("Generate"), s"expected posting-list Generates:\n$plan")
    assert(plan.contains("500"), s"expected the maxBucketSize guard in the plan:\n$plan")
  }

  test("partitioned layout prunes: only the filtered partition is scanned") {
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.sources.Tables.writePartitioned(
      spark.read.parquet(s"$sf0001/documents.parquet"), s"$base/docs", "lang")
    val q = spark.read.parquet(s"$base/docs").where(col("lang") === "en")
      .select(col("doc_id"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"), scan)
    // pruned read returns exactly the en rows
    val expected = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("lang") === "en").count()
    assert(q.count() == expected)
  }

  test("facade date-part aggregation prunes the scan to the one used column") {
    // q50's shape: the Expr date algebra + fold rewrite must leave a plan
    // whose events scan reads ONLY ts — proof the facade costs nothing in
    // scan volume even with the arithmetic calendar expansion
    val df = SparkEntry.queries("q50_facade_dateparts")(spark, sf0001)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString
    // the ts column's physical type depends on the producer (raw bigint
    // nanos vs µs NTZ — Tables.events detects it); pruning is the claim,
    // so assert the schema is ts-ONLY, whatever its type
    assert("ReadSchema: struct<ts:[a-z_]+>".r.findFirstIn(scan).isDefined,
      s"expected ts-only ReadSchema, got: $scan")
  }

  test("sequence packing: the data-path window is bucket-partitioned, never global") {
    // q56's scale property: the distributed prefix sum must not collapse
    // the DATA to one partition — the only unpartitioned window allowed is
    // the tiny per-bucket offset table (#buckets rows)
    val df = SparkEntry.queries("q56_sequence_packing")(spark, sf0001)
    df.collect()
    val windows = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Window")).filterNot(_.contains("WindowGroupLimit")).toSeq
    val dataWindows = windows.filter(_.contains("n_tokens"))
    assert(dataWindows.nonEmpty, s"expected a running-sum window over the data:\n${windows.mkString("\n")}")
    assert(dataWindows.forall(_.contains("partitionBy")) ||
      dataWindows.forall(_.contains("_bkt")),
      s"data window must be partitioned by the prefix-sum bucket:\n${dataWindows.mkString("\n")}")
  }

  test("temperature resampling: rate table broadcast, fact path stays narrow") {
    // q55's scale property: the per-domain rate table joins back as a
    // BROADCAST (it is #domains rows) — the fact scan must not shuffle
    val df = SparkEntry.queries("q55_temperature_mix")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rate table should broadcast:\n$plan")
    // exactly ONE exchange partitions on the domain key — the tiny
    // per-domain count aggregation (#domains rows). The fact table itself
    // joins straight off its scan; a second lang-exchange would mean the
    // documents path is being shuffled. (AQE's toString appends the
    // pre-adaptive plan after "== Initial Plan ==" — count only the final.)
    val finalPlan = plan.split("== Initial Plan ==").head
    val langExchanges = finalPlan.sliding("Exchange hashpartitioning(lang".length)
      .count(_ == "Exchange hashpartitioning(lang")
    assert(langExchanges == 1, s"expected 1 rate-table exchange on lang, got $langExchanges:\n$finalPlan")
  }

  test("filter and projection reach the parquet scan (pushdown + pruning)") {
    val q = SparkEntry.queries("q02_filter_pushdown")(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    // the PushedFilters list is elided in toString; assert on the leading
    // entries that survive truncation
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(plan.contains("ReadSchema") &&
      !plan.contains("l_orderkey"), s"projection not pruned:\n$plan")
  }

  test("bloom decontamination: the corpus-side probe runs BELOW the first exchange") {
    // q60's scale property: the corpus never shuffles at full width — the
    // graft_bloom_contains filter must sit in the scan stage, before any
    // Exchange on the corpus path. The operator eagerly checkpoints the
    // filtered sliver (crossCorpusOverlapBloom), so the probe's plan never
    // appears in the RESULT frame (r14 note: the old assertion on the q60
    // result plan was accidentally matching a constraint-inference CLONE
    // of the probe on the probe-doc side — a guaranteed-true filter that
    // BloomMightContain.deterministic=false now suppresses). Assert the
    // property on the sliver shape itself, built from the same pieces.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def shingled(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(array_distinct(
        graft.functions.Text.fastWordShingles(col("text"), 3))).as("s"))
      .select(graft.operators.Dedup.shingleKey(col("s")).as("sh"))
    val probeKeys = shingled(docs.where(col("doc_id") % 10 === 0)).distinct()
    val bloom = graft.operators.Bloom.build(
      probeKeys, "sh", math.max(1L, probeKeys.count()), 0.01)
    val sliver = shingled(docs.where(col("doc_id") % 10 =!= 0))
      .where(bloom.mightContain(col("sh")))
    sliver.collect() // finalize AQE stages so codegen markers appear
    val plan = sliver.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), s"bloom probe missing:\n$plan")
    // the probe's Filter block must have the parquet scan below it with no
    // Exchange between — i.e. it runs in the scan stage
    val lines = plan.linesIterator.toVector
    val probeIdx = lines.indexWhere(_.contains("graft_bloom_contains"))
    assert(probeIdx >= 0)
    val below = lines.drop(probeIdx)
    val exchangeBelow = below.indexWhere(_.contains("Exchange"))
    val scanBelow = below.indexWhere(l => l.contains("FileScan") || l.contains("Scan parquet"))
    assert(exchangeBelow == -1 || scanBelow < exchangeBelow,
      s"bloom probe not in the scan stage:\n$plan")
    // and inside whole-stage codegen: the probe Filter must carry a `*(n)`
    // marker — BloomMightContain implements doGenCode, and declaring it
    // non-deterministic must not break the scan stage's codegen span
    assert(lines.exists(l => l.contains("graft_bloom_contains") && l.contains("*(")),
      s"bloom probe filter fell out of WholeStageCodegen:\n$plan")
    // and the q60 result itself must read the sliver from its checkpoint
    // (materialized once), never re-deriving the corpus scan per branch
    val q60 = SparkEntry.queries("q60_bloom_decontaminate")(spark, sf0001)
    q60.collect()
    assert(q60.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"),
      "q60 no longer reads the checkpointed sliver")
  }

  test("incremental-dedup loop reads the persisted corpus index: no re-shingle") {
    // q66's production story: the corpus index round-trips through a
    // bucketed parquet table. The classify/absorb result plan must read
    // that table (FileScan of graft_q66_corpus_index) and contain NO
    // shingle computation at all — the corpus was shingled exactly once at
    // index-write time, and the batch's shingling happened in its eager
    // checkpoint, not on the per-batch query path.
    val df = SparkEntry.queries("q66_index_update")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_q66_corpus_index"),
      s"corpus index not read from the stored table:\n$plan")
    assert(!plan.contains("graft_shingles"),
      s"classify path re-shingles documents:\n$plan")
  }

  test("LM lifecycle scores against the persisted model: no train-side re-count") {
    // q82's production story: counts live in bucketed tables written at
    // train time. The scoring plan must read them (FileScans of the
    // graft_q82_lm_* tables) and must NOT tokenize the 80% train slice —
    // exactly one documents scan (the 20% being scored) plus the final
    // 1:1 left-join's id-only scan of the same slice.
    val df = SparkEntry.queries("q82_lm_lifecycle")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_q82_lm_"),
      s"model not read from the stored tables:\n$plan")
    // every documents scan must be the %5==0 scored slice — a train-slice
    // scan would carry the negated filter NOT((doc_id % 5) = 0)
    val trainScans = plan.linesIterator
      .filter(_.contains("documents.parquet")).filter(_.contains("NOT ((doc_id")).toSeq
    assert(trainScans.isEmpty,
      s"scoring path re-reads the train slice:\n${trainScans.mkString("\n")}")
  }

  test("LM self-score: count tables partial-aggregate; no quadratic join") {
    // q81: both count branches must partial-aggregate before their
    // exchange (two-phase HashAggregate), and nothing may be a cartesian
    // except the single-row vocab-size broadcast.
    val df = SparkEntry.queries("q81_lm_score")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"quadratic join in LM scoring:\n$plan")
    assert(plan.contains("HashAggregate"), s"no hash aggregation in LM counts:\n$plan")
  }

  test("z-order layout: a thin-slab predicate prunes most files; x-sort prunes none") {
    // 256x256 uniform grid, 16 files per layout. A slab y IN [8,16) is the
    // query a single-column-sorted layout cannot prune: every x-sorted
    // file spans all of y, while contiguous Morton ranges are spatial
    // tiles, so only the tiles touching the slab intersect.
    import spark.implicits._
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("x"), expr("id DIV 256").as("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/by_x")
    graft.sources.Layout.writeZOrdered(grid, Seq("x", "y"), s"$base/by_z", files = 16)

    def intersecting(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      val hit = files.count { f =>
        val r = spark.read.parquet(f.toString).agg(min(col("y")), max(col("y"))).head()
        r.getLong(0) < 16 && r.getLong(1) >= 8 // file's y-range meets [8,16)
      }
      (hit, files.length)
    }
    val (xHit, xTotal) = intersecting(s"$base/by_x")
    val (zHit, zTotal) = intersecting(s"$base/by_z")
    assert(xHit == xTotal, s"x-sorted layout unexpectedly pruned: $xHit/$xTotal")
    assert(zHit <= zTotal / 2, s"z-order failed to prune: $zHit/$zTotal files intersect")
  }

  test("LM quality filter: the global ranking never collapses data to one partition") {
    // q84's scale property, same contract as q56's prefix sum: the only
    // unpartitioned window is the #buckets offset frame (and the scalar
    // count) — every window over document rows is bucket-partitioned.
    val df = SparkEntry.queries("q84_lm_quality_filter")(spark, sf0001)
    df.collect()
    val windows = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Window")).filterNot(_.contains("WindowGroupLimit")).toSeq
    val dataWindows = windows.filter(_.contains("avg_unats"))
    assert(dataWindows.nonEmpty, s"expected a ranking window:\n${windows.mkString("\n")}")
    assert(dataWindows.forall(w => w.contains("partitionBy") || w.contains("_bkt")),
      s"ranking window must be bucket-partitioned:\n${dataWindows.mkString("\n")}")
  }

  test("compaction: many tiny files collapse to target-sized few, content identical") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    spark.range(10000).select(col("id"), (col("id") * 7).as("v"))
      .repartition(64).write.mode("overwrite").parquet(s"$base/small")
    val smallFiles = new java.io.File(s"$base/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 64)
    graft.sources.Layout.compact(spark, s"$base/small", s"$base/big", targetBytes = 64L << 10)
    val bigFiles = new java.io.File(s"$base/big").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(bigFiles < 16, s"expected <16 compacted files, got $bigFiles")
    val before = spark.read.parquet(s"$base/small").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = spark.read.parquet(s"$base/big").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before)
  }

  test("correlated subqueries decorrelate into joins (no per-row re-execution)") {
    val df = SparkEntry.queries("q70_subquery")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // EXISTS -> semi join, NOT EXISTS -> anti join, correlated scalar
    // count -> outer join + aggregate; a SubqueryExec on the data path
    // would mean per-outer-row re-execution
    assert(plan.contains("LeftSemi"), s"EXISTS not decorrelated to a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not decorrelated to an anti join:\n$plan")
    assert(!plan.contains("SubqueryExec"), s"residual subquery execution:\n$plan")
  }

  test("pivot and unpivot: one exchange each, unpivot expands map-side") {
    val pivot = SparkEntry.queries("q59_pivot")(spark, sf0001)
    val pPlan = pivot.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // pivot = plain partial-agg'd groupBy(flag): one hash exchange (plus
    // the ORDER BY's range exchange)
    assert(pPlan.contains("partial_pivotsum") || pPlan.contains("HashAggregate"),
      s"pivot should partial-aggregate:\n$pPlan")
    val unpivot = SparkEntry.queries("q62_unpivot")(spark, sf0001)
    val uPlan = unpivot.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the Expand (row -> one row per measure) runs in the scan stage —
    // BELOW the exchange, so the 3x row expansion is partial-agg'd away
    // before any shuffle
    val uLines = uPlan.linesIterator.toVector
    val expandIdx = uLines.indexWhere(_.contains("Expand"))
    val exchangeIdx = uLines.indexWhere(_.contains("Exchange"))
    assert(expandIdx >= 0, s"no Expand in unpivot plan:\n$uPlan")
    assert(exchangeIdx >= 0 && exchangeIdx < expandIdx,
      s"Expand should be below (after) the first Exchange in toString order:\n$uPlan")
  }

  test("shuffle-shard: the only window is per-SHARD; token budget: per-domain, never one partition") {
    val sharded = SparkEntry.queries("q74_shuffle_shard")(spark, sf0001)
    sharded.collect()
    val p74 = sharded.queryExecution.executedPlan.toString
    // the pos ranking must partition by shard — a global (empty-partition)
    // window would serialize the dataset through one task at 100 TB
    assert("Window \\[[^\\n]*\\], \\[shard".r.findFirstIn(p74).nonEmpty,
      s"pos window not partitioned by shard:\n$p74")
    assert(!p74.contains("SinglePartition"), s"global exchange in shuffle-shard plan:\n$p74")

    val budget = SparkEntry.queries("q75_token_budget")(spark, sf0001)
    budget.collect()
    val p75 = budget.queryExecution.executedPlan.toString
    // the greedy fold hash-partitions on the domain (q57's distributed
    // shape) — the ORDER BY's range exchange is the only other exchange
    assert(p75.contains("Exchange hashpartitioning(source"),
      s"token-budget fold not partitioned by domain:\n$p75")
    assert(!p75.contains("SinglePartition") && !p75.contains("Coalesce 1"),
      s"token-budget plan serializes through one partition:\n$p75")
  }

  test("block dedup keep-first partial-aggregates; quota data-window is per-stratum") {
    // q76: the keep-first winner pick must be a partial-agg'd groupBy on
    // the hashed block key — a boilerplate block occurring 10⁹ times then
    // collapses map-side before the exchange. A Window over PARTITION BY h
    // (the alternative shape) would instead SORT whole heavy-hitter
    // buckets in one task each.
    val dedup = SparkEntry.queries("q76_block_dedup")(spark, sf0001)
    dedup.collect()
    val p76 = dedup.queryExecution.executedPlan.toString
    val hashAggs = p76.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"keep-first pick lost its partial aggregation:\n$p76")
    assert(!"Window \\[min".r.findFirstIn(p76).nonEmpty,
      s"keep-first pick became a per-bucket window sort:\n$p76")

    // q78: the only data-sized window must partition by the stratum; the
    // apportionment windows ride the #strata-row frame (broadcast back)
    val quota = SparkEntry.queries("q78_stratified_quota")(spark, sf0001)
    quota.collect()
    val p78 = quota.queryExecution.executedPlan.toString
    assert("Window \\[row_number\\(\\)[^\\n]*\\], \\[source".r.findFirstIn(p78).nonEmpty,
      s"per-stratum fill window not partitioned by stratum:\n$p78")
    assert(p78.contains("BroadcastExchange") || p78.contains("BroadcastHashJoin"),
      s"quota table does not broadcast back onto the data:\n$p78")
  }

  test("mega-domain skew: per-domain sequential folds stay linear at 80%-in-one-domain") {
    import graft.expr.Expr._
    import graft.stream.DataStream

    // Planted skew at sf0.1-documents scale: 200k metadata rows, 80% in ONE
    // domain — the worst case for the two per-domain sequential folds (q75's
    // takeUntilBudget, q57's next-fit packing): the mega domain serializes
    // into a single task, so wall-time must stay linear in that domain's
    // rows, not degrade to something the suite would notice. The escape
    // hatch when a domain outgrows a task is documented on takeUntilBudget
    // (exact n_tokens>budget pre-filter, then the capPerGroup two-pass
    // pre-thin) — this spec pins the baseline it escapes FROM.
    val n = 200000L
    val skewed = spark.range(n).select(
        col("id"),
        when(col("id") % 5 =!= 0, lit("mega"))
          .otherwise(concat(lit("d"), col("id") % 40)).as("dom"),
        (col("id") % 97 + 1).cast("long").as("toks"),
        pmod(col("id") * 2654435761L, lit(1000L)).as("score"))
      .localCheckpoint(eager = true) // timings below exclude generation

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // --- q75 shape: greedy token-budget admission over the skewed frame ---
    val budget = 5000L
    val (rows, tBudget) = timed {
      graft.operators.Sampling.takeUntilBudget(skewed, "dom", "id",
          scoreCol = col("score"), tokensCol = col("toks"), budget = budget)
        .select("id", "dom", "score", "n_tokens", "kept").collect()
    }
    assert(rows.length == n, s"row count changed: ${rows.length}")
    // exact contract AT skew scale: replay the greedy transition driver-side
    // over the whole 160k-row mega domain and compare every kept flag
    val mega = rows.filter(_.getString(1) == "mega")
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy { case (id, score, _, _) => (-score, id) }
    assert(mega.length == (n - n / 5).toInt)
    var tot = 0L
    mega.foreach { case (id, _, t, kept) =>
      val expect = tot + t <= budget
      assert(kept == expect, s"mega doc $id: kept=$kept, sequential replay says $expect")
      if (expect) tot += t
    }

    // --- q57 shape: next-fit packing (non-rewritable fold -> the per-key
    // sequential interpreted path, the skew-sensitive one) ---
    val packBudget = 128L
    val ds = DataStream.fromDF[(Long, String, Long)](
      skewed.select(col("id").as("_1"), col("dom").as("_2"), col("toks").as("_3")))
    val packed = ds.mapAccumulateByKey((0L, 0L))(t => t._2, t => t._1) { t =>
      val fill = t._1._1; val seq = t._1._2; val nn = t._2._3
      val newSeq = (fill + nn) > packBudget
      val fill2 = newSeq.ifElse(nn, fill + nn)
      val seq2 = newSeq.ifElse(seq + 1L, seq)
      val off = newSeq.ifElse[Long](LitLong(0L), fill)
      (fill2 &&& seq2) &&& (t._2._1 &&& (t._2._2 &&& (nn &&& (seq2 &&& off))))
    }
    val (packStats, tPack) = timed {
      packed.toDF.select(
          col("value._2._1").as("dom"),
          col("value._2._2._2._1").as("seq_idx"),
          (col("value._2._2._2._2") + col("value._2._2._1")).as("end"))
        .groupBy(col("dom"), col("seq_idx"))
        .agg(max(col("end")).as("fill"), count(lit(1)).as("docs"))
        .agg(count(lit(1)).as("seqs"), sum(col("docs")).as("docs"), max(col("fill")).as("maxfill"))
        .head()
    }
    assert(packStats.getLong(1) == n, s"packing lost rows: $packStats")
    assert(packStats.getLong(2) <= packBudget,
      s"a sequence overflows the budget: $packStats")

    info(f"skewed 200k rows (160k in one domain): takeUntilBudget $tBudget%.2fs, next-fit $tPack%.2fs")
    // generous CI bound — locally both run in seconds; the assert exists so
    // a quadratic regression (e.g. an accidental per-row state copy) fails
    // the suite rather than just slowing it
    assert(tBudget < 60.0, f"takeUntilBudget took $tBudget%.1fs on 200k skewed rows")
    assert(tPack < 60.0, f"next-fit packing took $tPack%.1fs on 200k skewed rows")
  }

  test("CDC plans: latestState partial-aggregates (no window/sort); scd2 is one exchange") {
    import spark.implicits._
    val ch = Seq((1L, 10L, 1L, "U", "a"), (1L, 20L, 2L, "U", "b"),
      (2L, 5L, 3L, "D", "c"), (2L, 7L, 4L, "U", "d"))
      .toDF("k", "ms", "eid", "op", "v")
    val ls = graft.operators.Cdc.latestState(ch, "k", Seq("ms", "eid"))
    ls.collect()
    val lsPlan = ls.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the hot-key property: a million-change key collapses map-side via
    // partial max_by — NOT a per-key sort/window over every change
    assert(lsPlan.contains("max_by"), s"expected max_by aggregate:\n$lsPlan")
    assert(lsPlan.toLowerCase.contains("partial_max_by"),
      s"latestState must partial-aggregate before the exchange:\n$lsPlan")
    assert(!lsPlan.contains("WindowExec") && !lsPlan.contains("Window "),
      s"latestState must not sort changes through a window:\n$lsPlan")

    val hist = graft.operators.Cdc.scd2(ch, "k", "ms", Seq("op"), Seq("eid"))
    hist.collect()
    // AQE toString repeats the tree under "== Initial Plan ==" — count only
    // the executed section or every exchange doubles
    val hPlan = hist.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // lag boundary + version row_number + lead interval-end all share the
    // same (key, seq) sort order → Catalyst must plan exactly ONE shuffle
    val exchanges = hPlan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"scd2 should be a single exchange, got $exchanges:\n$hPlan")
    assert(!hPlan.contains("Exchange SinglePartition"),
      s"scd2 must stay partitioned by key:\n$hPlan")
  }

  test("pageRank plan: cached co-partitioned edges, no cartesian, no single-partition collapse") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    // checkpoint=false keeps the full 2-round lineage visible to the assert
    val pr = graft.operators.Graph.pageRankInt(edges, "src", "dst",
      iterations = 2, checkpoint = false)
    pr.collect()
    val plan = pr.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"pageRank round has a quadratic join:\n$plan")
    // cache reuse surfaces either as an in-memory scan or (under AQE) as
    // ReusedExchange of the one-time src repartition — either way the edge
    // exchange executes once, later rounds consume the same layout
    val freshEdgeShuffles = plan.split("\n")
      .count(l => l.contains("REPARTITION_BY_COL") && !l.contains("ReusedExchange"))
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage") ||
      (plan.contains("ReusedExchange") && freshEdgeShuffles <= 1),
      s"edges must be reused across rounds, not re-shuffled from source:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"rank update must stay distributed:\n$plan")
  }

  test("inverted-index search: term probe prunes buckets and pushes the filter to the scan") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(500)
    spark.sql("DROP TABLE IF EXISTS graft_scalespec_idx")
    try {
      graft.operators.InvertedIndex.writeIndex(docs, "doc_id", "text",
        "graft_scalespec_idx", buckets = 8)
      // the NOT term must actually exist — an empty posting list lets AQE
      // eliminate the whole anti join (good, but then there is no scan to
      // assert on); grab a real token from the corpus
      val notTerm = spark.table("graft_scalespec_idx")
        .where(!col("term").isin("the", "and"))
        .orderBy(col("term")).select(col("term")).head().getString(0)
      val hits = graft.operators.InvertedIndex.search(spark,
        "graft_scalespec_idx", all = Seq("the", "and"), none = Seq(notTerm))
      hits.collect()
      val plan = hits.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      // query cost ∝ probed posting lists: the term predicates must reach
      // the parquet reader AND select only the probed terms' buckets
      assert(plan.contains("In(term"), s"AND-terms filter not pushed to scan:\n$plan")
      assert(plan.contains(s"EqualTo(term,$notTerm)"),
        s"NOT-term filter not pushed to scan:\n$plan")
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val prunes = sel.findAllMatchIn(plan).map(m => (m.group(1).toInt, m.group(2).toInt)).toList
      assert(prunes.nonEmpty, s"expected bucket pruning on the term probe:\n$plan")
      assert(prunes.forall { case (k, n) => k < n },
        s"term probe read every bucket ($prunes):\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS graft_scalespec_idx")
  }

  test("pmi plan: counts partial-aggregate; the only nested-loop join is the 1-row N scalar") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(500)
    val pmi = graft.operators.Colloc.pmi(docs, "doc_id", "text", minCount = 2L)
    pmi.collect()
    val plan = pmi.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.toLowerCase.contains("partial_count"),
      s"bigram/unigram counts must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in pmi plan:\n$plan")
    // the crossJoin(total) scalar is the one allowed nested-loop: its build
    // side is a 1-row aggregate, never a data-sized table
    val bnl = plan.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnl <= 1, s"expected at most the scalar-N nested loop, got $bnl:\n$plan")
  }

  test("bm25 plan: probed buckets pruned, idf broadcast-joined, per-doc sum partial-aggregates") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(500)
    spark.sql("DROP TABLE IF EXISTS graft_scalespec_bm25")
    spark.sql("DROP TABLE IF EXISTS graft_scalespec_bm25_meta")
    try {
      graft.operators.InvertedIndex.writeIndex(docs, "doc_id", "text",
        "graft_scalespec_bm25", buckets = 8)
      val ranked = graft.operators.InvertedIndex.bm25(spark,
        "graft_scalespec_bm25", Seq("the", "and"))
      ranked.collect()
      val plan = ranked.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      // query cost ∝ probed posting lists: term filter at the reader,
      // bucket pruning selects a strict subset
      assert(plan.contains("In(term") || plan.contains("EqualTo(term"),
        s"query-term filter not pushed to scan:\n$plan")
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val prunes = sel.findAllMatchIn(plan).map(m => (m.group(1).toInt, m.group(2).toInt)).toList
      assert(prunes.nonEmpty && prunes.forall { case (k, n) => k < n },
        s"term probe must prune buckets ($prunes):\n$plan")
      // the #terms idf table rides a broadcast hash join; the 1-row meta
      // is the only allowed nested loop
      assert(plan.contains("BroadcastHashJoin"), s"idf join must broadcast:\n$plan")
      val bnl = plan.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
      assert(bnl <= 1, s"only the 1-row meta may nested-loop, got $bnl:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian in bm25 plan:\n$plan")
      assert(plan.toLowerCase.contains("partial_sum"),
        s"per-doc score sum must partial-aggregate map-side:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_scalespec_bm25")
      spark.sql("DROP TABLE IF EXISTS graft_scalespec_bm25_meta")
    }
  }

  test("funnel plan: per-step type filters pushed to the scan, no quadratic join") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val f = graft.operators.Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"), withinMs = Some(6L * 3600 * 1000))
    f.collect()
    val plan = f.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // each step reads ONLY its event type's rows: the equality predicate
    // must reach every per-step parquet scan
    for (st <- Seq("signup", "click", "purchase"))
      assert(plan.contains(s"EqualTo(event_type,$st)"),
        s"step filter $st not pushed to scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel steps must equi-join on the user:\n$plan")
  }

  test("cohortRetention plan: window partitioned by user, no single-partition exchange") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val r = graft.operators.Retention.cohortRetention(ev, "user_id", "ts")
    r.collect()
    val plan = r.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange SinglePartition"),
      s"first-event window must stay distributed (partition by user):\n$plan")
    assert(plan.toLowerCase.contains("partial_count"),
      s"distinct-user count must partial-aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no quadratic operator in retention plan:\n$plan")
  }

  test("triangleCount plan: adjacency intersection over keyed joins, never a cartesian") {
    import spark.implicits._
    val edges = (1L to 400L).flatMap(i => Seq((i, i % 20), (i, (i + 7) % 20)))
      .toDF("src", "dst")
    val t = graft.operators.Graph.triangleCount(edges, "src", "dst")
    t.collect()
    val plan = t.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the three 1-row stat frames may close over a broadcast nested loop —
    // that is model-row scale; a CartesianProduct over DATA-scale sides
    // (adjacency × edges evaluated without keys) is the failure mode
    assert(!plan.contains("CartesianProduct"),
      s"adjacency joins must hash on their keys:\n$plan")
    // r13 shape: per-edge |N⁺(u) ∩ N⁺(v)| — the oriented adjacency
    // arrays attach through two keyed joins and the Σ outdeg² wedge rows
    // are never materialized or shuffled
    assert(plan.contains("array_intersect"),
      s"expected the adjacency-intersection count:\n$plan")
    val equiJoins = plan.split("\n").count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
    assert(equiJoins >= 2, // the two adjacency attaches, minus whatever AQE fuses
      s"expected keyed adjacency joins, got $equiJoins:\n$plan")
  }

  test("blockedFuzzyPairs plan: one equi-join on the block key; distance never gates the join") {
    val parts = graft.sources.Tables.part(spark, sf0001)
    val f = graft.operators.Linkage.blockedFuzzyPairs(
      parts, "p_partkey", "p_name",
      blockKey = org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("p_name"), " "), -1),
      maxDist = 3)
    f.collect()
    val plan = f.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the block equi-join alone:\n$plan")
    assert(plan.contains("levenshtein"),
      s"distance must evaluate post-join (codegen'd builtin):\n$plan")
  }

  test("sorted-neighborhood candidates stay linear where attribute blocks go quadratic") {
    import spark.implicits._
    // a pathological corpus: 1000 records share ONE blocking attribute
    // value (the hot-key case every real name corpus has)
    val n = 1000
    val df = (1 to n).map(i => (i.toLong, f"widget alpha $i%04d")).toDF("id", "name")
    // attribute blocking on the first token: one block of n rows ->
    // n(n-1)/2 candidate comparisons
    val blocked = graft.operators.Linkage.blockedFuzzyPairs(
      df, "id", "name",
      blockKey = org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.split(col("name"), " "), 1),
      maxDist = 50)
    assert(blocked.count() == n.toLong * (n - 1) / 2)
    // SNM with window w compares each record to w-1 successors per pass:
    // candidates are EXACTLY (n - w + 1)(w-1) + (w-1)(w-2)/2 per pass —
    // linear in n — regardless of how the attribute values distribute
    val w = 10
    val snm = graft.operators.Linkage.sortedNeighborhoodPairs(
      df, "id", "name",
      passes = Seq((col("name"), substring(col("name"), 1, 2))),
      window = w, maxDist = 50)
    val perPass = (n - w + 1).toLong * (w - 1) + (w - 1).toLong * (w - 2) / 2
    assert(snm.count() == perPass)
    assert(perPass < n.toLong * (n - 1) / 2 / 50,
      "SNM candidate volume must be orders of magnitude below the hot block")
  }

  test("boilerplate prune: the vocabulary prune is a broadcast LEFT ANTI, not a shuffle") {
    // q103's scale contract: the high-df vocabulary is model-sized by
    // pigeonhole, so pruning must broadcast it into the scan stage; the
    // only data-wide exchanges are the df aggregation and the per-doc
    // reassembly
    val df = SparkEntry.queries("q103_boilerplate_prune")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val anti = plan.linesIterator.filter(_.contains("LeftAnti")).toSeq
    assert(anti.nonEmpty, s"expected an anti join pruning the vocabulary:\n$plan")
    assert(anti.forall(_.contains("Broadcast")),
      s"the vocabulary anti join must be broadcast, not shuffled:\n${anti.mkString("\n")}")
    assert(!plan.contains("CartesianProduct"),
      s"no quadratic joins in the prune plan:\n$plan")
  }

  test("length batching: groupedRank keeps the whole plan free of single-partition exchanges") {
    val df = SparkEntry.queries("q107_length_batching")(spark, sf0001)
    df.collect()
    // drop the final presentation ORDER BY's range exchange: rank
    // assignment itself must never collapse — and even the offset frame
    // partitions by the length bucket
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange SinglePartition"),
      s"q107 must contain no single-partition exchange anywhere:\n$plan")
    val dataWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(dataWindows.nonEmpty && dataWindows.forall(_.contains("_sb")),
      s"ranking windows must partition by (bucket, sub-bucket):\n${dataWindows.mkString("\n")}")
  }

  test("vocab lifecycle merges against the persisted df-stats: no base-corpus re-scan") {
    // q119's production story: the base corpus was tokenized exactly once
    // at stats-write time. The absorb-a-batch vocabulary plan must read
    // the bucketed stats table and scan ONLY the %4==0 batch slice — a
    // base-slice scan would carry the negated filter NOT((doc_id % 4) = 0).
    val df = SparkEntry.queries("q119_vocab_update")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_q119_vocab_stats_"),
      s"stats not read from the stored table:\n$plan")
    val baseScans = plan.linesIterator
      .filter(_.contains("documents.parquet")).filter(_.contains("NOT ((doc_id")).toSeq
    assert(baseScans.isEmpty,
      s"merge path re-reads the base slice:\n${baseScans.mkString("\n")}")
  }

  test("shingle-df lifecycle merges against the persisted stats: no base re-shingle") {
    // q123: same contract as the vocab lifecycle, over the data-sized
    // shingle universe — the batch shingles once, the base never again.
    val df = SparkEntry.queries("q123_shingle_stats_update")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_q123_shingle_stats_"),
      s"stats not read from the stored table:\n$plan")
    val baseScans = plan.linesIterator
      .filter(_.contains("documents.parquet")).filter(_.contains("NOT ((doc_id")).toSeq
    assert(baseScans.isEmpty,
      s"merge path re-shingles the base slice:\n${baseScans.mkString("\n")}")
  }

  test("round-7 operators: no window on the EWMA path, no single-partition rank, broadcast blocklist") {
    import spark.implicits._
    // EWMA control chart: per-step sums + bounded explode + equi-join —
    // NO window function anywhere (the whole point of the fan-out form)
    val events = (1L to 2000L).map(i =>
      (i % 37, i, i * 14400000000L / 16, (i % 211).toDouble))
      .toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val ewma = graft.operators.Decay.ewmaControlChart(
      events, "user_id", "ts", "value", "event_id")
    ewma.collect()
    val ewmaPlan = ewma.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!ewmaPlan.contains("Window"), s"EWMA chart must not use a window:\n$ewmaPlan")
    assert(ewmaPlan.contains("Generate"), "horizon fan-out must be a scan-stage explode")
    assert(ewmaPlan.contains("partial_sum"), "per-step sums must partial-aggregate")

    // AUC: the rank rides the two-level scheme — data never collapses to
    // one partition (the #buckets offset window is model-sized)
    val scored = (1L to 5000L).map(i =>
      ((i * 2654435761L % 1000).toDouble, i % 3 == 0, i)).toDF("s", "pos", "id")
    val auc = graft.operators.Eval.aucExact(scored, col("s"), col("pos"),
      floor(col("s") / 50).cast("long"), col("id"))
    auc.collect()
    val aucPlan = auc.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val dataWindows = aucPlan.linesIterator
      .filter(l => l.contains("Window") && l.contains("SinglePartition")).size
    assert(!aucPlan.contains("Exchange SinglePartition") || dataWindows == 0,
      s"AUC rank must not serialize the data through one partition:\n$aucPlan")

    // blocklist: the phrase side must broadcast — matching stays in the
    // scan stage, no shuffle of document text
    val docs = (1L to 500L).map(i => (i, s"some text $i hash join maybe")).toDF("doc_id", "text")
    val m = graft.operators.Blocklist.phraseMatches(docs, "doc_id", "text",
      Seq("hash join", "table scan", "three token phrase"))
    m.collect()
    val mPlan = m.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(mPlan.contains("BroadcastHashJoin"), s"blocklist join must broadcast:\n$mPlan")
    assert(!mPlan.contains("SortMergeJoin"), s"document text must not shuffle to match:\n$mPlan")

    // corpus similarity: the exchanges below the key join carry hashed
    // 8-byte keys, never text — assert the distinct partial-aggregates
    // and nothing goes cartesian
    val simDocs = (1L to 400L).map(i => (s"src${i % 7}", s"w${i % 13} w${i % 17} w${i % 5} x y z"))
      .toDF("source", "text")
    val sim = graft.operators.Dedup.corpusSimilarityMatrix(simDocs, "source", "text", 3)
    sim.collect()
    val simPlan = sim.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!simPlan.contains("CartesianProduct"), s"similarity must not go all-pairs:\n$simPlan")
    assert(simPlan.contains("partial_count"), "shingle distinct/counts must partial-aggregate")
  }

  test("round-7b operators: HITS/BFS iterate over cached edges, weighted quantiles never sort a group, embargo split stays in the scan") {
    import spark.implicits._
    // HITS: half-round sums partial-aggregate; the max attaches as a
    // 1-row broadcast, never a data-sized exchange to one partition
    val edges = (1L to 3000L).map(i => (i % 97, 100 + i % 41)).toDF("s", "d")
    val hits = graft.operators.Graph.hitsInt(edges, "s", "d",
      iterations = 2, checkpoint = false)
    hits.collect()
    // full AQE string (final + initial): materialized stages print
    // compactly in the final section, hiding map-side aggregates
    val hitsPlan = hits.queryExecution.executedPlan.toString
    assert(hitsPlan.contains("partial_sum"), "half-round sums must partial-aggregate")
    assert(hitsPlan.contains("BroadcastNestedLoopJoin") || hitsPlan.contains("BroadcastExchange"),
      s"the max scalar must broadcast:\n$hitsPlan")
    assert(!hitsPlan.contains("CartesianProduct"), s"no cartesian in HITS:\n$hitsPlan")

    // BFS: frontier expansion is equi-join + partial-aggregable distinct
    // + anti-join — no cartesian, no window
    val bfs = graft.operators.Graph.bfsDistances(edges, "s", "d",
      Seq(Tuple1(1L), Tuple1(2L)).toDF("node"), maxHops = 3, checkpoint = false)
    bfs.collect()
    val bfsPlan = bfs.queryExecution.executedPlan.toString
    assert(!bfsPlan.contains("CartesianProduct") && !bfsPlan.contains("Window"),
      s"BFS must stay join+aggregate shaped:\n$bfsPlan")

    // weighted quantiles: every window is bucket-partitioned (the
    // histogram/two-level scheme) — no single-partition window over
    // anything data-sized, selection partial-aggregates
    val wq = graft.operators.Ranking.weightedQuantilesPerGroup(
      (1L to 4000L).map(i => (s"g${i % 5}", i % 211, 1L + i % 7)).toDF("g", "v", "w"),
      "g", "v", "w", expr("v DIV 16"), Seq((1L, 2L), (9L, 10L)))
    wq.collect()
    val wqPlan = wq.queryExecution.executedPlan.toString
    val wqSinglePartWindows = wqPlan.linesIterator
      .filter(l => l.contains("Window") && l.contains("SinglePartition")).size
    assert(wqSinglePartWindows == 0,
      s"weighted quantiles must never run a single-partition window:\n$wqPlan")
    assert(wqPlan.contains("partial_sum"), "histogram weights must partial-aggregate")

    // embargo split: 1-row bounds broadcast + pure projection — the
    // assignment itself adds no exchange and no window
    val es = graft.operators.Sampling.temporalEmbargoSplit(
      (1L to 2000L).toDF("ts"), "ts", 7L, 10L, 1L, 20L)
    es.collect()
    val esPlan = es.queryExecution.executedPlan.toString
    assert(esPlan.contains("BroadcastNestedLoopJoin"),
      s"bounds must attach as a 1-row broadcast:\n$esPlan")
    assert(!esPlan.contains("Window") && !esPlan.contains("SortMergeJoin"),
      s"split assignment must stay in the scan stage:\n$esPlan")
  }

  test("round-7c operators: coverage anti-join shape, PSI literal-array probe, ndcg TakeOrdered cuts") {
    import spark.implicits._
    // coverage: incidence anti-join + partial-aggregable count; text
    // never shuffles (keys only), nothing cartesian
    val docs = (1L to 300L).map(i => (i, s"w${i % 7} w${i % 11} w${i % 13} tail$i")).toDF("doc_id", "text")
    val cov = graft.operators.Coverage.maxCoverageSelect(spark, docs,
      "doc_id", "text", shingleLen = 1, rounds = 2, checkpoint = false)
    // the result df is a driver-built table; assert on the ROUND plan by
    // rebuilding one round's frame shape instead
    val inc = docs.select(col("doc_id").as("_doc"),
        explode(graft.functions.Text.fastWordShingles(col("text"), 1)).as("_s"))
      .select(col("_doc"), graft.operators.Dedup.shingleKey(col("_s")).as("_sh"))
      .distinct()
    val won = inc.where(col("_doc") === 1L).select(col("_sh"))
    val round = inc.join(won, Seq("_sh"), "left_anti")
      .groupBy(col("_doc")).agg(count(lit(1)).as("g"))
    round.collect()
    val rPlan = round.queryExecution.executedPlan.toString
    assert(!rPlan.contains("CartesianProduct"), s"coverage round must not go cartesian:\n$rPlan")
    assert(rPlan.contains("partial_count"), "per-doc gains must partial-aggregate")
    assert(cov.count() == 2L)

    // PSI: bin assignment is a literal-array probe in the scan — the
    // only joins are the bins-row spine and the 1-row totals broadcast
    val ref = (1L to 2000L).map(i => (i % 97, i)).toDF("v", "id")
    val tgt = (1L to 2000L).map(i => (i % 89, i)).toDF("v", "id")
    val psi = graft.operators.Checks.psiDrift(ref, tgt, "v", "id",
      expr("v DIV 10"), bins = 10)
    psi.collect()
    val pPlan = psi.queryExecution.executedPlan.toString
    val psiSinglePartWindows = pPlan.linesIterator
      .filter(l => l.contains("Window") && l.contains("SinglePartition")).size
    assert(psiSinglePartWindows == 0,
      s"PSI must not run a single-partition window over data:\n$pPlan")
    assert(!pPlan.contains("SortMergeJoin"), s"PSI joins are model-sized broadcasts:\n$pPlan")

    // ndcg: both cuts must be distributed TakeOrdered, not a global sort
    val scored = (1L to 3000L).map(i => (i * 7 % 997, i % 4, i)).toDF("s", "g", "id")
    val nd = graft.operators.Eval.ndcgAtK(scored, col("s"), col("g"), col("id"), 10)
    nd.collect()
    val nPlan = nd.queryExecution.executedPlan.toString
    assert(nPlan.contains("TakeOrderedAndProject"),
      s"top-k cuts must be TakeOrdered:\n$nPlan")
  }

  test("round-7d operators: moment stats are one partial-agg pass, Markov windows stay per-key, interval overlap never range-joins, SSSP and MMR rounds never go quadratic") {
    import spark.implicits._

    // pearsonExact: the ENTIRE statistic is one partial-aggregable
    // aggregate over the scan — no join, no window, no exchange wider
    // than the single 6-column partial-agg row per partition
    val pts = (1L to 5000L).map(i => (i, i * 3 + i % 7)).toDF("x", "y")
    val pearson = graft.operators.Eval.pearsonExact(pts, col("x"), col("y"))
    pearson.collect()
    val pPlan = pearson.queryExecution.executedPlan.toString
    assert(pPlan.contains("partial_count") || pPlan.contains("partial_sum"),
      s"pearson moments must partial-aggregate:\n$pPlan")
    assert(!pPlan.contains("Window") && !pPlan.contains("Join"),
      s"pearson is one aggregate pass, no window/join:\n$pPlan")

    // chi-squared: the only joins attach category-universe-sized totals
    // by BROADCAST; the data-sized work is the one cell count
    val cat = (1L to 4000L).map(i => (s"a${i % 13}", s"b${i % 5}")).toDF("a", "b")
    val chi = graft.operators.Eval.chiSquareIndependence(cat, col("a"), col("b"))
    chi.collect()
    val cPlan = chi.queryExecution.executedPlan.toString
    assert(!cPlan.contains("SortMergeJoin"),
      s"chi2 totals attach by broadcast, never a shuffle join:\n$cPlan")
    assert(!cPlan.contains("CartesianProduct"), s"chi2 must not go cartesian:\n$cPlan")

    // Markov: the lag window is partitioned BY KEY — a data-sized
    // single-partition window would serialize the whole corpus
    val ev = (1L to 6000L).map(i => (i % 37, i, s"s${i % 4}")).toDF("k", "seq", "st")
    val mk = graft.operators.Markov.transitionMatrix(ev, col("k"), col("st"),
      Seq(col("seq")), checkpoint = false)
    mk.collect()
    val mPlan = mk.queryExecution.executedPlan.toString
    val mkSinglePartWindows = mPlan.linesIterator
      .filter(l => l.contains("Window") && l.contains("SinglePartition")).size
    assert(mkSinglePartWindows == 0,
      s"Markov lag window must be per-key, not single-partition:\n$mPlan")
    assert(mPlan.contains("partial_count"), "transition counts must partial-aggregate")

    // interval overlap: the whole point is NO range join — no cartesian,
    // no broadcast-nested-loop anywhere; sweeps are bucket-partitioned
    // windows (the offsets window rides the bucket-count-sized table)
    val ia = (1L to 2000L).map(i => (i, i * 10, i * 10 + 15)).toDF("id", "s", "e")
    val ib = (1L to 2000L).map(i => (i * 7 + 3, i * 7 + 9)).toDF("s", "e")
    val ov = graft.operators.Intervals.overlapCounts(
      ia, "id", "s", "e", ib, "s", "e", v => shiftright(v, 8))
    ov.collect()
    val oPlan = ov.queryExecution.executedPlan.toString
    assert(!oPlan.contains("CartesianProduct") && !oPlan.contains("BroadcastNestedLoop"),
      s"interval overlap must never materialize a pair/range join:\n$oPlan")

    // ssspInt one-round frame: candidate relaxation is an equi-join
    // against src-repartitioned edges with a partial-aggregable min
    val edges = (1L to 3000L).map(i => (i % 211, (i * 7) % 211, i % 9 + 1)).toDF("src", "dst", "w")
    val sp = graft.operators.Graph.ssspInt(edges, "src", "dst", "w",
      Seq(1L).toDF("node"), rounds = 2, checkpoint = false)
    sp.collect()
    val sPlan = sp.queryExecution.executedPlan.toString
    assert(!sPlan.contains("CartesianProduct"), s"sssp must not go cartesian:\n$sPlan")
    assert(sPlan.contains("partial_min"), "sssp relaxation min must partial-aggregate")

    // MMR: candidates meet ONLY the broadcast selected set — a
    // shuffle join or cartesian would mean a candidate×candidate universe
    val items = (0L to 400L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 31 + d * 17) % 13).toFloat))).toDF("vec_id", "embedding")
    val mmr = graft.operators.Mmr.mmrSelect(spark, items, "vec_id", "embedding",
      queryId = 0L, k = 3, checkpoint = false)
    assert(mmr.count() == 3L)
    // the selection is driver-built; assert on a round-2 frame rebuilt
    // with the operator's own shapes: rel + broadcast selected
    val base = items.select(col("vec_id").as("_id"), col("embedding").as("_v"),
      graft.functions.Vectors.norm(col("embedding")).as("_n"))
    val sel = broadcast(base.where(col("_id") === 1L))
    val round2 = base.where(col("_id") =!= 1L)
      .crossJoin(sel.select(col("_v").as("_sv"), col("_n").as("_sn")))
      .select(col("_id"),
        round(graft.functions.Vectors.fastDot(col("_sv"), col("_v")) * lit(1e6)).as("_sim"))
      .groupBy(col("_id")).agg(max(col("_sim")).as("_ms"))
    round2.collect()
    val r2Plan = round2.queryExecution.executedPlan.toString
    assert(!r2Plan.contains("SortMergeJoin") && !r2Plan.contains("CartesianProduct"),
      s"MMR round joins are broadcast-only:\n$r2Plan")

    // LSH sweep: candidates come from band equi-joins / posting lists;
    // verification is equi too — nothing quadratic anywhere
    val docs = (1L to 200L).map(i => (i, s"w${i % 5} w${i % 7} w${i % 11} w${i % 13} t$i"))
      .toDF("doc_id", "text")
    val sweep = graft.operators.Tuning.lshThresholdSweep(docs, "doc_id", "text",
      shingleLen = 2, k = 16, bands = 4)
    sweep.collect()
    val swPlan = sweep.queryExecution.executedPlan.toString
    assert(!swPlan.contains("CartesianProduct") && !swPlan.contains("BroadcastNestedLoop"),
      s"LSH sweep must never go all-pairs:\n$swPlan")

    // prefix join: candidate generation is an equi-join on prefix
    // tokens; the per-doc sort is sort_array (per-row), NEVER a window —
    // nothing cartesian, no data-wide sort beyond the aggregation sorts
    val pdocs = (1L to 300L).map(i => (i, s"w${i % 5} w${i % 7} w${i % 11} w${i % 13} t${i % 31}"))
      .toDF("doc_id", "text")
    val pj = graft.operators.PrefixJoin.jaccardSelfJoin(pdocs, "doc_id", "text",
      shingleLen = 2, tNum = 1L, tDen = 2L)
    pj.collect()
    val pjPlan = pj.queryExecution.executedPlan.toString
    assert(!pjPlan.contains("CartesianProduct") && !pjPlan.contains("BroadcastNestedLoop"),
      s"prefix join must stay equi:\n$pjPlan")
    val pjWindows = pjPlan.linesIterator.filter(_.contains("Window")).size
    assert(pjWindows == 0, s"prefix join needs no window at all:\n$pjPlan")

    // skyline: dominance via histogram prefix-max — no dominance join;
    // the only single-partition window rides the bucket-count-sized
    // offsets table, and the data meets the frontier by equi-join
    val sk = graft.operators.Skyline.paretoFront2D(
      (1L to 5000L).map(i => (i, i % 97, (i * 31) % 89)).toDF("id", "x", "y"),
      "id", col("x"), col("y"), v => shiftright(v, 3))
    sk.collect()
    val skPlan = sk.queryExecution.executedPlan.toString
    assert(!skPlan.contains("CartesianProduct") && !skPlan.contains("BroadcastNestedLoop"),
      s"skyline must not run a dominance join:\n$skPlan")
  }

  test("round-7e operators: KS histogram collapse, survival day-universe, keyness TakeOrdered, profiler single stacked pass") {
    import spark.implicits._

    // KS: both samples collapse to ONE per-value count pair before any
    // window; the data-sized work must partial-aggregate, and no
    // cartesian/nested-loop exists (the 1-row totals ride broadcast)
    val a = (1L to 4000L).map(i => i * 7 % 997).toDF("v")
    val b = (1L to 3000L).map(i => i * 13 % 991).toDF("v")
    val ks = graft.operators.Eval.ksTestExact(a, col("v"), b, col("v"),
      v => shiftright(v, 5))
    ks.collect()
    val kPlan = ks.queryExecution.executedPlan.toString
    assert(!kPlan.contains("CartesianProduct"), s"KS must stay equi/broadcast:\n$kPlan")

    // survival: terminations collapse to the day histogram in one
    // partial-aggregable pass BEFORE the (day-universe) windows
    val subj = (1L to 5000L).map(i => (i % 90, i % 3 != 0)).toDF("dur", "ev")
    val km = graft.operators.Survival.kaplanMeier(subj, col("dur"), col("ev"))
    km.collect()
    val sPlan = km.queryExecution.executedPlan.toString
    assert(!sPlan.contains("CartesianProduct"), s"KM joins are broadcast:\n$sPlan")
    assert(!sPlan.contains("SortMergeJoin"), s"KM totals attach by broadcast:\n$sPlan")

    // keyness: the top-k cut is a distributed TakeOrdered heap, never a
    // global sort of the vocabulary
    val ca = (1L to 400L).map(i => (i, s"w${i % 23} w${i % 7} x$i")).toDF("id", "text")
    val cb = (1L to 400L).map(i => (i, s"w${i % 19} w${i % 5} y$i")).toDF("id", "text")
    val key = graft.operators.Colloc.keyness(ca, cb, "text", k = 10)
    key.collect()
    val yPlan = key.queryExecution.executedPlan.toString
    assert(yPlan.contains("TakeOrderedAndProject"),
      s"keyness top-k must be TakeOrdered:\n$yPlan")

    // column profiler: ONE stacked pass — a single Generate (explode)
    // feeding a partial-aggregable profile, no join at all
    val prof = graft.SparkEntry.queries("q199_column_profile")(spark, sf0001)
    prof.collect()
    val pPlan = prof.queryExecution.executedPlan.toString
    // AQE prints the materialized final plan AND the initial plan; count
    // the explode once, in the final section only
    val pFinal = pPlan.split("== Initial Plan ==").head
    assert(pFinal.linesIterator.count(_.contains("Generate")) == 1,
      s"profiler is one stacked explode:\n$pPlan")
    assert(!pFinal.contains("Join"), s"profiler has no join:\n$pPlan")
  }

  test("round-8 operators: kendall inversion windows stay partitioned, multi-scale dedup winners partial-aggregate") {
    import spark.implicits._

    // kendall: every window is partitioned — the in-frame conditional
    // sums by (level, prefix, yBucket), the suffix offsets by (level,
    // prefix). The only SinglePartition collapse allowed is the final
    // one-row statistic, which must carry no Window.
    val rnd = new scala.util.Random(11)
    val pts = (1 to 4000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(600).toLong))
    val tau = graft.operators.Eval.kendallTauExact(pts.toDF("x", "y"),
      col("x"), col("y"), yBucket = expr("y DIV 64"))
    tau.collect()
    val kPlan = tau.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val singleWindows = kPlan.linesIterator
      .filter(l => l.contains("Window") && l.contains("SinglePartition")).size
    assert(singleWindows == 0,
      s"kendall must never run a single-partition window:\n$kPlan")
    assert(kPlan.contains("partial_sum") || kPlan.contains("partial_count"),
      s"cell histogram must partial-aggregate:\n$kPlan")

    // multi-scale dedup: per-scale winner picks are hash aggregations on
    // the window-hash key with map-side partial aggregation — no sort of
    // the corpus, no cartesian anywhere
    val docs = (1L to 300L).map(i =>
      (i, (0 until 30).map(j => s"t${(i * 31 + j) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    val ms = graft.operators.Dedup.multiScaleSpanDedup(docs, "doc_id", "text",
      scales = Seq(4 -> 2L, 8 -> 2L))
    ms.collect()
    val mPlan = ms.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!mPlan.contains("CartesianProduct"),
      s"multi-scale dedup must not go quadratic:\n$mPlan")
    assert(mPlan.contains("partial_min") || mPlan.contains("partial_count"),
      s"winner picks must partial-aggregate:\n$mPlan")
  }

  test("round-8b operators: mann-whitney histogram collapse, theil-sen group-partitioned rank, cusum group windows, conformal two-level rank") {
    import spark.implicits._

    // mann-whitney: the data collapses to the value histogram in one
    // partial-aggregable pass; the only unpartitioned window is the
    // model-sized bucket-offset spine (the ksTestExact shape); no
    // cartesian (1-row totals ride broadcast)
    val rnd = new scala.util.Random(29)
    val mwIn = (1 to 6000).map(_ =>
      (rnd.nextInt(500).toLong, rnd.nextBoolean())).toDF("v", "p")
    val mw = graft.operators.Eval.mannWhitney(mwIn, col("v"), col("p"),
      bucketOf = v => shiftright(v, 5), checkpoint = false)
    mw.collect()
    val mwPlan = mw.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!mwPlan.contains("CartesianProduct"), s"MW stays equi/broadcast:\n$mwPlan")
    assert(mwPlan.contains("partial_count") || mwPlan.contains("partial_sum"),
      s"MW histogram must partial-aggregate:\n$mwPlan")

    // theil-sen: the rank window partitions by group (the pair frame is
    // the caller's model-sized series squared, never the corpus) — no
    // single-partition window anywhere
    val ts = graft.operators.Eval.theilSenSlope(
      (1 to 40).flatMap(g => (1L to 30L).map(x => (s"g$g", x, x * g + g)))
        .toDF("g", "x", "y"), "g", col("x"), col("y"))
    ts.collect()
    val tsPlan = ts.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!tsPlan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      s"theil-sen windows partition by group:\n$tsPlan")

    // cusum: same contract — every window carries the group partition
    val cu = graft.operators.Anomaly.cusumChangepoint(
      (1 to 40).flatMap(g => (1L to 50L).map(t =>
        (s"g$g", t, if (t > 25) 90L else 10L))).toDF("g", "t", "y"),
      "g", col("t"), col("y"))
    cu.collect()
    val cuPlan = cu.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!cuPlan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      s"cusum windows partition by group:\n$cuPlan")

    // conformal: rides groupedRank's two-level scheme — the rank window
    // partitions by (group, subBucket); no data-sized single-partition
    // window; sizes attach by broadcast (no cartesian)
    val cf = graft.operators.Ranking.conformalThreshold(
      (1 to 20).flatMap(g => (1L to 200L).map(i =>
        (s"g$g", g * 1000L + i, i * 31 % 211))).toDF("g", "id", "v"),
      "g", "v", subBucket = expr("v DIV 32"), idCol = "id",
      alphaNum = 1L, alphaDen = 10L)
    cf.collect()
    val cfPlan = cf.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!cfPlan.contains("CartesianProduct"), s"conformal joins are equi:\n$cfPlan")
    assert(cfPlan.contains("partial_count"),
      s"conformal sizes partial-aggregate:\n$cfPlan")
  }

  test("round-8c operators: ivf candidate fetch is an equi-join, kmeans update partial-aggregates, logrank/cmh collapse before windows") {
    import spark.implicits._

    // ivf: the probe list is plan metadata (no join to rank centroids);
    // the only join is the equi-join on the cluster id; the top-k window
    // partitions by query — nothing cartesian, nothing single-partition
    val rnd = new scala.util.Random(43)
    val emb = (1L to 2000L).map(i =>
      (i, Array.fill(8)(rnd.nextInt(1000).toFloat))).toDF("vec_id", "embedding")
    val ivf = graft.operators.Similarity.ivfExactTopK(
      emb.where(col("vec_id") % 200 === 0), emb, "vec_id", "embedding",
      k = 5, nCentroids = 4, rounds = 1, probes = 2)
    ivf.collect()
    val iPlan = ivf.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!iPlan.contains("CartesianProduct"), s"ivf fetch stays equi:\n$iPlan")
    assert(!iPlan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      s"ivf top-k partitions by query:\n$iPlan")

    // kmeans: the emitted table's sizes branch partial-aggregates over
    // the narrow assignment projection (model-in-the-plan: no join
    // anywhere on the data path)
    val km = graft.operators.Similarity.kmeansExact(
      emb, "vec_id", "embedding", k = 4, rounds = 1)
    km.collect()
    val kPlan = km.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(kPlan.contains("partial_count"),
      s"kmeans sizes partial-aggregate:\n$kPlan")
    assert(!kPlan.contains("CartesianProduct"), s"kmeans joins broadcast:\n$kPlan")

    // logrank: both cohorts collapse to day histograms (partial-agg)
    // BEFORE the day-universe windows; totals attach by broadcast
    val ca = (1 to 3000).map(i => (i % 60L, i % 3 != 0)).toDF("dur", "ev")
    val cb = (1 to 2500).map(i => (i % 45L, i % 4 != 0)).toDF("dur", "ev")
    val lr = graft.operators.Survival.logRank(ca, cb, col("dur"), col("ev"))
    lr.collect()
    val lPlan = lr.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(lPlan.contains("partial_sum") || lPlan.contains("partial_count"),
      s"logrank histograms partial-aggregate:\n$lPlan")
    assert(!lPlan.contains("SortMergeJoin"),
      s"logrank totals attach by broadcast:\n$lPlan")

    // cmh/wilson: one conditional-sum groupBy each, no window at all on
    // the data path, no cartesian beyond the 1-row broadcast attaches
    val rows = (1 to 5000).map(i =>
      (s"s${i % 7}", i % 2 == 0, i % 3 == 0)).toDF("g", "x", "y")
    val cmh = graft.operators.Eval.cmhTest(rows, "g", col("x"), col("y"))
    cmh.collect()
    val cPlan = cmh.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(cPlan.contains("partial_sum"), s"cmh cells partial-aggregate:\n$cPlan")
    assert(!cPlan.contains("Window"), s"cmh carries no window:\n$cPlan")
    val wil = graft.operators.Eval.wilsonInterval(rows, "g", col("x"))
    wil.collect()
    val wPlan = wil.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(wPlan.contains("partial_count") && !wPlan.contains("Window"),
      s"wilson is one aggregate:\n$wPlan")
  }

  test("persisted IVF probe partition-prunes: only the probed cluster directories are scanned") {
    import spark.implicits._
    import graft.operators.Similarity
    // 4 well-separated 2-D clusters; the single query sits on cluster 1,
    // so with probes = 2 only two of four cluster=N/ directories may be
    // read — the static isin must surface as PartitionFilters on the scan
    val pts = (Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(100f, 0f)), (4L, Array(101f, 0f)),
      (5L, Array(0f, 100f)), (6L, Array(1f, 100f)),
      (7L, Array(100f, 100f)), (8L, Array(101f, 100f))) ++
      (9L to 40L).map(i => (i, Array((i % 4 / 2 * 100 + i % 2).toFloat,
        (i % 4 % 2 * 100).toFloat))))
      .toDF("vec_id", "embedding")
    val dirTmp = java.nio.file.Files.createTempDirectory("graft_ivf_scale").toString
    val (cents, posts) = Similarity.ivfIndexBuild(pts, "vec_id", "embedding",
      nCentroids = 4, rounds = 2)
    graft.sources.Tables.writePartitioned(posts, s"$dirTmp/postings", "cluster")
    val centsRead = cents.localCheckpoint()
    val queries = Seq((100L, Array(0.5f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.ivfProbeTopK(queries, centsRead,
      spark.read.parquet(s"$dirTmp/postings"), "vec_id", "embedding",
      k = 5, probes = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("postings"))
      .getOrElse(fail(s"no postings FileScan in plan:\n$plan"))
    assert(scanLine.contains("PartitionFilters: [cluster"),
      s"probed-bucket isin must partition-prune the postings scan:\n$scanLine")
    // and functionally: the probe restriction is real — served neighbors
    // come from at most `probes` distinct clusters of the postings table
    val posted = spark.read.parquet(s"$dirTmp/postings")
      .select(col("id"), col("cluster").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val servedClusters = out.collect().map(r => posted(r.getLong(2))).toSet
    assert(servedClusters.nonEmpty && servedClusters.size <= 2,
      s"neighbors must come from the probed buckets only: $servedClusters")
  }

  test("pipeline report reads the corpus once: stage frames checkpointed at fan-out") {
    // q112's scale property: the four stage counts fan out over shared
    // lineage; without the s1/s2 localCheckpoints the executed plan held
    // EIGHTEEN full-width parquet scans of `documents` (re-running exact
    // dedup and the containment shingle join once per downstream branch).
    // Checkpointing caps the corpus reads at the ≤2 the algebra needs.
    val df = SparkEntry.queries("q112_pipeline_report")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val docScans = plan.linesIterator.count(l =>
      (l.contains("FileScan parquet") || l.contains("Scan parquet")) &&
        l.contains("documents.parquet"))
    assert(docScans <= 2, s"expected <=2 documents scans, got $docScans:\n$plan")
  }

  test("jonckheereTerpstra plan: data collapses to cells in one partial-agg pass; no data-sized single-partition window") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val pts = (0L to 4L).flatMap { g =>
      (1 to 2000).map(_ => (g, rnd.nextInt(300).toLong + g)) }.toDF("g", "v")
    val jt = graft.operators.Eval.jonckheereTerpstra(pts, col("g"), col("v"),
      bucketOf = v => shiftright(v, 4), checkpoint = false)
    jt.collect()
    val plan = jt.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the only data-sized pass is the (group, value) cell aggregation —
    // it must partial-aggregate map-side
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"cell histogram must partial-aggregate:\n$plan")
    // every window carries a partition: within-group cumulatives ride
    // (group, bucket), the cross-group sweep rides the value — the only
    // SinglePartition work is the 1-row final aggregate, never a Window
    assert(!plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      s"JT windows must stay partitioned:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"JT joins are equi/broadcast (dense frame broadcasts the k groups):\n$plan")
  }

  test("round-10 stats plans: mood median/scale collapse to histograms, page-hinkley windows stay group-partitioned") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)

    // mood median: one partial-agg cell pass; the median read and the
    // 2×k table never open a data-sized single-partition window
    val mm = graft.operators.Eval.moodMedianTest(
      (1 to 4000).map(i => (s"g${i % 3}", rnd.nextInt(200).toLong)).toDF("g", "v"),
      "g", col("v"), bucketOf = v => shiftright(v, 4), checkpoint = false)
    mm.collect()
    val mmPlan = mm.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(mmPlan.contains("partial_count") || mmPlan.contains("partial_sum"),
      s"mood median cells must partial-aggregate:\n$mmPlan")
    assert(!mmPlan.contains("CartesianProduct"), s"mood median joins:\n$mmPlan")

    // mood scale: mannWhitney's shape — the only unpartitioned window is
    // the model-sized bucket-offset spine
    val ms = graft.operators.Eval.moodScaleTest(
      (1 to 4000).map(i => (rnd.nextInt(300).toLong, i % 2 == 0)).toDF("v", "p"),
      col("v"), col("p"), bucketOf = v => shiftright(v, 4), checkpoint = false)
    ms.collect()
    val msPlan = ms.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(msPlan.contains("partial_count") || msPlan.contains("partial_sum"),
      s"mood scale histogram must partial-aggregate:\n$msPlan")
    assert(!msPlan.contains("CartesianProduct"), s"mood scale joins:\n$msPlan")

    // page-hinkley: every window carries the group partition; the final
    // summary partial-aggregates; the alarm join is equi
    val ph = graft.operators.Anomaly.pageHinkley(
      (1 to 40).flatMap(g => (1L to 60L).map(t =>
        (s"g$g", t, if (t > 30) 20L else 5L))).toDF("g", "t", "y"),
      "g", col("t"), col("y"), 5000000L, 500000L, 20000000L)
    ph.collect()
    val phPlan = ph.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!phPlan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      s"page-hinkley windows partition by group:\n$phPlan")
    assert(!phPlan.contains("CartesianProduct"), s"page-hinkley joins are equi:\n$phPlan")
  }

  test("distribution-distance plans: W1/CvM/energy ride the histogram, no pair join, no data-sized single-partition window") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val pts = (1 to 4000).map(i => (rnd.nextInt(300).toLong, i % 2 == 0)).toDF("v", "p")

    def check(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("partial_count") || plan.contains("partial_sum"),
        s"$name histogram must partial-aggregate:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name must not open a pair join (the prefix sums replace it):\n$plan")
      // every unpartitioned window sits on the bucket spine (model-sized):
      // the data-sized windows all carry the _b partition
      val winLines = plan.linesIterator.filter(_.contains("Window")).toSeq
      assert(winLines.forall(l => !l.contains("SinglePartition") ||
        l.contains("_b")), s"$name unpartitioned window off the spine:\n$plan")
    }
    check("wasserstein1", graft.operators.Eval.wasserstein1(
      pts, col("v"), col("p"), bucketOf = v => shiftright(v, 4), checkpoint = false))
    check("cramerVonMises", graft.operators.Eval.cramerVonMises(
      pts, col("v"), col("p"), bucketOf = v => shiftright(v, 4), checkpoint = false))
    check("energyDistance", graft.operators.Eval.energyDistance(
      pts, col("v"), col("p"), bucketOf = v => shiftright(v, 4), checkpoint = false))
    // conover adds the k-row group-center broadcast join and the
    // cells->score equi join; same histogram discipline applies
    val gpts = (1 to 4000).map(i =>
      (s"g${i % 4}", rnd.nextInt(300).toLong)).toDF("g", "y")
    check("conoverSquaredRanks", graft.operators.Eval.conoverSquaredRanks(
      gpts, "g", col("y"), bucketOf = v => shiftright(v, 4), checkpoint = false))
  }

  test("semDedup/dsirSelect plans: cluster-bounded pair join, broadcast model scoring, TakeOrdered cut") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)

    // semDedup: the pair join must be an equi-join on the cluster id —
    // never a cartesian/all-pairs product; assignment partial-aggregates
    val vecs = (1L to 300L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() - 0.5).toFloat))).toDF("vec_id", "embedding")
    val sd = graft.operators.Similarity.semDedup(vecs, "vec_id", "embedding",
      k = 4, rounds = 1, threshold = 0.9)
    sd.collect()
    val sdPlan = sd.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!sdPlan.contains("CartesianProduct"),
      s"semDedup pair join must stay cluster-keyed:\n$sdPlan")

    // semDedupCoarseFine: same tail contract — the pair join stays an
    // equi-join on the cluster id; the only nested-loop join in the plan
    // is the 1-row broadcast model attach (coarse→fine routing rides ONE
    // broadcast row, zero shuffles before the pair stage)
    val sh = graft.operators.Similarity.semDedupCoarseFine(vecs, "vec_id",
      "embedding", targetClusterSize = 40, rounds = 1, threshold = 0.9)
    sh.collect()
    val shPlan = sh.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!shPlan.contains("CartesianProduct"),
      s"coarse-fine pair join must stay cluster-keyed:\n$shPlan")

    // semDedupBlocked: the candidate union is still TWO equi-joins
    // (cluster id, LSH bucket string) — the LSH composition must not
    // smuggle in a cartesian; the only nested-loop is the 1-row model
    val sb = graft.operators.Similarity.semDedupBlocked(vecs, "vec_id",
      "embedding", targetClusterSize = 40, rounds = 1, threshold = 0.9,
      planes = 4)
    sb.collect()
    val sbPlan = sb.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!sbPlan.contains("CartesianProduct"),
      s"blocked composition must stay equi-join blocked:\n$sbPlan")

    // dsirSelect: the F-row scoring model broadcasts onto the doc
    // histogram, the cut is a distributed top-k (TakeOrdered), and the
    // histogram partial-aggregates before any exchange
    val docs = (1L to 400L).map(i =>
      (i, s"tok${i % 7} tok${i % 13} tok${i % 3} filler$i")).toDF("doc_id", "text")
    val ds = graft.operators.Sampling.dsirSelect(docs,
      docs.where(col("doc_id") % 3 === 0), "doc_id", "text",
      features = 256, k = 20)
    ds.collect()
    val dsPlan = ds.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(dsPlan.contains("TakeOrdered"),
      s"dsir cut must be a distributed top-k heap:\n$dsPlan")
    assert(dsPlan.contains("BroadcastHashJoin"),
      s"dsir model join must broadcast the F-row model:\n$dsPlan")
    assert(dsPlan.contains("partial_count") || dsPlan.contains("partial_sum"),
      s"dsir histogram must partial-aggregate:\n$dsPlan")
    assert(!dsPlan.contains("CartesianProduct"), s"dsir joins:\n$dsPlan")
  }

  test("andersonDarlingK/poissonBootstrapCi plans: histogram discipline, group-partitioned windows, partial aggregation") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)

    // AD: jonckheere's dense-frame shape — partial-agg cells, every
    // unpartitioned window on a model-sized spine, no pair join
    val ad = graft.operators.Eval.andersonDarlingK(
      (1 to 4000).map(i => (s"g${i % 3}", rnd.nextInt(200).toLong)).toDF("g", "v"),
      "g", col("v"), bucketOf = v => shiftright(v, 4), checkpoint = false)
    ad.collect()
    val adPlan = ad.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(adPlan.contains("partial_count") || adPlan.contains("partial_sum"),
      s"AD cells must partial-aggregate:\n$adPlan")
    assert(!adPlan.contains("CartesianProduct"), s"AD joins:\n$adPlan")

    // bootstrap: the ×B fan-out is a Generate, (group, replicate) sums
    // partial-aggregate, and the rank window carries the group partition
    val bs = graft.operators.Sampling.poissonBootstrapCi(
      (1L to 2000L).map(i => (s"g${i % 4}", i, rnd.nextInt(100).toLong))
        .toDF("g", "id", "y"), "g", col("id"), col("y"), b = 16)
    bs.collect()
    val bsPlan = bs.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(bsPlan.contains("Generate"),
      s"bootstrap fan-out must be a Generate, not a join:\n$bsPlan")
    assert(bsPlan.contains("partial_sum"),
      s"bootstrap replicate sums must partial-aggregate:\n$bsPlan")
    assert(!bsPlan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      s"bootstrap rank window must stay group-partitioned:\n$bsPlan")
    assert(!bsPlan.contains("CartesianProduct"), s"bootstrap joins:\n$bsPlan")
  }

  test("hoeffdingSplitScan plan: group-keyed triangular join, group-partitioned windows, partial-agg summaries") {
    import spark.implicits._
    val series = (1 to 8).flatMap(g => (1L to 50L).map(t =>
      (s"g$g", t, 300000L + (t % 11) * 500L))).toDF("g", "t", "y")
    val hs = graft.operators.Anomaly.hoeffdingSplitScan(series, "g",
      col("t"), col("y"))
    hs.collect()
    val plan = hs.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the T^2/2 split check joins on the GROUP key — never a cartesian
    assert(!plan.contains("CartesianProduct"),
      s"split pairs must stay group-keyed:\n$plan")
    // prefix sums and ranks carry the group partition
    assert(!plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("SinglePartition")),
      s"scan windows must stay group-partitioned:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count") ||
      plan.contains("partial_max"),
      s"per-prefix and per-group summaries must partial-aggregate:\n$plan")
    // maxSteps pins the step universe entering the triangular join: the
    // pair cost is maxSteps²/2 per group, not T²/2 on a long-lived series
    val capped = graft.operators.Anomaly.hoeffdingSplitScan(series, "g",
      col("t"), col("y"), maxSteps = 10)
    assert(capped.collect().forall(_.getLong(1) == 10L),
      "capped scan must see exactly the recent-horizon steps")
  }

  test("hitsInt cuts the raw half-round frames: strictly less stage work than the uncut shape") {
    // Each half-round's rawAuth/rawHub feeds its own max agg AND the data
    // path; Spark does not reuse that exchange across consumers, so the
    // uncut shape re-executes the edge join+agg per consumer. hitsInt
    // localCheckpoints the node-sized raw frames — assert the fix holds by
    // comparing SUBMITTED STAGES against an inline reimplementation of the
    // uncut round (self-calibrating: no absolute stage counts pinned).
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
    val edges = (1L to 400L).map(i => (i % 40, (i * 17) % 53)).toDF("src", "dst")
    def uncutHits(iterations: Int): org.apache.spark.sql.DataFrame = {
      val e = edges.select(col("src"), col("dst")).distinct()
        .repartition(col("src")).persist()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist()
      var scores = nodes.select(col("node"),
        lit(1000000L).as("hub_fp"), lit(1000000L).as("auth_fp")).localCheckpoint()
      for (_ <- 1 to iterations) {
        val rawAuth = e
          .join(scores.select(col("node").as("src"), col("hub_fp")), Seq("src"))
          .groupBy(col("dst")).agg(sum(col("hub_fp")).as("raw"))
        val auth = rawAuth
          .crossJoin(broadcast(rawAuth.agg(max(col("raw")).as("mx"))))
          .select(col("dst").as("node"), expr("(raw * 1000000L) DIV mx").as("auth_fp"))
        val rawHub = e
          .join(auth.select(col("node").as("dst"), col("auth_fp")), Seq("dst"))
          .groupBy(col("src")).agg(sum(col("auth_fp")).as("raw"))
        val hub = rawHub
          .crossJoin(broadcast(rawHub.agg(max(col("raw")).as("mx"))))
          .select(col("src").as("node"), expr("(raw * 1000000L) DIV mx").as("hub_fp"))
        scores = nodes.join(hub, Seq("node"), "left").join(auth, Seq("node"), "left")
          .select(col("node"), coalesce(col("hub_fp"), lit(0L)).as("hub_fp"),
            coalesce(col("auth_fp"), lit(0L)).as("auth_fp"))
          .localCheckpoint()
      }
      e.unpersist(); nodes.unpersist()
      scores
    }
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        counter.incrementAndGet()
    }
    def stagesFor(f: => org.apache.spark.sql.DataFrame): (Int, Seq[String]) = {
      spark.sparkContext.addSparkListener(listener)
      try {
        counter.set(0)
        val rows = f.orderBy("node").collect().map(_.toString).toSeq
        Thread.sleep(800) // let the async listener bus drain
        (counter.get(), rows)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val (cutStages, cutRows) =
      stagesFor(graft.operators.Graph.hitsInt(edges, "src", "dst", iterations = 3))
    val (uncutStages, uncutRows) = stagesFor(uncutHits(3))
    assert(cutRows == uncutRows, "cut and uncut shapes must agree exactly")
    assert(cutStages < uncutStages,
      s"checkpointed raw frames must do less stage work: cut=$cutStages uncut=$uncutStages")
  }

  test("enrichment consumers scan the persisted table: no regex/tokenizer in the plan, unused columns pruned") {
    // q189's feature frame re-pointed at the shared persisted
    // enrichment: the consumer side must be a bare column-pruned read of
    // the narrow parquet — the langid regex/tokenizer runs ONCE in the
    // build, never in a consumer plan (the MI chains checkpoint this
    // frame, so the executed plan of the FED frame is what matters)
    val feats = graft.operators.Enrich.enrichedDocuments(spark, sf0001)
      .select(col("langid").as("f_langid"),
        expr("n_chars DIV 256").cast("string").as("f_len"),
        col("source").as("f_source"), col("lang"))
    feats.collect()
    val plan = feats.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("regexp_extract_all") && !plan.contains("split("),
      s"consumer plan must not re-run the scorer:\n$plan")
    val scans = plan.linesIterator
      .filter(l => l.contains("Scan") && l.contains("parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("graft_enrich_cache")),
      s"consumer must scan the enriched table only:\n$plan")
    // column pruning: this consumer never touches quality/token columns
    assert(!plan.contains("quality"),
      s"unused enriched columns must prune from the scan:\n$plan")
    // and the gated query itself stays green end to end
    assert(SparkEntry.queries("q189_info_gain")(spark, sf0001).count() == 3L)
  }
}

