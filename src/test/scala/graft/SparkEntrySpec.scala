package graft

class SparkEntrySpec extends SparkSuite {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and every oracle key has a query") {
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).count()
    }
    // q06 (anti join) legitimately returns 0 at tiny scale; near-dup pair
    // sets may be empty on the synthetic corpus — everything else must
    // produce rows.
    val allowEmpty = Set("q06_anti_join")
    results.foreach { case (name, n) =>
      assert(n >= 0)
      if (!allowEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("suite-wide determinism: identical results under shuffle.partitions 4 vs 32") {
    // The oracle gate sees ONE run — it cannot catch a query whose result
    // depends on physical partitioning (float merge order, sketch merge
    // order, non-deterministic tiebreaks). This closes that suite-wide:
    // every query map entry, run under two different shuffle widths in the
    // same session, must hash identically row-for-row.
    def hashAll(parts: String): Map[String, String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SparkEntry.queries.map { case (name, fn) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        fn(spark, sf0001).collect().map(_.toString).sorted
          .foreach(r => md.update(r.getBytes("UTF-8")))
        name -> md.digest().map("%02x".format(_)).mkString
      } finally spark.conf.set("spark.sql.shuffle.partitions", "8")
    }
    val narrow = hashAll("4")
    val wide = hashAll("32")
    val diff = narrow.keys.filter(k => narrow(k) != wide(k)).toSeq.sorted
    assert(diff.isEmpty, s"partitioning-sensitive results: ${diff.mkString(", ")}")
  }

  test("Bench sidecar path rule: only a full-suite run may write BENCH_DETAIL.json") {
    // the round-12 clobber incident: a 1-query SPARK_GRAFT_ONLY debug run
    // overwrote the committed 270-query pair artifact. Restricted runs
    // must land on the scratch path the round artifacts never read.
    assert(Bench.detailPath(restricted = false) == "BENCH_DETAIL.json")
    assert(Bench.detailPath(restricted = true) == "BENCH_DETAIL_scratch.json")
  }

  test("q52 approx percentiles honor the GK rank-error bound vs exact ranks") {
    import org.apache.spark.sql.functions._
    val eps = 1.0 / SparkEntry.ApproxPercentileAccuracy
    val approx = SparkEntry.queries("q52_approx_percentiles")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.nonEmpty)
    // GK contract: the returned value occupies some rank r in the group's
    // sorted values with |r - p*n| <= eps*n. The returned value is an
    // actual data value (no interpolation), so check rank windows directly:
    // its highest possible rank (#values <= v) must reach (p - eps)*n, and
    // its lowest possible rank (#values < v, +1) must not exceed (p + eps)*n.
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag").as("g"),
        (round(col("l_extendedprice") * 100)).cast("long").as("v"))
    approx.foreach { case (g, a) =>
      val n = a.getLong(3).toDouble
      Seq(0.5 -> a.getLong(1), 0.95 -> a.getLong(2)).foreach { case (p, v) =>
        val r = li.where(col("g") === g)
          .agg(sum(when(col("v") <= v, 1L).otherwise(0L)).as("le"),
            sum(when(col("v") < v, 1L).otherwise(0L)).as("lt"))
          .head()
        val (le, lt) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
        assert(le >= (p - eps) * n - 1 && lt + 1 <= (p + eps) * n + 1,
          s"$g p=$p: value $v spans ranks [${lt + 1}, $le] outside " +
            s"[${(p - eps) * n}, ${(p + eps) * n}] of n=$n")
      }
    }
  }
}
