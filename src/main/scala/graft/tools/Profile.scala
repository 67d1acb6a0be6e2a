package graft.tools

import graft.functions.Text
import graft.operators.Dedup
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: sub-stage timings for the hot queries. Not part of the driver
  * contract. Usage: sbt "runMain graft.tools.Profile /root/testdata/sf0.1" */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (args.contains("--aqe")) builder.config("spark.sql.adaptive.enabled", "true")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }

    val docs = Tables.documents(spark, dir)
    if (!args.contains("--no-cache")) docs.cache().count()

    // --plan qNN_name: execute the query, print the EXECUTED physical plan
    // (post-AQE join strategies — where static-stats mis-broadcasts show)
    args.sliding(2).collectFirst { case Array("--plan", q) => q }.foreach { q =>
      graft.GraftFunctions.ensureRegistered(spark)
      val out = graft.SparkEntry.queries(q)(spark, dir)
      // execute THIS df's own QueryExecution (a .count() would build a
      // separate one, and the printed AdaptiveSparkPlan would still show
      // the pre-AQE static strategies with isFinalPlan=false)
      out.collect()
      println(out.queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    if (args.contains("--q20")) { q20Breakdown(spark, docs); spark.stop(); return }
    time("minhash full COLD")(Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())

    time("tokens explode")(docs.select(explode(Text.tokens(col("text")))).count())
    time("shingles explode")(docs.select(explode(Text.wordShingles(col("text"), 3))).count())
    time("shingles explode x16 md5")(
      docs.select(col("doc_id"), explode(Text.wordShingles(col("text"), 3)).as("sh"))
        .select((0 until 16).map(i => md5(concat(col("sh"), lit(s"|$i"))).as(s"h$i")): _*).count())
    time("minhash signatures")(Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16).count())
    val sigsP = Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16)
    time("minhash: banded")(sigsP.select(col("id"), col("sig"),
      explode(Dedup.lshBandKeys(col("sig"), 16, 4)).as("band")).count())
    time("minhash: band buckets")(sigsP.select(col("id"), col("sig"),
      explode(Dedup.lshBandKeys(col("sig"), 16, 4)).as("band"))
      .groupBy(col("band")).agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("xs"))
      .where(size(col("xs")) >= 2).count())
    time("minhash full")(Dedup.minHashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    time("q18 via SparkEntry")(graft.SparkEntry.queries("q18_minhash_lsh")(spark, dir).count())
    time("q18 via SparkEntry 2nd")(graft.SparkEntry.queries("q18_minhash_lsh")(spark, dir).count())
    time("simhash table")(Dedup.simHashTable(docs, "doc_id", "text", 32).count())
    graft.GraftFunctions.ensureRegistered(spark)
    val exploded = docs.select(col("doc_id").as("id"),
      explode(array_distinct(Text.fastWordShingles(col("text"), 3))).as("sh"))
    time("ngram: exploded")(exploded.count())
    val buckets = exploded.groupBy(col("sh")).agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2 && size(col("ids")) <= 50)
    time("ngram: buckets")(buckets.count())
    val nn = size(col("ids"))
    val combos = flatten(transform(sequence(lit(0), nn - 2), i =>
      transform(slice(col("ids"), i + 2, nn - (i + 1)), b =>
        struct(element_at(col("ids"), i + 1).as("id_a"), b.as("id_b")))))
    time("ngram: pairs")(buckets.select(explode(combos).as("p"))
      .groupBy(col("p.id_a"), col("p.id_b")).agg(count(lit(1))).count())
    val sizes = exploded.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val shared = buckets.select(explode(combos).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b")).agg(count(lit(1)).as("shared"))
    time("ngram: full no-persist bcast")(shared
      .join(broadcast(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")), Seq("id_a"))
      .join(broadcast(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= 0.5).count())
    time("ngram full")(Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5, 50).count())
    spark.stop()
  }

  /** Stage-by-stage breakdown of the CURRENT (hashed-key) q20 pipeline —
    * run with `--q20`. Each stage timed warm (second run) after a cold
    * pass, so codegen/JIT doesn't masquerade as stage cost. */
  private def q20Breakdown(spark: SparkSession, docs: org.apache.spark.sql.DataFrame): Unit = {
    graft.GraftFunctions.ensureRegistered(spark)
    def warm(name: String)(f: => Long): Unit = {
      f // cold: codegen + JIT
      val t0 = System.nanoTime()
      val n = f
      println(f"[q20] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }
    val exploded = docs.select(col("doc_id").as("id"),
        explode(array_distinct(Text.fastWordShingles(col("text"), 3))).as("s"))
      .select(col("id"), Dedup.shingleKey(col("s")).as("sh"))
    warm("scan+shingle+md5+explode (map side)")(exploded.count())
    // ---- ROUND-4 pipeline (pre-carry-N, REMOVED from Dedup in round 5):
    // kept here as the A/B baseline — its pair-level sizes joins are the
    // stage the carry-N rewrite deleted ----
    locally {
      def mkCheckpoint() = exploded.groupBy(col("sh"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .where(size(col("ids")) <= 50)
        .localCheckpoint(eager = true)
      val throwaway = mkCheckpoint(); throwaway.unpersist(blocking = true) // warm
      val t0 = System.nanoTime()
      val postings = mkCheckpoint()
      println(f"[q20] R4-pair-join posting agg + checkpoint WRITE      ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      val sizes = postings.select(explode(col("ids")).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
      warm("R4-pair-join sizes agg (from checkpoint)")(sizes.count())
      val shared = postings.where(size(col("ids")) >= 2)
        .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
        .select(col("id_a"),
          explode(slice(col("ids"), col("i") + 2, size(col("ids")) - col("i") - 1)).as("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("shared"))
      warm("R4-pair-join pair gen + pair count")(shared.count())
      warm("R4-pair-join final joins + threshold")(shared
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (col("shared").cast("double") /
            (col("n_a") + col("n_b") - col("shared")).cast("double")).as("jaccard"))
        .where(col("jaccard") >= 0.5).count())
      postings.unpersist(blocking = true)
    }
    // ---- SHIPPED (round-5 carry-N) pipeline: n_sh carried inside the posting lists so the
    // pair aggregation emits (id_a, n_a, id_b, n_b) directly — the sizes
    // join happens at the posting-ENTRY level (linear in index size), not
    // the pair level (quadratic in bucket sizes) ----
    locally {
      val postings0 = exploded.groupBy(col("sh"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .where(size(col("ids")) <= 50)
        .localCheckpoint(eager = true)
      val sizes = postings0.select(explode(col("ids")).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
      val buckets = postings0.where(size(col("ids")) >= 2)
        .select(col("sh"), explode(col("ids")).as("id"))
        .join(sizes, Seq("id"))
        .groupBy(col("sh"))
        .agg(sort_array(collect_list(struct(col("id"), col("n_sh")))).as("xs"))
      warm("SHIPPED carry-n re-agg (entry join + collect)")(buckets.count())
      val shared = buckets
        .select(posexplode(col("xs")).as(Seq("i", "a")), col("xs"))
        .select(col("a.id").as("id_a"), col("a.n_sh").as("n_a"),
          explode(slice(col("xs"), col("i") + 2, size(col("xs")) - col("i") - 1)).as("b"))
        .groupBy(col("id_a"), col("b.id").as("id_b"), col("n_a"), col("b.n_sh").as("n_b"))
        .agg(count(lit(1)).as("shared"))
      warm("SHIPPED carry-n pair gen + count + threshold")(shared
        .select(col("id_a"), col("id_b"),
          (col("shared").cast("double") /
            (col("n_a") + col("n_b") - col("shared")).cast("double")).as("jaccard"))
        .where(col("jaccard") >= 0.5).count())
      postings0.unpersist(blocking = true)
    }
    // ---- OLD pipeline (pre-prefix-filter): full posting index, every
    // co-occurrence becomes a pair-count row ----
    val postingsPlan = exploded.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) <= 50)
    warm("OLD posting aggregation")(postingsPlan.count())
    val postings = postingsPlan.localCheckpoint(eager = true)
    val shared = postings.where(size(col("ids")) >= 2)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + 2, size(col("ids")) - col("i") - 1)).as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    warm("OLD pair generation + pair count")(shared.count())
    postings.unpersist(blocking = true)
    // ---- NEW pipeline (prefix filtering) stage by stage ----
    val dfs = exploded.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") <= 50)
    warm("NEW df aggregation")(dfs.count())
    val docSetsPlan = exploded.join(dfs, Seq("sh")).groupBy(col("id"))
      .agg(transform(sort_array(collect_list(struct(col("df"), col("sh")))),
        x => x.getField("sh")).as("shs"))
      .select(col("id"), col("shs"), size(col("shs")).as("n_sh"),
        (size(col("shs")) - ceil(lit(0.5) * size(col("shs"))).cast("int") + 1).as("p"))
    warm("NEW per-doc sets (df join + collect)")(docSetsPlan.count())
    val docSets = docSetsPlan.localCheckpoint(eager = true)
    val candidates = docSets
      .select(col("id"), explode(slice(col("shs"), lit(1), greatest(col("p"), lit(1)))).as("sh"))
      .groupBy(col("sh")).agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + 2, size(col("ids")) - col("i") - 1)).as("id_b"))
      .distinct()
    warm("NEW prefix-index candidates (distinct)")(candidates.count())
    warm("NEW verify (2 joins + array_intersect)")(candidates
      .join(docSets.select(col("id").as("id_a"), col("shs").as("shs_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(docSets.select(col("id").as("id_b"), col("shs").as("shs_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("shs_a"), col("shs_b"))).as("shared"), col("n_a"), col("n_b"))
      .where(col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double") >= 0.5).count())
    docSets.unpersist(blocking = true)
    warm("q20 end-to-end (fresh checkpoint each run)")(
      Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5, 50).count())
  }
}
