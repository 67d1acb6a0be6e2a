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
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
}
