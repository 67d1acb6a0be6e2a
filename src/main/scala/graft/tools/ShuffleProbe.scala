package graft.tools

import graft.functions.Text
import graft.sources.Tables

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: shuffle-byte accounting for the inverted-index posting
  * aggregation, raw-string keys vs 8-byte hashed keys (Dedup.shingleKey).
  * Wall time at small SF barely moves (both fit in page cache on one box);
  * the number that matters for the 100 TB design is bytes through the
  * exchange. Usage: sbt "runMain graft.tools.ShuffleProbe /root/testdata/sf0.1" */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    val docs = Tables.documents(spark, dir).cache()
    docs.count()

    def run(name: String)(postings: org.apache.spark.sql.DataFrame): Unit = {
      shuffleWrite = 0L
      val t0 = System.nanoTime()
      val n = postings.count()
      Thread.sleep(500) // let the listener bus drain stage-completed events
      println(f"[probe] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"shuffle ${shuffleWrite / 1024.0 / 1024.0}%8.2f MiB  ($n buckets)")
    }

    val exploded = docs.select(col("doc_id").as("id"),
      explode(array_distinct(Text.fastWordShingles(col("text"), 3))).as("s"))
    for (_ <- 0 until 2) {
      run("string-key")(exploded.groupBy(col("s"))
        .agg(sort_array(collect_list(col("id"))).as("ids")).where(size(col("ids")) <= 50))
      run("hashed-key")(exploded
        .select(col("id"), graft.operators.Dedup.shingleKey(col("s")).as("sh"))
        .groupBy(col("sh"))
        .agg(sort_array(collect_list(col("id"))).as("ids")).where(size(col("ids")) <= 50))
    }

    // decontamination: exact bipartite path (every corpus shingle enters
    // the stop-df exchange) vs bloom-prefiltered path (only the verified
    // sliver shuffles). The wall-clock gap is modest at one-box SF; the
    // exchange-byte gap is the 100 TB argument.
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val probe = docs.where(col("doc_id") % 10 === 0)
    for (_ <- 0 until 2) {
      run("decon-exact")(graft.operators.Dedup.crossCorpusOverlap(
        corpus, probe, "doc_id", "text", 3, 0.5, 50))
      run("decon-bloom")(graft.operators.Dedup.crossCorpusOverlapBloom(
        corpus, probe, "doc_id", "text", 3, 0.5, 50, fpp = 0.01))
    }
    spark.stop()
  }
}
