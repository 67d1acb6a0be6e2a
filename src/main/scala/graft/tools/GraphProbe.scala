package graft.tools

import graft.sources.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r13 optimization round): phase timings for the iterative
  * graph family — edge build vs rounds vs checkpoint overhead. Not part
  * of the driver contract.
  * Usage: sbt "runMain graft.tools.GraphProbe /root/testdata/sf0.1" */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n)")
    }

    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    def copurchase = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .select(col("pk").as("src"), col("pk2").as("dst"))
    def strongW = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .groupBy(col("pk"), col("pk2")).agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select(col("pk").as("src"), col("pk2").as("dst"), col("w"))

    // warmup JIT/codegen on the shared upstream
    time("warmup copurchase count")(copurchase.count())
    time("copurchase distinct edges")(copurchase.count())
    time("strong (w>=2) edges")(strongW.count())

    time("kCore k=68 (checkpoint=true)")(
      graft.operators.Graph.kCore(copurchase, "src", "dst", k = 68,
        maxRounds = 12).count())
    time("labelProp 4r weighted ckpt=true")(
      graft.operators.Graph.labelPropagation(strongW, "src", "dst",
        rounds = 4, weightCol = Some("w")).count())
    time("labelProp 4r weighted ckpt=false")(
      graft.operators.Graph.labelPropagation(strongW, "src", "dst",
        rounds = 4, weightCol = Some("w"), checkpoint = false).count())
    time("coreNumbers 6r ckpt=true")(
      graft.operators.Graph.coreNumbers(
        strongW.select(col("src"), col("dst")), "src", "dst",
        rounds = 6).count())
    time("coreNumbers 6r ckpt=false")(
      graft.operators.Graph.coreNumbers(
        strongW.select(col("src"), col("dst")), "src", "dst",
        rounds = 6, checkpoint = false).count())
    val pr = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p"), (col("l_suppkey") + lit(1000000L)).as("sn"))
    val prEdges = pr.select(col("p").as("src"), col("sn").as("dst"))
      .union(pr.select(col("sn").as("src"), col("p").as("dst")))
    time("pageRank 3r ckpt=true")(
      graft.operators.Graph.pageRankInt(prEdges, "src", "dst",
        iterations = 3).count())
    time("pageRank 3r ckpt=false")(
      graft.operators.Graph.pageRankInt(prEdges, "src", "dst",
        iterations = 3, checkpoint = false).count())
    spark.stop()
  }
}
