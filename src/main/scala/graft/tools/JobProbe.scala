package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r13 optimization round): run one registry query and print
  * every Spark job's wall time — shows whether a query's seconds sit in
  * one big job or in dozens of build-time barrier jobs. Not part of the
  * driver contract.
  * Usage: sbt "runMain graft.tools.JobProbe <sfDir> <query> [query...]" */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Int)]
    var stages = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(), js.stageInfos.size))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, ns) =>
          done.synchronized { done += ((je.jobId, (System.nanoTime() - t0) / 1e9, ns)) }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages += 1
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      // warmup
      try graft.SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable => println(s"$n FAILED: $e") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      done.synchronized(done.clear()); stages = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val snap = done.synchronized(done.toList).sortBy(_._1)
      println(f"\n### $n wall=$wall%.2f s, jobs=${snap.size}, stages=$stages")
      snap.foreach { case (id, s, ns) => println(f"  job $id%4d  $s%7.3f s  ($ns stages)") }
      println(f"  sum(job walls) = ${snap.map(_._2).sum}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
