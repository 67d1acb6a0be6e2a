package graft.tools

import graft.operators.Similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-at-scale evidence for the approximate ANN paths (q22 LSH,
  * q36 IVF, q67 quantized IVF): the driver's correctness gate records these
  * queries rows-only (approximate by design), and the recall specs run at
  * test scale — this tool closes the "does the approximation hold at
  * scale?" question by measuring recall@10 of the EXACT gate
  * configurations against brute-force cosine top-10 on the real
  * embeddings table of any scale factor.
  *
  * Usage: runMain graft.tools.RecallAtScale <sfDir> [<sfDir> ...]
  *
  * Prints one JSON line per directory:
  *   {"dir":"...","queries":N,"q22_lsh":r,"q36_ivf":r,"q67_ivf_quantized":r}
  *
  * Exits nonzero if any recall falls below the floors asserted at spec
  * scale (OperatorsSpec): LSH-with-multiprobe ≥ 0.3 on diffuse real
  * embeddings; the IVF paths ≥ their probed-fraction baseline (probes /
  * nCentroids = 0.25) — diffuse vectors spread near-uniformly over the
  * Voronoi cells, so scanning a quarter of the corpus must find at least
  * a quarter of the true neighbors (the query's OWN cell is always
  * probed first, which is why measured recall sits well above this). */
object RecallAtScale {
  // the sf0.01-proven floors (see OperatorsSpec LSH/IVF recall tests)
  val FloorLsh = 0.3
  val FloorIvf = 0.25
  val FloorIvfQuantized = 0.25

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failed = false
    dirs.foreach { dir =>
      val emb = graft.sources.Tables.embeddings(spark, dir)
        .localCheckpoint(eager = true) // one read; three searches + truth
      val queries = emb.where(col("vec_id") % 100 === 0)
        .localCheckpoint(eager = true)
      val nq = queries.count()

      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val exact = pairs(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10))

      def recall(approx: Set[(Long, Long)]): Double =
        if (exact.isEmpty) 1.0 else (exact & approx).size.toDouble / exact.size

      // the three gate configurations, verbatim from SparkEntry q22/q36/q67
      val rLsh = recall(pairs(Similarity.lshTopK(queries, emb, "vec_id", "embedding",
        k = 10, planes = 6, tables = 4, dim = graft.SparkEntry.EmbeddingDim, multiprobe = 3)))
      val rIvf = recall(pairs(Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 10, nCentroids = 16, probes = 4, iterations = 2)))
      val rQuant = recall(pairs(Similarity.ivfTopKQuantized(queries, emb, "vec_id", "embedding",
        k = 10, nCentroids = 16, probes = 4)))

      println(f"""{"dir":"$dir","queries":$nq,"q22_lsh":$rLsh%.4f,"q36_ivf":$rIvf%.4f,"q67_ivf_quantized":$rQuant%.4f}""")
      if (rLsh < FloorLsh || rIvf < FloorIvf || rQuant < FloorIvfQuantized) {
        System.err.println(s"[recall] FLOOR VIOLATION at $dir: " +
          s"lsh=$rLsh (>= $FloorLsh), ivf=$rIvf (>= $FloorIvf), quant=$rQuant (>= $FloorIvfQuantized)")
        failed = true
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
