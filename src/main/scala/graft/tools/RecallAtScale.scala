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
  * Exits nonzero if any recall falls below the floors below. The floors
  * are EMPIRICAL: lowest recall measured across sf0.01/sf0.1/sf1
  * (RECALL.md: LSH 0.48-0.64, IVF 0.51-0.55, quantized 0.50-0.55) with
  * roughly 2× slack for dataset-to-dataset noise — a new sf landing at
  * the floor is a real regression signal, not statistical bad luck.
  * (The probed-fraction intuition — 4/16 probes ≈ 0.25 of the corpus
  * scanned for diffuse vectors, query's own cell probed first — explains
  * WHY measured recall sits where it does, but it is an expectation-level
  * heuristic, not a per-dataset guarantee, so the gate does not cite it
  * as a bound.) */
object RecallAtScale {
  // empirical floors: min measured recall across sf0.01..sf1 ÷ ~2 slack
  // (see RECALL.md and the OperatorsSpec LSH/IVF recall tests)
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
