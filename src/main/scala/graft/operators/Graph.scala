package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — PageRank as the canonical
  * power-iteration shape (Page et al. 1999; the Pregel/GraphX pattern
  * re-expressed as DataFrame joins so Catalyst owns the physical plan).
  * Complements [[Dedup]]'s frontier label propagation (q39): that walks
  * components to a fixpoint, this iterates a fixed number of weighted
  * rounds.
  *
  * ## Exactness: fixed-point integers
  * Float PageRank is hash-hostile twice over (order-dependent double sums
  * and libm division ulps), so ranks live in integer fixed-point: a node
  * starts at `scale` (10⁶ = one "micro-rank"), each round routes
  * `rank DIV outdeg` along every edge (exact floor division) and damps
  * with integer arithmetic: `new = (scale·(den−num)) DIV den +
  * (num·Σcontrib) DIV den`. Every operation is BIGINT on both engines, so
  * a DuckDB oracle chaining the same rounds through CTEs is bit-exact —
  * same trick as LmScore's micro-nats, pushed through an iteration.
  * Truncation loses < 1 micro-rank per edge per round — noise three
  * orders below any ranking use; determinism is what the gate (and any
  * reproducible pipeline) needs.
  *
  * ## Scale shape (100 TB)
  * Per round: one equi-join of the rank table (node-sized) against the
  * edge list on src, one partial-aggregable sum on dst, one left join
  * back onto the node table (sinks and sources keep receiving the
  * teleport mass). Edges are the big side and are REUSED unchanged every
  * round — `iterate` repartitions them on src once and persists, so
  * rounds 2+ join against cached co-partitioned edges with no fresh
  * edge-scale exchange (on a cluster: bucket the edge table on src, same
  * effect durable across jobs). Ranks are localCheckpointed per round —
  * the iteration-count lineage blowup (and re-execution risk) dies
  * there. Nothing is ever quadratic; no driver-side collect of anything
  * data-sized. */
object Graph {

  /** `iterations` rounds of damped integer PageRank over a directed edge
    * list (dedup'd internally). Nodes = src ∪ dst. Returns (node,
    * rank_fp) with rank_fp in fixed-point `scale` units. Dangling nodes
    * (no out-edges) leak their mass — the classic simplification; the
    * teleport term keeps every node positive.
    *
    * `checkpoint = false` keeps the full lineage (specs inspect the
    * per-round plan shape through it); production leaves it on — an
    * uncheckpointed 20-round lineage re-executes from the scan on any
    * retry and the plan grows without bound. */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iterations: Int, dampNum: Long = 85L, dampDen: Long = 100L,
                  scale: Long = 1000000L, checkpoint: Boolean = true): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampNum > 0 && dampNum < dampDen, "need 0 < dampNum < dampDen")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      // one shuffle up front; every round's src-join reuses this layout
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val teleport = (scale * (dampDen - dampNum)) / dampDen
    def cut(df: DataFrame): DataFrame =
      if (checkpoint) df.localCheckpoint() else df

    var ranks = cut(nodes.withColumn("rank_fp", lit(scale)))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        // DIV keeps everything BIGINT — `/` on longs would detour through
        // double and lose exactness past 2^53
        .select(col("dst"), expr("rank_fp DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_fp"))
      ranks = cut(nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          expr(s"${teleport}L + (${dampNum}L * coalesce(in_fp, 0L)) DIV ${dampDen}L")
            .as("rank_fp")))
    }
    if (checkpoint) { e.unpersist(); nodes.unpersist() }
    // checkpoint=false: the rounds were never materialized, so unpersisting
    // here would strip the cache before the caller's first action and every
    // round would recompute the edge shuffle — leave it pinned (spec path)
    ranks
  }
}
