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

  /** Exact triangle count over an undirected graph, by DEGREE-ORDERED
    * orientation (Schank & Wagner 2005 "forward"; the MapReduce form is
    * Suri & Vassilvitskii, WWW 2011 — the standard way to make triangle
    * counting survive skew). Input edges may be directed/duplicated/
    * self-looped; they are canonicalized to distinct undirected pairs
    * first.
    *
    * Why orientation matters at 100 TB: the naive wedge join generates
    * Σ deg(v)² candidates — a single celebrity node with 10⁸ neighbors
    * yields 10¹⁶ wedges. Orienting every edge from the lower-(degree, id)
    * endpoint to the higher one makes each triangle countable exactly once
    * from its lowest-ranked vertex, and bounds every node's OUT-degree by
    * O(√m): the wedge join becomes Σ outdeg(v)² ≤ m·√m total work no
    * matter how skewed the in-degrees are. All three steps are plain
    * equi-joins Catalyst can plan (wedge join on the pivot, closing join
    * on the (v, w) pair key — both partial-hash-partitionable); nothing is
    * quadratic in a partition.
    *
    * Returns a single row `(n_nodes, n_edges, n_triangles)` — all exact
    * BIGINTs, oracle-checkable against the a<b<c triple join. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    // undirected degree: each canonical edge contributes to both endpoints
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) → high-(deg, id); carry the head's rank so the
    // wedge join can order its two heads without re-joining degrees
    val oriented = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), Seq("b"))
      .select(
        when(struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("deg_b").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"), col("deg_a").as("dv")))
          .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"), col("o.dv").as("dv"))
    // wedges from the lowest-ranked vertex u: unordered head pairs {v, w}
    // taken once (rank(v) < rank(w)); closing edge v→w is oriented too
    val left = oriented.select(col("u"), col("v"), col("dv"))
    val right = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = left.join(right, Seq("u"))
      .where(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .select(col("v"), col("w"))
    val closed = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"), "left_semi")
    canon.select(count(lit(1)).as("n_edges")).crossJoin(
        deg.select(count(lit(1)).as("n_nodes")))
      .crossJoin(closed.select(count(lit(1)).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
