package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution by BLOCKED fuzzy matching — the
  * classical two-phase shape (Fellegi & Sunter 1969; blocking surveyed in
  * Christen, TKDE 2012): a cheap deterministic blocking key bounds the
  * candidate space, then an exact string-distance predicate scores only
  * within-block pairs.
  *
  * ## Scale shape (100 TB)
  * The all-pairs comparison is O(n²) and never runs: candidates exist only
  * inside a block, so the single wide operation is an equi-join on the
  * blocking key — hash-partitioned, AQE-handled, and bounded by
  * Σ |block|² comparison work. `levenshtein` is a codegen'd built-in
  * (no UDF) evaluated after the join filter prunes self/duplicate pairs,
  * and both engines (Spark, DuckDB oracle) compute the identical integer
  * distance, so results are hash-checkable bit for bit. A pathological
  * mega-block degrades like any skewed join key: cap it upstream
  * ([[Sampling.capPerGroup]]'s two-pass recipe) or let AQE split the
  * straggler — the operator itself adds no new skew surface.
  */
object Linkage {

  /** Within-block fuzzy self-join: all pairs `(id_a < id_b)` sharing
    * `blockKey` whose `nameCol` values are within `maxDist` Levenshtein
    * edits. Returns `(id_a, id_b, name_a, name_b, dist)` — exact integers
    * and verbatim strings only.
    *
    * `blockKey` is any deterministic expression over the input row (e.g.
    * a token of the name, a phonetic code, a normalized prefix). Recall
    * is bounded by the blocking choice — pairs in different blocks are
    * never compared; that is the documented trade of the technique, not a
    * defect of the implementation. */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                        blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = df.select(col(idCol).as("_id"), col(nameCol).as("_name"),
      blockKey.as("_blk"))
    val a = base.select(col("_id").as("id_a"), col("_name").as("name_a"), col("_blk"))
    val b = base.select(col("_id").as("id_b"), col("_name").as("name_b"), col("_blk"))
    a.join(b, Seq("_blk"))
      // id ordering halves the pair space and kills self-pairs before the
      // distance evaluates — the join emits only candidate survivors
      .where(col("id_a") < col("id_b"))
      // lossless prune BEFORE any edit-distance work: dist >= |len diff|
      // always, so pairs failing the cheap length check can never match —
      // at a 2k-name block this cuts the expensive evaluations ~in half
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // the thresholded builtin banded-early-exits at maxDist+1 (O(n·k)
      // instead of O(n·m) per pair) and returns -1 above it; within the
      // threshold it IS the exact distance, so oracle parity is untouched
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist") =!= -1)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist").cast("long").as("dist"))
  }
}
