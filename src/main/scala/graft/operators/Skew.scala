package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins with hot keys.
  *
  * AQE's skew-join handling (on by default) splits oversized shuffle
  * partitions at runtime and is the first line of defense. Explicit salting
  * remains the tool when a single KEY (not just a partition) is hot — e.g.
  * a null-ish default key holding 5% of 100 TB: the big side spreads each
  * key over `salts` sub-keys, the small side replicates each row `salts`
  * times, and the join key becomes (key, salt). Join results are identical
  * to the unsalted join; only the partitioning changes. */
object Skew {

  /** The big-side salt: derived from a per-row id, so it is uniform over
    * rows regardless of the key's distribution — a hot key's rows land on
    * all `salts` sub-keys in equal shares. Deterministic within a run, and
    * the join RESULT is independent of the salt values. Exposed so specs
    * can measure the (key, salt) histogram the join actually shuffles on. */
  private[graft] def saltCol(salts: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int")

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key across
    * `salts` sub-partitions. `small` is replicated ×salts — keep it the
    * dimension side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, how: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full-outer would emit `salts` copies of unmatched small-side
    // rows (each salted replica misses independently) — only join types
    // whose output is driven by the big side preserve unsalted semantics
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")
      .contains(how.toLowerCase),
      s"saltedJoin preserves semantics only for big-side-driven joins, got '$how'")
    val b = big.withColumn("_salt", saltCol(salts))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "_salt"), how).drop("_salt")
  }
}
