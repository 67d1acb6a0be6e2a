package graft.operators

import graft.functions.Text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT Jaccard-threshold similarity SELF-join via PREFIX FILTERING
  * (Chaudhuri et al. SSJoin, ICDE 2006; Bayardo et al. All-Pairs, WWW
  * 2007) — the deterministic complement to [[Dedup.minHashLsh]]: LSH
  * banding finds near-dups with a tunable miss probability; prefix
  * filtering finds EVERY pair at or above the threshold, with zero
  * false negatives, and is what a contractual dedup ("no pair ≥ 0.8
  * survives") has to run.
  *
  * The filter: order each set's tokens by global rarity (df asc — a
  * total order with the token key as tiebreak); a set of size s keeps a
  * prefix of `s − ⌈t·s⌉ + 1` rarest tokens. Any pair with J ≥ t shares
  * its globally-smallest intersection token in BOTH prefixes (if it
  * didn't, the intersection would fit inside a suffix of size
  * `⌈t·s⌉ − 1 < t·s ≤ |∩|` — contradiction), so an equi-join on prefix
  * tokens is COMPLETE. Verification is then exact integer rationals:
  * `inter·tDen ≥ tNum·union`, no float ever compares.
  *
  * ## Scale shape (100 TB)
  * Everything rides the hashed 60-bit shingle universe (8-byte keys,
  * the dedup-family space). One vocab-sized df aggregation; per-doc
  * token sort is PER-ROW work bounded by document length (sort_array,
  * never a data-wide sort); the prefix join's posting lists are
  * df-bounded twice over — stop-shingles above `maxDf` are dropped from
  * the similarity universe up front (the q20 convention, applied to
  * BOTH engine and oracle so semantics stay shared), and rare-first
  * prefixes keep the hot end of the remaining distribution out of the
  * join. The candidate set then meets per-doc shingle keys in two
  * equi-joins for the exact count. The oracle brute-forces the SEMANTICS
  * (every qualifying pair over the same universe) rather than replaying
  * the mechanism — completeness is what gets checked. */
object PrefixJoin {

  /** All pairs with exact Jaccard ≥ tNum/tDen over the df ≤ maxDf hashed
    * shingle universe. Returns `(id_a, id_b, inter, uni)`,
    * id_a < id_b. */
  def jaccardSelfJoin(docs: DataFrame, idCol: String, textCol: String,
                      shingleLen: Int, tNum: Long, tDen: Long,
                      maxDf: Long = 50L): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0, 1], got $tNum/$tDen")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val sets = docs
      .select(col(idCol).as("_id"),
        explode(array_distinct(Text.fastWordShingles(col(textCol), shingleLen))).as("_s"))
      .select(col("_id"), Dedup.shingleKey(col("_s")).as("_sh"))
      .distinct()
    val dfs = sets.groupBy(col("_sh")).agg(count(lit(1)).as("_df"))
      .where(col("_df") <= maxDf)
    val universe = sets.join(dfs, Seq("_sh")).localCheckpoint()
    // per-doc rare-first ordering and prefix cut — per-row work only
    val perDoc = universe
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(struct(col("_df"), col("_sh")))).as("_arr"))
      .select(col("_id"), col("_arr"), size(col("_arr")).cast("long").as("_sz"))
      .withColumn("_plen",
        col("_sz") - expr(s"($tNum * _sz + ${tDen - 1}) DIV $tDen") + lit(1L))
    // positions ride along for the PPJoin positional filter (Xiao et al.
    // WWW 2008): _pos is the token's 0-based rank in the doc's FULL
    // rare-first order (the prefix is a slice(1..plen) of that order, so
    // posexplode positions are global ranks, not prefix-local ones)
    val prefixes = perDoc
      .select(col("_id"), col("_sz"),
        posexplode(expr("slice(_arr, 1, CAST(_plen AS INT))")).as(Seq("_pos", "_p")))
      .select(col("_id"), col("_sz"), col("_pos").cast("long").as("_pos"),
        col("_p._sh").as("_sh"))
    // Positional filter soundness: the rare-first order is one GLOBAL
    // total order by (df, key), so the common tokens of any pair appear
    // in the same relative order on both sides. The pair's smallest
    // common token w* (0-based ranks pa in a, pb in b) therefore bounds
    // the whole intersection: inter ≤ min(sa − pa, sb − pb) (w* plus
    // tokens strictly after it on BOTH sides). J ≥ t needs
    // inter·(tNum+tDen) ≥ tNum·(sa+sb), so rows whose bound fails can't
    // be the w* row of a qualifying pair — and every qualifying pair
    // still surfaces through its w* row (in both prefixes by the
    // completeness argument above), so the distinct() is unchanged on
    // true pairs while false candidates drop before the verify joins.
    val cands = prefixes.select(col("_id").as("id_a"), col("_sz").as("_sa"),
        col("_pos").as("_pa"), col("_sh"))
      .join(prefixes.select(col("_id").as("id_b"), col("_sz").as("_sb"),
        col("_pos").as("_pb"), col("_sh")), Seq("_sh"))
      .where(col("id_a") < col("id_b") &&
        lit(tDen) * least(col("_sa"), col("_sb")) >=
          lit(tNum) * greatest(col("_sa"), col("_sb")) &&
        least(col("_sa") - col("_pa"), col("_sb") - col("_pb")) *
          lit(tNum + tDen) >= lit(tNum) * (col("_sa") + col("_sb")))
      .select(col("id_a"), col("id_b"), col("_sa"), col("_sb"))
      .distinct()
    cands
      .join(universe.select(col("_id").as("id_a"), col("_sh")), Seq("id_a"))
      .join(universe.select(col("_id").as("id_b"), col("_sh")), Seq("id_b", "_sh"))
      .groupBy(col("id_a"), col("id_b"), col("_sa"), col("_sb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("_sa") + col("_sb") - col("inter"))
      .where(col("inter") * lit(tDen) >= lit(tNum) * col("uni"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }
}
