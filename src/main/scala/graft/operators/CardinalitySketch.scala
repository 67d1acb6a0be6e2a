package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable CARDINALITY sketch with a DETERMINISTIC state — linear
  * counting (Whang et al. 1990) on the persisted-model contract: per
  * group an m-slot bitmap of `md5(key) mod m`, stored as its set-bit
  * rows. The bitmap is a pure function of the key SET — merge is
  * bit-union (`union ∘ distinct`), bitwise equal to a rebuild in any
  * order/grouping — so unlike the HLL lifecycle (q133, rows-only: the
  * HIP estimator and union representation are order-dependent) this
  * distinct-count lifecycle HASH-GATES end to end: the DuckDB oracle
  * replays the same md5 slots and the same site-quantized estimate.
  *
  * ## Estimate and error (documented, spec-pinned)
  * With b of m slots set, the maximum-likelihood distinct count is
  * `n̂ = m·ln(m/(m−b))`, quantized ONCE at its site to micro units
  * (`round(10⁶·m·ln(m/(m−b)))` — the corpusDivergence/Hoeffding-Lq log
  * scheme both engines replay). Standard error ≈ √m·(e^t − t − 1)^½/t·m
  * — in practice ≤ ~2% for load t = n/m ≤ 3 (spec measures ≤ 5% at
  * t ≈ 1.2); a SATURATED bitmap (b = m) has no estimate and returns
  * NULL with `saturated = true` — the monitoring signal to re-size m.
  * Exact when every key lands its own slot and b = n (small groups).
  *
  * ## Scale shape (100 TB)
  * Build: one partial-aggregable distinct over (group, slot) — ≤ m
  * rows per group regardless of data size. Merge: union + distinct of
  * two ≤ m-row tables (bucketed persist co-locates it) — no base
  * re-scan. Estimate: one count per group + one site-quantized ln. */
object CardinalitySketch {

  private def slot(keyCol: String, m: Int) =
    pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(m.toLong))

  /** Per-group set-slot rows `(groupCol, slot)` of the m-slot bitmap. */
  def groupBitmaps(df: DataFrame, groupCol: String, keyCol: String,
                   m: Int): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    df.where(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .select(col(groupCol), slot(keyCol, m).as("slot"))
      .distinct()
  }

  /** Bit-union merge — bitwise equal to rebuilding from the union of
    * the inputs' key sets, in any order. */
  def mergeBitmaps(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("slot"))
      .unionByName(b.select(col(groupCol), col("slot")))
      .distinct()

  /** Linear-counting estimates: `(groupCol, bits_set, est_micro,
    * saturated)`; est_micro NULL when the bitmap saturates. */
  def estimates(bitmap: DataFrame, groupCol: String, m: Int): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    bitmap.groupBy(col(groupCol))
      .agg(count(lit(1)).as("bits_set"))
      .select(col(groupCol), col("bits_set"),
        when(col("bits_set") < m,
          round(log(lit(m.toDouble) /
              (lit(m.toDouble) - col("bits_set").cast("double"))) *
            lit(m.toDouble) * lit(1e6)).cast("long")).as("est_micro"),
        (col("bits_set") >= m).as("saturated"))
  }

  // ---------------------------------------------------------------------
  // AUTO-RESIZING lifecycle — m-doubling with deterministic fold-down.
  //
  // The fixed-m bitmap saturates as groups grow (b = m → NULL + flag);
  // the leveled family stores each group at size m·2^level, where
  // `level` is a DETERMINISTIC function of the group's key set: the
  // smallest level whose folded bitmap is not saturated (maxLevel when
  // even the finest saturates). Folding is exact, not lossy RELATIVE TO
  // THE COARSER RESOLUTION: slot_j(h) = slot_{j+1}(h) mod m·2^j, so a
  // fold-down of a finer bitmap is BITWISE the coarser bitmap of the
  // same key set, and fold ∘ union = union ∘ fold. Hence merging two
  // leveled sketches at their common (min) level is bitwise equal to
  // REBUILDING at that level — the q262/q264 merge ≡ rebuild doctrine,
  // preserved across a resize boundary (spec-pinned, and the q269 gate
  // hash-checks the whole lifecycle against a DuckDB rebuild). Honest
  // one-way note: fold-down cannot be undone, so a merge's level is the
  // MIN of its inputs' levels — a rebuild-from-raw may pick a finer
  // level than a merge of coarse parts. maxLevel is the headroom knob:
  // builds always start from the finest bitmap, so a group only ever
  // stores coarse when coarse genuinely suffices, and `saturated` can
  // only be raised by a build at the FINAL size m·2^maxLevel.
  //
  // Scale shape (100 TB): the build's one exchange is the same
  // partial-aggregable distinct as the fixed-m build, at m·2^maxLevel
  // resolution (≤ m·2^maxLevel rows per group, data-size-independent);
  // the per-level fold/choice runs over those ≤ (maxLevel+1)·m·2^maxLevel
  // rows per group, never the base. Merge touches only the two ≤
  // m·2^maxLevel-row sketches.
  // ---------------------------------------------------------------------

  /** Bitmap size m·2^level as a BIGINT column. */
  private def sizeOf(m: Int, levelCol: String) =
    expr(s"CAST($m AS BIGINT) * shiftleft(CAST(1 AS BIGINT), CAST($levelCol AS INT))")

  /** Leveled build: `(groupCol, level, slot)` with each group stored at
    * the SMALLEST level whose bitmap is not saturated (maxLevel if all
    * are). Deterministic per key set; `groupBitmaps(m)` is exactly the
    * `level = 0` row set of this family. */
  def groupBitmapsAuto(df: DataFrame, groupCol: String, keyCol: String,
                       m: Int, maxLevel: Int): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    // bound BEFORE shifting: a 64-bit shift past 63 wraps silently and
    // would slip an absurd maxLevel through as a pmod-by-zero null sketch
    require(maxLevel >= 0 && maxLevel < 31 &&
        (m.toLong << maxLevel) <= Int.MaxValue,
      s"bad maxLevel=$maxLevel for m=$m")
    val fine = df.where(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .select(col(groupCol), slot(keyCol, (m.toLong << maxLevel).toInt).as("_sL"))
      .distinct()
    val perLevel = fine
      .select(col(groupCol),
        explode(expr(s"sequence(0, $maxLevel)")).as("level"), col("_sL"))
      .select(col(groupCol), col("level"),
        pmod(col("_sL"), sizeOf(m, "level")).as("slot"))
      .distinct()
    val chosen = perLevel.groupBy(col(groupCol), col("level"))
      .agg(count(lit(1)).as("_b"))
      .where(col("_b") < sizeOf(m, "level") || col("level") === maxLevel)
      .groupBy(col(groupCol)).agg(min(col("level")).as("level"))
    perLevel.join(chosen, Seq(groupCol, "level"))
      .select(col(groupCol), col("level"), col("slot"))
  }

  /** Merge two leveled sketches: per group, fold BOTH sides down to the
    * common (min) level and bit-union — bitwise equal to rebuilding the
    * union's key set at that level, in any merge order/tree (fold
    * commutes with union). Accepts sketches built at DIFFERENT sizes —
    * the resize boundary. */
  def mergeLeveled(a: DataFrame, b: DataFrame, groupCol: String,
                   m: Int): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    val all = a.select(col(groupCol), col("level"), col("slot"))
      .unionByName(b.select(col(groupCol), col("level"), col("slot")))
    val common = all.groupBy(col(groupCol)).agg(min(col("level")).as("_lc"))
    all.join(common, Seq(groupCol))
      .select(col(groupCol), col("_lc").as("level"),
        pmod(col("slot"), sizeOf(m, "_lc")).as("slot"))
      .distinct()
  }

  /** Leveled estimates: `(groupCol, level, bits_set, est_micro,
    * saturated)` — the same site-quantized linear-counting ln at the
    * group's own size m·2^level; `saturated` only when the stored
    * (final for this group) size is full. */
  def estimatesLeveled(sketch: DataFrame, groupCol: String,
                       m: Int): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    val size = sizeOf(m, "level").cast("double")
    sketch.groupBy(col(groupCol), col("level"))
      .agg(count(lit(1)).as("bits_set"))
      .select(col(groupCol), col("level").cast("long").as("level"),
        col("bits_set"),
        when(col("bits_set").cast("double") < size,
          round(log(size / (size - col("bits_set").cast("double"))) *
            size * lit(1e6)).cast("long")).as("est_micro"),
        (col("bits_set").cast("double") >= size).as("saturated"))
  }
}
