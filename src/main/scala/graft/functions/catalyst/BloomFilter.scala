package graft.functions.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter primitives over 8-byte keys (the engine's hashed shingle /
  * fingerprint universe).
  *
  * The k probe positions come from Kirsch–Mitzenmacher double hashing
  * ("Less hashing, same performance", ESA 2006): two 64-bit hashes h1, h2
  * derived from the key via the splitmix64 finalizer (Steele/Lea — public
  * domain; the same mixer java.util.SplittableRandom uses), then
  * `pos_i = (h1 + i·h2) mod m`. Build and probe share these static
  * functions, so the filter is self-consistent by construction — no
  * cross-engine hash-parity contract is needed because a Bloom filter is
  * only ever a PREFILTER here: every candidate it passes is exact-verified
  * downstream, so false positives cost work, never correctness, and false
  * negatives are impossible.
  *
  * Why not an opaque UDF over `breeze`/`util.BloomFilter`: both expressions
  * implement `doGenCode`, so the probe stays inside whole-stage codegen —
  * at 100 TB the probe runs once per corpus shingle in the scan stage and
  * must not break the codegen span or pay boxing per row.
  */
object BloomOps {

  /** splitmix64 finalizer: bijective 64-bit mixer. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Second hash forced odd: h2 = 0 would collapse all k probes onto one
    * position (k-independence lost); odd keeps it a unit mod any power of
    * two and never zero. */
  private def h2(key: Long): Long = mix64(key ^ 0x5851F42D4C957F2DL) | 1L

  private def position(h1: Long, h2: Long, i: Int, numBits: Long): Long =
    java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)

  /** The k bit positions for a key (duplicates possible and harmless —
    * `bit_or` on the build side dedups them). */
  def positions(key: Long, k: Int, numBits: Long): Array[Long] = {
    val a = mix64(key); val b = h2(key)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = position(a, b, i, numBits); i += 1 }
    out
  }

  /** Codegen entry point for [[BloomPositions]]. */
  def positionsData(key: Long, k: Int, numBits: Long): ArrayData =
    new GenericArrayData(positions(key, k, numBits))

  /** Membership probe against the packed word array (m = 64·words.length
    * bits). Early-exits on the first clear bit. */
  def mightContain(words: Array[Long], k: Int, key: Long): Boolean = {
    val numBits = words.length.toLong * 64L
    val a = mix64(key); val b = h2(key)
    var i = 0
    while (i < k) {
      val pos = position(a, b, i, numBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** How many of the array's (non-null) keys the filter might contain —
    * the per-document candidate count for stateless stream-side
    * prefiltering. */
  def countContained(words: Array[Long], k: Int, keys: ArrayData): Int = {
    var n = 0
    var i = 0
    val len = keys.numElements()
    while (i < len) {
      if (!keys.isNullAt(i) && mightContain(words, k, keys.getLong(i))) n += 1
      i += 1
    }
    n
  }

  /** Standard sizing (Bloom 1970): m = −n·ln p / (ln 2)², k = (m/n)·ln 2.
    * m rounds UP to a multiple of 64 so the word array carries the exact
    * modulus. */
  def sizeFor(expectedItems: Long, fpp: Double): (Long, Int) = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-expectedItems.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val m = ((mRaw + 63L) / 64L) * 64L
    val k = math.max(1, math.round(m.toDouble / expectedItems.toDouble * ln2).toInt)
    (m, k)
  }
}

/** `graft_bloom_positions(key, numBits, k)`: the k bit positions a LONG key
  * sets/probes — the build side explodes this and `bit_or`s the masks into
  * words (see [[graft.operators.Bloom.build]]). */
case class BloomPositions(child: Expression, numBits: Long, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_positions requires a BIGINT key, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    BloomOps.positionsData(v.asInstanceOf[Long], k, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.catalyst.BloomOps.positionsData($c, $k, ${numBits}L);")

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_positions"
}

/** `graft_bloom_contains(key, words)`: membership probe of a LONG key
  * against a built filter. `words` must be a foldable ARRAY<BIGINT> literal
  * (the packed bit words, [[graft.operators.BloomModel]]) — it is evaluated
  * ONCE at plan time into a primitive long[] shared by every row, exactly
  * how Spark's own runtime-filter `BloomFilterMightContain` carries its
  * serialized filter as a literal child. */
case class BloomMightContain(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  /** Declared non-deterministic ON PURPOSE (guide §4.4: stop the optimizer
    * duplicating expensive predicates). The probe is pure, but a
    * checkpointed frame preserves its filter CONSTRAINTS (LogicalRDD
    * origin constraints), and InferFiltersFromConstraints then CLONES this
    * predicate — bitset literal and all — onto the OTHER side of any
    * equi-join on the key (observed r13/r14: q60's probe side re-ran the
    * corpus bloom over every probe shingle, a guaranteed-true filter; at
    * production capacity the cloned literal is the full GB-scale bitset).
    * Non-determinism excludes it from the constraint set; the manual
    * placement at the scan stage — the only placement we ever use — is
    * unaffected. */
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires a BIGINT key, got ${left.dataType}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
             right.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires ARRAY<BIGINT> words, got ${right.dataType}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains words must be a constant (the built filter)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val words: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()

  override def nullSafeEval(keyV: Any, wordsV: Any): Any =
    BloomOps.mightContain(words, k, keyV.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the ONE plan-time long[] — per-row codegen must not touch
    // the boxed ArrayData literal
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, (keyC, _) =>
      s"${ev.value} = graft.functions.catalyst.BloomOps.mightContain($ref, $k, $keyC);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_contains"

  // elide the word array in plan dumps: a megabit filter is ~16k longs and
  // would swamp every EXPLAIN containing the probe. Only force `words` for a
  // resolved Literal — via the SQL builder `right` can be any foldable
  // expression, and printing an unresolved plan (analysis-error logging)
  // must not eval it and mask the real error.
  override def toString: String = right match {
    case _: Literal => s"graft_bloom_contains($left, <${words.length} words>, $k)"
    case _          => s"graft_bloom_contains($left, <filter>, $k)"
  }
}

/** `graft_bloom_count(keys, words, k)`: how many of an ARRAY<BIGINT>'s keys
  * the filter might contain — one codegen'd call per ROW (the loop lives in
  * [[BloomOps.countContained]]), where a `filter`/`aggregate` higher-order
  * function would evaluate an interpreted lambda per ELEMENT. The per-doc
  * candidate counter behind [[graft.streaming.Streams.decontaminateStream]].
  * Same contract as [[BloomMightContain]]: `words` is a foldable
  * ARRAY<BIGINT> literal. */
case class BloomCountContained(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[ArrayType] ||
        left.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_count requires ARRAY<BIGINT> keys, got ${left.dataType}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
             right.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_count requires ARRAY<BIGINT> words, got ${right.dataType}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_count words must be a constant (the built filter)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val words: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()

  override def nullSafeEval(keysV: Any, wordsV: Any): Any =
    BloomOps.countContained(words, k, keysV.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, (keysC, _) =>
      s"${ev.value} = graft.functions.catalyst.BloomOps.countContained($ref, $k, $keysC);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomCountContained =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_count"

  // elide the word array in plan dumps; Literal-guarded like
  // BloomMightContain.toString so printing never evals an unresolved filter
  override def toString: String = right match {
    case _: Literal => s"graft_bloom_count($left, <${words.length} words>, $k)"
    case _          => s"graft_bloom_count($left, <filter>, $k)"
  }
}
