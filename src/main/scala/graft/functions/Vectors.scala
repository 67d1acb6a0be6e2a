package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column functions over `ArrayType(FloatType/DoubleType)` embedding
  * columns.
  *
  * Everything is a Catalyst higher-order function (`zip_with`, `transform`,
  * `aggregate`) — codegen'd, no UDF, no shuffle. Elements are cast to double
  * *before* arithmetic and folded strictly left-to-right, so results are
  * bit-identical across engines that do the same (the DuckDB oracle mirrors
  * this exactly), and independent of Spark partitioning — which is what makes
  * cosine scores safe to hash-compare at any scale.
  */
object Vectors {

  /** Symmetric int8 quantization of an embedding: `scale = 127 / max|x|`,
    * `q_i = floor(x_i · scale + 0.5)` (floor — not `round` — because both
    * engines' floor over IEEE doubles is exact and identical, where
    * round-half ties differ between HALF_UP and banker's rounding).
    * Returns `struct(scale: double, q: array<tinyint>)`; dequantize as
    * `q_i / scale`.
    *
    * Why at 100 TB: the ANN corpus resident set shrinks 4× (one byte per
    * dimension instead of a float), which is the difference between an
    * in-memory probe layer and spilling — at ≤ 0.4% max per-component
    * error for unit-norm vectors, recall impact is spec-measured, not
    * guessed. The all-zero vector quantizes to all zeros with scale 0
    * (dequantize guards the division). */
  def quantizeInt8(a: Column): Column = {
    val mx = array_max(transform(a, x => abs(x.cast("double"))))
    val scale = when(mx > 0.0, lit(127.0) / mx).otherwise(lit(0.0))
    struct(
      scale.as("scale"),
      transform(a, x =>
        floor(x.cast("double") * scale + lit(0.5)).cast("byte")).as("q"))
  }

  /** Dequantized double array from [[quantizeInt8]]'s struct. */
  def dequantizeInt8(qs: Column): Column = {
    val scale = qs.getField("scale")
    transform(qs.getField("q"), q =>
      when(scale > 0.0, q.cast("double") / scale).otherwise(lit(0.0)))
  }

  /** One-pass native quantize→dequantize round trip — bit-identical to
    * `dequantizeInt8(quantizeInt8(a))` (spec-proven) via
    * [[graft.functions.catalyst.ArrayInt8RoundTrip]]; the hot-path form
    * for operators that only need the dequantized values
    * ([[graft.operators.Similarity.ivfTopKQuantized]]'s corpus pass). */
  def int8RoundTrip(a: Column): Column =
    org.apache.spark.sql.classic.GraftBridge.column(
      graft.functions.catalyst.ArrayInt8RoundTrip(
        org.apache.spark.sql.classic.GraftBridge.expr(a)))

  /** Dot product of two numeric arrays (double, sequential fold).
    * Pure-builtin form; [[fastDot]] is the codegen'd equivalent. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Codegen'd dot product via the native [[graft.functions.catalyst.ArrayDotProduct]]
    * expression — bit-identical to [[dot]] but ~6× faster (HOF lambdas are
    * interpreted per element). Builds the Catalyst node directly, so no
    * session registration is needed (registration is only for SQL-string
    * users of `graft_dot`). */
  def fastDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(graft.functions.catalyst.ArrayDotProduct(
      GraftBridge.expr(a), GraftBridge.expr(b)))
  }

  /** Squared L2 norm — `fastDot(a, a)`: the same strictly-sequential
    * Σ x_i² the HOF formulation computes (bit-identical, oracle-safe), in
    * one codegen'd loop instead of an interpreted per-element lambda. */
  def normSq(a: Column): Column = fastDot(a, a)

  /** Interpreted-HOF twin of [[normSq]], kept as the spec's parity oracle. */
  private[graft] def normSqHof(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** L2-normalized copy (doubles; all-zero → all zeros). Pre-normalizing
    * the corpus once turns every cosine into a plain dot product — do this
    * before fan-out ANN. Native one-pass expression
    * ([[graft.functions.catalyst.ArrayL2Normalize]]): the HOF formulation
    * `transform(a, x -> x/norm(a))` re-evaluates the norm per ELEMENT
    * (O(d²), interpreted). Direct Catalyst node — no registration needed. */
  def l2normalize(a: Column): Column = {
    import org.apache.spark.sql.classic.GraftBridge
    GraftBridge.column(graft.functions.catalyst.ArrayL2Normalize(GraftBridge.expr(a)))
  }

  /** Deterministic pseudo-random hyperplane component for LSH: xxhash64 of
    * (plane, dim) mapped into [-0.5, 0.5). Deterministic under any
    * partitioning; properly bit-mixed (a linear congruential form here
    * produces a lattice whose planes are correlated — measured ANN recall
    * dropped to 0.2 with one). */
  def hyperplaneComponent(plane: Int, dim: Column): Column = {
    val h = xxhash64(lit(plane.toLong), dim)
    (pmod(h, lit(1000003L)).cast("double") / lit(1000003.0)) - lit(0.5)
  }

  /** The same hyperplane family as [[hyperplaneComponent]], materialized at
    * PLAN time as a plain double array. `XXH64.hashLong(dim, hashLong(plane,
    * 42))` is exactly what the `xxhash64(lit(plane), dim)` column computes
    * per row, so buckets from this path are bit-identical to the column
    * formulation — but the per-row work drops from planes × dims interpreted
    * lambda evaluations (was 22% of the whole bench in one query) to
    * `planes` codegen'd dot products against constant arrays. */
  private[graft] def hyperplane(plane: Int, dim: Int): Array[Double] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    Array.tabulate(dim) { i =>
      val h = XXH64.hashLong(i.toLong, XXH64.hashLong(plane.toLong, 42L))
      val m = ((h % 1000003L) + 1000003L) % 1000003L
      m.toDouble / 1000003.0 - 0.5
    }
  }

  /** Random-hyperplane LSH bucket id: one sign bit per plane, packed into a
    * string of 0/1 (string keeps it portable and join-friendly). `seed`
    * shifts the plane family so multiple independent hash tables can be
    * built from the same generator.
    *
    * `dim` is the vector dimensionality ([[dims]] probes it): hyperplanes
    * are baked into the plan as literal arrays (constant-folded), so each
    * sign bit is one [[fastDot]] — a tight codegen'd loop. Vectors longer
    * than `dim` are bucketed on their first `dim` components (dot over the
    * common prefix); shorter ones on their own length. */
  def lshBucket(vec: Column, planes: Int, dim: Int, seed: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val hp = hyperplane(seed * 1000 + p, dim)
      when(fastDot(vec, array(hp.map(lit(_)): _*)) >= 0.0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Interpreted-HOF twin of [[lshBucket]], kept ONLY as the spec's parity
    * oracle for the plan-time-hyperplane rewrite (the HOF lambda evaluates
    * per element, interpreted — never use on a hot path). */
  private[graft] def lshBucketHof(vec: Column, planes: Int, seed: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0L), size(vec).cast("long") - 1L),
          (x, i) => x.cast("double") * hyperplaneComponent(seed * 1000 + p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Probe the dimensionality of a vector column (one tiny job; call once at
    * plan build, never per row). Null/empty vectors are skipped — a null in
    * the first row would otherwise read as size -1 and flow into
    * `Array.tabulate(-1)` at plan build. Returns 0 when no non-empty vector
    * exists. */
  def dims(df: org.apache.spark.sql.DataFrame, vecCol: String): Int = {
    val r = df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(size(col(vecCol))).limit(1).collect()
    if (r.isEmpty) 0 else r(0).getInt(0)
  }
}
