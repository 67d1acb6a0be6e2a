package graft

import graft.expr.Expr
import graft.stream.DataStream

class ExprSpec extends SparkSuite {
  import Expr._
  implicit def s = spark

  test("arithmetic, comparison, and boolean nodes translate to Catalyst") {
    val ds = DataStream.fromLiterals(1L, 2L, 3L, 4L, 5L)
    val out = ds.map(x => x * 2L + 1L).collectValues
    assert(out == Seq(3L, 5L, 7L, 9L, 11L))
    val filtered = ds.filter(x => x >= 2L && !(x === 4L)).collectValues
    assert(filtered == Seq(2L, 3L, 5L))
  }

  test("long division truncates like Scala, in both Catalyst and eval paths") {
    val ds = DataStream.fromLiterals(7L, -7L, 10L)
    assert(ds.map(x => x / 3L).collectValues == Seq(2L, -2L, 3L))
    val e = { val x = Expr.id[Long]; x / 3L }
    assert(e.eval(7L) == 2L && e.eval(-7L) == -2L)
  }

  test("tuple plumbing: Nth, FanOut, Flip (reference Expression.scala:21,34,40)") {
    val ds = DataStream.fromLiterals((1L, "a"), (2L, "b"))
    assert(ds.map(t => t._2).collectValues == Seq("a", "b"))
    assert(ds.map(t => t.flip).collectValues == Seq(("a", 1L), ("b", 2L)))
    assert(ds.map(t => t._1 &&& (t._1 * 10L)).collectValues == Seq((1L, 10L), (2L, 20L)))
  }

  test("regex split + list ops (reference Expression.scala:27,33,38)") {
    val ds = DataStream.fromLiterals("a b  c", "x y")
    // split is REGEX split, matching the reference's Java String.split
    assert(ds.map(t => t.split("\\s+").length).collectValues == Seq(3L, 2L))
    val nums = DataStream.fromLiterals("1 2 3")
    // ListSum over parsed longs is exercised via length here (no parse node,
    // as in the reference); sum over a Long list:
    val pairs = DataStream.fromLiterals((1L, 2L))
    assert(pairs.map(t => (t._1 &&& t._2) >>> Expr.id).collectValues == Seq((1L, 2L)))
  }

  test("split accepts an EXPRESSION delimiter (reference Expression.scala:38) on the Catalyst path") {
    // delimiter computed from the row itself: (text, delim) pairs
    val ds = DataStream.fromLiterals(("a,b,c", ","), ("x y z w", " "), ("no-match", "#"))
    val out = ds.map(t => t._1.split(t._2).length).collectValues
    assert(out == Seq(3L, 4L, 1L))
    // literal fast path still regex + Java limit-0 semantics
    val lit = DataStream.fromLiterals("a::b::")
    assert(lit.map(t => t.split("::").length).collectValues == Seq(2L)) // trailing empties dropped
  }

  test("string surface: concat/length/case/substring agree between Catalyst and eval") {
    val ds = DataStream.fromLiterals("Hello World", "x")
    // Catalyst path
    val gotCol = ds.map(t => ((t ++ "!").toLowerCase &&& t.strlen) &&& t.substring(7L, 5L)).collectValues
    assert(gotCol == Seq((("hello world!", 11L), "World"), (("x!", 1L), "")))
    // eval path must agree node-for-node (exercised through mapAccumulate)
    val viaEval = DataStream.fromLiterals(("Hello World", 0L), ("x", 0L))
      .mapAccumulate[Long, String](0L)(t => t._1 &&& (t._2._1.substring(1L, 3L)).toUpperCase)
      .collectValues
    assert(viaEval == Seq("HEL", "X"))
  }

  test("mixed tuple lifting: (expr, value) and (value, expr) pairs lift implicitly (reference liftMixed)") {
    val ds = DataStream.fromLiterals(5L, 7L)
    // (expr, plain value) — reference liftMixedR
    assert(ds.map(x => (x * 2L, 1L): Expr[Long, (Long, Long)]).collectValues ==
      Seq((10L, 1L), (14L, 1L)))
    // (plain value, expr) — reference liftMixedL
    assert(ds.map(x => ("tag", x + 1L): Expr[Long, (String, Long)]).collectValues ==
      Seq(("tag", 6L), ("tag", 8L)))
    // (expr, expr) — reference sequenceTuple
    assert(ds.map(x => (x, x * x): Expr[Long, (Long, Long)]).collectValues ==
      Seq((5L, 25L), (7L, 49L)))
  }

  test("Both (***) applies component-wise to a pair (reference Expression.scala:22)") {
    val ds = DataStream.fromLiterals((3L, 4L))
    val out = ds.map(_ => Expr.id[(Long, Long)] >>> Expr.Both[Long, Long, Long, Long](
      { val x = Expr.id[Long]; x * 10L }, { val x = Expr.id[Long]; x + 1L })).collectValues
    assert(out == Seq((30L, 5L)))
  }

  test("eval interpreter agrees with Catalyst translation") {
    val e = { val t = Expr.id[(Long, Long)]; t._1 * 3L + t._2 }
    assert(e.eval((4L, 5L)) == 17L)
    val ds = DataStream.fromLiterals((4L, 5L))
    assert(ds.map(_ => e).collectValues == Seq(17L))
  }

  test("If node: CASE WHEN semantics on both paths — null condition takes the else branch") {
    import Expr._
    val e = { val t = Expr.id[(Long, Long)]; (t._1 > t._2).ifElse(t._1, t._2) } // max
    assert(e.eval((4L, 5L)) == 5L)
    assert(e.eval((9L, 5L)) == 9L)
    val ds = DataStream.fromLiterals((4L, 5L), (9L, 5L))
    assert(ds.map(_ => e).collectValues.sorted == Seq(5L, 9L))
    // null condition: SQL CASE WHEN null falls through to ELSE — both the
    // Catalyst translation (when/otherwise) and eval must agree
    val nullCond = { val t = Expr.id[(Long, Long)]; (t._1 > t._2).ifElse[Long](LitLong(1L), LitLong(2L)) }
    assert(nullCond.eval((null, 5L)) == 2L)
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.functions.col
    val withNull = spark.createDataFrame(
      java.util.List.of(SRow(SRow(null, 5L))),
      StructType(Seq(StructField("value", StructType(Seq(
        StructField("_1", LongType, nullable = true),
        StructField("_2", LongType)))))))
    val catalystOut = withNull.select(nullCond.toColumn(col("value")).as("o")).head().getLong(0)
    assert(catalystOut == 2L, "Catalyst when/otherwise must also fall through on null")
  }

  test("epoch-ms date parts: Catalyst and eval agree, incl. dow convention and pre-1970 trunc") {
    // 2024-02-29T13:45:30.123Z — a leap-day Thursday
    val leapDay = 1709214330123L
    // 1969-12-31T22:00:00Z — pre-1970: floor-toward-minus-infinity matters
    val preEpoch = -7200000L
    val e = { val t = Expr.id[Long]
      (((t.msYear &&& t.msMonth) &&& (t.msDay &&& t.msHour)) &&&
        ((t.msDayOfWeek &&& t.msDayOfYear) &&& t.truncToDay)) }
    val viaCatalyst = DataStream.fromLiterals(leapDay, preEpoch).map(_ => e).collectValues
    val viaEval = Seq(leapDay, preEpoch).map(e.eval)
    assert(viaCatalyst == viaEval, s"catalyst $viaCatalyst != eval $viaEval")
    // spot-check the actual calendar values (UTC): Thursday = 5 in SQL dow
    assert(viaCatalyst.head == (((2024L, 2L), (29L, 13L)), ((5L, 60L), 1709164800000L)))
    // pre-1970 day floor goes DOWN to 1969-12-31T00:00Z, not toward zero
    assert(viaCatalyst(1) == (((1969L, 12L), (31L, 22L)), ((4L, 365L), -172800000L + 86400000L)))
    // invalid part fails loudly at construction
    intercept[IllegalArgumentException](Expr.DatePart(Expr.id[Long], "fortnight"))
  }

  test("date parts match java.time UTC on fuzzed instants, on BOTH paths, in a NON-UTC session") {
    // the arithmetic (civil-from-days) formulation is timezone-free by
    // construction; prove it by comparing against java.time at UTC across
    // seeded random instants spanning 1823-2262 — while the SESSION runs a
    // non-UTC timezone (Spark's own year()/hour() would diverge here)
    val rnd = new scala.util.Random(20260812L)
    val instants = Seq(0L, -1L, 86399999L, -86400000L) ++
      Seq.fill(60)(rnd.nextLong() % (7000L * 365 * 86400000L))
    def expected(ms: Long): Seq[Long] = {
      val z = java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
      Seq(z.getYear.toLong, z.getMonthValue.toLong, z.getDayOfMonth.toLong,
        z.getHour.toLong, z.getMinute.toLong, z.getSecond.toLong,
        (z.getDayOfWeek.getValue % 7 + 1).toLong, z.getDayOfYear.toLong)
    }
    val parts = Seq("year", "month", "day", "hour", "minute", "second", "dow", "doy")
    val exprs = parts.map(p => Expr.DatePart(Expr.id[Long], p))
    // eval path
    instants.foreach { ms =>
      assert(exprs.map(_.eval(ms)) == expected(ms), s"eval diverged at $ms")
    }
    // Catalyst path, under a deliberately non-UTC session timezone
    import spark.implicits._
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      import org.apache.spark.sql.functions.col
      val df = instants.toDF("ms")
      val rows = df.select(col("ms") +: exprs.zip(parts).map {
        case (e, p) => e.toColumn(col("ms")).as(p)
      }: _*).collect()
      rows.foreach { r =>
        val ms = r.getLong(0)
        val got = parts.indices.map(i => r.getLong(i + 1))
        assert(got == expected(ms), s"catalyst diverged at $ms in non-UTC session: $got")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("SparkType encode/decode roundtrip for nested types") {
    import graft.expr.SparkType
    def rt[T: SparkType](v: T): Unit = {
      val st = SparkType[T]
      assert(st.decode(st.encode(v)) == v)
    }
    rt(42L); rt("x"); rt(true); rt(1.5)
    rt((1L, "a")); rt((1L, ("b", 2L), 3L))
    rt(List(1L, 2L))
    rt(Grouped("k", (1L, 2L)))
    rt(Timestamped(5L, Grouped(1L, "v")))
    rt(Windowed(TimeWindow(0L, 10L), 7L))
    rt(Group("g", Seq(1L, 2L, 3L)))
  }

  test("mapConcat explodes via Catalyst Generate (reference MapConcat)") {
    val ds = DataStream.fromLiterals("a b", "c")
    assert(ds.mapConcat(t => t.split(" ")).collectValues.sorted == Seq("a", "b", "c"))
  }
}
