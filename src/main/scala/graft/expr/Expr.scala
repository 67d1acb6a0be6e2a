package graft.expr

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

import scala.language.implicitConversions

/** Reified expression algebra: a typed arrow `Expr[A, B]` ("a function from A
  * to B, as data").
  *
  * Mirrors the reference's `Expression[A, B]` IR (reference:
  * src/main/scala/zio/analytics/Expression.scala:19-43) — user code builds
  * expression *trees*, never opaque closures, which is what makes plans
  * distributable. Where the reference interprets the tree row-at-a-time
  * (Local.scala:7-52), we translate it once, at plan time, into a native
  * Catalyst `Column` ([[Expr.toColumn]]) so Spark's optimizer and whole-stage
  * codegen see straight through it (SURVEY.md §4.2: never wrap the algebra in
  * opaque UDFs). A tiny structural interpreter ([[Expr.eval]]) exists only for
  * the genuinely sequential `mapAccumulate` path and plan-time constant
  * evaluation.
  *
  * Encoding convention: tuples are structs with fields `_1.._n`; the wrapper
  * records of [[graft]] (`Grouped`/`Group`/`Timestamped`/`Windowed`) are
  * structs with their case-class field names.
  */
sealed trait Expr[A, B] { self =>

  /** Translate this expression to a Catalyst column, given the column that
    * represents the input `A`. Replaces the reference's `Local.evalExpr`
    * (Local.scala:7-52) with a compile-to-Catalyst step. */
  private[graft] def toColumn(in: Column): Column

  /** Structural interpreter over external row values (Row / products / Seq).
    * Used only where execution is genuinely sequential (mapAccumulate) and
    * for plan-time literal evaluation. */
  private[graft] def eval(in: Any): Any

  // -- arrow plumbing (reference Expression.scala:46-49) --
  def >>>[C](that: Expr[B, C]): Expr[A, C] = Expr.Compose(self, that)
  def <<<[Z](that: Expr[Z, A]): Expr[Z, B] = Expr.Compose(that, self)
  def &&&[C](that: Expr[A, C]): Expr[A, (B, C)] = Expr.FanOut(self, that)
}

object Expr {

  private def fieldOf(in: Any, idx: Int, name: String): Any = in match {
    case null          => null // SQL: field access on a null struct is null
    case r: Row        => r.get(if (r.schema != null && r.schema.fieldNames.contains(name)) r.fieldIndex(name) else idx)
    case p: Product    => p.productElement(idx)
    case other         => sys.error(s"cannot access field $name of $other")
  }

  def id[A]: Expr[A, A] = Id[A]()

  // ---------------------------------------------------------------------
  // Plumbing nodes (reference Expression.scala:19-22, 34, 40)
  // ---------------------------------------------------------------------

  final case class Id[A]() extends Expr[A, A] {
    private[graft] def toColumn(in: Column): Column = in
    private[graft] def eval(in: Any): Any = in
  }

  final case class Compose[A, B, C](f: Expr[A, B], g: Expr[B, C]) extends Expr[A, C] {
    private[graft] def toColumn(in: Column): Column = g.toColumn(f.toColumn(in))
    private[graft] def eval(in: Any): Any = g.eval(f.eval(in))
  }

  /** `&&&` — duplicate the input into a pair (reference Expression.scala:21). */
  final case class FanOut[A, B, C](f: Expr[A, B], g: Expr[A, C]) extends Expr[A, (B, C)] {
    private[graft] def toColumn(in: Column): Column =
      struct(f.toColumn(in).as("_1"), g.toColumn(in).as("_2"))
    private[graft] def eval(in: Any): Any = (f.eval(in), g.eval(in))
  }

  /** `***` — apply component-wise to a pair (reference Expression.scala:22). */
  final case class Both[A, B, C, D](f: Expr[A, C], g: Expr[B, D]) extends Expr[(A, B), (C, D)] {
    private[graft] def toColumn(in: Column): Column =
      struct(f.toColumn(in.getField("_1")).as("_1"), g.toColumn(in.getField("_2")).as("_2"))
    private[graft] def eval(in: Any): Any =
      (f.eval(fieldOf(in, 0, "_1")), g.eval(fieldOf(in, 1, "_2")))
  }

  /** Swap a pair (reference Expression.scala:34). */
  final case class Flip[A, B]() extends Expr[(A, B), (B, A)] {
    private[graft] def toColumn(in: Column): Column =
      struct(in.getField("_2").as("_1"), in.getField("_1").as("_2"))
    private[graft] def eval(in: Any): Any = (fieldOf(in, 1, "_2"), fieldOf(in, 0, "_1"))
  }

  /** Positional tuple access, 0-based (reference `NthColumn`,
    * Expression.scala:40). */
  final case class Nth[A, B](child: Expr[A, _], n: Int) extends Expr[A, B] {
    private[graft] def toColumn(in: Column): Column = child.toColumn(in).getField(s"_${n + 1}")
    private[graft] def eval(in: Any): Any = fieldOf(child.eval(in), n, s"_${n + 1}")
  }

  // ---------------------------------------------------------------------
  // Literals (reference Expression.scala:23-25; Double is our extension —
  // the test data has double columns, SURVEY.md §1.2)
  // ---------------------------------------------------------------------

  final case class LitLong[A](value: Long) extends Expr[A, Long] {
    private[graft] def toColumn(in: Column): Column = lit(value)
    private[graft] def eval(in: Any): Any = value
  }
  final case class LitDouble[A](value: Double) extends Expr[A, Double] {
    private[graft] def toColumn(in: Column): Column = lit(value)
    private[graft] def eval(in: Any): Any = value
  }
  final case class LitString[A](value: String) extends Expr[A, String] {
    private[graft] def toColumn(in: Column): Column = lit(value)
    private[graft] def eval(in: Any): Any = value
  }
  final case class LitBoolean[A](value: Boolean) extends Expr[A, Boolean] {
    private[graft] def toColumn(in: Column): Column = lit(value)
    private[graft] def eval(in: Any): Any = value
  }

  // ---------------------------------------------------------------------
  // Numeric / boolean scalar ops. The reference ships `Sum` and `Mul` on
  // Long only (Expression.scala:36-37); we generalize to the full arithmetic
  // + comparison surface since the oracle queries need doubles and
  // predicates. All translate to native Column ops (codegen'd).
  // ---------------------------------------------------------------------

  final case class Arith[A, N](l: Expr[A, N], r: Expr[A, N], op: String) extends Expr[A, N] {
    private[graft] def toColumn(in: Column): Column = {
      val (a, b) = (l.toColumn(in), r.toColumn(in))
      op match {
        case "+" => a + b; case "-" => a - b; case "*" => a * b
        case "/" => a / b; case "%" => a % b
        // integer division (truncating). Spark's `/` is SQL double division;
        // the cast truncates toward zero like Scala's Long `/`. Exact for
        // |quotient| < 2^53 (the double mantissa) — plenty for key math.
        case "quot" => (a / b).cast("long")
      }
    }
    private[graft] def eval(in: Any): Any = (l.eval(in), r.eval(in)) match {
      case (a: Long, b: Long) => op match {
        case "+" => a + b; case "-" => a - b; case "*" => a * b
        case "/" => a / b; case "%" => a % b; case "quot" => a / b
      }
      case (a: Double, b: Double) => op match {
        case "+" => a + b; case "-" => a - b; case "*" => a * b
        case "/" => a / b; case "%" => a % b
      }
      // SQL null propagation — the Catalyst path yields null here, and the
      // mapAccumulate fallback must agree with the window rewrite, not crash
      case (null, _) | (_, null) => null
      case (a, b) => sys.error(s"arith $op on $a, $b")
    }
  }

  final case class Cmp[A, N](l: Expr[A, N], r: Expr[A, N], op: String) extends Expr[A, Boolean] {
    private[graft] def toColumn(in: Column): Column = {
      val (a, b) = (l.toColumn(in), r.toColumn(in))
      op match {
        case "==" => a === b; case "!=" => a =!= b
        case "<" => a < b; case "<=" => a <= b; case ">" => a > b; case ">=" => a >= b
      }
    }
    private[graft] def eval(in: Any): Any = {
      val (a, b) = (l.eval(in), r.eval(in))
      if (a == null || b == null) null // SQL: comparison with null is null
      else {
        val c = (a, b) match {
          case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
          case (x: Double, y: Double) => java.lang.Double.compare(x, y)
          case (x: String, y: String) => x.compareTo(y)
          case _                      => sys.error(s"cmp $op on $a, $b")
        }
        op match {
          case "==" => c == 0; case "!=" => c != 0
          case "<" => c < 0; case "<=" => c <= 0; case ">" => c > 0; case ">=" => c >= 0
        }
      }
    }
  }

  final case class BoolOp[A](l: Expr[A, Boolean], r: Expr[A, Boolean], op: String) extends Expr[A, Boolean] {
    private[graft] def toColumn(in: Column): Column = op match {
      case "&&" => l.toColumn(in) && r.toColumn(in)
      case "||" => l.toColumn(in) || r.toColumn(in)
    }
    // SQL three-valued logic, exactly as the Catalyst path evaluates it —
    // a bare asInstanceOf[Boolean] would silently read null as FALSE
    private[graft] def eval(in: Any): Any = {
      val (a, b) = (l.eval(in), r.eval(in))
      op match {
        case "&&" =>
          if (a == java.lang.Boolean.FALSE || b == java.lang.Boolean.FALSE) false
          else if (a == null || b == null) null
          else true
        case "||" =>
          if (a == java.lang.Boolean.TRUE || b == java.lang.Boolean.TRUE) true
          else if (a == null || b == null) null
          else false
      }
    }
  }

  final case class Not[A](e: Expr[A, Boolean]) extends Expr[A, Boolean] {
    private[graft] def toColumn(in: Column): Column = !e.toColumn(in)
    private[graft] def eval(in: Any): Any = e.eval(in) match {
      case null       => null // SQL: NOT null is null
      case b: Boolean => !b
    }
  }

  /** Conditional (extension — the reference algebra has no branch node, but
    * stateful accumulators like next-fit packing need one). SQL CASE WHEN
    * semantics on both paths: a NULL condition selects the else branch,
    * exactly as Catalyst's `when(c, t).otherwise(f)` evaluates it — an
    * eval that treated null as an error (or as true) would diverge from
    * the window-rewritten/columnar form of the same expression. */
  final case class If[A, B](cond: Expr[A, Boolean], t: Expr[A, B], f: Expr[A, B]) extends Expr[A, B] {
    private[graft] def toColumn(in: Column): Column =
      when(cond.toColumn(in), t.toColumn(in)).otherwise(f.toColumn(in))
    private[graft] def eval(in: Any): Any = cond.eval(in) match {
      case java.lang.Boolean.TRUE => t.eval(in)
      case _                      => f.eval(in) // FALSE or null: CASE falls through
    }
  }

  // ---------------------------------------------------------------------
  // String / list ops (reference Expression.scala:27, 33, 38)
  // ---------------------------------------------------------------------

  /** Regex split with JAVA `String.split` semantics, exactly as the
    * reference evaluates it (Local.scala:26): intermediate empty strings
    * kept, trailing ones dropped. NB Spark's own `split(str, regex, 0)`
    * KEEPS trailing empties — subtly different — so this compiles to the
    * engine's [[graft.functions.catalyst.JavaSplit]] expression (codegen'd;
    * literal patterns compiled once at plan time). The delimiter is a full
    * EXPRESSION, as in the reference (Expression.scala:38). */
  final case class SplitStr[A](s: Expr[A, String], delim: Expr[A, String]) extends Expr[A, List[String]] {
    private[graft] def toColumn(in: Column): Column = {
      import org.apache.spark.sql.classic.GraftBridge
      GraftBridge.column(graft.functions.catalyst.JavaSplit(
        GraftBridge.expr(s.toColumn(in)), GraftBridge.expr(delim.toColumn(in))))
    }
    private[graft] def eval(in: Any): Any = (s.eval(in), delim.eval(in)) match {
      case (str: String, d: String) => str.split(d).toSeq
      case _                        => null // SQL null propagation
    }
  }

  // -- string scalar surface (engine extension: the reference ships only
  // `Split`; a usable pipeline DSL needs the basics; all compile to native
  // codegen'd Columns, and `eval` mirrors Spark semantics exactly) --

  // eval-path parity notes for the string nodes: Spark's lower/upper are
  // LOCALE-INDEPENDENT (a default-locale toLowerCase would turn "TITLE"
  // into dotless-i "tıtle" under tr_TR), and length/substring count Unicode
  // CODE POINTS, not UTF-16 code units — eval must match or the rewrite and
  // fallback paths of the same pipeline silently disagree on non-BMP text.
  final case class StrConcat[A](l: Expr[A, String], r: Expr[A, String]) extends Expr[A, String] {
    private[graft] def toColumn(in: Column): Column = concat(l.toColumn(in), r.toColumn(in))
    private[graft] def eval(in: Any): Any = (l.eval(in), r.eval(in)) match {
      case (a: String, b: String) => a + b
      case _                      => null // SQL null propagation, as concat() does
    }
  }
  final case class StrLen[A](s: Expr[A, String]) extends Expr[A, Long] {
    private[graft] def toColumn(in: Column): Column = length(s.toColumn(in)).cast("long")
    private[graft] def eval(in: Any): Any = s.eval(in) match {
      case str: String => str.codePointCount(0, str.length).toLong
      case _           => null
    }
  }
  final case class StrLower[A](s: Expr[A, String]) extends Expr[A, String] {
    private[graft] def toColumn(in: Column): Column = lower(s.toColumn(in))
    private[graft] def eval(in: Any): Any = s.eval(in) match {
      case str: String => str.toLowerCase(java.util.Locale.ROOT)
      case _           => null
    }
  }
  final case class StrUpper[A](s: Expr[A, String]) extends Expr[A, String] {
    private[graft] def toColumn(in: Column): Column = upper(s.toColumn(in))
    private[graft] def eval(in: Any): Any = s.eval(in) match {
      case str: String => str.toUpperCase(java.util.Locale.ROOT)
      case _           => null
    }
  }
  /** SQL substring: `pos` is 1-based in CODE POINTS, out-of-range clamps to
    * the string; `len` clamps to [0, Int.MaxValue] on BOTH paths (an
    * unclamped cast-to-int would silently wrap `Long.MaxValue` to -1).
    * Only non-negative `pos` is supported (the from-the-end negative
    * convention is not). */
  final case class SubStr[A](s: Expr[A, String], pos: Expr[A, Long], len: Expr[A, Long]) extends Expr[A, String] {
    private[graft] def toColumn(in: Column): Column =
      substring(s.toColumn(in),
        least(greatest(pos.toColumn(in), lit(0L)), lit(Int.MaxValue.toLong)).cast("int"),
        least(greatest(len.toColumn(in), lit(0L)), lit(Int.MaxValue.toLong)).cast("int"))
    private[graft] def eval(in: Any): Any = (s.eval(in), pos.eval(in), len.eval(in)) match {
      case (str: String, p: Long, n: Long) =>
        require(p >= 0, s"SubStr.eval supports non-negative pos only, got $p")
        val cpLen = str.codePointCount(0, str.length).toLong
        val from = math.min(math.max(p - 1, 0L), cpLen)
        val until = math.min(from + math.min(math.max(n, 0L), Int.MaxValue.toLong), cpLen)
        str.substring(
          str.offsetByCodePoints(0, from.toInt),
          str.offsetByCodePoints(0, until.toInt))
      case _ => null
    }
  }

  // ---------------------------------------------------------------------
  // Date/time over epoch-ms Longs (engine extension: the reference models
  // time as raw Long epoch-ms — Window.scala:12-13 — and offers no calendar
  // surface, so facade queries had to hand-roll Long arithmetic).
  // Calendar parts are UTC and computed by the SAME closed-form integer
  // arithmetic on both paths (civil-from-days, Howard Hinnant's
  // chrono-compatible algorithm — public domain, http://howardhinnant
  // .github.io/date_algorithms.html): Catalyst builds it from plain Column
  // arithmetic (codegen'd, zero timezone dependence), eval runs the same
  // formulas on Longs. Spark's own year()/hour()/… honor
  // spark.sql.session.timeZone, which would make the Catalyst path
  // silently diverge from eval in any non-UTC session — the arithmetic
  // form cannot diverge, in ANY session, by construction (the spec checks
  // it against java.time UTC across random instants).
  // ---------------------------------------------------------------------

  private[graft] val dateParts =
    Set("year", "month", "day", "hour", "minute", "second", "dow", "doy")

  /** Calendar part of a UTC epoch-ms timestamp, as Long. `dow` follows SQL
    * convention (1 = Sunday … 7 = Saturday). */
  final case class DatePart[A](ts: Expr[A, Long], part: String) extends Expr[A, Long] {
    require(dateParts(part), s"unknown date part '$part' (expected one of ${dateParts.toSeq.sorted.mkString(", ")})")

    private[graft] def toColumn(in: Column): Column = {
      val ms = ts.toColumn(in)
      // Spark's Column `/` is fractional Divide (double result); exact
      // integer floor-div is (a - pmod(a,b)) / b — the numerator is exactly
      // divisible, so the double quotient is integral — cast back to long.
      // (All magnitudes here stay far below 2^53, so doubles are exact.)
      def fdiv(a: Column, b: Long): Column = ((a - pmod(a, lit(b))) / lit(b)).cast("long")
      part match {
        case "hour"   => pmod(fdiv(ms, 3600000L), lit(24L))
        case "minute" => pmod(fdiv(ms, 60000L), lit(60L))
        case "second" => pmod(fdiv(ms, 1000L), lit(60L))
        case "dow"    => pmod(fdiv(ms, 86400000L) + lit(4L), lit(7L)) + lit(1L)
        case _ =>
          // civil-from-days: every fdiv below runs on a non-negative value
          // except z (handled by pmod-based flooring)
          val z = fdiv(ms, 86400000L) + lit(719468L)
          val era = fdiv(z, 146097L)
          val doe = z - era * 146097L                                   // [0, 146096]
          val yoe = fdiv(doe - fdiv(doe, 1460L) + fdiv(doe, 36524L) - fdiv(doe, 146096L), 365L) // [0, 399]
          val doy = doe - (yoe * 365L + fdiv(yoe, 4L) - fdiv(yoe, 100L)) // [0, 365]
          val mp = fdiv(doy * 5L + 2L, 153L)                            // [0, 11]
          val day = doy - fdiv(mp * 153L + 2L, 5L) + 1L                 // [1, 31]
          val month = when(mp < 10L, mp + 3L).otherwise(mp - 9L)        // [1, 12]
          val year = yoe + era * 400L + when(month <= 2L, lit(1L)).otherwise(lit(0L))
          part match {
            case "year"  => year
            case "month" => month
            case "day"   => day
            case "doy" => // civil doy is March-based; count from Jan 1 instead:
              // days-from-civil(year,1,1) = era(y-1)*146097 + yoe*365 +
              // yoe/4 - yoe/100 + 306 - 719468 (Jan has March-based mp=10,
              // whose day-of-era offset is (10*153+2)/5 = 306)
              val y1 = year - 1L
              val e1 = fdiv(y1, 400L)
              val yoe1 = y1 - e1 * 400L
              val jan1 = e1 * 146097L + yoe1 * 365L + fdiv(yoe1, 4L) - fdiv(yoe1, 100L) + 306L - 719468L
              fdiv(ms, 86400000L) - jan1 + 1L
          }
      }
    }

    private[graft] def eval(in: Any): Any = ts.eval(in) match {
      case ms: Long =>
        import java.lang.Math.{floorDiv, floorMod}
        part match {
          case "hour"   => floorMod(floorDiv(ms, 3600000L), 24L)
          case "minute" => floorMod(floorDiv(ms, 60000L), 60L)
          case "second" => floorMod(floorDiv(ms, 1000L), 60L)
          case "dow"    => floorMod(floorDiv(ms, 86400000L) + 4L, 7L) + 1L
          case _ =>
            val z = floorDiv(ms, 86400000L) + 719468L
            val era = floorDiv(z, 146097L)
            val doe = z - era * 146097L
            val yoe = (doe - doe / 1460L + doe / 36524L - doe / 146096L) / 365L
            val doy = doe - (365L * yoe + yoe / 4L - yoe / 100L)
            val mp = (doy * 5L + 2L) / 153L
            val day = doy - (mp * 153L + 2L) / 5L + 1L
            val month = if (mp < 10L) mp + 3L else mp - 9L
            val year = yoe + era * 400L + (if (month <= 2L) 1L else 0L)
            part match {
              case "year"  => year
              case "month" => month
              case "day"   => day
              case "doy" => // same Jan-1 formulation as the Column path
                val y1 = year - 1L
                val e1 = floorDiv(y1, 400L)
                val yoe1 = y1 - e1 * 400L
                val jan1 = e1 * 146097L + yoe1 * 365L + yoe1 / 4L - yoe1 / 100L + 306L - 719468L
                floorDiv(ms, 86400000L) - jan1 + 1L
            }
        }
      case _ => null
    }
  }

  /** Floor an epoch-ms timestamp to a `unitMs` boundary (day/hour/minute/…)
    * — `pmod`/`floorMod` keep pre-1970 negatives flooring toward -∞ on both
    * paths. */
  final case class TruncMs[A](ts: Expr[A, Long], unitMs: Long) extends Expr[A, Long] {
    require(unitMs > 0, s"truncation unit must be positive, got $unitMs")
    private[graft] def toColumn(in: Column): Column = {
      val t = ts.toColumn(in)
      t - pmod(t, lit(unitMs))
    }
    private[graft] def eval(in: Any): Any = ts.eval(in) match {
      case ms: Long => ms - java.lang.Math.floorMod(ms, unitMs)
      case _        => null
    }
  }

  /** List length as Long (reference `Length`, Expression.scala:27). */
  final case class Length[A, B](list: Expr[A, List[B]]) extends Expr[A, Long] {
    private[graft] def toColumn(in: Column): Column = size(list.toColumn(in)).cast("long")
    private[graft] def eval(in: Any): Any = list.eval(in) match {
      case null                        => null
      case xs: scala.collection.Seq[_] => xs.size.toLong
    }
  }

  /** Sum of a Long list (reference `ListSum`, Expression.scala:33). Uses the
    * codegen-friendly higher-order `aggregate` — no UDF. */
  final case class ListSum[A](list: Expr[A, List[Long]]) extends Expr[A, Long] {
    private[graft] def toColumn(in: Column): Column =
      aggregate(list.toColumn(in), lit(0L), (acc, x) => acc + x)
    private[graft] def eval(in: Any): Any = list.eval(in) match {
      case null                          => null
      case xs: scala.collection.Seq[Any] => xs.foldLeft(0L)((a, x) => a + x.asInstanceOf[Long])
    }
  }

  // ---------------------------------------------------------------------
  // Structure constructors / accessors (reference Expression.scala:26-32,
  // 42-43)
  // ---------------------------------------------------------------------

  final case class KeyValue[A, K, V](k: Expr[A, K], v: Expr[A, V]) extends Expr[A, graft.Grouped[K, V]] {
    private[graft] def toColumn(in: Column): Column =
      struct(k.toColumn(in).as("key"), v.toColumn(in).as("value"))
    private[graft] def eval(in: Any): Any = graft.Grouped(k.eval(in), v.eval(in))
  }

  final case class GroupedKey[A, K, V](e: Expr[A, graft.Grouped[K, V]]) extends Expr[A, K] {
    private[graft] def toColumn(in: Column): Column = e.toColumn(in).getField("key")
    private[graft] def eval(in: Any): Any = fieldOf(e.eval(in), 0, "key")
  }
  final case class GroupedValue[A, K, V](e: Expr[A, graft.Grouped[K, V]]) extends Expr[A, V] {
    private[graft] def toColumn(in: Column): Column = e.toColumn(in).getField("value")
    private[graft] def eval(in: Any): Any = fieldOf(e.eval(in), 1, "value")
  }

  final case class GroupKey[A, K, V](e: Expr[A, graft.Group[K, V]]) extends Expr[A, K] {
    private[graft] def toColumn(in: Column): Column = e.toColumn(in).getField("key")
    private[graft] def eval(in: Any): Any = fieldOf(e.eval(in), 0, "key")
  }
  final case class GroupValues[A, K, V](e: Expr[A, graft.Group[K, V]]) extends Expr[A, List[V]] {
    private[graft] def toColumn(in: Column): Column = e.toColumn(in).getField("values")
    private[graft] def eval(in: Any): Any = fieldOf(e.eval(in), 1, "values")
  }

  final case class TimestampedTime[A, B](e: Expr[A, graft.Timestamped[B]]) extends Expr[A, Long] {
    private[graft] def toColumn(in: Column): Column = e.toColumn(in).getField("timestamp")
    private[graft] def eval(in: Any): Any = fieldOf(e.eval(in), 0, "timestamp")
  }
  final case class TimestampedValue[A, B](e: Expr[A, graft.Timestamped[B]]) extends Expr[A, B] {
    private[graft] def toColumn(in: Column): Column = e.toColumn(in).getField("value")
    private[graft] def eval(in: Any): Any = fieldOf(e.eval(in), 1, "value")
  }

  final case class WindowedWindow[A, B](e: Expr[A, graft.Windowed[B]]) extends Expr[A, graft.TimeWindow] {
    private[graft] def toColumn(in: Column): Column = e.toColumn(in).getField("window")
    private[graft] def eval(in: Any): Any = fieldOf(e.eval(in), 0, "window")
  }
  final case class WindowedValue[A, B](e: Expr[A, graft.Windowed[B]]) extends Expr[A, B] {
    private[graft] def toColumn(in: Column): Column = e.toColumn(in).getField("value")
    private[graft] def eval(in: Any): Any = fieldOf(e.eval(in), 1, "value")
  }

  // ---------------------------------------------------------------------
  // Implicit lifting of Scala literals (reference Type.scala:12-27 +
  // Expression.scala:94-97 lifting) and the fluent operator syntax
  // (reference Expression.scala:45-92).
  // ---------------------------------------------------------------------

  /** Normalize an expression to a Compose/Both/Flip-free constructor tree by
    * inlining composition: substitute each node's input expression into its
    * `Id` leaves. `f >>> g` denotes the same function as g-with-f-inlined —
    * `toColumn` already evaluates it that way (Compose.toColumn threads the
    * column through), so normalization never changes semantics; it only
    * exposes the shape to pattern matchers. This is what lets the
    * fold/foldWindow aggregate REWRITER recognize composed reducers
    * (`g.values.sum >>> …`) and compile them to native partial aggregates
    * instead of falling back to collect_list (the reference always
    * materializes groups — Local.scala:170-173; our rewriter is the
    * deliberate improvement, SURVEY §4.2). */
  private[graft] def normalize[A, B](e: Expr[A, B]): Expr[A, B] =
    subst(e, Id[Any]()).asInstanceOf[Expr[A, B]]

  private def subst(e: Expr[_, _], in: Expr[_, _]): Expr[_, _] = {
    type E = Expr[Any, Any]
    def s(x: Expr[_, _]): E = subst(x, in).asInstanceOf[E]
    e match {
      case Id()           => in
      // apply f first, then g with f's result as its input
      case Compose(f, g)  => subst(g, subst(f, in))
      case FanOut(f, g)   => FanOut(s(f), s(g))
      // component-wise pair map = fan-out over the projected components
      case Both(f, g)     => FanOut(
        subst(f, Nth[Any, Any](in.asInstanceOf[E], 0)).asInstanceOf[E],
        subst(g, Nth[Any, Any](in.asInstanceOf[E], 1)).asInstanceOf[E])
      case Flip()         => FanOut(
        Nth[Any, Any](in.asInstanceOf[E], 1), Nth[Any, Any](in.asInstanceOf[E], 0))
      case Nth(c, n)      => Nth[Any, Any](s(c), n)
      case l @ (LitLong(_) | LitDouble(_) | LitString(_) | LitBoolean(_)) => l
      case Arith(l, r, op)   => Arith(s(l), s(r), op)
      case Cmp(l, r, op)     => Cmp(s(l), s(r), op)
      case BoolOp(l, r, op)  => BoolOp(s(l).asInstanceOf[Expr[Any, Boolean]], s(r).asInstanceOf[Expr[Any, Boolean]], op)
      case Not(x)            => Not(s(x).asInstanceOf[Expr[Any, Boolean]])
      case If(c, a, b)       => If(s(c).asInstanceOf[Expr[Any, Boolean]], s(a), s(b))
      case SplitStr(a, d)    => SplitStr(s(a).asInstanceOf[Expr[Any, String]], s(d).asInstanceOf[Expr[Any, String]])
      case StrConcat(a, c)   => StrConcat(s(a).asInstanceOf[Expr[Any, String]], s(c).asInstanceOf[Expr[Any, String]])
      case StrLen(a)         => StrLen(s(a).asInstanceOf[Expr[Any, String]])
      case StrLower(a)       => StrLower(s(a).asInstanceOf[Expr[Any, String]])
      case StrUpper(a)       => StrUpper(s(a).asInstanceOf[Expr[Any, String]])
      case SubStr(a, p, n)   => SubStr(s(a).asInstanceOf[Expr[Any, String]],
        s(p).asInstanceOf[Expr[Any, Long]], s(n).asInstanceOf[Expr[Any, Long]])
      case DatePart(t, p)    => DatePart(s(t).asInstanceOf[Expr[Any, Long]], p)
      case TruncMs(t, u)     => TruncMs(s(t).asInstanceOf[Expr[Any, Long]], u)
      case Length(x)         => Length(s(x).asInstanceOf[Expr[Any, List[Any]]])
      case ListSum(x)        => ListSum(s(x).asInstanceOf[Expr[Any, List[Long]]])
      case KeyValue(k, v)    => KeyValue(s(k), s(v))
      case GroupedKey(x)     => GroupedKey(s(x).asInstanceOf[Expr[Any, graft.Grouped[Any, Any]]])
      case GroupedValue(x)   => GroupedValue(s(x).asInstanceOf[Expr[Any, graft.Grouped[Any, Any]]])
      case GroupKey(x)       => GroupKey(s(x).asInstanceOf[Expr[Any, graft.Group[Any, Any]]])
      case GroupValues(x)    => GroupValues(s(x).asInstanceOf[Expr[Any, graft.Group[Any, Any]]])
      case TimestampedTime(x)  => TimestampedTime(s(x).asInstanceOf[Expr[Any, graft.Timestamped[Any]]])
      case TimestampedValue(x) => TimestampedValue(s(x).asInstanceOf[Expr[Any, graft.Timestamped[Any]]])
      case WindowedWindow(x)   => WindowedWindow(s(x).asInstanceOf[Expr[Any, graft.Windowed[Any]]])
      case WindowedValue(x)    => WindowedValue(s(x).asInstanceOf[Expr[Any, graft.Windowed[Any]]])
    }
  }

  implicit def liftLong[A](l: Long): Expr[A, Long] = LitLong(l)
  implicit def liftInt[A](i: Int): Expr[A, Long] = LitLong(i.toLong)
  implicit def liftDouble[A](d: Double): Expr[A, Double] = LitDouble(d)
  implicit def liftString[A](s: String): Expr[A, String] = LitString(s)
  implicit def liftBoolean[A](b: Boolean): Expr[A, Boolean] = LitBoolean(b)

  /** Tuple lifting sugar (reference `sequenceTuple`/`liftMixedL`/`liftMixedR`,
    * Expression.scala:94-97): a pair of expressions — or a pair mixing an
    * expression with a plain liftable value — is itself an expression. */
  implicit def sequenceTuple[A, B, C](t: (Expr[A, B], Expr[A, C])): Expr[A, (B, C)] =
    FanOut(t._1, t._2)
  implicit def liftMixedR[A, B, C](t: (Expr[A, B], C))(implicit l: Liftable[C]): Expr[A, (B, C)] =
    FanOut(t._1, l.lift[A](t._2))
  implicit def liftMixedL[A, B, C](t: (B, Expr[A, C]))(implicit l: Liftable[B]): Expr[A, (B, C)] =
    FanOut(l.lift[A](t._1), t._2)

  /** Typeclass behind the mixed-tuple lifts (the reference's `Type[A]`
    * lifting surface, Type.scala:12-27, restricted to literal-able types). */
  sealed trait Liftable[B] { def lift[A](b: B): Expr[A, B] }
  object Liftable {
    implicit val longLiftable: Liftable[Long] = new Liftable[Long] {
      def lift[A](b: Long): Expr[A, Long] = LitLong(b)
    }
    implicit val doubleLiftable: Liftable[Double] = new Liftable[Double] {
      def lift[A](b: Double): Expr[A, Double] = LitDouble(b)
    }
    implicit val stringLiftable: Liftable[String] = new Liftable[String] {
      def lift[A](b: String): Expr[A, String] = LitString(b)
    }
    implicit val booleanLiftable: Liftable[Boolean] = new Liftable[Boolean] {
      def lift[A](b: Boolean): Expr[A, Boolean] = LitBoolean(b)
    }
  }

  implicit final class LongExprOps[A](private val e: Expr[A, Long]) extends AnyVal {
    def +(o: Expr[A, Long]): Expr[A, Long] = Arith(e, o, "+")
    def -(o: Expr[A, Long]): Expr[A, Long] = Arith(e, o, "-")
    def *(o: Expr[A, Long]): Expr[A, Long] = Arith(e, o, "*")
    def /(o: Expr[A, Long]): Expr[A, Long] = Arith(e, o, "quot")
    def %(o: Expr[A, Long]): Expr[A, Long] = Arith(e, o, "%")
    def <(o: Expr[A, Long]): Expr[A, Boolean] = Cmp(e, o, "<")
    def <=(o: Expr[A, Long]): Expr[A, Boolean] = Cmp(e, o, "<=")
    def >(o: Expr[A, Long]): Expr[A, Boolean] = Cmp(e, o, ">")
    def >=(o: Expr[A, Long]): Expr[A, Boolean] = Cmp(e, o, ">=")
    def ===(o: Expr[A, Long]): Expr[A, Boolean] = Cmp(e, o, "==")
    def =!=(o: Expr[A, Long]): Expr[A, Boolean] = Cmp(e, o, "!=")
  }

  implicit final class DoubleExprOps[A](private val e: Expr[A, Double]) extends AnyVal {
    def +(o: Expr[A, Double]): Expr[A, Double] = Arith(e, o, "+")
    def -(o: Expr[A, Double]): Expr[A, Double] = Arith(e, o, "-")
    def *(o: Expr[A, Double]): Expr[A, Double] = Arith(e, o, "*")
    def /(o: Expr[A, Double]): Expr[A, Double] = Arith(e, o, "/")
    def %(o: Expr[A, Double]): Expr[A, Double] = Arith(e, o, "%")
    def <(o: Expr[A, Double]): Expr[A, Boolean] = Cmp(e, o, "<")
    def <=(o: Expr[A, Double]): Expr[A, Boolean] = Cmp(e, o, "<=")
    def >(o: Expr[A, Double]): Expr[A, Boolean] = Cmp(e, o, ">")
    def >=(o: Expr[A, Double]): Expr[A, Boolean] = Cmp(e, o, ">=")
    def ===(o: Expr[A, Double]): Expr[A, Boolean] = Cmp(e, o, "==")
    def =!=(o: Expr[A, Double]): Expr[A, Boolean] = Cmp(e, o, "!=")
  }

  implicit final class StringExprOps[A](private val e: Expr[A, String]) extends AnyVal {
    /** Regex split, matching the reference's Java-split semantics
      * (Local.scala:26). */
    def split(delim: Expr[A, String]): Expr[A, List[String]] = SplitStr(e, delim)
    def ===(o: Expr[A, String]): Expr[A, Boolean] = Cmp(e, o, "==")
    def =!=(o: Expr[A, String]): Expr[A, Boolean] = Cmp(e, o, "!=")
    def ++(o: Expr[A, String]): Expr[A, String] = StrConcat(e, o)
    def strlen: Expr[A, Long] = StrLen(e)
    def toLowerCase: Expr[A, String] = StrLower(e)
    def toUpperCase: Expr[A, String] = StrUpper(e)
    /** SQL-style 1-based substring (clamping; see [[SubStr]]). */
    def substring(pos: Expr[A, Long], len: Expr[A, Long]): Expr[A, String] = SubStr(e, pos, len)
  }

  /** Epoch-ms calendar surface (distinct names so they never collide with
    * [[LongExprOps]] arithmetic on the same Long expressions). */
  implicit final class EpochMsExprOps[A](private val e: Expr[A, Long]) extends AnyVal {
    def msYear: Expr[A, Long] = DatePart(e, "year")
    def msMonth: Expr[A, Long] = DatePart(e, "month")
    def msDay: Expr[A, Long] = DatePart(e, "day")
    def msHour: Expr[A, Long] = DatePart(e, "hour")
    def msMinute: Expr[A, Long] = DatePart(e, "minute")
    def msSecond: Expr[A, Long] = DatePart(e, "second")
    def msDayOfWeek: Expr[A, Long] = DatePart(e, "dow")
    def msDayOfYear: Expr[A, Long] = DatePart(e, "doy")
    def truncToDay: Expr[A, Long] = TruncMs(e, 86400000L)
    def truncToHour: Expr[A, Long] = TruncMs(e, 3600000L)
    def truncToMinute: Expr[A, Long] = TruncMs(e, 60000L)
    def truncToMs(unitMs: Long): Expr[A, Long] = TruncMs(e, unitMs)
  }

  implicit final class BoolExprOps[A](private val e: Expr[A, Boolean]) extends AnyVal {
    def &&(o: Expr[A, Boolean]): Expr[A, Boolean] = BoolOp(e, o, "&&")
    def ||(o: Expr[A, Boolean]): Expr[A, Boolean] = BoolOp(e, o, "||")
    def unary_! : Expr[A, Boolean] = Not(e)
    /** `cond.ifElse(t, f)` — CASE WHEN cond THEN t ELSE f. */
    def ifElse[B](t: Expr[A, B], f: Expr[A, B]): Expr[A, B] = If(e, t, f)
  }

  implicit final class ListExprOps[A, B](private val e: Expr[A, List[B]]) extends AnyVal {
    def length: Expr[A, Long] = Length(e)
  }
  implicit final class LongListExprOps[A](private val e: Expr[A, List[Long]]) extends AnyVal {
    def sum: Expr[A, Long] = ListSum(e)
  }

  implicit final class Tuple2ExprOps[A, B, C](private val e: Expr[A, (B, C)]) extends AnyVal {
    def _1: Expr[A, B] = Nth(e, 0)
    def _2: Expr[A, C] = Nth(e, 1)
    def flip: Expr[A, (C, B)] = e >>> Flip[B, C]()
  }
  implicit final class Tuple3ExprOps[A, B, C, D](private val e: Expr[A, (B, C, D)]) extends AnyVal {
    def _1: Expr[A, B] = Nth(e, 0)
    def _2: Expr[A, C] = Nth(e, 1)
    def _3: Expr[A, D] = Nth(e, 2)
  }
  implicit final class Tuple4ExprOps[A, B, C, D, E](private val e: Expr[A, (B, C, D, E)]) extends AnyVal {
    def _1: Expr[A, B] = Nth(e, 0)
    def _2: Expr[A, C] = Nth(e, 1)
    def _3: Expr[A, D] = Nth(e, 2)
    def _4: Expr[A, E] = Nth(e, 3)
  }

  implicit final class GroupedExprOps[A, K, V](private val e: Expr[A, graft.Grouped[K, V]]) extends AnyVal {
    def key: Expr[A, K] = GroupedKey(e)
    def value: Expr[A, V] = GroupedValue(e)
  }
  implicit final class GroupExprOps[A, K, V](private val e: Expr[A, graft.Group[K, V]]) extends AnyVal {
    def key: Expr[A, K] = GroupKey(e)
    def values: Expr[A, List[V]] = GroupValues(e)
  }
  implicit final class TimestampedExprOps[A, B](private val e: Expr[A, graft.Timestamped[B]]) extends AnyVal {
    def timestamp: Expr[A, Long] = TimestampedTime(e)
    def value: Expr[A, B] = TimestampedValue(e)
  }
  implicit final class WindowedExprOps[A, B](private val e: Expr[A, graft.Windowed[B]]) extends AnyVal {
    def window: Expr[A, graft.TimeWindow] = WindowedWindow(e)
    def value: Expr[A, B] = WindowedValue(e)
  }
}
