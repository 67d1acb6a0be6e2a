package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Typeclass mapping the algebra's element types to Spark SQL types and to
  * external row encodings (tuples/records → `Row`).
  *
  * Mirrors the reference's `Type[A]` typeclass (reference:
  * src/main/scala/zio/analytics/Type.scala:3-27), whose only job there is to
  * lift literals into the IR; here it additionally carries the runtime
  * `DataType` so `fromLiterals` and `mapAccumulate` can build DataFrames with
  * the engine's canonical encoding (tuples = structs `_1.._n`, wrapper
  * records = structs with case-class field names).
  */
trait SparkType[A] {
  def dataType: DataType

  /** Scala value → Spark external row value (what `Row`s may contain). */
  def encode(a: A): Any

  /** Spark external row value → Scala value. */
  def decode(v: Any): A
}

object SparkType {
  def apply[A](implicit st: SparkType[A]): SparkType[A] = st

  private def instance[A](dt: DataType)(enc: A => Any)(dec: Any => A): SparkType[A] =
    new SparkType[A] {
      val dataType: DataType = dt
      def encode(a: A): Any = enc(a)
      def decode(v: Any): A = dec(v)
    }

  // decode is null-hostile on purpose: `null.asInstanceOf[Long]` silently
  // unboxes to 0 — a fabricated value. Untyped ingress (fromDF, outer
  // joins) with nullable columns should stay in DataFrame land.
  private def nn(v: Any): Any =
    if (v == null) sys.error(
      "null value cannot decode to a primitive; nullable results are not " +
        "representable in this typed view — read them via toDF instead")
    else v

  implicit val longType: SparkType[Long] =
    instance[Long](LongType)(identity)(nn(_).asInstanceOf[Long])
  implicit val doubleType: SparkType[Double] =
    instance[Double](DoubleType)(identity)(nn(_).asInstanceOf[Double])
  implicit val stringType: SparkType[String] =
    instance[String](StringType)(identity)(nn(_).asInstanceOf[String])
  implicit val booleanType: SparkType[Boolean] =
    instance[Boolean](BooleanType)(identity)(nn(_).asInstanceOf[Boolean])

  implicit def tuple2Type[A, B](implicit a: SparkType[A], b: SparkType[B]): SparkType[(A, B)] =
    instance[(A, B)](StructType(Seq(
      StructField("_1", a.dataType), StructField("_2", b.dataType)))) {
      t => Row(a.encode(t._1), b.encode(t._2))
    } { case r: Row => (a.decode(r.get(0)), b.decode(r.get(1))) }

  implicit def tuple3Type[A, B, C](implicit a: SparkType[A], b: SparkType[B], c: SparkType[C]): SparkType[(A, B, C)] =
    instance[(A, B, C)](StructType(Seq(
      StructField("_1", a.dataType), StructField("_2", b.dataType), StructField("_3", c.dataType)))) {
      t => Row(a.encode(t._1), b.encode(t._2), c.encode(t._3))
    } { case r: Row => (a.decode(r.get(0)), b.decode(r.get(1)), c.decode(r.get(2))) }

  implicit def listType[A](implicit a: SparkType[A]): SparkType[List[A]] =
    instance[List[A]](ArrayType(a.dataType)) {
      xs => xs.map(a.encode)
      // Spark hands arrays back as either immutable or MUTABLE ArraySeq
      // depending on the path — cast to collection.Seq (2.13's bare Seq is
      // immutable-only and the cast blows up on mutable.ArraySeq)
    } { v => v.asInstanceOf[scala.collection.Seq[Any]].map(a.decode).toList }

  implicit def groupedType[K, V](implicit k: SparkType[K], v: SparkType[V]): SparkType[graft.Grouped[K, V]] =
    instance[graft.Grouped[K, V]](StructType(Seq(
      StructField("key", k.dataType), StructField("value", v.dataType)))) {
      g => Row(k.encode(g.key), v.encode(g.value))
    } { case r: Row => graft.Grouped(k.decode(r.get(0)), v.decode(r.get(1))) }

  implicit def groupType[K, V](implicit k: SparkType[K], v: SparkType[V]): SparkType[graft.Group[K, V]] =
    instance[graft.Group[K, V]](StructType(Seq(
      StructField("key", k.dataType), StructField("values", ArrayType(v.dataType))))) {
      g => Row(k.encode(g.key), g.values.map(v.encode))
    } { case r: Row =>
      graft.Group(k.decode(r.get(0)), r.get(1).asInstanceOf[scala.collection.Seq[Any]].map(v.decode).toSeq)
    }

  implicit def timestampedType[A](implicit a: SparkType[A]): SparkType[graft.Timestamped[A]] =
    instance[graft.Timestamped[A]](StructType(Seq(
      StructField("timestamp", LongType), StructField("value", a.dataType)))) {
      t => Row(t.timestamp, a.encode(t.value))
    } { case r: Row => graft.Timestamped(r.getLong(0), a.decode(r.get(1))) }

  implicit val timeWindowType: SparkType[graft.TimeWindow] =
    instance[graft.TimeWindow](StructType(Seq(
      StructField("start", LongType), StructField("end", LongType)))) {
      w => Row(w.start, w.end)
    } { case r: Row => graft.TimeWindow(r.getLong(0), r.getLong(1)) }

  implicit def windowedType[A](implicit a: SparkType[A]): SparkType[graft.Windowed[A]] =
    instance[graft.Windowed[A]](StructType(Seq(
      StructField("window", timeWindowType.dataType), StructField("value", a.dataType)))) {
      w => Row(timeWindowType.encode(w.window), a.encode(w.value))
    } { case r: Row => graft.Windowed(timeWindowType.decode(r.get(0)), a.decode(r.get(1))) }
}
