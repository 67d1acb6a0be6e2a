package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a batch feature-extraction operator.
  *
  * The Spark-side plumbing is real — binary columns, schema, partition-wise
  * batch decode via `mapPartitions` (the Scala analogue of `mapInPandas`:
  * one decoder instantiation per partition, streaming rows through it) —
  * while the codec itself is a deterministic STUB (`FakeCodec`): the
  * container ships no image/audio libraries, so decode derives features
  * from the raw bytes reproducibly. Swapping `FakeCodec` for a real one
  * (JavaCPP/FFmpeg etc.) changes no plumbing.
  *
  * At scale: binary payloads never shuffle — features are extracted in the
  * scan stage (narrow), and only the small typed feature rows flow on. Keep
  * payloads under `spark.sql.files.maxPartitionBytes` per batch by storing
  * media in its own table keyed by content hash.
  */
object Media {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType), StructField("declared_bytes", LongType)))) ))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("n_frames", IntegerType), StructField("checksum", LongType)))

  /** Deterministic stand-in for a real decoder. Reads actual bytes so the
    * plumbing (payload transport, per-partition batching) is exercised
    * end-to-end; a real codec would replace exactly this object. */
  object FakeCodec {
    def decode(kind: String, content: Array[Byte]): (Int, Int, Int, Long) = {
      val n = content.length
      val first = if (n > 0) content(0) & 0xff else 0
      val checksum = content.iterator.take(64).foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
      kind match {
        case "image" => (16 + n % 640, 16 + first % 480, 1, checksum)
        case "audio" => (0, 0, n / 4, checksum)     // "samples"
        case _       => (16 + n % 640, 16 + first % 480, n / 1024 + 1, checksum)
      }
    }
  }

  /** Wrap a text table as a media table (payload = UTF-8 bytes) — the
    * ingest shim for the test corpus, which has no true binary assets. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"), // pmod: total over negative ids
      encode(col("text"), "UTF-8").as("content"),
      struct(col("source").as("source"), col("n_chars").as("declared_bytes")).as("meta"))

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling: one row per every `everyNth` "frame" of the payload —
    * one media row fans out to 0..n frame rows (the multimodal analogue of
    * mapConcat/UNNEST). The frame extraction is the stub codec (fixed-size
    * byte slices); the fan-out shape, schema, and partition-wise batching
    * are the real plumbing. */
  def sampleFrames(media: DataFrame, everyNth: Int, frameBytes: Int = 256): DataFrame = {
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // ceil: the trailing partial frame is a frame too
          val nFrames = math.max((bytes.length + frameBytes - 1) / frameBytes, 1)
          (0 until nFrames by everyNth).map { i =>
            val from = math.min(i * frameBytes, bytes.length)
            val until = math.min(from + frameBytes, bytes.length)
            Row(id, i, java.util.Arrays.copyOfRange(bytes, from, until))
          }
        }
      }(Encoders.row(frameSchema))
  }

  /** "Resize": recompute target dimensions preserving aspect ratio — the
    * codec part is stubbed (no pixel data to resample in this container),
    * the metadata arithmetic and column plumbing are real. */
  def resizeMeta(features: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / greatest(col("width").cast("double"), lit(1.0)),
      lit(maxSide.toDouble) / greatest(col("height").cast("double"), lit(1.0)),
      lit(1.0))
    features.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Partition-wise batch decode → typed feature rows. One codec per
    * partition, rows streamed through — the mapInPandas shape. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val out = media.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, h, frames, checksum) = FakeCodec.decode(kind, bytes)
          Row(id, kind, bytes.length.toLong, w, h, frames, checksum)
        }
      }(Encoders.row(featureSchema))
    out
  }
}
