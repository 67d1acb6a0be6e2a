package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a batch feature-extraction operator.
  *
  * The Spark-side plumbing is real — binary columns, schema, partition-wise
  * batch decode via `mapPartitions` (the Scala analogue of `mapInPandas`:
  * one decoder instantiation per partition, streaming rows through it).
  * Decoding is REAL for self-describing header formats — BMP dimensions and
  * WAV channels/rate/duration parse from actual bytes ([[Media.HeaderCodec]],
  * pure JVM, no codec library needed) — and a deterministic STUB
  * (`FakeCodec`) for formats whose decode needs a native library the
  * container doesn't ship (JPEG/MP3/H.264). Swapping `FakeCodec` for a real
  * one (JavaCPP/FFmpeg etc.) changes no plumbing.
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

  /** Deterministic stand-in for a decoder of formats whose decode needs a
    * real codec library (JPEG/MP3/H.264 — not shipped in this container).
    * Reads actual bytes so the plumbing (payload transport, per-partition
    * batching) is exercised end-to-end; a real codec would replace exactly
    * this object. Self-describing header formats (BMP, WAV) are decoded for
    * REAL by [[HeaderCodec]] — [[Codec.decode]] dispatches. */
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

  final case class WavMeta(channels: Int, sampleRateHz: Int, bitsPerSample: Int,
                           nSamples: Long) {
    def durationSeconds: Double =
      if (sampleRateHz <= 0) 0.0 else nSamples.toDouble / sampleRateHz
  }

  /** REAL pure-JVM decoders for self-describing container headers: BMP
    * dimensions and WAV audio metadata live at fixed little-endian offsets,
    * so no external codec library is needed. Malformed bytes return None —
    * decode never throws mid-scan. */
  object HeaderCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** BMP (BITMAPINFOHEADER and later): 'BM' magic; int32-LE width at
      * byte 18, int32-LE height at byte 22 (negative = top-down row order,
      * magnitude is the pixel height). */
    def decodeBmp(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 26 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) None
      else {
        val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        val w = bb.getInt(18)
        val h = math.abs(bb.getInt(22))
        if (w > 0 && h > 0) Some((w, h)) else None
      }
    }

    /** WAV: 'RIFF' + 'WAVE' magic, then a proper chunk walk (real files put
      * LIST/fact chunks before 'data' — assuming the canonical 44-byte
      * layout mis-parses them): 'fmt ' yields channels/rate/bits/blockAlign,
      * 'data' yields payload size → sample count. */
    def decodeWav(b: Array[Byte]): Option[WavMeta] = {
      if (b.length < 12 || !hasTag(b, 0, "RIFF") || !hasTag(b, 8, "WAVE")) None
      else {
        val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        // pos advances in LONG arithmetic: a hostile/garbled size field near
        // 2^32 would truncate to a zero-or-negative Int advance — an
        // infinite loop or out-of-bounds read inside an executor scan. The
        // unsigned size is always >= 0, so the Long cursor strictly
        // advances (>= 8 per chunk) and overshoot just ends the walk.
        var pos = 12L
        var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
        var dataBytes = -1L
        while (pos + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
          val p = pos.toInt // safe: pos + 8 <= b.length <= Int.MaxValue
          val size = bb.getInt(p + 4).toLong & 0xffffffffL
          if (hasTag(b, p, "fmt ") && p + 24 <= b.length) {
            fmt = Some((bb.getShort(p + 10).toInt, bb.getInt(p + 12),
              if (p + 24 + 2 <= b.length) bb.getShort(p + 22).toInt else 16,
              bb.getShort(p + 20).toInt))
          } else if (hasTag(b, p, "data")) {
            dataBytes = math.min(size, (b.length - p - 8).toLong)
          }
          // chunks are word-aligned: odd sizes carry a pad byte
          pos += 8L + size + (size & 1L)
        }
        fmt.collect { case (ch, rate, bits, block) if ch > 0 && rate > 0 && block > 0 && dataBytes >= 0 =>
          WavMeta(ch, rate, bits, dataBytes / block)
        }
      }
    }

    private def hasTag(b: Array[Byte], at: Int, tag: String): Boolean =
      at + 4 <= b.length && tag.indices.forall(i => b(at + i) == tag.charAt(i).toByte)

    /** Full PCM geometry of an UNCOMPRESSED 8/16-bit WAV: (channels,
      * sampleRate, bitsPerSample, data offset, data bytes). Same chunk
      * walk as [[decodeWav]] but also requires audioFormat = 1 (PCM) and
      * captures where the sample array starts, so a caller can read the
      * actual samples. None for compressed/float/24-bit payloads — the
      * caller falls back to the stub codec. Bounds-checked: dataBytes is
      * clamped to what the payload actually holds. */
    def decodeWavPcm(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
      if (b.length < 12 || !hasTag(b, 0, "RIFF") || !hasTag(b, 8, "WAVE")) None
      else {
        val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        var pos = 12L
        var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
        var dataOff = -1
        var dataBytes = -1
        while (pos + 8 <= b.length && (fmt.isEmpty || dataOff < 0)) {
          val p = pos.toInt
          val size = bb.getInt(p + 4).toLong & 0xffffffffL
          if (hasTag(b, p, "fmt ") && p + 24 <= b.length) {
            fmt = Some((bb.getShort(p + 8).toInt, bb.getShort(p + 10).toInt,
              bb.getInt(p + 12), bb.getShort(p + 22).toInt))
          } else if (hasTag(b, p, "data")) {
            dataOff = p + 8
            dataBytes = math.min(size, (b.length - p - 8).toLong).toInt
          }
          pos += 8L + size + (size & 1L)
        }
        fmt.collect {
          case (1, ch, rate, bits) if ch > 0 && rate > 0 &&
              (bits == 8 || bits == 16) && dataOff >= 0 =>
            (ch, rate, bits, dataOff, dataBytes)
        }
      }
    }

    /** Full pixel-array geometry of an UNCOMPRESSED 24-bit BMP: (width,
      * height, pixel-array offset, row stride, topDown). Rows are 4-byte
      * aligned; positive height means bottom-up row order. None for any
      * other bit depth / compression — the caller falls back to the stub
      * codec. Bounds-checked so a truncated payload can never read past
      * the array mid-scan. */
    def decodeBmp24(b: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] = {
      if (b.length < 34 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) None
      else {
        val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
        val off = bb.getInt(10)
        val w = bb.getInt(18)
        val hRaw = bb.getInt(22)
        val h = math.abs(hRaw)
        val bpp = bb.getShort(28).toInt
        val compression = bb.getInt(30)
        val stride = ((3L * w + 3L) / 4L) * 4L
        if (w > 0 && h > 0 && bpp == 24 && compression == 0 && off >= 54 &&
            stride <= Int.MaxValue && off.toLong + stride * h <= b.length)
          Some((w, h, off, stride.toInt, hRaw < 0))
        else None
      }
    }
  }

  /** Geometry a [[PayloadCodec]] reports for a payload it recognizes:
    * image dims, frame/sample count, and whether the numbers came from a
    * real parse (vs a deterministic stub). */
  final case class Decoded(width: Int, height: Int, nFrames: Int,
                           realDecode: Boolean)

  /** THE pluggable decode seam (see CODEC_HANDOFF.md next to this file):
    * a new format lands by implementing this ONE trait and prepending it
    * to the chain — nothing else in the pipeline changes. Contract:
    * `decode` returns None for bytes that are not this codec's format
    * and NEVER throws (it runs inside executor scans over untrusted
    * payloads); given equal bytes it must return equal values on every
    * JVM (results feed hash-checked dedup keys). */
  trait PayloadCodec {
    /** Diagnostic name ("bmp", "jpeg", …). */
    def name: String
    def decode(kind: String, content: Array[Byte]): Option[Decoded]
  }

  /** Real header parses for the self-describing formats this container
    * can decode without native libraries. */
  object BmpCodec extends PayloadCodec {
    val name = "bmp"
    def decode(kind: String, content: Array[Byte]): Option[Decoded] =
      HeaderCodec.decodeBmp(content).map { case (w, h) => Decoded(w, h, 1, realDecode = true) }
  }

  object WavCodec extends PayloadCodec {
    val name = "wav"
    def decode(kind: String, content: Array[Byte]): Option[Decoded] =
      HeaderCodec.decodeWav(content).map(m =>
        Decoded(0, 0, m.nSamples.min(Int.MaxValue).toInt, realDecode = true))
  }

  /** Decode dispatch: first codec in the chain that recognizes the bytes
    * wins; the deterministic stub closes the chain so decode is total.
    * Returns (width, height, n_frames, checksum-of-first-64B). */
  object Codec {
    /** The default chain — a real JPEG/MP3/H.264 codec PREPENDS here. */
    val chain: Seq[PayloadCodec] = Seq(BmpCodec, WavCodec)

    def decode(kind: String, content: Array[Byte]): (Int, Int, Int, Long) =
      decodeWith(chain, kind, content)

    /** Same dispatch over a caller-supplied chain — the hand-off entry
      * point a new codec is integration-tested through. */
    def decodeWith(codecs: Seq[PayloadCodec], kind: String,
                   content: Array[Byte]): (Int, Int, Int, Long) = {
      val checksum = content.iterator.take(64).foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
      codecs.iterator.flatMap(_.decode(kind, content)).nextOption() match {
        case Some(d) => (d.width, d.height, d.nFrames, checksum)
        case None    => FakeCodec.decode(kind, content)
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

  val patchSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("py", IntegerType, nullable = false),
    StructField("px", IntegerType, nullable = false),
    StructField("patch_w", IntegerType, nullable = false),
    StructField("patch_h", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false),
    StructField("real_decode", BooleanType, nullable = false)))

  /** ViT-style PATCH statistics: tile every image into `patch`×`patch`
    * tiles (edge tiles short) and emit exact per-tile channel sums — the
    * patch-embedding preprocessing step of a vision-training pipeline,
    * reduced to the part a JVM can do for real. For uncompressed 24-bit
    * BMPs the pixel array is decoded FOR REAL ([[HeaderCodec.decodeBmp24]]
    * — stride-aligned, bottom-up or top-down, so a top-down and a
    * bottom-up encoding of the same image produce IDENTICAL patch rows);
    * other image payloads (JPEG etc. — no codec libs in this container)
    * get a deterministic checksum-derived stub grid over the stub dims,
    * flagged `real_decode = false`. Non-image media emit nothing.
    *
    * Pure 1→n per-row fan-out in the scan stage (the sampleFrames shape):
    * no shuffle, and the emitted rows carry exact integers only, so any
    * downstream aggregation (mean patch color, inter-patch contrast) is
    * hash-stable. */
  def extractPatchStats(media: DataFrame, patch: Int): DataFrame = {
    require(patch >= 1, s"patch must be >= 1, got $patch")
    media.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          if (kind != "image") Iterator.empty
          else HeaderCodec.decodeBmp24(bytes) match {
            case Some((w, h, off, stride, topDown)) =>
              for {
                py <- (0 until (h + patch - 1) / patch).iterator
                px <- (0 until (w + patch - 1) / patch).iterator
              } yield {
                val y0 = py * patch; val y1 = math.min(y0 + patch, h)
                val x0 = px * patch; val x1 = math.min(x0 + patch, w)
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = y0
                while (y < y1) {
                  val fileRow = if (topDown) y else h - 1 - y
                  val base = off + fileRow * stride
                  var x = x0
                  while (x < x1) {
                    val i = base + 3 * x
                    sb += bytes(i) & 0xff
                    sg += bytes(i + 1) & 0xff
                    sr += bytes(i + 2) & 0xff
                    x += 1
                  }
                  y += 1
                }
                Row(id, py, px, x1 - x0, y1 - y0,
                  (x1 - x0).toLong * (y1 - y0), sr, sg, sb, true)
              }
            case None =>
              val (w, h, _, checksum) = FakeCodec.decode("image", bytes)
              for {
                py <- (0 until (h + patch - 1) / patch).iterator
                px <- (0 until (w + patch - 1) / patch).iterator
              } yield {
                val pw = math.min(patch, w - px * patch)
                val ph = math.min(patch, h - py * patch)
                val n = pw.toLong * ph
                val seed = checksum * 31 + py * 1000003L + px
                val v = java.lang.Math.floorMod(seed, 256L)
                Row(id, py, px, pw, ph, n,
                  v * n, ((v + 1) % 256) * n, ((v + 2) % 256) * n, false)
              }
          }
        }
      }(Encoders.row(patchSchema))
  }

  val audioFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("channel", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("real_decode", BooleanType, nullable = false)))

  /** Audio FRAME statistics — the audio twin of [[extractPatchStats]]:
    * chop each track into fixed `frameSamples`-sample frames (tail frame
    * short) and emit exact per-(frame, channel) integer amplitude stats —
    * Σ|a|, Σa², peak — the inputs to silence detection, clipping checks,
    * and energy-based VAD in an audio-training pipeline, reduced to what
    * a JVM does for real. Uncompressed 8/16-bit PCM WAV decodes FOR REAL
    * ([[HeaderCodec.decodeWavPcm]] — proper chunk walk, interleaved
    * channels de-interleaved, 8-bit unsigned re-centered at 128 per the
    * WAV spec so silence is amplitude 0 at both depths); other audio
    * payloads (MP3 etc. — no codec libs in this container) get a
    * deterministic checksum-derived stub series flagged
    * `real_decode = false`. Non-audio media emit nothing.
    *
    * Scale shape: pure 1→n fan-out in the scan stage (the patch-stats
    * shape) — payload bytes never shuffle, emitted rows are exact
    * integers (Σa² of 16-bit samples stays < 2⁶³ up to ~8·10⁹ samples
    * per frame), so downstream energy aggregation is hash-stable. */
  def extractAudioFrameStats(media: DataFrame, frameSamples: Int): DataFrame = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    media.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          if (kind != "audio") Iterator.empty
          else HeaderCodec.decodeWavPcm(bytes) match {
            case Some((ch, _, bits, off, dataBytes)) =>
              val bytesPerSample = bits / 8
              val block = bytesPerSample * ch
              val nPerChannel = if (block == 0) 0 else dataBytes / block
              def sample(i: Int, c: Int): Long = {
                val p = off + i * block + c * bytesPerSample
                if (bits == 16)
                  ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort.toLong
                else (bytes(p) & 0xff).toLong - 128L // 8-bit WAV is unsigned
              }
              val nFrames = (nPerChannel + frameSamples - 1) / frameSamples
              for {
                f <- (0 until nFrames).iterator
                c <- (0 until ch).iterator
              } yield {
                val s0 = f * frameSamples
                val s1 = math.min(s0 + frameSamples, nPerChannel)
                var sAbs = 0L; var sSq = 0L; var peak = 0L
                var i = s0
                while (i < s1) {
                  val a = sample(i, c)
                  val m = math.abs(a)
                  sAbs += m; sSq += a * a; if (m > peak) peak = m
                  i += 1
                }
                Row(id, f, c, (s1 - s0).toLong, sAbs, sSq, peak, true)
              }
            case None =>
              // deterministic stub series over the stub codec's "samples"
              val (_, _, nSamples, checksum) = FakeCodec.decode("audio", bytes)
              val nFrames = math.max((nSamples + frameSamples - 1) / frameSamples, 0)
              (0 until nFrames).iterator.map { f =>
                val n = math.min(frameSamples, nSamples - f * frameSamples).toLong
                val v = java.lang.Math.floorMod(checksum * 31 + f, 32768L)
                Row(id, f, 0, n, v * n, v * v * n, v, false)
              }
          }
        }
      }(Encoders.row(audioFrameSchema))
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
          val (w, h, frames, checksum) = Codec.decode(kind, bytes)
          Row(id, kind, bytes.length.toLong, w, h, frames, checksum)
        }
      }(Encoders.row(featureSchema))
    out
  }

  /** Arrow-batched variant of [[extractFeatures]]: rows are packed
    * `batchSize` at a time into an off-heap Arrow `VarBinaryVector` before
    * decode — the `mapInArrow` shape. This is the hand-off a VECTORIZED
    * codec binding wants (nvJPEG / FFmpeg / any JNI decoder consumes one
    * contiguous buffer + offsets array per batch, not a JVM object per
    * item); [[Codec.decode]] here reads each payload back from the Arrow
    * buffer, so swapping in a native batch decoder changes only the inner
    * call. Output is row-for-row identical to [[extractFeatures]]
    * (MediaSpec asserts parity).
    *
    * Cost note (sf0.1 documents-as-media, local[32], min of 3): row path
    * 0.27s, Arrow-batched 0.20s — the pack/unpack costs nothing even with
    * a header-peeking "codec" (batch emission amortizes per-row iterator
    * overhead), and the real payoff is the seam: a native batch decoder
    * consumes the off-heap buffer directly.
    *
    * Allocator lifecycle: one `RootAllocator` + vector per batch, closed
    * before the batch's rows are emitted — nothing escapes, so executor
    * death or early iterator abandonment can leak at most one batch. */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int = 256): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    media.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val allocator = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
          val vec = new org.apache.arrow.vector.VarBinaryVector("content", allocator)
          try {
            vec.allocateNew(batch.size)
            batch.iterator.zipWithIndex.foreach { case (r, i) =>
              vec.setSafe(i, r.getAs[Array[Byte]](2))
            }
            vec.setValueCount(batch.size)
            batch.iterator.zipWithIndex.map { case (r, i) =>
              val bytes = vec.get(i) // read from the off-heap Arrow buffer
              val (w, h, frames, checksum) = Codec.decode(r.getString(1), bytes)
              Row(r.getLong(0), r.getString(1), bytes.length.toLong, w, h, frames, checksum)
            }.toVector
          } finally {
            vec.close()
            allocator.close()
          }
        }
      }(Encoders.row(featureSchema))
  }

  /** Deterministic 24-bit BMP synthesis — a REAL encoder producing
    * standard bottom-up, stride-padded BITMAPINFOHEADER files whose
    * pixels derive from an md5 stream over `(seed, fileRow)`: the image
    * SOURCE for end-to-end pipeline queries and benchmarks in a
    * container that ships no image corpus (the bytes are real BMPs —
    * [[HeaderCodec.decodeBmp24]] round-trips them, spec-asserted; equal
    * seeds give byte-identical files). Pure per-row synthesis in the
    * scan stage — no shuffle.
    *
    * Input: `(idCol, seedCol)`; output: the [[mediaSchema]] rows
    * `(media_id, kind = "image", content)`. */
  def synthesizeBmp(df: DataFrame, idCol: String, seedCol: String,
                    width: Int, height: Int): DataFrame = {
    require(width >= 1 && height >= 1 && width.toLong * height <= (1L << 22),
      s"unreasonable dimensions ${width}x$height")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    df.select(col(idCol).cast("long"), col(seedCol).cast("string"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val seed = r.getString(1)
          val stride = (3 * width + 3) & ~3
          val bytes = new Array[Byte](54 + stride * height)
          def i32(off: Int, v: Int): Unit = {
            bytes(off) = v.toByte; bytes(off + 1) = (v >> 8).toByte
            bytes(off + 2) = (v >> 16).toByte; bytes(off + 3) = (v >> 24).toByte
          }
          bytes(0) = 'B'; bytes(1) = 'M'
          i32(2, bytes.length); i32(10, 54)       // file size, pixel offset
          i32(14, 40); i32(18, width); i32(22, height) // bottom-up
          bytes(26) = 1; bytes(28) = 24           // 1 plane, 24 bpp
          i32(34, stride * height)
          var row = 0
          while (row < height) {
            // md5-stream pixels: 16 bytes per digest, re-keyed per file row
            var x = 0
            var block = md.digest(s"$seed:$row:0".getBytes("UTF-8"))
            var bi = 0
            val base = 54 + row * stride
            while (x < 3 * width) {
              if (bi == 16) {
                block = md.digest(s"$seed:$row:${x / 16}".getBytes("UTF-8"))
                bi = 0
              }
              bytes(base + x) = block(bi)
              x += 1; bi += 1
            }
            row += 1
          }
          Row(id, "image", bytes)
        }
      }(Encoders.row(outSchema))
  }

  /** Content fingerprint per image from EXACT patch statistics — the
    * multimodal analogue of [[graft.functions.Text.fingerprint]]: tile
    * via [[extractPatchStats]], then hash the (py, px, n_px, Σr, Σg, Σb)
    * tiles in deterministic tile order. Two images fingerprint equal iff
    * every patch's exact channel sums agree — byte-identical re-encodes
    * (including top-down vs bottom-up flips of the same pixels, which
    * the decoder normalizes) collide; any pixel change in any tile
    * separates. Feeds [[graft.operators.Dedup.exact]]-style grouping
    * directly.
    *
    * Scale shape: patch stats are a narrow scan-stage fan-out; the hash
    * is one partial-aggregable groupBy on media_id carrying ~(w·h/p²)
    * integer rows — payload bytes never shuffle. `real_decode` rides
    * along (AND over tiles) so stub-decoded formats are distinguishable
    * from real ones downstream. */
  def imageFingerprints(media: DataFrame, patch: Int): DataFrame =
    extractPatchStats(media, patch)
      .groupBy(col("media_id"))
      .agg(
        md5(to_json(sort_array(collect_list(struct(
          col("py"), col("px"), col("n_px"),
          col("sum_r"), col("sum_g"), col("sum_b")))))).as("fp"),
        min(col("real_decode")).as("real_decode"))

  /** PERCEPTUAL average-hash (aHash) over the REAL decoded pixel grid —
    * the downsample-and-threshold fingerprint (patch-grid means vs the
    * global mean) that survives re-encoding where [[imageFingerprints]]'
    * exact hash does not. Every bit is an EXACT integer comparison:
    * `bit(cell) = s_cell·n_total > s_total·n_cell` (cross-multiplied
    * rational mean comparison over the BIGINT patch sums — no float
    * luminance anywhere), bits concatenated in (py, px) order. Identical
    * bytes ⇒ identical hash, so planted-dup groups are exactly
    * checkable the q135 way; near-dup Hamming blocking over these bits
    * is the [[graft.operators.Dedup.simHashPairs]] pigeonhole shape.
    * Scale: rides [[extractPatchStats]]' scan-stage fan-out + one
    * partial-aggregable per-media collapse; payload bytes never
    * shuffle. Output `(media_id, ahash, real_decode)`. */
  def imageAHash(media: DataFrame, patch: Int): DataFrame = {
    val stats = extractPatchStats(media, patch)
      .withColumn("_s", col("sum_r") + col("sum_g") + col("sum_b"))
    val totals = stats.groupBy(col("media_id"))
      .agg(sum(col("_s")).as("_st"), sum(col("n_px")).as("_nt"))
    stats
      .join(totals, Seq("media_id"))
      .withColumn("_bit",
        when(col("_s") * col("_nt") > col("_st") * col("n_px"), lit("1"))
          .otherwise(lit("0")))
      .groupBy(col("media_id"))
      .agg(
        concat_ws("", transform(
          sort_array(collect_list(struct(col("py"), col("px"), col("_bit")))),
          c => c.getField("_bit"))).as("ahash"),
        min(col("real_decode")).as("real_decode"))
  }

  /** Deterministic 16-bit mono PCM WAV synthesis — [[synthesizeBmp]]'s
    * audio sibling: a REAL encoder producing canonical RIFF/WAVE files
    * ([[HeaderCodec.decodeWavPcm]] round-trips them, spec-asserted)
    * whose samples derive from an md5 stream over `(seed, block)` —
    * equal seeds give byte-identical files, so planted duplicates are
    * exact. Pure per-row synthesis in the scan stage — no shuffle.
    * Input `(idCol, seedCol)`; output `(media_id, kind = "audio",
    * content)`. */
  def synthesizeWav(df: DataFrame, idCol: String, seedCol: String,
                    sampleRate: Int, nSamples: Int): DataFrame = {
    require(sampleRate >= 1, s"sampleRate must be positive, got $sampleRate")
    require(nSamples >= 1 && nSamples <= (1 << 22),
      s"unreasonable sample count $nSamples")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    df.select(col(idCol).cast("long"), col(seedCol).cast("string"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val seed = r.getString(1)
          val dataBytes = 2 * nSamples
          val bytes = new Array[Byte](44 + dataBytes)
          def i32(off: Int, v: Int): Unit = {
            bytes(off) = v.toByte; bytes(off + 1) = (v >> 8).toByte
            bytes(off + 2) = (v >> 16).toByte; bytes(off + 3) = (v >> 24).toByte
          }
          def i16(off: Int, v: Int): Unit = {
            bytes(off) = v.toByte; bytes(off + 1) = (v >> 8).toByte
          }
          def tag(off: Int, s: String): Unit =
            s.indices.foreach(i => bytes(off + i) = s.charAt(i).toByte)
          tag(0, "RIFF"); i32(4, 36 + dataBytes); tag(8, "WAVE")
          tag(12, "fmt "); i32(16, 16)
          i16(20, 1); i16(22, 1)                   // PCM, mono
          i32(24, sampleRate); i32(28, sampleRate * 2)
          i16(32, 2); i16(34, 16)                  // blockAlign, bits
          tag(36, "data"); i32(40, dataBytes)
          // md5-stream samples: 16 bytes per digest, re-keyed per block
          var x = 0
          var block = md.digest(s"$seed:0".getBytes("UTF-8"))
          var bi = 0
          while (x < dataBytes) {
            if (bi == 16) {
              block = md.digest(s"$seed:${x / 16}".getBytes("UTF-8"))
              bi = 0
            }
            bytes(44 + x) = block(bi)
            x += 1; bi += 1
          }
          Row(id, "audio", bytes)
        }
      }(Encoders.row(outSchema))
  }

  /** Content fingerprint per audio payload from EXACT frame energies —
    * [[imageFingerprints]]'s audio analogue: decode the PCM samples for
    * real ([[HeaderCodec.decodeWavPcm]], 8/16-bit), sum |sample| per
    * `frameSize`-sample frame in exact BIGINTs, fingerprint = md5 over
    * the ordered energy sequence. Two payloads fingerprint equal iff
    * every frame's exact energy agrees; non-PCM/malformed payloads fall
    * back to an md5 of the raw bytes with `real_decode = false` — still
    * a correct exact-dup key, just not content-normalized. Entirely
    * per-row in the scan stage: payload bytes NEVER shuffle; a
    * downstream dedup groupBy moves only `(media_id, fp, n_frames)`.
    * Output: `(media_id, fp, n_frames, real_decode)`. */
  def audioFingerprints(media: DataFrame, frameSize: Int): DataFrame = {
    require(frameSize >= 1, s"frameSize must be positive, got $frameSize")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("fp", StringType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("real_decode", BooleanType, nullable = false)))
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(d: Array[Byte]): String = d.map("%02x".format(_)).mkString
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          HeaderCodec.decodeWavPcm(bytes) match {
            case Some((ch, _, bits, off, dataBytes)) =>
              val bytesPerSample = bits / 8
              val n = dataBytes / bytesPerSample
              val energies = new StringBuilder
              var f = 0
              var i = 0
              while (i < n) {
                var e = 0L
                val end = math.min(i + frameSize, n)
                while (i < end) {
                  val s =
                    if (bits == 16)
                      ((bytes(off + 2 * i) & 0xff) | (bytes(off + 2 * i + 1) << 8)).toShort.toInt
                    else (bytes(off + i) & 0xff) - 128
                  e += math.abs(s).toLong
                  i += 1
                }
                if (f > 0) energies.append(',')
                energies.append(e)
                f += 1
              }
              val _ = ch // mono/stereo interleave both walk raw samples
              md.reset()
              Row(id, hex(md.digest(energies.toString.getBytes("UTF-8"))), f, true)
            case None =>
              md.reset()
              Row(id, hex(md.digest(bytes)), 0, false)
          }
        }
      }(Encoders.row(outSchema))
  }
}
