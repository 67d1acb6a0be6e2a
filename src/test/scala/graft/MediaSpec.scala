package graft

import graft.multimodal.Media

import org.apache.spark.sql.functions._

class MediaSpec extends SparkSuite {

  test("multimodal plumbing: binary payload survives transport; features deterministic") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Media.fromDocuments(docs)
    assert(media.schema("content").dataType.typeName == "binary")

    val feats = Media.extractFeatures(media)
    // texts are ASCII → payload byte length equals n_chars
    val joined = feats.join(docs, feats("media_id") === docs("doc_id"))
      .where(col("n_bytes") =!= col("n_chars"))
    assert(joined.count() == 0)

    // deterministic across runs (fresh plan, same features)
    val a = feats.orderBy("media_id").collect().toSeq
    val b = Media.extractFeatures(Media.fromDocuments(docs)).orderBy("media_id").collect().toSeq
    assert(a == b)

    // kinds partition as declared
    val kinds = feats.groupBy("kind").count().collect().map(_.getString(0)).sorted
    assert(kinds.toSeq == Seq("audio", "image", "video"))
  }

  test("Arrow-batched decode is row-for-row identical to the row path, at any batch boundary") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Media.fromDocuments(docs)
    val rowPath = Media.extractFeatures(media).orderBy("media_id").collect().toSeq
    // default batch size and a tiny one that forces many partial batches
    for (bs <- Seq(256, 3)) {
      val batched = Media.extractFeaturesBatched(media, batchSize = bs)
        .orderBy("media_id").collect().toSeq
      assert(batched == rowPath, s"batched path diverged at batchSize=$bs")
    }
  }

  test("real header codecs: hand-built BMP and WAV fixtures decode from actual bytes") {
    import java.nio.{ByteBuffer, ByteOrder}
    // minimal BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 37x23 px
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.array()
    }
    // WAV with a LIST chunk BEFORE data (the layout a naive 44-byte parse
    // breaks on): 2ch 16-bit 8000 Hz, 16000 bytes of data → 4000 samples,
    // 0.5 s
    def wav(): Array[Byte] = {
      val dataLen = 16000
      val b = ByteBuffer.allocate(12 + 24 + 12 + 8 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(4 + 24 + 12 + 8 + dataLen).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
        .putInt(8000).putInt(8000 * 4).putShort(4).putShort(16)
      b.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
      b.put("data".getBytes).putInt(dataLen)
      b.array()
    }
    // unit level
    assert(Media.HeaderCodec.decodeBmp(bmp(37, 23)).contains((37, 23)))
    // negative height = top-down BMP; magnitude is the real height
    assert(Media.HeaderCodec.decodeBmp(bmp(37, -23)).contains((37, 23)))
    val meta = Media.HeaderCodec.decodeWav(wav()).get
    assert(meta == Media.WavMeta(2, 8000, 16, 4000L))
    assert(meta.durationSeconds == 0.5)
    assert(Media.HeaderCodec.decodeBmp("not a bitmap".getBytes).isEmpty)
    assert(Media.HeaderCodec.decodeWav("not audio".getBytes).isEmpty)
    // hostile chunk sizes near 2^32 must neither loop forever (Int-truncated
    // advance of 0) nor read out of bounds (negative advance) — the walk
    // runs in Long arithmetic and just terminates
    def hostileWav(sizeField: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(24).put("WAVE".getBytes)
      b.put("JUNK".getBytes).putInt(sizeField).putLong(0L)
      b.array()
    }
    assert(Media.HeaderCodec.decodeWav(hostileWav(0xFFFFFFF8)).isEmpty) // advance would truncate to 0
    assert(Media.HeaderCodec.decodeWav(hostileWav(0x80000000)).isEmpty) // advance would go negative

    // through the full Spark pipeline (binary transport + batch decode)
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "image", bmp(37, 23), null),
      org.apache.spark.sql.Row(2L, "audio", wav(), null),
      org.apache.spark.sql.Row(3L, "video", "opaque payload".getBytes("UTF-8"), null))
    val media = spark.createDataFrame(rows, Media.mediaSchema)
    val feats = Media.extractFeatures(media).orderBy("media_id").collect()
    assert(feats(0).getInt(3) == 37 && feats(0).getInt(4) == 23) // BMP w/h
    assert(feats(1).getInt(5) == 4000)                           // WAV samples
    // unknown format falls back to the deterministic stub, never throws
    assert(feats(2).getLong(2) == "opaque payload".length.toLong)
  }

  test("frame sampling fans out and slices real payload bytes; resize keeps aspect") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Media.fromDocuments(docs)
    val frames = Media.sampleFrames(media, everyNth = 2, frameBytes = 100)
    // every media row yields at least one frame; frame bytes are real slices
    assert(frames.count() >= media.count())
    val one = frames.where(col("media_id") === 0 && col("frame_idx") === 0).head()
    val original = docs.where(col("doc_id") === 0).head().getAs[String]("text")
    assert(new String(one.getAs[Array[Byte]](2), "UTF-8") == original.take(100))

    val resized = Media.resizeMeta(Media.extractFeatures(media), maxSide = 64)
    val bad = resized.where(col("out_width") > 64 || col("out_height") > 64 ||
      (col("width") <= 64 && col("height") <= 64 && col("out_width") =!= col("width")))
    assert(bad.count() == 0)
  }

  test("patch stats: real 24-bit BMP pixel sums, row-order invariance, edge tiles, stub fallback") {
    import java.nio.{ByteBuffer, ByteOrder}
    // full BMP with pixel data: pixel (x, yFromTop) = (r=x, g=y, b=x+y)
    def bmpPix(w: Int, h: Int, topDown: Boolean): Array[Byte] = {
      val stride = ((3 * w + 3) / 4) * 4
      val b = ByteBuffer.allocate(54 + stride * h).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(if (topDown) -h else h).putShort(1).putShort(24)
      b.putInt(0) // BI_RGB
      for (fileRow <- 0 until h; x <- 0 until w) {
        val y = if (topDown) fileRow else h - 1 - fileRow
        b.position(54 + fileRow * stride + 3 * x)
        b.put((x + y).toByte).put(y.toByte).put(x.toByte) // B, G, R
      }
      b.array()
    }
    def rowsOf(bytes: Array[Byte]): Seq[(Int, Int, Int, Int, Long, Long, Long, Long, Boolean)] = {
      val media = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "image", bytes, null)),
        Media.mediaSchema)
      Media.extractPatchStats(media, patch = 2).collect().map(r =>
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getBoolean(9))).toSeq
        .sortBy(t => (t._1, t._2))
    }
    val up = rowsOf(bmpPix(5, 3, topDown = false))
    // 5x3 at patch 2 -> 2 tile rows x 3 tile cols; right tiles 1px wide,
    // bottom tiles 1px tall
    assert(up.length == 6)
    // tile (0,0): pixels (0,0),(1,0),(0,1),(1,1): sum_r=0+1+0+1=2,
    // sum_g=0+0+1+1=2, sum_b=0+1+1+2=4
    assert(up.head == ((0, 0, 2, 2, 4L, 2L, 2L, 4L, true)))
    // tile (1,2): pixel (4,2) only: r=4, g=2, b=6
    assert(up.last == ((1, 2, 1, 1, 1L, 4L, 2L, 6L, true)))
    // a top-down encoding of the SAME image yields identical patch rows
    assert(rowsOf(bmpPix(5, 3, topDown = true)) == up)
    // exact n_px conservation: tiles partition the image
    assert(up.map(_._5).sum == 15L)
    // non-BMP image payload: deterministic stub grid, flagged
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(2L, "image", "jpegish bytes".getBytes, null),
        org.apache.spark.sql.Row(3L, "audio", "riffless".getBytes, null)),
      Media.mediaSchema)
    val stub = Media.extractPatchStats(media, patch = 64).collect()
    assert(stub.nonEmpty && stub.forall(r => r.getLong(0) == 2L && !r.getBoolean(9)))
    val (w, h, _, _) = Media.FakeCodec.decode("image", "jpegish bytes".getBytes)
    assert(stub.length == ((w + 63) / 64) * ((h + 63) / 64))
  }

  test("audio frame stats: real PCM sums per (frame, channel), 8-bit recentering, stub fallback") {
    import java.nio.{ByteBuffer, ByteOrder}
    // 2ch 16-bit PCM, 5 samples/channel, LIST chunk before data (the
    // layout a naive 44-byte parse breaks on)
    val ch0 = Array[Short](100, -200, 300, -32768, 0)
    val ch1 = Array[Short](1, 2, 3, 4, 5)
    def wav16(): Array[Byte] = {
      val dataLen = ch0.length * 4
      val b = ByteBuffer.allocate(12 + 24 + 12 + 8 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(4 + 24 + 12 + 8 + dataLen).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
        .putInt(8000).putInt(8000 * 4).putShort(4).putShort(16)
      b.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
      b.put("data".getBytes).putInt(dataLen)
      ch0.indices.foreach { i => b.putShort(ch0(i)); b.putShort(ch1(i)) }
      b.array()
    }
    // mono 8-bit PCM (unsigned, center 128): amplitudes 0, +2, -2, -128
    def wav8(): Array[Byte] = {
      val data = Array[Int](128, 130, 126, 0)
      val b = ByteBuffer.allocate(12 + 24 + 8 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(4 + 24 + 8 + data.length).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
      b.put("data".getBytes).putInt(data.length)
      data.foreach(v => b.put(v.toByte))
      b.array()
    }
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "audio", wav16(), null),
      org.apache.spark.sql.Row(2L, "audio", wav8(), null),
      org.apache.spark.sql.Row(3L, "audio", "not a wav at all!!".getBytes("UTF-8"), null),
      org.apache.spark.sql.Row(4L, "image", wav16(), null)) // non-audio: ignored
    val media = spark.createDataFrame(rows, Media.mediaSchema)
    val out = Media.extractAudioFrameStats(media, frameSamples = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    // 16-bit: frames (2,2,1 samples) x 2 channels, exact integer stats
    assert(out((1L, 0, 0)) == ((2L, 300L, 50000L, 200L, true)))          // |100|+|-200|; 100^2+200^2
    assert(out((1L, 1, 0)) == ((2L, 33068L, 90000L + 1073741824L, 32768L, true)))
    assert(out((1L, 2, 0)) == ((1L, 0L, 0L, 0L, true)))
    assert(out((1L, 0, 1)) == ((2L, 3L, 5L, 2L, true)))
    assert(out((1L, 1, 1)) == ((2L, 7L, 25L, 4L, true)))
    assert(out((1L, 2, 1)) == ((1L, 5L, 25L, 5L, true)))
    // 8-bit mono recentered at 128: frames (2,2)
    assert(out((2L, 0, 0)) == ((2L, 2L, 4L, 2L, true)))
    assert(out((2L, 1, 0)) == ((2L, 130L, 4L + 16384L, 128L, true)))
    // undecodable audio: deterministic stub series, flagged fake
    val stubRows = out.keys.filter(_._1 == 3L)
    assert(stubRows.nonEmpty && stubRows.forall(k => !out(k)._5))
    // stub frame count follows the stub codec's n/4 "samples"
    assert(stubRows.size == ("not a wav at all!!".length / 4 + 1) / 2)
    // non-audio media emit nothing
    assert(!out.keys.exists(_._1 == 4L))
  }

  test("synthesizeBmp + imageFingerprints: real round-trip, planted dups, layout invariance") {
    import spark.implicits._
    // every id-triple shares a seed -> planted byte-identical duplicates
    val ids = (0L until 12L).toDF("media_id")
      .withColumn("seed", concat(lit("img:"),
        (col("media_id") - pmod(col("media_id"), lit(3))).cast("string")))
    val media = Media.synthesizeBmp(ids, "media_id", "seed", width = 24, height = 16)
    // the encoder emits REAL BMPs: the real decoder parses them (no stub)
    val feats = Media.extractFeatures(media).collect()
    assert(feats.length == 12)
    assert(feats.forall(r => r.getInt(3) == 24 && r.getInt(4) == 16))
    val stats = Media.extractPatchStats(media, 8)
    assert(stats.collect().forall(_.getBoolean(9)), "decode must be real, not stub")
    // fingerprints: equal within a triple, distinct across triples
    val fps = Media.imageFingerprints(media, 8).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    (0L until 12L).foreach { i =>
      assert(fps(i) == fps(i - i % 3), s"$i must match its triple leader")
    }
    assert(fps.values.toSet.size == 4, "four distinct triples -> four fingerprints")
    // fingerprint is layout-invariant (groupBy order, partitioning)
    val re = Media.imageFingerprints(media.repartition(5), 8).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(re == fps)
    // a single changed pixel separates: different seed, same dims
    val other = Media.synthesizeBmp(
      Seq((99L, "img:other")).toDF("media_id", "seed"), "media_id", "seed", 24, 16)
    val ofp = Media.imageFingerprints(other, 8).collect().head.getString(1)
    assert(!fps.values.toSet.contains(ofp))
  }

  test("synthesizeWav + audioFingerprints: real PCM round-trip, planted dups, exact energies") {
    import spark.implicits._
    // every id-quad shares a seed -> planted byte-identical duplicates
    val ids = (0L until 12L).toDF("media_id")
      .withColumn("seed", concat(lit("aud:"),
        (col("media_id") - pmod(col("media_id"), lit(4))).cast("string")))
    val media = Media.synthesizeWav(ids, "media_id", "seed",
      sampleRate = 8000, nSamples = 800)
    // the encoder emits REAL PCM WAVs the real decoder round-trips
    val raw = media.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](2))).toMap
    raw.values.foreach { b =>
      assert(b.length == 44 + 1600)
      val Some((ch, rate, bits, off, dataBytes)) = Media.HeaderCodec.decodeWavPcm(b)
      assert(ch == 1 && rate == 8000 && bits == 16 && off == 44 && dataBytes == 1600)
    }
    // equal seeds are byte-identical; different seeds differ
    assert(raw(1L).sameElements(raw(0L)) && raw(5L).sameElements(raw(4L)))
    assert(!raw(4L).sameElements(raw(0L)))
    val fps = Media.audioFingerprints(media, frameSize = 160).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getBoolean(3)))).toMap
    // 800 samples / 160 per frame = 5 frames, all real decodes
    assert(fps.values.forall { case (_, n, real) => n == 5 && real })
    (0L until 12L).foreach(i => assert(fps(i)._1 == fps(i - i % 4)._1))
    assert(fps.values.map(_._1).toSet.size == 3, "three quads -> three fingerprints")
    // exact energy check on a hand-built WAV: samples 100, -200, 3, -4
    // with frameSize 2 -> energies "300,7"
    val hand = Media.synthesizeWav(Seq((7L, "x")).toDF("media_id", "seed"),
        "media_id", "seed", sampleRate = 8000, nSamples = 4)
      .collect().head.getAs[Array[Byte]](2)
    def i16(off: Int, v: Int): Unit = { hand(off) = v.toByte; hand(off + 1) = (v >> 8).toByte }
    i16(44, 100); i16(46, -200); i16(48, 3); i16(50, -4)
    val handDf = Seq((7L, hand)).toDF("media_id", "content")
    val handFp = Media.audioFingerprints(handDf, frameSize = 2).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest("300,7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(handFp.getString(1) == expected && handFp.getInt(2) == 2)
    // undecodable payload: byte-md5 fallback, flagged fake
    val junk = Seq((8L, "junk".getBytes("UTF-8"))).toDF("media_id", "content")
    val j = Media.audioFingerprints(junk, frameSize = 2).collect().head
    assert(!j.getBoolean(3) && j.getInt(2) == 0)
  }

  test("PayloadCodec chain: real formats through the trait, new codec pluggable, malformed total") {
    import spark.implicits._
    // the REAL codecs exercised through the hand-off trait itself
    val bmp = Media.synthesizeBmp(Seq((1L, "s")).toDF("media_id", "seed"),
      "media_id", "seed", width = 24, height = 16).collect().head.getAs[Array[Byte]](2)
    assert(Media.BmpCodec.decode("image", bmp)
      .contains(Media.Decoded(24, 16, 1, realDecode = true)))
    assert(Media.WavCodec.decode("audio", bmp).isEmpty, "wrong format -> None, not garbage")
    val wav = Media.synthesizeWav(Seq((2L, "s")).toDF("media_id", "seed"),
      "media_id", "seed", sampleRate = 8000, nSamples = 800).collect().head.getAs[Array[Byte]](2)
    assert(Media.WavCodec.decode("audio", wav)
      .contains(Media.Decoded(0, 0, 800, realDecode = true)))
    // a NEW format lands by prepending one trait instance — the hand-off
    object QoiLike extends Media.PayloadCodec {
      val name = "qoi"
      def decode(kind: String, b: Array[Byte]): Option[Media.Decoded] =
        if (b.length >= 4 && b(0) == 'q' && b(1) == 'o' && b(2) == 'i' && b(3) == 'f')
          Some(Media.Decoded(9, 9, 1, realDecode = true))
        else None
    }
    val chain = QoiLike +: Media.Codec.chain
    assert(Media.Codec.decodeWith(chain, "image", "qoifXXXX".getBytes("UTF-8"))._1 == 9)
    // existing formats still route to their codecs through the extended chain
    assert(Media.Codec.decodeWith(chain, "image", bmp) == Media.Codec.decode("image", bmp))
    // malformed bytes: total function, falls through to the deterministic stub
    val junkBytes = Array.fill[Byte](10)(0x7f)
    val viaChain = Media.Codec.decodeWith(chain, "image", junkBytes)
    val (sw, sh, sf, scs) = Media.FakeCodec.decode("image", junkBytes)
    assert(viaChain == ((sw, sh, sf, scs)))
  }

  test("imageAHash: bit-count matches the patch grid, seed-identical images hash equal") {
    import spark.implicits._
    val media = Media.synthesizeBmp(
      Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("media_id", "seed"),
      "media_id", "seed", width = 24, height = 16)
    val out = Media.imageAHash(media, patch = 4).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    // 24x16 at patch 4 -> 6x4 grid = 24 bits, really decoded
    assert(out.values.forall { case (h, real) => h.length == 24 && real })
    assert(out(1L)._1 == out(2L)._1)      // byte-identical -> hash-identical
    assert(out(1L)._1 != out(3L)._1)      // different noise -> different bits
    // bits are threshold bits: both symbols present on a noise image
    assert(out(1L)._1.contains("1") && out(1L)._1.contains("0"))
  }
}
