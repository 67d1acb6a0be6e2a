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
}
