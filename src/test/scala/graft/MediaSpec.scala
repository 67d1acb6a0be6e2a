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
}
