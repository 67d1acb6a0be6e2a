package graft

import graft.functions.Text
import graft.operators.Enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted document-enrichment lifecycle: the stored columns must be
  * BIT-IDENTICAL to the expressions consumers previously inlined (that is
  * what makes re-pointing a consumer hash-neutral), the frozen-model
  * append must equal the build-time scorer, and the shared memoized table
  * must serve every consumer without re-scoring. */
class EnrichSpec extends SparkSuite {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text) =>
      (id, s"src${id % 3}", if (id % 2 == 0) "en" else "de",
        text.length.toLong, text)
    }.toDF("doc_id", "source", "lang", "n_chars", "text")
  }

  private val corpus = docs(Seq(
    1L -> "the quick brown fox jumps over the lazy dog and that is that",
    2L -> "der hund ist nicht ein katze und das ist gut",
    3L -> "el perro es un animal que vive en la casa",
    4L -> ("the " * 60).trim,
    5L -> "!!! ??? ,,, ;;; ###",
    6L -> "",
    7L -> "le chat est un animal et la maison est grande",
    8L -> "one two three four five six seven eight nine ten"))

  test("scoreDocuments stores the bit-identical inlined expressions") {
    val stop = Text.langMarkers.toMap.apply("en")
    val got = Enrich.scoreDocuments(corpus).orderBy("doc_id").collect()
    val want = corpus.select(col("doc_id"),
        Text.langId(col("text")).as("langid"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
        Text.qualityScore(col("text"), stop).as("quality"),
        floor(Text.qualityScore(col("text"), stop) * lit(1e6))
          .cast("long").as("quality_micro"),
        // the q260 reliability items, exactly as that query inlined them
        floor(least(length(col("text")).cast("double") / lit(200.0), lit(1.0))
          * lit(1e6)).as("c_len"),
        floor((lit(1.0) - Text.punctRatio(col("text"))) * lit(1e6)).as("c_punct"),
        floor(least(Text.stopwordRatio(col("text"), stop) * lit(5.0), lit(1.0))
          * lit(1e6)).as("c_stop"))
      .orderBy("doc_id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[String]("langid") == w.getAs[String]("langid"), s"langid ${g}")
      assert(g.getAs[Long]("n_tokens") == w.getAs[Long]("n_tokens"))
      assert(g.getAs[Long]("n_bpeish") == w.getAs[Long]("n_bpeish"))
      // exact double equality IS the contract (same expression tree)
      assert(g.getAs[Double]("quality") == w.getAs[Double]("quality"))
      assert(g.getAs[Long]("quality_micro") == w.getAs[Long]("quality_micro"))
      assert(g.getAs[Long]("c_len") == w.getAs[Long]("c_len"))
      assert(g.getAs[Long]("c_punct") == w.getAs[Long]("c_punct"))
      assert(g.getAs[Long]("c_stop") == w.getAs[Long]("c_stop"))
    }
  }

  test("frozen-model append scores exactly like the build: scoreAgainstModel == scoreDocuments") {
    val model = Enrich.scorerModel(spark)
    val viaModel = Enrich.scoreAgainstModel(corpus, model)
      .orderBy("doc_id").collect().map(_.toString)
    val direct = Enrich.scoreDocuments(corpus)
      .orderBy("doc_id").collect().map(_.toString)
    assert(viaModel.toSeq == direct.toSeq)
  }

  test("build + frozen-model append covers the corpus exactly once with identical values") {
    val initial = corpus.where(col("doc_id") % 3 =!= 0)
    val batch = corpus.where(col("doc_id") % 3 === 0)
    val model = Enrich.scorerModel(spark)
    val union = Enrich.scoreDocuments(initial)
      .unionByName(Enrich.scoreAgainstModel(batch, model))
      .orderBy("doc_id").collect().map(_.toString)
    val full = Enrich.scoreDocuments(corpus)
      .orderBy("doc_id").collect().map(_.toString)
    assert(union.toSeq == full.toSeq)
  }

  test("refreshStale re-scores only stale rows and lands bitwise on a full current-version rebuild") {
    val stopV2 = Text.langMarkers.toMap.apply("en") ++ Seq("for", "it")
    val v1 = Enrich.scorerModel(spark)
    val v2 = Enrich.scorerModel(spark, stopwords = stopV2)
    // mixed table: ids % 3 != 0 still carry v1 scores, the rest v2
    val mixed = Enrich.scoreVersioned(corpus.where(col("doc_id") % 3 =!= 0), v1, 1)
      .unionByName(Enrich.scoreVersioned(corpus.where(col("doc_id") % 3 === 0), v2, 2))
    val refreshed = Enrich.refreshStale(mixed, corpus, v2, currentVersion = 2)
      .orderBy("doc_id").collect().map(_.toString)
    val rebuilt = Enrich.scoreVersioned(corpus, v2, 2)
      .orderBy("doc_id").collect().map(_.toString)
    assert(refreshed.toSeq == rebuilt.toSeq,
      "refresh must equal a from-scratch current-version rebuild")
    // an all-current table passes through bit-identically
    val allV2 = Enrich.scoreVersioned(corpus, v2, 2)
    val noop = Enrich.refreshStale(allV2, corpus, v2, currentVersion = 2)
      .orderBy("doc_id").collect().map(_.toString)
    assert(noop.toSeq == rebuilt.toSeq)
    // and the stale branch is genuinely selective: only stale doc_ids
    // reach the re-scorer (the semi-join keeps the v2 third out)
    val stale = mixed.where(col("scorer_version") =!= 2).select(col("doc_id"))
    val rescored = corpus.join(stale, Seq("doc_id"), "left_semi")
    assert(rescored.count() == corpus.where(col("doc_id") % 3 =!= 0).count())
  }

  test("enrichedDocuments memoizes: the same persisted path serves repeated consumers") {
    val a = Enrich.enrichedDocuments(spark, sf0001)
    val b = Enrich.enrichedDocuments(spark, sf0001)
    val pa = a.queryExecution.logical.toString
    val pb = b.queryExecution.logical.toString
    assert(pa == pb, "second consumer must read the same persisted table")
    // and the table is value-identical to scoring the raw documents
    val want = Enrich.scoreDocuments(
        graft.sources.Tables.documents(spark, sf0001))
      .orderBy("doc_id").collect().map(_.toString)
    val gotRows = a.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("n_tokens"), col("n_bpeish"), col("langid"),
        col("quality"), col("c_len"), col("c_punct"), col("c_stop"),
        col("quality_micro"))
      .orderBy("doc_id").collect().map(_.toString)
    assert(gotRows.toSeq == want.toSeq)
  }
}
