package graft

/** Shared near-duplicate corpus for the dedup/similarity suites (was the
  * OperatorsSpec class fixture before the round-11 split). */
private[graft] trait DocsWithDupsFixture { this: SparkSuite =>
  protected lazy val docsWithDups = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
      (4L, "completely different content about spark query engines and columnar execution plans"),
      (5L, "THE  Quick   Brown fox jumps over the lazy dog near the river bank today") // dup of 1 after normalize
    ).toDF("doc_id", "text")
  }
}
