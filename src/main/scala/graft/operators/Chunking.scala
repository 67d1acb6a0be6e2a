package graft.operators

import graft.functions.Text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CONTENT-DEFINED chunking (the gear/Rabin family behind LBFS and
  * FastCDC, at token granularity): chunk boundaries fall where the
  * rolling content hash — here the 60-bit key of the 3-token shingle
  * ending at a position — lands in a chosen residue class, so an
  * insertion early in a document only reshapes the chunks AROUND the
  * edit while every later boundary (a pure function of local content)
  * stays put. That locality is the whole point versus [[Text]]'s
  * fixed-stride windows (q72), where one inserted token shifts every
  * subsequent chunk and defeats chunk-level dedup across crawl
  * versions. Textbook form: no min/max chunk guards (a straightforward
  * extension — clamp the boundary predicate inside a position band).
  *
  * Expected chunk length ≈ `divisor` tokens (boundary probability
  * 1/divisor per position under the uniform shingle hash). Documents
  * shorter than the shingle never cut (the degenerate single-shingle
  * "end" position sits past the last token on both engines — the same
  * arithmetic, no special case).
  *
  * ## Exactness
  * Boundaries are `shingleKey % divisor == 0` over [[Dedup.shingleKey]]'s
  * md5-prefix BIGINT — the hashed universe q20/q39/q108 already share
  * with the DuckDB oracle, so chunk membership, reassembled text, and
  * the md5 chunk fingerprint all hash-match.
  *
  * ## Scale shape (100 TB)
  * One posexplode fan-out in the scan stage, one doc-partitioned window
  * (per-partition state bounded by a document's tokens — doc-bounded,
  * never corpus-bounded), one doc-keyed aggregation to reassemble.
  * Chunk fingerprints feed the exact-dedup family directly
  * ([[Dedup.exact]] on `chunk_fp`). */
object Chunking {

  /** Chunk every document; returns `(idCol, chunk_idx, n_tok, chunk_fp,
    * chunk_text)` with `chunk_idx` 0-based in token order and `chunk_fp`
    * the md5 of the space-joined chunk tokens. */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
                           divisor: Int, shingleLen: Int = 3): DataFrame = {
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    require(shingleLen >= 2, s"shingleLen must be >= 2, got $shingleLen")
    val toks = docs
      .select(col(idCol), posexplode(Text.tokens(col(textCol))))
      .toDF(idCol, "p", "tok")
    // the shingle STARTING at p covers p .. p+shingleLen-1; a boundary
    // shingle cuts AFTER its end position — token j starts a new chunk
    // once a cutting shingle ended strictly before j
    val cuts = docs
      .select(col(idCol),
        posexplode(Text.fastWordShingles(col(textCol), shingleLen)))
      .toDF(idCol, "sp", "sh")
      .where(pmod(Dedup.shingleKey(col("sh")), lit(divisor.toLong)) === 0L)
      .select(col(idCol), (col("sp") + lit(shingleLen - 1)).as("cut_end"))
    val assigned = toks
      .join(cuts.groupBy(idCol).agg(collect_list(col("cut_end")).as("_cuts")),
        Seq(idCol), "left")
      .withColumn("chunk_idx",
        coalesce(size(filter(col("_cuts"), c => c < col("p"))), lit(0)).cast("long"))
      .drop("_cuts")
    // the per-doc cut list is len/divisor entries — broadcastable per row;
    // chunk assignment is a narrow array count, no window needed
    assigned.groupBy(col(idCol), col("chunk_idx"))
      .agg(sort_array(collect_list(struct(col("p"), col("tok")))).as("_ord"))
      .select(col(idCol), col("chunk_idx"),
        size(col("_ord")).cast("long").as("n_tok"),
        md5(array_join(transform(col("_ord"), x => x.getField("tok")), " "))
          .as("chunk_fp"),
        array_join(transform(col("_ord"), x => x.getField("tok")), " ")
          .as("chunk_text"))
  }
}
