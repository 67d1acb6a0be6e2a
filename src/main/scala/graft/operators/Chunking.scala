package graft.operators

import graft.functions.Text

import org.apache.spark.sql.{Column, DataFrame}
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
  * ZERO shuffle: the whole chunker is one per-row column expression
  * (tokenize → shingle keys → cut positions → span slices, all
  * higher-order array functions over this document's tokens) followed
  * by a scan-stage explode — a document's chunks never leave the task
  * that read the document, and per-row state is doc-bounded by
  * construction. This is also what makes the STREAMING twin free: the
  * same expression is stateless, so
  * [[graft.streaming.Streams.chunkStream]] reuses it verbatim. Chunk
  * fingerprints feed the exact-dedup family directly
  * ([[Dedup.exact]] on `chunk_fp`). */
object Chunking {

  /** The per-row chunk array:
    * `array<struct<chunk_idx long, n_tok long, chunk_fp string,
    * chunk_text string>>` — empty for empty/whitespace text. */
  def chunkColumn(text: Column, divisor: Int, shingleLen: Int = 3): Column = {
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    require(shingleLen >= 2, s"shingleLen must be >= 2, got $shingleLen")
    val toks = Text.tokens(text)
    val keys = transform(Text.fastWordShingles(text, shingleLen),
      s => Dedup.shingleKey(s))
    // the shingle STARTING at i covers i .. i+shingleLen-1; a boundary
    // shingle cuts AFTER its end position
    val cuts = filter(
      transform(keys, (k, i) =>
        when(pmod(k, lit(divisor.toLong)) === 0L, i + lit(shingleLen - 1))
          .otherwise(lit(-1))),
      c => c >= 0)
    val len = size(toks)
    val starts = concat(array(lit(0)), transform(cuts, c => c + 1))
    // clamp cut positions to the token range: a doc shorter than the
    // shingle emits one whole-text shingle whose cut would land at
    // shingleLen-1 >= len, and an unclamped end would report n_tok =
    // shingleLen while the slice holds only len tokens
    val ends = concat(transform(cuts, c => least(c, len - 1)), array(len - 1))
    // a cut at the last token (or the empty document) would open an
    // empty trailing span — the s <= e / s < len filter closes both
    val spans = filter(
      zip_with(starts, ends, (s, e) => struct(s.as("s"), e.as("e"))),
      p => p.getField("s") <= p.getField("e") && p.getField("s") < len)
    transform(spans, (p, k) => {
      val n = p.getField("e") - p.getField("s") + 1
      val body = array_join(slice(toks, p.getField("s") + 1, n), " ")
      struct(k.cast("long").as("chunk_idx"), n.cast("long").as("n_tok"),
        md5(body).as("chunk_fp"), body.as("chunk_text"))
    })
  }

  /** Chunk every document; returns `(idCol, chunk_idx, n_tok, chunk_fp,
    * chunk_text)` with `chunk_idx` 0-based in token order and `chunk_fp`
    * the md5 of the space-joined chunk tokens. Scan-stage fan-out only —
    * no exchange anywhere (spec-asserted). */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
                           divisor: Int, shingleLen: Int = 3): DataFrame =
    // spreadRead: the gear-hash chunker is one of the engine's heaviest
    // per-row stages (tokenize + rolling hash + per-chunk md5), and a
    // few-row-group corpus would run it on as few cores — measured r13:
    // q127's whole 1.8 s was ONE chunker task; spread 0.7 s. No-op when
    // the input already carries >= cores partitions (any real scale).
    graft.sources.Tables.spreadRead(docs)
      .select(col(idCol),
        explode(chunkColumn(col(textCol), divisor, shingleLen)).as("_c"))
      .select(col(idCol), col("_c.chunk_idx").as("chunk_idx"),
        col("_c.n_tok").as("n_tok"), col("_c.chunk_fp").as("chunk_fp"),
        col("_c.chunk_text").as("chunk_text"))
}
