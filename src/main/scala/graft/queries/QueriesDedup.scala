package graft

import graft.expr.Expr
import graft.functions.{Text, Vectors}
import graft.operators.{Accumulate, AsOf, Dedup, Sessionize, Similarity}
import graft.sources.Tables
import graft.stream.DataStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup gate queries, split out of [[SparkEntry]] (round-10
  * hygiene); the `queries`/`oracleSql` maps in SparkEntry remain the
  * single registry — this trait only hosts the builders verbatim. */
private[graft] trait QueriesDedup { this: SparkEntry.type =>

  /** Exact dedup on normalized-text fingerprint. */
  protected def q17(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))


  /** MinHash + LSH near-duplicate pairs (portable md5 min-hashing). */
  protected def q18(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashLsh(Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, k = 16, bands = 4, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))


  /** SimHash bit vectors (32 bits, portable md5 bit extraction). The hash
    * itself is the checked output — a much stronger parity check than the
    * (usually empty) near-dup pair set. */
  protected def q19(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashTable(Tables.documents(s, dir), "doc_id", "text", 32)
      .select(col("id").as("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))


  /** Exact n-gram Jaccard near-dup pairs with df-bounded candidate
    * generation. */
  protected def q20(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("id_a"), col("id_b"))


  /** Multimodal column plumbing, oracle-checkable slice: documents as opaque
    * binary payloads with typed metadata and deterministic pseudo-decode
    * (the real byte-level decode plumbing lives in
    * [[graft.multimodal.Media]]; the image/audio codecs are stubbed per the
    * container's constraints). */
  protected def q28(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (lit(16L) + col("doc_id") % 64 * 8).as("width"),
        (lit(16L) + col("n_chars") % 48 * 8).as("height"),
        (col("n_chars") % 240).cast("double").as("duration_s"))
      .orderBy(col("doc_id"))


  /** Near-dup deduplication end-to-end: n-gram-Jaccard edges → connected
    * components (iterative min-label propagation) → keep min-id
    * representative per cluster. The oracle computes the same closure with
    * a recursive CTE. */
  protected def q39(s: SparkSession, dir: String): DataFrame =
    Dedup.deduplicateNearDups(Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("id"))


  /** Decontamination: training docs (doc_id % 10 != 0) containing ≥ half of
    * an eval doc's (doc_id % 10 == 0) distinct shingles — one-sided
    * containment via a bipartite inverted-index join, never all-pairs. */
  protected def q42(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.crossCorpusOverlap(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("corpus_id"), col("probe_id"))
  }


  /** SimHash near-dup pairs via pigeonhole multi-block indexing: any pair
    * within Hamming distance 2 agrees exactly on one of 3 blocks, so the
    * blocked candidates equal the brute-force all-pairs set (the oracle) —
    * without ever forming the quadratic join. The bucket cap is explicitly
    * raised above any smoke-corpus size (sf1 scale-up included), so the
    * hot-bucket machinery never engages and salting's two-pass overhead is
    * skipped; [[q53]] is the twin that FORCES the salted path with a
    * binding cap against the same brute-force oracle. */
  protected def q49(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(Tables.documents(s, dir), "doc_id", "text",
        bits = 32, maxDistance = 2, maxBucketSize = 1 << 20,
        saltHotBuckets = false)
      .orderBy(col("id_a"), col("id_b"))


  /** [[q49]] with a deliberately BINDING bucket cap and salted hot buckets:
    * over-cap (block, value) buckets split into ⌈n/cap⌉ salted sub-buckets
    * cross-paired via triangle replication — the result must STILL equal
    * the brute-force all-pairs oracle, proving the salting loses nothing
    * while bounding per-task cost. The cap of 20 genuinely engages on the
    * test corpora (measured max bucket: 45 at sf0.001, 50 at sf0.01). */
  protected def q53(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(Tables.documents(s, dir), "doc_id", "text",
        bits = 32, maxDistance = 2, maxBucketSize = 20,
        saltHotBuckets = true)
      .orderBy(col("id_a"), col("id_b"))


  /** Document fingerprints: md5 of normalized text + polynomial rolling
    * hash — both engine-portable, both per-row narrow transforms. */
  protected def q35(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.fingerprint(col("text")).as("md5_fp"),
        Text.rollingFingerprint(col("text")).as("roll_fp"))
      .orderBy(col("doc_id"))


  /** Decontamination through the Bloom-prefilter path: same semantics and
    * the same oracle as q42, but the corpus side never shuffles at full
    * width — a filter built over the eval set's shingle keys drops
    * non-candidate corpus shingles inside the scan stage (see
    * [[Dedup.crossCorpusOverlapBloom]]). Exact output: false positives die
    * in the verify semi-join, false negatives don't exist. */
  protected def q60(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.crossCorpusOverlapBloom(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleLen = 3, threshold = 0.5, maxShingleDf = 50, fpp = 0.01)
      .orderBy(col("corpus_id"), col("probe_id"))
  }


  /** Near-dup canonicalization: q39's clustering, but each cluster keeps
    * its highest-QUALITY member (q24's quality score; id as tiebreak) —
    * the policy a real pipeline wants when near-copies differ in cruft.
    * The oracle recomputes the same closure and picks the same winner with
    * a window over the identical (IEEE-exact, q24-proven) quality value. */
  protected def q61(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    Dedup.canonicalizeNearDups(Tables.documents(s, dir), "doc_id", "text",
        score = _ => Text.qualityScore(col("text"), stop),
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("id"))
  }


  /** Incremental dedup: the 20% batch (doc_id % 5 == 0) classified against
    * the 80% corpus index (exact fingerprint + MinHash band keys) — joins
    * on short digests only, never batch×corpus documents. The status
    * machine (exact_dup / near_dup_candidate / kept with min-id batch
    * tie-breaks) is deterministic, so the oracle reproduces it exactly. */
  protected def q63(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val index = Dedup.dedupIndex(docs.where(col("doc_id") % 5 =!= 0),
      "doc_id", "text", shingleLen = 3, k = 16, bands = 4)
    Dedup.incrementalDedup(index, docs.where(col("doc_id") % 5 === 0),
        "doc_id", "text", shingleLen = 3, k = 16, bands = 4)
      .select(col("id").as("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }


  /** The incremental-dedup loop CLOSED: q63's classification feeds
    * [[Dedup.updateDedupIndex]], and the checked output is the index a
    * production pipeline would persist for the next batch — every corpus
    * row plus the kept batch docs' (fp, band keys). Band arrays emit
    * string-joined (q19's portability trick).
    *
    * The corpus index is a STORED table for real here: written once with
    * [[Tables.writeBucketed]] (bucketed on `fp`, so future batches'
    * fingerprint joins co-locate) and read BACK from parquet before the
    * classify — the loop's persistence story is executable, not a comment.
    * The batch index is per-crawl ephemeral, so it stays a checkpoint;
    * without it the classify and absorb branches would each re-shingle
    * the batch documents. */
  protected def q66(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    // table name keyed by the data dir: building q66 for two dirs in one
    // session must not rebind the earlier DataFrame's lazy table read to
    // the later dir's index (the write is an eager side effect, the read
    // is lazy — with a shared name the second write would win)
    val idxTable = "graft_q66_corpus_index_" +
      dirHash(dir)
    Tables.writeBucketed(
      Dedup.dedupIndex(corpus, "doc_id", "text", shingleLen = 3, k = 16, bands = 4),
      idxTable, buckets = 8, "fp")
    val index = s.table(idxTable)
    val bIdx = Dedup.dedupIndex(batch, "doc_id", "text", shingleLen = 3, k = 16, bands = 4)
      .localCheckpoint(eager = true)
    val statuses = Dedup.incrementalDedupFromIndex(index, bIdx)
    Dedup.updateDedupIndexFromIndex(index, bIdx, statuses)
      .select(col("id").as("doc_id"), col("fp"),
        concat_ws(",", col("bands")).as("bands_str"))
      .orderBy(col("doc_id"))
  }


  /** Block-level exact substring dedup (Lee-et-al-style span dedup at
    * fixed 10-token block granularity): keep the globally first occurrence
    * of every distinct block, reassemble each doc from its survivors.
    * Keep-first aggregates on 8-byte hashed block keys (partial-agg'd —
    * boilerplate blocks collapse map-side); reassembly is one
    * groupBy(doc). */
  protected def q76(s: SparkSession, dir: String): DataFrame =
    Dedup.blockDedup(Tables.documents(s, dir), "doc_id", "text", blockWords = 10)
      .select(col("doc_id"), col("n_blocks"), col("n_kept"), col("dedup_text"))
      .orderBy(col("doc_id"))


  /** Span-level contamination: per training doc, how many 4-token windows
    * also occur in the benchmark slice and what fraction of the doc's
    * token positions they cover — the fine-grained companion to q42/q60's
    * doc-level decontamination (same corpus split). */
  protected def q77(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.contaminationSpans(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", gramWords = 4)
      .orderBy(col("doc_id"))
  }


  /** Stride-1 exact substring span dedup (Lee-et-al all-but-first at token
    * granularity): duplicated 8-token spans keep only their globally first
    * occurrence; docs rebuilt from surviving tokens. */
  protected def q79(s: SparkSession, dir: String): DataFrame =
    Dedup.spanDedup(Tables.documents(s, dir), "doc_id", "text", spanWords = 8)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("cleaned_text"))
      .orderBy(col("doc_id"))


  /** Decontamination surgery: q77's matched spans REMOVED — every corpus
    * token under a 4-token window that occurs in the benchmark slice is
    * cut, docs rebuilt from survivors (same split as q42/q60/q77). */
  protected def q80(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.scrubContaminatedSpans(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", gramWords = 4)
      .orderBy(col("doc_id"))
  }


  /** WITHIN-document duplicate-segment removal — keep each 5-token
    * segment's first in-doc occurrence; zero-shuffle narrow plan
    * ([[graft.operators.Dedup.selfDedup]]). */
  protected def q93(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.selfDedup(Tables.documents(s, dir), "doc_id", "text",
        segWords = 5)
      .orderBy(col("doc_id"))


  /** Record linkage over part names: within-block pairs within 3
    * Levenshtein edits. The block key is COMPOSITE — (name's last token,
    * brand) — the standard multi-attribute blocking move: the noun alone
    * has 8 distinct values over 20k rows (25M candidate pairs at sf0.1),
    * the brand refines that 25× while "match within the brand" stays the
    * realistic linkage contract
    * ([[graft.operators.Linkage.blockedFuzzyPairs]]). */
  protected def q95(s: SparkSession, dir: String): DataFrame =
    graft.operators.Linkage.blockedFuzzyPairs(
        Tables.part(s, dir), "p_partkey", "p_name",
        blockKey = concat_ws("|",
          element_at(split(col("p_name"), " "), -1), col("p_brand")),
        maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))


  /** Doc-in-doc containment pairs (overlap coefficient >= 0.5) over the
    * same pruned hashed-shingle universe as q20
    * ([[graft.operators.Dedup.containmentPairs]]). */
  protected def q97(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.containmentPairs(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("id_a"), col("id_b"))


  /** The containment dedup ACTION: drop every doc contained (overlap >=
    * 0.5) in a larger partner — smaller side loses, equal sizes lose the
    * larger id ([[graft.operators.Dedup.containmentDedup]]). */
  protected def q101(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.containmentDedup(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))


  /** Multi-pass sorted-neighborhood linkage over part names — the
    * recall-preserving alternative to q95's attribute blocking: pass 1
    * sorts by the name (prefix typos land adjacent), pass 2 by the
    * REVERSED name (suffix typos), window 10, distance ≤ 3. Candidate
    * blocks are rank-derived and fixed-size — skew-immune
    * ([[graft.operators.Linkage.sortedNeighborhoodPairs]]). */
  protected def q102(s: SparkSession, dir: String): DataFrame =
    graft.operators.Linkage.sortedNeighborhoodPairs(
        Tables.part(s, dir), "p_partkey", "p_name",
        passes = Seq(
          (col("p_name"), substring(col("p_name"), 1, 2)),
          (reverse(col("p_name")), substring(reverse(col("p_name")), 1, 2))),
        window = 10, maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))


  /** The embedding-dedup ACTION over q33's pair universe: drop every
    * vector with a smaller-id near-duplicate partner (cosine ≥ 0.35 in a
    * shared LSH block) — the SemDeDup keep-one policy, per-pair and
    * single-pass ([[graft.operators.Similarity.embeddingDedup]]). */
  protected def q106(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.35, planes = 6, dim = EmbeddingDim)
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .orderBy(col("vec_id"))


  /** SemDeDup proper — the CLUSTERED semantic dedup (q106 blocks by LSH
    * bucket; this clusters by exact k-means and prunes within clusters,
    * the Abbas et al. shape): 8 integer-Lloyd clusters over the
    * embedding corpus, within-cluster cosine ≥ 0.3 pairs, and per pair
    * the member closer to its centroid is dropped
    * ([[graft.operators.Similarity.semDedup]]). */
  protected def q249(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
      k = 8, rounds = 2, threshold = 0.3)

  /** SemDeDup in the SCALE regime — coarse→fine hierarchical assignment
    * with k = ⌈n/16⌉ clusters routed through ⌈√k⌉ coarse super-clusters
    * ([[graft.operators.Similarity.semDedupCoarseFine]]): the Lloyd
    * assignment term drops from n·k to n·2√k per round while the pair
    * join stays ≈ n·target/2. Rows-only by necessity: the driver-side
    * coarse Lloyd over INTERMEDIATE centroids sits outside the
    * generated-CTE scheme that hash-gates q249 — parity rides the
    * bitwise-vs-flat fixture spec, the determinism rerun spec, and the
    * ScaleSpec plan pin instead. */
  protected def q268(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedupCoarseFine(Tables.embeddings(s, dir), "vec_id",
      "embedding", targetClusterSize = 16, rounds = 2, threshold = 0.3)

  /** The COMPOSED semantic-dedup pipeline — q268's coarse→fine routing
    * with q106's LSH pre-blocking unioned into the candidate pair set
    * ([[graft.operators.Similarity.semDedupBlocked]]): the RECALL.md
    * escape for the hierarchical path's 10-22% victim-recall gap, run
    * at the gate (same target/rounds/threshold as q268, planes = 6).
    * Rows-only by the same documented necessity as q268 (the
    * driver-side coarse Lloyd sits outside the generated-CTE oracle
    * scheme); victim recall vs flat autoK is measured in RECALL.md and
    * the monotone/determinism laws are spec'd. */
  protected def q272(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedupBlocked(Tables.embeddings(s, dir), "vec_id",
      "embedding", targetClusterSize = 16, rounds = 2, threshold = 0.3,
      planes = 6, dim = EmbeddingDim)

  /** q272's composition under the AUTO planes rule — the production
    * default at the gate: `planes ≤ 0` derives ⌈log₂(n/512)⌉ from the
    * corpus count (bucket pairs ≈ 256·n at ANY scale — the measured
    * sweet spot, RECALL.md round 13), so THIS query's cost stays
    * near-linear across scale factors where q272's pinned planes = 6
    * pays the n²/2⁶ bucket term by construction. Rows-only for the
    * same documented reason as q268/q272; the auto≡explicit law is
    * spec-pinned and deterministic (planes a pure function of n). */
  protected def q275(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedupBlocked(Tables.embeddings(s, dir), "vec_id",
      "embedding", targetClusterSize = 16, rounds = 2, threshold = 0.3,
      dim = EmbeddingDim)


  /** Per-document novelty: the fraction of a doc's distinct 3-shingles
    * with corpus df = 1 — the inverse signal of boilerplate, over the
    * same hashed-shingle universe as q20
    * ([[graft.operators.Boilerplate.shingleNovelty]]). */
  protected def q108(s: SparkSession, dir: String): DataFrame =
    graft.operators.Boilerplate.shingleNovelty(
        Tables.documents(s, dir), "doc_id", "text", shingleLen = 3)
      .orderBy(col("doc_id"))


  /** ADAPTIVE sorted-neighborhood over part names: the comparison window
    * follows similarity RUNS (adjacent sorted names within 2 edits extend
    * the run; a dissimilar neighbor breaks it), banded at 12 positions —
    * duplicate-dense stretches get the wide neighborhood a fixed window
    * denies them ([[graft.operators.Linkage.adaptiveNeighborhoodPairs]]). */
  protected def q114(s: SparkSession, dir: String): DataFrame =
    graft.operators.Linkage.adaptiveNeighborhoodPairs(
        Tables.part(s, dir), "p_partkey", "p_name",
        sortKey = col("p_name"), bucketKey = substring(col("p_name"), 1, 2),
        boundaryDist = 2, maxRun = 12, maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))


  /** Corpus snapshot diff — the crawl-to-crawl dataset-versioning report
    * ([[graft.operators.Cdc.snapshotDiff]]): v1 drops doc_id ≡ 6 (mod 7),
    * v2 drops ≡ 4 (mod 5) and edits ≡ 0 (mod 3) — so all four statuses
    * (added/removed/changed/unchanged) appear; fingerprints are md5
    * computed in the scan, bodies never shuffle. */
  protected def q122(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val v1 = docs.where(col("doc_id") % 7 =!= 6).select(col("doc_id"), col("text"))
    val v2 = docs.where(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    graft.operators.Cdc.snapshotDiff(v1, v2, "doc_id", "text")
      .orderBy(col("id"))
  }


  /** Incremental SHINGLE-df maintenance — the novelty/decontamination
    * model's lifecycle (q119's algebra over the data-sized hashed-shingle
    * universe, where incremental upkeep matters most): persist base-corpus
    * (sh, df, n_docs) bucketed on sh, absorb the batch without
    * re-shingling the base, emit the merged df ≥ 2 shared-key set — the
    * exact input [[graft.streaming.Streams.noveltyStream]]'s Bloom
    * rebuilds from. Oracle = df ≥ 2 keys over the WHOLE corpus in one
    * pass. */
  protected def q123(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.where(col("doc_id") % 3 =!= 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val statsTable = "graft_q123_shingle_stats_" +
      dirHash(dir)
    Tables.writeBucketed(
      graft.operators.Boilerplate.shingleDfStats(base, "doc_id", "text", 3),
      statsTable, buckets = 8, "sh")
    graft.operators.Boilerplate.sharedKeysFromStats(
        graft.operators.Boilerplate.updateShingleDfStats(
          s.table(statsTable), batch, "doc_id", "text", 3))
      .orderBy(col("sh"))
  }


  /** Content-defined chunking — gear-hash boundaries over the shared
    * hashed-shingle universe (boundary where the 3-shingle key ≡ 0
    * mod 32 → ~32-token chunks): the insertion-robust dedup unit q72's
    * fixed stride cannot give (an early edit shifts every fixed window,
    * but content-defined boundaries downstream of the edit stay put)
    * ([[graft.operators.Chunking.contentDefinedChunks]]). Chunk
    * fingerprints feed exact dedup directly. */
  protected def q126(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.contentDefinedChunks(
        Tables.documents(s, dir), "doc_id", "text", divisor = 32)
      .orderBy(col("doc_id"), col("chunk_idx"))


  /** CROSS-VERSION chunk reuse — why content-defined boundaries exist:
    * v2 prepends two tokens to every doc_id ≡ 0 (mod 3) (the edit that
    * shifts EVERY fixed-stride window), then measures per doc how many
    * of v2's distinct chunk fingerprints already exist in v1's chunks
    * of the same doc. Edited docs re-synchronize after the edit (high
    * but < 1 reuse); untouched docs reuse 1.0 — so an incremental
    * pipeline re-processes only the novel chunks. Composes q126's
    * chunker with q122's versioning framing. */
  protected def q127(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val v2 = docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(lit("totally new "), col("text")))
        .otherwise(col("text")).as("text"))
    def fps(v: DataFrame) =
      graft.operators.Chunking.contentDefinedChunks(v, "doc_id", "text", divisor = 32)
        .select(col("doc_id"), col("chunk_fp")).distinct()
    val c1 = fps(docs.select(col("doc_id"), col("text"))).toDF("d1", "fp1")
    val c2 = fps(v2)
    c2.join(c1, col("doc_id") === col("d1") && col("chunk_fp") === col("fp1"),
        "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("fp1").isNotNull, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("reuse_frac",
        col("n_shared").cast("double") / col("n_chunks").cast("double"))
      .orderBy(col("doc_id"))
  }


  /** Mutual-best-match (reciprocal best hit) entity resolution over
    * q95's blocked fuzzy candidate pairs — two greedy rounds, each
    * entity matched at most once; "best" = smallest edit distance, ties
    * on the partner key ([[graft.operators.Linkage.mutualBestMatch]]).
    * Four windows per round grouped onto two hash exchanges; no joins. */
  protected def q129(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.Linkage.blockedFuzzyPairs(
      Tables.part(s, dir), "p_partkey", "p_name",
      blockKey = concat_ws("|",
        element_at(split(col("p_name"), " "), -1), col("p_brand")),
      maxDist = 3)
    graft.operators.Linkage.mutualBestMatch(
        pairs, "id_a", "id_b", "dist", rounds = 2, smallerIsBetter = true)
      .orderBy(col("id_a"), col("id_b"))
  }


  /** Per-LSH-bucket representative: the member closest to its bucket's
    * centroid, in EXACT integer arithmetic (int8 codes, BIGINT per-dim
    * sums, n²-scaled distances — no float centroid anywhere), so unlike
    * the IVF family this routing layer is fully hash-checkable
    * ([[graft.operators.Similarity.bucketRepresentatives]]). */
  protected def q131(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.bucketRepresentatives(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        planes = 6, dim = EmbeddingDim)
      .orderBy(col("bucket"))


  /** End-to-end IMAGE dedup over real bytes: synthesize a real 24-bit
    * BMP per document (every id-triple shares a seed → planted exact
    * duplicates), fingerprint via exact patch statistics, group — the
    * multimodal pipeline run as one plan: encode (scan) → decode + tile
    * (scan) → one media_id groupBy → one fp groupBy; payload bytes never
    * shuffle ([[graft.multimodal.Media.synthesizeBmp]] /
    * [[graft.multimodal.Media.imageFingerprints]]). Rows-only by design:
    * no SQL engine parses BMP — the codec round-trip and dup-structure
    * are spec'd (MediaSpec), and the grouped counts below are asserted
    * against the planted triple structure there too. */
  protected def q135(s: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Media.synthesizeBmp(
      Tables.documents(s, dir).select(col("doc_id").as("media_id"),
        concat(lit("img:"),
          (col("doc_id") - pmod(col("doc_id"), lit(3))).cast("string")).as("seed")),
      "media_id", "seed", width = 24, height = 16)
    // EXACTLY oracle-checkable despite the binary path: synthesizeBmp is
    // a pure function of (seed, dims) and the fingerprint is exact over
    // the bytes, so fp-groups must COINCIDE with seed-groups — the oracle
    // groups by the seed expression and any fingerprint collision across
    // seeds (groups merge), nondeterminism within a seed (groups split),
    // or codec drift shows up as a keep_id/n_copies hash mismatch
    graft.multimodal.Media.imageFingerprints(media, patch = 8)
      .groupBy(col("fp"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }


  /** DEDUP-YIELD report — the measurement behind every dedup decision:
    * per source, how many tokens are UNIQUE at content-defined-chunk
    * granularity vs total (a mirrored corpus contributes mass but no
    * unique mass). Chunks via q126's gear-hash chunker; each distinct
    * fingerprint is attributed to its globally FIRST occurrence
    * (doc_id, chunk_idx order), so sources are credited for content
    * they contributed first, not for re-hosting. One window over the
    * fp key + partial-aggregable source rollup; bodies never shuffle
    * (chunking is scan-stage; only (fp, ids, token counts) ride). */
  protected def q143(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val chunks = graft.operators.Chunking.contentDefinedChunks(
        Tables.documents(s, dir), "doc_id", "text", divisor = 32)
      .select(col("doc_id"), col("chunk_idx"), col("n_tok"), col("chunk_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_fp")).orderBy(col("doc_id"), col("chunk_idx"))
    chunks
      .withColumn("_own", row_number().over(w) === 1)
      .join(docs, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(when(col("_own"), col("n_tok")).otherwise(0L)).as("unique_tokens"))
      .withColumn("uniqueness",
        col("unique_tokens").cast("double") / col("total_tokens").cast("double"))
      .orderBy(col("source"))
  }


  /** Source×source CORPUS SIMILARITY MATRIX: exact pairwise Jaccard of
    * the per-source distinct-shingle sets over the hashed 60-bit
    * universe — the dataset-level overlap report that decides which
    * sources need cross-deduping before a merge. Pair fan-out is bounded
    * by the source count per shingle, never all-pairs of documents
    * ([[graft.operators.Dedup.corpusSimilarityMatrix]]). */
  protected def q148(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.corpusSimilarityMatrix(
        Tables.documents(s, dir), "source", "text", shingleLen = 3)
      .orderBy(col("g_a"), col("g_b"))


  /** Winnowing fingerprints (the MOSS local-fingerprinting algorithm):
    * per-document distinct window-minima over positional shingle hashes
    * — DETERMINISTIC partial-overlap detection (any shared ≥ w+2-token
    * run forces a shared fingerprint), stored at ~2/(w+1) density
    * ([[graft.operators.Dedup.winnowingFingerprints]]). */
  protected def q151(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.winnowingFingerprints(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, window = 8)
      .orderBy(col("doc_id"), col("fp"))


  /** q148's similarity matrix from KMV SKETCHES (k smallest distinct
    * shingle keys per source, k = 128): the model-sized approximate path
    * — and because KMV is a deterministic function of the hashes, the
    * ESTIMATE itself hash-matches an oracle replaying the same k-min
    * selection; closeness to the exact matrix is spec-measured
    * ([[graft.operators.Dedup.kmvSimilarityMatrix]]). */
  protected def q154(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.kmvSimilarityMatrix(
        Tables.documents(s, dir), "source", "text", shingleLen = 3, k = 128)
      .orderBy(col("g_a"), col("g_b"))


  /** End-to-end AUDIO dedup over real bytes — q135's audio twin:
    * synthesize a real 16-bit PCM WAV per document (every id-QUAD
    * shares a seed → planted exact duplicates), fingerprint by exact
    * frame energies, group. One plan: encode (scan) → decode + frame
    * (scan) → one fp groupBy; payload bytes never shuffle
    * ([[graft.multimodal.Media.synthesizeWav]] /
    * [[graft.multimodal.Media.audioFingerprints]]). Exactly
    * oracle-checkable without the bytes (the q135 argument):
    * synthesizeWav is pure in the seed and the fingerprint exact, so
    * fp-groups ≡ seed-groups — collisions, nondeterminism, or codec
    * drift all break the keep_id/n_copies hash. */
  protected def q165(s: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Media.synthesizeWav(
      Tables.documents(s, dir).select(col("doc_id").as("media_id"),
        concat(lit("aud:"),
          (col("doc_id") - pmod(col("doc_id"), lit(4))).cast("string")).as("seed")),
      "media_id", "seed", sampleRate = 8000, nSamples = 800)
    graft.multimodal.Media.audioFingerprints(media, frameSize = 160)
      .groupBy(col("fp"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }


  /** LSH threshold SWEEP — the q18 banding candidates verified with
    * exact hashed-shingle Jaccard and binned by decile, plus the
    * survivor curve: the tuning read that picks the dedup threshold
    * before a corpus-wide run ([[graft.operators.Tuning
    * .lshThresholdSweep]]). */
  protected def q181(s: SparkSession, dir: String): DataFrame =
    graft.operators.Tuning.lshThresholdSweep(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, k = 16, bands = 4)
      .orderBy(col("decile"))


  /** EXACT Jaccard ≥ ½ similarity self-join by prefix filtering — zero
    * false negatives (the contractual-dedup guarantee LSH can't give);
    * the oracle brute-forces the SEMANTICS over the same df ≤ 50 hashed
    * universe, so completeness itself is what the gate checks
    * ([[graft.operators.PrefixJoin.jaccardSelfJoin]]). */
  protected def q182(s: SparkSession, dir: String): DataFrame =
    graft.operators.PrefixJoin.jaccardSelfJoin(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, tNum = 1L, tDen = 2L, maxDf = 50L)
      .orderBy(col("id_a"), col("id_b"))


  /** PERCEPTUAL image dedup over REAL bytes — q135's exact-hash dedup
    * carried to the downsample-and-threshold aHash (every bit an exact
    * cross-multiplied mean comparison over decoded patch sums); groups
    * by perceptual hash must coincide with seed groups, the q135
    * exactness argument ([[graft.multimodal.Media.imageAHash]]). */
  protected def q188(s: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Media.synthesizeBmp(
      Tables.documents(s, dir).select(col("doc_id").as("media_id"),
        concat(lit("ah:"),
          (col("doc_id") - pmod(col("doc_id"), lit(3))).cast("string")).as("seed")),
      "media_id", "seed", width = 24, height = 16)
    graft.multimodal.Media.imageAHash(media, patch = 4)
      .groupBy(col("ahash"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }


  protected def q208(s: SparkSession, dir: String): DataFrame =
    Dedup.multiScaleSpanDedup(Tables.documents(s, dir), "doc_id", "text",
        scales = MultiScaleScales)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("cleaned_text"))
      .orderBy(col("doc_id"))


  /** ROUGE-3 contamination suspects on q77's corpus/benchmark split
    * ([[graft.operators.Eval.rougeN]]): pairs with F1 ≥ 1% — the
    * paraphrase-ish overlap read q77's exact-window scan misses; the
    * two run together in a decontamination pass. */
  protected def q224(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.operators.Eval.rougeN(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3)
      .where(col("f1_micro") >= 10000L)
      .orderBy(col("doc_id"), col("ref_id"))
  }


  /** Log-space BLEU-4 on exactly the pairs q224's ROUGE pass flagged
    * ([[graft.operators.Eval.bleuPairs]]) — the precision-side verdict
    * on each contamination suspect; the all-pairs explosion never
    * exists because the pair list bounds every join. */
  protected def q225(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val cand = docs.where(col("doc_id") % 10 =!= 0)
    val ref = docs.where(col("doc_id") % 10 === 0)
    val pairs = graft.operators.Eval.rougeN(cand, ref, "doc_id", "text", n = 3)
      .where(col("f1_micro") >= 10000L)
      .select(col("doc_id"), col("ref_id"))
    graft.operators.Eval.bleuPairs(pairs, cand, ref, "doc_id", "text", maxN = 4)
      .orderBy(col("doc_id"), col("ref_id"))
  }


  protected def oraclesDedup: Map[String, String] = Map(
      // SemDeDup: the 2-round Lloyd chain (q218's generated CTE scheme),
      // own-centroid distance off dist_f ⋈ a_f, within-cluster pair
      // cosines over exact integer dots/norms (q21's IEEE chain), victim
      // = closer-to-centroid member (ties drop the larger id), anti-join
      "q249_semdedup" -> {
        val rounds = 2
        s"""WITH ${kmeansChainSql(k = 8, rounds = rounds)},
           own AS (SELECT df.vec_id, df.c, CAST(df.dist AS BIGINT) AS dist
                   FROM dist_f df JOIN a_f a
                     ON a.vec_id = df.vec_id AND a.c = df.c),
           n2 AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS n2
                  FROM px GROUP BY vec_id),
           pr AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
                    a.dist AS da, b.dist AS db
                  FROM own a JOIN own b
                    ON a.c = b.c AND a.vec_id < b.vec_id),
           dots AS (SELECT pr.ida, pr.idb, pr.da, pr.db,
                      CAST(sum(pa.x * pb.x) AS BIGINT) AS dot
                    FROM pr JOIN px pa ON pa.vec_id = pr.ida
                         JOIN px pb ON pb.vec_id = pr.idb AND pb.d = pa.d
                    GROUP BY 1, 2, 3, 4),
           vic AS (SELECT DISTINCT
                     CASE WHEN da < db THEN ida
                          WHEN db < da THEN idb
                          ELSE greatest(ida, idb) END AS victim
                   FROM dots JOIN n2 na ON na.vec_id = dots.ida
                        JOIN n2 nb ON nb.vec_id = dots.idb
                   WHERE na.n2 > 0 AND nb.n2 > 0
                     AND CAST(dot AS DOUBLE) /
                       (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                       >= 0.3)
           SELECT o.vec_id, o.c AS cluster, o.dist AS dist2
           FROM own o LEFT JOIN vic ON vic.victim = o.vec_id
           WHERE vic.victim IS NULL
           ORDER BY o.vec_id"""
      },


      "q17_dedup_exact" ->
        s"""SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, count(*) AS n_copies
           FROM documents GROUP BY md5($norm) ORDER BY doc_id""",

      // Two-hash min-hash family mirrored exactly: one md5 per distinct
      // shingle, 32-bit halves h1/h2, hash i = (h1 + i*h2) mod P — BIGINT
      // arithmetic is identical on both engines.
      "q18_minhash_lsh" ->
        s"""WITH ex AS (
             SELECT doc_id AS id, unnest(list_distinct(${shingles(3)})) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents) d),
           hv AS (
             SELECT id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h1,
                        ('0x' || substr(md5(s), 9, 8))::BIGINT AS h2
             FROM ex),
           sig AS (
             SELECT id, [${(0 until 16).map(i => s"min((h1 + $i * h2) % 4294967291)").mkString(", ")}] AS sig
             FROM hv GROUP BY id),
           banded AS (
             SELECT id, sig, unnest(list_transform(range(0, 4), b ->
               CAST(b AS VARCHAR) || ':' || md5(array_to_string(list_slice(sig, b * 4 + 1, b * 4 + 4), '|')))) AS band
             FROM sig)
           SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0 AS est_jaccard
           FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id
           WHERE len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) / 16.0 >= 0.5
           ORDER BY id_a, id_b""",

      "q19_simhash" ->
        s"""SELECT doc_id, array_to_string(list_transform(range(0, 32), p ->
             CASE WHEN list_sum(list_transform($toks, t ->
               ((strpos('0123456789abcdef', substr(md5(t), CAST(p // 4 + 1 AS BIGINT), 1)) - 1) >> (3 - p % 4)) % 2 * 2 - 1
             )) > 0 THEN '1' ELSE '0' END), '') AS simhash
           FROM documents ORDER BY doc_id""",

      // brute-force all-pairs over the same simhash table the q19 oracle
      // computes; the engine's pigeonhole blocking must reproduce it exactly.
      // q53 runs the SAME oracle against the salted-hot-bucket path (binding
      // cap): completeness must hold there too.
      "q53_simhash_salted" ->
        s"""WITH sh AS (
             SELECT doc_id, array_to_string(list_transform(range(0, 32), p ->
               CASE WHEN list_sum(list_transform($toks, t ->
                 ((strpos('0123456789abcdef', substr(md5(t), CAST(p // 4 + 1 AS BIGINT), 1)) - 1) >> (3 - p % 4)) % 2 * 2 - 1
               )) > 0 THEN '1' ELSE '0' END), '') AS simhash
             FROM documents)
           SELECT id_a, id_b, hamming FROM (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_filter(range(1, 33), i ->
                 substr(a.simhash, i, 1) <> substr(b.simhash, i, 1))) AS BIGINT) AS hamming
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE hamming <= 2 ORDER BY id_a, id_b""",

      "q49_simhash_pairs" ->
        s"""WITH sh AS (
             SELECT doc_id, array_to_string(list_transform(range(0, 32), p ->
               CASE WHEN list_sum(list_transform($toks, t ->
                 ((strpos('0123456789abcdef', substr(md5(t), CAST(p // 4 + 1 AS BIGINT), 1)) - 1) >> (3 - p % 4)) % 2 * 2 - 1
               )) > 0 THEN '1' ELSE '0' END), '') AS simhash
             FROM documents)
           SELECT id_a, id_b, hamming FROM (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_filter(range(1, 33), i ->
                 substr(a.simhash, i, 1) <> substr(b.simhash, i, 1))) AS BIGINT) AS hamming
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
           WHERE hamming <= 2 ORDER BY id_a, id_b""",

      "q20_ngram_jaccard" ->
        s"""WITH sh AS (
             SELECT doc_id AS id, unnest(${hashedShingles(3)}) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents) d),
           filtered AS (
             SELECT id, s FROM (
               SELECT id, s, count(*) OVER (PARTITION BY s) AS df FROM sh) t
             WHERE df <= 50),
           sizes AS (SELECT id, count(*) AS n_sh FROM filtered GROUP BY id),
           pairs AS (
             SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
             FROM filtered a JOIN filtered b ON a.s = b.s AND a.id < b.id
             GROUP BY 1, 2)
           SELECT id_a, id_b,
             CAST(shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - shared AS DOUBLE) AS jaccard
           FROM pairs JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
           WHERE CAST(shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - shared AS DOUBLE) >= 0.5
           ORDER BY id_a, id_b""",

      "q39_dedup_clusters" ->
        s"""WITH RECURSIVE
           ${clusterCtes(toks, hashedShingles(3))}
           SELECT doc_id AS id,
             coalesce(comp.component, doc_id) AS representative,
             doc_id = coalesce(comp.component, doc_id) AS is_kept
           FROM documents LEFT JOIN comp ON comp.id = doc_id
           ORDER BY id""",

      // q39's closure, but the kept doc is the argmax of q24's quality
      // (same IEEE-exact formula; id ascending breaks ties) — the window
      // pick below is the oracle twin of the engine's max_by reduction
      "q61_canonical_dedup" ->
        s"""WITH RECURSIVE
           ${clusterCtes(toks, hashedShingles(3))},
           mem AS (
             SELECT doc_id, coalesce(comp.component, doc_id) AS component
             FROM documents LEFT JOIN comp ON comp.id = doc_id),
           ranked AS (
             SELECT mem.doc_id, mem.component,
               row_number() OVER (PARTITION BY mem.component
                 ORDER BY ${qualitySql(toks)} DESC, mem.doc_id ASC) AS rn
             FROM mem JOIN documents ON documents.doc_id = mem.doc_id),
           canon AS (SELECT component, doc_id AS canonical FROM ranked WHERE rn = 1)
           SELECT mem.doc_id AS id, canon.canonical AS canonical,
             mem.doc_id = canon.canonical AS is_kept
           FROM mem JOIN canon USING (component)
           ORDER BY id""",

      "q42_decontaminate" -> decontaminateSql(toks, hashedShingles(3)),

      // result-identical to q42 by construction (the Bloom prefilter is
      // exact-verified) — the SAME oracle checks both paths
      "q60_bloom_decontaminate" -> decontaminateSql(toks, hashedShingles(3)),

      "q35_fingerprint" ->
        s"""SELECT doc_id, md5($norm) AS md5_fp,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(list_filter(string_split($norm, ''), c -> len(c) > 0),
                 c -> CAST(ord(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) AS roll_fp
           FROM documents ORDER BY doc_id""",

      "q28_multimodal" ->
        """SELECT doc_id, (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS BIGINT)] AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           16 + doc_id % 64 * 8 AS width,
           16 + n_chars % 48 * 8 AS height,
           CAST(n_chars % 240 AS DOUBLE) AS duration_s
           FROM documents ORDER BY doc_id""",

      // incremental dedup status machine, mirrored end to end: q18's
      // two-hash band chain per side (batch / index), q35's fingerprint,
      // min-id windows for the within-batch tie-breaks
      "q63_incremental_dedup" ->
        s"""WITH $incDedupCtes
           SELECT ex.id AS doc_id,
             CASE WHEN is_exact THEN 'exact_dup'
                  WHEN coalesce(near_hit, false) THEN 'near_dup_candidate'
                  ELSE 'kept' END AS status
           FROM ex LEFT JOIN nh ON nh.id = ex.id
           ORDER BY doc_id""",

      // the index after absorbing the batch: every corpus row, plus batch
      // docs whose status is 'kept' under the same machinery as q63
      "q66_index_update" ->
        s"""WITH $incDedupCtes,
           kept AS (
             SELECT ex.id FROM ex LEFT JOIN nh ON nh.id = ex.id
             WHERE NOT is_exact AND NOT coalesce(near_hit, false)),
           ibs AS (${bandsStr("isig")}),
           bbs AS (${bandsStr("bsig")}),
           ifps AS (SELECT doc_id AS id, md5($norm) AS fp FROM documents WHERE doc_id % 5 <> 0)
           SELECT id AS doc_id, fp, bands_str FROM (
             SELECT ifps.id AS id, fp, bands_str FROM ifps JOIN ibs ON ibs.id = ifps.id
             UNION ALL
             SELECT ex.id AS id, ex.fp AS fp, bands_str
             FROM ex JOIN kept ON kept.id = ex.id JOIN bbs ON bbs.id = ex.id) u
           ORDER BY doc_id""",

      // block-level substring dedup: globally-first occurrence per distinct
      // 10-token block (keep-first = least (doc_id, blk_idx), the engine's
      // min(struct) twin is rn = 1 here), docs reassembled from survivors.
      // Both engines group on the identical 60-bit md5 block key.
      "q76_block_dedup" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           b AS (
             SELECT doc_id,
               unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS blk_idx,
               unnest(list_transform(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
                 i -> array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10), ' '))) AS blk
             FROM t WHERE len(toks) > 0),
           k AS (
             SELECT doc_id, blk_idx, blk,
               row_number() OVER (
                 PARTITION BY CAST('0x' || substr(md5(blk), 1, 15) AS BIGINT)
                 ORDER BY doc_id, blk_idx) AS rn
             FROM b)
           SELECT t.doc_id,
             CAST(count(k.blk) AS BIGINT) AS n_blocks,
             CAST(count(CASE WHEN k.rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
             coalesce(string_agg(CASE WHEN k.rn = 1 THEN k.blk END, ' ' ORDER BY k.blk_idx), '') AS dedup_text
           FROM t LEFT JOIN k USING (doc_id)
           GROUP BY t.doc_id ORDER BY doc_id""",

      // span-level contamination vs the doc_id%10=0 benchmark slice (q42's
      // split): matched 4-token windows + distinct covered positions per
      // training doc; contamination is one double division of exact ints
      "q77_contamination_spans" -> {
        val winHash =
          "CAST('0x' || substr(md5(array_to_string(list_slice(toks, i + 1, i + 4), ' ')), 1, 15) AS BIGINT)"
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           bg AS (SELECT DISTINCT h FROM (
             SELECT unnest(list_transform(range(0, len(toks) - 3), i -> $winHash)) AS h
             FROM t WHERE doc_id % 10 = 0 AND len(toks) >= 4)),
           wins AS (
             SELECT doc_id, unnest(range(0, len(toks) - 3)) AS i,
               unnest(list_transform(range(0, len(toks) - 3), i -> $winHash)) AS h
             FROM t WHERE doc_id % 10 <> 0 AND len(toks) >= 4),
           pos AS (
             SELECT w.doc_id, w.i, unnest(range(w.i, w.i + 4)) AS p
             FROM wins w JOIN bg USING (h)),
           cov AS (
             SELECT doc_id, CAST(count(DISTINCT i) AS BIGINT) AS n_matched,
               CAST(count(DISTINCT p) AS BIGINT) AS covered_tokens
             FROM pos GROUP BY doc_id)
           SELECT t.doc_id,
             CAST(greatest(len(t.toks) - 3, 0) AS BIGINT) AS n_windows,
             coalesce(cov.n_matched, 0) AS n_matched,
             coalesce(cov.covered_tokens, 0) AS covered_tokens,
             CAST(coalesce(cov.covered_tokens, 0) AS DOUBLE)
               / CAST(greatest(len(t.toks), 1) AS DOUBLE) AS contamination
           FROM t LEFT JOIN cov USING (doc_id)
           WHERE t.doc_id % 10 <> 0
           ORDER BY doc_id"""
      },

      // all-but-first at token granularity: duplicated (occ >= 2) 8-token
      // windows keep only the least-(doc_id, i) occurrence; every other
      // occurrence marks its covered positions; docs rebuild from the
      // survivors. Same hashed-window universe as the engine.
      "q79_span_dedup" -> {
        val winHash8 =
          "CAST('0x' || substr(md5(array_to_string(list_slice(toks, i + 1, i + 8), ' ')), 1, 15) AS BIGINT)"
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           wins AS (
             SELECT doc_id, unnest(range(0, len(toks) - 7)) AS i,
               unnest(list_transform(range(0, len(toks) - 7), i -> $winHash8)) AS h
             FROM t WHERE len(toks) >= 8),
           marked AS (
             SELECT doc_id, i,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn,
               count(*) OVER (PARTITION BY h) AS occ
             FROM wins),
           rm AS (
             SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS n_removed,
               list_sort(list(DISTINCT p)) AS ps
             FROM (SELECT doc_id, unnest(range(i, i + 8)) AS p
                   FROM marked WHERE occ >= 2 AND rn > 1)
             GROUP BY doc_id),
           idx AS (
             SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS p FROM t),
           clean AS (
             SELECT idx.doc_id, string_agg(idx.tok, ' ' ORDER BY idx.p) AS cleaned_text
             FROM idx LEFT JOIN rm ON rm.doc_id = idx.doc_id
             WHERE NOT coalesce(list_contains(rm.ps, idx.p), false)
             GROUP BY idx.doc_id)
           SELECT t.doc_id,
             CAST(len(t.toks) AS BIGINT) AS n_tokens,
             coalesce(rm.n_removed, 0) AS n_removed,
             coalesce(clean.cleaned_text, '') AS cleaned_text
           FROM t LEFT JOIN rm USING (doc_id) LEFT JOIN clean USING (doc_id)
           ORDER BY doc_id"""
      },

      // multi-scale span dedup: q79's per-scale machinery instantiated per
      // (window, minOcc) policy entry, removal positions UNIONed across
      // scales, then the shared rebuild tail
      "q208_multiscale_dedup" -> {
        def winHash(k: Int) =
          s"CAST('0x' || substr(md5(array_to_string(list_slice(toks, i + 1, i + $k), ' ')), 1, 15) AS BIGINT)"
        def scaleRm(k: Int, minOcc: Long) =
          s"""SELECT doc_id, unnest(range(i, i + $k)) AS p FROM (
                SELECT doc_id, i,
                  row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn,
                  count(*) OVER (PARTITION BY h) AS occ
                FROM (
                  SELECT doc_id, unnest(range(0, len(toks) - ${k - 1})) AS i,
                    unnest(list_transform(range(0, len(toks) - ${k - 1}), i -> ${winHash(k)})) AS h
                  FROM t WHERE len(toks) >= $k))
              WHERE occ >= $minOcc AND rn > 1"""
        val rmUnion = MultiScaleScales
          .map { case (k, m) => s"(${scaleRm(k, m)})" }.mkString("\nUNION\n")
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           rmpos AS ($rmUnion),
           rm AS (
             SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS n_removed,
               list_sort(list(DISTINCT p)) AS ps
             FROM rmpos GROUP BY doc_id),
           idx AS (
             SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS p FROM t),
           clean AS (
             SELECT idx.doc_id, string_agg(idx.tok, ' ' ORDER BY idx.p) AS cleaned_text
             FROM idx LEFT JOIN rm ON rm.doc_id = idx.doc_id
             WHERE NOT coalesce(list_contains(rm.ps, idx.p), false)
             GROUP BY idx.doc_id)
           SELECT t.doc_id,
             CAST(len(t.toks) AS BIGINT) AS n_tokens,
             coalesce(rm.n_removed, 0) AS n_removed,
             coalesce(clean.cleaned_text, '') AS cleaned_text
           FROM t LEFT JOIN rm USING (doc_id) LEFT JOIN clean USING (doc_id)
           ORDER BY doc_id"""
      },

      // ROUGE-3: per-side NON-distinct shingle counts over the shared
      // 60-bit md5 gram universe, clipped-min match per overlapping
      // pair, micro scores by integer floor division (all nonnegative,
      // so // == the engine's pmod form)
      "q224_rouge" ->
        // `AND len(toks) > 0` mirrors rougeN's zero-token exclusion
        s"""WITH cg AS (
             SELECT cid, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS k,
               CAST(count(*) AS BIGINT) AS c1
             FROM (SELECT doc_id AS cid, unnest(${shingles(3)}) AS g
                   FROM (SELECT doc_id, $toks AS toks FROM documents
                         WHERE doc_id % 10 <> 0 AND len(toks) > 0) t) u
             GROUP BY 1, 2),
           rg AS (
             SELECT rid, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS k,
               CAST(count(*) AS BIGINT) AS c2
             FROM (SELECT doc_id AS rid, unnest(${shingles(3)}) AS g
                   FROM (SELECT doc_id, $toks AS toks FROM documents
                         WHERE doc_id % 10 = 0 AND len(toks) > 0) t) u
             GROUP BY 1, 2),
           m AS (SELECT cid, rid, CAST(sum(least(c1, c2)) AS BIGINT) AS n_match
                 FROM cg JOIN rg ON cg.k = rg.k GROUP BY 1, 2),
           ct AS (SELECT doc_id AS cid, CAST(len(${shingles(3)}) AS BIGINT) AS ctot
                  FROM (SELECT doc_id, $toks AS toks FROM documents
                        WHERE doc_id % 10 <> 0 AND len(toks) > 0) t),
           rt AS (SELECT doc_id AS rid, CAST(len(${shingles(3)}) AS BIGINT) AS rtot
                  FROM (SELECT doc_id, $toks AS toks FROM documents
                        WHERE doc_id % 10 = 0 AND len(toks) > 0) t)
           SELECT m.cid AS doc_id, m.rid AS ref_id, m.n_match,
             ct.ctot AS cand_total, rt.rtot AS ref_total,
             (1000000 * m.n_match) // ct.ctot AS precision_micro,
             (1000000 * m.n_match) // rt.rtot AS recall_micro,
             (2000000 * m.n_match) // (ct.ctot + rt.rtot) AS f1_micro
           FROM m JOIN ct ON ct.cid = m.cid JOIN rt ON rt.rid = m.rid
           WHERE (2000000 * m.n_match) // (ct.ctot + rt.rtot) >= 10000
           ORDER BY doc_id, ref_id""",

      // BLEU-4 on the ROUGE-flagged pairs: per n clipped matches routed
      // THROUGH the pair list, unigram lengths for the brevity penalty,
      // log-space readout (ln only — exp drifts across engines, the KM
      // convention); NULL when any m_n = 0 (BLEU exactly 0)
      "q225_bleu" -> {
        // `AND len(toks) > 0` mirrors bleuPairs' zero-token exclusion
        def side(pred: String, id: String, n: Int, cn: String) =
          s"""SELECT $id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS k,
               CAST(count(*) AS BIGINT) AS $cn
             FROM (SELECT doc_id AS $id, unnest(${shingles(n)}) AS g
                   FROM (SELECT doc_id, $toks AS toks FROM documents
                         WHERE doc_id % 10 $pred AND len(toks) > 0) t) u
             GROUP BY 1, 2"""
        def tot(pred: String, id: String, n: Int, out: String) =
          s"""SELECT doc_id AS $id, CAST(len(${shingles(n)}) AS BIGINT) AS $out
             FROM (SELECT doc_id, $toks AS toks FROM documents
                   WHERE doc_id % 10 $pred AND len(toks) > 0) t"""
        val perN = (1 to 4).map { n =>
          s"""cg$n AS (${side("<> 0", "cid", n, "c1")}),
           rg$n AS (${side("= 0", "rid", n, "c2")}),
           ct$n AS (${tot("<> 0", "cid", n, "ct")}),
           mm$n AS (SELECT p.cid, p.rid,
               CAST(sum(least(cg$n.c1, rg$n.c2)) AS BIGINT) AS m
             FROM prs p JOIN cg$n ON cg$n.cid = p.cid
               JOIN rg$n ON rg$n.rid = p.rid AND rg$n.k = cg$n.k
             GROUP BY 1, 2)"""
        }.mkString(",\n           ")
        val lnTerms = (1 to 4).map(n =>
          s"ln(CAST(m$n AS DOUBLE) / CAST(ct$n AS DOUBLE))").mkString(" + ")
        s"""WITH rt3 AS (${tot("= 0", "rid", 3, "rt")}),
           cg3p AS (${side("<> 0", "cid", 3, "c1")}),
           rg3p AS (${side("= 0", "rid", 3, "c2")}),
           ct3p AS (${tot("<> 0", "cid", 3, "ct")}),
           rm AS (SELECT cid, rid, CAST(sum(least(c1, c2)) AS BIGINT) AS nm
                  FROM cg3p JOIN rg3p ON cg3p.k = rg3p.k GROUP BY 1, 2),
           prs AS (SELECT rm.cid, rm.rid
                   FROM rm JOIN ct3p ON ct3p.cid = rm.cid
                     JOIN rt3 ON rt3.rid = rm.rid
                   WHERE (2000000 * rm.nm) // (ct3p.ct + rt3.rt) >= 10000),
           $perN,
           rl AS (${tot("= 0", "rid", 1, "rlen")}),
           base AS (SELECT p.cid, p.rid, ct1.ct AS c_len, rl.rlen AS r_len,
               coalesce(mm1.m, 0) AS m1, coalesce(mm2.m, 0) AS m2,
               coalesce(mm3.m, 0) AS m3, coalesce(mm4.m, 0) AS m4,
               ct1.ct AS ct1, ct2.ct AS ct2, ct3.ct AS ct3, ct4.ct AS ct4
             FROM prs p
               JOIN ct1 ON ct1.cid = p.cid
               JOIN ct2 ON ct2.cid = p.cid
               JOIN ct3 ON ct3.cid = p.cid
               JOIN ct4 ON ct4.cid = p.cid
               JOIN rl ON rl.rid = p.rid
               LEFT JOIN mm1 ON mm1.cid = p.cid AND mm1.rid = p.rid
               LEFT JOIN mm2 ON mm2.cid = p.cid AND mm2.rid = p.rid
               LEFT JOIN mm3 ON mm3.cid = p.cid AND mm3.rid = p.rid
               LEFT JOIN mm4 ON mm4.cid = p.cid AND mm4.rid = p.rid)
           SELECT cid AS doc_id, rid AS ref_id, c_len, r_len,
             m1 AS m_1, m2 AS m_2, m3 AS m_3, m4 AS m_4,
             CASE WHEN m1 > 0 AND m2 > 0 AND m3 > 0 AND m4 > 0 THEN
               CAST(round((least(0.0, 1.0 - CAST(r_len AS DOUBLE)
                   / CAST(c_len AS DOUBLE))
                 + ($lnTerms) / 4.0) * 1e6) AS BIGINT)
             END AS log_bleu_micro
           FROM base ORDER BY doc_id, ref_id"""
      },

      // decontamination surgery: q77's matched windows become removals and
      // the corpus docs rebuild from surviving tokens (q79's tail)
      "q80_span_scrub" -> {
        val winHash =
          "CAST('0x' || substr(md5(array_to_string(list_slice(toks, i + 1, i + 4), ' ')), 1, 15) AS BIGINT)"
        s"""WITH allt AS (SELECT doc_id, $toks AS toks FROM documents),
           t AS (SELECT doc_id, toks FROM allt WHERE doc_id % 10 <> 0),
           bg AS (SELECT DISTINCT h FROM (
             SELECT unnest(list_transform(range(0, len(toks) - 3), i -> $winHash)) AS h
             FROM allt WHERE doc_id % 10 = 0 AND len(toks) >= 4)),
           wins AS (
             SELECT doc_id, unnest(range(0, len(toks) - 3)) AS i,
               unnest(list_transform(range(0, len(toks) - 3), i -> $winHash)) AS h
             FROM t WHERE len(toks) >= 4),
           rm AS (
             SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS n_removed,
               list_sort(list(DISTINCT p)) AS ps
             FROM (SELECT w.doc_id, unnest(range(w.i, w.i + 4)) AS p
                   FROM wins w JOIN bg USING (h))
             GROUP BY doc_id),
           idx AS (
             SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS p FROM t),
           clean AS (
             SELECT idx.doc_id, string_agg(idx.tok, ' ' ORDER BY idx.p) AS cleaned_text
             FROM idx LEFT JOIN rm ON rm.doc_id = idx.doc_id
             WHERE NOT coalesce(list_contains(rm.ps, idx.p), false)
             GROUP BY idx.doc_id)
           SELECT t.doc_id,
             CAST(len(t.toks) AS BIGINT) AS n_tokens,
             coalesce(rm.n_removed, 0) AS n_removed,
             coalesce(clean.cleaned_text, '') AS cleaned_text
           FROM t LEFT JOIN rm USING (doc_id) LEFT JOIN clean USING (doc_id)
           ORDER BY doc_id"""
      },

      // within-doc segment self-dedup: segment i survives iff its FIRST
      // in-doc occurrence is i — DuckDB's index lambdas are 1-based where
      // Spark's are 0-based, hence position = i directly
      "q93_self_dedup" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           s AS (SELECT doc_id,
               CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                 ELSE list_transform(range(0, CAST(ceil(len(toks) / 5.0) AS BIGINT)),
                   i -> array_to_string(list_slice(toks, i * 5 + 1, i * 5 + 5), ' ')) END AS segs
             FROM t),
           f AS (SELECT doc_id, segs,
               list_filter(segs, (x, i) -> list_position(segs, x) = i) AS kept
             FROM s)
           SELECT doc_id,
             CAST(len(segs) AS BIGINT) AS n_segments,
             CAST(len(segs) - len(kept) AS BIGINT) AS n_removed,
             coalesce(array_to_string(kept, ' '), '') AS dedup_text
           FROM f ORDER BY doc_id""",

      // blocked fuzzy self-join on the name's last token; levenshtein is
      // an exact integer on both engines
      "q95_fuzzy_join" ->
        """WITH p AS (SELECT p_partkey, p_name,
               string_split(p_name, ' ')[-1] || '|' || p_brand AS blk FROM part)
           SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
           FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
           WHERE levenshtein(a.p_name, b.p_name) <= 3
           ORDER BY id_a, id_b""",

      // q20's pruned hashed-shingle universe, containment projections:
      // both one-sided containments + the overlap coefficient, thresholded
      // on the smaller side
      "q97_containment" ->
        s"""WITH sh AS (
             SELECT doc_id AS id, unnest(${hashedShingles(3)}) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents) d),
           filtered AS (
             SELECT id, s FROM (
               SELECT id, s, count(*) OVER (PARTITION BY s) AS df FROM sh) t
             WHERE df <= 50),
           sizes AS (SELECT id, count(*) AS n_sh FROM filtered GROUP BY id),
           pairs AS (
             SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
             FROM filtered a JOIN filtered b ON a.s = b.s AND a.id < b.id
             GROUP BY 1, 2)
           SELECT id_a, id_b, sa.n_sh AS n_a, sb.n_sh AS n_b,
             CAST(shared AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS containment_a,
             CAST(shared AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS containment_b,
             CAST(shared AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) AS overlap
           FROM pairs JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
           WHERE CAST(shared AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.5
           ORDER BY id_a, id_b""",

      // q97's pair universe → per-pair victim (smaller n_sh loses; equal
      // sizes lose the larger id) → anti join: the dedup ACTION
      "q101_containment_dedup" ->
        s"""WITH sh AS (
             SELECT doc_id AS id, unnest(${hashedShingles(3)}) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents) d),
           filtered AS (
             SELECT id, s FROM (
               SELECT id, s, count(*) OVER (PARTITION BY s) AS df FROM sh) t
             WHERE df <= 50),
           sizes AS (SELECT id, count(*) AS n_sh FROM filtered GROUP BY id),
           pairs AS (
             SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
             FROM filtered a JOIN filtered b ON a.s = b.s AND a.id < b.id
             GROUP BY 1, 2),
           flagged AS (
             SELECT id_a, id_b, sa.n_sh AS na, sb.n_sh AS nb
             FROM pairs JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
             WHERE CAST(shared AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.5),
           victims AS (
             SELECT DISTINCT CASE WHEN na < nb OR (na = nb AND id_a > id_b)
               THEN id_a ELSE id_b END AS victim FROM flagged)
           SELECT doc_id, lang, source, n_chars FROM documents
           WHERE doc_id NOT IN (SELECT victim FROM victims)
           ORDER BY doc_id""",

      // two sorted-neighborhood passes (name, reversed name), window 10:
      // pairs within 9 rank steps under either order, then the banded
      // exact distance — both engines rank by the identical total order
      // (sort key, id)
      "q102_sorted_neighborhood" ->
        """WITH r1 AS (SELECT p_partkey AS id, p_name,
               row_number() OVER (ORDER BY p_name, p_partkey) AS rnk FROM part),
           p1 AS (SELECT a.id AS ia, b.id AS ib
                  FROM r1 a JOIN r1 b ON b.rnk - a.rnk BETWEEN 1 AND 9),
           r2 AS (SELECT p_partkey AS id, p_name,
               row_number() OVER (ORDER BY reverse(p_name), p_partkey) AS rnk FROM part),
           p2 AS (SELECT a.id AS ia, b.id AS ib
                  FROM r2 a JOIN r2 b ON b.rnk - a.rnk BETWEEN 1 AND 9),
           u AS (SELECT DISTINCT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b
                 FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2))
           SELECT id_a, id_b, na.p_name AS name_a, nb.p_name AS name_b,
             CAST(levenshtein(na.p_name, nb.p_name) AS BIGINT) AS dist
           FROM u JOIN part na ON na.p_partkey = id_a
                  JOIN part nb ON nb.p_partkey = id_b
           WHERE levenshtein(na.p_name, nb.p_name) <= 3
           ORDER BY id_a, id_b""",

      // q33's bucket + cosine universe → smaller-id-partner victims → anti
      // join: the embedding-dedup action
      "q106_embedding_dedup" -> {
        val planes = (0 until 6).map { p =>
          val hp = graft.functions.Vectors.hyperplane(p, EmbeddingDim)
            .map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_sum(list_transform(range(1, ${EmbeddingDim + 1}), i -> " +
            s"CAST(embedding[i] AS DOUBLE) * ($hp)[i])) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""WITH b AS (SELECT vec_id, embedding, $planes AS bucket FROM embeddings),
           victims AS (
             SELECT DISTINCT c.vec_id AS victim
             FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
             WHERE CASE WHEN sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(range(1, len(a.embedding) + 1), i ->
                           CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                            * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                    END >= 0.35)
           SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
           WHERE vec_id NOT IN (SELECT victim FROM victims)
           ORDER BY vec_id"""
      },

      // q20's hashed-shingle universe: per-doc distinct postings, df = 1
      // marks corpus-unique shingles; novelty is one exact-integer division
      "q108_novelty" ->
        s"""WITH sh AS (
             SELECT doc_id AS id, unnest(${hashedShingles(3)}) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents) d),
           dfr AS (SELECT s, count(*) AS dfc FROM sh GROUP BY s)
           SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_sh,
             CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
             CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS novelty
           FROM sh JOIN dfr USING (s)
           GROUP BY id ORDER BY doc_id""",

      // similarity runs over the (p_name, p_partkey) rank order: adjacent
      // keys within 2 edits link, breaks cumsum into run ids, pairs band
      // at <= 11 positions inside a run, final distance <= 3
      "q114_adaptive_neighborhood" ->
        """WITH r AS (SELECT p_partkey AS id, p_name,
               row_number() OVER (ORDER BY p_name, p_partkey) AS rnk FROM part),
           f AS (SELECT a.id, a.p_name, a.rnk,
               CASE WHEN b.p_name IS NULL OR levenshtein(b.p_name, a.p_name) > 2
                 THEN 1 ELSE 0 END AS brk
             FROM r a LEFT JOIN r b ON b.rnk = a.rnk - 1),
           runs AS (SELECT id, p_name, rnk,
               sum(brk) OVER (ORDER BY rnk) AS run_id FROM f),
           pos AS (SELECT *, rnk - min(rnk) OVER (PARTITION BY run_id) AS pos
                   FROM runs),
           u AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
                 FROM pos a JOIN pos b ON a.run_id = b.run_id
                   AND b.pos - a.pos BETWEEN 1 AND 11)
           SELECT id_a, id_b, na.p_name AS name_a, nb.p_name AS name_b,
             CAST(levenshtein(na.p_name, nb.p_name) AS BIGINT) AS dist
           FROM u JOIN part na ON na.p_partkey = id_a
                  JOIN part nb ON nb.p_partkey = id_b
           WHERE levenshtein(na.p_name, nb.p_name) <= 3
           ORDER BY id_a, id_b""",

      // same md5-fingerprint compare, same null-driven status CASE
      "q122_corpus_diff" ->
        """WITH v1 AS (SELECT doc_id AS id, md5(text) AS old_fp
               FROM documents WHERE doc_id % 7 <> 6),
           v2 AS (SELECT doc_id AS id,
               md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS new_fp
             FROM documents WHERE doc_id % 5 <> 4)
           SELECT coalesce(v1.id, v2.id) AS id,
             CASE WHEN old_fp IS NULL THEN 'added'
                  WHEN new_fp IS NULL THEN 'removed'
                  WHEN old_fp = new_fp THEN 'unchanged'
                  ELSE 'changed' END AS status,
             old_fp, new_fp
           FROM v1 FULL OUTER JOIN v2 ON v1.id = v2.id
           ORDER BY id""",

      // incremental ≡ rebuild for the shingle-df model: the merged df ≥ 2
      // key set must equal the one-pass computation over the whole corpus
      "q123_shingle_stats_update" ->
        s"""WITH shp AS (
             SELECT doc_id AS id, unnest(${hashedShingles(3)}) AS sh
             FROM (SELECT doc_id, $toks AS toks FROM documents) d)
           SELECT sh FROM (SELECT sh, count(*) AS dfc FROM shp GROUP BY sh)
           WHERE dfc >= 2 ORDER BY sh""",

      // identical boundary arithmetic over the ORDERED (not distinct'd)
      // hashed shingles: cut after shingle-end i+2 when key % 32 = 0;
      // token j's chunk = cuts strictly before j; md5 fingerprints and
      // reassembled text hash-match through the shared token order
      "q126_cdc_chunking" -> {
        val orderedKeys =
          s"list_transform(${shingles(3)}, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))"
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           tok AS (SELECT doc_id, unnest(range(0, len(toks))) AS p, toks
                   FROM t WHERE len(toks) > 0),
           flat AS (SELECT doc_id, p, toks[p + 1] AS tok FROM tok),
           shl AS (SELECT doc_id, $orderedKeys AS keys FROM t WHERE len(toks) > 0),
           cuts AS (SELECT doc_id,
               list_filter(list_transform(range(0, len(keys)),
                 i -> CASE WHEN keys[i + 1] % 32 = 0 THEN i + 2 ELSE -1 END),
                 x -> x >= 0) AS cs
             FROM shl),
           asg AS (SELECT f.doc_id, f.p, f.tok,
               coalesce(len(list_filter(c.cs, x -> x < f.p)), 0) AS chunk_idx
             FROM flat f LEFT JOIN cuts c USING (doc_id))
           SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             CAST(count(*) AS BIGINT) AS n_tok,
             md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_fp,
             string_agg(tok, ' ' ORDER BY p) AS chunk_text
           FROM asg GROUP BY doc_id, chunk_idx
           ORDER BY doc_id, chunk_idx"""
      },

      // q126's chunk chain instantiated for v1 and the edited v2, joined
      // on (doc, fingerprint): reuse counts are exact integers, the
      // fraction one IEEE division
      "q127_chunk_reuse" -> {
        def toksOf(e: String) =
          s"list_filter(string_split(trim(regexp_replace(lower($e), '\\s+', ' ', 'g')), ' '), x -> len(x) > 0)"
        def chain(tag: String, e: String) =
          s"""t$tag AS (SELECT doc_id, ${toksOf(e)} AS toks FROM documents),
             tok$tag AS (SELECT doc_id, unnest(range(0, len(toks))) AS p, toks
                         FROM t$tag WHERE len(toks) > 0),
             flat$tag AS (SELECT doc_id, p, toks[p + 1] AS tok FROM tok$tag),
             shl$tag AS (SELECT doc_id,
                 list_transform(${shingles(3)}, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS keys
               FROM t$tag WHERE len(toks) > 0),
             cuts$tag AS (SELECT doc_id,
                 list_filter(list_transform(range(0, len(keys)),
                   i -> CASE WHEN keys[i + 1] % 32 = 0 THEN i + 2 ELSE -1 END),
                   x -> x >= 0) AS cs
               FROM shl$tag),
             asg$tag AS (SELECT f.doc_id, f.p, f.tok,
                 coalesce(len(list_filter(c.cs, x -> x < f.p)), 0) AS chunk_idx
               FROM flat$tag f LEFT JOIN cuts$tag c USING (doc_id)),
             fps$tag AS (SELECT DISTINCT doc_id, fp FROM (
               SELECT doc_id, chunk_idx, md5(string_agg(tok, ' ' ORDER BY p)) AS fp
               FROM asg$tag GROUP BY doc_id, chunk_idx))"""
        s"""WITH ${chain("1", "text")},
           ${chain("2", "CASE WHEN doc_id % 3 = 0 THEN 'totally new ' || text ELSE text END")}
           SELECT f2.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN f1.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             CAST(sum(CASE WHEN f1.fp IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS reuse_frac
           FROM fps2 f2 LEFT JOIN fps1 f1 ON f1.doc_id = f2.doc_id AND f1.fp = f2.fp
           GROUP BY f2.doc_id ORDER BY f2.doc_id"""
      },

      // two unrolled symmetric mutual-best rounds over q95's pair
      // universe: mirror each pair into its directed copies, rank within
      // entity, keep pairs whose BOTH copies rank first, drop every pair
      // touching a matched entity, repeat on the residue
      "q129_best_match" -> {
        def round(i: Int, src: String) =
          s"""d$i AS (SELECT id_a AS e, id_b AS p, dist FROM $src
                      UNION ALL SELECT id_b, id_a, dist FROM $src),
             r$i AS (SELECT e, p, dist, least(e, p) AS pa, greatest(e, p) AS pb,
                 row_number() OVER (PARTITION BY e ORDER BY dist, p) AS rn
               FROM d$i),
             h$i AS (SELECT *, CASE WHEN sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY pa, pb) = 2 THEN 1 ELSE 0 END AS hit
               FROM r$i),
             x$i AS (SELECT *, max(em) OVER (PARTITION BY pa, pb) AS dead FROM
               (SELECT *, max(hit) OVER (PARTITION BY e) AS em FROM h$i) t),
             m$i AS (SELECT pa AS id_a, pb AS id_b, dist FROM x$i
                     WHERE hit = 1 AND e = pa),
             s$i AS (SELECT pa AS id_a, pb AS id_b, dist FROM x$i
                     WHERE dead = 0 AND e = pa)"""
        s"""WITH pairs AS (
             SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
             FROM (SELECT p_partkey, p_name,
                     string_split(p_name, ' ')[-1] || '|' || p_brand AS blk FROM part) a
             JOIN (SELECT p_partkey, p_name,
                     string_split(p_name, ' ')[-1] || '|' || p_brand AS blk FROM part) b
               ON a.blk = b.blk AND a.p_partkey < b.p_partkey
             WHERE levenshtein(a.p_name, b.p_name) <= 3),
           ${round(1, "pairs")},
           ${round(2, "s1")}
           SELECT id_a, id_b, dist, CAST(1 AS BIGINT) AS round FROM m1
           UNION ALL
           SELECT id_a, id_b, dist, CAST(2 AS BIGINT) AS round FROM m2
           ORDER BY id_a, id_b"""
      },

      // q33's bucket mirror + q65's quantizer mirror, then pure BIGINT:
      // per-dim bucket sums, n²-scaled distances, (d2, id) argmin
      "q131_bucket_representatives" -> {
        val planes = (0 until 6).map { p =>
          val hp = graft.functions.Vectors.hyperplane(p, EmbeddingDim)
            .map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_sum(list_transform(range(1, ${EmbeddingDim + 1}), i -> " +
            s"CAST(embedding[i] AS DOUBLE) * ($hp)[i])) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""WITH m AS (
             SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
             FROM embeddings),
           qz AS (
             SELECT vec_id, $planes AS bucket,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
                 * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END) + 0.5) AS BIGINT)) AS q
             FROM m),
           sums AS (
             SELECT bucket, i, CAST(sum(q[i]) AS BIGINT) AS s
             FROM qz, range(1, ${EmbeddingDim + 1}) t(i)
             GROUP BY bucket, i),
           sl AS (SELECT bucket, list(s ORDER BY i) AS sv FROM sums GROUP BY bucket),
           cnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM qz GROUP BY bucket),
           d AS (
             SELECT z.vec_id, z.bucket, c.n,
               CAST(list_sum(list_transform(range(1, ${EmbeddingDim + 1}),
                 i -> (c.n * z.q[i] - s.sv[i]) * (c.n * z.q[i] - s.sv[i]))) AS BIGINT) AS d2
             FROM qz z JOIN sl s ON s.bucket = z.bucket JOIN cnt c ON c.bucket = z.bucket)
           SELECT bucket, vec_id AS rep_id, d2 AS dist2, n FROM d
           QUALIFY row_number() OVER (PARTITION BY bucket ORDER BY d2, vec_id) = 1
           ORDER BY bucket"""
      },

      // the binary-path dedup is exactly checkable WITHOUT the bytes:
      // synthesizeBmp is pure in (seed, dims) and the fingerprint exact
      // over the bytes, so fp-groups ≡ seed-groups — the oracle groups by
      // the seed expression; collisions, nondeterminism, or codec drift
      // all break the keep_id/n_copies hash
      "q135_image_dedup" ->
        """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
           FROM documents
           GROUP BY doc_id - doc_id % 3
           ORDER BY keep_id""",

      // q126's chunk chain + global first-occurrence attribution per
      // fingerprint + per-source rollup; uniqueness one IEEE division
      "q143_dedup_yield" -> {
        val orderedKeys =
          s"list_transform(${shingles(3)}, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))"
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           tok AS (SELECT doc_id, unnest(range(0, len(toks))) AS p, toks
                   FROM t WHERE len(toks) > 0),
           flat AS (SELECT doc_id, p, toks[p + 1] AS tok FROM tok),
           shl AS (SELECT doc_id, $orderedKeys AS keys FROM t WHERE len(toks) > 0),
           cuts AS (SELECT doc_id,
               list_filter(list_transform(range(0, len(keys)),
                 i -> CASE WHEN keys[i + 1] % 32 = 0 THEN i + 2 ELSE -1 END),
                 x -> x >= 0) AS cs
             FROM shl),
           asg AS (SELECT f.doc_id, f.p, f.tok,
               coalesce(len(list_filter(c.cs, x -> x < f.p)), 0) AS chunk_idx
             FROM flat f LEFT JOIN cuts c USING (doc_id)),
           ch AS (SELECT doc_id, chunk_idx, CAST(count(*) AS BIGINT) AS n_tok,
               md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_fp
             FROM asg GROUP BY doc_id, chunk_idx),
           own AS (SELECT doc_id, n_tok,
               row_number() OVER (PARTITION BY chunk_fp ORDER BY doc_id, chunk_idx) = 1 AS o
             FROM ch)
           SELECT d.source, CAST(count(DISTINCT o.doc_id) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN o.o THEN n_tok ELSE 0 END) AS BIGINT) AS unique_tokens,
             CAST(sum(CASE WHEN o.o THEN n_tok ELSE 0 END) AS DOUBLE)
               / CAST(sum(n_tok) AS DOUBLE) AS uniqueness
           FROM own o JOIN documents d USING (doc_id)
           GROUP BY d.source ORDER BY d.source"""
      },

      // the same hashed-shingle universe as the whole inverted-index
      // family; distinct (source, key) first, equi-join on the key,
      // G-row size table joined back
      "q148_corpus_similarity" ->
        s"""WITH gsh AS (
             SELECT DISTINCT source AS g, sh FROM (
               SELECT source, unnest(${hashedShingles(3)}) AS sh
               FROM (SELECT source, $toks AS toks FROM documents) d) t),
           sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM gsh GROUP BY g),
           x AS (SELECT a.g AS g_a, b.g AS g_b, CAST(count(*) AS BIGINT) AS n_common
                 FROM gsh a JOIN gsh b ON a.sh = b.sh AND a.g < b.g
                 GROUP BY 1, 2)
           SELECT g_a, g_b, sa.n AS n_a, sb.n AS n_b, n_common,
             CAST(n_common AS DOUBLE)
               / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
           FROM x JOIN sz sa ON x.g_a = sa.g JOIN sz sb ON x.g_b = sb.g
           ORDER BY g_a, g_b""",

      // winnowing over POSITIONAL hashes (no list_distinct before the
      // windowed min — order matters), window w = 8, shingle 3
      "q151_winnowing" ->
        s"""WITH d AS (
             SELECT doc_id, list_transform(${shingles(3)},
               s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS ks
             FROM (SELECT doc_id, $toks AS toks FROM documents) t)
           SELECT doc_id, fp FROM (
             SELECT doc_id, unnest(list_distinct(list_transform(
               range(0, greatest(len(ks) - 8, 0) + 1),
               i -> list_min(list_slice(ks, CAST(i + 1 AS INTEGER),
                 CAST(i + 8 AS INTEGER)))))) AS fp
             FROM d WHERE len(ks) > 0) f
           ORDER BY doc_id, fp""",

      // the k-min selection replayed literally: per-group rank over the
      // distinct hashed shingles, then the pair union's k smallest
      "q154_kmv_similarity" ->
        s"""WITH gsh AS (
             SELECT DISTINCT source AS g, sh FROM (
               SELECT source, unnest(${hashedShingles(3)}) AS sh
               FROM (SELECT source, $toks AS toks FROM documents) d) t),
           sk AS (SELECT g, sh FROM (
               SELECT g, sh, row_number() OVER (PARTITION BY g ORDER BY sh) AS rn
               FROM gsh) t
             WHERE rn <= 128),
           gs AS (SELECT DISTINCT g FROM sk),
           pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a, gs b WHERE a.g < b.g),
           u AS (SELECT p.ga, p.gb, s.sh, CAST(count(*) AS BIGINT) AS sides
                 FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
                 GROUP BY 1, 2, 3),
           r AS (SELECT ga, gb, sides,
                   row_number() OVER (PARTITION BY ga, gb ORDER BY sh) AS rn
                 FROM u)
           SELECT ga AS g_a, gb AS g_b, CAST(count(*) AS BIGINT) AS n_union_k,
             CAST(sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS est_jaccard
           FROM r WHERE rn <= 128 GROUP BY ga, gb ORDER BY g_a, g_b""",

      // the q135 argument for audio: synthesizeWav pure in the seed +
      // exact frame-energy fingerprint ⇒ fp-groups ≡ seed-groups
      "q165_audio_dedup" ->
        """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
           FROM documents
           GROUP BY doc_id - doc_id % 4
           ORDER BY keep_id""",

      // q18's banding CTEs with NO threshold (the full candidate
      // universe), verified by exact Jaccard over the shared hashed
      // 60-bit shingle space, then the <= 11-row survivor curve
      "q181_lsh_sweep" ->
        s"""WITH ex AS (
             SELECT doc_id AS id, unnest(list_distinct(${shingles(3)})) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents) d),
           hv AS (
             SELECT id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h1,
                        ('0x' || substr(md5(s), 9, 8))::BIGINT AS h2,
                        ('0x' || substr(md5(s), 1, 15))::BIGINT AS sh
             FROM ex),
           sig AS (
             SELECT id, [${(0 until 16).map(i => s"min((h1 + $i * h2) % 4294967291)").mkString(", ")}] AS sig
             FROM hv GROUP BY id),
           banded AS (
             SELECT id, unnest(list_transform(range(0, 4), b ->
               CAST(b AS VARCHAR) || ':' || md5(array_to_string(list_slice(sig, b * 4 + 1, b * 4 + 4), '|')))) AS band
             FROM sig),
           cands AS (
             SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id),
           sets AS (SELECT DISTINCT id, sh FROM hv),
           sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM sets GROUP BY id),
           inter AS (
             SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
             FROM cands c
               JOIN sets sa ON sa.id = c.id_a
               JOIN sets sb ON sb.id = c.id_b AND sb.sh = sa.sh
             GROUP BY 1, 2),
           j AS (SELECT coalesce(i.i, 0) AS i, za.sz + zb.sz - coalesce(i.i, 0) AS u
                 FROM cands c
                   LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
                   JOIN sizes za ON za.id = c.id_a
                   JOIN sizes zb ON zb.id = c.id_b
                 WHERE za.sz + zb.sz - coalesce(i.i, 0) > 0),
           hist AS (SELECT CAST(i * 10 // u AS BIGINT) AS decile,
                      CAST(count(*) AS BIGINT) AS n_pairs
                    FROM j GROUP BY 1)
           SELECT decile, n_pairs,
             CAST(sum(n_pairs) OVER (ORDER BY decile DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_ge
           FROM hist ORDER BY decile""",

      // brute-force SEMANTIC oracle: every pair with exact Jaccard >= 1/2
      // over the shared df <= 50 hashed universe — the engine's prefix
      // filter must reproduce it with zero false negatives
      "q182_prefix_join" ->
        s"""WITH ex AS (
             SELECT doc_id AS id, unnest(list_distinct(${shingles(3)})) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents) d),
           hv AS (SELECT DISTINCT id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS sh FROM ex),
           dfs AS (SELECT sh, count(*) AS df FROM hv GROUP BY sh),
           uset AS (SELECT id, hv.sh FROM hv JOIN dfs USING (sh) WHERE df <= 50),
           sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM uset GROUP BY id),
           iv AS (SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
                  FROM uset a JOIN uset b ON b.sh = a.sh AND a.id < b.id
                  GROUP BY 1, 2),
           j AS (SELECT id_a, id_b, inter, za.sz + zb.sz - inter AS uni
                 FROM iv
                   JOIN sizes za ON za.id = iv.id_a
                   JOIN sizes zb ON zb.id = iv.id_b)
           SELECT id_a, id_b, inter, uni FROM j
           WHERE inter * 2 >= uni
           ORDER BY id_a, id_b""",

      // the q135 argument for the PERCEPTUAL hash: synthesizeBmp pure in
      // the seed + every aHash bit an exact integer comparison ⇒
      // hash-groups ≡ seed-groups
      "q188_image_ahash" ->
        """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
           FROM documents
           GROUP BY doc_id - doc_id % 3
           ORDER BY keep_id""",
  )
}
