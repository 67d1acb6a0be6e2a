package graft

import graft.expr.Expr
import graft.functions.{Text, Vectors}
import graft.operators.{Accumulate, AsOf, Dedup, Sessionize, Similarity}
import graft.sources.Tables
import graft.stream.DataStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — the oracle-checked query inventory (SURVEY.md §2).
  *
  * Determinism rules for hash-parity with the DuckDB oracle (FIXTURES.md):
  *  - Money/measure sums go through cents-as-BIGINT (`round(x*100)` per row,
  *    then integer sum) — exact under any partitioning/aggregation order;
  *    a raw double sum is order-dependent in the last ulps and would flake.
  *  - Ratios/averages are single double divisions of exact integers — IEEE
  *    deterministic on both engines.
  *  - All hashing is md5-over-strings — identical hex on both engines.
  *  - `events.ts` is nanosecond parquet; both engines are compared at epoch
  *    milliseconds (BIGINT) to dodge ns/µs truncation differences.
  *  - Every query ends in a total ORDER BY.
  */
object SparkEntry {

  private val C = "cast(round(%s * 100) as bigint)" // cents helper (SQL side)
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Test-corpus embedding dimensionality (TESTDATA: 64-dim float vectors at
    * every sf). Fixed here so LSH hyperplanes bake into the plan with no
    * probing job, and so the oracle SQL can inline the identical planes. */
  val EmbeddingDim = 64

  /** Flagship query (driver smoke-checks rows>0 on sf0.001): revenue per
    * region-nation — a 5-table star join with the two small dims broadcast,
    * partial-agg'd on the fact side before the exchange. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** One entry per implemented operator/capability from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- core relational surface (SURVEY §2.4) ----
    "q01_group_agg" -> q01,
    "q02_filter_pushdown" -> q02,
    "q03_join_agg" -> q03,
    "q04_topk" -> q04,
    "q05_semi_join" -> q05,
    "q06_anti_join" -> q06,
    "q07_set_ops" -> q07,
    "q08_distinct_agg" -> q08,
    "q09_window_topn" -> q09,
    "q10_running_sum" -> q10,
    "q11_lag_lead" -> q11,
    "q12_rollup" -> q12,
    "q27_cube" -> q27,
    "q26_json" -> q26,
    // ---- reference dataflow algebra via the DataStream facade (SURVEY §2.1) ----
    "q13_wordcount" -> q13,
    "q14_tumbling_agg" -> q14,
    "q15_sliding_agg" -> q15,
    "q16_session_agg" -> q16,
    "q29_map_accumulate" -> q29,
    "q41_keyed_accumulate" -> q41,
    // ---- training-data pipeline operators ----
    "q17_dedup_exact" -> q17,
    "q18_minhash_lsh" -> q18,
    "q19_simhash" -> q19,
    "q20_ngram_jaccard" -> q20,
    "q21_cosine_topk" -> q21,
    "q22_ann_lsh" -> q22,
    "q23_langid" -> q23,
    "q24_quality" -> q24,
    "q25_asof_join" -> q25,
    "q28_multimodal" -> q28,
    "q30_approx_distinct" -> q30,
    "q31_grouping_sets" -> q31,
    "q32_nested_groupby" -> q32,
    "q33_embedding_neardup" -> q33,
    "q34_range_join" -> q34,
    "q35_fingerprint" -> q35,
    "q36_ann_ivf" -> q36,
    "q37_asof_native" -> q37,
    "q38_topk_sketch" -> q38,
    "q39_dedup_clusters" -> q39,
    "q40_det_sample" -> q40,
    "q42_decontaminate" -> q42,
    "q43_text_clean" -> q43,
    "q44_split_assign" -> q44,
    "q45_repetition" -> q45,
    "q46_percentiles" -> q46,
    "q47_histogram" -> q47,
    "q48_salted_join" -> q48,
    "q49_simhash_pairs" -> q49,
    "q50_facade_dateparts" -> q50,
    "q51_pii_redact" -> q51,
    "q52_approx_percentiles" -> q52,
    "q53_simhash_salted" -> q53,
    "q54_skewed_salted_join" -> q54,
    "q55_temperature_mix" -> q55,
    "q56_sequence_packing" -> q56,
    "q57_nextfit_packing" -> q57,
    "q58_waterfill_mix" -> q58,
    "q59_pivot" -> q59,
    "q60_bloom_decontaminate" -> q60,
    "q61_canonical_dedup" -> q61,
    "q62_unpivot" -> q62,
    "q63_incremental_dedup" -> q63,
    "q64_outlier_clip" -> q64,
    "q65_embedding_quantize" -> q65,
    "q66_index_update" -> q66,
    "q67_ann_ivf_quantized" -> q67,
    "q68_group_cap" -> q68,
    "q69_interleave" -> q69,
    "q70_subquery" -> q70,
    "q71_dist_windows" -> q71,
    "q72_chunking" -> q72,
    "q73_tfidf" -> q73,
    "q74_shuffle_shard" -> q74,
    "q75_token_budget" -> q75,
    "q76_block_dedup" -> q76,
    "q77_contamination_spans" -> q77,
    "q78_stratified_quota" -> q78,
    "q79_span_dedup" -> q79,
    "q80_span_scrub" -> q80,
    "q81_lm_score" -> q81,
    "q82_lm_lifecycle" -> q82,
    "q83_zorder_key" -> q83,
    "q84_lm_quality_filter" -> q84,
    "q85_cdc_merge" -> q85,
    "q86_scd2_history" -> q86,
    "q87_pagerank" -> q87,
    "q88_inverted_index" -> q88,
    "q89_pmi_colloc" -> q89,
    "q90_bm25" -> q90,
    "q91_funnel" -> q91,
    "q92_cohort_retention" -> q92,
    "q93_self_dedup" -> q93,
    "q94_triangles" -> q94,
    "q95_fuzzy_join" -> q95,
    "q96_weighted_sample" -> q96,
    "q97_containment" -> q97,
    "q98_group_weighted_sample" -> q98,
    "q99_group_topk_sketch" -> q99,
    "q100_random_projection" -> q100,
    "q101_containment_dedup" -> q101,
    "q102_sorted_neighborhood" -> q102,
    "q103_boilerplate_prune" -> q103,
    "q104_gopher_rules" -> q104,
    "q105_kcore" -> q105,
    "q106_embedding_dedup" -> q106,
    "q107_length_batching" -> q107,
    "q108_novelty" -> q108,
    "q109_label_prop" -> q109,
    "q110_rate_anomaly" -> q110,
    "q111_quality_checks" -> q111,
    "q112_pipeline_report" -> q112,
    "q113_weighted_label_prop" -> q113,
    "q114_adaptive_neighborhood" -> q114,
    "q115_global_quantiles" -> q115,
    "q116_core_numbers" -> q116,
    "q117_equidepth_bins" -> q117,
    "q118_leakage_safe_split" -> q118,
    "q119_vocab_update" -> q119,
    "q120_domain_percentile" -> q120,
    "q121_robust_zscore" -> q121,
    "q122_corpus_diff" -> q122,
    "q123_shingle_stats_update" -> q123,
    "q124_trust_propagation" -> q124,
    "q125_cms_frequency" -> q125,
    "q126_cdc_chunking" -> q126,
    "q127_chunk_reuse" -> q127,
    "q128_decayed_score" -> q128,
    "q129_best_match" -> q129,
    "q130_contrastive_negatives" -> q130,
    "q131_bucket_representatives" -> q131,
    "q132_recrawl_suppress" -> q132,
    "q133_distinct_lifecycle" -> q133,
    "q134_batch_assembly" -> q134,
    "q135_image_dedup" -> q135,
    "q136_clustering_coeff" -> q136,
    "q137_trending" -> q137,
    "q138_sorted_export" -> q138,
    "q139_volume_shipping" -> q139,
    "q140_weighted_pagerank" -> q140,
    "q141_grouped_quantiles" -> q141,
    "q142_recency_sample" -> q142,
    "q143_dedup_yield" -> q143,
    "q144_bpe_candidates" -> q144,
    "q145_bpe_rounds" -> q145,
    "q146_auc_exact" -> q146,
    "q147_calibration_bins" -> q147,
    "q148_corpus_similarity" -> q148,
    "q149_ewma_chart" -> q149,
    "q150_blocklist" -> q150,
    "q151_winnowing" -> q151,
    "q152_freq_spectrum" -> q152,
    "q153_corpus_divergence" -> q153,
    "q154_kmv_similarity" -> q154,
    "q155_rank_fusion" -> q155,
    "q156_trimmed_stats" -> q156,
    "q157_oov_rate" -> q157,
    "q158_gini_concentration" -> q158,
    "q159_vocab_growth" -> q159,
    "q160_dataset_card" -> q160,
    "q161_hits" -> q161,
    "q162_seed_distance" -> q162,
    "q163_bpe_train" -> q163,
    "q164_bpe_encode" -> q164,
    "q165_audio_dedup" -> q165,
    "q166_weighted_quantiles" -> q166,
    "q167_embargo_split" -> q167,
    "q168_coverage_select" -> q168,
    "q169_psi_drift" -> q169,
    "q170_spearman" -> q170,
    "q171_ndcg" -> q171,
    "q172_pearson" -> q172,
    "q173_chi_square" -> q173,
    "q174_mutual_info" -> q174,
    "q175_markov_transitions" -> q175,
    "q176_autocorrelation" -> q176,
    "q177_weighted_sssp" -> q177,
    "q178_interval_overlap" -> q178,
    "q179_mmr_select" -> q179,
    "q180_grouped_trend" -> q180,
    "q181_lsh_sweep" -> q181,
    "q182_prefix_join" -> q182,
    "q183_skyline" -> q183,
    "q184_zipf_slope" -> q184,
    "q185_triangle_increment" -> q185,
    "q186_grouped_auc" -> q186,
    "q187_url_hosts" -> q187,
    "q188_image_ahash" -> q188,
    "q189_info_gain" -> q189,
    "q190_survival" -> q190,
    "q191_rendezvous" -> q191,
    "q192_pipeline_e2e" -> q192,
    "q193_brier" -> q193,
    "q194_lift_deciles" -> q194,
    "q195_rolling_distinct" -> q195,
    "q196_ks_test" -> q196,
    "q197_cohort_ltv" -> q197,
    "q198_keyness" -> q198,
    "q199_column_profile" -> q199,
    "q200_fk_audit" -> q200,
    "q201_streaks" -> q201,
    "q202_wow_change" -> q202,
    "q203_rule_attribution" -> q203,
    "q204_shard_balance" -> q204,
    "q205_basket_lift" -> q205,
    "q206_precedence" -> q206,
    "q207_drift_report" -> q207,
    "q208_multiscale_dedup" -> q208,
    "q209_kendall" -> q209,
    "q210_kappa" -> q210,
    "q211_mann_whitney" -> q211,
    "q212_theil_sen" -> q212,
    "q213_benford" -> q213,
    "q214_isotonic" -> q214,
    "q215_cusum" -> q215,
    "q216_conformal" -> q216,
    "q217_jensen_shannon" -> q217,
    "q218_kmeans" -> q218,
    "q219_ivf_exact" -> q219,
    "q220_logrank" -> q220,
    "q221_wilson" -> q221,
    "q222_cmh" -> q222,
    "q223_kmeans_quality" -> q223,
    "q224_rouge" -> q224,
    "q225_bleu" -> q225,
    "q226_literals_mapvalues" -> q226,
    "q227_ivf_lifecycle" -> q227,
    "q228_isotonic_weighted" -> q228,
    "q229_cochran_armitage" -> q229,
    "q230_kruskal_wallis" -> q230,
    "q231_pq_adc" -> q231,
    "q232_ivf_pq" -> q232,
    "q233_anova" -> q233,
    "q234_brown_forsythe" -> q234,
    "q235_friedman" -> q235,
    "q236_ivf_pq_lifecycle" -> q236,
    "q237_jonckheere" -> q237,
    "q238_pq_rotated" -> q238,
  )

  /** Round count for the parameterized BPE lifecycle (q163/q164) — read
    * by BOTH the engine loop and the generated oracle CTE chain, so the
    * recursion is what the gate verifies, not a hand unroll. */
  private val BpeRounds = 4

  // =====================================================================
  // Query implementations
  // =====================================================================

  /** TPC-H Q1 shape: single-pass grouped aggregation over the fact table.
    * Partial (map-side) agg → tiny shuffle of 4-ish groups. */
  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price_c"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q6 shape: selective filter + global agg. The predicate and the
    * 4-column projection must reach the parquet scan (PushedFilters). */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      // to_timestamp honors the UTC session timezone; java.sql.Timestamp
      // .valueOf would parse in the JVM default zone — machine-dependent
      .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_quantity") < 25.0)
      .agg(
        sum(round(col("l_extendedprice") * col("l_discount") * 10000).cast("long")).as("revenue_e4"),
        count(lit(1)).as("n_rows"))

  /** Star join: fact orders ⋈ customer, nation broadcast. */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("o_totalprice"))).as("revenue_c"), count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
  }

  /** Top-k by aggregate: sort + limit after a keyed agg (deterministic
    * tie-break on the key). */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("revenue_c"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue_c"))
      .orderBy(col("revenue_c").desc, col("c_custkey").asc)
      .limit(10)
  }

  /** Semi join (EXISTS). */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).where(col("o_totalprice") > 200000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Anti join (NOT EXISTS). */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Set operations: INTERSECT and EXCEPT with a tag, unioned. */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(s, dir)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
    val withOrders = Tables.orders(s, dir).select(col("o_custkey").as("k")).distinct()
    building.intersect(withOrders).withColumn("tag", lit("has_orders"))
      .union(building.except(withOrders).withColumn("tag", lit("no_orders")))
      .orderBy(col("tag"), col("k"))
  }

  /** Exact distinct aggregation (count_distinct expands to two-phase agg). */
  private def q08(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_suppkey"))

  /** Analytic window function: top-3 orders per customer by rank. */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running (prefix) sum per user — the distributed MapAccumulate
    * (SURVEY §2.1 #5) as an unbounded-preceding window frame. */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), cents(col("value")).as("vc"))
    Accumulate.runningSum(ev, col("vc"),
        Seq(col("user_id")), Seq(col("ts").asc, col("event_id").asc), "running_c")
      .select(col("event_id"), col("user_id"), col("running_c"))
      .orderBy(col("event_id"))
  }

  /** lag/lead analytics per user. */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_event_id"),
        coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_event_id"),
        coalesce(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)), lit(-1L)).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  /** ROLLUP grouping sets. */
  private def q12(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty_c"), col("n_rows"))
      .orderBy(col("flag"), col("status"))

  /** CUBE grouping sets. */
  private def q27(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(cents(col("o_totalprice"))).as("sum_price_c"), count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("sum_price_c"), col("n_orders"))
      .orderBy(col("status"), col("priority"))

  /** JSON extraction from the events.props column. */
  private def q26(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  // ---- reference dataflow algebra via the DataStream facade ----

  /** The reference's canonical word count (WordCountSpec.scala:9-17 shape)
    * over `documents`, through the reified-expression facade:
    * mapConcat (explode) → filter → groupBy → fold. The reducer
    * `key &&& values.length` is rewritten to a native partial-agg count —
    * no group materialization (SURVEY §4.2). */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val docs = DataStream.fromDF[String](
      Tables.documents(s, dir).select(lower(col("text")).as("value")))
    val counts = docs
      .mapConcat(t => t.split("\\s+"))
      .filter(w => !(w === ""))
      .groupBy(w => w)
      .fold(g => Expr.KeyValue(g.key, g.values.length))
    counts.toDF
      .select(col("value.key").as("word"), col("value.value").as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(100)
  }

  /** Tumbling event-time window count via the facade's foldWindow
    * (SURVEY §2.1 #10): assignTimestamps → groupBy → foldWindow, with the
    * `acc + 1` fold rewritten to a native count. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val ev = DataStream.fromDF[(Long, String)](
      Tables.events(s, dir).select(unix_millis(col("ts")).as("_1"), col("event_type").as("_2")))
    val counted = ev
      .assignTimestamps(t => t._1)
      .groupBy(t => t.value._2)
      .foldWindow(graft.windows.WindowAssigner.Tumbling(3600000L), 0L)(t => t._1 + 1L)
    counted.toDF.select(
        col("value.key").as("event_type"),
        col("value.value.window.start").as("ws_ms"),
        col("value.value.value").as("n"))
      .orderBy(col("event_type"), col("ws_ms"))
  }

  /** Sliding windows (2h size / 1h step) — each event counted in both
    * covering windows; the reference's sliding assigner drops windows
    * (its firstStart bug, SURVEY §2.3); Spark's window() is correct. */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val ev = DataStream.fromDF[(Long, String)](
      Tables.events(s, dir).select(unix_millis(col("ts")).as("_1"), col("event_type").as("_2")))
    val counted = ev
      .assignTimestamps(t => t._1)
      .groupBy(t => t.value._2)
      .foldWindow(graft.windows.WindowAssigner.Sliding(7200000L, 3600000L), 0L)(t => t._1 + 1L)
    counted.toDF.select(
        col("value.key").as("event_type"),
        col("value.value.window.start").as("ws_ms"),
        col("value.value.value").as("n"))
      .orderBy(col("event_type"), col("ws_ms"))
  }

  /** Session windows (30 min gap) per user — batch sessionization
    * (the operator the reference declared but never implemented,
    * reference Window.scala:23-26). Output at epoch-ms granularity. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    Sessionize.summarize(Tables.events(s, dir), "user_id", "ts", 1800000L)
      .select(col("user_id"),
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_ms"))

  /** The genuinely-sequential global scan (reference MapAccumulate,
    * SURVEY §2.1 #5): a global running sum through the interpreted
    * single-partition path — the documented scalability cliff; the scalable
    * per-key form is q10. */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val sorted = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), cents(col("value")).as("vc"))
      .repartition(1)
      .sortWithinPartitions(col("ts").asc, col("event_id").asc)
      .select(col("event_id").as("_1"), col("vc").as("_2"))
    val ds = DataStream.fromDF[(Long, Long)](sorted)
    val scanned = ds.mapAccumulate[Long, (Long, Long)](0L) { t =>
      val ns = t._1 + t._2._2
      ns &&& (t._2._1 &&& ns)
    }
    scanned.toDF
      .select(col("value._1").as("event_id"), col("value._2").as("running_c"))
      .orderBy(col("event_id"))
  }

  /** The keyed mapAccumulate through the facade, auto-rewritten: the
    * running-sum accumulate shape compiles to a per-key window frame (ONE
    * exchange on user_id, codegen'd unbounded-preceding sum — `Window` in
    * the plan, no `coalesce(1)`), hash-checked against the same oracle as
    * the hand-written window form (q10). The facade's global q29 remains the
    * documented sequential cliff; this is its scale path. */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val ev = Tables.events(s, dir).select(
      col("event_id").as("_1"), col("user_id").as("_2"),
      unix_millis(col("ts")).as("_3"), cents(col("value")).as("_4"))
    val ds = DataStream.fromDF[(Long, Long, Long, Long)](ev)
    val scanned = ds.mapAccumulateByKey(0L)(t => t._2, t => t._3 &&& t._1) { t =>
      val ns = t._1 + t._2._4
      ns &&& (t._2._1 &&& (t._2._2 &&& ns))
    }
    scanned.toDF.select(
        col("value._1").as("event_id"),
        col("value._2._1").as("user_id"),
        col("value._2._2").as("running_c"))
      .orderBy(col("event_id"))
  }

  // ---- training-data pipeline operators ----

  /** Exact dedup on normalized-text fingerprint. */
  private def q17(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** MinHash + LSH near-duplicate pairs (portable md5 min-hashing). */
  private def q18(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashLsh(Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, k = 16, bands = 4, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash bit vectors (32 bits, portable md5 bit extraction). The hash
    * itself is the checked output — a much stronger parity check than the
    * (usually empty) near-dup pair set. */
  private def q19(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashTable(Tables.documents(s, dir), "doc_id", "text", 32)
      .select(col("id").as("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  /** Exact n-gram Jaccard near-dup pairs with df-bounded candidate
    * generation. */
  private def q20(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("id_a"), col("id_b"))

  /** Brute-force cosine top-k: every 100th vector queries the corpus. */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 0)
    Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed ANN — hash-checked even though the ALGORITHM is
    * approximate, because every step is deterministic: the hyperplanes
    * are plan-time constants (inlined into the oracle as SQL literals,
    * the q33 pattern), the query-directed probe sequence is a pure
    * function of the projection magnitudes, and the exact-cosine re-rank
    * is the q21-established bit-identical double chain. The oracle
    * replays bucket construction + multiprobe + top-k; the recall spec
    * against brute force stays in OperatorsSpec. */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 0)
    Similarity.lshTopK(queries, emb, "vec_id", "embedding", k = 10, planes = 6, tables = 4,
        dim = EmbeddingDim, multiprobe = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Heuristic language ID. */
  private def q23(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** Text quality metrics: token counts, punctuation ratio, mean token
    * length, composite quality score. */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
        Text.punctRatio(col("text")).as("punct_ratio"),
        Text.meanTokenLength(col("text")).as("mean_tok_len"),
        Text.qualityScore(col("text"), stop).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** As-of join: each purchase event picks up the user's most recent click
    * at-or-before it (union-merge implementation — one shuffle, no
    * quadratic range join). */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_event_id"))
    AsOf.join(purchases, clicks, "user_id", "ts", "ts",
        Seq("click_event_id" -> "click_event_id"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        coalesce(col("click_event_id"), lit(-1L)).as("click_event_id"))
      .orderBy(col("event_id"))
  }

  /** Multimodal column plumbing, oracle-checkable slice: documents as opaque
    * binary payloads with typed metadata and deterministic pseudo-decode
    * (the real byte-level decode plumbing lives in
    * [[graft.multimodal.Media]]; the image/audio codecs are stubbed per the
    * container's constraints). */
  private def q28(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (lit(16L) + col("doc_id") % 64 * 8).as("width"),
        (lit(16L) + col("n_chars") % 48 * 8).as("height"),
        (col("n_chars") % 240).cast("double").as("duration_s"))
      .orderBy(col("doc_id"))

  /** Approximate distinct (HLL++) — no oracle (estimator-specific values);
    * rows-only check, with exactness bounds asserted in the spec. */
  private def q30(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** GROUPING SETS through the SQL surface (temp views + spark.sql) — the
    * engine's DSL-first design gets the SQL front for free once views are
    * registered (SURVEY §2.4 "SQL surface"). */
  private def q31(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(s"""
      SELECT coalesce(l_returnflag, 'ALL') AS flag,
             coalesce(l_linestatus, 'ALL') AS status,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      ORDER BY flag, status""")
  }

  /** Nested groupBy through the facade: re-grouping a grouped stream
    * composes keys (reference ComputeGrouping, SURVEY §2.1 #6) — the
    * composite key compiles to one multi-column hash aggregation, ONE
    * shuffle, not two. */
  private def q32(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val li = DataStream.fromDF[(String, String, Double)](
      Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qc")))
    val nested = li.groupBy(t => t._1).groupBy(g => g.value._2)
    val agg = nested.fold(g => Expr.KeyValue(g.key, g.values.length))
    agg.toDF.select(
        col("value.key._1").as("flag"),
        col("value.key._2").as("status"),
        col("value.value").as("n_rows"))
      .orderBy(col("flag"), col("status"))
  }

  /** Embedding near-duplicate pairs via the SCALE path: LSH blocking
    * (plan-time hyperplanes, codegen'd dots) → equi-join on short bucket
    * strings → exact-cosine verify. No quadratic all-pairs join anywhere in
    * the plan — candidate generation is an equi-join whose buckets the
    * oracle reproduces exactly (deterministic hyperplanes inlined as SQL
    * literals), so the approximate operator is still hash-checkable. The
    * exact all-pairs baseline lives in the spec as the recall reference. */
  private def q33(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDup(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.35, planes = 6, dim = EmbeddingDim)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))

  /** Range join: lineitems shipped within 30 days of their order's date —
    * equi-key plus range predicate; the equi conjunct keeps it a hash join
    * (the range alone would be a quadratic broadcast-nested-loop). */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") >= o("o_orderdate") &&
        li("l_shipdate") < o("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_fast_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** IVF-indexed ANN (no oracle — approximate by design; recall asserted
    * against brute force in the spec). */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 0)
    // iterations = 2 exercises the distributed Lloyd refinement (model-row
    // collect only) on the driver gate, not just in specs
    Similarity.ivfTopK(queries, emb, "vec_id", "embedding", k = 10,
        nCentroids = 16, probes = 4, iterations = 2)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The as-of join again, through the engine's OWN operator — custom
    * LogicalPlan + Strategy + SparkPlan (single-pass sorted merge, one
    * shuffle+sort per side). Checked against the same DuckDB ASOF oracle
    * as q25's compositional form. */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"), col("event_id").as("c_eid"))
    AsOf.joinNative(purchases, clicks, "user_id", "c_uid", "ts", "c_ts")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        coalesce(col("c_eid"), lit(-1L)).as("click_event_id"))
      .orderBy(col("event_id"))
  }

  /** Top-k frequent words via the native SpaceSaving sketch aggregate
    * (TypedImperativeAggregate with partial-agg and binary buffer
    * serialization). Run with capacity ≥ distinct keys, where SpaceSaving
    * is provably exact — hash-checkable against the exact oracle; the
    * approximate regime is covered by the spec's error-bound assertions. */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.ensureRegistered(s)
    Tables.documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("w"))
      .agg(call_function("graft_topk", col("w"), lit(20), lit(4096)).as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.item").as("word"), col("t.count").as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
  }

  /** Near-dup deduplication end-to-end: n-gram-Jaccard edges → connected
    * components (iterative min-label propagation) → keep min-id
    * representative per cluster. The oracle computes the same closure with
    * a recursive CTE. */
  private def q39(s: SparkSession, dir: String): DataFrame =
    Dedup.deduplicateNearDups(Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("id"))

  /** Deterministic content-keyed sampling (md5-prefix threshold): the
    * sample is identical across runs, partitionings, and engines — unlike
    * seed-based df.sample(). Stratified: en downsampled to 20%, others 60%. */
  private def q40(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(
        Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 0.2), defaultRate = 0.6)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Decontamination: training docs (doc_id % 10 != 0) containing ≥ half of
    * an eval doc's (doc_id % 10 == 0) distinct shingles — one-sided
    * containment via a bipartite inverted-index join, never all-pairs. */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.crossCorpusOverlap(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("corpus_id"), col("probe_id"))
  }

  /** Corpus cleaning: control chars stripped, whitespace collapsed, trimmed,
    * truncated — per-row narrow transform in the scan stage. */
  private def q43(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.clean(col("text"), 200).as("cleaned"))
      .orderBy(col("doc_id"))

  /** Deterministic 80/10/10 train/val/test assignment — content-keyed, so
    * the split is identical on every rerun and engine (a seed-based split
    * silently contaminates eval on re-execution). */
  private def q44(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.assignSplit(
        Tables.documents(s, dir), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  /** Repetition quality signal: duplicated-n-gram fraction per document
    * (1-gram and 3-gram), the standard boilerplate/degenerate-text filter —
    * per-row expressions over the one-pass native shingler. */
  private def q45(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.repetitionRatio(col("text"), 1).as("rep_1gram"),
        Text.repetitionRatio(col("text"), 3).as("rep_3gram"))
      .orderBy(col("doc_id"))

  /** Exact continuous percentiles (median / p95) per group — Spark
    * `percentile` and DuckDB `quantile_cont` share the linear-interpolation
    * definition, and the inputs are exact cents integers, so the doubles
    * hash-match. Scale note: exact percentile buffers per-group value
    * counts, so at 100 TB the production path is `approx_percentile`
    * (bounded-memory sketch, mergeable) — estimator-specific like q30's
    * HLL, hence exact is the oracle-checkable baseline here. */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    val priceC = "cast(round(l_extendedprice * 100) as bigint)"
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"percentile($priceC, 0.5)").as("p50_c"),
        expr(s"percentile($priceC, 0.95)").as("p95_c"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** The 100 TB twin of [[q46]]: `approx_percentile` (Greenwald-Khanna
    * sketch) instead of exact `percentile`. Exact percentile buffers every
    * per-group value; the GK sketch is bounded-memory and mergeable, so the
    * aggregation stays partial-agg'd at any group size — this is the query
    * a production pipeline runs, with q46 as its oracle-checkable baseline.
    * No DuckDB oracle (sketch internals are estimator-specific, like q30's
    * HLL); the driver records rows-only, and SparkEntrySpec asserts the GK
    * rank-error contract (±n/accuracy ranks) against q46's exact values. */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    val priceC = "cast(round(l_extendedprice * 100) as bigint)"
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile($priceC, 0.5, ${ApproxPercentileAccuracy})").as("p50_c"),
        expr(s"approx_percentile($priceC, 0.95, ${ApproxPercentileAccuracy})").as("p95_c"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** GK sketch accuracy for [[q52]]: rank error ≤ n/accuracy per group. */
  private[graft] val ApproxPercentileAccuracy = 10000

  /** Histogram binning: fixed-width buckets over a measure, count + sum per
    * bucket. Bucket id is integer arithmetic (floor of scaled value) —
    * engine-portable, partial-agg'd, one tiny shuffle. */
  private def q47(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(floor(col("l_quantity") / 10.0).cast("long").as("bucket"),
        cents(col("l_extendedprice")).as("price_c"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("sum_price_c"))
      .orderBy(col("bucket"))

  /** Skew-mitigated join: the salted form must produce EXACTLY the plain
    * join's rows (salting changes partitioning, never semantics) — checked
    * against the plain-join oracle. */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), cents(col("l_quantity")).as("qty_c"))
    val o = Tables.orders(s, dir).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.Skew.saltedJoin(li, o, "l_orderkey", salts = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), sum(col("qty_c")).as("sum_qty_c"))
      .orderBy(col("o_orderpriority"))
  }

  /** SimHash near-dup pairs via pigeonhole multi-block indexing: any pair
    * within Hamming distance 2 agrees exactly on one of 3 blocks, so the
    * blocked candidates equal the brute-force all-pairs set (the oracle) —
    * without ever forming the quadratic join. The bucket cap is explicitly
    * raised above any smoke-corpus size (sf1 scale-up included), so the
    * hot-bucket machinery never engages and salting's two-pass overhead is
    * skipped; [[q53]] is the twin that FORCES the salted path with a
    * binding cap against the same brute-force oracle. */
  private def q49(s: SparkSession, dir: String): DataFrame =
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
  private def q53(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(Tables.documents(s, dir), "doc_id", "text",
        bits = 32, maxDistance = 2, maxBucketSize = 20,
        saltHotBuckets = true)
      .orderBy(col("id_a"), col("id_b"))

  /** Skew-PLANTED salted join — the twin of [[q48]] where salting is the
    * point, not just semantics-preserving: ~70% of orders collapse onto ONE
    * hot customer key, so the unsalted shuffle would put ~70% of the fact
    * table into a single reducer task (the straggler that stalls a 1000-
    * executor stage). [[graft.operators.Skew.saltedJoin]] spreads the hot
    * key across 32 row-uniform sub-keys — OperatorsSpec measures the
    * resulting (key, salt) histogram: max cell ≈ hot/32 — while the result,
    * checked against the plain-join oracle, is unchanged. */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(when(col("o_custkey") % 10 < 7, lit(1L)).otherwise(col("o_custkey")).as("k"),
        cents(col("o_totalprice")).as("price_c"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    graft.operators.Skew.saltedJoin(o, c, "k", salts = 32)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("sum_price_c"))
      .orderBy(col("c_mktsegment"))
  }

  /** Domain-mix temperature resampling (α=0.5, target fraction 0.5): the
    * standard LLM data-mix step — the dominant language's share is capped
    * and rare languages are upweighted relative to their natural mix, with
    * content-keyed (md5-threshold) membership so the resample is identical
    * across runs, partitionings, and engines. The oracle mirrors the
    * count → sqrt-weight → rate → threshold pipeline arithmetic exactly
    * (sqrt is IEEE correctly-rounded on both engines). */
  private def q55(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.temperatureResample(
        Tables.documents(s, dir), "doc_id", "lang", alpha = 0.5, targetFraction = 0.5)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Sequence packing (concat-then-chunk): documents concatenated in
    * doc_id order, token stream chunked into 256-token sequences; each doc
    * gets the (sequence, offset) where it starts and the sequence where it
    * ends. The engine runs the distributed prefix sum
    * ([[graft.operators.Packing]] — per-bucket windows + a tiny bucket-
    * offset broadcast, no global data window); the oracle computes the same
    * assignment with a plain global window cumsum. All-integer arithmetic —
    * hash-exact. */
  private def q56(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packSequences(
        Tables.documents(s, dir).select(col("doc_id"), size(Text.tokens(col("text"))).as("n_toks")),
        "doc_id", "n_toks", budget = 256L, bucketWidth = 100L)
      .orderBy(col("doc_id"))

  /** [[q55]] with EXACT waterfill redistribution (`redistribute = true`,
    * f=0.85 so capping genuinely engages): capped domains' unused budget
    * re-allocates to uncapped ones, so the realized total hits f·N instead
    * of undershooting. The λ solve is closed-form window arithmetic over
    * the counts frame (domains saturate in n/w order — no iteration, no
    * driver collect); the oracle mirrors every double op including the
    * sentinel row and the candidate-validity CASE. */
  private def q58(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.temperatureResample(
        Tables.documents(s, dir), "doc_id", "lang", alpha = 0.5,
        targetFraction = 0.85, redistribute = true)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Greedy NEXT-FIT packing per domain, through the facade's keyed
    * accumulate: documents never straddle sequences — when the current
    * sequence can't fit the next document, a new one starts. The stateful
    * transition is a CONDITIONAL, the shape the window rewrite can't
    * express, so this exercises `mapAccumulateByKey`'s general path (hash-
    * partitioned by lang, sequential per key, the new [[Expr.If]] node on
    * the eval interpreter) — [[q56]] is the concat-then-chunk twin that
    * spans, [[q41]] the window-rewritable twin. Oracle: per-lang recursive
    * CTE computing the identical transition, all-BIGINT. */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val docs = Tables.documents(s, dir).select(
      col("doc_id").as("_1"), col("lang").as("_2"),
      size(Text.tokens(col("text"))).cast("long").as("_3"))
    val ds = DataStream.fromDF[(Long, String, Long)](docs)
    val budget = 128L
    val packed = ds.mapAccumulateByKey((0L, 0L))(t => t._2, t => t._1) { t =>
      val fill = t._1._1
      val seq = t._1._2
      val n = t._2._3
      val newSeq = (fill + n) > budget
      val fill2 = newSeq.ifElse(n, fill + n)
      val seq2 = newSeq.ifElse(seq + 1L, seq)
      val off = newSeq.ifElse[Long](LitLong(0L), fill)
      (fill2 &&& seq2) &&& (t._2._1 &&& (t._2._2 &&& (n &&& (seq2 &&& off))))
    }
    packed.toDF.select(
        col("value._1").as("doc_id"),
        col("value._2._1").as("lang"),
        col("value._2._2._1").as("n_tokens"),
        col("value._2._2._2._1").as("seq_idx"),
        col("value._2._2._2._2").as("seq_off"))
      .orderBy(col("doc_id"))
  }

  /** Facade calendar surface: events bucketed by (day-of-week, hour-of-day)
    * through the Expr date-part nodes — no raw epoch-ms arithmetic in user
    * code. Compiles to native date functions + one partial-agg'd count. */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    val ev = DataStream.fromDF[Long](
      Tables.events(s, dir).select(unix_millis(col("ts")).as("value")))
    val counted = ev
      .map(ts => (ts.msDayOfWeek, ts.msHour))
      .groupBy(t => t)
      .fold(g => Expr.KeyValue(g.key, g.values.length))
    counted.toDF
      .select(col("value.key._1").as("dow"), col("value.key._2").as("hod"),
        col("value.value").as("n"))
      .orderBy(col("dow"), col("hod"))
  }

  /** PII redaction: the corpus has no real PII, so each row is first
    * enriched with a DETERMINISTIC synthetic email/IP/phone built from its
    * doc_id (both engines build the identical string) — the redaction
    * patterns are then genuinely exercised row-by-row against the oracle. */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    val pii = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
      lit(" at 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"), lit(".7"),
      lit(" or +1415555"), pmod(col("doc_id"), lit(10000L)).cast("string"))
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.redactPii(pii).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprints: md5 of normalized text + polynomial rolling
    * hash — both engine-portable, both per-row narrow transforms. */
  private def q35(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.fingerprint(col("text")).as("md5_fp"),
        Text.rollingFingerprint(col("text")).as("roll_fp"))
      .orderBy(col("doc_id"))

  /** Pivot: quantity (cents) per return flag, one column per line status.
    * The pivot values are ENUMERATED — `pivot(col)` without values runs a
    * driver-side distinct collect to discover them, an extra pass over the
    * fact table that a 100 TB pipeline declares away by naming its domain.
    * Map-side partial agg collapses each (flag, status) cell before the
    * one exchange on the group key. */
  private def q59(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"), cents(col("l_quantity")).as("qty_c"))
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("qty_c")))
      .withColumnRenamed("F", "qty_f_c")
      .withColumnRenamed("O", "qty_o_c")
      .orderBy(col("l_returnflag"))

  /** Unpivot (melt): three measure columns → (metric, value) rows, then
    * re-aggregated per (flag, metric). `unpivot` is a zero-shuffle Expand
    * (each input row emits one row per measure in the scan stage); the only
    * exchange is the final group-by. Measures are pre-scaled to exact
    * integers (cents / 1e-4) so the sums are order-independent. */
  private def q62(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"),
        round(col("l_discount") * 10000).cast("long").as("disc_e4"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty_c"), col("price_c"), col("disc_e4")), "metric", "v")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(sum(col("v")).as("total"))
      .orderBy(col("l_returnflag"), col("metric"))

  /** Decontamination through the Bloom-prefilter path: same semantics and
    * the same oracle as q42, but the corpus side never shuffles at full
    * width — a filter built over the eval set's shingle keys drops
    * non-candidate corpus shingles inside the scan stage (see
    * [[Dedup.crossCorpusOverlapBloom]]). Exact output: false positives die
    * in the verify semi-join, false negatives don't exist. */
  private def q60(s: SparkSession, dir: String): DataFrame = {
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
  private def q61(s: SparkSession, dir: String): DataFrame = {
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
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val index = Dedup.dedupIndex(docs.where(col("doc_id") % 5 =!= 0),
      "doc_id", "text", shingleLen = 3, k = 16, bands = 4)
    Dedup.incrementalDedup(index, docs.where(col("doc_id") % 5 === 0),
        "doc_id", "text", shingleLen = 3, k = 16, bands = 4)
      .select(col("id").as("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }

  /** Per-language winsorization of document lengths: lengths below the
    * p05 / above the p95 of their language clamp to the bound — the
    * standard per-domain outlier clip before training. Exact percentile
    * (q46-proven interpolation parity) as the oracle-checkable baseline;
    * [[graft.operators.Outliers.winsorize]] takes `exact = false` for the
    * bounded-memory approx_percentile production path (q52 pattern). The
    * per-lang bounds table broadcasts; the document path never shuffles. */
  private def q64(s: SparkSession, dir: String): DataFrame =
    graft.operators.Outliers.winsorize(
        Tables.documents(s, dir), "lang", "n_chars", lo = 0.05, hi = 0.95)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("v_lo"), col("v_hi"), col("n_chars_clipped"))
      .orderBy(col("doc_id"))

  /** Symmetric int8 quantization of the embedding corpus — the 4× memory
    * cut that keeps a 100 TB ANN probe layer resident. Codes and scale are
    * deterministic on both engines (floor-based rounding — no half-tie
    * divergence), the reconstruction error is a left-to-right double fold;
    * the recall impact of searching over dequantized codes is spec-measured
    * (OperatorsSpec), not guessed. Codes are emitted string-joined: the
    * values, not an array container, are the comparison contract (q19's
    * portability trick). */
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val qs = Vectors.quantizeInt8(col("embedding"))
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), qs.as("_qs"))
      .select(col("vec_id"),
        col("_qs").getField("scale").as("scale"),
        concat_ws(",", col("_qs").getField("q").cast("array<string>")).as("q_str"),
        sqrt(aggregate(
          zip_with(col("embedding"), col("_qs").getField("q"), (x, qi) => {
            val d = x.cast("double") -
              when(col("_qs").getField("scale") > 0.0,
                qi.cast("double") / col("_qs").getField("scale")).otherwise(lit(0.0))
            d * d
          }),
          lit(0.0), (acc, v) => acc + v)).as("recon_err"))
      .orderBy(col("vec_id"))
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
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    // table name keyed by the data dir: building q66 for two dirs in one
    // session must not rebind the earlier DataFrame's lazy table read to
    // the later dir's index (the write is an eager side effect, the read
    // is lazy — with a shared name the second write would win)
    val idxTable = "graft_q66_corpus_index_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
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

  /** Two-stage quantized IVF ANN (no oracle — approximate by design, like
    * q22/q36; the driver records rows-only and the spec measures recall):
    * stage-1 candidate probing over the int8-dequantized corpus (4× less
    * resident memory), stage-2 exact float cosine re-rank of the
    * 3k-deep shortlist via an id equi-join that moves |queries|×shortlist
    * rows, never the corpus. */
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where(col("vec_id") % 100 === 0)
    Similarity.ivfTopKQuantized(queries, emb, "vec_id", "embedding", k = 10,
        nCentroids = 16, probes = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-domain contribution cap: at most 50 docs per language, selected
    * by md5(id) order — content-keyed, so the kept set is identical on
    * both engines and across reruns/partitionings. */
  private def q68(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.capPerGroup(Tables.documents(s, dir), "lang", "doc_id", 50)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Deterministic round-robin interleave across languages — the
    * data-mixing order for a training run (no long single-domain
    * stretches). Integer slot arithmetic over window ranks; the group
    * ranking rides a #groups-row broadcast frame, never a global window
    * over the data. */
  private def q69(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.interleaveByGroup(Tables.documents(s, dir), "lang", "doc_id")
      .select(col("doc_id"), col("lang"), col("order_idx"))
      .orderBy(col("order_idx"))

  /** Correlated subqueries through the SQL surface: EXISTS, NOT EXISTS,
    * and a correlated scalar subquery in one statement — Catalyst
    * decorrelates all three into joins (no per-row re-execution), which is
    * the property that makes subqueries usable at 100 TB. Same SQL runs on
    * both engines. */
  private def q70(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(SubquerySql)
  }

  private val SubquerySql: String =
    """SELECT o_orderkey, o_orderpriority,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0) AS n_heavy
       FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0)
         AND NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
       ORDER BY o_orderkey"""

  /** Distribution-analytic window functions over unique total orders:
    * ntile quartiles, percent_rank, cume_dist — deterministic because the
    * ORDER BY key (cents, orderkey) is unique. */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_c"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("price_c"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** Sliding-window token chunking (size 32, stride 24 → 8-token overlap):
    * the context-window prep step. The 1→n fan-out is a Generate in the
    * scan stage; chunk text and counts are deterministic strings/ints on
    * both engines. */
  private def q72(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(Text.slidingChunks(col("text"), size = 32, stride = 24)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.chunk").as("chunk"), col("c.n_tokens").as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** TF-IDF top-5 keywords per document. Oracle-checked by RANK: the
    * score column itself would be hash-flaky (`ln` is not ulp-identical
    * across engines), but the RANKING both engines derive from the same
    * exact (tf, df, N) integers via the same monotone formula is not —
    * mathematical score ties only occur at equal (tf, df), and those
    * break by term ascending on both sides. Residual risk, quantified:
    * a rank flip needs two UNEQUAL (tf, df) scores within ~1-2 ulp of
    * each other (each libm is ≤1 ulp off), i.e. |Δ|/score ≲ 1e-15 for
    * values whose generic spacing is ≥1e-2 — for the gate's fixed corpora
    * (≈2.5k scored terms/doc-set) that is a ~1e-10 coincidence, and the
    * check is DETERMINISTIC per (corpus, libm) pair: it is verified green
    * on the actual sf0.001/sf0.01 gate data, so it cannot flake run to
    * run, only shift if the corpus or either engine's libm changes.
    * tf/df in the output are the exact integers the score derives from. */
  private def q73(s: SparkSession, dir: String): DataFrame =
    graft.operators.TfIdf.topTerms(Tables.documents(s, dir), "doc_id", "text", k = 5)
      .select(col("id").as("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rank"))

  /** Deterministic shuffle-and-shard: the content-keyed global permutation
    * a training run applies before sharding the corpus across workers —
    * reproducible across runs, engines, and input partitionings. The only
    * wide work is a row_number window partitioned by SHARD (a shard's
    * slice, never the dataset; no global window). */
  private def q74(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.shuffleShard(
        Tables.documents(s, dir).select(col("doc_id")),
        "doc_id", nShards = 8, seed = "r5")
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))

  /** Per-domain token-budget selection: greedy best-first mix assembly —
    * each source contributes its highest-n_chars docs while the kept
    * cumulative token count stays within budget; a doc that would cross
    * the budget is skipped but SCANNING CONTINUES (later smaller docs
    * still fit), which is why this is a per-domain sequential fold
    * (q57's distributed shape) and the oracle a recursive CTE, not a
    * window cumsum. */
  private def q75(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.takeUntilBudget(
        // token counts computed IN THE SCAN: only metadata rides the
        // per-domain exchange and sort — document bodies never shuffle
        // (the operator's own scale note; q56 does the same at its scan)
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"),
          Text.tokenCount(col("text")).as("n_toks")),
        domainCol = "source", idCol = "doc_id",
        scoreCol = col("n_chars"), tokensCol = col("n_toks"),
        budget = 700L)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"), col("kept"))
      .orderBy(col("doc_id"))

  /** Block-level exact substring dedup (Lee-et-al-style span dedup at
    * fixed 10-token block granularity): keep the globally first occurrence
    * of every distinct block, reassemble each doc from its survivors.
    * Keep-first aggregates on 8-byte hashed block keys (partial-agg'd —
    * boilerplate blocks collapse map-side); reassembly is one
    * groupBy(doc). */
  private def q76(s: SparkSession, dir: String): DataFrame =
    Dedup.blockDedup(Tables.documents(s, dir), "doc_id", "text", blockWords = 10)
      .select(col("doc_id"), col("n_blocks"), col("n_kept"), col("dedup_text"))
      .orderBy(col("doc_id"))

  /** Span-level contamination: per training doc, how many 4-token windows
    * also occur in the benchmark slice and what fraction of the doc's
    * token positions they cover — the fine-grained companion to q42/q60's
    * doc-level decontamination (same corpus split). */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.contaminationSpans(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", gramWords = 4)
      .orderBy(col("doc_id"))
  }

  /** Stride-1 exact substring span dedup (Lee-et-al all-but-first at token
    * granularity): duplicated 8-token spans keep only their globally first
    * occurrence; docs rebuilt from surviving tokens. */
  private def q79(s: SparkSession, dir: String): DataFrame =
    Dedup.spanDedup(Tables.documents(s, dir), "doc_id", "text", spanWords = 8)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("cleaned_text"))
      .orderBy(col("doc_id"))

  /** Decontamination surgery: q77's matched spans REMOVED — every corpus
    * token under a 4-token window that occurs in the benchmark slice is
    * cut, docs rebuilt from survivors (same split as q42/q60/q77). */
  private def q80(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Dedup.scrubContaminatedSpans(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", gramWords = 4)
      .orderBy(col("doc_id"))
  }

  /** Corpus-trained bigram LM score per document, in integer micro-nats
    * (exact BIGINT — see [[graft.operators.LmScore]] for why the float
    * log-likelihood is quantized per-term before summing). */
  private def q81(s: SparkSession, dir: String): DataFrame =
    graft.operators.LmScore.bigramScore(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Persisted-LM lifecycle: train the bigram model on 80% of the corpus,
    * write it as bucketed tables, score the held-out 20% AGAINST THE DISK
    * COPY — q81's production split (train once, score forever). OOV mass
    * is exercised for real: the held-out slice contains transitions the
    * model never saw. Table names dir-keyed like q66 (the write is an
    * eager side effect; two dirs in one session must not collide). */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val model = "graft_q82_lm_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    graft.operators.LmScore.writeModel(
      docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text", model)
    graft.operators.LmScore.scoreWith(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text", model)
      .orderBy(col("doc_id"))
  }

  /** Z-order (Morton) clustering key over (l_partkey, l_suppkey) — the
    * layout pass behind multi-dimensional scan pruning
    * ([[graft.sources.Layout]]); exact integer bit-interleave, so the
    * whole layout decision is oracle-checkable. */
  private def q83(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.sources.Layout.zOrderKey(21, col("l_partkey"), col("l_suppkey")).as("zkey"))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))

  /** Bottom-decile LM-quality filter: drop the 10% of documents whose
    * per-bigram average log-likelihood (floor-divided micro-nats — exact
    * integers end to end) ranks lowest. The global ranking is
    * [[graft.operators.Ranking.globalRank]]'s two-level scheme — no
    * single-partition window; zero-bigram docs carry no LM evidence and
    * stay out of the ranking. */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.operators.LmScore
      .bigramScore(Tables.documents(s, dir), "doc_id", "text")
      .where(col("n_bigrams") >= 1)
      // exact floor division: subtract the non-negative pmod, then DIV
      .withColumn("avg_unats",
        expr("(score_unats - pmod(score_unats, n_bigrams)) DIV n_bigrams"))
    val ranked = graft.operators.Ranking
      .globalRank(scored, "avg_unats", bucketWidth = 1000000L, "doc_id")
    ranked
      .crossJoin(broadcast(ranked.agg(count(lit(1)).as("_n"))))
      .withColumn("kept", col("rank") > expr("_n DIV 10"))
      .select(col("doc_id"), col("avg_unats"), col("rank"), col("kept"))
      .orderBy(col("rank"))
  }

  /** Largest-remainder stratified quota: exactly 300 docs allocated across
    * sources within 1 of proportional, each stratum filled in md5(id)
    * order — the apportionment runs on a #strata-row broadcast frame. */
  private def q78(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedQuota(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        stratumCol = "source", idCol = "doc_id", total = 300L)
      .select(col("doc_id"), col("source"), col("quota"), col("kept"))
      .orderBy(col("doc_id"))

  /** CDC MERGE: the events stream read as a changelog over the customer
    * snapshot (latest event per user wins; a trailing 'error' deletes the
    * key, anything else upserts name/balance/segment). Latest-wins is one
    * partial-aggregable max_by, the merge one key-sized full-outer join
    * ([[graft.operators.Cdc]]). */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir).select(
      col("c_custkey"), col("c_name"),
      cents(col("c_acctbal")).as("acctbal_c"), col("c_mktsegment"))
    val changelog = Tables.events(s, dir).select(
      col("user_id").as("c_custkey"),
      unix_millis(col("ts")).as("ms"), col("event_id"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("_op"),
      concat(lit("cdc_"), col("user_id")).as("c_name"),
      cents(col("value")).as("acctbal_c"),
      col("event_type").as("c_mktsegment"))
    val latest = graft.operators.Cdc
      .latestState(changelog, "c_custkey", Seq("ms", "event_id"))
      .drop("ms", "event_id")
    graft.operators.Cdc.merge(base, latest, "c_custkey")
      .orderBy(col("c_custkey"))
  }

  /** SCD-2 history build: each user's event-type change stream compressed
    * to runs and unrolled into versioned validity intervals (valid_to null
    * = open current version) — one per-key window pass
    * ([[graft.operators.Cdc.scd2]]). */
  private def q86(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cdc.scd2(
        Tables.events(s, dir).select(col("user_id"),
          unix_millis(col("ts")).as("ms"), col("event_id"), col("event_type")),
        keyCol = "user_id", seqCol = "ms",
        stateCols = Seq("event_type"), tieCols = Seq("event_id"))
      .orderBy(col("user_id"), col("version"))

  /** Integer fixed-point PageRank over the bipartite part↔supplier graph
    * (supplier nodes offset by 10⁶ into a disjoint id space; edges both
    * directions so mass circulates). 3 damped rounds, exact BIGINT
    * arithmetic end to end ([[graft.operators.Graph]]). */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("p"), (col("l_suppkey") + lit(1000000L)).as("sn"))
    val edges = li.select(col("p").as("src"), col("sn").as("dst"))
      .union(li.select(col("sn").as("src"), col("p").as("dst")))
    graft.operators.Graph.pageRankInt(edges, "src", "dst", iterations = 3)
      .orderBy(col("node"))
  }

  /** Inverted-index boolean retrieval: build the (term, doc_id) index,
    * persist it bucketed on term (dir-keyed name — the write is an eager
    * side effect, like q66/q82), then answer 'join' AND 'stream' AND NOT
    * 'slow' from the disk copy ([[graft.operators.InvertedIndex]]). */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val name = "graft_q88_idx_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    graft.operators.InvertedIndex.writeIndex(docs, "doc_id", "text", name)
    graft.operators.InvertedIndex
      .search(s, name, all = Seq("join", "stream"), none = Seq("slow"))
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** BM25 ranked retrieval off the persisted inverted index (dir-keyed
    * name, q88 lifecycle): top-100 docs for a 3-term query, score
    * quantized per (term, doc) to integer micro-nats BEFORE the per-doc
    * sum — LmScore's exactness scheme applied to relevance ranking
    * ([[graft.operators.InvertedIndex.bm25]]). */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val name = "graft_q90_idx_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    graft.operators.InvertedIndex.writeIndex(docs, "doc_id", "text", name)
    graft.operators.InvertedIndex.bm25(s, name, Seq("join", "window", "fast"))
      .orderBy(col("score_unats").desc, col("doc_id"))
      .limit(100)
  }

  /** Ordered conversion funnel signup → click → purchase, each step
    * within 6 hours of the previous ([[graft.operators.Funnel]]). */
  private def q91(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnel(
      Tables.events(s, dir), "user_id", "event_type", "ts",
      steps = Seq("signup", "click", "purchase"),
      withinMs = Some(6L * 3600 * 1000))
      .orderBy(col("step"))

  /** Weekly cohort retention: users bucketed by the week of their first
    * event, distinct-active counts per (cohort, offset)
    * ([[graft.operators.Retention]]). */
  private def q92(s: SparkSession, dir: String): DataFrame =
    graft.operators.Retention.cohortRetention(Tables.events(s, dir), "user_id", "ts")
      .orderBy(col("cohort_bucket"), col("bucket_offset"))

  /** Top-200 PMI collocations (c_pair >= 5) in integer micro-nats —
    * LmScore's quantize-then-aggregate exactness applied to association
    * mining; top-k is TakeOrdered, not a global sort
    * ([[graft.operators.Colloc]]). */
  private def q89(s: SparkSession, dir: String): DataFrame =
    graft.operators.Colloc.pmi(Tables.documents(s, dir), "doc_id", "text", minCount = 5L)
      .orderBy(col("pmi_unats").desc, col("w1"), col("w2"))
      .limit(200)

  /** WITHIN-document duplicate-segment removal — keep each 5-token
    * segment's first in-doc occurrence; zero-shuffle narrow plan
    * ([[graft.operators.Dedup.selfDedup]]). */
  private def q93(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.selfDedup(Tables.documents(s, dir), "doc_id", "text",
        segWords = 5)
      .orderBy(col("doc_id"))

  /** Exact triangle count of the co-purchase graph (parts linked when they
    * appear in the same order — the market-basket graph; avg part degree
    * ~100 where the co-SUPPLIER graph is near-complete K_n and would count
    * C(n,3) triangles of noise) by degree-ordered orientation
    * ([[graft.operators.Graph.triangleCount]]). */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .select(col("pk").as("src"), col("pk2").as("dst"))
    graft.operators.Graph.triangleCount(edges, "src", "dst")
  }

  /** Record linkage over part names: within-block pairs within 3
    * Levenshtein edits. The block key is COMPOSITE — (name's last token,
    * brand) — the standard multi-attribute blocking move: the noun alone
    * has 8 distinct values over 20k rows (25M candidate pairs at sf0.1),
    * the brand refines that 25× while "match within the brand" stays the
    * realistic linkage contract
    * ([[graft.operators.Linkage.blockedFuzzyPairs]]). */
  private def q95(s: SparkSession, dir: String): DataFrame =
    graft.operators.Linkage.blockedFuzzyPairs(
        Tables.part(s, dir), "p_partkey", "p_name",
        blockKey = concat_ws("|",
          element_at(split(col("p_name"), " "), -1), col("p_brand")),
        maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** Deterministic weighted sampling without replacement: 80 documents
    * drawn proportional to n_chars, Efraimidis–Spirakis keys in integer
    * micro-nats ([[graft.operators.Sampling.weightedSample]]). */
  private def q96(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 80, seed = "q96")
      .orderBy(col("key_unats"), col("doc_id"))

  /** Doc-in-doc containment pairs (overlap coefficient >= 0.5) over the
    * same pruned hashed-shingle universe as q20
    * ([[graft.operators.Dedup.containmentPairs]]). */
  private def q97(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.containmentPairs(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("id_a"), col("id_b"))

  /** Stratified weighted sampling: 20 documents per source, drawn
    * proportional to n_chars within each source — q96's keys ranked by a
    * per-stratum window ([[graft.operators.Sampling.weightedSamplePerGroup]]). */
  private def q98(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSamplePerGroup(
        Tables.documents(s, dir).select(col("source"), col("doc_id"), col("n_chars")),
        "source", "doc_id", "n_chars", k = 20, seed = "q98",
        // the exact two-level de-skew path (bucketed pre-thin → re-rank):
        // output is provably identical to the single-window form, so the
        // oracle — which mirrors the single window — gates the equivalence
        buckets = 8)
      .orderBy(col("source"), col("rank"))

  /** The containment dedup ACTION: drop every doc contained (overlap >=
    * 0.5) in a larger partner — smaller side loses, equal sizes lose the
    * larger id ([[graft.operators.Dedup.containmentDedup]]). */
  private def q101(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.containmentDedup(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Brute-force cosine top-10 in a Johnson–Lindenstrauss 64→16
    * projection of the embeddings — both engines build the IDENTICAL
    * plan-time matrix (the oracle inlines it as SQL literals, q33's
    * pattern), so the projected ranking is exactly mirrored
    * ([[graft.operators.Similarity.randomProject]]). */
  private def q100(s: SparkSession, dir: String): DataFrame = {
    val proj = graft.operators.Similarity.randomProject(
      Tables.embeddings(s, dir), "embedding", outDim = 16, dim = EmbeddingDim)
    val queries = proj.where(col("vec_id") % 100 === 0)
    Similarity.bruteForceTopK(queries, proj, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** PER-GROUP heavy hitters: q38's SpaceSaving sketch as a grouped
    * aggregate — one bounded-memory summary per language, partial-agg'd
    * map-side like any native aggregate (the per-group state is the
    * sketch's capacity, never the group's vocabulary). Capacity 4096 >>
    * per-lang vocab here, the provably-exact regime, so the oracle is the
    * exact per-group top-10. */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.ensureRegistered(s)
    Tables.documents(s, dir)
      .select(col("lang"), explode(Text.tokens(col("text"))).as("w"))
      .groupBy(col("lang"))
      .agg(call_function("graft_topk", col("w"), lit(10), lit(4096)).as("tk"))
      .select(col("lang"), explode(col("tk")).as("t"))
      .select(col("lang"), col("t.item").as("word"), col("t.count").as("cnt"))
      .orderBy(col("lang"), col("cnt").desc, col("word"))
  }

  /** Multi-pass sorted-neighborhood linkage over part names — the
    * recall-preserving alternative to q95's attribute blocking: pass 1
    * sorts by the name (prefix typos land adjacent), pass 2 by the
    * REVERSED name (suffix typos), window 10, distance ≤ 3. Candidate
    * blocks are rank-derived and fixed-size — skew-immune
    * ([[graft.operators.Linkage.sortedNeighborhoodPairs]]). */
  private def q102(s: SparkSession, dir: String): DataFrame =
    graft.operators.Linkage.sortedNeighborhoodPairs(
        Tables.part(s, dir), "p_partkey", "p_name",
        passes = Seq(
          (col("p_name"), substring(col("p_name"), 1, 2)),
          (reverse(col("p_name")), substring(reverse(col("p_name")), 1, 2))),
        window = 10, maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** Corpus-adaptive boilerplate pruning: tokens in ≥ 78% of documents
    * are template filler — discover them from document frequency (integer
    * cross-multiply threshold) and strip them from every document,
    * preserving token order ([[graft.operators.Boilerplate]]). */
  private def q103(s: SparkSession, dir: String): DataFrame =
    graft.operators.Boilerplate.pruneHighDfTokens(
        Tables.documents(s, dir), "doc_id", "text", dfNum = 78, dfDen = 100)
      .orderBy(col("doc_id"))

  /** Gopher-style composite quality rule filter: token-count bounds, mean
    * token length bounds, bigram repetition cap, and a function-word
    * requirement — per-rule verdicts plus the conjunction
    * ([[graft.operators.QualityRules.gopherFilter]]). */
  private def q104(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityRules.gopherFilter(
        Tables.documents(s, dir), "doc_id", "text",
        minTokens = 30, maxTokens = 80,
        minMeanLen = 4.0, maxMeanLen = 4.8,
        repN = 2, maxRepetition = 0.05,
        stopwords = Seq("the", "a", "of", "and", "is", "to", "in", "that"),
        minStopHits = 2)
      .orderBy(col("doc_id"))

  /** The 68-core of the co-purchase graph (q94's edge universe): peel
    * parts with fewer than 68 robust co-purchase partners until the
    * unique fixpoint ([[graft.operators.Graph.kCore]]). The oracle
    * replays the identical peels, unrolled. */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .select(col("pk").as("src"), col("pk2").as("dst"))
    graft.operators.Graph.kCore(edges, "src", "dst", k = 68, maxRounds = 12)
      .orderBy(col("node"))
  }

  /** The embedding-dedup ACTION over q33's pair universe: drop every
    * vector with a smaller-id near-duplicate partner (cosine ≥ 0.35 in a
    * shared LSH block) — the SemDeDup keep-one policy, per-pair and
    * single-pass ([[graft.operators.Similarity.embeddingDedup]]). */
  private def q106(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.35, planes = 6, dim = EmbeddingDim)
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .orderBy(col("vec_id"))

  /** Length-bucketed training batches: 16-token-wide length buckets,
    * deterministic md5 shuffle within each, batches of 24 — the padding-
    * waste reduction for sequence training; within-bucket ranking is the
    * no-single-partition [[graft.operators.Ranking.groupedRank]]
    * ([[graft.operators.Batching.lengthBucketBatches]]). */
  private def q107(s: SparkSession, dir: String): DataFrame =
    graft.operators.Batching.lengthBucketBatches(
        Tables.documents(s, dir), "doc_id", "text",
        bucketWidth = 16, batchSize = 24, seed = "batch")
      .orderBy(col("bucket"), col("batch_idx"), col("pos_in_batch"))

  /** Per-document novelty: the fraction of a doc's distinct 3-shingles
    * with corpus df = 1 — the inverse signal of boilerplate, over the
    * same hashed-shingle universe as q20
    * ([[graft.operators.Boilerplate.shingleNovelty]]). */
  private def q108(s: SparkSession, dir: String): DataFrame =
    graft.operators.Boilerplate.shingleNovelty(
        Tables.documents(s, dir), "doc_id", "text", shingleLen = 3)
      .orderBy(col("doc_id"))

  /** Communities on the STRONG co-purchase graph (pairs sharing ≥ 2
    * orders — the weak one-off co-occurrence noise thresholded away): 4 rounds of
    * determinized synchronous label propagation (most frequent neighbor
    * label + self-vote, smallest-label tiebreak) — separates densely-knit
    * regions that connected components (q39's machinery) would merge
    * across weak bridges ([[graft.operators.Graph.labelPropagation]]).
    * Fixed rounds ⇒ a pure function of the graph ⇒ the oracle replays the
    * identical rounds unrolled. */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val strong = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .groupBy(col("pk"), col("pk2")).agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select(col("pk").as("src"), col("pk2").as("dst"))
    graft.operators.Graph.labelPropagation(strong, "src", "dst", rounds = 4)
      .orderBy(col("node"))
  }

  /** Per-user hourly ingestion-rate control chart: z-score vs the
    * trailing 24 non-empty hours, 3σ flag, cold users never alarm
    * ([[graft.operators.Anomaly.hourlyRateAnomalies]]). Every column
    * down to the flagged booleans hash-matches — the sums are exact
    * BIGINTs, the z-arithmetic a fixed IEEE sequence over them. */
  private def q110(s: SparkSession, dir: String): DataFrame =
    graft.operators.Anomaly.hourlyRateAnomalies(
        Tables.events(s, dir), "user_id", "ts",
        sigmas = 3.0, window = 24, minPrior = 6)
      .orderBy(col("user_id"), col("hour"))

  /** Deequ-style declarative data-quality report over lineitem: one
    * audit row per check — not-null, key uniqueness (genuinely violated
    * in this data: (l_orderkey, l_linenumber) fans out), two value
    * ranges (one passing, one binding), and two FKs
    * ([[graft.operators.Checks.validate]]). */
  private def q111(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Checks._
    validate(Tables.lineitem(s, dir), Seq(
      NotNull("l_orderkey"),
      Unique(Seq("l_orderkey", "l_linenumber")),
      InRange("l_quantity", 1.0, 50.0),
      InRange("l_discount", 0.0, 0.05),
      ForeignKey("l_partkey", Tables.part(s, dir), "p_partkey"),
      ForeignKey("l_suppkey", Tables.supplier(s, dir), "s_suppkey")))
  }

  /** The END-TO-END curation pipeline as ONE declarative plan: exact
    * dedup → containment dedup (q101's rule) → Gopher quality rules
    * (q104's thresholds), with a per-stage survival report — the
    * dashboard a curation run actually publishes (who dropped what). All
    * three stages compose the already-oracle-checked operators; the
    * report rows are exact BIGINT counts. The stage frames are
    * localCheckpointed at each fan-out: four count branches over a
    * shared lazy lineage re-ran exact dedup and the containment
    * shingle join once per downstream branch (18 full-width scans of
    * `documents` in the executed plan — at 100 TB that is reading the
    * corpus ~18× to emit 3 rows); checkpointing s1/s2 caps the plan at
    * the two scans the algebra needs. */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val s1 = docs.join(
      graft.operators.Dedup.exact(docs, "doc_id", "text").select(col("doc_id")),
      Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val s2 = graft.operators.Dedup.containmentDedup(s1, "doc_id", "text",
      shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .localCheckpoint()
    val s3 = s2.join(
      graft.operators.QualityRules.gopherFilter(s2, "doc_id", "text",
          minTokens = 30, maxTokens = 80, minMeanLen = 4.0, maxMeanLen = 4.8,
          repN = 2, maxRepetition = 0.05,
          stopwords = Seq("the", "a", "of", "and", "is", "to", "in", "that"),
          minStopHits = 2)
        .where(col("keep")).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    def cnt(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as(name))
    cnt(docs, "_n0").crossJoin(cnt(s1, "_n1"))
      .crossJoin(cnt(s2, "_n2")).crossJoin(cnt(s3, "_n3"))
      .select(explode(array(
        struct(lit("1_exact_dedup").as("stage"), col("_n0").as("n_in"),
          (col("_n0") - col("_n1")).as("n_dropped"), col("_n1").as("n_out")),
        struct(lit("2_containment_dedup").as("stage"), col("_n1").as("n_in"),
          (col("_n1") - col("_n2")).as("n_dropped"), col("_n2").as("n_out")),
        struct(lit("3_quality_rules").as("stage"), col("_n2").as("n_in"),
          (col("_n2") - col("_n3")).as("n_dropped"), col("_n3").as("n_out"))))
        .as("_r"))
      .select(col("_r.stage"), col("_r.n_in"), col("_r.n_dropped"), col("_r.n_out"))
      .orderBy(col("stage"))
  }

  /** q109's communities with WEIGHTED votes: the co-purchase graph's
    * natural weights (shared-order counts, threshold ≥ 2) drive the vote
    * histogram, and each node's self-vote weighs its max incident edge
    * (the heavy-pair oscillation damper —
    * [[graft.operators.Graph.labelPropagation]]). Same unrolled-rounds
    * oracle, with weighted sums and a per-node self-weight CTE. */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val strong = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .groupBy(col("pk"), col("pk2")).agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select(col("pk").as("src"), col("pk2").as("dst"), col("w"))
    graft.operators.Graph.labelPropagation(strong, "src", "dst", rounds = 4,
        weightCol = Some("w"))
      .orderBy(col("node"))
  }

  /** ADAPTIVE sorted-neighborhood over part names: the comparison window
    * follows similarity RUNS (adjacent sorted names within 2 edits extend
    * the run; a dissimilar neighbor breaks it), banded at 12 positions —
    * duplicate-dense stretches get the wide neighborhood a fixed window
    * denies them ([[graft.operators.Linkage.adaptiveNeighborhoodPairs]]). */
  private def q114(s: SparkSession, dir: String): DataFrame =
    graft.operators.Linkage.adaptiveNeighborhoodPairs(
        Tables.part(s, dir), "p_partkey", "p_name",
        sortKey = col("p_name"), bucketKey = substring(col("p_name"), 1, 2),
        boundaryDist = 2, maxRun = 12, maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** EXACT global p50/p90/p99/max of l_extendedprice over every lineitem
    * row — rank selection through the distributed two-level order, where
    * a global exact `percentile` aggregate would buffer the whole column
    * in one task ([[graft.operators.Ranking.globalQuantiles]]). Type-1
    * quantiles: each answer is an actual data element, no interpolation
    * to mirror. */
  private def q115(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.globalQuantiles(
        Tables.lineitem(s, dir), "l_extendedprice",
        bucket = expr("CAST(floor(l_extendedprice / 1000.0) AS BIGINT)"),
        idCol = "l_orderkey" /* not unique alone */,
        ps = Seq(0.5, 0.9, 0.99, 1.0))
      .orderBy(col("p"))

  /** CORE NUMBERS of the strong co-purchase graph (q109's ≥2-shared-orders
    * edges): 6 determinized h-index rounds — each part's structural
    * embedding depth, the full degeneracy profile q105 answers one slice
    * of ([[graft.operators.Graph.coreNumbers]]). Fixed rounds ⇒ the
    * oracle replays the identical rounds; convergence is spec-checked
    * separately, not assumed by the gate. */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val strong = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .groupBy(col("pk"), col("pk2")).agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select(col("pk").as("src"), col("pk2").as("dst"))
    graft.operators.Graph.coreNumbers(strong, "src", "dst", rounds = 6)
      .orderBy(col("node"))
  }

  /** Exact equi-depth decile binning of orders by total price — SQL
    * `ntile(10)` semantics bin-for-bin, computed through the distributed
    * two-level rank instead of ntile's SinglePartition window
    * ([[graft.operators.Ranking.equiDepthBins]]); reported as per-bin
    * (count, min, max) so the oracle checks every boundary placement. */
  private def q117(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.equiDepthBins(
        Tables.orders(s, dir)
          .select(cents(col("o_totalprice")).as("price_c"), col("o_orderkey")),
        bucket = expr("price_c DIV 50000"), n = 10,
        col("price_c"), col("o_orderkey"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("price_c")).as("min_c"), max(col("price_c")).as("max_c"))
      .orderBy(col("bin"))

  /** Leakage-safe train/val/test split: the 80/10/10 assignment keyed by
    * the NEAR-DUP CLUSTER representative (q39's components), so a
    * document and its near-duplicate twin can never straddle train and
    * test — q44's failure mode closed
    * ([[graft.operators.Sampling.leakageSafeSplit]]). */
  private def q118(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.leakageSafeSplit(
        Tables.documents(s, dir), "doc_id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        shingleLen = 3, threshold = 0.5, maxShingleDf = 50)
      .orderBy(col("id"))

  /** Incremental boilerplate-vocabulary maintenance — the lifecycle q66
    * gave the dedup index, for [[graft.operators.Boilerplate]]'s df
    * stats: build stats for the base corpus (doc_id % 4 ≠ 0), persist
    * them BUCKETED on tok, absorb the remaining quarter as a batch
    * WITHOUT rescanning the base, and read the ≥50% vocabulary off the
    * merged stats. The oracle computes the same vocabulary from the
    * WHOLE corpus directly — hash-match proves incremental ≡ rebuild. */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.where(col("doc_id") % 4 =!= 0)
    val batch = docs.where(col("doc_id") % 4 === 0)
    // dir-keyed table name — same rationale as q66: the write is an eager
    // side effect, the read lazy; a shared name across dirs would rebind
    val statsTable = "graft_q119_vocab_stats_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    Tables.writeBucketed(
      graft.operators.Boilerplate.dfStats(base, "doc_id", "text"),
      statsTable, buckets = 8, "tok")
    graft.operators.Boilerplate.vocabularyFromStats(
        graft.operators.Boilerplate.updateDfStats(
          s.table(statsTable), batch, "doc_id", "text"),
        dfNum = 50, dfDen = 100)
      .orderBy(col("tok"))
  }

  /** Per-domain quality calibration: the exact within-language
    * percent_rank of every document's length — "top X% of EACH domain" as
    * an exact percentile cut, through the nested two-level rank so a
    * dominant language never serializes one window task
    * ([[graft.operators.Ranking.groupedPercentRank]]). The unique
    * (n_chars, doc_id) tiebreak collapses SQL rank() to row_number(), so
    * DuckDB's own percent_rank over the same key hash-matches. */
  private def q120(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.groupedPercentRank(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", expr("n_chars DIV 256"), col("n_chars"), col("doc_id"))
      .orderBy(col("lang"), col("rank"))

  /** Robust per-group outlier scoring: the Iglewicz–Hoaglin modified
    * z-score (0.6745·(x−median)/MAD) of every lineitem price within its
    * return flag — the heavy-tail-safe outlier gate (a single extreme
    * value cannot move the median the way it moves a mean/stddev z)
    * ([[graft.operators.Outliers.robustZScore]]). Medians are exact
    * interpolated percentiles (q46's quantile_cont parity); score and
    * flag are a fixed IEEE sequence over them. */
  private def q121(s: SparkSession, dir: String): DataFrame =
    graft.operators.Outliers.robustZScore(
        Tables.lineitem(s, dir).select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("price_c"),
          col("l_orderkey"), col("l_linenumber")),
        "l_returnflag", "price_c", sigmas = 3.5)
      .orderBy(col("l_returnflag"), col("price_c"),
        col("l_orderkey"), col("l_linenumber"))

  /** Corpus snapshot diff — the crawl-to-crawl dataset-versioning report
    * ([[graft.operators.Cdc.snapshotDiff]]): v1 drops doc_id ≡ 6 (mod 7),
    * v2 drops ≡ 4 (mod 5) and edits ≡ 0 (mod 3) — so all four statuses
    * (added/removed/changed/unchanged) appear; fingerprints are md5
    * computed in the scan, bodies never shuffle. */
  private def q122(s: SparkSession, dir: String): DataFrame = {
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
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.where(col("doc_id") % 3 =!= 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val statsTable = "graft_q123_shingle_stats_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    Tables.writeBucketed(
      graft.operators.Boilerplate.shingleDfStats(base, "doc_id", "text", 3),
      statsTable, buckets = 8, "sh")
    graft.operators.Boilerplate.sharedKeysFromStats(
        graft.operators.Boilerplate.updateShingleDfStats(
          s.table(statsTable), batch, "doc_id", "text", 3))
      .orderBy(col("sh"))
  }

  /** TRUST PROPAGATION — personalized integer PageRank
    * ([[graft.operators.Graph.pageRankInt]] with a seed set, the
    * TrustRank shape): initial mass and per-round teleport land only on
    * suppliers from two vetted nations; rank measures damped
    * reachability from the trusted set over the part↔supplier graph —
    * the quality-label propagation a curation pipeline runs from known-
    * good domains. Same exact-BIGINT arithmetic as q87, so the unrolled
    * oracle is bit-identical; unreachable nodes sit at exactly 0. */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("p"), (col("l_suppkey") + lit(1000000L)).as("sn"))
    val edges = li.select(col("p").as("src"), col("sn").as("dst"))
      .union(li.select(col("sn").as("src"), col("p").as("dst")))
    val seeds = Tables.supplier(s, dir)
      .where(col("s_nationkey").isin(0, 1))
      .select((col("s_suppkey") + lit(1000000L)).as("node"))
    graft.operators.Graph.pageRankInt(edges, "src", "dst", iterations = 3,
        seeds = Some(seeds))
      .orderBy(col("node"))
  }

  /** Count-min point-frequency service: sketch every token occurrence
    * into a 4×2048 CMS ([[graft.operators.CountMin]]), then estimate
    * each distinct token's frequency off the plan-literal model —
    * Bloom's model-not-data contract for counts. EXACT oracle despite
    * being an approximation: the ESTIMATE is a deterministic function
    * of the input (md5-derived 60-bit keys, splitmix64
    * Kirsch–Mitzenmacher positions, exact BIGINT cell sums), and DuckDB
    * replays the whole pipeline — splitmix64's mod-2⁶⁴ wrap arithmetic
    * emulated in UHUGEINT (xor + floor-div shifts + mul-mod), the
    * signed/unsigned seam closed by width = 2048 being a power of two
    * (floorMod ≡ low 11 bits under either representation). The spec
    * still proves the one-sided ε·N bound and merge linearity. */
  private def q125(s: SparkSession, dir: String): DataFrame = {
    // the 3-shingle universe (thousands of keys at sf0.01 — a real
    // approximation regime for a 4×2048 sketch; the 31-token vocabulary
    // would be trivially exact)
    val sh = Tables.documents(s, dir)
      .select(explode(Text.fastWordShingles(col("text"), 3)).as("s"))
      .select(Dedup.shingleKey(col("s")).as("key"))
    val cms = graft.operators.CountMin.build(sh, "key", depth = 4, width = 2048)
    sh.distinct()
      .withColumn("est_count", cms.estimate(col("key")))
      .orderBy(col("key"))
  }

  /** Content-defined chunking — gear-hash boundaries over the shared
    * hashed-shingle universe (boundary where the 3-shingle key ≡ 0
    * mod 32 → ~32-token chunks): the insertion-robust dedup unit q72's
    * fixed stride cannot give (an early edit shifts every fixed window,
    * but content-defined boundaries downstream of the edit stay put)
    * ([[graft.operators.Chunking.contentDefinedChunks]]). Chunk
    * fingerprints feed exact dedup directly. */
  private def q126(s: SparkSession, dir: String): DataFrame =
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
  private def q127(s: SparkSession, dir: String): DataFrame = {
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

  /** Exponentially time-decayed per-user engagement score in EXACT
    * fixed point — the freshness signal of feed ranking / trending
    * detection, with the libm-pow hazard designed out: dyadic weights
    * `2^(horizon − age)` in half-life steps, BIGINT-only, hard expiry
    * past the horizon ([[graft.operators.Decay.decayedScore]]). One
    * map-side-combinable groupBy, no window, no sequential fold. */
  private def q128(s: SparkSession, dir: String): DataFrame =
    graft.operators.Decay.decayedScore(
        Tables.events(s, dir), "user_id", "ts", "value",
        halfLifeHours = 4, horizonSteps = 20, valueScale = 100L)
      .orderBy(col("user_id"))

  /** Mutual-best-match (reciprocal best hit) entity resolution over
    * q95's blocked fuzzy candidate pairs — two greedy rounds, each
    * entity matched at most once; "best" = smallest edit distance, ties
    * on the partner key ([[graft.operators.Linkage.mutualBestMatch]]).
    * Four windows per round grouped onto two hash exchanges; no joins. */
  private def q129(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.Linkage.blockedFuzzyPairs(
      Tables.part(s, dir), "p_partkey", "p_name",
      blockKey = concat_ws("|",
        element_at(split(col("p_name"), " "), -1), col("p_brand")),
      maxDist = 3)
    graft.operators.Linkage.mutualBestMatch(
        pairs, "id_a", "id_b", "dist", rounds = 2, smallerIsBetter = true)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Contrastive negative sampling — four deterministic pseudo-random
    * negatives per anchor document, drawn from the content-keyed global
    * permutation ([[graft.operators.Sampling.contrastiveNegatives]]).
    * Distributed rank (no single-partition window) + one position
    * equi-join; fully hash-checkable (md5 arithmetic mirrored in SQL). */
  private def q130(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.contrastiveNegatives(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id",
        k = 4, seed = "q130")
      .orderBy(col("doc_id"), col("neg_rank"))

  /** Per-LSH-bucket representative: the member closest to its bucket's
    * centroid, in EXACT integer arithmetic (int8 codes, BIGINT per-dim
    * sums, n²-scaled distances — no float centroid anywhere), so unlike
    * the IVF family this routing layer is fully hash-checkable
    * ([[graft.operators.Similarity.bucketRepresentatives]]). */
  private def q131(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.bucketRepresentatives(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        planes = 6, dim = EmbeddingDim)
      .orderBy(col("bucket"))

  /** TTL re-crawl suppression over a simulated 3-round crawl log (round
    * r at +6r hours carries the docs with doc_id ≡ 0 mod r+1): greedy
    * per-fingerprint admission with a 10-hour TTL — round-1 re-crawls
    * suppressed, round-2 re-admitted and the clock reset
    * ([[graft.operators.Recrawl.suppress]]). */
  private def q132(s: SparkSession, dir: String): DataFrame = {
    val crawls = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, 2)")).as("r"))
      .where(pmod(col("doc_id"), col("r") + 1) === 0)
      .select((col("doc_id") * 10 + col("r")).cast("long").as("crawl_id"),
        col("doc_id"), graft.functions.Text.fingerprint(col("text")).as("fp"),
        (col("r").cast("long") * lit(21600000000L)).as("ts_us"))
    graft.operators.Recrawl.suppress(crawls, "fp", "crawl_id", "ts_us",
        ttlMicros = 10L * 3600000000L)
      .orderBy(col("crawl_id"))
  }

  /** Approximate distinct-count lifecycle (the HLL member of the sketch
    * family, on the q66/q119/q123 persisted-model contract): per-event-
    * type distinct users, built on 80% of the log, persisted bucketed,
    * then a batch absorbed by MERGING SKETCHES ONLY — no base re-scan
    * ([[graft.operators.DistinctSketch]]). Rows-only by design (q30/q52
    * pattern); incremental ≡ rebuild and the error bound are spec'd. */
  private def q133(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val base = events.where(col("event_id") % 5 =!= 0)
    val batch = events.where(col("event_id") % 5 === 0)
    val statsTable = "graft_q133_distinct_stats_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    Tables.writeBucketed(
      graft.operators.DistinctSketch.groupSketches(base, "event_type", "user_id"),
      statsTable, buckets = 4, "event_type")
    graft.operators.DistinctSketch.estimates(
        graft.operators.DistinctSketch.updateSketches(
          s.table(statsTable), batch, "event_type", "user_id"),
        "event_type")
      .orderBy(col("event_type"))
  }

  /** The last mile of the training-data pipeline — batch ASSEMBLY:
    * route documents to 8 worker shards by the content-keyed permutation
    * (q74's assignment), then NEXT-FIT pack each shard's stream into
    * 512-token bins in shuffle order ([[graft.operators.Packing
    * .nextFitPack]]) and report per-bin occupancy. Packing parallelizes
    * across shards with zero global coordination — each worker packs its
    * own slice; token counts ride from the scan (bodies never shuffle). */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val sharded = Tables.documents(s, dir).select(col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("n_toks"),
      graft.operators.Sampling.shardCol(col("doc_id"), 8, "q134").cast("long").as("shard"),
      conv(substring(md5(concat(lit("q134:"), col("doc_id").cast("string"))), 1, 15),
        16, 10).cast("long").as("_skey"))
    graft.operators.Packing.nextFitPack(sharded, "shard", "_skey", "doc_id",
        "n_toks", cap = 512L)
      .groupBy(col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("fill_frac", col("n_tokens").cast("double") / lit(512.0))
      .orderBy(col("shard"), col("bin_id"))
  }

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
  private def q135(s: SparkSession, dir: String): DataFrame = {
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

  /** Global clustering coefficient of the co-purchase graph — q94's
    * triangle core plus the exact wedge sum; C = 3T/W is one IEEE
    * division of exact BIGINTs, so even the double hash-matches
    * ([[graft.operators.Graph.clusteringCoefficient]]). */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .select(col("pk").as("src"), col("pk2").as("dst"))
    graft.operators.Graph.clusteringCoefficient(edges, "src", "dst")
  }

  /** Trending report: q128's decayed scores with a TakeOrdered tail —
    * per-partition top-k heaps + a 20-row driver merge, no global sort
    * (the composition the Decay operator exists for). */
  private def q137(s: SparkSession, dir: String): DataFrame =
    graft.operators.Decay.decayedScore(
        Tables.events(s, dir), "user_id", "ts", "value",
        halfLifeHours = 4, horizonSteps = 20, valueScale = 100L)
      .orderBy(col("score").desc, col("user_id"))
      .limit(20)

  /** Range-clustered sorted export round-trip: orders written as
    * `range=year/` directories, rows in (o_orderdate, o_orderkey) order
    * inside ([[graft.sources.Tables.writeSortedRange]] — deterministic
    * range boundaries, unlike Spark's sampled range partitioner), then
    * read BACK and profiled per range (count, date bounds, cents
    * checksum) — disjoint [d_min, d_max] windows are what make the
    * layout mergeable and partition-prunable. */
  private def q138(s: SparkSession, dir: String): DataFrame = {
    val path = "/tmp/graft_q138_export_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    Tables.writeSortedRange(
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice")),
      path, year(col("o_orderdate")), col("o_orderdate"), col("o_orderkey"))
    s.read.parquet(path)
      .groupBy(col("range").cast("long").as("range"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_orderdate")).as("d_min"), max(col("o_orderdate")).as("d_max"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy(col("range"))
  }

  /** TPC-H Q7 shape — VOLUME SHIPPING: cross-border trade revenue by
    * (supplier nation, customer nation, ship year) over every nation
    * pair. The five-way join exercises Catalyst's join planning
    * end-to-end: the two 25-row nation legs broadcast, supplier and
    * customer hash-join against the fact tables, AQE sizes the rest.
    * Revenue is exact cents-per-row BIGINT (the money rule), discount
    * factor exact at two decimals. */
  private def q139(s: SparkSession, dir: String): DataFrame = {
    // both directions of trade between nations 1 and 2
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
      year(col("l_shipdate")).cast("long").as("l_year"),
      // exact cents: price and discount each exact at 2 decimals →
      // price·(100 − disc·100) is an exact integer per row
      (round(col("l_extendedprice") * 100).cast("long")
        * (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val nations = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"))
    val joined = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nations.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .join(broadcast(nations.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .where(col("snk") =!= col("cnk"))
    joined.groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** WEIGHTED integer PageRank over the strong co-purchase graph (q113's
    * weighted edges, mirrored both directions): rank splits
    * proportionally to co-purchase multiplicity — `rank·w DIV strength`,
    * pure BIGINT, unrolled-rounds oracle (q87/q124 pattern with the
    * weight ratio in the recurrence)
    * ([[graft.operators.Graph.pageRankInt]] with `weightCol`). */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val strong = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .groupBy(col("pk"), col("pk2")).agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
    val both = strong.select(col("pk").as("src"), col("pk2").as("dst"), col("w"))
      .unionAll(strong.select(col("pk2").as("src"), col("pk").as("dst"), col("w")))
    graft.operators.Graph.pageRankInt(both, "src", "dst", iterations = 3,
        weightCol = Some("w"))
      .orderBy(col("node"))
  }

  /** Exact per-source length quantiles by RANK SELECTION — q46's exact
    * percentiles without its per-group value buffer (the documented
    * memory cliff for dominant groups): the p-quantile is the element at
    * within-group rank ⌈p·n_g⌉ through groupedRank's nested two-level
    * scheme — no single-partition exchange, no interpolation arithmetic.
    * The quantiles are RATIONALS and the rank test is pure integer
    * comparison ((r−1)·den < num·n ≤ r·den), so the selection is
    * bit-exact type-1 for EVERY p — immune to the 0.07·100 =
    * 7.000000000000001 double-ceil hazard
    * ([[graft.operators.Ranking.groupedQuantilesRational]]). */
  private def q141(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.groupedQuantilesRational(
        Tables.documents(s, dir).select(col("source"), col("n_chars"), col("doc_id")),
        "source", "n_chars",
        subBucket = expr("(n_chars - pmod(n_chars, 200L)) DIV 200L"),
        idCol = "doc_id", ps = Seq((1L, 4L), (1L, 2L), (9L, 10L)))
      .orderBy(col("source"), col("p"))

  /** RECENCY-weighted panel sampling — 50 users drawn without
    * replacement proportional to their exponentially decayed engagement:
    * q128's exact fixed-point scores feed q96's derandomized
    * Efraimidis–Spirakis keys (the eval-panel / active-user-selection
    * move: heavy-but-stale users decay out of the draw). Pure
    * composition — both stages already oracle-proven; the weight is an
    * exact BIGINT so the only float step is the one quantized ES key. */
  private def q142(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSample(
        graft.operators.Decay.decayedScore(
          Tables.events(s, dir), "user_id", "ts", "value",
          halfLifeHours = 4, horizonSteps = 20, valueScale = 100L)
          .select(col("user_id"), col("score")),
        "user_id", "score", k = 50, seed = "q142")
      .orderBy(col("key_unats"), col("user_id"))

  /** DEDUP-YIELD report — the measurement behind every dedup decision:
    * per source, how many tokens are UNIQUE at content-defined-chunk
    * granularity vs total (a mirrored corpus contributes mass but no
    * unique mass). Chunks via q126's gear-hash chunker; each distinct
    * fingerprint is attributed to its globally FIRST occurrence
    * (doc_id, chunk_idx order), so sources are credited for content
    * they contributed first, not for re-hosting. One window over the
    * fp key + partial-aggregable source rollup; bodies never shuffle
    * (chunking is scan-stage; only (fp, ids, token counts) ride). */
  private def q143(s: SparkSession, dir: String): DataFrame = {
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

  /** BPE merge candidates — the first round of byte-pair-encoding
    * tokenizer training (Sennrich et al., ACL 2016), the corpus-scale
    * part: count adjacent CHARACTER pairs within words, weighted by word
    * frequency, and rank merge candidates. The expensive piece at 100 TB
    * is exactly this counting pass — per-word char bigrams ride one
    * partial-aggregable exchange keyed on the pair (words pre-aggregate
    * to (word, freq) first, so a word's chars are walked once however
    * often it occurs). Pure string/integer ops — hash-exact. Top 20 by
    * (count desc, pair asc). The ITERATIVE trainer (apply top merge,
    * recount) is roadmapped with a marker-encoding design note; round
    * one is where the data-scale work lives. */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      // guard single-char words: sequence(1, 0) would COUNT DOWN, not
      // produce an empty pair list
      .where(length(col("w")) > 1)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(20)
  }

  /** ITERATIVE BPE — two determinized merge rounds: pick the top char
    * pair (q144's counting), APPLY the merge corpus-wide, recount over
    * the merged symbol streams, pick again. The apply step is the
    * engine-portability trick from the roadmap note: every symbol is
    * wrapped in its own marker pair (`␁a␁␁b␁`), so replacing
    * `␁a␁␁b␁ → ␁ab␁` never shares delimiter characters between adjacent
    * matches — plain space-joined symbols DO share the separator and
    * both engines' left-to-right `replace` would skip every second
    * occurrence; RE2 (the oracle's regex engine) has no lookbehind, so
    * markers are the portable route. Greedy left-to-right on runs
    * (`aaa` merges once) — the same rule in both engines by replace()
    * semantics. The merge winner is a 1-row broadcast; each round's
    * counting is one partial-aggregable pair-keyed exchange over the
    * DISTINCT-word universe (words pre-aggregate to (w, freq)). */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val M = "\u0001"
    val words = Tables.documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      // multi-symbol words only; a marker char in the data would corrupt
      // the encoding (deterministically excluded on both engines)
      .where(length(col("w")) > 1 && !col("w").contains(M))
    def topPair(pairs: DataFrame): DataFrame =
      pairs.groupBy(col("a"), col("b"))
        .agg(sum(col("freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(1)
    val pairs1 = words.select(col("freq"), explode(expr(
      "transform(sequence(1, length(w) - 1), i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))"))
      .as("p")).select(col("freq"), col("p.a").as("a"), col("p.b").as("b"))
    val top1 = topPair(pairs1)
    val merged = words.crossJoin(broadcast(
        top1.select(col("a").as("_ma"), col("b").as("_mb"))))
      .withColumn("_enc", regexp_replace(col("w"), "(.)", M + "$1" + M))
      .withColumn("_enc2", call_function("replace", col("_enc"),
        concat(lit(M), col("_ma"), lit(M), lit(M), col("_mb"), lit(M)),
        concat(lit(M), col("_ma"), col("_mb"), lit(M))))
      .withColumn("syms", filter(split(col("_enc2"), M), x => length(x) > 0))
      .where(size(col("syms")) > 1)
    val pairs2 = merged.select(col("freq"), explode(expr(
      "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
      .as("p")).select(col("freq"), col("p.a").as("a"), col("p.b").as("b"))
    val top2 = topPair(pairs2)
    top1.select(lit(1L).as("round"), col("a"), col("b"), col("pair_count"))
      .unionAll(top2.select(lit(2L).as("round"), col("a"), col("b"), col("pair_count")))
      .orderBy(col("round"))
  }

  /** Exact ROC-AUC of an embedding coordinate scoring the even label
    * classes — the filter-model calibration question ("does this score
    * separate the classes?") answered by the Mann–Whitney U statistic
    * with midrank tie handling: ranks ride the two-level distributed
    * rank, ties collapse by ARITHMETIC over per-value min/max ranks, and
    * the AUC is one IEEE division of exact BIGINTs
    * ([[graft.operators.Eval.aucExact]]). */
  private def q146(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.aucExact(
      Tables.embeddings(s, dir),
      scoreCol = element_at(col("embedding"), 2),
      positive = pmod(col("label"), lit(2)) === 0,
      bucket = floor(element_at(col("embedding"), 2).cast("double") * lit(64.0)).cast("long"),
      idCol = col("vec_id"))

  /** Reliability diagram of the same score: 10 exact equi-depth bins
    * (q117's ntile arithmetic) × positive rate — monotone pos_rate is
    * what a calibrated filter score looks like; score bounds are exact
    * min/max, never an order-dependent float mean
    * ([[graft.operators.Eval.calibrationBins]]). */
  private def q147(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.calibrationBins(
      Tables.embeddings(s, dir),
      scoreCol = element_at(col("embedding"), 2),
      positive = pmod(col("label"), lit(2)) === 0,
      bucket = floor(element_at(col("embedding"), 2).cast("double") * lit(64.0)).cast("long"),
      idCol = col("vec_id"), bins = 10)
      .orderBy(col("bin"))

  /** Source×source CORPUS SIMILARITY MATRIX: exact pairwise Jaccard of
    * the per-source distinct-shingle sets over the hashed 60-bit
    * universe — the dataset-level overlap report that decides which
    * sources need cross-deduping before a merge. Pair fan-out is bounded
    * by the source count per shingle, never all-pairs of documents
    * ([[graft.operators.Dedup.corpusSimilarityMatrix]]). */
  private def q148(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.corpusSimilarityMatrix(
        Tables.documents(s, dir), "source", "text", shingleLen = 3)
      .orderBy(col("g_a"), col("g_b"))

  /** Dyadic EWMA control chart over per-user event values — the
    * roadmap-blocked operator landed via DECIMAL(38,0): every term of
    * `kDen²·(x·W−S)² > kNum²·(W·SS−S²)` is an exact integer that DuckDB
    * reproduces in HUGEINT, settling the cross-engine parity the BIGINT
    * form overflowed on. No window function: per-step sums fan out
    * ≤ horizon rows each and partial-aggregate back
    * ([[graft.operators.Decay.ewmaControlChart]]). */
  private def q149(s: SparkSession, dir: String): DataFrame =
    graft.operators.Decay.ewmaControlChart(
        Tables.events(s, dir), "user_id", "ts", "value", "event_id",
        halfLifeHours = 4, horizonSteps = 20, valueScale = 100L,
        kNum = 3L, kDen = 1L)
      .orderBy(col("event_id"))

  /** Blocklist audit: per-document count of matched blocklist phrases
    * (mixed 1/2/3-token phrases), matched as token-boundary shingle
    * equi-joins against the broadcast blocklist — multi-pattern search
    * as an inverted-index join, not a per-row automaton
    * ([[graft.operators.Blocklist.matchReport]]). */
  private def q150(s: SparkSession, dir: String): DataFrame =
    graft.operators.Blocklist.matchReport(
        Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "hash join", "table scan", "merge sort join"))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprints (the MOSS local-fingerprinting algorithm):
    * per-document distinct window-minima over positional shingle hashes
    * — DETERMINISTIC partial-overlap detection (any shared ≥ w+2-token
    * run forces a shared fingerprint), stored at ~2/(w+1) density
    * ([[graft.operators.Dedup.winnowingFingerprints]]). */
  private def q151(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.winnowingFingerprints(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, window = 8)
      .orderBy(col("doc_id"), col("fp"))

  /** Token frequency SPECTRUM (count-of-counts): the corpus Zipf
    * profile — hapax-heavy is healthy, template-heavy inverts it; two
    * partial-aggregable counts, second exchange ≤ √(2·tokens) rows
    * ([[graft.operators.Boilerplate.frequencySpectrum]]). */
  private def q152(s: SparkSession, dir: String): DataFrame =
    graft.operators.Boilerplate.frequencySpectrum(
        Tables.documents(s, dir), "text")
      .orderBy(col("freq"))

  /** Corpus DRIFT between the even- and odd-id document halves (a stand-
    * in for two crawl versions): KL divergence both directions between
    * add-1-smoothed unigram distributions over the union vocabulary, in
    * the quantize-before-sum integer micro-nat scheme — both engines sum
    * identical BIGINTs ([[graft.operators.LmScore.corpusDivergence]]). */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    graft.operators.LmScore.corpusDivergence(
      d.where(pmod(col("doc_id"), lit(2)) === 0),
      d.where(pmod(col("doc_id"), lit(2)) === 1), "text")
  }

  /** q148's similarity matrix from KMV SKETCHES (k smallest distinct
    * shingle keys per source, k = 128): the model-sized approximate path
    * — and because KMV is a deterministic function of the hashes, the
    * ESTIMATE itself hash-matches an oracle replaying the same k-min
    * selection; closeness to the exact matrix is spec-measured
    * ([[graft.operators.Dedup.kmvSimilarityMatrix]]). */
  private def q154(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.kmvSimilarityMatrix(
        Tables.documents(s, dir), "source", "text", shingleLen = 3, k = 128)
      .orderBy(col("g_a"), col("g_b"))

  /** RECIPROCAL RANK FUSION of two document rankings (by length, and by
    * the rolling-fingerprint pseudo-permutation standing in for an
    * embedding system): top-50 by fused score. Both input ranks ride the
    * two-level distributed rank; each reciprocal is quantized to integer
    * micro-units before the exact BIGINT fusion sum; the tail is a
    * TakeOrdered, not a global sort
    * ([[graft.operators.Ranking.reciprocalRankFusion]]). */
  private def q155(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val byLen = graft.operators.Ranking.globalRankBy(
        d.select(col("doc_id"), (-col("n_chars")).as("_neg")),
        expr("_neg DIV 200"), col("_neg"), col("doc_id"))
      .select(col("doc_id"), col("rank"))
    val byFp = graft.operators.Ranking.globalRankBy(
        d.select(col("doc_id"),
          graft.functions.Text.rollingFingerprint(col("text")).as("_fp")),
        expr("_fp DIV 16000000"), col("_fp"), col("doc_id"))
      .select(col("doc_id"), col("rank"))
    graft.operators.Ranking.reciprocalRankFusion(Seq(byLen, byFp), "doc_id", "rank")
      .orderBy(col("rrf_unats").desc, col("doc_id")).limit(50)
  }

  /** Per-source TRIMMED MEAN of document length (10% off each tail by
    * (value, id) order): the robust per-domain summary — rank through
    * groupedRank, integer trim cut, partial-aggregable survivors
    * ([[graft.operators.Ranking.trimmedStats]]). */
  private def q156(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.trimmedStats(
        Tables.documents(s, dir).select(col("source"), col("n_chars"), col("doc_id")),
        "source", "n_chars",
        subBucket = expr("(n_chars - pmod(n_chars, 200L)) DIV 200L"),
        idCol = "doc_id", trimNum = 1L, trimDen = 10L)
      .orderBy(col("source"))

  /** Per-source OUT-OF-VOCABULARY rate against the corpus's own ≥3%-df
    * vocabulary — tokenizer/register fitness by source; the vocabulary
    * is model-sized and broadcasts
    * ([[graft.operators.Boilerplate.oovRate]]). */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    graft.operators.Boilerplate.oovRate(d, "source", "text",
        graft.operators.Boilerplate.highDfTokens(d, "doc_id", "text", 3L, 100L))
      .orderBy(col("source"))
  }

  /** GINI concentration of per-source document counts — the corpus
    * composition red-flag (0 = balanced, →1 = one source dominates);
    * one partial-aggregable count, then pure G-row arithmetic
    * ([[graft.operators.Checks.giniConcentration]]). */
  private def q158(s: SparkSession, dir: String): DataFrame =
    graft.operators.Checks.giniConcentration(Tables.documents(s, dir), "source")

  /** VOCABULARY GROWTH CURVE (Heaps'-law profile) over NESTED md5
    * subsamples at 10% / 50% / 100%: each token type collapses to the
    * minimum document prefix containing it — the exact corpus fraction
    * where it enters the vocabulary — so every rate is a threshold
    * filter over the type table, one tokenized pass total
    * ([[graft.operators.Boilerplate.vocabGrowthCurve]]). */
  private def q159(s: SparkSession, dir: String): DataFrame =
    graft.operators.Boilerplate.vocabGrowthCurve(
        Tables.documents(s, dir), "doc_id", "text", Seq(0.1, 0.5, 1.0))
      .orderBy(col("rate"))

  /** DATASET CARD: the one-glance corpus summary a dataset release
    * ships — doc/token/source/language counts, exact-dup rate, mean
    * length, source-concentration Gini — every number an exact count or
    * one division of exact counts, stacked to (metric, value) rows. */
  private def q160(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val core = d.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size(Text.tokens(col("text"))).cast("long")).cast("double").as("n_tokens"),
      countDistinct(col("source")).cast("double").as("n_sources"),
      countDistinct(col("lang")).cast("double").as("n_langs"),
      countDistinct(Text.fingerprint(col("text"))).cast("double").as("n_unique"))
    val gini = graft.operators.Checks.giniConcentration(d, "source")
      .select(col("gini").as("source_gini"))
    core.crossJoin(gini)
      .select(explode(array(
        struct(lit("dup_rate").as("metric"),
          ((col("n_docs") - col("n_unique")) / col("n_docs")).as("value")),
        struct(lit("mean_tokens").as("metric"),
          (col("n_tokens") / col("n_docs")).as("value")),
        struct(lit("n_docs").as("metric"), col("n_docs").as("value")),
        struct(lit("n_langs").as("metric"), col("n_langs").as("value")),
        struct(lit("n_sources").as("metric"), col("n_sources").as("value")),
        struct(lit("n_tokens").as("metric"), col("n_tokens").as("value")),
        struct(lit("source_gini").as("metric"), col("source_gini").as("value")),
        struct(lit("unique_fp").as("metric"), col("n_unique").as("value"))))
        .as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
      .orderBy(col("metric"))
  }

  /** HITS hubs & authorities over the DIRECTED customer→supplier
    * purchase graph (who-buys-from-whom; suppliers offset into a
    * disjoint id space): hubs = broad buyers, authorities = widely
    * bought-from suppliers. Two max-normalized integer rounds, exact
    * BIGINT end to end, so the unrolled oracle is bit-identical
    * ([[graft.operators.Graph.hitsInt]]). */
  private def q161(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))
    graft.operators.Graph.hitsInt(edges, "src", "dst", iterations = 2)
      .orderBy(col("node"))
  }

  /** Multi-source BFS hop distance from a vetted-nation supplier seed
    * set (nationkey ≡ 3 mod 5 — non-empty at every test scale) over the
    * part↔supplier graph — the crisp "hops from trusted" tier feature
    * next to q124's damped TrustRank mass. 3 hops: seeds 0, their parts
    * 1, co-suppliers 2, second-ring parts 3; unreachable nodes absent
    * ([[graft.operators.Graph.bfsDistances]]). */
  private def q162(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("p"), (col("l_suppkey") + lit(1000000L)).as("sn"))
    val edges = li.select(col("p").as("src"), col("sn").as("dst"))
      .union(li.select(col("sn").as("src"), col("p").as("dst")))
    val seeds = Tables.supplier(s, dir)
      .where(col("s_nationkey") % 5 === 3)
      .select((col("s_suppkey") + lit(1000000L)).as("node"))
    graft.operators.Graph.bfsDistances(edges, "src", "dst", seeds, maxHops = 3)
      .orderBy(col("node"))
  }

  /** PARAMETERIZED BPE training — [[BpeRounds]] merge rounds through the
    * generalized loop ([[graft.operators.Bpe.trainMerges]]); the oracle
    * generates the same number of CTE rounds from the same constant, so
    * q145's two-round unroll graduates to a verified recursion. */
  private def q163(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.trainMerges(s, Tables.documents(s, dir), "text",
        rounds = BpeRounds)
      .orderBy(col("round"))

  /** BPE ENCODE — apply the [[BpeRounds]]-round merge table back to the
    * corpus: per-doc token/char/symbol counts and the chars-per-symbol
    * compression ratio, the tokenizer-fitness number that closes the
    * train→apply lifecycle ([[graft.operators.Bpe.encodeCorpus]]). */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = graft.operators.Bpe.trainMerges(s, docs, "text",
      rounds = BpeRounds)
    graft.operators.Bpe.encodeCorpus(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

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
  private def q165(s: SparkSession, dir: String): DataFrame = {
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

  /** TOKEN-WEIGHTED length quantiles per source — "the median document a
    * TOKEN lives in" (the mixture-weighting view of length: long docs
    * weigh in by their token mass, so the 50%/90% cut points describe
    * token exposure, not document counts). Exact rational selection over
    * the per-(source, n_chars) weight histogram
    * ([[graft.operators.Ranking.weightedQuantilesPerGroup]]). */
  private def q166(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ranking.weightedQuantilesPerGroup(
        Tables.documents(s, dir).select(col("source"), col("n_chars"),
          Text.tokenCount(col("text")).cast("long").as("w")),
        "source", "n_chars", "w",
        subBucket = expr("n_chars DIV 64"),
        ps = Seq((1L, 2L), (9L, 10L)))
      .orderBy(col("source"), col("p"))

  /** Temporal embargo split of the event stream — train on the earliest
    * 70% of the time range, 5%-of-range embargo gap, test after; the
    * profile reports per-(split, event_type) counts, user counts, and
    * exact time bounds so the gap is auditable
    * ([[graft.operators.Sampling.temporalEmbargoSplit]]). */
  private def q167(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.temporalEmbargoSplit(
        Tables.events(s, dir).select(col("event_type"), col("user_id"),
          unix_micros(col("ts")).as("ts_us")),
        "ts_us", trainNum = 7L, trainDen = 10L, embNum = 1L, embDen = 20L)
      .groupBy(col("split"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("ts_us")).as("ts_min"), max(col("ts_us")).as("ts_max"))
      .orderBy(col("split"), col("event_type"))

  /** Greedy MAX-COVERAGE selection — the 5 documents that together cover
    * the most distinct 3-shingles, picked by the submodular greedy
    * ((1−1/e)-optimal); the diversity-seeking complement of the dedup
    * family, oracle-replayed round by round over the shared hashed
    * shingle universe ([[graft.operators.Coverage.maxCoverageSelect]]). */
  private def q168(s: SparkSession, dir: String): DataFrame =
    graft.operators.Coverage.maxCoverageSelect(s,
        Tables.documents(s, dir), "doc_id", "text", shingleLen = 3,
        rounds = 5)
      .orderBy(col("round"))

  /** PSI drift of the event-value distribution, first half of the time
    * range (reference) vs second half (target): 10 exact equi-depth
    * reference bins, add-1-smoothed shares, per-bin micro-nat terms —
    * the scheduled "did my feature move" monitor
    * ([[graft.operators.Checks.psiDrift]]). */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.events(s, dir).select(
      cents(col("value")).as("v"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val mid = t.agg((min(col("us")) +
      expr("(max(us) - min(us)) DIV 2")).as("_mid"))
    val stamped = t.crossJoin(broadcast(mid))
    val ref = stamped.where(col("us") <= col("_mid")).select(col("v"), col("event_id"))
    val tgt = stamped.where(col("us") > col("_mid")).select(col("v"), col("event_id"))
    graft.operators.Checks.psiDrift(ref, tgt, "v", "event_id",
        subBucket = expr("v DIV 5000"), bins = 10)
      .orderBy(col("bin"))
  }

  /** Exact Spearman ρ between document LENGTH and the q24 composite
    * QUALITY score — "is the quality filter just a length filter?", the
    * score-audit a curation pipeline runs before trusting a threshold;
    * midrank ties, centered doubled-rank arithmetic, DECIMAL(38) sums
    * ([[graft.operators.Eval.spearmanExact]]). */
  private def q170(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.spearmanExact(
      Tables.documents(s, dir)
        .select(col("n_chars"), Text.qualityScore(col("text"), stop).as("q")),
      xCol = col("n_chars"), yCol = col("q"),
      xBucket = expr("n_chars DIV 64"),
      yBucket = floor(col("q") * lit(20.0)).cast("long"))
  }

  /** nDCG@20 of the q90 BM25 ranking against term-coverage graded
    * relevance (gain = how many of the 3 query terms the doc contains) —
    * the retrieval-stage report card: does the lexical score ORDER the
    * candidates the way coverage does? Exact micro-unit rank weights,
    * BIGINT DCG/IDCG sums ([[graft.operators.Eval.ndcgAtK]]). */
  private def q171(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val name = "graft_q171_idx_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    graft.operators.InvertedIndex.writeIndex(docs, "doc_id", "text", name)
    val terms = Seq("join", "window", "fast")
    val scored = graft.operators.InvertedIndex.bm25(s, name, terms)
    val gains = docs.select(col("doc_id"),
      terms.map(t => when(array_contains(Text.tokens(col("text")), t), 1L)
        .otherwise(0L)).reduce(_ + _).as("gain"))
    graft.operators.Eval.ndcgAtK(
      scored.join(gains, Seq("doc_id")),
      scoreCol = col("score_unats"), gainCol = col("gain"),
      idCol = col("doc_id"), k = 20)
  }

  /** Exact PEARSON r between document length and the q24 quality score
    * (micro-unit quantized) — read NEXT TO q170's Spearman ρ: ρ ≈ r says
    * the length→quality relation is linear, ρ ≫ r says monotone-but-
    * saturating. One partial-aggregable moment pass, DECIMAL(38) sums
    * ([[graft.operators.Eval.pearsonExact]]). */
  private def q172(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.pearsonExact(
      Tables.documents(s, dir)
        .select(col("n_chars"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6)).as("qu")),
      xCol = col("n_chars"), yCol = col("qu"))
  }

  /** CHI-SQUARED independence of documents' (source × lang) — "does a
    * source over-supply a language?", the stratification-bias probe run
    * before trusting per-source quotas. Exact cross-multiplied cell
    * deviations, micro-unit terms quantized once per cell
    * ([[graft.operators.Eval.chiSquareIndependence]]). */
  private def q173(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.chiSquareIndependence(
      Tables.documents(s, dir), col("source"), col("lang"))

  /** MUTUAL INFORMATION (micro-nats) between documents' source and lang —
    * the magnitude next to q173's χ²: how much language information the
    * source column leaks, against a leakage budget
    * ([[graft.operators.Eval.mutualInfoUnats]]). */
  private def q174(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.mutualInfoUnats(
      Tables.documents(s, dir), col("source"), col("lang"))

  /** First-order MARKOV transition matrix over per-user event sequences
    * — which event_type follows which, with exact micro-unit
    * row-normalized probabilities; the behavioral fingerprint next to
    * q91's funnel and q16's sessions ([[graft.operators.Markov
    * .transitionMatrix]]). Order is the deterministic (ms, event_id)
    * total order both engines share. */
  private def q175(s: SparkSession, dir: String): DataFrame =
    graft.operators.Markov.transitionMatrix(
        Tables.events(s, dir),
        keyCol = col("user_id"), stateCol = col("event_type"),
        orderCols = Seq(unix_millis(col("ts")), col("event_id")))
      .orderBy(col("from_state"), col("to_state"))

  /** AUTOCORRELATION of 4-hour total event value at lag 6 (= 24 h) —
    * "does traffic repeat daily?", the seasonality probe a capacity
    * planner and an anomaly baseline both start from; q172's exact
    * Pearson machinery composed over the aggregated series' shifted
    * self-join ([[graft.operators.Eval.autocorrAtLag]]). */
  private def q176(s: SparkSession, dir: String): DataFrame = {
    val series = Tables.events(s, dir)
      .groupBy(expr("unix_millis(ts) DIV 14400000").as("step"))
      .agg(sum(cents(col("value"))).as("v"))
    graft.operators.Eval.autocorrAtLag(series, col("step"), col("v"),
      lagSteps = 6L)
  }

  /** WEIGHTED shortest paths from the q162 seed set over the
    * part↔supplier graph, edge cost = cheapest observed line quantity in
    * cents — q162's crisp hop count upgraded to a cost tier (minimum-toll
    * supply path within 3 edges). Bellman-Ford frontier rounds, exact
    * BIGINT distances ([[graft.operators.Graph.ssspInt]]). */
  private def q177(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("p"), (col("l_suppkey") + lit(1000000L)).as("sn"),
        cents(col("l_quantity")).as("w"))
    val edges = li.select(col("p").as("src"), col("sn").as("dst"), col("w"))
      .union(li.select(col("sn").as("src"), col("p").as("dst"), col("w")))
    val seeds = Tables.supplier(s, dir)
      .where(col("s_nationkey") % 5 === 3)
      .select((col("s_suppkey") + lit(1000000L)).as("node"))
    graft.operators.Graph.ssspInt(edges, "src", "dst", "w", seeds, rounds = 3)
      .orderBy(col("node"))
  }

  /** INTERVAL-OVERLAP counting with NO pair join: for each even-user
    * session, how many odd-user sessions were concurrently active — the
    * session-concurrency curve (load, contention, coordinated-traffic
    * detection) that the naive range-join formulation makes quadratic in
    * per-moment concurrency. Two endpoint merge-sweeps (two-level prefix
    * sums over 2²⁶-ms buckets), exact closed-interval BIGINT counts
    * ([[graft.operators.Intervals.overlapCounts]]). */
  private def q178(s: SparkSession, dir: String): DataFrame = {
    val sess = Sessionize.summarize(Tables.events(s, dir), "user_id", "ts", 1800000L)
      .select(col("user_id"), col("session_id"),
        unix_millis(col("session_start")).as("start_ms"),
        unix_millis(col("session_end")).as("end_ms"))
    val a = sess.where(col("user_id") % 2 === 0)
      .select((col("user_id") * lit(1000000L) + col("session_id")).as("sid"),
        col("start_ms"), col("end_ms"))
    val b = sess.where(col("user_id") % 2 === 1)
    graft.operators.Intervals.overlapCounts(
        a, "sid", "start_ms", "end_ms", b, "start_ms", "end_ms",
        bucketOf = v => shiftright(v, 26))
      .select(expr("sid DIV 1000000").as("user_id"),
        col("start_ms"), col("end_ms"), col("n_overlap"))
      .orderBy(col("user_id"), col("start_ms"))
  }

  /** MMR diversified top-5 around vec_id 0 — q168's greedy selection
    * doctrine on the dense-vector side: each round's pick maximizes
    * micro-unit `rel − max-sim-to-selected` (λ = ½), candidates never
    * pair with each other, only with the ≤ k broadcast selected vectors
    * ([[graft.operators.Mmr.mmrSelect]]). */
  private def q179(s: SparkSession, dir: String): DataFrame =
    graft.operators.Mmr.mmrSelect(s, Tables.embeddings(s, dir),
        "vec_id", "embedding", queryId = 0L, k = 5)
      .orderBy(col("round"))

  /** Per-nation monthly-revenue TREND — exact rational least-squares
    * slope/intercept over the (month-index, revenue-cents) series of
    * each nation: the "is this domain growing, and how fast" read with
    * an exact sign test ([[graft.operators.Eval.groupedTrend]]). */
  private def q180(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate"))).as("x"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("y"))
    graft.operators.Eval.groupedTrend(rev, "n_name", col("x"), col("y"))
      .orderBy(col("n_name"))
  }

  /** LSH threshold SWEEP — the q18 banding candidates verified with
    * exact hashed-shingle Jaccard and binned by decile, plus the
    * survivor curve: the tuning read that picks the dedup threshold
    * before a corpus-wide run ([[graft.operators.Tuning
    * .lshThresholdSweep]]). */
  private def q181(s: SparkSession, dir: String): DataFrame =
    graft.operators.Tuning.lshThresholdSweep(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, k = 16, bands = 4)
      .orderBy(col("decile"))

  /** EXACT Jaccard ≥ ½ similarity self-join by prefix filtering — zero
    * false negatives (the contractual-dedup guarantee LSH can't give);
    * the oracle brute-forces the SEMANTICS over the same df ≤ 50 hashed
    * universe, so completeness itself is what the gate checks
    * ([[graft.operators.PrefixJoin.jaccardSelfJoin]]). */
  private def q182(s: SparkSession, dir: String): DataFrame =
    graft.operators.PrefixJoin.jaccardSelfJoin(
        Tables.documents(s, dir), "doc_id", "text",
        shingleLen = 3, tNum = 1L, tDen = 2L, maxDf = 50L)
      .orderBy(col("id_a"), col("id_b"))

  /** 2-D SKYLINE of documents — the Pareto front of (short, high-
    * quality): no surviving doc is beaten on both axes; histogram
    * prefix-max arithmetic, never an all-pairs dominance join
    * ([[graft.operators.Skyline.paretoFront2D]]). The oracle IS the
    * quadratic NOT EXISTS — mechanism vs semantics, like q182. */
  private def q183(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Skyline.paretoFront2D(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"),
            floor(Text.qualityScore(col("text"), stop) * lit(1e6)).as("qu")),
        "doc_id", xCol = col("n_chars"), yCol = col("qu"),
        bucketOf = v => shiftright(v, 6))
      .orderBy(col("x"), col("doc_id"))
  }

  /** ZIPF SLOPE of the token rank-frequency curve — ln-ln least squares
    * over the vocabulary (rank via the exact three-level rank, both lns
    * micro-nat-quantized once per type, then [[graft.operators.Eval
    * .groupedTrend]]'s rational slope): the one-number corpus-
    * naturalness read next to q152's spectrum (natural text ≈ −1). */
  private def q184(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("_negc", -col("cnt"))
    val ranked = graft.operators.Ranking.globalRankBy(
      counts, col("_negc"), col("_negc"), col("w"))
    val pts = ranked.select(lit("all").as("corpus"),
      round(log(col("rank").cast("double")) * lit(1e6)).cast("long").as("x"),
      round(log(col("cnt").cast("double")) * lit(1e6)).cast("long").as("y"))
    graft.operators.Eval.groupedTrend(pts, "corpus", col("x"), col("y"))
      .orderBy(col("corpus"))
  }

  /** INCREMENTAL triangle maintenance on the q94 co-purchase graph:
    * orders ≡ 0 mod 4 arrive as the "new batch", and the increment —
    * computed touching only the fresh edges' neighborhoods, never
    * recounting the old graph — must satisfy T(old ∪ new) = T(old) +
    * increment, which is exactly what the oracle checks (two full
    * counts subtracted). Closes the streaming-graph story: the
    * per-micro-batch fold is [[graft.streaming.Streams]]'
    * triangleMaintenanceStream ([[graft.operators.Graph
    * .triangleIncrement]]). */
  private def q185(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = li.join(li.withColumnRenamed("pk", "pk2"), Seq("ok"))
      .where(col("pk") < col("pk2"))
      .select(col("pk").as("src"), col("pk2").as("dst"), col("ok"))
    graft.operators.Graph.triangleIncrement(
      edges.where(col("ok") % 4 =!= 0).select(col("src"), col("dst")),
      edges.where(col("ok") % 4 === 0).select(col("src"), col("dst")),
      "src", "dst")
  }

  /** PER-SOURCE AUC — q146's midrank algebra run within every source:
    * does the q24 quality score separate English docs in EACH stratum,
    * or only on average (Simpson's-paradox insurance before one global
    * threshold)? Ranks via groupedRank — no single-partition exchange
    * ([[graft.operators.Eval.aucExactPerGroup]]). */
  private def q186(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.aucExactPerGroup(
        Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), col("lang"),
            Text.qualityScore(col("text"), stop).as("q")),
        "source", scoreCol = col("q"), positive = col("lang") === "en",
        subBucket = floor(col("q") * lit(20.0)).cast("long"),
        idCol = col("doc_id"))
      .orderBy(col("source"))
  }

  /** URL HOST EXTRACTION + registrable-domain rollup — the crawl-side
    * canonicalization read (which domains dominate, how many distinct
    * hosts each spans): deterministic synthetic URLs enriched into the
    * text (the q51 pattern), host/domain pulled by the same RE2-safe
    * regexes on both engines, exact counts per registrable domain. */
  private def q187(s: SparkSession, dir: String): DataFrame = {
    val tld = element_at(array(lit(".com"), lit(".org"), lit(".net"), lit(".io")),
      (pmod(col("doc_id"), lit(4)) + 1).cast("int"))
    val enriched = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"), lit(" see https://s"), pmod(col("doc_id"), lit(7)),
        lit(".site"), pmod(col("doc_id"), lit(23)), tld,
        lit("/p/"), col("doc_id"), lit(" for details")).as("t"))
    enriched
      .select(col("doc_id"),
        regexp_extract(col("t"), "https://([^/\\s]+)", 1).as("host"))
      .select(col("doc_id"), col("host"),
        regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("host")).as("n_hosts"))
      .orderBy(col("domain"))
  }

  /** PERCEPTUAL image dedup over REAL bytes — q135's exact-hash dedup
    * carried to the downsample-and-threshold aHash (every bit an exact
    * cross-multiplied mean comparison over decoded patch sums); groups
    * by perceptual hash must coincide with seed groups, the q135
    * exactness argument ([[graft.multimodal.Media.imageAHash]]). */
  private def q188(s: SparkSession, dir: String): DataFrame = {
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

  /** INFORMATION-GAIN feature ranking — q174's mutual information run
    * over each CANDIDATE metadata column against the label: which of
    * (source, length bucket, langid prediction) leaks the most
    * language signal, the feature-selection/leakage-audit read before
    * trusting stratification keys ([[graft.operators.Eval
    * .mutualInfoUnats]] per feature, stacked). */
  private def q189(s: SparkSession, dir: String): DataFrame = {
    // ALL candidate features in ONE pass over the corpus (the expensive
    // langid expression and the tokenization run once), checkpointed;
    // the three MI chains then read the narrow 4-column frame
    val feats = Tables.documents(s, dir)
      .select(Text.langId(col("text")).as("f_langid"),
        expr("n_chars DIV 256").cast("string").as("f_len"),
        col("source").as("f_source"), col("lang"))
      .localCheckpoint()
    def mi(name: String, f: Column): DataFrame =
      graft.operators.Eval.mutualInfoUnats(
          feats.select(f.as("f"), col("lang")), col("f"), col("lang"))
        .select(lit(name).as("feature"), col("n"), col("n_cells"),
          col("mi_n_micro"), col("mi_nats"))
    mi("langid", col("f_langid"))
      .unionByName(mi("len_bucket", col("f_len")))
      .unionByName(mi("source", col("f_source")))
      .orderBy(col("feature"))
  }

  /** KAPLAN-MEIER signup→purchase conversion curve with right-censoring
    * at observation end — the time-to-event read a naive mean-time
    * query gets wrong; log-space micro-nat survival, exact BIGINT
    * running sum, day-universe-sized curve
    * ([[graft.operators.Survival.kaplanMeier]]). */
  private def q190(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signup = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_millis(col("ts"))).as("s_ms"))
    val endMs = ev.agg(max(unix_millis(col("ts"))).as("end_ms"))
    val purchase = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"))
    val subjects = signup
      .join(purchase, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("s_ms"))
      .agg(min(when(col("p_ms") >= col("s_ms"), col("p_ms"))).as("first_p"))
      .crossJoin(broadcast(endMs))
      .select(
        when(col("first_p").isNotNull,
          expr("(first_p - s_ms) DIV 86400000"))
          .otherwise(expr("(end_ms - s_ms) DIV 86400000")).as("dur"),
        col("first_p").isNotNull.as("ev"))
    graft.operators.Survival.kaplanMeier(subjects, col("dur"), col("ev"))
      .orderBy(col("day"))
  }

  /** RENDEZVOUS (highest-random-weight) sharding stability — assign each
    * doc to its argmax-md5 shard under 8 and under 9 shards and measure
    * the reassignment: HRW's contract is that growing the ring moves
    * only ~1/(n+1) of keys (consistent-hashing economics, exactly
    * countable here). Per-row argmax over a literal shard array — zero
    * shuffle before the summary. */
  private def q191(s: SparkSession, dir: String): DataFrame = {
    def shardOf(n: Int): Column =
      array_max(array((0 until n).map(sh => struct(
        md5(concat(col("doc_id").cast("string"), lit(s":$sh"))).as("h"),
        lit(sh.toLong).as("s"))): _*)).getField("s")
    Tables.documents(s, dir)
      .select(col("doc_id"), shardOf(8).as("s8"), shardOf(9).as("s9"))
      .groupBy(col("s8"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("n_moved"))
      .orderBy(col("s8"))
  }

  /** END-TO-END curation pipeline in ONE plan — canonical dedup
    * (keep-min per normalized fingerprint) → quality floor → md5
    * train/val/test split → per-(split, lang) doc and token counts:
    * the composition the individual operators exist FOR, materialized
    * as a single query whose oracle stitches the same verified
    * fragments (q61 + q24 + q44 + q01 shapes). */
  private def q192(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    val docs = Tables.documents(s, dir)
    val fp = md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
    val kept = docs.withColumn("_fp", fp)
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("_fp")).orderBy(col("doc_id"))))
      .where(col("_rk") === 1)
      .where(Text.qualityScore(col("text"), stop) >= lit(0.4))
    graft.operators.Sampling.assignSplit(kept, "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col("text"))).cast("long")).as("n_tokens"))
      .orderBy(col("split"), col("lang"))
  }

  /** Per-source BRIER score of the q24 quality score read as P(english)
    * — the overall probabilistic-quality number closing the eval triad
    * with q186 (discrimination) and q147 (calibration)
    * ([[graft.operators.Eval.brierPerGroup]]). */
  private def q193(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.brierPerGroup(
        Tables.documents(s, dir)
          .select(col("source"), col("lang"),
            floor(Text.qualityScore(col("text"), stop) * lit(1e6)).as("pu")),
        "source", probMicroCol = col("pu"), positive = col("lang") === "en")
      .orderBy(col("source"))
  }

  /** LIFT / gain chart — exact equi-depth score deciles (best first) with
    * cumulative positive capture and integer micro-lift
    * `⌊cum_pos·N·10⁶ / (cum_n·P)⌋`: "how much better than random does
    * the top-k% of the score capture English docs", the targeting read
    * next to AUC's rank view (q117's ntile arithmetic + a 10-row
    * cumulative window). */
  private def q194(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    // scored once, cut before the rank fan-out (the q183/q186 lesson:
    // 12.4x at 10x data with the quality regexes re-evaluated per branch)
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), (col("lang") === "en").as("pos"),
        floor(Text.qualityScore(col("text"), stop) * lit(1e6)).as("qu"))
      .withColumn("_negq", -col("qu"))
      .localCheckpoint()
    val binned = graft.operators.Ranking.equiDepthBins(
      base, expr("-(qu DIV 50000)"), 10, col("_negq"), col("doc_id"))
    val per = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
    val tot = per.agg(sum(col("n_rows")).as("_tn"), sum(col("n_pos")).as("_tp"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cum_n", sum(col("n_rows")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_rows"), col("n_pos"), col("cum_pos"),
        // DECIMAL(38): cum_pos·N·10⁶ overflows BIGINT at corpus scale
        expr("((CAST(cum_pos AS DECIMAL(38,0)) * _tn * 1000000) DIV " +
          "(CAST(cum_n AS DECIMAL(38,0)) * _tp))").cast("long").as("lift_micro"))
      .orderBy(col("bin"))
  }

  /** ROLLING 7-day distinct active users WITHOUT a window-distinct (not
    * decomposable): each (day, user) membership explodes to the ≤ 7
    * window days it serves, then one partial-aggregable distinct count
    * per window day — the dashboard metric computed the way it scales. */
  private def q195(s: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(s, dir)
      .select(expr("unix_millis(ts) DIV 86400000").as("m"), col("user_id"))
      .distinct()
    val mx = du.agg(max(col("m")).as("_mx"))
    du.select(explode(sequence(col("m"), col("m") + lit(6L))).as("day"),
        col("user_id"))
      .crossJoin(broadcast(mx))
      .where(col("day") <= col("_mx"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_active_7d"))
      .orderBy(col("day"))
  }

  /** EXACT two-sample Kolmogorov-Smirnov distance between click and
    * view value distributions — the assumption-free sup-gap drift test
    * next to q169's bucketed PSI; integer cross-multiplied CDF gaps
    * over the merged value histogram
    * ([[graft.operators.Eval.ksTestExact]]). */
  private def q196(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def side(t: String) = ev.where(col("event_type") === t)
      .select(cents(col("value")).as("v"))
    graft.operators.Eval.ksTestExact(
      side("click"), col("v"), side("view"), col("v"),
      bucketOf = v => shiftright(v, 8))
  }

  /** COHORT LTV accumulation — signup-week cohorts × weeks-since-signup
    * cumulative purchase revenue (exact cents): the revenue companion
    * to q92's retention triangle; per-cohort running sums over the
    * weeks-universe window. */
  private def q197(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signup = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(expr("unix_millis(ts) DIV 86400000")).as("s_day"))
    val rev = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_millis(ts) DIV 86400000").as("p_day"),
        cents(col("value")).as("c"))
    val cells = signup.join(rev, Seq("user_id"))
      .where(col("p_day") >= col("s_day"))
      .groupBy(expr("s_day DIV 7").as("cohort_week"),
        expr("(p_day - s_day) DIV 7").as("weeks_since"))
      .agg(sum(col("c")).as("rev_c"))
    val wCum = Window.partitionBy(col("cohort_week")).orderBy(col("weeks_since"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum_rev_c", sum(col("rev_c")).over(wCum))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }

  /** KEYNESS of even- vs odd-id document halves — per-term add-½
    * log-odds in micro-nats, top-20 by |score|: WHAT changed between
    * two corpora, one level finer than q153's corpus-level divergence
    * ([[graft.operators.Colloc.keyness]]). */
  private def q198(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    graft.operators.Colloc.keyness(
        d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
        "text", k = 20)
      .orderBy(abs(col("keyness_unats")).desc, col("term"))
  }

  /** COLUMN PROFILER — per-column null count, distinct count, and
    * lexicographic string bounds over lineitem's key/flag columns in ONE
    * stacked pass (every profile cell an exact count or a string
    * min/max — the ingestion health report run before trusting a new
    * drop; string bounds are the deliberately engine-stable choice). */
  private def q199(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus")
    Tables.lineitem(s, dir)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_s"), max(col("v")).as("max_s"))
      .orderBy(col("col_name"))
  }

  /** REFERENTIAL-INTEGRITY audit — orphan counts for every foreign key
    * of the star schema via left-anti joins (broadcast where the parent
    * is a dim): the load-order/consistency check a warehouse runs after
    * every ingest; all-zero orphans IS the contract being verified. */
  private def q200(s: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, ck: String,
            parent: DataFrame, pk: String): DataFrame = {
      val orphans = child.select(col(ck))
        .join(parent.select(col(pk).as(ck)), Seq(ck), "left_anti")
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"))
    }
    val li = Tables.lineitem(s, dir)
    rel("lineitem.orderkey->orders", li, "l_orderkey", Tables.orders(s, dir), "o_orderkey")
      .unionByName(rel("lineitem.partkey->part", li, "l_partkey", Tables.part(s, dir), "p_partkey"))
      .unionByName(rel("lineitem.suppkey->supplier", li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"))
      .unionByName(rel("orders.custkey->customer", Tables.orders(s, dir), "o_custkey", Tables.customer(s, dir), "c_custkey"))
      .unionByName(rel("customer.nationkey->nation", Tables.customer(s, dir), "c_nationkey", Tables.nation(s, dir), "n_nationkey"))
      .orderBy(col("relationship"))
  }

  /** ACTIVITY STREAKS (gaps-and-islands) — per user: active-day count,
    * number of contiguous streaks, longest streak: the classic
    * `day − row_number` island key over per-user bounded windows, exact
    * integers end to end. */
  private def q201(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_millis(ts) DIV 86400000").as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    days
      .withColumn("_isl", col("d") - row_number().over(w))
      .groupBy(col("user_id"), col("_isl"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col("user_id"))
      .agg(sum(col("_len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"), max(col("_len")).as("max_streak"))
      .orderBy(col("user_id"))
  }

  /** WEEK-OVER-WEEK revenue change per nation — lag over the per-nation
    * weeks universe, delta as one IEEE division of exact cents (the BI
    * period-over-period staple on the star schema). */
  private def q202(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        // o_orderdate is parquet NTZ; the session is pinned UTC, so the
        // cast is the identity the oracle's epoch_ms computes
        expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 604800000").as("week"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_c"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("week"))
    weekly
      .withColumn("prev_c", lag(col("rev_c"), 1).over(w))
      .withColumn("wow_pct",
        when(col("prev_c").isNotNull && col("prev_c") =!= 0L,
          (col("rev_c") - col("prev_c")).cast("double") / col("prev_c").cast("double")))
      .orderBy(col("n_name"), col("week"))
  }

  /** FILTER ATTRIBUTION — per Gopher rule (q104's exact parameters):
    * how many docs it fails, and how many it UNIQUELY kills (the docs
    * recovered if the rule were dropped) — the "which filter is doing
    * the work / which is redundant" read a curation dashboard leads
    * with. One flags pass, one stacked aggregate. */
  private def q203(s: SparkSession, dir: String): DataFrame = {
    val f = graft.operators.QualityRules.gopherFilter(
      Tables.documents(s, dir), "doc_id", "text",
      minTokens = 30, maxTokens = 80, minMeanLen = 4.0, maxMeanLen = 4.8,
      repN = 2, maxRepetition = 0.05,
      stopwords = Seq("the", "a", "of", "and", "is", "to", "in", "that"),
      minStopHits = 2)
    val rules = Seq("r_len", "r_wlen", "r_rep", "r_stop")
    f.select(explode(array(rules.map { r =>
        val others = rules.filterNot(_ == r).map(col).reduce(_ && _)
        struct(lit(r).as("rule"), (!col(r)).as("fails"),
          (!col(r) && others).as("unique_fail"))
      }: _*)).as("p"))
      .select(col("p.rule").as("rule"), col("p.fails").as("fails"),
        col("p.unique_fail").as("unique_fail"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("fails"), 1L).otherwise(0L)).as("n_fail"),
        sum(when(col("unique_fail"), 1L).otherwise(0L)).as("n_unique_fail"))
      .withColumn("fail_rate",
        col("n_fail").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("rule"))
  }

  /** SHARD-BALANCE χ² goodness-of-fit — are the md5 shuffle shards
    * uniform? `χ² = Σ_s (O_s·k − N)²/(k·N)` in exact DECIMAL(38)
    * micro-units over the FULL k-shard spine (empty shards contribute
    * their N/k deviation — the spine join is what makes the test
    * honest); q173's sparse-safe doctrine applied to goodness-of-fit,
    * closing the loop with q191's rendezvous stability. */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    val o = Tables.documents(s, dir)
      .select(graft.operators.Sampling.shardCol(col("doc_id"), k, "shuffle")
        .cast("long").as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("o"))
    val spine = s.range(0, k).select(col("id").as("s"))
    val n = o.agg(sum(col("o")).as("_n"))
    spine.join(o, Seq("s"), "left")
      .select(col("s"), coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(n))
      .select(expr(s"(CAST(o * $k - _n AS DECIMAL(38,0)) * (o * $k - _n) * 1000000) " +
        s"DIV ($k * CAST(_n AS DECIMAL(38,0)))").as("_t"), col("_n"))
      .groupBy(col("_n"))
      .agg(sum(col("_t")).as("chi2_micro"))
      .select(lit(k.toLong).as("k"), col("_n").as("n"),
        col("chi2_micro").cast("long").as("chi2_micro"),
        (col("chi2_micro").cast("double") / lit(1e6)).as("chi2"))
  }

  /** SESSION-BASKET co-occurrence lift — which event types co-occur in
    * a 30-min session beyond chance (association discovery; q91 checks
    * a funnel you know, this finds candidates): exact session-count
    * supports, integer micro-lift ([[graft.operators.Basket
    * .coOccurrenceLift]] over q16's sessions). */
  private def q205(s: SparkSession, dir: String): DataFrame =
    graft.operators.Basket.coOccurrenceLift(
        Sessionize.assign(Tables.events(s, dir), "user_id", "ts", 1800000L),
        sessionKey = concat_ws(":", col("user_id"), col("session_id")),
        itemCol = col("event_type"))
      .orderBy(col("item_a"), col("item_b"))

  /** ORDERED precedence within sessions — for co-present type pairs,
    * how often a's first occurrence strictly precedes b's (funnel
    * DISCOVERY; ties count to neither side)
    * ([[graft.operators.Basket.precedence]]). */
  private def q206(s: SparkSession, dir: String): DataFrame =
    graft.operators.Basket.precedence(
        Sessionize.assign(Tables.events(s, dir), "user_id", "ts", 1800000L),
        sessionKey = concat_ws(":", col("user_id"), col("session_id")),
        itemCol = col("event_type"), tsCol = unix_millis(col("ts")))
      .orderBy(col("item_a"), col("item_b"))

  /** TEMPORAL DRIFT REPORT — exact KS per feature across the 70% time
    * split (q167's embargo boundary arithmetic, q196's KS machinery,
    * stacked): does the value distribution or the hour-of-day profile
    * shift between the train era and the test era — the one-table drift
    * answer a split sign-off reads. */
  private def q207(s: SparkSession, dir: String): DataFrame = {
    val bounds = broadcast(Tables.events(s, dir)
      .agg(min(unix_micros(col("ts"))).as("_mn"), max(unix_micros(col("ts"))).as("_mx"))
      .select(expr("_mn + ((_mx - _mn) * 7) DIV 10").as("_mid")))
    val stamped = Tables.events(s, dir)
      .select(unix_micros(col("ts")).as("us"), cents(col("value")).as("vc"),
        expr("(unix_millis(ts) DIV 3600000) % 24").as("hod"))
      .crossJoin(bounds)
      .localCheckpoint() // fans into 2 features x 2 sides
    def ks(name: String, c: String): DataFrame =
      graft.operators.Eval.ksTestExact(
          stamped.where(col("us") <= col("_mid")).select(col(c)), col(c),
          stamped.where(col("us") > col("_mid")).select(col(c)), col(c),
          bucketOf = v => shiftright(v, 6))
        .select(lit(name).as("feature"), col("n_a"), col("n_b"),
          col("ks_num"), col("ks"))
    ks("hour_of_day", "hod").unionByName(ks("value_cents", "vc"))
      .orderBy(col("feature"))
  }

  /** Multi-scale substring dedup — the graduated repeated-substring
    * policy ([[graft.operators.Dedup.multiScaleSpanDedup]]): 64-token
    * repeats cut at the second occurrence (threshold-64 suffix-style
    * removal over the repeat's full extent), 16-token windows at ≥ 4
    * occurrences, 8-token windows only as ≥ 25-occurrence boilerplate;
    * union of marks, one rebuild. */
  /** q208's graduated scale policy — read by BOTH the engine call and the
    * generated oracle CTE union, so the two can never drift. */
  private val MultiScaleScales: Seq[(Int, Long)] = Seq(8 -> 25L, 16 -> 4L, 64 -> 2L)

  private def q208(s: SparkSession, dir: String): DataFrame =
    Dedup.multiScaleSpanDedup(Tables.documents(s, dir), "doc_id", "text",
        scales = MultiScaleScales)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("cleaned_text"))
      .orderBy(col("doc_id"))

  /** Kendall τ-b between document length (chars) and quality score —
    * q170's Spearman pairing re-read as CONCORDANCE (ρ vs τ on the same
    * variables separates monotone strength from rank-gap magnitude; the
    * statistic the round-7 verdict flagged for decision review). Exact
    * distributed inversion count via the first-differing-nibble
    * decomposition, [[graft.operators.Eval.kendallTauExact]]. */
  private def q209(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.kendallTauExact(
      Tables.documents(s, dir)
        .select(col("n_chars"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6)).as("qu")),
      xCol = col("n_chars"), yCol = col("qu"),
      yBucket = expr("qu DIV 50000"))
  }

  /** Cohen's κ between the recorded document language tag and the q23
    * marker-heuristic prediction — chance-corrected label agreement
    * ([[graft.operators.Eval.cohensKappa]]): the cheap-classifier
    * sign-off read (raw agreement flatters majority-label raters; κ
    * subtracts what the marginals produce by chance). */
  private def q210(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.cohensKappa(
      Tables.documents(s, dir)
        // tokenize ONCE behind the Generate barrier (CollapseProject
        // cannot re-inline through it), then score the materialized
        // array — measured 3x vs langId(text) whose five HOF filters
        // each re-run the tokenizer outside codegen
        .select(col("lang"), explode(array(Text.tokens(col("text")))).as("_ts"))
        .select(col("lang"), Text.langIdFromTokens(col("_ts")).as("pred")),
      aCol = col("lang"), bCol = col("pred"))

  /** Mann–Whitney U: does the quality score distribute differently for
    * English vs non-English documents, and does the gap beat chance?
    * AUC + Cliff's δ + tie-corrected z in one histogram sweep
    * ([[graft.operators.Eval.mannWhitney]]) — the significance sign-off
    * a pipeline runs before acting on a per-language threshold. */
  private def q211(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.mannWhitney(
      Tables.documents(s, dir)
        .select(col("lang"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6)).as("qu")),
      scoreCol = col("qu"), positive = col("lang") === "en",
      bucketOf = v => shiftright(v, 16))
  }

  /** Theil–Sen robust slope on q180's exact frame — per-nation monthly
    * revenue, median of pairwise micro-slopes
    * ([[graft.operators.Eval.theilSenSlope]]): read NEXT TO q180's OLS
    * slope, a gap between the two flags outlier months driving the
    * trend. Pair universe = months² per nation (≤ 3.5k), model-sized. */
  private def q212(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate"))).as("x"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("y"))
    graft.operators.Eval.theilSenSlope(rev, "n_name", col("x"), col("y"))
      .orderBy(col("n_name"))
  }

  /** Benford first-digit deviation over line-item prices (exact cents) —
    * the fraud/synthetic-feed smell test
    * ([[graft.operators.Checks.benfordDeviation]]): per-digit χ² terms
    * in micro-units against the log₁₀(1+1/d) law, the 9-row spine kept
    * honest (absent digits still contribute their expectation). */
  private def q213(s: SparkSession, dir: String): DataFrame =
    graft.operators.Checks.benfordDeviation(
      Tables.lineitem(s, dir), cents(col("l_extendedprice")))

  /** Isotonic calibration of the quality score against P(English) —
    * PAV over the 2¹⁴-quantized score universe
    * ([[graft.operators.Eval.isotonicCalibration]]): the monotone
    * score → probability table a pipeline joins on before thresholding,
    * where q147's bins only diagnose. */
  private def q214(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.isotonicCalibration(
      Tables.documents(s, dir)
        .select(floor(Text.qualityScore(col("text"), stop) * lit(1e6))
          .cast("long").as("qu"), col("lang")),
      scoreCol = expr("qu DIV 16384"), positive = col("lang") === "en")
  }

  /** CUSUM changepoint per event type — WHICH DAY did daily volume
    * shift ([[graft.operators.Anomaly.cusumChangepoint]]): q110 flags
    * odd buckets, this dates the regime change; exact cross-multiplied
    * statistic over the per-type day series. */
  private def q215(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
    graft.operators.Anomaly.cusumChangepoint(daily, "event_type",
        col("day"), col("y"))
      .orderBy(col("event_type"))
  }

  /** Split-conformal quality threshold per language at α = 1/10
    * ([[graft.operators.Ranking.conformalThreshold]]): the
    * ⌈(n+1)·0.9⌉-th smallest score — the finite-sample-valid "keep
    * scores ≤ q̂ and cover ≥ 90%" cutoff, NULL where a language's
    * sample is too small to honor the guarantee. */
  private def q216(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Ranking.conformalThreshold(
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6))
            .cast("long").as("qu")),
      groupCol = "lang", valueCol = "qu",
      subBucket = expr("qu DIV 50000"), idCol = "doc_id",
      alphaNum = 1L, alphaDen = 10L)
      .orderBy(col("lang"))
  }

  /** Jensen–Shannon divergence between q153's corpus halves — the
    * symmetric bounded [0, ln 2] drift number
    * ([[graft.operators.LmScore.jensenShannon]]) release notes can
    * compare across versions, where q153's KL pair is
    * direction-sensitive and unbounded. */
  private def q217(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    graft.operators.LmScore.jensenShannon(
      d.where(pmod(col("doc_id"), lit(2)) === 0),
      d.where(pmod(col("doc_id"), lit(2)) === 1), "text")
  }

  /** Exact k-means over the embeddings table — 8 clusters, 3 Lloyd
    * rounds on micro-quantized vectors
    * ([[graft.operators.Similarity.kmeansExact]]): the DETERMINISTIC
    * trainer whose whole trajectory hash-matches (float Lloyd is
    * aggregation-order-dependent — why q36/q67 are rows-only); the
    * centroid table is what an IVF index would persist. */
  private def q218(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.kmeansExact(
      Tables.embeddings(s, dir), "vec_id", "embedding", k = 8, rounds = 3)

  /** Exact-gated IVF ANN — q36's index lifecycle (train → bucket →
    * probe → re-rank) rebuilt on [[graft.operators.Similarity
    * .kmeansExact]]'s integer trajectory
    * ([[graft.operators.Similarity.ivfExactTopK]]): approximate by
    * construction, yet every emitted row hash-matches — the exact gate
    * the float IVF path cannot offer. */
  private def q219(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.operators.Similarity.ivfExactTopK(
        emb.where(col("vec_id") % 100 === 0), emb, "vec_id", "embedding",
        k = 10, nCentroids = 8, rounds = 2, probes = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Log-rank test on q190's time-to-purchase subjects split by user-id
    * parity ([[graft.operators.Survival.logRank]]): "do the two cohorts
    * convert at the same rate?" — the significance read two KM curves
    * alone cannot give. */
  private def q220(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signup = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_millis(col("ts"))).as("s_ms"))
    val endMs = ev.agg(max(unix_millis(col("ts"))).as("end_ms"))
    val purchase = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"))
    val subjects = signup
      .join(purchase, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("s_ms"))
      .agg(min(when(col("p_ms") >= col("s_ms"), col("p_ms"))).as("first_p"))
      .crossJoin(broadcast(endMs))
      .select(col("user_id"),
        when(col("first_p").isNotNull, expr("(first_p - s_ms) DIV 86400000"))
          .otherwise(expr("(end_ms - s_ms) DIV 86400000")).as("dur"),
        col("first_p").isNotNull.as("ev"))
    graft.operators.Survival.logRank(
      subjects.where(pmod(col("user_id"), lit(2)) === 0),
      subjects.where(pmod(col("user_id"), lit(2)) === 1),
      col("dur"), col("ev"))
  }

  /** Wilson 95% interval around each language's quality-pass rate
    * ([[graft.operators.Eval.wilsonInterval]]) — the honest error band
    * for the per-language dashboard (stays inside [0,1] and non-zero at
    * extreme rates, where the naive normal band lies). */
  private def q221(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.wilsonInterval(
      Tables.documents(s, dir)
        .select(col("lang"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6))
            .cast("long").as("qu")),
      groupCol = "lang", positive = col("qu") >= 500000L)
      .orderBy(col("lang"))
  }

  /** CMH test: is the long-document → quality-pass association real
    * WITHIN each language, or a composition artifact
    * ([[graft.operators.Eval.cmhTest]])? Strata = lang, exposure =
    * n_chars ≥ 1000, outcome = quality pass — the stratified sign-off
    * q173's pooled 2×2 cannot give. */
  private def q222(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.cmhTest(
      Tables.documents(s, dir)
        .select(col("lang"), col("n_chars"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6))
            .cast("long").as("qu")),
      stratumCol = "lang",
      exposure = col("n_chars") >= 1000L,
      outcome = col("qu") >= 500000L)
  }

  /** Cluster-quality readout over q218's exact k-means: per-cluster
    * inertia (the elbow number) + simplified silhouette
    * ([[graft.operators.Similarity.kmeansQuality]]) — the O(n·k)
    * silhouette, the only one that exists at corpus scale. */
  private def q223(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.kmeansQuality(
      Tables.embeddings(s, dir), "vec_id", "embedding", k = 8, rounds = 3)

  /** ROUGE-3 contamination suspects on q77's corpus/benchmark split
    * ([[graft.operators.Eval.rougeN]]): pairs with F1 ≥ 1% — the
    * paraphrase-ish overlap read q77's exact-window scan misses; the
    * two run together in a decontamination pass. */
  private def q224(s: SparkSession, dir: String): DataFrame = {
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
  private def q225(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val cand = docs.where(col("doc_id") % 10 =!= 0)
    val ref = docs.where(col("doc_id") % 10 === 0)
    val pairs = graft.operators.Eval.rougeN(cand, ref, "doc_id", "text", n = 3)
      .where(col("f1_micro") >= 10000L)
      .select(col("doc_id"), col("ref_id"))
    graft.operators.Eval.bleuPairs(pairs, cand, ref, "doc_id", "text", maxN = 4)
      .orderBy(col("doc_id"), col("ref_id"))
  }

  /** The last two SURVEY §2.1 rows without their own gate: `fromLiterals`
    * (reference DataStream.scala:87-88 — the finite in-memory source) and
    * `mapValues` (reference DataStream.scala:49,76-77 — per-element value
    * transform under a key tag), chained through groupBy → fold so the
    * whole facade path literals → grouped → mapped → native partial agg
    * is what the oracle checks (a DuckDB VALUES clause). */
  private def q226(s: SparkSession, dir: String): DataFrame = {
    import Expr._
    implicit val spark: SparkSession = s
    val ds = DataStream.fromLiterals(
      ("a", 3L), ("b", 1L), ("a", 4L), ("c", 5L),
      ("b", 9L), ("a", 2L), ("c", 6L), ("b", -7L))
    ds.groupBy(t => t._1)
      .mapValues(v => v._2 * 2L + 1L)
      .fold(g => Expr.KeyValue(g.key, g.values.sum &&& g.values.length))
      .toDF
      .select(col("value.key").as("k"),
        col("value.value._1").as("mapped_sum"),
        col("value.value._2").as("n"))
      .orderBy(col("k"))
  }

  /** The exact-IVF index PERSISTED lifecycle, end to end (ROADMAP's
    * carried item — q66's production story for ANN): train on the
    * initial corpus (vec_id % 7 ≠ 0), persist the centroid table
    * (managed parquet) and the postings PARTITIONED BY cluster, append
    * the new batch (vec_id % 7 = 0) assigned against the PERSISTED
    * centroids (frozen model — the IVF contract), then serve top-k
    * probes ENTIRELY from the two persisted tables. The probed cluster
    * ids become a static `isin` on the postings scan, so only the
    * probed `cluster=N/` directories are read (ScaleSpec asserts the
    * PartitionFilters). Every row exact
    * ([[graft.operators.Similarity.ivfProbeTopK]]); the oracle replays
    * the same trajectory with training restricted to the initial
    * corpus. */
  /** Scratch suffix for the persisted-lifecycle gates (q227/q236):
    * MD5(dir) keeps scale factors apart within one process, and the PID
    * keeps CONCURRENT harness processes pointed at the same data dir
    * (a bench and a parity run) from interleaving one process's
    * overwrite-then-append sequence with the other's probe. Stale
    * scratch left by DEAD processes under the same query prefix — in
    * /tmp and in the managed warehouse — is swept on entry (liveness
    * via ProcessHandle), so repeated runs don't accumulate debris;
    * live processes' scratch is never touched. */
  private def lifecycleScratchSuffix(s: SparkSession, q: String,
                                     dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val pid = ProcessHandle.current().pid()
    val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
    val pat = (s"graft_${q}_.*_p(\\d+)$$").r
    def del(x: java.io.File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(del)
      x.delete(); ()
    }
    Seq(new java.io.File("/tmp"), new java.io.File(wh)).foreach { d =>
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
        pat.findFirstMatchIn(f.getName).foreach { m =>
          val p = m.group(1).toLong
          val gone = p != pid &&
            !(ProcessHandle.of(p).isPresent && ProcessHandle.of(p).get().isAlive)
          if (gone) del(f)
        }
      }
    }
    s"${h}_p$pid"
  }

  private def q227(s: SparkSession, dir: String): DataFrame = {
    val suffix = lifecycleScratchSuffix(s, "q227", dir)
    val emb = Tables.embeddings(s, dir)
    val initial = emb.where(col("vec_id") % 7 =!= 0)
    val batch = emb.where(col("vec_id") % 7 === 0)
    val centTable = s"graft_q227_ivf_centroids_$suffix"
    val postPath = s"/tmp/graft_q227_ivf_postings_$suffix"
    val (centroids, postings) = graft.operators.Similarity.ivfIndexBuild(
      initial, "vec_id", "embedding", nCentroids = 8, rounds = 2)
    Tables.saveTable(centroids, centTable)
    Tables.writePartitioned(postings, postPath, "cluster")
    // incremental half: the batch is assigned against the PERSISTED
    // centroid table and lands under the same partitioned layout
    val centRead = s.table(centTable)
    Tables.appendPartitioned(
      graft.operators.Similarity.ivfIndexAppend(batch, centRead, "vec_id", "embedding"),
      postPath, "cluster")
    graft.operators.Similarity.ivfProbeTopK(
        emb.where(col("vec_id") % 50 === 0), centRead, s.read.parquet(postPath),
        "vec_id", "embedding", k = 10, probes = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  /** q214's isotonic calibration with SAMPLE WEIGHTS — rows weighted by
    * a small length-derived importance (`n_chars mod 7 + 1`: a
    * deterministic 1..7 weight both engines derive identically), so the
    * monotone score → P(English) table favors the weighted rows
    * ([[graft.operators.Eval.isotonicWeighted]]). Weighted minimax
    * oracle: q214's CTE scheme with (n, p) → (Σw, Σw·y). */
  private def q228(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.isotonicWeighted(
      Tables.documents(s, dir)
        .select(floor(Text.qualityScore(col("text"), stop) * lit(1e6))
          .cast("long").as("qu"), col("lang"), col("n_chars")),
      scoreCol = expr("qu DIV 16384"),
      yCol = (col("lang") === "en").cast("long"),
      weightCol = pmod(col("n_chars"), lit(7)) + lit(1))
  }

  /** Cochran–Armitage trend: does P(English) move monotonically with
    * the ordered length bucket (0..3 at 250-char steps)? The 2×k
    * sharpening of q173's independence χ² — all power on the linear
    * trend ([[graft.operators.Eval.cochranArmitage]]). */
  private def q229(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.cochranArmitage(
      Tables.documents(s, dir),
      scoreCol = expr("least(n_chars DIV 250, 3)"),
      positive = col("lang") === "en")

  /** Kruskal–Wallis across languages: do the k language cohorts draw
    * the quality score from the same distribution — the one-shot
    * rank test before q211's pairwise U reads
    * ([[graft.operators.Eval.kruskalWallis]]), on q214's quantized
    * score universe. */
  private def q230(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.kruskalWallis(
      Tables.documents(s, dir)
        .select(col("lang"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6))
            .cast("long").as("qu")),
      groupCol = "lang", valueCol = expr("qu DIV 16384"),
      bucketOf = v => shiftright(v, 3))
  }

  /** Product-quantization ADC top-k over the embeddings — the
    * compressed-index ANN read (4 subspaces × 16 dims, 4-codeword
    * codebooks): train → encode → asymmetric-distance scan → top-k,
    * every integer exactly reproducible
    * ([[graft.operators.Similarity.pqTopK]]); the oracle replays all
    * four per-subspace Lloyd chains side by side (the q218 scheme). */
  private def q231(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.operators.Similarity.pqTopK(
        emb.where(col("vec_id") % 100 === 0), emb, "vec_id", "embedding",
        k = 10, m = 4, ksub = 4, rounds = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-PQ with residual encoding — the production billion-vector
    * index composed from the exact parts (coarse router q219 + PQ
    * compression q231, codebooks on RESIDUALS — FAISS IndexIVFPQ's
    * default): probe 2 of 8 coarse buckets, ADC over 4×16-dim residual
    * codebooks ([[graft.operators.Similarity.ivfPqTopK]]); the oracle
    * replays the coarse chain plus all four residual-subspace chains. */
  private def q232(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.operators.Similarity.ivfPqTopK(
        emb.where(col("vec_id") % 100 === 0), emb, "vec_id", "embedding",
        k = 10, nCoarse = 8, probes = 2, m = 4, ksub = 4, rounds = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  /** One-way ANOVA F of the quality score across languages — the
    * parametric MEANS companion to q230's Kruskal–Wallis (the pair a
    * pipeline reads together: F moves on means, KW on the whole
    * distribution) — [[graft.operators.Eval.anovaOneWay]] on the same
    * quantized score universe. */
  private def q233(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.anovaOneWay(
      Tables.documents(s, dir)
        .select(col("lang"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6))
            .cast("long").as("qu")),
      groupCol = "lang", valueCol = expr("qu DIV 16384"))
  }

  /** Brown–Forsythe homogeneity of variance across language cohorts —
    * "is q233's pooled-variance F even admissible": ANOVA on absolute
    * deviations from each cohort's exact lower median
    * ([[graft.operators.Eval.brownForsythe]]). */
  private def q234(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.brownForsythe(
      Tables.documents(s, dir)
        .select(col("lang"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6))
            .cast("long").as("qu")),
      groupCol = "lang", valueCol = expr("qu DIV 16384"))
  }

  /** The IVF-PQ index PERSISTED, end to end (the round-9 carried item
    * closed in-round): q227's persistence pattern over q232's
    * compression — coarse centroids and residual codebooks as managed
    * tables, the compressed codes PARTITIONED BY coarse bucket; the new
    * batch compresses against the PERSISTED frozen models; probes serve
    * from the three tables only, with the probed buckets statically
    * pruned at the codes scan
    * ([[graft.operators.Similarity.ivfPqProbeTopK]]). */
  private def q236(s: SparkSession, dir: String): DataFrame = {
    val suffix = lifecycleScratchSuffix(s, "q236", dir)
    val emb = Tables.embeddings(s, dir)
    val initial = emb.where(col("vec_id") % 7 =!= 0)
    val batch = emb.where(col("vec_id") % 7 === 0)
    val centTable = s"graft_q236_pq_centroids_$suffix"
    val bookTable = s"graft_q236_pq_codebooks_$suffix"
    val codesPath = s"/tmp/graft_q236_pq_codes_$suffix"
    val (cent, books, codes) = graft.operators.Similarity.ivfPqIndexBuild(
      initial, "vec_id", "embedding", nCoarse = 8, m = 4, ksub = 4, rounds = 2)
    Tables.saveTable(cent, centTable)
    Tables.saveTable(books, bookTable)
    Tables.writePartitioned(codes, codesPath, "cluster")
    Tables.appendPartitioned(
      graft.operators.Similarity.ivfPqIndexAppend(batch,
        s.table(centTable), s.table(bookTable), "vec_id", "embedding"),
      codesPath, "cluster")
    graft.operators.Similarity.ivfPqProbeTopK(
        emb.where(col("vec_id") % 50 === 0), s.table(centTable),
        s.table(bookTable), s.read.parquet(codesPath),
        "vec_id", "embedding", k = 10, probes = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Friedman + Kendall's W: do the languages rank consistently on
    * total quality across length-bucket BLOCKS — the repeated-measures
    * read where q230's KW pools rows (block-level shifts cancel here);
    * cells are the per-(bucket, language) exact quality sums
    * ([[graft.operators.Eval.friedmanTest]]). */
  private def q235(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.friedmanTest(
      Tables.documents(s, dir)
        .select(expr("least(n_chars DIV 200, 7)").as("bucket"), col("lang"),
          (floor(Text.qualityScore(col("text"), stop) * lit(1e6))
            .cast("long")).as("qu"))
        .groupBy(col("bucket"), col("lang"))
        .agg(sum(expr("qu DIV 16384")).as("cell")),
      blockCol = "bucket", groupCol = "lang", valueCol = col("cell"))
  }

  /** Jonckheere–Terpstra ordered trend: does the quality score tend UP
    * with the ordered length bucket — q229's dose framing for a
    * CONTINUOUS response on q230's quantized score universe; all power
    * on the ordered alternative where q230's KW spreads it over any
    * difference ([[graft.operators.Eval.jonckheereTerpstra]]). */
  private def q237(s: SparkSession, dir: String): DataFrame = {
    val stop = Text.langMarkers.toMap.apply("en")
    graft.operators.Eval.jonckheereTerpstra(
      Tables.documents(s, dir)
        .select(expr("least(n_chars DIV 250, 3)").as("bucket"),
          floor(Text.qualityScore(col("text"), stop) * lit(1e6))
            .cast("long").as("qu")),
      groupCol = col("bucket"), valueCol = expr("qu DIV 16384"),
      bucketOf = v => shiftright(v, 3))
  }

  /** Hadamard-rotated PQ — q231's compressed-index ANN read with the
    * OPQ-style structured rotation in front (y = H·D·x, exact ±1
    * integer rotation, distances scale uniformly by dim): codebooks
    * train on the rotated vectors, the ADC scan runs verbatim
    * ([[graft.operators.Similarity.pqRotatedTopK]]); the oracle replays
    * the identical ±1 rotation rows as a generated CTE ahead of q231's
    * four per-subspace Lloyd chains. */
  private def q238(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.operators.Similarity.pqRotatedTopK(
        emb.where(col("vec_id") % 100 === 0), emb, "vec_id", "embedding",
        k = 10, m = 4, ksub = 4, rounds = 2, seed = 42L)
      .orderBy(col("query_id"), col("rank"))
  }

  // =====================================================================
  // DuckDB oracle SQL — same semantics, same column names, same ORDER BY.
  // =====================================================================

  def oracleSql: Map[String, String] = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    // q128/q137 share the decayed-score body; only the tail order differs
    val decayedScoreSql =
      """WITH s AS (
           SELECT user_id, epoch_us(ts) // 14400000000 AS step,
             CAST(floor(greatest(value, 0.0) * 100.0) AS BIGINT) AS qv
           FROM events),
         r AS (SELECT max(step) AS ref FROM s)
         SELECT user_id,
           CAST(sum(CASE WHEN ref - step <= 20
             THEN qv << CAST(20 - (ref - step) AS INTEGER)
             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS score,
           CAST(sum(CASE WHEN ref - step <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
           CAST(max(ref) AS BIGINT) AS ref_step
         FROM s CROSS JOIN r
         GROUP BY user_id"""
    val toks = s"list_filter(string_split($norm, ' '), t -> len(t) > 0)"
    def shingles(n: Int) =
      s"CASE WHEN len(toks) <= $n THEN [array_to_string(toks, ' ')] " +
      s"ELSE list_transform(range(0, len(toks) - $n + 1), i -> array_to_string(list_slice(toks, i + 1, i + $n), ' ')) END"
    // Dedup.shingleKey mirror: first 60 bits of md5 as a BIGINT — the
    // inverted-index family (q20/q39/q42) computes over this hashed
    // universe on BOTH engines, so results stay hash-checkable
    def hashedShingles(n: Int) =
      s"list_transform(list_distinct(${shingles(n)}), s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))"

    // N generated BPE rounds (q163/q164 share this chain with the
    // engine's parameterized loop): w0 = marker-encoded (w, freq)
    // universe; per round r, p_r counts adjacent symbol pairs, t_r picks
    // the (count desc, a, b) winner, w_r applies the merge by the
    // marker-safe replace
    def bpeCtes(n: Int): String = {
      val head =
        s"""w0 AS (
             SELECT w, CAST(count(*) AS BIGINT) AS freq,
               regexp_replace(w, '(.)', chr(1) || '\\1' || chr(1), 'g') AS e
             FROM (SELECT unnest($toks) AS w FROM documents) t
             GROUP BY w HAVING length(w) > 1 AND strpos(w, chr(1)) = 0)"""
      val rounds = (1 to n).map { r =>
        s""",
           p$r AS (
             SELECT syms[CAST(i AS INTEGER)] AS a,
               syms[CAST(i AS INTEGER) + 1] AS b, freq
             FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
                   FROM (SELECT freq, list_filter(string_split(e, chr(1)), x -> len(x) > 0) AS syms
                         FROM w${r - 1}) s
                   WHERE len(syms) > 1) t),
           t$r AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count FROM p$r
                   GROUP BY a, b ORDER BY pair_count DESC, a, b LIMIT 1),
           w$r AS (SELECT freq, w,
                     replace(e, chr(1) || t$r.a || chr(1) || chr(1) || t$r.b || chr(1),
                       chr(1) || t$r.a || t$r.b || chr(1)) AS e
                   FROM w${r - 1} CROSS JOIN t$r)"""
      }.mkString
      head + rounds
    }

    // q24's composite quality score as a bare expression over `text` —
    // shared verbatim by q61's canonical pick (same IEEE-exact value)
    def qualitySql(toks: String) =
      s"""least(greatest(
             least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
             + (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                 / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3
             + least(CAST(len(list_filter($toks, t -> list_contains(['the','a','of','and','is','to','in','that'], t))) AS DOUBLE)
                 / greatest(CAST(len($toks) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3,
             0.0), 1.0)"""

    // the exact-k-means Lloyd trajectory as a generated CTE chain
    // (q163's BPE scheme): micro-quantized points, k smallest-id seeds,
    // per round argmin assignment (ties to the smaller cluster) and the
    // nonneg-mod floor-division centroid mean with empty-cluster carry;
    // ends at cent_<rounds>, the final assignment a_f, and sizes sz —
    // shared by q218 (the centroid table), q219 (exact IVF on top), and
    // q227 (the persisted lifecycle, whose trainPred restricts training
    // to the initial corpus while a_f still assigns EVERY row — exactly
    // build + frozen-centroid append)
    def kmeansChainSql(k: Int, rounds: Int, trainPred: String = "TRUE") = {
      val chain = (1 to rounds).map { r =>
        s"""dist_$r AS (SELECT px.vec_id, c.c,
               sum((px.x - c.v) * (px.x - c.v)) AS dist
             FROM tpx px JOIN cent_${r - 1} c ON px.d = c.d
             GROUP BY 1, 2),
           a_$r AS (SELECT vec_id, c FROM (
               SELECT vec_id, c,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
               FROM dist_$r) t WHERE rn = 1),
           nc_$r AS (SELECT a.c, px.d,
               CAST((sum(px.x) - ((sum(px.x) % count(*) + count(*)) % count(*)))
                 // count(*) AS BIGINT) AS v
             FROM a_$r a JOIN tpx px ON px.vec_id = a.vec_id
             GROUP BY 1, 2),
           cent_$r AS (SELECT p.c, p.d, coalesce(n.v, p.v) AS v
             FROM cent_${r - 1} p LEFT JOIN nc_$r n ON n.c = p.c AND n.d = p.d)"""
      }.mkString(",\n           ")
      s"""pts AS (
             SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS q
             FROM embeddings),
           px AS (SELECT vec_id, unnest(q) AS x, unnest(range(len(q))) AS d
                  FROM pts),
           tpx AS (SELECT * FROM px WHERE $trainPred),
           sel AS (SELECT vec_id FROM pts WHERE $trainPred ORDER BY vec_id LIMIT $k),
           cent_0 AS (SELECT CAST(dense_rank() OVER (ORDER BY s.vec_id) AS BIGINT) AS c,
               px.d, px.x AS v
             FROM sel s JOIN px ON px.vec_id = s.vec_id),
           $chain,
           dist_f AS (SELECT px.vec_id, c.c,
               sum((px.x - c.v) * (px.x - c.v)) AS dist
             FROM px JOIN cent_$rounds c ON px.d = c.d
             GROUP BY 1, 2),
           a_f AS (SELECT vec_id, c FROM (
               SELECT vec_id, c,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
               FROM dist_f) t WHERE rn = 1),
           sz AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM a_f GROUP BY c)"""
    }

    // one PQ subspace as a generated CTE block (the kmeansChainSql
    // scheme re-based onto a caller-supplied point table `pxDef` —
    // a list_slice of the quantized vector for flat PQ, a slice of the
    // coarse RESIDUALS for IVF-PQ): per-subspace Lloyd chain, final
    // distance table distf_j, full assignment af_j
    def pqSubChainSql(j: Int, dsub: Int, rounds: Int, pxDef: String,
                      selName: String, trainPred: String = "TRUE") = {
      val chain = (1 to rounds).map { r =>
        s"""dist${r}_$j AS (SELECT px.vec_id, c.c,
               sum((px.x - c.v) * (px.x - c.v)) AS dist
             FROM tpx_$j px JOIN cent${r - 1}_$j c ON px.d = c.d
             GROUP BY 1, 2),
           a${r}_$j AS (SELECT vec_id, c FROM (
               SELECT vec_id, c,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
               FROM dist${r}_$j) t WHERE rn = 1),
           nc${r}_$j AS (SELECT a.c, px.d,
               CAST((sum(px.x) - ((sum(px.x) % count(*) + count(*)) % count(*)))
                 // count(*) AS BIGINT) AS v
             FROM a${r}_$j a JOIN tpx_$j px ON px.vec_id = a.vec_id
             GROUP BY 1, 2),
           cent${r}_$j AS (SELECT p.c, p.d, coalesce(n.v, p.v) AS v
             FROM cent${r - 1}_$j p LEFT JOIN nc${r}_$j n ON n.c = p.c AND n.d = p.d)"""
      }.mkString(",\n           ")
      s"""px_$j AS ($pxDef),
           tpx_$j AS (SELECT * FROM px_$j WHERE $trainPred),
           cent0_$j AS (SELECT CAST(dense_rank() OVER (ORDER BY s.vec_id) AS BIGINT) AS c,
               px.d, px.x AS v
             FROM $selName s JOIN px_$j px ON px.vec_id = s.vec_id),
           $chain,
           distf_$j AS (SELECT px.vec_id, c.c,
               sum((px.x - c.v) * (px.x - c.v)) AS dist
             FROM px_$j px JOIN cent${rounds}_$j c ON px.d = c.d
             GROUP BY 1, 2),
           af_$j AS (SELECT vec_id, c FROM (
               SELECT vec_id, c,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
               FROM distf_$j) t WHERE rn = 1)"""
    }
    def pqSlicePx(j: Int, dsub: Int, src: String) =
      s"""SELECT vec_id,
             unnest(list_slice(q, ${j * dsub + 1}, ${j * dsub + dsub})) AS x,
             unnest(range($dsub)) AS d FROM $src"""

    // the one-way ANOVA CTE block over a source CTE with columns (g, y):
    // per-group exact sums, both divisions floor-quantized micro at
    // their sites (numerators >= 0 so // == floor), F the trailing IEEE
    // chain — anovaOneWay's arithmetic verbatim; shared by q233/q234
    def anovaSql(src: String) =
      s"""pg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
                    CAST(sum(y) AS BIGINT) AS sg,
                    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS ssg
                  FROM $src GROUP BY g),
           tgv AS (SELECT ng, sg, ssg,
                    (CAST(sg AS HUGEINT) * sg * 1000000)
                      // CAST(ng AS HUGEINT) AS tgq
                  FROM pg),
           tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(sg) AS HUGEINT) AS s,
                     CAST(sum(ssg) AS HUGEINT) AS ss,
                     CAST(sum(tgq) AS HUGEINT) AS st
                   FROM tgv),
           fin AS (SELECT n, k, ss, st,
                     (s * s * 1000000) // CAST(n AS HUGEINT) AS tn
                   FROM tot)
           SELECT n, k AS k_groups,
             CAST(st - tn AS DOUBLE) AS ssb_micro,
             CAST(ss * 1000000 - st AS DOUBLE) AS ssw_micro,
             CASE WHEN k >= 2 AND n > k AND ss * 1000000 - st > 0 THEN
               (CAST(st - tn AS DOUBLE) / CAST(k - 1 AS DOUBLE))
                 / (CAST(ss * 1000000 - st AS DOUBLE) / CAST(n - k AS DOUBLE))
             END AS f
           FROM fin"""

    // near-dup cluster closure (hashed-shingle Jaccard edges → recursive
    // reachability → min-label component) — the CTE block q39 and q61 share
    def clusterCtes(toks: String, hs: String) =
      s"""sh AS (
             SELECT doc_id AS id, unnest($hs) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents) d),
           filtered AS (
             SELECT id, s FROM (
               SELECT id, s, count(*) OVER (PARTITION BY s) AS df FROM sh) t
             WHERE df <= 50),
           sizes AS (SELECT id, count(*) AS n_sh FROM filtered GROUP BY id),
           prs AS (
             SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
             FROM filtered a JOIN filtered b ON a.s = b.s AND a.id < b.id
             GROUP BY 1, 2),
           pairs AS (
             SELECT id_a, id_b FROM prs
             JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
             WHERE CAST(shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - shared AS DOUBLE) >= 0.5),
           edges AS (
             SELECT id_a AS s, id_b AS d FROM pairs
             UNION ALL SELECT id_b AS s, id_a AS d FROM pairs),
           reach(id, r) AS (
             SELECT DISTINCT s AS id, s AS r FROM edges
             UNION
             SELECT e.s AS id, reach.r FROM edges e JOIN reach ON e.d = reach.id),
           comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)"""

    // one-sided containment decontamination — q42 and q60 are
    // result-identical by construction, so they share this oracle
    def decontaminateSql(toks: String, hs: String) =
      s"""WITH cs AS (
             SELECT doc_id AS corpus_id, unnest($hs) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id % 10 <> 0) d),
           ps AS (
             SELECT doc_id AS probe_id, unnest($hs) AS s
             FROM (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id % 10 = 0) d),
           stop AS (SELECT s FROM cs GROUP BY s HAVING count(*) > 50),
           csb AS (SELECT * FROM cs WHERE s NOT IN (SELECT s FROM stop)),
           psb AS (SELECT * FROM ps WHERE s NOT IN (SELECT s FROM stop)),
           sizes AS (SELECT probe_id, count(*) AS n_sh FROM psb GROUP BY probe_id),
           shared AS (
             SELECT corpus_id, probe_id, count(*) AS shared
             FROM csb JOIN psb USING (s) GROUP BY 1, 2)
           SELECT corpus_id, probe_id,
             CAST(shared AS DOUBLE) / CAST(n_sh AS DOUBLE) AS containment
           FROM shared JOIN sizes USING (probe_id)
           WHERE CAST(shared AS DOUBLE) / CAST(n_sh AS DOUBLE) >= 0.5
           ORDER BY corpus_id, probe_id"""

    // the sig/band CTE chain for one side of the incremental-dedup oracle
    // (q63/q66), prefixed to keep names apart: q18's two-hash family
    def bandChain(p: String, where: String) =
      s"""${p}ex AS (
           SELECT doc_id AS id, unnest(list_distinct(${shingles(3)})) AS s
           FROM (SELECT doc_id, $toks AS toks FROM documents WHERE $where) d),
         ${p}hv AS (
           SELECT id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h1,
                      ('0x' || substr(md5(s), 9, 8))::BIGINT AS h2
           FROM ${p}ex),
         ${p}sig AS (
           SELECT id, [${(0 until 16).map(i => s"min((h1 + $i * h2) % 4294967291)").mkString(", ")}] AS sig
           FROM ${p}hv GROUP BY id),
         ${p}band AS (
           SELECT id, unnest(list_transform(range(0, 4), b ->
             CAST(b AS VARCHAR) || ':' || md5(array_to_string(list_slice(sig, b * 4 + 1, b * 4 + 4), '|')))) AS band
           FROM ${p}sig)"""

    // the full incremental-dedup status machinery (q63's oracle body,
    // shared with q66's index update): batch vs index fingerprints and
    // bands, min-id within-batch tie-breaks
    val incDedupCtes =
      s"""${bandChain("b", "doc_id % 5 = 0")},
         ${bandChain("i", "doc_id % 5 <> 0")},
         bfp AS (SELECT doc_id AS id, md5($norm) AS fp FROM documents WHERE doc_id % 5 = 0),
         ifp AS (SELECT DISTINCT md5($norm) AS fp FROM documents WHERE doc_id % 5 <> 0),
         ex AS (
           SELECT id, fp, (fp IN (SELECT fp FROM ifp)
             OR min(id) OVER (PARTITION BY fp) < id) AS is_exact
           FROM bfp),
         bb AS (
           SELECT id, (band IN (SELECT band FROM iband)
             OR min(id) OVER (PARTITION BY band) < id) AS hit
           FROM bband),
         nh AS (SELECT id, bool_or(hit) AS near_hit FROM bb GROUP BY id)"""

    // band-key array joined to one string, from a side's sig CTE
    def bandsStr(sigTable: String) =
      s"""SELECT id, array_to_string(list_transform(range(0, 4), b ->
          CAST(b AS VARCHAR) || ':' || md5(array_to_string(list_slice(sig, b * 4 + 1, b * 4 + 4), '|'))), ',') AS bands_str
          FROM $sigTable"""

    Map(
      "q01_group_agg" ->
        s"""SELECT l_returnflag, l_linestatus,
           CAST(sum(${C.format("l_quantity")}) AS BIGINT) AS sum_qty_c,
           CAST(sum(${C.format("l_extendedprice")}) AS BIGINT) AS sum_price_c,
           CAST(sum(${C.format("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT) AS sum_disc_price_c,
           count(*) AS n_rows
           FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

      "q02_filter_pushdown" ->
        s"""SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
           count(*) AS n_rows
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             AND l_discount >= 0.05 AND l_quantity < 25.0""",

      "q03_join_agg" ->
        s"""SELECT n_name, CAST(sum(${C.format("o_totalprice")}) AS BIGINT) AS revenue_c,
           count(*) AS n_orders
           FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name""",

      "q04_topk" ->
        s"""SELECT c_custkey, c_name, revenue_c FROM (
             SELECT o_custkey, CAST(sum(${C.format("o_totalprice")}) AS BIGINT) AS revenue_c
             FROM orders GROUP BY o_custkey) r
           JOIN customer ON o_custkey = c_custkey
           ORDER BY revenue_c DESC, c_custkey ASC LIMIT 10""",

      "q05_semi_join" ->
        """SELECT c_custkey, c_mktsegment FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
           ORDER BY c_custkey""",

      "q06_anti_join" ->
        """SELECT c_custkey, c_name FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           ORDER BY c_custkey""",

      "q07_set_ops" ->
        """SELECT k, 'has_orders' AS tag FROM (
             SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
             INTERSECT SELECT o_custkey AS k FROM orders)
           UNION ALL
           SELECT k, 'no_orders' AS tag FROM (
             SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
             EXCEPT SELECT o_custkey AS k FROM orders)
           ORDER BY tag, k""",

      "q08_distinct_agg" ->
        """SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders, count(*) AS n_rows
           FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",

      "q09_window_topn" ->
        s"""SELECT o_custkey, rn, o_orderkey, price_c FROM (
             SELECT o_custkey, o_orderkey, ${C.format("o_totalprice")} AS price_c,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             FROM orders) t
           WHERE rn <= 3 ORDER BY o_custkey, rn""",

      "q10_running_sum" ->
        s"""SELECT event_id, user_id,
           CAST(sum(${C.format("value")}) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
           FROM events ORDER BY event_id""",

      "q41_keyed_accumulate" ->
        s"""SELECT event_id, user_id,
           CAST(sum(${C.format("value")}) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
           FROM events ORDER BY event_id""",

      "q11_lag_lead" ->
        """SELECT event_id, user_id,
           coalesce(lag(event_id) OVER w, -1) AS prev_event_id,
           coalesce(lead(event_id) OVER w, -1) AS next_event_id,
           coalesce(epoch_ms(ts) - epoch_ms(lag(ts) OVER w), -1) AS gap_ms
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           ORDER BY event_id""",

      "q12_rollup" ->
        s"""SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
           CAST(sum(${C.format("l_quantity")}) AS BIGINT) AS sum_qty_c, count(*) AS n_rows
           FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           ORDER BY flag, status""",

      "q27_cube" ->
        s"""SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(sum(${C.format("o_totalprice")}) AS BIGINT) AS sum_price_c, count(*) AS n_orders
           FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
           ORDER BY status, priority""",

      "q26_json" ->
        """SELECT event_type, CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
           FROM events GROUP BY event_type ORDER BY event_type""",

      "q13_wordcount" ->
        """SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
             SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word FROM documents) t
           WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 100""",

      "q14_tumbling_agg" ->
        """SELECT event_type, CAST(floor(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS ws_ms,
           CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2 ORDER BY event_type, ws_ms""",

      "q15_sliding_agg" ->
        """SELECT event_type, ws_ms, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT event_type,
               unnest([CAST(floor(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT),
                       CAST(floor(epoch_ms(ts) / 3600000) * 3600000 - 3600000 AS BIGINT)]) AS ws_ms
             FROM events) t
           GROUP BY 1, 2 ORDER BY event_type, ws_ms""",

      "q16_session_agg" ->
        """WITH flagged AS (
             SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000 THEN 1 ELSE 0 END AS ns
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
           sessions AS (
             SELECT user_id, ts,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM flagged)
           SELECT user_id, CAST(min(epoch_ms(ts)) AS BIGINT) AS start_ms,
             CAST(max(epoch_ms(ts)) AS BIGINT) AS end_ms, count(*) AS n_events
           FROM sessions GROUP BY user_id, sid ORDER BY user_id, start_ms""",

      "q29_map_accumulate" ->
        s"""SELECT event_id,
           CAST(sum(${C.format("value")}) OVER (
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
           FROM events ORDER BY event_id""",

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

      // same synthetic-PII enrichment, same replacement order; patterns are
      // restricted to Java-regex/RE2-common syntax so both engines agree
      "q51_pii_redact" ->
        """SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                        || ' or +1415555' || CAST(doc_id % 10000 AS VARCHAR),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '(\d{1,3}\.){3}\d{1,3}', '<IP>', 'g'),
               '\+\d{7,15}', '<PHONE>', 'g') AS redacted
           FROM documents ORDER BY doc_id""",

      // DuckDB dayofweek is 0=Sunday..6; the engine (and SQL convention)
      // uses 1=Sunday..7 — hence the +1
      "q50_facade_dateparts" ->
        """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hod, count(*) AS n
           FROM events GROUP BY 1, 2 ORDER BY dow, hod""",

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

      "q21_cosine_topk" ->
        """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
           scored AS (
             SELECT query_id, c.vec_id AS neighbor_id,
               CASE WHEN sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(range(1, len(qv) + 1), i ->
                           CAST(qv[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                         / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                            * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               END AS cosine
             FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
           ranked AS (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
             FROM scored)
           SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 10
           ORDER BY query_id, rank""",

      // q22: the LSH mechanism replayed move for move — 24 plan-time
      // hyperplanes (4 tables × 6 planes, seeds t*1000+p) inlined as SQL
      // literals, corpus base buckets, query-directed multiprobe (flip the
      // 3 planes with the smallest |projection|, ties by plane index —
      // list_sort over {d, idx} structs ≡ Spark's sort_array), then q21's
      // exact-cosine re-rank. Deterministic end to end, so hash-checkable
      // despite being an approximate ANN.
      "q22_ann_lsh" -> {
        def hp(t: Int, p: Int): String =
          graft.functions.Vectors.hyperplane(t * 1000 + p, EmbeddingDim)
            .map(_.toString).mkString("[", ", ", "]")
        def proj(vec: String, t: Int, p: Int): String =
          s"list_sum(list_transform(range(1, ${EmbeddingDim + 1}), i -> " +
            s"CAST($vec[i] AS DOUBLE) * (${hp(t, p)})[i]))"
        def bit(vec: String, t: Int, p: Int): String =
          s"(CASE WHEN ${proj(vec, t, p)} >= 0 THEN '1' ELSE '0' END)"
        val corpusVariants = (0 until 4).map { t =>
          s"'$t:' || ${(0 until 6).map(p => bit("embedding", t, p)).mkString(" || ")}"
        }.mkString("[", ", ", "]")
        val prCols = (0 until 4).map { t =>
          (0 until 6).map(p => proj("embedding", t, p)).mkString("[", ", ", "]") +
            s" AS pr$t"
        }.mkString(", ")
        val baseCols = (0 until 4).map { t =>
          (0 until 6).map(p =>
            s"(CASE WHEN pr$t[${p + 1}] >= 0 THEN '1' ELSE '0' END)")
            .mkString(" || ") + s" AS base$t"
        }.mkString(", ")
        val ordCols = (0 until 4).map { t =>
          "list_sort(" + (0 until 6).map(p =>
            s"{'d': abs(pr$t[${p + 1}]), 'idx': $p}").mkString("[", ", ", "]") +
            s") AS ord$t"
        }.mkString(", ")
        def flip(t: Int, n: Int): String = {
          val j = s"ord$t[$n].idx"
          s"substr(base$t, 1, $j) || (CASE WHEN substr(base$t, $j + 1, 1) = '1' " +
            s"THEN '0' ELSE '1' END) || substr(base$t, $j + 2, 5 - $j)"
        }
        val queryVariants = (0 until 4).flatMap { t =>
          s"'$t:' || base$t" +: (1 to 3).map(n => s"'$t:' || (${flip(t, n)})")
        }.mkString("[", ", ", "]")
        s"""WITH qp AS (
             SELECT vec_id, embedding, $prCols
             FROM embeddings WHERE vec_id % 100 = 0),
           qs AS (SELECT vec_id, embedding, $baseCols, $ordCols FROM qp),
           qv AS (SELECT vec_id, embedding, unnest($queryVariants) AS bucket FROM qs),
           cb AS (SELECT vec_id AS neighbor_id, unnest($corpusVariants) AS bucket
                  FROM embeddings),
           cand AS (
             SELECT DISTINCT qv.vec_id AS query_id, cb.neighbor_id
             FROM qv JOIN cb USING (bucket) WHERE cb.neighbor_id <> qv.vec_id),
           scored AS (
             SELECT query_id, neighbor_id,
               CASE WHEN sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(range(1, len(q.embedding) + 1), i ->
                           CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                         / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                            * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               END AS cosine
             FROM cand
             JOIN embeddings q ON q.vec_id = cand.query_id
             JOIN embeddings c ON c.vec_id = cand.neighbor_id),
           ranked AS (
             SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
             FROM scored)
           SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10
           ORDER BY query_id, rank"""
      },

      "q23_langid" ->
        s"""WITH langs AS (
             SELECT * FROM (VALUES
               ('de', ['der','die','das','und','ist','nicht','ein','mit']),
               ('en', ['the','a','of','and','is','to','in','that']),
               ('es', ['el','la','de','que','y','es','en','un']),
               ('fr', ['le','la','les','de','et','est','un','une']),
               ('zh', ['de','shi','bu','le','zai','you','wo','ta'])) l(lang, words)),
           scores AS (
             SELECT doc_id, langs.lang AS cand,
               len(list_filter($toks, t -> list_contains(words, t))) AS hits
             FROM documents CROSS JOIN langs),
           best AS (
             SELECT doc_id, cand, hits,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand ASC) AS rn
             FROM scores)
           SELECT doc_id, CASE WHEN hits > 0 THEN cand ELSE 'und' END AS lang_pred
           FROM best WHERE rn = 1 ORDER BY doc_id""",

      "q24_quality" ->
        s"""SELECT doc_id,
           CAST(len($toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
             / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
           CAST(coalesce(list_sum(list_transform($toks, t -> CAST(length(t) AS BIGINT))), 0) AS DOUBLE)
             / greatest(CAST(len($toks) AS DOUBLE), 1.0) AS mean_tok_len,
           least(greatest(
             least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.4
             + (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                 / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3
             + least(CAST(len(list_filter($toks, t -> list_contains(['the','a','of','and','is','to','in','that'], t))) AS DOUBLE)
                 / greatest(CAST(len($toks) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3,
             0.0), 1.0) AS quality
           FROM documents ORDER BY doc_id""",

      "q25_asof_join" ->
        """SELECT p.event_id, p.user_id, CAST(epoch_ms(p.ts) AS BIGINT) AS ts_ms,
           coalesce(c.click_event_id, -1) AS click_event_id
           FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_event_id FROM events WHERE event_type = 'click') c
             ON p.user_id = c.user_id AND p.ts >= c.ts
           ORDER BY p.event_id""",

      "q37_asof_native" ->
        """SELECT p.event_id, p.user_id, CAST(epoch_ms(p.ts) AS BIGINT) AS ts_ms,
           coalesce(c.click_event_id, -1) AS click_event_id
           FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_event_id FROM events WHERE event_type = 'click') c
             ON p.user_id = c.user_id AND p.ts >= c.ts
           ORDER BY p.event_id""",

      "q40_det_sample" ->
        s"""SELECT doc_id, lang FROM documents
           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
             CASE WHEN lang = 'en' THEN '${graft.operators.Sampling.thresholdHex(0.2)}'
                  ELSE '${graft.operators.Sampling.thresholdHex(0.6)}' END
           ORDER BY doc_id""",

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

      "q43_text_clean" ->
        """SELECT doc_id,
           substr(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'), '\s+', ' ', 'g')), 1, 200) AS cleaned
           FROM documents ORDER BY doc_id""",

      "q44_split_assign" ->
        s"""SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${graft.operators.Sampling.thresholdHex(0.8)}' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${graft.operators.Sampling.thresholdHex(0.9)}' THEN 'val'
                ELSE 'test' END AS split
           FROM documents ORDER BY doc_id""",

      "q45_repetition" -> {
        def rep(n: Int) =
          s"CASE WHEN len(${shingles(n)}) <= 1 THEN 0.0 " +
          s"ELSE 1.0 - CAST(len(list_distinct(${shingles(n)})) AS DOUBLE) / CAST(len(${shingles(n)}) AS DOUBLE) END"
        s"""SELECT doc_id, ${rep(1)} AS rep_1gram, ${rep(3)} AS rep_3gram
           FROM (SELECT doc_id, $toks AS toks FROM documents) d
           ORDER BY doc_id"""
      },

      "q46_percentiles" ->
        s"""SELECT l_returnflag,
           quantile_cont(${C.format("l_extendedprice")}, 0.5) AS p50_c,
           quantile_cont(${C.format("l_extendedprice")}, 0.95) AS p95_c,
           count(*) AS n_rows
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

      "q47_histogram" ->
        s"""SELECT CAST(floor(l_quantity / 10.0) AS BIGINT) AS bucket,
           count(*) AS n_rows,
           CAST(sum(${C.format("l_extendedprice")}) AS BIGINT) AS sum_price_c
           FROM lineitem GROUP BY 1 ORDER BY bucket""",

      "q48_salted_join" ->
        s"""SELECT o_orderpriority, count(*) AS n_items,
           CAST(sum(${C.format("l_quantity")}) AS BIGINT) AS sum_qty_c
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",

      // plain (unsalted) join over the same planted-hot-key derivation —
      // salting must not change a single row
      "q54_skewed_salted_join" ->
        s"""WITH o AS (
             SELECT CASE WHEN o_custkey % 10 < 7 THEN 1 ELSE o_custkey END AS k,
               ${C.format("o_totalprice")} AS price_c FROM orders)
           SELECT c_mktsegment, count(*) AS n_orders,
             CAST(sum(price_c) AS BIGINT) AS sum_price_c
           FROM o JOIN customer ON k = c_custkey
           GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      // identical arithmetic pipeline: per-domain count → sqrt weight →
      // rate (same left-to-right double op order) → md5-prefix threshold
      // compared as a 32-bit integer
      "q55_temperature_mix" ->
        """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
           tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nrows, sum(sqrt(CAST(n AS DOUBLE))) AS wsum FROM counts),
           rates AS (
             SELECT lang,
               CAST(round(least(1.0, 0.5 * nrows * sqrt(CAST(n AS DOUBLE)) / wsum / CAST(n AS DOUBLE))
                 * 4294967296.0) AS BIGINT) AS thr
             FROM counts CROSS JOIN tot)
           SELECT doc_id, lang FROM documents JOIN rates USING (lang)
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < thr
           ORDER BY doc_id""",

      // the exact waterfill, mirrored op for op: sentinel row for the
      // nothing-capped case, cumulative sums in saturation order, the
      // per-prefix lambda candidates with their validity window, min valid
      // lambda applied as min(1, lambda*w/n) — identical double arithmetic
      "q58_waterfill_mix" ->
        """WITH counts AS (
             SELECT lang AS d, CAST(count(*) AS DOUBLE) AS nd,
               sqrt(CAST(count(*) AS DOUBLE)) AS wd
             FROM documents GROUP BY lang),
           u AS (
             SELECT d, nd, wd, nd / wd AS lam FROM counts
             UNION ALL SELECT NULL, 0.0, 0.0, 0.0),
           o AS (
             SELECT d, nd, wd, lam,
               sum(nd) OVER (ORDER BY lam ASC, d ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumN,
               sum(wd) OVER (ORDER BY lam ASC, d ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumW,
               sum(nd) OVER () AS tot,
               sum(wd) OVER () AS wtot,
               lead(lam, 1) OVER (ORDER BY lam ASC, d ASC) AS nxt
             FROM u),
           lamt AS (
             SELECT d, nd, wd,
               coalesce(min(CASE WHEN (wtot - cumW > 0)
                       AND ((0.85 * tot - cumN) / (wtot - cumW)) >= lam
                       AND (nxt IS NULL OR ((0.85 * tot - cumN) / (wtot - cumW)) <= nxt)
                     THEN (0.85 * tot - cumN) / (wtot - cumW) END) OVER (), 1e18) AS lamstar
             FROM o),
           rates AS (
             SELECT d, CAST(round(least(1.0, lamstar * wd / nd) * 4294967296.0) AS BIGINT) AS thr
             FROM lamt WHERE nd > 0)
           SELECT doc_id, lang FROM documents JOIN rates ON lang = rates.d
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < thr
           ORDER BY doc_id""",

      // the same next-fit transition as the engine's keyed accumulate,
      // unrolled sequentially per lang by a recursive CTE. The anchor is
      // the transition applied to the initial state (fill=0, seq=0):
      // off = 0 and fill = n either way; seq = 1 only if a lone document
      // already overflows the budget (never on this corpus, but the
      // formula keeps the semantics aligned, not data-dependent).
      "q57_nextfit_packing" ->
        s"""WITH RECURSIVE sized AS (
             SELECT lang, doc_id, CAST(len($toks) AS BIGINT) AS n,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             FROM documents),
           packed AS (
             SELECT lang, doc_id, n, rn,
               CASE WHEN n > 128 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS seq_idx,
               CAST(0 AS BIGINT) AS seq_off,
               n AS fill
             FROM sized WHERE rn = 1
             UNION ALL
             SELECT s.lang, s.doc_id, s.n, s.rn,
               CASE WHEN p.fill + s.n > 128 THEN p.seq_idx + 1 ELSE p.seq_idx END,
               CASE WHEN p.fill + s.n > 128 THEN CAST(0 AS BIGINT) ELSE p.fill END,
               CASE WHEN p.fill + s.n > 128 THEN s.n ELSE p.fill + s.n END
             FROM sized s JOIN packed p ON s.lang = p.lang AND s.rn = p.rn + 1)
           SELECT doc_id, lang, n AS n_tokens, seq_idx, seq_off
           FROM packed ORDER BY doc_id""",

      // the engine's distributed prefix sum must equal this plain global
      // window cumsum — chunk assignment is pure integer arithmetic
      "q56_sequence_packing" ->
        s"""WITH sized AS (
             SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
           cum AS (
             SELECT doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) - n_tokens AS start
             FROM sized)
           SELECT doc_id, n_tokens, start // 256 AS seq_id, start % 256 AS seq_off,
             (start + CASE WHEN n_tokens > 0 THEN n_tokens - 1 ELSE 0 END) // 256 AS end_seq_id
           FROM cum ORDER BY doc_id""",

      "q38_topk_sketch" ->
        """SELECT word, cnt FROM (
             SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
               SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word FROM documents) t
             WHERE word <> '' GROUP BY word
             ORDER BY cnt DESC, word LIMIT 20) x
           ORDER BY cnt DESC, word""",

      "q31_grouping_sets" ->
        s"""SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
           CAST(sum(${C.format("l_quantity")}) AS BIGINT) AS sum_qty_c, count(*) AS n_rows
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
           ORDER BY flag, status""",

      "q32_nested_groupby" ->
        """SELECT l_returnflag AS flag, l_linestatus AS status, count(*) AS n_rows
           FROM lineitem GROUP BY 1, 2 ORDER BY flag, status""",

      // The LSH-blocked near-dup: the oracle reproduces the ENGINE's bucket
      // bit-for-bit — each hyperplane is the same deterministic array the
      // Spark plan bakes in (inlined below as a SQL literal), the projection
      // is the same left-to-right double dot product, and the verify is the
      // same exact cosine. Approximate operator, exact oracle.
      "q33_embedding_neardup" -> {
        val planes = (0 until 6).map { p =>
          val hp = graft.functions.Vectors.hyperplane(p, EmbeddingDim)
            .map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_sum(list_transform(range(1, ${EmbeddingDim + 1}), i -> " +
            s"CAST(embedding[i] AS DOUBLE) * ($hp)[i])) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""WITH b AS (
           SELECT vec_id, embedding, $planes AS bucket FROM embeddings)
           SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
           FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
           WHERE CASE WHEN sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                       * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
                  THEN 0.0
                  ELSE list_sum(list_transform(range(1, len(a.embedding) + 1), i ->
                         CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
             END >= 0.35
           ORDER BY id_a, id_b"""
      },

      "q35_fingerprint" ->
        s"""SELECT doc_id, md5($norm) AS md5_fp,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(list_filter(string_split($norm, ''), c -> len(c) > 0),
                 c -> CAST(ord(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) AS roll_fp
           FROM documents ORDER BY doc_id""",

      "q34_range_join" ->
        """SELECT o_orderpriority, count(*) AS n_fast_items
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             AND l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 30 DAY
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",

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

      // quantile_cont == Spark's percentile (linear interpolation — the
      // q46-established parity); the clip itself is least/greatest over
      // the same doubles
      "q64_outlier_clip" ->
        """WITH b AS (
             SELECT lang, quantile_cont(n_chars, 0.05) AS v_lo,
                    quantile_cont(n_chars, 0.95) AS v_hi
             FROM documents GROUP BY lang)
           SELECT doc_id, d.lang AS lang, n_chars, v_lo, v_hi,
             least(greatest(CAST(n_chars AS DOUBLE), v_lo), v_hi) AS n_chars_clipped
           FROM documents d JOIN b ON d.lang = b.lang
           ORDER BY doc_id""",

      // same floor-based symmetric quantization; the error fold is the
      // identical left-to-right double chain (q33's range-index pattern)
      "q65_embedding_quantize" ->
        """WITH p AS (
             SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
             FROM embeddings),
           s AS (
             SELECT vec_id, embedding,
               CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale
             FROM p),
           qz AS (
             SELECT vec_id, embedding, scale,
               list_transform(embedding, x ->
                 CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS q
             FROM s)
           SELECT vec_id, scale,
             array_to_string(list_transform(q, v -> CAST(v AS VARCHAR)), ',') AS q_str,
             sqrt(list_sum(list_transform(range(1, len(embedding) + 1), i ->
               (CAST(embedding[i] AS DOUBLE)
                 - CASE WHEN scale > 0 THEN CAST(q[i] AS DOUBLE) / scale ELSE 0.0 END)
               * (CAST(embedding[i] AS DOUBLE)
                 - CASE WHEN scale > 0 THEN CAST(q[i] AS DOUBLE) / scale ELSE 0.0 END)))) AS recon_err
           FROM qz ORDER BY vec_id""",

      // the IDENTICAL statement Spark runs (SubquerySql) — decorrelation
      // is the engine's job; semantics are plain ANSI
      "q70_subquery" -> SubquerySql,

      "q71_dist_windows" ->
        s"""SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
           FROM (SELECT o_orderkey, o_orderpriority,
                   ${C.format("o_totalprice")} AS price_c FROM orders) t
           WINDOW w AS (PARTITION BY o_orderpriority ORDER BY price_c, o_orderkey)
           ORDER BY o_orderkey""",

      // same window arithmetic; DuckDB list_slice's END is inclusive, so
      // [s·stride + 1, s·stride + size] ≡ Spark's slice(start, length)
      "q72_chunking" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           c AS (
             SELECT doc_id, toks,
               unnest(range(0, CAST(floor(CAST(len(toks) - 1 AS DOUBLE) / 24) AS BIGINT) + 1)) AS idx
             FROM t WHERE len(toks) > 0)
           SELECT doc_id, CAST(idx AS INT) AS chunk_idx,
             array_to_string(list_slice(toks, idx * 24 + 1, idx * 24 + 32), ' ') AS chunk,
             CAST(len(list_slice(toks, idx * 24 + 1, idx * 24 + 32)) AS BIGINT) AS n_tokens
           FROM c ORDER BY doc_id, chunk_idx""",

      // RANK check without ulp-stable ln: both engines rank by the same
      // monotone score computed from the same exact integers (tf, df, N) —
      // a mathematical tie between different (tf, df) pairs would need
      // tf1/tf2 = (ln r2 + 1)/(ln r1 + 1) to hold over rationals, which it
      // cannot; equal (tf, df) ties break by term in both. The score itself
      // is still not an output column.
      "q73_tfidf" ->
        s"""WITH tf AS (
             SELECT doc_id, word AS term, CAST(count(*) AS BIGINT) AS tf FROM (
               SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
               FROM documents) t
             WHERE word <> '' GROUP BY 1, 2),
           df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
           n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
           ranked AS (
             SELECT tf.doc_id, tf.term, tf.tf, df.df,
               row_number() OVER (PARTITION BY tf.doc_id
                 ORDER BY tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) DESC,
                   tf.term ASC) AS rank
             FROM tf JOIN df USING (term) CROSS JOIN n)
           SELECT doc_id, rank, term, tf, df FROM ranked
           WHERE rank <= 5 ORDER BY doc_id, rank""",

      // content-keyed permutation: identical 60-bit md5 key, shard = key
      // mod nShards, pos = rank within the shard (key order, id tiebreak)
      "q74_shuffle_shard" ->
        """WITH k AS (
             SELECT doc_id,
               CAST('0x' || substr(md5('r5:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS skey
             FROM documents)
           SELECT doc_id, CAST(skey % 8 AS INTEGER) AS shard,
             CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS BIGINT) - 1 AS pos
           FROM k ORDER BY shard, pos""",

      // the engine's per-domain greedy fold must equal this recursive-CTE
      // unroll of the same transition (skip-and-continue: a doc that would
      // cross the budget is dropped, scanning continues)
      "q75_token_budget" ->
        s"""WITH RECURSIVE sized AS (
             SELECT source, doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
               row_number() OVER (PARTITION BY source ORDER BY n_chars DESC NULLS LAST, doc_id) AS rn
             FROM documents),
           walked AS (
             SELECT source, doc_id, n_tokens, rn,
               CASE WHEN n_tokens <= 700 THEN n_tokens ELSE CAST(0 AS BIGINT) END AS cum_tokens,
               n_tokens <= 700 AS kept
             FROM sized WHERE rn = 1
             UNION ALL
             SELECT s.source, s.doc_id, s.n_tokens, s.rn,
               CASE WHEN w.cum_tokens + s.n_tokens <= 700
                 THEN w.cum_tokens + s.n_tokens ELSE w.cum_tokens END,
               w.cum_tokens + s.n_tokens <= 700
             FROM sized s JOIN walked w ON s.source = w.source AND s.rn = w.rn + 1)
           SELECT doc_id, source, n_tokens, cum_tokens, kept
           FROM walked ORDER BY doc_id""",

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

      // Kendall τ-b: the oracle computes the discordant count D by the
      // DEFINITION (cell-histogram inequality self-join — DuckDB's IEJoin
      // handles it at gate scale) rather than the engine's nibble-level
      // decomposition; the tie terms and the τ readout mirror the exact
      // HUGEINT // DECIMAL(38) arithmetic and the sqrt·sqrt double chain
      "q209_kendall" ->
        s"""WITH pts AS (
             SELECT n_chars AS x,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) AS y
             FROM documents),
           cells AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS c
                     FROM pts GROUP BY x, y),
           dd AS (SELECT coalesce(sum(a.c * b.c), 0) AS d
                  FROM cells a JOIN cells b ON a.x < b.x AND a.y > b.y),
           base AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                      coalesce(sum(c * (c - 1) // 2), 0) AS n3
                    FROM cells),
           tx AS (SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n1
                  FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
           ty AS (SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n2
                  FROM (SELECT sum(c) AS t FROM cells GROUP BY y)),
           t0 AS (SELECT n, CAST(n AS HUGEINT) * (n - 1) // 2 AS np,
                    n1, n2, n3, d
                  FROM base CROSS JOIN tx CROSS JOIN ty CROSS JOIN dd)
           SELECT n,
             CAST(np AS DOUBLE) AS n_pairs,
             CAST(n1 AS DOUBLE) AS n_tie_x,
             CAST(n2 AS DOUBLE) AS n_tie_y,
             CAST(n3 AS DOUBLE) AS n_tie_xy,
             CAST(np - n1 - n2 + n3 - d AS DOUBLE) AS concordant,
             CAST(d AS DOUBLE) AS discordant,
             CASE WHEN np > n1 AND np > n2 THEN
               CAST(np - n1 - n2 + n3 - 2 * d AS DOUBLE)
                 / (sqrt(CAST(np - n1 AS DOUBLE)) * sqrt(CAST(np - n2 AS DOUBLE)))
             END AS tau_b,
             CASE WHEN np - n1 - n2 + n3 > 0 THEN
               CAST(np - n1 - n2 + n3 - 2 * d AS DOUBLE)
                 / CAST(np - n1 - n2 + n3 AS DOUBLE)
             END AS gamma,
             CASE WHEN np > n1 THEN
               CAST(np - n1 - n2 + n3 - 2 * d AS DOUBLE)
                 / CAST(np - n1 AS DOUBLE)
             END AS somers_d_yx
           FROM t0""",

      // Cohen's κ: q23's langid chain produces the prediction, then the
      // confusion-cell marginals cross-multiply into the exact
      // (N·O − E₂)/(N² − E₂) readout — HUGEINT mirror of the engine's
      // DECIMAL(38) arithmetic
      "q210_kappa" ->
        s"""WITH langs AS (
             SELECT * FROM (VALUES
               ('de', ['der','die','das','und','ist','nicht','ein','mit']),
               ('en', ['the','a','of','and','is','to','in','that']),
               ('es', ['el','la','de','que','y','es','en','un']),
               ('fr', ['le','la','les','de','et','est','un','une']),
               ('zh', ['de','shi','bu','le','zai','you','wo','ta'])) l(lang, words)),
           scores AS (
             SELECT doc_id, langs.lang AS cand,
               len(list_filter($toks, t -> list_contains(words, t))) AS hits
             FROM documents CROSS JOIN langs),
           best AS (
             SELECT doc_id, cand, hits,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand ASC) AS rn
             FROM scores),
           pred AS (
             SELECT d.doc_id, d.lang AS a,
               CASE WHEN b.hits > 0 THEN b.cand ELSE 'und' END AS b
             FROM documents d JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1),
           cells AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS o
                     FROM pred GROUP BY a, b),
           ra AS (SELECT a, sum(o) AS r FROM cells GROUP BY a),
           cb AS (SELECT b, sum(o) AS c FROM cells GROUP BY b),
           tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                     coalesce(CAST(sum(CASE WHEN a = b THEN o END) AS BIGINT), 0) AS agree
                   FROM cells),
           e2 AS (SELECT coalesce(sum(r * c), 0) AS e2
                  FROM ra JOIN cb ON ra.a = cb.b)
           SELECT n, agree AS observed_agree,
             CAST(e2 AS DOUBLE) AS expected_pairs,
             CASE WHEN CAST(n AS HUGEINT) * n > e2 THEN
               CAST(CAST(agree AS HUGEINT) * n - e2 AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n - e2 AS DOUBLE)
             END AS kappa
           FROM tot CROSS JOIN e2""",

      // Mann–Whitney off the value histogram: cum_before via one ordered
      // window over distinct values, then u2/T/num/variance in HUGEINT
      // mirroring the engine's DECIMAL(38) chain; auc/delta/z the same
      // IEEE division-and-sqrt order
      "q211_mann_whitney" ->
        s"""WITH pts AS (
             SELECT CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) AS v,
               (lang = 'en') AS p
             FROM documents),
           h AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
                   CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS pc
                 FROM pts GROUP BY v),
           c AS (SELECT v, t, pc,
                   CAST(coalesce(sum(t) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS cb
                 FROM h),
           t0 AS (SELECT CAST(coalesce(sum(pc), 0) AS BIGINT) AS n1,
                    CAST(coalesce(sum(t), 0) AS BIGINT) AS n,
                    coalesce(sum(CAST(pc AS HUGEINT) * (2 * cb + t + 1)), 0) AS u2,
                    coalesce(sum(CAST(t AS HUGEINT) * t * t - t), 0) AS tt
                  FROM c),
           t1 AS (SELECT n1, n - n1 AS n2, n, u2, tt,
                    u2 - CAST(n1 AS HUGEINT) * (n1 + 1)
                      - CAST(n1 AS HUGEINT) * (n - n1) AS num,
                    (CAST(n AS HUGEINT) + 1) * n * (n - 1) - tt AS a
                  FROM t0)
           SELECT n1 AS n_pos, n2 AS n_neg,
             CAST(u2 AS DOUBLE) AS u2, CAST(tt AS DOUBLE) AS t_ties,
             CASE WHEN n1 > 0 AND n2 > 0 THEN
               CAST(u2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE)
                 / CAST(CAST(2 AS HUGEINT) * n1 * n2 AS DOUBLE) END AS auc,
             CASE WHEN n1 > 0 AND n2 > 0 THEN
               CAST(num AS DOUBLE)
                 / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) END AS cliffs_delta,
             CASE WHEN n1 > 0 AND n2 > 0 AND a > 0 THEN
               CAST(num AS DOUBLE)
                 / sqrt(CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
                     * CAST(a AS DOUBLE)
                     / CAST(CAST(3 AS HUGEINT) * n * (n - 1) AS DOUBLE))
             END AS z
           FROM t1""",

      // Theil–Sen: q180's revenue CTE, then all within-nation pairs with
      // xa < xb, micro-slopes via HUGEINT floor division (DuckDB //
      // floors; the engine subtracts pmod first so DIV truncates the
      // same), and the two middle order statistics by row_number
      "q212_theil_sen" ->
        s"""WITH rev AS (SELECT n_name,
               CAST(date_part('year', o_orderdate) * 12 + date_part('month', o_orderdate) AS BIGINT) AS x,
               CAST(sum(${C.format("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT) AS y
             FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
             GROUP BY 1, 2),
           pd AS (SELECT a.n_name,
                    1000000 * (CAST(b.y AS HUGEINT) - a.y) AS nm,
                    CAST(b.x - a.x AS HUGEINT) AS dx
                  FROM rev a JOIN rev b
                    ON a.n_name = b.n_name AND a.x < b.x),
           -- subtract the NONNEGATIVE remainder first so // (which
           -- truncates toward zero) lands on the exact quotient = floor
           pr AS (SELECT n_name,
                    CAST((nm - ((nm % dx + dx) % dx)) // dx AS BIGINT) AS sm
                  FROM pd),
           rk AS (SELECT n_name, sm,
                    row_number() OVER (PARTITION BY n_name ORDER BY sm) AS rn,
                    count(*) OVER (PARTITION BY n_name) AS m
                  FROM pr)
           SELECT n_name, CAST(max(m) AS BIGINT) AS n_pairs,
             min(sm) AS slope_micro_lo, max(sm) AS slope_micro_hi,
             (CAST(min(sm) AS DOUBLE) + CAST(max(sm) AS DOUBLE)) / 2.0 AS slope_micro
           FROM rk
           WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
           GROUP BY n_name
           ORDER BY n_name""",

      // Benford: leading digit from the decimal STRING (no float log);
      // expected probabilities are the engine's plan-time math.log10
      // literals inlined verbatim (string-cast so DuckDB parses them as
      // DOUBLE, not DECIMAL); per-digit terms quantized at their site
      "q213_benford" -> {
        val ps = (1 to 9).map(d =>
          s"WHEN sp.digit = $d THEN CAST('${math.log10(1.0 + 1.0 / d)}' AS DOUBLE)")
          .mkString(" ")
        s"""WITH src AS (SELECT ${C.format("l_extendedprice")} AS v FROM lineitem),
           cnt AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                     CAST(count(*) AS BIGINT) AS o
                   FROM src WHERE v > 0 GROUP BY 1),
           tot AS (SELECT CAST(coalesce(sum(o), 0) AS BIGINT) AS n FROM cnt),
           sp AS (SELECT range AS digit FROM range(1, 10)),
           j AS (SELECT sp.digit, coalesce(cnt.o, 0) AS n_obs, tot.n,
                   CAST(tot.n AS DOUBLE) * (CASE $ps END) AS e
                 FROM sp LEFT JOIN cnt ON sp.digit = cnt.digit CROSS JOIN tot)
           SELECT digit, n_obs,
             CAST(floor(e * 1e6) AS BIGINT) AS exp_micro,
             CASE WHEN n > 0 THEN
               CAST(floor((CAST(n_obs AS DOUBLE) - e) * (CAST(n_obs AS DOUBLE) - e)
                 / e * 1e6) AS BIGINT) END AS term_micro
           FROM j ORDER BY digit"""
      },

      // isotonic calibration via the minimax characterization
      // fit(i) = max_{j<=i} min_{k>=i} avg(j..k): rationals ordered by
      // the injective HUGEINT key floor(p*10^30/n) and read out as
      // key // 10^24 (the nested floor-division identity) — exactly the
      // engine's BigInt PAV values; O(B^3) triples over B <= 62 buckets
      "q214_isotonic" ->
        s"""WITH pts AS (
             SELECT CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) // 16384 AS v,
               (lang = 'en') AS pos
             FROM documents),
           h AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p
                 FROM pts GROUP BY v),
           o AS (SELECT v, n, p,
                   row_number() OVER (ORDER BY v) AS i,
                   sum(n) OVER (ORDER BY v) AS cn,
                   sum(p) OVER (ORDER BY v) AS cp
                 FROM h),
           seg AS (SELECT j.i AS ji, k.i AS ki,
                     CAST(k.cp - j.cp + j.p AS HUGEINT) AS sp,
                     CAST(k.cn - j.cn + j.n AS HUGEINT) AS sn
                   FROM o j JOIN o k ON j.i <= k.i),
           mn AS (SELECT i.i AS ii, seg.ji,
                    min(seg.sp * CAST('1000000000000000000000000000000' AS HUGEINT)
                      // seg.sn) AS mkey
                  FROM o i JOIN seg ON seg.ji <= i.i AND seg.ki >= i.i
                  GROUP BY 1, 2),
           fit AS (SELECT ii, max(mkey) AS fkey FROM mn GROUP BY ii)
           SELECT o.v AS score_q, o.n, o.p AS n_pos,
             CAST(fit.fkey // CAST('1000000000000000000000000' AS HUGEINT)
               AS BIGINT) AS fitted_micro
           FROM o JOIN fit ON fit.ii = o.i
           ORDER BY score_q""",

      // weighted isotonic: q214's minimax scheme with (n, p) → (Σw, Σw·y)
      // — weights 1..7 from n_chars mod 7, same injective HUGEINT key
      "q228_isotonic_weighted" ->
        s"""WITH pts AS (
             SELECT CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) // 16384 AS v,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               n_chars % 7 + 1 AS w
             FROM documents),
           h AS (SELECT v, CAST(sum(w) AS BIGINT) AS wn,
                   CAST(sum(w * y) AS BIGINT) AS wy
                 FROM pts GROUP BY v),
           o AS (SELECT v, wn, wy,
                   row_number() OVER (ORDER BY v) AS i,
                   sum(wn) OVER (ORDER BY v) AS cn,
                   sum(wy) OVER (ORDER BY v) AS cp
                 FROM h),
           seg AS (SELECT j.i AS ji, k.i AS ki,
                     CAST(k.cp - j.cp + j.wy AS HUGEINT) AS sp,
                     CAST(k.cn - j.cn + j.wn AS HUGEINT) AS sn
                   FROM o j JOIN o k ON j.i <= k.i),
           mn AS (SELECT i.i AS ii, seg.ji,
                    min((seg.sp * CAST('1000000000000000000000000000000' AS HUGEINT)
                      - ((seg.sp * CAST('1000000000000000000000000000000' AS HUGEINT)
                          % seg.sn + seg.sn) % seg.sn))
                      // seg.sn) AS mkey
                  FROM o i JOIN seg ON seg.ji <= i.i AND seg.ki >= i.i
                  GROUP BY 1, 2),
           fit AS (SELECT ii, max(mkey) AS fkey FROM mn GROUP BY ii)
           SELECT o.v AS score_q, o.wn AS w_sum, o.wy AS wy_sum,
             CAST((fit.fkey - ((fit.fkey % CAST('1000000000000000000000000' AS HUGEINT)
                 + CAST('1000000000000000000000000' AS HUGEINT))
                 % CAST('1000000000000000000000000' AS HUGEINT)))
               // CAST('1000000000000000000000000' AS HUGEINT)
               AS BIGINT) AS fitted_micro
           FROM o JOIN fit ON fit.ii = o.i
           ORDER BY score_q""",

      // Cochran–Armitage: five conditional sums, the exact-integer U and
      // cross-multiplied variance core, z the verbatim IEEE chain
      "q229_cochran_armitage" ->
        """WITH t AS (
             SELECT least(n_chars // 250, 3) AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
             FROM documents),
           a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(p) AS BIGINT) AS r,
                   CAST(sum(s) AS BIGINT) AS s1,
                   CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS s2,
                   CAST(sum(s * p) AS BIGINT) AS sr
                 FROM t),
           b AS (SELECT n, r, s1, s2, sr,
                   CAST(n AS HUGEINT) * sr - CAST(r AS HUGEINT) * s1 AS u,
                   CAST(r AS HUGEINT) * (n - r) *
                     (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) AS den
                 FROM a)
           SELECT n, r, s1, CAST(s2 AS DOUBLE) AS s2, sr,
             CAST(u AS DOUBLE) AS u,
             CASE WHEN den > 0 THEN
               CAST(u AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
                 / sqrt(CAST(den AS DOUBLE))
             END AS z
           FROM b""",

      // persisted IVF-PQ lifecycle: q232's oracle with BOTH trainers
      // restricted to the initial corpus (coarse chain trainPred +
      // subspace chains' tpx) while a_f/af_j assign every row — exactly
      // build + frozen-model append; queries %50; persistence cannot
      // change the integers
      "q236_ivf_pq_lifecycle" -> {
        val m = 4; val dsub = 16; val ksub = 4; val rounds = 2
        val probes = 2; val topk = 10
        val tp = "vec_id % 7 <> 0"
        def resPx(j: Int) =
          s"""SELECT vec_id, x, d - ${j * dsub} AS d FROM rpx
             WHERE d >= ${j * dsub} AND d < ${(j + 1) * dsub}"""
        s"""WITH ${kmeansChainSql(k = 8, rounds = rounds, trainPred = tp)},
           rpx AS (SELECT px.vec_id, px.d, px.x - c.v AS x
                   FROM px JOIN a_f a ON a.vec_id = px.vec_id
                   JOIN cent_$rounds c ON c.c = a.c AND c.d = px.d),
           selq AS (SELECT vec_id FROM pts WHERE $tp
                    ORDER BY vec_id LIMIT $ksub),
           ${(0 until m).map(j => pqSubChainSql(j, dsub, rounds,
              resPx(j), "selq", trainPred = tp)).mkString(",\n           ")},
           qp AS (SELECT vec_id AS qid, c FROM (
               SELECT vec_id, c,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
               FROM dist_f WHERE vec_id % 50 = 0) t WHERE rn <= $probes),
           qrx AS (SELECT q.qid, q.c AS bc, px.d, px.x - ct.v AS x
                   FROM qp q JOIN px ON px.vec_id = q.qid
                   JOIN cent_$rounds ct ON ct.c = q.c AND ct.d = px.d),
           ${(0 until m).map(j =>
              s"""qt_$j AS (SELECT r.qid, r.bc, cb.c AS code,
                 sum((r.x - cb.v) * (r.x - cb.v)) AS d
               FROM (SELECT qid, bc, d - ${j * dsub} AS d, x FROM qrx
                     WHERE d >= ${j * dsub} AND d < ${(j + 1) * dsub}) r
               JOIN cent${rounds}_$j cb ON cb.d = r.d
               GROUP BY 1, 2, 3),
           cand_$j AS (SELECT qp.qid, ca.vec_id AS nid, qt.d
               FROM qp JOIN a_f ca ON ca.c = qp.c
               JOIN af_$j af ON af.vec_id = ca.vec_id
               JOIN qt_$j qt ON qt.qid = qp.qid AND qt.bc = qp.c
                 AND qt.code = af.c)""").mkString(",\n           ")},
           adc AS (SELECT qid, nid, CAST(sum(d) AS BIGINT) AS adc FROM (
               ${(0 until m).map(j => s"SELECT * FROM cand_$j").mkString(" UNION ALL ")}) u
             GROUP BY 1, 2),
           tk AS (SELECT qid, nid, adc,
               row_number() OVER (PARTITION BY qid
                 ORDER BY adc ASC, nid ASC) AS rn
             FROM adc)
           SELECT qid AS query_id, rn AS rank, nid AS neighbor_id,
             adc AS adc_q
           FROM tk WHERE rn <= $topk
           ORDER BY query_id, rank"""
      },

      // Friedman: complete blocks only, doubled midranks via the
      // strictly-below RANGE window, exact D_g/Den2 integers, chi2 and
      // W the verbatim trailing chains
      "q235_friedman" -> {
        val chi2Sql =
          """CAST((k - 1) * ddv AS DOUBLE) / CAST(den AS DOUBLE)"""
        s"""WITH pts AS (
             SELECT least(n_chars // 200, 7) AS b, lang AS g,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) // 16384 AS qu
             FROM documents),
           cells AS (SELECT b, g, CAST(sum(qu) AS BIGINT) AS y
                     FROM pts GROUP BY 1, 2),
           kk AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS k FROM cells),
           comp AS (SELECT c.b, c.g, c.y
                    FROM cells c
                      JOIN (SELECT b, count(*) AS nb FROM cells GROUP BY b) t
                        ON t.b = c.b
                      CROSS JOIN kk
                    WHERE t.nb = kk.k),
           rk AS (SELECT b, g,
                    CAST(2 * coalesce(count(*) OVER (PARTITION BY b ORDER BY y
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      + count(*) OVER (PARTITION BY b, y) + 1 AS BIGINT) AS r2
                  FROM comp),
           pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(r2) AS BIGINT) AS rg2,
                    CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT) AS sq
                  FROM rk GROUP BY g),
           tot1 AS (SELECT CAST(max(n) AS BIGINT) AS n,
                      CAST(count(*) AS BIGINT) AS k,
                      CAST(sum(sq) AS HUGEINT) AS ssq
                    FROM pg),
           dd AS (SELECT CAST(sum(
                    (CAST(rg2 AS HUGEINT) - CAST(pg.n AS HUGEINT) * (tot1.k + 1))
                    * (CAST(rg2 AS HUGEINT) - CAST(pg.n AS HUGEINT) * (tot1.k + 1)))
                    AS HUGEINT) AS ddv
                  FROM pg CROSS JOIN tot1),
           fin AS (SELECT n, k, ddv, ssq,
                     ssq - CAST(n AS HUGEINT) * k * (k + 1) * (k + 1) AS den
                   FROM tot1 CROSS JOIN dd)
           SELECT n AS n_blocks, k AS k_groups,
             CASE WHEN n > 0 AND k >= 2 AND den > 0 THEN $chi2Sql
             END AS chi2,
             CASE WHEN n > 0 AND k >= 2 AND den > 0 THEN
               ($chi2Sql) / CAST(n * (k - 1) AS DOUBLE)
             END AS kendalls_w
           FROM fin"""
      },

      // PQ ADC: four per-subspace Lloyd chains side by side, corpus
      // codes from each chain's final assignment, query codeword
      // distances off the same final distance tables, ADC = the 4-term
      // sum, top-k ascending with neighbor-id ties
      "q231_pq_adc" -> {
        val m = 4; val dsub = 16; val ksub = 4; val rounds = 2; val topk = 10
        s"""WITH pts AS (
             SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS q
             FROM embeddings),
           sel AS (SELECT vec_id FROM pts ORDER BY vec_id LIMIT $ksub),
           ${(0 until m).map(j => pqSubChainSql(j, dsub, rounds,
              pqSlicePx(j, dsub, "pts"), "sel")).mkString(",\n           ")},
           ${(0 until m).map(j =>
              s"""qd_$j AS (SELECT vec_id AS qid, c, dist AS d
                     FROM distf_$j WHERE vec_id % 100 = 0),
           pd_$j AS (SELECT qd.qid, af.vec_id AS nid, qd.d
                     FROM af_$j af JOIN qd_$j qd ON qd.c = af.c)""")
             .mkString(",\n           ")},
           adc AS (SELECT qid, nid, CAST(sum(d) AS BIGINT) AS adc FROM (
               ${(0 until m).map(j => s"SELECT * FROM pd_$j").mkString(" UNION ALL ")}) u
             GROUP BY 1, 2),
           tk AS (SELECT qid, nid, adc,
               row_number() OVER (PARTITION BY qid
                 ORDER BY adc ASC, nid ASC) AS rn
             FROM adc)
           SELECT qid AS query_id, rn AS rank, nid AS neighbor_id,
             adc AS adc_q
           FROM tk WHERE rn <= $topk
           ORDER BY query_id, rank"""
      },

      // Hadamard-rotated PQ: q231's chains over a generated rotation CTE
      // — the same ±1 H·D rows the Spark side builds (same seed), spelled
      // out as 64 list elements of 64 signed terms each; everything
      // downstream identical
      "q238_pq_rotated" -> {
        val m = 4; val dsub = 16; val ksub = 4; val rounds = 2; val topk = 10
        val hd = graft.operators.Similarity.hadamardSigns(64, 42L)
        val rows = (0 until 64).map { i =>
          (0 until 64).map(j => s"(${hd(i)(j)})*q[${j + 1}]").mkString(" + ")
        }
        s"""WITH pts AS (
             SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS q
             FROM embeddings),
           rot AS (SELECT vec_id, list_value(
               ${rows.mkString(",\n               ")}) AS q
             FROM pts),
           sel AS (SELECT vec_id FROM pts ORDER BY vec_id LIMIT $ksub),
           ${(0 until m).map(j => pqSubChainSql(j, dsub, rounds,
              pqSlicePx(j, dsub, "rot"), "sel")).mkString(",\n           ")},
           ${(0 until m).map(j =>
              s"""qd_$j AS (SELECT vec_id AS qid, c, dist AS d
                     FROM distf_$j WHERE vec_id % 100 = 0),
           pd_$j AS (SELECT qd.qid, af.vec_id AS nid, qd.d
                     FROM af_$j af JOIN qd_$j qd ON qd.c = af.c)""")
             .mkString(",\n           ")},
           adc AS (SELECT qid, nid, CAST(sum(d) AS BIGINT) AS adc FROM (
               ${(0 until m).map(j => s"SELECT * FROM pd_$j").mkString(" UNION ALL ")}) u
             GROUP BY 1, 2),
           tk AS (SELECT qid, nid, adc,
               row_number() OVER (PARTITION BY qid
                 ORDER BY adc ASC, nid ASC) AS rn
             FROM adc)
           SELECT qid AS query_id, rn AS rank, nid AS neighbor_id,
             adc AS adc_q
           FROM tk WHERE rn <= $topk
           ORDER BY query_id, rank"""
      },

      // IVF-PQ with residual encoding: the coarse k-means chain routes,
      // residuals rpx = x − centroid(x) feed four subspace chains, the
      // query probes 2 buckets and builds one ADC table per probed
      // bucket from ITS residual; candidates key on (bucket, code)
      "q232_ivf_pq" -> {
        val m = 4; val dsub = 16; val ksub = 4; val rounds = 2
        val probes = 2; val topk = 10
        def resPx(j: Int) =
          s"""SELECT vec_id, x, d - ${j * dsub} AS d FROM rpx
             WHERE d >= ${j * dsub} AND d < ${(j + 1) * dsub}"""
        s"""WITH ${kmeansChainSql(k = 8, rounds = rounds)},
           rpx AS (SELECT px.vec_id, px.d, px.x - c.v AS x
                   FROM px JOIN a_f a ON a.vec_id = px.vec_id
                   JOIN cent_$rounds c ON c.c = a.c AND c.d = px.d),
           selq AS (SELECT vec_id FROM pts ORDER BY vec_id LIMIT $ksub),
           ${(0 until m).map(j => pqSubChainSql(j, dsub, rounds,
              resPx(j), "selq")).mkString(",\n           ")},
           qp AS (SELECT vec_id AS qid, c FROM (
               SELECT vec_id, c,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
               FROM dist_f WHERE vec_id % 100 = 0) t WHERE rn <= $probes),
           qrx AS (SELECT q.qid, q.c AS bc, px.d, px.x - ct.v AS x
                   FROM qp q JOIN px ON px.vec_id = q.qid
                   JOIN cent_$rounds ct ON ct.c = q.c AND ct.d = px.d),
           ${(0 until m).map(j =>
              s"""qt_$j AS (SELECT r.qid, r.bc, cb.c AS code,
                 sum((r.x - cb.v) * (r.x - cb.v)) AS d
               FROM (SELECT qid, bc, d - ${j * dsub} AS d, x FROM qrx
                     WHERE d >= ${j * dsub} AND d < ${(j + 1) * dsub}) r
               JOIN cent${rounds}_$j cb ON cb.d = r.d
               GROUP BY 1, 2, 3),
           cand_$j AS (SELECT qp.qid, ca.vec_id AS nid, qt.d
               FROM qp JOIN a_f ca ON ca.c = qp.c
               JOIN af_$j af ON af.vec_id = ca.vec_id
               JOIN qt_$j qt ON qt.qid = qp.qid AND qt.bc = qp.c
                 AND qt.code = af.c)""").mkString(",\n           ")},
           adc AS (SELECT qid, nid, CAST(sum(d) AS BIGINT) AS adc FROM (
               ${(0 until m).map(j => s"SELECT * FROM cand_$j").mkString(" UNION ALL ")}) u
             GROUP BY 1, 2),
           tk AS (SELECT qid, nid, adc,
               row_number() OVER (PARTITION BY qid
                 ORDER BY adc ASC, nid ASC) AS rn
             FROM adc)
           SELECT qid AS query_id, rn AS rank, nid AS neighbor_id,
             adc AS adc_q
           FROM tk WHERE rn <= $topk
           ORDER BY query_id, rank"""
      },

      // one-way ANOVA: per-group exact sums, both divisions floor-
      // quantized micro at their sites, F the verbatim IEEE chain
      // (generator shared with q234, whose source is the |y − med_g|
      // deviation table)
      "q233_anova" ->
        s"""WITH pts AS (
             SELECT lang AS g,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) // 16384 AS y
             FROM documents),
           ${anovaSql("pts")}""",

      // Brown–Forsythe: per-group LOWER-MEDIAN order statistic off the
      // cell histogram, then the ANOVA block verbatim on |y − med_g|
      "q234_brown_forsythe" ->
        s"""WITH pts AS (
             SELECT lang AS g,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) // 16384 AS y
             FROM documents),
           cells AS (SELECT g, y AS v, CAST(count(*) AS BIGINT) AS c
                     FROM pts GROUP BY 1, 2),
           cum AS (SELECT g, v,
                     sum(c) OVER (PARTITION BY g ORDER BY v) AS cumc,
                     sum(c) OVER (PARTITION BY g) AS ng
                   FROM cells),
           med AS (SELECT g, min(v) AS medv FROM cum
                   WHERE cumc >= (ng + 1) // 2 GROUP BY g),
           z AS (SELECT pts.g, abs(pts.y - med.medv) AS y
                 FROM pts JOIN med ON med.g = pts.g),
           ${anovaSql("z")}""",

      // Kruskal–Wallis: cell histogram → strictly-before cumulative →
      // doubled rank sums; per-group term floor-quantized micro at its
      // site (nonneg // ≡ floor), H/H' the verbatim IEEE chains
      "q230_kruskal_wallis" ->
        s"""WITH pts AS (
             SELECT lang AS g,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) // 16384 AS v
             FROM documents),
           cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
                     FROM pts GROUP BY 1, 2),
           vh AS (SELECT v, CAST(sum(c) AS BIGINT) AS t
                  FROM cells GROUP BY v),
           vc AS (SELECT v, t,
                    CAST(sum(t) OVER (ORDER BY v) - t AS BIGINT) AS cb
                  FROM vh),
           pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng,
                    CAST(sum(CAST(c AS HUGEINT) * (2 * vc.cb + vc.t + 1))
                      AS HUGEINT) AS r2
                  FROM cells JOIN vc ON vc.v = cells.v GROUP BY g),
           tg AS (SELECT ng, (r2 * r2 * 1000000) // CAST(ng AS HUGEINT) AS tg
                  FROM pg),
           tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS k,
                     CAST(sum(tg) AS HUGEINT) AS st
                   FROM tg),
           tt AS (SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t)
                    AS HUGEINT) AS ttv
                  FROM vh)
           SELECT n, k AS k_groups, CAST(ttv AS DOUBLE) AS t_ties,
             CASE WHEN k >= 2 AND n >= 2 THEN
               3.0 * (CAST(st AS DOUBLE) / 1000000.0)
                 / CAST(CAST(n AS HUGEINT) * (n + 1) AS DOUBLE)
                 - 3.0 * CAST(n + 1 AS DOUBLE)
             END AS h,
             CASE WHEN k >= 2 AND n >= 2
                 AND CAST(n AS HUGEINT) * n * n - n > ttv THEN
               (3.0 * (CAST(st AS DOUBLE) / 1000000.0)
                 / CAST(CAST(n AS HUGEINT) * (n + 1) AS DOUBLE)
                 - 3.0 * CAST(n + 1 AS DOUBLE))
               / (1.0 - CAST(ttv AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE))
             END AS h_tie
           FROM tot CROSS JOIN tt""",

      // Jonckheere–Terpstra: dense (group × value) frame, within-group
      // cumulative-below + cross-group LB/LE windows give the doubled
      // 2J exactly; z chains mirror the Spark side verbatim (B's two
      // tie/group factors multiply as DOUBLES — the budget-free form)
      "q237_jonckheere" ->
        s"""WITH pts AS (
             SELECT least(n_chars // 250, 3) AS g,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) // 16384 AS v
             FROM documents),
           cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
                     FROM pts GROUP BY 1, 2),
           vh AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY v),
           gs AS (SELECT DISTINCT g FROM cells),
           dense AS (SELECT gs.g AS g, vh.v AS v, coalesce(cells.c, 0) AS c0
                     FROM gs CROSS JOIN vh
                     LEFT JOIN cells ON cells.g = gs.g AND cells.v = vh.v),
           cum AS (SELECT g, v, c0,
                     CAST(coalesce(sum(c0) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS cb
                   FROM dense),
           sw AS (SELECT g, v, c0, cb,
                    CAST(coalesce(sum(c0) OVER wv, 0) AS BIGINT) AS le,
                    CAST(coalesce(sum(cb) OVER wv, 0) AS HUGEINT) AS lb
                  FROM cum
                  WINDOW wv AS (PARTITION BY v ORDER BY g
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
           s2 AS (SELECT CAST(coalesce(sum(CAST(c0 AS HUGEINT) *
                    (2 * lb + le)), 0) AS HUGEINT) AS s2 FROM sw),
           pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng FROM cells GROUP BY g),
           ga AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                    CAST(count(*) AS BIGINT) AS k,
                    CAST(sum(CAST(ng AS HUGEINT) * ng) AS HUGEINT) AS sn2,
                    CAST(sum(CAST(ng AS HUGEINT) * ng * (2 * ng + 3))
                      AS HUGEINT) AS sn23,
                    CAST(sum(CAST(ng AS HUGEINT) * (ng - 1) * (2 * ng + 5))
                      AS HUGEINT) AS g25,
                    CAST(sum(CAST(ng AS HUGEINT) * (ng - 1) * (ng - 2))
                      AS HUGEINT) AS g3,
                    CAST(sum(CAST(ng AS HUGEINT) * (ng - 1)) AS HUGEINT) AS g2
                  FROM pg),
           ta AS (SELECT
                    CAST(coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)), 0)
                      AS HUGEINT) AS t25,
                    CAST(coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (t - 2)), 0)
                      AS HUGEINT) AS t3,
                    CAST(coalesce(sum(CAST(t AS HUGEINT) * (t - 1)), 0)
                      AS HUGEINT) AS t2
                  FROM vh)
           SELECT n, k AS k_groups, CAST(s2 AS DOUBLE) AS j2,
             CAST(2 * s2 - (CAST(n AS HUGEINT) * n - sn2) AS DOUBLE) AS num2,
             CASE WHEN k >= 2
                 AND CAST(n AS HUGEINT) * n * (2 * n + 3) - sn23 > 0 THEN
               CAST(2 * s2 - (CAST(n AS HUGEINT) * n - sn2) AS DOUBLE)
                 / (4.0 * sqrt(CAST(CAST(n AS HUGEINT) * n * (2 * n + 3) - sn23
                     AS DOUBLE) / 72.0))
             END AS z,
             CASE WHEN k >= 2 AND n >= 3
                 AND (CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - g25 - t25
                       AS DOUBLE) / 72.0
                   + CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE)
                     / (36.0 * CAST(CAST(n AS HUGEINT) * (n - 1) * (n - 2) AS DOUBLE))
                   + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE)
                     / (8.0 * CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))) > 0 THEN
               CAST(2 * s2 - (CAST(n AS HUGEINT) * n - sn2) AS DOUBLE)
                 / (4.0 * sqrt(
                     CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - g25 - t25
                       AS DOUBLE) / 72.0
                   + CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE)
                     / (36.0 * CAST(CAST(n AS HUGEINT) * (n - 1) * (n - 2) AS DOUBLE))
                   + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE)
                     / (8.0 * CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))))
             END AS z_tie
           FROM ga CROSS JOIN s2 CROSS JOIN ta""",

      // CUSUM: cumulative daily counts per type, |n·S_i − i·S_n| in
      // HUGEINT, argmax tie-broken to the earliest day, split means via
      // the nonneg-mod floor division
      "q215_cusum" ->
        """WITH d AS (
             SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
           c AS (SELECT event_type, day,
                   CAST(row_number() OVER w AS BIGINT) AS i,
                   CAST(sum(y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS BIGINT) AS si,
                   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
                   CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS sn
                 FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
           st AS (SELECT event_type, day, i, si, n, sn,
                    abs(CAST(n AS HUGEINT) * si - CAST(i AS HUGEINT) * sn) AS stat
                  FROM c WHERE i < n),
           mx AS (SELECT event_type, day, i, si, n, sn, stat,
                    row_number() OVER (PARTITION BY event_type
                      ORDER BY stat DESC, day ASC) AS rn
                  FROM st)
           SELECT event_type, n AS n_steps, day AS split_step, i AS split_i,
             CAST(stat AS DOUBLE) AS cusum,
             CAST((1000000 * si - ((1000000 * si % i + i) % i)) // i
               AS BIGINT) AS mean_before_micro,
             CAST((1000000 * (sn - si)
                 - ((1000000 * (sn - si) % (n - i) + (n - i)) % (n - i)))
               // (n - i) AS BIGINT) AS mean_after_micro
           FROM mx WHERE rn = 1
           ORDER BY event_type""",

      // conformal: rank k = ceil((n+1)*9/10) via pure-integer ceil,
      // tie-broken rank selection, and a LEFT join so an infeasible
      // (k > n) group reports NULL rather than a clamped lie
      "q216_conformal" ->
        s"""WITH pts AS (
             SELECT lang, doc_id,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) AS qu
             FROM documents),
           r AS (SELECT lang, qu,
                   row_number() OVER (PARTITION BY lang ORDER BY qu, doc_id) AS rk
                 FROM pts),
           sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                    CAST(((count(*) + 1) * 9 + 9) // 10 AS BIGINT) AS k
                  FROM pts GROUP BY lang)
           SELECT sz.lang, sz.n, sz.k, r.qu AS threshold
           FROM sz LEFT JOIN r ON r.lang = sz.lang AND r.rk = sz.k
           ORDER BY sz.lang""",

      // JSD: q153's CTEs with the mixture log-ratios — the common
      // (ta+v)(tb+v) normalizer cancels inside 2p/(p+q), so each term is
      // one double chain over exact integer cross-products, quantized at
      // its site; HUGEINT sums mirror the engine's DECIMAL(38)
      "q217_jensen_shannon" ->
        s"""WITH ca AS (
             SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
               SELECT unnest($toks) AS tok FROM documents WHERE doc_id % 2 = 0) t
             GROUP BY tok),
           cb AS (
             SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
               SELECT unnest($toks) AS tok FROM documents WHERE doc_id % 2 = 1) t
             GROUP BY tok),
           m AS (SELECT coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
                 FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
           s AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
                   CAST(sum(cb) AS BIGINT) AS tb,
                   CAST(count(*) AS BIGINT) AS v FROM m),
           q AS (SELECT ca, cb, ta, tb, v,
                   CAST(round(ln(2.0 * (CAST(ca + 1 AS DOUBLE) * CAST(tb + v AS DOUBLE))
                     / (CAST(ca + 1 AS DOUBLE) * CAST(tb + v AS DOUBLE)
                        + CAST(cb + 1 AS DOUBLE) * CAST(ta + v AS DOUBLE)))
                     * 1e6) AS BIGINT) AS qa,
                   CAST(round(ln(2.0 * (CAST(cb + 1 AS DOUBLE) * CAST(ta + v AS DOUBLE))
                     / (CAST(ca + 1 AS DOUBLE) * CAST(tb + v AS DOUBLE)
                        + CAST(cb + 1 AS DOUBLE) * CAST(ta + v AS DOUBLE)))
                     * 1e6) AS BIGINT) AS qb
                 FROM m CROSS JOIN s)
           SELECT ta AS n_tok_a, tb AS n_tok_b, v AS vocab,
             CAST(CAST(sum(CAST(ca + 1 AS HUGEINT) * qa) AS HUGEINT) AS DOUBLE) AS js_a_unats,
             CAST(CAST(sum(CAST(cb + 1 AS HUGEINT) * qb) AS HUGEINT) AS DOUBLE) AS js_b_unats,
             0.5 * (CAST(sum(CAST(ca + 1 AS HUGEINT) * qa) AS DOUBLE)
                 / (CAST(ta + v AS DOUBLE) * 1e6)
               + CAST(sum(CAST(cb + 1 AS HUGEINT) * qb) AS DOUBLE)
                 / (CAST(tb + v AS DOUBLE) * 1e6)) AS jsd
           FROM q GROUP BY ta, tb, v""",

      // exact k-means: the 3-round Lloyd trajectory replayed as a
      // generated CTE chain (the q163 BPE-oracle scheme) — seeds are the
      // 8 smallest vec_ids, distances exact integer squared-L2, argmin
      // tie-broken to the smallest cluster, centroid update the
      // nonneg-mod floor-division mean, empty clusters carry
      "q218_kmeans" -> {
        val rounds = 3
        s"""WITH ${kmeansChainSql(k = 8, rounds = rounds)}
           SELECT ct.c AS cluster, ct.d AS dim, ct.v AS centroid_q,
             coalesce(sz.n, 0) AS n_assigned
           FROM cent_$rounds ct LEFT JOIN sz ON sz.c = ct.c
           ORDER BY cluster, dim"""
      },

      // exact IVF: the same generated k-means chain (2 rounds, 8
      // centroids), then per-query probe ranking by exact squared L2
      // (ties to the smaller cluster), bucket candidate fetch on the
      // final assignment, and the exact integer dot-product top-k (ties
      // to the smaller neighbor id)
      "q219_ivf_exact" -> {
        val rounds = 2; val probes = 2; val topk = 10
        s"""WITH ${kmeansChainSql(k = 8, rounds = rounds)},
           qd AS (SELECT px.vec_id AS qid, c.c,
               sum((px.x - c.v) * (px.x - c.v)) AS dist
             FROM px JOIN cent_$rounds c ON px.d = c.d
             WHERE px.vec_id % 100 = 0
             GROUP BY 1, 2),
           qp AS (SELECT qid, c FROM (
               SELECT qid, c,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, c) AS rn
               FROM qd) t WHERE rn <= $probes),
           cand AS (SELECT qp.qid, a.vec_id AS nid
                    FROM qp JOIN a_f a ON a.c = qp.c),
           dots AS (SELECT cd.qid, cd.nid,
               CAST(sum(qx.x * nx.x) AS BIGINT) AS dot
             FROM cand cd
               JOIN px qx ON qx.vec_id = cd.qid
               JOIN px nx ON nx.vec_id = cd.nid AND nx.d = qx.d
             GROUP BY 1, 2),
           tk AS (SELECT qid, nid, dot,
               row_number() OVER (PARTITION BY qid
                 ORDER BY dot DESC, nid ASC) AS rn
             FROM dots)
           SELECT qid AS query_id, rn AS rank, nid AS neighbor_id,
             dot AS dot_q
           FROM tk WHERE rn <= $topk
           ORDER BY query_id, rank"""
      },

      // log-rank: q190's subject CTEs carried per user-parity cohort,
      // risk sets via the same suffix windows, each day's E/V one
      // mirrored double chain quantized micro at its site, chi2 the
      // single trailing IEEE chain
      "q220_logrank" ->
        """WITH su AS (SELECT user_id, min(epoch_ms(ts)) AS s_ms
               FROM events WHERE event_type = 'signup' GROUP BY 1),
           en AS (SELECT max(epoch_ms(ts)) AS end_ms FROM events),
           pu AS (SELECT user_id, epoch_ms(ts) AS p_ms
                  FROM events WHERE event_type = 'purchase'),
           subj AS (SELECT su.user_id, su.s_ms,
                      min(CASE WHEN pu.p_ms >= su.s_ms THEN pu.p_ms END) AS first_p
                    FROM su LEFT JOIN pu ON pu.user_id = su.user_id
                    GROUP BY 1, 2),
           dd AS (SELECT user_id % 2 = 0 AS ga,
                    CASE WHEN first_p IS NOT NULL THEN (first_p - s_ms) // 86400000
                      ELSE (end_ms - s_ms) // 86400000 END AS t,
                    first_p IS NOT NULL AS e
                  FROM subj CROSS JOIN en),
           h AS (SELECT t,
                   CAST(sum(CASE WHEN ga AND e THEN 1 ELSE 0 END) AS BIGINT) AS da,
                   CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS ta,
                   CAST(sum(CASE WHEN NOT ga AND e THEN 1 ELSE 0 END) AS BIGINT) AS db,
                   CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS tb
                 FROM dd GROUP BY t),
           nn AS (SELECT CAST(sum(ta) AS BIGINT) AS na,
                    CAST(sum(tb) AS BIGINT) AS nb FROM h),
           r AS (SELECT t, da, db,
                   na - coalesce(sum(ta) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ra,
                   nb - coalesce(sum(tb) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rb,
                   na, nb
                 FROM h CROSS JOIN nn),
           terms AS (SELECT na, nb, da,
                   CAST(round(CAST(da + db AS DOUBLE) * CAST(ra AS DOUBLE)
                     / CAST(ra + rb AS DOUBLE) * 1e6) AS BIGINT) AS em,
                   CASE WHEN ra + rb > 1 THEN
                     CAST(round(CAST(da + db AS DOUBLE) * CAST(ra AS DOUBLE)
                       / CAST(ra + rb AS DOUBLE) * CAST(rb AS DOUBLE)
                       / CAST(ra + rb AS DOUBLE)
                       * CAST(ra + rb - da - db AS DOUBLE)
                       / CAST(ra + rb - 1 AS DOUBLE) * 1e6) AS BIGINT)
                   ELSE 0 END AS vm
                 FROM r WHERE da + db > 0)
           SELECT na AS n_a, nb AS n_b,
             CAST(sum(da) AS BIGINT) AS o_a,
             CAST(sum(em) AS BIGINT) AS e_a_micro,
             CAST(sum(vm) AS BIGINT) AS v_micro,
             CASE WHEN sum(vm) > 0 THEN
               (CAST(sum(da) AS DOUBLE) - CAST(sum(em) AS DOUBLE) / 1e6)
                 * (CAST(sum(da) AS DOUBLE) - CAST(sum(em) AS DOUBLE) / 1e6)
                 / (CAST(sum(vm) AS DOUBLE) / 1e6)
             END AS chi2
           FROM terms GROUP BY na, nb""",

      // Wilson: the engine's IEEE chain verbatim — z inlined as the same
      // string-cast double literal, every sub-expression in the same order
      "q221_wilson" -> {
        val z = "CAST('1.959963984540054' AS DOUBLE)"
        s"""WITH pts AS (
             SELECT lang,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) AS qu
             FROM documents),
           g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN qu >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
                 FROM pts GROUP BY lang)
           SELECT lang, n, n_pos,
             CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
             ((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
                 + $z * $z / CAST(n AS DOUBLE) / 2.0)
               / (1.0 + $z * $z / CAST(n AS DOUBLE)))
             - ($z * sqrt(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
                   * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                   / CAST(n AS DOUBLE)
                 + $z * $z / CAST(n AS DOUBLE) / (4.0 * CAST(n AS DOUBLE)))
               / (1.0 + $z * $z / CAST(n AS DOUBLE))) AS wilson_lo,
             ((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
                 + $z * $z / CAST(n AS DOUBLE) / 2.0)
               / (1.0 + $z * $z / CAST(n AS DOUBLE)))
             + ($z * sqrt(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
                   * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                   / CAST(n AS DOUBLE)
                 + $z * $z / CAST(n AS DOUBLE) / (4.0 * CAST(n AS DOUBLE)))
               / (1.0 + $z * $z / CAST(n AS DOUBLE))) AS wilson_hi
           FROM g ORDER BY lang"""
      },

      // CMH: per-language 2x2 cells by conditional sums, each stratum's
      // E/V/ad/bc one mirrored double chain quantized micro at its site,
      // pooled chi2 and the MH odds ratio single trailing IEEE chains
      "q222_cmh" ->
        s"""WITH pts AS (
             SELECT lang, n_chars >= 1000 AS x,
               CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) >= 500000 AS y
             FROM documents),
           cells AS (SELECT lang,
               CAST(sum(CASE WHEN x AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN NOT x AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS d
             FROM pts GROUP BY lang),
           terms AS (SELECT a + b + c + d AS t, a,
               CAST(round(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                 / CAST(a + b + c + d AS DOUBLE) * 1e6) AS BIGINT) AS em,
               CASE WHEN a + b + c + d > 1 THEN
                 CAST(round(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE) * CAST(a + c AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE) * CAST(b + d AS DOUBLE)
                   / CAST(a + b + c + d - 1 AS DOUBLE) * 1e6) AS BIGINT)
               ELSE 0 END AS vm,
               CAST(round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                 / CAST(a + b + c + d AS DOUBLE) * 1e6) AS BIGINT) AS onn,
               CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                 / CAST(a + b + c + d AS DOUBLE) * 1e6) AS BIGINT) AS od
             FROM cells)
           SELECT CAST(sum(t) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(em) AS BIGINT) AS e_micro,
             CAST(sum(vm) AS BIGINT) AS v_micro,
             CAST(sum(onn) AS BIGINT) AS or_num_micro,
             CAST(sum(od) AS BIGINT) AS or_den_micro,
             CASE WHEN sum(vm) > 0 THEN
               (CAST(sum(a) AS DOUBLE) - CAST(sum(em) AS DOUBLE) / 1e6)
                 * (CAST(sum(a) AS DOUBLE) - CAST(sum(em) AS DOUBLE) / 1e6)
                 / (CAST(sum(vm) AS DOUBLE) / 1e6)
             END AS chi2,
             CASE WHEN sum(od) > 0 THEN
               CAST(sum(onn) AS DOUBLE) / CAST(sum(od) AS DOUBLE)
             END AS or_mh
           FROM terms""",

      // kmeans quality: the q218 chain, then own/next distances from the
      // ranked dist_f (rn 1 and 2 — the assignment's own tie-break),
      // simplified silhouette one sqrt/sqrt/divide chain quantized micro
      "q223_kmeans_quality" -> {
        val rounds = 3
        s"""WITH ${kmeansChainSql(k = 8, rounds = rounds)},
           rk AS (SELECT vec_id, c, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
             FROM dist_f),
           ab AS (SELECT o.vec_id, o.c AS cluster, o.dist AS d1,
               CASE WHEN greatest(sqrt(CAST(o.dist AS DOUBLE)),
                   sqrt(CAST(x.dist AS DOUBLE))) > 0 THEN
                 CAST(round((sqrt(CAST(x.dist AS DOUBLE))
                     - sqrt(CAST(o.dist AS DOUBLE)))
                   / greatest(sqrt(CAST(o.dist AS DOUBLE)),
                     sqrt(CAST(x.dist AS DOUBLE))) * 1e6) AS BIGINT)
               ELSE 0 END AS sm
             FROM rk o JOIN rk x
               ON x.vec_id = o.vec_id AND o.rn = 1 AND x.rn = 2)
           SELECT cluster, CAST(count(*) AS BIGINT) AS n_assigned,
             CAST(sum(CAST(d1 AS HUGEINT)) AS DOUBLE) AS inertia,
             CAST(sum(sm) AS BIGINT) AS s_sum_micro,
             CAST(sum(sm) AS DOUBLE) / 1e6 / CAST(count(*) AS DOUBLE)
               AS silhouette_mean
           FROM ab GROUP BY cluster ORDER BY cluster"""
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

      // persisted IVF lifecycle: q219's probe/re-rank tail over a chain
      // whose TRAINING population is the initial corpus only (trainPred)
      // while a_f assigns every row — build + frozen-centroid append;
      // the persistence round-trip itself cannot change the integers
      "q227_ivf_lifecycle" -> {
        val rounds = 2; val probes = 2; val topk = 10
        s"""WITH ${kmeansChainSql(k = 8, rounds = rounds,
              trainPred = "vec_id % 7 <> 0")},
           qd AS (SELECT px.vec_id AS qid, c.c,
               sum((px.x - c.v) * (px.x - c.v)) AS dist
             FROM px JOIN cent_$rounds c ON px.d = c.d
             WHERE px.vec_id % 50 = 0
             GROUP BY 1, 2),
           qp AS (SELECT qid, c FROM (
               SELECT qid, c,
                 row_number() OVER (PARTITION BY qid ORDER BY dist, c) AS rn
               FROM qd) t WHERE rn <= $probes),
           cand AS (SELECT qp.qid, a.vec_id AS nid
                    FROM qp JOIN a_f a ON a.c = qp.c),
           dots AS (SELECT cd.qid, cd.nid,
               CAST(sum(qx.x * nx.x) AS BIGINT) AS dot
             FROM cand cd
               JOIN px qx ON qx.vec_id = cd.qid
               JOIN px nx ON nx.vec_id = cd.nid AND nx.d = qx.d
             GROUP BY 1, 2),
           tk AS (SELECT qid, nid, dot,
               row_number() OVER (PARTITION BY qid
                 ORDER BY dot DESC, nid ASC) AS rn
             FROM dots)
           SELECT qid AS query_id, rn AS rank, nid AS neighbor_id,
             dot AS dot_q
           FROM tk WHERE rn <= $topk
           ORDER BY query_id, rank"""
      },

      // fromLiterals + mapValues: the VALUES clause IS the literal source,
      // the mapped expression (2v + 1) sits under the per-key aggregates
      "q226_literals_mapvalues" ->
        """SELECT k, CAST(sum(2 * v + 1) AS BIGINT) AS mapped_sum,
             CAST(count(*) AS BIGINT) AS n
           FROM (VALUES ('a', 3), ('b', 1), ('a', 4), ('c', 5),
                        ('b', 9), ('a', 2), ('c', 6), ('b', -7)) AS t(k, v)
           GROUP BY k ORDER BY k""",

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

      // add-1 bigram LM log-likelihood, quantized per DISTINCT bigram term
      // to integer micro-nats (round(ln·1e6)) before the per-doc sum, so
      // both engines sum exact BIGINTs in any order; parallel unnest of
      // the two shifted slices zips tokens into bigrams positionally
      "q81_lm_score" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           db0 AS (
             SELECT doc_id,
               unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
               unnest(list_slice(toks, 2, len(toks))) AS w2
             FROM t WHERE len(toks) >= 2),
           db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m
                  FROM db0 GROUP BY 1, 2, 3),
           bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
                  FROM db0 GROUP BY 1, 2),
           u AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                 FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
           v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
           sc AS (
             SELECT db.doc_id, CAST(sum(db.m) AS BIGINT) AS n_bigrams,
               CAST(sum(db.m * CAST(round(ln((bg.cb + 1.0) / (u.cu + v.v)) * 1e6) AS BIGINT)) AS BIGINT) AS score_unats
             FROM db JOIN bg USING (w1, w2) JOIN u ON u.w = db.w1 CROSS JOIN v
             GROUP BY 1)
           SELECT t.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
             coalesce(sc.score_unats, 0) AS score_unats
           FROM t LEFT JOIN sc USING (doc_id) ORDER BY t.doc_id""",

      // q81's lifecycle split: counts come from the 80% train slice only,
      // the 20% held-out slice is scored with coalesce-0 counts (the add-1
      // smoothing handles OOV with no special case on either engine)
      "q82_lm_lifecycle" ->
        s"""WITH tr AS (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id % 5 <> 0),
           te AS (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id % 5 = 0),
           bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM (
             SELECT unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
               unnest(list_slice(toks, 2, len(toks))) AS w2
             FROM tr WHERE len(toks) >= 2) GROUP BY 1, 2),
           u AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                 FROM (SELECT unnest(toks) AS w FROM tr) GROUP BY 1),
           v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
           db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m FROM (
             SELECT doc_id,
               unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
               unnest(list_slice(toks, 2, len(toks))) AS w2
             FROM te WHERE len(toks) >= 2) GROUP BY 1, 2, 3),
           sc AS (
             SELECT db.doc_id, CAST(sum(db.m) AS BIGINT) AS n_bigrams,
               CAST(sum(db.m * CAST(round(ln((coalesce(bg.cb, 0) + 1.0) /
                 (coalesce(u.cu, 0) + v.v)) * 1e6) AS BIGINT)) AS BIGINT) AS score_unats
             FROM db LEFT JOIN bg USING (w1, w2) LEFT JOIN u ON u.w = db.w1 CROSS JOIN v
             GROUP BY 1)
           SELECT te.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
             coalesce(sc.score_unats, 0) AS score_unats
           FROM te LEFT JOIN sc USING (doc_id) ORDER BY te.doc_id""",

      // Morton interleave, bit i of col k -> output bit 2i+k (partkey
      // even, suppkey odd) — pure integer shift/mask arithmetic
      "q83_zorder_key" ->
        """SELECT l_orderkey, l_linenumber,
             CAST(list_sum(list_transform(range(0, 21), i ->
               (((l_partkey >> i) & 1) << (2 * i)) +
               (((l_suppkey >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zkey
           FROM lineitem
           ORDER BY zkey, l_orderkey, l_linenumber""",

      // q81's scores, per-bigram floor-averaged (subtract the FLOOR mod —
      // DuckDB % truncates, so re-floor it — then exact integer division),
      // ranked ascending with doc_id tiebreak; bottom decile dropped
      "q84_lm_quality_filter" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           db0 AS (
             SELECT doc_id,
               unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
               unnest(list_slice(toks, 2, len(toks))) AS w2
             FROM t WHERE len(toks) >= 2),
           db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m
                  FROM db0 GROUP BY 1, 2, 3),
           bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
                  FROM db0 GROUP BY 1, 2),
           u AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                 FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
           v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
           sc AS (
             SELECT db.doc_id, CAST(sum(db.m) AS BIGINT) AS n_bigrams,
               CAST(sum(db.m * CAST(round(ln((bg.cb + 1.0) / (u.cu + v.v)) * 1e6) AS BIGINT)) AS BIGINT) AS score_unats
             FROM db JOIN bg USING (w1, w2) JOIN u ON u.w = db.w1 CROSS JOIN v
             GROUP BY 1),
           avgd AS (
             SELECT doc_id,
               CAST((score_unats - (((score_unats % n_bigrams) + n_bigrams) % n_bigrams))
                 // n_bigrams AS BIGINT) AS avg_unats
             FROM sc WHERE n_bigrams >= 1),
           ranked AS (
             SELECT doc_id, avg_unats,
               row_number() OVER (ORDER BY avg_unats, doc_id) AS rank,
               CAST(count(*) OVER () AS BIGINT) AS n
             FROM avgd)
           SELECT doc_id, avg_unats, CAST(rank AS BIGINT) AS rank,
             rank > (n // 10) AS kept
           FROM ranked ORDER BY rank""",

      // largest-remainder apportionment of exactly 300 slots across
      // sources (base ⌊300·cnt/T⌋ + remainder top-up, stratum ascending on
      // ties), stratum filled in md5(doc_id) order — all-integer arithmetic
      "q78_stratified_quota" ->
        """WITH c AS (
             SELECT source, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY source),
           a AS (
             SELECT source, cnt,
               (cnt * 300) // (sum(cnt) OVER ()) AS base,
               (cnt * 300) % (sum(cnt) OVER ()) AS rem
             FROM c),
           q AS (
             SELECT source,
               CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <=
                 300 - sum(base) OVER () THEN 1 ELSE 0 END AS BIGINT) AS quota
             FROM a)
           SELECT d.doc_id, d.source, q.quota,
             row_number() OVER (PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) <= q.quota AS kept
           FROM documents d JOIN q USING (source)
           ORDER BY doc_id""",

      "q68_group_cap" ->
        """SELECT doc_id, lang FROM (
             SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             FROM documents) t
           WHERE rn <= 50 ORDER BY doc_id""",

      "q69_interleave" ->
        """WITH g AS (
             SELECT lang, row_number() OVER (ORDER BY lang) AS grank,
               count(*) OVER () AS gn
             FROM (SELECT DISTINCT lang FROM documents)),
           r AS (
             SELECT doc_id, d.lang,
               row_number() OVER (PARTITION BY d.lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             FROM documents d)
           SELECT doc_id, r.lang AS lang,
             (rn - 1) * gn + (grank - 1) AS order_idx
           FROM r JOIN g ON r.lang = g.lang
           ORDER BY order_idx""",

      "q59_pivot" ->
        s"""SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN ${C.format("l_quantity")} END) AS BIGINT) AS qty_f_c,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN ${C.format("l_quantity")} END) AS BIGINT) AS qty_o_c
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

      "q62_unpivot" ->
        s"""SELECT l_returnflag, metric, CAST(sum(v) AS BIGINT) AS total FROM (
             SELECT l_returnflag, 'qty_c' AS metric, ${C.format("l_quantity")} AS v FROM lineitem
             UNION ALL
             SELECT l_returnflag, 'price_c' AS metric, ${C.format("l_extendedprice")} AS v FROM lineitem
             UNION ALL
             SELECT l_returnflag, 'disc_e4' AS metric,
               CAST(round(l_discount * 10000) AS BIGINT) AS v FROM lineitem) u
           GROUP BY l_returnflag, metric ORDER BY l_returnflag, metric""",

      // latest event per user (ms desc, event_id desc) merged into the
      // customer snapshot: trailing 'error' deletes, else upsert
      "q85_cdc_merge" ->
        """WITH base AS (
             SELECT c_custkey, c_name,
               CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c, c_mktsegment
             FROM customer),
           ch AS (
             SELECT user_id AS k, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
             FROM events),
           latest AS (
             SELECT k,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               'cdc_' || CAST(k AS VARCHAR) AS c_name,
               CAST(round(value * 100) AS BIGINT) AS acctbal_c,
               event_type AS c_mktsegment
             FROM ch WHERE rn = 1)
           SELECT coalesce(l.k, b.c_custkey) AS c_custkey,
             CASE WHEN l.k IS NOT NULL THEN l.c_name ELSE b.c_name END AS c_name,
             CASE WHEN l.k IS NOT NULL THEN l.acctbal_c ELSE b.acctbal_c END AS acctbal_c,
             CASE WHEN l.k IS NOT NULL THEN l.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment
           FROM base b FULL OUTER JOIN latest l ON b.c_custkey = l.k
           WHERE l.op IS NULL OR l.op <> 'D'
           ORDER BY c_custkey""",

      // runs of equal event_type per user -> versioned validity intervals
      "q86_scd2_history" ->
        """WITH e AS (
             SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
           o AS (
             SELECT *, lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ms, event_id) AS prev
             FROM e),
           b AS (SELECT user_id, ms, event_id, event_type FROM o
                 WHERE prev IS NULL OR prev <> event_type)
           SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ms, event_id) AS version,
             ms AS valid_from,
             lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS valid_to,
             event_type
           FROM b ORDER BY user_id, version""",

      // 3 rounds of damped integer PageRank chained through CTEs —
      // rank DIV outdeg along each edge, teleport 150000, damp 85/100;
      // every term BIGINT so the iteration is bit-exact cross-engine
      "q87_pagerank" ->
        """WITH e AS (
             SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst FROM lineitem
             UNION
             SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst FROM lineitem),
           n AS (SELECT DISTINCT src AS node FROM e
                 UNION SELECT DISTINCT dst AS node FROM e),
           d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
           r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_fp FROM n),
           r1 AS (
             SELECT n.node, CAST(150000 + (85 * coalesce(c.in_fp, 0)) // 100 AS BIGINT) AS rank_fp
             FROM n LEFT JOIN (
               SELECT e.dst AS node, CAST(sum(r0.rank_fp // d.deg) AS BIGINT) AS in_fp
               FROM e JOIN r0 ON r0.node = e.src JOIN d ON d.src = e.src
               GROUP BY e.dst) c ON c.node = n.node),
           r2 AS (
             SELECT n.node, CAST(150000 + (85 * coalesce(c.in_fp, 0)) // 100 AS BIGINT) AS rank_fp
             FROM n LEFT JOIN (
               SELECT e.dst AS node, CAST(sum(r1.rank_fp // d.deg) AS BIGINT) AS in_fp
               FROM e JOIN r1 ON r1.node = e.src JOIN d ON d.src = e.src
               GROUP BY e.dst) c ON c.node = n.node),
           r3 AS (
             SELECT n.node, CAST(150000 + (85 * coalesce(c.in_fp, 0)) // 100 AS BIGINT) AS rank_fp
             FROM n LEFT JOIN (
               SELECT e.dst AS node, CAST(sum(r2.rank_fp // d.deg) AS BIGINT) AS in_fp
               FROM e JOIN r2 ON r2.node = e.src JOIN d ON d.src = e.src
               GROUP BY e.dst) c ON c.node = n.node)
           SELECT node, rank_fp FROM r3 ORDER BY node""",

      // token-membership boolean retrieval over the same normalization
      "q88_inverted_index" ->
        s"""WITH t AS (SELECT doc_id, n_chars, $toks AS toks FROM documents)
           SELECT doc_id, n_chars FROM t
           WHERE list_contains(toks, 'join') AND list_contains(toks, 'stream')
             AND NOT list_contains(toks, 'slow')
           ORDER BY doc_id""",

      // adjacent-bigram PMI quantized per distinct pair (round(ln·1e6)) —
      // the double arithmetic is the same left-associated shape as the
      // engine's; counts and outputs all BIGINT
      "q89_pmi_colloc" ->
        s"""WITH t AS (SELECT $toks AS toks FROM documents),
           bg AS (
             SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair FROM (
               SELECT unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
                 unnest(list_slice(toks, 2, len(toks))) AS w2
               FROM t WHERE len(toks) >= 2) GROUP BY 1, 2),
           u AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                 FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
           n AS (SELECT CAST(sum(cu) AS BIGINT) AS n_total FROM u)
           SELECT bg.w1, bg.w2, bg.c_pair,
             CAST(round(ln(CAST(bg.c_pair AS DOUBLE) * CAST(n.n_total AS DOUBLE)
               / CAST(u1.cu AS DOUBLE) / CAST(u2.cu AS DOUBLE)) * 1e6) AS BIGINT) AS pmi_unats
           FROM bg
           JOIN u u1 ON u1.w = bg.w1
           JOIN u u2 ON u2.w = bg.w2
           CROSS JOIN n
           WHERE bg.c_pair >= 5
           ORDER BY pmi_unats DESC, w1, w2 LIMIT 200""",

      // BM25 with the engine's exact expression shape: per-(term,doc)
      // double score quantized to micro-nats at ONE site, then exact
      // BIGINT per-doc sums. Double literals rendered from the same JVM
      // doubles the engine uses (e-notation forces DOUBLE parse).
      "q90_bm25" -> {
        def fmtD(v: Double): String = {
          val s0 = java.lang.Double.toString(v)
          if (s0.contains("E")) s0.replace("E", "e") else s0 + "e0"
        }
        val (k1p1, k1s, omb, bs) = (fmtD(1.2 + 1.0), fmtD(1.2), fmtD(1.0 - 0.75), fmtD(0.75))
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t WHERE len(toks) > 0),
           post AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                    FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d) GROUP BY 1, 2, 3),
           meta AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
           probed AS (SELECT * FROM post WHERE term IN ('join', 'window', 'fast')),
           dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM probed GROUP BY 1),
           sc AS (SELECT p.doc_id,
             CAST(round(
               ln(1e0 + (CAST(m.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 5e-1) / (CAST(f.df AS DOUBLE) + 5e-1))
               * (CAST(p.tf AS DOUBLE) * $k1p1)
               / (CAST(p.tf AS DOUBLE) + $k1s * ($omb + $bs * CAST(p.dl AS DOUBLE) / (CAST(m.sum_dl AS DOUBLE) / CAST(m.n_docs AS DOUBLE))))
               * 1e6) AS BIGINT) AS s
             FROM probed p JOIN dfs f ON f.term = p.term CROSS JOIN meta m)
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, CAST(sum(s) AS BIGINT) AS score_unats
           FROM sc GROUP BY 1 ORDER BY score_unats DESC, doc_id LIMIT 100"""
      },

      // conversion funnel: min-timestamp chaining, strict >, 6h window
      // via exact interval arithmetic on microsecond timestamps
      "q91_funnel" ->
        """WITH a AS (SELECT user_id, min(ts) AS t FROM events
             WHERE event_type = 'signup' GROUP BY 1),
           b AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN a USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > a.t AND e.ts <= a.t + INTERVAL 6 HOUR GROUP BY 1),
           c AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN b USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > b.t AND e.ts <= b.t + INTERVAL 6 HOUR GROUP BY 1)
           SELECT * FROM (
             SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
                    CAST((SELECT count(*) FROM a) AS BIGINT) AS users
             UNION ALL SELECT 2, 'click', (SELECT count(*) FROM b)
             UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM c))
           ORDER BY step""",

      // weekly cohorts via integer division of epoch millis — exact
      // BIGINT bucket arithmetic on both engines, no date formatting
      "q92_cohort_retention" ->
        """WITH x AS (SELECT user_id,
             epoch_ms(ts) // 604800000 AS wk,
             (min(epoch_ms(ts)) OVER (PARTITION BY user_id)) // 604800000 AS cohort
           FROM events)
           SELECT cohort AS cohort_bucket, wk - cohort AS bucket_offset,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS users
           FROM x GROUP BY 1, 2 ORDER BY 1, 2""",

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

      // exact triangle count, canonical a<b<c triple join — the engine's
      // degree-ordered orientation must agree exactly
      "q94_triangles" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT DISTINCT least(x.pk, y.pk) AS a, greatest(x.pk, y.pk) AS b
                  FROM li x JOIN li y ON x.ok = y.ok AND x.pk <> y.pk)
           SELECT
             (SELECT count(*) FROM (SELECT a FROM e0 UNION SELECT b FROM e0)) AS n_nodes,
             (SELECT count(*) FROM e0) AS n_edges,
             (SELECT count(*) FROM e0 e1
                JOIN e0 e2 ON e2.a = e1.b
                JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""",

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

      // Efraimidis-Spirakis keys over the identical 60-bit md5 u, quantized
      // to micro-nats before ranking (q81's exactness argument for ln)
      "q96_weighted_sample" ->
        """WITH kk AS (
             SELECT doc_id, n_chars,
               CAST(round(-ln((CAST('0x' || substr(md5('q96:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1.0)
                     / 1152921504606846976.0)
                   / n_chars * 1e6) AS BIGINT) AS key_unats
             FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
           SELECT doc_id, n_chars, key_unats FROM kk
           ORDER BY key_unats, doc_id LIMIT 80""",

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

      // q96's Efraimidis-Spirakis keys ranked within each source stratum
      "q98_group_weighted_sample" ->
        """WITH kk AS (
             SELECT source, doc_id, n_chars,
               CAST(round(-ln((CAST('0x' || substr(md5('q98:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1.0)
                     / 1152921504606846976.0)
                   / n_chars * 1e6) AS BIGINT) AS key_unats
             FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
           r AS (SELECT *, CAST(row_number() OVER (
                   PARTITION BY source ORDER BY key_unats, doc_id) AS BIGINT) AS rank
                 FROM kk)
           SELECT source, doc_id, n_chars, key_unats, rank FROM r
           WHERE rank <= 20 ORDER BY source, rank""",

      // exact per-group top-10 — the sketch runs in its provably-exact
      // regime (capacity >> per-lang vocabulary), tiebreak (cnt desc, word)
      // on both engines
      "q99_group_topk_sketch" ->
        """WITH c AS (
             SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt FROM (
               SELECT lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
               FROM documents) t
             WHERE word <> '' GROUP BY lang, word),
           r AS (SELECT *, row_number() OVER (
                   PARTITION BY lang ORDER BY cnt DESC, word) AS rn FROM c)
           SELECT lang, word, cnt FROM r WHERE rn <= 10
           ORDER BY lang, cnt DESC, word""",

      // the IDENTICAL plan-time JL matrix inlined as literals (q33's
      // pattern): project, then q21's ranking in the projected space
      "q100_random_projection" -> {
        val scale = math.sqrt(12.0 / 16)
        val comps = (0 until 16).map { j =>
          val hp = graft.functions.Vectors.hyperplane(7000 + j, EmbeddingDim)
            .map(_.toString).mkString("[", ", ", "]")
          s"list_sum(list_transform(range(1, ${EmbeddingDim + 1}), i -> " +
            s"CAST(embedding[i] AS DOUBLE) * ($hp)[i])) * $scale"
        }.mkString("[", ", ", "]")
        s"""WITH p AS (SELECT vec_id, $comps AS pv FROM embeddings),
           q AS (SELECT vec_id AS query_id, pv AS qv FROM p WHERE vec_id % 100 = 0),
           scored AS (
             SELECT query_id, c.vec_id AS neighbor_id,
               CASE WHEN sqrt(list_sum(list_transform(qv, x -> x * x)))
                         * sqrt(list_sum(list_transform(c.pv, x -> x * x))) = 0
                    THEN 0.0
                    ELSE list_sum(list_transform(range(1, 17), i -> qv[i] * c.pv[i]))
                         / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                            * sqrt(list_sum(list_transform(c.pv, x -> x * x))))
               END AS cosine
             FROM p c CROSS JOIN q WHERE c.vec_id <> query_id),
           ranked AS (
             SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
             FROM scored)
           SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 10
           ORDER BY query_id, rank"""
      },

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

      // df over per-doc DISTINCT tokens; boilerplate iff df/N >= 78/100 by
      // integer cross-multiply; order-preserving reassembly; all-boilerplate
      // docs survive with clean_text = ''
      "q103_boilerplate_prune" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           tok AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p, toks
                   FROM t WHERE len(toks) > 0),
           flat AS (SELECT doc_id, p, toks[p] AS tok FROM tok),
           dfr AS (SELECT tok, count(DISTINCT doc_id) AS dfc FROM flat GROUP BY tok),
           n AS (SELECT count(*) AS nd FROM documents),
           hi AS (SELECT tok FROM dfr, n WHERE dfc * 100 >= nd * 78),
           kept AS (SELECT doc_id, p, tok FROM flat
                    WHERE tok NOT IN (SELECT tok FROM hi)),
           agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
                     CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY doc_id),
           base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok FROM t)
           SELECT b.doc_id, coalesce(a.clean_text, '') AS clean_text,
             coalesce(a.n_kept, 0) AS n_kept,
             b.n_tok - coalesce(a.n_kept, 0) AS n_dropped
           FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""",

      // every statistic is exact-integer-derived; the only doubles are one
      // division (mean_len) and q45's repetition ratio — IEEE-identical on
      // both engines; empty docs have NULL mean_len and fail r_wlen
      "q104_gopher_rules" -> {
        val rep2 =
          s"CASE WHEN len(${shingles(2)}) <= 1 THEN 0.0 " +
          s"ELSE 1.0 - CAST(len(list_distinct(${shingles(2)})) AS DOUBLE) / CAST(len(${shingles(2)}) AS DOUBLE) END"
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           m AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tok,
             CASE WHEN len(toks) > 0
               THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE) END AS mean_len,
             $rep2 AS rep,
             CAST(len(list_filter(['the','a','of','and','is','to','in','that'],
               s -> list_contains(toks, s))) AS BIGINT) AS stop_hits
           FROM t)
           SELECT doc_id, n_tok, mean_len, rep, stop_hits,
             n_tok BETWEEN 30 AND 80 AS r_len,
             coalesce(mean_len BETWEEN 4.0 AND 4.8, false) AS r_wlen,
             rep <= 0.05 AS r_rep,
             stop_hits >= 2 AS r_stop,
             (n_tok BETWEEN 30 AND 80)
               AND coalesce(mean_len BETWEEN 4.0 AND 4.8, false)
               AND rep <= 0.05 AND stop_hits >= 2 AS keep
           FROM m ORDER BY doc_id"""
      },

      // the identical peels, unrolled: 8 >= the observed fixpoint depth at
      // the gate scale, and peeling past the fixpoint is a no-op, so extra
      // rounds cannot diverge. MATERIALIZED is load-bearing: every e_i is
      // referenced twice by round i+1, so inlining would expand e0 (and its
      // lineitem scan) 2^8 times
      "q105_kcore" -> {
        val peels = (1 to 8).map { i =>
          val pe = s"e${i - 1}"
          s"""n$i AS MATERIALIZED (SELECT node FROM (
                 SELECT node, count(*) AS c FROM (
                   SELECT a AS node FROM $pe UNION ALL SELECT b FROM $pe)
                 GROUP BY node) WHERE c >= 68),
             e$i AS MATERIALIZED (SELECT a, b FROM $pe
                     WHERE a IN (SELECT node FROM n$i)
                       AND b IN (SELECT node FROM n$i))"""
        }.mkString(",\n")
        s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS MATERIALIZED (SELECT DISTINCT least(x.pk, y.pk) AS a, greatest(x.pk, y.pk) AS b
                  FROM li x JOIN li y ON x.ok = y.ok AND x.pk <> y.pk),
           $peels
           SELECT node, CAST(c AS BIGINT) AS core_deg FROM (
             SELECT node, count(*) AS c FROM (
               SELECT a AS node FROM e8 UNION ALL SELECT b FROM e8)
             GROUP BY node)
           ORDER BY node"""
      },

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

      // both engines rank by the identical (md5 hex, id) order within each
      // length bucket; batch arithmetic is exact integer DIV/mod
      "q107_length_batching" ->
        s"""WITH t AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok,
               md5('batch:' || CAST(doc_id AS VARCHAR)) AS okey FROM documents),
           b AS (SELECT doc_id, n_tok, n_tok // 16 AS bucket, okey FROM t),
           r AS (SELECT doc_id, n_tok, bucket,
               CAST(row_number() OVER (
                 PARTITION BY bucket ORDER BY okey, doc_id) AS BIGINT) AS rn
             FROM b)
           SELECT doc_id, n_tok, bucket,
             (rn - 1) // 24 AS batch_idx,
             (rn - 1) % 24 AS pos_in_batch
           FROM r ORDER BY bucket, batch_idx, pos_in_batch""",

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

      // the identical 4 synchronous rounds, unrolled (q105's pattern):
      // per round, each node's votes = neighbor labels + its own, argmax
      // by (count desc, label asc) — both engines replay the same pure
      // function of the graph; MATERIALIZED for the same 2^R reason
      "q109_label_prop" -> {
        val roundsSql = (1 to 4).map { r =>
          val pl = s"l${r - 1}"
          s"""v$r AS MATERIALIZED (
               SELECT node, nl, count(*) AS c FROM (
                 SELECT e.dst AS node, l.label AS nl
                 FROM e0 e JOIN $pl l ON l.node = e.src
                 UNION ALL SELECT node, label FROM $pl)
               GROUP BY node, nl),
             l$r AS MATERIALIZED (
               SELECT node, nl AS label FROM (
                 SELECT node, nl, row_number() OVER (
                   PARTITION BY node ORDER BY c DESC, nl ASC) AS rn FROM v$r)
               WHERE rn = 1)"""
        }.mkString(",\n")
        s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           p AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b, count(*) AS w
                FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2),
           e0 AS MATERIALIZED (
             SELECT a AS src, b AS dst FROM p WHERE w >= 2
             UNION ALL SELECT b, a FROM p WHERE w >= 2),
           l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e0),
           $roundsSql
           SELECT node, label FROM l4 ORDER BY node"""
      },

      // exact-integer trailing sums over a value-RANGE frame; mu/sigma/flag
      // are a fixed IEEE sequence over them (sqrt is correctly rounded per
      // IEEE-754 on both engines); cold users (< 6 prior buckets) have NULL
      // mu/sigma and a false flag
      "q110_rate_anomaly" ->
        """WITH c AS (
             SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
               CAST(count(*) AS BIGINT) AS cnt
             FROM events GROUP BY 1, 2),
           w AS (
             SELECT user_id, hour, cnt,
               CAST(count(*) OVER win AS BIGINT) AS n_prior,
               sum(cnt) OVER win AS s,
               sum(cnt * cnt) OVER win AS ss
             FROM c WINDOW win AS (PARTITION BY user_id ORDER BY hour
               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
           m AS (
             SELECT user_id, hour, cnt, n_prior,
               CASE WHEN n_prior >= 6 THEN CAST(s AS DOUBLE) / n_prior END AS mu,
               CASE WHEN n_prior >= 6 THEN sqrt(greatest(
                 (ss - CAST(s AS DOUBLE) * s / n_prior) / n_prior, 0.0)) END AS sigma
             FROM w)
           SELECT user_id, hour, cnt, n_prior, mu, sigma,
             coalesce(cnt > mu + 3.0 * sigma, false) AS is_anomaly
           FROM m ORDER BY user_id, hour""",

      // identical violation semantics per check type: not_null (NULL
      // violates), in_range (NULL or outside violates), unique (surplus
      // copies via GROUP BY — nulls-equal on both engines), foreign_key
      // (NULL passes; NOT EXISTS, never NOT IN)
      "q111_quality_checks" ->
        """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem),
           r AS (
             SELECT 'not_null(l_orderkey)' AS "check", n.n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem
                WHERE l_orderkey IS NULL) AS n_violations FROM n
             UNION ALL
             SELECT 'unique(l_orderkey,l_linenumber)', n.n_rows,
               (SELECT CAST(sum(c) - count(*) AS BIGINT) FROM (
                  SELECT count(*) AS c FROM lineitem
                  GROUP BY l_orderkey, l_linenumber)) FROM n
             UNION ALL
             SELECT 'in_range(l_quantity,1.0,50.0)', n.n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem
                WHERE l_quantity IS NULL OR l_quantity < 1.0 OR l_quantity > 50.0) FROM n
             UNION ALL
             SELECT 'in_range(l_discount,0.0,0.05)', n.n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem
                WHERE l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.05) FROM n
             UNION ALL
             SELECT 'foreign_key(l_partkey->p_partkey)', n.n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                WHERE l.l_partkey IS NOT NULL AND NOT EXISTS (
                  SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) FROM n
             UNION ALL
             SELECT 'foreign_key(l_suppkey->s_suppkey)', n.n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                WHERE l.l_suppkey IS NOT NULL AND NOT EXISTS (
                  SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) FROM n)
           SELECT "check", n_rows, n_violations, n_violations = 0 AS pass
           FROM r ORDER BY "check"""",

      // the q17 + q101 + q104 CTEs chained over each stage's survivors;
      // stage names carry the pipeline order so ORDER BY stage is the
      // pipeline order
      "q112_pipeline_report" -> {
        val rep2 =
          s"CASE WHEN len(${shingles(2)}) <= 1 THEN 0.0 " +
          s"ELSE 1.0 - CAST(len(list_distinct(${shingles(2)})) AS DOUBLE) / CAST(len(${shingles(2)}) AS DOUBLE) END"
        s"""WITH s1 AS MATERIALIZED (
             SELECT d.* FROM documents d JOIN (
               SELECT min(doc_id) AS doc_id FROM (
                 SELECT doc_id, md5($norm) AS fp FROM documents) f
               GROUP BY fp) k USING (doc_id)),
           sh AS (SELECT doc_id AS id, unnest(${hashedShingles(3)}) AS s
                  FROM (SELECT doc_id, $toks AS toks FROM s1) dd),
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
               THEN id_a ELSE id_b END AS victim FROM flagged),
           s2 AS MATERIALIZED (
             SELECT * FROM s1 WHERE doc_id NOT IN (SELECT victim FROM victims)),
           m AS (SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CASE WHEN len(toks) > 0
                 THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END AS mean_len,
               $rep2 AS rep,
               CAST(len(list_filter(['the','a','of','and','is','to','in','that'],
                 s -> list_contains(toks, s))) AS BIGINT) AS stop_hits
             FROM (SELECT doc_id, $toks AS toks FROM s2) q),
           s3 AS MATERIALIZED (
             SELECT doc_id FROM m
             WHERE n_tok BETWEEN 30 AND 80
               AND coalesce(mean_len BETWEEN 4.0 AND 4.8, false)
               AND rep <= 0.05 AND stop_hits >= 2),
           n AS (SELECT
             (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n0,
             (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
             (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
             (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3)
           SELECT stage, n_in, n_dropped, n_out FROM (
             SELECT '1_exact_dedup' AS stage, n0 AS n_in, n0 - n1 AS n_dropped, n1 AS n_out FROM n
             UNION ALL
             SELECT '2_containment_dedup', n1, n1 - n2, n2 FROM n
             UNION ALL
             SELECT '3_quality_rules', n2, n2 - n3, n3 FROM n)
           ORDER BY stage"""
      },

      // q109's unroll with WEIGHTED votes: neighbor votes carry the edge
      // weight, the self-vote carries the node's max incident weight (the
      // heavy-pair oscillation damper); argmax (weight desc, label asc)
      "q113_weighted_label_prop" -> {
        val roundsSql = (1 to 4).map { r =>
          val pl = s"l${r - 1}"
          s"""v$r AS MATERIALIZED (
               SELECT node, nl, sum(w) AS c FROM (
                 SELECT e.dst AS node, l.label AS nl, e.w
                 FROM e0 e JOIN $pl l ON l.node = e.src
                 UNION ALL
                 SELECT l.node, l.label, sw.sw FROM $pl l
                 JOIN selfw sw ON sw.node = l.node)
               GROUP BY node, nl),
             l$r AS MATERIALIZED (
               SELECT node, nl AS label FROM (
                 SELECT node, nl, row_number() OVER (
                   PARTITION BY node ORDER BY c DESC, nl ASC) AS rn FROM v$r)
               WHERE rn = 1)"""
        }.mkString(",\n")
        s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           p AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b, CAST(count(*) AS BIGINT) AS w
                FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2),
           e0 AS MATERIALIZED (
             SELECT a AS src, b AS dst, w FROM p WHERE w >= 2
             UNION ALL SELECT b, a, w FROM p WHERE w >= 2),
           selfw AS MATERIALIZED (SELECT src AS node, max(w) AS sw FROM e0 GROUP BY src),
           l0 AS MATERIALIZED (SELECT node, node AS label FROM selfw),
           $roundsSql
           SELECT node, label FROM l4 ORDER BY node"""
      },

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

      // type-1 quantiles = the element at rank ceil(p*N) of the identical
      // (value, orderkey) total order — an actual data element on both
      // engines, no interpolation; full-key ties imply equal values, so
      // the selected value is deterministic
      "q115_global_quantiles" ->
        """WITH r AS (SELECT l_extendedprice AS v,
               row_number() OVER (ORDER BY l_extendedprice, l_orderkey) AS rnk
             FROM lineitem),
           n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM lineitem),
           ps AS (SELECT unnest([0.5, 0.9, 0.99, 1.0]) AS p)
           SELECT ps.p, r.v AS value
           FROM ps, n, r
           WHERE r.rnk = CAST(ceil(ps.p * n.nn) AS BIGINT)
           ORDER BY p""",

      // the identical 6 h-index rounds, unrolled (q105/q109's pattern):
      // per round each node takes the H-index of its neighbors' values —
      // max(least(rank, value)) over a desc rank, which is invariant to
      // tie order, so the non-unique window sort cannot diverge engines.
      // MATERIALIZED for the same 2^R inlining reason as q105
      "q116_core_numbers" -> {
        val roundsSql = (1 to 6).map { r =>
          val ph = s"h${r - 1}"
          s"""h$r AS MATERIALIZED (
               SELECT node, max(least(rn, nh)) AS core_h FROM (
                 SELECT e.dst AS node, l.core_h AS nh,
                   row_number() OVER (PARTITION BY e.dst ORDER BY l.core_h DESC) AS rn
                 FROM e0 e JOIN $ph l ON l.node = e.src) GROUP BY node)"""
        }.mkString(",\n")
        s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           p AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b, count(*) AS w
                FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2),
           e0 AS MATERIALIZED (
             SELECT a AS src, b AS dst FROM p WHERE w >= 2
             UNION ALL SELECT b, a FROM p WHERE w >= 2),
           h0 AS MATERIALIZED (
             SELECT src AS node, CAST(count(*) AS BIGINT) AS core_h
             FROM e0 GROUP BY src),
           $roundsSql
           SELECT node, core_h FROM h6 ORDER BY node"""
      },

      // ntile's SQL-standard bin widths (larger bins first) against the
      // engine's integer-arithmetic reconstruction over the distributed
      // rank — boundary placement checks exactly via per-bin min/max
      "q117_equidepth_bins" ->
        s"""WITH r AS (SELECT
             ntile(10) OVER (ORDER BY ${C.format("o_totalprice")}, o_orderkey) AS bin,
             ${C.format("o_totalprice")} AS price_c FROM orders)
           SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
             min(price_c) AS min_c, max(price_c) AS max_c
           FROM r GROUP BY bin ORDER BY bin""",

      // q39's cluster closure + q44's md5 CASE, keyed by the cluster
      // representative — near-dup twins share the key, so they share the
      // split on both engines by construction
      "q118_leakage_safe_split" ->
        s"""WITH RECURSIVE
           ${clusterCtes(toks, hashedShingles(3))}
           SELECT doc_id AS id,
             coalesce(comp.component, doc_id) AS representative,
             CASE WHEN substr(md5(CAST(coalesce(comp.component, doc_id) AS VARCHAR)), 1, 8)
                    < '${graft.operators.Sampling.thresholdHex(0.8)}' THEN 'train'
                  WHEN substr(md5(CAST(coalesce(comp.component, doc_id) AS VARCHAR)), 1, 8)
                    < '${graft.operators.Sampling.thresholdHex(0.9)}' THEN 'val'
                  ELSE 'test' END AS split
           FROM documents LEFT JOIN comp ON comp.id = doc_id
           ORDER BY id""",

      // the merged-stats vocabulary must equal the one computed from the
      // whole corpus in one pass — the incremental lifecycle's contract
      "q119_vocab_update" ->
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           flat AS (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t),
           dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM flat GROUP BY tok),
           n AS (SELECT count(*) AS nd FROM documents)
           SELECT tok, df FROM dfr, n
           WHERE df * 100 >= nd * 50 ORDER BY tok""",

      // full-key uniqueness makes SQL's rank() equal row_number(), so the
      // engine's (rank-1)/(n-1) division IS percent_rank; singleton
      // groups are 0.0 on both engines
      "q120_domain_percentile" ->
        """SELECT doc_id, lang, n_chars,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rank,
             percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS pct_rank
           FROM documents ORDER BY lang, rank""",

      // exact interpolated medians (q46's quantile_cont parity), then one
      // fixed IEEE sequence for the score — even the flag hash-matches;
      // MAD = 0 groups score NULL and never flag on either engine
      "q121_robust_zscore" ->
        s"""WITH f AS (SELECT l_returnflag, ${C.format("l_extendedprice")} AS price_c,
               l_orderkey, l_linenumber FROM lineitem),
           m AS (SELECT l_returnflag, quantile_cont(price_c, 0.5) AS v_med
                 FROM f GROUP BY 1),
           d AS (SELECT f.*, m.v_med,
               abs(CAST(price_c AS DOUBLE) - v_med) AS dev
             FROM f JOIN m USING (l_returnflag)),
           md AS (SELECT l_returnflag, quantile_cont(dev, 0.5) AS v_mad
                  FROM d GROUP BY 1)
           SELECT d.l_returnflag, price_c, l_orderkey, l_linenumber, v_med, v_mad,
             CASE WHEN v_mad = 0 THEN NULL
                  ELSE 0.6745 * (CAST(price_c AS DOUBLE) - v_med) / v_mad END AS score,
             coalesce(abs(CASE WHEN v_mad = 0 THEN NULL
                  ELSE 0.6745 * (CAST(price_c AS DOUBLE) - v_med) / v_mad END) > 3.5,
               false) AS is_outlier
           FROM d JOIN md USING (l_returnflag)
           ORDER BY l_returnflag, price_c, l_orderkey, l_linenumber""",

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

      // the CMS estimate replayed exactly: splitmix64 in UHUGEINT
      // mod-2^64 arithmetic (xor + floor-div shifts + mul-mod; h2
      // forced odd), positions mod 2048 (power of two, so floorMod =
      // low bits under signed OR unsigned), cells = exact occurrence
      // sums, estimate = min over the 4 rows
      "q125_cms_frequency" ->
        s"""WITH t AS (SELECT $toks AS toks FROM documents),
           occ AS (SELECT CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS key
                   FROM (SELECT unnest(${shingles(3)}) AS s FROM t)),
           kc AS (SELECT key, CAST(count(*) AS BIGINT) AS cnt FROM occ GROUP BY key),
           a1 AS (SELECT key, (CAST(key AS UHUGEINT) + 11400714819323198485) % 18446744073709551616 AS z FROM kc),
           a2 AS (SELECT key, (xor(z, z // 1073741824) * 13787848793156543929) % 18446744073709551616 AS z FROM a1),
           a3 AS (SELECT key, (xor(z, z // 134217728) * 10723151780598845931) % 18446744073709551616 AS z FROM a2),
           h1 AS (SELECT key, xor(z, z // 2147483648) AS h1 FROM a3),
           b1 AS (SELECT key, (xor(CAST(key AS UHUGEINT), 6364136223846793005) + 11400714819323198485) % 18446744073709551616 AS z FROM kc),
           b2 AS (SELECT key, (xor(z, z // 1073741824) * 13787848793156543929) % 18446744073709551616 AS z FROM b1),
           b3 AS (SELECT key, (xor(z, z // 134217728) * 10723151780598845931) % 18446744073709551616 AS z FROM b2),
           h2 AS (SELECT key, xor(z, z // 2147483648) - xor(z, z // 2147483648) % 2 + 1 AS h2 FROM b3),
           pos AS (SELECT h1.key, i,
                     CAST(i AS BIGINT) * 2048
                       + CAST((h1.h1 + CAST(i AS UHUGEINT) * h2.h2) % 18446744073709551616 % 2048 AS BIGINT) AS cell
                   FROM h1 JOIN h2 ON h1.key = h2.key, (SELECT unnest([0, 1, 2, 3]) AS i)),
           cells AS (SELECT pos.cell, CAST(sum(kc.cnt) AS BIGINT) AS cellcnt
                     FROM pos JOIN kc ON kc.key = pos.key GROUP BY pos.cell)
           SELECT kc.key, CAST(min(cells.cellcnt) AS BIGINT) AS est_count
           FROM kc JOIN pos ON pos.key = kc.key JOIN cells ON cells.cell = pos.cell
           GROUP BY kc.key ORDER BY kc.key""",

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

      // q87's unrolled integer rounds with the seed CASE: init mass and
      // teleport only on trusted-nation suppliers — bit-identical BIGINT
      // arithmetic, unreachable nodes exactly 0 on both engines
      "q124_trust_propagation" -> {
        val rounds = (1 to 3).map { i =>
          s"""r$i AS (
             SELECT n.node,
               CAST((CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END)
                 + (85 * coalesce(c.in_fp, 0)) // 100 AS BIGINT) AS rank_fp
             FROM n LEFT JOIN seeds s ON s.node = n.node LEFT JOIN (
               SELECT e.dst AS node, CAST(sum(r${i - 1}.rank_fp // d.deg) AS BIGINT) AS in_fp
               FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src JOIN d ON d.src = e.src
               GROUP BY e.dst) c ON c.node = n.node)"""
        }.mkString(",\n")
        s"""WITH e AS (
             SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst FROM lineitem
             UNION
             SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst FROM lineitem),
           n AS (SELECT DISTINCT src AS node FROM e
                 UNION SELECT DISTINCT dst AS node FROM e),
           seeds AS (SELECT DISTINCT s_suppkey + 1000000 AS node FROM supplier
                     WHERE s_nationkey IN (0, 1)),
           d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
           r0 AS (SELECT n.node,
               CAST(CASE WHEN s.node IS NOT NULL THEN 1000000 ELSE 0 END AS BIGINT) AS rank_fp
             FROM n LEFT JOIN seeds s ON s.node = n.node),
           $rounds
           SELECT node, rank_fp FROM r3 ORDER BY node"""
      },

      // dyadic fixed-point decay: weight = qv << (20 - age) in half-life
      // steps (4h), hard expiry past 20 steps — BIGINT shifts and sums
      // only, so the score is order-independent and engine-exact
      "q128_decayed_score" -> (decayedScoreSql + " ORDER BY user_id"),

      // same scores, TakeOrdered tail: the trending report
      "q137_trending" ->
        (decayedScoreSql + " ORDER BY score DESC, user_id LIMIT 20"),

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

      // content-keyed global permutation (the q74 60-bit md5 recipe) +
      // per-(anchor, j) uniform draws mod N; self-draws step forward one
      // position wrapping — all BIGINT, join on position
      "q130_contrastive_negatives" ->
        """WITH r AS (
             SELECT doc_id,
               CAST(row_number() OVER (ORDER BY
                 CAST('0x' || substr(md5('q130:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
                 doc_id) AS BIGINT) AS rnk
             FROM documents),
           n AS (SELECT CAST(max(rnk) AS BIGINT) AS cnt FROM r),
           j AS (SELECT unnest(range(1, 5)) AS neg_rank),
           d AS (
             SELECT r.doc_id, r.rnk, j.neg_rank, n.cnt,
               1 + (CAST('0x' || substr(md5('q130:neg:' || CAST(doc_id AS VARCHAR)
                 || ':' || CAST(neg_rank AS VARCHAR)), 1, 15) AS BIGINT) % n.cnt) AS cand
             FROM r CROSS JOIN n CROSS JOIN j),
           p AS (SELECT doc_id, neg_rank,
               CASE WHEN cand = rnk THEN 1 + (cand % cnt) ELSE cand END AS pos
             FROM d)
           SELECT p.doc_id, CAST(p.neg_rank AS BIGINT) AS neg_rank,
             t.doc_id AS neg_id
           FROM p JOIN r t ON t.rnk = p.pos
           WHERE t.doc_id <> p.doc_id
           ORDER BY p.doc_id, neg_rank""",

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

      // greedy TTL admission per fingerprint unrolled as a recursive CTE
      // (the q57/q75 transition pattern): kept resets the clock, 10h TTL
      // over a 3-round +6h crawl log
      "q132_recrawl_suppress" ->
        s"""WITH RECURSIVE crawls AS (
             SELECT CAST(doc_id * 10 + r AS BIGINT) AS crawl_id, doc_id,
               md5($norm) AS fp, CAST(r * 21600000000 AS BIGINT) AS ts_us
             FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) t
             WHERE doc_id % (r + 1) = 0),
           seq AS (
             SELECT crawl_id, doc_id, fp, ts_us,
               row_number() OVER (PARTITION BY fp ORDER BY ts_us, crawl_id) AS rn
             FROM crawls),
           walked AS (
             SELECT crawl_id, doc_id, fp, ts_us, rn, TRUE AS kept,
               ts_us AS last_kept
             FROM seq WHERE rn = 1
             UNION ALL
             SELECT s.crawl_id, s.doc_id, s.fp, s.ts_us, s.rn,
               s.ts_us - w.last_kept >= 36000000000,
               CASE WHEN s.ts_us - w.last_kept >= 36000000000
                 THEN s.ts_us ELSE w.last_kept END
             FROM seq s JOIN walked w ON s.fp = w.fp AND s.rn = w.rn + 1)
           SELECT crawl_id, doc_id, fp, ts_us, kept
           FROM walked ORDER BY crawl_id""",

      // q74's permutation mirror + the q57 recursive next-fit transition
      // keyed by SHARD, aggregated to per-bin occupancy
      "q134_batch_assembly" ->
        s"""WITH RECURSIVE t AS (
             SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_toks,
               CAST('0x' || substr(md5('q134:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS skey
             FROM documents),
           s AS (
             SELECT doc_id, n_toks, skey % 8 AS shard,
               row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS rn
             FROM t),
           walked AS (
             SELECT doc_id, shard, n_toks, rn, CAST(0 AS BIGINT) AS bin,
               n_toks AS fill
             FROM s WHERE rn = 1
             UNION ALL
             SELECT s.doc_id, s.shard, s.n_toks, s.rn,
               CASE WHEN w.fill > 0 AND w.fill + s.n_toks > 512
                 THEN w.bin + 1 ELSE w.bin END,
               CASE WHEN w.fill > 0 AND w.fill + s.n_toks > 512
                 THEN s.n_toks ELSE w.fill + s.n_toks END
             FROM s JOIN walked w ON s.shard = w.shard AND s.rn = w.rn + 1)
           SELECT shard, bin AS bin_id, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             CAST(sum(n_toks) AS DOUBLE) / 512.0 AS fill_frac
           FROM walked GROUP BY shard, bin ORDER BY shard, bin_id""",

      // q94's triangle core + the exact wedge sum; 3T/W is one IEEE
      // division of exact integers
      "q136_clustering_coeff" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT DISTINCT least(x.pk, y.pk) AS a, greatest(x.pk, y.pk) AS b
                  FROM li x JOIN li y ON x.ok = y.ok AND x.pk <> y.pk),
           deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
                     (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) t
                   GROUP BY node)
           SELECT
             (SELECT count(*) FROM deg) AS n_nodes,
             (SELECT count(*) FROM e0) AS n_edges,
             (SELECT count(*) FROM e0 e1
                JOIN e0 e2 ON e2.a = e1.b
                JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles,
             (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
             CASE WHEN (SELECT sum(deg * (deg - 1) // 2) FROM deg) > 0 THEN
               3.0 * CAST((SELECT count(*) FROM e0 e1
                 JOIN e0 e2 ON e2.a = e1.b
                 JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b) AS DOUBLE)
               / CAST((SELECT sum(deg * (deg - 1) // 2) FROM deg) AS DOUBLE)
             END AS global_cc""",

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

      // per-range profile of the sorted export — the round-trip through
      // range=year/ directories must preserve exactly the year groups
      "q138_sorted_export" ->
        """SELECT CAST(year(o_orderdate) AS BIGINT) AS range,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(o_orderdate) AS d_min, max(o_orderdate) AS d_max,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1 ORDER BY range""",

      // TPC-H Q7 shape over every cross-border nation pair; revenue in
      // exact e4 units (cents × (100 − disc_cents))
      "q139_volume_shipping" ->
        """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
             CAST(count(*) AS BIGINT) AS n_items
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
           WHERE sn.n_nationkey <> cn.n_nationkey
           GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

      // q87's unrolled integer rounds with the weight ratio in the
      // recurrence: contribution = rank·w // strength, strength = Σw
      "q140_weighted_pagerank" -> {
        val rounds = (1 to 3).map { i =>
          s"""r$i AS (
             SELECT n.node,
               CAST(150000 + (85 * coalesce(c.in_fp, 0)) // 100 AS BIGINT) AS rank_fp
             FROM n LEFT JOIN (
               SELECT e.dst AS node,
                 CAST(sum((r${i - 1}.rank_fp * e.w) // d.deg) AS BIGINT) AS in_fp
               FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src
               JOIN d ON d.src = e.src
               GROUP BY e.dst) c ON c.node = n.node)"""
        }.mkString(",\n")
        s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           strong AS (
             SELECT x.pk AS a, y.pk AS b, CAST(count(*) AS BIGINT) AS w
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             GROUP BY 1, 2 HAVING count(*) >= 2),
           e AS (SELECT a AS src, b AS dst, w FROM strong
                 UNION ALL SELECT b AS src, a AS dst, w FROM strong),
           n AS (SELECT DISTINCT src AS node FROM e),
           d AS (SELECT src, CAST(sum(w) AS BIGINT) AS deg FROM e GROUP BY src),
           r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_fp FROM n),
           $rounds
           SELECT node, rank_fp FROM r3 ORDER BY node"""
      },

      // per-group rank selection mirrored literally (row_number + group
      // count + the same ceil(p·n) index) — no quantile builtin whose
      // convention could differ
      // rank selected by INTEGER comparison (r−1)·den < num·n ≤ r·den —
      // both engines do zero float arithmetic until the reported p =
      // num/den division of the same exact integers
      "q141_grouped_quantiles" ->
        """WITH r AS (
             SELECT source, n_chars, doc_id,
               CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS gn
             FROM documents),
           j AS (SELECT r.*, pn, pd FROM r
                 CROSS JOIN (VALUES (1, 4), (1, 2), (9, 10)) AS q(pn, pd))
           SELECT source, CAST(pn AS DOUBLE) / CAST(pd AS DOUBLE) AS p,
                  n_chars AS value FROM j
           WHERE (rnk - 1) * pd < pn * gn AND pn * gn <= rnk * pd
           ORDER BY source, p""",

      // q128's decayed-score body feeding q96's ES-key recipe: weight =
      // exact BIGINT score, key quantized to integer micro-nats
      "q142_recency_sample" -> {
        s"""WITH sc AS ($decayedScoreSql),
           kk AS (
             SELECT user_id, score,
               CAST(round(-ln((CAST('0x' || substr(md5('q142:' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) + 1.0)
                     / 1152921504606846976.0)
                   / CAST(score AS DOUBLE) * 1e6) AS BIGINT) AS key_unats
             FROM sc WHERE score IS NOT NULL AND score > 0)
           SELECT user_id, score, key_unats FROM kk
           ORDER BY key_unats, user_id LIMIT 50"""
      },

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

      // word-frequency-weighted adjacent char pairs — BPE round one;
      // (count desc, a, b) is a total order so the LIMIT is stable
      "q144_bpe_candidates" ->
        s"""WITH w AS (
             SELECT w, CAST(count(*) AS BIGINT) AS freq FROM
               (SELECT unnest($toks) AS w FROM documents) t GROUP BY w),
           p AS (
             SELECT substr(w, CAST(i AS INTEGER), 1) AS a,
               substr(w, CAST(i AS INTEGER) + 1, 1) AS b, freq
             FROM (SELECT w, freq, unnest(range(1, length(w))) AS i
                   FROM w WHERE length(w) > 1) t)
           SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count
           FROM p GROUP BY a, b
           ORDER BY pair_count DESC, a, b LIMIT 20""",

      // two unrolled BPE rounds: count → top pair → marker-encoded
      // corpus-wide merge (chr(1)-wrapped symbols, no shared delimiters)
      // → recount → top pair
      "q145_bpe_rounds" ->
        s"""WITH w AS (
             SELECT w, CAST(count(*) AS BIGINT) AS freq FROM
               (SELECT unnest($toks) AS w FROM documents) t
             GROUP BY w HAVING length(w) > 1 AND strpos(w, chr(1)) = 0),
           p1 AS (
             SELECT substr(w, CAST(i AS INTEGER), 1) AS a,
               substr(w, CAST(i AS INTEGER) + 1, 1) AS b, freq
             FROM (SELECT w, freq, unnest(range(1, length(w))) AS i FROM w) t),
           t1 AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count FROM p1
                  GROUP BY a, b ORDER BY pair_count DESC, a, b LIMIT 1),
           m AS (
             SELECT freq,
               list_filter(string_split(
                 replace(regexp_replace(w, '(.)', chr(1) || '\\1' || chr(1), 'g'),
                   chr(1) || t1.a || chr(1) || chr(1) || t1.b || chr(1),
                   chr(1) || t1.a || t1.b || chr(1)),
                 chr(1)), x -> len(x) > 0) AS syms
             FROM w CROSS JOIN t1),
           p2 AS (
             SELECT syms[CAST(i AS INTEGER)] AS a,
               syms[CAST(i AS INTEGER) + 1] AS b, freq
             FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
                   FROM m WHERE len(syms) > 1) t),
           t2 AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count FROM p2
                  GROUP BY a, b ORDER BY pair_count DESC, a, b LIMIT 1)
           SELECT CAST(1 AS BIGINT) AS round, a, b, pair_count FROM t1
           UNION ALL
           SELECT CAST(2 AS BIGINT) AS round, a, b, pair_count FROM t2
           ORDER BY round""",

      // Mann–Whitney midrank arithmetic mirrored literally: row_number
      // over the identical (score, id) order, per-score min/max ranks,
      // u2 = Σ pos·(mn+mx) — zero float work until the final division
      "q146_auc_exact" ->
        """WITH r AS (
             SELECT embedding[2] AS s, (label % 2 = 0) AS pos,
               CAST(row_number() OVER (ORDER BY embedding[2], vec_id) AS BIGINT) AS rn
             FROM embeddings),
           g AS (SELECT s, min(rn) AS mn, max(rn) AS mx,
                   CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pc
                 FROM r GROUP BY s),
           t AS (SELECT CAST(sum(pc) AS BIGINT) AS n_pos,
                   CAST(max(mx) AS BIGINT) AS n,
                   CAST(sum(pc * (mn + mx)) AS BIGINT) AS u2 FROM g)
           SELECT n_pos, n - n_pos AS n_neg, u2,
             CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
               CAST(u2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / CAST(2 * n_pos * (n - n_pos) AS DOUBLE)
             END AS auc
           FROM t""",

      // ntile(10) IS the equi-depth bin arithmetic (the q117 precedent);
      // pos_rate is one division of exact integers, bounds are min/max
      "q147_calibration_bins" ->
        """WITH r AS (
             SELECT embedding[2] AS s, (label % 2 = 0) AS pos,
               ntile(10) OVER (ORDER BY embedding[2], vec_id) AS bin
             FROM embeddings)
           SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS pos_rate,
             min(s) AS score_min, max(s) AS score_max
           FROM r GROUP BY bin ORDER BY bin""",

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

      // the DECIMAL(38) algebra in HUGEINT: identical integer terms,
      // identical dyadic weights, k² = 9/1 cross-multiplied
      "q149_ewma_chart" ->
        """WITH s AS (
             SELECT user_id, event_id, epoch_us(ts) // 14400000000 AS step,
               CAST(floor(greatest(value, 0.0) * 100.0) AS BIGINT) AS qv
             FROM events),
           ps AS (SELECT user_id, step, CAST(sum(qv) AS HUGEINT) AS sqv,
                    CAST(sum(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS sqv2,
                    CAST(count(*) AS BIGINT) AS cnt
                  FROM s GROUP BY 1, 2),
           f AS (SELECT user_id, step + d AS t,
                   CAST(1 << CAST(20 - d AS INTEGER) AS HUGEINT) AS w,
                   sqv, sqv2, cnt
                 FROM ps CROSS JOIN (SELECT unnest(range(1, 21)) AS d) r),
           st AS (SELECT user_id, t, sum(w * cnt) AS ww, sum(w * sqv) AS ss,
                    sum(w * sqv2) AS sss, CAST(sum(cnt) AS BIGINT) AS np
                  FROM f GROUP BY 1, 2)
           SELECT s.user_id, s.event_id, s.step, s.qv,
             COALESCE(st.np, CAST(0 AS BIGINT)) AS n_prior,
             COALESCE(st.ww > 0 AND
               (CAST(s.qv AS HUGEINT) * ww - ss) * (CAST(s.qv AS HUGEINT) * ww - ss)
                 > 9 * (ww * sss - ss * ss), FALSE) AS is_anomaly
           FROM s LEFT JOIN st ON s.user_id = st.user_id AND s.step = st.t
           ORDER BY s.event_id""",

      // token-boundary phrase matching = membership in the doc's L-token
      // shingle list, per phrase length — the same shingles macro the
      // dedup family mirrors
      "q150_blocklist" ->
        s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
           m AS (SELECT doc_id,
               (CASE WHEN list_contains(${shingles(1)}, 'spark') THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(${shingles(2)}, 'hash join') THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(${shingles(2)}, 'table scan') THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(${shingles(3)}, 'merge sort join') THEN 1 ELSE 0 END)
               AS n_blocked FROM d)
           SELECT doc_id, CAST(n_blocked AS BIGINT) AS n_blocked
           FROM m ORDER BY doc_id""",

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

      "q152_freq_spectrum" ->
        s"""SELECT freq, CAST(count(*) AS BIGINT) AS n_types FROM (
             SELECT CAST(count(*) AS BIGINT) AS freq FROM (
               SELECT unnest($toks) AS tok FROM documents) t
             GROUP BY tok) c
           GROUP BY freq ORDER BY freq""",

      // the micro-nat quantize-before-sum mirror: identical double ratio,
      // identical round(·1e6), BA direction reuses the NEGATED quantized
      // AB ratio (one log per type on both engines)
      "q153_corpus_divergence" ->
        s"""WITH ca AS (
             SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
               SELECT unnest($toks) AS tok FROM documents WHERE doc_id % 2 = 0) t
             GROUP BY tok),
           cb AS (
             SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
               SELECT unnest($toks) AS tok FROM documents WHERE doc_id % 2 = 1) t
             GROUP BY tok),
           m AS (SELECT coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
                 FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
           s AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
                   CAST(sum(cb) AS BIGINT) AS tb,
                   CAST(count(*) AS BIGINT) AS v FROM m),
           q AS (SELECT ca, cb, ta, tb, v,
                   CAST(round(ln(
                     (CAST(ca + 1 AS DOUBLE) * CAST(tb + v AS DOUBLE)) /
                     (CAST(cb + 1 AS DOUBLE) * CAST(ta + v AS DOUBLE)))
                     * 1e6) AS BIGINT) AS lq
                 FROM m CROSS JOIN s)
           SELECT ta AS n_tok_a, tb AS n_tok_b, v AS vocab,
             CAST(CAST(sum(CAST(ca + 1 AS HUGEINT) * lq) AS HUGEINT) AS DOUBLE) AS kl_ab_unats,
             CAST(CAST(sum(CAST(cb + 1 AS HUGEINT) * -lq) AS HUGEINT) AS DOUBLE) AS kl_ba_unats,
             CAST(sum((ca + 1) * lq) AS DOUBLE)
               / (CAST(ta + v AS DOUBLE) * 1e6) AS kl_ab,
             CAST(sum((cb + 1) * -lq) AS DOUBLE)
               / (CAST(tb + v AS DOUBLE) * 1e6) AS kl_ba
           FROM q GROUP BY ta, tb, v""",

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

      // both system ranks mirrored as plain row_numbers over the same
      // total orders; each reciprocal quantized to round(1e6/(60+r))
      // BEFORE the sum, so both engines fuse identical integers
      "q155_rank_fusion" ->
        s"""WITH a AS (
             SELECT doc_id, CAST(row_number() OVER
               (ORDER BY -n_chars, doc_id) AS BIGINT) AS r FROM documents),
           b AS (
             SELECT doc_id, CAST(row_number() OVER (ORDER BY fp, doc_id) AS BIGINT) AS r
             FROM (SELECT doc_id, list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(string_split($norm, ''), c -> len(c) > 0),
                     c -> CAST(ord(c) AS BIGINT))),
                 (x, y) -> (x * 31 + y) % 1000000007) AS fp FROM documents) t),
           u AS (SELECT doc_id, r FROM a UNION ALL SELECT doc_id, r FROM b)
           SELECT doc_id,
             CAST(sum(CAST(round(1e6 / CAST(r + 60 AS DOUBLE)) AS BIGINT)) AS BIGINT)
               AS rrf_unats,
             CAST(count(*) AS BIGINT) AS n_systems
           FROM u GROUP BY doc_id
           ORDER BY rrf_unats DESC, doc_id LIMIT 50""",

      // identical integer trim cut (gn*1)//10 against the same
      // (value, id) row_number order
      "q156_trimmed_stats" ->
        """WITH r AS (
             SELECT source, n_chars,
               CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS gn
             FROM documents),
           k AS (SELECT *, (gn * 1) // 10 AS t FROM r)
           SELECT source, CAST(max(gn) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(n_chars) AS BIGINT) AS sum_kept,
             min(n_chars) AS min_kept, max(n_chars) AS max_kept,
             CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS trimmed_mean
           FROM k WHERE rnk > t AND rnk <= gn - t
           GROUP BY source ORDER BY source""",

      // the >= 3%-df vocabulary replayed (per-doc distinct tokens -> df
      // -> integer cross-multiply), then a left join over the token pass
      "q157_oov_rate" ->
        s"""WITH tok AS (SELECT source, unnest($toks) AS tok FROM documents),
           pd AS (SELECT DISTINCT doc_id, tok FROM
             (SELECT doc_id, unnest($toks) AS tok FROM documents) t),
           df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM pd GROUP BY tok),
           n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
           v AS (SELECT tok FROM df CROSS JOIN n WHERE df * 100 >= nd * 3)
           SELECT source, CAST(count(*) AS BIGINT) AS n_tok,
             CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS oov_rate
           FROM tok LEFT JOIN v ON tok.tok = v.tok
           GROUP BY source ORDER BY source""",

      // sorted-shares Gini with the (size, name) deterministic
      // permutation — numerator an exact BIGINT on both engines
      "q158_gini_concentration" ->
        """WITH x AS (SELECT source, CAST(count(*) AS BIGINT) AS x
                      FROM documents GROUP BY source),
           r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, source) AS BIGINT) AS i,
                   CAST(count(*) OVER () AS BIGINT) AS g FROM x)
           SELECT CAST(max(g) AS BIGINT) AS n_groups,
             CAST(sum(x) AS BIGINT) AS total,
             CAST(sum((2 * i - g - 1) * x) AS BIGINT) AS gini_num,
             CAST(sum((2 * i - g - 1) * x) AS DOUBLE)
               / CAST(max(g) * sum(x) AS DOUBLE) AS gini
           FROM r""",

      // nested md5 thresholds (the q44 split literals); each type's
      // vocabulary entry point is its MIN document prefix
      "q159_vocab_growth" ->
        s"""WITH d AS (
             SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS p,
               $toks AS toks FROM documents),
           dt AS (SELECT p, CAST(len(toks) AS BIGINT) AS n FROM d),
           tt AS (SELECT tok, min(p) AS mp FROM
             (SELECT p, unnest(toks) AS tok FROM d) t GROUP BY tok),
           r AS (SELECT CAST(rate AS DOUBLE) AS rate, thr FROM (VALUES
             (0.1, '${graft.operators.Sampling.thresholdHex(0.1)}'),
             (0.5, '${graft.operators.Sampling.thresholdHex(0.5)}'),
             (1.0, 'g')) AS v(rate, thr)),
           dc AS (SELECT rate, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(n) AS BIGINT) AS n_tokens
                  FROM dt, r WHERE p < thr GROUP BY rate),
           vc AS (SELECT rate, CAST(count(*) AS BIGINT) AS vocab
                  FROM tt, r WHERE mp < thr GROUP BY rate)
           SELECT dc.rate, n_docs, n_tokens, vocab
           FROM dc JOIN vc ON dc.rate = vc.rate ORDER BY dc.rate""",

      // every metric an exact count or ONE division of exact counts;
      // fingerprint = md5 of the shared normalization (q35's md5_fp)
      "q160_dataset_card" ->
        s"""WITH t AS (SELECT source, lang, CAST(len($toks) AS BIGINT) AS n,
                        md5($norm) AS fp FROM documents),
           c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   CAST(sum(n) AS DOUBLE) AS n_tokens,
                   CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
                   CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
                   CAST(count(DISTINCT fp) AS DOUBLE) AS n_unique FROM t),
           x AS (SELECT source, CAST(count(*) AS BIGINT) AS x
                 FROM documents GROUP BY source),
           ri AS (SELECT x, CAST(row_number() OVER (ORDER BY x, source) AS BIGINT) AS i,
                    CAST(count(*) OVER () AS BIGINT) AS g FROM x),
           gn AS (SELECT CAST(sum((2 * i - g - 1) * x) AS DOUBLE)
                    / CAST(max(g) * sum(x) AS DOUBLE) AS gini FROM ri)
           SELECT metric, value FROM (
             SELECT 'dup_rate' AS metric, (n_docs - n_unique) / n_docs AS value FROM c
             UNION ALL SELECT 'mean_tokens', n_tokens / n_docs FROM c
             UNION ALL SELECT 'n_docs', n_docs FROM c
             UNION ALL SELECT 'n_langs', n_langs FROM c
             UNION ALL SELECT 'n_sources', n_sources FROM c
             UNION ALL SELECT 'n_tokens', n_tokens FROM c
             UNION ALL SELECT 'source_gini', gini FROM gn
             UNION ALL SELECT 'unique_fp', n_unique FROM c) u
           ORDER BY metric""",

      // two unrolled HITS rounds: raw BIGINT half-round sums,
      // max-normalized by scalar-subquery floor division (// ≡ Spark
      // DIV on nonnegative BIGINTs); absent hubs/authorities coalesce
      // to exact 0
      "q161_hits" ->
        """WITH e AS (
             SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
             FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           n AS (SELECT DISTINCT src AS node FROM e
                 UNION SELECT DISTINCT dst FROM e),
           s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub FROM n),
           ra1 AS (SELECT e.dst AS node, CAST(sum(s0.hub) AS BIGINT) AS raw
                   FROM e JOIN s0 ON s0.node = e.src GROUP BY e.dst),
           a1 AS (SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM ra1) AS BIGINT) AS auth FROM ra1),
           rh1 AS (SELECT e.src AS node, CAST(sum(a1.auth) AS BIGINT) AS raw
                   FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
           h1 AS (SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM rh1) AS BIGINT) AS hub FROM rh1),
           s1 AS (SELECT n.node, coalesce(h1.hub, 0) AS hub
                  FROM n LEFT JOIN h1 ON h1.node = n.node),
           ra2 AS (SELECT e.dst AS node, CAST(sum(s1.hub) AS BIGINT) AS raw
                   FROM e JOIN s1 ON s1.node = e.src GROUP BY e.dst),
           a2 AS (SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM ra2) AS BIGINT) AS auth FROM ra2),
           rh2 AS (SELECT e.src AS node, CAST(sum(a2.auth) AS BIGINT) AS raw
                   FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
           h2 AS (SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM rh2) AS BIGINT) AS hub FROM rh2)
           SELECT n.node, coalesce(h2.hub, 0) AS hub_fp,
             coalesce(a2.auth, 0) AS auth_fp
           FROM n LEFT JOIN h2 ON h2.node = n.node
           LEFT JOIN a2 ON a2.node = n.node
           ORDER BY n.node""",

      // three unrolled min-relaxation rounds (d_k = min(d_{k-1},
      // 1 + d_{k-1} over in-neighbors) — the frontier in the engine is
      // an optimization, the fixpoint algebra is this)
      "q162_seed_distance" ->
        """WITH e AS (
             SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst FROM lineitem
             UNION
             SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst FROM lineitem),
           d0 AS (SELECT DISTINCT s_suppkey + 1000000 AS node,
                    CAST(0 AS BIGINT) AS dist
                  FROM supplier WHERE s_nationkey % 5 = 3),
           d1 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                    SELECT node, dist FROM d0
                    UNION ALL
                    SELECT e.dst AS node, d0.dist + 1 AS dist
                    FROM e JOIN d0 ON e.src = d0.node) u GROUP BY node),
           d2 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                    SELECT node, dist FROM d1
                    UNION ALL
                    SELECT e.dst AS node, d1.dist + 1 AS dist
                    FROM e JOIN d1 ON e.src = d1.node) u GROUP BY node),
           d3 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                    SELECT node, dist FROM d2
                    UNION ALL
                    SELECT e.dst AS node, d2.dist + 1 AS dist
                    FROM e JOIN d2 ON e.src = d2.node) u GROUP BY node)
           SELECT node, dist FROM d3 ORDER BY node""",

      // BpeRounds generated rounds — the oracle CTE chain and the
      // engine loop read the same constant
      "q163_bpe_train" -> {
        val rows = (1 to BpeRounds).map(r =>
          s"SELECT CAST($r AS BIGINT) AS round, a, b, pair_count FROM t$r")
          .mkString("\n           UNION ALL\n           ")
        s"""WITH ${bpeCtes(BpeRounds)}
           $rows
           ORDER BY round"""
      },

      // same chain through w_N, then per-word symbol counts joined onto
      // the token stream; out-of-universe words (single-char) fall back
      // to their char count on BOTH engines
      "q164_bpe_encode" ->
        s"""WITH ${bpeCtes(BpeRounds)},
           sym AS (SELECT w,
                     CAST(len(list_filter(string_split(e, chr(1)), x -> len(x) > 0)) AS BIGINT) AS n_syms
                   FROM w$BpeRounds),
           dt AS (SELECT doc_id, unnest($toks) AS w FROM documents),
           per AS (SELECT dt.doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(length(dt.w)) AS BIGINT) AS n_chars,
                     CAST(sum(coalesce(sym.n_syms, length(dt.w))) AS BIGINT) AS n_symbols
                   FROM dt LEFT JOIN sym ON sym.w = dt.w GROUP BY dt.doc_id)
           SELECT doc_id, n_tokens, n_chars, n_symbols,
             CAST(n_chars AS DOUBLE) / CAST(n_symbols AS DOUBLE) AS compression
           FROM per ORDER BY doc_id""",

      // the q135 argument for audio: synthesizeWav pure in the seed +
      // exact frame-energy fingerprint ⇒ fp-groups ≡ seed-groups
      "q165_audio_dedup" ->
        """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
           FROM documents
           GROUP BY doc_id - doc_id % 4
           ORDER BY keep_id""",

      // lower weighted quantile: smallest value with cw·den >= num·W,
      // all-BIGINT comparison over the (source, value) weight histogram
      "q166_weighted_quantiles" ->
        s"""WITH t AS (SELECT source, n_chars AS v,
                        CAST(len($toks) AS BIGINT) AS w FROM documents),
           h AS (SELECT source, v, CAST(sum(w) AS BIGINT) AS hw
                 FROM t GROUP BY source, v),
           c AS (SELECT source, v, hw,
                   CAST(sum(hw) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cw
                 FROM h),
           tot AS (SELECT source, CAST(sum(hw) AS BIGINT) AS tw
                   FROM h GROUP BY source),
           q AS (SELECT CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den
                 FROM (VALUES (1, 2), (9, 10)) AS v(num, den)),
           sel AS (SELECT c.source, q.num, q.den, min(c.v) AS value
                   FROM c JOIN tot ON tot.source = c.source CROSS JOIN q
                   WHERE c.cw * q.den >= q.num * tot.tw
                   GROUP BY c.source, q.num, q.den)
           SELECT source, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS p, value
           FROM sel ORDER BY source, p""",

      // exact BIGINT boundary arithmetic over epoch micros: lo = min +
      // span·7 DIV 10, hi = lo + span DIV 20
      "q167_embargo_split" ->
        """WITH t AS (SELECT event_type, user_id, epoch_us(ts) AS ts_us FROM events),
           b AS (SELECT min(ts_us) AS tmin, max(ts_us) AS tmax FROM t),
           s AS (SELECT t.*,
                   CASE WHEN ts_us <= tmin + ((tmax - tmin) * 7) // 10 THEN 'train'
                        WHEN ts_us > tmin + ((tmax - tmin) * 7) // 10
                                      + (tmax - tmin) // 20 THEN 'test'
                        ELSE 'embargo' END AS split
                 FROM t CROSS JOIN b)
           SELECT split, event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(min(ts_us) AS BIGINT) AS ts_min,
             CAST(max(ts_us) AS BIGINT) AS ts_max
           FROM s GROUP BY split, event_type
           ORDER BY split, event_type""",

      // five generated greedy rounds over the shared hashed-shingle
      // universe: winner = (gain desc, doc_id), covered set grows by the
      // winner's shingles; a saturated doc has no surviving rows so it
      // can never be re-picked on either engine
      "q168_coverage_select" -> {
        val n = 5
        val roundCtes = (1 to n).map { r =>
          val prev = if (r == 1) "" else s" WHERE k NOT IN (SELECT k FROM c${r - 1})"
          val carry = if (r == 1) "" else s"SELECT k FROM c${r - 1} UNION "
          s""",
           r$r AS (SELECT d, CAST(count(*) AS BIGINT) AS g FROM inc$prev
                   GROUP BY d ORDER BY g DESC, d LIMIT 1),
           c$r AS (${carry}SELECT inc.k FROM inc JOIN r$r ON inc.d = r$r.d)"""
        }.mkString
        val rows = (1 to n).map(r =>
          s"""SELECT CAST($r AS BIGINT) AS round, d AS doc_id, g AS gain,
             (SELECT CAST(count(*) AS BIGINT) FROM c$r) AS covered_total FROM r$r""")
          .mkString("\n           UNION ALL\n           ")
        s"""WITH inc AS (
             SELECT doc_id AS d, unnest(${hashedShingles(3)}) AS k
             FROM (SELECT doc_id, $toks AS toks FROM documents) t)$roundCtes
           $rows
           ORDER BY round"""
      },

      // ntile(10) edges (the q117 bin-for-bin parity), value-rule
      // re-assignment bin = 1 + #{edges < v} on BOTH snapshots, add-1
      // smoothing, per-bin micro-nat term quantized before any sum
      "q169_psi_drift" ->
        """WITH t AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                        event_id, epoch_us(ts) AS us FROM events),
           b AS (SELECT min(us) + (max(us) - min(us)) // 2 AS mid FROM t),
           ref AS (SELECT v, event_id FROM t, b WHERE us <= mid),
           tgt AS (SELECT v, event_id FROM t, b WHERE us > mid),
           rb AS (SELECT v, ntile(10) OVER (ORDER BY v, event_id) AS bin FROM ref),
           e AS (SELECT CAST(max(v) AS BIGINT) AS edge FROM rb WHERE bin < 10 GROUP BY bin),
           ra AS (SELECT r.event_id, 1 + count(e.edge) AS bin
                  FROM ref r LEFT JOIN e ON e.edge < r.v GROUP BY r.event_id),
           ta AS (SELECT r.event_id, 1 + count(e.edge) AS bin
                  FROM tgt r LEFT JOIN e ON e.edge < r.v GROUP BY r.event_id),
           rc AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM ra GROUP BY bin),
           tc AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM ta GROUP BY bin),
           sp AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS bin),
           j AS (SELECT sp.bin, coalesce(rc.n, 0) AS ref_n, coalesce(tc.n, 0) AS tgt_n
                 FROM sp LEFT JOIN rc ON rc.bin = sp.bin
                 LEFT JOIN tc ON tc.bin = sp.bin),
           tot AS (SELECT CAST(sum(ref_n) AS BIGINT) AS rt,
                     CAST(sum(tgt_n) AS BIGINT) AS tt FROM j)
           SELECT bin, ref_n, tgt_n,
             CAST(round(1e6 * (
               (CAST(ref_n + 1 AS DOUBLE) / CAST(rt + 10 AS DOUBLE)
                 - CAST(tgt_n + 1 AS DOUBLE) / CAST(tt + 10 AS DOUBLE))
               * ln((CAST(ref_n + 1 AS DOUBLE) / CAST(rt + 10 AS DOUBLE))
                    / (CAST(tgt_n + 1 AS DOUBLE) / CAST(tt + 10 AS DOUBLE)))
             )) AS BIGINT) AS term_unats
           FROM j CROSS JOIN tot ORDER BY bin""",

      // midranks per distinct value (min+max of the tie-broken
      // row_number), centered doubled ranks sum to zero exactly, HUGEINT
      // products, sqrt/division at the very end
      "q170_spearman" ->
        s"""WITH d AS (SELECT doc_id, n_chars, ${qualitySql(toks)} AS q FROM documents),
           r AS (SELECT doc_id, n_chars, q,
                   CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rkx,
                   CAST(row_number() OVER (ORDER BY q, doc_id) AS BIGINT) AS rky
                 FROM d),
           mx AS (SELECT n_chars, min(rkx) AS mnx, max(rkx) AS mxx FROM r GROUP BY n_chars),
           my AS (SELECT q, min(rky) AS mny, max(rky) AS mxy FROM r GROUP BY q),
           nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
           u AS (SELECT mnx + mxx - n - 1 AS u, mny + mxy - n - 1 AS v
                 FROM r JOIN mx USING (n_chars) JOIN my USING (q) CROSS JOIN nn),
           s AS (SELECT CAST(sum(CAST(u AS HUGEINT) * v) AS DOUBLE) AS s_uv,
                   CAST(sum(CAST(u AS HUGEINT) * u) AS DOUBLE) AS s_uu,
                   CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) AS s_vv
                 FROM u)
           SELECT n, s_uv, s_uu, s_vv,
             CASE WHEN s_uu > 0 AND s_vv > 0
               THEN s_uv / (sqrt(s_uu) * sqrt(s_vv)) END AS rho
           FROM s CROSS JOIN nn""",

      // q90's BM25 CTEs feeding exact micro-unit DCG: w_r = round(1e6 /
      // log2(r+1)) per rank, BIGINT sums, one trailing division
      "q171_ndcg" -> {
        def fmtD(v: Double): String = {
          val s0 = java.lang.Double.toString(v)
          if (s0.contains("E")) s0.replace("E", "e") else s0 + "e0"
        }
        val (k1p1, k1s, omb, bs) = (fmtD(1.2 + 1.0), fmtD(1.2), fmtD(1.0 - 0.75), fmtD(0.75))
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t WHERE len(toks) > 0),
           post AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                    FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d) GROUP BY 1, 2, 3),
           meta AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
           probed AS (SELECT * FROM post WHERE term IN ('join', 'window', 'fast')),
           dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM probed GROUP BY 1),
           sc AS (SELECT p.doc_id,
             CAST(round(
               ln(1e0 + (CAST(m.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 5e-1) / (CAST(f.df AS DOUBLE) + 5e-1))
               * (CAST(p.tf AS DOUBLE) * $k1p1)
               / (CAST(p.tf AS DOUBLE) + $k1s * ($omb + $bs * CAST(p.dl AS DOUBLE) / (CAST(m.sum_dl AS DOUBLE) / CAST(m.n_docs AS DOUBLE))))
               * 1e6) AS BIGINT) AS s
             FROM probed p JOIN dfs f ON f.term = p.term CROSS JOIN meta m),
           scores AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score FROM sc GROUP BY 1),
           g AS (SELECT doc_id,
                   CAST((CASE WHEN list_contains(toks, 'join') THEN 1 ELSE 0 END)
                      + (CASE WHEN list_contains(toks, 'window') THEN 1 ELSE 0 END)
                      + (CASE WHEN list_contains(toks, 'fast') THEN 1 ELSE 0 END) AS BIGINT) AS gain
                 FROM t),
           j AS (SELECT s.doc_id, s.score, g.gain FROM scores s JOIN g ON g.doc_id = s.doc_id),
           wt AS (SELECT CAST(r AS BIGINT) AS r,
                    CAST(round(1e6 / (ln(CAST(r AS DOUBLE) + 1e0) / ln(2e0))) AS BIGINT) AS w
                  FROM (SELECT unnest(range(1, 21)) AS r)),
           sysr AS (SELECT gain, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r FROM j),
           sys AS (SELECT CAST(coalesce(sum(gain * w), 0) AS BIGINT) AS dcg_u
                   FROM sysr JOIN wt ON wt.r = sysr.r),
           idr AS (SELECT gain, CAST(row_number() OVER (ORDER BY gain DESC, doc_id) AS BIGINT) AS r FROM j),
           ideal AS (SELECT CAST(coalesce(sum(gain * w), 0) AS BIGINT) AS idcg_u
                     FROM idr JOIN wt ON wt.r = idr.r)
           SELECT CAST(20 AS BIGINT) AS k, dcg_u, idcg_u,
             CASE WHEN idcg_u > 0 THEN CAST(dcg_u AS DOUBLE) / CAST(idcg_u AS DOUBLE) END AS ndcg
           FROM sys CROSS JOIN ideal"""
      },

      // five HUGEINT moment sums, the q170 tail shape (two sqrts, one
      // division over exactly-converted integers)
      "q172_pearson" ->
        s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x,
                 CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) AS y
               FROM documents),
           m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                   sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(y AS HUGEINT) * y) AS syy,
                   sum(CAST(x AS HUGEINT) * y) AS sxy
                 FROM d),
           c AS (SELECT n, n * sxy - sx * sy AS covn,
                   n * sxx - sx * sx AS vxn, n * syy - sy * sy AS vyn
                 FROM m)
           SELECT CAST(n AS BIGINT) AS n,
             CAST(covn AS DOUBLE) AS cov_n,
             CAST(vxn AS DOUBLE) AS var_xn, CAST(vyn AS DOUBLE) AS var_yn,
             CASE WHEN vxn > 0 AND vyn > 0
               THEN CAST(covn AS DOUBLE) / (sqrt(CAST(vxn AS DOUBLE)) * sqrt(CAST(vyn AS DOUBLE))) END AS r
           FROM c""",

      // sparse-safe identity χ² = N·Σ O²/(R·C) − N over OBSERVED cells
      // (zero cells contribute 0 to the sum, exactly); pure HUGEINT
      // integer arithmetic, micro-unit floors once per cell
      "q173_chi_square" ->
        """WITH cells AS (SELECT source AS a, lang AS b, CAST(count(*) AS BIGINT) AS o
               FROM documents GROUP BY 1, 2),
           ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
           cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
           nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
           t AS (SELECT
                   (CAST(o AS HUGEINT) * o * n * 1000000) // (CAST(r AS HUGEINT) * c) AS tm,
                   cells.a, cells.b
                 FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nn),
           s AS (SELECT count(DISTINCT a) AS n_a, count(DISTINCT b) AS n_b,
                   sum(tm) AS st
                 FROM t)
           SELECT n, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
             CAST(st - CAST(n AS HUGEINT) * 1000000 AS BIGINT) AS chi2_micro,
             CAST(CAST(st - CAST(n AS HUGEINT) * 1000000 AS BIGINT) AS DOUBLE) / 1e6 AS chi2
           FROM s CROSS JOIN nn""",

      // the Colloc PMI double shape per cell (round(ln·1e6)), HUGEINT
      // O·pmi products, one trailing division by N·1e6
      "q174_mutual_info" ->
        """WITH cells AS (SELECT source AS a, lang AS b, CAST(count(*) AS BIGINT) AS o
               FROM documents GROUP BY 1, 2),
           ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
           cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
           nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
           t AS (SELECT o,
                   CAST(round(ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE) /
                     CAST(r AS DOUBLE) / CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS pmi
                 FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nn),
           s AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
                   sum(CAST(o AS HUGEINT) * pmi) AS mi
                 FROM t)
           SELECT n, n_cells, CAST(mi AS DOUBLE) AS mi_n_micro,
             CAST(mi AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS mi_nats
           FROM s CROSS JOIN nn""",

      // one lag window per user over the shared (ms, event_id) total
      // order; probabilities by truncating integer division
      "q175_markov_transitions" ->
        """WITH e AS (SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS prev
               FROM events),
           c AS (SELECT prev AS from_state, event_type AS to_state,
                   CAST(count(*) AS BIGINT) AS c
                 FROM e WHERE prev IS NOT NULL GROUP BY 1, 2),
           t AS (SELECT from_state, CAST(sum(c) AS BIGINT) AS c_from
                 FROM c GROUP BY 1)
           SELECT from_state, to_state, c, c_from,
             CAST(CAST(c AS HUGEINT) * 1000000 // c_from AS BIGINT) AS p_micro
           FROM c JOIN t USING (from_state)
           ORDER BY from_state, to_state""",

      // q172's moment chain over the 4h-step series joined to its
      // 6-steps-later self (pairs exist only where both steps do)
      "q176_autocorrelation" ->
        """WITH s AS (SELECT epoch_ms(ts) // 14400000 AS t,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
               FROM events GROUP BY 1),
           j AS (SELECT a.v AS x, b.v AS y FROM s a JOIN s b ON b.t = a.t + 6),
           m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                   sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(y AS HUGEINT) * y) AS syy,
                   sum(CAST(x AS HUGEINT) * y) AS sxy
                 FROM j),
           c AS (SELECT n, n * sxy - sx * sy AS covn,
                   n * sxx - sx * sx AS vxn, n * syy - sy * sy AS vyn
                 FROM m)
           SELECT CAST(6 AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
             CAST(covn AS DOUBLE) AS cov_n,
             CAST(vxn AS DOUBLE) AS var_xn, CAST(vyn AS DOUBLE) AS var_yn,
             CASE WHEN vxn > 0 AND vyn > 0
               THEN CAST(covn AS DOUBLE) / (sqrt(CAST(vxn AS DOUBLE)) * sqrt(CAST(vyn AS DOUBLE))) END AS r
           FROM c""",

      // q162's unrolled chain with costs: each round relaxes the FULL
      // distance set (provably equal to the engine's improved-frontier
      // rounds at every round count)
      "q177_weighted_sssp" -> {
        val rounds = (1 to 3).map { r =>
          s""",
           d$r AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                    SELECT node, dist FROM d${r - 1}
                    UNION ALL
                    SELECT e.dst AS node, d${r - 1}.dist + e.w AS dist
                    FROM e JOIN d${r - 1} ON e.src = d${r - 1}.node) u GROUP BY node)"""
        }.mkString
        s"""WITH e AS (
             SELECT src, dst, CAST(min(w) AS BIGINT) AS w FROM (
               SELECT l_partkey AS src, l_suppkey + 1000000 AS dst,
                 CAST(round(l_quantity * 100) AS BIGINT) AS w FROM lineitem
               UNION ALL
               SELECT l_suppkey + 1000000 AS src, l_partkey AS dst,
                 CAST(round(l_quantity * 100) AS BIGINT) AS w FROM lineitem) u
             GROUP BY src, dst),
           d0 AS (SELECT DISTINCT s_suppkey + 1000000 AS node,
                    CAST(0 AS BIGINT) AS dist
                  FROM supplier WHERE s_nationkey % 5 = 3)$rounds
           SELECT node, dist FROM d3 ORDER BY node"""
      },

      // q16's session CTEs, then a plain closed-interval overlap join —
      // semantically identical to the engine's pair-free endpoint sweep
      "q178_interval_overlap" ->
        """WITH flagged AS (
             SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000 THEN 1 ELSE 0 END AS ns
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
           sessions AS (
             SELECT user_id, ts,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM flagged),
           sess AS (SELECT user_id, sid, CAST(min(epoch_ms(ts)) AS BIGINT) AS start_ms,
                      CAST(max(epoch_ms(ts)) AS BIGINT) AS end_ms
                    FROM sessions GROUP BY user_id, sid),
           a AS (SELECT * FROM sess WHERE user_id % 2 = 0),
           b AS (SELECT * FROM sess WHERE user_id % 2 = 1)
           SELECT a.user_id, a.start_ms, a.end_ms,
             CAST(count(b.user_id) AS BIGINT) AS n_overlap
           FROM a LEFT JOIN b ON b.start_ms <= a.end_ms AND b.end_ms >= a.start_ms
           GROUP BY a.user_id, a.sid, a.start_ms, a.end_ms
           ORDER BY a.user_id, a.start_ms""",

      // 5 generated MMR rounds (the q168 replay pattern): q21's cosine
      // shape quantized to micro-units at each computation site, pure
      // BIGINT decisions thereafter
      "q179_mmr_select" -> {
        def cos(a: String, an: String, b: String, bn: String) =
          s"""CAST(round(CASE WHEN $an * $bn = 0 THEN 0.0
               ELSE list_sum(list_transform(range(1, len($a) + 1), i ->
                      CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))) / ($an * $bn)
               END * 1e6) AS BIGINT)"""
        val rounds = (2 to 5).map { r =>
          s""",
           p$r AS (SELECT c.id, c.rel_u,
                     max(${cos("s.v", "s.n", "c.v", "c.n")}) AS ms
                   FROM rel c, rel s
                   WHERE s.id IN (SELECT id FROM sel${r - 1})
                     AND c.id NOT IN (SELECT id FROM sel${r - 1})
                   GROUP BY c.id, c.rel_u),
           s$r AS (SELECT CAST($r AS BIGINT) AS round, id, rel_u, ms
                   FROM p$r ORDER BY rel_u - ms DESC, id LIMIT 1),
           sel$r AS (SELECT id FROM sel${r - 1} UNION ALL SELECT id FROM s$r)"""
        }.mkString
        val union = (1 to 5).map(r =>
          s"SELECT round, id, rel_u, ms FROM s$r").mkString("\n           UNION ALL\n           ")
        s"""WITH base AS (SELECT vec_id AS id, embedding AS v,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
             FROM embeddings),
           q AS (SELECT v AS qv, n AS qn FROM base WHERE id = 0),
           rel AS (SELECT id, v, n, ${cos("qv", "qn", "v", "n")} AS rel_u
                   FROM base CROSS JOIN q WHERE id <> 0),
           s1 AS (SELECT CAST(1 AS BIGINT) AS round, id, rel_u, CAST(0 AS BIGINT) AS ms
                  FROM rel ORDER BY rel_u DESC, id LIMIT 1),
           sel1 AS (SELECT id FROM s1)$rounds
           SELECT round, id, rel_u AS rel_micro, ms AS maxsim_micro,
             CAST(rel_u - ms AS BIGINT) AS score2
           FROM ($union)
           ORDER BY round"""
      },

      // grouped q172 moments; slope and intercept share the exact
      // HUGEINT denominator, quotients are single IEEE divisions
      "q180_grouped_trend" ->
        s"""WITH rev AS (SELECT n_name,
               CAST(date_part('year', o_orderdate) * 12 + date_part('month', o_orderdate) AS BIGINT) AS x,
               CAST(sum(${C.format("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT) AS y
             FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
             GROUP BY 1, 2),
           m AS (SELECT n_name, CAST(count(*) AS HUGEINT) AS n,
                   sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(x AS HUGEINT) * y) AS sxy
                 FROM rev GROUP BY 1),
           c AS (SELECT n_name, n, n * sxy - sx * sy AS num,
                   n * sxx - sx * sx AS den, sy * sxx - sx * sxy AS inum
                 FROM m)
           SELECT n_name, CAST(n AS BIGINT) AS n,
             CAST(num AS DOUBLE) AS slope_num, CAST(den AS DOUBLE) AS slope_den,
             CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope,
             CASE WHEN den > 0 THEN CAST(inum AS DOUBLE) / CAST(den AS DOUBLE) END AS intercept
           FROM c ORDER BY n_name""",

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

      // the quadratic NOT EXISTS dominance check the engine's histogram
      // prefix-max replaces
      "q183_skyline" ->
        s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
                 CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) AS y
               FROM documents)
           SELECT doc_id, x, y FROM d a
           WHERE NOT EXISTS (
             SELECT 1 FROM d b
             WHERE b.x <= a.x AND b.y >= a.y AND (b.x < a.x OR b.y > a.y))
           ORDER BY x, doc_id""",

      // rank-frequency in micro-nat ln-ln space through the q180 trend
      // tail; rank ties break by token, both engines
      "q184_zipf_slope" ->
        s"""WITH tc AS (SELECT t AS w, CAST(count(*) AS BIGINT) AS cnt
               FROM (SELECT unnest($toks) AS t FROM documents) GROUP BY 1),
           r AS (SELECT cnt,
                   CAST(row_number() OVER (ORDER BY cnt DESC, w ASC) AS BIGINT) AS rk
                 FROM tc),
           p AS (SELECT CAST(round(ln(CAST(rk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                   CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS y
                 FROM r),
           m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                   sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                   sum(CAST(x AS HUGEINT) * x) AS sxx,
                   sum(CAST(x AS HUGEINT) * y) AS sxy
                 FROM p),
           c AS (SELECT n, n * sxy - sx * sy AS num,
                   n * sxx - sx * sx AS den, sy * sxx - sx * sxy AS inum
                 FROM m)
           SELECT 'all' AS corpus, CAST(n AS BIGINT) AS n,
             CAST(num AS DOUBLE) AS slope_num, CAST(den AS DOUBLE) AS slope_den,
             CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope,
             CASE WHEN den > 0 THEN CAST(inum AS DOUBLE) / CAST(den AS DOUBLE) END AS intercept
           FROM c ORDER BY corpus""",

      // SEMANTIC oracle: two full q94-style triangle counts subtracted —
      // the engine's fresh-neighborhood increment must equal the
      // recount delta exactly
      "q185_triangle_increment" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           ae AS (SELECT least(x.pk, y.pk) AS a, greatest(x.pk, y.pk) AS b, x.ok
                  FROM li x JOIN li y ON x.ok = y.ok AND x.pk <> y.pk),
           eo AS (SELECT DISTINCT a, b FROM ae WHERE ok % 4 <> 0),
           eu AS (SELECT DISTINCT a, b FROM ae),
           tu AS (SELECT count(*) AS t FROM eu e1
                    JOIN eu e2 ON e2.a = e1.b
                    JOIN eu e3 ON e3.a = e1.a AND e3.b = e2.b),
           told AS (SELECT count(*) AS t FROM eo e1
                    JOIN eo e2 ON e2.a = e1.b
                    JOIN eo e3 ON e3.a = e1.a AND e3.b = e2.b)
           SELECT (SELECT count(*) FROM eo) AS n_old_edges,
             (SELECT count(*) FROM eu) - (SELECT count(*) FROM eo) AS n_fresh_edges,
             CAST(tu.t - told.t AS BIGINT) AS new_triangles
           FROM tu CROSS JOIN told""",

      // q146's midrank AUC partitioned per source
      "q186_grouped_auc" ->
        s"""WITH d AS (SELECT source, doc_id, (lang = 'en') AS pos,
                 ${qualitySql(toks)} AS q
               FROM documents),
           r AS (SELECT source, q AS s, pos,
                   CAST(row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS BIGINT) AS rn
                 FROM d),
           g AS (SELECT source, s, min(rn) AS mn, max(rn) AS mx,
                   CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pc
                 FROM r GROUP BY 1, 2),
           t AS (SELECT source, CAST(sum(pc) AS BIGINT) AS n_pos,
                   CAST(max(mx) AS BIGINT) AS n,
                   CAST(sum(pc * (mn + mx)) AS BIGINT) AS u2
                 FROM g GROUP BY 1)
           SELECT source, n_pos, n - n_pos AS n_neg, u2,
             CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
               CAST(u2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / CAST(2 * n_pos * (n - n_pos) AS DOUBLE)
             END AS auc
           FROM t ORDER BY source""",

      // same synthetic enrichment, same RE2-safe host/domain regexes
      "q187_url_hosts" ->
        """WITH e AS (SELECT doc_id,
               text || ' see https://s' || CAST(doc_id % 7 AS VARCHAR)
                    || '.site' || CAST(doc_id % 23 AS VARCHAR)
                    || ['.com', '.org', '.net', '.io'][CAST(doc_id % 4 + 1 AS INTEGER)]
                    || '/p/' || CAST(doc_id AS VARCHAR) || ' for details' AS t
             FROM documents),
           h AS (SELECT doc_id, regexp_extract(t, 'https://([^/\s]+)', 1) AS host FROM e),
           d AS (SELECT doc_id, host,
                   regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain FROM h)
           SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
           FROM d GROUP BY domain ORDER BY domain""",

      // the q135 argument for the PERCEPTUAL hash: synthesizeBmp pure in
      // the seed + every aHash bit an exact integer comparison ⇒
      // hash-groups ≡ seed-groups
      "q188_image_ahash" ->
        """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
           FROM documents
           GROUP BY doc_id - doc_id % 3
           ORDER BY keep_id""",

      // q174's MI chain instantiated per candidate feature and stacked
      "q189_info_gain" -> {
        def miBlock(name: String, fsub: String) =
          s"""SELECT '$name' AS feature, n, n_cells, mi_n_micro, mi_nats FROM (
             WITH cells AS (SELECT f AS a, lang AS b, CAST(count(*) AS BIGINT) AS o
                 FROM ($fsub) GROUP BY 1, 2),
               ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
               cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
               nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
               t AS (SELECT o,
                       CAST(round(ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE) /
                         CAST(r AS DOUBLE) / CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS pmi
                     FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nn),
               s AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
                       sum(CAST(o AS HUGEINT) * pmi) AS mi
                     FROM t)
             SELECT n, n_cells, CAST(mi AS DOUBLE) AS mi_n_micro,
               CAST(mi AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS mi_nats
             FROM s CROSS JOIN nn) z"""
        val langidSub =
          s"""SELECT CASE WHEN hits > 0 THEN cand ELSE 'und' END AS f, lang FROM (
             SELECT doc_id, lang, cand, hits,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand ASC) AS rn
             FROM (SELECT d.doc_id, d.lang, l.lang AS cand,
                     len(list_filter($toks, t -> list_contains(l.words, t))) AS hits
                   FROM documents d CROSS JOIN (VALUES
                     ('de', ['der','die','das','und','ist','nicht','ein','mit']),
                     ('en', ['the','a','of','and','is','to','in','that']),
                     ('es', ['el','la','de','que','y','es','en','un']),
                     ('fr', ['le','la','les','de','et','est','un','une']),
                     ('zh', ['de','shi','bu','le','zai','you','wo','ta'])) l(lang, words)) s0) s1
             WHERE rn = 1"""
        s"""${miBlock("langid", langidSub)}
           UNION ALL
           ${miBlock("len_bucket",
            "SELECT CAST(n_chars // 256 AS VARCHAR) AS f, lang FROM documents")}
           UNION ALL
           ${miBlock("source", "SELECT source AS f, lang FROM documents")}
           ORDER BY feature"""
      },

      // per-day termination histogram, risk set = N − cum_before, the
      // Colloc ln site once per event day, BIGINT running ln-survival
      "q190_survival" ->
        """WITH su AS (SELECT user_id, min(epoch_ms(ts)) AS s_ms
               FROM events WHERE event_type = 'signup' GROUP BY 1),
           en AS (SELECT max(epoch_ms(ts)) AS end_ms FROM events),
           pu AS (SELECT user_id, epoch_ms(ts) AS p_ms
                  FROM events WHERE event_type = 'purchase'),
           subj AS (SELECT su.user_id, su.s_ms,
                      min(CASE WHEN pu.p_ms >= su.s_ms THEN pu.p_ms END) AS first_p
                    FROM su LEFT JOIN pu ON pu.user_id = su.user_id
                    GROUP BY 1, 2),
           dd AS (SELECT CASE WHEN first_p IS NOT NULL THEN (first_p - s_ms) // 86400000
                    ELSE (end_ms - s_ms) // 86400000 END AS t,
                    first_p IS NOT NULL AS e
                  FROM subj CROSS JOIN en),
           h AS (SELECT t, CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS de,
                   CAST(count(*) AS BIGINT) AS tot
                 FROM dd GROUP BY t),
           nn AS (SELECT CAST(sum(tot) AS BIGINT) AS n FROM h),
           r AS (SELECT t, de, tot,
                   n - coalesce(sum(tot) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
                 FROM h CROSS JOIN nn),
           c AS (SELECT t, n_risk, de,
                   CAST(round(ln(CAST(n_risk - de AS DOUBLE) / CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT) AS term_micro
                 FROM r WHERE de > 0 AND n_risk > de)
           SELECT t AS day, CAST(n_risk AS BIGINT) AS n_risk, de AS d_events,
             term_micro,
             CAST(sum(term_micro) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ln_s_micro
           FROM c ORDER BY day""",

      // argmax-md5 per (doc, shard) replayed by window; the Spark
      // array_max struct tiebreak (larger s on an md5 collision) is
      // mirrored by ORDER BY h DESC, s DESC
      "q191_rendezvous" ->
        """WITH a AS (SELECT doc_id, s,
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)) AS h
             FROM documents CROSS JOIN (SELECT unnest(range(0, 9)) AS s) sh),
           r8 AS (SELECT doc_id, s AS s8 FROM (
                    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
                      ORDER BY h DESC, s DESC) AS rn
                    FROM a WHERE s < 8) x WHERE rn = 1),
           r9 AS (SELECT doc_id, s AS s9 FROM (
                    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
                      ORDER BY h DESC, s DESC) AS rn
                    FROM a) x WHERE rn = 1)
           SELECT s8, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
           FROM r8 JOIN r9 USING (doc_id)
           GROUP BY s8 ORDER BY s8""",

      // the verified fragments stitched: q61 keep-min dedup, q24 quality
      // floor, q44 md5 split, q01-shape rollup
      "q192_pipeline_e2e" ->
        s"""WITH kept AS (
             SELECT doc_id, lang, text FROM (
               SELECT doc_id, lang, text,
                 row_number() OVER (PARTITION BY md5($norm) ORDER BY doc_id) AS rk
               FROM documents) k WHERE rk = 1),
           q AS (SELECT doc_id, lang, text FROM kept
                 WHERE ${qualitySql(toks)} >= 0.4),
           sp AS (SELECT lang, text,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${graft.operators.Sampling.thresholdHex(0.8)}' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '${graft.operators.Sampling.thresholdHex(0.9)}' THEN 'val'
                    ELSE 'test' END AS split
             FROM q)
           SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len($toks)) AS BIGINT) AS n_tokens
           FROM sp GROUP BY 1, 2 ORDER BY split, lang""",

      // micro-unit squared error, HUGEINT sums, one trailing division
      "q193_brier" ->
        s"""WITH d AS (SELECT source,
                 CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) AS p,
                 CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y
               FROM documents),
           g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                   sum(CAST(p - y AS HUGEINT) * (p - y)) AS sse
                 FROM d GROUP BY 1)
           SELECT source, n, CAST(sse AS DOUBLE) AS sse_micro2,
             CAST(sse AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12) AS brier
           FROM g ORDER BY source""",

      // ntile(10) IS equiDepthBins' arithmetic (the q117/q147 precedent);
      // integer micro-lift by floor division
      "q194_lift_deciles" ->
        s"""WITH d AS (SELECT doc_id, (lang = 'en') AS pos,
                 CAST(floor(${qualitySql(toks)} * 1e6) AS BIGINT) AS qu
               FROM documents),
           b AS (SELECT pos, ntile(10) OVER (ORDER BY qu DESC, doc_id ASC) AS bin FROM d),
           per AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
                   FROM b GROUP BY bin),
           tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tn,
                     CAST(sum(n_pos) AS BIGINT) AS tp FROM per),
           c AS (SELECT bin, n_rows, n_pos,
                   CAST(sum(n_rows) OVER (ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
                   CAST(sum(n_pos) OVER (ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
                 FROM per)
           SELECT bin, n_rows, n_pos, cum_pos,
             CAST(CAST(cum_pos AS HUGEINT) * tn * 1000000
               // (CAST(cum_n AS HUGEINT) * tp) AS BIGINT) AS lift_micro
           FROM c CROSS JOIN tot ORDER BY bin""",

      // membership-day explosion instead of a window distinct (which
      // does not decompose); partial windows at the left edge are real
      "q195_rolling_distinct" ->
        """WITH du AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS m, user_id FROM events),
           mx AS (SELECT max(m) AS mxd FROM du),
           ex AS (SELECT unnest(range(m, m + 7)) AS day, user_id FROM du)
           SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_7d
           FROM ex CROSS JOIN mx WHERE day <= mxd
           GROUP BY day ORDER BY day""",

      // merged value histogram, window CDFs, integer cross-multiplied
      // sup-gap, one trailing division
      "q196_ks_test" ->
        s"""WITH av AS (SELECT ${C.format("value")} AS v FROM events WHERE event_type = 'click'),
           bv AS (SELECT ${C.format("value")} AS v FROM events WHERE event_type = 'view'),
           h AS (SELECT v, CAST(sum(ca) AS BIGINT) AS ha, CAST(sum(cb) AS BIGINT) AS hb FROM (
                   SELECT v, 1 AS ca, 0 AS cb FROM av
                   UNION ALL
                   SELECT v, 0 AS ca, 1 AS cb FROM bv) u GROUP BY v),
           nn AS (SELECT CAST(sum(ha) AS BIGINT) AS na, CAST(sum(hb) AS BIGINT) AS nb FROM h),
           c AS (SELECT
                   CAST(sum(ha) OVER w AS BIGINT) AS cuma,
                   CAST(sum(hb) OVER w AS BIGINT) AS cumb
                 FROM h WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           g AS (SELECT max(abs(cuma * nb - cumb * na)) AS ks_num FROM c CROSS JOIN nn)
           SELECT na AS n_a, nb AS n_b, CAST(ks_num AS BIGINT) AS ks_num,
             CAST(ks_num AS DOUBLE) / CAST(na * nb AS DOUBLE) AS ks
           FROM g CROSS JOIN nn""",

      // per-cohort running revenue over the weeks-universe window
      "q197_cohort_ltv" ->
        s"""WITH su AS (SELECT user_id, min(epoch_ms(ts) // 86400000) AS s_day
               FROM events WHERE event_type = 'signup' GROUP BY 1),
           rv AS (SELECT user_id, epoch_ms(ts) // 86400000 AS p_day,
                    ${C.format("value")} AS c
                  FROM events WHERE event_type = 'purchase'),
           cells AS (SELECT s_day // 7 AS cohort_week,
                       (p_day - s_day) // 7 AS weeks_since,
                       CAST(sum(c) AS BIGINT) AS rev_c
                     FROM su JOIN rv USING (user_id)
                     WHERE p_day >= s_day
                     GROUP BY 1, 2)
           SELECT cohort_week, weeks_since, rev_c,
             CAST(sum(rev_c) OVER (PARTITION BY cohort_week ORDER BY weeks_since
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_c
           FROM cells ORDER BY cohort_week, weeks_since""",

      // add-1/2 log-odds per term over the full-outer vocab merge, the
      // Colloc quantization site, top-20 by |score| with term tiebreak
      "q198_keyness" ->
        s"""WITH ta AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS c_a
               FROM (SELECT unnest($toks) AS t FROM documents WHERE doc_id % 2 = 0) GROUP BY 1),
           tb AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS c_b
               FROM (SELECT unnest($toks) AS t FROM documents WHERE doc_id % 2 = 1) GROUP BY 1),
           m AS (SELECT coalesce(ta.term, tb.term) AS term,
                   coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
                 FROM ta FULL OUTER JOIN tb ON ta.term = tb.term),
           nn AS (SELECT CAST(sum(c_a) AS BIGINT) AS na, CAST(sum(c_b) AS BIGINT) AS nb FROM m),
           k AS (SELECT term, c_a, c_b,
                   CAST(round((ln((CAST(c_a AS DOUBLE) + 0.5) /
                       (CAST(na AS DOUBLE) - CAST(c_a AS DOUBLE) + 0.5)) -
                     ln((CAST(c_b AS DOUBLE) + 0.5) /
                       (CAST(nb AS DOUBLE) - CAST(c_b AS DOUBLE) + 0.5)))
                     * 1e6) AS BIGINT) AS keyness_unats
                 FROM m CROSS JOIN nn)
           SELECT term, c_a, c_b, keyness_unats FROM k
           ORDER BY abs(keyness_unats) DESC, term LIMIT 20""",

      // stacked per-column profile; string bounds are binary-collated on
      // both engines
      "q199_column_profile" -> {
        val stacked = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_returnflag", "l_linestatus")
          .map(c => s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM lineitem")
          .mkString("\n           UNION ALL\n           ")
        s"""WITH s AS (
           $stacked)
           SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
             min(v) AS min_s, max(v) AS max_s
           FROM s GROUP BY col_name ORDER BY col_name"""
      },

      // five orphan scans; all-zero IS the contract
      "q200_fk_audit" ->
        """SELECT * FROM (
             SELECT 'customer.nationkey->nation' AS relationship,
               (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_child,
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                  WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS n_orphans
             UNION ALL
             SELECT 'lineitem.orderkey->orders',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem
                  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
             UNION ALL
             SELECT 'lineitem.partkey->part',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem
                  WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
             UNION ALL
             SELECT 'lineitem.suppkey->supplier',
               (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem
                  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
             UNION ALL
             SELECT 'orders.custkey->customer',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders
                  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))) u
           ORDER BY relationship""",

      // the day − row_number island key, per-user bounded windows
      "q201_streaks" ->
        """WITH du AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS d FROM events),
           isl AS (SELECT user_id,
                     d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS i
                   FROM du),
           g AS (SELECT user_id, i, CAST(count(*) AS BIGINT) AS len
                 FROM isl GROUP BY 1, 2)
           SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
             CAST(count(*) AS BIGINT) AS n_streaks,
             CAST(max(len) AS BIGINT) AS max_streak
           FROM g GROUP BY user_id ORDER BY user_id""",

      // per-nation weekly lag; the delta is one IEEE division of cents
      "q202_wow_change" ->
        s"""WITH weekly AS (SELECT n_name,
               epoch_ms(o_orderdate) // 604800000 AS week,
               CAST(sum(${C.format("l_extendedprice * (1.0 - l_discount)")}) AS BIGINT) AS rev_c
             FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
             GROUP BY 1, 2)
           SELECT n_name, week, rev_c, lag(rev_c) OVER w AS prev_c,
             CASE WHEN lag(rev_c) OVER w IS NOT NULL AND lag(rev_c) OVER w <> 0
               THEN CAST(rev_c - lag(rev_c) OVER w AS DOUBLE) / CAST(lag(rev_c) OVER w AS DOUBLE)
             END AS wow_pct
           FROM weekly WINDOW w AS (PARTITION BY n_name ORDER BY week)
           ORDER BY n_name, week""",

      // q104's flag CTE + a stacked per-rule aggregate; unique kills =
      // fails while every other rule passes
      "q203_rule_attribution" -> {
        val rep2 =
          s"CASE WHEN len(${shingles(2)}) <= 1 THEN 0.0 " +
          s"ELSE 1.0 - CAST(len(list_distinct(${shingles(2)})) AS DOUBLE) / CAST(len(${shingles(2)}) AS DOUBLE) END"
        s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
           m AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tok,
             CASE WHEN len(toks) > 0
               THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE) END AS mean_len,
             $rep2 AS rep,
             CAST(len(list_filter(['the','a','of','and','is','to','in','that'],
               s -> list_contains(toks, s))) AS BIGINT) AS stop_hits
           FROM t),
           fl AS (SELECT
             n_tok BETWEEN 30 AND 80 AS r_len,
             coalesce(mean_len BETWEEN 4.0 AND 4.8, false) AS r_wlen,
             rep <= 0.05 AS r_rep,
             stop_hits >= 2 AS r_stop
           FROM m),
           st AS (
             SELECT 'r_len' AS rule, NOT r_len AS fails,
               (NOT r_len) AND r_wlen AND r_rep AND r_stop AS uq FROM fl
             UNION ALL
             SELECT 'r_rep', NOT r_rep, (NOT r_rep) AND r_len AND r_wlen AND r_stop FROM fl
             UNION ALL
             SELECT 'r_stop', NOT r_stop, (NOT r_stop) AND r_len AND r_wlen AND r_rep FROM fl
             UNION ALL
             SELECT 'r_wlen', NOT r_wlen, (NOT r_wlen) AND r_len AND r_rep AND r_stop FROM fl)
           SELECT rule, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN fails THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
             CAST(sum(CASE WHEN uq THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_fail,
             CAST(sum(CASE WHEN fails THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS fail_rate
           FROM st GROUP BY rule ORDER BY rule"""
      },

      // q173's sparse-safe χ² doctrine as goodness-of-fit over the FULL
      // shard spine (empty shards contribute their N/k deviation)
      "q204_shard_balance" ->
        """WITH o AS (SELECT ('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 32 AS sh,
                 CAST(count(*) AS BIGINT) AS o
               FROM documents GROUP BY 1),
           spine AS (SELECT unnest(range(0, 32)) AS sh),
           nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
           t AS (SELECT (CAST(coalesce(o.o, 0) * 32 - n AS HUGEINT)
                   * (coalesce(o.o, 0) * 32 - n) * 1000000)
                   // (32 * CAST(n AS HUGEINT)) AS tm
                 FROM spine LEFT JOIN o USING (sh) CROSS JOIN nn)
           SELECT CAST(32 AS BIGINT) AS k, n,
             CAST(sum(tm) AS BIGINT) AS chi2_micro,
             CAST(CAST(sum(tm) AS BIGINT) AS DOUBLE) / 1e6 AS chi2
           FROM t CROSS JOIN nn GROUP BY n""",

      // q16's session CTEs → distinct membership → within-session pair
      // join; the q194 micro-lift integer shape
      "q205_basket_lift" ->
        """WITH flagged AS (
             SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000 THEN 1 ELSE 0 END AS ns
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
           sessions AS (
             SELECT user_id, event_type,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sid
             FROM flagged),
           m AS (SELECT DISTINCT CAST(user_id AS VARCHAR) || ':' || CAST(sid AS VARCHAR) AS s,
                   event_type AS i
                 FROM sessions),
           nn AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM m),
           it AS (SELECT i, CAST(count(*) AS BIGINT) AS si FROM m GROUP BY i),
           p AS (SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS n_both
                 FROM m a JOIN m b ON b.s = a.s AND a.i < b.i
                 GROUP BY 1, 2)
           SELECT item_a, item_b, n_both, ia.si AS n_a, ib.si AS n_b,
             n AS n_sessions,
             CAST(CAST(n_both AS HUGEINT) * n * 1000000
               // (CAST(ia.si AS HUGEINT) * ib.si) AS BIGINT) AS lift_micro
           FROM p
             JOIN it ia ON ia.i = p.item_a
             JOIN it ib ON ib.i = p.item_b
             CROSS JOIN nn
           ORDER BY item_a, item_b""",

      // per-session first occurrences, strict-inequality precedence
      "q206_precedence" ->
        """WITH flagged AS (
             SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000 THEN 1 ELSE 0 END AS ns
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
           sessions AS (
             SELECT user_id, event_type, epoch_ms(ts) AS tms,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sid
             FROM flagged),
           f AS (SELECT CAST(user_id AS VARCHAR) || ':' || CAST(sid AS VARCHAR) AS s,
                   event_type AS i, CAST(min(tms) AS BIGINT) AS ft
                 FROM sessions GROUP BY 1, 2)
           SELECT a.i AS item_a, b.i AS item_b,
             CAST(count(*) AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN a.ft < b.ft THEN 1 ELSE 0 END) AS BIGINT) AS n_a_first,
             CAST(sum(CASE WHEN a.ft < b.ft THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS first_ratio
           FROM f a JOIN f b ON b.s = a.s AND a.i <> b.i
           GROUP BY 1, 2 ORDER BY item_a, item_b""",

      // q167's exact boundary + two q196 KS chains stacked
      "q207_drift_report" -> {
        def ksBlock(name: String, vExpr: String) =
          s"""SELECT '$name' AS feature, n_a, n_b, ks_num, ks FROM (
             WITH st AS (SELECT epoch_us(ts) AS us, $vExpr AS v FROM events),
               bd AS (SELECT min(us) + ((max(us) - min(us)) * 7) // 10 AS mid FROM st),
               h AS (SELECT v, CAST(sum(ca) AS BIGINT) AS ha, CAST(sum(cb) AS BIGINT) AS hb FROM (
                       SELECT v, 1 AS ca, 0 AS cb FROM st CROSS JOIN bd WHERE us <= mid
                       UNION ALL
                       SELECT v, 0 AS ca, 1 AS cb FROM st CROSS JOIN bd WHERE us > mid) u
                     GROUP BY v),
               nn AS (SELECT CAST(sum(ha) AS BIGINT) AS na, CAST(sum(hb) AS BIGINT) AS nb FROM h),
               c AS (SELECT
                       CAST(sum(ha) OVER w AS BIGINT) AS cuma,
                       CAST(sum(hb) OVER w AS BIGINT) AS cumb
                     FROM h WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
               g AS (SELECT max(abs(cuma * nb - cumb * na)) AS ks_num FROM c CROSS JOIN nn)
             SELECT na AS n_a, nb AS n_b, CAST(ks_num AS BIGINT) AS ks_num,
               CAST(ks_num AS DOUBLE) / CAST(na * nb AS DOUBLE) AS ks
             FROM g CROSS JOIN nn) z"""
        s"""${ksBlock("hour_of_day", "(epoch_ms(ts) // 3600000) % 24")}
           UNION ALL
           ${ksBlock("value_cents", C.format("value"))}
           ORDER BY feature"""
      },
    )
  }
}
