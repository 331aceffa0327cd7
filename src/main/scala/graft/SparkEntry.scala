package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator surface (SURVEY.md §2.3): each entry
  * is one operator/query realized Spark-first; `oracleSql` holds the DuckDB
  * mirror the driver hash-compares against at sf0.01. Keys present in
  * `queries` but absent from `oracleSql` are rows-only checks (algorithms
  * whose exact output is engine-specific, e.g. HLL sketches).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count — the reference's one shipped workload
    * (/root/reference/client/scripts/mapper.py:13, reducer.py:14-27) —
    * over the documents fixture. */
  def entry(spark: SparkSession): DataFrame =
    graft.mr.WordCount.onDocuments(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. MR core
    "wordcount"           -> (graft.mr.WordCount.onDocuments _),
    "mr_native_wordcount" -> (graft.mr.WordCount.mrNative _),
    "mr_script_wordcount" -> (graft.mr.WordCount.mrScript _),
    "mr_combine_wordcount" -> (graft.mr.WordCount.mrCombine _),
    "mr_secondary_sort"   -> (graft.mr.SecondarySort.onEvents _),
    // C. projection / selection
    "proj_select"      -> (Relational.projSelect _),
    "filter_pred"      -> (Relational.filterPred _),
    // D. joins
    "join_inner_bcast" -> (Relational.joinInnerBcast _),
    "join_left"        -> (Relational.joinLeft _),
    "join_right"       -> (Relational.joinRight _),
    "join_full"        -> (Relational.joinFull _),
    "join_semi"        -> (Relational.joinSemi _),
    "join_anti"        -> (Relational.joinAnti _),
    "join_cross"       -> (Relational.joinCross _),
    "join_range"       -> (Relational.joinRange _),
    "join_skew_salted" -> ((s: SparkSession, d: String) => Relational.joinSkewSalted(s, d)),
    "join_asof"        -> (Relational.joinAsof _),
    "join_nearest"     -> (Relational.joinNearest _),
    "join_interval"    -> (Relational.joinInterval _),
    "join_scd2"        -> (Relational.joinScd2 _),
    // E. aggregation
    "q1_agg"           -> (Relational.q1Agg _),
    "agg_stats"        -> (Relational.aggStats _),
    "agg_approx"       -> (Relational.aggApprox _),
    "agg_approx_topk"  -> (Relational.aggApproxTopK _),
    "agg_sketch_rollup" -> (Relational.aggSketchRollup _),
    "agg_collect"      -> (Relational.aggCollect _),
    "agg_minmax_by"    -> (Relational.aggMinMaxBy _),
    "agg_rollup"       -> (Relational.aggRollup _),
    "agg_cube"         -> (Relational.aggCube _),
    "agg_grouping_sets" -> (Relational.aggGroupingSets _),
    "agg_pivot"        -> (Relational.aggPivot _),
    "sql_scalar_subquery" -> (Relational.sqlScalarSubquery _),
    "fn_na"            -> (Relational.fnNa _),
    "events_funnel"    -> (Relational.eventsFunnel _),
    "events_sessionize" -> (Relational.eventsSessionize _),
    "events_streaks"    -> (Relational.eventsStreaks _),
    "events_time_to_convert" -> (Relational.eventsTimeToConvert _),
    "window_running_distinct" -> (Relational.windowRunningDistinct _),
    "ts_seasonal_dow"   -> (Relational.tsSeasonalDow _),
    "events_retention" -> (Relational.eventsRetention _),
    "events_attribution" -> (Relational.eventsAttribution _),
    "events_paths"     -> (Relational.eventsPaths _),
    "agg_moments"      -> (Relational.aggMoments _),
    "agg_bool"         -> (Relational.aggBool _),
    "agg_mode"         -> (Relational.aggMode _),
    "ts_interpolate"   -> (Relational.tsInterpolate _),
    "events_anomaly"   -> (Relational.eventsAnomaly _),
    "events_dips"      -> (Relational.eventsDips _),
    "agg_hll_intersect" -> (Relational.aggHllIntersect _),
    "fn_url"           -> (Relational.fnUrl _),
    "fn_collation"     -> (Relational.fnCollation _),
    // F. window functions
    "window_rank"      -> (Relational.windowRank _),
    "window_lag_lead"  -> (Relational.windowLagLead _),
    "window_frames"    -> (Relational.windowFrames _),
    "window_dist"      -> (Relational.windowDist _),
    // E. percentiles
    "agg_percentile"   -> (Relational.aggPercentile _),
    "agg_approx_percentile" -> (Relational.aggApproxPercentile _),
    "agg_sketch_union" -> (Relational.aggSketchUnion _),
    "agg_cms"          -> (Relational.aggCms _),
    // G. sort / limit
    "sort_limit"       -> (Relational.sortLimit _),
    "sort_global"      -> (Relational.sortGlobal _),
    // H. set ops
    "set_union"        -> (Relational.setUnion _),
    "set_ops_all"      -> (Relational.setOpsAll _),
    "set_intersect"    -> (Relational.setIntersect _),
    "set_except"       -> (Relational.setExcept _),
    "set_distinct"     -> (Relational.setDistinct _),
    // I. scalar functions
    "fn_string"        -> (Relational.fnString _),
    "fn_mask"          -> (Relational.fnMask _),
    "fn_editdist"      -> (Relational.fnEditdist _),
    "fn_string2"       -> (Relational.fnString2 _),
    "fn_date"          -> (Relational.fnDate _),
    "fn_date2"         -> (Relational.fnDate2 _),
    "fn_math"          -> (Relational.fnMath _),
    "fn_array"         -> (Relational.fnArray _),
    "fn_map"           -> (Relational.fnMap _),
    "fn_json"          -> (Relational.fnJson _),
    "fn_try"           -> (Relational.fnTry _),
    "fn_bitwise"       -> (Relational.fnBitwise _),
    "agg_histogram"    -> (Relational.aggHistogram _),
    "agg_unpivot"      -> (Relational.aggUnpivot _),
    "ts_gapfill"       -> (Relational.tsGapfill _),
    "ts_resample"      -> (Relational.tsResample _),
    "fn_variant"       -> (Relational.fnVariant _),
    "fn_struct"        -> (Relational.fnStruct _),
    "ts_ewma"          -> (Relational.tsEwma _),
    "agg_bitmap"       -> (Relational.aggBitmap _),
    "events_pattern"   -> (Relational.eventsPattern _),
    "events_ab"        -> (Relational.eventsAb _),
    "fn_lambda"        -> (Relational.fnLambda _),
    "events_quant_pattern" -> (Relational.eventsQuantPattern _),
    "ts_rolling"       -> (Relational.tsRolling _),
    "events_rfm"       -> (Relational.eventsRfm _),
    "events_cohort_ltv" -> (Relational.eventsCohortLtv _),
    "events_skyline"   -> (Relational.eventsSkyline _),
    "events_markov"    -> (Relational.eventsMarkov _),
    "join_fuzzy_editdist" -> (Relational.joinFuzzyEditdist _),
    "agg_listagg"      -> (Relational.aggListagg _),
    "agg_weighted_median" -> (Relational.aggWeightedMedian _),
    // SQL entry path
    "sql_q3_shipping"  -> (Sql.q3Shipping _),
    "sql_q5_local"     -> (Sql.q5Local _),
    "sql_q9_profit"    -> (Sql.q9Profit _),
    "sql_q7_volume"    -> (Sql.q7Volume _),
    "sql_q18_large_orders" -> (Sql.q18LargeOrders _),
    "sql_q20_nested"   -> (Sql.q20Nested _),
    "sql_lateral"      -> (Sql.lateralTopPerGroup _),
    "sql_pipe"         -> (Sql.pipeSyntax _),
    "sql_ext_winnow"   -> (Sql.extWinnow _),
    "sql_recursive"    -> (Sql.sqlRecursive _),
    // B. sources / sinks
    "src_csv_roundtrip"     -> (graft.sources.Sources.csvRoundtrip _),
    "src_csv_malformed"     -> (graft.sources.Sources.csvMalformed _),
    "src_partition_prune"   -> (graft.sources.Sources.partitionPrune _),
    "src_json_roundtrip"    -> (graft.sources.Sources.jsonRoundtrip _),
    "src_text_kv"           -> (graft.sources.Sources.textKvRoundtrip _),
    "src_partitioned_write" -> (graft.sources.Sources.partitionedWrite _),
    "src_bucketed_join"     -> (graft.sources.Sources.bucketedJoin _),
    "src_decimal_roundtrip" -> (graft.sources.Sources.decimalRoundtrip _),
    "src_orc_roundtrip"     -> (graft.sources.Sources.orcRoundtrip _),
    "src_schema_evolution"  -> (graft.sources.Sources.schemaEvolution _),
    "src_xml_roundtrip"     -> (graft.sources.Sources.xmlRoundtrip _),
    "src_binary_files"      -> (graft.sources.Sources.binaryFiles _),
    "src_file_metadata"     -> (graft.sources.Sources.fileMetadata _),
    // E. custom Aggregator
    "agg_topk_group"   -> (graft.agg.TopK.topOrdersPerBucket _),
    // J. dedup
    "dedup_exact"         -> (Dedup.exact _),
    "dedup_minhash"       -> (Dedup.minhashLsh _),
    "dedup_minhash_clusters" -> (Dedup.minhashClusters _),
    "dedup_keep_list"     -> (Dedup.keepList _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_simhash"       -> ((s: SparkSession, d: String) => Dedup.simhashRecall(s, d)),
    "dedup_embedding"     -> ((s: SparkSession, d: String) => Dedup.embeddingCosineExact(s, d)),
    "dedup_embedding_lsh" -> ((s: SparkSession, d: String) => Dedup.embeddingLshRecall(s, d)),
    "graph_pagerank"      -> (Dedup.pagerank _),
    "graph_triangles"     -> ((s: SparkSession, d: String) => Dedup.triangles(s, d)),
    "graph_common_neighbors" -> ((s: SparkSession, d: String) => Dedup.commonNeighbors(s, d)),
    "graph_clustering_coeff" -> ((s: SparkSession, d: String) => Dedup.clusteringCoeff(s, d)),
    "graph_kcore"         -> (Dedup.kcore _),
    "graph_shortest_paths" -> (Dedup.shortestPaths _),
    "graph_bipartite_projection" -> (Dedup.bipartiteProjection _),
    "dedup_normalized"    -> (Dedup.normalizedDedup _),
    "dedup_url_canonical" -> (Dedup.urlCanonical _),
    "dedup_containment"   -> (Dedup.containment _),
    // J. similarity search (approximate paths emit oracle-checked recall
    // bounds vs the exact in-engine top-k; raw top-k spec'd in SimSearchSpec)
    "simsearch_topk"       -> ((s: SparkSession, d: String) => SimSearch.bruteTopKShared(s, d)),
    "simsearch_filtered_topk" -> ((s: SparkSession, d: String) => SimSearch.filteredTopK(s, d)),
    "simsearch_range"      -> (SimSearch.rangeSearch _),
    "search_rrf"           -> (SimSearch.rrf _),
    "simsearch_lsh_recall" -> ((s: SparkSession, d: String) => SimSearch.lshRecall(s, d)),
    "simsearch_ivf_recall" -> ((s: SparkSession, d: String) => SimSearch.ivfRecall(s, d)),
    "simsearch_quantized_recall" -> ((s: SparkSession, d: String) => SimSearch.quantizedRecall(s, d)),
    "simsearch_pq_recall"  -> ((s: SparkSession, d: String) => SimSearch.pqRecall(s, d)),
    "simsearch_knn_graph"  -> ((s: SparkSession, d: String) => SimSearch.knnGraphShared(s, d)),
    "simsearch_knn_graph_lsh" -> ((s: SparkSession, d: String) => SimSearch.knnGraphLsh(s, d)),
    "udtf_order_gaps"      -> (GroupedUdtf.orderGaps _),
    "udtf_cogroup_reconcile" -> (GroupedUdtf.cogroupReconcile _),
    // J. text analysis
    "text_tokens"      -> (TextAnalysis.tokenStats _),
    "text_langid"      -> (TextAnalysis.langId _),
    "text_quality"     -> (TextAnalysis.quality _),
    "text_readability" -> (TextAnalysis.readability _),
    "text_compression_ratio" -> (TextAnalysis.compressionRatio _),
    "text_vocab_coverage" -> (TextAnalysis.vocabCoverage _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_bpe"         -> (TextAnalysis.bpeTokens _),
    "text_winnow"      -> (TextAnalysis.winnowFingerprint _),
    "text_tfidf"       -> (TextAnalysis.tfidfTop3 _),
    "text_bigrams"     -> (TextAnalysis.topBigrams _),
    "text_repetition"  -> (TextAnalysis.repetition _),
    "text_pack"        -> ((s: SparkSession, d: String) => TextAnalysis.sequencePack(s, d)),
    "text_heavy_hitters" -> ((s: SparkSession, d: String) => TextAnalysis.heavyHitters(s, d)),
    "text_inverted_index" -> ((s: SparkSession, d: String) => TextAnalysis.invertedIndex(s, d)),
    "text_chunk"         -> ((s: SparkSession, d: String) => TextAnalysis.chunk(s, d)),
    "text_logprob"       -> (TextAnalysis.logprob _),
    "text_collocations"  -> (TextAnalysis.collocations _),
    "text_dup_passages"  -> (TextAnalysis.dupPassages _),
    "text_dedup_spans"   -> ((s: SparkSession, d: String) => TextAnalysis.dedupSpans(s, d)),
    "text_bigram_lm"     -> (TextAnalysis.bigramLm _),
    "text_entropy"       -> (TextAnalysis.entropy _),
    "text_bm25"          -> (TextAnalysis.bm25 _),
    // J. corpus curation (composed passes over the per-signal blocks)
    "curate_contamination" -> ((s: SparkSession, d: String) => Curation.contamination(s, d)),
    "curate_pii_scrub"     -> (Curation.piiScrub _),
    "curate_mix_plan"      -> ((s: SparkSession, d: String) => Curation.mixPlan(s, d)),
    "curate_filter_funnel" -> (Curation.filterFunnel _),
    "curate_blocklist_bloom" -> (Curation.blocklistBloom _),
    "curate_ip_blocklist" -> (Curation.ipBlocklist _),
    "curate_quality_prune"  -> ((s: SparkSession, d: String) => Curation.qualityPrune(s, d)),
    "curate_pipeline"       -> (Curation.pipelineReport _),
    // J. multimodal plumbing
    "mm_meta"   -> (Multimodal.mediaMeta _),
    "mm_decode" -> (Multimodal.decodeFeatures _),
    "mm_resize" -> (Multimodal.resizeBlocks _),
    "mm_frames" -> (Multimodal.sampleFrames _),
    "mm_scene_cuts" -> (Multimodal.sceneCuts _),
    "mm_audio"  -> (Multimodal.audioFeatures _),
    // J. pipeline maintenance
    "maint_compact"     -> ((s: SparkSession, d: String) => Maintenance.compact(s, d)),
    "maint_upsert"      -> (Maintenance.upsert _),
    "maint_hash_split"  -> (Maintenance.hashSplit _),
    "maint_hash_split_docs" -> (Maintenance.hashSplitDocs _),
    "maint_group_sample" -> ((s: SparkSession, d: String) => Maintenance.groupSample(s, d)),
    "maint_purge"       -> (Maintenance.purgeAudit _),
    "maint_weighted_sample" -> ((s: SparkSession, d: String) => Maintenance.weightedSample(s, d)),
    "maint_zorder"      -> (Maintenance.zorderLayout _),
    "maint_analyze"     -> (Maintenance.analyzeStats _),
    "maint_backfill"    -> (Maintenance.backfill _),
    "maint_skew_report" -> (Maintenance.skewReport _),
    "maint_expectations" -> (Maintenance.expectations _),
    "maint_snapshot_diff" -> (Maintenance.snapshotDiff _),
    "text_html_strip"   -> (TextAnalysis.htmlStrip _),
    "sample_stratified" -> (Maintenance.stratifiedSample _),
    // S. streaming
    "stream_tumbling" -> (graft.streaming.Streams.tumbling _),
    "stream_tumbling_append" -> (graft.streaming.Streams.tumblingAppend _),
    "stream_tumbling_update" -> (graft.streaming.Streams.tumblingUpdate _),
    "stream_sliding"  -> (graft.streaming.Streams.sliding _),
    "stream_session"  -> (graft.streaming.Streams.sessionize _),
    "stream_dedup"    -> (graft.streaming.Streams.dedupKeys _),
    "stream_stateful_count"  -> (graft.streaming.Streams.statefulCount _),
    "stream_transform_state" -> (graft.streaming.Streams.transformState _),
    "stream_dedup_watermark" -> (graft.streaming.Streams.dedupWatermarked _),
    "stream_stream_join"     -> (graft.streaming.Streams.streamStreamJoin _),
    "stream_stream_left_join" -> (graft.streaming.Streams.streamStreamLeftJoin _),
    "stream_sink_parquet"    -> (graft.streaming.Streams.sinkParquet _),
    "stream_static_join"     -> (graft.streaming.Streams.streamStaticJoin _),
    "stream_upsert_sink"     -> (graft.streaming.Streams.upsertSink _),
    "stream_approx_distinct" -> (graft.streaming.Streams.approxDistinct _),
    "stream_anomaly"         -> (graft.streaming.Streams.anomaly _),
    "stream_quant_pattern"   -> (graft.streaming.Streams.quantPattern _),
    "stream_heavy_hitters"   -> (graft.streaming.Streams.heavyHitters _),
    "stream_approx_percentile" -> (graft.streaming.Streams.approxPercentile _),
    "stream_dead_letter"     -> (graft.streaming.Streams.deadLetter _),
    "dedup_incremental"      -> ((s: SparkSession, d: String) => Dedup.incrementalDedup(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOracles.sql ++ Sql.oracle ++ graft.mr.WordCount.oracle ++
    graft.mr.SecondarySort.oracle ++
    graft.sources.Sources.oracle ++ graft.agg.TopK.oracle ++
    Dedup.oracle ++ SimSearch.oracle ++ TextAnalysis.oracle ++ Maintenance.oracle ++
    Curation.oracle ++
    Multimodal.oracle ++ GroupedUdtf.oracle ++ graft.streaming.Streams.oracle
}
