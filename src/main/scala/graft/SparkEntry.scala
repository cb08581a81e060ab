package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{RefQueries, RefOracles, ExtQueries, ExtOracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete declared operator inventory (SURVEY.md §2 /
  * §7.4): every key takes (spark, sfDir) and returns a deterministic,
  * totally-ordered DataFrame; `oracleSql` holds the equivalent DuckDB SQL
  * the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's daily-insights aggregate (SURVEY.md §7.2 — filter +
    * 9-metric hash aggregate + deterministic means). */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.dailyAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_flatten"      -> (RefQueries.jsonFlatten _),
    "q_coalesce_defaults" -> (RefQueries.coalesceDefaults _),
    "q_filter_eq_date"    -> (RefQueries.filterEqDate _),
    "q_filter_between"    -> (RefQueries.filterBetween _),
    "q_count_guard"       -> (RefQueries.countGuard _),
    "q_anti_join"         -> (RefQueries.antiJoin _),
    "q_broadcast_join"    -> (RefQueries.broadcastJoin _),
    "q_daily_agg"         -> (RefQueries.dailyAgg _),
    "q_daily_agg_rounded" -> (RefQueries.dailyAggRounded _),
    "q_exists_probe"      -> (RefQueries.existsProbe _),
    "q_engagement_ratio"  -> (RefQueries.engagementRatio _),
    "q_top_category"      -> (RefQueries.topCategory _),
    "q_mode_udaf"         -> (RefQueries.modeUdaf _),
    "q_distinct_regions"  -> (RefQueries.distinctRegions _),
    "q_dedup_day"         -> (RefQueries.dedupDay _),
    "q_union_regions"     -> (RefQueries.unionRegions _),
    "q_rollup_agg"        -> (RefQueries.rollupAgg _),
    "q_salted_agg"        -> (RefQueries.saltedAgg _),
    "q_asof_join"         -> (RefQueries.asofJoin _),
    "q_range_join"        -> (RefQueries.rangeJoin _),
    "e_token_count"       -> (ExtQueries.tokenCount _),
    "e_distinct_sketch"   -> (ExtQueries.distinctSketch _),
    "q_dod_growth"        -> (RefQueries.dodGrowth _),
    "q_ntile_quartile"    -> (RefQueries.ntileQuartile _),
    "q_order_stats"       -> (RefQueries.orderStats _),
    // oracle-checked against the exact rank-selection SQL: GK accuracy ≥ n
    // at verify SF degenerates to exact (scale caveat in the scaladoc)
    "q_order_stats_approx" -> (RefQueries.orderStatsApprox _),
    "q_pivot"             -> (RefQueries.pivotTypes _),
    "q_unpivot"           -> (RefQueries.unpivotTypes _),
    "q_sessionize"        -> (RefQueries.sessionize _),
    "q_nested_map_array"  -> (RefQueries.nestedMapArray _),
    "q_weekly_report"     -> (RefQueries.weeklyReport _),
    "q_report_rows"       -> (RefQueries.reportRows _),
    "q_pt_duration"       -> (RefQueries.ptDuration _),
    "q_ts_normalize"      -> (RefQueries.tsNormalize _),
    "q_explode_seq"       -> (RefQueries.explodeSeq _),
    "q_date_format"       -> (RefQueries.dateFormat _),
    // LLM-data-pipeline extension operators (SURVEY.md §7.5)
    "e_exact_dedup"       -> (ExtQueries.exactDedup _),
    "e_incr_dedup"        -> (ExtQueries.incrDedup _),
    "e_text_stats"        -> (ExtQueries.textStats _),
    "e_multimodal_cols"   -> (ExtQueries.multimodalCols _),
    "e_cosine_topk"       -> (ExtQueries.cosineTopk _),
    "e_cosine_topk_agg"   -> (ExtQueries.cosineTopkAgg _),
    "e_ann_filter"        -> (ExtQueries.annFilter _),
    "e_ivf_filter"        -> (ExtQueries.ivfFilter _),
    "e_ivf_filter_adaptive" -> (ExtQueries.ivfFilterAdaptive _),
    "e_ivf_filter_trained" -> (ExtQueries.ivfFilterTrained _),
    "e_filter_recall"     -> (ExtQueries.filterRecall _),
    "e_filter_cost"       -> (ExtQueries.filterCost _),
    "e_ivf_balance"       -> (ExtQueries.ivfBalance _),
    "e_maxsim"            -> (ExtQueries.maxsimTopk _),
    "e_minhash_dedup"     -> (ExtQueries.minhashDedup _),
    "e_cross_dedup"       -> (ExtQueries.crossDedup _),
    "e_simhash_dedup"     -> (ExtQueries.simhashDedup _),
    "e_media_dedup"       -> (ExtQueries.mediaDedup _),
    "e_frame_dedup"       -> (ExtQueries.frameDedup _),
    "e_frame_align"       -> (ExtQueries.frameAlign _),
    "e_scene_cut"         -> (ExtQueries.sceneCut _),
    "e_recall_at_k"       -> (ExtQueries.recallAtK _),
    "e_rank_metrics"      -> (ExtQueries.rankMetrics _),
    "e_ngram_jaccard"     -> (ExtQueries.ngramJaccard _),
    "e_jaccard_prefix"    -> (ExtQueries.jaccardPrefix _),
    "e_edit_join"         -> (ExtQueries.editJoin _),
    "e_pca_power"         -> (ExtQueries.pcaPower _),
    "e_domain_drift"      -> (ExtQueries.domainDrift _),
    "e_pca_project"       -> (ExtQueries.pcaProject _),
    "e_cosine_topk_ivfpq" -> (ExtQueries.cosineTopkIvfPq _),
    "e_ivfpq_rerank"      -> (ExtQueries.ivfPqRerank _),
    "e_mrl_rerank"        -> (ExtQueries.mrlRerank _),
    "e_rand_walk"         -> (ExtQueries.randWalk _),
    "e_containment"       -> (ExtQueries.containment _),
    "e_cosine_dedup"      -> (ExtQueries.cosineDedup _),
    "e_cosine_topk_lsh"   -> (ExtQueries.cosineTopkLsh _),
    "e_fingerprint"       -> (ExtQueries.fingerprint _),
    "e_lang_id"           -> (ExtQueries.langId _),
    "e_stratified_sample" -> (ExtQueries.stratifiedSample _),
    "e_temp_mix"          -> (ExtQueries.tempMix _),
    "e_epoch_mix"         -> (ExtQueries.epochMix _),
    "e_span_mask"         -> (ExtQueries.spanMask _),
    "e_top_tokens"        -> (ExtQueries.topTokens _),
    "e_decontaminate"     -> (ExtQueries.decontaminate _),
    "e_ngram_overlap"     -> (ExtQueries.ngramOverlap _),
    "e_repetition"        -> (ExtQueries.repetition _),
    "e_cosine_topk_ivf"   -> (ExtQueries.cosineTopkIvf _),
    "e_ivf_nprobe"        -> (ExtQueries.ivfNprobe _),
    "e_sq_topk"           -> (ExtQueries.sqTopk _),
    "e_sq_rerank"         -> (ExtQueries.sqRerank _),
    "e_ann_recall"        -> (ExtQueries.annRecall _),
    "e_ann_cost"          -> (ExtQueries.annCost _),
    "e_rank_fusion"       -> (ExtQueries.rankFusion _),
    "e_hybrid_search"     -> (ExtQueries.hybridSearch _),
    "e_mmr"               -> (ExtQueries.mmrSelect _),
    "e_kmeans_iter"       -> (ExtQueries.kmeansIter _),
    "e_kmeans_train"      -> (ExtQueries.kmeansTrain _),
    "e_ivf_trained"       -> (ExtQueries.cosineTopkIvfTrained _),
    "e_quantizer_drift"   -> (ExtQueries.quantizerDrift _),
    "e_serve_drift"       -> (ExtQueries.serveDrift _),
    "e_table_stats"       -> (ExtQueries.tableStats _),
    "e_bloom_prune"       -> (ExtQueries.bloomPrune _),
    "e_nb_threshold"      -> (ExtQueries.nbThreshold _),
    "e_pref_pairs"        -> (ExtQueries.prefPairs _),
    "e_join_estimate"     -> (ExtQueries.joinEstimate _),
    "e_join_estimate_hist" -> (ExtQueries.joinEstimateHist _),
    "e_shard_topk"        -> (ExtQueries.shardTopk _),
    "e_kcore"             -> (ExtQueries.kcore _),
    "e_vacuum_plan"       -> (ExtQueries.vacuumPlan _),
    "e_vacuum_apply"      -> (ExtQueries.vacuumApply _),
    "e_schema_evolve"     -> (ExtQueries.schemaEvolve _),
    "e_change_feed"       -> (ExtQueries.changeFeed _),
    "e_feed_apply"        -> (ExtQueries.feedApply _),
    "e_feed_apply_minmax" -> (ExtQueries.feedApplyMinmax _),
    "e_mv_rewrite"        -> (ExtQueries.mvRewrite _),
    "e_stats_staleness"   -> (ExtQueries.statsStaleness _),
    "e_txn_conflict"      -> (ExtQueries.txnConflict _),
    "e_txn_rebase"        -> (ExtQueries.txnRebase _),
    "e_txn_retry"         -> (ExtQueries.txnRetry _),
    "e_txn_readset"       -> (ExtQueries.txnReadset _),
    "e_louvain_move"      -> (ExtQueries.louvainMove _),
    "e_louvain_apply"     -> (ExtQueries.louvainApply _),
    "e_louvain_collapse"  -> (ExtQueries.louvainCollapse _),
    "e_louvain_super"     -> (ExtQueries.louvainSuper _),
    "e_louvain_merge"     -> (ExtQueries.louvainMerge _),
    "e_louvain_levels"    -> (ExtQueries.louvainLevels _),
    "e_louvain_assign"    -> (ExtQueries.louvainAssign _),
    "e_range_estimate"    -> (ExtQueries.rangeEstimate _),
    "e_range_estimate_eqd" -> (ExtQueries.rangeEstimateEqd _),
    "e_corr_estimate"     -> (ExtQueries.corrEstimate _),
    "e_join_order"        -> (ExtQueries.joinOrder _),
    "e_join_order_hist"   -> (ExtQueries.joinOrderHist _),
    "e_card_feedback"     -> (ExtQueries.cardFeedback _),
    "e_compact_conflict"  -> (ExtQueries.compactConflict _),
    "e_manifest_prune"    -> (ExtQueries.manifestPrune _),
    "e_cosine_topk_beam"  -> (ExtQueries.cosineTopkBeam _),
    "e_cosine_topk_pq"    -> (ExtQueries.cosineTopkPq _),
    "e_pq_train"          -> (ExtQueries.pqTrain _),
    "e_pq_trained"        -> (ExtQueries.cosineTopkPqTrained _),
    "e_pagerank"          -> (ExtQueries.pageRank _),
    "e_label_prop"        -> (ExtQueries.labelProp _),
    "e_importance_sample" -> (ExtQueries.importanceSample _),
    "e_domain_cap"        -> (ExtQueries.domainCap _),
    "e_semantic_decontaminate" -> (ExtQueries.semanticDecontaminate _),
    "e_canonical_pick"    -> (ExtQueries.canonicalPick _),
    "e_lm_buckets"        -> (ExtQueries.lmBuckets _),
    "e_pii_redact"        -> (ExtQueries.piiRedact _),
    "e_dup_clusters"      -> (ExtQueries.dupClusters _),
    "e_soft_dedup"        -> (ExtQueries.softDedup _),
    "e_quality_filter"    -> (ExtQueries.qualityFilter _),
    "e_domain_stats"      -> (ExtQueries.domainStats _),
    "e_freq_rank_score"   -> (ExtQueries.freqRankScore _),
    "e_quality_buckets"   -> (ExtQueries.qualityBuckets _),
    "e_semantic_dedup"    -> (ExtQueries.semanticDedup _),
    "e_greedy_dedup"      -> (ExtQueries.greedyDedup _),
    "e_boilerplate"       -> (ExtQueries.boilerplate _),
    "e_tfidf_terms"       -> (ExtQueries.tfidfTerms _),
    "e_bigram_lm"         -> (ExtQueries.bigramLm _),
    "e_bm25_topk"         -> (ExtQueries.bm25Topk _),
    "e_bpe_merges"        -> (ExtQueries.bpeMerges _),
    "e_bpe_train"         -> (ExtQueries.bpeTrain _),
    "e_bpe_encode"        -> (ExtQueries.bpeEncode _),
    "e_tok_fertility"     -> (ExtQueries.tokFertility _),
    "e_vocab_coverage"    -> (ExtQueries.vocabCoverage _),
    "e_filter_bias"       -> (ExtQueries.filterBias _),
    "e_emb_stats"         -> (ExtQueries.embStats _),
    "e_feature_hash"      -> (ExtQueries.featureHash _),
    "e_phrase_search"     -> (ExtQueries.phraseSearch _),
    "e_datasheet"         -> (ExtQueries.datasheet _),
    "e_dedup_sweep"       -> (ExtQueries.dedupSweep _),
    "e_pack_stats"        -> (ExtQueries.packStats _),
    "e_snapshot_diff"     -> (ExtQueries.snapshotDiff _),
    "e_curation_funnel"   -> (ExtQueries.curationFunnel _),
    "e_seq_pack"          -> (ExtQueries.seqPack _),
    "e_shard_pack"        -> (ExtQueries.shardPack _),
    "e_train_order"       -> (ExtQueries.trainOrder _),
    "e_curriculum_order"  -> (ExtQueries.curriculumOrder _),
    "e_zorder"            -> (ExtQueries.zorder _),
    "e_knn_graph"         -> (ExtQueries.knnGraph _),
    "e_incr_knn"          -> (ExtQueries.incrKnn _),
    "e_chunk_dedup"       -> (ExtQueries.chunkDedup _),
    "e_chunk_split"       -> (ExtQueries.chunkSplit _),
    "e_dup_spans"         -> (ExtQueries.dupSpans _),
    "e_dup_span_removal"  -> (ExtQueries.dupSpanRemoval _),
    "e_triplet_mine"      -> (ExtQueries.tripletMine _),
    "e_vec_quantize"      -> (ExtQueries.vecQuantize _),
    "e_frame_sample"      -> (ExtQueries.frameSample _),
    "e_split"             -> (ExtQueries.corpusSplit _),
    "e_split_contamination" -> (ExtQueries.splitContamination _),
    "e_centroid_score"    -> (ExtQueries.centroidScore _),
    "e_nb_train"          -> (ExtQueries.nbTrain _),
    "e_nb_classify"       -> (ExtQueries.nbClassify _),
    "e_nb_eval"           -> (ExtQueries.nbEval _),
    "e_dedup_eval"        -> (ExtQueries.dedupEval _),
    "e_reservoir"         -> (ExtQueries.reservoirSample _),
    "e_scd2"              -> (ExtQueries.scd2 _),
    "e_merge_apply"       -> (ExtQueries.mergeApply _),
    "e_scan_prune"        -> (ExtQueries.scanPrune _),
    "e_dedup_lineage"     -> (ExtQueries.dedupLineage _),
    "e_delete_audit"      -> (ExtQueries.deleteAudit _),
    "e_delete_apply"      -> (ExtQueries.deleteApply _),
    "e_index_delete"      -> (ExtQueries.indexDelete _),
    "e_index_retrain"     -> (ExtQueries.indexRetrain _),
    "e_time_travel"       -> (ExtQueries.timeTravel _),
    "e_rolling_agg"       -> (ExtQueries.rollingAgg _),
    "e_incr_agg"          -> (ExtQueries.incrAgg _),
    "e_skew_audit"        -> (ExtQueries.skewAudit _),
    "e_compaction_plan"   -> (ExtQueries.compactionPlan _),
    "e_compaction_apply"  -> (ExtQueries.compactionApply _),
    "e_winsorize"         -> (ExtQueries.winsorize _),
    "e_interleave"        -> (ExtQueries.interleave _),
    "e_interleave_sig"    -> (ExtQueries.interleaveSig _),
    "e_retention"         -> (ExtQueries.retention _),
    "e_funnel"            -> (ExtQueries.funnel _),
    "e_salted_join"       -> (ExtQueries.saltedJoin _),
    "e_mad_outliers"      -> (ExtQueries.madOutliers _),
    "e_anomaly_days"      -> (ExtQueries.anomalyDays _),
    "e_ab_test"           -> (ExtQueries.abTest _),
    "e_transitions"       -> (ExtQueries.transitions _),
    "e_cube_agg"          -> (ExtQueries.cubeAgg _),
    "e_triangles"         -> (ExtQueries.triangles _),
    "e_trend"             -> (ExtQueries.trend _),
    "e_window_suite"      -> (ExtQueries.windowSuite _),
    "e_histogram"         -> (ExtQueries.histogram _),
    "e_collocations"      -> (ExtQueries.collocations _),
    "e_skyline"           -> (ExtQueries.skyline _),
    "e_stickiness"        -> (ExtQueries.stickiness _),
    "e_time_to_convert"   -> (ExtQueries.timeToConvert _),
    "e_priority_sample"   -> (ExtQueries.prioritySample _),
    "e_heavy_hitters"     -> (ExtQueries.heavyHitters _),
    "e_bitext_mine"       -> (ExtQueries.bitextMine _),
    "e_align_screen"      -> (ExtQueries.alignScreen _),
    "e_silhouette"        -> (ExtQueries.silhouette _),
    "e_calibration"       -> (ExtQueries.calibration _),
    "e_count_min"         -> (ExtQueries.countMin _),
    "e_fim_split"         -> (ExtQueries.fimSplit _),
    "e_novelty"           -> (ExtQueries.novelty _),
    "e_hits"              -> (ExtQueries.hits _),
    "e_walk_pairs"        -> (ExtQueries.walkPairs _),
    "e_modularity"        -> (ExtQueries.modularity _),
    "e_token_budget"      -> (ExtQueries.tokenBudget _),
    "e_graph_recall"      -> (ExtQueries.graphRecall _),
  )

  /** Keys that are evaluation harnesses / composites: they RE-EXECUTE other
    * graded operators by design (the composition pattern that keeps an
    * evaluation from drifting from what it evaluates), so their bench cost
    * is the sum of their constituents plus the comparison itself. Bench
    * reports this group's total separately from the plain-operator total —
    * a regression in a harness key that does NOT show in any operator key
    * is comparison overhead; one that does is the operator's. */
  val harnessKeys: Set[String] = Set(
    "e_ann_recall", "e_ann_cost", "e_dedup_eval", "e_rank_fusion", "e_hybrid_search",
    "e_split_contamination", "e_curation_funnel", "e_nb_eval", "e_interleave",
    "e_interleave_sig",
    "e_tok_fertility", "e_vocab_coverage", "e_filter_bias", "e_pack_stats",
    "e_dedup_sweep",
    "e_curriculum_order", "e_datasheet",
    // composite operators that re-execute another graded operator as their
    // substrate (e_triangles counts over e_knn_graph's edges; the beam
    // search walks the same graph): their cost is constituent + own work,
    // same attribution rule as the evaluation harnesses.
    "e_triangles", "e_cosine_topk_beam",
    // e_silhouette re-runs the e_kmeans_train chain to grade its clusters;
    // e_calibration re-runs the e_nb_classify predictions it audits;
    // e_pca_project re-runs the e_pca_power chain it screens with;
    // e_rand_walk and e_hits walk the e_knn_graph edges; e_walk_pairs
    // re-runs the e_rand_walk sequences it windows over; e_modularity
    // grades the e_label_prop partition over the e_knn_graph edges
    "e_silhouette", "e_calibration", "e_pca_project", "e_rand_walk", "e_hits",
    // e_token_budget ranks sources by the e_quality_filter rule body
    "e_walk_pairs", "e_modularity", "e_token_budget", "e_graph_recall",
    // e_louvain_move optimizes the e_label_prop partition over the
    // e_knn_graph edges (the e_modularity universe); e_louvain_apply
    // commits its moves and re-runs the decomposition; e_louvain_collapse
    // condenses the post-move partition (both re-run the sweep);
    // e_louvain_super runs the weighted sweep on the condensed graph;
    // e_louvain_merge commits its mutual-best pairs and re-audits;
    // e_louvain_levels chains sweep+matching+re-condense into the
    // unrolled multi-level hierarchy; e_louvain_assign folds the
    // hierarchy's matchings back onto the node-level labels
    "e_louvain_move", "e_louvain_apply", "e_louvain_collapse",
    "e_louvain_super", "e_louvain_merge", "e_louvain_levels",
    "e_louvain_assign",
    // classified under the same rule (round 10 — moves these keys from the
    // operator total to the harness total in BENCH comparisons):
    // soft_dedup/canonical_pick re-run the e_dup_clusters CC fixpoint;
    // lm_buckets/importance_sample re-run the e_bigram_lm scoring body;
    // ivf_trained/pq_trained re-run the e_kmeans_train / e_pq_train
    // chains they serve from; nb_classify re-runs the e_nb_train votes
    "e_soft_dedup", "e_canonical_pick", "e_lm_buckets", "e_importance_sample",
    "e_ivf_trained", "e_ivf_filter_trained", "e_pq_trained", "e_nb_classify",
    // e_incr_knn recomputes the standing e_knn_graph adjacency it merges
    // the batch into (a stored table in production)
    "e_incr_knn",
    // e_sq_rerank re-runs the e_sq_topk scoring body (at shortlist depth R)
    // as its coarse stage before the exact refine — same attribution rule
    // as ivf_trained/pq_trained; e_ivfpq_rerank likewise re-runs the
    // e_cosine_topk_ivfpq ADC body at depth R
    "e_sq_rerank", "e_ivfpq_rerank",
    // e_frame_align localizes the pairs e_frame_dedup detects (re-runs the
    // detector as its pair source); e_recall_at_k and e_rank_metrics
    // compose graded rank lists (the e_ann_recall rule)
    "e_frame_align", "e_recall_at_k", "e_rank_metrics",
    // e_ann_filter's post-filter baseline re-runs the e_cosine_topk_agg
    // scoring body at shortlist depth R (the e_sq_rerank rule)
    "e_ann_filter",
    // e_dedup_lineage composes the three graded pair detectors;
    // e_delete_audit / e_delete_apply compose four graded derived
    // artifacts; e_index_delete composes the graded e_knn_graph derivation
    "e_dedup_lineage", "e_delete_audit", "e_delete_apply", "e_index_delete",
    // e_index_retrain re-runs the e_kmeans_train chain over survivors and
    // the e_knn_graph/serve substrates it re-audits
    "e_index_retrain",
    // e_scan_prune composes the graded e_zorder layout derivation;
    // e_compaction_apply routes files by the graded e_compaction_plan;
    // e_compact_conflict validates the graded plan's bins against the
    // concurrent writer
    "e_scan_prune", "e_compaction_apply", "e_compact_conflict",
    // e_filter_recall composes the three graded filtered-serving
    // operators; e_filter_cost composes the whole recall harness
    "e_filter_recall", "e_filter_cost",
    // e_quantizer_drift re-runs the e_kmeans_train chain whose rollout it
    // prices; e_serve_drift composes the two graded IVF serves it diffs;
    // e_kcore peels the graded e_knn_graph adjacency; e_vacuum_plan
    // prices the graded e_time_travel history and e_vacuum_apply executes
    // the rewrite it priced; e_nb_threshold sweeps the
    // graded e_nb_classify predictions
    // e_pref_pairs mines extremes of the graded e_bigram_lm score
    "e_quantizer_drift", "e_serve_drift", "e_kcore", "e_vacuum_plan",
    // e_change_feed emits the feed between the graded e_time_travel states;
    // e_feed_apply folds that feed into e_incr_agg's monoid state;
    // e_txn_rebase re-runs the graded e_merge_apply commit (writer A's
    // snapshot IS e_merge_apply's output) before replaying B on top;
    // e_txn_retry re-runs the graded e_txn_rebase pipeline before
    // re-deriving B's rejected ops against its snapshot;
    // e_range_estimate_eqd composes the graded e_range_estimate audit as
    // its equi-width comparison column and exact counts;
    // e_join_order_hist prices its permutations from the graded
    // e_corr_estimate grid (thresholds, 1-D counts and the 2-D estimate);
    // e_feed_apply_minmax folds the graded e_change_feed and re-scans
    // from the graded snapshotAsOf derivation on extremum retraction;
    // e_card_feedback learns its adjustment from the graded
    // e_corr_estimate audit row; e_mv_rewrite answers from the graded
    // e_feed_apply maintained state against the snapshotAsOf direct path
    "e_vacuum_apply", "e_change_feed", "e_feed_apply", "e_feed_apply_minmax",
    "e_txn_rebase",
    "e_txn_retry", "e_txn_readset", "e_range_estimate_eqd", "e_nb_threshold",
    "e_pref_pairs", "e_card_feedback", "e_mv_rewrite", "e_stats_staleness",
    "e_join_order_hist")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = RefOracles.sql ++ ExtOracles.sql
}
