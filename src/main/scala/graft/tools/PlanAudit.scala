package graft.tools

/** Prints physical-plan health checks for representative queries:
  * pushed filters, read schemas (column pruning), broadcast joins,
  * whole-stage-codegen coverage. Run per round; findings feed the
  * scale-readiness notes in README.md.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    val d = "/root/testdata/sf0.01"
    val interesting = Seq(
      "q01_pricing_summary", // filter pushdown + pruning
      "q03_top_revenue_orders", // join strategy + TopK
      "q19_join_3way", // broadcast dims
      "q22_spine_densify", // cross join + broadcast
      "q30_knn_bruteforce", // broadcast + native expression
      "q59_interval_overlap", // binned range join
      "q68_agg_pnl", // window-partitioning sharing, no forced broadcast
      "q75_referral_rewards", // as-of equi join + residual bound
      "q79_sessionize", // single user exchange end-to-end
      "q83_decontaminate", // gram equi-join, eval side AQE-broadcast
      "q85_mixture_resample", // rates dim broadcast into one pass
      "q101_rolling_distinct_sketch", // map-side daily HLL, sketch fanout
      "q106_pq_adc", // broadcast codebook/LUT, bounded top-k
      "q108_semdedup", // within-cluster equi-join prune
      "q109_bloom_prune", // scalar-subquery bloom on the fact scan
      "q112_profile", // one-scan exact-moment profile
      "q117_gap_fill", // spine bounds reuse the resample exchange
      "q120_pagerank", // iterations off checkpointed frames, no re-scan
      "q123_ewma", // offset-fanout equi join, single fact pass
      "q159_countmin", // d×w grid broadcast back to probes
      "q164_join_size_estimate", // grid-to-grid inner products
      "q166_hard_negatives", // partial_graft_topk before the exchange
      "q167_hilbert_layout", // 40-column integer chain, no join
      "q171_cooccurrence_pmi", // doc_id equi self-join, df-capped
      "q173_triangle_count", // degree-oriented wedge join
      "q175_salted_agg", // two-phase exchange shape
      "q180_table_digest", // one map-side-combined digest agg
      "q158_bootstrap_ci", // exploded lanes, partial agg bounds exchange
      "q182_interval_coverage", // user-partitioned island windows
      "q183_assoc_rules", // basket-local pairs, broadcast supports
      "q184_equidepth_histogram", // 1-row boundary broadcast
      "q186_rendezvous_shard", // join-free row-local argmax routing
      "q191_linear_attribution", // binned as-of probe, residual bound
      "q193_degree_histogram", // agg-only, bit-length buckets
      "q194_feature_hashing", // vocabulary-free featurizer, zero joins
      "q196_minhash_eval", // band + gram equi joins, no all-pairs
      "q199_twap", // join-free hour clipping, type-partitioned lead
      "q201_correlation_matrix", // hour self-join over the resample
      "q202_bpe_merge_rounds", // per-round dictionary agg + one rewrite scan
      "q107_zorder_layout", // CDF-device buckets, fenced curve key (r11)
      "q203_bmp_roundtrip", // streaming encode/decode mapPartitions passes
      "q207_media_catalog", // magic-dispatch decode, one scan
      "q208_unicode_normalize", // native codegen'd normalizer, no UDF
      "q213_ppjoin", // rare-prefix candidates, no hot-token blowup (r11)
      "q214_skyline", // dictionary-CDF buckets, broadcast dominance (r11)
      "q215_ohlc_bars", // single map-side-combined min_by/max_by agg (r11)
      "q216_auc", // dictionary rank-sum, source-partitioned window (r11)
      "q219_cusum", // two type-partitioned windows over the hourly frame
      "q220_sketch_overlap", // binary-sketch pair merges, one dict pass
      "q221_pii_redact", // one regex scan + per-source rollup (r11)
      "q224_phash_neardup", // codec passes + band equi join, no all-pairs
      "q230_incremental_join", // delta joins broadcast, partials re-agg
      "q232_pattern_vshape", // CEP lowering: all windows user-partitioned
      "q234_video_keyframes", // per-partition codec pipeline, no frame shuffle (r12)
      "q235_typo_dedup", // deletion-variant equi join + cached vocab (r12)
      "q236_video_scene_dedup", // keyframe band equi join, cached kf frame (r12)
      "q128_sparse_cosine", // df-capped gram equi join, cached tf frame (r13)
      "q237_mjpeg_keyframes", // real-codec demux/decode mapPartitions, no shuffle (r13)
      "q238_mjpeg_scene_dedup", // band equi join + perceptual Hamming verify (r13)
      "q239_mulaw_roundtrip", // per-partition compander round trip, scan→project (r13)
      "q241_warc_ingest", // crawl-file groupBy + row-local demux, domain agg (r13)
      "q242_vector_delete_read", // broadcast anti-join of delete sidecars (r13)
      "q244_variant_shred", // one parse_json, codegen'd variant_get walks (r13)
      "q245_change_data_feed", // moved-entries-only diff, keyed outer join (r13)
      "q246_gif_animation", // palette codec mapPartitions, no frame shuffle (r13)
      "q253_max_repeated_ngram", // row-local array algebra, zero joins (r13)
      "q254_incremental_view_maintenance", // CDF deltas + keyed pre-image join (r13)
      "q255_semantic_decontamination", // broadcast eval side, map-side max (r13)
      "q256_url_frontier_dedup", // declarative canonicalization, one agg (r13)
      "q257_robots_filtering", // dictionary parse + broadcast rules fold (r13)
      "q259_webdataset_shards", // shard groupBy + row-local tar demux (r13)
      "q260_lm_perplexity_filter", // hash-joined LM dicts, no corpus broadcast (r13)
      "q261_dsir_importance_sampling", // ≤1024-row model broadcast, equi score join (r13)
      "q262_record_linkage", // two bounded block equi joins, no all-pairs (r13)
      "q263_auto_range_join", // RangeJoinRule: theta overlap → binned equi (r13)
      "q264_dp_noisy_release", // one scan→agg, row-local integer noise (r13)
      "q265_physical_asof", // AsOfJoinExec: 1 exchange/side, merge-scan (r13)
      "q266_bfs_reachability", // 6 checkpointed frontier supersteps (r13)
      "q267_dynamic_partition_pruning", // runtime partition-filter scan (r13)
      "q268_l_diversity", // one (cell,seg) agg + bounded cell window (r13)
      "q269_token_fertility", // one scan, two regex counts, |langs| agg (r13)
      "q270_conformal_interval", // cal-side-only sort, qhat broadcast back (r13)
      "q271_brown_smoothing", // hourly agg + one per-key HOF fold (r13)
      "q272_walsh_spectrum", // declarative 256x explode, map-side 9 sums (r13)
      "q273_isotonic_calibration", // 20-bin dictionary minimax lattice (r13)
      "q274_kcore", // 6 checkpointed peel rounds, 2 semi joins each (r13)
      "q276_mutual_nn", // label-blocked pairs, top-1 frame self-join (r13)
      "q277_label_propagation", // per-round count + node-partitioned top-1 (r13)
      "q278_quantile_normalize", // source-partitioned ranks, rank equi join (r13)
      "q279_suffix_array", // prefix quadrupling, range-sort global ranks (r13)
      "q280_random_walks", // 8 broadcast-frontier joins vs neighbor index (r13)
      "q281_benford_audit", // one scan, 9-row agg, literal expectations (r13)
      "q283_correlated_subquery", // decorrelated to aggregate+join (r13)
      "q284_theil_sen", // bounded pairwise slopes off the hourly resample (r13)
      "q285_mann_kendall", // integer S + tie-corrected variance, one sqrt (r13)
      "q286_grouping_sets", // one expanded hash agg, no join (r13)
      "q287_bitemporal_asof", // keyed version join + per-probe top-1 (r13)
      "q288_dsv2_ticks", // custom DSv2 scan: pushed id range + pruned cols (r13)
      "q297_dsv2_runtime_filter", // dynamicpruning INTO the V2 scan (r14)
      "q298_chained_stateful", // join→agg, two state ops one query (r14)
      "q299_dsv2_agg_pushdown", // closed-form agg, NO aggregate operator (r14)
      "q300_dsv2_topn_pushdown", // ORDER BY+LIMIT collapsed to range (r14)
      "q196_minhash_eval", // one-md5 signature, long-keyed truth side, one-pass eval (r15)
      "q224_phash_neardup", // lowest-band dedup, no DISTINCT exchange (r14)
      "q301_dsv2_grouped_agg_pushdown", // PARTIAL push: final agg over pushed partials (r15)
      "q302_budgeted_neardup", // per-bucket verify budget, drop ledger in result (r15)
      "q303_dsv2_offset_pushdown", // LIMIT+OFFSET collapsed to page-window range (r15)
      "q304_catalog_sql_table", // catalog V2 scan: zone-map file pruning (r15)
      "q305_catalog_sql_delete", // COW delete: runtime group filter narrows rewrite (r15)
      "q306_catalog_sql_update", // COW update: affected groups only (r15)
      "q307_catalog_sql_merge", // MERGE: one join, replaced groups + inserts (r15)
      "q308_catalog_sql_functions", // magic-invoke scalar + mergeable XOR agg (r15)
      "q309_catalog_time_travel", // VERSION AS OF: manifest-pointer read (r15)
      "q310_catalog_streaming_write", // epoch-dedup'd streaming append (r15)
      "q311_catalog_compact_procedure") // CALL compact: one-file rewrite (r15)
    interesting.foreach { name =>
      val df = graft.queries.Catalog.byName(name).run(spark, d)
      // drive THIS df's own query execution to completion (count() would
      // build a different plan) so AQE finalizes + codegen inserts
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      def count(p: String) = p.r.findAllIn(plan).size
      println(s"== $name")
      // codegen spans print as `*(n)` operator prefixes in Spark 4; the
      // span COUNT is the number of distinct ids
      val codegenSpans = """\*\((\d+)\)""".r
        .findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(s"   BroadcastHashJoin=${count("BroadcastHashJoin")} " +
        s"SortMergeJoin=${count("SortMergeJoin")} " +
        s"NestedLoop=${count("BroadcastNestedLoopJoin")} " +
        s"Exchange=${count("Exchange ")} " +
        s"CodegenSpans=$codegenSpans")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(4).foreach(l => println("   " + l.trim.take(160)))
    }
    spark.stop()
  }
}
