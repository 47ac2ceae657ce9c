package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for the queries whose
  * plan shape matters at 100 TB, so regressions in pushdown / broadcast /
  * whole-stage codegen / shuffle count are visible in review.
  *
  * What to look for (and what the current plans show):
  *  - parquet scans carry `PushedFilters` + pruned `ReadSchema`
  *  - small dims join as `BroadcastHashJoin`, not SortMerge
  *  - top-k is `TakeOrderedAndProject`, not global Sort+Limit
  *  - column-expression operators sit inside `WholeStageCodegen` spans
  *  - exactly one Exchange per intended shuffle
  *
  * Usage: sbt -batch "runMain graft.PlanAudit [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_agg_pricing", "q_join_customer_orders", "q_topk_orders",
        "q_anti_join", "dedup_minhash_lsh", "ann_bruteforce_topk",
        "text_tokens", "q_window_topn",
        // round-3 shapes: scaling-bucket join, flagship chain, trained probe
        "dedup_embedding_cosine", "corpus_curate", "ann_ivf_trained_topk",
        // round-4 shapes: no-join as-of, bucketed range join, 512-row
        // sketch shuffle, shuffle-free sample
        "q_asof_join", "q_range_join", "sketch_hll_registers", "q_stratified_sample",
        // round-4 late: broadcast-probed inverted index, RRF fusion,
        // scan-only mixing, histogram-thresholded two-pass gate
        "text_bm25_topk", "search_hybrid_rrf", "q_domain_mix",
        "text_quality_adaptive_gate",
        // round-4 final: ids-only cluster resolution / leakage pass,
        // partial-WindowGroupLimit quota
        "dedup_keep_best", "q_split_leakage", "q_domain_cap",
        // round-4 close: canonical-keyed URL keeper join, broadcast DSIR
        // weight table, zero-shuffle chunk explode
        "q_url_dedup", "q_dsir_weight", "text_chunk_windows",
        "q_host_pagerank", "text_bpe_merges", "q_memorization_audit",
        "q_skew_salted_join",
        // round-4 closing: sortless Morton layout, per-partition binpack
        // window, bucket-windowed two-pass shuffle, broadcast-probed
        // triplet mining
        "q_zorder_layout", "q_compaction_plan", "q_global_shuffle",
        "q_hard_negatives",
        // round-4 final session: sketch-merge graph rounds, banded byte-
        // gram near-dedup, pigeonhole-blocked linkage, bucketed cumsum
        // sampling, positional phrase prune
        "q_hyperball", "q_effective_diameter", "mm_phash_hamming",
        "q_fuzzy_join", "q_weighted_sample", "search_phrase_match",
        "q_kcore_peel",
        // this session: df-capped containment index, complete prefix-
        // filter join, joinless rendezvous argmax, TakeOrdered priority
        // sample, broadcast-pruned snippet windows, dual-fixpoint spam
        // mass, PRF expansion, burst floor, weighted HITS
        "dedup_containment", "dedup_allpairs_cosine", "q_rendezvous_shards",
        "q_priority_sample", "search_snippet", "q_spam_mass",
        "search_query_expand", "q_burst_detect", "q_hits",
        // this session, cont.: first-occurrence attribution agg, two-pass
        // per-language terciles, dual-layout padding audit, broadcast
        // MMR greedy, zero-shuffle BLEU
        "dedup_novelty", "q_ccnet_buckets", "q_batch_pad_waste",
        "search_mmr_rerank", "eval_bleu",
        // this session, cont.: frontier-join walk hops, scan-only LIX,
        // unpivot profiler
        "q_random_walks", "text_readability", "q_data_profiler",
        "q_context_fit", "q_shard_balance", "q_schema_drift",
        "q_walk_skipgrams", "text_code_detect", "dedup_cluster_histogram",
        "q_retention_cohorts", "q_graph_modularity",
        "extract_caption_align", "eval_span_f1", "text_topic_boundaries",
        // this session: dims-row power-iteration passes, single partial-agg
        // bootstrap, bin-histogram calibration
        "ann_power_iteration", "q_bootstrap_sample", "eval_ece",
        // this session, cont.: k-row balance audit, 4-cell confusion
        // rollup, broadcast-set blocklist scan
        "ann_cell_balance", "eval_kappa", "text_blocklist_filter",
        // this session, cont.: composite IVF-PQ — broadcast probe + ADC
        // dictionaries over a codes-only index scan
        "ann_ivfpq_topk", "ann_ivfpq_recall",
        // round 5: bucket-offset suffix rank + rank-equi neighbor join,
        // single max(struct) agg + ids-only leak join, partial-agg pass@k
        "dedup_suffix_lcp", "q_preference_pairs", "eval_pass_at_k",
        // round 5, cont.: map-side CDC boundary pass + digest groupBy,
        // bounded-struct conv rollup, max(struct) vote consolidation,
        // zero-exchange span-corruption / FIM token transforms
        "dedup_cdc_chunks", "q_chat_turns", "eval_majority_vote",
        "text_span_corruption", "text_fim_transform",
        // round 5, close: integer-exact unrolled BT-MM with broadcast
        // M-row rating frames (iteration cost independent of corpus),
        // zero-exchange instruction-density scan
        "eval_bt_ratings", "text_instruction_density")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
