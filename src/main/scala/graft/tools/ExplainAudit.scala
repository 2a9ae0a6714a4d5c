package graft.tools

import graft.{GraftSession, SparkEntry}

/** Prints formatted physical plans for the headline queries so plan
  * regressions (lost pushdown, surprise sort-merge joins, broken
  * codegen spans) are visible in review. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("explain-audit", 4)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q4_tf", "q6_tfidf", "rel_pricing_summary",
        "rel_revenue_nation", "sim_topk_brute", "dedup_minhash_lsh",
        "rel_asof_join", "text_lm_score",
        // round-3 surface
        "dedup_embedding", "dedup_decontam", "pipe_curate",
        "samp_hash", "sim_quantize", "sim_label_eval",
        // round-5 surface
        "dedup_substring", "samp_shard", "rel_range_join",
        "sim_topk_pq", "rel_skew_join",
        // round-6 surface (stream_queue_etl excluded: explain would
        // stage the log and drain the stream, not just plan)
        "text_bm25", "rel_funnel", "rel_dq_audit",
        "sim_docs_tfidf_pruned", "sim_topk_ivfpq_res",
        "rel_heavy_hitters",
        // round-6 fourth/fifth-session surface
        "rel_compact_latest_scalable", "rel_fuzzy_join",
        "sim_hard_negatives", "samp_curriculum_scalable",
        "rel_pagerank", "rel_cohort", "rel_activity_spine",
        "rel_snapshot_diff", "io_orc_roundtrip",
        // round-6 sixth-session surface
        "rel_components", "rel_auc", "text_nb_classify",
        "dedup_incremental", "io_bucketed_join",
        // round-6 seventh-session surface
        "rel_merge_upsert", "rel_pivot", "pipe_entity_res",
        "io_sorted_write",
        // round-6 eighth-session surface
        "samp_repeat_epochs", "samp_token_budget",
        "samp_token_budget_scalable", "rel_triangles",
        "io_zorder_write",
        // round-6 ninth-session surface
        "text_cdc_chunk", "dedup_semantic", "rel_rolling_stats",
        "rel_profile", "text_drift", "dedup_chunks",
        "rel_rate_anomaly", "io_compaction_plan", "rel_kcore",
        "rel_cumulative_users", "samp_balance", "sim_trunc_eval",
        "rel_asof_forward", "rel_grouping_sets",
        // round-7 surface (streaming gates excluded: explain would
        // stage and drain the stream, not just plan)
        "rel_interval_join", "rel_order_stats", "rel_bfs_hops",
        "rel_scd2", "rel_incremental_agg", "io_merge_schema",
        "mm_resize", "mm_frames", "mm_batch", "mm_phash",
        "rel_link_predict", "rel_ewma", "sim_mmr", "rel_k_anonymity",
        "text_bpe_pairs", "text_bpe_merge", "samp_split_grouped",
        "samp_decay", "rel_partition_diff", "rel_hll_maintain",
        "rel_funnel_window", "rel_revenue_deciles", "rel_ppr",
        "samp_mix_tokens",
        // late round-7 additions the list predated (ADVICE r7);
        // io_csv_quoted's build-time fixture write (the query fn
        // stages the file before the read plan exists) is the same
        // accepted trade as io_sorted_write / io_zorder_write above
        "rel_outliers", "rel_gini", "io_csv_quoted",
        // round-8 surface (driver-looped gates run their bounded
        // per-round actions at build time — cheap at the audit SF —
        // and the printed plan is the final round's)
        "text_html_extract", "text_html_extract_scale",
        "text_bpe_train", "sim_topk_ivf_persisted",
        "rel_pagerank_converged", "rel_bfs_frontier",
        "text_bpe_encode", "sim_topk_ivf_updated",
        "rel_components_converged", "rel_kcore_converged",
        "text_html_langid",
        // (stream_html_ingest excluded with the other streaming gates:
        // explain would stage and drain the stream)
        "dedup_url", "text_html_extract_files",
        "rel_incremental_refresh",
        // round-9 surface (artifact gates build+write at audit SF —
        // the printed plan is the serve path; stream_url_dedup
        // excluded with the other streaming gates)
        "rel_sssp", "rel_refresh_artifact", "text_bpe_apply_stored",
        "text_bpe_encode_oov", "rel_sssp_delta", "rel_pagerank_weighted",
        "rel_hll_artifact", "dedup_decontam_artifact",
        "dedup_index_artifact", "samp_fixed_k")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
