"""Dump formatted physical plans of the headline queries to EXPLAIN.md —
the plan-shape evidence for the scale review (pushdown, broadcasts, top-k,
single-shuffle windows).

Usage: python tools/explain_dump.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

from bench import HEADLINE  # noqa: E402
from reddit_sse_stream_spark.plans.catalog import QUERIES  # noqa: E402
from reddit_sse_stream_spark.session import get_spark  # noqa: E402

EXTRA = (
    "sessionize_events",
    "session_window_agg",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q15_top_supplier",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_idle_customers",
    "dedup_embedding_cosine_lsh",
    "text_vocab_df",
    "text_repetition_bigrams",
    "decontam_ngram_overlap",
    "dedup_incremental_new_only",
    "dedup_minhash_md5",
    "decontam_drop_contaminated",
    "join_lateral_topk_per_nation",
    "variant_json_extract_agg",
    "recursive_cte_ancestors",
    "dq_expectation_report",
    "dedup_cluster_best_quality",
    "agg_heavy_hitters_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash_hamming_pairs",
    "sample_temperature_by_lang",
    "text_stopword_scrub",
    "aggx_approx_distinct",
    "text_chunk_dup_rate",
    "vocab_coverage_topk",
    "dedup_cross_source_matrix",
    "bpe_pair_merge_counts",
    "search_bm25_topk",
    "dedup_containment_grams",
    "text_winnow_fingerprints",
    "dedup_tfidf_cosine",
    "search_hybrid_rrf",
    "ts_ohlc_hourly",
    "scd2_user_state_history",
    "graph_pagerank_transitions",
    "funnel_time_to_convert",
    "knn_batch_topk",
    "scd2_as_of_lookup",
    "window_sliding_distinct_users",
    "dedup_method_agreement",
    "funnel_attribution_last_touch",
    "decontam_multi_suite_report",
    "aggx_regression_exact",
    "udf_grouped_map_zscore",
    # r07 (VERDICT r06 next #5): the four r06 operators — k-means with
    # its explode-barrier distance folds is the one new iterative shape —
    # plus the twin-verification rows added this round
    "embed_kmeans_fixedpoint",
    "dedup_lsh_recall_audit",
    "embed_matryoshka_retention",
    "text_repetition_runs",
    "dedup_minhash_twin_containment",
    "dedup_simhash_exact_dup_invariant",
    "knn_ivf_metric_consistency",
    # mid-r07 additions
    "dedup_semdedup_cells",
    "corpus_dsir_weights",
    "text_novelty_first_owner",
    "text_encoding_quality",
    "sample_weighted_priority",
    "text_pmi_top_pairs",
    "aggx_hll_sketch_union",
    "dq_length_drift_ks",
    "feat_target_encode_loo",
    "corpus_curriculum_order",
    "embed_hard_negatives",
    "text_chunk_dedup_rewrite",
    "bpe_tokenize_counts",
    # late-r07 ANN completions: codebook-literal HOF assignment (the
    # plan-shrink rewrite), recall self-audit, IVF-PQ composite probe
    "embed_pq_codes",
    "knn_pq_recall_audit",
    "knn_ivfpq_topk",
    "corpus_batch_lineage",
    "quota_admission_per_author",
    "text_gopher_gate",
    # r08: the mergeable-sketch family (constant-size exchanges)
    "dedup_source_minhash_matrix",
    "agg_countmin_heavy_hitters",
    "dedup_sketch_merge_invariant",
    "text_duplicate_spans",
    "ts_rolling_features",
    "agg_countmin_merge_invariant",
    # r09 non-headline additions: the suffix array used (adjacent-pair
    # LCP), the broadcast-eval GEMM decontam, and the two-phase rank
    "text_longest_repeat",
    "decontam_embedding_cosine",
    "corpus_two_phase_rank_twin",
    # r11 non-headline additions: the multimodal analysis family
    # (zero-shuffle mapInPandas decode passes), the greedy coverage
    # rounds, tokenizer fertility, and the two corpus-audit rows
    "media_image_ahash",
    "media_audio_fingerprint",
    "media_video_scene_cuts",
    "corpus_greedy_coverage_pick",
    "text_tokenizer_fertility_by_lang",
    "text_zipf_fit",
    "pack_context_length_curve",
    # r12 non-headline additions: the approx equi-depth path (no window,
    # no global sort), the VAD decode pass, the dimension-frame
    # water-filling and Gini audits, the HOF code gate, the packing and
    # shuffle audits, and the two-phase percentile twin
    "fn_histogram_equidepth_approx_contract",
    "pack_length_buckets_approx_contract",
    "media_audio_silence_segments",
    "corpus_token_budget_waterfill",
    "corpus_topic_tagging",
    "text_code_detect",
    "corpus_lang_gini",
    "pack_chunk_boundary_stats",
    "corpus_shuffle_locality_audit",
    "fn_percentiles_two_phase",
    "text_lang_confusion",
    # late-r12: the novelty decay curve (gram-key subset partitioning —
    # the plan must show ONE gram exchange riding both the dedup agg and
    # the min-batch window) and the composed calibration audit
    "text_novelty_decay_curve",
    "corpus_loss_proxy_calibration",
    # late-r12 second batch: the dq audit family (one keyed exchange +
    # stack ladders; the MAD row's single histogram exchange), the IVF
    # tuning curve (broadcast probe table + WindowGroupLimit cuts), the
    # suffix blocklist (dimension-frame explode, no LIKE scans), and the
    # int64 nDCG curve
    "dq_gate_agreement_kappa",
    "dq_k_anonymity",
    "dq_l_diversity",
    "dq_mad_outlier_gate",
    "corpus_probe_calibration_bins",
    "knn_ivf_nprobe_recall_curve",
    "feed_domain_suffix_blocklist",
    "search_ndcg_curve",
    # late-r12 third batch: the equi-fied interval join (broadcast burst
    # bins), the manifest-frame compaction planner, the skew profiler's
    # histogram percentiles, the zorder skipping audit's value-range
    # binning (no global rank), and the one-pass bootstrap
    "join_interval_binned_overlap",
    "layout_compaction_plan",
    "dq_join_skew_profile",
    "layout_zorder_skipping_audit",
    "dq_bootstrap_ci_mean",
    "vocab_size_coverage_curve",
    "corpus_mixture_grid_search",
    "sample_neyman_allocation",
    "dq_signal_correlation_matrix",
    "join_blocked_entity_resolution",
    "join_er_multipass_blocking",
    "dq_join_cardinality_estimate",
    "dq_erasure_propagation",
    # r13 additions: the funnel's GK approx-ntile twin (no global sort),
    # the composed contamination-by-split report (one label join over
    # the multi-suite plan), the digest-riding dedup-rate series, the
    # WindowGroupLimit bottom-k reservoir + its KMV estimator, the
    # exact-TVD t-closeness ladder, the calendar-sized seasonal
    # decomposition, and the Hilbert three-arm skipping audit (8 fused
    # codegen SELECTs for the xy->d walk)
    "funnel_time_to_convert_approx_contract",
    "decontam_split_leakage_report",
    "dedup_rate_by_ingestion_batch",
    "sample_bottomk_minwise",
    "agg_kmv_distinct_estimate",
    "dq_t_closeness",
    "ts_seasonal_decompose",
    "layout_hilbert_skipping_audit",
    "agg_moments_merge_invariant",
    "anomaly_seasonal_adjusted",
    "aggx_theil_sen_trend",
    # r14 additions: the salted Theil-Sen pair join is re-dumped via the
    # row above; the KMV sliding-distinct swap shows its three
    # WindowGroupLimit cuts; the URL-canonicalization rows land below
    "window_sliding_distinct_kmv_approx_contract",
    "feed_url_canonical_host",
    "feed_url_host_cap",
    "aggx_siegel_trend_sampled",
    "dq_benford_first_digit",
    "dedup_priority_source_union",
    "corpus_ipf_raking_mix",
    # r15 additions: the LAION-shape alignment gate (strictly map-only:
    # ONE Arrow kernel, no join) and its one-exchange per-source
    # distribution
    "media_text_alignment_gate",
    "media_text_alignment_by_source",
    "psl_rule_classes_registered_domain",
    "media_text_alignment_threshold_curve",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("explain_dump")
    out = [
        "# EXPLAIN — physical plans of the headline queries",
        "",
        f"Generated by `python tools/explain_dump.py {sf_dir}`. The plan",
        "properties asserted in `tests/test_plans.py` are visible here:",
        "`PushedFilters` into parquet scans, broadcast dims, partial+final",
        "aggregates, `TakeOrderedAndProject` top-k, single-Exchange window",
        "plans.",
        "",
    ]
    for name in tuple(HEADLINE) + EXTRA:
        df = QUERIES[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", "```", buf.getvalue().rstrip(), "```", ""]
    out += [
        "# AQE-final plans — fact joins carry no static broadcast hints",
        "",
        "orders/customer/part are fact-scale (15%/3% of lineitem): a static",
        "`F.broadcast` hint on them OOMs at 100 TB.  The hints were removed",
        "(only nation/region/supplier keep them) and the runtime-final plans",
        "below show AQE picking the join strategy from actual sizes — at",
        f"this sf it converts to broadcast because the build side IS small;",
        "at 100 TB the same plan shuffles on key instead.",
        "",
    ]
    for name in (
        "tpch_q3_shipping_priority",
        "tpch_q5_region_revenue",
        "tpch_q10_returned_customers",
        "tpch_q14_promo_revenue",
        "tpch_q18_large_orders",
    ):
        df = QUERIES[name].spark(spark, sf_dir)
        df.collect()  # materialize so AQE finalizes the plan
        final = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name} (final)", "", "```", final.rstrip(), "```", ""]
    text = "\n".join(out)
    # plan literals can embed control chars (e.g. the \x00 ownership
    # sentinel in chunk_dedup_rewrite) — escape them so the dump stays a
    # text file for grep/pagers
    text = "".join(
        ch if ch in "\n\t" or ord(ch) >= 32 else f"\\x{ord(ch):02x}"
        for ch in text
    )
    with open("EXPLAIN.md", "w") as fh:
        fh.write(text)
    print(f"wrote EXPLAIN.md ({len(tuple(HEADLINE) + EXTRA) + 5} plans)")


if __name__ == "__main__":
    main()
