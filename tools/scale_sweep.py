"""Empirical scaling evidence: run representative headline queries at every
available scale factor and report the runtime growth vs the 100x data growth.

Usage: python tools/scale_sweep.py [out_md]

Writes SCALING.md: per-query wall time at sf0.001 / sf0.01 / sf0.1 and the
time ratio across the 100x span.  A scan-bound operator should grow far
sublinearly on local[32] (fixed per-query overhead dominates small SFs);
anything growing FASTER than data is a scale bug.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_sse_stream_spark.plans.catalog import QUERIES  # noqa: E402
from reddit_sse_stream_spark.session import (  # noqa: E402
    get_spark,
    release_local_checkpoints,
)

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

#: one per cost family: scan+filter, shuffle agg, star join, window,
#: gram join, digest dedup, LSH sketch, vector scan, iterative graph —
#: plus every query that has EVER been the sweep's worst scaler, so a
#: regression of a fixed quadratic shows up immediately
SWEEP = (
    "f5_whitelist_combiner",
    "tpch_q1_pricing_summary",
    "tpch_q5_region_revenue",
    "window_topk_orders_per_customer",
    "decontam_ngram_overlap",
    "dedup_exact_keep_first",
    "dedup_minhash_md5",
    "knn_bruteforce_cosine",
    "dedup_cc_clusters",
    "dedup_ngram_jaccard",
    "dedup_simhash_hamming_pairs",
    "dedup_embedding_cosine_lsh",
    "knn_lsh_bucketed",
    "sample_temperature_by_lang",
    # round-5 additions: the new iterative / candidate-join operators
    "corpus_split_leakage_safe",
    "dedup_substring_containment",
    "text_bigram_lm_bits",
    "embed_pca_power_iteration",
    "knn_ivf_fixedpoint_cells",
    "corpus_diverse_sample",
    # new corpus reports: char explode, chunk digests, prefix-max scan
    "text_char_entropy",
    "text_chunk_dup_rate",
    "stream_lateness_watermark_profile",
    "dedup_threshold_curve",
    # r05 additions: the new candidate-join / retrieval / graph operators
    "dedup_tfidf_cosine",
    "dedup_containment_grams",
    "text_winnow_fingerprints",
    "search_bm25_topk",
    "graph_pagerank_transitions",
    "ts_ohlc_hourly",
    # r07 additions (VERDICT r06 next #5): the four r06 operators —
    # k-means is the new iterative driver-sync shape — plus the xxhash
    # minhash fast path itself (the r06 drift query was missing from the
    # sweep; its md5 twin was standing in for it)
    "embed_kmeans_fixedpoint",
    "dedup_lsh_recall_audit",
    "embed_matryoshka_retention",
    "text_repetition_runs",
    "dedup_minhash_lsh",
    # mid-r07 additions: semantic dedup (quantizer-dominated), the BPE
    # training loop (4 argmax rounds), the chunk-ownership rewrite, the
    # LSH-pruned cross-label top-1, and the checkpointed DSIR pipeline
    "dedup_semdedup_cells",
    "bpe_train_merges",
    "text_chunk_dedup_rewrite",
    "embed_hard_negatives",
    "corpus_dsir_weights",
    "text_novelty_first_owner",
    # late-r07 additions: the compressed-ANN family (flat driver-round
    # constants by design — the sweep guards against the constant ever
    # turning data-shaped) and the lineage forensic window
    "embed_pq_codes",
    "knn_ivfpq_topk",
    "corpus_batch_lineage",
    # r08 additions: the mergeable-sketch family — both should be flat
    # (constant-size exchanges after map-side combine; a data-shaped
    # growth here means the combine stopped happening)
    "dedup_source_minhash_matrix",
    # r09: the sampled-audit (100 TB) configuration should grow strictly
    # slower than the full-audit row above — its corpus-sized self-join
    # input is 1/8 of the full row's
    "dedup_source_minhash_sampled",
    "agg_countmin_heavy_hitters",
    # r09: residual IVF-PQ — like the composite, fixed training-round
    # cost should dominate (flat-ish curve)
    "knn_ivfpq_residual_topk",
    # r09: suffix-array ranks — rounds are log(max doc length), which is
    # CONSTANT in corpus size; per-round work is linear
    "text_suffix_ranks",
    # r09 late additions: adjacent-pair LCP (early-exit Arrow kernel over
    # the suffix order) and the broadcast-eval GEMM decontam (pure map
    # pass — must stay near-flat)
    "text_longest_repeat",
    "decontam_embedding_cosine",
    # map-only zero-shuffle gate (plan-pinned) — must stay flat
    "text_mattr_diversity",
    # one-exchange lag stack — must scale with the key exchange only
    "ts_ewma_features",
    # window-marked substring dedup: must scale with gram rows (window),
    # never pair-quadratically
    "text_duplicate_spans",
    # four-frame window matrix: must stay one-exchange flat
    "ts_rolling_features",
    # r10: Heaps curve — the word->min-first-doc exchange is the only
    # data-shaped stage; checkpoints are one tiny agg regardless of N
    "text_vocab_growth",
    # r10: IVF index maintenance — training constant + a map-only
    # assignment; should be near-flat like the residual row
    "knn_ivf_incremental_assign",
    # r11: DoReMi reweight — the bigram exchange is the only data-shaped
    # stage (the OOV join rides it); per-domain agg is constant-size
    "corpus_doremi_reweight",
    # r11: quality linear probe — fixed GD-round constant over a
    # checkpointed feature frame; should be near-flat like PCA
    "corpus_quality_linear_probe",
    # r11: multimodal analysis family — zero-shuffle mapInPandas decode
    # passes; growth should track the media row count only
    "media_image_ahash",
    "media_audio_fingerprint",
    "media_video_scene_cuts",
    # r11: greedy coverage — k driver-synced rounds over the checkpointed
    # gram frame; the per-round aggregate is the data-shaped stage
    "corpus_greedy_coverage_pick",
    # r11: fertility-by-lang — rides the BPE training/tokenize chain
    # (fixed argmax rounds) + one lang-keyed aggregate
    "text_tokenizer_fertility_by_lang",
    # r11: corpus audits — term exchange + vocab rank window (zipf);
    # map pass + broadcast 4-row cross (context curve) — both near-flat
    # (r12: zipf's rank window replaced by the distinct-frequency
    # closed form — the sweep now guards the histogram shape)
    "text_zipf_fit",
    "pack_context_length_curve",
    # r12: approx equi-depth — two scans + broadcast k-row range join;
    # must grow with scan cost only (no sort, no window by plan pin)
    "fn_histogram_equidepth_approx_contract",
    # r12: VAD decode pass — zero-shuffle mapInPandas like the other
    # media kernels; growth tracks the audio row count
    "media_audio_silence_segments",
    # r12: water-filling — one word-count exchange then dimension-sized
    # frames; must stay exchange-shaped
    "corpus_token_budget_waterfill",
    # r12: two-pass retrieval expansion — BM25 chain + broadcast winners
    # + one term aggregate; growth should track the BM25 row's
    "search_rm3_expansion",
    # r12: pairwise MM fit — equi self-join + match aggregate are the
    # data-shaped stages; MM rounds live on the players-squared frame
    "pref_bradley_terry_strength",
    # r12: two-phase percentiles — distinct-value exchange + domain-
    # sized cumsum window; must stay exchange-shaped (the window input
    # is the value domain, not the data)
    "fn_percentiles_two_phase",
    # late-r12: novelty decay — the same linear gram pipeline as
    # text_novelty_first_owner (one gram-key exchange rides the
    # (batch, gram) dedup and the min-batch window; 10-row output)
    "text_novelty_decay_curve",
    # late-r12: MAD outliers — ONE (source, value) histogram exchange;
    # everything after is value-domain sized, so the curve must track
    # the scan, not the corpus
    "dq_mad_outlier_gate",
    # late-r12: IVF tuning curve — training constant + one unit-frame
    # scan with WindowGroupLimit cuts; near-flat like the other ANN rows
    "knn_ivf_nprobe_recall_curve",
    # late-r12: suffix blocklist — domain exchange then dimension-frame
    # suffix explode; must stay exchange-shaped
    "feed_domain_suffix_blocklist",
    # r13: funnel quartiles via GK cutpoints + broadcast range join —
    # two scans of the converter frame, no global sort by plan pin
    "funnel_time_to_convert_approx_contract",
    # r13: contamination-by-split — the multi-suite gram join + one
    # doc-keyed label join; growth must track the gram exchange
    "decontam_split_leakage_report",
    # r13: dedup-rate series — rides the digest exchange (first-owner
    # groupBy + join back); must grow with the digest shuffle only
    "dedup_rate_by_ingestion_batch",
    # r13: bottom-k reservoir — WindowGroupLimit holds k rows per key
    # per partition before the exchange; must stay near-flat
    "sample_bottomk_minwise",
    # r13: KMV estimator — the (source, bigram) distinct exchange is the
    # only data-shaped stage; the k-cut and everything after is
    # dimension-sized
    "agg_kmv_distinct_estimate",
    # r13 second batch: the exact-TVD ladder (one QI+bucket exchange,
    # groups x 10 dimension join), the calendar-sized seasonal window,
    # the three-arm Hilbert audit (map-only keys + box aggregate), and
    # the integer-moment merge invariant (two keyed exchanges)
    "dq_t_closeness",
    "ts_seasonal_decompose",
    "layout_hilbert_skipping_audit",
    "agg_moments_merge_invariant",
    # r13: seasonal-adjusted anomaly — the decomposition's stages plus
    # two value-domain histogram medians; must track the hour exchange
    "anomaly_seasonal_adjusted",
    # r13: Theil-Sen — the pairwise join is calendar^2-bounded (hourly
    # aggregate), so the curve must track the (type, hour) exchange
    "aggx_theil_sen_trend",
    # r14 additions: the Siegel sampled-anchor twin (16n pairs via a
    # broadcast anchor join — must scale strictly flatter than the
    # exact C(n,2) row above), the KMV sliding-distinct swap (pane
    # exchange + three WindowGroupLimit cuts), and the two URL rows
    # (map-side canonicalization chain; the cap's WindowGroupLimit)
    "aggx_siegel_trend_sampled",
    "window_sliding_distinct_kmv_approx_contract",
    "feed_url_canonical_host",
    "feed_url_host_cap",
    # r14 second batch: the digest-keyed min-struct union (must track
    # the digest exchange) and the 9-bucket Benford histogram (must be
    # flat — dimension-sized after the first aggregate)
    "dedup_priority_source_union",
    "dq_benford_first_digit",
    # r14 third batch: IPF raking — one (source, lang) exchange, then
    # window passes over the ~100-cell dimension frame; must be flat
    "corpus_ipf_raking_mix",
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.md"
    spark = get_spark("scale_sweep")
    # full untimed warm-up pass at the smallest sf: every query compiles its
    # codegen once here, so the timed columns measure data work, not
    # first-compile (without this, the sf0.001 column dwarfs sf0.01's)
    for name in SWEEP:
        QUERIES[name].spark(spark, SFS[0]).write.format("noop").mode(
            "overwrite"
        ).save()
    times: dict[str, list[float]] = {name: [] for name in SWEEP}
    for sf_dir in SFS:
        QUERIES["a3_max_cursor"].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in SWEEP:
            # median of 3 (same rationale as bench.py, VERDICT r03 #6): the
            # machine hosts other JVMs and a single run's ±30% noise band is
            # larger than the scaling signal this sweep exists to measure
            samples = []
            for _ in range(3):
                start = time.perf_counter()
                QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - start)
            samples.sort()
            times[name].append(round(samples[1], 3))
            # drop finished localCheckpoint blocks so accumulated dead
            # checkpoints don't degrade later cells (measured 3-6x)
            release_local_checkpoints(spark)

    lines = [
        "# SCALING — measured runtime vs data scale (local[32])",
        "",
        "Generated by `python tools/scale_sweep.py`.  Data grows 10x per",
        "column (sf0.001 -> sf0.01 -> sf0.1 = 100x span); the last column is",
        "time(sf0.1)/time(sf0.001).  Fixed per-query overhead (plan, codegen,",
        "task dispatch) dominates at small SFs, so a healthy operator shows a",
        "ratio FAR below 100x; a ratio above ~100x would flag super-linear",
        "work (the scale bug this sweep exists to catch).",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | 100x-span ratio |",
        "| --- | --- | --- | --- | --- |",
    ]
    for name in SWEEP:
        t = times[name]
        ratio = t[2] / t[0] if t[0] > 0 else float("inf")
        lines.append(
            f"| {name} | {t[0]:.2f} | {t[1]:.2f} | {t[2]:.2f} | {ratio:.1f}x |"
        )
    lines += [
        "",
        "Note: the TPC-H tables and events grow the full 100x across the",
        "span; documents/embeddings grow 10x (500/500/5000 and 500/500/2000",
        "rows), so the text/vector rows measure a 10x data step.",
    ]
    # Candidate-bound monitor (VERDICT r11 next #6): the gram-join rows'
    # work scales with Σdf² over the COLD gram universe, not with doc
    # count — regenerate the bound per scale factor every round so a
    # density shift (or a broken hot-gram guard) shows up as a bound
    # blowup here before it shows up as a runtime blowup above.
    from reddit_sse_stream_spark.operators.dedup import gram_candidate_bound
    from reddit_sse_stream_spark.plans.catalog import _JACCARD_DF_CAP
    from reddit_sse_stream_spark.sources.tables import load_table

    bound_rows = []
    for sf_dir in SFS:
        docs = load_table(spark, sf_dir, "documents")
        r = gram_candidate_bound(docs, n=3, df_cap=_JACCARD_DF_CAP).first()
        bound_rows.append((sf_dir.rsplit("/", 1)[-1], r))
    lines += [
        "",
        "### Candidate-bound monitor (gram-join rows)",
        "",
        f"Distinct word-trigram universe, hot-gram cap df > {_JACCARD_DF_CAP}",
        "(the `_JACCARD_DF_CAP` guard shared by the containment/jaccard/",
        "leakage rows).  `sum df^2 cold` is the exact row count entering the",
        "candidate equi-join — the quantity the containment rows' runtimes",
        "above must stay sublinear in; `cold/uncapped` < 1.0 means the guard",
        "is engaging (hot grams dropped).",
        "",
        "| scale | hot grams | sum df^2 cold | sum df^2 uncapped | cold/uncapped |",
        "| --- | --- | --- | --- | --- |",
    ]
    for label, r in bound_rows:
        frac = r["df2_cold"] / max(r["df2_all"], 1)
        lines.append(
            f"| {label} | {r['hot_grams']} | {r['df2_cold']} | "
            f"{r['df2_all']} | {frac:.3f} |"
        )
    b0, b2 = bound_rows[0][1], bound_rows[-1][1]
    cg = times.get("dedup_containment_grams")
    if cg and b0["df2_cold"]:
        lines += [
            "",
            f"Bound growth across the span: {b2['df2_cold'] / b0['df2_cold']:.1f}x"
            f" (cold df^2) vs dedup_containment_grams runtime"
            f" {cg[2] / max(cg[0], 1e-9):.1f}x — the runtime staying below the"
            " bound's growth is the sublinearity claim under test.",
        ]
    # preserve hand-written analysis sections (## headers after the table)
    # across regenerations
    extra = ""
    try:
        with open(out_path) as fh:
            old = fh.read()
        cut = old.find("\n## ")
        if cut != -1:
            extra = "\n" + old[cut + 1 :]
    except FileNotFoundError:
        pass
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n" + extra)
    print(f"wrote {out_path}")
    for name in SWEEP:
        print(name, times[name])


if __name__ == "__main__":
    main()
