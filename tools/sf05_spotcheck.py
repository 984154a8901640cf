"""sf0.5 spot-check for the steepest scale-sweep rows (VERDICT r10 next
#5): the standing sweep tops out at sf0.1 (+ the derived sf0.2), so the
six rows whose 100x-span ratio was >= 2.9x get one larger scale point —
a DERIVED ~sf0.5 documents corpus, 5x the sf0.1 table.

Derivation discipline (same as tools/sf02_spotcheck.py): the sf0.1
documents table unioned with FOUR deterministic word-permutation copies,
each with a disjoint doc_id band.  Every permutation preserves length,
vocabulary, and per-doc statistics but produces an (almost) disjoint
k-gram set for k >= 2 — so the 5x corpus keeps the original workload
shape instead of adversarially duplicating posting lists:

- reverse                (the sf0.2 recipe)
- stride-2 interleave    (words at 0,2,4,... then 1,3,5,...)
- stride-3 interleave
- reversed stride-2

For the two containment rows the candidate-join bound (sum of df^2 over
the cold-gram universe, after the _JACCARD_DF_CAP hot-gram drop) is
printed at both scales next to the runtimes: "sublinear in the candidate
bound" is the claim under test.

Usage: python tools/sf05_spotcheck.py   # prints a markdown table
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reddit_sse_stream_spark.plans.catalog import QUERIES, _JACCARD_DF_CAP
from reddit_sse_stream_spark.operators import dedup
from reddit_sse_stream_spark.session import get_spark, release_local_checkpoints
from reddit_sse_stream_spark.sources.tables import load_table

ROWS = (
    "dedup_containment_grams",
    "dedup_substring_containment",
    "text_longest_repeat",
    "text_duplicate_spans",
    "text_suffix_ranks",
    "corpus_split_leakage_safe",
    # r12 documents-backed rows at the 5x stress point: the rewritten
    # zipf (must stay flat — its only data stage is the term exchange),
    # the approx-binning contract on the tie-heavy column, the VAD
    # decode pass, the two-pass retrieval expansion, and water-filling
    "text_zipf_fit",
    "pack_length_buckets_approx_contract",
    "media_audio_silence_segments",
    "search_rm3_expansion",
    "corpus_token_budget_waterfill",
    # late-r12 documents-backed rows: the single-histogram MAD gate and
    # the one-pass bootstrap (both must track the scan), the composed
    # nDCG audit (rides the BM25 chain), and the trigram sizing curve
    # (term exchange + frequency-domain frames only)
    "dq_mad_outlier_gate",
    "dq_bootstrap_ci_mean",
    "search_ndcg_curve",
    "vocab_size_coverage_curve",
    # r13 documents-backed rows at the 5x stress point: the composed
    # contamination-by-split report (gram join + CC label join — the
    # steepest r13 sweep row at 3.1x, so the stress point matters most
    # here), the digest-riding dedup-rate series, the WindowGroupLimit
    # bottom-k cut, and the KMV estimator's distinct-bigram exchange
    "decontam_split_leakage_report",
    "dedup_rate_by_ingestion_batch",
    "sample_bottomk_minwise",
    "agg_kmv_distinct_estimate",
    # r14 documents-backed row: the digest-keyed min-struct union must
    # track the digest exchange (clone planting is map-side)
    "dedup_priority_source_union",
    # r15 documents-backed rows: the alignment gate's decode+score chain
    # is map-only so it must track the scan; the by_source report adds
    # one dimension-sized exchange and must stay flat on top of it
    "media_text_alignment_gate",
    "media_text_alignment_by_source",
)

SF01 = "/root/testdata/sf0.1"
SF05 = "/tmp/sf0.5"
N_RUNS = 3


def build_sf05(spark) -> None:
    out = os.path.join(SF05, "documents.parquet")
    if os.path.exists(out):
        return
    docs = load_table(spark, SF01, "documents")
    words = F.split(F.col("text"), " ")

    def variant(offset: int, arr) -> "F.DataFrame":
        return docs.select(
            (F.col("doc_id") + offset).alias("doc_id"),
            F.concat_ws(" ", arr).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    evens = F.filter(words, lambda x, i: i % 2 == 0)
    odds = F.filter(words, lambda x, i: i % 2 == 1)
    stride2 = F.concat(evens, odds)
    stride3 = F.concat(
        F.filter(words, lambda x, i: i % 3 == 0),
        F.filter(words, lambda x, i: i % 3 == 1),
        F.filter(words, lambda x, i: i % 3 == 2),
    )
    u = docs.unionByName(variant(10_000_000, F.reverse(words)))
    u = u.unionByName(variant(20_000_000, stride2))
    u = u.unionByName(variant(30_000_000, stride3))
    u = u.unionByName(variant(40_000_000, F.reverse(stride2)))
    u.coalesce(8).write.mode("overwrite").parquet(out)


def candidate_bound(spark, d: str) -> tuple[int, int, int]:
    """(hot grams dropped, sum df^2 cold, sum df^2 uncapped) for the
    3-gram universe — the containment rows' candidate-join row bound.
    Shared with the standing per-round sweep monitor
    (operators/dedup.py:gram_candidate_bound, VERDICT r11 next #6)."""
    docs = load_table(spark, d, "documents")
    r = dedup.gram_candidate_bound(docs, n=3, df_cap=_JACCARD_DF_CAP).first()
    return r["hot_grams"], r["df2_cold"], r["df2_all"]


def main() -> None:
    spark = get_spark("sf05_spotcheck")
    build_sf05(spark)
    for name in ROWS:  # warm codegen at the smallest sf
        QUERIES[name].spark(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        release_local_checkpoints(spark)
    med: dict[tuple[str, str], float] = {}
    for d in (SF01, SF05):
        for name in ROWS:
            samples = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                QUERIES[name].spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
                release_local_checkpoints(spark)
            med[(d, name)] = statistics.median(samples)
    print("\n| query | sf0.1 s | sf0.5 (5x docs) s | 5x-step ratio |")
    print("| --- | --- | --- | --- |")
    for name in ROWS:
        a, b = med[(SF01, name)], med[(SF05, name)]
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}x |")
    print("\n| scale | hot grams (df>64) | sum df2 cold | sum df2 uncapped |")
    print("| --- | --- | --- | --- |")
    for label, d in (("sf0.1", SF01), ("sf0.5", SF05)):
        hot, cold, allx = candidate_bound(spark, d)
        print(f"| {label} | {hot} | {cold} | {allx} |")


if __name__ == "__main__":
    main()
