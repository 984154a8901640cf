"""End-to-end training-data curation recipe — the operator catalog
composed the way a production pipeline chains it, each stage an operator
this repo's driver gate value-verifies on its own:

    raw docs
      -> exact dedup            (dedup.exact_dedup_keep_first)
      -> near-dup clusters      (dedup.near_dup_pairs: minhash + LSH
                                 banding + exact-Jaccard verify)
      -> quality gate           (corpus.filter_gate: length / alpha /
                                 repetition / lang, with per-reason flags)
      -> decontamination        (text.word_ngram_hashes 5-gram overlap
                                 vs a held-out suite, anti-join)
      -> leakage-safe split     (corpus.split_leakage_safe: near-dup
                                 clusters move as a unit)
      -> sequence packing       (packing.pack_sequences per source)
      -> shard assignment       (corpus.shard_assignments: hash shard +
                                 reproducible shuffle order)

Every stage is deterministic (hash-derived, no rand()), so the whole
pipeline is REPLAYABLE: same inputs -> same corpus, any cluster size.
Scale notes inline; at 100 TB each arrow is one keyed exchange or less.

Run:  python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from reddit_sse_stream_spark.operators import corpus, dedup, packing, text
from reddit_sse_stream_spark.session import get_spark
from reddit_sse_stream_spark.sources.tables import load_table


def curate(spark, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup — digest-only shuffle, keep the min-id survivor
    survivors = dedup.exact_dedup_keep_first(docs)
    d1 = docs.join(survivors.select("doc_id"), "doc_id")
    n1 = d1.count()

    # 2. near-dup edges — minhash/LSH banding, candidates only, then the
    #    exact-Jaccard verify; pairs feed BOTH the cluster-dedup and the
    #    leakage-safe split below (one computation, two consumers)
    pairs = dedup.near_dup_pairs(d1, threshold=0.8).localCheckpoint(
        eager=False
    )
    # cluster-dedup: drop the larger id of each near-dup pair (the
    # min-survivor policy lifted from exact dedup; for full CC-based
    # survivor selection see the dedup_cluster_best_quality row)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    d2 = d1.join(losers, "doc_id", "left_anti")
    n2 = d2.count()

    # 3. quality gate — one doc-keyed shuffle, per-reason flags kept for
    #    the audit trail
    gate = corpus.filter_gate(d2)
    d3 = d2.join(gate.filter(F.col("keep") == 1).select("doc_id"), "doc_id")
    n3 = d3.count()

    # 4. decontamination — 5-gram hashes vs a deterministic held-out
    #    suite slice; one gram-keyed join, anti-join the hits away
    grams = text.word_ngram_hashes(d3, 5).distinct()
    suite = grams.filter(F.col("doc_id") % 97 == 0).select("gram_h").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(suite, "gram_h")
        .select("doc_id")
        .distinct()
    )
    d4 = d3.filter(F.col("doc_id") % 97 != 0).join(hits, "doc_id", "left_anti")
    n4 = d4.count()

    # 5. leakage-safe split — the surviving near-dup edges force cluster
    #    members into the SAME split, so val never holds a train twin
    live_pairs = (
        pairs.join(d4.select(F.col("doc_id").alias("doc_a")), "doc_a")
        .join(d4.select(F.col("doc_id").alias("doc_b")), "doc_b")
    )
    split = corpus.split_leakage_safe(d4, live_pairs, val_frac=0.1)

    # 6. pack + shard the train side — per-source token cumsum (no global
    #    sort), then hash shards with a reproducible shuffle order; the
    #    shard id IS the write partitioning at scale
    train = d4.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    packed = packing.pack_sequences(train, budget=512)
    shards = corpus.shard_assignments(train, n_shards=16)
    out = packed.join(shards.select("doc_id", "shard", "pos"), "doc_id")

    return {
        "raw": n0,
        "after_exact_dedup": n1,
        "after_near_dedup": n2,
        "after_quality_gate": n3,
        "after_decontam": n4,
        "train_rows": out.count(),
        "val_rows": split.filter(F.col("split") == "val").count(),
        "n_packs": out.select("source", "pack_id").distinct().count(),
        "n_shards": out.select("shard").distinct().count(),
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    funnel = curate(get_spark("curation_pipeline"), sf)
    for k, v in funnel.items():
        print(f"{k:22s} {v}")
