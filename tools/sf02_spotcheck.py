"""sf0.2 spot-check for the steepest scale-sweep rows (VERDICT r08 next #8).

The driver ships sf{0.001,0.01,0.1}; the three rows whose 100x-span ratio
was >= 4x (dedup_containment_grams 6.6x, text_char_entropy 4.8x,
dedup_substring_containment 4.2x — all documents-table text ops) get one
extra scale point to confirm the curve is flattening, not inflecting.

The sf0.2 documents table is DERIVED, not synthesized from scratch: the
sf0.1 table unioned with a word-reversed copy (doc_id offset by 1e6).
Reversal preserves length / vocabulary / per-doc statistics while
producing entirely different k-grams (k >= 2), so the doubled corpus
keeps the original's workload shape — duplicating texts verbatim would
instead double every gram's posting list and measure an adversarially
duplicated corpus, not scale.

Usage: python tools/sf02_spotcheck.py   # prints a markdown table
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reddit_sse_stream_spark.plans.catalog import QUERIES
from reddit_sse_stream_spark.session import get_spark, release_local_checkpoints
from reddit_sse_stream_spark.sources.tables import load_table

ROWS = (
    "dedup_containment_grams",
    "text_char_entropy",
    "dedup_substring_containment",
    # r09 heavy text additions: one extra scale point on first exposure
    "text_suffix_ranks",
    "text_longest_repeat",
    "text_duplicate_spans",
)

SF01 = "/root/testdata/sf0.1"
SF02 = "/tmp/sf0.2"
N_RUNS = 5


def build_sf02(spark) -> None:
    out = os.path.join(SF02, "documents.parquet")
    if os.path.exists(out):
        return
    docs = load_table(spark, SF01, "documents")
    flipped = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split(F.col("text"), " "))).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    docs.unionByName(flipped).coalesce(4).write.mode("overwrite").parquet(out)


#: Density-stress variants (VERDICT r09 next #6): the two containment
#: rows' sf0.2 step ratios (2.45x/2.94x) were diagnosed as a small-vocab
#: density artifact — per-gram df doubling with corpus size — and a
#: boilerplate-heavy REAL crawl has exactly that property, so the
#: ``_JACCARD_DF_CAP`` hot-gram guard needs a point where it actually
#: ENGAGES, not just an argument that it would.
SF_DENSE = "/tmp/sf0.1_dense"    # sf0.1 ∪ verbatim 20% sample (dup density)
SF_BOILER = "/tmp/sf0.1_boiler"  # 30% of docs share an appended footer
DENSITY_ROWS = ("dedup_containment_grams", "dedup_substring_containment")
_FOOTER = (
    " subscribe to our newsletter terms of service privacy policy all"
    " rights reserved contact us about this site copyright twenty"
    " twenty four"
)


def build_density_variants(spark) -> None:
    docs = load_table(spark, SF01, "documents")
    out = os.path.join(SF_DENSE, "documents.parquet")
    if not os.path.exists(out):
        dup = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        docs.unionByName(dup).coalesce(4).write.mode("overwrite").parquet(out)
    out2 = os.path.join(SF_BOILER, "documents.parquet")
    if not os.path.exists(out2):
        boiler = docs.select(
            "doc_id",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 3,
                F.concat("text", F.lit(_FOOTER)),
            ).otherwise(F.col("text")).alias("text"),
            "lang", "source", "n_chars",
        )
        boiler.coalesce(4).write.mode("overwrite").parquet(out2)


def density_stress(spark) -> None:
    """For each variant: the cap-engagement counters (hot grams dropped,
    Σdf² over the cold universe = the candidate-join row bound, and the
    UNCAPPED Σdf² = what the join would cost without the guard) plus
    median-of-5 runtimes of the two containment rows."""
    from reddit_sse_stream_spark.operators import dedup
    from reddit_sse_stream_spark.plans.catalog import _JACCARD_DF_CAP

    print("\n| variant | docs | hot grams (df>64) | sum df2 cold | sum df2 uncapped | containment_grams s | substring_containment s |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for label, d in (
        ("sf0.1 baseline", SF01),
        ("dense-dup (∪ verbatim 20%)", SF_DENSE),
        ("boilerplate (30% shared footer)", SF_BOILER),
    ):
        docs = load_table(spark, d, "documents")
        n_docs = docs.count()
        words = F.split(F.lower(F.col("text")), r"\s+")
        tok = docs.select(
            "doc_id", F.explode(F.array(words)).alias("words")
        ).filter(F.size("words") >= 3)
        sh = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("words") - 3),
                lambda i: dedup.md5_hash60(
                    F.concat_ws(" ", F.slice("words", i + 1, 3))
                ),
            )
        )
        dfc = (
            tok.select("doc_id", F.explode(sh).alias("g"))
            .groupBy("g").count()
        )
        cap = F.lit(_JACCARD_DF_CAP)
        stats = dfc.agg(
            F.sum(F.when(F.col("count") > cap, 1).otherwise(0)).alias("hot"),
            F.sum(
                F.when(F.col("count") <= cap, F.col("count") * F.col("count"))
                .otherwise(0)
            ).alias("df2_cold"),
            F.sum(F.col("count") * F.col("count")).alias("df2_all"),
        ).first()
        med = {}
        for name in DENSITY_ROWS:
            samples = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                QUERIES[name].spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
                release_local_checkpoints(spark)
            med[name] = statistics.median(samples)
        print(
            f"| {label} | {n_docs} | {stats['hot']} | {stats['df2_cold']}"
            f" | {stats['df2_all']} | {med[DENSITY_ROWS[0]]:.2f}"
            f" | {med[DENSITY_ROWS[1]]:.2f} |"
        )


def main() -> None:
    spark = get_spark("sf02_spotcheck")
    if "--density" in sys.argv:
        build_density_variants(spark)
        for name in DENSITY_ROWS:  # warm codegen at the smallest sf
            QUERIES[name].spark(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        density_stress(spark)
        return
    build_sf02(spark)
    print("| query | sf0.1 s (med-5) | sf0.2 s (med-5) | 2x-step ratio |")
    print("| --- | --- | --- | --- |")
    for name in ROWS:
        QUERIES[name].spark(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        release_local_checkpoints(spark)
        med = {}
        for sf_dir in (SF01, SF02):
            samples = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
                release_local_checkpoints(spark)
            med[sf_dir] = statistics.median(samples)
        print(
            f"| {name} | {med[SF01]:.2f} | {med[SF02]:.2f} "
            f"| {med[SF02] / med[SF01]:.2f}x |"
        )


if __name__ == "__main__":
    main()
