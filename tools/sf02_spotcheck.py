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


def main() -> None:
    spark = get_spark("sf02_spotcheck")
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
