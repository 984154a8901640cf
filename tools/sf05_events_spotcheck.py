"""sf0.5 stress point for EVENTS-backed rows (r14): the standing sf0.5
spot-check (`tools/sf05_spotcheck.py`) derives a 5x DOCUMENTS corpus, so
events-backed rows never had a larger-scale point.  This derives a 5x
events table by TIME SHIFTING — four copies displaced by whole multiples
of the 30-day span (plus disjoint event_id bands) — which preserves the
hourly density, type mix, and user universe per copy while growing the
CALENDAR 5x.  That is exactly the axis the round's trend rows stress:

- ``aggx_theil_sen_trend``: C(n,2) hour pairs -> ~25x pair work on 5x
  hours — the quadratic the Siegel row exists to avoid;
- ``aggx_siegel_trend_sampled``: 16n pairs -> ~5x — the claimed linear
  curve, measured against the exact row on the same frame;
- ``window_sliding_distinct_kmv_approx_contract``: 5x panes/windows on
  the same per-window population;
- the URL rows: 5x feed through the map-side canonicalization chain.

Usage: python tools/sf05_events_spotcheck.py   # prints a markdown table
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
    "aggx_theil_sen_trend",
    "aggx_siegel_trend_sampled",
    "window_sliding_distinct_kmv_approx_contract",
    "feed_url_canonical_host",
    "feed_url_host_cap",
)

SF01 = "/root/testdata/sf0.1"
SF05 = "/tmp/sf0.5ev"
N_RUNS = 3
SHIFT_DAYS = 31  # > the 30-day span, so copies never overlap an hour


def build_sf05(spark) -> None:
    """Write the derived table, then flatten the Spark directory into a
    single events.parquet FILE and symlink the other tables from sf0.1 —
    so ``tools/verify_local.py /tmp/sf0.5ev <row...>`` runs the full
    value-oracle compare AT the stress scale (r14 did: 6/6 green)."""
    out = os.path.join(SF05, "events.parquet")
    # link the non-events tables FIRST and outside the early return, so
    # a run interrupted between the COPY and the links self-repairs on
    # rerun instead of leaving a permanently broken directory
    os.makedirs(SF05, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        link = os.path.join(SF05, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF01, f"{t}.parquet"), link)
    if os.path.exists(out):
        return
    ev = load_table(spark, SF01, "events")
    u = ev
    for k in range(1, 5):
        u = u.unionByName(
            ev.select(
                (F.col("event_id") + 10_000_000 * k).alias("event_id"),
                (
                    F.col("ts")
                    + F.make_interval(days=F.lit(SHIFT_DAYS * k))
                ).alias("ts"),
                "user_id",
                "event_type",
                "value",
                "props",
            )
        )
    tmp_dir = out + ".sparkdir"
    u.coalesce(8).write.mode("overwrite").parquet(tmp_dir)
    import shutil

    import duckdb

    duckdb.connect().execute(
        f"COPY (SELECT * FROM '{tmp_dir}/*.parquet') TO '{out}' "
        f"(FORMAT parquet)"
    )
    shutil.rmtree(tmp_dir)


def median_time(spark, name: str, sf_dir: str) -> float:
    ts = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ts.append(time.perf_counter() - t0)
        release_local_checkpoints(spark)
    return statistics.median(ts)


def main() -> None:
    spark = get_spark("sf05_events_spotcheck")
    build_sf05(spark)
    n1 = load_table(spark, SF01, "events").count()
    n5 = load_table(spark, SF05, "events").count()
    print(f"events: sf0.1={n1}  derived sf0.5={n5}\n")
    print("| query | sf0.1 s | sf0.5 (5x events) s | 5x-step ratio |")
    print("| --- | --- | --- | --- |")
    for name in ROWS:
        t1 = median_time(spark, name, SF01)
        t5 = median_time(spark, name, SF05)
        print(f"| {name} | {t1:.2f} | {t5:.2f} | {t5 / t1:.2f}x |")


if __name__ == "__main__":
    main()
