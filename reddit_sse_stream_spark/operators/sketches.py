"""Frequency-sketch operators with built-in honesty audits.

The reference engine keeps no frequency state at all (its counters are
per-connection running totals, ``/root/reference/sse.py:125-131``); these
are the 100 TB-scale counterparts: sublinear sketches whose whole state
fits in one executor page, each emitted SIDE BY SIDE with the exact
answer at test scale so the approximation error is measured, never
assumed — the same discipline as ``dedup.lsh_recall_audit`` and
``dedup.bloom_fp_audit``.

Hash family: the cross-engine ``md5_hash60`` (first 15 hex digits of md5
as a BIGINT), so every cell index is reproducible in ANSI SQL and the
DuckDB oracles verify sketch CONTENTS value-for-value, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reddit_sse_stream_spark.operators.dedup import md5_hash60


def cell_for(j: int, key_expr, w: int) -> F.Column:
    """Row ``j``'s Count-Min cell for a key: md5_hash60('j:' || key) mod
    w — the ONE definition shared by the batch sketch, the probe path,
    and the streaming twin, so their grids are the same grid."""
    return F.pmod(md5_hash60(F.concat(F.lit(f"{j}:"), key_expr)), F.lit(w))


def cms_cell_rows(key_expr, d: int, w: int) -> F.Column:
    """explode() column yielding the d (j, cell) structs for one key."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), cell_for(j, key_expr, w).alias("cell")
                )
                for j in range(d)
            ]
        )
    )


def countmin_heavy_hitters(
    events: DataFrame,
    d: int = 4,
    w: int = 64,
    top: int = 10,
    key_col: str = "user_id",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over the event
    key column, audited against exact counts for the exact top-``top``
    keys.  Output per tracked key: (user_id, exact_cnt, cms_est,
    overcount) with the sketch's one-sided guarantee cms_est >= exact_cnt
    always, and overcount <= N*e/w with probability 1-e^-d per key.

    Why it matters at 100 TB: the exact heavy-hitter aggregate
    (``agg_heavy_hitters_exact``) shuffles one key per distinct user; the
    sketch shuffles d*w cells TOTAL after map-side combine —
    per-partition state is a fixed d x w int grid, the exchange is
    constant-size regardless of cardinality, and sketches from disjoint
    partitions/days merge by cell-wise addition (the property that makes
    it a streaming/aggregation-service primitive).  The exact side here
    exists to MEASURE the overcount at test scale.

    Determinism: cell index for row j is md5_hash60('j:' || key) mod w —
    no seeds, no RNG; the same grid on any engine.
    """
    if d <= 0 or w <= 0 or top <= 0:
        raise ValueError("countmin_heavy_hitters needs d, w, top all positive")
    key = F.col(key_col).cast("string")
    cells = (
        events.select(cms_cell_rows(key, d, w).alias("p"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = events.groupBy(key.alias("key")).agg(
        F.count("*").alias("exact_cnt")
    )
    top_keys = exact.orderBy(F.desc("exact_cnt"), "key").limit(top)
    probes = top_keys.select(
        "key",
        "exact_cnt",
        cms_cell_rows(F.col("key"), d, w).alias("p"),
    ).select("key", "exact_cnt", F.col("p.j").alias("j"), F.col("p.cell").alias("cell"))
    return (
        probes.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            F.col("key").alias(key_col),
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_cnt"))
            .cast("long")
            .alias("overcount"),
        )
    )


def countmin_merge_invariant(
    events: DataFrame,
    d: int = 4,
    w: int = 64,
    key_col: str = "user_id",
    split_col: str = "event_id",
) -> DataFrame:
    """Mergeability PROOF for the Count-Min grid: sketch two disjoint
    halves of the stream (split on ``split_col`` parity), merge by
    CELL-WISE ADDITION, and compare against the sketch of the whole —
    ONE row (n_cells, n_mismatch) with n_mismatch = 0.  The CMS
    counterpart of :func:`dedup.source_minhash_merge_invariant` (min for
    MinHash, + for CMS — every sketch this engine ships proves its own
    fold), and the property behind per-day/per-partition sketching with
    no coordination.

    Scale shape: three constant-size grid aggregates (d*w cells each,
    map-side combined) over one scan; the comparison is a full-outer
    join of 256-row frames."""
    half = F.pmod(F.col(split_col), F.lit(2))
    key = F.col(key_col).cast("string")
    cells = (
        events.select(half.alias("half"), cms_cell_rows(key, d, w).alias("p"))
        .select("half", F.col("p.j").alias("j"), F.col("p.cell").alias("cell"))
        .localCheckpoint(eager=False)  # feeds full + both half grids
    )

    def grid(frame: DataFrame) -> DataFrame:
        return frame.groupBy("j", "cell").agg(F.count("*").alias("cnt"))

    full = grid(cells)
    h0 = grid(cells.where(F.col("half") == 0)).withColumnRenamed("cnt", "c0")
    h1 = grid(cells.where(F.col("half") == 1)).withColumnRenamed("cnt", "c1")
    merged = (
        h0.join(h1, ["j", "cell"], "full_outer")
        .select(
            "j",
            "cell",
            (F.coalesce("c0", F.lit(0)) + F.coalesce("c1", F.lit(0))).alias(
                "cm"
            ),
        )
    )
    return (
        full.join(merged, ["j", "cell"], "full_outer")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum(
                (
                    F.coalesce("cnt", F.lit(-1)) != F.coalesce("cm", F.lit(-2))
                ).cast("long")
            )
            .cast("long")
            .alias("n_mismatch"),
        )
    )
