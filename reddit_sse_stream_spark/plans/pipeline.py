"""The reference connection as ONE batch plan: everything a client of
pushshift/reddit_sse_stream gets from `GET /?...` (/root/reference/sse.py:
80-241), as a single composable DataFrame pipeline:

    offsets (S3/S4) -> filters (F1-F8) -> interleave+sort (M1/M2)
    -> P2 projection -> SSE frame column (S7/X5)

A reference user can hand the same URL params to :func:`reference_pipeline`
and get the exact frame stream as a DataFrame — the switch-over artifact.
The streaming twin is streaming/source.py + sink.py with identical
semantics per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sse_stream_spark.operators.projection import json_key_subset
from reddit_sse_stream_spark.sources.feed import feed_df
from reddit_sse_stream_spark.spec import QuerySpec


def reference_pipeline(
    spark: SparkSession, sf_dir: str, spec: QuerySpec
) -> DataFrame:
    """(id, event, data, frame) for one parsed client spec, in emission
    order (created_utc, id)."""
    fd = feed_df(spark, sf_dir)

    # S4/S3 — offset precedence: start_id over backfill over latest
    # (sse.py:126-129); batch form = id lower bounds per stream. Stream
    # maxima come from a 1-row aggregate broadcast back into the scan — a
    # whole-frame window would funnel every row through ONE partition, a
    # serial bottleneck at scale; the agg+broadcast shape is map-side only.
    needs_max = spec.comment_backfill is not None or spec.submission_backfill is not None
    if needs_max:
        maxima = fd.groupBy().agg(
            F.max(F.when(F.col("event") == "rc", F.col("id"))).alias("_rc_max"),
            F.max(F.when(F.col("event") == "rs", F.col("id"))).alias("_rs_max"),
        )
        fd = fd.crossJoin(F.broadcast(maxima))

    def bound(start_id, backfill, max_col):
        if start_id is not None:
            return F.col("id") >= F.lit(start_id)
        if backfill is not None:  # clamped at parse (sse.py:65)
            return F.col("id") > F.col(max_col) - F.lit(backfill)
        return F.lit(True)

    offset_pred = F.when(
        F.col("event") == "rc",
        bound(spec.comment_start_id, spec.comment_backfill, "_rc_max"),
    ).otherwise(bound(spec.submission_start_id, spec.submission_backfill, "_rs_max"))

    filtered = fd.filter(offset_pred)
    if needs_max:
        filtered = filtered.drop("_rc_max", "_rs_max")
    filtered = filtered.filter(spec.predicate())

    data = (
        json_key_subset(F.col("json"), list(spec.filter_keys))
        if spec.filter_keys
        else F.col("json")
    )
    out = filtered.select(
        "id",
        "event",
        data.alias("data"),
        "created_utc",
    ).withColumn(
        "frame", F.format_string("id: %s\nevent: %s\ndata: %s\n\n", "id", "event", "data")
    )
    # M2 — emission order (per-batch sort in streaming; global here)
    return out.orderBy("created_utc", "id").select("id", "event", "data", "frame")
