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

from pyspark.sql import DataFrame, SparkSession, Window
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
    # (sse.py:126-129); batch form = id lower bounds per stream, with the
    # stream maxima computed in-plan (whole-frame window over a tiny
    # aggregate — no driver collect).
    whole = Window.partitionBy()
    rc_max = F.max(F.when(F.col("event") == "rc", F.col("id"))).over(whole)
    rs_max = F.max(F.when(F.col("event") == "rs", F.col("id"))).over(whole)

    def bound(start_id, backfill, ev_max):
        if start_id is not None:
            return F.col("id") >= F.lit(start_id)
        if backfill is not None:  # clamped at parse (sse.py:65)
            return F.col("id") > ev_max - F.lit(backfill)
        return F.lit(True)

    offset_pred = F.when(
        F.col("event") == "rc",
        bound(spec.comment_start_id, spec.comment_backfill, rc_max),
    ).otherwise(bound(spec.submission_start_id, spec.submission_backfill, rs_max))

    filtered = fd.withColumn("_keep", offset_pred).filter(F.col("_keep")).drop("_keep")
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
