"""Zero-cost pipeline counters via ``df.observe`` — the Spark-native home
for the reference's A1/A2 running totals (SURVEY.md §2.5): metrics ride the
existing plan as accumulators instead of a second aggregation pass.

Batch: metrics surface through the observation object after an action.
Streaming: they appear in every ``StreamingQueryProgress.observedMetrics``
(pull them in a ``StreamingQueryListener`` or from ``lastProgress``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _frame_len() -> F.Column:
    # SSE frame length (X5/X6; sse.py:239-240)
    return F.length(
        F.format_string("id: %s\nevent: %s\ndata: %s\n\n", "id", "event", "json")
    )


def observed_feed_counters(
    feed: DataFrame, name: str = "feed_stats"
) -> tuple[DataFrame, Observation | None]:
    """Attach tcs/tss/tbs counters to a feed plan.

    Returns (df, observation). For batch DataFrames the Observation object
    yields ``.get`` after an action; for streaming DataFrames Spark forbids
    Observation instances, so metrics are registered by name and read from
    query progress (observation returned as None).
    """
    metrics = (
        F.count(F.when(F.col("event") == "rc", 1)).alias("tcs"),
        F.count(F.when(F.col("event") == "rs", 1)).alias("tss"),
        F.sum(_frame_len()).alias("tbs"),
    )
    if feed.isStreaming:
        return feed.observe(name, *metrics), None
    obs = Observation(name)
    return feed.observe(obs, *metrics), obs
