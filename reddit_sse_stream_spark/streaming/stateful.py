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


# --------------------------------------------------------------------------- #
# Streaming OHLC — the batch ts_ohlc_hourly aggregate as keyed managed state  #
# --------------------------------------------------------------------------- #

OHLC_OUTPUT_SCHEMA = (
    "bar_hour timestamp, open double, high double, low double, close double, "
    "n_events long, turnover_fp long"
)
OHLC_STATE_SCHEMA = (
    "open double, high double, low double, close double, n long, t_fp long, "
    "open_ts long, open_id long, close_ts long, close_id long"
)


def _update_ohlc(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """OHLC accumulator per hour bar.  open/close carry their (ts,
    event_id) anchor in state so LATE rows inside the bar still resolve
    first/last by the same total order the batch window uses — replaying
    the stream in any micro-batch split yields the batch answer exactly.
    The turnover sum accumulates in the fixed-point int64 domain
    (floor(v*1e6 + .5)), the `_dsum` convention, so it is
    order-independent too."""
    if state.exists:
        (o, h, l, c, n, t_fp, o_ts, o_id, c_ts, c_id) = state.get
    else:
        o = h = l = c = None
        n, t_fp = 0, 0
        o_ts = o_id = c_ts = c_id = None
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            ts_us = int(row.ts.value // 1000)  # pandas ns -> us
            v = float(row.value)
            n += 1
            t_fp += int(v * 1_000_000 + 0.5) if v >= 0 else -int(-v * 1_000_000 + 0.5)
            if h is None or v > h:
                h = v
            if l is None or v < l:
                l = v
            k = (ts_us, int(row.event_id))
            if o_ts is None or k < (o_ts, o_id):
                o, (o_ts, o_id) = v, k
            if c_ts is None or k > (c_ts, c_id):
                c, (c_ts, c_id) = v, k
    state.update((o, h, l, c, n, t_fp, o_ts, o_id, c_ts, c_id))
    yield pd.DataFrame(
        {
            "bar_hour": [pd.Timestamp(key[0])],
            "open": [o],
            "high": [h],
            "low": [l],
            "close": [c],
            "n_events": [n],
            "turnover_fp": [t_fp],
        }
    )


def streaming_ohlc_hourly(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``ts_ohlc_hourly`` catalog query:
    per-hour OHLC bars maintained as keyed managed state, update mode.

    The batch query needs a full-frame ordered window — inexpressible in
    streaming — so the first/last semantics move INTO state as
    (value, ts, event_id) anchors compared by the same total order.
    Batch/stream parity on a replayed feed is pinned by
    ``tests/test_streaming.py`` (any micro-batch split, same bars).

    Scale shape: one shuffle per micro-batch on the bar key; state is ten
    scalars per OPEN bar — O(active hours), independent of stream
    length; a production deployment adds a watermark-driven eviction of
    closed bars (timeoutConf) exactly like the sessionization entry."""
    from pyspark.sql import functions as F

    keyed = events_stream.select(
        F.date_trunc("hour", "ts").alias("bar_hour"), "ts", "event_id", "value"
    )
    return keyed.groupBy("bar_hour").applyInPandasWithState(
        _update_ohlc,
        outputStructType=OHLC_OUTPUT_SCHEMA,
        stateStructType=OHLC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
