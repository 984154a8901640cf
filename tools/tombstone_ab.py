"""Paired A/B arms for r13's streaming/ change (VERDICT r12 next #5:
"next streaming/ change must ship with a paired old/new run"): the
tombstone gate's same-seq tie fix — ``sort_values(["seq", "kind"])``
(tombstone always precedes a same-seq event) replacing
``sort_values("seq")`` (pandas' non-stable quicksort decided ties).

Arm A is the CURRENT kernel (imported from streaming/stateful.py, so it
tracks the shipped code); arm B reconstructs the r12 pre-fix gate
verbatim.  Both replay the identical pre-materialized tombstone+event
union (one parquet file per micro-batch, built once per process and
shared by both arms) through applyInPandasWithState and report an
events-per-second rate under the harness's expected key.

Run:
    python tools/e2e_variance.py --paired 5 \
        --a tools.tombstone_ab:arm_a --b tools.tombstone_ab:arm_b

Expected outcome: a NULL — the fix adds one secondary sort key over
per-key micro-batch frames (tens of rows), which should be invisible
next to the per-batch state-store exchange.  The paired protocol is the
point: the null is MEASURED, order-counterbalanced, in one session,
instead of asserted.
"""

from __future__ import annotations

import os
import tempfile
import time
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from reddit_sse_stream_spark.streaming.stateful import (
    TOMBSTONE_OUTPUT_SCHEMA,
    TOMBSTONE_STATE_SCHEMA,
    _tombstone_gate,
)

N_BATCHES = 8
_SRC_CACHE: dict[str, tuple[str, int, object]] = {}


def _r12_tombstone_gate(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """The r12 pre-fix gate, verbatim: single-key seq sort (same-seq
    ties left to pandas' non-stable quicksort)."""
    chunks = list(pdfs)
    rows = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    erased_at = int(state.get[0]) if state.exists else None
    out: list[int] = []
    if len(rows):
        rows = rows.sort_values("seq")
        for _, r in rows.iterrows():
            if r["kind"] == "erase":
                if erased_at is None:
                    erased_at = int(r["seq"])
            elif erased_at is None or int(r["seq"]) < erased_at:
                out.append(int(r["event_id"]))
    if erased_at is not None:
        state.update((erased_at,))
    yield pd.DataFrame(
        {"user_id": [int(key[0])] * len(out), "event_id": out}
    ).astype({"user_id": "int64", "event_id": "int64"})


def _source_dir(spark, sf_dir: str) -> tuple[str, int, object]:
    """Materialize the tombstone+event union as N_BATCHES seq-contiguous
    parquet files ONCE per (process, sf_dir); both arms replay the same
    bytes so the pairing is over code, not data layout."""
    if sf_dir in _SRC_CACHE:
        return _SRC_CACHE[sf_dir]
    from reddit_sse_stream_spark.operators.dedup import md5_hash60
    from reddit_sse_stream_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    n = ev.agg(F.max("event_id")).collect()[0][0]
    events = ev.select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.lit("event").alias("kind"),
        "event_id",
    )
    users = ev.select("user_id").distinct()
    h = md5_hash60(F.concat(F.lit("tomb:"), F.col("user_id").cast("string")))
    tombs = users.filter(F.pmod(h, F.lit(4)) == 0).select(
        "user_id",
        F.pmod(h, F.lit(n)).alias("seq"),
        F.lit("erase").alias("kind"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    union = events.unionAll(tombs)
    src = tempfile.mkdtemp(prefix="tomb_ab_")
    step = (n + 1) / N_BATCHES
    for i in range(N_BATCHES):
        union.filter(
            (F.col("seq") >= i * step) & (F.col("seq") < (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)
    n_rows = union.count()
    _SRC_CACHE[sf_dir] = (src, n_rows, union.schema)
    return _SRC_CACHE[sf_dir]


def _run(spark, sf_dir: str, gate) -> dict:
    src, n_rows, schema = _source_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    gated = stream.groupBy("user_id").applyInPandasWithState(
        gate,
        outputStructType=TOMBSTONE_OUTPUT_SCHEMA,
        stateStructType=TOMBSTONE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    t0 = time.monotonic()
    q = (
        gated.writeStream.format("noop")
        .option(
            "checkpointLocation",
            os.path.join(tempfile.mkdtemp(prefix="tomb_ab_ckpt_"), "cp"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    dt = time.monotonic() - t0
    return {"streaming_e2e_events_per_sec": round(n_rows / dt, 1)}


def arm_a(spark, sf_dir: str) -> dict:
    """Current build: (seq, kind) tie-pinned sort."""
    return _run(spark, sf_dir, _tombstone_gate)


def arm_b(spark, sf_dir: str) -> dict:
    """r12 build: seq-only sort (pre-fix)."""
    return _run(spark, sf_dir, _r12_tombstone_gate)
