"""Structured Streaming source for the reddit-shaped feed — the Spark-native
replacement for the reference's Redis polling loop (/root/reference/sse.py:
80-152), built on the Python Data Source API (Spark 4 ``pyspark.sql.
datasource``).

Offset model (SURVEY.md §2.1):

- The reference keeps one dense integer cursor per stream and reads the next
  contiguous window of ids each poll: 25 comments + 10 submissions
  (sse.py:101-102,146-152). Here each stream ('rc'/'rs') is its own source
  instance with offset ``{"id": <last_emitted>}`` over the shared event_id
  space; a poll advances the cursor by at most ``max_ids_per_batch``
  (the COM/SUB_BUFFER_SIZE analog — Kafka's maxOffsetsPerTrigger shape).
- S2 offset discovery: ``initialOffset`` resolves latest from parquet
  statistics (the reference GETs rc:max_id/rs:max_id, sse.py:88-98).
- S3 backfill: start at ``latest - min(N, 100000)`` (clamp, sse.py:65).
- S4 exact resume: ``start_id`` overrides the cursor to ``start_id - 1``
  (sse.py:126-129); mutual exclusion with backfill is validated by
  QuerySpec at the API layer (V1).
- S5 gap handling: the reference drops ids that appear late (at-most-once
  per id). A replayable file-backed source has no such holes; late data is
  instead handled downstream with ``withWatermark`` — documented deviation.

Each micro-batch partition reads the events parquet with a pyarrow
range+type filter (predicate pushdown at the row-group level), derives the
feed columns, and yields Arrow RecordBatches — executor-side, parallel, no
driver collect.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from reddit_sse_stream_spark.spec import MAX_BACKFILL

FEED_DDL = (
    "id long, event string, author string, subreddit string, domain string, "
    "over_18 boolean, is_self boolean, created_utc long, json string"
)

RC_TYPES = ("view", "click", "error")

#: reference buffer sizes (sse.py:101-102)
DEFAULT_BATCH = {"rc": 25, "rs": 10}

#: rows per InputPartition inside one micro-batch — on a cluster this is the
#: read-parallelism knob (35-row reference polls stay 1 partition; a 100k
#: backfill catch-up fans out across executors).
PARTITION_CHUNK = 10_000


class FeedPartition(InputPartition):
    def __init__(self, path: str, stream: str, start_id: int, end_id: int):
        self.path = path
        self.stream = stream
        self.start_id = start_id  # exclusive
        self.end_id = end_id  # inclusive


def _max_event_id(path: str) -> int:
    """S2 — offset discovery from parquet column statistics (no data scan)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    idx = pf.schema_arrow.get_field_index("event_id")
    best = -1
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        if st is not None and st.has_min_max:
            best = max(best, st.max)
    if best >= 0:
        return best
    # stats missing -> fall back to a single-column scan
    import pyarrow.compute as pc

    return pc.max(pf.read(columns=["event_id"])["event_id"]).as_py()


def _read_feed_batches(path: str, stream: str, start_id: int, end_id: int):
    """Derive feed rows for (start_id, end_id] of one stream as Arrow batches.

    The pyarrow dataset filter prunes row groups on event_id statistics —
    the vectorized analog of the reference's pipelined HGETALL window."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    type_pred = (
        ds.field("event_type").isin(list(RC_TYPES))
        if stream == "rc"
        else ~ds.field("event_type").isin(list(RC_TYPES))
    )
    tbl = dataset.to_table(
        filter=(ds.field("event_id") > start_id)
        & (ds.field("event_id") <= end_id)
        & type_pred
    )
    if tbl.num_rows == 0:
        return
    def _mod(arr, m: int):
        # pyarrow.compute lacks mod; truncating int divide == floor for >= 0
        return pc.subtract(arr, pc.multiply(pc.divide(arr, m), m))

    event_id = tbl["event_id"]
    user_id = tbl["user_id"]
    is_rs = stream == "rs"
    n = tbl.num_rows
    author = pc.binary_join_element_wise(
        pa.array(["u"] * n),
        pc.cast(_mod(user_id, 50), pa.string()),
        "",
    )
    if is_rs:
        domain = pc.binary_join_element_wise(
            pa.array(["dom"] * n),
            pc.cast(_mod(user_id, 7), pa.string()),
            pa.array([".example.com"] * n),
            "",
        )
        over_18 = pc.greater(tbl["value"], 100.0)
        is_self = pc.equal(_mod(event_id, 2), 0)
    else:
        domain = pa.nulls(n, pa.string())
        over_18 = pa.nulls(n, pa.bool_())
        is_self = pa.nulls(n, pa.bool_())
    # ts unit varies across testdata generations (ns in early rounds, us
    # now): int-div by the unit's ticks-per-second -> epoch seconds
    _ticks = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}
    created_utc = pc.divide(
        pc.cast(tbl["ts"], pa.int64()), _ticks[tbl["ts"].type.unit]
    )
    out = pa.table(
        {
            "id": event_id,
            "event": pa.array([stream] * n),
            "author": author,
            "subreddit": tbl["event_type"],
            "domain": domain,
            "over_18": over_18,
            "is_self": is_self,
            "created_utc": created_utc,
            "json": tbl["props"],
        }
    )
    yield from out.to_batches(max_chunksize=8192)


class FeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("option 'path' (events parquet) is required")
        self.stream = options.get("stream", "rc")
        if self.stream not in ("rc", "rs"):
            raise ValueError("option 'stream' must be 'rc' or 'rs'")
        self.batch_size = int(options.get("max_ids_per_batch", DEFAULT_BATCH[self.stream]))
        self.backfill = options.get("backfill")
        self.start_id = options.get("start_id")
        if self.backfill is not None and self.start_id is not None:
            raise ValueError("backfill and start_id are mutually exclusive")  # V1
        self._last: int | None = None  # cursor base for per-trigger capping
        #: committed floor, set only when a regressed offset window is
        #: detected (partitions() called with end < start); clamps later
        #: windows so delivered ids are never re-emitted
        self._floor: int | None = None

    def initialOffset(self) -> dict:
        latest = _max_event_id(self.path)
        if self.start_id is not None:
            base = int(self.start_id) - 1  # S4 (sse.py:126-129)
        elif self.backfill is not None:
            n = min(int(self.backfill), MAX_BACKFILL)  # S3 clamp (sse.py:65)
            base = max(latest - n, -1)
        else:
            base = latest
        # Seed the per-trigger cap base (only once — Spark may call
        # initialOffset() again mid-query, and re-seeding would move the cap
        # base backward and re-emit committed ranges).  latestOffset() can
        # then treat "_last is None" as restart-from-checkpoint, where
        # offsets come from the log and initialOffset() is never called.
        if self._last is None:
            self._last = base
        return {"id": base}

    def latestOffset(self) -> dict:
        # S6 — cap per-trigger advance at the buffer size, the reference's
        # fixed poll window (maxOffsetsPerTrigger-style backpressure).
        #
        # Restart caveat: after recovery from a fully-committed checkpoint
        # this instance is fresh (_last is None) and Spark calls
        # latestOffset() BEFORE partitions()/commit() can fold the committed
        # offset in, so the ramp re-seeds from initialOffset() — for a
        # backfill reader that base sits behind the committed offset and the
        # returned end can regress.  Correctness is preserved by the
        # _emitted_max monotonic floor in partitions(): the authoritative
        # batch start from the offset log folds into _last there, and a
        # regressed window is clamped empty instead of re-reading ids.
        latest = _max_event_id(self.path)
        if self._last is None:
            self._last = self.initialOffset()["id"]
        nxt = max(min(latest, self._last + self.batch_size), self._last)
        self._last = nxt
        return {"id": nxt}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Restart resume: after recovery from a checkpoint the cap base
        # (_last) is fresh while `start` carries the committed offset — fold
        # it in so the next latestOffset() continues from the checkpoint
        # instead of replaying the cap ramp from initialOffset.
        if self._last is None or start["id"] > self._last:
            self._last = start["id"]
        lo, hi = start["id"], end["id"]
        if hi < lo:
            # Regressed window: `start` is the committed offset restored
            # from the log, `end` came from a latestOffset() ramp re-seeded
            # below it after restart.  Remember the committed floor — the
            # NEXT batch's log start will be the regressed end, and without
            # the clamp it would re-read (= re-emit) ids up to here.  For a
            # normal batch (hi >= lo) partitions() stays a pure function of
            # (start, end), which replay of a pending batch depends on.
            self._floor = max(self._floor or lo, lo)
            return [FeedPartition(self.path, self.stream, lo, lo)]
        if self._floor is not None:
            lo = max(lo, self._floor)
        if hi <= lo:
            return [FeedPartition(self.path, self.stream, lo, lo)]
        chunks = []
        cur = lo
        while cur < hi:
            nxt = min(cur + PARTITION_CHUNK, hi)
            chunks.append(FeedPartition(self.path, self.stream, cur, nxt))
            cur = nxt
        return chunks

    def read(self, partition: FeedPartition) -> Iterator:
        yield from _read_feed_batches(
            partition.path, partition.stream, partition.start_id, partition.end_id
        )

    def commit(self, end: dict) -> None:
        # also folds the committed offset into the cap base (restart safety)
        if self._last is None or end["id"] > self._last:
            self._last = end["id"]


class RedditFeedDataSource(DataSource):
    """``spark.readStream.format("reddit_feed")`` after
    ``spark.dataSource.register(RedditFeedDataSource)``.

    Options: path (required), stream ('rc'|'rs'), max_ids_per_batch,
    backfill, start_id.
    """

    @classmethod
    def name(cls) -> str:
        return "reddit_feed"

    def schema(self) -> str:
        return FEED_DDL

    def streamReader(self, schema) -> FeedStreamReader:
        return FeedStreamReader(self.options)


def read_feed_stream(spark, path: str, stream: str = "rc", **options):
    """Convenience: register + readStream one feed stream."""
    spark.dataSource.register(RedditFeedDataSource)
    reader = (
        spark.readStream.format("reddit_feed")
        .option("path", path)
        .option("stream", stream)
    )
    for k, v in options.items():
        if v is not None:
            reader = reader.option(k, str(v))
    return reader.load()


def serialize_offset(offset: dict) -> str:
    return json.dumps(offset)
