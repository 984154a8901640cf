"""Table-loader robustness across testdata generations.

The driver has shipped events.parquet with TIMESTAMP(NANOS) (rounds 1-3)
and timestamp[us] without a timezone (round 4+).  ``load_table`` must
normalize BOTH to a plain TIMESTAMP column with identical values, and the
streaming source's epoch-seconds derivation must divide by the unit's
actual ticks-per-second instead of assuming nanos.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from reddit_sse_stream_spark.sources.tables import load_table

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 1, 1, 12, 34, 56, 789000),
]


def _write_events(tmp_path, unit: str) -> str:
    d = tmp_path / f"gen_{unit}"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k":1}', '{"k":2}']),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_load_table_normalizes_timestamp_units(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"{unit}: expected plain TIMESTAMP, got {df.schema['ts'].dataType}"
    )
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == TS
    # epoch casts (the operation TIMESTAMP_NTZ forbids) must work
    secs = sorted(
        r[0] for r in df.selectExpr("CAST(ts AS LONG)").collect()
    )
    assert secs == [int(t.replace(tzinfo=dt.timezone.utc).timestamp()) for t in TS]


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_reader_created_utc_per_unit(tmp_path, unit):
    """The streaming source's pyarrow read path must derive created_utc by
    the parquet timestamp unit's ticks-per-second, not assume nanos (the
    round-4 testdata regeneration switched ns -> us)."""
    from reddit_sse_stream_spark.streaming.source import _read_feed_batches

    sf_dir = _write_events(tmp_path, unit)
    rows = [
        r
        for b in _read_feed_batches(f"{sf_dir}/events.parquet", "rc", 0, 10)
        for r in b.to_pylist()
    ]
    want = {
        i + 1: int(t.replace(tzinfo=dt.timezone.utc).timestamp())
        for i, t in enumerate(TS)
    }
    assert {r["id"]: r["created_utc"] for r in rows} == want


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_source_epoch_seconds_per_unit(spark, tmp_path, unit):
    from pyspark.sql import functions as F

    from reddit_sse_stream_spark.sources.feed import feed_df

    sf_dir = _write_events(tmp_path, unit)
    rows = (
        feed_df(spark, sf_dir)
        .filter(F.col("event") == "rc")
        .select("id", "created_utc")
        .collect()
    )
    want = {
        i + 1: int(t.replace(tzinfo=dt.timezone.utc).timestamp())
        for i, t in enumerate(TS)
    }
    assert {r["id"]: r["created_utc"] for r in rows} == want
