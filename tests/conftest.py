from __future__ import annotations

import duckdb
import pytest

from reddit_sse_stream_spark.session import get_spark
from reddit_sse_stream_spark.sources.tables import TABLES

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests")


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
