"""Reddit-shaped feed derived deterministically from the ``events`` table.

The reference engine consumes two append-only streams of flat records with
denormalized filter columns (``/root/reference/sse.py:163-200``):

    id, event ('rc'|'rs'), author, subreddit, domain (rs only),
    over_18 (rs only), is_self (rs only), created_utc, json

The driver testdata has no Reddit dump, so this module derives a feed with
exactly that shape from ``events.parquet``, **identically in PySpark and in
ANSI SQL** (the DuckDB oracle). Every reference operator (filters F1-F8,
quirks Q1-Q4, merge M1-M2, counters A1-A3, offsets S1-S5 — SURVEY.md §2) is
then exercised against this feed with a hash-checked oracle.

Derivation rules (fixed; both backends MUST stay in lockstep):

- ``id``          = event_id                       (dense monotonic id, sse.py:146-147)
- ``event``       = 'rc' if event_type in (view, click, error) else 'rs'
- ``author``      = 'u' || (user_id % 50)
- ``subreddit``   = event_type
- ``domain``      = 'dom' || (user_id % 7) || '.example.com'   (rs only, else NULL; sse.py:198)
- ``over_18``     = value > 100                    (rs only, else NULL; sse.py:199)
- ``is_self``     = event_id % 2 = 0               (rs only, else NULL; sse.py:200)
- ``created_utc`` = floor(epoch seconds of ts) as BIGINT        (sse.py:165)
- ``json``        = props                          (opaque payload, sse.py:164)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_sse_stream_spark.sources import tables as _tables

#: event_type values mapped to the comment stream ('rc'); the rest are 'rs'.
RC_TYPES = ("view", "click", "error")

#: DuckDB/ANSI CTE computing the same feed. Embed as f"WITH {FEED_CTE} SELECT ...".
FEED_CTE = """feed AS (
  SELECT
    event_id AS id,
    CASE WHEN event_type IN ('view','click','error') THEN 'rc' ELSE 'rs' END AS event,
    'u' || CAST(user_id % 50 AS VARCHAR) AS author,
    event_type AS subreddit,
    CASE WHEN event_type NOT IN ('view','click','error')
         THEN 'dom' || CAST(user_id % 7 AS VARCHAR) || '.example.com' END AS domain,
    CASE WHEN event_type NOT IN ('view','click','error') THEN value > 100 END AS over_18,
    CASE WHEN event_type NOT IN ('view','click','error') THEN event_id % 2 = 0 END AS is_self,
    CAST(floor(epoch(ts)) AS BIGINT) AS created_utc,
    props AS json
  FROM events
)"""


def feed_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PySpark twin of :data:`FEED_CTE` over ``{sf_dir}/events.parquet``.

    Pure Column expressions — stays inside whole-stage codegen, and Catalyst
    still pushes any downstream predicate on event_id/ts/event_type into the
    parquet scan because the derivation is deterministic per-row.
    """
    return feed_from_events(_tables.load_table(spark, sf_dir, "events"))


def feed_from_events(ev: DataFrame) -> DataFrame:
    """The feed derivation applied to an ARBITRARY events frame — the
    same Column expressions :func:`feed_df` uses on the loaded table,
    exposed so audits (e.g. the erasure-propagation row) can rebuild the
    derived surface from a filtered base without duplicating the
    derivation."""
    is_rc = F.col("event_type").isin(*RC_TYPES)
    rs_only = lambda c: F.when(~is_rc, c)  # noqa: E731
    return ev.select(
        F.col("event_id").alias("id"),
        F.when(is_rc, F.lit("rc")).otherwise(F.lit("rs")).alias("event"),
        F.concat(F.lit("u"), (F.col("user_id") % 50).cast("string")).alias("author"),
        F.col("event_type").alias("subreddit"),
        rs_only(
            F.concat(F.lit("dom"), (F.col("user_id") % 7).cast("string"), F.lit(".example.com"))
        ).alias("domain"),
        rs_only(F.col("value") > 100).alias("over_18"),
        rs_only(F.col("event_id") % 2 == 0).alias("is_self"),
        F.unix_timestamp("ts").alias("created_utc"),
        F.col("props").alias("json"),
    )
