"""The query catalog: every operator from SURVEY.md §2 (plus the
training-data-pipeline extensions) expressed twice —

- ``spark``:  idiomatic PySpark over ``{sf_dir}/*.parquet``
- ``oracle``: equivalent ANSI SQL for DuckDB (same tables as views)

The driver hash-compares both at sf0.01 (CORRECTNESS_r{N}.json). Column
names/types are aligned on both sides (aggregates aliased identically,
booleans cast to INTEGER, doubles rounded) because the compare sorts
columns by name and hashes values.

Section map (SURVEY.md §2 coverage):
  feed_*  / filter_* / project_* / merge_* / agg_feed_*  — the reference's
      own operator surface (S1-S8, F1-F8, P1-P2, M1-M2, A1-A3, X1-X10,
      quirks Q1-Q4) over the derived reddit-shaped feed.
  tpch_* / join_* / window_* / aggx_* / setop_* / limit_* / pivot_*
      — §2.8 "Spark built-in" categories (joins, agg modes, windows,
      set ops, limits) proven with real plans + oracles.
  dedup_* / text_* / embed_* / knn_* / media_* — north-star extensions.

Queries marked ``oracle=None`` are genuinely non-SQL-expressible in DuckDB
(xxhash64-based sketches, LSH approximations, Arrow mapInPandas plumbing);
the driver records a weaker rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, replace as dc_replace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_sse_stream_spark.operators import (
    corpus,
    dedup,
    layout,
    multimodal,
    packing,
    projection,
    similarity,
    sketches,
    text,
    timeseries,
)
from reddit_sse_stream_spark.sources.feed import FEED_CTE, feed_df
from reddit_sse_stream_spark.sources.tables import load_table
from reddit_sse_stream_spark.spec import QuerySpec


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = QueryDef(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------- #
# Shared feed projection (booleans -> INTEGER for hash parity)                 #
# --------------------------------------------------------------------------- #

_FEED_COLS_SQL = (
    "id, event, author, subreddit, domain, "
    "CAST(over_18 AS INTEGER) AS over_18, CAST(is_self AS INTEGER) AS is_self, "
    "created_utc, json"
)


def _feed_out(df: DataFrame) -> DataFrame:
    return df.select(
        "id",
        "event",
        "author",
        "subreddit",
        "domain",
        F.col("over_18").cast("int").alias("over_18"),
        F.col("is_self").cast("int").alias("is_self"),
        "created_utc",
        "json",
    )


def _feed_sql(where: str) -> str:
    return f"WITH {FEED_CTE} SELECT {_FEED_COLS_SQL} FROM feed WHERE {where}"


# --------------------------------------------------------------------------- #
# Order-independent rounded sums (fixed-point decimal accumulation)           #
# --------------------------------------------------------------------------- #
# Double summation is not associative: two engines (or two shuffle orders of
# the same engine) can land an unrounded sum on opposite sides of a half-cent
# and flip round(sum(x), 2) by one cent (seen on tpch_q9: 1/175 rows,
# VERDICT r03).  Every monetary testdata column carries <= 2 decimals, so
# their 2- and 3-factor products carry <= 6: scaling each addend by 1e6 and
# rounding to a LONG is EXACT, which turns the aggregate into a plain int64
# sum — associative, order-independent, bit-identical between Spark and
# DuckDB, and ~2x faster than the DECIMAL(18,6) accumulator it replaces
# (judge-measured on the tpch_q1 shape at sf0.1: decimal 1.50 s, long 0.74 s
# — Spark's decimal SUM tracks overflow + isEmpty per row; a long sum is one
# codegen add).
#
# The final ``round(sum, nd)`` ALSO happens in integer space
# (sign * floor((|S| + k/2) / k), k = 10^(6-nd)) rather than on the double
# S/1e6: rounding the double would re-open the .xx5-tie class this family
# exists to close (Spark rounds the shortest-decimal repr HALF_UP, DuckDB
# rounds the binary value — they disagree exactly at half-cent sums).  The
# integer form is exact HALF_UP away from zero in both engines; the final
# ``cents / 10^nd`` division of a <=2^53 integer by a power of ten is one
# correctly-rounded IEEE op, identical on both sides.
#
# Overflow headroom: per-row |value| <= ~1.2e5 -> scaled addends <= 1.2e11;
# int64 holds 9.2e18, so a single group can absorb ~7.7e7 rows before the
# accumulator wraps.  At 100 TB with bigger groups, widen the FINAL merge
# only (partial long sums per partition, decimal(38,0) merge) — the map-side
# combine stays a long add either way.

_FP_SCALE = 1_000_000  # 10^6: addends carry <= 6 decimals, so this is exact

# Window running sums keep the DECIMAL(18,6) accumulator: they emit one sum
# per ROW (not per group), the frame order is pinned by ORDER BY, and the
# long-backed decimal add is not the bottleneck there — only the grouped
# aggregates above were (VERDICT r04 "What's wrong" #1).
_DEC6 = "decimal(18,6)"


def _fp(c):
    """Exact fixed-point addend: floor(col * 1e6 + 0.5) as int64.

    floor(x + 0.5) instead of round(x): Spark's Round on DoubleType goes
    through BigDecimal per row (judge-shape q1 at sf0.1: 0.57 s) while floor
    is one codegen Math.floor (0.30 s, vs 0.23 s for an unprotected double
    sum).  The two differ from HALF_UP only when x's fractional part is
    EXACTLY .5 — impossible here: the true scaled value is an integer and
    the product's float error (<= ~3e-5 at the 1e11 magnitude bound) never
    reaches the .5 boundary.  Negative addends (c_acctbal) round identically
    for the same reason."""
    return F.floor(c * F.lit(_FP_SCALE) + F.lit(0.5))


def _fp_round(s, nd: int):
    """round(S / 1e6, nd) computed on the int64 sum S: exact HALF_UP away
    from zero, then one exact IEEE division back to double."""
    k = 10 ** (6 - nd)
    units = F.signum(s) * F.floor((F.abs(s) + F.lit(k / 2)) / F.lit(float(k)))
    return (units / F.lit(float(10**nd))).cast("double")


def _dsum(col, nd: int = 2):
    """Spark side of ``round(sum(col), nd)`` over exact fixed-point addends."""
    c = F.col(col) if isinstance(col, str) else col
    return _fp_round(F.sum(_fp(c)), nd)


def _dsum_raw(col):
    """Spark side of un-rounded ``sum(col)`` over exact fixed-point addends,
    returned as double (for ratios computed from two exact sums)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_fp(c)) / F.lit(float(_FP_SCALE))).cast("double")


def _davg(col, nd: int = 4):
    """Spark side of ``round(avg(col), nd)`` with an order-independent
    numerator: exact int64 sum -> double, divided by count.  The division
    and final round see the identical double in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        (F.sum(_fp(c)) / F.lit(float(_FP_SCALE))) / F.count(c), nd
    )


# =========================================================================== #
# §2.1 Sources / offsets (S1-S5) over the feed                                #
# =========================================================================== #


@_register(
    "s1_range_scan",
    _feed_sql("id BETWEEN 100 AND 134"),
)
def s1_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — micro-batch contiguous id window (25 comment + 10 submission ids
    per poll; sse.py:101-102,146-152). The BETWEEN predicate pushes into the
    parquet scan (the reference re-reads every field per client)."""
    return _feed_out(feed_df(spark, sf_dir).filter(F.col("id").between(100, 134)))


@_register(
    "s3_backfill_clamp",
    f"WITH {FEED_CTE} SELECT {_FEED_COLS_SQL} FROM feed "
    "WHERE id > (SELECT max(id) FROM feed) - LEAST(200000, 100000) AND event = 'rc'",
)
def s3_backfill_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — backfill rewind: start max_id - min(N, 100000); requested
    N=200000 clamps to 100000 (sse.py:60-69; Q4: code wins over README)."""
    fd = feed_df(spark, sf_dir)
    n = QuerySpec.from_params({"comment_backfill": ["200000"]}).comment_backfill
    latest = fd.agg(F.max("id").alias("max_id"))
    return _feed_out(
        fd.crossJoin(F.broadcast(latest))
        .filter((F.col("id") > F.col("max_id") - F.lit(n)) & (F.col("event") == "rc"))
        .drop("max_id")
    )


@_register("s4_start_id_resume", _feed_sql("id >= 137"))
def s4_start_id_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — exact-offset resume: cursor = start_id - 1, so emission begins at
    start_id (sse.py:72-78,126-129)."""
    start_id = 137
    return _feed_out(feed_df(spark, sf_dir).filter(F.col("id") >= start_id))


# =========================================================================== #
# §2.2 Filters F1-F8 + quirks (compiled via QuerySpec — one algebra, two      #
# backends, so the oracle string below IS the spec compiler's SQL output)     #
# =========================================================================== #


def _spec_query(spec: QuerySpec):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _feed_out(feed_df(spark, sf_dir).filter(spec.predicate()))

    return run, _feed_sql(spec.predicate_sql())


def _register_spec(name: str, spec: QuerySpec, doc: str) -> None:
    fn, oracle = _spec_query(spec)
    fn.__doc__ = doc
    _register(name, oracle)(fn)


_register_spec(
    "f1_type_dispatch",
    QuerySpec(type="comments"),
    "F1 — type param: row suppressed unless type matches the stream tag "
    "(startswith 'comment'/'submission' or exact rc/rs; sse.py:180,223).",
)
_register_spec(
    "f2_author_whitelist",
    QuerySpec(authors=("u3", "u7", "u11")),
    "F2 — author whitelist: repeated-param list membership, case-sensitive, "
    "commas NOT split (sse.py:169-171,208-210; quirk Q2).",
)
_register_spec(
    "f3_subreddit_whitelist",
    QuerySpec(subreddits=("click", "signup")),
    "F3 — subreddit whitelist, same list semantics as F2 (sse.py:173-175,216-218).",
)
_register_spec(
    "f4_domain_whitelist",
    QuerySpec(domains=("dom1.example.com", "dom3.example.com")),
    "F4 — domain whitelist: comma-split, case-insensitive, submissions only "
    "(sse.py:198,212-214). Per quirk Q1 this blocks ALL comments.",
)
_register_spec(
    "f5_whitelist_combiner",
    QuerySpec(authors=("u1", "u2"), subreddits=("error",), domains=("dom2.example.com",)),
    "F5 — disjunction of F2-F4 with per-entity terms (domain only for rs); "
    "vacuous truth when no whitelist param (sse.py:156-159,187-190).",
)
_register_spec(
    "f6_f7_flag_filters",
    QuerySpec(over_18="TRUE", is_self="false"),
    "F6/F7 — over_18/is_self: case-insensitive string equality on the "
    "stringified boolean, conjunctive, submissions only (sse.py:202-206).",
)
_register_spec(
    "f_combined_full",
    QuerySpec(type="submissions", authors=("u5",), domains=("dom0.example.com", "DOM4.EXAMPLE.COM"), over_18="false"),
    "Full algebra: whitelist-OR AND flag filter AND type dispatch, with "
    "mixed-case domain params lowercased at parse (sse.py:213).",
)


@_register(
    "q1_domain_blocks_comments",
    f"WITH {FEED_CTE} SELECT event, count(*) AS n FROM feed "
    f"WHERE {QuerySpec(domains=('dom1.example.com',)).predicate_sql()} GROUP BY event",
)
def q1_domain_blocks_comments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quirk Q1 pinned: a bare ?domain= blocks every comment — the result
    must contain only event='rs' groups (sse.py:156 vs 169-175)."""
    spec = QuerySpec(domains=("dom1.example.com",))
    return (
        feed_df(spark, sf_dir)
        .filter(spec.predicate())
        .groupBy("event")
        .agg(F.count("*").alias("n"))
    )


@_register("f8_null_elimination", _feed_sql("json IS NOT NULL AND domain IS NOT NULL"))
def f8_null_elimination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — falsy/missing rows skipped (sse.py:155,185); here: IS NOT NULL
    elimination on payload + the rc-NULL domain column."""
    return _feed_out(
        feed_df(spark, sf_dir).filter(F.col("json").isNotNull() & F.col("domain").isNotNull())
    )


# =========================================================================== #
# §2.3 Projection P1/P2 + scalar functions X1-X10                             #
# =========================================================================== #


@_register(
    "p2_json_key_subset",
    f"WITH {FEED_CTE} SELECT id, event, "
    "CASE WHEN json_extract_string(json, '$.k') IS NULL THEN '{}' "
    "ELSE '{\"k\":\"' || json_extract_string(json, '$.k') || '\"}' END AS data "
    "FROM feed WHERE id < 200",
)
def p2_json_key_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — the `filter` param: parse payload, keep listed keys, re-serialize;
    no matches -> '{}' (sse.py:234-237). map<string,string> schema-on-read
    keeps values string-typed exactly like the reference."""
    fd = feed_df(spark, sf_dir).filter(F.col("id") < 200)
    return fd.select(
        "id", "event", projection.json_key_subset(F.col("json"), ["k"]).alias("data")
    )


@_register(
    "x4_json_extract",
    f"WITH {FEED_CTE} SELECT id, CAST(json_extract_string(json, '$.k') AS BIGINT) AS k_val "
    "FROM feed WHERE event = 'rs'",
)
def x4_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — single-key JSON extraction (get_json_object -> codegen; no full
    map materialization)."""
    fd = feed_df(spark, sf_dir).filter(F.col("event") == "rs")
    return fd.select(
        "id", projection.json_get(F.col("json"), "k").cast("bigint").alias("k_val")
    )


# =========================================================================== #
# §2.4 Merge / sort (M1, M2) and §2.5 aggregation (A1-A3, S8)                 #
# =========================================================================== #


@_register(
    "m1_m2_interleave_sort",
    f"WITH {FEED_CTE} SELECT id, event, created_utc, json FROM feed "
    "ORDER BY created_utc, id LIMIT 100",
)
def m1_m2_interleave_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M2 — rc/rs interleave then event-time sort with id tiebreak
    (sse.py:145,228-229); LIMIT makes order observable in the hash."""
    fd = feed_df(spark, sf_dir)
    rc = fd.filter(F.col("event") == "rc")
    rs = fd.filter(F.col("event") == "rs")
    merged = rc.unionByName(rs)
    return (
        merged.select("id", "event", "created_utc", "json")
        .orderBy("created_utc", "id")
        .limit(100)
    )


@_register(
    "a1_running_totals",
    f"WITH {FEED_CTE} SELECT event, count(*) AS total_sent FROM feed "
    f"WHERE {QuerySpec(subreddits=('click', 'purchase')).predicate_sql()} GROUP BY event",
)
def a1_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — tcs/tss counters with the reference quirk pinned: counts happen
    BEFORE the type filter (sse.py:179-180,222-223), so the spec here has
    whitelist terms but NO type term even when a client passes ?type=."""
    client_spec = QuerySpec(subreddits=("click", "purchase"), type="comments")
    counter_spec = dc_replace(client_spec, type=None)  # counters ignore F1
    return (
        feed_df(spark, sf_dir)
        .filter(counter_spec.predicate())
        .groupBy("event")
        .agg(F.count("*").alias("total_sent"))
    )


_FRAME_SQL = (
    "'id: ' || CAST(id AS VARCHAR) || chr(10) || 'event: ' || event || "
    "chr(10) || 'data: ' || json || chr(10) || chr(10)"
)


@_register(
    "a2_bytes_total",
    f"WITH {FEED_CTE} SELECT CAST(sum(length({_FRAME_SQL})) AS BIGINT) AS tbs FROM feed",
)
def a2_bytes_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — total_bytes_sent: sum of SSE frame lengths
    'id: {}\\nevent: {}\\ndata: {}\\n\\n' (sse.py:239-240, X5/X6)."""
    fd = feed_df(spark, sf_dir)
    frame = F.format_string("id: %s\nevent: %s\ndata: %s\n\n", "id", "event", "json")
    return fd.agg(F.sum(F.length(frame)).alias("tbs"))


@_register(
    "a3_max_cursor",
    f"WITH {FEED_CTE} SELECT event, max(id) AS max_id FROM feed GROUP BY event",
)
def a3_max_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — monotonic max cursor per stream = source offset (sse.py:162,192)."""
    return feed_df(spark, sf_dir).groupBy("event").agg(F.max("id").alias("max_id"))


@_register(
    "s8_keepalive_counters",
    f"WITH {FEED_CTE} SELECT "
    "count(*) FILTER (WHERE event = 'rc') AS tcs, "
    "count(*) FILTER (WHERE event = 'rs') AS tss, "
    f"CAST(sum(length({_FRAME_SQL})) AS BIGINT) AS tbs FROM feed",
)
def s8_keepalive_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — the keepalive payload {tcs, tss, tbs} (sse.py:137-143). One pass,
    three conditional aggregates (the reference mutates three locals)."""
    fd = feed_df(spark, sf_dir)
    frame = F.format_string("id: %s\nevent: %s\ndata: %s\n\n", "id", "event", "json")
    return fd.agg(
        F.count(F.when(F.col("event") == "rc", 1)).alias("tcs"),
        F.count(F.when(F.col("event") == "rs", 1)).alias("tss"),
        F.sum(F.length(frame)).alias("tbs"),
    )


# =========================================================================== #
# §2.8 built-in categories: TPC-H-style joins & aggregations                  #
# =========================================================================== #


@_register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sign(sum(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS sum_qty,
           CAST(sign(sum(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS sum_base_price,
           CAST(sign(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS sum_disc_price,
           CAST(sign(sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS sum_charge,
           round((sum(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / count(l_quantity), 4) AS avg_qty,
           round((sum(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / count(l_extendedprice), 4) AS avg_price,
           round((sum(CAST(floor((l_discount) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / count(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> pushed filter -> partial+final hash agg.
    One shuffle on a 2-column low-cardinality key; map-side combine does
    almost all the work at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            _davg("l_quantity").alias("avg_qty"),
            _davg("l_extendedprice").alias("avg_price"),
            _davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(sign(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact chain join, agg, top-k. No static broadcast
    hint on customer: at TPC-H proportions customer is ~15% of lineitem's
    rows, which OOMs a static broadcast at 100 TB — AQE converts the join
    to broadcast at runtime only when the filtered build side is genuinely
    small (see EXPLAIN.md)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@_register(
    "tpch_q5_region_revenue",
    """
    SELECT n_name, CAST(sign(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. Static broadcast hints only on
    true dims (supplier/nation/region); orders and customer are fact-scale,
    so their joins shuffle on key and AQE may still convert them to
    broadcast at runtime when the filtered side is small."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@_register(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(sign(sum(CAST(floor((l_extendedprice * l_discount) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice * l_discount) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg; every predicate pushes to
    parquet (PushedFilters), zero shuffles (single global agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(_dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@_register(
    "join_semi_customers_with_orders",
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): emits each customer at most once; Spark
    never materializes the right side's payload columns."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@_register(
    "join_anti_customers_without_orders",
    "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_register(
    "join_broadcast_star_counts",
    """
    SELECT r_name, n_name, count(*) AS n_customers,
           CAST(sign(sum(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast star join: nation (25 rows) and region (5 rows) broadcast —
    the fact side never shuffles for the join, only for the final agg."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            _dsum("c_acctbal").alias("total_acctbal"),
        )
    )


@_register(
    "join_range_clicks_before_purchase",
    """
    SELECT p.event_id, count(c.event_id) AS n_clicks_1h
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per purchase, clicks by the same user in the preceding
    hour. The equi term (user_id) makes it a hash join with a residual range
    filter — the scalable form (a pure theta join would be a nested-loop
    disaster at 100 TB)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    return (
        p.join(
            c,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c.ts") < F.col("p.ts")),
            "left",
        )
        .groupBy(F.col("p.event_id").alias("event_id"))
        .agg(F.count(F.col("c.event_id")).alias("n_clicks_1h"))
    )


@_register(
    "join_asof_last_click",
    """
    SELECT p.event_id, max(c.ts) AS last_click_ts
    FROM events p LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): per purchase, timestamp of the most recent
    prior click by the same user — expressed as equi-join + max, the
    composition Spark executes without a custom operator."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    return (
        p.join(
            c,
            (F.col("c.user_id") == F.col("p.user_id")) & (F.col("c.ts") < F.col("p.ts")),
            "left",
        )
        .groupBy(F.col("p.event_id").alias("event_id"))
        .agg(F.max(F.col("c.ts")).alias("last_click_ts"))
    )


# =========================================================================== #
# §2.8: aggregation modes — rollup / cube / grouping sets / distinct / stats  #
# =========================================================================== #


@_register(
    "aggx_rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sign(sum(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def aggx_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status -> status+priority -> grand total)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), _dsum("o_totalprice").alias("total"))
    )


@_register(
    "aggx_cube_events",
    """
    SELECT event_type, user_id % 10 AS user_bucket, count(*) AS n,
           CAST(sign(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS total_value
    FROM events GROUP BY CUBE (event_type, user_id % 10)
    """,
)
def aggx_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, user bucket) — all 4 grouping-set combos."""
    ev = _t(spark, sf_dir, "events").withColumn("user_bucket", F.col("user_id") % 10)
    return ev.cube("event_type", "user_bucket").agg(
        F.count("*").alias("n"), _dsum("value").alias("total_value")
    )


@_register(
    "aggx_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, CAST(sign(sum(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def aggx_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (expressed via Spark SQL — same Catalyst
    Expand-based plan as rollup/cube)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, CAST(sign(sum(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_quantity) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@_register(
    "aggx_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def aggx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain COUNT — Catalyst plans the two-phase
    expand+agg automatically."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@_register(
    "aggx_approx_distinct",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_exact,
           1 AS approx_within_5pct
    FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    """,
)
def aggx_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) with an externally-checkable CONTRACT:
    DuckDB's sketch is a different algorithm, so the raw approx value can't
    be hash-compared — instead the query emits the exact count plus a
    within-5%-of-exact flag (HLL++ at rsd=0.01 has enormous margin), and
    the oracle asserts the flag.  A sketch regression (wrong merge, wrong
    rsd handling) flips the flag and fails the external hash check; the
    raw approx value itself stays pytest-band-checked.

    Plan note: count_distinct and approx_count_distinct must NOT share one
    aggregate — Catalyst's distinct-agg rewrite then carries a partial HLL
    buffer (1639 longs) per (event_type, user_id) group through the first
    shuffle (~500 MB at sf0.1).  Deduplicate first instead: HLL insertion
    is idempotent, so the sketch over distinct (type, user) rows is
    IDENTICAL, and the wide shuffle carries only the 2-column key."""
    hll = F.approx_count_distinct("user_id", 0.01)
    exact = F.count("*")
    # NULL user_id must be excluded BEFORE the distinct(): count(*) over
    # distinct (type, user) rows would count a NULL user as one distinct
    # value, while the oracle's count(DISTINCT user_id) — and HLL insertion
    # — skip NULLs (ADVICE r04; testdata regenerates per round, so a future
    # generation may ship NULLs).
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(
            exact.alias("n_exact"),
            (F.abs(hll - exact) <= 0.05 * exact).cast("int").alias(
                "approx_within_5pct"
            ),
        )
    )


@_register(
    "aggx_stats_per_type",
    """
    SELECT event_type,
           round(min(value), 2) AS min_v, round(max(value), 2) AS max_v,
           round((sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / count(value), 3) AS avg_v,
           round(stddev_samp(value), 3) AS sd_v,
           round(median(value), 3) AS med_v
    FROM events GROUP BY event_type
    """,
)
def aggx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric stats incl. exact median (percentile). Spark's `median` is the
    exact 50th percentile, matching DuckDB's median on doubles."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.min("value"), 2).alias("min_v"),
            F.round(F.max("value"), 2).alias("max_v"),
            _davg("value", 3).alias("avg_v"),
            F.round(F.stddev_samp("value"), 3).alias("sd_v"),
            F.round(F.median("value"), 3).alias("med_v"),
        )
    )


# =========================================================================== #
# §2.8: window functions                                                      #
# =========================================================================== #


@_register(
    "window_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
           CAST(rn AS INTEGER) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2
    """,
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-2 orders per customer. Single shuffle on
    o_custkey; deterministic tiebreak on o_orderkey."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn"
        )
    )


@_register(
    "window_running_sum_per_user",
    """
    SELECT event_id, user_id,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame window: per-user running sum in event-time order —
    the reference's per-connection counters (A1/A2) generalized to keyed
    running aggregates."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast(_DEC6)).over(w), 2)
        .cast("double")
        .alias("running_value"),
    )


@_register(
    "window_lag_delta",
    """
    SELECT event_id, user_id,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
             AS delta
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: per-user value delta between consecutive events."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


# =========================================================================== #
# §2.8: set ops, limits, pivot                                                #
# =========================================================================== #


@_register(
    "setop_intersect_users",
    "SELECT DISTINCT user_id FROM events WHERE event_type = 'click' "
    "INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users who both clicked and purchased."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.intersect(buys)


@_register(
    "setop_except_users",
    "SELECT DISTINCT user_id FROM events WHERE event_type = 'view' "
    "EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'error'",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: viewers who never errored."""
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    errs = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return views.exceptAll(errs).distinct()


@_register(
    "limit_topk_events_by_value",
    """
    SELECT event_id, event_type, round(value, 2) AS value
    FROM events ORDER BY value DESC, event_id LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY+LIMIT — Spark plans TakeOrderedAndProject (per-partition
    partial top-k; only k rows per partition reach the merge)."""
    return (
        _t(spark, sf_dir, "events")
        .orderBy(F.desc("value"), "event_id")
        .limit(10)
        .select("event_id", "event_type", F.round("value", 2).alias("value"))
    )


@_register(
    "pivot_event_counts",
    """
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id % 10
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event-type counts per user bucket. Explicit value list keeps
    the plan single-pass (no distinct-values pre-query)."""
    ev = _t(spark, sf_dir, "events").withColumn("user_bucket", F.col("user_id") % 10)
    return (
        ev.groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


# =========================================================================== #
# North-star: dedup / text analysis / similarity / multimodal                 #
# =========================================================================== #


@_register(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: content digest -> survivor id + copy count. Only
    (16-byte digest, id) crosses the shuffle — never the document text."""
    return dedup.exact_dedup_groups(_t(spark, sf_dir, "documents"))


@_register(
    "dedup_exact_keep_first",
    """
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents) t
    WHERE rn = 1
    """,
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup survivors (keep lowest doc_id per digest)."""
    return dedup.exact_dedup_keep_first(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", "n_chars"
    )


@_register(
    "text_token_count",
    """
    SELECT doc_id, CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count per document (pure codegen, no shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.token_count("text").cast("bigint").alias("n_tokens"))


@_register(
    "text_quality_score",
    """
    SELECT doc_id,
           length(text) AS n_chars_actual,
           CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_words,
           floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                 / greatest(length(text), 1) * 10000) / 10000.0 AS alpha_ratio,
           floor((length(text) - length(replace(text, ' ', '')))
                 / greatest(length(text), 1) * 10000) / 10000.0 AS space_ratio,
           floor((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                  / greatest(length(text), 1))
                 * least(CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) / 50.0, 1.0)
                 * 10000) / 10000.0 AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-quality heuristics: length/word/alpha/space ratios + composite."""
    df = text.quality_score(_t(spark, sf_dir, "documents"))
    return df.withColumn("n_words", F.col("n_words").cast("bigint")).withColumn(
        "n_chars_actual", F.col("n_chars_actual").cast("bigint")
    )


@_register(
    "text_lang_scores",
    "SELECT doc_id, "
    + ", ".join(
        "CAST("
        + " + ".join(
            f"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {m} ', ''))) / {len(m) + 2}"
            for m in markers
        )
        + f" AS BIGINT) AS score_{lang}"
        for lang, markers in sorted(text.LANG_MARKERS.items())
    )
    + " FROM documents",
)
def text_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword-marker hit counts."""
    return text.lang_scores(_t(spark, sf_dir, "documents"))


@_register(
    "text_fingerprint",
    """
    SELECT doc_id,
           substring(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (truncated md5)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint("text").alias("fp"))


@_register(
    "embed_l2_norm",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2
    FROM embeddings
    """,
)
def embed_l2_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math via higher-order functions: per-row L2 norm (no UDF)."""
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(similarity.l2_norm(F.col("embedding").cast("array<double>")), 4).alias("l2"),
    )


@_register(
    "knn_bruteforce_cosine",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round(
             list_sum(list_transform(range(1, len(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cos_sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id
    LIMIT 5
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the vec_id=0 query vector. The query
    row is broadcast (1 row); scoring is a full-parallel scan; top-k is
    TakeOrderedAndProject — no full sort, no wide shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                similarity.cosine(F.col("embedding").cast("array<double>"), F.col("qv")), 6
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), "vec_id").limit(5)


def _lsh_bucket_oracle_sql(n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB oracle for the hyperplane-LSH kNN: the LCG plane family is
    deterministic, so the planes are embedded as literal arrays and the
    bucket id (sign-pattern) is recomputed in SQL.  Dot products use the
    same left-to-right summation as the Spark fold, so the sign agrees."""
    from reddit_sse_stream_spark.operators.similarity import _lcg_planes

    planes = _lcg_planes(n_planes, dim, seed=0)
    rows = ",\n      ".join(
        f"({i}, [{', '.join(repr(x) for x in p)}])" for i, p in enumerate(planes)
    )
    return f"""
    WITH planes(i, plane) AS (VALUES
      {rows}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
      SELECT v.vec_id,
             sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v.v[j] * p.plane[j])) >= 0
                      THEN 1 << p.i ELSE 0 END) AS bucket
      FROM v, planes p GROUP BY v.vec_id),
    qb AS (SELECT bucket FROM b WHERE vec_id = 0),
    q AS (SELECT v AS qv FROM v WHERE vec_id = 0)
    SELECT v.vec_id,
           round(list_sum(list_transform(range(1, {dim} + 1), j -> v.v[j] * q.qv[j]))
                 / (sqrt(list_sum(list_transform(v.v, x -> x * x)))
                    * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6)
             AS cos_sim
    FROM v, q, qb
      JOIN b ON b.vec_id = v.vec_id AND b.bucket = qb.bucket
    WHERE v.vec_id <> 0
    ORDER BY cos_sim DESC, v.vec_id
    LIMIT 5
    """


@_register("knn_lsh_bucketed", _lsh_bucket_oracle_sql())
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH bucket prune, then exact cosine
    within the single probed bucket.  The LCG plane family is deterministic,
    so the approximation is REPRODUCIBLE and fully oracled: DuckDB recomputes
    the sign-pattern buckets from the same literal planes
    (see _lsh_bucket_oracle_sql)."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return similarity.lsh_topk(emb.filter(F.col("vec_id") != 0), list(qv), k=5)


@_register("dedup_minhash_lsh", None)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates verified with exact Jaccard (>= 0.8).
    No oracle BY DESIGN: the hash family is xxhash64 (JVM codegen, not
    expressible in DuckDB) -> rows-only check here; full value-level
    verification lives in the md5-hash-family twin
    ``dedup_minhash_md5``, which IS driver-hash-checked, plus the
    driver-checkable containment row ``dedup_minhash_twin_containment``
    (fast must find every twin-certified pair) and a pinned cross-impl
    equality test (tests/test_operators.py)."""
    return dedup.near_dup_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


@_register("dedup_simhash", None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints grouped to exact-duplicate clusters (hamming-0).
    No oracle BY DESIGN: xxhash64 token hashes are not expressible in
    DuckDB -> rows-only check here; the md5-hash-family twin
    ``dedup_simhash_md5`` carries the driver-checked value oracle, the
    driver-checkable invariant row ``dedup_simhash_exact_dup_invariant``
    pins exact-dup preservation in BOTH families, and cross-impl equality
    is pinned in tests."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.simhash(docs)
    return sh.groupBy("simhash").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs")
    )


@_register(
    "dedup_embedding_cosine",
    """
    WITH sub AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 AS cos_sim
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 > 0.3
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, exact baseline: all pairs above cosine 0.3
    on a modulo-subsampled slice (all-pairs is the correctness oracle shape;
    the 100 TB path is dedup_embedding_cosine_lsh). floor-at-1e-4 keeps the
    double bit-identical across Spark and DuckDB."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    return similarity.cosine_pairs_exact(emb, threshold=0.3, allow_quadratic=True)


def _lsh_pairs_oracle_sql(
    n_planes: int = 6, n_tables: int = 8, dim: int = 64, threshold: float = 0.3
) -> str:
    """DuckDB oracle for the multi-table hyperplane-LSH near-dup pairs:
    the LCG plane family is deterministic per table seed, so every
    (tbl, plane) is embedded as a literal array and DuckDB recomputes the
    sign-pattern buckets, the candidate equi-join, and the exact-cosine
    verify.  Same reproducible-approximation trick as
    :func:`_lsh_bucket_oracle_sql`; sign flips would need a dot product
    within float-reassociation error of 0 (never observed at test SFs)."""
    from reddit_sse_stream_spark.operators.similarity import _lcg_planes

    rows = ",\n      ".join(
        f"({t}, {i}, [{', '.join(repr(x) for x in pl)}])"
        for t in range(n_tables)
        for i, pl in enumerate(_lcg_planes(n_planes, dim, seed=t))
    )
    return f"""
    WITH planes(tbl, i, plane) AS (VALUES
      {rows}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
      SELECT v.vec_id, p.tbl,
             sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v.v[j] * p.plane[j])) >= 0
                      THEN 1 << p.i ELSE 0 END) AS bucket
      FROM v, planes p GROUP BY v.vec_id, p.tbl),
    cand AS (
      SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
      FROM b l JOIN b r
        ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
    SELECT c.id_a, c.id_b,
           floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 AS cos_sim
    FROM cand c JOIN v a ON a.vec_id = c.id_a JOIN v b ON b.vec_id = c.id_b
    WHERE floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 > {threshold}
    """


@_register("dedup_embedding_cosine_lsh", _lsh_pairs_oracle_sql())
def dedup_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup scale path: multi-table random-hyperplane
    LSH candidates (equi-join on bucket keys, no O(n^2)) verified with
    exact cosine.  The LCG plane family is deterministic, so the
    approximation is REPRODUCIBLE and fully value-oracled — DuckDB
    recomputes buckets, candidates and the verify from the same literal
    planes (_lsh_pairs_oracle_sql)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.near_dup_pairs_lsh(emb, threshold=0.3, n_planes=6, n_tables=8)


_MEDIA_FEATURES_ORACLE = """
    SELECT doc_id AS media_id,
           (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(COALESCE(list_sum(list_transform(string_split(text, ''), c -> ord(c))), 0)
                % 2147483648 AS BIGINT) AS checksum
    FROM documents
    """


_MEDIA_DECODE_ORACLE = """
    WITH base AS (
      SELECT doc_id,
             (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
             text
      FROM documents
    ),
    aud AS (SELECT doc_id, 160 + doc_id % 101 AS n FROM base WHERE kind = 'audio'),
    smp AS (
      SELECT doc_id, i,
             ((doc_id * 40503 + i * 2654435761) % 65536) - 32768 AS s
      FROM aud, unnest(generate_series(0, n - 1)) AS u(i)
    ),
    smp2 AS (
      SELECT doc_id, s,
             lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM smp
    ),
    sf AS (
      SELECT doc_id,
             count(*) AS n_samples,
             max(abs(s)) AS peak,
             sum(s * s) AS sumsq,
             sum(CASE WHEN prev IS NOT NULL AND ((s >= 0) <> (prev >= 0))
                      THEN 1 ELSE 0 END) AS zero_cross,
             sum(CASE WHEN s < 0 THEN s + 65536 ELSE s END)
               % 2147483648 AS checksum
      FROM smp2 GROUP BY doc_id
    ),
    img AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
            FROM base WHERE kind = 'image' AND (doc_id // 3) % 3 < 2),
    pix AS (
      SELECT doc_id, w, h, i,
             (doc_id * 40503 + i * 2654435761) % 256 AS v
      FROM img, unnest(generate_series(0, w * h * 3 - 1)) AS u(i)
    ),
    -- container rotation (doc_id // 3) % 3: 0 = PNG (n_bytes = inflated
    -- scanline size h*(1+3w)), 1 = BMP (container length), 2 = baseline
    -- JPEG (grayscale, per-8x8-block constant pixels from the block
    -- formula; n_bytes = decoded sample count w*h)
    pf0 AS (
      SELECT doc_id, max(w) AS w, max(h) AS h,
             sum(v) AS sum_rgb, max(v) AS pix_peak,
             sum((i + 1) * v) % 2147483648 AS checksum,
             CASE WHEN (doc_id // 3) % 3 = 0
                  THEN max(h) * (1 + 3 * max(w))
                  ELSE 54 + max(h) * (((max(w) * 3 + 3) // 4) * 4)
             END AS n_bytes
      FROM pix GROUP BY doc_id
    ),
    jim AS (SELECT doc_id, 8 * (2 + doc_id % 5) AS w, 8 * (2 + doc_id % 3) AS h
            FROM base WHERE kind = 'image' AND (doc_id // 3) % 3 = 2),
    jpix AS (
      SELECT doc_id, w, h, i,
             (doc_id * 40503
              + (((i // w) // 8) * (w // 8) + (i % w) // 8)
                * 2654435761) % 256 AS v
      FROM jim, unnest(generate_series(0, w * h - 1)) AS u(i)
    ),
    jf AS (
      SELECT doc_id, max(w) AS w, max(h) AS h,
             sum(v) AS sum_rgb, max(v) AS pix_peak,
             sum((i + 1) * v) % 2147483648 AS checksum,
             max(w) * max(h) AS n_bytes
      FROM jpix GROUP BY doc_id
    ),
    pf AS (SELECT * FROM pf0 UNION ALL SELECT * FROM jf),
    -- video rows carry a genuine uncompressed AVI (r10): W=16 H=8 DIB
    -- frames, n = 2 + id % 5, channel byte from the global linear index
    -- j = frame*(W*H*3) + (y*W + x)*3 + c; n_bytes = decoded sample
    -- count (the SQL-reproducible size for a multi-frame container)
    vn AS (SELECT doc_id, 2 + doc_id % 5 AS n
           FROM base WHERE kind = 'video'),
    vpix AS (
      SELECT doc_id, n, j,
             (doc_id * 40503 + j * 2654435761) % 256 AS v
      FROM vn, unnest(generate_series(0, n * 16 * 8 * 3 - 1)) AS u(j)
    ),
    vf AS (
      SELECT doc_id, max(n) AS n,
             sum(v) AS sum_rgb, max(v) AS pix_peak,
             sum((j + 1) * v) % 2147483648 AS checksum,
             max(n) * 16 * 8 * 3 AS n_bytes
      FROM vpix GROUP BY doc_id
    )
    SELECT b.doc_id AS media_id, b.kind,
           CAST(CASE WHEN b.kind = 'audio' THEN 44 + 2 * sf.n_samples
                     WHEN b.kind = 'image' THEN pf.n_bytes
                     ELSE vf.n_bytes END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN b.kind = 'audio' THEN sf.checksum
                     WHEN b.kind = 'image' THEN pf.checksum
                     ELSE vf.checksum END AS BIGINT) AS checksum,
           CAST(sf.n_samples AS BIGINT) AS n_samples,
           CAST(sf.peak AS BIGINT) AS peak,
           CAST(sf.sumsq AS BIGINT) AS sumsq,
           CAST(sf.zero_cross AS BIGINT) AS zero_cross,
           CAST(COALESCE(pf.w, CASE WHEN b.kind = 'video' THEN 16 END)
                AS BIGINT) AS img_w,
           CAST(COALESCE(pf.h, CASE WHEN b.kind = 'video' THEN 8 END)
                AS BIGINT) AS img_h,
           CAST(COALESCE(pf.sum_rgb, vf.sum_rgb) AS BIGINT) AS sum_rgb,
           CAST(COALESCE(pf.pix_peak, vf.pix_peak) AS BIGINT) AS pix_peak,
           CAST(vf.n AS BIGINT) AS vid_frames
    FROM base b
    LEFT JOIN sf ON b.doc_id = sf.doc_id
    LEFT JOIN pf ON b.doc_id = pf.doc_id
    LEFT JOIN vf ON b.doc_id = vf.doc_id
    """


@_register("media_features", _MEDIA_DECODE_ORACLE)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction with REAL audio and image decodes
    (VERDICT r08 next #5; r09 next #8 added compressed formats):
    audio rows carry genuine RIFF/WAVE PCM16 containers (stdlib
    ``wave``); image rows ROTATE by (id // 3) % 3 through a genuine
    zlib-deflated PNG (chunk CRC-32s verified, IDAT inflated, all five
    row filters reversed), a genuine uncompressed 24-bit BMP, and a
    genuine LOSSY baseline JPEG (canonical DHT Huffman tables,
    DC-difference entropy stream with byte stuffing, dequant + full
    IDCT; the generative content is per-8x8-block constant, the DC-only
    subset a lossy codec round-trips exactly — which is what lets a
    value oracle pin it).  The Arrow mapInPandas kernel PARSES all four
    containers: WAV header + frames into sample-level features
    (n_samples / peak / energy / zero crossings), the image containers
    into pixel-level ones (dims / sum / peak), each with a
    decoded-content checksum (position-weighted over the logical pixel
    index, so row-order, channel-order, unfiltering, or entropy-decode
    mistakes go red, not just value flips).  Image n_bytes is the
    decoder's SQL-reproducible size per container class: BMP container
    length, PNG inflated scanline size h*(1+3w), JPEG decoded sample
    count w*h.  The SQL oracle recomputes every value from the
    generative formulas, so the decodes are proven by round-trip, not
    assumed.
    Video rows carry a genuine uncompressed AVI (r10, the last marked
    fake on this surface closed): RIFF chunk-tree walk, avih/strf
    geometry + pixel-format checks, raw bottom-up-BGR 'DIB ' frames
    reconstructed per frame, checksum position-weighted over the GLOBAL
    (frame, pixel, channel) index so frame-order mistakes go red;
    vid_frames pins the header-vs-stream frame-count agreement.  The
    plumbing twin ``media_features_meta`` still pins the fake
    (real_media=False) path's byte surface.
    The float feature vector stays out of the projection (Python round is
    banker's; SQL round is not) and is pinned instead by
    tests/test_operators.py::test_media_features_payload_byte_deterministic."""
    media = multimodal.synthesize_media(
        _t(spark, sf_dir, "documents"), real_media=True
    )
    feats = multimodal.extract_features(media, decode_real=True)
    return feats.select(
        "media_id", "kind", "n_bytes", "checksum",
        "n_samples", "peak", "sumsq", "zero_cross",
        "img_w", "img_h", "sum_rgb", "pix_peak", "vid_frames",
    )


@_register(
    "media_frame_sample",
    """
    SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx FROM (
      SELECT doc_id AS media_id, unnest(range(0, (doc_id % 16 + 1))) AS frame_idx
      FROM documents WHERE doc_id % 3 = 2) t
    WHERE frame_idx % 4 = 0
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: explode frame indices, keep every 4th.
    (kind='video' <=> doc_id % 3 = 2 per synthesize_media.)"""
    media = multimodal.synthesize_media(_t(spark, sf_dir, "documents"))
    return multimodal.frame_sample(media, every_n=4)


# --------------------------------------------------------------------------- #
# image-text alignment gate (VERDICT r14 next #7): LAION-style curation —     #
# per-image features from the REAL container decoders x caption-text          #
# embedding -> fixed-point cosine alignment -> keep/drop gate + per-source    #
# distribution.                                                               #
# --------------------------------------------------------------------------- #

#: fixed-point (1e-4) alignment threshold for the keep gate — the LAION
#: device (CLIP cosine >= 0.28) at the scale of this fixture's
#: descriptor: the sf0.001 score distribution spans ~0.34..0.99 with
#: median ~0.83, so 0.80 exercises both branches at every SF.
_ALIGN_THRESHOLD_X1E4 = 8000

#: the two 5-dim descriptors, as paired (spark_expr, duckdb_expr)
#: fragments.  IMAGE side: mixed projections of the decoded pixel
#: features (sum_rgb/checksum are position-weighted over the pixel
#: stream, so a decoder error changes the score).  TEXT side: component
#: k = 1 + (sum of codepoints at positions p = k mod 5) % 1000 — a
#: strided bag-of-codepoints caption embedding, pure codegen.
_ALIGN_IMG_COMPS = (
    "(sum_rgb % 997 + 1)",
    "(checksum % 983 + 1)",
    "(pix_peak + 1)",
    "(img_w * 31)",
    "(img_h * 37)",
)


def _align_txt_comps(dialect: str) -> list[str]:
    if dialect == "spark":
        return [
            f"(1 + aggregate(transform(split(text, ''), (c, p) -> "
            f"CASE WHEN p % 5 = {k} THEN ascii(c) ELSE 0 END), 0L, "
            f"(a, x) -> a + x) % 1000)"
            for k in range(5)
        ]
    return [
        f"(1 + COALESCE(list_sum(list_transform(range(1, len(cs) + 1), "
        f"p -> CASE WHEN (p - 1) % 5 = {k} THEN ord(cs[p]) ELSE 0 "
        f"END)), 0) % 1000)"
        for k in range(5)
    ]


def _align_score_sql(dialect: str) -> str:
    """Fixed-point cosine between the two descriptors — SAME expression
    tree in both dialects (integer dot/norms, one sqrt ratio, floor at
    1e-4), so the float roundoff below the fixed point is identical."""
    tc = _align_txt_comps(dialect)
    ic = _ALIGN_IMG_COMPS
    dot = " + ".join(
        f"CAST({a} AS DOUBLE) * {b}" for a, b in zip(ic, tc)
    )
    ni = " + ".join(f"CAST({a} AS DOUBLE) * {a}" for a in ic)
    nt = " + ".join(f"CAST({a} AS DOUBLE) * {a}" for a in tc)
    return (
        f"CAST(floor(({dot}) / (sqrt({ni}) * sqrt({nt})) * 10000) "
        f"AS BIGINT)"
    )


def _align_oracle_ctes() -> str:
    """DuckDB CTEs ending in ``score(media_id, source, align_x1e4,
    keep)`` — image features recomputed from the generative container
    formulas (the whole _MEDIA_DECODE_ORACLE chain as a subquery: the
    alignment oracle re-derives the PNG/BMP/JPEG pixel streams, so the
    Spark side's real decoders are re-proven through the score)."""
    return f"""
    mf AS ({_MEDIA_DECODE_ORACLE}),
    img AS (SELECT media_id, img_w, img_h, sum_rgb, pix_peak, checksum
            FROM mf WHERE kind = 'image'),
    cap AS (SELECT doc_id, source, string_split(text, '') AS cs
            FROM documents),
    score AS (
      SELECT i.media_id, c.source,
             {_align_score_sql("duckdb")} AS align_x1e4
      FROM img i JOIN cap c ON c.doc_id = i.media_id),
    gated AS (
      SELECT media_id, source, align_x1e4,
             CAST(align_x1e4 >= {_ALIGN_THRESHOLD_X1E4} AS INTEGER)
               AS keep
      FROM score)"""


@_register(
    "media_text_alignment_gate",
    f"""
    WITH {_align_oracle_ctes()}
    SELECT media_id, source, align_x1e4, keep
    FROM gated ORDER BY media_id
    """,
)
def media_text_alignment_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image-text alignment keep/drop gate (VERDICT r14 next #7) — the
    LAION-style curation filter (Schuhmann et al. 2021: keep a pair iff
    CLIP cosine(image, caption) clears a threshold), composed from
    surfaces this catalog already proves: per-image features come from
    the REAL container decoders (``operators/multimodal.py`` — PNG
    inflate+unfilter, BMP, baseline-JPEG entropy decode, the
    ``media_features`` surface), the caption embedding is a strided
    bag-of-codepoints over the document text (pure codegen), and the
    alignment score is a fixed-point cosine between the two 5-dim
    descriptors, gated at {_ALIGN_THRESHOLD_X1E4/10000:.2f}.  A real
    deployment swaps the descriptors for CLIP towers behind the same
    mapInPandas shape; every downstream shape (score, gate,
    distribution) is unchanged — which is exactly what makes this the
    right harness to prove.

    Oracle: DuckDB re-derives the image descriptor from the generative
    container formulas (the full _MEDIA_DECODE_ORACLE pixel chain), so
    the real decoders are re-proven THROUGH the alignment score — a
    decoder regression moves sum_rgb/checksum and goes red here, not
    just in media_features.

    Scale shape: STRICTLY map-only — the LAION-shape record carries
    payload and caption in the same row
    (multimodal.alignment_media_frame), so the whole chain is a filter,
    ONE zero-shuffle Arrow kernel (encode + real decode, caption
    carried through), and codegen scoring/gate; no join of any kind
    and no exchange before the output (plan-pinned).  The streaming
    admission twin runs the IDENTICAL chain (the host-admission
    batch/stream non-drift pattern)."""
    return _align_gated_frame(spark, sf_dir).orderBy("media_id")


def _align_gated_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (unordered) shared scoring chain both alignment rows build
    on: decode -> descriptors -> fixed-point cosine -> keep flag.
    Built on :func:`multimodal.alignment_media_frame` — payload and
    caption ride the SAME row (the LAION-shape record), so there is no
    caption join at all: filter + ONE Arrow kernel + codegen scoring,
    strictly map-only, and the streaming admission twin runs the
    IDENTICAL chain (batch/stream cannot drift — the
    host-admission pattern)."""
    docs = _t(spark, sf_dir, "documents")
    return _align_score_gate(
        multimodal.alignment_media_frame(
            docs.select("doc_id", "text", "source")
        )
    )


def _align_score_gate(media_frame: DataFrame) -> DataFrame:
    """Scoring + gate over an alignment_media_frame output — shared
    verbatim by the batch rows and the streaming twin."""
    return media_frame.selectExpr(
        "media_id",
        "source",
        f"{_align_score_sql('spark')} AS align_x1e4",
    ).selectExpr(
        "media_id",
        "source",
        "align_x1e4",
        f"CAST(align_x1e4 >= {_ALIGN_THRESHOLD_X1E4} AS INT) AS keep",
    )


@_register(
    "media_text_alignment_by_source",
    f"""
    WITH {_align_oracle_ctes()}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(keep) AS BIGINT) AS n_keep,
           CAST(sum(align_x1e4) AS BIGINT) AS align_sum_x1e4,
           CAST(min(align_x1e4) AS BIGINT) AS align_min_x1e4,
           CAST(max(align_x1e4) AS BIGINT) AS align_max_x1e4
    FROM gated GROUP BY source ORDER BY source
    """,
)
def media_text_alignment_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source alignment distribution — the curation report a LAION
    pipeline ships next to the gate (which sources produce aligned
    pairs; where a threshold move bites).  Exact integer aggregates of
    the fixed-point score (sum/min/max — no float mean, so the oracle
    is exact).  ONE dimension-sized exchange (the source aggregate)
    after the zero-shuffle scoring chain of the gate row."""
    g = _align_gated_frame(spark, sf_dir)
    return (
        g.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum("keep").cast("long").alias("n_keep"),
            F.sum("align_x1e4").cast("long").alias("align_sum_x1e4"),
            F.min("align_x1e4").cast("long").alias("align_min_x1e4"),
            F.max("align_x1e4").cast("long").alias("align_max_x1e4"),
        )
        .orderBy("source")
    )


#: threshold ladder for the tuning-curve row — brackets the deployed
#: 0.80 gate on both sides (the sf0.001 score span is ~0.34..0.99).
_ALIGN_CURVE_THRESHOLDS = (7000, 7500, 8000, 8500, 9000, 9500)


@_register(
    "media_text_alignment_threshold_curve",
    f"""
    WITH {_align_oracle_ctes()}
    SELECT CAST(t.thr AS BIGINT) AS thr_x1e4,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(CASE WHEN align_x1e4 >= t.thr THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep
    FROM gated, (VALUES {", ".join(f"({t})" for t in _ALIGN_CURVE_THRESHOLDS)}) t(thr)
    GROUP BY t.thr ORDER BY thr_x1e4
    """,
)
def media_text_alignment_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keep-count vs threshold curve for the alignment gate — the
    tuning sweep a LAION-style pipeline publishes before committing to
    a cut (Schuhmann et al. report exactly this ladder for CLIP 0.3 /
    0.28 / ...): how many pairs survive at each candidate threshold,
    bracketing the deployed 0.80 gate on both sides.  The pattern is
    ``knn_ivf_nprobe_recall_curve``: a static parameter ladder graded
    in one pass.

    Scale shape: NO explode and no per-threshold rescans — the ladder
    is static, so all six keep-counts fold as conditional sums in ONE
    global aggregate over the map-only scoring chain (partial + final
    around a single-row exchange), then ``stack`` pivots the one result
    row into the curve.  Cost is independent of ladder length at the
    data side."""
    g = _align_gated_frame(spark, sf_dir)
    aggs = [F.count("*").cast("long").alias("n")] + [
        F.sum((F.col("align_x1e4") >= t).cast("long"))
        .cast("long")
        .alias(f"k_{t}")
        for t in _ALIGN_CURVE_THRESHOLDS
    ]
    one = g.agg(*aggs)
    ladder = ", ".join(
        f"CAST({t} AS BIGINT), n, k_{t}" for t in _ALIGN_CURVE_THRESHOLDS
    )
    return one.selectExpr(
        f"stack({len(_ALIGN_CURVE_THRESHOLDS)}, {ladder}) "
        f"AS (thr_x1e4, n_images, n_keep)"
    ).orderBy("thr_x1e4")


# =========================================================================== #
# §2.8 continued: subqueries, sessionization, scalar-function batteries,      #
# UDF / UDAF / UDTF surface                                                   #
# =========================================================================== #


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(n)


_SUBQ_SCALAR = """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
"""


@_register("subq_scalar_above_avg", _SUBQ_SCALAR)
def subq_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above 2x the average price. Catalyst plans
    the subquery as a broadcast scalar — one extra pass, no per-row
    re-evaluation."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_SUBQ_SCALAR)


_SUBQ_IN = """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


@_register("subq_in_big_spenders", _SUBQ_IN)
def subq_in_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelates to a left-semi join)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SUBQ_IN)


_SUBQ_EXISTS = """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


@_register("subq_correlated_exists", _SUBQ_EXISTS)
def subq_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an extra predicate (decorrelated semi join)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SUBQ_EXISTS)


_SESSIONIZE = """
    SELECT user_id, session_id, count(*) AS n_events, min(ts) AS session_start
    FROM (
      SELECT user_id, ts, event_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events) t1) t2
    GROUP BY user_id, session_id
"""


@_register("sessionize_events", _SESSIONIZE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag -> new-session flag ->
    running sum as session id -> per-session agg. One shuffle on user_id;
    both window passes and the final agg share that partitioning."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(run))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
    )


@_register(
    "fn_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 3) AS p50,
           round(quantile_cont(value, 0.9), 3) AS p90,
           round(quantile_cont(value, 0.99), 3) AS p99
    FROM events GROUP BY event_type
    """,
)
def fn_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == SQL
    quantile_cont semantics). The approximate path (percentile_approx /
    t-digest) is the 100 TB variant — different sketch per engine, so the
    exact form carries the oracle."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 3).alias("p50"),
        F.round(F.percentile("value", 0.9), 3).alias("p90"),
        F.round(F.percentile("value", 0.99), 3).alias("p99"),
    )


@_register(
    "fn_datetime_buckets",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(hour(ts) AS INTEGER) AS hr, count(*) AS n,
           CAST(sign(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS total
    FROM events WHERE event_type = 'purchase'
    GROUP BY date_trunc('day', ts), hour(ts)
    """,
)
def fn_datetime_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar functions: date_trunc + hour bucketing (X7 family)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("n"), _dsum("value").alias("total"))


@_register(
    "fn_array_ops",
    """
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS INTEGER) AS n_words,
           array_to_string(list_slice(str_split(text, ' '), 1, 3), '-') AS first3,
           CAST(list_contains(str_split(text, ' '), 'spark') AS INTEGER) AS has_spark
    FROM documents WHERE doc_id < 100
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery (X3/X10 family): split, size, slice,
    concat_ws, array_contains."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.concat_ws("-", F.slice(words, 1, 3)).alias("first3"),
        F.array_contains(words, "spark").cast("int").alias("has_spark"),
    )


@_register(
    "fn_math_scalars",
    """
    SELECT event_id,
           round(abs(value - 100), 2) AS dist,
           CAST(ceil(value) AS BIGINT) AS cl,
           CAST(floor(value) AS BIGINT) AS fl,
           round(sqrt(value), 4) AS rt,
           round(ln(value + 1), 4) AS lg,
           CAST(sign(value - 100) AS INTEGER) AS sg
    FROM events WHERE event_id < 1000
    """,
)
def fn_math_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar battery (abs/ceil/floor/sqrt/ln/sign — X1/X8 family)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.abs(v - 100), 2).alias("dist"),
        F.ceil(v).cast("bigint").alias("cl"),
        F.floor(v).cast("bigint").alias("fl"),
        F.round(F.sqrt(v), 4).alias("rt"),
        F.round(F.log(v + 1), 4).alias("lg"),
        F.signum(v - 100).cast("int").alias("sg"),
    )


@_register(
    "join_full_outer_click_purchase",
    """
    SELECT coalesce(a.user_id, b.user_id) AS user_id,
           CAST(a.user_id IS NOT NULL AS INTEGER) AS clicked,
           CAST(b.user_id IS NOT NULL AS INTEGER) AS purchased
    FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') a
    FULL JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with null-flag projection."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct().alias("a")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().alias("b")
    return a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full").select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        F.col("a.user_id").isNotNull().cast("int").alias("clicked"),
        F.col("b.user_id").isNotNull().cast("int").alias("purchased"),
    )


@_register(
    "udf_pandas_scalar_charge",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem WHERE l_orderkey < 400
    """,
)
def udf_pandas_scalar_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow-batched) — the sanctioned Python
    escape hatch; oracle proves numeric parity with the pure-SQL form.

    The UDF returns the RAW double product, unrounded. Rounding doubles at a
    decimal place is cross-engine unstable: pandas Series.round banker's-
    rounds (47559.285 -> 47559.28), DuckDB rounds the binary value half-away
    (-> 47559.29), and Spark F.round HALF_UPs the shortest decimal repr
    (1.005 -> 1.01 where DuckDB gives 1.00). The raw product is the same
    IEEE multiply sequence in every engine, so it is bitwise reproducible."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def charge(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ep * (1 - disc) * (1 + tax)

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@_register(
    "udaf_geomean_orders",
    """
    SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 2) AS geomean_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def udaf_geomean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF (geometric mean) — custom aggregate the
    built-in library lacks, verified against the exp/avg/ln identity."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v).mean()))

    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.round(geomean("o_totalprice"), 2).alias("geomean_price"))
    )


@_register(
    "udtf_word_explode",
    """
    SELECT doc_id, unnest(str_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 20
    """,
)
def udtf_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) in a LATERAL join — one input row to N
    output rows, the Spark-4 UDTF surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                yield (w,)

    spark.udtf.register("split_words_udtf", SplitWords)
    _views(spark, sf_dir, "documents")
    return spark.sql(
        "SELECT d.doc_id, w.word FROM documents d, LATERAL split_words_udtf(d.text) w "
        "WHERE d.doc_id < 20"
    )


@_register(
    "session_window_agg",
    """
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events) t1) t2
    GROUP BY user_id, session_id
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window (gap-close semantics: a session absorbs
    events strictly closer than the gap; an event exactly at the previous
    window's end starts a new one — hence >= in the oracle's gap test).
    Same operator powers streaming sessionization with watermarks."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@_register(
    "fn_string_ops",
    """
    SELECT doc_id,
           upper(substring(text, 1, 10)) AS head_upper,
           trim(substring(text, 1, 12)) AS head_trim,
           lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
           replace(substring(text, 1, 20), ' ', '_') AS head_snake,
           CAST(strpos(text, 'data') AS INTEGER) AS data_pos,
           CAST(starts_with(text, 'the') AS INTEGER) AS starts_the
    FROM documents WHERE doc_id < 200
    """,
)
def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery (X2/X5 family): case folding, substring, trim,
    pad, replace, find, prefix test."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.upper(F.substring(t, 1, 10)).alias("head_upper"),
        F.trim(F.substring(t, 1, 12)).alias("head_trim"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
        F.replace(F.substring(t, 1, 20), F.lit(" "), F.lit("_")).alias("head_snake"),
        F.instr(t, "data").cast("int").alias("data_pos"),
        F.startswith(t, F.lit("the")).cast("int").alias("starts_the"),
    )


@_register(
    "x1_try_cast_validation",
    """
    SELECT id,
           TRY_CAST(json_extract_string(json, '$.k') AS BIGINT) AS k_int,
           CAST(TRY_CAST(json_extract_string(json, '$.k') AS BIGINT) IS NOT NULL
                AS INTEGER) AS is_int
    FROM (WITH feed AS (
      SELECT event_id AS id, props AS json FROM events)
      SELECT * FROM feed) t
    WHERE id < 500
    """,
)
def x1_try_cast_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — the reference's isInt validation (sse.py:11-15) as try_cast:
    NULL on unparseable input instead of an exception."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return ev.select(
        F.col("event_id").alias("id"),
        k.alias("k_int"),
        k.isNotNull().cast("int").alias("is_int"),
    )


_P2_K_SQL = (
    "CASE WHEN json_extract_string(json, '$.k') IS NULL THEN '{}' "
    "ELSE '{\"k\":\"' || json_extract_string(json, '$.k') || '\"}' END"
)

_PIPELINE_SPEC = QuerySpec(
    subreddits=("click", "purchase"), comment_backfill=500, filter_keys=("k",)
)

_PIPELINE_ORACLE = (
    f"WITH {FEED_CTE}, bounded AS ("
    "  SELECT * FROM feed WHERE (CASE WHEN event = 'rc'"
    "    THEN id > (SELECT max(id) FROM feed WHERE event = 'rc') - 500"
    "    ELSE TRUE END)"
    f"), filtered AS (SELECT * FROM bounded WHERE {_PIPELINE_SPEC.predicate_sql()})"
    f" SELECT id, event, {_P2_K_SQL} AS data,"
    f" 'id: ' || CAST(id AS VARCHAR) || chr(10) || 'event: ' || event || chr(10)"
    f" || 'data: ' || {_P2_K_SQL} || chr(10) || chr(10) AS frame"
    " FROM filtered"
)


@_register("reference_pipeline_example", _PIPELINE_ORACLE)
def reference_pipeline_example(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The switch-over artifact: one reference connection
    (?subreddit=click&subreddit=purchase&comment_backfill=500&filter=k) as
    a single batch plan — offsets, filter algebra, P2 projection, SSE
    framing (plans/pipeline.py)."""
    from reddit_sse_stream_spark.plans.pipeline import reference_pipeline

    return reference_pipeline(spark, sf_dir, _PIPELINE_SPEC)


@_register(
    "setop_intersect_all_values",
    """
    SELECT v FROM (SELECT CAST(floor(value) AS BIGINT) AS v FROM events
                   WHERE event_type = 'click')
    INTERSECT ALL
    SELECT v FROM (SELECT CAST(floor(value) AS BIGINT) AS v FROM events
                   WHERE event_type = 'view')
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset: duplicates preserved up to min multiplicity)."""
    ev = _t(spark, sf_dir, "events")
    v = F.floor("value").cast("bigint").alias("v")
    clicks = ev.filter(F.col("event_type") == "click").select(v)
    views = ev.filter(F.col("event_type") == "view").select(v)
    return clicks.intersectAll(views)


@_register(
    "setop_except_all_values",
    """
    SELECT v FROM (SELECT CAST(floor(value) AS BIGINT) AS v FROM events
                   WHERE event_type = 'click')
    EXCEPT ALL
    SELECT v FROM (SELECT CAST(floor(value) AS BIGINT) AS v FROM events
                   WHERE event_type = 'view')
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference)."""
    ev = _t(spark, sf_dir, "events")
    v = F.floor("value").cast("bigint").alias("v")
    clicks = ev.filter(F.col("event_type") == "click").select(v)
    views = ev.filter(F.col("event_type") == "view").select(v)
    return clicks.exceptAll(views)


@_register(
    "unpivot_customer_balances",
    """
    SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
    FROM customer
    """,
)
def unpivot_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide columns -> (key, metric, value) long form."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return cust.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


@_register(
    "posexplode_words",
    """
    WITH words AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents
                   WHERE doc_id < 10),
         idx AS (SELECT unnest(range(1, 4001)) AS i)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] AS word
    FROM words JOIN idx ON i <= len(w)
    """,
)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: element + 0-based position (DuckDB 1.0 lacks WITH
    ORDINALITY, so the oracle uses a bounded index join over list
    subscripts)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@_register(
    "agg_sorted_user_list",
    """
    SELECT event_type,
           string_agg(DISTINCT CAST(user_id AS VARCHAR), ','
                      ORDER BY CAST(user_id AS VARCHAR)) AS users
    FROM events WHERE user_id < 8 GROUP BY event_type
    """,
)
def agg_sorted_user_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sort_array -> concat_ws: deterministic ordered list
    aggregation (collect_* alone is order-nondeterministic — pinned here)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    return ev.groupBy("event_type").agg(
        F.concat_ws(",", F.sort_array(F.collect_set(F.col("user_id").cast("string")))).alias(
            "users"
        )
    )


@_register(
    "fn_map_ops",
    """
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS keys_str,
           json_extract_string(props, '$.k') AS k_val,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys
    FROM events WHERE event_id < 300
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function battery: schema-on-read map<string,string> ->
    map_keys / element_at / size (the payload stays string-typed, matching
    the reference's opaque-json model)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("keys_str"),
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@_register(
    "window_sliding_counts",
    """
    WITH slid AS (
      SELECT user_id, value,
             CAST(floor(epoch(ts) / 1800) * 1800 - offs AS BIGINT) AS win_start
      FROM events, (SELECT unnest([0, 1800]) AS offs) o
      WHERE floor(epoch(ts) / 1800) * 1800 - offs + 3600 > epoch(ts)
    )
    SELECT win_start, count(*) AS n, CAST(sign(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS total
    FROM slid GROUP BY win_start
    """,
)
def window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding time window (1h window, 30min slide): each event lands in 2
    overlapping windows. Spark's window() TVF vs an explicit two-bucket
    expansion in the oracle (DuckDB has no sliding-window TVF)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"), _dsum("value").alias("total"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"), "n", "total"
        )
    )


@_register(
    "text_lang_predict",
    "SELECT t.doc_id, CASE "
    + " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'"
        for lang in sorted(text.LANG_MARKERS)
    )
    + " END AS lang_pred FROM (SELECT doc_id, "
    + ", ".join(
        "CAST("
        + " + ".join(
            f"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {m} ', ''))) / {len(m) + 2}"
            for m in markers
        )
        + f" AS BIGINT) AS s_{lang}"
        for lang, markers in sorted(text.LANG_MARKERS.items())
    )
    + ", greatest("
    + ", ".join(
        "CAST("
        + " + ".join(
            f"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {m} ', ''))) / {len(m) + 2}"
            for m in markers
        )
        + " AS BIGINT)"
        for _, markers in sorted(text.LANG_MARKERS.items())
    )
    + ") AS best FROM documents) t",
)
def text_lang_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID prediction: argmax of the marker scores (ties ->
    lexicographically first language, pinned in both backends via the
    ordered CASE)."""
    scores = text.lang_scores(_t(spark, sf_dir, "documents"))
    langs = sorted(text.LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    # chained when(): the FIRST matching language wins ties, mirroring the
    # oracle's ordered CASE
    pred_expr = None
    for lg in langs:
        cond = F.col(f"score_{lg}") == best
        pred_expr = F.when(cond, lg) if pred_expr is None else pred_expr.when(cond, lg)
    return scores.select("doc_id", pred_expr.alias("lang_pred"))


@_register(
    "aggx_approx_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 3) AS p50_exact,
           round(quantile_cont(value, 0.99), 3) AS p99_exact,
           1 AS approx_within_band
    FROM events GROUP BY event_type
    """,
)
def aggx_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch) — the 100 TB companion
    to fn_percentiles' exact form — with an externally-checkable CONTRACT:
    DuckDB's approx_quantile is a different sketch, so the raw approx
    values can't be hash-compared — instead the query emits the exact
    percentiles (value-parity with DuckDB's quantile_cont is proven by
    fn_percentiles) plus a flag asserting the sketch's ACTUAL guarantee —
    rank error: the exact rank of each returned approx value (recounted
    against the group) must bracket the target rank within n/accuracy + 1
    (the +1 absorbs the discrete-vs-interpolated convention offset; a
    value-distance band is NOT the sketch's contract — on a sparse tail
    the adjacent data point legitimately sits a whole gap away).  The
    oracle asserts the flag; raw approx values stay pytest-band-checked."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    ap = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 3).alias("p50_exact"),
        F.round(F.expr("percentile(value, 0.99)"), 3).alias("p99_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("p50a"),
        F.percentile_approx("value", 0.99, 10000).alias("p99a"),
        F.count("*").alias("n"),
    )
    j = ev.join(F.broadcast(ap), "event_type")

    def _rank_ok(approx_col: str, p: float):
        lt = F.sum((F.col("value") < F.col(approx_col)).cast("long"))
        le = F.sum((F.col("value") <= F.col(approx_col)).cast("long"))
        slack = F.first("n") / 10000 + 1
        target = p * F.first("n")
        return (lt - slack <= target) & (target <= le + slack)

    return j.groupBy("event_type").agg(
        F.first("p50_exact").alias("p50_exact"),
        F.first("p99_exact").alias("p99_exact"),
        (_rank_ok("p50a", 0.5) & _rank_ok("p99a", 0.99)).cast("int").alias(
            "approx_within_band"
        ),
    )


@_register(
    "join_right_outer_orders",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: every customer kept, orderless customers count 0."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@_register(
    "join_cross_region_nation",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS join (tiny dims only — a deliberate 5x25 product)."""
    return _t(spark, sf_dir, "region").crossJoin(
        _t(spark, sf_dir, "nation").select("n_name")
    ).select("r_name", "n_name")


@_register(
    "aggx_rollup_grouping_id",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
           count(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def aggx_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() indicator columns (distinguishes real NULL
    keys from subtotal rows)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count("*").alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n")
    )


@_register(
    "tpch_q10_returned_customers",
    """
    SELECT c_custkey, c_name,
           CAST(sign(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Facts (and fact-scale customer) join on shuffled keys; only the tiny
    nation dim carries a static broadcast hint — AQE handles the rest."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@_register(
    "tpch_q14_promo_revenue",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a part join with a
    LIKE-prefix predicate. part is ~3% of lineitem's rows — fact-scale at
    100 TB — so no static broadcast hint; AQE picks the strategy."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))
    )


@_register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a
    non-equi residual (shipped >30 days after order — the testdata has no
    l_commitdate/l_receiptdate, so late-shipment stands in for late-commit).
    The date filter prunes orders BEFORE the semi join."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "tpch_q12_priority_lines",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (CASE-sum) over a fact-fact join
    (no l_shipmode in the testdata -> group by l_returnflag). Integer sums —
    no cross-engine float risk."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@_register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join with an ON-clause filter (kept in the
    join, NOT a where — customers with zero qualifying orders must survive
    with c_count=0), then a second aggregation over the first's output."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@_register(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sign(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-once, consume-twice — the revenue "view"
    feeds both the join and the scalar max subquery; equality is on the
    rounded value so both consumers see the identical double."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("total_revenue"))
    best = revenue.join(F.broadcast(top), "total_revenue", "left_semi")
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(best, supp.s_suppkey == best.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@_register(
    "tpch_q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery -> aggregate the
    fact once, semi-join the keys back, re-aggregate with dims attached.
    The heavy groupBy(l_orderkey) happens before any join."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@_register(
    "tpch_q19_disjunctive_revenue",
    """
    SELECT CAST(sign(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-table predicate. Catalyst extracts
    the common per-table implications (p_brand IN (...), l_quantity <= 30)
    below the join; the residual OR evaluates post-join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


@_register(
    "tpch_q22_idle_customers",
    """
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(sign(sum(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT (sum(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / count(c_acctbal)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average subquery as the filter threshold plus
    NOT EXISTS as a left-anti join. Adapted to the testdata (every customer
    has orders, there is no c_phone): "idle" = no order since 2000, grouped
    by market segment instead of country code."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum_raw("c_acctbal") / F.count("c_acctbal")).alias("threshold")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            _dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# SQL twins of the _fp/_dsum fixed-point family (see the block comment above
# _FP_SCALE).  The older TPC-H oracles carry these expansions inline; the
# q2/q11/q16/q20 additions below generate them so the two engines cannot
# drift while editing.
def _sql_fp(expr: str) -> str:
    """DuckDB twin of :func:`_fp`: exact int64 fixed-point addend."""
    return f"CAST(floor(({expr}) * 1000000 + 0.5) AS BIGINT)"


def _sql_dsum_raw(expr: str) -> str:
    """DuckDB twin of :func:`_dsum_raw`: un-rounded exact sum as double."""
    return f"(sum({_sql_fp(expr)}) / 1000000.0)"


@_register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH offers AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM offers
      JOIN eu ON l_suppkey = s_suppkey
      JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'STANDARD'
      AND unit_cost = (
        SELECT min(o2.unit_cost) FROM offers o2
          JOIN eu e2 ON o2.l_suppkey = e2.s_suppkey
        WHERE o2.l_partkey = offers.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table, so the supplier-part
    catalog is derived from lineitem — ps_supplycost becomes the minimum
    observed unit price per (part, supplier)): for every STANDARD-type part,
    the European supplier(s) offering it at the region-wide minimum cost.

    The correlated min subquery decorrelates into a per-part window min
    (whole-partition frame) + equality filter — one exchange on l_partkey
    and NO join-back at all (the groupBy-min + self-join alternative
    planned a SortMergeJoin here).  ``unit_cost`` is a single IEEE
    division of two stored doubles and ``min`` is order-independent, so
    the equality filter and the emitted double are bit-identical across
    engines (no sum is ever formed).  supplier/nation/region are broadcast
    (dimension-sized at any SF); the offers aggregation is the only big
    shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    return (
        offers.withColumn("best_cost", best)
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@_register(
    "tpch_q11_important_parts",
    f"""
    WITH scoped AS (
        SELECT l_partkey, l_extendedprice
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'),
    per_part AS (
        SELECT l_partkey AS p_key,
               {_sql_dsum_raw('l_extendedprice')} AS part_value
        FROM scoped GROUP BY l_partkey)
    SELECT p_key, part_value
    FROM per_part
    WHERE part_value > (
        SELECT {_sql_dsum_raw('l_extendedprice')} * 0.001 FROM scoped)
    ORDER BY part_value DESC, p_key
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp, so "stock value" is the
    revenue booked per part through one region's suppliers): parts whose
    value exceeds 0.1% of the region-wide total — a grouped aggregate
    HAVING-filtered against a global scalar aggregate.

    Both the per-part values and the global total are exact fixed-point
    sums (order-independent; see _FP_SCALE), so the > comparison cannot
    flake across shuffle orders or engines.  The scoped feed is computed
    once per side; the global total is a broadcast 1-row cross join, and
    the only big shuffle is the per-part groupBy on l_partkey."""
    scoped = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("l_partkey", "l_extendedprice")
    )
    per_part = scoped.groupBy(F.col("l_partkey").alias("p_key")).agg(
        _dsum_raw("l_extendedprice").alias("part_value")
    )
    total = scoped.agg(
        (_dsum_raw("l_extendedprice") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("p_key", "part_value")
        .orderBy(F.desc("part_value"), "p_key")
    )


@_register(
    "tpch_q16_supplier_counts",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the supplier-part relation comes from
    lineitem, and the "customer complaints" exclusion — there is no
    s_comment column — becomes a low-balance predicate): how many distinct
    qualifying suppliers carry each (brand, type, size) bucket.

    The NOT IN compiles to a left-anti join against the (tiny, broadcast)
    excluded-supplier list; note NOT IN's NULL semantics don't bite because
    s_suppkey is a key.  The distinct supplier-part projection collapses
    lineitem's fan-out BEFORE the part join (narrow 2-key shuffle), and
    count(DISTINCT) then runs on pre-deduplicated pairs."""
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    excluded = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000.0)
        .select("s_suppkey")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    return (
        pairs.join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@_register(
    "tpch_q20_dominant_supplier",
    f"""
    WITH scoped AS (
        SELECT l_partkey, l_suppkey, l_quantity
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt%'
          AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'),
    per_pair AS (
        SELECT l_partkey, l_suppkey,
               {_sql_dsum_raw('l_quantity')} AS supp_qty
        FROM scoped GROUP BY l_partkey, l_suppkey),
    per_part AS (
        SELECT l_partkey AS t_partkey,
               {_sql_dsum_raw('l_quantity')} AS part_qty
        FROM scoped GROUP BY l_partkey)
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM per_pair JOIN per_part ON l_partkey = t_partkey
        WHERE supp_qty > 0.5 * part_qty)
    ORDER BY s_name
    """,
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availqty, so "excess stock"
    becomes market dominance — a supplier shipping more than half of a
    part's total 1998 volume): suppliers who dominated any bolt-named part.

    Keeps Q20's structure — a name-prefixed part scope, a date-windowed
    quantity aggregate, a correlated half-of-total threshold, and an outer
    IN collapsing to a left-semi join on s_suppkey.  Both quantity sums are
    exact fixed-point (order-independent), so the strict > threshold is
    deterministic.  The part filter broadcasts; per-pair and per-part
    aggregates share the scoped scan and shuffle on narrow keys; per-part
    re-broadcasts into the pair join (part counts are bounded by the name
    filter at any SF)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    scoped = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    per_pair = scoped.groupBy("l_partkey", "l_suppkey").agg(
        _dsum_raw("l_quantity").alias("supp_qty")
    )
    per_part = scoped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        _dsum_raw("l_quantity").alias("part_qty")
    )
    dominant = (
        per_pair.join(
            F.broadcast(per_part), F.col("l_partkey") == F.col("t_partkey")
        )
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@_register(
    "ts_gapfill_ffill",
    """
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               round((sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / count(value), 3) AS v
        FROM events WHERE user_id < 5 GROUP BY user_id, date_trunc('hour', ts)),
    span AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
             FROM span),
    joined AS (SELECT g.user_id, g.h, hv.v
               FROM grid g LEFT JOIN hourly hv
                 ON g.user_id = hv.user_id AND g.h = hv.h)
    SELECT user_id, h,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
    FROM joined
    """,
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: hourly grid per user (sequence+explode), holes
    forward-filled with last(ignorenulls) — see operators/timeseries.py for
    the shuffle budget. Restricted to user_id < 5 to keep the oracle grid
    small; the plan is key-parallel, so the restriction is just a filter."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    return timeseries.gap_fill_ffill(ev)


@_register(
    "pack_sequences_by_source",
    """
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
        FROM documents),
    offs AS (
        SELECT doc_id, source, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                 AS BIGINT) AS start_offset
        FROM toks)
    SELECT doc_id, source, n_tokens, start_offset,
           CAST(floor(start_offset / 512.0) AS BIGINT) AS pack_id
    FROM offs
    """,
)
def pack_sequences_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: per-source token stream chunked into
    512-token packs; window cumsum partitioned by source (never a global
    sort). Integer arithmetic -> exact cross-engine."""
    return packing.pack_sequences(_t(spark, sf_dir, "documents"), budget=512)


@_register(
    "dedup_cc_clusters",
    """
    WITH RECURSIVE sub AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 10 = 0),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sub a JOIN sub b ON a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 > 0.2),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON w.id = e.src)
    SELECT id, min(comp) AS component FROM walk GROUP BY id
    """,
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> dedup clusters: connected components (min-label
    propagation, one shuffle join per round) over the exact cosine pair
    graph. Oracle: WITH RECURSIVE reachability in DuckDB — min reachable
    id == component id for undirected (symmetrized) edges."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    pairs = similarity.cosine_pairs_exact(emb, threshold=0.2, allow_quadratic=True)
    return dedup.connected_components(pairs)


@_register(
    "aggx_corr_covar",
    """
    SELECT event_type,
           floor(corr(value, user_id) * 10000) / 10000 AS corr_vu,
           floor(covar_samp(value, user_id) * 10000) / 10000 AS covs_vu,
           floor(covar_pop(value, user_id) * 10000) / 10000 AS covp_vu
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def aggx_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / sample + population covariance) as
    distributed one-pass aggregates (partial+final co-moments)."""
    ev = _t(spark, sf_dir, "events")
    def f4(c):
        return F.floor(c * 10000) / 10000
    return (
        ev.groupBy("event_type")
        .agg(
            f4(F.corr("value", "user_id")).alias("corr_vu"),
            f4(F.covar_samp("value", "user_id")).alias("covs_vu"),
            f4(F.covar_pop("value", "user_id")).alias("covp_vu"),
        )
        .orderBy("event_type")
    )


@_register(
    "fn_histogram_bins",
    """
    SELECT CAST(floor(value / 5.0) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo, round(max(value), 2) AS hi
    FROM events GROUP BY bucket ORDER BY bucket
    """,
)
def fn_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed equi-width histogram: explicit floor binning (identical
    IEEE op in both engines; DuckDB 1.0 lacks width_bucket) + count/min/max
    per bin — one partial+final agg, no sort until the tiny result."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 5.0).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@_register(
    "fn_histogram_equidepth",
    """
    WITH b AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders)
    SELECT bin, count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def fn_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram via ntile over a total order —
    the quantile-bin summary a cost model or skew report wants, exact and
    deterministic (o_orderkey tiebreak pins the order, so both engines
    assign identical bins even on duplicate prices).

    Scale note: global ntile is a single-ordering window — Spark executes
    it as one sorted partition, the honest price of EXACT global quantile
    bins.  At 100 TB the swap is approx_percentile cutpoints + a broadcast
    range bin join (two scans, no global sort) — IN-REPO as
    ``sketches.equidepth_approx_bins`` with its own contract-oracled
    catalog row ``fn_histogram_equidepth_approx_contract`` (and the
    bit-exact distributed ntile is ``corpus.global_ntile``, audited by
    agg_two_phase_ntile_twin); kept exact here because the oracle
    compares values and the approx sketches differ across engines.  The
    post-window agg is the usual partial+final pair on a tiny key."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_totalprice",
            # DuckDB's ntile yields BIGINT; Spark's yields int — cast so the
            # driver's type-sensitive hash sees the same column type.
            F.ntile(8).over(w).cast("long").alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bin")
    )


@_register(
    "pack_length_buckets",
    """
    WITH b AS (
      SELECT doc_id, n_chars,
             ntile(8) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents),
    agg AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars_sum,
             CAST(max(n_chars) AS BIGINT) AS chars_max
      FROM b GROUP BY bucket)
    SELECT bucket, n_docs, chars_sum, chars_max,
           chars_max * n_docs - chars_sum AS padding_waste
    FROM agg ORDER BY bucket
    """,
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching: equi-depth document-length buckets (exact
    ntile with doc_id tiebreak) plus each bucket's PADDING WASTE
    (max_len x n - sum_len) — the quantity a training loader minimizes by
    batching similar-length sequences together instead of paying every
    batch at its longest member.  All-integer aggregates, order-free.

    Scale note: exact global ntile is one total-order window (the same
    honest price as ``fn_histogram_equidepth``; the 100 TB swap —
    approx_percentile cut points + a broadcast range join, two scans, no
    global sort — is in-repo as ``sketches.equidepth_approx_bins``,
    contract-oracled by ``pack_length_buckets_approx_contract`` on this
    very tie-heavy column).  The per-bucket aggregate is the usual
    partial+final pair on 8 keys."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    b = docs.select(
        "doc_id", "n_chars", F.ntile(8).over(w).cast("long").alias("bucket")
    )
    agg = b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
        F.max("n_chars").alias("chars_max"),
    )
    return agg.select(
        "bucket",
        "n_docs",
        "chars_sum",
        "chars_max",
        (F.col("chars_max") * F.col("n_docs") - F.col("chars_sum")).alias(
            "padding_waste"
        ),
    ).orderBy("bucket")


@_register(
    "sample_stratified_deterministic",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE doc_id % (CASE WHEN lang = 'en' THEN 3 ELSE 10 END) = 0
    ORDER BY doc_id
    """,
)
def sample_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum downsampling with a deterministic keep rule (keep 1-in-3
    'en' docs, 1-in-10 otherwise). Modulo on the stable id keeps the oracle
    exact; at scale swap the modulo for pmod(xxhash64(id), 100) — same
    plan, decorrelated from id assignment order. Spark's sampleBy covers
    the seeded-random variant (not oracle-able across engines)."""
    docs = _t(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(3)).otherwise(F.lit(10))
    return (
        docs.filter(F.col("doc_id") % rate == 0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@_register(
    "sample_temperature_by_lang",
    """
    WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
               FROM documents GROUP BY lang),
    t AS (SELECT sum(sqrt(n)) AS z, sum(n) AS total FROM c),
    p AS (SELECT lang, least((total / 2) * sqrt(n) / z / n, 1.0) AS p_keep
          FROM c, t)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN p USING (lang)
    WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) / 1152921504606846976.0 < p_keep
    """,
)
def sample_temperature_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5), the standard
    training-mix resample: per-language keep probability proportional to
    n^alpha / n, scaled so the expected kept total is half the corpus —
    upsamples the tail languages relative to the head exactly like
    multilingual pretraining mixes do.  The keep decision hashes the
    stable doc_id (md5 60-bit -> uniform [0,1)), so the sample is
    deterministic and fully value-oracled — no RNG, no seed skew across
    engines.  Scale shape: a 5-row broadcast of per-language
    probabilities against the corpus scan; one tiny aggregation, zero
    wide shuffles."""
    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").cast("double").alias("n"))
    t = c.agg(F.sum(F.sqrt("n")).alias("z"), F.sum("n").alias("total"))
    p = c.crossJoin(F.broadcast(t)).select(
        "lang",
        F.least(
            (F.col("total") / 2) * F.sqrt("n") / F.col("z") / F.col("n"),
            F.lit(1.0),
        ).alias("p_keep"),
    )
    u = dedup.md5_hash60(F.col("doc_id").cast("string")) / F.lit(
        float(1 << 60)
    )
    return (
        docs.join(F.broadcast(p), "lang")
        .filter(u < F.col("p_keep"))
        .select("doc_id", "lang")
    )


@_register(
    "text_stopword_scrub",
    r"""
    SELECT doc_id,
           substr(regexp_replace(trim(regexp_replace(lower(text),
                    '\b(a|the)\b', '', 'g')), '\s+', ' ', 'g'), 1, 80)
             AS scrubbed_80,
           CAST(len(regexp_extract_all(lower(text), '\b(a|the)\b'))
                AS BIGINT) AS n_stopwords
    FROM documents
    """,
)
def text_stopword_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword scrub + whitespace renormalization — the text-cleaning
    stage every corpus pipeline runs before tokenization, with the
    removed-token count kept as a quality feature.  Pure JVM regex
    (java.util.regex vs DuckDB RE2 agree on \\b and \\s+ here), zero
    shuffle, codegen end to end."""
    docs = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scrub = F.regexp_replace(
        F.trim(F.regexp_replace(low, r"\b(a|the)\b", "")), r"\s+", " "
    )
    return docs.select(
        "doc_id",
        F.substring(scrub, 1, 80).alias("scrubbed_80"),
        F.size(F.regexp_extract_all(low, F.lit(r"\b(a|the)\b"), 0))
        .cast("bigint")
        .alias("n_stopwords"),
    )


@_register(
    "fn_regexp_ops",
    """
    SELECT doc_id,
           regexp_extract(text, '[A-Za-z]+') AS first_word,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
           substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40) AS devoweled_40
    FROM documents
    """,
)
def fn_regexp_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar battery: extract / extract_all count / global replace —
    all JVM codegen (java.util.regex), no Python."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "[A-Za-z]+", 0).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]+"), 0))
        .cast("bigint")
        .alias("n_vowel_runs"),
        F.substring(F.regexp_replace("text", "[aeiou]", "_"), 1, 40).alias(
            "devoweled_40"
        ),
    )


@_register(
    "fn_null_ops",
    """
    SELECT c_custkey,
           round(coalesce(nullif(c_acctbal, 0.0), -1.0), 2) AS bal_or_sentinel,
           round(greatest(c_acctbal, 0.0), 2) AS bal_floor0,
           round(least(c_acctbal, 1000.0), 2) AS bal_cap1000,
           CAST(c_acctbal IS NULL AS INTEGER) AS was_null
    FROM customer
    """,
)
def fn_null_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling conditionals: nullif/coalesce/greatest/least — the
    building blocks of defensive ETL expressions."""
    cust = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.round(F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)), 2).alias(
            "bal_or_sentinel"
        ),
        F.round(F.greatest(bal, F.lit(0.0)), 2).alias("bal_floor0"),
        F.round(F.least(bal, F.lit(1000.0)), 2).alias("bal_cap1000"),
        bal.isNull().cast("integer").alias("was_null"),
    )


@_register(
    "window_range_time_frame",
    """
    SELECT event_id, user_id,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS v_1h
    FROM events WHERE user_id < 20
    """,
)
def window_range_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-user sum of the trailing hour,
    bounded by VALUE distance (seconds), not row count — the frame Spark's
    rangeBetween computes without self-joining. One shuffle on user_id."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast(_DEC6)).over(w), 2).cast("double").alias("v_1h"),
    )


@_register(
    "window_rank_family",
    """
    SELECT o_orderkey, o_custkey,
           CAST(dense_rank() OVER w AS INTEGER) AS drank,
           CAST(ntile(4)     OVER w AS INTEGER) AS quartile,
           floor(percent_rank() OVER w * 10000) / 10000 AS pct_rank,
           floor(cume_dist()    OVER w * 10000) / 10000 AS cdist
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking family over one shared window spec (dense_rank / ntile /
    percent_rank / cume_dist): Spark computes all four in a single Window
    operator off one user shuffle."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    def f4(c):
        return F.floor(c * 10000) / 10000
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        f4(F.percent_rank().over(w)).alias("pct_rank"),
        f4(F.cume_dist().over(w)).alias("cdist"),
    )


@_register("knn_ivf_cells", None)
def knn_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN scale path: KMeans coarse quantizer on the unit sphere,
    probe the 2 nearest cells only (operators/ml_lsh.py).  No oracle BY
    DESIGN — DuckDB cannot reproduce Spark's KMeans, so there is no SQL
    twin to hash against.  Verification surface: (1) the quantizer trains
    on a coalesce(1) input, which pins the seeded model (and so every cell
    assignment and this query's rows) run to run — the driver's
    rows+schema check is therefore meaningful, not noise
    (tests/test_operators.py::test_ivf_assignments_deterministic_under_repartition);
    (2) recall-vs-brute-force is band-checked in pytest; (3) the
    deterministic LSH bucket path (``knn_lsh_bucketed``) carries the
    driver-checked value oracle for the ANN family; (4) the
    driver-checkable row ``knn_ivf_metric_consistency`` pins that every
    result this path returns is scored with EXACTLY the oracled cosine."""
    from reddit_sse_stream_spark.operators.ml_lsh import ivf_topk_cosine

    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return ivf_topk_cosine(
        emb.filter(F.col("vec_id") != 0), list(qv), k=5, n_cells=8, n_probe=2
    )


# --------------------------------------------------------------------------- #
# Oracle-less fast paths: equality/invariant rows against their oracled twins #
# (VERDICT r06 next #8).  Each row reduces a fast path's verification to a    #
# CONSTANT the driver can hash-check: the Spark side computes the invariant   #
# over real data, the oracle pins its expected value — a fast-path bug turns  #
# the row red.  Where full set-equality does not hold across hash families,   #
# the docstring records the measured divergence and the invariant chosen      #
# instead.                                                                    #
# --------------------------------------------------------------------------- #


@_register(
    "dedup_minhash_twin_containment",
    "SELECT CAST(0 AS BIGINT) AS twin_pairs_missed_by_fast",
)
def dedup_minhash_twin_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-tests the xxhash64 fast path ``dedup_minhash_lsh`` against
    its driver-oracled md5 twin ``dedup_minhash_md5``: every near-dup pair
    the twin certifies (banding candidate + exact Jaccard >= 0.8) must
    also be found by the fast path, i.e. |twin \\ fast| == 0, which the
    constant oracle pins.  Containment rather than symmetric equality by
    design: both sides post-verify candidates with EXACT Jaccard, so
    neither can contain a false pair — the only possible divergence is
    banding recall, and the fast path's 64-hash/16-band sketch misses a
    J=0.875 pair with probability ~7e-7 versus the twin's ~3e-3
    (8 hashes / 4 bands), so fast ⊇ twin is the direction that holds
    robustly under per-round testdata regeneration while twin ⊇ fast
    would flicker on the twin's own recall.  (Measured at sf0.01: the two
    sides are currently fully set-equal, 25 = 25 pairs.)

    Scale: both branches are the production operators (digest-only
    shuffles, size-capped band buckets — operators/dedup.py); the final
    left_anti join is on the narrow (doc_a, doc_b) pair key and the
    output is a single count row."""
    docs = _t(spark, sf_dir, "documents")
    fast = dedup.near_dup_pairs(docs, threshold=0.8)
    twin = dedup.minhash_md5_near_dups(docs)
    missed = twin.join(fast, ["doc_a", "doc_b"], "left_anti")
    return missed.agg(
        F.count("*").cast("long").alias("twin_pairs_missed_by_fast")
    )


@_register(
    "dedup_simhash_exact_dup_invariant",
    "SELECT CAST(0 AS BIGINT) AS groups_split_fast,"
    " CAST(0 AS BIGINT) AS groups_split_md5",
)
def dedup_simhash_exact_dup_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The invariant that ties the xxhash64 fast path ``dedup_simhash`` to
    its oracled md5 twin ``dedup_simhash_md5``: documents with IDENTICAL
    text have identical token multisets, hence identical per-bit votes,
    hence identical fingerprints under ANY hash family — so no exact-text
    group may be split across fingerprints on either side (a bug in the
    vote fold or bit packing breaks this immediately).  Full hamming-0
    CLUSTER equality across families is impossible by design and is NOT
    asserted: borderline near-dups (not exact dups) collide under one
    family and not the other — measured at sf0.01, 5 of ~500 clusters
    differ between the 64-bit xxhash and 60-bit md5 fingerprints, which
    is the expected behavior of distinct hash families, not a defect.

    Scale: one tokenize per side (the production simhash operators), one
    groupBy on the exact-text digest with two count_distincts, single
    summary row out."""
    docs = _t(spark, sf_dir, "documents")
    fast = dedup.simhash(docs).withColumnRenamed("simhash", "sh_fast")
    md5 = dedup.simhash(
        docs, bits=60, hash_fn=dedup.md5_hash60
    ).withColumnRenamed("simhash", "sh_md5")
    tg = docs.select("doc_id", F.md5(F.col("text")).alias("tkey"))
    g = (
        tg.join(fast, "doc_id")
        .join(md5, "doc_id")
        .groupBy("tkey")
        .agg(
            F.count_distinct("sh_fast").alias("nf"),
            F.count_distinct("sh_md5").alias("nm"),
        )
    )
    return g.agg(
        F.sum((F.col("nf") > 1).cast("long")).cast("long").alias(
            "groups_split_fast"
        ),
        F.sum((F.col("nm") > 1).cast("long")).cast("long").alias(
            "groups_split_md5"
        ),
    )


@_register(
    "knn_ivf_metric_consistency",
    "SELECT CAST(5 AS BIGINT) AS n_results,"
    " CAST(0 AS BIGINT) AS cos_mismatches",
)
def knn_ivf_metric_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ties the MLlib-KMeans IVF fast path ``knn_ivf_cells`` to the
    oracled exact metric: every (vec_id, cos_sim) the IVF query returns
    must carry EXACTLY the cosine the oracled brute-force scorer
    (``knn_bruteforce_cosine``) computes for that vector — the IVF path
    may search fewer candidates, but it must never score them differently
    (an arithmetic drift in its distance kernel turns this row red).  The
    constant oracle pins (k results, 0 mismatches).  Full top-k equality
    with any oracled twin is impossible by design and NOT asserted:
    MLlib's quantizer is a seeded iterative model DuckDB cannot
    reproduce, and n_probe=2 of 8 cells legitimately trades recall
    (measured 3/5 overlap with brute force at sf0.01) for a bounded
    candidate read — the recall BAND is pinned in pytest
    (tests/test_ml_lsh.py), the metric is pinned here.

    Scale: the re-score joins k rows against the broadcast query vector —
    driver-side cost is k, data-side one scan."""
    from reddit_sse_stream_spark.operators.ml_lsh import ivf_topk_cosine

    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ivf = ivf_topk_cosine(
        emb.filter(F.col("vec_id") != 0), list(qv), k=5, n_cells=8, n_probe=2
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    brute = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                similarity.cosine(
                    F.col("embedding").cast("array<double>"), F.col("qv")
                ),
                6,
            ).alias("cos_bf"),
        )
    )
    j = ivf.join(brute, "vec_id")
    return j.agg(
        F.count("*").cast("long").alias("n_results"),
        F.sum((F.col("cos_sim") != F.col("cos_bf")).cast("long"))
        .cast("long")
        .alias("cos_mismatches"),
    )


def _ivf_fixedpoint_ctes(
    n_cells: int = 8,
    iters: int = 2,
    dim: int = 64,
    train_pred: str | None = None,
    assign_pred: str | None = None,
) -> tuple[list[str], str]:
    """CTE list + final-assignment CTE name for the fixed-point Lloyd
    oracle (shared by ``knn_ivf_fixedpoint_cells``, the diversity
    subsample that builds on its cells, and — via ``train_pred`` /
    ``assign_pred`` — the incremental-assign twin, which trains the
    quantizer on one id subset and assigns a DIFFERENT subset with the
    final centroids)."""
    ctes = [
        f"ex0 AS (SELECT vec_id, unnest(range(0, {dim})) AS d,"
        " unnest(CAST(embedding AS DOUBLE[])) AS val FROM embeddings)",
        "nrm AS (SELECT vec_id, greatest(sqrt("
        "sum(CAST(floor(val * val * 1e12 + 0.5) AS BIGINT)) / 1e12), 1e-12) AS nrm"
        " FROM ex0 GROUP BY vec_id)",
        "ex AS (SELECT e.vec_id, e.d, e.val / n.nrm AS u"
        " FROM ex0 e JOIN nrm n USING (vec_id))",
    ]
    src_train = "ex"
    if train_pred:
        ctes.append(f"ext AS (SELECT * FROM ex WHERE {train_pred})")
        src_train = "ext"
    src_final = "ex"
    if assign_pred:
        ctes.append(f"exa AS (SELECT * FROM ex WHERE {assign_pred})")
        src_final = "exa"
    seed_where = f" WHERE {train_pred}" if train_pred else ""
    ctes += [
        "seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1"
        f" AS INTEGER) AS cell FROM (SELECT DISTINCT vec_id FROM ex0{seed_where}"
        f" ORDER BY vec_id LIMIT {n_cells}))",
        "cen0 AS (SELECT s.cell, e.d, e.u AS c FROM seed s JOIN ex e USING (vec_id))",
    ]
    for t in range(iters + 1):
        src = src_train if t < iters else src_final
        ctes.append(
            f"d{t} AS (SELECT e.vec_id, c.cell,"
            " sum(CAST(floor((e.u - c.c) * (e.u - c.c) * 1e12 + 0.5) AS BIGINT))"
            f" AS dist FROM {src} e JOIN cen{t} c USING (d) GROUP BY e.vec_id, c.cell)"
        )
        ctes.append(
            f"a{t} AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,"
            " row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk"
            f" FROM d{t}) WHERE rk = 1)"
        )
        if t < iters:
            ctes.append(
                f"cen{t + 1} AS (SELECT a.cell, e.d,"
                " (CAST(sum(CAST(floor(e.u * 1e6 + 0.5) AS BIGINT)) AS BIGINT)"
                " / 1e6) / count(*) AS c"
                f" FROM a{t} a JOIN ex e USING (vec_id) GROUP BY a.cell, e.d)"
            )
    return ctes, f"a{iters}"


def _ivf_fixedpoint_oracle(n_cells: int = 8, iters: int = 2, dim: int = 64) -> str:
    """Unrolled-CTE twin of :func:`ml_lsh.ivf_fixedpoint_cells`: identical
    fixed-point Lloyd rounds over an exploded (vec_id, d, val) layout —
    integer squared distances, row_number argmin with cell-id tiebreak,
    1e-6-quantized centroid means — so the final assignment matches bit
    for bit."""
    ctes, final = _ivf_fixedpoint_ctes(n_cells, iters, dim)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT vec_id, cell FROM {final}"


def _ivf_diverse_sample_oracle(k: int = 40) -> str:
    """Fixed-point IVF cells + the md5 hash-order per-cell cap: the
    diversity-subsample twin."""
    ctes, final = _ivf_fixedpoint_ctes()
    ctes.append(
        f"capped AS (SELECT vec_id, cell, CAST(row_number() OVER ("
        "PARTITION BY cell ORDER BY"
        " CAST(concat('0x', substr(md5('cap:' || CAST(vec_id AS VARCHAR)), 1, 15))"
        " AS BIGINT) ASC, vec_id ASC) AS INTEGER) AS pos"
        f" FROM {final})"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT vec_id, cell, pos FROM capped"
        f" WHERE pos <= {k}"
    )


def _ivf_incremental_oracle(
    n_cells: int = 8, iters: int = 2, dim: int = 64
) -> str:
    """Train the fixed-point quantizer on even vec_ids only, then assign
    the ODD ids with the final centroids — the unrolled twin of
    ivf_train(evens) + ivf_assign(model, odds)."""
    ctes, final = _ivf_fixedpoint_ctes(
        n_cells, iters, dim,
        train_pred="vec_id % 2 = 0",
        assign_pred="vec_id % 2 = 1",
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT vec_id, cell FROM {final}"


@_register("knn_ivf_incremental_assign", _ivf_incremental_oracle())
def knn_ivf_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE twin (operators/ml_lsh.py:ivf_assign): the IVF
    coarse quantizer trains ONCE on the existing corpus snapshot (even
    vec_ids) and every arriving batch (odd vec_ids) gets its partition
    column from a map-only assignment against the frozen centroid table
    — no retraining, no shuffle, no driver state beyond the plan-literal
    centroids.  This is how the 100 TB index actually lives: training is
    the bounded driver-synced part, ingest is a stateless projection
    that composes with readStream unchanged.  The oracle unrolls the
    SAME Lloyd rounds restricted to the training subset, then assigns
    the arriving subset with the final centroids — bit-identical cells."""
    from reddit_sse_stream_spark.operators.ml_lsh import ivf_assign, ivf_train

    emb = _t(spark, sf_dir, "embeddings")
    model = ivf_train(emb.where(F.col("vec_id") % 2 == 0))
    return ivf_assign(model, emb.where(F.col("vec_id") % 2 == 1))


@_register("knn_ivf_fixedpoint_cells", _ivf_fixedpoint_oracle())
def knn_ivf_fixedpoint_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORACLED IVF quantizer (operators/ml_lsh.py:ivf_fixedpoint_cells):
    deterministic fixed-point Lloyd rounds on the unit sphere, initial
    centroids = the 8 smallest-id vectors, integer argmin assignment —
    the (vec_id, cell) index frame a 100 TB deployment writes as its
    partition column, verified bit-for-bit against the unrolled-CTE SQL
    twin.  Complements ``knn_ivf_cells`` (seeded MLlib KMeans — the
    library-integration path, rows-only by design)."""
    from reddit_sse_stream_spark.operators.ml_lsh import ivf_fixedpoint_cells

    return ivf_fixedpoint_cells(_t(spark, sf_dir, "embeddings"))


@_register("corpus_diverse_sample", _ivf_diverse_sample_oracle())
def corpus_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware subsampling: cap membership PER SEMANTIC CELL of
    the deterministic IVF quantizer, keeping at most k=40 vectors from any
    region of embedding space — the curation move that stops a dense
    cluster (one template's thousand paraphrases) from dominating a
    sampled corpus the way ``corpus_cap_per_source`` stops one crawler-
    friendly site.  Pure composition of two oracled primitives: fixed-
    point Lloyd cells (``knn_ivf_fixedpoint_cells``) + the deterministic
    md5 hash-order cap (``operators/corpus.py:cap_per_group``), and so
    fully value-verified end to end.

    Scale: quantizer as documented on its own entry; the cap is one
    window over the cell key with WindowGroupLimit pushing the top-k
    below the exchange."""
    from reddit_sse_stream_spark.operators.ml_lsh import ivf_fixedpoint_cells

    cells = ivf_fixedpoint_cells(_t(spark, sf_dir, "embeddings"))
    return corpus.cap_per_group(cells, group_col="cell", k=40, id_col="vec_id")



# =========================================================================== #
# TPC-H completion (q7/q8/q9/q17/q21 shapes on the available tables)          #
# =========================================================================== #


@_register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sign(sum(CAST(floor((volume) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((volume) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipping between two nations, grouped by
    (supp_nation, cust_nation, year).  The nation table joins twice under
    different roles; both get static broadcast hints (25 rows), the
    fact-chain joins shuffle on key."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@_register(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round((sum(CAST(floor((CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                                 * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
                 / (sum(CAST(floor((volume) * 1000000 + 0.5) AS BIGINT)) / 1000000.0), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY')
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ECONOMY-part revenue inside a
    region, per order-year.  Eight-table join; nation/region/supplier carry
    broadcast hints, fact-scale part/orders/customer do not (AQE decides)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                _dsum_raw(F.when(F.col("nation") == "NATION_1", vol).otherwise(F.lit(0.0)))
                / _dsum_raw(vol),
                4,
            ).alias("mkt_share")
        )
    )


@_register(
    "tpch_q9_profit_by_nation_year",
    """
    SELECT nation, o_year, CAST(sign(sum(CAST(floor((volume) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((volume) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%')
    GROUP BY nation, o_year
    """,
)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: the testdata has no partsupp, so profit is
    revenue rather than revenue minus supplycost): per supplier-nation,
    per order-year, over parts whose name matches a substring."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_profit")
        )
    )


@_register(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT round((sum(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#17'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand's
    parts.  The correlated scalar subquery is rewritten as a pre-aggregated
    per-part threshold joined back — one extra shuffle keyed on l_partkey
    instead of a per-row subquery, the scalable decorrelation Spark's
    optimizer would also pick."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#17")
    thresh = (
        li.groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_thresh"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(thresh, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(_dsum_raw("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_register(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: l_shipdate stands in for the missing
    commit/receipt dates): suppliers whose line shipped LAST among
    multi-supplier finished orders.  The EXISTS / NOT EXISTS pair compiles
    to a left-semi and left-anti join, both shuffled on l_orderkey — no
    correlated per-row execution."""
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3_key"),
        F.col("l_suppkey").alias("s3_key"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("s3_key"))
            & (F.col("d3") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# =========================================================================== #
# LLM-pipeline additions: oracled n-gram Jaccard + skew-salted aggregation    #
# =========================================================================== #


#: grams seen in more than this many docs are excluded from CANDIDATE
#: GENERATION (never from the verify sets).  A no-op on every test scale
#: (max gram DF at sf0.1 is 10) but the unconditional hot-gram guard at
#: 100 TB: a stop-phrase in f docs costs f^2 join rows, and real corpus
#: dedup drops such grams outright (rare-gram selection).  A pair is
#: missed only if EVERY shared gram is hotter than the cap — at a 0.02
#: jaccard threshold over >=64-hot grams both docs are boilerplate the
#: exact-dedup / fingerprint passes already capture.
_JACCARD_DF_CAP = 64


@_register(
    "dedup_ngram_jaccard",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents WHERE doc_id % 5 = 0
    ),
    s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> CAST(concat('0x', substr(md5(
                      words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                    ), 1, 15)) AS BIGINT))) AS sh
      FROM w WHERE len(words) >= 3
    ),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cold AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 64),
    exc AS (SELECT e.doc_id, e.g FROM ex e JOIN cold USING (g)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM exc l JOIN exc r ON l.g = r.g AND l.doc_id < r.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
             floor(len(list_intersect(a.sh, b.sh)) * 10000.0
                   / len(list_distinct(list_concat(a.sh, b.sh)))) / 10000
               AS jaccard
      FROM cand c JOIN s a ON a.doc_id = c.doc_a JOIN s b ON b.doc_id = c.doc_b)
    WHERE jaccard > 0.02
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity over a subsampled documents
    slice — the near-dup family member with a full value-level DuckDB
    oracle.  Candidate pairs come from a shared-gram equi-join — jaccard
    > 0 requires a common gram, so gram-disjoint pairs cost nothing —
    the same sketch-then-verify geometry as the minhash path.

    Scale shape (r05, was the sweep's 3.9x worst scaler):

    * Grams are 60-bit md5 hashes (``dedup.md5_hash60`` / the identical
      ``concat('0x', substr(md5(..),1,15))::BIGINT`` in DuckDB) computed
      BEFORE candidate gen, so the gram shuffle and the verify's set ops
      move fixed-width longs, never gram strings.  Both engines hash with
      the same function, so jaccard over hashed sets is engine-identical;
      it deviates from string-set jaccard only on a 60-bit collision
      inside one pair's gram union (p < 2^-45 per pair).
    * Grams hotter than ``_JACCARD_DF_CAP`` docs are dropped from
      candidate generation only (see the cap's comment for the bound) —
      the unconditional guard against the f^2 stop-phrase blowup.
    * The hashed-gram frame is localCheckpoint(eager=False)-materialized
      once and feeds the exploded join plus both verify sides, instead of
      re-running the split/transform chain per consumer.

    floor-at-1e-4 keeps the double bit-identical across engines."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return _md5_jaccard_scored_pairs(docs).filter(F.col("jaccard") > 0.02)


@_register(
    "dedup_substring_containment",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> CAST(concat('0x', substr(md5(
                      words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                    ), 1, 15)) AS BIGINT))) AS sh
      FROM w WHERE len(words) >= 3
    ),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cold AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 64),
    exc AS (SELECT e.doc_id, e.g FROM ex e JOIN cold USING (g)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM exc l JOIN exc r ON l.g = r.g AND l.doc_id < r.doc_id
    ),
    t AS (
      SELECT c.doc_a, c.doc_b, a.text AS ta, b.text AS tb
      FROM cand c JOIN documents a ON a.doc_id = c.doc_a
                  JOIN documents b ON b.doc_id = c.doc_b)
    SELECT doc_a AS container_id, doc_b AS contained_id,
           len(tb) AS contained_chars
    FROM t
    WHERE contains(ta, tb)
      AND (len(ta) > len(tb) OR (len(ta) = len(tb) AND doc_a < doc_b))
    UNION ALL
    SELECT doc_b, doc_a, len(ta)
    FROM t
    WHERE contains(tb, ta)
      AND (len(tb) > len(ta) OR (len(tb) = len(ta) AND doc_b < doc_a))
    """,
)
def dedup_substring_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-containment dedup: find documents whose ENTIRE text
    appears verbatim inside another document — the page-plus-boilerplate /
    quoted-in-full duplication class that jaccard thresholds can miss when
    the container is much larger than the contained doc (jaccard =
    |contained|/|container| can be arbitrarily small while the contained
    doc is still 100% redundant).

    Sketch-then-verify, same geometry as the jaccard path: candidate pairs
    from the shared-cold-gram equi-join (``_md5_gram_frames``), verified
    with one ``instr`` per candidate on the raw texts.  Exactness bound:
    a contained doc of >= 5 words has at least one word-3-gram fully
    interior to the match span (only the boundary tokens of an arbitrary
    char-level match can be split), so it shares a gram with its container
    and — if any such gram is cold (``_JACCARD_DF_CAP``) — the pair is
    generated.  Ties (identical texts) emit one canonical row
    (container = smaller doc_id).

    Scale: candidate volume is the jaccard path's (bounded by the hot-gram
    cap); the verify joins only candidate ids back to the two text
    columns — no text ever crosses a shuffle except for candidate rows,
    and ``instr`` is one codegen call per pair."""
    docs = _t(spark, sf_dir, "documents")
    _, cand = _md5_gram_frames(docs)
    t = (
        cand.join(
            docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")),
            "doc_a",
        )
        .join(
            docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")),
            "doc_b",
        )
        .localCheckpoint(eager=False)  # one candidate materialization feeds both directions
    )
    la, lb = F.length("ta"), F.length("tb")
    ab = t.filter(
        (F.instr("ta", F.col("tb")) > 0)
        & ((la > lb) | ((la == lb) & (F.col("doc_a") < F.col("doc_b"))))
    ).select(
        F.col("doc_a").alias("container_id"),
        F.col("doc_b").alias("contained_id"),
        lb.cast("long").alias("contained_chars"),
    )
    ba = t.filter(
        (F.instr("tb", F.col("ta")) > 0)
        & ((lb > la) | ((lb == la) & (F.col("doc_b") < F.col("doc_a"))))
    ).select(
        F.col("doc_b").alias("container_id"),
        F.col("doc_a").alias("contained_id"),
        la.cast("long").alias("contained_chars"),
    )
    return ab.unionByName(ba)


def _md5_gram_frames(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(gram frame, candidate pairs) for the md5 word-3-gram family:
    ``s`` = (doc_id, sh array<long>) — 60-bit md5 gram hashes,
    localCheckpoint'd once so candidates and any verify stage share one
    materialization — and ``cand`` = distinct (doc_a < doc_b) pairs that
    share at least one cold gram (``_JACCARD_DF_CAP`` hot-gram drop: the
    unconditional guard against the f^2 stop-phrase blowup).  Shared by
    ``dedup_ngram_jaccard``, ``corpus_split_leakage_safe``, and
    ``dedup_substring_containment``.

    Adversarial bound (pinned:
    tests/test_operators.py::test_containment_gram_join_bounded_on_adversarial_corpus):
    a pathological gram shared by EVERY document is hot and dropped
    wholesale, so the pre-distinct equi-join work is
    Σ_cold df(g)² <= n_cold_grams * cap² — linear in distinct cold grams,
    never the all-pairs m² — while any pair sharing at least one cold
    gram keeps full recall.  (The r05 sweep's 4-6x rows are the synthetic
    60-word-vocab candidate artifact quantified in SCALING.md, not an
    unbounded blowup.)"""
    words = F.split(F.lower(F.col("text")), r"\s+")
    # explode-of-1-element-array barrier: materialize the token array once
    # per row so the shingle transform slices an attribute, not a
    # re-inlined split (see operators/text.py:word_ngrams)
    tok = docs.select("doc_id", F.explode(F.array(words)).alias("words")).filter(
        F.size("words") >= 3
    )
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("words") - 3),
            lambda i: dedup.md5_hash60(F.concat_ws(" ", F.slice("words", i + 1, 3))),
        )
    )
    s = tok.select("doc_id", sh.alias("sh")).localCheckpoint(eager=False)
    ex = s.select("doc_id", F.explode("sh").alias("g"))
    cold = ex.groupBy("g").count().filter(F.col("count") <= _JACCARD_DF_CAP).select("g")
    exc = ex.join(cold, "g")
    cand = (
        exc.select(F.col("doc_id").alias("doc_a"), "g")
        .join(exc.select(F.col("doc_id").alias("doc_b"), "g"), "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return s, cand


def _md5_jaccard_scored_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard) over shared-cold-gram candidate pairs: the
    md5-hashed word-3-gram jaccard kernel shared by ``dedup_ngram_jaccard``
    and ``corpus_split_leakage_safe`` (see the former's docstring for the
    scale shape: 60-bit gram hashes, ``_JACCARD_DF_CAP`` hot-gram drop,
    single checkpointed gram frame feeding candidates and both verify
    sides).  jaccard is floor-quantized at 1e-4 for engine-identical
    doubles; callers apply their own threshold."""
    s, cand = _md5_gram_frames(docs)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.floor(
        F.size(F.array_intersect("sh_a", "sh_b")) * 10000.0
        / F.size(F.array_union("sh_a", "sh_b"))
    ) / 10000.0
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


@_register(
    "agg_skew_salted_two_phase",
    """
    SELECT event_type, count(*) AS n, CAST(sign(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def agg_skew_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: a groupBy on a LOW-CARDINALITY key (a
    handful of event types over billions of rows at 100 TB) is salted into
    key x 32 subkeys for the wide partial aggregation, then re-aggregated —
    no single reducer absorbs a hot key's entire partial state.  (Spark's
    map-side partial agg already bounds this for algebraic aggregates; the
    pattern matters for high-cardinality-payload aggs like collect_list or
    exact distinct counts, and is shown here in its verifiable scalar
    form.)"""
    ev = _t(spark, sf_dir, "events")
    salted = ev.groupBy(
        "event_type", (F.col("event_id") % 32).alias("_salt")
    ).agg(F.count("*").alias("pn"), F.sum(_fp(F.col("value"))).alias("pv"))
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        _fp_round(F.sum("pv"), 2).alias("total_value"),
    )



@_register(
    "join_skew_salted",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sign(sum(CAST(floor((value * length(event_type)) * 1000000 + 0.5) AS BIGINT))) * floor((abs(sum(CAST(floor((value * length(event_type)) * 1000000 + 0.5) AS BIGINT))) + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS weighted_value
    FROM events
    GROUP BY event_type
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted broadcast-free join: joining a fact on a
    LOW-CARDINALITY hot key (event_type: a handful of values over billions
    of rows at 100 TB) would put each key's entire volume on one reducer.
    Salting replicates the dim side 32x on a synthetic salt and joins on
    (key, salt), spreading each hot key over 32 reducers; the final agg
    re-merges.  (AQE skew-join splits oversized partitions reactively; the
    salt is the deterministic, planner-independent form.)  The weight is a
    function of the key so DuckDB can verify the join's arithmetic without
    materializing the dim."""
    ev = _t(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("double"))
    )
    salts = spark.range(32).select(F.col("id").alias("_salt"))
    salted_dim = dim.crossJoin(salts)
    return (
        ev.withColumn("_salt", F.col("event_id") % 32)
        .join(salted_dim, ["event_type", "_salt"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            _dsum(F.col("value") * F.col("weight")).alias("weighted_value"),
        )
    )


@_register(
    "window_first_last_nth",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value window family.  last_value needs the full-frame
    ROWS spec (the default frame stops at CURRENT ROW); all three share one
    (o_custkey) partitioning, so the plan carries a single Exchange."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@_register(
    "fn_bitwise_ops",
    """
    SELECT event_id,
           event_id & 255 AS b_and,
           event_id | 4096 AS b_or,
           xor(event_id, 65535) AS b_xor,
           event_id << 2 AS b_shl,
           event_id >> 3 AS b_shr,
           CAST(bit_count(event_id) AS INTEGER) AS b_pop
    FROM events WHERE event_id < 500
    """,
)
def fn_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar battery: and/or/xor/shifts/popcount — all codegen
    expressions (X-series parity: the reference has no bit ops, these cover
    the §2.8 scalar surface)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    c = F.col("event_id")
    return ev.select(
        "event_id",
        c.bitwiseAND(F.lit(255)).alias("b_and"),
        c.bitwiseOR(F.lit(4096)).alias("b_or"),
        c.bitwiseXOR(F.lit(65535)).alias("b_xor"),
        F.shiftleft(c, 2).alias("b_shl"),
        F.shiftright(c, 3).alias("b_shr"),
        F.bit_count(c).alias("b_pop"),
    )



@_register(
    "llm_corpus_prep_pipeline",
    r"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
             floor((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    / greatest(length(text), 1))
                   * least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
                           / 50.0, 1.0) * 10000) / 10000.0 AS quality,
             substring(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16)
               AS fp
      FROM documents WHERE lang = 'en'),
    filtered AS (SELECT * FROM scored WHERE quality >= 0.5),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM filtered)
    SELECT doc_id, fp, n_tokens, quality FROM ranked WHERE rn = 1
    """,
)
def llm_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep as ONE Catalyst plan: language filter
    -> quality scoring -> content-fingerprint dedup (keep lowest doc_id) ->
    token accounting.  Everything up to the dedup window is per-row codegen
    over the scan (zero shuffle); the dedup is a single shuffle keyed on the
    16-byte fingerprint, never the text.  At 100 TB this plan's only wide
    exchange moves (fp, doc_id, n_tokens, quality) — the corpus body stays
    columnar in the scan stage."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    t = F.col("text")
    n_chars = F.length(t)
    n_words = text.token_count(t)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    quality = F.floor(
        (alpha / F.greatest(n_chars, F.lit(1)))
        * F.least(n_words.cast("bigint") / 50.0, F.lit(1.0))
        * 10000
    ) / 10000.0
    scored = docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_tokens"),
        quality.alias("quality"),
        text.fingerprint(t).alias("fp"),
    ).filter(F.col("quality") >= 0.5)
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "fp", "n_tokens", "quality")
    )



@_register(
    "fn_fuzzy_match_levenshtein",
    """
    WITH t AS (SELECT DISTINCT event_type FROM events)
    SELECT a.event_type AS t_a, b.event_type AS t_b,
           CAST(levenshtein(a.event_type, b.event_type) AS INTEGER) AS lev,
           CASE WHEN levenshtein(a.event_type, b.event_type) <= 3
                THEN 1 ELSE 0 END AS near
    FROM t a JOIN t b ON a.event_type < b.event_type
    """,
)
def fn_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (the key-canonicalization primitive of
    entity resolution): all distinct-value pairs with levenshtein distance
    and a near-match flag.  The distinct() shrinks the input to its value
    domain BEFORE the quadratic pair join — at 100 TB the pair space is
    |domain|^2, not |rows|^2."""
    ev = _t(spark, sf_dir, "events").select("event_type").distinct()
    a = ev.select(F.col("event_type").alias("t_a"))
    b = ev.select(F.col("event_type").alias("t_b"))
    lev = F.levenshtein("t_a", "t_b")
    return (
        a.join(b, F.col("t_a") < F.col("t_b"))
        .select(
            "t_a",
            "t_b",
            lev.alias("lev"),
            F.when(lev <= 3, 1).otherwise(0).alias("near"),
        )
    )


@_register(
    "text_chunk_windows",
    """
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
    ),
    idx AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 1, 1), 24)) AS start
      FROM w
    )
    SELECT doc_id,
           CAST((start - 1) / 24 AS BIGINT) AS chunk_idx,
           array_to_string(toks[start:start+31], ' ') AS chunk,
           CAST(len(toks[start:start+31]) AS BIGINT) AS n_tokens
    FROM idx
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (RAG / pretraining prep): split every
    document into 32-token windows with stride 24 (8-token overlap).
    Codegen-local: token split -> stride sequence -> explode -> slice —
    no shuffle at all, rows expand ~|tokens|/stride per doc.  At 100 TB
    this is the canonical pre-tokenization map stage; the 1-based slice
    and stride arithmetic are written identically in both engines."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1)), F.lit(24)
    )
    g = docs.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("start")
    )
    chunk = F.slice("toks", F.col("start"), 32)
    return g.select(
        "doc_id",
        ((F.col("start") - 1) / 24).cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


@_register(
    "text_rarity_score",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term
      FROM documents
    ),
    vocab AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY term
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id,
             CAST(10000 - floor(v.df * 10000.0 / n.n_docs) AS BIGINT) AS rarity
      FROM tok t JOIN vocab v ON v.term = t.term, n
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(rarity) AS BIGINT) AS rarity_sum,
           floor(sum(rarity) * 1.0 / count(*) * 10) / 10.0 AS avg_rarity
    FROM scored GROUP BY doc_id
    """,
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality signal (the deterministic cousin of
    perplexity filtering): score each document by the average rarity of
    its tokens, where rarity = 10000 - floor(df/N * 10000) from the
    corpus document-frequency table.  Two shuffles total: the vocab
    aggregate and the doc_id re-aggregate; the token->df join broadcasts
    when the vocabulary fits (AQE) and shuffles on the term otherwise.
    Fixed-point integer rarities make the per-doc SUM exact — no
    float-summation order sensitivity anywhere, so the oracle is
    bit-stable by construction (a real perplexity filter would swap
    rarity for an n-gram LM logprob; same plan shape)."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tok.join(vocab, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            (
                F.lit(10000)
                - F.floor(F.col("df") * 10000.0 / F.col("n_docs"))
            ).cast("long").alias("rarity"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("rarity").alias("rarity_sum"),
        (
            F.floor(F.sum("rarity") * 1.0 / F.count("*") * 10) / 10.0
        ).alias("avg_rarity"),
    )


@_register(
    "text_bigram_lm_bits",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(words)), i -> words[i])) AS w1,
             unnest(list_transform(range(1, len(words)),
                    i -> words[i] || ' ' || words[i+1])) AS bg
      FROM w WHERE len(words) >= 2
    ),
    bc AS (SELECT w1, bg, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY w1, bg),
    pc AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bc GROUP BY w1),
    j AS (
      SELECT b.doc_id, length(bin(p.c1)) - length(bin(c.c2)) AS bits
      FROM big b JOIN bc c USING (w1, bg) JOIN pc p USING (w1)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(bits) AS BIGINT) AS bits_sum,
           floor(sum(bits) * 100.0 / count(*)) / 100.0 AS avg_bits
    FROM j GROUP BY doc_id
    """,
)
def text_bigram_lm_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model surprise — the perplexity-proxy quality filter
    (rarity's conditional-context cousin): score each document by the mean
    information content of its bigrams under the corpus's own bigram MLE,
    surprise(w1 w2) = -log2 c(w1 w2)/c(w1 ·), quantized to WHOLE BITS via
    exact integer log2: floor(log2 n) = length(bin(n)) - 1 — a string
    length over the exact binary representation, bit-identical in Spark
    and DuckDB, with no floating log anywhere (Java Math.log and libm ln
    can differ in the last ulp, the cross-engine flake class this repo
    quantizes away; ``text_rarity_score`` documents the same design).
    Whole-bit resolution per bigram is coarse, but the per-doc mean over
    ~10^2 bigrams discriminates template text (low bits: predictable
    continuations) from organic text — and every count is its own
    training-corpus statistic, so no bigram is unseen and MLE needs no
    smoothing.

    Plan shape (same as rarity): bigram explode -> bigram-count shuffle ->
    prefix counts re-aggregated FROM the bigram counts (no second pass
    over the data) -> count join back (AQE broadcasts the count tables
    when the vocabulary fits) -> doc_id re-aggregate.  All integer sums —
    associative, order-independent."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), r"\s+")
    tok = docs.select("doc_id", F.explode(F.array(words)).alias("w")).filter(
        F.size("w") >= 2
    )
    big = tok.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.struct(
                    F.get("w", i).alias("w1"),
                    F.concat_ws(" ", F.slice("w", i + 1, 2)).alias("bg"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.bg")
    bc = big.groupBy("w1", "bg").agg(F.count("*").alias("c2"))
    pc = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    bits = (F.length(F.bin("c1")) - F.length(F.bin("c2"))).cast("long")
    return (
        big.join(bc, ["w1", "bg"])
        .join(pc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(bits).alias("bits_sum"),
            (F.floor(F.sum(bits) * 100.0 / F.count("*")) / 100.0).alias("avg_bits"),
        )
    )


@_register(
    "text_vocab_df",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term
      FROM documents
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS tf,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
           floor(count(DISTINCT doc_id) * 1.0
                 / (SELECT count(*) FROM documents) * 10000) / 10000.0
             AS doc_frac
    FROM tok GROUP BY term
    """,
)
def text_vocab_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (tokenizer-training stats): term frequency,
    document frequency, doc-fraction.  Partial agg shrinks the explode
    before the single term-keyed shuffle; the corpus-size denominator is a
    broadcast 1-row aggregate, not a driver collect."""
    return text.vocab_stats(_t(spark, sf_dir, "documents"))


@_register(
    "text_repetition_bigrams",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
      FROM words
    ),
    grams AS (
      SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram FROM idx
    ),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(count(DISTINCT gram) AS BIGINT) AS n_unique
      FROM grams GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, n_unique,
           floor((n_bigrams - n_unique) * 1.0
                 / greatest(n_bigrams, 1) * 10000) / 10000.0 AS dup_frac
    FROM per
    """,
)
def text_repetition_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection (Gopher-style repetition filter): duplicate
    word-bigram fraction per document.  Codegen-local n-gram expansion, one
    doc_id-keyed shuffle with map-side combine."""
    return text.repetition_score(_t(spark, sf_dir, "documents"))


@_register(
    "text_repetition_runs",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    gi AS (
      SELECT doc_id, words,
             unnest(generate_series(1, len(words) - 1)) AS i
      FROM w WHERE len(words) >= 2
    ),
    ex AS (SELECT doc_id, words[i] || ' ' || words[i + 1] AS gram FROM gi),
    cnt AS (SELECT doc_id, gram, count(*) AS c FROM ex GROUP BY doc_id, gram),
    top AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
             CAST(sum(c) AS BIGINT) AS n_2grams
      FROM cnt GROUP BY doc_id
    ),
    wi AS (
      SELECT doc_id, words, unnest(generate_series(1, len(words))) AS i
      FROM w
    ),
    wx AS (SELECT doc_id, i, words[i] AS word FROM wi),
    runs AS (
      SELECT doc_id, count(*) AS c FROM (
        SELECT doc_id, word,
               i - row_number() OVER (PARTITION BY doc_id, word ORDER BY i)
                 AS grp
        FROM wx
      ) GROUP BY doc_id, word, grp
    ),
    mr AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS max_word_run
      FROM runs GROUP BY doc_id
    )
    SELECT n.doc_id, CAST(len(n.words) AS BIGINT) AS n_words,
           COALESCE(t.n_2grams, 0) AS n_2grams,
           CASE WHEN COALESCE(t.n_2grams, 0) > 0
                THEN floor(t.top_cnt * 10000.0 / t.n_2grams) / 10000.0
                ELSE 0.0 END AS top_2gram_frac,
           m.max_word_run
    FROM w n
    LEFT JOIN top t USING (doc_id)
    JOIN mr m USING (doc_id)
    """,
)
def text_repetition_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode-frequency and stutter-run repetition signals
    (operators/text.py:repetition_runs): top-bigram fraction computed as
    the longest equal-run in the SORTED bigram array and the longest
    consecutive same-word run — both (prev, run, best) struct folds over
    F.aggregate, making the Spark side ONE map-only projection with zero
    shuffles (the oracle rebuilds the same values with explode + window
    gaps-and-islands — different plumbing, identical numbers).  Catches
    the degenerate-generation shapes a distinct-count dup fraction
    (text_repetition_bigrams) is blind to."""
    return text.repetition_runs(_t(spark, sf_dir, "documents"))


@_register(
    "text_clean_normalize",
    r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_raw,
           regexp_replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                          '[^a-z0-9 ]', '', 'g') AS text_clean,
           CAST(length(regexp_replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                                      '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS n_chars_clean,
           CAST(length(text)
                - length(regexp_replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                                        '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS n_removed
    FROM documents
    """,
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning to canonical form (case-fold, whitespace collapse,
    charset strip) with before/after counts (operators/corpus.py).  Pure
    codegen regexp chain, zero shuffles; patterns stay inside the
    Java/RE2 common dialect so the oracle is the same transformation."""
    out = corpus.clean_normalize(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_chars_raw").cast("bigint").alias("n_chars_raw"),
        "text_clean",
        F.col("n_chars_clean").cast("bigint").alias("n_chars_clean"),
        F.col("n_removed").cast("bigint").alias("n_removed"),
    )


@_register(
    "corpus_filter_gate",
    r"""
    WITH q AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_words,
             floor(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / greatest(length(text), 1) * 10000) / 10000.0 AS alpha_ratio
      FROM documents
    ),
    words AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
      FROM words
    ),
    grams AS (
      SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram FROM idx
    ),
    rep AS (
      SELECT doc_id,
             floor((count(*) - count(DISTINCT gram)) * 1.0
                   / greatest(count(*), 1) * 10000) / 10000.0 AS dup_frac
      FROM grams GROUP BY doc_id
    ),
    flags AS (
      SELECT d.doc_id,
             CAST(q.n_words >= 30 AS INTEGER) AS len_ok,
             CAST(q.alpha_ratio >= 0.8 AS INTEGER) AS alpha_ok,
             CAST(rep.dup_frac <= 0.05 AS INTEGER) AS rep_ok,
             CAST(d.lang = 'en' AS INTEGER) AS lang_ok
      FROM documents d JOIN q USING (doc_id) JOIN rep USING (doc_id)
    )
    SELECT doc_id, len_ok, alpha_ok, rep_ok, lang_ok,
           CAST(len_ok = 1 AND alpha_ok = 1 AND rep_ok = 1 AND lang_ok = 1
                AS INTEGER) AS keep
    FROM flags
    """,
)
def corpus_filter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's final keep/drop verdict with per-reason audit flags
    (operators/corpus.py): quality length/alpha bands + repetition cap +
    metadata language gate.  One doc_id-keyed shuffle (the repetition
    aggregate); every flag and the verdict are codegen-local."""
    return corpus.filter_gate(_t(spark, sf_dir, "documents"))


@_register(
    "corpus_train_val_split",
    """
    SELECT doc_id,
           CASE WHEN CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))
                     AS BIGINT) / 1152921504606846976.0 < 0.1
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val assignment (operators/corpus.py):
    membership is a pure function of doc_id, stable across reruns, cluster
    sizes, and engines — no document silently migrates between splits.
    Zero shuffles."""
    return corpus.train_val_split(_t(spark, sf_dir, "documents"), val_frac=0.1)


@_register(
    "corpus_split_leakage_safe",
    r"""
    WITH RECURSIVE w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> CAST(concat('0x', substr(md5(
                      words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                    ), 1, 15)) AS BIGINT))) AS sh
      FROM w WHERE len(words) >= 3
    ),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cold AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 64),
    exc AS (SELECT e.doc_id, e.g FROM ex e JOIN cold USING (g)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM exc l JOIN exc r ON l.g = r.g AND l.doc_id < r.doc_id
    ),
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN s a ON a.doc_id = c.doc_a JOIN s b ON b.doc_id = c.doc_b
      WHERE floor(len(list_intersect(a.sh, b.sh)) * 10000.0
                  / len(list_distinct(list_concat(a.sh, b.sh)))) / 10000 >= 0.5
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, wk.comp FROM walk wk JOIN edges e ON wk.id = e.src),
    comp AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
    labeled AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_rep
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
    SELECT doc_id, cluster_rep,
           CASE WHEN CAST(concat('0x', substr(md5('split:' || CAST(cluster_rep AS VARCHAR)), 1, 15))
                     AS BIGINT) / 1152921504606846976.0 < 0.1
                THEN 'val' ELSE 'train' END AS split
    FROM labeled
    """,
)
def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split (operators/corpus.py:split_leakage_safe):
    near-dup clusters (md5-gram jaccard >= 0.5 -> connected components)
    are split as a UNIT, so no validation document has a training-set
    near-twin — the eval-contamination guarantee a plain hash split lacks.
    Singletons hash exactly as in ``corpus_train_val_split`` (same salt,
    same rule), so turning this on only ever merges near-dup assignments.

    Oracle: the jaccard edge CTE from ``dedup_ngram_jaccard`` + the
    WITH RECURSIVE reachability components from ``dedup_cc_clusters`` +
    the md5 split rule from ``corpus_train_val_split`` — fully
    value-checked end to end.

    Hot-gram drop caveat (same bound as ``dedup_ngram_jaccard``): a pair
    whose shared grams are ALL hotter than ``_JACCARD_DF_CAP`` escapes
    candidate generation — at jaccard >= 0.5 that needs every shared gram
    in >64 docs, i.e. a boilerplate-only near-dup, which corpus dedup
    drops upstream anyway.  Identical in both engines, so the oracle
    still matches.

    Scale: CC runs on the (tiny) pair graph; the corpus joins the label
    frame once on doc_id (broadcast at these sizes, shuffle at 100 TB);
    split hashing is codegen."""
    docs = _t(spark, sf_dir, "documents")
    pairs = _md5_jaccard_scored_pairs(docs).filter(F.col("jaccard") >= 0.5)
    return corpus.split_leakage_safe(docs, pairs, val_frac=0.1)


@_register(
    "corpus_shard_assignments",
    """
    WITH h AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 16 AS shard,
             CAST(concat('0x', substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) / 1152921504606846976.0 AS order_u
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY order_u, doc_id)
                AS INTEGER) AS pos
    FROM h
    """,
)
def corpus_shard_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training shards with a reproducible within-shard shuffle order
    (operators/corpus.py): shard = hash mod n, position from an
    independent salted hash — the deterministic global shuffle a data
    loader consumes.  One exchange on the shard key, which at 100 TB is
    the write partitioning itself."""
    return corpus.shard_assignments(_t(spark, sf_dir, "documents"), n_shards=16)


@_register(
    "dedup_bloom_fp_audit",
    """
    WITH c AS (
      SELECT DISTINCT md5(text) AS dg,
             CAST(concat('0x', substr(md5(md5(text)), 1, 15)) AS BIGINT)
               % 256 AS b
      FROM documents WHERE doc_id % 2 = 0),
    occ AS (SELECT DISTINCT b FROM c),
    kn AS (SELECT DISTINCT dg FROM c),
    bt AS (
      SELECT md5(text) AS dg,
             CAST(concat('0x', substr(md5(md5(text)), 1, 15)) AS BIGINT)
               % 256 AS b
      FROM documents WHERE doc_id % 2 = 1),
    t AS (
      SELECT EXISTS (SELECT 1 FROM occ WHERE occ.b = bt.b) AS occ,
             EXISTS (SELECT 1 FROM kn WHERE kn.dg = bt.dg) AS known
      FROM bt)
    SELECT CAST(count(*) AS BIGINT) AS n_batch,
           CAST(sum(CASE WHEN NOT occ THEN 1 ELSE 0 END) AS BIGINT)
             AS n_definitely_new,
           CAST(sum(CASE WHEN occ AND NOT known THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positives,
           CAST(sum(CASE WHEN occ AND known THEN 1 ELSE 0 END) AS BIGINT)
             AS n_known,
           CAST(sum(CASE WHEN NOT occ AND known THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_negatives,
           CAST(floor(sum(CASE WHEN occ AND NOT known THEN 1 ELSE 0 END)
                 * 1.0 / greatest(sum(CASE WHEN NOT known THEN 1 ELSE 0 END),
                                  1) * 10000) AS BIGINT) AS fp_rate_x1e4
    FROM t
    """,
)
def dedup_bloom_fp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """False-positive audit of the Bloom prefilter
    (operators/dedup.py:bloom_fp_audit) — the dedup family's measured
    self-audit alongside dedup_lsh_recall_audit and knn_pq_recall_audit:
    one row classifying the odd-id batch against the even-id corpus
    through a deliberately small 256-bucket filter, reporting the
    no-false-negative invariant (always 0 — a known digest cannot land
    in an unoccupied bucket) and the measured FP rate the production
    sizing trades against memory.  The md5 bucket twin makes every
    classification value-verifiable in SQL; the operator's xxhash64
    default is the fast path (same twin convention as minhash)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.bloom_fp_audit(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        md5_buckets=True,
    )


@_register(
    "text_gopher_gate",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> len(x) > 0) AS ws,
             lower(text) AS lt
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             greatest(len(ws), 1) AS denom,
             COALESCE(list_aggregate(list_transform(ws, x -> len(x)), 'sum'),
                      0) AS chars,
             len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
               AS alpha_words,
             CAST(list_contains(ws, 'the') AS BIGINT)
               + CAST(list_contains(ws, 'be') AS BIGINT)
               + CAST(list_contains(ws, 'to') AS BIGINT)
               + CAST(list_contains(ws, 'of') AS BIGINT)
               + CAST(list_contains(ws, 'and') AS BIGINT)
               + CAST(list_contains(ws, 'that') AS BIGINT)
               + CAST(list_contains(ws, 'have') AS BIGINT)
               + CAST(list_contains(ws, 'with') AS BIGINT) AS n_stop,
             (len(lt) - len(replace(lt, '#', '')))
               + (len(lt) - len(replace(lt, '...', ''))) / 3 AS symbols
      FROM w),
    q AS (
      SELECT doc_id, n_words, n_stop,
             floor(chars * 1.0 / denom * 10000) / 10000.0 AS mean_word_len,
             floor(alpha_words * 1.0 / denom * 10000) / 10000.0
               AS frac_alpha_words,
             floor(symbols * 1.0 / denom * 10000) / 10000.0 AS symbol_ratio
      FROM m)
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
           CAST(n_stop AS BIGINT) AS n_stop_hits, symbol_ratio,
           CAST(n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3.0 AND 10.0
                AND symbol_ratio <= 0.1
                AND frac_alpha_words >= 0.8
                AND n_stop >= 1 AS INTEGER) AS keep
    FROM q
    """,
)
def text_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named Gopher quality-rule bundle (operators/text.py:gopher_gate,
    Rae et al. 2021): word-count bounds, mean-word-length band,
    symbol-to-word ratio, alphabetic-word fraction, and the 8-stopword
    presence rule, each reported as its measured value plus the composite
    keep flag — the literature's exact gate alongside this engine's
    generic quality_score features.  ONE map-only projection, zero
    shuffles; ratios floor-quantized at 1e-4 so both engines cut
    identically at the threshold boundary.  The catalog entry runs
    min_stop=1 (the fixture's ~60-word vocabulary contains exactly one of
    the paper's 8 stopwords, so the paper's >= 2 would make the flag
    vacuously false); the operator default keeps the paper's 2."""
    return text.gopher_gate(_t(spark, sf_dir, "documents"), min_stop=1)


@_register(
    "quota_admission_per_author",
    f"""
    WITH {FEED_CTE},
    r AS (
      SELECT author, created_utc // 3600 AS hour, id,
             row_number() OVER (PARTITION BY author, created_utc // 3600
                                ORDER BY created_utc, id) AS rn
      FROM feed)
    SELECT author, CAST(hour AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_seen,
           CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_admitted,
           string_agg(CASE WHEN rn <= 3 THEN CAST(id AS VARCHAR) END, ','
                      ORDER BY id) AS admitted_ids
    FROM r GROUP BY author, hour
    """,
)
def quota_admission_per_author(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key quota admission (rate limiting): at most 3 events per
    author per hour pass the gate, earliest by (created_utc, id) — the
    abuse/flood-control pass a feed engine puts in front of its sink,
    generalizing the reference's single global poll-rate knob (CPS=5,
    sse.py:110,243-250) to a PER-KEY quota.  Per (author, hour): events
    seen, events admitted, and the exact admitted ids.  Streaming twin
    with keyed managed state: streaming/stateful.py:
    streaming_quota_admission (batch/stream parity pinned in
    tests/test_streaming.py).

    Scale shape: ONE (author, hour)-keyed exchange serves both the
    row_number cut and the summary aggregate; state in the streaming
    twin is a single long per active (author, hour) — quota enforcement
    at 100 TB is a map-side filter after a key-partitioned shuffle, not
    a global coordination point."""
    fd = feed_df(spark, sf_dir)
    hour = F.floor(F.col("created_utc") / 3600).cast("long")
    w = Window.partitionBy("author", "hour").orderBy("created_utc", "id")
    r = fd.select("author", hour.alias("hour"), "created_utc", "id").select(
        "author", "hour", "id", (F.row_number().over(w) <= 3).alias("adm")
    )
    return r.groupBy("author", "hour").agg(
        F.count("*").cast("long").alias("n_seen"),
        F.sum(F.col("adm").cast("long")).cast("long").alias("n_admitted"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.when(F.col("adm"), F.col("id")))),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("admitted_ids"),
    )


@_register(
    "corpus_batch_lineage",
    """
    WITH h AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 16 AS shard,
             CAST(concat('0x', substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) / 1152921504606846976.0 AS order_u
      FROM documents),
    p AS (
      SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY order_u, doc_id)
                  AS INTEGER) AS pos
      FROM h),
    m AS (
      SELECT p.doc_id, p.shard,
             CAST(((p.pos - 1) // 4) * 16 + p.shard AS BIGINT) AS step,
             d.n_chars
      FROM p JOIN documents d USING (doc_id)
      WHERE ((p.pos - 1) // 4) * 16 + p.shard >= 16
        AND ((p.pos - 1) // 4) * 16 + p.shard < 48)
    SELECT step,
           CAST(max(shard) AS INTEGER) AS shard,
           CAST(step // 16 AS INTEGER) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
    FROM m GROUP BY step
    """,
)
def corpus_batch_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-batch lineage forensics (operators/corpus.py:batch_lineage):
    "the loss spiked at step t — which documents were in that batch?"
    answered by pure arithmetic on the deterministic shard/pos shuffle
    (batch_id = (pos-1)//B, step = batch_id*n_shards + shard), no
    training-run logs needed — per step in [16, 48): consuming shard,
    batch, member count, char mass, and the exact sorted member-id list.
    Map-side step filter BEFORE the per-step aggregate, so lineage for a
    few suspect steps prunes to (window x B) rows."""
    return corpus.batch_lineage(_t(spark, sf_dir, "documents"))


@_register(
    "embed_quantize_int8",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
    ),
    s AS (
      SELECT vec_id, x,
             greatest(list_max(list_transform(x, e -> abs(e))), 1e-30) AS scale
      FROM v
    ),
    idx AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS d)
    SELECT vec_id,
           CAST(floor(scale * 1000000) AS BIGINT) AS scale_fp6,
           d,
           CAST(floor(x[d + 1] / scale * 127 + 0.5) AS INTEGER) AS q,
           floor(list_max(list_transform(x,
                 e -> abs(e - floor(e / scale * 127 + 0.5) * scale / 127)))
                 * 1000000) / 1000000.0 AS max_err
    FROM s CROSS JOIN idx
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxabs int8 scalar quantization of the embedding column with
    per-vector reconstruction error (operators/corpus.py) — the standard
    compression step before an ANN index or training shard.  Codegen
    Column algebra, one scan, zero shuffles; the (x, scale) pair sits
    behind an explode-array barrier so the scale reduction is not
    re-inlined per element.

    Catalog wrapper flattens ``qvec`` to ``(vec_id, d, q)`` via posexplode
    (oracle: range(64) index join) because the external checker's
    canonicalizer hashes scalar cells only — the library operator in
    operators/corpus.py keeps returning the array."""
    out = corpus.quantize_embeddings_int8(_t(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id",
        "scale_fp6",
        F.posexplode("qvec").alias("d", "q"),
        "max_err",
    )


def _rp_sign_sql(j: int) -> str:
    """DuckDB twin of corpus.rp_signs: CASE-on-md5 of the identical salted
    string, so both engines project through the same ±1 matrix."""
    return (
        "(CASE WHEN CAST(concat('0x', substr(md5('rp:' || CAST(d AS VARCHAR) "
        f"|| ':{j}'), 1, 15)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END)"
    )


@_register(
    "embed_random_projection",
    f"""
    WITH idx AS (SELECT unnest(range(64)) AS d),
    e AS (
      SELECT vec_id, d, CAST(embedding[d + 1] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN idx
    )
    SELECT vec_id,
      {",".join(
        f"sum(CAST(floor(v * {_rp_sign_sql(j)} * 1000000 + 0.5) AS BIGINT))"
        f" / 1000000.0 AS proj_{j}"
        for j in range(8)
      )}
    FROM e GROUP BY vec_id
    """,
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed random projection 64→8 (operators/corpus.py): the Achlioptas
    ±1 dimensionality-reduction sketch, accumulated in exact fixed point so
    the components are bit-identical across partitionings and engines.
    Spark bakes the md5-derived sign matrix into the plan as literals
    (map-only, zero shuffles); the oracle recomputes the same signs via
    CASE-on-md5 over an exploded index — same matrix, different plumbing,
    byte-equal projections."""
    return corpus.random_projection_sketch(_t(spark, sf_dir, "embeddings"))


@_register(
    "layout_zorder_keys",
    f"""
    SELECT event_id,
           {layout.morton_key_sql('(user_id % 65536)', '(event_id % 65536)')}
           AS zkey
    FROM events
    """,
)
def layout_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, event_id)
    (operators/layout.py): the bit-interleaved key whose range partitioning
    gives every output file a compact rectangle in both dimensions, so
    min-max pruning works for predicates on EITHER column — the layout
    step a 100 TB table runs before its clustered write.  Pure codegen
    shift/and/or chain, zero shuffles here (the write's
    repartitionByRange is the only exchange, exercised in
    tests/test_storage_layout.py)."""
    ev = _t(spark, sf_dir, "events")
    m = F.lit(1 << 16)
    return ev.select(
        "event_id",
        layout.morton_key(
            F.pmod(F.col("user_id"), m), F.pmod(F.col("event_id"), m), 16
        ).alias("zkey"),
    )


@_register(
    "corpus_cap_per_source",
    """
    WITH h AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM documents),
    r AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY hv, doc_id)
                  AS INTEGER) AS pos
      FROM h)
    SELECT doc_id, source, pos FROM r WHERE pos <= 20
    """,
)
def corpus_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source anti-dominance cap (operators/corpus.py:cap_per_group):
    at most 20 docs per source, selected by deterministic salted-hash
    order.  The pos <= k filter over row_number becomes WindowGroupLimit
    (partial per-task top-k BEFORE the group-key exchange), so hot
    sources ship ~k rows per upstream partition at 100 TB instead of
    their full membership."""
    return corpus.cap_per_group(_t(spark, sf_dir, "documents"), "source", 20)


@_register(
    "embed_standardize",
    """
    WITH idx AS (SELECT unnest(range(64)) AS d),
    ev AS (
      SELECT vec_id, d, CAST(embedding[d + 1] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN idx),
    st AS (
      SELECT d,
             (sum(CAST(floor(v * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
               / count(*) AS mean,
             (sum(CAST(floor(v * v * 1000000 + 0.5) AS BIGINT)) / 1000000.0)
               / count(*) AS ex2
      FROM ev GROUP BY d),
    sd AS (
      SELECT d, mean,
             greatest(sqrt(greatest(ex2 - mean * mean, 0.0)), 1e-12) AS std
      FROM st)
    SELECT vec_id, CAST(d AS INTEGER) AS d, (v - mean) / std AS z
    FROM ev JOIN sd USING (d)
    """,
)
def embed_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization
    (operators/corpus.py:standardize_embeddings): corpus-wide mean/std per
    dimension from exact fixed-point moments (bit-identical sums in both
    engines), folded into one broadcast stats row, then a map-only
    zip_with standardize — the full arrays never cross a shuffle.  Every
    output double is the same IEEE value on both sides, no quantization
    needed.

    Catalog wrapper flattens ``zvec`` to ``(vec_id, d, z)`` via posexplode
    (oracle: the already-exploded ev frame) because the external checker's
    canonicalizer hashes scalar cells only — the library operator in
    operators/corpus.py keeps returning the array."""
    out = corpus.standardize_embeddings(_t(spark, sf_dir, "embeddings"))
    return out.select("vec_id", F.posexplode("zvec").alias("d", "z"))


def _pca_power_oracle(iters: int = 4) -> str:
    """Unrolled-CTE twin of :func:`corpus.pca_top_component`: the same
    fixed-point power iteration, one CTE block per round.  Every
    accumulation is an int64 sum of floor-quantized addends and every
    scalar step a single IEEE op, so the iterates — and therefore the
    final projections — are bit-identical to the Spark+driver-Python
    computation (see the operator docstring for the op-by-op argument)."""
    ctes = [
        "ex AS (SELECT vec_id, unnest(range(0, 64)) AS d,"
        " unnest(CAST(embedding AS DOUBLE[])) AS val FROM embeddings)",
        "nn AS (SELECT count(*) AS n FROM embeddings)",
        "v0 AS (SELECT unnest(range(0, 64)) AS d, 0.125 AS val)",
    ]
    for t in range(iters):
        ctes += [
            f"dot{t} AS (SELECT e.vec_id,"
            " sum(CAST(floor(e.val * v.val * 1e12 + 0.5) AS BIGINT)) AS dfp"
            f" FROM ex e JOIN v{t} v USING (d) GROUP BY e.vec_id)",
            f"s{t} AS (SELECT e.d,"
            " sum(CAST(floor(e.val * (dd.dfp / 1e12) * 1e9 + 0.5) AS BIGINT)) AS sfp"
            f" FROM ex e JOIN dot{t} dd USING (vec_id) GROUP BY e.d)",
            f"u{t} AS (SELECT d, (sfp / 1e9) / nn.n AS w FROM s{t}, nn)",
            f"n{t} AS (SELECT greatest(sqrt("
            "sum(CAST(floor(w * w * 1e12 + 0.5) AS BIGINT)) / 1e12), 1e-12) AS nrm"
            f" FROM u{t})",
            f"v{t + 1} AS (SELECT d, floor(w / nrm * 1e6 + 0.5) / 1e6 AS val"
            f" FROM u{t}, n{t})",
        ]
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT e.vec_id,"
        " floor((sum(CAST(floor(e.val * v.val * 1e12 + 0.5) AS BIGINT)) + 500000)"
        " / 1e6) / 1e6 AS pc1"
        f"\nFROM ex e JOIN v{iters} v USING (d) GROUP BY e.vec_id"
    )


@_register("embed_pca_power_iteration", _pca_power_oracle())
def embed_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-component projection by power iteration
    (operators/corpus.py:pca_top_component): 4 fixed rounds of
    v <- normalize(X^T X v) with every accumulation in exact int64 fixed
    point, then each vector's pc1 = <x, v> rounded half-up at 1e-6 in
    integer space.  The canonical ITERATIVE distributed-linear-algebra
    shape: per-round one map pass + a 64-key aggregate, model vector as
    driver state (a 64-long parameter-server step, not a data collect);
    the oracle unrolls the identical rounds as CTEs and matches bit for
    bit — no tolerance band."""
    return corpus.pca_top_component(_t(spark, sf_dir, "embeddings"))


def _kmeans_oracle(k: int = 4, iters: int = 3) -> str:
    """Unrolled-CTE twin of :func:`corpus.kmeans_fixedpoint`: the same
    quantize / assign / floor-mean update rounds, one CTE block per
    iteration.  Every distance is an int64 sum of integer products and
    every centroid coordinate one IEEE floor(double-quotient), so the
    assignments and dist2_fp match the Spark+driver computation bit for
    bit (see the operator docstring for the op-by-op argument)."""
    ctes = [
        "ex AS (SELECT vec_id, CAST(ix.d AS INTEGER) AS d,"
        " CAST(floor(CAST(embedding[ix.d + 1] AS DOUBLE) * 1000000 + 0.5)"
        " AS BIGINT) AS xq"
        " FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS d) ix)",
        f"init AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})",
        "c0 AS (SELECT CAST(dense_rank() OVER (ORDER BY e.vec_id) - 1"
        " AS INTEGER) AS cluster, e.d, e.xq FROM ex e JOIN init USING (vec_id))",
    ]
    for t in range(1, iters + 1):
        prev = f"c{t - 1}"
        ctes += [
            f"dist{t} AS (SELECT e.vec_id, c.cluster,"
            " CAST(sum((e.xq - c.xq) * (e.xq - c.xq)) AS BIGINT) AS dist2"
            f" FROM ex e JOIN {prev} c USING (d) GROUP BY e.vec_id, c.cluster)",
            f"a{t} AS (SELECT vec_id, cluster FROM ("
            " SELECT vec_id, cluster,"
            " row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster)"
            f" AS rk FROM dist{t}) WHERE rk = 1)",
            f"s{t} AS (SELECT a.cluster, e.d,"
            " CAST(floor(CAST(sum(e.xq) AS DOUBLE) / count(*)) AS BIGINT) AS xq"
            f" FROM a{t} a JOIN ex e USING (vec_id) GROUP BY a.cluster, e.d)",
            f"c{t} AS (SELECT p.cluster, p.d, COALESCE(s.xq, p.xq) AS xq"
            f" FROM {prev} p LEFT JOIN s{t} s"
            " ON s.cluster = p.cluster AND s.d = p.d)",
        ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    distF AS (
      SELECT e.vec_id, c.cluster,
             CAST(sum((e.xq - c.xq) * (e.xq - c.xq)) AS BIGINT) AS dist2
      FROM ex e JOIN c{iters} c USING (d) GROUP BY e.vec_id, c.cluster)
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, dist2 AS dist2_fp
    FROM (
      SELECT vec_id, cluster, dist2,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster)
               AS rk
      FROM distF) WHERE rk = 1"""
    )


@_register(
    "embed_matryoshka_retention",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               v -> CAST(floor(v * v * 1000000 + 0.5) AS BIGINT)) AS q2
      FROM embeddings
    ),
    s AS (
      SELECT vec_id,
             CAST(list_sum(q2) AS BIGINT) AS norm2_fp6,
             CAST(list_sum(q2[1:8]) AS BIGINT) AS s8,
             CAST(list_sum(q2[1:16]) AS BIGINT) AS s16,
             CAST(list_sum(q2[1:32]) AS BIGINT) AS s32
      FROM q
    )
    SELECT vec_id, norm2_fp6,
           floor(s8 * 10000.0 / greatest(norm2_fp6, 1)) / 10000.0 AS ret_8,
           floor(s16 * 10000.0 / greatest(norm2_fp6, 1)) / 10000.0 AS ret_16,
           floor(s32 * 10000.0 / greatest(norm2_fp6, 1)) / 10000.0 AS ret_32
    FROM s
    """,
)
def embed_matryoshka_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm retention of matryoshka prefix truncations (8/16/32 of 64
    dims) per vector (operators/corpus.py:matryoshka_norm_retention) —
    the go/no-go audit before serving truncated vectors to a coarse ANN
    stage.  Exact int64 fixed-point squared norms, prefix sums by slicing
    the same quantized addends, one floor per ratio: map-only, zero
    shuffles, zero Python; hash-stable against the DuckDB list twin."""
    return corpus.matryoshka_norm_retention(_t(spark, sf_dir, "embeddings"))


@_register("embed_kmeans_fixedpoint", _kmeans_oracle())
def embed_kmeans_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Lloyd's k-means (k=4, 3 rounds) over the embedding
    column (operators/corpus.py:kmeans_fixedpoint) — the semantic-
    clustering step before cluster-balanced sampling or SemDeDup-style
    per-cluster pruning.  Centroids are driver-held k·dim ints baked into
    each round's map pass as literals (parameter-server shape, never a
    data collect); distances are int64 folds behind an explode barrier;
    centroid updates floor an exact < 2^53 quotient — so assignments AND
    squared distances are bit-identical cross-engine, verified against a
    3-round unrolled-CTE oracle with no tolerance band.  The reference
    has no clustering at all (sse.py is equality filters over a feed);
    this serves the training-data curation surface."""
    return corpus.kmeans_fixedpoint(_t(spark, sf_dir, "embeddings"))


@_register(
    "corpus_mix_schedule",
    r"""
    WITH t AS (
      SELECT source,
             CAST(sum(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    w AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS w_fp
      FROM t),
    g AS (SELECT *, CAST(sum(w_fp) OVER () AS BIGINT) AS w_total FROM w),
    b AS (
      SELECT *, (1000000 * w_fp) // w_total AS base,
             (1000000 * w_fp) % w_total AS rem
      FROM g),
    d AS (
      SELECT *, 1000000 - CAST(sum(base) OVER () AS BIGINT) AS deficit,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM b)
    SELECT source, n_tokens,
           CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM d
    """,
)
def corpus_mix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch token-budget allocation across sources
    (operators/corpus.py:mix_schedule): sqrt-weighted shares with
    largest-remainder integer rounding, so allocations are whole tokens
    summing to exactly the 1M budget.  All scheduling math is integer
    DIV/% against exact fixed-point weights — bit-reproducible across
    engines and shuffle orders.  One map-combined groupBy on source;
    the windows run over the dimension-sized per-source frame."""
    return corpus.mix_schedule(_t(spark, sf_dir, "documents"), budget=1_000_000)


#: Deterministic PII augmentation for text_pii_redact: the synthetic corpus
#: carries no emails/IPs/phones, so the query plants one of each — derived
#: from doc_id, identically in both engines — and then redacts them.  The
#: oracle therefore verifies the regex chain's VALUES, not just its plumbing.
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com from 10.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0')"
)

_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4_SQL = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_PHONE_SQL = "\\b\\d{3}-\\d{3}-\\d{4}\\b"


@_register(
    "text_pii_redact",
    f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents),
    s1 AS (
      SELECT doc_id, text,
             regexp_replace(text, '{_PII_EMAIL_SQL}', '[EMAIL]', 'g') AS t1
      FROM aug),
    s2 AS (
      SELECT *, regexp_replace(t1, '{_PII_IPV4_SQL}', '[IP]', 'g') AS t2
      FROM s1)
    SELECT doc_id,
           regexp_replace(t2, '{_PII_PHONE_SQL}', '[PHONE]', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL_SQL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t1, '{_PII_IPV4_SQL}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(t2, '{_PII_PHONE_SQL}')) AS BIGINT) AS n_phone
    FROM s2
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/corpus.py pii_redact): emails → [EMAIL],
    IPv4 → [IP], dash phones → [PHONE], with sequential per-category match
    counts.  Runs over deterministically-augmented text (one planted PII
    item per category, derived from doc_id the same way in both engines)
    because the synthetic corpus carries none naturally — so the oracle
    checks the redacted VALUES, not a no-op.  Pure codegen regexp chain,
    zero shuffles."""
    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" tel 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") * 3) % 10000).cast("string"), 4, "0"),
    )
    return corpus.pii_redact(d.select("doc_id", aug.alias("text")))


@_register(
    "decontam_ngram_overlap",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i
      FROM words
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram FROM idx
    ),
    ev AS (SELECT doc_id AS eval_id, gram FROM grams WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 <> 0)
    SELECT tr.doc_id,
           CAST(count(DISTINCT tr.gram) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
    FROM tr JOIN ev ON tr.gram = ev.gram
    GROUP BY tr.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    5-gram with the held-out eval slice (doc_id % 97 == 0 — deterministic
    stand-in for a benchmark suite).  The join key is xxhash64(gram) — an
    8-byte long instead of a 40-60 byte gram string, which cut the gram
    shuffle (this repo's worst scaler when string-keyed) to a fraction of
    its width; distinct-gram counts over the hash equal counts over the
    string modulo 2^-64 collisions, and the string-keyed DuckDB oracle
    value-checks them at every test SF.  The eval side is 1/97th of the
    corpus and AQE will broadcast it when it fits — no static hint, because
    at 100 TB an eval slice can still be TB-scale."""
    docs = _t(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    # filter BEFORE the gram kernel: predicates don't push through
    # mapInPandas, so filtering after would run the full corpus through
    # the kernel twice (once per branch); this way the eval branch
    # touches 1/97th of the rows.
    ev = text.word_ngram_hashes(docs.filter(is_eval), 5).select(
        F.col("doc_id").alias("eval_id"), "gram_h"
    ).distinct()
    # NO .distinct() on the training side: the final count_distinct dedups
    # anyway, and a global distinct over every training gram is a full
    # extra shuffle of the big side for nothing (measured: it dominated
    # this query's runtime).  The eval side stays distinct so one repeated
    # eval gram cannot multiply join output.
    tr = text.word_ngram_hashes(docs.filter(~is_eval), 5)
    return tr.join(ev, "gram_h").groupBy("doc_id").agg(
        F.count_distinct("gram_h").alias("n_shared_grams"),
        F.count_distinct("eval_id").alias("n_eval_docs"),
    )


@_register(
    "funnel_view_click_purchase",
    """
    WITH s AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS reached_view,
           CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
             AS reached_click,
           CAST(sum(CASE WHEN t_click > t_view AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase
    FROM s
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, first-touch
    attribution): one groupBy(user) collecting the three first-step times
    via conditional min — NOT three self-joins (the naive funnel is a
    3-way join on user_id; this is a single shuffle with map-side partial
    mins, then a 1-row global roll-up).  NULL step times fall out of the
    ordering predicates in both engines identically."""
    ev = _t(spark, sf_dir, "events")
    step = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    s = ev.groupBy("user_id").agg(
        step("view").alias("t_view"),
        step("click").alias("t_click"),
        step("purchase").alias("t_purchase"),
    )
    return s.agg(
        F.count("*").alias("users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias(
            "reached_view"
        ),
        F.sum(F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)).alias(
            "reached_click"
        ),
        F.sum(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("reached_purchase"),
    )


@_register(
    "retention_hourly_cohorts",
    """
    WITH a AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
    )
    SELECT CAST(a.h AS TIMESTAMP) AS cohort_hour,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active,
           CAST(count(DISTINCT b.user_id) AS BIGINT) AS retained_next_hour
    FROM a LEFT JOIN a b
      ON b.user_id = a.user_id AND b.h = a.h + INTERVAL 1 HOUR
    GROUP BY a.h
    """,
)
def retention_hourly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users active in hour H who return in H+1.  The
    self-join runs on the PRE-AGGREGATED distinct (user, hour) frame —
    |users| x |hours| rows, not raw events; both sides shuffle on user_id
    so the join is co-partitioned with the distinct that feeds it."""
    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    b = a.select(
        F.col("user_id").alias("b_user"), F.col("h").alias("b_h")
    )
    j = a.join(
        b,
        (F.col("b_user") == F.col("user_id"))
        & (F.col("b_h") == F.col("h") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return j.groupBy(F.col("h").alias("cohort_hour")).agg(
        F.count_distinct("user_id").alias("active"),
        F.count_distinct("b_user").alias("retained_next_hour"),
    )


@_register(
    "embed_norm_stats_by_lang",
    """
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(CAST(floor(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
                 x -> x * x))) * 1000000) AS BIGINT)) / 1000000.0 / count(*) * 10000) / 10000.0 AS avg_l2,
           floor(min(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
                 x -> x * x)))) * 10000) / 10000.0 AS min_l2
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY d.lang
    """,
)
def embed_norm_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal metadata join: document attributes joined to their
    embedding rows (vec_id == doc_id), then vector-norm statistics per
    language — the shape every multimodal pipeline hits when slicing
    vector quality by a metadata column.  The join shuffles only
    (doc_id, lang) against (vec_id, norm): the norm is computed BEFORE the
    join so the 64-float array never crosses the exchange."""
    from reddit_sse_stream_spark.operators.similarity import l2_norm

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        l2_norm(F.col("embedding").cast("array<double>")).alias("l2"),
    )
    return (
        d.join(e, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            # Numerator accumulates exact int64 addends.  The l2 is an
            # UNROUNDED double, so the quantization must be floor (pure
            # IEEE, identical on both engines) — a decimal cast or round()
            # here would be Spark shortest-repr HALF_UP vs DuckDB
            # binary-value rounding, the .xxxx5 divergence class this repo
            # documents for round() (ADVICE r04).
            (
                F.floor(
                    F.sum(F.floor(F.col("l2") * 1_000_000))
                    / 1_000_000.0
                    / F.count("*")
                    * 10000
                )
                / 10000.0
            ).alias("avg_l2"),
            (F.floor(F.min("l2") * 10000) / 10000.0).alias("min_l2"),
        )
    )


@_register(
    "path_top_event_trigrams",
    """
    WITH seq AS (
      SELECT user_id, string_agg(event_type, ' ' ORDER BY event_id) AS path
      FROM events GROUP BY user_id
    ),
    w AS (SELECT user_id, regexp_split_to_array(path, ' ') AS p FROM seq),
    idx AS (
      SELECT user_id, p,
             unnest(generate_series(1, greatest(len(p) - 2, 0))) AS i
      FROM w
    ),
    tri AS (SELECT array_to_string(p[i:i+2], ' ') AS trigram FROM idx)
    SELECT trigram, CAST(count(*) AS BIGINT) AS n
    FROM tri GROUP BY trigram ORDER BY n DESC, trigram LIMIT 10
    """,
)
def path_top_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining: the 10 most common 3-step event paths across user
    histories.  Per-user ordered assembly is one groupBy with an ordered
    string_agg (deterministic: event_id is unique); the trigram expansion
    reuses the codegen n-gram machinery; top-10 is TakeOrderedAndProject.
    No window over raw events, no self-joins."""
    ev = _t(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            " ",
        ).alias("text")
    ).select(F.col("user_id").alias("doc_id"), "text")
    tri = text.word_ngrams(seq, 3).groupBy(
        F.col("gram").alias("trigram")
    ).agg(F.count("*").alias("n"))
    return tri.orderBy(F.col("n").desc(), "trigram").limit(10)


@_register(
    "anomaly_zscore_hourly",
    """
    WITH hc AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    w AS (
      SELECT event_type, CAST(h AS TIMESTAMP) AS hour, n,
             avg(n) OVER trail AS mu,
             stddev_samp(n) OVER trail AS sd,
             count(*) OVER trail AS n_trail
      FROM hc
      WINDOW trail AS (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour, n,
           floor((n - mu) / sd * 1000) / 1000.0 AS z
    FROM w
    WHERE n_trail >= 12 AND sd > 0.5
      AND abs((n - mu) / sd) > 2.0
    """,
)
def anomaly_zscore_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection in batch form: hourly event-count
    z-score against the trailing 24h window, flagging |z| > 2.  The raw
    events collapse to (type, hour) counts BEFORE any window — the window
    frame then slides over at most 24 tiny rows per partition.  sd > 0.5
    and a 12-sample minimum keep the z-score well-conditioned (and the
    floor-at-1e-3 keeps the double cross-engine stable)."""
    ev = _t(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    trail = (
        Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    )
    w = hc.select(
        "event_type",
        F.col("h").alias("hour"),
        "n",
        F.avg("n").over(trail).alias("mu"),
        F.stddev_samp("n").over(trail).alias("sd"),
        F.count("*").over(trail).alias("n_trail"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return w.filter(
        (F.col("n_trail") >= 12) & (F.col("sd") > 0.5) & (F.abs(z) > 2.0)
    ).select(
        "event_type", "hour", "n", (F.floor(z * 1000) / 1000.0).alias("z")
    )


@_register(
    "graph_triangle_count",
    """
    WITH sub AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 10 = 0),
    e AS (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM sub a JOIN sub b ON a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 > 0.2)
    SELECT CAST(count(*) AS BIGINT) AS triangles
    FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
      ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the near-dup pair graph (cluster-density
    diagnostic): the classic ordered-edge 3-way join — each edge stored
    once as (min, max), so every triangle is counted exactly once and the
    joins shuffle only (a, b) id pairs.  At 100 TB the standard refinement
    is degree-ordering the edges first so high-degree hubs don't explode
    the intermediate join."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    # localCheckpoint, not cache(): the edge frame feeds three join legs,
    # but a cached plan stays pinned in the CacheManager until an explicit
    # unpersist (storage leak across bench sweeps); checkpoint blocks are
    # weak-ref cleaned when the frame is garbage-collected.
    e = (
        similarity.cosine_pairs_exact(emb, threshold=0.2, allow_quadratic=True)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .localCheckpoint(eager=False)
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return tri.agg(F.count("*").alias("triangles"))


@_register(
    "dedup_cluster_best_quality",
    """
    WITH RECURSIVE sub AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 10 = 0),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sub a JOIN sub b ON a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 > 0.2),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON w.id = e.src),
    comps AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
    q AS (
        SELECT doc_id,
               floor((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                      / greatest(length(text), 1))
                     * least(CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
                             / 50.0, 1.0) * 10000) / 10000.0 AS quality
        FROM documents),
    r AS (
        SELECT c.component, c.id, q.quality,
               row_number() OVER (PARTITION BY c.component
                                  ORDER BY q.quality DESC, c.id) AS rn,
               CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT)
                 AS n_members
        FROM comps c JOIN q ON q.doc_id = c.id)
    SELECT component, id AS keep_id, quality AS best_quality, n_members
    FROM r WHERE rn = 1
    """,
)
def dedup_cluster_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection — the capstone of the dedup
    suite: near-dup pairs -> connected components -> per cluster keep the
    HIGHEST-quality member (tie-break lowest id), not just the lowest id.
    This is how production corpus dedup actually chooses survivors.  One
    window over the (tiny) cluster assignment; quality joins in on doc_id —
    document text never reaches the clustering shuffles."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    pairs = similarity.cosine_pairs_exact(emb, threshold=0.2, allow_quadratic=True)
    comps = dedup.connected_components(pairs)
    q = text.quality_score(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("id"), "quality"
    )
    m = comps.join(q, "id")
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col("id")
    )
    return (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count("*").over(Window.partitionBy("component")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("id").alias("keep_id"),
            F.col("quality").alias("best_quality"),
            "n_members",
        )
    )


@_register(
    "dq_expectation_report",
    """
    WITH a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN NOT COALESCE(n_chars = length(text), FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_len,
             CAST(sum(CASE WHEN NOT COALESCE(lang IN ('en','es','de','fr','zh'), FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
             CAST(sum(CASE WHEN NOT COALESCE(length(text) > 0, FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_nonempty
      FROM documents
    )
    SELECT 'len_matches' AS rule, n AS n_rows, v_len AS n_violations,
           floor(v_len * 10000.0 / greatest(n, 1)) / 10000.0 AS violation_rate
    FROM a
    UNION ALL
    SELECT 'lang_known', n, v_lang,
           floor(v_lang * 10000.0 / greatest(n, 1)) / 10000.0 FROM a
    UNION ALL
    SELECT 'nonempty', n, v_nonempty,
           floor(v_nonempty * 10000.0 / greatest(n, 1)) / 10000.0 FROM a
    """,
)
def dq_expectation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus admission gate: N expectation rules evaluated in ONE
    aggregate pass (functions/expectations.py) — never a scan per rule."""
    from reddit_sse_stream_spark.functions.expectations import expectation_report

    docs = _t(spark, sf_dir, "documents")
    return expectation_report(
        docs,
        {
            "len_matches": F.col("n_chars") == F.length("text"),
            "lang_known": F.col("lang").isin("en", "es", "de", "fr", "zh"),
            "nonempty": F.length("text") > 0,
        },
    )


@_register(
    "agg_heavy_hitters_exact",
    """
    WITH c AS (
      SELECT author, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT 'u' || CAST(user_id % 50 AS VARCHAR) AS author FROM events
      ) GROUP BY author
    ), t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
    SELECT author, n FROM c, t WHERE n * 100 >= total * 2
    """,
)
def agg_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: authors above 2% support.  The two-pass exact
    form (count + threshold against a broadcast total) is the oracle anchor
    for the one-pass sketch (``df.stat.freqItems``, Karp-Papadimitriou-
    Shenker), whose superset guarantee is pinned in
    test_freq_items_superset_of_exact_heavy_hitters."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("u"), (F.col("user_id") % 50).cast("string")).alias("author")
    )
    total = ev.agg(F.count("*").alias("total"))
    counts = ev.groupBy("author").agg(F.count("*").alias("n"))
    return counts.crossJoin(F.broadcast(total)).filter(
        F.col("n") * 100 >= F.col("total") * 2
    ).select("author", "n")


@_register("media_features_meta", _MEDIA_FEATURES_ORACLE)
def media_features_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic half of the multimodal feature extractor under a
    value-level oracle: n_bytes + byte-checksum of every payload, computed
    through the REAL Arrow mapInPandas path (operators/multimodal.py) and
    reproduced in SQL from the synthesized payload rule (utf-8 text bytes;
    the corpus is ASCII so ord(char) == byte).  Proves the batch plumbing
    delivers byte-exact payloads — the float feature vector stays on the
    rows-only check (Python round is banker's; SQL round is not)."""
    media = multimodal.synthesize_media(_t(spark, sf_dir, "documents"))
    return multimodal.extract_features(media).select(
        "media_id", "kind", "n_bytes", "checksum"
    )


@_register(
    "variant_json_extract_agg",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_max
    FROM events GROUP BY event_type
    """,
)
def variant_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured hot path on Spark 4's VARIANT type: parse the JSON
    payload ONCE into a binary variant and aggregate typed extractions —
    at 100 TB variant decode is columnar/vectorized, an order over
    re-parsing JSON text per access (the reference re-serializes JSON per
    client per event, sse.py:208-239)."""
    ev = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


_RECURSIVE_ANCESTORS = """
    WITH RECURSIVE anc(key, anc_key, depth) AS (
      SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT), 0
      FROM nation
      UNION ALL
      SELECT a.key, CAST(floor(a.anc_key / 2.0) AS BIGINT), a.depth + 1
      FROM anc a WHERE a.anc_key > 0
    )
    SELECT key, anc_key, depth FROM anc
"""


@_register("recursive_cte_ancestors", _RECURSIVE_ANCESTORS)
def recursive_cte_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative/recursive queries as first-class SQL: WITH RECURSIVE
    transitive closure (Spark 4 recursive CTE) over a deterministic
    binary-tree hierarchy derived from nation keys — the same SQL text runs
    on both engines.  Each recursion step is one self-join micro-stage;
    Spark bounds runaway recursion with spark.sql.cteRecursionLevelLimit.
    The DataFrame-loop twin of this shape (driver-controlled iteration +
    localCheckpoint) is operators/dedup.py:connected_components."""
    _views(spark, sf_dir, "nation")
    return spark.sql(_RECURSIVE_ANCESTORS)


_LATERAL_TOPK = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
"""


@_register("join_lateral_topk_per_nation", _LATERAL_TOPK)
def join_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (top-2 customers per nation) — the
    same SQL text runs on both engines.  Catalyst decorrelates the LATERAL
    into a ranked window over a single shuffle of customer — it never
    executes per-outer-row (the naive nested-loop reading of LATERAL would
    be 25 separate scans; at 100 TB, decorrelation is the difference
    between one pass and |outer| passes)."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_TOPK)


_SEQ_RANGE = """
    WITH g AS (
      SELECT o_orderkey, unnest(generate_series(0, o_orderkey % 5 + 2)) AS step
      FROM orders WHERE o_orderkey % 1000 = 0
    )
    SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_steps,
           CAST(sum(step) AS BIGINT) AS step_sum
    FROM g GROUP BY o_orderkey
"""


@_register("fn_sequence_range", _SEQ_RANGE)
def fn_sequence_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 integer range generation (reference: Python range() over id
    windows, /root/reference/sse.py:117-129) as a first-class catalog row:
    sequence() + explode per row, re-aggregated.  The expansion is
    codegen-local (Generate node), never a driver loop."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 1000 == 0)
    g = o.select(
        "o_orderkey",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("o_orderkey") % 5 + 2)
        ).alias("step"),
    )
    return g.groupBy("o_orderkey").agg(
        F.count("*").alias("n_steps"), F.sum("step").alias("step_sum")
    )


def _minhash_md5_oracle_sql(num_hashes: int = 8, bands: int = 4, k: int = 5) -> str:
    """Generate the DuckDB twin of dedup.minhash_md5_near_dups with the
    SAME (a, b) permutation constants embedded as literals."""
    coeffs = dedup._coeffs(num_hashes)
    p = (1 << 31) - 1
    sig_cols = ", ".join(
        f"min((h * {a} + {b}) % {p}) AS s{i}" for i, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {band} AS band, concat({key}) AS key FROM sig".format(
            band=bnd,
            key=", ',', ".join(f"s{bnd * rpb + j}" for j in range(rpb)),
        )
        for bnd in range(bands)
    )
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    ),
    idx AS (
      SELECT doc_id, words,
             unnest(generate_series(1, len(words) - {k - 1})) AS i
      FROM w WHERE len(words) >= {k}
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             CAST(concat('0x', substr(md5(array_to_string(words[i:i+{k - 1}], ' ')), 1, 15))
                  AS BIGINT) % {p} AS h
      FROM idx
    ),
    sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS ni
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND a.h = b.h
      GROUP BY c.doc_a, c.doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
    SELECT i.doc_a, i.doc_b,
           floor(ni * 10000.0 / (sa.n + sb.n - ni)) / 10000.0 AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE floor(ni * 10000.0 / (sa.n + sb.n - ni)) / 10000.0 >= 0.8
    """


def _lsh_recall_audit_oracle_sql(
    num_hashes: int = 8, bands: int = 4, k: int = 5, df_cap: int = 64
) -> str:
    """DuckDB twin of :func:`dedup.lsh_recall_audit`: same shingle/signature
    CTEs as the minhash oracle, plus the cold-shingle truth universe and
    the per-decile hit fold."""
    coeffs = dedup._coeffs(num_hashes)
    p = (1 << 31) - 1
    sig_cols = ", ".join(
        f"min((h * {a} + {b}) % {p}) AS s{i}" for i, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {band} AS band, concat({key}) AS key FROM sig".format(
            band=bnd,
            key=", ',', ".join(f"s{bnd * rpb + j}" for j in range(rpb)),
        )
        for bnd in range(bands)
    )
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    ),
    idx AS (
      SELECT doc_id, words,
             unnest(generate_series(1, len(words) - {k - 1})) AS i
      FROM w WHERE len(words) >= {k}
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             CAST(concat('0x', substr(md5(array_to_string(words[i:i+{k - 1}], ' ')), 1, 15))
                  AS BIGINT) % {p} AS h
      FROM idx
    ),
    sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
    ),
    cold AS (SELECT h FROM sh GROUP BY h HAVING count(*) <= {df_cap}),
    exc AS (SELECT s.doc_id, s.h FROM sh s JOIN cold USING (h)),
    tc AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM exc l JOIN exc r ON l.h = r.h AND l.doc_id < r.doc_id
    ),
    inter AS (
      SELECT t.doc_a, t.doc_b, count(*) AS ni
      FROM tc t
      JOIN sh a ON a.doc_id = t.doc_a
      JOIN sh b ON b.doc_id = t.doc_b AND a.h = b.h
      GROUP BY t.doc_a, t.doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    truth AS (
      SELECT i.doc_a, i.doc_b,
             CAST(floor(ni * 10000.0 / (sa.n + sb.n - ni)) AS BIGINT) AS jfp
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE floor(ni * 10000.0 / (sa.n + sb.n - ni)) >= 1000
    ),
    marked AS (
      SELECT CAST(floor(t.jfp / 1000.0) AS INTEGER) AS bucket,
             CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS hit
      FROM truth t
      LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_truth,
           CAST(sum(hit) AS BIGINT) AS n_hit,
           floor(sum(hit) * 10000.0 / count(*)) / 10000.0 AS recall
    FROM marked GROUP BY bucket
    """


@_register("dedup_lsh_recall_audit", _lsh_recall_audit_oracle_sql())
def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH S-curve (operators/dedup.py:lsh_recall_audit): recall
    of the banded minhash candidate join against exact shingle-Jaccard
    truth, per Jaccard decile over the cold-shingle universe — the audit
    that tells a 100 TB pipeline whether its (bands, rows-per-band)
    choice actually catches the near-dups it claims to, instead of
    trusting 1-(1-j^r)^b on an unexamined shingle distribution.  Both
    the truth and candidate sides reuse ONE checkpointed shingle frame;
    every join is hot-key-guarded; output is <= 10 rows."""
    return dedup.lsh_recall_audit(_t(spark, sf_dir, "documents"))


@_register("dedup_minhash_md5", _minhash_md5_oracle_sql())
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash-LSH near-dup pairs with a FULL value-level oracle: md5-based
    shingle hashes + literal band keys make every stage (sketch, banding,
    candidate join, exact-Jaccard verify) reproducible in ANSI SQL — the
    cross-engine proof for the sketch family (the xxhash64/Arrow variant
    dedup_minhash_lsh stays the throughput path)."""
    return dedup.minhash_md5_near_dups(_t(spark, sf_dir, "documents"))


def _minhash_md5_incremental_oracle_sql(
    num_hashes: int = 8, bands: int = 4, k: int = 5
) -> str:
    """Twin of :func:`dedup.minhash_md5_incremental_new` on the odd/even
    doc_id split: one sketch over all documents, candidates restricted to
    batch(odd) x corpus(even) band collisions, NOT-IN admission."""
    coeffs = dedup._coeffs(num_hashes)
    p = (1 << 31) - 1
    sig_cols = ", ".join(
        f"min((h * {a} + {b}) % {p}) AS s{i}" for i, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {band} AS band, concat({key}) AS key FROM sig".format(
            band=bnd,
            key=", ',', ".join(f"s{bnd * rpb + j}" for j in range(rpb)),
        )
        for bnd in range(bands)
    )
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    ),
    idx AS (
      SELECT doc_id, words,
             unnest(generate_series(1, len(words) - {k - 1})) AS i
      FROM w WHERE len(words) >= {k}
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             CAST(concat('0x', substr(md5(array_to_string(words[i:i+{k - 1}], ' ')), 1, 15))
                  AS BIGINT) % {p} AS h
      FROM idx
    ),
    sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT l.doc_id AS nb, r.doc_id AS ob
      FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
      WHERE l.doc_id % 2 = 1 AND r.doc_id % 2 = 0
    ),
    inter AS (
      SELECT c.nb, c.ob, count(*) AS ni
      FROM cand c
      JOIN sh a ON a.doc_id = c.nb
      JOIN sh b ON b.doc_id = c.ob AND a.h = b.h
      GROUP BY c.nb, c.ob
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    bad AS (
      SELECT DISTINCT i.nb FROM inter i
      JOIN sizes sa ON sa.doc_id = i.nb
      JOIN sizes sb ON sb.doc_id = i.ob
      WHERE floor(ni * 10000.0 / (sa.n + sb.n - ni)) / 10000.0 >= 0.8
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id % 2 = 1 AND d.doc_id NOT IN (SELECT nb FROM bad)
    """


@_register("dedup_incremental_minhash", _minhash_md5_incremental_oracle_sql())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot NEAR-dup admission gate
    (operators/dedup.py:minhash_md5_incremental_new): of the incoming
    batch (odd doc_ids), keep only documents with no jaccard>=0.8
    near-duplicate in the existing corpus (even doc_ids) — the sketch-
    family upgrade of ``dedup_incremental_new_only``'s exact-digest gate,
    fully value-oracled via the md5 hash family."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.minhash_md5_incremental_new(docs, lambda c: c % 2 == 1)
    return out.select("doc_id", "lang", "source", "n_chars")


@_register(
    "dedup_simhash_md5",
    """
    WITH tok AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(t.tok), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
            FROM documents) t
    ),
    bits AS (SELECT unnest(generate_series(0, 59)) AS b),
    votes AS (
      SELECT doc_id, b,
             sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM tok, bits GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints from md5-derived 60-bit token hashes — the
    ANSI-oracle-able twin of dedup_simhash (bit-exact across engines:
    same votes, same packed code)."""
    return dedup.simhash(
        _t(spark, sf_dir, "documents"), bits=60, hash_fn=dedup.md5_hash60
    )


@_register(
    "decontam_drop_contaminated",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i
      FROM words
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram FROM idx
    ),
    ev AS (SELECT gram FROM grams WHERE doc_id % 97 = 0),
    bad AS (
      SELECT DISTINCT t.doc_id FROM grams t JOIN ev ON t.gram = ev.gram
      WHERE t.doc_id % 97 <> 0
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id % 97 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM bad)
    """,
)
def decontam_drop_contaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of decontamination: training docs that share NO
    word 5-gram with the eval slice survive; contaminated ids are dropped
    with a left_anti join (the detection query decontam_ngram_overlap is
    the audit view of the same join).  Shares the xxhash64(gram_h) join
    key with decontam_ngram_overlap (8-byte shuffle, not gram strings);
    the anti-join itself is on doc_id only — document text never
    re-shuffles."""
    docs = _t(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    # filter before the kernel (no pushdown through mapInPandas), and keep
    # the training side's duplicate grams: the post-join distinct on
    # doc_id is the dedup, and skipping the pre-join distinct avoids a
    # full shuffle of every training gram.
    ev = text.word_ngram_hashes(docs.filter(is_eval), 5).select("gram_h").distinct()
    bad = (
        text.word_ngram_hashes(docs.filter(~is_eval), 5)
        .join(ev, "gram_h")
        .select("doc_id")
        .distinct()
    )
    return (
        docs.filter(~is_eval)
        .join(bad, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


@_register(
    "dedup_simhash_hamming_pairs",
    """
    WITH tok AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(t.tok), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
            FROM documents) t
    ),
    bits AS (SELECT unnest(generate_series(0, 59)) AS b),
    votes AS (
      SELECT doc_id, b,
             sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM tok, bits GROUP BY doc_id, b
    ),
    sh AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                  AS BIGINT) AS code
      FROM votes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, code, g.band,
             (code >> (g.band * 15)) & 32767 AS chunk
      FROM sh, (SELECT unnest(generate_series(0, 3)) AS band) g
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, l.code AS code_a,
                      r.doc_id AS doc_b, r.code AS code_b
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.chunk = r.chunk AND l.doc_id < r.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(code_a, code_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(code_a, code_b)) <= 3
    """,
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup DETECTION (not just fingerprints): band the 60-bit
    md5 simhash into 4 x 15-bit chunks — by pigeonhole, any pair within
    hamming distance 3 must share at least one chunk, so the chunk
    equi-join finds ALL pairs at distance <= 3 without an all-pairs scan;
    the hamming verify (bit_count of xor) runs on candidates only.  The
    filter threshold (3) matches the banding guarantee exactly: with 4
    bands a looser threshold would silently return only chunk-colliding
    pairs, not all pairs, within it.  For a looser radius r, band into
    r+1 chunks.  Fully value-level oracled: md5 hash family + literal
    band arithmetic reproduce bit-identically in ANSI SQL."""
    docs = _t(spark, sf_dir, "documents")
    # The code frame feeds banding plus both sides of the hamming verify;
    # localCheckpoint materializes the simhash kernel output ONCE (a
    # (doc_id, long) pair per doc — the cheapest checkpoint in the repo)
    # so the three consumers never re-run the kernel.
    sh = (
        dedup.simhash(docs, bits=60, hash_fn=dedup.md5_hash60)
        .withColumnRenamed("simhash", "code")
        .localCheckpoint(eager=False)
    )
    banded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
        F.col("code"),
    ).withColumn("chunk", F.expr("(code >> (band * 15)) & 32767"))
    # Shared pair generator = narrow long-only explode + the unconditional
    # hot-bucket guard (a degenerate corpus lands every doc in one chunk;
    # bucket_pair_explode fans its m^2 out over capped triangular cells).
    cand = dedup.bucket_pair_explode(
        banded.select("band", "chunk", "doc_id"), ["band", "chunk"], "doc_id",
        "doc_a", "doc_b",
    ).distinct()
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("code").alias("code_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("code").alias("code_b"))
    hamming = F.bit_count(F.col("code_a").bitwiseXOR(F.col("code_b")))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


@_register(
    "dedup_incremental_new_only",
    """
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id % 2 = 1
      AND NOT EXISTS (
        SELECT 1 FROM documents c
        WHERE c.doc_id % 2 = 0 AND md5(c.text) = md5(d.text)
      )
    """,
)
def dedup_incremental_new_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup: new-batch rows (odd doc_id) whose
    content digest is absent from the existing corpus (even doc_id) —
    left_anti on the 16-byte digest, never shuffling text
    (operators/dedup.py:incremental_new_docs)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return dedup.incremental_new_docs(batch, corpus).select(
        "doc_id", "lang", "source", "n_chars"
    )


@_register(
    "dedup_incremental_bloom",
    """
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id % 2 = 1
      AND NOT EXISTS (
        SELECT 1 FROM documents c
        WHERE c.doc_id % 2 = 0 AND md5(c.text) = md5(d.text)
      )
    """,
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated incremental dedup: broadcast occupied-bucket set
    splits the batch into definitely-new (bypasses the join) and
    maybe-known (exact digest anti-join); the union is provably identical
    to the plain anti-join, so it shares its oracle
    (operators/dedup.py:bloom_prefilter_new_docs)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return dedup.bloom_prefilter_new_docs(batch, corpus).select(
        "doc_id", "lang", "source", "n_chars"
    )


@_register(
    "text_chunk_dup_rate",
    """
    WITH w AS (
      SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS words
      FROM documents
    ),
    ci AS (
      SELECT doc_id, source, words,
             unnest(range(0, CAST(floor(len(words) / 16.0) AS BIGINT))) AS i
      FROM w
    ),
    ch AS (
      SELECT doc_id, source,
             md5(array_to_string(list_slice(words, i*16 + 1, i*16 + 16), ' '))
               AS chunk_h
      FROM ci
    ),
    g AS (
      SELECT chunk_h, source, count(*) AS c,
             count(DISTINCT doc_id) AS nd_s
      FROM ch GROUP BY chunk_h, source
    ),
    gg AS (
      SELECT *, sum(nd_s) OVER (PARTITION BY chunk_h) AS nd FROM g
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN nd >= 2 THEN c ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           floor(sum(CASE WHEN nd >= 2 THEN c ELSE 0 END) * 1.0
                 / sum(c) * 10000) / 10000.0 AS dup_rate
    FROM gg GROUP BY source
    """,
)
def text_chunk_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style sub-document duplication report: per source, the
    fraction of fixed 16-word chunks that also occur in >= 2 distinct
    documents corpus-wide.  The reference streams rows whole
    (/root/reference/sse.py:151-162) and has no sub-document analysis; a
    training-data pipeline needs this to decide whether paragraph-level
    dedup is worth a pass.  Chunking is pure codegen; one digest-keyed
    shuffle; the global distinct-doc total rides a window over the same
    partitioning (operators/text.py:chunk_dup_stats)."""
    return text.chunk_dup_stats(_t(spark, sf_dir, "documents"))


@_register(
    "vocab_coverage_topk",
    """
    WITH tok AS (
      SELECT doc_id, lang, unnest(regexp_split_to_array(text, '\\s+')) AS term
      FROM documents
    ),
    counts AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
    top AS (SELECT term FROM counts ORDER BY tf DESC, term LIMIT 64)
    SELECT t.lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN p.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           floor(sum(CASE WHEN p.term IS NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*) * 10000) / 10000.0 AS oov_rate
    FROM tok t LEFT JOIN top p ON t.term = p.term
    GROUP BY t.lang
    """,
)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: with a 64-term vocabulary picked by
    global frequency (ties broken lexically so both engines select the
    same set), per-language token count, out-of-vocabulary token count,
    and OOV rate — the statistic that sizes a vocab before training.

    Scale shape: one term-keyed shuffle with map-side combine builds the
    counts; the top-K is TakeOrderedAndProject (driver gets K rows, not
    the vocab) and re-enters as a BROADCAST hash join against the token
    stream — the second corpus pass has no shuffle at all; the final
    per-lang rollup moves |langs| rows."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split(F.col("text"), r"\s+")).alias("term")
    )
    top = (
        tok.groupBy("term")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("term"))
        .limit(64)
        .select("term")
    )
    flagged = tok.join(
        F.broadcast(top.withColumnRenamed("term", "_vterm")),
        tok["term"] == F.col("_vterm"),
        "left",
    )
    oov = F.sum(F.when(F.col("_vterm").isNull(), 1).otherwise(0))
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        oov.alias("oov_tokens"),
    ).select(
        "lang",
        "n_tokens",
        "oov_tokens",
        F.floor(F.col("oov_tokens") / F.col("n_tokens") * 10000).cast("double")
        .alias("_f"),
        # keep trunc identical to the SQL twin: floor(x*1e4)/1e4
    ).select(
        "lang",
        "n_tokens",
        "oov_tokens",
        (F.col("_f") / 10000.0).alias("oov_rate"),
    )


@_register(
    "dedup_cross_source_matrix",
    """
    WITH h AS (
      SELECT DISTINCT
             md5(array_to_string(
               list_slice(regexp_split_to_array(text, '\\s+'), 1, 8), ' '))
               AS ph,
             md5(text) AS th, source
      FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_prefixes,
           CAST(sum(CASE WHEN a.th = b.th THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_exact
    FROM h a JOIN h b ON a.ph = b.ph AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every ordered source pair
    (a < b), how many distinct text variants share a verbatim 8-word lead
    (near-verbatim syndication signal) and how many are exact duplicates —
    the report that tells a corpus curator which crawls plagiarize which.
    Keyed on the prefix digest rather than the full-text digest so the
    report carries signal even in corpora with few exact cross-source
    copies.

    Scale shape: the per-(prefix, digest, source) DISTINCT collapses the
    corpus to one row per text variant per source BEFORE the self-join,
    so the equi-join on the 16-byte prefix digest is narrow; the
    source < source predicate halves the pair output.  No cartesian
    anywhere."""
    docs = _t(spark, sf_dir, "documents")
    h = docs.select(
        F.md5(F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 1, 8), " "))
        .alias("ph"),
        F.md5("text").alias("th"),
        "source",
    ).distinct()
    a = h.alias("a")
    b = h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ph") == F.col("b.ph"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count("*").alias("shared_prefixes"),
            F.sum(
                F.when(F.col("a.th") == F.col("b.th"), 1).otherwise(0)
            ).alias("shared_exact"),
        )
    )


@_register(
    "dedup_rate_by_ingestion_batch",
    """
    WITH d AS (
      SELECT doc_id, source, md5(text) AS dg, doc_id // 50 AS batch
      FROM documents
    ),
    f AS (SELECT dg, min(doc_id) AS first_id FROM d GROUP BY dg)
    SELECT d.source, CAST(d.batch AS BIGINT) AS batch,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN d.doc_id > f.first_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dups,
           floor(sum(CASE WHEN d.doc_id > f.first_id THEN 1 ELSE 0 END)
                 * 10000.0 / count(*)) / 10000.0 AS dup_frac
    FROM d JOIN f USING (dg)
    GROUP BY d.source, d.batch
    ORDER BY d.source, batch
    """,
)
def dedup_rate_by_ingestion_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup-rate TIME SERIES (VERDICT r12 next #6b) — the
    batch-resolved twin of ``dedup_cross_source_matrix``: for each
    source and ingestion batch (doc_id // 50, the deterministic arrival
    band), the fraction of that batch's documents that duplicate
    ALREADY-INGESTED content (an exact copy whose first owner has a
    smaller doc_id, any source).  This is the curve a crawl operator
    watches per feed: a source whose dup_frac trends toward 1 is
    re-crawling known content and its refresh budget should move
    elsewhere — the live counterpart to the source-pair matrix's static
    "who plagiarizes whom".

    Scale shape: rides the EXISTING digest exchange — one groupBy on
    md5(text) for the first-owner frame (the same shuffle every exact
    dedup row pays), one join back on the digest, then a map-side
    partial aggregate on (source, batch).  The is-dup predicate is
    doc_id > min(doc_id)-of-digest, so no window, no ordering, no
    second scan."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("dg"),
        F.floor(F.col("doc_id") / 50).cast("long").alias("batch"),
    )
    f = d.groupBy("dg").agg(F.min("doc_id").alias("first_id"))
    is_dup = (F.col("doc_id") > F.col("first_id")).cast("long")
    return (
        d.join(f, "dg")
        .groupBy("source", "batch")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(is_dup).alias("n_dups"),
        )
        .select(
            "source",
            "batch",
            "n_docs",
            "n_dups",
            (F.floor(F.col("n_dups") * 10000.0 / F.col("n_docs")) / 10000.0)
            .alias("dup_frac"),
        )
        .orderBy("source", "batch")
    )


@_register(
    "bpe_pair_merge_counts",
    """
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(text, '\\s+')) AS term
      FROM documents
    ),
    counts AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
    pi AS (
      SELECT term, tf, unnest(range(1, len(term))) AS i FROM counts
    ),
    p AS (SELECT substr(term, CAST(i AS INTEGER), 2) AS pair, tf FROM pi)
    SELECT pair, CAST(sum(tf) AS BIGINT) AS cnt
    FROM p GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 50
    """,
)
def bpe_pair_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge-learning step: corpus-wide counts of adjacent
    character pairs inside words, top 50 (ties broken lexically).  The
    highest-count pair is the first merge a BPE tokenizer trainer would
    learn; iterating this query IS the trainer's inner loop — and since
    r07 that trainer exists: ``bpe_train_merges`` runs the iterated
    count→argmax→fuse rounds and ``bpe_tokenize_counts`` applies the
    learned table; this entry stays as the single-round census.

    Scale shape: pairs are expanded from the DISTINCT-term frequency
    table, not the raw token stream — the Zipf collapse means the
    expensive substring explode runs over |vocab| rows weighted by tf
    instead of every token occurrence (1000x fewer rows at corpus scale).
    One term shuffle with map-side combine, one pair shuffle over the
    collapsed table, TakeOrderedAndProject for the top-K."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    idx = F.when(
        F.length("term") >= 2, F.sequence(F.lit(1), F.length("term") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = counts.select(
        "term", "tf", F.explode(idx).alias("_i")
    ).select(F.col("term").substr(F.col("_i"), F.lit(2)).alias("pair"), "tf")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("tf").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(50)
    )


@_register(
    "text_char_entropy",
    r"""
    WITH ci AS (
      SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
      FROM documents WHERE len(text) >= 1
    ),
    c AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch FROM ci),
    cc AS (
      SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS k
      FROM c GROUP BY doc_id, ch
    ),
    n AS (
      SELECT *, sum(k) OVER (PARTITION BY doc_id) AS n FROM cc
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_chars,
           CAST(sum(k * (length(bin(n)) - length(bin(k)))) AS BIGINT)
             AS bits_sum,
           floor(sum(k * (length(bin(n)) - length(bin(k)))) * 100.0
                 / max(n)) / 100.0 AS avg_bits
    FROM n GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality filter (gibberish / repeated-char
    detector): per document, the whole-bit-quantized unigram character
    entropy — each character occurrence carrying count k in an N-char doc
    contributes floor(log2 N) - floor(log2 k) bits via the exact integer
    log2 (floor(log2 n) = length(bin(n)) - 1), the same no-floating-log
    design as ``text_bigram_lm_bits``: associative integer sums,
    bit-identical across engines.  Low avg_bits flags low-diversity text
    ("aaaa...", single-token spam) that length and stopword filters miss.

    Scale shape: the char explode is codegen-local (chars of a doc never
    leave their partition before aggregation); groupBy (doc_id, ch) ships
    at most |alphabet| rows per doc thanks to map-side combine; the
    per-doc total rides a doc_id window, and the final per-doc aggregate
    reuses the window's doc_id partitioning — no further exchange."""
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    chars = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
    ).select("doc_id", F.col("text").substr(F.col("i"), F.lit(1)).alias("ch"))
    cc = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("k"))
    from pyspark.sql import Window as _W

    n = cc.withColumn("n", F.sum("k").over(_W.partitionBy("doc_id")))
    bits = F.col("k") * (F.length(F.bin("n")) - F.length(F.bin("k")))
    return n.groupBy("doc_id").agg(
        F.max("n").alias("n_chars"),
        F.sum(bits).cast("long").alias("bits_sum"),
        (F.floor(F.sum(bits) * 100.0 / F.max("n")) / 100.0).alias("avg_bits"),
    )


@_register(
    "dedup_threshold_curve",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents WHERE doc_id % 5 = 0
    ),
    s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> CAST(concat('0x', substr(md5(
                      words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                    ), 1, 15)) AS BIGINT))) AS sh
      FROM w WHERE len(words) >= 3
    ),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cold AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 64),
    exc AS (SELECT e.doc_id, e.g FROM ex e JOIN cold USING (g)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM exc l JOIN exc r ON l.g = r.g AND l.doc_id < r.doc_id
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             floor(len(list_intersect(a.sh, b.sh)) * 10000.0
                   / len(list_distinct(list_concat(a.sh, b.sh)))) / 10000.0
               AS jaccard
      FROM cand c JOIN s a ON a.doc_id = c.doc_a
                  JOIN s b ON b.doc_id = c.doc_b
    ),
    t AS (SELECT unnest([0.1, 0.3, 0.5, 0.7, 0.9]::DOUBLE[]) AS threshold),
    hit AS (
      SELECT t.threshold, sc.doc_a, sc.doc_b
      FROM t LEFT JOIN scored sc ON sc.jaccard >= t.threshold
    ),
    pp AS (
      SELECT threshold, CAST(count(doc_a) AS BIGINT) AS n_pairs
      FROM hit GROUP BY threshold
    ),
    aff AS (
      SELECT threshold, doc_a AS d FROM hit
      UNION SELECT threshold, doc_b FROM hit
    ),
    dd AS (
      SELECT threshold, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
      FROM aff WHERE d IS NOT NULL GROUP BY threshold
    )
    SELECT pp.threshold, pp.n_pairs, coalesce(dd.n_docs, 0) AS n_docs
    FROM pp LEFT JOIN dd USING (threshold)
    """,
)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-rate-vs-threshold curve: for each candidate jaccard threshold,
    how many near-dup pairs and how many affected documents the corpus
    would yield — the sweep a pipeline runs ONCE to pick its dedup
    threshold, computed in one pass over the already-scored candidate
    pairs instead of five re-runs of the dedup job.

    Runs on the SAME deterministic 1/5 subsample as ``dedup_ngram_jaccard``
    (doc_id % 5, both engines): threshold calibration is a statistical
    estimate by nature — pair/doc counts scale with the sampling rate and
    the curve SHAPE is what picks the threshold — while the all-pairs
    verify on the full synthetic corpus costs 25x the sample (its tiny
    60-word vocabulary makes ~45% of ALL doc pairs share a cold gram;
    real Zipfian corpora are far sparser).  The production dedup RUN
    (``corpus_split_leakage_safe``) still verifies the full corpus.

    Scale shape: reuses ``_md5_jaccard_scored_pairs`` (hot-gram-capped
    candidates, single checkpointed gram frame); the 5-row threshold dim
    joins via a broadcast theta-join against the (small) scored-pair
    frame, never the corpus.  LEFT join keeps zero-count thresholds so
    the curve is always complete.  ``scored`` feeds THREE consumers in
    one plan (pair counts + both union sides of the affected-doc count),
    so it gets a multi-consumer localCheckpoint barrier — EAGER, unlike
    the usual lazy rule: the three consumers are parallel branches of a
    single job, and concurrent stages racing to materialize a lazy
    checkpoint re-execute the candidate join + array verify up to once
    per branch (measured: the lazy form ran 5-11 s and degraded across
    invocations; eager is a stable one-materialization job).  The blocks
    are released by the harness release hook after the action."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    scored = _md5_jaccard_scored_pairs(docs).localCheckpoint(eager=True)
    thr = spark.createDataFrame(
        [(0.1,), (0.3,), (0.5,), (0.7,), (0.9,)], "threshold double"
    )
    hit = F.broadcast(thr).join(
        scored, scored["jaccard"] >= thr["threshold"], "left"
    )
    pp = hit.groupBy("threshold").agg(F.count("doc_a").alias("n_pairs"))
    aff = (
        hit.select("threshold", F.col("doc_a").alias("d"))
        .union(hit.select("threshold", F.col("doc_b").alias("d")))
        .distinct()
    )
    dd = (
        aff.filter(F.col("d").isNotNull())
        .groupBy("threshold")
        .agg(F.count_distinct("d").alias("n_docs"))
    )
    return pp.join(dd, "threshold", "left").select(
        "threshold",
        "n_pairs",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
    )


@_register(
    "stream_lateness_watermark_profile",
    """
    WITH x AS (
      SELECT event_id, event_type, ts,
             max(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS hwm
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN hwm IS NOT NULL AND ts < hwm
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_any,
           CAST(sum(CASE WHEN hwm IS NOT NULL
                          AND epoch(hwm) - epoch(ts) > 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_60s,
           CAST(sum(CASE WHEN hwm IS NOT NULL
                          AND epoch(hwm) - epoch(ts) > 300
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_300s,
           CAST(sum(CASE WHEN hwm IS NOT NULL
                          AND epoch(hwm) - epoch(ts) > 900
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_900s
    FROM x GROUP BY event_type
    """,
)
def stream_lateness_watermark_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay sizing profile: treating event_id as arrival order,
    how many events per type arrive with event-time BEHIND the high-water
    mark (max event time seen so far), bucketed by how far behind (>0 s,
    >60 s, >300 s, >900 s) — exactly the counts that answer "what fraction
    of events would a withWatermark(delay) drop?", measured BEFORE wiring
    the watermark into ``streaming/source.py``'s pipeline (SURVEY §2 S5
    documents the reference has no late-data handling at all; this is the
    profile that sizes ours).

    Scale shape: the global prefix-max is two-phase, the classic
    distributed scan — a bucket-local running max windowed WITHIN each
    4096-id bucket (parallel across buckets, one bkt-keyed shuffle shared
    with the bucket-summary aggregate), plus a cumulative max over the
    tiny |events|/4096-row bucket summary (the ONLY single-partition
    window, over summary rows, never events) broadcast back.  hwm =
    greatest(bucket-local prefix max, previous buckets' max); Spark's
    greatest skips nulls, matching the SQL twin's NULL-only-at-stream-head
    semantics."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("event_id") / 4096).cast("long").alias("bkt"),
    )
    from pyspark.sql import Window as _W

    wb = _W.partitionBy("bkt").orderBy("event_id").rowsBetween(
        _W.unboundedPreceding, -1
    )
    local_hwm = F.max("ts").over(wb)
    bmax = ev.groupBy("bkt").agg(F.max("ts").alias("_bmax"))
    wcum = _W.orderBy("bkt").rowsBetween(_W.unboundedPreceding, -1)
    prev = bmax.select(
        "bkt", F.max("_bmax").over(wcum).alias("_prev_hwm")
    )
    x = (
        ev.join(F.broadcast(prev), "bkt")
        .withColumn("hwm", F.greatest(local_hwm, F.col("_prev_hwm")))
    )
    late = F.col("hwm").isNotNull()
    lag_s = F.unix_timestamp("hwm") - F.unix_timestamp("ts")

    def _cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return x.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        _cnt(late & (F.col("ts") < F.col("hwm"))).alias("late_any"),
        _cnt(late & (lag_s > 60)).alias("late_60s"),
        _cnt(late & (lag_s > 300)).alias("late_300s"),
        _cnt(late & (lag_s > 900)).alias("late_900s"),
    )


@_register(
    "corpus_quality_quantile_gate",
    """
    WITH q AS (
      SELECT doc_id, lang,
             floor((length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    / greatest(length(text), 1))
                   * least(CAST(len(regexp_split_to_array(text, '\\s+'))
                                AS BIGINT) / 50.0, 1.0)
                   * 10000) / 10000.0 AS quality
      FROM documents
    ),
    r AS (
      SELECT *, percent_rank() OVER (
               PARTITION BY lang ORDER BY quality DESC, doc_id) AS pr
      FROM q
    )
    SELECT doc_id, lang, quality,
           floor(pr * 10000) / 10000.0 AS pr_trunc
    FROM r WHERE pr <= 0.8
    """,
)
def corpus_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-quantile gate: keep each language's top 80% of
    documents by the composite quality heuristic — the relative-threshold
    filter that avoids a fixed cutoff starving low-resource languages
    (absolute quality distributions differ per lang; a global threshold
    would gate them unevenly).  Ties broken by doc_id so the kept set is
    deterministic; percent_rank's (rank-1)/(n-1) is one exact integer
    IEEE division, identical across engines.

    Scale shape: the quality features are per-row codegen; one lang-keyed
    shuffle + per-lang sort for the rank.  Known skew caveat: one
    dominant language sorts on one task — at 100 TB swap the exact
    percent_rank for a two-pass cutoff (per-lang approx quantile of
    quality, broadcast back as a filter), trading exactness of the
    boundary for a sort-free map-side gate; the gate SEMANTICS (relative
    per-lang threshold) stay identical."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_words = F.size(F.split(t, r"\s+"))
    quality = (
        F.floor(
            (alpha / F.greatest(n_chars, F.lit(1)))
            * F.least(n_words / 50.0, F.lit(1.0))
            * 10000
        )
        / 10000.0
    )
    q = docs.select("doc_id", "lang", quality.alias("quality"))
    from pyspark.sql import Window as _W

    w = _W.partitionBy("lang").orderBy(F.col("quality").desc(), F.col("doc_id"))
    return (
        q.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.8)
        .select(
            "doc_id",
            "lang",
            "quality",
            (F.floor(F.col("pr") * 10000) / 10000.0).alias("pr_trunc"),
        )
    )


@_register(
    "corpus_snapshot_diff",
    """
    WITH prev AS (
      SELECT doc_id, md5(text) AS h, n_chars FROM documents
      WHERE doc_id % 2 = 0
    ),
    cur AS (
      SELECT doc_id - 1 AS doc_id, md5(text) AS h, n_chars FROM documents
      WHERE doc_id % 2 = 1
    )
    SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
           CASE WHEN p.doc_id IS NULL THEN 'added'
                WHEN c.doc_id IS NULL THEN 'removed'
                WHEN p.h <> c.h THEN 'changed'
                ELSE 'unchanged' END AS change,
           coalesce(c.n_chars, 0) - coalesce(p.n_chars, 0) AS delta_chars
    FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
    WHERE p.doc_id IS NULL OR c.doc_id IS NULL OR p.h <> c.h
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change capture between two corpus versions (the refresh
    primitive an incremental pipeline diffs crawls with): classify every
    doc_id as added / removed / changed, with the byte-size delta —
    unchanged rows are filtered out so the diff is proportional to the
    CHANGE volume, not the corpus.  Snapshots are simulated as the
    even-doc corpus vs the odd-doc corpus shifted onto the same key
    space, giving all three classes real rows at every SF.

    Scale shape: one full outer join on the bigint doc_id — both sides
    shuffle once on the narrow key, 16-byte digests travel instead of
    text, and the post-join filter drops the (dominant) unchanged class
    before anything downstream sees it.  At 100 TB both snapshots would
    be bucketed on doc_id, making this join exchange-free
    (tests/test_plans.py pins the bucketed-join pattern)."""
    docs = _t(spark, sf_dir, "documents")
    prev = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.md5("text").alias("h"), "n_chars"
    )
    cur = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.md5("text").alias("h"),
        "n_chars",
    )
    p, c = prev.alias("p"), cur.alias("c")
    joined = p.join(c, F.col("p.doc_id") == F.col("c.doc_id"), "full_outer")
    change = (
        F.when(F.col("p.doc_id").isNull(), F.lit("added"))
        .when(F.col("c.doc_id").isNull(), F.lit("removed"))
        .when(F.col("p.h") != F.col("c.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("p.doc_id"), F.col("c.doc_id")).alias("doc_id"),
            change.alias("change"),
            (
                F.coalesce(F.col("c.n_chars"), F.lit(0))
                - F.coalesce(F.col("p.n_chars"), F.lit(0))
            ).alias("delta_chars"),
        )
        .filter(F.col("change") != "unchanged")
    )


@_register(
    "search_bm25_topk",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(w)) AS BIGINT) AS n_tokens
      FROM d
    ),
    tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d),
    tf AS (
      SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ('vector', 'join', 'stream')
      GROUP BY doc_id, dl, term
    ),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT t.doc_id,
             CAST(floor((2 * (s.n_docs - q.df) + 1) * 10000.0 / (2 * q.df + 1))
                  * floor(t.tf * 2200000.0 * 1000000
                      / (t.tf * 1000000
                         + floor(6 * (1000000
                             + 3 * floor(t.dl * 1000000.0 * s.n_docs
                                         / s.n_tokens)) / 20.0)))
                  AS BIGINT) AS contrib
      FROM tf t JOIN dfq q USING (term) CROSS JOIN stats s
    )
    SELECT doc_id,
           CAST(sum(contrib) / 1e10 AS DOUBLE) AS bm25,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer BM25 top-20 for the query {vector, join, stream}
    (operators/text.py:bm25_topk) — log-free RSJ idf and rational
    k1=6/5, b=3/4 make every floor() a correctly-rounded IEEE quotient
    of integer-valued doubles, so the ranking (and the top-k cut, total-
    ordered by (score desc, doc_id)) is bit-identical cross-engine.
    The reference has no search at all (sse.py's filters are equality
    whitelists); this is the ranked-retrieval surface over the same
    corpus the dedup/decontam family curates."""
    return text.bm25_topk(
        _t(spark, sf_dir, "documents"), ["vector", "join", "stream"], k=20
    )


@_register(
    "dedup_containment_grams",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> CAST(concat('0x', substr(md5(
                      words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                    ), 1, 15)) AS BIGINT))) AS sh
      FROM w WHERE len(words) >= 3
    ),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cold AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 64),
    exc AS (SELECT e.doc_id, e.g FROM ex e JOIN cold USING (g)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM exc l JOIN exc r ON l.g = r.g AND l.doc_id < r.doc_id
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(a.sh, b.sh)) AS inter,
             len(a.sh) AS na, len(b.sh) AS nb
      FROM cand c JOIN s a ON a.doc_id = c.doc_a
                  JOIN s b ON b.doc_id = c.doc_b
    )
    SELECT contained_id, container_id, containment FROM (
      SELECT doc_a AS contained_id, doc_b AS container_id,
             floor(inter * 10000.0 / na) / 10000.0 AS containment
      FROM scored
      UNION ALL
      SELECT doc_b, doc_a, floor(inter * 10000.0 / nb) / 10000.0
      FROM scored
    ) WHERE containment >= 0.8
    """,
)
def dedup_containment_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric gram-containment near-dup detection: |A∩B| / |A| >= 0.8
    flags A as (near-)contained in B — the quote/excerpt/boilerplate-
    inclusion case symmetric jaccard MISSES (a paragraph quoted inside a
    long article scores tiny jaccard but containment ~1).  Complements
    ``dedup_substring_containment`` (exact verbatim inclusion): gram
    containment survives small edits inside the quoted span.

    Both directions are scored from ONE intersection pass over the shared
    candidate frame; the 1e-4 floor-quantization keeps the threshold cut
    engine-identical.  Hot-gram cap caveat as ``dedup_ngram_jaccard``: a
    pair whose EVERY shared gram is hotter than ``_JACCARD_DF_CAP``
    escapes candidates — identical in both engines.

    Scale shape: reuses ``_md5_gram_frames`` (checkpointed gram frame,
    cold-gram-capped candidate equi-join); the union is two projections
    of one scored frame, not two joins."""
    docs = _t(spark, sf_dir, "documents")
    s, cand = _md5_gram_frames(docs)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    scored = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
        )
        # eager: the two union branches below are parallel stages of one
        # job and would race a lazy checkpoint into double materialization
        # (see dedup_threshold_curve)
        .localCheckpoint(eager=True)
    )
    fwd = scored.select(
        F.col("doc_a").alias("contained_id"),
        F.col("doc_b").alias("container_id"),
        (F.floor(F.col("inter") * 10000.0 / F.col("na")) / 10000.0).alias(
            "containment"
        ),
    )
    rev = scored.select(
        F.col("doc_b").alias("contained_id"),
        F.col("doc_a").alias("container_id"),
        (F.floor(F.col("inter") * 10000.0 / F.col("nb")) / 10000.0).alias(
            "containment"
        ),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= 0.8)


@_register(
    "text_winnow_fingerprints",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             len(words) - 2 AS n_grams,
             unnest(range(0, len(words) - 2)) AS pos,
             list_transform(range(1, len(words) - 1),
               i -> CAST(concat('0x', substr(md5(
                      words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                    ), 1, 15)) AS BIGINT)) AS hs
      FROM w WHERE len(words) >= 3
    ),
    grams AS (SELECT doc_id, n_grams, pos, hs[pos + 1] AS h FROM g),
    wm AS (
      SELECT doc_id, pos, n_grams,
             min({'h': h, 'p': pos}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
      FROM grams
    ),
    sel AS (
      SELECT DISTINCT doc_id, m.h AS h, m.p AS fp_pos
      FROM wm WHERE pos <= greatest(n_grams - 4, 0)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           min(h) AS fp_min,
           max(h) AS fp_max,
           bit_xor(h) AS fp_xor
    FROM sel GROUP BY doc_id
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints [Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    MOSS] over word 3-grams, window w=4
    (operators/text.py:winnow_fingerprint_stats): min-hash-per-window
    selection guarantees any shared >= 6-word span shares a fingerprint
    AND selections are at most 4 positions apart — the bounded-gap
    property ``text_fingerprint``'s mod-p sampling lacks.  Per-doc
    summary (count/min/max/XOR of the selected 60-bit md5 hashes); the
    order-independent XOR makes the oracle cover every selected
    fingerprint, not just the extremes.  Struct-min (h, pos) resolves
    window ties to the LEFTMOST position in both engines (MOSS picks
    rightmost — a pure convention; the guarantee is unchanged)."""
    return text.winnow_fingerprint_stats(
        _t(spark, sf_dir, "documents"), k=3, w=4
    )


@_register(
    "dedup_tfidf_cosine",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS wds
      FROM documents
    ),
    totals AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
    tok AS (SELECT doc_id, unnest(wds) AS term FROM d),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    w AS (
      SELECT t.doc_id, t.term,
             CAST(t.tf * floor((2 * s.n_docs + 1) * 100.0 / (2 * q.df + 1))
                  AS BIGINT) AS w
      FROM tf t JOIN dfreq q USING (term) CROSS JOIN totals s
    ),
    norms AS (
      SELECT doc_id, sqrt(CAST(sum(w * w) AS DOUBLE)) AS nrm
      FROM w GROUP BY doc_id
    ),
    cold AS (SELECT term FROM dfreq WHERE df <= 64),
    ex AS (SELECT w.doc_id, w.term FROM w JOIN cold USING (term)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM ex l JOIN ex r ON l.term = r.term AND l.doc_id < r.doc_id
    ),
    dots AS (
      SELECT c.doc_a, c.doc_b, CAST(sum(a.w * b.w) AS DOUBLE) AS dot
      FROM cand c
      JOIN w a ON a.doc_id = c.doc_a
      JOIN w b ON b.doc_id = c.doc_b AND b.term = a.term
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT dt.doc_a, dt.doc_b,
           floor(dt.dot * 10000.0 / (na.nrm * nb.nrm)) / 10000.0 AS cosine
    FROM dots dt JOIN norms na ON na.doc_id = dt.doc_a
                 JOIN norms nb ON nb.doc_id = dt.doc_b
    WHERE floor(dt.dot * 10000.0 / (na.nrm * nb.nrm)) / 10000.0 >= 0.5
    """,
)
def dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine near-dup pairs (operators/text.py:tfidf_cosine_pairs):
    the sparse-vector dedup lens — order-insensitive weighted-vocabulary
    similarity, catching the paraphrase/template class that word-order
    shingles under-score and that dense embeddings catch only if a model
    is available.  Exact-integer weights + DECIMAL accumulation make the
    1e-4-quantized cosine engine-identical (full recipe in the operator
    docstring).  Candidates from the shared cold-term equi-join (hot-term
    cap = the same f² stop-key guard as the gram family); the dot joins
    the FULL weight frames of candidates, so scores are exact."""
    return text.tfidf_cosine_pairs(
        _t(spark, sf_dir, "documents"), df_cap=64, threshold=0.5
    )


@_register(
    "search_hybrid_rrf",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(w)) AS BIGINT) AS n_tokens
      FROM d
    ),
    tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d),
    tf AS (
      SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ('vector', 'join', 'stream')
      GROUP BY doc_id, dl, term
    ),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT t.doc_id,
             CAST(floor((2 * (s.n_docs - q.df) + 1) * 10000.0 / (2 * q.df + 1))
                  * floor(t.tf * 2200000.0 * 1000000
                      / (t.tf * 1000000
                         + floor(6 * (1000000
                             + 3 * floor(t.dl * 1000000.0 * s.n_docs
                                         / s.n_tokens)) / 20.0)))
                  AS BIGINT) AS contrib
      FROM tf t JOIN dfq q USING (term) CROSS JOIN stats s
    ),
    bm AS (
      SELECT doc_id, CAST(sum(contrib) / 1e10 AS DOUBLE) AS bm25
      FROM scored GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 50
    ),
    bmr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS rank_bm25
      FROM bm
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    kn AS (
      SELECT vec_id,
             round(
               list_sum(list_transform(range(1, len(embedding) + 1),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(qv,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cos_sim
      FROM embeddings, q
      WHERE vec_id <> 0
      ORDER BY cos_sim DESC, vec_id LIMIT 50
    ),
    knr AS (
      SELECT vec_id,
             CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT)
               AS rank_knn
      FROM kn
    ),
    fused AS (
      SELECT coalesce(b.doc_id, k.vec_id) AS doc_id,
             b.rank_bm25, k.rank_knn,
             CAST(coalesce(floor(100000000.0 / (60 + b.rank_bm25)), 0)
                  + coalesce(floor(100000000.0 / (60 + k.rank_knn)), 0)
                  AS BIGINT) AS rrf_fp
      FROM bmr b FULL OUTER JOIN knr k ON b.doc_id = k.vec_id
    )
    SELECT doc_id, rrf_fp, rank_bm25, rank_knn
    FROM fused ORDER BY rrf_fp DESC, doc_id LIMIT 10
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion [Cormack/Clarke/
    Buettcher, SIGIR'09]: fuse the BM25 keyword top-50 with the
    embedding-cosine top-50 by rrf(d) = Σ 1/(60 + rank) — the standard
    production hybrid-search combiner (rank-based, so the two scoring
    scales never need calibration).  Ranks are exact integers and the
    fused score is fixed-point floor(1e8/(60+r)), so the fusion — and
    the final top-10 cut, total-ordered by (rrf_fp desc, doc_id) — is
    engine-identical.  Cross-modal contract: vec_id == doc_id (the same
    identity ``embed_norm_stats_by_lang`` joins on).

    Scale shape: each arm is its own top-k (TakeOrderedAndProject /
    bounded LIMIT); ranking windows run over <= 50-row frames (bounded by
    k, not the corpus), the fusion join is 50x50, and the corpus is
    touched exactly twice (once per arm)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    bm = text.bm25_topk(docs, ["vector", "join", "stream"], k=50)
    wb = Window.orderBy(F.desc("bm25"), "doc_id")
    bmr = bm.select(
        "doc_id", F.row_number().over(wb).cast("long").alias("rank_bm25")
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    kn = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                similarity.cosine(
                    F.col("embedding").cast("array<double>"), F.col("qv")
                ),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(50)
    )
    wk = Window.orderBy(F.desc("cos_sim"), "vec_id")
    knr = kn.select(
        "vec_id", F.row_number().over(wk).cast("long").alias("rank_knn")
    )
    fused = bmr.join(knr, bmr.doc_id == knr.vec_id, "full_outer").select(
        F.coalesce(bmr.doc_id, knr.vec_id).alias("doc_id"),
        "rank_bm25",
        "rank_knn",
        (
            F.coalesce(F.floor(100000000.0 / (60 + F.col("rank_bm25"))), F.lit(0))
            + F.coalesce(F.floor(100000000.0 / (60 + F.col("rank_knn"))), F.lit(0))
        )
        .cast("long")
        .alias("rrf_fp"),
    )
    return fused.select("doc_id", "rrf_fp", "rank_bm25", "rank_knn").orderBy(
        F.desc("rrf_fp"), "doc_id"
    ).limit(10)


@_register(
    "ts_ohlc_hourly",
    """
    WITH w AS (
      SELECT date_trunc('hour', ts) AS h, ts, event_id, value FROM events
    ),
    fl AS (
      SELECT h, value,
             first_value(value) OVER (
               PARTITION BY h ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS open,
             last_value(value) OVER (
               PARTITION BY h ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS close
      FROM w
    )
    SELECT CAST(h AS TIMESTAMP) AS bar_hour,
           max(open) AS open,
           max(value) AS high,
           min(value) AS low,
           max(close) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sign(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)))
                * floor((abs(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)))
                         + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS turnover
    FROM fl GROUP BY h
    """,
)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: the canonical time-series downsample (metrics, market
    data, sensor rollups) — per hour: first/last value in (ts, event_id)
    order plus min/max/count and a fixed-point turnover sum.  open/close
    ride a full-frame window ordered by the total (ts, event_id) key, so
    ties cannot flip the bar between engines or partitionings; min/max/
    count are order-free; the only sum is `_dsum` fixed-point.

    Scale shape: ONE exchange on the hour key serves the window and the
    final aggregate (same partitioning); at 100 TB the bar key is the
    table's time-partition column, making the exchange a scan-local
    sort."""
    ev = _t(spark, sf_dir, "events")
    h = F.date_trunc("hour", "ts")
    wfull = (
        Window.partitionBy("h")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    fl = ev.select(h.alias("h"), "ts", "event_id", "value").select(
        "h",
        "value",
        F.first("value").over(wfull).alias("open"),
        F.last("value").over(wfull).alias("close"),
    )
    return fl.groupBy("h").agg(
        F.max("open").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max("close").alias("close"),
        F.count("*").alias("n_events"),
        _dsum("value").alias("turnover"),
    ).select(
        F.col("h").alias("bar_hour"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
        "turnover",
    )


@_register(
    "scd2_user_state_history",
    """
    WITH o AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    chg AS (
      SELECT user_id, state, ts AS valid_from, event_id
      FROM o WHERE prev IS NULL OR state <> prev
    )
    SELECT user_id, state,
           CAST(valid_from AS TIMESTAMP) AS valid_from,
           CAST(lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from, event_id)
             AS TIMESTAMP) AS valid_to,
           CAST(lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL
             AS INTEGER) AS is_current
    FROM chg
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) derivation from an event log:
    collapse each user's event-type sequence into validity intervals
    [valid_from, valid_to) with an is_current flag — the standard
    warehouse move that turns an append-only log into a point-in-time
    joinable dimension (ask "what state was user U in at time T" with a
    BETWEEN join).  Consecutive duplicate states merge via lag(); every
    window orders by the total (ts, event_id) key so equal timestamps
    cannot reorder intervals between engines.

    Scale shape: one exchange on user_id serves BOTH windows (lag on the
    raw log, lead on the collapsed change rows — same partitioning
    carries through the filter), and the output is proportional to the
    CHANGE count, not the log."""
    ev = _t(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(wlag).alias("prev"),
    )
    chg = o.filter(
        F.col("prev").isNull() | (F.col("state") != F.col("prev"))
    ).select("user_id", "state", F.col("ts").alias("valid_from"), "event_id")
    wlead = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    nxt = F.lead("valid_from").over(wlead)
    return chg.select(
        "user_id",
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


def _pagerank_oracle_sql(iters: int = 3) -> str:
    """Unrolled-CTE twin of :func:`dedup.pagerank_fixedpoint` over the
    event-type transition graph: identical integer fixed-point rounds
    (int64 r*w products, one correctly-rounded double division per
    contribution, floor'd teleport + damped sums), so ranks match bit
    for bit."""
    ctes = [
        """o AS (
      SELECT user_id, event_type, event_id,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY event_id) AS nxt
      FROM events
    )""",
        """e AS (
      SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS w
      FROM o WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    )""",
        """nodes AS (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    )""",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src)",
        """r0 AS (
      SELECT node, CAST(floor(1000000000000.0 / nn.n) AS BIGINT) AS r
      FROM nodes CROSS JOIN nn
    )""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""c{t} AS (
      SELECT e.dst AS node,
             CAST(sum(CAST(floor((r.r * e.w) / o.ow) AS BIGINT)) AS BIGINT) AS m
      FROM e JOIN r{t - 1} r ON r.node = e.src JOIN ow o ON o.src = e.src
      GROUP BY e.dst
    )"""
        )
        ctes.append(
            f"""r{t} AS (
      SELECT n.node,
             CAST(floor(150000000000.0 / nn.n)
                  + floor(85 * coalesce(c.m, 0) / 100.0) AS BIGINT) AS r
      FROM nodes n CROSS JOIN nn LEFT JOIN c{t} c ON c.node = n.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, r AS rank_fp, CAST(r / 1e12 AS DOUBLE) AS rank
    FROM r{iters}"""
    )


@_register("graph_pagerank_transitions", _pagerank_oracle_sql())
def graph_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (edges = consecutive
    events per user with transition counts as weights;
    operators/dedup.py:pagerank_fixedpoint) — "which state do user
    journeys concentrate in", the stationary-importance complement of the
    raw path mining in ``path_top_event_trigrams``.  Fully deterministic
    fixed-point rounds verified bit-for-bit against the unrolled-CTE
    twin (same recipe as the PCA / IVF entries).

    Scale shape: edge extraction is one user_id window (a shuffle the
    sessionize family already pays) + a (src, dst)-keyed count; each
    rank round is a src-keyed join + dst-keyed aggregate over NODE-sized
    frames — on a billion-node graph the identical plan shuffles
    (node, rank) pairs only."""
    ev = _t(spark, sf_dir, "events")
    wlead = Window.partitionBy("user_id").orderBy("event_id")
    edges = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(wlead).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    return dedup.pagerank_fixedpoint(edges, iters=3)


@_register(
    "funnel_time_to_convert",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS vts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS pts
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.vts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    d AS (
      SELECT v.user_id,
             CAST(floor(epoch(p.pts)) - floor(epoch(v.vts)) AS BIGINT)
               AS delta_s
      FROM v JOIN p USING (user_id)
    ),
    q AS (
      SELECT user_id, delta_s,
             CAST(ntile(4) OVER (ORDER BY delta_s, user_id) AS INTEGER)
               AS quartile
      FROM d
    )
    SELECT quartile,
           CAST(count(*) AS BIGINT) AS n,
           min(delta_s) AS min_delta_s,
           max(delta_s) AS max_delta_s
    FROM q GROUP BY quartile
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: per user, seconds from FIRST view
    to the first purchase after it, summarized as exact quartile bands
    (the "how long does the funnel take" report next to
    ``funnel_view_click_purchase``'s "how many convert").  Quartiles via
    ntile ordered by the total (delta, user_id) key — exact and
    deterministic, where an approx-percentile would drift per run; the
    band max IS the exact p25/p50/p75/max.

    Scale shape: two user-keyed pre-aggregations (first view, first
    qualifying purchase) then one tiny converter frame; the ntile global
    sort runs on |converters| rows, not events — at 100 TB swap it for
    approx quantile cutpoints exactly as ``pack_length_buckets``
    documents."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .alias("e")
        .join(v.alias("v"), "user_id")
        .filter(F.col("e.ts") > F.col("v.vts"))
        .groupBy("user_id")
        .agg(F.min("e.ts").alias("pts"))
    )
    d = v.join(p, "user_id").select(
        "user_id",
        (F.col("pts").cast("long") - F.col("vts").cast("long")).alias("delta_s"),
    )
    q = d.select(
        "delta_s",
        F.ntile(4).over(Window.orderBy("delta_s", "user_id")).alias("quartile"),
    )
    return q.groupBy("quartile").agg(
        F.count("*").alias("n"),
        F.min("delta_s").alias("min_delta_s"),
        F.max("delta_s").alias("max_delta_s"),
    )


def _knn_batch_cos_sql() -> str:
    """Shared round-6 cosine expression for the batched ANN twin."""
    return (
        "round(list_sum(list_transform(range(1, len(c.embedding) + 1),"
        " i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))"
        " / (sqrt(list_sum(list_transform(c.embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        " * sqrt(list_sum(list_transform(q.embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"
    )


@_register(
    "knn_batch_topk",
    f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             {_knn_batch_cos_sql()} AS cos_sim
      FROM embeddings q JOIN embeddings c
        ON q.vec_id < 10 AND c.vec_id >= 10
    ),
    r AS (
      SELECT query_id, vec_id, cos_sim,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, vec_id)
               AS INTEGER) AS rnk
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM r WHERE rnk <= 5
    """,
)
def knn_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched brute-force ANN: top-5 neighbors for EACH of 10 query
    vectors in one pass — the eval-harness shape (recall@k over a query
    set), where per-query loops would rescan the corpus 10x.  The query
    block broadcasts (10 x 64 floats); scoring is one scan of the corpus
    side; the per-query cut is a row_number window that Spark pushes
    below the exchange as WindowGroupLimit, so only ~k rows per query
    ever shuffle.  Same round-6 cosine contract as
    ``knn_bruteforce_cosine`` (driver-green r01)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(similarity.cosine(F.col("cv"), F.col("qv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.select(
            "query_id", "vec_id", "cos_sim", F.row_number().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= 5)
    )


@_register(
    "scd2_as_of_lookup",
    """
    WITH o AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    chg AS (
      SELECT user_id, state, ts AS valid_from, event_id
      FROM o WHERE prev IS NULL OR state <> prev
    ),
    dim AS (
      SELECT user_id, state, valid_from,
             lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
      FROM chg
    )
    SELECT user_id, state,
           CAST(valid_from AS TIMESTAMP) AS valid_from
    FROM dim
    WHERE valid_from <= TIMESTAMP '2024-01-16 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-16 00:00:00')
    """,
)
def scd2_as_of_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup over the SCD2 dimension: the state of EVERY
    user as of 2024-01-16T00:00Z — the query shape the type-2 history
    (``scd2_user_state_history``) exists to serve ("what did the world
    look like at time T", the reproducibility backbone of any
    training-data snapshot).  The as-of predicate
    ``valid_from <= T < valid_to`` hits exactly one interval per user
    because intervals partition each user's timeline by construction.

    Scale shape: the interval predicate is a pure filter on the derived
    dimension — no join, no extra shuffle beyond the history's single
    user_id exchange; at warehouse scale the dimension would be stored
    partitioned on ``is_current``/month so the as-of filter prunes."""
    hist = scd2_user_state_history(spark, sf_dir)
    t = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", "state", "valid_from")


@_register(
    "window_sliding_distinct_users",
    """
    WITH slid AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 1800) * 1800 - offs AS BIGINT) AS win_start
      FROM events, (SELECT unnest([0, 1800]) AS offs) o
      WHERE floor(epoch(ts) / 1800) * 1800 - offs + 3600 > epoch(ts)
    )
    SELECT win_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM slid WHERE user_id IS NOT NULL GROUP BY win_start
    """,
)
def window_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window EXACT distinct actives (1h window, 30min slide) —
    the MAU/DAU-style rollup next to ``window_sliding_counts``'s plain
    counts.  Exact distinct needs the full key set per window (unlike the
    algebraic count), so Spark plans the classic two-level expand +
    partial-distinct aggregate; the approx twin at 100 TB is
    ``approx_count_distinct`` per window (``aggx_approx_distinct``
    carries that family's contract oracle)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count_distinct("user_id").alias("active_users"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "active_users",
        )
    )


@_register(
    "dedup_method_agreement",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents WHERE doc_id % 10 = 0
    ),
    s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> CAST(concat('0x', substr(md5(
                      words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                    ), 1, 15)) AS BIGINT))) AS sh
      FROM w WHERE len(words) >= 3
    ),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cold AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 64),
    exc AS (SELECT e.doc_id, e.g FROM ex e JOIN cold USING (g)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM exc l JOIN exc r ON l.g = r.g AND l.doc_id < r.doc_id
    ),
    j AS (
      SELECT c.doc_a AS a, c.doc_b AS b
      FROM cand c JOIN s sa ON sa.doc_id = c.doc_a
                  JOIN s sb ON sb.doc_id = c.doc_b
      WHERE floor(len(list_intersect(sa.sh, sb.sh)) * 10000.0
                  / len(list_distinct(list_concat(sa.sh, sb.sh)))) / 10000
            >= 0.5
    ),
    sub AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    c AS (
      SELECT x.vec_id AS a, y.vec_id AS b
      FROM sub x JOIN sub y ON x.vec_id < y.vec_id
      WHERE floor(list_cosine_similarity(x.v, y.v) * 10000) / 10000 > 0.3
    ),
    m AS (
      SELECT CASE WHEN j.a IS NOT NULL AND c.a IS NOT NULL THEN 'both'
                  WHEN j.a IS NOT NULL THEN 'text_only'
                  ELSE 'embedding_only' END AS method
      FROM j FULL OUTER JOIN c ON j.a = c.a AND j.b = c.b
    )
    SELECT method, CAST(count(*) AS BIGINT) AS n_pairs
    FROM m GROUP BY method
    """,
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-method cross-validation: on one deterministic 1/10 universe
    (doc_id == vec_id), do word-gram jaccard (>= 0.5) and embedding
    cosine (> 0.3) flag the SAME near-dup pairs?  The agreement matrix
    (both / text_only / embedding_only) is the diagnostic a pipeline
    reads before trusting either method alone — text-only hits are
    verbatim template reuse with divergent embeddings, embedding-only
    hits are paraphrases sharing no 3-gram.  Pure composition of the two
    oracled pair generators on a shared subsample; a class with zero
    pairs is absent in both engines identically.

    Scale shape: both pair frames inherit their generators' candidate
    gating; the full-outer agreement join keys on the (a, b) pair —
    narrow, and proportional to flagged pairs, not the corpus."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    j = (
        _md5_jaccard_scored_pairs(docs)
        .filter(F.col("jaccard") >= 0.5)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    c = similarity.cosine_pairs_exact(
        emb, threshold=0.3, allow_quadratic=True
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    ja, ca = j.alias("j"), c.alias("c")
    m = ja.join(
        ca,
        (F.col("j.a") == F.col("c.a")) & (F.col("j.b") == F.col("c.b")),
        "full_outer",
    ).select(
        F.when(
            F.col("j.a").isNotNull() & F.col("c.a").isNotNull(), F.lit("both")
        )
        .when(F.col("j.a").isNotNull(), F.lit("text_only"))
        .otherwise(F.lit("embedding_only"))
        .alias("method")
    )
    return m.groupBy("method").agg(F.count("*").alias("n_pairs"))


@_register(
    "funnel_attribution_last_touch",
    """
    WITH o AS (
      SELECT user_id, event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT coalesce(touch, 'none') AS touch,
           CAST(count(*) AS BIGINT) AS purchases,
           CAST(sign(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)))
                * floor((abs(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)))
                         + 5000.0) / 10000.0) / 100.0 AS DOUBLE) AS revenue
    FROM o WHERE event_type = 'purchase' GROUP BY touch
    """,
)
def funnel_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credited to the user's most
    recent preceding view/click — the standard marketing-attribution
    report, and the in-window formulation of an as-of join (no join at
    all: one ordered window with IGNORE NULLS carries the last qualifying
    touch forward).  The window orders by the total (ts, event_id) key so
    same-timestamp events cannot flip attribution between engines;
    revenue is the `_dsum` fixed-point sum.

    Scale shape: ONE user_id exchange (the same sessionize-family
    shuffle), then a tiny grouped aggregate over touch classes —
    compare ``join_asof`` which pays a range join for the two-table
    version of this shape."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("view", "click"), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(w)
    o = ev.select("user_id", "event_type", "value", touch.alias("touch"))
    return (
        o.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch"))
        .agg(
            F.count("*").alias("purchases"),
            _dsum("value").alias("revenue"),
        )
    )


@_register(
    "decontam_multi_suite_report",
    """
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i
      FROM words
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram FROM idx
    ),
    ev AS (
      SELECT 'suite_a' AS eval_set, gram FROM grams WHERE doc_id % 97 = 0
      UNION
      SELECT 'suite_b', gram FROM grams WHERE doc_id % 89 = 0
    ),
    tr AS (
      SELECT doc_id, gram FROM grams
      WHERE doc_id % 97 <> 0 AND doc_id % 89 <> 0
    ),
    tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_train FROM tr),
    hits AS (
      SELECT ev.eval_set, tr.doc_id,
             CAST(count(DISTINCT tr.gram) AS BIGINT) AS shared
      FROM tr JOIN ev ON tr.gram = ev.gram
      GROUP BY ev.eval_set, tr.doc_id
    )
    SELECT h.eval_set,
           CAST(count(*) AS BIGINT) AS n_contaminated_docs,
           CAST(sum(h.shared) AS BIGINT) AS n_doc_gram_hits,
           floor(count(*) * 10000.0 / t.n_train) / 10000.0
             AS contaminated_frac
    FROM hits h CROSS JOIN tot t
    GROUP BY h.eval_set, t.n_train
    """,
)
def decontam_multi_suite_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark-suite decontamination report: the production shape of
    ``decontam_ngram_overlap`` — a pipeline screens against MANY held-out
    suites at once (each its own deterministic slice here), and the
    release gate reads per-suite contaminated-doc counts and fractions,
    not a single global flag.  One train-gram frame serves every suite:
    the eval side unions with a suite label BEFORE the single gram-keyed
    join, so adding a suite adds label rows, never another corpus scan.
    Join key is xxhash64(gram) (8-byte long; string-keyed oracle
    value-checks it, same contract as the single-suite entry).

    Scale shape: one gram-keyed shuffle for the join, doc-keyed partial
    aggregate, broadcast 1-row train total; AQE sizes the (small,
    suite-labeled) eval side."""
    docs = _t(spark, sf_dir, "documents")
    grams = text.word_ngram_hashes(docs, 5).distinct()
    ev = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select(F.lit("suite_a").alias("eval_set"), "gram_h")
        .unionByName(
            grams.filter(F.col("doc_id") % 89 == 0).select(
                F.lit("suite_b").alias("eval_set"), "gram_h"
            )
        )
        .distinct()
    )
    tr = grams.filter(
        (F.col("doc_id") % 97 != 0) & (F.col("doc_id") % 89 != 0)
    )
    tot = tr.agg(F.count_distinct("doc_id").alias("n_train"))
    hits = (
        tr.join(ev, "gram_h")
        .groupBy("eval_set", "doc_id")
        .agg(F.count_distinct("gram_h").alias("shared"))
    )
    return (
        hits.groupBy("eval_set")
        .agg(
            F.count("*").alias("n_contaminated_docs"),
            F.sum("shared").alias("n_doc_gram_hits"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "eval_set",
            "n_contaminated_docs",
            "n_doc_gram_hits",
            (
                F.floor(F.col("n_contaminated_docs") * 10000.0 / F.col("n_train"))
                / 10000.0
            ).alias("contaminated_frac"),
        )
    )


@_register(
    "decontam_split_leakage_report",
    r"""
    WITH RECURSIVE w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> CAST(concat('0x', substr(md5(
                      words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                    ), 1, 15)) AS BIGINT))) AS sh
      FROM w WHERE len(words) >= 3
    ),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cold AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 64),
    exc AS (SELECT e.doc_id, e.g FROM ex e JOIN cold USING (g)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM exc l JOIN exc r ON l.g = r.g AND l.doc_id < r.doc_id
    ),
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN s a ON a.doc_id = c.doc_a JOIN s b ON b.doc_id = c.doc_b
      WHERE floor(len(list_intersect(a.sh, b.sh)) * 10000.0
                  / len(list_distinct(list_concat(a.sh, b.sh)))) / 10000 >= 0.5
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, wk.comp FROM walk wk JOIN edges e ON wk.id = e.src),
    comp AS (SELECT id, min(comp) AS component FROM walk GROUP BY id),
    labeled AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_rep
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
    sp AS (
      SELECT doc_id,
             CASE WHEN CAST(concat('0x', substr(md5('split:' || CAST(cluster_rep AS VARCHAR)), 1, 15))
                       AS BIGINT) / 1152921504606846976.0 < 0.1
                  THEN 'val' ELSE 'train' END AS split
      FROM labeled),
    words5 AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(generate_series(1, greatest(len(w) - 4, 0))) AS i
      FROM words5
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram FROM idx
    ),
    ev AS (
      SELECT 'suite_a' AS eval_set, gram FROM grams WHERE doc_id % 97 = 0
      UNION
      SELECT 'suite_b', gram FROM grams WHERE doc_id % 89 = 0
    ),
    tr AS (
      SELECT doc_id, gram FROM grams
      WHERE doc_id % 97 <> 0 AND doc_id % 89 <> 0
    ),
    trs AS (
      SELECT t.doc_id, t.gram, sp.split FROM tr t JOIN sp USING (doc_id)
    ),
    st AS (
      SELECT split, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_split
      FROM trs GROUP BY split
    ),
    hits AS (
      SELECT ev.eval_set, trs.split, trs.doc_id,
             CAST(count(DISTINCT trs.gram) AS BIGINT) AS shared
      FROM trs JOIN ev ON trs.gram = ev.gram
      GROUP BY ev.eval_set, trs.split, trs.doc_id
    )
    SELECT h.eval_set, h.split,
           CAST(count(*) AS BIGINT) AS n_contaminated_docs,
           CAST(sum(h.shared) AS BIGINT) AS n_doc_gram_hits,
           floor(count(*) * 10000.0 / st.n_split) / 10000.0
             AS contaminated_frac
    FROM hits h JOIN st ON h.split = st.split
    GROUP BY h.eval_set, h.split, st.n_split
    ORDER BY h.eval_set, h.split
    """,
)
def decontam_split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-aware EVAL-SPLIT report (VERDICT r12 next #6a) —
    the cross of two proven rows: which benchmark suite's items leak
    into which leakage-safe split.  ``decontam_multi_suite_report``
    says "these training docs share 5-grams with suite X";
    ``corpus_split_leakage_safe`` says "these docs are train, those are
    val".  Composed, the release gate reads the cell that actually
    matters: suite-contaminated docs sitting in the TRAIN split inflate
    that suite's scores (must be dropped or the suite discarded), while
    contamination confined to the val split only biases internal
    validation.  Per (suite, split): contaminated-doc count, doc-gram
    hit mass, and the contaminated fraction of that split's corpus.

    Composition is by reuse, not re-derivation: the split labels come
    from the REGISTERED ``corpus_split_leakage_safe`` query (same plan:
    md5-gram jaccard pairs -> large/small-star CC -> salted split on the
    cluster rep) and the gram side is the same ``word_ngram_hashes``
    xxhash64 frame the multi-suite report joins (string-keyed oracle
    value-checks the hash contract, as there).

    Scale shape: adds ONE broadcast-sized join to the multi-suite plan —
    the (doc_id, split) label frame joins the train gram frame on
    doc_id before the gram-keyed suite join; the per-split denominator
    is a 2-row aggregate.  No new data-shaped stage beyond the two
    parents' own."""
    split_lbl = QUERIES["corpus_split_leakage_safe"].spark(spark, sf_dir).select(
        "doc_id", "split"
    )
    docs = _t(spark, sf_dir, "documents")
    grams = text.word_ngram_hashes(docs, 5).distinct()
    ev = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select(F.lit("suite_a").alias("eval_set"), "gram_h")
        .unionByName(
            grams.filter(F.col("doc_id") % 89 == 0).select(
                F.lit("suite_b").alias("eval_set"), "gram_h"
            )
        )
        .distinct()
    )
    tr = grams.filter(
        (F.col("doc_id") % 97 != 0) & (F.col("doc_id") % 89 != 0)
    )
    trs = tr.join(split_lbl, "doc_id")
    st = trs.groupBy("split").agg(
        F.count_distinct("doc_id").alias("n_split")
    )
    hits = (
        trs.join(ev, "gram_h")
        .groupBy("eval_set", "split", "doc_id")
        .agg(F.count_distinct("gram_h").alias("shared"))
    )
    return (
        hits.groupBy("eval_set", "split")
        .agg(
            F.count("*").alias("n_contaminated_docs"),
            F.sum("shared").alias("n_doc_gram_hits"),
        )
        .join(F.broadcast(st), "split")
        .select(
            "eval_set",
            "split",
            "n_contaminated_docs",
            "n_doc_gram_hits",
            (
                F.floor(
                    F.col("n_contaminated_docs") * 10000.0 / F.col("n_split")
                )
                / 10000.0
            ).alias("contaminated_frac"),
        )
        .orderBy("eval_set", "split")
    )


@_register(
    "aggx_regression_exact",
    """
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) - 473000 AS BIGINT) AS x,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y_fp
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y_fp) AS HUGEINT) AS sy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(x * y_fp) AS HUGEINT) AS sxy
      FROM b GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           floor((CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)) / 1e6 * 10000) / 10000.0
             AS slope_per_hour,
           floor((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / 1e6 * 10000) / 10000.0 AS intercept
    FROM m
    """,
)
def aggx_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate (slope/intercept of value vs time per
    event type) from EXACT integer moments — the engine's answer to the
    ``regr_slope``/``regr_intercept`` family, reformulated so the result
    is order-independent and cross-engine bit-identical: x = hour index
    (small int; epoch/3600 − 473000 keeps products in int64), y in the
    1e6 fixed-point domain, the five moments summed exactly (DECIMAL /
    HUGEINT accumulators), then ONE identical double-arithmetic chain on
    both sides, floor-quantized at 1e-4.  Spark's built-in ``regr_*``
    (double covar sums) reassociates across partitions — the same class
    the fixed-point money sums exist for.

    Scale shape: classic two-level aggregate — map-side partial moments,
    one low-cardinality shuffle, five narrow columns."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 3600) - 473000)
        .cast("long")
        .alias("x"),
        _fp(F.col("value")).cast("long").alias("y_fp"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # addends cast to decimal(38,0) INSIDE the sums: the per-row x*y_fp
    # product (~1e10-1e11 here) is int64-safe, but a 100 TB group's SUM of
    # such addends is not — plain long accumulators would wrap (or ANSI-
    # error) well below the docstring's claimed scale (ADVICE r05 low),
    # while the HUGEINT twin kept going.  decimal(38,0) matches it.
    m = b.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d38(F.col("x"))).alias("sx"),
        F.sum(d38(F.col("y_fp"))).alias("sy"),
        F.sum(d38(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(d38(F.col("x") * F.col("y_fp"))).alias("sxy"),
    )
    num = (d38(F.col("n")) * d38(F.col("sxy")) - d38(F.col("sx")) * d38(F.col("sy"))).cast(
        "double"
    )
    den = (d38(F.col("n")) * d38(F.col("sxx")) - d38(F.col("sx")) * d38(F.col("sx"))).cast(
        "double"
    )
    slope_d = num / den
    intercept_d = (
        F.col("sy").cast("double") / F.col("n").cast("double")
        - slope_d * F.col("sx").cast("double") / F.col("n").cast("double")
    )
    q4 = lambda c: F.floor(c / 1e6 * 10000) / 10000.0  # noqa: E731
    return m.select(
        "event_type",
        "n",
        q4(slope_d).alias("slope_per_hour"),
        q4(intercept_d).alias("intercept"),
    )


@_register(
    "udf_grouped_map_zscore",
    """
    WITH b AS (
      SELECT event_id, event_type,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(y) AS HUGEINT) AS s,
             CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
               AS s2
      FROM b GROUP BY event_type
    )
    SELECT b.event_id, b.event_type,
           CASE WHEN m.n * m.s2 = m.s * m.s THEN 0.0
                ELSE floor(CAST(m.n * b.y - m.s AS DOUBLE)
                           / sqrt(CAST(m.n * m.s2 - m.s * m.s AS DOUBLE))
                           * 10000) / 10000.0
           END AS z
    FROM b JOIN m USING (event_type)
    """,
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (``applyInPandas``): per-event-type z-score
    normalization with each group handed to a numpy kernel — the batch
    grouped-map API surface (§2.8 UDF family) that
    ``udf_pandas_scalar_charge``'s scalar UDF and the streaming
    ``applyInPandasWithState`` entries don't cover.

    Oracle despite Python floats: the kernel normalizes via EXACT integer
    moments — y in the 1e6 fixed-point domain, z = (n·y − Σy) /
    sqrt(n·Σy² − (Σy)²) with the numerator exact in int64 (bounded by
    n·y ≤ 2^53) and one int→double conversion + sqrt + divide, the same
    correctly-rounded chain the SQL twin runs on HUGEINT moments — so the
    1e-4-floored z is bit-identical regardless of pandas row order.  A
    zero-variance group yields z = 0 in both engines.

    Scale shape: one shuffle on the group key; each group streams
    through Arrow once.  (A global z-score would use the broadcast-
    moments pattern of ``embed_standardize`` instead — grouped-map is
    the right tool when per-group logic is genuinely imperative.)"""
    import math

    import numpy as np
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        y = np.floor(pdf["value"].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
        n = len(y)
        s = int(y.sum())
        s2 = int(np.dot(y.astype(object), y.astype(object)))
        den2 = n * s2 - s * s
        if den2 == 0:
            z = np.zeros(n)
        else:
            num = (n * y - s).astype(np.float64)  # |n*y| <= 2^53: exact
            z = np.floor(num / math.sqrt(float(den2)) * 10000) / 10000
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "z": z}
        )

    return ev.groupBy("event_type").applyInPandas(
        kernel, "event_id long, event_type string, z double"
    )


@_register(
    "llm_dataset_card",
    r"""
    WITH t AS (
      SELECT doc_id, lang, source,
             len(regexp_split_to_array(text, '\s+')) AS ntok,
             md5(text) AS h
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           CAST(min(ntok) AS BIGINT) AS min_tokens,
           CAST(max(ntok) AS BIGINT) AS max_tokens,
           floor((count(*) - count(DISTINCT h)) * 10000.0 / count(*))
             / 10000.0 AS dup_doc_frac,
           floor(sum(ntok) * 10000.0 / count(*)) / 10000.0 AS mean_tokens
    FROM t
    """,
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary — the one-row fact sheet a training corpus
    ships with (docs, languages, sources, token totals/extremes,
    exact-duplicate fraction, mean length), computed in ONE scan + one
    aggregate.  Every number is exact-integer or 1e-4-floored, so the
    card is reproducible to the digit across engines and reruns — the
    property a published dataset card needs and ad-hoc notebook stats
    lack.  Complements the per-slice reports (``corpus_*``, ``text_*``,
    ``dedup_*``): this is the headline row above them.

    Scale shape: single pass, map-side partial aggregation; the distinct
    counts (lang/source/digest) are the only grouped state, each bounded
    by its domain (digest distinct ~= |corpus| — at 100 TB swap it for
    the two-pass exact count or HLL, as ``aggx_approx_distinct``
    documents)."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        "source",
        F.size(F.split(F.col("text"), r"\s+")).alias("ntok"),
        F.md5("text").alias("h"),
    )
    return t.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("ntok").cast("long").alias("total_tokens"),
        F.min("ntok").cast("long").alias("min_tokens"),
        F.max("ntok").cast("long").alias("max_tokens"),
        (
            F.floor(
                (F.count("*") - F.count_distinct("h")) * 10000.0 / F.count("*")
            )
            / 10000.0
        ).alias("dup_doc_frac"),
        (F.floor(F.sum("ntok") * 10000.0 / F.count("*")) / 10000.0).alias(
            "mean_tokens"
        ),
    )


@_register(
    "corpus_snapshot_merge",
    """
    WITH prev AS (
      SELECT doc_id, md5(text) AS h, n_chars
      FROM documents WHERE doc_id % 2 = 0
    ),
    cur AS (
      SELECT doc_id - 1 AS doc_id, md5(text) AS h, n_chars
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
           coalesce(c.h, p.h) AS h,
           CAST(coalesce(c.n_chars, p.n_chars) AS BIGINT) AS n_chars,
           CASE WHEN p.doc_id IS NULL THEN 'inserted'
                WHEN c.doc_id IS NULL THEN 'kept'
                WHEN p.h <> c.h THEN 'updated'
                ELSE 'unchanged' END AS op
    FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
    """,
)
def corpus_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert: apply a change snapshot onto a base corpus — the
    lakehouse ``MERGE INTO`` shape (matched -> update, not-matched ->
    insert, base-only -> keep) as a single full-outer coalesce, with the
    applied operation labeled per row.  Completes the CDC family:
    ``corpus_snapshot_diff`` detects changes, ``scd2_*`` keeps their
    history, this applies them.  Snapshots are the same simulated split
    the diff entry uses, so the two queries reconcile row-for-row.

    Scale shape: one full-outer shuffle on the bigint key moving 16-byte
    digests, never text; with both snapshots bucketed on doc_id the
    exchange disappears — the exact plan a MERGE-supporting table format
    executes underneath."""
    docs = _t(spark, sf_dir, "documents")
    prev = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.md5("text").alias("h"), "n_chars"
    )
    cur = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.md5("text").alias("h"),
        "n_chars",
    )
    p, c = prev.alias("p"), cur.alias("c")
    op = (
        F.when(F.col("p.doc_id").isNull(), F.lit("inserted"))
        .when(F.col("c.doc_id").isNull(), F.lit("kept"))
        .when(F.col("p.h") != F.col("c.h"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return p.join(c, F.col("p.doc_id") == F.col("c.doc_id"), "full_outer").select(
        F.coalesce(F.col("c.doc_id"), F.col("p.doc_id")).alias("doc_id"),
        F.coalesce(F.col("c.h"), F.col("p.h")).alias("h"),
        F.coalesce(F.col("c.n_chars"), F.col("p.n_chars"))
        .cast("long")
        .alias("n_chars"),
        op.alias("op"),
    )


@_register(
    "scd2_point_in_time_join",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    chg AS (
      SELECT user_id, event_type AS state, ts AS valid_from, event_id
      FROM o WHERE prev IS NULL OR event_type <> prev
    ),
    dim AS (
      SELECT user_id, state, valid_from,
             lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
      FROM chg
    ),
    p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT d.state AS state_at_purchase,
           CAST(count(*) AS BIGINT) AS n_purchases
    FROM p JOIN dim d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR d.valid_to > p.ts)
    GROUP BY d.state
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time JOIN against the SCD2 dimension: every purchase
    enriched with the user's state AT ITS OWN TIMESTAMP (each event hits
    exactly one validity interval), then rolled up per state — the query
    shape the type-2 history exists to serve, generalizing the
    fixed-moment ``scd2_as_of_lookup`` to per-row as-of semantics.
    (A purchase's own change row starts its interval AT the purchase ts,
    so ``valid_from <= ts`` matches it — the standard inclusive-start
    convention.)

    Scale shape: dimension and fact co-partition on user_id (the
    dimension derivation already paid that exchange); the interval
    predicate is a residual on the equi-join, so no range-join explosion
    — per user the intervals partition the timeline, bounding matches at
    one per fact row."""
    ev = _t(spark, sf_dir, "events")
    dim = scd2_user_state_history(spark, sf_dir).select(
        "user_id", "state", "valid_from", "valid_to"
    )
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = p.join(
        dim,
        (p.user_id == dim.user_id)
        & (dim.valid_from <= p.ts)
        & (dim.valid_to.isNull() | (dim.valid_to > p.ts)),
    )
    return joined.groupBy(F.col("state").alias("state_at_purchase")).agg(
        F.count("*").alias("n_purchases")
    )


@_register(
    "window_activity_streaks",
    """
    WITH a AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
      FROM events
    ),
    x AS (
      SELECT user_id, h,
             h - row_number() OVER (PARTITION BY user_id ORDER BY h) AS grp
      FROM a
    )
    SELECT user_id,
           CAST(min(h) AS BIGINT) AS streak_start_hour,
           CAST(count(*) AS BIGINT) AS streak_hours
    FROM x GROUP BY user_id, grp
    """,
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active hours per user
    (engagement streaks) via the classic ``value − row_number()`` grouping
    constant — consecutive values share a group key, a gap starts a new
    one.  The sequence-run primitive the time-gap ``sessionize_events``
    (which keys on inter-event deltas, not calendar continuity) does not
    express.

    Scale shape: distinct (user, hour) pre-aggregation shrinks events to
    active-hours; ONE user_id exchange serves the distinct, the window,
    and the island aggregate (all key on user_id first)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        "user_id", F.floor(F.col("ts").cast("long") / 3600).alias("h")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("h")
    x = a.select("user_id", "h", (F.col("h") - F.row_number().over(w)).alias("grp"))
    return x.groupBy("user_id", "grp").agg(
        F.min("h").alias("streak_start_hour"),
        F.count("*").alias("streak_hours"),
    ).select("user_id", "streak_start_hour", "streak_hours")


@_register(
    "embed_drift_by_lang",
    """
    WITH ex0 AS (
      SELECT vec_id, unnest(range(0, 64)) AS d,
             unnest(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    j AS (
      SELECT doc.lang, e.vec_id % 2 AS par, e.d, e.val
      FROM ex0 e JOIN documents doc ON doc.doc_id = e.vec_id
    ),
    m AS (
      SELECT lang, par, d,
             CAST(sum(CAST(floor(val * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY lang, par, d
    ),
    p AS (
      SELECT a.lang, a.d,
             CAST(a.s AS DOUBLE) / a.n / 1000000.0
             - CAST(b.s AS DOUBLE) / b.n / 1000000.0 AS diff
      FROM m a JOIN m b
        ON a.lang = b.lang AND a.d = b.d AND a.par = 0 AND b.par = 1
    ),
    q AS (
      SELECT lang,
             CAST(floor(diff * diff * 1e12 + 0.5) AS BIGINT) AS dq
      FROM p
    )
    SELECT lang,
           floor(sqrt(CAST(sum(dq) AS DOUBLE) / 1e12) * 1000000)
             / 1000000.0 AS drift_l2
    FROM q GROUP BY lang
    """,
)
def embed_drift_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-drift monitor: per language, the L2 distance between the
    mean embedding of the even-id half and the odd-id half (the two
    halves standing in for consecutive snapshots / model versions) — the
    ML-ops check that catches a silent encoder change or distribution
    shift before it poisons an ANN index.  Per-dimension means come from
    exact fixed-point coordinate sums (the ``embed_standardize`` moment
    recipe); squared diffs are re-quantized to exact int64 before the
    cross-dimension sum, so the 1e-6-floored drift is order-independent
    and engine-identical.

    Scale shape: one (lang, parity, dim)-keyed aggregate over the
    exploded coordinates (map-side combined; 2·64·|langs| output rows),
    then dimension-aligned self-join and a per-lang reduce — nothing
    touches pairs of vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    ex = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "val"),
    )
    j = ex.join(docs, "vec_id").select(
        "lang", (F.col("vec_id") % 2).alias("par"), "d", "val"
    )
    m = j.groupBy("lang", "par", "d").agg(
        F.sum(_fp(F.col("val")).cast("long")).alias("s"),
        F.count("*").alias("n"),
    )
    a = m.filter(F.col("par") == 0).select(
        "lang", "d", F.col("s").alias("sa"), F.col("n").alias("na")
    )
    b = m.filter(F.col("par") == 1).select(
        "lang", "d", F.col("s").alias("sb"), F.col("n").alias("nb")
    )
    diff = (
        F.col("sa").cast("double") / F.col("na") / 1000000.0
        - F.col("sb").cast("double") / F.col("nb") / 1000000.0
    )
    q = a.join(b, ["lang", "d"]).select(
        "lang",
        F.floor(diff * diff * F.lit(1e12) + 0.5).cast("long").alias("dq"),
    )
    return q.groupBy("lang").agg(
        (
            F.floor(F.sqrt(F.sum("dq").cast("double") / F.lit(1e12)) * 1000000)
            / 1000000.0
        ).alias("drift_l2")
    )




# =========================================================================== #
# r07 additions: semantic dedup, importance resampling, novelty, encoding,    #
# weighted sampling                                                           #
# =========================================================================== #


def _semdedup_oracle(threshold: float = 0.3) -> str:
    """Fixed-point IVF cells + within-cell exact-cosine pairs: the
    SemDeDup twin.  Cell assignment reuses the verified unrolled-Lloyd
    CTEs; the pair cosine uses the same floor-at-1e-4 convention as
    ``dedup_embedding_cosine`` (list_cosine_similarity vs the Arrow
    kernel — last-digit agreement argued there)."""
    ctes, final = _ivf_fixedpoint_ctes()
    ctes.append(
        "vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
    )
    ctes.append(
        f"sidex AS (SELECT a.vec_id, a.cell, v.v FROM {final} a"
        " JOIN vv v USING (vec_id))"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 AS cos_sim
    FROM sidex a JOIN sidex b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 > {threshold}"""
    )


@_register("dedup_semdedup_cells", _semdedup_oracle())
def dedup_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup [Abbas et al. 2023] semantic dedup
    (operators/similarity.py:semdedup_cell_pairs): the quadratic cosine
    comparison runs only WITHIN each cell of the verified fixed-point IVF
    quantizer — sum_c O(|c|^2) work instead of O(n^2), the paper's recipe
    for semantic dedup at LAION scale.  Pure composition of two oracled
    primitives (Lloyd cells + the Arrow cosine kernel), so fully
    value-verified end to end; contrast ``dedup_embedding_cosine`` (the
    subsampled all-pairs baseline) and ``dedup_embedding_cosine_lsh``
    (the banding alternative: recall-bounded candidates rather than
    cell-exhaustive)."""
    return similarity.semdedup_cell_pairs(_t(spark, sf_dir, "embeddings"))


@_register(
    "corpus_dsir_weights",
    r"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(lower(text), '\s+')) AS w
      FROM documents
    ),
    stats AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cs,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
      FROM tok GROUP BY w
    ),
    totals AS (
      SELECT CAST(sum(cs) AS BIGINT) AS ns, CAST(sum(ct) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS v
      FROM stats
    )
    SELECT t.doc_id, t.lang,
           CAST(sum(CAST(floor(((s.ct + 1.0) * (o.ns + o.v) * 10000.0)
                     / ((s.cs + 1.0) * (o.nt + o.v))) AS BIGINT)) AS BIGINT)
             AS dsir_weight_fp,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM tok t JOIN stats s USING (w) CROSS JOIN totals o
    GROUP BY t.doc_id, t.lang
    """,
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance-resampling weights
    (operators/corpus.py:dsir_weights): every document scored by a
    rational fixed-point likelihood ratio of target (lang='en') vs
    source unigram models — the data-selection signal that resamples a
    raw crawl toward a target domain [Xie et al. 2023].  One tokenize
    pass, one vocab-keyed aggregate broadcast back over the token
    stream, one doc-keyed sum; the log-free ratio keeps every step a
    single IEEE op so the weights are bit-identical cross-engine (see
    the operator docstring for the overflow envelope)."""
    return corpus.dsir_weights(_t(spark, sf_dir, "documents"))


@_register(
    "text_novelty_first_owner",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS words
      FROM documents
    ),
    gi AS (
      SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
      FROM w WHERE len(words) >= 3
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS gram
      FROM gi
    ),
    first AS (SELECT gram, min(doc_id) AS first_owner FROM grams GROUP BY gram),
    per AS (
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN f.first_owner = g.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM grams g JOIN first f USING (gram) GROUP BY g.doc_id
    )
    SELECT doc_id, n_grams, n_novel,
           floor(n_novel * 1.0 / n_grams * 10000) / 10000.0 AS novelty
    FROM per
    """,
)
def text_novelty_first_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document marginal novelty (operators/text.py:novelty_first_owner):
    fraction of the doc's distinct word trigrams it is the FIRST owner of
    (min doc_id over the corpus) — the is-this-crawl-batch-new signal.
    LINEAR pipeline, one corpus scan, two data shuffles: a gram-key
    repartition that the per-doc dedup aggregate AND the min-owner window
    both ride (subset partitioning), then the doc-keyed count — the
    min-per-gram is a window, not a groupBy+join-back (which would
    re-tokenize the corpus for each join side).  Docs with < 3 words have
    no trigrams and drop out in both engines."""
    return text.novelty_first_owner(_t(spark, sf_dir, "documents"))


@_register(
    "text_encoding_quality",
    r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text) - length(replace(text, chr(65533), ''))
                AS BIGINT) AS n_repl,
           CAST(length(text) - length(regexp_replace(text,
                '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'))
                AS BIGINT) AS n_ctrl,
           floor((length(text) - length(regexp_replace(text,
                '[\x20-\x7e]', '', 'g'))) * 1.0
                / greatest(length(text), 1) * 10000) / 10000.0
             AS printable_frac,
           floor((length(text) - length(regexp_replace(text,
                '[A-Za-z]', '', 'g'))) * 1.0
                / greatest(length(text), 1) * 10000) / 10000.0
             AS ascii_letter_frac
    FROM documents
    """,
)
def text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health gate (operators/text.py:encoding_quality): U+FFFD
    replacement-char count (the decoder's own error marker, counted by
    replace-length-difference — no regex dialect risk), C0 control chars,
    printable and letter fractions.  Map-only codegen column algebra,
    zero shuffles — the mojibake/binary-junk filter that runs before any
    language-level scoring on a web crawl."""
    return text.encoding_quality(_t(spark, sf_dir, "documents"))


@_register(
    "sample_weighted_priority",
    """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST(floor(ln((CAST(concat('0x',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                    + 1.0) / 1152921504606846978.0)
               / greatest(CAST(n_chars AS DOUBLE), 1.0) * 1000000)
             AS BIGINT) AS priority_fp
    FROM documents
    ORDER BY priority_fp DESC, doc_id
    LIMIT 50
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement by deterministic priority
    (operators/corpus.py:weighted_sample_priority — Efraimidis-Spirakis
    order sampling, u from the doc's md5, selection key the monotone
    ln(u)/w form floor-quantized at 1e-6): inclusion probability
    proportional to n_chars, top-k via TakeOrderedAndProject — map-only,
    no shuffle, the one-pass distributed weighted sampler.  The only
    transcendental (ln) is quantization-guarded; ties break on doc_id so
    the cut is total-ordered."""
    return corpus.weighted_sample_priority(_t(spark, sf_dir, "documents"))



@_register(
    "text_pmi_top_pairs",
    r"""
    WITH dt AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents)
    ),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM documents),
    cw AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY w),
    pairs AS (
      SELECT a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS c_ab
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w HAVING count(*) >= 5
    )
    SELECT p.wa, p.wb, p.c_ab,
           ca.c AS c_a, cb.c AS c_b,
           CAST(floor((p.c_ab * n.n_docs * 10000.0) / (ca.c * cb.c))
                AS BIGINT) AS pmi_fp
    FROM pairs p
      JOIN cw ca ON ca.w = p.wa
      JOIN cw cb ON cb.w = p.wb
      CROSS JOIN nd n
    ORDER BY pmi_fp DESC, p.wa, p.wb
    LIMIT 30
    """,
)
def text_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by log-free rational PMI
    (operators/text.py:pmi_top_pairs — same monotone-ranking trick as
    BM25's RSJ idf): document-level co-occurrence self-join riding ONE
    doc_id repartition (both join sides and the distinct-terms dedup are
    byte-identical subtrees over it), pair counts collapsed map-side to
    at most |vocab|^2 keys, min-support prune before the
    TakeOrderedAndProject cut.  The phrase-mining signal a tokenizer-
    merge or quality pipeline runs corpus-wide."""
    return text.pmi_top_pairs(_t(spark, sf_dir, "documents"))


@_register(
    "aggx_hll_sketch_union",
    """
    SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_groups,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_within_5pct
    FROM events
    """,
)
def aggx_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the 100 TB cardinality shape:
    per (event_type, day) HyperLogLog sketches (Spark 4 Datasketches
    ``hll_sketch_agg``), merged per event_type with ``hll_union_agg`` and
    estimated — re-aggregation WITHOUT re-touching the raw data, which is
    how a production pipeline serves distinct-users-per-X over any time
    range from daily sketch partitions.  The sketch binary is engine-
    internal, so the driver-checkable surface is the accuracy INVARIANT:
    every merged estimate must land within 5% of the exact distinct
    count (HLL lgK=12 gives ~1.6% typical relative error, and below ~2^11
    distinct the sketch is in exact sparse mode), pinned by the constant
    oracle (n_groups, n_groups).  A wrong merge, a lossy union, or a
    broken estimate turns the row red.

    Scale: sketches are a few KB per group — the per-day aggregate is
    map-side combined, the union shuffles |groups| sketch rows, never
    data.  The exact count here exists only to audit the estimate."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact")
    )
    j = merged.join(exact, "event_type")
    ok = (
        F.abs(F.col("est") - F.col("exact")) <= F.col("exact") * 0.05
    ).cast("long")
    return j.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum(ok).cast("long").alias("n_within_5pct"),
    )



@_register(
    "dq_length_drift_ks",
    """
    WITH lens AS (
      SELECT CAST(doc_id % 2 AS INTEGER) AS split, n_chars FROM documents
    ),
    per AS (
      SELECT split, n_chars, CAST(count(*) AS BIGINT) AS c
      FROM lens GROUP BY split, n_chars
    ),
    tot AS (SELECT split, CAST(sum(c) AS BIGINT) AS n FROM per GROUP BY split),
    grid AS (SELECT DISTINCT n_chars FROM per),
    cdf AS (
      SELECT g.n_chars,
             COALESCE(sum(CASE WHEN p.split = 0 THEN p.c END), 0) AS c0,
             COALESCE(sum(CASE WHEN p.split = 1 THEN p.c END), 0) AS c1
      FROM grid g LEFT JOIN per p ON p.n_chars <= g.n_chars
      GROUP BY g.n_chars
    )
    SELECT CAST(max(abs(CAST(floor(c0 * 10000.0 / t0.n) AS BIGINT)
                        - CAST(floor(c1 * 10000.0 / t1.n) AS BIGINT)))
                AS BIGINT) AS ks_fp
    FROM cdf, (SELECT n FROM tot WHERE split = 0) t0,
         (SELECT n FROM tot WHERE split = 1) t1
    """,
)
def dq_length_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the Kolmogorov-Smirnov statistic (max
    ECDF gap, fixed-point at 1e-4) between the length distributions of
    two corpus slices (doc_id parity stands in for old/new snapshot) —
    the data-quality alarm that catches "the new crawl's documents got
    systematically shorter" before it poisons a training mix.

    Exactness: each ECDF value is floor(c * 1e4 / n) on exact integer
    counts — both engines floor the identical IEEE quotient — and the
    max of integer differences is associative, so the statistic is
    bit-stable under any partitioning.

    Scale shape: lengths pre-aggregate to DISTINCT (split, n_chars)
    counts (map-side combined — the frame after this is dimension-sized:
    |distinct lengths| rows, NOT corpus-sized), the cumulative counts are
    one ordered window over that dimension frame (single-partition over
    thousands of rows at most — same justification as the watermark
    profile's bucket summary), and the final max is a 1-row reduce."""
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    per = (
        docs.select((F.col("doc_id") % 2).cast("int").alias("split"), "n_chars")
        .groupBy("split", "n_chars")
        .agg(F.count("*").alias("c"))
    )
    wide = per.groupBy("n_chars").agg(
        F.sum(F.when(F.col("split") == 0, F.col("c")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("split") == 1, F.col("c")).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    tot = wide.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    cdf = wide.select(
        "n_chars",
        F.sum("c0").over(w).alias("cc0"),
        F.sum("c1").over(w).alias("cc1"),
    )
    gap = F.abs(
        F.floor(F.col("cc0") * 10000.0 / F.col("n0")).cast("long")
        - F.floor(F.col("cc1") * 10000.0 / F.col("n1")).cast("long")
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .agg(F.max(gap).cast("long").alias("ks_fp"))
    )


@_register(
    "feat_target_encode_loo",
    """
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS tot
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source,
           CASE WHEN s.n > 1
                THEN CAST(floor((s.tot - d.n_chars) * 10000.0 / (s.n - 1))
                     AS BIGINT)
                ELSE CAST(-1 AS BIGINT) END AS loo_mean_fp
    FROM documents d JOIN s USING (source)
    """,
)
def feat_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the leakage-safe categorical
    feature every tabular ML pipeline derives (a row's own target must
    not leak into its encoding): per-source mean n_chars EXCLUDING the
    row itself, (sum - x) / (n - 1) in floor-1e-4 fixed point;
    singleton groups emit the -1 sentinel (no peers to encode from).

    Scale shape: the group statistics collapse to |sources| rows
    (map-side combined) and BROADCAST back over the fact scan — one data
    pass, no window, no self-join; the per-row arithmetic is one exact
    integer subtraction and one floored IEEE quotient."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("tot")
    )
    loo = F.when(
        F.col("n") > 1,
        F.floor(
            (F.col("tot") - F.col("n_chars")) * 10000.0 / (F.col("n") - 1)
        ).cast("long"),
    ).otherwise(F.lit(-1).cast("long"))
    return docs.join(F.broadcast(s), "source").select(
        "doc_id", "source", loo.alias("loo_mean_fp")
    )


@_register(
    "corpus_curriculum_order",
    """
    WITH scored AS (
      SELECT doc_id,
             CAST(abs(CAST(concat('0x', substr(md5('shard:' ||
                    CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)) % 8
                  AS INTEGER) AS shard,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                  AS BIGINT) AS n_alpha,
             n_chars
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (
             PARTITION BY shard
             ORDER BY n_chars ASC, n_alpha DESC, doc_id ASC
           ) AS BIGINT) AS curriculum_pos
    FROM scored
    """,
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: within each (deterministic md5-hash) training
    shard, rank documents easiest-first — shorter first, more-alphabetic
    first, doc_id tiebreak — the staged-difficulty read order a
    curriculum-learning data loader consumes.  The rank lives WITHIN the
    shard (never a global sort): one exchange on the shard key, which is
    exactly the write partitioning the shards need anyway (same shape as
    corpus_shard_assignments), then a per-shard window."""
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    shard = (
        F.abs(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
        )
        % 8
    ).cast("int")
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast(
        "long"
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("n_chars").asc(), F.col("n_alpha").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", shard.alias("shard"), n_alpha.alias("n_alpha"), "n_chars")
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("long").alias("curriculum_pos"),
        )
    )



def _hard_negative_oracle(n_planes: int = 4, dim: int = 64) -> str:
    """Literal-plane LSH buckets + within-bucket cross-label top-1: the
    hard-negative-mining twin (same plane family and left-to-right dot
    order as _lsh_bucket_oracle_sql; same floor-1e-4 cosine convention
    as dedup_embedding_cosine)."""
    from reddit_sse_stream_spark.operators.similarity import _lcg_planes

    rows = ",\n      ".join(
        f"({i}, [{', '.join(repr(x) for x in p)}])"
        for i, p in enumerate(_lcg_planes(n_planes, dim, seed=0))
    )
    return f"""
    WITH planes(i, plane) AS (VALUES
      {rows}),
    v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
    b AS (
      SELECT v.vec_id,
             sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v.v[j] * p.plane[j])) >= 0
                      THEN 1 << p.i ELSE 0 END) AS bucket
      FROM v, planes p GROUP BY v.vec_id),
    s AS (SELECT v.vec_id, v.label, v.v, b.bucket
          FROM v JOIN b USING (vec_id)),
    pairs AS (
      SELECT a.vec_id AS id_a, a.label AS label_a,
             c.vec_id AS id_b, c.label AS label_b,
             floor(list_cosine_similarity(a.v, c.v) * 10000) / 10000
               AS cos_sim
      FROM s a JOIN s c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
           AND a.label <> c.label)
    SELECT id_a, label_a, id_b, label_b, cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY id_a ORDER BY cos_sim DESC, id_b ASC) AS rk
      FROM pairs) WHERE rk = 1
    """


@_register("embed_hard_negatives", _hard_negative_oracle())
def embed_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining
    (operators/similarity.py:hard_negative_mining): per anchor, the
    most-similar vector with a DIFFERENT label, candidates pruned to the
    anchor's deterministic hyperplane-LSH bucket — the pair-construction
    pass for embedding-model fine-tuning.  The approximation itself is
    oracled: DuckDB rebuilds the same literal-plane buckets and verifies
    the within-bucket top-1 exactly.  Bucket join + Arrow cosine kernel +
    WindowGroupLimit top-1."""
    return similarity.hard_negative_mining(_t(spark, sf_dir, "embeddings"))


@_register(
    "text_chunk_dedup_rewrite",
    r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS words
      FROM documents
    ),
    n AS (SELECT doc_id, words,
                 CAST(floor(len(words) / 16.0) AS INTEGER) AS n_full
          FROM w),
    ch AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             array_to_string(words[i * 16 + 1 : i * 16 + 16], ' ') AS chunk
      FROM n, unnest(generate_series(0, n_full - 1)) AS t(i)
    ),
    own AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, pos) = 1 AS is_owner
      FROM ch
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN is_owner THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             COALESCE(string_agg(CASE WHEN is_owner THEN chunk END, ' '
                                 ORDER BY pos), '') AS text_dedup
      FROM own GROUP BY doc_id
    )
    SELECT n.doc_id,
           COALESCE(agg.n_chunks, 0) AS n_chunks,
           COALESCE(agg.n_kept, 0) AS n_kept,
           COALESCE(agg.text_dedup, '') AS text_dedup
    FROM n LEFT JOIN agg USING (doc_id)
    """,
)
def text_chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level dedup REWRITE (operators/text.py:chunk_dedup_rewrite,
    CCNet-style): every 16-word chunk keeps only its globally first
    occurrence (min (doc_id, pos) — the keep-first policy of exact
    dedup applied at sub-document granularity) and documents are
    re-assembled from their surviving chunks in original order — the
    pass that strips crawl-replicated boilerplate while keeping unique
    content.  Complements text_chunk_dup_rate (the feasibility REPORT);
    this is the write path.  One digest-keyed window for ownership, one
    doc-keyed sorted re-assembly."""
    return text.chunk_dedup_rewrite(_t(spark, sf_dir, "documents"))



def _bpe_ctes(rounds: int = 4) -> list[str]:
    """Shared unrolled-CTE rounds for the BPE twins: word vocab ->
    bracket-encoded symbol sequences -> per-round (pair census, argmax,
    replace() fuse).  v{t} carries the word through so the tokenize twin
    can map word -> final token count; the train twin simply ignores it."""
    ctes = [
        r"""w0 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents) t
      WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w)""",
        "v0 AS (SELECT w, '<' || array_to_string(string_split(w, ''), '><')"
        " || '>' AS seq, freq FROM w0)",
    ]
    for t in range(1, rounds + 1):
        prev = f"v{t - 1}"
        ctes += [
            f"""s{t} AS (
      SELECT string_split(regexp_replace(seq, '^<|>$', '', 'g'), '><') AS s,
             freq FROM {prev})""",
            f"""p{t} AS (
      SELECT s[i] AS a, s[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
      FROM (SELECT s, freq, unnest(generate_series(1, len(s) - 1)) AS i
            FROM s{t} WHERE len(s) >= 2) t
      GROUP BY s[i], s[i + 1])""",
            f"b{t} AS (SELECT a, b, cnt FROM p{t}"
            " ORDER BY cnt DESC, a, b LIMIT 1)",
            f"v{t} AS (SELECT p.w, replace(p.seq,"
            " '<' || b.a || '><' || b.b || '>',"
            f" '<' || b.a || b.b || '>') AS seq, p.freq"
            f" FROM {prev} p, b{t} b)",
        ]
    return ctes


def _bpe_train_oracle(rounds: int = 4) -> str:
    """Unrolled-CTE twin of :func:`text.bpe_train_merges`: the same pair
    census, the same (cnt DESC, a, b) argmax, the same left-to-right
    non-overlapping replace() fuse — one CTE block per merge round,
    entirely inside SQL (the Spark side's only driver traffic is the
    1-row argmax per round)."""
    ctes = _bpe_ctes(rounds)
    finals = " UNION ALL ".join(
        f"SELECT {t} AS round, a AS pair_left, b AS pair_right,"
        f" a || b AS merged, cnt FROM b{t}"
        for t in range(1, rounds + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(round AS INTEGER) AS round, pair_left, pair_right,"
        f" merged, cnt FROM ({finals}) ORDER BY round"
    )


@_register("bpe_train_merges", _bpe_train_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE merge training (operators/text.py:bpe_train_merges):
    4 rounds of count-pairs -> argmax -> corpus-wide fuse over the
    weighted distinct-word vocabulary — the real tokenizer-learning
    loop, fully verified against an unrolled-CTE twin (the angle-bracket
    symbol encoding makes each fuse a plain replace() with identical
    left-to-right non-overlap semantics in both engines).  Upgrades the
    one-round census (bpe_pair_merge_counts) to the actual training
    artifact: the merge table."""
    return text.bpe_train_merges(_t(spark, sf_dir, "documents"))



def _bpe_tokenize_oracle(rounds: int = 4) -> str:
    """Apply the learned merges (same unrolled rounds) and count final
    symbols per word, joined back over the document token stream."""
    ctes = _bpe_ctes(rounds)
    ctes += [
        f"""nt AS (
      SELECT w, CAST(len(string_split(
               regexp_replace(seq, '^<|>$', '', 'g'), '><')) AS BIGINT)
               AS n_tok
      FROM v{rounds})""",
        r"""docw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents) t
      WHERE regexp_matches(w, '^[a-z0-9]+$'))""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n.n_tok) AS BIGINT) AS n_bpe_tokens,
           floor(sum(length(d.w)) * 1.0 / sum(n.n_tok) * 10000) / 10000.0
             AS chars_per_token
    FROM docw d JOIN nt n USING (w) GROUP BY d.doc_id"""
    )


def _bpe_fertility_by_lang_oracle(rounds: int = 4) -> str:
    """Per-language rollup of the tokenize-accounting chain: the same
    learned merges and per-word token counts, aggregated per lang with
    an exact int64 floor-division fertility."""
    ctes = _bpe_ctes(rounds)
    ctes += [
        f"""nt AS (
      SELECT w, CAST(len(string_split(
               regexp_replace(seq, '^<|>$', '', 'g'), '><')) AS BIGINT)
               AS n_tok
      FROM v{rounds})""",
        r"""docw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents) t
      WHERE regexp_matches(w, '^[a-z0-9]+$'))""",
        """pd AS (
      SELECT d.doc_id, count(*) AS n_words, sum(n.n_tok) AS n_tok
      FROM docw d JOIN nt n USING (w) GROUP BY d.doc_id)""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
    SELECT doc.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pd.n_words) AS BIGINT) AS n_words,
           CAST(sum(pd.n_tok) AS BIGINT) AS n_bpe_tokens,
           CAST((sum(pd.n_tok) * 10000) // sum(pd.n_words) AS BIGINT)
             AS fertility_x1e4
    FROM pd JOIN documents doc USING (doc_id)
    GROUP BY doc.lang ORDER BY doc.lang"""
    )


@_register("text_tokenizer_fertility_by_lang", _bpe_fertility_by_lang_oracle())
def text_tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer-fertility equity audit
    (operators/text.py:bpe_fertility_by_lang): per-language BPE tokens
    per word (x1e4, exact int64 floor-division) under the corpus-trained
    merges — the fairness number multilingual-tokenizer evaluations
    report; a high-fertility language pays more sequence length per word.
    One lang-keyed aggregate over the oracled token-accounting chain."""
    return text.bpe_fertility_by_lang(_t(spark, sf_dir, "documents"))


@_register("bpe_tokenize_counts", _bpe_tokenize_oracle())
def bpe_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL subword token accounting (operators/text.py:bpe_token_counts):
    tokenize every document with the corpus-trained BPE merges (applied
    single-pass in rank order on the Zipf-collapsed vocabulary, joined
    back by word) and report per-doc word/token counts + chars-per-token
    fertility — the number a training-mix scheduler actually budgets
    with.  Fully verified: the oracle re-learns the identical merges and
    re-applies them in SQL."""
    return text.bpe_token_counts(_t(spark, sf_dir, "documents"))



def _pq_ctes(
    n_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    p: str = "",
    ex_cte: str | None = None,
) -> tuple[list[str], str, str]:
    """CTE list + (final-assignment, final-codebook) CTE names for the PQ
    oracle chain; ``p`` prefixes every CTE name so the chain can be
    composed with the IVF chain (which owns the bare ex/d/a names) in
    one WITH block.  ``ex_cte`` overrides the source CTE body (must
    produce (vec_id, sub, dd, xq)) — the residual IVF-PQ twin feeds the
    chain 1e6-quantized residuals instead of raw coordinates."""
    d_sub = dim // n_sub
    ctes = [
        f"{p}ex AS ({ex_cte})"
        if ex_cte is not None
        else f"""{p}ex AS (
      SELECT vec_id,
             CAST(ix.d // {d_sub} AS INTEGER) AS sub,
             CAST(ix.d % {d_sub} AS INTEGER) AS dd,
             CAST(floor(CAST(embedding[ix.d + 1] AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS xq
      FROM embeddings CROSS JOIN (SELECT unnest(range({dim})) AS d) ix)""",
        f"""{p}init AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1
                          AS INTEGER) AS code
      FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id
            LIMIT {k}))""",
        f"{p}c0 AS (SELECT i.code, e.sub, e.dd, e.xq"
        f" FROM {p}ex e JOIN {p}init i USING (vec_id))",
    ]
    for t in range(1, iters + 2):
        prev = f"{p}c{t - 1}"
        ctes += [
            f"""{p}d{t} AS (
      SELECT e.vec_id, e.sub, c.code,
             CAST(sum((e.xq - c.xq) * (e.xq - c.xq)) AS BIGINT) AS dist2
      FROM {p}ex e JOIN {prev} c ON c.sub = e.sub AND c.dd = e.dd
      GROUP BY e.vec_id, e.sub, c.code)""",
            f"""{p}a{t} AS (
      SELECT vec_id, sub, code, dist2 FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                     ORDER BY dist2, code) AS rk
        FROM {p}d{t}) WHERE rk = 1)""",
        ]
        if t <= iters:
            ctes += [
                f"""{p}s{t} AS (
      SELECT a.sub, a.code, e.dd,
             CAST(floor(CAST(sum(e.xq) AS DOUBLE) / count(*)) AS BIGINT)
               AS xq
      FROM {p}a{t} a JOIN {p}ex e ON e.vec_id = a.vec_id AND e.sub = a.sub
      GROUP BY a.sub, a.code, e.dd)""",
                f"""{p}c{t} AS (
      SELECT p.sub, p.code, p.dd, COALESCE(s.xq, p.xq) AS xq
      FROM {prev} p LEFT JOIN {p}s{t} s
        ON s.sub = p.sub AND s.code = p.code AND s.dd = p.dd)""",
            ]
    return ctes, f"{p}a{iters + 1}", f"{p}c{iters}"


def _pq_oracle(n_sub: int = 8, k: int = 16, iters: int = 2, dim: int = 64) -> str:
    """Unrolled-CTE twin of :func:`ml_lsh.pq_codes_fixedpoint`: identical
    quantize / per-subspace assign / floor-mean update rounds (one CTE
    block per round), codes pivoted per vector at the end.  Same
    exact-integer argument as the k-means oracle, with (sub, code) as
    the model key."""
    ctes, last, _cb = _pq_ctes(n_sub, k, iters, dim)
    codes = ",\n           ".join(
        f"CAST(max(CASE WHEN sub = {s} THEN code END) AS INTEGER) AS c{s}"
        for s in range(n_sub)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
    SELECT vec_id,
           {codes},
           CAST(sum(dist2) AS BIGINT) AS recon_fp
    FROM {last} GROUP BY vec_id"""
    )


@_register("embed_pq_codes", _pq_oracle())
def embed_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (operators/ml_lsh.py:pq_codes_fixedpoint
    — Jégou et al. 2011, the FAISS IVF-PQ building block): per-subspace
    exact-integer Lloyd codebooks learned for ALL 8 subspaces in one
    aggregate per round, every vector encoded as 8 one-byte codes + its
    integer reconstruction error — the compression that fits a billion-
    vector ANN index in RAM.  Codes and recon error are bit-verified
    against the unrolled-CTE twin."""
    from reddit_sse_stream_spark.operators.ml_lsh import pq_codes_fixedpoint

    return pq_codes_fixedpoint(_t(spark, sf_dir, "embeddings"))



def _pq_adc_oracle(n_sub: int = 8, k: int = 16, iters: int = 2,
                   dim: int = 64, k_out: int = 5) -> str:
    """PQ-ADC twin: reuse the codebook/code CTEs, build the query's
    per-subspace distance tables in SQL (query = vec_id 0's subvectors
    against the FINAL codebook), score every other vector by code
    lookup, take the ordered top-k."""
    d_sub = dim // n_sub
    base = _pq_oracle(n_sub, k, iters, dim)
    # strip the final SELECT from the codes oracle and keep its CTE chain
    head, _, _tail = base.rpartition("\n    SELECT vec_id,")
    last = f"a{iters + 1}"
    return (
        head
        + f""",
    qd AS (SELECT sub, dd, xq FROM ex WHERE vec_id = 0),
    tab AS (
      SELECT c.sub, c.code,
             CAST(sum((q.xq - c.xq) * (q.xq - c.xq)) AS BIGINT) AS d2
      FROM c{iters} c JOIN qd q ON q.sub = c.sub AND q.dd = c.dd
      GROUP BY c.sub, c.code)
    SELECT a.vec_id, CAST(sum(t.d2) AS BIGINT) AS adc_fp
    FROM {last} a JOIN tab t ON t.sub = a.sub AND t.code = a.code
    WHERE a.vec_id <> 0
    GROUP BY a.vec_id
    ORDER BY adc_fp ASC, a.vec_id LIMIT {k_out}"""
    )


@_register("knn_pq_adc_topk", _pq_adc_oracle())
def knn_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (operators/ml_lsh.py:pq_adc_topk):
    the vec_id=0 query scored against every OTHER vector using only its
    8 one-byte PQ codes and the 8x16-entry integer distance tables baked
    into the plan — the compressed-index ANN query path (scan 8
    bytes/vector, zero vector data).  Completes the ANN family: brute
    (exact), LSH bucket (pruned exact), IVF (cell-pruned exact), PQ-ADC
    (compressed approximate); codebooks, codes, tables, and the top-k
    cut are all bit-verified in SQL."""
    from reddit_sse_stream_spark.operators.ml_lsh import pq_adc_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return pq_adc_topk(emb, list(qv), k_out=5, exclude_id=0)


def _pq_recall_oracle(n_sub: int = 8, k: int = 16, iters: int = 2,
                      dim: int = 64, n_queries: int = 8,
                      k_out: int = 5) -> str:
    """PQ recall-audit twin: reuse the codebook/code CTE chain, score
    every (query, vector) pair BOTH ways — ADC table lookup and exact
    int64 squared L2 on the quantized coordinates — rank each per query,
    and count the top-``k_out`` overlap.  LEFT JOIN from the query list
    keeps zero-hit queries as explicit hits = 0 rows (the Spark side's
    sum-of-flags never drops a group)."""
    base = _pq_oracle(n_sub, k, iters, dim)
    head, _, _tail = base.rpartition("\n    SELECT vec_id,")
    last = f"a{iters + 1}"
    return (
        head
        + f""",
    qs AS (SELECT vec_id AS qid FROM embeddings
           ORDER BY vec_id LIMIT {n_queries}),
    qd AS (SELECT q.qid, e.sub, e.dd, e.xq
           FROM ex e JOIN qs q ON e.vec_id = q.qid),
    tab AS (
      SELECT q.qid, c.sub, c.code,
             CAST(sum((q.xq - c.xq) * (q.xq - c.xq)) AS BIGINT) AS d2
      FROM c{iters} c JOIN qd q ON q.sub = c.sub AND q.dd = c.dd
      GROUP BY q.qid, c.sub, c.code),
    adc AS (
      SELECT t.qid, a.vec_id, CAST(sum(t.d2) AS BIGINT) AS adc_fp
      FROM {last} a JOIN tab t ON t.sub = a.sub AND t.code = a.code
      WHERE a.vec_id <> t.qid GROUP BY t.qid, a.vec_id),
    exact AS (
      SELECT q.qid, e.vec_id,
             CAST(sum((e.xq - q.xq) * (e.xq - q.xq)) AS BIGINT) AS ex_fp
      FROM ex e JOIN qd q ON q.sub = e.sub AND q.dd = e.dd
      WHERE e.vec_id <> q.qid GROUP BY q.qid, e.vec_id),
    ra AS (SELECT qid, vec_id, row_number() OVER (
             PARTITION BY qid ORDER BY adc_fp, vec_id) AS rk FROM adc),
    re AS (SELECT qid, vec_id, row_number() OVER (
             PARTITION BY qid ORDER BY ex_fp, vec_id) AS rk FROM exact),
    hit AS (
      SELECT ra.qid, CAST(count(*) AS BIGINT) AS hits
      FROM ra JOIN re ON re.qid = ra.qid AND re.vec_id = ra.vec_id
      WHERE ra.rk <= {k_out} AND re.rk <= {k_out}
      GROUP BY ra.qid)
    SELECT CAST(q.qid AS BIGINT) AS qid,
           COALESCE(h.hits, 0) AS hits,
           round(COALESCE(h.hits, 0) * 1.0 / {k_out}, 4) AS recall_at_k
    FROM qs q LEFT JOIN hit h ON h.qid = q.qid"""
    )


@_register("knn_pq_recall_audit", _pq_recall_oracle())
def knn_pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 self-audit of the PQ-ADC index
    (operators/ml_lsh.py:pq_recall_audit): for the 8 smallest-id query
    vectors, the ADC top-5 (scored from 8-byte codes) is compared to the
    exact top-5 over the full quantized vectors and the overlap reported
    per query — what 32x compression costs in retrieval quality,
    measured, the PQ counterpart of dedup_lsh_recall_audit.  One scan
    computes all 8 ADC+exact score pairs (tables and query vectors are
    plan literals), both rank cuts share a single qid-keyed exchange;
    codebooks, codes, tables, ground truth, and both cuts re-derived in
    SQL."""
    from reddit_sse_stream_spark.operators.ml_lsh import pq_recall_audit

    return pq_recall_audit(_t(spark, sf_dir, "embeddings"))


def _ivfpq_oracle(n_cells: int = 8, ivf_iters: int = 2, n_sub: int = 8,
                  k: int = 16, pq_iters: int = 2, dim: int = 64,
                  qid: int = 0, n_probe: int = 2, k_out: int = 5) -> str:
    """IVF-PQ twin: the IVF fixed-point Lloyd chain and the PQ chain
    (prefixed ``p`` — both families use ex/d{t}/a{t} internally) in ONE
    WITH block; probe cells fall straight out of the IVF chain's own
    final distance CTE (query row of d{ivf_iters}), ADC tables out of
    the PQ chain's final codebook, and the candidate set is the
    semi-join of codes with probed cells."""
    ivf_ctes, ivf_final = _ivf_fixedpoint_ctes(n_cells, ivf_iters, dim)
    pq_ctes_l, pq_last, pq_cb = _pq_ctes(n_sub, k, pq_iters, dim, p="p")
    return (
        "WITH " + ",\n".join(ivf_ctes + pq_ctes_l)
        + f""",
    probe AS (SELECT cell FROM d{ivf_iters} WHERE vec_id = {qid}
              ORDER BY dist, cell LIMIT {n_probe}),
    qd AS (SELECT sub, dd, xq FROM pex WHERE vec_id = {qid}),
    tab AS (
      SELECT c.sub, c.code,
             CAST(sum((q.xq - c.xq) * (q.xq - c.xq)) AS BIGINT) AS d2
      FROM {pq_cb} c JOIN qd q ON q.sub = c.sub AND q.dd = c.dd
      GROUP BY c.sub, c.code)
    SELECT a.vec_id, CAST(iv.cell AS INTEGER) AS cell,
           CAST(sum(t.d2) AS BIGINT) AS adc_fp
    FROM {pq_last} a
      JOIN {ivf_final} iv ON iv.vec_id = a.vec_id
      JOIN probe pr ON pr.cell = iv.cell
      JOIN tab t ON t.sub = a.sub AND t.code = a.code
    WHERE a.vec_id <> {qid}
    GROUP BY a.vec_id, iv.cell
    ORDER BY adc_fp ASC, a.vec_id LIMIT {k_out}"""
    )


@_register("knn_ivfpq_topk", _ivfpq_oracle())
def knn_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite top-k (operators/ml_lsh.py:ivfpq_topk) — the
    production ANN index shape (FAISS ``IVF8,PQ8`` minus residual
    encoding, deviation documented on the operator): the fixed-point IVF
    coarse quantizer prunes the corpus to the query's 2 nearest cells,
    then PQ-ADC scores only those cells' 8-byte codes — at 100 TB the
    cell is the partition column, so the probe prunes the SCAN and ADC
    reads 8 bytes/vector of what's left.  Pure composition of the two
    oracled quantizers; probe selection, tables, candidate set, and the
    (adc_fp, id) cut are all value-verified in one composed SQL twin."""
    from reddit_sse_stream_spark.operators.ml_lsh import ivfpq_topk

    return ivfpq_topk(_t(spark, sf_dir, "embeddings"))


_SUFFIX_RANKS_ORACLE = r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id, i - 1 AS pos, words[i:] AS suf
      FROM w, unnest(generate_series(1, len(words))) AS u(i)
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           CAST(dense_rank() OVER (ORDER BY suf) AS BIGINT) AS suffix_rank
    FROM s
    """


@_register("text_suffix_ranks", _SUFFIX_RANKS_ORACLE)
def text_suffix_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide suffix-array ranks by prefix doubling
    (operators/text.py:suffix_ranks — Manber & Myers 1990, the index
    behind Lee-et-al substring dedup): every word-level suffix's global
    lexicographic dense rank, built in O(log L) relational rounds where
    no comparison ever touches more than two ints — while the DuckDB twin
    sorts the actual suffix LISTS directly (ORDER BY words[pos:]), so the
    doubling recurrence is verified value-for-value against the
    definitionally-correct order on every row.  Equal ranks mark
    duplicated tails, the raw material of suffix-array dedup;
    text_duplicate_spans is the windowed-gram approximation of the same
    signal."""
    from reddit_sse_stream_spark.operators.text import suffix_ranks

    return suffix_ranks(_t(spark, sf_dir, "documents"))


@_register(
    "decontam_embedding_cosine",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e AS (SELECT vec_id AS eval_id, v FROM v WHERE vec_id % 20 = 0),
    c AS (SELECT vec_id, v FROM v WHERE vec_id % 20 <> 0),
    s AS (
      SELECT c.vec_id, e.eval_id,
             floor(list_cosine_similarity(c.v, e.v) * 10000) / 10000 AS cs
      FROM c CROSS JOIN e
    ),
    m AS (SELECT vec_id, max(cs) AS cos_sim FROM s GROUP BY vec_id)
    SELECT s.vec_id, CAST(min(s.eval_id) AS BIGINT) AS eval_id, m.cos_sim
    FROM s JOIN m ON s.vec_id = m.vec_id AND s.cs = m.cos_sim
    WHERE m.cos_sim > 0.4
    GROUP BY s.vec_id, m.cos_sim
    """,
)
def decontam_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (operators/similarity.py:decontam_embedding_cosine): flag corpus
    vectors whose max cosine to any eval-set vector (vec_id % 20 = 0
    plays the benchmark) clears 0.4 — the paraphrased-leakage class the
    n-gram decontam family can't see.  The eval side BROADCASTS (eval
    sets are small by nature) as a normalized numpy matrix inside one
    zero-shuffle Arrow scan of the corpus: per batch, a single GEMM
    scores against every eval vector — at 100 TB a pure map pass, no
    join, no pair frame.  The DuckDB twin is the definitional cross
    product + per-corpus-row max with a lowest-eval-id tiebreak."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.decontam_embedding_cosine(
        emb, F.col("vec_id") % 20 == 0, threshold=0.4
    )


@_register(
    "text_mattr_diversity",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> len(x) > 0) AS ws
      FROM documents WHERE text IS NOT NULL
    ),
    m AS (
      SELECT doc_id, len(ws) AS n,
             greatest(len(ws) - 25 + 1, 0) AS n_windows,
             CASE WHEN len(ws) >= 25 THEN
               list_sum(list_transform(generate_series(0, len(ws) - 25),
                        i -> len(list_distinct(ws[i + 1:i + 25]))))
             ELSE NULL END AS sum_distinct,
             len(list_distinct(ws)) AS n_types
      FROM w
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_words,
           CAST(n_windows AS BIGINT) AS n_windows,
           CASE WHEN n_windows > 0
                THEN floor(sum_distinct * 10000.0 / (n_windows * 25)) / 10000.0
                ELSE floor(n_types * 10000.0 / greatest(n, 1)) / 10000.0
           END AS mattr
    FROM m
    """,
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR lexical diversity (operators/text.py:mattr_lexical_diversity
    — Covington & McFall 2010): the length-robust type-token ratio, a
    boilerplate/template gate plain TTR can't be (TTR decays with doc
    length, so thresholding it length-filters).  Exact integer windowed
    distinct counts, floor-1e-4 mean; one map-only projection, zero
    shuffles.  DuckDB recomputes every window's distinct count via a
    correlated generate_series — definitionally the same sum."""
    return text.mattr_lexical_diversity(_t(spark, sf_dir, "documents"))


@_register(
    "text_vocab_growth",
    r"""
    WITH mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS mx FROM documents),
    w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         t -> len(t) > 0) AS ws
      FROM documents),
    wf AS (
      SELECT u.w AS w, CAST(min(u.doc_id) AS BIGINT) AS fd
      FROM (SELECT doc_id, unnest(ws) AS w FROM w) u GROUP BY u.w),
    ck AS (SELECT unnest([10, 25, 50, 100]) AS pct),
    thr AS (
      SELECT pct, CAST(floor(mx * pct / 100.0) AS BIGINT) AS threshold_id
      FROM ck, mx)
    SELECT CAST(t.pct AS INT) AS pct,
           t.threshold_id,
           CAST((SELECT count(*) FROM wf WHERE fd <= t.threshold_id)
                AS BIGINT) AS vocab,
           CAST((SELECT coalesce(sum(len(ws)), 0) FROM w
                 WHERE doc_id <= t.threshold_id) AS BIGINT) AS tokens
    FROM thr t
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve (operators/text.py:vocab_growth
    — Heaps 1978): distinct word types and total tokens at 10/25/50/100%
    id-prefixes of the corpus, the measurement behind tokenizer vocab
    sizing (where |V(N)| ~ K*N^beta flattens) and crawl-dedup health (a
    curve flattening early means arriving data is mostly repeats).
    All-integer; thresholds data-derived in-plan (broadcast 1-row max).
    Scale shape: ONE corpus exchange (word -> min first-doc, map-side
    combined); all checkpoints are conditional counts over that frame in
    a single 1-row aggregate, never one pass per checkpoint."""
    return text.vocab_growth(_t(spark, sf_dir, "documents"))


@_register(
    "agg_two_phase_ntile_twin",
    """
    WITH b AS (
      SELECT o_totalprice,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM b GROUP BY bin
    """,
)
def agg_two_phase_ntile_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-phase global ntile (operators/corpus.py:global_ntile) —
    range-partition, local row_number, per-partition count offsets, the
    standard base/remainder bucket split on the reconstructed global
    position — value-matched against DuckDB's definitional window ntile
    on the orders table.  This is the executable form of the swap the
    equi-depth rows (fn_histogram_equidepth, pack_length_buckets, funnel
    quartiles) document in place of their one-task exact-sort windows;
    tests additionally pin it equal to Spark's own ntile on degenerate
    sizes (T < n, T % n = 0)."""
    orders = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    b = corpus.global_ntile(orders, 8, "o_totalprice", "o_orderkey")
    return b.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@_register(
    "corpus_two_phase_rank_twin",
    """
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(dense_rank() OVER (ORDER BY n_chars) AS BIGINT) AS rank
    FROM documents
    """,
)
def corpus_two_phase_rank_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-phase global dense rank (operators/corpus.py:
    global_dense_rank) — range-partition so equal keys never split,
    local dense_rank, per-partition offsets — value-matched against the
    definitional single-task dense_rank in DuckDB.  This is the 100 TB
    swap several operators document for their single-partition ranking
    windows (suffix_ranks' seed/re-rank, quantile gates), proven as a
    real code path rather than a docstring promise: correctness is
    independent of where the range sampler draws its boundaries, and
    this row goes red if that ever stops being true."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return corpus.global_dense_rank(docs, "n_chars").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), "rank"
    )


_LONGEST_REPEAT_ORACLE = r"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id, i - 1 AS pos, words[i:] AS suf
      FROM w, unnest(generate_series(1, len(words))) AS u(i)
    ),
    o AS (
      SELECT doc_id, pos, suf,
             lead(doc_id) OVER (ORDER BY suf, doc_id, pos) AS doc_b,
             lead(pos)    OVER (ORDER BY suf, doc_id, pos) AS pos_b,
             lead(suf)    OVER (ORDER BY suf, doc_id, pos) AS suf_b
      FROM s
    ),
    p AS (
      SELECT doc_id AS doc_a, pos AS pos_a, doc_b, pos_b,
             coalesce(
               nullif(list_position(
                 list_transform(list_zip(suf, suf_b),
                                t -> t[1] IS DISTINCT FROM t[2]),
                 true), 0) - 1,
               least(len(suf), len(suf_b))) AS lcp_words
      FROM o WHERE doc_b IS NOT NULL
    )
    SELECT doc_a, CAST(pos_a AS BIGINT) AS pos_a,
           doc_b, CAST(pos_b AS BIGINT) AS pos_b,
           CAST(lcp_words AS BIGINT) AS lcp_words
    FROM p WHERE lcp_words > 0
    ORDER BY lcp_words DESC, doc_a, pos_a, doc_b, pos_b LIMIT 5
    """


@_register("text_longest_repeat", _LONGEST_REPEAT_ORACLE)
def text_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact longest repeated word-spans in the corpus
    (operators/text.py:longest_repeat): the suffix array put to its
    classic use — the longest repeat is always the LCP of two
    rank-ADJACENT suffixes, so one pass over the suffix order finds it
    exactly, no pair join and no gram approximation.  Spark computes LCP
    as an O(L) still-equal fold; the DuckDB twin takes the first-mismatch
    position of the zipped suffix lists over lead() pairs of the
    directly-sorted suffixes — two independent formulations,
    value-matched."""
    from reddit_sse_stream_spark.operators.text import longest_repeat

    return longest_repeat(_t(spark, sf_dir, "documents"))


def _ivfpq_residual_oracle(n_cells: int = 8, ivf_iters: int = 2, n_sub: int = 8,
                           k: int = 16, pq_iters: int = 2, dim: int = 64,
                           qid: int = 0, n_probe: int = 2, k_out: int = 5) -> str:
    """Residual IVF-PQ twin: the IVF chain's unit frame (ex), final
    assignment (a{ivf_iters}) and final centroids (cen{ivf_iters}) feed a
    RESIDUAL source CTE into the PQ chain (pex override: xq =
    floor((u - c) * 1e6 + 0.5)), and the query side builds one ADC table
    PER PROBED CELL from the query's per-cell residual — the two extra
    moving parts the residual recipe adds over _ivfpq_oracle, both
    re-derived here value-for-value."""
    d_sub = dim // n_sub
    ivf_ctes, ivf_final = _ivf_fixedpoint_ctes(n_cells, ivf_iters, dim)
    resid_ex = f"""
      SELECT e.vec_id,
             CAST(e.d // {d_sub} AS INTEGER) AS sub,
             CAST(e.d % {d_sub} AS INTEGER) AS dd,
             CAST(floor((e.u - c.c) * 1000000 + 0.5) AS BIGINT) AS xq
      FROM ex e
        JOIN {ivf_final} a USING (vec_id)
        JOIN cen{ivf_iters} c ON c.cell = a.cell AND c.d = e.d"""
    pq_ctes_l, pq_last, pq_cb = _pq_ctes(
        n_sub, k, pq_iters, dim, p="p", ex_cte=resid_ex
    )
    return (
        "WITH " + ",\n".join(ivf_ctes + pq_ctes_l)
        + f""",
    probe AS (SELECT cell FROM d{ivf_iters} WHERE vec_id = {qid}
              ORDER BY dist, cell LIMIT {n_probe}),
    qd AS (
      SELECT pr.cell,
             CAST(e.d // {d_sub} AS INTEGER) AS sub,
             CAST(e.d % {d_sub} AS INTEGER) AS dd,
             CAST(floor((e.u - c.c) * 1000000 + 0.5) AS BIGINT) AS xq
      FROM ex e
        CROSS JOIN probe pr
        JOIN cen{ivf_iters} c ON c.cell = pr.cell AND c.d = e.d
      WHERE e.vec_id = {qid}),
    tab AS (
      SELECT q.cell, c.sub, c.code,
             CAST(sum((q.xq - c.xq) * (q.xq - c.xq)) AS BIGINT) AS d2
      FROM {pq_cb} c JOIN qd q ON q.sub = c.sub AND q.dd = c.dd
      GROUP BY q.cell, c.sub, c.code)
    SELECT a.vec_id, CAST(iv.cell AS INTEGER) AS cell,
           CAST(sum(t.d2) AS BIGINT) AS adc_fp
    FROM {pq_last} a
      JOIN {ivf_final} iv ON iv.vec_id = a.vec_id
      JOIN tab t ON t.cell = iv.cell AND t.sub = a.sub AND t.code = a.code
    WHERE a.vec_id <> {qid}
    GROUP BY a.vec_id, iv.cell
    ORDER BY adc_fp ASC, a.vec_id LIMIT {k_out}"""
    )


@_register("knn_ivfpq_residual_topk", _ivfpq_residual_oracle())
def knn_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoding IVF-PQ top-k
    (operators/ml_lsh.py:ivfpq_residual_topk) — the full FAISS
    ``IVF8,PQ8`` recipe, closing knn_ivfpq_topk's documented deviation:
    PQ quantizes each vector's residual to its coarse centroid (codebook
    capacity spent on local structure) and the query pays one ADC table
    per probed cell, built from its per-cell residual.  Coarse
    assignment, residual projection, residual codebook training, per-cell
    tables, and the (adc_fp, id) cut are all re-derived in one composed
    SQL twin — the residual chain reuses the IVF oracle's unit frame and
    centroids as the PQ chain's source."""
    from reddit_sse_stream_spark.operators.ml_lsh import ivfpq_residual_topk

    return ivfpq_residual_topk(_t(spark, sf_dir, "embeddings"))


_CMS_MERGE_ORACLE = """
    WITH e AS (SELECT event_id % 2 AS half, CAST(user_id AS VARCHAR) AS key
               FROM events),
    c AS (
      SELECT half, j,
             CAST(concat('0x', substr(md5(concat(j, ':', key)), 1, 15))
                  AS BIGINT) % 64 AS cell
      FROM e, unnest(generate_series(0, 3)) AS t(j)
    ),
    fs AS (SELECT j, cell, count(*) AS cnt FROM c GROUP BY 1, 2),
    h0 AS (SELECT j, cell, count(*) AS c0 FROM c WHERE half = 0 GROUP BY 1, 2),
    h1 AS (SELECT j, cell, count(*) AS c1 FROM c WHERE half = 1 GROUP BY 1, 2),
    m AS (
      SELECT COALESCE(h0.j, h1.j) AS j, COALESCE(h0.cell, h1.cell) AS cell,
             COALESCE(c0, 0) + COALESCE(c1, 0) AS cm
      FROM h0 FULL JOIN h1 ON h0.j = h1.j AND h0.cell = h1.cell
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(COALESCE(sum(CASE WHEN COALESCE(cnt, -1) <> COALESCE(cm, -2)
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_mismatch
    FROM fs FULL JOIN m USING (j, cell)
    """


@_register(
    "agg_moments_merge_invariant",
    """
    WITH b AS (
      SELECT event_type, event_id % 2 AS shard,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
      FROM events),
    s AS (
      SELECT event_type, shard, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s1,
             CAST(sum(y * y) AS BIGINT) AS s2
      FROM b GROUP BY 1, 2),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_shards,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(s1) AS BIGINT) AS s1,
             CAST(sum(s2) AS BIGINT) AS s2
      FROM s GROUP BY 1),
    d AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s1,
             CAST(sum(y * y) AS BIGINT) AS s2
      FROM b GROUP BY 1)
    SELECT m.event_type, m.n_shards, m.n, m.s1, m.s2,
           CAST(m.n * m.s2 - m.s1 * m.s1 AS BIGINT) AS var_num,
           CAST(m.n = d.n AND m.s1 = d.s1 AND m.s2 = d.s2 AS INTEGER)
             AS moments_match
    FROM m JOIN d USING (event_type) ORDER BY m.event_type
    """,
)
def agg_moments_merge_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof for the INTEGER-moment statistics path — the
    invariant-row sibling of ``agg_countmin_merge_invariant`` and
    ``dedup_sketch_merge_invariant`` for plain (n, sum, sum-of-squares):
    compute the fixed-point moments per hash shard, fold the shard rows,
    and pin bit-equality against the whole-frame computation.  This is
    the claim partial aggregation rests on at 100 TB, and the reason the
    exact-stats rows (``aggx_regression_exact``, the fixed-point means)
    carry integer accumulators: double moments REASSOCIATE across
    partitions (Spark's ``stddev``/``regr_*`` may differ run to run in
    the last ulps as partition counts change), while int64 moments merge
    by + exactly, any split, any order.  ``var_num = n*s2 - s1^2`` is
    emitted in the merged domain so the downstream variance is visibly a
    pure function of the merged moments.

    Headroom: y in 1e2 fixed point keeps sum(y^2) < 2^63 through ~3e9
    rows per event type at this value range; wider corpora shift to the
    DECIMAL(38) accumulators the regression row already uses.

    Plan shape: one (event_type, shard) partial aggregate, a 2-row-per-
    type fold, and the event_type-keyed direct aggregate — both sides
    map-side combine; nothing but the two keyed exchanges."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        (F.col("event_id") % 2).alias("shard"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("y"),
    )
    s = b.groupBy("event_type", "shard").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"),
    )
    m = s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_shards"),
        F.sum("n").cast("long").alias("n"),
        F.sum("s1").cast("long").alias("s1"),
        F.sum("s2").cast("long").alias("s2"),
    )
    d = b.groupBy("event_type").agg(
        F.count("*").cast("long").alias("dn"),
        F.sum("y").cast("long").alias("ds1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ds2"),
    )
    return (
        m.join(d, "event_type")
        .select(
            "event_type",
            "n_shards",
            "n",
            "s1",
            "s2",
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            .cast("long")
            .alias("var_num"),
            (
                (F.col("n") == F.col("dn"))
                & (F.col("s1") == F.col("ds1"))
                & (F.col("s2") == F.col("ds2"))
            )
            .cast("int")
            .alias("moments_match"),
        )
        .orderBy("event_type")
    )


@_register("agg_countmin_merge_invariant", _CMS_MERGE_ORACLE)
def agg_countmin_merge_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof row for the Count-Min grid
    (operators/sketches.py:countmin_merge_invariant): half-stream grids
    merged by cell-wise addition must equal the full-stream grid
    (n_mismatch = 0) — min for MinHash, + for CMS; every sketch proves
    its own fold.  Three constant-size grid aggregates over one scan."""
    from reddit_sse_stream_spark.operators.sketches import (
        countmin_merge_invariant,
    )

    return countmin_merge_invariant(_t(spark, sf_dir, "events"))


def _ewma_oracle(depth: int = 16) -> str:
    """DuckDB twin of timeseries.ewma_features: the same ``depth`` lag
    terms with power-of-two weights, generated explicitly."""
    terms = " + ".join(
        f"CASE WHEN lag(vfp, {i}) OVER w IS NOT NULL THEN "
        f"lag(vfp, {i}) OVER w * {1 << (depth - 1 - i)} ELSE 0 END"
        if i
        else f"CASE WHEN vfp IS NOT NULL THEN vfp * {1 << (depth - 1)} ELSE 0 END"
        for i in range(depth)
    )
    wterms = " + ".join(
        f"CASE WHEN lag(vfp, {i}) OVER w IS NOT NULL THEN "
        f"{1 << (depth - 1 - i)} ELSE 0 END"
        if i
        else f"CASE WHEN vfp IS NOT NULL THEN {1 << (depth - 1)} ELSE 0 END"
        for i in range(depth)
    )
    return f"""
    WITH e AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vfp
      FROM events),
    s AS (
      SELECT event_id, user_id,
             {terms} AS num,
             {wterms} AS wsum
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id))
    SELECT event_id, user_id,
           CAST(num AS BIGINT) AS ewma_num_fp,
           CAST(wsum AS BIGINT) AS weight_sum,
           CAST(CASE WHEN wsum > 0 THEN
                  (num * 10000 - ((num * 10000 % wsum) + wsum) % wsum)
                    // wsum
                ELSE 0 END AS BIGINT) AS ewma_x1e4
    FROM s
    """


@_register(
    "ts_seasonal_decompose",
    """
    WITH hc AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    tr AS (
      SELECT h, c,
             CAST(sum(c) OVER w AS BIGINT) AS wsum,
             CAST(count(*) OVER w AS BIGINT) AS wn,
             CAST(extract(hour FROM h) AS BIGINT) AS hod
      FROM hc
      WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    dt AS (
      SELECT hod, c * 10000 - (wsum * 10000 // 25) AS det
      FROM tr WHERE wn = 25),
    se AS (
      SELECT hod, CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(det) // count(*) AS BIGINT) AS seasonal_x1e4,
             CAST(sum(det) AS BIGINT) AS det_sum
      FROM dt GROUP BY hod)
    SELECT dt.hod, any_value(se.n_hours) AS n_hours,
           any_value(se.seasonal_x1e4) AS seasonal_x1e4,
           CAST(sum(abs(dt.det - se.seasonal_x1e4)) // count(*) AS BIGINT)
             AS mean_abs_remainder_x1e4
    FROM dt JOIN se USING (hod)
    GROUP BY dt.hod ORDER BY dt.hod
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (the STL shape, moving-average
    flavor [Cleveland 1990]) over the hourly event-count series: trend =
    centered 25-hour moving average (full windows only), seasonal = the
    hour-of-day mean of the detrended series, remainder = what's left —
    reported as the 24-row seasonal profile with each slot's mean
    absolute remainder (the "how much is NOT calendar rhythm" column an
    anomaly pipeline baselines against before alerting; the registered
    ``anomaly_zscore_hourly`` row alerts on exactly the kind of residual
    this decomposition isolates).  All arithmetic is exact int64 in the
    1e4 fixed-point domain; the mean divisions are int64 // int64,
    where DuckDB TRUNCATES toward zero exactly like Spark's ``div`` (it
    floors only with a DOUBLE operand — the calibration row's case), so
    the two engines agree on negative detrended sums with no correction
    term.

    Plan shape: one hour-keyed exchange builds the hourly series; the
    trend window runs UNPARTITIONED but over the HOURLY AGGREGATE — its
    input is calendar-sized (24 rows/day: ten years of 100 TB is still
    ~88k rows), the documented dimension-sized window class
    (``stream_lateness_watermark_profile``'s defense), never row scale;
    the seasonal/remainder stages are 24-row aggregates."""
    ev = _t(spark, sf_dir, "events")
    hc = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.orderBy("h").rowsBetween(-12, 12)
    tr = hc.select(
        "h",
        "c",
        F.sum("c").over(w).cast("long").alias("wsum"),
        F.count("*").over(w).cast("long").alias("wn"),
        F.hour("h").cast("long").alias("hod"),
    )
    dt = tr.filter(F.col("wn") == 25).select(
        "hod",
        (
            F.col("c") * 10000 - F.expr("wsum * 10000 div 25")
        ).alias("det"),
    )
    # both operands are int64, where DuckDB's ``//`` TRUNCATES toward
    # zero exactly like Spark's ``div`` (DuckDB floors only when an
    # operand is DOUBLE — the calibration row's case), so plain div is
    # the matching semantics here even on negative detrended sums
    se = dt.groupBy("hod").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("det").cast("long").alias("det_sum"),
    ).select(
        "hod",
        "n_hours",
        F.expr("det_sum div n_hours").cast("long").alias("seasonal_x1e4"),
    )
    joined = dt.join(F.broadcast(se), "hod").select(
        "hod",
        "n_hours",
        "seasonal_x1e4",
        F.abs(F.col("det") - F.col("seasonal_x1e4")).alias("ad"),
    )
    return (
        joined.groupBy("hod")
        .agg(
            F.first("n_hours").alias("n_hours"),
            F.first("seasonal_x1e4").alias("seasonal_x1e4"),
            F.sum("ad").cast("long").alias("ad_sum"),
            F.count("*").cast("long").alias("nn"),
        )
        .select(
            "hod",
            "n_hours",
            "seasonal_x1e4",
            F.expr("ad_sum div nn").cast("long").alias(
                "mean_abs_remainder_x1e4"
            ),
        )
        .orderBy("hod")
    )


@_register(
    "aggx_theil_sen_trend",
    """
    WITH hc AS (
      SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT a.event_type,
             (b.c - a.c) * 10000 // (b.h - a.h) AS slope_fp
      FROM hc a JOIN hc b
        ON a.event_type = b.event_type AND a.h < b.h),
    sh AS (SELECT event_type, slope_fp, CAST(count(*) AS BIGINT) AS cnt
           FROM p GROUP BY 1, 2),
    sh2 AS (
      SELECT event_type, slope_fp,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY slope_fp)
               AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM sh),
    med AS (
      SELECT event_type, CAST(min(slope_fp) AS BIGINT) AS slope_x1e4,
             CAST(max(n) AS BIGINT) AS n_pairs
      FROM sh2 WHERE 2 * cum >= n GROUP BY event_type),
    nh AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
           FROM hc GROUP BY 1)
    SELECT m.event_type, nh.n_hours, m.n_pairs, m.slope_x1e4
    FROM med m JOIN nh USING (event_type)
    ORDER BY m.event_type
    """,
)
def aggx_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type — the breakdown-resistant
    sibling of ``aggx_regression_exact`` [Theil 1950; Sen 1968]: the
    slope is the MEDIAN of all pairwise (count_j - count_i)/(hour_j -
    hour_i) slopes over the hourly series, so up to ~29% of hours can be
    arbitrarily corrupted (an outage, a bot flood) without moving the
    estimate — where least squares chases every outlier.  Slopes live in
    the 1e4 fixed-point domain with matching truncating integer division
    on both engines, and the median comes from the count-of-counts
    histogram walk (the MAD-gate pattern) — exact int64 end to end, no
    float summation anywhere.

    Scale shape: the pairwise join is over the HOURLY AGGREGATE — the
    calendar-bounded frame (C(n,2) of ~88k hours for ten years — large
    but dimension^2-bounded, never data-sized; sample pair anchors past
    that, as the Siegel variant does); the slope histogram and median
    walk are value-domain sized.  The raw events appear only in the one
    (event_type, hour) exchange.

    De-skew (VERDICT r13 next #2): keyed on event_type alone the pair
    join runs on #event_types (~3) tasks no matter the cluster — so the
    b side carries ``g = h mod S`` and the a side EXPLODES over all S
    salts, making the equi-key (event_type, g).  Every (a, b) pair still
    matches exactly once (a's g-th replica meets exactly the b rows with
    h ≡ g), so the result — and the value oracle — is bit-identical to
    the unsalted join while parallelism rises to S × #event_types tasks
    (96 at S=32).  Replication cost is |hours| × S rows of the
    calendar-sized frame (~8.4M at ten years), far below one event-scan
    partition."""
    _SALT = 32
    ev = _t(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    ).agg(F.count("*").cast("long").alias("c"))
    a = hc.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1))).alias("g"),
    ).alias("a")
    b = hc.withColumn("g", F.pmod(F.col("h"), F.lit(_SALT))).alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.g") == F.col("b.g"))
        & (F.col("a.h") < F.col("b.h")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.expr("(b.c - a.c) * 10000 div (b.h - a.h)").alias("slope_fp"),
    )
    sh = p.groupBy("event_type", "slope_fp").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("slope_fp")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    sh2 = sh.select(
        "event_type",
        "slope_fp",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    med = (
        sh2.filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("event_type")
        .agg(
            F.min("slope_fp").cast("long").alias("slope_x1e4"),
            F.max("n").cast("long").alias("n_pairs"),
        )
    )
    nh = hc.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours")
    )
    return (
        med.join(nh, "event_type")
        .select("event_type", "n_hours", "n_pairs", "slope_x1e4")
        .orderBy("event_type")
    )


@_register(
    "aggx_siegel_trend_sampled",
    """
    WITH hc AS (
      SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    an AS (
      SELECT event_type, h AS ah, c AS ac FROM (
        SELECT event_type, h, c,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY CAST(concat('0x', substr(md5(concat('sg:',
                   CAST(h AS STRING))), 1, 15)) AS BIGINT), h) AS rk
        FROM hc) WHERE rk <= 16),
    p AS (
      SELECT a.event_type, a.ah,
             (b.c - a.ac) * 10000 // (b.h - a.ah) AS slope_fp
      FROM an a JOIN hc b
        ON a.event_type = b.event_type AND b.h <> a.ah),
    sh AS (SELECT event_type, ah, slope_fp,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM p GROUP BY 1, 2, 3),
    sh2 AS (
      SELECT event_type, ah, slope_fp,
             sum(cnt) OVER (PARTITION BY event_type, ah
                            ORDER BY slope_fp) AS cum,
             sum(cnt) OVER (PARTITION BY event_type, ah) AS n
      FROM sh),
    am AS (
      SELECT event_type, ah, CAST(min(slope_fp) AS BIGINT) AS aslope
      FROM sh2 WHERE 2 * cum >= n GROUP BY event_type, ah),
    gh AS (
      SELECT event_type, aslope,
             sum(1) OVER (PARTITION BY event_type ORDER BY aslope, ah)
               AS cum,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM am),
    med AS (
      SELECT event_type, CAST(min(aslope) AS BIGINT) AS slope_x1e4,
             CAST(max(n) AS BIGINT) AS n_anchors
      FROM gh WHERE 2 * cum >= n GROUP BY event_type),
    nh AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
           FROM hc GROUP BY 1)
    SELECT m.event_type, nh.n_hours, m.n_anchors, m.slope_x1e4
    FROM med m JOIN nh USING (event_type)
    ORDER BY m.event_type
    """,
)
def aggx_siegel_trend_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-median trend on SAMPLED anchors — the linear-cost
    companion ``aggx_theil_sen_trend``'s docstring prices for past the
    C(n,2) calendar bound [Siegel 1982]: pick 16 anchor hours per event
    type DETERMINISTICALLY (bottom-16 by md5 priority — reproducible
    across engines, reruns, and cluster sizes, so the row value-oracles
    exactly despite being a "sample"), compute each anchor's median
    slope against ALL other hours, then take the median of the anchor
    medians.  Per-anchor medians inherit Theil-Sen's robustness (an
    anchor landing ON an outlier is voted down by the outer median),
    and cost drops from C(n,2) pairs to 16n.  Both medians are the
    exact int64 histogram walk (lower median: min value with
    2*cum >= n), no float summation anywhere.

    Scale shape: the anchor frame is 16 x #event_types rows — it
    BROADCASTS, so pair generation is a broadcast hash join probed by
    the hourly frame at the hourly frame's full parallelism (no
    event_type-keyed shuffle anywhere, complementing the salted exact
    row whose SMJ path needed the de-skew); the anchor cut itself is a
    WindowGroupLimit over md5 priorities.  Slope histograms are keyed
    (event_type, anchor) — 16x more groups than the exact row — and
    the outer median walks a 16-row frame per type."""
    ev = _t(spark, sf_dir, "events")
    from reddit_sse_stream_spark.operators.dedup import md5_hash60

    hc = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    ).agg(F.count("*").cast("long").alias("c"))
    prio = md5_hash60(F.concat(F.lit("sg:"), F.col("h").cast("string")))
    wk = Window.partitionBy("event_type").orderBy(prio.asc(), F.col("h").asc())
    an = (
        hc.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= 16)
        .select(
            "event_type", F.col("h").alias("ah"), F.col("c").alias("ac")
        )
    )
    p = (
        F.broadcast(an)
        .join(hc, "event_type")
        .filter(F.col("h") != F.col("ah"))
        .select(
            "event_type",
            "ah",
            F.expr("(c - ac) * 10000 div (h - ah)").alias("slope_fp"),
        )
    )
    sh = p.groupBy("event_type", "ah", "slope_fp").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type", "ah")
        .orderBy("slope_fp")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type", "ah")
    am = (
        sh.select(
            "event_type",
            "ah",
            "slope_fp",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(wall).alias("n"),
        )
        .filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("event_type", "ah")
        .agg(F.min("slope_fp").cast("long").alias("aslope"))
    )
    gcum = (
        Window.partitionBy("event_type")
        .orderBy("aslope", "ah")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gall = Window.partitionBy("event_type")
    med = (
        am.select(
            "event_type",
            "ah",
            "aslope",
            F.count("*").over(gcum).alias("cum"),
            F.count("*").over(gall).alias("n"),
        )
        .filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("event_type")
        .agg(
            F.min("aslope").cast("long").alias("slope_x1e4"),
            F.max("n").cast("long").alias("n_anchors"),
        )
    )
    nh = hc.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours")
    )
    return (
        med.join(nh, "event_type")
        .select("event_type", "n_hours", "n_anchors", "slope_x1e4")
        .orderBy("event_type")
    )


@_register(
    "anomaly_seasonal_adjusted",
    """
    WITH hc AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    tr AS (
      SELECT h, c,
             CAST(sum(c) OVER w AS BIGINT) AS wsum,
             CAST(count(*) OVER w AS BIGINT) AS wn,
             CAST(extract(hour FROM h) AS BIGINT) AS hod
      FROM hc
      WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    dt AS (
      SELECT h, hod, c * 10000 - (wsum * 10000 // 25) AS det
      FROM tr WHERE wn = 25),
    se AS (
      SELECT hod, CAST(sum(det) // count(*) AS BIGINT) AS seasonal
      FROM dt GROUP BY hod),
    rem AS (
      SELECT dt.h, dt.det - se.seasonal AS r
      FROM dt JOIN se USING (hod)),
    rh AS (SELECT r, CAST(count(*) AS BIGINT) AS c FROM rem GROUP BY r),
    rh2 AS (
      SELECT r, sum(c) OVER (ORDER BY r) AS cum, sum(c) OVER () AS n
      FROM rh),
    med AS (SELECT CAST(min(r) AS BIGINT) AS med FROM rh2 WHERE 2 * cum >= n),
    ad AS (
      SELECT abs(rem.r - med.med) AS a FROM rem CROSS JOIN med),
    ah AS (SELECT a, CAST(count(*) AS BIGINT) AS c FROM ad GROUP BY a),
    ah2 AS (
      SELECT a, sum(c) OVER (ORDER BY a) AS cum, sum(c) OVER () AS n
      FROM ah),
    mad AS (SELECT CAST(min(a) AS BIGINT) AS mad FROM ah2 WHERE 2 * cum >= n),
    sc AS (
      SELECT abs(rem.r - med.med) AS a, greatest(mad.mad, 1) AS m
      FROM rem CROSS JOIN med CROSS JOIN mad),
    lad AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hours,
             CAST(any_value(m) AS BIGINT) AS mad_x1e4,
             CAST(max(10 * a // m) AS BIGINT) AS max_score_x10,
             CAST(sum(CASE WHEN a > 3 * m THEN 1 ELSE 0 END) AS BIGINT) AS f3,
             CAST(sum(CASE WHEN a > 5 * m THEN 1 ELSE 0 END) AS BIGINT) AS f5,
             CAST(sum(CASE WHEN a > 8 * m THEN 1 ELSE 0 END) AS BIGINT) AS f8
      FROM sc)
    SELECT CAST(t AS BIGINT) AS t, n_hours, mad_x1e4, max_score_x10,
           CASE t WHEN 3 THEN f3 WHEN 5 THEN f5 ELSE f8 END AS n_flagged
    FROM lad, unnest([3, 5, 8]) AS u(t) ORDER BY t
    """,
)
def anomaly_seasonal_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly gate — ``ts_seasonal_decompose`` made
    load-bearing: the raw hourly z-score row (``anomaly_zscore_hourly``)
    alarms on calendar rhythm as readily as on real incidents, so this
    row subtracts the decomposition's trend AND hour-of-day seasonal
    first, then gates the REMAINDER on a robust MAD ladder (|r - med| >
    t*MAD for t in {3, 5, 8}) — medians via the count-of-counts
    histogram walk the MAD gate row proved, so everything is exact
    int64 end to end and the ladder compares shared fixed-point values.
    Output is the 3-row ladder (hours scored, MAD, max score, flags per
    t) — never vacuous, and the flag counts ARE the tuning curve an
    on-call rotation reads when picking its alert threshold.

    Plan shape: the decomposition's stages (hour-keyed exchange,
    calendar-sized trend window, 24-row seasonal aggregate) plus two
    value-domain histogram medians and a 1-row ladder aggregate —
    nothing beyond the parents' own cost classes."""
    ev = _t(spark, sf_dir, "events")
    hc = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.orderBy("h").rowsBetween(-12, 12)
    tr = hc.select(
        "h",
        "c",
        F.sum("c").over(w).cast("long").alias("wsum"),
        F.count("*").over(w).cast("long").alias("wn"),
        F.hour("h").cast("long").alias("hod"),
    )
    dt = tr.filter(F.col("wn") == 25).select(
        "h",
        "hod",
        (F.col("c") * 10000 - F.expr("wsum * 10000 div 25")).alias("det"),
    )
    se = dt.groupBy("hod").agg(
        F.expr("sum(det) div count(*)").cast("long").alias("seasonal")
    )
    rem = dt.join(F.broadcast(se), "hod").select(
        (F.col("det") - F.col("seasonal")).alias("r")
    )

    def _hist_median(df, col):
        h = df.groupBy(col).agg(F.count("*").cast("long").alias("c"))
        wcum = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        h2 = h.select(
            col,
            F.sum("c").over(wcum).alias("cum"),
            F.sum("c").over(
                Window.orderBy(col).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        )
        return h2.filter(2 * F.col("cum") >= F.col("n")).agg(
            F.min(col).cast("long").alias("med")
        )
    med = _hist_median(rem, "r")
    ad = rem.crossJoin(F.broadcast(med)).select(
        F.abs(F.col("r") - F.col("med")).alias("a")
    )
    mad = _hist_median(ad, "a").select(
        F.greatest(F.col("med"), F.lit(1)).alias("m")
    )
    sc = ad.crossJoin(F.broadcast(mad))
    lad = sc.agg(
        F.count("*").cast("long").alias("n_hours"),
        F.first("m").cast("long").alias("mad_x1e4"),
        F.max(F.expr("10 * a div m")).cast("long").alias("max_score_x10"),
        *[
            F.sum((F.col("a") > t * F.col("m")).cast("long"))
            .cast("long")
            .alias(f"f{t}")
            for t in (3, 5, 8)
        ],
    )
    return (
        lad.selectExpr(
            "n_hours",
            "mad_x1e4",
            "max_score_x10",
            "stack(3, CAST(3 AS BIGINT), f3, CAST(5 AS BIGINT), f5,"
            " CAST(8 AS BIGINT), f8) AS (t, n_flagged)",
        )
        .select("t", "n_hours", "mad_x1e4", "max_score_x10", "n_flagged")
        .orderBy("t")
    )


@_register("ts_ewma_features", _ewma_oracle())
def ts_ewma_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed value feature per event
    (operators/timeseries.py:ewma_features): the decay sibling of
    ts_rolling_features — weight 2^(15-i) on the i-th most recent of the
    key's last 16 events, exact int64 fixed point, with the realized
    weight sum so partial histories normalize honestly.  The recursive
    EWMA is order-sequential and float-accumulating; this bounded exact
    form is stateless, partition-invariant, and fully SQL-twinnable —
    ONE key exchange serves all 16 lag columns."""
    from reddit_sse_stream_spark.operators.timeseries import ewma_features

    return ewma_features(_t(spark, sf_dir, "events"))


_ROLLING_FEATURES_ORACLE = """
    WITH e AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vfp
      FROM events)
    SELECT event_id, user_id,
           CAST(count(*) OVER w1 AS BIGINT) AS n_short,
           CAST(sum(vfp) OVER w1 AS BIGINT) AS v_short_fp,
           CAST(count(*) OVER w24 AS BIGINT) AS n_long,
           CAST(sec - lag(sec) OVER wl AS BIGINT) AS gap_s
    FROM e
    WINDOW
      w1 AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW),
      w24 AS (PARTITION BY user_id ORDER BY sec
              RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW),
      wl AS (PARTITION BY user_id ORDER BY sec, event_id)
    """


@_register("ts_rolling_features", _ROLLING_FEATURES_ORACLE)
def ts_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event rolling feature matrix
    (operators/timeseries.py:rolling_features): trailing-1h count +
    fixed-point value sum, trailing-24h count, and gap-to-previous-event
    — the behavioral-feature backfill a training pipeline materializes.
    Four window frames over ONE user_id exchange (range frames and the
    lag re-sort in place on the same clustering, plan-pinned); ties on
    the floored epoch second are frame peers on both engines, and the
    (sec, id) lag order is total — fully value-deterministic."""
    return timeseries.rolling_features(_t(spark, sf_dir, "events"))


def _duplicate_spans_oracle_sql(k: int = 8) -> str:
    """DuckDB twin of text.duplicate_spans: gram-hash occurrence window,
    islands-and-gaps span merge."""
    return f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    ),
    idx AS (
      SELECT doc_id, words,
             unnest(generate_series(1, len(words) - {k - 1})) AS i
      FROM w WHERE len(words) >= {k}
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             CAST(concat('0x', substr(md5(array_to_string(words[i:i+{k - 1}], ' ')), 1, 15))
                  AS BIGINT) AS h
      FROM idx
    ),
    s AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS occ FROM g)
      WHERE occ > 1
    ),
    r AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM s
    )
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {k - 1} AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM r GROUP BY doc_id, grp
    """


@_register("text_duplicate_spans", _duplicate_spans_oracle_sql())
def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span extents (operators/text.py:duplicate_spans)
    — the Lee-et-al substring-dedup primitive relationally: positions
    whose 8-gram recurs anywhere in the corpus, merged into maximal
    per-doc spans via islands-and-gaps.  The surgical alternative to
    whole-doc dropping.  TWO exchanges total: a count window on the
    gram-hash key (no pair join — a million-doc boilerplate gram costs
    its row count, not a quadratic fanout) and the per-doc islands fold,
    whose doc_id clustering the final agg reuses."""
    return text.duplicate_spans(_t(spark, sf_dir, "documents"))


def _source_minhash_matrix_oracle_sql(
    num_hashes: int = 16, k: int = 5, sample_mod_lt: int | None = None
) -> str:
    """DuckDB twin of dedup.source_minhash_matrix: same shingle/permutation
    family as _minhash_md5_oracle_sql, aggregated per SOURCE (union
    mergeability), pairwise slot-agreement estimate + exact set Jaccard.
    ``sample_mod_lt`` mirrors exact_sample_frac: the audit side (sizes +
    intersections) runs on ``h % 10000 < sample_mod_lt``; the sketch side
    always sees every hash."""
    coeffs = dedup._coeffs(num_hashes)
    p = (1 << 31) - 1
    sig_cols = ", ".join(
        f"min((h * {a} + {b}) % {p}) AS s{i}" for i, (a, b) in enumerate(coeffs)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    if sample_mod_lt is None:
        audit = "sh"
        sig = f"SELECT source, {sig_cols}, count(*) AS n FROM sh GROUP BY source"
        exact = (
            "floor(COALESCE(i.ni, 0) * 10000.0"
            " / (p.na + p.nb - COALESCE(i.ni, 0))) / 10000.0"
        )
    else:
        audit = "sha"
        sig = (
            f"SELECT source, {sig_cols}, "
            f"count(*) FILTER (WHERE h % 10000 < {sample_mod_lt}) AS n "
            "FROM sh GROUP BY source"
        )
        exact = (
            "CASE WHEN p.na + p.nb - COALESCE(i.ni, 0) > 0 THEN"
            " floor(COALESCE(i.ni, 0) * 10000.0"
            " / (p.na + p.nb - COALESCE(i.ni, 0))) / 10000.0"
            " ELSE 0.0 END"
        )
    sha = (
        f"sha AS (SELECT * FROM sh WHERE h % 10000 < {sample_mod_lt}),"
        if sample_mod_lt is not None
        else ""
    )
    return f"""
    WITH w AS (
      SELECT source, regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    ),
    idx AS (
      SELECT source, words,
             unnest(generate_series(1, len(words) - {k - 1})) AS i
      FROM w WHERE len(words) >= {k}
    ),
    sh AS (
      SELECT DISTINCT source,
             CAST(concat('0x', substr(md5(array_to_string(words[i:i+{k - 1}], ' ')), 1, 15))
                  AS BIGINT) % {p} AS h
      FROM idx
    ),
    {sha}
    sig AS ({sig}),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, a.n AS na, b.n AS nb,
             floor(({match_sum}) * 10000.0 / {num_hashes}) / 10000.0
               AS est_jaccard
      FROM sig a JOIN sig b ON a.source < b.source
    ),
    inter AS (
      SELECT l.source AS source_a, r.source AS source_b, count(*) AS ni
      FROM {audit} l JOIN {audit} r ON l.h = r.h AND l.source < r.source
      GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b, p.est_jaccard,
           {exact} AS exact_jaccard,
           CAST(p.na + p.nb - COALESCE(i.ni, 0) AS BIGINT) AS n_union
    FROM pairs p LEFT JOIN inter i USING (source_a, source_b)
    """


@_register("dedup_source_minhash_matrix", _source_minhash_matrix_oracle_sql())
def dedup_source_minhash_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair similarity matrix from per-source MinHash unions
    (operators/dedup.py:source_minhash_matrix): sketch-cost "how much
    does crawl A overlap crawl B", each pair audited against the exact
    distinct-shingle Jaccard.  MinHash mergeability makes the per-source
    state num_hashes longs regardless of source size — at 100 TB the
    matrix is one scan + a (n_sources x num_hashes) agg; the exact
    column is the test-scale audit."""
    return dedup.source_minhash_matrix(_t(spark, sf_dir, "documents"))


@_register(
    "dedup_source_minhash_sampled",
    _source_minhash_matrix_oracle_sql(sample_mod_lt=1250),
)
def dedup_source_minhash_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB configuration of the source-overlap matrix (VERDICT r08
    next #2): sketch estimates identical to dedup_source_minhash_matrix,
    but the exact-audit side — the corpus-sized distinct self-join that
    dominated the full row's cost — runs on a deterministic 1/8
    hash-range sample (h % 10000 < 1250).  Sampling on the shingle hash
    alone keeps inclusion consistent across sources, so the sampled
    Jaccard is a fixed-subset estimate whose input shrinks 8x; the full
    row stays in the catalog as the audit of this estimate."""
    return dedup.source_minhash_matrix(
        _t(spark, sf_dir, "documents"), exact_sample_frac=0.125
    )


def _sketch_merge_invariant_oracle_sql(num_hashes: int = 16, k: int = 5) -> str:
    """DuckDB twin of dedup.source_minhash_merge_invariant: half-sketches
    merged by elementwise least vs the full-corpus sketch, one audit row."""
    coeffs = dedup._coeffs(num_hashes)
    p = (1 << 31) - 1
    sig_cols = ", ".join(
        f"min((h * {a} + {b}) % {p}) AS s{i}" for i, (a, b) in enumerate(coeffs)
    )
    merged_cols = ", ".join(
        f"least(COALESCE(a.s{i}, {p}), COALESCE(b.s{i}, {p})) AS m{i}"
        for i in range(num_hashes)
    )
    mism = " + ".join(
        f"CASE WHEN m.m{i} <> f.s{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
    WITH w AS (
      SELECT source, doc_id % 2 AS half,
             regexp_split_to_array(lower(text), '\\s+') AS words
      FROM documents
    ),
    idx AS (
      SELECT source, half, words,
             unnest(generate_series(1, len(words) - {k - 1})) AS i
      FROM w WHERE len(words) >= {k}
    ),
    sh AS (
      SELECT DISTINCT source, half,
             CAST(concat('0x', substr(md5(array_to_string(words[i:i+{k - 1}], ' ')), 1, 15))
                  AS BIGINT) % {p} AS h
      FROM idx
    ),
    fs AS (SELECT source, {sig_cols} FROM sh GROUP BY source),
    h0 AS (SELECT source, {sig_cols} FROM sh WHERE half = 0 GROUP BY source),
    h1 AS (SELECT source, {sig_cols} FROM sh WHERE half = 1 GROUP BY source),
    merged AS (
      SELECT COALESCE(a.source, b.source) AS source, {merged_cols}
      FROM h0 a FULL JOIN h1 b ON a.source = b.source
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sources,
           CAST({num_hashes} AS BIGINT) AS n_slots,
           CAST(COALESCE(sum({mism}), 0) AS BIGINT) AS n_mismatch
    FROM fs f JOIN merged m ON f.source = m.source
    """


@_register(
    "dedup_sketch_merge_invariant", _sketch_merge_invariant_oracle_sql()
)
def dedup_sketch_merge_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof row for the source MinHash sketch
    (operators/dedup.py:source_minhash_merge_invariant): half-corpus
    sketches merged by elementwise min must equal the full-corpus sketch
    slot-for-slot (n_mismatch = 0) — the invariant that lets 100 TB
    sketch per-partition with no coordination and fold tiny states.
    Same audit discipline as dedup_bloom_fp_audit."""
    return dedup.source_minhash_merge_invariant(_t(spark, sf_dir, "documents"))


_CMS_ORACLE = """
    WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
    cells AS (
      SELECT j,
             CAST(concat('0x', substr(md5(concat(j, ':', key)), 1, 15))
                  AS BIGINT) % 64 AS cell,
             count(*) AS cnt
      FROM e, unnest(generate_series(0, 3)) AS t(j)
      GROUP BY 1, 2
    ),
    exact AS (SELECT key, count(*) AS exact_cnt FROM e GROUP BY key),
    topk AS (SELECT key, exact_cnt FROM exact
             ORDER BY exact_cnt DESC, key LIMIT 10),
    probes AS (
      SELECT t.key, t.exact_cnt, j,
             CAST(concat('0x', substr(md5(concat(j, ':', t.key)), 1, 15))
                  AS BIGINT) % 64 AS cell
      FROM topk t, unnest(generate_series(0, 3)) AS s(j)
    )
    SELECT p.key AS user_id,
           CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(min(c.cnt) AS BIGINT) AS cms_est,
           CAST(min(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
    FROM probes p JOIN cells c ON c.j = p.j AND c.cell = p.cell
    GROUP BY p.key, p.exact_cnt
    """


@_register("agg_countmin_heavy_hitters", _CMS_ORACLE)
def agg_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates audited against exact counts
    for the exact top-10 keys (operators/sketches.py:
    countmin_heavy_hitters).  The sketch's exchange is d*w = 256 cells
    total after map-side combine — constant-size regardless of key
    cardinality, cell-wise addable across partitions/days — vs the
    per-distinct-key shuffle of agg_heavy_hitters_exact; the exact side
    here measures the one-sided overcount (cms_est >= exact always).
    Deterministic md5-derived cells, value-verified in SQL."""
    from reddit_sse_stream_spark.operators.sketches import (
        countmin_heavy_hitters,
    )

    return countmin_heavy_hitters(_t(spark, sf_dir, "events"))


_IPF_ROUNDS = 3


def _ipf_oracle() -> str:
    """Unrolled-CTE twin of the IPF passes, generated from the SAME loop
    as the Spark side so the engines cannot drift (the pca/kmeans
    unrolled-round pattern)."""
    parts = [
        """cells AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                   CAST(count(DISTINCT source) AS BIGINT) AS ns
            FROM cells),
    lr AS (SELECT lang, row_number() OVER (ORDER BY lang) AS j,
                  count(*) OVER () AS l
           FROM (SELECT DISTINCT lang FROM cells)),
    w0 AS (
      SELECT c.source, c.lang, c.n,
             CAST((t // ns) * 1000000 AS BIGINT) AS rt,
             CAST(((t * j) // ((l * (l + 1)) // 2)) * 1000000 AS BIGINT)
               AS ct,
             CAST(c.n * 1000000 AS BIGINT) AS w
      FROM cells c, tot, lr WHERE lr.lang = c.lang)"""
    ]
    prev = "w0"
    step = 0
    for _ in range(_IPF_ROUNDS):
        for part_col in ("source", "lang"):
            tgt = "rt" if part_col == "source" else "ct"
            step += 1
            cur = f"p{step}"
            parts.append(
                f"""{cur} AS (
      SELECT source, lang, n, rt, ct,
             CAST((w * {tgt}) // (sum(w) OVER (PARTITION BY {part_col}))
                  AS BIGINT) AS w
      FROM {prev})"""
            )
            prev = cur
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT source, lang, n AS n_docs, w AS w_x1e6,
           CAST(abs(sum(w) OVER (PARTITION BY source) - rt) * 10000
                // rt AS BIGINT) AS row_gap_x1e4,
           CAST(abs(sum(w) OVER (PARTITION BY lang) - ct) * 10000
                // ct AS BIGINT) AS col_gap_x1e4
    FROM {prev}
    ORDER BY source, lang
    """


@_register("corpus_ipf_raking_mix", _ipf_oracle())
def corpus_ipf_raking_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) over the (source, lang)
    mix matrix [Deming & Stephan 1940] — the marginal-matching step the
    DoReMi / water-fill rows do NOT cover: given a per-source budget
    marginal (equal shares here) AND a target language marginal (a
    deterministic alphabetical-rank tilt, so it differs from the
    observed mix by construction), find per-cell sampling weights whose
    row sums match the source budgets and column sums match the language
    targets simultaneously.  IPF alternates row-scaling and
    column-scaling passes; after the final column pass the column gaps
    are floor-rounding only and the row gaps measure convergence
    (monotone toward 0 in rounds — 3 unrolled here).  All arithmetic is
    exact int64 fixed point (1e6 weight domain, truncating division on
    both engines), so every intermediate weight value-verifies.

    Plan shape: ONE (source, lang) count exchange is the only
    data-shaped stage; every IPF pass is a window sum over the
    #sources x #langs dimension frame (100 cells at the test SFs) — at
    100 TB the matrix is still dimension-sized, and the passes never
    touch the corpus again.  Fixed-point magnitude bound: w*target <
    2^63 requires total_docs^2 * 1e12 < 2^63 per cell pair — at
    trillion-doc scale rescale the weight base (the weights are SHARES;
    the 1e6 domain is presentation, not precision)."""
    docs = _t(spark, sf_dir, "documents")
    # the cell matrix feeds THREE consumers (totals, the lang-rank frame,
    # and the weight seed): checkpoint it so the corpus is scanned ONCE
    # and every branch reads the ~100-cell materialization — the
    # dq_mad_outlier_gate single-scan pattern (plan-pinned)
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint()
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("t"),
        F.count_distinct("source").cast("long").alias("ns"),
    )
    lw = Window.orderBy("lang")
    lr = (
        cells.select("lang")
        .distinct()
        .select(
            "lang",
            F.row_number().over(lw).alias("j"),
            F.count("*").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("l"),
        )
    )
    w = (
        cells.crossJoin(F.broadcast(tot))
        .join(F.broadcast(lr), "lang")
        .select(
            "source",
            "lang",
            "n",
            (F.expr("t div ns") * 1000000).cast("long").alias("rt"),
            (
                F.expr("(t * j) div ((l * (l + 1)) div 2)") * 1000000
            )
            .cast("long")
            .alias("ct"),
            (F.col("n") * 1000000).cast("long").alias("w"),
        )
    )
    for _ in range(_IPF_ROUNDS):
        for part_col in ("source", "lang"):
            tgt = "rt" if part_col == "source" else "ct"
            ws = Window.partitionBy(part_col)
            w = w.withColumn("swin", F.sum("w").over(ws)).select(
                "source",
                "lang",
                "n",
                "rt",
                "ct",
                F.expr(f"(w * {tgt}) div swin").cast("long").alias("w"),
            )
    wsrc = Window.partitionBy("source")
    wlang = Window.partitionBy("lang")
    return (
        w.withColumn("rs", F.sum("w").over(wsrc))
        .withColumn("cs", F.sum("w").over(wlang))
        .select(
            "source",
            "lang",
            F.col("n").alias("n_docs"),
            F.col("w").alias("w_x1e6"),
            F.expr("abs(rs - rt) * 10000 div rt")
            .cast("long")
            .alias("row_gap_x1e4"),
            F.expr("abs(cs - ct) * 10000 div ct")
            .cast("long")
            .alias("col_gap_x1e4"),
        )
        .orderBy("source", "lang")
    )


@_register(
    "corpus_doremi_reweight",
    r"""
    WITH w AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(text), '\s+') AS words
      FROM documents
    ),
    big AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(words)),
                    i -> words[i] || ' ' || words[i+1])) AS bg
      FROM w WHERE len(words) >= 2
    ),
    ref AS (SELECT DISTINCT bg FROM big WHERE doc_id % 10 = 0),
    dom AS (
      SELECT b.source, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CASE WHEN r.bg IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM big b LEFT JOIN ref r USING (bg) GROUP BY b.source
    ),
    nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source),
    j AS (
      SELECT nd.source, nd.n_docs,
             COALESCE(dom.n_bigrams, 0) AS n_bigrams,
             COALESCE(dom.n_oov, 0) AS n_oov,
             CAST(1000000 + CASE WHEN COALESCE(dom.n_bigrams, 0) = 0 THEN 0
                  ELSE (500000 * dom.n_oov) // dom.n_bigrams END AS BIGINT)
               AS boost_x1e6
      FROM nd LEFT JOIN dom USING (source)
    ),
    t AS (SELECT sum(n_docs * boost_x1e6) AS tot FROM j)
    SELECT j.source, j.n_docs, j.n_bigrams, j.n_oov, j.boost_x1e6,
           CAST(floor(j.n_docs * j.boost_x1e6 * 1e6 / t.tot) AS BIGINT)
             AS weight_x1e6
    FROM j, t ORDER BY j.source
    """,
)
def corpus_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting
    (operators/corpus.py:doremi_domain_reweight): multiplicative-weights
    boost per source from its out-of-reference-vocabulary bigram rate
    (the exact-integer stand-in for proxy-model excess loss), normalized
    to a training mix.  One bigram exchange + a per-domain aggregate +
    a broadcast 1-row total — all int64 counts and two IEEE ops, no
    exp/log, so the weights are bit-identical cross-engine."""
    return corpus.doremi_domain_reweight(_t(spark, sf_dir, "documents"))


def _quality_probe_oracle(iters: int = 3) -> str:
    """Unrolled-CTE twin of :func:`corpus.quality_linear_probe`: the same
    fixed-point full-batch GD rounds (addends at 1e-12, gradient folds at
    1e-9, one IEEE op per scalar step, w re-quantized at 1e-6), so
    weights and scores match the Spark+driver computation bit for bit."""
    ctes = [
        # features: bias, n_words/256, n_chars/4096, n_distinct/256 —
        # power-of-two divisors keep every derivation exact
        r"""f AS (
      SELECT doc_id,
             CASE WHEN TRY_CAST(substring(source, 4) AS INT) % 2 = 0
                  THEN 1.0 ELSE 0.0 END AS y,
             [1.0,
              len(regexp_split_to_array(text, '\s+')) / 256.0,
              length(text) / 4096.0,
              len(list_distinct(regexp_split_to_array(text, '\s+'))) / 256.0
             ] AS x
      FROM documents)""",
        "ex AS (SELECT doc_id, y, unnest(range(0, 4)) AS d,"
        " unnest(x) AS val FROM f)",
        "nn AS (SELECT count(*) AS n FROM documents)",
        "v0 AS (SELECT unnest(range(0, 4)) AS d, 0.0 AS val)",
    ]
    for t in range(iters):
        ctes += [
            f"dot{t} AS (SELECT e.doc_id, min(e.y) AS y,"
            " sum(CAST(floor(e.val * v.val * 1e12 + 0.5) AS BIGINT)) AS dfp"
            f" FROM ex e JOIN v{t} v USING (d) GROUP BY e.doc_id)",
            f"g{t} AS (SELECT e.d,"
            " sum(CAST(floor(e.val * (dd.dfp / 1e12 - dd.y) * 1e9 + 0.5)"
            " AS BIGINT)) AS gfp"
            f" FROM ex e JOIN dot{t} dd USING (doc_id) GROUP BY e.d)",
            f"v{t + 1} AS (SELECT d,"
            " floor((v.val - 0.5 * ((g.gfp / 1e9) / nn.n)) * 1e6 + 0.5)"
            " / 1e6 AS val"
            f" FROM v{t} v JOIN g{t} g USING (d), nn)",
        ]
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT e.doc_id,"
        " CAST(min(e.y) AS BIGINT) AS label,"
        " CAST(floor((sum(CAST(floor(e.val * v.val * 1e12 + 0.5) AS BIGINT))"
        " + 500000) / 1e6) AS BIGINT) AS score_x1e6"
        f"\nFROM ex e JOIN v{iters} v USING (d) GROUP BY e.doc_id"
    )


@_register("corpus_quality_linear_probe", _quality_probe_oracle())
def corpus_quality_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality scorer (operators/corpus.py:quality_linear_probe):
    a CCNet/fastText-shaped linear probe over cheap per-doc features,
    trained by 3 exact fixed-point GD rounds (deterministic labels from
    a curated-source stand-in), then every doc scored by the learned
    projection — the data-driven half of the quality gate next to the
    rule-based ``text_gopher_gate``.  Per round: one map pass over the
    checkpointed feature frame + a 4-key gradient aggregate (the model
    is 4 doubles of driver state); the oracle unrolls the identical
    rounds as CTEs and matches bit for bit."""
    return corpus.quality_linear_probe(_t(spark, sf_dir, "documents"))


@_register(
    "media_image_ahash",
    """
    WITH ids AS (
      SELECT doc_id AS m, CAST((doc_id // 3) % 3 AS INTEGER) AS c
      FROM documents WHERE doc_id % 3 = 0
    ),
    dims AS (
      SELECT m, c,
             CASE WHEN c = 2 THEN 8 * (2 + m % 5) ELSE 8 + m % 9 END AS w,
             CASE WHEN c = 2 THEN 8 * (2 + m % 3) ELSE 8 + m % 7 END AS h
      FROM ids
    ),
    gray AS (
      SELECT d.m, d.w, d.h, ux.x, uy.y,
             CASE WHEN d.c = 2 THEN
               (d.m * 40503
                + ((uy.y // 8) * (d.w // 8) + (ux.x // 8)) * 2654435761) % 256
             ELSE
               ((d.m * 40503 + ((uy.y * d.w + ux.x) * 3 + 0) * 2654435761) % 256
                + (d.m * 40503 + ((uy.y * d.w + ux.x) * 3 + 1) * 2654435761) % 256
                + (d.m * 40503 + ((uy.y * d.w + ux.x) * 3 + 2) * 2654435761) % 256
               ) // 3
             END AS g
      FROM dims d, UNNEST(range(d.w)) AS ux(x), UNNEST(range(d.h)) AS uy(y)
    ),
    cells AS (
      SELECT m, any_value(w) AS w, any_value(h) AS h,
             (y * 8) // h AS v, (x * 8) // w AS u,
             sum(g) AS s, count(*) AS c
      FROM gray GROUP BY m, (y * 8) // h, (x * 8) // w
    ),
    cms AS (SELECT m, w, h, v * 8 + u AS idx, s // c AS cm FROM cells),
    tot AS (SELECT m, sum(cm) AS t FROM cms GROUP BY m),
    bits AS (
      SELECT c.m, c.w, c.h, c.idx,
             CASE WHEN 64 * c.cm > t.t THEN 1 ELSE 0 END AS b
      FROM cms c JOIN tot t USING (m)
    )
    SELECT m AS media_id,
           CAST(any_value(w) AS INTEGER) AS img_w,
           CAST(any_value(h) AS INTEGER) AS img_h,
           CAST(sum(CASE WHEN idx >= 32
                    THEN b * (CAST(1 AS BIGINT) << (idx - 32))
                    ELSE 0 END) AS BIGINT) AS hash_hi,
           CAST(sum(CASE WHEN idx < 32
                    THEN b * (CAST(1 AS BIGINT) << idx)
                    ELSE 0 END) AS BIGINT) AS hash_lo,
           CAST(sum(b) AS INTEGER) AS n_ones
    FROM bits GROUP BY m ORDER BY media_id
    """,
)
def media_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash of REAL image containers
    (operators/multimodal.py:image_ahash): decode ALL THREE rotating
    containers — uncompressed BMP, zlib-compressed PNG (CRC walk +
    inflate + 5-filter reversal), lossy baseline JPEG (Huffman + dequant
    + full IDCT) — back to the raster and fold the classic 64-bit aHash
    (8x8 integer binning, division-free global-mean threshold) — the
    fingerprint image-dedup pipelines pair on (the Hamming banding
    recipe is the SimHash rows').  Zero-shuffle mapInPandas decode pass;
    the oracle recomputes every pixel from the per-container generative
    formulas and the identical integer binning, so the hash — not just
    aggregates of it — is value-verified bit for bit, THROUGH the lossy
    codec on its DC-exact subset."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    media = multimodal.synthesize_media(docs, real_media=True)
    return multimodal.image_ahash(media).orderBy("media_id")


@_register(
    "media_audio_fingerprint",
    """
    WITH ids AS (SELECT doc_id AS m FROM documents WHERE doc_id % 3 = 1),
    dims AS (SELECT m, 160 + m % 101 AS n FROM ids),
    smp AS (
      SELECT d.m, d.n, ui.i,
             abs(((d.m * 40503 + ui.i * 2654435761) % 65536) - 32768) AS a
      FROM dims d, UNNEST(range(d.n)) AS ui(i)
    ),
    wins AS (
      SELECT m, any_value(n) AS n, (i * 64) // n AS w,
             sum(a) AS s, count(*) AS c
      FROM smp GROUP BY m, (i * 64) // n
    ),
    ems AS (SELECT m, n, w AS idx, s // c AS em FROM wins),
    tot AS (SELECT m, sum(em) AS t FROM ems GROUP BY m),
    bits AS (
      SELECT e.m, e.n, e.idx,
             CASE WHEN 64 * e.em > t.t THEN 1 ELSE 0 END AS b
      FROM ems e JOIN tot t USING (m)
    )
    SELECT m AS media_id,
           CAST(any_value(n) AS INTEGER) AS n_samples,
           CAST(sum(CASE WHEN idx >= 32
                    THEN b * (CAST(1 AS BIGINT) << (idx - 32))
                    ELSE 0 END) AS BIGINT) AS hash_hi,
           CAST(sum(CASE WHEN idx < 32
                    THEN b * (CAST(1 AS BIGINT) << idx)
                    ELSE 0 END) AS BIGINT) AS hash_lo,
           CAST(sum(b) AS INTEGER) AS n_ones
    FROM bits GROUP BY m ORDER BY media_id
    """,
)
def media_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic fingerprint of REAL WAV containers
    (operators/multimodal.py:audio_fingerprint): decode the PCM16
    frames and fold the 64-window integer energy-profile hash
    (division-free mean threshold — the exact-integer core of
    Haitsma-Kalker-style audio fingerprints), completing the multimodal
    dedup family next to the image aHash.  Zero-shuffle mapInPandas
    pass; the oracle recomputes every sample from the generative
    waveform formula, so the fingerprint is value-verified bit for
    bit."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    media = multimodal.synthesize_media(docs, real_media=True)
    return multimodal.audio_fingerprint(media).orderBy("media_id")


@_register(
    "media_video_scene_cuts",
    """
    WITH ids AS (
      SELECT doc_id AS m, 2 + doc_id % 5 AS n FROM documents
      WHERE doc_id % 3 = 2
    ),
    px AS (
      SELECT i.m, uf.f, up.j,
             ((i.m * 40503 + (uf.f * 384 + up.j * 3 + 0) * 2654435761) % 256
              + (i.m * 40503 + (uf.f * 384 + up.j * 3 + 1) * 2654435761) % 256
              + (i.m * 40503 + (uf.f * 384 + up.j * 3 + 2) * 2654435761) % 256
             ) // 3 AS ga,
             ((i.m * 40503 + ((uf.f + 1) * 384 + up.j * 3 + 0) * 2654435761) % 256
              + (i.m * 40503 + ((uf.f + 1) * 384 + up.j * 3 + 1) * 2654435761) % 256
              + (i.m * 40503 + ((uf.f + 1) * 384 + up.j * 3 + 2) * 2654435761) % 256
             ) // 3 AS gb
      FROM ids i, UNNEST(range(i.n - 1)) AS uf(f), UNNEST(range(128)) AS up(j)
    ),
    trans AS (SELECT m, f, sum(abs(ga - gb)) AS sad FROM px GROUP BY m, f)
    SELECT m AS media_id, CAST(f AS INTEGER) AS f,
           CAST(sad AS BIGINT) AS sad,
           CAST((sad * 100) // 128 AS BIGINT) AS mad_x100,
           CAST(CASE WHEN (sad * 100) // 128 > 4800 THEN 1 ELSE 0 END
                AS INTEGER) AS is_cut
    FROM trans ORDER BY media_id, f
    """,
)
def media_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL AVI containers
    (operators/multimodal.py:video_scene_cuts): decode every 'DIB '
    frame to its gray plane and score each adjacent-frame transition by
    exact-integer mean absolute difference — the classic pixel-domain
    cut detector frame-sampling pipelines segment with.  Zero-shuffle
    mapInPandas pass; the oracle recomputes both frames of every
    transition from the generative formula (16x8 planes, 384
    bytes/frame), so sad/mad/is_cut are value-verified bit for bit."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    media = multimodal.synthesize_media(docs, real_media=True)
    return multimodal.video_scene_cuts(media).orderBy("media_id", "f")


def _S1LOG2(m: str) -> str:
    """SQL for S1(m) = sum_{r=1..m} floor(log2 r), exact int64 closed
    form: (m+1)*L - 2^(L+1) + 2 with L = floor(log2 m) = length(bin(m))-1.
    Engine-portable (Spark SQL + DuckDB agree on bin() and <<); brute-
    force pinned in tests/test_plans.py."""
    L = f"(length(bin({m}))-1)"
    return (
        f"(CASE WHEN {m} <= 0 THEN CAST(0 AS BIGINT) ELSE "
        f"CAST(({m}+1) * {L} - 2*(CAST(1 AS BIGINT) << {L}) + 2"
        f" AS BIGINT) END)"
    )


def _S2LOG2(m: str) -> str:
    """SQL for S2(m) = sum_{r=1..m} floor(log2 r)^2, exact int64 closed
    form via sum_{k<=K} k^2*2^k = 2^(K+1)*(K^2-2K+3) - 6 at K = L-1,
    plus the partial top bucket: 2^L*(L^2-4L+6) - 6 + L^2*(m - 2^L + 1)."""
    L = f"(length(bin({m}))-1)"
    return (
        f"(CASE WHEN {m} <= 1 THEN CAST(0 AS BIGINT) ELSE "
        f"CAST((CAST(1 AS BIGINT) << {L}) * ({L}*{L} - 4*{L} + 6) - 6"
        f" + {L}*{L} * ({m} - (CAST(1 AS BIGINT) << {L}) + 1)"
        f" AS BIGINT) END)"
    )


@_register(
    "text_zipf_fit",
    rf"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
      FROM documents
    ),
    tf AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok
           WHERE length(w) > 0 GROUP BY w),
    hist AS (SELECT f, CAST(count(*) AS BIGINT) AS cnt FROM tf GROUP BY f),
    blk AS (
      SELECT f, cnt,
             CAST(coalesce(sum(cnt) OVER (ORDER BY f DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb
      FROM hist
    ),
    blk2 AS (SELECT cnt, cb, cb + cnt AS b, length(bin(f)) - 1 AS y
             FROM blk),
    blk3 AS (SELECT cnt, y,
                    {_S1LOG2('b')} - {_S1LOG2('cb')} AS sx_blk,
                    {_S2LOG2('b')} - {_S2LOG2('cb')} AS sxx_blk
             FROM blk2),
    mom AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(sx_blk) AS BIGINT) AS sx,
             CAST(sum(cnt * y) AS BIGINT) AS sy,
             CAST(sum(sxx_blk) AS BIGINT) AS sxx,
             CAST(sum(y * sx_blk) AS BIGINT) AS sxy
      FROM blk3
    )
    SELECT n AS n_types, sx, sy, sxx, sxy,
           CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
             (10000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
           END AS BIGINT) AS slope_x1e4
    FROM mom
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary — the rank-frequency
    slope a corpus-health audit checks (natural text runs near -1;
    template/spam corpora flatten or cliff): regress whole-bit
    log2(freq) on whole-bit log2(rank) (the exact integer log2 of
    ``text_bigram_lm_bits`` — length(bin(n))-1, no floating log) with
    exact int64 regression moments and a x1e4 floor-division slope.

    100 TB plan (VERDICT r11 next #1): NO per-type rank is materialized.
    All types sharing a frequency f occupy a CONTIGUOUS rank block
    [cb+1, cb+cnt] (cb = #types with higher f), and every type in the
    block contributes the same y = floor(log2 f), so the regression
    moments over x = floor(log2 rank) collapse to closed-form prefix
    sums over rank blocks: S1(m) = Σ_{{r<=m}} floor(log2 r)
    = (m+1)·L − 2^{{L+1}} + 2 and S2(m) = Σ floor(log2 r)² =
    2^L·(L²−4L+6) − 6 + L²·(m − 2^L + 1), L = floor(log2 m) — exact
    int64, bit-identical in both engines (pinned in
    tests/test_plans.py).  The plan is one term exchange, one
    distinct-frequency aggregate (Zipf-tiny: O(max f) distinct counts,
    dimension-sized at any corpus size), one dimension-sized cumsum
    window, one 1-row moment aggregate — the vocabulary-sized
    single-partition rank window of the r11 shape is gone."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    tf = tok.groupBy("w").agg(F.count("*").alias("f"))
    hist = tf.groupBy("f").agg(F.count("*").cast("long").alias("cnt"))
    w_cum = Window.orderBy(F.col("f").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    blk = (
        hist.select(
            "f",
            "cnt",
            F.coalesce(F.sum("cnt").over(w_cum), F.lit(0))
            .cast("long")
            .alias("cb"),
        )
        .withColumn("b", F.col("cb") + F.col("cnt"))
        .withColumn("y", F.length(F.bin("f")) - 1)
        .withColumn(
            "sx_blk", F.expr(_S1LOG2("b")) - F.expr(_S1LOG2("cb"))
        )
        .withColumn(
            "sxx_blk", F.expr(_S2LOG2("b")) - F.expr(_S2LOG2("cb"))
        )
    )
    mom = blk.agg(
        F.sum("cnt").cast("long").alias("n_types"),
        F.sum("sx_blk").cast("long").alias("sx"),
        F.sum(F.col("cnt") * F.col("y")).cast("long").alias("sy"),
        F.sum("sxx_blk").cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("sx_blk")).cast("long").alias("sxy"),
    )
    return mom.select(
        "n_types", "sx", "sy", "sxx", "sxy",
        F.when(
            F.col("n_types") * F.col("sxx") - F.col("sx") * F.col("sx")
            == 0,
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.expr(
                "(10000 * (n_types * sxy - sx * sy))"
                " div (n_types * sxx - sx * sx)"
            )
        )
        .cast("long")
        .alias("slope_x1e4"),
    )


@_register(
    "pack_context_length_curve",
    r"""
    WITH t AS (
      SELECT CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
               AS n_tok
      FROM documents
    ),
    ls AS (SELECT unnest([512, 1024, 2048, 4096]) AS ctx_len)
    SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(n_tok, ctx_len)) AS BIGINT) AS kept_tokens,
           CAST(sum(greatest(n_tok - ctx_len, 0)) AS BIGINT)
             AS truncated_tokens,
           CAST(sum(ctx_len - least(n_tok, ctx_len)) AS BIGINT)
             AS padding_tokens,
           CAST((10000 * sum(least(n_tok, ctx_len)))
                // (CAST(count(*) AS BIGINT) * ctx_len) AS BIGINT)
             AS utilization_x1e4
    FROM t CROSS JOIN ls GROUP BY ctx_len ORDER BY ctx_len
    """,
)
def pack_context_length_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length sizing curve — the one-doc-per-sequence packing
    audit that picks a training context length: for each candidate
    ctx_len, exact token kept/truncated/padding totals and a x1e4
    utilization ratio (kept / (docs * ctx_len)).  The sequence-PACKING
    ops (pack_sequences_by_source) then recover the padding this curve
    exposes; together they quantify the packing win.  One map pass over
    token counts crossed with a 4-row literal frame (broadcast by
    construction), one 4-key aggregate — all integer."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_tok")
    )
    ls = spark.range(0).sparkSession.createDataFrame(
        [(512,), (1024,), (2048,), (4096,)], "ctx_len long"
    )
    kept = F.least(F.col("n_tok"), F.col("ctx_len"))
    return (
        t.crossJoin(F.broadcast(ls))
        .groupBy("ctx_len")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(kept).cast("long").alias("kept_tokens"),
            F.sum(F.greatest(F.col("n_tok") - F.col("ctx_len"), F.lit(0)))
            .cast("long")
            .alias("truncated_tokens"),
            F.sum(F.col("ctx_len") - kept)
            .cast("long")
            .alias("padding_tokens"),
        )
        .select(
            "ctx_len",
            "n_docs",
            "kept_tokens",
            "truncated_tokens",
            "padding_tokens",
            F.expr(
                "(10000 * kept_tokens) div (n_docs * ctx_len)"
            )
            .cast("long")
            .alias("utilization_x1e4"),
        )
        .orderBy("ctx_len")
    )


def _greedy_coverage_oracle(k: int = 5) -> str:
    """Unrolled twin of :func:`corpus.greedy_coverage_pick`: one CTE
    block per greedy round — per-doc uncovered-gram counts (grams of
    earlier picks and the picks themselves excluded), argmax with the
    (gain DESC, doc_id ASC) total order, covered-set union.  All exact
    integer counts over the same distinct 3-gram frame, so the pick
    sequence matches Spark's round loop exactly."""
    ctes = [
        r"""w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+')
             AS words FROM documents)""",
        """g AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(words) - 1),
                    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
               AS g
      FROM w WHERE len(words) >= 3)""",
        "r1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain"
        " FROM g GROUP BY doc_id)",
        "p1 AS (SELECT CAST(1 AS INTEGER) AS round, doc_id, gain FROM r1"
        " ORDER BY gain DESC, doc_id LIMIT 1)",
        "c1 AS (SELECT DISTINCT g.g FROM g JOIN p1 USING (doc_id))",
        "k1 AS (SELECT doc_id FROM p1)",
    ]
    for t in range(2, k + 1):
        p = t - 1
        ctes += [
            f"r{t} AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS gain"
            f" FROM g WHERE g.doc_id NOT IN (SELECT doc_id FROM k{p})"
            f" AND g.g NOT IN (SELECT g FROM c{p}) GROUP BY g.doc_id)",
            f"p{t} AS (SELECT CAST({t} AS INTEGER) AS round, doc_id, gain"
            f" FROM r{t} ORDER BY gain DESC, doc_id LIMIT 1)",
            f"c{t} AS (SELECT g FROM c{p} UNION"
            f" SELECT g.g FROM g JOIN p{t} USING (doc_id))",
            f"k{t} AS (SELECT doc_id FROM k{p} UNION ALL"
            f" SELECT doc_id FROM p{t})",
        ]
    unions = " UNION ALL ".join(f"SELECT * FROM p{t}" for t in range(1, k + 1))
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT round, doc_id, gain FROM ({unions}) ORDER BY round"
    )


@_register("corpus_greedy_coverage_pick", _greedy_coverage_oracle())
def corpus_greedy_coverage_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage subset selection
    (operators/corpus.py:greedy_coverage_pick): 5 deterministic greedy
    rounds, each taking the doc covering the most not-yet-covered
    3-grams (ties to the smallest doc_id) — the submodular
    data-selection recipe [Lin & Bilmes 2011] with its 1-1/e coverage
    guarantee.  Per round: one doc-keyed aggregate over the checkpointed
    gram frame anti-joined with the (broadcastable, k*grams-per-doc
    bounded) covered set + TakeOrdered(1); the k driver syncs are the
    parameter-server step.  The oracle unrolls the identical rounds."""
    return corpus.greedy_coverage_pick(_t(spark, sf_dir, "documents"), k=5)


_EQD_CONTRACT_SQL = """
    SELECT CAST(bin AS BIGINT) AS bin,
           (SELECT CAST(count(*) AS BIGINT) FROM {table}) AS n_total,
           1 AS boundary_rank_ok,
           1 AS partition_complete
    FROM range(1, 9) t(bin) ORDER BY bin
    """


@_register(
    "fn_histogram_equidepth_approx_contract",
    _EQD_CONTRACT_SQL.format(table="orders"),
)
def fn_histogram_equidepth_approx_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB swap ``fn_histogram_equidepth`` prices in prose, as a
    CODE PATH with an externally-checked contract (VERDICT r11 watch
    item #3; the pattern is ``aggx_approx_quantiles``):
    :func:`sketches.equidepth_approx_bins` — Greenwald-Khanna
    approx_percentile cutpoints + a broadcast k-row range join, two
    scans, zero global sort, no single-partition window.  Cutpoint
    VALUES are sketch-dependent (DuckDB's approx_quantile is a
    different sketch), so the oracle asserts the guarantee instead:
    per boundary, the tie-aware exact-rank bracket within
    n/accuracy + 1, plus the range join covering every row exactly
    once.  The exact twin (`fn_histogram_equidepth`) stays
    value-oracled; the bit-exact distributed ntile is
    ``corpus.global_ntile`` (audited by agg_two_phase_ntile_twin)."""
    return sketches.equidepth_approx_bins(
        _t(spark, sf_dir, "orders"), "o_totalprice", k=8
    )


@_register(
    "pack_length_buckets_approx_contract",
    _EQD_CONTRACT_SQL.format(table="documents"),
)
def pack_length_buckets_approx_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``pack_length_buckets``' documented 100 TB path on the TIE-HEAVY
    column (n_chars has a small integer domain, so duplicate cutpoints
    and duplicate blocks spanning bins are the norm, not the edge case)
    — exactly the regime where a naive |bin_count - n/k| band is WRONG
    and the lt/le rank bracket in
    :func:`sketches.equidepth_approx_bins` is the sketch's real
    guarantee.  Same contract columns as the orders twin."""
    return sketches.equidepth_approx_bins(
        _t(spark, sf_dir, "documents"), "n_chars", k=8
    )


@_register(
    "funnel_time_to_convert_approx_contract",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS vts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS pts
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.vts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    d AS (SELECT v.user_id FROM v JOIN p USING (user_id))
    SELECT CAST(bin AS BIGINT) AS bin,
           (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_total,
           1 AS boundary_rank_ok,
           1 AS partition_complete
    FROM range(1, 5) t(bin) ORDER BY bin
    """,
)
def funnel_time_to_convert_approx_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``funnel_time_to_convert``'s documented 100 TB path as a real
    contract-oracled code path (VERDICT r12 next #2 — the last
    exact-ntile row without an ``_approx_contract`` twin): the same
    converter delta frame (first view -> first qualifying purchase, two
    user-keyed pre-aggregations), but the quartile cut comes from
    :func:`sketches.equidepth_approx_bins` with k=4 — Greenwald-Khanna
    cutpoints + a broadcast 4-row range join, zero global sort, no
    single-partition window — instead of ``ntile(4)`` over one total
    ordering.  Cutpoint VALUES are sketch-dependent, so the oracle
    asserts the guarantee: the tie-aware lt/le exact-rank bracket at
    each quartile boundary within n/accuracy + 1, and the range join
    covering every converter exactly once.  The exact twin stays
    value-oracled for sub-TB runs."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .alias("e")
        .join(v.alias("v"), "user_id")
        .filter(F.col("e.ts") > F.col("v.vts"))
        .groupBy("user_id")
        .agg(F.min("e.ts").alias("pts"))
    )
    d = v.join(p, "user_id").select(
        (F.col("pts").cast("long") - F.col("vts").cast("long")).alias(
            "delta_s"
        )
    )
    return sketches.equidepth_approx_bins(d, "delta_s", k=4)


@_register(
    "media_audio_silence_segments",
    """
    WITH ids AS (SELECT doc_id AS m FROM documents WHERE doc_id % 3 = 1),
    dims AS (SELECT m, 160 + m % 101 AS n FROM ids),
    smp AS (
      SELECT d.m, d.n, ui.i,
             abs(((d.m * 40503 + ui.i * 2654435761) % 65536) - 32768) AS a
      FROM dims d, UNNEST(range(d.n)) AS ui(i)
    ),
    wins AS (
      SELECT m, any_value(n) AS n, (i * 64) // n AS w,
             sum(a) AS s, count(*) AS c
      FROM smp GROUP BY m, (i * 64) // n
    ),
    ems AS (SELECT m, w AS idx, s // c AS em FROM wins),
    tot AS (SELECT m, sum(em) AS t FROM ems GROUP BY m),
    sil AS (
      SELECT e.m, e.idx,
             CASE WHEN 512 * e.em < 7 * t.t THEN 1 ELSE 0 END AS b
      FROM ems e JOIN tot t USING (m)
    ),
    grp AS (
      SELECT m, idx, b,
             idx - row_number() OVER (PARTITION BY m, b ORDER BY idx) AS g
      FROM sil
    ),
    runs AS (
      SELECT m, count(*) AS run_len FROM grp WHERE b = 1 GROUP BY m, g
    ),
    per_m AS (
      SELECT m, count(*) AS n_segments, sum(run_len) AS n_silent,
             max(run_len) AS longest
      FROM runs GROUP BY m
    )
    SELECT d.m AS media_id, CAST(d.n AS INTEGER) AS n_samples,
           CAST(coalesce(p.n_silent, 0) AS INTEGER) AS n_silent,
           CAST(coalesce(p.n_segments, 0) AS INTEGER) AS n_segments,
           CAST(coalesce(p.longest, 0) AS INTEGER) AS longest_run
    FROM dims d LEFT JOIN per_m p ON d.m = p.m
    ORDER BY media_id
    """,
)
def media_audio_silence_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Silence segmentation over REAL WAV containers
    (operators/multimodal.py:audio_silence_segments): decode the PCM16
    frames, mark each of the 64 energy windows silent when its mean
    magnitude falls below 7/8 of the clip's window-mean (division-free
    512*em < 7*total), and fold the run-length profile — silent-window
    count, maximal-run segment count, longest run — the VAD trim/split
    gate an audio-ingest pipeline applies before transcription or
    training.  Zero-shuffle mapInPandas pass, 4 ints per clip; the
    oracle recomputes every sample from the generative waveform and the
    identical islands-and-gaps run-length fold, so all three
    segmentation values verify bit for bit."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    media = multimodal.synthesize_media(docs, real_media=True)
    return multimodal.audio_silence_segments(media).orderBy("media_id")


@_register(
    "corpus_token_budget_waterfill",
    r"""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
               AS cap
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(cap) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS k FROM tok),
    ord AS (
      SELECT source, cap,
             CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS i,
             CAST(coalesce(sum(cap) OVER (ORDER BY cap, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS pfxp,
             CAST(coalesce(lag(cap) OVER (ORDER BY cap, source), 0)
               AS BIGINT) AS prev_cap
      FROM tok
    ),
    cand AS (
      SELECT o.*, t.total // 2 AS budget,
             (t.total // 2 - o.pfxp) // (t.k - o.i + 1) AS t_cand
      FROM ord o, tot t
    ),
    lvl AS (SELECT max(t_cand) AS level FROM cand
            WHERE t_cand >= prev_cap AND t_cand < cap),
    mx AS (SELECT max(cap) AS maxcap FROM tok)
    SELECT c.source, c.cap AS cap_tokens,
           CAST(least(c.cap, coalesce(l.level, m.maxcap)) AS BIGINT)
             AS alloc_tokens,
           CAST((10000 * least(c.cap, coalesce(l.level, m.maxcap))) // c.cap
             AS BIGINT) AS keep_x1e4,
           CAST(coalesce(l.level, m.maxcap) AS BIGINT) AS water_level,
           c.budget
    FROM cand c, lvl l, mx m ORDER BY c.source
    """,
)
def corpus_token_budget_waterfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact integer water-filling token-budget allocation
    (operators/corpus.py:token_budget_waterfill): per-source quotas for
    a budget of half the corpus tokens — small sources taken whole,
    large ones clipped to the common water level, the equalizing rule
    data-constrained mixing schedules start from.  The level comes from
    the closed-form bracket candidates over the sorted capacity frame
    (fuzz-pinned against brute force), not a search loop: one
    data-sized word-count aggregate, then dimension-sized frames only."""
    return corpus.token_budget_waterfill(
        _t(spark, sf_dir, "documents"), budget_num=1, budget_den=2
    )


#: Topic keyword dictionary for corpus_topic_tagging — driver-side literal
#: injected into BOTH engines (the oracle-parity playbook), standing in for
#: the domain taxonomies (FlashText/Aho-Corasick gazetteer lists) crawl
#: pipelines tag with.  Words may belong to one topic only here; the op
#: itself supports multi-topic words (the join simply fans out).
_TOPIC_DICT: list[tuple[str, str]] = [
    ("join", "joins"), ("merge", "joins"), ("hash", "joins"),
    ("key", "joins"),
    ("scan", "scans"), ("filter", "scans"), ("column", "scans"),
    ("row", "scans"), ("table", "scans"),
    ("stream", "streaming"), ("window", "streaming"),
    ("batch", "streaming"), ("fast", "streaming"),
    ("agg", "aggregation"), ("group", "aggregation"),
    ("sort", "aggregation"), ("order", "aggregation"),
    ("value", "aggregation"),
]

_TOPIC_VALUES_SQL = ", ".join(f"('{w}', '{t}')" for w, t in _TOPIC_DICT)


@_register(
    "corpus_topic_tagging",
    rf"""
    WITH dict(word, topic) AS (VALUES {_TOPIC_VALUES_SQL}),
    words AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
      FROM documents
    ),
    hits AS (
      SELECT w.doc_id, d.topic, CAST(count(*) AS BIGINT) AS n_hits
      FROM words w JOIN dict d USING (word)
      GROUP BY w.doc_id, d.topic
    ),
    top AS (
      SELECT doc_id, topic,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY n_hits DESC, topic) AS rn
      FROM hits
    ),
    per_topic AS (
      SELECT topic, CAST(count(*) AS BIGINT) AS n_docs_tagged,
             CAST(sum(n_hits) AS BIGINT) AS total_hits
      FROM hits GROUP BY topic
    ),
    top_topic AS (
      SELECT topic, CAST(count(*) AS BIGINT) AS n_docs_top
      FROM top WHERE rn = 1 GROUP BY topic
    ),
    topics AS (SELECT DISTINCT topic FROM dict)
    SELECT t.topic,
           CAST(coalesce(p.n_docs_tagged, 0) AS BIGINT) AS n_docs_tagged,
           CAST(coalesce(p.total_hits, 0) AS BIGINT) AS total_hits,
           CAST(coalesce(x.n_docs_top, 0) AS BIGINT) AS n_docs_top
    FROM topics t
    LEFT JOIN per_topic p USING (topic)
    LEFT JOIN top_topic x USING (topic)
    ORDER BY t.topic
    """,
)
def corpus_topic_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer topic tagging — the broadcast-dictionary keyword pass
    (the distributed shape of FlashText / Aho-Corasick corpus taggers)
    that labels every document with domain topics for mixing and
    reporting: explode words once, equi-join the BROADCAST dictionary
    (dimension-sized, never shuffled), fold per-(doc, topic) hit counts,
    and pick each doc's argmax topic with a deterministic (hits desc,
    topic) tie-break — a per-doc window, so the partition key is the
    document, never the corpus.  Output: per topic, tagged-doc count,
    total hits, and argmax-winner count, with never-winning topics kept
    at 0 via the dictionary frame."""
    docs = _t(spark, sf_dir, "documents")
    dic = spark.createDataFrame(_TOPIC_DICT, "word string, topic string")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"),
    )
    hits = (
        words.join(F.broadcast(dic), "word")
        .groupBy("doc_id", "topic")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    top = (
        hits.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("n_hits").desc(), "topic"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .groupBy("topic")
        .agg(F.count("*").cast("long").alias("n_docs_top"))
    )
    per_topic = hits.groupBy("topic").agg(
        F.count("*").cast("long").alias("n_docs_tagged"),
        F.sum("n_hits").cast("long").alias("total_hits"),
    )
    topics = dic.select("topic").distinct()
    return (
        topics.join(per_topic, "topic", "left")
        .join(top, "topic", "left")
        .select(
            "topic",
            F.coalesce("n_docs_tagged", F.lit(0)).cast("long").alias(
                "n_docs_tagged"
            ),
            F.coalesce("total_hits", F.lit(0)).cast("long").alias(
                "total_hits"
            ),
            F.coalesce("n_docs_top", F.lit(0)).cast("long").alias(
                "n_docs_top"
            ),
        )
        .orderBy("topic")
    )


#: code-keyword lexicon for text_code_detect (shared literal, both engines)
_CODE_KWS = (
    "join", "scan", "sort", "merge", "filter", "group", "table", "query",
)
_CODE_KWS_SQL = ", ".join(f"'{w}'" for w in _CODE_KWS)


@_register(
    "text_code_detect",
    rf"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
               AS n_words,
             CAST(len(list_filter(
               regexp_split_to_array(lower(text), '\s+'),
               w -> w IN ({_CODE_KWS_SQL}))) AS BIGINT) AS kw_hits,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT doc_id, n_words, kw_hits,
           CAST((10000 * kw_hits) // n_words AS BIGINT) AS kw_density_x1e4,
           CAST((100 * n_chars) // n_words AS BIGINT) AS avg_wordlen_x100,
           CASE WHEN 3 * kw_hits >= n_words THEN 1 ELSE 0 END AS is_code
    FROM t ORDER BY doc_id
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing gate — the heuristic classifier an LLM
    pipeline uses to split a mixed crawl into code and natural-language
    streams before separate quality gates and mixing weights (the
    StarCoder/Stack-style triage reduced to its division-free core):
    per-doc lexicon-keyword density (here the corpus' query-language
    keywords stand in for `def`/`return`/`;`) plus average word length,
    gated by the integer comparison 3*kw_hits >= n_words.

    Scale shape: a single higher-order-function pass — `filter()` over
    the split array with an IN-list lambda, evaluated inside
    whole-stage codegen; no explode, no join, no shuffle, zero Python.
    At 100 TB this fuses into the scan like the Gopher gate does."""
    docs = _t(spark, sf_dir, "documents")
    arr = F.split(F.lower(F.col("text")), r"\s+")
    in_list = ", ".join(f"'{w}'" for w in _CODE_KWS)
    kw_hits = F.expr(
        rf"size(filter(split(lower(text), '\\s+'), w -> w IN ({in_list})))"
    ).cast("long")
    t = docs.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_words"),
        kw_hits.alias("kw_hits"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return t.select(
        "doc_id",
        "n_words",
        "kw_hits",
        F.expr("(10000 * kw_hits) div n_words")
        .cast("long")
        .alias("kw_density_x1e4"),
        F.expr("(100 * n_chars) div n_words")
        .cast("long")
        .alias("avg_wordlen_x100"),
        F.when(3 * F.col("kw_hits") >= F.col("n_words"), 1)
        .otherwise(0)
        .alias("is_code"),
    ).orderBy("doc_id")


@_register(
    "corpus_lang_gini",
    """
    WITH g AS (
      SELECT 'lang' AS dim, lang AS grp, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY lang
      UNION ALL
      SELECT 'source' AS dim, source AS grp, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY source
    ),
    r AS (
      SELECT dim, c,
             CAST(row_number() OVER (PARTITION BY dim ORDER BY c, grp)
               AS BIGINT) AS i
      FROM g
    )
    SELECT dim, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(c) AS BIGINT) AS total_docs,
           CAST((10000 * (2 * sum(i * c) - (count(*) + 1) * sum(c)))
                // (count(*) * sum(c)) AS BIGINT) AS gini_x1e4
    FROM r GROUP BY dim ORDER BY dim
    """,
)
def corpus_lang_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-concentration audit: the Gini coefficient of the document
    distribution over languages and over sources — the one-number
    imbalance score a multilingual data card reports (0 = perfectly
    even mix, ->1 = one group owns the corpus), computed exactly from
    the rank identity G = (2*sum(i*c_i) - (k+1)*sum(c)) / (k*sum(c))
    over ascending-sorted group counts with a deterministic (count,
    group) tie-break, floor-quantized x1e4.

    Scale shape: two group-count aggregates (the only data-sized
    exchanges) union into a DIMENSION-SIZED frame (#langs + #sources
    rows); the rank window partitions by dimension over that tiny
    frame — never over data."""
    docs = _t(spark, sf_dir, "documents")
    g = (
        docs.groupBy(F.col("lang").alias("grp"))
        .agg(F.count("*").cast("long").alias("c"))
        .select(F.lit("lang").alias("dim"), "grp", "c")
        .unionByName(
            docs.groupBy(F.col("source").alias("grp"))
            .agg(F.count("*").cast("long").alias("c"))
            .select(F.lit("source").alias("dim"), "grp", "c")
        )
    )
    r = g.select(
        "dim",
        "c",
        F.row_number()
        .over(Window.partitionBy("dim").orderBy("c", "grp"))
        .cast("long")
        .alias("i"),
    )
    return (
        r.groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("c").cast("long").alias("total_docs"),
            F.sum(F.col("i") * F.col("c")).alias("_sic"),
        )
        .select(
            "dim",
            "n_groups",
            "total_docs",
            F.expr(
                "(10000 * (2 * _sic - (n_groups + 1) * total_docs))"
                " div (n_groups * total_docs)"
            )
            .cast("long")
            .alias("gini_x1e4"),
        )
        .orderBy("dim")
    )


@_register(
    "pack_chunk_boundary_stats",
    r"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents),
    offs AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS start_offset
      FROM toks),
    x AS (
      SELECT source, n_tokens,
             (start_offset + n_tokens - 1) // 512 - start_offset // 512
               AS crossings
      FROM offs)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST((sum(n_tokens) + 511) // 512 AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN crossings > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_crossing_docs,
           CAST(sum(crossings) AS BIGINT) AS total_crossings,
           CAST((10000 * sum(CASE WHEN crossings > 0 THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS crossing_rate_x1e4
    FROM x GROUP BY source ORDER BY source
    """,
)
def pack_chunk_boundary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-boundary fragmentation audit of GPT-style concat-and-chunk
    packing — the third leg of the packing family: where
    ``pack_context_length_curve`` prices truncation and
    ``pack_sequences_by_source`` assigns the packs, this measures how
    many documents each 512-token chunking SPLITS across a boundary
    (the attention-contamination / fragmentation cost packing papers
    weigh against padding): a doc spanning [start, start+n) crosses
    end_chunk - start_chunk boundaries, exactly.

    Plan: reuses pack_sequences' per-source window cumsum (partitioned
    by source, never a global sort) + one source-keyed aggregate — all
    integer, bit-identical cross-engine."""
    packed = packing.pack_sequences(
        _t(spark, sf_dir, "documents"), budget=512
    )
    x = packed.select(
        "source",
        "n_tokens",
        (
            F.expr("(start_offset + n_tokens - 1) div 512")
            - F.expr("start_offset div 512")
        ).alias("crossings"),
    )
    crossing = (F.col("crossings") > 0).cast("long")
    return (
        x.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(crossing).cast("long").alias("n_crossing_docs"),
            F.sum("crossings").cast("long").alias("total_crossings"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr("(total_tokens + 511) div 512")
            .cast("long")
            .alias("n_chunks"),
            "n_crossing_docs",
            "total_crossings",
            F.expr("(10000 * n_crossing_docs) div n_docs")
            .cast("long")
            .alias("crossing_rate_x1e4"),
        )
        .orderBy("source")
    )


@_register(
    "corpus_shuffle_locality_audit",
    """
    WITH h AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 16 AS shard,
             CAST(concat('0x', substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS order_h
      FROM documents
    ),
    adj AS (
      SELECT shard, source,
             lag(source) OVER (PARTITION BY shard ORDER BY order_h, doc_id)
               AS prev_shuffled,
             lag(source) OVER (PARTITION BY shard ORDER BY doc_id)
               AS prev_idorder
      FROM h
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN source = prev_shuffled THEN 1 ELSE 0 END)
                AS BIGINT) AS adj_same_shuffled,
           CAST(sum(CASE WHEN source = prev_idorder THEN 1 ELSE 0 END)
                AS BIGINT) AS adj_same_idorder
    FROM adj GROUP BY shard ORDER BY shard
    """,
)
def corpus_shuffle_locality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shuffle-quality audit of the training order — does the
    deterministic shard shuffle actually BREAK source runs?  Training
    on source-clustered batches measurably hurts (the reason loaders
    shuffle at all); this audit counts, per shard, adjacent same-source
    pairs under the hash-shuffled read order vs under raw doc_id order,
    so a data card can show the shuffle brought locality down to the
    ~sum(p_s^2) independence rate.  Same hash family and shard/order
    derivation as ``corpus_shard_assignments`` (the audit audits THE
    shuffle the loader uses, not a lookalike).

    Plan: one exchange on the shard key (identical to the shard write
    partitioning), two lag frames over the same per-shard ordering, one
    shard-keyed aggregate — no global sort, no Python."""
    docs = _t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.pmod(
            dedup.md5_hash60(F.col("doc_id").cast("string")), F.lit(16)
        ).alias("shard"),
        dedup.md5_hash60(
            F.concat(F.lit("order:"), F.col("doc_id").cast("string"))
        ).alias("order_h"),
    )
    w_shuf = Window.partitionBy("shard").orderBy("order_h", "doc_id")
    w_id = Window.partitionBy("shard").orderBy("doc_id")
    adj = h.select(
        "shard",
        "source",
        F.lag("source").over(w_shuf).alias("prev_shuffled"),
        F.lag("source").over(w_id).alias("prev_idorder"),
    )
    return (
        adj.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                (F.col("source") == F.col("prev_shuffled")).cast("long")
            )
            .cast("long")
            .alias("adj_same_shuffled"),
            F.sum(
                (F.col("source") == F.col("prev_idorder")).cast("long")
            )
            .cast("long")
            .alias("adj_same_idorder"),
        )
        .orderBy("shard")
    )


def _rm3_oracle() -> str:
    """RM3 oracle composed ON the registered BM25 oracle (same CTE text,
    so the two rows can never drift apart): top-10 of the proven top-20
    ordering supplies the rank weights."""
    bm25_sql = QUERIES["search_bm25_topk"].oracle
    return rf"""
    WITH bm AS ({bm25_sql}),
    ranked AS (
      SELECT doc_id,
             CAST(11 - row_number() OVER (ORDER BY bm25 DESC, doc_id)
               AS BIGINT) AS relw
      FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10)
    ),
    toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
      FROM documents
    ),
    joined AS (
      SELECT t.doc_id, t.term, r.relw
      FROM toks t JOIN ranked r USING (doc_id)
      WHERE length(t.term) > 0
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
             any_value(relw) AS relw
      FROM joined GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM joined GROUP BY doc_id),
    addends AS (
      SELECT t.term,
             CAST(floor(t.tf * t.relw * 1000000.0 / d.dl) AS BIGINT) AS w_fp
      FROM tf t JOIN dl d USING (doc_id)
      WHERE t.term NOT IN ('vector', 'join', 'stream')
    )
    SELECT term, CAST(sum(w_fp) AS BIGINT) AS weight_x1e6
    FROM addends GROUP BY term
    ORDER BY weight_x1e6 DESC, term LIMIT 8
    """


@_register("search_rm3_expansion", _rm3_oracle())
def search_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance-feedback query expansion
    (operators/text.py:rm3_expansion_terms) for the standing query
    {vector, join, stream}: rank-weighted term pooling over the BM25
    top-10, exact-integer 1e6 fixed point, top-8 new terms — the
    second-pass retrieval step that closes the search family
    (BM25 -> RRF hybrid -> RM3 expansion).  The relevance weights come
    from bm25_topk's PROVEN bit-identical total order, so the whole
    chain stays value-oracled; the oracle SQL is composed on the
    registered BM25 CTE text itself."""
    return text.rm3_expansion_terms(
        _t(spark, sf_dir, "documents"),
        ["vector", "join", "stream"],
        k_docs=10,
        k_terms=8,
    )


@_register(
    "pref_bradley_terry_strength",
    r"""
    WITH m AS (
      SELECT CAST(json_extract_string(a.props, '$.k') AS BIGINT) % 4 AS pa,
             CAST(json_extract_string(b.props, '$.k') AS BIGINT) % 4 AS pb,
             a.value AS va, b.value AS vb
      FROM events a JOIN events b ON b.event_id = a.event_id + 1
    ),
    mm AS (SELECT pa, pb, CASE WHEN va >= vb THEN pa ELSE pb END AS w
           FROM m WHERE pa <> pb),
    wins AS (SELECT w AS p, CAST(count(*) AS BIGINT) AS n_wins
             FROM mm GROUP BY w),
    pairs AS (SELECT pa AS i, pb AS j FROM mm
              UNION ALL SELECT pb, pa FROM mm),
    nij AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n
            FROM pairs GROUP BY i, j),
    nmat AS (SELECT i AS p, CAST(sum(n) AS BIGINT) AS n_matches
             FROM nij GROUP BY i),
    r1d AS (SELECT i, CAST(sum(CAST(floor(n * 1000000000000.0
                     / (1000000 + 1000000)) AS BIGINT)) AS BIGINT) AS d
            FROM nij GROUP BY i),
    s1 AS (SELECT w.p,
                  CAST(floor(w.n_wins * 1000000000000.0 / d.d) AS BIGINT) AS s
           FROM wins w JOIN r1d d ON w.p = d.i),
    r2d AS (SELECT n.i, CAST(sum(CAST(floor(n.n * 1000000000000.0
                     / (si.s + sj.s)) AS BIGINT)) AS BIGINT) AS d
            FROM nij n JOIN s1 si ON n.i = si.p JOIN s1 sj ON n.j = sj.p
            GROUP BY n.i),
    s2 AS (SELECT w.p,
                  CAST(floor(w.n_wins * 1000000000000.0 / d.d) AS BIGINT) AS s
           FROM wins w JOIN r2d d ON w.p = d.i)
    SELECT w.p AS player, w.n_wins, nm.n_matches,
           s1.s AS s1_x1e6, s2.s AS s2_x1e6
    FROM wins w JOIN nmat nm ON w.p = nm.p
    JOIN s1 ON w.p = s1.p JOIN s2 ON w.p = s2.p
    ORDER BY player
    """,
)
def pref_bradley_terry_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bradley-Terry strength fit over pairwise preference outcomes —
    the reward-model data audit an RLHF pipeline runs on its comparison
    set (does annotator/policy X systematically beat Y, and by how
    much): two unrolled rounds of the MM fixed point [Hunter 2004]
    s_i <- wins_i / sum_j n_ij / (s_i + s_j), in exact int64 1e6 fixed
    point (per-term floor at 1e12 scale; every product stays under
    2^53, so both engines floor identical IEEE quotients).  Matches are
    adjacent event pairs (an EQUI self-join on event_id+1 — hash
    partitioned, never a window over the global order), players the
    JSON payload key mod 4, winner the higher value (ties to the
    earlier event's player, deterministically).

    Scale shape: one data-sized equi self-join + one match aggregate;
    wins / n_ij / both MM rounds all live on the PLAYERS-SQUARED frame
    (dimension-sized), so extra rounds cost joins of tiny frames, not
    data passes."""
    ev = _t(spark, sf_dir, "events")
    pk = lambda c: (
        F.get_json_object(c, "$.k").cast("long") % 4
    )  # noqa: E731
    a = ev.select(
        (F.col("event_id") + 1).alias("jk"),
        pk(F.col("props")).alias("pa"),
        F.col("value").alias("va"),
    )
    b = ev.select(
        F.col("event_id").alias("jk"),
        pk(F.col("props")).alias("pb"),
        F.col("value").alias("vb"),
    )
    mm = (
        a.join(b, "jk")
        .filter(F.col("pa") != F.col("pb"))
        .select(
            "pa",
            "pb",
            F.when(F.col("va") >= F.col("vb"), F.col("pa"))
            .otherwise(F.col("pb"))
            .alias("w"),
        )
    )
    # Fold the match stream to its sufficient statistic ONCE (r15, guide
    # §2.4/§3.3): every downstream frame (wins, n_ij, both MM rounds) is
    # an aggregate of (pa, pb, w) COUNTS, so one players^3-sized count
    # frame (<= 4*4*2 rows) carries everything.  Without it the lazy plan
    # re-derived the events self-join once per consumer — the physical
    # plan held 6 copies of the data-sized join (66 Exchanges, and the
    # row's bench samples grew 3.3 -> 22 s across same-session reruns);
    # with the checkpoint the self-join runs exactly once per execution.
    # Values are identical: wins/nij below are the same sums regrouped.
    mc = (
        mm.groupBy("pa", "pb", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    wins = mc.groupBy(F.col("w").alias("p")).agg(
        F.sum("cnt").cast("long").alias("n_wins")
    )
    pairs = mc.select(
        F.col("pa").alias("i"), F.col("pb").alias("j"), "cnt"
    ).unionByName(
        mc.select(F.col("pb").alias("i"), F.col("pa").alias("j"), "cnt")
    )
    nij = pairs.groupBy("i", "j").agg(F.sum("cnt").cast("long").alias("n"))
    nmat = nij.groupBy(F.col("i").alias("p")).agg(
        F.sum("n").cast("long").alias("n_matches")
    )
    term = lambda s_sum: F.floor(  # noqa: E731
        F.col("n") * 1000000000000.0 / s_sum
    ).cast("long")
    r1d = nij.groupBy("i").agg(
        F.sum(term(F.lit(2000000))).cast("long").alias("d")
    )
    news = lambda d_frame: (  # noqa: E731
        wins.join(d_frame, wins.p == d_frame.i)
        .select(
            "p",
            F.floor(F.col("n_wins") * 1000000000000.0 / F.col("d"))
            .cast("long")
            .alias("s"),
        )
    )
    s1 = news(r1d)
    si = s1.select(F.col("p").alias("i"), F.col("s").alias("s_i"))
    sj = s1.select(F.col("p").alias("j"), F.col("s").alias("s_j"))
    r2d = (
        nij.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .groupBy("i")
        .agg(
            F.sum(term(F.col("s_i") + F.col("s_j")))
            .cast("long")
            .alias("d")
        )
    )
    s2 = news(r2d)
    return (
        wins.join(nmat, "p")
        .join(s1.withColumnRenamed("s", "s1_x1e6"), "p")
        .join(s2.withColumnRenamed("s", "s2_x1e6"), "p")
        .select(
            F.col("p").alias("player"),
            "n_wins",
            "n_matches",
            "s1_x1e6",
            "s2_x1e6",
        )
        .orderBy("player")
    )


@_register(
    "fn_percentiles_two_phase",
    """
    WITH hist AS (
      SELECT value AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY value
    ),
    cum AS (
      SELECT v, CAST(sum(cnt) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM hist
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist)
    SELECT t.n,
           min(CASE WHEN 100 * c.c >= 50 * t.n THEN c.v END) AS p50,
           min(CASE WHEN 100 * c.c >= 90 * t.n THEN c.v END) AS p90,
           min(CASE WHEN 100 * c.c >= 99 * t.n THEN c.v END) AS p99
    FROM cum c, tot t GROUP BY t.n
    """,
)
def fn_percentiles_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global discrete percentiles WITHOUT a global sort — the
    scale-safe sibling of ``fn_percentiles`` and the bit-exact
    counterpart of the approx-contract rows, by the same move that fixed
    text_zipf_fit: aggregate the DISTINCT-VALUE histogram (one exchange
    on the value key), cumulative-sum over it (a window whose input is
    the value DOMAIN, not the data — events.value is 2-decimal-bounded,
    like ages, prices, scores, token counts in practice), and read each
    percentile as the smallest value whose cumulative count passes the
    division-free threshold 100*cum >= p*n (percentile_disc's
    lower-bound convention, exact integers both sides).  Where the
    domain is unbounded, the approx path
    (``fn_histogram_equidepth_approx_contract``) takes over; between
    them the exact-ntile rows' docstring price is now a choice, not a
    cost."""
    ev = _t(spark, sf_dir, "events")
    hist = ev.groupBy(F.col("value").alias("v")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    cum = hist.select(
        "v",
        F.sum("cnt")
        .over(
            Window.orderBy("v").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long")
        .alias("c"),
    )
    tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
    j = cum.crossJoin(F.broadcast(tot))

    def q(p: int):
        return F.min(
            F.when(100 * F.col("c") >= p * F.col("n"), F.col("v"))
        ).alias(f"p{p}")

    return j.groupBy("n").agg(q(50), q(90), q(99))


def _lang_confusion_oracle() -> str:
    """Confusion-matrix oracle composed ON the registered lang-predict
    oracle text (same drift-proofing as the RM3 row)."""
    pred_sql = QUERIES["text_lang_predict"].oracle
    return f"""
    WITH pred AS ({pred_sql})
    SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.lang_pred
    ORDER BY d.lang, p.lang_pred
    """


@_register("text_lang_confusion", _lang_confusion_oracle())
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix — the quality audit OF the
    language-ID gate itself (every multilingual curation report ships
    one): the marker-score predictions of ``text_lang_predict`` joined
    back to the labeled lang column, counted per (actual, predicted)
    pair.  The join is on doc_id between two scans of the same table —
    at 100 TB the predict columns fuse into the label scan (one pass,
    no join at all when computed inline; kept as the composed form here
    so the oracle reuses the registered predict SQL verbatim and the
    two rows cannot drift)."""
    docs = _t(spark, sf_dir, "documents")
    pred = QUERIES["text_lang_predict"].spark(spark, sf_dir)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("lang", "lang_pred")
    )


@_register(
    "text_novelty_decay_curve",
    r"""
    WITH mm AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
    w AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS words
      FROM documents
    ),
    gi AS (
      SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
      FROM w WHERE len(words) >= 3
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS gram
      FROM gi
    ),
    bg AS (
      SELECT DISTINCT ((g.doc_id - mm.mn) * 10) // (mm.mx - mm.mn + 1) AS batch,
             g.gram
      FROM grams g CROSS JOIN mm
    ),
    fb AS (SELECT gram, min(batch) AS first_batch FROM bg GROUP BY gram),
    pb AS (
      SELECT b.batch, CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN f.first_batch = b.batch THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel_types
      FROM bg b JOIN fb f USING (gram) GROUP BY b.batch
    ),
    nd AS (
      SELECT ((d.doc_id - mm.mn) * 10) // (mm.mx - mm.mn + 1) AS batch,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents d CROSS JOIN mm GROUP BY 1
    )
    SELECT pb.batch, nd.n_docs, pb.n_types, pb.n_novel_types,
           CAST(pb.n_novel_types * 10000 // pb.n_types AS BIGINT) / 10000.0
             AS novelty
    FROM pb JOIN nd USING (batch) ORDER BY pb.batch
    """,
)
def text_novelty_decay_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty decay per ingestion batch
    (operators/text.py:novelty_decay_curve, VERDICT r11 next #8): the
    corpus in 10 equal-width doc_id bands; per band, the fraction of its
    distinct word-trigram vocabulary whose FIRST band is this one — the
    is-further-crawling-worth-it curve, the batch-level twin of
    ``text_novelty_first_owner``.  Same linear plan: one gram-key
    repartition rides the (batch, gram) dedup AND the min-batch window
    (subset partitioning), then a 10-row batch aggregate; band ids come
    from a broadcast 1-row min/max frame, no global sort.  Exact integer
    division everywhere."""
    return text.novelty_decay_curve(_t(spark, sf_dir, "documents"))


def _loss_proxy_calibration_oracle() -> str:
    """Calibration oracle composed ON the registered bigram-bits and
    filter-gate oracle texts (the lang-confusion/RM3 drift-proofing
    pattern: the consumed rows and this audit cannot diverge)."""
    bits_sql = QUERIES["text_bigram_lm_bits"].oracle
    gate_sql = QUERIES["corpus_filter_gate"].oracle
    return f"""
    WITH bits AS ({bits_sql}),
    gate AS ({gate_sql})
    SELECT d.source,
           CAST(b.bits_sum // b.n_bigrams AS BIGINT) AS proxy_bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(g.keep) AS BIGINT) AS n_keep,
           CAST(sum(g.keep) * 10000 // count(*) AS BIGINT) / 10000.0
             AS keep_rate
    FROM documents d JOIN bits b USING (doc_id) JOIN gate g USING (doc_id)
    GROUP BY d.source, proxy_bin
    ORDER BY d.source, proxy_bin
    """


@_register("corpus_loss_proxy_calibration", _loss_proxy_calibration_oracle())
def corpus_loss_proxy_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source loss-proxy calibration curve (VERDICT r11 next #8): is
    the bigram-LM surprise proxy — the signal DoReMi-style reweighting
    consumes downstream — actually PREDICTIVE of curation quality, per
    source?  Docs bucket into whole-bit surprise bins (exact integer
    division of the registered ``text_bigram_lm_bits`` columns, no new
    thresholds) and each (source, bin) cell reports its
    ``corpus_filter_gate`` keep-rate.  A calibrated proxy shows keep_rate
    falling monotonically with proxy_bin within every source; a source
    whose curve is flat gets no signal from the proxy and its DoReMi
    weight is noise — the audit every learned-weight pipeline ships.

    Plan shape: both consumed rows are registered queries reused verbatim
    (their plans: one bigram exchange; one doc-keyed repetition
    aggregate); this row adds two doc_id equi-joins (AQE broadcasts the
    gate side's 2-column frame) and a (source x bin)-sized final
    aggregate — dimension-sized output, no new data-shaped stage."""
    docs = _t(spark, sf_dir, "documents")
    bits = QUERIES["text_bigram_lm_bits"].spark(spark, sf_dir)
    gate = QUERIES["corpus_filter_gate"].spark(spark, sf_dir)
    return (
        docs.select("doc_id", "source")
        .join(bits.select("doc_id", "bits_sum", "n_bigrams"), "doc_id")
        .join(gate.select("doc_id", "keep"), "doc_id")
        .select("source", F.expr("bits_sum div n_bigrams").alias("proxy_bin"), "keep")
        .groupBy("source", "proxy_bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").cast("long").alias("n_keep"),
        )
        .select(
            "source",
            "proxy_bin",
            "n_docs",
            "n_keep",
            (F.expr("n_keep * 10000 div n_docs") / F.lit(10000.0)).alias("keep_rate"),
        )
        .orderBy("source", "proxy_bin")
    )


def _gate_kappa_oracle() -> str:
    """Kappa oracle composed ON the registered gopher-gate and
    quantile-gate oracle texts (the loss-proxy/lang-confusion
    drift-proofing pattern: the audited gates and this audit cannot
    diverge)."""
    g1 = QUERIES["text_gopher_gate"].oracle
    g2 = QUERIES["corpus_quality_quantile_gate"].oracle
    return f"""
    WITH gop AS ({g1}),
    qg AS ({g2}),
    j AS (
      SELECT d.lang, gop.keep AS k1,
             CASE WHEN qg.doc_id IS NULL THEN 0 ELSE 1 END AS k2
      FROM documents d
      JOIN gop ON gop.doc_id = d.doc_id
      LEFT JOIN qg ON qg.doc_id = d.doc_id),
    c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k1 * k2) AS BIGINT) AS both_keep,
             CAST(sum(k1 * (1 - k2)) AS BIGINT) AS gopher_only,
             CAST(sum((1 - k1) * k2) AS BIGINT) AS quantile_only,
             CAST(sum((1 - k1) * (1 - k2)) AS BIGINT) AS both_drop
      FROM j GROUP BY lang),
    p AS (
      SELECT *,
             (both_keep + gopher_only) * (both_keep + quantile_only)
             + (quantile_only + both_drop) * (gopher_only + both_drop)
               AS pe_num
      FROM c)
    SELECT lang, n, both_keep, gopher_only, quantile_only, both_drop,
           CASE WHEN n * n = pe_num THEN 0.0
                ELSE CAST(n * (both_keep + both_drop) - pe_num AS DOUBLE)
                     / (n * n - pe_num) END AS kappa
    FROM p ORDER BY lang
    """


@_register("dq_gate_agreement_kappa", _gate_kappa_oracle())
def dq_gate_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-gate agreement (Cohen's kappa) per language between the two
    quality curation gates the catalog ships — the rule-based
    ``text_gopher_gate`` and the relative-threshold
    ``corpus_quality_quantile_gate``.  Every multi-gate curation
    pipeline ships this audit: raw percent agreement is inflated when
    both gates keep almost everything, so kappa subtracts the
    chance-agreement floor computed from each gate's keep marginal.
    A language where the gates agree no better than chance (kappa near
    0) means the ensemble's AND/OR combination is doing real work
    there; kappa near 1 means one gate is redundant.

    Both consumed rows are registered queries reused verbatim (their
    oracle texts compose as CTEs, so the audited gates and the audit
    cannot drift).  Exact-integer contingency cells per lang; kappa
    itself is ONE IEEE division of two int64-derived terms, bit-identical
    cross-engine (the kappa = (n*(a+d) - pe_num) / (n^2 - pe_num)
    identity keeps everything integer until the last op; pe_num = n^2
    degenerate marginals emit 0.0 on both sides).

    Plan shape: gopher is map-only; the quantile gate adds its one
    lang-keyed rank exchange; this row adds one doc_id equi-join + a
    LEFT membership join (AQE broadcasts the gate outputs' 1-column
    projections at dimension scale) and a lang-sized final aggregate."""
    docs = _t(spark, sf_dir, "documents")
    g1 = QUERIES["text_gopher_gate"].spark(spark, sf_dir)
    g2 = QUERIES["corpus_quality_quantile_gate"].spark(spark, sf_dir)
    j = (
        docs.select("doc_id", "lang")
        .join(g1.select("doc_id", "keep"), "doc_id")
        .join(
            g2.select("doc_id", F.lit(1).alias("k2_hit")),
            "doc_id",
            "left",
        )
        .select(
            "lang",
            F.col("keep").cast("long").alias("k1"),
            F.coalesce(F.col("k2_hit"), F.lit(0)).cast("long").alias("k2"),
        )
    )
    c = j.groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("k1") * F.col("k2")).cast("long").alias("both_keep"),
        F.sum(F.col("k1") * (1 - F.col("k2"))).cast("long").alias("gopher_only"),
        F.sum((1 - F.col("k1")) * F.col("k2")).cast("long").alias("quantile_only"),
        F.sum((1 - F.col("k1")) * (1 - F.col("k2"))).cast("long").alias("both_drop"),
    )
    pe_num = (F.col("both_keep") + F.col("gopher_only")) * (
        F.col("both_keep") + F.col("quantile_only")
    ) + (F.col("quantile_only") + F.col("both_drop")) * (
        F.col("gopher_only") + F.col("both_drop")
    )
    p = c.withColumn("pe_num", pe_num)
    kappa = F.when(F.col("n") * F.col("n") == F.col("pe_num"), F.lit(0.0)).otherwise(
        (
            F.col("n") * (F.col("both_keep") + F.col("both_drop")) - F.col("pe_num")
        ).cast("double")
        / (F.col("n") * F.col("n") - F.col("pe_num"))
    )
    return p.select(
        "lang",
        "n",
        "both_keep",
        "gopher_only",
        "quantile_only",
        "both_drop",
        kappa.alias("kappa"),
    ).orderBy("lang")


@_register(
    "dq_k_anonymity",
    """
    WITH g AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(c) AS BIGINT) AS n_rows
      FROM g),
    ks AS (SELECT CAST(unnest([2, 3, 5, 10]) AS BIGINT) AS k),
    b AS (
      SELECT ks.k,
             CAST(sum(CASE WHEN g.c < ks.k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_groups_below,
             CAST(sum(CASE WHEN g.c < ks.k THEN g.c ELSE 0 END) AS BIGINT)
               AS n_rows_below
      FROM g CROSS JOIN ks GROUP BY ks.k)
    SELECT b.k, t.n_groups, t.n_rows, b.n_groups_below, b.n_rows_below,
           CAST(b.n_rows_below * 10000 // t.n_rows AS BIGINT) / 10000.0
             AS frac_rows_below
    FROM b, t ORDER BY b.k
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the event feed's quasi-identifier pair
    (event_type, hour) — the privacy-risk report a pipeline runs before
    releasing behavioral data for training: a row whose quasi-identifier
    group has fewer than k members is re-identifiable at confidence 1/k
    [Sweeney 2002].  For each k in the standard ladder {2, 3, 5, 10}:
    how many groups and how many ROWS fall below k, and the row fraction
    (exact 1e-4 floor division).

    Plan shape: ONE quasi-identifier exchange builds the group-size
    frame; the four thresholds are literal columns of a single global
    aggregate (map-side partial, 1-row result), unpivoted to the 4-row
    ladder with ``stack`` — no second data-shaped stage, no cross join
    against data.  At 100 TB the group frame is the only shuffle and it
    is the audit's natural key; the ladder never touches row scale."""
    ks = [2, 3, 5, 10]
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").cast("long").alias("c")
    )
    aggs = [
        F.count("*").cast("long").alias("n_groups"),
        F.sum("c").cast("long").alias("n_rows"),
    ]
    for k in ks:
        aggs.append(
            F.sum(F.when(F.col("c") < k, 1).otherwise(0)).cast("long").alias(f"g{k}")
        )
        aggs.append(
            F.sum(F.when(F.col("c") < k, F.col("c")).otherwise(0))
            .cast("long")
            .alias(f"r{k}")
        )
    t = g.agg(*aggs)
    stack = ", ".join(f"CAST({k} AS BIGINT), g{k}, r{k}" for k in ks)
    return (
        t.selectExpr(
            "n_groups",
            "n_rows",
            f"stack({len(ks)}, {stack}) AS (k, n_groups_below, n_rows_below)",
        )
        .select(
            "k",
            "n_groups",
            "n_rows",
            "n_groups_below",
            "n_rows_below",
            (F.expr("n_rows_below * 10000 div n_rows") / F.lit(10000.0)).alias(
                "frac_rows_below"
            ),
        )
        .orderBy("k")
    )


@_register(
    "dq_t_closeness",
    """
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(floor(value) AS BIGINT) % 10 AS b
      FROM events),
    gb AS (SELECT event_type, h, b, CAST(count(*) AS BIGINT) AS c
           FROM e GROUP BY 1, 2, 3),
    g AS (SELECT event_type, h, CAST(sum(c) AS BIGINT) AS n_g
          FROM gb GROUP BY 1, 2),
    gbl AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM gb GROUP BY 1),
    tot AS (SELECT CAST(sum(cb) AS BIGINT) AS n FROM gbl),
    cells AS (
      SELECT g.event_type, g.h, g.n_g, gbl.b, gbl.cb,
             COALESCE(gb.c, 0) AS cgb, tot.n
      FROM g CROSS JOIN gbl CROSS JOIN tot
      LEFT JOIN gb ON gb.event_type = g.event_type AND gb.h = g.h
                  AND gb.b = gbl.b),
    dg AS (
      SELECT event_type, h, any_value(n_g) AS n_g, any_value(n) AS n,
             CAST(sum(abs(cgb * n - cb * n_g)) AS BIGINT) AS d
      FROM cells GROUP BY 1, 2),
    tv AS (
      SELECT event_type, h, n_g, n,
             CAST(d * 10000 // (2 * n_g * n) AS BIGINT) AS tvd_x1e4
      FROM dg),
    lad AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(any_value(n) AS BIGINT) AS n_rows,
             CAST(max(tvd_x1e4) AS BIGINT) AS max_tvd_x1e4,
             CAST(sum(CASE WHEN tvd_x1e4 > 2000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f2,
             CAST(sum(CASE WHEN tvd_x1e4 > 2000 THEN n_g ELSE 0 END)
                  AS BIGINT) AS r2,
             CAST(sum(CASE WHEN tvd_x1e4 > 3000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f3,
             CAST(sum(CASE WHEN tvd_x1e4 > 3000 THEN n_g ELSE 0 END)
                  AS BIGINT) AS r3,
             CAST(sum(CASE WHEN tvd_x1e4 > 5000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f5,
             CAST(sum(CASE WHEN tvd_x1e4 > 5000 THEN n_g ELSE 0 END)
                  AS BIGINT) AS r5
      FROM tv),
    u AS (
      SELECT 2 AS t10, n_groups, n_rows, max_tvd_x1e4, f2 AS n_failing,
             r2 AS n_rows_failing FROM lad
      UNION ALL
      SELECT 3, n_groups, n_rows, max_tvd_x1e4, f3, r3 FROM lad
      UNION ALL
      SELECT 5, n_groups, n_rows, max_tvd_x1e4, f5, r5 FROM lad)
    SELECT CAST(t10 AS BIGINT) AS t10, n_groups, n_failing, n_rows_failing,
           max_tvd_x1e4,
           CAST(n_rows_failing * 10000 // n_rows AS BIGINT) / 10000.0
             AS frac_rows_failing
    FROM u ORDER BY t10
    """,
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third leg of the anonymity trio next to
    the registered ``dq_k_anonymity`` and ``dq_l_diversity`` rows [Li,
    Li & Venkatasubramanian 2007]: a quasi-identifier group can pass
    k-anonymity AND l-diversity and still leak (its sensitive-attribute
    DISTRIBUTION differs from the corpus — membership reveals skew), so
    the gate bounds the total-variation distance between each group's
    sensitive distribution and the global one.  Same quasi-identifier
    as the k-anon row (event_type, hour); sensitive attribute = the
    value's unit bucket (floor(value) mod 10).  TVD is computed in
    exact int64 cross-multiplied form — D = sum_b |c_gb*N - c_b*n_g|,
    TVD = D / (2*n_g*N), floored at 1e-4 — and the t in {0.2, 0.3,
    0.5} ladder compares the shared fixed-point value, so both engines
    agree at bucket boundaries by construction.  (Headroom: n_g*N
    stays under 2^63 while n_g*N < 9.2e18 — fine through ~1e9 rows per
    group at 1e9 total; past that, scale both counts down by a common
    power of two first.)

    Fixture note: nearly every group fails on the test feed — the
    quasi-identifier groups are 2-5 rows, and a handful of samples
    cannot approximate a 10-bucket distribution (TVD ~1 by small-sample
    arithmetic, the same groups the k-anon ladder flags).  That is the
    audit working as specified: t-closeness only becomes satisfiable
    after k-anon-style generalization coarsens the groups, which is
    exactly the release-pipeline ordering the trio implies.

    Plan shape: ONE quasi-identifier+bucket exchange builds the cell
    frame; the group and global-bucket frames are re-aggregates of it
    (the bucket frame is 10 rows, broadcast); the TVD join is
    groups x 10 — dimension-sized — and the ladder is literal columns
    of a 1-row aggregate unioned to 3 rows, the k-anon pattern."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        (F.floor("value").cast("long") % 10).alias("b"),
    )
    gb = e.groupBy("event_type", "h", "b").agg(
        F.count("*").cast("long").alias("c")
    )
    g = gb.groupBy("event_type", "h").agg(F.sum("c").cast("long").alias("n_g"))
    gbl = gb.groupBy("b").agg(F.sum("c").cast("long").alias("cb"))
    tot = gbl.agg(F.sum("cb").cast("long").alias("n"))
    cells = (
        g.crossJoin(F.broadcast(gbl))
        .crossJoin(F.broadcast(tot))
        .join(gb, ["event_type", "h", "b"], "left")
        .select(
            "event_type",
            "h",
            "n_g",
            "n",
            "cb",
            F.coalesce("c", F.lit(0)).alias("cgb"),
        )
    )
    dg = cells.groupBy("event_type", "h").agg(
        F.first("n_g").alias("n_g"),
        F.first("n").alias("n"),
        F.sum(F.abs(F.col("cgb") * F.col("n") - F.col("cb") * F.col("n_g")))
        .cast("long")
        .alias("d"),
    )
    tv = dg.select(
        "n_g",
        "n",
        F.expr("d * 10000 div (2 * n_g * n)").cast("long").alias("tvd_x1e4"),
    )
    aggs = [
        F.count("*").cast("long").alias("n_groups"),
        F.first("n").cast("long").alias("n_rows"),
        F.max("tvd_x1e4").cast("long").alias("max_tvd_x1e4"),
    ]
    for t10 in (2, 3, 5):
        fail = F.col("tvd_x1e4") > t10 * 1000
        aggs.append(
            F.sum(fail.cast("long")).cast("long").alias(f"f{t10}")
        )
        aggs.append(
            F.sum(F.when(fail, F.col("n_g")).otherwise(0))
            .cast("long")
            .alias(f"r{t10}")
        )
    lad = tv.agg(*aggs)
    stack = ", ".join(
        f"CAST({t10} AS BIGINT), f{t10}, r{t10}" for t10 in (2, 3, 5)
    )
    return (
        lad.selectExpr(
            "n_groups",
            "n_rows",
            "max_tvd_x1e4",
            f"stack(3, {stack}) AS (t10, n_failing, n_rows_failing)",
        )
        .select(
            "t10",
            "n_groups",
            "n_failing",
            "n_rows_failing",
            "max_tvd_x1e4",
            (
                F.expr("n_rows_failing * 10000 div n_rows") / F.lit(10000.0)
            ).alias("frac_rows_failing"),
        )
        .orderBy("t10")
    )


@_register(
    "dedup_priority_source_union",
    """
    WITH d0 AS (SELECT doc_id, source, text FROM documents),
    clones AS (
      SELECT doc_id + 10000000 AS doc_id,
             concat('src', CAST((CAST(substr(source, 4) AS BIGINT) + 1) % 20
                                AS STRING)) AS source,
             text
      FROM d0 WHERE doc_id % 7 = 0),
    u AS (SELECT * FROM d0 UNION ALL SELECT * FROM clones),
    t AS (
      SELECT doc_id, source, md5(text) AS h,
             CAST(substr(source, 4) AS BIGINT) % 3 AS tier
      FROM u),
    w AS (
      SELECT h, min(struct_pack(tier := tier, source := source,
                                doc_id := doc_id)) AS win
      FROM t GROUP BY h),
    kept AS (
      SELECT (win).source AS source, CAST(count(*) AS BIGINT) AS n_kept
      FROM w GROUP BY 1),
    tot AS (
      SELECT source, CAST(min(tier) AS BIGINT) AS tier,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM t GROUP BY source)
    SELECT tot.source, tot.tier, tot.n_docs,
           CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(tot.n_docs - COALESCE(kept.n_kept, 0) AS BIGINT)
             AS n_dropped
    FROM tot LEFT JOIN kept USING (source)
    ORDER BY tot.source
    """,
)
def dedup_priority_source_union(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-source union with SOURCE-PRIORITY dedup — the curation
    merge step ``dedup_exact_keep_first`` (min doc_id per digest) does
    not express: when the same document arrives from several sources,
    keep the copy from the most trusted TIER (curated > partner >
    crawl), tie-broken by source then doc_id.  The synthetic corpus has
    no natural cross-source exact dups at the test SFs, so every 7th
    doc gets a deterministic clone planted in the NEXT source — tiers
    (src index mod 3) then make clones both win and lose against their
    originals, exercising the precedence in both directions.  Reports
    per source: tier, incoming docs, docs kept (this source won its
    digest group), docs dropped (yielded to a higher-priority copy).

    Plan shape: the winner per digest is ONE groupBy(h) agg of
    min(struct(tier, source, doc_id)) — a partial-aggregating exchange
    on the digest key carrying a 3-field struct, NO window/sort and no
    join-back (the kept counts aggregate the winner structs directly,
    and total counts ride a second narrow exchange).  Both engines pick
    the winner by the same lexicographic struct/ROW ordering."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    clones = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit("src"),
            (
                (F.substring("source", 4, 10).cast("long") + 1) % 20
            ).cast("string"),
        ).alias("source"),
        "text",
    )
    t = (
        docs.unionByName(clones)
        .select(
            "doc_id",
            "source",
            F.md5("text").alias("h"),
            (F.substring("source", 4, 10).cast("long") % 3).alias("tier"),
        )
    )
    w = t.groupBy("h").agg(
        F.min(F.struct("tier", "source", "doc_id")).alias("win")
    )
    kept = w.groupBy(F.col("win.source").alias("source")).agg(
        F.count("*").cast("long").alias("n_kept")
    )
    tot = t.groupBy("source").agg(
        F.min("tier").cast("long").alias("tier"),
        F.count("*").cast("long").alias("n_docs"),
    )
    return (
        tot.join(kept, "source", "left")
        .select(
            "source",
            "tier",
            "n_docs",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_docs") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
        .orderBy("source")
    )


#: floor(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's expected
#: first-digit shares in 1e-6 fixed point.  Computed ONCE here and
#: rendered as literals into BOTH engines' texts, so parity never
#: depends on either engine's log10.
_BENFORD_EXP_X1E6 = tuple(
    int(__import__("math").log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)
)


def _benford_oracle() -> str:
    digits = ", ".join(str(d) for d in range(1, 10))
    exps = ", ".join(str(e) for e in _BENFORD_EXP_X1E6)
    return f"""
    WITH v AS (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS iv
      FROM events WHERE value >= 1),
    dd AS (
      SELECT event_type,
             CAST(substr(CAST(iv AS STRING), 1, 1) AS BIGINT) AS digit
      FROM v),
    h AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_d
          FROM dd GROUP BY 1, 2),
    n AS (SELECT event_type, CAST(sum(n_d) AS BIGINT) AS n
          FROM h GROUP BY 1),
    bf AS (SELECT CAST(unnest([{digits}]) AS BIGINT) AS digit,
                  unnest([{exps}]) AS exp_share_x1e6),
    grid AS (SELECT n.event_type, n.n, bf.digit,
                    CAST(bf.exp_share_x1e6 AS BIGINT) AS exp_share_x1e6
             FROM n, bf),
    j AS (
      SELECT g.event_type, g.digit,
             CAST(COALESCE(h.n_d, 0) AS BIGINT) AS n_d,
             CAST(COALESCE(h.n_d, 0) * 1000000 // g.n AS BIGINT)
               AS obs_share_x1e6,
             g.exp_share_x1e6
      FROM grid g LEFT JOIN h
        ON h.event_type = g.event_type AND h.digit = g.digit)
    SELECT event_type, digit, n_d, obs_share_x1e6, exp_share_x1e6,
           CAST(sum(abs(obs_share_x1e6 - exp_share_x1e6))
                  OVER (PARTITION BY event_type) // 2 AS BIGINT)
             AS tvd_x1e6
    FROM j ORDER BY event_type, digit
    """


@_register("dq_benford_first_digit", _benford_oracle())
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance audit per event type [Benford
    1938; Hill 1995] — the classic synthetic-/fabricated-data detector
    a data-quality suite runs next to the drift and outlier gates: real
    multiplicative processes put ~30.1% of leading digits at 1, and a
    generator that draws uniforms (or a partner that fabricates
    metrics) flattens the curve.  First digit comes from the INTEGER
    rendering of floor(value) (substr of the bigint string — identical
    across engines; no float log10 anywhere near the digit), observed
    shares are exact integer fixed-point, the expected shares are
    literals computed once in Python and rendered into both engines'
    texts, and the per-type total-variation distance (half the L1 gap,
    x1e6) is the alert column.  Digits absent from a type still emit a
    row (obs = 0) via the dimension grid, so the TVD is over the full
    support.

    Plan shape: ONE (event_type, digit) exchange over a 9-value
    histogram key — partial aggregation collapses each map task to
    <= 9 x #types rows before the shuffle; the Benford grid is a 9-row
    broadcast; the TVD window is over the 9 x #types frame.  At 100 TB
    nothing downstream of the first aggregate exceeds dimension size."""
    ev = _t(spark, sf_dir, "events")
    dd = ev.filter(F.col("value") >= 1).select(
        "event_type",
        F.substring(
            F.floor("value").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit"),
    )
    h = dd.groupBy("event_type", "digit").agg(
        F.count("*").cast("long").alias("n_d")
    )
    n = h.groupBy("event_type").agg(F.sum("n_d").cast("long").alias("n"))
    bf = spark.createDataFrame(
        [(d, e) for d, e in zip(range(1, 10), _BENFORD_EXP_X1E6)],
        "digit long, exp_share_x1e6 long",
    )
    grid = n.crossJoin(F.broadcast(bf))
    j = grid.join(h, ["event_type", "digit"], "left").select(
        "event_type",
        "digit",
        F.coalesce(F.col("n_d"), F.lit(0)).cast("long").alias("n_d"),
        F.expr("coalesce(n_d, 0) * 1000000 div n")
        .cast("long")
        .alias("obs_share_x1e6"),
        "exp_share_x1e6",
    )
    wt = Window.partitionBy("event_type")
    return j.select(
        "event_type",
        "digit",
        "n_d",
        "obs_share_x1e6",
        "exp_share_x1e6",
        (
            F.sum(
                F.abs(F.col("obs_share_x1e6") - F.col("exp_share_x1e6"))
            ).over(wt)
            / 2
        )
        .cast("long")
        .alias("tvd_x1e6"),
    ).orderBy("event_type", "digit")


@_register(
    "dq_mad_outlier_gate",
    """
    WITH h AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    h2 AS (
      SELECT *, sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY source) AS n
      FROM h),
    med AS (
      SELECT source, CAST(min(v) AS BIGINT) AS med, CAST(max(n) AS BIGINT) AS n
      FROM h2 WHERE 2 * cum >= n GROUP BY source),
    d AS (
      SELECT h.source, abs(h.v - med.med) AS ad, h.c
      FROM h JOIN med USING (source)),
    dh AS (SELECT source, ad, sum(c) AS c FROM d GROUP BY 1, 2),
    dh2 AS (
      SELECT dh.source, dh.ad,
             sum(dh.c) OVER (PARTITION BY dh.source ORDER BY dh.ad) AS cum,
             med.n
      FROM dh JOIN med USING (source)),
    mad AS (
      SELECT source, CAST(min(ad) AS BIGINT) AS mad
      FROM dh2 WHERE 2 * cum >= n GROUP BY source),
    o AS (
      SELECT d.source, CAST(sum(d.c) AS BIGINT) AS n_out
      FROM d JOIN mad USING (source) WHERE d.ad > 3 * mad.mad
      GROUP BY d.source)
    SELECT med.source, med.n AS n_docs, med.med AS median_chars,
           mad.mad AS mad_chars,
           CAST(COALESCE(o.n_out, 0) AS BIGINT) AS n_outliers,
           CAST(COALESCE(o.n_out, 0) * 10000 // med.n AS BIGINT) / 10000.0
             AS outlier_rate
    FROM med JOIN mad USING (source) LEFT JOIN o USING (source)
    ORDER BY med.source
    """,
)
def dq_mad_outlier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source length-outlier gate: median + median absolute
    deviation (the 50%-breakdown robust scale estimator — a mean/stddev
    z-score gate is itself dragged by the outliers it hunts) over
    ``n_chars``, flagging docs with |len - median| > 3 * MAD.  Discrete
    lower median on both statistics (smallest value whose cumulative
    count reaches half), so everything stays int64 — no interpolation,
    no floats anywhere in the row.

    Plan shape: ONE (source, n_chars) histogram exchange is the only
    data-shaped stage.  The median comes from a cumulative sum over that
    histogram (per-source windows over DISTINCT VALUES — value-domain
    sized, not row sized); the |v - med| deviation histogram is derived
    from the SAME histogram by a broadcast med join + re-aggregation
    (documents are never rescanned), and the outlier count is a filter
    over it.  All frames after the first exchange are (source x distinct
    length) sized — at 100 TB that is bounded by the length domain, not
    the corpus."""
    docs = _t(spark, sf_dir, "documents")
    # the histogram is consumed by FIVE derivations (cumsum, median
    # join-back, deviation histogram, outlier count, final frame):
    # checkpoint it so the corpus is scanned ONCE and every branch reads
    # the (source x distinct length)-sized materialization — the DSIR
    # single-tokenize pattern (plan-pinned)
    h = (
        docs.groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint()
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("source")
    h2 = h.select(
        "source",
        "v",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    med = (
        h2.filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("source")
        .agg(F.min("v").cast("long").alias("med"), F.max("n").cast("long").alias("n"))
    )
    d = h.join(F.broadcast(med), "source").select(
        "source", F.abs(F.col("v") - F.col("med")).alias("ad"), "c"
    )
    dh = d.groupBy("source", "ad").agg(F.sum("c").alias("c"))
    wcum2 = (
        Window.partitionBy("source")
        .orderBy("ad")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dh2 = dh.join(F.broadcast(med), "source").select(
        "source", "ad", F.sum("c").over(wcum2).alias("cum"), "n"
    )
    mad = (
        dh2.filter(2 * F.col("cum") >= F.col("n"))
        .groupBy("source")
        .agg(F.min("ad").cast("long").alias("mad"))
    )
    o = (
        d.join(F.broadcast(mad), "source")
        .filter(F.col("ad") > 3 * F.col("mad"))
        .groupBy("source")
        .agg(F.sum("c").cast("long").alias("n_out"))
    )
    return (
        med.join(mad, "source")
        .join(o, "source", "left")
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.col("med").alias("median_chars"),
            F.col("mad").alias("mad_chars"),
            F.coalesce(F.col("n_out"), F.lit(0)).cast("long").alias("n_outliers"),
            (
                F.expr("COALESCE(n_out, 0) * 10000 div n") / F.lit(10000.0)
            ).alias("outlier_rate"),
        )
        .orderBy("source")
    )


def _probe_calibration_oracle() -> str:
    """Calibration-bin oracle composed ON the registered linear-probe
    oracle text (same drift-proofing pattern as the loss-proxy row)."""
    probe_sql = QUERIES["corpus_quality_linear_probe"].oracle
    return f"""
    WITH probe AS ({probe_sql}),
    mm AS (SELECT min(score_x1e6) AS mn, max(score_x1e6) AS mx FROM probe),
    b AS (
      SELECT CAST(((p.score_x1e6 - mm.mn) * 10) // (mm.mx - mm.mn + 1)
                  AS BIGINT) AS bin,
             p.label, p.score_x1e6,
             (p.score_x1e6 - p.label * 1000000) AS se
      FROM probe p CROSS JOIN mm)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(sum(label) * 10000 // count(*) AS BIGINT) / 10000.0
             AS pos_rate,
           CAST(sum(score_x1e6) // count(*) AS BIGINT) AS mean_score_x1e6,
           CAST(sum(se * se) // count(*) AS BIGINT) AS brier_mean_x1e12
    FROM b GROUP BY bin ORDER BY bin
    """


@_register("corpus_probe_calibration_bins", _probe_calibration_oracle())
def corpus_probe_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve + Brier decomposition bins for the learned
    quality probe (VERDICT r11 next #8's evaluation-side frontier): docs
    bucket into 10 equal-width bins of the registered
    ``corpus_quality_linear_probe`` score range (exact integer band
    arithmetic from a broadcast 1-row min/max frame — the
    ``novelty_decay_curve`` banding pattern; a 3-round probe's scores
    cluster in a narrow band, so absolute-probability bins would
    collapse to one) and each bin reports its actual positive rate — a
    calibrated-BY-RANK probe shows pos_rate rising with bin; a flat
    curve means the probe's scores carry no ranking signal and any
    downstream threshold choice is noise.  The per-bin mean squared
    error vs the label in 1e12 fixed point is the Brier reliability
    term, all int64.  Headroom, stated honestly: the per-bin SUM of
    se*se (each term up to ~1e12) precedes the divide, so int64 holds
    through ~9e6 docs per bin — ample for every test SF (sf0.01: ~50
    docs/bin) but NOT "any SF"; past that, switch the accumulator to
    a per-partition running mean merged by doc-count weights (Chan's
    pairwise update) or let the 1e12 scale drop to 1e8.

    Plan shape: the probe row is reused verbatim (its plan: 3 GD rounds
    of 4-key gradient aggregates over a checkpointed feature frame);
    this row adds a 1-row min/max aggregate broadcast back plus one
    bin-keyed aggregate over the scored frame — dimension-sized output,
    no new data-shaped stage."""
    probe = QUERIES["corpus_quality_linear_probe"].spark(spark, sf_dir)
    mm = probe.agg(
        F.min("score_x1e6").alias("mn"), F.max("score_x1e6").alias("mx")
    )
    se = F.col("score_x1e6") - F.col("label") * 1000000
    b = probe.crossJoin(F.broadcast(mm)).select(
        F.expr("(score_x1e6 - mn) * 10 div (mx - mn + 1)").alias("bin"),
        "label",
        "score_x1e6",
        se.alias("se"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
            F.sum("score_x1e6").cast("long").alias("_ssum"),
            F.sum(F.col("se") * F.col("se")).cast("long").alias("_sesum"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            (F.expr("n_pos * 10000 div n_docs") / F.lit(10000.0)).alias("pos_rate"),
            # _ssum can be NEGATIVE (scores below 0 exist for a cold
            # probe): Spark's ``div`` truncates toward zero while the
            # DuckDB oracle's ``//`` floors, so spell exact integer
            # FLOOR division explicitly — no doubles involved.
            F.expr(
                "_ssum div n_docs - CAST(_ssum % n_docs != 0 AND _ssum < 0 AS INT)"
            ).alias("mean_score_x1e6"),
            F.expr("_sesum div n_docs").alias("brier_mean_x1e12"),
        )
        .orderBy("bin")
    )


def _ivf_nprobe_oracle(
    n_cells: int = 8,
    iters: int = 2,
    dim: int = 64,
    n_queries: int = 8,
    k_out: int = 5,
) -> str:
    """nprobe-sweep twin: reuse the fixed-point Lloyd CTE chain
    (centroids ``cen{iters}``, final assignments ``a{iters}``, and the
    final-round distance frame ``d{iters}`` — which already holds every
    vector's distance to every surviving cell, so the query-to-cell
    ranking is a filter over it, not a recomputation), rank cells per
    query, gate candidates by assignment-cell membership at each nprobe,
    and score recall@k against the exact fixed-point ranking."""
    ctes, final = _ivf_fixedpoint_ctes(n_cells, iters, dim)
    dlast = f"d{iters}"
    ctes += [
        f"qcr AS (SELECT vec_id AS qid, cell, row_number() OVER ("
        f" PARTITION BY vec_id ORDER BY dist, cell) AS crk"
        f" FROM {dlast} WHERE vec_id < {n_queries})",
        "ps AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS nprobe)",
        f"exq AS (SELECT vec_id, d, u FROM ex WHERE vec_id < {n_queries})",
        "exact AS (SELECT q.vec_id AS qid, e.vec_id,"
        " sum(CAST(floor((e.u - q.u) * (e.u - q.u) * 1e12 + 0.5) AS BIGINT))"
        " AS dist FROM ex e JOIN exq q USING (d)"
        " WHERE e.vec_id <> q.vec_id GROUP BY 1, 2)",
        "etop AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,"
        " row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rk"
        f" FROM exact) WHERE rk <= {k_out})",
        f"cand AS (SELECT ps.nprobe, qcr.qid, a.vec_id"
        f" FROM a{iters} a JOIN qcr ON qcr.cell = a.cell"
        " CROSS JOIN ps WHERE qcr.crk <= ps.nprobe"
        " AND a.vec_id <> qcr.qid)",
        "itop AS (SELECT nprobe, qid, vec_id FROM (SELECT c.nprobe, c.qid,"
        " c.vec_id, row_number() OVER (PARTITION BY c.nprobe, c.qid"
        " ORDER BY x.dist, c.vec_id) AS rk"
        " FROM cand c JOIN exact x USING (qid, vec_id))"
        f" WHERE rk <= {k_out})",
        "hits AS (SELECT i.nprobe, CAST(count(*) AS BIGINT) AS hits"
        " FROM itop i JOIN etop e USING (qid, vec_id) GROUP BY i.nprobe)",
        "sc AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS scanned"
        " FROM cand GROUP BY nprobe)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
    SELECT ps.nprobe, CAST({n_queries} AS BIGINT) AS n_queries,
           sc.scanned,
           CAST(sc.scanned * 10000 // ({n_queries} * (nn.n - 1)) AS BIGINT)
             / 10000.0 AS scanned_frac,
           COALESCE(h.hits, 0) AS hits,
           CAST(COALESCE(h.hits, 0) * 10000 // ({k_out} * {n_queries})
                AS BIGINT) / 10000.0 AS recall_at_k
    FROM ps JOIN sc USING (nprobe) LEFT JOIN hits h USING (nprobe)
    CROSS JOIN nn ORDER BY ps.nprobe"""
    )


@_register("knn_ivf_nprobe_recall_curve", _ivf_nprobe_oracle())
def knn_ivf_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF TUNING curve — recall@5 vs fraction-of-corpus-scanned as
    nprobe sweeps {1, 2, 4, 8} — the plot every ANN deployment reads
    before fixing its probe count (FAISS's nprobe knob; at nprobe =
    n_cells the probe set is the whole index, so the curve ends at
    recall 1.0 by construction, a built-in sanity row).  Completes the
    ANN self-audit family: ``knn_pq_recall_audit`` grades the
    compression, this row grades the PARTITION PRUNING.

    Exactness recipe: the shared fixed-point quantizer
    (``ml_lsh.ivf_train`` — oracled since r07) supplies centroids and
    assignments; query-to-cell and query-to-vector distances use the
    SAME 1e-12 floor-quantized integer kernel, so ranking, probing, and
    the recall fractions are bit-identical to the unrolled-CTE twin.

    Plan shape (the 100 TB story): ONE scan of the checkpointed unit
    frame serves everything — cell assignment is the map-only
    centroid-literal fold, the 8-query block rides a broadcast, and the
    per-(nprobe, query) top-5 cut is a WindowGroupLimit (only ~k rows
    per group cross the exchange).  The probe table (queries x cells,
    driver-ranked from the SAME integer distances over the 8x64 model
    that is ALREADY driver state after training) broadcasts; candidate
    gating is a broadcast equi-join on (qid, cell) — at full scale
    exactly the cell-pruned scan the IVF index exists to provide, with
    the sweep multiplying only the BOUNDED probe table, never the
    corpus."""
    import math as _math

    from reddit_sse_stream_spark.operators.ml_lsh import ivf_train, unit_cells

    n_queries, k_out, probes_ladder = 8, 5, [1, 2, 4, 8]
    emb = _t(spark, sf_dir, "embeddings")
    model = ivf_train(emb)
    unit = model.unit  # (_id, u) — checkpointed by ivf_train
    cells = unit_cells(unit, model.centroids)  # map-only, same scan

    # Query block: the n_queries smallest-id unit vectors.  Collecting
    # 8x64 doubles is the same bounded eval-set fold every knn row uses;
    # the driver ALSO needs them to rank cells for the probe table.
    qrows = sorted(
        unit.filter(F.col("_id") < n_queries).collect(), key=lambda r: r["_id"]
    )
    qframe = F.broadcast(
        spark.createDataFrame(
            [(int(r["_id"]), [float(v) for v in r["u"]]) for r in qrows],
            "qid long, qu array<double>",
        )
    )

    # Probe table: per query, cells ranked by the SAME fixed-point
    # integer distance the quantizer trains with (ties by cell id).
    def _dfp(qu, cv):
        return sum(
            int(_math.floor((a - b) * (a - b) * 1e12 + 0.5))
            for a, b in zip(qu, cv)
        )

    probe_rows = []
    for r in qrows:
        ranked = sorted(
            (( _dfp(r["u"], cv), cell) for cell, cv in model.centroids),
        )
        for p in probes_ladder:
            for _, cell in ranked[:p]:
                probe_rows.append((p, int(r["_id"]), int(cell)))
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "nprobe long, qid long, cell int")
    )

    dist = F.aggregate(
        F.zip_with(
            F.col("u"),
            F.col("qu"),
            lambda a, b: F.floor((a - b) * (a - b) * 1e12 + 0.5).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    scored = (
        cells.crossJoin(qframe)
        .filter(F.col("_id") != F.col("qid"))
        .select("qid", F.col("_id").alias("vec_id"), "cell", dist.alias("dist"))
    )
    we = Window.partitionBy("qid").orderBy("dist", "vec_id")
    etop = (
        scored.select("qid", "vec_id", F.row_number().over(we).alias("rk"))
        .filter(F.col("rk") <= k_out)
        .select("qid", "vec_id")
    )
    cand = scored.join(probes, ["qid", "cell"]).select(
        "nprobe", "qid", "vec_id", "dist"
    )
    wi = Window.partitionBy("nprobe", "qid").orderBy("dist", "vec_id")
    itop = (
        cand.select("nprobe", "qid", "vec_id", F.row_number().over(wi).alias("rk"))
        .filter(F.col("rk") <= k_out)
        .select("nprobe", "qid", "vec_id")
    )
    hits = itop.join(F.broadcast(etop), ["qid", "vec_id"]).groupBy("nprobe").agg(
        F.count("*").cast("long").alias("hits")
    )
    scanned = cand.groupBy("nprobe").agg(F.count("*").cast("long").alias("scanned"))
    nn = emb.agg(F.count("*").cast("long").alias("n"))
    ladder = spark.createDataFrame(
        [(p,) for p in probes_ladder], "nprobe long"
    )
    return (
        ladder.join(scanned, "nprobe")
        .join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "nprobe",
            F.lit(n_queries).cast("long").alias("n_queries"),
            "scanned",
            (
                F.expr(f"scanned * 10000 div ({n_queries} * (n - 1))")
                / F.lit(10000.0)
            ).alias("scanned_frac"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            (
                F.expr(f"COALESCE(hits, 0) * 10000 div {k_out * n_queries}")
                / F.lit(10000.0)
            ).alias("recall_at_k"),
        )
        .orderBy("nprobe")
    )


_DOMAIN_BLOCKLIST = [
    "dom2.example.com",  # exact host — must WIN longest-match over the zone
    "dom5.example.com",  # exact host — must WIN longest-match over the zone
    "example.com",       # whole zone — blocks every feed host as a suffix
    "example.org",       # foreign zone (no feed host lives under it)
    "blocked.net",       # dead pattern — must match nothing
]


@_register(
    "feed_domain_suffix_blocklist",
    f"""
    WITH {FEED_CTE},
    c AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_events
          FROM feed GROUP BY domain),
    bl AS (SELECT unnest({_DOMAIN_BLOCKLIST!r}) AS pattern),
    lab AS (SELECT domain, string_split(domain, '.') AS labels
            FROM c WHERE domain IS NOT NULL),
    sfx AS (SELECT domain, labels,
                   unnest(generate_series(1, len(labels))) AS i
            FROM lab),
    sfx2 AS (SELECT domain,
                    array_to_string(labels[i:len(labels)], '.') AS suffix
             FROM sfx),
    m AS (SELECT domain, pattern FROM (
            SELECT s.domain, b.pattern,
                   row_number() OVER (PARTITION BY s.domain
                     ORDER BY length(b.pattern) DESC, b.pattern) AS rn
            FROM sfx2 s JOIN bl b ON b.pattern = s.suffix)
          WHERE rn = 1)
    SELECT COALESCE(c.domain, '') AS domain, c.n_events,
           CAST(m.pattern IS NOT NULL AS INTEGER) AS blocked,
           COALESCE(m.pattern, '') AS matched_pattern
    FROM c LEFT JOIN m ON m.domain = c.domain
    ORDER BY domain
    """,
)
def feed_domain_suffix_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklisting with SUFFIX semantics — the UT1/crawl-filter
    contract where pattern ``example.com`` blocks the apex AND every
    subdomain — generalizing the reference's exact-match domain
    whitelist (F4, sse.py:148-156) to the zone-level form a crawl
    pipeline actually ships.  Per distinct domain: event count, blocked
    flag, and the MOST SPECIFIC (longest) matching pattern, ties by
    pattern text; NULL domains (comments carry none — quirk Q3) report
    unblocked with the empty pattern.

    Scale shape: THE anti-pattern here would be per-pattern LIKE
    '%suffix' scans (one pass per pattern, no pushdown).  Instead the
    feed aggregates to the DIMENSION-sized distinct-domain frame first
    (one exchange — the only data-shaped stage), and only that frame
    explodes into its dot-suffixes (bounded by label count, <= 5 for
    real hostnames) for a broadcast equi-join against the blocklist —
    at 100 TB the blocklist can be millions of patterns and the join
    stays hash-equi on the suffix key; longest-match is a
    domain-partitioned row_number over matches (match-cardinality
    sized, not corpus sized)."""
    fd = feed_df(spark, sf_dir)
    c = fd.groupBy("domain").agg(F.count("*").cast("long").alias("n_events"))
    lab = c.filter(F.col("domain").isNotNull()).select(
        "domain", F.split("domain", r"\.").alias("labels")
    )
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size("labels")),
        lambda i: F.array_join(
            F.slice("labels", i, F.size("labels") - i + 1), "."
        ),
    )
    sfx = lab.select("domain", F.explode(suffixes).alias("suffix"))
    bl = spark.createDataFrame(
        [(p,) for p in _DOMAIN_BLOCKLIST], "pattern string"
    )
    m = sfx.join(F.broadcast(bl), F.col("suffix") == F.col("pattern")).select(
        "domain", "pattern"
    )
    w = Window.partitionBy("domain").orderBy(
        F.length("pattern").desc(), "pattern"
    )
    best = (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("domain", "pattern")
    )
    return (
        c.join(best, "domain", "left")
        .select(
            F.coalesce(F.col("domain"), F.lit("")).alias("domain"),
            "n_events",
            F.col("pattern").isNotNull().cast("int").alias("blocked"),
            F.coalesce(F.col("pattern"), F.lit("")).alias("matched_pattern"),
        )
        .orderBy("domain")
    )


def _url_site_sql() -> str:
    """Per-host-stable suffix diversification — shared with the
    streaming host-admission kernel; see
    :func:`operators.urlnorm.site_diversify_sql`."""
    from reddit_sse_stream_spark.operators.urlnorm import site_diversify_sql

    return site_diversify_sql("domain")


def _url_rows_sql() -> str:
    """Shared CTE chain feed -> (id, raw_url, host, canon_url) for the
    DuckDB oracles of both URL rows, rendered from the SAME generator
    the Spark side uses (operators/urlnorm.py)."""
    from reddit_sse_stream_spark.operators import urlnorm

    parts = urlnorm.canonical_parts("raw_url", "duckdb")
    return (
        f"base AS (SELECT id, {_url_site_sql()} AS site FROM feed "
        f"WHERE domain IS NOT NULL),\n"
        f"raw AS (SELECT id, {urlnorm.synth_url_sql('id', 'site')} "
        f"AS raw_url FROM base),\n"
        f"curl AS (SELECT id, raw_url, {parts['host']} AS host, "
        f"{parts['canon_url']} AS canon_url FROM raw)"
    )


def _url_canon_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_url_rows_sql`: feed -> (id, raw_url, host,
    canon_url) through the ONE generated canonicalization chain —
    shared with the streaming host-admission kernel via
    :func:`urlnorm.canonical_host_frame`, so the batch and streaming
    paths cannot drift."""
    from reddit_sse_stream_spark.operators import urlnorm

    return urlnorm.canonical_host_frame(feed_df(spark, sf_dir))


def _url_canon_oracle() -> str:
    from reddit_sse_stream_spark.operators.urlnorm import (
        registered_domain_duckdb_ctes,
    )

    return f"""
    WITH {FEED_CTE},
    {_url_rows_sql()},
    per AS (
      SELECT host, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_urls,
             CAST(count(DISTINCT canon_url) AS BIGINT) AS n_canonical_urls
      FROM curl GROUP BY host),
    {registered_domain_duckdb_ctes("per")}
    SELECT per.host, psl_reg.registered_domain,
           n_events, n_raw_urls, n_canonical_urls,
           CAST(floor((n_raw_urls - n_canonical_urls) * 10000.0
                      / n_raw_urls) AS BIGINT) AS dedup_x1e4
    FROM per JOIN psl_reg USING (host)
    ORDER BY per.host
    """


def _url_cap_oracle() -> str:
    return f"""
    WITH {FEED_CTE},
    {_url_rows_sql()},
    r AS (
      SELECT host, id,
             row_number() OVER (
               PARTITION BY host
               ORDER BY CAST(concat('0x', substr(md5(concat('cap:',
                 CAST(id AS STRING))), 1, 15)) AS BIGINT), id) AS pos
      FROM curl)
    SELECT host, CAST(id AS BIGINT) AS id, CAST(pos AS BIGINT) AS pos
    FROM r WHERE pos <= 10 ORDER BY host, pos
    """


@_register("feed_url_canonical_host", _url_canon_oracle())
def feed_url_canonical_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registered-domain extraction over the feed
    (VERDICT r13 next #7): the step the reference's exact-match domain
    semantics (sse.py:198,213) and the r12 suffix blocklist both assume
    already happened.  Raw URLs are synthesized deterministically from
    (id, host) — mixed scheme/host case, www., default and non-default
    ports, tracking params, trailing slashes, fragments — then pushed
    through the ONE generated canonicalization chain
    (``operators/urlnorm.py``: both engines render the same generator,
    so the value oracle checks the chain end to end).  Per canonical
    host: the registered domain (public-suffix-style longest-match
    table + one label — co.uk shapes included), event count, distinct
    raw vs canonical URL counts, and the canonicalization dedup rate in
    1e-4 fixed point — the "how much of my crawl was case/tracking-param
    noise" number a pipeline reports before per-host capping.

    Scale shape: the chain is pure per-row codegen (regexp/CASE/concat
    — no UDF); the only data-shaped exchange is the host groupBy with
    its two count-distincts; the PSL match (urlnorm.
    registered_domain_frame — full rule classes incl. wildcard `*.ck`
    and exception `!www.ck`, r14 verdict next #4) explodes the
    DIMENSION-sized host frame into its dot-suffixes (<= label count
    each) for a broadcast equi-join against the normalized rule table
    — millions of PSL entries stay a hash join, never per-pattern
    scans — and the prevailing-rule cut is a host-partitioned
    row_number over (rank, ps) matches."""
    from reddit_sse_stream_spark.operators.urlnorm import (
        registered_domain_frame,
    )

    c = _url_canon_frame(spark, sf_dir)
    per = c.groupBy("host").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count_distinct("raw_url").cast("long").alias("n_raw_urls"),
        F.count_distinct("canon_url").cast("long").alias("n_canonical_urls"),
    )
    reg = registered_domain_frame(per.select("host"))
    return (
        per.join(reg, "host")
        .select(
            "host",
            "registered_domain",
            "n_events",
            "n_raw_urls",
            "n_canonical_urls",
            F.floor(
                (F.col("n_raw_urls") - F.col("n_canonical_urls"))
                * 10000.0
                / F.col("n_raw_urls")
            )
            .cast("long")
            .alias("dedup_x1e4"),
        )
        .orderBy("host")
    )


@_register("feed_url_host_cap", _url_cap_oracle())
def feed_url_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host anti-dominance cap COMPOSED ON canonical hosts — the
    two-step a crawl pipeline actually ships (canonicalize, THEN cap):
    ``corpus.cap_per_group`` keeps at most 10 events per canonical host
    in deterministic md5 order, and because the group key is the
    CANONICAL host, www./case variants of one site share a single cap
    instead of each getting their own (the bug capping raw hosts has).

    Scale shape: the canonicalization is map-side codegen; the cap is
    one exchange on host with the rank cut pushed down as
    WindowGroupLimit (k rows per key per map partition — a hot host
    ships ~k rows per upstream partition, never its membership)."""
    from reddit_sse_stream_spark.operators import corpus

    c = _url_canon_frame(spark, sf_dir).select("id", "host")
    kept = corpus.cap_per_group(c, group_col="host", k=10, id_col="id")
    return kept.select(
        "host", "id", F.col("pos").cast("long").alias("pos")
    ).orderBy("host", "pos")


# --------------------------------------------------------------------------- #
# PSL rule classes under the driver oracle (r15): the wildcard (*.zone) and   #
# exception (!host.zone) rule classes the matcher gained in r15 need a        #
# driver-green proof, not just the pytest triple-parity fuzz — but the feed's #
# diversified hosts never land in a wildcard zone, so this row synthesizes a  #
# host population that covers every class from doc_id.                        #
# --------------------------------------------------------------------------- #

#: rule fixture covering all three classes plus the shapes that make
#: each one matter: a wildcard zone, its exception, a multi-label
#: normal suffix, single-label normals, and (implicitly) unknown zones.
_PSL_CLASS_RULES = ("com", "net", "co.uk", "*.cdn", "!www.cdn")


def _psl_class_host_sql(id_col: str = "doc_id") -> str:
    """Shared-dialect host synthesis hitting every rule class: zone by
    id%5 (com / co.uk / the *.cdn wildcard zone / the !www.cdn
    exception host / an unknown zone), site label by id%7, and an extra
    leading label on id%4=0 so wildcard matches occur both AT the zone
    (host IS the public suffix -> deviation: itself) and one label
    deeper (registered domain proper)."""
    i = id_col
    zone = (
        f"CASE {i} % 5 WHEN 0 THEN 'example.com' WHEN 1 THEN 'co.uk' "
        f"WHEN 2 THEN 'cdn' WHEN 3 THEN 'www.cdn' ELSE 'zone9' END"
    )
    return (
        f"concat(CASE WHEN {i} % 4 = 0 "
        f"THEN concat('d', CAST({i} % 4 AS STRING), '.') ELSE '' END, "
        f"'s', CAST({i} % 7 AS STRING), '.', {zone})"
    )


def _psl_class_oracle() -> str:
    from reddit_sse_stream_spark.operators.urlnorm import (
        registered_domain_duckdb_ctes,
    )

    return f"""
    WITH hosts AS (
      SELECT {_psl_class_host_sql("doc_id")} AS host,
             count(*) AS n_docs
      FROM documents GROUP BY 1),
    {registered_domain_duckdb_ctes("hosts", _PSL_CLASS_RULES)}
    SELECT h.host, r.registered_domain, CAST(h.n_docs AS BIGINT) AS n_docs
    FROM hosts h JOIN psl_reg r USING (host)
    ORDER BY h.host
    """


@_register("psl_rule_classes_registered_domain", _psl_class_oracle())
def psl_rule_classes_registered_domain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registered-domain extraction across ALL public-suffix-list rule
    classes (r14 verdict next #4's decision, driver-proven): normal
    suffixes, the wildcard class (``*.cdn`` — the ``*`` consumes one
    label, so ``s1.cdn`` IS a public suffix and rolls to itself under
    the documented deviation while ``d0.s1.cdn`` rolls to itself as
    suffix+1), the exception class (``!www.cdn`` — prevails over the
    wildcard; ``sN.www.cdn`` rolls to ``www.cdn``), and unknown zones
    (no-match -> host).  Hosts synthesize deterministically from
    doc_id via ONE shared-dialect expression; the match runs through
    the SAME normalized rule table both engines render
    (urlnorm.normalize_psl_rules), so a rule-class semantic drift
    between engines is a value mismatch here.

    Scale shape: identical to feed_url_canonical_host's match — the
    host frame aggregates to dimension size BEFORE the suffix explode,
    the rule table broadcasts, the prevailing-rule cut is a
    WindowGroupLimit-eligible row_number."""
    from reddit_sse_stream_spark.operators.urlnorm import (
        registered_domain_frame,
    )

    docs = _t(spark, sf_dir, "documents")
    hosts = (
        docs.selectExpr(f"{_psl_class_host_sql('doc_id')} AS host")
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    reg = registered_domain_frame(hosts.select("host"), _PSL_CLASS_RULES)
    return (
        hosts.join(reg, "host")
        .select("host", "registered_domain", "n_docs")
        .orderBy("host")
    )


@_register(
    "dq_l_diversity",
    """
    WITH g AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS c,
             CAST(count(DISTINCT user_id) AS BIGINT) AS l_div
      FROM events GROUP BY 1, 2),
    rel AS (SELECT * FROM g WHERE c >= 5),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups_released,
             CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_rows_released
      FROM rel),
    ls AS (SELECT CAST(unnest([2, 3, 5]) AS BIGINT) AS l),
    b AS (
      -- LEFT join from the ladder: the 3-row report survives an sf
      -- where NO group reaches the release size (rel empty)
      SELECT ls.l,
             CAST(COALESCE(sum(CASE WHEN rel.l_div < ls.l THEN 1 ELSE 0
                                    END), 0) AS BIGINT) AS n_groups_below,
             CAST(COALESCE(sum(CASE WHEN rel.l_div < ls.l THEN rel.c
                                    ELSE 0 END), 0) AS BIGINT)
               AS n_rows_below
      FROM ls LEFT JOIN rel ON true GROUP BY ls.l)
    SELECT b.l, t.n_groups_released, t.n_rows_released,
           b.n_groups_below, b.n_rows_below,
           CAST(b.n_rows_below * 10000 // greatest(t.n_rows_released, 1)
                AS BIGINT) / 10000.0 AS frac_rows_below
    FROM b, t ORDER BY b.l
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the rows k-anonymity would RELEASE
    [Machanavajjhala 2007, the follow-up to the ``dq_k_anonymity`` row]:
    a quasi-identifier group can be large enough to release (c >= 5,
    the streaming gate's KANON_K) yet still leak — if every row belongs
    to the SAME user, the group size protected nothing.  Per l in
    {2, 3, 5}: how many released groups carry fewer than l distinct
    sensitive values (user_id) and how much released row mass that is.

    Plan shape: the same single quasi-identifier exchange as the
    k-anonymity row, now with an exact per-group COUNT(DISTINCT) rider
    (Spark expands it map-side; the group key already partitioned the
    shuffle); the ladder is literal columns of a 1-row aggregate,
    unpivoted with ``stack``.  Nothing after the first exchange scales
    with rows."""
    ls = [2, 3, 5]
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").cast("long").alias("c"),
        F.countDistinct("user_id").cast("long").alias("l_div"),
    )
    rel = g.filter(F.col("c") >= 5)
    aggs = [
        F.count("*").cast("long").alias("n_groups_released"),
        # empty released set (possible at tiny SF): sums go NULL -> 0
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_rows_released"),
    ]
    for l in ls:
        aggs.append(
            F.coalesce(F.sum(F.when(F.col("l_div") < l, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"g{l}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("l_div") < l, F.col("c")).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"r{l}")
        )
    t = rel.agg(*aggs)
    stack = ", ".join(f"CAST({l} AS BIGINT), g{l}, r{l}" for l in ls)
    return (
        t.selectExpr(
            "n_groups_released",
            "n_rows_released",
            f"stack({len(ls)}, {stack}) AS (l, n_groups_below, n_rows_below)",
        )
        .select(
            "l",
            "n_groups_released",
            "n_rows_released",
            "n_groups_below",
            "n_rows_below",
            (
                F.expr("n_rows_below * 10000 div greatest(n_rows_released, 1)")
                / F.lit(10000.0)
            ).alias("frac_rows_below"),
        )
        .orderBy("l")
    )


def _ndcg_discounts(k: int = 10) -> list[int]:
    """floor(1e6 / log2(rank+1)) for rank 1..k — BOTH engines consume
    these same Python ints as plan literals, so no log() ever runs
    inside either engine and the DCG fold is pure int64."""
    import math as _m

    return [int(_m.floor(1e6 / _m.log2(i + 1))) for i in range(1, k + 1)]


def _ndcg_oracle(k: int = 10) -> str:
    """nDCG twin composed ON the registered BM25 oracle text; relevance,
    discounts, and both cumulative gains are exact integers, so there is
    no float summation order to disagree on — ndcg itself is one
    integer floor division at 1e-4."""
    bm25_sql = QUERIES["search_bm25_topk"].oracle
    disc = _ndcg_discounts(k)
    disc_sql = "[" + ", ".join(str(d) for d in disc) + "]"
    return f"""
    WITH bm AS ({bm25_sql}),
    rel AS (
      SELECT doc_id,
             CAST(list_contains(w, 'vector') AS BIGINT)
             + CAST(list_contains(w, 'join') AS BIGINT)
             + CAST(list_contains(w, 'stream') AS BIGINT)
             + CAST(list_contains(w, 'filter') AS BIGINT)
             + CAST(list_contains(w, 'merge') AS BIGINT) AS rel
      FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
            FROM documents)),
    dtab AS (SELECT CAST(unnest(generate_series(1, {k})) AS BIGINT) AS rnk,
                    unnest({disc_sql}) AS disc),
    ranked AS (
      SELECT b.doc_id, r.rel, row_number() OVER (
               ORDER BY b.bm25 DESC, b.doc_id) AS rnk
      FROM bm b JOIN rel r USING (doc_id)),
    rk AS (SELECT ranked.rnk, ranked.doc_id, ranked.rel,
                  ((1 << ranked.rel) - 1) * d.disc AS contrib
           FROM ranked JOIN dtab d USING (rnk) WHERE ranked.rnk <= {k}),
    ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
      FROM rel),
    ik AS (SELECT i.rnk, ((1 << i.rel) - 1) * d.disc AS icontrib
           FROM ideal i JOIN dtab d USING (rnk) WHERE i.rnk <= {k}),
    cum AS (
      SELECT r.rnk, r.doc_id, r.rel,
             CAST(sum(r.contrib) OVER (ORDER BY r.rnk) AS BIGINT)
               AS dcg_x1e6,
             CAST(sum(i.icontrib) OVER (ORDER BY r.rnk) AS BIGINT)
               AS idcg_x1e6
      FROM rk r JOIN ik i USING (rnk))
    SELECT rnk, doc_id, rel, dcg_x1e6, idcg_x1e6,
           CAST(dcg_x1e6 * 10000 // greatest(idcg_x1e6, 1) AS BIGINT)
             / 10000.0 AS ndcg_at_k
    FROM cum ORDER BY rnk
    """


@_register("search_ndcg_curve", _ndcg_oracle())
def search_ndcg_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality audit of the retrieval stack: nDCG@k for every k
    <= 10 over the registered ``search_bm25_topk`` ranking, with graded
    relevance = coverage of a WIDER judgment vocabulary (the 3 query
    terms plus 2 intent neighbors, grades 0..5) than the ranker scores
    — the standard judgment-pool/ranker mismatch, so nDCG genuinely
    discriminates instead of trivially hitting 1.0 — the metric row that
    turns the BM25/RRF/RM3 family from "returns rows" into "measurably
    good rows" (VERDICT r11 next #8, evaluation-side tooling).

    Exactness recipe: gains are (2^rel - 1) ints; the rank discounts
    1/log2(rank+1) enter BOTH engines as the SAME pre-computed 1e6
    fixed-point Python ints (no log() runs in either engine), so DCG and
    ideal-DCG prefix sums are pure int64 — no float summation order
    exists to disagree on — and ndcg is one 1e-4 floor division.

    Plan shape: relevance is a map-only projection; the ranked side is
    the registered BM25 top-20 (its plan: one tokenize exchange +
    TakeOrdered) joined to relevance on doc_id; ideal-DCG needs the
    corpus's top-k relevance grades — a TakeOrdered(k) over the map-only
    rel frame, never a global sort.  The cumulative windows run over
    k = 10 rows (constant-sized frames, the same bounded-output shape as
    every top-k row)."""
    k = 10
    disc = _ndcg_discounts(k)
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), r"\s+")
    rel_col = sum(
        F.array_contains(words, t).cast("long")
        for t in ["vector", "join", "stream", "filter", "merge"]
    )
    rel = docs.select("doc_id", rel_col.alias("rel"))
    bm = QUERIES["search_bm25_topk"].spark(spark, sf_dir)
    wr = Window.orderBy(F.col("bm25").desc(), "doc_id")
    ranked = (
        bm.join(rel, "doc_id")
        .select("doc_id", "rel", F.row_number().over(wr).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )
    # ideal grades: top-k relevance over the corpus — TakeOrdered, then
    # rank the k survivors (constant frame)
    ideal_k = rel.orderBy(F.col("rel").desc(), "doc_id").limit(k)
    wi = Window.orderBy(F.col("rel").desc(), "doc_id")
    ideal = ideal_k.select(F.row_number().over(wi).alias("rnk"), "rel")
    disc_lit = F.lit(disc)
    # SQL shiftleft takes a column bit count; the python F.shiftleft
    # wrapper insists on a literal int
    gain = F.expr("CAST(shiftleft(1, CAST(rel AS INT)) - 1 AS BIGINT)")
    rk = ranked.select(
        "rnk",
        "doc_id",
        "rel",
        (gain * F.element_at(disc_lit, F.col("rnk"))).alias("contrib"),
    )
    ik = ideal.select(
        "rnk",
        (gain * F.element_at(disc_lit, F.col("rnk"))).alias("icontrib"),
    )
    wcum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        rk.join(ik, "rnk")
        .select(
            F.col("rnk").cast("long").alias("rnk"),  # row_number is int;
            # the oracle emits BIGINT and the driver hash is type-sensitive
            "doc_id",
            "rel",
            F.sum("contrib").over(wcum).cast("long").alias("dcg_x1e6"),
            F.sum("icontrib").over(wcum).cast("long").alias("idcg_x1e6"),
        )
        .select(
            "rnk",
            "doc_id",
            "rel",
            "dcg_x1e6",
            "idcg_x1e6",
            (
                F.expr("dcg_x1e6 * 10000 div greatest(idcg_x1e6, 1)")
                / F.lit(10000.0)
            ).alias("ndcg_at_k"),
        )
        .orderBy("rnk")
    )


@_register(
    "join_interval_binned_overlap",
    """
    WITH s0 AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s1 AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s0),
    sess AS (
      SELECT user_id, sid, epoch_us(min(ts)) AS a_s, epoch_us(max(ts)) AS a_e
      FROM s1 GROUP BY 1, 2),
    hb AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS c,
             epoch_us(min(ts)) AS mn, epoch_us(max(ts)) AS mx
      FROM events GROUP BY 1, 2),
    q AS (
      SELECT event_type, mn, mx,
             epoch_us(h) // 3600000000
               - row_number() OVER (PARTITION BY event_type ORDER BY h)
               AS grp
      FROM hb WHERE c >= 7),
    isl AS (
      SELECT event_type, grp, min(mn) AS b_s, max(mx) AS b_e
      FROM q GROUP BY 1, 2),
    nb AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_bursts
           FROM isl GROUP BY 1),
    bb AS (
      SELECT event_type, b_s, b_e,
             unnest(generate_series(b_s // 3600000000, b_e // 3600000000))
               AS bin
      FROM isl),
    sb AS (
      SELECT user_id, sid, a_s, a_e,
             unnest(generate_series(a_s // 3600000000, a_e // 3600000000))
               AS bin
      FROM sess),
    pairs AS (
      SELECT DISTINCT s.user_id, s.sid, s.a_s, s.a_e,
                      b.event_type, b.b_s, b.b_e
      FROM sb s JOIN bb b USING (bin)
      WHERE s.a_s <= b.b_e AND b.b_s <= s.a_e)
    SELECT nb.event_type, nb.n_bursts,
           CAST(count(pairs.user_id) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT user_id * 1000000 + sid) AS BIGINT)
             AS n_sessions,
           CAST(COALESCE(sum(least(a_e, b_e) - greatest(a_s, b_s)), 0)
                AS BIGINT) AS overlap_us_total
    FROM nb LEFT JOIN pairs USING (event_type)
    GROUP BY nb.event_type, nb.n_bursts
    ORDER BY nb.event_type
    """,
)
def join_interval_binned_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via FIXED-WIDTH BINNING — the Spark-first
    answer to the join shape Catalyst would otherwise nested-loop
    (``a.start <= b.end AND b.start <= a.end`` has no equi-key): explode
    each interval into the hour bins it covers, hash-equi-join on the
    bin, de-duplicate pairs, and apply the true overlap predicate as a
    post-filter — the binned range join every warehouse implements under
    its range-join hint, built from primitives.  The two interval sets
    are real derivations: user inactivity-gap sessions (the
    ``sessionize_events`` recipe with both endpoints kept) and per-type
    BURST windows (hours with >= 7 events, CONSECUTIVE qualifying hours
    merged islands-and-gaps so intervals genuinely span bins).  Output
    per event type: bursts, overlapping (session, burst) pairs, sessions
    touched, and the exact summed overlap in int64 microseconds.

    Plan shape: sessions = one user exchange (both windows and the
    endpoint agg share it); bursts = one (type, hour) exchange + a
    dimension-sized islands window; the join is broadcast (the burst-bin
    frame is burst-count sized) against the session-bin explode — the
    explode factor is interval-length/bin-width, the binned-join
    tradeoff every implementation documents.  Nothing pairs
    quadratically: candidate pairs are bounded by co-binned intervals,
    the post-filter only drops same-bin non-overlaps."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (
        ev.withColumn("is_new", is_new)
        .withColumn("sid", F.sum("is_new").over(run))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_micros(F.min("ts")).alias("a_s"),
            F.unix_micros(F.max("ts")).alias("a_e"),
        )
    )
    hb = ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").alias("c"),
        F.unix_micros(F.min("ts")).alias("mn"),
        F.unix_micros(F.max("ts")).alias("mx"),
    )
    wq = Window.partitionBy("event_type").orderBy("h")
    q = hb.filter(F.col("c") >= 7).select(
        "event_type",
        "mn",
        "mx",
        "h",
        F.expr("unix_micros(h) div 3600000000").alias("hidx"),
    ).withColumn("grp", F.col("hidx") - F.row_number().over(wq))
    isl = q.groupBy("event_type", "grp").agg(
        F.min("mn").alias("b_s"), F.max("mx").alias("b_e")
    )
    nb = isl.groupBy("event_type").agg(F.count("*").cast("long").alias("n_bursts"))
    hour_us = 3600000000
    bb = isl.select(
        "event_type",
        "b_s",
        "b_e",
        F.explode(
            F.sequence(
                F.expr(f"b_s div {hour_us}"), F.expr(f"b_e div {hour_us}")
            )
        ).alias("bin"),
    )
    sb = sess.select(
        "user_id",
        "sid",
        "a_s",
        "a_e",
        F.explode(
            F.sequence(
                F.expr(f"a_s div {hour_us}"), F.expr(f"a_e div {hour_us}")
            )
        ).alias("bin"),
    )
    pairs = (
        sb.join(F.broadcast(bb), "bin")
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .select("user_id", "sid", "a_s", "a_e", "event_type", "b_s", "b_e")
        .distinct()
    )
    agg = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.countDistinct(F.col("user_id") * 1000000 + F.col("sid"))
        .cast("long")
        .alias("n_sessions"),
        F.sum(
            F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
        ).cast("long").alias("overlap_us_total"),
    )
    return (
        nb.join(agg, "event_type", "left")
        .select(
            "event_type",
            "n_bursts",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_sessions", F.lit(0)).cast("long").alias("n_sessions"),
            F.coalesce("overlap_us_total", F.lit(0))
            .cast("long")
            .alias("overlap_us_total"),
        )
        .orderBy("event_type")
    )


@_register(
    "layout_compaction_plan",
    """
    WITH man AS (
      SELECT source, doc_id // 20 AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY 1, 2),
    cum AS (
      SELECT *,
             CAST(COALESCE(sum(bytes) OVER (PARTITION BY source
               ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      FROM man)
    SELECT source, CAST(cum_before // 20000 AS BIGINT) AS grp,
           CAST(count(*) AS BIGINT) AS n_shards,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(bytes) AS BIGINT) AS bytes
    FROM cum GROUP BY 1, 2 ORDER BY source, grp
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner — the table-maintenance pass every
    long-lived lake table needs (a streaming ingest leaves shard-sized
    files; queries want ~target-sized ones): assign consecutive shards
    of each source to compaction groups by START-OFFSET binning
    (group = floor(cumulative-bytes-before / target)), the classic
    coalesce-by-cumulative-size plan.  Groups preserve shard order (so
    compaction is a sequential concat, no re-sort), every group except
    possibly the last reaches the target once a shard pushes it over,
    and the plan is pure metadata.

    Plan shape — the part that matters at 100 TB: the planner consumes
    the shard MANIFEST, not rows.  One (source, shard) aggregate builds
    the manifest (the only data-shaped stage, and in a real lake it
    already exists as table metadata); the cumulative window and the
    group aggregate run on the manifest frame, which is files-sized.
    Planning compaction by sorting ROWS would be the anti-pattern this
    row exists to not be."""
    docs = _t(spark, sf_dir, "documents")
    man = docs.groupBy(
        "source", F.expr("doc_id div 20").alias("shard")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("bytes"),
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = man.withColumn(
        "cum_before",
        F.coalesce(F.sum("bytes").over(wc), F.lit(0)).cast("long"),
    )
    return (
        cum.groupBy("source", F.expr("cum_before div 20000").alias("grp"))
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("bytes").cast("long").alias("bytes"),
        )
        .orderBy("source", "grp")
    )


@_register(
    "dq_join_skew_profile",
    """
    WITH g AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(max(c) AS BIGINT) AS max_c
      FROM g),
    h AS (SELECT c, CAST(count(*) AS BIGINT) AS nk FROM g GROUP BY c),
    h2 AS (SELECT c, sum(nk) OVER (ORDER BY c) AS cum FROM h),
    p AS (
      SELECT
        (SELECT CAST(min(c) AS BIGINT) FROM h2, t
          WHERE 100 * cum >= 50 * t.n_keys) AS p50_c,
        (SELECT CAST(min(c) AS BIGINT) FROM h2, t
          WHERE 100 * cum >= 99 * t.n_keys) AS p99_c)
    SELECT t.n_keys, t.n_rows, t.max_c, p.p50_c, p.p99_c,
           CAST(t.n_rows * 10000 // t.n_keys AS BIGINT) AS mean_c_x1e4,
           CAST(t.max_c * t.n_keys * 10000 // t.n_rows AS BIGINT)
             AS skew_x1e4,
           CAST((t.max_c * t.n_keys + 4 * t.n_rows - 1) // (4 * t.n_rows)
                AS BIGINT) AS salt_buckets
    FROM t, p
    """,
)
def dq_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the pre-flight a pipeline runs before
    shuffling 100 TB on a key it has never measured: per-key cardinality
    stats for events.user_id (the catalog's canonical join key), the
    exact discrete p50/p99 of the per-key count distribution (via the
    two-phase distinct-count histogram, never a global sort), the
    hottest-key-to-mean skew factor, and the SALT BUCKET COUNT that
    would bring the hottest key down to <= 4x the mean — i.e. the
    integer this profile exists to produce, the one
    ``join_skew_salted``'s literal salt factor encodes by hand.

    Plan shape: one key exchange builds the per-key counts; the
    percentiles come from a count-of-counts histogram (value-domain
    sized) + cumulative window; everything else is a 1-row aggregate.
    All int64 — mean/skew as 1e4 floor divisions, salt as exact ceiling
    division."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    t = g.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_c"),
    )
    h = g.groupBy("c").agg(F.count("*").cast("long").alias("nk"))
    wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    h2 = h.select("c", F.sum("nk").over(wcum).alias("cum")).crossJoin(
        F.broadcast(t.select("n_keys"))
    )
    p50 = (
        h2.filter(100 * F.col("cum") >= 50 * F.col("n_keys"))
        .agg(F.min("c").cast("long").alias("p50_c"))
    )
    p99 = (
        h2.filter(100 * F.col("cum") >= 99 * F.col("n_keys"))
        .agg(F.min("c").cast("long").alias("p99_c"))
    )
    return (
        t.crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p99))
        .select(
            "n_keys",
            "n_rows",
            "max_c",
            "p50_c",
            "p99_c",
            F.expr("n_rows * 10000 div n_keys").alias("mean_c_x1e4"),
            F.expr("max_c * n_keys * 10000 div n_rows").alias("skew_x1e4"),
            F.expr("(max_c * n_keys + 4 * n_rows - 1) div (4 * n_rows)").alias(
                "salt_buckets"
            ),
        )
    )


def _zorder_skip_oracle(n_files: int = 32, n_probes: int = 16) -> str:
    # interleave RANGE-NORMALIZED 8-bit dimensions (the Delta OPTIMIZE
    # ZORDER practice): raw interleaving of unequal-width domains lets
    # the wider column own every high bit and the narrow column gets no
    # pruning at all — this audit MEASURED that before normalization
    zkey = layout.morton_key_sql("un", "en", bits=8)
    return f"""
    WITH mm0 AS (
      SELECT min(event_id) AS mne, max(event_id) AS mxe,
             min(user_id) AS mnu, max(user_id) AS mxu
      FROM events),
    k AS (
      SELECT e.event_id, e.user_id,
             ((e.user_id - mm0.mnu) * 256) // (mm0.mxu - mm0.mnu + 1) AS un,
             ((e.event_id - mm0.mne) * 256) // (mm0.mxe - mm0.mne + 1) AS en
      FROM events e CROSS JOIN mm0),
    kz AS (SELECT event_id, user_id, {zkey} AS zkey FROM k),
    mm AS (
      SELECT min(event_id) AS mne, max(event_id) AS mxe,
             min(zkey) AS mnz, max(zkey) AS mxz
      FROM kz),
    f AS (
      SELECT k.user_id, k.event_id,
             ((k.event_id - mm.mne) * {n_files})
               // (mm.mxe - mm.mne + 1) AS f_lin,
             ((k.zkey - mm.mnz) * {n_files})
               // (mm.mxz - mm.mnz + 1) AS f_z
      FROM kz k CROSS JOIN mm),
    boxes AS (
      SELECT ordering, file,
             min(user_id) AS mn_u, max(user_id) AS mx_u,
             min(event_id) AS mn_e, max(event_id) AS mx_e
      FROM (
        SELECT 'linear' AS ordering, f_lin AS file, user_id, event_id FROM f
        UNION ALL
        SELECT 'zorder' AS ordering, f_z AS file, user_id, event_id FROM f)
      GROUP BY ordering, file),
    pu AS (SELECT DISTINCT user_id AS v FROM events
           ORDER BY v LIMIT {n_probes}),
    pe AS (SELECT DISTINCT event_id AS v FROM events
           ORDER BY v LIMIT {n_probes}),
    probes AS (
      SELECT 'user_id' AS probe_dim, v FROM pu
      UNION ALL
      SELECT 'event_id' AS probe_dim, v FROM pe),
    touch AS (
      SELECT b.ordering, p.probe_dim, p.v,
             CAST(count(*) AS BIGINT) AS files_touched
      FROM probes p JOIN boxes b
        ON (p.probe_dim = 'user_id' AND p.v BETWEEN b.mn_u AND b.mx_u)
        OR (p.probe_dim = 'event_id' AND p.v BETWEEN b.mn_e AND b.mx_e)
      GROUP BY 1, 2, 3),
    nf AS (SELECT ordering, CAST(count(*) AS BIGINT) AS n_files
           FROM boxes GROUP BY ordering)
    SELECT t.ordering, t.probe_dim, nf.n_files,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(t.files_touched) AS BIGINT) AS files_touched_total,
           CAST(sum(t.files_touched) * 10000 // count(*) AS BIGINT) / 10000.0
             AS avg_files_touched
    FROM touch t JOIN nf USING (ordering)
    GROUP BY t.ordering, t.probe_dim, nf.n_files
    ORDER BY t.ordering, t.probe_dim
    """


def _hilbert_skip_oracle(n_files: int = 32, n_probes: int = 16) -> str:
    zkey = layout.morton_key_sql("un", "en", bits=8)
    hil_ctes, hil_final = layout.hilbert_key_sql_ctes(
        "k", "un", "en", bits=8
    )
    return f"""
    WITH mm0 AS (
      SELECT min(event_id) AS mne, max(event_id) AS mxe,
             min(user_id) AS mnu, max(user_id) AS mxu
      FROM events),
    k AS (
      SELECT e.event_id, e.user_id,
             ((e.user_id - mm0.mnu) * 256) // (mm0.mxu - mm0.mnu + 1) AS un,
             ((e.event_id - mm0.mne) * 256) // (mm0.mxe - mm0.mne + 1) AS en
      FROM events e CROSS JOIN mm0),
    {hil_ctes},
    kk AS (
      SELECT h.event_id, h.user_id, {zkey} AS zkey, h.hkey
      FROM {hil_final} h),
    mm AS (
      SELECT min(event_id) AS mne, max(event_id) AS mxe,
             min(zkey) AS mnz, max(zkey) AS mxz,
             min(hkey) AS mnh, max(hkey) AS mxh
      FROM kk),
    f AS (
      SELECT k.user_id, k.event_id,
             ((k.event_id - mm.mne) * {n_files})
               // (mm.mxe - mm.mne + 1) AS f_lin,
             ((k.zkey - mm.mnz) * {n_files})
               // (mm.mxz - mm.mnz + 1) AS f_z,
             ((k.hkey - mm.mnh) * {n_files})
               // (mm.mxh - mm.mnh + 1) AS f_h
      FROM kk k CROSS JOIN mm),
    boxes AS (
      SELECT ordering, file,
             min(user_id) AS mn_u, max(user_id) AS mx_u,
             min(event_id) AS mn_e, max(event_id) AS mx_e
      FROM (
        SELECT 'linear' AS ordering, f_lin AS file, user_id, event_id FROM f
        UNION ALL
        SELECT 'zorder' AS ordering, f_z AS file, user_id, event_id FROM f
        UNION ALL
        SELECT 'hilbert' AS ordering, f_h AS file, user_id, event_id FROM f)
      GROUP BY ordering, file),
    pu AS (SELECT DISTINCT user_id AS v FROM events
           ORDER BY v LIMIT {n_probes}),
    pe AS (SELECT DISTINCT event_id AS v FROM events
           ORDER BY v LIMIT {n_probes}),
    probes AS (
      SELECT 'user_id' AS probe_dim, v FROM pu
      UNION ALL
      SELECT 'event_id' AS probe_dim, v FROM pe),
    touch AS (
      SELECT b.ordering, p.probe_dim, p.v,
             CAST(count(*) AS BIGINT) AS files_touched
      FROM probes p JOIN boxes b
        ON (p.probe_dim = 'user_id' AND p.v BETWEEN b.mn_u AND b.mx_u)
        OR (p.probe_dim = 'event_id' AND p.v BETWEEN b.mn_e AND b.mx_e)
      GROUP BY 1, 2, 3),
    nf AS (SELECT ordering, CAST(count(*) AS BIGINT) AS n_files
           FROM boxes GROUP BY ordering)
    SELECT t.ordering, t.probe_dim, nf.n_files,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(t.files_touched) AS BIGINT) AS files_touched_total,
           CAST(sum(t.files_touched) * 10000 // count(*) AS BIGINT) / 10000.0
             AS avg_files_touched
    FROM touch t JOIN nf USING (ordering)
    GROUP BY t.ordering, t.probe_dim, nf.n_files
    ORDER BY t.ordering, t.probe_dim
    """


@_register("layout_hilbert_skipping_audit", _hilbert_skip_oracle())
def layout_hilbert_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout vs Z-order vs linear, HEAD TO HEAD — the
    measured version of the claim behind Delta Lake's move from
    OPTIMIZE ZORDER to Hilbert-based liquid clustering: consecutive
    Hilbert codes are always spatially adjacent (the Morton 'Z' jumps
    across the space once per quadrant boundary), so equal-size code
    ranges cover tighter rectangles and min-max pruning admits fewer
    files for the same write cost.  Same harness as
    ``layout_zorder_skipping_audit`` (32 files, 16 equality probes per
    dimension over range-normalized 8-bit dims), with the Hilbert
    ordering as a third arm.

    The Hilbert code comes from ``layout.hilbert_key`` — the textbook
    iterative xy->d walk unrolled into 8 chained SELECTs (a single
    nested expression would blow up 3^bits leaves); whole-stage codegen
    fuses the chain into one map pass, so the key costs the same class
    as the Morton interleave: zero shuffle, zero Python.  The oracle's
    CTE chain is generated from the SAME per-round function, so the
    engines cannot drift; both are additionally pinned bit-for-bit to
    the reference loop in tests.

    Plan shape: identical to the z-order audit — value-range binning
    against a broadcast min/max frame, one (ordering, file) box
    aggregate, broadcast probe containment join; nothing after the box
    aggregate scales with rows."""
    n_files, n_probes = 32, 16
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    mm0 = ev.agg(
        F.min("event_id").alias("mne0"),
        F.max("event_id").alias("mxe0"),
        F.min("user_id").alias("mnu0"),
        F.max("user_id").alias("mxu0"),
    )
    norm = ev.crossJoin(F.broadcast(mm0)).select(
        "event_id",
        "user_id",
        F.expr("(user_id - mnu0) * 256 div (mxu0 - mnu0 + 1)").alias("un"),
        F.expr("(event_id - mne0) * 256 div (mxe0 - mne0 + 1)").alias("en"),
    )
    kz = norm.select(
        "event_id",
        "user_id",
        "un",
        "en",
        layout.morton_key(F.col("un"), F.col("en"), 8).alias("zkey"),
    )
    kk = layout.hilbert_key(kz, "un", "en", bits=8).select(
        "event_id", "user_id", "zkey", "hkey"
    )
    mm = kk.agg(
        F.min("event_id").alias("mne"),
        F.max("event_id").alias("mxe"),
        F.min("zkey").alias("mnz"),
        F.max("zkey").alias("mxz"),
        F.min("hkey").alias("mnh"),
        F.max("hkey").alias("mxh"),
    )
    f = kk.crossJoin(F.broadcast(mm)).select(
        "user_id",
        "event_id",
        F.expr(f"(event_id - mne) * {n_files} div (mxe - mne + 1)").alias(
            "f_lin"
        ),
        F.expr(f"(zkey - mnz) * {n_files} div (mxz - mnz + 1)").alias("f_z"),
        F.expr(f"(hkey - mnh) * {n_files} div (mxh - mnh + 1)").alias("f_h"),
    )
    both = (
        f.select(
            F.lit("linear").alias("ordering"),
            F.col("f_lin").alias("file"),
            "user_id",
            "event_id",
        )
        .unionAll(
            f.select(
                F.lit("zorder").alias("ordering"),
                F.col("f_z").alias("file"),
                "user_id",
                "event_id",
            )
        )
        .unionAll(
            f.select(
                F.lit("hilbert").alias("ordering"),
                F.col("f_h").alias("file"),
                "user_id",
                "event_id",
            )
        )
    )
    boxes = both.groupBy("ordering", "file").agg(
        F.min("user_id").alias("mn_u"),
        F.max("user_id").alias("mx_u"),
        F.min("event_id").alias("mn_e"),
        F.max("event_id").alias("mx_e"),
    )
    pu = (
        ev.select(F.col("user_id").alias("v"))
        .distinct()
        .orderBy("v")
        .limit(n_probes)
        .select(F.lit("user_id").alias("probe_dim"), "v")
    )
    pe = (
        ev.select(F.col("event_id").alias("v"))
        .distinct()
        .orderBy("v")
        .limit(n_probes)
        .select(F.lit("event_id").alias("probe_dim"), "v")
    )
    probes = pu.unionAll(pe)
    cond = (
        (F.col("probe_dim") == "user_id")
        & F.col("v").between(F.col("mn_u"), F.col("mx_u"))
    ) | (
        (F.col("probe_dim") == "event_id")
        & F.col("v").between(F.col("mn_e"), F.col("mx_e"))
    )
    touch = (
        probes.join(F.broadcast(boxes), cond)
        .groupBy("ordering", "probe_dim", "v")
        .agg(F.count("*").cast("long").alias("files_touched"))
    )
    nf = boxes.groupBy("ordering").agg(
        F.count("*").cast("long").alias("n_files")
    )
    return (
        touch.join(F.broadcast(nf), "ordering")
        .groupBy("ordering", "probe_dim", "n_files")
        .agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum("files_touched").cast("long").alias("files_touched_total"),
        )
        .select(
            "ordering",
            "probe_dim",
            "n_files",
            "n_probes",
            "files_touched_total",
            (
                F.expr("files_touched_total * 10000 div n_probes")
                / F.lit(10000.0)
            ).alias("avg_files_touched"),
        )
        .orderBy("ordering", "probe_dim")
    )


@_register("layout_zorder_skipping_audit", _zorder_skip_oracle())
def layout_zorder_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping effectiveness of the Z-order layout, QUANTIFIED —
    the audit behind ``layout_zorder_keys``'s claim that min-max pruning
    works on EITHER dimension: assign every event to one of 32 files
    under (a) linear event_id order and (b) Morton-key order, compute
    each file's (user_id, event_id) bounding box, and replay a 16-point
    equality-probe workload per dimension counting files whose box
    admits the probe.  Expected asymmetry IS the result: linear order
    prunes event_id probes perfectly and user_id probes not at all;
    z-order prunes BOTH — the measured justification for paying the
    clustered write.

    The interleave runs over RANGE-NORMALIZED 8-bit dimensions (each
    column mapped to [0, 256) against its own min/max — what Delta's
    OPTIMIZE ZORDER does with per-column range ids).  That is not a
    nicety: this audit, run first on the raw ``% 65536`` key that
    ``layout_zorder_keys`` emits, measured ZERO user_id pruning —
    event_id's wider domain owned every high bit, so file splits were
    event-only rectangles.  The normalized key prunes both dimensions.

    Plan shape: file ids come from VALUE-RANGE binning against a
    broadcast 1-row min/max frame (map-only — the audit mirrors
    repartitionByRange without materializing a global sort, and no
    corpus-sized rank window exists here); boxes are one
    (ordering, file)-keyed aggregate; probes are two TakeOrdered(16)
    frames; the probe-to-box containment join is a broadcast of 64 box
    rows.  Nothing after the box aggregate scales with rows."""
    n_files, n_probes = 32, 16
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    mm0 = ev.agg(
        F.min("event_id").alias("mne0"),
        F.max("event_id").alias("mxe0"),
        F.min("user_id").alias("mnu0"),
        F.max("user_id").alias("mxu0"),
    )
    norm = ev.crossJoin(F.broadcast(mm0)).select(
        "event_id",
        "user_id",
        F.expr("(user_id - mnu0) * 256 div (mxu0 - mnu0 + 1)").alias("un"),
        F.expr("(event_id - mne0) * 256 div (mxe0 - mne0 + 1)").alias("en"),
    )
    k = norm.select(
        "event_id",
        "user_id",
        layout.morton_key(F.col("un"), F.col("en"), 8).alias("zkey"),
    )
    mm = k.agg(
        F.min("event_id").alias("mne"),
        F.max("event_id").alias("mxe"),
        F.min("zkey").alias("mnz"),
        F.max("zkey").alias("mxz"),
    )
    f = k.crossJoin(F.broadcast(mm)).select(
        "user_id",
        "event_id",
        F.expr(f"(event_id - mne) * {n_files} div (mxe - mne + 1)").alias("f_lin"),
        F.expr(f"(zkey - mnz) * {n_files} div (mxz - mnz + 1)").alias("f_z"),
    )
    both = f.select(
        F.lit("linear").alias("ordering"), F.col("f_lin").alias("file"),
        "user_id", "event_id",
    ).unionAll(
        f.select(
            F.lit("zorder").alias("ordering"), F.col("f_z").alias("file"),
            "user_id", "event_id",
        )
    )
    boxes = both.groupBy("ordering", "file").agg(
        F.min("user_id").alias("mn_u"),
        F.max("user_id").alias("mx_u"),
        F.min("event_id").alias("mn_e"),
        F.max("event_id").alias("mx_e"),
    )
    pu = (
        ev.select(F.col("user_id").alias("v")).distinct().orderBy("v").limit(n_probes)
        .select(F.lit("user_id").alias("probe_dim"), "v")
    )
    pe = (
        ev.select(F.col("event_id").alias("v")).distinct().orderBy("v")
        .limit(n_probes)
        .select(F.lit("event_id").alias("probe_dim"), "v")
    )
    probes = pu.unionAll(pe)
    cond = (
        (F.col("probe_dim") == "user_id")
        & F.col("v").between(F.col("mn_u"), F.col("mx_u"))
    ) | (
        (F.col("probe_dim") == "event_id")
        & F.col("v").between(F.col("mn_e"), F.col("mx_e"))
    )
    touch = (
        probes.join(F.broadcast(boxes), cond)
        .groupBy("ordering", "probe_dim", "v")
        .agg(F.count("*").cast("long").alias("files_touched"))
    )
    nf = boxes.groupBy("ordering").agg(F.count("*").cast("long").alias("n_files"))
    return (
        touch.join(F.broadcast(nf), "ordering")
        .groupBy("ordering", "probe_dim", "n_files")
        .agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum("files_touched").cast("long").alias("files_touched_total"),
        )
        .select(
            "ordering",
            "probe_dim",
            "n_files",
            "n_probes",
            "files_touched_total",
            (
                F.expr("files_touched_total * 10000 div n_probes")
                / F.lit(10000.0)
            ).alias("avg_files_touched"),
        )
        .orderBy("ordering", "probe_dim")
    )


# The registry — and therefore the CLI ``list`` order and any external
# checker that samples the registry in order — is deliberately sorted by
# EXTERNAL-VERIFICATION VALUE, using a generic rule that encodes no
# knowledge of any particular checker's sampling window:
#
#   1. oracled queries with no externally recorded green result yet, in
#      original registration order — these benefit most from an external
#      check (and this automatically front-loads queries whose oracles
#      were just fixed, so the fix gets proven);
#   2. oracled queries already proven green, LEAST-RECENTLY-PROVEN FIRST
#      (``_PRIOR_GREEN_ROUND``: latest proving round per query across the
#      committed CORRECTNESS_r*.json artifacts — regenerate with
#      ``python tools/regen_prior_green.py``).  The external driver
#      regenerates testdata between rounds, so an old green row AGES: a
#      fixed sampling window keeps re-proving the stalest rows against
#      fresh data instead of re-confirming last round's (VERDICT r04
#      next #5);
#   3. queries without an oracle last — there is nothing to hash-check.
#
# Rationale (also in README.md): rotating not-yet-verified (then
# longest-unverified) queries to the front grows — then continually
# refreshes — externally-verified coverage, and every query cycles
# through eventually.

_PRIOR_GREEN_ROUND = {
    "a1_running_totals": 15,
    "a2_bytes_total": 15,
    "a3_max_cursor": 15,
    "agg_countmin_heavy_hitters": 15,
    "agg_countmin_merge_invariant": 15,
    "agg_heavy_hitters_exact": 9,
    "agg_kmv_distinct_estimate": 13,
    "agg_moments_merge_invariant": 13,
    "agg_skew_salted_two_phase": 15,
    "agg_sorted_user_list": 14,
    "agg_two_phase_ntile_twin": 9,
    "aggx_approx_distinct": 15,
    "aggx_approx_quantiles": 15,
    "aggx_corr_covar": 14,
    "aggx_cube_events": 11,
    "aggx_distinct_users": 11,
    "aggx_grouping_sets": 11,
    "aggx_hll_sketch_union": 14,
    "aggx_regression_exact": 14,
    "aggx_rollup_grouping_id": 14,
    "aggx_rollup_orders": 11,
    "aggx_siegel_trend_sampled": 14,
    "aggx_stats_per_type": 11,
    "aggx_theil_sen_trend": 14,
    "anomaly_seasonal_adjusted": 13,
    "anomaly_zscore_hourly": 9,
    "bpe_pair_merge_counts": 11,
    "bpe_tokenize_counts": 14,
    "bpe_train_merges": 14,
    "corpus_batch_lineage": 14,
    "corpus_cap_per_source": 10,
    "corpus_curriculum_order": 14,
    "corpus_diverse_sample": 10,
    "corpus_doremi_reweight": 11,
    "corpus_dsir_weights": 14,
    "corpus_filter_gate": 10,
    "corpus_greedy_coverage_pick": 11,
    "corpus_ipf_raking_mix": 14,
    "corpus_lang_gini": 12,
    "corpus_loss_proxy_calibration": 12,
    "corpus_mix_schedule": 10,
    "corpus_mixture_grid_search": 13,
    "corpus_probe_calibration_bins": 13,
    "corpus_quality_linear_probe": 12,
    "corpus_quality_quantile_gate": 11,
    "corpus_shard_assignments": 10,
    "corpus_shuffle_locality_audit": 12,
    "corpus_snapshot_diff": 11,
    "corpus_snapshot_merge": 12,
    "corpus_split_leakage_safe": 10,
    "corpus_token_budget_waterfill": 12,
    "corpus_topic_tagging": 12,
    "corpus_train_val_split": 10,
    "corpus_two_phase_rank_twin": 9,
    "decontam_drop_contaminated": 10,
    "decontam_embedding_cosine": 10,
    "decontam_multi_suite_report": 11,
    "decontam_ngram_overlap": 9,
    "decontam_split_leakage_report": 13,
    "dedup_bloom_fp_audit": 14,
    "dedup_cc_clusters": 10,
    "dedup_cluster_best_quality": 10,
    "dedup_containment_grams": 11,
    "dedup_cross_source_matrix": 11,
    "dedup_embedding_cosine": 12,
    "dedup_embedding_cosine_lsh": 15,
    "dedup_exact_groups": 12,
    "dedup_exact_keep_first": 12,
    "dedup_incremental_bloom": 10,
    "dedup_incremental_minhash": 10,
    "dedup_incremental_new_only": 10,
    "dedup_lsh_recall_audit": 12,
    "dedup_method_agreement": 11,
    "dedup_minhash_md5": 10,
    "dedup_minhash_twin_containment": 13,
    "dedup_ngram_jaccard": 15,
    "dedup_priority_source_union": 14,
    "dedup_rate_by_ingestion_batch": 13,
    "dedup_semdedup_cells": 10,
    "dedup_simhash_exact_dup_invariant": 13,
    "dedup_simhash_hamming_pairs": 10,
    "dedup_simhash_md5": 10,
    "dedup_sketch_merge_invariant": 15,
    "dedup_source_minhash_matrix": 15,
    "dedup_source_minhash_sampled": 9,
    "dedup_substring_containment": 10,
    "dedup_tfidf_cosine": 11,
    "dedup_threshold_curve": 11,
    "dq_benford_first_digit": 14,
    "dq_bootstrap_ci_mean": 13,
    "dq_erasure_propagation": 13,
    "dq_expectation_report": 9,
    "dq_gate_agreement_kappa": 12,
    "dq_join_cardinality_estimate": 13,
    "dq_join_skew_profile": 13,
    "dq_k_anonymity": 13,
    "dq_l_diversity": 13,
    "dq_length_drift_ks": 14,
    "dq_mad_outlier_gate": 13,
    "dq_signal_correlation_matrix": 13,
    "dq_t_closeness": 13,
    "embed_drift_by_lang": 12,
    "embed_hard_negatives": 15,
    "embed_kmeans_fixedpoint": 14,
    "embed_l2_norm": 12,
    "embed_matryoshka_retention": 12,
    "embed_norm_stats_by_lang": 9,
    "embed_pca_power_iteration": 10,
    "embed_pq_codes": 10,
    "embed_quantize_int8": 12,
    "embed_random_projection": 10,
    "embed_standardize": 12,
    "f1_type_dispatch": 14,
    "f2_author_whitelist": 15,
    "f3_subreddit_whitelist": 15,
    "f4_domain_whitelist": 15,
    "f5_whitelist_combiner": 15,
    "f6_f7_flag_filters": 15,
    "f8_null_elimination": 15,
    "f_combined_full": 15,
    "feat_target_encode_loo": 14,
    "feed_domain_suffix_blocklist": 13,
    "feed_url_canonical_host": 15,
    "feed_url_host_cap": 15,
    "fn_array_ops": 12,
    "fn_bitwise_ops": 15,
    "fn_datetime_buckets": 13,
    "fn_fuzzy_match_levenshtein": 15,
    "fn_histogram_bins": 14,
    "fn_histogram_equidepth": 10,
    "fn_histogram_equidepth_approx_contract": 12,
    "fn_map_ops": 12,
    "fn_math_scalars": 12,
    "fn_null_ops": 13,
    "fn_percentiles": 12,
    "fn_percentiles_two_phase": 12,
    "fn_regexp_ops": 13,
    "fn_sequence_range": 10,
    "fn_string_ops": 12,
    "funnel_attribution_last_touch": 11,
    "funnel_time_to_convert": 11,
    "funnel_time_to_convert_approx_contract": 13,
    "funnel_view_click_purchase": 9,
    "graph_pagerank_transitions": 11,
    "graph_triangle_count": 9,
    "join_anti_customers_without_orders": 11,
    "join_asof_last_click": 11,
    "join_blocked_entity_resolution": 13,
    "join_broadcast_star_counts": 11,
    "join_cross_region_nation": 14,
    "join_er_multipass_blocking": 13,
    "join_full_outer_click_purchase": 13,
    "join_interval_binned_overlap": 13,
    "join_lateral_topk_per_nation": 10,
    "join_range_clicks_before_purchase": 11,
    "join_right_outer_orders": 14,
    "join_semi_customers_with_orders": 11,
    "join_skew_salted": 15,
    "knn_batch_topk": 11,
    "knn_bruteforce_cosine": 12,
    "knn_ivf_fixedpoint_cells": 10,
    "knn_ivf_incremental_assign": 10,
    "knn_ivf_metric_consistency": 14,
    "knn_ivf_nprobe_recall_curve": 13,
    "knn_ivfpq_residual_topk": 10,
    "knn_ivfpq_topk": 10,
    "knn_lsh_bucketed": 13,
    "knn_pq_adc_topk": 10,
    "knn_pq_recall_audit": 10,
    "layout_compaction_plan": 13,
    "layout_hilbert_skipping_audit": 13,
    "layout_zorder_keys": 10,
    "layout_zorder_skipping_audit": 13,
    "limit_topk_events_by_value": 11,
    "llm_corpus_prep_pipeline": 14,
    "llm_dataset_card": 12,
    "m1_m2_interleave_sort": 15,
    "media_audio_fingerprint": 11,
    "media_audio_silence_segments": 12,
    "media_features": 11,
    "media_features_meta": 11,
    "media_frame_sample": 13,
    "media_image_ahash": 12,
    "media_text_alignment_by_source": 15,
    "media_text_alignment_gate": 15,
    "media_text_alignment_threshold_curve": 15,
    "media_video_scene_cuts": 11,
    "p2_json_key_subset": 15,
    "pack_chunk_boundary_stats": 12,
    "pack_context_length_curve": 11,
    "pack_length_buckets": 10,
    "pack_length_buckets_approx_contract": 12,
    "pack_sequences_by_source": 14,
    "path_top_event_trigrams": 9,
    "pivot_event_counts": 11,
    "posexplode_words": 13,
    "pref_bradley_terry_strength": 12,
    "psl_rule_classes_registered_domain": 15,
    "q1_domain_blocks_comments": 15,
    "quota_admission_per_author": 14,
    "recursive_cte_ancestors": 10,
    "reference_pipeline_example": 12,
    "retention_hourly_cohorts": 9,
    "s1_range_scan": 14,
    "s3_backfill_clamp": 14,
    "s4_start_id_resume": 14,
    "s8_keepalive_counters": 15,
    "sample_bottomk_minwise": 13,
    "sample_neyman_allocation": 13,
    "sample_stratified_deterministic": 14,
    "sample_temperature_by_lang": 9,
    "sample_weighted_priority": 14,
    "scd2_as_of_lookup": 11,
    "scd2_point_in_time_join": 12,
    "scd2_user_state_history": 11,
    "search_bm25_topk": 14,
    "search_hybrid_rrf": 14,
    "search_ndcg_curve": 13,
    "search_rm3_expansion": 12,
    "session_window_agg": 13,
    "sessionize_events": 13,
    "setop_except_all_values": 13,
    "setop_except_users": 11,
    "setop_intersect_all_values": 13,
    "setop_intersect_users": 11,
    "stream_lateness_watermark_profile": 11,
    "subq_correlated_exists": 13,
    "subq_in_big_spenders": 13,
    "subq_scalar_above_avg": 13,
    "text_bigram_lm_bits": 10,
    "text_char_entropy": 11,
    "text_chunk_dedup_rewrite": 15,
    "text_chunk_dup_rate": 10,
    "text_chunk_windows": 15,
    "text_clean_normalize": 10,
    "text_code_detect": 12,
    "text_duplicate_spans": 15,
    "text_encoding_quality": 14,
    "text_fingerprint": 12,
    "text_gopher_gate": 14,
    "text_lang_confusion": 12,
    "text_lang_predict": 14,
    "text_lang_scores": 12,
    "text_longest_repeat": 10,
    "text_mattr_diversity": 10,
    "text_novelty_decay_curve": 12,
    "text_novelty_first_owner": 14,
    "text_pii_redact": 10,
    "text_pmi_top_pairs": 14,
    "text_quality_score": 12,
    "text_rarity_score": 15,
    "text_repetition_bigrams": 9,
    "text_repetition_runs": 14,
    "text_stopword_scrub": 9,
    "text_suffix_ranks": 10,
    "text_token_count": 12,
    "text_tokenizer_fertility_by_lang": 11,
    "text_vocab_df": 15,
    "text_vocab_growth": 10,
    "text_winnow_fingerprints": 11,
    "text_zipf_fit": 12,
    "tpch_q10_returned_customers": 14,
    "tpch_q11_important_parts": 10,
    "tpch_q12_priority_lines": 14,
    "tpch_q13_customer_distribution": 12,
    "tpch_q14_promo_revenue": 14,
    "tpch_q15_top_supplier": 12,
    "tpch_q16_supplier_counts": 10,
    "tpch_q17_small_quantity_revenue": 15,
    "tpch_q18_large_orders": 14,
    "tpch_q19_disjunctive_revenue": 14,
    "tpch_q1_pricing_summary": 15,
    "tpch_q20_dominant_supplier": 10,
    "tpch_q21_waiting_supplier": 15,
    "tpch_q22_idle_customers": 12,
    "tpch_q2_min_cost_supplier": 10,
    "tpch_q3_shipping_priority": 15,
    "tpch_q4_order_priority": 12,
    "tpch_q5_region_revenue": 15,
    "tpch_q6_forecast_revenue": 15,
    "tpch_q7_volume_shipping": 15,
    "tpch_q8_market_share": 15,
    "tpch_q9_profit_by_nation_year": 9,
    "ts_ewma_features": 10,
    "ts_gapfill_ffill": 12,
    "ts_ohlc_hourly": 11,
    "ts_rolling_features": 15,
    "ts_seasonal_decompose": 13,
    "udaf_geomean_orders": 12,
    "udf_grouped_map_zscore": 11,
    "udf_pandas_scalar_charge": 13,
    "udtf_word_explode": 12,
    "unpivot_customer_balances": 13,
    "variant_json_extract_agg": 10,
    "vocab_coverage_topk": 11,
    "vocab_size_coverage_curve": 13,
    "window_activity_streaks": 12,
    "window_first_last_nth": 15,
    "window_lag_delta": 11,
    "window_range_time_frame": 14,
    "window_rank_family": 15,
    "window_running_sum_per_user": 11,
    "window_sliding_counts": 14,
    "window_sliding_distinct_kmv_approx_contract": 14,
    "window_sliding_distinct_users": 11,
    "window_topk_orders_per_customer": 11,
    "x1_try_cast_validation": 13,
    "x4_json_extract": 15,
}


# Queries whose DEFINITION changed after their latest recorded proof: the
# green row in _PRIOR_GREEN_ROUND validated an OLDER semantics, so it is
# not evidence about the current code — these outrank everything, even
# never-proven queries (VERDICT r06 next #1: proof age alone let the r06
# BM25/regression rewrites ship on r05-era proofs).  Regenerate with
# ``python tools/regen_prior_green.py`` (it git-diffs each query's
# defining identifiers against the commit that recorded its last proof);
# entries are pruned when a newer CORRECTNESS artifact re-proves them.
_CHANGED_SINCE_PROOF: set = {
    # (r15's two urlnorm feed rows were re-proven green by the r15 driver
    # window — CORRECTNESS_r15 hash_match — and are pruned; the map above
    # now folds r15 in.)
    #
    # r16 (VERDICT r15 next #1): the r15 OPTIMIZATION session rewrote the
    # defining code of the IVF/PQ/minhash/projection/kmeans family
    # (operators/sqlrender.py constants in ml_lsh/dedup/corpus/similarity),
    # suffix_ranks (seed 32->64), rm3_expansion_terms (single-pass),
    # pagerank_fixedpoint (lazy checkpoints) and the BT catalog query
    # AFTER their last driver proofs; the only family rows the r15 sample
    # fronted were dedup_embedding_cosine_lsh / embed_hard_negatives /
    # dedup_source_minhash_matrix (all green).  Every other VALUE-ORACLED
    # query that transitively reaches a rewritten operator (call-graph
    # closure, tools/regen_prior_green.py + manual audit) re-proves under
    # the driver before anything else; prune each on its next green row.
    # Results are pinned identical by tests (test_sqlrender.py bit-level
    # A/B, pagerank-vs-numpy, seed-invariance) — this tier is the
    # independent DuckDB re-proof those tests do not replace.
    "corpus_diverse_sample",
    "corpus_quality_linear_probe",
    "dedup_incremental_minhash",
    "dedup_lsh_recall_audit",
    "dedup_minhash_md5",
    "dedup_minhash_twin_containment",
    "dedup_semdedup_cells",
    "embed_kmeans_fixedpoint",
    "embed_pca_power_iteration",
    "embed_pq_codes",
    "embed_random_projection",
    "graph_pagerank_transitions",
    "knn_ivf_fixedpoint_cells",
    "knn_ivf_incremental_assign",
    "knn_ivf_metric_consistency",
    "knn_ivf_nprobe_recall_curve",
    "knn_ivfpq_residual_topk",
    "knn_ivfpq_topk",
    "knn_lsh_bucketed",
    "knn_pq_adc_topk",
    "knn_pq_recall_audit",
    "pref_bradley_terry_strength",
    "search_rm3_expansion",
    "text_longest_repeat",
    "text_suffix_ranks",
}


@_register(
    "vocab_size_coverage_curve",
    r"""
    WITH s AS (SELECT lower(text) AS s FROM documents WHERE text IS NOT NULL),
    w AS (
      SELECT substr(s.s, u.i, 3) AS term
      FROM s, unnest(generate_series(1, length(s.s) - 2)) AS u(i)),
    tc AS (SELECT term, CAST(count(*) AS BIGINT) AS f FROM w GROUP BY term),
    hist AS (
      SELECT f, CAST(count(*) AS BIGINT) AS nf,
             CAST(f * count(*) AS BIGINT) AS mass
      FROM tc GROUP BY f),
    cum AS (
      SELECT f, nf,
             CAST(COALESCE(sum(nf) OVER (ORDER BY f DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS types_before,
             CAST(COALESCE(sum(mass) OVER (ORDER BY f DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS mass_before
      FROM hist),
    t AS (SELECT CAST(sum(nf) AS BIGINT) AS n_types,
                 CAST(sum(f * nf) AS BIGINT) AS mass_total
          FROM hist),
    ks AS (SELECT CAST(unnest([64, 128, 256, 512]) AS BIGINT) AS k),
    b AS (
      SELECT ks.k, t.n_types, t.mass_total,
             least(ks.k, t.n_types) AS kk
      FROM ks CROSS JOIN t),
    pick AS (
      SELECT b.k, b.n_types, b.mass_total,
             CAST(c.mass_before + (b.kk - c.types_before) * c.f AS BIGINT)
               AS topk_mass
      FROM b JOIN cum c
        ON c.types_before < b.kk AND b.kk <= c.types_before + c.nf)
    SELECT k, n_types, mass_total, topk_mass,
           CAST(topk_mass * 10000 // mass_total AS BIGINT) / 10000.0
             AS coverage
    FROM pick ORDER BY k
    """,
)
def vocab_size_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-SIZING curve over SUBWORD units — for each candidate
    inventory size k, the fraction of all character-trigram occurrences
    the k most frequent trigram types cover (the first question
    tokenizer design asks: where does subword coverage saturate?  The
    fixture's word vocabulary is ~31 types — every word-level k
    saturates instantly — while its trigram inventory is ~400 types, so
    the {64,128,256,512} ladder crosses real boundaries and ends at the
    built-in saturation check of coverage 1.0).  Exact under ties
    WITHOUT ranking the vocabulary: the
    k-th type's frequency comes from descending cumulative sums over the
    DISTINCT-FREQUENCY histogram (the ``text_zipf_fit`` r12-rewrite
    trick), and the boundary frequency contributes exactly
    (k - types_before) of its tied types — any tie-break choice yields
    the same mass, so the metric is rank-free by construction.

    Plan shape: one term exchange (the token count), one histogram
    aggregate (frequency-domain sized), cumulative windows over that
    dimension-sized frame, and a broadcast 4-row ladder join picking one
    boundary row per k.  No vocabulary-sized window exists — the exact
    shape the r11 verdict demanded of zipf, applied from birth here."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = docs.select(F.lower(F.col("text")).alias("s"))
    tris = F.transform(
        F.sequence(F.lit(1), F.length("s") - 2),
        lambda i: F.col("s").substr(i, F.lit(3)),
    )
    w = s.filter(F.length("s") >= 3).select(F.explode(tris).alias("term"))
    tc = w.groupBy("term").agg(F.count("*").cast("long").alias("f"))
    hist = tc.groupBy("f").agg(
        F.count("*").cast("long").alias("nf"),
        (F.col("f") * F.count("*")).cast("long").alias("mass"),
    )
    wdesc = (
        Window.orderBy(F.col("f").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "f",
        "nf",
        F.coalesce(F.sum("nf").over(wdesc), F.lit(0)).cast("long").alias(
            "types_before"
        ),
        F.coalesce(F.sum("mass").over(wdesc), F.lit(0)).cast("long").alias(
            "mass_before"
        ),
    )
    t = hist.agg(
        F.sum("nf").cast("long").alias("n_types"),
        F.sum(F.col("f") * F.col("nf")).cast("long").alias("mass_total"),
    )
    ks = spark.createDataFrame([(64,), (128,), (256,), (512,)], "k long")
    b = ks.crossJoin(F.broadcast(t)).select(
        "k", "n_types", "mass_total", F.least("k", "n_types").alias("kk")
    )
    pick = b.join(
        F.broadcast(cum),
        (F.col("types_before") < F.col("kk"))
        & (F.col("kk") <= F.col("types_before") + F.col("nf")),
    ).select(
        "k",
        "n_types",
        "mass_total",
        (
            F.col("mass_before") + (F.col("kk") - F.col("types_before")) * F.col("f")
        ).cast("long").alias("topk_mass"),
    )
    return pick.select(
        "k",
        "n_types",
        "mass_total",
        "topk_mass",
        (F.expr("topk_mass * 10000 div mass_total") / F.lit(10000.0)).alias(
            "coverage"
        ),
    ).orderBy("k")


@_register(
    "sample_neyman_allocation",
    """
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sx,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
      FROM documents GROUP BY source),
    w0 AS (
      SELECT source, n_docs,
             n_docs * sxx - sx * sx AS var_num,
             CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)))
                  AS BIGINT) AS w_raw
      FROM s),
    w AS (
      -- exact integer isqrt: floor(sqrt(double)) can overshoot by 1
      -- near perfect squares; pull back when w*w > x (same guard both
      -- engines)
      SELECT source, n_docs,
             w_raw - CASE WHEN w_raw * w_raw > var_num THEN 1 ELSE 0 END
               AS wt
      FROM w0),
    t AS (SELECT CAST(sum(wt) AS BIGINT) AS tot FROM w),
    q AS (
      -- greatest(tot, 1) guards the degenerate all-zero-variance corpus
      -- (every stratum weight 0): DuckDB errors on x // 0 while Spark
      -- yields NULL — with the guard both engines emit base=0/rem=0 and
      -- the leftover pass hands all 100 seats to the source-ordered head
      SELECT w.source, w.n_docs, w.wt,
             CAST(100 * w.wt // greatest(t.tot, 1) AS BIGINT) AS base,
             CAST(100 * w.wt % greatest(t.tot, 1) AS BIGINT) AS rem
      FROM w, t),
    l AS (SELECT CAST(100 - sum(base) AS BIGINT) AS leftover FROM q),
    r AS (
      SELECT q.*, row_number() OVER (ORDER BY q.rem DESC, q.source) AS rk
      FROM q)
    SELECT r.source, r.n_docs, r.wt AS neyman_weight,
           CAST(r.base + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc,
           CAST(least(r.base + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0
                               END, r.n_docs) AS BIGINT) AS alloc_capped
    FROM r, l ORDER BY r.source
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation — given a budget of
    100 docs, how many to draw from each source so the stratified mean
    has minimum variance: n_h proportional to N_h * sigma_h [Neyman
    1934].  Every step exact int64: the per-stratum weight collapses to
    isqrt(n*sum(x^2) - sum(x)^2) (N_h * sigma_h with the population-N
    cancellation), isqrt guarded against the floor(sqrt(double))
    off-by-one near perfect squares (the +/-1 pull-back is exact while
    var_num < 2^53, where the double mantissa still separates adjacent
    integers; sf0.01's var_num tops out around 2^40 — a corpus past
    2^53 needs the widened Newton-correction loop instead), seats by
    LARGEST-REMAINDER apportionment (Hamilton's method: integer base
    quotas, leftovers to the largest remainders, ties by source) so the
    allocation always sums exactly to the budget.  ``alloc_capped``
    additionally clamps to the stratum size (the textbook follow-up
    re-apportions; the raw column keeps the math auditable).

    Plan shape: one source-keyed moment aggregate (count, sum, sum of
    squares — map-side partial) is the only data-shaped stage; the
    apportionment runs on the 20-row stratum frame."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sxx"),
    )
    w0 = s.select(
        "source",
        "n_docs",
        (F.col("n_docs") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "var_num"
        ),
    ).withColumn(
        "w_raw",
        F.floor(F.sqrt(F.col("var_num").cast("double"))).cast("long"),
    )
    w = w0.select(
        "source",
        "n_docs",
        (
            F.col("w_raw")
            - F.when(F.col("w_raw") * F.col("w_raw") > F.col("var_num"), 1)
            .otherwise(0)
        ).alias("wt"),
    )
    t = w.agg(F.sum("wt").cast("long").alias("tot"))
    q = w.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "wt",
        F.expr("100 * wt div greatest(tot, 1)").alias("base"),
        F.expr("100 * wt % greatest(tot, 1)").alias("rem"),
    )
    lv = q.agg((100 - F.sum("base")).cast("long").alias("leftover"))
    wr = Window.orderBy(F.col("rem").desc(), "source")
    r = q.withColumn("rk", F.row_number().over(wr))
    alloc = F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    return (
        r.crossJoin(F.broadcast(lv))
        .select(
            "source",
            "n_docs",
            F.col("wt").alias("neyman_weight"),
            alloc.cast("long").alias("alloc"),
            F.least(alloc, F.col("n_docs")).cast("long").alias("alloc_capped"),
        )
        .orderBy("source")
    )


@_register(
    "sample_bottomk_minwise",
    """
    WITH p AS (
      SELECT source, doc_id,
             CAST(concat('0x', substr(md5('rsv:' || CAST(doc_id AS VARCHAR)),
                                      1, 15)) AS BIGINT) AS prio
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, prio,
             row_number() OVER (PARTITION BY source ORDER BY prio, doc_id)
               AS rk
      FROM p
    )
    SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, prio
    FROM r WHERE rk <= 8 ORDER BY source, rk
    """,
)
def sample_bottomk_minwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k reservoir per source via min-wise hashing
    — the KMV sketch's sample half [Broder 1997; Bar-Yossef et al.
    2002]: every doc draws a 60-bit md5 priority and the k=8 smallest
    per source ARE a hash-uniform sample.  Three properties a
    random.sample reservoir lacks, each load-bearing at 100 TB:
    REPLAYABLE (same corpus -> same sample, any partitioning — which is
    what lets this row carry a full value oracle), MERGEABLE (bottom-k
    of a union = bottom-k of concatenated bottom-ks, so partial samples
    fold map-side and shard samples combine by re-cutting), and
    INCREMENTAL (the streaming twin ``streaming_bottomk_reservoir`` —
    fifteenth keyed-state kernel — maintains the identical sample live
    with k pairs of state per source).  The kth priority doubles as the
    KMV distinct-count estimator's raw material.

    Scale shape: one exchange on the source key, and the per-source
    rank<=k cut is a WindowGroupLimit — Spark holds only k rows per key
    per map partition BEFORE the shuffle, so the exchange carries
    O(k x sources x partitions) rows, never the corpus."""
    from reddit_sse_stream_spark.operators.dedup import md5_hash60

    docs = _t(spark, sf_dir, "documents")
    p = docs.select(
        "source",
        "doc_id",
        md5_hash60(
            F.concat(F.lit("rsv:"), F.col("doc_id").cast("string"))
        ).alias("prio"),
    )
    w = Window.partitionBy("source").orderBy("prio", "doc_id")
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 8)
        .select("source", F.col("rk").cast("int").alias("rk"), "doc_id", "prio")
        .orderBy("source", "rk")
    )


@_register(
    "agg_kmv_distinct_estimate",
    r"""
    WITH t AS (
      SELECT source, regexp_split_to_array(lower(text), '\s+') AS w
      FROM documents
    ),
    w AS (
      SELECT DISTINCT source, b FROM (
        SELECT t.source, t.w[u.i] || ' ' || t.w[u.i + 1] AS b
        FROM t, unnest(generate_series(1, len(t.w) - 1)) AS u(i)) x
    ),
    p AS (
      SELECT source, b,
             CAST(concat('0x', substr(md5(b), 1, 15)) AS BIGINT) AS prio
      FROM w
    ),
    n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact
          FROM p GROUP BY source),
    r AS (
      SELECT source, prio,
             row_number() OVER (PARTITION BY source ORDER BY prio, b)
               AS rk
      FROM p
    ),
    uk AS (
      SELECT source, max(prio) AS u_k FROM r WHERE rk <= 64
      GROUP BY source HAVING count(*) = 64
    ),
    e AS (
      SELECT n.source, n.n_exact,
             CAST(CASE WHEN uk.u_k IS NULL THEN n.n_exact
                       ELSE floor(63 * 1152921504606846976.0 / uk.u_k)
                  END AS BIGINT) AS est,
             CAST(uk.u_k IS NOT NULL AS INTEGER) AS sketch_mode
      FROM n LEFT JOIN uk USING (source)
    )
    SELECT source, n_exact, est, sketch_mode,
           CAST(floor(abs(est - n_exact) * 10000.0 / n_exact) AS BIGINT)
             AS rel_err_x1e4
    FROM e ORDER BY source
    """,
)
def agg_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimator, graded against
    ground truth — the estimator half of the bottom-k sketch whose
    sample half is ``sample_bottomk_minwise`` [Bar-Yossef et al. 2002]:
    per source, the 64th-smallest md5 word-BIGRAM priority u_k yields
    est = (k-1) * 2^60 / u_k for the distinct-bigram count (~700 true
    types per source at the test SFs — the unigram vocabulary is ~31,
    which would leave every source in exact mode and the estimator
    untested), compared
    against the exact COUNT(DISTINCT) with the relative error in 1e-4
    fixed point.  A source with fewer than k distinct words is in
    EXACT mode (the sketch holds the whole set; est = truth,
    sketch_mode = 0).  This is the engine's deterministic,
    cross-engine-oracled counterpart to HLL approx_count_distinct —
    unlike HLL the hash family is shared with DuckDB, so the ESTIMATE
    itself value-verifies, not just the exact anchor (same contract
    trick as the Count-Min rows).

    Scale shape: one distinct exchange on (source, word) — the same
    cardinality any exact distinct pays — then the rank<=k cut is a
    WindowGroupLimit (k rows per key per map partition cross the
    window's exchange) and everything after is dimension-sized.  At
    100 TB the sketch REPLACES the exact side: the n_exact column here
    exists to grade the estimator, and dropping it removes the wide
    distinct entirely (the sketch is one bounded-state pass —
    the streaming twin is ``streaming_bottomk_reservoir``'s state with
    words as keys)."""
    from reddit_sse_stream_spark.operators.dedup import md5_hash60

    docs = _t(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), r"\s+")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("w") - 1),
        lambda i: F.concat(
            F.element_at("w", i), F.lit(" "), F.element_at("w", i + 1)
        ),
    )
    w = (
        docs.select("source", ws.alias("w"))
        .filter(F.size("w") >= 2)
        .select("source", F.explode(bigrams).alias("b"))
        .distinct()
    )
    p = w.select("source", "b", md5_hash60("b").alias("prio"))
    n = p.groupBy("source").agg(F.count("*").cast("long").alias("n_exact"))
    wk = Window.partitionBy("source").orderBy("prio", "b")
    r = p.withColumn("rk", F.row_number().over(wk)).filter(F.col("rk") <= 64)
    uk = (
        r.groupBy("source")
        .agg(F.max("prio").alias("u_k"), F.count("*").alias("kc"))
        .filter(F.col("kc") == 64)
        .select("source", "u_k")
    )
    est = F.when(F.col("u_k").isNull(), F.col("n_exact")).otherwise(
        F.floor(63 * 1152921504606846976.0 / F.col("u_k"))
    )
    e = n.join(uk, "source", "left").select(
        "source",
        "n_exact",
        est.cast("long").alias("est"),
        F.col("u_k").isNotNull().cast("int").alias("sketch_mode"),
    )
    return e.select(
        "source",
        "n_exact",
        "est",
        "sketch_mode",
        F.floor(F.abs(F.col("est") - F.col("n_exact")) * 10000.0 / F.col("n_exact"))
        .cast("long")
        .alias("rel_err_x1e4"),
    ).orderBy("source")


@_register(
    "window_sliding_distinct_kmv_approx_contract",
    r"""
    WITH e AS (
      -- floor, not CAST: epoch() is DOUBLE with fractional seconds and
      -- CAST rounds, which would shift boundary events across panes
      -- (Spark's unix_timestamp truncates)
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events WHERE user_id IS NOT NULL),
    wu AS (
      SELECT DISTINCT
             CAST(floor(es / 1800) * 1800 - offs AS BIGINT) AS win_start,
             user_id
      FROM e, (SELECT unnest([0, 1800]) AS offs) o
      WHERE floor(es / 1800) * 1800 - offs + 3600 > es),
    wp AS (
      SELECT win_start,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS prio
      FROM wu),
    nd AS (SELECT win_start, CAST(count(*) AS BIGINT) AS n_exact
           FROM wp GROUP BY 1),
    dr AS (
      SELECT win_start, prio,
             row_number() OVER (PARTITION BY win_start ORDER BY prio) AS rk
      FROM wp),
    dk AS (
      SELECT win_start, CAST(count(*) AS BIGINT) AS d_cnt,
             CAST(max(prio) AS BIGINT) AS d_max,
             CAST(sum(prio % 1000000007) AS BIGINT) AS d_sum
      FROM dr WHERE rk <= 16 GROUP BY 1),
    pu AS (
      SELECT DISTINCT CAST(floor(es / 1800) * 1800 AS BIGINT) AS pane,
             user_id
      FROM e),
    pp AS (
      SELECT pane,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS prio
      FROM pu),
    pr AS (
      SELECT pane, prio,
             row_number() OVER (PARTITION BY pane ORDER BY prio) AS rk
      FROM pp),
    mwin AS (
      SELECT DISTINCT pane - offs AS win_start, prio
      FROM pr, (SELECT unnest([0, 1800]) AS offs) o
      WHERE rk <= 16),
    mr AS (
      SELECT win_start, prio,
             row_number() OVER (PARTITION BY win_start ORDER BY prio) AS rk
      FROM mwin),
    mk AS (
      SELECT win_start, CAST(count(*) AS BIGINT) AS m_cnt,
             CAST(max(prio) AS BIGINT) AS m_max,
             CAST(sum(prio % 1000000007) AS BIGINT) AS m_sum
      FROM mr WHERE rk <= 16 GROUP BY 1)
    SELECT nd.win_start, nd.n_exact,
           CAST(CASE WHEN dk.d_cnt >= 16
                     THEN floor(15 * 1152921504606846976.0 / dk.d_max)
                     ELSE nd.n_exact END AS BIGINT) AS est,
           CAST(dk.d_cnt >= 16 AS INTEGER) AS sketch_mode,
           CAST(dk.d_cnt = mk.m_cnt AND dk.d_max = mk.m_max
                AND dk.d_sum = mk.m_sum AS INTEGER) AS merge_ok
    FROM nd JOIN dk USING (win_start) JOIN mk USING (win_start)
    ORDER BY win_start
    """,
)
def window_sliding_distinct_kmv_approx_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB swap ``window_sliding_distinct_users`` documents, as
    real verified code (VERDICT r13 next #6): sliding-window distinct
    actives estimated by a KMV bottom-k sketch (k=16) instead of the
    exact two-level expand+distinct, with the sketch's MERGEABILITY —
    the property the at-scale rollup actually relies on — checked as a
    value column.  Two paths per 1h/30min-slide window: (a) DIRECT —
    bottom-k of the window's distinct user md5-priorities; (b) MERGED —
    each 30-min tumbling PANE keeps its own bottom-k, every window
    unions its two panes' sketches (dedup by priority: a user active in
    both panes carries the same hash) and re-cuts to k.  By the KMV
    merge theorem [Bar-Yossef et al. 2002] bottom-k(A ∪ B) ==
    bottom-k(bottom-k(A) ∪ bottom-k(B)), so ``merge_ok`` — fingerprint
    equality (count, max, sum mod p) of the two k-sets — must be 1 on
    every row; ``est`` grades against the exact ``n_exact`` anchor, and
    a window with fewer than k distinct users is in exact mode
    (est = n_exact, sketch_mode = 0).  k=16 puts the driver's sf0.01
    windows (4-28 users) in BOTH modes.  The hash family is shared with
    DuckDB, so the estimate, the fingerprints, and the invariant all
    value-verify cross-engine — same contract trick as
    ``agg_kmv_distinct_estimate``.

    Scale shape: the pane path is the one a streaming rollup runs — ONE
    distinct exchange on (pane, user) at pane grain (no ×2 window
    expand of raw events), per-pane rank cut is a WindowGroupLimit (k
    rows per pane survive the exchange), and everything downstream is
    windows × k sized.  The direct path and n_exact exist here to GRADE
    the merged sketch; at 100 TB they are dropped and the pane sketches
    are the only state — k longs per active pane, the exact shape of
    ``streaming_bottomk_reservoir``'s keyed state."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    from reddit_sse_stream_spark.operators.dedup import md5_hash60

    k = 16
    prio = md5_hash60(F.col("user_id").cast("string"))
    # direct path: explode each event into its two sliding windows
    wu = (
        ev.select(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "user_id"
        )
        .select(
            F.unix_timestamp("w.start").alias("win_start"), "user_id"
        )
        .distinct()
    )
    wp = wu.select("win_start", prio.alias("prio"))
    nd = wp.groupBy("win_start").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    dwin = Window.partitionBy("win_start").orderBy("prio")
    dk = (
        wp.withColumn("rk", F.row_number().over(dwin))
        .filter(F.col("rk") <= k)
        .groupBy("win_start")
        .agg(
            F.count("*").cast("long").alias("d_cnt"),
            F.max("prio").cast("long").alias("d_max"),
            F.sum(F.col("prio") % 1000000007).cast("long").alias("d_sum"),
        )
    )
    # merged path: per-pane bottom-k, then union each window's two panes
    pu = ev.select(
        (F.floor(F.unix_timestamp("ts") / 1800) * 1800)
        .cast("long")
        .alias("pane"),
        "user_id",
    ).distinct()
    pwin = Window.partitionBy("pane").orderBy("prio")
    pk = (
        pu.select("pane", prio.alias("prio"))
        .withColumn("rk", F.row_number().over(pwin))
        .filter(F.col("rk") <= k)
    )
    mwin = (
        pk.select(
            F.explode(F.array(F.lit(0), F.lit(1800))).alias("offs"),
            "pane",
            "prio",
        )
        .select((F.col("pane") - F.col("offs")).alias("win_start"), "prio")
        .distinct()
    )
    mrank = Window.partitionBy("win_start").orderBy("prio")
    mk = (
        mwin.withColumn("rk", F.row_number().over(mrank))
        .filter(F.col("rk") <= k)
        .groupBy("win_start")
        .agg(
            F.count("*").cast("long").alias("m_cnt"),
            F.max("prio").cast("long").alias("m_max"),
            F.sum(F.col("prio") % 1000000007).cast("long").alias("m_sum"),
        )
    )
    est = F.when(
        F.col("d_cnt") >= k,
        F.floor(15 * 1152921504606846976.0 / F.col("d_max")),
    ).otherwise(F.col("n_exact"))
    return (
        nd.join(dk, "win_start")
        .join(mk, "win_start")
        .select(
            "win_start",
            "n_exact",
            est.cast("long").alias("est"),
            (F.col("d_cnt") >= k).cast("int").alias("sketch_mode"),
            (
                (F.col("d_cnt") == F.col("m_cnt"))
                & (F.col("d_max") == F.col("m_max"))
                & (F.col("d_sum") == F.col("m_sum"))
            )
            .cast("int")
            .alias("merge_ok"),
        )
        .orderBy("win_start")
    )


@_register(
    "join_blocked_entity_resolution",
    """
    WITH clean AS (SELECT DISTINCT p_name AS name FROM part),
    ctok AS (
      SELECT name, unnest(string_split(name, ' ')) AS tok FROM clean),
    dirty AS (
      SELECT p_partkey AS rec_id, p_name AS truth,
             p_partkey % length(p_name) AS pos,
             concat(substr(p_name, 1, p_partkey % length(p_name)),
                    substr(p_name, p_partkey % length(p_name) + 2))
               AS dirty_name,
             CASE WHEN substr(p_name, p_partkey % length(p_name) + 1, 1)
                       = ' '
                  THEN 'space_dropped' ELSE 'char_dropped' END AS corruption
      FROM part),
    dtok AS (
      SELECT rec_id, unnest(string_split(dirty_name, ' ')) AS tok
      FROM dirty),
    cand AS (
      SELECT DISTINCT d.rec_id, c.name
      FROM dtok d JOIN ctok c USING (tok)),
    scored AS (
      SELECT ca.rec_id, ca.name,
             levenshtein(dd.dirty_name, ca.name) AS lev
      FROM cand ca JOIN dirty dd USING (rec_id)),
    best AS (
      SELECT rec_id, name AS match_name, lev FROM (
        SELECT rec_id, name, lev, row_number() OVER (
          PARTITION BY rec_id ORDER BY lev, name) AS rn
        FROM scored) WHERE rn = 1)
    SELECT d.corruption,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(CASE WHEN b.rec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_candidates,
           CAST(sum(CASE WHEN b.match_name = d.truth THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN b.match_name = d.truth THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) / 10000.0 AS recall
    FROM dirty d LEFT JOIN best b ON b.rec_id = d.rec_id
    GROUP BY d.corruption ORDER BY d.corruption
    """,
)
def join_blocked_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with TOKEN BLOCKING — the fuzzy join that never
    goes all-pairs: every part row is deterministically corrupted (the
    character at position p_partkey mod len drops out) and must resolve
    back to its clean catalog name; candidates are generated ONLY where
    dirty and clean share a whole token (the blocking step every record-
    linkage system runs before the expensive distance), then levenshtein
    picks the best candidate (ties by name).  The audit's honest metric
    falls out by construction: dropping a mid-word character leaves the
    OTHER token intact so blocking recall is ~1, while dropping the SPACE
    fuses both tokens and blocking loses the record — the per-corruption
    recall split measures exactly the blocking/recall tradeoff ER
    literature prices.

    Plan shape: clean tokens are a dimension-sized broadcast (64 names);
    the candidate join is hash-equi on the token; the per-record argmin
    is a rec_id-keyed row_number (WindowGroupLimit shape, the one
    data-shaped exchange); the quadratic is bounded by candidates per
    block, never |A| x |B|."""
    part = _t(spark, sf_dir, "part")
    clean = part.select(F.col("p_name").alias("name")).distinct()
    ctok = clean.select(
        "name", F.explode(F.split("name", " ")).alias("tok")
    )
    pos = F.pmod(F.col("p_partkey"), F.length("p_name"))
    dirty = part.select(
        F.col("p_partkey").alias("rec_id"),
        F.col("p_name").alias("truth"),
        F.concat(
            F.col("p_name").substr(F.lit(1), pos),
            F.col("p_name").substr(pos + 2, F.length("p_name")),
        ).alias("dirty_name"),
        F.when(F.col("p_name").substr(pos + 1, F.lit(1)) == " ", "space_dropped")
        .otherwise("char_dropped")
        .alias("corruption"),
    )
    dtok = dirty.select(
        "rec_id", F.explode(F.split("dirty_name", " ")).alias("tok")
    )
    cand = dtok.join(F.broadcast(ctok), "tok").select("rec_id", "name").distinct()
    scored = cand.join(dirty.select("rec_id", "dirty_name"), "rec_id").select(
        "rec_id", "name", F.levenshtein("dirty_name", "name").alias("lev")
    )
    wb = Window.partitionBy("rec_id").orderBy("lev", "name")
    best = (
        scored.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("rec_id", F.col("name").alias("match_name"))
    )
    return (
        dirty.join(best, "rec_id", "left")
        .groupBy("corruption")
        .agg(
            F.count("*").cast("long").alias("n_records"),
            F.sum(F.when(F.col("match_name").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_with_candidates"),
            F.sum(F.when(F.col("match_name") == F.col("truth"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "corruption",
            "n_records",
            "n_with_candidates",
            "n_correct",
            (
                F.expr("n_correct * 10000 div n_records") / F.lit(10000.0)
            ).alias("recall"),
        )
        .orderBy("corruption")
    )


@_register(
    "join_er_multipass_blocking",
    """
    WITH clean AS (SELECT DISTINCT p_name AS name FROM part),
    ctok AS (
      SELECT name, unnest(string_split(name, ' ')) AS blk FROM clean),
    cgram AS (
      SELECT name, substr(name, i, 4) AS blk
      FROM clean, unnest(generate_series(1, length(name) - 3)) AS u(i)),
    cblk AS (SELECT DISTINCT name, blk FROM
             (SELECT * FROM ctok UNION ALL SELECT * FROM cgram)),
    dirty AS (
      SELECT p_partkey AS rec_id, p_name AS truth,
             concat(substr(p_name, 1, p_partkey % length(p_name)),
                    substr(p_name, p_partkey % length(p_name) + 2))
               AS dirty_name,
             CASE WHEN substr(p_name, p_partkey % length(p_name) + 1, 1)
                       = ' '
                  THEN 'space_dropped' ELSE 'char_dropped' END AS corruption
      FROM part),
    dtok AS (
      SELECT rec_id, unnest(string_split(dirty_name, ' ')) AS blk
      FROM dirty),
    dgram AS (
      SELECT rec_id, substr(dirty_name, i, 4) AS blk
      FROM dirty, unnest(generate_series(1, length(dirty_name) - 3)) AS u(i)),
    dblk AS (SELECT DISTINCT rec_id, blk FROM
             (SELECT * FROM dtok UNION ALL SELECT * FROM dgram)),
    cand AS (
      SELECT DISTINCT d.rec_id, c.name
      FROM dblk d JOIN cblk c USING (blk)),
    scored AS (
      SELECT ca.rec_id, ca.name,
             levenshtein(dd.dirty_name, ca.name) AS lev
      FROM cand ca JOIN dirty dd USING (rec_id)),
    best AS (
      SELECT rec_id, name AS match_name FROM (
        SELECT rec_id, name, row_number() OVER (
          PARTITION BY rec_id ORDER BY lev, name) AS rn
        FROM scored) WHERE rn = 1)
    SELECT d.corruption,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(CASE WHEN b.rec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_candidates,
           CAST(sum(CASE WHEN b.match_name = d.truth THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN b.match_name = d.truth THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) / 10000.0 AS recall
    FROM dirty d LEFT JOIN best b ON b.rec_id = d.rec_id
    GROUP BY d.corruption ORDER BY d.corruption
    """,
)
def join_er_multipass_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PASS blocking — the fix the single-pass row
    (``join_blocked_entity_resolution``) measures the need for: the
    space-drop corruptions that fuse both tokens defeat whole-token
    blocking (recall 0 there), so a second blocking pass on character
    4-grams joins the candidate union — a fused "smallring" still shares
    "mall"/"ring"-grams with "small ring".  Same corruption model, same
    levenshtein argmin, same output schema: the two rows side by side
    ARE the ER literature's blocking-recall/candidate-cost tradeoff
    curve, and this one's space-drop recall recovering toward 1.0 is the
    demonstrated fix (the zorder-audit pattern: measure the failure,
    then measure the repair).

    Plan shape: both blocking passes explode DIMENSION-sized frames on
    the clean side (64 names x tokens+grams, broadcast) and bounded
    per-record blocks on the dirty side; the candidate union dedups
    before the distance; per-record argmin is the one keyed exchange."""
    part = _t(spark, sf_dir, "part")
    clean = part.select(F.col("p_name").alias("name")).distinct()
    ctok = clean.select("name", F.explode(F.split("name", " ")).alias("blk"))
    grams = F.transform(
        F.sequence(F.lit(1), F.length("name") - 3),
        lambda i: F.col("name").substr(i, F.lit(4)),
    )
    cgram = clean.select("name", F.explode(grams).alias("blk"))
    cblk = ctok.unionAll(cgram).distinct()
    pos = F.pmod(F.col("p_partkey"), F.length("p_name"))
    dirty = part.select(
        F.col("p_partkey").alias("rec_id"),
        F.col("p_name").alias("truth"),
        F.concat(
            F.col("p_name").substr(F.lit(1), pos),
            F.col("p_name").substr(pos + 2, F.length("p_name")),
        ).alias("dirty_name"),
        F.when(F.col("p_name").substr(pos + 1, F.lit(1)) == " ", "space_dropped")
        .otherwise("char_dropped")
        .alias("corruption"),
    )
    dtok = dirty.select(
        "rec_id", F.explode(F.split("dirty_name", " ")).alias("blk")
    )
    dgrams = F.transform(
        F.sequence(F.lit(1), F.length("dirty_name") - 3),
        lambda i: F.col("dirty_name").substr(i, F.lit(4)),
    )
    dgram = dirty.select("rec_id", F.explode(dgrams).alias("blk"))
    dblk = dtok.unionAll(dgram).distinct()
    cand = dblk.join(F.broadcast(cblk), "blk").select("rec_id", "name").distinct()
    scored = cand.join(dirty.select("rec_id", "dirty_name"), "rec_id").select(
        "rec_id", "name", F.levenshtein("dirty_name", "name").alias("lev")
    )
    wb = Window.partitionBy("rec_id").orderBy("lev", "name")
    best = (
        scored.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("rec_id", F.col("name").alias("match_name"))
    )
    return (
        dirty.join(best, "rec_id", "left")
        .groupBy("corruption")
        .agg(
            F.count("*").cast("long").alias("n_records"),
            F.sum(F.when(F.col("match_name").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_with_candidates"),
            F.sum(F.when(F.col("match_name") == F.col("truth"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "corruption",
            "n_records",
            "n_with_candidates",
            "n_correct",
            (
                F.expr("n_correct * 10000 div n_records") / F.lit(10000.0)
            ).alias("recall"),
        )
        .orderBy("corruption")
    )


@_register(
    "dq_join_cardinality_estimate",
    """
    WITH g AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id),
    exact AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs FROM g),
    s AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events
      WHERE CAST(concat('0x', substr(md5('card:' ||
              CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 = 0
      GROUP BY user_id),
    est AS (SELECT CAST(COALESCE(sum(c * c), 0) * 64 AS BIGINT)
              AS est_pairs,
            CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_sampled
            FROM s),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM events)
    SELECT nn.n_rows, est.n_sampled, exact.exact_pairs, est.est_pairs,
           CAST(abs(est.est_pairs - exact.exact_pairs) * 10000
                // greatest(exact.exact_pairs, 1) AS BIGINT) / 10000.0
             AS rel_err
    FROM exact, est, nn
    """,
)
def dq_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality ESTIMATION audit — the optimizer-statistics
    question asked before committing a 100 TB shuffle: how big is the
    self-equi-join on user_id going to be?  Exact answer = sum of
    squared per-key counts (one key exchange); estimate = the same
    statistic on a deterministic 1/8 Bernoulli row sample (salted
    60-bit md5 on event_id, so both engines sample the identical rows)
    scaled by 1/p^2 = 64 — the textbook sampled self-join size
    estimator, whose bias/variance THIS row measures as a relative
    error against ground truth.  At 100 TB only the sampled branch
    would run (the exact branch exists here to grade it); the estimate
    costs a 1/8 scan and the same narrow key exchange.

    All int64: counts, squared sums, the 1/p^2 scale, and a 1e-4 floor
    relative error."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    exact = g.agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_pairs")
    )
    sampled = ev.filter(
        F.pmod(
            dedup.md5_hash60(
                F.concat(F.lit("card:"), F.col("event_id").cast("string"))
            ),
            F.lit(8),
        )
        == 0
    )
    s = sampled.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    est = s.agg(
        (F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0)) * 64)
        .cast("long")
        .alias("est_pairs"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_sampled"),
    )
    nn = ev.agg(F.count("*").cast("long").alias("n_rows"))
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(nn))
        .select(
            "n_rows",
            "n_sampled",
            "exact_pairs",
            "est_pairs",
            (
                F.expr(
                    "abs(est_pairs - exact_pairs) * 10000"
                    " div greatest(exact_pairs, 1)"
                )
                / F.lit(10000.0)
            ).alias("rel_err"),
        )
    )


@_register(
    "dq_erasure_propagation",
    f"""
    WITH erase AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(concat('0x', substr(md5('erase:' ||
              CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 20 = 0),
    ev AS (
      SELECT e.*, CASE WHEN x.user_id IS NULL THEN 0 ELSE 1 END AS hit
      FROM events e LEFT JOIN erase x ON x.user_id = e.user_id),
    {FEED_CTE.replace('FROM events', 'FROM (SELECT * FROM ev WHERE hit = 0)')},
    labels AS (
      SELECT DISTINCT 'u' || CAST(user_id % 50 AS VARCHAR) AS author
      FROM erase),
    ev_stats AS (
      SELECT 'events' AS surface,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(hit) AS BIGINT) AS n_affected,
             CAST(sum(1 - hit) AS BIGINT) AS n_after_erasure,
             CAST(0 AS BIGINT) AS n_residual_label_rows
      FROM ev),
    feed_stats AS (
      SELECT 'feed' AS surface,
             CAST((SELECT count(*) FROM feed) AS BIGINT) AS n_total,
             CAST((SELECT count(*) FROM feed f JOIN labels l
                     ON l.author = f.author) AS BIGINT)
               AS n_residual_label_rows)
    SELECT surface, n_total, n_affected, n_after_erasure,
           n_residual_label_rows
    FROM ev_stats
    UNION ALL
    SELECT surface, n_total, CAST(NULL AS BIGINT), n_total,
           n_residual_label_rows
    FROM feed_stats
    ORDER BY surface
    """,
)
def dq_erasure_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten PROPAGATION audit: erase a deterministic
    user cohort (~5% by salted md5) from the base events table, rebuild
    the derived feed from the erased base, and measure what survives on
    each surface.  The base table's post-erasure residual is zero by
    construction (the anti-join IS the erasure); the derived feed's
    ``n_residual_label_rows`` is NOT zero and that is the audit's
    finding: the feed's pseudonym ('u' || user_id % 50) is SHARED
    across users, so rows from other users still carry labels the
    erased users used — erasure removed the subjects' rows but a
    pseudonym-level takedown would have to over-delete.  Exactly the
    identifier-collision analysis a deletion pipeline must run per
    derived surface before certifying compliance.

    Plan shape: the erasure cohort is a distinct-user broadcast; both
    surfaces are counted in single aggregates over one pass each (the
    feed rebuild reuses the registered derivation verbatim on the
    erased base, so this audit and the real feed cannot drift)."""
    ev = _t(spark, sf_dir, "events")
    erase = (
        ev.select("user_id")
        .distinct()
        .filter(
            F.pmod(
                dedup.md5_hash60(
                    F.concat(F.lit("erase:"), F.col("user_id").cast("string"))
                ),
                F.lit(20),
            )
            == 0
        )
    )
    marked = ev.join(
        F.broadcast(erase.withColumn("hit", F.lit(1))), "user_id", "left"
    ).withColumn("hit", F.coalesce("hit", F.lit(0)))
    ev_stats = marked.agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("hit").cast("long").alias("n_affected"),
        F.sum(1 - F.col("hit")).cast("long").alias("n_after_erasure"),
    ).select(
        F.lit("events").alias("surface"),
        "n_total",
        "n_affected",
        "n_after_erasure",
        F.lit(0).cast("long").alias("n_residual_label_rows"),
    )
    from reddit_sse_stream_spark.sources.feed import feed_from_events

    feed_erased = feed_from_events(marked.filter(F.col("hit") == 0))
    labels = erase.select(
        F.concat(F.lit("u"), (F.col("user_id") % 50).cast("string")).alias(
            "author"
        )
    ).distinct()
    feed_stats = (
        feed_erased.join(
            F.broadcast(labels.withColumn("lhit", F.lit(1))), "author", "left"
        )
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.coalesce("lhit", F.lit(0))).cast("long").alias(
                "n_residual_label_rows"
            ),
        )
        .select(
            F.lit("feed").alias("surface"),
            "n_total",
            F.lit(None).cast("long").alias("n_affected"),
            F.col("n_total").alias("n_after_erasure"),
            "n_residual_label_rows",
        )
    )
    return ev_stats.unionAll(feed_stats).orderBy("surface")


_SIGNAL_PAIRS = [
    ("gopher_keep", "probe_score"),
    ("gopher_keep", "quality"),
    ("gopher_keep", "surprise_bin"),
    ("probe_score", "quality"),
    ("probe_score", "surprise_bin"),
    ("quality", "surprise_bin"),
]


def _signal_corr_oracle() -> str:
    """Pairwise-correlation oracle composed ON four registered signal
    oracles (quality score, gopher gate, linear probe, bigram surprise)
    — the consumed signals and this audit cannot drift."""
    quality_sql = QUERIES["text_quality_score"].oracle
    gopher_sql = QUERIES["text_gopher_gate"].oracle
    probe_sql = QUERIES["corpus_quality_linear_probe"].oracle
    bits_sql = QUERIES["text_bigram_lm_bits"].oracle
    cols = {
        # floor(x*1e4 + 0.5) on BOTH sides: the raw double->int cast
        # truncates in Spark but rounds in DuckDB, and 1e-4-quantized
        # doubles times 1e4 land on x.999... representations
        "quality": "CAST(floor(q.quality * 10000 + 0.5) AS BIGINT)",
        "gopher_keep": "CAST(g.keep AS BIGINT)",
        "probe_score": "p.score_x1e6",
        "surprise_bin": "b.bits_sum * 256 // b.n_bigrams",
    }
    sums = []
    for name, expr in cols.items():
        sums.append(f"CAST(sum({expr}) AS BIGINT) AS s_{name}")
        sums.append(f"CAST(sum(({expr}) * ({expr})) AS BIGINT) AS ss_{name}")
    for a, b in _SIGNAL_PAIRS:
        sums.append(
            f"CAST(sum(({cols[a]}) * ({cols[b]})) AS BIGINT) AS sp_{a}__{b}"
        )
    sums_sql = ",\n             ".join(sums)
    selects = []
    for a, b in _SIGNAL_PAIRS:
        selects.append(
            f"SELECT '{a}' AS sig_a, '{b}' AS sig_b, n,"
            f" CAST(n * sp_{a}__{b} - s_{a} * s_{b} AS DOUBLE)"
            f" / greatest(sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))"
            f"   * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)), 1e-12)"
            f" AS corr FROM m"
        )
    union = "\n      UNION ALL ".join(selects)
    return f"""
    WITH q AS ({quality_sql}),
    gop AS ({gopher_sql}),
    p AS ({probe_sql}),
    bb AS ({bits_sql}),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {sums_sql}
      FROM q JOIN gop g ON g.doc_id = q.doc_id
      JOIN p ON p.doc_id = q.doc_id
      JOIN bb b ON b.doc_id = q.doc_id)
    SELECT * FROM ({union}) ORDER BY sig_a, sig_b
    """


@_register("dq_signal_correlation_matrix", _signal_corr_oracle())
def dq_signal_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement matrix across the catalog's four quality SIGNALS — the
    heuristic score, the rule-based gopher gate, the learned probe, and
    the bigram-surprise proxy: pairwise Pearson correlations over their
    per-doc values, the report that tells a curation team which signals
    are redundant (corr near 1: drop one) and which disagree (corr near
    0: the ensemble is doing real work — the scalar counterpart of the
    kappa row's per-language view).  All four consumed rows are
    registered queries reused verbatim; every signal enters as an exact
    integer (quality is 1e-4-quantized so *10000 is lossless), all
    moments accumulate in int64, and each correlation is a fixed
    4-op IEEE sequence over integer-valued doubles — bit-identical
    cross-engine.  (At extreme scale the raw second moments approach
    int64 range; the standard fix is centering by a first-pass mean,
    which changes no semantics.)

    Plan shape: three doc_id equi-joins onto the quality frame (the
    probe chain is the only non-map consumed plan), then ONE 15-column
    moment aggregate (map-side partial, 1-row result) unpivoted to the
    6 pairs — no per-pair rescans."""
    q = QUERIES["text_quality_score"].spark(spark, sf_dir)
    g = QUERIES["text_gopher_gate"].spark(spark, sf_dir)
    p = QUERIES["corpus_quality_linear_probe"].spark(spark, sf_dir)
    b = QUERIES["text_bigram_lm_bits"].spark(spark, sf_dir)
    m = (
        q.select(
            "doc_id",
            F.floor(F.col("quality") * 10000 + 0.5).cast("long").alias("quality"),
        )
        .join(g.select("doc_id", F.col("keep").cast("long").alias("gopher_keep")), "doc_id")
        .join(p.select("doc_id", F.col("score_x1e6").alias("probe_score")), "doc_id")
        .join(
            b.select(
                "doc_id",
                F.expr("bits_sum * 256 div n_bigrams").alias("surprise_bin"),
            ),
            "doc_id",
        )
    )
    names = ["quality", "gopher_keep", "probe_score", "surprise_bin"]
    aggs = [F.count("*").cast("long").alias("n")]
    for c in names:
        aggs.append(F.sum(c).cast("long").alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).cast("long").alias(f"ss_{c}"))
    for a, bb in _SIGNAL_PAIRS:
        aggs.append(F.sum(F.col(a) * F.col(bb)).cast("long").alias(f"sp_{a}__{bb}"))
    t = m.agg(*aggs)
    stacked = ", ".join(
        f"'{a}', '{b}', {_corr_expr(a, b)}" for a, b in _SIGNAL_PAIRS
    )
    return (
        t.selectExpr(
            f"stack({len(_SIGNAL_PAIRS)}, {stacked}) AS (sig_a, sig_b, corr)",
            "n",
        )
        .select("sig_a", "sig_b", "n", "corr")
        .orderBy("sig_a", "sig_b")
    )


def _corr_expr(a: str, b: str) -> str:
    return (
        f"CAST(n * sp_{a}__{b} - s_{a} * s_{b} AS DOUBLE)"
        f" / greatest(sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))"
        f" * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)), 1e-12)"
    )


def _mixture_lattice(dims: int = 5, steps: int = 4) -> list[tuple[int, int, int]]:
    """(mix_id, dim_index, weight_in_quarters) rows of the integer
    simplex lattice — every nonnegative integer 5-tuple summing to
    ``steps``.  Generated once here and embedded as the SAME literal in
    both engines (the fixed-point-discounts pattern); mix_id is the
    lexicographic index, so both engines agree on identity."""
    import itertools as _it

    rows = []
    mid = 0
    for combo in _it.product(range(steps + 1), repeat=dims):
        if sum(combo) != steps:
            continue
        for d, w in enumerate(combo):
            rows.append((mid, d, w))
        mid += 1
    return rows


def _mixture_grid_oracle() -> str:
    gate_sql = QUERIES["text_gopher_gate"].oracle
    lat = _mixture_lattice()
    values = ", ".join(f"({m}, {d}, {w})" for m, d, w in lat)
    return f"""
    WITH gate AS ({gate_sql}),
    langs AS (
      SELECT lang, row_number() OVER (ORDER BY lang) - 1 AS d
      FROM (SELECT DISTINCT lang FROM documents)),
    kr AS (
      SELECT l.d, l.lang,
             CAST(sum(g.keep) * 10000 // count(*) AS BIGINT) AS keep_x1e4
      FROM documents doc JOIN gate g ON g.doc_id = doc.doc_id
      JOIN langs l ON l.lang = doc.lang
      GROUP BY l.d, l.lang),
    lat(mix_id, d, w) AS (VALUES {values}),
    scored AS (
      SELECT lat.mix_id,
             CAST(sum(lat.w * kr.keep_x1e4 * 2500) AS BIGINT) AS quality_x1e8,
             CAST(sum((lat.w * 2500) * (lat.w * 2500)) AS BIGINT)
               AS concentration_x1e8
      FROM lat JOIN kr USING (d) GROUP BY lat.mix_id),
    top AS (
      SELECT mix_id, quality_x1e8, concentration_x1e8,
             quality_x1e8 - concentration_x1e8 AS objective_x1e8
      FROM scored
      ORDER BY objective_x1e8 DESC, mix_id LIMIT 5)
    SELECT CAST(t.mix_id AS BIGINT) AS mix_id,
           t.quality_x1e8, t.concentration_x1e8, t.objective_x1e8,
           kr.lang, CAST(lat.w AS BIGINT) AS w_quarters
    FROM top t JOIN lat ON lat.mix_id = t.mix_id
    JOIN kr ON kr.d = lat.d
    ORDER BY t.objective_x1e8 DESC, t.mix_id, kr.lang
    """


@_register("corpus_mixture_grid_search", _mixture_grid_oracle())
def corpus_mixture_grid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture GRID SEARCH over the language simplex — the
    sweep-based complement to ``corpus_doremi_reweight``'s learned
    weights (teams sweep mixtures when no proxy-loss signal exists):
    every nonnegative quarter-weight 5-tuple summing to 1 (the 70-point
    integer simplex lattice, generated once in Python and embedded in
    BOTH engines as the same literal) is scored by
    quality - concentration, where quality is the mixture-weighted
    gopher keep-rate and concentration is the Herfindahl sum of squared
    weights (the diversity penalty — no entropy, no log, all int64).
    Output: the top-5 mixtures in long (mix, lang, weight) form.

    Plan shape: per-lang keep-rates are one lang-keyed aggregate over
    the map-only gopher gate (the one data-shaped stage); the lattice is
    a 350-row broadcast literal; scoring is a 70-key aggregate and the
    top-5 cut a TakeOrdered.  At 100 TB the lattice grows only with the
    sweep's resolution, never the corpus."""
    gate = QUERIES["text_gopher_gate"].spark(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    wl = Window.orderBy("lang")
    langs = (
        docs.select("lang").distinct()
        .select("lang", (F.row_number().over(wl) - 1).alias("d"))
    )
    kr = (
        docs.select("doc_id", "lang")
        .join(gate.select("doc_id", "keep"), "doc_id")
        .join(F.broadcast(langs), "lang")
        .groupBy("d", "lang")
        .agg(
            F.expr("CAST(sum(keep) * 10000 div count(*) AS BIGINT)").alias(
                "keep_x1e4"
            )
        )
    )
    lat = spark.createDataFrame(
        _mixture_lattice(), "mix_id long, d long, w long"
    )
    scored = (
        F.broadcast(lat)
        .join(kr, "d")
        .groupBy("mix_id")
        .agg(
            F.sum(F.col("w") * F.col("keep_x1e4") * 2500)
            .cast("long")
            .alias("quality_x1e8"),
            F.sum((F.col("w") * 2500) * (F.col("w") * 2500))
            .cast("long")
            .alias("concentration_x1e8"),
        )
        .withColumn(
            "objective_x1e8",
            (F.col("quality_x1e8") - F.col("concentration_x1e8")).cast("long"),
        )
    )
    top = scored.orderBy(F.col("objective_x1e8").desc(), "mix_id").limit(5)
    return (
        top.join(F.broadcast(lat), "mix_id")
        .join(kr.select("d", "lang"), "d")
        .select(
            "mix_id",
            "quality_x1e8",
            "concentration_x1e8",
            "objective_x1e8",
            "lang",
            F.col("w").cast("long").alias("w_quarters"),
        )
        .orderBy(F.col("objective_x1e8").desc(), "mix_id", "lang")
    )


def _poisson1_thresholds_x2e60(kmax: int = 7) -> list[int]:
    """floor(CDF_Poisson(1)(k) * 2^60) for k = 0..kmax-1 — integer
    thresholds against the 60-bit md5 uniform, computed ONCE here and
    embedded as the same Python ints in both engines (no exp()/factorial
    runs inside either engine).  weight = #{k : hv >= T_k}."""
    import math as _m

    cdf, term, out = 0.0, _m.exp(-1.0), []
    for k in range(kmax):
        cdf += term
        out.append(int(_m.floor(cdf * (1 << 60))))
        term /= k + 1
    return out


def _bootstrap_ci_oracle(b: int = 40) -> str:
    ts = _poisson1_thresholds_x2e60()
    w_terms = " + ".join(
        f"CASE WHEN hv >= {t} THEN 1 ELSE 0 END" for t in ts
    )
    return f"""
    WITH e AS (
      SELECT d.n_chars, t.b,
             CAST(concat('0x', substr(md5('boot:' || CAST(d.doc_id AS VARCHAR)
                    || ':' || CAST(t.b AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {b - 1})) AS b) t),
    w AS (SELECT b, n_chars, CAST({w_terms} AS BIGINT) AS w FROM e),
    rep AS (
      SELECT b,
             CAST(sum(w * n_chars) * 10000 // greatest(sum(w), 1) AS BIGINT)
               AS mean_x1e4
      FROM w GROUP BY b),
    rk AS (SELECT mean_x1e4, row_number() OVER (ORDER BY mean_x1e4, b) AS r
           FROM rep),
    pt AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(n_chars) * 10000 // count(*) AS BIGINT)
                    AS point_mean_x1e4
           FROM documents)
    SELECT pt.n_docs, pt.point_mean_x1e4,
           CAST({b} AS BIGINT) AS b_replicas,
           (SELECT CAST(mean_x1e4 AS BIGINT) FROM rk
             WHERE r = {max(1, -(-5 * b // 100))}) AS ci_lo_x1e4,
           (SELECT CAST(mean_x1e4 AS BIGINT) FROM rk
             WHERE r = {-(-95 * b // 100)}) AS ci_hi_x1e4
    FROM pt
    """


@_register("dq_bootstrap_ci_mean", _bootstrap_ci_oracle())
def dq_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for a corpus metric (mean
    document length) — the one-pass error-bar technique for metrics at
    scale: instead of resampling the corpus B times (B full shuffles),
    each row carries B deterministic Poisson(1) weights and every
    replica mean is a weighted aggregate of the SAME single pass.
    Weights come from the salted 60-bit md5 uniform compared against
    integer CDF thresholds precomputed once in Python and embedded in
    both engines — no exp(), no float comparison, bit-identical
    replicas.  The 90% interval is the exact rank-2/rank-38 pair of the
    40 replica means (deterministic, reproducible error bars — the
    thing a per-round quality dashboard needs before declaring a metric
    moved).

    Plan shape: one explode by B (the documented B-times row multiplier
    — still one SCAN, and at 100 TB the same math runs as B aggregate
    column pairs with zero explode if the multiplier matters), one
    B-keyed aggregate (map-side partial), and rank/CI windows over the
    constant B-row frame."""
    b = 40
    ts = _poisson1_thresholds_x2e60()
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    e = docs.select(
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("b"),
        "doc_id",
    ).select(
        "n_chars",
        "b",
        dedup.md5_hash60(
            F.concat(
                F.lit("boot:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        ).alias("hv"),
    )
    w_col = sum(
        F.when(F.col("hv") >= t, 1).otherwise(0) for t in ts
    ).cast("long")
    rep = (
        e.select("b", "n_chars", w_col.alias("w"))
        .groupBy("b")
        .agg(
            F.expr(
                "CAST(sum(w * n_chars) * 10000 div greatest(sum(w), 1) AS BIGINT)"
            ).alias("mean_x1e4")
        )
    )
    wr = Window.orderBy("mean_x1e4", "b")
    rk = rep.select("mean_x1e4", F.row_number().over(wr).alias("r"))
    k_lo = max(1, -(-5 * b // 100))
    k_hi = -(-95 * b // 100)
    lo = rk.filter(F.col("r") == k_lo).select(
        F.col("mean_x1e4").alias("ci_lo_x1e4")
    )
    hi = rk.filter(F.col("r") == k_hi).select(
        F.col("mean_x1e4").alias("ci_hi_x1e4")
    )
    pt = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("CAST(sum(n_chars) * 10000 div count(*) AS BIGINT)").alias(
            "point_mean_x1e4"
        ),
    )
    return (
        pt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_docs",
            "point_mean_x1e4",
            F.lit(b).cast("long").alias("b_replicas"),
            "ci_lo_x1e4",
            "ci_hi_x1e4",
        )
    )


def _registry_rank(item):
    name, qd = item
    if qd.oracle is None:
        return (3, 0)
    if name in _CHANGED_SINCE_PROOF:
        return (0, 0)
    if name not in _PRIOR_GREEN_ROUND:
        return (1, 0)
    return (2, _PRIOR_GREEN_ROUND[name])


def _reorder_registry() -> None:
    unknown = set(_PRIOR_GREEN_ROUND) - set(QUERIES)
    assert not unknown, f"prior-green names not registered: {unknown}"
    ranked = sorted(QUERIES.items(), key=_registry_rank)  # stable: keeps
    QUERIES.clear()                                       # registration order
    QUERIES.update(ranked)                                # within each rank


_reorder_registry()
