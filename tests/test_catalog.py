"""Catalog-wide correctness: every query with an oracle must match DuckDB at
sf0.001 (row count + sorted column names + order-insensitive values) — the
same gate the driver applies at sf0.01."""

from __future__ import annotations

import math

import pytest

from reddit_sse_stream_spark.plans.catalog import QUERIES


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, bool):
        return int(v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_catalog_query(name, spark, duck, sf_dir):
    qd = QUERIES[name]
    sdf = qd.spark(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if qd.oracle is None:
        assert srows is not None  # rows-only smoke: plan executes
        return
    res = duck.execute(qd.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_approx_distinct_error_band(spark, duck, sf_dir):
    """approx_count_distinct has no cross-engine oracle (HLL sketches
    differ), so give it a falsifiable accuracy bar instead: within 5% of
    the exact count per group."""
    from reddit_sse_stream_spark.plans.catalog import QUERIES

    approx = {
        tuple(r)[0]: tuple(r)[1]
        for r in QUERIES["aggx_approx_distinct"].spark(spark, sf_dir).collect()
    }
    exact = {
        k: v
        for k, v in duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.05 * n, 2), (k, approx[k], n)


def test_approx_quantiles_error_band(spark, duck, sf_dir):
    """percentile_approx has no cross-engine oracle (different sketches);
    bound it against DuckDB's exact discrete quantile instead: within 5%
    of the group's value range."""
    from reddit_sse_stream_spark.plans.catalog import QUERIES

    approx = {
        r["event_type"]: (r["p50_approx"], r["p99_approx"])
        for r in QUERIES["aggx_approx_quantiles"].spark(spark, sf_dir).collect()
    }
    exact = {
        k: (p50, p99, hi - lo)
        for k, p50, p99, lo, hi in duck.execute(
            "SELECT event_type, quantile_disc(value, 0.5), quantile_disc(value, 0.99),"
            "       min(value), max(value) FROM events GROUP BY event_type"
        ).fetchall()
    }
    assert set(approx) == set(exact)
    for k, (p50, p99, spread) in exact.items():
        tol = max(0.05 * spread, 1e-9)
        assert abs(approx[k][0] - p50) <= tol, (k, approx[k][0], p50)
        assert abs(approx[k][1] - p99) <= tol, (k, approx[k][1], p99)


def test_freq_items_superset_of_exact_heavy_hitters(spark, sf_dir):
    """The one-pass freqItems sketch (KPS) guarantees every item above the
    support threshold appears in its output (false positives allowed,
    false negatives not) — pin that against the exact two-pass query."""
    from reddit_sse_stream_spark.plans.catalog import QUERIES
    from reddit_sse_stream_spark.sources.feed import feed_df

    exact = {
        r["author"]
        for r in QUERIES["agg_heavy_hitters_exact"].spark(spark, sf_dir).collect()
    }
    assert exact, "threshold too high: exact heavy-hitter set is empty"
    sketch = set(
        feed_df(spark, sf_dir)
        .stat.freqItems(["author"], support=0.02)
        .collect()[0][0]
    )
    assert exact <= sketch
