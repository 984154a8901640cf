"""Registry-ordering invariants.

The registry is sorted by external-verification value (see the "Registry
ordering" section of plans/catalog.py): oracled-but-never-externally-green
queries first, previously-green oracled queries second, unoracled queries
last, each group in original registration order.  An external checker that
samples the registry in order therefore always spends its budget on
checkable queries it has not yet proven — and a careless reorder of the
source file cannot silently push an unverified query out of reach or an
unoracled query into a checkable slot."""

from __future__ import annotations

from reddit_sse_stream_spark.plans.catalog import (
    _PRIOR_DRIVER_GREEN,
    _registry_rank,
    QUERIES,
)


def test_registry_rank_is_monotone():
    ranks = [_registry_rank((n, q)) for n, q in QUERIES.items()]
    assert ranks == sorted(ranks), "registry not ordered by verification rank"


def test_prior_green_names_are_registered():
    assert _PRIOR_DRIVER_GREEN <= set(QUERIES)


def test_never_green_oracled_queries_come_first():
    names = list(QUERIES)
    n_front = sum(
        1
        for n, q in QUERIES.items()
        if q.oracle is not None and n not in _PRIOR_DRIVER_GREEN
    )
    front = names[:n_front]
    assert all(
        QUERIES[n].oracle is not None and n not in _PRIOR_DRIVER_GREEN
        for n in front
    )


def test_any_prefix_of_oracled_queries_is_fully_oracled():
    """Every query without an oracle sorts after every query with one, so
    ANY prefix-sampling checker only ever sees checkable queries (until the
    oracled pool is exhausted)."""
    names = list(QUERIES)
    unoracled = [n for n in names if QUERIES[n].oracle is None]
    assert names[-len(unoracled) :] == unoracled


def test_newly_fixed_rows_are_in_front_for_reverification():
    """The round-2 red rows (values fixed in round 3) have no prior green
    record, so the generic rule must surface them for external
    re-verification."""
    names = list(QUERIES)
    fixed = {
        "a2_bytes_total",
        "s8_keepalive_counters",
        "sessionize_events",
        "udf_pandas_scalar_charge",
        "pack_sequences_by_source",
    }
    assert fixed <= set(names[:50])
