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


def test_unproven_rows_are_in_front_for_verification():
    """After the round-3 rotation, rows the driver has never hash-verified
    (the analytics tail, decontam variants, md5 dedup twins, ...) plus the
    one r03-red row (tpch_q9) must occupy the front of the 50-slot window,
    while rows already proven green (e.g. the round-2 fixes, all green in
    r03) must have rotated OUT of the front."""
    names = list(QUERIES)
    front = set(names[:50])
    never_checked = {
        "tpch_q9_profit_by_nation_year",  # red in r03 (reassociation cent)
        "funnel_view_click_purchase",
        "decontam_ngram_overlap",
        "fn_sequence_range",
        "embed_norm_stats_by_lang",
        "media_features_meta",
    }
    assert never_checked & set(QUERIES) <= front
    r03_green = {
        "a2_bytes_total",
        "s8_keepalive_counters",
        "sessionize_events",
        "udf_pandas_scalar_charge",
        "pack_sequences_by_source",
    }
    assert r03_green <= _PRIOR_DRIVER_GREEN
