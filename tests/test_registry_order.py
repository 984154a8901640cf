"""Registry-ordering invariants.

The registry is sorted by external-verification value (see the "Registry
ordering" section of plans/catalog.py): oracled-but-never-externally-green
queries first, then previously-green oracled queries LEAST-RECENTLY-PROVEN
first, unoracled queries last, ties in original registration order.  An
external checker that samples the registry in order therefore spends its
budget on the queries whose green signal is most in need of (re)proving —
the driver regenerates testdata between rounds, so old green rows age —
and a careless reorder of the source file cannot silently push a stale
query out of reach or an unoracled query into a checkable slot."""

from __future__ import annotations

from reddit_sse_stream_spark.plans.catalog import (
    _PRIOR_GREEN_ROUND,
    _registry_rank,
    QUERIES,
)


def test_registry_rank_is_monotone():
    ranks = [_registry_rank((n, q)) for n, q in QUERIES.items()]
    assert ranks == sorted(ranks), "registry not ordered by verification rank"


def test_prior_green_names_are_registered():
    assert set(_PRIOR_GREEN_ROUND) <= set(QUERIES)


def test_never_green_oracled_queries_come_first():
    names = list(QUERIES)
    n_front = sum(
        1
        for n, q in QUERIES.items()
        if q.oracle is not None and n not in _PRIOR_GREEN_ROUND
    )
    front = names[:n_front]
    assert all(
        QUERIES[n].oracle is not None and n not in _PRIOR_GREEN_ROUND
        for n in front
    )


def test_any_prefix_of_oracled_queries_is_fully_oracled():
    """Every query without an oracle sorts after every query with one, so
    ANY prefix-sampling checker only ever sees checkable queries (until the
    oracled pool is exhausted)."""
    names = list(QUERIES)
    unoracled = [n for n in names if QUERIES[n].oracle is None]
    assert names[-len(unoracled) :] == unoracled


def test_green_queries_ordered_stalest_first():
    """Within the already-proven segment, a query proven in an EARLIER
    round must never sort after one proven later — the sampling window
    re-proves the stalest rows against freshly regenerated testdata."""
    rounds = [
        _PRIOR_GREEN_ROUND[n] for n in QUERIES if n in _PRIOR_GREEN_ROUND
    ]
    assert rounds == sorted(rounds)


def test_stale_rows_rotated_into_the_front_window():
    """r05 state: every green slot left after the never-proven queries must
    go to the LEAST-recently-proven rows (the driver regenerates testdata
    between rounds, so old green ages) — and the rows just proven in r04
    must have rotated OUT.  Phrased against the rank function rather than
    a fixed era so adding new (never-green, rank-0) queries shrinks the
    re-proof budget without faking a rotation failure."""
    names = list(QUERIES)
    front = names[:50]
    rank0 = [
        n
        for n in names
        if QUERIES[n].oracle is not None and n not in _PRIOR_GREEN_ROUND
    ]
    if len(rank0) >= 50:
        # a round that added >= 50 never-proven queries: the entire window
        # is rank-0 by design — every slot goes to a query with no
        # external proof at all, the highest-value case
        assert all(n in rank0 for n in front)
        return
    green_in_front = [n for n in front if n in _PRIOR_GREEN_ROUND]
    green_out = [
        n for n in names[50:] if n in _PRIOR_GREEN_ROUND
    ]
    # stalest-first up to same-round ties (ties break in registration
    # order, which is fine — they are equally in need of re-proof)
    assert green_in_front and green_out
    assert max(_PRIOR_GREEN_ROUND[n] for n in green_in_front) <= min(
        _PRIOR_GREEN_ROUND[n] for n in green_out
    )
    just_proven = {n for n, r in _PRIOR_GREEN_ROUND.items() if r >= 4}
    assert not (just_proven & set(front))
