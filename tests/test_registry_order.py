"""Registry-ordering invariants.

The registry is sorted by external-verification value (see the "Registry
ordering" section of plans/catalog.py): (0) oracled queries whose
DEFINITION changed after their latest recorded proof — the green row
validated older semantics, so it is not evidence about the current code
(VERDICT r06 next #1); (1) oracled-but-never-externally-green queries;
(2) previously-green oracled queries LEAST-RECENTLY-PROVEN first;
(3) unoracled queries last; ties in original registration order.  An
external checker that samples the registry in order therefore spends its
budget on the queries whose green signal is most in need of (re)proving —
the driver regenerates testdata between rounds, so old green rows age —
and a careless reorder of the source file cannot silently push a stale
query out of reach or an unoracled query into a checkable slot."""

from __future__ import annotations

from reddit_sse_stream_spark.plans.catalog import (
    _CHANGED_SINCE_PROOF,
    _PRIOR_GREEN_ROUND,
    _registry_rank,
    QUERIES,
)


def test_registry_rank_is_monotone():
    ranks = [_registry_rank((n, q)) for n, q in QUERIES.items()]
    assert ranks == sorted(ranks), "registry not ordered by verification rank"


def test_prior_green_names_are_registered():
    assert set(_PRIOR_GREEN_ROUND) <= set(QUERIES)
    assert set(_CHANGED_SINCE_PROOF) <= set(QUERIES)


def test_changed_since_proof_queries_come_first():
    """A query whose semantics changed after its last proof outranks
    EVERYTHING — its green row is about code that no longer exists, the
    most urgent external re-check there is."""
    names = list(QUERIES)
    n_changed = sum(
        1
        for n, q in QUERIES.items()
        if q.oracle is not None and n in _CHANGED_SINCE_PROOF
    )
    # n_changed == 0 is legitimate right after a window re-proves every
    # pinned rewrite (r10 did exactly that); the invariant is positional,
    # not a minimum population.
    assert set(names[:n_changed]) == {
        n
        for n, q in QUERIES.items()
        if q.oracle is not None and n in _CHANGED_SINCE_PROOF
    }


def test_changed_pins_fit_inside_a_50_slot_window():
    """The whole point of tier 0 is that the driver's fixed sampling
    window reaches it; a curation that grows past the window silently
    un-pins the tail (why the regen tool emits candidates for REVIEW
    rather than a paste-ready set)."""
    assert len(_CHANGED_SINCE_PROOF) <= 50


def test_never_green_oracled_queries_right_after_changed():
    """Never-proven rows head the window (the r12 yield-tier set
    _R12_LOCAL_ONLY was deleted in r13 after CORRECTNESS_r12 was folded
    into _PRIOR_GREEN_ROUND; its never-proven members fall back to this
    head tier as designed)."""
    names = list(QUERIES)
    n_changed = sum(1 for n in _CHANGED_SINCE_PROOF if n in QUERIES)
    rank1 = [
        n
        for n, q in QUERIES.items()
        if q.oracle is not None
        and n not in _PRIOR_GREEN_ROUND
        and n not in _CHANGED_SINCE_PROOF
    ]
    assert names[n_changed : n_changed + len(rank1)] == sorted(
        rank1, key=names.index
    )
    assert all(
        QUERIES[n].oracle is not None and n not in _PRIOR_GREEN_ROUND
        for n in names[n_changed : n_changed + len(rank1)]
    )


def test_any_prefix_of_oracled_queries_is_fully_oracled():
    """Every query without an oracle sorts after every query with one, so
    ANY prefix-sampling checker only ever sees checkable queries (until the
    oracled pool is exhausted)."""
    names = list(QUERIES)
    unoracled = [n for n in names if QUERIES[n].oracle is None]
    assert names[-len(unoracled) :] == unoracled


def test_green_queries_ordered_stalest_first():
    """Within the already-proven-and-unchanged segment, a query proven in
    an EARLIER round must never sort after one proven later — the sampling
    window re-proves the stalest rows against freshly regenerated
    testdata."""
    rounds = [
        _PRIOR_GREEN_ROUND[n]
        for n in QUERIES
        if n in _PRIOR_GREEN_ROUND and n not in _CHANGED_SINCE_PROOF
    ]
    assert rounds == sorted(rounds)


def test_stale_rows_rotated_into_the_front_window():
    """Every green slot left in the 50-query window after the changed and
    never-proven tiers must go to the LEAST-recently-proven rows (the
    driver regenerates testdata between rounds, so old green ages) — and
    rows just proven in the latest round must have rotated OUT unless
    their code changed again.  Phrased against the rank function rather
    than a fixed era so adding new (rank-1) queries shrinks the re-proof
    budget without faking a rotation failure."""
    names = list(QUERIES)
    front = names[:50]
    pre_green = [
        n
        for n in names
        if QUERIES[n].oracle is not None
        and (n in _CHANGED_SINCE_PROOF or n not in _PRIOR_GREEN_ROUND)
    ]
    if len(pre_green) >= 50:
        assert all(n in pre_green for n in front)
        return
    aged = [
        n
        for n in names
        if n in _PRIOR_GREEN_ROUND and n not in _CHANGED_SINCE_PROOF
    ]
    green_in_front = [n for n in front if n in aged]
    green_out = [n for n in names[50:] if n in aged]
    assert green_in_front and green_out
    assert max(_PRIOR_GREEN_ROUND[n] for n in green_in_front) <= min(
        _PRIOR_GREEN_ROUND[n] for n in green_out
    )
    latest = max(_PRIOR_GREEN_ROUND.values())
    just_proven = {
        n
        for n, r in _PRIOR_GREEN_ROUND.items()
        if r >= latest and n not in _CHANGED_SINCE_PROOF
    }
    assert not (just_proven & set(front))
