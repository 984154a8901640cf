"""Unit tests for bench.py's vs-prev comparison logic (VERDICT r06 next
#3): the real calibration signal depends on the host each round runs on,
so the flagging LOGIC is pinned here on synthetic artifacts — every branch
of machine_factor / calibration_factor / machine_factor_disagrees is
exercised without a SparkSession."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

TIMES = {"q1": 1.0, "q2": 2.0, "q3": 4.0}


def test_uniform_shift_is_machine_factor_not_regressions():
    prev = {"sf": 0.1, "queries": {"q1": 0.5, "q2": 1.0, "q3": 2.0}}
    out = bench.compare_to_prev(TIMES, 0.1, prev, calib=None)
    assert out["machine_factor"] == 2.0  # everything exactly 2x slower
    assert out["regressions"] == []  # uniform -> environment, not code


def test_single_query_regression_flagged_relative_to_median():
    prev = {"sf": 0.1, "queries": {"q1": 1.0, "q2": 2.0, "q3": 1.0}}
    out = bench.compare_to_prev(TIMES, 0.1, prev, calib=None)
    # q1/q2 at 1.0x -> median 1.0; q3 at 4.0x > 1.5x relative -> flagged
    assert out["machine_factor"] == 1.0
    assert out["regressions"] == ["q3"]


def test_different_sf_prior_clears_vs_prev_and_disagree():
    """ADVICE r06 low: an sf-mismatched prior must not leave
    machine_factor_disagrees computable — machine_factor would be the 1.0
    default with no query comparison behind it."""
    prev = {
        "sf": 0.01,  # prior at a different scale factor
        "queries": {"q1": 0.5, "q2": 1.0, "q3": 2.0},
        "calib_jvm_sec": 0.1,
        "calib_py_sec": 0.1,
    }
    calib = {"calib_jvm_sec": 0.5, "calib_py_sec": 0.5}  # probes 5x slower
    out = bench.compare_to_prev(TIMES, 0.1, prev, calib)
    assert out["vs_prev"] == {}
    assert out["machine_factor"] == 1.0
    # the probe ratio IS computed (probes are sf-independent)...
    assert out["calibration_factor"] == 5.0
    # ...but disagree stays False: no query-side estimator to disagree with
    assert out["machine_factor_disagrees"] is False


def test_disagree_fires_when_query_factor_and_probes_diverge():
    """Queries uniformly 2x slower while the synthetic probes are flat:
    that 2x is NOT the machine — the signature of a real uniform
    regression (a session conf mistake, a slow default flipped) that the
    query-derived median alone would launder as 'environment'."""
    prev = {
        "sf": 0.1,
        "queries": {"q1": 0.5, "q2": 1.0, "q3": 2.0},
        "calib_jvm_sec": 0.2,
        "calib_py_sec": 0.4,
    }
    calib = {"calib_jvm_sec": 0.2, "calib_py_sec": 0.4}  # host unchanged
    out = bench.compare_to_prev(TIMES, 0.1, prev, calib)
    assert out["machine_factor"] == 2.0
    assert out["calibration_factor"] == 1.0
    assert out["machine_factor_disagrees"] is True


def test_agreement_within_band_does_not_fire():
    prev = {
        "sf": 0.1,
        "queries": {"q1": 0.5, "q2": 1.0, "q3": 2.0},
        "calib_jvm_sec": 0.2,
        "calib_py_sec": 0.4,
    }
    # probes ~2x slower too: same machine-wide story as the queries
    calib = {"calib_jvm_sec": 0.38, "calib_py_sec": 0.84}
    out = bench.compare_to_prev(TIMES, 0.1, prev, calib)
    assert out["machine_factor"] == 2.0
    assert out["machine_factor_disagrees"] is False


def test_prior_without_probes_gives_vacuous_calibration():
    prev = {"sf": 0.1, "queries": {"q1": 1.0, "q2": 2.0, "q3": 4.0}}
    calib = {"calib_jvm_sec": 0.2, "calib_py_sec": 0.4}
    out = bench.compare_to_prev(TIMES, 0.1, prev, calib)
    assert out["calibration_factor"] == 1.0
    assert out["machine_factor_disagrees"] is False


def test_one_volatile_probe_with_other_agreeing_does_not_fire():
    """r07 field observation: the JVM probe swings 3x with host load
    (0.071-0.225 s on equivalent hosts) while the Python probe and the
    queries stay flat — that is probe noise, not a uniform regression,
    and must NOT flag.  The regression signature requires the query
    factor to sit outside the band of EVERY probe family."""
    prev = {
        "sf": 0.1,
        "queries": {"q1": 1.0, "q2": 2.0, "q3": 4.0},  # queries flat (1.0x)
        "calib_jvm_sec": 0.225,
        "calib_py_sec": 0.144,
    }
    calib = {"calib_jvm_sec": 0.071, "calib_py_sec": 0.143}  # jvm wild
    out = bench.compare_to_prev(TIMES, 0.1, prev, calib)
    assert out["machine_factor"] == 1.0
    assert out["machine_factor_disagrees"] is False


def test_disagree_requires_both_families_outside_band():
    """Queries 2x slower, BOTH probes flat -> fires (each family
    individually outside the band)."""
    prev = {
        "sf": 0.1,
        "queries": {"q1": 0.5, "q2": 1.0, "q3": 2.0},  # queries 2x
        "calib_jvm_sec": 0.2,
        "calib_py_sec": 0.4,
    }
    calib = {"calib_jvm_sec": 0.2, "calib_py_sec": 0.4}
    out = bench.compare_to_prev(TIMES, 0.1, prev, calib)
    assert out["machine_factor_disagrees"] is True
