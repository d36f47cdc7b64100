"""Pure-Python unit tests for round-5 helpers (no SparkSession needed):
A5 statistical identity edge cases and the shared rounding helper."""

from veri_spark.operators.stats import statistical_identity
from veri_spark.plans._base import _round_half_up


def test_statistical_identity_self_is_identical():
    info = {"n": 10, "avg": [1.0, 2.0], "max_distance": 3.0,
            "hist": [0.5, 0.5]}
    same, score, thr = statistical_identity(info, info)
    assert same and score == 0.0 and thr == 0.03


def test_statistical_identity_empty_stats_compare_equal():
    """Two empty datasets: zero drift against a zero threshold — identical
    (<=, matching the reference's inclusive compare)."""
    empty = {"n": 0, "avg": [], "max_distance": 0.0, "hist": []}
    same, score, thr = statistical_identity(empty, empty)
    assert same and score == 0.0 and thr == 0.0


def test_statistical_identity_empty_vs_populated_not_identical():
    """A populated dataset vs empty: the zero-length avg/hist overlap
    would vacuously score 0 drift — the degenerate guard must report
    drifted (infinite score), not identical."""
    import math

    empty = {"n": 0, "avg": [], "max_distance": 0.0, "hist": []}
    full = {"n": 5, "avg": [1.0], "max_distance": 2.0, "hist": [1.0]}
    same, score, thr = statistical_identity(empty, full)
    assert not same and math.isinf(score) and thr == 0.02


def test_statistical_identity_threshold_scales_with_max_dist():
    a = {"n": 5, "avg": [0.0, 0.0], "max_distance": 10.0, "hist": [1.0, 0.0]}
    b = {"n": 5, "avg": [0.05, 0.0], "max_distance": 1.0, "hist": [1.0, 0.0]}
    same, score, thr = statistical_identity(a, b)
    # threshold from the LARGER max_distance (symmetric): 0.01 * 10
    assert thr == 0.1 and abs(score - 0.05) < 1e-12 and same
    same2, _, thr2 = statistical_identity(a, b, rel_tol=0.001)
    assert thr2 == 0.01 and not same2


def test_round_half_up_matches_sql_round():
    # half-AWAY-from-zero, unlike Python's banker's rounding
    assert _round_half_up(0.5, 0) == 1.0
    assert _round_half_up(-0.5, 0) == -1.0
    assert _round_half_up(2.675, 2) in (2.67, 2.68)  # fp representation
    assert _round_half_up(1.25, 1) == 1.3
    assert round(1.25, 1) == 1.2  # the divergence this helper exists for
