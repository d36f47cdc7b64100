"""Round-15 bench driver-visibility contract (r14 verdict task 2).

Pins the two harness behaviors the round-14 judge flagged:

1. ``_current_round`` derives from GIT-TRACKED BENCH_r*.json, so a
   same-round re-run after the first run wrote BENCH_r{N}.json to the
   working tree (the round-14 low-core scaling pass) computes the SAME
   round and the same audit-deferral set.
2. The compact stdout line sheds non-headline entries first: the
   driver-adjudicated headline set stays visible until the pinned set
   alone overflows the budget.
"""

from __future__ import annotations

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_current_round_ignores_untracked_round_files(monkeypatch):
    """An untracked BENCH_r99.json in the working tree (the shape the
    driver's first in-round run leaves behind) must NOT advance the
    computed round — only a committed round file may."""
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    base = bench._current_round()
    probe = os.path.join(REPO, "BENCH_r99.json")
    assert not os.path.exists(probe)
    try:
        with open(probe, "w") as f:
            f.write("{}")
        assert bench._current_round() == base
    finally:
        os.remove(probe)


def test_current_round_env_override_still_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "21")
    assert bench._current_round() == 21


def test_shed_protects_headline_entries():
    """Cheap headline entries survive shedding while cheaper-per-char
    non-headline entries go first."""
    headline = sorted(bench.HEADLINE_QUERIES)[:20]
    filler = [f"zz_filler_query_number_{i:03d}" for i in range(60)]
    timings = {k: 0.01 for k in filler}
    # headline entries are EXPENSIVE here is NOT the point — make them
    # cheap so only the headline flag can save them
    timings.update({k: 0.005 for k in headline})
    compact = {
        "metric": "total_sec",
        "value": 1.0,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": 0.1,
    }
    bench._shed_to_budget(compact, timings, budget=900)
    kept = set(compact["queries"])
    assert len(json.dumps(compact, separators=(",", ":"))) <= 900
    # every headline entry survived; the shed came from the filler
    assert set(headline) <= kept
    assert compact["omitted"] > 0


def test_shed_falls_back_to_headline_when_pinned_overflows():
    """If the pinned set alone overflows, the budget still wins (the
    one-line contract beats the pinning)."""
    headline = sorted(bench.HEADLINE_QUERIES)
    timings = {k: 1.0 for k in headline}
    compact = {"metric": "total_sec", "value": 1.0, "unit": "sec",
               "queries": dict(timings), "sf": 0.1}
    bench._shed_to_budget(compact, timings, budget=300)
    assert len(json.dumps(compact, separators=(",", ":"))) <= 300
    assert compact["queries"]  # sheds to fit, never to empty


def test_headline_names_resolve():
    """Every pinned headline name is a real benched query (a typo here
    would silently un-pin an adjudicated entry)."""
    for name in bench.HEADLINE_QUERIES:
        assert name in bench.BENCH_QUERIES, name
