"""Round-11 (part 3): brute-force checks for the classifier-evaluation
panel in plans/mleval.py.

Pure-Python recomputation from the raw sf0.001 parquet: confusion
cells by literal row loops, the Youden/KS/cost optima by exhaustive
scans over EVERY distinct score (so a prefix-scan off-by-one in both
SQL dialects cannot hide), log-loss by math.log per document.
"""

from __future__ import annotations

import math

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"
STOP = {"the", "a", "of", "and", "to", "in", "is"}


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _scored():
    rows = fetch(f"SELECT value, event_type FROM '{SF}/events.parquet'")
    return [(v, 1 if t == "purchase" else 0) for v, t in rows]


def test_f1_threshold_sweep_brute(spark):
    data = _scored()
    got = {
        r["threshold"]: r
        for r in QUERIES["f1_threshold_sweep"](spark, SF).collect()
    }
    assert set(got) == {5, 10, 20, 50, 100}
    for th in (5, 10, 20, 50, 100):
        tp = sum(1 for v, y in data if y and v >= th)
        fp = sum(1 for v, y in data if not y and v >= th)
        fn = sum(1 for v, y in data if y and v < th)
        r = got[th]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
        if tp + fp:
            assert abs(r["precision_"] - tp / (tp + fp)) < 1e-6
        if tp + fn:
            assert abs(r["recall_"] - tp / (tp + fn)) < 1e-6
        if 2 * tp + fp + fn:
            assert abs(r["f1"] - 2 * tp / (2 * tp + fp + fn)) < 1e-6


def _roc_points():
    data = _scored()
    p = sum(y for _, y in data)
    n = len(data) - p
    pts = []
    for v in sorted({v for v, _ in data}):
        tp = sum(1 for s, y in data if y and s >= v)
        fp = sum(1 for s, y in data if not y and s >= v)
        pts.append((v, tp, fp))
    return data, p, n, pts


def test_youden_and_cost_brute(spark):
    data, p, n, pts = _roc_points()
    best_j = max(pts, key=lambda z: (z[1] / p - z[2] / n, -z[0]))
    got = QUERIES["youden_j_threshold"](spark, SF).collect()[0]
    assert got["threshold_value"] == best_j[0]
    assert got["tp"] == best_j[1] and got["fp"] == best_j[2]
    assert abs(got["youden_j"] - (best_j[1] / p - best_j[2] / n)) < 1e-6

    best_c = min(
        ((v, fp, p - tp, fp + 5 * (p - tp)) for v, tp, fp in pts),
        key=lambda z: (z[3], z[0]),
    )
    gc = QUERIES["expected_cost_threshold"](spark, SF).collect()[0]
    assert gc["threshold_value"] == best_c[0]
    assert gc["fp"] == best_c[1] and gc["fn"] == best_c[2]
    assert gc["total_cost"] == best_c[3]
    assert abs(gc["cost_per_event"] - best_c[3] / (p + n)) < 1e-6


def test_ks_separation_brute(spark):
    data, p, n, pts = _roc_points()
    # inclusive CDFs: fraction of class at value <= v
    best = None
    for v in sorted({s for s, _ in data}):
        cp = sum(1 for s, y in data if y and s <= v)
        cn = sum(1 for s, y in data if not y and s <= v)
        gap = abs(cp / p - cn / n)
        if best is None or gap > best[1] + 1e-15:
            best = (v, gap)
    got = QUERIES["ks_class_separation"](spark, SF).collect()[0]
    assert got["n_positive"] == p and got["n_negative"] == n
    assert got["at_value"] == best[0]
    assert abs(got["ks_statistic"] - best[1]) < 1e-6


def _docs():
    return fetch(f"SELECT lang, text FROM '{SF}/documents.parquet'")


def test_balanced_accuracy_brute(spark):
    tp = fp = fn = tn = 0
    for lang, text in _docs():
        ws = text.split(" ")
        if not ws:
            continue
        y = 1 if lang == "en" else 0
        yhat = 1 if sum(1 for w in ws if w in STOP) / len(ws) >= 0.04 else 0
        if y and yhat:
            tp += 1
        elif yhat:
            fp += 1
        elif y:
            fn += 1
        else:
            tn += 1
    ba = 0.5 * (tp / (tp + fn) + tn / (tn + fp))
    mf1 = 0.5 * (
        2 * tp / (2 * tp + fp + fn) + 2 * tn / (2 * tn + fn + fp)
    )
    got = QUERIES["balanced_accuracy_lang_id"](spark, SF).collect()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    assert abs(got["balanced_accuracy"] - ba) < 1e-6
    assert abs(got["macro_f1"] - mf1) < 1e-6


def test_logloss_bins_brute(spark):
    bins = {}
    for lang, text in _docs():
        ws = text.split(" ")
        if not ws:
            continue
        pos = 1 if lang == "en" else 0
        hits = sum(1 for w in ws if w in STOP)
        b = min(10 * hits // len(ws), 9)
        ph = min(max(hits / len(ws), 1e-6), 1 - 1e-6)
        ll = -(pos * math.log(ph) + (1 - pos) * math.log(1 - ph))
        cnt, npos, tot = bins.get(b, (0, 0, 0.0))
        bins[b] = (cnt + 1, npos + pos, tot + ll)
    got = {
        r["bin"]: r
        for r in QUERIES["logloss_by_calibration_bin"](spark, SF).collect()
    }
    assert set(got) == set(bins)
    for b, (cnt, npos, tot) in bins.items():
        r = got[b]
        assert r["n_docs"] == cnt and r["n_positive"] == npos
        assert abs(r["mean_logloss"] - tot / cnt) < 1e-5
