"""Round-11 (part 9): brute-force checks for importance-weight ESS,
split-conformal intervals, and pinball loss.

Pure-Python recomputation from the raw sf0.001 parquet; the conformal
test re-draws the md5 split, re-fits the hour-of-day means, and takes
the order statistic from a literal sorted list.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_importance_weight_ess_brute(spark):
    langs = [
        lang for (lang,) in fetch(f"SELECT lang FROM '{SF}/documents.parquet'")
    ]
    c = Counter(langs)
    t, k = len(langs), len(c)
    w = {lang: (t / (k * n)) for lang, n in c.items()}
    got = {
        r["clip_at"]: r
        for r in QUERIES["importance_weight_ess"](spark, SF).collect()
    }
    assert set(got) == {1.0, 5.0, 10.0}
    for clip in (1.0, 5.0, 10.0):
        ws = [min(w[lang], clip) for lang in langs]
        ess = sum(ws) ** 2 / sum(x * x for x in ws)
        r = got[clip]
        assert abs(r["ess"] - ess) < 1e-3
        assert abs(r["ess_fraction"] - ess / t) < 1e-5
        assert abs(r["mean_clipped_weight"] - sum(ws) / t) < 1e-5


def test_split_conformal_brute(spark):
    rows = fetch(
        f"SELECT event_id, hour(ts), value FROM '{SF}/events.parquet'"
    )
    cal, tst = [], []
    for eid, hod, v in rows:
        half = (
            int(hashlib.md5(f"conf|{eid}".encode()).hexdigest()[:15], 16)
            % 2
        )
        (cal if half == 0 else tst).append((eid, hod, round(v * 100)))
    pred = {}
    agg = {}
    for _, hod, cv in cal:
        s, n = agg.get(hod, (0, 0))
        agg[hod] = (s + cv, n + 1)
    pred = {hod: s / n for hod, (s, n) in agg.items()}
    scores = sorted(
        (abs(cv - pred[hod]), eid) for eid, hod, cv in cal
    )
    n_cal = len(scores)
    k = math.ceil((n_cal + 1) * 0.9)
    q = scores[k - 1][0]
    tst2 = [(eid, hod, cv) for eid, hod, cv in tst if hod in pred]
    covered = sum(
        1 for _, hod, cv in tst2 if abs(cv - pred[hod]) <= q
    )
    got = QUERIES["split_conformal_value_interval"](spark, SF).collect()[0]
    assert got["n_cal"] == n_cal
    assert got["n_test"] == len(tst2)
    assert abs(got["q_hat"] - q / 100.0) < 1e-5
    assert abs(got["coverage"] - covered / len(tst2)) < 1e-6
    # the conformal guarantee itself (exchangeability => >= ~0.9 up to
    # discretization): loose sanity bound, not an exact identity
    assert got["coverage"] > 0.8


def test_pinball_loss_brute(spark):
    rows = fetch(
        f"""
        WITH b AS (SELECT MIN(date_trunc('hour', ts)) AS h0
                   FROM '{SF}/events.parquet')
        SELECT date_diff('hour', b.h0, date_trunc('hour', e.ts)), COUNT(*)
        FROM '{SF}/events.parquet' e CROSS JOIN b GROUP BY 1
        """
    )
    span = max(hr for hr, _ in rows)
    y = [0] * (span + 1)
    for hr, n in rows:
        y[hr] = n
    got = {
        r["quantile"]: r
        for r in QUERIES["pinball_loss_hourly"](spark, SF).collect()
    }
    assert set(got) == {0.1, 0.5, 0.9}
    for q in (0.1, 0.5, 0.9):
        losses = []
        for t in range(24, len(y)):
            err = y[t] - y[t - 24]
            losses.append(q * err if err >= 0 else (q - 1) * err)
        r = got[q]
        assert r["n_forecasts"] == len(losses)
        assert abs(r["pinball_loss"] - sum(losses) / len(losses)) < 1e-5
