"""Round-10 (part 4): brute-force checks for the batch-7 queries (ERR@10,
Yule's Q/Y, Cohen's h, Mantel-Haenszel OR, Wilson CI).

Plain-Python recomputation from raw sf0.001 parquet (numpy for the ERR
rankings); the ERR check re-implements the WHOLE IVF pipeline — raw-seed
centroids, nearest-centroid assignment, 2-probe candidate set, cascade
ERR — from the definitions, not through any package helper.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"
Z = 1.959963984540054


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_ann_err_audit_brute(spark):
    rows = fetch(
        f"SELECT vec_id, embedding::DOUBLE[]"
        f" FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    )
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows])
    cents = x[ids < 8]
    cent_ids = ids[ids < 8]

    def nearest(order_scores, tie_ids, k):
        order = sorted(range(len(tie_ids)), key=lambda i: (order_scores[i], tie_ids[i]))
        return [int(tie_ids[i]) for i in order[:k]]

    # nearest-centroid assignment per vector
    assign = {}
    for i in range(len(ids)):
        d = np.linalg.norm(cents - x[i], axis=1)
        assign[int(ids[i])] = nearest(d, cent_ids, 1)[0]
    got = {
        r["query_id"]: r for r in QUERIES["ann_err_audit"](spark, SF).collect()
    }
    assert set(got) == {0, 1, 2}
    for q in (0, 1, 2):
        qv = x[ids == q][0]
        dq = np.linalg.norm(x - qv, axis=1)
        exact = set(nearest(dq, ids, 10))
        probe_d = np.linalg.norm(cents - qv, axis=1)
        probes = set(nearest(probe_d, cent_ids, 2))
        cand = [i for i in range(len(ids)) if assign[int(ids[i])] in probes]
        approx = nearest(dq[cand], ids[cand], 10)
        err_nano = 0
        seen = 0
        for rn, vid in enumerate(approx, start=1):
            if vid in exact:
                err_nano += round(1e9 * (1.0 / rn) * 0.5 ** (seen + 1))
                seen += 1
        assert got[q]["err_nano"] == err_nano
        assert abs(got[q]["err_at_10"] - err_nano / 1e9) < 5e-7


def test_yule_q_brute(spark):
    rows = fetch(f"SELECT text FROM '{SF}/documents.parquet'")
    sw = {"the", "a", "of", "and", "to", "in", "is"}
    a = b = c = d = 0
    for (text,) in rows:
        ws = text.split(" ")
        if not ws or ws == [""]:
            continue
        r_wc = 20 <= len(ws) <= 90
        r_sw = sum(1 for w in ws if w in sw) >= 2
        if r_wc and r_sw:
            a += 1
        elif r_wc:
            b += 1
        elif r_sw:
            c += 1
        else:
            d += 1
    q = (a * d - b * c) / (a * d + b * c)
    y = (math.sqrt(a * d) - math.sqrt(b * c)) / (
        math.sqrt(a * d) + math.sqrt(b * c)
    )
    got = QUERIES["yule_q_rules"](spark, SF).collect()[0]
    assert got["n_docs"] == a + b + c + d
    assert got["n_both_pass"] == a and got["n_disagree"] == b + c
    assert abs(got["yule_q"] - q) < 1e-6
    assert abs(got["yule_y"] - y) < 1e-6


def _weekend_2x2():
    rows = fetch(
        f"SELECT dayofweek(ts), event_type FROM '{SF}/events.parquet'"
    )
    a = n1 = c = n0 = 0
    for dow, t in rows:
        if dow in (0, 6):
            n1 += 1
            a += t == "purchase"
        else:
            n0 += 1
            c += t == "purchase"
    return a, n1, c, n0


def test_cohens_h_brute(spark):
    a, n1, c, n0 = _weekend_2x2()
    h = 2 * math.asin(math.sqrt(a / n1)) - 2 * math.asin(math.sqrt(c / n0))
    got = QUERIES["cohens_h_weekend_conversion"](spark, SF).collect()[0]
    assert got["n_weekend"] == n1 and got["n_weekday"] == n0
    assert got["p_weekend_micro"] == round(1e6 * a / n1)
    assert got["p_weekday_micro"] == round(1e6 * c / n0)
    assert abs(got["cohens_h"] - h) < 1e-6


def test_mantel_haenszel_brute(spark):
    rows = fetch(
        f"SELECT month(ts), dayofweek(ts), event_type"
        f" FROM '{SF}/events.parquet'"
    )
    strata = defaultdict(lambda: [0, 0, 0, 0])
    for m, dow, t in rows:
        wk = dow in (0, 6)
        conv = t == "purchase"
        s = strata[m]
        if wk and conv:
            s[0] += 1
        elif wk:
            s[1] += 1
        elif conv:
            s[2] += 1
        else:
            s[3] += 1
    num = den = 0
    ta = tb = tc = td = 0
    for a, b, c, d in strata.values():
        n_i = a + b + c + d
        num += math.floor(1e6 * a * d / n_i + 0.5)
        den += math.floor(1e6 * b * c / n_i + 0.5)
        ta += a
        tb += b
        tc += c
        td += d
    got = QUERIES["mantel_haenszel_weekend_or"](spark, SF).collect()[0]
    assert got["n_strata"] == len(strata)
    assert abs(got["or_mh"] - num / den) < 1e-5
    assert abs(got["or_crude"] - (ta * td) / (tb * tc)) < 1e-5


def test_wilson_ci_brute(spark):
    rows = fetch(f"SELECT event_type FROM '{SF}/events.parquet'")
    n = len(rows)
    a = sum(1 for (t,) in rows if t == "purchase")
    p = a / n
    half = Z * math.sqrt(p * (1 - p) / n + Z * Z / (4 * n * n))
    denom = 1 + Z * Z / n
    center = p + Z * Z / (2 * n)
    got = QUERIES["wilson_ci_conversion"](spark, SF).collect()[0]
    assert got["n_events"] == n and got["n_purchases"] == a
    assert got["p_hat_micro"] == round(1e6 * p)
    assert abs(got["wilson_lo"] - (center - half) / denom) < 1e-6
    assert abs(got["wilson_hi"] - (center + half) / denom) < 1e-6
    wald = Z * math.sqrt(p * (1 - p) / n)
    assert abs(got["wald_lo"] - (p - wald)) < 1e-6
    assert abs(got["wald_hi"] - (p + wald)) < 1e-6
    # structural property: Wilson stays inside [0,1] and is shifted toward
    # 1/2 relative to Wald
    assert 0.0 <= got["wilson_lo"] <= got["wilson_hi"] <= 1.0
    assert got["wilson_lo"] >= got["wald_lo"] - 1e-9
