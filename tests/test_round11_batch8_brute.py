"""Round-11 (part 8): brute-force checks for the SPRT, stratified ATE,
MMD two-sample statistic, and t-closeness.

Pure-Python recomputation from the raw sf0.001 parquet. The MMD test
computes both kernels by the LITERAL O(n^2) pair loops the query
avoids; the SPRT replays the walk day by day; the ATE rebuilds the
quintiles with the documented first-buckets-take-the-ceiling rule.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_sprt_brute(spark):
    rows = fetch(
        f"""
        SELECT ts::DATE, SUM(CASE WHEN event_type = 'purchase' THEN 1
                             ELSE 0 END), COUNT(*)
        FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    )
    l1 = math.log(0.22 / 0.18)
    l0 = math.log(0.78 / 0.82)
    ln_a, ln_b = math.log(19.0), -math.log(19.0)
    llr = 0.0
    d_hi = d_lo = None
    for day, k, n in rows:
        llr += k * l1 + (n - k) * l0
        if llr >= ln_a and d_hi is None:
            d_hi = day
        if llr <= ln_b and d_lo is None:
            d_lo = day
    if d_hi is not None and (d_lo is None or d_hi <= d_lo):
        decision, cross = "accept_h1", d_hi
    elif d_lo is not None:
        decision, cross = "accept_h0", d_lo
    else:
        decision, cross = "continue", None
    got = QUERIES["sprt_daily_conversion"](spark, SF).collect()[0]
    assert got["n_days"] == len(rows)
    assert got["decision"] == decision
    assert got["crossing_day"] == cross
    assert abs(got["llr_final"] - llr) < 1e-5


def test_stratified_ate_brute(spark):
    rows = fetch(
        f"SELECT user_id, dayofweek(ts), value FROM '{SF}/events.parquet'"
    )
    cnt = Counter(uid for uid, _, _ in rows)
    users = sorted(cnt, key=lambda u: (cnt[u], u))
    nu = len(users)
    q, rem = divmod(nu, 5)
    stratum = {}
    for i, u in enumerate(users):
        rn = i + 1
        if nu < 5:
            stratum[u] = rn
        elif rn <= rem * (q + 1):
            stratum[u] = (rn - 1) // (q + 1) + 1
        else:
            stratum[u] = rem + (rn - 1 - rem * (q + 1)) // q + 1
    g = {}
    for uid, dow, v in rows:
        s = stratum[uid]
        w = 1 if dow in (0, 6) else 0
        n1, n0, s1, s0 = g.get(s, (0, 0, 0, 0))
        cv = round(v * 100)
        if w:
            g[s] = (n1 + 1, n0, s1 + cv, s0)
        else:
            g[s] = (n1, n0 + 1, s1, s0 + cv)
    nt1 = sum(v[0] for v in g.values())
    nt0 = sum(v[1] for v in g.values())
    st1 = sum(v[2] for v in g.values())
    st0 = sum(v[3] for v in g.values())
    crude = (st1 / nt1 - st0 / nt0) / 100.0
    used = [(n1 + n0, s1 / n1 - s0 / n0) for n1, n0, s1, s0 in g.values()
            if n1 > 0 and n0 > 0]
    n_used = sum(w for w, _ in used)
    ate = sum(w * d for w, d in used) / n_used / 100.0
    got = QUERIES["stratified_ate_weekend_value"](spark, SF).collect()[0]
    assert got["n_strata"] == len(g)
    assert got["n_used"] == n_used
    assert abs(got["crude_diff"] - crude) < 1e-5
    assert abs(got["stratified_ate"] - ate) < 1e-5


def test_mmd_brute(spark):
    rows = fetch(
        f"SELECT label, embedding FROM '{SF}/embeddings.parquet'"
        f" WHERE label IN (0, 1)"
    )
    g0 = [np.array(e, dtype=float) for lab, e in rows if lab == 0]
    g1 = [np.array(e, dtype=float) for lab, e in rows if lab == 1]
    n0, n1 = len(g0), len(g1)
    mu0 = sum(g0) / n0
    mu1 = sum(g1) / n1
    mmd_lin = float((mu0 - mu1) @ (mu0 - mu1))

    def k2(x, y):
        return float(x @ y) ** 2

    e00 = sum(
        k2(g0[i], g0[j]) for i in range(n0) for j in range(n0) if i != j
    ) / (n0 * (n0 - 1))
    e11 = sum(
        k2(g1[i], g1[j]) for i in range(n1) for j in range(n1) if i != j
    ) / (n1 * (n1 - 1))
    e01 = sum(k2(a, b) for a in g0 for b in g1) / (n0 * n1)
    mmd_quad = e00 + e11 - 2 * e01
    got = QUERIES["mmd_label_groups"](spark, SF).collect()[0]
    assert got["n_label0"] == n0 and got["n_label1"] == n1
    assert abs(got["mmd2_linear"] - mmd_lin) < 1e-5
    assert abs(got["mmd2_quadratic"] - mmd_quad) < 1e-4


def test_t_closeness_brute(spark):
    rows = fetch(
        f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT)
        FROM '{SF}/customer.parquet'
        """
    )
    bins = sorted({s for _, _, s in rows})
    m = len(bins)
    n = len(rows)
    qcum = []
    acc = 0
    gq = Counter(s for _, _, s in rows)
    for b in bins:
        acc += gq[b]
        qcum.append(acc / n)
    groups = {}
    for nk, seg, s in rows:
        groups.setdefault((nk, seg), Counter())[s] += 1
    emds = {}
    for key, cc in groups.items():
        sz = sum(cc.values())
        acc = 0
        tot = 0.0
        for b, qc in zip(bins, qcum):
            acc += cc.get(b, 0)
            tot += abs(acc / sz - qc)
        emds[key] = (sz, tot / (m - 1))
    worst = sorted(
        emds.items(), key=lambda z: (-z[1][1], z[0][0], z[0][1])
    )[:5]
    got = QUERIES["t_closeness_audit"](spark, SF).collect()
    assert len(got) == 5
    for r, ((nk, seg), (sz, emd)) in zip(got, worst):
        assert (r["c_nationkey"], r["c_mktsegment"]) == (nk, seg)
        assert r["group_size"] == sz
        assert abs(r["t_emd"] - emd) < 1e-5
