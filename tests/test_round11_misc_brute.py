"""Round-11 (part 6): brute-force checks for Quade, Theil/Atkinson
inequality, permutation entropy, and the exact KNN-Shapley values.

Pure-Python recomputation from the raw sf0.001 parquet. The Shapley
test additionally asserts the EFFICIENCY axiom (sum of values equals
the full-coalition utility), which the recursion must satisfy exactly
-- an invariant independent of the recursion's own algebra.
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


def _rank_avg(vals):
    """average (mid) ranks, 1-based"""
    out = []
    for v in vals:
        less = sum(1 for o in vals if o < v)
        eq = sum(1 for o in vals if o == v)
        out.append(less + (eq + 1) / 2.0)
    return out


def test_quade_brute(spark):
    rows = fetch(
        f"""
        SELECT l_shipdate, SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
        FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1
        """
    )
    day0 = rows[0][0]
    blocks = {}
    for day, rev in rows:
        blocks.setdefault((day - day0).days // 7, []).append(
            int(round(rev * 100))
        )
    full = {b: v for b, v in blocks.items() if len(v) == 7}
    n, k = len(full), 7
    ranges = {b: max(v) - min(v) for b, v in full.items()}
    qr = dict(zip(ranges, _rank_avg(list(ranges.values()))))
    s_cells = []
    s_by_wd = Counter()
    for b, vals in full.items():
        rr = _rank_avg(vals)
        for j, r in enumerate(rr):
            sij = qr[b] * (r - (k + 1) / 2.0)
            s_cells.append(sij)
            s_by_wd[j] += sij
    a_stat = sum(s * s for s in s_cells)
    b_stat = sum(v * v for v in s_by_wd.values()) / n
    f = (n - 1) * b_stat / (a_stat - b_stat)
    got = QUERIES["quade_test_weekday_revenue"](spark, SF).collect()[0]
    assert got["n_weeks"] == n
    assert abs(got["quade_f"] - f) < 1e-5


def _doclens():
    rows = fetch(f"SELECT source, text FROM '{SF}/documents.parquet'")
    out = []
    for src, text in rows:
        L = len(text.split(" "))
        if L > 0:
            out.append((src, L))
    return out


def test_theil_brute(spark):
    data = _doclens()
    xs = [x for _, x in data]
    n = len(xs)
    mu = sum(xs) / n
    t_total = sum((x / mu) * math.log(x / mu) for x in xs) / n
    groups = {}
    for s, x in data:
        groups.setdefault(s, []).append(x)
    t_between = sum(
        (len(g) * (sum(g) / len(g)) / (n * mu))
        * math.log((sum(g) / len(g)) / mu)
        for g in groups.values()
    )
    got = QUERIES["theil_index_decomposition"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    assert abs(got["theil_total"] - t_total) < 1e-5
    assert abs(got["theil_between"] - t_between) < 1e-5
    assert abs(got["theil_within"] - (t_total - t_between)) < 1e-5
    assert abs(got["between_share"] - t_between / t_total) < 1e-4


def test_atkinson_brute(spark):
    xs = [x for _, x in _doclens()]
    n = len(xs)
    mean = sum(xs) / n
    gm = math.exp(sum(math.log(x) for x in xs) / n)
    got = QUERIES["atkinson_index_doclen"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    assert abs(got["mean_len"] - mean) < 1e-4
    assert abs(got["geomean_len"] - gm) < 1e-4
    assert abs(got["atkinson_eps1"] - (1 - gm / mean)) < 1e-6


def test_permutation_entropy_brute(spark):
    rows = fetch(
        f"""
        WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS t0,
                          date_trunc('hour', MAX(ts)) AS t1
                   FROM '{SF}/events.parquet')
        SELECT date_diff('hour', b.t0, date_trunc('hour', e.ts)), COUNT(*)
        FROM '{SF}/events.parquet' e CROSS JOIN b GROUP BY 1
        """
    )
    span = max(hi for hi, _ in rows)
    x = [0] * (span + 1)
    for hi, nn in rows:
        x[hi] = nn
    pats = Counter()
    for i in range(len(x) - 2):
        trip = x[i : i + 3]
        # rank by (value, position): position j's rank among the triple
        order = sorted(range(3), key=lambda j: (trip[j], j))
        rank = [0] * 3
        for r, j in enumerate(order):
            rank[j] = r
        pats[tuple(rank)] += 1
    tot = sum(pats.values())
    h = -sum((c / tot) * math.log(c / tot) for c in pats.values())
    got = QUERIES["permutation_entropy_hourly"](spark, SF).collect()[0]
    assert got["n_triples"] == tot
    assert got["n_patterns"] == len(pats)
    assert abs(got["perm_entropy_norm"] - h / math.log(6)) < 1e-5


def test_knn_shapley_brute(spark):
    rows = fetch(
        f"SELECT vec_id, embedding, label FROM '{SF}/embeddings.parquet'"
    )
    by_id = {vid: (np.array(e, dtype=float), lab) for vid, e, lab in rows}
    qv, yq = by_id[0]
    K = 5
    tr = sorted(
        (
            (float(np.linalg.norm(v - qv)), vid, 1 if lab == yq else 0)
            for vid, (v, lab) in by_id.items()
            if vid != 0
        ),
        key=lambda z: (z[0], z[1]),
    )
    n = len(tr)
    s = [0.0] * n
    s[n - 1] = tr[n - 1][2] / n
    for i in range(n - 2, -1, -1):
        s[i] = s[i + 1] + (tr[i][2] - tr[i + 1][2]) / K * min(K, i + 1) / (
            i + 1
        )
    # efficiency axiom: values sum to the full-coalition utility
    u_full = sum(m for _, _, m in tr[:K]) / K
    assert abs(sum(s) - u_full) < 1e-9
    sv = {vid: (i + 1, m, s[i]) for i, (_, vid, m) in enumerate(tr)}
    got = QUERIES["knn_shapley_data_values"](spark, SF).collect()
    assert len(got) == 10
    top5 = sorted(sv.items(), key=lambda z: (-z[1][2], z[0]))[:5]
    bot5 = sorted(sv.items(), key=lambda z: (z[1][2], z[0]))[:5]
    expect = {("top", vid) for vid, _ in top5} | {
        ("bottom", vid) for vid, _ in bot5
    }
    assert {(r["side"], r["vec_id"]) for r in got} == expect
    for r in got:
        rank, m, val = sv[r["vec_id"]]
        assert r["rank_by_distance"] == rank
        assert r["same_label"] == m
        assert abs(r["shapley_value"] - val) < 1e-5
