"""Round-12 batches E/F: pure-Python brute-force models of the new text
(Kneser-Ney bigrams, Yule's K) and causal/A-B (delta-method ratio CI,
difference-in-differences, power MDE) queries from the definitions.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from veri_spark.plans.events_behavior import _acklam_probit
from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_kneser_ney_brute(spark):
    texts = [r[0] for r in fetch(f"SELECT text FROM '{SF}/documents.parquet'")]
    bc = Counter()
    for t in texts:
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            bc[(ws[i], ws[i + 1])] += 1
    c1 = Counter()
    fanout = Counter()
    n_left = Counter()
    for (w1, w2), c in bc.items():
        c1[w1] += c
        fanout[w1] += 1
        n_left[w2] += 1
    n_types = len(bc)
    top = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:20]
    got = QUERIES["kneser_ney_bigram_scores"](spark, SF).collect()
    assert len(got) == 20
    for row, ((w1, w2), c) in zip(got, top):
        assert (row["w1"], row["w2"], row["n_pair"]) == (w1, w2, c)
        p_kn = (c - 0.75) / c1[w1] + 0.75 * fanout[w1] / c1[w1] * (
            n_left[w2] / n_types
        )
        assert abs(row["p_ml"] - c / c1[w1]) < 1e-6
        assert abs(row["p_kn"] - p_kn) < 1e-6


def test_yules_k_brute(spark):
    rows = fetch(f"SELECT source, text FROM '{SF}/documents.parquet'")
    per = defaultdict(Counter)
    for src, t in rows:
        per[src].update(t.split(" "))
    got = {r["source"]: r for r in QUERIES["yules_k_by_source"](spark, SF).collect()}
    assert set(got) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        c2 = sum(c * c for c in cnt.values())
        k = 1e4 * (c2 - n) / (n * n)
        assert got[src]["n_tokens"] == n
        assert got[src]["n_types"] == len(cnt)
        assert abs(got[src]["yules_k"] - k) < 1e-6


def test_delta_method_brute(spark):
    rows = fetch(
        f"SELECT user_id, CAST(round(1e6 * value) AS BIGINT)"
        f" FROM '{SF}/events.parquet'"
    )
    per = defaultdict(lambda: [0, 0])
    for uid, vm in rows:
        per[uid][0] += vm
        per[uid][1] += 1
    ys = [y for y, _ in per.values()]
    xs = [x for _, x in per.values()]
    n = len(per)
    sy, sx = sum(ys), sum(xs)
    r = sy / sx
    var = (
        (n / (n - 1))
        * sum((y - r * x) ** 2 for y, x in zip(ys, xs))
        / (sx * sx)
    )
    se = math.sqrt(var)
    z = _acklam_probit(0.975)
    got = QUERIES["delta_method_ratio_ci"](spark, SF).collect()[0]
    assert got["n_users"] == n and got["n_events"] == sx
    assert abs(got["ratio"] - r / 1e6) < 1e-6
    assert abs(got["se"] - se / 1e6) < 1e-6
    assert abs(got["ci_lo"] - (r - z * se) / 1e6) < 1e-5
    assert abs(got["ci_hi"] - (r + z * se) / 1e6) < 1e-5


def test_did_brute(spark):
    rows = fetch(
        f"SELECT CAST(round(o_totalprice * 100) AS BIGINT),"
        f" CASE WHEN substr(o_orderpriority,1,1) IN ('1','2') THEN 1 ELSE 0 END,"
        f" CASE WHEN o_orderdate >= DATE '1996-01-01' THEN 1 ELSE 0 END"
        f" FROM '{SF}/orders.parquet'"
    )
    cells = defaultdict(list)
    for c, t, p in rows:
        cells[(t, p)].append(c)
    mean = {k: sum(v) / len(v) for k, v in cells.items()}
    mvar = {
        k: sum((x - mean[k]) ** 2 for x in v) / ((len(v) - 1) * len(v))
        for k, v in cells.items()
    }
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    z = did / math.sqrt(sum(mvar.values()))
    got = QUERIES["difference_in_differences_priority"](spark, SF).collect()[0]
    assert got["n_orders"] == len(rows)
    assert abs(got["did_cents"] - did) < 1e-4
    assert abs(got["z_did"] - z) < 1e-5


def test_mde_brute(spark):
    rows = fetch(
        f"SELECT CASE WHEN dayofweek(ts) IN (0,6) THEN 1 ELSE 0 END,"
        f" CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        f" FROM '{SF}/events.parquet'"
    )
    n1 = sum(1 for wk, _ in rows if wk == 0)
    n2 = sum(1 for wk, _ in rows if wk == 1)
    c1 = sum(cv for wk, cv in rows if wk == 0)
    p = c1 / n1
    mde = (_acklam_probit(0.975) + _acklam_probit(0.8)) * math.sqrt(
        p * (1 - p) * (1 / n1 + 1 / n2)
    )
    got = QUERIES["ab_power_mde"](spark, SF).collect()[0]
    assert got["n_weekday"] == n1 and got["n_weekend"] == n2
    assert abs(got["p_base"] - p) < 1e-6
    assert abs(got["mde_abs"] - mde) < 1e-6
    assert abs(got["mde_rel"] - mde / p) < 1e-5
