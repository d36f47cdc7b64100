"""Round-12 batch B: pure-Python brute-force models of the new classical
tests (Brunner-Munzel, Jonckheere-Terpstra, Page's L, Grubbs, Bartels),
written from the textbook definitions — rankdata-style midranks and
literal O(n^2)/O(n*g) loops — so a shared formula error cannot hide
behind the Spark/DuckDB cross-engine gate.
"""

from __future__ import annotations

import math

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _midranks(values):
    """rankdata(method='average') from the definition."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(values):
        j = i
        while j + 1 < len(values) and values[order[j + 1]] == values[order[i]]:
            j += 1
        r = (i + j + 2) / 2.0
        for k in range(i, j + 1):
            ranks[order[k]] = r
        i = j + 1
    return ranks


def _r6(x):
    s = 10.0**6
    return math.floor(abs(x) * s + 0.5) / s * (1 if x >= 0 else -1)


def test_brunner_munzel_brute(spark):
    rows = fetch(
        f"SELECT value, CASE WHEN dayofweek(ts) IN (0,6) THEN 1 ELSE 0 END"
        f" FROM '{SF}/events.parquet'"
    )
    x = [v for v, wk in rows if wk == 1]  # weekend = group 1
    y = [v for v, wk in rows if wk == 0]
    n1, n2 = len(x), len(y)
    combined = _midranks(x + y)
    rcx, rcy = combined[:n1], combined[n1:]
    rx, ry = _midranks(x), _midranks(y)
    r1 = sum(rcx) / n1
    r2 = sum(rcy) / n2
    s1 = sum((rcx[i] - rx[i] - r1 + (n1 + 1) / 2.0) ** 2 for i in range(n1)) / (
        n1 - 1
    )
    s2 = sum((rcy[i] - ry[i] - r2 + (n2 + 1) / 2.0) ** 2 for i in range(n2)) / (
        n2 - 1
    )
    w = n1 * n2 * (r2 - r1) / ((n1 + n2) * math.sqrt(n1 * s1 + n2 * s2))
    p_hat = (r2 - r1) / (n1 + n2) + 0.5

    got = QUERIES["brunner_munzel_weekend_value"](spark, SF).collect()[0]
    assert got["n_weekend"] == n1 and got["n_weekday"] == n2
    assert abs(got["p_hat"] - p_hat) < 1e-5
    assert abs(got["w_bm"] - w) < 1e-4


def test_jonckheere_terpstra_brute(spark):
    rows = fetch(
        f"SELECT CAST(round(o_totalprice * 100) AS BIGINT),"
        f" CAST(substr(o_orderpriority, 1, 1) AS INT)"
        f" FROM '{SF}/orders.parquet'"
    )
    groups = {g: [] for g in range(1, 6)}
    for c, g in rows:
        groups[g].append(c)
    # literal O(n^2) U-statistic with half ties
    j = 0.0
    for gi in range(1, 6):
        for gj in range(gi + 1, 6):
            for a in groups[gi]:
                for b in groups[gj]:
                    j += 1.0 if a < b else (0.5 if a == b else 0.0)
    ns = [len(groups[g]) for g in range(1, 6)]
    nn = sum(ns)
    ej = (nn * nn - sum(n * n for n in ns)) / 4.0
    from collections import Counter

    ties = Counter(c for c, _ in rows)
    tvals = list(ties.values())
    v1 = (
        nn * (nn - 1) * (2 * nn + 5)
        - sum(n * (n - 1) * (2 * n + 5) for n in ns)
        - sum(t * (t - 1) * (2 * t + 5) for t in tvals)
    )
    g2 = sum(n * (n - 1) * (n - 2) for n in ns) * sum(
        t * (t - 1) * (t - 2) for t in tvals
    )
    g3 = sum(n * (n - 1) for n in ns) * sum(t * (t - 1) for t in tvals)
    var = (
        v1 / 72.0
        + g2 / (36.0 * nn * (nn - 1) * (nn - 2))
        + g3 / (8.0 * nn * (nn - 1))
    )
    z = (j - ej) / math.sqrt(var)

    got = QUERIES["jonckheere_terpstra_priority_trend"](spark, SF).collect()[0]
    assert got["n_orders"] == nn
    assert abs(got["j_stat"] - j) < 1e-6
    assert abs(got["z_jt"] - z) < 1e-4


def _weekly_blocks():
    rows = fetch(
        f"SELECT l_shipdate, CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10)))"
        f" * 100 AS BIGINT) FROM '{SF}/lineitem.parquet' GROUP BY 1"
    )
    day0 = min(d for d, _ in rows)
    blocks = {}
    for d, c in rows:
        blocks.setdefault((d - day0).days // 7, []).append((d, c))
    return {b: v for b, v in blocks.items() if len(v) == 7}


def test_page_trend_brute(spark):
    blocks = _weekly_blocks()
    n = len(blocks)
    l_stat = 0.0
    for _, days in blocks.items():
        cents = [c for _, c in days]
        ranks = _midranks(cents)
        for (d, _), r in zip(days, ranks):
            wd = d.isoweekday()  # 1=Mon..7=Sun, the hypothesized order
            l_stat += wd * r
    el = n * 7 * 64 / 4.0
    var = n * 49 * 8 * 48 / 144.0
    z = (l_stat - el) / math.sqrt(var)

    got = QUERIES["page_trend_weekday_revenue"](spark, SF).collect()[0]
    assert got["n_weeks"] == n
    assert abs(got["page_l"] - l_stat) < 1e-6
    assert abs(got["z_page"] - z) < 1e-5


def test_grubbs_brute(spark):
    rows = fetch(
        f"SELECT l_shipdate, CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10)))"
        f" * 100 AS BIGINT) FROM '{SF}/lineitem.parquet' GROUP BY 1"
    )
    xs = [c for _, c in rows]
    n = len(xs)
    mean = sum(xs) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    best = max(rows, key=lambda r: (abs(r[1] - mean), -r[0].toordinal()))
    g = abs(best[1] - mean) / sd

    got = QUERIES["grubbs_outlier_daily_revenue"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert got["outlier_day"] == best[0]
    assert abs(got["grubbs_g"] - g) < 1e-5


def test_bartels_brute(spark):
    rows = fetch(
        f"SELECT l_shipdate, CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10)))"
        f" * 100 AS BIGINT) FROM '{SF}/lineitem.parquet' GROUP BY 1"
        f" ORDER BY 1"
    )
    ranks = _midranks([c for _, c in rows])
    n = len(ranks)
    rbar = sum(ranks) / n
    num = sum((ranks[i] - ranks[i + 1]) ** 2 for i in range(n - 1))
    den = sum((r - rbar) ** 2 for r in ranks)
    rvn = num / den
    var = (
        4.0 * (n - 2) * (5 * n * n - 2 * n - 9) / (5.0 * n * (n + 1) * (n - 1) ** 2)
    )
    z = (rvn - 2.0) / math.sqrt(var)

    got = QUERIES["bartels_rank_daily_revenue"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert abs(got["rvn"] - rvn) < 1e-6
    assert abs(got["z_bartels"] - z) < 1e-5
