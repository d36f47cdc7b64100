"""Round-13 statistical additions vs literal pure-Python models:
energy distance (the literal double pair sum), Conover squared ranks
(the textbook midrank formula), Hoeffding's D (the literal 1948
c-function triple sums)."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "event_type",
            "value",
            F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wk"),
        )
        .collect()
    )


def test_energy_distance_matches_pair_sum(spark):
    rows = _events(spark)
    x = [round(1e6 * r["value"]) for r in rows if r["wk"] == 1]
    y = [round(1e6 * r["value"]) for r in rows if r["wk"] == 0]
    n1, n2 = len(x), len(y)
    # literal O(n^2) pair sums in exact ints (V-statistic convention)
    cross = sum(abs(a - b) for a in x for b in y)
    wx = sum(abs(a - b) for i, a in enumerate(x) for b in x[i + 1 :])
    wy = sum(abs(a - b) for i, a in enumerate(y) for b in y[i + 1 :])
    d2 = (
        2.0 * (cross / 1e6) / (n1 * 1.0 * n2)
        - 2.0 * (wx / 1e6) / (n1 * 1.0 * n1)
        - 2.0 * (wy / 1e6) / (n2 * 1.0 * n2)
    )
    got = QUERIES["energy_distance_weekend_value"](spark, SF).collect()[0]
    assert got["n_weekend"] == n1 and got["n_weekday"] == n2
    assert abs(got["energy_d2"] - d2) < 1e-5
    assert (
        abs(got["energy_stat"] - (n1 * 1.0 * n2 / (n1 + n2)) * d2) < 1e-4
    )
    assert d2 >= 0  # the energy distance is nonnegative


def test_conover_squared_ranks_matches_textbook(spark):
    rows = _events(spark)
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(round(1e6 * r["value"]))
    # u = |x - group mean|, pooled midranks, squared-rank masses
    u_all = []
    for g, xs in groups.items():
        sq, ng = sum(xs), len(xs)
        for v in xs:
            u_all.append((g, abs(float(v) - sq / ng)))
    us = sorted(u for _, u in u_all)
    below = Counter()
    cnt = Counter(us)
    ranks = {}
    seen = 0
    for u in sorted(cnt):
        ranks[u] = seen + (cnt[u] + 1) / 2
        seen += cnt[u]
    n = len(u_all)
    s_g = defaultdict(float)
    for g, u in u_all:
        s_g[g] += ranks[u] ** 2
    sbar = sum(ranks[u] ** 2 for _, u in u_all) / n
    d2 = (sum(ranks[u] ** 4 for _, u in u_all) - n * sbar * sbar) / (n - 1)
    t = (
        sum(s * s / len(groups[g]) for g, s in s_g.items()) - n * sbar * sbar
    ) / d2
    got = QUERIES["conover_squared_ranks_scale"](spark, SF).collect()[0]
    assert got["n_events"] == n and got["k_types"] == len(groups)
    assert abs(got["t_conover"] - t) < 1e-4
    assert below is not None  # silence the unused counter


def test_hoeffding_d_matches_1948_formula(spark):
    days = defaultdict(lambda: [0, 0])
    for r in (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.to_date("o_orderdate").alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("revq"),
        )
        .collect()
    ):
        d = days[r["day"]]
        d[0] += r["revq"]
        d[1] += 1
    pts = [(rev, cnt) for rev, cnt in days.values()]
    n = len(pts)

    def c(a, b):
        return 1.0 if a < b else (0.5 if a == b else 0.0)

    d1 = d2 = d3 = 0.0
    for i, (xi, yi) in enumerate(pts):
        q = 1 + sum(
            c(xj, xi) * c(yj, yi)
            for j, (xj, yj) in enumerate(pts)
            if j != i
        )
        r = 1 + sum(c(xj, xi) for j, (xj, _) in enumerate(pts) if j != i)
        s = 1 + sum(c(yj, yi) for j, (_, yj) in enumerate(pts) if j != i)
        d1 += (q - 1) * (q - 2)
        d2 += (r - 1) * (r - 2) * (s - 1) * (s - 2)
        d3 += (r - 2) * (s - 2) * (q - 1)
    d_stat = (
        30.0
        * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    got = QUERIES["hoeffding_d_daily"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert abs(got["d_hoeffding"] - d_stat) < 1e-7


def _day_grain(spark):
    days = {}
    for r in (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            F.to_date("o_orderdate").alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("revq"),
        )
        .collect()
    ):
        d = days.setdefault(r["day"], [0, 0])
        d[0] += r["revq"]
        d[1] += 1
    return days


def test_distance_correlation_matches_double_centering(spark):
    days = _day_grain(spark)
    xs = [round(rev / 10000.0) for rev, _ in days.values()]
    ys = [cnt for _, cnt in days.values()]
    n = len(xs)
    import math

    def dcent(v):
        a = [[abs(v[i] - v[j]) for j in range(n)] for i in range(n)]
        rm = [sum(row) / n for row in a]
        gm = sum(rm) / n
        return [
            [a[i][j] - rm[i] - rm[j] + gm for j in range(n)]
            for i in range(n)
        ]

    A, B = dcent(xs), dcent(ys)
    sab = sum(A[i][j] * B[i][j] for i in range(n) for j in range(n))
    saa = sum(A[i][j] ** 2 for i in range(n) for j in range(n))
    sbb = sum(B[i][j] ** 2 for i in range(n) for j in range(n))
    want = math.sqrt(sab / math.sqrt(saa * sbb))
    got = QUERIES["distance_correlation_daily"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert abs(got["distance_correlation"] - want) < 1e-6
    assert 0 <= got["distance_correlation"] <= 1


def test_siegel_repeated_median_matches_literal(spark):
    days = _day_grain(spark)
    pts = sorted(
        ((d.toordinal() - 719163), rev)  # days since 1970-01-01
        for d, (rev, _) in days.items()
    )
    import statistics

    def med(vals):
        s = sorted(vals)
        m = len(s)
        lo, hi = (m + 1) // 2 - 1, (m + 2) // 2 - 1
        return (s[lo] + s[hi]) / 2

    inner = [
        med([(yj - yi) / (xj - xi) for xj, yj in pts if xj != xi])
        for xi, yi in pts
    ]
    slope = med(inner)
    icept = med([y - slope * x for x, y in pts])
    got = QUERIES["siegel_repeated_median_trend"](spark, SF).collect()[0]
    assert got["n_days"] == len(pts)
    assert abs(got["slope_cents_per_day"] - slope) < 1e-5
    assert abs(got["intercept_cents"] - icept) < 1e-1
    assert statistics is not None
