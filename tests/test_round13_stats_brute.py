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
