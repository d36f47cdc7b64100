"""Round-12 batch C: pure-Python brute-force models of the new
time-series diagnostics (KPSS, Dickey-Fuller, sample entropy, Cook's
distance) from the textbook definitions.
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


def _daily_cents():
    return fetch(
        f"SELECT l_shipdate, CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10)))"
        f" * 100 AS BIGINT) FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1"
    )


def test_kpss_brute(spark):
    xs = [c for _, c in _daily_cents()]
    n = len(xs)
    mean = sum(xs) / n
    e = [x - mean for x in xs]
    s = 0.0
    ssq = 0.0
    for v in e:
        s += v
        ssq += s * s
    lag = 8
    lrv = sum(v * v for v in e) / n
    for k in range(1, lag + 1):
        gamma = sum(e[t] * e[t - k] for t in range(k, n)) / n
        lrv += 2.0 * (1.0 - k / (lag + 1.0)) * gamma
    eta = (ssq / (n * n)) / lrv

    got = QUERIES["kpss_daily_revenue"](spark, SF).collect()[0]
    assert got["n_days"] == n and got["bartlett_lag"] == lag
    assert abs(got["kpss_eta"] - eta) < 1e-6


def test_dickey_fuller_brute(spark):
    xs = [c for _, c in _daily_cents()]
    pairs = [(xs[t + 1] - xs[t], xs[t]) for t in range(len(xs) - 1)]
    m = len(pairs)
    sy = sum(y for y, _ in pairs)
    sz = sum(z for _, z in pairs)
    szy = sum(y * z for y, z in pairs)
    szz = sum(z * z for _, z in pairs)
    syy = sum(y * y for y, _ in pairs)
    szzc = szz - sz * sz / m
    szyc = szy - sz * sy / m
    syyc = syy - sy * sy / m
    b = szyc / szzc
    sse = syyc - b * szyc
    t_df = b / math.sqrt((sse / (m - 2)) / szzc)

    got = QUERIES["dickey_fuller_daily_revenue"](spark, SF).collect()[0]
    assert got["n_pairs"] == m
    assert abs(got["rho_hat"] - b) < 1e-6
    assert abs(got["t_df"] - t_df) < 1e-4


def test_sample_entropy_brute(spark):
    rows = fetch(
        f"""
        WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS t0,
                               date_trunc('hour', MAX(ts)) AS t1
                        FROM '{SF}/events.parquet'),
        spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
                  FROM bounds),
        actual AS (SELECT date_trunc('hour', ts) AS h, COUNT(*)::BIGINT AS n
                   FROM '{SF}/events.parquet' GROUP BY 1)
        SELECT COALESCE(a.n, 0) FROM spine s LEFT JOIN actual a ON a.h = s.h
        ORDER BY s.h
        """
    )
    xs = [int(r[0]) for r in rows]
    hn = len(xs)
    mean = sum(xs) / hn
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / hn)
    r = math.floor(0.2 * sd)
    nt = hn - 2
    b_cnt = a_cnt = 0
    for i in range(nt):
        for j in range(i + 1, nt):
            if max(abs(xs[i] - xs[j]), abs(xs[i + 1] - xs[j + 1])) <= r:
                b_cnt += 1
                if abs(xs[i + 2] - xs[j + 2]) <= r:
                    a_cnt += 1

    got = QUERIES["sample_entropy_hourly"](spark, SF).collect()[0]
    assert got["n_hours"] == hn and got["r_threshold"] == r
    assert got["b_count"] == b_cnt and got["a_count"] == a_cnt
    assert abs(got["sampen"] - math.log(b_cnt / a_cnt)) < 1e-6


def test_cooks_distance_brute(spark):
    rows = _daily_cents()
    n = len(rows)
    ys = [c for _, c in rows]
    xbar = (n + 1) / 2.0
    sxx = n * (n * n - 1) / 12.0
    sy = sum(ys)
    sxy = sum((t + 1) * y for t, y in enumerate(ys)) - xbar * sy
    b = sxy / sxx
    a = sy / n - b * xbar
    resid = [ys[t] - (a + b * (t + 1)) for t in range(n)]
    sse = sum(e * e for e in resid)
    s2 = sse / (n - 2)
    ds = []
    for t in range(n):
        h = 1.0 / n + (t + 1 - xbar) ** 2 / sxx
        d = resid[t] ** 2 * h / (2 * s2 * (1 - h) ** 2)
        ds.append((rows[t][0], d, h))
    top = sorted(ds, key=lambda z: (-z[1], z[0].toordinal()))[:5]

    got = QUERIES["cooks_distance_daily"](spark, SF).collect()
    assert len(got) == 5
    for row, (day, d, h) in zip(got, top):
        assert row["day"] == day
        assert abs(row["cooks_d"] - d) < 1e-5
        assert abs(row["leverage"] - h) < 1e-6


def test_spectral_entropy_brute(spark):
    rows = fetch(
        f"""
        WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS t0,
                               date_trunc('hour', MAX(ts)) AS t1
                        FROM '{SF}/events.parquet'),
        spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
                  FROM bounds),
        actual AS (SELECT date_trunc('hour', ts) AS h, COUNT(*)::BIGINT AS n
                   FROM '{SF}/events.parquet' GROUP BY 1)
        SELECT COALESCE(a.n, 0) FROM spine s LEFT JOIN actual a ON a.h = s.h
        ORDER BY s.h
        """
    )
    xs = [int(r[0]) for r in rows]
    t = len(xs)
    mean = sum(xs) / t
    two_pi = 6.283185307179586
    powers = {}
    for period in range(2, 49):
        # same nano-quantized fold as the query
        ec = sum(round(1e9 * x * math.cos(two_pi * i / period)) for i, x in enumerate(xs))
        es = sum(round(1e9 * x * math.sin(two_pi * i / period)) for i, x in enumerate(xs))
        sc = sum(round(1e9 * math.cos(two_pi * i / period)) for i in range(t))
        ss = sum(round(1e9 * math.sin(two_pi * i / period)) for i in range(t))
        re = ec / 1e9 - mean * (sc / 1e9)
        im = es / 1e9 - mean * (ss / 1e9)
        powers[period] = round(re * re + im * im)
    pos = {p: w for p, w in powers.items() if w > 0}
    tp = sum(pos.values())
    hsum = sum(round(1e12 * (w / tp) * math.log(w / tp)) for w in pos.values())
    ent = -hsum / 1e12
    peak = min(pos, key=lambda p: (-pos[p], p))

    got = QUERIES["spectral_entropy_hourly"](spark, SF).collect()[0]
    assert got["n_periods"] == len(pos)
    assert got["peak_period"] == peak
    assert abs(got["spectral_entropy_nats"] - ent) < 1e-6
    assert abs(got["spectral_entropy_norm"] - ent / math.log(len(pos))) < 1e-6


def test_hoover_palma_brute(spark):
    rows = fetch(
        f"SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT))"
        f" FROM '{SF}/orders.parquet' GROUP BY 1"
    )
    spends = sorted((c, k) for k, c in rows)
    n = len(spends)
    tot = sum(c for c, _ in spends)
    hoover = sum(abs(n * c - tot) for c, _ in spends) / (2.0 * n * tot)
    got = QUERIES["hoover_index_customer_spend"](spark, SF).collect()[0]
    assert got["n_customers"] == n
    assert abs(got["hoover_index"] - hoover) < 1e-6

    b = 4 * n // 10
    t10 = n - n // 10
    bot40 = sum(c for c, _ in spends[:b])
    top10 = sum(c for c, _ in spends[t10:])
    got = QUERIES["palma_ratio_customer_spend"](spark, SF).collect()[0]
    assert got["n_customers"] == n
    assert got["bottom40_cents"] == bot40
    assert got["top10_cents"] == top10
    assert abs(got["palma_ratio"] - top10 / bot40) < 1e-6


def _midranks_list(values):
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


def test_pettitt_brute(spark):
    rows = _daily_cents()
    xs = [c for _, c in rows]
    n = len(xs)
    # U_t from the definition, updated incrementally in O(n^2) total:
    # moving x_t from the right set to the left set adds sgn(x_t - x_j)
    # for the remaining right js and removes sgn(x_i - x_t) for prior is
    best = None
    u = 0
    for t in range(1, n):
        x = xs[t - 1]
        u += sum(1 if x > xs[j] else -1 if x < xs[j] else 0 for j in range(t, n))
        u -= sum(1 if xs[i] > x else -1 if xs[i] < x else 0 for i in range(t - 1))
        key = (-abs(u), rows[t - 1][0].toordinal())
        if best is None or key < best[0]:
            best = (key, t, abs(u), rows[t - 1][0])
    _, t, k, day = best
    lnp = -6.0 * k * k / (n**3 + n**2)

    got = QUERIES["pettitt_changepoint_daily"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert got["t_index"] == t and got["changepoint_day"] == day
    assert got["k_stat"] == k
    assert abs(got["ln_p_approx"] - lnp) < 1e-6


def test_cox_stuart_brute(spark):
    xs = [c for _, c in _daily_cents()]
    n = len(xs)
    h = n // 2
    off = h + (n % 2)
    plus = minus = 0
    for t in range(h):
        x1, x2 = xs[t], xs[t + off]
        if x2 > x1:
            plus += 1
        elif x2 < x1:
            minus += 1
    m = plus + minus
    z = (plus - m / 2.0) / math.sqrt(m / 4.0)
    got = QUERIES["cox_stuart_trend_daily"](spark, SF).collect()[0]
    assert got["n_plus"] == plus and got["n_minus"] == minus
    assert abs(got["z_cox_stuart"] - z) < 1e-6


def test_turning_points_brute(spark):
    xs = [c for _, c in _daily_cents()]
    n = len(xs)
    tp = sum(
        1
        for t in range(1, n - 1)
        if (xs[t] > xs[t - 1] and xs[t] > xs[t + 1])
        or (xs[t] < xs[t - 1] and xs[t] < xs[t + 1])
    )
    e = 2.0 * (n - 2) / 3.0
    z = (tp - e) / math.sqrt((16.0 * n - 29.0) / 90.0)
    got = QUERIES["turning_points_daily"](spark, SF).collect()[0]
    assert got["n_days"] == n and got["n_turning_points"] == tp
    assert abs(got["expected_tp"] - e) < 1e-6
    assert abs(got["z_turning"] - z) < 1e-6
