"""Round-11 (part 2): brute-force checks for the time-series batch in
plans/temporal.py (PACF, Ljung-Box, binseg changepoint, Hurst R/S,
periodogram, seasonal strength).

Pure-Python recomputation from the raw sf0.001 parquet: the PACF is
re-derived by solving the Yule-Walker system directly (numpy lstsq on
the Toeplitz matrix, NOT the module's Durbin-Levinson closed forms);
the changepoint by an O(T^2) exhaustive scan; Hurst by a literal
per-block R/S loop; the periodogram by complex exponentials.
"""

from __future__ import annotations

import cmath
import math

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


def _daily_cents():
    rows = fetch(
        f"""
        SELECT l_shipdate, SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
        FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1
        """
    )
    return [int(round(r * 100)) for _, r in rows]


def _acf(x, k):
    n = len(x)
    mu = sum(x) / n
    den = sum((v - mu) ** 2 for v in x)
    return sum((x[t] - mu) * (x[t + k] - mu) for t in range(n - k)) / den


def test_pacf_brute(spark):
    x = _daily_cents()
    rho = [1.0] + [_acf(x, k) for k in (1, 2, 3)]
    # Yule-Walker solve per order (independent of Durbin-Levinson)
    expect = []
    for p in (1, 2, 3):
        r_mat = np.array(
            [[rho[abs(i - j)] for j in range(p)] for i in range(p)]
        )
        rhs = np.array(rho[1 : p + 1])
        phi = np.linalg.solve(r_mat, rhs)
        expect.append(phi[-1])
    got = {
        r["lag"]: r["pacf"]
        for r in QUERIES["pacf_daily_revenue"](spark, SF).collect()
    }
    assert set(got) == {1, 2, 3}
    for lag, e in zip((1, 2, 3), expect):
        assert abs(got[lag] - e) < 1e-5, (lag, got[lag], e)


def test_ljung_box_brute(spark):
    x = _daily_cents()
    n = len(x)
    q = n * (n + 2.0) * sum(_acf(x, k) ** 2 / (n - k) for k in range(1, 6))
    got = QUERIES["ljung_box_daily_revenue"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert abs(got["q_ljung_box"] - q) < 1e-4


def test_binseg_brute(spark):
    rows = fetch(
        f"""
        SELECT l_shipdate, SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
        FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1
        """
    )
    days = [d for d, _ in rows]
    x = [int(round(r * 100)) for _, r in rows]
    t = len(x)

    def sse(seg):
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    total = sse(x)
    best = min(
        ((sse(x[:i]) + sse(x[i:]), days[i - 1], i) for i in range(1, t)),
        key=lambda z: (z[0], z[1]),
    )
    got = QUERIES["binseg_changepoint_daily"](spark, SF).collect()[0]
    assert got["n_days"] == t
    assert got["split_day"] == best[1]
    assert got["n_days_left"] == best[2]
    assert abs(got["gain_fraction"] - (1 - best[0] / total)) < 1e-5
    i = best[2]
    assert abs(got["left_mean_revenue"] - sum(x[:i]) / i / 100.0) < 1e-4
    assert (
        abs(got["right_mean_revenue"] - sum(x[i:]) / (t - i) / 100.0) < 1e-4
    )


def _hourly_counts():
    rows = fetch(
        f"""
        WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS t0,
                          date_trunc('hour', MAX(ts)) AS t1
                   FROM '{SF}/events.parquet')
        SELECT date_diff('hour', b.t0, date_trunc('hour', e.ts)), COUNT(*)
        FROM '{SF}/events.parquet' e CROSS JOIN b GROUP BY 1
        """
    )
    span = fetch(
        f"""
        SELECT date_diff('hour', date_trunc('hour', MIN(ts)),
                         date_trunc('hour', MAX(ts)))
        FROM '{SF}/events.parquet'
        """
    )[0][0]
    x = [0] * (span + 1)
    for hi, n in rows:
        x[hi] = n
    return x


def test_hurst_brute(spark):
    x = _hourly_counts()
    mean_rs = {}
    nb = {}
    for s in (24, 72, 180):
        vals = []
        for b in range(len(x) // s):
            seg = x[b * s : (b + 1) * s]
            m = sum(seg) / s
            cum = 0.0
            ws = []
            for v in seg:
                cum += v - m
                ws.append(cum)
            rng = max(ws) - min(ws)
            sd = math.sqrt(sum((v - m) ** 2 for v in seg) / s)
            if sd > 0:
                vals.append(rng / sd)
        mean_rs[s] = sum(vals) / len(vals)
        nb[s] = len(vals)
    ls = [math.log(s) for s in (24, 72, 180)]
    ys = [math.log(mean_rs[s]) for s in (24, 72, 180)]
    lm = sum(ls) / 3
    ym = sum(ys) / 3
    slope = sum((a - lm) * (b - ym) for a, b in zip(ls, ys)) / sum(
        (a - lm) ** 2 for a in ls
    )
    got = QUERIES["hurst_rs_hourly"](spark, SF).collect()[0]
    assert got["n_blocks_24"] == nb[24]
    assert abs(got["rs_24"] - mean_rs[24]) < 1e-4
    assert abs(got["rs_72"] - mean_rs[72]) < 1e-4
    assert abs(got["rs_180"] - mean_rs[180]) < 1e-4
    assert abs(got["hurst_exponent"] - slope) < 1e-4


def test_spectral_brute(spark):
    x = _hourly_counts()
    t = len(x)
    m = sum(x) / t
    powers = {}
    for p in (6, 12, 24, 168):
        z = sum(
            (v - m) * cmath.exp(-2j * math.pi * h / p)
            for h, v in enumerate(x)
        )
        powers[p] = abs(z) ** 2
    tot = sum(round(v) for v in powers.values())
    rows = QUERIES["spectral_peak_hourly"](spark, SF).collect()
    assert len(rows) == 4
    for r in rows:
        p = r["period_hours"]
        assert abs(r["power_rounded"] - powers[p]) < max(
            1.0, 1e-6 * powers[p]
        )
        assert abs(r["power_share"] - round(powers[p]) / tot) < 1e-5


def test_seasonality_strength_brute(spark):
    x = _hourly_counts()
    t = len(x)
    m = sum(x) / t
    sst = sum((v - m) ** 2 for v in x)
    groups = {}
    for h, v in enumerate(x):
        groups.setdefault(h % 24, []).append(v)
    ssr = sum(
        sum((v - sum(g) / len(g)) ** 2 for v in g) for g in groups.values()
    )
    strength = max(0.0, 1 - ssr / sst)
    got = QUERIES["hourly_seasonality_strength"](spark, SF).collect()[0]
    assert got["n_hours"] == t
    assert abs(got["ss_total"] - sst) < 1e-3
    assert abs(got["ss_resid"] - ssr) < 1e-2
    assert abs(got["seasonal_strength"] - strength) < 1e-5
