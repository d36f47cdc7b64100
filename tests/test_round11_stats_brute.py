"""Round-11 (part 1): brute-force checks for the classical-test
completions in plans/stats_tests.py.

Same discipline as the round-9/10 brute files: recompute every
statistic in plain Python (math.lgamma, Counter, sorted lists) from
the raw sf0.001 parquet and compare against the registered Spark
program, so a formula error shared by both SQL dialects cannot hide.
The Fisher p is re-derived with the stdlib's exact lgamma (NOT the
module's Lanczos literals); the AD/AB statistics are recomputed from
row-level sorted samples (NOT the value-domain prefix identities);
Kendall's W is recomputed from scipy-free first principles.
"""

from __future__ import annotations

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


def _cells_weekend_purchase():
    rows = fetch(
        f"SELECT dayofweek(ts), event_type FROM '{SF}/events.parquet'"
    )
    a = b = c = d = 0
    for dow, t in rows:
        wk = dow in (0, 6)
        conv = t == "purchase"
        if wk and conv:
            a += 1
        elif wk:
            b += 1
        elif conv:
            c += 1
        else:
            d += 1
    return a, b, c, d


def test_fisher_exact_brute(spark):
    a, b, c, d = _cells_weekend_purchase()
    n, r1, c1 = a + b + c + d, a + b, a + c

    def lnchoose(m, k):
        return (
            math.lgamma(m + 1) - math.lgamma(k + 1) - math.lgamma(m - k + 1)
        )

    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    lnu = {
        k: lnchoose(r1, k) + lnchoose(n - r1, c1 - k)
        for k in range(lo, hi + 1)
    }
    mx = max(lnu.values())
    tot = sum(math.exp(v - mx) for v in lnu.values())
    hit = sum(
        math.exp(v - mx)
        for k, v in lnu.items()
        if v <= lnu[a] + 1e-7
    )
    p = hit / tot
    got = QUERIES["fisher_exact_weekend_purchase"](spark, SF).collect()[0]
    assert got["n_weekend_purchase"] == a
    assert got["n_weekend_other"] == b
    assert got["n_weekday_purchase"] == c
    assert got["n_weekday_other"] == d
    assert got["support_size"] == hi - lo + 1
    if b * c > 0:
        assert abs(got["odds_ratio"] - a * d / (b * c)) < 1e-5
    # Lanczos-vs-stdlib lgamma differ ~1e-13; quantization adds ~1e-9
    assert abs(got["p_two_sided"] - p) < 1e-6


def test_dagostino_k2_brute(spark):
    vals = [
        round(v * 100.0)
        for (v,) in fetch(f"SELECT value FROM '{SF}/events.parquet'")
    ]
    n = len(vals)
    m1 = sum(vals) / n
    m2 = sum((x - m1) ** 2 for x in vals) / n
    m3 = sum((x - m1) ** 3 for x in vals) / n
    m4 = sum((x - m1) ** 4 for x in vals) / n
    g1 = m3 / m2**1.5
    b2 = m4 / m2**2
    # D'Agostino 1970 skewness transform
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (
        3.0
        * (n * n + 27 * n - 70)
        * (n + 1)
        * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = math.sqrt(2 * (beta2 - 1)) - 1
    delta = 1 / math.sqrt(0.5 * math.log(w2))
    alpha = math.sqrt(2 / (w2 - 1))
    zs = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1))
    # Anscombe-Glynn kurtosis transform
    eb2 = 3.0 * (n - 1) / (n + 1)
    vb2 = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    x = (b2 - eb2) / math.sqrt(vb2)
    sb1 = (
        6.0
        * (n * n - 5 * n + 2)
        / ((n + 7) * (n + 9))
        * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    aa = 6.0 + 8.0 / sb1 * (2.0 / sb1 + math.sqrt(1 + 4 / sb1**2))
    inner = (1 - 2.0 / aa) / (1 + x * math.sqrt(2.0 / (aa - 4)))
    zk = ((1 - 2.0 / (9 * aa)) - math.copysign(abs(inner) ** (1 / 3), inner)) / math.sqrt(
        2.0 / (9 * aa)
    )
    got = QUERIES["dagostino_k2_value"](spark, SF).collect()[0]
    assert got["n_events"] == n
    assert abs(got["skew_g1"] - g1) < 1e-5
    assert abs(got["kurtosis_b2"] - b2) < 1e-5
    assert abs(got["z_skew"] - zs) < 1e-5
    assert abs(got["z_kurtosis"] - zk) < 1e-5
    assert abs(got["k2_statistic"] - (zs * zs + zk * zk)) < 1e-4


def _weekend_split():
    rows = fetch(
        f"SELECT dayofweek(ts), value FROM '{SF}/events.parquet'"
    )
    x = [v for dow, v in rows if dow in (0, 6)]
    y = [v for dow, v in rows if dow not in (0, 6)]
    return x, y


def test_anderson_darling_brute(spark):
    x, y = _weekend_split()
    n1, n2 = len(x), len(y)
    nn = n1 + n2
    zs = sorted(set(x + y))
    cx = Counter(x)
    cy = Counter(y)
    # Scholz-Stephens A2akN (midrank / ties version, k = 2)
    a2 = 0.0
    bj = 0.0
    mx = 0.0
    my = 0.0
    for z in zs:
        lj = cx[z] + cy[z]
        baj = bj + lj / 2.0
        denom = baj * (nn - baj) - nn * lj / 4.0
        maxj = mx + cx[z] / 2.0
        mayj = my + cy[z] / 2.0
        a2 += (
            lj * (nn * maxj - n1 * baj) ** 2 / denom / n1
            + lj * (nn * mayj - n2 * baj) ** 2 / denom / n2
        )
        bj += lj
        mx += cx[z]
        my += cy[z]
    a2 *= (nn - 1.0) / (nn * nn)
    got = QUERIES["anderson_darling_weekend_value"](spark, SF).collect()[0]
    assert got["n_weekend"] == n1 and got["n_weekday"] == n2
    assert got["n_distinct_values"] == len(zs)
    assert abs(got["a2_akn"] - a2) < 1e-4


def test_ansari_bradley_brute(spark):
    x, y = _weekend_split()
    n1, n2 = len(x), len(y)
    nn = n1 + n2
    allv = sorted(x + y)
    # midranks, then AB scores s = min(r, N+1-r)
    first = {}
    cnt = Counter(allv)
    pos = 0
    mid = {}
    for v in sorted(cnt):
        c = cnt[v]
        mid[v] = pos + (c + 1) / 2.0
        pos += c
    score = {v: min(m, nn + 1 - m) for v, m in mid.items()}
    ab = sum(score[v] for v in x)
    t1 = sum(score[v] * c for v, c in cnt.items())
    t2 = sum(score[v] ** 2 * c for v, c in cnt.items())
    e_ab = n1 * t1 / nn
    v_ab = n1 * n2 * (nn * t2 - t1 * t1) / (nn * nn * (nn - 1.0))
    z = (ab - e_ab) / math.sqrt(v_ab)
    got = QUERIES["ansari_bradley_weekend_value"](spark, SF).collect()[0]
    assert got["n_weekend"] == n1 and got["n_weekday"] == n2
    assert abs(got["ab_statistic"] - ab) < 1e-5
    assert abs(got["z_ties"] - z) < 1e-5


def test_kendalls_w_brute(spark):
    rows = fetch(
        f"""
        SELECT l_shipdate, SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
        FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1
        """
    )
    day0 = rows[0][0]
    blocks = {}
    for day, rev in rows:
        blk = (day - day0).days // 7
        blocks.setdefault(blk, []).append((day, int(round(rev * 100))))
    full = {b: v for b, v in blocks.items() if len(v) == 7}
    n = len(full)
    k = 7
    rj = Counter()
    sum_t = 0
    for b, days in full.items():
        cents = [c for _, c in days]
        cc = Counter(cents)
        sum_t += sum(t**3 - t for t in cc.values())
        for day, c in days:
            r = (
                sum(1 for o in cents if o < c)
                + (sum(1 for o in cents if o == c) + 1) / 2.0
            )
            wd = (day.weekday() + 1) % 7  # duckdb dayofweek: 0=Sunday
            rj[wd] += r
    mean_r = n * k * (k + 1) / 2.0 / k
    s4 = sum((v - mean_r) ** 2 for v in rj.values())
    w_plain_chi2 = 12.0 * sum(v * v for v in rj.values()) / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    w_plain = w_plain_chi2 / (n * (k - 1))
    w_tc = 12.0 * s4 / (n * n * k * (k * k - 1) - n * sum_t)
    got = QUERIES["kendalls_w_weekday_revenue"](spark, SF).collect()[0]
    assert got["n_weeks"] == n
    assert abs(got["w_plain"] - w_plain) < 1e-5
    assert abs(got["w_tie_corrected"] - w_tc) < 1e-5
    assert abs(got["chi2_tc"] - 6.0 * n * w_tc) < 1e-4


def test_krippendorff_alpha_brute(spark):
    stop = {"the", "a", "of", "and", "to", "in", "is"}
    rows = fetch(f"SELECT text FROM '{SF}/documents.parquet'")
    a = b = c = d = 0
    for (text,) in rows:
        ws = text.split(" ")
        if not ws or len(ws) == 0:
            continue
        r_wc = 1 if 20 <= len(ws) <= 90 else 0
        r_sw = 1 if sum(1 for w in ws if w in stop) >= 2 else 0
        if r_wc and r_sw:
            a += 1
        elif r_wc:
            b += 1
        elif r_sw:
            c += 1
        else:
            d += 1
    n = a + b + c + d
    nn = 2 * n
    n1 = 2 * a + b + c
    n0 = 2 * d + b + c
    d_o = (b + c) / n
    d_e = 2.0 * n1 * n0 / (nn * (nn - 1))
    alpha = 1 - d_o / d_e
    got = QUERIES["krippendorff_alpha_rules"](spark, SF).collect()[0]
    assert got["n_units"] == n
    assert abs(got["d_observed"] - d_o) < 1e-6
    assert abs(got["d_expected"] - d_e) < 1e-6
    assert abs(got["krippendorff_alpha"] - alpha) < 1e-5
