"""Round-14 statistical additions vs literal pure-Python models:
Lepage (textbook midrank Wilcoxon + Ansari-Bradley standardization),
BWS (the literal 1998 weighted sum over order statistics), Dunn's
post-hoc (mean-midrank z with the tie correction), O'Brien's
transformed ANOVA, and Goodman-Kruskal lambda (modal-error counting).
"""

from __future__ import annotations

import math
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


def _midranks(values):
    """value -> midrank over the pooled sample (exact halves)."""
    cnt = Counter(values)
    mid = {}
    below = 0
    for v in sorted(cnt):
        l = cnt[v]
        mid[v] = below + (l + 1) / 2.0
        below += l
    return mid


def test_lepage_matches_textbook(spark):
    rows = _events(spark)
    x = [r["value"] for r in rows if r["wk"] == 1]  # weekend
    y = [r["value"] for r in rows if r["wk"] == 0]
    n1, n2 = len(x), len(y)
    nn = n1 + n2
    allv = x + y
    mid = _midranks(allv)
    cnt = Counter(allv)
    tie3 = sum(l**3 - l for l in cnt.values())

    w = sum(mid[v] for v in x)
    var_w = n1 * n2 / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1.0)))
    zw = (w - n1 * (nn + 1) / 2.0) / math.sqrt(var_w)

    # Ansari-Bradley scores s = min(rank, N+1-rank) at midranks
    s_of = {v: min(mid[v], nn + 1 - mid[v]) for v in cnt}
    ab = sum(s_of[v] for v in x)
    t1 = sum(cnt[v] * s_of[v] for v in cnt)
    t2 = sum(cnt[v] * s_of[v] ** 2 for v in cnt)
    e_ab = n1 * t1 / nn
    var_ab = n1 * n2 * (nn * t2 - t1 * t1) / (nn * nn * (nn - 1.0))
    za = (ab - e_ab) / math.sqrt(var_ab)

    got = QUERIES["lepage_test_weekend_value"](spark, SF).collect()[0]
    assert got["n_weekend"] == n1 and got["n_weekday"] == n2
    assert abs(got["z_wilcoxon"] - zw) < 1e-5
    assert abs(got["z_ansari"] - za) < 1e-5
    assert abs(got["lepage_l"] - (zw * zw + za * za)) < 1e-4


def test_bws_matches_1998_formula(spark):
    rows = _events(spark)
    x = sorted(r["value"] for r in rows if r["wk"] == 1)
    y = sorted(r["value"] for r in rows if r["wk"] == 0)
    mid = _midranks(x + y)

    def b_side(sample, m_self, m_other):
        n = m_self + m_other
        total = 0.0
        for i, v in enumerate(sample, start=1):
            num = (mid[v] - n / m_self * i) ** 2
            den = (
                (i / (m_self + 1.0))
                * (1 - i / (m_self + 1.0))
                * (m_other * n / m_self)
            )
            total += num / den
        return total / m_self

    bx = b_side(x, len(x), len(y))
    by = b_side(y, len(y), len(x))
    got = QUERIES["bws_test_weekend_value"](spark, SF).collect()[0]
    assert got["n_weekend"] == len(x) and got["n_weekday"] == len(y)
    assert abs(got["b_weekend"] - bx) < 1e-4
    assert abs(got["b_weekday"] - by) < 1e-4
    assert abs(got["bws_b"] - (bx + by) / 2.0) < 1e-4


def test_dunn_matches_mean_midrank_z(spark):
    rows = _events(spark)
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r["value"])
    allv = [v for xs in groups.values() for v in xs]
    nn = len(allv)
    mid = _midranks(allv)
    cnt = Counter(allv)
    tie3 = sum(l**3 - l for l in cnt.values())
    var = nn * (nn + 1) / 12.0 - tie3 / (12.0 * (nn - 1.0))
    rbar = {
        g: sum(mid[v] for v in xs) / len(xs) for g, xs in groups.items()
    }
    got = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["dunn_posthoc_value_by_type"](spark, SF).collect()
    }
    names = sorted(groups)
    assert set(got) == {
        (a, b) for i, a in enumerate(names) for b in names[i + 1:]
    }
    for (a, b), r in got.items():
        na, nb = len(groups[a]), len(groups[b])
        z = (rbar[a] - rbar[b]) / math.sqrt(var * (1.0 / na + 1.0 / nb))
        assert r["n_a"] == na and r["n_b"] == nb
        assert abs(r["z_dunn"] - z) < 1e-5


def test_obrien_matches_transformed_anova(spark):
    rows = _events(spark)
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(round(100 * r["value"]))
    rs = []
    labels = []
    for g in sorted(groups):
        xs = groups[g]
        n = len(xs)
        if n <= 2:
            continue
        xbar = sum(xs) / n
        s2 = sum((v - xbar) ** 2 for v in xs) / (n - 1)
        for v in xs:
            rv = ((n - 1.5) * n * (v - xbar) ** 2 - 0.5 * s2 * (n - 1)) / (
                (n - 1) * (n - 2)
            )
            rs.append(rv)
            labels.append(g)
    # sanity: the transform's group mean IS the group variance
    for g in sorted(groups):
        xs = groups[g]
        n = len(xs)
        xbar = sum(xs) / n
        s2 = sum((v - xbar) ** 2 for v in xs) / (n - 1)
        rg = [rv for rv, lg in zip(rs, labels) if lg == g]
        assert abs(sum(rg) / len(rg) - s2) < 1e-6 * max(1.0, s2)
    # one-way ANOVA F on the transformed values
    k = len(set(labels))
    nt = len(rs)
    grand = sum(rs) / nt
    by_g = defaultdict(list)
    for rv, g in zip(rs, labels):
        by_g[g].append(rv)
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in by_g.values())
    ssw = sum(
        (rv - sum(v) / len(v)) ** 2 for v in by_g.values() for rv in v
    )
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    got = QUERIES["obrien_scale_value_by_type"](spark, SF).collect()[0]
    assert got["n_groups"] == k and got["n_total"] == nt
    assert abs(got["f_obrien"] - f) < 1e-3


def test_goodman_kruskal_lambda_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "lang", "source"
    )
    cells = Counter((r["lang"], r["source"]) for r in docs.collect())
    n = sum(cells.values())
    row_tot = defaultdict(int)
    col_tot = defaultdict(int)
    row_max = defaultdict(int)
    col_max = defaultdict(int)
    for (lang, src), c in cells.items():
        row_tot[lang] += c
        col_tot[src] += c
        row_max[lang] = max(row_max[lang], c)
        col_max[src] = max(col_max[src], c)
    max_row = max(row_tot.values())
    max_col = max(col_tot.values())
    lam_sgl = (sum(row_max.values()) - max_col) / (n - max_col)
    lam_lgs = (sum(col_max.values()) - max_row) / (n - max_row)
    lam_sym = (
        sum(row_max.values()) + sum(col_max.values()) - max_col - max_row
    ) / (2 * n - max_col - max_row)
    got = QUERIES["goodman_kruskal_lambda_lang_source"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    assert abs(got["lambda_source_given_lang"] - lam_sgl) < 1e-6
    assert abs(got["lambda_lang_given_source"] - lam_lgs) < 1e-6
    assert abs(got["lambda_symmetric"] - lam_sym) < 1e-6
    assert 0.0 <= got["lambda_symmetric"] <= 1.0


def test_kuiper_matches_cdf_walk(spark):
    rows = _events(spark)
    x = sorted(r["value"] for r in rows if r["event_type"] == "click")
    y = sorted(r["value"] for r in rows if r["event_type"] == "view")
    n1, n2 = len(x), len(y)
    grid = sorted(set(x) | set(y))
    import bisect

    dplus = dminus = 0
    for v in grid:
        c1 = bisect.bisect_right(x, v)
        c2 = bisect.bisect_right(y, v)
        dplus = max(dplus, c1 * n2 - c2 * n1)
        dminus = max(dminus, c2 * n1 - c1 * n2)
    got = QUERIES["kuiper_value_drift"](spark, SF).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["dplus_num"] == dplus and got["dminus_num"] == dminus
    v_stat = (dplus + dminus) / (n1 * n2)
    assert abs(got["kuiper_v"] - v_stat) < 1e-12
    # Kuiper dominates KS: V = D+ + D- >= max(D+, D-) = D
    ks = QUERIES["ks_value_drift"](spark, SF).collect()[0]
    assert got["kuiper_v"] >= ks["ks_stat"] - 1e-12


def test_sign_test_matches_pair_counts(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_shipdate", "l_extendedprice"
    )
    from collections import defaultdict as dd
    from decimal import Decimal

    days = dd(Decimal)
    for r in li.collect():
        d = r["l_shipdate"]
        if d.year in (1996, 1997):
            days[d] += Decimal(str(r["l_extendedprice"]))
    cents = {d: int(v * 100) for d, v in days.items()}
    npos = nneg = 0
    for d, c in cents.items():
        if d.year != 1996:
            continue
        try:
            d2 = d.replace(year=1997)
        except ValueError:
            continue
        if d2 in cents and cents[d2] != c:
            if cents[d2] > c:
                npos += 1
            else:
                nneg += 1
    got = QUERIES["sign_test_yoy_revenue"](spark, SF).collect()[0]
    assert got["n_plus"] == npos and got["n_minus"] == nneg
    n = npos + nneg
    assert got["n_pairs"] == n
    assert abs(got["z_sign"] - (2.0 * npos - n) / math.sqrt(n)) < 1e-6
