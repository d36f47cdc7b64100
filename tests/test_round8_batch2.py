"""Round-8 batch-2 invariants: Mann-Kendall, Kendall tau-b, Jensen-
Shannon drift, resource-allocation link prediction, and MAP@10 —
checked against brute-force Python oracles and their own mathematical
identities on sf0.001, the cheap cross-check layer under the bit-exact
DuckDB gate."""

import math
from collections import defaultdict

import pyspark.sql.functions as F

from veri_spark.plans.registry import QUERIES
from veri_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _daily_counts(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("ts").cast("date").alias("d")
    )
    rows = ev.groupBy("d").count().collect()
    days = sorted((r["d"], r["count"]) for r in rows)
    return [y for _, y in days]


def test_mann_kendall_matches_bruteforce(spark):
    """S, the tie-corrected variance numerator, and z all equal the
    O(n^2) textbook computation on the daily-count series."""
    [row] = QUERIES["mann_kendall_daily_trend"](spark, SF_DIR).collect()
    ys = _daily_counts(spark)
    n = len(ys)
    assert row["n_days"] == n
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert row["s_stat"] == s
    counts = defaultdict(int)
    for y in ys:
        counts[y] += 1
    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in counts.values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    assert row["var_s_x18"] == var18
    if s > 0:
        z = (s - 1) / math.sqrt(var18 / 18.0)
    elif s < 0:
        z = (s + 1) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    assert abs(row["z_mk"] - z) < 1e-6
    assert row["trend_95"] in ("increasing", "decreasing", "no_trend")


def test_z975_literal_matches_acklam():
    """The 97.5% normal quantile literal re-derives from Acklam's
    approximation (the literals-match-formulas discipline shared with
    the QQ probit grid)."""
    from veri_spark.plans.evaluation_metrics import _Z_975

    # Acklam central-region coefficients (same as test_round8_eval.py)
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    p = 0.975
    q = p - 0.5
    r = q * q
    num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = (((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]
    z = q * num / (den * r + 1)
    assert abs(_Z_975 - z) < 2e-9


def test_kendall_tau_matches_bruteforce(spark):
    """tau-b and all pair counts equal the O(n^2) computation over the
    same deterministic top-100 selection."""
    [row] = QUERIES["kendall_tau_part_demand"](spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        d = r["l_shipdate"]
        if d.year in (1996, 1997):
            agg[r["l_partkey"]][d.year - 1996] += int(r["l_quantity"])
    top = sorted(agg.items(), key=lambda kv: (-kv[1][0], kv[0]))[:100]
    xs = [v[0] for _, v in top]
    ys = [v[1] for _, v in top]
    n = len(top)
    assert row["n_parts"] == n and row["n_pairs"] == n * (n - 1) // 2
    c = d_ = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            sgn = (xs[i] - xs[j]) * (ys[i] - ys[j])
            c += sgn > 0
            d_ += sgn < 0
            tx += xs[i] == xs[j]
            ty += ys[i] == ys[j]
    assert (row["concordant"], row["discordant"]) == (c, d_)
    assert (row["ties_x"], row["ties_y"]) == (tx, ty)
    n0 = n * (n - 1) // 2
    tau = (c - d_) / math.sqrt((n0 - tx) * (n0 - ty))
    assert abs(row["tau_b"] - tau) < 1e-6
    assert -1.0 <= row["tau_b"] <= 1.0


def test_js_divergence_identities(spark):
    """Per-type terms are nonnegative (log-sum inequality), totals are
    bounded by ln 2, and the micro terms match a Python recompute from
    the exact counts within 1 micro-nat."""
    rows = QUERIES["js_divergence_event_drift"](spark, SF_DIR).collect()
    assert rows
    ta = sum(r["early_n"] for r in rows)
    tb = sum(r["late_n"] for r in rows)
    total = 0
    for r in rows:
        assert r["js_term_micro"] >= 0
        p, q = r["early_n"] / ta, r["late_n"] / tb
        m = 0.5 * (p + q)
        term = 0.5 * (
            (p * math.log(p / m) if r["early_n"] else 0.0)
            + (q * math.log(q / m) if r["late_n"] else 0.0)
        )
        assert abs(r["js_term_micro"] - round(1e6 * term)) <= 1
        total += r["js_term_micro"]
    # JSD (nats) = sum of per-type (p ln p/m + q ln q/m)/2 <= ln 2
    assert total <= round(1e6 * math.log(2)) + len(rows)


def test_resource_allocation_matches_bruteforce(spark):
    """Top-20 RA scores equal a Python recompute of the capped wedge
    frame: cap each neighborhood to its 128 lowest-(degree, id)
    neighbors, then sum 1000000 // deg(w) over shared capped
    neighbors."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    nbrs = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                nbrs[u].add(v)
                nbrs[v].add(u)
    deg = {u: len(vs) for u, vs in nbrs.items()}
    capped = {
        u: set(sorted(vs, key=lambda v: (deg[v], v))[:128])
        for u, vs in nbrs.items()
    }
    # invert: who keeps w in their capped list
    keepers = defaultdict(list)
    for u, vs in capped.items():
        for w in vs:
            keepers[w].append(u)
    scores = defaultdict(lambda: [0, 0])  # (u,v) -> [n_common, ra_micro]
    for w, us in keepers.items():
        us = sorted(us)
        for i, cu in enumerate(us):
            for cv in us[i + 1:]:
                scores[(cu, cv)][0] += 1
                scores[(cu, cv)][1] += 1000000 // deg[w]
    expect = sorted(
        ((v[1], v[0], k[0], k[1]) for k, v in scores.items()),
        key=lambda t: (-t[0], -t[1], t[2], t[3]),
    )[:20]
    rows = QUERIES["graph_resource_allocation_capped"](
        spark, SF_DIR
    ).collect()
    got = [
        (r["ra_micro"], r["n_common"], r["part_a"], r["part_b"])
        for r in rows
    ]
    assert got == expect


def test_map_matches_python_ap(spark):
    """AP@10 equals the per-query Python computation from the same
    ranked frames, and a perfect ranking scores 1.0."""
    from veri_spark.plans.ranking_metrics import _spark_ranked

    exact, approx = _spark_ranked(spark, SF_DIR, 10)
    ex = defaultdict(set)
    for r in exact.collect():
        ex[r["query_id"]].add(r["vec_id"])
    ap_expect = {}
    for qid in ex:
        ranked = sorted(
            (r["rn"], r["vec_id"])
            for r in approx.collect()
            if r["query_id"] == qid
        )
        hits = 0
        ap_micro = 0
        for rn, vid in ranked:
            if vid in ex[qid]:
                hits += 1
                ap_micro += round(1e6 * hits / rn)
        ap_expect[qid] = ap_micro
    rows = QUERIES["ann_map_audit"](spark, SF_DIR).collect()
    assert {r["query_id"] for r in rows} == set(ex)
    for r in rows:
        assert r["ap_micro_sum"] == ap_expect[r["query_id"]]
        assert 0 <= r["ap_at_10"] <= 1.0
        # rank 1 is the query vector itself in both rankings, so every
        # query has at least one hit
        assert r["n_hits"] >= 1


def test_page_hinkley_matches_bruteforce(spark):
    """Per-type PH gap equals the sequential Python recompute (running
    mean, micro-quantized deviations, running min)."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    )
    counts = defaultdict(lambda: defaultdict(int))
    for r in ev.collect():
        counts[r["event_type"]][r["hr"]] += 1
    # Python round() is half-EVEN; the engines round half-up/away on the
    # positive running-mean term, so emulate with floor(x + 0.5) and
    # allow a 2-micro slack for near-boundary shortest-repr rounding
    # differences (the two ENGINES agree bit-exactly — the DuckDB gate
    # checks that; this test checks the MATH, not the rounding mode).
    expect = {}
    for et, hrs in counts.items():
        s = 0
        m_t = 0
        runmin = 0  # m_0 = 0 enters the min
        gaps = {}
        for t, hr in enumerate(sorted(hrs), start=1):
            n = hrs[hr]
            s += n
            dev = 1000000 * n - math.floor(1e6 * s / t + 0.5)
            m_t += dev
            gaps[hr] = m_t - min(runmin, 0)
            runmin = min(runmin, m_t)
        expect[et] = (gaps, len(hrs))
    rows = QUERIES["events_page_hinkley"](spark, SF_DIR).collect()
    assert {r["event_type"] for r in rows} == set(expect)
    for r in rows:
        gaps, nh = expect[r["event_type"]]
        peak = max(gaps.values())
        assert abs(r["ph_gap_micro"] - peak) <= 2
        assert gaps[r["peak_hour"]] >= peak - 2
        assert r["n_hours"] == nh


def test_holm_stepdown_semantics(spark):
    """Ranks are a permutation, thresholds increase with rank (fewer
    remaining tests -> stricter cutoff is for rank 1), and rejection is
    PREFIX-closed: once a rank fails its threshold, no later rank is
    rejected."""
    from veri_spark.plans.events_behavior import _HOLM_Z

    rows = QUERIES["holm_weekday_conversion_tests"](spark, SF_DIR).collect()
    assert rows
    m = len(rows)
    assert sorted(r["holm_rank"] for r in rows) == list(range(1, m + 1))
    by_rank = sorted(rows, key=lambda r: r["holm_rank"])
    seen_fail = False
    for r in by_rank:
        k = m - r["holm_rank"] + 1
        assert r["z_threshold_micro"] == round(_HOLM_Z[k] * 1e6)
        hit = abs(r["z_score"]) >= _HOLM_Z[k] - 1e-6
        if seen_fail:
            assert not r["rejected"]
        elif not hit:
            # the rounded z may sit within 1e-6 of the cutoff; only a
            # clear miss must terminate the rejection prefix
            if abs(r["z_score"]) < _HOLM_Z[k] - 1e-6:
                assert not r["rejected"]
                seen_fail = True
        assert r["n0"] + r["n1"] > 0


def test_ivf_silhouette_matches_bruteforce(spark):
    """Per-cluster mean/min silhouette equals the Python recompute from
    raw embeddings and the first-8 centroid seed."""
    emb = load_table(spark, SF_DIR, "embeddings").collect()
    cents = sorted(
        ((r["vec_id"], [float(x) for x in r["embedding"]]) for r in emb),
    )[:8]

    def dist(u, v):
        return math.sqrt(sum((a - b) ** 2 for a, b in zip(u, v)))

    per = defaultdict(list)
    for r in emb:
        v = [float(x) for x in r["embedding"]]
        ds = sorted((dist(v, cv), cid) for cid, cv in cents)
        (d1, c1), (d2, _) = ds[0], ds[1]
        s = (d2 - d1) / max(d1, d2) if max(d1, d2) > 0 else 0.0
        per[c1].append(math.floor(1e6 * s + 0.5))
    rows = QUERIES["ivf_silhouette_audit"](spark, SF_DIR).collect()
    assert {r["centroid_id"] for r in rows} == set(per)
    for r in rows:
        ss = per[r["centroid_id"]]
        assert r["n_vectors"] == len(ss)
        assert r["min_sil_micro"] == min(ss)
        assert abs(r["mean_sil_micro"] - sum(ss) / len(ss)) <= 0.5 + 1e-9


def test_cvm_matches_bruteforce(spark):
    """CvM T equals the textbook midrank computation on the raw click /
    view samples."""
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type").isin("click", "view")
    ).select("event_type", "value").collect()
    xs = sorted(
        (r["value"], r["event_type"]) for r in ev
    )
    n1 = sum(1 for _, t in xs if t == "click")
    n2 = len(xs) - n1
    # doubled midranks per observation (pooled and within-sample)
    from itertools import groupby

    u4a = u4b = 0
    c_bef = a_bef = b_bef = 0
    for _, grp in groupby(xs, key=lambda t: t[0]):
        g = list(grp)
        a = sum(1 for _, t in g if t == "click")
        b = len(g) - a
        da = 2 * b_bef + b
        db = 2 * a_bef + a
        u4a += a * da * da
        u4b += b * db * db
        c_bef += len(g)
        a_bef += a
        b_bef += b
    u4 = n1 * u4a + n2 * u4b
    nn = n1 + n2
    t_expect = u4 / (4.0 * n1 * n2 * nn) - (4.0 * n1 * n2 - 1) / (6.0 * nn)
    [row] = QUERIES["cvm_value_drift"](spark, SF_DIR).collect()
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["cvm_t"] - t_expect) < 1e-6
    # under H0 the statistic concentrates near 1/6; sanity-bound it
    assert -0.1 < row["cvm_t"] < 10.0


def test_trimmed_winsorized_matches_bruteforce(spark):
    """Per-half trimmed and winsorized means match a Python recompute
    using the same linear-interpolation quantile rule."""
    ev = load_table(spark, SF_DIR, "events").select("ts", "value").collect()
    days = [r["ts"].date() for r in ev]
    day0, span = min(days), (max(days) - min(days)).days
    halves = defaultdict(list)
    for r in ev:
        h = 0 if (r["ts"].date() - day0).days * 2 <= span else 1
        halves[h].append(r["value"])

    def quantile(vs, p):
        vs = sorted(vs)
        idx = p * (len(vs) - 1)
        lo = math.floor(idx)
        frac = idx - lo
        return vs[lo] if frac == 0 else vs[lo] + frac * (vs[lo + 1] - vs[lo])

    rows = QUERIES["value_trimmed_winsorized_drift"](spark, SF_DIR).collect()
    assert {r["half"] for r in rows} == set(halves)
    for r in rows:
        vs = halves[r["half"]]
        q10, q90 = quantile(vs, 0.1), quantile(vs, 0.9)
        kept = [v for v in vs if q10 <= v <= q90]
        wins = [min(max(v, q10), q90) for v in vs]
        assert r["n"] == len(vs) and r["n_kept"] == len(kept)
        assert abs(r["trimmed_mean"] - sum(kept) / len(kept)) < 1e-5
        assert abs(r["winsorized_mean"] - sum(wins) / len(wins)) < 1e-5
        # winsorizing keeps clamped tails, so it sits no further from
        # the body than the raw mean does
        assert r["q10"] <= r["winsorized_mean"] <= r["q90"]


def test_copurchase_chi2_matches_bruteforce(spark):
    """Top-20 lift + chi2 equal the contingency-table recompute."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    nn = len(orders)
    supp = defaultdict(int)
    pair = defaultdict(int)
    for parts in orders.values():
        ps = sorted(parts)
        for p in ps:
            supp[p] += 1
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                pair[(u, v)] += 1
    rows = QUERIES["copurchase_lift_chi2"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        k = (r["part_a"], r["part_b"])
        nab, na, nb = pair[k], supp[k[0]], supp[k[1]]
        assert r["n_ab"] == nab and nab >= 2
        lift = (nab * 1.0) * nn / ((na * 1.0) * nb)
        det = nab * nn - na * nb
        chi2 = (nn * 1.0) * det * det / (
            (na * 1.0) * nb * (nn - na) * (nn - nb)
        )
        assert abs(r["lift"] - lift) < 1e-5
        assert abs(r["chi2"] - chi2) < 1e-5
        assert r["significant_95"] == (chi2 > 1.959963984540054 ** 2)


def test_chi2_4df_literal_matches_wilson_hilferty():
    """The chi-square(4df) 95% literal agrees with the Wilson-Hilferty
    cube approximation chi2_p ~ df*(1 - 2/(9df) + z_p*sqrt(2/(9df)))^3
    at the ONE-SIDED z_0.95 (the chi-square test rejects in the upper
    tail; only at df=1 does the two-sided z_0.975 square into it), and
    the exact df=4 closed form 1 - e^(-x/2)(1 + x/2) = 0.95 confirms it
    to 6 decimals (the literals-match-formulas discipline)."""
    from veri_spark.plans.integrity import _CHI2_95_4DF_MICRO

    x = _CHI2_95_4DF_MICRO / 1e6
    # exact chi-square(4) CDF: 1 - exp(-x/2) * (1 + x/2)
    assert abs((1 - math.exp(-x / 2) * (1 + x / 2)) - 0.95) < 1e-6
    z95 = 1.6448536269514722  # Acklam probit(0.95)
    df = 4
    wh = df * (1 - 2 / (9 * df) + z95 * math.sqrt(2 / (9 * df))) ** 3
    assert abs(x - wh) < 0.05


def test_kfold_balance_matches_bruteforce(spark):
    """Fold cells and the micro chi-square match a Python recompute from
    the portable hash."""
    from veri_spark.functions.hashing import portable_hash64_py

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang"
    ).collect()
    cells = defaultdict(lambda: [0, 0])
    for r in docs:
        f = portable_hash64_py(str(r["doc_id"]), seed="fold") % 5
        cells[f][0] += 1
        cells[f][1] += r["lang"] == "en"
    nn = sum(v[0] for v in cells.values())
    kk = sum(v[1] for v in cells.values())
    chi2_micro = 0
    for n, k in cells.values():
        e1 = n * 1.0 * kk / nn
        e0 = n * 1.0 * (nn - kk) / nn
        chi2_micro += round(
            1e6 * ((k - e1) ** 2 / e1 + ((n - k) - e0) ** 2 / e0)
        )
    rows = QUERIES["kfold_label_balance_audit"](spark, SF_DIR).collect()
    assert {r["fold"] for r in rows} == set(cells)
    for r in rows:
        n, k = cells[r["fold"]]
        assert (r["n_docs"], r["n_en"]) == (n, k)
        assert abs(r["chi2_micro"] - chi2_micro) <= len(cells)
        # a pure hash split is an A/A test: balance must hold
        assert r["balanced_95"]


def test_encoding_audit_bit_math(spark):
    """Index bits are exact ceil(log2(d)) and the ratio column follows
    from the bit totals; the 3-value flag column must compress hard."""
    rows = {r["col_name"]: r for r in
            QUERIES["columnar_encoding_audit"](spark, SF_DIR).collect()}
    assert set(rows) == {"l_returnflag", "l_linestatus", "l_quantity",
                         "l_partkey", "l_suppkey"}
    for r in rows.values():
        d = r["n_distinct"]
        assert r["index_bits"] == (0 if d <= 1 else math.ceil(math.log2(d))
                                   if d & (d - 1) else int(math.log2(d)))
        assert r["dict_bits"] == r["n"] * r["index_bits"] + (
            r["dict_bits"] - r["n"] * r["index_bits"])
        assert r["dict_ratio_micro"] == round(
            1e6 * r["dict_bits"] / r["plain_bits"])
    # 1-char flags at <=3 distinct values: dictionary wins by >2x
    assert rows["l_returnflag"]["dict_ratio_micro"] < 500_000
    assert rows["l_linestatus"]["dict_ratio_micro"] < 500_000


def test_hill_tail_matches_bruteforce(spark):
    """Hill alpha equals the Python recompute over the same top-101
    order statistics."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.octet_length("text").alias("len")
    ).collect()
    ls = sorted(
        ((r["len"], r["doc_id"]) for r in docs if r["len"] > 0),
        key=lambda t: (-t[0], t[1]),
    )[:101]
    x_tail = ls[100][0]
    ssum = sum(
        math.floor(1e6 * math.log(x * 1.0 / x_tail) + 0.5)
        for x, _ in ls[:100]
    )
    [row] = QUERIES["doc_length_hill_tail"](spark, SF_DIR).collect()
    assert row["k"] == 100 and row["x_tail"] == x_tail
    assert abs(row["sum_log_micro"] - ssum) <= 2
    assert row["hill_alpha"] > 0


def test_acklam_table_spot_values():
    """The programmatic Acklam probit (now the single source of every
    z / chi-square literal) reproduces independently hardcoded spot
    values, including an upper-tail point (BH's strictest threshold
    region uses the tail branch)."""
    from veri_spark.plans.events_behavior import _acklam_probit, _BH_Z, _HOLM_Z

    assert abs(_acklam_probit(0.975) - 1.959963984540054) < 2e-9
    assert abs(_acklam_probit(0.95) - 1.6448536269514722) < 2e-9
    assert abs(_acklam_probit(0.9964285714285714) - 2.6901095) < 2e-6
    assert _HOLM_Z[1] == _acklam_probit(0.975)
    # BH rank-m threshold equals the single-test threshold
    for m in range(1, 8):
        assert _BH_Z[(m, m)] == _acklam_probit(0.975)
        # thresholds tighten as rank drops (fewer implied discoveries)
        for i in range(1, m):
            assert _BH_Z[(i, m)] > _BH_Z[(i + 1, m)]


def test_bh_stepup_semantics_and_dominance(spark):
    """BH rejections are the suffix-closed set up to max_rejected_rank,
    and BH rejects a superset of Holm (step-up dominates step-down on
    the same frame)."""
    bh = QUERIES["bh_weekday_conversion_fdr"](spark, SF_DIR).collect()
    holm = QUERIES["holm_weekday_conversion_tests"](spark, SF_DIR).collect()
    assert {r["dow"] for r in bh} == {r["dow"] for r in holm}
    i_max = bh[0]["max_rejected_rank"]
    for r in bh:
        assert r["rejected"] == (r["bh_rank"] <= i_max)
    holm_rejected = {r["dow"] for r in holm if r["rejected"]}
    bh_rejected = {r["dow"] for r in bh if r["rejected"]}
    assert holm_rejected <= bh_rejected


def test_seasonal_decomposition_matches_bruteforce(spark):
    """Weekday seasonal indexes and the detrended R^2 match a Python
    recompute of the +/-14-day moving-average decomposition."""
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("ts").cast("date").alias("d")
    ).collect()
    days = defaultdict(int)
    for r in ev:
        days[r["d"]] += 1
    day0 = min(days)
    xs = sorted((d - day0).days for d in days)
    y = {(d - day0).days: n for d, n in days.items()}
    dow = {(d - day0).days: (d.weekday() + 1) % 7 for d in days}
    detr = {}
    for x in xs:
        win = [y[j] for j in xs if x - 14 <= j <= x + 14]
        trend = math.floor(1e6 * sum(win) / len(win) + 0.5)
        detr[x] = 1000000 * y[x] - trend
    season = {}
    for w in set(dow.values()):
        vs = [detr[x] for x in xs if dow[x] == w]
        season[w] = math.floor(sum(vs) / len(vs) + 0.5)
    ssd = sum(v * v for v in detr.values())
    ssr = sum((detr[x] - season[dow[x]]) ** 2 for x in xs)
    rows = QUERIES["daily_seasonal_decomposition"](spark, SF_DIR).collect()
    assert {r["dow"] for r in rows} == set(season)
    for r in rows:
        assert abs(r["season_micro"] - season[r["dow"]]) <= 2
        assert abs(r["weekday_r2_micro"] - round(1e6 * (1 - ssr / ssd))) <= 10
    # the weekly cycle on synthetic uniform data should NOT explain most
    # of the variance, but R^2 must be a valid share
    assert all(-1e6 <= r["weekday_r2_micro"] <= 1_000_000 for r in rows)


def test_p_chart_matches_bruteforce(spark):
    """Monthly cells, limits and flags match the Python recompute."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    od = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in load_table(spark, SF_DIR, "orders").collect()
    }
    cells = defaultdict(lambda: [0, 0])
    for r in li:
        o = od[r["l_orderkey"]]
        mon = o.date().replace(day=1)
        cells[mon][0] += 1
        cells[mon][1] += (r["l_shipdate"] - o).days > 90
    nn = sum(v[0] for v in cells.values())
    kk = sum(v[1] for v in cells.values())
    pbar = kk * 1.0 / nn
    rows = QUERIES["ship_late_p_chart"](spark, SF_DIR).collect()
    assert {r["mon"] for r in rows} == set(cells)
    for r in rows:
        n, late = cells[r["mon"]]
        assert (r["n"], r["n_late"]) == (n, late)
        p = late * 1.0 / n
        ucl = pbar + 3 * math.sqrt(pbar * (1 - pbar) / n)
        lcl = max(pbar - 3 * math.sqrt(pbar * (1 - pbar) / n), 0.0)
        assert abs(r["p_micro"] - round(1e6 * p)) <= 1
        assert abs(r["ucl_micro"] - round(1e6 * ucl)) <= 1
        assert r["out_of_control"] == (p > ucl or p < lcl)


def test_distance_concentration_matches_bruteforce(spark):
    """Moments and contrast match the Python recompute over the same
    deterministic hash sample."""
    from veri_spark.functions.hashing import portable_hash64_py

    emb = load_table(spark, SF_DIR, "embeddings").collect()
    sample = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb
        if portable_hash64_py(str(r["vec_id"]), seed="conc") % 4 == 0
    ]
    ds = []
    for i, (ia, ea) in enumerate(sample):
        for ib, eb in sample[i + 1:]:
            d = math.sqrt(sum((a - b) ** 2 for a, b in zip(ea, eb)))
            ds.append(math.floor(1e6 * d + 0.5))
    [row] = QUERIES["knn_distance_concentration"](spark, SF_DIR).collect()
    assert row["n_pairs"] == len(ds)
    assert (row["d_min"], row["d_max"]) == (min(ds), max(ds))
    assert abs(row["mean_micro"] - sum(ds) / len(ds)) <= 1
    assert abs(
        row["relative_contrast"] - (max(ds) - min(ds)) / min(ds)
    ) < 1e-5
    # contrast must be positive and std below mean on any real corpus
    assert row["relative_contrast"] > 0
    assert 0 < row["std_micro"] < row["mean_micro"]


def test_capture_recapture_matches_bruteforce(spark):
    """Capture sets, overlap, and the Chapman estimate match the Python
    recompute; the estimate lands within 3x of the truth on this
    corpus (it is an audit of assumptions, not a precision sketch)."""
    from veri_spark.functions.hashing import portable_hash64_py

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id"
    ).collect()
    c1 = {r["user_id"] for r in ev
          if portable_hash64_py(str(r["event_id"]), seed="cap1") % 10 == 0}
    c2 = {r["user_id"] for r in ev
          if portable_hash64_py(str(r["event_id"]), seed="cap2") % 10 == 0}
    exact = len({r["user_id"] for r in ev})
    chapman = (len(c1) + 1) * (len(c2) + 1) // (len(c1 & c2) + 1) - 1
    [row] = QUERIES["capture_recapture_distinct"](spark, SF_DIR).collect()
    assert (row["n_capture1"], row["n_capture2"]) == (len(c1), len(c2))
    assert row["n_overlap"] == len(c1 & c2)
    assert row["n_hat_chapman"] == chapman
    assert row["exact_distinct"] == exact
    assert row["ratio_micro"] == round(1e6 * chapman / exact)
    assert exact // 3 <= chapman <= exact * 3
