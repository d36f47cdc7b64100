"""Round-9 batch: independent brute-force checks of the new queries.

Each test recomputes the query's answer in plain Python (sorting, dicts,
math.log — no SQL, no Spark) from the raw sf0.001 parquet and compares
against the registered Spark program. The DuckDB oracle gate already
cross-checks engine parity; these pin the MATH against a third,
structure-free implementation, so an error shared by both SQL dialects
(a wrong formula, a misplaced tie rule) cannot hide.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def midranks(values):
    """value -> midrank (1-based, ties averaged), computed by sorting."""
    c = Counter(values)
    out, start = {}, 1
    for v in sorted(c):
        out[v] = start + (c[v] - 1) / 2.0
        start += c[v]
    return out


def pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (n * sxy - sx * sy) / den


def test_spearman_qty_price_brute(spark):
    rows = fetch(
        f"SELECT CAST(l_quantity AS BIGINT), l_extendedprice"
        f" FROM '{SF}/lineitem.parquet'"
    )
    rx = midranks([r[0] for r in rows])
    ry = midranks([r[1] for r in rows])
    exp = pearson([rx[r[0]] for r in rows], [ry[r[1]] for r in rows])
    got = QUERIES["spearman_qty_price"](spark, SF).collect()[0]
    assert got["n_rows"] == len(rows)
    assert abs(got["spearman_rho"] - exp) < 2e-6


def test_kruskal_wallis_brute(spark):
    rows = fetch(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    )
    r = midranks([v for _, v in rows])
    groups = defaultdict(list)
    for t, v in rows:
        groups[t].append(r[v])
    n = len(rows)
    h = 12.0 / (n * (n + 1)) * sum(
        sum(g) ** 2 / len(g) for g in groups.values()
    ) - 3 * (n + 1)
    ties = Counter(v for _, v in rows)
    c = 1 - sum(t**3 - t for t in ties.values() if t > 1) / (n**3 - n)
    got = QUERIES["kruskal_wallis_value_by_type"](spark, SF).collect()[0]
    assert got["n_events"] == n and got["n_groups"] == len(groups)
    assert abs(got["h"] - h) < 1e-5
    assert abs(got["h_tie_corrected"] - h / c) < 1e-5


def _daily_cents():
    return fetch(
        f"""SELECT l_shipdate,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) * 100
                        AS BIGINT)
            FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1"""
    )


def _py_median(vals):
    s = sorted(vals)
    m = len(s) // 2
    return float(s[m]) if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def test_runs_test_brute(spark):
    cents = [c for _, c in _daily_cents()]
    med = _py_median(cents)
    sgn = [1 if c > med else 0 for c in cents if float(c) != med]
    n1, n2 = sum(sgn), len(sgn) - sum(sgn)
    runs = 1 + sum(1 for a, b in zip(sgn, sgn[1:]) if a != b)
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    z = (runs - mu) / math.sqrt((mu - 1) * (mu - 2) / (n1 + n2 - 1))
    got = QUERIES["runs_test_daily_revenue"](spark, SF).collect()[0]
    assert (got["n_above"], got["n_below"], got["n_runs"]) == (n1, n2, runs)
    assert abs(got["z_runs"] - z) < 1e-5


def test_acf_brute(spark):
    cents = [c for _, c in _daily_cents()]
    got = {
        r["lag"]: r for r in QUERIES["acf_daily_revenue"](spark, SF).collect()
    }
    for k in (1, 3, 7):
        exp = pearson(cents[:-k], cents[k:])
        assert got[k]["n_pairs"] == len(cents) - k
        assert abs(got[k]["acf"] - exp) < 1e-5


def test_ams_f2_brute(spark):
    from veri_spark.functions.hashing import portable_hash64_py

    counts = Counter(
        u for (u,) in fetch(f"SELECT user_id FROM '{SF}/events.parquet'")
    )
    f2 = sum(c * c for c in counts.values())
    ests = sorted(
        sum(
            (1 - 2 * ((portable_hash64_py(str(u), "ams") >> i) & 1)) * c
            for u, c in counts.items()
        )
        ** 2
        for i in range(16)
    )
    med = (ests[7] + ests[8]) // 2
    got = QUERIES["ams_f2_sketch_audit"](spark, SF).collect()[0]
    assert got["f2_exact"] == f2
    assert got["f2_ams_median"] == med
    assert got["n_users"] == len(counts)


def test_funnel_brute(spark):
    rows = fetch(
        f"SELECT user_id, event_type, ts FROM '{SF}/events.parquet'"
    )
    tv, tc, purch = {}, {}, set()
    by_user = defaultdict(list)
    for u, t, ts in rows:
        by_user[u].append((ts, t))
    for u, evs in by_user.items():
        views = [ts for ts, t in evs if t == "view"]
        if not views:
            continue
        tv[u] = min(views)
        clicks = [ts for ts, t in evs if t == "click" and ts > tv[u]]
        if not clicks:
            continue
        tc[u] = min(clicks)
        if any(t == "purchase" and ts > tc[u] for ts, t in evs):
            purch.add(u)
    got = QUERIES["funnel_view_click_purchase"](spark, SF).collect()[0]
    assert got["n_view_users"] == len(tv)
    assert got["n_click_after_view"] == len(tc)
    assert got["n_purchase_after_click"] == len(purch)


def test_retention_cohorts_brute(spark):
    rows = fetch(f"SELECT user_id, ts::DATE FROM '{SF}/events.parquet'")
    day0 = min(d for _, d in rows)
    uw = {(u, (d - day0).days // 7) for u, d in rows}
    cohort = {}
    for u, w in sorted(uw):
        cohort.setdefault(u, w)
    act = Counter((cohort[u], w - cohort[u]) for u, w in uw)
    size = Counter(cohort.values())
    got = QUERIES["weekly_retention_cohorts"](spark, SF).collect()
    assert len(got) == len(act)
    for r in got:
        key = (r["cohort_week"], r["offset_week"])
        assert r["n_active"] == act[key]
        assert r["n_cohort"] == size[r["cohort_week"]]


def test_gopher_gates_brute(spark):
    docs = fetch(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    )
    stop = {"the", "a", "of", "and", "to", "in", "is"}
    per_source = defaultdict(
        lambda: [0, 0, 0, 0, 0]
    )  # n, wc_pass, mwl_pass, sw_pass, all
    dup = defaultdict(list)
    for _, src, text in docs:
        ws = text.split(" ")
        if len(ws) >= 2:
            bg = Counter(zip(ws, ws[1:]))
            tot = sum(bg.values())
            d = sum(c for c in bg.values() if c >= 2)
            dup[src].append(math.floor(1e6 * d / tot + 0.5))
        if not ws:
            continue
        wc = len(ws)
        chars = sum(len(w) for w in ws)
        sw = sum(1 for w in ws if w in stop)
        p = per_source[src]
        p[0] += 1
        r1, r2, r3 = (
            20 <= wc <= 90,
            42 * wc <= chars * 10 <= 48 * wc,
            sw >= 2,
        )
        p[1] += r1
        p[2] += r2
        p[3] += r3
        p[4] += r1 and r2 and r3
    flags = {
        r["source"]: r
        for r in QUERIES["gopher_quality_flags"](spark, SF).collect()
    }
    for src, (n, a, b, c, d) in per_source.items():
        r = flags[src]
        assert (
            r["n_docs"],
            r["pass_word_count"],
            r["pass_mean_word_len"],
            r["pass_stopwords"],
            r["pass_all"],
        ) == (n, a, b, c, d), src
    rep = {
        r["source"]: r
        for r in QUERIES["gopher_repetition_gate"](spark, SF).collect()
    }
    for src, micros in dup.items():
        r = rep[src]
        assert r["n_docs"] == len(micros)
        assert r["n_flagged"] == sum(1 for m in micros if m > 125000)
        assert r["max_dup_micro"] == max(micros)


def test_word_entropy_brute(spark):
    docs = fetch(f"SELECT source, text FROM '{SF}/documents.parquet'")
    per_source = defaultdict(list)
    for src, text in docs:
        ws = text.split(" ")
        if not ws:
            continue
        c = Counter(ws)
        n = len(ws)
        s_nano = sum(round(1e9 * (k * math.log(k))) for k in c.values())
        per_source[src].append(
            math.floor(1e6 * (math.log(n) - s_nano / (1e9 * n)) + 0.5)
        )
    got = {
        r["source"]: r
        for r in QUERIES["doc_word_entropy_by_source"](spark, SF).collect()
    }
    for src, micros in per_source.items():
        r = got[src]
        assert r["n_docs"] == len(micros)
        assert r["min_ent_micro"] == min(micros)
        assert r["max_ent_micro"] == max(micros)


def test_preferential_attachment_brute(spark):
    li = fetch(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    )
    orders = defaultdict(set)
    for o, p in li:
        orders[o].add(p)
    edges = set()
    for parts in orders.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                edges.add((u, v))
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    top = sorted(deg.items(), key=lambda x: (-x[1], x[0]))[:40]
    cand = [
        (a, b, da, db, da * db)
        for i, (a, da) in enumerate(top)
        for b, db in top[i + 1 :]
        if (min(a, b), max(a, b)) not in edges
    ]
    cand = [
        (min(a, b), max(a, b), da if a < b else db, db if a < b else da, s)
        for a, b, da, db, s in cand
    ]
    exp = sorted(cand, key=lambda x: (-x[4], x[0], x[1]))[:20]
    got = [
        (r["part_a"], r["part_b"], r["deg_a"], r["deg_b"], r["pa_score"])
        for r in QUERIES["graph_preferential_attachment"](spark, SF).collect()
    ]
    assert got == exp


def test_cosine_dot_agreement_brute(spark):
    rows = fetch(
        f"SELECT vec_id, embedding::DOUBLE[] FROM '{SF}/embeddings.parquet'"
    )
    q = dict(rows)[0]

    def topk(score):
        s = [(round(score(e), 6), vid) for vid, e in rows]
        s.sort(key=lambda t: (-t[0], t[1]))
        return {vid: i + 1 for i, (_, vid) in enumerate(s[:20])}

    nq = math.sqrt(sum(x * x for x in q))
    cos = topk(
        lambda e: max(
            -1.0,
            min(
                1.0,
                sum(a * b for a, b in zip(e, q))
                / (math.sqrt(sum(x * x for x in e)) * nq),
            ),
        )
    )
    dot = topk(lambda e: sum(a * b for a, b in zip(e, q)))
    common = set(cos) & set(dot)
    got = QUERIES["cosine_dot_rank_agreement"](spark, SF).collect()[0]
    assert got["n_common"] == len(common)
    assert got["footrule_sum"] == sum(abs(cos[v] - dot[v]) for v in common)


def test_mcnemar_and_cochran_brute(spark):
    docs = fetch(f"SELECT text FROM '{SF}/documents.parquet'")
    stop = {"the", "a", "of", "and", "to", "in", "is"}
    b = c = 0
    c1 = c2 = c3 = sr = sr2 = n = 0
    for (text,) in docs:
        ws = text.split(" ")
        if not ws:
            continue
        n += 1
        wc = len(ws)
        chars = sum(len(w) for w in ws)
        sw = sum(1 for w in ws if w in stop)
        r1, r2, r3 = (
            20 <= wc <= 90,
            42 * wc <= chars * 10 <= 48 * wc,
            sw >= 2,
        )
        b += r1 and not r3
        c += r3 and not r1
        c1 += r1
        c2 += r2
        c3 += r3
        ri = r1 + r2 + r3
        sr += ri
        sr2 += ri * ri
    got = QUERIES["mcnemar_rule_agreement"](spark, SF).collect()[0]
    assert (got["n_wc_only"], got["n_sw_only"]) == (b, c)
    exp = (abs(b - c) - 1.0) ** 2 / (b + c)
    assert abs(got["chi2_mcnemar"] - exp) < 1e-6
    gq = QUERIES["cochran_q_rules"](spark, SF).collect()[0]
    q = (3 * 2 * (c1 * c1 + c2 * c2 + c3 * c3) - 2 * sr * sr) / (
        3 * sr - sr2
    )
    assert (gq["pass_word_count"], gq["pass_mean_word_len"],
            gq["pass_stopwords"]) == (c1, c2, c3)
    assert abs(gq["cochran_q"] - q) < 1e-6


def test_cliffs_delta_brute(spark):
    rows = fetch(
        f"""SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE event_type IN ('purchase', 'view')"""
    )
    p = sorted(v for t, v in rows if t == "purchase")
    w = sorted(v for t, v in rows if t == "view")
    # O(n1*n2) definition: P(p > w) - P(p < w)
    gt = sum(1 for a in p for b in w if a > b)
    lt = sum(1 for a in p for b in w if a < b)
    exp = (gt - lt) / (len(p) * len(w))
    got = QUERIES["cliffs_delta_purchase_view"](spark, SF).collect()[0]
    assert (got["n_purchase"], got["n_view"]) == (len(p), len(w))
    assert abs(got["cliffs_delta"] - exp) < 2e-6


def test_mood_median_brute(spark):
    rows = fetch(f"SELECT event_type, value FROM '{SF}/events.parquet'")
    med = _py_median([v for _, v in rows])
    a, bb = Counter(), Counter()
    for t, v in rows:
        if v > med:
            a[t] += 1
        elif v < med:
            bb[t] += 1
    ta, tb = sum(a.values()), sum(bb.values())
    chi = 0.0
    for t in set(a) | set(bb):
        ng = a[t] + bb[t]
        ea, eb = ng * ta / (ta + tb), ng * tb / (ta + tb)
        chi += (a[t] - ea) ** 2 / ea + (bb[t] - eb) ** 2 / eb
    got = QUERIES["mood_median_test_by_type"](spark, SF).collect()[0]
    assert got["n_classified"] == ta + tb
    assert abs(got["chi2_mood"] - chi) < 1e-5


def test_durbin_watson_brute(spark):
    cents = [c for _, c in _daily_cents()]
    xbar = sum(cents) / len(cents)
    num = sum((b - a) ** 2 for a, b in zip(cents, cents[1:]))
    den = sum((x - xbar) ** 2 for x in cents)
    got = QUERIES["durbin_watson_daily_revenue"](spark, SF).collect()[0]
    assert got["n_days"] == len(cents)
    assert abs(got["dw"] - num / den) < 1e-5


def test_wilcoxon_signed_rank_brute(spark):
    days = fetch(
        f"""SELECT l_shipdate,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) * 100
                        AS BIGINT)
            FROM '{SF}/lineitem.parquet'
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1998-01-01'
            GROUP BY 1"""
    )
    by_md = defaultdict(dict)
    for d, c in days:
        by_md[(d.month, d.day)][d.year] = c
    diffs = [
        v[1997] - v[1996]
        for v in by_md.values()
        if 1996 in v and 1997 in v and v[1997] != v[1996]
    ]
    r = midranks([abs(d) for d in diffs])
    n = len(diffs)
    wp = sum(r[abs(d)] for d in diffs if d > 0)
    ties = Counter(abs(d) for d in diffs)
    t3 = sum(t**3 - t for t in ties.values() if t > 1)
    var = n * (n + 1) * (2 * n + 1) / 24.0 - t3 / 48.0
    z = (wp - n * (n + 1) / 4.0) / math.sqrt(var)
    got = QUERIES["wilcoxon_signed_rank_yoy"](spark, SF).collect()[0]
    assert got["n_pairs"] == n
    assert got["w2_plus"] == round(2 * wp)
    assert abs(got["z_wilcoxon"] - z) < 1e-5


def test_friedman_brute(spark):
    days = sorted(_daily_cents())
    day0 = days[0][0]
    blocks = defaultdict(list)
    for d, c in days:
        blocks[(d - day0).days // 7].append((d, c))
    col = defaultdict(float)
    n_blocks = 0
    for blk, rows in blocks.items():
        if len(rows) != 7:
            continue
        n_blocks += 1
        r = midranks([c for _, c in rows])
        for d, c in rows:
            wd = (d.isoweekday()) % 7  # 0 = Sunday, matching both engines
            col[wd] += r[c]
    k = 7
    chi2 = 12.0 / (n_blocks * k * (k + 1)) * sum(
        v * v for v in col.values()
    ) - 3 * n_blocks * (k + 1)
    got = QUERIES["friedman_weekday_revenue"](spark, SF).collect()[0]
    assert got["n_weeks"] == n_blocks
    assert abs(got["chi2_friedman"] - chi2) < 1e-5
    assert abs(got["kendall_w"] - chi2 / (n_blocks * (k - 1))) < 1e-6


def test_levene_brute(spark):
    rows = fetch(f"SELECT event_type, value FROM '{SF}/events.parquet'")
    groups = defaultdict(list)
    for t, v in rows:
        groups[t].append(v)
    zs = defaultdict(list)
    for t, vs in groups.items():
        m = _py_median(vs)
        zs[t] = [math.floor(1e3 * abs(v - m) + 0.5) for v in vs]
    n = sum(len(v) for v in zs.values())
    k = len(zs)
    st = sum(sum(v) for v in zs.values())
    qt = sum(x * x for v in zs.values() for x in v)
    gsum = sum(round(sum(v) ** 2 / len(v)) for v in zs.values())
    between = (gsum - st * st / n) / (k - 1)
    within = (qt - gsum) / (n - k)
    got = QUERIES["levene_value_by_type"](spark, SF).collect()[0]
    assert got["n_events"] == n and got["n_groups"] == k
    assert abs(got["f_brown_forsythe"] - between / within) < 1e-5


def test_theil_u2_brute(spark):
    cents = [c for _, c in _daily_cents()]
    pairs = [
        (cents[i], cents[i - 1], cents[i - 7]) for i in range(7, len(cents))
    ]
    sse_s = sum((x - l7) ** 2 for x, _, l7 in pairs)
    sse_n = sum((x - l1) ** 2 for x, l1, _ in pairs)
    got = QUERIES["theil_u2_daily_forecast"](spark, SF).collect()[0]
    assert got["n_days_scored"] == len(pairs)
    assert abs(got["u2_seasonal_vs_naive"] - math.sqrt(sse_s / sse_n)) < 1e-6
