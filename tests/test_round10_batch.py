"""Round-10 batch: independent brute-force checks of the new queries.

Each test recomputes the query's answer in plain Python (sorting, dicts,
math.log — no SQL, no Spark) from the raw sf0.001 parquet and compares
against the registered Spark program. The DuckDB oracle gate already
cross-checks engine parity; these pin the MATH against a third,
structure-free implementation, so an error shared by both SQL dialects
(a wrong formula, a misplaced tie rule) cannot hide.
"""

from __future__ import annotations

import hashlib
import math
import re
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


def _purchase_view_values():
    rows = fetch(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
        f" WHERE event_type IN ('purchase', 'view')"
    )
    a = [v for t, v in rows if t == "purchase"]
    b = [v for t, v in rows if t == "view"]
    return a, b


def _var(xs):
    n = len(xs)
    m = sum(xs) / n
    return sum((x - m) ** 2 for x in xs) / (n - 1)


def test_welch_ttest_brute(spark):
    a, b = _purchase_view_values()
    sea = _var(a) / len(a)
    seb = _var(b) / len(b)
    t = (sum(a) / len(a) - sum(b) / len(b)) / math.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (
        sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
    )
    got = QUERIES["welch_ttest_purchase_view"](spark, SF).collect()[0]
    assert got["n_purchase"] == len(a) and got["n_view"] == len(b)
    assert abs(got["welch_t"] - t) < 2e-5
    assert abs(got["satterthwaite_df"] - df) < max(1e-3, df * 1e-5)
    assert got["means_differ_95"] == (abs(t) > 1.959963984540054)


def test_oneway_anova_brute(spark):
    rows = fetch(f"SELECT event_type, value FROM '{SF}/events.parquet'")
    groups = defaultdict(list)
    for t, v in rows:
        groups[t].append(v)
    n = len(rows)
    k = len(groups)
    gm = sum(v for _, v in rows) / n
    ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups.values())
    ssw = sum(
        sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = QUERIES["oneway_anova_value_by_type"](spark, SF).collect()[0]
    assert got["n_groups"] == k and got["n_events"] == n
    assert abs(got["f_stat"] - f) < max(1e-4, f * 1e-5)
    assert abs(got["eta_sq"] - ssb / (ssb + ssw)) < 1e-5


def test_tukey_hsd_brute(spark):
    rows = fetch(f"SELECT event_type, value FROM '{SF}/events.parquet'")
    groups = defaultdict(list)
    for t, v in rows:
        groups[t].append(v)
    n = len(rows)
    k = len(groups)
    ssw = sum(
        sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups.values()
    )
    msw = ssw / (n - k)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["tukey_hsd_value_by_type"](spark, SF).collect()
    }
    names = sorted(groups)
    n_pairs = 0
    for i, ta in enumerate(names):
        for tb in names[i + 1 :]:
            ga, gb = groups[ta], groups[tb]
            diff = sum(ga) / len(ga) - sum(gb) / len(gb)
            q = abs(diff) / math.sqrt(
                msw / 2.0 * (1.0 / len(ga) + 1.0 / len(gb))
            )
            r = got[(ta, tb)]
            assert abs(r["mean_diff"] - diff) < 2e-6
            assert abs(r["q_stat"] - q) < max(1e-4, q * 1e-5)
            assert r["differs_95"] == (q > 3.858)
            n_pairs += 1
    assert n_pairs == len(got) == k * (k - 1) // 2


def test_bartlett_brute(spark):
    rows = fetch(f"SELECT event_type, value FROM '{SF}/events.parquet'")
    groups = defaultdict(list)
    for t, v in rows:
        groups[t].append(v)
    n = len(rows)
    k = len(groups)
    sp2 = sum((len(g) - 1) * _var(g) for g in groups.values()) / (n - k)
    num = (n - k) * math.log(sp2) - sum(
        (len(g) - 1) * math.log(_var(g)) for g in groups.values()
    )
    c = 1 + (
        sum(1.0 / (len(g) - 1) for g in groups.values()) - 1.0 / (n - k)
    ) / (3 * (k - 1))
    chi2 = num / c
    got = QUERIES["bartlett_test_value_by_type"](spark, SF).collect()[0]
    assert got["n_groups"] == k and got["n_events"] == n
    assert abs(got["bartlett_chi2"] - chi2) < max(1e-3, chi2 * 1e-4)


def test_jarque_bera_brute(spark):
    vals = [r[0] for r in fetch(f"SELECT value FROM '{SF}/events.parquet'")]
    n = len(vals)
    m = sum(vals) / n
    m2 = sum((v - m) ** 2 for v in vals) / n
    m3 = sum((v - m) ** 3 for v in vals) / n
    m4 = sum((v - m) ** 4 for v in vals) / n
    s = m3 / m2**1.5
    kurt = m4 / m2**2 - 3
    jb = n / 6.0 * (s * s + 0.25 * kurt * kurt)
    got = QUERIES["jarque_bera_value"](spark, SF).collect()[0]
    assert got["n_events"] == n
    assert abs(got["skewness"] - s) < 1e-5
    assert abs(got["excess_kurtosis"] - kurt) < 1e-5
    assert abs(got["jb_stat"] - jb) < max(1e-3, jb * 1e-5)


def test_chi2_goodness_weekday_brute(spark):
    rows = fetch(
        f"SELECT dayofweek(o_orderdate) FROM '{SF}/orders.parquet'"
    )
    c = Counter(r[0] for r in rows)
    n = len(rows)
    k = len(c)
    e = n / k
    chi2 = sum((o - e) ** 2 / e for o in c.values())
    got = QUERIES["chi2_goodness_weekday_orders"](spark, SF).collect()[0]
    assert got["n_orders"] == n and got["n_days"] == k
    assert abs(got["chi2_uniform"] - chi2) < 1e-4


def _half_split(table, col):
    rows = fetch(
        f"SELECT {col}, ts::DATE FROM '{SF}/{table}.parquet'"
    )
    days = [d for _, d in rows]
    day0, span = min(days), (max(days) - min(days)).days
    return [(v, 0 if (d - day0).days * 2 <= span else 1) for v, d in rows]


def test_wasserstein_brute(spark):
    rows = _half_split("events", "value")
    a = sorted(v for v, h in rows if h == 0)
    b = sorted(v for v, h in rows if h == 1)
    domain = sorted(set(a) | set(b))
    ca = Counter(a)
    cb = Counter(b)
    w1, f1, f2 = 0.0, 0, 0
    for v, nxt in zip(domain, domain[1:]):
        f1 += ca[v]
        f2 += cb[v]
        w1 += abs(f1 / len(a) - f2 / len(b)) * (nxt - v)
    got = QUERIES["wasserstein_value_drift"](spark, SF).collect()[0]
    assert got["n_early"] == len(a) and got["n_late"] == len(b)
    assert got["n_domain"] == len(domain)
    assert abs(got["wasserstein_1"] - w1) < 1e-4


def test_hellinger_tv_brute(spark):
    rows = _half_split("events", "event_type")
    a = Counter(v for v, h in rows if h == 0)
    b = Counter(v for v, h in rows if h == 1)
    ta, tb = sum(a.values()), sum(b.values())
    types = set(a) | set(b)
    bc = sum(math.sqrt((a[t] / ta) * (b[t] / tb)) for t in types)
    tv = sum(abs(a[t] / ta - b[t] / tb) for t in types) / 2.0
    h = math.sqrt(1 - min(bc, 1.0))
    got = QUERIES["hellinger_tv_event_drift"](spark, SF).collect()[0]
    assert got["n_early"] == ta and got["n_late"] == tb
    assert abs(got["hellinger"] - h) < 1e-4
    assert abs(got["total_variation"] - tv) < 1e-5


EN_STOPWORDS = None  # loaded lazily from the package to stay in sync


def _rule_rows():
    from veri_spark.functions.text import EN_STOPWORDS as SW

    rows = fetch(f"SELECT text FROM '{SF}/documents.parquet'")
    out = []
    for (text,) in rows:
        ws = text.split(" ")
        if not ws or ws == [""]:
            continue
        hits = sum(1 for w in ws if w in SW)
        out.append((ws, hits))
    return out


def test_ece_brute(spark):
    rows = fetch(f"SELECT text, lang FROM '{SF}/documents.parquet'")
    from veri_spark.functions.text import EN_STOPWORDS as SW

    bins = defaultdict(lambda: [0, 0, 0])  # n, pos, sum score_micro
    for text, lang in rows:
        ws = text.split(" ")
        if not ws or ws == [""]:
            continue
        hits = sum(1 for w in ws if w in SW)
        b = min(10 * hits // len(ws), 9)
        bins[b][0] += 1
        bins[b][1] += 1 if lang == "en" else 0
        bins[b][2] += round(1e6 * hits / len(ws))
    n = sum(v[0] for v in bins.values())
    gaps = {
        b: abs(round(1e6 * p / c) - round(sm / c))
        for b, (c, p, sm) in bins.items()
    }
    ece = round(sum(bins[b][0] * gaps[b] for b in bins) / n)
    mce = max(gaps.values())
    got = QUERIES["expected_calibration_error"](spark, SF).collect()[0]
    assert got["n_docs"] == n and got["n_bins"] == len(bins)
    assert got["ece_micro"] == ece
    assert got["mce_micro"] == mce


def test_decision_stump_brute(spark):
    rows = fetch(f"SELECT value, event_type FROM '{SF}/events.parquet'")
    dom = defaultdict(lambda: [0, 0])
    for v, t in rows:
        dom[v][0] += 1
        dom[v][1] += 1 if t == "purchase" else 0
    tn = sum(v[0] for v in dom.values())
    tp = sum(v[1] for v in dom.values())

    def gini(p, n):
        return 1 - (p / n) ** 2 - ((n - p) / n) ** 2

    best = None
    cn = cp = 0
    for v in sorted(dom):
        cn += dom[v][0]
        cp += dom[v][1]
        if cn == 0 or cn == tn:
            continue
        rn, rp = tn - cn, tp - cp
        gain = (
            gini(tp, tn)
            - cn / tn * gini(cp, cn)
            - rn / tn * gini(rp, rn)
        )
        key = (-gain, v)
        if best is None or key < best[0]:
            best = (key, v, cn, cp, rn, rp, gain)
    got = QUERIES["decision_stump_value_purchase"](spark, SF).collect()[0]
    assert got["threshold"] == best[1]
    assert got["n_left"] == best[2] and got["pos_left"] == best[3]
    assert got["n_right"] == best[4] and got["pos_right"] == best[5]
    assert abs(got["gini_gain"] - best[6]) < 1e-8


def test_hits_brute(spark):
    rows = fetch(
        f"SELECT DISTINCT o.o_custkey, l.l_partkey"
        f" FROM '{SF}/orders.parquet' o"
        f" JOIN '{SF}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey"
    )
    by_c = defaultdict(list)
    a1 = Counter()
    for c, p in rows:
        by_c[c].append(p)
        a1[p] += 1
    h1 = {c: sum(a1[p] for p in ps) for c, ps in by_c.items()}
    a2 = Counter()
    for c, ps in by_c.items():
        for p in ps:
            a2[p] += h1[c]
    top = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = QUERIES["hits_authorities_bipartite"](spark, SF).collect()
    assert [(r["l_partkey"], r["authority_2"]) for r in got] == top
    for r in got:
        assert r["indegree"] == a1[r["l_partkey"]]


def test_chao1_brute(spark):
    rows = fetch(f"SELECT text FROM '{SF}/documents.parquet'")
    tf = Counter()
    for (text,) in rows:
        tf.update(text.split(" "))
    f1 = sum(1 for c in tf.values() if c == 1)
    f2 = sum(1 for c in tf.values() if c == 2)
    v = len(tf)
    n = sum(tf.values())
    chao1 = v + f1 * (f1 - 1) / (2.0 * (f2 + 1))
    got = QUERIES["chao1_vocab_richness"](spark, SF).collect()[0]
    assert got["v_obs"] == v and got["n_tokens"] == n
    assert got["hapax"] == f1 and got["dis_legomena"] == f2
    assert abs(got["chao1_estimate"] - chao1) < 1e-4
    assert abs(got["good_turing_coverage"] - (1 - f1 / n)) < 1e-6


def test_cronbach_alpha_brute(spark):
    items = []
    for ws, hits in _rule_rows():
        chars = sum(len(w) for w in ws)
        r1 = 1 if 20 <= len(ws) <= 90 else 0
        r2 = 1 if 42 * len(ws) <= chars * 10 <= 48 * len(ws) else 0
        r3 = 1 if hits >= 2 else 0
        items.append((r1, r2, r3))
    n = len(items)
    k = 3
    tot = [sum(t) for t in items]
    var_t = (n * sum(x * x for x in tot) - sum(tot) ** 2) / (n * (n - 1))
    var_items = sum(
        (sum(t[j] for t in items) * (n - sum(t[j] for t in items)))
        / (n * (n - 1))
        for j in range(k)
    )
    alpha = k / (k - 1) * (1 - var_items / var_t)
    got = QUERIES["cronbachs_alpha_rules"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    assert abs(got["cronbach_alpha"] - alpha) < 1e-5


def test_g_test_brute(spark):
    rows = fetch(
        f"SELECT event_type, dayofweek(ts) FROM '{SF}/events.parquet'"
    )
    cells = Counter(rows)
    rt = Counter(t for t, _ in rows)
    ct = Counter(d for _, d in rows)
    n = len(rows)
    g = 0.0
    for (t, d), o in cells.items():
        e = rt[t] * ct[d] / n
        g += 2.0 * o * math.log(o / e)
    got = QUERIES["g_test_type_weekday"](spark, SF).collect()[0]
    assert got["n_events"] == n
    assert got["n_types"] == len(rt) and got["n_days"] == len(ct)
    assert abs(got["g_stat"] - g) < 1e-4


def test_shannon_evenness_brute(spark):
    rows = fetch(f"SELECT source, lang FROM '{SF}/documents.parquet'")
    by_src = defaultdict(Counter)
    for s, lang in rows:
        by_src[s][lang] += 1
    got = {
        r["source"]: r
        for r in QUERIES["lang_shannon_evenness_by_source"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(by_src)
    for s, c in by_src.items():
        n = sum(c.values())
        h = -sum(v / n * math.log(v / n) for v in c.values())
        r = got[s]
        assert r["n_docs"] == n and r["n_langs"] == len(c)
        assert abs(r["shannon_h_nats"] - h) < 1e-5
        if len(c) > 1:
            assert abs(r["pielou_evenness"] - h / math.log(len(c))) < 1e-5


def test_nelson_aalen_brute(spark):
    rows = fetch(
        f"SELECT user_id, epoch_us(ts::TIMESTAMP), event_type"
        f" FROM '{SF}/events.parquet'"
    )
    users = defaultdict(lambda: [None, None, None])  # fu, pu, lu
    for u, us, t in rows:
        rec = users[u]
        rec[0] = us if rec[0] is None else min(rec[0], us)
        rec[2] = us if rec[2] is None else max(rec[2], us)
        if t == "purchase":
            rec[1] = us if rec[1] is None else min(rec[1], us)
    HOUR = 3600000000
    obs = []
    for fu, pu, lu in users.values():
        if pu is not None and (pu - fu) // HOUR < 48:
            obs.append(((pu - fu) // HOUR, 1))
        else:
            obs.append((min(48, (lu - fu) // HOUR), 0))
    d = defaultdict(lambda: [0, 0])  # d_t, m_t
    for t, e in obs:
        d[t][0] += e
        d[t][1] += 1
    ch = 0
    cv = 0
    exp = []
    for t in sorted(d):
        n_t = sum(m for tt, (_, m) in d.items() if tt >= t)
        d_t = d[t][0]
        if d_t > 0:
            ch += round(1e9 * d_t / n_t)
            cv += round(1e9 * d_t / (n_t * n_t))
            exp.append((t, n_t, d_t, ch, cv))
    got = QUERIES["nelson_aalen_time_to_purchase"](spark, SF).collect()
    rows_got = [
        (
            r["t_hours"],
            r["n_at_risk"],
            r["n_events"],
            r["cum_hazard_nano"],
            r["cum_hazard_var_nano"],
        )
        for r in got
    ]
    assert rows_got == exp


def test_dup_span_extents_brute(spark):
    rows = fetch(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    shingles = defaultdict(set)  # shingle -> docs
    per_doc = {}
    for doc, text in rows:
        ws = text.split(" ")
        sh = [
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        ] if len(ws) >= 3 else []
        per_doc[doc] = sh
        for s in sh:
            shingles[s].add(doc)
    hist = Counter()
    removable = Counter()
    for doc, sh in per_doc.items():
        covered = set()
        for i, s in enumerate(sh):
            if len(shingles[s]) >= 2:
                covered.update((i, i + 1, i + 2))
        run = 0
        prev = None
        for t in sorted(covered) + [None]:
            if prev is not None and t == prev + 1:
                run += 1
            else:
                if run:
                    hist[min(run, 12)] += 1
                    removable[min(run, 12)] += run
                run = 1 if t is not None else 0
            prev = t
    got = QUERIES["dup_span_extents"](spark, SF).collect()
    assert {
        (r["span_len_capped"], r["n_spans"], r["tokens_removable"])
        for r in got
    } == {(k, hist[k], removable[k]) for k in hist}


def test_randomization_test_brute(spark):
    rows = fetch(
        f"SELECT event_id, value, dayofweek(ts) FROM '{SF}/events.parquet'"
    )
    n1 = n0 = 0
    s1 = s0 = 0.0
    hs = []
    for eid, v, dow in rows:
        if dow in (0, 6):
            n1 += 1
            s1 += v
        else:
            n0 += 1
            s0 += v
        hs.append((int(hashlib.md5(str(eid).encode()).hexdigest()[:15], 16), v))
    obs = s1 / n1 - s0 / n0
    extreme = 0
    reps = 0
    for r in range(60):
        a_n = b_n = 0
        a_s = b_s = 0.0
        for h, v in hs:
            if (h >> r) & 1:
                a_n += 1
                a_s += v
            else:
                b_n += 1
                b_s += v
        if a_n and b_n:
            reps += 1
            if abs(a_s / a_n - b_s / b_n) >= abs(obs):
                extreme += 1
    got = QUERIES["randomization_test_weekend_value"](spark, SF).collect()[0]
    assert got["n_weekend"] == n1 and got["n_weekday"] == n0
    assert abs(got["obs_mean_diff"] - obs) < 2e-6
    assert got["n_replicates"] == reps
    assert got["n_extreme"] == extreme


def test_readability_brute(spark):
    rows = fetch(f"SELECT source, text FROM '{SF}/documents.parquet'")
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, words, sents, syl, cplx
    vowels = re.compile(r"[aeiouy]+")
    for src, text in rows:
        ws = text.split(" ")
        if not ws or ws == [""]:
            continue
        a = agg[src]
        a[0] += 1
        a[1] += len(ws)
        a[2] += max(1, len(re.findall(r"[.!?]+", text)))
        a[3] += sum(max(1, len(vowels.findall(w.lower()))) for w in ws)
        a[4] += sum(1 for w in ws if len(vowels.findall(w.lower())) >= 3)
    got = {
        r["source"]: r
        for r in QUERIES["readability_flesch_by_source"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for src, (nd, w, s, y, cx) in agg.items():
        r = got[src]
        assert r["n_docs"] == nd and r["words"] == w and r["sylls"] == y
        assert abs(r["syllables_per_word"] - y / w) < 1e-6
        assert abs(r["complex_share"] - cx / w) < 1e-6
        fl = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert abs(r["flesch_reading_ease"] - fl) < 1e-4
