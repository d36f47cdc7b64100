"""Round-10 (part 2): brute-force checks for the effects/AP/CUPED/HL/RBO/
TwoNN batch, which shipped with oracle parity only.

Same discipline as test_round9_batch.py / test_round10_batch.py: recompute
every statistic in plain Python (dicts, math.log, numpy only for the two
vector queries) from the raw sf0.001 parquet and compare against the
registered Spark program, so a formula error shared by both SQL dialects
cannot hide. Integer outputs compare exactly; quantized doubles compare
within quantization tolerance; the RBO depth weights and tail are
RE-DERIVED from p=0.9 rather than copied from the module's literals.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

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


def test_cramers_v_brute(spark):
    rows = fetch(
        f"SELECT event_type, dayofweek(ts) FROM '{SF}/events.parquet'"
    )
    cells = Counter(rows)
    rt = Counter(t for t, _ in rows)
    ct = Counter(d for _, d in rows)
    n = len(rows)
    r, c = len(rt), len(ct)
    chi2 = 0.0
    for t in rt:
        for d in ct:
            e = rt[t] * ct[d] / n
            chi2 += (cells.get((t, d), 0) - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(r, c) - 1)))
    phi2c = max(chi2 / n - (r - 1) * (c - 1) / (n - 1), 0.0)
    r_adj = r - (r - 1) ** 2 / (n - 1)
    c_adj = c - (c - 1) ** 2 / (n - 1)
    vc = math.sqrt(phi2c / (min(r_adj, c_adj) - 1))
    got = QUERIES["cramers_v_type_weekday"](spark, SF).collect()[0]
    assert got["n_events"] == n
    assert got["n_types"] == r and got["n_weekdays"] == c
    assert abs(got["chi2"] - chi2) < 1e-4
    assert abs(got["cramers_v"] - v) < 1e-5
    assert abs(got["cohen_w"] - math.sqrt(chi2 / n)) < 1e-5
    assert abs(got["cramers_v_corrected"] - vc) < 1e-5


def test_cohens_d_brute(spark):
    rows = fetch(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
        f" WHERE event_type IN ('purchase', 'view')"
    )
    a = [v for t, v in rows if t == "purchase"]
    b = [v for t, v in rows if t == "view"]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    sp2 = ((len(a) - 1) * var(a) + (len(b) - 1) * var(b)) / (
        len(a) + len(b) - 2
    )
    d = (sum(a) / len(a) - sum(b) / len(b)) / math.sqrt(sp2)
    g = d * (1 - 3.0 / (4 * (len(a) + len(b)) - 9))
    got = QUERIES["cohens_d_purchase_view"](spark, SF).collect()[0]
    assert got["n_purchase"] == len(a) and got["n_view"] == len(b)
    assert abs(got["cohens_d"] - d) < 1e-5
    assert abs(got["hedges_g"] - g) < 1e-5


def test_weekend_odds_brute(spark):
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
    orr = ((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))
    se = math.sqrt(
        1 / (a + 0.5) + 1 / (b + 0.5) + 1 / (c + 0.5) + 1 / (d + 0.5)
    )
    z = 1.959963984540054
    rr = ((a + 0.5) / (a + b + 1.0)) / ((c + 0.5) / (c + d + 1.0))
    got = QUERIES["weekend_purchase_effect"](spark, SF).collect()[0]
    assert got["n_weekend"] == a + b and got["n_weekday"] == c + d
    assert got["n_weekend_purchase"] == a and got["n_weekday_purchase"] == c
    assert abs(got["odds_ratio"] - orr) < max(1e-5, orr * 1e-5)
    assert abs(got["log_or"] - math.log(orr)) < 1e-5
    assert abs(got["log_or_ci_lo"] - (math.log(orr) - z * se)) < 1e-5
    assert abs(got["log_or_ci_hi"] - (math.log(orr) + z * se)) < 1e-5
    assert abs(got["risk_ratio"] - rr) < 1e-5


def test_ordinal_association_brute(spark):
    rows = fetch(
        f"SELECT CAST(l_quantity AS BIGINT), l_linenumber"
        f" FROM '{SF}/lineitem.parquet'"
    )
    cells = Counter(rows)
    items = list(cells.items())
    conc = disc = 0
    for i, ((x1, y1), n1) in enumerate(items):
        for (x2, y2), n2 in items[i + 1 :]:
            if x1 == x2 or y1 == y2:
                continue
            if (x2 - x1) * (y2 - y1) > 0:
                conc += n1 * n2
            else:
                disc += n1 * n2
    n = len(rows)
    tx = Counter(x for x, _ in rows)
    ty = Counter(y for _, y in rows)
    n2d = n * (n - 1)
    t2x = sum(c * (c - 1) for c in tx.values())
    t2y = sum(c * (c - 1) for c in ty.values())
    gamma = (conc - disc) / (conc + disc)
    taub = 2 * (conc - disc) / math.sqrt((n2d - t2x) * (n2d - t2y))
    somers = 2 * (conc - disc) / (n2d - t2x)
    got = QUERIES["ordinal_association_qty_line"](spark, SF).collect()[0]
    assert got["n_rows"] == n
    assert got["n_concordant"] == conc and got["n_discordant"] == disc
    assert abs(got["gamma"] - gamma) < 1e-6
    assert abs(got["kendall_tau_b"] - taub) < 1e-6
    assert abs(got["somers_d_yx"] - somers) < 1e-6


def _docs_tokens():
    return [
        (text.split(" "), lang, source)
        for text, lang, source in fetch(
            f"SELECT text, lang, source FROM '{SF}/documents.parquet'"
        )
        if text.split(" ") not in ([], [""])
    ]


def test_cohens_kappa_brute(spark):
    from veri_spark.functions.text import EN_STOPWORDS as SW

    a = b = c = d = 0
    for ws, _, _ in _docs_tokens():
        r_wc = 20 <= len(ws) <= 90
        r_sw = sum(1 for w in ws if w in SW) >= 2
        if r_wc and r_sw:
            a += 1
        elif r_wc:
            b += 1
        elif r_sw:
            c += 1
        else:
            d += 1
    n = a + b + c + d
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    got = QUERIES["cohens_kappa_rules"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    assert got["n_both_pass"] == a and got["n_both_fail"] == d
    assert got["n_disagree"] == b + c
    assert abs(got["cohens_kappa"] - kappa) < 1e-5


def test_fleiss_kappa_brute(spark):
    from veri_spark.functions.text import EN_STOPWORDS as SW

    xs = []
    for ws, _, _ in _docs_tokens():
        chars = sum(len(w) for w in ws)
        x = (
            (20 <= len(ws) <= 90)
            + (42 * len(ws) <= chars * 10 <= 48 * len(ws))
            + (sum(1 for w in ws if w in SW) >= 2)
        )
        xs.append(x)
    n = len(xs)
    p = sum(xs) / (3 * n)
    pe = p * p + (1 - p) ** 2
    pbar = sum(x * (x - 1) + (3 - x) * (2 - x) for x in xs) / (6 * n)
    kappa = (pbar - pe) / (1 - pe)
    got = QUERIES["fleiss_kappa_rules"](spark, SF).collect()[0]
    assert got["n_docs"] == n and got["sum_passes"] == sum(xs)
    assert abs(got["fleiss_kappa"] - kappa) < 1e-5


def test_mcc_brute(spark):
    from veri_spark.functions.text import EN_STOPWORDS as SW

    tp = fp = fn = tn = 0
    for ws, lang, _ in _docs_tokens():
        truth = lang == "en"
        guess = sum(1 for w in ws if w in SW) / len(ws) >= 0.04
        if truth and guess:
            tp += 1
        elif guess:
            fp += 1
        elif truth:
            fn += 1
        else:
            tn += 1
    mcc = (tp * tn - fp * fn) / (
        math.sqrt((tp + fp) * (tp + fn)) * math.sqrt((tn + fp) * (tn + fn))
    )
    f1 = 2 * tp / (2 * tp + fp + fn)
    got = QUERIES["matthews_corr_lang_id"](spark, SF).collect()[0]
    assert (got["n_tp"], got["n_fp"], got["n_fn"], got["n_tn"]) == (
        tp,
        fp,
        fn,
        tn,
    )
    assert abs(got["mcc"] - mcc) < 1e-5
    assert abs(got["f1"] - f1) < 1e-5


def test_uncertainty_coeff_brute(spark):
    rows = fetch(f"SELECT lang, source FROM '{SF}/documents.parquet'")
    cells = Counter(rows)
    nx = Counter(lang for lang, _ in rows)
    ny = Counter(src for _, src in rows)
    n = len(rows)
    mi = sum(
        c * math.log(c * n / (nx[lang] * ny[src]))
        for (lang, src), c in cells.items()
    )
    hx = sum(c * math.log(n / c) for c in nx.values())
    hy = sum(c * math.log(n / c) for c in ny.values())
    got = QUERIES["uncertainty_coeff_lang_source"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    # the query folds micro-quantized per-cell terms; n-weighted sums in
    # micro units match the float MI within the guard band
    assert abs(got["mi_weighted_micro"] / 1e6 - mi) < 0.01
    assert abs(got["u_lang_given_source"] - mi / hx) < 1e-4
    assert abs(got["u_source_given_lang"] - mi / hy) < 1e-4
    assert abs(got["u_symmetric"] - 2 * mi / (hx + hy)) < 1e-4


def test_cochran_armitage_brute(spark):
    rows = fetch(
        f"SELECT dayofweek(ts), event_type FROM '{SF}/events.parquet'"
    )
    g = defaultdict(lambda: [0, 0])
    for w, t in rows:
        g[w][0] += 1
        g[w][1] += 1 if t == "purchase" else 0
    n = sum(v[0] for v in g.values())
    a = sum(v[1] for v in g.values())
    s1 = sum(w * v[1] for w, v in g.items())
    s2 = sum(w * v[0] for w, v in g.items())
    s3 = sum(w * w * v[0] for w, v in g.items())
    chi2 = n * (n * s1 - a * s2) ** 2 / (a * (n - a) * (n * s3 - s2 * s2))
    got = QUERIES["cochran_armitage_weekday_trend"](spark, SF).collect()[0]
    assert got["n_events"] == n and got["n_purchases"] == a
    assert abs(got["chi2_trend"] - chi2) < max(1e-5, chi2 * 1e-6)
    assert got["trend_95"] == (chi2 > 1.959963984540054**2)


def test_average_precision_brute(spark):
    rows = fetch(
        f"SELECT event_id, value, event_type FROM '{SF}/events.parquet'"
    )
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum = 0
    terms = []
    for rn, (_, _, t) in enumerate(ranked, start=1):
        if t == "purchase":
            cum += 1
            terms.append(round(1e9 * cum / rn))
    p = len(terms)
    ap = sum(terms) / (p * 1e9)
    got = QUERIES["average_precision_value_score"](spark, SF).collect()[0]
    assert got["n_events"] == len(rows) and got["n_pos"] == p
    assert abs(got["average_precision"] - ap) < 1e-5
    assert got["prevalence_micro"] == round(1e6 * p / len(rows))


def test_cuped_brute(spark):
    rows = fetch(
        f"SELECT user_id, epoch_us(ts::TIMESTAMP), value"
        f" FROM '{SF}/events.parquet'"
    )
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    mid = lo + (hi - lo) // 2
    users = defaultdict(lambda: [0.0, 0.0])
    for u, us, v in rows:
        users[u][0 if us <= mid else 1] += v
    xs = [x for x, _ in users.values()]
    ys = [y for _, y in users.values()]
    n = len(users)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    got = QUERIES["cuped_variance_reduction"](spark, SF).collect()[0]
    assert got["n_users"] == n
    assert abs(got["theta"] - theta) < max(1e-5, abs(theta) * 1e-4)
    assert abs(got["var_reduction"] - rho2) < 1e-5


def test_hodges_lehmann_brute(spark):
    vals = [
        int(r[0])
        for r in fetch(
            f"SELECT CAST(l_quantity AS BIGINT) FROM '{SF}/lineitem.parquet'"
        )
    ]
    cnt = Counter(vals)
    walsh = Counter()
    dom = sorted(cnt)
    for i, va in enumerate(dom):
        walsh[va + va] += cnt[va] * (cnt[va] + 1) // 2
        for vb in dom[i + 1 :]:
            walsh[va + vb] += cnt[va] * cnt[vb]
    n = len(vals)
    m = n * (n + 1) // 2
    assert sum(walsh.values()) == m
    k1, k2 = (m + 1) // 2, (m + 2) // 2
    cum = 0
    w_lo = w_hi = None
    for w in sorted(walsh):
        cum += walsh[w]
        if w_lo is None and cum >= k1:
            w_lo = w
        if w_hi is None and cum >= k2:
            w_hi = w
    hl = (w_lo + w_hi) / 4.0
    got = QUERIES["hodges_lehmann_quantity"](spark, SF).collect()[0]
    assert got["n_rows"] == n and got["n_walsh_pairs"] == m
    assert got["hl_quarter_units"] == w_lo + w_hi
    assert got["hodges_lehmann"] == hl  # /4 is exact in binary


def _embeddings():
    rows = fetch(
        f"SELECT vec_id, embedding::DOUBLE[] FROM '{SF}/embeddings.parquet'"
        f" ORDER BY vec_id"
    )
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows])
    return ids, x


def test_rbo_brute(spark):
    ids, x = _embeddings()
    q = x[ids == 0][0]
    cos = (x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q))
    cos = np.clip(cos, -1.0, 1.0)
    dot = x @ q
    p, k = 0.9, 20

    def top(scores):
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))
        return {int(ids[i]): rn for rn, i in enumerate(order[:k], start=1)}

    ct, dt = top(cos), top(dot)
    common = {v: max(ct[v], dt[v]) for v in set(ct) & set(dt)}
    # weights re-derived from p, not copied from the module
    rbo = sum(
        (1 - p) / p * p**d / d * sum(1 for m in common.values() if m <= d)
        for d in range(1, k + 1)
    ) + p**k / k * len(common)
    got = QUERIES["rbo_cosine_vs_dot"](spark, SF).collect()[0]
    assert got["n_common"] == len(common)
    assert got["n_common_at10"] == sum(1 for m in common.values() if m <= 10)
    assert abs(got["rbo_ext_p90"] - rbo) < 1e-4


def test_twonn_brute(spark):
    ids, x = _embeddings()
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    dist = np.sqrt(d2)
    n = len(ids)
    s_nano = 0
    n_used = 0
    for i in range(n):
        order = sorted((dist[i, j], ids[j]) for j in range(n) if j != i)
        r1, r2 = order[0][0], order[1][0]
        if r1 > 0:
            n_used += 1
            s_nano += round(1e9 * math.log(r2 / r1))
    idd = n_used * 1e9 / s_nano
    got = QUERIES["twonn_intrinsic_dimension"](spark, SF).collect()[0]
    assert got["n_vectors"] == n and got["n_used"] == n_used
    assert abs(got["id_twonn"] - idd) < 1e-3
