"""Round-10 batch: the effect-size/association panel (plans/effects.py)
checked against independent brute-force Python implementations.

The oracle gate proves Spark == DuckDB; these tests prove both equal the
TEXTBOOK estimator — each statistic is recomputed here from raw rows with
plain Python floats (no shared quantization tricks), so a formula error
that both engines share cannot hide.
"""

from __future__ import annotations

import math
import sys
from collections import Counter

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"

STOPWORDS = {"the", "a", "of", "and", "to", "in", "is"}


def _duck(sql):
    return duckdb.sql(sql).fetchall()


def test_probit_literal_pinned():
    from veri_spark.plans.effects import _CHI2_95_DF1, _Z975

    # independently hardcoded table values (Abramowitz & Stegun)
    assert abs(_Z975 - 1.959963984540054) < 1e-8
    assert abs(_CHI2_95_DF1 - 3.841458820694124) < 1e-7


def test_cramers_v_brute(spark):
    rows = _duck(
        f"SELECT event_type, dayofweek(ts), COUNT(*) FROM '{SF}/events.parquet'"
        " GROUP BY 1, 2"
    )
    obs = {(t, d): c for t, d, c in rows}
    types = sorted({t for t, _, _ in rows})
    dows = sorted({d for _, d, _ in rows})
    n = sum(obs.values())
    rt = {t: sum(c for (tt, _), c in obs.items() if tt == t) for t in types}
    ct = {d: sum(c for (_, dd), c in obs.items() if dd == d) for d in dows}
    chi2 = 0.0
    for t in types:
        for d in dows:
            e = rt[t] * ct[d] / n
            o = obs.get((t, d), 0)
            chi2 += (o - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(len(types), len(dows)) - 1)))
    w = math.sqrt(chi2 / n)
    got = QUERIES["cramers_v_type_weekday"](spark, SF).collect()[0]
    assert got["n_events"] == n
    assert abs(got["chi2"] - chi2) < 1e-4
    assert abs(got["cramers_v"] - v) < 1e-5
    assert abs(got["cohen_w"] - w) < 1e-5
    # bias-corrected V shrinks plain V and stays in [0, 1]
    assert 0.0 <= got["cramers_v_corrected"] <= got["cramers_v"]


def test_pearson_residuals_brute(spark):
    got = {
        (r["event_type"], r["dow"]): r
        for r in QUERIES["pearson_residuals_type_weekday"](spark, SF).collect()
    }
    assert len(got) == 35  # complete 5 x 7 grid, zero cells included
    rows = _duck(
        f"SELECT event_type, dayofweek(ts), COUNT(*) FROM '{SF}/events.parquet'"
        " GROUP BY 1, 2"
    )
    obs = {(t, d): c for t, d, c in rows}
    n = sum(obs.values())
    types = sorted({t for t, _, _ in rows})
    dows = sorted({d for _, d, _ in rows})
    rt = {t: sum(c for (tt, _), c in obs.items() if tt == t) for t in types}
    ct = {d: sum(c for (_, dd), c in obs.items() if dd == d) for d in dows}
    # residuals sum-of-squares = chi2; spot-check every cell
    for t in types:
        for d in dows:
            e = rt[t] * ct[d] / n
            o = obs.get((t, d), 0)
            r = got[(t, d)]
            assert r["n_obs"] == o
            assert abs(r["expected_milli"] - round(1000 * e)) <= 1
            assert abs(r["pearson_resid"] - (o - e) / math.sqrt(e)) < 1e-5


def test_cohens_d_brute(spark):
    vals = {}
    for et in ("purchase", "view"):
        vals[et] = [
            # the engines fold exact DECIMAL(18,2)/(28,4) casts; mirror the
            # cent-grain quantization so the brute mean/var agree closely
            v
            for (v,) in _duck(
                f"SELECT value FROM '{SF}/events.parquet'"
                f" WHERE event_type = '{et}'"
            )
        ]
    na, nb = len(vals["purchase"]), len(vals["view"])
    ma = sum(vals["purchase"]) / na
    mb = sum(vals["view"]) / nb
    va = sum((x - ma) ** 2 for x in vals["purchase"]) / (na - 1)
    vb = sum((x - mb) ** 2 for x in vals["view"]) / (nb - 1)
    sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    d = (ma - mb) / sp
    g = d * (1 - 3 / (4 * (na + nb) - 9))
    got = QUERIES["cohens_d_purchase_view"](spark, SF).collect()[0]
    assert (got["n_purchase"], got["n_view"]) == (na, nb)
    assert abs(got["mean_diff"] - (ma - mb)) < 1e-3
    assert abs(got["cohens_d"] - d) < 1e-3
    assert abs(got["hedges_g"] - g) < 1e-3
    assert abs(got["hedges_g"]) <= abs(got["cohens_d"])


def test_weekend_or_brute(spark):
    rows = _duck(
        f"""SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END,
                   COUNT(*)
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    )
    c = {(w, v): n for w, v, n in rows}
    a, b = c.get((1, 1), 0) + 0.5, c.get((1, 0), 0) + 0.5
    cc, d = c.get((0, 1), 0) + 0.5, c.get((0, 0), 0) + 0.5
    orr = (a * d) / (b * cc)
    se = math.sqrt(1 / a + 1 / b + 1 / cc + 1 / d)
    rr = (a / (a + b)) / (cc / (cc + d))
    got = QUERIES["weekend_purchase_effect"](spark, SF).collect()[0]
    assert abs(got["odds_ratio"] - orr) < 1e-5
    assert abs(got["log_or"] - math.log(orr)) < 1e-5
    assert abs(got["log_or_ci_lo"] - (math.log(orr) - 1.959963984540054 * se)) < 1e-5
    assert abs(got["log_or_ci_hi"] - (math.log(orr) + 1.959963984540054 * se)) < 1e-5
    assert abs(got["risk_ratio"] - rr) < 1e-5
    assert got["log_or_ci_lo"] < got["log_or"] < got["log_or_ci_hi"]


def test_ordinal_association_brute(spark):
    rows = _duck(
        f"SELECT CAST(l_quantity AS BIGINT), l_linenumber, COUNT(*)"
        f" FROM '{SF}/lineitem.parquet' GROUP BY 1, 2"
    )
    cells = [(x, y, c) for x, y, c in rows]
    conc = disc = 0
    for i, (x1, y1, n1) in enumerate(cells):
        for x2, y2, n2 in cells:
            if x2 > x1 and y2 > y1:
                conc += n1 * n2
            elif x2 > x1 and y2 < y1:
                disc += n1 * n2
    n = sum(c for _, _, c in cells)
    tx = Counter()
    ty = Counter()
    for x, y, c in cells:
        tx[x] += c
        ty[y] += c
    n0 = n * (n - 1) // 2
    n1t = sum(c * (c - 1) // 2 for c in tx.values())
    n2t = sum(c * (c - 1) // 2 for c in ty.values())
    gamma = (conc - disc) / (conc + disc)
    tau_b = (conc - disc) / math.sqrt((n0 - n1t) * (n0 - n2t))
    somers = (conc - disc) / (n0 - n1t)
    got = QUERIES["ordinal_association_qty_line"](spark, SF).collect()[0]
    assert got["n_rows"] == n
    assert got["n_concordant"] == conc
    assert got["n_discordant"] == disc
    assert abs(got["gamma"] - gamma) < 1e-6
    assert abs(got["kendall_tau_b"] - tau_b) < 1e-6
    assert abs(got["somers_d_yx"] - somers) < 1e-6
    # the tie-charging order: |gamma| >= |tau_b| always
    assert abs(got["gamma"]) >= abs(got["kendall_tau_b"]) - 1e-9


def _doc_tokens():
    return _duck(f"SELECT text FROM '{SF}/documents.parquet'")


def test_cohens_kappa_brute(spark):
    n = a = b = c = d = 0
    for (text,) in _doc_tokens():
        ws = text.split(" ")
        if not ws:
            continue
        r1 = 20 <= len(ws) <= 90
        r2 = sum(1 for w in ws if w in STOPWORDS) >= 2
        n += 1
        a += r1 and r2
        b += r1 and not r2
        c += (not r1) and r2
        d += (not r1) and not r2
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    got = QUERIES["cohens_kappa_rules"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    assert got["n_both_pass"] == a
    assert got["n_both_fail"] == d
    assert got["n_disagree"] == b + c
    assert abs(got["cohens_kappa"] - kappa) < 1e-6
    assert -1.0 <= got["cohens_kappa"] <= 1.0


def test_fleiss_kappa_brute(spark):
    xs = []
    for (text,) in _doc_tokens():
        ws = text.split(" ")
        if not ws:
            continue
        chars = sum(len(w) for w in ws)
        x = (
            (20 <= len(ws) <= 90)
            + (42 * len(ws) <= chars * 10 <= 48 * len(ws))
            + (sum(1 for w in ws if w in STOPWORDS) >= 2)
        )
        xs.append(x)
    n = len(xs)
    p = sum(xs) / (3 * n)
    pbar = sum(x * (x - 1) + (3 - x) * (2 - x) for x in xs) / (6 * n)
    pe = p * p + (1 - p) * (1 - p)
    kappa = (pbar - pe) / (1 - pe)
    got = QUERIES["fleiss_kappa_rules"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    assert got["sum_passes"] == sum(xs)
    assert abs(got["fleiss_kappa"] - kappa) < 1e-6


def test_mcc_brute(spark):
    tp = fp = fn = tn = 0
    for text, lang in _duck(
        f"SELECT text, lang FROM '{SF}/documents.parquet'"
    ):
        ws = text.split(" ")
        if not ws:
            continue
        guess = sum(1 for w in ws if w in STOPWORDS) / len(ws) >= 0.04
        truth = lang == "en"
        tp += truth and guess
        fp += (not truth) and guess
        fn += truth and not guess
        tn += (not truth) and not guess
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
    assert abs(got["mcc"] - mcc) < 1e-6
    assert abs(got["f1"] - f1) < 1e-6
    assert -1.0 <= got["mcc"] <= 1.0


def test_uncertainty_coeff_brute(spark):
    rows = _duck(
        f"SELECT lang, source, COUNT(*) FROM '{SF}/documents.parquet'"
        " GROUP BY 1, 2"
    )
    n = sum(c for _, _, c in rows)
    nx = Counter()
    ny = Counter()
    for lang, src, c in rows:
        nx[lang] += c
        ny[src] += c
    mi = sum(
        c / n * math.log(c * n / (nx[lang] * ny[src]))
        for lang, src, c in rows
    )
    hx = -sum(v / n * math.log(v / n) for v in nx.values())
    hy = -sum(v / n * math.log(v / n) for v in ny.values())
    got = QUERIES["uncertainty_coeff_lang_source"](spark, SF).collect()[0]
    assert got["n_docs"] == n
    assert abs(got["u_lang_given_source"] - mi / hx) < 1e-4
    assert abs(got["u_source_given_lang"] - mi / hy) < 1e-4
    assert abs(got["u_symmetric"] - 2 * mi / (hx + hy)) < 1e-4
    # information inequalities: 0 <= U <= 1, MI <= min(H)
    assert 0.0 <= got["u_lang_given_source"] <= 1.0
    assert 0.0 <= got["u_source_given_lang"] <= 1.0
    assert got["mi_weighted_micro"] <= min(
        got["h_lang_weighted_micro"], got["h_source_weighted_micro"]
    )


def test_cochran_armitage_brute(spark):
    rows = _duck(
        f"""SELECT dayofweek(ts), COUNT(*),
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            FROM '{SF}/events.parquet' GROUP BY 1"""
    )
    n = sum(ni for _, ni, _ in rows)
    a = sum(ai for _, _, ai in rows)
    s1 = sum(w * ai for w, _, ai in rows)
    s2 = sum(w * ni for w, ni, _ in rows)
    s3 = sum(w * w * ni for w, ni, _ in rows)
    # textbook float form: T = S1 - A*S2/N; Var = A/N (1-A/N)(S3 - S2^2/N)
    t_stat = s1 - a * s2 / n
    var = (a / n) * (1 - a / n) * (s3 - s2 * s2 / n)
    chi2 = t_stat * t_stat / var
    got = QUERIES["cochran_armitage_weekday_trend"](spark, SF).collect()[0]
    assert got["n_events"] == n
    assert got["n_purchases"] == a
    assert abs(got["chi2_trend"] - chi2) < 1e-5
    assert got["trend_95"] == (chi2 > 3.841458820694124)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))


# ---------------------------------------------------------------------------
# batch 2: training-pipeline planning tables
# ---------------------------------------------------------------------------


def test_curriculum_buckets_brute(spark):
    rows = QUERIES["curriculum_quality_buckets"](spark, SF).collect()
    assert [r["stage"] for r in rows] == [1, 2, 3, 4, 5]
    n_docs = _duck(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
        " WHERE len(string_split(text, ' ')) > 0"
    )[0][0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    # equal-frequency: stage sizes differ by at most 1 (ntile contract)
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # stages are quality-ordered and non-overlapping at the micro grain
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_quality_micro"] <= hi["min_quality_micro"]
        assert lo["min_quality_micro"] <= lo["mean_quality_micro"] <= lo["max_quality_micro"]


def test_quality_threshold_sweep_brute(spark):
    rows = QUERIES["quality_threshold_sweep"](spark, SF).collect()
    assert [r["thr_micro"] for r in rows] == [200000, 400000, 600000, 800000]
    # monotone: a stricter gate never keeps more
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs_kept"] <= a["n_docs_kept"]
        assert b["tokens_kept"] <= a["tokens_kept"]
    # brute-force one threshold
    kept = toks = 0
    for (text,) in _doc_tokens():
        ws = text.split(" ")
        if not ws:
            continue
        q = min(1.0, len(ws) / 64.0) * (len(set(ws)) / len(ws))
        if math.floor(1e6 * q + 0.5) >= 400000:
            kept += 1
            toks += len(ws)
    r = rows[1]
    assert (r["n_docs_kept"], r["tokens_kept"]) == (kept, toks)


def test_epochs_per_source_brute(spark):
    rows = QUERIES["epochs_per_source_plan"](spark, SF).collect()
    per_src = {
        s: t
        for s, t in _duck(
            f"SELECT source, SUM(len(string_split(text, ' ')))"
            f" FROM '{SF}/documents.parquet' GROUP BY source"
        )
    }
    assert {r["source"] for r in rows} == set(per_src)
    t_tot = sum(per_src.values())
    s_tot = sum(math.floor(1e6 * math.sqrt(v) + 0.5) for v in per_src.values())
    # budget identity: sum over sources of epochs*tokens = 2 * corpus
    budget = sum(
        2.0 * t_tot * math.floor(1e6 * math.sqrt(per_src[r["source"]]) + 0.5)
        / s_tot
        for r in rows
    )
    assert abs(budget - 2.0 * t_tot) < 1.0
    for r in rows:
        sm = math.floor(1e6 * math.sqrt(per_src[r["source"]]) + 0.5)
        ep = 2.0 * t_tot * sm / (s_tot * per_src[r["source"]])
        assert abs(r["epochs"] - ep) < 1e-5
        assert r["over_epoch_cap"] == (ep > 4.0)
    # target shares sum to ~1e6 (micro-rounded)
    assert abs(sum(r["target_share_micro"] for r in rows) - 1_000_000) <= len(rows)


def test_cumulative_gains_brute(spark):
    rows = QUERIES["cumulative_gains_deciles"](spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    ev = _duck(
        f"""SELECT event_id, value,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
            FROM '{SF}/events.parquet'"""
    )
    ev.sort(key=lambda t: (-t[1], t[0]))
    n = len(ev)
    p_tot = sum(p for _, _, p in ev)
    # brute ntile decile boundaries
    q, rem = divmod(n, 10)
    cum = 0
    start = 0
    for i, r in enumerate(rows, 1):
        size = q + (1 if i <= rem else 0)
        chunk = ev[start : start + size]
        start += size
        cum += sum(p for _, _, p in chunk)
        assert r["n_events"] == size
        assert r["cum_pos"] == cum
        assert r["gain_micro"] == math.floor(1e6 * cum / p_tot + 0.5)
    # the last decile reaches 100% gain and lift 1x
    assert rows[-1]["gain_micro"] == 1_000_000
    assert rows[-1]["lift_micro"] == 1_000_000
    # gains are monotone nondecreasing
    gains = [r["gain_micro"] for r in rows]
    assert gains == sorted(gains)


# ---------------------------------------------------------------------------
# batch 3: AP, CUPED, Hodges-Lehmann, RBO, TwoNN
# ---------------------------------------------------------------------------


def test_average_precision_brute(spark):
    ev = _duck(
        f"""SELECT event_id, value,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
            FROM '{SF}/events.parquet'"""
    )
    ev.sort(key=lambda t: (-t[1], t[0]))
    cum = 0
    terms = []
    for k, (_, _, pos) in enumerate(ev, 1):
        cum += pos
        if pos:
            terms.append(cum / k)
    p = cum
    ap = sum(terms) / p
    got = QUERIES["average_precision_value_score"](spark, SF).collect()[0]
    assert got["n_events"] == len(ev)
    assert got["n_pos"] == p
    assert abs(got["average_precision"] - ap) < 1e-5
    assert got["prevalence_micro"] == math.floor(1e6 * p / len(ev) + 0.5)
    # AP of an informative-or-not score still lives in [prevalence-ish, 1]
    assert 0.0 < got["average_precision"] <= 1.0


def test_cuped_brute(spark):
    rows = _duck(
        f"SELECT user_id, epoch_us(ts::TIMESTAMP), value"
        f" FROM '{SF}/events.parquet'"
    )
    lo = min(t for _, t, _ in rows)
    hi = max(t for _, t, _ in rows)
    mid = lo + (hi - lo) // 2
    agg = {}
    for u, t, v in rows:
        x, y = agg.get(u, (0.0, 0.0))
        # mirror the cent-grain decimal casts
        v = round(v, 2)
        if t <= mid:
            x += v
        else:
            y += v
        agg[u] = (x, y)
    xs = [x for x, _ in agg.values()]
    ys = [y for _, y in agg.values()]
    n = len(agg)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in agg.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    got = QUERIES["cuped_variance_reduction"](spark, SF).collect()[0]
    assert got["n_users"] == n
    assert abs(got["theta"] - theta) < 1e-4
    assert abs(got["var_reduction"] - rho2) < 1e-4
    assert 0.0 <= got["var_reduction"] <= 1.0


def test_hodges_lehmann_brute(spark):
    vals = [
        int(v)
        for (v,) in _duck(f"SELECT l_quantity FROM '{SF}/lineitem.parquet'")
    ]
    # brute Walsh-average median via the value-domain weights (the row
    # grain would be n(n+1)/2 ~ 1.8e7 pairs at sf0.001 — do the same
    # domain collapse independently)
    cnt = Counter(vals)
    walsh = Counter()
    doms = sorted(cnt)
    for i, v1 in enumerate(doms):
        for v2 in doms[i:]:
            wgt = (
                cnt[v1] * (cnt[v1] + 1) // 2
                if v1 == v2
                else cnt[v1] * cnt[v2]
            )
            walsh[v1 + v2] += wgt
    m = sum(walsh.values())
    k1, k2 = (m + 1) // 2, (m + 2) // 2
    cum = 0
    w_lo = w_hi = None
    for w in sorted(walsh):
        cum += walsh[w]
        if w_lo is None and cum >= k1:
            w_lo = w
        if w_hi is None and cum >= k2:
            w_hi = w
    hl = (w_lo + w_hi) / 4
    got = QUERIES["hodges_lehmann_quantity"](spark, SF).collect()[0]
    assert got["n_rows"] == len(vals)
    assert got["n_walsh_pairs"] == len(vals) * (len(vals) + 1) // 2
    assert got["hl_quarter_units"] == w_lo + w_hi
    assert got["hodges_lehmann"] == hl
    # a location estimate must sit inside the data range
    assert min(vals) <= got["hodges_lehmann"] <= max(vals)


def test_rbo_brute(spark):
    # independent weight re-derivation + reference RBO_ext implementation
    from veri_spark.plans.ranking_metrics import (
        _RBO_K,
        _RBO_P,
        _RBO_ROWS,
        _RBO_TAIL_W,
    )

    p = _RBO_P
    for d, w in _RBO_ROWS:
        assert abs(w - (1 - p) / p * p**d / d) < 1e-15
    assert abs(_RBO_TAIL_W - p**_RBO_K / _RBO_K) < 1e-15

    emb = _duck(f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'")
    q = next(e for vid, e in emb if vid == 0)

    def cos(e):
        dot = sum(a * b for a, b in zip(e, q))
        na = math.sqrt(sum(a * a for a in e))
        nq = math.sqrt(sum(b * b for b in q))
        return max(-1.0, min(1.0, dot / (na * nq)))

    def dot(e):
        return sum(a * b for a, b in zip(e, q))

    topc = [v for v, _ in sorted(((vid, cos(e)) for vid, e in emb), key=lambda t: (-t[1], t[0]))[:20]]
    topd = [v for v, _ in sorted(((vid, dot(e)) for vid, e in emb), key=lambda t: (-t[1], t[0]))[:20]]
    xs = [len(set(topc[:d]) & set(topd[:d])) for d in range(1, 21)]
    rbo = xs[-1] / 20 * p**20 + (1 - p) / p * sum(
        xs[d - 1] / d * p**d for d in range(1, 21)
    )
    got = QUERIES["rbo_cosine_vs_dot"](spark, SF).collect()[0]
    assert got["n_common"] == xs[-1]
    assert got["n_common_at10"] == xs[9]
    assert abs(got["rbo_ext_p90"] - rbo) < 1e-5
    assert 0.0 <= got["rbo_ext_p90"] <= 1.0


def test_twonn_brute(spark):
    emb = _duck(f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'")
    import numpy as np

    ids = [vid for vid, _ in emb]
    mat = np.array([e for _, e in emb], dtype=float)
    s = 0.0
    used = 0
    for i in range(len(ids)):
        d = np.sqrt(((mat - mat[i]) ** 2).sum(axis=1))
        d[i] = np.inf
        order = np.lexsort((np.array(ids), d))
        r1, r2 = d[order[0]], d[order[1]]
        if r1 > 0:
            s += math.log(r2 / r1)
            used += 1
    est = used / s
    got = QUERIES["twonn_intrinsic_dimension"](spark, SF).collect()[0]
    assert got["n_vectors"] == len(ids)
    assert got["n_used"] == used
    assert abs(got["id_twonn"] - est) < 1e-3
    # the whole point: intrinsic dimension <= ambient 64
    assert 0 < got["id_twonn"] <= 64.0
