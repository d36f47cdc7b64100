"""Round-11 (part 5): brute-force checks for the stylometry/diversity
text batch, the exact pairwise-cosine moments, and ANOVA effect sizes.

Pure-Python recomputation from the raw sf0.001 parquet: Burrows' Delta
and Gries' DP from Counter loops; MATTR by the LITERAL sliding-window
set-size loop (not the last-occurrence identity the queries use); the
cosine moments by the O(n^2) pair loop over numpy vectors (the query
never forms a pair -- this is the strongest possible cross-check);
eta^2/omega^2/f from group lists.
"""

from __future__ import annotations

import math
from collections import Counter

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


def _docs():
    return fetch(f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'")


def _grid():
    docs = _docs()
    wc = Counter()
    st = Counter()
    ws = Counter()
    for _, src, text in docs:
        toks = text.split(" ")
        st[src] += len(toks)
        for w in toks:
            wc[w] += 1
    top20 = sorted(wc.items(), key=lambda z: (-z[1], z[0]))[:20]
    top = {w for w, _ in top20}
    for _, src, text in docs:
        for w in text.split(" "):
            if w in top:
                ws[(src, w)] += 1
    return dict(top20), st, ws


def test_burrows_delta_brute(spark):
    cw, st, ws = _grid()
    sources = sorted(st)
    zs = {}
    for w in cw:
        fs = {s: ws.get((s, w), 0) / st[s] for s in sources}
        m = sum(fs.values()) / len(sources)
        var = sum((f - m) ** 2 for f in fs.values()) / len(sources)
        if var > 0:
            sd = math.sqrt(var)
            for s in sources:
                zs[(s, w)] = (fs[s] - m) / sd
    words_used = {w for (_, w) in zs}
    got = {
        (r["source_a"], r["source_b"]): r
        for r in QUERIES["burrows_delta_sources"](spark, SF).collect()
    }
    assert len(got) == len(sources) * (len(sources) - 1) // 2
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            delta = sum(
                abs(zs[(a, w)] - zs[(b, w)]) for w in words_used
            ) / len(words_used)
            r = got[(a, b)]
            assert r["n_words"] == len(words_used)
            assert abs(r["burrows_delta"] - delta) < 1e-5


def test_gries_dp_brute(spark):
    cw, st, ws = _grid()
    t = sum(st.values())
    got = {
        r["word"]: r
        for r in QUERIES["gries_dp_dispersion"](spark, SF).collect()
    }
    assert set(got) == set(cw)
    for w, c in cw.items():
        dp = 0.5 * sum(
            abs(ws.get((s, w), 0) / c - st[s] / t) for s in st
        )
        assert got[w]["total_count"] == c
        assert abs(got[w]["dp"] - dp) < 1e-6


def test_mattr_brute(spark):
    per_source = {}
    for _, src, text in _docs():
        toks = text.split(" ")
        L = len(toks)
        if L < 50:
            continue
        tot = sum(
            len(set(toks[i : i + 50])) for i in range(L - 49)
        )
        mattr = tot / (50.0 * (L - 49))
        per_source.setdefault(src, []).append(mattr)
    got = {
        r["source"]: r
        for r in QUERIES["mattr_type_token"](spark, SF).collect()
    }
    assert set(got) == set(per_source)
    for s, vals in per_source.items():
        assert got[s]["n_docs"] == len(vals)
        assert abs(got[s]["mattr_w50"] - sum(vals) / len(vals)) < 1e-5


def test_pairwise_cosine_moments_brute(spark):
    rows = fetch(f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'")
    us = []
    for _, emb in rows:
        v = np.array(emb, dtype=float)
        nv = np.linalg.norm(v)
        if nv > 0:
            us.append(v / nv)
    n = len(us)
    cos = [
        float(us[i] @ us[j])
        for i in range(n)
        for j in range(n)
        if i != j
    ]
    m1 = sum(cos) / len(cos)
    m2 = sum(c * c for c in cos) / len(cos)
    got = QUERIES["embedding_pairwise_cosine_moments"](spark, SF).collect()[
        0
    ]
    assert got["n_vectors"] == n
    assert abs(got["mean_cosine"] - m1) < 1e-5
    assert abs(got["var_cosine"] - (m2 - m1 * m1)) < 1e-5


def test_anova_effect_sizes_brute(spark):
    rows = fetch(f"SELECT event_type, value FROM '{SF}/events.parquet'")
    groups = {}
    for t, v in rows:
        groups.setdefault(t, []).append(round(v * 100))
    allv = [v for g in groups.values() for v in g]
    n, k = len(allv), len(groups)
    gm = sum(allv) / n
    ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups.values())
    sst = sum((v - gm) ** 2 for v in allv)
    ssw = sst - ssb
    msw = ssw / (n - k)
    eta2 = ssb / sst
    omega2 = (ssb - (k - 1) * msw) / (sst + msw)
    f = math.sqrt(eta2 / (1 - eta2))
    got = QUERIES["anova_effect_sizes"](spark, SF).collect()[0]
    assert got["n_events"] == n and got["n_groups"] == k
    assert abs(got["eta_squared"] - eta2) < 1e-6
    assert abs(got["omega_squared"] - omega2) < 1e-6
    assert abs(got["cohen_f"] - f) < 1e-6
