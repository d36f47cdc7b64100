"""Round-10 (part 3): brute-force checks for the training-pipeline
planning tables and an exact pure-Python replay of the micro-int Lloyd
trainer.

Same discipline as the sibling brute files: plain-Python recomputation
from raw sf0.001 parquet. The ntile cuts are re-derived from first
principles (first N mod k buckets get the extra row) rather than through
any ranking helper, so the distributed ntile path is checked against the
definition, not against itself.
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _ntile(idx, n, k):
    """SQL ntile: 0-based rank idx of n rows into k buckets (1-based)."""
    big = n % k
    size = n // k
    cut = big * (size + 1)
    if idx < cut:
        return idx // (size + 1) + 1
    return big + (idx - cut) // size + 1


def _quality(ws):
    return min(1.0, len(ws) / 64.0) * (len(set(ws)) / len(ws))


def test_curriculum_quality_buckets_brute(spark):
    rows = fetch(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    docs = [
        (doc, text.split(" "))
        for doc, text in rows
        if text.split(" ") not in ([], [""])
    ]
    scored = sorted(
        (( _quality(ws), doc, len(ws)) for doc, ws in docs),
        key=lambda t: (t[0], t[1]),
    )
    n = len(scored)
    agg = defaultdict(lambda: [0, 0, [], None, None])
    for i, (q, _, ntoks) in enumerate(scored):
        st = _ntile(i, n, 5)
        qm = math.floor(1e6 * q + 0.5)
        a = agg[st]
        a[0] += 1
        a[1] += ntoks
        a[2].append(qm)
    got = {
        r["stage"]: r
        for r in QUERIES["curriculum_quality_buckets"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for st, (nd, ntok, qms, _, _) in agg.items():
        r = got[st]
        assert r["n_docs"] == nd and r["n_tokens"] == ntok
        assert r["min_quality_micro"] == min(qms)
        assert r["max_quality_micro"] == max(qms)
        assert r["mean_quality_micro"] == round(sum(qms) / nd)


def test_quality_threshold_sweep_brute(spark):
    rows = fetch(f"SELECT text FROM '{SF}/documents.parquet'")
    docs = [t.split(" ") for (t,) in rows if t.split(" ") not in ([], [""])]
    qs = [(math.floor(1e6 * _quality(ws) + 0.5), len(ws)) for ws in docs]
    n = len(qs)
    tok_tot = sum(t for _, t in qs)
    got = {
        r["thr_micro"]: r
        for r in QUERIES["quality_threshold_sweep"](spark, SF).collect()
    }
    assert set(got) == {200000, 400000, 600000, 800000}
    for thr, r in got.items():
        kept = [(q, t) for q, t in qs if q >= thr]
        assert r["n_docs_kept"] == len(kept)
        assert r["tokens_kept"] == sum(t for _, t in kept)
        assert r["frac_docs_kept_micro"] == round(1e6 * len(kept) / n)
        assert r["frac_tokens_kept_micro"] == round(
            1e6 * sum(t for _, t in kept) / tok_tot
        )


def test_epochs_per_source_plan_brute(spark):
    rows = fetch(f"SELECT source, text FROM '{SF}/documents.parquet'")
    toks = defaultdict(int)
    for src, text in rows:
        toks[src] += len(text.split(" "))
    sq = {s: math.floor(1e6 * math.sqrt(t) + 0.5) for s, t in toks.items()}
    t_tot = sum(toks.values())
    s_tot = sum(sq.values())
    got = {
        r["source"]: r
        for r in QUERIES["epochs_per_source_plan"](spark, SF).collect()
    }
    assert set(got) == set(toks)
    for src, r in got.items():
        ep = 2.0 * t_tot * sq[src] / (s_tot * toks[src])
        assert r["n_tokens"] == toks[src]
        assert r["actual_share_micro"] == round(1e6 * toks[src] / t_tot)
        assert r["target_share_micro"] == round(1e6 * sq[src] / s_tot)
        assert abs(r["epochs"] - ep) < 1e-5
        assert r["over_epoch_cap"] == (ep > 4.0)


def test_cumulative_gains_deciles_brute(spark):
    rows = fetch(
        f"SELECT event_id, value, event_type FROM '{SF}/events.parquet'"
    )
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    n = len(ranked)
    g = defaultdict(lambda: [0, 0])
    for i, (_, _, t) in enumerate(ranked):
        d = _ntile(i, n, 10)
        g[d][0] += 1
        g[d][1] += 1 if t == "purchase" else 0
    p_tot = sum(v[1] for v in g.values())
    got = {
        r["decile"]: r
        for r in QUERIES["cumulative_gains_deciles"](spark, SF).collect()
    }
    assert set(got) == set(g)
    cum_n = cum_p = 0
    for d in sorted(g):
        cum_n += g[d][0]
        cum_p += g[d][1]
        r = got[d]
        assert r["n_events"] == g[d][0] and r["n_pos"] == g[d][1]
        assert r["cum_pos"] == cum_p
        assert r["gain_micro"] == round(1e6 * cum_p / p_tot)
        assert r["lift_micro"] == round(1e6 * (cum_p * n) / (p_tot * cum_n))


def test_kmeans_lloyd_micro_exact_replay(spark):
    """The micro-int Lloyd trainer is EXACT integer arithmetic, so a
    pure-Python replay from the same parquet must reproduce the final
    centroids and per-iteration history bit-for-bit — a far stronger
    claim than the tolerance compares above, and exactly what the
    quantization buys."""
    from veri_spark.operators.similarity import kmeans_lloyd_micro
    from veri_spark.sources.catalog import load_table

    rows = fetch(
        f"SELECT vec_id, embedding::DOUBLE[]"
        f" FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    )
    xm = {
        vid: [math.floor(1e6 * v + 0.5) for v in emb] for vid, emb in rows
    }
    cents = {vid: list(xm[vid]) for vid in sorted(xm)[:8]}
    dim = len(next(iter(xm.values())))
    history = []
    for it in range(1, 4):
        assign = {}
        inertia = 0
        for vid, x in xm.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(x, cm)), cid)
                for cid, cm in cents.items()
            )
            assign[vid] = best[1]
            inertia += best[0]
        sums = defaultdict(lambda: [[0, 0] for _ in range(dim)])
        for vid, cid in assign.items():
            for p, v in enumerate(xm[vid]):
                sums[cid][p][0] += v
                sums[cid][p][1] += 1
        n_moved = 0
        for cid in cents:
            if cid in sums:
                new = [
                    math.floor(s / c + 0.5) for s, c in sums[cid]
                ]
            else:
                new = cents[cid]
            if new != cents[cid]:
                n_moved += 1
            cents[cid] = new
        history.append((it, inertia, n_moved, len(xm)))

    emb = load_table(spark, SF, "embeddings")
    got_cents, got_hist = kmeans_lloyd_micro(emb, k=8, iters=3)
    assert [(h["iter"], h["inertia_micro2"], h["n_moved"], h["n_points"])
            for h in got_hist] == history
    assert {cid: cm for cid, cm in got_cents} == cents
