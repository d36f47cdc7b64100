"""Round-12: pure-Python brute-force model of ``ann_ivfpq_trained_audit``
(trained coarse + trained PQ codebooks, quantization error and 2-probe
ADC recall), written from the definitions so a formula error shared by
the Spark and DuckDB implementations cannot hide behind the gate.
"""

from __future__ import annotations

import math

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"
M, SUBW, K = 8, 8, 16  # _PQ_M, _PQ_SUB, _PQ_K


def _micro(vec):
    return [int(math.floor(1000000.0 * float(v) + 0.5)) for v in vec]


def _mdist(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _sub(x, j):
    return x[j * SUBW : (j + 1) * SUBW]


def _pq_seed_books(xm):
    ids = sorted(xm)[:K]
    return [[list(_sub(xm[i], j)) for i in ids] for j in range(M)]


def _pq_lloyd_round(xm, books):
    """One micro-int Lloyd round over every subspace: exact-integer
    argmin (ties to the lower code), floor(sum/n + 0.5) update, empty
    codes keep their codeword."""
    out = []
    for j in range(M):
        buckets = {c: [] for c in range(K)}
        for x in xm.values():
            sx = _sub(x, j)
            best = min((_mdist(sx, cw), c) for c, cw in enumerate(books[j]))
            buckets[best[1]].append(sx)
        new = []
        for c, old in enumerate(books[j]):
            pts = buckets[c]
            if pts:
                new.append(
                    [
                        int(math.floor(sum(p[t] for p in pts) / len(pts) + 0.5))
                        for t in range(SUBW)
                    ]
                )
            else:
                new.append(list(old))
        out.append(new)
    return out


def _coarse_lloyd(xm, k=8, iters=2):
    cents = [(i, list(xm[i])) for i in sorted(xm)[:k]]
    for _ in range(iters):
        buckets = {cid: [] for cid, _ in cents}
        for x in xm.values():
            best = min((_mdist(x, cm), cid) for cid, cm in cents)
            buckets[best[1]].append(x)
        cents = [
            (
                cid,
                [
                    int(math.floor(sum(p[t] for p in pts) / len(pts) + 0.5))
                    for t in range(len(old))
                ]
                if (pts := buckets[cid])
                else old,
            )
            for cid, old in cents
        ]
    return cents


def test_ann_ivfpq_trained_audit_brute(spark):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding::DOUBLE[]"
        f" FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    xm = {int(r[0]): _micro(r[1]) for r in rows}

    seed_coarse = [(i, list(xm[i])) for i in sorted(xm)[:8]]
    trained_coarse = _coarse_lloyd(xm, k=8, iters=2)
    seed_books = _pq_seed_books(xm)
    trained_books = _pq_lloyd_round(xm, seed_books)

    expected = {}
    for tag, coarse, books in (
        ("seed", seed_coarse, seed_books),
        ("trained", trained_coarse, trained_books),
    ):
        codes, err_total = {}, 0
        for vid, x in xm.items():
            cs = []
            for j in range(M):
                sx = _sub(x, j)
                d, c = min(
                    (_mdist(sx, cw), c) for c, cw in enumerate(books[j])
                )
                cs.append(c)
                err_total += d
            codes[vid] = cs
        assign = {
            vid: min((_mdist(x, cm), cid) for cid, cm in coarse)[1]
            for vid, x in xm.items()
        }
        n_hit = 0
        for q in (0, 1, 2):
            qm = xm[q]
            exact = {
                v
                for _, v in sorted((_mdist(x, qm), v) for v, x in xm.items())[
                    :10
                ]
            }
            probes = {
                cid
                for _, cid in sorted((_mdist(qm, cm), cid) for cid, cm in coarse)[
                    :2
                ]
            }
            lut = [
                [_mdist(_sub(qm, j), cw) for cw in books[j]] for j in range(M)
            ]
            adc = {
                v: sum(lut[j][codes[v][j]] for j in range(M))
                for v in xm
                if assign[v] in probes
            }
            approx = {v for _, v in sorted((d, v) for v, d in adc.items())[:10]}
            n_hit += len(exact & approx)
        expected[tag] = (err_total, n_hit)

    got = {
        r["codebook"]: r
        for r in QUERIES["ann_ivfpq_trained_audit"](spark, SF).collect()
    }
    assert set(got) == {"seed", "trained"}
    for tag, (err_total, n_hit) in expected.items():
        assert got[tag]["pq_err_micro2"] == err_total, tag
        assert got[tag]["n_hit_total"] == n_hit, tag
        assert got[tag]["recall_at_10"] == round(n_hit / 30.0, 6), tag
    # training must never worsen the quantization error it optimizes
    assert expected["trained"][0] <= expected["seed"][0]
