"""Round-11: brute-force checks for the new queries, written as plain
Python re-implementations from the definitions (not through any Spark or
DuckDB helper), so a formula error shared by both SQL dialects cannot
hide behind the cross-engine gate.
"""

from __future__ import annotations

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _micro(vec):
    import math

    return [int(math.floor(1000000.0 * float(v) + 0.5)) for v in vec]


def _mdist(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _lloyd(xm, k=8, iters=2):
    """Exact-integer Lloyd from the definition: seeds are the k lowest-id
    vectors, assignment is argmin of exact squared micro distance (ties by
    centroid id), update is floor(sum/n + 0.5) per coordinate, empty
    clusters keep their previous centroid."""
    import math

    ids = sorted(xm)
    cents = [(i, list(xm[i])) for i in ids[:k]]
    for _ in range(iters):
        buckets = {cid: [] for cid, _ in cents}
        for vid, x in xm.items():
            best = min((_mdist(x, cm), cid) for cid, cm in cents)
            buckets[best[1]].append(x)
        new = []
        for cid, old in cents:
            pts = buckets[cid]
            if pts:
                dim = len(old)
                cm = [
                    int(
                        math.floor(
                            sum(p[j] for p in pts) / len(pts) + 0.5
                        )
                    )
                    for j in range(dim)
                ]
            else:
                cm = old
            new.append((cid, cm))
        cents = new
    return cents


def test_ann_ivf_recall_trained_brute(spark):
    rows = fetch(
        f"SELECT vec_id, embedding::DOUBLE[]"
        f" FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    )
    xm = {int(r[0]): _micro(r[1]) for r in rows}
    seeds = [(i, list(xm[i])) for i in sorted(xm)[:8]]
    trained = _lloyd(xm, k=8, iters=2)

    def top10(cands, qm):
        return set(
            vid
            for _, vid in sorted(
                (_mdist(xm[v], qm), v) for v in cands
            )[:10]
        )

    expected = {}
    for tag, cb in (("seed", seeds), ("trained", trained)):
        assign = {}
        for vid, x in xm.items():
            best = min((_mdist(x, cm), cid) for cid, cm in cb)
            assign[vid] = best[1]
        for q in (0, 1, 2):
            qm = xm[q]
            exact = top10(xm.keys(), qm)
            probes = set(
                cid
                for _, cid in sorted(
                    (_mdist(qm, cm), cid) for cid, cm in cb
                )[:2]
            )
            cands = [v for v in xm if assign[v] in probes]
            approx = top10(cands, qm)
            expected[(q, tag)] = len(exact & approx)

    got = {
        (r["query_id"], r["codebook"]): r
        for r in QUERIES["ann_ivf_recall_trained"](spark, SF).collect()
    }
    assert set(got) == set(expected)
    for key, n_hit in expected.items():
        assert got[key]["n_hit"] == n_hit, key
        assert got[key]["recall_at_10"] == round(n_hit / 10.0, 6), key
