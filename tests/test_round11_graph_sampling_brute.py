"""Round-11 (part 4): brute-force checks for the rich-club /
power-law-alpha graph readouts, the priority-sampling estimator, and
content-defined chunking.

Pure-Python recomputation from the raw sf0.001 parquet: the co-purchase
graph is rebuilt with dict/set loops, the priority sample re-drawn with
hashlib.md5, the CDC cuts re-derived with a literal per-position
substring scan.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _graph():
    rows = fetch(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    )
    orders = {}
    for ok, pk in rows:
        orders.setdefault(ok, []).append(pk)
    edges = set()
    for parts in orders.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    return edges, deg


def test_rich_club_brute(spark):
    edges, deg = _graph()
    got = {
        r["k_degree"]: r
        for r in QUERIES["graph_rich_club_coefficient"](spark, SF).collect()
    }
    assert set(got) == {2, 4, 8}
    for k in (2, 4, 8):
        club = {u for u, d in deg.items() if d > k}
        ek = sum(1 for u, v in edges if u in club and v in club)
        nk = len(club)
        r = got[k]
        assert r["n_rich_nodes"] == nk
        assert r["n_rich_edges"] == ek
        if nk >= 2:
            assert abs(r["rich_club_phi"] - 2 * ek / (nk * (nk - 1))) < 1e-6
        else:
            assert r["rich_club_phi"] is None


def test_powerlaw_alpha_brute(spark):
    edges, deg = _graph()
    tail = [d for d in deg.values() if d >= 2]
    s = sum(math.log(d / 1.5) for d in tail)
    alpha = 1 + len(tail) / s
    got = QUERIES["graph_degree_powerlaw_alpha"](spark, SF).collect()[0]
    assert got["n_nodes"] == len(deg)
    assert got["n_tail"] == len(tail)
    assert got["d_min"] == 2
    assert abs(got["alpha_mle"] - alpha) < 1e-5
    assert abs(got["alpha_se"] - (len(tail) / s) / math.sqrt(len(tail))) < 1e-5


def test_priority_sample_brute(spark):
    rows = fetch(f"SELECT event_id, value FROM '{SF}/events.parquet'")

    def h(eid):
        return int(
            hashlib.md5(f"psamp|{eid}".encode()).hexdigest()[:15], 16
        )

    pri = sorted(
        (
            (v / ((h(eid) + 1) / 2**60), eid, v)
            for eid, v in rows
        ),
        key=lambda z: (-z[0], z[1]),
    )
    tau = pri[64][0]
    est = sum(max(v, tau) for _, _, v in pri[:64])
    true = sum(round(v * 100) for _, v in rows) / 100.0
    got = QUERIES["priority_sample_estimator"](spark, SF).collect()[0]
    assert got["k"] == 64
    assert abs(got["tau"] - tau) < 1e-5
    assert abs(got["est_total"] - est) < 1e-3
    assert abs(got["true_total"] - true) < 1e-5
    assert abs(got["rel_error"] - (est - true) / true) < 1e-6


def test_cdc_chunks_brute(spark):
    rows = fetch(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    n_docs = 0
    chunks = []
    for doc_id, text in rows:
        if not text:
            continue
        n_docs += 1
        L = len(text)
        starts = [0]
        for p0 in range(1, L - 15):  # 0-based candidate starts (SQL p-1)
            gram = text[p0 : p0 + 16]
            hv = int(
                hashlib.md5(f"cdc|{gram}".encode()).hexdigest()[:15], 16
            )
            if hv % 64 == 0:
                starts.append(p0)
        starts.append(L)
        for a, b in zip(starts, starts[1:]):
            chunks.append(text[a:b])
    got = QUERIES["cdc_chunk_dedup"](spark, SF).collect()[0]
    assert got["n_docs"] == n_docs
    assert got["n_chunks"] == len(chunks)
    distinct = len(set(chunks))
    assert got["n_distinct_chunks"] == distinct
    assert abs(got["chunk_dup_ratio"] - (1 - distinct / len(chunks))) < 1e-6
    mean_len = sum(len(c) for c in chunks) / len(chunks)
    assert abs(got["mean_chunk_len"] - mean_len) < 1e-5
