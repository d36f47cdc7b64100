"""Round-12 batch D: pure-Python brute-force models of the new graph
metrics (partition modularity, hub local clustering, deterministic
2-round label propagation) built from an adjacency dict.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _graph():
    rows = duckdb.sql(
        f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{SF}/lineitem.parquet')
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchall()
    edges = {(u, v) for u, v in rows}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return edges, adj


def test_modularity_brute(spark):
    edges, adj = _graph()
    brands = dict(
        duckdb.sql(
            f"SELECT p_partkey, p_brand FROM '{SF}/part.parquet'"
        ).fetchall()
    )
    m = len(edges)
    e_c = Counter()
    for u, v in edges:
        if brands[u] == brands[v]:
            e_c[brands[u]] += 1
    d_c = Counter()
    for u in adj:
        d_c[brands[u]] += len(adj[u])
    q = sum(
        e_c.get(c, 0) / m - (d_c[c] / (2.0 * m)) ** 2 for c in d_c
    )
    got = QUERIES["graph_modularity_partition"](spark, SF).collect()[0]
    assert got["n_communities"] == len(d_c)
    assert got["n_edges"] == m
    assert abs(got["modularity"] - q) < 1e-6


def test_local_clustering_brute(spark):
    _, adj = _graph()
    top = sorted(adj, key=lambda u: (-len(adj[u]), u))[:10]
    expected = []
    for u in top:
        nbrs = sorted(adj[u])
        t = sum(
            1
            for i, a in enumerate(nbrs)
            for b in nbrs[i + 1 :]
            if b in adj[a]
        )
        d = len(nbrs)
        expected.append((u, d, t, 2.0 * t / (d * (d - 1))))
    got = QUERIES["graph_local_clustering_top"](spark, SF).collect()
    assert len(got) == 10
    for row, (u, d, t, c) in zip(got, expected):
        assert row["node"] == u and row["degree"] == d
        assert row["triangles"] == t
        assert abs(row["local_clustering"] - c) < 1e-6


def test_label_propagation_brute(spark):
    _, adj = _graph()
    lab = {u: u for u in adj}
    for _ in range(2):
        new = {}
        for u in adj:
            votes = Counter(lab[v] for v in adj[u])
            best = min(
                votes.items(), key=lambda kv: (-kv[1], kv[0])
            )
            new[u] = best[0]
        lab = new
    sizes = Counter(lab.values())
    expected = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = QUERIES["graph_label_propagation"](spark, SF).collect()
    assert [(r["community_label"], r["n_members"]) for r in got] == expected
