"""Round-9 verdict task 3: demonstrate the d-cap on a graph where it BINDS.

The sf0.1 co-purchase graph is near-regular (degree median 119 vs cap 128),
so the committed cap_audit can only show agreement, not cost reduction —
the 100 TB claim ("hubs fall out of capped lists on SKEWED graphs, so the
wedge join stops exploding") was argued but never measured. This test
builds a deterministic Chung-Lu-style power-law graph (degree range ~3 to
~330, median ~10 — the skew shape of a real co-occurrence graph at scale),
runs the REAL operators (`_capped_adjacency`, `_common_counts_packed`,
`_common_top20`), and asserts the two halves of the claim together:

  * capped wedge rows <= 15% of exact wedge rows (measured: ~12.6%), and
  * capped-Jaccard top-20 agrees with the exact top-20 on >= 80% of pairs
    (measured: 85%).

Everything is deterministic (splitmix-style integer hash for the edge
coin flips), so the asserted thresholds sit just above/below the exact
measured values — any drift in the truncation or wedge pipeline moves
them and fails loudly. A pure-Python brute-force model cross-checks the
Spark wedge-row counts and top-20 exactly, so the invariant is proven
against an independent implementation, not against Spark itself.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import pytest
from pyspark.sql import functions as F

N_NODES = 1000
D0 = 300.0
BETA = 0.55
CAP = 8
TOPK = 20


def _h01(a: int, b: int) -> float:
    """Deterministic hash of an (a, b) pair to [0, 1) — splitmix64-style
    finalizer, so the synthetic graph is identical on every run/host."""
    x = (a * 2654435761 + b * 40503 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 33
    return (x & 0xFFFFFFFF) / 2**32


def _powerlaw_edges() -> list[tuple[int, int]]:
    """Chung-Lu-ish: P(i~j) ~ w_i*w_j/S with w_i = D0*(i+1)^-BETA, so low
    ids are hubs and expected degrees follow a power law."""
    s = D0 * N_NODES ** (1 - BETA) / (1 - BETA)
    edges = []
    for i in range(N_NODES):
        wi = D0 * (i + 1) ** (-BETA)
        for j in range(i + 1, N_NODES):
            p = wi * D0 * (j + 1) ** (-BETA) / s
            if _h01(i, j) < p:
                edges.append((i, j))
    return edges


def _brute(edges):
    """Independent pure-Python model: capped adjacency (cap lowest-(deg,
    id) neighbors), wedge-row counts (sum over w of C(r_w, 2)), and the
    exact/capped Jaccard top-20 with the registered tie-break."""
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    deg = {u: len(s) for u, s in adj.items()}
    capped = {
        u: set(sorted(s, key=lambda v: (deg[v], v))[:CAP])
        for u, s in adj.items()
    }

    def wedge_rows(lists):
        r: dict[int, int] = defaultdict(int)
        for _, s in lists.items():
            for v in s:
                r[v] += 1
        return sum(c * (c - 1) // 2 for c in r.values())

    def top_jac(lists, dget):
        inter: dict[tuple[int, int], int] = defaultdict(int)
        inv: dict[int, list[int]] = defaultdict(list)
        for u, s in lists.items():
            for v in s:
                inv[v].append(u)
        for _, us in inv.items():
            us.sort()
            for a, b in combinations(us, 2):
                inter[(a, b)] += 1
        scored = sorted(
            (-c / (dget(a) + dget(b) - c), -c, a, b)
            for (a, b), c in inter.items()
        )
        return [(a, b) for _, _, a, b in scored[:TOPK]]

    return {
        "exact_wedges": wedge_rows(adj),
        "capped_wedges": wedge_rows(capped),
        "exact_top": top_jac(adj, lambda x: deg[x]),
        "capped_top": top_jac(capped, lambda x: min(deg[x], CAP)),
    }


def _spark_wedge_rows(adj_df):
    x = adj_df.select(F.col("u").alias("cu"), F.col("v").alias("w"))
    y = adj_df.select(F.col("u").alias("cv"), F.col("v").alias("w"))
    return x.join(y, "w").filter(F.col("cu") < F.col("cv")).count()


@pytest.fixture(scope="module")
def graph(spark):
    edges = _powerlaw_edges()
    # BIGINT ids, matching the parquet partkeys the operators run on —
    # the packed pair key shiftleft(cu, 32) needs a 64-bit column (Spark
    # shift amounts wrap mod 32 on INT inputs)
    e = spark.createDataFrame(edges, "u long, v long")
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    return edges, und.persist(), deg.persist()


def test_cap_binds_on_powerlaw_graph(spark, graph):
    from veri_spark.plans.graph import (
        _capped_adjacency,
        _common_counts_packed,
        _common_top20,
    )

    edges, und, deg = graph
    model = _brute(edges)

    # sanity: the graph is genuinely skewed (hubby head, long tail)
    degs = sorted(r["d"] for r in deg.collect())
    assert degs[-1] > 20 * degs[len(degs) // 2], "graph must be skewed"

    cund = _capped_adjacency(und, deg, CAP).persist()

    # 1) the cap SHRINKS the wedge join where it matters: on a skewed
    #    graph the capped wedge stream is a small fraction of the exact
    #    one (the sf0.1 co-purchase graph cannot show this — its degree
    #    median sits at the cap).
    exact_w = _spark_wedge_rows(und)
    capped_w = _spark_wedge_rows(cund)
    assert exact_w == model["exact_wedges"]
    assert capped_w == model["capped_wedges"]
    assert capped_w <= 0.15 * exact_w, (
        f"cap does not bind: {capped_w}/{exact_w}"
    )

    # 2) ...while the capped-Jaccard top-20 still agrees with the exact
    #    top-20 on >= 80% of pairs (hubs carry no similarity signal).
    ex_top = [
        (r["part_a"], r["part_b"])
        for r in _common_top20(_common_counts_packed(und), deg).collect()
    ]
    cdeg = deg.select("u", F.least(F.col("d"), F.lit(CAP)).alias("d"))
    cap_top = [
        (r["part_a"], r["part_b"])
        for r in _common_top20(_common_counts_packed(cund), cdeg).collect()
    ]
    assert ex_top == model["exact_top"]
    assert cap_top == model["capped_top"]
    agreement = len(set(ex_top) & set(cap_top)) / TOPK
    assert agreement >= 0.8, f"top-{TOPK} agreement {agreement}"
