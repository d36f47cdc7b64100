"""Property-based tests for the distributed global-ranking operator
(operators/ranking.py, round 7) — the replacement for unpartitioned
``Window.orderBy``. Hypothesis drives random key distributions (including
heavy duplication and skew) through small partition counts so range
boundaries land in adversarial places; each property is checked against a
driver-side Python oracle on the same rows.

Pinned properties:

- ``global_row_number`` is a gap-free permutation of 1..N whose order
  agrees with the Python sort of the key tuples (unique keys).
- ``ntile_from_rank`` reproduces SQL ntile exactly for every (N, buckets)
  including the leftover-bucket and N < buckets regimes.
- ``sorted_neighborhood_candidates`` yields EXACTLY the w-window pairs of
  the globally sorted order — no pair lost at range-bucket boundaries, no
  extra pair, for any partition count (the failure mode a per-partition
  lead() implementation would have).
"""

import pytest
from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from veri_spark.operators.ranking import (
    global_prefix_agg,
    global_row_number,
    ntile_from_rank,
    sorted_neighborhood_candidates,
)

# small value domain → heavy duplication; ids make tuples unique
keys = st.lists(
    st.integers(min_value=0, max_value=9), min_size=1, max_size=60
)
parts = st.integers(min_value=1, max_value=7)


@settings(max_examples=10, deadline=None)
@given(ks=keys, p=parts)
def test_global_row_number_matches_python_sort(spark, ks, p):
    rows = [(k, i) for i, k in enumerate(ks)]
    df = spark.createDataFrame(rows, "k int, id int")
    g = global_row_number(df, [F.col("k"), F.col("id")], num_partitions=p)
    got = {(r["k"], r["id"]): r["grn"] for r in g.collect()}
    expect = {
        kv: rank + 1 for rank, kv in enumerate(sorted(rows))
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    buckets=st.integers(min_value=1, max_value=16),
)
def test_ntile_from_rank_matches_sql_ntile(spark, n, buckets):
    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = [
        r["b"]
        for r in df.select(
            "rn",
            ntile_from_rank(F.col("rn"), F.lit(n).cast("bigint"), buckets)
            .alias("b"),
        )
        .orderBy("rn")
        .collect()
    ]
    # SQL-standard ntile oracle in Python
    q, r = divmod(n, buckets)
    expect = []
    for rank in range(1, n + 1):
        if rank <= r * (q + 1):
            expect.append((rank - 1) // (q + 1) + 1)
        else:
            expect.append(r + (rank - r * (q + 1) - 1) // max(q, 1) + 1)
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(ks=keys, p=parts, agg=st.sampled_from(["sum", "min", "max"]))
def test_global_prefix_agg_matches_python_scan(spark, ks, p, agg):
    # unique order keys (k, id) per the operator's tie contract; values are
    # signed so min/max prefixes actually move around
    rows = [(k, i, (k * 7 - 3 * i) % 11 - 5) for i, k in enumerate(ks)]
    df = spark.createDataFrame(rows, "k int, id int, v int")
    g = global_prefix_agg(
        df, [F.col("k"), F.col("id")], "v", agg=agg, num_partitions=p
    )
    got = {(r["k"], r["id"]): r["cum"] for r in g.collect()}
    fold = {"sum": lambda a, b: a + b, "min": min, "max": max}[agg]
    expect, acc = {}, None
    for k, i, v in sorted(rows):
        acc = v if acc is None else fold(acc, v)
        expect[(k, i)] = acc
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(ks=keys, p=parts)
def test_global_prefix_agg_sum_matches_window_on_nullable_values(spark, ks, p):
    # every 3rd value NULL (and the whole leading run NULL when the list
    # starts that way) — the running sum must be NULL only before the first
    # non-null value, exactly like sum().over(Window.orderBy(...))
    rows = [
        (k, i, None if (i % 3 == 0) else (i % 7) - 3)
        for i, k in enumerate(ks)
    ]
    df = spark.createDataFrame(rows, "k int, id int, v int")
    g = global_prefix_agg(
        df, [F.col("k"), F.col("id")], "v", agg="sum", num_partitions=p
    )
    got = {(r["k"], r["id"]): r["cum"] for r in g.collect()}
    expect, acc = {}, None
    for k, i, v in sorted(rows, key=lambda r: (r[0], r[1])):
        if v is not None:
            acc = v if acc is None else acc + v
        expect[(k, i)] = acc
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(ks=keys, p=parts)
def test_global_prefix_agg_multi_column_single_pass(spark, ks, p):
    rows = [(k, i, i % 3, (i * 5) % 7) for i, k in enumerate(ks)]
    df = spark.createDataFrame(rows, "k int, id int, a int, b int")
    g = global_prefix_agg(
        df,
        [F.col("k"), F.col("id")],
        ["a", "b"],
        agg="sum",
        out_col=["ca", "cb"],
        num_partitions=p,
    )
    got = {(r["k"], r["id"]): (r["ca"], r["cb"]) for r in g.collect()}
    sa = sb = 0
    expect = {}
    for k, i, a, b in sorted(rows):
        sa, sb = sa + a, sb + b
        expect[(k, i)] = (sa, sb)
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(ks=keys, p=parts, w=st.integers(min_value=2, max_value=4))
def test_snm_candidates_complete_across_boundaries(spark, ks, p, w):
    rows = [(k, i) for i, k in enumerate(ks)]
    df = spark.createDataFrame(rows, "k int, id int")
    cand = sorted_neighborhood_candidates(
        df, [F.col("k"), F.col("id")], window=w, num_partitions=p
    )
    got = {
        ((r["k_a"], r["id_a"]), (r["k_b"], r["id_b"])) for r in cand.collect()
    }
    srt = sorted(rows)
    expect = {
        (srt[i], srt[j])
        for i in range(len(srt))
        for j in range(i + 1, min(i + w, len(srt)))
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Connected components vs a Python union-find oracle (the operator behind
# dedup_minhash_clusters AND graph_connected_components — round-7 batch 3).
# Random sparse edge lists hit singleton-free invariants, multi-component
# splits, chains (diameter stress inside the iteration cap), and cliques.
# ---------------------------------------------------------------------------

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(edges=edge_lists)
def test_connected_components_match_union_find(spark, edges):
    from veri_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "doc_a int, doc_b int")
    got = {
        r["id"]: r["cluster"]
        for r in connected_components(df, max_iterations=30).collect()
    }
    # Python union-find oracle with min-id representative
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {x: find(x) for x in parent}
    assert got == expect
