"""Round-14 optimization guard: the basket-explode co-purchase edge
build (`_copurchase_edges`) must produce EXACTLY the edge set of the
formulation it replaced — the distinct → self-join-on-orderkey →
distinct shape, mirrored here in DuckDB. collect_set's element order is
nondeterministic, so this pins that only set CONTENT survives the
pair explode + u<v filter + distinct.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_frames(spark):
    from veri_spark.plans.graph import _copurchase_edges

    got = sorted(
        (r["u"], r["v"]) for r in _copurchase_edges(spark, SF).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{SF}/lineitem.parquet')
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            """
        ).fetchall()
    )
    return got, want


def test_edge_set_matches_join_formulation(edge_frames):
    got, want = edge_frames
    assert got == want


def test_edges_are_ordered_and_distinct(edge_frames):
    got, _ = edge_frames
    assert all(u < v for u, v in got)
    assert len(got) == len(set(got))
