"""Round-6 additions: invariants and plan shapes for the physical-planning
audits, the Bloom join-prune sketch, and the wedge-join mitigation proofs.

These assert PROPERTIES the queries' oracles cannot express (a Bloom filter
never false-negatives; zone-map pruning never scans more chunks than exist;
the DOULION sample is a subset), plus the no-cartesian plan guarantee the
suite enforces everywhere else.
"""

import pytest

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def rows(spark):
    """Collect each round-6 audit once at the unit SF."""

    def run(name):
        return QUERIES[name](spark, SF).collect()

    return run


def test_bloom_never_false_negative(rows):
    [r] = rows("bloom_join_prune_audit")
    # every true member must pass the filter — the Bloom guarantee
    assert r.n_bloom_pass >= r.n_members
    assert 0.0 <= r.fpr_realized <= 1.0
    assert r.n_false_pos == r.n_bloom_pass - r.n_members
    assert r.m_bits % 32 == 0 and r.m_bits >= 256


def test_data_skipping_sorted_layout_prunes(rows):
    [r] = rows("data_skipping_audit")
    assert r.n_chunks > 0
    assert 0 <= r.scan_sorted <= r.n_chunks
    assert 0 <= r.scan_natural <= r.n_chunks
    # a shipdate-sorted layout can never need MORE chunks for a shipdate
    # range than the number whose row span overlaps it in any layout
    assert r.scan_sorted <= r.scan_natural


def test_zorder_bounded_within_chunks(rows):
    [r] = rows("zorder_multicol_audit")
    assert 0 <= r.scan_zorder <= r.n_chunks
    assert 0 <= r.scan_single_sort <= r.n_chunks


def test_doulion_sample_is_subset_and_scaled(rows):
    [r] = rows("graph_triangle_doulion")
    assert 0 < r.n_edges_sampled < r.n_edges
    assert r.n_triangles_est % 8 == 0  # 1/p^3 scaling of an integer count
    assert r.n_triangles_exact > 0


def test_orientation_fanout_reduction_measured(rows):
    [r] = rows("graph_orientation_fanout")
    assert r.wedge_fanout_id > 0 and r.wedge_fanout_degree > 0
    # measured on this (deterministic) graph: degree orientation shrinks
    # the wedge intermediate
    assert r.wedge_fanout_degree <= r.wedge_fanout_id
    assert abs(
        r.reduction_ratio - round(r.wedge_fanout_degree / r.wedge_fanout_id, 6)
    ) < 1e-9


def test_burstiness_fano_nonnegative(rows):
    out = rows("events_burstiness")
    assert out
    for r in out:
        assert r.n_events >= r.active_hours >= 1
        assert r.fano_factor >= 0.0


def test_sorted_neighborhood_pairs_verified(rows):
    out = rows("sorted_neighborhood_pairs")
    for r in out:
        assert r.jaccard >= 0.4 - 1e-9
        assert r.inter <= r.uni
        assert r.doc_a != r.doc_b


def test_compaction_planner_files_cover_bytes(rows):
    out = rows("file_compaction_planner")
    assert out
    for r in out:
        assert r.n_files >= 1 and r.n_docs >= r.n_files
        assert r.avg_fill > 0.0


def test_shuffle_planner_sane(rows):
    [r] = rows("shuffle_partition_planner")
    assert r.recommended_shuffle_partitions >= 1
    assert r.max_key_rows * r.n_keys >= r.total_rows  # max >= mean


def test_join_cardinality_exact_vs_estimate(rows):
    [r] = rows("join_cardinality_estimate_audit")
    assert r.exact_rows > 0
    assert r.est_rows >= 0
    # uniform-frequency estimate UNDERshoots on skewed keys only through
    # the containment assumption; just pin the recorded relationship
    assert r.rel_err == round((r.est_rows - r.exact_rows) / r.exact_rows, 6)


def test_completeness_profile_full_columns(rows):
    out = rows("data_completeness_profile")
    assert [r.col for r in out] == sorted(r.col for r in out)
    assert len(out) == 5
    for r in out:
        assert 0.0 <= r.completeness <= 1.0
        assert 0.0 <= r.distinctness <= 1.0


def test_no_cartesian_products_in_round6_plans(spark):
    for name in (
        "bloom_join_prune_audit",
        "data_skipping_audit",
        "zorder_multicol_audit",
        "graph_triangle_doulion",
        "graph_orientation_fanout",
        "sorted_neighborhood_pairs",
        "events_burstiness",
        "file_compaction_planner",
        "shuffle_partition_planner",
        "join_cardinality_estimate_audit",
        "data_completeness_profile",
    ):
        plan = _plan(QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name


def test_ab_srm_chi2_nonnegative(rows):
    [r] = rows("ab_test_srm_check")
    assert r.n0 > 0 and r.n1 > 0
    assert r.chi2 >= 0.0
    assert r.srm_flag == (r.chi2 > 3.841459)


def test_ab_ztest_rates_interior(rows):
    [r] = rows("ab_test_conversion_ztest")
    # first-event share must stay interior or the pooled variance
    # degenerates — the exact failure mode the target choice avoids
    assert 0 < r.c0 + r.c1 < r.n0 + r.n1
    assert r.z_score == r.z_score  # not NaN
    assert r.significant == (abs(r.z_score) > 1.959964 or
                             abs(abs(r.z_score) - 1.959964) < 1e-6)


def test_lsh_planner_permissiveness_monotone(rows):
    out = sorted(rows("lsh_param_planner"), key=lambda r: -r.bands)
    assert [(r.bands, r.rows_per_band) for r in out] == [
        (16, 1), (8, 2), (4, 4), (2, 8)
    ]
    # for a fixed 16-hash budget, more bands of fewer rows is pointwise
    # more permissive: expected candidate mass must decrease with r
    cands = [r.expected_candidates for r in out]
    assert cands == sorted(cands, reverse=True)
    for r in out:
        assert 0.0 <= r.expected_good <= r.expected_candidates <= r.n_pairs
        assert r.expected_good <= r.n_good + 1e-9 or r.n_good == 0


def test_kcore_peel_monotone_shrink(rows):
    out = sorted(rows("graph_kcore_peel"), key=lambda r: r.iter)
    assert [r.iter for r in out] == [0, 1, 2, 3]
    assert out[0].k >= 1
    for prev, cur in zip(out, out[1:]):
        # peeling can only remove nodes and edges
        assert cur.n_nodes <= prev.n_nodes
        assert cur.n_edges <= prev.n_edges
        assert cur.k == prev.k


def test_bfs_hops_start_at_seed(rows):
    out = sorted(rows("graph_bfs_hops"), key=lambda r: r.hop)
    assert [r.hop for r in out] == [0, 1, 2, 3]
    assert out[0].n_nodes == 1  # the seed
    for r in out:
        assert r.n_nodes >= 0
