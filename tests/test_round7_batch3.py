"""Invariant tests for the round-7 batch-3 queries — semantic properties
the DuckDB oracle parity cannot express (an oracle sharing a logic bug
would still hash-match; these pin the MATH):

- KS statistic is a valid sup-norm of two CDFs (bounds + exact totals).
- The connected-component census conserves nodes and is consistent with
  the edge set (no component can exceed the node count; sizes >= 2 only,
  since isolated vertices never enter the edge list).
- The Pareto front is PAIRWISE non-dominated (checked exhaustively on the
  collected front) and every non-front doc is dominated by some front doc
  at its token level.
- Duplicate-ngram coverage conserves the eligible-doc count.
- Reciprocal pairs are a symmetric subset of the kNN-join edge list.
- Farthest-first selection distances are non-increasing (adding seeds can
  only shrink any point's min-distance, so the running max-min shrinks).
- FS linkage scores lie inside the [all-disagree, all-agree] weight sum.
"""

import pytest

import pyspark.sql.functions as F

from veri_spark.plans.registry import QUERIES
from veri_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_ks_bounds_and_totals(spark):
    row = QUERIES["ks_value_drift"](spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    n1 = ev.filter(F.col("event_type") == "click").count()
    n2 = ev.filter(F.col("event_type") == "view").count()
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["d_num"] <= n1 * n2
    assert row["ks_lambda"] >= row["ks_stat"]  # sqrt(n1n2/(n1+n2)) >= 1 here


def test_connected_components_conserve_nodes(spark):
    hist = QUERIES["graph_connected_components"](spark, SF_DIR).collect()
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    n_nodes = (
        edges.select(F.col("u").alias("n"))
        .union(edges.select("v"))
        .distinct()
        .count()
    )
    assert sum(r["component_size"] * r["n_components"] for r in hist) == n_nodes
    assert all(r["component_size"] >= 2 for r in hist)


def test_pareto_front_is_mutually_non_dominated(spark):
    front = QUERIES["docs_pareto_front"](spark, SF_DIR).collect()
    pts = [(r["n_distinct_tokens"], r["n_chars"]) for r in front]
    for i, (u1, c1) in enumerate(pts):
        for j, (u2, c2) in enumerate(pts):
            if i == j:
                continue
            dominated = u2 >= u1 and c2 <= c1 and (u2 > u1 or c2 < c1)
            assert not dominated, (pts[i], pts[j])
    # completeness: the best (max-u) document is always on the front
    docs = load_table(spark, SF_DIR, "documents")
    u_max = docs.select(
        F.size(F.array_distinct(F.split("text", " "))).alias("u")
    ).agg(F.max("u")).collect()[0][0]
    assert max(p[0] for p in pts) == u_max


def test_dup_ngram_coverage_conserves_docs(spark):
    hist = QUERIES["dup_ngram_coverage"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    eligible = docs.filter(
        F.size(F.split("text", " ")) >= 3
    ).count()
    assert sum(r["n_docs"] for r in hist) == eligible
    assert all(0 <= r["coverage_decile"] <= 9 for r in hist)


def test_reciprocal_pairs_subset_and_symmetric(spark):
    from veri_spark.operators.similarity import knn_join, take_centroids

    pairs = QUERIES["knn_reciprocal_pairs"](spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings")
    edges = {
        (r["src"], r["dst"]): r["rank"]
        for r in knn_join(emb, take_centroids(emb, 8), k=3).collect()
    }
    for r in pairs:
        assert r["src"] < r["dst"]
        assert edges[(r["src"], r["dst"])] == r["rank_ab"]
        assert edges[(r["dst"], r["src"])] == r["rank_ba"]


def test_farthest_first_distances_non_increasing(spark):
    rows = QUERIES["kmeans_pp_farthest_seeds"](spark, SF_DIR).collect()
    assert [r["seed_rank"] for r in rows] == [0, 1, 2, 3]
    assert len({r["vec_id"] for r in rows}) == 4
    d = [r["sel_dist"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(d, d[1:]))


def test_fs_scores_within_weight_envelope(spark):
    from veri_spark.plans.integrity import _FS_W

    rows = QUERIES["record_linkage_fs_top_pairs"](spark, SF_DIR).collect()
    lo = sum(w[1] for w in _FS_W.values())
    hi = sum(w[0] for w in _FS_W.values())
    assert all(lo <= r["score_micro"] <= hi for r in rows)
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_neyman_allocation_sums_to_budget(spark):
    rows = QUERIES["neyman_allocation_plan"](spark, SF_DIR).collect()
    assert sum(r["alloc_n"] for r in rows) == 1000
    assert all(r["alloc_n"] >= 0 for r in rows)
    # Neyman monotonicity: a stratum with strictly larger N_h * S_h weight
    # never receives a smaller allocation than one with a smaller weight
    # (Hamilton preserves quota order up to the +/-1 remainder seat)
    by_w = sorted(rows, key=lambda r: r["weight_micro"])
    for a, b in zip(by_w, by_w[1:]):
        assert b["alloc_n"] >= a["alloc_n"] - 1


def test_roaring_audit_dominates_and_conserves(spark):
    rows = QUERIES["roaring_bitmap_sizing_audit"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    n_ids = docs.select("lang", "doc_id").distinct().count()
    assert sum(r["n_ids"] for r in rows) == n_ids
    for r in rows:
        assert r["n_array"] + r["n_run"] + r["n_bitmap"] == r["n_containers"]
        # the chosen container is the per-container minimum, so the total
        # can never exceed the all-bitmap or the plain-list encodings
        assert r["roaring_bytes"] <= 128 * r["n_containers"]
        assert r["roaring_bytes"] <= r["plain_bytes"]


def test_placement_audits_conserve_keys(spark):
    n_docs = load_table(spark, SF_DIR, "documents").count()
    for q in ("consistent_hash_ring_balance", "rendezvous_hash_balance"):
        rows = QUERIES[q](spark, SF_DIR).collect()
        assert sum(r["n_keys"] for r in rows) == n_docs, q
        assert all(r["n_keys"] > 0 for r in rows), q


def test_simpson_diversity_bounds(spark):
    rows = QUERIES["lang_simpson_diversity_by_source"](spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r["gini_simpson_micro"] <= 1_000_000
        assert r["n_langs"] >= 1
        # one language only => zero diversity
        if r["n_langs"] == 1:
            assert r["gini_simpson_micro"] == 0


def test_poisson_bootstrap_ci_brackets_the_mean(spark):
    row = QUERIES["poisson_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert row["n_replicates"] == 32
    # a 90%-ish order-statistic band from Poisson(1) replicates must
    # bracket the full-sample mean on any non-degenerate sample
    assert row["ci_lo"] <= row["mean_full"] <= row["ci_hi"]
    assert row["ci_lo"] < row["ci_hi"]


def test_calibration_bins_conserve_docs_and_bounds(spark):
    rows = QUERIES["calibration_reliability_bins"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.filter(F.size(F.split("text", " ")) > 0).count()
    n_en = docs.filter(
        (F.size(F.split("text", " ")) > 0) & (F.col("lang") == "en")
    ).count()
    assert sum(r["n_docs"] for r in rows) == n
    assert sum(r["n_positive"] for r in rows) == n_en
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["emp_rate_micro"] <= 1_000_000
        # the mean score of bin b lies inside the bin's [b/10, (b+1)/10)
        # value range (micro-rounded at the edges)
        assert r["bin"] * 100_000 - 1 <= r["mean_score_micro"]
        assert r["mean_score_micro"] <= (r["bin"] + 1) * 100_000


def test_precomputed_literals_match_their_formulas():
    """The Python-precomputed integer literals injected into BOTH engines
    (the nDCG/Benford rule) are re-derived here from their defining
    formulas — an edit to either side that forgets the other now fails a
    5-ms test instead of a cross-engine hash gate."""
    import math

    from veri_spark.plans.events_behavior import _POIS1_T
    from veri_spark.plans.integrity import _FS_W, _ring_vnodes
    from veri_spark.functions.hashing import portable_hash64_py

    # round-8: thresholds scaled to the 28-bit (7-hex) slice domain so four
    # independent fields fit one md5 digest (events_behavior.py rationale)
    cdf = 0.0
    for k, t in enumerate(_POIS1_T):
        cdf += math.exp(-1) / math.factorial(k)
        assert t == round(cdf * (1 << 28))

    m_u = {
        "len": (0.95, 0.10),
        "ntok": (0.90, 0.15),
        "pre16": (0.85, 0.01),
        "utok": (0.80, 0.20),
    }
    for f, (m, u) in m_u.items():
        wa, wd = _FS_W[f]
        assert wa == round(math.log(m / u) * 1e6)
        assert wd == round(math.log((1 - m) / (1 - u)) * 1e6)

    ring = _ring_vnodes()
    assert len(ring) == 64 and ring == sorted(ring)
    expect = sorted(
        (portable_hash64_py(f"n{j}#r{r}"), f"n{j}")
        for j in range(8)
        for r in range(8)
    )
    assert ring == expect
