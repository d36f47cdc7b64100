"""Physical-plan shape regression tests: the scale-critical plan properties
PLANS.md documents, asserted so a future edit cannot silently regress them.

Counting uses the STATIC executed plan (same discipline as
tools/plan_audit.py): AQE only improves these numbers at runtime."""

import re

import pyspark.sql.functions as F
import pytest

from veri_spark.plans.registry import QUERIES
from veri_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def plan_counts(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"\bReusedExchange\b", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }


def test_brute_force_knn_is_map_only(spark):
    """K1: the brute-force scored scan must stay a map pass + bounded
    top-k — ZERO exchanges. A shuffle here re-keys the whole corpus per
    query at 100 TB."""
    for q in ("knn_euclidean", "knn_cosine", "knn_l1", "knn_dot", "knn_angular"):
        assert plan_counts(QUERIES[q](spark, SF_DIR))["exchanges"] == 0, q


def test_ivf_assign_is_map_only(spark):
    """K2: literal-centroid assignment adds no exchange over the scan."""
    from veri_spark.operators.similarity import ivf_assign, take_centroids

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned = ivf_assign(emb, take_centroids(emb, 8))
    assert plan_counts(assigned)["exchanges"] == 0


def test_asof_join_single_shuffle(spark):
    """The as-of join must keep the single-shuffle union form — one
    exchange on the key, never a range-join row explosion."""
    c = plan_counts(QUERIES["asof_last_click"](spark, SF_DIR))
    assert c["exchanges"] == 1
    assert c["cartesian"] == 0 and c["bnlj"] == 0


def test_no_cartesian_products_in_headline_queries(spark):
    """No headline query may plan a cartesian product or an UNBOUNDED
    broadcast nested-loop join over two corpus-scale inputs. Bounded
    small-side BNLJs (literal probe sets, one-row aggregates) are
    allowed; this asserts the hard ban only for the quadratic shapes."""
    for q in (
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "ann_lsh_bucket_join",
        "knn_join_ivf",
        "tpch_q3_top_revenue",
        "upsert_latest_version",
        # round-5 quadratic-risk shapes: wedge joins, itemset self-joins,
        # IVF-blocked classification, LSH bucket accounting
        "graph_triangle_census",
        "graph_common_neighbors",
        "copurchase_top_triples",
        "knn_label_accuracy",
        "minhash_bucket_skew",
    ):
        c = plan_counts(QUERIES[q](spark, SF_DIR))
        assert c["cartesian"] == 0, q


def test_weighted_quantiles_single_exchange(spark):
    """Both window passes (cumsum + total) must share one source-keyed
    exchange."""
    c = plan_counts(QUERIES["weighted_length_quantiles"](spark, SF_DIR))
    assert c["exchanges"] <= 1
