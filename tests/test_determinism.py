"""Re-run determinism: queries whose implementations involve driver-side
iteration, sampling, or greedy selection must produce byte-identical rows
across runs in one session — the property the correctness gate and any
retry-on-failure scheduler silently depend on."""

import pytest

from veri_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"

CASES = [
    "mmr_rerank",              # driver greedy over collected candidates
    "kmeans_step_inertia",     # literal-centroid iteration
    "weighted_sample_es",      # deterministic-key weighted sampling
    "sample_stratified_by_type",
    "dedup_tiered_pipeline",   # multi-action tier counting
    "knn_join_recall_audit",   # persisted + counted audit
]


@pytest.mark.parametrize("name", CASES)
def test_rerun_identical(spark, name):
    a = [tuple(r) for r in QUERIES[name](spark, SF_DIR).collect()]
    b = [tuple(r) for r in QUERIES[name](spark, SF_DIR).collect()]
    assert a == b, name
