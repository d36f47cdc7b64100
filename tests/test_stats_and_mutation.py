"""DataInfo statistics (A1-A4) on hand-computed fixtures + mutation surface
(upsert/delete/TTL/capacity).
"""

import math

import pytest
from pyspark.sql import functions as F

from veri_spark.operators.mutation import (
    capacity_gate,
    datum_key,
    delete_keys,
    upsert,
    with_ttl,
)
from veri_spark.operators.stats import centroid, data_info


def test_centroid_hand_computed(spark, tiny_datums):
    c = centroid(tiny_datums)
    want = [
        (0.1 + 0.2 + 0.2) / 3,
        (0.2 + 0.3 + 0.3) / 3,
        (0.3 + 0.4 + 0.7) / 3,
    ]
    assert c == pytest.approx(want, rel=1e-6)


def test_data_info_shape(spark, tiny_datums):
    info = data_info(tiny_datums)
    assert info["n"] == 3
    assert len(info["avg"]) == 3
    assert len(info["hist"]) == 64
    assert info["max_distance"] > 0
    # frequencies sum to 1 (reference normalizes by N, newsync.go:163)
    assert sum(info["hist"]) == pytest.approx(1.0)


def test_upsert_latest_version_wins(spark):
    cur = spark.createDataFrame([(1, "old", 1), (2, "keep", 5)], "k int, v string, version int")
    batch = spark.createDataFrame([(1, "new", 2), (3, "ins", 1)], "k int, v string, version int")
    out = {r["k"]: (r["v"], r["version"]) for r in upsert(cur, batch, ["k"]).collect()}
    assert out == {1: ("new", 2), 2: ("keep", 5), 3: ("ins", 1)}


def test_upsert_same_version_is_stable(spark):
    cur = spark.createDataFrame([(1, "a", 1)], "k int, v string, version int")
    batch = spark.createDataFrame([(1, "b", 1)], "k int, v string, version int")
    out = upsert(cur, batch, ["k"], tie_cols=["v"]).collect()
    assert len(out) == 1
    assert out[0]["v"] == "b"  # deterministic tie-break (desc on tie col)


def test_delete_keys(spark):
    cur = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    out = delete_keys(cur, spark.createDataFrame([(2,)], "k int"), ["k"])
    assert {r["k"] for r in out.collect()} == {1, 3}


def test_with_ttl_and_capacity(spark):
    df = spark.range(5).withColumn("ts", F.current_timestamp())
    with_exp = with_ttl(df, 3600, inserted_at=F.col("ts"))
    row = with_exp.select(
        (F.unix_timestamp("expire_at") - F.unix_timestamp("ts")).alias("d")
    ).collect()[0]
    assert row["d"] == 3600
    # no-TTL marks NULL expire
    none_exp = with_ttl(df, None)
    assert none_exp.filter(F.col("expire_at").isNull()).count() == 5
    # capacity gate: TargetN admission (data/insert.go:12-14)
    assert capacity_gate(990, spark.range(100), target_n=1000).count() == 10
    assert capacity_gate(1000, spark.range(100), target_n=1000).count() == 0
    assert capacity_gate(1000, spark.range(100), target_n=1000, no_target=True).count() == 100


def test_datum_key_identity(spark):
    """Same (feature, group, shape) -> same key; any component change ->
    different key (gencoder key semantics, data/datum.go:105-111)."""
    rows = [
        ([0.1, 0.2], "g", 1),
        ([0.1, 0.2], "g", 2),     # same key fields, different version
        ([0.1, 0.3], "g", 1),     # different feature
        ([0.1, 0.2], "h", 1),     # different group
    ]
    df = spark.createDataFrame(rows, "feature array<float>, group_label string, version int")
    keys = [r["k"] for r in df.select(datum_key().alias("k")).collect()]
    assert keys[0] == keys[1]
    assert len({keys[0], keys[2], keys[3]}) == 3


def test_approx_ops_within_tolerance(spark):
    """The at-scale approximate forms track their exact counterparts within
    documented error: approx_count_distinct (HLL++, ~2% default rsd) and
    percentile_approx."""
    from veri_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    row = ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.median("value").alias("exact_p50"),
    ).first()
    assert abs(row["approx_users"] - row["exact_users"]) <= max(
        2, 0.05 * row["exact_users"]
    )
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 0.05 * abs(row["exact_p50"]) + 1.0


def test_empty_dataset_behaviors(spark, tmp_path):
    """Empty/missing datasets: search returns no rows, data_info degrades
    to zeros, export is empty — no exceptions anywhere."""
    from veri_spark.operators.search import SearchConfig
    from veri_spark.store import FeatureStore

    store = FeatureStore(spark, str(tmp_path / "ds"))
    assert store.search("missing", [[0.1, 0.2]], SearchConfig(limit=3)).count() == 0
    info = store.data_info("missing")
    assert info["n"] == 0 and info["avg"] == [] and info["max_distance"] is None
    assert store.export("missing").count() == 0


def test_single_row_histogram_no_divzero(spark, tmp_path):
    """One row: centroid is the row itself, max_distance 0; the histogram
    clamps everything into bucket 0 instead of dividing by zero (the
    reference's previous-pass-stats approximation sidesteps this; the exact
    two-pass form must handle it)."""
    from veri_spark.store import FeatureStore

    store = FeatureStore(spark, str(tmp_path / "ds"))
    one = spark.createDataFrame(
        [([1.0, 2.0], "g", "a", 0, None, None, None, None, None)],
        "feature array<float>, group_label string, label string, version bigint, "
        "dim1 int, dim2 int, size1 int, size2 int, expire_at timestamp",
    )
    store.insert("one", one)
    info = store.data_info("one")
    assert info["n"] == 1
    assert info["avg"] == [1.0, 2.0]
    assert info["max_distance"] == 0.0
    assert info["hist"][0] == 1.0 and sum(info["hist"]) == 1.0
