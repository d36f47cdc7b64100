"""Round-9 property tests: the rank/packing primitives the new
statistics family is built on, pinned against brute-force models on
Hypothesis-generated inputs (the operators/ranking.py discipline —
the oracle gate proves engine parity on the committed corpus; these
prove the PRIMITIVES on adversarial inputs the corpus doesn't contain:
all-ties, singletons, id values at the 32-bit boundary).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=120)
)
def test_mid2_matches_brute_midranks(spark, vals):
    """_mid2's doubled midranks from the distributed prefix scan must
    equal 2x the classical sorted-ties-averaged midrank for EVERY
    multiset — including all-equal and singleton inputs."""
    from veri_spark.plans.nonparametric import _mid2

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    g = df.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    got = {r["v"]: r["mid2"] for r in _mid2(g, "v").collect()}

    c = Counter(vals)
    start, exp = 1, {}
    for v in sorted(c):
        exp[v] = 2 * start + (c[v] - 1)  # doubled midrank is exact int
        start += c[v]
    assert got == exp


@settings(max_examples=6, deadline=None)
@given(
    ids=st.lists(
        st.sampled_from(
            [0, 1, 2, 7, 2**31 - 1, 2**31, 2**32 - 2, 2**32 - 1]
        ),
        min_size=2,
        max_size=6,
        unique=True,
    )
)
def test_packed_pair_key_roundtrip_at_boundary(spark, ids):
    """The shiftleft(cu,32)+cv pair key must round-trip for ids across
    the FULL unsigned 32-bit range, including values that set the packed
    sign bit (the round-7 advisor finding: arithmetic shiftright
    sign-extends; the unpack must be shiftrightunsigned). Exercised via
    the real _common_counts_packed pipeline on a star graph whose
    expected pair counts are known."""
    from veri_spark.plans.graph import _common_counts_packed

    hub = 424242
    ids = [i for i in ids if i != hub]
    # star: every id adjacent to the hub -> every id pair shares exactly
    # one common neighbor (the hub)
    adj = [(i, hub) for i in ids]
    df = spark.createDataFrame(adj, "u long, v long")
    rows = _common_counts_packed(df).collect()
    got = {(r["cu"], r["cv"]): r["n_common"] for r in rows}
    s = sorted(ids)
    exp = {(a, b): 1 for i, a in enumerate(s) for b in s[i + 1 :]}
    assert got == exp


def test_capped_ranker_jac_slice_matches_independent_pipeline(spark):
    """The session-shared literal frame's jac slice must equal the
    independent capped top-20 pipeline (_common_counts_packed +
    _common_top20 over the same capped adjacency) — pins the
    persist-and-collect build against the composable operators it
    replaced for sweep cost."""
    from veri_spark.plans.graph import (
        _capped_ranker_top20s,
        _common_counts_packed,
        _common_top20,
    )

    sf = "/root/testdata/sf0.001"
    top20s, cund, und, deg = _capped_ranker_top20s(spark, sf)
    got = [
        (r["part_a"], r["part_b"], r["n_common"], round(r["jac"], 6))
        for r in top20s.filter(F.col("ranker") == "jac")
        .orderBy(
            F.col("jac").desc(),
            F.col("n_common").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .collect()
    ]
    cdeg = deg.select("u", F.least(F.col("d"), F.lit(128)).alias("d"))
    exp = [
        (r["part_a"], r["part_b"], r["n_common"], round(r["jac"], 6))
        for r in _common_top20(_common_counts_packed(cund), cdeg).collect()
    ]
    assert got == exp


def test_ams_sign_hash_is_unbiased_on_known_stream(spark):
    """AMS estimator sanity on a synthetic stream with known F2: every
    one of the 16 sign-hash estimators is (Z_i)^2 with E[Z^2] = F2; on a
    single-key stream Z_i = +-c exactly, so ALL estimates must equal F2
    — pins the sign extraction (bit i of one md5) and the squaring."""
    from veri_spark.functions.hashing import portable_hash64

    df = spark.createDataFrame([("solo",)] * 37, "user_id string")
    c = df.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    h = c.select(
        "cnt",
        portable_hash64(F.col("user_id").cast("string"), "ams").alias("hv"),
    )
    z = h.agg(
        *[
            F.sum(
                (1 - 2 * F.shiftright(F.col("hv"), i).bitwiseAND(F.lit(1)))
                * F.col("cnt")
            )
            .cast("bigint")
            .alias(f"z{i}")
            for i in range(16)
        ]
    ).collect()[0]
    assert all(z[f"z{i}"] ** 2 == 37 * 37 for i in range(16))
