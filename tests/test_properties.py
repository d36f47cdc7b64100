"""Property-based tests (hypothesis) for the score-function expressions —
the reference has no property testing (SURVEY.md section 5); these pin the
metric laws the exact semantics must satisfy for ANY input, not just the
golden fixtures: self-distance zero, symmetry, clamped ranges, and agreement
with a NumPy oracle under the truncate/pad length rules."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from veri_spark.functions.vector import (
    angular_distance,
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l1_distance,
)

import pyspark.sql.functions as F

finite = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False,
    width=32,
)
vec = st.lists(finite, min_size=1, max_size=8)


def _eval(spark, expr_builder, a, b):
    df = spark.createDataFrame(
        [([float(x) for x in a], [float(y) for y in b])],
        "a array<float>, b array<float>",
    )
    return df.select(expr_builder(F.col("a"), F.col("b")).alias("v")).first()["v"]


@pytest.mark.parametrize("builder", [euclidean_distance, l1_distance])
@settings(max_examples=8, deadline=None)
@given(a=vec, b=vec)
def test_distance_symmetry_and_truncation(spark, builder, a, b):
    n = min(len(a), len(b))
    av = np.array(a[:n], dtype=np.float64)
    bv = np.array(b[:n], dtype=np.float64)
    expected = (
        float(np.sqrt(np.sum((av - bv) ** 2)))
        if builder is euclidean_distance
        else float(np.sum(np.abs(av - bv)))
    )
    got_ab = _eval(spark, builder, a, b)
    got_ba = _eval(spark, builder, b, a)
    assert math.isclose(got_ab, expected, rel_tol=1e-5, abs_tol=1e-5)
    assert math.isclose(got_ab, got_ba, rel_tol=1e-9, abs_tol=1e-9)  # symmetry


@settings(max_examples=8, deadline=None)
@given(a=vec)
def test_self_distance_zero_and_cosine_one(spark, a):
    assert _eval(spark, euclidean_distance, a, a) == 0.0
    assert _eval(spark, l1_distance, a, a) == 0.0
    if any(x != 0.0 for x in a):
        cos = _eval(spark, cosine_similarity, a, a)
        assert math.isclose(cos, 1.0, rel_tol=1e-6, abs_tol=1e-6)


@settings(max_examples=8, deadline=None)
@given(a=vec, b=vec)
def test_cosine_clamped_and_angular_range(spark, a, b):
    cos = _eval(spark, cosine_similarity, a, b)
    assert cos is None or -1.0 <= cos <= 1.0
    ang = _eval(spark, angular_distance, a, b)
    assert ang is None or 0.0 <= ang <= 1.0


@settings(max_examples=8, deadline=None)
@given(a=vec, b=vec)
def test_dot_truncates_to_min_length(spark, a, b):
    n = min(len(a), len(b))
    av = np.array(a[:n], dtype=np.float64)
    bv = np.array(b[:n], dtype=np.float64)
    got = _eval(spark, dot_product, a, b)
    assert math.isclose(got, float(av @ bv), rel_tol=1e-5, abs_tol=1e-4)
