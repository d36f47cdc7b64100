"""Vector score functions as native Column expressions.

Reproduces the reference's five score functions and their exact semantics
(reference: data/util.go:28-96; registry data/search.go:111-127):

- ``VectorDistance`` (euclidean) and ``QuickVectorDistance`` (L1) truncate
  both vectors to the *shorter* length (data/util.go:29-30, 40-41).
- ``VectorMultiplication`` (dot product) also truncates to min length
  (data/util.go:46-53).
- ``CosineSimilarity`` iterates to the *longer* length (missing elements are
  zero) and clamps the result to [-1, 1] (data/util.go:61-96).
- ``AngularDistance`` = ``1 - acos(cosine)/pi`` (data/util.go:56-58) —
  higher is better.
- Unknown names silently fall back to euclidean (data/search.go:122-127), and
  ``Annoy``-prefixed aliases select the ANN path in the reference
  (data/search.go:136-141) with the same formulas; here they resolve to the
  same expressions and the approximate path is chosen separately.

Everything is a Column expression over ``ARRAY<FLOAT/DOUBLE>`` built from
``zip_with`` / ``aggregate`` / ``sqrt`` / ``acos`` — no Python UDF, so the
score evaluates JVM-side inside the generated plan and Catalyst can constant-
fold the literal query vector. Arithmetic is performed in double precision
(reference uses float32; doubles are a strict accuracy improvement and match
the DuckDB oracle bit-for-bit at the rounding grain we assert).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnLike = "Column | str | list[float]"


def _as_double_array(v) -> Column:
    """Coerce a column name / Column / python list to ARRAY<DOUBLE>."""
    if isinstance(v, Column):
        return v.cast("array<double>")
    if isinstance(v, str):
        return F.col(v).cast("array<double>")
    # literal python vector (the query side) — becomes a foldable constant
    return F.array(*[F.lit(float(x)) for x in v]).cast("array<double>")


def _truncate_pair(a: Column, b: Column) -> tuple[Column, Column]:
    """Slice both arrays to the common (min) length.

    zip_with pads the shorter array with nulls; the reference instead
    truncates (data/util.go:29-30), so slice explicitly.
    """
    n = F.least(F.size(a), F.size(b))
    return F.slice(a, 1, n), F.slice(b, 1, n)


def _sum_array(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


# Unrolling bound: 128 scalar terms keeps the generated Java method far
# under janino's 64KB limit (the PQ ADC work found k>=16 nested CASEs blow
# it; flat add-chains of this size do not).
_UNROLL_MAX = 128


def _raw_col(v) -> Column:
    return F.col(v) if isinstance(v, str) else v


def _elem(a: Column, i: int) -> Column:
    # scalar per-element cast (float->double widening is exact), NOT a
    # whole-array cast: an array cast inside the expression would reallocate
    # the full array once per term under codegen. try_element_at (NULL, not
    # ANSI error, when out of bounds): subexpression elimination may hoist
    # terms out of the size-guard CASE branch, so they must stay safe to
    # evaluate on rows shorter than the unroll length.
    return F.try_element_at(a, F.lit(i + 1)).cast("double")


def _unrolled_terms(a: Column, q: list, combine) -> Column:
    """Left-associated sum of coalesce(combine(a_i, q_i), 0) — the same
    fold order as ``aggregate(zip_with(...))`` so sums are bit-identical,
    and the per-term coalesce realizes MIN-LENGTH truncation exactly: when
    the row is shorter than the literal, the missing tail contributes 0,
    which is what dropping those terms computes. No fallback kernel is
    embedded — duplicating the interpreted general kernel inside every
    branch (e.g. 8x in the literal-centroid assignment) was measured to
    blow the expression tree up ~8x in runtime.

    PARITY CAVEAT: the per-term coalesce cannot distinguish an in-bounds
    NULL element from an out-of-bounds miss, so a NULL element contributes
    0 here while the general zip_with/aggregate kernel propagates it to a
    NULL score. Arrays must be null-element-free for unroll parity (true
    for every parquet embedding column in this engine; enforced nowhere
    else — callers with nullable elements must use unroll=False)."""
    total = F.lit(0.0)
    for i, x in enumerate(q):
        total = total + F.coalesce(
            combine(_elem(a, i), F.lit(float(x))), F.lit(0.0)
        )
    return total


def _literal_fastpath(b) -> bool:
    return isinstance(b, (list, tuple)) and 0 < len(b) <= _UNROLL_MAX


def _fastpath(a, b) -> bool:
    # column-vs-literal only: two literals stay on the general (foldable)
    # kernel, and an oversized literal would bloat the generated method
    return isinstance(a, (Column, str)) and _literal_fastpath(b)


def euclidean_distance(a, b, unroll: bool = False) -> Column:
    """VectorDistance: sqrt(sum((a_i-b_i)^2)) over min-length prefix.

    When the second side is a literal python vector (query / centroid),
    emits an UNROLLED scalar add-chain that whole-stage codegen compiles
    (~6x faster than the interpreted higher-order-function kernel measured
    on 500k pairs at sf0.1); the per-term coalesce reproduces the
    reference's min-length truncation (data/util.go:29-30) exactly.
    Callers embedding MANY literal kernels in one projection (multi-
    centroid assignment) pass ``unroll=False`` past ~128 total terms —
    janino's method limit otherwise forces the whole projection
    interpreted."""
    if unroll and _fastpath(a, b):
        return F.sqrt(
            _unrolled_terms(_raw_col(a), b, lambda x, y: (x - y) * (x - y))
        )
    return _euclidean_general(a, b)


def _euclidean_general(a, b) -> Column:
    a, b = _truncate_pair(_as_double_array(a), _as_double_array(b))
    return F.sqrt(_sum_array(F.zip_with(a, b, lambda x, y: (x - y) * (x - y))))


def euclidean_distance_fixed(a, b, dim: int) -> Column:
    """Column-column euclidean distance with a statically-known dimension:
    an unrolled scalar add-chain that whole-stage codegen compiles, for the
    pair-heavy inner loops (kNN join, blocked near-dup) where BOTH sides
    are columns and the interpreted zip_with/aggregate kernel dominates
    runtime (~6x measured on 500k pairs). Rows SHORTER than ``dim`` are
    handled exactly (per-term coalesce = min-length truncation, same fold
    order as the general kernel, bit-identical); rows LONGER than ``dim``
    are silently truncated at ``dim`` — there is no runtime length
    fallback, so callers must pass dim >= the corpus max dimension
    (knn_join derives it from max(size(vector_col)))."""
    if not (0 < dim <= _UNROLL_MAX):
        return _euclidean_general(a, b)
    ar, br = _raw_col(a), _raw_col(b)
    total = F.lit(0.0)
    for i in range(dim):
        d = _elem(ar, i) - _elem(br, i)
        # coalesce = min-length truncation (missing tail contributes 0);
        # the caller must pass dim >= the corpus dimension, or longer rows
        # would be silently truncated at dim
        total = total + F.coalesce(d * d, F.lit(0.0))
    return F.sqrt(total)


def l1_distance(a, b, unroll: bool = False) -> Column:
    """QuickVectorDistance: sum(|a_i-b_i|) over min-length prefix."""
    if unroll and _fastpath(a, b):
        return _unrolled_terms(_raw_col(a), b, lambda x, y: F.abs(x - y))
    return _l1_general(a, b)


def _l1_general(a, b) -> Column:
    a, b = _truncate_pair(_as_double_array(a), _as_double_array(b))
    return _sum_array(F.zip_with(a, b, lambda x, y: F.abs(x - y)))


def dot_product(a, b, unroll: bool = False) -> Column:
    """VectorMultiplication: sum(a_i*b_i) over min-length prefix."""
    if unroll and _fastpath(a, b):
        return _unrolled_terms(_raw_col(a), b, lambda x, y: x * y)
    return _dot_general(a, b)


def _dot_general(a, b) -> Column:
    a, b = _truncate_pair(_as_double_array(a), _as_double_array(b))
    return _sum_array(F.zip_with(a, b, lambda x, y: x * y))


def cosine_similarity(a, b, unroll: bool = False) -> Column:
    """CosineSimilarity over the max-length union (missing = 0), clamped.

    Zero-norm inputs score 0 (division guard; the reference's float math
    yields NaN there, which no caller relies on). Literal-query calls on
    equal-length rows take the unrolled codegen fast path (see
    euclidean_distance); padding semantics only matter on the fallback.
    """
    if unroll and _fastpath(a, b):
        ar = _raw_col(a)
        # dot over the max-length union: terms beyond min(len) are zero
        # (the literal has no element -> product 0; coalesce realizes it)
        dot = _unrolled_terms(ar, b, lambda x, y: x * y)
        # ||a|| must cover the FULL row even if it is longer than the
        # literal; the unrolled sum is exact when size(a) == len(b) (the
        # uniform-corpus hot path), with a single small aggregate as the
        # ragged-row fallback — NOT the whole general cosine kernel
        # (duplicating big kernels per branch was the measured blow-up).
        na_fast = F.sqrt(_unrolled_terms(ar, b, lambda x, y: x * x))
        na_full = F.sqrt(
            F.aggregate(
                ar,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        na = F.when(F.size(ar) == len(b), na_fast).otherwise(na_full)
        # constant-folded by Catalyst: the query norm is a plan literal
        nb = F.sqrt(
            sum((F.lit(float(x)) * F.lit(float(x)) for x in b), F.lit(0.0))
        )
        cos = F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
            dot / (na * nb)
        )
        return F.least(F.greatest(cos, F.lit(-1.0)), F.lit(1.0))
    return _cosine_general(a, b)


def _cosine_general(a, b) -> Column:
    a = _as_double_array(a)
    b = _as_double_array(b)
    # zip_with pads with null to the longer length; coalesce realizes the
    # "missing elements are zero" semantics of data/util.go:62-85.
    prods = F.zip_with(
        a, b, lambda x, y: F.coalesce(x, F.lit(0.0)) * F.coalesce(y, F.lit(0.0))
    )
    dot = _sum_array(prods)
    na = F.sqrt(_sum_array(F.zip_with(a, a, lambda x, y: F.coalesce(x * y, F.lit(0.0)))))
    nb = F.sqrt(_sum_array(F.zip_with(b, b, lambda x, y: F.coalesce(x * y, F.lit(0.0)))))
    cos = F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(dot / (na * nb))
    return F.least(F.greatest(cos, F.lit(-1.0)), F.lit(1.0))


def angular_distance(a, b, unroll: bool = False) -> Column:
    """AngularDistance = 1 - acos(cosine_similarity)/pi; in [0,1], higher=closer."""
    return F.lit(1.0) - F.acos(cosine_similarity(a, b, unroll=unroll)) / F.lit(
        3.141592653589793
    )


# name -> (builder, higher_is_better default)
# Aliases mirror data/search.go:111-121 (incl. the Annoy* ANN-path aliases).
SCORE_FUNCTIONS: dict[str, tuple[Callable[..., Column], bool]] = {
    "VectorDistance": (euclidean_distance, False),
    "QuickVectorDistance": (l1_distance, False),
    "CosineSimilarity": (cosine_similarity, True),
    "AngularDistance": (angular_distance, True),
    "VectorMultiplication": (dot_product, True),
    "AnnoyVectorDistance": (euclidean_distance, False),
    "AnnoyCosineSimilarity": (cosine_similarity, True),
    "AnnoyAngularDistance": (angular_distance, True),
    "AnnoyVectorMultiplication": (dot_product, True),
    # friendlier aliases for the extended API
    "euclidean": (euclidean_distance, False),
    "l1": (l1_distance, False),
    "cosine": (cosine_similarity, True),
    "angular": (angular_distance, True),
    "dot": (dot_product, True),
}


def score_fn(name: str | None) -> tuple[Callable[..., Column], bool]:
    """Resolve a score function by name.

    Unknown/empty names fall back to euclidean distance, mirroring
    data/search.go:122-127's silent default.
    """
    return SCORE_FUNCTIONS.get(name or "", SCORE_FUNCTIONS["VectorDistance"])


def is_approximate(name: str | None) -> bool:
    """Annoy-prefixed names request the ANN path (data/search.go:136-141)."""
    return bool(name) and name.startswith("Annoy")


def register_score_fn(
    name: str,
    builder: Callable[..., Column],
    higher_is_better: bool,
) -> None:
    """User extension point (SURVEY.md section 2.7): add a named score
    function to the registry consulted per query.

    The reference's only extensibility is this name->function map
    (data/search.go:111-127); here a builder takes two Column arguments
    (corpus vector, query literal) and returns a score Column. Prefer native
    expressions (whole-stage codegen); for logic they cannot express, build
    over an Arrow-vectorized ``pandas_udf`` — see make_pandas_score_fn.
    """
    SCORE_FUNCTIONS[name] = (builder, higher_is_better)


def make_pandas_score_fn(fn: Callable) -> Callable[..., Column]:
    """Wrap a NumPy-level function ``fn(v: np.ndarray, q: np.ndarray) ->
    float`` as an Arrow-batched score builder usable with register_score_fn.

    Both the corpus vector and the query columns go through one vectorized
    ``pandas_udf`` (Arrow record batches, never row-at-a-time Python). The
    query side is a literal, so Tungsten materializes it once per batch
    column; the dominant cost stays the corpus-vector transfer, which any
    Python-scored path must pay.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def scorer(vecs: pd.Series, qs: pd.Series) -> pd.Series:
        out = np.empty(len(vecs), dtype=np.float64)
        for i, (v, q) in enumerate(zip(vecs, qs)):
            out[i] = fn(np.asarray(v, dtype=np.float64), np.asarray(q, dtype=np.float64))
        return pd.Series(out)

    def builder(vec_col: Column, query) -> Column:
        # callers pass the query as a Python sequence (like the native
        # builders, score_corpus:103); normalize to an array literal
        if not isinstance(query, Column):
            query = F.array(*[F.lit(float(x)) for x in query])
        return scorer(vec_col, query)

    return builder


def dot_product_fixed(a, b, dim: int) -> Column:
    """Column-column dot product with a statically-known dimension: the
    unrolled codegen kernel for pair loops that pre-hoist norms (blocked
    embedding near-dup). Per-term coalesce = min-length truncation, same
    left fold order as ``aggregate(zip_with(...))`` — bit-identical on
    uniform-dimension corpora. The caller must pass dim >= the corpus
    dimension (longer rows would silently truncate at dim)."""
    ar, br = _raw_col(a), _raw_col(b)
    if not (0 < dim <= _UNROLL_MAX):
        return _dot_general(ar, br)
    total = F.lit(0.0)
    for i in range(dim):
        total = total + F.coalesce(_elem(ar, i) * _elem(br, i), F.lit(0.0))
    return total
