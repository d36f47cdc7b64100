"""Bounded top-k operators.

The reference's ``Collector`` keeps the best ``limit`` rows by score with a
``higherIsBetter`` flag (data/search.go:64-86); grouped top-k routes rows to
per-group sub-collectors (data/aggregator.go:105-117).

Spark-first mapping:

- global top-k: ``ORDER BY score LIMIT k`` — the planner turns this into
  ``TakeOrderedAndProject``, which already does per-partition bounded heaps
  followed by a single driver-side merge (the reference's per-source
  partial + final merge, README.md:38, for free).
- per-group top-k: ``row_number() OVER (PARTITION BY g ORDER BY ...) <= k``
  — Spark >= 3.5 plans a ``WindowGroupLimit`` (rank pushdown), so each
  shuffle partition keeps only k rows per group before the full sort.

Ties are broken by caller-supplied stable columns so results are
deterministic — intentionally stronger than the reference, which disclaims
determinism (README.md:22).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordering(score_col: str, higher_is_better: bool, tie_cols: list[str]) -> list[Column]:
    # NULLS LAST in both directions: Spark's bare asc() is NULLS FIRST, which
    # would rank a null score (e.g. a null feature vector) above every real
    # match in lower-is-better searches
    first = (
        F.col(score_col).desc_nulls_last()
        if higher_is_better
        else F.col(score_col).asc_nulls_last()
    )
    return [first, *[F.col(c).asc() for c in tie_cols]]


def topk(
    df: DataFrame,
    score_col: str,
    k: int,
    higher_is_better: bool = False,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Global bounded top-k (reference Collector, data/search.go:64-86)."""
    return df.orderBy(*_ordering(score_col, higher_is_better, tie_cols or [])).limit(k)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    k: int,
    higher_is_better: bool = False,
    tie_cols: list[str] | None = None,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-group bounded top-k (reference grouped aggregator,
    data/aggregator.go:105-117).

    Keeps ``rank_col`` if requested (1-based rank within the group).
    """
    w = Window.partitionBy(*group_cols).orderBy(
        *_ordering(score_col, higher_is_better, tie_cols or [])
    )
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def topk_with_rank(
    df: DataFrame,
    score_col: str,
    k: int,
    higher_is_better: bool = False,
    tie_cols: list[str] | None = None,
    rank_col: str = "rn",
) -> DataFrame:
    """Global bounded top-k WITH 1-based ranks, fully distributed.

    The tempting shortcut — ``topk_per_group`` keyed on a literal — does
    NOT work at scale: Catalyst constant-folds a foldable partition spec
    away and the window becomes an unpartitioned global sort (every row to
    one task). Instead: ``topk`` (TakeOrderedAndProject — per-partition
    bounded heaps + driver merge), then ranks assigned INSIDE the k-row
    frame by counting strictly-better rows via a broadcast self-join
    (k × k, bounded by construction) — no window anywhere in the plan.

    ``(score_col, *tie_cols)`` must be a UNIQUE KEY of ``df`` — not merely
    a tie-breaker (round-7 advisor finding). The rank below counts DISTINCT
    strictly-better ``(score, ties)`` tuples, so duplicated key tuples can
    never double-count into a wrong rank; but rows fully identical across
    ALL columns still collapse in the groupBy (they are indistinguishable),
    so only a unique key gives exact ``row_number`` semantics. With
    duplicate key tuples the result degrades to ``rank()`` semantics
    (ties share a rank) rather than silently miscounting."""
    ties = tie_cols or []
    t = topk(df, score_col, k, higher_is_better, ties)
    probe = F.broadcast(
        t.select(
            F.col(score_col).alias("__s2"),
            *[F.col(c).alias(f"__t2_{c}") for c in ties],
        )
    )
    better = (
        F.col("__s2") > F.col(score_col)
        if higher_is_better
        else F.col("__s2") < F.col(score_col)
    )
    tie_eq = F.col("__s2") == F.col(score_col)
    for c in ties:
        better = better | (tie_eq & (F.col(f"__t2_{c}") < F.col(c)))
        tie_eq = tie_eq & (F.col(f"__t2_{c}") == F.col(c))
    out_cols = t.columns
    # countDistinct over a STRUCT of the probe key: the struct is non-null
    # even when a tie FIELD is null, so no matched better-tuple is dropped,
    # and distinctness makes the count immune to duplicated probe tuples.
    # Left-join misses (rank-1 rows) must still count zero, so the struct is
    # built only under the match witness __s2 IS NOT NULL (every matched row
    # has a non-null __s2: both `better` branches compare __s2) — the
    # otherwise-null WHEN is skipped by countDistinct.
    probe_key = F.when(
        F.col("__s2").isNotNull(),
        F.struct(F.col("__s2"), *[F.col(f"__t2_{c}") for c in ties]),
    )
    return (
        t.join(probe, better, "left")
        .groupBy(*out_cols)
        .agg((F.countDistinct(probe_key) + 1).cast("int").alias(rank_col))
    )


def dedup_keep_best(
    df: DataFrame,
    key_cols: list[str],
    score_col: str,
    higher_is_better: bool = False,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the best-scoring row per key (reference merge dedup,
    data/aggregator.go:118-134 — dedup on serialized DatumKey keeping the
    better score).
    """
    return topk_per_group(df, key_cols, score_col, 1, higher_is_better, tie_cols)
