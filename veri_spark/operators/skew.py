"""Skew mitigation: salted aggregation and salted joins.

The reference sidesteps skew by statistical sharding (every node holds a
random sample of the space, README.md:28-33), which Spark's hash partitioning
does not replicate: one hot group label or join key lands on one reducer.
AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on via
session.prepare_session) handles sort-merge joins automatically; these
helpers cover the cases AQE cannot see:

- non-partial aggregations (collect_list/percentile/distinct-agg) over a hot
  group -> ``salted_two_stage``: shard the group N ways, aggregate shards,
  re-aggregate. Works for any algebra with a merge step.
- hash/broadcast-ineligible joins with one hot key -> ``salted_join``:
  replicate the small side's hot rows N ways, scatter the big side
  deterministically across shards.

Salts are derived from hash columns, never ``rand()`` — plans stay
deterministic and re-runnable (the engine's determinism target, SURVEY.md
section 5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, entropy_cols: Sequence[str], buckets: int) -> DataFrame:
    """Deterministic salt column in [0, buckets) from the given columns."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in entropy_cols]), F.lit(buckets))
    )


def salted_two_stage(
    df: DataFrame,
    group_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    entropy_cols: Sequence[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: groupBy(group + salt) with
    ``partial_aggs``, then groupBy(group) with ``final_aggs`` over the shard
    results. The hot group's work spreads over ``buckets`` reducers in stage
    one; stage two touches only ``|groups| * buckets`` rows.

    ``partial_aggs`` / ``final_aggs`` must form a decomposition, e.g.
    partial ``count(*) AS c`` + final ``sum(c)`` for COUNT, partial
    ``collect_set(x) AS s`` + final ``array_distinct(flatten(collect_list(s)))``
    for a distinct set.
    """
    group_cols = list(group_cols)
    salted = with_salt(df, entropy_cols, buckets)
    partial = salted.groupBy(*group_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    entropy_cols: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a deterministic salt in
    [0, buckets); the small side is replicated ``buckets`` times (explode of
    a literal range), so every (key, salt) pair co-locates. Use when the
    small side is too big to broadcast but the big side has hot keys; cost is
    ``buckets``x replication of the small side, which caps reducer skew at
    1/buckets of the hot key's rows.

    Only big-side-preserving joins are valid: with ``right``/``full``/
    ``cross``, an unmatched small-side row would be emitted once per salt
    replica (``buckets`` duplicates), so those are rejected. ``left_semi``/
    ``left_anti`` are fine (they never emit small-side rows).
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
    }
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            "the replicated small side would duplicate unmatched rows"
        )
    on = list(on)
    big_s = with_salt(big, entropy_cols, buckets)
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = big_s.join(small_r, on + ["__salt"], how)
    return out.drop("__salt")
