"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy``.

An unpartitioned window moves EVERY row to one task to compute
row_number/ntile/lead (Spark plans a single-partition Exchange under the
WindowExec); fine at sf0.1, a serialization point at 100×. The classic
two-pass form used here instead:

1. ``repartitionByRange`` on the sort key (the same total order a global
   sort would produce, split across N range buckets whose partition index
   IS the range order);
2. ``row_number`` inside each range bucket (a PARTITIONED window keyed on
   ``spark_partition_id()``);
3. one tiny N-row aggregate of per-bucket counts, turned into cumulative
   offsets with an N×N self-join (N = shuffle partitions, so ~32 rows —
   deliberately NOT a window, keeping the whole plan free of unpartitioned
   WindowExec nodes for the plan-shape tests);
4. global rank = local rank + bucket offset, broadcast-joined back.

Correctness notes:

- ``repartitionByRange(num, keys)`` with an explicit ``num`` is exempt from
  AQE coalescing, and equal keys always land in the same bucket, so bucket
  index order = key order deterministically.
- When the sort key is unique the global rank is exact row_number. When it
  is NOT unique the rank of tied rows is positional (which tied row gets
  which rank is arbitrary) — exactly the semantics of ``row_number`` over a
  non-unique global sort; downstream uses must be tie-insensitive (e.g.
  fixed-size chunk stats, where permuting identical rows across positions
  cannot change any chunk's value multiset).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    num_partitions: int = 32,
    rn_col: str = "grn",
) -> DataFrame:
    """Add a 1-based global row number ``rn_col`` under the total order
    ``order_cols`` without any unpartitioned window (see module docstring).
    """
    part = df.repartitionByRange(num_partitions, *order_cols)
    # MATERIALIZE (localCheckpoint) before branching — load-bearing, not an
    # optimization. The per-bucket counts and the ranked rows are two
    # branches over this subtree; un-materialized, each branch re-executes
    # the range exchange, and RangePartitioner's boundary SAMPLING is
    # seeded by the (fresh) RDD id, so the two executions can draw
    # DIFFERENT range boundaries — the offsets then disagree with the
    # local ranks and the global rank gets gaps/duplicates (observed: max
    # rank 59882 over 60000 rows). localCheckpoint rather than persist():
    # a plain cache can be dropped mid-query by an external
    # spark.catalog.clearCache() (the harness releases caches BETWEEN
    # queries, but a harness that builds several queries before collecting
    # would clear this pin from under the first one) and Spark would then
    # silently recompute with fresh boundaries; a checkpoint is not in the
    # catalog cache, and losing its blocks FAILS the job instead of
    # corrupting the rank. At cluster scale this is the storage cost of
    # any total-order ranking (a sort writes the same bytes); the blocks
    # are freed by the ContextCleaner when the DataFrame is unreferenced.
    local = (
        part.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lrn",
            F.row_number().over(
                Window.partitionBy("__pid").orderBy(*order_cols)
            ),
        )
        .localCheckpoint(eager=False)
    )
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    prior = counts.select(
        F.col("__pid").alias("__p2"), F.col("__cnt").alias("__c2")
    )
    offsets = (
        counts.join(prior, F.col("__p2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__c2"), F.lit(0)).alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rn_col, (F.col("__lrn") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )


def global_prefix_agg(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    value_col: str | Sequence[str],
    agg: str = "sum",
    out_col: str | Sequence[str] = "cum",
    num_partitions: int = 32,
) -> DataFrame:
    """Global RUNNING aggregate (cumulative ``sum`` / ``min`` / ``max`` of
    ``value_col`` under the total order ``order_cols``, current row
    included) without any unpartitioned window — the prefix-scan sibling of
    :func:`global_row_number`, and the scale-safe replacement for
    ``agg(x).over(Window.orderBy(...))``.

    Same two-pass shape: range-partition on the order keys (bucket index =
    range order), run the PARTITIONED running aggregate inside each bucket,
    reduce each bucket to one total, fold the N ~32 totals into per-bucket
    prefix offsets with a triangular self-join (no window), and combine the
    local running value with the broadcast offset (``+`` for sum,
    ``least``/``greatest`` for min/max, null-offset-safe for bucket 0).

    Running aggregates are only well-defined up to tie order: rows equal
    under ``order_cols`` receive arbitrary intra-tie prefix values (the
    standard ``ROWS UNBOUNDED PRECEDING`` semantics). Callers needing
    determinism must make the order keys unique — e.g. pre-aggregate to one
    row per key (the KS-statistic CDF pattern) or append a tiebreaker id.

    The ``localCheckpoint`` before branching is load-bearing, not an
    optimization — see :func:`global_row_number` (RangePartitioner samples
    boundaries seeded by the RDD id, so the totals branch and the rows
    branch would otherwise re-partition DIFFERENTLY).

    ``value_col``/``out_col`` may be parallel lists to scan several measures
    in ONE pass (one range exchange serves every cumulative column — the
    two-sample KS statistic scans both CDFs this way).
    """
    try:
        agg_fn = {"sum": F.sum, "min": F.min, "max": F.max}[agg]
    except KeyError:  # pragma: no cover - caller bug
        raise ValueError(f"agg must be sum|min|max, got {agg!r}")
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    ocols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vcols) != len(ocols):  # pragma: no cover - caller bug
        raise ValueError("value_col and out_col lengths differ")
    part = df.repartitionByRange(num_partitions, *order_cols)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("__pid", F.spark_partition_id())
    for i, v in enumerate(vcols):
        local = local.withColumn(f"__lcum{i}", agg_fn(v).over(w))
    local = local.localCheckpoint(eager=False)
    totals = local.groupBy("__pid").agg(
        *[agg_fn(v).alias(f"__t{i}") for i, v in enumerate(vcols)]
    )
    prior = totals.select(
        F.col("__pid").alias("__p2"),
        *[F.col(f"__t{i}").alias(f"__t2{i}") for i in range(len(vcols))],
    )
    offsets = (
        totals.join(prior, F.col("__p2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(*[agg_fn(f"__t2{i}").alias(f"__off{i}") for i in range(len(vcols))])
    )
    joined = local.join(F.broadcast(offsets), "__pid")
    drop = ["__pid"]
    for i, oc in enumerate(ocols):
        lcum, off = F.col(f"__lcum{i}"), F.col(f"__off{i}")
        if agg == "sum":
            # match Window-sum NULL semantics: the running sum is NULL only
            # while NO non-null value has been seen anywhere in the prefix;
            # a bucket whose local prefix is all-NULL must still surface the
            # prior buckets' offset (lcum + coalesce(off) alone would
            # NULL-poison it)
            combined = F.when(
                lcum.isNull() & off.isNull(), F.lit(None)
            ).otherwise(F.coalesce(lcum, F.lit(0)) + F.coalesce(off, F.lit(0)))
        else:
            pick = F.least if agg == "min" else F.greatest
            combined = F.when(off.isNull(), lcum).otherwise(pick(lcum, off))
        joined = joined.withColumn(oc, combined)
        drop += [f"__lcum{i}", f"__off{i}"]
    return joined.drop(*drop)


def ntile_from_rank(rn: Column, total: Column, buckets: int) -> Column:
    """SQL-standard ``ntile(buckets)`` computed from a global row number and
    the total row count (both BIGINT columns): the first ``total % buckets``
    buckets get ``ceil(total/buckets)`` rows, the rest get the floor. Lets a
    distributed rank replace an unpartitioned ntile window bit-for-bit.

    Guarded for total < buckets (q=0): every row gets bucket = rn, matching
    ntile's leftover-bucket behavior."""
    q = F.floor(total / buckets).cast("bigint")
    r = (total % buckets).cast("bigint")
    big = r * (q + 1)
    return (
        F.when(rn <= big, F.ceil(rn / (q + 1)))
        .otherwise(r + F.ceil((rn - big) / F.greatest(q, F.lit(1))))
        .cast("int")
    )


def sorted_neighborhood_candidates(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    window: int = 3,
    num_partitions: int = 32,
) -> DataFrame:
    """Sorted-neighborhood (Hernandez-Stolfo) candidate pairs, distributed:
    rank the corpus by the blocking key with :func:`global_row_number`,
    then pair each row with the ``window - 1`` rows after it via SHIFTED
    EQUI-JOINS on the rank (a-side rows re-keyed to rank+1 … rank+w-1 and
    hash-joined against the b-side rank) — no ``lead()`` windows at all, so
    there is no per-range boundary case and empty range buckets cannot
    swallow neighbors. Returns one row per candidate pair with every input
    column twice, suffixed ``_a`` / ``_b``.

    Scale: the only exchanges are the range partition inside the ranking
    and the two sides of the rank equi-join; the pair count is exactly
    (w-1)·n - O(w²), never quadratic in any block size. ``window=1`` is a
    well-defined degenerate case (each row alone in its window) and
    returns an empty pair frame with the full output schema.
    """
    ranked = global_row_number(df, order_cols, num_partitions, rn_col="__grn")
    a = ranked.select(
        F.col("__grn").alias("__ga"),
        *[F.col(c).alias(f"{c}_a") for c in df.columns],
    )
    b = ranked.select(
        F.col("__grn").alias("__gb"),
        *[F.col(c).alias(f"{c}_b") for c in df.columns],
    )
    shifted = a.select(
        F.col("__ga").alias("__gb"), *[f"{c}_a" for c in df.columns]
    ).limit(0)
    for delta in range(1, window):
        s = a.select((F.col("__ga") + delta).alias("__gb"), *[
            f"{c}_a" for c in df.columns
        ])
        shifted = shifted.unionByName(s)
    return shifted.join(b, "__gb").drop("__gb")
