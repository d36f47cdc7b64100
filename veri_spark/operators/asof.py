"""As-of (point-in-time) join: for each left row, the most recent right row
at or before the left row's timestamp, per equality key.

The reference has no temporal joins (SURVEY.md section 2.5 — "none in the
reference"); this operator is part of the training-data-pipeline extension
surface (feature backfill / point-in-time-correct feature lookup, the batch
analog of a feature store's serving join).

Implementation is the single-shuffle union formulation, not a range join:

    union(left tagged 1, right tagged 0) keyed on `on`
      -> window last(payload, ignorenulls) ordered by (ts, side, payload)
      -> keep left rows

A naive ``left.join(right, key AND r.ts <= l.ts)`` + groupBy-max is a range
join that materializes every (left, earlier-right) pair — O(|L| * avg
right-rows-per-key) intermediate rows and two shuffles. The union plan
shuffles each input exactly once on the key, sorts within partitions, and
carries O(1) state per row, so it survives a 100x scale-up where the range
join explodes. Right rows sort before left rows at equal timestamps, giving
``<=`` (inclusive) semantics; ties among right rows resolve to the greatest
payload struct, which is deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tag_sides(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """Union-compatible tagged projections of both join sides: keys renamed
    ``__k_*``, event time as ``__t``, left rows carry their full row struct,
    right rows carry the (ts, payload...) struct, each side NULL-typed for
    the other's struct so the union resolves without casts."""
    payload_struct = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in payload_cols]
    )
    l_tagged = left.select(
        *[F.col(c).alias(f"__k_{c}") for c in on],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(payload_struct.alias("p")).schema["p"].dataType
        ).alias("__payload"),
        F.struct(*left.columns).alias("__left"),
    )
    r_tagged = right.select(
        *[F.col(c).alias(f"__k_{c}") for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__payload"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("l")).schema["l"].dataType
        ).alias("__left"),
    )
    return l_tagged, r_tagged


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    prefix: str,
    tolerance_seconds: int | None,
) -> DataFrame:
    """Nearest-direction as-of: per left row, whichever of the latest-
    preceding and earliest-following right rows is temporally closer
    (ties -> preceding, pandas ``merge_asof(direction="nearest")``).

    Both candidate fills share ONE window partitioning and sort (ts asc,
    right-before-left at equal ts), differing only in frame — Spark groups
    same-(partition, order) window expressions into a single Window node,
    so this stays one shuffle + one sort, not two as-of joins glued
    together. The forward frame ``[current, end]`` excludes an equal-ts
    right row (it sorts before the left row), but that row IS the backward
    match at distance 0, which wins `nearest` anyway — semantics are
    unaffected.
    """
    on = list(on)
    payload_cols = [c for c in payload_cols if c != right_ts]
    l_tagged, r_tagged = _tag_sides(
        left, right, on, left_ts, right_ts, payload_cols
    )
    w = Window.partitionBy(*[f"__k_{c}" for c in on]).orderBy(
        F.col("__t").asc(), F.col("__side").asc(), F.col("__payload").asc()
    )
    back = F.last("__payload", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("__payload", ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__back", back)
        .withColumn("__fwd", fwd)
    )
    t = F.col("__t")
    if tolerance_seconds is not None:
        tol = F.expr(f"INTERVAL {int(tolerance_seconds)} SECOND")
        filled = filled.withColumn(
            "__back", F.when(F.col("__back.__ts") >= t - tol, F.col("__back"))
        ).withColumn(
            "__fwd", F.when(F.col("__fwd.__ts") <= t + tol, F.col("__fwd"))
        )
    # NTZ timestamps reject a direct double cast; hop through TIMESTAMP
    # (no-op for TIMESTAMP inputs, instant-preserving for NTZ under the
    # UTC-pinned session)
    t_s = t.cast("timestamp").cast("double")
    d_back = t_s - F.col("__back.__ts").cast("timestamp").cast("double")
    d_fwd = F.col("__fwd.__ts").cast("timestamp").cast("double") - t_s
    match = (
        F.when(F.col("__back").isNull(), F.col("__fwd"))
        .when(F.col("__fwd").isNull(), F.col("__back"))
        .when(d_fwd < d_back, F.col("__fwd"))
        .otherwise(F.col("__back"))
    )
    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(match.getField("__ts").alias(f"{prefix}{right_ts}"))
    out_cols.extend(match.getField(c).alias(f"{prefix}{c}") for c in payload_cols)
    return filled.filter(F.col("__side") == 1).select(*out_cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: Sequence[str] = (),
    prefix: str = "asof_",
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, annotated with ``prefix + right_ts``
    and ``prefix + c`` for each payload column from the latest right row with
    ``right[right_ts] <= left[left_ts]`` on the same key (NULLs when none).

    ``tolerance_seconds`` optionally voids matches staler than the given gap
    (the pandas ``merge_asof(tolerance=...)`` semantic).

    ``direction="forward"`` flips the temporal sense: the EARLIEST right row
    with ``right[right_ts] >= left[left_ts]`` (time-to-next-event lookups).
    Same single-shuffle union plan — only the window frame and the
    equal-timestamp side ordering flip, so the scale behavior is identical.

    ``direction="nearest"`` picks whichever of the backward and forward
    matches is temporally closer (ties -> the backward match, mirroring
    pandas ``merge_asof(direction="nearest")``). Implemented as ONE pass:
    both window fills run over the same partitioning and sort, so Spark
    evaluates them in a single Window node on a single shuffle — not two
    as-of joins stitched together.
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, payload_cols, prefix,
            tolerance_seconds,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    payload_cols = [c for c in payload_cols if c != right_ts]
    l_tagged, r_tagged = _tag_sides(
        left, right, on, left_ts, right_ts, payload_cols
    )
    part = Window.partitionBy(*[f"__k_{c}" for c in on])
    if direction == "backward":
        # right rows sort BEFORE left at equal ts -> <= inclusive; the
        # latest preceding payload is last(ignorenulls) over [start, cur]
        w = part.orderBy(
            F.col("__t").asc(), F.col("__side").asc(), F.col("__payload").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = F.last("__payload", ignorenulls=True)
    else:
        # right rows sort AFTER left at equal ts -> >= inclusive; the
        # earliest following payload is first(ignorenulls) over [cur, end].
        # Ties among right rows resolve to the LEAST payload struct
        # (deterministic, mirrors backward's greatest-payload rule).
        w = part.orderBy(
            F.col("__t").asc(), F.col("__side").desc(), F.col("__payload").asc()
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = F.first("__payload", ignorenulls=True)
    filled = l_tagged.unionByName(r_tagged).withColumn("__match", fill.over(w))
    match: Column = F.col("__match")
    if tolerance_seconds is not None:
        if direction == "backward":
            fresh = F.col("__match.__ts") >= F.col("__t") - F.expr(
                f"INTERVAL {int(tolerance_seconds)} SECOND"
            )
        else:
            fresh = F.col("__match.__ts") <= F.col("__t") + F.expr(
                f"INTERVAL {int(tolerance_seconds)} SECOND"
            )
        match = F.when(fresh, F.col("__match"))
    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(match.getField("__ts").alias(f"{prefix}{right_ts}"))
    out_cols.extend(match.getField(c).alias(f"{prefix}{c}") for c in payload_cols)
    return filled.filter(F.col("__side") == 1).select(*out_cols)
