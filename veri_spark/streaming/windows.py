"""Structured Streaming surface: event-time windows with watermarks.

The reference is a continuously-running service but has no event-time
windowing (SURVEY.md section 2.6); its streaming constructs are maintenance
loops (ST1-ST3). This module supplies the streaming extension natively:
tumbling / sliding / session windows with late-data watermarks, written so
the SAME aggregation expression runs in batch (for the oracle) and under
``readStream`` (for production).

Scale notes: windowed aggregation state is bounded by the watermark; the
shuffle key is (window, extra groups), so skewed event_types at 100 TB
warrant salting the groupBy or widening to (window, type, user_id % N)
pre-aggregation. The maintenance cadence of the reference (Process every
60 s, data/data.go:158-164) maps to ``trigger(processingTime=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from veri_spark.session import prepare_session


def ensure_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize ``ts_col`` to TIMESTAMP so ``withWatermark`` accepts it.

    Spark rejects TIMESTAMP_NTZ event time (EVENT_TIME_IS_NOT_ON_TIMESTAMP
    _TYPE); depending on parquet footer flags the events table reads as
    bigint nanos, TIMESTAMP_NTZ, or TIMESTAMP. The session timezone is
    pinned UTC by ``prepare_session``, so the NTZ→TIMESTAMP cast changes
    the type tag, not the instant. Applied defensively at every watermark
    site so helpers are robust regardless of source schema."""
    dt = dict(df.dtypes).get(ts_col)
    if dt == "bigint":
        # ns → us truncation, matching sources/catalog.load_table.
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    if dt == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over the events parquet (one-file micro-batches).

    Mirrors sources/catalog.load_table's nanos normalization so batch and
    stream see the same schema.
    """
    prepare_session(spark)
    src = f"{sf_dir.rstrip('/')}/events.parquet"
    batch = spark.read.parquet(src)
    # The file-stream source monitors a DIRECTORY; the fixture is a single
    # file, so stage a symlink dir (at scale the source would already be an
    # arriving-files directory / Kafka topic).
    import os
    import tempfile

    stage = tempfile.mkdtemp(prefix="veri_events_stream_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
    )
    # Normalize to TIMESTAMP (not NTZ): Spark watermarks reject
    # TIMESTAMP_NTZ event time, and some environments read this parquet as
    # NTZ rather than bigint nanos. Instants are unchanged (UTC session).
    return ensure_event_time(stream, "ts")


def tumbling_window_agg(
    events: DataFrame,
    window_length: str = "1 hour",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time window: counts + value sum per (window, groups).

    Works on both batch and streaming frames; the watermark bounds state and
    admits late rows up to the given delay (no-op in batch).
    """
    df = events
    if watermark and events.isStreaming:
        df = ensure_event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_length).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_length: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding event-time window (overlapping): same agg as tumbling."""
    df = events
    if watermark and events.isStreaming:
        df = ensure_event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_length, slide).alias("w"), *group_cols
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows: activity bursts separated by >= ``gap`` of silence,
    per group. Batch-compatible; in streaming requires the watermark."""
    df = events
    if watermark and events.isStreaming:
        df = ensure_event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: pair each left row with
    right rows sharing ``on`` whose timestamp lands in
    ``[left_ts + lower, left_ts + upper]`` (the click-to-impression /
    event-to-enrichment shape).

    Both sides get the watermark; together with the bounded interval this
    is what lets Spark EVICT join state — per key, each side buffers only
    ``watermark + interval`` of rows, so state is O(rate x window), not
    O(stream). An unbounded-condition stream-stream join would hold both
    streams forever — never ship one at 100 TB/day. Batch frames join with
    the identical predicate (no watermark needed), so the same function
    serves the oracle path. Outer joins emit their null-padded rows only
    after the watermark passes (Spark semantics), and require the time
    bound on BOTH sides — which the symmetric interval provides.

    When both timestamp columns share a name, the right one is renamed to
    ``{right_ts}__r`` in the output; the join key appears once."""
    l, r = left, right
    if right_ts == left_ts:
        r = r.withColumnRenamed(right_ts, right_ts + "__r")
        right_ts = right_ts + "__r"
    if left.isStreaming:
        l = ensure_event_time(l, left_ts).withWatermark(left_ts, watermark)
    if right.isStreaming:
        r = ensure_event_time(r, right_ts).withWatermark(right_ts, watermark)
    lts, rts = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    cond = (
        (F.col(f"__l.{on}") == F.col(f"__r.{on}"))
        & (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return (
        l.alias("__l").join(r.alias("__r"), cond, how).drop(F.col(f"__r.{on}"))
    )


def run_stream_to_memory(
    windowed: DataFrame, query_name: str, timeout_s: int = 60
) -> DataFrame:
    """Execute a streaming aggregation into an in-memory sink and return the
    materialized result (test/demo harness for the streaming path)."""
    q = (
        windowed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return windowed.sparkSession.table(query_name)
