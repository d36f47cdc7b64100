"""Event-stream batch analytics: windows, time-series, as-of joins, sketches.

Split from the original single-module registry (round-5 hygiene);
every (PySpark program, DuckDB oracle) pair is unchanged and
registers into ``plans._base.QUERIES``/``ORACLES`` at import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from veri_spark.functions import vector as V  # noqa: F401
from veri_spark.operators import search as S  # noqa: F401
from veri_spark.operators import stats as ST  # noqa: F401
from veri_spark.operators.topk import (  # noqa: F401
    dedup_keep_best,
    topk,
    topk_per_group,
)
from veri_spark.sources.catalog import load_table  # noqa: F401

from veri_spark.plans._base import (  # noqa: F401
    _DD_CENTROIDS,
    _DD_CENTROID_DIST,
    _DD_SHINGLES,
    _DD_SPLIT_SHINGLES,
    _DD_TOKS,
    _PQ_K,
    _PQ_M,
    _PQ_SUB,
    _Q0,
    _REV_DEC,
    _dd_l1,
    _dd_subdist,
    _knn,
    _minhash_seed_values,
    _query_vector,
    _rev_dec,
    _round_half_up,
    register,
)




@register(
    "events_json_filter",
    """
    SELECT event_id, user_id, ROUND(value, 6) AS value
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL AND event_type = 'click'
    ORDER BY value DESC, event_id ASC LIMIT 20
    """,
)
def events_json_filter(spark, sf_dir):
    """F1/F2: JSON path-existence filtering (data/search.go:88-109) + top-k."""
    ev = load_table(spark, sf_dir, "events")
    filtered = S.json_path_filter(ev, "props", ["k"]).filter(
        F.col("event_type") == "click"
    )
    out = topk(filtered, "value", 20, higher_is_better=True, tie_cols=["event_id"])
    return out.select("event_id", "user_id", F.round("value", 6).alias("value"))


@register(
    "events_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*)::BIGINT AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling event-time window aggregation (streaming-capable: the same
    expression runs under readStream + withWatermark; see
    veri_spark/streaming)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )



# ---------------------------------------------------------------------------
# Batch 3: sessionization, distribution stats, rollup, sampling, windows —
# relational/streaming extensions (SURVEY.md sections 2.5/2.6 north star)
# ---------------------------------------------------------------------------


@register(
    "events_type_stats",
    """
    SELECT event_type,
           COUNT(*)::BIGINT AS n,
           ROUND(MEDIAN(value), 6) AS median_value,
           ROUND(STDDEV_SAMP(value), 6) AS stddev_value,
           COUNT(DISTINCT user_id)::BIGINT AS n_users
    FROM events GROUP BY event_type
    """,
)
def events_type_stats(spark, sf_dir):
    """Distribution statistics per group: exact median, sample stddev,
    distinct cardinality (approx_count_distinct is the at-scale variant;
    exact here for the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.median("value"), 6).alias("median_value"),
        F.round(F.stddev_samp("value"), 6).alias("stddev_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "events_sliding_window",
    """
    WITH b AS (
      SELECT date_trunc('minute', ts)
               - (EXTRACT(minute FROM ts)::INT % 30) * INTERVAL 1 MINUTE AS ws,
             event_type, value
      FROM events
    ), u AS (
      SELECT ws, event_type, value FROM b
      UNION ALL
      SELECT ws - INTERVAL 30 MINUTE AS ws, event_type, value FROM b
    )
    SELECT ws AS window_start, event_type,
           COUNT(*)::BIGINT AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM u GROUP BY ws, event_type
    """,
)
def events_sliding_window(spark, sf_dir):
    """Sliding event-time window (1 h length, 30 min slide): each event lands
    in two overlapping windows. Streaming-capable via the same expression
    (veri_spark/streaming/windows.sliding_window_agg); the oracle is the
    union-of-shifted-buckets identity."""
    from veri_spark.streaming.windows import sliding_window_agg

    ev = load_table(spark, sf_dir, "events")
    win = sliding_window_agg(ev, window_length="1 hour", slide="30 minutes")
    return win.select(
        "window_start",
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


@register(
    "asof_last_click",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           c.ts AS last_click_ts,
           ROUND(c.value, 6) AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_last_click(spark, sf_dir):
    """Point-in-time as-of join: each purchase annotated with the user's most
    recent click at or before it. Single-shuffle union formulation
    (operators/asof.py) — no range-join row explosion."""
    from veri_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on=["user_id"], payload_cols=["value"], prefix="last_click_"
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "last_click_ts",
        F.round("last_click_value", 6).alias("last_click_value"),
    )


@register(
    "events_value_quantiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75
    FROM events GROUP BY event_type
    """,
)
def events_value_quantiles(spark, sf_dir):
    """Exact linear-interpolated quantiles per group (percentile_approx with
    tuned accuracy is the 100 TB variant; exact here for the oracle — both
    use the same interpolation rule)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
    )


@register(
    "events_interarrival",
    """
    WITH d AS (
      SELECT user_id,
             epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us)::BIGINT AS n_gaps,
           ((2 * SUM(gap_us) + COUNT(gap_us))
            // (2 * COUNT(gap_us)))::BIGINT / 1000000.0 AS avg_gap_s,
           ROUND(MAX(gap_us) / 1e6, 6) AS max_gap_s
    FROM d GROUP BY user_id
    """,
)
def events_interarrival(spark, sf_dir):
    """Per-user inter-arrival gaps via lag(): general ordered-window surface
    (the window and the groupBy share the user_id partitioning, so the agg
    reuses the window's shuffle).

    Determinism: the gaps are exact integer microseconds, so both engines
    aggregate SUM(gap_us) as BIGINT — order-insensitive — and the 6-decimal
    half-up rounding of the mean happens ENTIRELY in integer arithmetic:
    round_half_up(sum/n) microseconds = (2*sum + n) div (2*n), then one
    double division by 1e6 for display. ROUND(double, 6) is not enough here
    — sum/n is a rational that can land EXACTLY on a 6th-decimal tie (it
    did for one sf0.1 user), where Spark's BigDecimal HALF_UP of the double
    and DuckDB's scaled-multiply round disagree. (Round-5 red driver row;
    re-flagged at sf0.1 by the round-6 strict gate.)"""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # NTZ -> TIMESTAMP (session tz pinned UTC, same instant) -> exact BIGINT us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.withColumn("gap_us", us - F.lag(us).over(w))
    agg = gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").alias("s"),
        F.max("gap_us").alias("mx"),
    )
    return agg.select(
        "user_id",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        (
            F.expr("(2 * s + n_gaps) div (2 * n_gaps)").cast("bigint")
            / F.lit(1000000.0)
        ).alias("avg_gap_s"),
        F.round(F.col("mx") / F.lit(1e6), 6).alias("max_gap_s"),
    )


@register(
    "events_props_extract",
    """
    SELECT event_type,
           COUNT(json_extract(props, '$.k'))::BIGINT AS n_with_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
           ROUND(MAX(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_props_extract(spark, sf_dir):
    """JSON VALUE extraction (beyond F1/F2's existence checks): pull a
    numeric field out of the props document and aggregate it."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.round(F.max(k), 6).alias("max_k"),
    )


@register(
    "events_pivot_by_type",
    """
    SELECT user_id,
           SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::BIGINT AS click,
           SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::BIGINT AS error,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
           SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::BIGINT AS signup,
           SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::BIGINT AS view
    FROM events GROUP BY user_id
    """,
)
def events_pivot_by_type(spark, sf_dir):
    """Pivot to wide format: per-user event counts, one column per type.
    The explicit value list keeps it a single-pass aggregation (no extra
    distinct-values job) — required practice at scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "events_rolling_hour_sum",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS rolling_sum
    FROM events
    WHERE user_id < 5
    """,
)
def events_rolling_hour_sum(spark, sf_dir):
    """Time-RANGE window: per-user sum over the trailing hour (rangeBetween
    on epoch seconds — every event in the window, not a fixed row count)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    sec = F.col("ts").cast("timestamp").cast("double")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_sum"),
    )


@register(
    "interval_join_clicks",
    """
    WITH p AS (SELECT event_id AS p_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p_id, COUNT(*)::BIGINT AS n_clicks
    FROM p JOIN c ON p.user_id = c.user_id
               AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    GROUP BY p_id
    """,
)
def interval_join_clicks(spark, sf_dir):
    """Event-time interval join (clicks within the hour before each
    purchase, per user) through the SAME ``interval_join`` helper the
    streaming path uses — one code path for both executions, which is the
    point: the bounded interval + watermark make streaming state evictable
    (O(rate x window) per key), and on batch frames the identical predicate
    is a plain range join. Aggregated to per-purchase click counts.
    Scale: the join shuffles both sides by user_id once; the time bound
    keeps per-key fanout to one hour of events."""
    from veri_spark.streaming.windows import interval_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", "ts"
    )
    j = interval_join(p, c, on="user_id", lower="-1 hours", upper="0 seconds")
    return j.groupBy("p_id").agg(F.count(F.lit(1)).alias("n_clicks"))


@register(
    "asof_next_error",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         e AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
    SELECT p.event_id, MIN(e.ts) AS next_error_ts
    FROM p LEFT JOIN e ON p.user_id = e.user_id AND e.ts >= p.ts
    GROUP BY p.event_id
    """,
)
def asof_next_error(spark, sf_dir):
    """FORWARD as-of join (time-to-next-event): each purchase annotated
    with the user's next error at-or-after it. Exercises
    asof_join(direction='forward') — the same single-shuffle union plan as
    the backward form (each side shuffles once on user_id, O(1) window
    state), where the naive left join + groupBy-min oracle formulation
    materializes every (purchase, later-error) pair."""
    from veri_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    out = asof_join(
        purchases, errors, on=["user_id"], direction="forward", prefix="next_"
    )
    return out.select("event_id", F.col("next_ts").alias("next_error_ts"))


@register(
    "events_dense_hourly",
    """
    WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS t0,
                           date_trunc('hour', MAX(ts)) AS t1 FROM events),
    spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
              FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (SELECT date_trunc('hour', ts) AS h, event_type,
                      COUNT(*)::BIGINT AS n
               FROM events GROUP BY 1, 2)
    SELECT s.h AS window_start, t.event_type,
           COALESCE(a.n, 0)::BIGINT AS n_events
    FROM spine s CROSS JOIN types t
    LEFT JOIN actual a ON a.h = s.h AND a.event_type = t.event_type
    """,
)
def events_dense_hourly(spark, sf_dir):
    """Time-series densification (gap filling): every (hour, event_type)
    cell over the observed span, zero-filled where no events landed — the
    sparse->dense step before any rolling-window model sees the series.
    The hour spine is GENERATED (sequence + explode from a one-row
    min/max aggregate), never scanned: spine size is time-span x types,
    independent of event volume, so at 100 TB the dense frame is still
    tiny and the only corpus-sized work is the one hourly pre-aggregation
    the left join probes into."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("window_start")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(actual, ["window_start", "event_type"], "left")
        .select(
            "window_start",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@register(
    "asof_nearest_view",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         b AS (SELECT p.event_id, MAX(v.ts) AS ts FROM p LEFT JOIN v
                 ON p.user_id = v.user_id AND v.ts <= p.ts GROUP BY p.event_id),
         f AS (SELECT p.event_id, MIN(v.ts) AS ts FROM p LEFT JOIN v
                 ON p.user_id = v.user_id AND v.ts >= p.ts GROUP BY p.event_id),
         n AS (SELECT p.event_id, p.ts AS pts,
                      CASE WHEN b.ts IS NULL THEN f.ts
                           WHEN f.ts IS NULL THEN b.ts
                           WHEN epoch(f.ts) - epoch(p.ts)
                                < epoch(p.ts) - epoch(b.ts) THEN f.ts
                           ELSE b.ts END AS nts
               FROM p JOIN b USING (event_id) JOIN f USING (event_id))
    SELECT event_id, nts AS nearest_view_ts,
           ROUND(ABS(epoch(nts) - epoch(pts)), 6) AS gap_sec
    FROM n
    """,
)
def asof_nearest_view(spark, sf_dir):
    """NEAREST-direction as-of join: each purchase annotated with the
    user's temporally closest view in EITHER direction (ties -> the
    preceding one, pandas merge_asof(direction='nearest') semantics).
    Exercises asof_join(direction='nearest'), which evaluates both the
    latest-preceding and earliest-following candidates as two frames of
    ONE window over one shuffle — the oracle's two range-join aggregates
    are the formulation that explodes at scale, the operator is the one
    that doesn't."""
    from veri_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join(
        purchases, views, on=["user_id"], direction="nearest", prefix="nearest_"
    )
    gap = F.abs(
        F.col("nearest_ts").cast("timestamp").cast("double")
        - F.col("ts").cast("timestamp").cast("double")
    )
    return out.select(
        "event_id",
        F.col("nearest_ts").alias("nearest_view_ts"),
        F.round(gap, 6).alias("gap_sec"),
    )


@register(
    "event_type_drift_psi",
    """
    WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
                      COUNT(*)::BIGINT AS n
               FROM events GROUP BY 1, 2),
         dt AS (SELECT day, SUM(n) AS tn FROM d GROUP BY day),
         g AS (SELECT event_type, SUM(n) AS gn FROM d GROUP BY event_type),
         gt AS (SELECT SUM(gn) AS tg FROM g)
    SELECT d.day, ROUND(SUM((d.n::DOUBLE / dt.tn - g.gn::DOUBLE / gt.tg)
                            * ln((d.n::DOUBLE / dt.tn)
                                 / (g.gn::DOUBLE / gt.tg))), 6) AS psi
    FROM d JOIN dt USING (day) JOIN g USING (event_type), gt
    GROUP BY d.day
    """,
)
def event_type_drift_psi(spark, sf_dir):
    """Distribution-drift monitor: per-day Population Stability Index of
    the event-type mix against the whole-corpus mix — the standing check a
    training pipeline runs to catch a collection bug shifting the data mix
    before it poisons a training run. Terms exist only for (day, type)
    pairs actually observed (no epsilon smoothing), identically in both
    engines. Plan: one partial-aggregated groupBy over the raw events
    produces |days|x|types| rows; everything after operates on that tiny
    aggregate — day totals and global mix are re-aggregations of it,
    broadcast back. At 100 TB only the first groupBy touches the data."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date(F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    d = d.persist()
    dt = d.groupBy("day").agg(F.sum("n").alias("tn"))
    g = d.groupBy("event_type").agg(F.sum("n").alias("gn"))
    gt = g.agg(F.sum("gn").alias("tg"))
    p = F.col("n").cast("double") / F.col("tn")
    q = F.col("gn").cast("double") / F.col("tg")
    return (
        d.join(F.broadcast(dt), "day")
        .join(F.broadcast(g), "event_type")
        .crossJoin(F.broadcast(gt))
        .groupBy("day")
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"))
    )


@register(
    "value_moments_by_type",
    """
    WITH s AS (SELECT event_type, COUNT(*)::DOUBLE AS n,
                      SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE AS s1,
                      SUM(CAST(value * value AS DECIMAL(28,4)))::DOUBLE AS s2,
                      SUM(CAST(value * value * value AS DECIMAL(38,6)))::DOUBLE AS s3,
                      SUM(CAST(value * value * value * value
                               AS DECIMAL(38,8)))::DOUBLE AS s4
               FROM events GROUP BY event_type)
    SELECT event_type, n::BIGINT AS n_events,
           ROUND(s1 / n, 6) AS mean,
           ROUND(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS std,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) ** 3)
                 / (s2 / n - (s1 / n) * (s1 / n)) ** 1.5, 6) AS skewness,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) ** 2 * (s2 / n) - 3 * (s1 / n) ** 4)
                 / (s2 / n - (s1 / n) * (s1 / n)) ** 2 - 3, 6)
             AS kurtosis_excess
    FROM s
    """,
)
def value_moments_by_type(spark, sf_dir):
    """Higher-moment distribution profile per event type: mean, population
    std, skewness, and excess kurtosis derived from raw power sums — the
    value-distribution fingerprint drift monitors compare across data
    snapshots. Built from SUM(value^k) rather than the engines' skewness()
    / kurtosis() builtins, whose sample-vs-population conventions differ
    between engines; power sums make both sides compute the same formula.
    One partial-aggregated groupBy carries four doubles per type."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        # per-row powers cast to decimal (a deterministic rounding of the
        # identical double in both engines) so the SUMS are exact and
        # order-insensitive; the moment formulas below then run on
        # bit-identical inputs (round-6 determinism sweep)
        F.sum(v.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(28,4)")).cast("double").alias("s2"),
        F.sum((v * v * v).cast("decimal(38,6)")).cast("double").alias("s3"),
        F.sum((v * v * v * v).cast("decimal(38,8)")).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m = s1 / n
    var = s2 / n - m * m
    skew = (s3 / n - 3 * m * (s2 / n) + 2 * F.pow(m, 3)) / F.pow(var, 1.5)
    kurt = (
        s4 / n - 4 * m * (s3 / n) + 6 * F.pow(m, 2) * (s2 / n) - 3 * F.pow(m, 4)
    ) / F.pow(var, 2) - 3
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_events"),
        F.round(m, 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("std"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_excess"),
    )


@register(
    "events_hourly_anomaly",
    """
    WITH h AS (SELECT date_trunc('hour', ts) AS hr, COUNT(*)::BIGINT AS n
               FROM events GROUP BY 1),
         w AS (SELECT hr, n,
                      SUM(n) OVER f AS s1, SUM(n * n) OVER f AS s2,
                      COUNT(*) OVER f AS c
               FROM h
               WINDOW f AS (ORDER BY hr
                            ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT hr, n,
           ROUND((n - s1::DOUBLE / c)
                 / sqrt(s2::DOUBLE / c - (s1::DOUBLE / c) ^ 2), 4) AS z
    FROM w
    WHERE c = 24
      AND abs((n - s1::DOUBLE / c)
              / sqrt(s2::DOUBLE / c - (s1::DOUBLE / c) ^ 2)) >= 2.0
    ORDER BY hr ASC
    """,
)
def events_hourly_anomaly(spark, sf_dir):
    """Volume-anomaly detector: hours whose event count deviates >= 2
    sigma from the trailing 24-hour window — the collection-outage /
    bot-spike alarm a data pipeline runs on every ingest partition. Mean
    and variance come from INTEGER rolling sums (SUM n, SUM n^2 over the
    frame), so the z-score is bit-identical across engines — no
    incremental-stddev drift. One groupBy to hourly grain, then a window
    over the tiny hourly series."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    f = Window.orderBy("hr").rowsBetween(-24, -1)
    w = h.select(
        "hr", "n",
        F.sum("n").over(f).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(f).alias("s2"),
        F.count(F.lit(1)).over(f).alias("c"),
    )
    mu = F.col("s1").cast("double") / F.col("c")
    z = (F.col("n") - mu) / F.sqrt(
        F.col("s2").cast("double") / F.col("c") - mu * mu
    )
    return (
        w.filter(F.col("c") == 24)
        .withColumn("z", z)
        .filter(F.abs("z") >= 2.0)
        .select("hr", "n", F.round("z", 4).alias("z"))
        .orderBy(F.col("hr").asc())
    )


@register(
    "events_weekday_profile",
    """
    SELECT dayofweek(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hr,
           COUNT(*)::BIGINT AS n,
           ROUND(COUNT(*)::DOUBLE
                 / (SELECT COUNT(*) FROM events), 6) AS share
    FROM events GROUP BY 1, 2
    """,
)
def events_weekday_profile(spark, sf_dir):
    """Seasonality fingerprint: event share by (weekday, hour) — the
    168-cell traffic profile drift monitors and capacity planners both
    read. One partial-aggregated groupBy; the denominator is a one-row
    broadcast. DuckDB's dayofweek is 0=Sunday; Spark's dayofweek is
    1=Sunday, so the Spark side shifts by one to match."""
    ev = load_table(spark, sf_dir, "events")
    tot = ev.agg(F.count(F.lit(1)).alias("t"))
    g = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return g.crossJoin(F.broadcast(tot)).select(
        "dow", "hr", "n",
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
    )


@register(
    "events_cusum_scan",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*)::DOUBLE AS n
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type, AVG(n) AS mu FROM h GROUP BY event_type),
    d AS (
      SELECT h.event_type, h.hr, h.n - m.mu AS dev,
             SUM(h.n - m.mu) OVER (PARTITION BY h.event_type
                                   ORDER BY h.hr ASC) AS cusum
      FROM h JOIN m USING (event_type)),
    x AS (
      SELECT event_type, hr, cusum,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, hr ASC) AS rk
      FROM d)
    SELECT event_type, hr AS peak_hour, ROUND(cusum, 6) AS peak_cusum
    FROM x WHERE rk = 1
    ORDER BY event_type ASC
    """,
)
def events_cusum_scan(spark, sf_dir):
    """CUSUM changepoint scan per event type: cumulative deviation of
    hourly counts from the type mean; the hour where |CUSUM| peaks is the
    most likely level-shift point (Page 1954) — the batch form of a
    drift alarm (companion of `events_hourly_anomaly`, which flags
    single-hour z-score spikes; CUSUM finds sustained shifts). Hourly
    pre-aggregation happens FIRST, so the windowed cumulative sum runs
    over |types| x |hours| rows, not raw events; one exchange on
    event_type serves both the window and the argmax."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    m = h.groupBy("event_type").agg(F.avg("n").alias("mu"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hr").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = h.join(F.broadcast(m), "event_type").select(
        "event_type", "hr",
        F.sum(F.col("n") - F.col("mu")).over(wcum).alias("cusum"),
    )
    wrk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("hr").asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("hr").alias("peak_hour"),
            F.round("cusum", 6).alias("peak_cusum"),
        )
        .orderBy(F.col("event_type").asc())
    )


@register(
    "windowed_topk_users",
    """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr, user_id, COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT hr, user_id, n,
             row_number() OVER (PARTITION BY hr
                                ORDER BY n DESC, user_id ASC) AS rk
      FROM h)
    SELECT hr, user_id, n, rk
    FROM r WHERE rk <= 3
    ORDER BY hr ASC, rk ASC
    """,
)
def windowed_topk_users(spark, sf_dir):
    """Top-3 most active users per clock hour — the windowed grouped
    top-k every ops dashboard renders (the event-stream analog of the
    vector path's `knn_grouped_topk`). Hourly pre-aggregation first, so
    the rank window runs over (hour, user) aggregates, not raw events;
    WindowGroupLimit pushes rk<=3 into the sort. One exchange keyed by
    hour for the window after the partial-combined count."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hr"), F.col("user_id")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("hr").orderBy(F.col("n").desc(), F.col("user_id").asc())
    return (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("hr", "user_id", "n", "rk")
        .orderBy(F.col("hr").asc(), F.col("rk").asc())
    )


@register(
    "asof_click_bounded",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 15 MINUTE THEN c.ts END
             AS feat_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 15 MINUTE
                THEN ROUND(c.value, 6) END AS feat_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_bounded(spark, sf_dir):
    """Bounded-staleness as-of join: each purchase annotated with the
    user's most recent click only if it is at most 15 minutes old — the
    `merge_asof(tolerance=...)` semantic a serving-time feature contract
    demands (a stale feature is WORSE than a null one; `asof_last_click`
    is the unbounded form). Same single-shuffle union plan; the tolerance
    is a post-fill predicate, not a join-condition range — the oracle
    states it as the equivalent ASOF-then-void formulation."""
    from veri_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on=["user_id"], payload_cols=["value"],
        prefix="feat_", tolerance_seconds=900,
    )
    return joined.select(
        "purchase_id", "user_id",
        F.col("feat_ts"),
        F.round("feat_value", 6).alias("feat_value"),
    )


@register(
    "value_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
      WHERE e.value IS NOT NULL
    ), mad AS (
      SELECT event_type, ANY_VALUE(med) AS med,
             quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*)::BIGINT AS n,
           ROUND(ANY_VALUE(m.med), 6) AS median_value,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           SUM(CASE WHEN ABS(d.value - m.med) > 3 * 1.4826 * m.mad
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    ORDER BY d.event_type ASC
    """,
)
def value_mad_outliers(spark, sf_dir):
    """Robust outlier detection: per event type, median + MAD (median
    absolute deviation) and the count of values beyond the 3-sigma-
    equivalent robust fence (1.4826*MAD ≈ sigma for normal data) — the
    outlier rule that, unlike mean/std z-scores, is not itself dragged by
    the outliers it hunts (`events_hourly_anomaly` / `value_moments_by_type`
    are the moment-based complements). Two interpolated-median passes
    (both engines use the R-7 quantile) with the 5-row median/MAD tables
    broadcast back between them; shuffles only on the low-cardinality
    type key. At 100 TB the exact medians would swap for the
    `approx_quantile_audit` GK sketch — the fence shape is unchanged."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy(F.col("event_type").asc())
    )


@register(
    "events_watermark_lateness",
    """
    WITH o AS (
      SELECT event_type, ts,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS hwm
      FROM events
    )
    SELECT event_type,
           COUNT(*)::BIGINT AS n_events,
           SUM(CASE WHEN epoch_us(hwm) - epoch_us(ts) > 3600000000::BIGINT
                    THEN 1 ELSE 0 END)::BIGINT AS n_late_1h,
           ROUND(MAX(epoch_us(hwm) - epoch_us(ts)) / 1000000.0, 6)
             AS max_lateness_sec
    FROM o
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def events_watermark_lateness(spark, sf_dir):
    """Watermark-tuning audit: for each event, its lateness against the
    running high-watermark (max event-time seen so far in arrival order,
    proxied by event_id) — then per type, how many events a 1-hour
    watermark would drop and the worst lateness observed. This is the
    batch measurement that decides `withWatermark` bounds for the
    streaming operators (too tight silently drops data; too loose bloats
    state).

    Scale shape: the naive form is a GLOBAL ordered running max — a
    single-partition sort, the classic prefix-scan scale trap. Here it
    decomposes bucket-wise (the distributed prefix-scan): a per-bucket
    running max (window PARTITIONED by bucket — parallel), per-bucket
    maxima (one tiny row per 1000 events), an exclusive prefix max over
    that small bucket table (single partition of n/1000 rows), broadcast
    back, and greatest() of the two. Identical result, no global row
    sort; the oracle computes the same quantity with the naive global
    window, which DuckDB handles fine at audit scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        F.floor(F.col("event_id") / 1000).alias("bucket"),
    )
    wb = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = ev.withColumn("run_max", F.max("ts").over(wb))
    bmax = ev.groupBy("bucket").agg(F.max("ts").alias("bmax"))
    wprev = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bmax.select(
        "bucket", F.max("bmax").over(wprev).alias("prev_max")
    )
    late = (
        within.join(F.broadcast(prefix), "bucket")
        .select(
            "event_type",
            (
                (
                    F.unix_micros(F.greatest(F.col("run_max"), F.coalesce(F.col("prev_max"), F.col("run_max"))))
                    - F.unix_micros(F.col("ts"))
                )
                / 1000000.0
            ).alias("lateness_sec"),
        )
    )
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("lateness_sec") > 3600, 1).otherwise(0))
            .cast("bigint")
            .alias("n_late_1h"),
            F.round(F.max("lateness_sec"), 6).alias("max_lateness_sec"),
        )
        .orderBy(F.col("event_type").asc())
    )



# ---------------------------------------------------------------------------
# Round-5 batch 1 (cont.): Count-Min sketch audit — the mergeable
# frequency sketch complementing the Misra-Gries heavy-hitter path.
# ---------------------------------------------------------------------------


@register(
    "countmin_audit",
    """
    WITH h AS (
      SELECT * FROM (VALUES
        (0, 1103515245::BIGINT, 12345::BIGINT),
        (1, 1299709::BIGINT,    15485863::BIGINT),
        (2, 7919::BIGINT,       50::BIGINT),
        (3, 104729::BIGINT,     1299721::BIGINT)) AS t(depth, a, b)
    ),
    exact AS (SELECT user_id, COUNT(*)::BIGINT AS exact_n
              FROM events GROUP BY user_id),
    cells AS (
      SELECT h.depth,
             ((h.a * e.user_id + h.b) % 2147483647) % 32 AS col,
             SUM(e.exact_n)::BIGINT AS cell_n
      FROM exact e CROSS JOIN h
      GROUP BY 1, 2
    ),
    top AS (SELECT user_id, exact_n FROM exact
            ORDER BY exact_n DESC, user_id ASC LIMIT 10),
    est AS (
      SELECT t.user_id, t.exact_n, MIN(c.cell_n)::BIGINT AS cm_est
      FROM top t
      CROSS JOIN h
      JOIN cells c
        ON c.depth = h.depth
       AND c.col = ((h.a * t.user_id + h.b) % 2147483647) % 32
      GROUP BY t.user_id, t.exact_n
    )
    SELECT user_id, exact_n, cm_est, (cm_est - exact_n)::BIGINT AS overestimate
    FROM est ORDER BY exact_n DESC, user_id ASC
    """,
)
def countmin_audit(spark, sf_dir):
    """Count-Min sketch (depth 4 x width 32, fixed affine hashes mod the
    Mersenne prime 2^31-1) built distributively over the events stream,
    then audited against exact counts for the 10 heaviest users: the
    sketch's one-sided guarantee (cm_est >= exact, overestimate bounded
    by eps*N with prob 1-delta) made measurable. The sketch is 128 cells
    REGARDLESS of stream length — each executor pre-aggregates its
    partition's (depth, col) increments map-side and the merge is a
    cell-wise SUM, which is exactly how you'd maintain it under
    Structured Streaming or across 1000 shards at 100 TB (the mergeable
    counterpart to the Misra-Gries summaries in
    streaming/stateful.py:100-172; heavy_hitters_merge audits those).
    Point estimates are a broadcast join of the 10 probe keys against
    the 128-row cell table, min over depths. All-integer arithmetic —
    no FP in the hashes or counts, so the oracle matches bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    hashes = [
        (0, 1103515245, 12345),
        (1, 1299709, 15485863),
        (2, 7919, 50),
        (3, 104729, 1299721),
    ]
    p = F.lit(2147483647)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    exact = exact.persist()
    # explode each key into its 4 (depth, col) cells map-side, then one
    # partial-aggregated shuffle down to <=128 cells
    cell_structs = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                ((F.lit(a) * F.col("user_id") + F.lit(b)) % p % 32).alias("col"),
            )
            for d, a, b in hashes
        ]
    )
    cells = (
        exact.select(F.explode(cell_structs).alias("c"), "exact_n")
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.col").alias("col"))
        .agg(F.sum("exact_n").cast("bigint").alias("cell_n"))
    )
    top = (
        exact.orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
        .limit(10)
        .select("user_id", "exact_n", F.explode(cell_structs).alias("c"))
        .select("user_id", "exact_n", F.col("c.depth").alias("depth"), F.col("c.col").alias("col"))
    )
    est = (
        top.join(cells, ["depth", "col"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cell_n").cast("bigint").alias("cm_est"))
    )
    return est.select(
        "user_id",
        "exact_n",
        "cm_est",
        (F.col("cm_est") - F.col("exact_n")).cast("bigint").alias("overestimate"),
    ).orderBy(F.col("exact_n").desc(), F.col("user_id").asc())


@register(
    "hourly_autocorr",
    """
    WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS t0,
                           date_trunc('hour', MAX(ts)) AS t1 FROM events),
    spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
              FROM bounds),
    actual AS (SELECT date_trunc('hour', ts) AS h, COUNT(*)::DOUBLE AS n
               FROM events GROUP BY 1),
    c AS (SELECT s.h, COALESCE(a.n, 0.0) AS n
          FROM spine s LEFT JOIN actual a ON a.h = s.h),
    l1 AS (SELECT corr(a.n, b.n) AS r, COUNT(*)::BIGINT AS np
           FROM c a JOIN c b ON a.h = b.h + INTERVAL 1 HOUR),
    l24 AS (SELECT corr(a.n, b.n) AS r, COUNT(*)::BIGINT AS np
            FROM c a JOIN c b ON a.h = b.h + INTERVAL 24 HOUR)
    SELECT l1.np AS n_pairs_lag1, ROUND(l1.r, 6) AS autocorr_lag1,
           l24.np AS n_pairs_lag24, ROUND(l24.r, 6) AS autocorr_lag24
    FROM l1 CROSS JOIN l24
    """,
)
def hourly_autocorr(spark, sf_dir):
    """Seasonality detection on the event stream: Pearson autocorrelation
    of the zero-filled hourly count series at lag 1 (short-term
    persistence) and lag 24 (daily cycle) — the two numbers that decide
    whether a forecasting model needs a seasonal term and whether the
    anomaly detector (`events_hourly_anomaly`) should baseline on
    hour-of-day. The hourly series is a generated spine left-joined to
    one pre-aggregated hourly count (`events_dense_hourly`'s shape), so
    the series length is time-span-sized, not event-volume-sized; the
    lagged pairs are equi-joins on shifted hours over that tiny series.
    At 100 TB only the single hourly pre-aggregation touches the raw
    stream."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("t0"), F.col("t1"), F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    actual = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    c = (
        spine.join(actual, "h", "left")
        .select("h", F.coalesce(F.col("n"), F.lit(0.0)).alias("n"))
        .persist()
    )

    def lag_corr(hours):
        a = c.select(F.col("h").alias("ha"), F.col("n").alias("na"))
        b = c.select(
            (F.col("h") + F.expr(f"INTERVAL {hours} HOUR")).alias("ha"),
            F.col("n").alias("nb"),
        )
        return a.join(b, "ha").agg(
            F.corr("na", "nb").alias("r"), F.count(F.lit(1)).cast("bigint").alias("np")
        )

    l1 = lag_corr(1)
    l24 = lag_corr(24)
    return (
        l1.select(F.col("np").alias("n_pairs_lag1"), F.round("r", 6).alias("autocorr_lag1"))
        .crossJoin(
            F.broadcast(
                l24.select(
                    F.col("np").alias("n_pairs_lag24"),
                    F.round("r", 6).alias("autocorr_lag24"),
                )
            )
        )
    )


@register(
    "hourly_ewma_residuals",
    """
    WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS t0,
                           date_trunc('hour', MAX(ts)) AS t1 FROM events),
    spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
              FROM bounds),
    actual AS (SELECT date_trunc('hour', ts) AS h, COUNT(*)::DOUBLE AS n
               FROM events GROUP BY 1),
    c AS (SELECT s.h, COALESCE(a.n, 0.0) AS n
          FROM spine s LEFT JOIN actual a ON a.h = s.h),
    sm AS (
      SELECT cur.h, cur.n,
             SUM(hist.n * power(0.8, date_diff('hour', hist.h, cur.h)))
               / SUM(power(0.8, date_diff('hour', hist.h, cur.h))) AS ewma
      FROM c cur JOIN c hist
        ON hist.h <= cur.h AND hist.h > cur.h - INTERVAL 24 HOUR
      GROUP BY cur.h, cur.n)
    SELECT h AS hour, n::BIGINT AS n_events,
           ROUND(ewma, 6) AS ewma,
           ROUND(abs(n - ewma), 6) AS abs_residual
    FROM sm
    ORDER BY abs(n - ewma) DESC, h ASC
    LIMIT 10
    """,
)
def hourly_ewma_residuals(spark, sf_dir):
    """Trend-adjusted burst detection: the 10 hours whose event count
    deviates most from a 24-hour truncated-kernel EWMA (decay 0.8/hour,
    weights renormalized over the window) — the smoother that tracks
    slow drift so residuals isolate genuine bursts, where a plain
    rolling mean would lag spikes into its own baseline. The recursive
    EWMA is deliberately TRUNCATED to a 24h kernel so it becomes a
    bounded range self-join on the generated hourly spine (span-sized,
    not event-sized) — the recursion-free formulation a distributed
    engine can actually run; weights are exact powers, summed in
    deterministic per-group hash-agg order over <= 24 terms. The events
    stream contributes one hourly pre-aggregation; everything else is
    spine-sized."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("t0"), F.col("t1"), F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    actual = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    c = (
        spine.join(actual, "h", "left")
        .select("h", F.coalesce(F.col("n"), F.lit(0.0)).alias("n"))
        .persist()
    )
    cur = c.select(F.col("h").alias("ch"), F.col("n").alias("cn"))
    hist = c.select(F.col("h").alias("hh"), F.col("n").alias("hn"))
    lag_h = (F.col("ch").cast("long") - F.col("hh").cast("long")) / 3600
    wgt = F.pow(F.lit(0.8), lag_h)
    sm = (
        cur.join(
            hist,
            (F.col("hh") <= F.col("ch"))
            & (F.col("hh") > F.col("ch") - F.expr("INTERVAL 24 HOUR")),
        )
        .groupBy(F.col("ch").alias("hour"), F.col("cn").alias("n"))
        .agg((F.sum(F.col("hn") * wgt) / F.sum(wgt)).alias("ewma"))
    )
    return (
        sm.orderBy(F.abs(F.col("n") - F.col("ewma")).desc(), F.col("hour").asc())
        .limit(10)
        .select(
            "hour",
            F.col("n").cast("bigint").alias("n_events"),
            F.round("ewma", 6).alias("ewma"),
            F.round(F.abs(F.col("n") - F.col("ewma")), 6).alias("abs_residual"),
        )
    )


@register(
    "windowed_distinct_audit",
    """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour, user_id FROM events),
    ex AS (SELECT hour, COUNT(DISTINCT user_id)::BIGINT AS exact_u
           FROM h GROUP BY hour)
    SELECT COUNT(*)::BIGINT AS n_windows,
           MIN(exact_u)::BIGINT AS min_distinct,
           MAX(exact_u)::BIGINT AS max_distinct,
           SUM(exact_u)::BIGINT AS sum_distinct
    FROM ex
    """,
)
def windowed_distinct_audit(spark, sf_dir):
    """Per-window distinct-user audit: exact distinct counts per hour
    (summary row), run NEXT TO the approx_count_distinct path that the
    streaming windowed-distinct sketch uses — the test suite asserts the
    HLL estimate's rsd contract per window against these exact counts
    (tests/test_streaming_and_multimodal.py::
    test_streaming_windowed_distinct_sketch; `hll_distinct_audit` does
    the corpus-global version). Exact per-window distinct is ONE
    shuffle on (hour, user) with map-side partial dedup; the sum of
    per-window distincts also bounds the streaming sketch's state. The
    oracle checks the exact side; the approximate side's contract stays
    pytest-asserted because DuckDB's approx_count_distinct is a
    different HLL implementation (cross-engine estimate equality is not
    a meaningful target — the CONTRACT is)."""
    ev = load_table(spark, sf_dir, "events")
    ex = (
        ev.select(F.date_trunc("hour", F.col("ts")).alias("hour"), "user_id")
        .groupBy("hour")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_u"))
    )
    return ex.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.min("exact_u").cast("bigint").alias("min_distinct"),
        F.max("exact_u").cast("bigint").alias("max_distinct"),
        F.sum("exact_u").cast("bigint").alias("sum_distinct"),
    )


@register(
    "events_burstiness",
    """
    WITH span AS (
      SELECT (epoch_us(date_trunc('hour', MAX(ts))::TIMESTAMP)
              - epoch_us(date_trunc('hour', MIN(ts))::TIMESTAMP))
             // 3600000000 + 1 AS n_hours
      FROM events),
    uh AS (SELECT user_id, date_trunc('hour', ts) AS hr, COUNT(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
    u AS (SELECT user_id, SUM(n)::BIGINT AS sum_n, SUM(n * n)::BIGINT AS sum_n2,
                 COUNT(*)::BIGINT AS active_hours
          FROM uh GROUP BY user_id)
    SELECT u.user_id, u.sum_n AS n_events, u.active_hours,
           ROUND((s.n_hours * u.sum_n2 - u.sum_n * u.sum_n)
                 / (s.n_hours * u.sum_n), 6) AS fano_factor
    FROM u CROSS JOIN span s
    """,
)
def events_burstiness(spark, sf_dir):
    """Per-user burstiness as the Fano factor (index of dispersion) of
    hourly event counts over the full observation span: var/mean = 1 for a
    Poisson arrival process, >1 bursty, <1 regular — the standard
    dispersion screen run before rate-limit tuning or bot detection.
    Silent hours contribute zero to both power sums, so no hour spine is
    materialized: one grouped pass builds per-(user, hour) counts, a
    second reduces them to integer power sums, and
    fano = (H*sum_n2 - sum_n^2) / (H*sum_n) is ONE division of identical
    BIGINTs (the span length H is integer hours from exact microsecond
    arithmetic). Both shuffles ride the user_id key; the span scalar is a
    broadcast one-row cross join."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    span = ev.agg(
        (
            (
                F.unix_micros(F.date_trunc("hour", F.max("ts")).cast("timestamp"))
                - F.unix_micros(F.date_trunc("hour", F.min("ts")).cast("timestamp"))
            )
            / F.lit(3600000000)
        )
        .cast("bigint")
        .alias("n_hours_raw")
    ).select((F.col("n_hours_raw") + 1).alias("n_hours"))
    uh = ev.groupBy("user_id", hour.alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    u = uh.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_n2"),
        F.count(F.lit(1)).cast("bigint").alias("active_hours"),
    )
    return u.crossJoin(F.broadcast(span)).select(
        "user_id",
        F.col("sum_n").alias("n_events"),
        "active_hours",
        F.round(
            (F.col("n_hours") * F.col("sum_n2") - F.col("sum_n") * F.col("sum_n"))
            / (F.col("n_hours") * F.col("sum_n")),
            6,
        ).alias("fano_factor"),
    )


@register(
    "events_page_hinkley",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2),
    o AS (SELECT event_type, hr, n,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY hr ASC) AS t,
                 SUM(n) OVER (PARTITION BY event_type
                              ORDER BY hr ASC)::BIGINT AS s
          FROM h),
    term AS (SELECT event_type, hr, t,
                    1000000 * n - CAST(round(1e6 * s / t) AS BIGINT) AS dev
             FROM o),
    ph AS (SELECT event_type, hr, t,
                  SUM(dev) OVER (PARTITION BY event_type
                                 ORDER BY hr ASC)::BIGINT AS m_t
           FROM term),
    g AS (SELECT event_type, hr, t, m_t,
                 m_t - LEAST(MIN(m_t) OVER (PARTITION BY event_type
                                            ORDER BY hr ASC), 0)::BIGINT
                   AS gap
          FROM ph),
    x AS (SELECT event_type, hr, gap, t,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY gap DESC, hr ASC) AS rk,
                 MAX(t) OVER (PARTITION BY event_type) AS n_hours
          FROM g)
    SELECT event_type, hr AS peak_hour, gap AS ph_gap_micro, n_hours
    FROM x WHERE rk = 1
    ORDER BY event_type ASC
    """,
)
def events_page_hinkley(spark, sf_dir):
    """Page-Hinkley upward-shift detector per event type (Page 1954, the
    sequential sibling of `events_cusum_scan`): m_t accumulates each
    hour's deviation from the RUNNING mean (not the full-series mean
    CUSUM uses — PH is computable online), and the alarm statistic is
    m_t minus its running minimum; the hour where that gap peaks is
    where a sustained rate increase is most evident. Reported in micro-
    events so the whole recursion is exact BIGINT arithmetic: the only
    float op is the one correctly-rounded division 1e6*S_t/t per hour
    (micro-quantized immediately; any exact .5 is a dyadic rational both
    engines represent and round identically), so the cumulative sums
    and running minima are order-exact integers — no float accumulates
    across rows in either engine.

    Scale shape: hourly pre-aggregation first (one partial-aggregated
    corpus scan); every window is PARTITIONED by event_type over the
    calendar-bounded |types| x |hours| frame."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    word = Window.partitionBy("event_type").orderBy(F.col("hr").asc())
    wcum = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = h.select(
        "event_type",
        "hr",
        "n",
        F.row_number().over(word).alias("t"),
        F.sum("n").over(wcum).cast("bigint").alias("s"),
    )
    term = o.select(
        "event_type",
        "hr",
        "t",
        (
            F.lit(1000000) * F.col("n")
            - F.round(F.lit(1e6) * F.col("s") / F.col("t")).cast("bigint")
        ).alias("dev"),
    )
    ph = term.select(
        "event_type",
        "hr",
        "t",
        F.sum("dev").over(wcum).cast("bigint").alias("m_t"),
    )
    g = ph.select(
        "event_type",
        "hr",
        "t",
        "m_t",
        (
            F.col("m_t")
            - F.least(F.min("m_t").over(wcum).cast("bigint"), F.lit(0))
        ).alias("gap"),
    )
    wrk = Window.partitionBy("event_type").orderBy(
        F.col("gap").desc(), F.col("hr").asc()
    )
    wall = Window.partitionBy("event_type")
    return (
        g.select(
            "event_type",
            "hr",
            "gap",
            F.row_number().over(wrk).alias("rk"),
            F.max("t").over(wall).alias("n_hours"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("hr").alias("peak_hour"),
            F.col("gap").alias("ph_gap_micro"),
            "n_hours",
        )
        .orderBy(F.col("event_type").asc())
    )


@register(
    "funnel_view_click_purchase",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS tc
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.tv
          GROUP BY e.user_id),
    p AS (SELECT e.user_id
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.tc
          GROUP BY e.user_id),
    s AS (SELECT (SELECT COUNT(*)::BIGINT FROM v) AS n_view,
                 (SELECT COUNT(*)::BIGINT FROM c) AS n_click,
                 (SELECT COUNT(*)::BIGINT FROM p) AS n_purchase)
    SELECT n_view AS n_view_users,
           n_click AS n_click_after_view,
           n_purchase AS n_purchase_after_click,
           CASE WHEN n_view > 0
                THEN CAST(round(1e6 * n_click / n_view) AS BIGINT)
                ELSE NULL END AS click_rate_micro,
           CASE WHEN n_click > 0
                THEN CAST(round(1e6 * n_purchase / n_click) AS BIGINT)
                ELSE NULL END AS purchase_rate_micro
    FROM s
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered three-step funnel: users whose first VIEW is later
    followed by a click, whose first such click is later followed by a
    purchase — the strictly-ordered conversion funnel (an event of the
    right type but BEFORE the prior stage does not count, which is what
    separates a funnel from three independent counts and is why the
    naive GROUP BY intersection overstates conversion). Stage anchors
    are first-occurrence timestamps, so the whole funnel is two
    conditional min-aggregates chained by equi-joins on user_id — after
    the first shuffle every stage is co-partitioned on the same key, the
    100 TB shape (no window over a user's full history, no sessionize).
    Counts are exact integers; the stage-to-stage rates are
    micro-quantized with empty-stage guards mirrored in both engines.
    Timestamps are microsecond-exact in both engines (the NANOS
    truncation in sources/catalog.load_table matches DuckDB's coercion),
    so the strict > comparisons agree."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase"))
    s = nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))
    rate = lambda a, b: F.when(  # noqa: E731
        F.col(b) > 0,
        F.round(F.lit(1e6) * F.col(a) / F.col(b)).cast("bigint"),
    )
    return s.select(
        F.col("n_view").alias("n_view_users"),
        F.col("n_click").alias("n_click_after_view"),
        F.col("n_purchase").alias("n_purchase_after_click"),
        rate("n_click", "n_view").alias("click_rate_micro"),
        rate("n_purchase", "n_click").alias("purchase_rate_micro"),
    )


@register(
    "weekly_retention_cohorts",
    """
    WITH d0 AS (SELECT MIN(ts::DATE) AS day0 FROM events),
    uw AS (SELECT DISTINCT user_id,
                  (date_diff('day', d0.day0, ts::DATE) // 7)::BIGINT AS wk
           FROM events CROSS JOIN d0),
    fu AS (SELECT user_id, MIN(wk)::BIGINT AS cohort_week FROM uw
           GROUP BY user_id),
    act AS (SELECT fu.cohort_week, (uw.wk - fu.cohort_week)::BIGINT
                     AS offset_week,
                   COUNT(*)::BIGINT AS n_active
            FROM uw JOIN fu USING (user_id)
            GROUP BY 1, 2),
    sz AS (SELECT cohort_week, COUNT(*)::BIGINT AS n_cohort FROM fu
           GROUP BY cohort_week)
    SELECT a.cohort_week, a.offset_week, a.n_active, s.n_cohort,
           CAST(round(1e6 * a.n_active / s.n_cohort) AS BIGINT)
             AS retention_micro
    FROM act a JOIN sz s USING (cohort_week)
    ORDER BY a.cohort_week ASC, a.offset_week ASC
    """,
)
def weekly_retention_cohorts(spark, sf_dir):
    """Classic retention triangle: users grouped into weekly cohorts by
    their FIRST event week, each cohort's share still active k weeks
    later — the table behind every retention curve, and the
    longitudinal complement of `scd2_intervals_from_events` (state over
    time) and `kaplan_meier_time_to_purchase` (time to one event).
    Weeks are integer 7-day buckets from the corpus's first day (NOT
    ISO weekofyear, whose year-boundary and locale semantics differ
    cross-engine); the cohort is MIN(week) per user, which equals the
    first-event week because the bucket function is monotone. On this
    corpus first events cluster on few days (TESTDATA quirk), so small
    SFs yield few cohorts — the shape, not the row count, is what
    scales. One distinct (user, week) aggregate, one user-grain
    min-aggregate (co-partitioned after the first shuffle), one
    bounded-domain (weeks^2 / 2) output frame; n_active counts DISTINCT
    users by construction of uw. All-integer output except the guarded
    micro rate (n_cohort >= 1 structurally: every cohort contains its
    own week-0 users)."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.col("ts").cast("date")).alias("day0"))
    # integer `div` for the 7-day bucket (datediff >= 0, so div == floor
    # == DuckDB's //)
    uw = (
        ev.crossJoin(F.broadcast(d0))
        .select(
            "user_id",
            F.expr(
                "CAST(datediff(CAST(ts AS DATE), day0) div 7 AS BIGINT)"
            ).alias("wk"),
        )
        .distinct()
    )
    fu = uw.groupBy("user_id").agg(
        F.min("wk").cast("bigint").alias("cohort_week")
    )
    act = (
        uw.join(fu, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).cast("bigint").alias(
                "offset_week"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    sz = fu.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    return (
        act.join(F.broadcast(sz), "cohort_week")
        .select(
            "cohort_week",
            "offset_week",
            "n_active",
            "n_cohort",
            F.round(F.lit(1e6) * F.col("n_active") / F.col("n_cohort"))
            .cast("bigint")
            .alias("retention_micro"),
        )
        .orderBy(F.col("cohort_week").asc(), F.col("offset_week").asc())
    )
