"""Event-stream batch analytics: windows, sessions, as-of joins, behavior audits.

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
    "events_sessionize",
    """
    WITH o AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events),
    f AS (SELECT user_id,
                 CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM o)
    SELECT user_id, SUM(new_s)::BIGINT AS n_sessions FROM f GROUP BY user_id
    """,
)
def events_sessionize(spark, sf_dir):
    """Session windows (30-minute inactivity gap) per user — the batch form
    of streaming/windows.session_window_agg; the oracle is the classic
    gaps-and-islands formulation."""
    from veri_spark.streaming.windows import session_window_agg

    ev = load_table(spark, sf_dir, "events")
    sessions = session_window_agg(ev, gap="30 minutes", group_cols=("user_id",))
    return sessions.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))



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
           ROUND(SUM(gap_us) / COUNT(gap_us) / 1e6, 6) AS avg_gap_s,
           ROUND(MAX(gap_us) / 1e6, 6) AS max_gap_s
    FROM d GROUP BY user_id
    """,
)
def events_interarrival(spark, sf_dir):
    """Per-user inter-arrival gaps via lag(): general ordered-window surface
    (the window and the groupBy share the user_id partitioning, so the agg
    reuses the window's shuffle).

    Determinism: the gaps are exact integer microseconds, so both engines
    aggregate SUM(gap_us) as BIGINT — order-insensitive — and derive the
    rounded seconds from ONE identical integer pair (sum, n). The earlier
    ROUND(AVG(double)) form flipped the 6th decimal between engines when the
    true mean sat within half an ulp of the rounding boundary (round-5 red
    driver row)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # NTZ -> TIMESTAMP (session tz pinned UTC, same instant) -> exact BIGINT us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.withColumn("gap_us", us - F.lag(us).over(w))
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.sum("gap_us") / F.count("gap_us") / F.lit(1e6), 6).alias("avg_gap_s"),
        F.round(F.max("gap_us") / F.lit(1e6), 6).alias("max_gap_s"),
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
    "events_session_bounds",
    """
    SELECT DISTINCT user_id,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id)  OVER w AS last_event,
           COUNT(*) OVER w AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def events_session_bounds(spark, sf_dir):
    """first_value / last_value over an unbounded frame: each user's first
    and last event id plus their event count (one row per user via
    DISTINCT; the window and distinct share the user_id partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
        F.count(F.lit(1)).over(w).alias("n_events"),
    ).distinct()



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
    "event_funnel_steps",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS tc FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
    p AS (SELECT e.user_id FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v)::BIGINT AS n_view,
           (SELECT COUNT(*) FROM c)::BIGINT AS n_view_click,
           (SELECT COUNT(*) FROM p)::BIGINT AS n_full_funnel
    """,
)
def event_funnel_steps(spark, sf_dir):
    """Ordered three-step funnel (view -> later click -> later purchase),
    counted by users reaching each stage. Each stage is a per-user MIN
    aggregate joined to the next stage's filtered events — three shuffles,
    all keyed on user_id so a co-partitioned events table reuses one
    exchange; per-user state is a single timestamp, never an event list
    (the sessionize-then-sort formulation would sort every user's full
    history)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
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
        .select("user_id")
        .distinct()
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_full_funnel"))
    return nv.crossJoin(nc).crossJoin(np_)



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
    "user_retention_cohorts",
    """
    WITH wk AS (SELECT DISTINCT user_id,
                       date_trunc('week', ts)::TIMESTAMP AS w FROM events),
    cohort AS (SELECT user_id, MIN(w) AS c FROM wk GROUP BY user_id)
    SELECT cohort.c AS cohort_week,
           (date_diff('day', cohort.c, wk.w) / 7)::BIGINT AS week_offset,
           COUNT(*)::BIGINT AS n_active
    FROM wk JOIN cohort ON wk.user_id = cohort.user_id
    GROUP BY 1, 2
    """,
)
def user_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-active week, and
    for each later week-offset how many of that cohort were active — the
    engagement table every growth dashboard is built on. (user, week)
    pairs are pre-distinct'd so a user's event volume never inflates the
    join; the cohort side is one MIN per user. Both shuffles key on
    user_id (co-partitioned input reuses one exchange); counts are exact
    integers so the oracle comparison is rounding-free."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    cohort = wk.groupBy("user_id").agg(F.min("w").alias("c"))
    return (
        wk.join(cohort, "user_id")
        .groupBy(
            F.col("c").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("c")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
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
    "user_decay_scores",
    """
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
         t AS (SELECT user_id,
                      FLOOR(1000000 * exp(-(epoch(mx.m) - epoch(ts)) / 86400.0)
                            + 0.5)::BIGINT AS w
               FROM events, mx)
    SELECT user_id, COUNT(*)::BIGINT AS n_events,
           SUM(w)::BIGINT AS decay_micro
    FROM t GROUP BY user_id
    ORDER BY decay_micro DESC, user_id ASC LIMIT 20
    """,
)
def user_decay_scores(spark, sf_dir):
    """Recency-weighted activity score: each event contributes
    exp(-age/1d) relative to the corpus's newest event, the standard
    time-decay weighting for freshness-aware ranking and retention
    scoring. Each term is rounded to integer micro-units BEFORE the sum,
    so the aggregate is summation-order-proof across engines. The max
    timestamp is a one-row broadcast; scoring is map-side; one
    partial-aggregated groupBy then a bounded top-20."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    age = F.col("m").cast("timestamp").cast("double") - F.col("ts").cast(
        "timestamp"
    ).cast("double")
    t = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.floor(1000000 * F.exp(-age / 86400.0) + 0.5).cast("bigint").alias("w"),
    )
    scored = t.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("w").cast("bigint").alias("decay_micro"),
    )
    return scored.orderBy(
        F.col("decay_micro").desc(), F.col("user_id").asc()
    ).limit(20)



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
    "event_rate_limit",
    """
    WITH r AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events)
    SELECT event_type, COUNT(*)::BIGINT AS total,
           SUM(CASE WHEN rn <= 3 THEN 1 ELSE 0 END)::BIGINT AS kept,
           SUM(CASE WHEN rn > 3 THEN 1 ELSE 0 END)::BIGINT AS dropped
    FROM r GROUP BY event_type
    """,
)
def event_rate_limit(spark, sf_dir):
    """Per-user token-bucket rate limiting, batch form: keep the first 3
    events per (user, clock-hour), report kept/dropped per type — the
    ingest-throttling / abuse-damping primitive a serving layer needs in
    front of a 100 TB event store. One shuffle on (user_id, hour) for the
    row_number (high-cardinality composite key, so no skew hot-spot even
    for a heavy user — their traffic splits across hours), one partial
    agg on event_type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    r = ev.select("event_type", F.row_number().over(w).alias("rn"))
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(F.col("rn") <= 3, 1).otherwise(0)).cast("bigint").alias("kept"),
        F.sum(F.when(F.col("rn") > 3, 1).otherwise(0)).cast("bigint").alias("dropped"),
    )



@register(
    "event_run_lengths",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC, event_id ASC) AS rt
      FROM events),
    runs AS (
      SELECT user_id, event_type, rn - rt AS grp,
             COUNT(*)::BIGINT AS run_len, MIN(ts) AS run_start
      FROM o GROUP BY 1, 2, 3)
    SELECT user_id, event_type, run_len, run_start
    FROM runs
    ORDER BY run_len DESC, user_id ASC, run_start ASC, event_type ASC
    LIMIT 20
    """,
)
def event_run_lengths(spark, sf_dir):
    """Gaps-and-islands run-length encoding: the 20 longest streaks of a
    user emitting the same event_type consecutively — behavioral-loop
    detection (bot bursts, rage-clicks) expressed as the classic
    rn - rn_per_type group constant. Both row_numbers partition on
    user_id (the second adds event_type), so the heavy sort happens once
    per key family; the run aggregation is partial-combined; top-k is
    bounded with a total deterministic tie-break."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    o = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    runs = o.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len"),
        F.min("ts").alias("run_start"),
    )
    return (
        runs.select("user_id", "event_type", "run_len", "run_start")
        .orderBy(
            F.col("run_len").desc(),
            F.col("user_id").asc(),
            F.col("run_start").asc(),
            F.col("event_type").asc(),
        )
        .limit(20)
    )



# ---------------------------------------------------------------------------
# Round-4 batch 2: behavioral modeling, sparse similarity, feature audits
# ---------------------------------------------------------------------------

@register(
    "event_transition_matrix",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS nxt
      FROM events),
    t AS (SELECT event_type AS cur, nxt FROM o WHERE nxt IS NOT NULL),
    c AS (SELECT cur, nxt, COUNT(*)::BIGINT AS n FROM t GROUP BY cur, nxt),
    tot AS (SELECT cur, SUM(n) AS tn FROM c GROUP BY cur)
    SELECT c.cur, c.nxt, c.n,
           ROUND(c.n / tot.tn, 6) AS p
    FROM c JOIN tot USING (cur)
    ORDER BY cur ASC, nxt ASC
    """,
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams:
    P(next_type | current_type) — the behavioral model behind next-action
    prediction and funnel-drop analysis. One shuffle on user_id for the
    lead() ordering, then a |types|^2-row aggregate (partial-combined);
    the denominator join is a broadcast of a |types|-row table. At 100 TB
    the per-user sort is the only real cost and rides a single exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    o = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = o.groupBy("cur", "nxt").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.groupBy("cur").agg(F.sum("n").alias("tn"))
    return (
        c.join(F.broadcast(tot), "cur")
        .select("cur", "nxt", "n", F.round(F.col("n") / F.col("tn"), 6).alias("p"))
        .orderBy(F.col("cur").asc(), F.col("nxt").asc())
    )



@register(
    "user_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*)::DOUBLE AS n
      FROM events GROUP BY user_id, event_type),
    t AS (SELECT user_id, SUM(n) AS tn FROM c GROUP BY user_id),
    h AS (
      SELECT c.user_id,
             -SUM((c.n / t.tn) * ln(c.n / t.tn) / ln(2)) AS ent,
             MAX(t.tn) AS n_events
      FROM c JOIN t USING (user_id) GROUP BY c.user_id)
    SELECT user_id, ROUND(ent, 6) AS entropy_bits,
           n_events::BIGINT AS n_events
    FROM h
    ORDER BY entropy_bits DESC, user_id ASC LIMIT 25
    """,
)
def user_entropy(spark, sf_dir):
    """Behavioral diversity score: Shannon entropy (bits) of each user's
    event-type distribution, top-25 most-diverse users — bot/power-user
    triage reads this (uniform behavior = high entropy, single-action
    automation = 0). Two partial-aggregated shuffles on user_id (the
    second reuses the first's partitioning) and a bounded top-k. The
    -sum(p ln p) terms are accumulated per (user,type) BEFORE the group
    sum, so the entropy is an order-insensitive aggregate."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    t = c.groupBy("user_id").agg(F.sum("n").alias("tn"))
    h = (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            (-F.sum((F.col("n") / F.col("tn")) * F.log(F.col("n") / F.col("tn")) / F.log(F.lit(2.0)))).alias("ent"),
            F.max("tn").alias("n_events"),
        )
    )
    return (
        h.select(
            "user_id",
            F.round("ent", 6).alias("entropy_bits"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy(F.col("entropy_bits").desc(), F.col("user_id").asc())
        .limit(25)
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
    "session_conversion",
    """
    WITH o AS (
      SELECT user_id, ts, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    agg AS (
      SELECT user_id, sid, MIN(ts) AS session_start,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      FROM s GROUP BY user_id, sid)
    SELECT hour(session_start)::BIGINT AS start_hour,
           COUNT(*)::BIGINT AS n_sessions,
           SUM(CASE WHEN first_view IS NOT NULL AND last_purchase >= first_view
                    THEN 1 ELSE 0 END)::BIGINT AS n_converted,
           ROUND(SUM(CASE WHEN first_view IS NOT NULL AND last_purchase >= first_view
                          THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6) AS conversion_rate
    FROM agg GROUP BY 1 ORDER BY start_hour ASC
    """,
)
def session_conversion(spark, sf_dir):
    """View-to-purchase conversion at SESSION grain by start hour: a
    session (30-min inactivity gap, same definition `events_sessionize`
    proves against the gaps-and-islands oracle) converts when it contains
    a purchase at-or-after its first view. Spark side uses the native
    session_window aggregation — per-session conditional mins/maxes in ONE
    user_id exchange — against the oracle's lag/cumsum islands
    formulation; identical session boundaries, independently derived."""
    from veri_spark.streaming.windows import ensure_event_time

    ev = ensure_event_time(load_table(spark, sf_dir, "events"))
    agg = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_purchase"),
        )
    )
    conv = F.when(
        F.col("first_view").isNotNull()
        & (F.col("last_purchase") >= F.col("first_view")),
        1,
    ).otherwise(0)
    return (
        agg.groupBy(F.hour("session_start").cast("bigint").alias("start_hour"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(conv).cast("bigint").alias("n_converted"),
            F.round(
                F.sum(conv).cast("double") / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
        )
        .orderBy(F.col("start_hour").asc())
    )



@register(
    "event_path_trigrams",
    """
    WITH o AS (
      SELECT user_id, event_type AS a,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC) AS b,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC) AS c
      FROM events)
    SELECT a, b, c, COUNT(*)::BIGINT AS n
    FROM o WHERE b IS NOT NULL AND c IS NOT NULL
    GROUP BY a, b, c
    ORDER BY n DESC, a ASC, b ASC, c ASC LIMIT 15
    """,
)
def event_path_trigrams(spark, sf_dir):
    """Top 3-step behavioral paths across user streams — the clickstream
    pattern-mining grain one up from `event_transition_matrix`'s bigram
    probabilities (paths expose the funnel orderings a first-order chain
    cannot). Both lead() offsets ride ONE user_id exchange and one sort;
    the path aggregate is |types|^3-bounded and partial-combined."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    o = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).filter(F.col("b").isNotNull() & F.col("c").isNotNull())
    return (
        o.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc(), F.col("c").asc())
        .limit(15)
    )



# ---------------------------------------------------------------------------
# Round-4 batch 7: windowed top-k, concentration (Gini), independence audit
# ---------------------------------------------------------------------------

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
    "session_first_touch",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    agg AS (
      SELECT user_id, sid,
             MIN(ts) AS t0,
             arg_min(event_type, ts || '|' || lpad(event_id::VARCHAR, 12, '0')) AS first_type,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM s GROUP BY user_id, sid)
    SELECT first_type,
           COUNT(*)::BIGINT AS n_sessions,
           SUM(converted)::BIGINT AS n_converted,
           ROUND(SUM(converted)::DOUBLE / COUNT(*), 6) AS conversion_rate
    FROM agg GROUP BY first_type ORDER BY first_type ASC
    """,
)
def session_first_touch(spark, sf_dir):
    """First-touch attribution at session grain: sessions bucketed by
    their FIRST event type, with purchase-conversion rate per bucket —
    which entry action starts the sessions that convert
    (`session_conversion` slices the same sessions by start hour; this
    slices by entry action). The first-type argmin and the converted
    flag ride the same per-session aggregate; the deterministic
    first-event rule is (ts, event_id) lexicographic in BOTH engines."""
    from veri_spark.streaming.windows import ensure_event_time

    ev = ensure_event_time(load_table(spark, sf_dir, "events"))
    agg = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min_by(
                "event_type",
                F.concat(
                    F.col("ts").cast("string"),
                    F.lit("|"),
                    F.lpad(F.col("event_id").cast("string"), 12, "0"),
                ),
            ).alias("first_type"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    return (
        agg.groupBy("first_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.round(
                F.sum("converted").cast("double") / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
        )
        .orderBy(F.col("first_type").asc())
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
    "markov_prediction_accuracy",
    """
    WITH o AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS nxt
      FROM events),
    t AS (SELECT user_id, cur, nxt FROM o WHERE nxt IS NOT NULL),
    trc AS (SELECT cur, nxt, COUNT(*)::BIGINT AS n
            FROM t WHERE user_id % 2 = 0 GROUP BY cur, nxt),
    pred AS (
      SELECT cur, nxt AS predicted_next,
             row_number() OVER (PARTITION BY cur ORDER BY n DESC, nxt ASC) AS r
      FROM trc),
    p AS (SELECT cur, predicted_next FROM pred WHERE r = 1),
    ev AS (SELECT cur, nxt FROM t WHERE user_id % 2 = 1)
    SELECT ev.cur, p.predicted_next,
           COUNT(*)::BIGINT AS n_eval,
           SUM(CASE WHEN ev.nxt = p.predicted_next THEN 1 ELSE 0 END)::BIGINT
             AS n_hit,
           ROUND(SUM(CASE WHEN ev.nxt = p.predicted_next THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS accuracy
    FROM ev JOIN p USING (cur)
    GROUP BY ev.cur, p.predicted_next
    ORDER BY ev.cur ASC
    """,
)
def markov_prediction_accuracy(spark, sf_dir):
    """Next-event prediction eval for the first-order Markov model
    (`event_transition_matrix` is the model; this is its scorecard):
    train the argmax-next-type predictor on even user_ids, measure hit
    rate on odd users' transitions, per current type. The user-hash
    train/eval split keeps each user's event chain intact (splitting
    within a chain would fabricate transitions); transitions are one
    lead() window per side of the same shuffle, the model is a
    |types|^2 aggregate, and scoring is a broadcast join of the
    |types|-row predictor against pre-aggregated eval transitions.
    Prediction ties break on the lexicographically smaller type —
    deterministic in both engines. Eval transitions whose current type
    never occurs in training drop out (inner join, documented)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    t = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trc = (
        t.filter(F.col("user_id") % 2 == 0)
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wr = Window.partitionBy("cur").orderBy(F.col("n").desc(), F.col("nxt").asc())
    p = (
        trc.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select("cur", F.col("nxt").alias("predicted_next"))
    )
    evl = t.filter(F.col("user_id") % 2 == 1).select("cur", "nxt")
    hit = F.when(F.col("nxt") == F.col("predicted_next"), 1).otherwise(0)
    return (
        evl.join(F.broadcast(p), "cur")
        .groupBy("cur", "predicted_next")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum(hit).cast("bigint").alias("n_hit"),
            F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 6).alias(
                "accuracy"
            ),
        )
        .orderBy(F.col("cur").asc())
    )


@register(
    "user_rfm_segments",
    """
    WITH mx AS (SELECT MAX(ts) AS now FROM events),
    u AS (
      SELECT user_id,
             date_diff('second', MAX(ts), ANY_VALUE(mx.now)) AS rec_sec,
             COUNT(*)::BIGINT AS freq,
             SUM(value) AS mon
      FROM events CROSS JOIN mx
      GROUP BY user_id),
    s AS (
      SELECT user_id,
             ntile(5) OVER (ORDER BY rec_sec ASC, user_id ASC) AS r_score,
             ntile(5) OVER (ORDER BY freq DESC, user_id ASC) AS f_score,
             ntile(5) OVER (ORDER BY mon DESC, user_id ASC) AS m_score
      FROM u)
    SELECT r_score, f_score, m_score, COUNT(*)::BIGINT AS n_users
    FROM s
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def user_rfm_segments(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary quintiles) of the
    user base — the classic behavioral cohorting that drives retention
    targeting, here as the segment-size matrix. Per-user metrics are one
    partial-aggregated shuffle over the stream; quintile scores are
    three ntile windows over the USER table (already N/|users| smaller
    than the stream), with (metric, user_id) total orders so bucket
    boundaries are deterministic; the output is the <=125-row segment
    census. At 100 TB the global ntile sort is the only single-ordering
    step and it runs on users, not events — if even that is too hot,
    swap ntile for approx-quantile boundaries (the
    `events_value_quantiles` sketch) at the cost of exactness."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("now"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            (F.unix_timestamp(F.max("now")) - F.unix_timestamp(F.max("ts"))).alias(
                "rec_sec"
            ),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("value").alias("mon"),
        )
    )
    s = u.select(
        F.ntile(5)
        .over(Window.orderBy(F.col("rec_sec").asc(), F.col("user_id").asc()))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("freq").desc(), F.col("user_id").asc()))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("mon").desc(), F.col("user_id").asc()))
        .alias("m_score"),
    )
    return (
        s.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "session_survival_curve",
    """
    WITH o AS (SELECT user_id, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
               FROM events),
    f AS (SELECT user_id, ts, event_id,
                 CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM o),
    s AS (SELECT user_id, ts, event_id,
                 SUM(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS sess
          FROM f),
    ln AS (SELECT user_id, sess, COUNT(*)::BIGINT AS len
           FROM s GROUP BY user_id, sess),
    tot AS (SELECT COUNT(*)::DOUBLE AS n FROM ln),
    k AS (SELECT unnest(range(1, 11)) AS k)
    SELECT k.k::INTEGER AS k,
           SUM(CASE WHEN ln.len >= k.k THEN 1 ELSE 0 END)::BIGINT AS n_surviving,
           ROUND(SUM(CASE WHEN ln.len >= k.k THEN 1 ELSE 0 END)
                 / ANY_VALUE(tot.n), 6) AS survival
    FROM ln CROSS JOIN k CROSS JOIN tot
    GROUP BY k.k
    ORDER BY k.k ASC
    """,
)
def session_survival_curve(spark, sf_dir):
    """Session-depth survival curve: P(session reaches >= k events) for
    k = 1..10 — the engagement-depth distribution product teams read
    before deciding where a funnel loses people, and the
    discrete-survival shape (one minus the CDF) any duration analysis
    uses. Sessions are the same 30-minute-gap islands as
    `events_sessionize` (lag + running flag-sum on one user-keyed
    shuffle); session lengths are one aggregate; the curve is a
    broadcast of 10 thresholds against the session-length table with
    the count riding the threshold key — the events stream is read
    once."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # full-precision gap compare: NTZ subtraction yields a day-time
    # interval, compared against the literal — unix_timestamp() TRUNCATES
    # sub-second parts and split one 1799.x-s gap differently at sf0.1
    new_s = F.when(
        F.col("prev").isNull()
        | ((F.col("ts") - F.col("prev")) >= F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    s = (
        ev.select("user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev"))
        .select("user_id", "ts", "event_id", new_s.alias("new_s"))
        .select(
            "user_id",
            F.sum("new_s")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("sess"),
        )
    )
    ln = s.groupBy("user_id", "sess").agg(F.count(F.lit(1)).cast("bigint").alias("len"))
    tot = ln.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ks = spark.range(1, 11).select(F.col("id").cast("int").alias("k"))
    surv = F.sum(F.when(F.col("len") >= F.col("k"), 1).otherwise(0))
    return (
        ln.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            surv.cast("bigint").alias("n_surviving"),
            F.round(surv / F.max("n"), 6).alias("survival"),
        )
        .orderBy(F.col("k").asc())
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
    "event_type_cooccurrence_lift",
    """
    WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
    nu AS (SELECT COUNT(DISTINCT user_id)::DOUBLE AS n FROM events),
    s AS (SELECT event_type, COUNT(*)::DOUBLE AS n FROM u GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*)::BIGINT AS n_both
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_both,
           ROUND(p.n_both * ANY_VALUE(nu.n) / (sa.n * sb.n), 6) AS lift
    FROM p
    JOIN s sa ON sa.event_type = p.type_a
    JOIN s sb ON sb.event_type = p.type_b
    CROSS JOIN nu
    GROUP BY p.type_a, p.type_b, p.n_both, sa.n, sb.n
    ORDER BY p.type_a ASC, p.type_b ASC
    """,
)
def event_type_cooccurrence_lift(spark, sf_dir):
    """User-grain behavior co-occurrence: for each unordered pair of event
    types, how many users exhibit BOTH, and the lift against
    independence — the segmentation signal `event_transition_matrix`
    cannot give (transitions are adjacent and ordered; this is
    whole-history and unordered, e.g. 'users who ever purchase also
    ever error?'). The self-join is on user_id over the DISTINCT
    (user, type) projection, so fan-out is bounded by |types|^2 per
    user — the basket-quadratic shape of `copurchase_top_pairs` with
    users as baskets; supports broadcast. Output is the full
    |types|-choose-2 matrix, deterministic integer counts and
    ratio-of-integers lift."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id", "event_type").distinct().persist()
    nu = ev.agg(F.countDistinct("user_id").cast("double").alias("n"))
    s = u.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = u.select("user_id", F.col("event_type").alias("type_a"))
    b = u.select("user_id", F.col("event_type").alias("type_b"))
    p = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        p.join(
            F.broadcast(s.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))),
            "type_a",
        )
        .join(
            F.broadcast(s.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))),
            "type_b",
        )
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(F.col("n_both") * F.col("n") / (F.col("na") * F.col("nb")), 6).alias(
                "lift"
            ),
        )
        .orderBy(F.col("type_a").asc(), F.col("type_b").asc())
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
    "cohort_spend_ltv",
    """
    WITH fw AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
                FROM events GROUP BY user_id),
    cs AS (SELECT cohort, COUNT(*)::DOUBLE AS cohort_users FROM fw GROUP BY cohort),
    act AS (
      SELECT fw.cohort,
             CAST(date_diff('week', fw.cohort, date_trunc('week', e.ts)) AS INTEGER)
               AS offset_w,
             SUM(CAST(e.value AS DECIMAL(18,2))) AS spend
      FROM events e JOIN fw ON fw.user_id = e.user_id
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort, offset_w,
             SUM(spend) OVER (PARTITION BY cohort ORDER BY offset_w ASC) AS cum_spend
      FROM act)
    SELECT c.cohort::DATE AS cohort_week, c.offset_w,
           ROUND(c.cum_spend::DOUBLE / cs.cohort_users, 2) AS ltv_per_user
    FROM cum c JOIN cs ON cs.cohort = c.cohort
    WHERE c.offset_w <= 8
    ORDER BY cohort_week ASC, offset_w ASC
    """,
)
def cohort_spend_ltv(spark, sf_dir):
    """Cohort LTV triangle: cumulative value per user by first-active week
    and weeks-since — the MONETARY companion of `user_retention_cohorts`
    (that one counts who comes back; this measures what they're worth,
    which is what acquisition-spend decisions actually read). First-week
    assignment is one MIN per user; per-(cohort, offset) spend is one
    partial-aggregated rollup of the cohort-joined stream; the
    cumulative sum runs on the cohort x offset triangle (span-sized,
    tiny). Output truncated to offsets 0..8 for a stable triangle;
    per-user normalization divides by the FULL cohort size, so the
    curve reads as expected-LTV, not survivor-LTV."""
    ev = load_table(spark, sf_dir, "events")
    fw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    cs = fw.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("double").alias("cohort_users")
    )
    act = (
        ev.join(fw, "user_id")
        .groupBy(
            "cohort",
            (
                F.floor(
                    F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
                )
            )
            .cast("int")
            .alias("offset_w"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("spend"))
    )
    w = Window.partitionBy("cohort").orderBy(F.col("offset_w").asc())
    cum = act.select(
        "cohort",
        "offset_w",
        # decimal cumulative sum is exact; the single double division below
        # is then identical in both engines (round-6 determinism sweep)
        F.sum("spend").over(w).cast("double").alias("cum_spend"),
    )
    return (
        cum.join(F.broadcast(cs), "cohort")
        .filter(F.col("offset_w") <= 8)
        .select(
            F.col("cohort").cast("date").alias("cohort_week"),
            "offset_w",
            F.round(F.col("cum_spend") / F.col("cohort_users"), 2).alias(
                "ltv_per_user"
            ),
        )
        .orderBy(F.col("cohort_week").asc(), F.col("offset_w").asc())
    )
