"""Calendar-grain temporal analytics over the order stream: seasonality
profiles and week-over-week growth — the demand-curve readouts a
forecasting pipeline consumes (and the sanity gates on any time-windowed
training label: a broken seasonal profile upstream means leaked or
shifted timestamps).

Both queries aggregate the fact table to CALENDAR grain first (12 months
/ ~360 weeks — tiny, bounded by the calendar, not the data), so every
ordering/lag step runs on a scale-free frame: the only corpus-scale work
is one partial-aggregated scan. Money is summed in exact integer CENTS;
shares and growth rates are single micro-quantized divisions of BIGINTs.

Registered into ``plans._base.QUERIES``/``ORACLES`` at import like every
domain module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from veri_spark.sources.catalog import load_table  # noqa: F401

from veri_spark.plans._base import register  # noqa: F401


@register(
    "monthly_order_seasonality",
    """
    WITH m AS (
      SELECT month(o_orderdate)::BIGINT AS month,
             COUNT(*)::BIGINT AS n_orders,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
               AS rev_cents
      FROM orders GROUP BY 1),
    t AS (SELECT SUM(n_orders)::BIGINT AS tot_n, SUM(rev_cents)::BIGINT
            AS tot_rev FROM m)
    SELECT m.month, m.n_orders, m.rev_cents,
           CAST(round(1e6 * 12 * m.n_orders / t.tot_n) AS BIGINT)
             AS count_index_micro,
           CAST(round(1e6 * 12 * m.rev_cents / t.tot_rev) AS BIGINT)
             AS revenue_index_micro
    FROM m CROSS JOIN t
    ORDER BY m.month ASC
    """,
)
def monthly_order_seasonality(spark, sf_dir):
    """Month-of-year seasonality profile pooled across the 7-year order
    history: per calendar month, order count and revenue with their
    seasonal INDEX (12 × share of annual total, micro-quantized — 1e6
    means a perfectly flat month). This is the profile a demand forecast
    divides out before modeling trend, and the fixture check on
    date-derived features (`events_weekday_profile` is the weekday twin
    on the event stream; this is the calendar-month view on the fact
    table). One grouped aggregate to 12 rows; revenue in exact integer
    cents; indices are single divisions against the broadcast 1-row
    total."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.month("o_orderdate").cast("bigint").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
    )
    t = m.agg(
        F.sum("n_orders").cast("bigint").alias("tot_n"),
        F.sum("rev_cents").cast("bigint").alias("tot_rev"),
    )
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            "month",
            "n_orders",
            "rev_cents",
            F.round(F.lit(1e6) * 12 * F.col("n_orders") / F.col("tot_n"))
            .cast("bigint")
            .alias("count_index_micro"),
            F.round(F.lit(1e6) * 12 * F.col("rev_cents") / F.col("tot_rev"))
            .cast("bigint")
            .alias("revenue_index_micro"),
        )
        .orderBy(F.col("month").asc())
    )


@register(
    "wow_growth_rates",
    """
    WITH w AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
             COUNT(*)::BIGINT AS n_orders,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
               AS rev_cents
      FROM orders GROUP BY 1),
    l AS (
      SELECT week, n_orders, rev_cents,
             lag(n_orders) OVER (ORDER BY week ASC) AS prev_n,
             lag(rev_cents) OVER (ORDER BY week ASC) AS prev_rev
      FROM w)
    SELECT week, n_orders, rev_cents,
           CAST(round(1e6 * (n_orders - prev_n) / prev_n) AS BIGINT)
             AS count_growth_micro,
           CAST(round(1e6 * (rev_cents - prev_rev) / prev_rev) AS BIGINT)
             AS revenue_growth_micro
    FROM l WHERE prev_n IS NOT NULL
    ORDER BY week DESC LIMIT 12
    """,
)
def wow_growth_rates(spark, sf_dir):
    """Week-over-week growth of order volume and revenue for the most
    recent 12 complete weeks — the trend readout that sits on every
    operations dashboard, and the alarm input for `events_cusum_scan`-
    style changepoint monitors. The scan aggregates straight to ISO-week
    grain (date_trunc 'week' is Monday-based in both engines); the lag
    window then runs over the ~360-row weekly frame — a SCALE-FREE
    unpartitioned window over an aggregate, the one place a global
    ordering is legitimate because the calendar, not the corpus, bounds
    it. Growth rates are micro-quantized single divisions of exact
    BIGINT counts/cents."""
    o = load_table(spark, sf_dir, "orders")
    w = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
    )
    win = Window.orderBy(F.col("week").asc())
    lagd = (
        w.withColumn("prev_n", F.lag("n_orders").over(win))
        .withColumn("prev_rev", F.lag("rev_cents").over(win))
        .filter(F.col("prev_n").isNotNull())
    )
    return (
        lagd.select(
            "week",
            "n_orders",
            "rev_cents",
            F.round(
                F.lit(1e6) * (F.col("n_orders") - F.col("prev_n")) / F.col("prev_n")
            )
            .cast("bigint")
            .alias("count_growth_micro"),
            F.round(
                F.lit(1e6)
                * (F.col("rev_cents") - F.col("prev_rev"))
                / F.col("prev_rev")
            )
            .cast("bigint")
            .alias("revenue_growth_micro"),
        )
        .orderBy(F.col("week").desc())
        .limit(12)
    )


@register(
    "scd2_intervals_from_events",
    """
    WITH o AS (
      SELECT user_id, event_type,
             epoch_us(ts::TIMESTAMP) AS us,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    f AS (SELECT user_id, event_type, us,
                 CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END AS chg
          FROM o),
    s AS (SELECT user_id, event_type, us,
                 SUM(chg) OVER (PARTITION BY user_id
                                ORDER BY us, event_type
                                ROWS UNBOUNDED PRECEDING) AS run_id
          FROM f),
    runs AS (SELECT user_id, run_id,
                    MAX(event_type) AS state,
                    MIN(us)::BIGINT AS start_us,
                    COUNT(*)::BIGINT AS n_events
             FROM s GROUP BY user_id, run_id),
    iv AS (SELECT state, start_us, n_events,
                  lead(start_us) OVER (PARTITION BY user_id
                                       ORDER BY run_id) AS end_us
           FROM runs)
    SELECT state AS event_type,
           COUNT(*)::BIGINT AS n_intervals,
           SUM(CASE WHEN end_us IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_current,
           COUNT(end_us)::BIGINT AS n_closed,
           SUM(n_events)::BIGINT AS n_events,
           ((2 * SUM(end_us - start_us) + COUNT(end_us))
            // (2 * COUNT(end_us)))::BIGINT / 1000000.0
             AS mean_closed_duration_s,
           ROUND(MAX(end_us - start_us) / 1e6, 6) AS max_closed_duration_s
    FROM iv
    GROUP BY state
    ORDER BY event_type ASC
    """,
)
def scd2_intervals_from_events(spark, sf_dir):
    """Slowly-Changing-Dimension Type-2 reconstruction from an event log:
    collapse each user's consecutive same-type runs into validity
    intervals [state_start, next_state_start) with an OPEN (is-current)
    last interval — the standard change-data-capture shape that turns an
    append-only stream into the dimension table every as-of join
    (operators/asof.py) probes, reported here as the per-state interval
    census (how many validity rows SCD-2 materialization would write,
    how many stay open, and how long closed states last). All three
    window steps (lag for change detection, running sum for run ids,
    lead for interval close) are PARTITIONED on user_id — one shuffle
    total, reused by all three since they share the partitioning — and
    the final census is a partial-aggregated state-grain reduce: the
    exact shape SCD-2 building takes at 100 TB. Determinism: timestamps
    as exact integer MICROSECONDS (unix_micros/epoch_us — the
    events_interarrival idiom), mean closed duration as the half-up
    integer division (2*sum+n) div 2n of exact BIGINTs, one division at
    the end."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        us.alias("us"),
        F.lag("event_type").over(wo).alias("prev"),
    )
    f = o.select(
        "user_id",
        "event_type",
        "us",
        F.when(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = f.select(
        "user_id", "event_type", "us", F.sum("chg").over(wr).alias("run_id")
    )
    runs = s.groupBy("user_id", "run_id").agg(
        F.max("event_type").alias("state"),
        F.min("us").cast("bigint").alias("start_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("run_id")
    iv = runs.select(
        "state",
        "start_us",
        "n_events",
        F.lead("start_us").over(wl).alias("end_us"),
    )
    closed = F.col("end_us").isNotNull()
    dur = F.col("end_us") - F.col("start_us")
    return (
        iv.groupBy(F.col("state").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum(F.when(closed, 0).otherwise(1)).cast("bigint").alias("n_current"),
            F.count("end_us").cast("bigint").alias("n_closed"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            (
                F.expr(
                    "(2 * sum(end_us - start_us) + count(end_us))"
                    " div (2 * count(end_us))"
                ).cast("bigint")
                / 1000000.0
            ).alias("mean_closed_duration_s"),
            F.round(F.max(dur) / F.lit(1e6), 6).alias("max_closed_duration_s"),
        )
        .orderBy(F.col("event_type").asc())
    )


@register(
    "daily_seasonal_decomposition",
    """
    WITH d0 AS (SELECT MIN(ts::DATE) AS day0 FROM events),
    d AS (SELECT date_diff('day', d0.day0, ts::DATE)::BIGINT AS x,
                 dayofweek(ts)::BIGINT AS dow,
                 COUNT(*)::BIGINT AS y
          FROM events CROSS JOIN d0 GROUP BY 1, 2),
    tr AS (SELECT a.x, a.dow, a.y,
                  CAST(round(1e6 * SUM(b.y) / COUNT(*)) AS BIGINT)
                    AS trend_micro
           FROM d a JOIN d b ON b.x BETWEEN a.x - 14 AND a.x + 14
           GROUP BY a.x, a.dow, a.y),
    de AS (SELECT x, dow, 1000000 * y - trend_micro AS detr
           FROM tr),
    se AS (SELECT dow, COUNT(*)::BIGINT AS n_days,
                  CAST(round(SUM(detr) / (COUNT(*) * 1.0)) AS BIGINT)
                    AS season_micro
           FROM de GROUP BY dow),
    r AS (SELECT de.dow, de.detr - se.season_micro AS resid
          FROM de JOIN se USING (dow)),
    v AS (SELECT (SELECT SUM(CAST(detr AS DECIMAL(38,0)) * detr)
                  FROM de)::DOUBLE AS ssd,
                 SUM(CAST(resid AS DECIMAL(38,0)) * resid)::DOUBLE AS ssr
          FROM r)
    SELECT se.dow, se.n_days, se.season_micro,
           CAST(round(1e6 * (1 - v.ssr / v.ssd)) AS BIGINT)
             AS weekday_r2_micro
    FROM se CROSS JOIN v
    ORDER BY se.dow ASC
    """,
)
def daily_seasonal_decomposition(spark, sf_dir):
    """Classical trend/seasonal decomposition of daily event volume: a
    centered +/-14-day moving average is the trend, the per-weekday mean
    of the detrended series is the seasonal index, and the variance the
    weekday indexes explain of the detrended series (R^2) says whether
    the weekly cycle is real — the decomposition behind
    `hourly_seasonal_naive_mase`'s baseline choice and the
    `events_weekday_profile` shares, as one self-consistent model.

    Scale + determinism: the corpus collapses to the CALENDAR-bounded
    (day, weekday, count) frame in one partial-aggregated scan; the
    moving average is a banded triangular join over that bounded frame
    (|days| x 29 rows, broadcast); trend/season values are
    micro-quantized single divisions of exact BIGINTs, so the detrended
    and residual series are INTEGER micro series; the variance ratio
    sums their squares as exact DECIMAL(38,0) (order-insensitive) with
    one double division at the end. Weekday numbering is the DuckDB
    0=Sunday convention (Spark shifts by one — the
    events_weekday_profile idiom)."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.col("ts").cast("date")).alias("day0"))
    d = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.col("day0"))
            .cast("bigint")
            .alias("x"),
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    b = d.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    tr = (
        d.join(
            F.broadcast(b),
            (F.col("xb") >= F.col("x") - 14) & (F.col("xb") <= F.col("x") + 14),
        )
        .groupBy("x", "dow", "y")
        .agg(
            F.round(F.lit(1e6) * F.sum("yb") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("trend_micro")
        )
    )
    de = tr.select(
        "x",
        "dow",
        (F.lit(1000000) * F.col("y") - F.col("trend_micro")).alias("detr"),
    )
    se = de.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.sum("detr") / (F.count(F.lit(1)) * F.lit(1.0)))
        .cast("bigint")
        .alias("season_micro"),
    )
    r = de.join(F.broadcast(se.select("dow", "season_micro")), "dow").select(
        (F.col("detr") - F.col("season_micro")).alias("resid")
    )
    ssd = de.agg(
        F.sum(F.col("detr").cast("decimal(38,0)") * F.col("detr"))
        .cast("double")
        .alias("ssd")
    )
    v = r.agg(
        F.sum(F.col("resid").cast("decimal(38,0)") * F.col("resid"))
        .cast("double")
        .alias("ssr")
    ).crossJoin(F.broadcast(ssd))
    return (
        se.crossJoin(F.broadcast(v))
        .select(
            "dow",
            "n_days",
            "season_micro",
            F.round(F.lit(1e6) * (1 - F.col("ssr") / F.col("ssd")))
            .cast("bigint")
            .alias("weekday_r2_micro"),
        )
        .orderBy(F.col("dow").asc())
    )


@register(
    "ship_late_p_chart",
    """
    WITH lag AS (
      SELECT date_trunc('month', o.o_orderdate)::DATE AS mon,
             CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    m AS (SELECT mon, COUNT(*)::BIGINT AS n,
                 SUM(late)::BIGINT AS n_late
          FROM lag GROUP BY mon),
    t AS (SELECT SUM(n)::BIGINT AS nn, SUM(n_late)::BIGINT AS kk FROM m),
    c AS (SELECT m.mon, m.n, m.n_late, t.kk * 1.0 / t.nn AS pbar,
                 m.n_late * 1.0 / m.n AS p
          FROM m CROSS JOIN t),
    lim AS (SELECT mon, n, n_late, p, pbar,
                   pbar + 3 * sqrt(pbar * (1 - pbar) / n) AS ucl,
                   pbar - 3 * sqrt(pbar * (1 - pbar) / n) AS lcl
            FROM c)
    SELECT mon, n, n_late,
           CAST(round(1e6 * p) AS BIGINT) AS p_micro,
           CAST(round(1e6 * ucl) AS BIGINT) AS ucl_micro,
           CAST(round(1e6 * GREATEST(lcl, 0.0)) AS BIGINT) AS lcl_micro,
           (p > ucl OR p < GREATEST(lcl, 0.0)) AS out_of_control
    FROM lim
    ORDER BY mon ASC
    """,
)
def ship_late_p_chart(spark, sf_dir):
    """Shewhart p-chart on the monthly late-shipment proportion (ship lag
    > 90 days after order): classic statistical process control with
    3-sigma binomial limits around the pooled rate, flagging the months
    whose lateness is a special cause, not noise — the CONTROL-limit
    framing that `events_hourly_anomaly` (z-spikes) and
    `events_page_hinkley` (sustained shifts) bracket from the event
    side, applied to the fulfillment process. Months with small n get
    WIDE limits automatically — the property that makes p-charts robust
    to the partial first/last months.

    Scale + determinism: one join + partial-aggregated scan reduces the
    corpus to per-month (n, n_late) BIGINT cells (calendar-bounded);
    rates and limits are fixed sequences of correctly-rounded double ops
    (sqrt included) on those integers, identical in both engines; the
    out-of-control flag compares the UNROUNDED rate against the
    UNROUNDED limit."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lag = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mon"),
        F.when(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, 1
        )
        .otherwise(0)
        .alias("late"),
    )
    m = lag.groupBy("mon").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("late").cast("bigint").alias("n_late"),
    )
    t = m.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("n_late").cast("bigint").alias("kk"),
    )
    c = m.crossJoin(F.broadcast(t))
    pbar = F.col("kk") * F.lit(1.0) / F.col("nn")
    p = F.col("n_late") * F.lit(1.0) / F.col("n")
    ucl = pbar + 3 * F.sqrt(pbar * (1 - pbar) / F.col("n"))
    lcl = pbar - 3 * F.sqrt(pbar * (1 - pbar) / F.col("n"))
    lcl0 = F.greatest(lcl, F.lit(0.0))
    return c.select(
        "mon",
        "n",
        "n_late",
        F.round(F.lit(1e6) * p).cast("bigint").alias("p_micro"),
        F.round(F.lit(1e6) * ucl).cast("bigint").alias("ucl_micro"),
        F.round(F.lit(1e6) * lcl0).cast("bigint").alias("lcl_micro"),
        ((p > ucl) | (p < lcl0)).alias("out_of_control"),
    ).orderBy(F.col("mon").asc())
