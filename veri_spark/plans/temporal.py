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
