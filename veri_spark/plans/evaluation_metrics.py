"""Evaluation tier 2: trend/rank significance, distributional drift
(JS, Wasserstein, Hellinger/TV, trimmed-winsorized), uplift and targeting
metrics (gains deciles, AP, CUPED), calibration (ECE) and the
Nelson-Aalen hazard.

Split from plans/evaluation.py (round-12 hygiene, mirroring the
round-5/6/10/11 splits); every (PySpark program, DuckDB oracle) pair is
unchanged and registers into ``plans._base.QUERIES``/``ORACLES`` at
import. See plans/evaluation.py for the tier's design rationale (bounded
frames before ordered steps, exact-integer aggregates, literal grids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from veri_spark.functions.text import EN_STOPWORDS_SQL  # noqa: F401
from veri_spark.sources.catalog import load_table  # noqa: F401

from veri_spark.plans._base import daily_event_counts, register  # noqa: F401

# Standard-normal 97.5th-percentile quantile, Python-precomputed (the
# probit-literal rule above: never in-engine). Defining formula: Acklam
# probit(0.975) = 1.959963984540054 (max abs err ~1.15e-9); pinned by
# tests/test_round8_batch2.py against the same Acklam coefficients the
# QQ grid test uses.
_Z_975 = 1.959963984540054


@register(
    "mann_kendall_daily_trend",
    f"""
    WITH d0 AS (SELECT MIN(ts::DATE) AS day0 FROM events),
    d AS (SELECT date_diff('day', d0.day0, ts::DATE)::BIGINT AS x,
                 COUNT(*)::BIGINT AS y
          FROM events CROSS JOIN d0 GROUP BY 1),
    s AS (SELECT SUM(CASE WHEN b.y > a.y THEN 1
                          WHEN b.y < a.y THEN -1 ELSE 0 END)::BIGINT AS s_stat
          FROM d a JOIN d b ON b.x > a.x),
    n AS (SELECT COUNT(*)::BIGINT AS nd FROM d),
    ties AS (SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)::BIGINT
               AS tie18
             FROM (SELECT COUNT(*)::BIGINT AS t FROM d GROUP BY y)
             WHERE t > 1),
    v AS (SELECT n.nd, s.s_stat,
                 (n.nd * (n.nd - 1) * (2 * n.nd + 5) - ties.tie18)::BIGINT
                   AS var_s_x18
          FROM n CROSS JOIN s CROSS JOIN ties),
    z AS (SELECT nd, s_stat, var_s_x18,
                 CASE WHEN s_stat > 0
                      THEN (s_stat - 1) / sqrt(var_s_x18 / 18.0)
                      WHEN s_stat < 0
                      THEN (s_stat + 1) / sqrt(var_s_x18 / 18.0)
                      ELSE 0.0 END AS zv
          FROM v)
    SELECT nd AS n_days, s_stat, var_s_x18,
           ROUND(zv, 6) AS z_mk,
           CASE WHEN zv > {_Z_975!r} THEN 'increasing'
                WHEN zv < -{_Z_975!r} THEN 'decreasing'
                ELSE 'no_trend' END AS trend_95
    FROM z
    """,
)
def mann_kendall_daily_trend(spark, sf_dir):
    """Mann-Kendall trend TEST on daily event volume — the significance
    verdict for the slope `theil_sen_daily_trend` estimates (the two are
    the standard pairing: Sen gives magnitude, MK gives the p-value
    without assuming normal residuals). S counts concordant-minus-
    discordant day pairs; Var(S) carries the exact tie correction
    (n(n-1)(2n+5) - sum_t t(t-1)(2t+5))/18 over tied daily counts; the
    z statistic applies the standard +/-1 continuity correction.

    Scale shape: identical to Theil-Sen — the corpus collapses to the
    CALENDAR-bounded daily-count frame first (one partial-aggregated
    scan), so the pairwise sign sum is days-choose-2, bounded by the
    time range, not data volume, built as one broadcast triangular join
    that reduces to a single integer. Determinism: S, n, and the x18
    variance numerator are exact BIGINTs; z is (bigint +/- 1) / sqrt
    (bigint / 18.0) — two correctly-rounded IEEE ops identical in both
    engines; the 95% verdict compares the UNROUNDED z against the
    Python-precomputed Acklam literal (never an in-engine quantile)."""
    d = daily_event_counts(spark, sf_dir)
    a = d.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = d.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    s = a.join(F.broadcast(b), F.col("xj") > F.col("xi")).agg(
        F.sum(
            F.when(F.col("yj") > F.col("yi"), 1)
            .when(F.col("yj") < F.col("yi"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    ties = (
        d.groupBy("y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie18")
        )
    )
    v = (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "nd",
            "s_stat",
            (
                F.col("nd") * (F.col("nd") - 1) * (2 * F.col("nd") + 5)
                - F.col("tie18")
            )
            .cast("bigint")
            .alias("var_s_x18"),
        )
    )
    zv = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s_x18") / F.lit(18.0)),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s_x18") / F.lit(18.0)),
        )
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("nd").alias("n_days"),
        "s_stat",
        "var_s_x18",
        F.round(zv, 6).alias("z_mk"),
        F.when(zv > F.lit(_Z_975), F.lit("increasing"))
        .when(zv < F.lit(-_Z_975), F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend_95"),
    )


@register(
    "kendall_tau_part_demand",
    """
    WITH q AS (
      SELECT l_partkey,
             SUM(CASE WHEN l_shipdate >= DATE '1996-01-01'
                       AND l_shipdate < DATE '1997-01-01'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)::BIGINT
               AS q96,
             SUM(CASE WHEN l_shipdate >= DATE '1997-01-01'
                       AND l_shipdate < DATE '1998-01-01'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)::BIGINT
               AS q97
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1998-01-01'
      GROUP BY l_partkey),
    top AS (SELECT l_partkey, q96, q97 FROM q
            ORDER BY q96 DESC, l_partkey ASC LIMIT 100),
    pr AS (SELECT
             SUM(CASE WHEN (a.q96 - b.q96) * (a.q97 - b.q97) > 0
                      THEN 1 ELSE 0 END)::BIGINT AS c_pairs,
             SUM(CASE WHEN (a.q96 - b.q96) * (a.q97 - b.q97) < 0
                      THEN 1 ELSE 0 END)::BIGINT AS d_pairs,
             SUM(CASE WHEN a.q96 = b.q96 THEN 1 ELSE 0 END)::BIGINT
               AS ties_x,
             SUM(CASE WHEN a.q97 = b.q97 THEN 1 ELSE 0 END)::BIGINT
               AS ties_y,
             COUNT(*)::BIGINT AS n_pairs
           FROM top a JOIN top b ON a.l_partkey < b.l_partkey),
    n AS (SELECT COUNT(*)::BIGINT AS np FROM top)
    SELECT n.np AS n_parts, pr.n_pairs, pr.c_pairs AS concordant,
           pr.d_pairs AS discordant, pr.ties_x, pr.ties_y,
           ROUND((pr.c_pairs - pr.d_pairs)
                 / sqrt(CAST((pr.n_pairs - pr.ties_x)
                             * (pr.n_pairs - pr.ties_y) AS DOUBLE)), 6)
             AS tau_b
    FROM pr CROSS JOIN n
    """,
)
def kendall_tau_part_demand(spark, sf_dir):
    """Kendall tau-b rank stability of part demand across adjacent years
    (1996 vs 1997 — full years of this corpus's 1995-2001 ship range):
    did the parts that led year-1 shipments still lead in year-2? The
    whole-ranking stability summary next to `rank_footrule_audit`'s
    single-item displacement — a tau-b near 1 means the demand ranking
    is durable (safe to cache last year's allocation); near 0 means
    re-rank everything. Tau-b (not tau-a) because yearly quantity totals
    tie heavily; the denominator sqrt((n0-n1)(n0-n2)) corrects for both
    margins.

    Scale shape: the corpus collapses to per-part BIGINT quantity totals
    in one partial-aggregated scan with the shipdate filter pushed to
    the parquet scan; the pairwise concordance join runs over the
    BOUNDED top-100 frame (TakeOrdered selection on exact integer keys),
    so the quadratic is 100-choose-2 regardless of data volume.
    Determinism: quantities are integral doubles cast to BIGINT (exact),
    C/D/tie counts are BIGINTs, tau is one division by sqrt of an exact
    <2^53 product — correctly-rounded IEEE ops identical in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    y97 = F.col("l_shipdate") >= F.lit("1997-01-01").cast("date")
    q = li.groupBy("l_partkey").agg(
        F.sum(F.when(~y97, F.col("l_quantity").cast("bigint")).otherwise(0))
        .cast("bigint")
        .alias("q96"),
        F.sum(F.when(y97, F.col("l_quantity").cast("bigint")).otherwise(0))
        .cast("bigint")
        .alias("q97"),
    )
    top = q.orderBy(F.col("q96").desc(), F.col("l_partkey").asc()).limit(100)
    a = top.select(
        F.col("l_partkey").alias("ka"),
        F.col("q96").alias("xa"),
        F.col("q97").alias("ya"),
    )
    b = top.select(
        F.col("l_partkey").alias("kb"),
        F.col("q96").alias("xb"),
        F.col("q97").alias("yb"),
    )
    sgn = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    pr = a.join(F.broadcast(b), F.col("ka") < F.col("kb")).agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("bigint").alias("c_pairs"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("bigint").alias("d_pairs"),
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0))
        .cast("bigint")
        .alias("ties_x"),
        F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0))
        .cast("bigint")
        .alias("ties_y"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    n = top.agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    return pr.crossJoin(F.broadcast(n)).select(
        F.col("np").alias("n_parts"),
        "n_pairs",
        F.col("c_pairs").alias("concordant"),
        F.col("d_pairs").alias("discordant"),
        "ties_x",
        "ties_y",
        F.round(
            (F.col("c_pairs") - F.col("d_pairs"))
            / F.sqrt(
                (
                    (F.col("n_pairs") - F.col("ties_x"))
                    * (F.col("n_pairs") - F.col("ties_y"))
                ).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


@register(
    "js_divergence_event_drift",
    """
    WITH d0 AS (SELECT MIN(ts::DATE) AS day0,
                       date_diff('day', MIN(ts::DATE), MAX(ts::DATE))::BIGINT
                         AS span
                FROM events),
    e AS (SELECT event_type,
                 CASE WHEN date_diff('day', d0.day0, ts::DATE) * 2 <= d0.span
                      THEN 0 ELSE 1 END AS half
          FROM events CROSS JOIN d0),
    c AS (SELECT event_type,
                 SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS a_n,
                 SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS b_n
          FROM e GROUP BY event_type),
    t AS (SELECT SUM(a_n)::BIGINT AS ta, SUM(b_n)::BIGINT AS tb FROM c),
    pq AS (SELECT c.event_type, c.a_n, c.b_n,
                  c.a_n / (t.ta * 1.0) AS p,
                  CASE WHEN t.tb > 0 THEN c.b_n / (t.tb * 1.0)
                       ELSE 0.0 END AS q
           FROM c CROSS JOIN t)
    SELECT event_type, a_n AS early_n, b_n AS late_n,
           CAST(FLOOR(1e6 * 0.5 * (
                  CASE WHEN a_n > 0
                       THEN p * ln(p / (0.5 * (p + q))) ELSE 0.0 END
                + CASE WHEN b_n > 0
                       THEN q * ln(q / (0.5 * (p + q))) ELSE 0.0 END)
                + 0.5) AS BIGINT) AS js_term_micro
    FROM pq ORDER BY event_type ASC
    """,
)
def js_divergence_event_drift(spark, sf_dir):
    """Jensen-Shannon divergence between the event-type mixes of the
    early and late calendar halves — the SYMMETRIC, always-finite drift
    metric next to `event_type_drift_psi` (PSI blows up on types absent
    from one side; JSD's mixture denominator m=(p+q)/2 never does, and
    its total is bounded by ln 2). Reported per type in micro-nats: the
    per-type term p*ln(p/m)+q*ln(q/m) is >= 0 by the log-sum inequality,
    so each row reads directly as that type's drift contribution and the
    corpus JSD is the BIGINT column sum / 2e6.

    Scale shape: one pass computes the calendar split bounds, one
    partial-aggregated scan yields the per-(type, half) counts — the
    frame entering the math is |event types| rows. Determinism: p, q, m
    derive from exact BIGINT counts through correctly-rounded IEEE
    divisions (identical in both engines); ln() is evaluated in-engine
    on those identical doubles — the accepted WoE/Zipf/MI idiom, with
    the same residual caveat (libm vs java.lang.Math could differ by an
    ulp; a flip requires 1e6*term to land within ~1 ulp of a half-unit
    boundary). The floor(x+0.5) round is half-up on the provably
    nonnegative terms."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(
        F.min(F.col("ts").cast("date")).alias("day0"),
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        )
        .cast("bigint")
        .alias("span"),
    )
    e = ev.crossJoin(F.broadcast(d0)).select(
        "event_type",
        F.when(
            F.datediff(F.col("ts").cast("date"), F.col("day0")) * 2
            <= F.col("span"),
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    c = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("a_n"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("b_n"),
    )
    t = c.agg(
        F.sum("a_n").cast("bigint").alias("ta"),
        F.sum("b_n").cast("bigint").alias("tb"),
    )
    # Degenerate-split guards (round-8 advisor finding): the early half
    # is non-empty whenever the corpus is (day0 satisfies 2*0 <= span),
    # so ta > 0 is structural — but a SINGLE-DAY corpus puts every row
    # in half 0 and tb = 0, and x/0 semantics diverge cross-engine
    # (DuckDB inf vs Spark ANSI throw). Guarding q to 0.0 (mirrored in
    # the SQL) makes the output the JSD against an empty late half —
    # every type's term reduces to p*ln(2), the metric's maximum, which
    # is the honest reading of "all the data is early".
    p = F.col("a_n") / (F.col("ta") * F.lit(1.0))
    q = F.when(
        F.col("tb") > 0, F.col("b_n") / (F.col("tb") * F.lit(1.0))
    ).otherwise(F.lit(0.0))
    m = F.lit(0.5) * (p + q)
    term = F.lit(1e6) * F.lit(0.5) * (
        F.when(F.col("a_n") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("b_n") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "event_type",
            F.col("a_n").alias("early_n"),
            F.col("b_n").alias("late_n"),
            F.floor(term + F.lit(0.5)).cast("bigint").alias("js_term_micro"),
        )
        .orderBy(F.col("event_type").asc())
    )


@register(
    "value_trimmed_winsorized_drift",
    """
    WITH d0 AS (SELECT MIN(ts::DATE) AS day0,
                       date_diff('day', MIN(ts::DATE), MAX(ts::DATE))::BIGINT
                         AS span
                FROM events),
    e AS (SELECT value,
                 CASE WHEN date_diff('day', d0.day0, ts::DATE) * 2 <= d0.span
                      THEN 0 ELSE 1 END AS half
          FROM events CROSS JOIN d0),
    q AS (SELECT half, quantile_cont(value, 0.1) AS q10,
                 quantile_cont(value, 0.9) AS q90
          FROM e GROUP BY half),
    j AS (SELECT e.half, e.value, q.q10, q.q90 FROM e JOIN q USING (half))
    SELECT half, COUNT(*)::BIGINT AS n,
           SUM(CASE WHEN value >= q10 AND value <= q90
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           ROUND(MAX(q10), 6) AS q10,
           ROUND(MAX(q90), 6) AS q90,
           ROUND(SUM(CASE WHEN value >= q10 AND value <= q90
                          THEN CAST(value AS DECIMAL(28,10)) END)::DOUBLE
                 / SUM(CASE WHEN value >= q10 AND value <= q90
                            THEN 1 ELSE 0 END), 6) AS trimmed_mean,
           ROUND(SUM(CAST(LEAST(GREATEST(value, q10), q90)
                          AS DECIMAL(28,10)))::DOUBLE
                 / COUNT(*), 6) AS winsorized_mean
    FROM j GROUP BY half ORDER BY half ASC
    """,
)
def value_trimmed_winsorized_drift(spark, sf_dir):
    """Robust location drift between the early and late calendar halves:
    the 10%-two-sided TRIMMED mean (drop the tails) and WINSORIZED mean
    (clamp the tails) of the event value per half — the robust sibling
    of the raw `value_moments_by_type` means and the location complement
    of `value_mad_outliers`' scale estimate: when the raw mean drifts
    but the trimmed mean does not, the change is in the tails (new
    outliers, a clipping bug), not the distribution's body.

    Scale + determinism: one pass computes the calendar split, one exact
    interpolated-quantile aggregate per half (the
    `events_value_quantiles` idiom — percentile_approx is the 100 TB
    swap-in), then one partial-aggregated scan with the 2-row quantile
    frame broadcast; both means sum exact DECIMAL(28,10) casts
    (order-insensitive, the value_moments idiom) with one double
    division at the end. The clamp (LEAST/GREATEST) returns one of the
    operand doubles bit-for-bit in both engines.

    Degenerate splits (round-8 advisor): unlike the JSD query, both
    divisors here are per-GROUP aggregates — a half with no rows
    produces no group row at all (a single-day corpus simply emits one
    half-0 row), COUNT(*) >= 1 on any emitted row, and n_kept >= 1
    because the half's own q10/q90 always bracket at least the rows
    equal to them — so no x/0 path exists and no guard is needed."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(
        F.min(F.col("ts").cast("date")).alias("day0"),
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        )
        .cast("bigint")
        .alias("span"),
    )
    e = ev.crossJoin(F.broadcast(d0)).select(
        "value",
        F.when(
            F.datediff(F.col("ts").cast("date"), F.col("day0")) * 2
            <= F.col("span"),
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    q = e.groupBy("half").agg(
        F.percentile("value", F.lit(0.1)).alias("q10"),
        F.percentile("value", F.lit(0.9)).alias("q90"),
    )
    j = e.join(F.broadcast(q), "half")
    kept = (F.col("value") >= F.col("q10")) & (F.col("value") <= F.col("q90"))
    clamped = F.least(F.greatest(F.col("value"), F.col("q10")), F.col("q90"))
    return (
        j.groupBy("half")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.round(F.max("q10"), 6).alias("q10"),
            F.round(F.max("q90"), 6).alias("q90"),
            F.round(
                F.sum(F.when(kept, F.col("value").cast("decimal(28,10)")))
                .cast("double")
                / F.sum(F.when(kept, 1).otherwise(0)),
                6,
            ).alias("trimmed_mean"),
            F.round(
                F.sum(clamped.cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy(F.col("half").asc())
    )


@register(
    "cumulative_gains_deciles",
    """
    WITH e AS (SELECT event_id, value,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                        AS pos
               FROM events),
    r AS (SELECT pos,
                 ntile(10) OVER (ORDER BY value DESC, event_id ASC)
                   AS decile
          FROM e),
    g AS (SELECT decile, COUNT(*)::BIGINT AS n_events,
                 SUM(pos)::BIGINT AS n_pos
          FROM r GROUP BY decile),
    c AS (SELECT g.decile, g.n_events, g.n_pos,
                 SUM(g2.n_events)::BIGINT AS cum_n,
                 SUM(g2.n_pos)::BIGINT AS cum_pos
          FROM g JOIN g g2 ON g2.decile <= g.decile
          GROUP BY g.decile, g.n_events, g.n_pos),
    t AS (SELECT SUM(n_events)::BIGINT AS n_tot, SUM(n_pos)::BIGINT AS p_tot
          FROM g)
    SELECT c.decile, c.n_events, c.n_pos, c.cum_pos,
           CAST(round(1e6 * c.cum_pos / t.p_tot) AS BIGINT) AS gain_micro,
           CAST(round(1e6 * (c.cum_pos * t.n_tot)
                      / ((t.p_tot * c.cum_n) * 1.0)) AS BIGINT)
             AS lift_micro
    FROM c CROSS JOIN t ORDER BY c.decile ASC
    """,
)
def cumulative_gains_deciles(spark, sf_dir):
    """Cumulative gains and lift at score deciles, using event `value` as
    the score and purchase as the positive label — the table behind the
    gains chart every targeting/propensity evaluation starts with, and
    the decision-oriented companion to `score_auc_mann_whitney` (AUC
    summarizes the whole curve; a campaign acts on 'the top decile
    captures X% of purchasers at Y-times random' — gain and lift). The
    decile cut rides the distributed global rank (``global_row_number``
    on (value DESC, event_id ASC) + ``ntile_from_rank`` — SQL ntile
    bit-for-bit, no single-partition WindowExec; pinned in
    tests/test_plan_shapes.py); the cumulative step runs on the BOUNDED
    10-row decile frame via a broadcast triangular self-join (the
    Mann-Kendall fold idiom), never a window over the corpus. Gains and
    lift are single micro-quantized divisions of exact BIGINT counts
    (cum_pos * n_tot stays under 2^53 through ~1e8 events per decile;
    past that, widen to DECIMAL(38,0) — noted, exact at every gate SF).

    Scale: one corpus scan, the two-pass rank, partial-agg collapse to
    10 rows, then broadcast arithmetic."""
    from veri_spark.operators.ranking import global_row_number, ntile_from_rank

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    ranked = global_row_number(
        e, [F.col("value").desc(), F.col("event_id").asc()], rn_col="__rn"
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("__tot"))
    r = ranked.crossJoin(F.broadcast(tot)).select(
        "pos", ntile_from_rank(F.col("__rn"), F.col("__tot"), 10).alias("decile")
    )
    g = r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    g2 = g.select(
        F.col("decile").alias("d2"),
        F.col("n_events").alias("ne2"),
        F.col("n_pos").alias("np2"),
    )
    c = (
        g.join(F.broadcast(g2), F.col("d2") <= F.col("decile"))
        .groupBy("decile", "n_events", "n_pos")
        .agg(
            F.sum("ne2").cast("bigint").alias("cum_n"),
            F.sum("np2").cast("bigint").alias("cum_pos"),
        )
    )
    t = g.agg(
        F.sum("n_events").cast("bigint").alias("n_tot"),
        F.sum("n_pos").cast("bigint").alias("p_tot"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n_events",
            "n_pos",
            "cum_pos",
            F.round(F.lit(1e6) * F.col("cum_pos") / F.col("p_tot"))
            .cast("bigint")
            .alias("gain_micro"),
            F.round(
                F.lit(1e6)
                * (F.col("cum_pos") * F.col("n_tot"))
                / ((F.col("p_tot") * F.col("cum_n")) * F.lit(1.0))
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
        .orderBy(F.col("decile").asc())
    )


@register(
    "average_precision_value_score",
    """
    WITH e AS (SELECT event_id, value,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                        AS pos
               FROM events),
    r AS (SELECT pos,
                 row_number() OVER (ORDER BY value DESC, event_id ASC)
                   AS rn,
                 SUM(pos) OVER (ORDER BY value DESC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS cum_pos
          FROM e),
    s AS (SELECT COUNT(*)::BIGINT AS n, SUM(pos)::BIGINT AS p,
                 SUM(CASE WHEN pos = 1
                          THEN CAST(round(1e9 * cum_pos / rn) AS BIGINT)
                          ELSE 0 END) AS ap_nano
          FROM r)
    SELECT n AS n_events, p AS n_pos,
           CASE WHEN p > 0 THEN ROUND(ap_nano / (p * 1e9), 6)
                ELSE NULL END AS average_precision,
           CASE WHEN n > 0 THEN CAST(round(1e6 * p / n) AS BIGINT)
                ELSE NULL END AS prevalence_micro
    FROM s
    """,
)
def average_precision_value_score(spark, sf_dir):
    """Average precision (area under the precision-recall curve, the
    step-function estimator) of the `value` score against the purchase
    label — the class-imbalance-honest companion to
    `score_auc_mann_whitney`: ROC-AUC is blind to prevalence, AP
    degrades toward the base rate (reported as prevalence_micro, AP's
    random baseline) exactly when positives are rare, which is the
    regime targeting models live in. AP = (1/P) * sum over positive
    rows of precision@rank. Both per-row inputs (rank, cumulative
    positives) come from ONE distributed prefix pass —
    ``global_prefix_agg`` scans the pos indicator and a ones column
    under the total (value DESC, event_id) order in a single range
    exchange (the two-column KS idiom), so no unpartitioned window
    anywhere (pinned in tests/test_plan_shapes.py). Each positive row's
    precision nano-quantizes to an integer (round(1e9*cum_pos/rn) of
    exact BIGINTs) before the corpus-wide fold, and AP is ONE final
    division.

    Scale: one corpus scan, one range exchange, one reduce."""
    from veri_spark.operators.ranking import global_prefix_agg

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        F.lit(1).alias("one"),
    )
    r = global_prefix_agg(
        e,
        [F.col("value").desc(), F.col("event_id").asc()],
        value_col=["pos", "one"],
        out_col=["cum_pos", "rn"],
    )
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("p"),
        F.sum(
            F.when(
                F.col("pos") == 1,
                F.round(F.lit(1e9) * F.col("cum_pos") / F.col("rn")).cast(
                    "bigint"
                ),
            ).otherwise(0)
        ).alias("ap_nano"),
    )
    return s.select(
        F.col("n").alias("n_events"),
        F.col("p").alias("n_pos"),
        F.when(
            F.col("p") > 0,
            F.round(F.col("ap_nano") / (F.col("p") * F.lit(1e9)), 6),
        ).alias("average_precision"),
        F.when(
            F.col("n") > 0,
            F.round(F.lit(1e6) * F.col("p") / F.col("n")).cast("bigint"),
        ).alias("prevalence_micro"),
    )


@register(
    "cuped_variance_reduction",
    """
    WITH b AS (SELECT MIN(epoch_us(ts::TIMESTAMP))::BIGINT AS lo,
                      MAX(epoch_us(ts::TIMESTAMP))::BIGINT AS hi
               FROM events),
    u AS (SELECT user_id,
                 SUM(CASE WHEN epoch_us(ts::TIMESTAMP)
                               <= b.lo + ((b.hi - b.lo) // 2)
                          THEN CAST(value AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS x,
                 SUM(CASE WHEN epoch_us(ts::TIMESTAMP)
                               > b.lo + ((b.hi - b.lo) // 2)
                          THEN CAST(value AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS y
          FROM events CROSS JOIN b GROUP BY user_id),
    m AS (SELECT COUNT(*)::BIGINT AS n,
                 SUM(CAST(x AS DECIMAL(18,2)))::DOUBLE AS sx,
                 SUM(CAST(y AS DECIMAL(18,2)))::DOUBLE AS sy,
                 SUM(CAST(x AS DECIMAL(18,2))
                     * CAST(x AS DECIMAL(18,2)))::DOUBLE AS sxx,
                 SUM(CAST(y AS DECIMAL(18,2))
                     * CAST(y AS DECIMAL(18,2)))::DOUBLE AS syy,
                 SUM(CAST(x AS DECIMAL(18,2))
                     * CAST(y AS DECIMAL(18,2)))::DOUBLE AS sxy
          FROM u)
    SELECT n AS n_users,
           CASE WHEN n * sxx - sx * sx > 0
                THEN ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                ELSE NULL END AS theta,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                THEN ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                ELSE NULL END AS var_reduction
    FROM m
    """,
)
def cuped_variance_reduction(spark, sf_dir):
    """CUPED (controlled experiments using pre-experiment data): split
    the event timeline at its midpoint, use each user's FIRST-half spend
    as the pre-experiment covariate X and second-half spend as the
    metric Y, and report theta = cov(X,Y)/var(X) (the adjustment
    coefficient Y - theta*(X - Xbar)) and the variance reduction it buys
    (= rho^2, the fraction of metric variance the covariate explains) —
    the standard pre-experiment calibration every A/B platform runs
    before promising an MDE, and the natural extension of the
    `ab_test_*` family. Determinism: the midpoint is exact integer
    epoch-microsecond arithmetic ((hi-lo) halved with integer division
    — identical cross-engine); per-user half-sums fold exact
    DECIMAL(18,2) casts (cross-user double sums never happen); the five
    user-grain moments fold as exact decimals and theta/rho^2 are
    single fixed-order double expressions (the Pearson idiom).
    Zero-variance degenerates guard to NULL identically.

    Scale: one corpus scan for the bounds, one user-keyed
    partial-aggregated scan, one 6-number moment reduce — all shuffles
    on user_id."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("lo"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("hi"),
    )
    mid = F.col("lo") + F.shiftright(F.col("hi") - F.col("lo"), 1)
    dec0 = F.lit(0).cast("decimal(18,2)")
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.unix_micros(F.col("ts").cast("timestamp")) <= mid,
                    F.col("value").cast("decimal(18,2)"),
                ).otherwise(dec0)
            )
            .cast("double")
            .alias("x"),
            F.sum(
                F.when(
                    F.unix_micros(F.col("ts").cast("timestamp")) > mid,
                    F.col("value").cast("decimal(18,2)"),
                ).otherwise(dec0)
            )
            .cast("double")
            .alias("y"),
        )
    )
    xd = F.col("x").cast("decimal(18,2)")
    yd = F.col("y").cast("decimal(18,2)")
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    return m.select(
        n.alias("n_users"),
        F.when(vx > 0, F.round(cov / vx, 6)).alias("theta"),
        F.when(vx * vy > 0, F.round(cov * cov / (vx * vy), 6)).alias(
            "var_reduction"
        ),
    )


# ---------------------------------------------------------------------------
# Round 10: distance-metric drift (Wasserstein-1, Hellinger, total
# variation) and the scalar calibration readout (ECE/MCE) — completing the
# drift panel (PSI bins, KS sup-gap, CvM integral, JS divergence) with the
# transport and f-divergence views, and the reliability diagram with the
# number a pipeline actually thresholds.
# ---------------------------------------------------------------------------

@register(
    "wasserstein_value_drift",
    """
    WITH d0 AS (SELECT MIN(ts::DATE) AS day0,
                       date_diff('day', MIN(ts::DATE), MAX(ts::DATE))::BIGINT
                         AS span
                FROM events),
    e AS (SELECT value,
                 CASE WHEN date_diff('day', d0.day0, ts::DATE) * 2 <= d0.span
                      THEN 0 ELSE 1 END AS half
          FROM events CROSS JOIN d0),
    g AS (SELECT value,
                 SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
                 SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS n2
          FROM e GROUP BY value),
    t AS (SELECT SUM(n1)::BIGINT AS tn1, SUM(n2)::BIGINT AS tn2,
                 COUNT(*)::BIGINT AS n_domain
          FROM g),
    c AS (SELECT value,
                 SUM(n1) OVER (ORDER BY value ASC) AS c1,
                 SUM(n2) OVER (ORDER BY value ASC) AS c2,
                 row_number() OVER (ORDER BY value ASC) AS rn
          FROM g),
    p AS (SELECT a.c1, a.c2, b.value - a.value AS gap
          FROM c a JOIN c b ON b.rn = a.rn + 1),
    q AS (SELECT CAST(FLOOR(1e9 * abs(p.c1 / (t.tn1 * 1.0)
                                      - p.c2 / (t.tn2 * 1.0)) * p.gap + 0.5)
                      AS BIGINT) AS term_nano
          FROM p CROSS JOIN t WHERE t.tn1 > 0 AND t.tn2 > 0)
    SELECT t.tn1 AS n_early, t.tn2 AS n_late, t.n_domain,
           ROUND(SUM(q.term_nano) / 1e9, 6) AS wasserstein_1
    FROM q CROSS JOIN t GROUP BY t.tn1, t.tn2, t.n_domain
    """,
)
def wasserstein_value_drift(spark, sf_dir):
    """Wasserstein-1 (earth mover's) distance between the early-half and
    late-half `value` distributions — the TRANSPORT view of drift the
    existing panel lacks: PSI and JS score mass mismatch per bin but are
    blind to HOW FAR the mass moved; KS is the sup of the CDF gap; W1 is
    its integral, in value units (dollars), which is the number a
    downstream budget or threshold actually absorbs. Same half-split as
    `js_divergence_event_drift`. W1 = sum |F1(v) - F2(v)| * (v_next - v)
    over the distinct-value DOMAIN: counts collapse to value grain in
    one partial-aggregated scan, the two CDFs and the row number come
    from ONE distributed prefix scan (global_prefix_agg's multi-measure
    pass — no unpartitioned window on the Spark side; the domain is
    capped at ~50k by the 2-decimal value grid so the oracle's plain
    window is the bounded mirror), consecutive domain values pair by an
    rn = rn+1 equi-join (the Durbin-Watson idiom, no lead()), and each
    term is nano-quantized from one fixed-order double expression of
    exact integers before the fold (order-proof).

    Scale: everything shuffles on value or rn over a domain-capped
    frame; the corpus contributes one partial-aggregated scan."""
    from veri_spark.operators.ranking import global_prefix_agg

    e = load_table(spark, sf_dir, "events").select("value", "ts")
    d0 = e.agg(
        F.min(F.to_date("ts")).alias("day0"),
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .cast("bigint")
        .alias("span"),
    )
    half = F.when(
        F.datediff(F.to_date("ts"), F.col("day0")) * 2 <= F.col("span"), 0
    ).otherwise(1)
    g = (
        e.crossJoin(F.broadcast(d0))
        .select("value", half.alias("half"))
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n2"),
        )
        .withColumn("one", F.lit(1).cast("bigint"))
    )
    t = g.agg(
        F.sum("n1").cast("bigint").alias("tn1"),
        F.sum("n2").cast("bigint").alias("tn2"),
        F.count(F.lit(1)).cast("bigint").alias("n_domain"),
    )
    c = global_prefix_agg(
        g,
        [F.col("value").asc()],
        ["n1", "n2", "one"],
        agg="sum",
        out_col=["c1", "c2", "rn"],
    ).select("value", "c1", "c2", "rn")
    a = c.select("c1", "c2", F.col("rn").alias("rna"), F.col("value").alias("va"))
    b = c.select(F.col("rn").alias("rnb"), F.col("value").alias("vb"))
    p = a.join(b, F.col("rnb") == F.col("rna") + 1).select(
        "c1", "c2", (F.col("vb") - F.col("va")).alias("gap")
    )
    q = (
        p.crossJoin(F.broadcast(t))
        .filter((F.col("tn1") > 0) & (F.col("tn2") > 0))
        .select(
            "tn1",
            "tn2",
            "n_domain",
            F.floor(
                F.lit(1e9)
                * F.abs(
                    F.col("c1") / (F.col("tn1") * F.lit(1.0))
                    - F.col("c2") / (F.col("tn2") * F.lit(1.0))
                )
                * F.col("gap")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("term_nano"),
        )
    )
    return q.groupBy("tn1", "tn2", "n_domain").agg(
        F.round(F.sum("term_nano") / F.lit(1e9), 6).alias("wasserstein_1")
    ).select(
        F.col("tn1").alias("n_early"),
        F.col("tn2").alias("n_late"),
        "n_domain",
        "wasserstein_1",
    )


@register(
    "hellinger_tv_event_drift",
    """
    WITH d0 AS (SELECT MIN(ts::DATE) AS day0,
                       date_diff('day', MIN(ts::DATE), MAX(ts::DATE))::BIGINT
                         AS span
                FROM events),
    e AS (SELECT event_type,
                 CASE WHEN date_diff('day', d0.day0, ts::DATE) * 2 <= d0.span
                      THEN 0 ELSE 1 END AS half
          FROM events CROSS JOIN d0),
    c AS (SELECT event_type,
                 SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS a_n,
                 SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS b_n
          FROM e GROUP BY event_type),
    t AS (SELECT SUM(a_n)::BIGINT AS ta, SUM(b_n)::BIGINT AS tb FROM c),
    q AS (SELECT
            CAST(FLOOR(1e9 * sqrt(c.a_n / (t.ta * 1.0)
                                  * (c.b_n / (t.tb * 1.0))) + 0.5)
                 AS BIGINT) AS bc_nano,
            CAST(FLOOR(1e9 * abs(c.a_n / (t.ta * 1.0)
                                 - c.b_n / (t.tb * 1.0)) + 0.5)
                 AS BIGINT) AS ad_nano
          FROM c CROSS JOIN t WHERE t.ta > 0 AND t.tb > 0),
    s AS (SELECT COUNT(*)::BIGINT AS k,
                 SUM(bc_nano) AS bc_sum, SUM(ad_nano) AS ad_sum FROM q)
    SELECT t.ta AS n_early, t.tb AS n_late, s.k AS n_types,
           ROUND(sqrt(1.0 - LEAST(s.bc_sum / 1e9, 1.0)), 6) AS hellinger,
           ROUND(s.ad_sum / 2e9, 6) AS total_variation
    FROM s CROSS JOIN t
    """,
)
def hellinger_tv_event_drift(spark, sf_dir):
    """Hellinger distance and total-variation distance between the
    early-half and late-half event-type distributions — the bounded
    f-divergence pair next to `js_divergence_event_drift`'s
    information-theoretic terms (JS is unbounded-ish in interpretation
    and per-type here; H and TV are true metrics in [0,1] with the
    textbook inequality H^2 <= TV <= H*sqrt(2), so reporting both
    cross-checks each against the other). Same half-split CTEs as JS;
    per-type Bhattacharyya and |p - q| terms are nano-quantized from one
    fixed-order double expression of exact BIGINT counts before the
    5-row fold (order-proof); the Bhattacharyya sum clamps to 1.0 before
    the final sqrt so quantization can never produce sqrt of a negative.

    Scale: one partial-aggregated scan to the 5-type frame."""
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    d0 = e.agg(
        F.min(F.to_date("ts")).alias("day0"),
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .cast("bigint")
        .alias("span"),
    )
    half = F.when(
        F.datediff(F.to_date("ts"), F.col("day0")) * 2 <= F.col("span"), 0
    ).otherwise(1)
    c = (
        e.crossJoin(F.broadcast(d0))
        .select("event_type", half.alias("half"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("a_n"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("b_n"),
        )
    )
    t = c.agg(
        F.sum("a_n").cast("bigint").alias("ta"),
        F.sum("b_n").cast("bigint").alias("tb"),
    )
    p = F.col("a_n") / (F.col("ta") * F.lit(1.0))
    q = F.col("b_n") / (F.col("tb") * F.lit(1.0))
    qf = (
        c.crossJoin(F.broadcast(t))
        .filter((F.col("ta") > 0) & (F.col("tb") > 0))
        .select(
            F.floor(F.lit(1e9) * F.sqrt(p * q) + F.lit(0.5))
            .cast("bigint")
            .alias("bc_nano"),
            F.floor(F.lit(1e9) * F.abs(p - q) + F.lit(0.5))
            .cast("bigint")
            .alias("ad_nano"),
        )
    )
    s = qf.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("bc_nano").alias("bc_sum"),
        F.sum("ad_nano").alias("ad_sum"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        F.col("ta").alias("n_early"),
        F.col("tb").alias("n_late"),
        F.col("k").alias("n_types"),
        F.round(
            F.sqrt(F.lit(1.0) - F.least(F.col("bc_sum") / F.lit(1e9), F.lit(1.0))),
            6,
        ).alias("hellinger"),
        F.round(F.col("ad_sum") / F.lit(2e9), 6).alias("total_variation"),
    )


@register(
    "expected_calibration_error",
    f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
               FROM documents),
    s AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                 len(list_filter(ws, w -> w IN
                     ({EN_STOPWORDS_SQL}))) AS hits,
                 len(ws) AS n
          FROM t WHERE len(ws) > 0),
    b AS (SELECT LEAST((10 * hits) // n, 9)::INT AS bin,
                 pos,
                 CAST(round(1e6 * hits / n) AS BIGINT) AS s_micro
          FROM s),
    bins AS (SELECT bin,
                    COUNT(*)::BIGINT AS n_docs,
                    CAST(round(SUM(s_micro)::DOUBLE / COUNT(*)) AS BIGINT)
                      AS conf_micro,
                    CAST(round(1e6 * SUM(pos) / COUNT(*)) AS BIGINT)
                      AS emp_micro
             FROM b GROUP BY bin),
    tot AS (SELECT SUM(n_docs)::BIGINT AS n FROM bins)
    SELECT tot.n AS n_docs,
           COUNT(*)::BIGINT AS n_bins,
           CAST(round(SUM(bins.n_docs * abs(bins.emp_micro
                                            - bins.conf_micro))::DOUBLE
                      / tot.n) AS BIGINT) AS ece_micro,
           MAX(abs(bins.emp_micro - bins.conf_micro))::BIGINT AS mce_micro
    FROM bins CROSS JOIN tot GROUP BY tot.n
    """,
)
def expected_calibration_error(spark, sf_dir):
    """Expected and maximum calibration error of the stopword-ratio
    language scorer — the SCALAR a pipeline thresholds where
    `calibration_reliability_bins` draws the full curve: ECE is the
    doc-weighted mean of the per-bin |empirical rate - mean confidence|
    gaps, MCE the worst bin (Naeini et al. 2015, the standard pairing).
    Identical bin construction to the reliability query (integer
    floor-division bins, micro-quantized per-doc scores), then the gaps
    are EXACT BIGINT differences of the bins' micro integers — the
    weighted fold n_b * gap_b is exact integer arithmetic (< n * 1e6,
    no overflow until 9e12 docs) with ONE final half-up division.

    Scale: one tokenize scan, a 10-row bin frame, exact arithmetic on
    10 rows."""
    from veri_spark.functions.text import EN_STOPWORDS, tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", tokens("text").alias("ws"))
    s = t.filter(F.size("ws") > 0).select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        F.size(F.filter(F.col("ws"), lambda w: w.isin(*EN_STOPWORDS))).alias(
            "hits"
        ),
        F.size("ws").alias("n"),
    )
    b = s.select(
        F.least(F.expr("(10 * hits) div n"), F.lit(9)).cast("int").alias("bin"),
        "pos",
        F.round(F.lit(1e6) * F.col("hits") / F.col("n"))
        .cast("bigint")
        .alias("s_micro"),
    )
    bins = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.sum("s_micro").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("conf_micro"),
        F.round(F.lit(1e6) * F.sum("pos") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("emp_micro"),
    )
    tot = bins.agg(F.sum("n_docs").cast("bigint").alias("n"))
    gap = F.abs(F.col("emp_micro") - F.col("conf_micro"))
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.round(
                F.sum(F.col("n_docs") * gap).cast("double") / F.col("n")
            )
            .cast("bigint")
            .alias("ece_micro"),
            F.max(gap).cast("bigint").alias("mce_micro"),
        )
        .select(F.col("n").alias("n_docs"), "n_bins", "ece_micro", "mce_micro")
    )


@register(
    "nelson_aalen_time_to_purchase",
    """
    WITH u AS (SELECT user_id,
                      MIN(epoch_us(ts::TIMESTAMP)) AS fu,
                      MIN(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts::TIMESTAMP) END) AS pu,
                      MAX(epoch_us(ts::TIMESTAMP)) AS lu
               FROM events GROUP BY user_id),
    uu AS (SELECT CASE WHEN pu IS NOT NULL
                            AND (pu - fu) // 3600000000 < 48
                       THEN (pu - fu) // 3600000000
                       ELSE LEAST(48, (lu - fu) // 3600000000)
                  END::BIGINT AS t,
                  CASE WHEN pu IS NOT NULL
                            AND (pu - fu) // 3600000000 < 48
                       THEN 1 ELSE 0 END AS e
           FROM u),
    d AS (SELECT t, SUM(e)::BIGINT AS d_t, COUNT(*)::BIGINT AS m_t
          FROM uu GROUP BY t),
    r AS (SELECT t, d_t,
                 SUM(m_t) OVER (ORDER BY t DESC)::BIGINT AS n_t
          FROM d),
    k AS (SELECT t, d_t, n_t,
                 CAST(FLOOR(1e9 * d_t / (n_t * 1.0) + 0.5) AS BIGINT)
                   AS haz_nano,
                 CAST(FLOOR(1e9 * d_t / (n_t * 1.0 * n_t) + 0.5) AS BIGINT)
                   AS var_nano
          FROM r WHERE d_t > 0)
    SELECT t AS t_hours, n_t AS n_at_risk, d_t AS n_events,
           SUM(haz_nano) OVER (ORDER BY t ASC)::BIGINT
             AS cum_hazard_nano,
           SUM(var_nano) OVER (ORDER BY t ASC)::BIGINT
             AS cum_hazard_var_nano
    FROM k ORDER BY t_hours ASC
    """,
)
def nelson_aalen_time_to_purchase(spark, sf_dir):
    """Nelson-Aalen cumulative hazard of time to first purchase — the
    hazard-scale companion to `kaplan_meier_time_to_purchase` on the
    SAME risk sets (same 48-hour horizon, same censoring): H(t) =
    sum d_i/n_i with the Aalen variance sum d_i/n_i^2. KM answers
    "what fraction survives"; the NA slope is the INSTANTANEOUS
    conversion intensity, the curve a marketing-timing or TTL decision
    actually differentiates (and exp(-H) is the Fleming-Harrington
    survival estimate, a drop-in KM cross-check — left to the reader
    like KM's exp, since exp is not correctly-rounded cross-engine).
    Each increment is nano-quantized from a ratio of exact BIGINTs
    before the prefix fold, so both running sums are exact integers.
    Same scale shape as KM: corpus to user grain in one partial
    aggregate, then a horizon-bounded (<= 49-row) time frame where the
    suffix risk-set and prefix hazard sums run as TRIANGULAR BROADCAST
    FOLDS (the KM discipline — no window function anywhere; the
    oracle's windows are the bounded-frame SQL mirror).
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = e.groupBy("user_id").agg(
        F.min(us).alias("fu"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("pu"),
        F.max(us).alias("lu"),
    )
    lag = (F.col("pu") - F.col("fu")) / F.lit(3600000000)
    lagf = F.floor(lag).cast("bigint")
    obs = F.col("pu").isNotNull() & (lagf < 48)
    cens = F.least(
        F.lit(48).cast("bigint"),
        F.floor((F.col("lu") - F.col("fu")) / F.lit(3600000000)).cast("bigint"),
    )
    uu = u.select(
        F.when(obs, lagf).otherwise(cens).cast("bigint").alias("t"),
        F.when(obs, 1).otherwise(0).alias("e"),
    )
    d = uu.groupBy("t").agg(
        F.sum("e").cast("bigint").alias("d_t"),
        F.count(F.lit(1)).cast("bigint").alias("m_t"),
    )
    # suffix risk set + prefix hazard sums over the <=49-row horizon
    # frame: triangular broadcast folds, the KM discipline (deliberately
    # not windows — the frame is horizon-bounded and the join broadcasts)
    other = d.select(F.col("t").alias("t2"), F.col("m_t").alias("m2"))
    r = (
        d.join(F.broadcast(other), F.col("t2") >= F.col("t"))
        .groupBy("t", "d_t")
        .agg(F.sum("m2").cast("bigint").alias("n_t"))
    )
    k = r.filter(F.col("d_t") > 0).select(
        "t",
        "d_t",
        "n_t",
        F.floor(
            F.lit(1e9) * F.col("d_t") / (F.col("n_t") * F.lit(1.0)) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("haz_nano"),
        F.floor(
            F.lit(1e9)
            * F.col("d_t")
            / (F.col("n_t") * F.lit(1.0) * F.col("n_t"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("var_nano"),
    )
    ks = k.select(
        F.col("t").alias("t3"),
        F.col("haz_nano").alias("h3"),
        F.col("var_nano").alias("v3"),
    )
    return (
        k.join(F.broadcast(ks), F.col("t3") <= F.col("t"))
        .groupBy("t", "n_t", "d_t")
        .agg(
            F.sum("h3").cast("bigint").alias("cum_hazard_nano"),
            F.sum("v3").cast("bigint").alias("cum_hazard_var_nano"),
        )
        .select(
            F.col("t").alias("t_hours"),
            F.col("n_t").alias("n_at_risk"),
            F.col("d_t").alias("n_events"),
            "cum_hazard_nano",
            "cum_hazard_var_nano",
        )
        .orderBy(F.col("t_hours").asc())
    )
