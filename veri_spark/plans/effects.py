"""Effect sizes and association measures — the magnitude companions to
the registry's significance tests.

Round 9 finished the nonparametric TEST panel (Kruskal-Wallis, Mood,
Friedman, Wilcoxon...); at 100 TB every test is "significant", so the
question a data pipeline actually asks is HOW BIG: Cramer's V next to
the chi-square, Cohen's d next to the t-machinery, kappa next to
rule-agreement rates, gamma/tau-b next to Spearman, the uncertainty
coefficient next to mutual information, the odds ratio with its
confidence interval next to the conversion z-test. Every query here is
the standard published estimator re-expressed in the registry's
determinism discipline:

- contingency tables collapse to their bounded domain (5 event types x
  7 weekdays, 50 quantities x 7 line numbers, 5 langs x 20 sources)
  before ANY per-cell math — one partial-aggregated corpus scan, then
  broadcast-sized frames;
- per-cell chi-square / log terms are nano- or micro-quantized integers
  folded as BIGINT (the Brier/MI idiom), so multi-cell sums are
  order-proof;
- pair-counting statistics (gamma, tau-b, Somers' D) fold exact
  DECIMAL(38,0) products over the bounded CELL-pair join — never a
  row-level pair join;
- the final statistic is ONE fixed-order double expression of exact
  integers, mirrored token-for-token in the DuckDB oracle; degenerate
  denominators guard to NULL identically in both engines (ANSI mode);
- normal quantiles are Python literals (Acklam probit), never computed
  in-engine.

Reference scope note: the reference engine (veri) exposes aggregation
hooks over scored result sets (proto:35, group reduce); these
statistics are the analytics layer a user builds ON that surface —
cited as north-star extensions in SURVEY.md section 2.8.

Registered into ``plans._base.QUERIES``/``ORACLES`` at import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from veri_spark.functions.text import EN_STOPWORDS_SQL, en_stopword_ratio
from veri_spark.plans._base import fan_parallel, register
from veri_spark.plans.events_behavior import _acklam_probit
from veri_spark.sources.catalog import load_table

# Python-side literals (the registry's constant rule: quantiles are never
# computed in-engine). probit(0.975) and its square (= chi-square 95%
# critical value at 1 df); spot-pinned by tests/test_round10_batch.py.
_Z975 = _acklam_probit(0.975)
_CHI2_95_DF1 = _Z975 * _Z975


# Shared SQL fragment: the event_type x weekday contingency cells with
# both margins and the grand total. DuckDB's dayofweek() is 0=Sunday;
# Spark's F.dayofweek is 1=Sunday, so the Spark side subtracts 1
# (the weekday-profile idiom).
_TYPE_DOW_SQL = """
    WITH e AS (SELECT event_type, dayofweek(ts)::BIGINT AS dow FROM events),
    c AS (SELECT event_type, dow, COUNT(*)::BIGINT AS o FROM e GROUP BY 1, 2),
    rt AS (SELECT event_type, SUM(o)::BIGINT AS r_tot FROM c GROUP BY 1),
    ct AS (SELECT dow, SUM(o)::BIGINT AS c_tot FROM c GROUP BY 1),
    t AS (SELECT SUM(o)::BIGINT AS n FROM c),
    grid AS (
      SELECT rt.event_type, ct.dow, rt.r_tot, ct.c_tot,
             COALESCE(c.o, 0)::BIGINT AS o
      FROM rt CROSS JOIN ct
      LEFT JOIN c ON c.event_type = rt.event_type AND c.dow = ct.dow)
"""


def _type_dow_grid(spark, sf_dir):
    """Spark twin of ``_TYPE_DOW_SQL``: the COMPLETE r x c grid (absent
    cells materialized with o = 0 — the textbook chi-square sums over all
    cells, and a zero cell still contributes (0-E)^2/E = E), margins and
    total attached, every frame broadcast-sized after one corpus scan."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type", (F.dayofweek("ts") - 1).cast("bigint").alias("dow")
    )
    c = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rt = c.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("r_tot"))
    ct = c.groupBy("dow").agg(F.sum("o").cast("bigint").alias("c_tot"))
    t = c.agg(F.sum("o").cast("bigint").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(F.broadcast(c), ["event_type", "dow"], "left")
        .select(
            "event_type",
            "dow",
            "r_tot",
            "c_tot",
            F.coalesce(F.col("o"), F.lit(0)).cast("bigint").alias("o"),
        )
    )
    return grid, rt, ct, t


@register(
    "cramers_v_type_weekday",
    _TYPE_DOW_SQL
    + """,
    x AS (SELECT CAST(round(1e9 * (
             (g.o - g.r_tot * (g.c_tot * 1.0) / t.n)
             * (g.o - g.r_tot * (g.c_tot * 1.0) / t.n)
             / (g.r_tot * (g.c_tot * 1.0) / t.n))) AS BIGINT) AS chi_nano
          FROM grid g CROSS JOIN t),
    d AS (SELECT (SELECT COUNT(*) FROM rt)::BIGINT AS r,
                 (SELECT COUNT(*) FROM ct)::BIGINT AS c,
                 (SELECT n FROM t)::BIGINT AS n,
                 SUM(chi_nano) AS chs
          FROM x)
    SELECT n AS n_events, r AS n_types, c AS n_weekdays,
           ROUND(chs / 1e9, 6) AS chi2,
           CASE WHEN LEAST(r, c) > 1
                THEN ROUND(sqrt(chs / 1e9 / (n * (LEAST(r, c) - 1.0))), 6)
                ELSE NULL END AS cramers_v,
           ROUND(sqrt(chs / 1e9 / n), 6) AS cohen_w,
           CASE WHEN n > 1 AND LEAST(r - (r - 1.0) * (r - 1.0) / (n - 1.0),
                                     c - (c - 1.0) * (c - 1.0) / (n - 1.0))
                               - 1.0 > 0
                THEN ROUND(sqrt(
                       GREATEST(chs / 1e9 / n
                                - (r - 1.0) * (c - 1.0) / (n - 1.0), 0.0)
                       / (LEAST(r - (r - 1.0) * (r - 1.0) / (n - 1.0),
                                c - (c - 1.0) * (c - 1.0) / (n - 1.0))
                          - 1.0)), 6)
                ELSE NULL END AS cramers_v_corrected
    FROM d
    """,
)
def cramers_v_type_weekday(spark, sf_dir):
    """Cramer's V for the event_type x weekday contingency — the effect
    SIZE the chi-square family (`lang_source_chi2`, `copurchase_lift_chi2`)
    deliberately doesn't report: at 100 TB every independence test
    rejects, and V = sqrt(chi2 / (n * (min(r,c)-1))) in [0,1] is the
    scale-free number you actually compare across corpora. Reports
    Cohen's w = sqrt(chi2/n) (the power-analysis input) and the
    Bergsma bias-corrected V (phi2 shrunk by its independence-null
    expectation (r-1)(c-1)/(n-1) — plain V is inflated on small n, and
    the corrected form is what makes tiny-sample and 100 TB numbers
    comparable). The grid is the COMPLETE r x c frame (zero cells
    materialized — an empty cell still contributes E to chi2); each
    cell's (O-E)^2/E is nano-quantized from one fixed-order double
    expression of exact BIGINTs so the 35-cell fold is order-proof
    (the Brier idiom); every V/w formula is then a fixed-order
    expression of the one integer chi_nano sum. No significance verdict
    on purpose — the magnitude IS the deliverable, the tests live in
    the nonparametric module.

    Scale: one partial-aggregated corpus scan to the 35-cell frame;
    everything after is broadcast arithmetic on <= 35 rows."""
    grid, rt, ct, t = _type_dow_grid(spark, sf_dir)
    e_exp = F.col("r_tot") * (F.col("c_tot") * F.lit(1.0)) / F.col("n")
    x = grid.crossJoin(F.broadcast(t)).select(
        F.round(
            F.lit(1e9)
            * ((F.col("o") - e_exp) * (F.col("o") - e_exp) / e_exp)
        )
        .cast("bigint")
        .alias("chi_nano"),
    )
    r_cnt = rt.agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    c_cnt = ct.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    d = (
        x.agg(F.sum("chi_nano").alias("chs"))
        .crossJoin(F.broadcast(r_cnt))
        .crossJoin(F.broadcast(c_cnt))
        .crossJoin(F.broadcast(t))
    )
    r, c, n, chs = (F.col(k) for k in ("r", "c", "n", "chs"))
    chi2 = chs / F.lit(1e9)
    phi2 = chs / F.lit(1e9) / n
    r_adj = r - (r - F.lit(1.0)) * (r - F.lit(1.0)) / (n - F.lit(1.0))
    c_adj = c - (c - F.lit(1.0)) * (c - F.lit(1.0)) / (n - F.lit(1.0))
    min_adj = F.least(r_adj, c_adj) - F.lit(1.0)
    phi2c = F.greatest(
        phi2 - (r - F.lit(1.0)) * (c - F.lit(1.0)) / (n - F.lit(1.0)),
        F.lit(0.0),
    )
    return d.select(
        n.alias("n_events"),
        r.alias("n_types"),
        c.alias("n_weekdays"),
        F.round(chi2, 6).alias("chi2"),
        F.when(
            F.least(r, c) > 1,
            F.round(F.sqrt(chi2 / (n * (F.least(r, c) - F.lit(1.0)))), 6),
        ).alias("cramers_v"),
        F.round(F.sqrt(phi2), 6).alias("cohen_w"),
        F.when(
            (n > 1) & (min_adj > 0),
            F.round(F.sqrt(phi2c / min_adj), 6),
        ).alias("cramers_v_corrected"),
    )


@register(
    "pearson_residuals_type_weekday",
    _TYPE_DOW_SQL
    + """
    SELECT g.event_type, g.dow, g.o AS n_obs,
           CAST(round(1000 * (g.r_tot * (g.c_tot * 1.0) / t.n))
                AS BIGINT) AS expected_milli,
           ROUND((g.o - g.r_tot * (g.c_tot * 1.0) / t.n)
                 / sqrt(g.r_tot * (g.c_tot * 1.0) / t.n), 6)
             AS pearson_resid
    FROM grid g CROSS JOIN t
    ORDER BY g.event_type ASC, g.dow ASC
    """,
)
def pearson_residuals_type_weekday(spark, sf_dir):
    """Standardized (Pearson) residuals (O-E)/sqrt(E) for every cell of
    the event_type x weekday table — the drill-down under
    `cramers_v_type_weekday`: the omnibus statistic says THAT the table
    is dependent, the residual map says WHICH cells drive it (|resid| >
    2 is the conventional callout). The full 35-cell grid (zero cells
    included) with expected counts milli-quantized; the residual is one
    fixed-order double expression of exact integers (division and sqrt
    are IEEE-correctly-rounded, so identical inputs + identical
    association order = bit-identical output — the registry's
    sqrt/division rule). Bounded output, full (type, dow) order.

    Scale: identical to the parent — one corpus scan, then a 35-row
    broadcast frame."""
    grid, _rt, _ct, t = _type_dow_grid(spark, sf_dir)
    e_exp = F.col("r_tot") * (F.col("c_tot") * F.lit(1.0)) / F.col("n")
    return (
        grid.crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "dow",
            F.col("o").alias("n_obs"),
            F.round(F.lit(1000) * e_exp).cast("bigint").alias(
                "expected_milli"
            ),
            F.round((F.col("o") - e_exp) / F.sqrt(e_exp), 6).alias(
                "pearson_resid"
            ),
        )
        .orderBy(F.col("event_type").asc(), F.col("dow").asc())
    )


@register(
    "cohens_d_purchase_view",
    """
    WITH e AS (SELECT event_type, value FROM events
               WHERE event_type IN ('purchase', 'view')),
    s AS (SELECT
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END)::BIGINT AS na,
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                END)::BIGINT AS nb,
            SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS s1a,
            SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value * value AS DECIMAL(28,4))
                     ELSE CAST(0 AS DECIMAL(28,4)) END)::DOUBLE AS s2a,
            SUM(CASE WHEN event_type = 'view'
                     THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS s1b,
            SUM(CASE WHEN event_type = 'view'
                     THEN CAST(value * value AS DECIMAL(28,4))
                     ELSE CAST(0 AS DECIMAL(28,4)) END)::DOUBLE AS s2b
          FROM e),
    v AS (SELECT na, nb, s1a, s1b,
                 (s2a - s1a * s1a / na) / (na - 1.0) AS va,
                 (s2b - s1b * s1b / nb) / (nb - 1.0) AS vb
          FROM s WHERE na > 1 AND nb > 1)
    SELECT na AS n_purchase, nb AS n_view,
           ROUND(s1a / na - s1b / nb, 6) AS mean_diff,
           CASE WHEN ((na - 1.0) * va + (nb - 1.0) * vb)
                     / (na + nb - 2.0) > 0
                THEN ROUND((s1a / na - s1b / nb)
                           / sqrt(((na - 1.0) * va + (nb - 1.0) * vb)
                                  / (na + nb - 2.0)), 6)
                ELSE NULL END AS cohens_d,
           CASE WHEN ((na - 1.0) * va + (nb - 1.0) * vb)
                     / (na + nb - 2.0) > 0
                THEN ROUND((s1a / na - s1b / nb)
                           / sqrt(((na - 1.0) * va + (nb - 1.0) * vb)
                                  / (na + nb - 2.0))
                           * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6)
                ELSE NULL END AS hedges_g
    FROM v
    """,
)
def cohens_d_purchase_view(spark, sf_dir):
    """Cohen's d (standardized mean difference, pooled sample SD) between
    purchase and view event values, with the Hedges small-sample
    correction g = d * (1 - 3/(4(n1+n2) - 9)) — the magnitude companion
    to `cliffs_delta_purchase_view` (delta is ordinal and outlier-proof;
    d is the metric effect every power calculation and meta-analysis
    expects, and comparing the two flags tail-driven differences). Group
    moment sums fold as exact DECIMALs in ONE conditional-aggregation
    corpus scan (the `value_moments_by_type` idiom — order-insensitive
    at any parallelism, cast ::DOUBLE once), and d/g are single
    fixed-order double expressions of those six exact numbers, mirrored
    token-for-token in the oracle. Degenerate pooled variance (constant
    values) guards to NULL in both engines; n<=1 groups collapse the
    frame to zero rows identically.

    Scale: one partial-aggregated scan to six numbers; nothing else."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    is_a = F.col("event_type") == "purchase"
    v = F.col("value")
    dec0_18 = F.lit(0).cast("decimal(18,2)")
    dec0_28 = F.lit(0).cast("decimal(28,4)")
    s = e.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("na"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("bigint").alias("nb"),
        F.sum(F.when(is_a, v.cast("decimal(18,2)")).otherwise(dec0_18))
        .cast("double")
        .alias("s1a"),
        F.sum(F.when(is_a, (v * v).cast("decimal(28,4)")).otherwise(dec0_28))
        .cast("double")
        .alias("s2a"),
        F.sum(F.when(~is_a, v.cast("decimal(18,2)")).otherwise(dec0_18))
        .cast("double")
        .alias("s1b"),
        F.sum(F.when(~is_a, (v * v).cast("decimal(28,4)")).otherwise(dec0_28))
        .cast("double")
        .alias("s2b"),
    ).filter((F.col("na") > 1) & (F.col("nb") > 1))
    na, nb = F.col("na"), F.col("nb")
    s1a, s1b = F.col("s1a"), F.col("s1b")
    va = (F.col("s2a") - s1a * s1a / na) / (na - F.lit(1.0))
    vb = (F.col("s2b") - s1b * s1b / nb) / (nb - F.lit(1.0))
    sp2 = ((na - F.lit(1.0)) * va + (nb - F.lit(1.0)) * vb) / (
        na + nb - F.lit(2.0)
    )
    d = (s1a / na - s1b / nb) / F.sqrt(sp2)
    corr = F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (na + nb) - F.lit(9.0))
    return s.select(
        na.alias("n_purchase"),
        nb.alias("n_view"),
        F.round(s1a / na - s1b / nb, 6).alias("mean_diff"),
        F.when(sp2 > 0, F.round(d, 6)).alias("cohens_d"),
        F.when(sp2 > 0, F.round(d * corr, 6)).alias("hedges_g"),
    )


@register(
    "weekend_purchase_effect",
    f"""
    WITH e AS (SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                        AS wkend,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                        AS conv
               FROM events),
    s AS (SELECT
            SUM(CASE WHEN wkend = 1 AND conv = 1 THEN 1 ELSE 0
                END)::BIGINT AS a,
            SUM(CASE WHEN wkend = 1 AND conv = 0 THEN 1 ELSE 0
                END)::BIGINT AS b,
            SUM(CASE WHEN wkend = 0 AND conv = 1 THEN 1 ELSE 0
                END)::BIGINT AS c,
            SUM(CASE WHEN wkend = 0 AND conv = 0 THEN 1 ELSE 0
                END)::BIGINT AS d
          FROM e)
    SELECT a + b AS n_weekend, c + d AS n_weekday,
           a AS n_weekend_purchase, c AS n_weekday_purchase,
           ROUND(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5)), 6)
             AS odds_ratio,
           ROUND(ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))), 6)
             AS log_or,
           ROUND(ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5)))
                 - {_Z975!r} * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                                    + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)), 6)
             AS log_or_ci_lo,
           ROUND(ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5)))
                 + {_Z975!r} * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                                    + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)), 6)
             AS log_or_ci_hi,
           ROUND(((a + 0.5) / (a + b + 1.0))
                 / ((c + 0.5) / (c + d + 1.0)), 6) AS risk_ratio
    FROM s
    """,
)
def weekend_purchase_effect(spark, sf_dir):
    """Odds ratio and risk ratio for purchase on weekends vs weekdays,
    with the Woolf log-OR 95% interval — the 2x2 effect panel next to
    `ab_test_conversion_ztest`'s significance machinery (a z-test says
    whether the weekend effect is real; the OR with its CI says how big
    and how precisely known). Haldane-Anscombe +0.5 applied to every
    cell UNCONDITIONALLY (the standard zero-cell correction, and —
    because it is unconditional — there is no data-dependent branch to
    diverge on). The interval is reported in LOG space (exp is never
    evaluated in-engine; ln on identical doubles is the accepted
    WoE/Zipf idiom) with z = probit(0.975) injected as the Acklam
    Python literal. One conditional-aggregation corpus scan to four
    BIGINTs; every statistic is a fixed-order double expression of
    those four integers. Weekend = Saturday/Sunday: DuckDB dayofweek in
    (0, 6) vs Spark dayofweek in (1, 7) — 0=Sunday vs 1=Sunday.

    Scale: one scan, one 4-number reduce."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wkend"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    s = e.agg(
        F.sum(F.when((F.col("wkend") == 1) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("wkend") == 1) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("wkend") == 0) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("wkend") == 0) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    a, b, c, d = (F.col(k) for k in ("a", "b", "c", "d"))
    orr = ((a + F.lit(0.5)) * (d + F.lit(0.5))) / (
        (b + F.lit(0.5)) * (c + F.lit(0.5))
    )
    se = F.sqrt(
        F.lit(1.0) / (a + F.lit(0.5))
        + F.lit(1.0) / (b + F.lit(0.5))
        + F.lit(1.0) / (c + F.lit(0.5))
        + F.lit(1.0) / (d + F.lit(0.5))
    )
    rr = ((a + F.lit(0.5)) / (a + b + F.lit(1.0))) / (
        (c + F.lit(0.5)) / (c + d + F.lit(1.0))
    )
    return s.select(
        (a + b).alias("n_weekend"),
        (c + d).alias("n_weekday"),
        a.alias("n_weekend_purchase"),
        c.alias("n_weekday_purchase"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.log(orr), 6).alias("log_or"),
        F.round(F.log(orr) - F.lit(_Z975) * se, 6).alias("log_or_ci_lo"),
        F.round(F.log(orr) + F.lit(_Z975) * se, 6).alias("log_or_ci_hi"),
        F.round(rr, 6).alias("risk_ratio"),
    )


@register(
    "ordinal_association_qty_line",
    """
    WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                       l_linenumber::BIGINT AS y
                FROM lineitem),
    cell AS (SELECT x, y, COUNT(*)::BIGINT AS cnt FROM li GROUP BY x, y),
    cd AS (SELECT
             SUM(CASE WHEN c2.y > c1.y
                      THEN CAST(c1.cnt AS DECIMAL(38,0)) * c2.cnt
                      ELSE CAST(0 AS DECIMAL(38,0)) END) AS conc,
             SUM(CASE WHEN c2.y < c1.y
                      THEN CAST(c1.cnt AS DECIMAL(38,0)) * c2.cnt
                      ELSE CAST(0 AS DECIMAL(38,0)) END) AS disc
           FROM cell c1 JOIN cell c2 ON c2.x > c1.x),
    tx AS (SELECT SUM(CAST(cnt AS DECIMAL(38,0)) * cnt - cnt) AS t2x
           FROM (SELECT SUM(cnt)::BIGINT AS cnt FROM cell GROUP BY x)),
    ty AS (SELECT SUM(CAST(cnt AS DECIMAL(38,0)) * cnt - cnt) AS t2y
           FROM (SELECT SUM(cnt)::BIGINT AS cnt FROM cell GROUP BY y)),
    t AS (SELECT SUM(cnt)::BIGINT AS n FROM cell),
    z AS (SELECT cd.conc, cd.disc,
                 (CAST(t.n AS DECIMAL(38,0)) * t.n - t.n) AS n2d,
                 tx.t2x, ty.t2y
          FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN t)
    SELECT (SELECT n FROM t) AS n_rows,
           conc::BIGINT AS n_concordant, disc::BIGINT AS n_discordant,
           CASE WHEN conc + disc > 0
                THEN ROUND((conc - disc)::DOUBLE / (conc + disc)::DOUBLE, 6)
                ELSE NULL END AS gamma,
           CASE WHEN (n2d - t2x)::DOUBLE * ((n2d - t2y)::DOUBLE) > 0
                THEN ROUND(2.0 * (conc - disc)::DOUBLE
                           / sqrt((n2d - t2x)::DOUBLE
                                  * ((n2d - t2y)::DOUBLE)), 6)
                ELSE NULL END AS kendall_tau_b,
           CASE WHEN n2d - t2x > 0
                THEN ROUND(2.0 * (conc - disc)::DOUBLE
                           / (n2d - t2x)::DOUBLE, 6)
                ELSE NULL END AS somers_d_yx
    FROM z
    """,
)
def ordinal_association_qty_line(spark, sf_dir):
    """Goodman-Kruskal gamma, Kendall tau-b, and Somers' D(y|x) for the
    ordinal pair (l_quantity, l_linenumber) — the concordance panel next
    to `spearman_qty_price` (Spearman measures monotone association on
    midranks; gamma/tau-b/D are the PAIR-counting family, and the three
    differ exactly in how they charge ties, which is the diagnostic).
    Pairs are NEVER enumerated at row grain: the corpus collapses to the
    bounded 50 x 7 contingency first, concordant/discordant mass comes
    from the cell-pair join (c2.x > c1.x strictly, so each unordered
    cell pair counts once) as exact DECIMAL(38,0) products, and tie
    terms use the DOUBLED identities n2d = n(n-1), t2 = sum cnt(cnt-1)
    (doubled pair counts — no /2 anywhere, the `_mid2` trick: tau_b =
    2(C-D)/sqrt((n2d-t2x)(n2d-t2y)) and D(y|x) = 2(C-D)/(n2d-t2x) absorb
    the doubling exactly). Final statistics are single fixed-order
    double expressions of exact decimals; all-tied margins guard to
    NULL identically.

    Scale: one partial-aggregated scan to <= 350 cells, a broadcast
    350 x 350 triangular join, three tiny reduces. At 100 TB only the
    first scan touches the corpus."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.col("l_linenumber").cast("bigint").alias("y"),
    )
    cell = li.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    c1 = cell.select(
        F.col("x").alias("x1"), F.col("y").alias("y1"), F.col("cnt").alias("n1")
    )
    c2 = cell.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("cnt").alias("n2")
    )
    dec0 = F.lit(0).cast("decimal(38,0)")
    cd = c1.join(F.broadcast(c2), F.col("x2") > F.col("x1")).agg(
        F.sum(
            F.when(
                F.col("y2") > F.col("y1"),
                F.col("n1").cast("decimal(38,0)") * F.col("n2"),
            ).otherwise(dec0)
        ).alias("conc"),
        F.sum(
            F.when(
                F.col("y2") < F.col("y1"),
                F.col("n1").cast("decimal(38,0)") * F.col("n2"),
            ).otherwise(dec0)
        ).alias("disc"),
    )
    tx = (
        cell.groupBy("x")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .agg(
            F.sum(
                F.col("cnt").cast("decimal(38,0)") * F.col("cnt") - F.col("cnt")
            ).alias("t2x")
        )
    )
    ty = (
        cell.groupBy("y")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .agg(
            F.sum(
                F.col("cnt").cast("decimal(38,0)") * F.col("cnt") - F.col("cnt")
            ).alias("t2y")
        )
    )
    t = cell.agg(F.sum("cnt").cast("bigint").alias("n"))
    z = (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(t))
        .withColumn(
            "n2d", F.col("n").cast("decimal(38,0)") * F.col("n") - F.col("n")
        )
    )
    conc, disc = F.col("conc"), F.col("disc")
    n2d, t2x, t2y = F.col("n2d"), F.col("t2x"), F.col("t2y")
    cds = (conc - disc).cast("double")
    return z.select(
        F.col("n").alias("n_rows"),
        conc.cast("bigint").alias("n_concordant"),
        disc.cast("bigint").alias("n_discordant"),
        F.when(
            conc + disc > 0,
            F.round(cds / (conc + disc).cast("double"), 6),
        ).alias("gamma"),
        F.when(
            (n2d - t2x).cast("double") * ((n2d - t2y).cast("double")) > 0,
            F.round(
                F.lit(2.0)
                * cds
                / F.sqrt(
                    (n2d - t2x).cast("double") * ((n2d - t2y).cast("double"))
                ),
                6,
            ),
        ).alias("kendall_tau_b"),
        F.when(
            n2d - t2x > 0,
            F.round(F.lit(2.0) * cds / (n2d - t2x).cast("double"), 6),
        ).alias("somers_d_yx"),
    )


@register(
    "cohens_kappa_rules",
    f"""
    WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
    m AS (SELECT CASE WHEN len(ws) BETWEEN 20 AND 90 THEN 1 ELSE 0 END
                   AS r_wc,
                 CASE WHEN len(list_filter(ws,
                        w -> w IN ({EN_STOPWORDS_SQL}))) >= 2
                      THEN 1 ELSE 0 END AS r_sw
          FROM t WHERE len(ws) > 0),
    s AS (SELECT COUNT(*)::BIGINT AS n,
                 SUM(r_wc * r_sw)::BIGINT AS a,
                 SUM(CASE WHEN r_wc = 1 AND r_sw = 0 THEN 1 ELSE 0
                     END)::BIGINT AS b,
                 SUM(CASE WHEN r_wc = 0 AND r_sw = 1 THEN 1 ELSE 0
                     END)::BIGINT AS c,
                 SUM(CASE WHEN r_wc = 0 AND r_sw = 0 THEN 1 ELSE 0
                     END)::BIGINT AS d
          FROM m)
    SELECT n AS n_docs, a AS n_both_pass, d AS n_both_fail,
           b + c AS n_disagree,
           CASE WHEN (a + b) * (a + c) + (c + d) * (b + d) < n * n
                THEN ROUND(((a + d) * 1.0 / n
                            - ((a + b) * (a + c) + (c + d) * (b + d)) * 1.0
                              / (n * n))
                           / (1.0 - ((a + b) * (a + c) + (c + d) * (b + d))
                                    * 1.0 / (n * n)), 6)
                ELSE NULL END AS cohens_kappa
    FROM s
    """,
)
def cohens_kappa_rules(spark, sf_dir):
    """Cohen's kappa between the two cheapest quality gates (word count
    in [20, 90]; stopword hits >= 2) treated as two raters on the same
    documents — the chance-corrected AGREEMENT next to
    `mcnemar_rule_agreement`'s marginal test (McNemar asks "do they flag
    at different rates?"; kappa asks "beyond what their base rates force,
    do they flag the SAME docs?" — two rules can pass McNemar and still
    be useless as cross-checks). kappa = (po - pe)/(1 - pe) with po =
    (a+d)/n and pe from the marginal products; the pe < 1 degenerate is
    guarded with the INTEGER comparison (a+b)(a+c) + (c+d)(b+d) < n^2
    (no float-equality surface), and kappa is one fixed-order double
    expression of five exact BIGINTs from one corpus scan. At corpus
    sizes past ~3e9 docs the n^2 products need DECIMAL(38,0) widening —
    noted here, integer-exact at every gate SF.

    Scale: one conditional-aggregation scan; the statistic is driver-side
    arithmetic on one row."""
    from veri_spark.functions.text import EN_STOPWORDS, tokens

    docs = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("ws")
    )
    m = docs.filter(F.size("ws") > 0).select(
        F.when(F.size("ws").between(20, 90), 1).otherwise(0).alias("r_wc"),
        F.when(
            F.size(F.filter(F.col("ws"), lambda w: w.isin(*EN_STOPWORDS)))
            >= 2,
            1,
        )
        .otherwise(0)
        .alias("r_sw"),
    )
    s = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("r_wc") * F.col("r_sw")).cast("bigint").alias("a"),
        F.sum(F.when((F.col("r_wc") == 1) & (F.col("r_sw") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("r_wc") == 0) & (F.col("r_sw") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("r_wc") == 0) & (F.col("r_sw") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    n, a, b, c, d = (F.col(k) for k in ("n", "a", "b", "c", "d"))
    pe_num = (a + b) * (a + c) + (c + d) * (b + d)
    po = (a + d) * F.lit(1.0) / n
    pe = pe_num * F.lit(1.0) / (n * n)
    return s.select(
        n.alias("n_docs"),
        a.alias("n_both_pass"),
        d.alias("n_both_fail"),
        (b + c).alias("n_disagree"),
        F.when(pe_num < n * n, F.round((po - pe) / (F.lit(1.0) - pe), 6)).alias(
            "cohens_kappa"
        ),
    )


@register(
    "fleiss_kappa_rules",
    f"""
    WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
    m AS (SELECT (CASE WHEN len(ws) BETWEEN 20 AND 90 THEN 1 ELSE 0 END
                  + CASE WHEN list_sum(list_transform(ws, w -> strlen(w)))
                              * 10 BETWEEN 42 * len(ws) AND 48 * len(ws)
                         THEN 1 ELSE 0 END
                  + CASE WHEN len(list_filter(ws,
                         w -> w IN ({EN_STOPWORDS_SQL}))) >= 2
                         THEN 1 ELSE 0 END)::BIGINT AS x
          FROM t WHERE len(ws) > 0),
    s AS (SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx,
                 SUM(x * (x - 1) + (3 - x) * (2 - x))::BIGINT AS snum
          FROM m)
    SELECT n AS n_docs, sx AS sum_passes,
           CASE WHEN sx > 0 AND sx < 3 * n
                  AND 1.0 - ((sx * 1.0 / (3 * n)) * (sx * 1.0 / (3 * n))
                             + (1.0 - sx * 1.0 / (3 * n))
                               * (1.0 - sx * 1.0 / (3 * n))) > 0
                THEN ROUND((snum * 1.0 / (6 * n)
                            - ((sx * 1.0 / (3 * n)) * (sx * 1.0 / (3 * n))
                               + (1.0 - sx * 1.0 / (3 * n))
                                 * (1.0 - sx * 1.0 / (3 * n))))
                           / (1.0 - ((sx * 1.0 / (3 * n))
                                     * (sx * 1.0 / (3 * n))
                                     + (1.0 - sx * 1.0 / (3 * n))
                                       * (1.0 - sx * 1.0 / (3 * n)))), 6)
                ELSE NULL END AS fleiss_kappa
    FROM s
    """,
)
def fleiss_kappa_rules(spark, sf_dir):
    """Fleiss' kappa across all THREE quality rules (word count, mean
    word length, stopword presence) as k=3 raters x 2 categories on the
    same documents — the multi-rater agreement companion to
    `cochran_q_rules` (Q tests whether pass RATES differ; Fleiss-kappa
    scores whether the rules AGREE doc-by-doc beyond chance, which is
    what decides if a 2-of-3 ensemble gate adds signal over any single
    rule). Per-doc agreement P_i = [x(x-1) + (3-x)(2-x)]/6 for x passes
    — the numerator is an exact integer in (2, 6), so sum P_i folds as
    ONE BIGINT (snum) and Pbar = snum/(6n); chance agreement pe = p^2 +
    (1-p)^2 with p = sx/(3n). kappa = (Pbar - pe)/(1 - pe) is one
    fixed-order double expression of three exact BIGINTs; the pe = 1
    degenerate (all docs pass all rules or fail all rules) is guarded
    by the integer condition 0 < sx < 3n plus the mirrored float
    denominator check. One conditional-aggregation corpus scan.

    Scale: one scan to three numbers."""
    from veri_spark.functions.text import EN_STOPWORDS, tokens

    docs = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("ws")
    )
    chars = F.aggregate(
        F.transform(F.col("ws"), lambda w: F.length(w)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    x = (
        F.when(F.size("ws").between(20, 90), 1).otherwise(0)
        + F.when(
            (chars * 10 >= 42 * F.size("ws"))
            & (chars * 10 <= 48 * F.size("ws")),
            1,
        ).otherwise(0)
        + F.when(
            F.size(F.filter(F.col("ws"), lambda w: w.isin(*EN_STOPWORDS)))
            >= 2,
            1,
        ).otherwise(0)
    ).cast("bigint")
    m = docs.filter(F.size("ws") > 0).select(x.alias("x"))
    s = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(
            F.col("x") * (F.col("x") - 1)
            + (3 - F.col("x")) * (2 - F.col("x"))
        )
        .cast("bigint")
        .alias("snum"),
    )
    n, sx, snum = F.col("n"), F.col("sx"), F.col("snum")
    p = sx * F.lit(1.0) / (3 * n)
    pe = p * p + (F.lit(1.0) - p) * (F.lit(1.0) - p)
    pbar = snum * F.lit(1.0) / (6 * n)
    return s.select(
        n.alias("n_docs"),
        sx.alias("sum_passes"),
        F.when(
            (sx > 0) & (sx < 3 * n) & (F.lit(1.0) - pe > 0),
            F.round((pbar - pe) / (F.lit(1.0) - pe), 6),
        ).alias("fleiss_kappa"),
    )


@register(
    "matthews_corr_lang_id",
    f"""
    WITH m AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
             CASE WHEN len(list_filter(ws, w -> w IN ({EN_STOPWORDS_SQL})))::DOUBLE
                       / len(ws) >= 0.04
                  THEN 1 ELSE 0 END AS guess
      FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)
      WHERE len(ws) > 0),
    s AS (SELECT
            SUM(truth * guess)::BIGINT AS tp,
            SUM(CASE WHEN truth = 0 AND guess = 1 THEN 1 ELSE 0
                END)::BIGINT AS fp,
            SUM(CASE WHEN truth = 1 AND guess = 0 THEN 1 ELSE 0
                END)::BIGINT AS fn,
            SUM(CASE WHEN truth = 0 AND guess = 0 THEN 1 ELSE 0
                END)::BIGINT AS tn
          FROM m)
    SELECT tp AS n_tp, fp AS n_fp, fn AS n_fn, tn AS n_tn,
           CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
                  AND tn + fn > 0
                THEN ROUND((tp * tn - fp * fn) * 1.0
                           / (sqrt((tp + fp) * 1.0 * (tp + fn))
                              * sqrt((tn + fp) * 1.0 * (tn + fn))), 6)
                ELSE NULL END AS mcc,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN ROUND(2.0 * tp / (2 * tp + fp + fn), 6)
                ELSE NULL END AS f1
    FROM s
    """,
)
def matthews_corr_lang_id(spark, sf_dir):
    """Matthews correlation coefficient (plus F1) for the stopword
    language-ID heuristic against the recorded `lang` label — the
    single-number summary of `lang_confusion_matrix` that, unlike
    accuracy or F1, stays honest under class imbalance (en is ~44% of
    this corpus; at production mixes a majority-class guesser gets high
    accuracy and F1 but MCC ~= 0). MCC = (TP*TN - FP*FN) /
    sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)), computed with the denominator
    FACTORED as sqrt((TP+FP)(TP+FN)) * sqrt((TN+FP)(TN+FN)) so each
    inner product stays within BIGINT range at any plausible corpus
    (the single 4-way product overflows 64 bits past ~55k docs^4); the
    factoring is mirrored token-for-token in the oracle so the
    fixed-order result is identical. Any empty margin guards the MCC to
    NULL (the undefined case), F1 guards on its own denominator. One
    conditional-aggregation scan over a pure-expression classifier.

    Scale: one scan to four BIGINTs."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    m = docs.filter(F.size(ws) > 0).select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("truth"),
        F.when(en_stopword_ratio("text") >= 0.04, 1).otherwise(0).alias(
            "guess"
        ),
    )
    s = m.agg(
        F.sum(F.col("truth") * F.col("guess")).cast("bigint").alias("tp"),
        F.sum(F.when((F.col("truth") == 0) & (F.col("guess") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((F.col("truth") == 1) & (F.col("guess") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when((F.col("truth") == 0) & (F.col("guess") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(k) for k in ("tp", "fp", "fn", "tn"))
    mcc = (
        (tp * tn - fp * fn)
        * F.lit(1.0)
        / (
            F.sqrt((tp + fp) * F.lit(1.0) * (tp + fn))
            * F.sqrt((tn + fp) * F.lit(1.0) * (tn + fn))
        )
    )
    return s.select(
        tp.alias("n_tp"),
        fp.alias("n_fp"),
        fn.alias("n_fn"),
        tn.alias("n_tn"),
        F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tn + fp > 0) & (tn + fn > 0),
            F.round(mcc, 6),
        ).alias("mcc"),
        F.when(
            2 * tp + fp + fn > 0,
            F.round(F.lit(2.0) * tp / (2 * tp + fp + fn), 6),
        ).alias("f1"),
    )


@register(
    "uncertainty_coeff_lang_source",
    """
    WITH cell AS (SELECT lang, source, COUNT(*)::BIGINT AS nxy
                  FROM documents GROUP BY lang, source),
    mx AS (SELECT lang, SUM(nxy)::BIGINT AS nx FROM cell GROUP BY lang),
    my AS (SELECT source, SUM(nxy)::BIGINT AS ny FROM cell GROUP BY source),
    t AS (SELECT SUM(nxy)::BIGINT AS n FROM cell),
    mi AS (SELECT SUM(c.nxy
                      * CAST(floor(1e6 * ln((c.nxy * t.n)::DOUBLE
                                            / (mx.nx * my.ny)::DOUBLE) + 0.5)
                             AS BIGINT))::BIGINT AS miw
           FROM cell c JOIN mx USING (lang) JOIN my USING (source)
           CROSS JOIN t),
    hx AS (SELECT SUM(mx.nx
                      * CAST(floor(1e6 * ln(t.n::DOUBLE / mx.nx::DOUBLE)
                                   + 0.5) AS BIGINT))::BIGINT AS hxw
           FROM mx CROSS JOIN t),
    hy AS (SELECT SUM(my.ny
                      * CAST(floor(1e6 * ln(t.n::DOUBLE / my.ny::DOUBLE)
                                   + 0.5) AS BIGINT))::BIGINT AS hyw
           FROM my CROSS JOIN t)
    SELECT t.n AS n_docs, mi.miw AS mi_weighted_micro,
           hx.hxw AS h_lang_weighted_micro,
           hy.hyw AS h_source_weighted_micro,
           CASE WHEN hx.hxw > 0
                THEN ROUND(mi.miw * 1.0 / hx.hxw, 6) ELSE NULL END
             AS u_lang_given_source,
           CASE WHEN hy.hyw > 0
                THEN ROUND(mi.miw * 1.0 / hy.hyw, 6) ELSE NULL END
             AS u_source_given_lang,
           CASE WHEN hx.hxw + hy.hyw > 0
                THEN ROUND(2.0 * mi.miw / (hx.hxw + hy.hyw), 6)
                ELSE NULL END AS u_symmetric
    FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN t
    """,
)
def uncertainty_coeff_lang_source(spark, sf_dir):
    """Theil's uncertainty coefficient U(lang|source) = MI/H(lang) — the
    NORMALIZED version of `mutual_information_lang_source`: raw MI has
    units (nats) and no ceiling, U in [0,1] answers "what fraction of
    the language uncertainty does knowing the source remove?", which is
    the number you threshold when deciding whether per-source sampling
    will skew the language mixture. Reports both directions (U is
    asymmetric) plus the symmetric average 2*MI/(H(x)+H(y)). All three
    are ratios of the SAME integer-weighted sums: each cell/margin log
    term is micro-quantized in-engine (floor(1e6*ln + 0.5) of a ratio
    of exact integers — the MI idiom, guard-band-measured in
    tests/test_round9_units.py), the weighted sums fold as exact
    BIGINTs, and the common n*1e6 scale cancels so each U is ONE
    division of two exact integers. Zero-entropy margins guard to NULL
    with integer comparisons.

    Scale: one partial-aggregated corpus scan to the (lang x source)
    cell frame; three broadcast reduces of <= 100 rows."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nxy")
    )
    mx = cell.groupBy("lang").agg(F.sum("nxy").cast("bigint").alias("nx"))
    my = cell.groupBy("source").agg(F.sum("nxy").cast("bigint").alias("ny"))
    t = cell.agg(F.sum("nxy").cast("bigint").alias("n"))

    def _w_micro(num, den):
        return F.floor(
            F.lit(1e6) * F.log(num.cast("double") / den.cast("double"))
            + F.lit(0.5)
        ).cast("bigint")

    mi = (
        cell.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(t))
        .agg(
            F.sum(
                F.col("nxy")
                * _w_micro(F.col("nxy") * F.col("n"), F.col("nx") * F.col("ny"))
            )
            .cast("bigint")
            .alias("miw")
        )
    )
    hx = mx.crossJoin(F.broadcast(t)).agg(
        F.sum(F.col("nx") * _w_micro(F.col("n"), F.col("nx")))
        .cast("bigint")
        .alias("hxw")
    )
    hy = my.crossJoin(F.broadcast(t)).agg(
        F.sum(F.col("ny") * _w_micro(F.col("n"), F.col("ny")))
        .cast("bigint")
        .alias("hyw")
    )
    out = (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(t))
    )
    miw, hxw, hyw = F.col("miw"), F.col("hxw"), F.col("hyw")
    return out.select(
        F.col("n").alias("n_docs"),
        miw.alias("mi_weighted_micro"),
        hxw.alias("h_lang_weighted_micro"),
        hyw.alias("h_source_weighted_micro"),
        F.when(hxw > 0, F.round(miw * F.lit(1.0) / hxw, 6)).alias(
            "u_lang_given_source"
        ),
        F.when(hyw > 0, F.round(miw * F.lit(1.0) / hyw, 6)).alias(
            "u_source_given_lang"
        ),
        F.when(
            hxw + hyw > 0, F.round(F.lit(2.0) * miw / (hxw + hyw), 6)
        ).alias("u_symmetric"),
    )


@register(
    "cochran_armitage_weekday_trend",
    f"""
    WITH e AS (SELECT dayofweek(ts)::BIGINT AS w,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                        AS conv
               FROM events),
    g AS (SELECT w, COUNT(*)::BIGINT AS n_i, SUM(conv)::BIGINT AS a_i
          FROM e GROUP BY w),
    s AS (SELECT SUM(n_i)::BIGINT AS n, SUM(a_i)::BIGINT AS a,
                 SUM(w * a_i)::BIGINT AS s1,
                 SUM(w * n_i)::BIGINT AS s2,
                 SUM(w * w * n_i)::BIGINT AS s3
          FROM g)
    SELECT n AS n_events, a AS n_purchases,
           CASE WHEN a > 0 AND a < n AND n * s3 - s2 * s2 > 0
                THEN ROUND((CAST(n AS DECIMAL(38,0))
                            * CAST(n * s1 - a * s2 AS DECIMAL(38,0))
                            * CAST(n * s1 - a * s2 AS DECIMAL(38,0)))::DOUBLE
                           / (CAST(a AS DECIMAL(38,0)) * (n - a)
                              * (n * s3 - s2 * s2))::DOUBLE, 6)
                ELSE NULL END AS chi2_trend,
           CASE WHEN a > 0 AND a < n AND n * s3 - s2 * s2 > 0
                THEN (CAST(n AS DECIMAL(38,0))
                      * CAST(n * s1 - a * s2 AS DECIMAL(38,0))
                      * CAST(n * s1 - a * s2 AS DECIMAL(38,0)))::DOUBLE
                     / (CAST(a AS DECIMAL(38,0)) * (n - a)
                        * (n * s3 - s2 * s2))::DOUBLE
                     > {_CHI2_95_DF1!r}
                ELSE NULL END AS trend_95
    FROM s
    """,
)
def cochran_armitage_weekday_trend(spark, sf_dir):
    """Cochran-Armitage test for a LINEAR trend in purchase rate across
    the ordered weekday index (scores w = 0..6, Sunday-first) — the
    ordered-exposure companion to the per-weekday multiple-testing
    queries (`holm_weekday_conversion_tests` asks which individual days
    differ; this asks the sharper one-df question "does conversion
    drift monotonically through the week?", which a 6-df omnibus
    dilutes). Uses the exact-integer identity chi2 = N (N*S1 - A*S2)^2
    / (A (N-A) (N*S3 - S2^2)) with S1 = sum w*a_i, S2 = sum w*n_i,
    S3 = sum w^2*n_i: every sum is an exact BIGINT from one
    partial-aggregated scan over the bounded 7-row weekday frame, the
    wide products fold as DECIMAL(38,0) (the squared numerator passes
    2^63 already at ~1e5 events), and the statistic is ONE division of
    two exact decimals. Degenerate margins (no purchases, all
    purchases, single-day corpus) guard to NULL with integer
    comparisons; the verdict compares against the chi-square(1 df)
    literal probit(0.975)^2. Weekday scores match cross-engine: DuckDB
    dayofweek 0=Sunday, Spark dayofweek-1.

    Scale: one corpus scan to a 7-row frame, then scalar arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        (F.dayofweek("ts") - 1).cast("bigint").alias("w"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    g = e.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("conv").cast("bigint").alias("a_i"),
    )
    s = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("a_i").cast("bigint").alias("a"),
        F.sum(F.col("w") * F.col("a_i")).cast("bigint").alias("s1"),
        F.sum(F.col("w") * F.col("n_i")).cast("bigint").alias("s2"),
        F.sum(F.col("w") * F.col("w") * F.col("n_i"))
        .cast("bigint")
        .alias("s3"),
    )
    n, a, s1, s2, s3 = (F.col(k) for k in ("n", "a", "s1", "s2", "s3"))
    num = (
        n.cast("decimal(38,0)")
        * (n * s1 - a * s2).cast("decimal(38,0)")
        * (n * s1 - a * s2).cast("decimal(38,0)")
    ).cast("double")
    den = (
        a.cast("decimal(38,0)") * (n - a) * (n * s3 - s2 * s2)
    ).cast("double")
    ok = (a > 0) & (a < n) & (n * s3 - s2 * s2 > 0)
    return s.select(
        n.alias("n_events"),
        a.alias("n_purchases"),
        F.when(ok, F.round(num / den, 6)).alias("chi2_trend"),
        F.when(ok, num / den > F.lit(_CHI2_95_DF1)).alias("trend_95"),
    )


# ---------------------------------------------------------------------------
# Round 10: the parametric two-sample / k-sample mean machinery the panel
# referenced but never shipped — Welch's t (the test cohens_d sizes),
# one-way ANOVA (the test Kruskal-Wallis shadows), and a deterministic
# sign-flip randomization test (the distribution-free cross-check).
# ---------------------------------------------------------------------------

# F(4, inf) 95% critical value = chi2_95(4)/4 (exact relation); the KW
# module's chi-square literal divided by 4, pinned like every quantile.
_F_95_DF4_INF = 9.487729036781154 / 4.0


@register(
    "welch_ttest_purchase_view",
    """
    WITH e AS (SELECT event_type, value FROM events
               WHERE event_type IN ('purchase', 'view')),
    s AS (SELECT
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END)::BIGINT AS na,
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                END)::BIGINT AS nb,
            SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS s1a,
            SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value * value AS DECIMAL(28,4))
                     ELSE CAST(0 AS DECIMAL(28,4)) END)::DOUBLE AS s2a,
            SUM(CASE WHEN event_type = 'view'
                     THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS s1b,
            SUM(CASE WHEN event_type = 'view'
                     THEN CAST(value * value AS DECIMAL(28,4))
                     ELSE CAST(0 AS DECIMAL(28,4)) END)::DOUBLE AS s2b
          FROM e),
    v AS (SELECT na, nb, s1a, s1b,
                 (s2a - s1a * s1a / na) / (na - 1.0) / na AS sea,
                 (s2b - s1b * s1b / nb) / (nb - 1.0) / nb AS seb
          FROM s WHERE na > 1 AND nb > 1)
    SELECT na AS n_purchase, nb AS n_view,
           CASE WHEN sea + seb > 0
                THEN ROUND((s1a / na - s1b / nb) / sqrt(sea + seb), 6)
                ELSE NULL END AS welch_t,
           CASE WHEN sea > 0 AND seb > 0
                THEN ROUND((sea + seb) * (sea + seb)
                           / (sea * sea / (na - 1.0)
                              + seb * seb / (nb - 1.0)), 6)
                ELSE NULL END AS satterthwaite_df,
           CASE WHEN sea + seb > 0
                THEN abs((s1a / na - s1b / nb) / sqrt(sea + seb))
                     > 1.959963984540054
                ELSE NULL END AS means_differ_95
    FROM v
    """,
)
def welch_ttest_purchase_view(spark, sf_dir):
    """Welch's unequal-variance t-test between purchase and view event
    values, with the Satterthwaite effective degrees of freedom — the
    TEST whose effect `cohens_d_purchase_view` sizes (and the correct
    default over Student's pooled t: it never assumes the two variances
    match, which purchase/view values visibly don't). Same six exact
    DECIMAL moment sums as cohens_d in one conditional-aggregation scan;
    t and df are single fixed-order double expressions of those exact
    numbers. The 95% verdict compares |t| against the normal quantile
    (a Python literal) — exact for the df this data produces (both
    groups are thousands of rows; at df > 200 the t and z quantiles
    agree past the 3rd decimal), and the df is REPORTED so a reader can
    check the approximation. Zero-variance degenerate guards to NULL in
    both engines.

    Scale: one partial-aggregated scan to six numbers; nothing else."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    is_a = F.col("event_type") == "purchase"
    v = F.col("value")
    dec0_18 = F.lit(0).cast("decimal(18,2)")
    dec0_28 = F.lit(0).cast("decimal(28,4)")
    s = e.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("na"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("bigint").alias("nb"),
        F.sum(F.when(is_a, v.cast("decimal(18,2)")).otherwise(dec0_18))
        .cast("double")
        .alias("s1a"),
        F.sum(F.when(is_a, (v * v).cast("decimal(28,4)")).otherwise(dec0_28))
        .cast("double")
        .alias("s2a"),
        F.sum(F.when(~is_a, v.cast("decimal(18,2)")).otherwise(dec0_18))
        .cast("double")
        .alias("s1b"),
        F.sum(F.when(~is_a, (v * v).cast("decimal(28,4)")).otherwise(dec0_28))
        .cast("double")
        .alias("s2b"),
    ).filter((F.col("na") > 1) & (F.col("nb") > 1))
    na, nb = F.col("na"), F.col("nb")
    s1a, s1b = F.col("s1a"), F.col("s1b")
    sea = (F.col("s2a") - s1a * s1a / na) / (na - F.lit(1.0)) / na
    seb = (F.col("s2b") - s1b * s1b / nb) / (nb - F.lit(1.0)) / nb
    t = (s1a / na - s1b / nb) / F.sqrt(sea + seb)
    df = (
        (sea + seb)
        * (sea + seb)
        / (sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0)))
    )
    return s.select(
        na.alias("n_purchase"),
        nb.alias("n_view"),
        F.when(sea + seb > 0, F.round(t, 6)).alias("welch_t"),
        F.when((sea > 0) & (seb > 0), F.round(df, 6)).alias(
            "satterthwaite_df"
        ),
        F.when(sea + seb > 0, F.abs(t) > F.lit(_Z975)).alias(
            "means_differ_95"
        ),
    )


@register(
    "oneway_anova_value_by_type",
    f"""
    WITH g AS (SELECT event_type,
                      COUNT(*)::BIGINT AS n_g,
                      SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE AS s1_g,
                      SUM(CAST(value * value AS DECIMAL(28,4)))::DOUBLE AS s2_g
               FROM events GROUP BY event_type),
    q AS (SELECT event_type, n_g,
                 CAST(FLOOR(1000000 * s1_g * s1_g / n_g + 0.5)
                      AS BIGINT) AS bt_micro,
                 CAST(FLOOR(1000000 * s2_g + 0.5) AS BIGINT) AS s2_micro,
                 CAST(FLOOR(1000000 * s1_g + 0.5) AS BIGINT) AS s1_micro
          FROM g WHERE n_g > 0),
    f AS (SELECT COUNT(*)::BIGINT AS k,
                 SUM(n_g)::BIGINT AS n,
                 SUM(bt_micro) AS bt_sum,
                 SUM(s2_micro) AS s2_sum,
                 SUM(s1_micro) AS s1_sum
          FROM q),
    d AS (SELECT k, n,
                 (bt_sum - s1_sum / 1e6 * (s1_sum / n) ) / 1e6 AS ssb,
                 (s2_sum - bt_sum) / 1e6 AS ssw
          FROM f)
    SELECT k AS n_groups, n AS n_events,
           ROUND(ssb, 6) AS ss_between,
           ROUND(ssw, 6) AS ss_within,
           CASE WHEN ssw > 0 AND k > 1 AND n > k
                THEN ROUND((ssb / (k - 1.0)) / (ssw / (n - k) * 1.0), 6)
                ELSE NULL END AS f_stat,
           CASE WHEN ssb + ssw > 0
                THEN ROUND(ssb / (ssb + ssw), 6) ELSE NULL END AS eta_sq,
           CASE WHEN ssw > 0 AND k = 5 AND n > k
                THEN (ssb / (k - 1.0)) / (ssw / (n - k) * 1.0)
                     > {_F_95_DF4_INF!r}
                ELSE NULL END AS means_differ_95
    FROM d
    """,
)
def oneway_anova_value_by_type(spark, sf_dir):
    """One-way ANOVA of `value` across the 5 event types: between/within
    sum of squares, the F statistic, and eta-squared (the variance-
    explained effect size) — the parametric test `kruskal_wallis_value_
    by_type` rank-shadows; running both flags distributional vs
    mean-level differences. Per-group exact DECIMAL moment sums collapse
    the corpus to the 5-row group frame in one scan; each group's
    between-treatment term s1_g^2/n_g is ONE fixed-order double
    expression of exact numbers micro-quantized to BIGINT BEFORE the
    5-row fold (the Mood/KW idiom — order-proof), and SSW = sum(s2_g) -
    sum(s1_g^2/n_g) folds the same quantized integers. The 95% verdict
    uses the F(4, inf) literal (= chi2_95(4)/4 — within-df is ~600k
    here, where F(4, d2) matches F(4, inf) past the 3rd decimal) and
    NULLs when the group count drifts off the literal's df (the KW df
    pin). The grand-mean term reuses the quantized s1 fold
    (s1_sum/1e6 * s1_sum/n in micro units) so no un-quantized corpus
    double ever enters the statistic.

    Scale: one partial-aggregated scan to a 5-row frame; everything
    after is arithmetic on 5 rows."""
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("s1_g"),
            F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
            .cast("double")
            .alias("s2_g"),
        )
        .filter(F.col("n_g") > 0)
    )
    q = g.select(
        "n_g",
        F.floor(
            F.lit(1000000.0) * F.col("s1_g") * F.col("s1_g") / F.col("n_g")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("bt_micro"),
        F.floor(F.lit(1000000.0) * F.col("s2_g") + F.lit(0.5))
        .cast("bigint")
        .alias("s2_micro"),
        F.floor(F.lit(1000000.0) * F.col("s1_g") + F.lit(0.5))
        .cast("bigint")
        .alias("s1_micro"),
    )
    f = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("bt_micro").alias("bt_sum"),
        F.sum("s2_micro").alias("s2_sum"),
        F.sum("s1_micro").alias("s1_sum"),
    )
    k, n = F.col("k"), F.col("n")
    ssb = (
        F.col("bt_sum")
        - F.col("s1_sum") / F.lit(1e6) * (F.col("s1_sum") / n)
    ) / F.lit(1e6)
    ssw = (F.col("s2_sum") - F.col("bt_sum")) / F.lit(1e6)
    fstat = (ssb / (k - F.lit(1.0))) / (ssw / (n - k) * F.lit(1.0))
    return f.select(
        k.alias("n_groups"),
        n.alias("n_events"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.when((ssw > 0) & (k > 1) & (n > k), F.round(fstat, 6)).alias(
            "f_stat"
        ),
        F.when(ssb + ssw > 0, F.round(ssb / (ssb + ssw), 6)).alias("eta_sq"),
        F.when(
            (ssw > 0) & (k == 5) & (n > k), fstat > F.lit(_F_95_DF4_INF)
        ).alias("means_differ_95"),
    )


@register(
    "randomization_test_weekend_value",
    """
    WITH e AS (SELECT value,
                      CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                        AS wkend,
                      CAST('0x' || substr(md5(event_id::VARCHAR), 1, 15)
                           AS BIGINT) AS h
               FROM events),
    obs AS (SELECT
              SUM(CASE WHEN wkend = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
              SUM(CASE WHEN wkend = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
              SUM(CASE WHEN wkend = 1 THEN CAST(value AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS s1,
              SUM(CASE WHEN wkend = 0 THEN CAST(value AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS s0
            FROM e),
    reps AS (SELECT unnest(range(0, 60)) AS r),
    w AS (SELECT e.value,
                 ((e.h // CAST(pow(2, reps.r) AS BIGINT)) % 2)::INT AS side,
                 reps.r
          FROM e CROSS JOIN reps),
    m AS (SELECT r,
                 SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
                 SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
                 SUM(CASE WHEN side = 1 THEN CAST(value AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS s1,
                 SUM(CASE WHEN side = 0 THEN CAST(value AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE AS s0
          FROM w GROUP BY r),
    st AS (SELECT r, s1 / n1 - s0 / n0 AS stat
           FROM m WHERE n1 > 0 AND n0 > 0),
    ob AS (SELECT n1, n0,
                  CASE WHEN n1 > 0 AND n0 > 0
                       THEN s1 / n1 - s0 / n0 ELSE NULL END AS obs_diff
           FROM obs),
    p AS (SELECT COUNT(*)::BIGINT AS n_reps,
                 SUM(CASE WHEN abs(st.stat) >= abs(o.obs_diff)
                          THEN 1 ELSE 0 END)::BIGINT AS n_extreme
          FROM st CROSS JOIN ob o)
    SELECT o.n1 AS n_weekend, o.n0 AS n_weekday,
           ROUND(o.obs_diff, 6) AS obs_mean_diff,
           p.n_reps AS n_replicates,
           p.n_extreme,
           ROUND((1.0 + p.n_extreme) / (1.0 + p.n_reps), 6) AS p_two_sided
    FROM ob o CROSS JOIN p
    """,
)
def randomization_test_weekend_value(spark, sf_dir):
    """Deterministic randomization test for the weekend effect on mean
    event value — the distribution-free cross-check of
    `welch_ttest_purchase_view`'s machinery on the weekend split (and
    the significance companion `weekend_purchase_effect`'s odds-ratio
    panel doesn't provide for the VALUE metric). Under H0 (value
    distribution identical on weekends and weekdays) any random
    relabeling is as likely as the observed one; 60 replicates assign
    each event to a pseudo-group by ONE BIT of the 60-bit portable md5
    hash of its event_id (bit r for replicate r — one digest serves all
    60 replicates, the poisson_bootstrap bit-slicing trick), and the
    two-sided p-value is the add-one-smoothed share of replicates whose
    |mean diff| reaches the observed |diff|. This is the random-SPLIT
    randomization scheme (Bernoulli(1/2) labels, margins not fixed) —
    a valid test of exchangeability that needs only a map pass, unlike
    the fixed-margin permutation which requires a distributed shuffle
    of labels; documented rather than hidden. Replicate sums fold as
    exact DECIMALs per (replicate, side); each stat is one double
    division pair, so the >= comparison against the observed stat is
    bit-deterministic in both engines. An empty weekend or weekday side
    NULLs the observed stat (and the verdict count) in both engines
    instead of dividing by zero (the Mood-guard discipline).

    Scale: one x60 explode (bounded fan-out) into a 120-row partial
    aggregate; the p-value folds a 60-row frame. At 100 TB the explode
    rides the existing scan (no shuffle grows with replicates)."""
    # round 15: fan_parallel spreads the x60 replicate explode below —
    # measured 4.0-5.8 s in ONE task (single-row-group scan) vs
    # 0.7-1.3 s over 32; all downstream folds are exact decimal/int
    # (order-insensitive), proven bit-identical by exceptAll
    e = fan_parallel(
        load_table(spark, sf_dir, "events").select(
            "value",
            F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wkend"),
            F.expr(
                "CAST(conv('0' || substr(md5(CAST(event_id AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT)"
            ).alias("h"),
        )
    )
    dec0 = F.lit(0).cast("decimal(18,2)")
    v = F.col("value")
    obs = e.agg(
        F.sum(F.when(F.col("wkend") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("wkend") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("wkend") == 1, v.cast("decimal(18,2)")).otherwise(dec0))
        .cast("double")
        .alias("s1"),
        F.sum(F.when(F.col("wkend") == 0, v.cast("decimal(18,2)")).otherwise(dec0))
        .cast("double")
        .alias("s0"),
    )
    w = e.select(
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("r"),
        "h",
    ).select(
        "value",
        "r",
        # shiftright(h, r) == h div 2^r for the nonnegative 60-bit h —
        # one shift instead of a per-row double pow + cast (round 15)
        (F.expr("shiftright(h, r)") % 2).cast("int").alias("side"),
    )
    m = w.groupBy("r").agg(
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("side") == 1, v.cast("decimal(18,2)")).otherwise(dec0))
        .cast("double")
        .alias("s1"),
        F.sum(F.when(F.col("side") == 0, v.cast("decimal(18,2)")).otherwise(dec0))
        .cast("double")
        .alias("s0"),
    )
    st = m.filter((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        (F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")).alias("stat")
    )
    ob = obs.select(
        "n1",
        "n0",
        F.when(
            (F.col("n1") > 0) & (F.col("n0") > 0),
            F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0"),
        ).alias("obs_diff"),
    )
    p = st.crossJoin(F.broadcast(ob)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reps"),
        F.sum(
            F.when(F.abs(F.col("stat")) >= F.abs(F.col("obs_diff")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_extreme"),
    )
    return p.crossJoin(F.broadcast(ob)).select(
        F.col("n1").alias("n_weekend"),
        F.col("n0").alias("n_weekday"),
        F.round(F.col("obs_diff"), 6).alias("obs_mean_diff"),
        F.col("n_reps").alias("n_replicates"),
        F.col("n_extreme"),
        F.round(
            (F.lit(1.0) + F.col("n_extreme")) / (F.lit(1.0) + F.col("n_reps")), 6
        ).alias("p_two_sided"),
    )


# Studentized-range 95% critical value q(k=5 groups, df=inf) — standard
# table value (e.g. Harter 1960); Python literal per the constant rule.
_Q_95_K5_INF = 3.858


@register(
    "tukey_hsd_value_by_type",
    f"""
    WITH g AS (SELECT event_type,
                      COUNT(*)::BIGINT AS n_g,
                      SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE AS s1_g,
                      SUM(CAST(value * value AS DECIMAL(28,4)))::DOUBLE AS s2_g
               FROM events GROUP BY event_type),
    q AS (SELECT event_type, n_g, s1_g,
                 CAST(FLOOR(1000000 * (s2_g - s1_g * s1_g / n_g) + 0.5)
                      AS BIGINT) AS ssw_micro
          FROM g WHERE n_g > 1),
    t AS (SELECT COUNT(*)::BIGINT AS k, SUM(n_g)::BIGINT AS n,
                 SUM(ssw_micro) AS ssw_sum
          FROM q),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.s1_g / a.n_g - b.s1_g / b.n_g AS diff,
                 a.n_g AS na, b.n_g AS nb
          FROM q a JOIN q b ON a.event_type < b.event_type)
    SELECT p.type_a, p.type_b,
           ROUND(p.diff, 6) AS mean_diff,
           CASE WHEN t.ssw_sum > 0 AND t.n > t.k
                THEN ROUND(abs(p.diff)
                           / sqrt(t.ssw_sum / 1e6 / (t.n - t.k) / 2.0
                                  * (1.0 / p.na + 1.0 / p.nb)), 6)
                ELSE NULL END AS q_stat,
           CASE WHEN t.ssw_sum > 0 AND t.n > t.k AND t.k = 5
                THEN abs(p.diff)
                     / sqrt(t.ssw_sum / 1e6 / (t.n - t.k) / 2.0
                            * (1.0 / p.na + 1.0 / p.nb))
                     > {_Q_95_K5_INF!r}
                ELSE NULL END AS differs_95
    FROM p CROSS JOIN t
    ORDER BY p.type_a ASC, p.type_b ASC
    """,
)
def tukey_hsd_value_by_type(spark, sf_dir):
    """Tukey-Kramer HSD post-hoc after `oneway_anova_value_by_type`: all
    10 pairwise mean differences between the 5 event types, each tested
    against the studentized-range 95% criterion — the correct follow-up
    when the omnibus F fires (10 naive t-tests at alpha=.05 inflate the
    family error to ~40%; Tukey's q controls the family-wise rate
    exactly for pairwise means, which is why it beats running Holm over
    t-tests here). Per-group exact DECIMAL moments collapse the corpus
    in one scan; each group's within-SS is micro-quantized BEFORE the
    k-row fold (the ANOVA idiom) so MSW is order-proof; the pair frame
    is a bounded 5x5 self-join. q = |diff| / sqrt(MSW/2 * (1/na + 1/nb))
    (the Tukey-Kramer unequal-n form); the critical value q(5, inf,
    .95) is a Python literal and the verdict NULLs when the group count
    drifts off 5 (the df pin).

    Scale: one partial-aggregated scan; everything else is arithmetic
    on a 10-row pair frame."""
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("s1_g"),
            F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
            .cast("double")
            .alias("s2_g"),
        )
        .filter(F.col("n_g") > 1)
    )
    q = g.select(
        "event_type",
        "n_g",
        "s1_g",
        F.floor(
            F.lit(1000000.0)
            * (F.col("s2_g") - F.col("s1_g") * F.col("s1_g") / F.col("n_g"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ssw_micro"),
    )
    t = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("ssw_micro").alias("ssw_sum"),
    )
    a = q.select(
        F.col("event_type").alias("type_a"),
        F.col("n_g").alias("na"),
        F.col("s1_g").alias("s1a"),
    )
    b = q.select(
        F.col("event_type").alias("type_b"),
        F.col("n_g").alias("nb"),
        F.col("s1_g").alias("s1b"),
    )
    p = a.join(b, F.col("type_a") < F.col("type_b")).select(
        "type_a",
        "type_b",
        (F.col("s1a") / F.col("na") - F.col("s1b") / F.col("nb")).alias("diff"),
        "na",
        "nb",
    )
    msw2 = (
        F.col("ssw_sum")
        / F.lit(1e6)
        / (F.col("n") - F.col("k"))
        / F.lit(2.0)
        * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
    )
    qstat = F.abs(F.col("diff")) / F.sqrt(msw2)
    ok = (F.col("ssw_sum") > 0) & (F.col("n") > F.col("k"))
    return (
        p.crossJoin(F.broadcast(t))
        .select(
            "type_a",
            "type_b",
            F.round(F.col("diff"), 6).alias("mean_diff"),
            F.when(ok, F.round(qstat, 6)).alias("q_stat"),
            F.when(ok & (F.col("k") == 5), qstat > F.lit(_Q_95_K5_INF)).alias(
                "differs_95"
            ),
        )
        .orderBy(F.col("type_a").asc(), F.col("type_b").asc())
    )


# chi-square 95% critical value at 24 df = (5-1)(7-1), the type x weekday
# grid's independence df (standard table value, Abramowitz & Stegun 26.4).
_CHI2_95_DF24 = 36.41502850180731


@register(
    "g_test_type_weekday",
    _TYPE_DOW_SQL
    + f""",
    q AS (SELECT grid.o, grid.r_tot, grid.c_tot, t.n,
                 CASE WHEN grid.o > 0
                      THEN CAST(FLOOR(1e9 * 2.0 * grid.o
                             * ln(grid.o / (grid.r_tot
                                            * (grid.c_tot / (t.n * 1.0))))
                             + 0.5) AS BIGINT)
                      ELSE 0 END AS g_nano
          FROM grid CROSS JOIN t),
    s AS (SELECT SUM(g_nano) AS g_sum FROM q),
    k AS (SELECT (SELECT COUNT(*) FROM rt)::BIGINT AS n_types,
                 (SELECT COUNT(*) FROM ct)::BIGINT AS n_days)
    SELECT t.n AS n_events, k.n_types, k.n_days,
           ROUND(s.g_sum / 1e9, 6) AS g_stat,
           CASE WHEN k.n_types = 5 AND k.n_days = 7
                THEN s.g_sum / 1e9 > {_CHI2_95_DF24!r}
                ELSE NULL END AS dependent_95
    FROM s CROSS JOIN t CROSS JOIN k
    """,
)
def g_test_type_weekday(spark, sf_dir):
    """G-test (log-likelihood-ratio chi-square) of event_type x weekday
    independence — the information-theoretic twin of the Pearson
    chi-square under `cramers_v_type_weekday` (G = 2n * MI in nats, so
    it is additive across table partitions and the statistic
    Sokal & Rohlf recommend over Pearson's when any O/E ratio is
    extreme; agreement between the two is itself a diagnostic). Same
    shared grid CTEs as the effects panel; each cell's 2*O*ln(O/E) term
    is nano-quantized from ONE fixed-order double expression of exact
    BIGINT margins BEFORE the 35-cell fold (order-proof), empty cells
    contribute exactly 0 (the x ln x limit), and the verdict compares
    against the chi-square(24 df) Python literal, NULLing when either
    margin domain drifts off the literal's (5-1)(7-1) df (the KW pin).

    Scale: one partial-aggregated corpus scan to the 35-cell grid."""
    grid, rt, ct, t = _type_dow_grid(spark, sf_dir)
    e = F.col("r_tot") * (F.col("c_tot") / (F.col("n") * F.lit(1.0)))
    q = grid.crossJoin(F.broadcast(t)).select(
        "n",
        F.when(
            F.col("o") > 0,
            F.floor(
                F.lit(1e9)
                * F.lit(2.0)
                * F.col("o")
                * F.log(F.col("o") / e)
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("g_nano"),
    )
    s = q.groupBy("n").agg(F.sum("g_nano").alias("g_sum"))
    k = rt.agg(F.count(F.lit(1)).cast("bigint").alias("n_types")).crossJoin(
        ct.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    )
    return s.crossJoin(F.broadcast(k)).select(
        F.col("n").alias("n_events"),
        "n_types",
        "n_days",
        F.round(F.col("g_sum") / F.lit(1e9), 6).alias("g_stat"),
        F.when(
            (F.col("n_types") == 5) & (F.col("n_days") == 7),
            F.col("g_sum") / F.lit(1e9) > F.lit(_CHI2_95_DF24),
        ).alias("dependent_95"),
    )


@register(
    "cohens_h_weekend_conversion",
    """
    WITH s AS (SELECT
        SUM(CASE WHEN dayofweek(ts) IN (0, 6)
                      AND event_type = 'purchase' THEN 1 ELSE 0
            END)::BIGINT AS a,
        SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0
            END)::BIGINT AS n1,
        SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6)
                      AND event_type = 'purchase' THEN 1 ELSE 0
            END)::BIGINT AS c,
        SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6) THEN 1 ELSE 0
            END)::BIGINT AS n0
      FROM events)
    SELECT n1 AS n_weekend, n0 AS n_weekday,
           CAST(round(1e6 * a / n1) AS BIGINT) AS p_weekend_micro,
           CAST(round(1e6 * c / n0) AS BIGINT) AS p_weekday_micro,
           CASE WHEN n1 > 0 AND n0 > 0
                THEN ROUND(2.0 * asin(sqrt(a / (n1 * 1.0)))
                           - 2.0 * asin(sqrt(c / (n0 * 1.0))), 6)
                ELSE NULL END AS cohens_h
    FROM s
    """,
)
def cohens_h_weekend_conversion(spark, sf_dir):
    """Cohen's h for the weekend-vs-weekday conversion rates: the
    arcsine-stabilized difference of proportions h = 2 asin(sqrt p1) -
    2 asin(sqrt p2) — the PROPORTION effect size the 2x2 panel lacks
    (`weekend_purchase_effect`'s odds ratio is multiplicative and
    explodes near rate 0; `ab_test_conversion_ztest` gives
    significance; h is the additive magnitude with the same
    small/medium/large anchors as Cohen's d, and the variance-
    stabilized scale makes h comparable across base rates — the
    property power calculators rely on). One conditional-aggregation
    scan to four exact BIGINTs; h is a single fixed-order double
    expression of them (asin/sqrt are correctly-rounded-class
    library calls on IDENTICAL doubles in both engines — the
    WoE-family in-engine transcendental discipline); empty sides
    guard to NULL.

    Scale: one scan to four integers."""
    e = load_table(spark, sf_dir, "events")
    wk = F.dayofweek("ts").isin(1, 7)
    conv = F.col("event_type") == "purchase"
    s = e.agg(
        F.sum(F.when(wk & conv, 1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when(wk, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(~wk & conv, 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(~wk, 1).otherwise(0)).cast("bigint").alias("n0"),
    )
    a, n1, c, n0 = (F.col(k) for k in ("a", "n1", "c", "n0"))
    h = F.lit(2.0) * F.asin(F.sqrt(a / (n1 * F.lit(1.0)))) - F.lit(
        2.0
    ) * F.asin(F.sqrt(c / (n0 * F.lit(1.0))))
    return s.select(
        n1.alias("n_weekend"),
        n0.alias("n_weekday"),
        F.round(F.lit(1e6) * a / n1).cast("bigint").alias("p_weekend_micro"),
        F.round(F.lit(1e6) * c / n0).cast("bigint").alias("p_weekday_micro"),
        F.when((n1 > 0) & (n0 > 0), F.round(h, 6)).alias("cohens_h"),
    )


@register(
    "mantel_haenszel_weekend_or",
    """
    WITH e AS (SELECT month(ts)::BIGINT AS stratum,
                      CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                        AS wk,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                        AS conv
               FROM events),
    g AS (SELECT stratum,
                 SUM(wk * conv)::BIGINT AS a,
                 SUM(wk * (1 - conv))::BIGINT AS b,
                 SUM((1 - wk) * conv)::BIGINT AS c,
                 SUM((1 - wk) * (1 - conv))::BIGINT AS d
          FROM e GROUP BY stratum),
    q AS (SELECT stratum, a, b, c, d, a + b + c + d AS n_i,
                 CAST(FLOOR(1e6 * (a * d) / ((a + b + c + d) * 1.0) + 0.5)
                      AS BIGINT) AS num_micro,
                 CAST(FLOOR(1e6 * (b * c) / ((a + b + c + d) * 1.0) + 0.5)
                      AS BIGINT) AS den_micro
          FROM g WHERE a + b + c + d > 0),
    s AS (SELECT COUNT(*)::BIGINT AS n_strata,
                 SUM(num_micro) AS num_sum, SUM(den_micro) AS den_sum
          FROM q),
    crude AS (SELECT SUM(a)::BIGINT AS ta, SUM(b)::BIGINT AS tb,
                     SUM(c)::BIGINT AS tc, SUM(d)::BIGINT AS td
              FROM g)
    SELECT s.n_strata,
           CASE WHEN s.den_sum > 0
                THEN ROUND(s.num_sum * 1.0 / s.den_sum, 6)
                ELSE NULL END AS or_mh,
           CASE WHEN crude.tb * crude.tc > 0
                THEN ROUND((crude.ta * 1.0 * crude.td)
                           / (crude.tb * 1.0 * crude.tc), 6)
                ELSE NULL END AS or_crude
    FROM s CROSS JOIN crude
    """,
)
def mantel_haenszel_weekend_or(spark, sf_dir):
    """Mantel-Haenszel pooled odds ratio for weekend -> purchase
    STRATIFIED BY MONTH, next to the crude (pooled-table) OR — the
    confounding diagnostic the single 2x2 of `weekend_purchase_effect`
    cannot give: when months differ in both weekend share and base
    conversion (seasonality), the crude OR mixes the weekend effect
    with the month effect (Simpson's pattern), and OR_MH =
    sum(a_i d_i / n_i) / sum(b_i c_i / n_i) is the classic
    sparse-strata-safe adjusted estimate; a crude/MH gap IS the
    confounding readout. Each stratum's two terms are micro-quantized
    from fixed-order double expressions of exact BIGINT cells before
    the 12-row fold (order-proof); the crude OR folds exact integer
    margins. Empty numerators/denominators guard to NULL.

    Scale: one partial-aggregated scan to the 12-row month frame."""
    e = load_table(spark, sf_dir, "events").select(
        F.month("ts").cast("bigint").alias("stratum"),
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("wk"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    g = e.groupBy("stratum").agg(
        F.sum(F.col("wk") * F.col("conv")).cast("bigint").alias("a"),
        F.sum(F.col("wk") * (1 - F.col("conv"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("wk")) * F.col("conv")).cast("bigint").alias("c"),
        F.sum((1 - F.col("wk")) * (1 - F.col("conv"))).cast("bigint").alias("d"),
    )
    n_i = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    q = g.filter(n_i > 0).select(
        F.floor(
            F.lit(1e6) * (F.col("a") * F.col("d")) / (n_i * F.lit(1.0))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("num_micro"),
        F.floor(
            F.lit(1e6) * (F.col("b") * F.col("c")) / (n_i * F.lit(1.0))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("den_micro"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("num_micro").alias("num_sum"),
        F.sum("den_micro").alias("den_sum"),
    )
    crude = g.agg(
        F.sum("a").cast("bigint").alias("ta"),
        F.sum("b").cast("bigint").alias("tb"),
        F.sum("c").cast("bigint").alias("tc"),
        F.sum("d").cast("bigint").alias("td"),
    )
    return s.crossJoin(F.broadcast(crude)).select(
        "n_strata",
        F.when(
            F.col("den_sum") > 0,
            F.round(F.col("num_sum") * F.lit(1.0) / F.col("den_sum"), 6),
        ).alias("or_mh"),
        F.when(
            F.col("tb") * F.col("tc") > 0,
            F.round(
                (F.col("ta") * F.lit(1.0) * F.col("td"))
                / (F.col("tb") * F.lit(1.0) * F.col("tc")),
                6,
            ),
        ).alias("or_crude"),
    )


@register(
    "wilson_ci_conversion",
    f"""
    WITH s AS (SELECT COUNT(*)::BIGINT AS n,
                      SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                          END)::BIGINT AS a
               FROM events)
    SELECT n AS n_events, a AS n_purchases,
           CAST(round(1e6 * a / n) AS BIGINT) AS p_hat_micro,
           ROUND((a * 1.0 / n + {_Z975!r} * {_Z975!r} / (2.0 * n)
                  - {_Z975!r} * sqrt((a * 1.0 / n) * (1.0 - a * 1.0 / n) / n
                                     + {_Z975!r} * {_Z975!r}
                                       / (4.0 * n * n)))
                 / (1.0 + {_Z975!r} * {_Z975!r} / n), 6) AS wilson_lo,
           ROUND((a * 1.0 / n + {_Z975!r} * {_Z975!r} / (2.0 * n)
                  + {_Z975!r} * sqrt((a * 1.0 / n) * (1.0 - a * 1.0 / n) / n
                                     + {_Z975!r} * {_Z975!r}
                                       / (4.0 * n * n)))
                 / (1.0 + {_Z975!r} * {_Z975!r} / n), 6) AS wilson_hi,
           ROUND(a * 1.0 / n - {_Z975!r}
                 * sqrt((a * 1.0 / n) * (1.0 - a * 1.0 / n) / n), 6)
             AS wald_lo,
           ROUND(a * 1.0 / n + {_Z975!r}
                 * sqrt((a * 1.0 / n) * (1.0 - a * 1.0 / n) / n), 6)
             AS wald_hi
    FROM s WHERE n > 0
    """,
)
def wilson_ci_conversion(spark, sf_dir):
    """Wilson score 95% interval for the overall purchase-conversion
    rate, next to the naive Wald interval — the interval-estimation
    companion to `ab_test_conversion_ztest` (a test says "different
    from X"; the interval says what rates are compatible with the
    data, and Wilson is the textbook default because Wald's coverage
    collapses near 0/1 and at small n while Wilson never leaves [0,1]).
    Both bounds are single fixed-order double expressions of two exact
    BIGINTs and the probit literal; reporting Wald alongside makes the
    difference (the continuity the z-test implicitly assumes) visible
    at any n.

    Scale: one conditional-aggregation scan to two integers."""
    s = load_table(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
    ).filter(F.col("n") > 0)
    n, a = F.col("n"), F.col("a")
    z = F.lit(_Z975)
    p = a * F.lit(1.0) / n
    half = z * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
    denom = F.lit(1.0) + z * z / n
    center = p + z * z / (F.lit(2.0) * n)
    wald_half = z * F.sqrt(p * (F.lit(1.0) - p) / n)
    return s.select(
        n.alias("n_events"),
        a.alias("n_purchases"),
        F.round(F.lit(1e6) * a / n).cast("bigint").alias("p_hat_micro"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
        F.round(p - wald_half, 6).alias("wald_lo"),
        F.round(p + wald_half, 6).alias("wald_hi"),
    )


@register(
    "anova_effect_sizes",
    """
    WITH c AS (SELECT event_type,
                      CAST(round(value * 100.0) AS BIGINT) AS cv
               FROM events),
    g AS (SELECT event_type, COUNT(*)::BIGINT AS ng,
                 SUM(CAST(cv AS DECIMAL(38,0))) AS sg
          FROM c GROUP BY event_type),
    t AS (SELECT COUNT(*)::BIGINT AS n,
                 SUM(CAST(cv AS DECIMAL(38,0))) AS s,
                 SUM(CAST(cv * cv AS DECIMAL(38,0))) AS q
          FROM c),
    b AS (SELECT COUNT(*)::BIGINT AS k,
                 SUM(CAST(round(1e6 * (sg::DOUBLE * sg::DOUBLE) / ng)
                     AS DECIMAL(38,0))) AS bq
          FROM g)
    SELECT t.n AS n_events, b.k AS n_groups,
           ROUND((b.bq::DOUBLE / 1e6 - t.s::DOUBLE * t.s::DOUBLE / t.n)
                 / (t.q::DOUBLE - t.s::DOUBLE * t.s::DOUBLE / t.n), 6)
             AS eta_squared,
           ROUND(((b.bq::DOUBLE / 1e6 - t.s::DOUBLE * t.s::DOUBLE / t.n)
                  - (b.k - 1.0)
                    * ((t.q::DOUBLE - b.bq::DOUBLE / 1e6) / (t.n - b.k)))
                 / ((t.q::DOUBLE - t.s::DOUBLE * t.s::DOUBLE / t.n)
                    + (t.q::DOUBLE - b.bq::DOUBLE / 1e6) / (t.n - b.k)), 6)
             AS omega_squared,
           ROUND(sqrt(((b.bq::DOUBLE / 1e6
                        - t.s::DOUBLE * t.s::DOUBLE / t.n)
                       / (t.q::DOUBLE - t.s::DOUBLE * t.s::DOUBLE / t.n))
                      / (1.0 - (b.bq::DOUBLE / 1e6
                                - t.s::DOUBLE * t.s::DOUBLE / t.n)
                               / (t.q::DOUBLE
                                  - t.s::DOUBLE * t.s::DOUBLE / t.n))), 6)
             AS cohen_f
    FROM t CROSS JOIN b
    """,
)
def anova_effect_sizes(spark, sf_dir):
    """ANOVA effect sizes for value-by-event-type: eta^2 = SSB/SST (the
    variance share the grouping explains), omega^2 (its
    positive-bias-corrected estimator -- eta^2 over-reads small
    samples; omega^2 subtracts (k-1)*MSW before normalizing, Hays
    1963), and Cohen's f = sqrt(eta^2/(1-eta^2)) (the power-analysis
    currency) -- the magnitude panel `oneway_anova_value_by_type`'s
    F-statistic deliberately omits (F says the groups differ; these say
    whether anyone should CARE, the same significance-vs-size split as
    `cramers_v_type_weekday` next to the chi-square). Values collapse
    to exact integer cents; SSB collapses algebraically (sum S_g^2/n_g
    - S^2/N, group means never materialize -- the seasonality-strength
    idiom); the per-group S_g^2/n_g terms are micro-quantized so the
    k-term fold is order-proof; all three outputs are fixed-order
    double expressions of four exact numbers.

    Scale: two partial-aggregated scans (group grain + corpus grain);
    the statistics are single-row arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.round(F.col("value") * 100.0).cast("bigint").alias("cv"),
    )
    g = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(F.col("cv").cast("decimal(38,0)")).alias("sg"),
    )
    t = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cv").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("cv").cast("decimal(38,0)") * F.col("cv")).alias("q"),
    )
    b = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.round(
                F.lit(1e6)
                * (F.col("sg").cast("double") * F.col("sg").cast("double"))
                / F.col("ng")
            ).cast("decimal(38,0)")
        ).alias("bq"),
    )
    j = t.crossJoin(F.broadcast(b))
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    bqd = F.col("bq").cast("double") / F.lit(1e6)
    ssb = bqd - sd * sd / F.col("n")
    sst = qd - sd * sd / F.col("n")
    msw = (qd - bqd) / (F.col("n") - F.col("k"))
    eta2 = ssb / sst
    return j.select(
        F.col("n").alias("n_events"),
        F.col("k").alias("n_groups"),
        F.round(eta2, 6).alias("eta_squared"),
        F.round(
            (ssb - (F.col("k") - F.lit(1.0)) * msw) / (sst + msw), 6
        ).alias("omega_squared"),
        F.round(F.sqrt(eta2 / (F.lit(1.0) - eta2)), 6).alias("cohen_f"),
    )


@register(
    "stratified_ate_weekend_value",
    """
    WITH ue AS (SELECT user_id, COUNT(*)::BIGINT AS ne
                FROM events GROUP BY user_id),
    tot AS (SELECT COUNT(*)::BIGINT AS nu FROM ue),
    r AS (SELECT user_id,
                 ROW_NUMBER() OVER (ORDER BY ne ASC, user_id ASC) AS rn
          FROM ue),
    strat2 AS (SELECT user_id,
                      CASE WHEN tot.nu < 5 THEN r.rn
                           WHEN r.rn <= (tot.nu % 5)
                                        * ((tot.nu + 4) // 5)
                           THEN (r.rn - 1) // ((tot.nu + 4) // 5) + 1
                           ELSE (tot.nu % 5)
                                + (r.rn - 1 - (tot.nu % 5)
                                              * ((tot.nu + 4) // 5))
                                  // (tot.nu // 5) + 1
                      END::BIGINT AS stratum
               FROM r CROSS JOIN tot),
    e AS (SELECT e.user_id, st.stratum,
                 CASE WHEN dayofweek(e.ts) IN (0, 6) THEN 1 ELSE 0 END
                   AS w,
                 CAST(round(e.value * 100.0) AS BIGINT) AS cv
          FROM events e JOIN strat2 st USING (user_id)),
    g AS (SELECT stratum,
                 SUM(w)::BIGINT AS n1, SUM(1 - w)::BIGINT AS n0,
                 SUM(CASE WHEN w = 1 THEN cv ELSE 0 END)::BIGINT AS s1,
                 SUM(CASE WHEN w = 0 THEN cv ELSE 0 END)::BIGINT AS s0
          FROM e GROUP BY stratum),
    t AS (SELECT SUM(n1 + n0)::BIGINT AS n,
                 SUM(n1)::BIGINT AS nt1, SUM(n0)::BIGINT AS nt0,
                 SUM(s1)::BIGINT AS st1, SUM(s0)::BIGINT AS st0
          FROM g),
    ate AS (SELECT SUM(CASE WHEN g.n1 > 0 AND g.n0 > 0 THEN
                         CAST(round(1e6 * (g.n1 + g.n0)
                                    * (g.s1 * 1.0 / g.n1
                                       - g.s0 * 1.0 / g.n0))
                              AS DECIMAL(38,0)) ELSE 0 END) AS aq,
                   SUM(CASE WHEN g.n1 > 0 AND g.n0 > 0
                       THEN g.n1 + g.n0 ELSE 0 END)::BIGINT AS n_used,
                   COUNT(*)::BIGINT AS n_strata
            FROM g)
    SELECT ate.n_strata, ate.n_used,
           ROUND((t.st1 * 1.0 / t.nt1 - t.st0 * 1.0 / t.nt0) / 100.0, 6)
             AS crude_diff,
           ROUND(ate.aq::DOUBLE / 1e6 / ate.n_used / 100.0, 6)
             AS stratified_ate
    FROM ate CROSS JOIN t
    """,
)
def stratified_ate_weekend_value(spark, sf_dir):
    """Stratified average treatment effect of weekend exposure on event
    value, standardized over user-activity quintiles -- the
    confounding-adjusted companion to `cohens_d_purchase_view` and
    `cuped_variance_reduction` (the crude weekend-weekday gap mixes
    the treatment effect with WHO is active on weekends; stratifying
    on pre-treatment activity and reweighting strata by size is the
    classic direct-standardization/blocking estimator, Cochran 1968).
    Strata are exact user-count quintiles from the DISTRIBUTED rank
    (the ntile identity computed inline: the first nu%5 buckets take
    ceil(nu/5) users -- no unpartitioned ntile window in the Spark
    plan); within-stratum means stay exact cents sums; each stratum's
    weighted effect is micro-quantized so the 5-term fold is
    order-proof; strata missing a treatment arm are excluded with
    INTEGER guards and the reweighting denominator shrinks
    accordingly.

    Scale: one user-grain aggregation + distributed rank, one
    corpus-scan join back on user_id (equi-partitioned), one 5-row
    stratum frame."""
    from veri_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )

    ev = load_table(spark, sf_dir, "events")
    ue = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ne")
    )
    tot = ue.agg(F.count(F.lit(1)).cast("bigint").alias("nu"))
    r = global_row_number(
        ue, [F.col("ne").asc(), F.col("user_id").asc()], rn_col="rn"
    )
    strat = r.crossJoin(F.broadcast(tot)).select(
        "user_id",
        ntile_from_rank(F.col("rn"), F.col("nu"), 5).alias("stratum"),
    )
    e = ev.join(strat, "user_id").select(
        "stratum",
        F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("w"),
        F.round(F.col("value") * 100.0).cast("bigint").alias("cv"),
    )
    g = e.groupBy("stratum").agg(
        F.sum("w").cast("bigint").alias("n1"),
        F.sum(F.lit(1) - F.col("w")).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("w") == 1, F.col("cv")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("w") == 0, F.col("cv")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
    )
    t = g.agg(
        F.sum("n1").cast("bigint").alias("nt1"),
        F.sum("n0").cast("bigint").alias("nt0"),
        F.sum("s1").cast("bigint").alias("st1"),
        F.sum("s0").cast("bigint").alias("st0"),
    )
    both = (F.col("n1") > 0) & (F.col("n0") > 0)
    ate = g.agg(
        F.sum(
            F.when(
                both,
                F.round(
                    F.lit(1e6)
                    * (F.col("n1") + F.col("n0"))
                    * (
                        F.col("s1") * F.lit(1.0) / F.col("n1")
                        - F.col("s0") * F.lit(1.0) / F.col("n0")
                    )
                ).cast("decimal(38,0)"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("aq"),
        F.sum(F.when(both, F.col("n1") + F.col("n0")).otherwise(0))
        .cast("bigint")
        .alias("n_used"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
    )
    j = ate.crossJoin(F.broadcast(t))
    return j.select(
        "n_strata",
        "n_used",
        F.round(
            (
                F.col("st1") * F.lit(1.0) / F.col("nt1")
                - F.col("st0") * F.lit(1.0) / F.col("nt0")
            )
            / F.lit(100.0),
            6,
        ).alias("crude_diff"),
        F.round(
            F.col("aq").cast("double")
            / F.lit(1e6)
            / F.col("n_used")
            / F.lit(100.0),
            6,
        ).alias("stratified_ate"),
    )


@register(
    "goodman_kruskal_lambda_lang_source",
    """
    WITH cell AS (SELECT lang, source, COUNT(*)::BIGINT AS nxy
                  FROM documents GROUP BY lang, source),
    mx AS (SELECT lang, SUM(nxy)::BIGINT AS nx, MAX(nxy)::BIGINT AS rowmax
           FROM cell GROUP BY lang),
    my AS (SELECT source, SUM(nxy)::BIGINT AS ny, MAX(nxy)::BIGINT AS colmax
           FROM cell GROUP BY source),
    t AS (SELECT SUM(nx)::BIGINT AS n, MAX(nx)::BIGINT AS maxrow FROM mx),
    u AS (SELECT MAX(ny)::BIGINT AS maxcol FROM my),
    sr AS (SELECT SUM(rowmax)::BIGINT AS srm FROM mx),
    sc AS (SELECT SUM(colmax)::BIGINT AS scm FROM my)
    SELECT t.n AS n_docs,
           ROUND((sr.srm - u.maxcol) * 1.0 / (t.n - u.maxcol), 6)
             AS lambda_source_given_lang,
           ROUND((sc.scm - t.maxrow) * 1.0 / (t.n - t.maxrow), 6)
             AS lambda_lang_given_source,
           ROUND((sr.srm + sc.scm - u.maxcol - t.maxrow) * 1.0
                 / (2 * t.n - u.maxcol - t.maxrow), 6) AS lambda_symmetric
    FROM t CROSS JOIN u CROSS JOIN sr CROSS JOIN sc
    """,
)
def goodman_kruskal_lambda_lang_source(spark, sf_dir):
    """Goodman-Kruskal lambda between document language and source —
    the PROPORTIONAL-REDUCTION-IN-ERROR association the chi-square
    family (`lang_source_chi2`, `cramers_v_type_weekday`) and the
    entropy family (`mutual_information_lang_source`,
    `uncertainty_coeff_lang_source`) both lack: lambda(Y|X) = (sum_x
    max_y n_xy - max_y n_y) / (N - max_y n_y) is literally "how many
    fewer mistakes a modal guesser makes knowing X", 0 when X never
    changes the modal Y (even under strong non-modal association —
    exactly the blind spot that makes lambda the honest operational
    answer to 'can I route by this field?'), 1 when X determines Y.
    Both directions plus the symmetric average, all pure integer
    counts with one final 6dp ratio — bit-exact by construction.

    Scale: one (lang, source) cell aggregation (bounded domain), then
    constant-size reductions. Brute-force check in
    tests/test_round14_stats_brute.py."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nxy")
    )
    mx = cell.groupBy("lang").agg(
        F.sum("nxy").cast("bigint").alias("nx"),
        F.max("nxy").cast("bigint").alias("rowmax"),
    )
    my = cell.groupBy("source").agg(
        F.sum("nxy").cast("bigint").alias("ny"),
        F.max("nxy").cast("bigint").alias("colmax"),
    )
    t = mx.agg(
        F.sum("nx").cast("bigint").alias("n"),
        F.max("nx").cast("bigint").alias("maxrow"),
        F.sum("rowmax").cast("bigint").alias("srm"),
    )
    u = my.agg(
        F.max("ny").cast("bigint").alias("maxcol"),
        F.sum("colmax").cast("bigint").alias("scm"),
    )
    j = t.crossJoin(F.broadcast(u))
    return j.select(
        F.col("n").alias("n_docs"),
        F.round(
            (F.col("srm") - F.col("maxcol"))
            * F.lit(1.0)
            / (F.col("n") - F.col("maxcol")),
            6,
        ).alias("lambda_source_given_lang"),
        F.round(
            (F.col("scm") - F.col("maxrow"))
            * F.lit(1.0)
            / (F.col("n") - F.col("maxrow")),
            6,
        ).alias("lambda_lang_given_source"),
        F.round(
            (F.col("srm") + F.col("scm") - F.col("maxcol") - F.col("maxrow"))
            * F.lit(1.0)
            / (2 * F.col("n") - F.col("maxcol") - F.col("maxrow")),
            6,
        ).alias("lambda_symmetric"),
    )
