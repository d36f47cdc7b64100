"""Round-8 invariants: the evaluation/statistics batch (AUC, Brier, KM,
QQ, Theil-Sen, Heaps, KMV intersection, SpotSigs, SCD-2) checked against
brute-force Python oracles and their own mathematical identities on
sf0.001 — the cheap cross-check layer under the bit-exact DuckDB gate."""

import math

import pyspark.sql.functions as F

from veri_spark.plans.registry import QUERIES
from veri_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_auc_matches_bruteforce(spark):
    """Mann-Whitney AUC equals the O(n^2) pair count on the small SF."""
    from veri_spark.functions.text import EN_STOPWORDS

    [row] = QUERIES["score_auc_mann_whitney"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").collect()
    scored = []
    for d in docs:
        ws = d["text"].split(" ")
        if not ws:
            continue
        hits = sum(1 for w in ws if w in EN_STOPWORDS)
        scored.append((hits / len(ws), 1 if d["lang"] == "en" else 0))
    pos = [s for s, y in scored if y == 1]
    neg = [s for s, y in scored if y == 0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg)
    assert abs(row["auc"] - wins / (len(pos) * len(neg))) < 1e-6


def test_brier_murphy_identity(spark):
    """Generalized Murphy identity: brier = unc - res + rel + wbv - 2*wbc,
    exact up to the 1e-9 per-bin quantization and 6dp output rounding."""
    [r] = QUERIES["brier_score_decomposition"](spark, SF_DIR).collect()
    lhs = r["brier"]
    rhs = (r["uncertainty"] - r["resolution"] + r["reliability"]
           + r["within_bin_var"] - 2 * r["within_bin_cov"])
    assert abs(lhs - rhs) < 5e-6
    assert 0.0 <= r["brier"] <= 1.0
    assert 0.0 <= r["uncertainty"] <= 0.25 + 1e-9


def test_kaplan_meier_monotonicity(spark):
    rows = QUERIES["kaplan_meier_time_to_purchase"](spark, SF_DIR).collect()
    assert rows, "non-degenerate curve expected (deaths exist at sf0.001)"
    prev_risk = None
    prev_log = 1
    for r in rows:
        assert r["n_events"] > 0
        assert 0 < r["hazard_micro"] <= 1_000_000
        if prev_risk is not None:
            assert r["n_at_risk"] < prev_risk  # strictly shrinking risk set
            assert r["log_surv_micro_nats"] < prev_log  # S strictly drops
        prev_risk, prev_log = r["n_at_risk"], r["log_surv_micro_nats"]
        assert r["log_surv_micro_nats"] < 0


def test_qq_probit_literals_match_acklam():
    """The probit micro literals injected into both engines re-derive from
    Acklam's approximation (the literals-match-formulas discipline)."""
    from veri_spark.plans.evaluation import _QQ_GRID

    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]

    def probit(p):
        plow, phigh = 0.02425, 1 - 0.02425
        if p < plow:
            q = math.sqrt(-2 * math.log(p))
            return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                    + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
        if p > phigh:
            q = math.sqrt(-2 * math.log(1 - p))
            return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                     + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
        q = p - 0.5
        r = q * q
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
                + a[5]) * q / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                                + b[4]) * r + 1)

    for p_pct, z_micro in _QQ_GRID:
        assert z_micro == round(probit(p_pct / 100.0) * 1e6)


def test_qq_symmetry_and_median(spark):
    rows = {r["p_pct"]: r for r in
            QUERIES["value_qq_normal_audit"](spark, SF_DIR).collect()}
    assert sorted(rows) == [1, 5, 10, 25, 50, 75, 90, 95, 99]
    # theoretical grid is antisymmetric; empirical quantiles monotone
    for lo, hi in [(1, 99), (5, 95), (10, 90), (25, 75)]:
        assert rows[lo]["z_theo_micro"] == -rows[hi]["z_theo_micro"]
    qs = [rows[p]["emp_q"] for p in sorted(rows)]
    assert qs == sorted(qs)


def test_theil_sen_matches_bruteforce(spark):
    [r] = QUERIES["theil_sen_daily_trend"](spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    days = sorted((row["d"].toordinal(), row["n"]) for row in daily)
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(days)
        for (x2, y2) in days[i + 1:]
    )
    m = len(slopes)
    med = 0.5 * (slopes[(m + 1) // 2 - 1] + slopes[(m + 2) // 2 - 1])
    assert r["n_days"] == len(days) and r["n_pairs"] == m
    assert abs(r["theil_sen_slope"] - med) < 1e-6


def test_heaps_fit_consistency(spark):
    [r] = QUERIES["heaps_law_fit"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").collect()
    total = sum(len(d["text"].split(" ")) for d in docs)
    vocab = len({w for d in docs for w in d["text"].split(" ")})
    assert r["n_checkpoints"] == 16
    assert r["total_tokens"] == total
    assert r["vocab_size"] == vocab
    # the synthetic corpus has a CLOSED ~30-word vocabulary: V saturates
    # in the first checkpoint, so the honest exponent is ~0 (the query's
    # point is detecting exactly this; natural text gives ~0.7)
    assert 0.0 <= r["heaps_beta"] < 1.0


def test_kmv_exact_branch_small_sf(spark):
    """At sf0.001 both user sets are smaller than k=64 — the sketch IS the
    set and every estimate must be exact."""
    [r] = QUERIES["kmv_intersection_estimate"](spark, SF_DIR).collect()
    assert r["n_click_users"] < 64 and r["n_purchase_users"] < 64
    ev = load_table(spark, SF_DIR, "events")
    a = {x["user_id"] for x in
         ev.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    b = {x["user_id"] for x in
         ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    assert r["exact_intersection"] == len(a & b)
    assert r["union_est"] == float(len(a | b))
    assert abs(r["intersection_est"] - len(a & b)) < 0.5 + 1e-9
    assert abs(r["jaccard_est"] - len(a & b) / len(a | b)) < 1e-6


def test_spotsigs_pairs_are_valid(spark):
    rows = QUERIES["spotsigs_neardup"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["n_common"] >= 1
    jacs = [r["jaccard"] for r in rows]
    assert jacs == sorted(jacs, reverse=True)


def test_scd2_conserves_events(spark):
    rows = QUERIES["scd2_intervals_from_events"](spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_events"] for r in rows) == n_events
    # exactly one open (current) interval per user, spread across states
    assert sum(r["n_current"] for r in rows) == n_users
    for r in rows:
        assert r["n_intervals"] == r["n_closed"] + r["n_current"]


def test_mase_internal_consistency(spark):
    [r] = QUERIES["hourly_seasonal_naive_mase"](spark, SF_DIR).collect()
    assert r["n_hours"] == r["n_naive"] + 1  # dense grid: one lag-1 pair/hour
    assert r["n_seasonal"] == r["n_hours"] - 24
    assert abs(
        r["mase"]
        - (r["sae_seasonal"] * r["n_naive"]) / (r["sae_naive"] * r["n_seasonal"])
    ) < 1e-6


def test_entropy_rate_bounds(spark):
    [r] = QUERIES["markov_entropy_rate"](spark, SF_DIR).collect()
    assert r["n_cells"] <= r["n_states"] * r["n_states"]
    assert 0.0 <= r["entropy_rate_nats"] <= math.log(r["n_states"]) + 1e-6


def test_little_law_holds_approximately(spark):
    """The interior-window identity L ~ lambda * W; the synthetic ship
    lags are long relative to the trim, so allow a generous band — the
    query's value is REPORTING the ratio, not forcing it to 1."""
    [r] = QUERIES["orders_little_law_audit"](spark, SF_DIR).collect()
    assert r["window_days"] > 0 and r["n_orders_arrived"] > 0
    assert 0.5 < r["little_ratio"] < 2.0
    assert abs(
        r["avg_backlog"]
        - r["little_ratio"] * r["lambda_per_day"] * r["avg_wait_days"]
    ) < 2e-2


def test_lorenz_curve_shape(spark):
    rows = QUERIES["user_lorenz_curve"](spark, SF_DIR).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cums = [r["cum_share_micro"] for r in rows]
    assert cums == sorted(cums)
    assert abs(cums[-1] - 1_000_000) <= 10
    # convexity holds per USER, not per decile (ntile remainders make the
    # early deciles LARGER); check the per-user mean share instead
    per_user = [r["share_micro"] / r["n_users"] for r in rows]
    assert all(b >= a - 10 for a, b in zip(per_user, per_user[1:]))
