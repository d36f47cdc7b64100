"""Training-corpus quality gates in the Gopher/C4 style: repetition
signals, rule-based quality flags, lexical diversity, and vocabulary
entropy — the pre-training filter pass of an LLM data pipeline.

The published web-scale filters (Gopher's repetition and quality rules,
C4's line heuristics) gate documents on cheap surface statistics before
any model-based scoring. This corpus is single-line word-soup (no
newlines, small vocabulary), so each filter is re-expressed on the
signals the data actually carries, with thresholds CALIBRATED on the
corpus (each docstring records the measured distribution next to the
chosen cut) — the plumbing, not the constants, is what transfers to
100 TB. All four queries share the same scale shape: one projection
scan explodes to token/bigram grain, partial-aggregated group-bys
collapse back to doc grain then to the bounded source/lang domain —
no shuffle ever carries more than the exploded token stream, and no
per-row Python anywhere.

Determinism: per-doc fractions are micro-quantized integers
(floor(1e6*x + 0.5) on provably nonnegative ratios of exact integers),
flags are integer comparisons on those micros, per-group means are one
double round of exact BIGINT sums, and the only in-engine
transcendental is ln on identical integers (the WoE/Zipf idiom).

Registered into ``plans._base.QUERIES``/``ORACLES`` at import like every
domain module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from veri_spark.functions.text import (
    EN_STOPWORDS,
    EN_STOPWORDS_SQL,
    tokens,
    word_shingles,
)
from veri_spark.sources.catalog import load_table

from veri_spark.plans._base import register

_DD_WS = "(SELECT doc_id, source, lang, string_split(text, ' ') AS ws FROM documents)"


@register(
    "gopher_repetition_gate",
    """
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws
               FROM documents),
    b AS (SELECT doc_id, source,
                 unnest(list_transform(range(1, len(ws)),
                                       i -> ws[i] || ' ' || ws[i+1])) AS bg
          FROM t WHERE len(ws) >= 2),
    c AS (SELECT doc_id, source, bg, COUNT(*)::BIGINT AS cnt
          FROM b GROUP BY doc_id, source, bg),
    d AS (SELECT doc_id, source,
                 CAST(FLOOR(1e6 * SUM(CASE WHEN cnt >= 2 THEN cnt
                                           ELSE 0 END)
                            / SUM(cnt) + 0.5) AS BIGINT) AS dup_micro
          FROM c GROUP BY doc_id, source)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN dup_micro > 125000 THEN 1 ELSE 0 END)::BIGINT
             AS n_flagged,
           CAST(round(SUM(dup_micro) * 1.0 / COUNT(*)) AS BIGINT)
             AS mean_dup_micro,
           MAX(dup_micro)::BIGINT AS max_dup_micro
    FROM d GROUP BY source ORDER BY source ASC
    """,
)
def gopher_repetition_gate(spark, sf_dir):
    """Gopher-style repetition filter: per document, the fraction of
    bigram occurrences that belong to DUPLICATED bigrams (Rae et al.'s
    'fraction of text in duplicate n-grams' family — boilerplate and
    template spam repeat phrases; prose doesn't), flagged above 12.5%
    and reported per source so a single bad feed is visible directly.
    Calibration on this corpus (measured at sf0.01): median 5.6%, p90
    12.9%, p95 16.1% — the 0.125 cut flags the worst ~10%, the slice a
    production pipeline routes to review. The fraction is argmax-free
    (a top-1-bigram variant needs a cross-engine argmax tie-break;
    SUM(cnt | cnt>=2)/SUM(cnt) is pure aggregation) and micro-quantized
    per doc, so the flag is an INTEGER comparison and per-source means
    are one round of exact BIGINT sums.

    Scale: explode to bigram grain (token-stream sized), two
    partial-aggregated group-bys back down to doc then source grain —
    the same shape as the shingle dedup family, no corpus-sized state
    anywhere."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("ws")
    )
    b = (
        docs.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(word_shingles(F.col("ws"), 2)).alias("bg"),
        )
    )
    c = b.groupBy("doc_id", "source", "bg").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    d = c.groupBy("doc_id", "source").agg(
        F.floor(
            F.lit(1e6)
            * F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0))
            / F.sum("cnt")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("dup_micro")
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("dup_micro") > 125000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.round(F.sum("dup_micro") * F.lit(1.0) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_dup_micro"),
            F.max("dup_micro").cast("bigint").alias("max_dup_micro"),
        )
        .orderBy(F.col("source").asc())
    )


@register(
    "gopher_quality_flags",
    f"""
    WITH t AS {_DD_WS},
    m AS (SELECT source,
                 len(ws)::BIGINT AS wc,
                 list_sum(list_transform(ws, w -> strlen(w)))::BIGINT
                   AS chars,
                 len(list_filter(ws, w -> w IN ({EN_STOPWORDS_SQL})))::BIGINT
                   AS sw
          FROM t WHERE len(ws) > 0)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN wc BETWEEN 20 AND 90 THEN 1 ELSE 0 END)::BIGINT
             AS pass_word_count,
           SUM(CASE WHEN chars * 10 BETWEEN 42 * wc AND 48 * wc
                    THEN 1 ELSE 0 END)::BIGINT AS pass_mean_word_len,
           SUM(CASE WHEN sw >= 2 THEN 1 ELSE 0 END)::BIGINT
             AS pass_stopwords,
           SUM(CASE WHEN wc BETWEEN 20 AND 90
                     AND chars * 10 BETWEEN 42 * wc AND 48 * wc
                     AND sw >= 2 THEN 1 ELSE 0 END)::BIGINT AS pass_all
    FROM m GROUP BY source ORDER BY source ASC
    """,
)
def gopher_quality_flags(spark, sf_dir):
    """Gopher-style rule gate, per source: word count in [20, 90], mean
    word length in [4.2, 4.8], and >= 2 core stopwords (Rae et al.'s
    50-100k-word / 3-10-char / stop-word-presence rules, re-calibrated
    to this corpus's measured p10-p90 bands: word count median 56 with
    p99 97; mean word length p10 4.26, p90 4.77; stopword count median
    1). Reports per-rule AND all-rules pass counts so the marginal bite
    of each rule is visible — the number a pipeline owner reads before
    turning a rule on.

    Determinism: the mean-word-length band is evaluated as the INTEGER
    cross-multiplication chars*10 BETWEEN 42*wc AND 48*wc, so the rule
    is exact in both engines by construction — this query contains no
    division at all. Scale: one projection scan,
    per-doc stats from in-row array ops (no explode), one group-by on
    the bounded source domain."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", tokens("text").alias("ws")
    )
    m = docs.filter(F.size("ws") > 0).select(
        "source",
        F.size("ws").cast("bigint").alias("wc"),
        F.aggregate(
            F.transform(F.col("ws"), lambda w: F.length(w)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("chars"),
        F.size(F.filter(F.col("ws"), lambda w: w.isin(*EN_STOPWORDS)))
        .cast("bigint")
        .alias("sw"),
    )
    r_wc = F.col("wc").between(20, 90)
    r_mwl = (F.col("chars") * 10 >= 42 * F.col("wc")) & (
        F.col("chars") * 10 <= 48 * F.col("wc")
    )
    r_sw = F.col("sw") >= 2
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            flag(r_wc).alias("pass_word_count"),
            flag(r_mwl).alias("pass_mean_word_len"),
            flag(r_sw).alias("pass_stopwords"),
            flag(r_wc & r_mwl & r_sw).alias("pass_all"),
        )
        .orderBy(F.col("source").asc())
    )


@register(
    "doc_type_token_ratio",
    f"""
    WITH t AS {_DD_WS},
    d AS (SELECT lang,
                 CAST(FLOOR(1e6 * len(list_distinct(ws)) * 1.0 / len(ws)
                            + 0.5) AS BIGINT) AS ttr_micro
          FROM t WHERE len(ws) > 0)
    SELECT lang, COUNT(*)::BIGINT AS n_docs,
           CAST(round(SUM(ttr_micro) * 1.0 / COUNT(*)) AS BIGINT)
             AS mean_ttr_micro,
           MIN(ttr_micro)::BIGINT AS min_ttr_micro,
           MAX(ttr_micro)::BIGINT AS max_ttr_micro
    FROM d GROUP BY lang ORDER BY lang ASC
    """,
)
def doc_type_token_ratio(spark, sf_dir):
    """Type-token ratio (distinct words / words) per document, aggregated
    by language — the per-doc lexical-diversity gate (1 - TTR is
    Gopher's duplicate-WORD fraction, so this is the word-grain sibling
    of the bigram repetition gate, and the per-doc instantaneous version
    of the corpus-growth curve `heaps_law_fit` measures). Low-TTR docs
    are keyword-stuffed or template spam; the lang grouping exposes
    whether a language's feed is systematically worse. Corpus
    calibration (sf0.01): median 0.46, p10 0.32, p90 0.75.

    Determinism + scale: TTR is micro-quantized per doc from two exact
    in-row integers (array_distinct/size — no explode, no shuffle before
    the bounded lang group-by); group means are one round of BIGINT
    sums."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", tokens("text").alias("ws")
    )
    d = docs.filter(F.size("ws") > 0).select(
        "lang",
        F.floor(
            F.lit(1e6)
            * F.size(F.array_distinct(F.col("ws")))
            * F.lit(1.0)
            / F.size("ws")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ttr_micro"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.sum("ttr_micro") * F.lit(1.0) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_ttr_micro"),
            F.min("ttr_micro").cast("bigint").alias("min_ttr_micro"),
            F.max("ttr_micro").cast("bigint").alias("max_ttr_micro"),
        )
        .orderBy(F.col("lang").asc())
    )


@register(
    "doc_word_entropy_by_source",
    """
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws
               FROM documents),
    w AS (SELECT doc_id, source, unnest(ws) AS word FROM t
          WHERE len(ws) > 0),
    c AS (SELECT doc_id, source, word, COUNT(*)::BIGINT AS cnt
          FROM w GROUP BY doc_id, source, word),
    d AS (SELECT doc_id, source,
                 SUM(cnt)::BIGINT AS n,
                 SUM(CAST(round(1e9 * (cnt * ln(cnt::DOUBLE)))
                          AS BIGINT))::BIGINT AS s_nano
          FROM c GROUP BY doc_id, source),
    e AS (SELECT source,
                 CAST(FLOOR(1e6 * (ln(n::DOUBLE) - s_nano / (1e9 * n))
                            + 0.5) AS BIGINT) AS ent_micro
          FROM d)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           CAST(round(SUM(ent_micro) * 1.0 / COUNT(*)) AS BIGINT)
             AS mean_ent_micro,
           MIN(ent_micro)::BIGINT AS min_ent_micro,
           MAX(ent_micro)::BIGINT AS max_ent_micro
    FROM e GROUP BY source ORDER BY source ASC
    """,
)
def doc_word_entropy_by_source(spark, sf_dir):
    """Per-document vocabulary (Shannon) entropy in micro-nats,
    aggregated by source — the information-density gate: entropy near
    ln(n) means every word is fresh (diverse prose), near 0 means one
    word dominates (spam/boilerplate), and it weighs repetition by HOW
    MUCH a word repeats where TTR only counts distinctness. Uses the
    factored identity H = ln(n) - (sum_w c_w ln c_w)/n so the per-word
    cells are independent of the doc total: each cell's c*ln(c) is
    nano-quantized (ln on an identical BIGINT-cast integer in both
    engines — the WoE/Zipf idiom; c=1 contributes exactly 0) and summed
    as BIGINT, making the cross-cell fold order-proof; the per-doc
    entropy is then ONE fixed-order double expression of two exact
    integers, micro-quantized before the bounded source group-by.

    Scale: explode to word grain, two partial-aggregated group-bys
    (doc x word, then doc), then the bounded source aggregate — the
    Zipf/heaps explode shape."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens("text").alias("ws")
    )
    w = docs.filter(F.size("ws") > 0).select(
        "doc_id", "source", F.explode("ws").alias("word")
    )
    c = w.groupBy("doc_id", "source", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    d = c.groupBy("doc_id", "source").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(
            F.round(
                F.lit(1e9)
                * (F.col("cnt") * F.log(F.col("cnt").cast("double")))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("s_nano"),
    )
    e = d.select(
        "source",
        F.floor(
            F.lit(1e6)
            * (
                F.log(F.col("n").cast("double"))
                - F.col("s_nano") / (F.lit(1e9) * F.col("n"))
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ent_micro"),
    )
    return (
        e.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.sum("ent_micro") * F.lit(1.0) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_ent_micro"),
            F.min("ent_micro").cast("bigint").alias("min_ent_micro"),
            F.max("ent_micro").cast("bigint").alias("max_ent_micro"),
        )
        .orderBy(F.col("source").asc())
    )


# chi-square 95% critical values: 1 df = probit(0.975)^2, 2 df (exact:
# -2 ln 0.05). Python-side literals per the registry's constant rule.
_CHI2_95_DF1 = 1.959963984540054 ** 2
_CHI2_95_DF2 = 5.991464547107979


@register(
    "mcnemar_rule_agreement",
    """
    WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
    m AS (SELECT CASE WHEN len(ws) BETWEEN 20 AND 90 THEN 1 ELSE 0 END
                   AS r_wc,
                 CASE WHEN len(list_filter(ws,
                        w -> w IN ('the', 'a', 'of', 'and', 'to', 'in',
                                   'is'))) >= 2
                      THEN 1 ELSE 0 END AS r_sw
          FROM t WHERE len(ws) > 0),
    s AS (SELECT COUNT(*)::BIGINT AS n,
                 SUM(r_wc * r_sw)::BIGINT AS both_pass,
                 SUM(CASE WHEN r_wc = 1 AND r_sw = 0 THEN 1 ELSE 0
                     END)::BIGINT AS b,
                 SUM(CASE WHEN r_wc = 0 AND r_sw = 1 THEN 1 ELSE 0
                     END)::BIGINT AS c
          FROM m)
    SELECT n AS n_docs, both_pass AS n_both_pass, b AS n_wc_only,
           c AS n_sw_only,
           CASE WHEN b + c > 0
                THEN ROUND((abs(b - c) - 1.0) * (abs(b - c) - 1.0)
                           / (b + c), 6)
                ELSE NULL END AS chi2_mcnemar,
           CASE WHEN b + c > 0
                THEN (abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c)
                     > 3.841458820694124
                ELSE NULL END AS marginals_differ_95
    FROM s
    """,
)
def mcnemar_rule_agreement(spark, sf_dir):
    """McNemar's paired test between the two cheapest quality gates (word
    count in [20, 90] vs stopword presence >= 2) ON THE SAME documents:
    do the rules flag at DIFFERENT rates, or just flag different docs at
    the same rate? Only the discordant cells matter (b = wc-only pass,
    c = sw-only pass) — the paired design cancels everything the rules
    agree on, which is what an unpaired two-proportion test gets wrong
    here. Uses the continuity-corrected statistic (|b-c|-1)^2/(b+c)
    against the 1-df chi-square literal (probit(0.975)^2 — the same
    Python-side constant family as `copurchase_lift_chi2`). Everything
    is one partial-aggregated scan to four BIGINTs; the statistic is one
    fixed-order double expression with the b+c=0 degenerate guarded to
    NULL in both engines."""
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
        F.sum(F.col("r_wc") * F.col("r_sw")).cast("bigint").alias("both_pass"),
        F.sum(F.when((F.col("r_wc") == 1) & (F.col("r_sw") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("r_wc") == 0) & (F.col("r_sw") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    stat = (
        (F.abs(F.col("b") - F.col("c")) - F.lit(1.0))
        * (F.abs(F.col("b") - F.col("c")) - F.lit(1.0))
        / (F.col("b") + F.col("c"))
    )
    return s.select(
        F.col("n").alias("n_docs"),
        F.col("both_pass").alias("n_both_pass"),
        F.col("b").alias("n_wc_only"),
        F.col("c").alias("n_sw_only"),
        F.when(F.col("b") + F.col("c") > 0, F.round(stat, 6)).alias(
            "chi2_mcnemar"
        ),
        F.when(
            F.col("b") + F.col("c") > 0, stat > F.lit(_CHI2_95_DF1)
        ).alias("marginals_differ_95"),
    )


@register(
    "cochran_q_rules",
    """
    WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
    m AS (SELECT CASE WHEN len(ws) BETWEEN 20 AND 90 THEN 1 ELSE 0 END
                   AS r1,
                 CASE WHEN list_sum(list_transform(ws, w -> strlen(w))) * 10
                           BETWEEN 42 * len(ws) AND 48 * len(ws)
                      THEN 1 ELSE 0 END AS r2,
                 CASE WHEN len(list_filter(ws,
                        w -> w IN ('the', 'a', 'of', 'and', 'to', 'in',
                                   'is'))) >= 2
                      THEN 1 ELSE 0 END AS r3
          FROM t WHERE len(ws) > 0),
    s AS (SELECT COUNT(*)::BIGINT AS n,
                 SUM(r1)::BIGINT AS c1, SUM(r2)::BIGINT AS c2,
                 SUM(r3)::BIGINT AS c3,
                 SUM(r1 + r2 + r3)::BIGINT AS sr,
                 SUM((r1 + r2 + r3) * (r1 + r2 + r3))::BIGINT AS sr2
          FROM m)
    SELECT n AS n_docs, c1 AS pass_word_count, c2 AS pass_mean_word_len,
           c3 AS pass_stopwords,
           CASE WHEN 3 * sr - sr2 > 0
                THEN ROUND((3.0 * 2.0 * (c1 * c1 + c2 * c2 + c3 * c3)
                            - 2.0 * (sr * sr))
                           / (3.0 * sr - sr2), 6)
                ELSE NULL END AS cochran_q,
           CASE WHEN 3 * sr - sr2 > 0
                THEN (3.0 * 2.0 * (c1 * c1 + c2 * c2 + c3 * c3)
                      - 2.0 * (sr * sr)) / (3.0 * sr - sr2)
                     > 5.991464547107979
                ELSE NULL END AS rules_differ_95
    FROM s
    """,
)
def cochran_q_rules(spark, sf_dir):
    """Cochran's Q across all THREE quality rules (word count, mean word
    length, stopword presence) as k=3 related binary treatments on the
    same documents — the k-rule generalization of the McNemar pair: one
    omnibus answer to 'do the rules pass at the same rate?' before any
    pairwise drill-down (the same omnibus-then-posthoc discipline as
    Kruskal-Wallis before rank pairs, or Holm over segment tests). Uses
    the integer identity Q = [k(k-1) sum C_j^2 - (k-1)(sum C)^2] /
    (k sum R_i - sum R_i^2): C_j are per-rule pass totals, R_i the
    per-doc pass counts (0..3), so both numerator and denominator are
    exact BIGINT aggregates from ONE corpus scan and Q is a single
    fixed-order double division compared against the 2-df chi-square
    literal (-2 ln 0.05). The all-pass/all-fail degenerate (denominator
    0) guards to NULL identically in both engines."""
    docs = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("ws")
    )
    chars = F.aggregate(
        F.transform(F.col("ws"), lambda w: F.length(w)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    m = docs.filter(F.size("ws") > 0).select(
        F.when(F.size("ws").between(20, 90), 1).otherwise(0).alias("r1"),
        F.when(
            (chars * 10 >= 42 * F.size("ws"))
            & (chars * 10 <= 48 * F.size("ws")),
            1,
        )
        .otherwise(0)
        .alias("r2"),
        F.when(
            F.size(F.filter(F.col("ws"), lambda w: w.isin(*EN_STOPWORDS)))
            >= 2,
            1,
        )
        .otherwise(0)
        .alias("r3"),
    )
    ri = F.col("r1") + F.col("r2") + F.col("r3")
    s = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r1").cast("bigint").alias("c1"),
        F.sum("r2").cast("bigint").alias("c2"),
        F.sum("r3").cast("bigint").alias("c3"),
        F.sum(ri).cast("bigint").alias("sr"),
        F.sum(ri * ri).cast("bigint").alias("sr2"),
    )
    num = F.lit(3.0) * F.lit(2.0) * (
        F.col("c1") * F.col("c1")
        + F.col("c2") * F.col("c2")
        + F.col("c3") * F.col("c3")
    ) - F.lit(2.0) * (F.col("sr") * F.col("sr"))
    den = F.lit(3.0) * F.col("sr") - F.col("sr2")
    ok = 3 * F.col("sr") - F.col("sr2") > 0
    return s.select(
        F.col("n").alias("n_docs"),
        F.col("c1").alias("pass_word_count"),
        F.col("c2").alias("pass_mean_word_len"),
        F.col("c3").alias("pass_stopwords"),
        F.when(ok, F.round(num / den, 6)).alias("cochran_q"),
        F.when(ok, num / den > F.lit(_CHI2_95_DF2)).alias(
            "rules_differ_95"
        ),
    )


@register(
    "curriculum_quality_buckets",
    """
    WITH q AS (
      SELECT doc_id,
             LEAST(1.0, len(ws) / 64.0)
               * (len(list_distinct(ws))::DOUBLE / len(ws)) AS quality,
             len(ws)::BIGINT AS n_toks
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      WHERE len(ws) > 0),
    r AS (SELECT n_toks,
                 CAST(floor(1e6 * quality + 0.5) AS BIGINT) AS q_micro,
                 ntile(5) OVER (ORDER BY quality ASC, doc_id ASC) AS stage
          FROM q)
    SELECT stage, COUNT(*)::BIGINT AS n_docs,
           SUM(n_toks)::BIGINT AS n_tokens,
           CAST(round(SUM(q_micro) * 1.0 / COUNT(*)) AS BIGINT)
             AS mean_quality_micro,
           MIN(q_micro)::BIGINT AS min_quality_micro,
           MAX(q_micro)::BIGINT AS max_quality_micro
    FROM r GROUP BY stage ORDER BY stage ASC
    """,
)
def curriculum_quality_buckets(spark, sf_dir):
    """Curriculum staging: the corpus cut into 5 equal-frequency quality
    stages (easy/clean last, low-quality first — the ANTI-curriculum
    order some pipelines use for annealing, or reversed for classic
    Bengio-style curricula; either way the STAGING artifact is this
    table) with per-stage document count, token mass, and quality range
    — the planning readout that tells a training scheduler how many
    tokens each curriculum phase holds. The equal-frequency cut is the
    distributed global rank: ``global_row_number`` on the total
    (quality, doc_id) order + ``ntile_from_rank`` — the same scale-safe
    replacement `quantile_binning_woe` adopted this round (SQL ntile
    bit-for-bit, NO single-partition WindowExec; pinned in
    tests/test_plan_shapes.py). The quality score is the shared
    fixed-order double expression (`quality_percentile_gate` already
    relies on its cross-engine ordering); per-doc scores micro-quantize
    to integers BEFORE any stage-level fold so stage means are exact
    integer arithmetic.

    Scale: one corpus scan, the two-pass distributed rank (range
    exchange + 32-row offset join), one partial-aggregated collapse to
    5 rows."""
    from veri_spark.functions.text import quality_score
    from veri_spark.operators.ranking import global_row_number, ntile_from_rank

    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    q = docs.filter(F.size(ws) > 0).select(
        "doc_id",
        quality_score("text").alias("quality"),
        F.size(ws).cast("bigint").alias("n_toks"),
    )
    ranked = global_row_number(
        q, [F.col("quality").asc(), F.col("doc_id").asc()], rn_col="__rn"
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("__tot"))
    r = ranked.crossJoin(F.broadcast(tot)).select(
        "n_toks",
        F.floor(F.lit(1e6) * F.col("quality") + F.lit(0.5))
        .cast("bigint")
        .alias("q_micro"),
        ntile_from_rank(F.col("__rn"), F.col("__tot"), 5).alias("stage"),
    )
    return (
        r.groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.round(F.sum("q_micro") * F.lit(1.0) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_quality_micro"),
            F.min("q_micro").cast("bigint").alias("min_quality_micro"),
            F.max("q_micro").cast("bigint").alias("max_quality_micro"),
        )
        .orderBy(F.col("stage").asc())
    )


@register(
    "quality_threshold_sweep",
    """
    WITH q AS (
      SELECT CAST(floor(1e6 * (LEAST(1.0, len(ws) / 64.0)
                               * (len(list_distinct(ws))::DOUBLE / len(ws)))
                  + 0.5) AS BIGINT) AS q_micro,
             len(ws)::BIGINT AS n_toks
      FROM (SELECT string_split(text, ' ') AS ws FROM documents)
      WHERE len(ws) > 0),
    thr AS (SELECT unnest([200000, 400000, 600000, 800000]) AS thr_micro),
    s AS (SELECT t.thr_micro,
                 SUM(CASE WHEN q.q_micro >= t.thr_micro THEN 1 ELSE 0
                     END)::BIGINT AS n_docs_kept,
                 SUM(CASE WHEN q.q_micro >= t.thr_micro THEN q.n_toks
                     ELSE 0 END)::BIGINT AS tokens_kept,
                 COUNT(*)::BIGINT AS n_docs,
                 SUM(q.n_toks)::BIGINT AS tokens_total
          FROM thr t CROSS JOIN q GROUP BY t.thr_micro)
    SELECT thr_micro, n_docs_kept, tokens_kept,
           CAST(round(1e6 * n_docs_kept / n_docs) AS BIGINT)
             AS frac_docs_kept_micro,
           CAST(round(1e6 * tokens_kept / tokens_total) AS BIGINT)
             AS frac_tokens_kept_micro
    FROM s ORDER BY thr_micro ASC
    """,
)
def quality_threshold_sweep(spark, sf_dir):
    """Quality-gate policy sweep: for score cutoffs 0.2/0.4/0.6/0.8, how
    many documents and how much token mass a hard quality filter keeps —
    the data-vs-quality tradeoff curve you weigh against compute budget
    when setting the gate (the filtering twin of
    `truncation_waste_sweep`'s length policy, and the corpus-level view
    over `quality_percentile_gate`'s per-source rank cut). Pricing four
    policies costs ONE scoring pass: per-doc scores micro-quantize to
    integers, the 4-row threshold frame broadcasts against the doc
    stream, and every keep decision is an INTEGER comparison (q_micro >=
    thr_micro) — zero float-threshold boundary surface at any scale.
    Kept fractions are single micro-quantized divisions of exact
    BIGINTs.

    Scale: one corpus scan with a 4x broadcast fan-out, partial-agg
    collapse to 4 rows."""
    from veri_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    ws = tokens("text")
    q = docs.filter(F.size(ws) > 0).select(
        F.floor(F.lit(1e6) * quality_score("text") + F.lit(0.5))
        .cast("bigint")
        .alias("q_micro"),
        F.size(ws).cast("bigint").alias("n_toks"),
    )
    thr = spark.createDataFrame(
        [(200000,), (400000,), (600000,), (800000,)], "thr_micro int"
    )
    keep = F.col("q_micro") >= F.col("thr_micro")
    s = (
        q.crossJoin(F.broadcast(thr))
        .groupBy("thr_micro")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_kept"),
            F.sum(F.when(keep, F.col("n_toks")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("tokens_total"),
        )
    )
    return (
        s.select(
            "thr_micro",
            "n_docs_kept",
            "tokens_kept",
            F.round(F.lit(1e6) * F.col("n_docs_kept") / F.col("n_docs"))
            .cast("bigint")
            .alias("frac_docs_kept_micro"),
            F.round(F.lit(1e6) * F.col("tokens_kept") / F.col("tokens_total"))
            .cast("bigint")
            .alias("frac_tokens_kept_micro"),
        )
        .orderBy(F.col("thr_micro").asc())
    )


@register(
    "cronbachs_alpha_rules",
    """
    WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
    m AS (SELECT CASE WHEN len(ws) BETWEEN 20 AND 90 THEN 1 ELSE 0 END
                   AS r1,
                 CASE WHEN list_sum(list_transform(ws, w -> strlen(w))) * 10
                           BETWEEN 42 * len(ws) AND 48 * len(ws)
                      THEN 1 ELSE 0 END AS r2,
                 CASE WHEN len(list_filter(ws,
                        w -> w IN ('the', 'a', 'of', 'and', 'to', 'in',
                                   'is'))) >= 2
                      THEN 1 ELSE 0 END AS r3
          FROM t WHERE len(ws) > 0),
    s AS (SELECT COUNT(*)::BIGINT AS n,
                 SUM(r1)::BIGINT AS c1, SUM(r2)::BIGINT AS c2,
                 SUM(r3)::BIGINT AS c3,
                 SUM(r1 + r2 + r3)::BIGINT AS sr,
                 SUM((r1 + r2 + r3) * (r1 + r2 + r3))::BIGINT AS sr2
          FROM m)
    SELECT n AS n_docs,
           c1 AS pass_word_count, c2 AS pass_mean_word_len,
           c3 AS pass_stopwords,
           CASE WHEN n * sr2 - sr * sr > 0
                THEN ROUND(1.5 * (1.0 -
                       (c1 * (n - c1) + c2 * (n - c2) + c3 * (n - c3))
                       / ((n * sr2 - sr * sr) * 1.0)), 6)
                ELSE NULL END AS cronbach_alpha
    FROM s
    """,
)
def cronbachs_alpha_rules(spark, sf_dir):
    """Cronbach's alpha (= KR-20 for binary items) over the k=3 quality
    rules as a 3-item test battery on the same documents — the internal-
    consistency readout next to the agreement family (`cohens_kappa_
    rules` asks whether two rules agree beyond chance; `cochran_q_rules`
    whether pass RATES differ; alpha whether the rules measure ONE
    underlying quality construct — low alpha says the battery is a
    union of unrelated filters, not a scale, which changes how a
    pipeline should combine them). For binary items the n(n-1)
    denominators of the item and total sample variances cancel, so
    alpha = k/(k-1) * (1 - sum C_j(n - C_j) / (n*SR2 - SR^2)) is a
    ratio of EXACT BIGINTs (C_j per-rule pass totals, SR/SR2 the per-doc
    score sum and sum of squares) with ONE double division — no
    quantization needed anywhere. Constant total score (zero variance)
    guards to NULL identically.

    Scale: one tokenize scan to six integers."""
    docs = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("ws")
    )
    chars = F.aggregate(
        F.transform(F.col("ws"), lambda w: F.length(w)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    m = docs.filter(F.size("ws") > 0).select(
        F.when(F.size("ws").between(20, 90), 1).otherwise(0).alias("r1"),
        F.when(
            (chars * 10 >= 42 * F.size("ws"))
            & (chars * 10 <= 48 * F.size("ws")),
            1,
        )
        .otherwise(0)
        .alias("r2"),
        F.when(
            F.size(F.filter(F.col("ws"), lambda w: w.isin(*EN_STOPWORDS)))
            >= 2,
            1,
        )
        .otherwise(0)
        .alias("r3"),
    )
    ri = F.col("r1") + F.col("r2") + F.col("r3")
    s = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r1").cast("bigint").alias("c1"),
        F.sum("r2").cast("bigint").alias("c2"),
        F.sum("r3").cast("bigint").alias("c3"),
        F.sum(ri).cast("bigint").alias("sr"),
        F.sum(ri * ri).cast("bigint").alias("sr2"),
    )
    n = F.col("n")
    item_ss = (
        F.col("c1") * (n - F.col("c1"))
        + F.col("c2") * (n - F.col("c2"))
        + F.col("c3") * (n - F.col("c3"))
    )
    tot_ss = n * F.col("sr2") - F.col("sr") * F.col("sr")
    return s.select(
        n.alias("n_docs"),
        F.col("c1").alias("pass_word_count"),
        F.col("c2").alias("pass_mean_word_len"),
        F.col("c3").alias("pass_stopwords"),
        F.when(
            tot_ss > 0,
            F.round(
                F.lit(1.5) * (F.lit(1.0) - item_ss / (tot_ss * F.lit(1.0))), 6
            ),
        ).alias("cronbach_alpha"),
    )


@register(
    "yule_q_rules",
    """
    WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
    m AS (SELECT CASE WHEN len(ws) BETWEEN 20 AND 90 THEN 1 ELSE 0 END
                   AS r_wc,
                 CASE WHEN len(list_filter(ws,
                        w -> w IN ('the', 'a', 'of', 'and', 'to', 'in',
                                   'is'))) >= 2
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
    SELECT n AS n_docs, a AS n_both_pass, b + c AS n_disagree,
           CASE WHEN a * d + b * c > 0
                THEN ROUND((a * d - b * c) * 1.0 / (a * d + b * c), 6)
                ELSE NULL END AS yule_q,
           CASE WHEN sqrt(a * d * 1.0) + sqrt(b * c * 1.0) > 0
                THEN ROUND((sqrt(a * d * 1.0) - sqrt(b * c * 1.0))
                           / (sqrt(a * d * 1.0) + sqrt(b * c * 1.0)), 6)
                ELSE NULL END AS yule_y
    FROM s
    """,
)
def yule_q_rules(spark, sf_dir):
    """Yule's Q and Y between the word-count and stopword quality gates —
    the odds-ratio-derived association pair next to `cohens_kappa_rules`
    (kappa is margin-SENSITIVE: two rules with very different base rates
    cap its ceiling below 1 even at perfect association; Q = (OR-1)/
    (OR+1) and the colligation Y = (sqrt(OR)-1)/(sqrt(OR)+1) are
    margin-free, so kappa low + Q high diagnoses a threshold mismatch
    rather than a broken rule). Both are single fixed-order double
    expressions of the same four exact BIGINT cell counts as kappa (the
    a*d/b*c products stay under 2^63 through ~3e9 docs); the degenerate
    ad + bc = 0 guards to NULL with an integer comparison.

    Scale: one conditional-aggregation corpus scan to four integers."""
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
    a, b, c, d = (F.col(k) for k in ("a", "b", "c", "d"))
    sad = F.sqrt(a * d * F.lit(1.0))
    sbc = F.sqrt(b * c * F.lit(1.0))
    return s.select(
        F.col("n").alias("n_docs"),
        a.alias("n_both_pass"),
        (b + c).alias("n_disagree"),
        F.when(
            a * d + b * c > 0,
            F.round((a * d - b * c) * F.lit(1.0) / (a * d + b * c), 6),
        ).alias("yule_q"),
        F.when(sad + sbc > 0, F.round((sad - sbc) / (sad + sbc), 6)).alias(
            "yule_y"
        ),
    )


@register(
    "theil_index_decomposition",
    f"""
    WITH d AS (SELECT source, len(ws)::BIGINT AS x FROM {_DD_WS}
               WHERE len(ws) > 0),
    g AS (SELECT source, COUNT(*)::BIGINT AS ng,
                 SUM(x)::BIGINT AS sg,
                 SUM(CAST(round(1e6 * x * ln(x)) AS DECIMAL(38,0))) AS xlx
          FROM d GROUP BY source),
    t AS (SELECT SUM(ng)::BIGINT AS n, SUM(sg)::BIGINT AS s,
                 SUM(xlx) AS xlx
          FROM g),
    btw AS (SELECT SUM(CAST(round(1e9 * (g.sg * 1.0 / t.s)
                                  * ln((g.sg * 1.0 / g.ng)
                                       / (t.s * 1.0 / t.n)))
                       AS DECIMAL(38,0))) AS bq
            FROM g CROSS JOIN t)
    SELECT t.n AS n_docs,
           ROUND(t.xlx::DOUBLE / 1e6 / t.s - ln(t.s * 1.0 / t.n), 6)
             AS theil_total,
           ROUND(btw.bq::DOUBLE / 1e9, 6) AS theil_between,
           ROUND(t.xlx::DOUBLE / 1e6 / t.s - ln(t.s * 1.0 / t.n)
                 - btw.bq::DOUBLE / 1e9, 6) AS theil_within,
           ROUND((btw.bq::DOUBLE / 1e9)
                 / (t.xlx::DOUBLE / 1e6 / t.s - ln(t.s * 1.0 / t.n)), 6)
             AS between_share
    FROM t CROSS JOIN btw
    """,
)
def theil_index_decomposition(spark, sf_dir):
    """Theil's T inequality index of document token counts, decomposed
    across sources: T = T_within + T_between EXACTLY (the additive
    decomposability that makes Theil -- not Gini -- the budget-audit
    index; `customer_spend_gini` and `user_lorenz_curve` measure
    inequality but cannot attribute it). T_between > T_within says the
    length imbalance is a SOURCE-mix problem (rebalance the mixture);
    the reverse says it is intra-source (cap/split documents). The
    income-share form needs only three exact sums: T = sum(x ln x)/S -
    ln(S/N), and T_between = sum_g (S_g/S) ln(mean_g/mean) -- group
    means enter only inside ln of exact-integer ratios; x ln x terms
    are micro-quantized, per-group between-terms nano-quantized, so
    every fold is exact DECIMAL(38,0); T_within is recovered by the
    identity rather than a second within-group pass.

    Scale: one corpus scan to the source-grain frame (3 numbers per
    source); all index arithmetic on that bounded frame."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", tokens("text").alias("ws")
    )
    d = docs.filter(F.size("ws") > 0).select(
        "source", F.size("ws").cast("bigint").alias("x")
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sg"),
        F.sum(
            F.round(F.lit(1e6) * F.col("x") * F.log(F.col("x"))).cast(
                "decimal(38,0)"
            )
        ).alias("xlx"),
    )
    t = g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sg").cast("bigint").alias("s"),
        F.sum("xlx").alias("xlx"),
    )
    btw = g.crossJoin(F.broadcast(t)).agg(
        F.sum(
            F.round(
                F.lit(1e9)
                * (F.col("sg") * F.lit(1.0) / F.col("s"))
                * F.log(
                    (F.col("sg") * F.lit(1.0) / F.col("ng"))
                    / (F.col("s") * F.lit(1.0) / F.col("n"))
                )
            ).cast("decimal(38,0)")
        ).alias("bq")
    )
    j = t.crossJoin(F.broadcast(btw))
    total = F.col("xlx").cast("double") / F.lit(1e6) / F.col("s") - F.log(
        F.col("s") * F.lit(1.0) / F.col("n")
    )
    between = F.col("bq").cast("double") / F.lit(1e9)
    return j.select(
        F.col("n").alias("n_docs"),
        F.round(total, 6).alias("theil_total"),
        F.round(between, 6).alias("theil_between"),
        F.round(total - between, 6).alias("theil_within"),
        F.round(between / total, 6).alias("between_share"),
    )


@register(
    "atkinson_index_doclen",
    f"""
    WITH d AS (SELECT len(ws)::BIGINT AS x FROM {_DD_WS}
               WHERE len(ws) > 0),
    t AS (SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS s,
                 SUM(CAST(round(1e9 * ln(x)) AS DECIMAL(38,0))) AS lq
          FROM d)
    SELECT n AS n_docs,
           ROUND(s * 1.0 / n, 6) AS mean_len,
           ROUND(exp(lq::DOUBLE / 1e9 / n), 6) AS geomean_len,
           ROUND(1.0 - exp(lq::DOUBLE / 1e9 / n) / (s * 1.0 / n), 6)
             AS atkinson_eps1
    FROM t
    """,
)
def atkinson_index_doclen(spark, sf_dir):
    """Atkinson inequality index (epsilon = 1) of document token counts:
    A = 1 - geomean/mean -- the WELFARE-weighted companion to
    `theil_index_decomposition` (Theil weights by income share, so big
    documents dominate; Atkinson at eps=1 weights the lower tail, so A
    rises when the corpus carries many near-empty documents even if
    totals look fine -- exactly the skew that starves a packing
    pipeline with fragments). One exact-sum pass: N, S, and the
    nano-quantized sum of ln(x) (ln on exact integers, the WoE idiom);
    the geometric mean is a SINGLE exp of one identical-in-both-engines
    double (exp is never folded -- the one-evaluation exception to the
    no-exp rule the odds-ratio CI established).

    Scale: one scan, one 3-number reduce."""
    docs = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("ws")
    )
    d = docs.filter(F.size("ws") > 0).select(
        F.size("ws").cast("bigint").alias("x")
    )
    t = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(
            F.round(F.lit(1e9) * F.log(F.col("x"))).cast("decimal(38,0)")
        ).alias("lq"),
    )
    gm = F.exp(F.col("lq").cast("double") / F.lit(1e9) / F.col("n"))
    mean = F.col("s") * F.lit(1.0) / F.col("n")
    return t.select(
        F.col("n").alias("n_docs"),
        F.round(mean, 6).alias("mean_len"),
        F.round(gm, 6).alias("geomean_len"),
        F.round(F.lit(1.0) - gm / mean, 6).alias("atkinson_eps1"),
    )
