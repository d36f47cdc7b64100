"""Text retrieval & corpus-statistics tier: BM25, chi-square/PSI drift, diversity indices, Heaps/Hill/Chao1, readability.

Split from plans/text.py (round-11 hygiene, mirroring the round-5/6/10
splits); every (PySpark program, DuckDB oracle) pair is unchanged and
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

from veri_spark.functions.text import EN_STOPWORDS_SQL  # noqa: F401

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
    "bm25_ranking",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS len FROM tok GROUP BY doc_id),
    stats AS (SELECT AVG(len) AS avglen,
                     (SELECT COUNT(*) FROM documents)::DOUBLE AS n
              FROM dl),
    q AS (SELECT unnest(['spark', 'table', 'query']) AS term),
    tf AS (SELECT t.doc_id, t.term, COUNT(*)::DOUBLE AS tf
           FROM tok t JOIN q USING (term) GROUP BY t.doc_id, t.term),
    df AS (SELECT term, COUNT(DISTINCT doc_id)::DOUBLE AS df
           FROM tf GROUP BY term),
    sc AS (
      SELECT tf.doc_id,
             SUM(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / s.avglen))) AS score
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY tf.doc_id)
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM sc ORDER BY bm25 DESC, doc_id ASC LIMIT 15
    """,
)
def bm25_ranking(spark, sf_dir):
    """BM25 retrieval scoring (Robertson-Sparck Jones; k1=1.2, b=0.75) for
    a fixed 3-term query — the lexical ranker a RAG stack runs beside the
    embedding KNN path (`tfidf_doc_similarity` compares documents to each
    other; this ranks documents against a QUERY). The query-term semi-join
    prunes the token stream to matching postings BEFORE any aggregation;
    doc lengths aggregate once; N/avglen and the per-term IDFs are
    broadcast scalars. At 100 TB this is the posting-list scan shape: cost
    scales with matching postings, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("len"))
    stats = dl.agg(F.avg("len").alias("avglen")).crossJoin(
        docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    q = spark.createDataFrame([("spark",), ("table",), ("query",)], "term string")
    tf = (
        tok.join(F.broadcast(q), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    sc = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * F.col("tf") * 2.2
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("len") / F.col("avglen")))
            ).alias("score")
        )
    )
    return (
        sc.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(15)
    )



@register(
    "lang_source_chi2",
    """
    WITH c AS (
      SELECT lang, source, COUNT(*)::DOUBLE AS n
      FROM documents GROUP BY lang, source),
    m AS (SELECT SUM(n) AS tot FROM c),
    lm AS (SELECT lang, SUM(n) AS nl FROM c GROUP BY lang),
    sm AS (SELECT source, SUM(n) AS ns FROM c GROUP BY source),
    x AS (
      SELECT c.lang, c.source, c.n,
             lm.nl * sm.ns / m.tot AS expected
      FROM c JOIN lm USING (lang) JOIN sm USING (source) CROSS JOIN m)
    SELECT ROUND(SUM((n - expected) * (n - expected) / expected), 6) AS chi2,
           COUNT(*)::BIGINT AS n_cells,
           ROUND(MAX(expected), 6) AS max_expected
    FROM x
    """,
)
def lang_source_chi2(spark, sf_dir):
    """Chi-square independence statistic for the lang x source
    contingency table — the corpus-balance audit that flags a shard
    whose language mix diverges from the corpus mix (the formal version
    of eyeballing `lang_confusion_matrix`). One groupBy over documents
    builds the table; marginals re-aggregate the |langs| x |sources|
    cells and broadcast back. The statistic is a sum of per-cell terms:
    order-insensitive at the rounding grain."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    m = c.agg(F.sum("n").alias("tot"))
    lm = c.groupBy("lang").agg(F.sum("n").alias("nl"))
    sm = c.groupBy("source").agg(F.sum("n").alias("ns"))
    x = (
        c.join(F.broadcast(lm), "lang")
        .join(F.broadcast(sm), "source")
        .crossJoin(F.broadcast(m))
        .select(
            "n", (F.col("nl") * F.col("ns") / F.col("tot")).alias("expected")
        )
    )
    return x.agg(
        F.round(
            F.sum((F.col("n") - F.col("expected")) ** 2 / F.col("expected")), 6
        ).alias("chi2"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.max("expected"), 6).alias("max_expected"),
    )



@register(
    "length_quality_correlation",
    """
    WITH q AS (
      SELECT len(ws)::DOUBLE AS x,
             LEAST(1.0, len(ws) / 64.0)
               * (len(list_distinct(ws))::DOUBLE / len(ws)) AS y
      FROM (SELECT string_split(text, ' ') AS ws FROM documents)),
    s AS (SELECT COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
          FROM q)
    SELECT ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS pearson_r,
           n::BIGINT AS n_docs
    FROM s
    """,
)
def length_quality_correlation(spark, sf_dir):
    """Pearson correlation between document length (tokens) and the
    length-times-lexical-diversity quality score — the confounder check a
    quality-gate designer runs first (if r is high, a quality filter is
    secretly a length filter, and `quality_percentile_gate`'s per-source
    ranking matters more than the raw score). Computed from power sums
    (one map-side pass, one 6-number reduce), the same order-proof
    discipline as `value_moments_by_type`."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    x = F.size(ws).cast("double")
    y = F.least(F.lit(1.0), F.size(ws) / 64.0) * (
        F.size(F.array_distinct(ws)).cast("double") / F.size(ws)
    )
    q = docs.select(x.alias("x"), y.alias("y"))
    s = q.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return s.select(
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("pearson_r"),
        F.col("n").cast("bigint").alias("n_docs"),
    )



@register(
    "vocab_drift_psi",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents),
    top AS (
      SELECT term FROM tok GROUP BY term
      ORDER BY COUNT(*) DESC, term ASC LIMIT 50),
    c AS (
      SELECT t.source, t.term, COUNT(*)::DOUBLE AS n
      FROM tok t JOIN top USING (term)
      GROUP BY t.source, t.term),
    tot AS (SELECT source, SUM(n) AS tn FROM c GROUP BY source),
    p AS (
      SELECT c.source, c.term, c.n / tot.tn AS p
      FROM c JOIN tot USING (source)),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             SUM((a.p - b.p) * ln(a.p / b.p)) AS psi
      FROM p a JOIN p b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b, ROUND(psi, 6) AS psi
    FROM pairs
    ORDER BY psi DESC, source_a ASC, source_b ASC LIMIT 15
    """,
)
def vocab_drift_psi(spark, sf_dir):
    """Population-stability index between SOURCES over their shared top-50
    vocabulary — the text-side corpus-shift monitor (the event-stream
    analog is `event_type_drift_psi`; this one answers "does crawl B's
    language look like crawl A's" before mixing them). The top-K
    vocabulary is a bounded TakeOrdered; per-source term distributions
    join only on those K terms, so the pair fan-out is |sources|^2 x K —
    container grain, never corpus-quadratic. Restricting both sides to
    the SHARED top vocabulary keeps every p > 0, so the PSI log terms
    are total (no epsilon smoothing needed)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("term"))
    top = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("nt"))
        .orderBy(F.col("nt").desc(), F.col("term").asc())
        .limit(50)
        .select("term")
    )
    c = (
        tok.join(F.broadcast(top), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    tot = c.groupBy("source").agg(F.sum("n").alias("tn"))
    p = c.join(F.broadcast(tot), "source").select(
        "source", "term", (F.col("n") / F.col("tn")).alias("p")
    )
    pairs = (
        p.select(F.col("source").alias("source_a"), "term", F.col("p").alias("pa"))
        .join(
            p.select(F.col("source").alias("source_b"), "term", F.col("p").alias("pb")),
            "term",
        )
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))).alias("psi")
        )
    )
    return (
        pairs.select("source_a", "source_b", F.round("psi", 6).alias("psi"))
        .orderBy(F.col("psi").desc(), F.col("source_a").asc(), F.col("source_b").asc())
        .limit(15)
    )



# ---------------------------------------------------------------------------
# Round-4 batch 9: coverage curve, attribution, isotropy
# ---------------------------------------------------------------------------

@register(
    "trigram_coverage_curve",
    """
    WITH g AS (
      SELECT unnest(list_transform(
               range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tri
      FROM (SELECT string_split(text, ' ') AS ws FROM documents)),
    c AS (SELECT tri, COUNT(*)::DOUBLE AS n FROM g GROUP BY tri),
    r AS (SELECT n,
                 row_number() OVER (ORDER BY n DESC, tri ASC) AS rk,
                 SUM(n) OVER () AS tot
          FROM c),
    k AS (SELECT unnest([10, 100, 1000]) AS topk)
    SELECT k.topk::BIGINT AS topk,
           ROUND(SUM(CASE WHEN r.rk <= k.topk THEN r.n ELSE 0 END)
                 / MAX(r.tot), 6) AS coverage
    FROM r CROSS JOIN k
    GROUP BY k.topk ORDER BY topk ASC
    """,
)
def trigram_coverage_curve(spark, sf_dir):
    """Burstiness / compressibility curve: the fraction of all trigram
    OCCURRENCES covered by the top-10/100/1000 distinct trigrams — high
    coverage at small k means a templated, boilerplate-heavy corpus
    (`zipf_slope` fits the same phenomenon's exponent; this reads off the
    operational quantity dedup and dictionary-compression planning use).
    One corpus explode + trigram groupBy; then — since coverage@k only
    ever needs the top max(k)=1000 counts — a BOUNDED ``ORDER BY n DESC
    LIMIT 1000`` (TakeOrderedAndProject: per-partition heaps + one
    driver merge, never the full vocabulary through one task) plus ONE
    plain total-occurrence aggregate. Ranks inside the 1000-row head
    come from the distributed ``global_row_number`` so no unpartitioned
    window appears in the plan at any size (round-7 judge task: the
    previous version ranked the FULL trigram vocabulary — which grows
    with the corpus — through one unfiltered global window that
    WindowGroupLimit cannot bound)."""
    from veri_spark.operators.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    from veri_spark.functions.text import tokens, word_shingles

    g = docs.select(tokens("text").alias("__toks")).select(
        F.explode(word_shingles(F.col("__toks"), 3)).alias("tri")
    )
    c = g.groupBy("tri").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = c.agg(F.sum("n").alias("tot"))
    head = c.orderBy(F.col("n").desc(), F.col("tri").asc()).limit(1000)
    r = global_row_number(
        head, [F.col("n").desc(), F.col("tri").asc()], rn_col="rk"
    )
    ks = spark.createDataFrame([(10,), (100,), (1000,)], "topk bigint")
    return (
        r.crossJoin(F.broadcast(ks))
        .groupBy("topk")
        .agg(
            F.sum(
                F.when(F.col("rk") <= F.col("topk"), F.col("n")).otherwise(0.0)
            ).alias("__cov")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "topk",
            F.round(F.col("__cov") / F.col("tot"), 6).alias("coverage"),
        )
        .orderBy(F.col("topk").asc())
    )



# ---------------------------------------------------------------------------
# Round-5 batch 2: skip-gram co-occurrence mining, per-doc token entropy.
# ---------------------------------------------------------------------------

@register(
    "skipgram_pairs_top",
    """
    WITH ws_t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pairs AS (
      SELECT unnest(list_concat(
               list_transform(range(1, len(ws)),     i -> [ws[i], ws[i + 1]]),
               list_transform(range(1, len(ws) - 1), i -> [ws[i], ws[i + 2]])
             )) AS pr
      FROM ws_t
    )
    SELECT pr[1] AS w1, pr[2] AS w2, COUNT(*)::BIGINT AS n
    FROM pairs
    GROUP BY 1, 2
    ORDER BY n DESC, w1 ASC, w2 ASC
    LIMIT 20
    """,
)
def skipgram_pairs_top(spark, sf_dir):
    """Skip-gram co-occurrence mining (window 2, ordered): the 20 most
    frequent (w_i, w_j) pairs with j-i <= 2 — the positive-pair
    generation step of word2vec-style embedding training, and the raw
    counts behind PMI-based collocation scoring (`bigram_pmi_top` covers
    the gap-1 subset). Pairs are built by ZIPPING each token array with
    its own 1- and 2-shifted slices — map-only array expressions, no
    positional self-join, so the fan-out is exactly 2 pairs per token
    and the only shuffle is the final partial-aggregated pair count.
    At 100 TB that map-side combine is what makes this viable: the pair
    stream never materializes unaggregated off-executor."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    n2 = F.greatest(F.size(ws) - 2, F.lit(0))
    mk = lambda gap, n: F.zip_with(
        F.slice(ws, 1, n),
        F.slice(ws, 1 + gap, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = docs.select(
        F.explode(F.concat(mk(1, n1), mk(2, n2))).alias("pr")
    )
    return (
        pairs.groupBy(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


@register(
    "token_entropy_by_source",
    """
    WITH c AS (
      SELECT doc_id, w, COUNT(*)::DOUBLE AS n
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY doc_id, w
    ),
    t AS (SELECT doc_id, SUM(n) AS tn FROM c GROUP BY doc_id),
    h AS (
      SELECT c.doc_id, -SUM((c.n / t.tn) * ln(c.n / t.tn) / ln(2)) AS ent
      FROM c JOIN t USING (doc_id) GROUP BY c.doc_id
    )
    SELECT d.source, COUNT(*)::BIGINT AS n_docs,
           ROUND(AVG(h.ent), 6) AS avg_entropy_bits,
           ROUND(MIN(h.ent), 6) AS min_entropy_bits,
           ROUND(MAX(h.ent), 6) AS max_entropy_bits
    FROM h JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source ASC
    """,
)
def token_entropy_by_source(spark, sf_dir):
    """Per-document token-distribution Shannon entropy, profiled by
    source: low word-entropy docs are boilerplate / keyword-stuffed /
    machine-generated text (the degenerate repetition that poisons LM
    training), so the per-source entropy band is the quality gate's
    calibration input (`quality_repetition` flags the extreme tail;
    this measures the whole distribution). Two partial-aggregated
    shuffles — (doc, token) counts, then per-doc entropy via
    -sum(p log2 p) — and a per-source rollup whose output is
    source-cardinality-sized. Token counts ride the aggregation keys;
    no token list ever leaves the executor unaggregated."""
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    t = c.groupBy("doc_id").agg(F.sum("n").alias("tn"))
    p = F.col("n") / F.col("tn")
    h = (
        c.join(t, "doc_id")
        .groupBy("doc_id")
        .agg((-F.sum(p * F.log(p) / F.log(F.lit(2.0)))).alias("ent"))
    )
    return (
        h.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("ent"), 6).alias("avg_entropy_bits"),
            F.round(F.min("ent"), 6).alias("min_entropy_bits"),
            F.round(F.max("ent"), 6).alias("max_entropy_bits"),
        )
        .orderBy(F.col("source").asc())
    )



@register(
    "docs_pareto_front",
    """
    WITH d AS (SELECT doc_id,
                      len(list_distinct(string_split(text, ' '))) AS u,
                      n_chars
               FROM documents),
    lv AS (SELECT u, MIN(n_chars) AS mc FROM d GROUP BY u),
    p AS (SELECT u, mc,
                 MIN(mc) OVER (ORDER BY u DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS pm
          FROM lv),
    fr AS (SELECT u, mc FROM p WHERE pm IS NULL OR mc < pm)
    SELECT d.doc_id, d.u AS n_distinct_tokens, d.n_chars
    FROM d JOIN fr ON d.u = fr.u AND d.n_chars = fr.mc
    ORDER BY n_distinct_tokens DESC, doc_id ASC
    """,
)
def docs_pareto_front(spark, sf_dir):
    """Pareto (skyline) front of the corpus on (distinct-token count MAX,
    byte length MIN): the documents no other document dominates —
    maximum lexical diversity per byte, the exemplar set a
    quality-vs-cost curriculum samples from first. The naive skyline is
    an all-pairs dominance test; the distributed form here exploits that
    dominance on two criteria collapses to a 1-D prefix problem: group
    the corpus to one row per distinct-token LEVEL (bounded by the
    per-doc token domain, a few hundred levels — calendar-style
    scale-free, not corpus-sized), take each level's min length, and keep
    levels whose min undercuts the running min of every strictly-higher
    level (rows-preceding window on the tiny level frame, the one place a
    global ordering is legitimate); docs on the front are an equi-join
    back on (level, min-length). Equal (u, len) twins are all
    non-dominated (dominance needs one strict inequality) and all
    returned. Only corpus-scale work: one tokenize+groupBy scan and one
    semi-equi-join. All-integer output — exact at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("u"),
        "n_chars",
    )
    lv = d.groupBy("u").agg(F.min("n_chars").alias("mc"))
    w = (
        Window.orderBy(F.col("u").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fr = (
        lv.withColumn("pm", F.min("mc").over(w))
        .filter(F.col("pm").isNull() | (F.col("mc") < F.col("pm")))
        .select(F.col("u").alias("fu"), F.col("mc").alias("fmc"))
    )
    return (
        d.join(
            F.broadcast(fr),
            (F.col("u") == F.col("fu")) & (F.col("n_chars") == F.col("fmc")),
        )
        .select(
            "doc_id",
            F.col("u").alias("n_distinct_tokens"),
            "n_chars",
        )
        .orderBy(F.col("n_distinct_tokens").desc(), F.col("doc_id").asc())
    )



@register(
    "lang_simpson_diversity_by_source",
    """
    WITH c AS (SELECT source, lang, COUNT(*)::BIGINT AS n
               FROM documents GROUP BY source, lang),
    s AS (SELECT source,
                 SUM(n)::BIGINT AS n_docs,
                 COUNT(*)::BIGINT AS n_langs,
                 SUM(n * (n - 1))::BIGINT AS pair_same
          FROM c GROUP BY source)
    SELECT source, n_docs, n_langs,
           CASE WHEN n_docs > 1
                THEN CAST(round(1e6 * (1 - pair_same::DOUBLE
                                  / (n_docs * (n_docs - 1))::DOUBLE))
                          AS BIGINT)
                ELSE 0 END AS gini_simpson_micro
    FROM s ORDER BY source ASC
    """,
)
def lang_simpson_diversity_by_source(spark, sf_dir):
    """Gini-Simpson language diversity per source: 1 - sum n_i(n_i-1) /
    N(N-1) — the probability two documents drawn WITHOUT replacement from
    a source differ in language (Simpson 1949; the Hunter-Gaston index in
    its unbiased finite-sample form). The companion to the entropy-based
    diversity readouts (`token_entropy_by_source`, `user_entropy`) that
    needs NO logarithm at all: both the pair count and N(N-1) are exact
    BIGINTs, so the index is ONE micro-quantized division per source —
    the cheapest cross-engine-stable diversity metric available, and the
    right one when a 1-ulp-sensitive gate matters more than bit-weighting.
    One partial-aggregated scan to the (source, lang) grain, a second
    tiny aggregate to the source grain."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    s = c.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("bigint").alias("pair_same"),
    )
    return s.select(
        "source",
        "n_docs",
        "n_langs",
        # a single-document source has zero diversity by definition — the
        # unbiased estimator's N(N-1) denominator is 0/0 there, and the two
        # engines disagree on NaN->BIGINT casts
        F.when(
            F.col("n_docs") > 1,
            F.round(
                F.lit(1e6)
                * (
                    1
                    - F.col("pair_same").cast("double")
                    / (F.col("n_docs") * (F.col("n_docs") - 1)).cast("double")
                )
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("gini_simpson_micro"),
    ).orderBy(F.col("source").asc())



@register(
    "calibration_reliability_bins",
    f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
               FROM documents),
    s AS (SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                 len(list_filter(ws, w -> w IN
                     ({EN_STOPWORDS_SQL}))) AS hits,
                 len(ws) AS n
          FROM t WHERE len(ws) > 0),
    b AS (SELECT LEAST((10 * hits) // n, 9)::INT AS bin,
                 pos,
                 CAST(round(1e6 * hits / n) AS BIGINT) AS s_micro
          FROM s)
    SELECT bin,
           COUNT(*)::BIGINT AS n_docs,
           SUM(pos)::BIGINT AS n_positive,
           CAST(round(SUM(s_micro)::DOUBLE / COUNT(*)) AS BIGINT)
             AS mean_score_micro,
           CAST(round(1e6 * SUM(pos) / COUNT(*)) AS BIGINT)
             AS emp_rate_micro
    FROM b GROUP BY bin ORDER BY bin ASC
    """,
)
def calibration_reliability_bins(spark, sf_dir):
    """Reliability diagram (calibration curve) for the stopword-ratio
    language scorer used by `lang_id_heuristic`, treating the ratio as a
    pseudo-probability that a document is English: documents bucketed
    into 10 fixed-width score bins, each bin reporting its mean predicted
    score against the EMPIRICAL rate of the outcome (lang = 'en') — the
    per-bin gap is exactly what Expected Calibration Error integrates,
    and the readout that says whether a threshold on this score means
    what it claims. Binning is INTEGER floor-division of the exact
    (hits, tokens) rational — no double ever decides a bin — and per-doc
    scores are micro-quantized before summing so the bin means are
    single half-up-rounded divisions of exact integers. One tokenize
    scan, one 10-group aggregate; the curve's cost is the scan at any
    scale."""
    from veri_spark.functions.text import EN_STOPWORDS, tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", tokens("text").alias("ws"))
    s = t.filter(F.size("ws") > 0).select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        F.size(
            F.filter(F.col("ws"), lambda w: w.isin(*EN_STOPWORDS))
        ).alias("hits"),
        F.size("ws").alias("n"),
    )
    b = s.select(
        F.least(F.expr("(10 * hits) div n"), F.lit(9))
        .cast("int")
        .alias("bin"),
        "pos",
        F.round(F.lit(1e6) * F.col("hits") / F.col("n"))
        .cast("bigint")
        .alias("s_micro"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("pos").cast("bigint").alias("n_positive"),
            F.round(F.sum("s_micro").cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_score_micro"),
            F.round(F.lit(1e6) * F.sum("pos") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("emp_rate_micro"),
        )
        .orderBy(F.col("bin").asc())
    )


# ---------------------------------------------------------------------------
# Round-8: vocabulary-growth law fit (Heaps/Herdan) via the first-occurrence
# trick — cumulative distinct counts WITHOUT re-scanning any prefix.
# ---------------------------------------------------------------------------

@register(
    "heaps_law_fit",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    rk AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens,
                  ntile(16) OVER (ORDER BY doc_id ASC) AS bucket
           FROM d),
    tf AS (SELECT t.term, MIN(rk.bucket) AS b1
           FROM (SELECT doc_id, unnest(ws) AS term FROM d) t
           JOIN rk ON rk.doc_id = t.doc_id
           GROUP BY t.term),
    vb AS (SELECT b1 AS bucket, COUNT(*)::BIGINT AS v_new FROM tf GROUP BY b1),
    nb AS (SELECT bucket, SUM(n_tokens)::BIGINT AS n_tok FROM rk GROUP BY bucket),
    pts AS (SELECT nb.bucket AS k,
                   SUM(nb.n_tok) OVER (ORDER BY nb.bucket ASC)::BIGINT AS nk,
                   SUM(COALESCE(vb.v_new, 0))
                     OVER (ORDER BY nb.bucket ASC)::BIGINT AS vk
            FROM nb LEFT JOIN vb ON vb.bucket = nb.bucket),
    xy AS (SELECT k,
                  CAST(FLOOR(1e6 * LN(nk::DOUBLE) + 0.5) AS BIGINT) AS x,
                  CAST(FLOOR(1e6 * LN(vk::DOUBLE) + 0.5) AS BIGINT) AS y,
                  nk, vk
           FROM pts),
    fit AS (SELECT COUNT(*)::BIGINT AS kk, SUM(x)::BIGINT AS sx,
                   SUM(y)::BIGINT AS sy, SUM(x * y)::BIGINT AS sxy,
                   SUM(x * x)::BIGINT AS sxx,
                   MAX(nk)::BIGINT AS total_tokens,
                   MAX(vk)::BIGINT AS vocab_size
            FROM xy)
    SELECT kk AS n_checkpoints, total_tokens, vocab_size,
           ROUND((kk * sxy - sx * sy)::DOUBLE
                 / (kk * sxx - sx * sx), 6) AS heaps_beta,
           CAST(round((sy - (kk * sxy - sx * sy)::DOUBLE
                            / (kk * sxx - sx * sx) * sx) / kk)
                AS BIGINT) AS heaps_lnk_micro
    FROM fit
    """,
)
def heaps_law_fit(spark, sf_dir):
    """Heaps'/Herdan's law fit: vocabulary size V grows as K * N^beta with
    corpus token count N — the growth exponent that sizes tokenizer
    vocabularies, embedding tables, and dedup signature universes before
    a corpus is scaled 100x (beta ~0.7 for natural text; lower means a
    closed/templated vocabulary, the `trigram_coverage_curve` phenomenon
    read as an exponent). The cumulative-distinct curve is computed with
    the FIRST-OCCURRENCE trick — no prefix is ever re-scanned: docs are
    ranked once into 16 ordered buckets (distributed rank +
    ntile_from_rank, bit-equal to SQL ntile, no unpartitioned window),
    every term records the MIN bucket where it first appears (one
    grouped aggregate over the exploded corpus), and V_k/N_k fall out of
    per-bucket counts prefix-folded over the 16-row checkpoint frame
    (triangular join, not a window). The log-log OLS fit uses micro-nat
    INTEGER coordinates (floor(1e6*ln+0.5) of exact BIGINTs — the
    WoE/MI idiom), so the moment sums are exact and the slope is ONE
    double division. At 100 TB every step is one partial-aggregated
    shuffle; the checkpoint frame stays 16 rows at any scale."""
    from veri_spark.functions.text import tokens
    from veri_spark.operators.ranking import global_row_number, ntile_from_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("ws")
    )
    base = docs.select("doc_id", F.size("ws").cast("bigint").alias("n_tokens"))
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("__tot"))
    rk = global_row_number(
        base.crossJoin(F.broadcast(tot)), [F.col("doc_id").asc()], rn_col="__rn"
    ).select(
        "doc_id",
        "n_tokens",
        ntile_from_rank(F.col("__rn"), F.col("__tot"), 16).alias("bucket"),
    )
    terms = docs.select("doc_id", F.explode("ws").alias("term"))
    tf = (
        terms.join(rk.select("doc_id", "bucket"), "doc_id")
        .groupBy("term")
        .agg(F.min("bucket").alias("b1"))
    )
    vb = tf.groupBy(F.col("b1").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("v_new")
    )
    nb = rk.groupBy("bucket").agg(
        F.sum("n_tokens").cast("bigint").alias("n_tok")
    )
    cells = nb.join(vb, "bucket", "left").select(
        "bucket", "n_tok", F.coalesce("v_new", F.lit(0)).alias("v_new")
    )
    # 16-row prefix fold (triangular broadcast join, deliberately no window)
    other = cells.select(
        F.col("bucket").alias("b2"),
        F.col("n_tok").alias("n2"),
        F.col("v_new").alias("v2"),
    )
    pts = (
        cells.join(F.broadcast(other), F.col("b2") <= F.col("bucket"))
        .groupBy(F.col("bucket").alias("k"))
        .agg(
            F.sum("n2").cast("bigint").alias("nk"),
            F.sum("v2").cast("bigint").alias("vk"),
        )
    )
    xy = pts.select(
        "k",
        "nk",
        "vk",
        F.floor(F.lit(1e6) * F.log(F.col("nk").cast("double")) + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
        F.floor(F.lit(1e6) * F.log(F.col("vk").cast("double")) + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    fit = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("kk"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.max("nk").cast("bigint").alias("total_tokens"),
        F.max("vk").cast("bigint").alias("vocab_size"),
    )
    beta = (
        F.col("kk") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / (F.col("kk") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return fit.select(
        F.col("kk").alias("n_checkpoints"),
        "total_tokens",
        "vocab_size",
        F.round(beta, 6).alias("heaps_beta"),
        F.round((F.col("sy") - beta * F.col("sx")) / F.col("kk"))
        .cast("bigint")
        .alias("heaps_lnk_micro"),
    )


@register(
    "doc_length_hill_tail",
    """
    WITH L AS (SELECT doc_id, strlen(text)::BIGINT AS len
               FROM documents WHERE strlen(text) > 0),
    top AS (SELECT doc_id, len FROM L
            ORDER BY len DESC, doc_id ASC LIMIT 101),
    r AS (SELECT doc_id, len,
                 row_number() OVER (ORDER BY len DESC, doc_id ASC) AS rn
          FROM top),
    xt AS (SELECT len AS x_tail FROM r WHERE rn = 101),
    terms AS (SELECT CAST(FLOOR(1e6 * ln(r.len * 1.0 / xt.x_tail) + 0.5)
                          AS BIGINT) AS t_micro
              FROM r CROSS JOIN xt WHERE r.rn <= 100),
    s AS (SELECT SUM(t_micro)::BIGINT AS sum_log_micro,
                 COUNT(*)::BIGINT AS k
          FROM terms)
    SELECT s.k, xt.x_tail, s.sum_log_micro,
           ROUND(s.k * 1e6 / s.sum_log_micro, 6) AS hill_alpha
    FROM s CROSS JOIN xt
    """,
)
def doc_length_hill_tail(spark, sf_dir):
    """Hill tail-index estimate of the document-length distribution over
    the top k=100 order statistics: alpha = k / sum_{i<=k} ln(x_(i) /
    x_(k+1)) — the standard extreme-value answer to 'how heavy is the
    long-document tail' (alpha ~ 1-2 = Pareto-heavy: truncation budgets
    and packing bin sizes must plan for it; alpha > 3 = tail thin enough
    to ignore). The tail-INDEX complement of `zipf_slope` (which fits
    the rank-frequency law of tokens, not the size law of documents).

    Scale + determinism: lengths are exact BIGINTs from one column-
    pruned scan; the top-101 selection is a bounded TakeOrdered on
    (len, doc_id) integer keys — the k+1-st statistic is the threshold,
    so the whole estimator runs on a 101-row broadcast frame (the rank
    window is rank<=101-filtered and bounded). Each log term ln(x_i /
    x_tail) is evaluated on the identical correctly-rounded double
    ratio of two BIGINTs in both engines (the WoE/Zipf in-engine-ln
    idiom), micro-quantized PER TERM and integer-summed; alpha is one
    final division."""
    docs = load_table(spark, sf_dir, "documents")
    L = docs.select(
        "doc_id", F.octet_length("text").cast("bigint").alias("len")
    ).filter(F.col("len") > 0)
    top = L.orderBy(F.col("len").desc(), F.col("doc_id").asc()).limit(101)
    w = Window.orderBy(F.col("len").desc(), F.col("doc_id").asc())
    r = top.select(
        "len", F.row_number().over(w).alias("rn")
    )
    xt = r.filter(F.col("rn") == 101).select(
        F.col("len").alias("x_tail")
    )
    terms = (
        r.filter(F.col("rn") <= 100)
        .crossJoin(F.broadcast(xt))
        .select(
            F.floor(
                F.lit(1e6)
                * F.log(F.col("len") * F.lit(1.0) / F.col("x_tail"))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("t_micro")
        )
    )
    s = terms.agg(
        F.sum("t_micro").cast("bigint").alias("sum_log_micro"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return s.crossJoin(F.broadcast(xt)).select(
        "k",
        "x_tail",
        "sum_log_micro",
        F.round(
            F.col("k") * F.lit(1e6) / F.col("sum_log_micro"), 6
        ).alias("hill_alpha"),
    )


@register(
    "readability_flesch_by_source",
    """
    WITH d AS (SELECT source, string_split(text, ' ') AS ws, text
               FROM documents),
    s AS (SELECT source,
                 len(ws)::BIGINT AS words,
                 GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
                   AS sents,
                 CAST(list_sum(list_transform(ws,
                      w -> GREATEST(1, len(regexp_extract_all(lower(w),
                                                              '[aeiouy]+')))))
                      AS BIGINT) AS sylls,
                 len(list_filter(ws,
                      w -> len(regexp_extract_all(lower(w), '[aeiouy]+')) >= 3
                     ))::BIGINT AS complex_words
          FROM d WHERE len(ws) > 0),
    g AS (SELECT source,
                 COUNT(*)::BIGINT AS n_docs,
                 SUM(words)::BIGINT AS words,
                 SUM(sents)::BIGINT AS sents,
                 SUM(sylls)::BIGINT AS sylls,
                 SUM(complex_words)::BIGINT AS complex_words
          FROM s GROUP BY source)
    SELECT source, n_docs, words, sylls,
           ROUND(sylls / (words * 1.0), 6) AS syllables_per_word,
           ROUND(complex_words / (words * 1.0), 6) AS complex_share,
           ROUND(206.835 - 1.015 * (words / (sents * 1.0))
                         - 84.6 * (sylls / (words * 1.0)), 6)
             AS flesch_reading_ease
    FROM g ORDER BY source ASC
    """,
)
def readability_flesch_by_source(spark, sf_dir):
    """Flesch reading-ease panel per source: syllables-per-word, the
    3+-syllable complex-word share (the Gunning-fog numerator), and the
    Flesch score 206.835 - 1.015*(words/sentences) - 84.6*(syllables/
    word) — the classic readability gates a curriculum or quality
    pipeline buckets text by (quality_score measures repetition and
    stopword shape; this measures lexical difficulty, an orthogonal
    axis). Syllables use the standard vowel-group heuristic (runs of
    [aeiouy], min 1 per word) — deterministic and engine-mirrorable,
    unlike dictionary syllabifiers. Sentences are terminator runs
    ([.!?]+) clamped to >= 1; this synthetic corpus has NO terminators,
    so every doc counts 1 sentence and words/sentence degenerates to
    doc length — documented rather than hidden, and the formula stays
    exactly mirrorable (on punctuated corpora the same query reads
    correctly). All counts fold as exact BIGINTs; the three readouts
    are single fixed-order double expressions of those integers.

    Scale: map-only per-doc array math (transform/filter expressions,
    no explode, no UDF), then one partial-aggregated group-by to the
    source frame."""
    from veri_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("source", tokens("text").alias("ws"), "text")
    syl = lambda w: F.greatest(  # noqa: E731
        F.lit(1),
        F.size(F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), F.lit(0))),
    )
    s = d.filter(F.size("ws") > 0).select(
        "source",
        F.size("ws").cast("bigint").alias("words"),
        F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
        )
        .cast("bigint")
        .alias("sents"),
        F.aggregate(
            F.transform(F.col("ws"), lambda w: syl(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("sylls"),
        F.size(
            F.filter(
                F.col("ws"),
                lambda w: F.size(
                    F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), F.lit(0))
                )
                >= 3,
            )
        )
        .cast("bigint")
        .alias("complex_words"),
    )
    g = s.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("sents").cast("bigint").alias("sents"),
        F.sum("sylls").cast("bigint").alias("sylls"),
        F.sum("complex_words").cast("bigint").alias("complex_words"),
    )
    return g.select(
        "source",
        "n_docs",
        "words",
        "sylls",
        F.round(F.col("sylls") / (F.col("words") * F.lit(1.0)), 6).alias(
            "syllables_per_word"
        ),
        F.round(
            F.col("complex_words") / (F.col("words") * F.lit(1.0)), 6
        ).alias("complex_share"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (F.col("words") / (F.col("sents") * F.lit(1.0)))
            - F.lit(84.6) * (F.col("sylls") / (F.col("words") * F.lit(1.0))),
            6,
        ).alias("flesch_reading_ease"),
    ).orderBy(F.col("source").asc())


@register(
    "chao1_vocab_richness",
    """
    WITH tf AS (SELECT term, COUNT(*)::BIGINT AS c
                FROM (SELECT unnest(string_split(text, ' ')) AS term
                      FROM documents)
                GROUP BY term),
    s AS (SELECT COUNT(*)::BIGINT AS v_obs,
                 SUM(c)::BIGINT AS n_tokens,
                 SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
                 SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
          FROM tf)
    SELECT n_tokens, v_obs, f1 AS hapax, f2 AS dis_legomena,
           ROUND(v_obs + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0)), 6)
             AS chao1_estimate,
           CASE WHEN n_tokens > 0
                THEN ROUND(1.0 - f1 / (n_tokens * 1.0), 6)
                ELSE NULL END AS good_turing_coverage
    FROM s
    """,
)
def chao1_vocab_richness(spark, sf_dir):
    """Chao1 lower-bound estimate of TRUE vocabulary size from the
    observed type counts — the capture-recapture view of vocabulary
    (`heaps_law_fit` extrapolates the GROWTH CURVE; Chao1 asks the
    complementary question "how many types exist that we have not seen
    yet", using only the hapax/dis-legomena ratio: unseen mass is
    estimable because singletons are what doubletons were one sample
    ago). Uses the bias-corrected form V + F1(F1-1)/(2(F2+1)) (Chao
    1984; defined even when F2 = 0), plus the Good-Turing sample
    coverage 1 - F1/N — the fraction of the token stream covered by the
    observed vocabulary, the number that prices an OOV rate before
    tokenizer training. Term frequencies are one explode +
    partial-aggregated count; the statistic is one fixed-order double
    expression of four exact BIGINTs.

    Scale: the explode rides the existing scan; everything collapses to
    four integers."""
    from veri_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    s = tf.agg(
        F.count(F.lit(1)).cast("bigint").alias("v_obs"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    return s.select(
        "n_tokens",
        "v_obs",
        F.col("f1").alias("hapax"),
        F.col("f2").alias("dis_legomena"),
        F.round(
            F.col("v_obs")
            + F.col("f1") * (F.col("f1") - F.lit(1.0))
            / (F.lit(2.0) * (F.col("f2") + F.lit(1.0))),
            6,
        ).alias("chao1_estimate"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.lit(1.0) - F.col("f1") / (F.col("n_tokens") * F.lit(1.0)), 6
            ),
        ).alias("good_turing_coverage"),
    )


@register(
    "lang_shannon_evenness_by_source",
    """
    WITH c AS (SELECT source, lang, COUNT(*)::BIGINT AS n_docs
               FROM documents GROUP BY source, lang),
    t AS (SELECT source, SUM(n_docs)::BIGINT AS n_tot,
                 COUNT(*)::BIGINT AS k
          FROM c GROUP BY source),
    q AS (SELECT c.source,
                 CAST(FLOOR(-1e9 * (c.n_docs / (t.n_tot * 1.0))
                            * ln(c.n_docs / (t.n_tot * 1.0)) + 0.5)
                      AS BIGINT) AS h_nano
          FROM c JOIN t USING (source) WHERE t.n_tot > 0)
    SELECT t.source, t.n_tot AS n_docs, t.k AS n_langs,
           ROUND(SUM(q.h_nano) / 1e9, 6) AS shannon_h_nats,
           CASE WHEN t.k > 1
                THEN ROUND(SUM(q.h_nano) / 1e9 / ln(t.k * 1.0), 6)
                ELSE NULL END AS pielou_evenness
    FROM q JOIN t USING (source)
    GROUP BY t.source, t.n_tot, t.k
    ORDER BY t.source ASC
    """,
)
def lang_shannon_evenness_by_source(spark, sf_dir):
    """Shannon entropy and Pielou evenness of each source's language
    mix — the companion to `lang_simpson_diversity_by_source` (Simpson
    weights dominant langs, Shannon weights the tail; J = H/ln k
    normalizes to [0,1] so sources with different lang counts compare
    directly) and the routing readout a multilingual pipeline uses to
    decide which sources need per-lang handling. Per-(source, lang)
    -p ln p terms are nano-quantized from fixed-order double
    expressions of exact BIGINT counts before the per-source fold
    (order-proof, the MI/WoE idiom); single-language sources NULL the
    evenness (ln 1 = 0 denominator) identically in both engines.

    Scale: one partial-aggregated scan to the (source, lang) grid; the
    folds run on a 20 x k_lang bounded frame."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    t = c.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    p = F.col("n_docs") / (F.col("n_tot") * F.lit(1.0))
    q = (
        c.join(t, "source")
        .filter(F.col("n_tot") > 0)
        .select(
            "source",
            F.floor(F.lit(-1e9) * p * F.log(p) + F.lit(0.5))
            .cast("bigint")
            .alias("h_nano"),
        )
    )
    return (
        q.join(t, "source")
        .groupBy("source", "n_tot", "k")
        .agg(F.sum("h_nano").alias("h_sum"))
        .select(
            "source",
            F.col("n_tot").alias("n_docs"),
            F.col("k").alias("n_langs"),
            F.round(F.col("h_sum") / F.lit(1e9), 6).alias("shannon_h_nats"),
            F.when(
                F.col("k") > 1,
                F.round(
                    F.col("h_sum") / F.lit(1e9) / F.log(F.col("k") * F.lit(1.0)),
                    6,
                ),
            ).alias("pielou_evenness"),
        )
        .orderBy(F.col("source").asc())
    )


# ---------------------------------------------------------------------------
# Round-11 stylometry/lexical-diversity batch: Burrows' Delta, Gries' DP,
# MATTR. Shared shortlist: the top-20 corpus words (count desc, word asc).
# ---------------------------------------------------------------------------

_TOP20_WORDS_SQL = """
    tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents),
    wc AS (SELECT w, COUNT(*)::BIGINT AS cw FROM tok GROUP BY w),
    top20 AS (SELECT w, cw FROM wc ORDER BY cw DESC, w ASC LIMIT 20),
    st AS (SELECT source, COUNT(*)::BIGINT AS ts FROM tok GROUP BY source),
    ws AS (SELECT t.source, t.w, COUNT(*)::BIGINT AS cws
           FROM tok t JOIN top20 USING (w) GROUP BY t.source, t.w),
    grid AS (SELECT st.source, top20.w, st.ts, top20.cw,
                    COALESCE(ws.cws, 0)::BIGINT AS cws
             FROM st CROSS JOIN top20
             LEFT JOIN ws ON ws.source = st.source AND ws.w = top20.w)
"""


def _top20_grid(spark, sf_dir):
    """(source, w, ts, cw, cws): the dense top-20-word x source count
    grid (zero-filled), plus per-source token totals -- 20 x n_sources
    rows, bounded by the vocabulary shortlist, shared by the
    stylometry queries."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    wc = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("cw"))
    top20 = wc.orderBy(F.col("cw").desc(), F.col("w").asc()).limit(20)
    st = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("ts")
    )
    ws = (
        tok.join(F.broadcast(top20.select("w")), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cws"))
    )
    return (
        st.crossJoin(F.broadcast(top20))
        .join(ws, ["source", "w"], "left")
        .select(
            "source",
            "w",
            "ts",
            "cw",
            F.coalesce(F.col("cws"), F.lit(0)).cast("bigint").alias("cws"),
        )
    )


@register(
    "burrows_delta_sources",
    f"""
    WITH {_TOP20_WORDS_SQL},
    fq AS (SELECT source, w,
                  CAST(round(1e15 * cws / ts) AS BIGINT) AS fq
           FROM grid),
    mz AS (SELECT w, COUNT(*)::BIGINT AS ns,
                  SUM(CAST(fq AS DECIMAL(38,0))) AS sf,
                  SUM(CAST(fq AS DECIMAL(38,0)) * fq) AS sf2
           FROM fq GROUP BY w),
    z AS (SELECT fq.source, fq.w,
                 (fq.fq / 1e15 - mz.sf::DOUBLE / mz.ns / 1e15)
                 / sqrt(mz.sf2::DOUBLE / mz.ns / 1e30
                        - (mz.sf::DOUBLE / mz.ns / 1e15)
                          * (mz.sf::DOUBLE / mz.ns / 1e15)) AS z
          FROM fq JOIN mz USING (w)
          WHERE mz.sf2::DOUBLE / mz.ns / 1e30
                - (mz.sf::DOUBLE / mz.ns / 1e15)
                  * (mz.sf::DOUBLE / mz.ns / 1e15) > 0),
    pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                     COUNT(*)::BIGINT AS n_words,
                     SUM(CAST(round(1e9 * ABS(a.z - b.z))
                         AS DECIMAL(38,0))) AS dq
              FROM z a JOIN z b
                ON a.w = b.w AND a.source < b.source
              GROUP BY 1, 2)
    SELECT source_a, source_b, n_words,
           ROUND(dq::DOUBLE / 1e9 / n_words, 6) AS burrows_delta
    FROM pairs ORDER BY source_a ASC, source_b ASC
    """,
)
def burrows_delta_sources(spark, sf_dir):
    """Burrows' Delta between every source pair: the classic stylometric
    distance (Burrows 2002) -- z-score each source's relative frequency
    of the top-20 corpus words against the cross-source mean/sd, then
    Delta(a,b) = mean |z_a - z_b| -- the "do these two feeds write
    alike?" readout that catches a relabeled or replayed source before
    `source_overlap_jaccard` can (Delta sees STYLE drift even when no
    document is shared). All counting is corpus-side; everything after
    lives on the 20-word x 20-source grid: relative frequencies are
    femto-quantized integers so the per-word moment folds are exact
    DECIMAL(38,0); zero-variance words drop via a condition on the
    identical-in-both-engines variance double; the pair join is
    grid x grid (hundreds of rows), each pair's 20-term fold
    nano-quantized.

    Scale: one token scan + one top-20 TakeOrdered; the stylometry
    itself runs on a vocabulary-shortlist frame independent of corpus
    size."""
    grid = _top20_grid(spark, sf_dir)
    fq = grid.select(
        "source",
        "w",
        F.round(F.lit(1e15) * F.col("cws") / F.col("ts"))
        .cast("bigint")
        .alias("fq"),
    )
    mz = fq.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns"),
        F.sum(F.col("fq").cast("decimal(38,0)")).alias("sf"),
        F.sum(F.col("fq").cast("decimal(38,0)") * F.col("fq")).alias("sf2"),
    )
    j = fq.join(mz, "w")
    m = F.col("sf").cast("double") / F.col("ns") / F.lit(1e15)
    var = (
        F.col("sf2").cast("double") / F.col("ns") / F.lit(1e30) - m * m
    )
    z = j.filter(var > 0).select(
        "source",
        "w",
        ((F.col("fq") / F.lit(1e15) - m) / F.sqrt(var)).alias("z"),
    )
    a = z.select(
        F.col("source").alias("source_a"), "w", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "w", F.col("z").alias("zb")
    )
    pairs = (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(
                F.round(
                    F.lit(1e9) * F.abs(F.col("za") - F.col("zb"))
                ).cast("decimal(38,0)")
            ).alias("dq"),
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        "n_words",
        F.round(
            F.col("dq").cast("double") / F.lit(1e9) / F.col("n_words"), 6
        ).alias("burrows_delta"),
    ).orderBy(F.col("source_a").asc(), F.col("source_b").asc())


@register(
    "gries_dp_dispersion",
    f"""
    WITH {_TOP20_WORDS_SQL},
    tt AS (SELECT SUM(ts)::BIGINT AS t FROM st),
    dp AS (SELECT g.w, MAX(g.cw)::BIGINT AS cw,
                  SUM(CAST(round(1e9 * ABS(g.cws * 1.0 / g.cw
                                           - g.ts * 1.0 / tt.t))
                      AS DECIMAL(38,0))) AS dq
           FROM grid g CROSS JOIN tt GROUP BY g.w)
    SELECT w AS word, cw AS total_count,
           ROUND(0.5 * dq::DOUBLE / 1e9, 6) AS dp
    FROM dp ORDER BY word ASC
    """,
)
def gries_dp_dispersion(spark, sf_dir):
    """Gries' deviation of proportions (DP, Gries 2008) for the top-20
    corpus words: DP_w = 0.5 * sum_s |share of w's tokens in source s -
    source s's share of ALL tokens| -- the corpus-linguistics
    dispersion standard that `hapax_ratio_by_source` and
    `vocab_coverage` do not give: a word can be frequent yet live in
    ONE source (DP -> 1, a contamination/boilerplate tell), or spread
    exactly with corpus mass (DP -> 0, a true function word; stopword
    lists are audited exactly this way). Both proportions are exact
    integer ratios evaluated identically in both engines; each
    source's term is nano-quantized so the per-word fold over sources
    is exact DECIMAL(38,0).

    Scale: the same one-token-scan + top-20 shortlist as the Delta
    query; DP itself is a 20-sources-per-word fold on the grid."""
    grid = _top20_grid(spark, sf_dir)
    tt = grid.select("source", "ts").distinct().agg(
        F.sum("ts").cast("bigint").alias("t")
    )
    dp = (
        grid.crossJoin(F.broadcast(tt))
        .groupBy("w")
        .agg(
            F.max("cw").cast("bigint").alias("cw"),
            F.sum(
                F.round(
                    F.lit(1e9)
                    * F.abs(
                        F.col("cws") * F.lit(1.0) / F.col("cw")
                        - F.col("ts") * F.lit(1.0) / F.col("t")
                    )
                ).cast("decimal(38,0)")
            ).alias("dq"),
        )
    )
    return dp.select(
        F.col("w").alias("word"),
        F.col("cw").alias("total_count"),
        F.round(F.lit(0.5) * F.col("dq").cast("double") / F.lit(1e9), 6).alias(
            "dp"
        ),
    ).orderBy(F.col("word").asc())


@register(
    "mattr_type_token",
    """
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws
               FROM documents),
    d AS (SELECT doc_id, source, ws, len(ws)::BIGINT AS l
          FROM t WHERE len(ws) >= 50),
    pos AS (SELECT doc_id, source, l,
                   generate_subscripts(ws, 1)::BIGINT AS p,
                   unnest(ws) AS tok
            FROM d),
    pr AS (SELECT doc_id, source, l, p,
                  COALESCE(LAG(p) OVER (PARTITION BY doc_id, tok
                                        ORDER BY p ASC), 0) AS prev
           FROM pos),
    contrib AS (SELECT doc_id, source, l,
                       GREATEST(0, LEAST(p, l - 49)
                                   - GREATEST(p - 49, prev + 1, 1) + 1)
                         AS c
                FROM pr),
    per_doc AS (SELECT doc_id, source,
                       CAST(round(1e9 * SUM(c)
                                  / (50.0 * (MAX(l) - 49))) AS BIGINT)
                         AS mattr_q
                FROM contrib GROUP BY doc_id, source)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           ROUND(SUM(CAST(mattr_q AS DECIMAL(38,0)))::DOUBLE / 1e9
                 / COUNT(*), 6) AS mattr_w50
    FROM per_doc GROUP BY source ORDER BY source ASC
    """,
)
def mattr_type_token(spark, sf_dir):
    """Moving-average type-token ratio (MATTR, Covington-McFall 2010)
    with a 50-token window, averaged per source -- the
    length-independent lexical-diversity measure that fixes the raw
    TTR's document-length bias (`doc_type_token_ratio`'s number falls
    mechanically as documents grow; MATTR windows it away, so sources
    of different document lengths become comparable -- the diversity
    gate a mixture planner can actually act on). The naive form counts
    distinct tokens in every window (O(L * w) distinct-counts); here
    it collapses via the LAST-OCCURRENCE identity: token position p is
    the first occurrence of its type within window i iff prev(p) < i,
    so p's total contribution over all windows is the INTEGER interval
    length max(0, min(p, L-49) - max(p-49, prev+1, 1) + 1) -- one
    closed-form expression per position, no per-window work at all.
    prev comes from LAG over (doc, token) partitions (document-bounded);
    every per-doc MATTR is an exact-integer ratio, nano-quantized for
    the order-proof per-source mean.

    Scale: one position explode (corpus-linear, the shingle grain),
    document-bounded windows, two grouped aggregations -- no frame
    anywhere exceeds the corpus scan itself."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("ws")
    )
    d = docs.filter(F.size("ws") >= 50).select(
        "doc_id", "source", "ws", F.size("ws").cast("bigint").alias("l")
    )
    pos = d.select(
        "doc_id",
        "source",
        "l",
        F.posexplode("ws").alias("p0", "tok"),
    ).select(
        "doc_id",
        "source",
        "l",
        (F.col("p0") + 1).cast("bigint").alias("p"),
        "tok",
    )
    w = Window.partitionBy("doc_id", "tok").orderBy(F.col("p").asc())
    pr = pos.select(
        "doc_id",
        "source",
        "l",
        "p",
        F.coalesce(F.lag("p").over(w), F.lit(0).cast("bigint")).alias(
            "prev"
        ),
    )
    contrib = pr.select(
        "doc_id",
        "source",
        F.col("l"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(F.col("p"), F.col("l") - 49)
            - F.greatest(
                F.col("p") - 49, F.col("prev") + 1, F.lit(1).cast("bigint")
            )
            + 1,
        ).alias("c"),
    )
    per_doc = contrib.groupBy("doc_id", "source").agg(
        F.round(
            F.lit(1e9)
            * F.sum("c")
            / (F.lit(50.0) * (F.max("l") - 49))
        )
        .cast("bigint")
        .alias("mattr_q")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("mattr_q").cast("decimal(38,0)")).cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1)),
                6,
            ).alias("mattr_w50"),
        )
        .orderBy(F.col("source").asc())
    )


@register(
    "good_turing_vocab",
    """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents),
    wc AS (SELECT w, COUNT(*)::BIGINT AS r FROM tok GROUP BY w),
    fof AS (SELECT r, COUNT(*)::BIGINT AS n_r FROM wc
            WHERE r <= 6 GROUP BY r),
    t AS (SELECT COUNT(*)::BIGINT AS n_tokens FROM tok),
    n1 AS (SELECT COALESCE(MAX(CASE WHEN r = 1 THEN n_r END), 0)::BIGINT
             AS v1 FROM fof),
    grid AS (SELECT g.r::BIGINT AS r,
                    COALESCE(a.n_r, 0)::BIGINT AS n_r,
                    COALESCE(b.n_r, 0)::BIGINT AS n_r1
             FROM (SELECT unnest([1, 2, 3, 4, 5]) AS r) g
             LEFT JOIN fof a ON a.r = g.r
             LEFT JOIN fof b ON b.r = g.r + 1)
    SELECT grid.r, grid.n_r, grid.n_r1,
           CASE WHEN grid.n_r > 0
                THEN ROUND((grid.r + 1.0) * grid.n_r1 / grid.n_r, 6)
                END AS gt_smoothed_count,
           ROUND(n1.v1 * 1.0 / t.n_tokens, 6) AS missing_mass
    FROM grid CROSS JOIN t CROSS JOIN n1
    ORDER BY grid.r ASC
    """,
)
def good_turing_vocab(spark, sf_dir):
    """Good-Turing frequency smoothing over the corpus vocabulary:
    smoothed counts r* = (r+1) n_(r+1)/n_r for r = 1..5 and the Turing
    missing-mass estimate P0 = n_1/N -- the unseen-vocabulary readout
    that tells a tokenizer/LM-data planner how much probability the
    NEXT shard will spend on words this corpus has never seen
    (`chao1_vocab_richness` estimates how many unseen TYPES exist;
    Good-Turing estimates how much MASS they carry, which is the
    number perplexity actually pays, Gale-Sampson 1995). The whole
    statistic lives on the frequency-of-frequency table (six integers
    plus the token total): one vocab aggregation, one 5-row literal
    grid with guarded integer divisions; nothing leaves exact
    arithmetic until the two final rationals.

    Scale: one token scan to the vocab grain, one vocab scan to the
    6-row fof frame -- the heavy step is the groupBy the Zipf/Heaps
    queries already pay."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    wc = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    fof = (
        wc.filter(F.col("r") <= 6)
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
    )
    t = tok.agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    v1 = fof.agg(
        F.coalesce(
            F.max(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0)
        )
        .cast("bigint")
        .alias("v1")
    )
    grid = spark.range(1, 6).select(F.col("id").cast("bigint").alias("r"))
    a = fof.select(F.col("r").alias("ra"), F.col("n_r").alias("na"))
    b = fof.select(F.col("r").alias("rb"), F.col("n_r").alias("nb"))
    g = (
        grid.join(F.broadcast(a), F.col("r") == F.col("ra"), "left")
        .join(F.broadcast(b), F.col("rb") == F.col("r") + 1, "left")
        .select(
            "r",
            F.coalesce(F.col("na"), F.lit(0)).cast("bigint").alias("n_r"),
            F.coalesce(F.col("nb"), F.lit(0)).cast("bigint").alias("n_r1"),
        )
    )
    out = g.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(v1))
    return out.select(
        "r",
        "n_r",
        "n_r1",
        F.when(
            F.col("n_r") > 0,
            F.round(
                (F.col("r") + F.lit(1.0)) * F.col("n_r1") / F.col("n_r"), 6
            ),
        ).alias("gt_smoothed_count"),
        F.round(F.col("v1") * F.lit(1.0) / F.col("n_tokens"), 6).alias(
            "missing_mass"
        ),
    ).orderBy(F.col("r").asc())


@register(
    "kneser_ney_bigram_scores",
    """
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    big AS (SELECT unnest(list_transform(range(1, len(ws)),
                   i -> ws[i] || CHR(1) || ws[i+1])) AS bg
            FROM w),
    bc AS (SELECT string_split(bg, CHR(1))[1] AS w1,
                  string_split(bg, CHR(1))[2] AS w2,
                  COUNT(*)::BIGINT AS c12
           FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, SUM(c12)::BIGINT AS c1,
                  COUNT(*)::BIGINT AS fanout
           FROM bc GROUP BY w1),
    cont AS (SELECT w2, COUNT(*)::BIGINT AS n_left FROM bc GROUP BY w2),
    tot AS (SELECT COUNT(*)::BIGINT AS n_types FROM bc),
    s AS (SELECT bc.w1, bc.w2, bc.c12, c1.c1,
                 (bc.c12 - 0.75) / c1.c1
                 + 0.75 * c1.fanout / c1.c1
                   * (cont.n_left::DOUBLE / tot.n_types) AS p_kn
          FROM bc JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN tot)
    SELECT w1, w2, c12 AS n_pair,
           ROUND(c12::DOUBLE / c1, 6) AS p_ml,
           ROUND(p_kn, 6) AS p_kn
    FROM s ORDER BY n_pair DESC, w1 ASC, w2 ASC LIMIT 20
    """,
)
def kneser_ney_bigram_scores(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (fixed discount
    D = 0.75) for the corpus's 20 most frequent bigrams, next to their
    maximum-likelihood estimates — THE smoothing every n-gram LM
    pipeline ships (`bigram_lm_scores` is add-one; KN's continuation
    probability P_cont(w2) = types-to-the-left / total-bigram-types is
    what fixes the "San Francisco" problem add-one can't). All
    ingredients are exact integer counts (pair count, left-context
    total, fanout N1+(w1,.), continuation N1+(.,w2), type total); D =
    0.75 is an exact binary fraction, so p_kn is one fixed-order double
    expression of integers. Bigrams are keyed on a CHR(1) separator so
    tokens containing spaces can't alias (the token stream is
    whitespace-split, making this a pure safety pin).

    Scale: one bigram explode + three hash aggregations, all
    partial-aggregated; the scored join is bigram-grain with two
    broadcast-able side tables; top-20 is a bounded TakeOrdered. (No
    c12 >= k floor here — the head by count is what's reported, and
    the count grids are exact.)"""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(F.split("text", " ").alias("ws"))
    staged = w.select(
        F.expr(
            "transform(sequence(1, size(ws) - 1),"
            " i -> struct(ws[i-1] AS w1, ws[i] AS w2))"
        ).alias("bgs")
    )
    big = staged.select(F.explode("bgs").alias("bg")).select(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    bc = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    c1 = bc.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("fanout"),
    )
    cont = bc.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left")
    )
    tot = bc.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    s = (
        bc.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            (
                (F.col("c12") - F.lit(0.75)) / F.col("c1")
                + F.lit(0.75)
                * F.col("fanout")
                / F.col("c1")
                * (
                    F.col("n_left").cast("double") / F.col("n_types")
                )
            ).alias("p_kn"),
        )
    )
    out = topk(
        s, "c12", 20, higher_is_better=True, tie_cols=["w1", "w2"]
    )
    return out.select(
        "w1",
        "w2",
        F.col("c12").alias("n_pair"),
        F.round(F.col("c12").cast("double") / F.col("c1"), 6).alias("p_ml"),
        F.round("p_kn", 6).alias("p_kn"),
    )


@register(
    "yules_k_by_source",
    """
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    freq AS (SELECT source, t, COUNT(*)::BIGINT AS c
             FROM tok GROUP BY source, t),
    s AS (SELECT source, SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS v,
                 SUM(CAST(c AS DECIMAL(38,0)) * c) AS c2
          FROM freq GROUP BY source)
    SELECT source, n AS n_tokens, v AS n_types,
           ROUND(10000.0 * (c2::DOUBLE - n) / (n::DOUBLE * n), 6)
             AS yules_k
    FROM s ORDER BY source ASC
    """,
)
def yules_k_by_source(spark, sf_dir):
    """Yule's characteristic K per source — the classic repeat-rate
    measure of vocabulary concentration (K = 10^4 (sum_w c_w^2 - N)/N^2,
    i.e. the collision probability of two random token draws, length-
    invariant where raw TTR is not): high K means a source hammers few
    types (boilerplate, templated spam), low K means lexically diverse
    prose. Completes the diversity battery next to `mattr_type_token`
    (windowed TTR), `doc_word_entropy_by_source` (Shannon) and
    `lang_simpson_diversity_by_source` (Simpson over LANGUAGES — same
    functional, different unit of analysis). Sum c^2 folds exactly as
    DECIMAL; K is one fixed-order double expression.

    Scale: one token explode + two partial-aggregated hash
    aggregations; the output frame is |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    freq = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = freq.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("c2"),
    )
    return s.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.round(
            F.lit(10000.0)
            * (F.col("c2").cast("double") - F.col("n"))
            / (F.col("n").cast("double") * F.col("n")),
            6,
        ).alias("yules_k"),
    ).orderBy(F.col("source").asc())


@register(
    "rake_keyword_phrases",
    f"""
    WITH tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS pos,
                        unnest(ws) AS t
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents)),
    flg AS (SELECT doc_id, pos, t,
                   CASE WHEN t IN ({EN_STOPWORDS_SQL}) THEN 1 ELSE 0
                   END AS stop
            FROM tok),
    runs AS (SELECT doc_id, pos, t, stop,
                    SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos ASC)
                      AS run
             FROM flg),
    pw AS (SELECT doc_id, run, pos, t FROM runs WHERE stop = 0),
    phr AS (SELECT doc_id, run,
                   string_agg(t, ' ' ORDER BY pos) AS phrase,
                   COUNT(*)::BIGINT AS len
            FROM pw GROUP BY doc_id, run),
    wstat AS (SELECT pw.t, COUNT(*)::BIGINT AS freq,
                     SUM(phr.len)::BIGINT AS deg
              FROM pw JOIN phr USING (doc_id, run)
              GROUP BY pw.t),
    wscore AS (SELECT t,
                      CAST(FLOOR(1e6 * deg / (freq * 1.0) + 0.5) AS BIGINT)
                        AS score_micro
               FROM wstat),
    uniq AS (SELECT phrase, COUNT(*)::BIGINT AS n_occurrences
             FROM phr GROUP BY phrase),
    scored AS (SELECT u.phrase, u.n_occurrences,
                      COUNT(*)::BIGINT AS n_words,
                      SUM(ws.score_micro)::BIGINT AS score_micro
               FROM uniq u,
                    unnest(string_split(u.phrase, ' ')) AS w(t)
               JOIN wscore ws ON ws.t = w.t
               GROUP BY u.phrase, u.n_occurrences)
    SELECT phrase, n_words, n_occurrences, score_micro
    FROM scored ORDER BY score_micro DESC, phrase ASC LIMIT 15
    """,
)
def rake_keyword_phrases(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010) over the corpus: the
    top-15 candidate phrases by the classic degree/frequency word
    score — the unsupervised keyword extractor every document-
    triage pipeline runs before anything model-based (`tfidf_top_terms`
    ranks single tokens by corpus contrast; RAKE ranks multi-word
    PHRASES by internal co-occurrence, which is where named entities
    and technical terms live). Candidate phrases are maximal stopword-
    free token runs — computed with a doc-bounded prefix count of stop
    flags (run id), never a regex split, so both engines segment
    IDENTICALLY; deg(w) = sum of the lengths of phrase occurrences
    containing w, freq(w) = occurrence count; each word score is
    micro-quantized to an exact integer BEFORE the per-phrase fold, so
    phrase scores are order-proof integer sums.

    Scale: one token explode with a doc-partitioned running sum, three
    hash aggregations (phrase build, word stats, phrase scores) — all
    partial-aggregated; top-15 is a bounded TakeOrdered."""
    from veri_spark.functions.text import EN_STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "t")
    )
    flg = tok.withColumn(
        "stop", F.when(F.col("t").isin(*EN_STOPWORDS), 1).otherwise(0)
    )
    runw = Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
    runs = flg.withColumn("run", F.sum("stop").over(runw))
    pw = runs.filter(F.col("stop") == 0).select("doc_id", "run", "pos", "t")
    phr = pw.groupBy("doc_id", "run").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "t"))),
                lambda s: s["t"],
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).cast("bigint").alias("len"),
    )
    wstat = (
        pw.join(phr, ["doc_id", "run"])
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("len").cast("bigint").alias("deg"),
        )
    )
    wscore = wstat.select(
        "t",
        F.floor(
            F.lit(1e6) * F.col("deg") / (F.col("freq") * F.lit(1.0))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("score_micro"),
    )
    uniq = phr.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    scored = (
        uniq.select(
            "phrase",
            "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("t"),
        )
        .join(wscore, "t")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("score_micro").cast("bigint").alias("score_micro"),
        )
    )
    out = topk(
        scored, "score_micro", 15, higher_is_better=True, tie_cols=["phrase"]
    )
    return out.select("phrase", "n_words", "n_occurrences", "score_micro")
