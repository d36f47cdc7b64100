"""Text analysis: stats, language-ID, tokenization, TF-IDF/BM25, n-gram profiles.

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
    "text_stats",
    f"""
    SELECT doc_id,
           len(ws)::BIGINT AS n_tokens,
           len(list_distinct(ws))::BIGINT AS n_distinct_tokens,
           length(text)::BIGINT AS n_chars,
           ROUND(list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws), 6) AS avg_token_len
    FROM {_DD_TOKS}
    """,
)
def text_stats(spark, sf_dir):
    """Per-document token statistics (token counting for the text pipeline)."""
    from veri_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )



@register(
    "lang_id_heuristic",
    f"""
    SELECT doc_id,
           ROUND(len(list_filter(ws, w -> w IN ({EN_STOPWORDS_SQL})))::DOUBLE
                 / len(ws), 6) AS en_ratio,
           CASE WHEN len(list_filter(ws, w -> w IN ({EN_STOPWORDS_SQL})))::DOUBLE
                     / len(ws) >= 0.04
                THEN 'en' ELSE 'other' END AS guess_lang
    FROM {_DD_TOKS}
    """,
)
def lang_id_heuristic(spark, sf_dir):
    """n-gram/stopword language-ID heuristic: core-English stopword ratio."""
    from veri_spark.functions.text import en_stopword_ratio

    docs = load_table(spark, sf_dir, "documents")
    ratio = en_stopword_ratio("text")
    return docs.select(
        "doc_id",
        F.round(ratio, 6).alias("en_ratio"),
        F.when(ratio >= 0.04, "en").otherwise("other").alias("guess_lang"),
    )



@register(
    "token_counts_top",
    f"""
    SELECT tok, COUNT(*)::BIGINT AS cnt
    FROM (SELECT unnest(ws) AS tok FROM {_DD_TOKS})
    GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 20
    """,
)
def token_counts_top(spark, sf_dir):
    """Corpus token frequency (BPE-precursor vocabulary counting)."""
    from veri_spark.functions.text import tokens as toks_fn

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(toks_fn("text")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return topk(counts, "cnt", 20, higher_is_better=True, tie_cols=["tok"])



@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS fp,
           CAST('0x' || substr(md5(lower(trim(text))), 1, 15) AS BIGINT) AS fp_int
    FROM documents
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Deterministic document fingerprints (md5 + 60-bit portable int)."""
    from veri_spark.functions.text import fingerprint, fingerprint_int

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", fingerprint("text").alias("fp"), fingerprint_int("text").alias("fp_int")
    )



@register(
    "quality_score",
    f"""
    SELECT doc_id,
           ROUND(LEAST(1.0, len(ws) / 64.0)
                 * (len(list_distinct(ws)) / len(ws)), 6) AS quality
    FROM {_DD_TOKS}
    """,
)
def quality_score(spark, sf_dir):
    """Heuristic document quality: length saturation x lexical diversity."""
    from veri_spark.functions.text import quality_score as q

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(q("text"), 6).alias("quality"))



@register(
    "bpe_token_counts",
    r"""
    SELECT source,
           SUM(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')))::BIGINT AS total_bpe_tokens,
           SUM(len(string_split(text, ' ')))::BIGINT AS total_ws_tokens
    FROM documents GROUP BY source
    """,
)
def bpe_token_counts(spark, sf_dir):
    """Token accounting two ways: BPE-style pretokens (the LLM-cost proxy)
    vs whitespace words, per source. regexp_count stays in codegen."""
    from veri_spark.functions.text import bpe_token_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(bpe_token_count("text")).alias("total_bpe_tokens"),
        F.sum(token_count("text")).alias("total_ws_tokens"),
    )



# ---------------------------------------------------------------------------
# Batch 6 (round 2): LLM-pipeline depth — repetition quality, boilerplate
# windows, SimHash Hamming radius, int8-quantized search, per-group centroid
# outliers, token/char profiles, MinHash-vs-exact validation — plus
# lead/lag, CUBE, and pivot analytics breadth.
# ---------------------------------------------------------------------------

@register(
    "quality_repetition",
    """
    WITH bg AS (
      SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                            i -> ws[i] || ' ' || ws[i+1])) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY doc_id, gram)
    SELECT doc_id, SUM(c)::BIGINT AS n_grams, MAX(c)::BIGINT AS top_count,
           ROUND(MAX(c)::DOUBLE / SUM(c), 6) AS top_frac,
           ROUND((SUM(c) - COUNT(*))::DOUBLE / SUM(c), 6) AS dup_frac
    FROM pg GROUP BY doc_id
    """,
)
def quality_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals per document: most-frequent-
    bigram share and duplicate-bigram share. Two partial-aggregated
    groupBys; no self-joins (operators/dedup.ngram_repetition)."""
    from veri_spark.operators.dedup import ngram_repetition

    docs = load_table(spark, sf_dir, "documents")
    rep = ngram_repetition(docs, n=2, parallelism=16)
    return rep.select(
        "doc_id",
        "n_grams",
        "top_count",
        F.round("top_frac", 6).alias("top_frac"),
        F.round("dup_frac", 6).alias("dup_frac"),
    )



@register(
    "boilerplate_windows",
    """
    WITH w AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 6, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                    || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]
             ))) AS win
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    dfq AS (SELECT win, COUNT(*) AS df FROM w GROUP BY win),
    per AS (SELECT doc_id, COUNT(*) AS n_windows,
                   SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS n_shared
            FROM w JOIN dfq USING (win) GROUP BY doc_id)
    SELECT doc_id, n_windows::BIGINT AS n_windows, n_shared::BIGINT AS n_shared,
           ROUND(n_shared::DOUBLE / n_windows, 6) AS shared_frac
    FROM per ORDER BY shared_frac DESC, doc_id ASC LIMIT 20
    """,
)
def boilerplate_windows(spark, sf_dir):
    """Cross-document repeated-window fraction (the boilerplate/line-dedup
    signal of web-corpus pipelines, over rolling 8-token windows): docs
    whose windows also appear elsewhere rank first
    (operators/dedup.shared_window_stats)."""
    from veri_spark.operators.dedup import shared_window_stats

    docs = load_table(spark, sf_dir, "documents")
    st = shared_window_stats(docs, k=8, parallelism=16)
    out = topk(st, "shared_frac", 20, higher_is_better=True, tie_cols=["doc_id"])
    return out.select(
        "doc_id", "n_windows", "n_shared", F.round("shared_frac", 6).alias("shared_frac")
    )



@register(
    "token_length_histogram",
    """
    SELECT length(tok)::INT AS tok_len, COUNT(*)::BIGINT AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
    GROUP BY tok_len
    """,
)
def token_length_histogram(spark, sf_dir):
    """Corpus token-length histogram (tokenizer sanity signal): explode ->
    one partial-aggregated groupBy on a tiny key domain."""
    from veri_spark.functions.text import tokens as toks_fn

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(toks_fn("text")).alias("tok"))
        .groupBy(F.length("tok").alias("tok_len"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )



@register(
    "char_trigram_profile",
    """
    WITH g AS (SELECT unnest(list_transform(
                 range(1, greatest(length(lower(text)) - 1, 1)),
                 i -> substr(lower(text), i, 3))) AS tri
               FROM documents)
    SELECT tri, COUNT(*)::BIGINT AS cnt FROM g GROUP BY tri
    ORDER BY cnt DESC, tri ASC LIMIT 20
    """,
)
def char_trigram_profile(spark, sf_dir):
    """Character-trigram frequency profile (the feature space of classic
    n-gram language ID): per-row array expression, explode, one groupBy
    (functions/text.char_ngrams)."""
    from veri_spark.functions.text import char_ngrams

    docs = load_table(spark, sf_dir, "documents")
    tri = docs.select(F.explode(char_ngrams("text", 3)).alias("tri"))
    counts = tri.groupBy("tri").agg(F.count(F.lit(1)).alias("cnt"))
    return topk(counts, "cnt", 20, higher_is_better=True, tie_cols=["tri"])



@register(
    "tfidf_top_terms",
    """
    WITH N AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) x
           GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(*)::BIGINT AS df FROM tf GROUP BY tok),
    ranked AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
                      ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                         ORDER BY tf.tf DESC, df.df ASC, tf.tok ASC) AS rnk
               FROM tf JOIN df USING (tok))
    SELECT doc_id, tok, tf, df, rnk::INT AS rnk,
           FLOOR(tf * ln((n_docs + 1) / (df + 1)) * 1000000 + 0.5) / 1000000 AS tfidf
    FROM ranked, N WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 salient terms per document by TF-IDF. The RANKING is integer-
    deterministic (tf desc, df asc, tok asc) so both engines agree exactly;
    the tfidf VALUE (floor-rounded ln weighting) is reported, not ranked
    on, keeping libm ulp differences out of the comparison. Plan: one
    explode + (doc,tok) groupBy for tf, a tok-keyed groupBy for df (partial
    aggs both), df joins back on the token, rank is a WindowGroupLimit
    (k=3 per doc pushed below the sort). The corpus size N is a single-row
    broadcast, never a driver constant baked at plan time."""
    from veri_spark.functions.text import tokens as toks_fn

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(toks_fn("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok").asc()
    )
    ranked = (
        tf.join(df_, "tok")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .crossJoin(F.broadcast(n_docs))
    )
    tfidf = F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
    return ranked.select(
        "doc_id", "tok", "tf", "df", F.col("rnk").cast("int").alias("rnk"),
        (F.floor(tfidf * 1000000 + 0.5) / 1000000).alias("tfidf"),
    )



@register(
    "regex_keyword_density",
    r"""
    WITH m AS (SELECT doc_id,
                      len(regexp_extract_all(text, '\b(data|query|table)\b')) AS n_hits,
                      len(string_split(text, ' ')) AS n_toks
               FROM documents)
    SELECT doc_id, n_hits::BIGINT AS n_hits,
           FLOOR(n_hits::DOUBLE / n_toks * 1000000 + 0.5) / 1000000 AS density
    FROM m WHERE n_hits > 0
    """,
)
def regex_keyword_density(spark, sf_dir):
    r"""Regex-extraction surface over the corpus (the PII-scrub / boilerplate
    pattern-count shape): per-doc count of a keyword alternation and its
    per-token density. regexp_count is a scan-local native expression in
    whole-stage codegen — the same plan shape a real email/URL/SSN scrub
    runs at 100 TB (pattern swapped, possibly + redaction via
    regexp_replace). Pattern kept to RE2-and-Java-compatible syntax."""
    docs = load_table(spark, sf_dir, "documents")
    from veri_spark.functions.text import tokens as toks_fn

    m = docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"\b(data|query|table)\b")).cast("bigint").alias("n_hits"),
        F.size(toks_fn("text")).alias("n_toks"),
    )
    return m.filter(F.col("n_hits") > 0).select(
        "doc_id", "n_hits",
        (F.floor(F.col("n_hits").cast("double") / F.col("n_toks") * 1000000 + 0.5)
         / 1000000).alias("density"),
    )



@register(
    "unigram_logprob_scores",
    """
    WITH tf AS (
      SELECT doc_id, tok, COUNT(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents) x
      GROUP BY doc_id, tok
    ), freq AS (
      SELECT tok, SUM(tf)::BIGINT AS c FROM tf GROUP BY tok
    )
    SELECT doc_id, SUM(tf)::BIGINT AS n_toks,
           SUM(tf * FLOOR(1000000 * ln(c::DOUBLE) + 0.5)::BIGINT)::BIGINT
             AS sum_micro_log
    FROM tf JOIN freq USING (tok)
    GROUP BY doc_id
    """,
)
def unigram_logprob_scores(spark, sf_dir):
    """Unigram language-model quality proxy: per-doc sum of per-token
    corpus log-frequencies — the cheap stand-in for the KenLM/perplexity
    filter every training mix runs (docs full of rare tokens score low).
    Cross-engine determinism: each token's ln(count) is rounded to INTEGER
    micro-nats FIRST, then summed as exact BIGINT — so the aggregate is
    summation-order-proof (a raw double sum of logs would vary in the last
    ulp with partitioning). Plan: explode -> (doc,tok) tf agg -> tok-keyed
    corpus counts joined back -> per-doc agg; all partial-aggregated. The
    tok join is zipf-skewed at 100 TB — AQE skew-join splits the hot
    tokens; the freq side is vocabulary-sized, NOT broadcastable at web
    scale (hundreds of millions of distinct tokens), so it stays a shuffle
    join on purpose."""
    from veri_spark.functions.text import tokens as toks_fn

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(toks_fn("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    freq = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("c"))
    micro = F.floor(1000000 * F.log(F.col("c").cast("double")) + 0.5).cast("bigint")
    return (
        tf.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_toks"),
            F.sum(F.col("tf") * micro).cast("bigint").alias("sum_micro_log"),
        )
    )



@register(
    "vocab_coverage",
    """
    WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    top AS (SELECT tok FROM freq ORDER BY c DESC, tok ASC LIMIT 50)
    SELECT source, COUNT(*)::BIGINT AS n_tokens,
           SUM(CASE WHEN tok IN (SELECT tok FROM top) THEN 1 ELSE 0 END)::BIGINT
             AS covered,
           ROUND(SUM(CASE WHEN tok IN (SELECT tok FROM top) THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS coverage
    FROM toks GROUP BY source
    """,
)
def vocab_coverage(spark, sf_dir):
    """Vocabulary coverage per source: what fraction of a shard's token
    occurrences a fixed top-50 global vocabulary explains — the tokenizer
    /vocab-pruning diagnostic (OOV mass per source). Plan: token frequency
    is one partial-aggregated groupBy; the top-50 vocab is a bounded top-k
    BROADCAST back; coverage is then a single map-side-flagged pass over
    the token stream with one groupBy(source). The vocabulary never
    shuffles the corpus — at 100 TB the token stream is scanned twice
    (freq + coverage), both passes map-combined."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    top = topk(freq, "c", 50, higher_is_better=True, tie_cols=["tok"]).select(
        "tok", F.lit(1).alias("__hit")
    )
    return (
        toks.join(F.broadcast(top), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("covered"),
            F.round(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coverage"),
        )
    )



@register(
    "length_bucket_sample",
    """
    WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    b AS (SELECT doc_id, n_tokens, n_tokens // 10 AS bucket,
                 row_number() OVER (PARTITION BY n_tokens // 10
                                    ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
          FROM t)
    SELECT bucket::BIGINT AS bucket, doc_id, n_tokens::BIGINT AS n_tokens
    FROM b WHERE rn <= 3
    """,
)
def length_bucket_sample(spark, sf_dir):
    """Curriculum / length-stratified sampling: bucket documents by token
    count (width 10) and keep 3 per bucket, chosen DETERMINISTICALLY by
    md5(doc_id) order — a reproducible stratified sample with no RNG state.
    The rank<=3 filter compiles to WindowGroupLimit: each task keeps at
    most 3 rows per bucket BEFORE the shuffle, so even with few buckets
    (skewed window partitions) only n_partitions x 3 rows ever move."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    ).withColumn("bucket", (F.col("n_tokens") / 10).cast("int"))
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )



@register(
    "bigram_lm_scores",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws)),
                    i -> ws[i] || ' ' || ws[i+1])) AS bg
      FROM w
    ),
    train AS (SELECT bg, COUNT(*)::BIGINT AS c FROM big
              WHERE doc_id % 10 != 0 GROUP BY bg),
    ev AS (SELECT doc_id, bg FROM big WHERE doc_id % 10 = 0)
    SELECT ev.doc_id, COUNT(*)::BIGINT AS n_bigrams,
           SUM(FLOOR(1000000 * ln(COALESCE(train.c, 0) + 1) + 0.5)::BIGINT)::BIGINT
             AS sum_micro_log
    FROM ev LEFT JOIN train USING (bg)
    GROUP BY ev.doc_id
    """,
)
def bigram_lm_scores(spark, sf_dir):
    """Bigram language-model quality proxy with a train/eval split
    (companion of `unigram_logprob_scores`, which scores every doc against
    whole-corpus unigram counts — this entry holds out doc_id % 10 = 0,
    trains bigram counts on the rest, and scores ONLY the held-out docs,
    add-one smoothed so unseen bigrams contribute ln(1) = 0). Integer
    micro-nat rounding BEFORE the sum keeps the aggregate
    summation-order-proof across engines. Plan: one explode produces the
    bigram stream, split by a pushed-down modulus filter; the train side is
    a partial-aggregated count; the eval join is bigram-keyed — zipf-skewed
    at 100 TB (AQE skew split), and the count side is vocabulary-squared
    scale so it is deliberately NOT broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    big = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        ).alias("bg"),
    )
    train = (
        big.filter(F.col("doc_id") % 10 != 0)
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ev = big.filter(F.col("doc_id") % 10 == 0)
    micro = F.floor(
        1000000 * F.log(F.coalesce(F.col("c"), F.lit(0)).cast("double") + 1) + 0.5
    ).cast("bigint")
    return (
        ev.join(train, "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(micro).cast("bigint").alias("sum_micro_log"),
        )
    )



@register(
    "lang_confusion_matrix",
    f"""
    SELECT lang,
           CASE WHEN len(list_filter(ws, w -> w IN ({EN_STOPWORDS_SQL})))::DOUBLE
                     / len(ws) >= 0.04
                THEN 'en' ELSE 'other' END AS guess_lang,
           COUNT(*)::BIGINT AS n_docs
    FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)
    GROUP BY 1, 2
    """,
)
def lang_confusion_matrix(spark, sf_dir):
    """Label-vs-classifier confusion matrix: the recorded ``lang`` column
    crossed with the stopword language-ID guess (`lang_id_heuristic`'s
    prediction) — the cross-lingual-contamination audit you run before
    trusting EITHER signal to route documents. One partial-aggregated
    groupBy over a pure-expression classifier; integer counts so the
    oracle compare is rounding-free."""
    from veri_spark.functions.text import en_stopword_ratio

    docs = load_table(spark, sf_dir, "documents")
    ratio = en_stopword_ratio("text")
    return (
        docs.select(
            "lang",
            F.when(ratio >= 0.04, "en").otherwise("other").alias("guess_lang"),
        )
        .groupBy("lang", "guess_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )



@register(
    "quality_percentile_gate",
    f"""
    WITH q AS (
      SELECT doc_id, source,
             LEAST(1.0, len(ws) / 64.0) * (len(list_distinct(ws))::DOUBLE / len(ws))
               AS quality
      FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents)
    ),
    r AS (SELECT doc_id, source,
                 percent_rank() OVER (PARTITION BY source
                                      ORDER BY quality ASC, doc_id ASC) AS pr
          FROM q)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN pr >= 0.25 THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM r GROUP BY source
    """,
)
def quality_percentile_gate(spark, sf_dir):
    """Rank-based quality gate: keep each source's top 75% by quality
    score — a PERCENTILE cutoff instead of a fixed threshold, so every
    shard contributes the same fraction regardless of its score
    distribution (fixed thresholds starve low-scoring-but-useful shards).
    percent_rank with a deterministic doc_id tie-break is identical across
    engines — no float-threshold boundary risk. Window partitions by
    source, so at 100 TB each shard ranks independently in parallel."""
    from veri_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id", "source", quality_score("text").alias("quality"))
    w = Window.partitionBy("source").orderBy(
        F.col("quality").asc(), F.col("doc_id").asc()
    )
    r = q.withColumn("pr", F.percent_rank().over(w))
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("pr") >= 0.25, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )



@register(
    "tokenizer_fertility",
    f"""
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           SUM(len(ws))::BIGINT AS n_tokens,
           ROUND(SUM(length(text))::DOUBLE / SUM(len(ws)), 6) AS chars_per_token
    FROM (SELECT lang, text, string_split(text, ' ') AS ws FROM documents)
    GROUP BY lang
    """,
)
def tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language: characters consumed per produced
    token — the compression-rate table that decides whether a tokenizer
    (here the whitespace baseline) under-serves a language (high
    chars/token = more fragments per word at train time). Ratio of two
    exact integer sums, rounded once — summation-order-proof. One
    partial-aggregated groupBy."""
    from veri_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.length("text").alias("nc"), F.size(tokens("text")).alias("nt"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("nc").cast("double") / F.sum("nt"), 6
            ).alias("chars_per_token"),
        )
    )



@register(
    "bigram_pmi_top",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         tok AS (SELECT unnest(ws) AS t FROM w),
         uni AS (SELECT t, COUNT(*)::BIGINT AS c FROM tok GROUP BY t),
         nt AS (SELECT COUNT(*)::BIGINT AS n FROM tok),
         big AS (SELECT unnest(list_transform(range(1, len(ws)),
                        i -> ws[i] || ' ' || ws[i+1])) AS bg
                 FROM w),
         bc AS (SELECT bg, COUNT(*)::BIGINT AS cab FROM big GROUP BY bg),
         nb AS (SELECT COUNT(*)::BIGINT AS m FROM big),
         scored AS (
           SELECT string_split(bc.bg, ' ')[1] AS a,
                  string_split(bc.bg, ' ')[2] AS b, bc.cab,
                  FLOOR(1000000 * ln(bc.cab::DOUBLE * nt.n * nt.n
                        / (nb.m::DOUBLE * ua.c * ub.c)) + 0.5)::BIGINT
                    AS pmi_micro
           FROM bc
           JOIN uni ua ON string_split(bc.bg, ' ')[1] = ua.t
           JOIN uni ub ON string_split(bc.bg, ' ')[2] = ub.t, nt, nb
           WHERE bc.cab >= 5)
    SELECT a, b, cab AS n_pair, pmi_micro
    FROM scored
    ORDER BY pmi_micro DESC, a ASC, b ASC LIMIT 20
    """,
)
def bigram_pmi_top(spark, sf_dir):
    """Top-20 word pairs by pointwise mutual information — the collocation
    detector (named entities, idioms, boilerplate phrases) every corpus
    analysis runs. PMI = ln(P(ab) / (P(a)P(b))) with P(ab) over the bigram
    stream and P(a) over the token stream; integer micro-nat rounding
    BEFORE the ranking makes the order-by key exact across engines. Plan:
    one explode yields both streams; unigram counts join back onto bigram
    counts keyed on word — vocabulary-sized, so at 100 TB the unigram side
    broadcasts (vocab << corpus) and only bigram counting shuffles. The
    cab >= 5 floor drops the hapax-pair noise PMI is notorious for."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    w = w.persist()
    tok = w.select(F.explode("ws").alias("t"))
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    nt = tok.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    big = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        ).alias("bg")
    )
    bc = big.groupBy("bg").agg(F.count(F.lit(1)).cast("bigint").alias("cab"))
    nb = big.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    parts = F.split(F.col("bg"), " ")
    scored = (
        bc.filter(F.col("cab") >= 5)
        .select(parts.getItem(0).alias("a"), parts.getItem(1).alias("b"), "cab")
        .join(F.broadcast(uni.withColumnRenamed("t", "a").withColumnRenamed("c", "ca")), "a")
        .join(F.broadcast(uni.withColumnRenamed("t", "b").withColumnRenamed("c", "cb")), "b")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
        .select(
            "a", "b", F.col("cab").alias("n_pair"),
            F.floor(
                1000000
                * F.log(
                    F.col("cab").cast("double") * F.col("n") * F.col("n")
                    / (F.col("m").cast("double") * F.col("ca") * F.col("cb"))
                )
                + 0.5
            ).cast("bigint").alias("pmi_micro"),
        )
    )
    return (
        scored.orderBy(
            F.col("pmi_micro").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(20)
    )



@register(
    "hapax_ratio_by_source",
    """
    WITH tc AS (SELECT source, t, COUNT(*)::BIGINT AS c
                FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                      FROM documents)
                GROUP BY source, t)
    SELECT source,
           SUM(c)::BIGINT AS n_tokens,
           COUNT(*)::BIGINT AS n_distinct,
           SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
           ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS hapax_share
    FROM tc GROUP BY source
    """,
)
def hapax_ratio_by_source(spark, sf_dir):
    """Per-shard hapax legomena ratio: the share of a source's vocabulary
    seen exactly once — high hapax share flags OCR noise, random-string
    spam, or genuinely diverse text; near-zero flags templated/duplicated
    content. Two stacked partial-aggregated groupBys: (source, token)
    counts, then per-source rollup of counts-of-counts — the shuffle
    carries one row per distinct (shard, term), never the token stream."""
    from veri_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select("source", F.explode(tokens("text")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return tc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        hapax.cast("bigint").alias("n_hapax"),
        F.round(hapax.cast("double") / F.count(F.lit(1)), 6).alias("hapax_share"),
    )



@register(
    "doc_chunk_stats",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         c AS (SELECT doc_id,
                      unnest(list_transform(range(0, (len(ws)-1)//24 + 1),
                             i -> {'chunk_idx': i,
                                   'chunk': ws[i*24+1 : i*24+32]})) AS u
               FROM w)
    SELECT doc_id, u.chunk_idx AS chunk_idx,
           len(u.chunk)::BIGINT AS n_tokens,
           md5(array_to_string(u.chunk, ' ')) AS chunk_fp
    FROM c
    """,
)
def doc_chunk_stats(spark, sf_dir):
    """Sliding-window document chunking: 32-token chunks at stride 24
    (8-token overlap) — the segmentation step that turns raw documents
    into training sequences with context continuity across boundaries.
    Chunk starts are 0,24,48,... while they land inside the document, so
    a doc with n tokens yields floor((n-1)/24)+1 chunks, the tail chunk
    short. Per-chunk fingerprints enable chunk-grain dedup downstream.
    Map-only: sequence+explode inside the row, no shuffle at all — the
    100 TB plan is embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    c = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(floor((size(ws)-1)/24) AS INT)),"
                " i -> struct(i AS chunk_idx,"
                "             slice(ws, i*24 + 1, 32) AS chunk))"
            )
        ).alias("u"),
    )
    return c.select(
        "doc_id",
        F.col("u.chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size("u.chunk").cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("u.chunk"))).alias("chunk_fp"),
    )



@register(
    "zipf_slope",
    """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
         c AS (SELECT t, COUNT(*)::BIGINT AS c FROM tok GROUP BY t),
         r AS (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS rnk
               FROM c),
         top AS (SELECT * FROM r WHERE rnk <= 100)
    SELECT COUNT(*)::BIGINT AS n_terms,
           ROUND(regr_slope(ln(c::DOUBLE), ln(rnk::DOUBLE)), 6) AS slope,
           ROUND(regr_intercept(ln(c::DOUBLE), ln(rnk::DOUBLE)), 6)
             AS intercept
    FROM top
    """,
)
def zipf_slope(spark, sf_dir):
    """Zipf's-law fit: OLS slope of log-frequency on log-rank over the
    top 100 terms. Natural text sits near slope -1; templated or
    machine-generated corpora deviate sharply, so the slope is a one-
    number corpus-health check. The ranking window is GLOBAL but runs on
    the vocabulary aggregate, not the corpus — vocab << corpus at any
    scale, and only the top 100 rows feed the regression. Deterministic
    rank tie-break on the term string."""
    from veri_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("t").asc())
    top = c.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 100)
    lc = F.log(F.col("c").cast("double"))
    lr = F.log(F.col("rnk").cast("double"))
    return top.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(F.regr_slope(lc, lr), 6).alias("slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("intercept"),
    )



@register(
    "tfidf_doc_similarity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf
           FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
    nd AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM documents),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln((SELECT n FROM nd) / df.df) AS wt
      FROM tf JOIN df USING (term)
      WHERE df.df <= 0.5 * (SELECT n FROM nd)),
    nrm AS (SELECT doc_id, sqrt(SUM(wt * wt)) AS nn FROM w GROUP BY doc_id),
    pp AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.wt * b.wt) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    sim AS (
      SELECT pp.doc_a, pp.doc_b,
             pp.dot / (na.nn * nb.nn) AS cos
      FROM pp JOIN nrm na ON na.doc_id = pp.doc_a
              JOIN nrm nb ON nb.doc_id = pp.doc_b)
    SELECT doc_a, doc_b, ROUND(cos, 6) AS cosine
    FROM sim
    ORDER BY cosine DESC, doc_a ASC, doc_b ASC LIMIT 15
    """,
)
def tfidf_doc_similarity(spark, sf_dir):
    """Sparse lexical document similarity: TF-IDF weighted cosine via a
    TERM-level self-join — the bag-of-words complement of the embedding
    near-dup path (no vectors needed). Ubiquitous terms (df > 50% of
    docs) are dropped BEFORE the pair join: they contribute negligible
    IDF weight but quadratic join fan-out — the same stop-shingle
    discipline as the Jaccard dedup cap. Partial products aggregate
    per (doc_a, doc_b) in one shuffle; norms broadcast. The dot is a sum
    of products accumulated per term — order-insensitive at the 6dp
    rounding grain."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").cast("double").alias("n"))
    w = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") <= 0.5 * F.col("n"))
        .select(
            "doc_id", "term", (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("wt")
        )
        # three consumers (norms + both pair sides): persist so the
        # tokenize->tf->idf chain runs once, not three times
        .persist()
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nn"))
    pp = (
        w.select(F.col("doc_id").alias("doc_a"), "term", F.col("wt").alias("wa"))
        .join(
            w.select(F.col("doc_id").alias("doc_b"), "term", F.col("wt").alias("wb")),
            "term",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    sim = (
        pp.join(
            F.broadcast(nrm.select(F.col("doc_id").alias("doc_a"), F.col("nn").alias("na"))),
            "doc_a",
        )
        .join(
            F.broadcast(nrm.select(F.col("doc_id").alias("doc_b"), F.col("nn").alias("nb"))),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
    )
    return sim.orderBy(
        F.col("cosine").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(15)



@register(
    "length_ntile_stats",
    """
    WITH t AS (
      SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_toks
      FROM documents),
    b AS (SELECT source, n_toks,
                 ntile(10) OVER (PARTITION BY source
                                 ORDER BY n_toks ASC, doc_id ASC) AS decile
          FROM t)
    SELECT source, decile::BIGINT AS decile,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_toks)::BIGINT AS tokens,
           ROUND(AVG(n_toks), 6) AS mean_toks
    FROM b GROUP BY source, decile
    ORDER BY source ASC, decile ASC
    """,
)
def length_ntile_stats(spark, sf_dir):
    """Equal-mass length curriculum bins: token-count deciles PER SOURCE
    (ntile over the per-source length ordering) with doc and token mass
    per bin — the table a curriculum schedule (short->long) or a packing
    planner reads. The ntile sorts within each source shard only (one
    exchange on source); a GLOBAL ntile would be a total sort and is
    exactly what this query avoids at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
    )
    w = Window.partitionBy("source").orderBy(F.col("n_toks").asc(), F.col("doc_id").asc())
    b = t.select("source", "n_toks", F.ntile(10).over(w).alias("decile"))
    return (
        b.groupBy("source", F.col("decile").cast("bigint").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("tokens"),
            F.round(F.avg("n_toks"), 6).alias("mean_toks"),
        )
        .orderBy(F.col("source").asc(), F.col("decile").asc())
    )



# ---------------------------------------------------------------------------
# Round-4 batch 3: corpus novelty, association-rule lift, changepoint scan
# ---------------------------------------------------------------------------

@register(
    "trigram_novelty",
    """
    WITH g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS tri
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
    first_seen AS (SELECT tri, MIN(doc_id) AS first_doc FROM g GROUP BY tri),
    per_doc AS (
      SELECT g.doc_id,
             COUNT(*)::BIGINT AS n_tri,
             SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)::BIGINT
               AS n_novel
      FROM g JOIN first_seen f ON g.tri = f.tri
      GROUP BY g.doc_id)
    SELECT doc_id, n_tri, n_novel,
           ROUND(n_novel::DOUBLE / n_tri, 6) AS novelty
    FROM per_doc
    ORDER BY novelty ASC, doc_id ASC LIMIT 25
    """,
)
def trigram_novelty(spark, sf_dir):
    """Corpus-diversity contribution: per document, the fraction of its
    DISTINCT word trigrams whose first occurrence (by ingestion order =
    doc_id) is in that document — the marginal-novelty signal dedup-aware
    acquisition pipelines rank new crawls by; the 25 LEAST novel docs
    shown are rehash candidates. One shingle explode shared by both sides,
    a trigram-grain groupBy for first-occurrence, and a join back on the
    trigram — shuffle keys are 3-gram strings, partial-aggregated; no
    quadratic pair join anywhere."""
    from veri_spark.operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    g = doc_shingles(docs, k=3, parallelism=16).select(
        "doc_id", F.col("shingle").alias("tri")
    )
    first_seen = g.groupBy("tri").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        g.join(first_seen, "tri")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tri"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("bigint").alias("n_novel"),
        )
    )
    return (
        per_doc.select(
            "doc_id", "n_tri", "n_novel",
            F.round(F.col("n_novel").cast("double") / F.col("n_tri"), 6).alias("novelty"),
        )
        .orderBy(F.col("novelty").asc(), F.col("doc_id").asc())
        .limit(25)
    )



# ---------------------------------------------------------------------------
# Round-4 batch 4: weighted quantiles, leakage-safe splits, hard-example
# mining, session conversion
# ---------------------------------------------------------------------------

@register(
    "weighted_length_quantiles",
    """
    WITH t AS (
      SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_toks
      FROM documents),
    c AS (
      SELECT source, doc_id, n_toks,
             SUM(n_toks) OVER (PARTITION BY source
                               ORDER BY n_toks ASC, doc_id ASC) AS cum,
             SUM(n_toks) OVER (PARTITION BY source) AS tot
      FROM t)
    SELECT source,
           MIN(CASE WHEN cum >= 0.5 * tot THEN n_toks END)::BIGINT AS wp50,
           MIN(CASE WHEN cum >= 0.9 * tot THEN n_toks END)::BIGINT AS wp90,
           MAX(tot)::BIGINT AS total_tokens
    FROM c GROUP BY source
    """,
)
def weighted_length_quantiles(spark, sf_dir):
    """TOKEN-MASS-weighted length quantiles per source: the doc length at
    which 50% / 90% of the source's tokens sit in docs that long or
    shorter — the packing/curriculum planner's quantity (the unweighted
    doc-count quantiles in `events_value_quantiles`-style queries answer a
    different question: half the DOCS vs half the TOKENS). One window
    partition per source (cumulative sum rides a single exchange); the
    final min-over-flagged rows is a partial-combined aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_toks")
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy(F.col("n_toks").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("source")
    c = t.select(
        "source", "n_toks",
        F.sum("n_toks").over(wcum).alias("cum"),
        F.sum("n_toks").over(wtot).alias("tot"),
    )
    return c.groupBy("source").agg(
        F.min(F.when(F.col("cum") >= 0.5 * F.col("tot"), F.col("n_toks"))).cast("bigint").alias("wp50"),
        F.min(F.when(F.col("cum") >= 0.9 * F.col("tot"), F.col("n_toks"))).cast("bigint").alias("wp90"),
        F.max("tot").cast("bigint").alias("total_tokens"),
    )



# ---------------------------------------------------------------------------
# Round-4 batch 5: BM25 retrieval, multimodal byte dedup, clickstream paths
# ---------------------------------------------------------------------------
