"""Named query registry: every implemented operator from SURVEY.md section 2
as a (PySpark program, DuckDB oracle SQL) pair.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/aliases match the oracle exactly (the external harness sorts
columns by name and hash-compares values). Float outputs are rounded in BOTH
programs — to 6 decimals for unit-scale values, 2 for money sums — so the
cross-engine comparison is stable; every LIMIT has a deterministic tie-break.

The KNN queries use ``vec_id = 0``'s embedding as the canonical query vector
(mirroring the reference's golden test, which queries with row 0's own
embedding — data/data_test.go:110-135).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from veri_spark.functions import vector as V
from veri_spark.operators import search as S
from veri_spark.operators import stats as ST
from veri_spark.operators.topk import dedup_keep_best, topk, topk_per_group
from veri_spark.sources.catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} — the second "
                "registration would silently shadow the first (last-wins)"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _query_vector(spark: SparkSession, sf_dir: str, vid: int = 0) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == vid).select("embedding").first()
    return [float(x) for x in row[0]]


# SQL fragment helpers (DuckDB dialect). Vectors are cast to DOUBLE[] so the
# oracle computes in the same precision as the Spark expressions.
_Q0 = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"


def _dd_l1(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, least(len({a}), len({b})) + 1),"
        f" i -> abs({a}[i]::DOUBLE - {b}[i]::DOUBLE)))"
    )


# ---------------------------------------------------------------------------
# KNN core (reference K1, K3, K4 — data/search.go:347-377, data/util.go)
# ---------------------------------------------------------------------------

def _knn(spark, sf_dir, score_func, hib=None, k=10):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    cfg = S.SearchConfig(score_func=score_func, higher_is_better=hib, limit=k)
    out = S.search(emb, q, cfg, vector_col="embedding", id_cols=["vec_id"])
    return out.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "knn_euclidean",
    f"""
    SELECT vec_id, ROUND(list_distance(embedding::DOUBLE[], {_Q0}), 6) AS score
    FROM embeddings ORDER BY score ASC, vec_id ASC LIMIT 10
    """,
)
def knn_euclidean(spark, sf_dir):
    """K1+K3+K4: brute-force euclidean top-k (VectorDistance, data/util.go:39-43)."""
    return _knn(spark, sf_dir, "VectorDistance")


@register(
    "knn_cosine",
    f"""
    SELECT vec_id,
           ROUND(LEAST(GREATEST(list_cosine_similarity(embedding::DOUBLE[], {_Q0}), -1.0), 1.0), 6) AS score
    FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def knn_cosine(spark, sf_dir):
    """K4: CosineSimilarity top-k (data/util.go:61-96; clamped to [-1,1])."""
    return _knn(spark, sf_dir, "CosineSimilarity")


@register(
    "knn_l1",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    s AS (SELECT e.vec_id, {_dd_l1('e.embedding', 'q.qe')} AS d FROM embeddings e, q)
    SELECT vec_id, ROUND(d, 6) AS score
    FROM s ORDER BY score ASC, vec_id ASC LIMIT 10
    """,
)
def knn_l1(spark, sf_dir):
    """K4: QuickVectorDistance = L1 (data/util.go:28-36)."""
    return _knn(spark, sf_dir, "QuickVectorDistance")


@register(
    "knn_dot",
    f"""
    SELECT vec_id, ROUND(list_inner_product(embedding::DOUBLE[], {_Q0}), 6) AS score
    FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def knn_dot(spark, sf_dir):
    """K4: VectorMultiplication = dot product, higher is better (data/util.go:46-53)."""
    return _knn(spark, sf_dir, "VectorMultiplication")


@register(
    "knn_angular",
    f"""
    SELECT vec_id,
           ROUND(1.0 - acos(LEAST(GREATEST(list_cosine_similarity(embedding::DOUBLE[], {_Q0}), -1.0), 1.0)) / pi(), 6) AS score
    FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def knn_angular(spark, sf_dir):
    """K4: AngularDistance = 1 - acos(cos)/pi (data/util.go:56-58)."""
    return _knn(spark, sf_dir, "AngularDistance")


@register(
    "knn_multi_query",
    """
    WITH s AS (
      SELECT q.vec_id AS query_id, e.vec_id,
             LEAST(GREATEST(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), -1.0), 1.0) AS sc
      FROM embeddings e
      CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2)) q
    ), r AS (
      SELECT query_id, vec_id, sc,
             row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, vec_id ASC) AS rn
      FROM s
    )
    SELECT query_id, vec_id, ROUND(sc, 6) AS score FROM r WHERE rn <= 5
    """,
)
def knn_multi_query(spark, sf_dir):
    """K7: multi-query fan-out (data/search.go:254-298) as a broadcast join
    of the query set against the corpus + per-query top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id").isin(0, 1, 2))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector"))
    )
    cfg = S.SearchConfig(score_func="CosineSimilarity", limit=5)
    out = S.multi_search(
        emb, queries, cfg, vector_col="embedding", id_cols=["vec_id"]
    )
    return out.select("query_id", "vec_id", F.round("score", 6).alias("score"))


@register(
    "knn_grouped_topk",
    f"""
    WITH s AS (
      SELECT label, vec_id,
             LEAST(GREATEST(list_cosine_similarity(embedding::DOUBLE[], {_Q0}), -1.0), 1.0) AS sc
      FROM embeddings
    ), r AS (
      SELECT label, vec_id, sc,
             row_number() OVER (PARTITION BY label ORDER BY sc DESC, vec_id ASC) AS rnk
      FROM s
    )
    SELECT label, vec_id, ROUND(sc, 6) AS score, rnk FROM r WHERE rnk <= 3
    """,
)
def knn_grouped_topk(spark, sf_dir):
    """K9: per-group top-k (group_limit, data/aggregator.go:105-117)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    cfg = S.SearchConfig(score_func="CosineSimilarity")
    scored = S.score_corpus(emb, q, cfg, vector_col="embedding")
    out = topk_per_group(
        scored, ["label"], "score", 3, higher_is_better=True,
        tie_cols=["vec_id"], rank_col="rnk",
    )
    return out.select("label", "vec_id", F.round("score", 6).alias("score"), "rnk")


@register(
    "knn_group_scored",
    f"""
    WITH s AS (
      SELECT label, vec_id, list_distance(embedding::DOUBLE[], {_Q0}) AS sc
      FROM embeddings
    ), r AS (
      SELECT label, vec_id, sc,
             row_number() OVER (PARTITION BY label ORDER BY sc ASC, vec_id ASC) AS rn
      FROM s
    ), l AS (SELECT * FROM r WHERE rn <= 3)
    SELECT label, arg_min(vec_id, rn) AS vec_id,
           ROUND(SUM(sc) / (COUNT(*) * COUNT(*)), 6) AS group_score,
           COUNT(*) AS group_size
    FROM l GROUP BY label
    ORDER BY group_score ASC, label ASC LIMIT 5
    """,
)
def knn_group_scored(spark, sf_dir):
    """K10+K11: group reduce — representative = best row, group score =
    sum/len^2 for lower-is-better (data/aggregator.go:155-180)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    cfg = S.SearchConfig(score_func="VectorDistance", group_limit=3, result_limit=5)
    scored = S.score_corpus(emb, q, cfg, vector_col="embedding")
    out = S.group_reduce(scored, cfg, group_col="label", id_cols=["vec_id"])
    return out.select(
        "label", "vec_id", F.round("group_score", 6).alias("group_score"), "group_size"
    )


@register(
    "knn_context_rescore",
    """
    WITH q0 AS (SELECT embedding::DOUBLE[] e FROM embeddings WHERE vec_id = 0),
         c1 AS (SELECT embedding::DOUBLE[] e FROM embeddings WHERE vec_id = 1),
         c2 AS (SELECT embedding::DOUBLE[] e FROM embeddings WHERE vec_id = 2)
    SELECT vec_id,
           ROUND(LEAST(list_distance(embedding::DOUBLE[], (SELECT e FROM q0)),
                       list_distance(embedding::DOUBLE[], (SELECT e FROM c1)),
                       list_distance(embedding::DOUBLE[], (SELECT e FROM c2))), 6) AS score
    FROM embeddings ORDER BY score ASC, vec_id ASC LIMIT 10
    """,
)
def knn_context_rescore(spark, sf_dir):
    """K12: context re-scoring — score becomes the best of the original and
    each context distance (data/aggregator.go:56-76)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    c1 = _query_vector(spark, sf_dir, 1)
    c2 = _query_vector(spark, sf_dir, 2)
    cfg = S.SearchConfig(score_func="VectorDistance", limit=10)
    out = S.aggregated_search(
        emb, q, cfg, context_vectors=[c1, c2], vector_col="embedding",
        key_cols=["vec_id"],
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "knn_dedup_best",
    f"""
    WITH q5 AS (SELECT embedding::DOUBLE[] e FROM embeddings WHERE vec_id = 5),
    u AS (
      SELECT vec_id, list_distance(embedding::DOUBLE[], {_Q0}) AS sc FROM embeddings
      UNION ALL
      SELECT vec_id, list_distance(embedding::DOUBLE[], (SELECT e FROM q5)) AS sc FROM embeddings
    )
    SELECT vec_id, ROUND(MIN(sc), 6) AS score
    FROM u GROUP BY vec_id ORDER BY score ASC, vec_id ASC LIMIT 10
    """,
)
def knn_dedup_best(spark, sf_dir):
    """K8: merge results from two searches, dedup on key keeping the best
    score (data/aggregator.go:118-134)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q0 = _query_vector(spark, sf_dir, 0)
    q5 = _query_vector(spark, sf_dir, 5)
    cfg = S.SearchConfig(score_func="VectorDistance")
    merged = S.score_corpus(emb, q0, cfg, vector_col="embedding").unionByName(
        S.score_corpus(emb, q5, cfg, vector_col="embedding")
    )
    best = dedup_keep_best(merged, ["vec_id"], "score", higher_is_better=False)
    out = topk(best, "score", 10, higher_is_better=False, tie_cols=["vec_id"])
    return out.select("vec_id", F.round("score", 6).alias("score"))


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


# ---------------------------------------------------------------------------
# Statistics (reference A1-A4 — DataInfo, data/newsync.go:137-167)
# ---------------------------------------------------------------------------

@register(
    "data_info_centroid",
    """
    SELECT pos - 1 AS pos, ROUND(AVG(v), 6) AS avg_val
    FROM (SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding)::DOUBLE AS v
          FROM embeddings)
    GROUP BY pos ORDER BY pos
    """,
)
def data_info_centroid(spark, sf_dir):
    """A2: centroid = elementwise mean of the vector column (data/util.go:15-26)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ST.centroid_df(emb, "embedding").select(
        "pos", F.round("avg_val", 6).alias("avg_val")
    )


_DD_CENTROID_DIST = """
    c AS (SELECT pos, AVG(v) AS av
          FROM (SELECT generate_subscripts(embedding, 1) AS pos,
                       unnest(embedding)::DOUBLE AS v FROM embeddings)
          GROUP BY pos),
    x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                 unnest(embedding)::DOUBLE AS v FROM embeddings),
    d AS (SELECT x.vec_id, sqrt(SUM((x.v - c.av) * (x.v - c.av))) AS dist
          FROM x JOIN c USING (pos) GROUP BY x.vec_id)
"""


@register(
    "data_info_summary",
    f"""
    WITH {_DD_CENTROID_DIST}
    SELECT COUNT(*)::BIGINT AS n, ROUND(MAX(dist), 6) AS max_dist FROM d
    """,
)
def data_info_summary(spark, sf_dir):
    """A1+A3: row count and exact max distance from centroid (two-pass;
    the reference approximates with the previous pass's centroid)."""
    emb = load_table(spark, sf_dir, "embeddings")
    center = ST.centroid(emb, "embedding")
    dists = ST.with_centroid_distance(emb, center, "embedding")
    return dists.agg(
        F.count(F.lit(1)).alias("n"), F.round(F.max("dist"), 6).alias("max_dist")
    )


@register(
    "dist_histogram",
    f"""
    WITH {_DD_CENTROID_DIST},
    m AS (SELECT MAX(dist) AS maxd, COUNT(*) AS total FROM d)
    SELECT LEAST(GREATEST(CAST(FLOOR(d.dist / m.maxd * 64) AS INT), 0), 63) AS bucket,
           COUNT(*)::BIGINT AS cnt,
           ROUND(COUNT(*) / ANY_VALUE(m.total), 6) AS freq
    FROM d, m
    GROUP BY bucket ORDER BY bucket
    """,
)
def dist_histogram(spark, sf_dir):
    """A4: 64-bin histogram of distance-to-centroid, frequencies normalized
    by N (data/newsync.go:158-167)."""
    emb = load_table(spark, sf_dir, "embeddings")
    center = ST.centroid(emb, "embedding")
    dists = ST.with_centroid_distance(emb, center, "embedding")
    max_dist = dists.agg(F.max("dist")).collect()[0][0]
    hist = ST.histogram_df(dists, max_dist)
    return hist.select("bucket", "cnt", F.round("freq", 6).alias("freq"))


# ---------------------------------------------------------------------------
# Relational surface (native Spark ops over the TPC-H-ish tables; the
# reference has no SQL — these demonstrate the engine's general analytics
# capabilities per SURVEY.md section 2.5)
# ---------------------------------------------------------------------------

@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: scan-heavy grouped aggregation with
    full partial-aggregation (map-side combine) before the 4-group shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "tpch_q3_top_revenue",
    """
    SELECT l.l_orderkey AS o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey
    ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
)
def tpch_q3_top_revenue(spark, sf_dir):
    """TPC-H Q3-style join + grouped agg + top-k. Only the customer dim is
    broadcast (genuinely small); the orders-filtered build side is
    fact-derived (~20% of orders), so its join with lineitem is left to
    AQE — at sf0.01 AQE converts it to broadcast at runtime, at 100x it
    stays a shuffle join instead of OOMing on a forced multi-GB broadcast."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    bld_orders = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("o_orderkey").alias("bld_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(bld_orders, F.col("l_orderkey") == F.col("bld_orderkey"))
    agg = joined.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    return topk(agg, "revenue", 10, higher_is_better=True, tie_cols=["o_orderkey"])


@register(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rnk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
)
def top_orders_per_customer(spark, sf_dir):
    """Per-group top-k on a relational table (same WindowGroupLimit plan as
    the KNN grouped collector)."""
    o = load_table(spark, sf_dir, "orders")
    out = topk_per_group(
        o, ["o_custkey"], "o_totalprice", 3, higher_is_better=True,
        tie_cols=["o_orderkey"], rank_col="rnk",
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rnk"
    )


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


@register(
    "upsert_latest_version",
    """
    SELECT user_id, event_id, event_type, ROUND(value, 6) AS value
    FROM (SELECT user_id, event_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def upsert_latest_version(spark, sf_dir):
    """S1/S2 upsert semantics: latest version per key wins
    (data/newsync.go:43-59) — row_number over (key ORDER BY version DESC)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 6).alias("value"))
    )


@register(
    "ttl_expiry_filter",
    """
    SELECT event_type, COUNT(*)::BIGINT AS n_live
    FROM events
    WHERE epoch_us(ts) + value * 86400 * 1000000
          > epoch_us(TIMESTAMP '2024-02-15 00:00:00')
    GROUP BY event_type
    """,
)
def ttl_expiry_filter(spark, sf_dir):
    """F3/ST2: TTL predicate — expire_at = ts + value days; keep live rows
    (data/newsync.go:78-80). Pure epoch arithmetic, pushed to the scan."""
    ev = load_table(spark, sf_dir, "events")
    # double arithmetic on both engines (a bigint cast would truncate in
    # Spark but round in DuckDB)
    expire_us = F.unix_micros(F.col("ts").cast("timestamp")) + (
        F.col("value") * 86400 * 1000000
    )
    cutoff = F.unix_micros(F.expr("TIMESTAMP '2024-02-15 00:00:00'"))
    return (
        ev.filter(expire_us > cutoff)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_live"))
    )


@register(
    "delete_anti_join",
    """
    SELECT event_type, COUNT(*)::BIGINT AS n_remaining
    FROM events WHERE user_id NOT IN (1, 2, 3)
    GROUP BY event_type
    """,
)
def delete_anti_join(spark, sf_dir):
    """S3: delete-by-key as a broadcast anti-join (data/delete.go:8-10)."""
    ev = load_table(spark, sf_dir, "events")
    keys = ev.sparkSession.createDataFrame([(1,), (2,), (3,)], ["user_id"])
    remaining = ev.join(F.broadcast(keys), "user_id", "left_anti")
    return remaining.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_remaining"))


# ---------------------------------------------------------------------------
# Text analysis (north-star extensions over the documents table)
# ---------------------------------------------------------------------------

# Shared DuckDB fragments mirroring functions/text.py exactly.
_DD_TOKS = "(SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)"
_DD_SHINGLES = """
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    )
"""


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
           ROUND(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
                 / len(ws), 6) AS en_ratio,
           CASE WHEN len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
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


# ---------------------------------------------------------------------------
# Deduplication suite (exact / jaccard / MinHash LSH / SimHash / embedding)
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_summary",
    """
    WITH per AS (SELECT md5(lower(trim(text))) AS fp, COUNT(*) AS n
                 FROM documents GROUP BY fp)
    SELECT SUM(n)::BIGINT AS n_docs,
           COUNT(*)::BIGINT AS n_distinct_text,
           (SUM(n) - COUNT(*))::BIGINT AS n_dup_docs
    FROM per
    """,
)
def dedup_exact_summary(spark, sf_dir):
    """Exact dedup: hash-groupBy duplicate accounting."""
    from veri_spark.operators.dedup import exact_dedup_summary

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_summary(docs, "text")


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_DD_SHINGLES},
    capped AS (SELECT s.doc_id, s.shingle FROM sh s
               JOIN (SELECT shingle FROM sh
                     GROUP BY shingle HAVING COUNT(DISTINCT doc_id) <= 64) keep
                 ON s.shingle = keep.shingle),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
               FROM capped a JOIN capped b
                 ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b,
           ROUND(c / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    ORDER BY jaccard DESC, doc_a ASC, doc_b ASC LIMIT 20
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup: 3-word shingle self-join, top pairs.

    Stop shingles (document frequency > 64) are dropped before the
    self-join (cap_stop_shingles) so no join bucket is quadratic in the
    corpus; jaccard is exact over the capped shingle universe."""
    from veri_spark.operators.dedup import doc_shingles, jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        doc_shingles(docs, parallelism=16), max_doc_freq=64
    )
    out = topk(
        pairs, "jaccard", 20, higher_is_better=True, tie_cols=["doc_a", "doc_b"]
    )
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _minhash_seed_values() -> str:
    """VALUES clause of the affine MinHash coefficients, mirroring
    operators.dedup.minhash_coefficients exactly."""
    from veri_spark.operators.dedup import minhash_coefficients

    return ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_coefficients(16))
    )


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_DD_SHINGLES},
    seeds(seed, a, b) AS (VALUES {_minhash_seed_values()}),
    hashed AS (SELECT doc_id,
                      CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 2147483647 AS h31
               FROM sh),
    sig AS (SELECT doc_id, seed, MIN((a * h31 + b) % 2147483647) AS h
            FROM hashed CROSS JOIN seeds GROUP BY doc_id, seed),
    bands AS (SELECT doc_id, seed // 4 AS band,
                     string_agg(h::VARCHAR, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, seed // 4)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates: 16 hashes, 4 bands of 4."""
    from veri_spark.operators.dedup import minhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(docs, num_hashes=16, bands=4, parallelism=16)


@register(
    "dedup_simhash",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t),
    b AS (SELECT doc_id, bit, SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) bits
          GROUP BY doc_id, bit)
    SELECT doc_id,
           SUM(CASE WHEN s >= 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END)::BIGINT AS simhash
    FROM b GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash (32-bit, occurrence-weighted tokens) per document."""
    from veri_spark.operators.dedup import simhash32

    docs = load_table(spark, sf_dir, "documents")
    return simhash32(docs, parallelism=16)


@register(
    "dedup_embedding_cosine",
    """
    WITH p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             LEAST(GREATEST(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), -1.0), 1.0) AS cos
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, ROUND(cos, 6) AS cos
    FROM p ORDER BY cos DESC, id_a ASC, id_b ASC LIMIT 20
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup: cosine self-join blocked on the label column."""
    from veri_spark.operators.dedup import embedding_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, block_col="label")
    out = topk(pairs, "cos", 20, higher_is_better=True, tie_cols=["id_a", "id_b"])
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


# ---------------------------------------------------------------------------
# Similarity search: IVF + hyperplane LSH (ANN scale paths; exact KNN above
# is the baseline — reference K2's Annoy index maps here, SURVEY.md 2.3)
# ---------------------------------------------------------------------------

_DD_CENTROIDS = "(SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < 8)"


@register(
    "ann_ivf_assign",
    f"""
    WITH d AS (
      SELECT e.vec_id, c.centroid_id,
             list_distance(e.embedding::DOUBLE[], c.cvec) AS dist
      FROM embeddings e CROSS JOIN {_DD_CENTROIDS} c
    ), r AS (
      SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, centroid_id ASC) AS rn
      FROM d
    )
    SELECT vec_id, centroid_id FROM r WHERE rn = 1
    """,
)
def ann_ivf_assign(spark, sf_dir):
    """IVF index build: assign every vector to its nearest centroid."""
    from veri_spark.operators.similarity import ivf_assign, take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = take_centroids(emb, 8)
    return ivf_assign(emb, cents).select("vec_id", "centroid_id")


@register(
    "ann_ivf_search",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    cd AS (SELECT c.centroid_id, list_distance(c.cvec, q.qe) AS qd
           FROM {_DD_CENTROIDS} c, q),
    probe AS (SELECT centroid_id FROM cd ORDER BY qd ASC, centroid_id ASC LIMIT 2),
    d AS (
      SELECT e.vec_id, c.centroid_id,
             list_distance(e.embedding::DOUBLE[], c.cvec) AS dist
      FROM embeddings e CROSS JOIN {_DD_CENTROIDS} c
    ), r AS (
      SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, centroid_id ASC) AS rn
      FROM d
    ), assigned AS (SELECT vec_id, centroid_id FROM r WHERE rn = 1),
    cand AS (SELECT a.vec_id FROM assigned a JOIN probe p ON a.centroid_id = p.centroid_id)
    SELECT e.vec_id, ROUND(list_distance(e.embedding::DOUBLE[], q.qe), 6) AS score
    FROM embeddings e JOIN cand USING (vec_id), q
    ORDER BY score ASC, vec_id ASC LIMIT 10
    """,
)
def ann_ivf_search(spark, sf_dir):
    """IVF probe search: 2 nearest centroid partitions, exact top-10 within."""
    from veri_spark.operators.similarity import ivf_search, take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = take_centroids(emb, 8)
    q = _query_vector(spark, sf_dir, 0)
    out = ivf_search(emb, cents, q, k=10, nprobe=2)
    return out.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "ann_lsh_signature",
    """
    WITH planes AS (
      SELECT p.plane, pos.pos,
             CASE WHEN CAST('0x' || substr(md5(p.plane::VARCHAR || '|' || pos.pos::VARCHAR), 1, 15) AS BIGINT) % 2 = 1
                  THEN 1.0 ELSE -1.0 END AS w
      FROM (SELECT unnest(range(0, 16)) AS plane) p
      CROSS JOIN (SELECT unnest(range(0, 64)) AS pos) pos
    ),
    elems AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                     unnest(embedding)::DOUBLE AS v
              FROM embeddings),
    dots AS (SELECT e.vec_id, pl.plane, SUM(e.v * pl.w) AS dot
             FROM elems e JOIN planes pl ON e.pos = pl.pos
             GROUP BY e.vec_id, pl.plane)
    SELECT vec_id,
           SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << plane) ELSE 0::BIGINT END)::BIGINT AS sig
    FROM dots GROUP BY vec_id
    """,
)
def ann_lsh_signature(spark, sf_dir):
    """Random-hyperplane LSH signatures (16 planes, angular buckets)."""
    from veri_spark.operators.similarity import lsh_hyperplane_signature

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_hyperplane_signature(emb, dim=64, planes=16)


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
    "tpch_rollup",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*)::BIGINT AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def tpch_rollup(spark, sf_dir):
    """Hierarchical totals via ROLLUP (subtotal + grand-total rows) — the
    grouping-sets surface Spark provides natively (SURVEY.md section 2.4).
    NULL rollup keys are coalesced to 'ALL' so the result is sortable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "sample_hash_deterministic",
    """
    SELECT COUNT(*)::BIGINT AS n_sampled, ROUND(SUM(value), 2) AS sum_value
    FROM events
    WHERE CAST('0x' || substr(md5(event_id::VARCHAR), 1, 15) AS BIGINT) % 10 = 0
    """,
)
def sample_hash_deterministic(spark, sf_dir):
    """Reproducible ~10% sample by key hash (the deterministic analog of
    df.sample / the reference's probabilistic peer sampling, ST4). Hash-mod
    sampling survives reruns and joins, unlike RNG sampling."""
    from veri_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    sampled = ev.filter(portable_hash64(F.col("event_id").cast("string")) % 10 == 0)
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "lineitem_running_total",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(SUM(l_extendedprice) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def lineitem_running_total(spark, sf_dir):
    """Running-total window (ordered frame) — general window-function
    surface beyond rank/top-k."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Batch 4: as-of join, sliding windows, quantiles, multi-join, prefiltered
# KNN, multimodal decode — extension surface (SURVEY.md sections 2.5/2.6)
# ---------------------------------------------------------------------------

@register(
    "knn_prefiltered",
    f"""
    SELECT vec_id,
           ROUND(LEAST(GREATEST(list_cosine_similarity(embedding::DOUBLE[], {_Q0}), -1.0), 1.0), 6) AS score
    FROM embeddings WHERE label % 2 = 0
    ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def knn_prefiltered(spark, sf_dir):
    """F1/F2-in-the-KNN-pipeline: predicate applied BEFORE scoring, so it
    pushes to the parquet scan (the reference filters candidates inside the
    search loop, data/search.go:363-374; declaratively the filter belongs
    under the scan and Catalyst puts it there)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") % 2 == 0)
    q = _query_vector(spark, sf_dir, 0)
    cfg = S.SearchConfig(score_func="CosineSimilarity", limit=10)
    out = S.search(emb, q, cfg, vector_col="embedding", id_cols=["vec_id"])
    return out.select("vec_id", F.round("score", 6).alias("score"))


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
    "tpch_q5_regional_revenue",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join with constant-size dims broadcast.
    nation x region (filtered to one region) is broadcast so the big
    fact-side joins shuffle only on their keys; the date filter sits on
    orders before any join so it reaches the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    dims = (
        load_table(spark, sf_dir, "nation")
        .join(load_table(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "multimodal_decode_features",
    """
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           CAST('0x' || substr(md5(text), 1, 2) AS INT) AS f0
    FROM documents
    """,
)
def multimodal_decode_features(spark, sf_dir):
    """Multimodal plumbing end-to-end: text bytes stand in for encoded media
    (the container has no image/audio codecs); the Arrow-batched mapInPandas
    decode (multimodal/binary.decode_features) derives the deterministic-fake
    feature, whose first component is the payload md5's first byte — which
    the oracle recomputes in SQL. The schema/batching/column-pruning shape is
    the real production path."""
    from veri_spark.multimodal.binary import decode_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("media"))
    feats = decode_features(media, id_col="doc_id", media_col="media")
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("feature", 1) * 255).cast("int").alias("f0"),
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*)::BIGINT AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + agg — every predicate reaches the
    parquet scan (PushedFilters), zero shuffles beyond the final partial/
    final agg pair."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "tpch_q18_big_spenders",
    """
    SELECT c_custkey, c_name,
           ROUND(SUM(o_totalprice), 2) AS total_spent,
           COUNT(*)::BIGINT AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    HAVING COUNT(*) >= 12
    ORDER BY total_spent DESC, c_custkey ASC LIMIT 20
    """,
)
def tpch_q18_big_spenders(spark, sf_dir):
    """TPC-H Q18 shape: join + grouped agg + HAVING + deterministic top-k.
    The agg groups on the join key, so AQE coalesces the two shuffles; the
    HAVING is a post-agg filter (cheap); the LIMIT is TakeOrdered
    (partial+final, never a full sort)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    ords = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        ords.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 12)
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "ann_lsh_bucket_join",
    """
    WITH planes AS (
      SELECT p.plane, pos.pos,
             CASE WHEN CAST('0x' || substr(md5(p.plane::VARCHAR || '|' || pos.pos::VARCHAR), 1, 15) AS BIGINT) % 2 = 1
                  THEN 1.0 ELSE -1.0 END AS w
      FROM (SELECT unnest(range(0, 16)) AS plane) p
      CROSS JOIN (SELECT unnest(range(0, 64)) AS pos) pos
    ),
    elems AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                     unnest(embedding)::DOUBLE AS v
              FROM embeddings),
    dots AS (SELECT e.vec_id, pl.plane, SUM(e.v * pl.w) AS dot
             FROM elems e JOIN planes pl ON e.pos = pl.pos
             GROUP BY e.vec_id, pl.plane),
    sigs AS (SELECT vec_id,
                    SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << plane) ELSE 0::BIGINT END)::BIGINT AS sig
             FROM dots GROUP BY vec_id),
    bands AS (SELECT vec_id, b.band, (sig >> (b.band * 8)) & 255 AS bv
              FROM sigs CROSS JOIN (SELECT unnest(range(0, 2)) AS band) b),
    pairs AS (SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
              FROM bands a JOIN bands bb
                ON a.band = bb.band AND a.bv = bb.bv AND a.vec_id < bb.vec_id)
    SELECT id_a, id_b,
           ROUND(LEAST(GREATEST(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), -1.0), 1.0), 6) AS cosine
    FROM pairs
    JOIN embeddings ea ON id_a = ea.vec_id
    JOIN embeddings eb ON id_b = eb.vec_id
    ORDER BY cosine DESC, id_a ASC, id_b ASC LIMIT 20
    """,
)
def ann_lsh_bucket_join(spark, sf_dir):
    """Similarity JOIN at scale: LSH-banded candidate generation (linear, no
    all-pairs) + exact cosine re-scoring of candidates only. The band table
    never carries vectors; embeddings re-join on the candidate ids. Two
    8-bit bands: 256 buckets per band keeps the candidate count ~30x lower
    than 4-bit bands at similar near-duplicate recall."""
    from veri_spark.operators.similarity import lsh_banded_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_banded_pairs(emb, dim=64, planes=16, bands=2)
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    scored = (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cosine", V.cosine_similarity(F.col("__va"), F.col("__vb")))
    )
    out = topk(scored, "cosine", 20, higher_is_better=True, tie_cols=["id_a", "id_b"])
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@register(
    "ann_ivf_multi_query",
    """
    WITH cents AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings ORDER BY vec_id ASC LIMIT 16
    ),
    assigned AS (
      SELECT e.vec_id, e.embedding,
             arg_min(c.cid, list_distance(e.embedding::DOUBLE[], c.cvec)) AS centroid_id
      FROM embeddings e CROSS JOIN cents c
      GROUP BY e.vec_id, e.embedding
    ),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
          FROM embeddings WHERE vec_id IN (0, 1, 2)),
    probes AS (
      SELECT query_id, cid AS centroid_id FROM (
        SELECT q.query_id, c.cid,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY list_distance(q.qvec, c.cvec) ASC, c.cid ASC) AS pr
        FROM q CROSS JOIN cents c
      ) WHERE pr <= 2
    ),
    cand AS (
      SELECT p.query_id, a.vec_id,
             list_distance(a.embedding::DOUBLE[], q.qvec) AS d
      FROM probes p
      JOIN assigned a ON a.centroid_id = p.centroid_id
      JOIN q ON q.query_id = p.query_id
    )
    SELECT query_id, vec_id, ROUND(d, 6) AS score, rnk FROM (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id ASC) AS rnk
      FROM cand
    ) WHERE rnk <= 5
    """,
)
def ann_ivf_multi_query(spark, sf_dir):
    """Batch ANN join (K7's scale path): per-query IVF probing — each query
    meets only its probed centroid buckets, never the whole corpus."""
    from veri_spark.operators.similarity import ivf_multi_search, take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    cents = take_centroids(emb, 16)
    out = ivf_multi_search(emb, cents, queries, k=5, nprobe=2)
    return out.select("query_id", "vec_id", F.round("score", 6).alias("score"), "rnk")


@register(
    "docs_prep_pipeline",
    f"""
    WITH tok AS (
      SELECT doc_id, source, text, string_split(text, ' ') AS ws FROM documents
    ),
    t AS (
      SELECT doc_id, source, text, ws,
             len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
               / len(ws) AS en_ratio,
             LEAST(1.0, len(ws) / 64.0) * (len(list_distinct(ws)) / len(ws)) AS quality,
             len(ws) AS n_tokens
      FROM tok
    ),
    kept AS (
      SELECT * FROM (
        SELECT t.*, row_number() OVER (
          PARTITION BY md5(lower(trim(text))) ORDER BY doc_id ASC) AS rn
        FROM t
      ) WHERE rn = 1 AND en_ratio >= 0.04 AND quality >= 0.2
    )
    SELECT source,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_tokens)::BIGINT AS total_tokens,
           ROUND(AVG(quality), 6) AS avg_quality
    FROM kept GROUP BY source
    """,
)
def docs_prep_pipeline(spark, sf_dir):
    """The composed training-data-prep pipeline over documents: exact dedup
    (keep lowest doc_id per normalized text) -> language gate (English
    stopword ratio) -> quality gate -> per-source corpus accounting. One
    declarative plan: the dedup window and the final groupBy are the only
    shuffles; every filter sits below them."""
    from veri_spark.functions.text import (
        en_stopword_ratio,
        quality_score as q_score,
        token_count,
    )
    from veri_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    deduped = exact_dedup(
        docs, F.md5(F.lower(F.trim(F.col("text")))), id_col="doc_id"
    )
    gated = deduped.withColumn("en_ratio", en_stopword_ratio("text")).withColumn(
        "quality", q_score("text")
    ).filter((F.col("en_ratio") >= 0.04) & (F.col("quality") >= 0.2))
    return gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


@register(
    "tpch_q14_promo_share",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
           COUNT(*)::BIGINT AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def tpch_q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate share over a fact-dim join;
    part is the build side (broadcast at small SF, shuffled hash beyond).
    Distinct from `tpch_q14_promo_effect`: different month, broadcast-hinted
    build side, and 2-dp output — that entry lets AQE choose the join and
    rounds to 6 dp; both are kept to pin both planner disciplines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "events_interarrival",
    """
    WITH d AS (
      SELECT user_id,
             epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
      FROM events
    )
    SELECT user_id,
           COUNT(gap_s)::BIGINT AS n_gaps,
           ROUND(AVG(gap_s), 6) AS avg_gap_s,
           ROUND(MAX(gap_s), 6) AS max_gap_s
    FROM d GROUP BY user_id
    """,
)
def events_interarrival(spark, sf_dir):
    """Per-user inter-arrival gaps via lag(): general ordered-window surface
    (the window and the groupBy share the user_id partitioning, so the agg
    reuses the window's shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # NTZ -> TIMESTAMP -> double seconds (session tz pinned UTC, same instant)
    sec = F.col("ts").cast("timestamp").cast("double")
    gaps = ev.withColumn("gap_s", sec - F.lag(sec).over(w))
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
        F.round(F.max("gap_s"), 6).alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# Batch 5: set ops, semi/anti joins, JSON extraction, OR predicates, CUBE
# ---------------------------------------------------------------------------

@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-04-01'
    )
    ORDER BY c_custkey ASC
    """,
)
def customers_without_orders(spark, sf_dir):
    """Anti join (the S3 delete shape used as a query): customers with no
    order in 1996Q1. left_anti shuffles only the join keys; the date filter
    pushes to the orders scan."""
    cust = load_table(spark, sf_dir, "customer")
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_custkey")
    return (
        cust.join(ords, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "repeat_buyers_both_years",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    ORDER BY o_custkey ASC
    """,
)
def repeat_buyers_both_years(spark, sf_dir):
    """Set operation (INTERSECT): customers active in both years. Spark
    plans intersect as a distinct + semi join on the hashed key."""
    ords = load_table(spark, sf_dir, "orders")
    y96 = ords.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = ords.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97).orderBy("o_custkey")


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
    "lineitem_or_predicates",
    """
    SELECT COUNT(*)::BIGINT AS n, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE (l_quantity < 5 AND l_discount > 0.08)
       OR (l_quantity > 45 AND l_returnflag = 'R')
       OR (l_tax = 0.0 AND l_linestatus = 'F')
    """,
)
def lineitem_or_predicates(spark, sf_dir):
    """Q19-style disjunctive predicate: the whole OR tree stays in the scan
    filter (no join, no shuffle before the final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("l_quantity") < 5) & (F.col("l_discount") > 0.08))
        | ((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        | ((F.col("l_tax") == 0.0) & (F.col("l_linestatus") == "F"))
    )
    return li.filter(cond).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


@register(
    "orders_cube_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*)::BIGINT AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def orders_cube_status_priority(spark, sf_dir):
    """CUBE grouping sets (all 4 combinations), NULL keys coalesced so the
    result is sortable."""
    ords = load_table(spark, sf_dir, "orders")
    return (
        ords.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
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


@register(
    "sample_stratified_by_type",
    """
    WITH h AS (
      SELECT event_type, value,
             CAST('0x' || substr(md5(event_id::VARCHAR), 1, 15) AS BIGINT) % 100 AS bucket
      FROM events
    )
    SELECT event_type, COUNT(*)::BIGINT AS n_sampled, ROUND(SUM(value), 2) AS sum_value
    FROM h
    WHERE (event_type = 'error' AND bucket < 50)
       OR (event_type <> 'error' AND bucket < 10)
    GROUP BY event_type
    """,
)
def sample_stratified_by_type(spark, sf_dir):
    """Stratified deterministic sampling (df.sampleBy's reproducible
    analog): rare strata keep a higher rate (50% errors vs 10% rest) via
    per-key hash-mod thresholds — rerun-stable and join-stable, unlike RNG
    sampling."""
    from veri_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    bucket = portable_hash64(F.col("event_id").cast("string")) % 100
    rate = F.when(F.col("event_type") == "error", F.lit(50)).otherwise(F.lit(10))
    return (
        ev.filter(bucket < rate)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
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
    "embeddings_label_centroids",
    """
    SELECT label, pos - 1 AS pos, ROUND(AVG(v), 6) AS avg_v
    FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                 unnest(embedding)::DOUBLE AS v
          FROM embeddings)
    WHERE pos <= 8
    GROUP BY label, pos
    """,
)
def embeddings_label_centroids(spark, sf_dir):
    """Per-group centroid (the reference's per-dataset Avg, data/util.go:
    15-26, generalized to groupBy): posexplode + per-(label, pos) mean in
    long format. Map-side partial agg shrinks the shuffle to
    |labels| x dim partials per task, never the vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    ).filter(F.col("pos") < 8)
    return exploded.groupBy("label", "pos").agg(
        F.round(F.avg("v"), 6).alias("avg_v")
    )


@register(
    "embedding_quantize_error",
    """
    WITH q AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             list_transform(embedding::DOUBLE[],
                            x -> LEAST(GREATEST(round(x * 127.0), -127.0), 127.0) / 127.0) AS deq
      FROM embeddings
    )
    SELECT COUNT(*)::BIGINT AS n,
           ROUND(MAX(list_max(list_transform(range(1, len(e) + 1),
                                             i -> abs(e[i] - deq[i])))), 6) AS max_abs_err,
           ROUND(AVG(list_sum(list_transform(range(1, len(e) + 1),
                                             i -> abs(e[i] - deq[i]))) / len(e)), 6) AS mean_abs_err
    FROM q
    """,
)
def embedding_quantize_error(spark, sf_dir):
    """int8 scalar quantization of the embedding column (the 4x storage /
    bandwidth lever for vector corpora at 100 TB): symmetric scale 127,
    clamp, dequantize, and report reconstruction error — all native array
    expressions, map-only until the final tiny agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    deq = F.transform(
        e,
        lambda x: F.least(F.greatest(F.round(x * 127.0), F.lit(-127.0)), F.lit(127.0))
        / 127.0,
    )
    err = F.zip_with(e, deq, lambda a, b: F.abs(a - b))
    return emb.select(
        F.array_max(err).alias("__mx"),
        (F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x) / F.size(e)).alias("__mn"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("__mx"), 6).alias("max_abs_err"),
        F.round(F.avg("__mn"), 6).alias("mean_abs_err"),
    )


@register(
    "dedup_minhash_clusters",
    f"""
    WITH RECURSIVE {_DD_SHINGLES},
    seeds(seed, a, b) AS (VALUES {_minhash_seed_values()}),
    hashed AS (SELECT doc_id,
                      CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 2147483647 AS h31
               FROM sh),
    sig AS (SELECT doc_id, seed, MIN((a * h31 + b) % 2147483647) AS h
            FROM hashed CROSS JOIN seeds GROUP BY doc_id, seed),
    bands AS (SELECT doc_id, seed // 4 AS band,
                     string_agg(h::VARCHAR, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, seed // 4),
    pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster FROM reach GROUP BY u)
    SELECT cluster AS cluster_id, COUNT(*)::BIGINT AS cluster_size
    FROM comp GROUP BY cluster
    """,
)
def dedup_minhash_clusters(spark, sf_dir):
    """Duplicate GROUPS, not just pairs: connected components over the
    MinHash-LSH candidate edges by min-label propagation (iterative, edge
    set only — the corpus is never re-joined). The oracle computes the same
    closure with a recursive CTE."""
    from veri_spark.operators.dedup import connected_components, minhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, num_hashes=16, bands=4, parallelism=16)
    comp = connected_components(pairs)
    return comp.groupBy(F.col("cluster").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )


@register(
    "tpch_q4_late_orders",
    """
    SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_late_orders(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS as a left-semi join — each order contributes
    once no matter how many late lines it has, and the semi join carries
    only the join keys through the shuffle."""
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = ords.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "customer_spend_quartiles",
    """
    WITH s AS (
      SELECT o_custkey, SUM(o_totalprice) AS spent
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, ROUND(spent, 2) AS spent,
           ntile(4) OVER (ORDER BY spent DESC, o_custkey ASC) AS quartile
    FROM s
    """,
)
def customer_spend_quartiles(spark, sf_dir):
    """NTILE bucketing: customers ranked into spend quartiles (global
    ordered window over the pre-aggregated per-customer totals — the window
    input is |customers| rows, never raw orders)."""
    ords = load_table(spark, sf_dir, "orders")
    spend = ords.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spent"))
    w = Window.orderBy(F.col("spent").desc(), F.col("o_custkey").asc())
    return spend.select(
        "o_custkey",
        F.round("spent", 2).alias("spent"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "supplier_rank_in_nation",
    """
    SELECT n_name, s_name, ROUND(s_acctbal, 2) AS acctbal,
           dense_rank() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    QUALIFY rnk <= 3
    """,
)
def supplier_rank_in_nation(spark, sf_dir):
    """dense_rank per group with a QUALIFY-style filter (top 3 suppliers by
    balance per nation; broadcast nation)."""
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("acctbal"), "rnk")
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
    "customers_above_nation_avg",
    """
    WITH nat_avg AS (
      SELECT c_nationkey,
             SUM(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE / COUNT(*) AS avg_bal
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_nationkey, COUNT(*)::BIGINT AS n_above,
           FLOOR(MAX(c.c_acctbal - a.avg_bal) * 100 + 0.5) / 100 AS max_excess
    FROM customer c JOIN nat_avg a ON c.c_nationkey = a.c_nationkey
    WHERE c.c_acctbal > a.avg_bal
    GROUP BY c.c_nationkey
    """,
)
def customers_above_nation_avg(spark, sf_dir):
    """Correlated-aggregate pattern (customers richer than their nation's
    average): de-correlated into a grouped aggregate + self-join — what
    Catalyst's subquery decorrelation produces, written directly. The tiny
    per-nation aggregate broadcasts back onto the fact side.

    Cross-engine determinism: the average is computed as an EXACT decimal
    sum divided in double (float summation order varies with partitioning,
    and Spark's round() string-reprs the double while DuckDB rounds in
    binary — at an exact .xx5 boundary they disagree), and the 2-decimal
    rounding is the floor(x*100+0.5) formulation, which is pure IEEE double
    arithmetic and therefore bit-identical in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    nat_avg = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(nat_avg), F.col("c_nationkey") == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            (
                F.floor(F.max(F.col("c_acctbal") - F.col("avg_bal")) * 100 + 0.5) / 100
            ).alias("max_excess"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 5 (round 2): TPC-H join/agg breadth — q7/q10/q13/q14/q17/q19/q22
# shapes adapted to the available columns. Money aggregates follow the
# deterministic cross-engine pattern: the per-row revenue product is exactly
# <= 4 decimal digits (2dp price x 2dp discount), so casting it to
# DECIMAL(18,4) BEFORE the sum makes the aggregate exact and summation-order-
# insensitive in both engines; final outputs are rounded on the exact
# decimal, then cast to DOUBLE so the schemas match.
# ---------------------------------------------------------------------------

_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


def _rev_dec():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate)::INT AS l_year,
           ROUND(SUM({_REV_DEC}), 2)::DOUBLE AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
       OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: revenue between two trading nations by year. Nation
    (25 rows) broadcasts onto supplier and customer; the nation-name filter
    then prunes both dims BEFORE they join the fact tables, so the big
    lineitem-orders join only carries the two nations' rows. No broadcast
    hint on supplier or customer — both scale linearly with the data
    (TPC-H: sf x 10k suppliers), so the planner/AQE must pick the strategy
    from observed sizes; only the 25-row nation table is hinted."""
    sf = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    nat = sf("nation")
    supp = (
        sf("supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .filter(F.col("supp_nation").isin("NATION_13", "NATION_19"))
    )
    cust = (
        sf("customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin("NATION_13", "NATION_19"))
    )
    li = sf("lineitem").select("l_orderkey", "l_suppkey", "l_shipdate", _rev_dec().alias("rev"))
    ords = sf("orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM({_REV_DEC}), 2)::DOUBLE AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top customers by returned-lineitem revenue in a
    quarter. The returnflag + date predicates push to the scans; the
    order-date filter prunes orders before the fact-fact join; nation
    broadcasts; final top-20 is a bounded TakeOrdered, never a global sort."""
    sf = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    ords = sf("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = sf("lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _rev_dec().alias("rev")
    )
    agg = (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sf("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sf("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
    )
    out = topk(agg, "revenue", 20, higher_is_better=True, tie_cols=["c_custkey"])
    return out.select("c_custkey", "c_name", "n_name", "revenue")


@register(
    "tpch_q13_order_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*)::BIGINT AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts (customers
    with zero orders included via the left outer join; the non-equi priority
    condition rides the join, not a post-filter). Two-level aggregate: the
    second groupBy input is |customers| rows, and the distribution itself is
    at most a few hundred rows."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ords = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(ords, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14_promo_effect",
    f"""
    SELECT FLOOR(
             100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_DEC} ELSE CAST(0 AS DECIMAL(18,4)) END)::DOUBLE
                   / SUM({_REV_DEC})::DOUBLE * 1000000 + 0.5) / 1000000 AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share for one month (companion of
    `tpch_q14_promo_share`, which broadcast-hints the build side and rounds
    to 2 dp — same TPC-H question, deliberately different planner
    discipline and rounding grain). The date filter
    prunes lineitem at the scan; part joins on the key WITHOUT a broadcast
    hint — part scales with the data (unlike nation/region) so the planner/
    AQE must pick the strategy from observed sizes. Both sums are exact
    decimals; the ratio is taken in double on the exact numerators, and the
    6-decimal rounding uses the floor(x*1e6+0.5) formulation — pure IEEE
    double arithmetic, bit-identical across engines (Spark's round() would
    HALF_UP the double's string repr while DuckDB rounds the binary
    value)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    ).select("l_partkey", _rev_dec().alias("rev"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    zero = F.lit(0).cast("decimal(18,4)")
    ratio = (
        100.0
        * F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(zero)).cast("double")
        / F.sum("rev").cast("double")
    )
    return j.agg(
        (F.floor(ratio * 1000000 + 0.5) / 1000000).alias("promo_revenue_pct")
    )


@register(
    "tpch_q17_small_quantity",
    """
    WITH pavg AS (
      SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS qty_lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE / 7.0 * 100 + 0.5) / 100 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < qty_lim
    """,
)
def tpch_q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: revenue from below-average-quantity orders of one
    brand. The correlated scalar subquery (per-part average quantity) is
    de-correlated into a grouped aggregate joined back on the part key — one
    shuffle each side, co-partitioned join. l_quantity is integer-valued so
    the double AVG is an exact-integer sum divided by a count: deterministic
    under any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_lim")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    j = (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(pavg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
    )
    yearly = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0
    return j.agg((F.floor(yearly * 100 + 0.5) / 100).alias("avg_yearly"))


@register(
    "tpch_q19_disjunctive",
    f"""
    SELECT ROUND(SUM({_REV_DEC}), 2)::DOUBLE AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-attribute predicate across both
    join sides. The per-side conjuncts that CAN prune independently do
    (Catalyst derives p_brand IN (...) and l_quantity BETWEEN 1 AND 30 as
    scan-level filters from the OR); the residual disjunction evaluates
    after the join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _rev_dec().alias("rev")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum("rev"), 2).cast("double").alias("revenue")
    )


@register(
    "tpch_q22_dormant_customers",
    """
    WITH avg_pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*)::BIGINT AS numcust,
           ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2)::DOUBLE AS totacctbal
    FROM customer, avg_pos
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def tpch_q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: rich customers with no urgent orders, by nation
    (the synthetic generator gives every customer at least one order, so
    the anti-join correlates on the priority-filtered subset to stay
    non-empty). The global scalar (average positive balance) is computed as
    an exact decimal sum and cross-joined as a literal-sized frame; NOT
    EXISTS is a left-anti join whose build side carries only o_custkey
    through the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    avg_pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    ords = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    rich = cust.crossJoin(F.broadcast(avg_pos)).filter(F.col("c_acctbal") > F.col("ab"))
    dormant = rich.join(ords, rich["c_custkey"] == ords["o_custkey"], "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum(dec), 2).cast("double").alias("totacctbal"),
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
    "dedup_simhash_hamming",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t),
    bsum AS (SELECT doc_id, bit, SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) bits
             GROUP BY doc_id, bit),
    sig AS (SELECT doc_id,
                   SUM(CASE WHEN s >= 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END)::BIGINT AS simhash
            FROM bsum GROUP BY doc_id),
    bands AS (SELECT doc_id, simhash, b, (simhash >> (b * 8)) & 255 AS v
              FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
                    a.simhash AS sa, c.simhash AS sb
             FROM bands a JOIN bands c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id)
    SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INT AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def dedup_simhash_hamming(spark, sf_dir):
    """SimHash near-dup pairs within Hamming distance 3, via byte banding
    (pigeonhole: <=3 flipped bits leave >=1 of 4 bytes intact, so the
    band join has EXACT recall — no all-pairs scan, one popcount per
    candidate; operators/dedup.simhash_hamming_pairs)."""
    from veri_spark.operators.dedup import simhash_hamming_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_hamming_pairs(docs, max_hamming=3, parallelism=16)
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "embedding_quantize_topk",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
               FROM embeddings),
    qv AS (SELECT vec_id, mx,
                  list_transform(e, x -> floor(x * (127.0 / mx) + 0.5)) AS q
           FROM v),
    q0 AS (SELECT q AS qz, mx AS mx0 FROM qv WHERE vec_id = 0),
    s AS (SELECT vec_id,
                 list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * qz[i]))
                   * (mx * mx0) / 16129.0 AS score
          FROM qv CROSS JOIN q0)
    SELECT vec_id, ROUND(score, 6) AS score
    FROM s ORDER BY score DESC, vec_id ASC LIMIT 10
    """,
)
def embedding_quantize_topk(spark, sf_dir):
    """Int8-quantized dot-product top-k: 4x smaller vectors, integer dot
    (exact), de-scaled to float space. The quantizer uses floor(x*s+0.5) —
    pure IEEE arithmetic, so Spark and the oracle quantize identically
    (operators/similarity.quantize_int8 / quantized_dot_scores)."""
    from veri_spark.operators.similarity import quantized_dot_scores

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    scored = quantized_dot_scores(emb, q)
    out = topk(scored, "score", 10, higher_is_better=True, tie_cols=["vec_id"])
    return out.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "embedding_group_centroid",
    """
    WITH ev AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    x AS (SELECT vec_id, label, i, e[i] AS v
          FROM ev CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx),
    c AS (SELECT label, i, AVG(v) AS m FROM x GROUP BY label, i),
    d AS (SELECT vec_id, x.label AS label, SQRT(SUM((v - m) * (v - m))) AS dist
          FROM x JOIN c ON x.label = c.label AND x.i = c.i
          GROUP BY vec_id, x.label)
    SELECT label, vec_id, ROUND(dist, 6) AS dist, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id ASC) AS rnk
          FROM d)
    WHERE rnk <= 3
    """,
)
def embedding_group_centroid(spark, sf_dir):
    """Per-label centroid outliers (label-noise / contamination audit): the
    3 members farthest from their group centroid. Posexplode -> per-dim
    partial-agg mean -> rejoin -> bounded per-group top-k; state is
    |labels| x dim, nothing quadratic
    (operators/similarity.group_centroid_outliers)."""
    from veri_spark.operators.similarity import group_centroid_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    out = group_centroid_outliers(emb, per_group=3)
    return out.select("label", "vec_id", F.round("dist", 6).alias("dist"), "rnk")


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


# ---------------------------------------------------------------------------
# Batch 7 (round 3): remaining TPC-H join shapes expressible on this star
# schema. The testdata has no partsupp table and lineitem carries no
# shipmode/commitdate/receiptdate, so q8/q9/q16/q20/q21 are implemented as
# faithful SHAPE adaptations: same join graph, same decorrelation problem,
# measures built from the columns that exist. Revenue stays decimal-exact
# (summation-order-insensitive), ratio rounding stays floor(x*10^k+0.5).
# ---------------------------------------------------------------------------


@register(
    "tpch_q8_market_share",
    f"""
    WITH base AS (
      SELECT year(o_orderdate)::INT AS o_year,
             {_REV_DEC} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           FLOOR(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,4)) END)::DOUBLE
                 / SUM(volume)::DOUBLE * 1000000 + 0.5) / 1000000 AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): NATION_7's share of supplier
    revenue in the ASIA customer market, by order year. Seven-table join:
    nation/region broadcast (constant-size dims); customer joins orders
    BEFORE the fact join so the region filter prunes the customer side
    early; supplier joins the fact on its key with no hint (scales with
    data, AQE decides). Share numerator/denominator are exact decimals;
    ratio rounded with the engine-portable floor formulation.

    Reference parity: TPC-H Q8 minus the part filter (no partsupp/p_type
    restriction reaches this schema's lineitem rows)."""
    sf = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    nat = sf("nation")
    asia_nations = (
        nat.join(
            F.broadcast(sf("region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cust_nk"))
    )
    cust = (
        sf("customer")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cust_nk"))
        .select("c_custkey")
    )
    ords = sf("orders").select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    supp = (
        sf("supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = sf("lineitem").select("l_orderkey", "l_suppkey", _rev_dec().alias("volume"))
    base = (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    share = (
        F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(zero)).cast("double")
        / F.sum("volume").cast("double")
    )
    return base.groupBy("o_year").agg(
        (F.floor(share * 1000000 + 0.5) / 1000000).alias("mkt_share")
    )


@register(
    "tpch_q9_profit_by_nation",
    """
    WITH p AS (
      SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    SELECT nation, o_year, ROUND(SUM(amount), 2)::DOUBLE AS sum_profit
    FROM p GROUP BY nation, o_year
    """,
)
def tpch_q9_profit_by_nation(spark, sf_dir):
    """TPC-H Q9 shape (product-line profit by supplier nation and year).
    The cost term uses p_retailprice (the schema has no partsupp, so
    ps_supplycost is modeled as half the retail price — same join graph,
    same measure structure: revenue minus quantity-scaled cost). The p_name
    filter prunes part BEFORE the fact join (semi-join push); nation
    broadcasts; part/supplier/orders join the fact on their keys with AQE
    choosing strategies. The per-row amount is cast to exact decimal before
    the sum: 2dp*2dp and 2dp*int terms stay within 4dp, so the aggregate is
    summation-order-insensitive."""
    sf = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    part = sf("part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = sf("supplier").select("s_suppkey", "s_nationkey")
    nat = sf("nation").select("n_nationkey", F.col("n_name").alias("nation"))
    ords = sf("orders").select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    li = sf("lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    base = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return base.groupBy("nation", "o_year").agg(
        F.round(F.sum(amount.alias("amount")), 2).cast("double").alias("sum_profit")
    )


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV_DEC}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 2)::DOUBLE AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier by quarterly revenue — the view + scalar-max
    subquery). Decorrelated Spark-first: the per-supplier revenue aggregate
    is computed once, its global max reduces to ONE row, and the filter is
    a broadcast join against that single-row frame — never a global
    single-partition window over all suppliers (which is the scale trap at
    sf x 10k supplier rows). Exact-decimal revenue makes 'equals max'
    well-defined; ties all surface, ordered by key."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_dec()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx")).drop("__mx")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("total_revenue"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%33%')
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape (supplier diversity per part class): distinct
    suppliers per (brand, type, size), excluding one brand and a
    name-matched supplier blocklist (the complaints NOT IN — here a
    broadcast anti-join, the scale-correct form of NOT IN when the subquery
    side is provably small). lineitem stands in for partsupp as the
    part-supplier bridge. The part predicates push to its scan and prune
    the fact join via the key join; count_distinct shuffles once on the
    group key with partial aggregation."""
    sf = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    part = sf("part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = sf("supplier").filter(F.col("s_name").like("%33%")).select("s_suppkey")
    li = sf("lineitem").select("l_partkey", "l_suppkey")
    base = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return base.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "tpch_q20_excess_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey HAVING SUM(l_quantity) > 100
    )
    ORDER BY s_suppkey
    """,
)
def tpch_q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (nested semi-join: suppliers with excess shipments
    of a part class in a year — availqty stands in as a shipped-quantity
    threshold since the schema has no partsupp). Inner block: part-name
    filter prunes part, key-joins the date-pruned fact, one grouped HAVING.
    Outer: LEFT SEMI join — supplier rows stream past the (small) qualifying
    keyset; no row multiplication, no distinct needed."""
    sf = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    part = sf("part").filter(F.col("p_name").like("small%")).select("p_partkey")
    li = sf("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    qualifying = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supp = sf("supplier").select("s_suppkey", "s_name")
    return (
        supp.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21_sole_blame",
    """
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_returnflag
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_supp_r
      FROM l GROUP BY l_orderkey
    ),
    blamed AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM l JOIN per_order USING (l_orderkey)
      WHERE l.l_returnflag = 'R' AND n_supp > 1 AND n_supp_r = 1
    )
    SELECT s_name, COUNT(*)::BIGINT AS numwait
    FROM blamed JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC LIMIT 20
    """,
)
def tpch_q21_sole_blame(spark, sf_dir):
    """TPC-H Q21 shape (suppliers solely at fault in multi-supplier
    orders): the reference's EXISTS / NOT EXISTS pair over sibling
    lineitems is DECORRELATED into one per-order aggregate — n_supp > 1
    encodes the EXISTS (another supplier participated), n_supp_r = 1
    encodes the NOT EXISTS (no OTHER supplier also failed; returnflag 'R'
    stands in for the receipt-after-commit predicate absent from this
    schema). One shuffle on l_orderkey serves the aggregate AND the
    join back — versus the reference's two correlated self-join probes.
    Final top-20 is a bounded TakeOrdered."""
    sf = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    ords = sf("orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l = (
        sf("lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    blamed = (
        l.filter(F.col("l_returnflag") == "R")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = sf("supplier").select("s_suppkey", "s_name")
    agg = (
        blamed.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    out = topk(agg, "numwait", 20, higher_is_better=True, tie_cols=["s_name"])
    return out.select("s_name", "numwait")


# ---------------------------------------------------------------------------
# Batch 8 (round 3): training-data pipeline operators — benchmark
# decontamination, sequence packing, TF-IDF salience, keyword density,
# deterministic mixture sampling, cross-source boilerplate.
# ---------------------------------------------------------------------------

_DD_SPLIT_SHINGLES = """
    ws_t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    shl AS (SELECT doc_id, list_distinct(list_transform(
              range(1, greatest(len(ws) - 1, 1)),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shs
            FROM ws_t),
    train_sh AS (SELECT DISTINCT unnest(shs) AS shingle FROM shl WHERE doc_id % 10 <> 0),
    eval_sh AS (SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS shingle
                FROM shl WHERE doc_id % 10 = 0)
"""


@register(
    "decontaminate_ngram_overlap",
    f"""
    WITH {_DD_SPLIT_SHINGLES}
    SELECT e.doc_id, e.n_sh::BIGINT AS n_sh, COUNT(*)::BIGINT AS n_shared,
           FLOOR(COUNT(*)::DOUBLE / e.n_sh * 1000000 + 0.5) / 1000000 AS overlap_ratio
    FROM eval_sh e JOIN train_sh t ON e.shingle = t.shingle
    GROUP BY e.doc_id, e.n_sh
    """,
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination (companion of `decontamination_overlap`,
    which flags the TRAIN side against a tiny broadcast benchmark set —
    opposite output grain, different split): n-gram overlap of each EVAL document
    against the TRAIN shingle universe (the standard 'did the test set leak
    into training data' check — GPT-3/PaLM-style 13-gram collision, here
    3-gram on the short synthetic docs). The corpus is split
    deterministically by doc_id % 10 (eval = 0). Plan: distinct train
    shingles (one partial-agg groupBy), eval shingles inner-join on the
    shingle value, one grouped count per eval doc — the fact side shuffles
    ON THE SHINGLE, so the 100 TB run uses the same stop-shingle cap as
    jaccard_pairs (cap_stop_shingles) to bound hot buckets; exact here for
    the oracle. Never all-pairs: eval docs join the shingle SET, not train
    docs."""
    from veri_spark.operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    evald = docs.filter(F.col("doc_id") % 10 == 0)
    train_sh = doc_shingles(train, k=3).select("shingle").distinct()
    eval_sh = doc_shingles(evald, k=3, with_size=True)
    joined = eval_sh.join(train_sh, "shingle")
    return (
        joined.groupBy("doc_id", "n_sh")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(
            "doc_id",
            F.col("n_sh").cast("bigint").alias("n_sh"),
            "n_shared",
            (F.floor(F.col("n_shared").cast("double") / F.col("n_sh") * 1000000 + 0.5)
             / 1000000).alias("overlap_ratio"),
        )
    )


@register(
    "pack_sequences",
    """
    WITH t AS (SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 COALESCE(SUM(n_tokens + 1) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t)
    SELECT doc_id, source, n_tokens, (cum_before // 1024)::BIGINT AS chunk_id
    FROM c
    """,
)
def pack_sequences(spark, sf_dir):
    """Sequence packing for training (companion of `sequence_packing`, which
    buckets by START offset at a 512 budget and reports per-bin mass —
    different assignment rule, budget, and output grain): greedy assignment of documents to
    fixed token-budget chunks (1024 tokens, +1 separator per doc) within
    each source shard, in deterministic doc_id order — the operator that
    turns a document table into packed training sequences. One window
    shuffle on the shard key; chunk_id = floor(preceding-tokens / budget).
    At 100 TB the shard key (source/file) bounds each window partition to
    one shard — no global ordering is ever materialized."""
    docs = load_table(spark, sf_dir, "documents")
    from veri_spark.functions.text import tokens as toks_fn

    t = docs.select(
        "doc_id", "source", F.size(toks_fn("text")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum(F.col("n_tokens") + 1).over(w), F.lit(0))
    )
    return c.select(
        "doc_id", "source", "n_tokens",
        F.floor(F.col("cum_before") / 1024).cast("bigint").alias("chunk_id"),
    )


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
    "mixture_weighted_sample",
    """
    WITH s AS (
      SELECT lang, doc_id,
             CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50 ELSE 20 END AS pct,
             CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 15) AS BIGINT) % 100 AS slot
      FROM documents
    )
    SELECT lang, COUNT(*)::BIGINT AS n_total,
           SUM(CASE WHEN slot < pct THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM s GROUP BY lang
    """,
)
def mixture_weighted_sample(spark, sf_dir):
    """Deterministic data-mixture sampling: per-language keep rates (en
    100%, de 50%, rest 20%) applied by portable key-hash threshold — the
    reproducible form of the temperature/weighted sampling every training
    mix uses. Hash-threshold sampling survives reruns, joins, and
    incremental reprocessing (same doc always lands the same way), unlike
    RNG sampling. Map-only until one tiny groupBy on lang."""
    from veri_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    pct = (
        F.when(F.col("lang") == "en", 100)
        .when(F.col("lang") == "de", 50)
        .otherwise(20)
    )
    slot = portable_hash64(F.col("doc_id").cast("string")) % 100
    s = docs.select("lang", pct.alias("pct"), slot.alias("slot"))
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("slot") < F.col("pct"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
    )


@register(
    "cross_source_duplicates",
    """
    SELECT fp, COUNT(DISTINCT source)::BIGINT AS n_sources, COUNT(*)::BIGINT AS n_docs
    FROM (SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp, source
          FROM documents) t
    GROUP BY fp HAVING COUNT(DISTINCT source) > 1
    """,
)
def cross_source_duplicates(spark, sf_dir):
    """Cross-source duplicated PREFIXES: 8-token-prefix fingerprints
    appearing in more than one source shard (syndicated headers /
    boilerplate intros that inflate a training mix even when per-source
    full-text dedup is clean). One groupBy on the prefix fingerprint — the
    rows that survive HAVING are by construction few."""
    from veri_spark.functions.text import tokens as toks_fn

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(toks_fn("text"), 1, 8)))
    return (
        docs.select(fp.alias("fp"), "source")
        .groupBy("fp")
        .agg(
            F.count_distinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_sources") > 1)
    )

# ---------------------------------------------------------------------------
# Round 3 additions: PQ scoring, eval-set decontamination, sequence packing
# ---------------------------------------------------------------------------

# Deterministic PQ codebooks for the oracle pair: entry c of subspace j is
# row c's j-th subvector (the same first-rows convention as _DD_CENTROIDS).
# Production PQ trains KMeans codebooks (pq_train); the scoring math being
# checked here — argmin encode + ADC lookup — is identical either way.
_PQ_M, _PQ_SUB, _PQ_K = 8, 8, 16


def _dd_subdist(a: str, b: str, j: str = "j") -> str:
    """DuckDB fragment: squared euclidean distance between the ``j``-th
    8-wide subvectors of two DOUBLE[] columns (1-based list indexing)."""
    d = f"({a}[{j}*8+t] - {b}[{j}*8+t])"
    return f"list_sum(list_transform(range(1, 9), t -> {d} * {d}))"


@register(
    "ann_pq_adc",
    f"""
    WITH cb AS (SELECT vec_id::INT AS c, embedding::DOUBLE[] AS e
                FROM embeddings WHERE vec_id < {_PQ_K}),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    subd AS (
      SELECT r.vec_id, j.j, cb.c, {_dd_subdist('r.e', 'cb.e', 'j.j')} AS d
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) r
      CROSS JOIN (SELECT unnest(range(0, {_PQ_M})) AS j) j
      CROSS JOIN cb
    ),
    enc AS (
      SELECT vec_id, j, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        FROM subd) WHERE rn = 1
    ),
    adc AS (
      SELECT enc.vec_id, SUM({_dd_subdist('q.qe', 'cb.e', 'enc.j')}) AS score
      FROM enc JOIN cb ON enc.c = cb.c CROSS JOIN q
      GROUP BY enc.vec_id
    )
    SELECT vec_id, ROUND(score, 6) AS score
    FROM adc ORDER BY score ASC, vec_id ASC LIMIT 10
    """,
)
def ann_pq_adc(spark, sf_dir):
    """Product-quantization ADC top-10 (K2's memory-scale companion — the
    reference holds full float vectors in its Annoy index per node,
    annoyindex/; PQ stores m one-byte codes instead, 32x smaller at
    d=64/m=8). Codebooks and the query LUT enter the plan as literals, so
    encode + ADC are map-only over the corpus — zero shuffles before the
    bounded top-k. Codebooks here are the first-16-rows convention so the
    DuckDB oracle can replicate them; pq_train fits real KMeans books."""
    from veri_spark.operators.similarity import pq_adc_scores, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    head = (
        emb.filter(F.col("vec_id") < _PQ_K)
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in head}
    books = [
        [by_id[c][j * _PQ_SUB : (j + 1) * _PQ_SUB] for c in range(_PQ_K)]
        for j in range(_PQ_M)
    ]
    q = _query_vector(spark, sf_dir, 0)
    scored = pq_adc_scores(pq_encode(emb, books), q, books)
    out = topk(
        scored.select("vec_id", "score"), "score", 10,
        higher_is_better=False, tie_cols=["vec_id"],
    )
    return out.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "decontamination_overlap",
    """
    WITH bench AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
      FROM (SELECT string_split(text, ' ') AS ws FROM documents WHERE doc_id < 20)
    ),
    corpus AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            WHERE doc_id >= 20)
    )
    SELECT c.doc_id, COUNT(*)::BIGINT AS n_shared
    FROM corpus c JOIN bench b ON c.shingle = b.shingle
    GROUP BY c.doc_id HAVING COUNT(*) >= 3
    """,
)
def decontamination_overlap(spark, sf_dir):
    """Eval-set decontamination (companion of `decontaminate_ngram_overlap`,
    which scores EVAL docs against the train universe — opposite output
    grain, different split): flag training docs sharing >= 3 distinct
    3-word shingles with a held-out benchmark set (docs 0-19 stand in).
    The benchmark shingle set is tiny and BROADCAST, so the corpus side is
    map-only scan -> hash-semi-probe -> one groupBy(doc_id) — at 100 TB the
    eval suites are a few MB of shingles against the whole crawl, which is
    exactly this plan. Distinct shingles per side, so n_shared is the
    shared-shingle count, not an occurrence count."""
    from veri_spark.operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    bench = (
        doc_shingles(docs.filter(F.col("doc_id") < 20), parallelism=None)
        .select("shingle")
        .distinct()
    )
    corpus = doc_shingles(
        docs.filter(F.col("doc_id") >= 20), parallelism=16
    )
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


@register(
    "sequence_packing",
    """
    WITH t AS (
      SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_toks
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_toks,
             SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_toks AS cum_before
      FROM t
    )
    SELECT source, FLOOR(cum_before / 512)::BIGINT AS bin,
           COUNT(*)::BIGINT AS n_docs, SUM(n_toks)::BIGINT AS n_tokens
    FROM c GROUP BY source, bin
    """,
)
def sequence_packing(spark, sf_dir):
    """Concat-and-chunk sequence packing (companion of `pack_sequences`,
    which assigns whole docs greedily at a 1024 budget and emits per-chunk
    rows — different assignment rule, budget, and grain): docs are laid end-to-end in
    deterministic (doc_id) order within each source shard and assigned to
    the 512-token training window where they START. Per (source, bin):
    docs packed and token mass. Packing PARTITIONS BY SOURCE — the window
    is per-shard, so at 100 TB each shard packs independently in parallel
    (a single global ORDER BY would serialize the sort); real pipelines
    pack per input shard for exactly this reason."""
    from veri_spark.functions.text import tokens as toks_fn

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id", F.size(toks_fn("text")).cast("bigint").alias("n_toks")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum_before", F.sum("n_toks").over(w) - F.col("n_toks"))
    return (
        c.select("source", F.floor(F.col("cum_before") / 512).cast("bigint").alias("bin"), "n_toks")
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").cast("bigint").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# Batch 7 (round 3): TPC-H q2/q11 shapes (adapted — no partsupp table, so
# lineitem's (l_partkey, l_suppkey) pairs serve as the supply relation),
# the stream-grade interval join run on batch frames, and two more
# training-pipeline ops (unigram LM quality proxy, dedup winner selection).
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem GROUP BY 1, 2
    ), eur AS (
      SELECT sp.partkey, sp.suppkey, sp.cost, s_name, n_name
      FROM supply sp
      JOIN supplier ON s_suppkey = sp.suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ), best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY partkey
                                   ORDER BY cost ASC, suppkey ASC) AS rn
      FROM eur
    )
    SELECT p_partkey, p_name, s_name, n_name, cost::DOUBLE AS cost
    FROM best JOIN part ON p_partkey = partkey
    WHERE rn = 1 AND p_size <= 15
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part), decorrelated: the
    correlated MIN subquery becomes a per-part window rank over the supply
    relation, rn = 1 keeps the winner (cost asc, suppkey asc — fully
    deterministic; cost is an exact DECIMAL min, no float ties). Adapted to
    this schema: lineitem's (l_partkey, l_suppkey) pairs ARE the supply
    relation (no partsupp table). Scale shape: one groupBy over lineitem
    (partial aggs), nation/region broadcast and prune supplier BEFORE the
    supply join; the window partitions by partkey — millions of independent
    partitions, no global sort. part joins last, filtered, on the already-
    thinned winners. Reference: this is the search-and-reduce shape of
    SURVEY §2 K9/K10 applied to relational data."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    supply = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("cost"))
    eur_supp = (
        supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    eur = supply.join(eur_supp, F.col("suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("partkey").orderBy(
        F.col("cost").asc(), F.col("suppkey").asc()
    )
    best = eur.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(
            part.filter(F.col("p_size") <= 15),
            F.col("p_partkey") == F.col("partkey"),
        )
        .select("p_partkey", "p_name", "s_name", "n_name",
                F.col("cost").cast("double").alias("cost"))
    )


@register(
    "tpch_q11_important_stock",
    f"""
    WITH sn AS (
      SELECT s_suppkey, n_name FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
    ), chosen AS (SELECT MIN(n_name) AS nm FROM sn),
    sup_nat AS (SELECT s_suppkey FROM sn, chosen WHERE n_name = nm),
    val AS (
      SELECT l_partkey AS partkey, SUM({_REV_DEC}) AS value
      FROM lineitem JOIN sup_nat ON s_suppkey = l_suppkey
      GROUP BY 1
    ), tot AS (SELECT SUM(value) AS total, COUNT(*) AS n, MAX(value) AS mx FROM val)
    SELECT partkey, ROUND(value, 2)::DOUBLE AS value
    FROM val, tot WHERE value::DOUBLE > total::DOUBLE / n * 1.25 OR value = mx
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose supply value within one nation exceeds
    a fraction of that nation's total. The scalar subquery (global total)
    is a one-row aggregate cross-joined back as a broadcast — Catalyst's
    own decorrelation, written directly; never a driver-side collect, so
    the plan is a single job at any scale. Value sums are exact
    DECIMAL(18,4) (summation-order-proof across engines); the threshold
    compare happens in double on both sides identically. Per-part groupBy
    carries only the one nation's lineitems (the supplier semi-join prunes
    first — nation is a broadcast).

    Two SF-invariance guards keep the smoke contract (non-empty at
    sf0.001) without changing semantics where data is dense:

    - The nation is chosen from the data (min ``n_name`` among nations
      that actually have suppliers) instead of a hard-coded literal — at
      sf0.001 only 10 of 25 nations have a supplier. Still a one-row
      broadcast aggregate, never a driver collect.
    - The ``value = mx`` disjunct emits the max-value part(s) even when
      every part falls under the 1.25x-mean threshold (possible at tiny
      SF). Where the threshold already selects rows, the max row is among
      them and the result is unchanged.

    Both mirrored exactly in the DuckDB oracle; no window, no global
    sort."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")

    sn = supp.join(
        F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey", "n_name")
    chosen = sn.agg(F.min("n_name").alias("nm"))
    sup_nat = (
        sn.crossJoin(F.broadcast(chosen))
        .filter(F.col("n_name") == F.col("nm"))
        .select("s_suppkey")
    )
    val = (
        li.join(sup_nat, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_rev_dec()).alias("value"))
    )
    tot = val.agg(
        F.sum("value").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.max("value").alias("mx"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            (
                F.col("value").cast("double")
                > F.col("total").cast("double") / F.col("n") * 1.25
            )
            | (F.col("value") == F.col("mx"))
        )
        .select(
            "partkey",
            (F.floor(F.col("value") * 100 + F.lit("0.5").cast("decimal(2,1)")) / 100)
            .cast("double").alias("value"),
        )
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
    "dedup_keep_first_by_source",
    """
    WITH fp AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
         k AS (SELECT fp, MIN(doc_id) AS keeper FROM fp GROUP BY fp)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           SUM(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM fp JOIN k USING (fp)
    GROUP BY source
    """,
)
def dedup_keep_first_by_source(spark, sf_dir):
    """Dedup WINNER SELECTION (the materialization step the summary-only
    dedup queries stop short of): exact-hash groups keep min(doc_id), and
    every shard reports how many of its docs survived. This is the shape
    that actually writes the deduped corpus at 100 TB: fingerprint groupBy
    (short md5 keys, partial aggs), keeper set joined back on the
    fingerprint, per-source counts. No full-text shuffle — only the
    32-char fingerprint and ids move."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", "source", F.md5(F.col("text")).alias("fp"))
    k = fp.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    return (
        fp.join(k, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("doc_id") == F.col("keeper"), 1).otherwise(0))
            .cast("bigint").alias("n_kept"),
        )
    )


@register(
    "ann_ivf_pq_search",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    cd AS (SELECT c.centroid_id, list_distance(c.cvec, q.qe) AS qd
           FROM {_DD_CENTROIDS} c, q),
    probe AS (SELECT centroid_id FROM cd ORDER BY qd ASC, centroid_id ASC LIMIT 2),
    d AS (
      SELECT e.vec_id, c.centroid_id,
             list_distance(e.embedding::DOUBLE[], c.cvec) AS dist
      FROM embeddings e CROSS JOIN {_DD_CENTROIDS} c
    ), r AS (
      SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, centroid_id ASC) AS rn
      FROM d
    ), assigned AS (SELECT vec_id, centroid_id FROM r WHERE rn = 1),
    cand AS (SELECT a.vec_id FROM assigned a JOIN probe p ON a.centroid_id = p.centroid_id),
    cb AS (SELECT vec_id::INT AS c, embedding::DOUBLE[] AS e
           FROM embeddings WHERE vec_id < {_PQ_K}),
    subd AS (
      SELECT r.vec_id, j.j, cb.c, {_dd_subdist('r.e', 'cb.e', 'j.j')} AS d
      FROM (SELECT e.vec_id, e.embedding::DOUBLE[] AS e
            FROM embeddings e JOIN cand USING (vec_id)) r
      CROSS JOIN (SELECT unnest(range(0, {_PQ_M})) AS j) j
      CROSS JOIN cb
    ),
    enc AS (
      SELECT vec_id, j, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        FROM subd) WHERE rn = 1
    ),
    adc AS (
      SELECT enc.vec_id, SUM({_dd_subdist('q.qe', 'cb.e', 'enc.j')}) AS score
      FROM enc JOIN cb ON enc.c = cb.c CROSS JOIN q
      GROUP BY enc.vec_id
    )
    SELECT vec_id, ROUND(score, 6) AS score
    FROM adc ORDER BY score ASC, vec_id ASC LIMIT 10
    """,
)
def ann_ivf_pq_search(spark, sf_dir):
    """End-to-end IVF-PQ (round-3 verdict item 6): `ann_ivf_search` proves
    the probe, `ann_pq_adc` proves ADC — this entry exercises their
    COMPOSITION through `similarity.ivf_pq_search`, the plan the store's
    `refresh_index(pq_m=...)` persists. Probe prunes to the 2 nearest of 8
    centroid buckets (partition pruning on a persisted index), then ADC
    scores only the survivors on m-byte codes. Codebooks are the
    first-16-rows convention so the DuckDB oracle replicates them
    (`pq_train` fits real KMeans books in production); the oracle mirrors
    probe pruning and argmin encoding exactly."""
    from veri_spark.operators.similarity import (
        ivf_assign, ivf_pq_search, take_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = take_centroids(emb, 8)
    assigned = ivf_assign(emb, cents)
    head = (
        emb.filter(F.col("vec_id") < _PQ_K)
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in head}
    books = [
        [by_id[c][j * _PQ_SUB : (j + 1) * _PQ_SUB] for c in range(_PQ_K)]
        for j in range(_PQ_M)
    ]
    q = _query_vector(spark, sf_dir, 0)
    out = ivf_pq_search(assigned, cents, q, books, n=10, nprobe=2)
    return out.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "tpch_q12_priority_counts",
    """
    SELECT l_returnflag,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_counts(spark, sf_dir):
    """TPC-H Q12 shape (shipping-mode priority counts; this schema's
    l_returnflag stands in for l_shipmode): fact-fact join with conditional
    counts. The shipdate year filter pushes to the lineitem scan; the join
    shuffles both sides on the order key ONCE (orders scales with lineitem
    so no broadcast hint — AQE picks the strategy); the conditional sums are
    partial-aggregated map-side to 3 groups."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "embedding_margin",
    """
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe, label AS ql
               FROM embeddings WHERE vec_id < 10)
    SELECT q_id,
           ROUND(MIN(CASE WHEN e.label = q.ql
                 THEN list_distance(e.embedding::DOUBLE[], q.qe) END), 6) AS same_dist,
           ROUND(MIN(CASE WHEN e.label != q.ql
                 THEN list_distance(e.embedding::DOUBLE[], q.qe) END), 6) AS diff_dist,
           ROUND(MIN(CASE WHEN e.label != q.ql
                 THEN list_distance(e.embedding::DOUBLE[], q.qe) END)
               - MIN(CASE WHEN e.label = q.ql
                 THEN list_distance(e.embedding::DOUBLE[], q.qe) END), 6) AS margin
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id != q.q_id
    GROUP BY q_id
    """,
)
def embedding_margin(spark, sf_dir):
    """Metric-learning margin audit (contrastive-pair mining diagnostic):
    for each of 10 probe vectors, the distance to its nearest SAME-label
    neighbor vs its nearest DIFFERENT-label neighbor, and the margin
    between them — the per-anchor quantity triplet mining thresholds on.
    Plan: the 10 probes are a broadcast, distances are map-side over one
    corpus scan, and the conditional-min groupBy reduces to 10 rows —
    at 100 TB this is one pass, no corpus self-join."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("ql"),
    )
    d = V.euclidean_distance(F.col("embedding"), F.col("qe"))
    same = F.min(F.when(F.col("label") == F.col("ql"), d))
    diff = F.min(F.when(F.col("label") != F.col("ql"), d))
    return (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id")
        .agg(
            F.round(same, 6).alias("same_dist"),
            F.round(diff, 6).alias("diff_dist"),
            F.round(diff - same, 6).alias("margin"),
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
    "docs_norm_dedup_rate",
    """
    WITH n AS (
      SELECT source,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_fp
      FROM documents)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT norm_fp)::BIGINT AS n_distinct,
           ROUND(1.0 - COUNT(DISTINCT norm_fp)::DOUBLE / COUNT(*), 6) AS dup_rate
    FROM n GROUP BY source
    """,
)
def docs_norm_dedup_rate(spark, sf_dir):
    """Normalization-aware dedup rate per source: lowercase, strip
    non-alphanumerics, collapse whitespace, then fingerprint — the measure
    of how much exact-dedup is hiding behind trivial formatting variation
    (the first pass of every crawl-cleaning pipeline). The distinct-count
    runs on md5 fingerprints, NOT the normalized text: only 32-char hashes
    reach the distinct shuffle, the documents never leave their scan."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    n = docs.select("source", F.md5(norm).alias("norm_fp"))
    return n.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("norm_fp")).alias("n_distinct"),
        F.round(
            1.0 - F.count_distinct(F.col("norm_fp")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


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
    "heavy_hitters_share",
    """
    WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
         tot AS (SELECT SUM(n) AS t FROM c)
    SELECT user_id, n::BIGINT AS n_events, ROUND(n::DOUBLE / t, 6) AS share
    FROM c, tot ORDER BY n DESC, user_id ASC LIMIT 10
    """,
)
def heavy_hitters_share(spark, sf_dir):
    """Skew diagnostic: the 10 heaviest keys and their share of all events
    — the query you run BEFORE sizing a salt factor or enabling AQE skew
    join on a key. Partial-aggregated groupBy, one-row broadcast total,
    bounded top-k; the full key histogram never leaves the executors."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("t"))
    scored = c.crossJoin(F.broadcast(tot)).select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
    )
    return topk(scored, "n_events", 10, higher_is_better=True, tie_cols=["user_id"])


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
    "mixture_reweight_factors",
    """
    WITH c AS (SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang),
         tot AS (SELECT SUM(n_docs) AS t, COUNT(*) AS k FROM c)
    SELECT lang, n_docs,
           ROUND(n_docs::DOUBLE / t, 6) AS actual_share,
           ROUND((1.0 / k) / (n_docs::DOUBLE / t), 6) AS weight
    FROM c, tot
    """,
)
def mixture_reweight_factors(spark, sf_dir):
    """Data-mixture reweighting: per-language sampling weight that moves
    the corpus to a UNIFORM target mix (weight = target_share /
    actual_share — the multiplier a sampler applies per shard when
    composing a training mixture). One partial-aggregated groupBy plus a
    one-row broadcast total; the weights table is dimension-sized and
    feeds a broadcast join in the sampling pass (`mixture_weighted_sample`
    is that consumer shape)."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tot = c.agg(F.sum("n_docs").alias("t"), F.count(F.lit(1)).alias("k"))
    share = F.col("n_docs").cast("double") / F.col("t")
    return c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(share, 6).alias("actual_share"),
        F.round((1.0 / F.col("k")) / share, 6).alias("weight"),
    )


@register(
    "dedup_containment",
    f"""
    WITH {_DD_SHINGLES},
    capped AS (SELECT s.doc_id, s.shingle FROM sh s
               JOIN (SELECT shingle FROM sh
                     GROUP BY shingle HAVING COUNT(DISTINCT doc_id) <= 64) keep
                 ON s.shingle = keep.shingle),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
               FROM capped a JOIN capped b
                 ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b,
           ROUND(c / LEAST(sa.n, sb.n), 6) AS containment
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    ORDER BY containment DESC, doc_a ASC, doc_b ASC LIMIT 20
    """,
)
def dedup_containment(spark, sf_dir):
    """Containment near-dup (companion of `dedup_ngram_jaccard`, same
    capped-shingle candidate machinery but a DIFFERENT measure: shared /
    min(|A|, |B|) instead of shared / |A union B| — containment catches a
    short document EMBEDDED in a longer one, the quote/boilerplate-
    inclusion case Jaccard's union denominator dilutes away). Stop
    shingles (doc freq > 64) are dropped before the self-join so no
    bucket is quadratic; sizes ride the join keys."""
    from veri_spark.operators.dedup import doc_shingles, jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        doc_shingles(docs, parallelism=16), max_doc_freq=64, measure="containment"
    )
    out = topk(
        pairs, "containment", 20, higher_is_better=True,
        tie_cols=["doc_a", "doc_b"],
    )
    return out.select(
        "doc_a", "doc_b", F.round("containment", 6).alias("containment")
    )


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
    "orders_grouping_sets",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(o_totalprice), 2)::DOUBLE AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
)
def orders_grouping_sets(spark, sf_dir):
    """GROUPING SETS (the general form CUBE/ROLLUP specialize —
    `tpch_rollup` and `orders_cube_status_priority` cover those): four
    explicit aggregation grains in ONE pass. Catalyst plans this as a
    single Expand + hash aggregate — one shuffle total, where a UNION ALL
    of four groupBys would scan the fact table four times. NULL grain
    markers are COALESCEd to 'ALL' in both engines so the hash compare is
    label-stable."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS total_price
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "dedup_edit_distance",
    """
    WITH b AS (SELECT doc_id, n_chars // 20 AS blk, substr(text, 1, 60) AS pfx
               FROM documents)
    SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
           levenshtein(a.pfx, bb.pfx)::BIGINT AS edit_dist
    FROM b a JOIN b bb ON a.blk = bb.blk AND a.doc_id < bb.doc_id
    WHERE levenshtein(a.pfx, bb.pfx) <= 20
    ORDER BY edit_dist ASC, doc_a ASC, doc_b ASC LIMIT 20
    """,
)
def dedup_edit_distance(spark, sf_dir):
    """Edit-distance near-dup with length blocking (the fuzzy-match tier
    between exact-hash and shingle dedup: catches small in-place edits
    that shift every shingle). Candidate pairs come ONLY from same
    length-block buckets — the O(n^2) Levenshtein never sees the cross
    product, just length-compatible docs (a pair differing by > block
    width in length cannot be a near-dup anyway) — and runs on 60-char
    prefixes, so per-pair cost is bounded. At 100 TB add a second
    blocking key (e.g. the first shingle's minhash band) to cap bucket
    sizes; the join shape is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        (F.col("n_chars") / 20).cast("bigint").alias("blk"),
        F.substring("text", 1, 60).alias("pfx"),
    )
    a = b.select(
        F.col("doc_id").alias("doc_a"), "blk", F.col("pfx").alias("pfx_a")
    )
    bb = b.select(
        F.col("doc_id").alias("doc_b"), "blk", F.col("pfx").alias("pfx_b")
    )
    pairs = (
        a.join(bb, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pfx_a", "pfx_b").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 20)
    )
    return topk(
        pairs, "edit_dist", 20, higher_is_better=False, tie_cols=["doc_a", "doc_b"]
    )


@register(
    "minhash_estimate_error",
    f"""
    WITH {_DD_SHINGLES},
    seeds(seed, a, b) AS (VALUES {_minhash_seed_values()}),
    hashed AS (SELECT doc_id, shingle,
                      CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 2147483647 AS h31
               FROM sh),
    sig AS (SELECT doc_id, seed, MIN((a * h31 + b) % 2147483647) AS h
            FROM hashed CROSS JOIN seeds GROUP BY doc_id, seed),
    bands AS (SELECT doc_id, seed // 4 AS band,
                     string_agg(h::VARCHAR, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, seed // 4),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
    agree AS (SELECT c.doc_a, c.doc_b,
                     SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS ag
              FROM cand c
              JOIN sig sa ON sa.doc_id = c.doc_a
              JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
              GROUP BY c.doc_a, c.doc_b),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i
              FROM cand c
              JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
              GROUP BY c.doc_a, c.doc_b)
    SELECT g.doc_a, g.doc_b,
           ROUND(g.ag / 16.0, 6) AS est_sim,
           ROUND(COALESCE(i.i, 0)::DOUBLE
                 / (sa.n + sb.n - COALESCE(i.i, 0)), 6) AS jaccard,
           ROUND(ABS(g.ag / 16.0 - COALESCE(i.i, 0)::DOUBLE
                 / (sa.n + sb.n - COALESCE(i.i, 0))), 6) AS abs_err
    FROM agree g
    LEFT JOIN inter i ON g.doc_a = i.doc_a AND g.doc_b = i.doc_b
    JOIN sizes sa ON g.doc_a = sa.doc_id
    JOIN sizes sb ON g.doc_b = sb.doc_id
    """,
)
def minhash_estimate_error(spark, sf_dir):
    """Estimator-quality audit: for every LSH candidate pair, the MinHash
    Jaccard ESTIMATE (fraction of the 16 signature positions that agree)
    next to the EXACT shingle Jaccard, and the absolute error — the
    calibration table you consult before trusting a band/row configuration
    on a new corpus. Exact Jaccard is computed ONLY for candidate pairs
    (the shingle self-join is semi-pruned to candidate docs first), so the
    audit stays linear-plus-candidates at 100 TB — never the full
    quadratic truth. The shingle -> signature chain is built ONCE and
    shared by the candidate join, the agreement compare, and the exact
    intersection (persisted across the three consumers; an end-to-end
    `minhash_candidate_pairs` call here would re-derive shingles and
    signatures from scratch per consumer)."""
    from veri_spark.operators.dedup import (
        doc_shingles, minhash_band_keys, minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, parallelism=16).persist()
    sigs = minhash_signatures(sh, num_hashes=16).persist()
    bands = minhash_band_keys(sigs, num_hashes=16, bands=4)
    cands = (
        bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key"),
            ["band", "band_key"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(16)],
    )
    agree = None
    for i in range(16):
        t = F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    est = cands.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b", (agree / F.lit(16.0)).alias("est")
    )

    cd = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(F.broadcast(cd), "doc_id", "left_semi")
    inter = (
        sh_c.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(sh_c.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .join(cands, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    jac = (
        F.coalesce(F.col("i"), F.lit(0)).cast("double")
        / (F.col("na") + F.col("nb") - F.coalesce(F.col("i"), F.lit(0)))
    )
    return (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))),
            "doc_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round("est", 6).alias("est_sim"),
            F.round(jac, 6).alias("jaccard"),
            F.round(F.abs(F.col("est") - jac), 6).alias("abs_err"),
        )
    )


@register(
    "skewed_agg_salted",
    """
    SELECT event_type, COUNT(*)::BIGINT AS n,
           ROUND(SUM(value), 2)::DOUBLE AS sum_value
    FROM events GROUP BY event_type
    """,
)
def skewed_agg_salted(spark, sf_dir):
    """The salted two-stage aggregation (operators/skew.py) as an
    oracle-paired query: COUNT and SUM over a 5-hot-key group column run
    as groupBy(key, salt) partials then groupBy(key) finals — the oracle
    is the PLAIN aggregate, proving the decomposition is exact. With only
    a handful of giant groups, the plain plan funnels each group through
    one reducer; the salt spreads stage one over 16, and stage two only
    touches groups x 16 partial rows. (SUM rounds once at the end —
    partial sums stay unrounded, so the decomposition is exact in IEEE
    terms too: doubles are summed in a fixed two-level tree either way...
    rounding to 2 dp absorbs the reassociation.)"""
    from veri_spark.operators.skew import salted_two_stage

    ev = load_table(spark, sf_dir, "events")
    out = salted_two_stage(
        ev,
        group_cols=["event_type"],
        partial_aggs=[
            F.count(F.lit(1)).alias("pc"),
            F.sum("value").alias("ps"),
        ],
        final_aggs=[
            F.sum("pc").cast("bigint").alias("n"),
            F.round(F.sum("ps"), 2).cast("double").alias("sum_value"),
        ],
        entropy_cols=["event_id"],
        buckets=16,
    )
    return out


@register(
    "knn_radius_search",
    f"""
    SELECT vec_id,
           ROUND(list_distance(embedding::DOUBLE[], {_Q0}), 6) AS score
    FROM embeddings
    WHERE list_distance(embedding::DOUBLE[], {_Q0}) < 1.5
    ORDER BY score ASC, vec_id ASC
    """,
)
def knn_radius_search(spark, sf_dir):
    """Radius (range) search: every vector within euclidean distance 1.5
    of the query — the fixed-threshold companion of top-k (dedup sweeps
    and density estimates want 'all within r', not 'best k'). Map-only
    like the KNN scans: scan -> score expression -> pushable filter; no
    shuffle at all until the output sort, and the sort is bounded by the
    radius selectivity. At 100 TB pair it with the IVF probe (triangle
    inequality prunes any bucket whose centroid is farther than
    r + bucket radius)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    d = V.euclidean_distance(F.col("embedding"), q)
    return (
        emb.select("vec_id", F.round(d, 6).alias("score"), d.alias("__d"))
        .filter(F.col("__d") < 1.5)
        .drop("__d")
        .orderBy(F.col("score").asc(), F.col("vec_id").asc())
    )


@register(
    "ann_ivf_recall_audit",
    f"""
    WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
                FROM embeddings WHERE vec_id IN (0, 1, 2)),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_distance(e.embedding::DOUBLE[], q.qvec) ASC,
                          e.vec_id ASC) AS rn
        FROM embeddings e CROSS JOIN qs q
      ) WHERE rn <= 10
    ),
    cents AS {_DD_CENTROIDS},
    probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT q.query_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_distance(c.cvec, q.qvec) ASC, c.centroid_id ASC) AS pr
        FROM qs q CROSS JOIN cents c
      ) WHERE pr <= 2
    ),
    assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.embedding::DOUBLE[], c.cvec) ASC,
                          c.centroid_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    approx AS (
      SELECT query_id, vec_id FROM (
        SELECT p.query_id, e.vec_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY list_distance(e.embedding::DOUBLE[], q.qvec) ASC,
                          e.vec_id ASC) AS rn
        FROM probes p
        JOIN assigned a ON a.centroid_id = p.centroid_id
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN qs q ON q.query_id = p.query_id
      ) WHERE rn <= 10
    )
    SELECT x.query_id,
           SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
           ROUND(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 6)
             AS recall_at_10
    FROM exact x
    LEFT JOIN approx ap ON ap.query_id = x.query_id AND ap.vec_id = x.vec_id
    GROUP BY x.query_id
    """,
)
def ann_ivf_recall_audit(spark, sf_dir):
    """ANN estimator audit (the IVF companion of
    `minhash_estimate_error`): recall@10 of the IVF probe path against
    exact brute force, per query — the number you check before widening
    or narrowing nprobe on a new corpus. Exact side is the map-only
    brute-force top-10; approximate side probes 2 of 8 centroid buckets;
    recall is a left join + conditional count, all on the 30-row top-k
    frames. At 100 TB run it on a sampled query log — the audit cost is
    queries x corpus-scan, the same as serving those queries twice."""
    from veri_spark.operators.similarity import (
        ivf_assign, ivf_probe_candidates, take_centroids,
    )
    from veri_spark.operators.topk import topk_per_group

    emb = load_table(spark, sf_dir, "embeddings")
    cents = take_centroids(emb, 8)
    assigned = ivf_assign(emb, cents)
    qs = [(vid, _query_vector(spark, sf_dir, vid)) for vid in (0, 1, 2)]

    def top10(df, vid, qvec):
        d = V.euclidean_distance(F.col("embedding"), qvec)
        return df.select(
            F.lit(vid).alias("query_id"), "vec_id", d.alias("score")
        ).transform(
            lambda x: topk_per_group(
                x, ["query_id"], "score", 10,
                higher_is_better=False, tie_cols=["vec_id"], rank_col="rn",
            )
        ).select("query_id", "vec_id")

    exact = None
    approx = None
    for vid, qvec in qs:
        e = top10(emb, vid, qvec)
        a = top10(ivf_probe_candidates(assigned, cents, qvec, nprobe=2), vid, qvec)
        exact = e if exact is None else exact.unionByName(e)
        approx = a if approx is None else approx.unionByName(a)

    hit = F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
    return (
        exact.join(
            approx.withColumn("__hit", F.lit(1)), ["query_id", "vec_id"], "left"
        )
        .groupBy("query_id")
        .agg(
            hit.cast("bigint").alias("n_hit"),
            F.round(hit / F.lit(10.0), 6).alias("recall_at_10"),
        )
    )


@register(
    "lang_confusion_matrix",
    f"""
    SELECT lang,
           CASE WHEN len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
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
    "dedup_cluster_sizes",
    """
    WITH fp AS (SELECT md5(text) AS f, COUNT(*)::BIGINT AS sz
                FROM documents GROUP BY md5(text))
    SELECT sz AS cluster_size, COUNT(*)::BIGINT AS n_clusters,
           (sz * COUNT(*))::BIGINT AS n_docs
    FROM fp GROUP BY sz
    """,
)
def dedup_cluster_sizes(spark, sf_dir):
    """Duplicate-cluster size histogram: how many exact-duplicate clusters
    exist at each size and how much document mass they hold — the table
    that tells you whether dedup will reclaim 1% or 40% of the corpus
    BEFORE you pay for the rewrite. Two partial-aggregated groupBys, the
    second over at most |distinct sizes| rows; only md5 fingerprints ever
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.groupBy(F.md5(F.col("text")).alias("f")).agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return fp.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("sz") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
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
    "distinct_estimate_kmv",
    """
    WITH fp AS (SELECT DISTINCT md5(text) AS f FROM documents),
         h AS (SELECT CAST('0x' || substr(md5(f), 1, 15) AS BIGINT) AS hv
               FROM fp),
         k AS (SELECT hv FROM h ORDER BY hv LIMIT 128),
         a AS (SELECT COUNT(*) AS kk, MAX(hv) AS mx FROM k),
         ex AS (SELECT COUNT(*) AS n_exact FROM fp)
    SELECT ex.n_exact::BIGINT AS n_exact,
           ROUND(CASE WHEN a.kk < 128 THEN a.kk::DOUBLE
                 ELSE (a.kk - 1) * 1152921504606846976.0 / a.mx END, 2)
             AS kmv_estimate,
           ROUND(ABS(CASE WHEN a.kk < 128 THEN a.kk::DOUBLE
                     ELSE (a.kk - 1) * 1152921504606846976.0 / a.mx END
                     - ex.n_exact) / ex.n_exact, 6) AS rel_err
    FROM a, ex
    """,
)
def distinct_estimate_kmv(spark, sf_dir):
    """K-minimum-values distinct-count sketch audited against the exact
    answer: estimate the number of UNIQUE documents (the "how much will
    exact dedup shrink this" question) from the 128 smallest portable
    hash values — (k-1)/u_(k) with u the hash normalized to [0,1), exact
    count when fewer than k uniques exist. The estimator needs only k
    longs per partition (TakeOrdered partial top-k, no full shuffle of
    fingerprints); the exact side is the full distinct the sketch
    replaces at 100 TB — both computed here precisely to report the
    sketch's realized error. (k-1)*2^60 is integer-exact in a double and
    IEEE division is deterministic, so both engines produce the identical
    estimate bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(F.md5("text").alias("f")).distinct()
    fp = fp.persist()
    h = fp.select(
        F.conv(F.substring(F.md5("f"), 1, 15), 16, 10).cast("long").alias("hv")
    )
    k = h.orderBy(F.col("hv").asc()).limit(128)
    a = k.agg(F.count(F.lit(1)).alias("kk"), F.max("hv").alias("mx"))
    ex = fp.agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(F.col("kk") < 128, F.col("kk").cast("double")).otherwise(
        (F.col("kk") - 1) * F.lit(1152921504606846976.0) / F.col("mx")
    )
    return (
        a.crossJoin(F.broadcast(ex))
        .select(
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.round(est, 2).alias("kmv_estimate"),
            F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6)
              .alias("rel_err"),
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
    "chunk_dedup_summary",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         c AS (SELECT doc_id,
                      unnest(list_transform(range(0, (len(ws)-1)//24 + 1),
                             i -> md5(array_to_string(ws[i*24+1 : i*24+32],
                                                      ' ')))) AS fp
               FROM w),
         g AS (SELECT fp, COUNT(*)::BIGINT AS n,
                      COUNT(DISTINCT doc_id)::BIGINT AS nd
               FROM c GROUP BY fp)
    SELECT COUNT(*)::BIGINT AS n_unique_chunks,
           SUM(n)::BIGINT AS n_chunks,
           SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
           SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_cross_doc_chunks,
           ROUND(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END)::DOUBLE
                 / SUM(n), 6) AS dup_rate
    FROM g
    """,
)
def chunk_dedup_summary(spark, sf_dir):
    """Chunk-grain deduplication audit: after 32/24 sliding-window
    chunking (same scheme as `doc_chunk_stats`), how many chunks are
    byte-identical repeats, and how many distinct chunks recur across
    DIFFERENT documents (boilerplate detection at paragraph granularity —
    doc-level dedup misses these). Only 32-char fingerprints shuffle; the
    groupBy is partial-aggregated and the final rollup is one row."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    c = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(floor((size(ws)-1)/24) AS INT)),"
                " i -> md5(concat_ws(' ', slice(ws, i*24 + 1, 32))))"
            )
        ).alias("fp"),
    )
    g = c.groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("doc_id").cast("bigint").alias("nd"),
    )
    dup = F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unique_chunks"),
        F.sum("n").cast("bigint").alias("n_chunks"),
        dup.cast("bigint").alias("n_dup_chunks"),
        F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("bigint")
          .alias("n_cross_doc_chunks"),
        F.round(dup.cast("double") / F.sum("n"), 6).alias("dup_rate"),
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
    "label_centroid_distances",
    """
    WITH ce AS (SELECT label, pos, ROUND(AVG(v), 6) AS av
                FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                             unnest(embedding)::DOUBLE AS v
                      FROM embeddings)
                GROUP BY label, pos),
         ca AS (SELECT label, list(av ORDER BY pos) AS c FROM ce
                GROUP BY label)
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(sqrt(list_sum(list_transform(range(1, len(a.c) + 1),
                 i -> (a.c[i] - b.c[i]) * (a.c[i] - b.c[i])))), 6) AS l2_dist
    FROM ca a JOIN ca b ON a.label < b.label
    """,
)
def label_centroid_distances(spark, sf_dir):
    """Inter-class separation matrix: pairwise L2 distance between
    per-label embedding centroids — the embedding-space confusion
    diagnostic (near-identical centroids predict label confusion; an
    outlier centroid flags a poisoned or misdefined class). Centroid
    components round to 6dp BEFORE the distance so both engines measure
    identical vectors. The heavy pass is one partial-aggregated
    (label, dim) mean; the |labels|^2/2 cross join runs on a broadcast
    handful of rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    ce = (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("av"))
    )
    ca = ce.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "av"))), lambda s: s["av"]
        ).alias("c")
    )
    a = ca.select(F.col("label").alias("label_a"), F.col("c").alias("ca"))
    b = ca.select(F.col("label").alias("label_b"), F.col("c").alias("cb"))
    d2 = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select("label_a", "label_b", F.round(F.sqrt(d2), 6).alias("l2_dist"))
    )


@register(
    "weighted_sample_es",
    """
    WITH s AS (SELECT lang, doc_id, n_chars,
                      CAST('0x' || substr(md5('7|' || doc_id::VARCHAR), 1, 15)
                           AS BIGINT) / 1152921504606846976.0 AS u
               FROM documents),
         k AS (SELECT lang, doc_id, n_chars,
                      FLOOR(1000000000 * ln(u) / n_chars + 0.5)::BIGINT
                        AS key_nano
               FROM s),
         r AS (SELECT *, row_number() OVER (PARTITION BY lang
                         ORDER BY key_nano DESC, doc_id ASC) AS rnk
               FROM k)
    SELECT lang, doc_id, n_chars, key_nano FROM r WHERE rnk <= 10
    """,
)
def weighted_sample_es(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis): per
    language, the 10 docs with the largest u^(1/w) sort key, w = doc
    length — longer docs proportionally likelier, yet the draw is a
    single distributed top-k, no sequential sampling state. u comes from
    the portable seeded hash, so the sample is reproducible across
    engines and reruns; ranking on the equivalent integer key
    floor(1e9*ln(u)/w) sidesteps cross-engine pow/ulp drift. Per-group
    window top-k = WindowGroupLimit partial pushdown, no global sort."""
    from veri_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    u = portable_hash64(F.col("doc_id").cast("string"), seed=7) / F.lit(
        1152921504606846976.0
    )
    k = docs.select(
        "lang", "doc_id", "n_chars",
        F.floor(1000000000 * F.log(u) / F.col("n_chars") + 0.5)
         .cast("bigint").alias("key_nano"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("key_nano").desc(), F.col("doc_id").asc()
    )
    return (
        k.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .drop("rnk")
    )


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id,
           unnest(range(0, greatest(n_chars * 100, 1), 1000))::BIGINT
             AS frame_ts_ms
    FROM documents
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing end-to-end: text bytes stand in for
    encoded video (no codecs in this container) with a synthetic duration
    of 100 ms per character; multimodal/binary.frame_sample explodes each
    media row into one row per sampled timestamp through the Arrow-batched
    mapInPandas path. The oracle regenerates the sampling grid
    arithmetically — it verifies the explosion shape (ids x offsets)
    exactly; per-frame feature determinism is covered by unit tests. The
    plan is map-only: no shuffle, media bytes never leave the stage."""
    from veri_spark.multimodal.binary import frame_sample

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
        (F.col("n_chars") * 100).cast("long").alias("duration_ms"),
    )
    frames = frame_sample(media, every_ms=1000, id_col="doc_id")
    return frames.select("doc_id", "frame_ts_ms")


@register(
    "pca_power_iteration_step",
    """
    WITH e AS (SELECT embedding::DOUBLE[] AS x FROM embeddings),
         s AS (SELECT x, list_sum(x) / 8.0 AS sc FROM e),
         comp AS (SELECT pos, SUM(sc * v) AS c
                  FROM (SELECT sc, generate_subscripts(x, 1) AS pos,
                               unnest(x) AS v
                        FROM s)
                  GROUP BY pos),
         n AS (SELECT sqrt(SUM(c * c)) AS nrm FROM comp)
    SELECT pos - 1 AS dim, ROUND(c / nrm, 6) AS v1
    FROM comp, n
    """,
)
def pca_power_iteration_step(spark, sf_dir):
    """One power-iteration step toward the corpus's top principal
    direction: v1 = normalize(X'X v0) with the deterministic uniform seed
    v0 = 1/8 (unit for 64 dims) — the building block of distributed PCA /
    spectral embedding-drift checks, expressed Spark-first. Per row only
    the scalar x.v0 is computed in-line; the (dim, partial-sum) groupBy
    shuffles 64 partials per task regardless of corpus size, and the
    normalizer is a one-row broadcast. Full PCA = this step iterated with
    the previous v as the next literal seed."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.col("embedding").cast("array<double>").alias("x"))
    s = e.select(
        "x",
        (F.aggregate("x", F.lit(0.0), lambda a, b: a + b) / 8.0).alias("sc"),
    )
    comp = (
        s.select("sc", F.posexplode("x").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum(F.col("sc") * F.col("v")).alias("c"))
    )
    n = comp.agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm"))
    return comp.crossJoin(F.broadcast(n)).select(
        F.col("pos").alias("dim"),
        F.round(F.col("c") / F.col("nrm"), 6).alias("v1"),
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
    WITH s AS (SELECT event_type, COUNT(*)::DOUBLE AS n, SUM(value) AS s1,
                      SUM(value * value) AS s2,
                      SUM(value * value * value) AS s3,
                      SUM(value * value * value * value) AS s4
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
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
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
    "source_overlap_jaccard",
    """
    WITH ss AS (SELECT DISTINCT source,
                       unnest(list_transform(
                         range(1, greatest(len(ws) - 1, 1)),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                         AS shingle
                FROM (SELECT source, string_split(text, ' ') AS ws
                      FROM documents)),
         sz AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
         inter AS (SELECT a.source AS source_a, b.source AS source_b,
                          COUNT(*) AS c
                   FROM ss a JOIN ss b
                     ON a.shingle = b.shingle AND a.source < b.source
                   GROUP BY 1, 2)
    SELECT source_a, source_b, c::BIGINT AS n_common,
           ROUND(c::DOUBLE / (na.n + nb.n - c), 6) AS jaccard
    FROM inter
    JOIN sz na ON source_a = na.source
    JOIN sz nb ON source_b = nb.source
    ORDER BY jaccard DESC, source_a ASC, source_b ASC LIMIT 20
    """,
)
def source_overlap_jaccard(spark, sf_dir):
    """Shard-level content overlap: Jaccard similarity between SOURCES
    over their distinct 3-word shingle sets — the "are these two crawls
    the same site" question answered at container grain, where doc-grain
    dedup would drown in pairs. The self-join output is bounded by
    |sources|^2 per shingle (containers, not documents), so the quadratic
    hazard of doc-grain shingle joins does not apply; sizes are a
    |sources|-row broadcast. Top-20 by similarity with deterministic
    tie-break."""
    from veri_spark.functions.text import tokens, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    ss = (
        docs.select("source", tokens("text").alias("__toks"))
        .select("source", F.explode(word_shingles(F.col("__toks"), 3)).alias("shingle"))
        .distinct()
    )
    ss = ss.persist()
    sz = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = ss.select(F.col("source").alias("source_a"), "shingle")
    b = ss.select(F.col("source").alias("source_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    out = (
        inter.join(
            F.broadcast(sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))),
            "source_a",
        )
        .join(
            F.broadcast(sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))),
            "source_b",
        )
        .select(
            "source_a", "source_b", "n_common",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
    )
    return out.orderBy(
        F.col("jaccard").desc(), F.col("source_a").asc(), F.col("source_b").asc()
    ).limit(20)


@register(
    "jaccard_threshold_sweep",
    """
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    capped AS (SELECT s.doc_id, s.shingle FROM sh s
               JOIN (SELECT shingle FROM sh
                     GROUP BY shingle HAVING COUNT(DISTINCT doc_id) <= 64) keep
                 ON s.shingle = keep.shingle),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
               FROM capped a JOIN capped b
                 ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY doc_a, doc_b),
    j AS (SELECT c::DOUBLE / (sa.n + sb.n - c) AS jac
          FROM common
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id)
    SELECT FLOOR(LEAST(jac, 0.999999) * 10)::BIGINT AS bucket_decile,
           COUNT(*)::BIGINT AS n_pairs
    FROM j GROUP BY 1
    """,
)
def jaccard_threshold_sweep(spark, sf_dir):
    """Dedup-threshold calibration: the full histogram of candidate-pair
    Jaccard similarities in 0.1-wide deciles — the curve you read to pick
    a near-dup cutoff BEFORE committing a 100 TB dedup pass to it (the
    elbow between the noise mass at low similarity and the duplicate mass
    near 1.0). Same capped single-join plan as `dedup_ngram_jaccard`
    (stop-shingle cap bounds every join bucket), but aggregated to ~10
    rows instead of ranked pairs. jac = 1.0 folds into the top decile."""
    from veri_spark.operators.dedup import doc_shingles, jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(doc_shingles(docs, parallelism=16), max_doc_freq=64)
    bucket = F.floor(F.least(F.col("jaccard"), F.lit(0.999999)) * 10).cast("bigint")
    return pairs.groupBy(bucket.alias("bucket_decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


@register(
    "mixture_temperature_shares",
    """
    WITH c AS (SELECT lang, SUM(len(string_split(text, ' ')))::BIGINT
                 AS n_tokens
               FROM documents GROUP BY lang),
         t AS (SELECT SUM(n_tokens)::DOUBLE AS tot FROM c),
         p AS (SELECT lang, n_tokens, n_tokens / tot AS raw_share,
                      (n_tokens / tot) ^ 0.7 AS w
               FROM c, t),
         z AS (SELECT SUM(w) AS zz FROM p)
    SELECT lang, n_tokens,
           ROUND(raw_share, 6) AS raw_share,
           ROUND(w / zz, 6) AS temp_share,
           ROUND((w / zz) / raw_share, 6) AS sample_factor
    FROM p, z
    """,
)
def mixture_temperature_shares(spark, sf_dir):
    """Temperature-scaled data-mixture allocation: per-language token
    shares flattened with alpha = 0.7 (share^alpha renormalized), the
    standard multilingual rebalancing that upsamples tail languages
    without letting any head language dominate. sample_factor is the
    per-doc sampling multiplier a downstream hash-threshold sampler
    applies. One token-counting groupBy touches the corpus; the share
    table is |langs| rows with two one-row broadcast totals."""
    from veri_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.sum(token_count("text")).cast("bigint").alias("n_tokens")
    )
    c = c.persist()
    t = c.agg(F.sum("n_tokens").cast("double").alias("tot"))
    p = c.crossJoin(F.broadcast(t)).select(
        "lang", "n_tokens",
        (F.col("n_tokens") / F.col("tot")).alias("raw_share"),
        F.pow(F.col("n_tokens") / F.col("tot"), 0.7).alias("w"),
    )
    p = p.persist()
    z = p.agg(F.sum("w").alias("zz"))
    return p.crossJoin(F.broadcast(z)).select(
        "lang", "n_tokens",
        F.round("raw_share", 6).alias("raw_share"),
        F.round(F.col("w") / F.col("zz"), 6).alias("temp_share"),
        F.round((F.col("w") / F.col("zz")) / F.col("raw_share"), 6)
          .alias("sample_factor"),
    )


@register(
    "split_leakage_check",
    """
    WITH f AS (SELECT doc_id, doc_id % 10 = 0 AS is_val, md5(text) AS fp
               FROM documents),
         g AS (SELECT fp,
                      SUM(CASE WHEN is_val THEN 1 ELSE 0 END) AS nv,
                      SUM(CASE WHEN is_val THEN 0 ELSE 1 END) AS nt
               FROM f GROUP BY fp)
    SELECT COUNT(*)::BIGINT AS n_fingerprints,
           SUM(nv)::BIGINT AS n_val_docs,
           SUM(CASE WHEN nv > 0 AND nt > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_leaked_fps,
           SUM(CASE WHEN nv > 0 AND nt > 0 THEN nv ELSE 0 END)::BIGINT
             AS n_leaked_val_docs,
           ROUND(SUM(CASE WHEN nv > 0 AND nt > 0 THEN nv ELSE 0 END)::DOUBLE
                 / SUM(nv), 6) AS leak_rate
    FROM g
    """,
)
def split_leakage_check(spark, sf_dir):
    """Train/validation leakage audit: with the standard doc_id % 10
    holdout, how many held-out documents share an exact fingerprint with
    a training document — the contamination number that inflates eval
    scores if unchecked (the within-corpus sibling of the external
    benchmark `decontamination_overlap`). One fingerprint groupBy carrying
    two small counters; the verdict is a one-row rollup."""
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        (F.col("doc_id") % 10 == 0).alias("is_val"), F.md5("text").alias("fp")
    )
    g = f.groupBy("fp").agg(
        F.sum(F.when(F.col("is_val"), 1).otherwise(0)).alias("nv"),
        F.sum(F.when(F.col("is_val"), 0).otherwise(1)).alias("nt"),
    )
    leaked = F.col("nv") > 0
    both = leaked & (F.col("nt") > 0)
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.sum("nv").cast("bigint").alias("n_val_docs"),
        F.sum(F.when(both, 1).otherwise(0)).cast("bigint").alias("n_leaked_fps"),
        F.sum(F.when(both, F.col("nv")).otherwise(0)).cast("bigint")
          .alias("n_leaked_val_docs"),
        F.round(
            F.sum(F.when(both, F.col("nv")).otherwise(0)).cast("double")
            / F.sum("nv"), 6
        ).alias("leak_rate"),
    )


@register(
    "knn_join_ivf",
    f"""
    WITH d AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS x, c.centroid_id,
             list_distance(e.embedding::DOUBLE[], c.cvec) AS dist
      FROM embeddings e CROSS JOIN {_DD_CENTROIDS} c
    ), r AS (
      SELECT vec_id, x, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, centroid_id ASC) AS rn
      FROM d
    ), assigned AS (SELECT vec_id, x, centroid_id FROM r WHERE rn = 1),
    pr AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             list_distance(a.x, b.x) AS dist
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id != b.vec_id
    ), rk AS (
      SELECT src, dst, dist,
             row_number() OVER (PARTITION BY src
                                ORDER BY dist ASC, dst ASC) AS rank
      FROM pr
    )
    SELECT src, dst, rank::BIGINT AS rank, ROUND(dist, 6) AS dist
    FROM rk WHERE rank <= 3
    """,
)
def knn_join_ivf(spark, sf_dir):
    """Approximate kNN JOIN over the whole corpus: every vector's 3
    nearest neighbors within its IVF cell (operators/similarity.knn_join)
    — the embedding-graph builder. One map-only literal-centroid
    assignment, a self-equi-join on centroid_id (cost sum(cell^2), cells
    kept constant-size by scaling the centroid count), per-source window
    top-k with WindowGroupLimit pushdown."""
    from veri_spark.operators.similarity import knn_join, take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_join(emb, take_centroids(emb, 8), k=3)
    return out.select(
        "src", "dst", F.col("rank").cast("bigint").alias("rank"),
        F.round("dist", 6).alias("dist"),
    )


@register(
    "knn_join_multiprobe",
    f"""
    WITH d AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS x, c.centroid_id,
             list_distance(e.embedding::DOUBLE[], c.cvec) AS dist
      FROM embeddings e CROSS JOIN {_DD_CENTROIDS} c
    ), r AS (
      SELECT vec_id, x, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, centroid_id ASC) AS rn
      FROM d
    ), home AS (SELECT vec_id, x, centroid_id FROM r WHERE rn = 1),
    probe AS (SELECT vec_id, x, centroid_id FROM r WHERE rn <= 2),
    pr AS (
      SELECT p.vec_id AS src, h.vec_id AS dst,
             list_distance(p.x, h.x) AS dist
      FROM probe p JOIN home h
        ON p.centroid_id = h.centroid_id AND p.vec_id != h.vec_id
    ), rk AS (
      SELECT src, dst, dist,
             row_number() OVER (PARTITION BY src
                                ORDER BY dist ASC, dst ASC) AS rank
      FROM pr
    )
    SELECT src, dst, rank::BIGINT AS rank, ROUND(dist, 6) AS dist
    FROM rk WHERE rank <= 3
    """,
)
def knn_join_multiprobe(spark, sf_dir):
    """kNN join with nprobe=2: each source vector is looked up in its TWO
    nearest cells while neighbors stay in their home cell — recovering
    the boundary-straddling neighbors single-cell blocking misses, at 2x
    candidate cost on the probe side only (each (src, dst) pair still
    joins at most once because a neighbor has exactly one home cell).
    Compare with `knn_join_ivf` (nprobe=1) to read the recall-vs-cost
    trade directly."""
    from veri_spark.operators.similarity import knn_join, take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_join(emb, take_centroids(emb, 8), k=3, nprobe=2)
    return out.select(
        "src", "dst", F.col("rank").cast("bigint").alias("rank"),
        F.round("dist", 6).alias("dist"),
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
    "embedding_outliers",
    """
    WITH ce AS (SELECT label, pos, ROUND(AVG(v), 6) AS av
                FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                             unnest(embedding)::DOUBLE AS v
                      FROM embeddings)
                GROUP BY label, pos),
         ca AS (SELECT label, list(av ORDER BY pos) AS c FROM ce
                GROUP BY label),
         d AS (SELECT e.vec_id, e.label,
                      ROUND(list_distance(e.embedding::DOUBLE[], ca.c), 6)
                        AS dist
               FROM embeddings e JOIN ca ON e.label = ca.label)
    SELECT vec_id, label, dist FROM d
    ORDER BY dist DESC, vec_id ASC LIMIT 10
    """,
)
def embedding_outliers(spark, sf_dir):
    """Mislabeled-point mining: the 10 vectors farthest from their own
    label's centroid — the triage list label-noise cleanup starts from
    (companion of `embedding_margin`, which compares same- vs cross-label
    NEIGHBOR distances; this compares against the class mean). Centroids
    round to 6dp before the distance so both engines measure identical
    vectors; the centroid table is a |labels|-row broadcast and the scan
    stays map-only into a bounded top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    ce = (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("av"))
    )
    ca = ce.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "av"))), lambda s: s["av"]
        ).alias("c")
    )
    from veri_spark.functions.vector import euclidean_distance

    d = emb.join(F.broadcast(ca), "label").select(
        "vec_id", "label",
        F.round(
            euclidean_distance(F.col("embedding").cast("array<double>"), F.col("c")), 6
        ).alias("dist"),
    )
    return d.orderBy(F.col("dist").desc(), F.col("vec_id").asc()).limit(10)


@register(
    "knn_join_recall_audit",
    f"""
    WITH d AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS x, c.centroid_id,
             list_distance(e.embedding::DOUBLE[], c.cvec) AS dist
      FROM embeddings e CROSS JOIN {_DD_CENTROIDS} c
    ), r AS (
      SELECT vec_id, x, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, centroid_id ASC) AS rn
      FROM d
    ), home AS (SELECT vec_id, x, centroid_id FROM r WHERE rn = 1),
    probe2 AS (SELECT vec_id, x, centroid_id FROM r WHERE rn <= 2),
    exact AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY list_distance(a.x, b.x) ASC, b.vec_id ASC) AS rk
        FROM home a JOIN home b ON a.vec_id != b.vec_id)
      WHERE rk <= 3
    ),
    ap1 AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, h.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY list_distance(a.x, h.x) ASC, h.vec_id ASC) AS rk
        FROM home a JOIN home h
          ON a.centroid_id = h.centroid_id AND a.vec_id != h.vec_id)
      WHERE rk <= 3
    ),
    ap2 AS (
      SELECT src, dst FROM (
        SELECT p.vec_id AS src, h.vec_id AS dst,
               row_number() OVER (PARTITION BY p.vec_id
                 ORDER BY list_distance(p.x, h.x) ASC, h.vec_id ASC) AS rk
        FROM probe2 p JOIN home h
          ON p.centroid_id = h.centroid_id AND p.vec_id != h.vec_id)
      WHERE rk <= 3
    )
    SELECT (SELECT COUNT(*) FROM exact)::BIGINT AS n_exact,
           ROUND((SELECT COUNT(*) FROM exact e JOIN ap1 USING (src, dst))::DOUBLE
                 / (SELECT COUNT(*) FROM exact), 6) AS recall_nprobe1,
           ROUND((SELECT COUNT(*) FROM exact e JOIN ap2 USING (src, dst))::DOUBLE
                 / (SELECT COUNT(*) FROM exact), 6) AS recall_nprobe2
    """,
)
def knn_join_recall_audit(spark, sf_dir):
    """Recall audit for the blocked kNN join: single-probe and two-probe
    neighbor sets scored against exact brute-force 3-NN — the number you
    read before trusting `knn_join_ivf` output for graph building. The
    brute-force side is quadratic BY DESIGN (it is the audit, run on a
    bounded sample at scale — the same discipline as
    `ann_ivf_recall_audit`); the audited joins use the production cell-
    blocked plan."""
    from veri_spark.operators.similarity import knn_join, take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = take_centroids(emb, 8)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("x"))
    a = e.select(F.col("vec_id").alias("src"), F.col("x").alias("xa"))
    b = e.select(F.col("vec_id").alias("dst"), F.col("x").alias("xb"))
    from veri_spark.functions.vector import euclidean_distance_fixed

    dim_row = emb.select(F.size("embedding").alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 0
    w = Window.partitionBy("src").orderBy(
        euclidean_distance_fixed(F.col("xa"), F.col("xb"), dim).asc(),
        F.col("dst").asc(),
    )
    exact = (
        a.join(b, F.col("src") != F.col("dst"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("src", "dst")
    )
    exact = exact.persist()
    ap1 = knn_join(emb, cents, k=3, nprobe=1).select("src", "dst")
    ap2 = knn_join(emb, cents, k=3, nprobe=2).select("src", "dst")
    n_exact = exact.count()
    hit1 = exact.join(ap1, ["src", "dst"]).count()
    hit2 = exact.join(ap2, ["src", "dst"]).count()
    return spark.createDataFrame(
        [(n_exact, round(hit1 / n_exact, 6), round(hit2 / n_exact, 6))],
        "n_exact bigint, recall_nprobe1 double, recall_nprobe2 double",
    )


@register(
    "cross_source_neardup_rate",
    f"""
    WITH {_DD_SHINGLES},
    seeds(seed, a, b) AS (VALUES {_minhash_seed_values()}),
    hashed AS (SELECT doc_id,
                      CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 2147483647 AS h31
               FROM sh),
    sig AS (SELECT doc_id, seed, MIN((a * h31 + b) % 2147483647) AS h
            FROM hashed CROSS JOIN seeds GROUP BY doc_id, seed),
    bands AS (SELECT doc_id, seed // 4 AS band,
                     string_agg(h::VARCHAR, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, seed // 4),
    pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id),
    src AS (SELECT doc_id, source FROM documents)
    SELECT LEAST(sa.source, sb.source) AS source_a,
           GREATEST(sa.source, sb.source) AS source_b,
           COUNT(*)::BIGINT AS n_pairs
    FROM pairs
    JOIN src sa ON doc_a = sa.doc_id
    JOIN src sb ON doc_b = sb.doc_id
    WHERE sa.source != sb.source
    GROUP BY 1, 2
    """,
)
def cross_source_neardup_rate(spark, sf_dir):
    """Cross-shard NEAR-duplicate pressure: MinHash-LSH candidate pairs
    whose members live in DIFFERENT sources, counted per source pair —
    `source_overlap_jaccard` asks "do these shards share exact shingles";
    this asks "do they share whole near-duplicate documents" (syndication
    / mirror detection), reusing the production banding plan
    (minhash_candidate_pairs) plus two joins against the tiny
    (doc_id, source) projection. At 100 TB the doc->source map rides the
    banded join's existing keys — only ids and 32-char band keys
    shuffle."""
    from veri_spark.operators.dedup import minhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, num_hashes=16, bands=4, parallelism=16)
    src = docs.select("doc_id", "source")
    out = (
        pairs.join(src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("source", "sa"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("source", "sb"), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
    )
    return (
        out.groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


@register(
    "kmeans_step_inertia",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
         c0 AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
                FROM embeddings WHERE vec_id < 8),
         d1 AS (SELECT e.vec_id, e.x, c.centroid_id,
                       list_distance(e.x, c.cvec) AS dist
                FROM e CROSS JOIN c0 c),
         a1 AS (SELECT vec_id, x, centroid_id FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, centroid_id ASC) AS rn
                  FROM d1) WHERE rn = 1),
         m AS (SELECT centroid_id, pos, ROUND(AVG(v), 6) AS av
               FROM (SELECT centroid_id, generate_subscripts(x, 1) AS pos,
                            unnest(x) AS v
                     FROM a1)
               GROUP BY centroid_id, pos),
         c1 AS (SELECT centroid_id, list(av ORDER BY pos) AS c FROM m
                GROUP BY centroid_id),
         cf AS (SELECT c0.centroid_id, COALESCE(c1.c, c0.cvec) AS cvec
                FROM c0 LEFT JOIN c1 USING (centroid_id)),
         d2 AS (SELECT e.vec_id, e.x, c.centroid_id, c.cvec,
                       list_distance(e.x, c.cvec) AS dist
                FROM e CROSS JOIN cf c),
         a2 AS (SELECT vec_id, x, centroid_id, cvec FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, centroid_id ASC) AS rn
                  FROM d2) WHERE rn = 1)
    SELECT centroid_id, COUNT(*)::BIGINT AS n_assigned,
           SUM(FLOOR(1000000 * list_sum(list_transform(range(1, len(x) + 1),
                 i -> (x[i] - cvec[i]) * (x[i] - cvec[i]))) + 0.5)::BIGINT
               )::BIGINT AS inertia_micro
    FROM a2 GROUP BY centroid_id
    """,
)
def kmeans_step_inertia(spark, sf_dir):
    """One full Lloyd iteration (operators/similarity.kmeans_train,
    iters=1, centroids rounded to 6dp for cross-engine replay) followed by
    re-assignment and per-cluster inertia — distributed k-means as Spark
    expresses it: each iteration is a map-only literal-centroid assignment
    plus a (cluster, dim) partial-aggregated mean, collecting only k x dim
    floats to the driver between iterations; the corpus never shuffles on
    the vector id. Inertia terms round to integer micro-units BEFORE the
    sum (order-proof). Empty clusters keep their seed centroid, matching
    the oracle's COALESCE."""
    from veri_spark.functions.vector import euclidean_distance  # noqa: F401
    from veri_spark.operators.similarity import ivf_assign, kmeans_train

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_train(emb, k=8, iters=1, tol=0.0, round_decimals=6)
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    assigned = ivf_assign(e, cents, id_col="vec_id", vector_col="x")
    joined = assigned.join(
        F.broadcast(cents.withColumnRenamed("centroid_vec", "cvec")),
        "centroid_id",
    )
    d2 = F.aggregate(
        F.zip_with("x", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    micro = F.floor(1000000 * d2 + 0.5).cast("bigint")
    return joined.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
        F.sum(micro).cast("bigint").alias("inertia_micro"),
    )


@register(
    "ivf_balance_audit",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
         c0 AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
                FROM embeddings WHERE vec_id < 8),
         d1 AS (SELECT e.vec_id, e.x, c.centroid_id,
                       list_distance(e.x, c.cvec) AS dist
                FROM e CROSS JOIN c0 c),
         a1 AS (SELECT vec_id, x, centroid_id FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, centroid_id ASC) AS rn
                  FROM d1) WHERE rn = 1),
         m AS (SELECT centroid_id, pos, ROUND(AVG(v), 6) AS av
               FROM (SELECT centroid_id, generate_subscripts(x, 1) AS pos,
                            unnest(x) AS v
                     FROM a1)
               GROUP BY centroid_id, pos),
         c1 AS (SELECT centroid_id, list(av ORDER BY pos) AS c FROM m
                GROUP BY centroid_id),
         cf AS (SELECT c0.centroid_id, COALESCE(c1.c, c0.cvec) AS cvec
                FROM c0 LEFT JOIN c1 USING (centroid_id)),
         d2 AS (SELECT e.vec_id, c.centroid_id,
                       list_distance(e.x, c.cvec) AS dist
                FROM e CROSS JOIN cf c),
         a2 AS (SELECT vec_id, centroid_id FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, centroid_id ASC) AS rn
                  FROM d2) WHERE rn = 1),
         s AS (SELECT centroid_id, COUNT(*)::BIGINT AS n_seed FROM a1
               GROUP BY centroid_id),
         t AS (SELECT centroid_id, COUNT(*)::BIGINT AS n_trained FROM a2
               GROUP BY centroid_id)
    SELECT c0.centroid_id,
           COALESCE(s.n_seed, 0)::BIGINT AS n_seed,
           COALESCE(t.n_trained, 0)::BIGINT AS n_trained
    FROM c0
    LEFT JOIN s USING (centroid_id)
    LEFT JOIN t USING (centroid_id)
    """,
)
def ivf_balance_audit(spark, sf_dir):
    """Cell-balance before/after one Lloyd refinement: per-cell population
    under raw seed centroids vs kmeans_train(iters=1) centroids — the
    audit that justifies `refresh_index(kmeans_iters=...)`: probe cost is
    bounded by the LARGEST cell, and seeds sampled from the first k rows
    routinely leave one cell holding half the corpus. Both assignments are
    map-only literal plans; the comparison is two tiny groupBys."""
    from veri_spark.operators.similarity import (
        ivf_assign,
        kmeans_train,
        take_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("x"))
    seed = take_centroids(e, 8, id_col="vec_id", vector_col="x")
    trained = kmeans_train(emb, k=8, iters=1, tol=0.0, round_decimals=6)
    s = (
        ivf_assign(e, seed, id_col="vec_id", vector_col="x")
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_seed"))
    )
    t = (
        ivf_assign(e, trained, id_col="vec_id", vector_col="x")
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trained"))
    )
    ids = seed.select("centroid_id")
    return (
        ids.join(s, "centroid_id", "left")
        .join(t, "centroid_id", "left")
        .select(
            "centroid_id",
            F.coalesce("n_seed", F.lit(0)).cast("bigint").alias("n_seed"),
            F.coalesce("n_trained", F.lit(0)).cast("bigint").alias("n_trained"),
        )
    )


@register(
    "copurchase_top_pairs",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                       COUNT(*)::BIGINT AS n_orders
                FROM li a JOIN li b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2)
    SELECT part_a, part_b, n_orders FROM pr
    ORDER BY n_orders DESC, part_a ASC, part_b ASC LIMIT 20
    """,
)
def copurchase_top_pairs(spark, sf_dir):
    """Market-basket pair mining: the 20 part pairs most often bought in
    the same order — association-rule support counting as a self-join on
    the order key. The join fan-out is bounded by (parts per order)^2 — a
    BASKET-sized quadratic, not a corpus-sized one — and the distinct
    projection first drops duplicate (order, part) lines so multi-line
    parts don't inflate support. One shuffle on the order key, one
    partial-aggregated pair count, bounded top-k."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pr = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    return pr.orderBy(
        F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(20)


@register(
    "training_set_assembly",
    """
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click'),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         lastc AS (SELECT p.event_id, MAX(c.ts) AS ts
                   FROM p LEFT JOIN c ON p.user_id = c.user_id
                                     AND c.ts <= p.ts
                   GROUP BY p.event_id),
         lastc_v AS (SELECT l.event_id, l.ts,
                            MAX(c.value) AS feat_click_value
                     FROM lastc l
                     LEFT JOIN p ON l.event_id = p.event_id
                     LEFT JOIN c ON c.user_id = p.user_id AND c.ts = l.ts
                     GROUP BY l.event_id, l.ts),
         nviews AS (SELECT p.event_id, COUNT(v.ts)::BIGINT AS feat_views_1h
                    FROM p LEFT JOIN v
                      ON p.user_id = v.user_id
                     AND v.ts <= p.ts
                     AND v.ts > p.ts - INTERVAL 1 HOUR
                    GROUP BY p.event_id)
    SELECT p.event_id, p.user_id,
           ROUND(p.value, 6) AS label_value,
           lv.ts AS feat_click_ts,
           ROUND(lv.feat_click_value, 6) AS feat_click_value,
           nv.feat_views_1h
    FROM p
    JOIN lastc_v lv USING (event_id)
    JOIN nviews nv USING (event_id)
    """,
)
def training_set_assembly(spark, sf_dir):
    """Point-in-time-correct training-set assembly, the feature-store
    serving pattern end-to-end: purchases are the label stream; each row
    is annotated with (a) the user's latest click value as of the label
    time (as-of join — no future leakage by construction) and (b) a
    bounded 1-hour view count (interval join). The engine side composes
    asof_join + a windowed count in TWO single-shuffle passes on user_id;
    the oracle's range-join formulations are the quadratic plans these
    operators replace. Tie rule: equal-timestamp clicks resolve to the
    greatest (value) payload, mirrored in the oracle via MAX(value) at
    the matched timestamp."""
    from veri_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    feat = asof_join(
        p, c, on=["user_id"], payload_cols=["value"], prefix="feat_click_"
    )
    joined = feat.join(v, "user_id", "left").withColumn(
        "__in_1h",
        F.when(
            (F.col("vts") <= F.col("ts"))
            & (F.col("vts") > F.col("ts") - F.expr("INTERVAL 1 HOUR")),
            1,
        ).otherwise(0),
    )
    out = joined.groupBy(
        "event_id", "user_id", "value", "feat_click_ts", "feat_click_value"
    ).agg(F.sum("__in_1h").cast("bigint").alias("feat_views_1h"))
    return out.select(
        "event_id", "user_id",
        F.round("value", 6).alias("label_value"),
        "feat_click_ts",
        F.round("feat_click_value", 6).alias("feat_click_value"),
        "feat_views_1h",
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


# ---------------------------------------------------------------------------
# Round-4 batch 1: graph centrality, MMR diversity re-ranking, truncated-
# embedding retrieval audit, rate limiting, run-length sessionization
# ---------------------------------------------------------------------------

@register(
    "pagerank_step",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (SELECT src, COUNT(*)::DOUBLE AS outdeg FROM edges GROUP BY src),
    contrib AS (
      SELECT e.dst AS l_partkey, SUM(1.0 / d.outdeg) AS z
      FROM edges e JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    )
    SELECT l_partkey, ROUND(0.15 + 0.85 * z, 6) AS pagerank
    FROM contrib
    ORDER BY pagerank DESC, l_partkey ASC LIMIT 20
    """,
)
def pagerank_step(spark, sf_dir):
    """One damped PageRank iteration (d=0.85, uniform r0=1) over the
    co-purchase part graph — graph centrality on the same basket edges
    `copurchase_top_pairs` mines for support. The edge build is the
    bounded basket-quadratic self-join (distinct (order, part) first);
    degrees and contributions are two partial-aggregated shuffles on the
    part key; no adjacency ever sits on the driver, so further iterations
    at 100 TB are the same two shuffles re-keyed on an already
    co-partitioned edge set. Output: top-20 parts by rank-after-one-step.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    contrib = (
        edges.join(deg, "src")
        .groupBy(F.col("dst").alias("l_partkey"))
        .agg(F.sum(F.lit(1.0) / F.col("outdeg")).alias("z"))
    )
    out = contrib.select(
        "l_partkey", F.round(F.lit(0.15) + F.lit(0.85) * F.col("z"), 6).alias("pagerank")
    )
    return out.orderBy(F.col("pagerank").desc(), F.col("l_partkey").asc()).limit(20)


def _round_half_up(x: float, n: int) -> float:
    """Half-away-from-zero rounding, matching Spark's F.round and DuckDB's
    ROUND (Python's built-in round is half-even and would diverge exactly
    at .5 boundaries)."""
    s = 10.0 ** n
    v = abs(x) * s
    import math

    return math.copysign(math.floor(v + 0.5) / s, x)


@register(
    "mmr_rerank",
    f"""
    WITH cands AS (
      SELECT vec_id,
             ROUND(list_cosine_similarity(embedding::DOUBLE[], {_Q0}), 9) AS rel
      FROM embeddings ORDER BY rel DESC, vec_id ASC LIMIT 12
    ),
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             ROUND(list_cosine_similarity(
               ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 9) AS sim
      FROM cands a JOIN cands b ON a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    ),
    sym AS (SELECT ia, ib, sim FROM pairs
            UNION ALL SELECT ib, ia, sim FROM pairs),
    s1 AS (SELECT vec_id, ROUND(0.7 * rel, 6) AS mmr
           FROM cands ORDER BY rel DESC, vec_id ASC LIMIT 1),
    r2 AS (SELECT c.vec_id, c.rel, MAX(s.sim) AS ms FROM cands c
           JOIN sym s ON s.ia = c.vec_id
                     AND s.ib IN (SELECT vec_id FROM s1)
           WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
           GROUP BY 1, 2),
    s2 AS (SELECT vec_id, ROUND(0.7 * rel - 0.3 * ms, 6) AS mmr
           FROM r2 ORDER BY mmr DESC, vec_id ASC LIMIT 1),
    sel2 AS (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2),
    r3 AS (SELECT c.vec_id, c.rel, MAX(s.sim) AS ms FROM cands c
           JOIN sym s ON s.ia = c.vec_id AND s.ib IN (SELECT vec_id FROM sel2)
           WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
           GROUP BY 1, 2),
    s3 AS (SELECT vec_id, ROUND(0.7 * rel - 0.3 * ms, 6) AS mmr
           FROM r3 ORDER BY mmr DESC, vec_id ASC LIMIT 1),
    sel3 AS (SELECT vec_id FROM sel2 UNION ALL SELECT vec_id FROM s3),
    r4 AS (SELECT c.vec_id, c.rel, MAX(s.sim) AS ms FROM cands c
           JOIN sym s ON s.ia = c.vec_id AND s.ib IN (SELECT vec_id FROM sel3)
           WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
           GROUP BY 1, 2),
    s4 AS (SELECT vec_id, ROUND(0.7 * rel - 0.3 * ms, 6) AS mmr
           FROM r4 ORDER BY mmr DESC, vec_id ASC LIMIT 1),
    sel4 AS (SELECT vec_id FROM sel3 UNION ALL SELECT vec_id FROM s4),
    r5 AS (SELECT c.vec_id, c.rel, MAX(s.sim) AS ms FROM cands c
           JOIN sym s ON s.ia = c.vec_id AND s.ib IN (SELECT vec_id FROM sel4)
           WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
           GROUP BY 1, 2),
    s5 AS (SELECT vec_id, ROUND(0.7 * rel - 0.3 * ms, 6) AS mmr
           FROM r5 ORDER BY mmr DESC, vec_id ASC LIMIT 1)
    SELECT 1::BIGINT AS selection_rank, vec_id::BIGINT AS vec_id, mmr FROM s1
    UNION ALL SELECT 2, vec_id, mmr FROM s2
    UNION ALL SELECT 3, vec_id, mmr FROM s3
    UNION ALL SELECT 4, vec_id, mmr FROM s4
    UNION ALL SELECT 5, vec_id, mmr FROM s5
    """,
)
def mmr_rerank(spark, sf_dir):
    """Maximal Marginal Relevance diversity re-ranking (Carbonell &
    Goldstein, SIGIR 1998) — the RAG retrieval pattern the reference's
    context re-scoring (K12, data/search.go:379-427) gestures at:
    greedily pick k=5 of the top-12 cosine candidates maximizing
    0.7*relevance - 0.3*max-similarity-to-already-picked.

    Scale shape: candidate generation is the distributed bounded top-k
    over the full corpus (the 100 TB part); the greedy selection runs on
    the driver over a PROVABLY BOUNDED set (12 candidates, 66 pairwise
    sims — same justification as the collected k-means centroids and PQ
    codebooks). Relevances come from the distributed scan; pairwise sims
    are numpy float64 on the collected vectors (bit-identical math to the
    oracle's DOUBLE[] cosine up to the 1e-9 rounding applied in both).
    The oracle unrolls the same greedy as five chained argmax CTEs."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    qn = np.array(q, dtype="float64")
    dot = F.aggregate(
        F.zip_with("embedding", F.lit(q).cast("array<double>"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    rel = F.round(dot / (nrm * F.lit(float(np.linalg.norm(qn)))), 9)
    cands = (
        emb.select("vec_id", rel.alias("rel"), "embedding")
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(12)
        .collect()
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype="float64") for r in cands}
    rels = {r["vec_id"]: float(r["rel"]) for r in cands}
    sims = {}
    ids = [r["vec_id"] for r in cands]
    for i in ids:
        for j in ids:
            if i < j:
                vi, vj = vecs[i], vecs[j]
                s = _round_half_up(
                    float(vi @ vj) / (float(np.linalg.norm(vi)) * float(np.linalg.norm(vj))),
                    9,
                )
                sims[(i, j)] = sims[(j, i)] = s
    picked: list[tuple[int, int, float]] = []
    remaining = set(ids)
    first = max(remaining, key=lambda v: (rels[v], -v))
    picked.append((1, first, _round_half_up(0.7 * rels[first], 6)))
    remaining.discard(first)
    for rank in range(2, 6):
        best, best_score = None, None
        for c in sorted(remaining):
            ms = max(sims[(c, p)] for _, p, _ in picked)
            score = _round_half_up(0.7 * rels[c] - 0.3 * ms, 6)
            if best is None or score > best_score:
                best, best_score = c, score
        picked.append((rank, best, best_score))
        remaining.discard(best)
    return spark.createDataFrame(
        picked, "selection_rank bigint, vec_id bigint, mmr double"
    )


@register(
    "matryoshka_recall",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    s AS (SELECT q.query_id, e.vec_id,
            list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS fs,
            list_cosine_similarity(
              (e.embedding::DOUBLE[])[1:32], q.qv[1:32]) AS ts
          FROM embeddings e, q),
    r AS (SELECT query_id, vec_id,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY fs DESC, vec_id ASC) AS rf,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY ts DESC, vec_id ASC) AS rt
          FROM s)
    SELECT query_id,
           ROUND(SUM(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END)
                 / 10.0, 3) AS recall_at_10
    FROM r GROUP BY query_id
    """,
)
def matryoshka_recall(spark, sf_dir):
    """Matryoshka-style truncation audit (Kusupati et al., NeurIPS 2022):
    recall@10 of cosine retrieval using only the FIRST 32 of 64 embedding
    dims versus full-dimension retrieval, per query — the measurement that
    decides whether a cheaper truncated index is safe to serve. Five query
    vectors broadcast against the corpus (map-side fan-out, no shuffle for
    scoring); both rankings share one exchange on query_id; overlap is
    rows inside both top-10s. At 100 TB the full ranking would come from
    the IVF path — the audit shape (two rankings, one window key) holds."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = (
        emb.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )

    def cos(a, b):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        na = F.sqrt(
            F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
        )
        nb = F.sqrt(
            F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
        )
        return dot / (na * nb)

    s = e.crossJoin(F.broadcast(qs)).select(
        "query_id",
        "vec_id",
        cos(F.col("ev"), F.col("qv")).alias("fs"),
        cos(F.slice("ev", 1, 32), F.slice("qv", 1, 32)).alias("ts"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("fs").desc(), F.col("vec_id").asc())
    wt = Window.partitionBy("query_id").orderBy(F.col("ts").desc(), F.col("vec_id").asc())
    r = s.select(
        "query_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    return r.groupBy("query_id").agg(
        F.round(
            F.sum(F.when((F.col("rf") <= 10) & (F.col("rt") <= 10), 1).otherwise(0))
            / F.lit(10.0),
            3,
        ).alias("recall_at_10")
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
    "embedding_dim_stats",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings)
    SELECT pos::BIGINT - 1 AS dim,
           ROUND(AVG(v), 6) AS mean_v,
           ROUND(STDDEV_POP(v), 6) AS std_v,
           ROUND(MIN(v), 6) AS min_v,
           ROUND(MAX(v), 6) AS max_v
    FROM e GROUP BY pos ORDER BY dim ASC
    """,
)
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding statistics (mean/std/min/max over the
    corpus): the calibration table the int8 scalar quantizer and any
    whitening step read, and the first place dead or exploding dimensions
    show up. posexplode + one partial-aggregated groupBy on (dim) — 64
    groups, so the reduce side is trivial at any corpus size. Population
    stddev via the explicit E[x^2]-E[x]^2 form DuckDB's STDDEV_POP also
    computes."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    return (
        e.groupBy(F.col("pos").cast("bigint").alias("dim"))
        .agg(
            F.round(F.avg("v"), 6).alias("mean_v"),
            F.round(F.stddev_pop("v"), 6).alias("std_v"),
            F.round(F.min("v"), 6).alias("min_v"),
            F.round(F.max("v"), 6).alias("max_v"),
        )
        .orderBy(F.col("dim").asc())
    )


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


@register(
    "copurchase_lift",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey)::DOUBLE AS n_orders FROM li),
    supp AS (SELECT l_partkey, COUNT(*)::DOUBLE AS n FROM li GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*)::DOUBLE AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2)
    SELECT part_a, part_b, n_ab::BIGINT AS n_ab,
           ROUND(n_ab / sa.n, 6) AS confidence_a_b,
           ROUND(n_ab * (SELECT n_orders FROM n) / (sa.n * sb.n), 6) AS lift
    FROM pairs
    JOIN supp sa ON sa.l_partkey = part_a
    JOIN supp sb ON sb.l_partkey = part_b
    ORDER BY lift DESC, part_a ASC, part_b ASC LIMIT 20
    """,
)
def copurchase_lift(spark, sf_dir):
    """Association-rule strength for basket pairs: confidence(A->B) and
    lift relative to independence — the metrics that separate genuinely
    associated parts from merely popular ones (raw support, which
    `copurchase_top_pairs` ranks by, conflates the two). The support >= 2
    floor prunes the pair tail BEFORE the metric joins; per-part supports
    broadcast; the basket self-join is the same bounded quadratic as the
    support miner."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.select(F.countDistinct("l_orderkey").cast("double").alias("n_orders"))
    supp = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    out = (
        pairs.join(
            F.broadcast(supp.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na"))),
            "part_a",
        )
        .join(
            F.broadcast(supp.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb"))),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(F.col("n_ab") / F.col("na"), 6).alias("confidence_a_b"),
            F.round(F.col("n_ab") * F.col("n_orders") / (F.col("na") * F.col("nb")), 6).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("lift").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(20)


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


@register(
    "fingerprint_split_assign",
    """
    WITH f AS (
      SELECT doc_id, source,
             md5(lower(trim(text))) AS fp,
             CAST('0x' || substr(md5(md5(lower(trim(text)))), 1, 15) AS BIGINT)
               % 10 AS bucket
      FROM documents),
    s AS (
      SELECT doc_id, source, fp,
             CASE WHEN bucket < 8 THEN 'train'
                  WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
      FROM f),
    leak AS (
      SELECT COUNT(*)::BIGINT AS n_leaked FROM (
        SELECT fp FROM s GROUP BY fp HAVING COUNT(DISTINCT split) > 1))
    SELECT split, source,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT fp)::BIGINT AS n_fingerprints,
           (SELECT n_leaked FROM leak) AS n_leaked_fingerprints
    FROM s GROUP BY split, source
    ORDER BY split ASC, source ASC
    """,
)
def fingerprint_split_assign(spark, sf_dir):
    """Leakage-safe train/val/test assignment: the split key is the md5 of
    the NORMALIZED TEXT, not the doc id — so byte-identical duplicates
    land in the same split by construction and the audit column
    `n_leaked_fingerprints` is structurally 0 (split by doc_id, the naive
    choice, leaks every cross-split duplicate into eval). One map pass
    assigns; counts are partial-aggregated; the leak audit groups by the
    32-char fingerprint only. The md5-of-md5 bucket matches the repo's
    portable-hash convention so both engines bucket identically."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    bucket = (
        F.conv(F.substring(F.md5(fp), 1, 15), 16, 10).cast("bigint") % 10
    )
    s = docs.select(
        "doc_id", "source", fp.alias("fp"),
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    leak = (
        s.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaked"))
    )
    g = s.groupBy("split", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("fp").cast("bigint").alias("n_fingerprints"),
    )
    return (
        g.crossJoin(F.broadcast(leak))
        .select(
            "split", "source", "n_docs", "n_fingerprints",
            F.col("n_leaked").alias("n_leaked_fingerprints"),
        )
        .orderBy(F.col("split").asc(), F.col("source").asc())
    )


@register(
    "hard_example_mining",
    f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
    d AS (
      SELECT e.vec_id, e.label, e.x, c.centroid_id,
             list_distance(e.x, c.cvec) AS dist
      FROM e CROSS JOIN {_DD_CENTROIDS} c
    ), r AS (
      SELECT vec_id, label, x, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, centroid_id ASC) AS rn
      FROM d
    ), a AS (SELECT vec_id, label, x, centroid_id FROM r WHERE rn = 1),
    pos AS (
      SELECT p.vec_id, MIN(list_distance(p.x, q.x)) AS pos_dist
      FROM e p JOIN e q ON p.label = q.label AND p.vec_id != q.vec_id
      GROUP BY p.vec_id),
    neg AS (
      SELECT p.vec_id, MIN(list_distance(p.x, q.x)) AS neg_dist
      FROM a p JOIN a q
        ON p.centroid_id = q.centroid_id AND p.label != q.label
      GROUP BY p.vec_id)
    SELECT pos.vec_id,
           ROUND(pos_dist, 6) AS pos_dist,
           ROUND(neg_dist, 6) AS neg_dist,
           ROUND(neg_dist - pos_dist, 6) AS margin
    FROM pos JOIN neg USING (vec_id)
    ORDER BY margin ASC, vec_id ASC LIMIT 20
    """,
)
def hard_example_mining(spark, sf_dir):
    """Triplet-mining worklist: the 20 anchors with the smallest
    (nearest-cross-label - nearest-same-label) margin — the hard examples
    a contrastive trainer oversamples (per-anchor grain; `embedding_margin`
    reports the same quantity for 10 fixed probes). BOTH pair searches are
    blocked: positives within the LABEL block (bounded by class size),
    hardest negatives within the anchor's IVF CELL (the ANN-bucket
    approximation hard-negative miners use at scale — cross-label
    neighbors outside the cell are missed, the standard recall trade).
    No unblocked corpus self-join anywhere."""
    from veri_spark.operators.similarity import ivf_assign, take_centroids
    from veri_spark.functions.vector import euclidean_distance_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 0
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("x")
    )
    a = ivf_assign(e, take_centroids(emb, 8), id_col="vec_id", vector_col="x")
    dist = euclidean_distance_fixed(F.col("xa"), F.col("xb"), dim)
    pos = (
        e.select("label", F.col("vec_id").alias("va"), F.col("x").alias("xa"))
        .join(e.select("label", F.col("vec_id").alias("vb"), F.col("x").alias("xb")), "label")
        .filter(F.col("va") != F.col("vb"))
        .groupBy(F.col("va").alias("vec_id"))
        .agg(F.min(dist).alias("pos_dist"))
    )
    neg = (
        a.select("centroid_id", F.col("label").alias("la"), F.col("vec_id").alias("va"), F.col("x").alias("xa"))
        .join(
            a.select("centroid_id", F.col("label").alias("lb"), F.col("vec_id").alias("vb"), F.col("x").alias("xb")),
            "centroid_id",
        )
        .filter(F.col("la") != F.col("lb"))
        .groupBy(F.col("va").alias("vec_id"))
        .agg(F.min(dist).alias("neg_dist"))
    )
    return (
        pos.join(neg, "vec_id")
        .select(
            "vec_id",
            F.round("pos_dist", 6).alias("pos_dist"),
            F.round("neg_dist", 6).alias("neg_dist"),
            F.round(F.col("neg_dist") - F.col("pos_dist"), 6).alias("margin"),
        )
        .orderBy(F.col("margin").asc(), F.col("vec_id").asc())
        .limit(20)
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


# ---------------------------------------------------------------------------
# Round-4 batch 5: BM25 retrieval, multimodal byte dedup, clickstream paths
# ---------------------------------------------------------------------------

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
    "multimodal_dedup",
    """
    WITH m AS (
      SELECT doc_id, source, md5(text) AS payload_md5,
             strlen(text)::BIGINT AS n_bytes
      FROM documents),
    k AS (SELECT source, payload_md5, MIN(n_bytes) AS n_bytes,
                 COUNT(*)::BIGINT AS n_copies
          FROM m GROUP BY source, payload_md5)
    SELECT source,
           SUM(n_copies)::BIGINT AS n_payloads,
           COUNT(*)::BIGINT AS n_unique,
           SUM(n_copies * n_bytes)::BIGINT AS bytes_total,
           SUM(n_bytes)::BIGINT AS bytes_unique,
           ROUND(1.0 - SUM(n_bytes)::DOUBLE / SUM(n_copies * n_bytes), 6)
             AS savings_ratio
    FROM k GROUP BY source ORDER BY source ASC
    """,
)
def multimodal_dedup(spark, sf_dir):
    """Content-hash dedup accounting for binary media payloads (text bytes
    stand in for encoded media, same convention as
    `multimodal_decode_features`): per source, payload count vs unique
    md5 count and the byte savings content-addressed storage would
    realize — the FIRST pass a 100 TB image/audio ingest runs, before any
    decode. Only 32-char digests and byte counts shuffle; payload bytes
    never leave the scan (the md5 is computed map-side on the binary
    column). Copies within a hash keep MIN(n_bytes) — identical bytes,
    stated once."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id", "source",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("payload_md5"),
        F.length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("n_bytes"),
    )
    k = m.groupBy("source", "payload_md5").agg(
        F.min("n_bytes").alias("n_bytes"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )
    return (
        k.groupBy("source")
        .agg(
            F.sum("n_copies").cast("bigint").alias("n_payloads"),
            F.count(F.lit(1)).cast("bigint").alias("n_unique"),
            F.sum(F.col("n_copies") * F.col("n_bytes")).cast("bigint").alias("bytes_total"),
            F.sum("n_bytes").cast("bigint").alias("bytes_unique"),
            F.round(
                1.0 - F.sum("n_bytes").cast("double")
                / F.sum(F.col("n_copies") * F.col("n_bytes")),
                6,
            ).alias("savings_ratio"),
        )
        .orderBy(F.col("source").asc())
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
# Round-4 batch 6: whitening audit, repeat purchases
# ---------------------------------------------------------------------------

@register(
    "embedding_whitening_audit",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings),
    s AS (SELECT pos, AVG(v) AS mu,
                 CASE WHEN STDDEV_POP(v) = 0 THEN 1.0 ELSE STDDEV_POP(v) END AS sd
          FROM e GROUP BY pos),
    raw_m AS (SELECT vec_id, MAX(abs(v)) AS m FROM e GROUP BY vec_id),
    raw_err AS (
      SELECT e.vec_id,
             AVG(abs(e.v - round(e.v / (rm.m / 127.0)) * (rm.m / 127.0))
                 / rm.m) AS rel_err
      FROM e JOIN raw_m rm USING (vec_id) WHERE rm.m > 0
      GROUP BY e.vec_id),
    wh AS (
      SELECT e.vec_id, e.pos, (e.v - s.mu) / s.sd AS w
      FROM e JOIN s USING (pos)),
    wh_m AS (SELECT vec_id, MAX(abs(w)) AS m FROM wh GROUP BY vec_id),
    wh_err AS (
      SELECT wh.vec_id,
             AVG(abs(wh.w - round(wh.w / (wm.m / 127.0)) * (wm.m / 127.0))
                 / wm.m) AS rel_err
      FROM wh JOIN wh_m wm USING (vec_id) WHERE wm.m > 0
      GROUP BY wh.vec_id)
    SELECT ROUND(AVG(r.rel_err), 6) AS raw_rel_err,
           ROUND(AVG(w.rel_err), 6) AS whitened_rel_err,
           ROUND(AVG(w.rel_err) / AVG(r.rel_err), 6) AS err_ratio
    FROM raw_err r JOIN wh_err w USING (vec_id)
    """,
)
def embedding_whitening_audit(spark, sf_dir):
    """Does per-dimension standardization help int8 quantization? Average
    per-vector relative reconstruction error (|x - dequant(quant(x))| /
    max|x|, symmetric per-vector scale, 127 levels) for RAW versus
    WHITENED ((x-mu)/sd per dim) embeddings, and their ratio — the
    one-number audit run before deciding the store's quantized tier
    should whiten at ingest (reads `embedding_dim_stats`' moments; ratio
    < 1 means whitening spreads mass across dims and quantizes better).
    Two posexplode aggregations and per-vector groupBys; the 64-row dim
    stats broadcast back — corpus passes stay map-shaped."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    s = e.groupBy("pos").agg(
        F.avg("v").alias("mu"),
        F.when(F.stddev_pop("v") == 0, F.lit(1.0))
        .otherwise(F.stddev_pop("v"))
        .alias("sd"),
    )

    def rel_err(df, col):
        m = df.groupBy("vec_id").agg(F.max(F.abs(F.col(col))).alias("m"))
        j = df.join(m, "vec_id").filter(F.col("m") > 0)
        step = F.col("m") / 127.0
        err = F.abs(F.col(col) - F.round(F.col(col) / step) * step) / F.col("m")
        return j.groupBy("vec_id").agg(F.avg(err).alias("rel_err"))

    raw = rel_err(e, "v")
    wh = rel_err(
        e.join(F.broadcast(s), "pos").select(
            "vec_id", "pos", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("w")
        ),
        "w",
    )
    return (
        raw.select(F.col("vec_id"), F.col("rel_err").alias("r"))
        .join(wh.select(F.col("vec_id"), F.col("rel_err").alias("w")), "vec_id")
        .agg(
            F.round(F.avg("r"), 6).alias("raw_rel_err"),
            F.round(F.avg("w"), 6).alias("whitened_rel_err"),
            F.round(F.avg("w") / F.avg("r"), 6).alias("err_ratio"),
        )
    )


@register(
    "repeat_purchase_rate",
    """
    WITH ol AS (
      SELECT o.o_custkey AS cust, l.l_partkey AS part,
             o.o_orderdate AS od, o.o_orderkey AS ok
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2, 3, 4),
    r AS (
      SELECT cust, part, ok,
             row_number() OVER (PARTITION BY cust, part
                                ORDER BY od ASC, ok ASC) AS nth
      FROM ol)
    SELECT COUNT(*)::BIGINT AS n_cust_part_orders,
           SUM(CASE WHEN nth > 1 THEN 1 ELSE 0 END)::BIGINT AS n_repeat,
           ROUND(SUM(CASE WHEN nth > 1 THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS repeat_rate
    FROM r
    """,
)
def repeat_purchase_rate(spark, sf_dir):
    """Repeat-purchase rate: of all (customer, part, order) line
    occurrences, the share where the customer had ALREADY ordered that
    part in an earlier order — the retention/loyalty analog of
    `copurchase_*`'s association mining. One orders-lineitem equi-join
    (orders side projected to 3 columns), distinct to order grain, then a
    single window over (cust, part) — the high-cardinality composite key
    spreads evenly, no skew hot-spot."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_custkey").alias("cust"), F.col("o_orderdate").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part")
    )
    ol = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("cust", "part", "od", F.col("o_orderkey").alias("ok"))
        .distinct()
    )
    w = Window.partitionBy("cust", "part").orderBy(F.col("od").asc(), F.col("ok").asc())
    r = ol.select(F.row_number().over(w).alias("nth"))
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust_part_orders"),
        F.sum(F.when(F.col("nth") > 1, 1).otherwise(0)).cast("bigint").alias("n_repeat"),
        F.round(
            F.sum(F.when(F.col("nth") > 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("repeat_rate"),
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
    "customer_spend_gini",
    """
    WITH s AS (
      SELECT o_custkey, SUM(o_totalprice) AS spend
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT spend,
             row_number() OVER (ORDER BY spend ASC, o_custkey ASC) AS i,
             COUNT(*) OVER () AS n,
             SUM(spend) OVER () AS tot
      FROM s)
    SELECT ROUND(SUM((2.0 * i - n - 1) * spend) / (MAX(n) * MAX(tot)), 6) AS gini,
           MAX(n)::BIGINT AS n_customers,
           ROUND(MAX(tot), 2) AS total_spend
    FROM r
    """,
)
def customer_spend_gini(spark, sf_dir):
    """Revenue-concentration Gini coefficient over per-customer spend
    (sum((2i-n-1)x_i) / (n*sum x) on the ascending-sorted series) — the
    whale-dependence number that decides mixture caps and rate limits
    the same way the corpus-side `heavy_hitters_share` does for traffic.
    The per-customer aggregate is partial-combined; the GLOBAL rank sort
    runs over the customer aggregate (|customers| rows, not |orders|) —
    the one place a total sort is the honest cost, on the smallest frame
    that can carry it."""
    o = load_table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    wr = Window.orderBy(F.col("spend").asc(), F.col("o_custkey").asc())
    wall = Window.partitionBy()
    r = s.select(
        "spend",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("spend").over(wall).alias("tot"),
    )
    return r.agg(
        F.round(
            F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("spend"))
            / (F.max("n") * F.max("tot")),
            6,
        ).alias("gini"),
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.max("tot"), 2).alias("total_spend"),
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


# ---------------------------------------------------------------------------
# Round-4 batch 8: simhash calibration, containment matrix, correlation
# ---------------------------------------------------------------------------

@register(
    "simhash_precision_audit",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t),
    bsum AS (SELECT doc_id, bit, SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) bits
             GROUP BY doc_id, bit),
    sig AS (SELECT doc_id,
                   SUM(CASE WHEN s >= 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END)::BIGINT AS simhash
            FROM bsum GROUP BY doc_id),
    bands AS (SELECT doc_id, simhash, b, (simhash >> (b * 8)) & 255 AS v
              FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
                    bit_count(xor(a.simhash, c.simhash))::INT AS hamming
             FROM bands a JOIN bands c
               ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
             WHERE bit_count(xor(a.simhash, c.simhash)) <= 3),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, greatest(len(ws) - 1, 1)),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
           FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
           WHERE doc_id IN (SELECT doc_a FROM cand UNION SELECT doc_b FROM cand)),
    sz AS (SELECT doc_id, COUNT(*)::DOUBLE AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::DOUBLE AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    j AS (SELECT c.hamming,
                 ROUND(COALESCE(i.i, 0)
                       / (sa.n + sb.n - COALESCE(i.i, 0)), 6) AS jac
          FROM cand c
          LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          JOIN sz sa ON sa.doc_id = c.doc_a
          JOIN sz sb ON sb.doc_id = c.doc_b)
    SELECT hamming, COUNT(*)::BIGINT AS n_pairs,
           ROUND(AVG(jac), 6) AS mean_jaccard,
           SUM(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_precise
    FROM j GROUP BY hamming ORDER BY hamming ASC
    """,
)
def simhash_precision_audit(spark, sf_dir):
    """Precision calibration for the SimHash near-dup detector: for every
    byte-banded candidate pair within Hamming distance 3, the TRUE
    trigram Jaccard — bucketed by Hamming distance with pair counts, mean
    Jaccard, and the >=0.5-precision count. The MinHash estimator has
    `minhash_estimate_error`; this is the same discipline for the SimHash
    tier, and together they decide which detector's threshold to trust on
    a new corpus. Exact Jaccard is computed ONLY for candidate docs
    (semi-pruned shingle join), so the audit cost scales with candidates,
    not the corpus."""
    from veri_spark.operators.dedup import doc_shingles, simhash_hamming_pairs

    docs = load_table(spark, sf_dir, "documents")
    cand = simhash_hamming_pairs(docs, max_hamming=3, parallelism=16).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    ).persist()
    cd = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = doc_shingles(docs, parallelism=16).join(
        F.broadcast(cd), "doc_id", "left_semi"
    ).persist()
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("n"))
    inter = (
        sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .join(cand.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    j = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(
            F.broadcast(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))),
            "doc_a",
        )
        .join(
            F.broadcast(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))),
            "doc_b",
        )
        .select(
            "hamming",
            F.round(
                F.coalesce(F.col("i"), F.lit(0.0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("i"), F.lit(0.0))),
                6,
            ).alias("jac"),
        )
    )
    return (
        j.groupBy("hamming")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.avg("jac"), 6).alias("mean_jaccard"),
            F.sum(F.when(F.col("jac") >= 0.5, 1).otherwise(0)).cast("bigint").alias("n_precise"),
        )
        .orderBy(F.col("hamming").asc())
    )


@register(
    "source_containment_matrix",
    """
    WITH ss AS (SELECT DISTINCT source,
                       unnest(list_transform(
                         range(1, greatest(len(ws) - 1, 1)),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                         AS shingle
                FROM (SELECT source, string_split(text, ' ') AS ws
                      FROM documents)),
         sz AS (SELECT source, COUNT(*)::DOUBLE AS n FROM ss GROUP BY source),
         inter AS (SELECT a.source AS source_a, b.source AS source_b,
                          COUNT(*)::DOUBLE AS c
                   FROM ss a JOIN ss b
                     ON a.shingle = b.shingle AND a.source != b.source
                   GROUP BY 1, 2)
    SELECT source_a, source_b,
           ROUND(inter.c / sz.n, 6) AS containment
    FROM inter JOIN sz ON sz.source = inter.source_a
    ORDER BY containment DESC, source_a ASC, source_b ASC LIMIT 15
    """,
)
def source_containment_matrix(spark, sf_dir):
    """DIRECTED shard containment: what fraction of source A's distinct
    trigrams also appear in source B — the asymmetric complement of
    `source_overlap_jaccard` (Jaccard says "similar"; containment says
    "A is inside B", which is what decides WHICH shard to drop when a
    crawl subsumes another). Same container-grain bound: the shingle
    join fan-out is |sources|^2 per shingle, sizes broadcast."""
    from veri_spark.functions.text import tokens, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    ss = (
        docs.select("source", tokens("text").alias("__toks"))
        .select("source", F.explode(word_shingles(F.col("__toks"), 3)).alias("shingle"))
        .distinct()
        .persist()
    )
    sz = ss.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    inter = (
        ss.select(F.col("source").alias("source_a"), "shingle")
        .join(ss.select(F.col("source").alias("source_b"), "shingle"), "shingle")
        .filter(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    return (
        inter.join(
            F.broadcast(sz.select(F.col("source").alias("source_a"), "n")), "source_a"
        )
        .select(
            "source_a", "source_b",
            F.round(F.col("c") / F.col("n"), 6).alias("containment"),
        )
        .orderBy(
            F.col("containment").desc(), F.col("source_a").asc(), F.col("source_b").asc()
        )
        .limit(15)
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


@register(
    "dedup_tiered_pipeline",
    f"""
    WITH d AS (SELECT doc_id, text, md5(lower(trim(text))) AS fp FROM documents),
    k1 AS (SELECT fp, MIN(doc_id) AS keeper FROM d GROUP BY fp),
    s1 AS (SELECT d.doc_id, d.text FROM d JOIN k1 USING (fp)
           WHERE d.doc_id = k1.keeper),
    t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM s1),
    h2 AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t),
    bsum AS (SELECT doc_id, bit,
                    SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM h2 CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) bits
             GROUP BY doc_id, bit),
    sig2 AS (SELECT doc_id,
                    SUM(CASE WHEN s >= 0 THEN (1::BIGINT << bit)
                        ELSE 0::BIGINT END)::BIGINT AS simhash
             FROM bsum GROUP BY doc_id),
    bands2 AS (SELECT doc_id, simhash, b, (simhash >> (b * 8)) & 255 AS v
               FROM sig2 CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
    cand2 AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
              FROM bands2 a JOIN bands2 c
                ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
              WHERE bit_count(xor(a.simhash, c.simhash)) <= 3),
    drop2 AS (SELECT DISTINCT doc_b AS doc_id FROM cand2),
    s2 AS (SELECT doc_id, text FROM s1
           WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, greatest(len(ws) - 1, 1)),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
           FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM s2)),
    seeds(seed, a, b) AS (VALUES {{_SEEDS}}),
    hashed AS (SELECT doc_id,
                      CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)
                        % 2147483647 AS h31
               FROM sh),
    sig3 AS (SELECT doc_id, seed, MIN((a * h31 + b) % 2147483647) AS h
             FROM hashed CROSS JOIN seeds GROUP BY doc_id, seed),
    bands3 AS (SELECT doc_id, seed // 4 AS band,
                      string_agg(h::VARCHAR, ',' ORDER BY seed) AS band_key
               FROM sig3 GROUP BY doc_id, seed // 4),
    cand3 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands3 a JOIN bands3 b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id),
    sz AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     COUNT(*)::BIGINT AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle
               AND a.doc_id < b.doc_id
              JOIN cand3 c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
              GROUP BY 1, 2),
    drop3 AS (SELECT DISTINCT i.doc_b AS doc_id
              FROM inter i
              JOIN sz sa ON sa.doc_id = i.doc_a
              JOIN sz sb ON sb.doc_id = i.doc_b
              WHERE 3 * i.i >= sa.n + sb.n),
    n0 AS (SELECT COUNT(*)::BIGINT AS n FROM d),
    n1 AS (SELECT COUNT(*)::BIGINT AS n FROM s1),
    n2 AS (SELECT COUNT(*)::BIGINT AS n FROM s2),
    n3 AS (SELECT (SELECT n FROM n2)
                  - (SELECT COUNT(*) FROM drop3)::BIGINT AS n)
    SELECT 1::BIGINT AS tier, (SELECT n FROM n0) AS n_in,
           (SELECT n FROM n0) - (SELECT n FROM n1) AS n_dropped,
           (SELECT n FROM n1) AS n_out
    UNION ALL
    SELECT 2, (SELECT n FROM n1),
           (SELECT n FROM n1) - (SELECT n FROM n2), (SELECT n FROM n2)
    UNION ALL
    SELECT 3, (SELECT n FROM n2),
           (SELECT n FROM n2) - (SELECT n FROM n3), (SELECT n FROM n3)
    """.replace("{_SEEDS}", _minhash_seed_values()),
)
def dedup_tiered_pipeline(spark, sf_dir):
    """The COMPOSED production dedup pipeline, tier yields end-to-end:
    exact fingerprint (md5 of normalized text, keep lowest doc_id) ->
    SimHash byte-banding at Hamming<=3 -> MinHash-banded candidates
    verified at trigram Jaccard >= 0.5 (stated as the INTEGER condition
    3i >= |A|+|B|, so the threshold has no float boundary in either
    engine). Each tier sees only the previous tier's survivors — the
    ordering cheap-to-expensive is the point: the exact tier deletes for
    the cost of a hash groupBy, the banded tiers only pay on what
    remains. Drop rule per tier: a doc with a (verified) pair to a
    smaller surviving id is dropped (greedy keep-first, one pass —
    identical rule both engines). Output: (tier, n_in, n_dropped, n_out).
    """
    from veri_spark.operators.dedup import (
        doc_shingles, minhash_candidate_pairs, simhash_hamming_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "text", F.md5(F.lower(F.trim("text"))).alias("fp"))
    k1 = d.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    s1 = (
        d.join(k1, "fp")
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "text")
        .persist()
    )
    n0 = docs.count()
    n1 = s1.count()
    drop2 = (
        simhash_hamming_pairs(s1, max_hamming=3, parallelism=16)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s2 = s1.join(drop2, "doc_id", "left_anti").persist()
    n2 = s2.count()
    cand3 = minhash_candidate_pairs(s2, num_hashes=16, bands=4, parallelism=16)
    sh = doc_shingles(s2, parallelism=16).persist()
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    inter = (
        sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .join(cand3, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    drop3 = (
        inter.join(
            F.broadcast(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))),
            "doc_a",
        )
        .join(
            F.broadcast(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))),
            "doc_b",
        )
        .filter(3 * F.col("i") >= F.col("na") + F.col("nb"))
        .select("doc_b")
        .distinct()
    )
    n3 = n2 - drop3.count()
    return spark.createDataFrame(
        [
            (1, n0, n0 - n1, n1),
            (2, n1, n1 - n2, n2),
            (3, n2, n2 - n3, n3),
        ],
        "tier bigint, n_in bigint, n_dropped bigint, n_out bigint",
    )


@register(
    "knn_graph_hubness",
    f"""
    WITH d AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS x, c.centroid_id,
             list_distance(e.embedding::DOUBLE[], c.cvec) AS dist
      FROM embeddings e CROSS JOIN {_DD_CENTROIDS} c
    ), r AS (
      SELECT vec_id, x, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, centroid_id ASC) AS rn
      FROM d
    ), assigned AS (SELECT vec_id, x, centroid_id FROM r WHERE rn = 1),
    pr AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             list_distance(a.x, b.x) AS dist
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id != b.vec_id
    ), rk AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src
                                ORDER BY dist ASC, dst ASC) AS rank
      FROM pr
    ), edges AS (SELECT src, dst FROM rk WHERE rank <= 3),
    indeg AS (
      SELECT a.vec_id, COALESCE(g.deg, 0) AS deg
      FROM assigned a
      LEFT JOIN (SELECT dst, COUNT(*) AS deg FROM edges GROUP BY dst) g
        ON g.dst = a.vec_id),
    b AS (SELECT CASE WHEN deg = 0 THEN '0'
                      WHEN deg <= 2 THEN '1-2'
                      WHEN deg <= 5 THEN '3-5'
                      ELSE '6+' END AS bucket,
                 deg
          FROM indeg)
    SELECT bucket, COUNT(*)::BIGINT AS n_nodes,
           ROUND(AVG(deg), 6) AS mean_indeg
    FROM b GROUP BY bucket ORDER BY bucket ASC
    """,
)
def knn_graph_hubness(spark, sf_dir):
    """Hubness diagnostic for the kNN graph: the in-degree distribution of
    `knn_join_ivf`'s 3-NN edges (how many nodes nobody points at, how many
    are hubs) — high-dimensional ANN graphs concentrate in-degree on hub
    points, which silently skews graph-walk retrieval and label
    propagation; this is the audit that detects it. One extra groupBy on
    dst over the kNN join's bounded edge set; orphans come from a
    left anti-style count against the full node list."""
    from veri_spark.operators.similarity import knn_join, take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    edges = knn_join(emb, take_centroids(emb, 8), k=3).select("src", "dst")
    indeg = (
        emb.select("vec_id")
        .join(
            edges.groupBy(F.col("dst").alias("vec_id")).agg(
                F.count(F.lit(1)).alias("deg")
            ),
            "vec_id",
            "left",
        )
        .select(F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
    )
    b = indeg.select(
        F.when(F.col("deg") == 0, "0")
        .when(F.col("deg") <= 2, "1-2")
        .when(F.col("deg") <= 5, "3-5")
        .otherwise("6+")
        .alias("bucket"),
        "deg",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.round(F.avg("deg"), 6).alias("mean_indeg"),
        )
        .orderBy(F.col("bucket").asc())
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
    One corpus explode + trigram groupBy; the rank window runs over the
    VOCABULARY aggregate, and the three curve points reuse one ranked
    frame."""
    from veri_spark.operators.dedup import doc_shingles  # noqa: F401 (grain note)

    docs = load_table(spark, sf_dir, "documents")
    from veri_spark.functions.text import tokens, word_shingles

    g = docs.select(tokens("text").alias("__toks")).select(
        F.explode(word_shingles(F.col("__toks"), 3)).alias("tri")
    )
    c = g.groupBy("tri").agg(F.count(F.lit(1)).cast("double").alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("tri").asc())
    wall = Window.partitionBy()
    r = c.select(
        "n",
        F.row_number().over(wr).alias("rk"),
        F.sum("n").over(wall).alias("tot"),
    )
    ks = spark.createDataFrame([(10,), (100,), (1000,)], "topk bigint")
    return (
        r.crossJoin(F.broadcast(ks))
        .groupBy("topk")
        .agg(
            F.round(
                F.sum(F.when(F.col("rk") <= F.col("topk"), F.col("n")).otherwise(0.0))
                / F.max("tot"),
                6,
            ).alias("coverage")
        )
        .orderBy(F.col("topk").asc())
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
    "embedding_isotropy",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    n AS (SELECT COUNT(*)::BIGINT AS cnt FROM e),
    p AS (
      SELECT a.vec_id,
             list_cosine_similarity(a.x, b.x) AS cos
      FROM e a JOIN e b
        ON b.vec_id = (a.vec_id + 7919) % (SELECT cnt FROM n)
       AND a.vec_id != b.vec_id)
    SELECT ROUND(AVG(cos), 6) AS mean_cos,
           ROUND(STDDEV_POP(cos), 6) AS std_cos,
           COUNT(*)::BIGINT AS n_pairs
    FROM p
    """,
)
def embedding_isotropy(spark, sf_dir):
    """Isotropy probe (Ethayarajh 2019's anisotropy measure, deterministic
    form): mean cosine between each vector and a fixed pseudo-random
    partner (vec_id + 7919 mod N — a full-cycle pairing since 7919 is
    prime, so every vector appears exactly once on each side; no RNG, so
    both engines pair identically). Mean cosine near 0 = isotropic
    embedding space; large positive = the common-direction anisotropy
    that quietly inflates every cosine similarity the engine serves. One
    self equi-join on the derived key — a 1:1 join, not a pair explosion."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("x"))
    cnt = e.count()
    a = e.select(F.col("vec_id"), F.col("x").alias("xa"),
                 ((F.col("vec_id") + 7919) % cnt).alias("pk"))
    b = e.select(F.col("vec_id").alias("pk"), F.col("x").alias("xb"))

    def cos(u, v):
        dot = F.aggregate(F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t)
        nu = F.sqrt(F.aggregate(F.transform(u, lambda x: x * x), F.lit(0.0), lambda acc, t: acc + t))
        nv = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, t: acc + t))
        return dot / (nu * nv)

    p = (
        a.join(b, "pk")
        .filter(F.col("vec_id") != F.col("pk"))
        .select(cos(F.col("xa"), F.col("xb")).alias("cos"))
    )
    return p.agg(
        F.round(F.avg("cos"), 6).alias("mean_cos"),
        F.round(F.stddev_pop("cos"), 6).alias("std_cos"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
