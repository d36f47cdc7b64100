"""KNN / ANN search, kNN join, re-ranking, and index audits (K1-K13, K2 variants).

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



# -- K10 GroupScoreFuncName: the proto DECLARES a pluggable group-reduce
# (veriservice.proto:35) that the reference never reads (its aggregator
# hardcodes One() = sum | sum/n^2, data/aggregator.go:155-180). SURVEY
# section 2.7 commits to implementing the DECLARED semantics: each reduce
# below is one oracle-paired query through the same group_reduce operator
# (operators/search.py), differing only in config.group_score_func. All
# four share the plan shape of `knn_group_scored`: map-only scoring, one
# partitioned-window top-3 per label, one 4-group aggregate, bounded
# final top-5 — the group sums span exactly 3 doubles, so the 6-dp
# rounded score is stable across engine fold orders (the knn_group_scored
# precedent, green since round 1).

def _dd_group_reduce_sql(score_expr: str) -> str:
    return f"""
    WITH s AS (
      SELECT label, vec_id,
             LEAST(GREATEST(list_cosine_similarity(embedding::DOUBLE[], {_Q0}), -1.0), 1.0) AS sc
      FROM embeddings
    ), r AS (
      SELECT label, vec_id, sc,
             row_number() OVER (PARTITION BY label ORDER BY sc DESC, vec_id ASC) AS rn
      FROM s
    ), l AS (SELECT * FROM r WHERE rn <= 3)
    SELECT label, arg_min(vec_id, rn) AS vec_id,
           ROUND({score_expr}, 6) AS group_score,
           COUNT(*) AS group_size
    FROM l GROUP BY label
    ORDER BY {score_expr} DESC, label ASC LIMIT 5
    """


def _group_reduce_query(spark, sf_dir, func: str):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    cfg = S.SearchConfig(
        score_func="CosineSimilarity",
        group_limit=3,
        result_limit=5,
        group_score_func=func,
    )
    scored = S.score_corpus(emb, q, cfg, vector_col="embedding")
    out = S.group_reduce(scored, cfg, group_col="label", id_cols=["vec_id"])
    return out.select(
        "label",
        "vec_id",
        F.round("group_score", 6).alias("group_score"),
        "group_size",
    )


@register("knn_group_reduce_sum", _dd_group_reduce_sql("SUM(sc)"))
def knn_group_reduce_sum(spark, sf_dir):
    """K10 GroupScoreFuncName='sum': group score = plain score sum (what
    the reference's One() does for higher-is-better scores, here selected
    EXPLICITLY through the declared knob)."""
    return _group_reduce_query(spark, sf_dir, "sum")


@register(
    "knn_group_reduce_mean", _dd_group_reduce_sql("SUM(sc) / COUNT(*)")
)
def knn_group_reduce_mean(spark, sf_dir):
    """K10 GroupScoreFuncName='mean': size-normalized group score — the
    reduce that stops 3-member groups from outranking 1-member groups on
    volume alone. SUM/COUNT in both engines (not AVG) so the division is
    the same single operation."""
    return _group_reduce_query(spark, sf_dir, "mean")


@register("knn_group_reduce_best", _dd_group_reduce_sql("MAX(sc)"))
def knn_group_reduce_best(spark, sf_dir):
    """K10 GroupScoreFuncName='best': group score = the representative's
    own score (max for higher-is-better) — rank groups purely by their
    best member; order-insensitive, exact in any fold order."""
    return _group_reduce_query(spark, sf_dir, "best")


@register(
    "knn_group_reduce_sum_n2",
    _dd_group_reduce_sql("SUM(sc) / (COUNT(*) * COUNT(*))"),
)
def knn_group_reduce_sum_n2(spark, sf_dir):
    """K10 GroupScoreFuncName='sum_over_n2': the reference One() formula
    for lower-is-better scores, applied EXPLICITLY to a higher-is-better
    score — a strong small-group preference (penalizes group mass
    quadratically), selectable only through the declared knob."""
    return _group_reduce_query(spark, sf_dir, "sum_over_n2")


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
        # plain distributed topk (TakeOrderedAndProject), NOT a window
        # keyed on the literal query_id — Catalyst constant-folds a
        # foldable partition spec away, turning that window into a
        # single-partition global sort (round-7 review finding); ranks
        # are not needed here, only membership
        d = V.euclidean_distance(F.col("embedding"), qvec)
        scored = df.select("vec_id", d.alias("score"))
        return topk(
            scored, "score", 10, higher_is_better=False, tie_cols=["vec_id"]
        ).select(F.lit(vid).alias("query_id"), "vec_id")

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
      FROM a p JOIN a q
        ON p.label = q.label AND p.centroid_id = q.centroid_id
       AND p.vec_id != q.vec_id
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
    blocked on LABEL ∩ IVF-CELL: at 100 TB an unblocked within-label join
    is N²/L pairs (a class-wide self-join — the round-4 scale-killer this
    replaces), so positives take the same ANN-bucket trade hard-negative
    miners already make — the nearest SAME-label neighbor outside the
    anchor's cell is missed (pos_dist is an over-estimate, so some truly
    hard anchors can rank harder than they are; none rank easier), and an
    anchor whose cell holds no same-label partner drops out of the
    worklist entirely. Same trade, same blocking key, both sides; no
    unblocked corpus self-join anywhere."""
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
        a.select("centroid_id", "label", F.col("vec_id").alias("va"), F.col("x").alias("xa"))
        .join(
            a.select("centroid_id", "label", F.col("vec_id").alias("vb"), F.col("x").alias("xb")),
            ["centroid_id", "label"],
        )
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



@register(
    "ann_ivf_rerank",
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
      SELECT enc.vec_id, SUM({_dd_subdist('q.qe', 'cb.e', 'enc.j')}) AS adc
      FROM enc JOIN cb ON enc.c = cb.c CROSS JOIN q
      GROUP BY enc.vec_id
    ),
    shortlist AS (
      SELECT vec_id, adc FROM (
        SELECT vec_id, adc,
               row_number() OVER (ORDER BY adc ASC, vec_id ASC) AS arn
        FROM adc) WHERE arn <= 50
    ),
    exact AS (
      SELECT s.vec_id, s.adc,
             list_distance(e.embedding::DOUBLE[], q.qe) AS ed
      FROM shortlist s JOIN embeddings e USING (vec_id) CROSS JOIN q
    )
    SELECT vec_id, ROUND(ed, 6) AS score, ROUND(adc, 6) AS adc_score, rnk
    FROM (SELECT vec_id, ed, adc,
                 row_number() OVER (ORDER BY ed ASC, vec_id ASC) AS rnk
          FROM exact)
    WHERE rnk <= 10
    """,
)
def ann_ivf_rerank(spark, sf_dir):
    """Two-stage serving retrieval — the production ANN pattern the other
    ann_* entries compose into: stage 1 retrieves a 50-candidate
    shortlist with IVF-PQ (probe 2 of 8 cells, ADC on m-byte codes — the
    cheap, compressed, recall-oriented stage), stage 2 re-ranks ONLY the
    shortlist with exact full-precision euclidean distance (the
    precision-oriented stage that erases PQ quantization error from the
    final ordering). Per final answer both scores are emitted so the
    quantization gap is observable.

    Scale shape: stage 1 is the map-only IVF-PQ plan (codebooks/LUT as
    literals, partition-pruned probe, bounded top-50); stage 2 joins the
    50-row shortlist back to the corpus BROADCAST — the full-vector fetch
    touches only probed partitions map-side, then a 50-row sort. The
    expensive exact math runs on 50 rows, not the corpus, no matter the
    corpus size."""
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
    shortlist = ivf_pq_search(assigned, cents, q, books, n=50, nprobe=2).select(
        "vec_id", F.col("score").alias("adc")
    )
    exact = (
        emb.join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            "adc",
            V.euclidean_distance(F.col("embedding"), q).alias("ed"),
        )
    )
    w = Window.orderBy(F.col("ed").asc(), F.col("vec_id").asc())
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "vec_id",
            F.round("ed", 6).alias("score"),
            F.round("adc", 6).alias("adc_score"),
            "rnk",
        )
    )


@register(
    "knn_label_accuracy",
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
    pr AS (
      SELECT ev.vec_id, ev.label AS true_label, tr.label AS nbr_label,
             row_number() OVER (PARTITION BY ev.vec_id
                                ORDER BY list_distance(ev.x, tr.x) ASC,
                                         tr.vec_id ASC) AS rank
      FROM a ev JOIN a tr
        ON ev.centroid_id = tr.centroid_id AND tr.vec_id % 10 != 0
      WHERE ev.vec_id % 10 = 0
    ),
    votes AS (
      SELECT vec_id, true_label, nbr_label, COUNT(*)::BIGINT AS nv
      FROM pr WHERE rank <= 5 GROUP BY 1, 2, 3
    ),
    win AS (
      SELECT vec_id, true_label, nbr_label AS pred_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY nv DESC, nbr_label ASC) AS wr
      FROM votes
    )
    SELECT true_label AS label, COUNT(*)::BIGINT AS n_eval,
           SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)::BIGINT
             AS n_correct,
           ROUND(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS accuracy
    FROM win WHERE wr = 1
    GROUP BY true_label
    ORDER BY true_label ASC
    """,
)
def knn_label_accuracy(spark, sf_dir):
    """Embedding-quality eval as a kNN classifier: hold out every 10th
    vector, predict its label by majority vote of its 5 nearest
    same-IVF-cell training neighbors, report per-label accuracy — the
    label-consistency probe that tells you whether an embedding space is
    good enough to drive label propagation / auto-labeling, without
    training anything. The neighbor search is the same LABEL-FREE
    IVF-cell-blocked join as `knn_join_ivf` (map-only literal-centroid
    assignment, one equi-join on centroid_id, WindowGroupLimit top-5);
    majority voting is two bounded window ranks. Eval points whose cell
    has no training rows drop out (the documented IVF recall trade).
    Vote ties break on the smaller label — deterministic in both
    engines."""
    from veri_spark.operators.similarity import ivf_assign, take_centroids
    from veri_spark.functions.vector import euclidean_distance_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 0
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("x")
    )
    a = ivf_assign(e, take_centroids(emb, 8), id_col="vec_id", vector_col="x")
    ev = a.filter(F.col("vec_id") % 10 == 0).select(
        "centroid_id",
        F.col("vec_id").alias("eval_id"),
        F.col("label").alias("true_label"),
        F.col("x").alias("xa"),
    )
    tr = a.filter(F.col("vec_id") % 10 != 0).select(
        "centroid_id",
        F.col("vec_id").alias("train_id"),
        F.col("label").alias("nbr_label"),
        F.col("x").alias("xb"),
    )
    dist = euclidean_distance_fixed(F.col("xa"), F.col("xb"), dim)
    w = Window.partitionBy("eval_id").orderBy(dist.asc(), F.col("train_id").asc())
    pr = (
        ev.join(tr, "centroid_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    votes = pr.groupBy("eval_id", "true_label", "nbr_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("nv")
    )
    ww = Window.partitionBy("eval_id").orderBy(
        F.col("nv").desc(), F.col("nbr_label").asc()
    )
    win = (
        votes.withColumn("wr", F.row_number().over(ww))
        .filter(F.col("wr") == 1)
        .select("true_label", F.col("nbr_label").alias("pred_label"))
    )
    correct = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return (
        win.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum(correct).cast("bigint").alias("n_correct"),
            F.round(
                F.sum(correct).cast("double") / F.count(F.lit(1)), 6
            ).alias("accuracy"),
        )
        .orderBy(F.col("label").asc())
    )


@register(
    "label_noise_candidates",
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
    pr AS (
      SELECT p.vec_id, p.label, q.label AS nbr_label,
             row_number() OVER (PARTITION BY p.vec_id
                                ORDER BY list_distance(p.x, q.x) ASC,
                                         q.vec_id ASC) AS rank
      FROM a p JOIN a q
        ON p.centroid_id = q.centroid_id AND p.vec_id != q.vec_id
    ),
    agg AS (
      SELECT vec_id, ANY_VALUE(label) AS label,
             SUM(CASE WHEN nbr_label = label THEN 1 ELSE 0 END)::BIGINT
               AS n_agree,
             COUNT(*)::BIGINT AS n_nbrs
      FROM pr WHERE rank <= 5 GROUP BY vec_id
    )
    SELECT vec_id, label, n_agree, n_nbrs,
           ROUND(n_agree::DOUBLE / n_nbrs, 6) AS agreement
    FROM agg
    ORDER BY n_agree::DOUBLE / n_nbrs ASC, vec_id ASC
    LIMIT 20
    """,
)
def label_noise_candidates(spark, sf_dir):
    """Noisy-label mining (confident-learning style): the 20 vectors whose
    5 nearest same-cell neighbors agree LEAST with their own label — the
    re-annotation worklist you generate before training on a labeled
    corpus, and the per-example complement of `knn_label_accuracy`'s
    aggregate score. Neighbor search is the IVF-cell-blocked self-join
    (map-only literal-centroid assign, one equi-join on centroid_id,
    bounded top-5 per vector via WindowGroupLimit); agreement is one
    aggregate over the bounded neighbor set. Ordering is on the
    UNROUNDED integer ratio with a vec_id tie-break, so the worklist
    boundary is deterministic. Vectors alone in their cell drop out
    (no neighbors — the IVF trade, same as the classifier eval)."""
    from veri_spark.operators.similarity import ivf_assign, take_centroids
    from veri_spark.functions.vector import euclidean_distance_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 0
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("x")
    )
    a = ivf_assign(e, take_centroids(emb, 8), id_col="vec_id", vector_col="x")
    p = a.select(
        "centroid_id",
        F.col("vec_id").alias("pid"),
        F.col("label").alias("plabel"),
        F.col("x").alias("xa"),
    )
    q = a.select(
        "centroid_id",
        F.col("vec_id").alias("qid"),
        F.col("label").alias("nbr_label"),
        F.col("x").alias("xb"),
    )
    dist = euclidean_distance_fixed(F.col("xa"), F.col("xb"), dim)
    w = Window.partitionBy("pid").orderBy(dist.asc(), F.col("qid").asc())
    pr = (
        p.join(q, "centroid_id")
        .filter(F.col("pid") != F.col("qid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    agree = F.sum(
        F.when(F.col("nbr_label") == F.col("plabel"), 1).otherwise(0)
    ).cast("bigint")
    agg = pr.groupBy(F.col("pid").alias("vec_id")).agg(
        F.max("plabel").alias("label"),
        agree.alias("n_agree"),
        F.count(F.lit(1)).cast("bigint").alias("n_nbrs"),
    )
    ratio = F.col("n_agree").cast("double") / F.col("n_nbrs")
    return (
        agg.orderBy(ratio.asc(), F.col("vec_id").asc())
        .limit(20)
        .select(
            "vec_id", "label", "n_agree", "n_nbrs", F.round(ratio, 6).alias("agreement")
        )
    )


@register(
    "hybrid_rrf_fusion",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    cosr AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY LEAST(GREATEST(list_cosine_similarity(
                 embedding::DOUBLE[], (SELECT qe FROM q)), -1.0), 1.0) DESC,
               vec_id ASC) AS r
      FROM embeddings),
    dotr AS (
      SELECT e.vec_id,
             row_number() OVER (
               ORDER BY list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> (e.embedding::DOUBLE[])[i] * q.qe[i])) DESC,
               e.vec_id ASC) AS r
      FROM embeddings e CROSS JOIN q),
    fused AS (
      SELECT COALESCE(c.vec_id, d.vec_id) AS vec_id,
             1.0 / (60 + COALESCE(c.r, 1000000))
             + 1.0 / (60 + COALESCE(d.r, 1000000)) AS rrf
      FROM (SELECT * FROM cosr WHERE r <= 50) c
      FULL OUTER JOIN (SELECT * FROM dotr WHERE r <= 50) d
        ON c.vec_id = d.vec_id)
    SELECT vec_id, ROUND(rrf, 6) AS rrf_score
    FROM fused
    ORDER BY rrf DESC, vec_id ASC
    LIMIT 10
    """,
)
def hybrid_rrf_fusion(spark, sf_dir):
    """Hybrid-retrieval rank fusion: Reciprocal Rank Fusion (k=60) of two
    retrievers' top-50 lists — cosine (direction) and raw dot product
    (direction x magnitude) — the standard way serving stacks combine
    lexical+dense or multi-metric rankings WITHOUT score calibration
    (RRF needs only ranks, so incomparable score scales fuse cleanly;
    Cormack et al., SIGIR 2009). Each ranking is a map-only scoring
    pass + bounded top-50; fusion is a full-outer join of two 50-row
    lists with absent-rank contribution pinned by a large sentinel
    (1/(60+1e6) ~ 0 but EXACT in both engines, so the fused doubles are
    bit-identical — no epsilon games). At 100 TB each leg is whatever
    index serves it (IVF-PQ, BM25 postings); fusion cost never grows
    past the shortlists."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    x = F.col("embedding").cast("array<double>")

    def shortlist(score, name):
        w = Window.orderBy(F.col("__s").desc(), F.col("vec_id").asc())
        return (
            emb.select("vec_id", score.alias("__s"))
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 50)
            .select("vec_id", F.col("r").alias(name))
        )

    cosr = shortlist(V.cosine_similarity(x, q), "rc")
    dotr = shortlist(V.dot_product(x, q), "rd")
    sentinel = F.lit(1000000)
    fused = (
        cosr.join(dotr, "vec_id", "full_outer")
        .select(
            "vec_id",
            (
                1.0 / (60 + F.coalesce(F.col("rc"), sentinel))
                + 1.0 / (60 + F.coalesce(F.col("rd"), sentinel))
            ).alias("rrf"),
        )
    )
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("rrf", 6).alias("rrf_score"))
    )


@register(
    "knn_diversity_capped",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT vec_id, label,
             LEAST(GREATEST(list_cosine_similarity(
               embedding::DOUBLE[], (SELECT qe FROM q)), -1.0), 1.0) AS cos
      FROM embeddings),
    r AS (
      SELECT vec_id, label, cos,
             row_number() OVER (PARTITION BY label
                                ORDER BY cos DESC, vec_id ASC) AS lr
      FROM s)
    SELECT vec_id, label, ROUND(cos, 6) AS score
    FROM r WHERE lr <= 2
    ORDER BY cos DESC, vec_id ASC
    LIMIT 10
    """,
)
def knn_diversity_capped(spark, sf_dir):
    """Constrained top-k serving: the 10 best cosine matches with AT MOST
    2 results per label — the category-diversity cap every marketplace/
    news retrieval layer applies (MMR optimizes pairwise diversity at
    higher cost, `mmr_rerank`; a hard per-group cap is the cheap
    production default). One map-only scoring pass; the per-label cap
    is a WindowGroupLimit (rank <= 2 per label — Spark prunes to the
    top 2 per label BEFORE the final TakeOrdered, no global sort of
    the corpus); then the bounded global top-10. Same two-level top-k
    shape as `knn_grouped_topk` with the global limit applied AFTER
    the group cap instead of per group."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, 0)
    x = F.col("embedding").cast("array<double>")
    s = emb.select("vec_id", "label", V.cosine_similarity(x, q).alias("cos"))
    w = Window.partitionBy("label").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    capped = s.withColumn("lr", F.row_number().over(w)).filter(F.col("lr") <= 2)
    return (
        capped.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", F.round("cos", 6).alias("score"))
    )



@register(
    "knn_reciprocal_pairs",
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
    ), e3 AS (SELECT src, dst, dist, rank FROM rk WHERE rank <= 3)
    SELECT a.src, a.dst,
           a.rank::BIGINT AS rank_ab, b.rank::BIGINT AS rank_ba,
           ROUND(a.dist, 6) AS dist
    FROM e3 a JOIN e3 b ON a.src = b.dst AND a.dst = b.src
    WHERE a.src < a.dst
    ORDER BY a.src ASC, a.dst ASC
    """,
)
def knn_reciprocal_pairs(spark, sf_dir):
    """Reciprocal (mutual) nearest-neighbor pairs: (a, b) such that b is in
    a's top-3 AND a is in b's top-3 of the IVF-blocked kNN join — the
    strictest, most precision-heavy link criterion in the retrieval
    toolbox (RNN pairs seed agglomerative clustering and are the
    high-confidence tier of embedding dedup, far stricter than a one-way
    edge: hubs collect many in-edges but reciprocate few). Built entirely
    from the existing kNN-join edge list (operators/similarity.knn_join):
    one self-equi-join of the 3n-row edge set on the reversed (src, dst)
    key — never the corpus — so the mutual filter costs one hash join on
    an already-small frame at any scale. Both directions' ranks are
    emitted; full-id ordering."""
    from veri_spark.operators.similarity import knn_join, take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    edges = knn_join(emb, take_centroids(emb, 8), k=3).select(
        "src", "dst", "rank", "dist"
    )
    rev = edges.select(
        F.col("src").alias("r_dst"),
        F.col("dst").alias("r_src"),
        F.col("rank").alias("rank_ba"),
    )
    return (
        edges.join(
            rev,
            (F.col("src") == F.col("r_src")) & (F.col("dst") == F.col("r_dst")),
        )
        .filter(F.col("src") < F.col("dst"))
        .select(
            "src",
            "dst",
            F.col("rank").cast("bigint").alias("rank_ab"),
            F.col("rank_ba").cast("bigint").alias("rank_ba"),
            F.round("dist", 6).alias("dist"),
        )
        .orderBy(F.col("src").asc(), F.col("dst").asc())
    )


@register(
    "ivf_silhouette_audit",
    f"""
    WITH d AS (
      SELECT e.vec_id, c.centroid_id,
             list_distance(e.embedding::DOUBLE[], c.cvec) AS dist
      FROM embeddings e CROSS JOIN {_DD_CENTROIDS} c),
    r AS (SELECT vec_id, centroid_id, dist,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist ASC, centroid_id ASC)
                   AS rn
          FROM d),
    ab AS (SELECT a.vec_id, a.centroid_id, a.dist AS d1, b.dist AS d2
           FROM r a JOIN r b ON a.vec_id = b.vec_id
            AND a.rn = 1 AND b.rn = 2),
    s AS (SELECT centroid_id,
                 CAST(FLOOR(1e6 * CASE WHEN GREATEST(d1, d2) > 0
                                       THEN (d2 - d1) / GREATEST(d1, d2)
                                       ELSE 0.0 END + 0.5) AS BIGINT)
                   AS s_micro
          FROM ab)
    SELECT centroid_id, COUNT(*)::BIGINT AS n_vectors,
           CAST(round(SUM(s_micro) / (COUNT(*) * 1.0)) AS BIGINT)
             AS mean_sil_micro,
           MIN(s_micro)::BIGINT AS min_sil_micro
    FROM s GROUP BY centroid_id ORDER BY centroid_id ASC
    """,
)
def ivf_silhouette_audit(spark, sf_dir):
    """Simplified-silhouette quality audit of the IVF partition: for
    every vector, a = distance to its own centroid, b = distance to the
    runner-up centroid, s = (b-a)/max(a,b) in [0,1] — the per-cluster
    mean says how SEPARATED each inverted list is (mean near 0 = the
    cell's vectors sit on the boundary and nprobe=1 recall will be poor
    there; the per-cell floor `min_sil_micro` finds the worst-assigned
    vector). The centroid-quality companion to `ivf_balance_audit`
    (sizes) and `ann_ivf_recall_audit` (end-to-end recall): balance can
    be perfect while separation is terrible, and recall audits cost a
    full exact scan — this reads the geometry directly from one
    map-only pass.

    Scale + determinism: centroids fold into the plan as LITERALS (the
    `ivf_assign` idiom), so the nearest/runner-up pair comes from one
    array_sort over 8 in-row (distance, id) structs — map-only, ZERO
    shuffles over the corpus, then one partial-aggregated groupBy on
    the assigned cell. Distances are the same index-ordered
    sum-of-squares + correctly-rounded sqrt in both engines (the K1
    parity); s is micro-quantized per VECTOR (floor(x+0.5) on a
    provably nonnegative value), so cell means are single divisions of
    exact BIGINT sums."""
    from veri_spark.operators.similarity import take_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = take_centroids(emb, 8).collect()
    candidates = [
        F.struct(
            V.euclidean_distance(
                F.col("embedding"), [float(x) for x in r["centroid_vec"]]
            ).alias("d"),
            F.lit(r["centroid_id"]).alias("cid"),
        )
        for r in cents
    ]
    arr = F.array_sort(F.array(*candidates))
    d1 = arr[0].getField("d")
    d2 = arr[1].getField("d")
    s_micro = F.floor(
        F.lit(1e6)
        * F.when(
            F.greatest(d1, d2) > 0, (d2 - d1) / F.greatest(d1, d2)
        ).otherwise(F.lit(0.0))
        + F.lit(0.5)
    ).cast("bigint")
    per = emb.select(
        arr[0].getField("cid").alias("centroid_id"),
        s_micro.alias("s_micro"),
    )
    return (
        per.groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(
                F.sum("s_micro") / (F.count(F.lit(1)) * F.lit(1.0))
            )
            .cast("bigint")
            .alias("mean_sil_micro"),
            F.min("s_micro").cast("bigint").alias("min_sil_micro"),
        )
        .orderBy(F.col("centroid_id").asc())
    )


@register(
    "knn_distance_concentration",
    """
    WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      WHERE CAST('0x' || substr(md5('conc|' || vec_id::VARCHAR), 1, 15)
                 AS BIGINT) % 4 = 0),
    p AS (SELECT CAST(FLOOR(1e6 * list_distance(a.e, b.e) + 0.5) AS BIGINT)
                   AS d_micro
          FROM s a JOIN s b ON a.vec_id < b.vec_id),
    agg AS (SELECT COUNT(*)::BIGINT AS n_pairs,
                   SUM(d_micro)::BIGINT AS s1,
                   SUM(CAST(d_micro AS DECIMAL(38,0)) * d_micro) AS s2,
                   MIN(d_micro)::BIGINT AS d_min,
                   MAX(d_micro)::BIGINT AS d_max
            FROM p)
    SELECT n_pairs, d_min, d_max,
           CAST(round(s1 * 1.0 / n_pairs) AS BIGINT) AS mean_micro,
           CAST(round(sqrt((n_pairs * 1.0 * s2::DOUBLE - s1::DOUBLE * s1)
                           / (n_pairs * 1.0 * n_pairs))) AS BIGINT)
             AS std_micro,
           CASE WHEN d_min > 0
                THEN ROUND((d_max - d_min) * 1.0 / d_min, 6)
                ELSE NULL END AS relative_contrast
    FROM agg
    """,
)
def knn_distance_concentration(spark, sf_dir):
    """Distance-concentration audit (Beyer et al., 'when is nearest
    neighbor meaningful'): over a deterministic 25% hash-sample of the
    embedding corpus, the coefficient of variation and the relative
    contrast (d_max - d_min)/d_min of all pairwise euclidean distances.
    As dimensionality effectively grows, distances concentrate
    (std/mean -> 0, contrast -> 0) and EVERY index — IVF, LSH, PQ —
    degrades toward brute force; this is the go/no-go diagnostic to run
    before investing in index tuning, next to `embedding_isotropy`
    (which probes directional spread, not distance spread).

    Scale + determinism: the sample is a pure hash function of vec_id
    (no RNG), so the pair set is reproducible; the modulus is the
    production knob — raise it with corpus size so the sampled COUNT
    (not fraction) stays ~constant and the pair quadratic stays bounded
    (concentration is a property of the distribution; a few hundred
    vectors measure it). Each distance is
    micro-quantized PER PAIR (floor(x+0.5) on the nonnegative
    correctly-rounded distance), so moments come from exact BIGINT /
    DECIMAL(38) power sums — no float accumulates across rows; mean,
    std, and contrast are fixed-order double expressions at the end.
    The contrast is guarded with d_min > 0 mirrored in both engines
    (round-8 advisor finding): a sample containing two exact-duplicate
    embeddings — the corpus HAS exact dups, that's why the dedup family
    exists — makes d_min 0, and x/0 semantics diverge cross-engine
    (DuckDB inf vs Spark ANSI throw); NULL states 'contrast undefined:
    duplicates present' instead of breaking the gate."""
    from veri_spark.functions.hashing import portable_hash64

    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.filter(
        portable_hash64(F.col("vec_id").cast("string"), seed="conc") % 4
        == 0
    ).select("vec_id", "embedding")
    a = s.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = s.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    p = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        F.floor(
            F.lit(1e6)
            * V.euclidean_distance(F.col("ea"), F.col("eb"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("d_micro")
    )
    agg = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("d_micro").cast("bigint").alias("s1"),
        F.sum(F.col("d_micro").cast("decimal(38,0)") * F.col("d_micro")).alias(
            "s2"
        ),
        F.min("d_micro").cast("bigint").alias("d_min"),
        F.max("d_micro").cast("bigint").alias("d_max"),
    )
    return agg.select(
        "n_pairs",
        "d_min",
        "d_max",
        F.round(F.col("s1") * F.lit(1.0) / F.col("n_pairs"))
        .cast("bigint")
        .alias("mean_micro"),
        F.round(
            F.sqrt(
                (
                    F.col("n_pairs") * F.lit(1.0) * F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1")
                )
                / (F.col("n_pairs") * F.lit(1.0) * F.col("n_pairs"))
            )
        )
        .cast("bigint")
        .alias("std_micro"),
        F.when(
            F.col("d_min") > 0,
            F.round(
                (F.col("d_max") - F.col("d_min"))
                * F.lit(1.0)
                / F.col("d_min"),
                6,
            ),
        ).alias("relative_contrast"),
    )
