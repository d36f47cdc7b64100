"""The END-TO-END training-data curation pipeline as ONE composed query
(round 14, r13 verdict task 4): clean/normalize -> exact -> SimHash ->
MinHash -> semantic (SemDeDup) dedup tiers -> decontamination against a
held-out benchmark's shingles -> Gopher quality gate -> mixture
temperature reweight (applied as a deterministic hash-threshold sampler)
-> sequence packing, emitting the per-stage survivorship ledger
(docs/chars/tokens in and out per stage) a corpus curator actually
ships.

Every stage already exists as a standalone oracle-paired query
(`dedup_tiered_pipeline`, `semantic_dedup_semdedup`,
`decontamination_overlap`, `gopher_quality_flags`,
`mixture_temperature_shares`, `pack_sequences`); this module proves the
stages COMPOSE without re-reading the corpus per tier: the raw
projection of `documents` is scanned once into a persisted frame, and
each tier consumes the persisted output of the previous tier — the
expensive signature/pair machinery only ever runs on survivors, which is
the whole point of ordering the tiers cheap-to-expensive. Stage rules
are verbatim the standalone queries' rules (same hashes, same integer
thresholds), so the per-stage yields reconcile exactly with the
standalone outputs (tests/test_round14_curation.py re-derives each
stage's drop set independently, incl. a pure-Python SemDeDup and
mixture-sampler recomputation).

Scale shape at 100 TB: one corpus scan feeds tier 0; the exact tier is
a fingerprint groupBy; SimHash/MinHash tiers are the banded joins
(linear in survivors, never all-pairs); SemDeDup is cell-blocked
(sum |cell|^2 with k growing with the corpus); decontamination probes a
broadcast benchmark shingle set; Gopher is in-row arithmetic; the
mixture rates are a |langs|-row broadcast; packing windows per source
shard. Nothing in the composition adds a shuffle the standalone stages
did not already have, and the survivor frames BETWEEN tiers carry only
fixed-width columns (doc_id, source, lang, nc, ntok + the not-yet-
consumed artifacts) — since round 15 the corpus text never flows past
the raw projection: every stage decision (md5 fingerprint, SimHash,
Gopher counters, shingles) is a per-doc function of text computed once
in the artifact pass, and ONE shared shingle stream feeds both the
MinHash tier and decontamination (guide §8).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from veri_spark.functions.hashing import portable_hash64
from veri_spark.functions.text import EN_STOPWORDS, EN_STOPWORDS_SQL, tokens
from veri_spark.plans._base import _minhash_seed_values, register
from veri_spark.sources.catalog import load_table

#: stage order of the composed pipeline (ledger stage_id = list index)
CURATION_STAGES = [
    "clean",
    "exact_dedup",
    "simhash_dedup",
    "minhash_dedup",
    "semantic_dedup",
    "decontaminate",
    "gopher_quality",
    "mixture_sample",
    "pack",
]


def curation_stage_frames(spark, sf_dir) -> dict:
    """Build every stage frame of the composed pipeline; returns
    ``{"raw": df, "s0": df, ..., "s7": df, "packed": df}`` where ``sK``
    is the survivor frame AFTER stage K (stage 8, packing, drops
    nothing — ``packed`` adds the chunk assignment). Shared by the
    registered ledger query and the reconciliation tests, so the frames
    the tests audit are the frames the query aggregates."""
    from veri_spark.operators.dedup import (
        doc_shingles,
        minhash_candidate_pairs,
        simhash32_with_token_stats,
        simhash_hamming_pairs,
    )
    from veri_spark.operators.similarity import kmeans_micro_assign

    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus scan: every tier (and the benchmark shingle set) derives
    # from this persisted projection — no re-scan of `documents` per tier.
    # Round-14 optimization (guide §1.2 — don't recompute what a filter
    # chain preserves): the per-doc char count `nc` and token count `ntok`
    # are computed HERE, once, and carried through every tier — each tier
    # only ever filters rows, never rewrites text, so the ledger stats,
    # the Gopher word count, the mixture token mass and the packing
    # lengths all read the carried integers instead of re-splitting the
    # text (the before-shape tokenized the full surviving corpus once per
    # stage — ~10 tokenization passes per run; at 100 TB that is the
    # difference between one corpus tokenize and ten).
    raw = docs.select(
        "doc_id", "source", "lang", "text",
        F.length("text").cast("bigint").alias("nc"),
        F.size(tokens("text")).cast("bigint").alias("ntok"),
    ).persist()

    # Round 15 (guide §8 — decide on light rows, move heavy bytes once):
    # every stage DECISION is a per-doc function of text (exact md5
    # fingerprint, 32-bit SimHash, Gopher counters, the shingle set), so
    # they are all computed in ONE artifact pass here and the stage
    # checkpoints carry only fixed-width columns from then on. The old
    # shape checkpointed the corpus TEXT through all eight stages — at
    # 100 TB that is eight corpus rewrites whose bytes never influence
    # anything downstream. Text is touched exactly twice after raw: the
    # benchmark shingle set (20 docs of raw) and nowhere else; the
    # shared shingle stream below is the one corpus explode feeding both
    # the MinHash tier and decontamination. `fan_parallel` spreads the
    # artifact pass when the scan arrives in fewer splits than cores (a
    # structural no-op at scale, see plans/_base.py).
    from veri_spark.plans._base import fan_parallel

    s0f = fan_parallel(raw.filter(F.length(F.trim("text")) > 0))
    scalars = s0f.select(
        "doc_id", "source", "lang", "nc", "ntok",
        F.md5(F.lower(F.trim("text"))).alias("fp"),
    )
    # (doc_id, simhash, wchars, sw) — ONE token explode/groupBy computes
    # the SimHash bit sums AND the Gopher counters (identical integer
    # sums to the per-row HOF forms, see the operator docstring); joined
    # doc-grain with shuffle_hash pinned (a node-grain broadcast would
    # die at scale, the plans/graph_metrics.py hazard)
    art = simhash32_with_token_stats(s0f)
    s0 = scalars.join(art.hint("shuffle_hash"), "doc_id").localCheckpoint()

    # stage 1: exact dedup — md5 of normalized text (the carried fp),
    # keep lowest doc_id (dedup_tiered_pipeline tier 1). min-over-window
    # == the old groupBy(fp).min + self-join keeper selection, one
    # corpus pass instead of two.
    s1 = (
        s0.withColumn(
            "keeper", F.min("doc_id").over(Window.partitionBy("fp"))
        )
        .filter(F.col("doc_id") == F.col("keeper"))
        .drop("fp", "keeper")
        .localCheckpoint()
    )

    # stage 2: SimHash byte-banding at Hamming <= 3, drop the larger id
    # of each near-dup pair (tier 2) — banding runs on the CARRIED
    # signatures (computed once at the artifact pass; a pure per-doc
    # function of text, so the pair set is identical)
    drop2 = (
        simhash_hamming_pairs(
            s1, max_hamming=3, sigs_df=s1.select("doc_id", "simhash")
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s2 = s1.join(drop2, "doc_id", "left_anti").drop("simhash").localCheckpoint()

    # the shared shingle stream: ONE corpus explode (over the cleaned
    # docs) serving BOTH the MinHash tier and decontamination; each
    # consumer semi-join-restricts it to its survivor set, which yields
    # exactly the per-stage doc_shingles() it replaces
    sh0 = doc_shingles(s0f, parallelism=16).persist()

    # stage 3: MinHash-banded candidates verified at trigram Jaccard
    # >= 0.5 as the integer condition 3i >= |A|+|B| (tier 3)
    sh = sh0.join(s2.select("doc_id"), "doc_id", "left_semi").persist()
    cand3 = minhash_candidate_pairs(
        s2, num_hashes=16, bands=4, shingles=sh
    )
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
            F.broadcast(
                sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
            ),
            "doc_b",
        )
        .filter(3 * F.col("i") >= F.col("na") + F.col("nb"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s3 = s2.join(drop3, "doc_id", "left_anti").localCheckpoint()

    # stage 4: SemDeDup on the SURVIVORS' embeddings — the codebook (16
    # lowest-id seed centroids) is a fixed artifact of the embeddings
    # table, assignment/cosine are restricted to embedded survivors;
    # docs without an embedding pass through (semantic_dedup_semdedup's
    # exact-integer methodology, run on the tier-3 frame)
    emb = load_table(spark, sf_dir, "embeddings")
    xm = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda v: F.floor(F.lit(1000000.0) * v + F.lit(0.5)).cast("bigint"),
    )
    base = emb.select("vec_id", xm.alias("xm"))
    seeds = [
        (int(r["vec_id"]), [int(v) for v in r["xm"]])
        for r in base.filter(F.col("vec_id") < 16).collect()
    ]
    emb_in = emb.join(
        s3.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    assigned = kmeans_micro_assign(emb_in, seeds).select(
        "vec_id", F.col("centroid_id").alias("cell")
    )
    frame = (
        base.join(assigned, "vec_id")
        .select(
            "vec_id",
            "xm",
            "cell",
            F.aggregate(
                "xm", F.lit(0).cast("bigint"), lambda acc, v: acc + v * v
            ).alias("nq"),
        )
    )
    a = frame.select(
        F.col("vec_id").alias("ia"), "cell",
        F.col("xm").alias("xa"), F.col("nq").alias("na"),
    )
    b = frame.select(
        F.col("vec_id").alias("ib"), "cell",
        F.col("xm").alias("xb"), F.col("nq").alias("nb"),
    )
    dotq = F.aggregate(
        F.zip_with("xa", "xb", lambda p, q: p * q),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    cos = dotq.cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    drop4 = (
        a.join(b, "cell")
        .filter(F.col("ia") < F.col("ib"))
        .filter(cos >= F.lit(0.42))
        .select(F.col("ib").alias("doc_id"))
        .distinct()
    )
    s4 = s3.join(drop4, "doc_id", "left_anti").localCheckpoint()

    # stage 5: decontamination — the held-out benchmark stand-in (docs
    # 0-19 of the RAW corpus, decontamination_overlap's convention) never
    # trains, and any survivor sharing >= 3 distinct 3-gram shingles
    # with its shingle set is dropped as contaminated
    bench_sh = (
        doc_shingles(raw.filter(F.col("doc_id") < 20), parallelism=None)
        .select("shingle")
        .distinct()
    )
    flagged = (
        sh0.join(
            s4.filter(F.col("doc_id") >= 20).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
        .select("doc_id")
    )
    s5 = (
        s4.filter(F.col("doc_id") >= 20)
        .join(flagged, "doc_id", "left_anti")
        .localCheckpoint()
    )

    # stage 6: Gopher rule gate (gopher_quality_flags' integer rules):
    # word count in [20, 90], mean word length in [4.2, 4.8] as the
    # cross-multiplication chars*10 BETWEEN 42*wc AND 48*wc, >= 2 core
    # stopwords. All three counters (ntok == wc, wchars, sw) are carried
    # from the round-15 artifact pass — the gate is now a pure row
    # filter, no re-tokenization of the surviving corpus.
    s6 = (
        s5.filter(
            F.col("ntok").between(20, 90)
            & (F.col("wchars") * 10 >= 42 * F.col("ntok"))
            & (F.col("wchars") * 10 <= 48 * F.col("ntok"))
            & (F.col("sw") >= 2)
        )
        .drop("wchars", "sw")
        .localCheckpoint()
    )

    # stage 7: mixture temperature reweight applied as a DETERMINISTIC
    # sampler — per-lang token shares on the survivors, flattened with
    # alpha = 0.7 (mixture_temperature_shares' math), and each lang's
    # sample_factor quantized to a keep rate in 1000 hash slots
    # (portable key-hash thresholding, the mixture_weighted_sample
    # idiom). Factors > 1 (tail-language upsampling) clamp to keep-all:
    # physical repetition is the training loader's job, the ledger
    # records the kept mass.
    lm = s6.groupBy("lang").agg(
        F.sum("ntok").cast("bigint").alias("n_tokens")
    )
    tt = lm.agg(F.sum("n_tokens").cast("double").alias("tot"))
    pp = lm.crossJoin(F.broadcast(tt)).select(
        "lang",
        (F.col("n_tokens") / F.col("tot")).alias("raw_share"),
        F.pow(F.col("n_tokens") / F.col("tot"), 0.7).alias("w"),
    )
    zz = pp.agg(F.sum("w").alias("z"))
    rate = pp.crossJoin(F.broadcast(zz)).select(
        "lang",
        F.least(
            F.lit(1000).cast("bigint"),
            F.floor(
                F.lit(1000.0) * (F.col("w") / F.col("z")) / F.col("raw_share")
            ).cast("bigint"),
        ).alias("permille"),
    )
    slot = portable_hash64(F.col("doc_id").cast("string")) % 1000
    s7 = (
        s6.join(F.broadcast(rate), "lang")
        .filter(slot < F.col("permille"))
        .drop("permille")
        .localCheckpoint()
    )

    # stage 8: pack_sequences' greedy 1024-token chunks (+1 separator per
    # doc) per source shard, deterministic doc_id order — drops nothing,
    # the ledger records the chunk count
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        s7.select(
            "doc_id", "source", F.col("ntok").alias("n_tokens"),
        )
        .withColumn(
            "cum_before",
            F.coalesce(F.sum(F.col("n_tokens") + 1).over(w), F.lit(0)),
        )
        .withColumn(
            "chunk_id", F.floor(F.col("cum_before") / 1024).cast("bigint")
        )
    )
    return {
        "raw": raw,
        "s0": s0, "s1": s1, "s2": s2, "s3": s3,
        "s4": s4, "s5": s5, "s6": s6, "s7": s7,
        "packed": packed,
    }


def _curation_sql() -> str:
    """DuckDB oracle: the identical nine-stage composition as one CTE
    chain — each tier's CTE selects FROM the previous tier's CTE, rules
    verbatim from the standalone stage oracles."""
    sh3 = (
        "unnest(list_distinct(list_transform("
        "range(1, greatest(len(ws) - 1, 1)),"
        " i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))"
    )
    return f"""
    WITH raw AS MATERIALIZED (SELECT doc_id, source, lang, text,
                        string_split(text, ' ') AS ws,
                        strlen(text)::BIGINT AS nc
                 FROM documents),
    s0 AS MATERIALIZED (SELECT * FROM raw WHERE strlen(trim(text)) > 0),
    k1 AS (SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS keeper
           FROM s0 GROUP BY 1),
    s1 AS MATERIALIZED (SELECT s0.* FROM s0 JOIN k1 ON md5(lower(trim(s0.text))) = k1.fp
           WHERE s0.doc_id = k1.keeper),
    t2 AS (SELECT doc_id, unnest(ws) AS tok FROM s1),
    h2 AS (SELECT doc_id,
                  CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
           FROM t2),
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
    drop2 AS (SELECT DISTINCT c.doc_id
              FROM bands2 a JOIN bands2 c
                ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
              WHERE bit_count(xor(a.simhash, c.simhash)) <= 3),
    s2 AS MATERIALIZED (SELECT * FROM s1
           WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
    sh3 AS MATERIALIZED (SELECT doc_id, {sh3} AS shingle FROM s2),
    seeds(seed, a, b) AS (VALUES {{_SEEDS}}),
    hashed AS (SELECT doc_id,
                      CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT)
                        % 2147483647 AS h31
               FROM sh3),
    sig3 AS (SELECT doc_id, seed, MIN((a * h31 + b) % 2147483647) AS h
             FROM hashed CROSS JOIN seeds GROUP BY doc_id, seed),
    bands3 AS (SELECT doc_id, seed // 4 AS band,
                      string_agg(h::VARCHAR, ',' ORDER BY seed) AS band_key
               FROM sig3 GROUP BY doc_id, seed // 4),
    cand3 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands3 a JOIN bands3 b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id),
    sz3 AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM sh3 GROUP BY doc_id),
    inter3 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      COUNT(*)::BIGINT AS i
               FROM sh3 a JOIN sh3 b ON a.shingle = b.shingle
                AND a.doc_id < b.doc_id
               JOIN cand3 c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
               GROUP BY 1, 2),
    drop3 AS (SELECT DISTINCT i.doc_b AS doc_id
              FROM inter3 i
              JOIN sz3 sa ON sa.doc_id = i.doc_a
              JOIN sz3 sb ON sb.doc_id = i.doc_b
              WHERE 3 * i.i >= sa.n + sb.n),
    s3 AS MATERIALIZED (SELECT * FROM s2
           WHERE doc_id NOT IN (SELECT doc_id FROM drop3)),
    x AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                 CAST(FLOOR(1e6 * unnest(embedding)::DOUBLE + 0.5)
                      AS BIGINT) AS q
          FROM embeddings),
    cseeds AS (SELECT vec_id AS cid, pos, q FROM x WHERE vec_id < 16),
    xin AS MATERIALIZED (SELECT x.* FROM x JOIN s3 ON s3.doc_id = x.vec_id),
    d4 AS (SELECT xin.vec_id, s.cid,
                  SUM((xin.q - s.q) * (xin.q - s.q)) AS dist
           FROM xin JOIN cseeds s USING (pos) GROUP BY 1, 2),
    asg AS (SELECT vec_id, cid AS cell FROM d4
            QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cid) = 1),
    nq AS (SELECT vec_id, SUM(q * q) AS nq FROM xin GROUP BY vec_id),
    p4 AS (SELECT aa.vec_id AS ia, bb.vec_id AS ib, SUM(xa.q * xb.q) AS dotq
           FROM asg aa JOIN asg bb
             ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
           JOIN xin xa ON xa.vec_id = aa.vec_id
           JOIN xin xb ON xb.vec_id = bb.vec_id AND xb.pos = xa.pos
           GROUP BY 1, 2),
    drop4 AS (SELECT DISTINCT ib AS doc_id
              FROM p4 JOIN nq na ON na.vec_id = p4.ia
                     JOIN nq nb ON nb.vec_id = p4.ib
              WHERE dotq::DOUBLE / (sqrt(na.nq::DOUBLE)
                                    * sqrt(nb.nq::DOUBLE)) >= 0.42),
    s4 AS MATERIALIZED (SELECT * FROM s3
           WHERE doc_id NOT IN (SELECT doc_id FROM drop4)),
    benchsh AS MATERIALIZED (SELECT DISTINCT {sh3} AS shingle
                FROM raw WHERE doc_id < 20),
    sh5 AS (SELECT doc_id, {sh3} AS shingle FROM s4 WHERE doc_id >= 20),
    flag5 AS (SELECT c.doc_id FROM sh5 c JOIN benchsh b USING (shingle)
              GROUP BY c.doc_id HAVING COUNT(*) >= 3),
    s5 AS MATERIALIZED (SELECT * FROM s4
           WHERE doc_id >= 20
             AND doc_id NOT IN (SELECT doc_id FROM flag5)),
    g6 AS (SELECT doc_id, len(ws)::BIGINT AS wc,
                  list_sum(list_transform(ws, w -> strlen(w)))::BIGINT
                    AS wchars,
                  len(list_filter(ws, w -> w IN ({EN_STOPWORDS_SQL})))
                    ::BIGINT AS sw
           FROM s5),
    s6 AS MATERIALIZED (SELECT s5.* FROM s5 JOIN g6 USING (doc_id)
           WHERE wc BETWEEN 20 AND 90
             AND wchars * 10 BETWEEN 42 * wc AND 48 * wc
             AND sw >= 2),
    lm AS (SELECT lang, SUM(len(ws))::BIGINT AS n_tokens
           FROM s6 GROUP BY lang),
    tt AS (SELECT SUM(n_tokens)::DOUBLE AS tot FROM lm),
    pp AS (SELECT lang, n_tokens / tot AS raw_share,
                  (n_tokens / tot) ^ 0.7 AS w
           FROM lm, tt),
    zz AS (SELECT SUM(w) AS z FROM pp),
    rate AS (SELECT lang,
                    LEAST(1000, CAST(FLOOR(1000.0 * (w / z) / raw_share)
                                     AS BIGINT)) AS permille
             FROM pp, zz),
    s7 AS MATERIALIZED (SELECT s6.* FROM s6 JOIN rate USING (lang)
           WHERE CAST('0x' || substr(md5(s6.doc_id::VARCHAR), 1, 15)
                      AS BIGINT) % 1000 < rate.permille),
    c8 AS (SELECT doc_id, source, len(ws)::BIGINT AS n_tokens,
                  COALESCE(SUM(len(ws)::BIGINT + 1) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cum_before
           FROM s7),
    chunks AS (SELECT COUNT(*)::BIGINT AS n FROM (
               SELECT DISTINCT source, cum_before // 1024 AS ch FROM c8)),
    nall AS (SELECT COUNT(*)::BIGINT AS docs FROM raw),
    st0 AS (SELECT COUNT(*)::BIGINT AS docs,
                   COALESCE(SUM(nc), 0)::BIGINT AS chars,
                   COALESCE(SUM(len(ws)), 0)::BIGINT AS toks FROM s0),
    st1 AS (SELECT COUNT(*)::BIGINT AS docs,
                   COALESCE(SUM(nc), 0)::BIGINT AS chars,
                   COALESCE(SUM(len(ws)), 0)::BIGINT AS toks FROM s1),
    st2 AS (SELECT COUNT(*)::BIGINT AS docs,
                   COALESCE(SUM(nc), 0)::BIGINT AS chars,
                   COALESCE(SUM(len(ws)), 0)::BIGINT AS toks FROM s2),
    st3 AS (SELECT COUNT(*)::BIGINT AS docs,
                   COALESCE(SUM(nc), 0)::BIGINT AS chars,
                   COALESCE(SUM(len(ws)), 0)::BIGINT AS toks FROM s3),
    st4 AS (SELECT COUNT(*)::BIGINT AS docs,
                   COALESCE(SUM(nc), 0)::BIGINT AS chars,
                   COALESCE(SUM(len(ws)), 0)::BIGINT AS toks FROM s4),
    st5 AS (SELECT COUNT(*)::BIGINT AS docs,
                   COALESCE(SUM(nc), 0)::BIGINT AS chars,
                   COALESCE(SUM(len(ws)), 0)::BIGINT AS toks FROM s5),
    st6 AS (SELECT COUNT(*)::BIGINT AS docs,
                   COALESCE(SUM(nc), 0)::BIGINT AS chars,
                   COALESCE(SUM(len(ws)), 0)::BIGINT AS toks FROM s6),
    st7 AS (SELECT COUNT(*)::BIGINT AS docs,
                   COALESCE(SUM(nc), 0)::BIGINT AS chars,
                   COALESCE(SUM(len(ws)), 0)::BIGINT AS toks FROM s7)
    SELECT * FROM (
      SELECT 0::BIGINT AS stage_id, 'clean' AS stage,
             (SELECT docs FROM nall) AS docs_in, docs AS docs_out,
             chars AS chars_out, toks AS tokens_out, 0::BIGINT AS chunks_out
      FROM st0
      UNION ALL SELECT 1, 'exact_dedup', st0.docs, st1.docs, st1.chars,
                       st1.toks, 0 FROM st0, st1
      UNION ALL SELECT 2, 'simhash_dedup', st1.docs, st2.docs, st2.chars,
                       st2.toks, 0 FROM st1, st2
      UNION ALL SELECT 3, 'minhash_dedup', st2.docs, st3.docs, st3.chars,
                       st3.toks, 0 FROM st2, st3
      UNION ALL SELECT 4, 'semantic_dedup', st3.docs, st4.docs, st4.chars,
                       st4.toks, 0 FROM st3, st4
      UNION ALL SELECT 5, 'decontaminate', st4.docs, st5.docs, st5.chars,
                       st5.toks, 0 FROM st4, st5
      UNION ALL SELECT 6, 'gopher_quality', st5.docs, st6.docs, st6.chars,
                       st6.toks, 0 FROM st5, st6
      UNION ALL SELECT 7, 'mixture_sample', st6.docs, st7.docs, st7.chars,
                       st7.toks, 0 FROM st6, st7
      UNION ALL SELECT 8, 'pack', st7.docs, st7.docs, st7.chars, st7.toks,
                       (SELECT n FROM chunks) FROM st7)
    ORDER BY stage_id ASC
    """.replace("{_SEEDS}", _minhash_seed_values())


@register("curation_pipeline_ledger", _curation_sql())
def curation_pipeline_ledger(spark, sf_dir):
    """The composed curation pipeline's survivorship ledger: one row per
    stage with (stage_id, stage, docs_in, docs_out, chars_out,
    tokens_out, chunks_out) — docs_in of stage K is docs_out of K-1 by
    construction, chars/tokens are the surviving corpus mass after the
    stage, and the final packing row reports the 1024-token training
    chunks the surviving mix fills. See the module docstring for stage
    rules, composition discipline, and the 100 TB shape."""
    frames = curation_stage_frames(spark, sf_dir)

    # ONE stats job for all nine frames (round-14 optimization): every
    # stage frame is already materialized (eager checkpoint / persisted
    # raw), so a tagged union scans each one once and a single groupBy
    # yields (docs, chars, toks) per stage — 9 collect() actions folded
    # into 1. The sums read the CARRIED nc/ntok integers computed once at
    # the raw projection (no re-tokenization per stage). Values are
    # bit-identical: count/sum over the same rows and the same per-doc
    # integers the old per-stage aggregates recomputed.
    tagged = frames["raw"].select(
        F.lit(-1).alias("__stage"), "nc", "ntok"
    )
    for k in range(8):
        tagged = tagged.unionByName(
            frames[f"s{k}"].select(
                F.lit(k).alias("__stage"), "nc", "ntok"
            )
        )
    by_stage = {
        int(r["__stage"]): (int(r["docs"]), int(r["chars"]), int(r["toks"]))
        for r in tagged.groupBy("__stage")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.coalesce(F.sum("nc"), F.lit(0)).cast("bigint").alias("chars"),
            F.coalesce(F.sum("ntok"), F.lit(0)).cast("bigint").alias("toks"),
        )
        .collect()
    }
    # a stage that drops every doc is absent from the grouped result
    stats = [by_stage.get(k, (0, 0, 0)) for k in range(8)]
    n_all = by_stage.get(-1, (0, 0, 0))[0]
    n_chunks = (
        frames["packed"].select("source", "chunk_id").distinct().count()
    )
    rows = []
    prev_docs = n_all
    for k in range(8):
        docs, chars, toks = stats[k]
        rows.append(
            (k, CURATION_STAGES[k], prev_docs, docs, chars, toks, 0)
        )
        prev_docs = docs
    docs7, chars7, toks7 = stats[7]
    rows.append((8, "pack", docs7, docs7, chars7, toks7, n_chunks))
    return spark.createDataFrame(
        rows,
        "stage_id bigint, stage string, docs_in bigint, docs_out bigint, "
        "chars_out bigint, tokens_out bigint, chunks_out bigint",
    )
