"""Physical-layout and planner audits: completeness, skipping, compaction, shuffle sizing, join-cardinality, Z-order.

Split from plans/pipeline.py (round-10 hygiene, mirroring the round-5/6
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

from veri_spark.functions.hashing import dd_hash  # noqa: F401

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
    "data_completeness_profile",
    """
    WITH p AS (
      SELECT 'doc_id' AS col, COUNT(*)::BIGINT AS n_rows,
             COUNT(doc_id)::BIGINT AS n_filled,
             COUNT(DISTINCT doc_id)::BIGINT AS n_distinct
      FROM documents
      UNION ALL
      SELECT 'lang', COUNT(*)::BIGINT, COUNT(lang)::BIGINT,
             COUNT(DISTINCT lang)::BIGINT FROM documents
      UNION ALL
      SELECT 'n_chars', COUNT(*)::BIGINT, COUNT(n_chars)::BIGINT,
             COUNT(DISTINCT n_chars)::BIGINT FROM documents
      UNION ALL
      SELECT 'source', COUNT(*)::BIGINT, COUNT(source)::BIGINT,
             COUNT(DISTINCT source)::BIGINT FROM documents
      UNION ALL
      SELECT 'text', COUNT(*)::BIGINT, COUNT(text)::BIGINT,
             COUNT(DISTINCT text)::BIGINT FROM documents
    )
    SELECT col, n_rows, n_filled, n_distinct,
           ROUND(n_filled / n_rows, 6) AS completeness,
           ROUND(n_distinct / n_rows, 6) AS distinctness
    FROM p ORDER BY col ASC
    """,
)
def data_completeness_profile(spark, sf_dir):
    """Deequ-style column profiling of the documents table: per-column
    completeness (non-null ratio) and distinctness (exact distinct ratio)
    — the first gate any 100 TB ingest runs before heavier quality checks,
    here as one grouped pass per column unioned into a profile relation.
    Exact COUNT(DISTINCT) keeps the oracle exact; at cluster scale swap in
    approx_count_distinct (the audited HLL path, `hll_distinct_audit`)
    column-by-column — the plan shape (parallel scans, tiny union) is
    unchanged. Ratios are single divisions of identical BIGINTs."""
    docs = load_table(spark, sf_dir, "documents").persist()
    cols = ["doc_id", "lang", "n_chars", "source", "text"]
    profiles = None
    for c in cols:
        p = docs.agg(
            F.lit(c).alias("col"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count(F.col(c)).cast("bigint").alias("n_filled"),
            F.count_distinct(F.col(c)).cast("bigint").alias("n_distinct"),
        )
        profiles = p if profiles is None else profiles.unionByName(p)
    return profiles.select(
        "col",
        "n_rows",
        "n_filled",
        "n_distinct",
        F.round(F.col("n_filled") / F.col("n_rows"), 6).alias("completeness"),
        F.round(F.col("n_distinct") / F.col("n_rows"), 6).alias("distinctness"),
    ).orderBy(F.col("col").asc())


# ---------------------------------------------------------------------------
# Round-6: physical-planning audits — the queries that measure WHY layout,
# partitioning, and estimator choices matter at 100 TB (data skipping from
# sort-on-write, shuffle-partition sizing, small-file compaction, CBO join
# cardinality estimation)
# ---------------------------------------------------------------------------

@register(
    "data_skipping_audit",
    """
    WITH nat AS (
      SELECT l_shipdate,
             (row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1) // 2000
               AS chunk
      FROM lineitem),
    srt AS (
      SELECT l_shipdate,
             (row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber)
              - 1) // 2000 AS chunk
      FROM lineitem),
    natc AS (SELECT chunk, MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi
             FROM nat GROUP BY chunk),
    srtc AS (SELECT chunk, MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi
             FROM srt GROUP BY chunk),
    agg AS (
      SELECT (SELECT COUNT(*)::BIGINT FROM natc) AS n_chunks,
             (SELECT COUNT(*)::BIGINT FROM natc
               WHERE hi >= TIMESTAMP '1998-01-01 00:00:00'
                 AND lo < TIMESTAMP '1999-01-01 00:00:00') AS scan_natural,
             (SELECT COUNT(*)::BIGINT FROM srtc
               WHERE hi >= TIMESTAMP '1998-01-01 00:00:00'
                 AND lo < TIMESTAMP '1999-01-01 00:00:00') AS scan_sorted
    )
    SELECT n_chunks, scan_natural, scan_sorted,
           ROUND(scan_natural / n_chunks, 6) AS scan_frac_natural,
           ROUND(scan_sorted / n_chunks, 6) AS scan_frac_sorted
    FROM agg
    """,
)
def data_skipping_audit(spark, sf_dir):
    """Data-skipping (zone-map) audit: simulates 2,000-row file chunks under
    the table's ingest order vs a sort-on-write layout, computes per-chunk
    min/max zone maps for l_shipdate, and counts how many chunks a one-year
    range predicate must scan under each layout. This is the measurement
    behind every 'sort/Z-order your fact tables' recommendation: parquet
    row-group pruning and Delta/Iceberg file skipping both read exactly the
    chunks whose [min,max] interval intersects the predicate, so the
    scanned-fraction ratio IS the realized I/O saving at 100 TB (a date-
    sorted layout scans ~1/7th of this 7-year table for a 1-year slice; the
    ingest order scans nearly everything). Round-7: the simulated layouts
    are built with the DISTRIBUTED global rank (operators/ranking.py —
    range partition + within-range row_number + tiny offset aggregate), so
    there is NO unpartitioned window moving the table to one task
    (asserted by tests/test_plan_shapes.py); chunk ids are identical
    because the rank is the same total order. Counts are integers; the
    fractions are single divisions of identical BIGINTs."""
    from veri_spark.operators.ranking import global_row_number

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    d1 = F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    d2 = F.expr("TIMESTAMP_NTZ '1999-01-01 00:00:00'")

    def _chunks(order_cols):
        g = global_row_number(li, order_cols, rn_col="__rn")
        return (
            g.select(
                "l_shipdate",
                ((F.col("__rn") - 1) / 2000).cast("bigint").alias("chunk"),
            )
            .groupBy("chunk")
            .agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
        )

    natc = _chunks([F.col("l_orderkey"), F.col("l_linenumber")]).persist()
    srtc = _chunks(
        [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    )
    overlap = (F.col("hi") >= d1) & (F.col("lo") < d2)
    n_chunks = natc.agg(F.count(F.lit(1)).cast("bigint").alias("n_chunks"))
    scan_nat = natc.filter(overlap).agg(
        F.count(F.lit(1)).cast("bigint").alias("scan_natural")
    )
    scan_srt = srtc.filter(overlap).agg(
        F.count(F.lit(1)).cast("bigint").alias("scan_sorted")
    )
    return (
        n_chunks.crossJoin(F.broadcast(scan_nat))
        .crossJoin(F.broadcast(scan_srt))
        .select(
            "n_chunks",
            "scan_natural",
            "scan_sorted",
            F.round(F.col("scan_natural") / F.col("n_chunks"), 6).alias(
                "scan_frac_natural"
            ),
            F.round(F.col("scan_sorted") / F.col("n_chunks"), 6).alias(
                "scan_frac_sorted"
            ),
        )
    )


@register(
    "shuffle_partition_planner",
    """
    WITH est AS (
      SELECT l_orderkey,
             80 + strlen(l_returnflag) + strlen(l_linestatus)
               AS row_bytes
      FROM lineitem),
    tot AS (SELECT COUNT(*)::BIGINT AS total_rows,
                   SUM(row_bytes)::BIGINT AS total_bytes,
                   COUNT(DISTINCT l_orderkey)::BIGINT AS n_keys
            FROM est),
    keys AS (SELECT l_orderkey, COUNT(*)::BIGINT AS c FROM est GROUP BY 1),
    mx AS (SELECT MAX(c)::BIGINT AS max_key_rows FROM keys)
    SELECT t.total_rows, t.n_keys,
           t.total_bytes // 1048576 AS est_total_mb,
           GREATEST(1, CEIL(t.total_bytes / 67108864.0)::BIGINT)
             AS recommended_shuffle_partitions,
           m.max_key_rows,
           ROUND(m.max_key_rows * t.n_keys / t.total_rows, 6) AS skew_factor,
           m.max_key_rows * t.n_keys > 4 * t.total_rows AS skew_flag
    FROM tot t CROSS JOIN mx m
    """,
)
def shuffle_partition_planner(spark, sf_dir):
    """Shuffle-partition planner: derives the spark.sql.shuffle.partitions
    setting a groupBy/join on this key would actually want — estimated
    row bytes from the schema (8 bytes per fixed-width column + measured
    varchar lengths) summed to a total, divided by the 64 MB-per-partition
    target that keeps a partition comfortably in executor memory — plus
    the skew screen that decides whether AQE skew-join splitting or
    salting (`skewed_agg_salted`) is needed first: skew_factor is the
    hottest key's row count over the mean rows-per-key, flagged above 4x.
    At 100 TB you run exactly this ONE cheap pass before the expensive
    shuffle, instead of discovering a 2 TB partition at stage runtime.
    All outputs are integer arithmetic except skew_factor — one division
    of identical BIGINTs (max*n_keys / total)."""
    li = load_table(spark, sf_dir, "lineitem")
    est = li.select(
        "l_orderkey",
        (
            80
            + F.octet_length("l_returnflag")
            + F.octet_length("l_linestatus")
        ).alias("row_bytes"),
    )
    tot = est.agg(
        F.count(F.lit(1)).cast("bigint").alias("total_rows"),
        F.sum("row_bytes").cast("bigint").alias("total_bytes"),
        F.count_distinct("l_orderkey").cast("bigint").alias("n_keys"),
    )
    mx = (
        est.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.max("c").cast("bigint").alias("max_key_rows"))
    )
    return tot.crossJoin(F.broadcast(mx)).select(
        "total_rows",
        "n_keys",
        F.expr("total_bytes div 1048576").alias("est_total_mb"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.col("total_bytes") / 67108864.0).cast("bigint"),
        ).alias("recommended_shuffle_partitions"),
        "max_key_rows",
        F.round(
            F.col("max_key_rows") * F.col("n_keys") / F.col("total_rows"), 6
        ).alias("skew_factor"),
        (
            F.col("max_key_rows") * F.col("n_keys") > 4 * F.col("total_rows")
        ).alias("skew_flag"),
    )


@register(
    "file_compaction_planner",
    """
    WITH d AS (
      SELECT source, doc_id, strlen(text)::BIGINT AS b FROM documents),
    c AS (
      SELECT source, b,
             (SUM(b) OVER (PARTITION BY source ORDER BY doc_id ASC) - b)
               // 16384 AS file_id
      FROM d),
    f AS (SELECT source, file_id, COUNT(*)::BIGINT AS docs_in_file,
                 SUM(b)::BIGINT AS file_bytes
          FROM c GROUP BY source, file_id)
    SELECT source,
           COUNT(*)::BIGINT AS n_files,
           SUM(docs_in_file)::BIGINT AS n_docs,
           SUM(file_bytes)::BIGINT AS total_bytes,
           ROUND(SUM(file_bytes) / (COUNT(*) * 16384), 6) AS avg_fill
    FROM f GROUP BY source ORDER BY source ASC
    """,
)
def file_compaction_planner(spark, sf_dir):
    """Small-file compaction planner: packs each source's documents into
    16 KB target files by running-byte-offset binning (the streaming-order
    first-fit that compaction jobs like Delta OPTIMIZE / Iceberg rewrite
    actually execute: no global bin packing, just cumulative offset //
    target within each partition), then reports files, bytes, and realized
    fill factor per source. The small-files problem is THE silent 100 TB
    killer — a million 100 KB files turn a scan into a metadata storm —
    and this one window-pass plan is the cheap audit that sizes the
    rewrite before launching it. The running sum partitions by source and
    orders by doc_id (deterministic in both engines); everything is
    integer arithmetic except avg_fill — one division of identical
    BIGINTs."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source", "doc_id", F.octet_length("text").cast("bigint").alias("b")
    )
    w = Window.partitionBy("source").orderBy(F.col("doc_id").asc())
    c = d.select(
        "source",
        "b",
        F.expr(
            "(sum(b) OVER (PARTITION BY source ORDER BY doc_id ASC) - b)"
            " div 16384"
        ).alias("file_id"),
    )
    f = c.groupBy("source", "file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_in_file"),
        F.sum("b").cast("bigint").alias("file_bytes"),
    )
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("docs_in_file").cast("bigint").alias("n_docs"),
            F.sum("file_bytes").cast("bigint").alias("total_bytes"),
            F.round(
                F.sum("file_bytes") / (F.count(F.lit(1)) * 16384), 6
            ).alias("avg_fill"),
        )
        .orderBy(F.col("source").asc())
    )


@register(
    "join_cardinality_estimate_audit",
    """
    WITH a AS (SELECT user_id, COUNT(*)::BIGINT AS c FROM events
               WHERE event_type = 'click' GROUP BY user_id),
    b AS (SELECT user_id, COUNT(*)::BIGINT AS c FROM events
          WHERE event_type = 'view' GROUP BY user_id),
    ex AS (SELECT SUM(a.c * b.c)::BIGINT AS exact_rows
           FROM a JOIN b ON a.user_id = b.user_id),
    st AS (SELECT (SELECT SUM(c)::BIGINT FROM a) AS n_left,
                  (SELECT SUM(c)::BIGINT FROM b) AS n_right,
                  (SELECT COUNT(*)::BIGINT FROM a) AS d_left,
                  (SELECT COUNT(*)::BIGINT FROM b) AS d_right)
    SELECT s.n_left, s.n_right, s.d_left, s.d_right, e.exact_rows,
           (s.n_left * s.n_right) // GREATEST(s.d_left, s.d_right) AS est_rows,
           ROUND(((s.n_left * s.n_right) // GREATEST(s.d_left, s.d_right)
                  - e.exact_rows) / e.exact_rows, 6) AS rel_err
    FROM st s CROSS JOIN ex e
    """,
)
def join_cardinality_estimate_audit(spark, sf_dir):
    """Join-cardinality estimator audit: the textbook CBO formula
    |A|*|B| / max(ndv_A, ndv_B) (uniform-frequency, containment
    assumption — what Catalyst's cost-based optimizer and every
    System-R descendant uses to pick join order and strategy) measured
    against the EXACT M:N join size sum_k cA(k)*cB(k) for the
    clicks-joins-views self-join on user_id. The estimator's error on
    real skewed keys is exactly why AQE re-plans from runtime statistics;
    this audit quantifies it from two cheap grouped passes without
    materializing the join. Everything is integer arithmetic (integer-div
    estimate, as CBO row counts are); rel_err is one division of
    identical BIGINTs."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ca"))
    )
    b = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    )
    ex = a.join(b, "user_id").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("exact_rows")
    )
    st = (
        a.agg(
            F.sum("ca").cast("bigint").alias("n_left"),
            F.count(F.lit(1)).cast("bigint").alias("d_left"),
        )
        .crossJoin(
            F.broadcast(
                b.agg(
                    F.sum("cb").cast("bigint").alias("n_right"),
                    F.count(F.lit(1)).cast("bigint").alias("d_right"),
                )
            )
        )
    )
    est = F.expr("(n_left * n_right) div greatest(d_left, d_right)")
    return st.crossJoin(F.broadcast(ex)).select(
        "n_left",
        "n_right",
        "d_left",
        "d_right",
        "exact_rows",
        est.alias("est_rows"),
        F.round(
            (est - F.col("exact_rows")) / F.col("exact_rows"), 6
        ).alias("rel_err"),
    )


@register(
    "zorder_multicol_audit",
    """
    WITH b AS (
      SELECT l_orderkey, l_linenumber,
             ntile(256) OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber)
               - 1 AS xb,
             ntile(256) OVER (ORDER BY l_partkey, l_orderkey, l_linenumber)
               - 1 AS yb
      FROM lineitem),
    m AS (SELECT xb, yb, ((((xb >> 0) & 1) << 0) + (((yb >> 0) & 1) << 1)) + ((((xb >> 1) & 1) << 2) + (((yb >> 1) & 1) << 3)) + ((((xb >> 2) & 1) << 4) + (((yb >> 2) & 1) << 5)) + ((((xb >> 3) & 1) << 6) + (((yb >> 3) & 1) << 7)) + ((((xb >> 4) & 1) << 8) + (((yb >> 4) & 1) << 9)) + ((((xb >> 5) & 1) << 10) + (((yb >> 5) & 1) << 11)) + ((((xb >> 6) & 1) << 12) + (((yb >> 6) & 1) << 13)) + ((((xb >> 7) & 1) << 14) + (((yb >> 7) & 1) << 15)) AS morton FROM b),
    s1 AS (SELECT xb, yb,
                  (row_number() OVER (ORDER BY xb, yb, morton) - 1) // 2000
                    AS chunk
           FROM m),
    s2 AS (SELECT xb, yb,
                  (row_number() OVER (ORDER BY morton, xb, yb) - 1) // 2000
                    AS chunk
           FROM m),
    c1 AS (SELECT chunk, MIN(xb) AS xlo, MAX(xb) AS xhi,
                  MIN(yb) AS ylo, MAX(yb) AS yhi FROM s1 GROUP BY chunk),
    c2 AS (SELECT chunk, MIN(xb) AS xlo, MAX(xb) AS xhi,
                  MIN(yb) AS ylo, MAX(yb) AS yhi FROM s2 GROUP BY chunk),
    agg AS (
      SELECT (SELECT COUNT(*)::BIGINT FROM c1) AS n_chunks,
             (SELECT COUNT(*)::BIGINT FROM c1
               WHERE xhi >= 192 AND xlo <= 255 AND yhi >= 0 AND ylo <= 63)
               AS scan_single_sort,
             (SELECT COUNT(*)::BIGINT FROM c2
               WHERE xhi >= 192 AND xlo <= 255 AND yhi >= 0 AND ylo <= 63)
               AS scan_zorder
    )
    SELECT n_chunks, scan_single_sort, scan_zorder,
           ROUND(scan_single_sort / n_chunks, 6) AS scan_frac_single,
           ROUND(scan_zorder / n_chunks, 6) AS scan_frac_zorder
    FROM agg
    """,
)
def zorder_multicol_audit(spark, sf_dir):
    """Z-order (Morton-interleaved) layout audit, the multi-column sequel
    to `data_skipping_audit`: rank l_shipdate and l_partkey into 256
    buckets each (deterministic ntile with full tie-break order),
    interleave their 8 bits into a 16-bit Morton code, and compare
    zone-map pruning for a CONJUNCTIVE two-column predicate (last quarter
    of time AND first quarter of parts) between a lexicographic
    (time-major) sort and the Z-order sort. A single-column sort prunes
    perfectly on its leading key and not at all on the second — Z-order
    trades a little pruning on each dimension for pruning on BOTH, which
    is why Delta/Iceberg OPTIMIZE ZORDER exists. Bucket-space predicates
    keep the audit scale-free; everything is integer arithmetic except
    the two scan fractions — single divisions of identical BIGINTs. The
    Morton expression is a plain shift/mask chain, engine-portable and
    whole-stage-codegen friendly.

    Round-7: all four formerly-global windows (two ntiles, two chunk
    row_numbers) now run on the DISTRIBUTED global rank
    (operators/ranking.py): ntile(256) is reconstructed bit-for-bit from
    (rank, total count) with the SQL-standard bucket formula, and chunk
    ids from the rank directly — no unpartitioned WindowExec in the plan
    (asserted by tests/test_plan_shapes.py). Chunk-stat determinism under
    sort-key ties is positional (see ranking.py docstring): tied rows are
    value-identical, so every chunk's min/max envelope is unchanged by
    which tied row takes which rank."""
    from veri_spark.operators.ranking import global_row_number, ntile_from_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_partkey", "l_orderkey", "l_linenumber"
    )
    n1 = li.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    gx = global_row_number(
        li, ["l_shipdate", "l_orderkey", "l_linenumber"], rn_col="__rx"
    )
    gxy = global_row_number(
        gx, ["l_partkey", "l_orderkey", "l_linenumber"], rn_col="__ry"
    )
    b = gxy.crossJoin(F.broadcast(n1)).select(
        (ntile_from_rank(F.col("__rx"), F.col("__n"), 256) - 1).alias("xb"),
        (ntile_from_rank(F.col("__ry"), F.col("__n"), 256) - 1).alias("yb"),
    )
    m = b.select("xb", "yb", F.expr("((((xb >> 0) & 1) << 0) + (((yb >> 0) & 1) << 1)) + ((((xb >> 1) & 1) << 2) + (((yb >> 1) & 1) << 3)) + ((((xb >> 2) & 1) << 4) + (((yb >> 2) & 1) << 5)) + ((((xb >> 3) & 1) << 6) + (((yb >> 3) & 1) << 7)) + ((((xb >> 4) & 1) << 8) + (((yb >> 4) & 1) << 9)) + ((((xb >> 5) & 1) << 10) + (((yb >> 5) & 1) << 11)) + ((((xb >> 6) & 1) << 12) + (((yb >> 6) & 1) << 13)) + ((((xb >> 7) & 1) << 14) + (((yb >> 7) & 1) << 15))").alias("morton"))
    # Round-14 (guide §1.2): both chunk layouts below re-rank the SAME
    # (xb, yb, morton) frame — whose own lineage is the two expensive
    # distributed global-rank passes — so without materialization the
    # double-rank ran once per layout (before-plan: 35 Exchanges).
    # The frame is three small ints per lineitem row; compute it once.
    m = m.localCheckpoint(eager=True)

    def _chunks(order_cols):
        g = global_row_number(m, order_cols, rn_col="__rn")
        return (
            g.select(
                "xb", "yb",
                ((F.col("__rn") - 1) / 2000).cast("bigint").alias("chunk"),
            )
            .groupBy("chunk")
            .agg(
                F.min("xb").alias("xlo"), F.max("xb").alias("xhi"),
                F.min("yb").alias("ylo"), F.max("yb").alias("yhi"),
            )
        )

    # c1 feeds two result branches (n_chunks + scan_single_sort); an
    # eager checkpoint of the ~chunk-count-sized frame pays its rank pass
    # exactly once where the old racing .persist() could pay it per branch
    c1 = _chunks(["xb", "yb", "morton"]).localCheckpoint(eager=True)
    c2 = _chunks(["morton", "xb", "yb"])
    hit = (
        (F.col("xhi") >= 192) & (F.col("xlo") <= 255)
        & (F.col("yhi") >= 0) & (F.col("ylo") <= 63)
    )
    n_chunks = c1.agg(F.count(F.lit(1)).cast("bigint").alias("n_chunks"))
    s1 = c1.filter(hit).agg(
        F.count(F.lit(1)).cast("bigint").alias("scan_single_sort")
    )
    s2 = c2.filter(hit).agg(
        F.count(F.lit(1)).cast("bigint").alias("scan_zorder")
    )
    return (
        n_chunks.crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .select(
            "n_chunks",
            "scan_single_sort",
            "scan_zorder",
            F.round(F.col("scan_single_sort") / F.col("n_chunks"), 6).alias(
                "scan_frac_single"
            ),
            F.round(F.col("scan_zorder") / F.col("n_chunks"), 6).alias(
                "scan_frac_zorder"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round-6: supervised feature-engineering ops — the transforms a training
# pipeline runs between raw tables and the model (leakage-safe encodings,
# hashed features, label construction, supervised binning)
# ---------------------------------------------------------------------------



@register(
    "priority_sample_estimator",
    f"""
    WITH e AS (SELECT event_id, value,
                      {dd_hash("event_id::VARCHAR", "'psamp'")} AS hv
               FROM events),
    q AS (SELECT event_id, value,
                 value / ((hv + 1) / 1152921504606846976.0) AS pri
          FROM e),
    top AS (SELECT event_id, value, pri,
                   ROW_NUMBER() OVER (ORDER BY pri DESC, event_id ASC)
                     AS rn
            FROM (SELECT * FROM q
                  ORDER BY pri DESC, event_id ASC LIMIT 65) z),
    tau AS (SELECT MAX(CASE WHEN rn = 65 THEN pri END) AS tau FROM top),
    est AS (SELECT SUM(CAST(round(1e6 * GREATEST(t.value, x.tau))
                       AS DECIMAL(38,0))) AS eq
            FROM top t CROSS JOIN tau x WHERE t.rn <= 64),
    tru AS (SELECT SUM(CAST(round(value * 100) AS BIGINT))::BIGINT
              AS cents FROM events)
    SELECT 64::BIGINT AS k,
           ROUND(tau.tau, 6) AS tau,
           ROUND(est.eq::DOUBLE / 1e6, 6) AS est_total,
           ROUND(tru.cents / 100.0, 6) AS true_total,
           ROUND((est.eq::DOUBLE / 1e6 - tru.cents / 100.0)
                 / (tru.cents / 100.0), 6) AS rel_error
    FROM est CROSS JOIN tau CROSS JOIN tru
    """,
)
def priority_sample_estimator(spark, sf_dir):
    """Priority sampling (Duffield-Lund-Thorup 2007) estimating the
    corpus value total from a fixed 64-item sample: each item gets
    priority q_i = w_i/u_i with a DETERMINISTIC pseudo-uniform u_i =
    (hash+1)/2^60 (the portable md5 family, so the oracle draws the
    SAME sample), the sample is the top-64 priorities, tau is the
    65th, and the estimator sum of max(w_i, tau) over the sample is
    unbiased for sum w with the provably minimal variance among
    threshold schemes -- the weighted companion to
    `sample_hash_deterministic` (uniform rows) and
    `weighted_sample_es` (A-ES gives inclusion probability; priority
    sampling gives a direct TOTAL estimator, which is what a cost
    monitor over 100 TB of per-record weights actually wants).
    Zero-weight items take priority 0 and contribute 0 -- exactly
    their weight. The top-65 rides orderBy().limit(65) (TakeOrdered:
    per-partition partial top-k + one final merge -- THE distributed
    sampling shape); the 65-row shortlist gets a bounded-frame rank;
    the 64 estimator terms are micro-quantized so the fold is exact.

    Scale: one map-only priority pass + TakeOrdered(65) + one exact
    total scan -- no shuffle wider than 65 rows anywhere."""
    ev = load_table(spark, sf_dir, "events")
    from veri_spark.functions.hashing import portable_hash64

    q = ev.select(
        "event_id",
        "value",
        (
            F.col("value")
            / (
                (portable_hash64(F.col("event_id").cast("string"), "psamp") + 1)
                / F.lit(1152921504606846976.0)
            )
        ).alias("pri"),
    )
    top = (
        q.orderBy(F.col("pri").desc(), F.col("event_id").asc())
        .limit(65)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("pri").desc(), F.col("event_id").asc())
            ),
        )
    )
    tau = top.agg(
        F.max(F.when(F.col("rn") == 65, F.col("pri"))).alias("tau")
    )
    est = (
        top.filter(F.col("rn") <= 64)
        .crossJoin(F.broadcast(tau))
        .agg(
            F.sum(
                F.round(
                    F.lit(1e6) * F.greatest(F.col("value"), F.col("tau"))
                ).cast("decimal(38,0)")
            ).alias("eq")
        )
    )
    tru = ev.agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    j = est.crossJoin(F.broadcast(tau)).crossJoin(F.broadcast(tru))
    estd = F.col("eq").cast("double") / F.lit(1e6)
    trud = F.col("cents") / F.lit(100.0)
    return j.select(
        F.lit(64).cast("bigint").alias("k"),
        F.round(F.col("tau"), 6).alias("tau"),
        F.round(estd, 6).alias("est_total"),
        F.round(trud, 6).alias("true_total"),
        F.round((estd - trud) / trud, 6).alias("rel_error"),
    )
