"""Data-integrity and ingest-quality audits — the checks a warehouse runs
BEFORE expensive downstream work trusts a new load: key uniqueness,
domain/range rules, cross-table consistency, digit-distribution fraud
screens, PII pattern scans, dedup survivorship accounting, and the
broadcast-size planner that decides physical join strategy.

Everything is counting: integer sums, single divisions for display
ratios, and (where a math function would be engine-sensitive — log10 for
Benford) Python-precomputed micro-unit literals injected into BOTH
engines. First significant digits are extracted from exact integer CENTS
rendered as strings (integer-to-string is exact everywhere), never from
floating log10/power arithmetic.

Registered into ``plans._base.QUERIES``/``ORACLES`` at import like every
domain module.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from veri_spark.sources.catalog import load_table  # noqa: F401

from veri_spark.plans._base import register  # noqa: F401


@register(
    "pk_uniqueness_audit",
    """
    SELECT * FROM (
      SELECT 'customer' AS table_name, COUNT(*)::BIGINT AS n_rows,
             COUNT(DISTINCT c_custkey)::BIGINT AS n_keys,
             (COUNT(*) - COUNT(DISTINCT c_custkey))::BIGINT AS n_dup_rows
      FROM customer
      UNION ALL
      SELECT 'documents', COUNT(*)::BIGINT, COUNT(DISTINCT doc_id)::BIGINT,
             (COUNT(*) - COUNT(DISTINCT doc_id))::BIGINT FROM documents
      UNION ALL
      SELECT 'embeddings', COUNT(*)::BIGINT, COUNT(DISTINCT vec_id)::BIGINT,
             (COUNT(*) - COUNT(DISTINCT vec_id))::BIGINT FROM embeddings
      UNION ALL
      SELECT 'events', COUNT(*)::BIGINT, COUNT(DISTINCT event_id)::BIGINT,
             (COUNT(*) - COUNT(DISTINCT event_id))::BIGINT FROM events
      UNION ALL
      SELECT 'lineitem', COUNT(*)::BIGINT,
             COUNT(DISTINCT l_orderkey * 16 + l_linenumber)::BIGINT,
             (COUNT(*) - COUNT(DISTINCT l_orderkey * 16 + l_linenumber))::BIGINT
      FROM lineitem
      UNION ALL
      SELECT 'orders', COUNT(*)::BIGINT, COUNT(DISTINCT o_orderkey)::BIGINT,
             (COUNT(*) - COUNT(DISTINCT o_orderkey))::BIGINT FROM orders
      UNION ALL
      SELECT 'part', COUNT(*)::BIGINT, COUNT(DISTINCT p_partkey)::BIGINT,
             (COUNT(*) - COUNT(DISTINCT p_partkey))::BIGINT FROM part
      UNION ALL
      SELECT 'supplier', COUNT(*)::BIGINT, COUNT(DISTINCT s_suppkey)::BIGINT,
             (COUNT(*) - COUNT(DISTINCT s_suppkey))::BIGINT FROM supplier
    ) ORDER BY table_name ASC
    """,
)
def pk_uniqueness_audit(spark, sf_dir):
    """Primary-key uniqueness across every keyed table in the catalog:
    rows vs distinct keys vs duplicate surplus — the first gate on any
    load (a duplicated key silently double-counts every downstream join
    and aggregate). Each table is ONE partial-aggregated count-distinct
    pass (lineitem's composite key is packed into a single BIGINT,
    l_linenumber < 16 by TPC-H spec, so the distinct runs on one
    primitive column); the union is 8 one-row aggregates. At 100 TB the
    per-table pass is exactly this shape with the distinct swapped for a
    2-level exact count or an HLL gate (`hll_sketch_audit` prices that
    trade)."""
    tables = {
        "customer": ("customer", F.col("c_custkey")),
        "documents": ("documents", F.col("doc_id")),
        "embeddings": ("embeddings", F.col("vec_id")),
        "events": ("events", F.col("event_id")),
        "lineitem": (
            "lineitem",
            F.col("l_orderkey") * 16 + F.col("l_linenumber"),
        ),
        "orders": ("orders", F.col("o_orderkey")),
        "part": ("part", F.col("p_partkey")),
        "supplier": ("supplier", F.col("s_suppkey")),
    }
    out = None
    for name, (tbl, key) in tables.items():
        df = load_table(spark, sf_dir, tbl)
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct(key).cast("bigint").alias("n_keys"),
        ).select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "n_keys",
            (F.col("n_rows") - F.col("n_keys")).cast("bigint").alias(
                "n_dup_rows"
            ),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy(F.col("table_name").asc())


@register(
    "value_domain_violations",
    """
    WITH v AS (
      SELECT
        SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
          ::BIGINT AS quantity_range,
        SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
          ::BIGINT AS discount_range,
        SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END)
          ::BIGINT AS tax_range,
        SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
          ::BIGINT AS price_positive,
        SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)
          ::BIGINT AS returnflag_domain,
        SUM(CASE WHEN l_linestatus NOT IN ('O', 'F') THEN 1 ELSE 0 END)
          ::BIGINT AS linestatus_domain,
        SUM(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01 00:00:00'
                   OR l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
                 THEN 1 ELSE 0 END)::BIGINT AS shipdate_window
      FROM lineitem)
    SELECT 'discount_range' AS rule, discount_range AS n_violations FROM v
    UNION ALL SELECT 'linestatus_domain', linestatus_domain FROM v
    UNION ALL SELECT 'price_positive', price_positive FROM v
    UNION ALL SELECT 'quantity_range', quantity_range FROM v
    UNION ALL SELECT 'returnflag_domain', returnflag_domain FROM v
    UNION ALL SELECT 'shipdate_window', shipdate_window FROM v
    UNION ALL SELECT 'tax_range', tax_range FROM v
    ORDER BY rule ASC
    """,
)
def value_domain_violations(spark, sf_dir):
    """Domain/range rule screen over the fact table — seven TPC-H
    invariants (quantity 1..50, discount 0..0.10, tax 0..0.08, positive
    price, returnflag/linestatus enums, shipdate inside the 7-year
    window) counted in ONE scan: the rules are conditional sums inside a
    single aggregate, then the 1-row result is unpivoted to rule rows.
    This is the cheap always-on load gate — at 100 TB it rides the same
    scan as ingest statistics; a rule catalog only widens the aggregate,
    never adds a pass. All-zero counts on clean data are the point: the
    audit proves the invariants, the query shape prices it."""
    li = load_table(spark, sf_dir, "lineitem")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    d1 = F.expr("TIMESTAMP_NTZ '1992-01-01 00:00:00'")
    d2 = F.expr("TIMESTAMP_NTZ '1999-01-01 00:00:00'")
    agg = li.agg(
        cnt((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "quantity_range"
        ),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "discount_range"
        ),
        cnt((F.col("l_tax") < 0) | (F.col("l_tax") > 0.08)).alias("tax_range"),
        cnt(F.col("l_extendedprice") <= 0).alias("price_positive"),
        cnt(~F.col("l_returnflag").isin("A", "N", "R")).alias(
            "returnflag_domain"
        ),
        cnt(~F.col("l_linestatus").isin("O", "F")).alias("linestatus_domain"),
        cnt((F.col("l_shipdate") < d1) | (F.col("l_shipdate") >= d2)).alias(
            "shipdate_window"
        ),
    )
    return agg.selectExpr(
        "stack(7, "
        "'discount_range', discount_range, "
        "'linestatus_domain', linestatus_domain, "
        "'price_positive', price_positive, "
        "'quantity_range', quantity_range, "
        "'returnflag_domain', returnflag_domain, "
        "'shipdate_window', shipdate_window, "
        "'tax_range', tax_range) AS (rule, n_violations)"
    ).orderBy(F.col("rule").asc())


@register(
    "ship_lag_integrity_audit",
    """
    WITH j AS (
      SELECT datediff('day', o.o_orderdate, l.l_shipdate)::BIGINT AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT COUNT(*)::BIGINT AS n_lines,
           SUM(CASE WHEN lag_days < 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_violations,
           MIN(lag_days)::BIGINT AS min_lag_days,
           MAX(lag_days)::BIGINT AS max_lag_days,
           CAST(round(1e6 * SUM(lag_days) / COUNT(*)) AS BIGINT)
             AS mean_lag_micro_days
    FROM j
    """,
)
def ship_lag_integrity_audit(spark, sf_dir):
    """Cross-table temporal consistency: every line item must ship AFTER
    its order is placed (TPC-H generates ship lags of 1..121 days) — the
    referential-integrity sibling of `fk_integrity_audit`, checking the
    RELATIONSHIP'S semantics, not just key existence. One equi-join on
    the order key (the natural co-partitioned join at scale) feeding one
    aggregate of integer day lags; the mean is a micro-quantized single
    division of BIGINTs. A nonzero violation count here means clock skew
    or key reuse upstream — the class of bug that poisons every
    time-windowed training label downstream (`churn_labels_future_window`
    et al.)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("lag_days")
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("lag_days") < 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
        F.min("lag_days").cast("bigint").alias("min_lag_days"),
        F.max("lag_days").cast("bigint").alias("max_lag_days"),
        F.round(F.lit(1e6) * F.sum("lag_days") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_lag_micro_days"),
    )


# Benford expectation log10(1 + 1/d) in micro-units, precomputed in Python
# and injected into BOTH engines (log10 is not guaranteed correctly rounded
# across engines; a 1-ulp difference would flip a rounded literal)
_BENFORD_MICRO = {d: round(1e6 * math.log10(1 + 1 / d)) for d in range(1, 10)}

_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {m}" for d, m in _BENFORD_MICRO.items())
    + " END"
)


@register(
    "benford_first_digit_audit",
    f"""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders),
    n AS (SELECT COUNT(*)::BIGINT AS total FROM c),
    g AS (SELECT digit, COUNT(*)::BIGINT AS n_obs FROM c GROUP BY digit)
    SELECT g.digit, g.n_obs,
           CAST(round(1e6 * g.n_obs / n.total) AS BIGINT) AS obs_micro,
           {_BENFORD_CASE.replace('digit', 'g.digit')} AS benford_micro
    FROM g CROSS JOIN n
    ORDER BY g.digit ASC
    """,
)
def benford_first_digit_audit(spark, sf_dir):
    """Benford's-law screen on order totals: the first-significant-digit
    distribution vs the log10(1+1/d) expectation — the classic
    fabricated-data / unit-mixup detector for monetary columns (a
    uniform first-digit profile on money is a red flag; TPC-H's
    synthetic totals are a known non-Benford fixture, which the audit
    shows rather than assumes). The digit comes from exact integer
    CENTS rendered as a string — integer-to-string is exact in every
    engine, where floor(log10(x)) arithmetic would be 1-ulp fragile at
    powers of ten. Expectations are Python-precomputed micro literals;
    observed shares are single micro-quantized divisions. One grouped
    count over the table; 9-row output."""
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
    )
    n = c.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    g = c.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    benford = F.element_at(
        F.create_map(
            *[F.lit(x) for d, m in _BENFORD_MICRO.items() for x in (d, m)]
        ),
        F.col("digit").cast("int"),
    )
    return (
        g.crossJoin(F.broadcast(n))
        .select(
            "digit",
            "n_obs",
            F.round(F.lit(1e6) * F.col("n_obs") / F.col("total"))
            .cast("bigint")
            .alias("obs_micro"),
            benford.cast("bigint").alias("benford_micro"),
        )
        .orderBy(F.col("digit").asc())
    )


_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "integer_token": r"\b\d+\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone_us": r"\b\d{3}-\d{3}-\d{4}\b",
}


@register(
    "pii_pattern_scan",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS pattern,
           SUM(CASE WHEN len(regexp_extract_all(text, '{pat}')) > 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_docs_matched,
           SUM(len(regexp_extract_all(text, '{pat}')))::BIGINT
             AS n_matches_total
    FROM documents
    """
        for name, pat in sorted(_PII_PATTERNS.items())
    )
    + "\nORDER BY pattern ASC",
)
def pii_pattern_scan(spark, sf_dir):
    """PII/leak pattern scan over the training corpus: per pattern
    (email, US phone, IPv4, plus a bare-integer control pattern that
    SHOULD fire, proving the scan runs), the count of matching documents
    and total matches — the redaction-pipeline pre-audit every
    web-scraped corpus goes through before training. Patterns are kept
    inside the RE2 ∩ Java-regex common dialect (character classes,
    bounded repetition, \\b anchors) so both engines count identically.
    One scan per pattern on the Spark side kept as one PASS total: the
    counts are conditional sums in a single aggregate (regexp_count is
    codegen'd JVM work, no Python). At 100 TB this is the scan you fuse
    with quality scoring — same pass, one more column per pattern."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = []
    for name, pat in sorted(_PII_PATTERNS.items()):
        cnt = F.regexp_count(F.col("text"), F.lit(pat))
        aggs.append(
            F.sum(F.when(cnt > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"__docs_{name}")
        )
        aggs.append(F.sum(cnt).cast("bigint").alias(f"__match_{name}"))
    one = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', __docs_{name}, __match_{name}"
        for name in sorted(_PII_PATTERNS)
    )
    return one.selectExpr(
        f"stack({len(_PII_PATTERNS)}, {stack_args})"
        " AS (pattern, n_docs_matched, n_matches_total)"
    ).orderBy(F.col("pattern").asc())


@register(
    "dedup_survivorship_by_source",
    """
    WITH h AS (
      SELECT doc_id, source, md5(text) AS th FROM documents),
    g AS (
      SELECT th, MIN(doc_id) AS survivor_id,
             arg_min(source, doc_id) AS survivor_source,
             COUNT(*)::BIGINT AS group_size
      FROM h GROUP BY th)
    SELECT survivor_source AS source,
           COUNT(*)::BIGINT AS n_groups_won,
           SUM(CASE WHEN group_size > 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_dup_groups_won,
           SUM(group_size - 1)::BIGINT AS n_dups_absorbed
    FROM g GROUP BY survivor_source
    ORDER BY source ASC
    """,
)
def dedup_survivorship_by_source(spark, sf_dir):
    """Survivorship accounting for exact dedup: after hash-grouping
    identical texts and keeping the min-doc_id canonical copy, which
    SOURCE wins the canonical slot and how many duplicates it absorbs —
    the attribution question behind every dedup policy fight ("dedup
    deleted half of source X" usually means source Y won the survivor
    slots, not that X was removed). Survivor selection is arg-min inside
    the hash groupBy (min_by on Spark — no window, no second pass);
    the rollup by winning source is a second tiny aggregate. The
    keep-lowest-id rule is the deterministic tie-break production dedup
    uses so reruns keep stable canonical ids."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", "source", F.md5(F.col("text")).alias("th"))
    g = h.groupBy("th").agg(
        F.min("doc_id").alias("survivor_id"),
        F.min_by(F.col("source"), F.col("doc_id")).alias("survivor_source"),
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
    )
    return (
        g.groupBy(F.col("survivor_source").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups_won"),
            F.sum(F.when(F.col("group_size") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_groups_won"),
            F.sum(F.col("group_size") - 1)
            .cast("bigint")
            .alias("n_dups_absorbed"),
        )
        .orderBy(F.col("source").asc())
    )


@register(
    "char_encoding_profile",
    """
    WITH m AS (
      SELECT source,
             length(text)::BIGINT AS n_chars,
             (length(text) - length(regexp_replace(text, '[^ -~]', '', 'g')))
               ::BIGINT AS n_nonprintable
      FROM documents)
    SELECT source,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_chars)::BIGINT AS n_chars,
           SUM(CASE WHEN n_nonprintable > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_docs_nonprintable,
           CAST(round(1e6 * SUM(n_nonprintable) / SUM(n_chars)) AS BIGINT)
             AS nonprintable_micro
    FROM m GROUP BY source ORDER BY source ASC
    """,
)
def char_encoding_profile(spark, sf_dir):
    """Character-encoding hygiene per source: documents and character
    mass outside printable ASCII (space..tilde) — the cheap mojibake /
    binary-contamination detector run before tokenizer training (a
    source whose nonprintable ratio jumps between crawls usually changed
    charset, not content). The count comes from length minus the length
    after deleting the printable class — both engines count codepoints
    identically on this corpus; the ratio is one micro-quantized
    division of BIGINT sums. One scan, one grouped aggregate; at 100 TB
    this fuses into the same pass as `pii_pattern_scan` and quality
    scoring."""
    docs = load_table(spark, sf_dir, "documents")
    nonp = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "[^ -~]", "")
    )
    m = docs.select(
        "source",
        F.length(F.col("text")).cast("bigint").alias("n_chars"),
        nonp.cast("bigint").alias("n_nonprintable"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum(F.when(F.col("n_nonprintable") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_nonprintable"),
            F.round(
                F.lit(1e6) * F.sum("n_nonprintable") / F.sum("n_chars")
            )
            .cast("bigint")
            .alias("nonprintable_micro"),
        )
        .orderBy(F.col("source").asc())
    )


# fixed in-memory widths for the broadcast estimate: 8 bytes per numeric /
# timestamp column + measured varchar bytes + 16 bytes per-row object
# overhead (UnsafeRow header + null bits, the ballpark Spark's own size
# estimator uses)
_BCAST_TABLES = {
    "region": (["r_name"], 1),
    "nation": (["n_name"], 2),
    "supplier": (["s_name"], 3),
    "customer": (["c_name", "c_mktsegment"], 3),
    "part": (["p_name", "p_brand", "p_type"], 3),
}


@register(
    "broadcast_threshold_planner",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{tbl}' AS table_name, COUNT(*)::BIGINT AS n_rows,
           (COUNT(*) * {16 + 8 * nfix}
            + SUM({' + '.join(f'strlen({c})' for c in strs)}))::BIGINT
             AS est_bytes,
           (COUNT(*) * {16 + 8 * nfix}
            + SUM({' + '.join(f'strlen({c})' for c in strs)}))
             < 10485760 AS broadcast_ok
    FROM {tbl}
    """
        for tbl, (strs, nfix) in sorted(_BCAST_TABLES.items())
    )
    + "\nORDER BY table_name ASC",
)
def broadcast_threshold_planner(spark, sf_dir):
    """Physical join-strategy planner: estimated in-memory size of each
    dimension table (8 bytes per fixed-width column + measured varchar
    bytes + 16-byte row overhead — the ballpark Spark's own statistics
    use) against the 10 MB autoBroadcastJoinThreshold, deciding which
    joins hash-broadcast and which must shuffle. This is the ONE cheap
    pass you run before forcing broadcast() hints at 100 TB: region /
    nation stay broadcastable at any SF (fixed cardinality), supplier /
    customer / part grow linearly and flip to shuffle joins at known
    scale points — the planner's est_bytes column IS that flip
    predictor. Integer arithmetic end-to-end (byte counts, one boolean
    compare per table); five one-row aggregates unioned."""
    out = None
    for tbl, (strs, nfix) in sorted(_BCAST_TABLES.items()):
        df = load_table(spark, sf_dir, tbl)
        size_expr = None
        for c in strs:
            e = F.octet_length(F.col(c))
            size_expr = e if size_expr is None else size_expr + e
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(size_expr).cast("bigint").alias("__str_bytes"),
        ).select(
            F.lit(tbl).alias("table_name"),
            "n_rows",
            (F.col("n_rows") * (16 + 8 * nfix) + F.col("__str_bytes"))
            .cast("bigint")
            .alias("est_bytes"),
            (
                (F.col("n_rows") * (16 + 8 * nfix) + F.col("__str_bytes"))
                < 10485760
            ).alias("broadcast_ok"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy(F.col("table_name").asc())


@register(
    "k_anonymity_audit",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*)::BIGINT AS sz
      FROM customer GROUP BY 1, 2),
    t AS (SELECT SUM(sz)::BIGINT AS total FROM g),
    ks AS (SELECT unnest([2, 5, 10]) AS k),
    s AS (
      SELECT ks.k,
             SUM(CASE WHEN g.sz < ks.k THEN g.sz ELSE 0 END)::BIGINT
               AS n_violating_rows,
             SUM(CASE WHEN g.sz < ks.k THEN 1 ELSE 0 END)::BIGINT
               AS n_violating_groups
      FROM ks CROSS JOIN g GROUP BY ks.k)
    SELECT s.k, s.n_violating_rows, s.n_violating_groups,
           CAST(round(1e6 * s.n_violating_rows / t.total) AS BIGINT)
             AS frac_rows_micro
    FROM s CROSS JOIN t
    ORDER BY s.k ASC
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity screen on the quasi-identifier pair (nation, market
    segment): rows living in QI equivalence classes smaller than k for
    k in {2, 5, 10} — the re-identification risk measure you compute
    BEFORE releasing or training on 'de-identified' records (a row alone
    in its QI class is one join away from a name). The class sizes are
    ONE grouped count; the k sweep is a 3-row broadcast against the
    class-size table (the threshold-sweep pattern), so pricing three
    policies costs one pass. Pure integer counting with one
    micro-quantized display division. At 100 TB the QI set widens and
    the class count grows, but the shape is identical — and the fix
    (generalize or suppress small classes) consumes exactly this
    query's violating-group list."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    t = g.agg(F.sum("sz").cast("bigint").alias("total"))
    ks = spark.createDataFrame([(2,), (5,), (10,)], "k int")
    s = (
        g.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("bigint")
            .alias("n_violating_rows"),
            F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_groups"),
        )
    )
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "k",
            "n_violating_rows",
            "n_violating_groups",
            F.round(F.lit(1e6) * F.col("n_violating_rows") / F.col("total"))
            .cast("bigint")
            .alias("frac_rows_micro"),
        )
        .orderBy(F.col("k").asc())
    )


@register(
    "l_diversity_audit",
    """
    WITH s AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sens
      FROM customer),
    g AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*)::BIGINT AS sz,
             COUNT(DISTINCT sens)::BIGINT AS l
      FROM s GROUP BY 1, 2)
    SELECT COUNT(*)::BIGINT AS n_groups,
           MIN(l)::BIGINT AS min_l,
           SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END)::BIGINT AS n_groups_l_lt_3,
           SUM(CASE WHEN l < 3 THEN sz ELSE 0 END)::BIGINT AS n_rows_l_lt_3
    FROM g
    """,
)
def l_diversity_audit(spark, sf_dir):
    """l-diversity companion to `k_anonymity_audit`: a QI class can be
    large (k-anonymous) yet still leak if every member shares the same
    SENSITIVE value — here the account-balance band (1000-wide buckets)
    as the sensitive attribute over the same (nation, segment) QI pair.
    Reports the minimum distinct-sensitive count per class and the
    classes/rows below l=3 (the homogeneity-attack exposure). One
    grouped count-distinct per class + one tiny rollup — the same two-
    aggregate shape at any scale; banding the sensitive value keeps the
    distinct bounded and is itself the first generalization step a
    release policy would take."""
    c = load_table(spark, sf_dir, "customer")
    s = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("sens"),
    )
    g = s.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.countDistinct("sens").cast("bigint").alias("l"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("l").cast("bigint").alias("min_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_groups_l_lt_3"),
        F.sum(F.when(F.col("l") < 3, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_l_lt_3"),
    )


# Fellegi-Sunter field weights, micro-nats. m/u are fixed model literals
# (match probability given same entity / given different entities);
# ln(m/u) and ln((1-m)/(1-u)) are precomputed in PYTHON and injected into
# both engines as integers — ln() is not correctly-rounded-guaranteed, so
# engine-side log would risk 1-ulp rank flips (the Benford/nDCG rule).
#   field          m      u      agree_w     disagree_w
#   n_chars equal  0.95   0.10   2251292     -2890372
#   n_tokens equal 0.90   0.15   1791759     -2140066
#   16-ch prefix   0.85   0.01   4442651     -1887070
#   distinct toks  0.80   0.20   1386294     -1386294
_FS_W = {
    "len": (2251292, -2890372),
    "ntok": (1791759, -2140066),
    "pre16": (4442651, -1887070),
    "utok": (1386294, -1386294),
}


@register(
    "record_linkage_fs_top_pairs",
    f"""
    WITH d AS (SELECT doc_id, source, lang, n_chars,
                      n_chars // 10 AS blk,
                      len(string_split(text, ' ')) AS ntok,
                      len(list_distinct(string_split(text, ' '))) AS utok,
                      substr(text, 1, 16) AS pre16
               FROM documents),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (CASE WHEN a.n_chars = b.n_chars
                   THEN {_FS_W['len'][0]} ELSE {_FS_W['len'][1]} END
            + CASE WHEN a.ntok = b.ntok
                   THEN {_FS_W['ntok'][0]} ELSE {_FS_W['ntok'][1]} END
            + CASE WHEN a.pre16 = b.pre16
                   THEN {_FS_W['pre16'][0]} ELSE {_FS_W['pre16'][1]} END
            + CASE WHEN a.utok = b.utok
                   THEN {_FS_W['utok'][0]} ELSE {_FS_W['utok'][1]} END
             )::BIGINT AS score_micro
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.blk = b.blk
       AND a.doc_id < b.doc_id AND a.source <> b.source)
    SELECT doc_a, doc_b, score_micro
    FROM pairs
    ORDER BY score_micro DESC, doc_a ASC, doc_b ASC
    LIMIT 20
    """,
)
def record_linkage_fs_top_pairs(spark, sf_dir):
    """Fellegi-Sunter probabilistic record linkage (the 1969 model behind
    every production entity-resolution engine): blocked candidate pairs
    scored by the sum of per-field log-likelihood weights ln(m/u) on
    agreement and ln((1-m)/(1-u)) on disagreement — here linking documents
    ACROSS sources on four cheap deterministic comparators (exact length,
    token count, 16-char prefix, distinct-token count), blocked on
    (lang, length-decade) so the quadratic pair build is bounded per block
    (never corpus-quadratic; at 100x, tighten the length block or add a
    second blocking pass — the standard FS scaling lever). Weights are
    Python-precomputed INTEGER micro-nats so the score sum is exact and
    order-insensitive; top-20 with full-id tie-breaks. The near-dup twins
    (`cross_source_duplicates`, `dedup_*`) detect copies by content hash;
    FS ranks fuzzy entity matches by an explicit probability model."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.expr("n_chars div 10").alias("blk"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ntok"),
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("utok"),
        F.substring("text", 1, 16).alias("pre16"),
    )
    a = d.select(*[F.col(c).alias(f"{c}_a") for c in d.columns])
    b = d.select(*[F.col(c).alias(f"{c}_b") for c in d.columns])

    def w(field, cond):
        wa, wd = _FS_W[field]
        return F.when(cond, F.lit(wa)).otherwise(F.lit(wd))

    pairs = (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("blk_a") == F.col("blk_b"))
            & (F.col("doc_id_a") < F.col("doc_id_b"))
            & (F.col("source_a") != F.col("source_b")),
        )
        .select(
            F.col("doc_id_a").alias("doc_a"),
            F.col("doc_id_b").alias("doc_b"),
            (
                w("len", F.col("n_chars_a") == F.col("n_chars_b"))
                + w("ntok", F.col("ntok_a") == F.col("ntok_b"))
                + w("pre16", F.col("pre16_a") == F.col("pre16_b"))
                + w("utok", F.col("utok_a") == F.col("utok_b"))
            )
            .cast("bigint")
            .alias("score_micro"),
        )
    )
    return pairs.orderBy(
        F.col("score_micro").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(20)


@register(
    "mutual_information_lang_source",
    """
    WITH cell AS (SELECT lang, source, COUNT(*)::BIGINT AS nxy
                  FROM documents GROUP BY lang, source),
    mx AS (SELECT lang, SUM(nxy)::BIGINT AS nx FROM cell GROUP BY lang),
    my AS (SELECT source, SUM(nxy)::BIGINT AS ny FROM cell GROUP BY source),
    t AS (SELECT SUM(nxy)::BIGINT AS n FROM cell),
    w AS (SELECT c.nxy,
                 CAST(floor(1e6 * ln((c.nxy * t.n)::DOUBLE
                                     / (mx.nx * my.ny)::DOUBLE) + 0.5)
                      AS BIGINT) AS w_micro
          FROM cell c JOIN mx USING (lang) JOIN my USING (source)
          CROSS JOIN t)
    SELECT t.n AS n_total,
           COUNT(*)::BIGINT AS n_cells,
           SUM(w.nxy * w.w_micro)::BIGINT AS mi_weighted_micro_nats,
           (SUM(w.nxy * w.w_micro)::DOUBLE / (t.n::DOUBLE * 1e6)) AS mi_nats
    FROM w CROSS JOIN t GROUP BY t.n
    """,
)
def mutual_information_lang_source(spark, sf_dir):
    """Mutual information between document language and source — the
    information-theoretic dependence readout next to the chi-square test
    (`lang_source_chi2`): MI = sum over cells of p(x,y) ln(p(x,y) /
    (p(x)p(y))). Near zero, sources are language-balanced; high MI means
    language is concentrated in specific sources and any per-source
    sampling skews the language mixture. The contingency table is bounded
    by the (lang x source) domain — a scale-free broadcast frame after one
    partial-aggregated corpus scan. Determinism: each cell's log-ratio is
    quantized to INTEGER micro-nats in-engine (floor(1e6*ln + 0.5), the
    WoE/Zipf idiom — ln's argument is a ratio of exact integers, identical
    in both engines), the MI numerator is an exact integer weighted sum,
    and the nat-scale value is ONE division at the end.

    Residual cross-engine risk (round-7 advisor, accepted as the existing
    WoE/Zipf idiom): ln is not guaranteed correctly rounded, so a cell
    whose 1e6*ln(ratio) lands within ~1 ulp of a .5 boundary could flip
    w_micro between engines on future data. Unlike the Benford/nDCG
    constants the argument here is data-dependent, so Python
    precomputation cannot remove the boundary; a flip is a 1-micro-nat
    wobble in one cell, caught by the hash gate rather than silent.
    Round-9: tests/test_round9_units.py measures the realized guard band
    on the committed testdata — every cell's 1e6*ln(ratio) sits > 1e-4
    from its nearest half-integer boundary, ~6 orders of magnitude
    beyond what a 1-ulp ln divergence can move it, so a flip on the
    gate's inputs is impossible, not merely unlikely."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nxy")
    )
    mx = cell.groupBy("lang").agg(F.sum("nxy").cast("bigint").alias("nx"))
    my = cell.groupBy("source").agg(F.sum("nxy").cast("bigint").alias("ny"))
    t = cell.agg(F.sum("nxy").cast("bigint").alias("n"))
    w = (
        cell.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(t))
        .select(
            "nxy",
            "n",
            F.floor(
                F.lit(1e6)
                * F.log(
                    (F.col("nxy") * F.col("n")).cast("double")
                    / (F.col("nx") * F.col("ny")).cast("double")
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("w_micro"),
        )
    )
    return w.groupBy(F.col("n").alias("n_total")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.col("nxy") * F.col("w_micro"))
        .cast("bigint")
        .alias("mi_weighted_micro_nats"),
        (
            F.sum(F.col("nxy") * F.col("w_micro")).cast("double")
            / (F.col("n").cast("double") * F.lit(1e6))
        ).alias("mi_nats"),
    )


def _ring_vnodes() -> list[tuple[int, str]]:
    """The 8-node x 8-replica consistent-hash ring as (position, node)
    literals, positions from the portable 60-bit hash of "n{j}#r{r}" —
    Python-computed once so BOTH engines consume identical ring literals
    (the shard-planner twin of the Benford/nDCG literal rule)."""
    from veri_spark.functions.hashing import portable_hash64_py

    return sorted(
        (portable_hash64_py(f"n{j}#r{r}"), f"n{j}")
        for j in range(8)
        for r in range(8)
    )


def _ring_sql_values() -> str:
    return ", ".join(f"({h}, '{n}')" for h, n in _ring_vnodes())


def _dd_hash_ring(expr: str) -> str:
    """Key-hash fragment for the ring oracle — the shared portable hash
    (functions/hashing.dd_hash), single-sourced so the key hash can never
    drift from the ring-position hashes built by portable_hash64_py."""
    from veri_spark.functions.hashing import dd_hash

    return dd_hash(expr)


def _ring_sql_list() -> str:
    return "[" + ", ".join(str(h) for h, _ in _ring_vnodes()) + "]"


@register(
    "consistent_hash_ring_balance",
    f"""
    WITH ring(vh, node) AS (VALUES {_ring_sql_values()}),
    keys AS (SELECT doc_id, {_dd_hash_ring("doc_id::VARCHAR")} AS kh
             FROM documents),
    owner AS (SELECT doc_id,
                     COALESCE(list_min(list_filter({_ring_sql_list()},
                                                   v -> v >= kh)),
                              {_ring_vnodes()[0][0]}) AS ovh
              FROM keys),
    loads AS (SELECT r.node, COUNT(*)::BIGINT AS n_keys
              FROM owner o JOIN ring r ON o.ovh = r.vh
              GROUP BY r.node),
    t AS (SELECT SUM(n_keys)::BIGINT AS total FROM loads)
    SELECT l.node, l.n_keys,
           CAST(round(1e6 * 8 * l.n_keys / t.total) AS BIGINT)
             AS load_index_micro
    FROM loads l CROSS JOIN t
    ORDER BY l.node ASC
    """,
)
def consistent_hash_ring_balance(spark, sf_dir):
    """Consistent-hashing placement balance audit: the document corpus
    hashed onto an 8-node ring with 8 virtual nodes each (successor-vnode
    ownership, wraparound to the ring minimum), reporting per-node key
    count and a load index (1e6 = perfectly even). This is the PLACEMENT
    MATH of the reference's peer-to-peer sharding (ST5/ST6 — the
    replication/gossip machinery SURVEY 4.3 assigns to the cluster
    manager in Spark): the ring itself is pure arithmetic worth keeping
    — it prices how many vnodes an even shard layout needs BEFORE any
    data moves, and it is the same successor-search every shuffle-free
    router runs. Execution: the 64-entry ring rides as a PLAN LITERAL
    (sorted array + 64-row VALUES map), ownership is a map-only
    filter/min over the literal array per key — no join against the
    corpus, one 64-row broadcast equi-join to name the owner, one
    grouped count. The load index is a single micro-quantized division.
    At 100 TB the ring grows with the cluster, not the data."""
    from veri_spark.functions.hashing import portable_hash64

    ring = _ring_vnodes()
    docs = load_table(spark, sf_dir, "documents")
    vh_arr = F.array(*[F.lit(h).cast("bigint") for h, _ in ring])
    kh = portable_hash64(F.col("doc_id").cast("string"))
    owner = docs.select(
        F.coalesce(
            F.array_min(F.filter(vh_arr, lambda v: v >= kh)),
            F.lit(ring[0][0]).cast("bigint"),
        ).alias("ovh")
    )
    ring_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(h, n) for h, n in ring], "vh bigint, node string"
        )
    )
    loads = (
        owner.join(ring_df, F.col("ovh") == F.col("vh"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    )
    t = loads.agg(F.sum("n_keys").cast("bigint").alias("total"))
    return (
        loads.crossJoin(F.broadcast(t))
        .select(
            "node",
            "n_keys",
            F.round(F.lit(1e6) * 8 * F.col("n_keys") / F.col("total"))
            .cast("bigint")
            .alias("load_index_micro"),
        )
        .orderBy(F.col("node").asc())
    )


@register(
    "roaring_bitmap_sizing_audit",
    """
    WITH m AS (SELECT DISTINCT lang, doc_id FROM documents),
    mem AS (SELECT lang, doc_id // 1024 AS cont, doc_id % 1024 AS low
            FROM m),
    runs AS (SELECT a.lang, a.cont,
                    COUNT(*)::BIGINT AS c,
                    SUM(CASE WHEN b.low IS NULL THEN 1 ELSE 0 END)::BIGINT
                      AS r
             FROM mem a LEFT JOIN mem b
               ON a.lang = b.lang AND a.cont = b.cont
              AND b.low = a.low - 1
             GROUP BY a.lang, a.cont),
    sized AS (SELECT lang, c, r,
                     2 * c AS arr_b, 128 AS bmp_b, 2 + 4 * r AS run_b,
                     CASE WHEN 2 * c <= 128 AND 2 * c <= 2 + 4 * r
                            THEN 'array'
                          WHEN 2 + 4 * r <= 128 THEN 'run'
                          ELSE 'bitmap' END AS ctype,
                     LEAST(2 * c, 128, 2 + 4 * r) AS bytes
              FROM runs)
    SELECT lang,
           SUM(c)::BIGINT AS n_ids,
           COUNT(*)::BIGINT AS n_containers,
           SUM(CASE WHEN ctype = 'array' THEN 1 ELSE 0 END)::BIGINT
             AS n_array,
           SUM(CASE WHEN ctype = 'run' THEN 1 ELSE 0 END)::BIGINT AS n_run,
           SUM(CASE WHEN ctype = 'bitmap' THEN 1 ELSE 0 END)::BIGINT
             AS n_bitmap,
           SUM(bytes)::BIGINT AS roaring_bytes,
           (8 * SUM(c))::BIGINT AS plain_bytes,
           CAST(round(1e6 * SUM(bytes) / (8 * SUM(c))) AS BIGINT)
             AS size_ratio_micro
    FROM sized GROUP BY lang ORDER BY lang ASC
    """,
)
def roaring_bitmap_sizing_audit(spark, sf_dir):
    """Roaring-bitmap sizing audit for the lang -> doc_id posting sets —
    the storage-planning decision behind every bitmap secondary index
    (Roaring: Chambi et al. 2016): each 1024-wide id container is stored
    as whichever of the three container types is smallest — a sorted
    ARRAY (2 bytes/id), a fixed BITMAP (128 bytes here, width/8), or
    RUN-LENGTH pairs (2 + 4*runs bytes) — and the audit reports the
    realized container mix, total bytes, and the compression ratio vs a
    plain 8-byte id list per posting set. (Containers are width-scaled
    from Roaring's 65536 to 1024 so this SF's id space exercises the
    array/bitmap break-even; the decision logic is the real one, with
    deterministic array < run < bitmap tie preference.) Run counting is
    one shifted self-equi-join on (set, container, low-1) — run starts
    are members whose predecessor is absent — so everything is integer
    counting on co-partitioned keys; no order-dependent scan at any
    scale."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select("lang", "doc_id").distinct()
    mem = m.select(
        "lang",
        F.expr("doc_id div 1024").alias("cont"),
        (F.col("doc_id") % 1024).alias("low"),
    )
    prev = mem.select(
        F.col("lang").alias("p_lang"),
        F.col("cont").alias("p_cont"),
        (F.col("low") + 1).alias("p_next"),
    )
    runs = (
        mem.join(
            prev,
            (F.col("lang") == F.col("p_lang"))
            & (F.col("cont") == F.col("p_cont"))
            & (F.col("low") == F.col("p_next")),
            "left",
        )
        .groupBy("lang", "cont")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum(F.when(F.col("p_next").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("r"),
        )
    )
    arr_b = 2 * F.col("c")
    run_b = 2 + 4 * F.col("r")
    sized = runs.select(
        "lang",
        "c",
        F.when((arr_b <= 128) & (arr_b <= run_b), "array")
        .when(run_b <= 128, "run")
        .otherwise("bitmap")
        .alias("ctype"),
        F.least(arr_b, F.lit(128), run_b).alias("bytes"),
    )
    return (
        sized.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_ids"),
            F.count(F.lit(1)).cast("bigint").alias("n_containers"),
            F.sum(F.when(F.col("ctype") == "array", 1).otherwise(0))
            .cast("bigint")
            .alias("n_array"),
            F.sum(F.when(F.col("ctype") == "run", 1).otherwise(0))
            .cast("bigint")
            .alias("n_run"),
            F.sum(F.when(F.col("ctype") == "bitmap", 1).otherwise(0))
            .cast("bigint")
            .alias("n_bitmap"),
            F.sum("bytes").cast("bigint").alias("roaring_bytes"),
            (F.lit(8) * F.sum("c")).cast("bigint").alias("plain_bytes"),
            F.round(F.lit(1e6) * F.sum("bytes") / (F.lit(8) * F.sum("c")))
            .cast("bigint")
            .alias("size_ratio_micro"),
        )
        .orderBy(F.col("lang").asc())
    )


def _hrw_sql_struct_list() -> str:
    """DuckDB list-of-struct literal expression for the 8 rendezvous
    weights of a document key (mirrors the Spark array-of-struct)."""
    from veri_spark.functions.hashing import dd_hash

    entries = ", ".join(
        "{'h': %s, 'n': 'n%d'}" % (dd_hash("doc_id::VARCHAR", seed=f"'n{j}'"), j)
        for j in range(8)
    )
    return "[" + entries + "]"


@register(
    "rendezvous_hash_balance",
    f"""
    WITH owner AS (
      SELECT list_max({_hrw_sql_struct_list()}).n AS node
      FROM documents),
    loads AS (SELECT node, COUNT(*)::BIGINT AS n_keys
              FROM owner GROUP BY node),
    t AS (SELECT SUM(n_keys)::BIGINT AS total FROM loads)
    SELECT l.node, l.n_keys,
           CAST(round(1e6 * 8 * l.n_keys / t.total) AS BIGINT)
             AS load_index_micro
    FROM loads l CROSS JOIN t
    ORDER BY l.node ASC
    """,
)
def rendezvous_hash_balance(spark, sf_dir):
    """Rendezvous (highest-random-weight, Thaler-Ravishankar 1998) hashing
    balance audit — the OTHER shard-placement scheme next to the vnode
    ring (`consistent_hash_ring_balance`): every key is owned by the node
    with the highest seeded hash h(node|key), which needs NO ring state,
    gives perfectly uniform expected load with no vnode tuning, at the
    cost of k hash evaluations per key. Reading the two audits together
    prices the ring's vnode count against HRW's per-key hash fan-out —
    the actual placement decision a 100 TB shard router makes. Execution
    is PURE MAP: the 8 weights per key are an array-of-structs max
    (lexicographic (hash, node), so ties — ~2^-60 — break
    deterministically by node name) folded entirely inside codegen; one
    grouped count and a single micro-quantized division follow. Per-node
    load index: 1e6 = perfectly even."""
    from veri_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    weights = F.array(
        *[
            F.struct(
                portable_hash64(key, seed=f"n{j}").alias("h"),
                F.lit(f"n{j}").alias("n"),
            )
            for j in range(8)
        ]
    )
    owner = docs.select(F.array_max(weights)["n"].alias("node"))
    loads = owner.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    t = loads.agg(F.sum("n_keys").cast("bigint").alias("total"))
    return (
        loads.crossJoin(F.broadcast(t))
        .select(
            "node",
            "n_keys",
            F.round(F.lit(1e6) * 8 * F.col("n_keys") / F.col("total"))
            .cast("bigint")
            .alias("load_index_micro"),
        )
        .orderBy(F.col("node").asc())
    )


@register(
    "columnar_encoding_audit",
    """
    WITH f AS (
      SELECT 'l_returnflag' AS col_name, COUNT(*)::BIGINT AS n,
             COUNT(DISTINCT l_returnflag)::BIGINT AS n_distinct,
             SUM(strlen(l_returnflag))::BIGINT * 8 AS plain_bits,
             (SELECT SUM(strlen(v))::BIGINT * 8 FROM
               (SELECT DISTINCT l_returnflag AS v FROM lineitem))
               AS dict_store_bits
      FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', COUNT(*)::BIGINT,
             COUNT(DISTINCT l_linestatus)::BIGINT,
             SUM(strlen(l_linestatus))::BIGINT * 8,
             (SELECT SUM(strlen(v))::BIGINT * 8 FROM
               (SELECT DISTINCT l_linestatus AS v FROM lineitem))
      FROM lineitem
      UNION ALL
      SELECT 'l_quantity', COUNT(*)::BIGINT,
             COUNT(DISTINCT CAST(l_quantity AS BIGINT))::BIGINT,
             COUNT(*)::BIGINT * 64,
             COUNT(DISTINCT CAST(l_quantity AS BIGINT))::BIGINT * 64
      FROM lineitem
      UNION ALL
      SELECT 'l_partkey', COUNT(*)::BIGINT,
             COUNT(DISTINCT l_partkey)::BIGINT,
             COUNT(*)::BIGINT * 64,
             COUNT(DISTINCT l_partkey)::BIGINT * 64
      FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', COUNT(*)::BIGINT,
             COUNT(DISTINCT l_suppkey)::BIGINT,
             COUNT(*)::BIGINT * 64,
             COUNT(DISTINCT l_suppkey)::BIGINT * 64
      FROM lineitem),
    b AS (SELECT col_name, n, n_distinct, plain_bits, dict_store_bits,
                 CASE WHEN n_distinct <= 1 THEN 0
                      ELSE LENGTH(BIN(n_distinct - 1)) END AS index_bits
          FROM f),
    d AS (SELECT col_name, n, n_distinct, index_bits, plain_bits,
                 n * index_bits + dict_store_bits AS dict_bits
          FROM b)
    SELECT col_name, n, n_distinct, index_bits, plain_bits, dict_bits,
           CAST(round(1e6 * dict_bits / plain_bits) AS BIGINT)
             AS dict_ratio_micro
    FROM d ORDER BY col_name ASC
    """,
)
def columnar_encoding_audit(spark, sf_dir):
    """Dictionary-encoding size audit for five lineitem columns — the
    sizing math behind parquet's encoding choice, answered from the data
    itself: a dictionary page stores each DISTINCT value once plus one
    ceil(log2(d))-bit index per row, so the audit compares n*index_bits
    + dict_store against the plain encoding (actual string bytes, or a
    64-bit word for numerics). dict_ratio_micro < 1e6 means dictionary
    wins (l_returnflag at 3 distinct values compresses ~40x; l_partkey
    at ~n/30 distinct barely breaks even) — the same arithmetic the
    `roaring_bitmap_sizing_audit` does for bitmap indexes, applied to
    value encoding. Index width uses LENGTH(BIN(d-1)) — exact integer
    bit math, never a float log2 that could mis-round at a power of
    two.

    Scale: five column-pruned partial-aggregated scans (one per audited
    column — each scan reads ONLY its column; a single fused scan would
    read all five), all reductions to one row each. Determinism: every
    quantity is an exact BIGINT; the ratio is one micro-quantized
    division."""
    li = load_table(spark, sf_dir, "lineitem")

    def str_col(name):
        vals = li.select(F.col(name).alias("v"))
        agg = vals.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("v").cast("bigint").alias("n_distinct"),
            (F.sum(F.octet_length("v")).cast("bigint") * 8).alias(
                "plain_bits"
            ),
        )
        dstore = (
            vals.distinct()
            .agg(
                (F.sum(F.octet_length("v")).cast("bigint") * 8).alias(
                    "dict_store_bits"
                )
            )
        )
        return agg.crossJoin(F.broadcast(dstore)).select(
            F.lit(name).alias("col_name"),
            "n",
            "n_distinct",
            "plain_bits",
            "dict_store_bits",
        )

    def num_col(name, cast_bigint=False):
        v = F.col(name).cast("bigint") if cast_bigint else F.col(name)
        return li.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(v).cast("bigint").alias("n_distinct"),
        ).select(
            F.lit(name).alias("col_name"),
            "n",
            "n_distinct",
            (F.col("n") * 64).alias("plain_bits"),
            (F.col("n_distinct") * 64).alias("dict_store_bits"),
        )

    f = (
        str_col("l_returnflag")
        .unionByName(str_col("l_linestatus"))
        .unionByName(num_col("l_quantity", cast_bigint=True))
        .unionByName(num_col("l_partkey"))
        .unionByName(num_col("l_suppkey"))
    )
    b = f.withColumn(
        "index_bits",
        F.when(F.col("n_distinct") <= 1, F.lit(0)).otherwise(
            F.length(F.bin(F.col("n_distinct") - 1))
        ).cast("bigint"),
    )
    d = b.withColumn(
        "dict_bits",
        F.col("n") * F.col("index_bits") + F.col("dict_store_bits"),
    )
    return d.select(
        "col_name",
        "n",
        "n_distinct",
        "index_bits",
        "plain_bits",
        "dict_bits",
        F.round(F.lit(1e6) * F.col("dict_bits") / F.col("plain_bits"))
        .cast("bigint")
        .alias("dict_ratio_micro"),
    ).orderBy(F.col("col_name").asc())


# chi-square(4 df) 95% critical value in micro units. Standard table
# constant (9.487729036781154); pinned within the Wilson-Hilferty
# approximation's tolerance by tests/test_round8_batch2.py.
_CHI2_95_4DF_MICRO = 9487729


@register(
    "kfold_label_balance_audit",
    f"""
    WITH f AS (
      SELECT CAST('0x' || substr(md5('fold|' || doc_id::VARCHAR), 1, 15)
                  AS BIGINT) % 5 AS fold,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    c AS (SELECT fold, COUNT(*)::BIGINT AS n_docs,
                 SUM(y)::BIGINT AS n_en
          FROM f GROUP BY fold),
    t AS (SELECT SUM(n_docs)::BIGINT AS nn, SUM(n_en)::BIGINT AS kk
          FROM c),
    x AS (SELECT c.fold, c.n_docs, c.n_en, t.nn, t.kk,
                 c.n_docs * 1.0 * t.kk / t.nn AS e1,
                 c.n_docs * 1.0 * (t.nn - t.kk) / t.nn AS e0
          FROM c CROSS JOIN t),
    q AS (SELECT fold, n_docs, n_en,
                 CAST(round(1e6 * ((n_en - e1) * (n_en - e1) / e1
                      + ((n_docs - n_en) - e0) * ((n_docs - n_en) - e0)
                        / e0)) AS BIGINT) AS contrib_micro
          FROM x),
    s AS (SELECT SUM(contrib_micro)::BIGINT AS chi2_micro FROM q)
    SELECT q.fold, q.n_docs, q.n_en,
           CAST(round(1e6 * q.n_en / q.n_docs) AS BIGINT) AS en_rate_micro,
           q.contrib_micro, s.chi2_micro,
           s.chi2_micro <= {_CHI2_95_4DF_MICRO} AS balanced_95
    FROM q CROSS JOIN s
    ORDER BY q.fold ASC
    """,
)
def kfold_label_balance_audit(spark, sf_dir):
    """Label-balance audit of a 5-fold cross-validation assignment: docs
    hash into folds (the `fingerprint_split_assign` idiom — assignment
    must be a pure function of the id, never random), and the 5x2
    chi-square tests whether the en/non-en label mix differs across
    folds more than chance allows (4 df, 95%). A hash split should ALWAYS
    pass; a failure means the fold hash correlates with the label
    pipeline (e.g. ids assigned by source, source correlated with
    language) — the audit that catches stratification bugs before they
    become noisy cross-validation variance.

    Determinism + scale: one partial-aggregated scan to 5 (n, k) BIGINT
    cells; expected counts and per-fold chi-square contributions are
    fixed sequences of correctly-rounded double ops on those integers,
    micro-quantized PER FOLD so the total is an order-insensitive
    BIGINT sum (never a cross-row float accumulation); the 95% verdict
    compares against the Python-precomputed chi-square(4) literal."""
    from veri_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        (portable_hash64(F.col("doc_id").cast("string"), seed="fold") % 5)
        .alias("fold"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    c = f.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("y").cast("bigint").alias("n_en"),
    )
    t = c.agg(
        F.sum("n_docs").cast("bigint").alias("nn"),
        F.sum("n_en").cast("bigint").alias("kk"),
    )
    x = c.crossJoin(F.broadcast(t))
    e1 = F.col("n_docs") * F.lit(1.0) * F.col("kk") / F.col("nn")
    e0 = (
        F.col("n_docs") * F.lit(1.0) * (F.col("nn") - F.col("kk")) / F.col("nn")
    )
    contrib = F.round(
        F.lit(1e6)
        * (
            (F.col("n_en") - e1) * (F.col("n_en") - e1) / e1
            + ((F.col("n_docs") - F.col("n_en")) - e0)
            * ((F.col("n_docs") - F.col("n_en")) - e0)
            / e0
        )
    ).cast("bigint")
    q = x.select("fold", "n_docs", "n_en", contrib.alias("contrib_micro"))
    s = q.agg(F.sum("contrib_micro").cast("bigint").alias("chi2_micro"))
    return (
        q.crossJoin(F.broadcast(s))
        .select(
            "fold",
            "n_docs",
            "n_en",
            F.round(F.lit(1e6) * F.col("n_en") / F.col("n_docs"))
            .cast("bigint")
            .alias("en_rate_micro"),
            "contrib_micro",
            "chi2_micro",
            (F.col("chi2_micro") <= F.lit(_CHI2_95_4DF_MICRO)).alias(
                "balanced_95"
            ),
        )
        .orderBy(F.col("fold").asc())
    )


@register(
    "t_closeness_audit",
    """
    WITH s AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sens
      FROM customer),
    bins AS (SELECT sens, COUNT(*)::BIGINT AS cq FROM s GROUP BY sens),
    tot AS (SELECT SUM(cq)::BIGINT AS n, COUNT(*)::BIGINT AS m
            FROM bins),
    grp AS (SELECT c_nationkey, c_mktsegment, COUNT(*)::BIGINT AS sz
            FROM s GROUP BY 1, 2),
    cell AS (SELECT c_nationkey, c_mktsegment, sens,
                    COUNT(*)::BIGINT AS cg
             FROM s GROUP BY 1, 2, 3),
    grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.sz, b.sens, b.cq,
                    COALESCE(c.cg, 0)::BIGINT AS cg
             FROM grp g CROSS JOIN bins b
             LEFT JOIN cell c ON c.c_nationkey = g.c_nationkey
                             AND c.c_mktsegment = g.c_mktsegment
                             AND c.sens = b.sens),
    cum AS (SELECT c_nationkey, c_mktsegment, sz,
                   SUM(cg) OVER (PARTITION BY c_nationkey, c_mktsegment
                                 ORDER BY sens ASC)::BIGINT AS ccg,
                   SUM(cq) OVER (PARTITION BY c_nationkey, c_mktsegment
                                 ORDER BY sens ASC)::BIGINT AS ccq
            FROM grid),
    emd AS (SELECT cum.c_nationkey, cum.c_mktsegment, cum.sz,
                   SUM(CAST(round(1e9 * ABS(cum.ccg * 1.0 / cum.sz
                                            - cum.ccq * 1.0 / tot.n))
                       AS DECIMAL(38,0))) AS eq,
                   MAX(tot.m)::BIGINT AS m
            FROM cum CROSS JOIN tot
            GROUP BY 1, 2, 3)
    SELECT c_nationkey, c_mktsegment, sz AS group_size,
           ROUND(eq::DOUBLE / 1e9 / (m - 1), 6) AS t_emd
    FROM emd
    ORDER BY t_emd DESC, c_nationkey ASC, c_mktsegment ASC
    LIMIT 5
    """,
)
def t_closeness_audit(spark, sf_dir):
    """t-closeness audit (Li-Li-Venkatasubramanian 2007): for each
    quasi-identifier group (nation x market segment -- the same QI the
    k-anonymity and l-diversity audits use), the ordered earth-mover
    distance between the group's sensitive-attribute distribution
    (account-balance bands) and the corpus-wide one; the 5 worst
    groups surface. This completes the privacy triplet: k-anonymity
    bounds group SIZE, l-diversity bounds sensitive CARDINALITY, but a
    group can pass both while its values concentrate in the top band
    -- t-closeness is the distributional bound that catches it. For an
    ordered attribute the EMD is the mean absolute CDF gap
    (1/(m-1)) sum_j |cumP_j - cumQ_j|: the dense group x band grid is
    QI-bounded (~125 x ~11), per-group cumulative sums run on <= 11-row
    partitions, each CDF gap is an exact-integer ratio nano-quantized
    for the order-proof per-group fold, and the top-5 rides
    orderBy().limit(5).

    Scale: one corpus scan to the (QI, band) cell grain; every later
    frame is bounded by the QI domain times the band domain."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("sens"),
    )
    bins = cust.groupBy("sens").agg(
        F.count(F.lit(1)).cast("bigint").alias("cq")
    )
    tot = bins.agg(
        F.sum("cq").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    grp = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    cell = cust.groupBy("c_nationkey", "c_mktsegment", "sens").agg(
        F.count(F.lit(1)).cast("bigint").alias("cg")
    )
    grid = (
        grp.crossJoin(F.broadcast(bins))
        .join(cell, ["c_nationkey", "c_mktsegment", "sens"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "sz",
            "sens",
            "cq",
            F.coalesce(F.col("cg"), F.lit(0)).cast("bigint").alias("cg"),
        )
    )
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        F.col("sens").asc()
    )
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "sz",
        F.sum("cg").over(w).cast("bigint").alias("ccg"),
        F.sum("cq").over(w).cast("bigint").alias("ccq"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "sz")
        .agg(
            F.sum(
                F.round(
                    F.lit(1e9)
                    * F.abs(
                        F.col("ccg") * F.lit(1.0) / F.col("sz")
                        - F.col("ccq") * F.lit(1.0) / F.col("n")
                    )
                ).cast("decimal(38,0)")
            ).alias("eq"),
            F.max("m").cast("bigint").alias("m"),
        )
    )
    return (
        emd.select(
            "c_nationkey",
            "c_mktsegment",
            F.col("sz").alias("group_size"),
            F.round(
                F.col("eq").cast("double")
                / F.lit(1e9)
                / (F.col("m") - F.lit(1)),
                6,
            ).alias("t_emd"),
        )
        .orderBy(
            F.col("t_emd").desc(),
            F.col("c_nationkey").asc(),
            F.col("c_mktsegment").asc(),
        )
        .limit(5)
    )
