"""Measure variants of the capped-trio top-20 build (round-9 verdict #3).

The trio's one expensive job is the wedge exchange + 93.6M-row columnar
cache write (21.8 s vs 14.7 s bare exchange at sf0.1, round-9 docstring).
Variants measured here, each in a FRESH process (``python
tools/measure_trio_cache.py <variant>``; a driver shell loops runs):

- ``baseline``  — the shipped shape: persist the 5-bigint pair aggregate,
  count-populate, three TakeOrdered heads read the cache.
- ``narrow``    — same shape but the cache keeps the PACKED pair key and
  INT scores (pk bigint, n_common/ra_micro/aa_micro int): 20 bytes/row vs
  40 — the cache write is the inflating cost, so halve what it writes.
- ``fused``     — no cache at all: compute jac map-side (broadcast degree
  joins), then ONE mapInArrow pass keeps a running top-20 per ranker per
  partition (numpy lexsort over <= batch+20 rows) and emits <= 60 rows
  per partition; the driver merges. Pays the bare exchange once, writes
  nothing.
- ``prune``     — the round-10 verdict's untried variant: job 1 re-runs
  the wedge exchange and computes a SOUND per-ranker lower bound on the
  20th-best score with approx_percentile (GK sketch, rank error <=
  N/accuracy; asking for p = 1 - (20 + 2*N/acc)/N guarantees the
  returned value's true rank is at-or-below the 20th-from-top, so
  filtering ``>= bound`` can never drop a true top-20 row and keeps at
  most ~20 + 3N/acc rows per ranker). Job 2 re-runs the exchange,
  applies the disjunctive filter BEFORE .persist(), so the cache write
  shrinks from 93.6M rows to a few thousand; the three heads read the
  tiny cache. Pays the bare exchange twice, writes almost nothing.

The adjacency (`cund`) is session-shared and warm in a real sweep, so it
is force-built BEFORE the timer. Prints one JSON line per run.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from veri_spark.session import get_spark  # noqa: E402
from veri_spark.plans.graph import (  # noqa: E402
    _capped_adjacency_shared,
    _capped_ranker_top20s,
)

SF_DIR = "/root/testdata/sf0.1"


def _pair_agg(cund, deg):
    wdeg = F.broadcast(deg.select(F.col("u").alias("v"), F.col("d").alias("dw")))
    x = cund.join(wdeg, "v").select(
        F.col("u").alias("cu"), F.col("v").alias("w"), "dw"
    )
    y = cund.select(F.col("u").alias("cv"), F.col("v").alias("w"))
    return (
        x.join(y, "w")
        .filter(F.col("cu") < F.col("cv"))
        .select(
            F.expr("shiftleft(cu, 32) + cv").alias("pk"),
            F.expr("1000000 div dw").alias("rw"),
            F.expr(
                "CAST(floor(1000000 / ln(CAST(dw AS DOUBLE)) + 0.5) AS BIGINT)"
            ).alias("aw"),
        )
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("rw").cast("bigint").alias("ra_micro"),
            F.sum("aw").cast("bigint").alias("aa_micro"),
        )
    )


def run_baseline(spark):
    t0 = time.time()
    top20s, _, _, _ = _capped_ranker_top20s(spark, SF_DIR)
    n = top20s.count()
    return time.time() - t0, n


def _pair_agg_invadj(cund, deg):
    """Round-15 variant (r14 verdict task 4): generate wedges by
    exploding per-endpoint adjacency ARRAYS instead of the cund-x-cund
    self-join — ONE shuffle of the adjacency (the groupBy(w)
    collect_list) instead of two join-side exchanges on w; the wedge
    grain then exists only map-side before the pk partial aggregation.
    |inv(w)| <= deg(w) (only w's neighbors can keep w in their capped
    lists), so the per-row array is bounded by the max degree. The
    wedge multiset (pair, dw) is identical, so all three rankers'
    aggregates are bit-identical."""
    wdeg = deg.select(F.col("u").alias("w"), F.col("d").alias("dw"))
    inv = (
        cund.select(F.col("u").alias("cu"), F.col("v").alias("w"))
        .groupBy("w")
        .agg(F.collect_list("cu").alias("cs"))
        .join(F.broadcast(wdeg), "w")
    )
    return (
        inv.select("dw", F.explode("cs").alias("cu"), "cs")
        .select("dw", "cu", F.explode("cs").alias("cv"))
        .filter(F.col("cu") < F.col("cv"))
        .select(
            F.expr("shiftleft(cu, 32) + cv").alias("pk"),
            F.expr("1000000 div dw").alias("rw"),
            F.expr(
                "CAST(floor(1000000 / ln(CAST(dw AS DOUBLE)) + 0.5) AS BIGINT)"
            ).alias("aw"),
        )
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("rw").cast("bigint").alias("ra_micro"),
            F.sum("aw").cast("bigint").alias("aa_micro"),
        )
    )


def _pair_agg_invadj2(cund, deg):
    """Like _pair_agg_invadj but generates each unordered pair exactly
    once: sort the inverse-adjacency array, posexplode for cu, and take
    cv only from the strictly-later slice — n(n-1)/2 generated rows
    instead of n^2 filtered down. Same wedge multiset."""
    wdeg = deg.select(F.col("u").alias("w"), F.col("d").alias("dw"))
    inv = (
        cund.select(F.col("u").alias("cu"), F.col("v").alias("w"))
        .groupBy("w")
        .agg(F.sort_array(F.collect_list("cu")).alias("cs"))
        .join(F.broadcast(wdeg), "w")
    )
    return (
        inv.select("dw", F.posexplode("cs").alias("i", "cu"), "cs")
        .select(
            "dw",
            "cu",
            F.explode(F.expr("slice(cs, i + 2, size(cs))")).alias("cv"),
        )
        .select(
            F.expr("shiftleft(cu, 32) + cv").alias("pk"),
            F.expr("1000000 div dw").alias("rw"),
            F.expr(
                "CAST(floor(1000000 / ln(CAST(dw AS DOUBLE)) + 0.5) AS BIGINT)"
            ).alias("aw"),
        )
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("rw").cast("bigint").alias("ra_micro"),
            F.sum("aw").cast("bigint").alias("aa_micro"),
        )
    )


def _pair_agg_packed(cund, deg):
    """Round-15 §2.3 variant: every per-wedge quantity (1, rw, aw) is a
    function of dw alone, so precompute their PACKED sum contribution on
    the broadcast degree side (19k rows) and shuffle ONE bigint per
    wedge instead of three — pw = 2^55 + rw*2^28 + aw. Carry-free at
    cap=128 by construction: aw <= 128*1,442,695 < 2^28, sum(rw) <=
    128*500,000 < 2^27, n_common <= 128, total < 2^62. Also removes the
    per-wedge ln/floor/div (93.6M evaluations) — they run once per
    distinct w. Unpack after the final agg; identical integer sums."""
    P55, P28 = 1 << 55, 1 << 28
    wdeg = F.broadcast(
        deg.select(
            F.col("u").alias("v"),
            (
                F.lit(P55)
                + F.expr("1000000 div d") * F.lit(P28)
                + F.expr(
                    "CAST(floor(1000000 / ln(CAST(d AS DOUBLE)) + 0.5) AS BIGINT)"
                )
            ).alias("pw"),
        )
    )
    x = cund.join(wdeg, "v").select(
        F.col("u").alias("cu"), F.col("v").alias("w"), "pw"
    )
    y = cund.select(F.col("u").alias("cv"), F.col("v").alias("w"))
    return (
        x.join(y, "w")
        .filter(F.col("cu") < F.col("cv"))
        .select(F.expr("shiftleft(cu, 32) + cv").alias("pk"), "pw")
        .groupBy("pk")
        .agg(F.sum("pw").alias("packed"))
        .select(
            "pk",
            F.expr("shiftright(packed, 55)").alias("n_common"),
            F.expr("shiftright(packed, 28) & 134217727").alias("ra_micro"),
            F.expr("packed & 268435455").alias("aa_micro"),
        )
    )


def run_narrow(spark, storage_level=None, agg_fn=None):
    cund, und, deg = _capped_adjacency_shared(spark, SF_DIR)
    t0 = time.time()
    agg = (agg_fn or _pair_agg)(cund, deg).select(
        "pk",
        F.col("n_common").cast("int").alias("n_common"),
        F.col("ra_micro").cast("int").alias("ra_micro"),
        F.col("aa_micro").cast("int").alias("aa_micro"),
    )
    cap = 128
    agg = agg.persist(storage_level) if storage_level is not None else agg.persist()
    try:
        agg.count()
        unpacked = agg.select(
            F.expr("shiftrightunsigned(pk, 32)").alias("part_a"),
            F.expr("pk & 4294967295").alias("part_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.col("ra_micro").cast("bigint").alias("ra_micro"),
            F.col("aa_micro").cast("bigint").alias("aa_micro"),
        )
        cdeg = deg.select("u", F.least(F.col("d"), F.lit(cap)).alias("cd"))
        ja = (
            unpacked.join(
                F.broadcast(cdeg.select(F.col("u").alias("part_a"), F.col("cd").alias("da"))),
                "part_a",
            )
            .join(
                F.broadcast(cdeg.select(F.col("u").alias("part_b"), F.col("cd").alias("db"))),
                "part_b",
            )
            .select(
                "part_a", "part_b", "n_common", "ra_micro", "aa_micro",
                (F.col("n_common").cast("double") / (F.col("da") + F.col("db") - F.col("n_common"))).alias("jac"),
            )
            .orderBy(F.col("jac").desc(), F.col("n_common").desc(), F.col("part_a").asc(), F.col("part_b").asc())
            .limit(20)
            .collect()
        )
        ra = (
            unpacked.orderBy(F.col("ra_micro").desc(), F.col("n_common").desc(), F.col("part_a").asc(), F.col("part_b").asc())
            .limit(20).collect()
        )
        aa = (
            unpacked.orderBy(F.col("aa_micro").desc(), F.col("n_common").desc(), F.col("part_a").asc(), F.col("part_b").asc())
            .limit(20).collect()
        )
    finally:
        agg.unpersist()
    return time.time() - t0, len(ja) + len(ra) + len(aa)


_ARROW_OUT = "ranker string, pk long, n_common long, ra_micro long, aa_micro long, jac double"


def _partition_top20s(batches):
    run = {r: None for r in ("jac", "ra", "aa")}
    keycol = {"jac": "jac", "ra": "ra_micro", "aa": "aa_micro"}

    def shrink(arrs, key):
        order = np.lexsort((arrs["pk"], -arrs["n_common"], -arrs[key]))[:20]
        return {k: v[order] for k, v in arrs.items()}

    for batch in batches:
        d = {
            n: batch.column(i).to_numpy(zero_copy_only=False)
            for i, n in enumerate(batch.schema.names)
        }
        for r, key in keycol.items():
            cand = shrink(d, key)
            if run[r] is None:
                run[r] = cand
            else:
                merged = {k: np.concatenate([run[r][k], cand[k]]) for k in cand}
                run[r] = shrink(merged, key)
    out = {"ranker": [], "pk": [], "n_common": [], "ra_micro": [], "aa_micro": [], "jac": []}
    for r in ("jac", "ra", "aa"):
        if run[r] is None:
            continue
        k = len(run[r]["pk"])
        out["ranker"] += [r] * k
        for c in ("pk", "n_common", "ra_micro", "aa_micro", "jac"):
            out[c] += [v.item() for v in run[r][c]]
    yield pa.RecordBatch.from_pydict(
        out,
        schema=pa.schema(
            [
                ("ranker", pa.string()),
                ("pk", pa.int64()),
                ("n_common", pa.int64()),
                ("ra_micro", pa.int64()),
                ("aa_micro", pa.int64()),
                ("jac", pa.float64()),
            ]
        ),
    )


def run_fused(spark):
    cund, und, deg = _capped_adjacency_shared(spark, SF_DIR)
    cap = 128
    t0 = time.time()
    agg = _pair_agg(cund, deg).select(
        "pk",
        F.expr("shiftrightunsigned(pk, 32)").alias("part_a"),
        F.expr("pk & 4294967295").alias("part_b"),
        "n_common", "ra_micro", "aa_micro",
    )
    cdeg = deg.select("u", F.least(F.col("d"), F.lit(cap)).alias("cd"))
    withjac = (
        agg.join(F.broadcast(cdeg.select(F.col("u").alias("part_a"), F.col("cd").alias("da"))), "part_a")
        .join(F.broadcast(cdeg.select(F.col("u").alias("part_b"), F.col("cd").alias("db"))), "part_b")
        .select(
            "pk", "n_common", "ra_micro", "aa_micro",
            (F.col("n_common").cast("double") / (F.col("da") + F.col("db") - F.col("n_common"))).alias("jac"),
        )
    )
    part = withjac.mapInArrow(_partition_top20s, _ARROW_OUT).collect()
    # driver merge over <= 60 * npartitions rows
    rows = {"jac": [], "ra": [], "aa": []}
    for r in part:
        rows[r["ranker"]].append(r)
    key = {"jac": "jac", "ra": "ra_micro", "aa": "aa_micro"}
    final = {}
    for tag, rs in rows.items():
        rs.sort(key=lambda r: (-r[key[tag]], -r["n_common"], r["pk"]))
        final[tag] = rs[:20]
    return time.time() - t0, sum(len(v) for v in final.values())


def run_prune(spark):
    cund, und, deg = _capped_adjacency_shared(spark, SF_DIR)
    cap = 128
    t0 = time.time()
    narrow = _pair_agg(cund, deg).select(
        "pk",
        F.col("n_common").cast("int").alias("n_common"),
        F.col("ra_micro").cast("int").alias("ra_micro"),
        F.col("aa_micro").cast("int").alias("aa_micro"),
    )
    cdeg = deg.select("u", F.least(F.col("d"), F.lit(cap)).alias("cd"))

    def with_jac(df):
        return (
            df.withColumn("part_a", F.expr("shiftrightunsigned(pk, 32)"))
            .withColumn("part_b", F.expr("pk & 4294967295"))
            .join(
                F.broadcast(
                    cdeg.select(F.col("u").alias("part_a"), F.col("cd").alias("da"))
                ),
                "part_a",
            )
            .join(
                F.broadcast(
                    cdeg.select(F.col("u").alias("part_b"), F.col("cd").alias("db"))
                ),
                "part_b",
            )
            .withColumn(
                "jac",
                F.col("n_common").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_common")),
            )
        )

    # job 1: sound 20th-value lower bounds. approx_percentile's percentage
    # must be FOLDABLE, so ask for a fixed ladder of percentiles plus the
    # exact count in one agg, then pick driver-side the largest p with
    # p <= 1 - 20/N - eps (eps = 1/accuracy): the GK sketch guarantees the
    # returned value's true rank r satisfies |r - pN| <= eps*N, so
    # r <= pN + eps*N <= N - 20 — the value sits at-or-below the true
    # 20th-best and `>= bound` keeps a SUPERSET of the top-20. If no rung
    # qualifies (tiny N), the bound degrades to -inf == no pruning.
    acc = 10000
    ladder = [0.5, 0.9, 0.99, 0.999, 0.9995, 0.9999, 0.99995]
    pl = "array(" + ",".join(f"{p!r}D" for p in ladder) + ")"
    b = (
        with_jac(narrow)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"approx_percentile(jac, {pl}, {acc})").alias("bj"),
            F.expr(f"approx_percentile(ra_micro, {pl}, {acc})").alias("br"),
            F.expr(f"approx_percentile(aa_micro, {pl}, {acc})").alias("ba"),
        )
        .collect()[0]
    )
    n_total = int(b["n"])
    p_max = 1.0 - 20.0 / max(n_total, 1) - 2.0 / acc
    idx = max(
        (i for i, p in enumerate(ladder) if p <= p_max), default=None
    )
    if idx is None:
        bj, br, ba = float("-inf"), -(2**31), -(2**31)
    else:
        bj, br, ba = float(b["bj"][idx]), int(b["br"][idx]), int(b["ba"][idx])
    # job 2: rebuild the aggregate, prune BEFORE persist — the cache write
    # shrinks from 93.6M rows to ~(1 - p + eps) * N per ranker
    pruned = (
        with_jac(narrow)
        .filter(
            (F.col("jac") >= F.lit(bj))
            | (F.col("ra_micro") >= F.lit(br))
            | (F.col("aa_micro") >= F.lit(ba))
        )
        .select(
            "part_a",
            "part_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.col("ra_micro").cast("bigint").alias("ra_micro"),
            F.col("aa_micro").cast("bigint").alias("aa_micro"),
            "jac",
        )
        .persist()
    )
    try:
        kept = pruned.count()
        ja = (
            pruned.orderBy(
                F.col("jac").desc(), F.col("n_common").desc(),
                F.col("part_a").asc(), F.col("part_b").asc(),
            ).limit(20).collect()
        )
        ra = (
            pruned.orderBy(
                F.col("ra_micro").desc(), F.col("n_common").desc(),
                F.col("part_a").asc(), F.col("part_b").asc(),
            ).limit(20).collect()
        )
        aa = (
            pruned.orderBy(
                F.col("aa_micro").desc(), F.col("n_common").desc(),
                F.col("part_a").asc(), F.col("part_b").asc(),
            ).limit(20).collect()
        )
    finally:
        pruned.unpersist()
    return time.time() - t0, len(ja) + len(ra) + len(aa), {"kept": kept, "n": n_total}


def run_narrow_disk(spark):
    """Round-14: DISK_ONLY cache — skip heap residency entirely (the 8 g vs
    32 g probe showed the in-memory columnar build is GC-bound, not
    capacity-bound: more heap measured WORSE)."""
    from pyspark import StorageLevel

    return run_narrow(spark, StorageLevel.DISK_ONLY)


def run_narrow_nocomp(spark, agg_fn=None):
    """Round-14: keep the default MEMORY_AND_DISK level but disable the
    per-batch compression encoders (dictionary/RLE attempts are CPU on the
    cache-write path)."""
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    try:
        return run_narrow(spark, agg_fn=agg_fn)
    finally:
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")


def run_packed_nocomp(spark):
    """Round-15 §2.3: packed one-bigint wedge payload + the shipped
    uncompressed narrow cache."""
    return run_narrow_nocomp(spark, agg_fn=_pair_agg_packed)


def run_invadj_nocomp(spark):
    """Round-15 (r14 verdict task 4): inverse-adjacency wedge generation
    + the shipped uncompressed narrow cache."""
    return run_narrow_nocomp(spark, agg_fn=_pair_agg_invadj)


def run_invadj2_nocomp(spark):
    """Round-15: sorted-slice pair generation (each pair once) + the
    shipped uncompressed narrow cache."""
    return run_narrow_nocomp(spark, agg_fn=_pair_agg_invadj2)


def run_parquet(spark):
    """Round-14: scratch parquet write + 4 read-backs instead of the
    columnar cache (guide §6 file-layout path)."""
    import shutil
    import tempfile

    cund, und, deg = _capped_adjacency_shared(spark, SF_DIR)
    cap = 128
    tmp = tempfile.mkdtemp(prefix="trio_pq_")
    t0 = time.time()
    try:
        _pair_agg(cund, deg).select(
            "pk",
            F.col("n_common").cast("int").alias("n_common"),
            F.col("ra_micro").cast("int").alias("ra_micro"),
            F.col("aa_micro").cast("int").alias("aa_micro"),
        ).write.mode("overwrite").parquet(tmp)
        agg = spark.read.parquet(tmp)
        unpacked = agg.select(
            F.expr("shiftrightunsigned(pk, 32)").alias("part_a"),
            F.expr("pk & 4294967295").alias("part_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.col("ra_micro").cast("bigint").alias("ra_micro"),
            F.col("aa_micro").cast("bigint").alias("aa_micro"),
        )
        cdeg = deg.select("u", F.least(F.col("d"), F.lit(cap)).alias("cd"))
        ja = (
            unpacked.join(
                F.broadcast(cdeg.select(F.col("u").alias("part_a"), F.col("cd").alias("da"))),
                "part_a",
            )
            .join(
                F.broadcast(cdeg.select(F.col("u").alias("part_b"), F.col("cd").alias("db"))),
                "part_b",
            )
            .select(
                "part_a", "part_b", "n_common", "ra_micro", "aa_micro",
                (F.col("n_common").cast("double") / (F.col("da") + F.col("db") - F.col("n_common"))).alias("jac"),
            )
            .orderBy(F.col("jac").desc(), F.col("n_common").desc(), F.col("part_a").asc(), F.col("part_b").asc())
            .limit(20)
            .collect()
        )
        ra = (
            unpacked.orderBy(F.col("ra_micro").desc(), F.col("n_common").desc(), F.col("part_a").asc(), F.col("part_b").asc())
            .limit(20).collect()
        )
        aa = (
            unpacked.orderBy(F.col("aa_micro").desc(), F.col("n_common").desc(), F.col("part_a").asc(), F.col("part_b").asc())
            .limit(20).collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return time.time() - t0, len(ja) + len(ra) + len(aa)


def run_wgl(spark):
    """Round-14: NO materialization at all — explode each pair row into 3
    (ranker, score) rows and take the per-ranker top-20 in ONE job via a
    rank-limit window: Spark's WindowGroupLimit pushes a per-partition
    top-20-per-ranker below the exchange, so only 60 rows/partition
    shuffle. Pays the wedge exchange once and writes nothing; the new cost
    is the partition-local sort of the 3x-exploded aggregate."""
    from pyspark.sql import Window

    cund, und, deg = _capped_adjacency_shared(spark, SF_DIR)
    cap = 128
    t0 = time.time()
    agg = _pair_agg(cund, deg).select(
        F.expr("shiftrightunsigned(pk, 32)").alias("part_a"),
        F.expr("pk & 4294967295").alias("part_b"),
        "n_common", "ra_micro", "aa_micro",
    )
    cdeg = deg.select("u", F.least(F.col("d"), F.lit(cap)).alias("cd"))
    withjac = (
        agg.join(F.broadcast(cdeg.select(F.col("u").alias("part_a"), F.col("cd").alias("da"))), "part_a")
        .join(F.broadcast(cdeg.select(F.col("u").alias("part_b"), F.col("cd").alias("db"))), "part_b")
        .select(
            "part_a", "part_b", "n_common", "ra_micro", "aa_micro",
            (F.col("n_common").cast("double") / (F.col("da") + F.col("db") - F.col("n_common"))).alias("jac"),
        )
    )
    tri = withjac.select(
        "part_a", "part_b", "n_common", "ra_micro", "aa_micro", "jac",
        F.explode(
            F.array(
                F.struct(F.lit("jac").alias("ranker"), F.col("jac").alias("score")),
                F.struct(F.lit("ra").alias("ranker"), F.col("ra_micro").cast("double").alias("score")),
                F.struct(F.lit("aa").alias("ranker"), F.col("aa_micro").cast("double").alias("score")),
            )
        ).alias("rs"),
    ).select("part_a", "part_b", "n_common", "ra_micro", "aa_micro", "jac", "rs.ranker", "rs.score")
    w = Window.partitionBy("ranker").orderBy(
        F.col("score").desc(), F.col("n_common").desc(),
        F.col("part_a").asc(), F.col("part_b").asc(),
    )
    rows = tri.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 20).collect()
    return time.time() - t0, len(rows)


def main():
    variant = sys.argv[1]
    spark = get_spark("trio-measure")
    spark.sparkContext.setLogLevel("ERROR")
    cund, und, deg = _capped_adjacency_shared(spark, SF_DIR)
    cund.count()  # warm the session-shared adjacency (real sweeps have it warm)
    deg.count()
    fn = {
        "baseline": run_baseline,
        "narrow": run_narrow,
        "fused": run_fused,
        "prune": run_prune,
        "narrow_disk": run_narrow_disk,
        "narrow_nocomp": run_narrow_nocomp,
        "packed_nocomp": run_packed_nocomp,
        "invadj_nocomp": run_invadj_nocomp,
        "invadj2_nocomp": run_invadj2_nocomp,
        "parquet": run_parquet,
        "wgl": run_wgl,
    }[variant]
    out = fn(spark)
    sec, n = out[0], out[1]
    extra = out[2] if len(out) > 2 else {}
    print(json.dumps({"variant": variant, "sec": round(sec, 2), "rows": n, **extra}))


if __name__ == "__main__":
    main()
