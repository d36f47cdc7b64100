"""Dataset statistics — the reference's DataInfo maintenance pass.

The reference computes, in one background scan per dataset (Process,
data/newsync.go:93-227): row count ``N``, the centroid ``Avg`` (elementwise
mean, data/util.go:15-26), ``MaxDistance`` of any row from the centroid, and
a 64-bucket histogram of distance-to-centroid (data/newsync.go:137-167).
Exposed as ``DataInfo`` (veriservice.proto:100-114).

The reference uses the *previous* pass's centroid for max-distance and
histogram (one-pass approximation); here we compute the exact two-pass
version — an intentional improvement noted in SURVEY.md section 2.4 (A3).

Scale notes: the centroid is one partial-aggregated pass (posexplode is a
generate, no shuffle until the tiny 64-row groupBy); distance stats are a
second pass against the broadcast centroid literal. Two scans of the vector
column, no wide rows ever shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from veri_spark.functions.vector import euclidean_distance

HIST_BINS = 64  # data/newsync.go:146


def centroid_df(df: DataFrame, vector_col: str = "feature") -> DataFrame:
    """Elementwise mean of the vector column (A2) as rows (pos, avg_val)."""
    return (
        df.select(F.posexplode(F.col(vector_col).cast("array<double>")).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg("v").alias("avg_val"))
    )


def centroid(df: DataFrame, vector_col: str = "feature") -> list[float]:
    rows = centroid_df(df, vector_col).orderBy("pos").collect()
    return [r["avg_val"] for r in rows]


def with_centroid_distance(
    df: DataFrame, center: list[float], vector_col: str = "feature", out_col: str = "dist"
) -> DataFrame:
    return df.withColumn(out_col, euclidean_distance(F.col(vector_col), center))


def data_info(df: DataFrame, vector_col: str = "feature") -> dict:
    """N, centroid, max distance, 64-bin histogram (A1-A4) — the DataInfo
    payload (proto:100-114). Histogram counts are normalized by N like the
    reference (newsync.go:163: ``hist[i] += 1/N``).

    Three passes over the vector column (round 15, was four): centroid,
    count+max, histogram. The histogram's normalizer reuses ``n`` from
    the count+max agg instead of a fourth ``dists.count()`` scan — the
    same deterministic frame, so freq = cnt/n is bit-identical; the
    stats probe is what every damped refresh pays (A5), so one fewer
    corpus scan per probe.
    """
    center = centroid(df, vector_col)
    dists = with_centroid_distance(df, center, vector_col)
    row = dists.agg(
        F.count(F.lit(1)).alias("n"), F.max("dist").alias("max_dist")
    ).collect()[0]
    n, max_dist = row["n"], row["max_dist"]
    hist_rows = (
        histogram_df(dists, max_dist, total=n).orderBy("bucket").collect()
    )
    hist = [0.0] * HIST_BINS
    for r in hist_rows:
        hist[r["bucket"]] = r["freq"]
    return {"n": n, "avg": center, "max_distance": max_dist, "hist": hist}


def histogram_df(
    dists: DataFrame,
    max_dist: float,
    dist_col: str = "dist",
    bins: int = HIST_BINS,
    total: int | None = None,
) -> DataFrame:
    """Bucketed distance histogram (A4, data/newsync.go:158-167): bucket =
    clamp(floor(d/max*bins), 0, bins-1); freq normalized by total count.
    ``total`` skips the count scan when the caller already holds N for
    the same frame (data_info's count+max agg).
    """
    if not max_dist or max_dist <= 0:
        max_dist = 1.0
    bucket = F.least(
        F.greatest(F.floor(F.col(dist_col) / F.lit(float(max_dist)) * bins), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    counts = dists.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("cnt"))
    if total is None:
        total = dists.count()
    return counts.withColumn("freq", F.col("cnt") / F.lit(float(total)))


def statistical_identity(
    info_a: dict, info_b: dict, rel_tol: float = 0.01
) -> tuple[bool, float, float]:
    """A5 statistical-identity test (data/data.go:183): two datasets are
    "close enough" when euclidean(avgA, avgB) + euclidean(histA, histB)
    <= rel_tol * maxDistance. The reference uses it to damp peer
    rebalancing; here it damps MAINTENANCE — index_refresh_needed skips
    an IVF/stats rebuild when the corpus hasn't statistically drifted
    (same decision, different actuator; Spark owns data placement so the
    peer-sync use has no analog). maxDistance is the max of the two
    sides' observed max distances (symmetric — neither side is the
    privileged 'local' peer here). Returns (identical, drift_score,
    threshold); degenerate empty stats compare equal only to each other.
    """
    import math

    # degenerate guard: an empty dataset has zero-length avg/hist, so the
    # drift sums vacuously collapse to 0 — without this, empty would test
    # "identical" to anything. One side empty + other populated => drifted.
    n_a = int(info_a.get("n") or 0)
    n_b = int(info_b.get("n") or 0)
    if (n_a == 0) != (n_b == 0):
        max_dist = max(
            float(info_a.get("max_distance") or 0.0),
            float(info_b.get("max_distance") or 0.0),
        )
        return False, math.inf, rel_tol * max_dist

    avg_a, avg_b = info_a.get("avg") or [], info_b.get("avg") or []
    n = min(len(avg_a), len(avg_b))
    d_avg = math.sqrt(sum((avg_a[i] - avg_b[i]) ** 2 for i in range(n)))
    h_a, h_b = info_a.get("hist") or [], info_b.get("hist") or []
    m = min(len(h_a), len(h_b))
    d_hist = math.sqrt(sum((h_a[i] - h_b[i]) ** 2 for i in range(m)))
    max_dist = max(
        float(info_a.get("max_distance") or 0.0),
        float(info_b.get("max_distance") or 0.0),
    )
    score = d_avg + d_hist
    threshold = rel_tol * max_dist
    return score <= threshold, score, threshold
