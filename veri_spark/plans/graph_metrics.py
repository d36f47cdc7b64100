"""Graph structure metrics tier 2: partition modularity, hub local
clustering, deterministic label propagation.

New round-12 module (plans/graph.py sits near the 2,500-line split
threshold — round-11 verdict task 4 — so the round's graph additions
land here); reuses the session-shared co-purchase edge/degree frames
from plans/graph.py and registers into
``plans._base.QUERIES``/``ORACLES`` at import like every domain module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from veri_spark.operators.topk import topk  # noqa: F401
from veri_spark.sources.catalog import load_table  # noqa: F401

from veri_spark.plans._base import register  # noqa: F401
from veri_spark.plans.graph import (  # noqa: F401
    _copurchase_edges,
    _copurchase_graph,
)

_EDGES_SQL = """
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    und AS (SELECT u, v FROM edges UNION ALL
            SELECT v AS u, u AS v FROM edges),
    deg AS (SELECT u, COUNT(*)::BIGINT AS d FROM und GROUP BY u)
"""


@register(
    "graph_modularity_partition",
    f"""
    WITH {_EDGES_SQL},
    lbl AS (SELECT p_partkey AS u, p_brand AS c FROM part),
    m AS (SELECT COUNT(*)::BIGINT AS m FROM edges),
    ec AS (SELECT la.c, COUNT(*)::BIGINT AS e_c
           FROM edges e
           JOIN lbl la ON la.u = e.u
           JOIN lbl lb ON lb.u = e.v AND lb.c = la.c
           GROUP BY la.c),
    dc AS (SELECT lbl.c, SUM(deg.d)::BIGINT AS d_c
           FROM deg JOIN lbl ON lbl.u = deg.u GROUP BY lbl.c),
    q AS (SELECT SUM(4 * m.m * CAST(COALESCE(ec.e_c, 0) AS DECIMAL(38,0))
                     - CAST(dc.d_c AS DECIMAL(38,0)) * dc.d_c) AS qnum,
                 COUNT(*)::BIGINT AS n_communities
          FROM dc LEFT JOIN ec USING (c) CROSS JOIN m)
    SELECT q.n_communities, m.m AS n_edges,
           ROUND(q.qnum::DOUBLE / (4.0 * m.m * m.m), 6) AS modularity
    FROM q CROSS JOIN m
    """,
)
def graph_modularity_partition(spark, sf_dir):
    """Newman modularity Q of the part-BRAND partition on the
    co-purchase graph — "do parts of the same brand get bought
    together more than chance?", the one-number community-quality
    readout that prices any partition (here the catalog's own brand
    labels; `graph_label_propagation` below LEARNS a partition and can
    be scored by the same formula). Q = sum_c [e_c/m - (d_c/2m)^2]
    folds exactly as sum_c (4m*e_c - d_c^2) / (4m^2) — one integer
    numerator per community, ONE final division: bit-exact.

    Scale: reuses the session-shared edge/degree frames; community
    attachment is two hash joins of the edge list against the part
    dim (broadcast-sized); the reduce frame is |brands| = 25 rows. No
    per-pair or per-triangle work anywhere."""
    edges, _, deg = _copurchase_graph(spark, sf_dir)
    lbl = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("u"), F.col("p_brand").alias("c")
    )
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    la = lbl.select(F.col("u").alias("ua"), F.col("c"))
    lb = lbl.select(F.col("u").alias("ub"), F.col("c").alias("cb"))
    ec = (
        edges.join(F.broadcast(la), edges.u == F.col("ua"))
        .join(
            F.broadcast(lb),
            (edges.v == F.col("ub")) & (F.col("c") == F.col("cb")),
        )
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    dc = (
        deg.join(F.broadcast(lbl), "u")
        .groupBy("c")
        .agg(F.sum("d").cast("bigint").alias("d_c"))
    )
    q = (
        dc.join(ec, "c", "left")
        .crossJoin(F.broadcast(m))
        .agg(
            F.sum(
                4 * F.col("m")
                * F.coalesce(F.col("e_c"), F.lit(0)).cast("decimal(38,0)")
                - F.col("d_c").cast("decimal(38,0)") * F.col("d_c")
            ).alias("qnum"),
            F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        )
    )
    return q.crossJoin(F.broadcast(m)).select(
        "n_communities",
        F.col("m").alias("n_edges"),
        F.round(
            F.col("qnum").cast("double")
            / (F.lit(4.0) * F.col("m") * F.col("m")),
            6,
        ).alias("modularity"),
    )


@register(
    "graph_local_clustering_top",
    f"""
    WITH {_EDGES_SQL},
    top AS (SELECT u, d FROM deg ORDER BY d DESC, u ASC LIMIT 10),
    nb AS (SELECT t.u AS center, t.d, und.v AS nbr
           FROM top t JOIN und ON und.u = t.u),
    tri AS (SELECT a.center, COUNT(*)::BIGINT AS t
            FROM nb a JOIN nb b
              ON a.center = b.center AND a.nbr < b.nbr
            JOIN edges e ON e.u = a.nbr AND e.v = b.nbr
            GROUP BY a.center),
    o AS (SELECT t.u AS node, t.d AS degree,
                 COALESCE(tri.t, 0)::BIGINT AS triangles
          FROM top t LEFT JOIN tri ON tri.center = t.u)
    SELECT node, degree, triangles,
           ROUND(2.0 * triangles / (degree * (degree - 1.0)), 6)
             AS local_clustering
    FROM o ORDER BY degree DESC, node ASC
    """,
)
def graph_local_clustering_top(spark, sf_dir):
    """Local clustering coefficient of the ten highest-degree hubs:
    C(v) = 2*tri(v) / (d(v)(d(v)-1)) — "are the hub's neighbors
    connected to each other?", the node-local readout the global
    `graph_triangle_census` and `graph_rich_club_coefficient` only
    aggregate (hierarchical networks show LOW hub clustering —
    Ravasz-Barabasi — and a hub whose neighborhood closes densely is
    exactly where the capped wedge family's work concentrates). The
    triangle count runs for ONLY the 10 hubs: their neighbor lists
    come off the shared adjacency, neighbor PAIRS are a per-center
    self-join bounded by d_max^2 x 10, and closure is one semi-shaped
    hash join against the (u < v) edge list. Counts are exact
    integers; C is a single division.

    Scale: the only super-linear term is 10 * d_max^2 — bounded by the
    hub shortlist, not the corpus; everything else is the shared
    session frames. (The uncapped ALL-nodes version is the
    corpus-grain wedge join the capped family exists to avoid.)"""
    edges, und, deg = _copurchase_graph(spark, sf_dir)
    top = topk(deg, "d", 10, higher_is_better=True, tie_cols=["u"])
    nb = top.join(und.withColumnRenamed("u", "center"), top.u == F.col("center")).select(
        F.col("u").alias("cu"), F.col("d"), F.col("v").alias("nbr")
    )
    a = nb.select(F.col("cu"), F.col("nbr").alias("na"))
    b = nb.select(F.col("cu").alias("cub"), F.col("nbr").alias("nb"))
    tri = (
        a.join(b, (F.col("cu") == F.col("cub")) & (F.col("na") < F.col("nb")))
        .join(
            edges,
            (edges.u == F.col("na")) & (edges.v == F.col("nb")),
            "left_semi",
        )
        .groupBy("cu")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    o = top.join(tri, top.u == tri.cu, "left").select(
        top.u.alias("node"),
        F.col("d").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("triangles"),
    )
    return o.select(
        "node",
        "degree",
        "triangles",
        F.round(
            F.lit(2.0)
            * F.col("triangles")
            / (F.col("degree") * (F.col("degree") - F.lit(1.0))),
            6,
        ).alias("local_clustering"),
    ).orderBy(F.col("degree").desc(), F.col("node").asc())


@register(
    "graph_label_propagation",
    f"""
    WITH {_EDGES_SQL},
    l0 AS (SELECT u, u AS lab FROM deg),
    v1 AS (SELECT und.u, l0.lab, COUNT(*)::BIGINT AS cnt
           FROM und JOIN l0 ON l0.u = und.v GROUP BY und.u, l0.lab),
    l1 AS (SELECT u, lab FROM (
             SELECT u, lab, row_number() OVER (PARTITION BY u
                      ORDER BY cnt DESC, lab ASC) AS rn
             FROM v1) WHERE rn = 1),
    v2 AS (SELECT und.u, l1.lab, COUNT(*)::BIGINT AS cnt
           FROM und JOIN l1 ON l1.u = und.v GROUP BY und.u, l1.lab),
    l2 AS (SELECT u, lab FROM (
             SELECT u, lab, row_number() OVER (PARTITION BY u
                      ORDER BY cnt DESC, lab ASC) AS rn
             FROM v2) WHERE rn = 1),
    sizes AS (SELECT lab, COUNT(*)::BIGINT AS n_members
              FROM l2 GROUP BY lab)
    SELECT lab AS community_label, n_members
    FROM sizes ORDER BY n_members DESC, lab ASC LIMIT 10
    """,
)
def graph_label_propagation(spark, sf_dir):
    """Deterministic SYNCHRONOUS label propagation (Raghavan 2007, two
    rounds): every node starts as its own community, then twice adopts
    the most frequent label among its neighbors (ties to the SMALLEST
    label — the determinism pin the classic random-order LPA lacks);
    reports the ten largest discovered communities. The learned
    partition complements `graph_modularity_partition`'s catalog-given
    one and `graph_connected_components`' reachability-only grouping
    (LPA splits a connected hairball into dense cores).

    Scale shape: each round is ONE hash aggregation of the
    both-direction edge list joined to the current label frame
    (node-grain) plus a per-node argmax — grouped by (node, label), so
    the heavy frame is edge-grain, partial-aggregated map-side; the
    argmax window partitions BY NODE (never global). Rounds are a
    fixed unrolled count (the kcore-peel discipline: bounded
    iterations, convergence is the caller's loop).

    Join strategy (round 15, r14 verdict task 1): the per-iteration
    edge-x-label join PINS a shuffled-hash join with the NODE-grain
    label frame as the build side. The session-shared edge frame is a
    localCheckpoint whose LogicalRDD keeps the BUILDER's size estimate,
    and the round-14 basket-explode rewrite estimates ~1.4 MiB for a
    ~19 MB frame — which made the auto-planner BROADCAST the edge-grain
    side (driver-measured 5.6-8.5 s vs ~2 s; per-iteration 2.4M-row
    broadcast collects, and a guaranteed 8 GB broadcast-cap failure at
    100 TB where the edge list is TB-scale). Shuffling both sides by
    the neighbor id and building the hash table on the node-grain side
    (|V|/partitions rows per task — bounded) is the canonical
    distributed edge-node join at any scale; measured cold 2.4 s vs
    5.8 s under the auto plan, bit-identical result (physical-only)."""
    _, und, deg = _copurchase_graph(spark, sf_dir)
    lab = deg.select("u", F.col("u").alias("lab"))
    for _ in range(2):
        votes = (
            und.join(
                lab.select(F.col("u").alias("v"), "lab").hint(
                    "shuffle_hash"
                ),
                "v",
            )
            .groupBy("u", "lab")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        w = Window.partitionBy("u").orderBy(
            F.col("cnt").desc(), F.col("lab").asc()
        )
        lab = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("u", "lab")
        )
    sizes = lab.groupBy("lab").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return (
        topk(sizes, "n_members", 10, higher_is_better=True, tie_cols=["lab"])
        .select(F.col("lab").alias("community_label"), "n_members")
    )


@register(
    "graph_katz_centrality",
    f"""
    WITH {_EDGES_SQL},
    k0 AS (SELECT u, 1000000::BIGINT AS x FROM deg),
    s1 AS (SELECT und.u, SUM(k0.x)::BIGINT AS s FROM und
           JOIN k0 ON k0.u = und.v GROUP BY und.u),
    k1 AS (SELECT u, 1000000 + (2 * s + 16) // 32 AS x FROM s1),
    s2 AS (SELECT und.u, SUM(k1.x)::BIGINT AS s FROM und
           JOIN k1 ON k1.u = und.v GROUP BY und.u),
    k2 AS (SELECT u, 1000000 + (2 * s + 16) // 32 AS x FROM s2),
    s3 AS (SELECT und.u, SUM(k2.x)::BIGINT AS s FROM und
           JOIN k2 ON k2.u = und.v GROUP BY und.u),
    k3 AS (SELECT u, 1000000 + (2 * s + 16) // 32 AS x FROM s3)
    SELECT u AS node, x AS katz_micro
    FROM k3 ORDER BY x DESC, u ASC LIMIT 20
    """,
)
def graph_katz_centrality(spark, sf_dir):
    """Katz centrality (1953), three unrolled iterations of
    x <- 1 + alpha * A x with alpha = 1/16, top-20 nodes — the
    walk-counting influence measure between degree (walks of length 1)
    and eigenvector/PageRank (the limit): Katz pays every walk,
    damped geometrically, WITHOUT PageRank's out-degree normalization,
    so a node adjacent to hubs scores high even if those hubs spread
    their endorsement thin. alpha = 1/16 is an EXACT binary fraction,
    so the whole recursion stays in integer micro units:
    x_{{t+1}} = 1e6 + (2*S + 16) // 32 realizes round-half-up of S/16
    in pure BIGINT arithmetic — bit-exact cross-engine with NO
    quantization drift across iterations (the kmeans_lloyd_micro
    discipline applied to an iterative graph recursion; values stay
    < 2^53 through 3 iterations at any fixture SF, switch to DECIMAL
    beyond). alpha < 1/lambda_max holds on this graph, so the
    truncated series is the convergent prefix.

    Scale: each iteration is ONE hash aggregation of the
    both-direction edge list joined to the node-grain score frame —
    the LPA/PageRank shape; iterations add scans, never new joins.
    The join pins shuffle_hash with the node-grain score frame as the
    build side — same round-15 rationale as `graph_label_propagation`:
    the shared edge frame's understated size estimate otherwise flips
    the planner into broadcasting the EDGE-grain side every iteration
    (slower here, broadcast-cap-fatal at 100 TB)."""
    _, und, deg = _copurchase_graph(spark, sf_dir)
    x = deg.select("u", F.lit(1000000).cast("bigint").alias("x"))
    for _ in range(3):
        s = (
            und.join(
                x.select(F.col("u").alias("v"), "x").hint("shuffle_hash"),
                "v",
            )
            .groupBy("u")
            .agg(F.sum("x").cast("bigint").alias("s"))
        )
        x = s.select(
            "u",
            (
                F.lit(1000000)
                + F.expr("(2 * s + 16) div 32")
            ).cast("bigint").alias("x"),
        )
    return topk(x, "x", 20, higher_is_better=True, tie_cols=["u"]).select(
        F.col("u").alias("node"), F.col("x").alias("katz_micro")
    )
