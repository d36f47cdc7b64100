"""Per-payer attribution probe for the shared co-purchase graph family
(r14 verdict task 1: graph_label_propagation 2.89 -> 5.56 s and
graph_katz_centrality 1.93 -> 2.76 s regressed on UNTOUCHED code after
the `_copurchase_edges` basket-explode rewrite; the cold-payer story was
plausible but unproven).

Replays the graph family in round-14 EVEN-round bench order (census
first, 2 runs per HEAVY_TWO_RUN entry, clearCache between queries) in a
fresh session and logs, for every session-shared frame, WHICH query was
executing when the frame was created — the query whose first action pays
the build. Modes compare edge-build formulations on identical content:

    python tools/probe_graph_family.py current   # HEAD basket-explode
    python tools/probe_graph_family.py oldedges  # r13 join formulation
    python tools/probe_graph_family.py repart    # basket + repartition(u,v)

Prints one JSON object: per-query run times + the build-attribution log.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
import veri_spark.plans.graph as G  # noqa: E402
from veri_spark.plans.registry import QUERIES  # noqa: E402
from veri_spark.session import get_spark  # noqa: E402
from veri_spark.sources.catalog import load_table  # noqa: E402

FAMILY = [
    n
    for n in bench.BENCH_QUERIES
    if n.startswith("graph_")
    or n in ("pagerank_converged", "pagerank_step",
             "copurchase_lift_chi2", "hits_authorities_bipartite")
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "current"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("probe-graph-" + mode)
    QUERIES["knn_euclidean"](spark, "/root/testdata/sf0.001").collect()

    current = {"q": "<setup>"}
    created = []
    orig_shared = G._shared_frame

    def logged_shared(spark_, sf, name, build):
        key = (spark_.sparkContext.applicationId, sf, name)
        fresh = key not in G._SHARED
        df = orig_shared(spark_, sf, name, build)
        if fresh:
            created.append({"frame": name, "during": current["q"]})
        return df

    G._shared_frame = logged_shared

    if mode == "oldedges":
        # seed the session edge cache with the ROUND-13 join formulation
        # (identical content, different physical build/partitioning)
        def old_build():
            li = (
                load_table(spark, sf_dir, "lineitem")
                .select("l_orderkey", "l_partkey")
                .distinct()
            )
            a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
            b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
            return (
                a.join(b, "l_orderkey")
                .filter(F.col("u") < F.col("v"))
                .select("u", "v")
                .distinct()
            )

        key = (spark.sparkContext.applicationId, sf_dir, "copurchase_edges")
        G._SHARED[key] = old_build().localCheckpoint(eager=False)
        created.append({"frame": "copurchase_edges", "during": "<seeded-old>"})
    elif mode == "repart":
        def repart_build():
            baskets = (
                load_table(spark, sf_dir, "lineitem")
                .groupBy("l_orderkey")
                .agg(F.collect_set("l_partkey").alias("ps"))
            )
            edges = (
                baskets.select(F.explode("ps").alias("u"), "ps")
                .select("u", F.explode("ps").alias("v"))
                .filter(F.col("u") < F.col("v"))
                .distinct()
            )
            return edges.repartition(
                spark.sparkContext.defaultParallelism, "u", "v"
            )

        key = (spark.sparkContext.applicationId, sf_dir, "copurchase_edges")
        G._SHARED[key] = repart_build().localCheckpoint(eager=False)
        created.append({"frame": "copurchase_edges", "during": "<seeded-repart>"})

    timings = {}
    for name in FAMILY:
        spark.catalog.clearCache()
        current["q"] = name
        runs = []
        for _ in range(2 if name in bench.HEAVY_TWO_RUN else 3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            runs.append(round(time.time() - t0, 3))
        timings[name] = runs
    # edge frame physical shape: partition count of the checkpointed RDD
    key = (spark.sparkContext.applicationId, sf_dir, "copurchase_edges")
    nparts = (
        G._SHARED[key].rdd.getNumPartitions() if key in G._SHARED else None
    )
    print(json.dumps({
        "mode": mode,
        "edge_partitions": nparts,
        "timings": timings,
        "builds": created,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
