"""Per-run timing probe for one registered query, mimicking the bench
loop (clearCache between QUERIES, 3 timed runs back-to-back).

Usage:
    python tools/time_query.py <query_name> [repo_root] [sf_dir] [runs]

Prints each run's wall time separately so cache-reuse effects between
run 1 and runs 2/3 are visible (the bench reports the median, which
hides whether the first run paid a build the later runs reused).
Used to attribute the round-12 `embedding_pairwise_cosine_moments`
level shift (VERDICT r12, What's wrong #1).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    name = sys.argv[1]
    root = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    nruns = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sys.path.insert(0, root)
    from veri_spark.plans.registry import QUERIES
    from veri_spark.session import get_spark

    spark = get_spark("time-query")
    # same JIT warmup the bench does
    QUERIES["knn_euclidean"](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()
    runs = []
    for _ in range(nruns):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).collect()
        runs.append(round(time.time() - t0, 3))
    s = sorted(runs)
    mid = len(s) // 2
    med = s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)
    print(json.dumps({"query": name, "root": root, "runs": runs,
                      "median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
