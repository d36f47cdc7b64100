"""Plan-shape audit: physical-plan vitals for every registry query.

For each query at the given sf dir, reports:

- exchanges: shuffle count in the adaptive final plan (lower is better;
  map-only = 0)
- bhj / smj: broadcast vs sort-merge join counts
- pushed: number of scans with non-empty PushedFilters
- wsc: WholeStageCodegen span count (JVM-compiled pipeline stages)

Usage: python tools/plan_audit.py [sf_dir] [query ...] [--markdown]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from veri_spark.plans.registry import QUERIES  # noqa: E402
from veri_spark.session import get_spark  # noqa: E402


def audit_plan(df) -> dict[str, int]:
    # audit the static physical plan: structurally faithful (one print per
    # operator). The post-execution AQE string reprints materialized stage
    # subtrees and double-counts; at runtime AQE only improves on these
    # numbers (join conversion, partition coalescing, skew splits).
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"\bReusedExchange\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]+\]", plan)),
        # codegen spans appear as "WholeStageCodegen (n)" in formatted plans
        # and as "*(n)" operator prefixes in the simple string
        "wsc": len(set(re.findall(r"\*\((\d+)\)", plan))
                   or re.findall(r"WholeStageCodegen", plan)),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    markdown = "--markdown" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            stats = audit_plan(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            continue
        rows.append((name, stats))

    if markdown:
        print("| query | exchanges | bhj | smj | pushed scans | codegen spans |")
        print("|---|---|---|---|---|---|")
        for name, s in rows:
            print(
                f"| {name} | {s['exchanges']} | {s['bhj']} | {s['smj']} "
                f"| {s['pushed']} | {s['wsc']} |"
            )
    else:
        for name, s in rows:
            print(
                f"{name:32s} exchanges={s['exchanges']:2d} bhj={s['bhj']} "
                f"smj={s['smj']} pushed={s['pushed']} wsc={s['wsc']}"
            )
    total = sum(s["exchanges"] for _, s in rows)
    print(f"\n{len(rows)} queries, {total} total exchanges")


if __name__ == "__main__":
    main()
