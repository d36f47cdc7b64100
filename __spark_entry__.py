"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KNN query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md section 2
as (PySpark program, DuckDB oracle) pairs — see veri_spark/plans/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from veri_spark.plans.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: cosine-similarity KNN over
    the embeddings table (the reference's core operation — K1+K3+K4)."""
    return QUERIES["knn_cosine"](spark, "/root/testdata/sf0.001")


def _released(name: str, fn: Callable[[SparkSession, str], DataFrame]):
    """Free the PREVIOUS query's persisted blocks before building this one.

    Many plan builders pin small intermediates (`.persist()`) that the plan
    reuses across branches; a full multi-hundred-query sweep in one session
    would otherwise accumulate those blocks in executor storage memory
    (round-6 advisor finding). Unpersisting at the NEXT query's build time is
    safe: the prior query's result has already been collected by then, and
    even if a harness interleaves builds, unpersist only drops the cache
    marker — recomputation keeps results correct. ``localCheckpoint`` RDDs
    are freed separately by Spark's ContextCleaner once unreferenced."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass  # cache cleanup is best-effort; never fail the query for it
        return fn(spark, sf_dir)

    run.__name__ = name
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: _released(name, fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/rounding)."""
    return dict(ORACLES)
