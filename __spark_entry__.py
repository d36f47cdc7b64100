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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/rounding)."""
    return dict(ORACLES)
