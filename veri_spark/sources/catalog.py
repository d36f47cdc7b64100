"""Table catalog over the driver-generated parquet datasets.

Maps the reference's named-dataset registry (reference: data/dataset.go:18-22,
88-97 — named ``Data`` instances resolved on access) onto plain
``spark.read.parquet`` with per-table normalization. At cluster scale these
would be catalog tables (``spark.read.table``); the loader keeps the same
shape so swapping the resolution layer is a one-liner.

Normalization performed here (and nowhere else, so every query sees the same
schema):

- ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it as
  bigint nanos (``spark.sql.legacy.parquet.nanosAsLong``). We truncate to
  microseconds — exactly what DuckDB/pyarrow do when they coerce ns → us —
  and expose TIMESTAMP_NTZ so no session-timezone shift is ever applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from veri_spark.session import prepare_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table from ``sf_dir``, normalized.

    Filters and projections applied by callers push down to the parquet scan
    (the normalization below is a projection, not a barrier).
    """
    prepare_session(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → us truncation, matching DuckDB's coercion of the same file.
        # integer `div`, NOT floor(ts / 1000): ns values (~1.7e18) exceed
        # double's 53-bit exact range, so float division is off by ±1 us.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once: ``load_tables(spark, d, 'orders', 'lineitem')``."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def load_json_lines(
    spark: SparkSession,
    path: str,
    vector_col: str = "embedding",
    label_col: str = "title",
) -> DataFrame:
    """JSON-lines datum source (reference S7: load_data_from_json,
    data/data_test.go:70-96 — rows of ``{title, embedding}``).

    The explicit schema skips Spark's sampling-based inference pass (one
    fewer full read of the input) and pins the vector element type to FLOAT,
    matching the datum schema. The reference loader uses the title as both
    label and group label; we project the same shape.
    """
    prepare_session(spark)
    df = spark.read.schema(
        f"{label_col} string, {vector_col} array<float>"
    ).json(path)
    return df.select(
        F.col(vector_col).alias("feature"),
        F.col(label_col).alias("group_label"),
        F.col(label_col).alias("label"),
        F.lit(0).cast("bigint").alias("version"),
    )


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> list[str]:
    """Register the catalog tables as temp views so the full engine surface
    is reachable from ``spark.sql`` (the reference has no SQL; Spark gives
    it free). Returns the registered view names."""
    use = list(names or TABLES)
    for n in use:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
    return use
