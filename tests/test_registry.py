"""Registry contract: every query runs at sf0.001 and produces rows with a
stable schema; every oracle key corresponds to a query.
(Value-level parity is tools/check_oracle.py / the driver's gate.)
"""

import pytest
from pyspark.sql import functions as F

from veri_spark.plans.registry import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_returns_rows(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    assert df.columns, name
    assert len(rows) > 0, f"{name} returned no rows"


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert len(df.collect()) > 0
    assert set(m.oracle_sql()) <= set(m.queries())


def test_sql_interface_over_views(spark):
    """spark.sql over registered views: the SQL front door works against
    the same normalized catalog the DataFrame queries use."""
    from veri_spark.sources.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001", "events", "lineitem")
    row = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).first()
    assert row["n"] > 0
    # events view carries the nanos->timestamp normalization
    ts_type = dict(spark.table("events").dtypes)["ts"]
    assert ts_type.startswith("timestamp")


def test_partitioned_write_prunes(spark, tmp_path):
    """Date-partitioned layout: a day predicate becomes partition pruning
    (the 100 TB events-table layout; the filter never touches other days)."""
    from veri_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(path)
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    expected = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expected and expected > 0
