"""Registry contract: every query runs at sf0.001 and produces rows with a
stable schema; every oracle key corresponds to a query.
(Value-level parity is tools/check_oracle.py / the driver's gate.)
"""

import pytest

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
