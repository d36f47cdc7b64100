import sys

import pytest

sys.path.insert(0, "/root/repo")

from veri_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("veri-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_datums(spark):
    """The reference's 3-datum unit fixture (data/data_test.go:34-40,
    FIXTURES.md section 1): hand-checkable 3-dim vectors."""
    rows = [
        ([0.1, 0.2, 0.3], "a", "a", 0),
        ([0.2, 0.3, 0.4], "b", "b", 0),
        ([0.2, 0.3, 0.7], "c", "c", 0),
    ]
    return spark.createDataFrame(
        rows, "feature array<float>, group_label string, label string, version bigint"
    )
