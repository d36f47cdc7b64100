"""Unit tests for the as-of join (operators/asof.py) on hand-built frames."""

from datetime import datetime

import pytest

from veri_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", datetime(2024, 1, 1, 10, 0, 0)),
            (2, "u1", datetime(2024, 1, 1, 12, 0, 0)),
            (3, "u2", datetime(2024, 1, 1, 9, 0, 0)),   # before any right row
            (4, "u3", datetime(2024, 1, 1, 11, 0, 0)),  # key with no right rows
        ],
        "id bigint, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", datetime(2024, 1, 1, 9, 30, 0), 1.0),
            ("u1", datetime(2024, 1, 1, 10, 0, 0), 2.0),   # ties left id=1 exactly
            ("u1", datetime(2024, 1, 1, 11, 59, 0), 3.0),
            ("u2", datetime(2024, 1, 1, 9, 30, 0), 4.0),
        ],
        "user string, ts timestamp, v double",
    )
    return left, right


def test_asof_inclusive_and_nulls(frames):
    left, right = frames
    out = asof_join(left, right, on=["user"], payload_cols=["v"])
    got = {r["id"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    assert len(got) == 4
    # left id=1 at 10:00 matches the 10:00 right row (<= is inclusive)
    assert got[1] == (datetime(2024, 1, 1, 10, 0, 0), 2.0)
    # id=2 takes the latest earlier row, not the first
    assert got[2] == (datetime(2024, 1, 1, 11, 59, 0), 3.0)
    # id=3: right rows exist for u2 but all later -> NULL match
    assert got[3] == (None, None)
    # id=4: key absent from right entirely -> NULL match
    assert got[4] == (None, None)


def test_asof_tolerance(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["user"], payload_cols=["v"], tolerance_seconds=120
    )
    got = {r["id"]: r["asof_v"] for r in out.collect()}
    # id=2's best match is 1 min stale (within 120 s); id=1's is 0 s stale
    assert got[1] == 2.0 and got[2] == 3.0
    # others have no in-tolerance match
    assert got[3] is None and got[4] is None


def test_asof_preserves_left_columns_and_count(frames):
    left, right = frames
    out = asof_join(left, right, on=["user"], payload_cols=["v"])
    assert set(out.columns) == {"id", "user", "ts", "asof_ts", "asof_v"}
    assert out.count() == left.count()


def test_asof_forward(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["user"], payload_cols=["v"], direction="forward"
    )
    got = {r["id"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    # id=1 at 10:00 matches the 10:00 right row (>= is inclusive), not 11:59
    assert got[1] == (datetime(2024, 1, 1, 10, 0, 0), 2.0)
    # id=2 at 12:00: all right rows earlier -> NULL
    assert got[2] == (None, None)
    # id=3 at 9:00 takes the EARLIEST later row
    assert got[3] == (datetime(2024, 1, 1, 9, 30, 0), 4.0)
    # id=4: key absent from right -> NULL
    assert got[4] == (None, None)


def test_asof_forward_tolerance(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["user"], payload_cols=["v"],
        direction="forward", tolerance_seconds=600,
    )
    got = {r["id"]: r["asof_v"] for r in out.collect()}
    assert got[1] == 2.0      # 0 s ahead, within 600 s
    assert got[3] is None     # 30 min ahead, outside tolerance
    assert got[2] is None and got[4] is None


def test_asof_bad_direction(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on=["user"], direction="sideways")


def test_asof_nearest(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["user"], payload_cols=["v"], direction="nearest"
    )
    got = {r["id"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    # id=1 at 10:00: exact-ts right row wins at distance 0 (backward side)
    assert got[1] == (datetime(2024, 1, 1, 10, 0, 0), 2.0)
    # id=2 at 12:00: only earlier rows exist; nearest is 11:59
    assert got[2] == (datetime(2024, 1, 1, 11, 59, 0), 3.0)
    # id=3 at 9:00: only a LATER row exists (9:30) -> forward candidate used
    assert got[3] == (datetime(2024, 1, 1, 9, 30, 0), 4.0)
    # id=4: no right rows for the key at all
    assert got[4] == (None, None)


def test_asof_nearest_prefers_closer_and_ties_backward(spark):
    left = spark.createDataFrame(
        [(1, "u", datetime(2024, 1, 1, 10, 0, 0)),
         (2, "u", datetime(2024, 1, 1, 12, 0, 0))],
        "id bigint, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", datetime(2024, 1, 1, 9, 50, 0), 1.0),    # 10 min before id=1
         ("u", datetime(2024, 1, 1, 10, 5, 0), 2.0),    # 5 min after id=1
         ("u", datetime(2024, 1, 1, 11, 0, 0), 3.0),    # 60 min before id=2
         ("u", datetime(2024, 1, 1, 13, 0, 0), 4.0)],   # 60 min after id=2
        "user string, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["user"], payload_cols=["v"],
                    direction="nearest")
    got = {r["id"]: r["asof_v"] for r in out.collect()}
    # id=1: forward (5 min) beats backward (10 min)
    assert got[1] == 2.0
    # id=2: exact tie (60 min both ways) -> backward wins
    assert got[2] == 3.0


def test_asof_nearest_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, on=["user"], payload_cols=["v"],
                    direction="nearest", tolerance_seconds=120)
    got = {r["id"]: r["asof_v"] for r in out.collect()}
    # id=1: distance 0 -> kept; id=2: 60 s backward -> kept
    assert got[1] == 2.0 and got[2] == 3.0
    # id=3: nearest is 30 min away, outside 120 s -> voided
    assert got[3] is None and got[4] is None
