"""Custom stateful streaming: running per-group statistics with state TTL.

The reference maintains per-dataset statistics continuously in a background
loop (Data.Run -> Process, data/data.go:145-168, data/newsync.go:93-227:
count N, centroid, max distance) and expires idle state by retention
(data/dataset.go:58-63). This module is that maintenance loop re-expressed
as an incremental streaming operator: ``applyInPandasWithState`` keeps one
small state row per group and folds each Arrow micro-batch into it — no
rescan of history, unlike the reference's full-table Process pass.

Scale notes: state lives in the state store partitioned by the group key, so
cardinality (not data volume) bounds memory; a processing-time timeout evicts
idle groups (the retention analog, ST3). The per-batch work is
O(batch rows) with Arrow transfer, and the shuffle is only on the group key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "group_key string, n bigint, sum_value double, min_value double, "
    "max_value double, last_ts timestamp"
)
STATE_SCHEMA = "n bigint, sum_value double, min_value double, max_value double, last_ts_us bigint"


def _fold_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # retention eviction (ST3): drop idle group state, emit nothing
        state.remove()
        return
    if state.exists:
        n, sum_v, min_v, max_v, last_us = state.get
    else:
        n, sum_v, min_v, max_v, last_us = 0, 0.0, float("inf"), float("-inf"), 0
    for pdf in pdfs:
        n += len(pdf)
        sum_v += float(pdf["value"].sum())
        min_v = min(min_v, float(pdf["value"].min()))
        max_v = max(max_v, float(pdf["value"].max()))
        last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((n, sum_v, min_v, max_v, last_us))
    state.setTimeoutDuration(24 * 3600 * 1000)  # evict groups idle for a day
    yield pd.DataFrame(
        {
            "group_key": [str(key[0])],
            "n": [n],
            "sum_value": [sum_v],
            "min_value": [min_v],
            "max_value": [max_v],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_group_stats(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Continuously-updated per-group stats over a stream of (group, value,
    ts) rows — the incremental form of operators/stats.data_info's N/extent
    components, emitted once per group per micro-batch."""
    src = events.selectExpr(f"CAST({group_col} AS STRING) AS g", "value", "ts")
    return src.groupBy("g").applyInPandasWithState(
        _fold_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
