"""Streaming windows (batch/stream parity) and multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from veri_spark.multimodal.binary import (
    FEATURE_DIM,
    decode_features,
    decode_stub,
    fake_media_table,
    frame_sample,
)
from veri_spark.sources.catalog import load_table
from veri_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_agg,
    stream_events,
    tumbling_window_agg,
)

SF_DIR = "/root/testdata/sf0.001"


def test_tumbling_batch(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = tumbling_window_agg(ev)
    rows = out.collect()
    assert rows and set(out.columns) == {
        "window_start", "window_end", "event_type", "n_events", "sum_value",
    }
    assert sum(r["n_events"] for r in rows) == ev.count()


def test_session_window_batch(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = session_window_agg(ev, gap="30 minutes").collect()
    assert out
    assert sum(r["n_events"] for r in out) == ev.count()


def test_stream_matches_batch(spark, tmp_path):
    """The same windowed aggregation under readStream equals the batch
    result — the streaming extension's correctness check."""
    # cast batch ts to TIMESTAMP to match the stream's watermark-compatible
    # type (same instants; session tz is UTC)
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
        for r in tumbling_window_agg(ev).collect()
    }
    stream = stream_events(spark, SF_DIR)
    assert stream.isStreaming
    got = run_stream_to_memory(
        tumbling_window_agg(stream), "t_tumbling_test", timeout_s=120
    )
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
        for r in got.collect()
    }
    assert streamed == batch


def test_decode_stub_gating():
    with pytest.raises(NotImplementedError):
        decode_stub(b"payload")
    f = decode_stub(b"payload", deterministic_fake=True)
    assert len(f) == FEATURE_DIM
    assert f == decode_stub(b"payload", deterministic_fake=True)  # deterministic


def test_decode_features_plumbing(spark):
    media = fake_media_table(spark, n=30)
    out = decode_features(media).collect()
    assert len(out) == 30
    by_id = {r["media_id"]: r for r in out}
    assert all(len(r["feature"]) == FEATURE_DIM for r in out)
    assert by_id[3]["n_bytes"] == len(b"media-payload-3" * 4)
    # identical payload bytes -> identical features (content-addressed)
    assert by_id[0]["feature"] == [
        pytest.approx(x) for x in decode_stub(b"media-payload-0", True)
    ]


def test_frame_sample_explosion(spark):
    media = fake_media_table(spark, n=12)
    frames = frame_sample(media, every_ms=1000).collect()
    videos = media.filter("kind = 'video'").select("media_id", "duration_ms").collect()
    want = sum(max(r["duration_ms"], 1) // 1000 + (1 if max(r["duration_ms"],1) % 1000 else 0) for r in videos)
    # one frame per started second per video
    import math
    want = sum(math.ceil(max(r["duration_ms"], 1) / 1000) for r in videos)
    assert len(frames) == want
    assert all(len(r["feature"]) == FEATURE_DIM for r in frames)


def test_stateful_running_stats(spark):
    """applyInPandasWithState: streamed per-group stats equal the batch
    aggregate after the single micro-batch drains."""
    from veri_spark.streaming.stateful import running_group_stats

    stream = stream_events(spark, SF_DIR)
    stats = running_group_stats(stream, group_col="event_type")
    q = (
        stats.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["group_key"]: (r["n"], round(r["sum_value"], 6))
        for r in spark.table("running_stats").collect()
    }
    from veri_spark.sources.catalog import load_table
    import pyspark.sql.functions as F

    expected = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected


def test_streaming_dedup_within_watermark(spark):
    """Streaming dedup on the datum key (the streaming form of S2's
    change-dedup, data/newsync.go:43-57): duplicates arriving within the
    watermark are dropped; state for older keys is evictable."""
    stream = stream_events(spark, SF_DIR)
    doubled = stream.unionByName(stream)  # every event arrives twice
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    from veri_spark.sources.catalog import load_table

    n_expected = load_table(spark, SF_DIR, "events").count()
    assert spark.table("dedup_stream").count() == n_expected


def test_stream_stream_interval_join(spark):
    """interval_join on streams: each purchase joins clicks by the same
    user within the preceding hour; watermark + bounded interval let Spark
    evict join state. The streaming result must equal the SAME helper run
    on the batch frames (and an independently-written raw batch join)."""
    import pyspark.sql.functions as F
    from veri_spark.sources.catalog import load_table
    from veri_spark.streaming.windows import interval_join

    def sides(ev):
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("p_id"), "user_id", "ts")
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("c_id"), "user_id", "ts")
        return p, c

    joined = interval_join(
        *sides(stream_events(spark, SF_DIR)),
        on="user_id", lower="-1 hours", upper="0 seconds",
    )
    assert set(joined.columns) == {"p_id", "user_id", "ts", "c_id", "ts__r"}
    q = (
        joined.writeStream.format("memory").queryName("ssjoin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("ssjoin").count()

    ev = load_table(spark, SF_DIR, "events")
    batch = interval_join(
        *sides(ev), on="user_id", lower="-1 hours", upper="0 seconds"
    ).count()
    p, c = sides(ev)
    raw = p.join(
        c.withColumnRenamed("user_id", "c_user").withColumnRenamed("ts", "c_ts"),
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("ts")),
    ).count()
    assert got == batch == raw and got > 0


def test_multimodal_features_feed_knn(spark):
    """Composition: media -> frame features -> KNN search over frames. The
    decoded feature column is a first-class vector: the whole search
    pipeline (score exprs, top-k) runs on it unchanged."""
    from veri_spark.multimodal.binary import fake_media_table, frame_sample
    from veri_spark.operators.search import SearchConfig, search

    frames = frame_sample(fake_media_table(spark, n=24), every_ms=2000)
    q_row = frames.first()
    out = search(
        frames,
        [float(x) for x in q_row["feature"]],
        SearchConfig(score_func="CosineSimilarity", limit=5),
        vector_col="feature",
        id_cols=["media_id", "frame_ts_ms"],
    ).collect()
    assert len(out) == 5
    assert (out[0]["media_id"], out[0]["frame_ts_ms"]) == (
        q_row["media_id"], q_row["frame_ts_ms"],
    )
    assert out[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_streaming_materialized_aggregate(spark, tmp_path):
    """Incrementally-maintained aggregate (materialized-view pattern):
    foreachBatch merges each micro-batch's windowed counts into a parquet
    state table; after the stream drains it equals the batch aggregate."""
    import os
    import pyspark.sql.functions as F
    from veri_spark.sources.catalog import load_table

    state_dir = str(tmp_path / "agg_state")

    def merge(batch_df, _batch_id):
        agg = batch_df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).select(F.col("w.start").alias("ws"), "event_type", "n")
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            agg = (
                prev.unionByName(agg)
                .groupBy("ws", "event_type")
                .agg(F.sum("n").alias("n"))
            )
        agg.write.mode("overwrite").parquet(state_dir + ".tmp")
        out = batch_df.sparkSession.read.parquet(state_dir + ".tmp")
        out.write.mode("overwrite").parquet(state_dir)

    stream = stream_events(spark, SF_DIR)
    q = (
        stream.writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.read.parquet(state_dir).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    expected = {
        (r["ws"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == expected


def test_watermark_drops_late_rows(spark, tmp_path):
    """ST2/ST3 ingest-path analog with event-time semantics: a row arriving
    AFTER the watermark has passed its window is dropped by the streaming
    aggregation — the late-data bound that keeps state finite at 100 TB.

    Three micro-batches (maxFilesPerTrigger=1, files ordered by mtime): the
    first carries on-time rows plus a fast-forward row that advances the
    watermark past the first window's end; a second on-time batch locks the
    advanced watermark in (the file source updates the watermark with a
    one-batch lag under availableNow); the third carries a late row inside
    the already-finalized window. Append mode emits the finalized window
    WITHOUT the late row — had it been on time, n would be 4."""
    import datetime
    import glob
    import os
    import shutil
    import time

    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    T = datetime.datetime(2026, 1, 1, 10, 0, 0)
    schema = "ts timestamp, event_type string, value double"

    def land(rows, name, mtime):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = os.path.join(src, f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    mins = datetime.timedelta
    now = time.time()
    land(
        [(T + mins(minutes=m), "click", 1.0) for m in (0, 15, 30)]
        + [(T + mins(hours=3), "click", 1.0)],  # advances watermark to 12:00
        "early",
        now - 200,
    )
    land([(T + mins(hours=3, minutes=5), "click", 1.0)], "mid", now - 100)
    land([(T + mins(minutes=45), "click", 1.0)], "late", now)  # < watermark

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_demo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["w"]["start"], r["n"]) for r in spark.table("wm_demo").collect()}
    # only the finalized 10:00 window is emitted, with the 3 ON-TIME rows;
    # the 10:45 straggler (event time < watermark) never reached the state
    assert got == {(T, 3)}
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 1


def test_ensure_event_time_normalizes_all_source_types(spark):
    """ensure_event_time must yield TIMESTAMP (watermark-compatible) and
    the same instant for bigint-nanos, TIMESTAMP_NTZ, and TIMESTAMP
    inputs — the three ways environments read the events parquet."""
    from datetime import datetime

    from veri_spark.streaming.windows import ensure_event_time

    inst = datetime(2024, 3, 1, 12, 30, 45, 123456)
    nanos = int(inst.timestamp() * 1_000_000) * 1000  # exact us in ns

    cases = [
        spark.createDataFrame([(nanos,)], "ts bigint"),
        spark.createDataFrame([(inst,)], "ts timestamp_ntz"),
        spark.createDataFrame([(inst,)], "ts timestamp"),
    ]
    vals = []
    for df in cases:
        out = ensure_event_time(df)
        assert dict(out.dtypes)["ts"] == "timestamp", df.dtypes
        vals.append(out.first()["ts"])
    assert vals[0] == vals[1] == vals[2] == inst


def test_streaming_heavy_hitters_guarantee(spark):
    """Misra-Gries streaming sketch: after the stream drains, every key
    whose true per-shard frequency exceeds N_shard/(capacity+1) must be
    tracked, and every estimate must be a lower bound within N_shard/(cap+1)
    of the true count (the MG error guarantee)."""
    from veri_spark.streaming.stateful import heavy_hitter_sketch
    from veri_spark.sources.catalog import load_table
    import pyspark.sql.functions as F

    capacity = 8
    shards = 4
    stream = stream_events(spark, SF_DIR)
    sketch = heavy_hitter_sketch(
        stream, key_col="user_id", shards=shards, capacity=capacity
    )
    q = (
        sketch.writeStream.format("memory")
        .queryName("hh_sketch")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["shard"], r["key"]): r["est_count"]
        for r in spark.table("hh_sketch").collect()
    }
    truth = {
        (r["shard"], r["key"]): r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .select(
            F.pmod(F.hash("user_id"), F.lit(shards)).cast("int").alias("shard"),
            F.col("user_id").cast("bigint").alias("key"),
        )
        .groupBy("shard", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    shard_n = {}
    for (s, _), n in truth.items():
        shard_n[s] = shard_n.get(s, 0) + n
    for (s, k), n in truth.items():
        bound = shard_n[s] / (capacity + 1)
        if n > bound:
            assert (s, k) in got, f"guaranteed heavy hitter {(s, k)} missing"
    for (s, k), est in got.items():
        true_n = truth.get((s, k), 0)
        assert est <= true_n, "MG estimate must be a lower bound"
        assert true_n - est <= shard_n[s] / (capacity + 1) + 1e-9


def _protobuf_available() -> bool:
    # the stateful-v2 Python worker speaks protobuf to the JVM
    # (pyspark/sql/streaming/proto/StateMessage_pb2); without the
    # google.protobuf package the driver worker crashes at init
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf, absent in this sandbox",
)
def test_first_seen_dedup_stateful_v2(spark):
    """transformWithStateInPandas (stateful v2, RocksDB store): one
    emission per distinct key with its first timestamp; duplicate counts
    add up to the stream total."""
    import pyspark.sql.functions as F
    from veri_spark.sources.catalog import load_table
    from veri_spark.streaming.stateful import first_seen_dedup

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stream_events(spark, SF_DIR)
        out = first_seen_dedup(stream, key_col="user_id")
        q = (
            out.writeStream.format("memory")
            .queryName("fsd")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.table("fsd").collect()
        emitted = [r for r in rows if r["first_ts"] is not None]
        ev = load_table(spark, SF_DIR, "events")
        n_users = ev.select("user_id").distinct().count()
        n_events = ev.count()
        assert len(emitted) == n_users
        assert len({r["key"] for r in emitted}) == n_users
        total = sum(r["n_dups_batch"] for r in rows) + len(emitted)
        assert total == n_events
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_ensure_event_time_all_source_types(spark):
    """ensure_event_time must normalize every ts physical type the events
    parquet can read as — bigint nanos, TIMESTAMP_NTZ, TIMESTAMP — to a
    watermark-compatible TIMESTAMP holding the same instant."""
    from datetime import datetime

    from veri_spark.streaming.windows import ensure_event_time

    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
    nanos = spark.createDataFrame([(base_us * 1000,)], "ts bigint")
    ntz = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, 0),)], "ts timestamp_ntz"
    )
    tstz = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, 0),)], "ts timestamp"
    )
    for df in (nanos, ntz, tstz):
        out = ensure_event_time(df)
        assert dict(out.dtypes)["ts"] == "timestamp"
        got = out.first()["ts"]
        assert got == datetime(2024, 1, 1, 0, 0, 0), df.dtypes
        # and withWatermark must accept it (the original failure mode)
        out.withWatermark("ts", "1 hour")


def test_misra_gries_update_multistep_decrement():
    """_mg_update with a batch increment larger than the current minimum
    must drain across multiple decrement rounds and keep counters exact
    under the MG invariant (sum of decrements equal across all keys)."""
    from veri_spark.streaming.stateful import _mg_update

    s = {1: 3, 2: 1}
    # capacity 2, insert key 3 with weight 5: round 1 decrements by 1
    # (evicting key 2), then key 3 inserts with the remaining 4
    _mg_update(s, 3, 5, capacity=2)
    assert s == {1: 2, 3: 4}
    # tracked-key fast path
    _mg_update(s, 1, 7, capacity=2)
    assert s == {1: 9, 3: 4}
    # full decrement that exactly drains the increment: nothing inserted
    s2 = {1: 5, 2: 5}
    _mg_update(s2, 9, 5, capacity=2)
    assert s2 == {}


# -- Real image-header decode (pure stdlib, no PIL) --------------------------

def _png(w, h, depth=8):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, 6, 0, 0, 0])
    )


def _jpeg(w, h, precision=8, extra_segments=1):
    out = b"\xff\xd8"
    for i in range(extra_segments):  # APP0-style skippable segments
        payload = bytes(14 + i)
        out += b"\xff\xe0" + (2 + len(payload)).to_bytes(2, "big") + payload
    return (
        out
        + b"\xff\xc0" + (17).to_bytes(2, "big")
        + bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03"
    )


def _gif(w, h, version=b"89a"):
    return b"GIF" + version + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x91\x00\x00"


def test_parse_image_header_formats():
    from veri_spark.multimodal.binary import parse_image_header

    assert parse_image_header(_png(640, 480)) == ("png", 640, 480, 8)
    assert parse_image_header(_png(1, 70000, depth=16)) == ("png", 1, 70000, 16)
    assert parse_image_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080, 8)
    # marker scan must skip MULTIPLE segments to reach SOF
    assert parse_image_header(_jpeg(33, 44, extra_segments=3)) == ("jpeg", 33, 44, 8)
    # SOF2 (progressive) carries dimensions too
    prog = _jpeg(12, 34).replace(b"\xff\xc0", b"\xff\xc2")
    assert parse_image_header(prog) == ("jpeg", 12, 34, 8)
    # standalone RST/TEM markers and FF padding must not desync the scan
    padded = b"\xff\xd8" + b"\xff\x01" + b"\xff\xff" + _jpeg(5, 6)[2:]
    assert parse_image_header(padded) == ("jpeg", 5, 6, 8)
    assert parse_image_header(_gif(320, 200)) == ("gif", 320, 200, 8)
    assert parse_image_header(_gif(7, 9, version=b"87a")) == ("gif", 7, 9, 8)


def test_parse_image_header_rejects_garbage():
    from veri_spark.multimodal.binary import parse_image_header

    assert parse_image_header(None) is None
    assert parse_image_header(b"") is None
    assert parse_image_header(b"plain text bytes") is None
    assert parse_image_header(_png(10, 10)[:20]) is None  # truncated IHDR
    # PNG signature but wrong first chunk type
    bad = bytearray(_png(10, 10)); bad[12:16] = b"IDAT"
    assert parse_image_header(bytes(bad)) is None
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x10") is None  # truncated JPEG
    assert parse_image_header(b"\xff\xd8\x00\x99") is None  # desynced marker
    # DHT (C4) must be skipped as a plain segment, not parsed as SOF
    dht_only = b"\xff\xd8" + b"\xff\xc4\x00\x04\x00\x00"
    assert parse_image_header(dht_only) is None
    assert parse_image_header(b"GIF89a\x01") is None  # truncated GIF


def test_image_dims_distributed(spark):
    """The mapInPandas path: mixed formats + an unparseable row in one
    DataFrame; NULLs for the bad row, exact dims for the rest."""
    from veri_spark.multimodal.binary import image_dims

    rows = [
        (0, _png(100, 50)),
        (1, _jpeg(640, 480)),
        (2, _gif(16, 16)),
        (3, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r for r in image_dims(df).collect()}
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("png", 100, 50)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("jpeg", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("gif", 16, 16)
    assert got[3]["format"] is None and got[3]["width"] is None


def test_streaming_windowed_distinct_sketch(spark):
    """HyperLogLog++ inside a streaming windowed aggregation: approximate
    distinct users per 12h tumbling window under readStream must equal
    the identical batch aggregation exactly (the sketch is deterministic
    for fixed inputs), and each estimate must land within 3*rsd of the
    exact distinct count — the mergeable-sketch property that lets a
    100 TB stream keep constant per-window state."""
    rsd = 0.05
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def windowed_distinct(df):
        return (
            df.groupBy(F.window("ts", "12 hours").alias("w"))
            .agg(F.approx_count_distinct("user_id", rsd).alias("apx_users"))
            .select(F.col("w.start").alias("ws"), "apx_users")
        )

    batch = {r["ws"]: r["apx_users"] for r in windowed_distinct(ev).collect()}
    got = run_stream_to_memory(
        windowed_distinct(stream_events(spark, SF_DIR)), "t_hll_win", timeout_s=120
    )
    streamed = {r["ws"]: r["apx_users"] for r in got.collect()}
    assert streamed == batch and len(streamed) > 0
    exact = {
        r["ws"]: r["n"]
        for r in ev.groupBy(F.window("ts", "12 hours").alias("w"))
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    for ws, apx in streamed.items():
        assert abs(apx - exact[ws]) <= 3 * rsd * exact[ws] + 1


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Checkpoint recovery (ST1's durability contract): a streaming
    aggregation stopped after batch 1 and RESTARTED from the same
    checkpoint location processes only the files that arrived while it
    was down — no reprocessing (the batch-1 file is not double-counted)
    and no loss (the batch-2 file is picked up). This is the property
    that makes every maintenance loop in the engine safe to crash:
    Structured Streaming's checkpoint owns offsets + state, the code
    only owns the transformation."""
    import pyspark.sql.functions as F  # noqa: PLC0415

    indir = tmp_path / "in"
    indir.mkdir()
    ckpt = str(tmp_path / "restart_ckpt")
    state_dir = str(tmp_path / "restart_state")

    def write_batch(rows, name):
        spark.createDataFrame(rows, "k string, v long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(indir / name))

    def merge(batch_df, batch_id):
        import os  # noqa: PLC0415

        agg = batch_df.groupBy("k").agg(F.sum("v").alias("s"))
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            agg = prev.unionByName(agg).groupBy("k").agg(F.sum("s").alias("s"))
        agg.write.mode("overwrite").parquet(state_dir + ".tmp")
        out = batch_df.sparkSession.read.parquet(state_dir + ".tmp")
        out.write.mode("overwrite").parquet(state_dir)

    def run_once():
        stream = (
            spark.readStream.schema("k string, v long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(indir / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(merge)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    write_batch([("a", 1), ("b", 2)], "batch1")
    run_once()
    first = {r["k"]: r["s"] for r in spark.read.parquet(state_dir).collect()}
    assert first == {"a": 1, "b": 2}

    # stream is stopped; new data arrives; restart from the SAME checkpoint
    write_batch([("a", 10), ("c", 5)], "batch2")
    run_once()
    second = {r["k"]: r["s"] for r in spark.read.parquet(state_dir).collect()}
    # batch1 NOT reprocessed (a would be 12 if it were), batch2 fully applied
    assert second == {"a": 11, "b": 2, "c": 5}
