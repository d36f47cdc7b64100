"""Round-13: SemDeDup semantic dedup (r12 verdict task 5) against a
literal pure-Python model — integer micro-quantized assignment, within-
cell pairwise cosine, keep-lowest-id survivorship, per-source ledger."""

from __future__ import annotations

import math
from collections import defaultdict

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _brute(spark):
    emb = sorted(
        (int(r["vec_id"]), [float(v) for v in r["embedding"]])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    )
    docs = {
        int(r["doc_id"]): (r["source"], int(r["n_chars"]))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    q = {
        vid: [math.floor(1e6 * v + 0.5) for v in vec] for vid, vec in emb
    }
    seeds = {vid: q[vid] for vid in q if vid < 16}
    cell = {}
    for vid, xv in q.items():
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(xv, sv)), cid)
            for cid, sv in seeds.items()
        )
        cell[vid] = best[1]
    nq = {vid: sum(v * v for v in xv) for vid, xv in q.items()}
    by_cell = defaultdict(list)
    for vid in sorted(q):
        by_cell[cell[vid]].append(vid)
    removed = set()
    for members in by_cell.values():
        for i, ia in enumerate(members):
            for ib in members[i + 1 :]:
                dot = sum(p * r for p, r in zip(q[ia], q[ib]))
                cos = float(dot) / (math.sqrt(nq[ia]) * math.sqrt(nq[ib]))
                if cos >= 0.42:
                    removed.add(ib)
    ledger = defaultdict(lambda: [0, 0, 0, 0])
    for did, (source, n_chars) in docs.items():
        if did not in q:
            continue
        row = ledger[source]
        row[0] += 1
        row[2] += n_chars
        if did in removed:
            row[1] += 1
            row[3] += n_chars
    return {
        s: tuple(v) for s, v in ledger.items()
    }, removed


def test_semdedup_matches_brute_force(spark):
    want, removed = _brute(spark)
    got = {
        r["source"]: (
            r["n_embedded"],
            r["n_removed"],
            r["chars_embedded"],
            r["chars_removed"],
        )
        for r in QUERIES["semantic_dedup_semdedup"](spark, SF).collect()
    }
    assert got == want
    # the fixture must exercise real survivorship, not an empty pass
    assert sum(v[1] for v in want.values()) == len(removed) > 0


def test_wav_parser_reads_real_stdlib_wave_files(spark, tmp_path):
    """parse_wav_header against bytes written by Python's own stdlib
    `wave` module — the parser must read REAL encoder output, not just
    its own synthesis — plus truncation/corruption safety, and the
    Spark query agrees with a per-row Python recomputation."""
    import wave

    from veri_spark.multimodal.binary import parse_wav_header

    for sr, ch, nframes in ((8000, 1, 1234), (44100, 2, 999)):
        p = tmp_path / f"t_{sr}_{ch}.wav"
        w = wave.open(str(p), "wb")
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(b"\x00" * (nframes * ch * 2))
        w.close()
        got = parse_wav_header(open(p, "rb").read())
        assert got == (sr, ch, 16, nframes * ch * 2, sr * ch * 2)
    assert parse_wav_header(b"RIFF") is None
    assert parse_wav_header(b"x" * 64) is None
    assert parse_wav_header(None) is None
    # magic-valid header with a ZERO byte rate: must be unparseable (a
    # NULL row), never a divide-by-zero that kills the scan
    import struct

    zero_rate = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 1, 0, 4, 1)
        + b"data" + struct.pack("<I", 0)
    )
    assert parse_wav_header(zero_rate) is None
    from veri_spark.multimodal.binary import audio_meta

    bad = spark.createDataFrame(
        [(1, bytearray(zero_rate))], "media_id bigint, media binary"
    )
    row = audio_meta(bad).collect()[0]
    assert row["duration_ms"] is None and row["sample_rate"] is None

    from veri_spark.plans.registry import QUERIES

    rows = QUERIES["multimodal_audio_wav_meta"](spark, SF).collect()
    docs = {
        int(r["doc_id"]): int(r["n_chars"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    srs = [8000, 16000, 22050, 44100, 48000]
    assert len(rows) == len(docs)
    for r in rows:
        sr = srs[r["doc_id"] % 5]
        ch = 1 + r["doc_id"] % 2
        dsz = 2000 + docs[r["doc_id"]] * 100
        assert (r["sample_rate"], r["channels"], r["bits"]) == (sr, ch, 16)
        assert r["duration_ms"] == (1000 * dsz) // (sr * ch * 2)


def test_mp4_parser_walks_real_box_structure(spark):
    """parse_mp4_meta must walk REAL box structures: boxes in either
    order, an extra free box between them, corrupted sizes rejected —
    and the Spark query agrees with a per-row Python recomputation."""
    import struct

    from veri_spark.multimodal.binary import parse_mp4_meta

    def ftyp(brand):
        return struct.pack(">I", 20) + b"ftyp" + brand + struct.pack(
            ">I", 0x200
        ) + b"mp41"

    def moov(ts, dur):
        mvhd = (
            struct.pack(">I", 108) + b"mvhd" + b"\x00" * 12
            + struct.pack(">II", ts, dur) + b"\x00" * 80
        )
        return struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd

    free = struct.pack(">I", 12) + b"free" + b"\x00" * 4
    assert parse_mp4_meta(ftyp(b"isom") + moov(90000, 4500)) == (
        "isom", 90000, 4500,
    )
    # boxes separated by a free box, and moov-before-ftyp order
    assert parse_mp4_meta(ftyp(b"mp42") + free + moov(600, 30)) == (
        "mp42", 600, 30,
    )
    assert parse_mp4_meta(moov(1000, 99) + ftyp(b"avc1")) == (
        "avc1", 1000, 99,
    )
    # corrupted: size field overruns the buffer
    bad = struct.pack(">I", 9999) + b"ftypisom"
    assert parse_mp4_meta(bad) is None
    assert parse_mp4_meta(ftyp(b"isom")) is None  # no moov -> no timescale
    # ISO BMFF size conventions (14496-12 §4.2, r13 advisor): size==1
    # carries a 64-bit largesize after the type; size==0 extends the box
    # to the end of the enclosing space (file for top-level boxes)
    m = moov(48000, 960)
    large_moov = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(m) - 8)
        + m[8:]
    )
    assert parse_mp4_meta(ftyp(b"isom") + large_moov) == ("isom", 48000, 960)
    to_eof_moov = struct.pack(">I", 0) + b"moov" + m[8:]
    assert parse_mp4_meta(ftyp(b"mp42") + to_eof_moov) == ("mp42", 48000, 960)
    # truncated largesize header is rejected, not mis-read
    assert parse_mp4_meta(ftyp(b"isom") + struct.pack(">I", 1) + b"moov") is None

    from veri_spark.plans.registry import QUERIES

    rows = QUERIES["multimodal_video_mp4_meta"](spark, SF).collect()
    docs = {
        int(r["doc_id"]): int(r["n_chars"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    brands = ["isom", "mp42", "avc1"]
    tss = [600, 1000, 24000, 90000]
    assert len(rows) == len(docs)
    for r in rows:
        ts = tss[r["doc_id"] % 4]
        dur = 100 + docs[r["doc_id"]] * 7
        assert r["brand"] == brands[r["doc_id"] % 3]
        assert r["timescale"] == ts
        assert r["duration_ms"] == (1000 * dur) // ts
