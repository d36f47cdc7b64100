"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Two decode tiers:

- **Header metadata decode is REAL**: ``parse_image_header`` is a pure-stdlib
  parser for PNG (IHDR), JPEG (SOF0/1/2 marker scan), and GIF (logical
  screen descriptor) that extracts (format, width, height, bit_depth) from
  the encoded bytes — no PIL required. ``image_dims`` runs it over the
  binary column via Arrow-batched ``mapInPandas``.
- **Pixel/signal decode is stubbed**: full raster/audio decode needs
  PIL/ffmpeg/torchaudio, which are not in this environment, so
  ``decode_stub`` raises ``NotImplementedError`` unless
  ``deterministic_fake=True`` (reproducible md5-derived pseudo-feature).
  Everything around the stub — the schema, the Arrow-batched shape, the
  batch iteration, partition sizing — is the real production plumbing and
  is tested.

Scale notes: media bytes are the widest column in the table, so
- feature extraction projects (id, media) only — column pruning keeps the
  scan narrow for metadata-only queries;
- ``mapInPandas`` streams Arrow record batches, bounding executor memory by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it low for videos);
- outputs drop the media column — never carry decoded payloads through a
  shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("media", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),  # typed metadata
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 8

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF0..SOF15 carry frame dimensions, except DHT (C4), JPG (C8), DAC (CC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_header(
    data: bytes | None,
) -> tuple[str, int, int, int] | None:
    """REAL pure-stdlib image-header decode: (format, width, height,
    bit_depth) from the encoded bytes, or None if unrecognized/truncated.

    - PNG: 8-byte signature, then the IHDR chunk (always first, RFC 2083
      §4.1.1) — width/height are 4-byte big-endian at offsets 16/20, bit
      depth at 24.
    - JPEG: marker scan from SOI; segments are skipped by their 2-byte
      big-endian length until a SOF marker, whose payload is
      precision(1) height(2 BE) width(2 BE) (ITU T.81 §B.2.2). Handles
      standalone markers (RSTn/TEM) and padding FF bytes.
    - GIF: 6-byte version signature, then the logical screen descriptor's
      LITTLE-endian width/height (GIF89a spec §18).

    The reference ships real native media compute (annoyindex/annoylib.h
    does its own SIMD distance kernels); this is the analogous
    no-external-deps decode for the metadata tier — full raster decode
    stays behind ``decode_stub``.
    """
    if not data:
        return None
    if data[:8] == _PNG_SIG:
        if len(data) >= 25 and data[12:16] == b"IHDR":
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            return ("png", w, h, data[24])
        return None
    if data[:2] == b"\xff\xd8":
        i = 2
        n = len(data)
        while i + 1 < n:
            if data[i] != 0xFF:
                return None  # desynced: not a marker where one must be
            marker = data[i + 1]
            if marker == 0xFF:  # padding fill byte before a marker
                i += 1
                continue
            # standalone markers carry no length field
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2
                continue
            if i + 4 > n:
                return None
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                precision = data[i + 4]
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return ("jpeg", w, h, precision)
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    if data[:6] in (b"GIF87a", b"GIF89a"):
        if len(data) >= 10:
            w = int.from_bytes(data[6:8], "little")
            h = int.from_bytes(data[8:10], "little")
            return ("gif", w, h, 8)
        return None
    return None


def image_dims(
    df: DataFrame, id_col: str = "media_id", media_col: str = "media"
) -> DataFrame:
    """Arrow-batched REAL header decode over a binary column: one row per
    input with (id, format STRING, width, height, bit_depth) — NULLs for
    unparseable bytes. Projects (id, media) before mapInPandas so the scan
    prunes every other column; the media bytes never leave the map task."""
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("format", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("bit_depth", IntegerType(), True),
        ]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [p[0] if p else None for p in parsed],
                    "width": [p[1] if p else None for p in parsed],
                    "height": [p[2] if p else None for p in parsed],
                    "bit_depth": [p[3] if p else None for p in parsed],
                }
            )

    return df.select(id_col, media_col).mapInPandas(parse, out_schema)


def decode_stub(data: bytes, deterministic_fake: bool = False) -> list[float]:
    """Placeholder for the real media decoder.

    The image/audio libraries are not present in this container; with
    ``deterministic_fake`` a stable pseudo-feature is derived from md5 so
    the distributed plumbing can be exercised and asserted end-to-end.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg; not available in this environment"
        )
    digest = hashlib.md5(data or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def fake_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/demos."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = f"media-payload-{i}".encode() * (i % 5 + 1)
        rows.append(
            (i, kind, payload, f"application/x-fake-{kind}", 64 + i, 48 + i, 1000 * i)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_features(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction: (id, feature ARRAY<FLOAT>, n_bytes).

    The projection to (id, media) happens BEFORE mapInPandas so the scan
    prunes all other columns; the media bytes never appear in the output.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("feature", ArrayType(FloatType()), True),
            StructField("n_bytes", LongType(), True),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feature": [
                        decode_stub(b, deterministic_fake) for b in pdf[media_col]
                    ],
                    "n_bytes": [len(b or b"") for b in pdf[media_col]],
                }
            )

    return df.select(id_col, media_col).mapInPandas(extract, out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled timestamp with a
    per-frame feature. Frame decode is the same stub; the row-explosion
    shape (one media row -> many frame rows) is the real thing."""
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("feature", ArrayType(FloatType()), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tss, feats = [], [], []
            for _, row in pdf.iterrows():
                duration = int(row["duration_ms"] or 0)
                for ts in range(0, max(duration, 1), every_ms):
                    ids.append(row[id_col])
                    tss.append(ts)
                    feats.append(
                        decode_stub(
                            (row["media"] or b"") + ts.to_bytes(8, "little"),
                            deterministic_fake,
                        )
                    )
            yield pd.DataFrame({id_col: ids, "frame_ts_ms": tss, "feature": feats})

    return (
        df.filter(F.col("kind") == "video")
        .select(id_col, "media", "duration_ms")
        .mapInPandas(sample, out_schema)
    )


def parse_wav_header(
    data: bytes | None,
) -> tuple[int, int, int, int, int] | None:
    """REAL pure-stdlib RIFF/WAVE header decode: (sample_rate, channels,
    bits_per_sample, data_size, byte_rate) from the canonical 44-byte PCM
    layout, or None if unrecognized/truncated (RIFF spec / WAVE format
    chunk: 'RIFF' size 'WAVE', 'fmt ' chunk with little-endian
    audioFormat(2) channels(2) sampleRate(4) byteRate(4) blockAlign(2)
    bits(2), then the 'data' chunk id + little-endian size). byte_rate is
    READ from the header field (bytes 28-31), never recomputed from
    sr*ch*bits — for compressed formats the two genuinely differ, and
    duration must follow the stream's own rate (round-13 review). The
    audio analog of ``parse_image_header`` — the metadata tier a 100 TB
    media table audits scan-side; sample decode stays behind
    ``decode_stub``."""
    if not data or len(data) < 44:
        return None
    if data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    if data[12:16] != b"fmt " or data[36:40] != b"data":
        return None
    channels = int.from_bytes(data[22:24], "little")
    sample_rate = int.from_bytes(data[24:28], "little")
    byte_rate = int.from_bytes(data[28:32], "little")
    bits = int.from_bytes(data[34:36], "little")
    data_size = int.from_bytes(data[40:44], "little")
    if channels == 0 or sample_rate == 0 or bits == 0 or byte_rate == 0:
        return None
    return (sample_rate, channels, bits, data_size, byte_rate)


def audio_meta(
    df: DataFrame, id_col: str = "media_id", media_col: str = "media"
) -> DataFrame:
    """Arrow-batched REAL WAV-header decode over a binary column: one row
    per input with (id, sample_rate, channels, bits, duration_ms) — NULLs
    for unparseable bytes. duration_ms = 1000 * data_size floor-divided
    by the byte rate PARSED from the header (a zero byte rate is
    unparseable, never a divide-by-zero — one corrupt row must yield a
    NULL row, not kill the scan). Same scan-side shape as ``image_dims``:
    (id, media) projected before mapInPandas, bytes never leave the map
    task."""
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("sample_rate", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("bits", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
        ]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_wav_header(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": [p[0] if p else None for p in parsed],
                    "channels": [p[1] if p else None for p in parsed],
                    "bits": [p[2] if p else None for p in parsed],
                    "duration_ms": [
                        (1000 * p[3]) // p[4] if p else None
                        for p in parsed
                    ],
                }
            )

    return df.select(id_col, media_col).mapInPandas(parse, out_schema)


def parse_mp4_meta(
    data: bytes | None,
) -> tuple[str, int, int] | None:
    """REAL pure-stdlib MP4 container metadata decode: (major_brand,
    timescale, duration) via the ISO BMFF box walk (ISO/IEC 14496-12) —
    scan top-level boxes by their big-endian size fields for ftyp (major
    brand) and moov, then walk moov's children for mvhd (version-0 full
    box: timescale at offset 20, duration at 24). None for truncated or
    non-BMFF bytes. Handles all three ISO BMFF size conventions
    (14496-12 §4.2): size==1 reads the 8-byte largesize that follows the
    type, size==0 means the box extends to end-of-enclosure. The video
    analog of ``parse_image_header`` / ``parse_wav_header``; frame
    decode stays behind ``decode_stub``."""
    if not data or len(data) < 16:
        return None

    def box_bounds(buf: bytes, i: int, end: int) -> tuple[bytes, int, int] | None:
        """(type, payload_start, box_end) of the box at ``i``, or None
        when the header is malformed/truncated within ``end``."""
        size = int.from_bytes(buf[i:i + 4], "big")
        typ = buf[i + 4:i + 8]
        if size == 1:
            if i + 16 > end:
                return None
            size = int.from_bytes(buf[i + 8:i + 16], "big")
            if size < 16 or i + size > end:
                return None
            return (typ, i + 16, i + size)
        if size == 0:  # box extends to the end of the enclosing space
            return (typ, i + 8, end)
        if size < 8 or i + size > end:
            return None
        return (typ, i + 8, i + size)

    brand = None
    timescale = duration = None
    i = 0
    n = len(data)
    while i + 8 <= n:
        b = box_bounds(data, i, n)
        if b is None:
            return None
        typ, payload, box_end = b
        if typ == b"ftyp":
            if box_end - payload < 4:
                return None
            brand = data[payload:payload + 4].decode("ascii", errors="replace")
        elif typ == b"moov":
            j = payload
            end = box_end
            while j + 8 <= end:
                cb = box_bounds(data, j, end)
                if cb is None:
                    return None
                ctyp, cpayload, cend = cb
                if ctyp == b"mvhd" and cend - cpayload >= 20 and data[cpayload] == 0:
                    timescale = int.from_bytes(
                        data[cpayload + 12:cpayload + 16], "big"
                    )
                    duration = int.from_bytes(
                        data[cpayload + 16:cpayload + 20], "big"
                    )
                j = cend
        i = box_end
    if brand is None or not timescale:
        return None
    return (brand, timescale, duration)


def video_meta(
    df: DataFrame, id_col: str = "media_id", media_col: str = "media"
) -> DataFrame:
    """Arrow-batched REAL MP4 metadata decode over a binary column:
    (id, brand, timescale, duration_ms) with NULLs for unparseable
    bytes; duration_ms = 1000 * duration floor-divided by timescale.
    Same scan-side shape as ``image_dims`` / ``audio_meta``."""
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("brand", StringType(), True),
            StructField("timescale", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
        ]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_mp4_meta(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "brand": [p[0] if p else None for p in parsed],
                    "timescale": [p[1] if p else None for p in parsed],
                    "duration_ms": [
                        (1000 * p[2]) // p[1] if p else None for p in parsed
                    ],
                }
            )

    return df.select(id_col, media_col).mapInPandas(parse, out_schema)
