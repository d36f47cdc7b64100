"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Real decode (PIL/ffmpeg/torchaudio) is NOT available in this environment, so
the decoder is stubbed: ``decode_stub`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it derives a reproducible feature
vector from the bytes' md5. Everything around the stub — the schema, the
Arrow-batched ``mapInPandas`` shape, the batch iteration, partition sizing —
is the real production plumbing and is tested.

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
