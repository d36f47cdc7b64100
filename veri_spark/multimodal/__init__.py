from veri_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    decode_features,
    fake_media_table,
    frame_sample,
)

__all__ = ["MEDIA_SCHEMA", "decode_features", "fake_media_table", "frame_sample"]
