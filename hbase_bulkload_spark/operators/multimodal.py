"""Multimodal columns (north-star op 56, SURVEY.md §2.14): image/audio/
video carried as opaque `binary` columns with typed metadata, processed
by Arrow-batched `mapInPandas` stages.

The Spark-side plumbing — schema, batch iteration, partition behavior —
is real and tested; the codec step is a STUB because no image/audio
libraries exist in this container: `decode_stub=True` derives
deterministic fake features from the payload bytes, and
`decode_stub=False` raises NotImplementedError where a real
PIL/ffmpeg/torchcodec call would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, width int, height int, "
    "mean_byte double"
)


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload + typed metadata per row (the
    shape a real pipeline gets from (path, bytes, metadata) ingestion).
    Payload = unhex(md5(text)) — deterministic, 16 bytes."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        modality.alias("modality"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
        F.struct(
            (F.col(id_col) % 640 + 16).cast("int").alias("width"),
            (F.col(id_col) % 480 + 16).cast("int").alias("height"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> float:
    # deterministic stand-in for pixel decoding: mean byte value
    return float(sum(payload)) / max(len(payload), 1)


def decode_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas decode/feature-extract stage. Arrow batches in, a
    feature frame out; one pass, no shuffle — at 100 TB this is a
    map-only stage whose parallelism is the scan's."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires an image/audio codec library "
                    "(PIL/ffmpeg) not present in this environment"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "mean_byte": pdf["payload"].map(_fake_decode),
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, modality string, payload binary, width int, height int, "
    "scale_x double, scale_y double"
)


def resize(
    media: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    decode_stub: bool = True,
) -> DataFrame:
    """mapInPandas resize stage (image rows): batch in, batch out, no
    shuffle — the standard pre-training normalization step. The pixel
    transform is a STUB (no codec libs in this container): the real
    branch raises where a PIL `Image.resize` would go; the stub branch
    keeps the payload and emits target dimensions + the scale factors a
    real resample would use, so schema, batch shape, and partition
    behavior are the production ones.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires an image codec library (PIL) "
                    "not present in this environment"
                )
            width = pdf["meta"].map(lambda m: m["width"]).astype("int32")
            height = pdf["meta"].map(lambda m: m["height"]).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "payload": pdf["payload"],
                    "width": target_width,
                    "height": target_height,
                    "scale_x": target_width / width,
                    "scale_y": target_height / height,
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 10, n_frames: int = 100) -> DataFrame:
    """Frame-sampling plan for video rows: explode sampled frame indices
    (decode of each frame would plug into decode_features)."""
    frames = F.sequence(F.lit(0), F.lit(n_frames - 1), F.lit(every_n))
    return media.filter(F.col("modality") == "video").select(
        "doc_id", F.explode(frames).alias("frame_idx")
    )
