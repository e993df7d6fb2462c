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


PHASH_SCHEMA = "doc_id bigint, phash long"


def _stub_pixels(payload: bytes):
    """Deterministic stand-in for image decoding: render the payload's
    word-BIGRAM histogram (crc32-hashed tokens on a 32×32 grid) as
    grayscale pixels. Locality-preserving by construction — payloads
    sharing most of their token sequence produce near-identical grids —
    so the downstream (real) pHash math behaves perceptually, which a
    render of avalanche bytes (md5) could not. (A byte-bigram render was
    measured insufficiently discriminative: character patterns are
    shared corpus-wide, word transitions are not.)"""
    import zlib

    import numpy as np

    toks = payload.split(b" ")
    h = np.array([zlib.crc32(t) for t in toks], dtype=np.uint64)
    grid = np.zeros((32, 32), dtype=np.float64)
    if len(h) >= 2:
        np.add.at(grid, (h[:-1] % 32, h[1:] % 32), 1.0)
    return grid


def phash64(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Perceptual hash (pHash) per image row: pixels → 2-D DCT-II →
    low-frequency 8×8 block → sign-vs-median → 64 packed bits.

    Everything after the pixels — the orthonormal DCT basis, the
    low-pass crop, the median threshold, the bit pack — is the REAL
    pHash algorithm in vectorized numpy (`einsum` over the Arrow
    batch); only the pixel decode is the container-constrained stub
    (`_stub_pixels`; ``decode_stub=False`` raises where a PIL decode
    would go). Map-only: signature parallelism is the scan's. Like
    `resize`, only image rows are hashed — audio/video payloads have
    no pixel interpretation.
    """
    import numpy as np

    media = media.filter(F.col("modality") == "image")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        N = 32
        k = np.arange(N)
        D = np.sqrt(2.0 / N) * np.cos(
            np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * N)
        )
        D[0] /= np.sqrt(2.0)  # orthonormal DCT-II
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires an image codec library (PIL) "
                    "not present in this environment"
                )
            if not len(pdf):
                continue
            pix = np.stack([_stub_pixels(p) for p in pdf["payload"]])
            dct = np.einsum("ij,njk,lk->nil", D, pix, D)
            block = dct[:, :8, :8].reshape(len(pix), 64)
            med = np.median(block[:, 1:], axis=1)  # DC excluded from median
            bits = (block > med[:, None]).astype(np.uint64)
            vals = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": vals.view(np.int64)}
            )

    return media.mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    decode_stub: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Image near-dup pairs: pHash signatures + the dedup family's
    Manku-refined chunk banding (exact recall at hamming ≤ 3, exact
    precision always; 28-bit effective bucket keys so buckets stay
    corpus-size-independent) — op 53's signature machinery applied to
    the multimodal column."""
    from hbase_bulkload_spark.operators.dedup import hamming_pairs_banded

    return hamming_pairs_banded(
        phash64(media, decode_stub=decode_stub),
        sig_col="phash",
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
