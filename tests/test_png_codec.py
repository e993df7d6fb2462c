"""The pure-Python PNG codec behind the multimodal stub boundary
(VERDICT r6 item 8): round-trip identity across every scanline filter
type and channel count, spec-level validation failures, and resampling.
No Spark — this is the codec contract the Arrow stages build on."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hbase_bulkload_spark.sources.png_codec import (
    PNG_SIG,
    decode_png,
    encode_png,
    resample_nearest,
)


def _rng_image(h, w, c, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a if c > 1 else a[:, :, :1]


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_filters_and_channels(filter_type, channels):
    """encode(filter k) -> decode must be the identity for every filter
    type (each exercises a distinct unfilter recurrence) and channel
    count (grey, grey+alpha, RGB, RGBA)."""
    px = _rng_image(13, 17, channels, seed=filter_type * 7 + channels)
    out = decode_png(encode_png(px, filter_type=filter_type))
    assert out.shape == (13, 17, channels)
    assert np.array_equal(out, px)


def test_roundtrip_2d_input_and_gradients():
    # 2-D input means greyscale; structured (non-random) data checks the
    # filters on realistic smooth content
    g = np.add.outer(np.arange(40), np.arange(60)) % 256
    px = g.astype(np.uint8)
    for ft in range(5):
        out = decode_png(encode_png(px, filter_type=ft))
        assert np.array_equal(out[:, :, 0], px)


def test_deterministic_encode():
    px = _rng_image(8, 8, 3, seed=1)
    assert encode_png(px, 2) == encode_png(px, 2)


def test_bad_signature_and_crc_rejected():
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"\x89JPG" + b"\x00" * 20)
    good = bytearray(encode_png(_rng_image(4, 4, 1, seed=2)))
    # corrupt one IDAT payload byte; the chunk CRC must catch it
    idat_at = bytes(good).index(b"IDAT")
    good[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(good))


def test_unsupported_features_named():
    # hand-build an IHDR with 16-bit depth / interlace to pin the errors
    def ihdr_png(depth=8, ctype=0, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, interlace)
        chunk = (
            struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )
        return PNG_SIG + chunk

    with pytest.raises(ValueError, match="bit depth"):
        decode_png(ihdr_png(depth=16))
    with pytest.raises(ValueError, match="color type"):
        decode_png(ihdr_png(ctype=3))  # palette
    with pytest.raises(ValueError, match="interlacing"):
        decode_png(ihdr_png(interlace=1))
    with pytest.raises(ValueError, match="missing IHDR/IDAT"):
        decode_png(PNG_SIG)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((4, 4), np.float64))
    with pytest.raises(ValueError, match="filter_type"):
        encode_png(np.zeros((4, 4), np.uint8), filter_type=9)


def test_resample_nearest_shapes_and_identity():
    px = _rng_image(16, 16, 3, seed=3)
    up = resample_nearest(px, 32, 8)
    assert up.shape == (8, 32, 3)
    # identity resample is exact
    assert np.array_equal(resample_nearest(px, 16, 16), px)
    # corners map to corners under nearest
    assert np.array_equal(up[0, 0], px[0, 0])
