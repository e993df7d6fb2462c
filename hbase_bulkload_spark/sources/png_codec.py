"""Pure-Python/numpy PNG codec (north-star op 56 follow-through,
VERDICT r6 item 8): a REAL image codec behind the multimodal stub
boundary, with no dependency beyond stdlib ``zlib`` + numpy — the
container has no PIL/ffmpeg, and the engine's no-new-deps constraint
holds.

Scope (documented, validated with clear errors): 8-bit greyscale /
RGB / RGBA, non-interlaced, zlib-compressed — the subset every PNG
writer emits by default. 16-bit, palette, and Adam7 interlacing are
rejected with ``ValueError`` naming the unsupported feature. All five
scanline filter types (None/Sub/Up/Average/Paeth) are decoded; the
encoder can emit any fixed filter type, which is how the decoder's
unfilter paths are round-trip-pinned in tests/test_multimodal.py.

Decode is vectorized where the format allows: whole-image unfilter for
types 0/2 (numpy row ops), per-row cumulative-sum for Sub (mod-256
distributes over cumsum), and a per-pixel loop only for
Average/Paeth's inherently sequential recurrence — acceptable for the
thumbnail-scale payloads a metadata-typed binary column carries; a
deployment decoding megapixel frames swaps this module for a C codec
behind the same (bytes) -> (H, W, C) uint8 contract.

Format reference: the public PNG specification (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (palette/16-bit deliberately absent)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload))
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes. ``filter_type`` applies
    the same filter to every scanline (0=None is the fast default; 1-4
    exist so tests can pin every decoder unfilter path — filtering is
    the forward direction of the recurrence, so it vectorizes freely)."""
    px = np.ascontiguousarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError(f"pixels must be uint8, got {px.dtype}")
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"pixels must be (H, W[, C<=4]), got {px.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    h, w, c = px.shape
    bpp = c
    cur = px.reshape(h, w * c).astype(np.int16)
    left = np.zeros_like(cur)
    left[:, bpp:] = cur[:, :-bpp]
    up = np.zeros_like(cur)
    up[1:] = cur[:-1]
    ul = np.zeros_like(cur)
    ul[1:, bpp:] = cur[:-1, :-bpp]
    if filter_type == 0:
        filt = cur
    elif filter_type == 1:
        filt = cur - left
    elif filter_type == 2:
        filt = cur - up
    elif filter_type == 3:
        filt = cur - (left + up) // 2
    else:  # Paeth predictor
        p = left + up - ul
        pa, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where(
            (pa <= pb) & (pa <= pc_), left, np.where(pb <= pc_, up, ul)
        )
        filt = cur - pred
    raw = np.empty((h, w * c + 1), np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = (filt % 256).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 (C=1 grey, 2 grey+alpha, 3 RGB,
    4 RGBA). Chunk CRCs are verified; unsupported format features raise
    ``ValueError`` naming the feature."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, end = 8, len(data)
    w = h = channels = None
    idat: list[bytes] = []
    while pos + 12 <= end:
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(typ + payload) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if interlace != 0:
                raise ValueError("unsupported PNG: Adam7 interlacing")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            channels = _CHANNELS[ctype]
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG decompressed size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].astype(np.int32)
    bpp = channels
    if ftypes.max(initial=0) > 4:
        raise ValueError(f"invalid PNG filter type {int(ftypes.max())}")

    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        f, cur = int(ftypes[y]), rows[y]
        if f == 0:
            rec = cur
        elif f == 1:
            # mod-256 distributes over the cumulative sum, so Sub's
            # left-to-right recurrence is one cumsum per channel lane
            rec = np.cumsum(cur.reshape(-1, bpp), axis=0).reshape(-1) % 256
        elif f == 2:
            rec = (cur + prior) % 256
        else:
            # Average/Paeth read the RECONSTRUCTED left neighbor — a
            # true sequential recurrence; loop pixels, vectorize lanes
            rec = np.zeros(stride, np.int32)
            left = np.zeros(bpp, np.int32)
            ul = np.zeros(bpp, np.int32)
            for x in range(0, stride, bpp):
                up = prior[x : x + bpp]
                if f == 3:
                    px = (cur[x : x + bpp] + (left + up) // 2) % 256
                else:
                    p = left + up - ul
                    pa, pb, pc_ = (
                        np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc_), left,
                        np.where(pb <= pc_, up, ul),
                    )
                    px = (cur[x : x + bpp] + pred) % 256
                rec[x : x + bpp] = px
                left, ul = px, up.astype(np.int32)
        out[y] = rec
        prior = rec.astype(np.int32)
    return out.reshape(h, w, channels)


def resample_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of (H, W, C) uint8 — the real-pixel
    analog of the resize stage's stub scale factors."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]
