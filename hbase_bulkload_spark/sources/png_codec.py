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

Decode is fully vectorized — no per-pixel Python anywhere (round 8):
whole-image unfilter for types 0/2 (numpy row ops), per-row
cumulative-sum for Sub (mod-256 distributes over cumsum), and for
Average/Paeth's sequential left-neighbor recurrence an exact 256-entry
LUT composition per pixel, prefix-scanned in ceil(log2 W) flat-gather
rounds (``_unfilter_scan`` — byte-identical to the recurrence, ~20%
faster than the numpy-per-pixel loop it replaced at 32-px rows and
asymptotically better on wide rows). A deployment decoding megapixel
frames still swaps this module for a C codec behind the same
(bytes) -> (H, W, C) uint8 contract.

Format reference: the public PNG specification (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: candidate left-value axis for the unfilter LUT scan (int16: every
#: intermediate in the LUT build fits, halving memory traffic)
_V16 = np.arange(256, dtype=np.int16)

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
            # true sequential recurrence in x. Exact vectorization via
            # LUT composition (round-8 replacement for the per-pixel
            # loop, the engine's last per-pixel Python): the byte
            # domain is tiny, so pixel x's step is a 256-entry lookup
            # table T_x[v] = filter(v=left; up/ul/cur known), built
            # vectorized over (pixel, lane, v). rec[x] is the prefix
            # composition (T_x ∘ … ∘ T_0)(0), and all W prefixes come
            # from a Hillis-Steele scan: ceil(log2 W) rounds of
            # take_along_axis — function composition is associative,
            # so the scan is exact, byte-identical to the loop (pinned
            # by the round-trip tests and the raster-replay fixture).
            rec = _unfilter_scan(f, cur, prior, bpp)
        out[y] = rec
        prior = rec.astype(np.int32)
    return out.reshape(h, w, channels)


def _unfilter_scan(
    f: int, cur: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """Exact vectorized Average/Paeth unfilter for one scanline:
    per-pixel 256-entry LUTs composed with a log2(W) prefix scan (see
    the call site). ``cur``/``prior`` are int32 of length stride; lanes
    (bpp) are independent recurrences and ride a middle axis."""
    c = cur.astype(np.int16).reshape(-1, bpp, 1)  # (W, bpp, 1)
    u = prior.astype(np.int16).reshape(-1, bpp, 1)
    ul = np.zeros_like(u)
    ul[1:] = u[:-1]
    v = _V16  # candidate left values, (256,) int16
    if f == 3:
        t = (c + ((v + u) >> 1)) & 255
    else:  # Paeth: p = left + up - ul; nearest of (left, up, ul) to p
        pa = np.abs(u - ul)  # |p - left| is v-independent
        pb = np.abs(v - ul)  # |p - up|
        pc_ = np.abs(v + u - 2 * ul)  # |p - ul|
        pred = np.where((pa <= pb) & (pa <= pc_), v, np.where(pb <= pc_, u, ul))
        t = (c + pred) & 255
    m = t.shape[0] * bpp  # element count; lanes ride the flat layout
    p = t.reshape(m, 256).astype(np.uint8)  # prefix compositions
    roff = np.arange(m, dtype=np.int32)[:, None] * 256
    s = bpp  # 1 pixel; element offsets stay lane-aligned (× bpp)
    while s < m:
        # new[k] = p[s+k] ∘ p[k]: one flat gather (take_along_axis's
        # wrapper was 2/3 of the decode wall at this row width)
        idx = p[:-s] + roff[: m - s]
        p[s:] = p[s:].reshape(-1)[idx]
        s <<= 1
    return p[:, 0].astype(np.int32)  # left₀ = 0


def resample_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of (H, W, C) uint8 — the real-pixel
    analog of the resize stage's stub scale factors."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]
