"""Reference fixture for q_multimodal_decode_real (round 7): per-doc
expected pixel means for the REAL PNG decode path, computed by an
INDEPENDENT pure-Python implementation that never touches the codec —
the committed fixture proves the engine's encode→decode round trip is
pixel-exact corpus-wide, not merely self-consistent.

Semantics mirrored independently (same contract as the engine's
`attach_png_payload` raster, reimplemented here with dicts, no numpy):
tokens = UTF-8 text split on single spaces; grid[crc32(tok_i) % 32][
crc32(tok_{i+1}) % 32] += 1 over consecutive bigrams; pixels =
trunc(count * (255.0 / max)) per cell (the numpy uint8 cast truncates;
identical IEEE-754 doubles make trunc bit-identical across
implementations); mean = sum(pixels) / 1024 — EXACT in float64 (integer
sum ≤ 255*1024, division by a power of two), so the oracle compares
full doubles with no rounding slack.

Keyed by corpus_chars (SUM(n_chars)) like the BPE fixtures; collisions
across SF_DIRS are refused. Usage: python tools/gen_png_oracle_fixture.py
"""

from __future__ import annotations

import os
import zlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    # local scale-ups (tools/scale_up.py, both modes) when present, so
    # sf1.0 gate runs get the full oracle too
    os.path.join(_REPO, ".localdata", "sf1.0"),
    os.path.join(_REPO, ".localdata", "sf1.0-density"),
]
OUT = os.path.join(_REPO, "tests", "fixtures", "png_decode_ref.parquet")


def grid_mean(text: str) -> float:
    """Independent replay of the raster + uint8 normalize + mean."""
    toks = text.encode().split(b" ")
    counts: dict[tuple[int, int], int] = {}
    prev = None
    for t in toks:
        h = zlib.crc32(t)
        if prev is not None:
            key = (prev % 32, h % 32)
            counts[key] = counts.get(key, 0) + 1
        prev = h
    if not counts:
        return 0.0
    mx = max(counts.values())
    s = 255.0 / mx
    total = sum(int(c * s) for c in counts.values())
    return total / 1024.0


def main() -> None:
    doc_ids: list[int] = []
    means: list[float] = []
    chars: list[int] = []
    seen: dict[int, str] = {}
    for sf_dir in SF_DIRS:
        path = os.path.join(sf_dir, "documents.parquet")
        if not os.path.exists(path):
            print(f"skip {sf_dir} (absent)")
            continue
        rows = duckdb.sql(
            f"SELECT doc_id, text, SUM(n_chars) OVER () AS total "
            f"FROM read_parquet('{path}') ORDER BY doc_id"
        ).fetchall()
        if not rows:
            print(f"skip {sf_dir} (empty documents.parquet)")
            continue
        total = int(rows[0][2])
        if total in seen:
            raise SystemExit(
                f"corpus_chars collision: {sf_dir} and {seen[total]} both "
                f"total {total} chars; the fixture key cannot discriminate"
            )
        seen[total] = sf_dir
        for doc_id, text, _ in rows:
            doc_ids.append(int(doc_id))
            means.append(grid_mean(text))
            chars.append(total)
        print(f"{sf_dir}: {len(rows)} docs (corpus_chars={total})")
    tbl = pa.table(
        {
            "corpus_chars": pa.array(chars, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "mean_byte": pa.array(means, pa.float64()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(tbl, OUT, compression="zstd")
    print(f"wrote {OUT}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
