"""Deterministic 10x scale-up of the driver's sf0.1 test data to sf1.0.

The driver only ships sf{0.001,0.01,0.1}; the 100 TB posture needs at
least one measured decade of scaling.  This tool derives an sf1.0 set
from sf0.1 (read-only input, local gitignored output) with referential
integrity preserved, so the full oracle gate and bench run unchanged at
10x the rows:

- Dimension tables ``region``/``nation`` are fixed-size at every TPC-H
  scale factor and are copied verbatim.
- Every other table is replicated COPIES times; within replica ``c``
  every key column ``k`` (PKs and FKs alike) maps ``k -> k*COPIES + c``,
  which keeps keys unique across replicas and keeps each replica's FK
  edges pointing at its own replica's PKs (nationkeys are untouched, so
  all replicas share the fixed dims, exactly like TPC-H customers share
  25 nations at every sf).
- ``documents``: replicas 1..9 get a distinct 7-char prefix stamp so
  exact dedup does not collapse the corpus 10:1; each 10-copy group
  remains a near-dup clique, which deliberately stresses candidate-pair
  generation in the MinHash/ngram/SimHash paths (bounded: clique size is
  the copy count, not the corpus size).
- ``embeddings``: replicas 1..9 get seeded N(0, 0.02) noise so vectors
  are distinct but stay in their replica-0 neighborhood — ANN recall
  floors remain meaningful.

Everything is derived with fixed seeds from the driver's seed=42 data;
two runs produce byte-identical outputs (row order included).

Two corpus-replication MODES (round-6 brief item 3 — the clique mode's
pair-output growth is a fixture artifact, not plan behavior, so the
scale record needs both):

- ``clique`` (default, the r5 fixture): document replicas keep 10-copy
  near-dup cliques and embedding replicas stay in the base vector's
  neighborhood — near-dup PAIR OUTPUT grows ~(copies·C(copies,2)/2)x
  while data grows copies-x, deliberately stressing candidate-pair
  generation.
- ``density`` (constant near-dup density): replica c > 0 tags every
  WORD with the replica id — an injective rename of the shingle space,
  so in-replica Jaccard equals the base corpus EXACTLY while
  cross-replica overlap is zero — and ROLLS every embedding's
  dimensions by a replica-specific offset — a coordinate permutation,
  so in-replica dot products are EXACTLY the base corpus's while
  cross-replica cosines are noise-level. Near-dup pairs, components,
  and ANN candidate counts then scale LINEARLY with data, isolating
  data-scaling from output-scaling in the SCALE artifact.

Usage: python tools/scale_up.py [src_dir] [dst_dir] [copies] [mode]
Defaults: /root/testdata/sf0.1 -> <repo>/.localdata/sf1.0, copies=10,
mode=clique.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COPY_VERBATIM = ("region", "nation")

# table -> columns carrying replica-local keys (PK or FK into a scaled table)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def scale_table(name: str, src: str, dst: str, copies: int, mode: str = "clique") -> int:
    tab = pq.read_table(os.path.join(src, f"{name}.parquet"))
    out_chunks = []
    for c in range(copies):
        rep = tab
        for col in KEY_COLS[name]:
            i = rep.schema.get_field_index(col)
            scaled = pc.add(pc.multiply(rep.column(col), copies), c)
            rep = rep.set_column(i, rep.schema.field(i), scaled.cast(rep.schema.field(i).type))
        if name == "documents" and c > 0:
            i = rep.schema.get_field_index("text")
            if mode == "clique":
                # one 7-char prefix: replicas stay a near-dup clique
                stamped = pc.binary_join_element_wise(
                    pa.scalar(f"[v{c:02d}]"), rep.column("text").cast(pa.string()), " "
                )
            else:
                # tag EVERY word: injective shingle rename — in-replica
                # Jaccard preserved exactly, cross-replica overlap zero
                tag = f"v{c:02d}_"
                txt = rep.column("text").cast(pa.string())
                stamped = pc.binary_join_element_wise(
                    pa.scalar(tag),
                    pc.replace_substring(txt, " ", f" {tag}"),
                    "",
                )
            rep = rep.set_column(i, rep.schema.field(i), stamped.cast(rep.schema.field(i).type))
            j = rep.schema.get_field_index("n_chars")
            rep = rep.set_column(
                j, rep.schema.field(j), pc.utf8_length(rep.column("text")).cast(pa.int64())
            )
        if name == "embeddings" and c > 0:
            i = rep.schema.get_field_index("embedding")
            emb = rep.column("embedding").combine_chunks()
            flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float32)
            n_dim = len(emb[0])
            if mode == "clique":
                # seeded noise: replicas stay in replica-0's neighborhood
                rng = np.random.RandomState(42_000 + c)
                moved = flat + rng.normal(0.0, 0.02, size=flat.shape).astype(np.float32)
            else:
                # roll dimensions: a coordinate permutation — in-replica
                # dot products preserved exactly, cross-replica cosines
                # noise-level (dims carry independent-ish components)
                moved = np.roll(
                    flat.reshape(-1, n_dim), (c * 7) % n_dim, axis=1
                ).reshape(-1)
            arr = pa.ListArray.from_arrays(emb.offsets, pa.array(moved, type=pa.float32()))
            rep = rep.set_column(i, rep.schema.field(i), arr.cast(rep.schema.field(i).type))
        out_chunks.append(rep)
    out = pa.concat_tables(out_chunks)
    pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                   compression="snappy", row_group_size=1 << 20)
    return out.num_rows


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, ".localdata", "sf1.0")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "clique"
    if mode not in ("clique", "density"):
        raise SystemExit(f"unknown mode {mode!r}: use clique or density")
    os.makedirs(dst, exist_ok=True)
    for name in COPY_VERBATIM:
        tab = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(tab, os.path.join(dst, f"{name}.parquet"), compression="snappy")
        print(f"{name}: {tab.num_rows} rows (verbatim)")
    for name in KEY_COLS:
        n = scale_table(name, src, dst, copies, mode)
        print(f"{name}: {n} rows ({copies}x, {mode})")


if __name__ == "__main__":
    main()
