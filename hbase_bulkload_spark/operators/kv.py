"""Wide→long KV reshape (SURVEY.md §2.4) and its inverse.

The reference explodes each input row into one HBase KeyValue per column
under family 'c': the per-field `p.addColumn(family, qualifier, value)`
loop in every importer (`BulkImporterFromText.java:60-66`,
`BulkImporterFromRC.java:60-64`, `BulkImporterFromAvro.java:62-67`), with
per-field null suppression on the Avro path
(`BulkImporterFromAvro.java:65-66`).

Spark-first: the built-in `DataFrame.unpivot` (a single Generate node —
no shuffle, fully pipelined with the scan), a `lit` family column, and a
null filter. The inverse (long→wide) is `groupBy(...).pivot(...)` with a
pinned qualifier list so Catalyst skips the extra distinct-values job.

The canonical KV frame (FIXTURES.md F4) is the engine's bulk-load-ready
output contract:

    rowkey: string (128-hex composite), family: string,
    [ts: timestamp,] qualifier: string, value: string

(`ts`, when present, sits between family and qualifier — pinned by
tests/test_kv.py.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CURRENT_FAMILY = "c"  # reference: BulkImporterFromText.java:47
HISTORY_FAMILY = "h"  # declared in create_table.rb:1, never written by importers


def unpivot_kv(
    df: DataFrame,
    rowkey: Column,
    value_cols: Sequence[str],
    family: str = CURRENT_FAMILY,
    ts: Column | None = None,
    drop_null: bool = True,
) -> DataFrame:
    """Explode one wide row into one (rowkey, family, qualifier, value)
    cell per column — the 1-row→N-cells mapper as a declarative plan.

    Qualifiers are the source column names (normalized; the reference is
    inconsistent — positional ints in text/CSV/RC, field names in Avro,
    SURVEY.md §1.2). `drop_null=True` is the Avro path's null
    suppression (`BulkImporterFromAvro.java:65-66`).
    """
    ids: list[Column] = [rowkey.alias("rowkey")]
    if ts is not None:
        ids.append(ts.alias("ts"))
    wide = df.select(*ids, *[F.col(c).cast("string").alias(c) for c in value_cols])
    id_names = ["rowkey"] + (["ts"] if ts is not None else [])
    long = wide.unpivot(id_names, list(value_cols), "qualifier", "value")
    if drop_null:
        long = long.filter(F.col("value").isNotNull())
    out_cols = ["rowkey", F.lit(family).alias("family"), "qualifier"]
    if ts is not None:
        out_cols.insert(2, "ts")
    return long.select(*out_cols, "value")


def pivot_wide(
    kv: DataFrame, qualifiers: Sequence[str], partial: bool = False
) -> DataFrame:
    """Inverse reshape: canonical KV frame back to one wide row per key.

    Physical-strategy note (all-JVM forms lose here): `pivot`/
    `max(when(...))` plan as SortAggregate because string aggregation
    buffers are hash-map-incompatible — every map task sorts all
    N×rows cells; `collect_list` plans as ObjectHashAggregate but
    silently degrades to sort-based at 128 keys and GC-thrashes if the
    threshold is raised. The winning shape is one hash exchange on
    rowkey + a vectorized per-partition pivot (Arrow-batched, C-speed,
    no JVM sort, no object aggregation). The pivot itself is a numpy
    scatter — factorize both keys, assign values into a (keys × quals)
    cell matrix by fancy indexing — O(cells) with no sort or groupby,
    ~5× faster per partition than `pandas.pivot_table`.

    Shuffle shape (``partial=False``, the local-tier default): one hash
    exchange on rowkey, then one Python hop for the whole partition.

    ``partial=True`` is the cluster-tier variant: pivot within each
    INPUT partition first (map-side, before any exchange), shuffle the
    ~n_qualifiers× fewer partial wide rows, then merge partials per
    rowkey (per-cell MAX, the same duplicate rule as the default
    variant). It pays a second JVM↔Python Arrow hop
    to cut shuffle volume dominated by the repeated 128-hex rowkey —
    on local[32] (in-memory exchange) the extra hop costs more than
    the bytes it saves (measured: see README "Pivot variants"), but on
    a multi-node cluster where the exchange crosses the network the
    trade reverses. Both variants produce identical results, including
    under duplicates (see Contract).

    Contract: one LOGICAL cell per (rowkey, qualifier) — HBase cell
    semantics; enforce version retention (op 18) upstream when inputs
    carry versions. Physical duplicates resolve deterministically to
    the per-cell MAX non-null value (the ts-free stand-in for HBase's
    highest-timestamp-wins; matches the oracle's MAX(CASE ...) in any
    arrival order — a real duplicate key at sf0.001 pinned this).
    """
    import numpy as np  # executor-side
    import pandas as pd

    quals = list(qualifiers)
    schema = "rowkey string, " + ", ".join(f"{q} string" for q in quals)

    def pivot_part(batches):
        """Numpy scatter pivot — factorize both keys, fancy-index values
        into a (keys × quals) cell matrix; O(cells), no sort, no
        groupby, ~5× faster than pandas.pivot_table."""
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        allp = pd.concat(pdfs, ignore_index=True)
        allp = allp[allp["value"].notna()]  # non-null semantics
        # duplicates ⇒ ascending value sort + forward scatter, so the
        # per-cell MAX wins — deterministic and identical to the
        # oracle's MAX(CASE WHEN ...) regardless of arrival order. The
        # sort is gated on an O(n) hash check: dup cells are a data
        # quality anomaly (~one per corpus), not the common case, and
        # the clean path stays the advertised sort-free scatter.
        if allp.duplicated(["rowkey", "qualifier"]).any():
            allp = allp.sort_values("value", kind="mergesort")
        qual_codes = pd.Categorical(allp["qualifier"], categories=quals).codes
        if (qual_codes < 0).any():  # cells outside the pinned list: dropped
            keep = qual_codes >= 0
            allp, qual_codes = allp[keep], qual_codes[keep]
        key_codes, key_uniques = pd.factorize(allp["rowkey"])
        cells = np.full((len(key_uniques), len(quals)), None, dtype=object)
        cells[key_codes, qual_codes] = allp["value"].to_numpy()
        out = pd.DataFrame(cells, columns=quals)
        out.insert(0, "rowkey", key_uniques)
        yield out

    cells = kv.select("rowkey", "qualifier", "value")
    if not partial:
        return cells.repartition("rowkey").mapInPandas(pivot_part, schema)

    def merge_part(batches):
        """Merge partial wide rows: per (rowkey, column) the MAX
        non-null value wins (numpy scatter again — each column's
        non-null values assigned in ascending order so the largest
        lands last, mirroring pivot_part's duplicate rule)."""
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        allp = pd.concat(pdfs, ignore_index=True)
        key_codes, key_uniques = pd.factorize(allp["rowkey"])
        # a rowkey with ONE partial row can't collide per cell; only
        # multi-partial keys need the ascending-value order (same gated
        # MAX rule as pivot_part)
        multi = bool(allp.duplicated("rowkey").any())
        out_cells = np.full((len(key_uniques), len(quals)), None, dtype=object)
        for j, q in enumerate(quals):
            col = allp[q].to_numpy()
            mask = pd.notna(col)
            vals, keys = col[mask], key_codes[mask]
            if multi:
                order = np.argsort(vals, kind="stable")
                vals, keys = vals[order], keys[order]
            out_cells[keys, j] = vals
        out = pd.DataFrame(out_cells, columns=quals)
        out.insert(0, "rowkey", key_uniques)
        yield out

    partials = cells.mapInPandas(pivot_part, schema)
    return partials.repartition("rowkey").mapInPandas(merge_part, schema)
