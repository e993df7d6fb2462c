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

    rowkey: string (128-hex composite), family: string, qualifier: string,
    [ts: timestamp,] value: string
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


def pivot_wide(kv: DataFrame, qualifiers: Sequence[str]) -> DataFrame:
    """Inverse reshape: canonical KV frame back to one wide row per key.

    Physical-strategy note (all-JVM forms lose here): `pivot`/
    `max(when(...))` plan as SortAggregate because string aggregation
    buffers are hash-map-incompatible — every map task sorts all
    N×rows cells; `collect_list` plans as ObjectHashAggregate but
    silently degrades to sort-based at 128 keys and GC-thrashes if the
    threshold is raised. The winning shape is one hash exchange on
    rowkey + a vectorized pandas pivot per partition (Arrow-batched,
    C-speed, no JVM sort, no object aggregation) — measured 2-5×
    faster and run-to-run stable at sf0.1.

    Contract: at most one cell per (rowkey, qualifier) — HBase cell
    semantics; enforce version retention (op 18) upstream. Duplicates
    resolve first-non-null, arrival-order-dependent.
    """
    import pandas as pd  # executor-side

    quals = list(qualifiers)
    part = kv.select("rowkey", "qualifier", "value").repartition("rowkey")
    schema = "rowkey string, " + ", ".join(f"{q} string" for q in quals)

    def pivot_part(batches):
        chunks = []
        for pdf in batches:
            if len(pdf):
                chunks.append(
                    pdf.pivot_table(
                        index="rowkey",
                        columns="qualifier",
                        values="value",
                        aggfunc="first",
                    )
                )
        if not chunks:
            return
        allp = pd.concat(chunks)
        if allp.index.has_duplicates:  # a key's cells split across batches
            allp = allp.groupby(level=0).first()
        allp = allp.reindex(columns=quals)
        out = allp.reset_index()
        out = out.where(pd.notna(out), None)
        yield out[["rowkey", *quals]]

    return part.mapInPandas(pivot_part, schema)
