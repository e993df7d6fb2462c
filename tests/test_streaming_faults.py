"""At-least-once safety of the continuous dedup sinks under injected
crashes (SURVEY.md §2 ops 48j/48k; VERDICT r4 'next round' item 7).

The clean-replay tests in test_streaming.py prove idempotence when every
batch ran to completion before being re-delivered. These tests prove the
harder cases foreachBatch actually exposes:

- **torn store**: the query dies AFTER the accepted write but BEFORE the
  index write of batch b (``pre_index`` hook). Spark never committed b,
  so a restart from the same checkpoint re-delivers b against a store
  holding b's partial output. Batch-scoped overwrite + the
  ``batch_id < b`` read filter must make the re-run reproduce the
  original verdicts exactly.
- **duplicate delivery**: the query dies AFTER both writes but BEFORE
  the checkpoint commit (``post_index`` hook) — b is re-delivered
  although its stores are complete. The re-run must be a no-op in
  content terms.

Each scenario's final stores are compared value-for-value against an
uninterrupted reference run of the same source stream.
"""

from __future__ import annotations

import glob

import pytest

from hbase_bulkload_spark.streaming import stream_ops


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _write_source(docs, path: str, n_files: int = 6) -> None:
    docs.repartition(n_files).write.mode("overwrite").parquet(path)


def _stream(spark, schema, src):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _accepted_rows(spark, accepted_dir):
    return sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(accepted_dir)
        .select("doc_id", "text")
        .collect()
    )


def _run_clean(spark, docs, src, tmp_path, start_sink, tag):
    accepted = str(tmp_path / f"{tag}_ref_accepted")
    index = str(tmp_path / f"{tag}_ref_index")
    q = start_sink(
        _stream(spark, docs.schema, src), accepted, index,
        str(tmp_path / f"{tag}_ref_ck"),
    )
    q.awaitTermination(180)
    return _accepted_rows(spark, accepted)


def _crash_then_restart(
    spark, docs, src, tmp_path, start_sink, tag, point, crash_batch=3
):
    """Run the sink with a one-shot fault at (point, crash_batch); after
    the query dies, clear the hook and restart from the SAME checkpoint.
    Returns (accepted rows, index dir, torn_observed)."""
    accepted = str(tmp_path / f"{tag}_accepted")
    index = str(tmp_path / f"{tag}_index")
    ck = str(tmp_path / f"{tag}_ck")
    fired = []

    def hook(p, b):
        if p == point and b == crash_batch and not fired:
            fired.append((p, b))
            raise RuntimeError(f"injected crash at {p} of batch {b}")

    stream_ops._fault_hook = hook
    try:
        q = start_sink(_stream(spark, docs.schema, src), accepted, index, ck)
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(180)
    finally:
        stream_ops._fault_hook = None
    assert fired, "fault hook never fired — crash batch id not reached"

    # characterize the torn state the restart must recover from
    acc_batches = {
        p.rsplit("=", 1)[1] for p in glob.glob(f"{accepted}/batch_id=*")
    }
    idx_batches = {
        p.rsplit("=", 1)[1] for p in glob.glob(f"{index}/batch_id=*")
    }
    torn = str(crash_batch) in acc_batches and str(crash_batch) not in idx_batches

    q2 = start_sink(_stream(spark, docs.schema, src), accepted, index, ck)
    q2.awaitTermination(180)
    return _accepted_rows(spark, accepted), index, torn


@pytest.mark.parametrize("point", ["pre_index", "post_index"])
def test_exact_dedup_sink_survives_crash(spark, sf_dir, tmp_path, point):
    docs = _docs(spark, sf_dir)
    src = str(tmp_path / "src")
    _write_source(docs, src)
    ref = _run_clean(
        spark, docs, src, tmp_path,
        stream_ops.start_incremental_dedup_sink, f"exact_{point}",
    )
    got, index, torn = _crash_then_restart(
        spark, docs, src, tmp_path,
        stream_ops.start_incremental_dedup_sink, f"exact_{point}", point,
    )
    if point == "pre_index":
        assert torn, "pre_index crash should leave accepted without index"
    assert got == ref
    # index consistency: exactly one hash per accepted doc, no dangling
    from pyspark.sql import functions as F

    idx = spark.read.parquet(index).select("text_hash")
    n_hashes = docs.select(F.md5("text")).distinct().count()
    assert idx.count() == idx.distinct().count() == n_hashes


@pytest.mark.parametrize("point", ["pre_index", "post_index"])
def test_near_dedup_sink_survives_crash(spark, sf_dir, tmp_path, point):
    docs = _docs(spark, sf_dir)
    src = str(tmp_path / "nsrc")
    _write_source(docs, src)
    ref = _run_clean(
        spark, docs, src, tmp_path,
        stream_ops.start_incremental_near_dedup_sink, f"near_{point}",
    )
    got, index, torn = _crash_then_restart(
        spark, docs, src, tmp_path,
        stream_ops.start_incremental_near_dedup_sink, f"near_{point}", point,
    )
    if point == "pre_index":
        assert torn, "pre_index crash should leave accepted without index"
    assert got == ref
    # band index covers exactly the accepted docs
    accepted_ids = {d for d, _ in got}
    idx_ids = {
        r.doc_id
        for r in spark.read.parquet(index).select("doc_id").distinct().collect()
    }
    assert idx_ids == accepted_ids


@pytest.mark.parametrize("point", ["pre_load", "post_load"])
def test_bulkload_hfile_sink_survives_crash(spark, sf_dir, tmp_path, point):
    """At-least-once safety of the streaming doBulkLoad sink (op 48
    family's storage-tier member): crash BEFORE placement (staging
    written, nothing loaded) or AFTER placement but before the
    checkpoint commit (whole batch re-delivered against a table already
    holding its files). Batch-stamped file names + rename placement must
    make the restarted run converge to exactly the clean-run content —
    no duplicated or lost cells."""
    from hbase_bulkload_spark.operators import hfile_load
    from hbase_bulkload_spark.operators.bulkload import bulkload_kv
    from hbase_bulkload_spark.sources import records
    from hbase_bulkload_spark.sources.records import RECORD_COLS

    wide = records.wide9(spark, sf_dir).select(*RECORD_COLS)
    src = str(tmp_path / f"hsrc_{point}")
    wide.repartition(3).write.mode("overwrite").parquet(src)

    def start(table, ck):
        stream = (
            spark.readStream.schema(wide.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        cells = stream_ops.stream_bulkload_cells(
            stream, RECORD_COLS[:4], RECORD_COLS
        )
        return stream_ops.start_bulkload_hfile_sink(cells, table, ck)

    table = str(tmp_path / f"htable_{point}")
    ck = str(tmp_path / f"hck_{point}")
    fired = []

    def hook(p, b):
        if p == point and b == 1 and not fired:
            fired.append((p, b))
            raise RuntimeError(f"injected crash at {p} of batch {b}")

    stream_ops._fault_hook = hook
    try:
        q = start(table, ck)
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(180)
    finally:
        stream_ops._fault_hook = None
    assert fired, "fault hook never fired"

    q2 = start(table, ck)
    q2.awaitTermination(180)

    want = bulkload_kv(wide, RECORD_COLS[:4], RECORD_COLS).select(
        "rowkey", "qualifier", "value"
    )
    got = hfile_load.scan_hfiles(spark, table).select(
        "rowkey", "qualifier", "value"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
