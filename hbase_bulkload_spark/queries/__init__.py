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
    # round 6 head: the seven queries whose oracles flipped from
    # rows-only to full this round (in-query recall / banding verdicts,
    # committed BPE-merge fixture) — their outputs changed shape, so the
    # official record needs fresh rows proving the verdict pattern green
    "q_dedup_near", "q_dedup_simhash", "q_dedup_incremental_minhash",
    "q_sim_topk_ivf", "q_sim_pairs_lsh", "q_multimodal_phash",
    "q_bpe_merges",
    # rotation hygiene (round-5 brief item 7): every key below last
    # received a driver row in round 1 or 2 — green then, untouched
    # since — so they fill the rest of this round's ~50-slot window,
    # refreshing the official record for code paths a Spark upgrade or
    # AQE change could silently shift. Oldest (r1) first.
    "q_versions_top3", "q_ttl_filter", "q_current_vs_history",
    "q_merge_upsert", "q_window_distribution", "q_topk",
    "q_set_union", "q_set_intersect_except", "q_agg_percentile",
    "q_string_funcs", "q_date_funcs", "q_math_funcs",
    "q_array_funcs", "q_map_funcs", "q_json_funcs",
    # r2-latest keys
    "q_scan_text", "q_parse_delimited", "q_scan_csv", "q_scan_columnar",
    "q_scan_rcfile", "q_scan_avro", "q_unpivot_kv", "q_validate_records",
    "q_filter_arity", "q_filter_notnull", "q_project",
    "q_rowkey_md5", "q_rowkey_concat", "q_key_reverse", "q_salt_bucket",
    "q_pivot_wide", "q_range_partition", "q_zorder_layout", "q_sorted_ingest",
    "q_sample_per_group",
    "q_join_inner", "q_join_salted", "q_join_broadcast", "q_join_outer",
    "q_join_semi", "q_join_anti", "q_join_range", "q_join_asof",
    "q_join_range_binned", "q_join_cross", "q_sql_star",
    "q_sql_tpch3", "q_sql_tpch5",
    "q_agg_groupby", "q_agg_histogram", "q_agg_string_agg", "q_agg_argmax",
    "q_agg_count_distinct", "q_agg_rollup", "q_agg_cube",
    "q_agg_grouping_sets", "q_agg_conditional",
    "q_window_rank", "q_window_lag", "q_window_moving",
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
