"""Relational operator surface (SURVEY.md §2.7-§2.10).

The reference has no joins/aggregations — they are table-stakes query
capability this engine adds (SURVEY.md §2.7 note). Everything here is a
thin, composable layer over built-in DataFrame ops so Catalyst keeps
full optimization freedom; the helpers encode the *scale* decisions:

- dimension joins broadcast explicitly (no shuffle of the fact side);
- top-k is expressed as orderBy+limit so Spark plans
  TakeOrderedAndProject (no global sort materialization);
- ranked-window top-n carries a deterministic tie-break key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact ⋈ small dimension with an explicit broadcast hint: at 100 TB
    the fact side never shuffles for a dimension lookup."""
    return fact.join(F.broadcast(dim), on, how)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. orderBy+limit lets Catalyst plan
    TakeOrderedAndProject: each partition keeps k rows, the driver merges
    — no full global sort at any scale. `order` must be a total order
    (include a unique tie-break column) for deterministic results."""
    return df.orderBy(*order).limit(k)


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order: Sequence[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-n per group via row_number. One shuffle on the partition keys;
    `order` must include a tie-break for determinism."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the fact side, replicate the dim side.

    When one join key carries a disproportionate share of fact rows, a
    plain shuffle join lands that key on one reducer (the reference's
    anti-hotspot concern — hashed row keys, RowKeyConverter.java:14-17 —
    applied to joins). Each fact row gets a deterministic salt in
    [0, n_salts) from ``salt_src`` (any well-distributed fact column);
    each dim row is replicated once per salt; joining on (key, salt)
    spreads every hot key over ``n_salts`` reducers. Dim-side cost is
    n_salts× replication — use when the dim is too large to broadcast
    but far smaller than the fact. AQE's skew-join split handles
    moderate skew automatically; explicit salting is for the extreme
    tail and for deterministic partition budgets. For inner/left joins
    the result is exactly the plain join (salt never changes matches —
    it is derived from the fact row, constant per row, and the dim
    carries every value). Right/full outer are REJECTED: the dim side is
    exploded n_salts× before the join, so each unmatched dim row would
    be emitted once per salt, breaking the equivalence.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left only, got how={how!r}: "
            "unmatched dim rows would duplicate n_salts times"
        )
    f = fact.withColumn(
        "_fsalt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).cast("int")
    )
    d = dim.withColumn(
        "_dsalt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = f.join(
        d,
        (F.col(fact_key) == F.col(dim_key)) & (F.col("_fsalt") == F.col("_dsalt")),
        how,
    )
    return out.drop("_fsalt", "_dsalt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: for each left row, attach the payload of the
    latest right row with ``right.ts <= left.ts`` on the same key
    (DuckDB/kdb `ASOF JOIN` semantics; Spark has no native operator).

    Implementation is the union-window technique, not a range join:
    tag both sides, sort each key's rows by (ts, side) — right-side rows
    first on ties so an equal timestamp matches — and carry the right
    payload forward with ``last(..., ignorenulls)``. One shuffle (the
    window's), no candidate-pair blow-up: cost is that of a sort-merge
    join regardless of time-range density, which is the property that
    survives 100 TB.

    ``right`` must be unique on (key, ts) — pre-dedupe with
    :func:`ranked` — and must not contain ``payload_cols`` collisions
    with ``left``. Left columns pass through; matched payload columns
    are null where no right row precedes.
    """
    keys = list(key_cols)
    lcols = [c for c in left.columns]
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        *keys,
        F.col(ts_col),
        *[F.col(c) for c in payload_cols],
    ).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = [
        F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(c)
        for c in payload_cols
    ]
    return (
        u.select(*lcols, "_side", *matched)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def binned_range_join(
    facts: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_days: int = 16,
) -> DataFrame:
    """Pure interval-containment join (NO equi key) rewritten bin-to-equi
    — the scale form of a theta join.

    Naively, `fact.ts BETWEEN iv.start AND iv.end` with no shared key
    plans a (Broadcast)NestedLoopJoin: every fact row is compared to
    every interval — O(|facts| × |intervals|), the first thing that dies
    at 100 TB. Discretizing time into ``bin_days`` buckets turns it into
    an equi-join: each fact row carries its single bin id, each interval
    is exploded to the bins it overlaps (≤ len/bin + 1 rows — pick
    ``bin_days`` ~ the typical interval length so this stays ~2), the
    engine hash-joins on the bin id, and the original containment
    predicate is re-applied as a cheap residual filter. Same semantics,
    hash-join scalability, shuffle keyed on time — uniform by
    construction. (Plan contrast pinned by tests/test_plans.py.)

    ``end_col`` is exclusive. Facts with null ts or intervals with null
    bounds drop, as in the naive inner join.
    """
    day = lambda c: F.floor(F.unix_timestamp(c) / 86400)  # noqa: E731
    fbin = F.floor(day(F.col(ts_col)) / bin_days)
    f = facts.withColumn("_bin", fbin)
    ibins = F.sequence(
        F.floor(day(F.col(start_col)) / bin_days),
        # upper bound is floor(day(end)/bin) unconditionally: with a
        # non-midnight end whose day is a bin boundary, facts on the end
        # day still satisfy ts < end but live in that boundary bin — a
        # (day(end)-1)-based bound would drop them. The extra bin for
        # midnight-aligned ends is harmless: the residual containment
        # filter removes non-matches.
        F.floor(day(F.col(end_col)) / bin_days),
    )
    iv = intervals.withColumn("_bin", F.explode(ibins))
    out = f.join(iv, "_bin").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return out.drop("_bin")


def exact_quantiles_binned(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: Sequence[tuple[float, str]],
    scale: int = 100,
    decimals: int = 6,
) -> DataFrame:
    """Exact interpolated quantiles whose per-group state is bounded by
    the value DOMAIN, not the data size.

    Spark's exact ``percentile`` aggregate buffers a value→count hash
    map per aggregation buffer; over a near-unique double column each
    group's map holds ~n_group entries, growing linearly with the data —
    an executor-memory cliff at 100 TB. This formulation keeps the
    same exact semantics with bounded state for fixed-precision
    (money-typed) columns:

    1. Quantize to integer bins: ``bin = round(v * scale)``. For
       2-decimal prices and scale=100 this is cents — and the mapping
       round-trips exactly (``bin / scale`` reproduces the original
       double bit-for-bit), so downstream arithmetic sees the very same
       doubles as a raw-value formulation.
    2. ``groupBy(group, bin).count()`` — fully distributed with map-side
       partial aggregation; per-group distinct-bin cardinality is capped
       by the cents domain, which does NOT grow as the data grows 100×.
    3. A per-group cumulative count over bins (window ordered by bin):
       at most |domain| rows per group, sort is spill-safe.
    4. The interpolated quantile from cumulative counts with the shared
       Spark/DuckDB formula — h = (n-1)·q, result =
       (ceil(h)-h)·v_lo + (h-floor(h))·v_hi (v when h is integral) —
       so results are hash-identical to ``percentile`` /
       ``quantile_cont`` on the raw column.

    ``quantiles`` is a sequence of (q, output_name). Nulls in
    ``value_col`` are excluded, matching both engines. Contract note:
    a group whose values are ALL null is dropped entirely (no row),
    whereas the native ``percentile`` aggregate would emit the group
    with NULL quantiles — callers needing empty groups should left-join
    this result back onto the group domain.
    """
    binned = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            group_col,
            F.round(F.col(value_col) * scale).cast("long").alias("_bin"),
        )
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = Window.partitionBy(group_col).orderBy("_bin")
    w_all = Window.partitionBy(group_col)
    pos = binned.select(
        group_col,
        "_bin",
        "_cnt",
        (F.sum("_cnt").over(w_cum) - 1).alias("_end"),  # 0-based end position
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    val = F.col("_bin").cast("double") / scale
    start = F.col("_end") - F.col("_cnt") + 1
    aggs = [F.max("_n").alias("_n")]
    for q, name in quantiles:
        h = (F.col("_n") - 1).cast("double") * F.lit(float(q))
        lo, hi = F.floor(h), F.ceil(h)
        covers = lambda p: (start <= p) & (p <= F.col("_end"))  # noqa: E731
        aggs.append(F.max(F.when(covers(lo), val)).alias(f"_lo_{name}"))
        aggs.append(F.max(F.when(covers(hi), val)).alias(f"_hi_{name}"))
    out = pos.groupBy(group_col).agg(*aggs)
    proj = [F.col(group_col)]
    for q, name in quantiles:
        h = (F.col("_n") - 1).cast("double") * F.lit(float(q))
        lo, hi = F.floor(h), F.ceil(h)
        v_lo, v_hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
        interp = F.when(lo == hi, v_lo).otherwise(
            (hi.cast("double") - h) * v_lo + (h - lo.cast("double")) * v_hi
        )
        proj.append(F.round(interp, decimals).alias(name))
    return out.select(*proj)


def snapshot_diff(
    v1: DataFrame,
    v2: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a table — the read-side
    dual of the CDC merge/upsert (op 24b): classify every key as
    ``insert`` (v2 only), ``delete`` (v1 only), or ``update`` (present
    in both, any compare column differing null-safely); unchanged rows
    are dropped. Output carries the key, the change tag, and old_/new_
    values per compared column.

    Scale shape: one full-outer shuffle join on the key — both sides
    partition-prune and column-prune to key + compared columns at the
    scan. For very wide rows, pre-hashing the compared columns
    (md5(concat_ws)) and joining only hashes halves the shuffle at the
    cost of a second lookup join for the changed minority; with the
    narrow column sets a diff report actually carries, the direct form
    wins.
    """
    a = v1.select(*key_cols, *compare_cols).withColumn("_p1", F.lit(1)).alias("a")
    b = v2.select(*key_cols, *compare_cols).withColumn("_p2", F.lit(1)).alias("b")
    cond = None
    for k in key_cols:
        c = F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = c if cond is None else cond & c
    differs = None
    for c in compare_cols:
        d = ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        differs = d if differs is None else differs | d
    change = (
        F.when(F.col("_p1").isNull(), F.lit("insert"))
        .when(F.col("_p2").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    out = [
        F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in key_cols
    ]
    out.append(change.alias("change"))
    for c in compare_cols:
        out += [
            F.col(f"a.{c}").alias(f"old_{c}"),
            F.col(f"b.{c}").alias(f"new_{c}"),
        ]
    return (
        a.join(b, cond, "full_outer").filter(change.isNotNull()).select(*out)
    )
