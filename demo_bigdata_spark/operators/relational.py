"""Relational tier [EXT]: joins, set ops, window functions, multi-dim aggregates.

The reference has NO joins/windows/set-ops anywhere (verified absence,
SURVEY.md §2.5) — its single fact table never needs them. The driver's test
corpus is a TPC-H-ish star schema and the north star mandates scale-ready
analytics, so this tier ships them as built-in Spark primitives plus one
custom operator Spark lacks natively (as-of join, built scalably from
union + window, no cartesian product).

Scale posture per operator is documented inline. Rules of thumb applied:
broadcast only bounded dimensions (region/nation: O(100) rows at any scale);
fact-fact joins shuffle on their keys and rely on AQE for skew; window
functions always partitioned (a global window moves everything to one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_dim(fact: DataFrame, dim: DataFrame, on, how: str = "inner", broadcast: bool = True) -> DataFrame:
    """Fact-dimension equi-join. ``broadcast=True`` ships the dim to every
    executor (no shuffle of the fact side) — correct whenever the dim is
    bounded (region=5, nation=25 at every TPC-H SF). For unbounded "dims"
    (customer/part at 100 TB) pass broadcast=False and let AQE pick
    sort-merge/shuffle-hash."""
    right = F.broadcast(dim) if broadcast else dim
    return fact.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: rows of left with a match in right; right columns never
    materialize (smaller shuffle than inner+distinct)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS."""
    return left.join(right, on=on, how="left_anti")


def rank_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_fn=F.row_number,
) -> DataFrame:
    """Top-k per group via ranking window (SNIPPETS/common OLAP pattern).

    Shuffles once on the partition cols; each group sorts locally. At scale
    this beats a global sort by construction; for heavily skewed groups,
    pre-aggregate or salt before ranking. ``order_cols`` must give a total
    order (include a unique key) for deterministic results.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("rnk", rank_fn().over(w))
        .filter(F.col("rnk") <= k)
    )


def running_aggregate(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    value_col: str,
    agg=F.sum,
    out_col: str = "running_value",
) -> DataFrame:
    """Cumulative aggregate per partition (frame: unbounded preceding → current).
    One shuffle on partition cols; state is per-group, bounded."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, agg(value_col).over(w))


def with_lag(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    value_col: str,
    out_col: str = "prev_value",
    offset: int = 1,
) -> DataFrame:
    """lag() analytic — previous row's value within the partition order."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(out_col, F.lag(value_col, offset).over(w))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    right.ts <= left.ts, matched on ``on`` — an operator Spark lacks natively.

    Implementation is the scalable union+window carry-forward (NOT a range
    cross-join): tag both sides, union, sort within each ``on`` partition by
    (ts, side) with right rows first at equal ts, carry the last non-null
    right value forward, keep left rows. One shuffle on the join key, state
    bounded per key — survives any scale where a single key's history fits a
    partition (salt by time-bucket if one key is unbounded).

    DuckDB twin: native ``ASOF JOIN``.
    """
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols],
        *[F.col(f"asof_{c}") for c in right_value_cols],
    )


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: salt -> partial agg on
    (key, salt) -> final agg on key.

    ``aggs`` maps output name -> (column, fn) for algebraic fns
    (count/sum/min/max): the partial result re-aggregates exactly (counts and
    sums re-sum; min/max re-min/max), so results are identical to a direct
    groupBy. Use when one key holds a disproportionate share of rows and
    AQE's skew handling isn't enough (e.g. a null-key flood): the salt fans
    the hot key across ``salt_buckets`` reducers, the final agg touches only
    (n_keys x salt_buckets) rows.
    """
    _FINAL = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    for name, (_, fn) in aggs.items():
        if fn not in _FINAL:
            raise ValueError(f"{name}: non-algebraic fn {fn!r} cannot be salted")
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*group_cols, F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[_PARTIAL[fn](col).alias(f"__p_{name}") for name, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[_FINAL[fn](f"__p_{name}").alias(name) for name, (_, fn) in aggs.items()]
    )


def merge_upsert(target: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """MERGE INTO emulation (upsert) without a table format that supports it:
    anti-join the target against the update keys, union the updates back.

    This is the batch CDC/SCD pattern when Delta/Iceberg MERGE is
    unavailable; with those formats the same call becomes a metadata-level
    MERGE. The anti-join shuffles on the key; updates are usually small
    enough to broadcast (Catalyst decides via AQE).
    """
    survivors = target.join(updates.select(*key_cols), key_cols, "left_anti")
    return survivors.unionByName(updates)


def rollup_aggregate(df: DataFrame, dims: list[str], aggs: list[Column]) -> DataFrame:
    """ROLLUP — hierarchical subtotals. Spark plans a single Expand + hash
    aggregate (one pass over the fact, no N separate jobs)."""
    return df.rollup(*dims).agg(*aggs)


def cube_aggregate(df: DataFrame, dims: list[str], aggs: list[Column]) -> DataFrame:
    """CUBE — all dimension combinations, single Expand + aggregate pass."""
    return df.cube(*dims).agg(*aggs)


def pivot_table(
    df: DataFrame, group_col: str, pivot_col: str, pivot_values: list[str], agg: Column
) -> DataFrame:
    """Pivot with EXPLICIT pivot values — never let Spark collect distinct
    values first (that's an extra job, and unbounded output width at scale)."""
    return df.groupBy(group_col).pivot(pivot_col, pivot_values).agg(agg)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    lo_col: str,
    hi_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval range join (left.ts BETWEEN right.lo AND right.hi,
    plus optional equi keys) as an equi-join on coarse time buckets.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin — O(n*m)
    and driver-memory-bound; with equi keys it still filters post-shuffle
    per key group. Here each interval is exploded onto the buckets it
    covers (sequence over floor(lo)..floor(hi)) and each point carries its
    single bucket, so the join is a plain hash equi-join on
    (keys..., bucket) followed by the exact containment filter. A point's
    bucket is unique, so a (point, interval) pair meets in at most one
    bucket — no post-join dedup. Explode factor is span/bucket_seconds + 1:
    pick bucket_seconds near the typical interval length (replication
    stays O(1)) — both sides then scale linearly and shuffle on keys that
    AQE can rebalance."""
    keys = keys or []
    bs = F.lit(bucket_seconds).cast("long")
    lpoint = F.floor(F.unix_timestamp(F.col(left_ts)) / bs).alias("_bucket")
    l2 = left.withColumn("_bucket", lpoint)
    r2 = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo_col)) / bs),
                F.floor(F.unix_timestamp(F.col(hi_col)) / bs),
            )
        ),
    )
    joined = l2.join(r2, [*keys, "_bucket"]).filter(
        (F.col(left_ts) >= F.col(lo_col)) & (F.col(left_ts) <= F.col(hi_col))
    )
    return joined.drop("_bucket")


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """[EXT] slowly-changing-dimension type 2 maintenance: apply a batch of
    attribute updates to a versioned dimension — changed keys get their
    open row CLOSED (``valid_to`` = update ts) plus a new open row; no-op
    updates (same attributes) and untouched keys pass through; history
    rows are never modified.

    One shuffle: the full-outer join of open rows to the latest update per
    key (both sides keyed by ``key_col``); closed history unions through
    untouched. Attribute comparison is null-safe per column. Latest-
    update-wins within a batch via a per-key row_number (deterministic
    tie-break on the attribute values).

    The standard warehouse dimension flow at scale: dim is millions of
    rows (broadcastable or co-partitioned), updates are the day's deltas —
    cost is proportional to the delta plus one pass over open rows.
    """
    extra = [
        c
        for c in dim.columns
        if c not in {key_col, from_col, to_col} and c not in attr_cols
    ]
    if extra:
        raise ValueError(
            f"dim columns {extra} are neither key/validity nor in attr_cols — "
            "every versioned attribute must be listed so new rows are complete"
        )
    w = Window.partitionBy(key_col).orderBy(
        F.desc(ts_col), *[F.asc(c) for c in attr_cols]
    )
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).alias("_uts"),
            *[F.col(c).alias(f"_u_{c}") for c in attr_cols],
        )
    )
    open_rows = dim.filter(F.col(to_col).isNull())
    history = dim.filter(F.col(to_col).isNotNull())

    j = open_rows.join(latest, open_rows[key_col] == F.col("_k"), "full_outer")
    same = F.lit(True)
    for c in attr_cols:
        same = same & open_rows[c].eqNullSafe(F.col(f"_u_{c}"))

    dim_cols = dim.columns
    # the `same` branch must also require an open row to exist: for a
    # brand-new key whose update attrs are all NULL, eqNullSafe against
    # the absent open row's NULLs is true, and without the isNotNull
    # guard kept_open would emit a spurious all-NULL row
    kept_open = j.filter(
        F.col("_k").isNull() | (open_rows[key_col].isNotNull() & same)
    ).select(*[open_rows[c] for c in dim_cols])
    closed_now = j.filter(
        F.col("_k").isNotNull() & open_rows[key_col].isNotNull() & ~same
    ).select(
        *[
            F.col("_uts").alias(to_col) if c == to_col else open_rows[c]
            for c in dim_cols
        ]
    )
    new_open = j.filter(
        F.col("_k").isNotNull() & (open_rows[key_col].isNull() | ~same)
    ).select(
        *[
            F.col("_k").alias(key_col)
            if c == key_col
            else F.col("_uts").alias(from_col)
            if c == from_col
            else F.lit(None).cast(dim.schema[c].dataType).alias(to_col)
            if c == to_col
            else F.col(f"_u_{c}").alias(c)
            for c in dim_cols
        ]
    )
    return history.unionByName(kept_open).unionByName(closed_now).unionByName(
        new_open
    )
