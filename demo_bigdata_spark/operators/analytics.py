"""Batch analytics over the events fact table.

Re-expresses the reference's dashboard/stats/query surface (SURVEY.md §2.2-2.4)
as pure ``DataFrame -> DataFrame`` library functions — one implementation
instead of the reference's three copies (streaming-service inline, api-service
Spark path, api-service Python-over-cache path; reference:
services/streaming-service/api.py:483-561,
services/api-service/data_service.py:116-150,82-91).

Determinism rules (FIXTURES.md): time cutoffs are literal parameters, never
wall clock; ``collect_set`` + ``array_sort`` instead of ``collect_list``;
floats rounded explicitly; every computed column aliased.

Scale notes inline per operator. General posture: no ``collect()`` anywhere;
aggregates compile to partial (map-side) + final HashAggregate; top-k compiles
to TakeOrderedAndProject (never a global sort of raw data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from demo_bigdata_spark.functions.scalar import (
    SYNTH_EVENT_CATEGORIES,
    categorize,
    pct_of_total,
)

# ---------------------------------------------------------------------------
# Filters / projections (P12-P14)
# ---------------------------------------------------------------------------


def apply_filters(df: DataFrame, **equals) -> DataFrame:
    """Dynamically composed equality filters (reference P12:
    services/streaming-service/api.py:263-276). Predicates push down to the
    parquet/Iceberg scan (Catalyst PushDownPredicates)."""
    for col_name, value in equals.items():
        if value is not None:
            df = df.filter(F.col(col_name) == F.lit(value))
    return df


def time_range(df: DataFrame, ts_col: str, start=None, end=None) -> DataFrame:
    """Literal time-range predicate (reference P13:
    services/api-service/data_service.py:119-126 — but parameterized instead
    of ``now() - hours``, for determinism). Prunes event-date partitions when
    the table is partitioned by event date (sources/catalog.py).

    When the table carries a raw nanos companion column (``_<ts_col>_ns``,
    see sources.catalog.load_table), the predicate is applied to the RAW
    attribute with ns-converted literals: a filter on the derived timestamp
    expression cannot push to the parquet scan, one on the stored long can —
    verified in tests/test_plans.py. floor(ns/1000) >= T_us  <=>
    ns >= T_us*1000 for integer T_us, so semantics are exact.
    """
    ns_col = f"_{ts_col}_ns"
    if ns_col in df.columns:
        if start is not None:
            df = df.filter(F.col(ns_col) >= F.lit(_to_ns(start)))
        if end is not None:
            df = df.filter(F.col(ns_col) < F.lit(_to_ns(end)))
        return df
    if start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.filter(F.col(ts_col) < F.lit(end))
    return df


def _to_ns(value) -> int:
    """Literal timestamp (ISO string or datetime, UTC) -> epoch nanoseconds."""
    import calendar
    import datetime as dt

    d = dt.datetime.fromisoformat(value) if isinstance(value, str) else value
    return (
        calendar.timegm(d.timetuple()) * 1_000_000 + d.microsecond
    ) * 1000


def distinct_values(df: DataFrame, col_name: str) -> DataFrame:
    """Distinct dimension values (reference P14:
    services/api-service/data_service.py:165-191). Partial-aggregate
    shuffle on a low-cardinality column — cheap at any scale."""
    return df.select(col_name).distinct().orderBy(col_name)


# ---------------------------------------------------------------------------
# Aggregations (A1-A9)
# ---------------------------------------------------------------------------


def global_stats(
    df: DataFrame, *, distinct_cols: tuple[str, ...] = ("user_id", "event_type")
) -> DataFrame:
    """Global multi-aggregate totals card (reference A1:
    services/api-service/data_service.py:127-132).

    Exact countDistinct: each distinct column expands the aggregation
    (Spark plans one Expand + aggregate). At 100 TB prefer
    :func:`global_stats_approx` — HLL sketches aggregate map-side without
    the expand blowup.
    """
    aggs = [F.count("*").alias("total_events")]
    aggs += [F.countDistinct(c).alias(f"unique_{c}") for c in distinct_cols]
    return df.agg(*aggs)


def global_stats_approx(
    df: DataFrame, *, distinct_cols: tuple[str, ...] = ("user_id", "event_type"), rsd: float = 0.02
) -> DataFrame:
    """HLL-sketch variant of :func:`global_stats` — the 100 TB default."""
    aggs = [F.count("*").alias("total_events")]
    aggs += [F.approx_count_distinct(c, rsd).alias(f"approx_unique_{c}") for c in distinct_cols]
    return df.agg(*aggs)


def global_stats_approx_verified(
    df: DataFrame,
    *,
    distinct_cols: tuple[str, ...] = ("user_id", "event_type"),
    rsd: float = 0.02,
    bound: float = 0.05,
) -> DataFrame:
    """:func:`global_stats_approx` with its accuracy contract asserted in-engine.

    Emits the EXACT aggregates plus one boolean per sketch:
    ``abs(approx - exact) <= bound * exact`` with ``bound = 2.5 * rsd`` by
    default (HLL++ relative standard deviation 0.02 → a 2.5σ envelope). The
    exact/approx pair runs in ONE aggregate, so the sketch is verified against
    the same scan it would replace. A deterministic oracle computes the exact
    side and literal-true bounds; a sketch drifting out of its documented
    envelope flips the boolean and fails the differential — strictly stronger
    than a rows-only check. This is the verification harness; production at
    100 TB drops the exact ``countDistinct`` (the expand blowup) and keeps
    only the sketch column.
    """
    aggs = [F.count("*").alias("total_events")]
    aggs += [F.countDistinct(c).alias(f"unique_{c}") for c in distinct_cols]
    aggs += [F.approx_count_distinct(c, rsd).alias(f"_approx_{c}") for c in distinct_cols]
    checks = [
        (
            F.abs(F.col(f"_approx_{c}") - F.col(f"unique_{c}"))
            <= F.lit(bound) * F.col(f"unique_{c}")
        ).alias(f"hll_within_bound_{c}")
        for c in distinct_cols
    ]
    exact_cols = ["total_events"] + [f"unique_{c}" for c in distinct_cols]
    return df.agg(*aggs).select(*exact_cols, *checks)


def type_distribution(df: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Group-by count + in-engine percentage-of-total (reference A2+A3:
    services/api-service/data_service.py:289-303; percentage moved in-engine,
    see functions.scalar.pct_of_total: broadcast scalar total, no global
    window)."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("event_count"))
    return (
        pct_of_total(counts, "event_count", "percentage")
        .select(group_col, "event_count", "percentage")
        .orderBy(F.desc("event_count"), group_col)
    )


def category_distribution(df: DataFrame, type_col: str = "event_type") -> DataFrame:
    """A2/A3 over the derived category (reference P8 + A2)."""
    with_cat = df.withColumn(
        "event_category", categorize(type_col, SYNTH_EVENT_CATEGORIES)
    )
    return type_distribution(with_cat, "event_category")


def hourly_series(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Hourly event-count time series (reference A4:
    services/api-service/data_service.py:339-343). ``date_trunc`` group-by;
    output hour formatted as string for oracle-stable comparison. Streaming
    twin: streaming/pipeline.py tumbling window."""
    return (
        df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
        .agg(F.count("*").alias("event_count"))
        .select(
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_count",
        )
        .orderBy("hour")
    )


def top_entities(
    df: DataFrame,
    group_cols: list[str],
    *,
    distinct_col: str,
    list_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-k entities by event count (reference A5/A6:
    services/api-service/data_service.py:358-406), with
    ``collect_set``+``array_sort`` replacing collect_list+Python set()
    (reference A7: data_service.py:364,374 — set semantics, deterministic).

    Plan shape: partial+final hash aggregate, then TakeOrderedAndProject —
    only k rows cross to the driver-side limit, never a full sort. Ties
    broken by group cols for determinism.
    """
    order = [F.desc("event_count")] + [F.col(c) for c in group_cols]
    return (
        df.filter(F.col(group_cols[0]).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct(distinct_col).alias(f"unique_{distinct_col}"),
            F.array_sort(F.collect_set(list_col)).alias(f"{list_col}s"),
        )
        .orderBy(*order)
        .limit(k)
    )


def numeric_profile(df: DataFrame, value_col: str = "value", group_col: str = "event_type") -> DataFrame:
    """First-class numeric aggregates the reference imported but never called
    (reference A9: services/api-service/data_service.py:7-11 — avg, stddev,
    sum, min, max, percentile_approx as declared surface).

    Exact ``percentile`` here (test scale + oracle comparability);
    ``percentile_approx`` (GK sketch) is the 100 TB default — see
    :func:`numeric_profile_approx`. Floats rounded 2dp for oracle hashing.
    """
    return (
        df.groupBy(group_col)
        .agg(
            F.round(F.avg(value_col), 2).alias("avg_value"),
            F.round(F.stddev_samp(value_col), 2).alias("stddev_value"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
            F.round(F.min(value_col), 2).alias("min_value"),
            F.round(F.max(value_col), 2).alias("max_value"),
            F.round(F.expr(f"percentile({value_col}, 0.5)"), 2).alias("median_value"),
        )
        .orderBy(group_col)
    )


def numeric_profile_approx(df: DataFrame, value_col: str = "value", group_col: str = "event_type") -> DataFrame:
    """Sketch-based quantiles for the 100 TB path (bounded-memory GK)."""
    return (
        df.groupBy(group_col)
        .agg(
            F.avg(value_col).alias("avg_value"),
            F.percentile_approx(value_col, 0.5, 10000).alias("p50"),
            F.percentile_approx(value_col, 0.99, 10000).alias("p99"),
        )
        .orderBy(group_col)
    )


def numeric_profile_approx_verified(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    accuracy: int = 10000,
    eps: float = 0.001,
) -> DataFrame:
    """:func:`numeric_profile_approx` with the GK rank-error contract asserted
    in-engine, in rank space — the form the guarantee is actually stated in.

    ``percentile_approx(accuracy=10000)`` guarantees the returned element's
    rank is within ``n / accuracy`` (1e-4·n) of the target rank; ``eps=1e-3``
    gives a 10× margin. For each quantile q the check recounts the sketch
    value's true rank against the full group — ``count(x < v) ≤ (q+eps)·n + 2``
    and ``count(x ≤ v) ≥ (q−eps)·n − 2`` (the ±2 absorbs the discrete
    rank-definition off-by-one, which is worth 1/n in quantile space and
    vanishes at scale; the two-sided lt/le pair makes the check tie-safe).
    A value-space band (exact percentile(q±eps)) is NOT equivalent: at small n
    the interpolated band sits strictly inside one inter-element gap and
    excludes the discrete element GK returns.

    Two scans + one broadcast join — deliberate: it is the verification
    harness for the one-scan production form :func:`numeric_profile_approx`.
    Emits exact avg/median plus the per-quantile booleans; the oracle computes
    the exact side and literal-true bounds, so a sketch outside its documented
    envelope fails the differential.
    """
    qs = {"p50": 0.5, "p99": 0.99}
    aggs = [
        F.round(F.avg(value_col), 2).alias("avg_value"),
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 2).alias("median_value"),
    ]
    aggs += [
        F.percentile_approx(value_col, q, accuracy).alias(f"_{name}")
        for name, q in qs.items()
    ]
    sk = df.groupBy(group_col).agg(*aggs)
    rank_aggs = [F.count("*").alias("_n")]
    for name in qs:
        rank_aggs += [
            F.count(F.when(F.col(value_col) < F.col(f"_{name}"), 1)).alias(f"_lt_{name}"),
            F.count(F.when(F.col(value_col) <= F.col(f"_{name}"), 1)).alias(f"_le_{name}"),
        ]
    ranks = (
        df.join(F.broadcast(sk.select(group_col, *[f"_{n}" for n in qs])), group_col)
        .groupBy(group_col)
        .agg(*rank_aggs)
    )
    checks = [
        (
            (F.col(f"_lt_{name}") <= (q + eps) * F.col("_n") + 2)
            & (F.col(f"_le_{name}") >= (q - eps) * F.col("_n") - 2)
        ).alias(f"{name}_within_eps")
        for name, q in qs.items()
    ]
    return (
        sk.join(ranks, group_col)
        .select(group_col, "avg_value", "median_value", *checks)
        .orderBy(group_col)
    )


# ---------------------------------------------------------------------------
# Sorts / limits / pagination (O1-O3)
# ---------------------------------------------------------------------------


def recent_events(df: DataFrame, ts_col: str = "ts", n: int = 200, tiebreak: str = "event_id") -> DataFrame:
    """Recent-N scan (reference O2: data_service.py:160-163) with an explicit
    tiebreak for determinism. Compiles to TakeOrderedAndProject."""
    return df.orderBy(F.desc(ts_col), F.col(tiebreak)).limit(n)


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization via lag + cumulative sum (the classic pattern;
    streaming twin is F.session_window in streaming/pipeline.py).

    One shuffle on the key; session boundaries are a lag() comparison and the
    session id a running sum — all window work, no self-join. Output: one row
    per (key, session) with bounds, size and duration.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_s = gap_minutes * 60

    def _secs(c):
        return c.cast("double")

    marked = df.withColumn(
        "new_session",
        F.when(
            _secs(F.col(ts_col)) - _secs(F.lag(F.col(ts_col)).over(w)) > gap_s,
            1,
        )
        .when(F.lag(F.col(ts_col)).over(w).isNull(), 1)
        .otherwise(0),
    )
    sessioned = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessioned.groupBy(key_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.round(
                F.max(_secs(F.col(ts_col))) - F.min(_secs(F.col(ts_col))), 2
            ).alias("duration_s"),
        )
    )


def paginate(
    df: DataFrame, order_by: list[Column], page: int, page_size: int
) -> DataFrame:
    """Offset pagination (reference O3 emulated it with
    ``limit(offset+size).collect()[offset:]`` and a comment that Spark lacks
    OFFSET — services/streaming-service/api.py:588-592). Spark >= 3.4 has
    native ``offset``: the plan is GlobalLimit/Offset over a bounded sort,
    still driver-safe. Order must be total (include a unique key)."""
    return df.orderBy(*order_by).offset(page * page_size).limit(page_size)


def paginate_keyset(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    last_ts: str | None,
    last_id: int | None,
    page_size: int,
) -> DataFrame:
    """[EXT] keyset (seek-method) pagination over the (ts DESC, id ASC) total
    order — the scale path beside :func:`paginate`. OFFSET pagination must
    sort-and-skip ``page*size`` rows on every page, which degrades linearly
    with page depth at 100 TB; keyset pushes ``ts < last_ts OR (ts = last_ts
    AND id > last_id)`` into the scan (parquet min/max row-group pruning on
    ``ts``), so every page costs the same: one pruned scan + top-k
    (TakeOrderedAndProject), no global shuffle, no skip.

    ``last_ts``/``last_id`` are the sort key of the previous page's final row;
    pass ``None`` for the first page (both must be None or both set — a lone
    ``last_ts`` would make the tie branch a NULL predicate and silently drop
    rows sharing the boundary timestamp).
    """
    if (last_ts is None) != (last_id is None):
        raise ValueError(
            "paginate_keyset: last_ts and last_id must both be None (first "
            f"page) or both set; got last_ts={last_ts!r}, last_id={last_id!r}"
        )
    if last_ts is not None:
        # cast the literal to the column's OWN type: comparing an LTZ literal
        # against an NTZ column (or vice versa) relies on implicit coercion in
        # the session TZ, shifting the page boundary on non-UTC sessions
        ts_type = df.schema[ts_col].dataType
        last = F.lit(last_ts).cast(ts_type)
        after = (F.col(ts_col) < last) | (
            (F.col(ts_col) == last) & (F.col(id_col) > F.lit(last_id))
        )
        df = df.filter(after)
    return df.orderBy(F.desc(ts_col), F.col(id_col)).limit(page_size)


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """[EXT] ordered funnel: how many users completed step 1, then step 2
    strictly after their first step-1 event, and so on. Returns one row per
    step with the surviving-user count and conversion rate vs step 1.

    Spark-first shape: ONE hash shuffle on the user key, then k chained
    window-min passes over the same partitioning (Catalyst collapses them
    into consecutive Window operators with no extra exchange — each step's
    earliest-completion time references the previous step's column). No
    self-joins, no per-user collect; state per row is k timestamps, so the
    plan scales linearly in events at any user cardinality.
    """
    w = Window.partitionBy(user_col)
    cur = df.select(user_col, type_col, ts_col)
    prev_t = None
    t_cols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev_t is not None:
            cond = cond & (F.col(ts_col) > F.col(prev_t))
        name = f"_t{i}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_t = name
        t_cols.append(name)
    per_user = cur.groupBy(user_col).agg(
        *[F.max(t).alias(t) for t in t_cols]
    )
    counts = per_user.agg(
        *[
            F.count(F.when(F.col(t).isNotNull(), 1)).cast("bigint").alias(f"_n{i}")
            for i, t in enumerate(t_cols)
        ]
    )
    # one row per step via explode of the single aggregate row — NOT a
    # unionAll of k selects, which would re-execute the whole pipeline k times
    step_structs = [
        F.struct(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"_n{i}").alias("n_users"),
            F.round(F.col(f"_n{i}") / F.greatest(F.col("_n0"), F.lit(1)), 4).alias(
                "conversion"
            ),
        )
        for i, step in enumerate(steps)
    ]
    return (
        counts.select(F.explode(F.array(*step_structs)).alias("s"))
        .select("s.*")
        .orderBy("step_idx")
    )


_NUMERIC_TYPES = {"byte", "short", "integer", "long", "float", "double", "decimal"}


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """[EXT] column-level data profile: one output row per column with row /
    null / distinct counts and min-max (numeric columns as doubles, string
    columns lexicographically). The pipeline health check you run before
    pointing a trainer at a new table.

    ONE scan, one aggregate row, exploded into per-column rows (the
    aggregate executes once — no per-column re-scans). With
    ``exact_distinct`` the multi-column DISTINCT compiles to an Expand
    (rows x columns before partial agg); at 100 TB pass
    ``exact_distinct=False`` for HLL sketches (approx_count_distinct),
    which keeps the pass fully map-side until the final 1-row reduce.
    """
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_nulls_{c}"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"_nd_{c}")
        )
        if types.get(c) in _NUMERIC_TYPES:
            aggs.append(F.min(col).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"_max_{c}"))
    one = df.agg(*aggs)
    structs = []
    for c in cols:
        is_num = types.get(c) in _NUMERIC_TYPES
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(types.get(c, "unknown")).alias("dtype"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.round(F.col(f"_nulls_{c}") / F.greatest(F.col("_rows"), F.lit(1)), 4).alias(
                    "null_rate"
                ),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (F.col(f"_min_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"_max_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
            )
        )
    return (
        one.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .orderBy("column_name")
    )


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    resolutions: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """[EXT] cascaded multi-resolution time-series rollup (hypertable-style
    continuous aggregate): the finest resolution aggregates the raw events
    ONCE; every coarser level re-aggregates the previous level's partials
    (counts sum, sums sum). At scale this is the difference between one raw
    scan + tiny follow-ups and k full scans — the pre-aggregation cascade
    behind every OLAP time-series store.

    Requires ``resolutions`` ordered fine -> coarse (each must truncate
    cleanly into the next). Output: (resolution, bucket, n, sum_value).
    """
    levels = []
    cur = (
        df.groupBy(F.date_trunc(resolutions[0], F.col(ts_col)).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col)).alias("_sv"),
        )
    )
    levels.append((resolutions[0], cur))
    for res in resolutions[1:]:
        cur = (
            cur.groupBy(F.date_trunc(res, F.col("bucket")).alias("bucket"))
            .agg(F.sum("n").alias("n"), F.sum("_sv").alias("_sv"))
        )
        levels.append((res, cur))
    out = None
    for res, lv in levels:
        piece = lv.select(
            F.lit(res).alias("resolution"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.col("n"),
            F.round(F.col("_sv"), 2).alias("sum_value"),
        )
        out = piece if out is None else out.unionAll(piece)
    return out.orderBy("resolution", "bucket")


def key_skew_report(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """[EXT] shuffle-skew diagnostic: per-key row counts for the heaviest
    keys with their share of the table and skew ratio vs the mean key. The
    "should I salt this join/agg?" report (operators.relational.salted_*).

    One shuffle on the key (partial-agg first); the global totals are a
    1-row aggregate over the per-key counts (AQE reuses the counts
    exchange), broadcast back. Top-k via TakeOrderedAndProject.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_nkeys")
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            F.col("key").cast("string").alias("key"),
            "n",
            F.round(F.col("n") / F.col("_total"), 4).alias("share"),
            F.round(F.col("n") * F.col("_nkeys") / F.col("_total"), 2).alias("skew_ratio"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(top)
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """[EXT] weekly cohort retention: users grouped by the week of their
    first event; for each (cohort_week, weeks_since) the count of cohort
    members active that week and their share of the cohort.

    Shape: one shuffle on the user key for first-seen (partial min
    map-side), one distinct on (user, week) riding the same key, a join
    back (cohort table is |users| rows — AQE broadcasts while it fits,
    shuffles beyond), and a final small agg. No window over raw events.
    """
    firsts = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = df.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("week")
    ).distinct()
    joined = active.join(firsts, user_col)
    cohort_sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        joined.withColumn(
            "weeks_since",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct(user_col).alias("active_users"))
        .join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "weeks_since",
            "active_users",
            F.round(F.col("active_users") / F.col("cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


def resample_time_series(
    df: DataFrame,
    ts_col: str = "ts",
    step: str = "1 hour",
    group_col: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Gap-filled time-series resampling: aggregate per bucket, then emit a
    row for EVERY bucket in each series' observed span, zero-filling gaps.

    Spark has no native gap-fill (the reference's hourly series simply skips
    empty hours — services/api-service/data_service.py:336-356). The dense
    time axis is built with sequence() + explode from each group's min/max —
    one row per (group, bucket) — then left-joined onto the sparse aggregate.
    The axis side is tiny (buckets-per-span rows, not event rows), so AQE
    broadcasts it when small; at 100 TB the join stays a bucket-key shuffle
    of the already-aggregated (not raw) data.

    Output: (group?, bucket, n, sum_value) with n=0, sum_value=0.0 on gaps.
    """
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else F.window(
        F.col(ts_col), step
    )["start"]
    keys = [group_col] if group_col else []
    sparse = (
        df.withColumn("bucket", bucket)
        .groupBy(*keys, "bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum(value_col), 2).alias("sum_value"))
    )
    spans = sparse.groupBy(*keys).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    axis = spans.select(
        *keys,
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    return (
        axis.join(sparse, [*keys, "bucket"], "left")
        .select(
            *keys,
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


def value_histogram(
    df: DataFrame,
    value_col: str = "value",
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column, empty bins included.

    Single-pass shape: one scan computes bin assignments (width_bucket), one
    hash aggregate counts them; the dense bin axis (n_bins rows) is generated
    on the driver side of the plan with sequence+explode and left-joined so
    empty bins appear with n=0. Bounds may be given (scale path: no extra
    pass) or computed with a first min/max pass (convenience path).
    Out-of-range values clamp into the edge bins, matching width_bucket's
    under/overflow buckets folded inward.

    Degenerate inputs: empty/all-NULL input raises ValueError (there is no
    meaningful axis to build); a constant column (lo == hi) widens the range
    to [lo, lo+1) so every row lands in bin 1 instead of width_bucket
    receiving an invalid zero-width range."""
    if lo is None or hi is None:
        bounds = df.agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).head()
        if bounds["lo"] is None or bounds["hi"] is None:
            raise ValueError(
                f"value_histogram: column {value_col!r} has no non-null values"
            )
        lo = float(bounds["lo"]) if lo is None else lo
        hi = float(bounds["hi"]) if hi is None else hi
    if hi <= lo:
        if hi < lo:
            raise ValueError(f"value_histogram: hi ({hi}) < lo ({lo})")
        hi = lo + 1.0  # constant column: one occupied bin, well-formed axis
    b = F.width_bucket(F.col(value_col), F.lit(lo), F.lit(hi), F.lit(n_bins))
    clamped = F.least(F.greatest(b, F.lit(1)), F.lit(n_bins))
    counts = (
        df.select(clamped.cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )
    axis = df.sparkSession.range(1, n_bins + 1).select(F.col("id").alias("bin"))
    w = (hi - lo) / n_bins
    return (
        axis.join(counts, "bin", "left")
        .select(
            "bin",
            F.round(F.lit(lo) + (F.col("bin") - 1) * F.lit(w), 6).alias("bin_lo"),
            F.round(F.lit(lo) + F.col("bin") * F.lit(w), 6).alias("bin_hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("bin")
    )
