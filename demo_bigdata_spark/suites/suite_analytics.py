"""Analytics-tier queries (SURVEY.md §2.2-2.4: P12-P14, A1-A9, O1-O3) with
DuckDB oracle twins, over the driver's synthetic ``events`` table."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_bigdata_spark.functions.scalar import SYNTH_EVENT_CATEGORIES, categorize_sql_case
from demo_bigdata_spark.operators import analytics as A
from demo_bigdata_spark.sources.catalog import load_table

# Literal cutoffs (events span 2024-01-01 .. 2024-01-30; FIXTURES.md determinism rules)
T0 = "2024-01-10 00:00:00"
T1 = "2024-01-20 00:00:00"


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# --- A1 global stats -------------------------------------------------------

def q_global_stats(spark, sf_dir):
    return A.global_stats(_events(spark, sf_dir))


SQL_GLOBAL_STATS = """
SELECT count(*) AS total_events,
       count(DISTINCT user_id) AS unique_user_id,
       count(DISTINCT event_type) AS unique_event_type
FROM events
"""

# --- A2+A3 distribution with in-engine percentage --------------------------

def q_type_distribution(spark, sf_dir):
    return A.type_distribution(_events(spark, sf_dir))


SQL_TYPE_DISTRIBUTION = """
SELECT event_type,
       count(*) AS event_count,
       round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS percentage
FROM events
GROUP BY event_type
ORDER BY event_count DESC, event_type
"""

# --- P8 categorize + A2 ----------------------------------------------------

def q_category_distribution(spark, sf_dir):
    return A.category_distribution(_events(spark, sf_dir))


SQL_CATEGORY_DISTRIBUTION = f"""
SELECT {categorize_sql_case('event_type', SYNTH_EVENT_CATEGORIES)} AS event_category,
       count(*) AS event_count,
       round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS percentage
FROM events
GROUP BY 1
ORDER BY event_count DESC, event_category
"""

# --- A4 hourly time series --------------------------------------------------

def q_hourly_series(spark, sf_dir):
    return A.hourly_series(_events(spark, sf_dir))


SQL_HOURLY_SERIES = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       count(*) AS event_count
FROM events
GROUP BY 1
ORDER BY hour
"""

# --- A5/A6/A7 top-k entities with sorted set --------------------------------

def q_top_users(spark, sf_dir):
    df = A.top_entities(
        _events(spark, sf_dir), ["user_id"], distinct_col="event_type",
        list_col="event_type", k=10,
    )
    # string-join the sorted set: arrays hash differently across engines
    return df.select(
        "user_id",
        "event_count",
        "unique_event_type",
        F.array_join("event_types", ",").alias("event_types"),
    )


SQL_TOP_USERS = """
SELECT user_id,
       count(*) AS event_count,
       count(DISTINCT event_type) AS unique_event_type,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
ORDER BY event_count DESC, user_id
LIMIT 10
"""

# --- A9 numeric profile ------------------------------------------------------

def q_numeric_profile(spark, sf_dir):
    return A.numeric_profile(_events(spark, sf_dir))


SQL_NUMERIC_PROFILE = """
SELECT event_type,
       round(avg(value), 2) AS avg_value,
       round(stddev_samp(value), 2) AS stddev_value,
       round(sum(value), 2) AS sum_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value,
       round(quantile_cont(value, 0.5), 2) AS median_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# --- P12/P13 composed filters ------------------------------------------------

def q_filtered_count(spark, sf_dir):
    df = _events(spark, sf_dir)
    df = A.time_range(df, "ts", start=T0, end=T1)
    df = A.apply_filters(df, event_type="purchase")
    return df.agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


SQL_FILTERED_COUNT = f"""
SELECT count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
WHERE ts >= TIMESTAMP '{T0}' AND ts < TIMESTAMP '{T1}' AND event_type = 'purchase'
"""

# --- P14 distinct dimension values -------------------------------------------

def q_distinct_types(spark, sf_dir):
    return A.distinct_values(_events(spark, sf_dir), "event_type")


SQL_DISTINCT_TYPES = """
SELECT DISTINCT event_type FROM events ORDER BY event_type
"""

# --- O2 recent-N --------------------------------------------------------------

def q_recent_events(spark, sf_dir):
    df = A.recent_events(_events(spark, sf_dir), n=200)
    return df.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
    )


SQL_RECENT_EVENTS = """
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, user_id, event_type
FROM events
ORDER BY ts DESC, event_id
LIMIT 200
"""

# --- O3 native offset pagination ----------------------------------------------

def q_pagination(spark, sf_dir):
    df = A.paginate(
        _events(spark, sf_dir),
        [F.desc("ts"), F.col("event_id")],
        page=2,
        page_size=50,
    )
    return df.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
    )


SQL_PAGINATION = """
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
FROM events
ORDER BY ts DESC, event_id
LIMIT 50 OFFSET 100
"""

# --- O3b keyset pagination (seek method — the deep-page scale path) -----------

_KEYSET_TS = "2024-01-25 00:00:00"
_KEYSET_ID = 0


def q_keyset_pagination(spark, sf_dir):
    df = A.paginate_keyset(
        _events(spark, sf_dir),
        ts_col="ts",
        id_col="event_id",
        last_ts=_KEYSET_TS,
        last_id=_KEYSET_ID,
        page_size=50,
    )
    return df.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
    )


SQL_KEYSET_PAGINATION = f"""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
FROM events
WHERE ts < TIMESTAMP '{_KEYSET_TS}'
   OR (ts = TIMESTAMP '{_KEYSET_TS}' AND event_id > {_KEYSET_ID})
ORDER BY ts DESC, event_id
LIMIT 50
"""

# --- P6 JSON scalar extraction (get_json_object on props) ----------------------

def q_json_extract(spark, sf_dir):
    df = _events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    return (
        df.groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_JSON_EXTRACT = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- Batch sessionization (lag + cumsum windows) -----------------------------

def q_sessionize(spark, sf_dir):
    return A.sessionize(_events(spark, sf_dir), gap_minutes=30).orderBy(
        "user_id", "session_id"
    )


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
  FROM marked
)
SELECT user_id, session_id,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       round(epoch(max(ts)) - epoch(min(ts)), 2) AS duration_s
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""

# --- §2.7 scalar-function surface (string/date/math builtins) ------------------

def q_scalar_functions(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.ceil("value")), 2).alias("avg_ceil"),
            F.round(F.avg(F.floor("value")), 2).alias("avg_floor"),
            F.round(F.sum(F.pow("value", F.lit(2))), 2).alias("sum_sq"),
            F.round(F.avg(F.sqrt(F.abs("value"))), 4).alias("avg_sqrt"),
            F.max(F.year("ts")).cast("bigint").alias("max_year"),
            F.countDistinct(F.weekday("ts") + 1).alias("n_isodow"),
        )
        .select(
            "event_type",
            # reference string ops: initcap labels, regexp ref-strip
            # (events.js:58, events.js:203 -> SURVEY §2.7)
            F.initcap("event_type").alias("label"),
            F.regexp_replace(
                F.concat(F.lit("refs/heads/"), F.col("event_type")), "^refs/heads/", ""
            ).alias("branch"),
            F.reverse("event_type").alias("reversed"),
            F.lpad("event_type", 10, "_").alias("padded"),
            "n",
            "avg_ceil",
            "avg_floor",
            "sum_sq",
            "avg_sqrt",
            "max_year",
            "n_isodow",
        )
        .orderBy("event_type")
    )


SQL_SCALAR_FUNCTIONS = """
SELECT event_type,
       upper(substr(event_type, 1, 1)) || substr(event_type, 2) AS label,
       regexp_replace('refs/heads/' || event_type, '^refs/heads/', '') AS branch,
       reverse(event_type) AS reversed,
       lpad(event_type, 10, '_') AS padded,
       count(*) AS n,
       round(avg(ceil(value)::DOUBLE), 2) AS avg_ceil,
       round(avg(floor(value)::DOUBLE), 2) AS avg_floor,
       round(sum(pow(value, 2)), 2) AS sum_sq,
       round(avg(sqrt(abs(value))), 4) AS avg_sqrt,
       max(year(ts)) AS max_year,
       count(DISTINCT isodow(ts)) AS n_isodow
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# --- [EXT] Ordered funnel (view -> click -> purchase) ---------------------------

def q_funnel(spark, sf_dir):
    """Sequential conversion funnel: users who viewed, then clicked after
    their first view, then purchased after that click. One shuffle on
    user_id; see operators.analytics.funnel_counts."""
    return A.funnel_counts(_events(spark, sf_dir), ["view", "click", "purchase"])


SQL_FUNNEL = """
WITH t1 AS (
  SELECT user_id, event_type, ts,
         min(ts) FILTER (WHERE event_type = 'view') OVER (PARTITION BY user_id) AS v_t
  FROM events
), t2 AS (
  SELECT *, min(ts) FILTER (WHERE event_type = 'click' AND ts > v_t)
              OVER (PARTITION BY user_id) AS c_t
  FROM t1
), t3 AS (
  SELECT *, min(ts) FILTER (WHERE event_type = 'purchase' AND ts > c_t)
              OVER (PARTITION BY user_id) AS p_t
  FROM t2
), per_user AS (
  SELECT user_id, max(v_t) AS v_t, max(c_t) AS c_t, max(p_t) AS p_t
  FROM t3 GROUP BY user_id
), c AS (
  SELECT count(v_t) AS n0, count(c_t) AS n1, count(p_t) AS n2 FROM per_user
)
SELECT step_idx, step, n_users, round(n_users / greatest(n0, 1)::DOUBLE, 4) AS conversion
FROM c, LATERAL (VALUES (1::INT, 'view', n0), (2::INT, 'click', n1), (3::INT, 'purchase', n2))
         AS s(step_idx, step, n_users)
ORDER BY step_idx
"""

# --- [EXT] Column-level profiling --------------------------------------------------

def q_profile(spark, sf_dir):
    """One-scan data profile of the events fact (null/distinct/min-max per
    column) — see operators.analytics.profile_table."""
    return A.profile_table(
        _events(spark, sf_dir), ["event_id", "user_id", "event_type", "value"]
    )


def _sql_profile_col(c, dtype, numeric):
    mn = f"min({c})::DOUBLE" if numeric else "NULL::DOUBLE"
    mx = f"max({c})::DOUBLE" if numeric else "NULL::DOUBLE"
    return f"""
  SELECT '{c}' AS column_name, '{dtype}' AS dtype,
         count(*)::BIGINT AS n_rows,
         (count(*) - count({c}))::BIGINT AS n_nulls,
         round((count(*) - count({c})) / greatest(count(*), 1)::DOUBLE, 4) AS null_rate,
         count(DISTINCT {c})::BIGINT AS n_distinct,
         {mn} AS min_num, {mx} AS max_num
  FROM events"""


SQL_PROFILE = (
    _sql_profile_col("event_id", "long", True)
    + "\nUNION ALL\n"
    + _sql_profile_col("user_id", "long", True)
    + "\nUNION ALL\n"
    + _sql_profile_col("event_type", "string", False)
    + "\nUNION ALL\n"
    + _sql_profile_col("value", "double", True)
    + "\nORDER BY column_name"
)

# --- [EXT] Cascaded time rollup ----------------------------------------------------

def q_time_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: hour buckets aggregate the
    minute partials, days aggregate hours — one raw scan, reused via
    ReuseExchange across the union branches (pinned in test_plans)."""
    return A.time_rollup(_events(spark, sf_dir))


def _sql_rollup_level(res):
    return f"""
  SELECT '{res}' AS resolution,
         strftime(date_trunc('{res}', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         count(*)::BIGINT AS n,
         round(sum(value), 2) AS sum_value
  FROM events GROUP BY 2"""


SQL_TIME_ROLLUP = (
    _sql_rollup_level("minute")
    + "\nUNION ALL\n"
    + _sql_rollup_level("hour")
    + "\nUNION ALL\n"
    + _sql_rollup_level("day")
    + "\nORDER BY resolution, bucket"
)

# --- [EXT] Weekly cohort retention --------------------------------------------------

def q_cohort_retention(spark, sf_dir):
    """Users cohorted by first-event week; per (cohort, weeks_since) active
    counts and retention share — see operators.analytics.cohort_retention."""
    return A.cohort_retention(_events(spark, sf_dir))


SQL_COHORT_RETENTION = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
), cohort_sizes AS (
  SELECT cohort_week, count(*)::BIGINT AS cohort_size FROM firsts GROUP BY 1
), counts AS (
  SELECT f.cohort_week,
         (date_diff('day', f.cohort_week, a.week) // 7)::INT AS weeks_since,
         count(DISTINCT a.user_id)::BIGINT AS active_users
  FROM active a JOIN firsts f USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       c.weeks_since, c.active_users,
       round(c.active_users / s.cohort_size::DOUBLE, 4) AS retention
FROM counts c JOIN cohort_sizes s USING (cohort_week)
ORDER BY cohort_week, weeks_since
"""

# --- [EXT] Shuffle-skew diagnostic --------------------------------------------------

def q_key_skew(spark, sf_dir):
    """Heaviest join/agg keys on the lineitem fact (orderkey) with share and
    skew ratio — the pre-flight check for salting decisions."""
    from demo_bigdata_spark.sources.catalog import load_table as _lt

    return A.key_skew_report(_lt(spark, sf_dir, "lineitem"), "l_orderkey", top=10)


SQL_KEY_SKEW = """
WITH counts AS (
  SELECT l_orderkey AS key, count(*)::BIGINT AS n FROM lineitem GROUP BY 1
), totals AS (
  SELECT sum(n) AS total, count(*) AS nkeys FROM counts
)
SELECT key::VARCHAR AS key, n,
       round(n / total::DOUBLE, 4) AS share,
       round(n * nkeys / total::DOUBLE, 2) AS skew_ratio
FROM counts, totals
ORDER BY n DESC, key
LIMIT 10
"""

# --- A1/A9 approx sketch variants (oracle-checked via in-engine error bounds) ----
#
# r3 VERDICT #1: approximation sketches cannot hash-match a DuckDB twin on
# their raw estimates (different HLL/GK implementations), so these queries
# emit the EXACT aggregates plus booleans asserting, in-engine, that each
# sketch landed inside its documented error envelope. The twin computes the
# exact side and literal-true bounds — deterministic, hash-matchable, and a
# sketch drifting out of bound flips a boolean and fails the differential,
# which asserts strictly more than the old rows-only rows did.

def q_approx_stats(spark, sf_dir):
    """HLL global stats with the accuracy contract verified in-engine
    (operator: analytics.global_stats_approx_verified; rsd=0.02, bound 5%)."""
    return A.global_stats_approx_verified(_events(spark, sf_dir))


SQL_APPROX_STATS = """
SELECT count(*)::BIGINT AS total_events,
       count(DISTINCT user_id)::BIGINT AS unique_user_id,
       count(DISTINCT event_type)::BIGINT AS unique_event_type,
       TRUE AS hll_within_bound_user_id,
       TRUE AS hll_within_bound_event_type
FROM events
"""


def q_sketched_uniques(spark, sf_dir):
    """Mergeable-HLL daily uniques + a reaggregated total from the SAME
    per-day sketches (hll_union_agg) — the persist-sketches/merge-on-read
    layout that replaces exact countDistinct rescans at 100 TB. Exact
    per-day counts ride along, and each row carries an in-engine boolean
    asserting the Datasketches estimate (lgK=12, rsd≈1.6%) is within a 5%
    (~3σ) envelope of the exact count — including the merged-total row, so
    the union-merge path itself is under test. test_hll_sketch_accuracy
    additionally pins the relative error distribution."""
    from demo_bigdata_spark.operators import sketches as K

    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    daily = K.distinct_sketches(ev, "user_id", ["day"]).join(
        ev.groupBy("day").agg(F.countDistinct("user_id").alias("exact_uniques")),
        "day",
    )
    bound = lambda: (  # noqa: E731 — same check on per-day and merged rows
        F.abs(F.col("est_uniques") - F.col("exact_uniques"))
        <= 0.05 * F.col("exact_uniques")
    ).alias("hll_within_bound")
    per_day = K.estimate_distinct(daily).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "exact_uniques", bound()
    )
    # 1x1 join: merged-sketch estimate vs the exact global countDistinct
    total_exact = ev.agg(F.countDistinct("user_id").alias("exact_uniques"))
    total = (
        K.estimate_distinct(K.merge_sketches(daily))
        .crossJoin(F.broadcast(total_exact))
        .select(F.lit("ALL").alias("day"), "exact_uniques", bound())
    )
    return per_day.unionByName(total).orderBy("day")


SQL_SKETCHED_UNIQUES = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       count(DISTINCT user_id)::BIGINT AS exact_uniques,
       TRUE AS hll_within_bound
FROM events GROUP BY 1
UNION ALL
SELECT 'ALL', count(DISTINCT user_id)::BIGINT, TRUE FROM events
ORDER BY day
"""


def q_approx_quantiles(spark, sf_dir):
    """GK-sketch quantiles with the rank-error contract verified in-engine
    (operator: analytics.numeric_profile_approx_verified; accuracy=10000,
    eps=1e-3 — a 10x margin on the 1/accuracy guarantee)."""
    return A.numeric_profile_approx_verified(_events(spark, sf_dir))


SQL_APPROX_QUANTILES = """
SELECT event_type,
       round(avg(value), 2) AS avg_value,
       round(quantile_cont(value, 0.5), 2) AS median_value,
       TRUE AS p50_within_eps,
       TRUE AS p99_within_eps
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_resampled_hourly(spark, sf_dir):
    """Gap-filled hourly resample of a sparse event subset (value >= 99):
    dense time axis via sequence/explode per series, zero-filled left join
    (operator: analytics.resample_time_series). The reference's hourly
    series silently skips empty hours; this emits them with n=0."""
    ev = _events(spark, sf_dir).filter(F.col("value") >= 99.0)
    out = A.resample_time_series(ev, "ts", "1 hour", group_col="event_type")
    return out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n",
        "sum_value",
    ).orderBy("event_type", "bucket")


SQL_RESAMPLED_HOURLY = """
WITH sparse AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         count(*) AS n, round(sum(value), 2) AS sum_value
  FROM events WHERE value >= 99.0
  GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM sparse GROUP BY 1
),
axis AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans
)
SELECT a.event_type,
       strftime(a.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       coalesce(s.n, 0) AS n,
       coalesce(s.sum_value, 0.0) AS sum_value
FROM axis a LEFT JOIN sparse s ON a.event_type = s.event_type AND a.bucket = s.bucket
ORDER BY a.event_type, bucket
"""


def q_value_histogram(spark, sf_dir):
    """Fixed-width 20-bin histogram over [0, 500) with empty bins emitted
    (operator: analytics.value_histogram; bounds passed as literals — the
    scale path needs no min/max pre-pass). The oracle replays Spark's
    width_bucket arithmetic (floor((v-lo)/(hi-lo)*n)+1, clamped) so bin-edge
    float behavior is identical on both sides."""
    return A.value_histogram(_events(spark, sf_dir), "value", n_bins=20, lo=0.0, hi=500.0)


SQL_VALUE_HISTOGRAM = """
WITH counts AS (
  SELECT least(greatest(floor((value - 0.0) / (500.0 - 0.0) * 20)::BIGINT + 1, 1), 20) AS bin,
         count(*) AS n
  FROM events GROUP BY 1
)
SELECT a.bin,
       round(0.0 + (a.bin - 1) * 25.0, 6) AS bin_lo,
       round(0.0 + a.bin * 25.0, 6) AS bin_hi,
       coalesce(c.n, 0) AS n
FROM (SELECT unnest(generate_series(1, 20)) AS bin) a
LEFT JOIN counts c ON a.bin = c.bin
ORDER BY a.bin
"""


def q_array_functions(spark, sf_dir):
    """Array/map higher-order-function surface over per-user value arrays:
    collect_list -> sort_array (deterministic), size/array_max/array_min,
    aggregate-fold sum, filter-count, element_at, slice, plus a
    map_from_arrays round-trip (element_at on the map, sorted map_keys
    joined to a string). Both engines fold the SAME sorted array left to
    right, so float sums agree."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.round("value", 2))).alias("vals")
    )
    m = F.map_from_arrays(
        F.array(F.lit("n"), F.lit("n_big")),
        F.array(F.size("vals"), F.size(F.filter("vals", lambda x: x > 100.0))),
    )
    return (
        per_user.withColumn("m", m)
        .select(
            "user_id",
            F.size("vals").cast("bigint").alias("n"),
            F.round(F.element_at("vals", 1), 2).alias("smallest"),
            F.round(F.array_max("vals"), 2).alias("largest"),
            F.round(
                F.aggregate("vals", F.lit(0.0), lambda acc, x: acc + x), 2
            ).alias("total"),
            F.size(F.filter("vals", lambda x: x > 100.0)).cast("bigint").alias("n_big"),
            F.round(
                F.aggregate(F.slice("vals", 1, 3), F.lit(0.0), lambda acc, x: acc + x), 2
            ).alias("bottom3_sum"),
            F.element_at("m", "n").cast("bigint").alias("map_n"),
            F.array_join(F.sort_array(F.map_keys("m")), ",").alias("map_keys"),
        )
        .orderBy("user_id")
    )


SQL_ARRAY_FUNCTIONS = """
WITH per_user AS (
  SELECT user_id, list_sort(list(round(value, 2))) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id,
       len(vals) AS n,
       round(vals[1], 2) AS smallest,
       round(list_max(vals), 2) AS largest,
       round(list_sum(vals), 2) AS total,
       len(list_filter(vals, x -> x > 100.0)) AS n_big,
       round(list_sum(vals[1:3]), 2) AS bottom3_sum,
       len(vals) AS map_n,
       'n,n_big' AS map_keys
FROM per_user
ORDER BY user_id
"""


def q_geometric_mean(spark, sf_dir):
    """Vectorized pandas GROUPED_AGG UDAF (functions/udafs.py) next to its
    built-in rewrite — the oracle checks the UDF against DuckDB's
    exp(avg(ln)) and the query itself emits both forms, pinning them equal
    in-engine too."""
    from demo_bigdata_spark.functions.udafs import geometric_mean

    ev = _events(spark, sf_dir)
    # GROUPED_AGG pandas UDFs cannot share an agg() with non-pandas
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — two aggregates, one join
    udaf = ev.groupBy("event_type").agg(
        F.round(geometric_mean("value"), 4).alias("gmean_udaf")
    )
    # positive-values contract made EXPLICIT in all three forms: the UDAF
    # filters v > 0, Spark's log() happens to NULL non-positives, but
    # DuckDB's ln() THROWS on zero — surfaced by the sf0.1 twin replay
    # (testdata has value = 0.0 rows only at that scale)
    pos = F.when(F.col("value") > 0, F.col("value"))
    builtin = ev.groupBy("event_type").agg(
        F.round(F.exp(F.avg(F.log(pos))), 4).alias("gmean_builtin")
    )
    return udaf.join(builtin, "event_type").orderBy("event_type")


SQL_GEOMETRIC_MEAN = """
SELECT event_type,
       round(exp(avg(CASE WHEN value > 0 THEN ln(value) END)), 4) AS gmean_udaf,
       round(exp(avg(CASE WHEN value > 0 THEN ln(value) END)), 4) AS gmean_builtin
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "global_stats": (q_global_stats, SQL_GLOBAL_STATS),
    "resampled_hourly": (q_resampled_hourly, SQL_RESAMPLED_HOURLY),
    "value_histogram": (q_value_histogram, SQL_VALUE_HISTOGRAM),
    "array_functions": (q_array_functions, SQL_ARRAY_FUNCTIONS),
    "geometric_mean": (q_geometric_mean, SQL_GEOMETRIC_MEAN),
    "type_distribution": (q_type_distribution, SQL_TYPE_DISTRIBUTION),
    "category_distribution": (q_category_distribution, SQL_CATEGORY_DISTRIBUTION),
    "hourly_series": (q_hourly_series, SQL_HOURLY_SERIES),
    "top_users": (q_top_users, SQL_TOP_USERS),
    "numeric_profile": (q_numeric_profile, SQL_NUMERIC_PROFILE),
    "filtered_count": (q_filtered_count, SQL_FILTERED_COUNT),
    "distinct_types": (q_distinct_types, SQL_DISTINCT_TYPES),
    "recent_events": (q_recent_events, SQL_RECENT_EVENTS),
    "pagination": (q_pagination, SQL_PAGINATION),
    "keyset_pagination": (q_keyset_pagination, SQL_KEYSET_PAGINATION),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "funnel": (q_funnel, SQL_FUNNEL),
    "profile": (q_profile, SQL_PROFILE),
    "time_rollup": (q_time_rollup, SQL_TIME_ROLLUP),
    "key_skew": (q_key_skew, SQL_KEY_SKEW),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "scalar_functions": (q_scalar_functions, SQL_SCALAR_FUNCTIONS),
    "approx_stats": (q_approx_stats, SQL_APPROX_STATS),
    "approx_quantiles": (q_approx_quantiles, SQL_APPROX_QUANTILES),
    "sketched_uniques": (q_sketched_uniques, SQL_SKETCHED_UNIQUES),
}
