"""Streaming-tier queries, checked via their batch twins.

``F.window`` / ``F.session_window`` evaluate identically on batch DataFrames,
so the driver's DuckDB oracle can check the exact window-assignment semantics;
true streaming execution (micro-batches, watermark, state) is exercised in
tests/test_streaming.py with a file source."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_bigdata_spark.sources.catalog import load_table
from demo_bigdata_spark.streaming.pipeline import session_windows, windowed_counts


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# --- Tumbling window (streaming twin of analytics A4) -------------------------

def q_tumbling_window(spark, sf_dir):
    return windowed_counts(_events(spark, sf_dir), window="15 minutes").orderBy(
        "window_start", "event_type"
    )


SQL_TUMBLING_WINDOW = """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""

# --- Sliding window -------------------------------------------------------------

def q_sliding_window(spark, sf_dir):
    return windowed_counts(
        _events(spark, sf_dir), window="1 hour", slide="15 minutes"
    ).orderBy("window_start", "event_type")


SQL_SLIDING_WINDOW = """
WITH expanded AS (
  SELECT e.*,
         time_bucket(INTERVAL '15 minutes', e.ts) - (i.i * INTERVAL '15 minutes') AS ws
  FROM events e
  CROSS JOIN (SELECT unnest(range(4)) AS i) i
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM expanded
WHERE ts < ws + INTERVAL '1 hour'
GROUP BY 1, 2
ORDER BY window_start, event_type
"""

# --- Session windows (gap-based) ---------------------------------------------------

def q_session_windows(spark, sf_dir):
    return session_windows(_events(spark, sf_dir), gap="30 minutes").orderBy(
        "user_id", "session_start"
    )


SQL_SESSION_WINDOWS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '30 minutes'
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""

# --- Streaming dedup (batch twin: at-least-once replay collapsed per key) ----------

def q_stream_dedup(spark, sf_dir):
    ev = _events(spark, sf_dir)
    replayed = ev.unionByName(ev)  # simulate at-least-once duplicate delivery
    return (
        replayed.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


SQL_STREAM_DEDUP = """
SELECT event_type, count(DISTINCT event_id) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- Stream-stream interval join (batch twin; true streaming in pytest) ---------

def q_interval_join(spark, sf_dir):
    from demo_bigdata_spark.streaming.pipeline import stream_stream_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = stream_stream_join(purchases, clicks, max_lag="30 minutes")
    return joined.select(
        "event_id",
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss").alias("r_ts_s"),
        F.round("r_value", 2).alias("r_value"),
    ).orderBy("event_id", "r_ts_s")


SQL_INTERVAL_JOIN = """
SELECT p.event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS r_ts_s,
       round(c.value, 2) AS r_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
ORDER BY event_id, r_ts_s
"""


QUERIES = {
    "sliding_window": (q_sliding_window, SQL_SLIDING_WINDOW),
    "session_windows": (q_session_windows, SQL_SESSION_WINDOWS),
    "tumbling_window": (q_tumbling_window, SQL_TUMBLING_WINDOW),
    "stream_dedup": (q_stream_dedup, SQL_STREAM_DEDUP),
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
}
