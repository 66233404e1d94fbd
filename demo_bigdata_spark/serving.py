"""Serving layer: the reference's dashboard/API result assembly, unified.

The reference computes dashboard stats in three divergent places (streaming
api inline, api-service Spark path, api-service pure-Python cache path —
reference: services/streaming-service/api.py:483-561,
services/api-service/data_service.py:116-150 and 82-91). Here there is ONE
library implementation returning DataFrames; serialization (S11: JSON/SSE,
reference app.py:190-218) is a thin conversion at the edge.

Driver-side `.collect()` happens only on bounded results (top-k, single-row
totals, one page) — the same contract the reference relied on, but safe at
any input scale because every collected set has a LIMIT."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_bigdata_spark.operators import analytics as A


def dashboard_stats(
    events: DataFrame,
    *,
    start=None,
    end=None,
    ts_col: str = "ts",
    group_col: str = "event_type",
    entity_col: str = "user_id",
    k: int = 10,
) -> dict[str, DataFrame]:
    """The six-result-set dashboard fan-out (§3.2) as lazy DataFrames.

    The time filter is applied once and shared; Spark reuses the pruned scan
    per job. Callers materialize whichever panels they need."""
    scoped = A.time_range(events, ts_col, start=start, end=end)
    return {
        "totals": A.global_stats(scoped, distinct_cols=(entity_col, group_col)),
        "type_distribution": A.type_distribution(scoped, group_col),
        "category_distribution": A.category_distribution(scoped, group_col),
        "hourly_series": A.hourly_series(scoped, ts_col),
        "top_entities": A.top_entities(
            scoped, [entity_col], distinct_col=group_col, list_col=group_col, k=k
        ),
        "recent": A.recent_events(scoped, ts_col, n=200),
    }


def list_events(
    events: DataFrame,
    *,
    page: int = 0,
    page_size: int = 100,
    ts_col: str = "ts",
    id_col: str = "event_id",
    **filters,
) -> tuple[DataFrame, DataFrame]:
    """Filter + paginate (§3.3 unified: one Spark implementation instead of
    the reference's Spark/Python duplicate). Returns (page, total_count) —
    both lazy."""
    page_size = min(page_size, 1000)  # reference cap (models.py:107-109)
    scoped = A.apply_filters(events, **filters)
    page_df = A.paginate(scoped, [F.desc(ts_col), F.col(id_col)], page, page_size)
    return page_df, scoped.agg(F.count("*").alias("total"))


def to_json_rows(df: DataFrame, limit: int = 1000) -> list[str]:
    """S11 JSON delivery: bounded collect + JVM-side JSON serialization."""
    return [r for r in df.limit(limit).toJSON().collect()]


def health_check(spark, events: DataFrame) -> dict:
    """Reference health surface (data_service.py:193-219): session liveness
    + table reachability via a cheap count."""
    try:
        n = events.count()
        return {"status": "healthy", "spark_active": True, "row_count": n}
    except Exception as e:  # pragma: no cover - defensive
        return {"status": "unhealthy", "spark_active": False, "error": str(e)[:200]}


def stats_stream(compute, poll_seconds: float = 0.5, max_polls: int | None = None):
    """S11 SSE push loop with change detection: call ``compute()`` every
    ``poll_seconds`` and yield its JSON only when it differs from the last
    push (reference: services/api-service/app.py:190-218 — 0.5 s poll,
    push-on-change). ``compute`` returns any JSON-serializable snapshot
    (e.g. collected dashboard_stats); ``max_polls`` bounds the loop for
    tests. The generator shape plugs straight into an SSE framework
    (``yield f"data: {payload}\\n\\n"`` at the HTTP edge)."""
    import json as _json
    import time as _time

    last = None
    polls = 0
    while max_polls is None or polls < max_polls:
        snapshot = _json.dumps(compute(), sort_keys=True, default=str)
        if snapshot != last:
            yield snapshot
            last = snapshot
        polls += 1
        if max_polls is None or polls < max_polls:
            _time.sleep(poll_seconds)
