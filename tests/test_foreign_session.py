"""The engine must work on a SparkSession it did not build (the verification
driver constructs its own): load_table defensively applies the runtime-
settable confs (nanos parquet reading, UTC timezone)."""

from __future__ import annotations

from demo_bigdata_spark.sources.catalog import load_table
from demo_bigdata_spark.suites.suite_analytics import q_hourly_series


def test_engine_works_on_foreign_session(spark, sf_dir):
    # simulate a foreign session: clear the critical confs, then run a query
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = q_hourly_series(spark, sf_dir)
        rows = df.collect()
        assert len(rows) > 0
        # UTC formatting restored: first bucket of the seeded data is Jan 1 2024
        assert rows[0]["hour"].startswith("2024-01-01")
        assert load_table(spark, sf_dir, "events").count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_foreign_session_clears_ntz_inference(spark, sf_dir):
    """A foreign session with NTZ inference enabled must still get an
    LTZ (watermark-compatible) ts column through load_table."""
    from pyspark.sql.types import TimestampType

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        ev = load_table(spark, sf_dir, "events")
        assert isinstance(ev.schema["ts"].dataType, TimestampType)
        ev.withWatermark("ts", "10 minutes")  # raises on NTZ
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_keyset_cursor_boundary_under_foreign_timezone(spark, sf_dir):
    """The keyset cursor literal is cast to the ts column's OWN type, so a
    non-UTC session timezone must not shift the page boundary: walking two
    pages under America/New_York yields the same rows as under UTC."""
    from demo_bigdata_spark.operators.analytics import paginate_keyset

    def two_pages():
        ev = load_table(spark, sf_dir, "events")
        p1 = paginate_keyset(ev, "ts", "event_id", None, None, 25).collect()
        last = p1[-1]
        cursor_ts = str(last["ts"])  # ISO string, engine-formatted
        p2 = paginate_keyset(
            ev, "ts", "event_id", cursor_ts, last["event_id"], 25
        ).collect()
        return [(r["event_id"],) for r in p1 + p2]

    utc_pages = two_pages()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        foreign_pages = two_pages()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert foreign_pages == utc_pages
    assert len(set(utc_pages)) == 50  # no dup/dropped boundary rows
