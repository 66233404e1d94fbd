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
