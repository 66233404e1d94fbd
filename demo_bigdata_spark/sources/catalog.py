"""Table catalog: load/register the synthetic parquet tables, partitioned writes.

Covers the reference's source/sink surface minus Kafka/Iceberg specifics
(S3/S4 batch scans: services/streaming-service/api.py:259,
services/api-service/data_service.py:120-125; S6 partitioned table DDL:
services/streaming-service/api.py:205-241). Iceberg is replaced by plain
partitioned parquet in the test tier — the partition-column *strategy* is the
part that matters at scale, and we fix the reference's known flaw of
partitioning on processing time while filtering on event time
(BASELINE.md: partition pruning never engaged). Here partition columns derive
from event time so pruning fires.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_bigdata_spark.schemas import ALL_TABLES


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (spark.sql.legacy.parquet.nanosAsLong) and we truncate ns -> µs here,
# exactly as DuckDB does when reading the same files.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan with pushdown — the default entry for every query.

    For nanos-timestamp columns the derived timestamp REPLACES the raw long,
    but the raw column survives as ``_<col>_ns``: range predicates on a
    derived expression cannot reach the parquet scan, so
    operators.analytics.time_range filters on the raw attribute with
    ns-converted literals instead (exact — cutoffs are whole microseconds),
    keeping row-group min/max pruning alive."""
    from demo_bigdata_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # works on sessions the engine didn't build
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in _NANOS_TS_COLUMNS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # timestamp_micros yields TIMESTAMP_NTZ in this Spark build; cast
            # to TIMESTAMP (LTZ) — identity under the UTC session TZ — because
            # event-time watermarks require LTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
            # otherwise) and every downstream op then sees one timestamp type.
            df = df.withColumn(f"_{c}_ns", F.col(c)).withColumn(
                c, F.timestamp_micros(F.expr(f"{c} div 1000")).cast("timestamp")
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=ALL_TABLES) -> None:
    """Register each parquet table as a temp view (for the SQL API tier)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
    target_file_mb: int = 128,
) -> None:
    """Event-time partitioned parquet sink.

    Mirrors the reference's partitioned-table intent (PARTITIONED BY
    (processing_date, processing_hour), 128 MB target files — reference:
    services/streaming-service/api.py:234-238) but derives the partition
    columns from *event time* so time-range predicates prune partitions.

    At 100 TB: date/hour partitioning bounds every incremental query to the
    partitions it touches; 128 MB files keep scan tasks balanced. We sort
    within partitions by the timestamp for better parquet min/max pruning.
    """
    (
        df.withColumn("event_date", F.date_format(ts_col, "yyyy-MM-dd"))
        .withColumn("event_hour", F.hour(ts_col))
        .sortWithinPartitions(ts_col)
        .write.mode(mode)
        .option("parquet.block.size", target_file_mb * 1024 * 1024)
        .partitionBy("event_date", "event_hour")
        .parquet(path)
    )


def describe_table(spark: SparkSession, view_name: str) -> DataFrame:
    """Introspection (reference S7: services/streaming-service/api.py:462-466)."""
    return spark.sql(f"DESCRIBE TABLE {view_name}")
