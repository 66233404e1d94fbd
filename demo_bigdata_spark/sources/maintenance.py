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
  detected from the source directory layout (``key=value`` path
  segments) and the rewrite re-applies ``partitionBy`` on them, so
  partition pruning and dynamic-partition-overwrite keep working after
  the caller swaps paths.

This module is the canonical compactor; ``formats.compact_parquet_inplace``
is the separate in-place, row-count-targeted variant kept for
read-path-owned tables where a beside-write is impossible.
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


def _partition_cols(spark: SparkSession, path: str) -> list[str]:
    """Partition columns of a parquet table, in directory-nesting order,
    detected from ``key=value`` segments of its file paths relative to the
    table root. Metadata-only (inputFiles), no data read. Both sides are
    normalized to absolute local paths before prefix-stripping (inputFiles
    returns absolute file: URIs even for a relative table path); a file
    that still doesn't sit under the root is SKIPPED rather than parsed —
    an ancestor directory containing '=' must never masquerade as a
    partition column."""
    root = os.path.abspath(_local_path(path)).rstrip("/")
    cols: list[str] = []
    for f in spark.read.parquet(path).inputFiles():
        rel = os.path.abspath(_local_path(f))
        if not rel.startswith(root + "/"):
            continue
        rel = rel[len(root) + 1 :]
        segs = [s.split("=", 1)[0] for s in rel.split("/")[:-1] if "=" in s]
        if len(segs) > len(cols):
            cols = segs
    return cols


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``src`` into ``dst`` with ~``target_file_bytes`` files:
    file count = ceil(total_bytes / target). For an unpartitioned table
    this is pure coalesce — a task-merge, no shuffle. For a partitioned
    table (``key=value`` directories detected in the source layout) the
    rewrite re-applies ``partitionBy`` on the detected columns, with a
    repartition on them so each output partition directory gets merged
    files rather than one file per input task. Returns {before, after}
    file counts plus the detected partition columns. Row content is
    preserved (pinned by tests); the caller swaps dst into place once
    the write has committed."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(src)
    before = small_file_report(spark, src)
    n_files = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    parts = _partition_cols(spark, src)
    if parts:
        # shuffle keyed by the partition columns PLUS a content-addressed
        # salt sized so each partition directory honors target_file_bytes:
        # a bare repartition(*parts) would put an entire partition value in
        # ONE task and write one arbitrarily large file (single-threaded,
        # straggler/OOM risk on skewed partitions)
        n_dirs = max(1, df.select(*parts).distinct().count())
        per_dir = max(1, math.ceil(n_files / n_dirs))
        salt = F.pmod(
            F.abs(F.xxhash64(*[F.col(c) for c in df.columns])), F.lit(per_dir)
        )
        (
            df.repartition(*[F.col(c) for c in parts], salt)
            .write.mode("overwrite")
            .partitionBy(*parts)
            .parquet(dst)
        )
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(dst)
    after = small_file_report(spark, dst)
    return {
        "before": before,
        "after": after,
        "target_files": n_files,
        "partition_cols": parts,
    }


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
