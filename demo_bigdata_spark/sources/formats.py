"""Source/sink format surface: NDJSON replay, CSV/JSON/ORC read+write, DDL.

Covers SURVEY.md §2.1 beyond parquet: S5/S6 (database + partitioned-table
DDL), S7 (introspection), S8 (the GitHub feeder is replaced by NDJSON fixture
replay), S10 (CSV export of result tables). Kafka (S1/S9) lives in
streaming/pipeline.py behind format options; Iceberg needs jars not present
in the test tier — the DDL here uses plain parquet tables with the same
partition spec (the strategy, not the format, is what matters for pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from demo_bigdata_spark.schemas import GITHUB_EVENT_SCHEMA


def read_ndjson_events(spark: SparkSession, path: str) -> DataFrame:
    """Replay NDJSON fixture files as the raw-event source (S8 stand-in for
    the GitHub REST feeder — reference: services/producer-service/github/
    client.py:33-88). Reads the whole line as a string column so the
    ingest pipeline sees exactly what Kafka would deliver (malformed lines
    included — they're dropped by the P3 filter, not the reader)."""
    return spark.read.text(path).withColumnRenamed("value", "raw_json")


def read_ndjson_typed(spark: SparkSession, path: str) -> DataFrame:
    """Schema-on-read NDJSON with the explicit GitHub event schema (no
    inference — FIXTURES.md determinism rules)."""
    return spark.read.schema(GITHUB_EVENT_SCHEMA).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export (S10 — reference exports top-k tables client-side,
    services/dashboard-service/tables.js:112-154; here it's an engine sink).
    Coalesce is NOT applied: at scale one file per partition is correct;
    single-file export is a driver decision."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV scan with explicit schema (inferSchema is a full extra pass —
    never in production paths)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


# --- DDL / catalog (S5-S7) ---------------------------------------------------


def create_database(spark: SparkSession, name: str) -> None:
    """S5 (reference: services/streaming-service/api.py:197-200)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_partitioned_events_table(
    spark: SparkSession, table: str, location: str | None = None
) -> None:
    """S6: the 26-column fact table DDL, partitioned for event-time pruning
    (reference DDL: services/streaming-service/api.py:205-241, but
    partitioned by event-derived columns — see BASELINE.md on the
    processing-time flaw). Parquet stands in for Iceberg in the test tier."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
          event_id STRING, event_type STRING, event_category STRING,
          created_at TIMESTAMP, processed_at TIMESTAMP,
          actor_id INT, actor_login STRING, actor_avatar_url STRING,
          repo_id INT, repo_name STRING, repo_url STRING,
          org_id INT, org_login STRING,
          is_public BOOLEAN,
          action STRING, ref STRING, ref_type STRING, master_branch STRING,
          description STRING, pusher_type STRING,
          payload_json STRING,
          processing_date STRING, processing_hour INT,
          has_actor BOOLEAN, has_repo BOOLEAN, has_org BOOLEAN
        )
        USING parquet
        PARTITIONED BY (processing_date, processing_hour){loc}
        """
    )


def describe_table(spark: SparkSession, table: str) -> DataFrame:
    """S7 introspection (reference: api.py:462-466)."""
    return spark.sql(f"DESCRIBE TABLE {table}")


def table_count(spark: SparkSession, table: str) -> int:
    return spark.sql(f"SELECT count(*) AS n FROM {table}").head()["n"]


def compact_parquet_inplace(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> dict:
    """[EXT] IN-PLACE small-file compaction (row-count-targeted): rewrite
    a parquet dataset into
    ``ceil(rows / target_rows_per_file)`` files. Streaming append sinks
    (micro-batch x partitions) and over-parallel writes accumulate small
    files that poison scan planning at scale (one task per tiny file,
    metadata-bound listing); periodic compaction is the operational fix —
    table formats automate this (Iceberg rewrite_data_files), raw parquet
    needs it done explicitly. The canonical beside-write, byte-targeted,
    partition-preserving compactor is sources.maintenance.compact_parquet —
    prefer it; this in-place variant exists for read-path-owned tables
    where a path swap is impossible.

    Uses ``localCheckpoint`` to cut lineage before overwriting the path
    being read. Returns {files_before, files_after, rows}.
    """
    import glob as _glob
    import math
    import os as _os

    def _count_files() -> int:
        return len(
            [
                f
                for f in _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
                if _os.path.basename(f).startswith("part-")
            ]
        )

    before = _count_files()
    df = spark.read.parquet(path)
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    compacted = df.repartition(n_files).localCheckpoint(eager=True)
    compacted.write.mode("overwrite").parquet(path)
    return {"files_before": before, "files_after": _count_files(), "rows": rows}


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media ingestion via Spark's binaryFile source: one row per file
    with (path, modificationTime, length, content binary) — the real input
    path for the multimodal tier (operators/multimodal.py expects exactly
    this shape plus an id).

    Scale notes: binaryFile caps per-file size at
    spark.sql.sources.binaryFile.maxLength (2 GB default); splitting does
    not apply (one task reads one file end-to-end), so at 100 TB the
    parallelism unit is the file — shard media into ~100 MB objects and the
    source scales linearly. pathGlobFilter prunes by extension BEFORE read;
    partition-dir layouts (.../date=2024-01-01/...) project partition
    columns as usual."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "event", mode: str = "overwrite") -> None:
    """Spark 4 native XML sink (no external package)."""
    df.write.format("xml").option("rowTag", row_tag).mode(mode).save(path)


def read_xml(spark: SparkSession, path: str, schema, row_tag: str = "event") -> DataFrame:
    """Spark 4 native XML source with an explicit schema (schema-on-write
    philosophy as everywhere else; rowTag picks the record element)."""
    return (
        spark.read.format("xml").option("rowTag", row_tag).schema(schema).load(path)
    )
