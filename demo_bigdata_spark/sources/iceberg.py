"""Iceberg integration — config-gated (jars absent in the test tier).

The reference sinks to Iceberg with a local-FS warehouse (reference:
services/streaming-service/spark_config.py:33-36,50-53: runtime jar
`iceberg-spark-runtime-3.4_2.12:1.4.2`, SparkCatalog type=hadoop). This module
reproduces that wiring behind an availability check; every consumer falls
back to plain partitioned parquet (sources/catalog.py) with the identical
partition strategy, so correctness never depends on the jars. What Iceberg
adds operationally — ACID append from streaming, snapshot isolation for the
batch readers, compaction targets — is configuration, not query semantics.

The TRANSACTIONAL semantics themselves (atomic snapshot commits, time
travel, merge-on-read deletes, rollback, expire+vacuum, a per-micro-batch
streaming snapshot sink) are implemented jar-free in sources/snapshots.py —
a user without the runtime keeps the behavior contract and swaps only the
storage format when jars land.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def iceberg_conf(catalog: str = "local", warehouse: str = "/tmp/iceberg-warehouse") -> dict[str, str]:
    """The reference's catalog wiring (spark_config.py:50-53), current GA
    coordinates. Pass to session.get_spark(extra_conf=...) together with
    spark.jars.packages when the environment has network/jars."""
    return {
        "spark.jars.packages": ICEBERG_PACKAGE,
        "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True if the Iceberg runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_events_table_iceberg(spark: SparkSession, table: str) -> None:
    """S6 with the reference's Iceberg TBLPROPERTIES (api.py:234-241):
    128 MB target files, merge-on-read deletes. Raises a clear error when
    the runtime is absent."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on classpath; use "
            "sources.formats.create_partitioned_events_table (parquet) or start "
            "the session with iceberg_conf()"
        )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
          event_id STRING, event_type STRING, event_category STRING,
          created_at TIMESTAMP, processed_at TIMESTAMP,
          actor_id INT, actor_login STRING, actor_avatar_url STRING,
          repo_id INT, repo_name STRING, repo_url STRING,
          org_id INT, org_login STRING, is_public BOOLEAN,
          action STRING, ref STRING, ref_type STRING, master_branch STRING,
          description STRING, pusher_type STRING, payload_json STRING,
          processing_date STRING, processing_hour INT,
          has_actor BOOLEAN, has_repo BOOLEAN, has_org BOOLEAN
        )
        USING iceberg
        PARTITIONED BY (processing_date, processing_hour)
        TBLPROPERTIES (
          'write.target-file-size-bytes'='134217728',
          'write.delete.mode'='merge-on-read'
        )
        """
    )
