"""Iceberg is config-gated: absent runtime must fail loudly and early, never
mid-pipeline; with jars present the same DDL applies (skipped here)."""

from __future__ import annotations

import pytest

from demo_bigdata_spark.sources.iceberg import (
    create_events_table_iceberg,
    iceberg_available,
    iceberg_conf,
)


def test_conf_shape():
    conf = iceberg_conf(catalog="c1", warehouse="/tmp/w")
    assert conf["spark.sql.catalog.c1.type"] == "hadoop"
    assert conf["spark.sql.catalog.c1.warehouse"] == "/tmp/w"


def test_gated_error_without_runtime(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; gating path not applicable")
    with pytest.raises(RuntimeError, match="Iceberg runtime not on classpath"):
        create_events_table_iceberg(spark, "local.db.events")


def _ddl_columns(src: str) -> list[tuple[str, str]]:
    """Parse `name TYPE` pairs out of the CREATE TABLE column block embedded
    in a function's source."""
    import re

    start = src.index("(", src.index("CREATE TABLE")) + 1
    end = src.index("USING", start)
    block = src[start : src.rindex(")", start, end)]
    cols = []
    for frag in block.split(","):
        m = re.match(r"\s*(\w+)\s+(\w+)\s*$", frag)
        if m:
            cols.append((m.group(1), m.group(2).upper()))
    return cols


def test_parquet_fallback_ddl_matches_iceberg_ddl(spark, tmp_path):
    """Environment has no network (jar fetch impossible — verified via
    maven-central probe), so parity is pinned at the plan level instead: the
    parquet fallback DDL must declare the IDENTICAL 26-column schema and
    partition spec as the Iceberg DDL (both derived from the reference's
    services/streaming-service/api.py:205-241), and the materialized catalog
    table must expose exactly those partition columns."""
    import inspect

    from demo_bigdata_spark.schemas import FLATTENED_EVENT_COLUMNS
    from demo_bigdata_spark.sources import formats, iceberg

    ice_src = inspect.getsource(iceberg.create_events_table_iceberg)
    pq_src = inspect.getsource(formats.create_partitioned_events_table)
    ice_cols = _ddl_columns(ice_src)
    pq_cols = _ddl_columns(pq_src)
    assert ice_cols == pq_cols, "parquet fallback DDL drifted from Iceberg DDL"
    assert [c for c, _ in ice_cols] == FLATTENED_EVENT_COLUMNS  # all 26, in order
    for src in (ice_src, pq_src):
        assert "PARTITIONED BY (processing_date, processing_hour)" in src
    # reference TBLPROPERTIES survive on the Iceberg side (api.py:234-241)
    assert "'write.target-file-size-bytes'='134217728'" in ice_src
    assert "'write.delete.mode'='merge-on-read'" in ice_src

    # the executable fallback: real catalog table, same partition columns
    formats.create_database(spark, "parity_db")
    formats.create_partitioned_events_table(
        spark, "parity_db.events", location=str(tmp_path / "events")
    )
    try:
        desc = spark.sql("DESCRIBE TABLE parity_db.events").collect()
        names = [r["col_name"] for r in desc]
        part_idx = names.index("# Partition Information")
        data_cols = [n for n in names[:part_idx] if n and not n.startswith("#")]
        # DESCRIBE reorders partition columns to the end; membership is the
        # contract (declared order is pinned by the DDL assert above)
        assert sorted(data_cols) == sorted(FLATTENED_EVENT_COLUMNS)
        part_cols = [
            n for n in names[part_idx:] if n and not n.startswith("#") and n != "col_name"
        ]
        assert part_cols == ["processing_date", "processing_hour"]
    finally:
        spark.sql("DROP TABLE IF EXISTS parity_db.events")
        spark.sql("DROP DATABASE IF EXISTS parity_db")
