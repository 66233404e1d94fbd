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
