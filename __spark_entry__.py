"""Driver contract for the spark-graft builder (PySpark target).

Thin glue over ``demo_bigdata_spark.suites`` — each suite module declares
named (spark_fn, duckdb_oracle_sql) pairs per operator tier (SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_bigdata_spark.suites import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Scan -> categorize (CASE) -> aggregate -> broadcast pct-of-total -> sort:
    the reference's dashboard distribution (SURVEY.md §3.2) in one plan.
    """
    from demo_bigdata_spark.suites.suite_analytics import q_category_distribution

    return q_category_distribution(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-executable ANSI twins for every oracle-comparable query."""
    return all_oracles()
