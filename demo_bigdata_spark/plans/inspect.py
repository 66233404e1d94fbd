"""Physical-plan inspection helpers.

Correctness says what a query returns; these say what it *costs*. Used by
tests/test_plans.py to pin the plan properties that matter at 100 TB:
filters reaching the parquet scan (PushedFilters), dimension joins going
broadcast, no accidental cartesian products, and wide whole-stage-codegen
spans. A plan regression (e.g. a filter stuck above a join, a broadcast
flipping to sort-merge-over-everything) fails tests even though results stay
correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (AQE-resolved where available) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    """Formatted explain — unlike executedPlan().toString(), field lists
    (PushedFilters, ReadSchema) are NOT truncated at 100 chars here."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True if the parquet scan received pushed-down predicates (optionally
    containing ``fragment``, e.g. a column name)."""
    plan = explain_formatted(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body and (fragment is None or fragment in body):
            return True
    return False


def has_partition_filter(df: DataFrame, col: str) -> bool:
    plan = explain_formatted(df)
    return bool(re.search(rf"PartitionFilters: \[[^\]]*{re.escape(col)}", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions — wider/fewer is better, but >0
    means the hot path is compiled, not interpreted.

    With AQE the codegen markers only appear in the FINAL plan, and only on
    the DataFrame's own QueryExecution — so collect() (not a write, which
    wraps a new plan) forces it. Use on small/test data only."""
    df.collect()
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", explain_formatted(df))
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]
