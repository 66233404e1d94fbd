"""Query suites: named (spark_fn, oracle_sql) pairs per tier.

Each suite module exposes ``QUERIES: dict[str, tuple[fn, sql | None]]`` where
``fn(spark, sf_dir) -> DataFrame`` and ``sql`` is the DuckDB-executable ANSI
twin (None => driver records a weaker rows-only check). Column names/aliases
MUST match between the two sides; floats are rounded identically; timestamps
are emitted as formatted strings (Spark session TZ is UTC, DuckDB is
TZ-naive — strings sidestep the mismatch).
"""

from __future__ import annotations

from demo_bigdata_spark.suites import (
    suite_analytics,
    suite_ingest,
    suite_llm,
    suite_relational,
    suite_streaming,
)

_ALL_SUITES = (
    suite_analytics,
    suite_ingest,
    suite_relational,
    suite_llm,
    suite_streaming,
)


def all_queries():
    out = {}
    for mod in _ALL_SUITES:
        for name, (fn, _sql) in mod.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = fn
    return out


def all_oracles():
    out = {}
    for mod in _ALL_SUITES:
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
