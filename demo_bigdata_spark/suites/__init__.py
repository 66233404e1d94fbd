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
    suite_maintenance,
    suite_relational,
    suite_streaming,
)

# Round-11 rotation, requested by the round-10 VERDICT (item 1): 61 of the
# registry's queries had never appeared in any driver CORRECTNESS window
# (the fixed window samples the registry head). Modules whose dicts lead
# with their never-checked queries now come first (streaming's 2, the new
# maintenance module's 3, then suite_llm's 40 + the 2 new r11 url queries),
# so the window finally hash-checks the llm/relational/streaming tails.
# Still a plain module-order concatenation — no per-query priority list,
# and tests/test_suite_order.py keeps pinning all_queries() == the natural
# concatenation of this tuple.
_ALL_SUITES = (
    suite_streaming,
    suite_maintenance,
    suite_llm,
    suite_relational,
    suite_analytics,
    suite_ingest,
)


def _ordered_items():
    """(name, (fn, sql)) pairs in natural suite order (llm, analytics,
    ingest, relational, streaming — the order of ``_ALL_SUITES``). No
    driver-aware reordering: external verification samples whatever window it
    samples, and the local twin (tests/test_oracle_suites.py) runs the
    identical differential over ALL queries regardless."""
    flat = {}
    for mod in _ALL_SUITES:
        for name, pair in mod.QUERIES.items():
            assert name not in flat, f"duplicate query name {name}"
            flat[name] = pair
    yield from flat.items()


def all_queries():
    return {name: fn for name, (fn, _sql) in _ordered_items()}


def all_oracles():
    return {
        name: sql for name, (_fn, sql) in _ordered_items() if sql is not None
    }
