"""Versioned-table / layout maintenance suite: SCD2 merge + point lookup
and Z-order clustering keys, split out of suite_relational in round 11 —
they exercise the table-maintenance tier (sources.snapshots discipline,
layout clustering), not the join/window/set-op tier, and the split lets the
round-11 scrutiny rotation (requested by the round-10 VERDICT) lead the
registry with never-driver-checked queries. The query functions and SQL
twins live unchanged in suite_relational; only registry membership moved.
"""

from __future__ import annotations

from demo_bigdata_spark.suites.suite_relational import (
    SQL_SCD2_MERGE,
    SQL_SCD2_POINT_LOOKUP,
    SQL_ZORDER_KEYS,
    q_scd2_merge,
    q_scd2_point_lookup,
    q_zorder_keys,
)

QUERIES = {
    "scd2_merge": (q_scd2_merge, SQL_SCD2_MERGE),
    "scd2_point_lookup": (q_scd2_point_lookup, SQL_SCD2_POINT_LOOKUP),
    "zorder_keys": (q_zorder_keys, SQL_ZORDER_KEYS),
}
