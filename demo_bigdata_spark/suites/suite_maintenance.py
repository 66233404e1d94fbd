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
    SQL_CORPUS_PIPELINE_V5,
    SQL_CORPUS_PIPELINE_V6,
    SQL_DEDUP_CLUSTERS_INCREMENTAL,
    SQL_DEDUP_SURVIVORS,
    SQL_DOMAIN_BLOCKLIST,
    SQL_DOMAIN_CAP,
    SQL_DOMAIN_QUALITY,
    SQL_DOMAIN_STATS,
    SQL_IVF_PQ_TOPK_FROZEN,
    SQL_IVF_TOPK_FROZEN,
    SQL_NORMALIZED_TEXT,
    SQL_PQ_TOPK_FROZEN,
    SQL_QUANTILE_SKETCH,
    SQL_SOURCE_KL,
    SQL_URL_DOMAINS,
    SQL_URL_DOMAINS_PSL,
    SQL_URL_DOMAINS_PSL_WILD,
    SQL_WEIGHTED_SAMPLE,
    q_bloom_decontamination,
    q_corpus_pipeline_v5,
    q_corpus_pipeline_v6,
    q_dedup_clusters_incremental,
    q_dedup_survivors,
    q_domain_blocklist,
    q_domain_cap,
    q_domain_quality,
    q_domain_stats,
    q_ivf_pq_topk_frozen,
    q_ivf_topk_frozen,
    q_normalized_text,
    q_pq_topk_frozen,
    q_quantile_sketch,
    q_source_kl,
    q_url_domains,
    q_url_domains_psl,
    q_url_domains_psl_wild,
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
    # Round-13 membership move (r12 VERDICT item 2): the 11 queries added
    # late in round 12 sat at suite_llm's tail, outside the driver's head-50
    # window. Hosting their registry rows here puts all 11 inside the window
    # (5 streaming + 16 maintenance + 29 relational), after which EVERY
    # declared query has a driver CORRECTNESS row and rotation stops for
    # good. Functions and SQL twins live unchanged in suite_llm.
    "dedup_survivors": (q_dedup_survivors, SQL_DEDUP_SURVIVORS),
    "dedup_clusters_incremental": (
        q_dedup_clusters_incremental,
        SQL_DEDUP_CLUSTERS_INCREMENTAL,
    ),
    "corpus_pipeline_v5": (q_corpus_pipeline_v5, SQL_CORPUS_PIPELINE_V5),
    "ivf_topk_frozen": (q_ivf_topk_frozen, SQL_IVF_TOPK_FROZEN),
    "quantile_sketch": (q_quantile_sketch, SQL_QUANTILE_SKETCH),
    "normalized_text": (q_normalized_text, SQL_NORMALIZED_TEXT),
    "domain_blocklist": (q_domain_blocklist, SQL_DOMAIN_BLOCKLIST),
    "domain_quality": (q_domain_quality, SQL_DOMAIN_QUALITY),
    "url_domains": (q_url_domains, SQL_URL_DOMAINS),
    "domain_cap": (q_domain_cap, SQL_DOMAIN_CAP),
    "domain_stats": (q_domain_stats, SQL_DOMAIN_STATS),
    # New r13 queries register HERE (inside the driver's head-50 window) so
    # they get a CORRECTNESS row in the round that introduces them — no
    # repeat of the r12 tail-scrutiny gap. Functions + SQL live in their
    # home modules as always.
    "url_domains_psl": (q_url_domains_psl, SQL_URL_DOMAINS_PSL),
    "corpus_pipeline_v6": (q_corpus_pipeline_v6, SQL_CORPUS_PIPELINE_V6),
    "url_domains_psl_wild": (q_url_domains_psl_wild, SQL_URL_DOMAINS_PSL_WILD),
    "source_kl": (q_source_kl, SQL_SOURCE_KL),
    "pq_topk_frozen": (q_pq_topk_frozen, SQL_PQ_TOPK_FROZEN),
    "ivf_pq_topk_frozen": (q_ivf_pq_topk_frozen, SQL_IVF_PQ_TOPK_FROZEN),
}
