"""Headline benchmark — run per-round by the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via the noop sink (no driver collect, no
result-size bias). Timings exclude session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_bigdata_spark.session import get_spark
from demo_bigdata_spark.suites import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    # reference surface
    "global_stats",
    "type_distribution",
    "hourly_series",
    "top_users",
    "numeric_profile",
    "recent_events",
    "json_extract",
    "sessionize",
    "scalar_functions",
    # ingest pipeline (JSON parse/flatten/quality end-to-end)
    "ingest_category_stats",
    # analytics [EXT]
    "funnel",
    "profile",
    # analytics [EXT] - gap-fill / histogram / sketches
    "resampled_hourly",
    "value_histogram",
    "sketched_uniques",
    # relational [EXT]
    "tpch_q1",
    "shipping_priority",
    "revenue_by_nation",
    "top_customers",
    "top_orders_per_customer",
    "rollup_flags",
    "asof_purchase_click",
    "events_in_windows",
    "local_supplier_volume",
    "returned_item_losses",
    "large_volume_orders",
    "scd2_point_lookup",
    # streaming twins
    "tumbling_window",
    "session_windows",
    # LLM ops [EXT]
    "dedup_exact",
    "minhash_signature",
    "minhash_shingles",
    "near_duplicates",
    "ngram_jaccard",
    "simhash",
    "text_quality",
    "gopher_quality_gate",
    "token_counts",
    "cosine_topk",
    "quantized_topk",
    "embedding_pairs",
    "doc_chunks",
    "hash_sample",
    "decontamination",
    "winnowed_fingerprints",
    # r4 packing/mixture tier
    "sequence_packing",
    "pack_checksums",
    "token_mixture",
    # r5 ranking tier
    "tfidf_terms",
    "bm25_rank",
    "corpus_shuffle",
    "cdc_chunks",
    "cooccurrence",
    "pmi_scores",
    # r6 composed contamination-aware pipeline + classifier filter
    "corpus_pipeline_v2",
    "classifier_quality",
    # r7: classifier-filtered pipeline, in-engine AUC eval, manifest-pruned
    # versioned-table scan
    "corpus_pipeline_v3",
    "classifier_eval",
    "snapshot_prune",
    # r7: exact-substring span dedup, CCNet bigram-LM perplexity gate,
    # DSIR importance weights
    "span_dedup",
    "lm_perplexity",
    "dsir_weights",
    # r8: token-budget DSIR selection + the full composed pipeline
    # (gate -> span dedup -> decon -> classifier -> perplexity buckets ->
    # DSIR budget selection)
    "dsir_select_budget",
    "corpus_pipeline_v4",
    # r8 continuation: cluster-scoped semantic dedup, soft-dedup
    # reweighting, temperature mixture, TPC-H Q12 analog
    "semantic_dedup",
    "soft_dedup",
    "temperature_mixture",
    "priority_shipping",
    # r8 third session: hybrid RAG retrieval (BM25 + dense RRF fusion) and
    # iterative integer-exact PageRank over the nation trade graph
    "hybrid_rrf",
    "nation_pagerank",
    # r9: skew-capped SemDeDup (bounded within-cluster pair work), IVF-PQ
    # ANN with exact refine, delete-aware change feed
    "semantic_dedup_capped",
    "ivf_pq_topk",
    "snapshot_cdf",
    # r10: persisted IVF-PQ index probe (partition-pruned ADC scan)
    "ivf_pq_topk_indexed",
    # r10: batched exact ANN - Q queries, one corpus scan
    "multi_query_topk",
    # r10: shuffle-free class-balanced sampling + JL embedding compression
    "stratified_sample",
    "random_projection",
    # r10: kNN graph (exact block-GEMM; the IVF variant is the scale path)
    "knn_graph",
    # r10: per-source quality percentile + greedy k-center coreset
    "quality_percentile",
    "kcenter_select",
    # r10: connected components over the thresholded kNN graph
    "knn_clusters",
    # r10: ANN through the JL-projected space (full SQL oracle)
    "rp_topk",
    # r11: URL canonicalization + URL-level dedup (CCNet/FineWeb
    # pre-content-dedup step)
    "url_canonical",
    "url_dedup",
    # r11: A-ES weighted sampling + Bloom-filter decontamination
    # (broadcast-bits membership instead of the exact join's shuffle)
    "weighted_sample",
    "bloom_decontamination",
    # r12: incremental keep/drop dedup decisions (CC over the committed
    # pair set / band table), the dedup-ordered composed pipeline, and the
    # hash-checked frozen-model IVF
    "dedup_survivors",
    "dedup_clusters_incremental",
    "corpus_pipeline_v5",
    "ivf_topk_frozen",
    # r12: domain-level curation (registrable-domain extraction, per-domain
    # caps, volume stats)
    "url_domains",
    "domain_cap",
    "domain_stats",
    # r12: mergeable fixed-range histogram quantile sketch
    "quantile_sketch",
    # r12: pre-tokenization normalization + domain blocklist filter
    "normalized_text",
    "domain_blocklist",
    # r12: domain-level quality gate (judge sites, not just pages)
    "domain_quality",
    # r13: registrable-domain extraction against a real-PSL suffix table
    "url_domains_psl",
    # r13: the domain tier composed into the crawl order
    "corpus_pipeline_v6",
    # r13: wildcard/exception PSL rules
    "url_domains_psl_wild",
    # r13: per-source unigram KL divergence vs the corpus mixture
    "source_kl",
    # r13: frozen-codebook PQ ADC top-k (the 7th oracle-matched ANN query)
    "pq_topk_frozen",
    # r13: frozen IVF-PQ composition (the FAISS shape, fully value-checked)
    "ivf_pq_topk_frozen",
]
# With the r12 scrutiny rotation complete (every declared query has a driver
# CORRECTNESS row), this list is PINNED: future rounds append new queries at
# the end but never reorder or remove entries, so cross-round bench diffs
# stay apples-to-apples. tpch_q1 is the designated control row for
# environment-drift calibration (ROUND_NOTES records its spread per round).

# Queries whose CONSTRUCTION performs the query's own computation (driver-side
# label-propagation / power-iteration collects), so construction must sit
# inside the timed region or the row under-reports ~50x (r12 VERDICT item 3).
# Membership rule: a query belongs here iff fn() runs Spark jobs that ARE the
# query (iterative reads), not jobs that BUILD its input fixture.
CONSTRUCT_TIMED = {
    "dedup_survivors",
    "dedup_clusters_incremental",
    "knn_clusters",
    "nation_pagerank",
}


def main() -> None:
    sf_label = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries = all_queries()
    # warm the JVM/codegen/catalog once (not the queries themselves)
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        # best of 5: first execution pays one-time whole-stage-codegen javac
        # + JIT compilation (measured 2x+ noise on expression-heavy queries);
        # steady-state throughput is what projects to cluster scale, where
        # compile cost amortizes over TBs instead of being re-paid per run.
        # Raised 2->3 in r3 (one contended run poisoned r2) and 3->5 in r4:
        # the r4 container showed +/-15% swings on UNCHANGED queries between
        # whole-bench runs, so a deeper min is needed for stable
        # round-over-round comparison.
        #
        # r13 (r12 VERDICT item 3): for the CONSTRUCT_TIMED reader/iterative
        # queries, DataFrame construction is inside the timed region —
        # their construction does the query's own driver-side fixed-point
        # collects, so timing only the final noop write under-reported them
        # ~50x. Everything else keeps materialization-only timing: a uniform
        # construct-per-iteration was measured and rejected (sf0.01 probe:
        # snapshot_cdf 0.33 -> 27.5 s) because fixture-BUILDING constructions
        # (snapshot/epoch tables that exist as real tables in production)
        # would drown the read cost the row is supposed to track and break
        # the pinned list's cross-round comparability for all 97 rows. The
        # one-time step change for the 4 rows is recorded in ROUND_NOTES.
        best = float("inf")
        if name in CONSTRUCT_TIMED:
            for _ in range(5):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        else:
            df = fn(spark, SF_DIR)
            for _ in range(5):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    sf = float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (noop-materialized, best-of-5)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    # r14 (r13 VERDICT item 6, additions-only): the full per-query map also
    # outgrows the driver's stdout TAIL capture (PERF_r13 reconstructed
    # round-over-round comparison by hand from truncated fragments), so
    # persist it to a file next to this script. stdout contract unchanged:
    # the compact JSON line below stays LAST.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_last.json"),
            "w",
        ) as fh:
            json.dump(
                {"value": total, "sf": sf, "queries": timings}, fh, indent=1
            )
    except OSError:
        pass  # best-effort: a read-only checkout must not fail the bench
    # The per-query map above outgrew the driver's fixed-size stdout tail
    # capture in round 10 (82 entries pushed "metric"/"value" out of the
    # window -> BENCH_r10.json recorded parsed:null and the 2x gate went
    # unevaluated). Emit a second, compact line LAST so any tail window
    # always contains one complete parseable JSON object; the full
    # per-query line stays above for humans and round-over-round diffing.
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (noop-materialized, best-of-5)",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
