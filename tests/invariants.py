"""Per-query invariants for rows-only suite queries (r3 VERDICT #2).

Queries whose values cannot hash-match a DuckDB twin (engine-specific
sketches, approximate search, iterative algorithms, mapInPandas media ops)
previously got a vacuous ``len(out) >= 0`` twin check. Each entry here is a
falsifiable assertion of the query's actual contract — recall floors against
the exact operator, refinement/subset relations against oracle-checked
siblings, and sketch error bounds. (The mapInPandas media tier and the
UDTF segmenter graduated to full SQL twins in r4 — ASCII corpus makes the
byte arithmetic replayable, a recursive CTE replays the greedy packer.)

Every rows-only query MUST have an entry: the twin fails on a missing name,
so a new ``(fn, None)`` suite row cannot ship without an invariant.
"""

from __future__ import annotations

import re

import pandas as pd

_TOK_SPLIT = re.compile(r"\s+")


def _docs_pdf(con) -> pd.DataFrame:
    return con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").df()


def inv_dup_clusters(out: pd.DataFrame, spark, sf_dir, con) -> None:
    """Label-propagation clusters must (a) label every banded doc exactly
    once, (b) use the min member id as the cluster id, and (c) refine the
    oracle-checked near_duplicates graph: every verified near-dup pair is
    co-clustered (pairs arise from shared LSH buckets, which is exactly the
    edge set the propagation closes over)."""
    from demo_bigdata_spark.suites.suite_llm import SQL_NEAR_DUPLICATES

    assert list(out.columns) == ["doc_id", "cluster_id"]
    assert out["doc_id"].is_unique
    # cluster id = min member id (and therefore a member)
    gmin = out.groupby("cluster_id")["doc_id"].min()
    assert (gmin.index == gmin.values).all(), "cluster_id != min member id"
    label = dict(zip(out["doc_id"], out["cluster_id"]))
    pairs = con.sql(SQL_NEAR_DUPLICATES).df()
    assert len(pairs) > 0, "fixture corpus lost its near-dup farm"
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        assert label.get(a) == label.get(b) is not None, (
            f"near-dup pair ({a},{b}) not co-clustered"
        )



def _exact_cosine_pairs(con, threshold: float) -> pd.DataFrame:
    return con.sql(
        f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]), 4) >= {threshold}
        """
    ).df()


def inv_lsh_pairs(out: pd.DataFrame, spark, sf_dir, con) -> None:
    """Sign-LSH pair search scores candidates exactly, so precision must be
    1.0 — every reported pair really has round(cosine, 4) >= threshold (the
    operator's declared contract — the filter applies AFTER 4dp rounding),
    with the value agreeing with an independent DuckDB recomputation.
    Recall against the exact O(n^2) pair set must
    clear the analytic floor for 4 planes x 8 tables (mirrors
    test_lsh_recall_and_precision's 0.4)."""
    from demo_bigdata_spark.suites.suite_llm import PAIR_THRESHOLD

    exact = _exact_cosine_pairs(con, PAIR_THRESHOLD)
    exact_map = {(a, b): c for a, b, c in exact.itertuples(index=False, name=None)}
    assert len(out) > 0, "LSH found no pairs on the fixture corpus"
    for a, b, c in out[["id_a", "id_b", "cosine"]].itertuples(index=False, name=None):
        assert (a, b) in exact_map, f"false positive pair ({a},{b})"
        assert abs(c - exact_map[(a, b)]) <= 1e-4 + 1e-9, (a, b, c, exact_map[(a, b)])
    recall = len(out) / len(exact)
    assert recall >= 0.4, f"LSH recall {recall:.2f} below floor"


def inv_ivf_topk(out: pd.DataFrame, spark, sf_dir, con) -> None:
    """IVF probe search must hit the exact top-10 (DuckDB brute force against
    the same query vector, vec_id 0) with recall@10 >= 0.4 (measured
    0.5/0.9/0.7 at sf0.001/0.01/0.1 with n_probe=6), and every returned
    cosine must be the true cosine for that id."""
    exact = con.sql(
        """
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
                     4) AS cosine
        FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10
        """
    ).df()
    assert len(out) == 10
    overlap = set(out["vec_id"]) & set(exact["vec_id"])
    assert len(overlap) >= 4, f"IVF recall@10 {len(overlap)}/10 below floor"
    true_cos = dict(
        con.sql(
            """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
                         4) AS cosine
            FROM embeddings
            """
        ).df().itertuples(index=False, name=None)
    )
    for vid, c in out[["vec_id", "cosine"]].itertuples(index=False, name=None):
        assert abs(c - true_cos[vid]) <= 1e-4 + 1e-9, (vid, c, true_cos[vid])





def inv_cms_token_counts(out: pd.DataFrame, spark, sf_dir, con) -> None:
    """Count-min contract on the query's own output: est >= exact for every
    probe, and est <= exact + eps*N (eps=0.001, N = total token count) —
    the overestimate-only property downstream frequency filters rely on."""
    from demo_bigdata_spark.suites.suite_llm import CMS_PROBE_TOKENS

    probes = ", ".join(f"'{p}'" for p in CMS_PROBE_TOKENS)
    stats = con.sql(
        f"""
        WITH toks AS (
          SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
          FROM documents
        )
        SELECT tok, count(*)::BIGINT AS n FROM toks WHERE tok IN ({probes}) GROUP BY tok
        """
    ).df()
    exact = dict(stats.itertuples(index=False, name=None))
    n_total = con.sql(
        "SELECT sum(len(string_split_regex(trim(lower(text)), '\\s+'))) FROM documents"
    ).fetchone()[0]
    assert set(out["probe"]) == set(CMS_PROBE_TOKENS)
    for probe, est in out[["probe", "est_count"]].itertuples(index=False, name=None):
        true_n = exact.get(probe, 0)
        assert est >= true_n, (probe, est, true_n)
        assert est <= true_n + 0.001 * n_total, (probe, est, true_n, n_total)


INVARIANTS = {
    "dup_clusters": inv_dup_clusters,
    "lsh_pairs": inv_lsh_pairs,
    "ivf_topk": inv_ivf_topk,
    "cms_token_counts": inv_cms_token_counts,
}
