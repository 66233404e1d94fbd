"""Corpus ranking operators: TF-IDF term extraction and BM25 retrieval.

[EXT] Beyond the reference surface (the reference dashboard has no text
ranking; its closest op is event top-k — services/analytics-service/
queries.py top-N endpoints): these are the keyword-salience and retrieval
primitives a training-data pipeline uses for topic tagging, query-based
corpus slicing, and building weak-supervision search sets.

Scale shape:
- ``term_frequencies`` is one explode + (doc_id, term) groupBy — the
  shuffle is keyed by per-document vocabulary, bounded by document size,
  never by corpus size (same argument as the Gopher bigram gate).
- TF-IDF joins the tf table to a vocabulary-sized idf table on term;
  Catalyst/AQE broadcasts it while it fits and shuffle-joins beyond that —
  both sides are already keyed by term, no extra exchange. Top-k per doc
  is a row_number window partitioned BY DOC (thousands of independent
  partitions — never a single global window).
- ``bm25_rank`` restricts the explode to the query's terms BEFORE any
  shuffle, so the aggregate moves only matching (doc, term) rows —
  corpus-size-independent for a fixed query. Document length and corpus
  size enter via two 1-row broadcast aggregates (the percentage-of-total
  pattern, functions/scalar.py:59); the final cut is
  TakeOrderedAndProject, not a global sort.

Cross-engine floats: scores are built from exact bigint counts with IEEE
+,*,/ (bit-identical in Spark and DuckDB) plus one ``ln`` — the same
accepted transcendental pattern as unigram_logprob_score's log2 (green at
every tested SF); raw doubles are emitted, the compare layer owns rounding
(ROUND_NOTES fact 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from demo_bigdata_spark.operators.text import token_count, tokens


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document term counts: one row per (doc, term) with its in-doc
    frequency. Whitespace tokenization (text.tokens), empty tokens dropped."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF:
    ``tf * (ln((N + 1) / (df + 1)) + 1)`` — the add-one form keeps idf
    finite and positive for corpus-universal terms. Ties break on term
    asc; ``rank`` is the per-doc position (1-based)."""
    # tf feeds both the idf aggregate and the scoring join — pin it so the
    # corpus explode+aggregate runs once ("persist the feature table", the
    # standard two-consumer shape)
    tf = term_frequencies(df, text_col, id_col).localCheckpoint(eager=False)
    n_docs = df.select(F.count("*").cast("bigint").alias("_n_docs"))
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df_t"))
        .join(F.broadcast(n_docs))
        .select(
            "term",
            (
                F.log((F.col("_n_docs") + 1) / (F.col("df_t") + 1)) + F.lit(1.0)
            ).alias("idf"),
        )
    )
    scored = tf.join(idf, "term").select(
        id_col, "term", "tf", (F.col("tf") * F.col("idf")).alias("tfidf")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "tfidf")
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval for a fixed term query: rank documents by
    ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with the
    always-positive idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Only
    documents containing at least one query term score (classic candidate
    semantics); ``n_hits`` is how many query terms the doc matched.

    The explode is filtered to ``query_terms`` before the aggregate, so
    shuffle volume is the matching rows, not the corpus vocabulary."""
    toks = (
        df.select(
            F.col(id_col),
            token_count(F.col(text_col)).cast("bigint").alias("dl"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        # feeds BOTH the scoring join and the df_t aggregate — pin so the
        # corpus explode runs once, not once per consumer (the shared-
        # subtree pattern of char_ngram_jaccard_pairs)
        .localCheckpoint(eager=False)
    )
    n_docs = df.select(F.count("*").cast("bigint").alias("_n_docs"))
    avgdl = df.select(
        (
            F.sum(token_count(F.col(text_col)).cast("bigint"))
            / F.count("*")
        ).alias("_avgdl")
    )
    idf = (
        toks.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df_t"))
        .join(F.broadcast(n_docs))
        .select(
            "term",
            F.log(
                1
                + (F.col("_n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
            ).alias("idf"),
        )
    )
    per_term = (
        toks.join(idf, "term")
        .join(F.broadcast(avgdl))
        .select(
            id_col,
            "term",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * (F.col("dl") / F.col("_avgdl")))
                )
            ).alias("term_score"),
        )
    )
    # fold term scores in FIXED term order, not F.sum: a float sum's value
    # depends on accumulation order, which Spark does not guarantee across
    # partitions — with one row per (doc, term), per-term sums are exact
    # single values and the outer addition is syntactically ordered, so the
    # score is bit-identical on every engine/run (ROUND_NOTES fact 5)
    ordered_terms = sorted(set(query_terms))
    per_term_cols = [
        F.sum(F.when(F.col("term") == t, F.col("term_score"))).alias(f"_s{i}")
        for i, t in enumerate(ordered_terms)
    ]
    total: Column = F.lit(0.0)
    for i in range(len(ordered_terms)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    return (
        per_term.groupBy(id_col)
        .agg(*per_term_cols, F.count("*").alias("n_hits"))
        .select(id_col, total.alias("bm25"), "n_hits")
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(limit)
    )


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    sparse_score: str,
    dense_score: str,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    limit: int = 20,
) -> DataFrame:
    """[EXT] Hybrid-retrieval fusion by Reciprocal Rank Fusion (Cormack &
    Clarke SIGIR'09): two candidate lists — a sparse (BM25) top-N and a
    dense (embedding cosine) top-N — merge into one ranking by
    ``rrf = 1/(k + rank_sparse) + 1/(k + rank_dense)``, each term 0 when
    the document is absent from that list. The RAG retrieval pattern:
    lexical recall and semantic recall fail differently, and rank-space
    fusion needs no score calibration between the two retrievers.

    Scale shape: the inputs are already top-N CANDIDATE LISTS (each
    produced scan-side by TakeOrderedAndProject or an index probe), so the
    rank windows and the full-outer join run over 2N rows, never the
    corpus — the single-partition window is bounded by the list length,
    the AUC-ranking precedent (operators/text.py::classifier_eval).
    Emitted ranks are BIGINT with 0 = "not in this list"; the rrf double
    is two IEEE divisions + one addition in fixed syntactic order —
    bit-identical cross-engine (ROUND_NOTES fact 5)."""
    sw = Window.orderBy(F.desc(sparse_score), F.asc(id_col))
    dw = Window.orderBy(F.desc(dense_score), F.asc(id_col))
    s = sparse.select(
        id_col, F.row_number().over(sw).cast("bigint").alias("sparse_rank")
    )
    d = dense.select(
        id_col, F.row_number().over(dw).cast("bigint").alias("dense_rank")
    )
    j = s.join(d, id_col, "full_outer")
    contrib = lambda r: F.when(  # noqa: E731
        F.col(r).isNotNull(), F.lit(1.0) / (F.lit(k_rrf) + F.col(r))
    ).otherwise(F.lit(0.0))
    return (
        j.select(
            id_col,
            F.coalesce("sparse_rank", F.lit(0)).alias("sparse_rank"),
            F.coalesce("dense_rank", F.lit(0)).alias("dense_rank"),
            (contrib("sparse_rank") + contrib("dense_rank")).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(limit)
    )
