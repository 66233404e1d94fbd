"""Persistent inverted index: build once, probe with partition pruning.

[EXT] The retrieval twin of build_dedup_index (operators/dedup.py): at
100 TB you do not re-scan the corpus per query — you materialize postings
ONCE, laid out so a query touches only its own slice, and every later
search is a pruned read.

Spark-first layout: postings are plain (term, doc_id, tf) ROWS — never
collect_list'd into per-term arrays, which would make corpus-stopword
postings (appearing in every doc) single-row gigabyte cells and re-shuffle
the whole list on every merge. Rows keep the index mergeable by appending
files, and the term_bucket partitioning (content-addressed md5 bucket,
sampling.hash_bucket) means a k-term query prunes the scan to <= k
directories regardless of corpus size. Conjunctive search is then a
groupBy(doc) HAVING count = k over only the matching postings — shuffle
volume is the query's posting rows, not the corpus.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_bigdata_spark.operators.ranking import term_frequencies
from demo_bigdata_spark.operators.sampling import _HEX_CHARS, hash_bucket


def python_term_bucket(term: str, n_buckets: int = 256) -> int:
    """Driver-side twin of sampling.hash_bucket's portable md5 path — used
    to turn query terms into partition values WITHOUT touching the data.
    Must stay bit-compatible with the Spark expression (pinned by
    tests/test_operators: a drifted bucket silently empties searches)."""
    h = int(hashlib.md5(term.encode("utf-8")).hexdigest()[:_HEX_CHARS], 16)
    return h % n_buckets


def build_inverted_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> None:
    """Materialize the postings table partitioned by term_bucket. Build cost
    is one explode + (doc, term) groupBy + one shuffle into the bucket
    layout; incremental corpora append new batches' postings to the same
    layout (same bucket function => same directories)."""
    tf = term_frequencies(df, text_col, id_col)
    (
        tf.withColumn("term_bucket", hash_bucket("term", n_buckets))
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )


def conjunctive_search(
    spark: SparkSession,
    path: str,
    terms: list[str],
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Docs containing ALL ``terms``, with match stats, straight off the
    index: the term_bucket values are computed driver-side from the query
    string alone, so the parquet scan partition-prunes to at most
    len(terms) buckets (plan-pinned); the HAVING count = k conjunction
    runs on postings rows only."""
    uniq = sorted(set(terms))
    buckets = sorted({python_term_bucket(t, n_buckets) for t in uniq})
    postings = (
        spark.read.parquet(path)
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(uniq))
    )
    return (
        postings.groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("tf").cast("bigint").alias("total_tf"),
        )
        .filter(F.col("n_terms") == len(uniq))
    )
