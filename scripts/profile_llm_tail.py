"""One-off profiling harness for the LLM bench tail (round-4 perf work).

Breaks each heavy query into stages (scan, tokenize, gram-hash, full) and
times each in isolation so the optimization target is measured, not guessed.
Run: python scripts/profile_llm_tail.py [sf_dir]
"""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from demo_bigdata_spark.session import get_spark  # noqa: E402
from demo_bigdata_spark.sources.catalog import load_table  # noqa: E402
from demo_bigdata_spark.operators import dedup as D  # noqa: E402
from demo_bigdata_spark.operators.text import tokens, shingles  # noqa: E402
from demo_bigdata_spark.operators.dedup import token_hash  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(label, df):
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"{label:45s} {best:7.3f}s")
    return best


def main():
    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm FS cache

    t("scan only (text)", docs.select("doc_id", "text"))
    t("scan+trim+split tokens", docs.select("doc_id", tokens(F.col("text")).alias("tk")))
    t("tokens distinct", docs.select("doc_id", F.array_distinct(tokens(F.col("text"))).alias("tk")))
    t("3-shingles (strings)", docs.select("doc_id", F.array_distinct(shingles("text", 3)).alias("sh")))
    t(
        "3-shingles hashed",
        docs.select(
            "doc_id",
            F.transform(F.array_distinct(shingles("text", 3)), token_hash).alias("hs"),
        ),
    )
    t("minhash_shingles full", D.minhash_signature(docs, shingle_n=3))

    norm = docs.select(F.col("doc_id"), F.lower(F.trim(F.col("text"))).alias("_norm"))
    n = 3
    t(
        "char3 hash-then-distinct (current)",
        norm.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("_norm") - (n - 1), F.lit(1))),
                    lambda i: token_hash(F.col("_norm").substr(i, F.lit(n))),
                )
            ).alias("g"),
        ),
    )
    t(
        "char3 distinct-then-hash (candidate)",
        norm.select(
            "doc_id",
            F.transform(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.length("_norm") - (n - 1), F.lit(1))),
                        lambda i: F.col("_norm").substr(i, F.lit(n)),
                    )
                ),
                token_hash,
            ).alias("g"),
        ),
    )
    t("winnow k=5 full", D.winnow_fingerprints(docs))
    t("decontaminate-shingle8 hashed side", docs.select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text"), 8))).alias("_s")
    ).select("doc_id", F.md5("_s").alias("h")).distinct())

    from demo_bigdata_spark.suites import suite_llm as L

    t("ngram_jaccard full (cold cands)", L.q_ngram_jaccard(spark, SF_DIR))
    t("ngram_jaccard full (warm cands)", L.q_ngram_jaccard(spark, SF_DIR))
    t("gopher_quality_gate full", L.q_gopher_quality_gate(spark, SF_DIR))
    t("decontamination full", L.q_decontamination(spark, SF_DIR))


if __name__ == "__main__":
    main()
