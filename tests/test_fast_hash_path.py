"""xxhash64 fast-path (portable=False) semantics vs the md5 oracle path.

The production hash swap must change WHICH hash family is used, never WHAT
the operators mean: verified near-dup pair sets, decontamination hits, and
sampling determinism are hash-family-independent properties. Hash values
themselves are expected to differ — these tests compare result *semantics*.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_bigdata_spark.operators import dedup as D
from demo_bigdata_spark.operators import sampling as SMP
from demo_bigdata_spark.sources.catalog import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _pairs(df, cols=("id_a", "id_b")):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_near_duplicates_cross_family_recall(spark, sf_dir):
    """LSH candidate generation is hash-family-dependent (different band
    collisions, and the dup-farm max_bucket cap drops different buckets), so
    the verified pair sets are NOT expected to be identical — measured ~5%
    symmetric difference on this corpus. The falsifiable invariant: each
    family must recall nearly all STRONG pairs (jaccard >= 0.8) that the
    other family surfaced, and jaccard values on common pairs must agree to
    within 28-bit-collision noise. A degenerate fast hash (constant, or
    poorly mixed low bits) collapses recall or the candidate count and
    fails this."""
    docs = _docs(spark, sf_dir)
    slow = {(r.id_a, r.id_b): r.jaccard for r in D.near_duplicates(docs, threshold=0.7).collect()}
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.near_duplicates(docs, threshold=0.7, portable=False).collect()
    }
    strong_slow = {p for p, j in slow.items() if j >= 0.8}
    strong_fast = {p for p, j in fast.items() if j >= 0.8}
    assert strong_slow and strong_fast
    assert len(strong_slow & set(fast)) >= 0.95 * len(strong_slow)
    assert len(strong_fast & set(slow)) >= 0.95 * len(strong_fast)
    common = set(slow) & set(fast)
    assert len(common) >= 0.9 * min(len(slow), len(fast))
    assert all(abs(slow[p] - fast[p]) < 0.01 for p in common)


def test_decontaminate_hits_match(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("source").isin("src0", "src1"))
    tr = docs.filter(~F.col("source").isin("src0", "src1"))
    slow = D.decontaminate(tr, ev, n=8).orderBy("train_id").collect()
    fast = D.decontaminate(tr, ev, n=8, portable=False).orderBy("train_id").collect()
    # exact shingle matching: identical rows (counts included), only the
    # internal join-key representation differs (md5 hex vs xxhash64 bigint)
    assert [tuple(r) for r in slow] == [tuple(r) for r in fast]


def test_char_ngram_jaccard_matches(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    cands = D.minhash_candidates(docs, max_bucket=1000)
    slow = D.char_ngram_jaccard_pairs(docs, cands, size_prune_threshold=0.5)
    fast = D.char_ngram_jaccard_pairs(
        docs, cands, size_prune_threshold=0.5, portable=False
    )
    s = {(r.id_a, r.id_b): r.ngram_jaccard for r in slow.collect()}
    f = {(r.id_a, r.id_b): r.ngram_jaccard for r in fast.collect()}
    assert set(s) == set(f)
    # jaccard values agree except through 28-bit collisions, which shift the
    # set sizes by at most a count or two — allow a hair of slack
    assert all(abs(s[k] - f[k]) < 0.01 for k in s)


def test_winnow_overlap_deterministic_and_plausible(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    fast1 = _pairs(D.winnow_overlap_pairs(docs, portable=False))
    fast2 = _pairs(D.winnow_overlap_pairs(docs, portable=False))
    assert fast1 == fast2  # content-addressed: no partition/run dependence
    # winnowed minima positions ARE hash-family-dependent, so the pair sets
    # may differ at the margin; the strong overlaps (exact duplicate docs,
    # which share every window) must be found by both families
    slow = _pairs(D.winnow_overlap_pairs(docs))
    exact = D.exact_dedup(docs).filter(F.col("n_dups") >= 2)
    dup_fps = {r.fp for r in exact.collect()}
    if dup_fps:
        assert slow & fast1, "no common overlap pairs between hash families"


def test_hash_sample_fast_path_properties(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = docs.count()
    s10 = SMP.hash_sample(docs, "doc_id", 0.1, portable=False)
    s20 = SMP.hash_sample(docs, "doc_id", 0.2, portable=False)
    ids10 = {r.doc_id for r in s10.select("doc_id").collect()}
    ids20 = {r.doc_id for r in s20.select("doc_id").collect()}
    assert ids10 <= ids20  # growing the fraction only ADDS buckets
    assert abs(len(ids20) / n - 0.2) < 0.1  # unbiased to bucket resolution
    again = {r.doc_id for r in SMP.hash_sample(docs, "doc_id", 0.1, portable=False).collect()}
    assert again == ids10


def test_fast_hash_range_is_28_bit(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    vals = docs.select(
        F.explode(
            F.transform(
                F.array_distinct(F.split(F.trim("text"), r"\s+")),
                D.token_hash_fast,
            )
        ).alias("h")
    )
    mn, mx = vals.agg(F.min("h"), F.max("h")).first()
    assert mn >= 0 and mx < (1 << 28)


def test_gopher_filter_fast_bigram_path_matches(spark, sf_dir):
    """The xxhash64 bigram-shuffle path must produce identical Gopher gate
    output on the fixture corpus (a 64-bit collision merging two distinct
    bigrams is the only possible divergence)."""
    from demo_bigdata_spark.operators import text as X

    docs = _docs(spark, sf_dir)
    slow = X.gopher_filter(docs).orderBy("doc_id").collect()
    fast = X.gopher_filter(docs, portable=False).orderBy("doc_id").collect()
    assert [tuple(r) for r in slow] == [tuple(r) for r in fast]


def test_span_dedup_fast_hash_matches(spark, sf_dir):
    """span_dedup's xxhash64 production path must produce the identical
    removal decisions and rebuilt text as the md5 oracle path (a 64-bit
    gram collision is the only possible divergence)."""
    docs = _docs(spark, sf_dir)
    slow = D.span_dedup(docs, window=20).orderBy("doc_id").collect()
    fast = D.span_dedup(docs, window=20, portable=False).orderBy("doc_id").collect()
    assert [tuple(r) for r in slow] == [tuple(r) for r in fast]
