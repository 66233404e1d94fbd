"""Text-analysis operators [EXT] over the ``documents`` table (north star:
training-data pipeline surface — language ID, quality scoring, token counting,
document fingerprinting).

All hot-path logic is Catalyst built-ins (split/regexp/length/aggregate) —
JVM-side, codegen'd, no Python per row. Every operator has an ANSI twin so it
stays oracle-checkable (suites/suite_llm.py).

At 100 TB: these are embarrassingly parallel scans (no shuffle until the final
aggregate); the expensive part is the string work, which whole-stage codegen
vectorizes. For corpus-level stats prefer the approx variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword markers for the n-gram/stopword heuristic
# language-ID. Deliberately small + deterministic — a real pipeline would
# plug a fastText-style model in via pandas_udf (operators/multimodal.py
# shows the plumbing pattern).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
    "zh": ("de", "shi", "zhong"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization — array<string>."""
    col = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(col), r"\s+")


def token_count(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    empty = F.trim(col) == ""
    return F.when(empty, F.lit(0)).otherwise(F.size(tokens(col)))


def word_like_token_count(text: Column | str) -> Column:
    """BPE-ish sub-word proxy: count alphanumeric runs + punctuation marks
    separately (regexp-based, JVM-side)."""
    col = F.col(text) if isinstance(text, str) else text
    words = F.size(F.filter(F.split(col, r"[^A-Za-z0-9]+"), lambda t: t != ""))
    puncts = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return (words + puncts).cast("int")


def shingles(text: Column | str, n: int = 3) -> Column:
    """n-token shingles (overlapping n-grams of the whitespace tokens).
    Documents with fewer than n tokens yield one whole-text shingle.
    Pure higher-order-function composition — no explode, no shuffle."""
    col = F.col(text) if isinstance(text, str) else text
    toks = tokens(col)

    def _shingle(i: Column) -> Column:
        return F.concat_ws(" ", F.slice(toks, i + 1, n))

    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n), _shingle),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token count, mean token length,
    uppercase/punct/digit ratios, distinct-token ratio. Pure projection —
    no shuffle."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = tokens(c)
    n_tokens = token_count(c)
    return df.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars_calc"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 2).alias("avg_token_len"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1)).cast("double"), 4
        ).alias("distinct_token_ratio"),
        F.round(
            F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1)).cast("double"), 4
        ).alias("digit_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", min_tokens: int = 5, max_avg_token_len: float = 12.0) -> DataFrame:
    """Heuristic keep/drop quality gate à la Gopher rules (public C4/Gopher
    filtering heuristics re-expressed as Catalyst predicates)."""
    feats = quality_features(df, text_col)
    return feats.withColumn(
        "keep",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("avg_token_len") <= max_avg_token_len)
        & (F.col("distinct_token_ratio") >= 0.1),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: score each candidate language by counting
    marker-token hits, pick the argmax (ties -> lexicographic, deterministic).

    Implemented as a fold over a literal score array — pure expressions, no
    UDF. Scores are computed on the token array so markers match whole tokens
    only.
    """
    toks = tokens(F.col(text_col))
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        score = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))  # struct compare: score first, then lang
    return df.withColumn("predicted_lang", F.when(best["score"] > 0, best["lang"]))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the token-normalized text
    (lowercase, collapsed whitespace). Portable across engines (exact-dedup
    key). A rolling/winnowing hash variant lives in operators/dedup.py."""
    normalized = F.array_join(tokens(F.lower(F.col(text_col))), " ")
    return df.withColumn("fp", F.md5(normalized))


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """[EXT] fixed-size overlapping token chunks — the pre-training /
    RAG-ingest chunker. One row per chunk: (id, chunk_id, n_tokens,
    chunk_text), stride = chunk_size - overlap.

    Entirely Catalyst built-ins: tokenize once, ``sequence`` over chunk
    starts, ``explode``, ``slice`` + ``concat_ws`` — no Python in the row
    path, fully codegen'd, embarrassingly parallel (no shuffle at all).
    Empty/whitespace docs produce zero chunks.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap ({overlap}) must be < chunk_size ({chunk_size})")
    stride = chunk_size - overlap
    base = df.select(
        F.col(id_col),
        tokens(text_col).alias("_toks"),
        token_count(text_col).alias("_n"),
    ).filter(F.col("_n") > 0)
    # chunk starts: 0, stride, 2*stride, ... while start < n (last chunk may
    # be short but never empty; a doc shorter than chunk_size yields 1 chunk)
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    chunked = base.select(
        id_col,
        "_toks",
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size)
    return chunked.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


# PII patterns deliberately conservative + deterministic; a production
# pipeline would layer an NER model via pandas_udf on top. Kept as module
# constants so the DuckDB oracle twins are built from the SAME regexes.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "PHONE": r"\+?\d[\d\- ]{7,}\d",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """[EXT] deterministic PII scrubbing: emails, IPv4s, phone-like digit
    runs replaced with ``[TYPE]`` tokens, plus per-type hit counts for audit.
    Pure regexp_replace/regexp_count chain — JVM-side, codegen'd, no
    shuffle; scales as a straight map over the corpus.
    """
    out = out_col or f"{text_col}_redacted"
    c: Column = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(F.regexp_count(c, F.lit(pat)).cast("bigint").alias(f"n_{name.lower()}"))
    red = c
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"[{name}]")
    return df.select("*", *counts, red.alias(out))


def unigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """[EXT] corpus-LM quality signal: per-document mean unigram
    -log2 p(token), with p estimated from the corpus itself (add-one
    smoothing over the vocabulary). The cheap stand-in for a KenLM-style
    perplexity filter — documents of improbable tokens score high.

    Shape: one explode+agg for the frequency table (shuffle on token), one
    explode+join of docs against it (shuffle on token; the frequency table
    usually broadcasts — Zipf keeps vocabularies small relative to corpora),
    one agg back per doc. All exact integer/log arithmetic — engine-portable.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok")).filter(
        F.col("tok") != ""
    )
    freqs = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    totals = freqs.agg(
        F.sum("tf").alias("_n"), F.count("*").alias("_v")
    )
    scored = (
        toks.join(freqs, "tok")
        .join(F.broadcast(totals))
        .withColumn(
            "_nll",
            -F.log2((F.col("tf") + 1) / (F.col("_n") + F.col("_v")).cast("double")),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("_nll"), 4).alias("mean_nll"),
        F.count("*").alias("n_tokens"),
    )
