"""Property tests for the r4 SQL oracle replays, independent of Spark.

The graduated twins (sentence packer recursive CTE, murmur3-in-SQL) assert
equality against Spark on the fixed corpus; these hypothesis tests attack the
REPLAY LOGIC itself on adversarial generated inputs, using the pure-Python
reference implementations as ground truth — cheap (no SparkSession) and much
broader than the corpus.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demo_bigdata_spark.operators.sketches import _murmur3_32

# printable ASCII only — the twins' byte<->char equivalence is an explicitly
# documented precondition (the corpus is pure ASCII at every SF)
ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)
ascii_token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=0, max_size=40
)

_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")


def _pack_reference(text: str, max_tokens: int = 64):
    """Pure-Python mirror of functions/udtfs.py::SentencePack."""
    if not text or not text.strip():
        return []
    out, seg_id, cur_tokens, n_sent = [], 0, 0, 0
    for sentence in _SENTENCE_SPLIT.split(text.strip()):
        t = len(sentence.split())
        if n_sent and cur_tokens + t > max_tokens:
            out.append((seg_id, n_sent, cur_tokens))
            seg_id, cur_tokens, n_sent = seg_id + 1, 0, 0
        cur_tokens += t
        n_sent += 1
    out.append((seg_id, n_sent, cur_tokens))
    return out


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


@settings(max_examples=60, deadline=None)
@given(texts=st.lists(ascii_text, min_size=1, max_size=5))
def test_sentence_pack_cte_matches_reference(texts):
    """The recursive-CTE greedy packer (SQL_SENTENCE_SEGMENTS) must equal the
    Python packer on arbitrary ASCII text — including punctuation runs,
    empty/whitespace docs, and single overlong sentences."""
    from demo_bigdata_spark.suites.suite_llm import SQL_SENTENCE_SEGMENTS

    c = duckdb.connect()
    c.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    c.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = c.execute(SQL_SENTENCE_SEGMENTS).fetchall()
    expected = [
        (doc_id, seg_id, n_sent, n_tok)
        for doc_id, text in enumerate(texts)
        for seg_id, n_sent, n_tok in _pack_reference(text)
    ]
    assert got == sorted(expected), (texts, got, expected)
    c.close()


@settings(max_examples=80, deadline=None)
@given(tok=ascii_token, seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_murmur3_sql_matches_python(con, tok, seed):
    """The SQL Murmur3_x86_32 inside SQL_CMS_TOKEN_COUNTS must equal the
    pure-Python (JVM-equivalence-pinned) reference for any ASCII token and
    any 32-bit seed — word blocks, signed tail bytes, empty string."""
    from demo_bigdata_spark.suites.suite_llm import _sql_cms_token_counts  # noqa: F401

    # rebuild just the murmur expression the generator uses
    m32 = 4294967296

    def mix(acc, w):
        k1a = f"(({w}::HUGEINT * 3432918353) % {m32})"
        k1b = f"((({k1a} * 32768) % {m32}) + ({k1a} // 131072))"
        k1c = f"((({k1b} * 461845907) % {m32})::BIGINT)"
        h = f"xor({acc}::BIGINT, {k1c})"
        hb = f"((({h}::HUGEINT * 8192) % {m32}) + ({h} // 524288))"
        return f"(((({hb} * 5) + 3864292196) % {m32})::BIGINT)"

    def fmix(h1, length):
        s1 = f"xor({h1}, {length})"
        s2 = f"xor({s1}, {s1} // 65536)"
        s3 = f"((({s2}::HUGEINT * 2246822507) % {m32})::BIGINT)"
        s4 = f"xor({s3}, {s3} // 8192)"
        s5 = f"((({s4}::HUGEINT * 3266489909) % {m32})::BIGINT)"
        return f"xor({s5}, {s5} // 65536)"

    words = (
        "list_concat("
        "list_transform(range((length(t) // 4)), j -> "
        "ascii(t[4*j+1]) + 256*ascii(t[4*j+2]) + 65536*ascii(t[4*j+3]) + 16777216*ascii(t[4*j+4])), "
        "list_transform(range(4 * (length(t) // 4), length(t)), i -> "
        "CASE WHEN ascii(t[i+1]) >= 128 THEN ascii(t[i+1]) + 4294967040 ELSE ascii(t[i+1]) END))"
    )
    expr = fmix(
        f"(list_reduce(list_prepend({seed}::BIGINT, {words}), (a, w) -> {mix('a', 'w')}))",
        "length(t)",
    )
    got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [tok]).fetchone()[0]
    assert got == _murmur3_32(tok.encode(), seed) & 0xFFFFFFFF, (tok, seed)


def test_corpus_is_pure_ascii(sf_dir):
    """The media-tier twins (image_features/frame_samples/image_resize) and
    the murmur3 CMS twin equate DuckDB VARCHAR positions with byte positions
    and ascii() with byte values — valid ONLY for a pure-ASCII corpus. If a
    regenerated testdata set ever breaks this, fail HERE with a clear
    message instead of as inscrutable hash mismatches in four oracles."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE octet_length(encode(text)) <> length(text) OR contains(text, chr(1))"
    ).fetchone()[0]
    con.close()
    assert n == 0, (
        f"{n} documents contain non-ASCII bytes (or chr(1)) — the byte-level "
        "SQL twins' char==byte equivalence no longer holds; those oracles "
        "must be rewritten against hex(encode(text)) pairs"
    )
