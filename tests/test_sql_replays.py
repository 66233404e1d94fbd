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
    """The PRODUCTION murmur3 SQL builder (suite_llm.murmur3_sql — the one
    the CMS twin is generated from) must equal the pure-Python
    (JVM-equivalence-pinned) reference for any ASCII token and any 32-bit
    seed — word blocks, signed tail bytes, empty string."""
    from demo_bigdata_spark.suites.suite_llm import murmur3_sql

    expr = murmur3_sql("t", str(seed))
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
