"""Python UDTFs (Spark 4 user-defined table functions) — the §2.8 escape
hatch for per-row variable-output logic that declarative ops can't express.

Kept deliberately rare: everything expressible with explode/sequence/slice
stays native (see operators.text.chunk_documents). The one resident here —
greedy sentence packing — needs a reset-on-overflow accumulation loop,
which has no windowed/recursive-free SQL form.

UDTF rows stream through the Python worker (pickled batches, not Arrow),
so at 100 TB this runs as a parallel map over partitions with Python-worker
throughput; acceptable for segmentation-at-ingest, wrong for per-query hot
paths.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="seg_id int, n_sentences int, n_tokens int, segment string")
class SentencePack:
    """Greedily pack consecutive sentences into segments of at most
    ``max_tokens`` whitespace tokens; an overlong single sentence becomes
    its own segment (never split mid-sentence). The RAG/training segmenter
    that respects sentence boundaries, unlike fixed-stride chunking."""

    def eval(self, text: str, max_tokens: int):  # noqa: D102
        if not text or not text.strip():
            return
        seg_id = 0
        cur: list[str] = []
        cur_tokens = 0
        n_sent = 0
        for sentence in _SENTENCE_SPLIT.split(text.strip()):
            t = len(sentence.split())
            if cur and cur_tokens + t > max_tokens:
                yield (seg_id, n_sent, cur_tokens, " ".join(cur))
                seg_id, cur, cur_tokens, n_sent = seg_id + 1, [], 0, 0
            cur.append(sentence)
            cur_tokens += t
            n_sent += 1
        if cur:
            yield (seg_id, n_sent, cur_tokens, " ".join(cur))


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL use (LATERAL joins)."""
    spark.udtf.register("sentence_pack", SentencePack)
