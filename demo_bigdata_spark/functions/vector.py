"""Vector arithmetic over array<float> columns — UDF-free.

Built from ``zip_with`` / ``aggregate`` higher-order functions, which execute
JVM-side inside whole-stage codegen — no Arrow transfer, no Python in the hot
path. This is the [EXT] similarity-search foundation (north star:
BASELINE.json) — the reference has no vector ops.

At 100 TB: these expressions scan-and-score in one stage; pair them with a
LSH/IVF bucketing strategy (operators/similarity.py) so candidate generation
is a bucket equi-join instead of a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column."""
    sq = F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe for zero vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
