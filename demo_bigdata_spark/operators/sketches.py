"""Mergeable-sketch operators [EXT]: HLL distinct counts, count-min frequency.

The 100 TB pattern these enable: pre-aggregate each partition/day into a
fixed-size sketch (KBs, not GBs), persist the sketches, and answer any
range/rollup query by MERGING sketches — no rescan of raw data, no exact
countDistinct shuffle of billions of keys. Spark ships both aggregates
natively (Datasketches HLL: ``hll_sketch_agg``/``hll_union_agg``/
``hll_sketch_estimate``; count-min: ``count_min_sketch``), so the whole tier
is built-in expressions — no UDFs, fully codegen'd, deterministic for a
fixed seed/precision.

The reference computes exact ``countDistinct`` per dashboard refresh
(services/api-service/data_service.py:127-132); at reference scale that is
fine, at 100 TB the nightly-sketch + merge-on-read layout replaces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log2m for the HLL registers: 12 -> 4096 registers, ~1.6% relative standard
# error, ~4 KB per sketch. Raise to 14+ when a 0.4% error budget matters.
DEFAULT_LGK = 12


def distinct_sketches(
    df: DataFrame, key_col: str, group_cols: list[str], lgk: int = DEFAULT_LGK
) -> DataFrame:
    """Per-group HLL sketch of ``key_col`` — the persistable partial.

    One hash-aggregate shuffle on ``group_cols``; each output row carries a
    fixed-size binary ``sketch`` that can be stored (e.g. partitioned by day)
    and re-merged later for any coarser grouping."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch")
    )


def merge_sketches(df: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge persisted sketches to a coarser grouping (empty = global).

    HLL register-max merge is commutative and associative, so the estimate is
    independent of partitioning and merge order — safe under AQE re-planning.
    Shuffles only sketch bytes (KBs per group), never raw keys."""
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(F.hll_union_agg("sketch").alias("sketch"))


def estimate_distinct(df: DataFrame, out_col: str = "est_uniques") -> DataFrame:
    """Attach the cardinality estimate for a sketch column."""
    return df.withColumn(out_col, F.hll_sketch_estimate("sketch"))


def count_min_table(
    df: DataFrame,
    value_col: str,
    probes: list[str],
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Estimate frequencies of ``probes`` from a count-min sketch of
    ``value_col``.

    The sketch is ONE distributed aggregate over the column (mergeable
    binary, width ceil(e/eps) x depth ceil(ln(1/confidence)) counters); the
    probe lookup is driver-side against the ~KB sketch — bounded work, like
    collecting a top-k. Guarantees: est >= true count, and
    est <= true + eps * N with the given confidence. Fixed seed => fully
    deterministic output."""
    blob = df.agg(
        F.count_min_sketch(
            F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sk")
    ).head()["sk"]
    spark = df.sparkSession
    jvm = spark._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )
    rows = [(p, sketch.estimateCount(p)) for p in probes]
    return spark.createDataFrame(rows, "probe string, est_count long")
