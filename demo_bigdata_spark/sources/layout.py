"""Data layout for scan pruning: range-sorted writes + a skipping report.

[EXT] At 100 TB the fastest scan is the one that never happens: parquet
readers prune ROW GROUPS whose column min/max statistics exclude the
predicate, so the table's physical sort order decides how much of a
selective query's I/O is skipped. The two halves here:

- ``sort_for_skipping``: repartitionByRange(cols) + sortWithinPartitions
  — globally range-clustered files with tight, mostly non-overlapping
  per-row-group min/max on the sort columns. This is the Spark-native
  single-dimension layout step (the first column dominates; a Z-order
  would trade some single-column tightness for multi-column pruning).
  One range shuffle, no driver involvement beyond sampling the range
  boundaries.
- ``skipping_report``: reads only parquet FOOTERS (pyarrow metadata, no
  data pages) and answers "for these probe values, what fraction of row
  groups would a stats-pruning reader skip?" — the measurement that
  tells you whether a compaction/re-sort is worth the rewrite before
  paying for it.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _local(p: str) -> str:
    return p[len("file:") :] if p.startswith("file:") else p


def morton_key(cols: list[Column], bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` of each column —
    bit b of column i lands at position b*len(cols)+i. Pure Catalyst bit
    arithmetic (statically unrolled shift/mask/or tree, no UDF), exactly
    replayable in SQL. Inputs must be non-negative integers; values are
    masked to ``bits`` (callers with wide or skewed domains should map to
    rank/bucket space first — the standard Z-order preparation)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"morton_key: {n} cols x {bits} bits = {n * bits} interleaved "
            "bits > 63 — bit 63 is the sign bit and JVM shift counts wrap "
            "mod 64, so the curve would silently corrupt; lower bits "
            "(63 // n_cols is the max)"
        )
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + i))
    return out


def zorder_cluster(
    df: DataFrame, cols: list[str], bits: int = 16, n_files: int = 8
) -> DataFrame:
    """Cluster ``df`` on the Z-order curve of ``cols`` WITHOUT writing:
    range-partition + sort on the interleaved key, key dropped after (it
    is derivable; storing it would be pure bloat). The transform form
    exists so the same clustering can feed either a plain parquet write
    (``zorder_sort``) or a versioned-table rewrite commit
    (``snapshots.rewrite_table_layout`` — Iceberg's rewrite_data_files).

    Each column is min/max-scaled to the full ``bits`` width first (one
    broadcast 1-row aggregate) — raw interleave of mismatched domains
    degenerates: a column whose range needs 11 bits vs a neighbor's 8
    puts its top 3 bits ALONE at the top of every key, and the curve
    collapses to a linear sort on that column (measured: zero pruning on
    the narrower dimension). Scaling makes the interleave alternate
    meaningfully from the top bit down."""
    stats = df.agg(
        *[F.min(c).cast("bigint").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("bigint").alias(f"_hi_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
        span = max(1, (hi or 0) - (lo or 0))
        scaled.append(
            ((F.col(c).cast("bigint") - F.lit(lo)) * F.lit(top) / F.lit(span))
            .cast("bigint")
        )
    key = morton_key(scaled, bits)
    return (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def zorder_sort(
    df: DataFrame, path: str, cols: list[str], bits: int = 16, n_files: int = 8
) -> None:
    """Write ``df`` clustered on the Z-order curve of ``cols``
    (``zorder_cluster``), so row-group min/max stats are tight on EVERY
    participating column instead of only the leading one
    (sort_for_skipping's single-dimension limit). One range shuffle,
    same cost shape as the linear sort."""
    zorder_cluster(df, cols, bits, n_files).write.mode("overwrite").parquet(path)


def range_cluster(df: DataFrame, cols: list[str], n_files: int = 8) -> DataFrame:
    """Range-cluster ``df`` on ``cols`` without writing: each output
    partition owns a contiguous key range (boundaries sampled by the
    range partitioner), rows sorted within — the transform behind
    ``sort_for_skipping`` and the versioned-table rewrite commit."""
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def sort_for_skipping(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Write ``df`` range-clustered on ``cols``: each output file owns a
    contiguous key range, rows sorted within, so row-group stats on the
    leading column are tight and disjoint across files."""
    range_cluster(df, cols, n_files).write.mode("overwrite").parquet(path)


def skipping_report(spark, path: str, column: str, probes: list) -> dict:
    """Footer-only pruning estimate: for each probe value, count the row
    groups whose [min, max] range on ``column`` must be read. Returns
    totals plus the skipped fraction — 1 - reads/(probes*row_groups)."""
    import pyarrow.parquet as pq

    files = [
        _local(f) for f in spark.read.parquet(path).inputFiles()
    ]
    ranges = []
    unprunable = 0  # row groups without min/max stats: a pruning reader must read them
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                unprunable += 1
            else:
                ranges.append((st.min, st.max))
    n_groups = len(ranges) + unprunable
    reads = sum(
        1 for p in probes for lo, hi in ranges if lo <= p <= hi
    ) + len(probes) * unprunable
    total = len(probes) * n_groups
    return {
        "n_row_groups": n_groups,
        "n_unprunable": unprunable,
        "n_probes": len(probes),
        "row_groups_read": reads,
        "skipped_frac": (1 - reads / total) if total else 0.0,
    }
