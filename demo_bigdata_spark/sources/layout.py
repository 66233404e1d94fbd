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

from pyspark.sql import DataFrame


def _local(p: str) -> str:
    return p[len("file:") :] if p.startswith("file:") else p


def sort_for_skipping(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Write ``df`` range-clustered on ``cols``: each output file owns a
    contiguous key range (boundaries sampled by the range partitioner),
    rows sorted within, so row-group stats on the leading column are
    tight and disjoint across files."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


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
