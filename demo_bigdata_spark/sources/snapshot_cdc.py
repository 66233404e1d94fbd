"""Streaming source over the snapshot-versioned table: consume COMMITS.

[EXT] Iceberg exposes its tables as a Structured Streaming source (each
micro-batch = the data files appended by a window of snapshots); with no
Iceberg jars in the sandbox (ROUND_NOTES fact 9), this module supplies the
same contract over :mod:`demo_bigdata_spark.sources.snapshots` via the
Spark 4 Python Data Source API — so a downstream pipeline subscribes to a
versioned table with ``spark.readStream.format("snapshot_appends")``
instead of hand-rolling the checkpoint-and-poll loop around
``read_appends_since``.

Execution shape (the part that matters at 100 TB):

- **Offsets are snapshot ids** — the manifest diff between two offsets
  names exactly the parquet part-files appended in the window, so a batch
  plans O(new files), never O(table).
- **Partition-based reader, not the driver-collect Simple API**: the
  driver touches only MANIFESTS (KB-scale, read with pyarrow); each new
  part-file becomes one ``InputPartition`` and EXECUTORS open their own
  parquet file. Data never flows through the driver.
- **Rate limiting**: ``max_snapshots_per_trigger`` caps how many commits a
  single micro-batch swallows (Kafka's maxOffsetsPerTrigger analog), so a
  consumer catching up on a long-lived table advances in bounded steps,
  checkpointing progress after each.
- **Replace-compaction fencing**: a window that spans an
  ``append_snapshot(replace=True)`` rewrite has no file lineage — the
  reader fails loudly with the same re-baseline message as
  ``read_appends_since`` instead of silently re-delivering rewritten
  history.

At-least-once into idempotent sinks = exactly-once end-to-end: offsets are
committed by Spark's own checkpoint after the batch lands, so a crash
replays the same snapshot window with identical file contents (immutable
files), and the epoch-ledger sinks elsewhere in this repo deduplicate.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from demo_bigdata_spark.sources.snapshots import (
    _manifest_path,
    current_snapshot,
)


def _manifest_files(path: str, snap: int) -> list[tuple[str, int]]:
    """(data_dir, seq) entries of a manifest, read with pyarrow only — the
    Data Source API runs outside any SparkSession."""
    if snap <= 0:
        return []
    import pyarrow.parquet as pq

    t = pq.read_table(
        _manifest_path(path, snap), columns=["file", "kind", "seq"]
    ).to_pylist()
    return sorted(
        (r["file"], r["seq"]) for r in t if r["kind"] == "data"
    )


def _part_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def _new_part_files(path: str, start_snap: int, end_snap: int) -> list[str]:
    old = {f for f, _ in _manifest_files(path, start_snap)}
    new_entries = _manifest_files(path, end_snap)
    if old and new_entries and not (old & {f for f, _ in new_entries}):
        raise ValueError(
            f"snapshot_appends({start_snap}->{end_snap}): no data file "
            "survives from the base snapshot — the window spans a "
            "replace-compaction; re-baseline the consumer with read_table"
        )
    out: list[str] = []
    for d, _ in new_entries:
        if d not in old:
            out.extend(_part_files(d))
    return out


_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "halffloat": "float",
    "double": "double",
    "bool": "boolean",
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _arrow_field_ddl(t) -> str:
    s = str(t)
    if s in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[s]
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("decimal"):
        return s.replace("decimal128", "decimal").replace("decimal64", "decimal")
    if s.startswith(("list<", "large_list<")):
        import pyarrow as pa

        assert isinstance(t, (pa.ListType, pa.LargeListType))
        return f"array<{_arrow_field_ddl(t.value_type)}>"
    raise ValueError(
        f"snapshot_appends: unsupported arrow type {s}; pass an explicit "
        ".schema(...) on the reader"
    )


def _infer_ddl(path: str) -> str:
    """Schema = the NEWEST data file's parquet schema (schema evolution
    widens forward, so the newest file carries the union the stream should
    emit)."""
    import pyarrow.parquet as pq

    snap = current_snapshot(path)
    if snap is None:
        raise ValueError(f"no versioned table at {path}")
    entries = _manifest_files(path, snap)
    if not entries:
        raise ValueError(f"versioned table at {path} has no data files")
    newest = max(entries, key=lambda e: e[1])[0]
    sch = pq.read_schema(_part_files(newest)[0])
    return ", ".join(
        f"`{name}` {_arrow_field_ddl(sch.field(name).type)}"
        for name in sch.names
    )


class _SnapshotFilePartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


class _SnapshotAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, options, field_names):
        self.path = options["path"]
        self.max_snaps = int(options.get("max_snapshots_per_trigger", "10"))
        start = options.get("start_snapshot")
        # default: deliver the whole committed table as the first batch
        # (Iceberg's stream-from-table default); start_snapshot=N skips
        # snapshots <= N (the "subscribe from here" checkpoint seed)
        self._floor = int(start) if start is not None else 0
        self._last: int | None = None  # last offset THIS reader returned
        self.field_names = field_names

    def initialOffset(self):
        return {"snap": self._floor}

    def latestOffset(self):
        cur = current_snapshot(self.path) or 0
        base = self._last if self._last is not None else self._floor
        # rate limit: at most max_snaps commits per micro-batch. After a
        # restart self._last is None and the first batch spans from the
        # CHECKPOINTED offset (Spark passes it to partitions()), so the
        # cap here only throttles forward progress, never correctness.
        nxt = min(cur, base + self.max_snaps) if cur > base else base
        self._last = max(base, nxt)
        return {"snap": self._last}

    def partitions(self, start: dict, end: dict):
        files = _new_part_files(self.path, start["snap"], end["snap"])
        self._last = max(self._last or 0, end["snap"])
        return [_SnapshotFilePartition(f) for f in files]

    def read(self, partition: _SnapshotFilePartition):
        # executor-side: open ONLY this part-file with pyarrow, yield rows
        # in declared field order (absent columns -> None: pre-evolution
        # files under a widened schema)
        import pyarrow.parquet as pq

        t = pq.read_table(partition.file)
        cols = set(t.schema.names)
        for rec in t.to_pylist():
            yield tuple(
                rec[n] if n in cols else None for n in self.field_names
            )

    def commit(self, end: dict):
        pass  # progress lives in Spark's checkpoint; nothing table-side


class SnapshotAppendsDataSource(DataSource):
    """``spark.readStream.format("snapshot_appends").option("path", ...)``
    — the versioned table as a streaming source of committed appends."""

    @classmethod
    def name(cls):
        return "snapshot_appends"

    def schema(self):
        return _infer_ddl(self.options["path"])

    def streamReader(self, schema):
        return _SnapshotAppendsStreamReader(self.options, schema.fieldNames())


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SnapshotAppendsDataSource)


def read_snapshot_stream(
    spark,
    path: str,
    start_snapshot: int | None = None,
    max_snapshots_per_trigger: int = 10,
):
    """Convenience: the versioned table at ``path`` as a streaming
    DataFrame of committed appends."""
    register(spark)
    r = (
        spark.readStream.format("snapshot_appends")
        .option("path", path)
        .option("max_snapshots_per_trigger", str(max_snapshots_per_trigger))
    )
    if start_snapshot is not None:
        r = r.option("start_snapshot", str(start_snapshot))
    return r.load()
