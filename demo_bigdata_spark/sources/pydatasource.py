"""Custom Python Data Source (Spark 4 API): GitHub-event NDJSON replay.

The reference feeds the engine with an out-of-process poller (GitHub REST ->
Kafka producer, services/producer-service/github/client.py:33-88 +
kafka_io/producer.py:18-90). Its engine-visible contract is just "a stream
of raw JSON event lines in arrival order" — this module re-expresses that
contract as a first-class Spark source via the Python Data Source API, so
`spark.read.format("github_replay")` / `readStream.format("github_replay")`
replay captured NDJSON deterministically with no Kafka dependency.

- Batch: one InputPartition per file — executors open their own file, the
  driver ships only paths. Parallelism unit = file, same posture as
  binaryFile (shard captures into many files).
- Streaming: SimpleDataSourceStreamReader paces ``batch_size`` lines per
  micro-batch from a single capture file (the reference's
  MAX_EVENTS_PER_FETCH truncation, client.py:69-74); offsets are plain line
  positions, so readBetweenOffsets replays any window exactly (the
  at-least-once recovery contract foreachBatch sinks expect).

Rows are (replay_seq bigint, raw_json string) — raw lines feed
operators/ingest.py unchanged, exactly like the Kafka value column (P1).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

REPLAY_SCHEMA = "replay_seq bigint, raw_json string"


class _FilePartition(InputPartition):
    def __init__(self, path: str, seq_base: int):
        self.path = path
        self.seq_base = seq_base


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def _files(self):
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".ndjson", ".jsonl", ".json"))
            )
        return [self.path]

    def partitions(self):
        parts, base = [], 0
        for f in self._files():
            parts.append(_FilePartition(f, base))
            # seq ranges per file don't overlap: pre-count lines driver-side.
            # Count NON-BLANK lines only — the one convention shared with the
            # stream reader (_lines), so the same physical line always gets
            # the same replay_seq in batch and streaming replays.
            with open(f, "rb") as fh:
                base += sum(1 for ln in fh if ln.strip())
        return parts

    def read(self, partition: _FilePartition):
        seq = partition.seq_base
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.strip():
                    yield (seq, line)
                    seq += 1


class _ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self.batch_size = int(options.get("batch_size", "100"))

    def initialOffset(self):
        return {"pos": 0}

    def _lines(self):
        with open(self.path, encoding="utf-8") as fh:
            return [ln.rstrip("\n") for ln in fh if ln.strip()]

    def read(self, start: dict):
        lines = self._lines()
        pos = start["pos"]
        nxt = min(pos + self.batch_size, len(lines))
        rows = [(i, lines[i]) for i in range(pos, nxt)]
        return iter(rows), {"pos": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        lines = self._lines()
        return iter((i, lines[i]) for i in range(start["pos"], end["pos"]))


class _NdjsonCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class _ReplayWriter(DataSourceWriter):
    """NDJSON sink — the engine-side analog of the reference's Kafka
    producer (S9: per-event send with acks=all + flush,
    kafka_io/producer.py:18-90). Each task writes a temp file; commit()
    renames all temp files into place atomically-enough for a local FS and
    drops a _SUCCESS marker, so a failed/speculated task (abort()) leaves
    nothing visible — the same task-commit contract the Kafka sink gets
    from acks+idempotence."""

    def __init__(self, options, schema):
        self.path = options["path"]
        self.field_names = schema.fieldNames()

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}.ndjson")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                if "raw_json" in self.field_names:
                    fh.write(row["raw_json"] + "\n")
                else:
                    fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _NdjsonCommit(tmp, n)

    def commit(self, messages):
        for m in messages:
            if m is not None:
                # rename the BASENAME only — a substring replace on the full
                # path would also rewrite any "_tmp_" in a directory component
                d, b = os.path.split(m.tmp_path)
                os.rename(m.tmp_path, os.path.join(d, b.replace("_tmp_", "part_", 1)))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(sum(m.rows for m in messages if m is not None)))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class GithubReplayDataSource(DataSource):
    """``spark.read.format("github_replay").option("path", ...)``."""

    @classmethod
    def name(cls):
        return "github_replay"

    def schema(self):
        return REPLAY_SCHEMA

    def reader(self, schema):
        return _ReplayBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _ReplayStreamReader(self.options)

    def writer(self, schema, overwrite):
        return _ReplayWriter(self.options, schema)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(GithubReplayDataSource)
