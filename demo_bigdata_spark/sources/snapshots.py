"""Snapshot-versioned parquet tables: time travel, merge-on-read deletes,
rollback, and snapshot expiry — Iceberg's transactional core emulated on
plain parquet + an atomic pointer file.

[EXT over the sandbox constraint] The reference's sink is an Iceberg table
(reference: services/streaming-service/spark_config.py:50-53 — catalog
config; services/api-service/data_service.py:120-125 — snapshot-refreshed
reads), but no Iceberg jars exist in this environment (ROUND_NOTES fact 9).
This module supplies the SEMANTICS a user of that sink relies on, with the
same commit discipline Iceberg uses:

- **Data files are immutable and append-only** (content-addressed under
  ``data/``); a snapshot is a MANIFEST (parquet list of file paths + kinds)
  plus the ``_CURRENT`` pointer naming it.
- **Commit = write everything, then atomically swap the pointer**
  (``os.replace`` — atomic on POSIX). A crash before the swap leaves only
  unreferenced files; readers never observe a partial snapshot. This is the
  same commit-then-swap discipline as the epoch ledgers in
  streaming/pipeline.py, applied to whole-table versions.
- **Deletes are merge-on-read**: a delete writes a key file, not a rewrite
  — reads anti-join the accumulated delete keys (Iceberg's equality
  deletes). Old snapshots still see the rows: time travel is free because
  nothing is ever mutated.
- **Rollback** is a pointer swap; **expire_snapshots** drops manifests
  older than the retention and vacuums files no retained manifest
  references (Iceberg's expire_snapshots + remove_orphan_files).

Scale shape: manifests hold file PATHS (KBs per snapshot), never data; a
read plans ``spark.read.parquet(*files)`` so pushdown/pruning work as on
any parquet scan; the delete anti-join is keyed by the table key and
bounded by accumulated deletes (compaction folds them away — rewrite to a
fresh snapshot via ``append_snapshot(read_table(...), replace=True)``).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_CURRENT"


def _snap_dir(path: str) -> str:
    return os.path.join(path, "snapshots")


def _manifest_path(path: str, snap: int) -> str:
    return os.path.join(_snap_dir(path), f"{snap:08d}")


def current_snapshot(path: str) -> int | None:
    """The committed snapshot id, or None for an empty/uninitialized table."""
    try:
        with open(os.path.join(path, _POINTER)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _swap_pointer(path: str, snap: int) -> None:
    """Atomic commit: write the new pointer beside, then os.replace —
    readers see either the old snapshot or the new one, never a torn
    state."""
    tmp = os.path.join(path, _POINTER + f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(snap))
    os.replace(tmp, os.path.join(path, _POINTER))


def _write_files(df: DataFrame, path: str, kind: str) -> list[str]:
    """Write a frame as immutable content-addressed parquet files under
    ``path/<kind>/<uuid>/`` and return the directory (one entry — Spark
    writes many part files inside; the manifest tracks directories)."""
    d = os.path.join(path, kind, uuid.uuid4().hex)
    df.write.mode("error").parquet(d)
    return [d]


def _read_manifest(spark: SparkSession, path: str, snap: int) -> DataFrame:
    return spark.read.parquet(_manifest_path(path, snap))


def _commit(
    spark: SparkSession,
    path: str,
    snap: int,
    entries: list[tuple[str, str, int]],
) -> None:
    """Write the manifest then atomically swap the pointer. Every manifest
    carries an ``epoch_id`` per file (-1 for batch commits) so streaming
    idempotence checks and batch operations share ONE schema — a batch
    delete on a stream-written table must not strip the epoch column the
    next micro-batch's applied-check reads. Each entry also records its
    ``seq`` — its position in the commit order — because parquet reads do
    not preserve row order and the delete-application rule (a delete file
    applies only to data files with a SMALLER seq) depends on it."""
    seqd = [(f, k, e, i) for i, (f, k, e) in enumerate(entries)]
    # OVERWRITE, not error: a crash between this write and the pointer
    # swap (or a rollback to an earlier snapshot) leaves a stale,
    # unreferenced manifest at the target id — the redo must replace it,
    # otherwise the table is permanently wedged on 'path already exists'
    spark.createDataFrame(
        seqd, "file string, kind string, epoch_id long, seq int"
    ).coalesce(1).write.mode("overwrite").parquet(_manifest_path(path, snap))
    _swap_pointer(path, snap)


def _manifest_entries(
    spark: SparkSession, path: str, snap: int
) -> list[tuple[str, str, int]]:
    rows = sorted(
        _read_manifest(spark, path, snap).collect(), key=lambda r: r["seq"]
    )
    return [(r["file"], r["kind"], int(r["epoch_id"])) for r in rows]


def create_table(spark: SparkSession, path: str, df: DataFrame) -> int:
    """Initialize a versioned table with snapshot 1 holding ``df``."""
    os.makedirs(path, exist_ok=True)
    if current_snapshot(path) is not None:
        raise ValueError(f"versioned table already exists at {path}")
    files = _write_files(df, path, "data")
    _commit(spark, path, 1, [(f, "data", -1) for f in files])
    return 1


def append_snapshot(
    spark: SparkSession, path: str, df: DataFrame, replace: bool = False
) -> int:
    """Commit a new snapshot: previous data + delete files carry forward
    and ``df``'s new files join them. ``replace=True`` starts the manifest
    empty instead — the compaction path that folds merge-on-read deletes
    away (pass ``read_table(spark, path)`` as ``df``)."""
    cur = current_snapshot(path)
    if cur is None:
        return create_table(spark, path, df)
    if replace:
        # epoch markers carry the applied-epoch set through compaction:
        # the rewritten files are epoch -1, but a restarting stream's
        # applied-check reads the CURRENT manifest — dropping the epoch
        # history here would make it re-append the last batches
        applied = sorted(
            {
                e
                for _, _, e in _manifest_entries(spark, path, cur)
                if e >= 0
            }
        )
        prev = [("", "epoch_marker", e) for e in applied]
    else:
        prev = _manifest_entries(spark, path, cur)
    files = _write_files(df, path, "data")
    _commit(spark, path, cur + 1, prev + [(f, "data", -1) for f in files])
    return cur + 1


def delete_where(
    spark: SparkSession, path: str, key_col: str, condition
) -> int:
    """Merge-on-read delete: evaluate ``condition`` against the CURRENT
    table, persist the matching keys as a delete file, commit a snapshot
    whose reads anti-join them. No data file is touched — old snapshots
    still contain the rows (time travel), and the write cost is the
    matched-key set, not a rewrite."""
    cur = current_snapshot(path)
    if cur is None:
        raise ValueError(f"no versioned table at {path}")
    keys = read_table(spark, path).filter(condition).select(key_col).distinct()
    prev = _manifest_entries(spark, path, cur)
    files = _write_files(keys, path, "deletes")
    _commit(spark, path, cur + 1, prev + [(f, "delete", -1) for f in files])
    return cur + 1


def upsert_snapshot(
    spark: SparkSession, path: str, df: DataFrame, key_col: str
) -> int:
    """MERGE INTO semantics in ONE commit: ``df``'s rows replace any
    existing rows with the same key and insert the rest — implemented as
    a delete-keys file (``df``'s keys) plus a data file (``df`` itself)
    committed in a single manifest + pointer swap, so readers see the
    upsert atomically and never a deleted-but-not-reinserted window.

    Merge-on-read all the way down: no existing file is rewritten, the
    previous snapshot still shows the old rows. Within one snapshot the
    delete keys must not suppress the NEW rows — read_table applies
    delete files only to data files from EARLIER manifest positions
    (Iceberg's sequence-number rule, emulated with the manifest row
    order)."""
    cur = current_snapshot(path)
    if cur is None:
        return create_table(spark, path, df)
    keys = df.select(key_col).distinct()
    prev = _manifest_entries(spark, path, cur)
    dfiles = _write_files(keys, path, "deletes")
    afiles = _write_files(df, path, "data")
    _commit(
        spark,
        path,
        cur + 1,
        prev
        + [(f, "delete", -1) for f in dfiles]
        + [(f, "data", -1) for f in afiles],
    )
    return cur + 1


def read_table(
    spark: SparkSession,
    path: str,
    snapshot: int | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Read the table AS OF ``snapshot`` (default: current). Data files
    union under one parquet scan (pushdown/pruning intact); delete keys
    anti-join on ``key_col`` (inferred from the delete files' single
    column when not given). Reading a historical snapshot costs the same
    as reading the current one — nothing is reconstructed."""
    snap = current_snapshot(path) if snapshot is None else int(snapshot)
    if snap is None:
        raise ValueError(f"no versioned table at {path}")
    entries = sorted(
        _read_manifest(spark, path, snap).collect(), key=lambda r: r["seq"]
    )
    data = [(r["file"], r["seq"]) for r in entries if r["kind"] == "data"]
    dels = [(r["file"], r["seq"]) for r in entries if r["kind"] == "delete"]
    # kind == "epoch_marker" rows carry stream idempotence state only
    if not dels:
        # mergeSchema: snapshots may span a schema evolution (an append
        # with a widened schema is just new data files) — the union schema
        # with nulls for pre-evolution rows; old snapshots keep their
        # narrower schema untouched
        return spark.read.option("mergeSchema", "true").parquet(
            *[f for f, _ in data]
        )
    # the sequence rule (Iceberg's): a delete file suppresses rows only in
    # data files committed BEFORE it — an upsert's own rows must survive
    # its own delete keys. Data files sharing the same applicable-delete
    # set scan together; the group count is bounded by the delete-file
    # count (compaction via append_snapshot(replace=True) resets both).
    out = None
    groups: dict[tuple, list[str]] = {}
    for f, seq in data:
        applicable = tuple(df_ for df_, ds in dels if ds > seq)
        groups.setdefault(applicable, []).append(f)
    for applicable, files in groups.items():
        part = spark.read.option("mergeSchema", "true").parquet(*files)
        # delete files may be keyed by DIFFERENT columns (delete_where on
        # doc_id, then on lang): group them by key column and anti-join
        # once per column — one mixed-schema scan would null out every
        # file's missing column and silently stop deleting
        by_col: dict[str, list[str]] = {}
        for d in applicable:
            cols = spark.read.parquet(d).columns
            kc = key_col if (key_col and key_col in cols) else cols[0]
            by_col.setdefault(kc, []).append(d)
        for kc, dirs in by_col.items():
            keys = spark.read.parquet(*dirs)
            part = part.join(keys.select(kc).distinct(), kc, "left_anti")
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    return out


def read_appends_since(
    spark: SparkSession, path: str, since_snapshot: int, snapshot: int | None = None
) -> DataFrame:
    """Incremental consumption: rows in data files ADDED after
    ``since_snapshot`` (exclusive) up to ``snapshot`` (default current) —
    a file-level diff of the two manifests, so the read cost is the new
    files only, never the table. The downstream-ETL primitive Iceberg
    calls an incremental scan: consumers checkpoint the snapshot id they
    last processed and poll. Exact for append-only flows; merge-on-read
    deletes that landed in the window affect the CURRENT view, not what
    was appended (query read_table for the net state)."""
    hi = current_snapshot(path) if snapshot is None else int(snapshot)
    if hi is None:
        raise ValueError(f"no versioned table at {path}")
    old = {
        r["file"]
        for r in _read_manifest(spark, path, since_snapshot).collect()
        if r["kind"] == "data"
    }
    hi_rows = sorted(
        _read_manifest(spark, path, hi).collect(), key=lambda r: r["seq"]
    )
    hi_data = [r["file"] for r in hi_rows if r["kind"] == "data"]
    new = [f for f in hi_data if f not in old]
    if old and hi_data and not (old & set(hi_data)):
        # a replace-compaction rewrote history between the checkpoints:
        # every "new" file would actually re-deliver old rows. Refuse
        # loudly — the consumer must re-baseline from a full read_table
        # (or poll across compactions, which preserve no file lineage).
        raise ValueError(
            f"read_appends_since({since_snapshot}->{hi}): no data file "
            "survives from the base snapshot — the window spans a "
            "replace-compaction; re-baseline with read_table"
        )
    if not new:
        # empty window: borrow the NEWEST file's schema (a pre-evolution
        # file would intermittently drop evolved columns)
        src = hi_data[-1:] or sorted(old)[-1:]
        return spark.read.option("mergeSchema", "true").parquet(*src).limit(0)
    return spark.read.option("mergeSchema", "true").parquet(*new)


def snapshot_diff(
    spark: SparkSession,
    path: str,
    from_snapshot: int,
    to_snapshot: int,
    key_col: str,
) -> DataFrame:
    """Row-level change-data-capture between two snapshots: each key's
    state compared across the two committed views — ``insert`` (new key),
    ``delete`` (gone key), ``update`` (same key, changed row content via a
    sha2 digest of the non-key columns). Cost is two committed reads +
    one full-outer join keyed by ``key_col``; for the common append-only
    window the cheaper :func:`read_appends_since` answers from the file
    diff without touching history."""
    ta = read_table(spark, path, from_snapshot)
    tb = read_table(spark, path, to_snapshot)

    def digest(df):
        others = sorted(c for c in df.columns if c != key_col)
        return df.select(
            F.col(key_col),
            F.sha2(F.to_json(F.struct(*[F.col(c) for c in others])), 256).alias(
                "_h"
            ),
        )

    a = digest(ta).withColumnRenamed("_h", "_ha")
    b = digest(tb).withColumnRenamed("_h", "_hb")
    j = a.join(b, key_col, "full_outer")
    return j.select(
        key_col,
        F.when(F.col("_ha").isNull(), F.lit("insert"))
        .when(F.col("_hb").isNull(), F.lit("delete"))
        .when(F.col("_ha") != F.col("_hb"), F.lit("update"))
        .alias("change"),
    ).filter(F.col("change").isNotNull())


def rollback(path: str, snapshot: int) -> None:
    """Point the table back at an earlier committed snapshot — a pointer
    swap, nothing rewritten; later snapshots stay readable by id until
    expired."""
    if not os.path.exists(_manifest_path(path, snapshot)):
        raise ValueError(f"snapshot {snapshot} does not exist at {path}")
    _swap_pointer(path, snapshot)


def expire_snapshots(
    spark: SparkSession, path: str, keep_last: int = 1
) -> dict:
    """Drop manifests older than the last ``keep_last`` (current snapshot
    always retained) and VACUUM files no retained manifest references —
    crash-window orphans (written but never committed) go with them.
    Returns counts. Time travel beyond the retention is gone; that is the
    point (storage reclamation)."""
    import shutil

    cur = current_snapshot(path)
    if cur is None:
        return {"snapshots_removed": 0, "files_removed": 0}
    snaps = sorted(
        int(d) for d in os.listdir(_snap_dir(path)) if d.isdigit()
    )
    # max(1, ..): keep_last=0 would slice [-0:] == the WHOLE list and
    # silently retain everything; the current snapshot is the floor
    keep = set(snaps[-max(1, keep_last):]) | {cur}
    referenced: set[str] = set()
    for snap in keep:
        for r in _read_manifest(spark, path, snap).collect():
            referenced.add(r["file"])
    removed_snaps = 0
    for snap in snaps:
        if snap not in keep:
            shutil.rmtree(_manifest_path(path, snap))
            removed_snaps += 1
    removed_files = 0
    for kind in ("data", "deletes"):
        base = os.path.join(path, kind)
        if not os.path.isdir(base):
            continue
        for d in os.listdir(base):
            full = os.path.join(base, d)
            if full not in referenced:
                shutil.rmtree(full)
                removed_files += 1
    return {"snapshots_removed": removed_snaps, "files_removed": removed_files}


def append_snapshot_epoch(
    spark: SparkSession, path: str, batch_df: DataFrame, epoch_id: int
) -> int | None:
    """Exactly-once streaming append into the versioned table: one
    SNAPSHOT per micro-batch, idempotent per ``epoch_id`` (the reference's
    stream->Iceberg sink with real commit semantics). The applied-check
    reads the CURRENT manifest's epoch column — the manifest-behind-the-
    pointer is the single source of truth, so there is no second ledger
    that could disagree with it. The pointer swap is the atomic commit:
    a crash anywhere before it leaves the previous snapshot current and
    the replay redoes the batch with identical content; the first
    attempt's unreferenced files are vacuumed by expire_snapshots."""
    cur = current_snapshot(path)
    if cur is not None:
        applied = (
            _read_manifest(spark, path, cur)
            .filter(F.col("epoch_id") == int(epoch_id))
            .head(1)
        )
        if applied:
            return None
    os.makedirs(path, exist_ok=True)
    files = _write_files(batch_df, path, "data")
    prev = [] if cur is None else _manifest_entries(spark, path, cur)
    snap = 1 if cur is None else cur + 1
    _commit(
        spark, path, snap, prev + [(f, "data", int(epoch_id)) for f in files]
    )
    return snap


def write_stream_to_versioned(
    df: DataFrame, path: str, checkpoint: str, trigger_seconds: int = 2
):
    """[EXT] the reference's streaming sink with transactional semantics:
    every micro-batch commits one snapshot of the versioned table
    (append_snapshot_epoch — idempotent under foreachBatch's at-least-once
    replay). Readers always see a committed snapshot; history/rollback/
    time travel work on the live table."""
    spark = df.sparkSession

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        append_snapshot_epoch(spark, path, batch_df, epoch_id)

    return (
        df.writeStream.outputMode("append")
        .foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def snapshot_history(spark: SparkSession, path: str) -> list[dict]:
    """Table history: per retained snapshot, its file counts by kind —
    the DESCRIBE HISTORY analog."""
    out = []
    for d in sorted(os.listdir(_snap_dir(path))):
        if not d.isdigit():
            continue
        m = _read_manifest(spark, path, int(d))
        counts = {
            r["kind"]: r["n"]
            for r in m.groupBy("kind").agg(F.count("*").alias("n")).collect()
        }
        out.append({"snapshot": int(d), **counts})
    return out
