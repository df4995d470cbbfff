"""Snapshot-versioned parquet tables — the Iceberg COMMIT SEMANTICS the
north rule names, implemented over plain parquet + JSON manifests because
the sandbox image carries no iceberg-spark-runtime jar (re-probed every
round; BENCH/BASELINE.md "Iceberg sink status"). When the jar exists,
every call site swaps to `.format("iceberg")` and this module retires;
until then it provides the semantics users of an Iceberg sink actually
rely on, each with the same contract:

- **atomic commit**: data files land in a staging dir, then ONE manifest
  file (the commit point) is created with ``O_CREAT|O_EXCL`` and the
  ``CURRENT`` pointer is swapped by ``os.rename`` — readers see the old
  version or the new one, never a half-written mix (Iceberg's
  root-pointer swap; same rename-swap primitive as
  ``compaction._swap_dirs``).
- **optimistic concurrency**: the manifest's version number is the lock.
  Two writers racing to commit version N+1 both try to exclusively
  create ``v000N+1.json``; the loser gets :class:`CommitConflict`
  (Iceberg's CAS on the catalog pointer).
- **time travel**: ``read_snapshot(..., version=)`` / ``as_of_ts=`` read
  the exact file list a past manifest pinned.
- **rollback**: a NEW version whose file list is an old version's —
  history is append-only, like ``rollback_to_snapshot``.
- **expiry**: ``expire_snapshots`` drops old manifests and
  garbage-collects data files no surviving manifest references.

Scale shape: manifests are O(files) JSON — the listing a 1000-executor
read plans from without a directory scan; data files are written by
executors in parallel (one ``df.write`` per commit), and a read is an
explicit-path parquet scan (partition pruning and column pruning apply
as usual). Single-table, filesystem-atomic (POSIX rename) — the
documented stand-in scope.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic-lock loss).
    Retry: re-read the current version and re-commit on top of it."""


@dataclass
class Snapshot:
    version: int
    ts: float
    operation: str
    files: list
    rows: int
    parent: int | None
    batch_id: int | None = None
    schema_json: str | None = None


def _snap_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_snap_dir(path), f"v{version:06d}.json")


def _current_path(path: str) -> str:
    return os.path.join(_snap_dir(path), "CURRENT")


def current_version(path: str) -> int | None:
    """The committed version, or None for an empty/uninitialized table."""
    try:
        with open(_current_path(path)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def _load_manifest(path: str, version: int) -> Snapshot:
    try:
        with open(_manifest_path(path, version)) as fh:
            d = json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"snapshot v{version} of {path} does not exist (expired or "
            "never committed)"
        ) from None
    return Snapshot(
        version=d["version"], ts=d["ts"], operation=d["operation"],
        files=d["files"], rows=d["rows"], parent=d.get("parent"),
        batch_id=d.get("batch_id"), schema_json=d.get("schema"),
    )


def _schema_key(schema_json: str):
    """Name+type structural key for schema comparison: nullability and
    field metadata are stripped recursively (Iceberg-style by-name/type
    check — a non-nullable frame writes fine into a nullable table; exact
    JSON equality would reject it)."""
    def strip(node):
        if isinstance(node, dict):
            return {k: strip(v) for k, v in node.items()
                    if k not in ("nullable", "metadata", "containsNull",
                                 "valueContainsNull")}
        if isinstance(node, list):
            return [strip(v) for v in node]
        return node

    return json.dumps(strip(json.loads(schema_json)), sort_keys=True)


def _commit_manifest(path: str, new_version: int, manifest: dict) -> Snapshot:
    """The commit point, shared by every write path: exclusive-create the
    manifest (optimistic lock), then swap CURRENT via rename (atomic on
    POSIX)."""
    try:
        fd = os.open(_manifest_path(path, new_version),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise CommitConflict(
            f"version v{new_version} of {path} was committed concurrently"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    tmp = _current_path(path) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        fh.write(str(new_version))
    os.rename(tmp, _current_path(path))
    return _load_manifest(path, new_version)


def _stage_files(df: DataFrame, path: str, new_version: int):
    """Write ``df``'s parquet files under data/ with a commit-local prefix;
    returns (relative paths, total rows). A failed commit leaves only
    unreferenced files for expiry."""
    import pyarrow.parquet as pq

    stage = os.path.join(path, f"_stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    prefix = f"c{new_version:06d}-{uuid.uuid4().hex[:8]}"
    new_files, rows = [], 0
    for i, name in enumerate(sorted(os.listdir(stage))):
        if not name.endswith(".parquet"):
            continue
        rel = os.path.join("data", f"{prefix}-{i:05d}.parquet")
        os.rename(os.path.join(stage, name), os.path.join(path, rel))
        rows += pq.read_metadata(os.path.join(path, rel)).num_rows
        new_files.append(rel)
    shutil.rmtree(stage, ignore_errors=True)
    return new_files, rows


def commit(
    df: DataFrame,
    path: str,
    mode: str = "append",
    expected_version: int | None = ...,
    batch_id: int | None = None,
) -> Snapshot:
    """Write ``df`` as the next snapshot of the table at ``path``.

    ``mode="append"`` adds the new files to the current file list;
    ``"overwrite"`` replaces it. ``expected_version`` (optional) asserts
    the version this commit builds on — pass the version you read to get
    compare-and-swap semantics across a read-modify-write; by default the
    commit builds on whatever is current (blind append, Iceberg's
    fast-append). Raises :class:`CommitConflict` when the next version's
    manifest already exists (a racing writer won).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_snap_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)

    cur = current_version(path)
    if expected_version is not ... and expected_version != cur:
        raise CommitConflict(
            f"table moved: expected v{expected_version}, current is v{cur}")
    # schema enforcement (Iceberg writes are schema-checked): an append
    # must match the table's current schema exactly — silently unioning
    # mismatched parquet files would surface as nulls/corruption at read
    # time. Overwrite SETS a new schema (the evolution path: rewrite with
    # the new shape; per-version schemas make old snapshots read with
    # their own schema).
    if mode == "append" and cur is not None:
        prev = _load_manifest(path, cur)
        if prev.schema_json is not None and \
                _schema_key(prev.schema_json) != _schema_key(df.schema.json()):
            raise ValueError(
                f"append schema mismatch vs v{cur} of {path}: table has "
                f"{prev.schema_json} but frame has {df.schema.json()} — "
                "overwrite to change the schema"
            )

    new_version = (cur or 0) + 1
    new_files, rows = _stage_files(df, path, new_version)

    base = [] if mode == "overwrite" or cur is None else \
        _load_manifest(path, cur).files
    base_rows = 0 if mode == "overwrite" or cur is None else \
        _load_manifest(path, cur).rows
    manifest = {
        "version": new_version,
        "ts": time.time(),
        "operation": mode,
        "files": base + new_files,
        "rows": base_rows + rows,
        "parent": cur,
        "batch_id": batch_id,
        "schema": df.schema.json(),
    }
    return _commit_manifest(path, new_version, manifest)


def commit_stream_batch(
    df: DataFrame,
    path: str,
    batch_id: int,
    mode: str = "append",
) -> Snapshot | None:
    """Idempotent micro-batch commit — the Iceberg exactly-once
    ``foreachBatch`` recipe: micro-batch ids are monotone, so a batch
    whose id is ≤ the table's highest committed ``batch_id`` is a RETRY
    REPLAY of work that already landed, and the commit no-ops (returns
    None). Structured Streaming re-runs a failed batch with the same id
    after restart; with a plain parquet append that double-appends
    (at-least-once) — with this gate the routed sink is exactly-once.

    The check reads the manifest history (O(versions) tiny JSONs), not
    the data."""
    committed = [s.batch_id for s in snapshots(path)
                 if s.batch_id is not None]
    if committed and batch_id <= max(committed):
        return None
    return commit(df, path, mode=mode, batch_id=batch_id)


def snapshots(path: str) -> list:
    """Committed history, oldest first (expired versions absent)."""
    try:
        names = sorted(os.listdir(_snap_dir(path)))
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith("v") and n.endswith(".json"):
            out.append(_load_manifest(path, int(n[1:-5])))
    return out


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    as_of_ts: float | None = None,
) -> DataFrame:
    """Read the table as of a version (time travel). Default: current.
    ``as_of_ts`` resolves to the latest snapshot committed at or before
    that timestamp."""
    if version is not None and as_of_ts is not None:
        raise ValueError("pass version OR as_of_ts, not both")
    if as_of_ts is not None:
        eligible = [s for s in snapshots(path) if s.ts <= as_of_ts]
        if not eligible:
            raise ValueError(f"no snapshot of {path} at or before {as_of_ts}")
        version = eligible[-1].version
    if version is None:
        version = current_version(path)
        if version is None:
            raise ValueError(f"{path} has no committed snapshots")
    snap = _load_manifest(path, version)
    if not snap.files:
        # empty snapshot: typed-empty read from the pinned schema
        if snap.schema_json is None:
            raise ValueError(
                f"snapshot v{version} of {path} lists no files and pins "
                "no schema")
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(snap.schema_json)))
    return spark.read.parquet(*[os.path.join(path, f) for f in snap.files])


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_col: str,
    max_keys: int = 1_000_000,
) -> Snapshot:
    """Copy-on-write MERGE INTO (upsert by key) as a NEW snapshot — the
    last leg of the lakehouse DML triad (append/overwrite = commit,
    DELETE = compaction.delete_ids, MERGE = here): rows of the current
    snapshot whose ``key_col`` matches an update row are replaced, all
    other update rows are inserted, and every untouched data file is
    carried into the new manifest BY REFERENCE — never read, never
    rewritten (the tests assert byte-identity; time travel still sees the
    pre-merge rows through the old manifest).

    File pruning mirrors ``delete_ids``: each listed file's parquet
    footer [min, max] for ``key_col`` is checked driver-side against the
    sorted update-key list; only intersecting files are re-read,
    anti-filtered (NULL keys kept — a merge must never drop un-addressed
    rows), and rewritten together with the updates as new data files.
    On a by-key-clustered table a narrow upsert touches one file.

    Update keys are collected driver-side under ``max_keys`` (the
    bounded-collect guard pattern); beyond that, batch the merge. NULL
    update keys match nothing and insert as plain rows.

    Raises :class:`CommitConflict` under the same optimistic lock as
    every other commit; append-shape schema enforcement applies."""
    import bisect

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    cur = current_version(path)
    if cur is None:
        return commit(updates, path, mode="append")
    snap = _load_manifest(path, cur)
    if snap.schema_json is not None and \
            _schema_key(snap.schema_json) != \
            _schema_key(updates.schema.json()):
        raise ValueError(
            f"merge schema mismatch vs v{cur} of {path} — updates must "
            "match the table schema exactly")
    key_rows = (
        updates.select(key_col).where(F.col(key_col).isNotNull())
        .distinct().limit(max_keys + 1).collect()
    )
    if len(key_rows) > max_keys:
        raise ValueError(
            f"merge_upsert requires a bounded update-key set (> {max_keys} "
            "distinct keys) — batch the merge")
    keys = sorted(r[key_col] for r in key_rows)

    untouched, touched, untouched_rows = [], [], 0
    for rel in snap.files:
        fpath = os.path.join(path, rel)
        md = pq.ParquetFile(fpath).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = hi = None
        if key_col in idx and keys:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[key_col]).statistics
                if st is None or not st.has_min_max:
                    lo = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            left = bisect.bisect_left(keys, lo)
            if left >= len(keys) or keys[left] > hi:
                untouched.append(rel)
                untouched_rows += md.num_rows
                continue
        elif not keys:
            untouched.append(rel)
            untouched_rows += md.num_rows
            continue
        touched.append(rel)

    new_version = cur + 1
    if touched:
        survivors = spark.read.parquet(
            *[os.path.join(path, f) for f in touched]
        ).where(F.col(key_col).isNull() | ~F.col(key_col).isin(keys))
        to_write = survivors.unionByName(updates)
    else:
        to_write = updates
    new_files, new_rows = _stage_files(to_write, path, new_version)
    manifest = {
        "version": new_version, "ts": time.time(), "operation": "merge",
        "files": untouched + new_files,
        "rows": untouched_rows + new_rows,
        "parent": cur, "schema": updates.schema.json(),
    }
    return _commit_manifest(path, new_version, manifest)


def rollback(path: str, version: int) -> Snapshot:
    """Commit a NEW version whose content is ``version``'s file list —
    history stays append-only (Iceberg rollback_to_snapshot)."""
    old = _load_manifest(path, version)
    cur = current_version(path)
    new_version = (cur or 0) + 1
    manifest = {
        "version": new_version, "ts": time.time(),
        "operation": f"rollback-to-v{version}",
        "files": old.files, "rows": old.rows, "parent": cur,
        "schema": old.schema_json,
    }
    return _commit_manifest(path, new_version, manifest)


def expire_snapshots(path: str, keep_last: int = 2) -> dict:
    """Drop all but the last ``keep_last`` snapshots and delete data files
    no surviving manifest references. The CURRENT version always
    survives. Returns {expired_versions, deleted_files}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    hist = snapshots(path)
    if len(hist) <= keep_last:
        return {"expired_versions": [], "deleted_files": 0}
    cur = current_version(path)
    keep = hist[-keep_last:]
    if cur is not None and cur not in {s.version for s in keep}:
        keep.append(_load_manifest(path, cur))
    keep_versions = {s.version for s in keep}
    expired = [s for s in hist if s.version not in keep_versions]
    referenced = {f for s in keep for f in s.files}
    deleted = 0
    for s in expired:
        for f in s.files:
            if f not in referenced:
                try:
                    os.remove(os.path.join(path, f))
                    deleted += 1
                except FileNotFoundError:
                    pass
        os.remove(_manifest_path(path, s.version))
    return {
        "expired_versions": [s.version for s in expired],
        "deleted_files": deleted,
    }
