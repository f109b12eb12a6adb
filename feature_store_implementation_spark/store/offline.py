"""The offline store: feature_values, the table that actually scales.

Reference shape (models.py:65-80): (id, feature_version_id FK, entity_id
str, value Text, computed_at), with a B-tree index on
(entity_id, feature_version_id) (models.py:78-80).

Spark-first design:

* **Partitioned by feature_version_id** — every serve/read names a version
  (or resolves latest → a version id), so partition pruning eliminates all
  other versions before the scan. At 100 TB with thousands of versions this
  is the difference between scanning one version's files and the world.
* **Values written in ONE distributed append** (vs the reference's
  row-at-a-time INSERT loop, compute.py:74-88).
* **Manifest-commit protocol** (single-writer crash safety without
  delta-spark, which the sandbox cannot install — SCALING.md "Storage"):
  every append stages its parquet files, fsyncs them, moves them into the
  version's partition directory, and only then atomically renames a
  per-version manifest JSON listing ALL committed files for that version.
  Readers resolve the file list through the manifests, so a writer killed
  at ANY point leaves at worst orphaned un-manifested files that no read
  ever sees — readers never observe a partial append. This is the
  single-writer core of what Delta's transaction log provides; concurrent
  multi-writer coordination remains the documented Delta/Iceberg drop-in
  (swap the staging+manifest steps for ``format("delta")`` here and in
  :func:`compact_version_partition`; nothing above this layer changes).
* **Sorted within files by entity_id** (``sortWithinPartitions``) so
  parquet min/max page stats make point lookups by entity skip pages — the
  columnar analog of the reference's idx_entity_feature.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VALUES_SCHEMA = T.StructType(
    [
        T.StructField("feature_version_id", T.LongType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("computed_at", T.TimestampType(), False),
    ]
)

# on-disk file schema: the partition column lives in the directory name
_FILE_SCHEMA = T.StructType([f for f in VALUES_SCHEMA.fields if f.name != "feature_version_id"])


def _fsync_path(path: str) -> None:
    """fsync a file or directory by path (O_RDONLY works for both on
    Linux — directory fsync persists the entry rename)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class OfflineStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.path = os.path.join(root, "feature_values")

    def exists(self) -> bool:
        """True when the store has COMMITTED data. Manifest-based, not a
        bare path check: a crashed first write leaves staging/orphan files
        under the path with nothing committed, and callers branching on
        ``exists()`` (serving's empty-store fast path, the streaming
        upsert sink) must treat that exactly like an empty store."""
        return bool(self._committed_versions())

    # -- manifest protocol -------------------------------------------------

    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifests")

    def _manifest_path(self, version_id: int) -> str:
        return os.path.join(self._manifest_dir(), f"v{int(version_id)}.json")

    def _manifest_files(self, version_id: int) -> list[str]:
        """Relative paths of the COMMITTED files for one version (empty if
        the version has never committed)."""
        try:
            with open(self._manifest_path(version_id)) as f:
                return json.load(f)["files"]
        except FileNotFoundError:
            return []

    def _commit_manifest(self, version_id: int, files: list[str]) -> None:
        """The commit point: tmp-write + fsync + atomic rename. A crash
        before the rename leaves the previous manifest (and therefore the
        previous committed file set) fully intact."""
        os.makedirs(self._manifest_dir(), exist_ok=True)
        final = self._manifest_path(version_id)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"files": sorted(files)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
        _fsync_path(self._manifest_dir())

    def _committed_versions(self) -> list[int]:
        try:
            names = os.listdir(self._manifest_dir())
        except FileNotFoundError:
            return []
        return sorted(
            int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json")
        )

    def _read_files(self, rel_files: list[str]) -> DataFrame:
        if not rel_files:
            return self.spark.createDataFrame([], VALUES_SCHEMA)
        paths = [os.path.join(self.path, rf) for rf in rel_files]
        return (
            self.spark.read.option("basePath", self.path)
            .schema(VALUES_SCHEMA)
            .parquet(*paths)
            .select(*[f.name for f in VALUES_SCHEMA.fields])
        )

    # -- writes ------------------------------------------------------------

    def write_values(
        self, version_id: int, values: DataFrame, _crash_before_commit: bool = False
    ) -> int:
        """Append (entity_id, value) rows for one version in a single
        distributed job, made crash-atomic by the manifest protocol:
        stage → fsync → move into the partition dir → commit the manifest
        (atomic rename). ``values`` must have columns entity_id (castable
        to string) and value (already codec-encoded string). Returns the
        number of committed rows for the version.

        ``_crash_before_commit`` is the test hook for the kill-during-write
        proof: it aborts after the data files are fully in place but before
        the manifest commit — the exact window a crash would leave — and
        tests assert readers see none of the staged rows."""
        vid = int(version_id)
        out = (
            values.select(
                F.col("entity_id").cast("string").alias("entity_id"),
                F.col("value").cast("string").alias("value"),
                F.current_timestamp().alias("computed_at"),
            )
            # one shuffle-free pass; sort within files for entity data-skipping
            .sortWithinPartitions("entity_id")
        )
        txn = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, ".staging", txn)
        out.write.parquet(staging)
        part_rel = f"feature_version_id={vid}"
        part_dir = os.path.join(self.path, part_rel)
        os.makedirs(part_dir, exist_ok=True)
        new_rel = []
        try:
            for src in sorted(glob.glob(os.path.join(staging, "part-*.parquet"))):
                _fsync_path(src)
                name = f"{txn}-{os.path.basename(src)}"
                os.rename(src, os.path.join(part_dir, name))
                new_rel.append(f"{part_rel}/{name}")
            _fsync_path(part_dir)
            if _crash_before_commit:
                raise RuntimeError("simulated crash before manifest commit")
            committed = self._manifest_files(vid) + new_rel
            self._commit_manifest(vid, committed)
        finally:
            shutil.rmtree(os.path.join(self.path, ".staging", txn), ignore_errors=True)
        return self.values_for_version(vid).count()

    # -- reads -------------------------------------------------------------

    def values(self) -> DataFrame:
        """The full offline store as a DataFrame — only manifest-committed
        files, so in-flight/crashed appends are invisible. Version
        predicates still prune: the partition value is carried by each
        file's directory name."""
        rel = [f for vid in self._committed_versions() for f in self._manifest_files(vid)]
        return self._read_files(rel)

    def values_for_version(self, version_id: int) -> DataFrame:
        """One version's committed rows: the file list comes from that
        version's manifest alone — the read plans over exactly the files
        it needs (manifest-level pruning, same effect as partition
        pruning with a pre-pruned listing)."""
        vid = int(version_id)
        return self._read_files(self._manifest_files(vid)).filter(
            F.col("feature_version_id") == vid
        )

    def point_lookup(self, version_id: int, entity_id: str) -> DataFrame:
        """Single-entity point read: manifest pruning (version) + parquet
        page skipping (entity sort order) — the serving hot path."""
        return self.values_for_version(version_id).filter(F.col("entity_id") == entity_id)

    def drop_version_values(self, version_id: int) -> bool:
        """Remove one version's committed data (crash recovery of a writer
        that died mid-activation, or version retirement). The manifest is
        deleted FIRST — readers stop seeing the version atomically — then
        the partition directory. Returns True if anything was deleted."""
        vid = int(version_id)
        deleted = False
        manifest = self._manifest_path(vid)
        if os.path.exists(manifest):
            os.remove(manifest)
            _fsync_path(self._manifest_dir())
            deleted = True
        part_dir = os.path.join(self.path, f"feature_version_id={vid}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
            deleted = True
        return deleted


def vacuum_orphans(store: OfflineStore, min_age_seconds: float = 24 * 3600) -> list[str]:
    """Remove data files that no manifest references — the garbage a
    crashed writer leaves behind (staged-and-moved but never committed) or
    a compaction was interrupted before deleting. Mirrors Delta's VACUUM:
    age-gated (default 24 h) so an IN-FLIGHT writer's files — moved into
    the partition dir but not yet manifest-committed — are never swept
    from under it. Readers are unaffected either way: they only ever
    resolve manifested files. Returns the removed paths."""
    import time

    committed = {
        rf
        for vid in store._committed_versions()
        for rf in store._manifest_files(vid)
    }
    removed: list[str] = []
    cutoff = time.time() - min_age_seconds
    for part in glob.glob(os.path.join(store.path, "feature_version_id=*")):
        for f in os.listdir(part):
            if not f.endswith(".parquet"):
                continue
            rel = f"{os.path.basename(part)}/{f}"
            full = os.path.join(part, f)
            if rel not in committed and os.path.getmtime(full) < cutoff:
                os.remove(full)
                removed.append(full)
    # stale per-txn staging dirs (same age gate — never an in-flight writer's)
    for stage in glob.glob(os.path.join(store.path, ".staging", "*")):
        try:
            if os.path.getmtime(stage) < cutoff:
                shutil.rmtree(stage, ignore_errors=True)
                removed.append(stage)
        except FileNotFoundError:
            pass
    return removed


def compact_version_partition(
    spark: SparkSession,
    root: str,
    version_id: int,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact one version's committed files: many small files (from
    incremental/streaming appends) → ceil(bytes/target) files, re-sorted by
    entity_id so page-stat skipping survives compaction.

    Small-files is THE silent killer of big scans (one task + one open per
    file); streaming sinks make it chronic. Crash-atomic via the same
    manifest protocol as appends: the compacted files are staged and moved
    in under new names ALONGSIDE the old ones, the manifest swap to the new
    file list is one atomic rename, and only then are the old files
    removed — a reader always resolves either the complete old set or the
    complete new set (Delta/Iceberg ``OPTIMIZE`` is the transactional
    production drop-in). Returns the resulting committed file count."""
    vid = int(version_id)
    # callers pass store.path (the feature_values dir); rebuild a store on it
    store = OfflineStore.__new__(OfflineStore)
    store.spark = spark
    store.root = os.path.dirname(root)
    store.path = root
    old_rel = store._manifest_files(vid)
    if not old_rel:
        raise FileNotFoundError(os.path.join(root, f"feature_version_id={vid}"))
    size = sum(os.path.getsize(os.path.join(root, rf)) for rf in old_rel)
    n_files = max(1, -(-size // target_file_bytes))
    df = (
        store._read_files(old_rel)
        .select(*[f.name for f in _FILE_SCHEMA.fields])
        .repartition(n_files)
        .sortWithinPartitions("entity_id")
    )
    txn = uuid.uuid4().hex[:12]
    staging = os.path.join(root, ".staging", txn)
    df.write.parquet(staging)
    part_rel = f"feature_version_id={vid}"
    part_dir = os.path.join(root, part_rel)
    os.makedirs(part_dir, exist_ok=True)
    new_rel = []
    try:
        for src in sorted(glob.glob(os.path.join(staging, "part-*.parquet"))):
            _fsync_path(src)
            name = f"{txn}-{os.path.basename(src)}"
            os.rename(src, os.path.join(part_dir, name))
            new_rel.append(f"{part_rel}/{name}")
        _fsync_path(part_dir)
        store._commit_manifest(vid, new_rel)  # the atomic cutover
        for rf in old_rel:  # old files are garbage the moment the swap lands
            try:
                os.remove(os.path.join(root, rf))
            except FileNotFoundError:
                pass
    finally:
        shutil.rmtree(os.path.join(root, ".staging", txn), ignore_errors=True)
    return len(new_rel)
