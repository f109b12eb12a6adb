"""The storage seam as an executable CONTRACT, not just a documented table.

SCALING.md ("Storage: what parquet+JSON gives up vs Delta Lake") maps the
manifest-segment protocol's guarantees onto Delta's point by point, and the
declared migration is "swap the physical format inside store/offline.py /
registry/catalog.py, nothing above changes". `delta-spark` cannot be
installed in this sandbox (pip is DNS-blocked, verified round 5), so the
seam's SHAPE is what can be proven here: this module pins it as an abstract
`TableFormat` adapter interface plus a conformance suite
(tests/test_table_format.py) that any backend must pass —

    * append_visible        — committed rows are readable, uncommitted never
    * concurrent_append     — two interleaved writers both land (no lost update)
    * kill_during_write     — a writer killed after data files, before commit,
                              is invisible and retryable
    * as_of                 — a pinned instant re-reads exactly its snapshot,
                              through later appends AND later compactions
    * compaction            — file count drops, bytes survive, mid-compaction
                              appends stay live
    * row-level delete      — subjects erased, snapshots spared (retention)
    * change data feed      — the (since, until] feed replays to exactly the
                              table's state; compactions contribute nothing
    * restore               — a metadata-only rollback to any live snapshot,
                              itself a new time-travelable commit

The `ManifestSegmentFormat` adapter (today's backend) passes the suite; a
future `DeltaFormat` adapter would implement the same five methods with
`format("delta")` + `DESCRIBE HISTORY` and run the identical tests — the
suite discovers implementations via `available_formats()`, which probes for
delta-spark at import time and includes it automatically when present.

The interface is deliberately the MINIMAL surface the engine needs from a
table format (what `OfflineStore` calls today), not a re-creation of the
Delta protocol: version-partitioned append of (entity_id, value) string
rows, snapshot read, time-travel read, compaction, vacuum.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession

from .offline import OfflineStore, compact_version_partition, vacuum_orphans


class TableFormat(ABC):
    """Adapter interface over one physical table format. One instance ==
    one logical feature-values table rooted at ``root``. All reads
    return DataFrames with (at least) columns
    (entity_id string, value string, feature_version_id int)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    @abstractmethod
    def append(self, version_id: int, rows: DataFrame, crash_before_commit: bool = False, before_commit=None) -> int:
        """Commit (entity_id, value) rows for a version; returns the
        version's row count after the commit. ``crash_before_commit``
        simulates a writer killed after its data lands but before its
        commit record; ``before_commit`` interleaves another writer at
        the commit point (conformance hooks — a backend without an
        equivalent fault-injection point may raise NotImplementedError
        for them and the suite skips those cases)."""

    @abstractmethod
    def read(self, version_id: int) -> DataFrame:
        """Current committed snapshot of one version."""

    @abstractmethod
    def read_as_of(self, version_id: int, as_of: float) -> DataFrame:
        """The version exactly as a reader at unix-seconds ``as_of``
        resolved it — later appends and later compactions invisible."""

    @abstractmethod
    def compact(self, version_id: int, before_commit=None) -> int:
        """Rewrite small files into few; same rows before and after;
        returns the resulting file count."""

    @abstractmethod
    def delete(self, version_id: int, entity_ids: list[str]) -> int:
        """Row-level delete by subject (GDPR erasure); returns rows
        removed. Pre-delete snapshots stay resolvable until vacuum
        (retention mode). Maps to Delta's ``DELETE FROM ... WHERE
        entity_id IN (...)``."""

    @abstractmethod
    def vacuum(self, min_age_seconds: float) -> list[str]:
        """Collect unreferenced data files older than the retention."""

    @abstractmethod
    def file_count(self, version_id: int) -> int:
        """Committed data files currently referenced by the version."""

    @abstractmethod
    def changes(self, version_id: int, since=None, until=None) -> DataFrame:
        """CHANGE DATA FEED: row-level changes committed in ``(since,
        until]`` with ``_change_type`` (insert|delete), ``_commit_ts``,
        ``_commit_segment`` columns — inserts from appends, deletes from
        erasures, nothing from compactions. Maps to Delta's
        ``table_changes`` (CDF). Raises if the window contains a restore
        or spans vacuumed files (consumer must resync)."""

    @abstractmethod
    def restore(self, version_id: int, as_of: float) -> dict:
        """RESTORE the version to its ``as_of`` snapshot as a NEW commit
        (metadata-only; no data movement; history stays time-travelable).
        Maps to Delta's ``RESTORE TABLE ... TO TIMESTAMP AS OF``."""


class ManifestSegmentFormat(TableFormat):
    """Today's backend: the parquet + manifest-segment protocol of
    :class:`~.offline.OfflineStore` (stage → fsync → move → one atomic
    segment-manifest rename per append; supersedes-records for
    compaction; age-gated vacuum)."""

    def __init__(self, spark: SparkSession, root: str):
        super().__init__(spark, root)
        self.store = OfflineStore(spark, root)

    def append(self, version_id, rows, crash_before_commit=False, before_commit=None):
        return self.store.write_values(
            version_id,
            rows,
            _crash_before_commit=crash_before_commit,
            _before_commit=before_commit,
        )

    def read(self, version_id):
        return self.store.values_for_version(version_id)

    def read_as_of(self, version_id, as_of):
        return self.store.values_for_version_as_of(version_id, as_of)

    def compact(self, version_id, before_commit=None):
        return compact_version_partition(
            self.spark,
            self.store.path,
            version_id,
            keep_old_files=True,  # retention mode: snapshots stay resolvable
            _before_commit=before_commit,
        )

    def delete(self, version_id, entity_ids):
        return self.store.delete_rows(version_id, entity_ids=entity_ids)[
            "deleted_rows"
        ]

    def vacuum(self, min_age_seconds):
        return vacuum_orphans(self.store, min_age_seconds)

    def file_count(self, version_id):
        return len(self.store._manifest_files(int(version_id)))

    def changes(self, version_id, since=None, until=None):
        return self.store.changes_for_version(version_id, since=since, until=until)

    def restore(self, version_id, as_of):
        return self.store.restore_version(version_id, as_of)


def _delta_available(spark: SparkSession) -> bool:
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    try:
        spark._jvm.io.delta.tables.DeltaTable  # probe the JVM side too
        return True
    except Exception:
        return False


def available_formats(spark: SparkSession) -> dict[str, type[TableFormat]]:
    """Backends present in THIS environment, keyed by name. The
    conformance suite parametrizes over this — adding a DeltaFormat
    implementation (when delta-spark is installable) extends the suite
    with zero test changes."""
    formats: dict[str, type[TableFormat]] = {"manifest": ManifestSegmentFormat}
    if _delta_available(spark):  # pragma: no cover - sandbox has no delta
        from .delta_format import DeltaFormat  # type: ignore[import-not-found]

        formats["delta"] = DeltaFormat
    return formats
