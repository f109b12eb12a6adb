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
  row-at-a-time INSERT loop, compute.py:74-88). Idempotence: a failed write
  leaves at worst a partial partition directory that the compensating
  version-row delete orphans harmlessly; Delta/Iceberg transactional commit
  is the production drop-in.
* **Sorted within files by entity_id** (``sortWithinPartitions``) so
  parquet min/max page stats make point lookups by entity skip pages — the
  columnar analog of the reference's idx_entity_feature.
"""

from __future__ import annotations

import os

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


class OfflineStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.path = os.path.join(root, "feature_values")

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def write_values(self, version_id: int, values: DataFrame) -> int:
        """Append (entity_id, value) rows for one version in a single
        distributed job. ``values`` must have columns entity_id (castable to
        string) and value (already codec-encoded string).

        Returns the number of rows written (the count comes free from the
        pre-write cache used to stabilize the row set).

        Storage-format seam (SCALING.md "Storage"): this append and
        :meth:`values` are the only physical-format touchpoints of the
        offline store. Production swaps ``parquet`` for ``format("delta")``
        here to gain transactional appends/MERGE/time-travel; nothing above
        this layer changes."""
        out = (
            values.select(
                F.lit(int(version_id)).cast("long").alias("feature_version_id"),
                F.col("entity_id").cast("string").alias("entity_id"),
                F.col("value").cast("string").alias("value"),
                F.current_timestamp().alias("computed_at"),
            )
            # one shuffle-free pass; sort within files for entity data-skipping
            .sortWithinPartitions("entity_id")
        )
        out.write.mode("append").partitionBy("feature_version_id").parquet(self.path)
        return self.spark.read.parquet(self.path).filter(
            F.col("feature_version_id") == version_id
        ).count()

    def values(self) -> DataFrame:
        """The full offline store as a DataFrame (partition-pruned on
        feature_version_id predicates)."""
        return self.spark.read.schema(VALUES_SCHEMA).parquet(self.path)

    def values_for_version(self, version_id: int) -> DataFrame:
        return self.values().filter(F.col("feature_version_id") == int(version_id))

    def point_lookup(self, version_id: int, entity_id: str) -> DataFrame:
        """Single-entity point read: partition pruning (version) + parquet
        page skipping (entity sort order) — the serving hot path."""
        return self.values_for_version(version_id).filter(F.col("entity_id") == entity_id)

    def drop_version_values(self, version_id: int) -> bool:
        """Remove one version's partition directory (crash recovery of a
        writer that died mid-append, leaving partial files under a version
        id that never activated). Partition-scoped: other versions'
        directories are untouched. Returns True if anything was deleted."""
        import shutil

        part_dir = os.path.join(self.path, f"feature_version_id={int(version_id)}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
            return True
        return False


def compact_version_partition(
    spark: SparkSession,
    root: str,
    version_id: int,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact one version's partition directory: many small files (from
    incremental/streaming appends) → ceil(bytes/target) files, re-sorted by
    entity_id so page-stat skipping survives compaction.

    Small-files is THE silent killer of big scans (one task + one open per
    file); streaming sinks make it chronic. Rewrite is per-partition and
    atomic-by-rename(ish): write to a sibling temp dir, swap, drop old —
    Delta/Iceberg `OPTIMIZE` is the transactional production drop-in.
    Returns the resulting file count."""
    import shutil

    part_dir = os.path.join(root, f"feature_version_id={version_id}")
    if not os.path.isdir(part_dir):
        raise FileNotFoundError(part_dir)
    size = sum(
        os.path.getsize(os.path.join(part_dir, f))
        for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_bytes))
    df = (
        spark.read.schema(
            T.StructType([f for f in VALUES_SCHEMA.fields if f.name != "feature_version_id"])
        )
        .parquet(part_dir)
        .repartition(n_files)
        .sortWithinPartitions("entity_id")
    )
    tmp_dir = part_dir + ".compact.tmp"
    df.write.mode("overwrite").parquet(tmp_dir)
    old_dir = part_dir + ".compact.old"
    os.rename(part_dir, old_dir)
    os.rename(tmp_dir, part_dir)
    shutil.rmtree(old_dir)
    return len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
