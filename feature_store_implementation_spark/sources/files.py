"""Generic file sources and sinks beyond the canonical parquet tables.

The reference's only ingress is JSON-over-HTTP record lists (reference
main.py:176) and its only egress is rows in SQLite (reference
compute.py:74-88). Here ingestion is declarative readers that keep Catalyst
in charge (pushdown, pruning, partition discovery), and egress is columnar
partitioned parquet — the layout a 1000-executor job can actually write and
re-read in parallel.

Readers take an explicit ``StructType`` whenever the format is untyped
(CSV/JSON): schema inference is a full extra pass over the data at 100 TB
and can silently mis-type columns; declared schemas are both faster and the
moral equivalent of the reference's registered ``schema_definition``
(reference models.py:14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with a declared schema. PERMISSIVE mode + ``_corrupt_record`` is
    deliberately not the default: bad rows should fail loudly in a feature
    pipeline unless the caller opts into salvage."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    reader = reader.option("mode", options.pop("mode", "FAILFAST"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def json_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines with a declared schema (one object per line scales; a
    single giant array does not parallelize)."""
    reader = spark.read.schema(schema)
    reader = reader.option("mode", options.pop("mode", "FAILFAST"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink. ``partition_by`` columns become directory
    partitions (partition pruning on read); ``max_records_per_file`` caps
    file sizes so one skewed partition value can't produce a single giant
    file."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def orc_source(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC reader — self-describing columnar, so no declared schema needed;
    predicate pushdown and column pruning work as for parquet. Supported so
    a user migrating an ORC lake doesn't need a parquet rewrite first."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def text_source(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw text ingestion for document pipelines: one row per line (default)
    or one row per file (``whole_file`` — for document-level dedup/quality
    scoring where line splitting would destroy the unit of analysis). Returns
    a single ``value: string`` column; parsing stays declarative downstream."""
    return spark.read.text(path, wholetext=whole_file)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned ORC sink, mirroring :func:`write_partitioned`."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
