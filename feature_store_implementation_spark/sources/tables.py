"""Sources: the canonical parquet tables plus generic readers.

The reference ingests only JSON-over-HTTP (main.py:176); our engine's
canonical source is columnar parquet (TESTDATA.md tables), with JSON/CSV
readers provided for parity with the reference's record-list ingestion.

All readers return lazy DataFrames — scans stay columnar, filters and column
pruning are pushed into the parquet reader by Catalyst (check
``PushedFilters`` / ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins. At 100 TB
# the fact tables (lineitem/orders/events/documents/embeddings) scale; these
# stay tiny (TPC-H spec: region=5, nation=25 rows at every SF).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table from a scale-factor directory.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. We read it as raw long nanoseconds
    (legacy conf) and convert to a microsecond timestamp with a JVM-side
    expression — still a plain distributed columnar scan, no driver hop.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        # session-global by necessity (nanosAsLong is an SQLConf with no
        # per-read option, and restoring it after the lazy read would race
        # the scan planning and any concurrent thread's events read). The
        # same conf is pre-set deterministically in session.get_spark so
        # behavior never depends on whether events was loaded first; the
        # documented cost is that OTHER nanos-timestamp parquet reads in
        # the session also surface as raw long columns instead of failing.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_field = df.schema["ts"].dataType.typeName()
        if ts_field in ("long", "bigint"):
            # integer floor-div: `ts div 1000` truncates toward zero, which
            # shifts PRE-EPOCH (negative) nanos one microsecond late;
            # double division would lose precision above 2^53 ns instead
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "CASE WHEN ts >= 0 THEN ts div 1000 "
                        "ELSE -((-ts + 999) div 1000) END"
                    )
                ),
            )
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every canonical table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def records_source(
    spark: SparkSession,
    records: list[dict],
    schema: T.StructType | None = None,
) -> DataFrame:
    """JSON-record-list ingestion — parity with the reference's
    ``pd.DataFrame(request.data)`` (main.py:176), but typed when a schema is
    declared. Arrow-backed ``createDataFrame`` keeps this fast for the small
    request payloads it is meant for; bulk data belongs in parquet."""
    if schema is not None:
        return spark.createDataFrame(records, schema=schema)
    return spark.createDataFrame(records)
