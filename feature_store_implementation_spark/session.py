"""SparkSession construction.

Local testing runs a single JVM (``local[N]``); production targets a
multi-executor cluster, so every default here is chosen to also make sense at
1000 executors: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow on (vectorized pandas interchange for the few Pandas-UDF
operators), UTC session time zone (determinism), and a shuffle partition count
that callers override per deployment.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "feature_store_implementation_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    locally we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # pre-set deterministically (sources.tables.load_table needs it for
        # the events table's TIMESTAMP(NANOS) column): without it here, the
        # session's treatment of nanos parquet depended on whether events
        # had been loaded first — order-dependent and thread-racy
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" in os.environ:
        # Spark never reads this env var itself. A master-URL-shaped value
        # is passed through (the plain-python `SPARK_MASTER=spark://...`
        # deployment — presence-only checking used to leave the builder
        # masterless and getOrCreate failing); any other value acts as the
        # historical sentinel "don't force local[N]", leaving the builder
        # masterless so spark-submit's --master applies.
        m = os.environ["SPARK_MASTER"]
        if re.match(r"^(local(\[.*\])?$|spark://|yarn|k8s://|mesos://)", m):
            builder = builder.master(m)
    else:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
