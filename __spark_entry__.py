"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The inventory itself lives in
``feature_store_implementation_spark/plans/inventory.py`` (one entry per
operator class from SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from feature_store_implementation_spark.plans import inventory


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: total spend per customer
    (orders ⋈ broadcast(customer) → groupBy → exact decimal sum)."""
    return inventory.q_customer_total_spend(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return inventory.QUERIES()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return inventory.ORACLE_SQL()
