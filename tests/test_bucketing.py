"""Bucketed co-located joins: pre-bucketing both fact tables on the join key
removes the per-query shuffle entirely — THE storage-layout lever for
repeated big-big joins at 100 TB (TESTDATA's lineitem ⋈ orders shape).

Asserts on the physical plan: the bucketed join has NO shuffle Exchange,
while the same join on plain parquet shuffles both sides."""

import re

import pytest
from pyspark.sql import functions as F

from feature_store_implementation_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


def _shuffle_count(df) -> int:
    plan = df._session._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed")
    # external tables via explicit path: no (static) warehouse conf needed
    for table, key, name in (
        ("orders", "o_orderkey", "orders_b"),
        ("lineitem", "l_orderkey", "lineitem_b"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load_table(spark, SF, table)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(warehouse / name))
            .saveAsTable(name)
        )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _join(o, li):
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    joined = _join(spark.table(orders_b), spark.table(lineitem_b))
    # only the final single-key aggregation may shuffle — the join itself
    # must consume bucket layout (zero or one Exchange, vs three unbucketed)
    assert _shuffle_count(joined) <= 1


def test_unbucketed_join_shuffles_both_sides(spark):
    joined = _join(
        load_table(spark, SF, "orders"), load_table(spark, SF, "lineitem")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert _shuffle_count(joined) >= 3
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    got = {
        tuple(r)
        for r in _join(spark.table(orders_b), spark.table(lineitem_b)).collect()
    }
    expected = {
        tuple(r)
        for r in _join(
            load_table(spark, SF, "orders"), load_table(spark, SF, "lineitem")
        ).collect()
    }
    assert got == expected
