"""Skew operators must be identity-preserving vs their naive counterparts."""

from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.skew import (
    detect_hot_keys,
    salted_join,
    two_phase_count_distinct,
)
from feature_store_implementation_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(spark):
    e = load_table(spark, SF, "events").withColumnRenamed("user_id", "c_custkey")
    c = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    plain = e.join(c, "c_custkey").select("event_id", "c_custkey", "c_name")
    salted = salted_join(e, c, on="c_custkey", salt=4).select(
        "event_id", "c_custkey", "c_name"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_matches_plain_left(spark):
    e = load_table(spark, SF, "events").withColumnRenamed("user_id", "c_custkey")
    # shrink dim so some events have no match → exercises null-extension
    c = (
        load_table(spark, SF, "customer")
        .filter(F.col("c_custkey") < 50)
        .select("c_custkey", "c_name")
    )
    plain = e.join(c, "c_custkey", "left").select("event_id", "c_custkey", "c_name")
    salted = salted_join(e, c, on="c_custkey", how="left", salt=4).select(
        "event_id", "c_custkey", "c_name"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_explicit_hot_keys(spark):
    e = load_table(spark, SF, "events").withColumnRenamed("user_id", "c_custkey")
    c = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    hot = [r["c_custkey"] for r in e.groupBy("c_custkey").count().orderBy(F.desc("count")).limit(3).collect()]
    plain = e.join(c, "c_custkey").count()
    assert salted_join(e, c, on="c_custkey", salt=8, hot_keys=hot).count() == plain


def test_detect_hot_keys_returns_heaviest(spark):
    e = load_table(spark, SF, "events")
    hot = detect_hot_keys(e, "user_id", top_n=5, min_share=0.0)
    counts = {
        r["user_id"]: r["count"] for r in e.groupBy("user_id").count().collect()
    }
    floor = sorted(counts.values(), reverse=True)[4]
    assert all(counts[k] >= floor for k in hot)


def test_two_phase_count_distinct_exact(spark):
    e = load_table(spark, SF, "events")
    exact = {
        (r["event_type"],): r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    two = {
        (r["event_type"],): r["n_distinct"]
        for r in two_phase_count_distinct(e, ["event_type"], "user_id").collect()
    }
    assert two == exact
