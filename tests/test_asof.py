"""As-of join vs the pandas merge_asof oracle (SURVEY §7 hard-part 1)."""

import pandas as pd
import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(7)
    n_left, n_right = 400, 150
    left = pd.DataFrame(
        {
            "key": rng.randint(0, 10, n_left),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n_left), unit="s"),
            "lval": rng.randn(n_left).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.randint(0, 10, n_right),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n_right), unit="s"),
            "rval": rng.randn(n_right).round(3),
        }
    )
    # make right (key, ts) unique so the match is well-defined
    right = right.drop_duplicates(["key", "ts"])
    return left, right


def test_asof_backward_matches_pandas(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="key",
            value_cols=["rval"],
        )
        .toPandas()
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="key",
            direction="backward",
        )
        .rename(columns={"rval": "rval_right"})
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["key", "ts", "lval", "rval_right"]],
        exp[["key", "ts", "lval", "rval_right"]],
        check_dtype=False,
    )


def test_asof_tolerance(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="key",
            value_cols=["rval"],
            tolerance="3600 seconds",
        )
        .toPandas()
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="key",
            direction="backward",
            tolerance=pd.Timedelta("3600s"),
        )
        .rename(columns={"rval": "rval_right"})
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["key", "ts", "lval", "rval_right"]],
        exp[["key", "ts", "lval", "rval_right"]],
        check_dtype=False,
    )


def test_asof_inclusive_equal_ts(spark):
    """A right row at exactly the left timestamp must match (backward
    inclusive, merge_asof default)."""
    from datetime import datetime

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = [("a", t("2024-01-01 00:00:10"), 1.0)]
    right = [("a", t("2024-01-01 00:00:10"), 99.0), ("a", t("2024-01-01 00:00:05"), 5.0)]
    ldf = spark.createDataFrame(left, "key string, ts timestamp, lval double")
    rdf = spark.createDataFrame(right, "key string, ts timestamp, rval double")
    out = asof_join(ldf, rdf, on="ts", by="key", value_cols=["rval"]).collect()
    assert out[0]["rval_right"] == 99.0


def test_asof_empty_right_side(spark):
    """Every left row survives with null payload when there is nothing to
    match (merge_asof parity on an empty right frame)."""
    from feature_store_implementation_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00", 1.0)], "id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame([], "id long, ts timestamp, value double")
    out = asof_join(left, right, on="ts", by="id", value_cols=["value"]).collect()
    assert len(out) == 1 and out[0]["value_right"] is None


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_directions_match_pandas(spark, frames, direction):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="key",
            value_cols=["rval"],
            direction=direction,
        )
        .toPandas()
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="key",
            direction=direction,
        )
        .rename(columns={"rval": "rval_right"})
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["rval_right"], exp["rval_right"], check_names=False)


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_direction_tolerance(spark, frames, direction):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="key",
            value_cols=["rval"],
            direction=direction,
            tolerance="3600 seconds",
        )
        .toPandas()
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="key",
            direction=direction,
            tolerance=pd.Timedelta("3600s"),
        )
        .rename(columns={"rval": "rval_right"})
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["rval_right"], exp["rval_right"], check_names=False)


def test_asof_rejects_bad_direction(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="key",
            direction="sideways",
        )


def test_asof_matched_rows_null_payload_not_replaced_by_stale(spark):
    """A matching right row whose payload is LEGITIMATELY NULL must win —
    per-column last(ignorenulls) used to skip it and resurrect an older
    row's value, and with tolerance set could emit a value from OUTSIDE
    the tolerance window under an in-window match's timestamp (review
    r10). pd.merge_asof parity: the matched ROW travels whole."""
    import pandas as pd

    from feature_store_implementation_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 10:00:03")], "k string, ts string"
    ).selectExpr("k", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:01", 5.0), ("k", "2024-01-01 10:00:02", None)],
        "k string, ts string, v double",
    ).selectExpr("k", "cast(ts as timestamp) ts", "v")

    got = asof_join(left, right, "ts", "k").collect()
    want = pd.merge_asof(
        left.toPandas().sort_values("ts"),
        right.toPandas().sort_values("ts"),
        on="ts",
        by="k",
    )
    assert got[0]["v_right"] is None and pd.isna(want["v"].iloc[0])

    # in-tolerance NULL-valued match: the out-of-tolerance older value
    # must not leak through the gate
    tol = asof_join(left, right, "ts", "k", tolerance="1 seconds").collect()
    assert tol[0]["v_right"] is None

    # multiple value columns come from ONE right row, never mixed
    right2 = spark.createDataFrame(
        [("k", "2024-01-01 10:00:01", 5.0, "a"),
         ("k", "2024-01-01 10:00:02", None, "b")],
        "k string, ts string, v double, tag string",
    ).selectExpr("k", "cast(ts as timestamp) ts", "v", "tag")
    row = asof_join(left, right2, "ts", "k").collect()[0]
    assert row["v_right"] is None and row["tag_right"] == "b"


def test_asof_nearest_subsecond_distances(spark):
    """direction='nearest' compares distances in microseconds: whole-second
    truncation used to tie 0.5s-vs-0.1s and pick the farther side on
    millisecond-grained data (review r10)."""
    from feature_store_implementation_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00.5")], "k string, ts string"
    ).selectExpr("k", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00.0", "B"), ("k", "2024-01-01 10:00:00.6", "F")],
        "k string, ts string, v string",
    ).selectExpr("k", "cast(ts as timestamp) ts", "v")
    got = asof_join(left, right, "ts", "k", direction="nearest").collect()
    assert got[0]["v_right"] == "F"  # 0.1s beats 0.5s
