"""Data-quality expectations engine: violation counts verified on a frame
with KNOWN defects of every kind, plus the one-scan plan property."""

from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.quality import (
    Expectation,
    check_expectations,
)


def test_every_kind_counts_known_violations(spark):
    df = spark.createDataFrame(
        [
            # (id, key, price, status, code)
            (1, 10, 5.0, "O", "1-HIGH"),
            (2, 10, -3.0, "F", "2-LOW"),       # dup id-key? no: unique on id; price<0
            (2, 20, 50.0, "X", "9-BAD"),       # dup id, bad status, bad code shape
            (3, None, 2000.0, "P", "3-MEDIUM"),  # null key, price>1000
            (4, 30, None, None, None),           # nulls don't violate range/vocab/regex
        ],
        "id long, key long, price double, status string, code string",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")  # 30 is an orphan
    exps = [
        Expectation("key_not_null", "key", "not_null"),
        Expectation("id_unique", "id", "unique"),
        Expectation("price_range", "price", "in_range", {"min": 0, "max": 1000}),
        Expectation("status_vocab", "status", "accepted_values", {"values": ["O", "F", "P"]}),
        Expectation("code_shape", "code", "matches_regex", {"pattern": r"^[1-5]-[A-Z]+$"}),
        Expectation("key_fk", "key", "foreign_key", {"parent_key": "pk"}),
    ]
    got = {
        r["check"]: (r["violations"], r["passed"])
        for r in check_expectations(df, exps, parents={"key_fk": parent}).collect()
    }
    assert got == {
        "key_not_null": (1, False),
        "id_unique": (1, False),       # id 2 appears twice → one extra row
        "price_range": (2, False),     # -3 and 2000
        "status_vocab": (1, False),    # X
        "code_shape": (1, False),      # 9-BAD
        "key_fk": (1, False),          # key 30
    }


def test_clean_frame_passes_and_plan_is_one_scan(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    exps = [
        Expectation("id_unique", "id", "unique"),
        Expectation("v_range", "v", "in_range", {"min": 0, "max": 100}),
        Expectation("id_not_null", "id", "not_null"),
    ]
    report = check_expectations(df, exps)
    assert all(r["passed"] for r in report.collect())
    # all column-local rules fold into ONE aggregation over one scan
    import re

    plan = spark._jvm.PythonSQLUtils.explainString(
        report._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) == 1


def test_observed_expectations_match_dedicated_scan(spark):
    """Observation metrics collected on the pipeline's own pass must equal
    the dedicated check_expectations scan."""
    import pytest as _pytest

    from feature_store_implementation_spark.operators.quality import (
        Expectation,
        check_expectations,
        observed_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (3, "a", -1.0), (3, "z", 7.0)],
        "id long, tag string, score double",
    )
    exps = [
        Expectation("tag_not_null", "tag", "not_null"),
        Expectation("score_range", "score", "in_range", {"min": 0.0, "max": 10.0}),
        Expectation("tag_accepted", "tag", "accepted_values", {"values": ["a", "b"]}),
    ]
    observed_df, obs = observed_expectations(df, exps)
    observed_df.write.format("noop").mode("overwrite").save()  # the "real" pass
    got = obs.get
    dedicated = {
        r["check"]: r["violations"] for r in check_expectations(df, exps).collect()
    }
    assert got["n_rows"] == 4
    for e in exps:
        assert got[f"viol_{e.name}"] == dedicated[e.name], e.name
    # kinds needing joins or DISTINCT state are rejected up front
    with _pytest.raises(ValueError, match="foreign_key"):
        observed_expectations(
            df, [Expectation("fk", "id", "foreign_key", {"parent_key": "id"})]
        )
    with _pytest.raises(ValueError, match="unique"):
        observed_expectations(df, [Expectation("u", "id", "unique")])


def test_psi_drift_detects_shift_and_is_zero_on_identity(spark):
    """PSI semantics: identical samples give per-bin terms of ~0; a mean
    shift pushes the summed index past the standard 0.25 'shifted'
    threshold; bins come from the REFERENCE so out-of-range current
    values clamp into edge bins instead of moving the edges."""
    from feature_store_implementation_spark.operators.quality import psi_drift

    base = spark.range(0, 2000).select((F.col("id") % 100).cast("double").alias("v"))
    same = psi_drift(base, base, "v", bins=10).collect()
    assert same and all(abs(r["psi_term"]) < 1e-9 for r in same)

    shifted = spark.range(0, 2000).select(
        ((F.col("id") % 100) + 80).cast("double").alias("v")
    )
    rows = psi_drift(base, shifted, "v", bins=10).collect()
    assert sum(r["psi_term"] for r in rows) > 0.25
    # current mass above the reference max clamps into the top bin
    top = {r["bin"]: r for r in rows}[10]
    assert top["cur_frac"] > top["ref_frac"]
