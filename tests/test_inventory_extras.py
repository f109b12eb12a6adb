"""Checks for inventory entries whose driver check is rows-only (sketches,
mapInPandas decode) plus a sanity pass on the pandas-UDF z-score."""

import math

from feature_store_implementation_spark.plans import inventory as inv

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_rsd(spark):
    rows = inv.q_approx_distinct(spark, SF).collect()
    assert rows
    for r in rows:
        # rsd=0.02 → generous 3-sigma bound of 6%
        assert abs(r["approx_parts"] - r["exact_parts"]) <= max(0.06 * r["exact_parts"], 2)


def test_pandas_udf_zscore_moments(spark):
    rows = inv.q_pandas_udf_zscore(spark, SF).collect()
    by_flag: dict[str, list[float]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r["zscore"])
    for zs in by_flag.values():
        n = len(zs)
        mean = math.fsum(zs) / n
        var = math.fsum((z - mean) ** 2 for z in zs) / (n - 1)
        assert abs(mean) < 1e-4
        assert abs(var - 1.0) < 1e-2
