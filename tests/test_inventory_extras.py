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


def test_resample_ffill_matches_pandas(spark):
    """Daily resample + forward-fill vs the pandas idiom (resample('D').sum()
    then ffill of missing days) for a handful of users."""
    import pandas as pd

    out = inv.q_resample_ffill(spark, SF).toPandas()
    events = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "ts", "value"]]
    events["day"] = events["ts"].dt.floor("D")
    for uid in sorted(events["user_id"].unique())[:5]:
        g = events[events["user_id"] == uid]
        daily = g.groupby("day")["value"].sum().round(6)
        spine = pd.date_range(g["day"].min(), g["day"].max(), freq="D")
        expected = daily.reindex(spine).ffill()
        got = (
            out[out["user_id"] == uid]
            .set_index("day")["value_ffill"]
            .sort_index()
        )
        assert list(got.index) == [d.strftime("%Y-%m-%d") for d in spine]
        assert all(abs(a - b) < 1e-6 for a, b in zip(got.values, expected.values))


def test_fuzzy_pairs_are_blocked_and_ordered(spark):
    rows = inv.q_fuzzy_pairs(spark, SF).collect()
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert r["name_a"][0] == r["name_b"][0]
        assert 0 < r["edit_dist"] <= 3


def test_approx_quantiles_within_rank_error_of_exact(spark):
    from feature_store_implementation_spark.plans.inventory import SPECS

    sf = "/root/testdata/sf0.001"
    approx = {
        r["l_returnflag"]: r
        for r in SPECS["q_approx_quantiles"].fn(spark, sf).collect()
    }
    exact = {
        r["l_returnflag"]: r for r in SPECS["q_percentiles"].fn(spark, sf).collect()
    }
    assert set(approx) == set(exact) and approx
    # accuracy=10000 → rank error ≤ n/10000; l_quantity spans 1..50 so even a
    # few ranks off moves the value by at most a unit or two
    for flag, a in approx.items():
        for ap, ex in (("ap25", "p25"), ("ap50", "p50"), ("ap75", "p75")):
            assert abs(a[ap] - exact[flag][ex]) <= 2.0, (flag, ap)


def test_no_oracle_queries_emit_only_scalar_columns(spark):
    """Driver-canon safety (VERDICT-r4 #3): the driver sorts EVERY output
    column through pandas even for rows-only queries, and Array/Map/Struct
    cells crash it (`unhashable type: 'list'` — q_media_decode, r4). Assert
    every no-oracle query's schema is scalar-only so that failure class is
    structurally extinct."""
    from pyspark.sql import types as T

    no_oracle = [s for s in inv.SPECS.values() if s.oracle is None]
    assert no_oracle, "expected at least one rows-only query"
    bad = []
    for spec in no_oracle:
        schema = spec.fn(spark, SF).schema
        for field in schema.fields:
            if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{spec.name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, f"complex-typed output columns break driver canon: {bad}"


def test_learn_bpe_classic_example_and_roundtrip(spark):
    """The Sennrich-style corpus learns the expected early merges; encoding
    round-trips (concatenated pieces == each word + </w>); training words
    encode to their converged training segmentation; deterministic."""
    from feature_store_implementation_spark.operators.text import (
        bpe_encode,
        learn_bpe,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low low low lower lower"),
            (2, "newest newest newest newest newest newest widest widest widest"),
        ],
        "doc_id long, text string",
    )
    merges = learn_bpe(docs, n_merges=10)
    assert merges[:3] == [("s", "t"), ("e", "st"), ("est", "</w>")]
    assert ("l", "ow") in merges and ("new", "est</w>") in merges
    assert learn_bpe(docs, n_merges=10) == merges  # deterministic

    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    # round-trip: pieces concatenate back to the word stream with sentinels
    for doc_id, text in [(1, "low low low low low lower lower"),
                         (2, "newest newest newest newest newest newest widest widest widest")]:
        want = "".join(w + "</w>" for w in text.split())
        assert "".join(enc[doc_id]["pieces"]) == want
        assert enc[doc_id]["n_pieces"] == len(enc[doc_id]["pieces"])
    # frequent training words converge to single tokens
    assert "low</w>" in enc[1]["pieces"] and "newest</w>" in enc[2]["pieces"]


def test_learn_bpe_min_freq_and_merge_floor(spark):
    """min_word_freq floors the dictionary; merges below count 2 are never
    learned (singleton merges add vocab without compression)."""
    from feature_store_implementation_spark.operators.text import learn_bpe

    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa zq")], "doc_id long, text string"
    )
    merges = learn_bpe(docs, n_merges=50, min_word_freq=2)  # 'zq' dropped
    assert all("z" not in a + b and "q" not in a + b for a, b in merges)
    assert len(merges) <= 3  # a+a, aa+a|a</w>, ...: the floor stops the loop
