"""Sampling operators: fraction bounds, determinism, partition-independence."""

from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.sampling import (
    deterministic_sample,
    per_group_sample,
    stratified_sample,
)
from feature_store_implementation_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_stratified_fractions(spark):
    d = load_table(spark, SF, "documents")
    out = stratified_sample(d, "lang", {"en": 0.5, "de": 0.1})
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    assert set(counts) <= {"en", "de"}  # unlisted strata dropped
    assert abs(counts.get("en", 0) / base["en"] - 0.5) < 0.2


def test_deterministic_sample_is_partitioning_independent(spark):
    d = load_table(spark, SF, "documents")
    a = {r["doc_id"] for r in deterministic_sample(d, ["doc_id"], 0.3).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(d.repartition(17), ["doc_id"], 0.3).collect()
    }
    assert a == b and 0.15 < len(a) / d.count() < 0.45


def test_deterministic_sample_is_append_stable(spark):
    d = load_table(spark, SF, "documents")
    half = d.filter(F.col("doc_id") < 250)
    full_sel = {r["doc_id"] for r in deterministic_sample(d, ["doc_id"], 0.3).collect()}
    half_sel = {r["doc_id"] for r in deterministic_sample(half, ["doc_id"], 0.3).collect()}
    assert half_sel == {i for i in full_sel if i < 250}


def test_per_group_sample_caps_and_determinism(spark):
    e = load_table(spark, SF, "events")
    out = per_group_sample(e, ["event_type"], 10, key_cols=["event_id"])
    counts = out.groupBy("event_type").count().collect()
    assert all(r["count"] <= 10 for r in counts)
    again = per_group_sample(e, ["event_type"], 10, key_cols=["event_id"])
    assert sorted(r["event_id"] for r in out.collect()) == sorted(
        r["event_id"] for r in again.collect()
    )


def test_portable_sample_stability_and_fraction(spark):
    from feature_store_implementation_spark.operators.sampling import portable_sample
    from feature_store_implementation_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    kept = portable_sample(d, ["doc_id"])
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # append-stable: sampling a subset keeps exactly the intersection
    half = d.filter("doc_id < 250")
    ids_half = {r["doc_id"] for r in portable_sample(half, ["doc_id"]).select("doc_id").collect()}
    assert ids_half == {i for i in ids if i < 250}
    # fraction lands near 77/256 ~ 0.3 (binomial tolerance on 500 docs)
    assert 0.2 < len(ids) / d.count() < 0.42
    # partitioning-independent
    ids_repart = {
        r["doc_id"]
        for r in portable_sample(d.repartition(13), ["doc_id"]).select("doc_id").collect()
    }
    assert ids_repart == ids


def test_weighted_mix_rates_and_subset_structure(spark):
    from feature_store_implementation_spark.operators.sampling import (
        portable_sample,
        weighted_mix,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = weighted_mix(d, {"en": 1.0, "de": 0.5, "zh": 0.0}, group_col="lang")
    rows = out.select("doc_id", "lang").collect()
    langs = {r["lang"] for r in rows}
    # weight 1.0 keeps every row; 0.0 and absent groups keep none
    assert langs <= {"en", "de"}
    n_en_total = d.filter("lang = 'en'").count()
    assert sum(1 for r in rows if r["lang"] == "en") == n_en_total
    # kept 'de' docs are a stable subset keyed only by doc_id: the same doc
    # is kept by weighted_mix(0.5) iff a plain 0.5 portable_sample keeps it
    half = {
        r["doc_id"]
        for r in portable_sample(d, ["doc_id"], hex_threshold="8000", prefix_len=4)
        .select("doc_id")
        .collect()
    }
    de_kept = {r["doc_id"] for r in rows if r["lang"] == "de"}
    de_all = {r["doc_id"] for r in d.filter("lang = 'de'").select("doc_id").collect()}
    assert de_kept == de_all & half


def test_mixture_temperature_weights_exact(spark):
    from feature_store_implementation_spark.operators.sampling import (
        mixture_temperature_weights,
    )

    rows = [(i, "en") for i in range(8)] + [(8, "sw")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r["lang"]: r for r in mixture_temperature_weights(df, "lang", 0.3).collect()}
    p_en, p_sw = round((8 / 9) ** 0.3, 8), round((1 / 9) ** 0.3, 8)
    assert out["en"]["n_docs"] == 8 and out["sw"]["n_docs"] == 1
    assert abs(out["en"]["weight"] - round(p_en / (p_en + p_sw), 6)) < 1e-9
    assert abs(out["sw"]["weight"] - round(p_sw / (p_en + p_sw), 6)) < 1e-9
    # temperature up-weights the low-resource group above its natural share
    assert out["sw"]["weight"] > out["sw"]["share"]
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5


def test_mixture_temperature_alpha_one_is_natural(spark):
    from feature_store_implementation_spark.operators.sampling import (
        mixture_temperature_weights,
    )

    rows = [(i, "en") for i in range(6)] + [(6, "de"), (7, "de")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    for r in mixture_temperature_weights(df, "lang", alpha=1.0).collect():
        assert abs(r["weight"] - r["share"]) < 1e-5


def test_weighted_sample_wor_inclusion_and_stability(spark):
    """A-ES semantics: k=N returns every positive-weight row exactly once
    (without replacement), a dominant weight is always included, zero/
    negative weights are excluded, and membership is append-stable (the
    ES key depends only on the row's own keys and weight)."""
    from feature_store_implementation_spark.operators.sampling import (
        weighted_sample_wor,
    )

    rows = [(i, 1.0 if i else 10_000.0) for i in range(50)] + [(50, 0.0), (51, -2.0)]
    df = spark.createDataFrame(rows, "id long, w double")

    all_pos = weighted_sample_wor(df, 50, "w", ["id"]).collect()
    assert sorted(r["id"] for r in all_pos) == list(range(50))

    top = {r["id"] for r in weighted_sample_wor(df, 10, "w", ["id"]).collect()}
    assert 0 in top  # the 10_000x weight row is a near-certain member
    assert len(top) == 10

    # append stability: adding rows never flips an existing row's ES key,
    # so the old sample is a subset of the new top-(k + new rows) superset
    more = df.union(
        spark.createDataFrame([(100 + i, 1.0) for i in range(20)], "id long, w double")
    )
    top_again = {r["id"] for r in weighted_sample_wor(more, 10, "w", ["id"]).collect()}
    # keys of shared rows are identical; only genuinely higher-key newcomers
    # may displace — verify by recomputing both key sets driver-side
    import hashlib
    import math

    def es(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) / 16**13
        return math.log(max(u, 1.0 / 16**13)) / w

    want = set(
        sorted((i for i, w in rows if w > 0), key=lambda i: -es(i, dict(rows)[i]))[:10]
    )
    assert top == want
    allr = dict(rows) | {100 + i: 1.0 for i in range(20)}
    want2 = set(sorted((i for i, w in allr.items() if w > 0), key=lambda i: -es(i, allr[i]))[:10])
    assert top_again == want2


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_split_neardups_never_straddle(spark):
    """Pairs from the REAL MinHash route: both members of every near-dup
    pair (hence every transitive cluster) land in the same split."""
    import pytest
    from feature_store_implementation_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from feature_store_implementation_spark.operators.sampling import (
        leakage_safe_split,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    pairs = minhash_near_dup_pairs(d, threshold=0.5).select("doc_id_a", "doc_id_b")
    assert pairs.count() > 0  # the guard is vacuous on a pair-free corpus
    r = leakage_safe_split(d, {"train": 0.8, "valid": 0.1, "test": 0.1}, pairs=pairs)
    r = r.select("doc_id", "cluster", "split").cache()
    j = (
        pairs.join(
            r.select(F.col("doc_id").alias("doc_id_a"), F.col("split").alias("sa")),
            "doc_id_a",
        ).join(
            r.select(F.col("doc_id").alias("doc_id_b"), F.col("split").alias("sb")),
            "doc_id_b",
        )
    )
    assert j.filter("sa != sb").count() == 0
    # every doc assigned exactly once, fractions in the right ballpark
    assert r.count() == d.count()
    by = {x["split"]: x["count"] for x in r.groupBy("split").count().collect()}
    assert by.get("train", 0) > by.get("valid", 0)
    assert set(by) <= {"train", "valid", "test"}


def test_leakage_split_append_stable_and_portable(spark):
    """Without pairs the rule degenerates to the portable per-doc md5
    split; appending new docs never moves an old doc's assignment."""
    from feature_store_implementation_spark.operators.sampling import (
        leakage_safe_split,
    )

    base = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    r1 = {
        x["doc_id"]: x["split"]
        for x in leakage_safe_split(base, {"train": 0.9, "test": 0.1}).collect()
    }
    more = base.union(spark.createDataFrame([(i,) for i in range(200, 400)], "doc_id long"))
    r2 = {
        x["doc_id"]: x["split"]
        for x in leakage_safe_split(more, {"train": 0.9, "test": 0.1}).collect()
    }
    assert all(r2[i] == r1[i] for i in range(200))
    # python-side md5 oracle for the portable rule
    import hashlib

    for i in (0, 7, 123):
        want = "train" if hashlib.md5(str(i).encode()).hexdigest()[:4] < "e666" else "test"
        assert r1[i] == want


def test_leakage_split_bridging_pair_merges_clusters(spark):
    """A pair bridging two docs forces them into ONE cluster (the min id)
    and therefore one split, whatever the per-doc hashes said."""
    from feature_store_implementation_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 5), (5, 9)], "doc_id_a long, doc_id_b long"  # 0-5-9 chain
    )
    r = {
        x["doc_id"]: (x["cluster"], x["split"])
        for x in leakage_safe_split(docs, {"train": 0.5, "test": 0.5}, pairs=pairs).collect()
    }
    assert r[0][0] == r[5][0] == r[9][0] == 0  # transitive min-id cluster
    assert r[0][1] == r[5][1] == r[9][1]
    assert r[1][0] == 1  # untouched docs stay their own cluster


def test_leakage_split_fraction_validation(spark):
    import pytest
    from feature_store_implementation_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(docs, {"train": 0.8, "test": 0.1})
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(docs, {})


# ---------------------------------------------------------------------------
# shuffle_shards / write_training_shards
# ---------------------------------------------------------------------------


def test_shuffle_shards_matches_python_md5_oracle(spark):
    import hashlib
    from collections import defaultdict

    from feature_store_implementation_spark.operators.sampling import (
        shuffle_shards,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    rows = shuffle_shards(d, 16, seed=0).select("doc_id", "shard", "pos").collect()

    def py(doc_id, seed="0"):
        h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % 16, h

    exp = {r["doc_id"]: py(r["doc_id"]) for r in rows}
    assert all(exp[r["doc_id"]][0] == r["shard"] for r in rows)
    by = defaultdict(list)
    for i, (s, h) in exp.items():
        by[s].append((h, i))
    pos = {}
    for s, lst in by.items():
        for p, (h, i) in enumerate(sorted(lst), 1):
            pos[i] = p
    assert all(pos[r["doc_id"]] == r["pos"] for r in rows)


def test_shuffle_shards_seed_reshuffles_and_balances(spark):
    from feature_store_implementation_spark.operators.sampling import (
        shuffle_shards,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in shuffle_shards(d, 8, seed=0).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in shuffle_shards(d, 8, seed=1).collect()}
    # a fresh seed is a fresh permutation, not a relabeling
    assert sum(a[i] != b[i] for i in a) > len(a) // 2
    # uniform hash → shard sizes balance around n/8 (500/8 ≈ 62)
    from collections import Counter

    sizes = Counter(s for s, _ in a.values())
    assert len(sizes) == 8 and min(sizes.values()) > 30 and max(sizes.values()) < 95


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    import json
    import os

    from feature_store_implementation_spark.operators.sampling import (
        write_training_shards,
    )

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    path = str(tmp_path / "shards")
    m = write_training_shards(d, path, 8, seed=3)
    assert m["total_rows"] == d.count()
    assert set(m["shards"]) == {str(i) for i in range(8)}
    # one pos-ordered file per shard; pos contiguous from 1
    for s, info in m["shards"].items():
        assert info["files"] == 1 and info["bytes"] > 0
        part = spark.read.parquet(os.path.join(path, f"shard={s}"))
        ps = [r["pos"] for r in part.select("pos").collect()]
        assert sorted(ps) == list(range(1, info["rows"] + 1))
    disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert disk == m


def test_shuffle_shards_validates_n(spark):
    import pytest
    from feature_store_implementation_spark.operators.sampling import (
        shuffle_shards,
    )

    d = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(d, 0)


def test_cap_per_group_binding_and_repartition_stable(spark):
    """The per-source hard cap keeps exactly K per group, selection is
    md5(id)-ranked — identical regardless of how the input is
    partitioned (arrival order is NOT the rule: it reshuffles whenever
    the corpus repartitions) — and groups under the cap pass through
    whole."""
    from feature_store_implementation_spark.operators.sampling import (
        cap_per_group,
    )

    rows = [(i, f"s{i % 3}") for i in range(30)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    kept = cap_per_group(df, group_col="source", k=4)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 4, "s1": 4, "s2": 4, "tiny": 1}

    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_group(df.repartition(13), group_col="source", k=4).collect()
    )
    assert a == b  # partitioning-independent selection

    import pytest

    with pytest.raises(ValueError, match="positive"):
        cap_per_group(df, k=0)


def test_quota_sample_exact_quotas_and_min_stratum(spark):
    import math

    from feature_store_implementation_spark.operators.sampling import quota_sample

    d = load_table(spark, SF, "documents")
    # add a tiny synthetic stratum (2 rows) to exercise min_per_stratum
    tiny = d.limit(2).withColumn("lang", F.lit("xx"))
    full = d.unionByName(tiny)
    out = quota_sample(full, ["lang"], 0.2, ["doc_id"], min_per_stratum=1)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"] for r in full.groupBy("lang").count().collect()}
    assert got == {g: max(1, math.ceil(0.2 * n)) for g, n in base.items()}
    assert got["xx"] == 1  # 0.2 * 2 -> ceil = 1, small stratum represented


def test_quota_sample_partitioning_independent_and_rank_stable(spark):
    from feature_store_implementation_spark.operators.sampling import quota_sample

    d = load_table(spark, SF, "documents")
    a = {r["doc_id"] for r in quota_sample(d, ["lang"], 0.3, ["doc_id"]).collect()}
    b = {
        r["doc_id"]
        for r in quota_sample(d.repartition(17), ["lang"], 0.3, ["doc_id"]).collect()
    }
    assert a == b
    # superset stability: dropping non-selected rows never changes the
    # selection (md5 rank is content-determined, quota shrinks with |stratum|
    # only at the boundary)
    kept = quota_sample(d, ["lang"], 0.3, ["doc_id"])
    again = {
        r["doc_id"] for r in quota_sample(kept, ["lang"], 1.0, ["doc_id"]).collect()
    }
    assert again == a
