"""DSIR importance weights + soft-dedup weights (round-11 additions)."""

import hashlib
import math

from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.dedup import soft_dedup_weights
from feature_store_implementation_spark.operators.sampling import (
    dsir_importance_weights,
    weighted_sample_wor,
)
from feature_store_implementation_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# -- pure-Python replay of the operator's exact arithmetic ------------------


def _py_buckets(text: str, n_buckets: int) -> list[int]:
    toks = [t for t in text.lower().split() if t]
    grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets for g in grams
    ]


def _py_dsir(raw: dict[str, str], target: dict[str, str], n_buckets: int, s: float):
    from collections import Counter

    per_doc = {d: Counter(_py_buckets(t, n_buckets)) for d, t in raw.items()}
    rdist: dict[int, int] = Counter()
    for c in per_doc.values():
        rdist.update(c)
    tdist: dict[int, int] = Counter()
    for t in target.values():
        tdist.update(_py_buckets(t, n_buckets))
    tr, tt = sum(rdist.values()), sum(tdist.values())
    lam = {
        b: round(
            math.log((tdist.get(b, 0) + s) / (tt + s * n_buckets))
            - math.log((cr + s) / (tr + s * n_buckets)),
            8,
        )
        for b, cr in rdist.items()
    }
    return {
        d: (
            sum(c.values()),
            round(sum(k * lam[b] for b, k in c.items()), 6),
        )
        for d, c in per_doc.items()
        if c
    }


def test_dsir_matches_pure_python_replay(spark):
    raw = {
        "a": "the cat sat on the mat",
        "b": "der hund lief im park herum",
        "c": "the dog ran in the park",
        "d": "le chat est sur le tapis",
        "e": "  ",  # tokenless -> absent from the output
    }
    target = {"t1": "the cat and the dog", "t2": "a dog ran on the mat"}
    raw_df = spark.createDataFrame(list(raw.items()), ["doc_id", "text"])
    tgt_df = spark.createDataFrame(list(target.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_importance_weights(
            raw_df, tgt_df, n_buckets=100, ngram_ns=(1, 2), smoothing=1.0
        ).collect()
    }
    want = _py_dsir(raw, target, 100, 1.0)
    assert got == want
    assert "e" not in got


def test_dsir_ranks_target_like_docs_higher(spark):
    d = load_table(spark, SF, "documents")
    w = dsir_importance_weights(d, d.filter(F.col("lang") == "en"))
    joined = w.join(d.select("doc_id", "lang"), "doc_id")
    means = {
        r["grp"]: r["m"]
        for r in joined.groupBy(
            F.when(F.col("lang") == "en", "en").otherwise("other").alias("grp")
        )
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    # English docs must look more target-like than the rest on average —
    # the directional property DSIR selection rests on
    assert means["en"] > means["other"]


def test_dsir_partitioning_independent(spark):
    d = load_table(spark, SF, "documents")
    tgt = d.filter(F.col("lang") == "en")
    a = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(d, tgt, n_buckets=500).collect()
    }
    b = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(
            d.repartition(13), tgt.repartition(7), n_buckets=500
        ).collect()
    }
    assert a == b


def test_dsir_feeds_weighted_resampling(spark):
    # the paper's pipeline: fit weights, then sample-without-replacement
    # on exp(log_weight) — smoke the composition end to end
    d = load_table(spark, SF, "documents")
    w = dsir_importance_weights(d, d.filter(F.col("lang") == "en"))
    pool = w.withColumn("imp", F.exp(F.col("log_weight")))
    picked = weighted_sample_wor(pool, 20, "imp", ["doc_id"])
    assert picked.count() == 20


def test_dsir_rejects_bad_params(spark):
    import pytest

    d = spark.createDataFrame([("a", "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_importance_weights(d, d, n_buckets=0)
    with pytest.raises(ValueError, match="smoothing"):
        dsir_importance_weights(d, d, smoothing=0.0)


# -- soft dedup --------------------------------------------------------------


def test_soft_dedup_cluster_sizes_and_weights(spark):
    rows = [
        ("a", "Hello   World"),
        ("b", "hello world"),  # same cluster as a (normalized)
        ("c", " HELLO\tWORLD "),  # same cluster again
        ("d", "something else"),
        ("e", "something else"),
        ("f", "unique doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["cluster_size"], r["weight"])
        for r in soft_dedup_weights(df).collect()
    }
    assert got == {
        "a": (3, round(1 / 3, 6)),
        "b": (3, round(1 / 3, 6)),
        "c": (3, round(1 / 3, 6)),
        "d": (2, 0.5),
        "e": (2, 0.5),
        "f": (1, 1.0),
    }
    # raw-byte keying separates the formatting variants
    raw = {
        r["doc_id"]: r["cluster_size"]
        for r in soft_dedup_weights(df, normalize=False).collect()
    }
    assert raw == {"a": 1, "b": 1, "c": 1, "d": 2, "e": 2, "f": 1}


def test_soft_dedup_weight_mass_equals_cluster_count(spark):
    # sum over members of 1/cluster_size == 1 per cluster, so total weight
    # mass == number of distinct normalized texts (the de-duplicated size)
    d = load_table(spark, SF, "documents")
    w = soft_dedup_weights(d)
    total = w.agg(F.sum("weight")).first()[0]
    n_clusters = (
        d.select(
            F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
        )
        .distinct()
        .count()
    )
    assert abs(total - n_clusters) < 1e-3
    assert w.count() == d.count()  # nothing dropped — that's the point


# -- CCNet-style target cross-entropy ----------------------------------------


def _py_cross_entropy(raw: dict[str, str], target: dict[str, str], s: float):
    from collections import Counter

    lm: Counter = Counter()
    for t in target.values():
        lm.update([w for w in t.lower().split() if w])
    tt, vocab = sum(lm.values()), len(lm)
    out = {}
    for d, t in raw.items():
        toks = [w for w in t.lower().split() if w]
        if not toks:
            continue
        num = sum(
            round(math.log((lm.get(w, 0) + s) / (tt + s * (vocab + 1))), 8)
            for w in toks
        )
        out[d] = (len(toks), round(-num / len(toks), 6))
    return out


def test_cross_entropy_matches_pure_python_replay(spark):
    from feature_store_implementation_spark.operators.text import cross_entropy_score

    raw = {
        "a": "the cat sat on the mat",
        "b": "zzz qqq www unseen gibberish tokens",
        "c": "the dog and the cat",
        "d": "",
    }
    target = {"t1": "the cat and the dog sat", "t2": "a dog on a mat"}
    raw_df = spark.createDataFrame(list(raw.items()), ["doc_id", "text"])
    tgt_df = spark.createDataFrame(list(target.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in cross_entropy_score(raw_df, tgt_df).collect()
    }
    assert got == _py_cross_entropy(raw, target, 1.0)
    assert "d" not in got  # tokenless -> absent
    # pure-OOV doc sits exactly at the unseen-floor ceiling
    tt = sum(len([w for w in t.split() if w]) for t in target.values())
    vocab = len({w for t in target.values() for w in t.lower().split() if w})
    floor = round(-round(math.log(1.0 / (tt + vocab + 1)), 8), 6)
    assert got["b"][1] == floor
    # and is strictly worse (higher) than every in-distribution doc
    assert got["b"][1] > got["a"][1] and got["b"][1] > got["c"][1]


def test_cross_entropy_ranks_target_like_docs_lower(spark):
    from feature_store_implementation_spark.operators.text import cross_entropy_score

    d = load_table(spark, SF, "documents")
    ce = cross_entropy_score(d, d.filter(F.col("lang") == "en"))
    joined = ce.join(d.select("doc_id", "lang"), "doc_id")
    means = {
        r["grp"]: r["m"]
        for r in joined.groupBy(
            F.when(F.col("lang") == "en", "en").otherwise("other").alias("grp")
        )
        .agg(F.avg("cross_entropy").alias("m"))
        .collect()
    }
    assert means["en"] < means["other"]  # lower = more target-like


def test_cross_entropy_rejects_bad_smoothing(spark):
    import pytest

    from feature_store_implementation_spark.operators.text import cross_entropy_score

    d = spark.createDataFrame([("a", "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="smoothing"):
        cross_entropy_score(d, d, smoothing=0.0)


# -- DSIR selection wired into the build pipeline ------------------------------


def test_build_with_dsir_selection(spark, tmp_path):
    from feature_store_implementation_spark.pipelines.pretraining import (
        build_pretraining_corpus,
        update_pretraining_corpus,
    )

    d = load_table(spark, SF, "documents")
    target = d.filter(F.col("lang") == "en").select("doc_id", "text")
    m = build_pretraining_corpus(
        d,
        str(tmp_path / "c1"),
        languages=("en", "fr", "de", "es", "zh"),
        semantic=False,
        select_target=target,
        select_budget=120,
        split_fractions={"train": 0.9, "valid": 0.05, "test": 0.05},
        n_shards=2,
        seed=7,
        dedup_index=True,
    )
    by_stage = {s["stage"]: s["n_docs"] for s in m["stages"]}
    assert by_stage["dsir_select"] == 120  # pool >> budget -> exactly K
    assert m["params"]["dsir_select"]["selected"] == 120
    assert sum(v["rows"] for v in m["splits"].values()) == 120

    # byte-identical replay: the selection is deterministic
    m2 = build_pretraining_corpus(
        d,
        str(tmp_path / "c2"),
        languages=("en", "fr", "de", "es", "zh"),
        semantic=False,
        select_target=target,
        select_budget=120,
        split_fractions={"train": 0.9, "valid": 0.05, "test": 0.05},
        n_shards=2,
        seed=7,
        dedup_index=True,
    )
    assert {k: v["fingerprint"] for k, v in m["splits"].items()} == {
        k: v["fingerprint"] for k, v in m2["splits"].items()
    }

    # corpus-global selection -> incremental updates refuse with guidance
    import pytest

    inc = d.limit(5).select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "lang")
    with pytest.raises(ValueError, match="dsir_select"):
        update_pretraining_corpus(inc, str(tmp_path / "c1"))


def test_build_rejects_half_specified_selection(spark, tmp_path):
    import pytest

    from feature_store_implementation_spark.pipelines.pretraining import (
        build_pretraining_corpus,
    )

    d = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="together"):
        build_pretraining_corpus(d, str(tmp_path / "x"), select_budget=10)
    with pytest.raises(ValueError, match="positive"):
        build_pretraining_corpus(
            d, str(tmp_path / "y"), select_target=d, select_budget=0
        )


def test_dsir_target_needs_no_id_column(spark):
    """ADVICE r11: the target distribution is id-free — a target frame
    carrying ONLY a text column must work (its ids, when present, were
    always discarded anyway)."""
    from feature_store_implementation_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    target_textonly = spark.createDataFrame(
        [("alpha beta",), ("alpha gamma",)], "text string"
    )
    out = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(raw, target_textonly).collect()
    }
    assert set(out) == {1, 2}
    assert out[1] > out[2]  # target-like doc scores higher


def test_cross_entropy_empty_target_raises_not_nulls(spark):
    """ADVICE r11: a tokenless target corpus must FAIL LOUDLY — silently
    returning NULL cross-entropy for every doc turns any quality gate
    built on it into a coin flip decided by null-handling."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from feature_store_implementation_spark.operators.text import cross_entropy_score

    raw = spark.createDataFrame([(1, "some words here")], "doc_id long, text string")
    empty_tgt = spark.createDataFrame([("",), ("   ",)], "text string")
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as exc:
        cross_entropy_score(raw, empty_tgt).collect()
    assert "target corpus has no tokens" in str(exc.value)
