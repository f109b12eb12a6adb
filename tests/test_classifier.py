"""fastText-style quality classifier (round-12): bounded-sample driver
training + UDF-free distributed scoring. The oracles here are the
correctness contract for the rows-only q_quality_classifier entry."""

import math

import pytest
from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.classifier import (
    classifier_scores,
    train_text_classifier,
)

POS_VOCAB = ["wiki", "article", "reference", "cited", "encyclopedia", "verified"]
NEG_VOCAB = ["click", "buy", "casino", "viagra", "winner", "free"]


def _corpus(spark, n=40):
    rows = []
    for i in range(n):
        w = [POS_VOCAB[(i + j) % len(POS_VOCAB)] for j in range(8)]
        rows.append((i, " ".join(w), 1))
    for i in range(n):
        w = [NEG_VOCAB[(i + j) % len(NEG_VOCAB)] for j in range(8)]
        rows.append((100 + i, " ".join(w), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_separates_and_generalizes(spark):
    """Train on half of each class, score everything: train AND held-out
    docs of each class land on their side of 0.5 (disjoint vocabularies
    are linearly separable in the hashed bag space)."""
    c = _corpus(spark)
    train_pos = c.filter("label = 1 AND doc_id % 2 = 0")
    train_neg = c.filter("label = 0 AND doc_id % 2 = 0")
    model = train_text_classifier(
        train_pos, train_neg, n_buckets=1 << 12, iters=100, sample_n=1000
    )
    assert model["train_acc"] == 1.0
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in classifier_scores(c, model).collect()
    }
    for r in c.select("doc_id", "label").collect():
        s = scores[r["doc_id"]]
        if r["label"] == 1:
            assert s > 0.5, (r["doc_id"], s)
        else:
            assert s < 0.5, (r["doc_id"], s)


def test_classifier_deterministic_and_partition_stable(spark):
    """Same data -> bit-identical model; scores exact across
    repartitionings (8-dp weights + decimal dot discipline)."""
    c = _corpus(spark, n=20)
    pos, neg = c.filter("label = 1"), c.filter("label = 0")
    m1 = train_text_classifier(pos, neg, n_buckets=1 << 12, iters=50, sample_n=100)
    m2 = train_text_classifier(
        pos.repartition(7), neg.repartition(3), n_buckets=1 << 12, iters=50,
        sample_n=100,
    )
    assert m1["weights"] == m2["weights"] and m1["bias"] == m2["bias"]
    s1 = sorted(classifier_scores(c, m1).collect())
    s2 = sorted(classifier_scores(c.repartition(11), m1).collect())
    assert s1 == s2


def test_classifier_scoring_matches_driver_math(spark):
    """The distributed broadcast-join dot product equals the plain
    numpy sigmoid for a hand-checked doc (1e-6, the rounding grain)."""
    c = _corpus(spark, n=20)
    model = train_text_classifier(
        c.filter("label = 1"), c.filter("label = 0"),
        n_buckets=1 << 12, iters=50, sample_n=100,
    )
    doc = c.filter("doc_id = 0")
    got = classifier_scores(doc, model).collect()[0]
    # replicate: tokens -> {1,2}-gram md5 buckets -> normalized dot
    import hashlib

    toks = doc.collect()[0]["text"].lower().split()
    grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    bkt = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % model["n_buckets"]
        for g in grams
    ]
    x = 1.0 / len(grams)
    margin = model["bias"] + sum(
        round(model["weights"][b] * 1, 8) * x for b in bkt
    )
    expect = 1.0 / (1.0 + math.exp(-round(margin, 8)))
    assert abs(got["quality_score"] - expect) < 2e-6
    assert got["n_feats"] == len(grams)


def test_classifier_bounded_sample_and_empty_class(spark):
    c = _corpus(spark, n=20)
    model = train_text_classifier(
        c.filter("label = 1"), c.filter("label = 0"),
        n_buckets=1 << 10, iters=10, sample_n=5,
    )
    assert model["n_pos"] == 5 and model["n_neg"] == 5
    with pytest.raises(ValueError, match="class"):
        train_text_classifier(
            c.filter("label = 1"), c.filter("doc_id = -1"),
            n_buckets=1 << 10, iters=10,
        )


def test_classifier_scoring_plan_is_udf_free(spark):
    c = _corpus(spark, n=10)
    model = train_text_classifier(
        c.filter("label = 1"), c.filter("label = 0"),
        n_buckets=1 << 10, iters=5, sample_n=50,
    )
    plan = (
        classifier_scores(c, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
