"""CCNet head/middle/tail binning, weight materialization, and URL
blocklist filtering (round-12): the selection-consumer surface — a score
becomes a bin, a weight becomes actual corpus rows, a blocklist becomes
a filter on raw crawl URLs."""

import pytest
from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.text import (
    bigram_cross_entropy_score,
    ccnet_bins,
    domain_filter,
)
from feature_store_implementation_spark.operators.sampling import resample_by_weight


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_ccnet_bins_terciles_and_directionality(spark):
    """Nine docs in one language split 3/3/3; the docs made of target
    tokens land in head, gibberish in tail."""
    target_words = "the quick brown fox jumps over a lazy dog again"
    rows = (
        [(i, target_words, "en") for i in range(3)]
        + [(i, "the quick zzz qqq fox", "en") for i in range(3, 6)]
        + [(i, "xqj zzv qpw mlk rrt", "en") for i in range(6, 9)]
    )
    d = _docs(spark, rows)
    out = {
        r["doc_id"]: r["bin"]
        for r in ccnet_bins(d, d.filter("doc_id < 3")).collect()
    }
    assert all(out[i] == "head" for i in range(3))
    assert all(out[i] == "middle" for i in range(3, 6))
    assert all(out[i] == "tail" for i in range(6, 9))


def test_ccnet_bins_per_language_cutoffs(spark):
    """Each language is binned against ITS OWN distribution: a language
    whose every doc scores worse than another language's tail still gets
    its own head — one global cutoff would mark whole languages tail."""
    rows = (
        [(1, "alpha beta gamma", "en"), (2, "alpha beta zeta", "en"),
         (3, "qqq www eee", "en")]
        + [(11, "uno dos tres", "es"), (12, "uno dos cuatro", "es"),
           (13, "xxx yyy zzz", "es")]
    )
    d = _docs(spark, rows)
    out = ccnet_bins(d, d.filter(F.col("doc_id").isin(1, 2)))
    bins = {r["doc_id"]: r["bin"] for r in out.collect()}
    # both languages produce a head doc, even though every es doc is
    # out-of-target (scores at the unseen-token ceiling)
    assert "head" in {bins[1], bins[2]} and bins[3] == "tail"
    assert "head" in {bins[11], bins[12], bins[13]}
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en", "es"}


def test_ccnet_bins_validates_fractions(spark):
    d = _docs(spark, [(1, "a", "en")])
    with pytest.raises(ValueError, match="fractions"):
        ccnet_bins(d, d, fractions=(0.7, 0.3))


def test_bigram_ce_catches_word_salad(spark):
    """The property that motivates the bigram order: a document made of
    TARGET WORDS in nonsense order has the exact same unigram
    distribution as in-order text — a unigram LM cannot tell them apart —
    but its bigrams are unseen, so the interpolated bigram CE separates
    them."""
    from feature_store_implementation_spark.operators.text import cross_entropy_score

    target_rows = [(100 + i, "the cat sat on the mat", "en") for i in range(5)]
    probe_rows = [
        (1, "the cat sat on the mat", "en"),   # in-order: seen bigrams
        (2, "mat the on sat cat the", "en"),   # same words, salad order
    ]
    d = _docs(spark, target_rows + probe_rows)
    target = d.filter("doc_id >= 100")
    bce = {
        r["doc_id"]: r["bigram_cross_entropy"]
        for r in bigram_cross_entropy_score(d, target).filter("doc_id < 100").collect()
    }
    uce = {
        r["doc_id"]: r["cross_entropy"]
        for r in cross_entropy_score(d, target).filter("doc_id < 100").collect()
    }
    assert uce[1] == uce[2]          # unigram LM is blind to order
    assert bce[1] < bce[2] - 0.5     # bigram LM is not


def test_bigram_ce_edges(spark):
    import pytest as _pytest

    d = _docs(spark, [(1, "a b", "en"), (2, "", "en"), (3, None, "en")])
    out = bigram_cross_entropy_score(d, d.filter("doc_id = 1"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1}          # tokenless docs absent
    assert rows[1]["n_tokens"] == 2  # BOS pad: every token scored once
    # empty target LM fails loudly, not NULL-everywhere
    with _pytest.raises(Exception, match="no tokens"):
        bigram_cross_entropy_score(d, d.filter("doc_id = 2")).collect()
    with _pytest.raises(ValueError, match="interpolation"):
        bigram_cross_entropy_score(d, d, interpolation=1.5)


def test_resample_by_weight_integer_weights_exact(spark):
    """frac(x) = 0 means NO coin: integer weight·scale replicates
    exactly, weight 0 vanishes."""
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, 1.0)], "doc_id long, weight double"
    )
    out = resample_by_weight(df, "weight", ["doc_id"], scale=2.0)
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {1: 4, 3: 2}
    # copy numbers are 1..n
    copies = sorted(r["copy"] for r in out.filter("doc_id = 1").collect())
    assert copies == [1, 2, 3, 4]


def test_resample_by_weight_mass_and_determinism(spark):
    """E[copies] = weight·scale: over many rows the realized mass lands
    within a few percent of the asked mass, and the materialization is
    bit-stable under repartitioning and append (each row's coin depends
    only on its own key)."""
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(0.37).alias("weight")
    )
    out = resample_by_weight(df, "weight", ["doc_id"], scale=1.0, seed="s")
    n = out.count()
    assert abs(n - 0.37 * 2000) < 0.05 * 2000
    again = resample_by_weight(
        df.repartition(13), "weight", ["doc_id"], scale=1.0, seed="s"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # append-stable: the first 1000 rows' outcome is unchanged by growth
    head = resample_by_weight(
        df.filter("doc_id < 1000"), "weight", ["doc_id"], scale=1.0, seed="s"
    )
    assert sorted(r["doc_id"] for r in head.collect()) == sorted(
        r["doc_id"] for r in out.filter("doc_id < 1000").collect()
    )
    # a different seed is a fresh independent rounding
    reseed = resample_by_weight(df, "weight", ["doc_id"], scale=1.0, seed="t")
    assert sorted(r["doc_id"] for r in reseed.collect()) != sorted(
        r["doc_id"] for r in out.collect()
    )


def test_resample_consumes_soft_dedup_weights(spark):
    """The composition the operator exists for: SoftDeDup weights at
    scale=K materialize each exact-duplicate CLUSTER to ~K total copies
    regardless of its size (mass equalization, not doc count)."""
    from feature_store_implementation_spark.operators.dedup import soft_dedup_weights

    rows = [(i, "dup dup dup") for i in range(10)] + [(100, "unique text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = soft_dedup_weights(df, "text", "doc_id")
    out = resample_by_weight(w, "weight", ["doc_id"], scale=6.0, seed="z")
    n_dup = out.filter("doc_id < 100").count()
    n_uni = out.filter("doc_id = 100").count()
    # cluster mass: 10 docs × 0.1 × 6 = 6 expected (integer part 0,
    # coin per doc) — allow the binomial spread; unique doc: exactly 6
    assert 1 <= n_dup <= 10
    assert n_uni == 6


def test_resample_by_weight_fanout_guard(spark):
    """A weight outlier × scale that would explode one row into millions
    of copies fails loudly instead of OOMing a task."""
    df = spark.createDataFrame([(1, 50.0)], "doc_id long, weight double")
    with pytest.raises(Exception, match="max_copies"):
        resample_by_weight(df, "weight", ["doc_id"], scale=1.0, max_copies=10).count()
    # at or under the cap: fine
    assert (
        resample_by_weight(df, "weight", ["doc_id"], scale=1.0, max_copies=50).count()
        == 50
    )


def test_ccnet_bins_approx_mode(spark):
    """exact=False (the 100 TB path: mergeable percentile_approx sketch)
    produces the same 3/3/3 terciles on a well-separated distribution."""
    target_words = "the quick brown fox jumps over a lazy dog again"
    rows = (
        [(i, target_words, "en") for i in range(3)]
        + [(i, "the quick zzz qqq fox", "en") for i in range(3, 6)]
        + [(i, "xqj zzv qpw mlk rrt", "en") for i in range(6, 9)]
    )
    d = _docs(spark, rows)
    out = {
        r["doc_id"]: r["bin"]
        for r in ccnet_bins(d, d.filter("doc_id < 3"), exact=False).collect()
    }
    assert all(out[i] == "head" for i in range(3))
    assert all(out[i] == "tail" for i in range(6, 9))


def test_domain_filter_modes(spark):
    """A registered-domain entry blocks every subdomain; an exact-host
    entry blocks only that host; everything else passes."""
    rows = [
        (1, "https://blog.example.com/a"),      # blocked via registered
        (2, "https://EXAMPLE.com/b?x=1"),       # blocked via registered
        (3, "https://ads.site.org/c"),          # blocked via exact host
        (4, "https://www.site.org/d"),          # NOT blocked (other host)
        (5, "https://keep.net/e"),              # clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame(
        [("Example.com ",), ("ads.site.org",)], "domain string"
    )
    kept = sorted(r["doc_id"] for r in domain_filter(df, bl).collect())
    assert kept == [4, 5]
    # original columns pass through untouched
    assert domain_filter(df, bl).columns == ["doc_id", "url"]


def test_domain_filter_plan_is_broadcast_anti(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    bl = spark.createDataFrame([("b.com",)], "domain string")
    plan = domain_filter(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2 and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "BatchEvalPython" not in plan
