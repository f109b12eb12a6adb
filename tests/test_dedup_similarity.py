"""Dedup + similarity operators vs Python/numpy oracles — these are the
rows-only queries in the driver harness, so their exactness is proven here
(SURVEY §5.1: non-SQL-expressible ops get library-level oracles)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    embedding_near_dup_pairs,
)
from feature_store_implementation_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

BASE = (
    "spark group query row data slow small filter customer line the batch value "
    "merge line table data line join agg window sort scan hash part order stream"
)


def _docs(spark):
    variants = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("query", "plan").replace("sort", "topk")),  # near-dup
        (3, "totally different words about cooking pasta with garlic and oil"),
        (4, BASE.replace("spark", "flink")),  # near-dup of 0
        (5, "another unrelated document mentioning mountains rivers and hiking"),
    ]
    return spark.createDataFrame(variants, "doc_id long, text string")


def _py_shingles(text, n=3):
    toks = [t for t in text.lower().split() if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup_deterministic_survivor(spark):
    df = _docs(spark)
    out = {r["text"]: r for r in exact_dedup(df, ["text"], "doc_id").collect()}
    assert out[BASE]["keep_id"] == 0 and out[BASE]["n_copies"] == 2


def test_minhash_finds_planted_near_dups_with_exact_jaccard(spark):
    df = _docs(spark)
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(df, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 4) in pairs and (1, 4) in pairs  # one-word edit → high jaccard
    # reported jaccard must equal the exact python-set jaccard
    for (a, b), j in pairs.items():
        sa, sb = _py_shingles(dict(_rows(df))[a]), _py_shingles(dict(_rows(df))[b])
        exact = len(sa & sb) / len(sa | sb)
        assert abs(j - exact) < 1e-6
    # unrelated docs must not pair
    assert not any({3, 5} & {a, b} for a, b in pairs)


def _rows(df):
    return [(r["doc_id"], r["text"]) for r in df.collect()]


def test_simhash_near_dups(spark):
    df = _docs(spark)
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0  # identical text → identical simhash
    assert all(h <= 3 for h in pairs.values())
    assert not any({3, 5} & {a, b} for a, b in pairs)


def test_ngram_jaccard_blocked(spark):
    df = _docs(spark).withColumn("blk", F.lit("x"))
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, block_col="blk", threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs


@pytest.fixture(scope="module")
def emb(spark):
    from feature_store_implementation_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()


def test_brute_force_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(emb, q, k=5).toPandas()
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = np.lexsort((ids, -cos.round(6)))[:5]
        expect = [int(ids[i]) for i in order]
        have = got[got.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert have == expect, f"query {qid}: {have} != {expect}"


def test_lsh_topk_recall_clustered(spark):
    """Recall is measured on CLUSTERED vectors — the regime ANN is for.
    (On uniformly random vectors nearest neighbors are nearly orthogonal and
    every LSH family degrades to chance; the real embeddings table is random,
    so it only gets the self-hit check below.)"""
    rng = np.random.RandomState(3)
    centers = rng.randn(8, 32) * 2
    rows = [
        (int(i), (centers[i % 8] + 0.15 * rng.randn(32)).tolist()) for i in range(400)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, q, k=5).toPandas()
    approx = lsh_topk(corpus, q, k=5, n_planes=10, dim=32, multiprobe=True).toPandas()
    hits = total = 0
    for qid in range(8):
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(e & a)
        total += len(e)
    recall = hits / total
    assert recall >= 0.8, f"LSH recall@5 on clustered data too low: {recall}"


def test_lsh_topk_self_hit(spark, emb):
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = lsh_topk(emb, q, k=5, n_planes=10, multiprobe=True).toPandas()
    # rank-1 self-hit must always survive bucketing (identical vector)
    self_hits = approx[(approx["rank"] == 1)]
    assert all(self_hits["query_id"] == self_hits["vec_id"])


def test_embedding_near_dup_planted(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(16)
    rows = [
        (0, (base / np.linalg.norm(base)).tolist()),
        (1, (base / np.linalg.norm(base) + 0.01 * rng.randn(16)).tolist()),  # near-dup
        (2, rng.randn(16).tolist()),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["vec_id_a"], r["vec_id_b"]) for r in
             embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert (0, 1) in pairs and len(pairs) == 1


def test_ivf_full_probe_equals_brute_force(spark):
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {tuple(r) for r in brute_force_topk(e, q, k=10).collect()}
    full_probe = {
        tuple(r) for r in ivf_topk(e, q, k=10, n_cells=8, n_probe=8).collect()
    }
    assert full_probe == exact


def test_ivf_partial_probe_recall(spark):
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(e, q, k=10).collect()}
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(e, q, k=10, n_cells=16, n_probe=6).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.3


def test_ivf_default_refined_centroids_recall_floor(spark):
    """Pinned recall@10 floor for the DEFAULT ivf_topk configuration
    (refine_iters=1) on the sf0.01 embeddings (500 vectors, 16 cells —
    deterministic, so these are exact regression values). The floors are
    calibrated to the RANDOM-BULK regime, where partial-probe recall for
    ANY well-spread centroid set sits at ~0.6-0.75 (measured across 16
    consecutive-slice inits and 10 k-means++ draws): ≥0.55 at n_probe=6,
    ≥0.4 at 4. The original 0.9 floor was an evaluation artifact of the
    first-k-by-id init: queries 0-9 were themselves the centroid seeds,
    so their cells centered on the queries — a bias, not routing quality
    (the hash-spread k-means++ seeding removed it). The regime where
    high recall is a real requirement — clustered corpora — is pinned
    separately at ≥0.95 (test_ivf_index_partial_probe... and the LSH
    clustered-recall tests)."""
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(e, q, k=10).collect()}

    def recall(n_probe):
        hits = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(e, q, k=10, n_cells=16, n_probe=n_probe).collect()
        }
        return len(hits & exact) / len(exact)

    assert recall(6) >= 0.55
    assert recall(4) >= 0.4


def test_ivf_kmeans_refinement_improves_or_holds_recall(spark):
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(e, q, k=10).collect()}

    def recall(df):
        hits = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        return len(hits & exact) / len(exact)

    r_plain = recall(ivf_topk(e, q, k=10, n_cells=16, n_probe=4))
    r_refined = recall(ivf_topk(e, q, k=10, n_cells=16, n_probe=4, refine_iters=3))
    # Lloyd balancing should not collapse recall; typically it improves it
    assert r_refined >= max(0.2, r_plain - 0.1)


def test_topk_k_larger_than_corpus(spark):
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(5)
    q = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(e, q, k=100).groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in out)


def test_int8_quantize_matches_numpy_and_bounds_error(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from feature_store_implementation_spark.functions.vector import (
        int8_dequantize_col,
        int8_quantize_col,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    rows = (
        emb.select(
            "vec_id",
            "embedding",
            int8_quantize_col(F.col("embedding")).alias("qs"),
        )
        .select(
            "vec_id",
            "embedding",
            F.col("qs.q").alias("q"),
            F.col("qs.scale").alias("scale"),
            int8_dequantize_col(F.col("qs")).alias("back"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        x = np.array(r["embedding"], dtype=np.float64)
        mx = np.abs(x).max()
        if mx == 0:
            assert all(v == 0 for v in r["q"])
            continue
        expect = np.round(x * 127.0 / np.float64(np.float32(mx)))
        assert [int(v) for v in r["q"]] == [int(v) for v in expect]
        # dequantization error bounded by half a quantization step
        err = np.abs(np.array(r["back"]) - x)
        assert err.max() <= (mx / 127.0) * 0.5 + 1e-6


def test_pii_redact_counts_and_tokens(spark):
    from feature_store_implementation_spark.operators.text import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@site-x.org or 10.0.0.1 then call 555-123-4567"),
            (2, "nothing sensitive here"),
            (3, "two mails x@y.io z@w.co and ip 255.255.255.255"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (1, 1, 1)
    assert got[1]["clean_text"] == "mail me at <EMAIL> or <IP> then call <PHONE>"
    assert (got[2]["n_email"], got[2]["n_ip"], got[2]["n_phone"]) == (0, 0, 0)
    assert got[2]["clean_text"] == "nothing sensitive here"
    assert got[3]["n_email"] == 2 and got[3]["n_ip"] == 1
    assert got[3]["clean_text"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_repetition_stats_exact(spark):
    from feature_store_implementation_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "x y z"), (3, "w w w w")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert (got[1]["n_words"], got[1]["n_distinct"]) == (6, 3)
    assert got[1]["dup_frac"] == 0.5 and got[1]["top_share"] == 0.5
    assert got[2]["dup_frac"] == 0.0 and got[2]["top_share"] == round(1 / 3, 6)
    assert got[3]["dup_frac"] == 0.75 and got[3]["top_share"] == 1.0


def test_decontaminate_flags_shared_shingles(spark):
    from feature_store_implementation_spark.operators.dedup import decontaminate

    eight = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [
            (10, f"prefix {eight} suffix words here"),   # shares the 8-gram
            (11, "totally different content with no overlap at all kept"),
            (12, eight),                                  # exact 8-gram doc
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(99, eight)], "doc_id long, text string")
    got = {r["doc_id"]: r["n_shared"] for r in decontaminate(train, ev).collect()}
    assert 10 in got and 12 in got and 11 not in got
    assert got[12] == 1


def test_decontaminate_short_docs_whole_sequence(spark):
    # docs shorter than n tokens participate as one whole-sequence shingle
    from feature_store_implementation_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other text")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    got = {r["doc_id"]: r["n_shared"] for r in decontaminate(train, ev).collect()}
    assert got == {1: 1}


def test_pack_sequences_exact_layout(spark):
    from feature_store_implementation_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [
            (1, "a b c"),            # 3 tokens, offset 0,  chunk 0
            (2, "d e f g"),          # 4 tokens, offset 3,  chunk 0
            (3, ""),                 # empty -> dropped
            (4, "h i j k l m"),      # 6 tokens, offset 7,  chunks 0-1 (budget 10)
            (5, "n"),                # 1 token,  offset 13, chunk 1
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pack_sequences(df, budget=10).collect()}
    assert 3 not in got
    assert (got[1]["start_offset"], got[1]["chunk_first"], got[1]["chunk_last"]) == (0, 0, 0)
    assert (got[2]["start_offset"], got[2]["chunk_first"], got[2]["chunk_last"]) == (3, 0, 0)
    assert (got[4]["start_offset"], got[4]["chunk_first"], got[4]["chunk_last"]) == (7, 0, 1)
    assert (got[5]["start_offset"], got[5]["chunk_first"], got[5]["chunk_last"]) == (13, 1, 1)


def test_pack_sequences_empty_input(spark):
    from feature_store_implementation_spark.operators.text import pack_sequences

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty).collect() == []


# ---------------------------------------------------------------------------
# scale guards + recall floors (VERDICT r3 items 2, 3, 6, 7)
# ---------------------------------------------------------------------------


def test_simhash_hot_bucket_capped(spark):
    # A pathological bucket (> max_bucket band-identical docs) must yield
    # ZERO candidates — the unbounded band self-join was the one genuine
    # 100 TB scale bug in r3. Raising the cap restores every pair.
    rows = [(i, "identical boilerplate page content here") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert simhash_near_dup_pairs(df, max_bucket=5).collect() == []
    uncapped = simhash_near_dup_pairs(df, max_bucket=100).collect()
    assert len(uncapped) == 12 * 11 // 2
    assert all(r["hamming"] == 0 for r in uncapped)


@pytest.fixture(scope="module")
def docs_sf001(spark):
    from feature_store_implementation_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.01", "documents").cache()


def test_simhash_matches_bruteforce_sf001(spark, docs_sf001):
    """Pigeonhole banding is exhaustive within the Hamming radius: with no
    bucket over the cap, the banded plan must equal the all-pairs truth."""
    from feature_store_implementation_spark.operators.dedup import simhash_signatures

    sigs = simhash_signatures(docs_sf001, "text", "doc_id").collect()
    ids = [r["doc_id"] for r in sigs]
    vals = [r["simhash"] & 0xFFFFFFFFFFFFFFFF for r in sigs]
    truth = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(vals[i] ^ vals[j]).count("1") <= 3:
                truth.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in simhash_near_dup_pairs(docs_sf001, max_hamming=3).collect()
    }
    assert got == truth


def test_minhash_recall_floor_sf001(spark, docs_sf001):
    """MinHash-LSH vs the EXACT 3-gram Jaccard truth (shingle-route
    ngram_jaccard_pairs is exact): recall floor 0.9, precision exactly 1
    (the verify stage recomputes true Jaccard, so no false positives)."""
    exact = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in ngram_jaccard_pairs(docs_sf001, n=3, threshold=0.5).collect()
    }
    mh = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_near_dup_pairs(docs_sf001, threshold=0.5).collect()
    }
    assert mh <= exact  # precision 1.0
    assert len(mh & exact) / len(exact) >= 0.9  # observed 0.96, deterministic


def test_embedding_lsh_recall_floor_sf001(spark):
    """Default multi-table sign-LSH route vs the all-pairs truth at the
    adversarial threshold 0.45 (near the top of a random-vector cosine
    distribution — much harder than real near-dup thresholds ≥ 0.9).
    Deterministic planes → this is a fixed number, not a flaky sample."""
    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup_pairs(
            e, "embedding", "vec_id", threshold=0.45, candidates="all"
        ).collect()
    }
    lsh = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup_pairs(
            e, "embedding", "vec_id", threshold=0.45
        ).collect()
    }
    assert lsh <= truth  # exact cosine verify → no false positives
    assert len(lsh & truth) / len(truth) >= 0.95  # observed 1.0


def test_ngram_shingle_route_equals_block_route(spark):
    """The inverted-index candidate route is EXACT: any pair at jaccard ≥ t
    > 0 shares a shingle, so both routes must return identical rows."""
    df = _docs(spark).withColumn("blk", F.lit("x"))
    a = {
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            df, block_col="blk", threshold=0.5, candidates="shingle"
        ).collect()
    }
    b = {
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            df, block_col="blk", threshold=0.5, candidates="block"
        ).collect()
    }
    assert a == b and len(a) > 0


def test_ngram_max_posting_caps_hot_shingles(spark):
    # every doc shares the hot shingle; with the posting cap below the
    # corpus size those candidates are dropped (documented approximation)
    rows = [(i, "common shared shingle here") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert ngram_jaccard_pairs(df, threshold=0.5, max_posting=4).collect() == []
    full = ngram_jaccard_pairs(df, threshold=0.5, max_posting=100).collect()
    assert len(full) == 8 * 7 // 2


def test_ngram_default_posting_cap_is_bounded(spark):
    """VERDICT-r4 #2: no dedup-family code path may generate pairs from an
    unbounded group BY DEFAULT. The signature default must be a finite cap
    (mirroring max_bucket in the MinHash/SimHash/embedding paths)."""
    import inspect

    default = inspect.signature(ngram_jaccard_pairs).parameters["max_posting"].default
    assert default is not None and default <= 100_000


def test_ngram_pathological_stopword_shingle(spark):
    """Pathological-shingle case (mirrors the simhash max_bucket test): one
    stopword 3-gram appears in EVERY doc; with the cap below corpus size,
    pair generation from that posting list is suppressed, but true near-dup
    pairs still surface through their distinctive shared shingles — and the
    reported jaccard stays EXACT (computed on full shingle sets, not the
    surviving postings)."""
    stop = "of the and"
    near_a = f"{stop} quick brown fox jumps high"
    near_b = f"{stop} quick brown fox jumps far"
    rows = [(0, near_a), (1, near_b)] + [
        (i, f"{stop} unique{i} filler{i} tail{i} pad{i}") for i in range(2, 12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3, max_posting=5).collect()
    }
    # the only surviving pair is the true near-dup, found via its
    # distinctive "quick brown fox" shingles despite the capped stopword one
    assert set(got) == {(0, 1)}
    truth = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3, max_posting=None).collect()
    }
    assert got[(0, 1)] == truth[(0, 1)]


# ---------------------------------------------------------------------------
# line_dedup (VERDICT r3 item 4 + ADVICE)
# ---------------------------------------------------------------------------


def _line_dedup_rows(spark, rows, max_doc_freq=2):
    from feature_store_implementation_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"])
        for r in line_dedup(df, "text", "doc_id", max_doc_freq=max_doc_freq).collect()
    }


def test_line_dedup_drops_boilerplate_preserves_order(spark):
    out = _line_dedup_rows(
        spark,
        [
            (0, "HEADER\nalpha\nbeta\nFOOTER"),
            (1, "HEADER\ngamma\nFOOTER"),
            (2, "HEADER\ndelta\nepsilon\nFOOTER"),
        ],
    )
    # HEADER/FOOTER occur in 3 > 2 docs → dropped; body order preserved
    assert out[0] == ("alpha\nbeta", 2)
    assert out[1] == ("gamma", 1)
    assert out[2] == ("delta\nepsilon", 2)


def test_line_dedup_within_doc_repeats_and_all_boiler(spark):
    out = _line_dedup_rows(
        spark,
        [
            (0, "x\nx\nBOILER"),  # within-doc repeat: only 1 distinct doc → kept
            (1, "BOILER\nBOILER"),  # within-doc repeats count ONE distinct doc
            (2, "BOILER\ny"),
            (3, "BOILER"),  # all lines boilerplate → empty string, 0 kept
        ],
    )
    assert out[0] == ("x\nx", 2)
    assert out[1] == ("", 0)
    assert out[3] == ("", 0)


def test_line_dedup_blank_lines_never_boilerplate(spark):
    # ADVICE: blank lines appear in every multi-paragraph doc; stripping
    # them would delete all paragraph structure corpus-wide → exempt
    out = _line_dedup_rows(
        spark,
        [(i, f"para{i}\n\ntail{i}") for i in range(5)],
    )
    for i in range(5):
        assert out[i] == (f"para{i}\n\ntail{i}", 3)


def test_line_dedup_crlf_matches_lf(spark):
    # ADVICE: CRLF must not defeat cross-doc matching
    out = _line_dedup_rows(
        spark,
        [
            (0, "SAME\r\nbody0"),
            (1, "SAME\nbody1"),
            (2, "SAME\r\nbody2"),
        ],
    )
    assert out[0] == ("body0", 1)
    assert out[1] == ("body1", 1)
    assert out[2] == ("body2", 1)


def test_line_dedup_duplicate_ids_and_null_text(spark):
    from feature_store_implementation_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(0, "a\nb"), (0, "a\nb"), (1, None)], "doc_id long, text string"
    )
    rows = line_dedup(df, "text", "doc_id").collect()
    assert len(rows) == 2  # duplicate ids collapse to one output row each
    by_id = {r["doc_id"]: (r["clean_text"], r["n_lines_kept"]) for r in rows}
    assert by_id[0] == ("a\na\nb\nb", 4)  # duplicate rows merge, pos-sorted
    assert by_id[1] == ("", 0)  # NULL text → '' (documented coercion)


def test_unigram_logprob_exact(spark):
    import math

    from feature_store_implementation_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    # corpus counts: a=2 b=2 c=1, total=5
    lp = lambda p: round(math.log(p), 8)
    assert 2 not in out  # zero-token doc absent
    assert out[0]["n_tokens"] == 3
    assert abs(out[0]["avg_logprob"] - round((2 * lp(0.4) + lp(0.4)) / 3, 6)) < 1e-9
    assert out[1]["n_tokens"] == 2
    assert abs(out[1]["avg_logprob"] - round((lp(0.4) + lp(0.2)) / 2, 6)) < 1e-9
    # the corpus-typical doc outranks the rarer-token doc
    assert out[0]["avg_logprob"] > out[1]["avg_logprob"]


def test_embedding_lsh_verify_routes_agree(spark, embeddings_sf001=None):
    """The broadcast and join verify routes must return identical pairs and
    cosines — the route is a physical choice gated on corpus size, never a
    semantic one."""
    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    bcast = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(
            e, "embedding", "vec_id", threshold=0.45
        ).collect()
    }
    joined = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(
            e, "embedding", "vec_id", threshold=0.45, broadcast_verify_max_rows=0
        ).collect()
    }
    assert bcast == joined and len(bcast) > 0


def test_candidates_stage_supersets_verified_pairs(spark):
    """stage="candidates" (the scale-audit surface used by
    tools/scale_check.py) must return exactly the pre-verify candidate
    pairs: a superset of the verified output, id-typed two-column schema,
    a < b ordering."""
    df = _docs(spark)

    def ids(frame, a, b):
        rows = frame.select(a, b).collect()
        assert all(r[a] < r[b] for r in rows)
        return {(r[a], r[b]) for r in rows}

    for fn, kw in [
        (minhash_near_dup_pairs, {"threshold": 0.5}),
        (simhash_near_dup_pairs, {"max_hamming": 3}),
        (ngram_jaccard_pairs, {"threshold": 0.2}),
    ]:
        cands = fn(df, stage="candidates", **kw)
        assert cands.columns == ["doc_id_a", "doc_id_b"]
        c = ids(cands, "doc_id_a", "doc_id_b")
        v = ids(fn(df, stage="pairs", **kw), "doc_id_a", "doc_id_b")
        assert v <= c, f"{fn.__name__}: verified pairs not within candidates"

    rng = np.random.RandomState(7)
    base = rng.randn(16)
    rows = [
        (0, (base / np.linalg.norm(base)).tolist()),
        (1, (base / np.linalg.norm(base) + 0.01 * rng.randn(16)).tolist()),
        (2, rng.randn(16).tolist()),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cands = embedding_near_dup_pairs(e, threshold=0.95, stage="candidates")
    assert cands.columns == ["vec_id_a", "vec_id_b"]
    c = ids(cands, "vec_id_a", "vec_id_b")
    v = ids(embedding_near_dup_pairs(e, threshold=0.95), "vec_id_a", "vec_id_b")
    assert v <= c


def test_embedding_lsh_auto_plane_width():
    """Signature width must grow with corpus size (the sub-quadratic LSH
    discipline): fixed-width sign-LSH collides a CONSTANT fraction of the
    random bulk, so candidate mass is N^2 no matter the bucket caps."""
    from feature_store_implementation_spark.operators.dedup import _auto_planes

    assert _auto_planes(0) == 10
    assert _auto_planes(500) == 10
    assert _auto_planes(2000) == 12
    assert _auto_planes(50_000) == 17
    assert _auto_planes(10**9) == 24  # capped: scale n_tables past this
    widths = [_auto_planes(n) for n in (10, 100, 10_000, 10**6, 10**9)]
    assert widths == sorted(widths)


def test_embedding_lsh_auto_width_recall_clustered(spark):
    """Recall at a REALISTIC near-dup threshold (0.9) with the auto-scaled
    width on a clustered corpus large enough that the width exceeds the
    10-bit floor (N=3000 -> r=13). Deterministic planes, fixed seed."""
    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    for c in range(150):
        center = rng.randn(32)
        center /= np.linalg.norm(center)
        for _ in range(20):
            v = center + 0.08 * rng.randn(32)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    truth = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup_pairs(
            df, threshold=0.9, candidates="all"
        ).collect()
    }
    lsh = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    assert lsh <= truth  # exact verify -> no false positives
    assert len(truth) > 1000
    assert len(lsh & truth) / len(truth) >= 0.99


def test_simhash_128bit_matches_bruteforce_sf001(spark, docs_sf001):
    """128-bit fingerprints (the past-10^6-docs path: 32-bit pigeonhole
    bands shrink the random band-collision mass by 2^-16) must equal the
    all-pairs 128-bit truth when no bucket overflows — same exhaustiveness
    guarantee as the 64-bit path, verified against Spark's own collected
    signatures with a Python popcount oracle."""
    from feature_store_implementation_spark.operators.dedup import simhash_signatures

    sigs = simhash_signatures(docs_sf001, "text", "doc_id", bits=128).collect()
    ids = [r["doc_id"] for r in sigs]
    vals = [
        tuple(w & 0xFFFFFFFFFFFFFFFF for w in r["simhash"]) for r in sigs
    ]
    assert all(len(v) == 2 for v in vals)
    truth = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = sum(bin(a ^ b).count("1") for a, b in zip(vals[i], vals[j]))
            if d <= 3:
                truth.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in simhash_near_dup_pairs(docs_sf001, max_hamming=3, bits=128).collect()
    }
    assert got == truth


def test_simhash_bits_validation(spark):
    from feature_store_implementation_spark.operators.dedup import simhash_signatures

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of 64"):
        simhash_signatures(df, "text", "doc_id", bits=96)
    # 256 bits over 2 bands would need 128-bit band values
    with pytest.raises(ValueError, match="fit in 64 bits"):
        simhash_near_dup_pairs(df, max_hamming=1, bits=256)


def test_kmeans_clusters_separated_corpus(spark):
    """Well-separated clusters must be recovered exactly: same-cluster
    points share a label, cross-cluster points never do, every label is in
    [0, k), and the reported cosine is the point->own-centroid cosine
    (>= any cross-centroid cosine). Deterministic: two runs identical."""
    from feature_store_implementation_spark.operators.similarity import kmeans_clusters

    rng = np.random.RandomState(3)
    centers = [rng.randn(16) for _ in range(3)]
    rows, truth = [], {}
    vid = 0
    for ci, c in enumerate(centers):
        c = c / np.linalg.norm(c)
        for _ in range(40):
            v = c + 0.05 * rng.randn(16)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            truth[vid] = ci
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["cluster"], r["cosine"])
           for r in kmeans_clusters(df, k=3, iters=4).collect()}
    assert set(got) == set(truth)
    assert all(0 <= c < 3 for c, _ in got.values())
    assert all(cos > 0.9 for _, cos in got.values())
    # label partition matches the generating partition (up to renaming)
    from collections import defaultdict
    label_of = {}
    for vid_, (cl, _) in got.items():
        t = truth[vid_]
        label_of.setdefault(t, cl)
        assert label_of[t] == cl, "same generated cluster split across labels"
    assert len(set(label_of.values())) == 3, "distinct clusters merged"
    again = {r["vec_id"]: (r["cluster"], r["cosine"])
             for r in kmeans_clusters(df, k=3, iters=4).collect()}
    assert again == got


def test_kmeans_clusters_empty_raises(spark):
    from feature_store_implementation_spark.operators.similarity import kmeans_clusters

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-empty"):
        kmeans_clusters(df)


def test_auto_simhash_bits_scales_with_corpus():
    from feature_store_implementation_spark.operators.dedup import _auto_simhash_bits

    # width per band = ceil(log2 N) + 1, rounded up to 64-bit words
    assert _auto_simhash_bits(1, 3) == 64
    assert _auto_simhash_bits(5_000, 3) == 64          # 14-bit bands fit in 64
    assert _auto_simhash_bits(32_768, 3) == 64         # 16*4 = 64 exactly
    assert _auto_simhash_bits(50_000, 3) == 128        # 17*4 = 68 → 2 words
    assert _auto_simhash_bits(10**8, 3) == 128         # 28*4 = 112 → 2 words
    assert _auto_simhash_bits(10**12, 3) == 192        # 41*4 = 164 → 3 words
    # cap: bands must fit one 64-bit word → bits ≤ 64·(d+1)
    assert _auto_simhash_bits(10**30, 3) == 256
    assert _auto_simhash_bits(10**30, 1) == 128
    # narrower Hamming radius → fewer bands → same width needs fewer bits
    assert _auto_simhash_bits(50_000, 1) == 64


def test_auto_simhash_default_matches_explicit_width(spark):
    df = _docs(spark)  # 6 docs → auto picks 64-bit
    auto = sorted(map(tuple, simhash_near_dup_pairs(df, max_hamming=3).collect()))
    explicit = sorted(
        map(tuple, simhash_near_dup_pairs(df, max_hamming=3, bits=64).collect())
    )
    assert auto == explicit and len(auto) > 0


def test_candidates_stage_rejects_routes_without_candidates(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="candidate"):
        ngram_jaccard_pairs(
            docs, candidates="block", block_col=None, stage="candidates"
        )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="candidate"):
        embedding_near_dup_pairs(vecs, candidates="all", stage="candidates")
    with pytest.raises(ValueError, match="candidate"):
        embedding_near_dup_pairs(
            vecs.withColumn("blk", F.lit(1)), block_col="blk", stage="candidates"
        )


def test_scoped_cache_window_bounds_live_caches(spark):
    from feature_store_implementation_spark.operators import dedup as D

    df = _docs(spark)
    with D.cache_scope(window=4) as scope:
        for _ in range(4 + 3):
            minhash_near_dup_pairs(df, threshold=0.5).count()
        assert len(scope.frames) <= 4
        # evicted frames recompute correctly: the earliest result reproduces
        pairs = minhash_near_dup_pairs(df, threshold=0.5).collect()
        assert any((r["doc_id_a"], r["doc_id_b"]) == (0, 1) for r in pairs)
        live = [f for f, _ in scope.frames]
        assert all(f.storageLevel.useMemory for f in live)
    # scope exit unpersists everything it cached
    assert scope.frames == []
    assert all(not f.storageLevel.useMemory for f in live)
    # with no scope active, the bounded session-default window applies
    minhash_near_dup_pairs(df, threshold=0.5).count()
    assert 0 < len(D._DEFAULT_SCOPE.frames) <= D._DEFAULT_SCOPE.window


def test_cache_scope_stack_is_thread_local(spark):
    """A scope opened on another thread (the streaming foreachBatch
    shape) must not capture frames a concurrently-running driver-thread
    caller caches — and its exit must not release them."""
    import threading

    from feature_store_implementation_spark.operators import dedup as D

    df = _docs(spark)
    entered, proceed = threading.Event(), threading.Event()
    captured: list = []

    def other_thread():
        with D.cache_scope(window=2) as scope:
            entered.set()
            proceed.wait(30)
            captured.append(list(scope.frames))

    t = threading.Thread(target=other_thread)
    t.start()
    try:
        assert entered.wait(30)
        # main thread has NO scope of its own open: its frame must go to
        # the default window, not the other thread's live scope
        frame = D._cache_scoped(df.select("doc_id"))
        assert frame.storageLevel.useMemory
    finally:
        proceed.set()
        t.join(30)
    assert captured == [[]]  # the other thread's scope stayed empty
    assert frame.storageLevel.useMemory  # ...and its exit released nothing


def test_cache_scopes_nest_independently(spark):
    """A composed pipeline's inner scope must not evict (or release)
    frames its caller's scope still holds — the stale-read /
    silent-recompute pathology of the old session-global window."""
    from feature_store_implementation_spark.operators import dedup as D

    df = _docs(spark)
    with D.cache_scope(window=2) as outer:
        minhash_near_dup_pairs(df, threshold=0.5).count()
        outer_frames = [f for f, _ in outer.frames]
        assert outer_frames and all(
            f.storageLevel.useMemory for f in outer_frames
        )
        with D.cache_scope(window=2) as inner:
            # churn PAST the window inside the nested scope over a
            # DIFFERENT frame...
            sub = df.filter("doc_id < 4")
            for _ in range(5):
                minhash_near_dup_pairs(sub, threshold=0.5).count()
            assert len(inner.frames) <= 2
            # ...and the outer scope's frames are untouched: still cached
            assert [f for f, _ in outer.frames] == outer_frames
            assert all(f.storageLevel.useMemory for f in outer_frames)
        # inner exit released ITS frames only
        assert all(f.storageLevel.useMemory for f in outer_frames)

        # the sharp edge: Spark's CacheManager keys cached data by
        # LOGICAL PLAN, so an inner scope caching the IDENTICAL frame
        # (same df, same params) shares the outer scope's cache entry —
        # its exit must NOT drop it (plan-refcounted release)
        with D.cache_scope(window=2):
            minhash_near_dup_pairs(df, threshold=0.5).count()
        assert all(f.storageLevel.useMemory for f in outer_frames)
    assert all(not f.storageLevel.useMemory for f in outer_frames)


def test_plan_refcounts_keyed_per_session(spark):
    """semanticHash is plan-based and survives a session restart, so a
    dead session's never-released _DEFAULT_SCOPE refcount for the SAME
    plan must not alias a live scope's count — otherwise the live exit
    decrements to 1 instead of 0 and the frame squats on executor
    storage for the new session's lifetime (ADVICE r9). Refs are keyed
    (application id, semanticHash): a stale foreign-app entry is
    invisible to the live release."""
    from feature_store_implementation_spark.operators import dedup as D

    df = _docs(spark)
    fake = "app-from-a-dead-session"
    try:
        with D.cache_scope(window=2) as scope:
            minhash_near_dup_pairs(df, threshold=0.5).count()
            frames = [f for f, _ in scope.frames]
            assert frames and all(f.storageLevel.useMemory for f in frames)
            with D._PLAN_LOCK:
                for _sid, h in [k for _, k in scope.frames]:
                    D._PLAN_REFS[(fake, h)] = 1  # the dead session's residue
        # live exit really unpersisted, despite the same-plan stale entry
        assert all(not f.storageLevel.useMemory for f in frames)
        with D._PLAN_LOCK:  # ...and never touched the foreign-app counts
            assert all(
                D._PLAN_REFS.get((fake, h)) == 1
                for _, h in [k for k in D._PLAN_REFS if k[0] == fake]
            )
    finally:
        with D._PLAN_LOCK:
            for k in [k for k in D._PLAN_REFS if k[0] == fake]:
                D._PLAN_REFS.pop(k, None)


def test_ivf_index_full_probe_equals_brute_force(spark, tmp_path):
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        query_ivf_index,
        write_ivf_index,
    )

    rng = np.random.RandomState(7)
    rows = [
        (i, (v / np.linalg.norm(v)).tolist())
        for i, v in enumerate(rng.randn(120, 8))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf")
    assert write_ivf_index(df, path, n_cells=6) == 6
    got = sorted(
        map(tuple, query_ivf_index(spark, path, q, k=5, n_probe=6).collect())
    )
    want = sorted(map(tuple, brute_force_topk(df, q, k=5).collect()))
    assert got == want


def test_ivf_index_partial_probe_prunes_partitions_with_recall(spark, tmp_path):
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        query_ivf_index,
        write_ivf_index,
    )

    rng = np.random.RandomState(11)
    centers = rng.randn(6, 8)
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(40):
            v = c + 0.05 * rng.randn(8)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(df, path, n_cells=6, refine_iters=2)
    out = query_ivf_index(spark, path, q, k=10, n_probe=2)
    # the probe filter must reach the scan as a PARTITION filter (only the
    # probed cell directories are read — the point of the persisted index)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    got = {
        (r["query_id"], r["vec_id"])
        for r in out.collect()
    }
    want = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(df, q, k=10).collect()
    }
    recall = len(got & want) / len(want)
    assert recall >= 0.95, recall


def test_semantic_dedup_planted_duplicate_groups(spark):
    from feature_store_implementation_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    centers = rng.randn(3, 12)
    rows = []
    vid = 0
    dup_groups = []
    for c in centers:
        base = None
        group = []
        for j in range(20):
            if j % 5 == 0:  # every 5th vector starts a fresh point...
                base = c + 0.3 * rng.randn(12)
                group = [vid]
                dup_groups.append(group)
            else:  # ...and the next four are near-copies of it
                group.append(vid)
            v = base + 1e-4 * rng.randn(12)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster"], r["keep_id"], r["is_duplicate"])
        for r in semantic_dedup(df, k=3, iters=3, threshold=0.999).collect()
    }
    assert len(out) == vid
    for group in dup_groups:
        keeper = min(group)
        for member in group:
            assert out[member][1] == keeper
            assert out[member][2] == (member != keeper)
    # deterministic end to end
    again = {
        r["vec_id"]: (r["cluster"], r["keep_id"], r["is_duplicate"])
        for r in semantic_dedup(df, k=3, iters=3, threshold=0.999).collect()
    }
    assert again == out


def test_chunk_tokens_matches_python_oracle(spark):
    from feature_store_implementation_spark.operators.text import chunk_tokens

    docs = [
        (0, "a b c d e f g h i j"),          # 10 tokens
        (1, "one two three"),                  # shorter than the window
        (2, ""),                               # empty → one empty chunk
        (3, "  padded   whitespace  doc  "),   # regex split robustness
        (4, " ".join(f"t{i}" for i in range(12))),  # exact stride multiple
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    window, stride = 4, 3
    got = sorted(
        map(tuple, chunk_tokens(df, window=window, stride=stride).collect())
    )
    want = []
    for doc_id, text in docs:
        toks = [t for t in text.lower().split() if t]
        n = max(len(toks), 1)
        starts = list(range(0, ((n - 1) // stride) * stride + 1, stride))
        for s in starts:
            want.append(
                (
                    doc_id,
                    s // stride,
                    " ".join(toks[s : s + window]),
                    min(len(toks) - s, window),
                )
            )
    assert got == sorted(want)
    # a doc shorter than the window yields exactly one chunk; empty too
    per_doc = {}
    for d_, *_ in got:
        per_doc[d_] = per_doc.get(d_, 0) + 1
    assert per_doc[1] == 1 and per_doc[2] == 1
    with pytest.raises(ValueError):
        chunk_tokens(df, window=0)


def test_kmeans_seeding_survives_ingestion_ordered_corpus(spark):
    """The r6 seeding fix, pinned: ids correlate with ingestion order, so a
    corpus whose FIRST rows all come from one domain must not collapse
    into a mega-cluster. First-k-by-id seeding put every seed inside
    domain 0 here; hash-spread k-means++ seeds across the corpus and
    recovers all three domains."""
    from feature_store_implementation_spark.operators.similarity import kmeans_clusters

    rng = np.random.RandomState(5)
    centers = rng.randn(3, 16)
    rows = []
    vid = 0
    truth = {}
    # ingestion-ordered: ALL of domain 0 first, then domain 1, then 2
    for ci, c in enumerate(centers):
        for _ in range(60):
            v = c + 0.05 * rng.randn(16)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            truth[vid] = ci
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_clusters(df, k=3, iters=4).collect()
    }
    label_of = {}
    for vid_, cl in got.items():
        t = truth[vid_]
        label_of.setdefault(t, cl)
        assert label_of[t] == cl, "a generated domain split across labels"
    assert len(set(label_of.values())) == 3, "domains merged into a mega-cluster"


def test_auto_tables_scales_past_the_width_clamp():
    from feature_store_implementation_spark.operators.dedup import (
        _auto_planes,
        _auto_tables,
    )

    # 8 tables throughout the regime where the auto width is still growing
    assert _auto_tables(1) == 8
    assert _auto_tables(10_000_000) == 8
    # past the clamp (auto width pegged at 24 bits), +4 per decade, cap 24
    assert _auto_planes(10**8) == 24
    assert _auto_tables(10**8) == 12
    assert _auto_tables(10**9) == 16
    assert _auto_tables(10**12) == 24
    assert _auto_tables(10**15) == 24


def test_minhash_index_query_equals_batch_cross_pairs(spark, tmp_path):
    """The persisted-index route must agree EXACTLY with the batch route
    restricted to cross pairs: identical signature params + the shared
    banding hash means identical candidates, and the verify is the same
    exact Jaccard (max_bucket high so neither route caps)."""
    from feature_store_implementation_spark.operators.dedup import (
        minhash_index_query,
        minhash_index_write,
        minhash_near_dup_pairs,
    )

    corpus = _docs(spark).filter(F.col("doc_id") != 1)
    new = _docs(spark).filter(F.col("doc_id") == 1).union(
        spark.createDataFrame(
            [(10, "completely novel text with no overlap whatsoever here")],
            "doc_id long, text string",
        )
    )
    path = str(tmp_path / "mhidx")
    assert minhash_index_write(corpus, path) == 5

    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in minhash_index_query(
            spark, new, path, threshold=0.5, max_bucket=10**6
        ).collect()
    }
    batch = minhash_near_dup_pairs(
        _docs(spark).union(new.filter(F.col("doc_id") == 10)),
        threshold=0.5,
        max_bucket=10**6,
    ).collect()
    new_ids = {1, 10}
    want = {}
    for r in batch:
        a, b = r["doc_id_a"], r["doc_id_b"]
        if (a in new_ids) != (b in new_ids):  # cross pairs only
            n, c = (a, b) if a in new_ids else (b, a)
            want[(n, c)] = r["jaccard"]
    assert got == want and len(got) > 0
    # doc 1 is an exact duplicate of corpus doc 0
    assert got[(1, 0)] == 1.0


def test_minhash_index_write_retry_after_crash(spark, tmp_path):
    """A killed index writer (signatures dir present, commit marker
    absent) must not brick the path: the retry sweeps the uncommitted
    leftover and succeeds."""
    import os

    from feature_store_implementation_spark.operators.dedup import (
        minhash_index_query,
        minhash_index_write,
    )

    path = str(tmp_path / "mhidx")
    os.makedirs(os.path.join(path, "signatures"))  # crash leftover, no marker
    with open(os.path.join(path, "signatures", "part-junk.parquet"), "w") as f:
        f.write("partial")
    corpus = _docs(spark)
    assert minhash_index_write(corpus, path) == 6
    out = minhash_index_query(
        spark, _docs(spark).filter(F.col("doc_id") == 1), path, threshold=0.5
    )
    assert any(r["corpus_id"] == 0 for r in out.collect())


def test_simhash_index_query_equals_batch_cross_pairs(spark, tmp_path):
    """The persisted SimHash index agrees EXACTLY with the batch route
    restricted to cross pairs (same stored width + shared band
    extraction; pigeonhole banding is exhaustive, so with uncapped
    buckets both sides are exact within the radius)."""
    from feature_store_implementation_spark.operators.dedup import (
        simhash_index_query,
        simhash_index_write,
        simhash_near_dup_pairs,
    )

    corpus = _docs(spark).filter(F.col("doc_id") != 1)
    new = _docs(spark).filter(F.col("doc_id") == 1)
    path = str(tmp_path / "shidx")
    assert simhash_index_write(corpus, path, max_hamming=3, bits=64) == 5

    got = {
        (r["new_id"], r["corpus_id"]): r["hamming"]
        for r in simhash_index_query(spark, new, path, max_bucket=10**6).collect()
    }
    batch = simhash_near_dup_pairs(
        _docs(spark), max_hamming=3, bits=64, max_bucket=10**6
    ).collect()
    want = {}
    for r in batch:
        a, b = r["doc_id_a"], r["doc_id_b"]
        if (a == 1) != (b == 1):
            n, c = (a, b) if a == 1 else (b, a)
            want[(n, c)] = r["hamming"]
    assert got == want and len(got) > 0
    assert got[(1, 0)] == 0  # exact duplicate of corpus doc 0


def test_index_write_fails_fast_on_committed_index_and_overwrites(spark, tmp_path):
    """ADVICE r6: a committed index must fail fast with a clear contract
    BEFORE the signature job runs — not an obscure os.rename OSError after
    it — and overwrite=True must rebuild cleanly."""
    from feature_store_implementation_spark.operators.dedup import (
        minhash_index_query,
        minhash_index_write,
        simhash_index_write,
    )

    corpus = _docs(spark)
    path = str(tmp_path / "mhidx")
    assert minhash_index_write(corpus, path) == 6
    with pytest.raises(FileExistsError, match="index already exists"):
        minhash_index_write(corpus, path)
    # overwrite rebuilds (smaller corpus → the new index, not the old one)
    assert minhash_index_write(corpus.limit(3), path, overwrite=True) == 3
    out = minhash_index_query(spark, corpus.limit(1), path, threshold=0.5)
    assert out.count() >= 1  # doc 0 matches itself in the rebuilt corpus

    spath = str(tmp_path / "shidx")
    simhash_index_write(corpus, spath, bits=64)
    with pytest.raises(FileExistsError, match="index already exists"):
        simhash_index_write(corpus, spath, bits=64)
    assert simhash_index_write(corpus, spath, bits=64, overwrite=True) == 6


def test_ivf_index_write_fails_fast_on_committed_index(spark, tmp_path):
    from feature_store_implementation_spark.operators.similarity import (
        write_ivf_index,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(vecs, path, n_cells=2)
    with pytest.raises(FileExistsError, match="index already exists"):
        write_ivf_index(vecs, path, n_cells=2)
    assert write_ivf_index(vecs, path, n_cells=4, overwrite=True) == 4


def test_simhash_index_write_rejects_band_overflow(spark, tmp_path):
    """ADVICE r6: an illegal explicit width (band > 64 bits) must raise at
    WRITE time, not silently record a params.json whose truncated bands
    degrade selectivity for the index's lifetime."""
    import os

    from feature_store_implementation_spark.operators.dedup import (
        simhash_index_write,
    )

    path = str(tmp_path / "shidx")
    with pytest.raises(ValueError, match="pigeonhole band"):
        simhash_index_write(_docs(spark), path, max_hamming=3, bits=512)
    assert not os.path.exists(os.path.join(path, "params.json"))


def test_index_query_caps_on_combined_bucket_population(spark, tmp_path):
    """ADVICE r6: the index route's hot-bucket cap applies to the JOINED
    (corpus + increment) bucket population — exactly the buckets the batch
    route over corpus∪increment drops — so cross-pair agreement holds with
    realistic caps, not only with caps effectively disabled."""
    from feature_store_implementation_spark.operators.dedup import (
        minhash_index_query,
        minhash_index_write,
        minhash_near_dup_pairs,
        simhash_index_query,
        simhash_index_write,
        simhash_near_dup_pairs,
    )

    hot = "identical boilerplate text repeated verbatim across documents"
    corpus = spark.createDataFrame(
        [(i, hot) for i in range(4)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100 + i, hot) for i in range(4)], "doc_id long, text string"
    )

    def batch_cross(pairs):
        return {
            (max(r[0], r[1]), min(r[0], r[1]))
            for r in pairs
            if (r[0] >= 100) != (r[1] >= 100)
        }

    mh_path = str(tmp_path / "mh")
    minhash_index_write(corpus, mh_path)
    # combined population 8 > 6: BOTH routes drop the bucket
    assert minhash_index_query(spark, new, mh_path, max_bucket=6).count() == 0
    assert (
        batch_cross(
            minhash_near_dup_pairs(corpus.union(new), max_bucket=6)
            .select("doc_id_a", "doc_id_b")
            .collect()
        )
        == set()
    )
    # combined population 8 ≤ 8: BOTH routes keep it, and agree (4×4 pairs)
    idx = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_index_query(spark, new, mh_path, max_bucket=8).collect()
    }
    bat = batch_cross(
        minhash_near_dup_pairs(corpus.union(new), max_bucket=8)
        .select("doc_id_a", "doc_id_b")
        .collect()
    )
    assert idx == bat and len(idx) == 16

    sh_path = str(tmp_path / "sh")
    simhash_index_write(corpus, sh_path, bits=64)
    assert simhash_index_query(spark, new, sh_path, max_bucket=6).count() == 0
    idx = {
        (r["new_id"], r["corpus_id"])
        for r in simhash_index_query(spark, new, sh_path, max_bucket=8).collect()
    }
    bat = batch_cross(
        simhash_near_dup_pairs(corpus.union(new), bits=64, max_bucket=8)
        .select("doc_id_a", "doc_id_b")
        .collect()
    )
    assert idx == bat and len(idx) == 16


def test_kmeans_assign_topn_contract(spark):
    """cells[0] ≡ cluster ≡ kmeans_clusters' argmax assignment; cells are
    distinct, length min(n_assign, k); n_assign=1 degenerates to argmax."""
    from feature_store_implementation_spark.operators.similarity import (
        _norm_rows,
        _seed_centroids,
        kmeans_assign_topn,
        kmeans_clusters,
    )

    rng = np.random.RandomState(11)
    rows = [
        (i, (v / np.linalg.norm(v)).tolist())
        for i, v in enumerate(rng.randn(120, 8))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k, iters = 5, 2
    Cn = _norm_rows(_seed_centroids(df, "vec_id", "embedding", k, iters))

    top2 = {r["vec_id"]: r for r in kmeans_assign_topn(df, Cn, n_assign=2).collect()}
    ref = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_clusters(df, k=k, iters=iters).collect()
    }
    assert set(top2) == set(ref)
    for vid, r in top2.items():
        assert r["cluster"] == ref[vid]  # shared argmax semantics
        assert r["cells"][0] == r["cluster"]
        assert len(r["cells"]) == 2 and len(set(r["cells"])) == 2

    one = {r["vec_id"]: r for r in kmeans_assign_topn(df, Cn, n_assign=1).collect()}
    assert all(r["cells"] == [ref[vid]] for vid, r in one.items())
    # n_assign beyond k clamps to k
    wide = kmeans_assign_topn(df, Cn, n_assign=99).first()
    assert len(wide["cells"]) == k


def test_semantic_dedup_multiassign_recall_floor(spark):
    """The SCALING.md 'Semantic-dedup pair recall' pin: on the real sf0.01
    embeddings at the adversarial threshold 0.45, top-2 cell assignment
    must recover ≥0.7 of the exact all-pairs duplicates and strictly beat
    single-assignment blocking (measured 0.79 vs 0.29 at k=8)."""
    from feature_store_implementation_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from feature_store_implementation_spark.operators.similarity import (
        _norm_rows,
        _seed_centroids,
        kmeans_assign_topn,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = df.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    Xn = _norm_rows(np.vstack([np.asarray(r["embedding"], float) for r in rows]))
    S = Xn @ Xn.T
    iu = np.triu_indices(len(ids), k=1)
    hit = S[iu] >= 0.45
    exact = {
        (min(ids[a], ids[b]), max(ids[a], ids[b]))
        for a, b in zip(iu[0][hit], iu[1][hit])
    }
    assert exact  # the pin is vacuous on an empty truth set

    Cn = _norm_rows(_seed_centroids(df, "vec_id", "embedding", 8, 3))

    def blocked_recall(n_assign):
        assigned = kmeans_assign_topn(df, Cn, n_assign=n_assign)
        blocked = df.select("vec_id", "embedding").join(
            assigned.select("vec_id", F.explode("cells").alias("__cell")), "vec_id"
        )
        got = {
            (min(r[0], r[1]), max(r[0], r[1]))
            for r in embedding_near_dup_pairs(
                blocked, threshold=0.45, block_col="__cell"
            )
            .select("vec_id_a", "vec_id_b")
            .distinct()
            .collect()
        }
        assert got <= exact  # blocking can only MISS pairs, never invent
        return len(got & exact) / len(exact)

    r1, r2 = blocked_recall(1), blocked_recall(2)
    assert r2 >= 0.7, (r1, r2)
    assert r2 > r1, (r1, r2)


def test_random_projection_numpy_parity_and_jl_distortion(spark):
    """The projection equals the driver-side numpy matmul exactly, is
    deterministic across runs, and pairwise Euclidean distances distort
    within the JL envelope on the real sf0.01 embeddings (out_dim=32 →
    eps ~ sqrt(8 ln 500 / 32) ~ 1.25 is vacuous; we pin the MEASURED
    p95 distortion well inside it, 0.5)."""
    from feature_store_implementation_spark.operators.similarity import (
        random_projection,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = df.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.vstack([np.asarray(r["embedding"], float) for r in rows])

    out = {r["vec_id"]: np.asarray(r["projected"]) for r in random_projection(df, 32).collect()}
    R = np.random.RandomState(42).randn(X.shape[1], 32) / np.sqrt(32)
    want = X @ R
    got = np.vstack([out[i] for i in ids])
    assert np.allclose(got, want, atol=1e-12)

    again = {r["vec_id"]: np.asarray(r["projected"]) for r in random_projection(df, 32).collect()}
    assert all(np.array_equal(out[i], again[i]) for i in ids)

    rng = np.random.RandomState(0)
    ratios = []
    for _ in range(300):
        a, b = rng.randint(0, len(ids), 2)
        if a == b:
            continue
        d0 = np.linalg.norm(X[a] - X[b])
        if d0 == 0:
            continue
        ratios.append(np.linalg.norm(got[a] - got[b]) / d0)
    dist = np.abs(np.array(ratios) - 1.0)
    assert np.percentile(dist, 95) < 0.5, np.percentile(dist, 95)


def test_pca_project_matches_numpy_eigh(spark):
    """pca_fit's distributed moment pass reproduces the numpy covariance
    eigendecomposition: same explained variance, projections equal up to
    the canonical per-component sign; whiten=True yields unit-variance
    scores; deterministic across runs."""
    from feature_store_implementation_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = df.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.vstack([np.asarray(r["embedding"], float) for r in rows])

    mean, comps, var = pca_fit(df, 8)
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    assert np.allclose(var, w[order], atol=1e-8)
    # components agree up to sign; the operator's sign is canonical
    for j in range(8):
        ref = V[:, order[j]]
        assert np.allclose(comps[:, j], ref, atol=1e-8) or np.allclose(
            comps[:, j], -ref, atol=1e-8
        )

    out = {r["vec_id"]: np.asarray(r["projected"]) for r in pca_project(df, 8).collect()}
    got = np.vstack([out[i] for i in ids])
    want = (X - mean) @ comps
    assert np.allclose(got, want, atol=1e-8)
    # projected variance per component ≡ eigenvalue; whiten → unit variance
    assert np.allclose(got.var(axis=0, ddof=1), var, rtol=1e-6)
    outw = {
        r["vec_id"]: np.asarray(r["projected"])
        for r in pca_project(df, 8, whiten=True).collect()
    }
    gw = np.vstack([outw[i] for i in ids])
    assert np.allclose(gw.var(axis=0, ddof=1), np.ones(8), rtol=1e-6)

    again = {r["vec_id"]: np.asarray(r["projected"]) for r in pca_project(df, 8).collect()}
    assert all(np.array_equal(out[i], again[i]) for i in ids)


def test_minhash_index_append_agrees_with_rebuild(spark, tmp_path):
    """Appending an increment into a persisted MinHash index must answer
    exactly like a full rebuild over corpus∪increment: same cross pairs
    for the NEXT increment, same row counts; a killed append (staged but
    never renamed) is invisible; a second append composes."""
    import os

    from feature_store_implementation_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_query,
        minhash_index_write,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    part_a = d.filter(F.col("doc_id") % 3 == 0)
    part_b = d.filter(F.col("doc_id") % 3 == 1)
    part_c = d.filter(F.col("doc_id") % 3 == 2)

    grown = str(tmp_path / "grown")
    assert minhash_index_write(part_a, grown) == part_a.count()
    assert minhash_index_append(part_b, grown) == part_b.count()

    rebuilt = str(tmp_path / "rebuilt")
    minhash_index_write(part_a.union(part_b), rebuilt)

    def pairs(path):
        return {
            (r["new_id"], r["corpus_id"], r["jaccard"])
            for r in minhash_index_query(
                spark, part_c, path, threshold=0.3, max_bucket=10**6
            ).collect()
        }

    got, want = pairs(grown), pairs(rebuilt)
    assert got == want and got  # non-vacuous

    # killed append: staging exists, rename never happened → invisible
    staging = os.path.join(grown, ".staging-deadbeef0000")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-00000.parquet"), "wb") as f:
        f.write(b"partial")
    assert pairs(grown) == want

    # appends compose: fold part_c in; c×c self pairs via the batch route
    assert minhash_index_append(part_c, grown) == part_c.count()
    from feature_store_implementation_spark.operators.dedup import (
        _read_index_signatures,
    )

    assert _read_index_signatures(spark, grown).count() == d.count()


def test_simhash_index_append_signs_at_stored_width(spark, tmp_path):
    """SimHash appends sign at the index's stored width and agree with a
    rebuild over corpus∪increment; appending to a fresh path fails with
    a clear no-index error."""
    import pytest as _pytest

    from feature_store_implementation_spark.operators.dedup import (
        simhash_index_append,
        simhash_index_query,
        simhash_index_write,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    part_a = d.filter(F.col("doc_id") % 3 == 0)
    part_b = d.filter(F.col("doc_id") % 3 == 1)
    part_c = d.filter(F.col("doc_id") % 3 == 2)

    grown = str(tmp_path / "grown")
    simhash_index_write(part_a, grown, bits=128, max_hamming=3)
    assert simhash_index_append(part_b, grown) == part_b.count()

    rebuilt = str(tmp_path / "rebuilt")
    simhash_index_write(part_a.union(part_b), rebuilt, bits=128, max_hamming=3)

    def pairs(path):
        return {
            (r["new_id"], r["corpus_id"], r["hamming"])
            for r in simhash_index_query(
                spark, part_c, path, max_bucket=10**6
            ).collect()
        }

    assert pairs(grown) == pairs(rebuilt)

    with _pytest.raises(FileNotFoundError, match="no committed index|No such file"):
        simhash_index_append(part_c, str(tmp_path / "missing"))


def test_index_compact_merges_segments_and_recovers_from_crash(spark, tmp_path):
    """index_compact folds base + appended segments into ONE segment with
    identical query answers; an interrupted compaction (merged segment
    committed, sources not yet deleted) is finished by the next writer's
    sweep, restoring exact (duplicate-free) reads."""
    import glob
    import os
    import shutil

    from feature_store_implementation_spark.operators.dedup import (
        _read_index_signatures,
        index_compact,
        minhash_index_append,
        minhash_index_query,
        minhash_index_write,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    part = [d.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    path = str(tmp_path / "idx")
    minhash_index_write(part[0], path)
    minhash_index_append(part[1], path)
    minhash_index_append(part[2], path)

    def pairs():
        return sorted(
            map(
                tuple,
                minhash_index_query(
                    spark, part[3], path, threshold=0.3, max_bucket=10**6
                ).collect(),
            )
        )

    before = pairs()
    n_before = _read_index_signatures(spark, path).count()
    assert index_compact(spark, path) == n_before
    sig_dir = os.path.join(path, "signatures")
    assert not glob.glob(os.path.join(sig_dir, "*.parquet"))  # base folded in
    assert len(glob.glob(os.path.join(sig_dir, "seg-*"))) == 1
    assert pairs() == before
    assert _read_index_signatures(spark, path).count() == n_before
    # idempotent no-op on an already-compact index
    assert index_compact(spark, path) == 0

    # crash window: re-append a segment, then simulate a compaction that
    # committed its merged segment but died before deleting the sources —
    # by cloning the live state into the supersedes list of a fake merge
    minhash_index_append(part[1], path)
    live = sorted(os.path.basename(s) for s in glob.glob(os.path.join(sig_dir, "seg-*")))
    merged_rows = _read_index_signatures(spark, path).count()
    target = pairs()
    staging = str(tmp_path / "fake-merge")
    _read_index_signatures(spark, path).write.parquet(staging)
    import json

    with open(os.path.join(staging, "_supersedes.json"), "w") as f:
        json.dump({"supersedes": live}, f)
    shutil.move(staging, os.path.join(sig_dir, "seg-fakemerge00"))
    # transient double-count window (documented), then a writer sweeps
    assert _read_index_signatures(spark, path).count() == 2 * merged_rows
    minhash_index_append(part[0].limit(0), path)  # any writer triggers the sweep
    assert _read_index_signatures(spark, path).count() == merged_rows
    assert pairs() == target


def test_ivf_index_append_full_probe_equals_brute_force(spark, tmp_path):
    """Appended IVF segments are routed with the STORED centroids and
    probed through the same partition filter: at full probe the grown
    index answers exactly like brute force over base∪increment; a killed
    append (staged, never renamed) is invisible; the idempotency token
    no-ops on replay."""
    import os

    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        ivf_index_append,
        query_ivf_index,
        write_ivf_index,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = df.filter(F.col("vec_id") % 3 != 0)
    inc = df.filter(F.col("vec_id") % 3 == 0)
    q = df.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(base, path, n_cells=6, refine_iters=2)
    assert ivf_index_append(inc, path, txn="day1") == inc.count()
    assert ivf_index_append(inc, path, txn="day1") == 0  # replay no-op

    got = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, path, q, k=10, n_probe=6).collect()
    }
    want = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(df, q, k=10).collect()
    }
    assert got == want

    # partition pruning still fires through the segment roots
    out = query_ivf_index(spark, path, q, k=10, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]

    # killed append: staging dir never renamed → invisible
    os.makedirs(os.path.join(path, ".staging-dead"), exist_ok=True)
    got2 = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, path, q, k=10, n_probe=6).collect()
    }
    assert got2 == want


def test_ivf_index_overwrite_sweeps_appended_segments(spark, tmp_path):
    """The documented retrain flow — append growth, then
    ``write_ivf_index(..., overwrite=True)`` to retrain — must NOT leave
    the old append segments behind: their stored cell ids were assigned
    under the OLD centroids, so unioning them into the rebuilt index
    would silently corrupt probe results (and mismatch schemas if pq_m
    changed). After the overwrite, a full-probe query equals brute force
    over exactly the rebuild corpus: no stale vector resurfaces, no row
    is double-counted."""
    import os

    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        ivf_index_append,
        query_ivf_index,
        write_ivf_index,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = df.filter(F.col("vec_id") % 3 == 1)
    inc = df.filter(F.col("vec_id") % 3 == 2)
    rebuild = df.filter(F.col("vec_id") % 3 != 0)  # base ∪ inc, re-trained
    q = df.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(base, path, n_cells=4)
    assert ivf_index_append(inc, path, txn="day1") == inc.count()
    assert os.path.isdir(os.path.join(path, "segments", "seg-day1"))

    # retrain over the full corpus — old segments must be swept, not
    # unioned under the new centroids
    write_ivf_index(rebuild, path, n_cells=6, refine_iters=2, overwrite=True)
    assert not os.path.isdir(os.path.join(path, "segments"))
    got = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, path, q, k=10, n_probe=6).collect()
    }
    want = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(rebuild, q, k=10).collect()
    }
    assert got == want

    # schema-change rebuild: overwriting a plain IVF index with an IVF-PQ
    # layout must not union code-less stale segments into coded scans
    write_ivf_index(rebuild, path, n_cells=4, overwrite=True, pq_m=8)
    out = query_ivf_index(spark, path, q, k=5, n_probe=4, pq_rerank=30)
    assert out.count() > 0


def test_index_append_stays_exactly_once_across_compaction(spark, tmp_path):
    """The replay hole compaction could open: an epoch-keyed append whose
    segment was folded into a merged segment must STILL no-op on replay —
    the merged segment's supersedes record keeps the txn durable, and a
    second compaction carries the record forward transitively."""
    from feature_store_implementation_spark.operators.dedup import (
        _read_index_signatures,
        index_compact,
        minhash_index_append,
        minhash_index_write,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = d.filter(F.col("doc_id") % 3 == 0)
    b = d.filter(F.col("doc_id") % 3 == 1)
    c = d.filter(F.col("doc_id") % 3 == 2)
    path = str(tmp_path / "idx")
    minhash_index_write(a, path)
    assert minhash_index_append(b, path, txn="b000") == b.count()
    n1 = _read_index_signatures(spark, path).count()

    assert index_compact(spark, path) == n1
    # replay of the compacted-away epoch: must no-op, not re-append
    assert minhash_index_append(b, path, txn="b000") == 0
    assert _read_index_signatures(spark, path).count() == n1

    # chain: another append + compaction; the ORIGINAL txn stays recorded
    assert minhash_index_append(c, path, txn="b001") == c.count()
    n2 = _read_index_signatures(spark, path).count()
    assert index_compact(spark, path) == n2
    assert minhash_index_append(b, path, txn="b000") == 0
    assert minhash_index_append(c, path, txn="b001") == 0
    assert _read_index_signatures(spark, path).count() == n2


def test_index_vacuum_sweeps_only_stale_staging(spark, tmp_path):
    """index_vacuum removes aged-out crashed-writer staging dirs and never
    a fresh (possibly in-flight) one or committed data."""
    import os
    import time

    from feature_store_implementation_spark.operators.dedup import (
        _read_index_signatures,
        index_vacuum,
        minhash_index_write,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(50)
    path = str(tmp_path / "idx")
    n = minhash_index_write(d, path)

    stale = os.path.join(path, ".staging-deadbeef0001")
    fresh = os.path.join(path, ".staging-deadbeef0002")
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - 48 * 3600
    os.utime(stale, (old, old))

    removed = index_vacuum(path, min_age_seconds=24 * 3600)
    assert removed == [stale]
    assert not os.path.isdir(stale) and os.path.isdir(fresh)
    assert _read_index_signatures(spark, path).count() == n


# ---------------------------------------------------------------------------
# product quantization (pq_train / pq_encode / pq_topk)
# ---------------------------------------------------------------------------


def _pq_parts(spark):
    from feature_store_implementation_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings").cache()
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_train(e, m=8, nbits=8)
    codes = pq_encode(e, books).cache()
    return e, q, books, codes


def test_pq_codebook_shape_and_code_size(spark):
    e, q, books, codes = _pq_parts(spark)
    assert books.shape == (8, 256, 8)  # (m, 2**nbits, 64/m)
    row = codes.limit(1).collect()[0]
    # the 100 TB point: 8-byte codes vs 256-byte float32[64] = 32x
    assert len(row["code"]) == 8


def test_pq_raw_adc_recall_floor(spark):
    """Pinned floor for the RAW compressed-domain scan (no rerank) at the
    32x-compression operating point: measured 0.72 on the sf0.01
    embeddings; pin 0.6 against numpy/sampling drift."""
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    e, q, books, codes = _pq_parts(spark)
    bf = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(e, q, k=10).collect()}
    pq = {(r["query_id"], r["vec_id"]) for r in pq_topk(codes, q, books, k=10).collect()}
    assert len(bf & pq) / len(bf) >= 0.6


def test_pq_rerank_recall_and_exact_scores(spark):
    """rerank=5k (the production mode) recovers recall@10 = 1.0 on the
    sf0.01 embeddings AND returns exact brute-force tuples (the re-scored
    cosine, not the ADC approximation) whenever the true top-k survives
    the ADC cut — pin ≥ 0.95 overlap and exact scores on the overlap."""
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    e, q, books, codes = _pq_parts(spark)
    bf = {
        (r["query_id"], r["vec_id"], r["cosine"]): r["rank"]
        for r in brute_force_topk(e, q, k=10).collect()
    }
    rr = {
        (r["query_id"], r["vec_id"], r["score"]): r["rank"]
        for r in pq_topk(codes, q, books, k=10, rerank=50, corpus=e).collect()
    }
    overlap = set(bf) & set(rr)
    assert len(overlap) / len(bf) >= 0.95
    assert all(bf[t] == rr[t] for t in overlap)


def test_pq_full_rerank_equals_brute_force(spark):
    """With rerank = |corpus| the ADC cut keeps everything, so the result
    must equal brute force EXACTLY — the provable-equality mode the
    oracle-bearing driver query runs in (same pattern as IVF full-probe)."""
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    e, q, books, codes = _pq_parts(spark)
    n = e.count()
    bf = {
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in brute_force_topk(e, q, k=10).collect()
    }
    rr = {
        (r["query_id"], r["vec_id"], r["score"], r["rank"])
        for r in pq_topk(codes, q, books, k=10, rerank=n, corpus=e).collect()
    }
    assert bf == rr


def test_pq_deterministic(spark):
    from feature_store_implementation_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    e, q, books, codes = _pq_parts(spark)
    books2 = pq_train(e, m=8, nbits=8)
    assert (books == books2).all()
    codes2 = {r["id"]: bytes(r["code"]) for r in pq_encode(e, books2).collect()}
    codes1 = {r["id"]: bytes(r["code"]) for r in codes.collect()}
    assert codes1 == codes2
    r1 = sorted(map(tuple, pq_topk(codes, q, books, k=10).collect()))
    r2 = sorted(map(tuple, pq_topk(codes, q, books, k=10).collect()))
    assert r1 == r2


def test_pq_contract_errors(spark):
    from feature_store_implementation_spark.operators.similarity import (
        pq_topk,
        pq_train,
    )

    e, q, books, codes = _pq_parts(spark)
    with pytest.raises(ValueError, match="nbits"):
        pq_train(e, m=8, nbits=9)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(e, m=7)
    with pytest.raises(ValueError, match="corpus"):
        pq_topk(codes, q, books, k=10, rerank=50)
    with pytest.raises(ValueError, match="must be >= k"):
        pq_topk(codes, q, books, k=10, rerank=5, corpus=e)


# ---------------------------------------------------------------------------
# IVF-PQ: PQ codes inside the persisted IVF index
# ---------------------------------------------------------------------------


def _ivfpq_index(spark, tmp_path, n_cells=8):
    from feature_store_implementation_spark.operators.similarity import (
        write_ivf_index,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings").cache()
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivfpq")
    write_ivf_index(e, path, n_cells=n_cells, refine_iters=1, pq_m=8)
    return e, q, path


def test_ivfpq_full_probe_full_rerank_equals_brute_force(spark, tmp_path):
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        query_ivf_index,
    )

    e, q, path = _ivfpq_index(spark, tmp_path)
    bf = {tuple(r) for r in brute_force_topk(e, q, k=10).collect()}
    got = {
        tuple(r)
        for r in query_ivf_index(
            spark, path, q, k=10, n_probe=8, pq_rerank=e.count()
        ).collect()
    }
    assert got == bf


def test_ivfpq_operating_point_recall_floor(spark, tmp_path):
    """probe 4/8 cells + rerank 5k: measured recall@10 = 0.78 (identical
    to the flat probe-4 route — the ADC cut loses nothing at this rerank;
    the loss is probe-limited). Pin 0.6."""
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        query_ivf_index,
    )

    e, q, path = _ivfpq_index(spark, tmp_path)
    bf = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(e, q, k=10).collect()}
    got = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, path, q, k=10, n_probe=4, pq_rerank=50).collect()
    }
    assert len(bf & got) / len(bf) >= 0.6


def test_ivfpq_probe_scan_skips_raw_embeddings(spark, tmp_path):
    """The compressed probe scan must read (vec_id, cell, code) and NOT
    the raw embedding column — the whole point of the IVF-PQ layout. The
    plan has a second scan for the bounded rerank that DOES read
    embeddings; assert the code-scan exists without embedding in its
    ReadSchema."""
    import re

    from feature_store_implementation_spark.operators.similarity import (
        query_ivf_index,
    )

    e, q, path = _ivfpq_index(spark, tmp_path)
    df = query_ivf_index(spark, path, q, k=10, n_probe=4, pq_rerank=50)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert any("code" in s and "embedding" not in s for s in schemas), schemas
    assert "CartesianProduct" not in plan


def test_ivfpq_append_encodes_with_stored_codebooks(spark, tmp_path):
    """Appended vectors get codes from the STORED codebooks, so a full
    probe + full rerank over base+increment still equals brute force."""
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        ivf_index_append,
        query_ivf_index,
    )

    e, q, path = _ivfpq_index(spark, tmp_path)
    extra = e.filter(F.col("vec_id") >= 450).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    ivf_index_append(extra, path)
    union = e.union(extra)
    bf = {tuple(r) for r in brute_force_topk(union, q, k=10).collect()}
    got = {
        tuple(r)
        for r in query_ivf_index(
            spark, path, q, k=10, n_probe=8, pq_rerank=union.count()
        ).collect()
    }
    assert got == bf


def test_ivfpq_contract_errors(spark, tmp_path):
    from feature_store_implementation_spark.operators.similarity import (
        query_ivf_index,
        write_ivf_index,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flat = str(tmp_path / "flat")
    write_ivf_index(e, flat, n_cells=4, refine_iters=0)
    with pytest.raises(ValueError, match="codebooks"):
        query_ivf_index(spark, flat, q, k=10, pq_rerank=50)
    pq = str(tmp_path / "pq")
    write_ivf_index(e, pq, n_cells=4, refine_iters=0, pq_m=8)
    with pytest.raises(ValueError, match="must be >= k"):
        query_ivf_index(spark, pq, q, k=10, pq_rerank=5)


def test_remove_repeated_spans_license_block_and_self_repeat(spark):
    """Span dedup: a shared license block vanishes from BOTH carriers
    while their unique prose survives; a WITHIN-doc repeat is masked
    too (both copies); short/unique/empty docs pass through whole."""
    from feature_store_implementation_spark.operators.dedup import (
        remove_repeated_spans,
    )

    lic = (
        "this software is provided as is without warranty of any kind "
        "either express or implied"
    )
    rep = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"unique intro one {lic} unique tail one"),
            (2, f"different start here {lic} another ending"),
            (3, f"{rep} middle words then again {rep}"),
            (4, "totally original fourteen token content with no repeats anywhere in this document body"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in remove_repeated_spans(docs, n=8).collect()}
    # license block (15 tokens) masked from both; unique edges survive
    for d, edges in ((1, ("unique intro one", "unique tail one")),
                     (2, ("different start here", "another ending"))):
        assert lic not in r[d]["clean_text"]
        for e in edges:
            assert e in r[d]["clean_text"], (d, r[d]["clean_text"])
        assert r[d]["n_removed"] == 15
    # self-repeat: both 8-token copies masked, middle survives
    assert rep not in r[3]["clean_text"]
    assert "middle words then again" in r[3]["clean_text"]
    assert r[3]["n_removed"] == 16
    assert r[4]["n_removed"] == 0 and r[4]["n_tokens"] == 13
    assert r[5]["clean_text"] == "" and r[5]["n_tokens"] == 0


def test_maintain_index_unified_entry_point(spark, tmp_path):
    """One scheduler call for both index families: maintain_index detects
    the kind from the layout, compacts when live segments >= threshold
    (delegating to the kind's verified compactor), vacuums stale staging
    dirs, and is idempotent. After IVF compaction the probe result still
    equals brute force at full probe, and a replayed append txn that was
    folded into the merged segment stays a no-op (exactly-once across
    compaction)."""
    import os

    import pytest

    from feature_store_implementation_spark.operators.dedup import (
        maintain_index,
        minhash_index_append,
        minhash_index_write,
    )
    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
        ivf_index_append,
        query_ivf_index,
        write_ivf_index,
    )

    with pytest.raises(FileNotFoundError):
        maintain_index(spark, str(tmp_path / "nothing"))

    # -- signature index ---------------------------------------------------
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    mh = str(tmp_path / "mh")
    minhash_index_write(d.filter(F.col("doc_id") % 4 == 0), mh)
    for i in (1, 2):
        minhash_index_append(d.filter(F.col("doc_id") % 4 == i), mh, txn=f"t{i}")
    # below threshold: no compaction, still vacuums
    rep = maintain_index(spark, mh, compact_min_segments=4)
    assert rep["kind"] == "signature" and rep["compacted_rows"] == 0
    assert rep["segments_before"] == rep["segments_after"] == 2
    rep = maintain_index(spark, mh, compact_min_segments=2)
    assert rep["compacted_rows"] > 0 and rep["segments_after"] == 1
    # replayed txn folded by compaction stays exactly-once
    assert minhash_index_append(d.filter(F.col("doc_id") % 4 == 1), mh, txn="t1") == 0

    # -- IVF index ---------------------------------------------------------
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    ivf = str(tmp_path / "ivf")
    write_ivf_index(e.filter(F.col("vec_id") % 4 == 0), ivf, n_cells=4)
    for i in (1, 2, 3):
        ivf_index_append(e.filter(F.col("vec_id") % 4 == i), ivf, txn=f"v{i}")
    # age-gated vacuum target: a dead staging dir
    os.makedirs(os.path.join(ivf, ".staging-dead"))
    rep = maintain_index(spark, ivf, compact_min_segments=2, vacuum_min_age_seconds=0)
    assert rep["kind"] == "ivf"
    assert rep["segments_before"] == 3 and rep["segments_after"] == 1
    assert rep["compacted_rows"] == e.filter(F.col("vec_id") % 4 != 0).count()
    assert any(s.endswith(".staging-dead") for s in rep["vacuumed"])

    q = e.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, ivf, q, k=10, n_probe=4).collect()
    }
    want = {
        (r["query_id"], r["vec_id"]) for r in brute_force_topk(e, q, k=10).collect()
    }
    assert got == want
    # folded append txn replays as a no-op
    assert ivf_index_append(e.filter(F.col("vec_id") % 4 == 2), ivf, txn="v2") == 0
    # idempotent: nothing left to do
    rep2 = maintain_index(spark, ivf, compact_min_segments=2, vacuum_min_age_seconds=0)
    assert rep2["compacted_rows"] == 0 and rep2["segments_after"] == 1


def test_ivf_index_append_empty_increment_commits_nothing(spark, tmp_path):
    """An EMPTY increment (routine under the idempotent-txn foreachBatch
    hook) must not commit a segment: partitionBy of an empty frame writes
    no cell= dirs, and a committed dataless seg-<txn> would poison every
    later query/compact at spark.read.parquet(seg)."""
    import glob
    import os

    from feature_store_implementation_spark.operators.similarity import (
        ivf_index_append,
        query_ivf_index,
        write_ivf_index,
    )

    rng = np.random.RandomState(3)
    rows = [
        (i, (v / np.linalg.norm(v)).tolist()) for i, v in enumerate(rng.randn(60, 8))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    write_ivf_index(df, path, n_cells=4)

    empty = df.filter("vec_id < 0")
    assert ivf_index_append(empty, path, txn="empty-batch") == 0
    assert glob.glob(os.path.join(path, "segments", "seg-*")) == []

    # the index still serves
    q = df.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    assert query_ivf_index(spark, path, q, k=3, n_probe=4).count() == 6


def test_minhash_bands_validation(spark):
    """bands must divide k: bands > k degenerates to r=0 (every doc in one
    bucket per band — the cap then discards the whole corpus as 'no
    duplicates'), and non-divisible k silently ignores trailing signature
    values. Both must fail fast, and index writes must refuse to persist
    a degenerate value for the index's lifetime."""
    import pytest

    from feature_store_implementation_spark.operators.dedup import (
        minhash_index_write,
        minhash_near_dup_pairs,
    )

    df = _docs(spark)
    for bad in (64, 0, 7):  # > k, zero, non-divisor of k=32
        with pytest.raises(ValueError, match="must divide"):
            minhash_near_dup_pairs(df, k=32, bands=bad).collect()
        with pytest.raises(ValueError, match="must divide"):
            minhash_index_write(df, "/tmp/never-written", bands=bad)


def test_index_append_same_txn_concurrent_replayers_one_wins(spark, tmp_path, monkeypatch):
    """Streaming failover can run TWO appenders for one epoch (zombie
    driver + new driver). Staging dirs are per-process nonces, so the
    loser cannot rmtree the winner's in-flight write; at the commit
    rename the loser observes the winner's segment and no-ops (return 0)
    — exactly-once holds and no staging debris is left (review r10)."""
    import os as _os

    from feature_store_implementation_spark.operators import dedup as D

    path = str(tmp_path / "idx")
    D.minhash_index_write(
        spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string"),
        path,
    )
    winner = spark.createDataFrame([(3, "k l m n o p q r")], "doc_id long, text string")
    loser = spark.createDataFrame([(3, "k l m n o p q r")], "doc_id long, text string")

    real_rename = _os.rename
    fired = {}

    def racing_rename(src, dst):
        if dst.endswith("seg-epoch7") and not fired:
            fired["x"] = True
            # the OTHER replayer of the same epoch commits first
            assert D.minhash_index_append(winner, path, txn="epoch7") > 0
        return real_rename(src, dst)

    monkeypatch.setattr("os.rename", racing_rename)
    assert D.minhash_index_append(loser, path, txn="epoch7") == 0  # lost, no-op
    monkeypatch.setattr("os.rename", real_rename)

    import glob

    assert not glob.glob(str(tmp_path / "idx" / ".staging-*"))  # both cleaned
    sigs = D._read_index_signatures(spark, path)
    assert sigs.select("doc_id").distinct().count() == 2  # base + ONE epoch-7
    # a replay of the committed txn still no-ops
    assert D.minhash_index_append(winner, path, txn="epoch7") == 0


def test_null_and_empty_text_honest_across_text_operators(spark):
    """ANSI-mode NULL propagation must not corrupt counts (review r10):
    chunk_tokens used to claim a full window of nonexistent tokens for a
    NULL-text doc (least/greatest SKIP nulls), remove_repeated_spans
    emitted NULL counts, simhash_signatures dropped zero-token docs
    entirely (index row count < corpus), and inverted_index crashed on
    string doc ids under ANSI cast."""
    from feature_store_implementation_spark.operators.dedup import (
        remove_repeated_spans,
        simhash_signatures,
    )
    from feature_store_implementation_spark.operators.text import (
        chunk_tokens,
        inverted_index,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "doc_id long, text string"
    )

    chunks = {r["doc_id"]: r for r in chunk_tokens(df, window=4).collect()}
    assert chunks[2]["n_tokens"] == 0 and chunks[2]["chunk_text"] == ""
    assert chunks[3]["n_tokens"] == 0
    assert chunks[1]["n_tokens"] == 3

    spans = {r["doc_id"]: r for r in remove_repeated_spans(df).collect()}
    assert (spans[2]["n_tokens"], spans[2]["n_removed"]) == (0, 0)

    sigs = simhash_signatures(df, "text", "doc_id").collect()
    assert len(sigs) == 3  # zero-token docs keep a signature row
    by_id = {r["doc_id"]: r["simhash"] for r in sigs}
    # empty == empty (one shared deterministic signature), distinct from real
    assert by_id[2] == by_id[3] != by_id[1]

    inv = inverted_index(
        spark.createDataFrame(
            [("doc-b", "hello world"), ("doc-a", "hello there")],
            "doc_id string, text string",
        ),
        min_df=2,
    ).collect()
    assert [(r["term"], r["postings"]) for r in inv] == [("hello", "doc-a,doc-b")]


def test_check_expectations_empty_list_returns_empty_report(spark):
    from feature_store_implementation_spark.operators.quality import (
        check_expectations,
    )

    df = spark.createDataFrame([(1, "a")], "id long, t string")
    out = check_expectations(df, [])
    assert out.columns == ["check", "violations", "passed"]
    assert out.count() == 0


def test_broadcasts_release_with_cache_scope(spark):
    """_einsum_verify's broadcast matrix/index release at scope exit
    instead of pinning executor+driver memory for the session lifetime
    (review r10). unpersist (not destroy) keeps late consumers correct."""
    import numpy as np

    from feature_store_implementation_spark.operators import dedup as D
    from feature_store_implementation_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    rng = np.random.RandomState(3)
    base = rng.randn(20, 8)
    rows = [(i, (v / np.linalg.norm(v)).tolist()) for i, v in enumerate(base)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # exact twins
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    with D.cache_scope(window=4) as scope:
        got = embedding_near_dup_pairs(df, threshold=0.95).count()
        assert got >= 5
        bcs = list(scope.bcasts)
        assert bcs  # the broadcast route registered its handles
    # scope exit released them: the broadcast blocks are gone from the
    # block manager (value stays driver-side; re-use would re-broadcast)
    for bc in bcs:
        # unpersisted broadcasts can still be re-read driver-side
        assert bc.value is not None


def test_bloom_decontaminate_equals_exact_decontaminate(spark):
    from feature_store_implementation_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    ev = d.filter(F.col("doc_id") % 53 == 0)
    tr = d.filter(F.col("doc_id") % 53 != 0)
    exact = {
        (r["doc_id"], r["n_shared"])
        for r in decontaminate(tr, ev, "text", "doc_id", n=3).collect()
    }
    bloom = {
        (r["doc_id"], r["n_shared"])
        for r in decontaminate_bloom(tr, ev, "text", "doc_id", n=3).collect()
    }
    assert bloom == exact and exact  # identical, and non-trivially non-empty


def test_bloom_bitset_no_false_negatives_and_bounded_size(spark):
    from feature_store_implementation_spark.operators.dedup import (
        bloom_bitset,
        bloom_contains,
    )

    vals = spark.range(0, 5000).select(
        F.concat(F.lit("v-"), F.col("id").cast("string")).alias("s")
    )
    num_bits, k = 1 << 14, 3
    bits = bloom_bitset(vals, "s", num_bits=num_bits, num_hashes=k)
    assert len(bits) == num_bits // 64  # collect bounded by bitset words,
    # never by the value count
    probe = spark.range(0, 10000).select(
        F.concat(F.lit("v-"), F.col("id").cast("string")).alias("s")
    )
    bf = F.broadcast(spark.createDataFrame([(bits,)], "__bf array<bigint>"))
    hits = (
        probe.crossJoin(bf)
        .filter(bloom_contains("s", "__bf", num_bits, k))
        .count()
    )
    # every inserted value must hit (no false negatives); the 5k
    # non-inserted probes may add a small false-positive tail, bounded
    # loosely here (theoretical FPR ~ (1-e^(-k n/m))^k ~ 0.17 at this
    # deliberately tight m/n; the default 2^17 bits is ~1e-4)
    assert 5000 <= hits < 5000 + 1800


def test_bloom_bitset_rejects_unaligned_num_bits(spark):
    import pytest

    from feature_store_implementation_spark.operators.dedup import bloom_bitset

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitset(spark.range(1).selectExpr("'x' AS s"), "s", num_bits=100)


def test_minhash_pairs_with_precomputed_sigs_identical(spark, sf_small):
    """The sigs pass-through (one text scan, two thresholds) must produce
    bit-identical pairs to the self-computed path — including when the
    sigs frame covers a SUPERSET of the doc frame (the build's split pass
    hands curate-stage signatures to the post-mixture survivor set)."""
    from feature_store_implementation_spark.operators.dedup import (
        minhash_near_dup_pairs,
        minhash_signatures,
    )
    from feature_store_implementation_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    subset = docs.filter(F.col("doc_id") % 3 != 0)
    sigs_all = minhash_signatures(docs, "text", "doc_id")

    for thr in (0.7, 0.5):
        own = sorted(
            map(tuple, minhash_near_dup_pairs(subset, threshold=thr).collect())
        )
        shared = sorted(
            map(
                tuple,
                minhash_near_dup_pairs(
                    subset, threshold=thr, sigs=sigs_all
                ).collect(),
            )
        )
        assert own == shared
