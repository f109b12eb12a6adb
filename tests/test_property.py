"""Property-based tests (SURVEY §5.5): the compute surface vs a pandas
oracle — the reference's own semantics (entity-indexed pandas aggregation,
reference compute.py:46-55) drive the expectation. Integer-valued doubles
keep float summation exact so equality is bitwise."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from feature_store_implementation_spark.compute.engine import compute_feature

ENTITIES = ["u1", "u2", "u3", "u4", "u5"]

records = st.lists(
    st.tuples(st.sampled_from(ENTITIES), st.integers(-10_000, 10_000)),
    min_size=1,
    max_size=40,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _spark_result(spark, recs, logic):
    df = spark.createDataFrame(
        [(e, float(a)) for e, a in recs], "id string, amount double"
    )
    return {
        r["entity_id"]: r["value"]
        for r in compute_feature(df, logic, "id").collect()
    }


@SETTINGS
@given(recs=records)
def test_sum_matches_pandas(spark, recs):
    got = _spark_result(spark, recs, "SUM(amount)")
    pdf = pd.DataFrame(recs, columns=["id", "amount"]).astype({"amount": "float64"})
    expected = pdf.groupby("id")["amount"].sum().to_dict()
    assert got == expected


@SETTINGS
@given(recs=records)
def test_minmax_count_match_pandas(spark, recs):
    got = _spark_result(spark, recs, "MAX(amount) - MIN(amount) + COUNT(*)")
    pdf = pd.DataFrame(recs, columns=["id", "amount"]).astype({"amount": "float64"})
    g = pdf.groupby("id")["amount"]
    expected = (g.max() - g.min() + g.count()).to_dict()
    assert got == expected


join_records = st.lists(
    st.tuples(st.sampled_from(ENTITIES), st.integers(-100, 100)),
    min_size=0,
    max_size=15,
)


@SETTINGS
@given(left=join_records, right=join_records)
def test_inner_join_matches_pandas_merge(spark, left, right):
    ldf = spark.createDataFrame([(e, float(a)) for e, a in left] or [], "id string, l double")
    rdf = spark.createDataFrame([(e, float(a)) for e, a in right] or [], "id string, r double")
    got = sorted(tuple(r) for r in ldf.join(rdf, "id").collect())
    lp = pd.DataFrame(left or [], columns=["id", "l"]).astype({"l": "float64"}) if left else pd.DataFrame(columns=["id", "l"])
    rp = pd.DataFrame(right or [], columns=["id", "r"]).astype({"r": "float64"}) if right else pd.DataFrame(columns=["id", "r"])
    merged = lp.merge(rp, on="id")
    expected = sorted((r.id, float(r.l), float(r.r)) for r in merged.itertuples())
    assert got == expected


# ---- round-2 distributed algorithms vs pure-Python oracles ----------------

hh_values = st.lists(
    st.sampled_from([f"k{i}" for i in range(12)]), min_size=1, max_size=120
)


@given(values=hh_values, k=st.integers(2, 15))
@SETTINGS
def test_frequent_items_always_exact(spark, values, k):
    from collections import Counter

    from feature_store_implementation_spark.operators.sketch import frequent_items

    df = spark.createDataFrame([(v,) for v in values], "item string").repartition(3)
    got = {r["item"]: r["cnt"] for r in frequent_items(df, "item", k).collect()}
    n = len(values)
    assert got == {v: c for v, c in Counter(values).items() if c > n / k}


edges_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@given(pairs=edges_strategy, iters=st.integers(1, 4))
@SETTINGS
def test_pagerank_fixed_point_matches_oracle_on_random_graphs(spark, pairs, iters):
    from collections import Counter, defaultdict

    from feature_store_implementation_spark.operators.graph import (
        PR_SCALE,
        pagerank_fixed_point,
    )

    edge_set = set(pairs) | {(b, a) for a, b in pairs}  # symmetrize: no dangling
    df = spark.createDataFrame(sorted(edge_set), "src long, dst long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(df, iterations=iters).collect()
    }
    deg = Counter(s for s, _ in edge_set)
    nodes = sorted(deg)
    n = len(nodes)
    base = PR_SCALE * 15 // (100 * n)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(iters):
        mass = defaultdict(int)
        for s, d in edge_set:
            mass[d] += (r[s] * 85) // (100 * deg[s])
        r = {v: base + mass.get(v, 0) for v in nodes}
    assert got == r


# -- round-3 corpus ops: packing + portable sampling invariants -------------

doc_texts = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=30),
    min_size=1,
    max_size=15,
)


@SETTINGS
@given(texts=doc_texts, budget=st.integers(1, 16))
def test_pack_sequences_stream_invariants(spark, texts, budget):
    """The packed layout IS a contiguous token stream: offsets are the
    prefix sums of token counts in id order, chunk spans follow from pure
    arithmetic, and no token is lost or duplicated."""
    from feature_store_implementation_spark.operators.text import pack_sequences

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = sorted(pack_sequences(df, budget=budget).collect(), key=lambda r: r["doc_id"])
    expect_counts = {i: len(t.split()) for i, t in enumerate(texts) if t.split()}
    assert [r["doc_id"] for r in rows] == sorted(expect_counts)
    off = 0
    for r in rows:
        assert r["n_tokens"] == expect_counts[r["doc_id"]]
        assert r["start_offset"] == off
        assert r["chunk_first"] == off // budget
        assert r["chunk_last"] == (off + r["n_tokens"] - 1) // budget
        off += r["n_tokens"]


@SETTINGS
@given(
    ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=60, unique=True),
    thr=st.sampled_from(["00", "40", "80", "c0", "g"]),
)
def test_portable_sample_membership_is_pointwise(spark, ids, thr):
    """Membership depends on the row's key alone: sampling a union equals
    the union of sampled parts, and thresholds are monotone (a stricter
    threshold keeps a subset)."""
    from feature_store_implementation_spark.operators.sampling import portable_sample

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    kept = {
        r["doc_id"]
        for r in portable_sample(df, ["doc_id"], hex_threshold=thr).collect()
    }
    half = ids[: len(ids) // 2]
    kept_half = {
        r["doc_id"]
        for r in portable_sample(
            spark.createDataFrame([(i,) for i in half], "doc_id long"),
            ["doc_id"],
            hex_threshold=thr,
        ).collect()
    }
    assert kept_half == kept & set(half)
    if thr != "g":
        stricter = {
            r["doc_id"]
            for r in portable_sample(df, ["doc_id"], hex_threshold="20").collect()
        }
        if thr >= "40":
            assert stricter <= kept
    if thr == "00":
        assert kept == set()
    if thr == "g":
        assert kept == set(ids)


LINE_WORDS = ["header", "alpha", "beta", "gamma", "footer", "nav", ""]

docs_strategy = st.lists(
    st.lists(st.sampled_from(LINE_WORDS), min_size=0, max_size=6).map("\n".join),
    min_size=1,
    max_size=12,
)


@SETTINGS
@given(texts=docs_strategy)
def test_line_dedup_idempotent_and_python_oracle(spark, texts):
    """line_dedup must (a) match a direct python oracle and (b) be a
    fixpoint: kept lines have doc-frequency ≤ k by construction, so a
    second pass removes nothing."""
    from feature_store_implementation_spark.operators.dedup import line_dedup

    k = 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"])
        for r in line_dedup(df, max_doc_freq=k).collect()
    }
    # python oracle
    split = {i: t.split("\n") for i, t in enumerate(texts)}
    from collections import Counter

    freq = Counter()
    for i, lines in split.items():
        for ln in {x for x in lines if x.strip()}:
            freq[ln] += 1
    boiler = {ln for ln, n in freq.items() if n > k}
    for i, lines in split.items():
        kept = [x for x in lines if x not in boiler]
        assert once[i] == ("\n".join(kept), len(kept)), (i, lines)
    # idempotence
    clean_df = spark.createDataFrame(
        [(i, c) for i, (c, _) in once.items()], "doc_id long, text string"
    )
    twice = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"])
        for r in line_dedup(clean_df, max_doc_freq=k).collect()
    }
    for i, (c, n) in once.items():
        # empty docs re-split to one empty line; content must be unchanged
        assert twice[i][0] == c


@SETTINGS
@given(
    langs=st.lists(st.sampled_from(["en", "de", "fr", "sw"]), min_size=1, max_size=30),
    alpha=st.sampled_from([0.2, 0.5, 0.7, 1.0]),
)
def test_mixture_weights_invariants(spark, langs, alpha):
    """Weights form a distribution; temperature never inverts the share
    order; α=1 degenerates to natural shares."""
    from feature_store_implementation_spark.operators.sampling import (
        mixture_temperature_weights,
    )

    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(langs)], "doc_id long, lang string"
    )
    rows = mixture_temperature_weights(df, "lang", alpha).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    by_share = sorted(rows, key=lambda r: r["share"])
    for lo, hi in zip(by_share, by_share[1:]):
        assert lo["weight"] <= hi["weight"] + 1e-9  # monotone in share
    if alpha == 1.0:
        for r in rows:
            assert abs(r["weight"] - r["share"]) < 1e-4


@SETTINGS
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=10,
    )
)
def test_unigram_logprob_invariants(spark, texts):
    """Token counts reconcile with the corpus; log-probs are ≤ 0; a doc of
    only the modal token scores ≥ every other doc."""
    from feature_store_implementation_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = unigram_logprob(df).collect()
    total_tokens = sum(len([w for w in t.split() if w]) for t in texts)
    assert sum(r["n_tokens"] for r in rows) == total_tokens
    for r in rows:
        assert r["avg_logprob"] <= 1e-9


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c\tx\n"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=6,
    ),
    window=st.integers(min_value=1, max_value=8),
)
def test_chunk_tokens_reconstruction_property(spark, texts, window):
    """At stride == window (no overlap), concatenating a document's chunks
    in chunk_id order reconstructs its full token stream exactly, and the
    n_tokens column sums to the document's token count."""
    from feature_store_implementation_spark.operators.text import chunk_tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_tokens(df, window=window, stride=window).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        rebuilt = " ".join(c["chunk_text"] for c in chunks if c["chunk_text"])
        assert rebuilt == " ".join(toks)
        assert sum(c["n_tokens"] for c in chunks) == len(toks)
        # chunk ids are dense from 0 and every non-final chunk is full
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for c in chunks[:-1]:
            assert c["n_tokens"] == window


@given(
    n=st.integers(min_value=1, max_value=10**18),
    m=st.integers(min_value=0, max_value=10**17),
    d=st.integers(min_value=0, max_value=7),
)
def test_auto_width_helpers_monotone_and_legal(n, m, d):
    """The corpus-scaled width/table helpers are monotone in corpus size
    and always produce legal configurations (bands fit one 64-bit word;
    table count within its clamp)."""
    from feature_store_implementation_spark.operators.dedup import (
        _auto_planes,
        _auto_simhash_bits,
        _auto_tables,
    )

    bits = _auto_simhash_bits(n, d)
    nb = d + 1
    assert bits % 64 == 0 and bits // nb + bits % nb <= 64
    assert _auto_simhash_bits(n + m, d) >= bits
    assert 10 <= _auto_planes(n) <= 24 and _auto_planes(n + m) >= _auto_planes(n)
    assert 8 <= _auto_tables(n) <= 24 and _auto_tables(n + m) >= _auto_tables(n)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 1000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 10),
)
def test_weighted_sample_wor_matches_python_oracle(spark, rows, k):
    """A-ES membership is pointwise-recomputable: the Spark top-k equals
    the pure-Python ranking on md5-derived keys for ANY ids/weights/k,
    and sample size is exactly min(k, n)."""
    import hashlib
    import math

    from feature_store_implementation_spark.operators.sampling import (
        weighted_sample_wor,
    )

    df = spark.createDataFrame([(i, float(w)) for i, w in rows], "id long, w double")
    got = sorted(r["id"] for r in weighted_sample_wor(df, k, "w", ["id"]).collect())

    def es(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) / 16**13
        return math.log(max(u, 1.0 / 16**13)) / w

    want = sorted(
        i for i, _ in sorted(rows, key=lambda t: (-es(t[0], t[1]), t[0]))[:k]
    )
    assert got == want
    assert len(got) == min(k, len(rows))


@SETTINGS
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=5, max_size=60),
    bins=st.integers(2, 12),
)
def test_psi_drift_identity_is_zero_and_fracs_sum(spark, vals, bins):
    """For ANY sample: PSI(ref, ref) per-bin terms are 0, both fraction
    columns sum to 1, and bins stay within [1, bins]."""
    from feature_store_implementation_spark.operators.quality import psi_drift

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    rows = psi_drift(df, df, "v", bins=bins).collect()
    assert rows
    assert all(abs(r["psi_term"]) < 1e-9 for r in rows)
    assert abs(sum(r["ref_frac"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["cur_frac"] for r in rows) - 1.0) < 1e-4
    assert all(1 <= r["bin"] <= bins for r in rows)


@SETTINGS
@given(texts=st.lists(st.text(alphabet="abcd ", min_size=1, max_size=30), min_size=1, max_size=8))
def test_bpe_roundtrip_property(spark, texts):
    """For ANY corpus: bpe_encode pieces concatenate back to each doc's
    word stream with </w> sentinels, under merges learned from the same
    corpus."""
    from feature_store_implementation_spark.functions.textfns import tokens_col
    from feature_store_implementation_spark.operators.text import (
        bpe_encode,
        learn_bpe,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = learn_bpe(docs, n_merges=20)
    enc = {r["doc_id"]: r["pieces"] for r in bpe_encode(docs, merges).collect()}
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select("doc_id", tokens_col(F.col("text")).alias("t")).collect()
    }
    for i in enc:
        assert "".join(enc[i]) == "".join(w + "</w>" for w in toks[i])


# ---------------------------------------------------------------------------
# round-7 pure kernels: digest compression, PQ encode, shard assignment
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=400),
    k=st.integers(2, 64),
)
@settings(deadline=None, max_examples=60)
def test_digest_compress_invariants(vals, k):
    """_compress on sorted unit-weight values: total weight conserved,
    chunk means sorted, <= k centroids, every mean inside [min, max],
    and quantile reads stay within the 1/k+epsilon rank-error bound."""
    import bisect

    import numpy as np

    from feature_store_implementation_spark.operators.incremental import _compress

    v = np.sort(np.asarray(vals, dtype=np.float64))
    m, w = _compress(v, np.ones(len(v), dtype=np.int64), k)
    assert len(m) <= k
    assert int(w.sum()) == len(v)
    assert all(w > 0)
    assert (np.diff(m) >= -1e-9).all()
    assert v.min() - 1e-9 <= m.min() and m.max() <= v.max() + 1e-9
    # midpoint read at q=0.5 lands within ~1/k of true rank (plus one
    # value-slot of slack for duplicate-heavy inputs)
    mid = (np.cumsum(w) - w / 2.0) / len(v)
    est = float(np.interp(0.5, mid, m))
    lo = bisect.bisect_left(list(v), est) / len(v)
    hi = bisect.bisect_right(list(v), est) / len(v)
    dist = 0.0 if lo <= 0.5 <= hi else min(abs(lo - 0.5), abs(hi - 0.5))
    assert dist <= 1.0 / k + 1.0 / len(v) + 1e-9


@given(
    n=st.integers(1, 60),
    dim_m=st.sampled_from([(8, 2), (8, 4), (16, 4), (64, 8)]),
    seed=st.integers(0, 5),
)
@settings(deadline=None, max_examples=40)
def test_pq_encode_kernel_picks_nearest_centroid(n, dim_m, seed):
    """_pq_encode_mat: every code indexes the argmin-L2 centroid of its
    normalized subvector (checked against a direct numpy argmin)."""
    import numpy as np

    from feature_store_implementation_spark.operators.similarity import (
        _norm_rows,
        _pq_encode_mat,
    )

    dim, m = dim_m
    rng = np.random.RandomState(seed)
    M = _norm_rows(rng.randn(n, dim))
    books = rng.randn(m, 16, dim // m)
    codes = _pq_encode_mat(M, books)
    assert codes.shape == (n, m) and codes.dtype == np.uint8
    dsub = dim // m
    for j in range(m):
        S = M[:, j * dsub : (j + 1) * dsub]
        d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        assert (codes[:, j] == d2.argmin(axis=1)).all()


@given(
    ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=200, unique=True),
    n_shards=st.integers(1, 32),
    seed=st.integers(0, 3),
)
@settings(deadline=None, max_examples=30, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_shuffle_shards_pointwise_portable(spark, ids, n_shards, seed):
    """shard/pos depend only on (seed, id): the Spark assignment equals
    the pure-python md5 recomputation row for row, for any id set."""
    import hashlib
    from collections import defaultdict

    from feature_store_implementation_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shards(df, n_shards, seed=seed).collect()
    }
    hs = {i: hashlib.md5(f"{seed}|{i}".encode()).hexdigest() for i in ids}
    by = defaultdict(list)
    for i, h in hs.items():
        by[int(h[:8], 16) % n_shards].append((h, i))
    want = {}
    for s, lst in by.items():
        for p, (h, i) in enumerate(sorted(lst), 1):
            want[i] = (s, p)
    assert got == want


# -- asof_join vs pd.merge_asof (all three directions, with/without
#    tolerance, NULL payloads included) --------------------------------------

_asof_ts = st.integers(0, 50)  # seconds; collisions deliberately likely
_asof_left = st.lists(
    st.tuples(st.sampled_from(["k1", "k2"]), _asof_ts),
    min_size=1,
    max_size=12,
)
_asof_right = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        _asof_ts,
        st.one_of(st.none(), st.integers(-5, 5)),
    ),
    min_size=1,  # empty-right needs dtype coaxing in pandas; the NO-MATCH
    max_size=12,  # case is still exercised whenever a key has no right rows
    # merge_asof demands a UNIQUE (by, on) right side for a well-defined
    # answer; duplicate right timestamps are tie-ambiguous in BOTH engines
    unique_by=lambda t: (t[0], t[1]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=_asof_left,
    right=_asof_right,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.one_of(st.none(), st.integers(1, 10)),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction, tol):
    """asof_join == pd.merge_asof on random keyed event streams, for every
    direction and tolerance, INCLUDING right rows whose payload is
    legitimately NULL — the r10 review found per-column carry resurrecting
    stale values over a matched row's NULL (and whole-second truncation
    breaking 'nearest'); the struct-carry rewrite must hold pointwise."""
    import numpy as np

    from feature_store_implementation_spark.operators.asof import asof_join

    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "k": [k for k, _ in left],
            "ts": [base + pd.Timedelta(seconds=t) for _, t in left],
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": [k for k, _, _ in right],
            "ts": [base + pd.Timedelta(seconds=t) for _, t, _ in right],
            "v": [float(v) if v is not None else np.nan for _, _, v in right],
        }
    )
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
    )
    want_set = sorted(
        (r.k, r.ts.isoformat(), None if pd.isna(r.v) else r.v)
        for r in want.itertuples()
    )

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(
        [
            (k, t.to_pydatetime(), v)
            for (k, t, v) in zip(rpdf["k"], rpdf["ts"], rpdf["v"])
        ],
        "k string, ts timestamp, v double",
    ).selectExpr("k", "ts", "CASE WHEN isnan(v) THEN NULL ELSE v END AS v")
    got = asof_join(
        ldf,
        rdf,
        on="ts",
        by="k",
        value_cols=["v"],
        direction=direction,
        tolerance=f"{tol} seconds" if tol is not None else None,
    ).collect()
    got_set = sorted(
        (r["k"], r["ts"].isoformat(), r["v_right"]) for r in got
    )
    assert got_set == want_set
