"""Scale spot-check for the dedup/similarity family (verdict-r4 item 6).

The 100 TB claims for the near-dup/ANN operators rest on plan shape plus
sf0.1 timings; this tool measures how candidates-generated, pairs-verified
and wall time actually GROW with corpus size, by synthesizing N×-scaled
corpora from sf0.1 in a way that keeps the true near-dup structure linear
(each replica carries the same intra-replica duplicate clusters; replicas
are mutually dissimilar, so true pairs scale ~N, not N²):

* embeddings — replica k applies a seeded dimension permutation + sign
  flip (an orthogonal map: intra-replica cosines are preserved EXACTLY,
  cross-replica cosines scramble into the random bulk).
* documents — replica k suffixes a replica tag onto EVERY token (a
  bijective vocabulary rename: token-overlap structure inside a replica
  is preserved exactly, so shingle-Jaccard / MinHash / SimHash relations
  within each replica mirror the base corpus, while cross-replica token
  sets are disjoint — zero shared shingles, zero shared unigram
  features). This models N× more data from disjoint domains with the
  same internal duplicate rate — the linear-growth null hypothesis the
  caps are supposed to preserve.

Scaled parquet lands in .scale/x{mult}/ (gitignored). Output: one JSON
line per (route, mult) with corpus size, candidate count, verified-pair
count and seconds, then a growth-exponent summary
(alpha = log(metric_N / metric_1) / log(N); alpha ≈ 1 is linear,
alpha ≈ 2 would mean the quadratic blow-up the caps exist to prevent).

Usage: python tools/scale_check.py [--mults 1,3,10] [--out .scale]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import pandas as pd

ID_STRIDE = 10_000_000
SF_BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_scaled(base_dir: str, out_dir: str, mult: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = pd.read_parquet(os.path.join(base_dir, "documents.parquet"))
    embs = pd.read_parquet(os.path.join(base_dir, "embeddings.parquet"))

    doc_copies = []
    for k in range(mult):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + k * ID_STRIDE
        if k > 0:
            tag = f"_r{k}"
            c["text"] = c["text"].map(
                lambda t: " ".join(w + tag for w in str(t).split())
            )
            c["n_chars"] = c["text"].str.len()
        doc_copies.append(c)
    # multiple row groups so Spark scans parallelize (a single pandas-written
    # row group = a 1-task scan stage, serializing every map-heavy route)
    pd.concat(doc_copies, ignore_index=True).to_parquet(
        os.path.join(out_dir, "documents.parquet"), index=False, row_group_size=2000
    )

    mat = np.vstack(embs["embedding"].to_numpy()).astype(np.float32)
    dim = mat.shape[1]
    emb_copies = []
    for k in range(mult):
        c = embs.copy()
        c["vec_id"] = c["vec_id"] + k * ID_STRIDE
        if k > 0:
            rng = np.random.default_rng(1000 + k)
            perm = rng.permutation(dim)
            signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), dim)
            scrambled = mat[:, perm] * signs
            c["embedding"] = list(scrambled)
        emb_copies.append(c)
    pd.concat(emb_copies, ignore_index=True).to_parquet(
        os.path.join(out_dir, "embeddings.parquet"), index=False, row_group_size=1000
    )


def build_scaled_graph(out_dir: str, mult: int) -> None:
    """Synthesize an edge list with linear-by-construction structure.

    Per replica: ``N0`` nodes in clusters of size ``CLUSTER``; inside a
    cluster node j connects to j+1 and j+2 (mod CLUSTER) — a chorded ring
    with constant degree 4, exactly ``CLUSTER`` triangles per cluster and
    diameter ~CLUSTER/4. Replicas are node-disjoint (ids shifted by
    ID_STRIDE), so components, triangles, reachable BFS sets and PageRank
    mass all scale exactly linearly with mult — the null hypothesis the
    graph operators' growth exponents are measured against.
    """
    os.makedirs(out_dir, exist_ok=True)
    n0, cluster = 200_000, 10
    rows_src, rows_dst = [], []
    base = np.arange(n0, dtype=np.int64)
    cl = base // cluster
    pos = base % cluster
    for off in (1, 2):
        nbr = cl * cluster + (pos + off) % cluster
        rows_src.append(base)
        rows_dst.append(nbr)
    src0 = np.concatenate(rows_src)
    dst0 = np.concatenate(rows_dst)
    src = np.concatenate([src0 + k * ID_STRIDE for k in range(mult)])
    dst = np.concatenate([dst0 + k * ID_STRIDE for k in range(mult)])
    pd.DataFrame({"src": src, "dst": dst}).to_parquet(
        os.path.join(out_dir, "graph_edges.parquet"), index=False, row_group_size=20_000
    )


def timed_count(df) -> tuple[int, float]:
    """Accepts a DataFrame or a zero-arg thunk; a thunk's plan
    CONSTRUCTION (including any eager driver-side work an operator does)
    is billed inside the route's seconds."""
    t0 = time.monotonic()
    if callable(df):
        df = df()
    n = df.count()
    return n, time.monotonic() - t0


def run_routes(spark, scaled_dir: str, mult: int, only: set | None = None) -> list[dict]:
    from feature_store_implementation_spark.operators.dedup import (
        embedding_near_dup_pairs,
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )
    from feature_store_implementation_spark.operators.similarity import lsh_topk

    import pyspark.sql.functions as F

    d = spark.read.parquet(os.path.join(scaled_dir, "documents.parquet"))
    e = spark.read.parquet(os.path.join(scaled_dir, "embeddings.parquet"))
    n_docs, n_vecs = d.count(), e.count()
    rows = []

    def route(name, n_corpus, fn):
        if only and name not in only:
            return
        # candidates first (separate job), then the full verified route
        cands, _ = timed_count(fn(stage="candidates"))
        pairs, secs = timed_count(fn(stage="pairs"))
        rows.append(
            {
                "route": name,
                "mult": mult,
                "corpus_rows": n_corpus,
                "candidates": cands,
                "pairs": pairs,
                "seconds": round(secs, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    route(
        "minhash",
        n_docs,
        lambda stage: minhash_near_dup_pairs(
            d, "text", "doc_id", threshold=0.5, stage=stage
        ),
    )
    route(
        "simhash",
        n_docs,
        lambda stage: simhash_near_dup_pairs(
            d, "text", "doc_id", max_hamming=3, stage=stage
        ),
    )
    route(
        # fixed 128-bit: the within-width growth reference for the auto
        # default's wide regime (auto switches width across the sweep, so
        # its cross-mult alpha mixes two Hamming-radius semantics)
        "simhash_wide",
        n_docs,
        lambda stage: simhash_near_dup_pairs(
            d, "text", "doc_id", max_hamming=3, bits=128, stage=stage
        ),
    )
    route(
        "ngram_jaccard",
        n_docs,
        lambda stage: ngram_jaccard_pairs(
            d, "text", "doc_id", block_col="lang", n=3, threshold=0.2, stage=stage
        ),
    )
    # 0.45 is adversarial: deep in the random-cosine bulk, where even the
    # TRUE pair count is quadratic (the bulk tail crosses the threshold) —
    # it stress-tests candidate generation. 0.9 is the realistic near-dup
    # regime where truth is linear (intra-replica structure only).
    for thr, name in ((0.45, "embedding_lsh_t045"), (0.9, "embedding_lsh_t090")):
        route(
            name,
            n_vecs,
            lambda stage, thr=thr: embedding_near_dup_pairs(
                e, "embedding", "vec_id", threshold=thr, stage=stage
            ),
        )

    # Time-only routes (no candidate stage): fixed-query ANN search and
    # the text-family passes — work should be ~linear in corpus rows.
    from feature_store_implementation_spark.operators.dedup import (
        decontaminate,
        line_dedup,
        remove_repeated_spans,
    )
    from feature_store_implementation_spark.operators.text import unigram_logprob
    from feature_store_implementation_spark.operators.similarity import semantic_dedup

    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # eval split stays FIXED (replica 0 only) while the corpus grows — the
    # realistic shape: the benchmark set doesn't scale with training data
    ev = d.filter((F.col("doc_id") < ID_STRIDE) & (F.col("doc_id") % 97 == 0))
    tr = d.join(ev.select("doc_id"), "doc_id", "left_anti")
    # PQ compressed-domain ANN: build (train+encode, one linear pass) and
    # the fixed-query ADC scan over pre-built codes (the repeated-search
    # shape) measured separately — both should grow ~linearly
    from feature_store_implementation_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    if not only or {"pq_build_encode", "pq_adc_scan"} & only:
        t0 = time.monotonic()
        books = pq_train(e, m=8, nbits=8)
        codes = pq_encode(e, books).localCheckpoint(eager=True)
        build_secs = time.monotonic() - t0
        if not only or "pq_build_encode" in only:
            rows.append(
                {
                    "route": "pq_build_encode",
                    "mult": mult,
                    "corpus_rows": n_vecs,
                    "candidates": None,
                    "pairs": n_vecs,
                    "seconds": round(build_secs, 2),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
        if not only or "pq_adc_scan" in only:
            n, secs = timed_count(pq_topk(codes, q, books, k=10))
            rows.append(
                {
                    "route": "pq_adc_scan",
                    "mult": mult,
                    "corpus_rows": n_vecs,
                    "candidates": None,
                    "pairs": n,
                    "seconds": round(secs, 2),
                }
            )
            print(json.dumps(rows[-1]), flush=True)

    from feature_store_implementation_spark.operators.incremental import (
        merge_quantile_digests,
        quantile_digest_partial,
        quantile_from_digest,
    )
    from feature_store_implementation_spark.operators.text import hash_embed

    # thunks, not frames: plan construction runs ONLY for selected routes
    # (--routes minhash used to still build every other route's plan), and
    # any eager driver-side work an operator gains lands inside the route's
    # reported seconds instead of silently outside timed_count
    for name, mk_frame in (
        ("similarity_lsh_topk", lambda: lsh_topk(e, q, k=10)),
        ("decontaminate", lambda: decontaminate(tr, ev, "text", "doc_id", n=4)),
        ("line_dedup", lambda: line_dedup(d, "text", "doc_id")),
        ("unigram_logprob", lambda: unigram_logprob(d, "text", "doc_id")),
        ("hash_embed", lambda: hash_embed(d, "text", "doc_id")),
        ("repeated_spans", lambda: remove_repeated_spans(d, "text", "doc_id", n=10)),
        (
            "quantile_digest",
            lambda: quantile_from_digest(
                merge_quantile_digests(
                    ["lang"], quantile_digest_partial(d, ["lang"], "n_chars")
                ),
                ["lang"],
                [0.5, 0.95],
            ),
        ),
    ):
        if only and name not in only:
            continue
        n, secs = timed_count(mk_frame)
        rows.append(
            {
                "route": name,
                "mult": mult,
                "corpus_rows": n_vecs if name == "similarity_lsh_topk" else n_docs,
                "candidates": None,
                "pairs": n,
                "seconds": round(secs, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    # persisted-index incremental dedup: a FIXED increment checked against
    # a GROWING indexed corpus — the realistic daily-batch shape; query
    # cost should be ~linear in the corpus signature scan
    if (not only) or ("minhash_index_query" in only):
        import shutil
        import tempfile

        from feature_store_implementation_spark.operators.dedup import (
            minhash_index_query,
            minhash_index_write,
        )

        inc = d.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < ID_STRIDE))
        corpus = d.join(inc.select("doc_id"), "doc_id", "left_anti")
        idx = tempfile.mkdtemp(prefix="scale_mhidx_")
        try:
            t0 = time.monotonic()
            n_idx = minhash_index_write(corpus, idx)
            w_secs = time.monotonic() - t0
            n, q_secs = timed_count(
                minhash_index_query(spark, inc, idx, threshold=0.5)
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)
        rows.append(
            {
                "route": "minhash_index_query",
                "mult": mult,
                "corpus_rows": n_idx,
                "candidates": None,
                "pairs": n,
                "seconds": round(q_secs, 2),
                "index_write_seconds": round(w_secs, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    # index APPEND vs REBUILD: fold a FIXED daily increment into a GROWING
    # index. Append cost should stay ~flat (one increment-sized pass); the
    # rebuild alternative is the full corpus re-sign, linear in the corpus —
    # the write_seconds column above IS that rebuild cost, so the contrast
    # is (append_seconds ~ const) vs (index_write_seconds ~ mult)
    if (not only) or ("minhash_index_append" in only):
        import shutil
        import tempfile

        from feature_store_implementation_spark.operators.dedup import (
            minhash_index_append,
            minhash_index_write,
        )

        inc = d.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < ID_STRIDE))
        corpus = d.join(inc.select("doc_id"), "doc_id", "left_anti")
        idx = tempfile.mkdtemp(prefix="scale_mhapp_")
        try:
            t0 = time.monotonic()
            n_idx = minhash_index_write(corpus, idx)
            w_secs = time.monotonic() - t0
            t0 = time.monotonic()
            n_app = minhash_index_append(inc, idx)
            a_secs = time.monotonic() - t0
        finally:
            shutil.rmtree(idx, ignore_errors=True)
        rows.append(
            {
                "route": "minhash_index_append",
                "mult": mult,
                "corpus_rows": n_idx,
                "candidates": None,
                "pairs": n_app,
                "seconds": round(a_secs, 2),
                "index_write_seconds": round(w_secs, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    # semantic dedup with the documented scale discipline: k grows with the
    # corpus so CLUSTER population stays constant (the published SemDeDup
    # practice) — the within-cluster quadratic verify then does linear total
    # work, which is exactly what this route measures
    if (not only) or ("semantic_dedup" in only):
        k = 8 * mult
        # time construction + count: the Lloyd rounds run EAGERLY during
        # plan construction (driver collects per iteration), same caveat as
        # the graph-family BSP routes
        t0 = time.monotonic()
        frame = semantic_dedup(e, k=k, iters=2, threshold=0.45).filter(
            F.col("is_duplicate")
        )
        n = frame.count()
        secs = time.monotonic() - t0
        rows.append(
            {
                "route": "semantic_dedup",
                "mult": mult,
                "corpus_rows": n_vecs,
                "candidates": None,
                "pairs": n,
                "seconds": round(secs, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    return rows


def run_graph_routes(spark, scaled_dir: str, mult: int, only: set | None = None) -> list[dict]:
    """Verdict-r5 item 1: growth exponents for the graph family (the only
    heavy operators whose 100× claims previously rested on plan shape
    alone). All four are fixed-iteration or diameter-bounded BSP loops, so
    at constant degree the expected exponent is ~1."""
    from feature_store_implementation_spark.operators.graph import (
        bfs_hops,
        connected_components,
        pagerank_fixed_point,
        triangle_count,
    )

    import pyspark.sql.functions as F

    edges = spark.read.parquet(os.path.join(scaled_dir, "graph_edges.parquet"))
    n_edges = edges.count()
    rows = []

    def route(name, thunk, scalar=False):
        if only and name not in only:
            return
        # the BSP routes materialize eagerly (localCheckpoint) during plan
        # CONSTRUCTION — time the thunk end-to-end, not just the final count
        t0 = time.monotonic()
        frame = thunk()
        n = frame.collect()[0][0] if scalar else frame.count()
        rows.append(
            {
                "route": name,
                "mult": mult,
                "corpus_rows": n_edges,
                "candidates": None,
                "pairs": n,
                "seconds": round(time.monotonic() - t0, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # one BFS source per 500 clusters: source count scales with the graph,
    # so the reachable set (the output) grows linearly too
    sources = edges.select("src").filter(F.col("src") % 5000 == 0).distinct()
    route(
        "graph_pagerank",
        lambda: pagerank_fixed_point(
            sym, iterations=4, assume_distinct=False, assume_symmetric=True
        ),
    )
    route("graph_components", lambda: connected_components(edges))
    route("graph_bfs", lambda: bfs_hops(edges, sources, max_hops=4))
    # scalar=True: triangle_count returns one aggregate row — record the
    # count itself so alpha_pairs tracks triangle growth
    route("graph_triangles", lambda: triangle_count(edges), scalar=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,3,10")
    ap.add_argument("--out", default=".scale")
    ap.add_argument("--base", default=SF_BASE)
    ap.add_argument(
        "--family", default="all", choices=["all", "dedup", "graph"],
        help="which operator family to sweep",
    )
    ap.add_argument(
        "--routes", default=None,
        help="comma-separated route names to run (default: all in the family)",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale_check")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_rows = []
    for mult in mults:
        scaled = os.path.join(args.out, f"x{mult}")
        only = set(args.routes.split(",")) if args.routes else None
        if args.family in ("all", "dedup"):
            build_scaled(args.base, scaled, mult)
            all_rows.extend(run_routes(spark, scaled, mult, only))
        if args.family in ("all", "graph"):
            build_scaled_graph(scaled, mult)
            all_rows.extend(run_graph_routes(spark, scaled, mult, only))

    lo, hi = mults[0], mults[-1]
    summary = {}
    for metric in ("candidates", "pairs", "seconds"):
        for route in {r["route"] for r in all_rows}:
            a = next(r for r in all_rows if r["route"] == route and r["mult"] == lo)
            b = next(r for r in all_rows if r["route"] == route and r["mult"] == hi)
            if a.get(metric) and b.get(metric) and hi > lo:
                summary.setdefault(route, {})[f"alpha_{metric}"] = round(
                    math.log(b[metric] / a[metric]) / math.log(hi / lo), 2
                )
    print(json.dumps({"growth_exponents": summary}, indent=2))


if __name__ == "__main__":
    main()
