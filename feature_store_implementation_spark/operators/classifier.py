"""fastText-style text-quality classifier: hashed bag-of-n-grams
logistic regression — the "pages that look like the reference corpus"
filter of the GPT-3 / LLaMA / PaLM data pipelines (public: Brown et al.
2020 §A "high-quality" classifier; Touvron et al. 2023 Wikipedia-
reference filter; Joulin et al. 2016 fastText). The reference pipeline
(SURVEY §2.D) has no learned component at all; this is a north-star
extension of its quality-gate story.

Division of labor, sized for 100 TB:

* TRAINING runs on a bounded deterministic sample collected to the
  driver (``sample_n`` per class, default 50k — fastText itself is a
  single-node trainer; the published pipelines train on a few hundred
  thousand pages, not the corpus) and fits full-batch logistic
  regression with plain numpy — bit-deterministic, no RNG, no
  hand-rolled SGD schedule to tune. Same bounded-collect discipline as
  the k-means / PQ codebook trainers (similarity.py).
* SCORING is fully distributed and UDF-FREE: the corpus collapses
  map-side to (doc, bucket, k) — the DSIR featurizer shape — the
  ≤``n_buckets``-row weight table BROADCASTS onto it, and one hash
  aggregation per doc finishes the dot product. No corpus bytes move
  for the join; the only shuffle is the (doc,bucket) collapse itself.

Determinism discipline (the dsir_importance_weights contract): bucket
ids from the first 8 md5 hex chars, trained weights ROUNDED TO 8 DP and
accumulated in DECIMAL during scoring, final sigmoid in double rounded
to 6 dp — so scores are exact across partitionings, sessions, and
engines that share md5.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import tokens_col


def hashed_gram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    ngram_ns: tuple[int, ...],
) -> DataFrame:
    """(doc_id, bucket, k): per-occurrence hashed word-n-gram counts —
    the dsir_importance_weights featurizer (same grams, same md5[:8]
    bucket rule, so a model's buckets mean the same thing everywhere).
    Map-side explode + one (doc,bucket) hash aggregation.

    Tokens are materialized behind their OWN projection boundary before
    the n-gram transform: the transform lambda slices into its token
    argument per element, HOF lambda bodies evaluate interpreted, and an
    inline tokenizer there re-runs once per gram position — O(tokens²)
    per doc (the minhash_signatures discipline; measured 8.2s → ~1s for
    this featurizer at sf0.1)."""
    toks = F.col("__toks")
    parts: list[Column] = []
    for n in ngram_ns:
        if n == 1:
            parts.append(toks)
        else:
            parts.append(
                F.when(
                    F.size(toks) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                        lambda i: F.array_join(F.slice(toks, i, n), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            )
    grams = parts[0]
    for p in parts[1:]:
        grams = F.concat(grams, p)
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % int(n_buckets)
    ).alias("bucket")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            tokens_col(F.col(text_col)).alias("__toks"),
        )
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )


def train_text_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 16,
    ngram_ns: tuple[int, ...] = (1, 2),
    iters: int = 200,
    lr: float = 5.0,
    l2: float = 1e-6,
    sample_n: int = 50_000,
) -> dict:
    """Fit the quality classifier: ``positive`` = reference-quality pages
    (Wikipedia, curated corpora), ``negative`` = raw crawl pages. Each
    class contributes a DETERMINISTIC md5-ranked sample of up to
    ``sample_n`` docs (content-stable: the same corpus always trains on
    the same pages — the portable_sample/cap_per_group rule); features
    are L1-normalized hashed n-gram bags; the fit is full-batch gradient
    descent on L2-regularized logistic loss, bit-deterministic (fixed
    iteration count, no RNG, numpy float64 in fixed order).

    Returns the model as a plain dict: ``weights`` (len ``n_buckets``
    float list, 8-dp-rounded — the broadcastable artifact), ``bias``,
    ``n_buckets``, ``ngram_ns``, ``n_pos``/``n_neg``, ``train_acc``.
    Tokenless docs contribute nothing. Raises on an empty class."""
    if iters <= 0 or lr <= 0:
        raise ValueError("iters and lr must be positive")

    def sampled(df: DataFrame, y: int) -> DataFrame:
        lim = (
            df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
            .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
            .limit(int(sample_n))
        )
        return hashed_gram_counts(lim, "__t", "doc_id", n_buckets, ngram_ns).select(
            F.lit(y).alias("y"), "doc_id", "bucket", "k"
        )

    rows = (
        sampled(positive, 1)
        .unionByName(sampled(negative, 0))
        .collect()
    )
    if not rows:
        raise ValueError("train_text_classifier: no features in either class")
    # fixed order -> deterministic float accumulation
    rows.sort(key=lambda r: (r["y"], r["doc_id"], r["bucket"]))
    doc_keys = sorted({(r["y"], r["doc_id"]) for r in rows})
    if not any(y == 1 for y, _ in doc_keys) or not any(y == 0 for y, _ in doc_keys):
        raise ValueError(
            "train_text_classifier: one class has no documents with tokens"
        )
    idx = {dk: i for i, dk in enumerate(doc_keys)}
    n_docs = len(doc_keys)
    di = np.fromiter(((idx[(r["y"], r["doc_id"])]) for r in rows), dtype=np.int64)
    bi = np.fromiter((r["bucket"] for r in rows), dtype=np.int64)
    kv = np.fromiter((r["k"] for r in rows), dtype=np.float64)
    totals = np.zeros(n_docs)
    np.add.at(totals, di, kv)
    xv = kv / totals[di]  # L1-normalized bag
    y = np.zeros(n_docs)
    for (cls, _), i in idx.items():
        y[i] = cls
    w = np.zeros(int(n_buckets))
    b = 0.0
    for _ in range(int(iters)):
        margin = b + np.bincount(di, weights=xv * w[bi], minlength=n_docs)
        p = 1.0 / (1.0 + np.exp(-margin))
        err = (p - y) / n_docs
        grad_w = np.zeros(int(n_buckets))
        np.add.at(grad_w, bi, err[di] * xv)
        grad_w += float(l2) * w
        w -= float(lr) * grad_w
        b -= float(lr) * (float(err.sum()) + float(l2) * b)
    margin = b + np.bincount(di, weights=xv * w[bi], minlength=n_docs)
    acc = float(np.mean((margin > 0) == (y == 1)))
    return {
        "weights": [round(float(v), 8) for v in w],
        "bias": round(float(b), 8),
        "n_buckets": int(n_buckets),
        "ngram_ns": tuple(int(n) for n in ngram_ns),
        "n_pos": int(np.sum(y == 1)),
        "n_neg": int(np.sum(y == 0)),
        "train_acc": acc,
    }


def classifier_scores(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under a trained model: ``(doc_id, n_feats,
    quality_score)`` with quality_score = sigmoid(bias + Σ x_b·w_b) in
    [0, 1], higher = more positive-class-like. Tokenless docs absent.

    Fully distributed, UDF-free: the corpus collapses to (doc,bucket,k)
    exactly once (the featurizer's one shuffle), the non-zero rows of
    the weight vector broadcast as a ≤n_buckets-row table, and one
    per-doc aggregation finishes the dot product. Weights are
    8-dp-rounded at train time and the dot product accumulates k·w in
    DECIMAL, so the score is exact across partitionings (the DSIR
    discipline); only the final sigmoid runs in double (6 dp).

    The standard gates compose directly: ``.filter(quality_score > t)``
    (GPT-3 uses a Pareto-noised variant of this threshold),
    :func:`~.sampling.resample_by_weight` on the score, or
    :func:`~.text.ccnet_bins`-style binning of the score column."""
    spark = df.sparkSession
    wtab = spark.createDataFrame(
        [(i, v) for i, v in enumerate(model["weights"]) if v != 0.0],
        "bucket long, w double",
    )
    feats = hashed_gram_counts(
        df, text_col, id_col, model["n_buckets"], tuple(model["ngram_ns"])
    )
    dot = (
        F.sum(
            F.col("k").cast("decimal(10,0)")
            * F.coalesce(F.col("w"), F.lit(0.0)).cast("decimal(18,12)")
        ).cast("double")
        / F.sum("k")
    )
    margin = F.round(F.lit(float(model["bias"])) + dot, 8)
    return (
        feats.join(F.broadcast(wtab), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_feats"),
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6
            ).alias("quality_score"),
        )
    )
