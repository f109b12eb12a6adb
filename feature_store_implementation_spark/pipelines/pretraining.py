"""The end-to-end pretraining-data build: every curation operator composed
into ONE artifact-producing pipeline with a per-stage survivor manifest.

    ingest (any DataFrame — warc_source / jsonl_quarantine / parquet)
      → Unicode normalize                      (operators/text.normalize_text)
      → quality gate → language gate           (operators/text)
      → lexical near-dup removal (MinHash-LSH) (operators/dedup)
      → semantic near-dup removal (hash-embed SemDeDup, optional)
      → benchmark decontamination (optional)   (operators/dedup.decontaminate)
      → mixture weighting (temperature or explicit, optional)
                                               (operators/sampling.weighted_mix)
      → leakage-safe train/valid/test split    (operators/sampling)
      → deterministic shuffle + shard export   (operators/sampling)
      → sequence-packing stats for the trainer (operators/text.pack_sequences)

The output directory is the dataloader-ready corpus:

    path/
      split=train/shard=0/part-*.parquet  … one pos-ordered run per shard
      split=valid/shard=0/…
      split=test/shard=0/…
      _corpus_manifest.json               … the build's full provenance

``_corpus_manifest.json`` records the parameters, the ordered per-stage
survivor counts, per-split row counts + shard manifests + an
engine-portable content fingerprint, and the packing stats — and contains
NO timestamps, so two runs over the same input with the same seed produce
byte-identical manifests (replay equivalence is pinned in
tests/test_corpus_pipeline.py). Every stage is an operator that is
individually driver-verified; this module only composes them, counts
survivors, and commits the artifact.

The reference has no corpus tooling at all — this pipeline is the brief's
extension surface ("the operations a large-scale training-data pipeline
would need") composed into the product those operators exist for.

Scale shape: the per-stage counts are each one bounded aggregation over a
frame the pipeline materializes anyway; the only all-corpus shuffles are
the ones the underlying operators already pay (LSH banding, the split's
pair clustering, the per-split shard rank). Nothing collects rows to the
driver except the ≤|groups| mixture-weight frame and the manifest's
per-split aggregates.
"""

from __future__ import annotations

import json
import math
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import minhash_near_dup_pairs
from ..operators.sampling import (
    leakage_safe_split,
    mixture_temperature_weights,
    weighted_mix,
    write_training_shards,
)
from ..operators.text import normalize_text, pack_sequences
from .corpus import curate_corpus


def _fingerprint(df: DataFrame, id_col: str, text_col: str) -> str:
    """Order-independent, engine-portable content fingerprint: XOR of the
    leading 60 bits of ``md5(id|text)`` over every surviving row (XOR is
    commutative, so the value is independent of partitioning and row
    order; 60 bits keeps the conv() exact within a signed long)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.col(text_col))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    row = df.select(h.alias("__h")).agg(F.expr("bit_xor(__h)").alias("fp")).first()
    return format(row["fp"] or 0, "015x")


def build_pretraining_corpus(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize_form: str = "NFC",
    collapse_whitespace: bool = True,
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    dedup_threshold: float = 0.7,
    semantic: bool = True,
    semantic_threshold: float = 0.95,
    eval_df: DataFrame | None = None,
    decontaminate_ngram: int = 8,
    mixture_weights: dict[str, float] | None = None,
    mixture_alpha: float | None = None,
    mixture_col: str = "source",
    split_fractions: dict[str, float] | None = None,
    split_threshold: float = 0.5,
    n_shards: int = 8,
    seed: int | str = 0,
    pack_budget: int = 512,
) -> dict:
    """Run the whole pretraining-data build and commit the sharded corpus
    plus its manifest at ``path``. Returns the manifest dict.

    Stage semantics (each delegates to the individually-verified
    operator; parameters pass straight through):

    * **normalize** — ``normalize_form`` Unicode normalization (+
      whitespace collapsing when ``collapse_whitespace``); metadata
      columns (source/lang/…) are re-joined so later stages keep them.
    * **quality / language / lexical_dedup / semantic_dedup /
      decontaminate** — :func:`~.corpus.curate_corpus` with
      ``embeddings="hash"`` when ``semantic`` (self-contained SemDeDup;
      no external model needed) and the benchmark anti-join when
      ``eval_df`` is given.
    * **mixture** — either explicit ``mixture_weights`` (group → keep
      rate, :func:`weighted_mix` semantics) or temperature rebalancing:
      ``mixture_alpha`` computes share^α target weights over
      ``mixture_col`` and converts them to per-group keep rates
      normalized so the most-upweighted group keeps everything
      (rate_g = (w_g/share_g) / max_h(w_h/share_h) — pure downsampling,
      the only kind a filter can do).
    * **split** — :func:`leakage_safe_split` over near-dup pairs
      recomputed at ``split_threshold`` (LOWER than ``dedup_threshold``:
      survivors are never near-dups at the dedup radius, but softer
      twins below it must still not straddle train/eval).
    * **shard** — per split, :func:`write_training_shards` under
      ``path/split=<name>/`` with shard counts scaled to the split
      fraction (≥1), same ``seed`` (a new seed is a fresh epoch
      permutation).
    * **pack** — :func:`pack_sequences` stats over the TRAIN split at
      ``pack_budget`` tokens; the manifest records total tokens and
      chunk count so the trainer can size its epoch without a scan.
    """
    if split_fractions is None:
        split_fractions = {"train": 0.98, "valid": 0.01, "test": 0.01}
    if mixture_weights is not None and mixture_alpha is not None:
        raise ValueError("pass mixture_weights OR mixture_alpha, not both")

    stages: list[dict] = []

    def stage(name: str, n: int) -> None:
        stages.append({"stage": name, "n_docs": int(n)})

    n_input = docs.count()
    stage("ingest", n_input)

    # -- normalize (1:1 map; metadata re-joined) ---------------------------
    meta_cols = [c for c in docs.columns if c not in (id_col, text_col)]
    normed = normalize_text(
        docs,
        text_col,
        id_col,
        form=normalize_form,
        collapse_whitespace=collapse_whitespace,
    )
    if meta_cols:
        normed = normed.join(docs.select(id_col, *meta_cols), id_col)
    stage("normalize", n_input)

    # -- quality → language → lexical dedup → semantic → decontaminate ----
    curated, rep = curate_corpus(
        normed,
        text_col=text_col,
        id_col=id_col,
        min_quality=min_quality,
        languages=languages,
        dedup_threshold=dedup_threshold,
        eval_df=eval_df,
        decontaminate_ngram=decontaminate_ngram,
        embeddings="hash" if semantic else None,
        semantic_threshold=semantic_threshold,
    )
    if id_col != "doc_id":  # curate_corpus standardizes the id column name
        curated = curated.withColumnRenamed("doc_id", id_col)
    stage("quality", rep.n_after_quality)
    stage("language", rep.n_after_language)
    stage("lexical_dedup", rep.n_after_dedup)
    if semantic:
        stage("semantic_dedup", rep.n_after_semantic)
    if eval_df is not None:
        stage("decontaminate", rep.n_after_decontamination)

    # -- mixture weighting -------------------------------------------------
    mixture_record: dict | None = None
    if mixture_alpha is not None:
        w = mixture_temperature_weights(curated, mixture_col, alpha=mixture_alpha)
        rows = w.collect()  # bounded: one row per group
        raw = {r[mixture_col]: r["weight"] / r["share"] for r in rows}
        top = max(raw.values())
        rates = {g: min(1.0, v / top) for g, v in sorted(raw.items())}
        mixture_record = {
            "alpha": float(mixture_alpha),
            "col": mixture_col,
            "rates": {g: round(v, 6) for g, v in rates.items()},
        }
        curated = weighted_mix(
            curated, rates, group_col=mixture_col, key_cols=[id_col]
        )
    elif mixture_weights is not None:
        mixture_record = {
            "col": mixture_col,
            "rates": {g: float(v) for g, v in sorted(mixture_weights.items())},
        }
        curated = weighted_mix(
            curated, mixture_weights, group_col=mixture_col, key_cols=[id_col]
        )
    if mixture_record is not None:
        curated = curated.localCheckpoint(eager=True)
        stage("mixture", curated.count())

    # -- leakage-safe split ------------------------------------------------
    soft_pairs = minhash_near_dup_pairs(
        curated, text_col=text_col, id_col=id_col, threshold=split_threshold
    )
    split_df = leakage_safe_split(
        curated, split_fractions, pairs=soft_pairs, id_col=id_col
    ).localCheckpoint(eager=True)

    # -- shard export + per-split manifest ---------------------------------
    splits: dict[str, dict] = {}
    train_df = None
    for name in split_fractions:
        part = split_df.filter(F.col("split") == name).drop("split", "cluster")
        if name == "train":
            train_df = part
        k = max(1, math.ceil(n_shards * split_fractions[name]))
        shard_manifest = write_training_shards(
            part,
            os.path.join(path, f"split={name}"),
            n_shards=k,
            seed=seed,
            key_cols=[id_col],
        )
        splits[name] = {
            "fraction": float(split_fractions[name]),
            "rows": shard_manifest["total_rows"],
            "fingerprint": _fingerprint(part, id_col, text_col),
            "shards": shard_manifest,
        }
    stage("split", sum(s["rows"] for s in splits.values()))

    # -- packing stats (train) ---------------------------------------------
    if train_df is None:  # unconventional split names: pack the largest split
        largest = max(splits, key=lambda s: splits[s]["rows"])
        train_df = split_df.filter(F.col("split") == largest).drop("split", "cluster")
    packed = pack_sequences(train_df, text_col, id_col, budget=pack_budget)
    tok = packed.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    ).first()
    total_tokens = int(tok["total_tokens"] or 0)
    pack_record = {
        "budget": int(pack_budget),
        "train_docs_packed": int(tok["n_docs"]),
        "total_tokens": total_tokens,
        "n_chunks": math.ceil(total_tokens / pack_budget) if total_tokens else 0,
    }

    manifest = {
        "params": {
            "normalize_form": normalize_form,
            "collapse_whitespace": bool(collapse_whitespace),
            "min_quality": float(min_quality),
            "languages": list(languages),
            "dedup_threshold": float(dedup_threshold),
            "semantic": bool(semantic),
            "semantic_threshold": float(semantic_threshold),
            "decontaminate": eval_df is not None,
            "decontaminate_ngram": int(decontaminate_ngram),
            "split_threshold": float(split_threshold),
            "split_fractions": {k: float(v) for k, v in split_fractions.items()},
            "n_shards": int(n_shards),
            "seed": str(seed),
        },
        "mixture": mixture_record,
        "stages": stages,
        "splits": splits,
        "pack": pack_record,
    }
    tmp = os.path.join(path, f".manifest.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "_corpus_manifest.json"))
    return manifest
