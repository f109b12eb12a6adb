"""End-to-end training-corpus curation: the north-star operators composed
into the pipeline a pre-training data team actually runs.

    (optional) line-level boilerplate removal → quality gate → language
    gate → (optional) corpus-LM perplexity-proxy gate → MinHash-LSH
    near-dup clustering → one canonical doc per cluster → (optional)
    benchmark decontamination → (optional) deterministic sampling

Everything stays one lazy DataFrame program per stage — quality and
language scores are row-local (no shuffle), LSH is the banded single-shuffle
plan from ``operators/dedup.py``, clustering is ``operators/graph.py``
min-label propagation over the candidate pairs only (|pairs| rows, not
|corpus|), and the final sample is content-hash-deterministic so re-runs and
corpus growth never resample previously-kept documents.

The reference has no document processing at all; this module exists because
the brief's north star is a 100 TB curation engine, and each stage here is
individually oracle-checked in plans/inventory.py (q_line_dedup,
q_quality_score, q_lang_id, q_unigram_logprob, q_dedup_minhash,
q_dedup_components, q_decontaminate, q_deterministic_sample) — the
pipeline is their composition, tested end-to-end in
tests/test_corpus_pipeline.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _cache_scoped,
    decontaminate,
    line_dedup,
    minhash_near_dup_pairs,
)
from ..operators.graph import connected_components
from ..functions.textfns import tokens_col as _tokens_col
from ..operators.sampling import deterministic_sample
from ..operators.text import (
    language_pred_expr,
    quality_expr,
    unigram_logprob,
)


@dataclass(frozen=True)
class CurationReport:
    """Per-stage survivor counts (driver-side; each is one small action)."""

    n_input: int
    n_after_quality: int
    n_after_language: int
    n_after_dedup: int
    n_after_decontamination: int
    n_output: int
    n_after_semantic: int | None = None  # None when no embeddings were given
    n_after_clean: int | None = None  # None when no page cleaning was asked
    # the gated corpus's MinHash signature frame (scope-cached), so a
    # composing pipeline needing pairs at a SECOND threshold (the
    # leakage-split pass) skips re-scanning the corpus text — pass it to
    # minhash_near_dup_pairs(sigs=...). Lazy Spark plan, not data; None
    # outside a cache scope's lifetime concerns. Excluded from equality.
    minhash_sigs: DataFrame | None = field(default=None, compare=False)
    # the (n_shingle, k) ``minhash_sigs`` was actually built with — a
    # consumer reusing the frame against a PERSISTED index must compare
    # the index's stored params to THIS, not to a hardcoded copy of
    # minhash_signatures' defaults (which can drift silently, ADVICE r10)
    minhash_sig_params: tuple | None = field(default=None, compare=False)
    # ((stage, wall_seconds), ...) measured BETWEEN this call's own Spark
    # actions — the black-box-buster for pipeline bench drift: without it,
    # a composing build can only time curate_corpus as one opaque lump
    # (r10 verdict: the driver bench moved +14% with no way to say which
    # stage). Lazy caches mean each stage's first action pays its upstream
    # compute — exactly the honest attribution.
    stage_seconds: tuple | None = field(default=None, compare=False)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    extract: str | None = None,
    clean: str | None = None,
    clean_params: dict | None = None,
    quality: str = "score",
    quality_params: dict | None = None,
    dedup_threshold: float | None = 0.7,
    sample_fraction: float | None = None,
    strip_boilerplate: bool = False,
    boilerplate_max_doc_freq: int = 2,
    min_avg_logprob: float | None = None,
    eval_df: DataFrame | None = None,
    decontaminate_ngram: int = 8,
    embeddings: DataFrame | str | None = None,
    embedding_col: str = "embedding",
    embedding_id_col: str = "doc_id",
    semantic_k: int | None = None,
    semantic_threshold: float = 0.95,
) -> tuple[DataFrame, CurationReport]:
    """Run the full curation pipeline; returns (curated_docs, report).

    Near-dup clusters keep their minimum ``id_col`` document (deterministic
    canonical choice). ``strip_boilerplate`` replaces each document's text
    with its line-deduplicated form FIRST, so every downstream gate scores
    the cleaned text. ``min_avg_logprob`` adds the corpus-LM perplexity-
    proxy gate after the language gate (documents of corpus-atypical
    tokens drop). ``eval_df`` anti-joins away documents sharing any
    ``decontaminate_ngram``-gram with the held-out benchmark set, after
    dedup (so decontamination never resurrects a near-duplicate).
    ``sample_fraction`` applies the content-hash sampler last.
    ``embeddings`` (optional: one row per document id with an
    ``embedding_col`` vector) adds the SemDeDup semantic stage after the
    lexical dedup — paraphrase-level duplicates that share no shingles
    (translations, rewrites) are clustered by cosine inside k-means cells
    (``operators/similarity.semantic_dedup``) and each duplicate group
    keeps its minimum id, mirroring the lexical canonical choice. Only
    surviving documents are clustered (the embedding frame is semi-joined
    down first). Passing the string ``"hash"`` instead of a frame builds
    :func:`~..operators.text.hash_embed` vectors from the surviving
    documents themselves — semantic dedup with ZERO external inputs.
    Hash embeddings are bag-of-words, so this mode catches duplicates
    lexical shingling structurally misses (word-order shuffles share few
    3-gram shingles but have the identical hash vector — pinned in
    tests); true paraphrase detection still needs neural embeddings.

    ``extract="html"`` prepends HTML→text extraction
    (:func:`~..operators.text.html_extract_expr`) as the FIRST stage —
    the Common-Crawl on-ramp: raw crawl payloads are markup, and every
    downstream gate (C4 line rules, Gopher signals, quality score,
    shingle dedup) is defined over prose lines, not tag soup. Row-local
    expression in the same scan, no extra pass, no join; each document's
    ``text_col`` is replaced by its extracted lines.

    ``clean="c4"`` prepends C4-style page cleaning (Raffel et al. 2020
    §2.2, :func:`~..operators.text.c4_clean` — the operator itself, in
    its no-join ``passthrough`` shape): each page's text is replaced by
    its surviving lines and pages failing the page rules drop, BEFORE any
    scoring — the production intake order (C4-clean → quality gate →
    dedup). ``quality="gopher"`` swaps the composite score gate for the
    Gopher rule battery (Rae et al. 2021 A1,
    :func:`~..operators.text.gopher_rules`, same no-join shape) — the
    gate is ``keep = 1`` over the full rule conjunction, and the signal
    columns ride through to the output as corpus diagnostics the way
    ``quality``/``predicted_lang`` do under the default.
    ``quality="model"`` gates on a LEARNED classifier instead
    (``quality_params={"model": train_text_classifier(...), "threshold":
    0.5}`` — the GPT-3/LLaMA reference-corpus filter,
    :func:`~..operators.classifier.classifier_scores`); docs that score
    nothing (no tokens) fail the gate. ``clean_params`` /
    ``quality_params`` pass straight through to the operators.

    Precondition: input columns must not collide with the reserved
    staging names ``__toks`` (this pipeline's projected token array) or
    gopher_rules' ``__gr_words``/``__gr_words_lc``/``__gr_lines`` under
    ``quality="gopher"`` — a colliding name fails with a duplicate/
    ambiguous-column AnalysisException.

    Precondition: ``id_col`` must be unique and non-null. Duplicate ids
    would fan out multiplicatively in the quality/language joins and, with
    ``strip_boilerplate``, be collapsed by ``line_dedup`` then re-expanded
    by the metadata re-join — so they are rejected up front (checked in
    the same action that counts the input)."""
    import time as _time

    _stage_secs: list = []
    _t = [_time.monotonic()]

    def _tick(name: str) -> None:
        now = _time.monotonic()
        _stage_secs.append((name, round(now - _t[0], 3)))
        _t[0] = now

    id_stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("n_ids"),
    ).collect()[0]
    n_input = id_stats["n"]
    _tick("input")
    if id_stats["n_ids"] != n_input:
        raise ValueError(
            f"curate_corpus requires unique non-null '{id_col}' values: "
            f"{n_input} rows but {id_stats['n_ids']} distinct ids — "
            f"dedup ids first (e.g. docs.dropDuplicates(['{id_col}']))"
        )

    if extract is not None:
        if extract != "html":
            raise ValueError(f"extract must be 'html' or None — got {extract!r}")
        from ..operators.text import html_extract_expr

        # FIRST stage, before even boilerplate line-dedup (whose line
        # hashing wants prose lines, not markup): row-local replacement
        # of text_col in the same scan — no join, no gate (pages that
        # extract to nothing fall to the clean/quality gates)
        docs = docs.withColumn(text_col, html_extract_expr(F.col(text_col)))
        _tick("html_extract")

    if strip_boilerplate:
        cleaned = line_dedup(
            docs, text_col, id_col, max_doc_freq=boilerplate_max_doc_freq
        ).select(
            F.col("doc_id").alias(id_col), F.col("clean_text").alias(text_col)
        )
        keep_cols = [c for c in docs.columns if c not in (id_col, text_col)]
        if keep_cols:
            cleaned = cleaned.join(docs.select(id_col, *keep_cols), id_col)
        docs = cleaned

    n_after_clean = None
    if clean is not None:
        if clean != "c4":
            raise ValueError(f"clean must be 'c4' or None — got {clean!r}")
        from ..operators.text import c4_clean

        page_cols = [c for c in docs.columns if c != text_col]
        # the page-survivor count rides the first downstream action as an
        # Observation (same zero-extra-scan discipline as the gate counts
        # below — a dedicated count here re-ran the c4 scan; review r11);
        # the tick therefore bills ~0 and the c4 compute lands on the
        # stage whose action fills the gated cache, per the lazy-cache
        # attribution convention
        from pyspark.sql import Observation

        _clean_obs = Observation()
        docs = (
            c4_clean(docs, text_col, id_col, passthrough=True, **(clean_params or {}))
            .observe(_clean_obs, F.sum((F.col("keep") == 1).cast("long")).alias("nc"))
            .filter(F.col("keep") == 1)
            .select(*page_cols, F.col("clean_text").alias(text_col))
        )
        _clean_fallback = docs  # the survivors, for the LocalRelation fallback
        _tick("c4_clean")

    # quality and language are ROW-LOCAL — annotate in the scan itself.
    # (Through round 9 this was docs ⋈ quality_score ⋈ language_id on
    # doc_id: two corpus-wide hash-join shuffles for values computable in
    # the projection. quality_expr/language_pred_expr are the operators'
    # own expressions — one definition, no drift.)
    # quality/language annotations tokenize from ONE projected token-array
    # attribute (the text.py ``tokens`` knob): the score gate's quality +
    # language expressions reference the token array ~7 times between
    # them, and an inline tokens_col re-ran split() per reference per row
    if quality == "gopher":
        from ..operators.text import gopher_rules

        annotated = (
            gopher_rules(
                docs.withColumnRenamed(id_col, "doc_id"),
                text_col,
                "doc_id",
                passthrough=True,
                **(quality_params or {}),
            )
            .select("*", _tokens_col(F.col(text_col)).alias("__toks"))
            .select(
                "*",
                language_pred_expr(
                    F.col(text_col), tokens=F.col("__toks")
                ).alias("predicted_lang"),
            )
            .drop("__toks")
        )
        q_pass = F.col("keep") == 1
    elif quality == "score":
        annotated = (
            docs.withColumnRenamed(id_col, "doc_id")
            .select("*", _tokens_col(F.col(text_col)).alias("__toks"))
            .select(
                "*",
                quality_expr(F.col(text_col), tokens=F.col("__toks")).alias(
                    "quality"
                ),
                language_pred_expr(
                    F.col(text_col), tokens=F.col("__toks")
                ).alias("predicted_lang"),
            )
            .drop("__toks")
        )
        q_pass = F.col("quality") >= min_quality
    elif quality == "model":
        # learned quality gate (the GPT-3/LLaMA classifier recipe): score
        # under a trained operators/classifier model and keep docs above
        # the threshold. The ONE non-row-local quality mode: scoring is
        # the classifier's (doc,bucket,k) collapse + broadcast-weights
        # dot product, joined back id-keyed — still no UDF and no second
        # corpus scan beyond the featurize. Tokenless docs score nothing
        # → they fail the gate (coalesce 0.0), matching the other modes'
        # treatment of empty text.
        qp = dict(quality_params or {})
        model = qp.get("model")
        if model is None:
            raise ValueError(
                "quality='model' needs quality_params={'model': "
                "train_text_classifier(...)[, 'threshold': 0.5]}"
            )
        thr = float(qp.get("threshold", 0.5))
        from ..operators.classifier import classifier_scores

        base = docs.withColumnRenamed(id_col, "doc_id")
        scores = classifier_scores(base, model, text_col, "doc_id").select(
            "doc_id", "quality_score"
        )
        annotated = (
            base.join(scores, "doc_id", "left")
            .select("*", _tokens_col(F.col(text_col)).alias("__toks"))
            .select(
                "*",
                language_pred_expr(
                    F.col(text_col), tokens=F.col("__toks")
                ).alias("predicted_lang"),
            )
            .drop("__toks")
        )
        q_pass = F.coalesce(F.col("quality_score"), F.lit(0.0)) >= thr
    else:
        raise ValueError(
            f"quality must be 'score', 'gopher' or 'model' — got {quality!r}"
        )
    l_pass = q_pass & F.col("predicted_lang").isin(*languages)
    after_q = annotated.filter(q_pass)
    after_l = annotated.filter(l_pass)
    # the gated frame feeds LSH twice (signatures + verify) — cache it
    if min_avg_logprob is not None:
        n_after_quality = after_q.count()
        lp = unigram_logprob(after_l, text_col, "doc_id").select(
            "doc_id", "avg_logprob"
        )
        after_l = after_l.join(lp, "doc_id").filter(
            F.col("avg_logprob") >= min_avg_logprob
        )
        after_l = _cache_scoped(after_l)
        n_after_language = after_l.count()
        # no _tick here: the unconditional quality_language tick below
        # covers both branches — an in-branch tick double-appended the
        # stage name and the later ~0s entry overwrote the real seconds
        # in every dict() consumer (review r11)
    else:
        # both survivor counts ride the LSH stage's cache-fill action as
        # Spark Observation metrics — ZERO extra corpus scans (through
        # r10 this was one dedicated conditional-agg job; the observed
        # node sits above the gate filters, so the fill that materializes
        # the gated cache sees every annotated row). Read deferred to
        # report construction — by then the dedup pass has acted.
        from pyspark.sql import Observation

        _gate_obs = Observation()
        after_l = _cache_scoped(
            annotated.observe(
                _gate_obs,
                F.sum(q_pass.cast("long")).alias("nq"),
                F.sum(l_pass.cast("long")).alias("nl"),
            ).filter(l_pass)
        )
        n_after_quality = n_after_language = None  # resolved from _gate_obs
    _tick("quality_language")

    # signatures computed ONCE over the gated corpus (the heavy
    # tokenize→shingle→hash text scan), scope-cached, and handed to
    # every pair pass — this call's, and the composing build's
    # leakage-split pass at a lower threshold (report.minhash_sigs)
    from ..operators.dedup import minhash_signatures

    gated = (
        after_l.withColumnRenamed("doc_id", id_col) if id_col != "doc_id" else after_l
    )
    import inspect as _inspect

    _sig_defaults = _inspect.signature(minhash_signatures).parameters
    sig_params = (_sig_defaults["n_shingle"].default, _sig_defaults["k"].default)
    sigs = _cache_scoped(minhash_signatures(gated, text_col, id_col))
    # the in-pipeline dedup pass self-computes: its internal signature
    # plan has the same semantic hash as `sigs`, so the scope cache is
    # SHARED (one materialization), and skipping the sigs= param keeps
    # the needless self-semi-join out of this pass's plan — the param is
    # for the build's split pass, whose doc set is a strict subset
    if dedup_threshold is None:
        # soft-dedup composition (build_pretraining_corpus lexical="soft",
        # round-12): keep every near-dup — the composing build WEIGHTS
        # duplicates (He et al. 2024) instead of dropping them. The
        # signature frame above still materializes for the build's
        # leakage-split pass; only the pair/drop passes are skipped.
        deduped = after_l
    else:
        pairs = minhash_near_dup_pairs(
            gated,
            text_col=text_col,
            id_col=id_col,
            threshold=dedup_threshold,
        )
        comps = connected_components(pairs, src="doc_id_a", dst="doc_id_b")
        # The loser frames (ids only — O(dup_rate × corpus) rows, a sliver
        # of the corpus BYTES) are scope-cached: every downstream action on
        # the survivor frame — stage counts here, and in a composed build
        # the mixture/split/shard/fingerprint/pack passes — re-executes the
        # survivor lineage, and without these caches each re-execution
        # would re-run the full LSH (and semantic/decontamination) plan
        # instead of re-joining a materialized id list against the cached
        # gated frame.
        losers = _cache_scoped(
            comps.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias("doc_id")
            )
        )
        # NO broadcast hint here: the loser set is O(dup_rate x corpus) —
        # at 100 TB with 30-50% duplicate rates that is billions of rows.
        # Let AQE pick the strategy (it still broadcasts when small).
        deduped = after_l.join(losers, "doc_id", "left_anti")
    n_after_dedup = deduped.count()
    _tick("lexical_dedup")

    n_after_semantic = None
    if embeddings is not None:
        from ..operators.similarity import semantic_dedup

        if semantic_k is None:
            # The published SemDeDup discipline: fix cluster POPULATION,
            # not cluster count — the within-cell verify is quadratic in
            # cell size, so k grows with the survivor count to hold ~128
            # vectors per cell (inside the 125-625 range the recall curve
            # in SCALING.md was measured over). Callers wanting the exact
            # operator default pass semantic_k=16 explicitly.
            semantic_k = max(2, -(-n_after_dedup // 128))

        if isinstance(embeddings, str):
            if embeddings != "hash":
                raise ValueError(
                    f"embeddings must be a DataFrame, 'hash', or None — got {embeddings!r}"
                )
            from ..operators.text import hash_embed

            embedding_col, embedding_id_col = "embedding", "doc_id"
            alive = hash_embed(
                deduped.withColumnRenamed("doc_id", id_col)
                if id_col != "doc_id"
                else deduped,
                text_col,
                id_col,
            ).withColumnRenamed(id_col, "doc_id")
        else:
            alive = embeddings.join(
                deduped.select(F.col("doc_id").alias(embedding_id_col)),
                embedding_id_col,
                "left_semi",
            )
        # semantic_dedup consumes its input ~6 times (k-means seeding +
        # Lloyd iterations + top-n assignment + the blocked pair join);
        # left lazy, each pass would re-run hash_embed / the semi-join AND
        # the whole survivor lineage behind it
        alive = _cache_scoped(alive)
        sem_losers = _cache_scoped(
            semantic_dedup(
                alive,
                vec_col=embedding_col,
                id_col=embedding_id_col,
                k=semantic_k,
                threshold=semantic_threshold,
                # only the hash-embed route is 1:1 with the lexical
                # survivors; an external embeddings frame may not cover
                # every survivor, so its true count is NOT known here and
                # the gate hint stays unset (review r11)
                n_rows=n_after_dedup if isinstance(embeddings, str) else None,
            )
            .filter(F.col("is_duplicate"))
            .select(F.col(embedding_id_col).alias("doc_id"))
        )
        deduped = deduped.join(sem_losers, "doc_id", "left_anti")
        n_after_semantic = deduped.count()
        _tick("semantic_dedup")

    # survivor counts are only re-measured when a stage actually FILTERED:
    # with eval_df/sample_fraction absent the frame is unchanged, and the
    # pre-r13 unconditional .count() re-ran the whole survivor lineage
    # (gated-cache anti-joins) twice more per call for numbers already in
    # hand — two full survivor passes saved per curate in the common shape
    if eval_df is not None:
        contaminated = _cache_scoped(
            decontaminate(
                deduped.withColumnRenamed("doc_id", id_col)
                if id_col != "doc_id"
                else deduped,
                eval_df,
                text_col,
                id_col,
                n=decontaminate_ngram,
            ).select("doc_id")
        )
        deduped = deduped.join(contaminated, "doc_id", "left_anti")
        n_after_decontamination = deduped.count()
    else:
        n_after_decontamination = (
            n_after_semantic if n_after_semantic is not None else n_after_dedup
        )
    _tick("decontaminate")

    out = deduped
    if sample_fraction is not None:
        out = deterministic_sample(out, ["doc_id"], sample_fraction)
        n_output = out.count()
    else:
        n_output = n_after_decontamination
    _tick("output")
    from ..functions.obs import observed_metrics as _observed

    if clean is not None and n_after_clean is None:
        _clean_m = _observed(_clean_obs)
        if _clean_m is not None:
            n_after_clean = int(_clean_m["nc"] or 0)
        else:
            # folded LocalRelation inputs — same caveat as the gate obs
            n_after_clean = _clean_fallback.count()
    if n_after_quality is None:
        # the cache-fill action has long since run (every later stage
        # counted survivors of the cached gate), so this read returns
        # the already-collected metrics without triggering a job; the
        # wait is BOUNDED (ADVICE r12 — an unbounded get would hang
        # forever on a metrics row that never materializes)
        _gate_rows = _observed(_gate_obs)
        if _gate_rows is not None:
            n_after_quality = int(_gate_rows["nq"] or 0)
            n_after_language = int(_gate_rows["nl"] or 0)
        else:
            # tiny LOCAL inputs (createDataFrame test corpora) can fold
            # the plan into a LocalRelation whose observed-metrics row
            # PySpark's toPyRow cannot convert — fall back to the direct
            # conditional agg (one map-only job; only ever paid on local
            # relations, where it is driver-cheap by construction)
            gate = annotated.agg(
                F.sum(q_pass.cast("long")).alias("nq"),
                F.sum(l_pass.cast("long")).alias("nl"),
            ).collect()[0]
            n_after_quality = int(gate["nq"] or 0)
            n_after_language = int(gate["nl"] or 0)
    return out, CurationReport(
        n_input,
        n_after_quality,
        n_after_language,
        n_after_dedup,
        n_after_decontamination,
        n_output,
        n_after_semantic,
        n_after_clean=n_after_clean,
        minhash_sigs=sigs,
        minhash_sig_params=sig_params,
        stage_seconds=tuple(_stage_secs),
    )
