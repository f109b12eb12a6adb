"""Text-analysis operators (north-star extension): language ID, quality
scoring, token counting, document fingerprinting.

Everything is built from JVM-side expressions (regexp counts, higher-order
array folds) so the hot path stays inside whole-stage codegen, and every
formula is reproducible in ANSI SQL for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import tokens_col

# Tiny per-language function-word lists for the n-gram/stopword heuristic.
# Deliberately minimal and public-knowledge; ties broken by language-code
# order for determinism.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "que"],
    "zh": ["de", "shi", "bu", "zai", "you", "wo", "le", "ren"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "for", "on", "with", "as", "was", "at", "by"]


def _count_in(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token/char statistics: counts, average token length, punctuation and
    whitespace ratios, uppercase ratio. Pure expressions; one pass."""
    text = F.col(text_col)
    toks = tokens_col(text, lowercase=False)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    n_space = n_chars - F.length(F.regexp_replace(text, r"\s", ""))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            (n_chars - n_space).cast("double") / F.greatest(n_tokens, F.lit(1)), 6
        ).alias("avg_token_len"),
        F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_upper.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("upper_ratio"),
    )


def _quality_parts(text: Column, tokens: Column | None = None) -> tuple[Column, Column, Column]:
    """(length_score, punct_score, stop_score) sub-expressions shared by
    :func:`quality_score` (the operator) and :func:`quality_expr` (the
    inline-annotation form) — ONE definition, so the pipeline's inlined
    gate and the oracle-checked operator can never drift.

    ``tokens``: a pre-projected token-array attribute. The sub-expressions
    reference the token array more than once, and an inline tokenizer is
    re-evaluated per reference (per ROW here — constant factor, unlike the
    per-element HOF case); callers that can project the array first
    (quality_score, curate_corpus) pass it to tokenize once."""
    toks = tokens if tokens is not None else tokens_col(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    stop_ratio = _count_in(toks, EN_STOPWORDS).cast("double") / F.greatest(n_tokens, F.lit(1))
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    ).cast("double") / F.greatest(n_chars, F.lit(1))
    length_score = F.least(n_tokens.cast("double") / 50.0, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    return length_score, punct_score, stop_score


def quality_expr(text: Column, tokens: Column | None = None) -> Column:
    """The ``quality`` column of :func:`quality_score` as a row-local
    EXPRESSION, for callers annotating a corpus frame in place: a
    pipeline that joins a quality frame back on doc_id shuffles the whole
    corpus for a value computable in the scan (curate_corpus did exactly
    that through round 9 — two corpus-wide hash joins gone)."""
    length_score, punct_score, stop_score = _quality_parts(text, tokens)
    return F.round(0.4 * length_score + 0.3 * punct_score + 0.3 * stop_score, 6)


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality in [0,1]: length sweet-spot, moderate
    punctuation, healthy stopword density (the classic Gopher-style rules,
    reduced to oracle-expressible arithmetic)."""
    text = F.col(text_col)
    # tokens projected once (the _quality_parts ``tokens`` knob) — the
    # parts reference the array twice, re-tokenizing per reference inline
    length_score, punct_score, stop_score = _quality_parts(
        text, tokens=F.col("__toks")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col),
        tokens_col(text).alias("__toks"),
    ).select(
        "doc_id",
        F.round(length_score, 6).alias("length_score"),
        F.round(stop_score, 6).alias("stopword_score"),
        F.round(
            0.4 * length_score + 0.3 * punct_score + 0.3 * stop_score, 6
        ).alias("quality"),
    )


def _language_scores(text: Column, tokens: Column | None = None) -> dict[str, Column]:
    """Per-language rounded marker-hit scores (shared single definition;
    see :func:`_quality_parts` for the ``tokens`` pre-projection knob —
    one _count_in per language each re-tokenizes inline otherwise)."""
    toks = tokens if tokens is not None else tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    return {
        lang: F.round(_count_in(toks, words).cast("double") / n, 6)
        for lang, words in sorted(LANG_MARKERS.items())
    }


def _argmax_lang(scores: dict[str, Column]) -> Column:
    langs = sorted(scores)
    best = F.greatest(*[scores[lg] for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # earlier lang wins ties → apply in reverse
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    # zero marker hits = NO evidence: an all-zero tie would otherwise
    # resolve to the alphabetically-first code, confidently routing every
    # out-of-marker-set language (ja, ru, ar, ...) to 'de' — NULL says
    # "unknown", which is what a router must see
    return F.when(best == 0, F.lit(None).cast("string")).otherwise(pred)


def language_pred_expr(text: Column, tokens: Column | None = None) -> Column:
    """``predicted_lang`` of :func:`language_id` as a row-local
    expression — the inline-annotation twin of :func:`quality_expr`."""
    return _argmax_lang(_language_scores(text, tokens))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Function-word-count language ID: score each candidate language by
    marker hits per token, pick the argmax (ties → language-code order).
    Scores ride along for calibration."""
    scores = _language_scores(F.col(text_col), tokens=F.col("__toks"))
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("__toks"),
    ).select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(scores)],
    )
    langs = sorted(scores)
    pred = _argmax_lang({lg: F.col(f"score_{lg}") for lg in langs})
    return scored.select(
        "doc_id",
        pred.alias("predicted_lang"),
        *[f"score_{lg}" for lg in langs],
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling hash over the token sequence — a cheap
    content fingerprint for shift-tolerant exact matching. The token code
    (first-char code × 131 + length × 7919) and the mod-2⁴⁰ accumulator are
    chosen to be overflow-free and bit-identical in ANSI SQL."""
    toks = tokens_col(F.col(text_col))
    code = lambda t: (F.ascii(t).cast("long") * 131 + F.length(t).cast("long") * 7919)  # noqa: E731
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + code(t)) % F.lit(1099511627776).cast("long"),  # 2^40
    )
    return df.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


POS_WORDS = ["good", "great", "excellent", "best", "love", "happy", "well", "better"]
NEG_WORDS = ["bad", "worst", "terrible", "hate", "poor", "wrong", "problem", "fail"]


def sentiment_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dictionary-scored sentiment (the EDBT'16 lexicon pattern, PAPERS.md):
    (pos − neg) / tokens in [−1, 1], plus the raw hit counts — pure codegen
    expressions, dictionary broadcast inside the plan as literals."""
    toks = tokens_col(F.col(text_col))
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    pos = _count_in(toks, POS_WORDS)
    neg = _count_in(toks, NEG_WORDS)
    return df.select(
        F.col(id_col).alias("doc_id"),
        pos.cast("long").alias("n_pos"),
        neg.cast("long").alias("n_neg"),
        F.round((pos - neg).cast("double") / n, 6).alias("sentiment"),
    )


# PII patterns: deliberately simple, dialect-portable regexes (no
# lookarounds/backrefs — Java regex and RE2 agree on every construct used).
# Redaction order matters only in that emails must go before the generic
# token patterns could ever overlap; these three are mutually disjoint.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_redact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Detect-and-redact PII (emails, IPv4s, NNN-NNN-NNNN phones): per-doc
    match counts plus a ``clean_text`` with every match replaced by a typed
    token. Each pattern is counted on the text AFTER the earlier patterns
    redacted — the same progressive view the replacement chain sees — so
    the counts always reconcile with the tokens in ``clean_text`` (an IP
    embedded in an email's domain is one <EMAIL>, not also an <IP>). Pure
    regexp expressions — the whole pass stays inside whole-stage codegen,
    no UDF, no shuffle; at 100 TB this is a map-only stage that composes
    with any downstream filter."""
    text = F.col(text_col)
    cols: list[Column] = [F.col(id_col).alias("doc_id")]
    clean = text
    for name, pat, token in PII_PATTERNS:
        cols.append(F.regexp_count(clean, F.lit(pat)).cast("long").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, token)
    return df.select(*cols, clean.alias("clean_text"))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition (the Gopher/MassiveText repetition filters'
    core signals): per doc, token count, distinct-token count, duplicate
    fraction (1 − distinct/total) and the most-frequent token's share.

    Plan: explode → two-level aggregation. Both aggregations partial-combine
    map-side, and the shuffle key (doc_id, word) then doc_id is fine-grained
    — no single-key hotspot at any corpus size. The expression-only
    alternative (size(array_distinct(...)) etc.) avoids the shuffle but
    computes the mode via an O(words²) per-row fold; explode wins at scale."""
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("word"),
    )
    per_word = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    n = F.sum("cnt").cast("double")
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.round(F.lit(1.0) - F.count(F.lit(1)) / n, 6).alias("dup_frac"),
            F.round(F.max("cnt") / n, 6).alias("top_share"),
        )
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram LM — the CCNet-style perplexity proxy: documents whose tokens
    are corpus-typical score high, gibberish/rare-token documents score
    low (most negative). Returns (doc_id, n_tokens, avg_logprob); docs
    with zero tokens are absent (no tokens → no distribution).

    Plan at 100 TB: the corpus collapses FIRST to (doc, token, in-doc
    count) — so the token-keyed join ships one row per (doc, token), not
    one per occurrence, and the Zipf head ("the" in every doc) skews by
    at most |docs-per-reducer| with AQE skew-split behind it (the vocab
    side broadcasts when small). The vocab is the per-doc frame's own
    re-aggregation (shuffle reuse on tok), the per-doc mean is one
    aggregation on doc_id, and the mean is count-weighted so it equals
    the per-occurrence mean exactly. No collect, no window.

    Determinism discipline (same as q_user_entropy): the probability is
    an exact integer division, LN is rounded to 8 decimals BEFORE
    accumulation (neither engine's ln is correctly rounded), partial sums
    accumulate in DECIMAL, and only the final mean returns to double."""
    per_doc = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    vocab = per_doc.groupBy("tok").agg(F.sum("k").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    # decimal sizing: k(10,0) × lp(18,12) → (29,12), summed at (38,12) —
    # inside Spark's 38-digit cap, so no silent scale reduction (a
    # (20,0)×(28,12) product would overflow precision and round to scale 6)
    lp = F.round(F.log(F.col("cnt") / F.col("total").cast("double")), 8).cast(
        "decimal(18,12)"
    )
    weighted = F.col("k").cast("decimal(10,0)") * lp
    return (
        per_doc.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.round(
                F.sum(weighted).cast("double") / F.sum("k"), 6
            ).alias("avg_logprob"),
        )
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_bins: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    lay every document's tokens end-to-end in deterministic ``id_col`` order
    and cut the stream into fixed ``budget``-token training chunks. Returns
    per doc: token count, its start offset in the global stream, and the
    first/last chunk ids it lands in (a doc spans a chunk boundary when
    chunk_first < chunk_last). Empty docs contribute nothing and are
    dropped.

    The global running token offset is a TWO-PASS DISTRIBUTED cumsum, not a
    single-partition window (same discipline as q_window_ntile): range-bin
    on the id via width_bucket (row-local, deterministic), per-bin local
    cumsum in parallel, per-bin totals → broadcast offsets. The only
    unpartitioned window runs over the ≤n_bins-row totals frame."""
    from pyspark.sql import Window as W

    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    bounds = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    if bounds[0] is None:
        return d.select(
            "doc_id",
            "n_tokens",
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("chunk_first"),
            F.lit(0).cast("long").alias("chunk_last"),
        )
    lo, hi = int(bounds[0]), int(bounds[1])
    # width_bucket needs lo < hi (a degenerate single-id range yields NULL
    # bins, which would silently drop rows at the bin join)
    bin_col = (
        F.width_bucket("doc_id", F.lit(lo), F.lit(hi), F.lit(n_bins))
        if lo < hi
        else F.lit(1)
    )
    binned = d.withColumn("_bin", bin_col)
    local = binned.withColumn(
        "_local_cum",
        F.coalesce(
            F.sum("n_tokens").over(
                W.partitionBy("_bin").orderBy("doc_id").rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    totals = binned.groupBy("_bin").agg(F.sum("n_tokens").alias("_tok"))
    offsets = totals.select(
        "_bin",
        F.coalesce(
            F.sum("_tok").over(W.orderBy("_bin").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
    )
    start = (F.col("_off") + F.col("_local_cum")).cast("long")
    return local.join(F.broadcast(offsets), "_bin").select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / budget).cast("long").alias("chunk_first"),
        F.floor((start + F.col("n_tokens") - 1) / budget).cast("long").alias("chunk_last"),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 500,
) -> DataFrame:
    """Corpus vocabulary with contiguous token ids: the top ``vocab_size``
    terms by frequency, id assigned in (count desc, term asc) order — the
    deterministic layout a tokenizer-training step consumes.

    Plan: explode → ONE map-side-combinable count aggregation over the full
    corpus, then ranking. The ranking window is unpartitioned but runs over
    the POST-AGGREGATION term frame, and only after a distributed top-k
    (orderBy+limit → TakeOrderedAndProject) has cut it to ``vocab_size``
    rows — the corpus-sized frame is never single-partitioned."""
    from pyspark.sql import Window as W

    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(vocab_size)
    )
    w = W.orderBy(F.desc("n"), F.asc("term"))
    return counts.select(
        "term",
        F.col("n").cast("long").alias("n"),
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df: int = 40,
) -> DataFrame:
    """Inverted index (term → document frequency + sorted postings) for the
    mid-frequency band ``min_df <= df <= max_df`` — the terms a keyword
    search actually uses (singletons are noise, stop-words are scanned
    anyway).

    Scale shape: document frequency is computed FIRST on the cheap
    (term, doc) pairs, the band filter is applied to that aggregate, and
    only surviving terms' postings are materialized via a semi join —
    collect_list never builds a stop-word's corpus-sized postings array
    just to discard it. Postings are emitted as a comma-joined sorted
    string so the result is engine-portable (array renderings differ)."""
    pairs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term"),
    )
    dfreq = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    kept = pairs.join(F.broadcast(dfreq.select("term")), "term", "left_semi")
    # postings sort by the id column's NATIVE type (numeric ids numerically,
    # string ids lexically) — a cast('long') here would crash under ANSI
    # mode for any non-numeric document id (uuid/slug), which nothing in
    # the signature forbids
    return kept.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.col("doc_id"))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 ranking of documents against a bag of query terms — the
    classical sparse-retrieval scorer (Robertson & Spärck Jones), the
    standard first stage in front of embedding re-rank at corpus scale.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Determinism discipline (same as tfidf): idf, avgdl and each per-term
    partial are rounded to 6 dp before the per-doc sum, and the sum runs in
    DECIMAL so it is order-independent — bit-identical to the SQL oracle.

    Plan: tokens of query-term rows only (the isin filter prunes the
    explode output immediately), tf per (doc, term), df per term is a
    ≤|query| row broadcast, doc lengths join back on doc_id, final top-k is
    TakeOrderedAndProject — no corpus-sized window, two shuffles total."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    hits = toks.filter(F.col("term").isin(*query_terms))
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = df.count()
    dl = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).alias("dl"),
    )
    avgdl_row = dl.agg(F.round(F.avg("dl"), 6).alias("avgdl")).first()
    # empty (or all-NULL-text) corpus: avg is NULL — return the empty
    # result frame like the other operators instead of float(None)
    avgdl = float(avgdl_row["avgdl"]) if avgdl_row["avgdl"] is not None else 1.0
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        6,
    )
    part = F.round(
        F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        6,
    )
    scored = (
        tf.join(F.broadcast(dfreq.withColumn("idf", idf)), "term")
        .join(dl, "doc_id")
        .select("doc_id", part.cast("decimal(18,6)").alias("part"))
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score_dec"))
        .select(
            "doc_id", F.col("score_dec").cast("double").alias("bm25")
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(top_k)


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Token-window chunking — the context-window preparation pass every
    RAG/pretraining pipeline runs: split each document into whitespace
    tokens and emit overlapping windows of ``window`` tokens advancing by
    ``stride`` (overlap = window − stride keeps boundary context intact).

    Plan shape at 100 TB: pure JVM expressions — ``sequence`` over chunk
    starts, ``slice``/``array_join`` per window — exploded map-side with NO
    shuffle at all (narrow transform of the document scan); downstream
    sinks repartition as needed. The final window is emitted short rather
    than dropped (a document shorter than ``window`` yields exactly one
    chunk), and a start is emitted only while it makes progress
    (start ≤ n_tokens), so chunk starts are 0, stride, 2·stride, … up to
    the last start strictly below n_tokens — deterministic and exactly
    reproducible in SQL (the DuckDB oracle replays it with
    generate_series).

    Returns ``(doc_id, chunk_id, chunk_text, n_tokens)`` with ``chunk_id``
    0-based in document order."""
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    # NULL text behaves as empty: un-coalesced, size(NULL) is NULL under
    # ANSI and least()/greatest() SKIP nulls, so a NULL-text doc would
    # claim n_tokens = window (a full window of nonexistent tokens) with
    # chunk_text NULL — corrupting downstream token-budget accounting
    toks = F.coalesce(tokens_col(F.col(text_col)), F.array().cast("array<string>"))
    n = F.greatest(F.size(toks), F.lit(1))  # empty doc → one empty chunk
    starts = F.sequence(
        F.lit(0), ((n - 1) / F.lit(stride)).cast("int") * F.lit(stride), F.lit(stride)
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__toks"),
            F.explode(starts).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("start") + 1, window), " "
            ).alias("chunk_text"),
            F.least(
                F.size("__toks") - F.col("start"), F.lit(window)
            ).cast("long").alias("n_tokens"),
        )
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_word_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn byte-pair-encoding merges from a corpus — with the trainer
    architecture every published BPE implementation uses (Sennrich 2016,
    SentencePiece, HF tokenizers): the merge loop operates on the
    (word, frequency) DICTIONARY, not the raw corpus, so Spark's job is
    exactly ONE distributed pass — tokenize + hash-aggregate word counts
    (map-side combined) — and the classic loop then runs driver-side on
    that bounded aggregate (distinct words, not corpus rows; at 100 TB
    raise ``min_word_freq`` to floor the dictionary — hapax legomena
    cannot win a merge anyway at any realistic ``n_merges``).

    Deterministic: merge ties break lexicographically; words are lowercase
    whitespace tokens with a ``</w>`` end-of-word sentinel (the original
    BPE formulation, so merges never cross word boundaries). Returns the
    ordered merge list — feed to :func:`bpe_encode`."""
    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_word_freq)
        .collect()
    )
    # driver loop over the bounded dictionary
    words: dict[tuple[str, ...], int] = {}
    for r in counts:
        words[tuple(r["w"]) + ("</w>",)] = words.get(tuple(r["w"]) + ("</w>",), 0) + r["n"]
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # ties: highest count, then SHORTEST merged symbol, then lexicographic
        best = max(
            pair_counts.items(),
            key=lambda kv: (kv[1], -len(kv[0][0] + kv[0][1]), kv[0]),
        )
        if best[1] < 2:
            break  # merging singletons adds vocabulary without compression
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        out: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            s: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    s.append(merged)
                    i += 2
                else:
                    s.append(sym[i])
                    i += 1
            t = tuple(s)
            out[t] = out.get(t, 0) + n
        words = out
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with learned BPE merges — the distributed half:
    the merge table broadcasts (KBs) and encoding is an Arrow-batched
    map-only pass (the standard encoder: per word, repeatedly apply the
    LOWEST-RANK applicable merge until none applies — exactly the
    segmentation training converged to on training words). Returns
    (id, pieces array<string>, n_pieces); ``concat(pieces)`` per word
    round-trips to word+``</w>`` by construction."""
    import pandas as pd

    from pyspark.sql import types as T

    from .dedup import _broadcast_scoped

    rank = {tuple(m): i for i, m in enumerate(merges)}
    spark = df.sparkSession
    # scope-released like every other broadcast (see dedup._CacheScope):
    # without it each call pins the merge table on driver+executors forever
    b_rank = _broadcast_scoped(spark.sparkContext.broadcast(rank))

    v = df.select(F.col(id_col).alias("__id"), tokens_col(F.col(text_col)).alias("__toks"))
    out_schema = T.StructType(
        [
            T.StructField("id", v.schema["__id"].dataType),
            T.StructField("pieces", T.ArrayType(T.StringType())),
            T.StructField("n_pieces", T.LongType()),
        ]
    )

    def encode(batches):
        rk = b_rank.value
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            sym = list(w) + ["</w>"]
            while len(sym) > 1:
                best_i, best_r = -1, None
                for i in range(len(sym) - 1):
                    r = rk.get((sym[i], sym[i + 1]))
                    if r is not None and (best_r is None or r < best_r):
                        best_i, best_r = i, r
                if best_r is None:
                    break
                sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
            cache[w] = sym
            return sym

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pieces = [
                [p for w in toks for p in enc_word(w)] for toks in pdf["__toks"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["__id"],
                    "pieces": pieces,
                    "n_pieces": [len(p) for p in pieces],
                }
            )

    return v.mapInPandas(encode, schema=out_schema).withColumnRenamed("id", id_col)


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Deterministic feature-hashing document embeddings (the "hashing
    trick", Weinberger et al., ICML 2009): every token adds ±1 (sign and
    bucket both from md5 of the token) into a ``dim``-wide vector, which
    is then L2-normalized — a no-model, no-vocabulary dense embedding
    whose cosine approximates token-multiset similarity. The cheap
    text→vector on-ramp to the ENTIRE similarity stack (brute force /
    LSH / IVF / PQ / semantic dedup all consume its output) when no
    neural embedder is in the pipeline.

    Entirely JVM expressions — explode → two map-side-combinable
    keyed aggregations → one higher-order-function densify/normalize
    pass; no UDF anywhere, so it runs at whole-stage-codegen speed.
    Engine-portable by construction (md5 bucket + sign — any engine
    reproduces the vectors bit-for-bit; the DuckDB oracle does).
    Documents with no tokens produce no row (no direction to point).
    Returns (id_col, embedding array<double>, unit-norm)."""
    # the SHARED tokenizer (functions/textfns.tokens_col) — identical
    # semantics to split+filter, and single-sourced so these embeddings
    # can never silently diverge from the token statistics and dedup
    # shingles computed over the same corpus
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    )
    h = F.md5(F.col("tok"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    sums = (
        toks.select("id", bucket.alias("b"), sign.alias("sc"))
        .groupBy("id", "b")
        .agg(F.sum("sc").alias("s"))
    )
    m = sums.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "s"))).alias("m")
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i.cast("long")], F.lit(0)).cast("double"),
    )
    with_norm = m.select(F.col("id").alias(id_col), raw.alias("raw")).withColumn(
        "n", F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
    )
    emb = F.transform(
        "raw", lambda x: F.when(F.col("n") > 0, x / F.col("n")).otherwise(F.lit(0.0))
    )
    return with_norm.select(id_col, emb.alias("embedding"))


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
    lowercase: bool = False,
    strip_accents: bool = False,
    collapse_whitespace: bool = False,
) -> DataFrame:
    """Unicode normalization — the canonical pre-dedup step: visually
    identical strings with different byte sequences (composed vs
    decomposed accents, compatibility forms like ﬁ-ligatures or
    full-width digits) hash differently and silently defeat EXACT dedup
    and shingle fingerprints; normalizing first makes byte equality mean
    text equality. ``form`` ∈ NFC/NFKC/NFD/NFKD (NFC for storage, NFKC
    when compatibility folding is wanted); optional lowercasing,
    accent stripping (NFD → drop combining marks → recompose), and
    whitespace collapsing.

    Unicode tables live in python's ``unicodedata`` (Spark SQL has no
    normalization expression), so this is the legitimate Pandas-UDF
    case: one Arrow-batched map pass, no shuffle — at 100 TB it runs at
    scan bandwidth alongside the other row-local gates. Returns
    (id_col, text_col) with the normalized text."""
    from pyspark.sql import types as T

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC|NFKC|NFD|NFKD, got {form!r}")

    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    out_schema = T.StructType(
        [
            T.StructField(id_col, src.schema["__id"].dataType),
            T.StructField(text_col, T.StringType()),
        ]
    )

    def norm(batches):
        import re as _re
        import unicodedata

        import pandas as pd

        def one(x):
            if x is None:
                return None
            t = unicodedata.normalize(form, x)
            if strip_accents:
                t = unicodedata.normalize(
                    "NFC",
                    "".join(
                        c
                        for c in unicodedata.normalize("NFD", t)
                        if not unicodedata.combining(c)
                    ),
                )
            if lowercase:
                t = t.lower()
            if collapse_whitespace:
                t = _re.sub(r"\s+", " ", t).strip()
            return t

        for pdf in batches:
            yield pd.DataFrame({id_col: pdf["__id"], text_col: pdf["__t"].apply(one)})

    return src.mapInPandas(norm, schema=out_schema)


_SCRIPT_CLASSES = {
    # literal-char codepoint ranges: engine-neutral (Java regex and RE2
    # both accept [literal-literal] classes, unlike \\uXXXX vs \\x{XXXX})
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "cjk": "一-鿿぀-ヿ가-힯",
    "digit": "0-9",
}


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Unicode SCRIPT composition — the multilingual triage
    signal language-ID models sit on top of: the fraction of non-space
    characters in Latin / Cyrillic / Greek / Arabic / CJK (incl. kana +
    hangul) / digit classes, plus the argmax ``dominant_script`` (ties →
    lexicographic; ``none`` when a doc has no non-space chars). Routing
    by script is the cheap first cut at 100 TB — a CJK doc should never
    enter a Latin-only dedup/quality path, and mixed-script docs are a
    spam signal.

    Pure JVM: one ``regexp_replace``+``length`` per class, map-only, no
    UDF — the counts are "chars remaining after deleting non-class",
    expressed with literal-character codepoint ranges so the same
    pattern means the same thing in any regex engine (the DuckDB oracle
    runs it verbatim)."""
    nonspace = F.regexp_replace(F.col(text_col), r"\s", "")
    total = F.length(nonspace)
    cols = [F.col(id_col), total.alias("n_chars")]
    ratio_cols = []
    for name, cls in _SCRIPT_CLASSES.items():
        n = F.length(F.regexp_replace(nonspace, f"[^{cls}]", ""))
        r = F.when(total > 0, F.round(n / total, 6)).otherwise(F.lit(0.0))
        cols.append(r.alias(f"{name}_ratio"))
        ratio_cols.append((name, f"{name}_ratio"))
    out = df.select(*cols)
    dom = F.lit("none")
    best = F.lit(0.0)
    for name, rc in sorted(ratio_cols):
        better = F.col(rc) > best
        dom = F.when(better, F.lit(name)).otherwise(dom)
        best = F.when(better, F.col(rc)).otherwise(best)
    return out.withColumn("dominant_script", F.when(F.col("n_chars") > 0, dom).otherwise(F.lit("none")))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: bool = False,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher quality-filter signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A1) — the standard
    web-corpus repetition-free heuristics a pretraining intake applies
    before any model-based scoring. Emits every rule's measured value
    plus the combined ``keep`` verdict, so the filter itself is a
    trivial ``WHERE keep = 1`` and the flags double as corpus
    diagnostics:

    * ``n_words`` — whitespace tokens (must be in [min_words, max_words])
    * ``mean_word_len_micro`` — 1e6 × mean token length, exact integer
      division (must be in [3, 10] words → [3e6, 10e6])
    * ``symbol_word_ratio_micro`` — 1e6 × (# ``#`` chars + # ``...``
      occurrences) / words (≤ 0.1)
    * ``bullet_line_ratio_micro`` — 1e6 × lines starting with a bullet
      (``•``/``- ``/``* ``) / lines (≤ 0.9)
    * ``ellipsis_line_ratio_micro`` — 1e6 × lines ending in ``...`` or
      ``…`` / lines (≤ 0.3)
    * ``alpha_word_ratio_micro`` — 1e6 × words containing ≥1 ASCII
      letter / words (≥ 0.8)
    * ``n_stop_hits`` — DISTINCT ``stopwords`` present (≥ 2)

    All ratios are exact integer micros (``1e6·a div b``), so the DuckDB
    oracle reproduces them bit-for-bit — no float rounding surface.
    Pure JVM expressions, map-only, one projection; at 100 TB this is a
    whole-stage-codegen scan with zero shuffles, and the ``keep``
    predicate pushes into the same stage as downstream filters.

    ``passthrough=True`` keeps EVERY input column (no ``doc_id``
    rename) and appends the signal columns — the no-join composition
    shape: :func:`~..pipelines.corpus.curate_corpus`'s ``quality=
    "gopher"`` gate annotates in the scan itself instead of shuffling a
    (doc_id, keep) frame back onto the corpus. Input columns must not
    collide with the signal names (``n_words`` … ``keep``) NOR with the
    reserved staging names ``__gr_words``/``__gr_words_lc``/``__gr_lines``
    (the token/line arrays are staged as real columns behind a projection
    boundary — an input already carrying one of those names fails with a
    duplicate/ambiguous-column AnalysisException; the same applies to
    ``__toks`` in curate_corpus's passthrough frames).

    Reference parity note: the reference engine has no quality gating
    (its compute surface is generic pandas exec, reference
    compute.py:40-55); this extends the intake the way every published
    LLM-data pipeline (Gopher, RefinedWeb, FineWeb) does."""
    text = F.col(text_col)
    # token/line arrays are materialized behind their own projection
    # boundary first (each referenced >1 time below, so CollapseProject
    # keeps it): through r11 every reference to `words`/`words_lc`/`lines`
    # re-ran its split() per row — ~6 tokenizer evaluations per document,
    # and the stopword filter's lambda re-ran the lowercase split once PER
    # STOPWORD (the minhash_signatures per-element discipline). One split
    # each now; expressions below are unchanged, so the oracle hash is too.
    words = F.col("__gr_words")
    words_lc = F.col("__gr_words_lc")
    lines = F.col("__gr_lines")
    n_words = F.size(words).cast("long")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("long")
    word_chars = F.coalesce(
        F.aggregate(words, F.lit(0).cast("long"), lambda a, x: a + F.length(x)),
        F.lit(0).cast("long"),
    )
    n_hash = (F.length(text) - F.length(F.replace(text, F.lit("#")))).cast("long")
    n_ellipsis = (
        (F.length(text) - F.length(F.replace(text, F.lit("...")))) / 3
    ).cast("long")
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]"))).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda x: F.ltrim(x).startswith("•")
            | F.ltrim(x).startswith("- ")
            | F.ltrim(x).startswith("* "),
        )
    ).cast("long")
    n_ell_lines = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).endswith("...") | F.rtrim(x).endswith("…"),
        )
    ).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(words_lc, s))
    ).cast("long")
    micro = F.lit(1_000_000).cast("long")
    nz_words = F.greatest(n_words, F.lit(1).cast("long"))
    lead = list(df.columns) if passthrough else [F.col(id_col).alias("doc_id")]
    staged = df.select(
        "*",
        tokens_col(text, lowercase=False).alias("__gr_words"),
        tokens_col(text).alias("__gr_words_lc"),
        F.split(text, r"\n").alias("__gr_lines"),
    )
    out = staged.select(
        *lead,
        n_words.alias("n_words"),
        word_chars.alias("__wc"),
        nz_words.alias("__nw"),
        ((micro * (n_hash + n_ellipsis))).alias("__sym"),
        n_bullet.alias("__nb"),
        n_ell_lines.alias("__ne"),
        n_lines.alias("__nl"),
        n_alpha.alias("__na"),
        n_stop.alias("n_stop_hits"),
    )
    mean_wl = F.expr("(1000000 * __wc) div __nw")
    sym = F.expr("__sym div __nw")
    bullet = F.expr("(1000000 * __nb) div __nl")
    ell = F.expr("(1000000 * __ne) div __nl")
    alpha = F.expr("(1000000 * __na) div __nw")
    keep = (
        F.col("n_words").between(min_words, max_words)
        & mean_wl.between(int(min_mean_word_len * 1e6), int(max_mean_word_len * 1e6))
        & (sym <= int(max_symbol_word_ratio * 1e6))
        & (bullet <= int(max_bullet_line_ratio * 1e6))
        & (ell <= int(max_ellipsis_line_ratio * 1e6))
        & (alpha >= int(min_alpha_word_ratio * 1e6))
        & (F.col("n_stop_hits") >= min_stop_hits)
    )
    return out.select(
        *(list(df.columns) if passthrough else ["doc_id"]),
        "n_words",
        mean_wl.alias("mean_word_len_micro"),
        sym.alias("symbol_word_ratio_micro"),
        bullet.alias("bullet_line_ratio_micro"),
        ell.alias("ellipsis_line_ratio_micro"),
        alpha.alias("alpha_word_ratio_micro"),
        "n_stop_hits",
        keep.cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + registered-domain extraction (round-12, r11 verdict
# task 5): the per-domain primitives real crawl pipelines key on — domain
# caps (cap_per_group), URL-dedup, per-domain mixture weights — need a
# canonical URL and an effective domain derived from the raw `url` column.
# Same single-source discipline as html_extract: one set of portable
# Java∩RE2 patterns drives both the Spark expressions and the DuckDB oracle.
# ---------------------------------------------------------------------------

_URL_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_URL_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_URL_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_URL_USERINFO_RE = r"^[^@]*@"
_URL_PORT_STRIP_RE = r":[0-9]*$"
_URL_PORT_RE = r":([0-9]+)$"
_URL_FRAG_STRIP_RE = r"#.*$"
_URL_FRAG_RE = r"#(.*)$"
_URL_QUERY_RE = r"\?(.*)$"
# tracking params every public pipeline strips (Google/Facebook/Microsoft
# click ids + the urchin family); anchored — matched against each k=v pair
_URL_TRACKING_RE = r"^(utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid)="

# A bundled snapshot of COMMON two-level public suffixes (public knowledge
# — the publicsuffix.org list's most frequent ccTLD second levels). The
# heuristic: registered domain = last two host labels, or last THREE when
# the last two form one of these suffixes. Deliberately a snapshot, not
# the full 9k-rule list: the engine's portable-expression discipline
# (wildcard/exception PSL rules need procedural logic), covering the
# overwhelming majority of crawl bytes; swap in a fuller alternation for
# exactness on the tail.
_PUBLIC_SUFFIX_2 = (
    "ac.uk", "co.uk", "gov.uk", "me.uk", "net.uk", "org.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "ac.jp", "co.jp", "go.jp", "ne.jp", "or.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.kr", "or.kr", "co.za", "co.nz", "net.nz", "org.nz",
    "com.my", "com.ph", "com.vn", "com.eg", "com.sa",
    "co.id", "co.th", "in.th", "com.pl", "com.pt", "com.gr",
    "com.co", "com.pe", "com.ve", "com.ua", "com.ru",
)
_URL_SUFFIX3_RE = (
    r"([^.]+\.(?:" + "|".join(s.replace(".", r"\.") for s in _PUBLIC_SUFFIX_2) + r"))$"
)
_URL_SUFFIX2_RE = r"([^.]+\.[^.]+)$"


def url_parts_exprs(col: Column) -> dict[str, Column]:
    """URL decomposition + canonicalization as named Spark expressions —
    all JVM regexp work, whole-stage-codegen, no UDF. Keys:
    scheme/host/port/path/query/fragment (strings, '' when absent),
    canonical_url (NULL for a scheme-less/invalid URL), registered_domain.

    Canonical form: scheme and host lowercased, userinfo dropped, default
    ports (http:80, https:443) dropped, empty path → '/', fragment
    dropped, tracking params (utm_*/gclid/fbclid/msclkid/mc_*) removed
    from the query with remaining param order preserved."""
    u = col
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME_RE, 1))
    auth = F.regexp_extract(u, _URL_AUTH_RE, 1)
    hostport = F.regexp_replace(auth, _URL_USERINFO_RE, "")
    host = F.lower(F.regexp_replace(hostport, _URL_PORT_STRIP_RE, ""))
    port = F.regexp_extract(hostport, _URL_PORT_RE, 1)
    path = F.regexp_extract(u, _URL_PATH_RE, 1)
    fragment = F.regexp_extract(u, _URL_FRAG_RE, 1)
    query = F.regexp_extract(
        F.regexp_replace(u, _URL_FRAG_STRIP_RE, ""), _URL_QUERY_RE, 1
    )
    clean_query = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~F.lower(p).rlike(_URL_TRACKING_RE),
        ),
        "&",
    )
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    canonical = F.when(
        u.rlike(_URL_SCHEME_RE),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(clean_query != "", F.concat(F.lit("?"), clean_query)).otherwise(
                F.lit("")
            ),
        ),
    )
    registered = F.coalesce(
        F.nullif(F.regexp_extract(host, _URL_SUFFIX3_RE, 1), F.lit("")),
        F.regexp_extract(host, _URL_SUFFIX2_RE, 1),
    )
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": clean_query,
        "fragment": fragment,
        "canonical_url": canonical,
        "registered_domain": registered,
    }


def url_parts(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    passthrough: bool = False,
) -> DataFrame:
    """Decompose and canonicalize a raw ``url`` column (see
    :func:`url_parts_exprs` for the exact rules). Emits ``(doc_id,
    scheme, host, port, path, query, fragment, canonical_url,
    registered_domain)``; ``passthrough=True`` keeps every input column.

    The crawled-corpus compositions this feeds: ``cap_per_group(df,
    "registered_domain", K)`` for the C4/RefinedWeb max-K-docs-per-domain
    rule on REAL crawl columns, ``dropDuplicates(["canonical_url"])`` for
    URL-dedup that ignores tracking-param and fragment noise, and
    ``weighted_mix`` over ``registered_domain`` for per-domain mixture
    weights. Registered-domain notes: IP-literal hosts degrade to their
    last two octets and single-label hosts (``localhost``) to '' — both
    documented heuristic edges of the expression-only PSL snapshot.

    Plan at 100 TB: map-only — a fixed chain of JVM regexp expressions in
    one whole-stage-codegen'd projection; no UDF, no shuffle, no join.
    The DuckDB oracle (q_url_parts) replays the identical patterns."""
    parts = url_parts_exprs(F.col(url_col))
    if passthrough:
        clash = sorted(set(df.columns) & set(parts))
        if clash:
            raise ValueError(
                f"url_parts(passthrough=True): input already has column(s) "
                f"{clash} that the output would duplicate — rename or drop "
                "them first (duplicate names make every downstream "
                "reference ambiguous)"
            )
    head = list(df.columns) if passthrough else [F.col(id_col).alias("doc_id")]
    return df.select(*head, *(v.alias(k) for k, v in parts.items()))


def url_parts_sql(rel: str) -> str:
    """The SAME decomposition as a DuckDB query over ``rel`` — any
    relation SQL producing (doc_id, url). Patterns are passed
    byte-identically to the Spark side; single-match regexp_replace
    suffices everywhere (every replaced pattern is anchored)."""
    return f"""
    WITH d AS ({rel}),
    a AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '{_URL_SCHEME_RE}', 1)) AS scheme,
        regexp_replace(regexp_extract(url, '{_URL_AUTH_RE}', 1),
                       '{_URL_USERINFO_RE}', '') AS hostport,
        regexp_extract(url, '{_URL_PATH_RE}', 1) AS path,
        regexp_extract(regexp_replace(url, '{_URL_FRAG_STRIP_RE}', ''),
                       '{_URL_QUERY_RE}', 1) AS query,
        regexp_extract(url, '{_URL_FRAG_RE}', 1) AS fragment,
        regexp_matches(url, '{_URL_SCHEME_RE}') AS ok
      FROM d
    ),
    b AS (
      SELECT *,
        lower(regexp_replace(hostport, '{_URL_PORT_STRIP_RE}', '')) AS host,
        regexp_extract(hostport, '{_URL_PORT_RE}', 1) AS port,
        coalesce(array_to_string(list_filter(string_split(query, '&'),
          p -> p <> '' AND NOT regexp_matches(lower(p), '{_URL_TRACKING_RE}')),
          '&'), '') AS clean_query
      FROM a
    )
    SELECT doc_id, scheme, host, port, path, clean_query AS query, fragment,
      CASE WHEN ok THEN scheme || '://' || host ||
        CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                 OR (scheme = 'https' AND port = '443'))
             THEN ':' || port ELSE '' END ||
        CASE WHEN path = '' THEN '/' ELSE path END ||
        CASE WHEN clean_query <> '' THEN '?' || clean_query ELSE '' END
      ELSE NULL END AS canonical_url,
      coalesce(nullif(regexp_extract(host, '{_URL_SUFFIX3_RE}', 1), ''),
               regexp_extract(host, '{_URL_SUFFIX2_RE}', 1)) AS registered_domain
    FROM b
    """


# relative-URL resolution (RFC 3986 §5, the practically-complete subset
# expressible in portable Java∩RE2 WITHOUT group-references in
# replacements — Java says $1 where RE2 says \1, so replacements stay
# literal): base origin, base directory, and dot-segment removal as
# bounded fixed-point regex passes. Scope documented at resolve_url.
_URL_ORIGIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
_URL_QF_STRIP_RE = r"[?#].*$"
_URL_QF_RE = r"[?#].*$"
_URL_LASTSEG_RE = r"/[^/]*$"
# '/./' collapse (2 passes: global non-overlapping replacement leaves
# every second '.' of '/././' for the next pass)
_DOT_SLASH_RE = r"/\./"
# '/<segment>/../' collapse where <segment> is not '.' or '..' (RE2 has
# no lookaround; the alternation spells out "not . and not ..")
_PARENT_RE = r"/(?:[^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)/\.\./"
_DOT_PASSES = 2
_PARENT_PASSES = 4


def _normalize_dots(u: Column) -> Column:
    """Dot-segment removal on the pre-query part of ``u`` (query/fragment
    split off first so '/../' INSIDE a query string is never touched),
    re-concatenated. Bounded: 2 './' passes + 4 '../' levels."""
    pre = F.regexp_replace(u, _URL_QF_STRIP_RE, "")
    rest = F.regexp_extract(u, _URL_QF_RE, 0)
    for _ in range(_DOT_PASSES):
        pre = F.regexp_replace(pre, _DOT_SLASH_RE, "/")
    for _ in range(_PARENT_PASSES):
        pre = F.regexp_replace(pre, _PARENT_RE, "/")
    return F.concat(pre, rest)


def resolve_url_expr(base: Column, href: Column) -> Column:
    """Resolve ``href`` against ``base`` (RFC 3986 §5 merge rules):
    absolute hrefs pass through; ``//host/...`` takes the base scheme;
    ``/path`` joins the base origin; ``?q`` and ``#f`` replace the
    base's query/fragment; everything else joins the base DIRECTORY and
    dot-segments collapse (2 './' + 4 '../' levels — bounded fixed-point
    passes, portable Java∩RE2 with literal-only replacements). An empty
    href is the base minus its fragment. Documented out of scope:
    '/../' escaping above the root is left literal (pathological hrefs),
    deeper than 4 '../' levels likewise. NULL when base is not an
    absolute URL."""
    origin = F.regexp_extract(base, _URL_ORIGIN_RE, 0)
    noqf = F.regexp_replace(base, _URL_QF_STRIP_RE, "")
    nofrag = F.regexp_replace(base, _URL_FRAG_STRIP_RE, "")
    scheme = F.lower(F.regexp_extract(base, _URL_SCHEME_RE, 1))
    # base directory: path up to (and incl.) the last '/', '/' when the
    # base has no path at all (origin-only base)
    basedir = F.when(noqf == origin, F.concat(origin, F.lit("/"))).otherwise(
        F.regexp_replace(noqf, _URL_LASTSEG_RE, "/")
    )
    resolved = (
        F.when(href == "", nofrag)
        .when(href.rlike(_URL_SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), _normalize_dots(F.concat(origin, href)))
        .when(href.startswith("#"), F.concat(nofrag, href))
        .when(href.startswith("?"), F.concat(noqf, href))
        .otherwise(_normalize_dots(F.concat(basedir, href)))
    )
    return F.when(base.rlike(_URL_SCHEME_RE), resolved)


def resolve_url_sql(base: str, href: str) -> str:
    """The SAME resolution as a DuckDB scalar expression over the SQL
    expressions ``base``/``href`` — byte-identical patterns, literal
    replacements only (the one regex dialect seam — $1 vs \\1 — is
    avoided by construction)."""

    def norm(u: str) -> str:
        pre = f"regexp_replace({u}, '{_URL_QF_STRIP_RE}', '')"
        rest = f"regexp_extract({u}, '{_URL_QF_RE}', 0)"
        for _ in range(_DOT_PASSES):
            pre = f"regexp_replace({pre}, '{_DOT_SLASH_RE}', '/', 'g')"
        for _ in range(_PARENT_PASSES):
            pre = f"regexp_replace({pre}, '{_PARENT_RE}', '/', 'g')"
        return f"({pre} || {rest})"

    origin = f"regexp_extract({base}, '{_URL_ORIGIN_RE}', 0)"
    noqf = f"regexp_replace({base}, '{_URL_QF_STRIP_RE}', '')"
    nofrag = f"regexp_replace({base}, '{_URL_FRAG_STRIP_RE}', '')"
    scheme = f"lower(regexp_extract({base}, '{_URL_SCHEME_RE}', 1))"
    basedir = (
        f"CASE WHEN {noqf} = {origin} THEN {origin} || '/' "
        f"ELSE regexp_replace({noqf}, '{_URL_LASTSEG_RE}', '/') END"
    )
    return f"""
    CASE WHEN NOT regexp_matches({base}, '{_URL_SCHEME_RE}') THEN NULL
         WHEN {href} = '' THEN {nofrag}
         WHEN regexp_matches({href}, '{_URL_SCHEME_RE}') THEN {href}
         WHEN {href} LIKE '//%' THEN {scheme} || ':' || {href}
         WHEN {href} LIKE '/%' THEN {norm(f"({origin} || {href})")}
         WHEN {href} LIKE '#%' THEN {nofrag} || {href}
         WHEN {href} LIKE '?%' THEN {noqf} || {href}
         ELSE {norm(f"({basedir} || {href})")}
    END"""


# href="..." / href='...' in anchor tags — two patterns because the
# portable Java∩RE2 subset has no backreference to match the opening
# quote; attribute scan is bounded to the tag ([^>]*)
_HREF_DQ_RE = r"""(?i)<a\b[^>]*\bhref\s*=\s*"([^"]*)\""""
_HREF_SQ_RE = r"(?i)<a\b[^>]*\bhref\s*=\s*'([^']*)'"


def html_links(
    df: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
    base_url_col: str | None = None,
) -> DataFrame:
    """Outlink extraction (the crawl-graph on-ramp: every public link
    analysis — PageRank-style domain ranking, link-spam detection, seed
    discovery — starts by pulling anchors out of the fetched HTML):
    every ``href`` of every ``<a>`` tag, double- or single-quoted, in
    document order (double-quoted first — deterministic, documented).
    Emits one row per link: ``(doc_id, link, link_host,
    link_domain)`` where host/domain come from
    :func:`url_parts_exprs` — empty strings for RELATIVE links (no
    scheme), which is how callers split internal from external links.
    With ``base_url_col`` (the page's own URL — the WARC
    ``target_uri``), every href is first RESOLVED against it
    (:func:`resolve_url_expr` — RFC 3986 merge + dot-segment removal),
    the output gains a ``resolved_url`` column, and host/domain derive
    from the RESOLVED link, so relative links land on the page's own
    domain instead of ''.

    Composes with the existing graph algebra: ``html_links`` → filter
    absolute → group (src_domain, link_domain) edges →
    :func:`~.graph.pagerank` / triangle counting on the DOMAIN graph.

    Plan at 100 TB: map-only — two JVM ``regexp_extract_all`` calls
    concatenated, one explode, and the url_parts regexp chain on the
    result; no UDF, no shuffle, no join. The q_outlink_graph oracle
    replays both patterns and the domain derivation."""
    links = F.concat(
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_DQ_RE), F.lit(1)),
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_SQ_RE), F.lit(1)),
    )
    if base_url_col is None:
        p = url_parts_exprs(F.col("link"))
        return (
            df.select(F.col(id_col).alias("doc_id"), F.explode(links).alias("link"))
            .select(
                "doc_id",
                "link",
                p["host"].alias("link_host"),
                p["registered_domain"].alias("link_domain"),
            )
        )
    resolved = resolve_url_expr(F.col("__base"), F.col("link"))
    p = url_parts_exprs(F.col("resolved_url"))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(base_url_col).alias("__base"),
            F.explode(links).alias("link"),
        )
        .select("doc_id", "link", resolved.alias("resolved_url"))
        .select(
            "doc_id",
            "link",
            "resolved_url",
            p["host"].alias("link_host"),
            p["registered_domain"].alias("link_domain"),
        )
    )


def url_host_sql(col: str) -> str:
    """DuckDB SQL fragment: the lowercased host of the URL expression
    ``col`` — the INLINE twin of :func:`url_parts_exprs`'s host chain
    (auth → strip userinfo → strip port → lower), for oracles that need
    host/domain without the full url_parts_sql CTE. Single source: edits
    to the regexes above flow into every oracle through here."""
    return (
        f"lower(regexp_replace(regexp_replace(regexp_extract({col}, "
        f"'{_URL_AUTH_RE}', 1), '{_URL_USERINFO_RE}', ''), "
        f"'{_URL_PORT_STRIP_RE}', ''))"
    )


def url_domain_sql(host_sql: str) -> str:
    """DuckDB SQL fragment: registered domain of a host expression (the
    public-suffix-snapshot rule of :func:`url_parts_exprs`)."""
    return (
        f"coalesce(nullif(regexp_extract({host_sql}, '{_URL_SUFFIX3_RE}', 1), ''), "
        f"regexp_extract({host_sql}, '{_URL_SUFFIX2_RE}', 1))"
    )


def domain_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """URL blocklist filtering (the RefinedWeb/UT1-style pass, public):
    drop every document whose URL resolves to a blocked domain. An entry
    blocks BOTH its exact host and — when the entry is a registered
    domain — every subdomain of it, because matching is two EQUI-joins
    against the derived columns: ``host`` (ads.tracker.example.com
    matches an ``ads.tracker.example.com`` entry) and
    ``registered_domain`` (any ``*.example.com`` matches an
    ``example.com`` entry). Blocklist entries are lowercased/trimmed;
    the caller supplies the list (UT1, an in-house list — content policy
    is data, not code).

    Plan at 100 TB: the URL decomposition is :func:`url_parts_exprs`'s
    map-only regexp chain; the blocklist (thousands-to-millions of rows,
    kilobytes-to-megabytes) BROADCASTS into two hash anti-joins — no
    corpus shuffle, no non-equi join, no UDF. The q_domain_filter oracle
    replays host/registered-domain derivation + both anti-joins."""
    bl = blocklist.select(
        F.lower(F.trim(F.col(domain_col))).alias("__bl_domain")
    ).distinct()
    p = url_parts_exprs(F.col(url_col))
    tagged = df.withColumn("__host", p["host"]).withColumn(
        "__rd", p["registered_domain"]
    )
    return (
        tagged.join(
            F.broadcast(bl.withColumnRenamed("__bl_domain", "__rd")),
            "__rd",
            "left_anti",
        )
        .join(
            F.broadcast(bl.withColumnRenamed("__bl_domain", "__host")),
            "__host",
            "left_anti",
        )
        .drop("__host", "__rd")
    )


# ---------------------------------------------------------------------------
# HTML → text extraction (the Common-Crawl on-ramp: every public CC pipeline
# — C4, CCNet, RefinedWeb — starts with an extraction pass before cleaning)
# ---------------------------------------------------------------------------
#
# The whole extractor is ONE ordered regex/replace program, shared verbatim
# between the Spark expression builder (html_extract_expr) and the DuckDB
# oracle generator (html_extract_sql) — single source, zero drift. Every
# pattern is written in the Java-regex ∩ RE2 portable subset (the
# script_profile/pii_redact discipline): inline (?i)/(?s) flags, non-greedy
# quantifiers, \b — but NO backreferences and NO lookaround (RE2 lacks
# both), which is why the content-stripping elements are one pattern per
# tag name instead of <(script|style)>…</\1>.

# 1. elements whose CONTENT is never prose — drop tag AND body
_HTML_CONTENT_STRIP: tuple[tuple[str, str], ...] = tuple(
    (rf"(?is)<{t}[^>]*>.*?</{t}\s*>", " ") for t in ("script", "style", "noscript", "template")
)
# 2. comments (incl. IE conditionals), doctype, XML/processing prologs
# 3. block-level boundaries become LINE BREAKS before tags vanish — this
#    is what turns <p>/<li>/<h1> structure into the line segmentation the
#    C4 line rules consume
# 4. every remaining tag is inline — drop the tag, keep its text
_HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = _HTML_CONTENT_STRIP + (
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<!doctype[^>]*>", " "),
    (r"(?s)<\?.*?\?>", " "),
    (
        r"(?i)</?(?:p|div|br|hr|li|ul|ol|dl|dt|dd|h1|h2|h3|h4|h5|h6|tr|td|th"
        r"|table|thead|tbody|tfoot|caption|blockquote|pre|section|article"
        r"|header|footer|nav|aside|main|form|fieldset|figure|figcaption"
        r"|address|center|title|option|select)\b[^>]*>",
        "\n",
    ),
    (r"<[^>]*>", " "),
)

# HTML entity decode: fixed literal table (portable string replace in both
# engines — no regex callback exists in either). &amp; decodes LAST so
# "Tom &amp; Jerry" round-trips; the named/numeric leftovers regex then
# drops whatever the table doesn't know (the CCNet behavior: unknown
# entities are noise, not prose).
_HTML_ENTITY_TABLE: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&#34;", '"'),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&ndash;", "–"),
    ("&mdash;", "—"),
    ("&hellip;", "…"),
    ("&#8216;", "‘"),
    ("&#8217;", "’"),
    ("&#8220;", "“"),
    ("&#8221;", "”"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&eacute;", "é"),
    ("&egrave;", "è"),
    ("&agrave;", "à"),
    ("&ccedil;", "ç"),
    ("&auml;", "ä"),
    ("&ouml;", "ö"),
    ("&uuml;", "ü"),
    ("&szlig;", "ß"),
    ("&ntilde;", "ñ"),
)
# &amp; decodes via a SENTINEL bracketing the whole pass, not a table row:
# '&amp;' is hidden as \x01 BEFORE the other entities decode and restored
# to '&' AFTER the unknown-entity drop, so an ESCAPED entity survives as
# its literal text ('Use &amp;lt; here' → 'Use &lt; here', the browser
# rendering) instead of decoding to '&lt;' and then being deleted by the
# drop pass (round-12 review: pages ABOUT html/code routinely carry
# escaped entities, and the shared-program oracle could never catch the
# loss because it replayed the same wrong order).
_HTML_AMP = "&amp;"
_HTML_AMP_SENTINEL = "\x01"
_HTML_DROP_ENTITY = r"&[a-zA-Z][a-zA-Z0-9]{1,31};|&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};"

# whitespace → line segmentation: horizontal runs collapse to one space,
# spaces hugging a break vanish, break runs collapse to ONE \n (each run
# of block boundaries is one segment edge), outer breaks trim away
_HTML_WS_STEPS: tuple[tuple[str, str], ...] = (
    (r"[\t\r\f ]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^\n+|\n+$", ""),
)


def html_extract_expr(col: Column) -> Column:
    """The extraction program as one Spark expression chain — pure JVM
    regexp_replace/replace, whole-stage-codegen'd, no UDF. Shared by
    :func:`html_extract` and the curate_corpus ``extract="html"`` gate."""
    x = col
    for pat, rep in _HTML_STRIP_STEPS:
        x = F.regexp_replace(x, pat, rep)
    x = F.replace(x, F.lit(_HTML_AMP), F.lit(_HTML_AMP_SENTINEL))
    for lit, rep in _HTML_ENTITY_TABLE:
        x = F.replace(x, F.lit(lit), F.lit(rep))
    x = F.regexp_replace(x, _HTML_DROP_ENTITY, " ")
    x = F.replace(x, F.lit(_HTML_AMP_SENTINEL), F.lit("&"))
    for pat, rep in _HTML_WS_STEPS:
        x = F.regexp_replace(x, pat, rep)
    return F.trim(x)


def _sql_str(s: str) -> str:
    """A DuckDB string literal for ``s``; newlines go through chr(10) —
    RE2's rewrite grammar has no \\n escape, and an embedded raw newline
    inside a SQL literal is valid but unreadable."""
    parts = s.split("\n")
    lits = ["'" + p.replace("'", "''") + "'" for p in parts]
    out = lits[0]
    for nxt in lits[1:]:
        out += " || chr(10) || " + nxt
    # drop empty-string concat ends ('' || x → x) for readability
    return out.replace("'' || ", "").replace(" || ''", "")


def html_extract_sql(expr: str) -> str:
    """The SAME extraction program as a DuckDB scalar expression over
    ``expr`` — the oracle twin. DuckDB's regexp_replace is RE2 and
    first-match by default, hence the explicit 'g' flag; patterns are
    passed byte-identically to the Spark side."""
    x = expr
    for pat, rep in _HTML_STRIP_STEPS:
        x = f"regexp_replace({x}, {_sql_str(pat)}, {_sql_str(rep)}, 'g')"
    x = f"replace({x}, {_sql_str(_HTML_AMP)}, chr(1))"
    for lit, rep in _HTML_ENTITY_TABLE:
        x = f"replace({x}, {_sql_str(lit)}, {_sql_str(rep)})"
    x = f"regexp_replace({x}, {_sql_str(_HTML_DROP_ENTITY)}, ' ', 'g')"
    x = f"replace({x}, chr(1), '&')"
    for pat, rep in _HTML_WS_STEPS:
        x = f"regexp_replace({x}, {_sql_str(pat)}, {_sql_str(rep)}, 'g')"
    return f"trim({x})"


def html_extract(
    df: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
    passthrough: bool = False,
    out_col: str = "extracted_text",
) -> DataFrame:
    """HTML → text extraction (the missing Common-Crawl on-ramp, r11
    verdict task 1): strip script/style/noscript/template with their
    bodies, comments, doctype and processing instructions; turn
    block-level element boundaries into line breaks; drop every remaining
    tag; decode the common HTML entities (and drop unknown ones); then
    normalize whitespace into trimmed, non-empty, ``\\n``-separated lines
    — exactly the prose-lines shape :func:`c4_clean`'s line rules and the
    Gopher battery expect. Feed it a WARC ``response`` payload
    (:func:`~..sources.files.warc_text_documents` ``extract="html"``) and
    the existing C4/Gopher/dedup chain runs on real crawl HTML.

    Emits ``(doc_id, extracted_text, n_lines, n_chars)``; with
    ``passthrough=True`` keeps every input column and appends the three.
    A page with no prose yields the empty string and ``n_lines = 0``.

    Plan at 100 TB: one map-only projection — a fixed chain of JVM
    ``regexp_replace``/``replace`` expressions inside whole-stage codegen;
    no UDF, no shuffle, no join. The regex program is the portable
    Java∩RE2 subset and is REPLAYED VERBATIM by DuckDB via
    :func:`html_extract_sql`, so the q_html_extract oracle hash-checks
    every rule. Deliberate scope (documented, deterministic): no
    charset-sniffing (upstream decodes bytes), no JS/CSS evaluation, no
    readability-style boilerplate scoring — line-level boilerplate is the
    downstream C4/line-dedup stage's job."""
    x = html_extract_expr(F.col(html_col))
    n_lines = F.when(x == "", F.lit(0)).otherwise(
        F.size(F.split(x, r"\n"))
    ).cast("long")
    if passthrough:
        clash = sorted(set(df.columns) & {out_col, "n_lines", "n_chars"})
        if clash:
            raise ValueError(
                f"html_extract(passthrough=True): input already has "
                f"column(s) {clash} that the output would duplicate — "
                "rename or drop them first, or pass a different out_col"
            )
    head = list(df.columns) if passthrough else [F.col(id_col).alias("doc_id")]
    return df.select(
        *head,
        x.alias(out_col),
        n_lines.alias("n_lines"),
        F.length(x).cast("long").alias("n_chars"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    passthrough: bool = False,
) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2, the "Colossal
    Clean Crawled Corpus" heuristics): line-level retention + page-level
    rejection, in one map-only projection.

    Line rules — a line survives iff it ends in terminal punctuation
    (``.``/``!``/``?``/``"``/``'``) AND has ≥ ``min_words_per_line``
    whitespace words AND does not contain ``javascript`` (case-folded).
    ``clean_text`` re-joins the survivors with ``\\n``.

    Page rules — ``keep`` is 0 when the page mentions ``lorem ipsum``
    (case-folded), contains a curly brace (code), or the CLEANED page
    has fewer than ``min_sentences`` sentences (split on ``[.!?]`` with
    non-empty remainder).

    Emits (doc_id, clean_text, n_lines, n_lines_kept, n_sentences,
    has_lorem, has_brace, keep). Pure JVM higher-order-function
    expressions — no UDF, no shuffle; the 100 TB shape is a single
    codegen'd scan. On punctuation-free synthetic corpora every page
    degenerates to keep=0 (tests pin the real behavior on crafted
    fixtures; see tests/test_text_extra.py). ``passthrough=True`` keeps
    every input column (no ``doc_id`` rename) and appends the output
    columns — the no-join shape ``curate_corpus(clean="c4")`` composes
    (input must not already carry ``clean_text`` … ``keep``)."""
    text = F.col(text_col)
    lines = F.split(text, r"\n")
    is_kept = lambda x: (  # noqa: E731 — shared by two exprs below
        F.rtrim(x).rlike('[.!?"\']$')
        & (F.size(F.filter(F.split(x, r"\s+"), lambda t: t != "")) >= min_words_per_line)
        & ~F.lower(x).contains("javascript")
    )
    kept = F.filter(lines, is_kept)
    clean = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.filter(F.split(clean, r"[.!?]"), lambda s: F.trim(s) != "")
    ).cast("long")
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{") | text.contains("}")
    keep = (
        ~has_lorem & ~has_brace & (n_sentences >= min_sentences)
    )
    return df.select(
        *(list(df.columns) if passthrough else [F.col(id_col).alias("doc_id")]),
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sentences.alias("n_sentences"),
        has_lorem.cast("int").alias("has_lorem"),
        has_brace.cast("int").alias("has_brace"),
        keep.cast("int").alias("keep"),
    )


def cross_entropy_score(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
) -> DataFrame:
    """CCNet-style target-LM quality scoring (Wenzek et al. 2020, public):
    score every raw document by its per-token cross-entropy under a
    unigram LM fitted on a CLEAN ``target`` corpus — the "how much does
    this page look like Wikipedia" filter, the head/middle/tail quality
    binning signal of the CCNet pipeline (the reference pipeline trains a
    5-gram KenLM; the unigram form is the same statistic at the model
    order this engine can fit in one aggregation). Complements
    :func:`unigram_logprob` (the corpus's OWN LM — typicality) and
    :func:`~.sampling.dsir_importance_weights` (the target/raw RATIO):
    this is the absolute target-likelihood term. Returns
    ``(doc_id, n_tokens, cross_entropy)`` where cross_entropy =
    −mean ln p̂_target(tok) — LOWER is more target-like. Docs with no
    tokens are absent.

    Out-of-target tokens take the add-``smoothing`` floor mass
    ``s/(T + s·(V+1))`` (V = target vocab size, the +1 the single
    unseen-token bucket), so the statistic is finite everywhere and a
    page of pure gibberish lands at the ceiling −ln(floor).

    Plan at 100 TB: the raw corpus collapses to (doc, tok, k) with
    map-side combine; the target LM is ONE aggregation of the target
    corpus (vocab-sized, token-keyed); the scoring join ships one row
    per (doc, token) and the LM side broadcasts when small, with AQE
    skew-split behind the Zipf head otherwise. No window, no UDF, no
    collect. Determinism: exact integer probabilities, LN rounded to 8
    decimals BEFORE DECIMAL accumulation, final mean rounded to 6 —
    the unigram_logprob discipline, hash-checked by the q_cross_entropy
    oracle."""
    if smoothing <= 0:
        raise ValueError("smoothing must be positive")
    from .dedup import _cache_scoped

    per_doc = _cache_scoped(
        raw.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(F.col(text_col))).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    lm = _cache_scoped(
        target.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = lm.agg(
        F.sum("ct").alias("tt"), F.count(F.lit(1)).alias("vocab")
    )
    s = float(smoothing)
    tt_ok = _nonempty_lm_total("cross_entropy_score")
    denom = tt_ok + s * (F.col("vocab") + 1)
    lp = F.round(
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + s) / denom), 8
    ).cast("decimal(18,12)")
    weighted = F.col("k").cast("decimal(10,0)") * lp
    # plain token-keyed join on purpose: the target vocab is corpus-sized
    # at scale (forcing a broadcast would ship gigabytes); AQE broadcasts
    # it when it IS small and skew-splits the Zipf head otherwise — the
    # unigram_logprob join discipline
    return (
        per_doc.join(lm, "tok", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.round(-F.sum(weighted).cast("double") / F.sum("k"), 6).alias(
                "cross_entropy"
            ),
        )
    )


_BOS = "\x02"  # sentence-start sentinel: the first token's bigram context


def _nonempty_lm_total(fn_name: str) -> Column:
    """The shared empty-target-LM guard of the cross-entropy scorers: a
    tokenless target yields tt = NULL, which would propagate NULL scores
    to EVERY doc silently — a gate built on the score would then
    pass/drop everything according to its null-handling (ADVICE r11).
    raise_error is lazy (fires on first action), so plans stay
    composable but the fault is loud."""
    return F.when(
        F.col("tt").isNull() | (F.col("tt") <= 0),
        F.raise_error(
            F.lit(
                f"{fn_name}: target corpus has no tokens — the fitted LM "
                "is empty; fit on a non-empty clean corpus"
            )
        ).cast("long"),
    ).otherwise(F.col("tt"))


def _bigram_pairs_col(toks: Column) -> Column:
    """(prev, cur) pairs for a token array, BOS-padded so position 1 is
    scored like every other position (prev = the \\x02 sentinel) — pure
    JVM transform/element_at, map-side, 1-based like the DuckDB replay.
    NULL/empty token arrays yield an empty pair array (sequence(1,0)
    DESCENDS in Spark — the remove_repeated_spans guard)."""
    safe = F.coalesce(toks, F.array().cast("array<string>"))
    return F.when(
        F.size(safe) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size(safe)),
            lambda o: F.struct(
                F.when(o == 1, F.lit(_BOS))
                .otherwise(F.element_at(safe, (o - 1).cast("int")))
                .alias("prev"),
                F.element_at(safe, o.cast("int")).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))


def bigram_cross_entropy_score(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
    interpolation: float = 0.7,
) -> DataFrame:
    """Interpolated BIGRAM target-LM cross-entropy (Jelinek–Mercer
    interpolation, public — Jelinek & Mercer 1980; the standard
    fixed-weight backoff): one model order closer to CCNet's 5-gram
    KenLM than :func:`cross_entropy_score`'s unigram, and the order that
    starts catching WORD-SALAD pages — a document made of common words
    in nonsense order scores near-target under any unigram LM but far
    from it under a bigram one. Every position (BOS-padded, so the first
    token scores like the rest) contributes

        −ln( λ·p̂(cur|prev) + (1−λ)·p̂(cur) )

    with both estimates add-``smoothing`` over the target corpus:
    p̂(cur|prev) = (c(prev,cur)+s)/(c(prev,·)+s·(V+1)) — an UNSEEN
    context degrades to the uniform floor and the unigram term carries
    the estimate, which is exactly what the interpolation is for.
    Returns ``(doc_id, n_tokens, bigram_cross_entropy)``; tokenless docs
    absent; LOWER = more target-like.

    Plan at 100 TB: pairs are built MAP-SIDE from the token array (JVM
    transform/element_at — no per-doc window, no lag shuffle); the raw
    corpus collapses to (doc, prev, cur, k) with partial combine; the
    target LM is two aggregations (bigram counts, context totals) plus
    the shared unigram LM; scoring is three token-keyed joins AQE plans
    (broadcast when the LM is small, skew-split on the Zipf head). No
    UDF, no collect, no window. Determinism: the probability mixes in
    double, LN rounds to 8 dp BEFORE decimal accumulation, final mean
    rounds to 6 — the exact q_cross_entropy discipline, hash-replayed by
    the q_bigram_cross_entropy oracle."""
    if smoothing <= 0:
        raise ValueError("smoothing must be positive")
    if not (0.0 <= interpolation <= 1.0):
        raise ValueError(f"interpolation must be in [0, 1] — got {interpolation}")
    from .dedup import _cache_scoped

    lam = float(interpolation)
    s = float(smoothing)

    def pairs_of(df: DataFrame, *extra: str) -> DataFrame:
        # tokens behind their own projection boundary: _bigram_pairs_col's
        # transform lambda calls element_at(toks, ·) per position, and HOF
        # lambda bodies evaluate interpreted — an inline tokenizer there
        # re-runs once per token, O(tokens²) per doc (the
        # minhash_signatures projection-boundary discipline)
        return (
            df.select(*extra, tokens_col(F.col(text_col)).alias("__toks"))
            .select(
                *extra, F.explode(_bigram_pairs_col(F.col("__toks"))).alias("pr")
            )
            .select(
                *extra, F.col("pr.prev").alias("prev"), F.col("pr.cur").alias("cur")
            )
        )

    per_doc = _cache_scoped(
        pairs_of(raw.select(F.col(id_col).alias("doc_id"), text_col), "doc_id")
        .groupBy("doc_id", "prev", "cur")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    tpairs = _cache_scoped(
        pairs_of(target.select(text_col))
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c_uv"))
    )
    ctx = tpairs.groupBy("prev").agg(F.sum("c_uv").alias("c_u"))
    # the unigram LM over the SAME pair frame (cur covers every token
    # exactly once thanks to the BOS pad) — one source, no second scan
    lm = tpairs.groupBy("cur").agg(F.sum("c_uv").alias("c_v"))
    totals = lm.agg(F.sum("c_v").alias("tt"), F.count(F.lit(1)).alias("vocab"))
    tt_ok = _nonempty_lm_total("bigram_cross_entropy_score")
    vfloor = s * (F.col("vocab") + 1)
    p_bi = (F.coalesce(F.col("c_uv"), F.lit(0)) + s) / (
        F.coalesce(F.col("c_u"), F.lit(0)) + vfloor
    )
    p_uni = (F.coalesce(F.col("c_v"), F.lit(0)) + s) / (tt_ok + vfloor)
    lp = F.round(F.log(lam * p_bi + (1.0 - lam) * p_uni), 8).cast("decimal(18,12)")
    weighted = F.col("k").cast("decimal(10,0)") * lp
    return (
        per_doc.join(tpairs, ["prev", "cur"], "left")
        .join(ctx, "prev", "left")
        .join(lm, "cur", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.round(-F.sum(weighted).cast("double") / F.sum("k"), 6).alias(
                "bigram_cross_entropy"
            ),
        )
    )


def ccnet_bins(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    fractions: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    smoothing: float = 1.0,
    exact: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail quality binning (Wenzek et al. 2020, §4.4,
    public): score every document with :func:`cross_entropy_score` under
    the clean-target LM, then split each LANGUAGE's score distribution at
    the ``fractions`` quantiles — the lowest-cross-entropy (most
    target-like) slice is ``head``, then ``middle``, then ``tail``. This
    is the exact selection rule CCNet publishes its corpus under
    (per-language perplexity terciles), and the standard way the absolute
    score becomes an actionable keep/weight decision: train on head+middle,
    or weight the bins.

    Per-language on purpose: cross-entropy magnitudes are not comparable
    across languages (different token inventories), so one global cutoff
    would class entire languages as tail — the published pipeline bins
    within each language for exactly this reason.

    Returns ``(doc_id, lang, n_tokens, cross_entropy, bin)`` — one row
    per scored document (tokenless docs are absent, as in
    cross_entropy_score).

    Plan at 100 TB: the scoring plan is cross_entropy_score's; the lang
    join is id-keyed (one shuffle, or free when the caller's frame already
    carries lang); the cutoff aggregation reduces the corpus to ONE ROW
    PER LANGUAGE which broadcasts back, so binning is a map-side CASE —
    no window over the corpus, ever. ``exact=True`` uses the exact
    interpolated percentile (what the DuckDB oracle replays bit-for-bit
    after the 6-dp round); at real corpus scale pass ``exact=False`` for
    ``percentile_approx`` — the mergeable t-digest sketch with the same
    one-row-per-lang plan shape, which is also what CCNet itself does
    (cutoffs from a sampled histogram)."""
    f1, f2 = float(fractions[0]), float(fractions[1])
    if not (0.0 < f1 < f2 < 1.0):
        raise ValueError(f"need 0 < fractions[0] < fractions[1] < 1 — got {fractions}")
    ce = cross_entropy_score(raw, target, text_col, id_col, smoothing)
    scored = ce.join(
        raw.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")),
        "doc_id",
    )
    pct = "percentile" if exact else "percentile_approx"
    cuts = scored.groupBy("lang").agg(
        F.round(F.expr(f"{pct}(cross_entropy, {f1!r})"), 6).alias("__c_head"),
        F.round(F.expr(f"{pct}(cross_entropy, {f2!r})"), 6).alias("__c_mid"),
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        "cross_entropy",
        F.when(F.col("cross_entropy") <= F.col("__c_head"), F.lit("head"))
        .when(F.col("cross_entropy") <= F.col("__c_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bin"),
    )
