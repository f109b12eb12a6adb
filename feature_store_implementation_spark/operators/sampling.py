"""Sampling operators for training-data pipelines.

Two reproducibility regimes:

* :func:`stratified_sample` — per-stratum Bernoulli via ``sampleBy``:
  statistically correct fractions, reproducible for a fixed seed AND a fixed
  partitioning of the input (Spark's sampler is per-partition).
* :func:`deterministic_sample` / :func:`per_group_sample` — content-hash
  based: a row is kept iff ``hash(key) % denom < num``, so membership depends
  only on the row's key, never on partitioning, executor count, or replay
  order. This is the one to use for 100 TB corpus curation where re-runs and
  incremental appends must select consistently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .graph import connected_components


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (``df.sampleBy``): strata absent from
    ``fractions`` are dropped, matching Spark semantics."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def deterministic_sample(
    df: DataFrame, key_cols: list[str], fraction: float, buckets: int = 1_000_000
) -> DataFrame:
    """Keep a row iff ``pmod(hash(key), buckets) < fraction*buckets`` —
    partitioning-independent, append-stable (a row's fate never changes as
    the dataset grows), and joins of two tables sampled on the SAME key stay
    aligned (the classic correlated-sampling trick)."""
    keep = F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(buckets)) < int(
        fraction * buckets
    )
    return df.filter(keep)


def per_group_sample(
    df: DataFrame, group_cols: list[str], n: int, key_cols: list[str] | None = None
) -> DataFrame:
    """At most ``n`` rows per group, chosen by content-hash order — a
    deterministic stand-in for per-group reservoir sampling (uniform when the
    hash is uniform). One shuffle on the group key."""
    key_cols = key_cols or [c for c in df.columns if c not in group_cols]
    w = Window.partitionBy(*group_cols).orderBy(
        F.hash(*[F.col(c) for c in key_cols]), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def portable_sample(
    df: DataFrame, key_cols: list[str], hex_threshold: str = "4d", prefix_len: int = 2
) -> DataFrame:
    """Engine-portable deterministic sample: keep a row iff the first
    ``prefix_len`` lowercase-hex chars of ``md5(concat_ws('|', keys))``
    sort lexically below ``hex_threshold``. Sampling fraction ≈
    int(hex_threshold, 16) / 16**prefix_len (default '4d'/256 ≈ 0.30).

    Same append-stability/correlation properties as
    :func:`deterministic_sample`, but the membership decision reproduces
    bit-for-bit in ANY engine with md5 (DuckDB, Trino, Postgres, …) — what
    a corpus split needs when downstream consumers must recompute it
    outside Spark. Map-only; the md5 is codegen'd JVM-side."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return df.filter(F.substring(F.md5(key), 1, prefix_len) < F.lit(hex_threshold))


def quota_sample(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    key_cols: list[str],
    min_per_stratum: int = 1,
) -> DataFrame:
    """Exact per-stratum quota sampling: within every stratum keep the
    ``max(min_per_stratum, ceil(fraction * |stratum|))`` rows that rank
    lowest by ``md5(key)`` — the held-out-eval-set maker (one slice per
    language/source, every stratum represented, quota exact by
    construction rather than in expectation).

    Three properties Bernoulli ``sampleBy`` can't give at once:

    * **Exact quotas.** A 0.2 sample of a 10-row stratum is exactly 2 rows,
      never 0 or 5 — small strata (rare languages) are guaranteed
      representation via ``min_per_stratum``.
    * **Engine-portable.** The md5 rank (same rule as
      :func:`portable_sample`) reproduces bit-for-bit in DuckDB/Trino/
      Postgres, so the published split can be recomputed anywhere.
    * **Superset-stable ranking.** A row's rank only improves relative to
      rows that LEAVE; appending new rows can displace only the
      quota-boundary rows, never reshuffle the selection wholesale (the
      same md5-rank stability argument as ``cap_per_group``).

    Plan shape at 100 TB: ONE shuffle on the strata key; the quota is a
    window ``count(*)`` over the same partition, so no second pass and no
    driver-side group census. Skewed strata (one language = 90% of the
    corpus) stay a single partition here — for those, pre-aggregate the
    stratum sizes and fall back to :func:`weighted_mix` rates, which is
    map-only; this operator's niche is exact small-stratum guarantees.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    w = Window.partitionBy(*strata_cols)
    rank_w = w.orderBy(F.md5(key), *[F.col(c) for c in key_cols])
    quota = F.greatest(
        F.lit(int(min_per_stratum)).cast("long"),
        F.ceil(F.lit(float(fraction)) * F.count(F.lit(1)).over(w)).cast("long"),
    )
    return (
        df.withColumn("__rn", F.row_number().over(rank_w).cast("long"))
        .withColumn("__quota", quota)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    key_cols: list[str] | None = None,
    prefix_len: int = 4,
) -> DataFrame:
    """Data-mixture sampling: keep each group (source/language/domain) at
    its own rate — the weighting step that turns a curated corpus into a
    training mixture. Membership is the same engine-portable md5-prefix
    rule as :func:`portable_sample`, so the mixture is reproducible
    anywhere and per-row stable as the corpus grows; rates get
    ``16**prefix_len`` granularity (default 1/65536). Groups absent from
    ``weights`` are dropped; weight >= 1.0 keeps the whole group ('g'
    sentinel — lexically above every hex digit). Map-only, no shuffle."""
    key_cols = key_cols or ["doc_id"]
    thr = F.when(F.lit(False), F.lit(""))
    for g, w in sorted(weights.items()):
        hex_thr = "g" if w >= 1.0 else format(int(w * 16**prefix_len), f"0{prefix_len}x")
        thr = thr.when(F.col(group_col) == g, F.lit(hex_thr))
    thr = thr.otherwise(F.lit(""))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return df.filter(F.substring(F.md5(key), 1, prefix_len) < thr)


def mixture_temperature_weights(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual rebalancing
    rule from mBERT/XLM-R: sample group g with probability ∝ share_g^α).
    α = 1 keeps natural proportions; α → 0 approaches uniform — low-
    resource groups are up-weighted without drowning out the head. Returns
    one row per group: (group, n_docs, share, weight) where ``weight`` is
    the normalized target mixture probability — feed ``weight/share`` per
    group into :func:`weighted_mix` as relative keep rates.

    Plan: one corpus aggregation on ``group_col``; everything after runs
    on the ≤|groups| aggregate rows, so the unpartitioned windows are
    bounded (never over the corpus). Determinism discipline: shares are
    exact integer divisions; POW is rounded to 8 decimals before the
    DECIMAL(28,12) normalization sum (pow differs in the last ulp across
    engines); doubles reappear only in the final rounded outputs."""
    c = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    t = c.withColumn("total", F.sum("cnt").over(Window.partitionBy()))
    share = F.col("cnt") / F.col("total").cast("double")
    pw = F.round(F.pow(share, F.lit(float(alpha))), 8).cast("decimal(28,12)")
    p = t.withColumn("pw", pw).withColumn(
        "pw_sum", F.sum("pw").over(Window.partitionBy())
    )
    return p.select(
        F.col("grp").alias(group_col),
        F.col("cnt").cast("long").alias("n_docs"),
        F.round(share, 6).alias("share"),
        F.round(
            F.col("pw").cast("double") / F.col("pw_sum").cast("double"), 6
        ).alias("weight"),
    )


def weighted_sample_wor(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: list[str],
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    public): each row draws the portable md5-uniform
    ``u = int(md5(keys)[:13 hex], 16) / 16¹³`` and the sample is the k
    rows maximizing ``u^(1/w)`` — equivalently ``ln(u)/w``, which is what
    we rank on (one log, no pow). Inclusion probability is proportional
    to weight in the without-replacement sense of A-ES; the heaviest rows
    are near-certain members, light rows proportionally unlikely — the
    importance-weighted corpus subset shape (quality-score-weighted
    pretraining pools).

    Engine-portable and append-stable like :func:`portable_sample`: u
    depends only on the row's OWN keys (any md5-bearing engine recomputes
    membership bit-for-bit; ties broken on the keys). Rows with
    non-positive weight are excluded (ln(u)/w flips sign there — A-ES is
    defined on w > 0). u is clamped one step away from 0 so ln is finite
    (p = 16⁻¹³ per row).

    Scale shape: map-only scoring then ONE global top-k —
    TakeOrderedAndProject (per-partition heaps + driver merge of k·P
    rows), never a global sort."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    u = F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double") / F.lit(
        float(16**13)
    )
    es = F.log(F.greatest(u, F.lit(1.0 / 16**13))) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__es", es)
        .orderBy(F.desc("__es"), *key_cols)
        .limit(int(k))
        .drop("__es")
    )


def leakage_safe_split(
    df: DataFrame,
    fractions: dict[str, float],
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    pair_a: str | None = None,
    pair_b: str | None = None,
    prefix_len: int = 4,
    max_iter: int = 25,
) -> DataFrame:
    """Train/valid/test assignment that near-duplicate documents cannot
    straddle: the split is decided by the document's DUP-CLUSTER, not the
    document — the contamination guard an LLM corpus split needs (a test
    document whose near-twin sits in train is leaked eval data; random
    per-doc splits leak exactly proportionally to the dup rate).

    ``pairs`` is any near-dup pair frame from the dedup routes
    (``{id}_a``/``{id}_b`` columns by default — exact_dedup, MinHash,
    SimHash, n-gram Jaccard, embedding or semantic pairs all qualify);
    connected components over it (operators/graph.py) labels each doc
    with its cluster's minimum id, unpaired docs are their own cluster,
    and membership is the engine-portable md5-prefix rule of
    :func:`portable_sample` applied to the CLUSTER id — deterministic,
    append-stable (new docs never move old ones between splits unless
    they bridge clusters), reproducible in any md5-bearing engine.

    ``fractions`` maps split name → fraction in ASSIGNMENT order; they
    must sum to 1 (±1e-6) and the last split absorbs the rounding tail.
    Returns ``df`` plus ``(cluster, split)``. Scale: the pair list (a
    tiny fraction of the corpus) drives the BSP label propagation; the
    corpus itself sees one broadcast-able left join + a map-only CASE."""
    total = sum(fractions.values())
    if not fractions or abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1, got {total}")
    cluster = F.col(id_col)
    out = df
    if pairs is not None:
        a = pair_a or f"{id_col}_a"
        b = pair_b or f"{id_col}_b"
        labels = connected_components(pairs, src=a, dst=b, max_iter=max_iter).select(
            F.col("node").alias(id_col), F.col("component").alias("__cluster")
        )
        out = df.join(labels, id_col, "left")
        cluster = F.coalesce(F.col("__cluster"), F.col(id_col))
    h = F.substring(F.md5(cluster.cast("string")), 1, prefix_len)
    names = list(fractions)
    cum, split = 0.0, F.when(F.lit(False), F.lit(""))
    for name in names[:-1]:
        cum += fractions[name]
        thr = format(min(int(cum * 16**prefix_len), 16**prefix_len - 1), f"0{prefix_len}x")
        split = split.when(h < F.lit(thr), F.lit(name))
    split = split.otherwise(F.lit(names[-1]))
    out = out.withColumn("cluster", cluster).withColumn("split", split)
    return out.drop("__cluster") if pairs is not None else out


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: int | str = 0,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic, engine-portable GLOBAL shuffle + sharding — the
    training-export permutation: every row gets ``shard`` (which of the
    ``n_shards`` dataloader streams it belongs to) and ``pos`` (its read
    order within the shard), derived ONLY from ``md5(seed | keys)`` —

    * reproducible: same seed → the same permutation on any engine with
      md5 (the published-corpus requirement), and a NEW seed is a fresh
      epoch-level reshuffle with zero state;
    * unbiased: md5 output is uniform, so shard sizes balance to
      n/n_shards ± √n and the within-shard order is independent of any
      ingestion/domain order the corpus arrived in — the locality a
      training run must NOT see;
    * scale-shaped: one hash per row (map-only) and ONE shuffle to rank
      within shards; no global sort, no driver state. Each shard ranks
      in a single task, so size ``n_shards`` to the corpus (thousands at
      100 TB — shard files of a few GB are also what the dataloader
      wants), not to a small constant.

    Returns ``df`` + ``(shard, pos)``; :func:`write_training_shards`
    turns the result into one-run-per-shard files."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key_cols = key_cols or ["doc_id"]
    h = F.md5(
        F.concat_ws(
            "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
        )
    )
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias(
        "shard"
    )
    out = df.withColumn("shard", shard).withColumn("__h", h)
    w = Window.partitionBy("shard").orderBy(F.col("__h"), *key_cols)
    return (
        out.withColumn("pos", F.row_number().over(w).cast("long")).drop("__h")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: int | str = 0,
    key_cols: list[str] | None = None,
    extra_metrics: dict | None = None,
) -> dict:
    """Materialize :func:`shuffle_shards` as the dataloader layout: one
    parquet file per ``shard=N`` directory, rows pre-sorted by ``pos``
    (each worker streams its shard top-to-bottom — no further shuffling
    or sorting at load time), plus a ``_manifest.json`` sidecar
    (tmp-write + atomic rename) recording per-shard row counts and
    bytes so a loader can size epochs and detect truncation without
    listing/reading data files. Returns the manifest dict.

    Per-shard row counts ride the write itself as ``Observation``
    metrics (``n_shards`` conditional counts — the shard domain is known
    up front): through r12 they were a dedicated
    ``read.parquet(path).groupBy(shard).count()`` job, i.e. one full
    re-scan of everything just written (at 100 TB a second pass over
    the whole export) purely to recount rows the write already saw
    (§6). The pre-r13 count-back read remains as the fallback when the
    observed metrics don't materialize (folded-plan caveat).

    ``extra_metrics`` — optional extra aggregate Columns (name →
    expression over ``df``'s columns) observed on the SAME write; their
    values are returned under the ``"observed"`` key of the result dict
    (never written to ``_manifest.json`` — the sidecar's byte layout is
    a loader contract). A composing pipeline uses this to ride its
    content fingerprint on the export instead of paying one more full
    pass per split. ``None`` values signal the fallback path was taken
    and the caller must compute them itself.

    Scale shape: the single ``repartition(n_shards, shard)`` shuffle is
    the write's only wide stage; each shard lands in exactly one task's
    partition, so every ``shard=N`` dir holds one entity-ordered run —
    the HBase-bulk-load/WebDataset-shard discipline on parquet."""
    import json
    import os
    import uuid

    from pyspark.sql import Observation

    from ..functions.obs import observed_metrics

    out = shuffle_shards(df, n_shards, seed=seed, key_cols=key_cols)
    obs = Observation()
    metrics = [
        F.count(F.when(F.col("shard") == s, 1)).alias(f"s{s}")
        for s in range(int(n_shards))
    ] + [c.alias(name) for name, c in (extra_metrics or {}).items()]
    (
        # range- not hash-partitioned: contiguous int shard ids land one-
        # per-task (hash would collide ~1/e of tasks into double-shard
        # stragglers and leave others empty).
        # observe() sits ABOVE the range exchange on purpose: the range
        # boundary computation SAMPLES the exchange's child subtree in a
        # separate pass, so a CollectMetrics below it evaluates twice —
        # doubling every count and XOR-cancelling the fingerprint
        # (caught by tests/test_sampling.py). Above the exchange the node
        # runs exactly once, in the write pass, over the same rows.
        out.repartitionByRange(int(n_shards), "shard")
        .sortWithinPartitions("shard", "pos")
        .observe(obs, *metrics)
        .write.partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    # an empty split (tiny corpus × small fraction) writes only _SUCCESS;
    # commit an honest zero-row manifest instead of failing schema
    # inference on a data-less directory
    has_data = any(
        name.startswith("shard=") for name in os.listdir(path)
    )
    observed = observed_metrics(obs)
    if observed is not None:
        counts = {
            s: int(observed[f"s{s}"] or 0)
            for s in range(int(n_shards))
            if int(observed[f"s{s}"] or 0) > 0
        }
        extra_vals = {name: observed.get(name) for name in (extra_metrics or {})}
    else:
        counts = (
            {
                int(r["shard"]): int(r["n"])
                for r in spark.read.parquet(path)
                .groupBy("shard")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            if has_data
            else {}
        )
        extra_vals = {name: None for name in (extra_metrics or {})}
    shards = {}
    for s, n in sorted(counts.items()):
        d = os.path.join(path, f"shard={s}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        shards[str(s)] = {
            "rows": n,
            "files": len(files),
            "bytes": sum(os.path.getsize(os.path.join(d, f)) for f in files),
        }
    manifest = {
        "n_shards": int(n_shards),
        "seed": str(seed),
        "total_rows": sum(c["rows"] for c in shards.values()),
        "shards": shards,
    }
    tmp = os.path.join(path, f".manifest.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "_manifest.json"))
    if extra_metrics:
        # returned to the caller only — NEVER written to _manifest.json
        # (the sidecar's byte layout is a loader contract)
        return {**manifest, "observed": extra_vals}
    return manifest


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    k: int = 100,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group HARD CAP — the C4/RefinedWeb "at most K documents per
    domain" curation rule, distinct from :func:`weighted_mix`'s
    proportional rates: a cap bounds every group's absolute contribution
    regardless of its share, which is what kills template farms and SEO
    mills that would survive any fixed keep-rate.

    Selection within a group is DETERMINISTIC and content/ID-stable
    (rank by md5 of the id columns, the same engine-portable rule as
    portable_sample — not by arrival order, which reshuffles whenever
    the corpus repartitions): the same corpus always keeps the same K
    docs per group, and a grown corpus keeps a superset-stable ranking.

    One window over the group key — a single hash-partition shuffle on
    ``group_col``; skewed mega-groups are exactly the rows the cap
    discards, and AQE skew-split handles the sort. Returns the capped
    frame with the original columns."""
    if k <= 0:
        raise ValueError("k must be positive")
    id_cols = id_cols or ["doc_id"]
    rank_key = F.md5(
        F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    )
    w = Window.partitionBy(group_col).orderBy(
        rank_key, *[F.col(c) for c in id_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def resample_by_weight(
    df: DataFrame,
    weight_col: str = "weight",
    key_cols: list[str] | None = None,
    scale: float = 1.0,
    seed: str = "",
    copy_col: str = "copy",
    max_copies: int = 1_000_000,
) -> DataFrame:
    """Materialize per-row sampling WEIGHTS into integer REPLICATION —
    the consumer step for every weight-producing selector here
    (:func:`dsir_importance_weights` after exp/normalize,
    :func:`~.dedup.soft_dedup_weights`, cross-entropy bin weights) when
    the trainer reads a flat corpus and cannot apply per-example weights
    itself: a row with ``x = weight·scale`` emits ``floor(x)`` copies
    plus one more with probability ``frac(x)``, so E[copies] = x exactly
    and the materialized corpus realizes the weighted distribution in
    expectation (the standard stochastic-rounding corpus-epoch recipe —
    e.g. how DoReMi/DSIR-weighted corpora are flattened for training).

    The extra-copy coin is the portable md5-uniform
    ``u = int(md5(seed|keys)[:13 hex],16)/16¹³`` (the portable_sample /
    weighted_sample_wor rule): deterministic, engine-portable,
    append-stable — a grown corpus never re-flips an old row's coin, and
    a new ``seed`` is a fresh independent rounding. Rows with
    ``weight·scale ≤ 0`` emit nothing; output is every input column plus
    ``copy`` (1..n, the training-order disambiguator
    :func:`shuffle_shards` can key on).

    Plan at 100 TB: map-only — the coin and copy count are codegen'd
    expressions and the fan-out is a JVM ``explode(sequence(...))``; no
    shuffle, no UDF, no collect. Output rows ≈ scale · Σweight, the
    corpus the caller ASKED to materialize. One guard: a single row
    asking for more than ``max_copies`` copies (a weight outlier × an
    aggressive scale — e.g. un-normalized DSIR exp-weights) fails LOUDLY
    instead of materializing a multi-GB sequence inside one task —
    normalize or clip the weights, or raise ``max_copies`` knowingly."""
    keys = key_cols or ["doc_id"]
    x = F.col(weight_col).cast("double") * F.lit(float(scale))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in keys]
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("double") / F.lit(float(16**13))
    n = (
        F.floor(x) + F.when(u < x - F.floor(x), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    n = F.when(
        n > int(max_copies),
        F.raise_error(
            F.concat(
                F.lit(
                    f"resample_by_weight: a row wants > max_copies="
                    f"{int(max_copies)} copies (weight*scale = "
                ),
                F.round(x, 3).cast("string"),
                F.lit(") — normalize/clip the weights or raise max_copies"),
            )
        ).cast("long"),
    ).otherwise(n)
    return (
        df.withColumn("__n_copies", n)
        .filter(F.col("__n_copies") > 0)
        .select(
            *df.columns,
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("__n_copies"))).alias(
                copy_col
            ),
        )
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ngram_ns: tuple[int, ...] = (1, 2),
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023 — public method):
    score every raw document by how much more likely its hashed n-gram
    bag is under the TARGET distribution than under the RAW distribution.
    Returns ``(doc_id, n_feats, log_weight)`` where

        log_weight(d) = Σ_b k_{d,b} · ( ln p̂_target(b) − ln p̂_raw(b) )

    over hashed n-gram buckets ``b`` (word n-grams for each n in
    ``ngram_ns``, md5-hashed into ``n_buckets`` buckets, per-OCCURRENCE
    counts k — the paper's bag-of-hashed-ngrams features), with add-k
    ``smoothing`` on both unigram-over-bucket distributions. Feeding
    ``log_weight`` to :func:`weighted_sample_wor` (as exp-weight via the
    Gumbel trick the paper uses) or a top-k completes the resampling
    step; this operator is the distribution fit + scoring pass.

    Docs with no tokens are absent (no features → no distribution).
    ``target`` only needs ``text_col`` — its document ids (if any) are
    irrelevant to the fitted distribution and never touched.

    Plan at 100 TB: the corpus collapses FIRST to (doc, bucket, k) — the
    explode never leaves its stage (map-side partial count into the
    (doc, bucket) hash aggregate), the raw bucket distribution is a
    second tiny aggregation of that frame (≤ ``n_buckets`` rows out),
    the target corpus contributes one aggregation of its own, and the
    per-bucket log-ratio table (≤ ``n_buckets`` rows) BROADCASTS back
    onto the per-doc frame, so the scoring join ships no corpus bytes.
    Zipf-head buckets skew only the small re-aggregations, never a
    corpus-wide sort. No collect, no window, no UDF.

    Determinism discipline (same as text.unigram_logprob): bucket ids
    come from the first 8 md5 hex chars (engine-portable, exact in a
    long), the distributions divide as doubles, LN rounds to 8 decimals
    BEFORE accumulation, partial sums accumulate in DECIMAL, and only
    the final per-doc weight returns to double (6 dp)."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (both distributions "
                         "must give every bucket nonzero mass)")
    from ..functions.textfns import tokens_col

    def grams() -> F.Column:
        # over the PROJECTED token attribute "__toks", never an inline
        # tokenizer: the transform lambda slices its token argument per
        # element, and HOF lambda bodies evaluate interpreted, so an inline
        # split() there re-runs once per gram position — O(tokens²) per doc
        # (the minhash_signatures projection-boundary discipline)
        toks = F.col("__toks")
        parts = []
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
        out = parts[0]
        for p in parts[1:]:
            out = F.concat(out, p)
        return out

    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).alias("bucket")

    def feats(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias("doc_id"),
                tokens_col(F.col(text_col)).alias("__toks"),
            )
            .select("doc_id", F.explode(grams()).alias("g"))
            .select("doc_id", bucket)
        )

    def gram_buckets(df: DataFrame) -> DataFrame:
        # the target distribution needs only the gram column — the target
        # frame is NOT required to carry id_col (its ids were selected and
        # discarded pre-round-12, failing targets that carry only a text
        # column with an AnalysisException; ADVICE r11)
        return (
            df.select(tokens_col(F.col(text_col)).alias("__toks"))
            .select(F.explode(grams()).alias("g"))
            .select(bucket)
        )

    # Spark shares no subplans across DataFrame branches — without these
    # scope caches the (doc, bucket, k) frame's lineage (the corpus scan +
    # explode) would re-run for EACH of rdist / its total / the scoring
    # join (~4 corpus scans; the plan audit caught it), and tdist's target
    # scan twice. Cached: corpus exploded once, target once, every other
    # branch reads ≤n_buckets-row frames.
    from .dedup import _cache_scoped

    per_doc = _cache_scoped(
        feats(raw).groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("k"))
    )
    rdist = _cache_scoped(per_doc.groupBy("bucket").agg(F.sum("k").alias("cr")))
    tdist = _cache_scoped(
        gram_buckets(target).groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    )
    r_total = rdist.agg(F.sum("cr").alias("tr"))
    t_total = tdist.agg(F.sum("ct").alias("tt"))

    s = float(smoothing)
    denom_pad = F.lit(s * n_buckets)
    lam = (
        rdist.join(tdist, "bucket", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(r_total))
        .crossJoin(F.broadcast(t_total))
        .select(
            "bucket",
            F.round(
                F.log((F.col("ct") + s) / (F.col("tt") + denom_pad))
                - F.log((F.col("cr") + s) / (F.col("tr") + denom_pad)),
                8,
            )
            .cast("decimal(18,12)")
            .alias("lam"),
        )
    )
    # decimal sizing mirrors unigram_logprob: k(10,0) × lam(18,12) →
    # (29,12), summed at (38,12) — inside the 38-digit cap, no silent
    # scale reduction
    weighted = F.col("k").cast("decimal(10,0)") * F.col("lam")
    return (
        per_doc.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_feats"),
            F.round(F.sum(weighted).cast("double"), 6).alias("log_weight"),
        )
    )
