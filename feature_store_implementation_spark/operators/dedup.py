"""Deduplication operators for large-scale training-data pipelines.

Five levels, all deterministic (fixed hash functions — no per-run RNG), all
expressed as DataFrame plans that scale: the candidate-generation step is
always a hash-bucket equi-join (shuffle on the bucket key), never an O(n²)
crossJoin. Exact verification runs only inside candidate buckets.

* :func:`exact_dedup` — hash-groupBy, keep the minimum id per key.
* :func:`minhash_near_dup_pairs` — word-shingle MinHash signatures → banded
  LSH buckets → exact Jaccard verify within buckets.
* :func:`simhash_signatures` / :func:`simhash_near_dup_pairs` — 64/128-bit
  SimHash; pigeonhole banding finds all pairs within a Hamming radius.
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard within a blocking key
  (small blocks only; the MinHash path is the 100 TB route).
* :func:`embedding_near_dup_pairs` — cosine near-duplicates over an
  embedding column (brute within-block or via the similarity module's LSH).

The reference itself only has ``drop_duplicates`` reach (SURVEY §2.D) —
these are north-star extensions (BASELINE.json)."""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import tokens_col, word_ngrams_col
from ..functions.vector import cosine_col

# ---------------------------------------------------------------------------
# scoped caching
# ---------------------------------------------------------------------------

# The MinHash/SimHash signature frames and the n-gram shingle frame are
# cache()d because each is referenced twice in its returned plan (candidate
# generation + verify). A long-lived session running the full ~200-query
# inventory would otherwise accumulate one cached frame per dedup call for
# the session lifetime. Caching is SCOPED: a pipeline run (or a bench/test
# harness) opens a `cache_scope()`, its frames evict oldest-first beyond a
# small window, and the scope's exit unpersists everything it cached.
# Two sharp edges are handled explicitly:
#   * the scope stack is THREAD-LOCAL — a Structured Streaming
#     foreachBatch thread's scoped pipeline cannot capture (and then
#     release) frames a concurrently-running driver-thread scope cached;
#   * Spark's CacheManager keys cached data by LOGICAL PLAN, not by
#     DataFrame handle, so two scopes caching semantically identical
#     frames share ONE cache entry — release/eviction therefore
#     refcounts by `semanticHash()` across ALL live scopes (any thread)
#     and only unpersists a plan no live scope still holds. Eviction
#     stays CORRECT either way (an unpersisted frame recomputes), but a
#     recompute of a shingle frame is the exact cost the cache exists
#     to avoid.
# Calls with no active scope fall back to one bounded session-global
# default window (the old behavior, so ad-hoc REPL use stays bounded).

_PLAN_REFS: dict[tuple, int] = {}  # (app id, semanticHash) -> live refcount
_PLAN_LOCK = threading.Lock()


def _sem_hash(df: DataFrame) -> int:
    try:
        return df.semanticHash()
    except Exception:  # analysis failure — fall back to handle identity
        return id(df)


def _plan_key(df: DataFrame) -> tuple:
    """Refcount key: (application id, semanticHash). The session identity
    matters (ADVICE r9): semanticHash is PLAN-based and deterministic, so
    after a session restart a new scope caching the same plan would alias
    the refcount a dead session's never-released _DEFAULT_SCOPE entry
    still holds — its release would decrement to 1 instead of 0 and the
    live frame would squat on executor storage for the new session's
    lifetime. Keyed per-application, a dead session's stale entries can
    never shadow a live session's count (they only waste a few dict
    tuples until process exit)."""
    try:
        sid = df.sparkSession.sparkContext.applicationId
    except Exception:  # stopped/stopping session — identity unavailable
        sid = "?"
    return (sid, _sem_hash(df))


class _CacheScope:
    __slots__ = ("frames", "window", "_mu", "bcasts")

    def __init__(self, window: int = 8):
        self.frames: list[tuple[DataFrame, tuple]] = []
        self.bcasts: list = []  # sc.broadcast handles, released with the scope
        self.window = window
        # frames-list mutations are locked: scope objects are normally
        # single-thread (the stack is thread-local), but _DEFAULT_SCOPE is
        # the SHARED fallback for scope-less callers — two streaming
        # foreachBatch threads hitting it concurrently would interleave
        # the check-then-pop eviction (unpersisting each other's
        # just-cached frames, or racing pop(0) into IndexError)
        self._mu = threading.Lock()

    def add(self, df: DataFrame) -> DataFrame:
        df = df.cache()
        h = _plan_key(df)
        with _PLAN_LOCK:
            _PLAN_REFS[h] = _PLAN_REFS.get(h, 0) + 1
        with self._mu:
            evict = []
            while len(self.frames) >= self.window:
                evict.append(self.frames.pop(0))
            self.frames.append((df, h))
        for item in evict:
            self._drop(item)
        return df

    @staticmethod
    def _drop(item: tuple[DataFrame, tuple]) -> None:
        df, h = item
        with _PLAN_LOCK:
            left = _PLAN_REFS.get(h, 1) - 1
            if left > 0:  # another live scope still holds this plan
                _PLAN_REFS[h] = left
                return
            _PLAN_REFS.pop(h, None)
            try:
                df.unpersist()
            except Exception:  # a stopped session invalidates old handles
                pass

    def add_broadcast(self, bc):
        """Scope a ``sc.broadcast`` handle like the cached frames: evicted
        oldest-first past the window while the scope runs, all unpersisted
        at release. Broadcast variables otherwise have NO release path —
        each _einsum_verify call pins up to ~100 MB of normalized matrix
        on the driver and every executor for the session's lifetime.
        unpersist (never destroy) keeps late consumers correct: Spark
        re-ships the driver-held value if an evicted broadcast is used
        again — the recompute trade the frame cache already makes."""
        with self._mu:
            evict = []
            while len(self.bcasts) >= self.window:
                evict.append(self.bcasts.pop(0))
            self.bcasts.append(bc)
        for old_bc in evict:
            try:
                old_bc.unpersist(blocking=False)
            except Exception:  # stopped session — nothing to release
                pass
        return bc

    def release(self) -> None:
        with self._mu:
            drop, self.frames = self.frames, []
            drop_bc, self.bcasts = self.bcasts, []
        while drop:
            self._drop(drop.pop())
        for bc in drop_bc:
            try:
                bc.unpersist(blocking=False)
            except Exception:
                pass


_DEFAULT_SCOPE = _CacheScope(window=8)
_TLS = threading.local()


def _scope_stack() -> list:
    stack = getattr(_TLS, "stack", None)
    if stack is None:
        stack = _TLS.stack = []
    return stack


@contextmanager
def cache_scope(window: int = 8):
    """Bound the lifetime of every signature/shingle frame cached by dedup
    routes invoked inside the block: evicted oldest-first past ``window``
    while the block runs, ALL unpersisted at exit (except plans another
    live scope — nested, or on another thread — still holds; those drop
    when their last holder exits). Wrap each pipeline run
    (pipelines/corpus.py, pipelines/pretraining.py do) and each bench/test
    query so one run's cached storage never squats on executor memory —
    or evicts another run's live frames — after it finishes."""
    scope = _CacheScope(window=window)
    stack = _scope_stack()
    stack.append(scope)
    try:
        yield scope
    finally:
        stack.remove(scope)
        scope.release()


def _cache_scoped(df: DataFrame) -> DataFrame:
    stack = _scope_stack()
    scope = stack[-1] if stack else _DEFAULT_SCOPE
    return scope.add(df)


def _broadcast_scoped(bc):
    stack = _scope_stack()
    scope = stack[-1] if stack else _DEFAULT_SCOPE
    return scope.add_broadcast(bc)


def _bucket_pairs(buckets: DataFrame, a: str, b: str, distinct: bool = True) -> DataFrame:
    """Expand each bucket's SORTED ``ids`` array into its a<b id pairs —
    the shared candidate-generation tail of every banded/blocked dedup
    route (MinHash, SimHash, n-gram postings, embedding LSH). For each
    position i, pair ids[i] with every LATER id via slice(i+2, len-i-1):
    ordered, no self-pairs, no duplicates within one bucket. The
    greatest(...,0) guard keeps the slice length non-negative for the
    final element. ``distinct=False`` preserves cross-bucket multiplicity
    — the n-gram route's pair count IS the intersection size."""
    out = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ids"), i + 2, F.greatest(F.size("ids") - i - 1, F.lit(0))
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.a").alias(a), F.col("p.b").alias(b))
    return out.distinct() if distinct else out


def _spread_small_input(df: DataFrame) -> DataFrame:
    """CPU-heavy per-row stages (shingling, token hashing, fingerprint
    sums) inherit the SCAN's partitioning — and a corpus arriving as a
    handful of small parquet row-groups runs them nearly single-threaded
    (parquet cannot split below a row group; sf0.1's documents table is
    ONE 600 KB row group, so the whole signature pipeline ran on 1 of 32
    cores — measured 9.7s → 2.0s after spreading). When the input has
    fewer partitions than the cluster has slots, repartition up front:
    in that regime the text shuffle is tiny by definition (few small
    row-groups). At 100 TB the scan already has ≥ slots partitions and
    this is a NO-OP — the corpus never shuffles for it."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one hash aggregation keyed on the duplicate-defining
    columns; the surviving row id is ``min(id)`` (deterministic, unlike
    ``dropDuplicates`` which keeps an arbitrary first)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_signature(hashed: Column, k: int) -> Column:
    """k seeded min-hashes over PRE-HASHED shingle keys (array<bigint>),
    as an array<bigint>, all JVM-side and run-deterministic. The k
    min-wise functions hash an 8-byte long with a leading seed literal
    instead of re-hashing ~30-byte shingle strings k times (measured 45%
    faster at sf0.1; a pmod universal-hash family was measured SLOWER
    than xxhash64-on-long, so xxhash64 stays the hash of choice).
    Independence is unchanged — pre-hash collisions are 2⁻⁶⁴.

    The caller MUST materialize ``hashed`` behind a projection boundary
    (an attribute, not an inline expression): higher-order functions
    evaluate interpreted (no whole-stage-codegen subexpression
    elimination), so an inline shingle pipeline would be RE-RUN once per
    min-hash branch — measured 84s vs 4s at sf0.1 for k=32."""

    def min_j(j: int) -> Column:
        # single-arg lambda on purpose: a 2-arg transform lambda would
        # receive (element, index) and shadow the seed
        return F.array_min(F.transform(hashed, lambda h: F.xxhash64(F.lit(j), h)))

    return F.array(*[min_j(j) for j in range(k)])


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_shingle: int = 3, k: int = 32
) -> DataFrame:
    """(doc_id, shingles, signature), where ``shingles`` is the DISTINCT
    xxhash64 KEY SET of the document's word n-grams (array<bigint>), not
    the strings: Jaccard over the key sets equals Jaccard over the string
    sets (intersect/union are set-semantic either way; collisions are
    2⁻⁶⁴), while the persisted index shrinks ~4× and the verify
    intersects 8-byte longs instead of ~30-byte strings. Built in chained
    projections that Catalyst provably keeps separate (CollapseProject
    declines to inline a non-cheap alias referenced more than once), so
    the shingle pipeline and the string→long hash each run ONCE no matter
    how many min-hash branches read them — see :func:`_minhash_signature`
    on why inlining would be catastrophic under interpreted HOF
    evaluation."""
    # tokens FIRST, behind their own projection boundary: word_ngrams_col's
    # transform lambda slices into its token argument PER ELEMENT, and HOF
    # lambda bodies evaluate interpreted — an inline split() there re-runs
    # the whole tokenizer once per shingle position, O(tokens²) per doc
    # (measured 4.4s → 0.4s at sf0.1 for this exact stage). The projected
    # attribute is referenced >1 time by the shingle expression, so
    # CollapseProject provably keeps the boundary.
    staged = _spread_small_input(df).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("__toks"),
    )
    staged = staged.select(
        "doc_id", word_ngrams_col(F.col("__toks"), n_shingle).alias("__sh")
    )
    staged = staged.select(
        "doc_id",
        F.array_distinct(F.transform("__sh", lambda s: F.xxhash64(s))).alias(
            "shingles"
        ),
    )
    return staged.select(
        "doc_id",
        "shingles",
        _minhash_signature(F.col("shingles"), k).alias("signature"),
    )


def _minhash_bands(sigs: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc_id, band, bucket) rows: each signature split into ``bands``
    row-groups of k/bands values, each group hashed to one bucket id —
    the LSH banding shared by the batch pair route and the persisted
    index's query path (identical hashing, so candidates agree)."""
    if not 1 <= bands <= k or k % bands:
        # bands > k degenerates silently: r = k//bands = 0 hashes ZERO
        # signature values per band, every doc lands in one bucket, and
        # the max_bucket cap then discards the whole corpus — "no
        # duplicates found" with no error. Non-divisible k just silently
        # ignores the k % bands trailing values. Both are config bugs
        # the index would otherwise persist in params.json for life.
        raise ValueError(
            f"bands={bands} must divide k={k} (1 <= bands <= k)"
        )
    r = k // bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.lit(b), *[F.col("signature")[b * r + i] for i in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    stage: str = "pairs",
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    Plan shape (scale-first):
      signatures (1 pass) → explode bands (×bands rows) → groupBy band bucket
      (ONE shuffle on the bucket hash) → in-bucket pair generation (skipping
      pathological buckets > max_bucket) → exact Jaccard verify via shingle
      arrays (join back, broadcast-friendly at candidate cardinality).

    With k=32, bands=8 (r=4 rows/band), the LSH S-curve crosses ~0.5 at
    s ≈ (1/8)^(1/4) ≈ 0.59 — candidates well below ``threshold`` are cheap
    to verify away; true pairs ≥ 0.7 are found with high probability.
    Returns (doc_id_a, doc_id_b, jaccard) with doc_id_a < doc_id_b.

    ``stage="candidates"`` returns the distinct LSH candidate pairs
    BEFORE the exact-Jaccard verify — the tuning/scale-audit surface
    (tools/scale_check.py measures candidates-generated vs
    pairs-verified growth with corpus size).

    ``sigs`` — a precomputed :func:`minhash_signatures` frame (same
    n_shingle/k over the same text) covering a SUPERSET of ``df``'s
    docs; it is semi-joined down to ``df`` and the signature scan is
    skipped. This is how a pipeline that needs pairs at two thresholds
    (dedup at 0.7, leakage-split at 0.5 — build_pretraining_corpus)
    pays the tokenize→shingle→hash pass over the corpus text ONCE:
    banding, bucket caps, and verify are recomputed per call on exactly
    the given doc set, so candidates and pairs are bit-identical to the
    self-computed path (pinned in tests).
    """
    if sigs is None:
        sigs = _cache_scoped(minhash_signatures(df, text_col, id_col, n_shingle, k))
    else:
        sigs = sigs.join(
            df.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
        )
    banded = _minhash_bands(sigs, k, bands)

    # in-bucket sorted-id pair generation, skipping degenerate buckets
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = _bucket_pairs(buckets, "doc_id_a", "doc_id_b")
    if stage == "candidates":
        return pairs

    sh = sigs.select("doc_id", "shingles")
    verified = (
        pairs.join(sh.withColumnsRenamed({"doc_id": "doc_id_a", "shingles": "sh_a"}), "doc_id_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_id_b", "shingles": "sh_b"}), "doc_id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def _prepare_index_dir(sig_dir: str, marker: str, overwrite: bool) -> None:
    """Shared pre-flight for the persisted MinHash/SimHash/IVF indexes:
    sweep an UNCOMMITTED leftover (signatures dir, no commit marker — a
    killed writer), fail fast with a clear contract on a COMMITTED index
    (so the caller learns 'index already exists' before the signature
    Spark job runs, not from an os.rename OSError after it), or demote
    the committed index for ``overwrite`` (marker removed FIRST, so a
    crash mid-overwrite leaves a retryable uncommitted path)."""
    import os
    import shutil

    if os.path.isdir(sig_dir):
        if os.path.exists(marker):
            if not overwrite:
                raise FileExistsError(
                    f"index already exists at {os.path.dirname(marker)}; "
                    "pass overwrite=True to rebuild it"
                )
            os.remove(marker)
        shutil.rmtree(sig_dir)


def _read_index_signatures(spark, path: str) -> DataFrame:
    """Every COMMITTED signature row of a persisted index: the base
    write's flat files plus each appended segment subdir
    (``signatures/seg-<txn>/``), via recursive file lookup. Crash safety
    falls out of the layout: an append stages OUTSIDE ``signatures/`` and
    commits with ONE atomic directory rename, so a killed appender leaves
    only an invisible staging dir — a reader never sees a partial
    segment."""
    import os

    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(path, "signatures"))
    )


def _content_sized(sigs: DataFrame, rows_per_file: int = 200_000) -> tuple:
    """(sized_frame, row_count) for a signature-parquet write: one file
    per ~``rows_per_file`` rows — parallel writes for genuinely large
    segments, single-file for daily increments (no 32-tiny-file sprays
    from the upstream shuffle's partition count). ``coalesce`` (never
    ``repartition``) merges reduce-side partitions without another
    shuffle, reading back the cache the count just materialized; the
    returned count also makes the post-write footer re-read redundant."""
    sigs = _cache_scoped(sigs)
    n_rows = sigs.count()
    n_files = max(1, -(-n_rows // rows_per_file))
    if n_files < sigs.rdd.getNumPartitions():
        return sigs.coalesce(n_files), n_rows
    return sigs, n_rows


def _append_index_segment(sigs: DataFrame, path: str, txn: str | None = None) -> int:
    """Commit one signature segment to a persisted index: write the
    segment parquet to ``path/.staging-<txn>``, fsync its files and
    directory entries, then ONE atomic rename to
    ``path/signatures/seg-<txn>`` (the commit point — same discipline as
    the offline store's manifest rename). Concurrent appends commit
    disjoint segment names, so neither can hide the other; a crash at any
    point leaves a swept-on-sight invisible staging dir.

    A caller-supplied ``txn`` makes the append IDEMPOTENT on that token:
    if the segment already exists the call is a no-op returning 0 — the
    exactly-once hook for streaming foreachBatch replays (token = the
    micro-batch epoch id). Returns the appended row count (from the
    committed files' parquet footers)."""
    import glob
    import os
    import shutil
    import uuid

    sig_dir = os.path.join(path, "signatures")
    if not os.path.isdir(sig_dir):
        raise FileNotFoundError(
            f"no committed index at {path}; write one before appending"
        )
    _sweep_superseded_segments(sig_dir)  # finish any interrupted compaction
    txn = uuid.uuid4().hex[:12] if txn is None else str(txn)
    seg = os.path.join(sig_dir, f"seg-{txn}")
    if os.path.isdir(seg) or f"seg-{txn}" in _superseded_names(sig_dir):
        # this token already committed — either its segment dir is live, or
        # a compaction folded it into a merged segment (whose supersedes
        # record keeps the txn durable for the index's lifetime, so a
        # trigger replayed AFTER compaction still no-ops: exactly-once)
        return 0
    # staging is uniquified PER PROCESS: two concurrent appenders replaying
    # the same txn (zombie driver + failover driver, same epoch) must not
    # share a staging dir — the loser's cleanup would rmtree the winner's
    # in-flight write and BOTH commits would fail in exactly the replay
    # scenario the idempotent txn exists for. The loser now commits second
    # and no-ops at the rename; orphaned staging from a crash is age-gated
    # vacuumed (vacuum_index_staging).
    staging = os.path.join(path, f".staging-{txn}-{uuid.uuid4().hex[:8]}")
    try:
        # Size the segment to its CONTENT (_content_sized): an append is
        # increment-sized by contract, and writing it with the upstream
        # shuffle's partition count sprays a few-hundred-row increment
        # over 32 tiny files — 32 fsyncs per commit (the r8 durability
        # trade multiplied by a constant it never needed) plus a
        # small-file tax on every later index read.
        out, n_rows = _content_sized(sigs)
        out.write.parquet(staging)
        for f in glob.glob(os.path.join(staging, "*")):
            _index_fsync(f)
        _index_fsync(staging)
        try:
            os.rename(staging, seg)
        except OSError:
            if os.path.isdir(seg):  # a concurrent replayer of this txn won
                shutil.rmtree(staging, ignore_errors=True)
                return 0
            raise
        _index_fsync(sig_dir)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return n_rows


def _index_fsync(p: str) -> None:
    import os

    fd = os.open(p, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def index_txn_committed(path: str, txn: str) -> bool:
    """Whether an append transaction already committed to the persisted
    index at ``path`` — its segment dir is live, or a compaction folded
    it into a merged segment (whose supersedes record keeps the txn
    durable). The pre-flight check that lets a replayed streaming
    trigger skip recomputing its whole batch (streaming_dedup_ingest)
    instead of merely no-opping the final append."""
    import os

    sig_dir = os.path.join(path, "signatures")
    if os.path.isdir(os.path.join(sig_dir, f"seg-{txn}")):
        return True
    return f"seg-{txn}" in _superseded_names(sig_dir)


def _superseded_names(sig_dir: str) -> set[str]:
    """Union of every live segment's ``_supersedes.json`` — the permanent
    record of which sources (and, transitively, which append txns) have
    been folded into a merged segment. Compaction carries the union
    forward (see :func:`index_compact`), so a txn stays in this set for
    the index's lifetime even after its original segment dir is gone —
    what keeps epoch-keyed streaming appends exactly-once across
    compactions."""
    import glob
    import json
    import os

    names: set[str] = set()
    for seg in glob.glob(os.path.join(sig_dir, "seg-*")):
        marker = os.path.join(seg, "_supersedes.json")
        if os.path.exists(marker):
            with open(marker) as f:
                names.update(json.load(f)["supersedes"])
    return names


def _sweep_superseded_segments(sig_dir: str) -> None:
    """Finish any interrupted compaction: a committed merged segment
    carries ``_supersedes.json`` naming the exact flat files / segment
    dirs it replaced; delete whichever of them still exist. Idempotent —
    already-deleted entries are skipped — so writers run it on sight."""
    import os
    import shutil

    for n in _superseded_names(sig_dir):
        p = os.path.join(sig_dir, os.path.basename(n))
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)


def index_vacuum(path: str, min_age_seconds: float = 24 * 3600) -> list[str]:
    """Remove a persisted index's stale staging dirs — what a writer
    killed BEFORE its commit rename leaves behind (readers never see
    them; this reclaims the disk). Age-gated like the offline store's
    ``vacuum_orphans`` so an in-flight writer's staging is never swept
    from under it. Works for the signature indexes and the IVF index
    (same ``.staging-*`` convention). Returns the removed paths."""
    import glob
    import os
    import shutil
    import time

    removed: list[str] = []
    cutoff = time.time() - float(min_age_seconds)
    for stage in glob.glob(os.path.join(path, ".staging-*")):
        try:
            if os.path.getmtime(stage) < cutoff:
                shutil.rmtree(stage, ignore_errors=True)
                removed.append(stage)
        except FileNotFoundError:
            pass
    return removed


def maintain_index(
    spark,
    path: str,
    compact_min_segments: int = 4,
    vacuum_min_age_seconds: float = 24 * 3600,
) -> dict:
    """ONE operational entry point for every persisted index — MinHash /
    SimHash signature indexes and the IVF/IVF-PQ vector index share the
    same segment lifecycle (write → append → compact → vacuum) but grew
    separate function families; a scheduler should not need to know
    which is which. Detects the index kind from its layout
    (``signatures/`` → signature index; ``centroids.json`` → IVF),
    compacts when the live appended-segment count is at or above
    ``compact_min_segments`` (the small-file hygiene threshold;
    compaction itself is the kind's own verified protocol —
    :func:`index_compact` / :func:`~.similarity.ivf_index_compact`),
    and age-gated-vacuums crashed writers' staging dirs
    (:func:`index_vacuum`). Returns a report dict:
    ``{kind, segments_before, segments_after, compacted_rows,
    vacuumed}``. Idempotent; run it from cron against every index path.
    Same single-compactor-at-a-time discipline as the underlying
    compactors."""
    import glob
    import os

    if os.path.isdir(os.path.join(path, "signatures")):
        kind, seg_root = "signature", os.path.join(path, "signatures")
        compact = index_compact
    elif os.path.exists(os.path.join(path, "centroids.json")):
        from .similarity import ivf_index_compact

        kind, seg_root = "ivf", os.path.join(path, "segments")
        compact = ivf_index_compact
    else:
        raise FileNotFoundError(f"no persisted index recognized at {path}")

    def live_segments() -> int:
        dead = _superseded_names(seg_root) if os.path.isdir(seg_root) else set()
        return sum(
            1
            for d in glob.glob(os.path.join(seg_root, "seg-*"))
            if os.path.isdir(d) and os.path.basename(d) not in dead
        )

    before = live_segments()
    compacted_rows = 0
    if before >= int(compact_min_segments):
        compacted_rows = compact(spark, path)
    vacuumed = index_vacuum(path, vacuum_min_age_seconds)
    return {
        "kind": kind,
        "segments_before": before,
        "segments_after": live_segments(),
        "compacted_rows": int(compacted_rows),
        "vacuumed": vacuumed,
    }


def index_compact(spark, path: str) -> int:
    """Merge a persisted index's base files and appended segments into ONE
    segment — the small-file hygiene pass for streaming intake, where
    every trigger committed its own segment (same motivation as the
    offline store's compact_version_partition).

    Protocol: read everything committed, stage the merged parquet PLUS a
    ``_supersedes.json`` naming the exact sources it replaces (underscore
    prefix — invisible to parquet reads), one atomic rename to commit,
    then delete the sources. A crash after commit but before deletion
    leaves a bounded transient window where the superseded rows exist
    twice — queries in that window can emit duplicate pair rows — and the
    NEXT writer (append or compact) finishes the deletion via
    :func:`_sweep_superseded_segments` before doing anything else.
    Concurrent appends are safe (a segment committed during compaction is
    not in the supersedes list and survives); run ONE compactor at a
    time, the same discipline as the offline store's. Returns the merged
    row count, or 0 when there is nothing to merge."""
    import glob
    import json
    import os
    import uuid

    sig_dir = os.path.join(path, "signatures")
    if not os.path.isdir(sig_dir):
        raise FileNotFoundError(f"no committed index at {path}")
    _sweep_superseded_segments(sig_dir)
    flat = sorted(
        os.path.basename(f) for f in glob.glob(os.path.join(sig_dir, "*.parquet"))
    )
    segs = sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(sig_dir, "seg-*"))
        if os.path.isdir(d)
    )
    if len(flat) + len(segs) <= 1 or not segs:
        return 0  # a lone base (or lone segment) is already compact
    # size the output like the offline store's compactor: ceil(bytes/128MB)
    # files — compacting 40 streaming micro-segments into 32 shuffle-count
    # files would defeat the point
    total_bytes = 0
    for base, _dirs, names in os.walk(sig_dir):
        total_bytes += sum(
            os.path.getsize(os.path.join(base, n))
            for n in names
            if n.endswith(".parquet")
        )
    n_files = max(1, -(-total_bytes // (128 * 1024 * 1024)))
    # merge EXACTLY the sources the supersedes record below names — never
    # a fresh whole-dir listing: a segment appended between the two
    # listings would be folded into the merged rows but left out of the
    # record, so the sweep would keep it live and its rows would exist
    # twice in the index forever (duplicate candidate pairs on every
    # later query, fixable only by a rebuild)
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(*[os.path.join(sig_dir, n) for n in flat + segs])
        .coalesce(n_files)
    )
    txn = uuid.uuid4().hex[:12]
    staging = os.path.join(path, f".staging-{txn}")
    merged.write.parquet(staging)
    # carry forward the TRANSITIVE superseded-name record: the sources'
    # own supersedes lists die with the source dirs, but a once-committed
    # append txn must stay recorded forever or a streaming trigger
    # replayed after compaction would re-append its batch (duplicates)
    record = sorted(set(flat + segs) | _superseded_names(sig_dir))
    with open(os.path.join(staging, "_supersedes.json"), "w") as f:
        json.dump({"supersedes": record}, f)
        f.flush()
        os.fsync(f.fileno())
    for p in glob.glob(os.path.join(staging, "*")):
        _index_fsync(p)
    _index_fsync(staging)
    seg = os.path.join(sig_dir, f"seg-{txn}")
    os.rename(staging, seg)
    _index_fsync(sig_dir)
    _sweep_superseded_segments(sig_dir)
    return spark.read.parquet(seg).count()


def minhash_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    k: int = 32,
    bands: int = 8,
    overwrite: bool = False,
    sigs: DataFrame | None = None,
) -> int:
    """Persist the corpus's MinHash state — (doc_id, shingles, signature)
    parquet plus a params sidecar. Crash-safe like the offline store: the
    signature parquet is written to a staging dir and renamed into place,
    and ``params.json`` (atomic rename) is the COMMIT MARKER — a
    ``signatures`` dir without it is an uncommitted leftover that the next
    write sweeps before retrying, so an interrupted write never bricks
    the path. ``bands`` is recorded because bucket identity depends on it
    (:func:`_minhash_bands`); the query path reads it back, so writer and
    every reader band identically by construction.

    This is the INCREMENTAL dedup pattern at 100 TB: the corpus is
    shingled and signed ONCE; every daily increment is checked against
    the stored signatures (:func:`minhash_index_query`) without
    re-reading, re-shingling or re-hashing a byte of corpus text.
    Returns the indexed row count.

    A COMMITTED index at ``path`` fails fast (before any Spark job runs)
    unless ``overwrite=True``, which demotes the old index to an
    uncommitted leftover (marker removed first — readers racing the
    overwrite see either the old committed index or a retryable absent
    one, never a half-rebuilt mix) and rebuilds.

    ``sigs`` — a precomputed :func:`minhash_signatures` frame for (a
    superset of) ``df``; it is semi-joined down to exactly ``df``'s ids
    before persisting. CALLER'S CONTRACT (same as
    :func:`minhash_index_query`): the frame must have been built with
    THIS call's ``n_shingle``/``k`` — the frame cannot carry its own
    provenance. Skips the corpus's shingle+sign text scan: a composing
    build whose dedup stage already signed the pool persists those
    signatures instead of re-shingling every surviving byte (§6 avoid
    recompute)."""
    import json
    import os
    import shutil
    import uuid

    import glob

    if not 1 <= bands <= k or k % bands:
        # validate BEFORE persisting: params.json records bands for the
        # index's whole lifetime, and a degenerate value would fail (or
        # silently empty) every future query instead of this one write
        raise ValueError(f"bands={bands} must divide k={k} (1 <= bands <= k)")
    sig_dir = os.path.join(path, "signatures")
    marker = os.path.join(path, "params.json")
    _prepare_index_dir(sig_dir, marker, overwrite)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    try:
        sig_frame = (
            minhash_signatures(df, text_col, id_col, n_shingle, k)
            if sigs is None
            else sigs.join(
                df.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
            )
        )
        sig_frame, n_rows = _content_sized(sig_frame)
        sig_frame.write.parquet(staging)
        # the params.json marker below is explicitly fsynced — the data it
        # marks committed must be at least as durable (same discipline as
        # _append_index_segment): fsync the staged files and dir before
        # the rename, and the parent after
        for f in glob.glob(os.path.join(staging, "*")):
            _index_fsync(f)
        _index_fsync(staging)
        os.rename(staging, sig_dir)
        _index_fsync(path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    tmp = os.path.join(path, ".params.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "n_shingle": int(n_shingle),
                "k": int(k),
                "bands": int(bands),
                # shingle column format: distinct xxhash64 keys, not strings
                # (minhash_signatures) — queries validate before joining
                "shingle_format": "xxhash64-set",
            },
            f,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)
    return n_rows  # counted once off the cached frame the write read


def minhash_index_query(
    spark,
    new_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_bucket: int = 1000,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs BETWEEN an increment and a
    :func:`minhash_index_write` corpus — cross pairs only (new×new dups
    are one :func:`minhash_near_dup_pairs` call over the increment).
    Returns ``(new_id, corpus_id, jaccard)``.

    ``sigs`` — a precomputed :func:`minhash_signatures` frame for (a
    superset of) the increment. CALLER'S CONTRACT: it must have been
    built with THIS index's stored ``n_shingle``/``k`` (check
    ``params.json`` before passing — the frame cannot carry its own
    provenance); band hashing stays bit-identical either way because
    bands are derived here from the stored params. Skips the
    increment's signature text scan.

    Plan shape: the increment is signed fresh with the INDEX's stored
    params — including ``bands``, so band hashing is bit-identical to the
    writer's by construction. The corpus band rows are first semi-joined
    to the increment's (band, bucket) keys — at 100 TB the corpus-side
    aggregation input shrinks from every corpus band row to only the
    buckets the increment actually collides with — then ONE banded
    ``collect_set`` pass builds the surviving buckets. The hot-bucket cap
    is applied to the COMBINED (corpus + increment) bucket population, so
    it drops exactly the buckets the batch route over corpus∪increment
    would drop — the cross-pair agreement with
    :func:`minhash_near_dup_pairs` holds cap-for-cap, not only with caps
    disabled. The verify reads the shingle column at candidate
    cardinality; corpus TEXT is never touched."""
    import json
    import os

    with open(os.path.join(path, "params.json")) as f:
        params = json.load(f)
    if params.get("shingle_format") != "xxhash64-set":
        raise ValueError(
            f"minhash index at {path} was written by an older version "
            "(string shingles); rebuild it with minhash_index_write(..., "
            "overwrite=True) before querying"
        )
    k, bands = params["k"], params["bands"]
    corpus_sigs = _read_index_signatures(spark, path)
    if sigs is None:
        new_sigs = _cache_scoped(
            minhash_signatures(new_df, text_col, id_col, params["n_shingle"], k)
        )
    else:
        new_sigs = sigs.join(
            new_df.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
        )
    nb = _minhash_bands(new_sigs, k, bands).withColumnRenamed("doc_id", "new_id")
    nb_counts = nb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n_new"))
    buckets = (
        _minhash_bands(corpus_sigs, k, bands)
        .join(nb_counts.select("band", "bucket"), ["band", "bucket"], "left_semi")
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    cands = (
        buckets.join(nb_counts, ["band", "bucket"])
        .filter(F.size("ids") + F.col("n_new") <= max_bucket)
        .join(nb, ["band", "bucket"])
        .select("new_id", F.explode("ids").alias("corpus_id"))
        .distinct()
    )
    sh_new = new_sigs.select(F.col("doc_id").alias("new_id"), F.col("shingles").alias("sh_n"))
    sh_old = corpus_sigs.select(
        F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("sh_c")
    )
    return (
        cands.join(sh_new, "new_id")
        .join(sh_old, "corpus_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_n", "sh_c"))
            / F.size(F.array_union("sh_n", "sh_c")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_index_append(
    new_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    txn: str | None = None,
    sigs: DataFrame | None = None,
) -> int:
    """Fold an increment INTO a persisted MinHash index — the maintenance
    half of the incremental-dedup loop (:func:`minhash_index_query` finds
    today's duplicates against the corpus; the survivors are appended so
    TOMORROW's increment checks against corpus + today, with no index
    rebuild — at 100 TB a rebuild is a full corpus re-shingle, an append
    is one increment-sized pass).

    The increment is signed with the INDEX's stored params (including the
    hashed-shingle format — writer and every reader stay bit-identical by
    construction) and committed as one atomically-renamed segment
    (:func:`_append_index_segment`): crash-safe at any kill point,
    lost-update-free under concurrent appends. No doc_id uniqueness is
    enforced (same contract as the batch routes) — the intended flow
    appends only documents that passed the dedup gate. Returns the
    appended row count.

    ``sigs`` — a precomputed :func:`minhash_signatures` frame for (a
    superset of) the increment, semi-joined down to ``new_df``'s ids
    before the append. CALLER'S CONTRACT (same as
    :func:`minhash_index_query`): the frame must have been built with
    this index's stored ``n_shingle``/``k`` — check ``params.json``
    before passing. Skips the increment's re-shingle text scan when the
    dedup pass that gated it already signed the same documents."""
    import json
    import os

    with open(os.path.join(path, "params.json")) as f:
        params = json.load(f)
    if params.get("shingle_format") != "xxhash64-set":
        raise ValueError(
            f"minhash index at {path} was written by an older version "
            "(string shingles); rebuild it with minhash_index_write(..., "
            "overwrite=True) before appending"
        )
    if sigs is None:
        sigs = minhash_signatures(
            new_df, text_col, id_col, params["n_shingle"], params["k"]
        )
    else:
        sigs = sigs.join(
            new_df.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
        )
    return _append_index_segment(sigs, path, txn)


def simhash_index_append(
    new_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    txn: str | None = None,
) -> int:
    """Fold an increment INTO a persisted SimHash index — same
    maintenance contract as :func:`minhash_index_append` (atomic segment
    commit, concurrent-append safe, no rebuild). The increment is signed
    at the index's STORED width, so the Hamming-radius semantics never
    drift no matter how many appends accumulate. Returns the appended
    row count."""
    import json
    import os

    with open(os.path.join(path, "params.json")) as f:
        params = json.load(f)
    sigs = simhash_signatures(new_df, text_col, id_col, params["bits"])
    return _append_index_segment(sigs, path, txn)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------



def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 64
) -> DataFrame:
    """SimHash over unigram tokens (count-weighted): explode tokens, hash
    each once per 64-bit word, then ``bits`` conditional sums in ONE
    aggregation (single shuffle per doc key — no per-bit passes).

    ``bits`` must be a multiple of 64. The default 64 returns the long
    ``simhash`` column (unchanged contract, word 0 hashed exactly as
    before); wider fingerprints return ``simhash: array<long>`` of
    bits/64 words, word w > 0 drawn from an independent ``xxhash64``
    seeded with w. Wider fingerprints are the corpus-scale path: the
    pigeonhole bands in :func:`simhash_near_dup_pairs` get bits/(d+1)
    wide, and random band collisions fall off as 2^-width (at 64 bits /
    4 bands the 16-bit birthday term makes candidates superlinear past
    ~10⁶ docs — measured alpha 1.13 in tools/scale_check.py; at 128
    bits the same bands are 32-wide and the term is negligible to
    ~10⁹)."""
    if bits <= 0 or bits % 64:
        raise ValueError("bits must be a positive multiple of 64")
    n_words = bits // 64
    # deliberately NOT _spread_small_input — decision re-made round 9 on
    # INTERLEAVED in-harness A/B (spread toggled per-rep inside one
    # session, so session drift cancels — SCALING.md "SimHash spread"):
    # spread ON is a wash to slightly WORSE (64-bit medians ~3.3s on vs
    # ~3.0s off at sf0.1; 128-bit within noise). Unlike the
    # shingle/k-minhash routes, this map stage is one cheap pipelined
    # codegen pass whose real work the groupBy(doc_id) shuffle already
    # distributes, so the up-front text repartition only adds a shuffle.
    # The r8 bench regression attributed to this removal was session
    # cache-window state, not the spread (see SCALING.md).
    # explode_OUTER: a zero-token (empty/NULL text) document must still get
    # a signature row — plain explode silently dropped it, so an index
    # write returned fewer rows than the corpus, _auto_simhash_bits sized
    # from a count the index didn't hold, and the simhash and minhash
    # indexes disagreed on which documents exist. The outer row's NULL
    # token hashes to xxhash64's null-input constant, so every empty doc
    # gets the SAME deterministic signature (empty == empty, the minhash
    # route's verdict) — deliberately with NO special-case branch in the
    # bit sums below: a 3-branch when() was measured +20-30% on this
    # 64-256-conditional-sum aggregation, the module's hottest expression.
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens_col(F.col(text_col))).alias("tok"),
    ).select(
        "doc_id",
        *[
            (F.xxhash64("tok") if w == 0 else F.xxhash64(F.lit(w), "tok")).alias(f"h{w}")
            for w in range(n_words)
        ],
    )
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(f"h{w}", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{w}_{b}")
            for w in range(n_words)
            for b in range(64)
        ]
    )
    words = []
    for w in range(n_words):
        sig = None
        for b in range(64):
            bit = (1 << b) if b < 63 else -(1 << 63)  # two's-complement long literal
            term = F.when(F.col(f"s{w}_{b}") > 0, F.lit(bit).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            sig = term if sig is None else sig.bitwiseOR(term)
        words.append(sig)
    out = words[0] if n_words == 1 else F.array(*words)
    return bit_sums.select("doc_id", out.alias("simhash"))


def _auto_simhash_bits(n_rows: int, max_hamming: int) -> int:
    """Fingerprint width for a corpus of ``n_rows``: each pigeonhole band
    must be ≥ ceil(log2 N) + 1 bits so the random band-collision
    ("birthday") candidate mass N²·(d+1)/2^width stays ~linear in N — the
    same discipline as :func:`_auto_planes` for sign-LSH (the r5 fix that
    took measured α from 2.00 to 1.17). Rounded up to the next multiple
    of 64 (the signature word size), floored at 64, and capped at the
    widest fingerprint whose bands still fit one 64-bit word."""
    import math

    nb = max_hamming + 1
    width = math.ceil(math.log2(max(n_rows, 2))) + 1
    bits = 64 * max(1, math.ceil(width * nb / 64))
    return min(bits, 64 * nb)  # 64·(d+1) = exact 64-bit bands, the widest legal


def _simhash_bands(sigs: DataFrame, bits: int, max_hamming: int) -> DataFrame:
    """(doc_id, band, bucket) pigeonhole-band rows for ``bits``-wide
    fingerprints split into max_hamming+1 bands — shared by the batch pair
    route and the persisted index's query path (identical band extraction,
    so candidates agree)."""
    nb = max_hamming + 1
    width = bits // nb
    n_words = bits // 64
    words = (
        [F.col("simhash")]
        if n_words == 1
        else [F.col("simhash")[i] for i in range(n_words)]
    )

    def band(b: int) -> Column:
        start = b * width
        w = width + (bits % nb if b == nb - 1 else 0)
        i, off = start // 64, start % 64
        val = F.shiftrightunsigned(words[i], off)
        avail = 64 - off
        if w > avail:  # band straddles a word boundary
            val = val.bitwiseOR(F.shiftleft(words[i + 1], avail))
        mask = F.lit(-1).cast("long") if w >= 64 else F.lit((1 << w) - 1).cast("long")
        return val.bitwiseAND(mask)

    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band(b).alias("bucket"))
                    for b in range(nb)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def _hamming_col(bits: int, a: str, b: str) -> Column:
    n_words = bits // 64
    if n_words == 1:
        return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))
    h = None
    for i in range(n_words):
        term = F.bit_count(F.col(a)[i].bitwiseXOR(F.col(b)[i]))
        h = term if h is None else h + term
    return h


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 10000,
    stage: str = "pairs",
    bits: int | None = None,
) -> DataFrame:
    """All pairs within Hamming distance ``max_hamming`` of each other's
    SimHash. Pigeonhole banding: split 64 bits into (d+1) bands — any pair
    within distance d agrees exactly on ≥1 band → candidates come from
    bucket grouping, verified with bit_count(xor).

    Buckets larger than ``max_bucket`` are skipped (same capped
    collect_set pattern as :func:`minhash_near_dup_pairs`): one hot bucket
    — boilerplate-identical or empty documents all hashing to the same
    band value — would otherwise make candidate generation quadratic. The
    cap trades those pathological buckets' recall for a bounded plan; at
    100 TB the skipped mass is exactly-identical content that
    :func:`exact_dedup` removes first anyway.

    ``stage="candidates"`` returns the distinct banded candidate pairs
    before the bit_count(xor) verify (scale-audit surface).

    ``bits`` (``None`` = auto, else a multiple of 64 — see
    :func:`simhash_signatures`) widens the fingerprint; bands become
    bits/(d+1) wide, so the random band-collision ("birthday") candidate
    mass falls by 2^-extra_width. The default derives the width from the
    corpus count (:func:`_auto_simhash_bits` — one column-pruned count
    job): 64-bit under ~32k docs, 128-bit beyond, wider still past ~10⁸ —
    the same corpus-scaled discipline as the embedding route's
    ``n_planes=None``, so callers never pay 256 conditional sums on a
    small corpus nor a quadratic birthday term on a large one. Each band
    must fit one 64-bit word: bits/(max_hamming+1) must be ≤ 64.

    Semantic caveat of auto width: expected Hamming distance between two
    documents grows with ``bits``, so a FIXED ``max_hamming`` radius over
    a wider fingerprint is a stricter relative similarity threshold — a
    corpus crossing the auto switchover reports fewer (higher-similarity)
    pairs than it would at the narrower width. Callers needing one fixed
    pair semantics across corpus sizes should pin ``bits`` explicitly
    (measured within-width growth: α_candidates 0.92 at 128-bit vs 1.13
    at 64-bit — SCALING.md "Measured growth")."""
    if bits is None:
        bits = _auto_simhash_bits(df.count(), max_hamming)
    nb = max_hamming + 1
    width = bits // nb
    if width + bits % nb > 64:
        raise ValueError(
            "each pigeonhole band must fit in 64 bits: "
            f"bits={bits} over {nb} bands is {width}+{bits % nb} wide"
        )
    sigs = _cache_scoped(simhash_signatures(df, text_col, id_col, bits))
    banded = _simhash_bands(sigs, bits, max_hamming)

    # in-bucket sorted-id pair generation, skipping buckets above the cap
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    cands = _bucket_pairs(buckets, "doc_id_a", "doc_id_b")
    if stage == "candidates":
        return cands

    sg = sigs.select("doc_id", "simhash")
    hamming = _hamming_col(bits, "sh_a", "sh_b")
    return (
        cands.join(sg.withColumnsRenamed({"doc_id": "doc_id_a", "simhash": "sh_a"}), "doc_id_a")
        .join(sg.withColumnsRenamed({"doc_id": "doc_id_b", "simhash": "sh_b"}), "doc_id_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", F.col("hamming").cast("long").alias("hamming"))
    )


def simhash_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int | None = None,
    overwrite: bool = False,
) -> int:
    """Persist the corpus's SimHash state — (doc_id, simhash) parquet plus
    a params sidecar — with the same staged-rename + commit-marker
    protocol as :func:`minhash_index_write` (an interrupted write leaves a
    retryable path, never a half-visible index). ``bits=None`` derives the
    width from the corpus count once, AT WRITE TIME, and records it: every
    increment is then signed at the stored width, so the Hamming-radius
    semantics stay fixed for the index's lifetime no matter how small the
    increments are. ``max_hamming`` is recorded too — band extraction
    depends on it, so writer and readers band identically by
    construction. Returns the indexed row count.

    An explicit ``bits`` is validated against the same band-fit rule as
    :func:`simhash_near_dup_pairs` (bits/(max_hamming+1) ≤ 64) BEFORE
    anything is written — an illegal width recorded in params.json would
    otherwise silently degrade bucket selectivity (truncated bands) for
    the index's whole lifetime. A COMMITTED index at ``path`` fails fast
    unless ``overwrite=True`` (same contract as
    :func:`minhash_index_write`)."""
    import json
    import os
    import shutil
    import uuid

    if bits is None:
        bits = _auto_simhash_bits(df.count(), max_hamming)
    nb = max_hamming + 1
    if bits // nb + bits % nb > 64:
        raise ValueError(
            "each pigeonhole band must fit in 64 bits: "
            f"bits={bits} over {nb} bands is {bits // nb}+{bits % nb} wide"
        )
    sig_dir = os.path.join(path, "signatures")
    marker = os.path.join(path, "params.json")
    _prepare_index_dir(sig_dir, marker, overwrite)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    try:
        sigs, n_rows = _content_sized(simhash_signatures(df, text_col, id_col, bits))
        sigs.write.parquet(staging)
        # fsync before the fsynced marker commits (see minhash_index_write)
        import glob as _glob

        for f in _glob.glob(os.path.join(staging, "*")):
            _index_fsync(f)
        _index_fsync(staging)
        os.rename(staging, sig_dir)
        _index_fsync(path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    tmp = os.path.join(path, ".params.tmp")
    with open(tmp, "w") as f:
        json.dump({"bits": int(bits), "max_hamming": int(max_hamming)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)
    return n_rows  # counted once off the cached frame the write read


def simhash_index_query(
    spark,
    new_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 10000,
) -> DataFrame:
    """Pairs within the index's Hamming radius BETWEEN an increment and a
    :func:`simhash_index_write` corpus — cross pairs only (new×new via
    :func:`simhash_near_dup_pairs`). Returns
    ``(new_id, corpus_id, hamming)``.

    Same single-pass shape as :func:`minhash_index_query`: the increment
    is signed at the INDEX's stored width (fixed semantics), the corpus
    band rows are semi-join-pruned to the increment's colliding buckets
    before the one capped banded aggregation, and the hot-bucket cap is
    applied to the COMBINED (corpus + increment) bucket population — the
    same buckets the batch route over corpus∪increment would drop, so
    cross-pair agreement with :func:`simhash_near_dup_pairs` holds
    cap-for-cap (pigeonhole exhaustiveness holds everywhere else). The
    bit_count(xor) verify joins signatures back at candidate
    cardinality. Corpus text is never touched."""
    import json
    import os

    with open(os.path.join(path, "params.json")) as f:
        params = json.load(f)
    bits, max_hamming = params["bits"], params["max_hamming"]
    corpus_sigs = _read_index_signatures(spark, path)
    new_sigs = _cache_scoped(simhash_signatures(new_df, text_col, id_col, bits))
    nb = _simhash_bands(new_sigs, bits, max_hamming).withColumnRenamed(
        "doc_id", "new_id"
    )
    nb_counts = nb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n_new"))
    buckets = (
        _simhash_bands(corpus_sigs, bits, max_hamming)
        .join(nb_counts.select("band", "bucket"), ["band", "bucket"], "left_semi")
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
    )
    cands = (
        buckets.join(nb_counts, ["band", "bucket"])
        .filter(F.size("ids") + F.col("n_new") <= max_bucket)
        .join(nb, ["band", "bucket"])
        .select("new_id", F.explode("ids").alias("corpus_id"))
        .distinct()
    )
    sg_new = new_sigs.select(F.col("doc_id").alias("new_id"), F.col("simhash").alias("sh_a"))
    sg_old = corpus_sigs.select(
        F.col("doc_id").alias("corpus_id"), F.col("simhash").alias("sh_b")
    )
    return (
        cands.join(sg_new, "new_id")
        .join(sg_old, "corpus_id")
        .withColumn("hamming", _hamming_col(bits, "sh_a", "sh_b"))
        .filter(F.col("hamming") <= max_hamming)
        .select("new_id", "corpus_id", F.col("hamming").cast("long").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (blocked) & embedding near-dup
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    candidates: str = "shingle",
    max_posting: int | None = 10000,
    stage: str = "pairs",
) -> DataFrame:
    """Exact word-n-gram Jaccard pairs above ``threshold``.

    Candidate routes:

    * ``"shingle"`` (default) — inverted-index join: any pair with
      jaccard ≥ threshold > 0 shares at least one shingle, so candidates
      come from an equi-join of the exploded (block, shingle) posting
      lists — EXACT, and never compares two documents with disjoint
      shingle sets. The shuffle is keyed on the shingle, so hot shingles
      parallelize across reducers instead of melting one task.
      ``max_posting`` (default 10000, mirroring ``max_bucket`` in the
      MinHash/SimHash/embedding paths) drops shingles whose posting list
      exceeds the cap — stopword-shingle armor at corpus scale, since an
      uncapped posting list of length p emits p²/2 candidate pairs.
      Below the cap the result is EXACT; above it, approximate —
      qualifying pairs whose ONLY shared shingles are capped ones are
      lost (route such corpora through MinHash verify, or pass
      ``max_posting=None`` to force the unbounded exact join).
    * ``"block"`` — all pairs inside each ``block_col`` group (quadratic
      inside blocks; only for small, selective blocks or oracle parity).

    ``block_col`` ANDs into either route. MinHash is the sub-linear
    unblocked scale path when exactness isn't required.

    ``stage="candidates"`` (shingle route only) returns the distinct
    shared-shingle candidate pairs before the exact-Jaccard verify
    (scale-audit surface). The block route has no candidate stage, so
    combining it with ``stage="candidates"`` raises rather than silently
    returning verified 3-column pairs into a scale audit."""
    if stage == "candidates" and candidates != "shingle":
        raise ValueError(
            "stage='candidates' requires the shingle candidate route; "
            f"candidates={candidates!r} has no candidate stage"
        )
    # tokens behind their own projection boundary first — word_ngrams_col's
    # lambda slices its token argument per element and an inline tokenizer
    # there re-runs per shingle position (the minhash_signatures fix)
    sh = _spread_small_input(df).select(
        F.col(id_col).alias("doc_id"),
        (F.col(block_col) if block_col else F.lit(1)).alias("block"),
        tokens_col(F.col(text_col)).alias("__toks"),
    ).select("doc_id", "block", word_ngrams_col(F.col("__toks"), n).alias("sh"))
    if candidates == "shingle":
        if threshold <= 0:
            raise ValueError("shingle candidates require threshold > 0")
        sh = _cache_scoped(sh)
        posts = sh.select("doc_id", "block", F.explode("sh").alias("shingle"))
        # The verify never joins shingle ARRAYS back to the pairs: because
        # per-doc shingles are distinct (word_ngrams_col), the number of
        # times a pair co-occurs across posting lists IS |A ∩ B|, so exact
        # Jaccard = c / (|A| + |B| - c) falls out of the candidate
        # generation itself. Only the per-doc list of CAPPED shingles (the
        # handful of stopword shingles whose postings exceed max_posting —
        # excluded from pair generation, hence from the multiplicity) is
        # joined back, and that list is tiny per doc. Measured at sf0.1:
        # the full-array verify join was ~3/4 of this route's runtime.
        if max_posting is not None:
            grouped = posts.groupBy("block", "shingle").agg(
                F.sort_array(F.collect_set("doc_id")).alias("ids")
            )
            kept = grouped.filter((F.size("ids") >= 2) & (F.size("ids") <= max_posting))
            # multiplicity preserved: pair count across postings = |A ∩ B|
            occurrences = _bucket_pairs(kept, "doc_id_a", "doc_id_b", distinct=False)
            capped_sh = grouped.filter(F.size("ids") > max_posting).select(
                "block", "shingle"
            )
            doc_capped = (
                posts.join(capped_sh, ["block", "shingle"])
                .groupBy("doc_id")
                .agg(F.sort_array(F.collect_set("shingle")).alias("capped"))
            )
        else:
            pa, pb = posts.alias("pa"), posts.alias("pb")
            occurrences = pa.join(
                pb,
                (F.col("pa.block") == F.col("pb.block"))
                & (F.col("pa.shingle") == F.col("pb.shingle"))
                & (F.col("pa.doc_id") < F.col("pb.doc_id")),
            ).select(
                F.col("pa.doc_id").alias("doc_id_a"),
                F.col("pb.doc_id").alias("doc_id_b"),
            )
            doc_capped = None
        counted = occurrences.groupBy("doc_id_a", "doc_id_b").agg(
            F.count(F.lit(1)).alias("shared")
        )
        if stage == "candidates":
            return counted.select("doc_id_a", "doc_id_b")
        doc_info = sh.select("doc_id", F.size("sh").alias("n_sh"))
        if doc_capped is not None:
            empty = F.array().cast("array<string>")
            doc_info = doc_info.join(doc_capped, "doc_id", "left").select(
                "doc_id", "n_sh", F.coalesce("capped", empty).alias("capped")
            )
        else:
            doc_info = doc_info.withColumn("capped", F.array().cast("array<string>"))
        ia = doc_info.withColumnsRenamed(
            {"doc_id": "doc_id_a", "n_sh": "n_a", "capped": "cap_a"}
        )
        ib = doc_info.withColumnsRenamed(
            {"doc_id": "doc_id_b", "n_sh": "n_b", "capped": "cap_b"}
        )
        return (
            counted.join(ia, "doc_id_a")
            .join(ib, "doc_id_b")
            .withColumn(
                "c", F.col("shared") + F.size(F.array_intersect("cap_a", "cap_b"))
            )
            .withColumn("jaccard", F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard"))
        )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a.sh", "b.sh")) / F.size(F.array_union("a.sh", "b.sh")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def _auto_planes(n_rows: int) -> int:
    """Sign-LSH signature width for a corpus of ``n_rows``:
    clamp(ceil(log2 N) + 1, 10, 24). Width growing with log N is what
    keeps the random-bulk candidate mass ~linear in N (see
    :func:`embedding_near_dup_pairs`); the clamp floors tiny corpora at
    the tested 10-bit width and caps at 24 bits, past which recall at
    fixed n_tables degrades and ``n_tables`` should scale instead."""
    import math

    return max(10, min(24, math.ceil(math.log2(max(n_rows, 2))) + 1))


def _auto_tables(n_rows: int) -> int:
    """Sign-LSH table count for a corpus of ``n_rows``: 8 through ~10⁷
    rows (the regime where auto width r = ceil(log2 N)+1 is still below
    its 24-bit clamp and measured recall at near-dup thresholds is
    ≥ 0.99), then +4 per decade, capped at 24. Past the width clamp the
    per-table collision probability for TRUE near-dups stops rising with
    N, so holding recall requires more independent tables — the published
    multi-table LSH tradeoff. Each table is one more signature column and
    one more bucket emission per row (linear cost)."""
    import math

    if n_rows <= 10_000_000:
        return 8
    return min(24, 8 + 4 * math.ceil(math.log10(n_rows / 10_000_000)))


def _einsum_verify(
    v2: DataFrame,
    pairs: DataFrame,
    threshold: float,
    broadcast_verify_max_rows: int,
    n_rows: int,
):
    """Exact-cosine verify of candidate id pairs, vectorized: the
    candidate set at aggressive thresholds is a large fraction of all
    pairs, so per-pair SQL higher-order-function cosine dominates the
    runtime (measured at sf0.1, 745k candidates: 4.8s HOF vs 0.9s numpy
    einsum). ``v2`` is one (vid, v) row per vector; ``pairs`` is
    (vid_a, vid_b). Two routes, same pairs and same exactness:

    * broadcast (corpus ≤ broadcast_verify_max_rows, default 200k ≈
      100 MB at 64-d float64): normalized matrix broadcast once, the
      pairs frame stays two ids wide, cosines come from indexed
      einsum — no vector ever ships per pair (measured 2.7s vs 3.9s
      join route at sf0.1, same 125 pairs).
    * join (the 100 TB path): two equi-joins attach vectors to
      pairs, then the same einsum per Arrow batch."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    verify_schema = T.StructType(
        [
            T.StructField("vec_id_a", v2.schema["vid"].dataType),
            T.StructField("vec_id_b", v2.schema["vid"].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def _norm(mat):
        with np.errstate(divide="ignore", invalid="ignore"):
            return mat / np.linalg.norm(mat, axis=1, keepdims=True)

    if broadcast_verify_max_rows and n_rows <= broadcast_verify_max_rows:
        vp = v2.toPandas()
        mat = _norm(np.vstack(vp["v"].to_numpy()).astype(np.float64))
        index = dict(zip(vp["vid"], range(len(vp))))
        b_mat = _broadcast_scoped(v2.sparkSession.sparkContext.broadcast(mat))
        b_idx = _broadcast_scoped(v2.sparkSession.sparkContext.broadcast(index))

        def verify_bcast(batches):
            mat_, idx_ = b_mat.value, b_idx.value
            for p in batches:
                if len(p) == 0:
                    continue
                ra = p["vid_a"].map(idx_).to_numpy(dtype=np.int64)
                rb = p["vid_b"].map(idx_).to_numpy(dtype=np.int64)
                cos = np.einsum("ij,ij->i", mat_[ra], mat_[rb])
                # NaN (zero-norm input) compares False, like cosine_col's
                # NULL; threshold applies to the UNROUNDED value, rounding
                # is display-only — both exactly as the HOF verify did
                keep = cos >= threshold
                yield pd.DataFrame(
                    {
                        "vec_id_a": p["vid_a"][keep],
                        "vec_id_b": p["vid_b"][keep],
                        "cosine": np.round(cos[keep], 6),
                    }
                )

        return pairs.mapInPandas(verify_bcast, schema=verify_schema)

    va = v2.select(F.col("vid").alias("vid_a"), F.col("v").alias("v_a"))
    vb = v2.select(F.col("vid").alias("vid_b"), F.col("v").alias("v_b"))

    def verify_join(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # float64 like the broadcast route (and like the SQL-double
            # HOF verify) — float32 embeddings would otherwise leave
            # float32 artifacts in the rounded cosine
            a = _norm(np.vstack(pdf["v_a"].to_numpy()).astype(np.float64))
            b = _norm(np.vstack(pdf["v_b"].to_numpy()).astype(np.float64))
            cos = np.einsum("ij,ij->i", a, b)
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "vec_id_a": pdf["vid_a"][keep],
                    "vec_id_b": pdf["vid_b"][keep],
                    "cosine": np.round(cos[keep], 6),
                }
            )

    return (
        pairs.join(va, "vid_a")
        .join(vb, "vid_b")
        .mapInPandas(verify_join, schema=verify_schema)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_col: str | None = None,
    candidates: str = "lsh",
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
    max_bucket: int = 10000,
    broadcast_verify_max_rows: int = 200_000,
    stage: str = "pairs",
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    Candidate routes:

    * ``"lsh"`` (default, the 100 TB path) — multi-table sign-LSH:
      ``n_tables`` independent ``n_planes``-bit signatures per vector
      (ONE Arrow-batched pass, same plane construction as
      :func:`..operators.similarity.assign_lsh_buckets`), each vector
      emitted into its exact bucket plus every Hamming-1 probe bucket
      (so two vectors collide when their table signature differs in ≤ 2
      bits), capped in-bucket pair generation (``max_bucket``, same
      pattern as :func:`minhash_near_dup_pairs`), exact cosine verify.
      No unbucketed self-join anywhere.

      ``n_planes=None`` (default) auto-scales the signature width with
      the corpus: r = clamp(ceil(log2 N) + 1, 10, 24). This is the LSH
      sub-quadratic discipline — at fixed width r the random bulk
      collides with probability ≈ n_tables·C(r,≤2)/2^r, a CONSTANT, so
      candidate mass grows as N² no matter how the buckets are capped
      (measured via tools/scale_check.py: 37% of all pairs at r=10,
      every corpus size). With r ≈ log2 N the same mass is
      ≈ n_tables·r²/2 · N — linear up to the log² factor — while
      near-dup recall at real thresholds stays ≈ 1 (per-table ≤2-bit
      match at cosine 0.9 is ≥ 0.6 for r ≤ 15, and a pair is missed
      only when ALL 8 tables miss: < 1e-3). ``n_tables=None`` (default)
      scales the table count the same way (:func:`_auto_tables`): 8
      through ~10⁷ rows, +4 per decade beyond, cap 24 — past the 24-bit
      width clamp, recall at FIXED tables degrades as r grows, so tables
      take over as the recall lever.

      Approximate: recall vs the all-pairs truth is pinned ≥ 0.95 at
      sf0.01 in tests; at real near-dup thresholds (≥ 0.9) the default
      collides near-dups with probability ≈ 1. Measured at sf0.1
      (2000×64-d vectors, threshold 0.45 — adversarially deep in the
      random-cosine bulk): 2.7s vs 84.7s all-pairs, recall 0.87; the
      recall gap exists only in that bulk regime, not at near-dup
      thresholds, and the all-pairs gap grows quadratically with corpus
      size. The exact-cosine verify is numpy-vectorized (einsum per
      Arrow batch) with a size-gated broadcast fast path — see the
      inline comment at the verify stage.
    * ``"all"`` — the exact quadratic self-join; oracle-parity/small-
      input mode only.

    Passing ``block_col`` uses the blocked-quadratic form (exact inside
    blocks) regardless of ``candidates`` — ``n_planes``/``n_tables`` are
    ignored on that route (no LSH is built, so the auto width never sees
    the per-block populations; callers wanting LSH *within* large blocks
    should run the lsh route per block, sizing ``n_planes`` from the
    block's own count).

    ``stage="candidates"`` (lsh route only) returns the distinct LSH
    candidate pairs before the exact-cosine verify (scale-audit
    surface); combining it with the ``"all"`` route or ``block_col``
    raises — those routes have no candidate stage, and silently
    returning verified 3-column pairs would corrupt a scale audit.

    ``n_rows_hint`` — the EXACT distinct-``id_col`` count of ``df``,
    when the caller already knows it: skips the counting job the lsh
    route's auto width and the blocked route's verify gate otherwise
    pay (on the blocked route the count re-executes the dropDuplicates
    shuffle, so the hint removes a full extra pass). Plan-affecting on
    the lsh route (width/tables derive from it) — an approximate value
    silently changes which pairs are generated; pass it only when it is
    the true count."""
    if stage == "candidates" and (block_col is not None or candidates != "lsh"):
        raise ValueError(
            "stage='candidates' requires the lsh candidate route "
            "(candidates='lsh', block_col=None); this route has no candidate stage"
        )
    v = df.select(
        F.col(id_col).alias("vid"),
        (F.col(block_col) if block_col else F.lit(1)).alias("block"),
        F.col(vec_col).alias("v"),
    )
    if block_col is None and candidates == "lsh":
        import numpy as np

        from .similarity import _planes

        n_rows = n_rows_hint if n_rows_hint is not None else v.count()
        if n_planes is None:
            n_planes = _auto_planes(n_rows)
        if n_tables is None:
            n_tables = _auto_tables(n_rows)

        def mapper(batches):
            import pandas as pd

            planes = None  # built from the observed dim; deterministic in
            for pdf in batches:  # (dim, n_planes, seed) so identical on every worker
                if len(pdf) == 0:
                    continue
                mat = np.vstack(pdf["v"].to_numpy())  # (rows, dim)
                if planes is None:
                    planes = np.vstack(
                        [_planes(mat.shape[1], n_planes, seed + t) for t in range(n_tables)]
                    )
                bits = (mat @ planes.T) > 0  # (rows, n_tables*n_planes)
                sigs = []
                for t in range(n_tables):
                    b = np.zeros(len(pdf), dtype=np.int64)
                    for i in range(n_planes):
                        b |= bits[:, t * n_planes + i].astype(np.int64) << i
                    sigs.append(b)
                yield pd.DataFrame(
                    {"vid": pdf["vid"], "sigs": list(np.stack(sigs, axis=1))}
                )

        from pyspark.sql import types as T

        sig_schema = T.StructType(
            [v.schema["vid"], T.StructField("sigs", T.ArrayType(T.LongType()))]
        )
        sigs = v.select("vid", "v").mapInPandas(mapper, schema=sig_schema)
        banded = sigs.select("vid", F.posexplode("sigs").alias("tbl", "sig"))
        probes = banded.select(
            "vid",
            "tbl",
            F.explode(
                F.array(
                    F.col("sig"),
                    *[F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
                )
            ).alias("bucket"),
        )
        buckets = (
            probes.groupBy("tbl", "bucket")
            .agg(F.sort_array(F.collect_set("vid")).alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
        )
        pairs = _bucket_pairs(buckets, "vid_a", "vid_b")
        if stage == "candidates":
            return pairs.select(
                F.col("vid_a").alias("vec_id_a"), F.col("vid_b").alias("vec_id_b")
            )
        return _einsum_verify(
            v.select("vid", "v"), pairs, threshold, broadcast_verify_max_rows, n_rows
        )
    if block_col is not None:
        # Blocked-quadratic, in two separated stages: the pair-id join
        # carries TWO ids per row (never two 64-d vectors — the old form
        # shipped both vectors through the self-join and paid a per-pair
        # SQL higher-order-function cosine, measured 41s vs 3s at sf0.1
        # under semantic_dedup's top-2 cell blocking), then the shared
        # vectorized einsum verify. A vector assigned to several blocks
        # (semantic_dedup n_assign>1) emits its pair once per shared
        # block, exactly like the old route — callers dedup on the pair
        # key.
        ids = v.select("vid", "block")
        a, b = ids.alias("a"), ids.alias("b")
        pair_ids = a.join(
            b, (F.col("a.block") == F.col("b.block")) & (F.col("a.vid") < F.col("b.vid"))
        ).select(F.col("a.vid").alias("vid_a"), F.col("b.vid").alias("vid_b"))
        v2 = v.select("vid", "v").dropDuplicates(["vid"])
        # the verify gate only needs the DISTINCT vector count; a caller
        # that already knows it (semantic_dedup knows its survivor count)
        # saves one full execution of the dropDuplicates shuffle here —
        # without the hint, v2 runs twice (this count + the verify itself)
        n_v2 = n_rows_hint if n_rows_hint is not None else v2.count()
        return _einsum_verify(
            v2, pair_ids, threshold, broadcast_verify_max_rows, n_v2
        )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.vid") < F.col("b.vid")))
        .withColumn("cosine", cosine_col(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("vec_id_a"),
            F.col("b.vid").alias("vec_id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: train documents sharing any word ``n``-gram
    with the evaluation set, with the count of distinct shared shingles —
    the exact-overlap stage every training-corpus pipeline runs before a
    release (filter = anti-join the result against the corpus).

    Plan shape at 100 TB: the eval side is benchmarks (KBs–MBs), so its
    distinct shingle set BROADCASTS; the corpus side explodes to
    ~words-per-doc shingle rows and the only shuffle is the per-doc count
    aggregation — map-side partial on (doc_id), no corpus self-join
    anywhere. Shingles are deduplicated within each document
    (word_ngrams_col), so n_shared counts distinct shared shingles."""
    def shingles(d: DataFrame) -> DataFrame:
        # tokens projected first — word_ngrams_col's lambda re-evaluates an
        # inline tokenizer per shingle position (the minhash_signatures fix)
        return d.select(
            F.col(id_col).alias("doc_id"),
            tokens_col(F.col(text_col)).alias("__toks"),
        ).select(
            "doc_id",
            F.explode(word_ngrams_col(F.col("__toks"), n)).alias("shingle"),
        )

    ev = shingles(eval_df).select("shingle").distinct()
    return (
        shingles(_spread_small_input(train))
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def bloom_bitset(
    values: DataFrame,
    col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> list[int]:
    """Build a Bloom-filter bitset over a (small) distinct value set, packed
    as ``num_bits / 64`` signed longs — the compact membership summary a
    prefilter ships to every executor as a one-row broadcast relation
    (never as ``F.lit(list)``: that builds a per-row array constructor).

    Construction is one Spark aggregation: each value explodes to its
    ``num_hashes`` bit positions (``xxhash64(value, i) mod num_bits`` — the
    salt literal varies the hash per probe), positions group by 64-bit word,
    and ``bit_or`` folds each word's set bits. The collect is bounded by
    ``num_bits/64`` rows (2,048 longs = 16 KB at the default), NEVER by the
    value count — safe for any eval-set size.

    No false negatives by construction; the false-positive rate for ``n``
    inserted values is ``(1 - e^(-k*n/m))^k`` (~0.0001 at the defaults with
    n=10k). Callers that need exactness confirm survivors with an exact
    join — see :func:`decontaminate_bloom`.
    """
    if num_bits % 64:
        raise ValueError(f"bloom_bitset: num_bits must be a multiple of 64, got {num_bits}")
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )
    words = (
        values.select(F.explode(probes).alias("p"))
        .groupBy(F.shiftright(F.col("p"), 6).alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))"
            ).alias("bits")
        )
        .collect()
    )
    bitset = [0] * (num_bits // 64)
    for r in words:
        bitset[r["w"]] = r["bits"]
    return bitset


def bloom_contains(col: str, bitset_col: str, num_bits: int, num_hashes: int) -> F.Column:
    """All-probes-set membership test against a packed bitset column —
    pure JVM expressions (xxhash64 / shift / mask inside whole-stage
    codegen), no Python in the row path. ``>>`` is arithmetic shift, which
    is safe here: the trailing ``& 1`` masks away sign-extension bits."""
    tests = []
    for i in range(num_hashes):
        p = f"pmod(xxhash64({col}, {i}), {num_bits})"
        tests.append(
            f"((element_at({bitset_col}, CAST({p} DIV 64 AS INT) + 1)"
            f" >> CAST({p} % 64 AS INT)) & 1) = 1"
        )
    return F.expr(" AND ".join(tests))


def _auto_bloom_bits(n_values: int, lo: int = 1 << 17, hi: int = 1 << 22) -> int:
    """Smallest power-of-two bitset ≥ 16 bits/value, clamped to
    [16 KB, 512 KB as bytes] — ~0.2% FPR at k=3 (k·n/m ≈ 0.19 →
    (1-e^-0.19)³). The clamp ceiling keeps the bitset literal small
    enough for plan codegen; above ~250M eval shingles, shard the eval
    set and run the prefilter per shard."""
    bits = lo
    while bits < hi and bits < 16 * max(n_values, 1):
        bits <<= 1
    return bits


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    num_bits: int | None = None,
    num_hashes: int = 3,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom prefilter on the corpus side —
    IDENTICAL results (the Bloom filter has no false negatives, and its
    false positives are removed by the exact confirm join), different
    constant factor at scale.

    Why a second decontamination shape exists: plain ``decontaminate``
    probes every corpus shingle against a broadcast hash relation of the
    full eval shingle SET — fine when benchmarks are KBs, but a large
    held-out suite (every eval benchmark + all validation splits,
    ~10⁷-10⁸ shingles) makes that broadcast relation gigabytes per
    executor. Here each corpus partition instead tests shingles against a
    16-512 KB broadcast bitset sized to the eval count (runtime-filter
    style, the same trick
    Spark's own InjectRuntimeFilter plays with bloom_filter_agg on shuffle
    joins, which SQL doesn't expose for composed plans like this); only
    the surviving ~FPR fraction plus true overlaps reaches the exact
    broadcast semi-join. The corpus-side plan stays map-only until the
    final per-doc count — same single shuffle as ``decontaminate``.
    """
    def shingles(d: DataFrame) -> DataFrame:
        # tokens projected first — word_ngrams_col's lambda re-evaluates an
        # inline tokenizer per shingle position (the minhash_signatures fix)
        return d.select(
            F.col(id_col).alias("doc_id"),
            tokens_col(F.col(text_col)).alias("__toks"),
        ).select(
            "doc_id",
            F.explode(word_ngrams_col(F.col("__toks"), n)).alias("shingle"),
        )

    # the eval shingle set feeds THREE jobs (auto-size count, bitset
    # aggregation, exact confirm join) — cache it under the module's
    # scoped window so the distinct runs once
    ev = _cache_scoped(shingles(eval_df).select("shingle").distinct())
    if num_bits is None:
        # auto-size from the eval shingle count: an undersized bitset is
        # silently useless (measured: 2^17 bits at 47k shingles -> 28% FPR,
        # survivors 13x the true matches; 2^20 -> ~0.2%). One extra
        # eval-side job, never corpus-side.
        num_bits = _auto_bloom_bits(ev.count())
    bitset = bloom_bitset(ev, "shingle", num_bits=num_bits, num_hashes=num_hashes)
    # ship the bitset as a ONE-ROW broadcast relation, not a literal:
    # F.lit(list) builds an array CONSTRUCTOR with |bitset| child
    # expressions that re-materializes the array per input row (measured
    # 8x slower at 16k words); the broadcast row is built once per
    # executor and element_at reads it in place.
    bf = F.broadcast(
        train.sparkSession.createDataFrame([(bitset,)], "__bf array<bigint>")
    )
    cand = (
        shingles(_spread_small_input(train))
        .crossJoin(bf)
        .filter(bloom_contains("shingle", "__bf", num_bits, num_hashes))
        .drop("__bf")
    )
    return (
        cand.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 2,
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/RefinedWeb pass): drop every
    line that occurs in more than ``max_doc_freq`` distinct documents —
    headers, footers, cookie banners, navigation chrome — and reassemble each
    document from its surviving lines in original order.

    Reference scope: the reference's dedup story stops at whole-row
    ``drop_duplicates`` (SURVEY §2.D); sub-document dedup is a north-star
    extension.

    Plan shape at 100 TB: documents explode to one row per line
    (``posexplode`` — JVM-side, no Python); the boilerplate set is found with
    ONE hash aggregation on the line value (map-side partial combine absorbs
    within-partition repeats, which is exactly where boilerplate mass sits).
    Only lines above the frequency threshold survive that aggregation, so the
    anti-join side is tiny relative to the corpus and AQE broadcasts it —
    the corpus line frame is never shuffled for the join. The only wide
    corpus shuffle is the per-document reassembly on ``id_col``. At extreme
    scale, group on ``xxhash64(line)`` instead of the raw line to cut shuffle
    bytes (identical result modulo 64-bit collisions); the raw-line form here
    is what the DuckDB oracle replays bit-for-bit.

    Only non-blank lines are eligible boilerplate: an empty line appears in
    virtually every multi-paragraph document, so counting it would strip
    every paragraph break corpus-wide — the CCNet/RefinedWeb passes likewise
    hash only non-empty lines. Input is split on ``\\r?\\n`` so CRLF text
    matches LF text cross-document.

    Returns one row per distinct input document id (duplicate id rows
    collapse to one output row whose surviving lines merge pos-sorted —
    callers wanting per-row output should dedup ids first):
    ``(doc_id, clean_text, n_lines_kept)`` — documents whose every line was
    boilerplate, and NULL-text documents, come back with an empty string,
    not NULL, so downstream length filters see them.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("pos", "line"),
    )
    boiler = (
        lines.filter(F.length(F.trim("line")) > 0)
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > max_doc_freq)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines_kept"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
) -> DataFrame:
    """Span-level exact-substring dedup (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" shape,
    word-granular): any run of ``n`` consecutive tokens that occurs MORE
    THAN ONCE in the corpus — across documents or within one — is
    removed from every document carrying it. Doc-level dedup misses
    this entirely: boilerplate headers, license blocks, and quoted
    chunks repeat inside otherwise-unique documents, and the model
    memorizes exactly those spans.

    Plan (all keyed, all linear): token positions → n-gram at each
    start (JVM slice/concat) → global gram frequency (ONE shuffle on
    the gram — the corpus's token count in rows, the same scale as any
    inverted index here) → duplicated grams semi-join back → covered
    token positions (start..start+n−1, distinct) → anti-join against
    token positions → per-doc ordered reassembly. Tokens are the
    lowercase whitespace tokens shared with every other text operator,
    so the whole chain is oracle-expressible. Returns
    (doc_id, clean_text, n_tokens, n_removed) — every input doc
    appears, clean_text '' when everything was repeated. NULL text
    coalesces to an empty token array (like line_dedup) so the output
    counts are honest zeros, not ANSI-NULLs that silently corrupt a
    downstream sum(n_tokens)."""
    toks = F.coalesce(tokens_col(F.col(text_col)), F.array().cast("array<string>"))
    # scoped like every other cache in this module: the window evicts it
    # after later routes run, so a long-lived pipeline session does not
    # pin executor storage for the rest of its life
    base = _cache_scoped(df.select(F.col(id_col).alias("doc_id"), toks.alias("toks")))
    pos_tok = base.select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "tok")
    )
    gram_arr = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (n - 1)),
            lambda i: F.array_join(F.slice("toks", i, n), "\x01"),
        ),
    ).otherwise(F.array().cast("array<string>"))  # sequence(1,0) would DESCEND
    grams = base.select(
        "doc_id", F.posexplode(gram_arr).alias("start", "gram")
    )
    dup_grams = grams.groupBy("gram").count().filter(F.col("count") > 1).select("gram")
    covered = (
        grams.join(dup_grams, "gram", "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias("pos"),
        )
        .distinct()
    )
    kept = pos_tok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("tok").alias("n_kept"),
    )
    return (
        base.select("doc_id", F.size("toks").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def soft_dedup_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
    passthrough: bool = False,
) -> DataFrame:
    """Soft deduplication (SoftDeDup — He et al. 2024, public): instead of
    DROPPING duplicates, every document gets a sampling weight inversely
    proportional to its exact-duplicate cluster size, so a doc that
    appears 40× contributes ~once-worth of expected gradient mass while
    its (possibly informative) content is never hard-deleted. Returns
    ``(doc_id, cluster_size, weight)`` with ``weight = 1/cluster_size``
    — feed it to :func:`~.sampling.weighted_sample_wor` or a sampler's
    per-row rate. ``passthrough=True`` keeps every input column and
    appends the two (the ``build_pretraining_corpus(lexical="soft")``
    composition shape — no id rename, no join-back).

    The cluster key is the md5 of the normalized text (lowercased,
    whitespace runs collapsed, trimmed — the same canonical form the C4
    exact route dedups on) so formatting-only copies share a cluster;
    ``normalize=False`` keys on the raw bytes. For NEAR-dup-aware soft
    weights, compose :func:`minhash_near_dup_pairs` →
    :func:`~.graph.connected_components` and count over the component id
    instead — this operator is the exact-hash fast path.

    Plan at 100 TB: ONE hash-partition shuffle on the 32-hex key (a
    count-only window over the cluster key — no join back, no second
    corpus shuffle). Cluster sizes are bounded by the corpus's actual
    duplication, and a mega-cluster (the empty doc, a boilerplate page)
    lands on one reducer only for its in-partition sort — AQE skew-split
    applies. Map-only before and after; no collect, no UDF."""
    from pyspark.sql import Window

    text = F.col(text_col)
    if normalize:
        text = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    key = F.md5(text)
    w = Window.partitionBy(key)
    size = F.count(F.lit(1)).over(w).cast("long").alias("cluster_size")
    # passthrough (the c4_clean/gopher composition shape): every input
    # column rides through with the two outputs appended — the no-join
    # way build_pretraining_corpus(lexical="soft") attaches weights to
    # full corpus rows (same single shuffle; a join-back would be a
    # second one)
    head = ["*"] if passthrough else [F.col(id_col).alias("doc_id")]
    return df.select(*head, size).withColumn(
        "weight", F.round(F.lit(1.0) / F.col("cluster_size"), 6)
    )
