"""Streaming feature pipelines (north-star extension; the reference has no
streaming at all, SURVEY §2.D).

Everything is written against the ``events`` table shape (TESTDATA.md):
``event_id, ts, user_id, event_type, value, props``. Each transformation is a
plain DataFrame→DataFrame function, so the SAME code runs in batch (for the
oracle harness) and under ``readStream`` (Structured Streaming's unified
semantics) — that equivalence is asserted in tests/test_streaming.py.

Late data is handled by watermarks; output mode is left to the caller's
``writeStream`` (append for windowed aggs once the watermark closes windows).
At cluster scale the source would be Kafka/Delta; here the file source stands
in (``trigger(availableNow=True)`` for deterministic test runs)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _checkpoint_query_id(spark: SparkSession, checkpoint: str) -> str:
    """The checkpoint's engine-minted query id (first 8 hex chars) —
    stable across crash-restarts of the same checkpoint, fresh for a
    fresh one: the namespace that makes batch-id-keyed effects (txns,
    output partitions) safe against checkpoint replacement, where batch
    ids restart at 0. Reads ``<checkpoint>/metadata`` for ANY scheme the
    engine itself can write: plain local paths and ``file:`` URIs
    directly, anything else (hdfs://, s3a://, ...) through the same
    Hadoop FileSystem Spark wrote it with. Raises instead of falling
    back — an un-namespaced effect silently collides with a prior
    stream's batches."""
    import json
    import os
    import re

    def read_metadata() -> str:
        loc = str(checkpoint)
        if "://" not in loc and not loc.startswith("file:"):
            with open(os.path.join(loc, "metadata")) as f:
                return f.read()
        if loc.startswith("file:"):
            local = re.sub("^/+", "/", loc[len("file:"):])
            with open(os.path.join(local, "metadata")) as f:
                return f.read()
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(loc.rstrip("/") + "/metadata")
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        stream = fs.open(hpath)
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    try:
        qid = str(json.loads(read_metadata()).get("id", ""))[:8]
    except Exception as exc:
        raise ValueError(
            f"cannot read the query id from {checkpoint}/metadata: {exc} — "
            "batch-id-keyed effects cannot be namespaced safely, refusing "
            "to fall back to bare batch ids"
        ) from exc
    if not qid:
        raise ValueError(
            f"checkpoint metadata at {checkpoint} carries no query id; "
            "cannot namespace batch-id-keyed effects"
        )
    return qid

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events parquet (one-file-per-trigger keeps
    tests deterministic; swap for Kafka/Delta in production)."""
    return spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(path)


def tumbling_features(
    events: DataFrame, width: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """Per-user tumbling-window aggregates with late-data watermark."""
    src = (
        events.withWatermark("ts", watermark)
        if (events.isStreaming and watermark)
        else events
    )
    return (
        src.groupBy(F.window("ts", width).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def sliding_features(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding-window event counts per type (each event lands in
    width/slide windows)."""
    src = (
        events.withWatermark("ts", watermark)
        if (events.isStreaming and watermark)
        else events
    )
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_features(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours"
) -> DataFrame:
    """Session windows: activity bursts per user separated by ``gap`` of
    silence — the canonical stateful streaming aggregation."""
    src = (
        events.withWatermark("ts", watermark)
        if (events.isStreaming and watermark)
        else events
    )
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_windowed_features(
    events: DataFrame, width: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked dedup → tumbling aggregation, the append-mode pipeline:
    duplicates within the watermark horizon are dropped by keyed state
    (``dropDuplicatesWithinWatermark`` — state per event_id is EVICTED once
    the watermark passes it, so state stays bounded on an unbounded
    stream), then the surviving events feed a windowed count/sum per
    event_type. Under append output mode a window row is emitted exactly
    once — when the watermark passes its end — which is what makes this
    the one pipeline shape the complete-mode harness can't exercise: late
    rows are dropped, closed windows are final, open windows never leave
    the state store. In batch the SAME semantics are a global
    dropDuplicates + GROUP BY (everything is "on time" in batch)."""
    if events.isStreaming:
        src = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    else:
        src = events.dropDuplicates(["event_id"])
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once by event_id within the watermark horizon
    (``dropDuplicatesWithinWatermark`` keeps state bounded — a plain
    dropDuplicates would grow state forever on an unbounded stream)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


_STATE_SCHEMA = "user_id LONG, total DOUBLE, n LONG"
_OUT_SCHEMA = "user_id LONG, total DOUBLE, n LONG"


def running_user_state(events: DataFrame) -> DataFrame:
    """Arbitrary stateful op via applyInPandasWithState: a running
    (total, count) per user across triggers — the custom-operator escape
    hatch for semantics window functions can't express on streams."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame({"user_id": [key[0]], "total": [total], "n": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType="total DOUBLE, n LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_to_offline_store(
    features: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Sink a streaming feature DataFrame into the offline store directory
    (append-mode parquet; Delta upsert in production). Returns the query."""
    writer = (
        features.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    lookback: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each left event picks up every right event
    of the same ``by`` key within the preceding ``lookback`` interval —
    purchases enriched with the clicks that led to them. In streaming both
    sides carry watermarks and the time-range condition bounds join state;
    the SAME code is a plain interval join in batch. Output columns:
    left.* + (right_ts, right_value)."""
    r = right.select(
        F.col(by).alias("__rby"),
        F.col("ts").alias("right_ts"),
        F.col("value").alias("right_value"),
    )
    lhs, rhs = left, r
    if left.isStreaming and watermark:
        lhs = left.withWatermark("ts", watermark)
        rhs = r.withWatermark("right_ts", watermark)
    cond = (
        (lhs[by] == rhs["__rby"])
        & (rhs["right_ts"] <= lhs["ts"])
        & (rhs["right_ts"] >= lhs["ts"] - F.expr(f"INTERVAL {lookback}"))
    )
    return lhs.join(rhs, cond, "inner").drop("__rby")


def stream_upsert_to_offline_store(
    features: DataFrame,
    store,
    version_id: int,
    checkpoint: str,
    key_col: str = "entity_id",
    available_now: bool = True,
):
    """Stream → offline store with per-batch INSERT-ONCE semantics via
    ``foreachBatch``: each micro-batch is deduped on the entity key and
    anti-joined against the keys already stored for this version, so trigger
    replays after a crash cannot double-write an entity (plain appends
    can't promise that on a non-ACID store). ``features`` must have columns
    (``key_col``, value); ``key_col`` is renamed to entity_id for storage.

    Insert-once means the FIRST stored value per entity wins — a later
    batch's row for an already-stored key is dropped, not applied. That is
    the right sink for append-only keyed emissions (one final row per
    entity). It is NOT a running-update sink: piping an update-mode
    aggregation (e.g. ``running_user_state``) through it freezes each
    entity at its earliest partial value. For latest-wins accumulation use
    ``store.materialize.update_incremental_feature`` per batch (its merge
    keeps one current row per entity), or Delta MERGE in production."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df.dropDuplicates([key_col]).withColumnRenamed(
            key_col, "entity_id"
        )
        if store.exists():
            existing = store.values_for_version(version_id).select("entity_id")
            fresh = fresh.join(existing, "entity_id", "left_anti")
        if not fresh.isEmpty():
            store.write_values(version_id, fresh)

    writer = features.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_snapshot_maintenance(
    values: DataFrame,
    fs,
    version_id: int,
    snapshot_path: str,
    checkpoint: str,
    key_col: str = "entity_id",
    available_now: bool = True,
    max_changed: int = 100_000,
):
    """Streaming value ingestion + ONLINE-SNAPSHOT freshness in one
    ``foreachBatch`` (round-11 verdict task 7): per epoch the batch's
    (``key_col``, value) rows append to the offline store EXACTLY-ONCE —
    the commit txn is ``sha256(query id / epoch id)[:12]``, so a replayed
    trigger re-derives the same name and write_values short-circuits on
    the already-committed segment — then ``maintain_online_snapshot``
    advances the serving tier off the change data feed. The sync side
    needs no epoch key at all: its consumed-segment LEDGER is the
    idempotency (a replayed maintenance call re-lists the feed, finds
    every commit consumed, and no-ops), which is exactly why the ledger
    replaced wall-clock windows. Snapshot freshness therefore rides the
    stream's own trigger cadence instead of an external scheduler, and a
    crash anywhere replays into a no-op, never a double-apply.

    Effects are namespaced by the CHECKPOINT'S query id (resolved
    lazily inside the first trigger — the engine writes
    ``<checkpoint>/metadata`` at stream start), the same fresh-checkpoint
    discipline as :func:`streaming_dedup_ingest`: epoch ids restart at 0
    for a new checkpoint, and an un-namespaced txn would short-circuit
    the new stream's first batches against the old stream's segments.

    Stream-vs-batch content equality (the stream's snapshot ==
    maintain_online_snapshot applied after a batch write of the same
    rows) is pinned in tests/test_streaming.py. ``values`` must carry
    (``key_col``, value) with value already codec-encoded."""
    import hashlib

    qid_box: list = []

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if not qid_box:
            qid_box.append(_checkpoint_query_id(fs.spark, checkpoint))
        txn = hashlib.sha256(
            f"snapshot-maint/{qid_box[0]}/{int(epoch_id)}".encode()
        ).hexdigest()[:12]
        fresh = (
            batch_df.withColumnRenamed(key_col, "entity_id")
            if key_col != "entity_id"
            else batch_df
        )
        if not fresh.isEmpty():
            fs.store.write_values(int(version_id), fresh, txn=txn)
        fs.maintain_online_snapshot(snapshot_path, max_changed=max_changed)

    writer = values.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream(
    events: DataFrame, dim: DataFrame, key: str = "user_id", how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to each
    event as it arrives. The static side is broadcast, so the streaming side
    never shuffles and no state store is involved (unlike stream-stream
    joins) — the dimension is re-resolved per micro-batch, which is exactly
    the semantics you want for slowly-changing lookup tables. Works
    identically on a batch frame (unified API)."""
    return events.join(F.broadcast(dim), key, how)


def streaming_heavy_hitters(
    events: DataFrame, col: str = "event_type", k: int = 100, buckets: int = 8
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters via applyInPandasWithState.

    The value space is sharded into ``buckets`` state groups (hash of the
    value), each maintaining an independent MG summary of ≤k counters across
    triggers — the same candidate guarantee as the batch operator
    (operators/sketch.py) per shard, with bounded state regardless of stream
    length. Every trigger emits each shard's current (value, weight) set in
    update mode; the union of shards is a superset of any value whose
    frequency exceeds n/k within its shard. Exactify downstream by recount,
    exactly as the batch path does."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        items, weights = state.get if state.exists else ([], [])
        counters = pd.Series(weights, index=items, dtype="int64")
        for pdf in pdfs:
            # batched MG fold, vectorized — same collective-decrement
            # argument as operators/sketch.py: merge exact batch counts,
            # then subtract the (k+1)-th largest and drop non-positives
            bc = pdf[col].value_counts(dropna=True).astype("int64")
            counters = bc if counters.empty else counters.add(bc, fill_value=0)
            if len(counters) > k:
                d = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > d] - d
        state.update((list(counters.index), [int(w) for w in counters]))
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(counters),
                col: list(counters.index),
                "weight": [int(w) for w in counters],
            }
        )

    bucketed = events.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(buckets))
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=f"bucket LONG, {col} STRING, weight LONG",
        stateStructType="items ARRAY<STRING>, weights ARRAY<LONG>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_ingest(
    docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Continuous corpus ingestion behind a GROWING near-dup gate: each
    micro-batch is (1) deduped in-batch, (2) checked against the persisted
    MinHash index (operators/dedup.py minhash_index_query — the corpus is
    never re-shingled), (3) survivors land in ``out_path`` under a
    ``stream=<query id>/ingest_batch=<epoch>`` partition, and (4) the
    SAME survivors are folded into the index as an atomically-renamed
    segment named by the query id + epoch id — so the next trigger's
    duplicates of this batch are caught.
    This is the streaming face of the write→query→append loop
    (q_dedup_index_grow), the shape a 100 TB training-corpus intake runs
    daily.

    Exactly-once under trigger replay, by construction, in both effects:

    * a replayed trigger whose txn (query id + epoch id) already
      committed SHORT-CIRCUITS before recomputing anything — the index
      append is the last effect, so a committed segment implies the
      survivor partition landed too;
    * a replay of a partially-landed trigger (crash before the append)
      recomputes against an index that does not yet contain the batch,
      reproduces the identical survivor set, and idempotently overwrites
      its own ``stream=<query id>/ingest_batch=<epoch>`` partition.

    A corpus-id match is therefore always a GENUINE re-send of an
    already-ingested document (the short-circuit guarantees the index
    never holds the live batch when queried), and the gate drops it.

    Both effects are namespaced by the CHECKPOINT'S query id
    (:func:`_checkpoint_query_id`) because epoch ids restart at 0 for a
    fresh checkpoint: without the namespace, restarting ingestion with a
    new checkpoint against the same ``out_path``/``index_path`` would
    overwrite the prior stream's ``ingest_batch=0`` survivors (data
    loss) and short-circuit its index appends to the prior stream's
    committed segments (future duplicates admitted) — the same
    fresh-checkpoint hazard ``stream_corpus_revisions`` namespaces its
    txns against.

    A replayed batch re-queries an index that already CONTAINS its own
    survivors; self-matches are excluded on ``new_id == corpus_id``, and
    surviving docs are mutually non-duplicate (in-batch gate), so the
    replay recomputes the identical survivor set — pinned in
    tests/test_streaming.py.

    In-batch rule (greedy, deterministic): any doc appearing as the
    GREATER id of an in-batch near-dup pair is dropped — pessimistic on
    chains versus the batch pipeline's connected-components canonical
    rule (pipelines/corpus.py), the standard streaming trade of per-batch
    state for a slightly stricter gate. The index must exist before the
    stream starts (write the base corpus, or an empty frame, with
    minhash_index_write).

    Layout note: survivors landed at ``out_path/ingest_batch=N`` (flat,
    un-namespaced) before the query-id namespace was added. An
    ``out_path`` holding that legacy layout is REFUSED at stream start:
    mixing flat and nested partition dirs makes
    ``spark.read.parquet(out_path)`` fail with "conflicting directory
    structures", rendering previously-ingested data unreadable. Migrate
    by moving the legacy ``ingest_batch=*`` dirs under a synthetic
    ``stream=legacy/`` dir (one ``mv``), which restores a uniform
    two-level layout readable alongside new streams."""
    import os

    legacy = (
        sorted(
            d
            for d in os.listdir(out_path)
            if d.startswith("ingest_batch=")
            and os.path.isdir(os.path.join(out_path, d))
        )
        if os.path.isdir(out_path)
        else []
    )
    if legacy:
        raise RuntimeError(
            f"out_path {out_path} holds pre-namespace flat survivor "
            f"partitions ({legacy[0]}{' …' if len(legacy) > 1 else ''}); "
            "writing the new stream=<query id>/ingest_batch=<epoch> layout "
            "next to them would make spark.read.parquet(out_path) fail "
            "with conflicting directory structures. Migrate first: "
            f"mkdir {os.path.join(out_path, 'stream=legacy')} && "
            f"mv {os.path.join(out_path, 'ingest_batch=*')} "
            f"{os.path.join(out_path, 'stream=legacy')}/"
        )

    from ..operators.dedup import (
        index_txn_committed,
        minhash_index_append,
        minhash_index_query,
        minhash_near_dup_pairs,
        minhash_signatures,
    )

    # Sign each micro-batch ONCE: through r12 every trigger shingled and
    # signed its text three times (in-batch pair route, index query, index
    # append — the same documents each time). The shared frame requires
    # the index's stored (n_shingle, k) to match the in-batch pair route's
    # defaults (the sigs= caller's contract) — they do for every index
    # this module writes; a params mismatch falls back to per-stage
    # signing, correctness over speed. Params are immutable for an index's
    # lifetime, so one read at stream start suffices.
    import inspect as _inspect
    import json as _json

    _pp = _inspect.signature(minhash_near_dup_pairs).parameters
    try:
        with open(os.path.join(index_path, "params.json")) as _pf:
            _ip = _json.load(_pf)
        _share_sigs = _ip.get("shingle_format") == "xxhash64-set" and (
            _ip.get("n_shingle"),
            _ip.get("k"),
        ) == (_pp["n_shingle"].default, _pp["k"].default)
    except (OSError, ValueError):
        _ip, _share_sigs = None, False

    qid: list = []  # lazily read once the engine has written the metadata

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if not qid:
            qid.append(_checkpoint_query_id(batch_df.sparkSession, checkpoint))
        txn = f"{qid[0]}-b{int(batch_id):012d}"
        if index_txn_committed(index_path, txn):
            # a replayed trigger whose effects fully landed (the append is
            # the LAST effect, so its segment implies the survivor
            # partition too): skip the whole recompute — and never
            # re-query an index that already contains this batch's own
            # survivors, which would misread them as corpus duplicates
            return
        # collapse SAME-ID re-sends within the micro-batch first (an
        # at-least-once source can redeliver a doc twice inside one
        # trigger): the near-dup gate below only forms a<b id pairs, so
        # two rows with the SAME id would both survive it and both land
        # in the corpus and the index. min(text) keeps the collapse
        # deterministic under trigger replay.
        batch = (
            batch_df.select(F.col(id_col), F.col(text_col))
            .groupBy(id_col)
            .agg(F.min(text_col).alias(text_col))
            .localCheckpoint(eager=True)
        )
        if batch.isEmpty():
            return
        sigs = (
            minhash_signatures(
                batch, text_col, id_col, _ip["n_shingle"], _ip["k"]
            ).localCheckpoint(eager=True)
            if _share_sigs
            else None
        )
        in_batch = minhash_near_dup_pairs(
            batch, text_col, id_col, threshold=threshold, sigs=sigs
        ).select(F.col("doc_id_b").alias(id_col)).distinct()
        fresh = batch.join(in_batch, id_col, "left_anti")
        # no self-row exclusion: the committed-txn short-circuit above
        # guarantees the index never contains THIS batch when queried, so
        # any id-match against the corpus is a genuine re-send of an
        # already-ingested document — dropping it is the gate working
        vs_corpus = (
            minhash_index_query(
                batch.sparkSession,
                fresh,
                index_path,
                text_col,
                id_col,
                threshold,
                sigs=sigs,
            )
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        survivors = fresh.join(vs_corpus, id_col, "left_anti").localCheckpoint(
            eager=True
        )
        survivors.write.mode("overwrite").parquet(
            os.path.join(out_path, f"stream={qid[0]}", f"ingest_batch={int(batch_id)}")
        )
        minhash_index_append(
            survivors, index_path, text_col, id_col, txn=txn, sigs=sigs
        )

    writer = docs.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_drift_bins(
    events: DataFrame,
    ref_lo: float,
    ref_w: float,
    bins: int = 10,
    col: str = "value",
    window: str = "1 hour",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-event-time-window value histogram against FIXED reference bin
    edges — the streaming half of the PSI drift monitor (the edges come
    from a batch reference via ``quality.psi_drift``'s rule: fixed-width
    from the reference min/max, clamp arithmetic identical to the batch
    operator, so stream and batch land every value in the same bin).
    One stateful streaming aggregation keyed on (window, bin) — bounded
    state: windows in flight × bins. Finalize fractions + PSI terms
    downstream with ``quality.psi_finalize`` (fractions need the window
    total, a second pass over the AGGREGATED frame, not the stream).
    Returns (window_start, bin, n)."""
    e = events.withWatermark("ts", watermark) if watermark else events
    b = (
        F.least(
            F.greatest(
                F.floor((F.col(col).cast("double") - F.lit(ref_lo)) / F.lit(ref_w)),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
        + 1
    ).cast("long")
    return (
        e.filter(F.col(col).isNotNull())
        .groupBy(F.window("ts", window).alias("w"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "bin", "n")
    )


def enrich_stream_scd2(
    events: DataFrame,
    dim_intervals: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """POINT-IN-TIME-correct stream enrichment against an SCD2 dimension:
    each event picks up the dimension row whose validity interval
    contains its event time — ``key`` equality plus
    ``valid_from ≤ ts < valid_to`` (an open current row has NULL
    valid_to). This is the streaming face of the as-of join: a batch
    as-of backfill and this enrichment agree row-for-row (pinned via the
    inventory oracle), which is exactly the training/serving-skew
    guarantee a feature store exists to provide.

    Stream-static shape: the interval table broadcasts and is re-resolved
    per micro-batch (dimension updates between triggers are picked up; no
    state store, no watermark — same mechanics as :func:`enrich_stream`).
    LEFT join: events before any interval survive with NULL attributes.
    Works identically on a batch frame (unified API)."""
    d = dim_intervals.withColumnRenamed(key, "__dk")
    cond = (
        (F.col(key) == F.col("__dk"))
        & (F.col(ts_col) >= F.col(valid_from))
        & (F.col(valid_to).isNull() | (F.col(ts_col) < F.col(valid_to)))
    )
    return events.join(F.broadcast(d), cond, "left").drop("__dk")


def sketch_profile_stream(
    events: DataFrame,
    value_col: str = "value",
    distinct_col: str = "user_id",
    width: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Windowed STREAMING metrics profile carrying mergeable sketches:
    per tumbling window — row count, exact decimal sum, a Datasketches
    KLL sketch of ``value_col`` read out as p50/p95/p99, and an HLL
    distinct estimate of ``distinct_col``. The drift/SLO monitor shape:
    distribution quantiles and cardinality of a 100 TB/day stream
    maintained incrementally in bounded state (each window holds two
    fixed-size sketches, never its rows), where exact percentiles would
    need the window's full value multiset in state.

    Works batch-or-streaming like every feature here (the stream≡batch
    parity tests rely on it); same windowing/watermark discipline as
    :func:`tumbling_features`. The KLL/HLL estimates carry the published
    Datasketches error bounds; pair with `operators/incremental.py`
    rollups when the sketch STATE itself must be persisted and merged
    across jobs rather than read out per window."""
    src = (
        events.withWatermark("ts", watermark)
        if (events.isStreaming and watermark)
        else events
    )
    agg = src.groupBy(F.window("ts", width).alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("sum_value"),
        F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias("_kll"),
        F.hll_sketch_agg(F.col(distinct_col)).alias("_hll"),
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        "n_events",
        "sum_value",
        F.round(F.kll_sketch_get_quantile_double("_kll", F.lit(0.5)), 6).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("_kll", F.lit(0.95)), 6).alias("p95"),
        F.round(F.kll_sketch_get_quantile_double("_kll", F.lit(0.99)), 6).alias("p99"),
        F.hll_sketch_estimate("_hll").cast("long").alias("approx_users"),
    )


def stream_corpus_revisions(
    docs: DataFrame,
    corpus_path: str,
    checkpoint: str,
    eval_df: DataFrame | None = None,
    available_now: bool = True,
    txn_prefix: str | None = None,
):
    """Stream documents INTO a pretraining-corpus artifact: every non-empty
    micro-batch becomes one :func:`~..pipelines.pretraining
    .update_pretraining_corpus` revision — gated, deduped within itself
    and against the whole corpus-so-far through the persisted MinHash
    index, split consistently with the base, committed atomically,
    appended to the index.

    Replay safety comes from CONTENT, not offsets: a micro-batch the
    engine re-delivers after a crash re-runs the update, but its
    documents are now exact duplicates of corpus rows (they were
    committed and indexed the first time), so every one drops at the
    index query and the replayed revision commits zero docs — the same
    idempotency-by-dedup the reference's cache can't offer (pinned in
    tests/test_corpus_pipeline.py::test_streaming_corpus_revisions_replay
    _commits_nothing). The corpus must have been built with
    ``dedup_index=True``.

    ``txn_prefix`` upgrades replay safety to EXACTLY-ONCE by
    transaction id: each micro-batch commits as
    ``{txn_prefix}/b{batch_id}``, and because the engine reuses batch
    ids when it re-delivers after a crash (same checkpoint), the
    replayed batch short-circuits to the already-committed revision —
    no re-curation, and the revision's index appends are re-fired
    idempotently (healing the commit-vs-append crash window that
    content dedup alone leaves as a redundancy-direction hole). Batch
    ids are only unique WITHIN one checkpoint lineage (a fresh
    checkpoint restarts them at 0), so the committed txn is namespaced
    by the checkpoint's engine-minted query id — read from
    ``<checkpoint>/metadata``, stable across crash-restarts of the same
    checkpoint, fresh for a fresh one. Reusing a ``txn_prefix`` with a
    new checkpoint therefore can NOT silently short-circuit new batches
    to old revisions (ADVICE r8); the prefix itself only keeps txns
    readable and distinct across concurrent streams."""
    from ..pipelines.pretraining import update_pretraining_corpus

    ckpt_id: list = []  # lazily read once the engine has written it

    def _txn(spark, batch_id: int) -> str | None:
        if txn_prefix is None:
            return None
        if not ckpt_id:
            ckpt_id.append(_checkpoint_query_id(spark, checkpoint))
        return f"{txn_prefix}#{ckpt_id[0]}/b{batch_id}"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        update_pretraining_corpus(
            batch,
            corpus_path,
            eval_df=eval_df,
            txn=_txn(batch_df.sparkSession, batch_id),
        )

    writer = docs.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
