"""Structured Streaming tests: the SAME transformation functions must
produce identical results in batch and streaming (unified semantics), and
the stateful/dedup operators must behave under incremental triggers."""

import shutil

import pytest
from pyspark.sql import functions as F

from feature_store_implementation_spark.sources.tables import load_table
from feature_store_implementation_spark.streaming.features import (
    EVENTS_SCHEMA,
    dedup_events,
    read_events_stream,
    session_features,
    sliding_features,
    stream_to_offline_store,
    tumbling_features,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events split into several parquet files → several stream triggers."""
    root = tmp_path_factory.mktemp("events_stream")
    e = load_table(spark, SF, "events")
    e.repartition(4).write.mode("overwrite").parquet(str(root / "in"))
    return str(root / "in")


def _run_stream(spark, stream_df, tmp_path, mode="append"):
    out = str(tmp_path / "mem_out")
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(f"t_{abs(hash(out)) % 10**8}")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(q.name)


@pytest.mark.parametrize(
    "fn,keys",
    [
        (tumbling_features, ["window_start", "user_id"]),
        (sliding_features, ["window_start", "event_type"]),
        (session_features, ["session_start", "user_id"]),
    ],
)
def test_stream_equals_batch(spark, events_dir, tmp_path, fn, keys):
    """Unified semantics: the SAME transformation over readStream must equal
    the batch result. Output mode 'complete' so the comparison is exact —
    in append mode, out-of-order file triggers mean the watermark (a) drops
    late rows and (b) holds not-yet-closed tail windows in state, which is
    correct streaming behavior but not batch-comparable."""
    batch_src = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    stream_src = read_events_stream(spark, events_dir)

    expected = {tuple(r) for r in fn(batch_src).collect()}
    # no watermark → nothing dropped: exact batch equivalence in complete mode
    got_df = _run_stream(spark, fn(stream_src, watermark=None), tmp_path, mode="complete")
    got = {tuple(r) for r in got_df.collect()}
    assert got == expected and len(got) > 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids across triggers are emitted once."""
    e = load_table(spark, SF, "events").limit(200)
    dup_dir = str(tmp_path / "dup_in")
    e.repartition(2).write.mode("overwrite").parquet(dup_dir)
    e.repartition(2).write.mode("append").parquet(dup_dir)  # same rows again

    stream = read_events_stream(spark, dup_dir)
    out = _run_stream(spark, dedup_events(stream), tmp_path)
    n = out.select("event_id").distinct().count()
    total = out.count()
    assert n == 200 and total == 200


def test_stream_to_offline_store_sink(spark, tmp_path):
    """Append-mode sink over a TIME-ORDERED source (files written in
    chronological order, as a real stream delivers data): every emitted
    window must match the batch result exactly; only tail windows newer than
    the final watermark may remain unemitted in state."""
    import time

    e = load_table(spark, SF, "events").withColumn(
        "_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    src_dir = str(tmp_path / "ordered_in")
    bounds = e.approxQuantile("_us", [0.25, 0.5, 0.75], 0.0)
    lo = float("-inf")
    for i, hi in enumerate([*bounds, float("inf")]):
        part = e.filter((F.col("_us") > lo) & (F.col("_us") <= hi)).drop("_us")
        part.coalesce(1).write.mode("append").parquet(src_dir)
        time.sleep(0.05)  # distinct mtimes → file source replays in order
        lo = hi

    stream = read_events_stream(spark, src_dir)
    q = stream_to_offline_store(
        tumbling_features(stream), str(tmp_path / "out"), str(tmp_path / "ck2")
    )
    q.awaitTermination(120)
    written = spark.read.parquet(str(tmp_path / "out"))
    batch = tumbling_features(spark.read.schema(EVENTS_SCHEMA).parquet(src_dir))
    assert 0 < written.count() <= batch.count()
    # emitted rows are final: exact match against batch, no partials
    assert written.exceptAll(batch).count() == 0
    shutil.rmtree(str(tmp_path / "out"), ignore_errors=True)


def test_running_user_state(spark, events_dir, tmp_path):
    """applyInPandasWithState: after all triggers, the final (total, n) per
    user must equal the batch sum/count over all events."""
    from feature_store_implementation_spark.streaming.features import (
        running_user_state,
    )

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    expected = {
        r["user_id"]: (round(r["total"], 6), r["n"])
        for r in batch.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }

    out = _run_stream(
        spark, running_user_state(read_events_stream(spark, events_dir)),
        tmp_path, mode="update",
    )
    # update mode emits one row per user per trigger; the final state is the
    # row with the largest n for each user
    final = {}
    for r in out.collect():
        if r["user_id"] not in final or r["n"] > final[r["user_id"]][1]:
            final[r["user_id"]] = (round(r["total"], 6), r["n"])
    assert final == expected


def test_stream_stream_interval_join(spark, events_dir, tmp_path):
    """Stream-stream inner interval join ≡ the batch interval join."""
    from feature_store_implementation_spark.streaming.features import interval_join

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    b_purch = batch.filter(F.col("event_type") == "purchase")
    b_click = batch.filter(F.col("event_type") == "click")
    expected = {
        tuple(r)
        for r in interval_join(b_purch, b_click)
        .select("event_id", "right_ts", "right_value")
        .collect()
    }

    stream = read_events_stream(spark, events_dir)
    s_purch = stream.filter(F.col("event_type") == "purchase")
    s_click = stream.filter(F.col("event_type") == "click")
    got_df = _run_stream(
        spark,
        interval_join(s_purch, s_click, watermark=None).select(
            "event_id", "right_ts", "right_value"
        ),
        tmp_path,
    )
    got = {tuple(r) for r in got_df.collect()}
    assert got == expected and len(got) > 0


def test_stream_upsert_idempotent(spark, events_dir, tmp_path):
    """foreachBatch upsert: replaying the whole stream (fresh checkpoint,
    same data) must not duplicate entities in the offline store."""
    from feature_store_implementation_spark.store.offline import OfflineStore
    from feature_store_implementation_spark.streaming.features import (
        stream_upsert_to_offline_store,
    )

    store = OfflineStore(spark, str(tmp_path / "store"))

    def run(ck):
        stream = read_events_stream(spark, events_dir)
        feats = stream.select(
            F.col("user_id").cast("string").alias("entity_id"),
            F.col("value").cast("string").alias("value"),
        )
        q = stream_upsert_to_offline_store(
            feats, store, 3, str(tmp_path / ck)
        )
        q.awaitTermination(120)

    run("ck1")
    n_users = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir).select(
        "user_id"
    ).distinct().count()
    assert store.values_for_version(3).count() == n_users
    run("ck2")  # full replay with a fresh checkpoint → still no duplicates
    vals = store.values_for_version(3)
    assert vals.count() == n_users
    assert vals.select("entity_id").distinct().count() == n_users


def test_stream_static_enrichment_equals_batch(spark, events_dir, tmp_path):
    from feature_store_implementation_spark.streaming.features import enrich_stream

    dim = spark.createDataFrame(
        [(i, "gold" if i % 3 == 0 else "basic") for i in range(40)],
        "user_id long, tier string",
    )
    batch_src = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    project = lambda df: df.select("event_id", "user_id", "tier")
    expected = {tuple(r) for r in project(enrich_stream(batch_src, dim)).collect()}
    got_df = _run_stream(
        spark, project(enrich_stream(read_events_stream(spark, events_dir), dim)),
        tmp_path, mode="append",
    )
    got = {tuple(r) for r in got_df.collect()}
    assert got == expected and len(got) > 0


def test_streaming_heavy_hitters_candidates_cover_batch_exact(spark, events_dir, tmp_path):
    """The streamed MG state (union over shards, last trigger per bucket)
    must contain every exact heavy hitter of the full batch — the same
    pigeonhole guarantee the batch sketch gives per partition."""
    from feature_store_implementation_spark.streaming.features import (
        streaming_heavy_hitters,
    )

    k = 10
    out = _run_stream(
        spark,
        streaming_heavy_hitters(
            read_events_stream(spark, events_dir), col="event_type", k=k
        ),
        tmp_path,
        mode="update",
    )
    candidates = {r["event_type"] for r in out.collect()}

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    n = batch.count()
    exact = {
        r["event_type"]
        for r in batch.groupBy("event_type").count().filter(F.col("count") > n / k).collect()
    }
    assert exact  # the corpus has heavy event types at k=10
    assert exact <= candidates


def test_streaming_corpus_gates_equal_batch(spark, tmp_path):
    """The LLM-pipeline text gates (quality, lang-id, token stats, PII) are
    row-local expressions, so the SAME operator functions must produce
    identical per-doc results when the corpus arrives as a stream — the
    ingest-time filtering mode of a production corpus pipeline."""
    from feature_store_implementation_spark.operators.text import (
        language_id,
        pii_redact,
        quality_score,
        text_stats,
    )

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "docs_in")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    for i, op in enumerate((quality_score, language_id, text_stats, pii_redact)):
        batch_rows = {tuple(r) for r in op(docs).collect()}
        out = str(tmp_path / f"out{i}")
        q = (
            op(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"gate{i}")
            .option("checkpointLocation", str(tmp_path / f"ckpt{i}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        stream_rows = {tuple(r) for r in spark.table(f"gate{i}").collect()}
        assert stream_rows == batch_rows, op.__name__


def test_q_stream_tumbling_runs_real_stream_and_matches_batch(spark):
    """The inventory's driver-checked streaming query must (a) execute an
    actual availableNow streaming job and (b) equal the batch tumbling
    aggregation it claims to mirror."""
    from feature_store_implementation_spark.plans.inventory import q_stream_tumbling
    from feature_store_implementation_spark.streaming.features import tumbling_features
    from pyspark.sql import functions as F

    got = {tuple(r) for r in q_stream_tumbling(spark, SF).collect()}
    batch = tumbling_features(load_table(spark, SF, "events")).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "user_id",
        "n_events",
        "sum_value",
    )
    assert got == {tuple(r) for r in batch.collect()}
    assert len(got) > 0


def test_q_stream_session_runs_real_stream_and_matches_batch(spark):
    """Session windows through the actual streaming engine (state merge
    across triggers) must equal the batch session aggregation."""
    from feature_store_implementation_spark.plans.inventory import q_stream_session
    from feature_store_implementation_spark.streaming.features import session_features
    from pyspark.sql import functions as F

    got = {tuple(r) for r in q_stream_session(spark, SF).collect()}
    batch = session_features(load_table(spark, SF, "events")).select(
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "user_id",
        "n_events",
        "session_value",
    )
    assert got == {tuple(r) for r in batch.collect()}
    assert len(got) > 0


def test_stream_watermark_drops_late_rows(spark, tmp_path):
    """The late-data class pinned explicitly: a straggler arriving AFTER
    its window's state has been evicted is DROPPED — the already-emitted
    append row is final, never re-emitted or revised. (Spark's actual
    contract, verified here: a late row whose window is still in state —
    e.g. arriving in the very batch that finalizes the window — is still
    aggregated; only eviction makes lateness final. So the straggler must
    arrive one batch later.) File 1 carries the 03:00 window plus a 10:00
    event that advances the watermark to 08:00 (2h delay); file 2's
    on-time 11:00 event lets the batch emit+evict the 03:00 window; file
    3 replays a 03:30 straggler — state gone, row dropped. Expected
    append output: exactly one row, the 03:00 window with the THREE
    on-time events."""
    import datetime as dt
    import glob
    import os
    import shutil

    base = dt.datetime(2024, 3, 1)

    def ev(i, h, m=0):
        return (i, base + dt.timedelta(hours=h, minutes=m), 1, "click", 1.0, "{}")

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "late_in")
    os.makedirs(src)
    for n, (rows, mtime) in enumerate(
        [
            ([ev(1, 3), ev(2, 3, 10), ev(3, 3, 20), ev(4, 10)], 1_700_000_000),
            ([ev(6, 11)], 1_700_000_100),
            ([ev(5, 3, 30), ev(7, 12)], 1_700_000_200),
        ]
    ):
        stage = str(tmp_path / f"stage_{n}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        dest = f"{src}/f{n}.parquet"
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], dest)
        os.utime(dest, (mtime, mtime))

    stream = read_events_stream(spark, src)
    out = _run_stream(spark, tumbling_features(stream, watermark="2 hours"), tmp_path)
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(base + dt.timedelta(hours=3), 1, 3, 3.0)], rows


def test_stream_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Exactly-once across a RESTART: run the watermarked append-mode
    dedup+window pipeline over the first half of the chunks, let the query
    terminate, then start a NEW query on the SAME checkpoint with the rest
    of the chunks (including duplicates of phase-1 events, so the restart
    must restore the dedup state, not just the source offsets). The final
    file-sink contents must equal an unbroken single-query run: no window
    emitted twice, none lost, no duplicate admitted."""
    import glob
    import os

    from pyspark.sql import Window as W

    from feature_store_implementation_spark.streaming.features import (
        dedup_windowed_features,
    )

    n_chunks = 8
    ev = load_table(spark, SF, "events")
    chunked = ev.withColumn("__chunk", F.ntile(n_chunks).over(W.orderBy("ts")))

    def write_chunk(src, i, extra=None):
        chunk = chunked.filter(F.col("__chunk") == i).drop("__chunk")
        if extra is not None:
            chunk = chunk.union(extra)
        stage = str(tmp_path / f"stage_{os.path.basename(src)}_{i}")
        chunk.coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dest = f"{src}/chunk_{i:02d}.parquet"
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    # duplicates of PHASE-1 (chunk 4) events injected into chunk 5: across
    # the restart boundary they are either deduped via RESTORED state or
    # late-dropped below the restored watermark — both exclude them, in the
    # broken and unbroken runs alike
    boundary_dups = chunked.filter(
        (F.col("__chunk") == 4) & (F.col("event_id") % 37 == 0)
    ).drop("__chunk")

    def run(src_dir, out_dir, ckpt, phases):
        os.makedirs(src_dir, exist_ok=True)
        for lo, hi in phases:
            for i in range(lo, hi + 1):
                write_chunk(src_dir, i, extra=boundary_dups if i == 5 else None)
            q = (
                dedup_windowed_features(read_events_stream(spark, src_dir))
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300), "stream did not drain"
        return (
            spark.read.parquet(out_dir)
            .select("window_start", "event_type", "n_events", "sum_value")
        )

    restarted = run(
        str(tmp_path / "in_a"),
        str(tmp_path / "out_a"),
        str(tmp_path / "ckpt_a"),
        [(1, 4), (5, 8)],  # two separate queries, same checkpoint
    )
    unbroken = run(
        str(tmp_path / "in_b"),
        str(tmp_path / "out_b"),
        str(tmp_path / "ckpt_b"),
        [(1, 8)],  # one query end to end
    )

    a = sorted(map(tuple, restarted.collect()))
    b = sorted(map(tuple, unbroken.collect()))
    assert len(a) > 0
    assert a == b
    # and no row was emitted twice across the restart
    assert len(a) == len(set(a))


def test_streaming_dedup_ingest_grows_index_and_replays_exactly_once(spark, tmp_path):
    """The streaming dedup gate (streaming/features.py
    streaming_dedup_ingest): batch 2's copies of batch-1 documents are
    dropped because batch 1's survivors were FOLDED INTO the index between
    triggers; in-batch duplicates are gated too; and a full REPLAY (fresh
    checkpoint, same files → same epoch ids) recomputes the identical
    survivor partitions while every index append no-ops on its committed
    segment — byte-identical outcome, no double-growth."""
    import glob
    import os

    from feature_store_implementation_spark.operators.dedup import (
        _read_index_signatures,
        minhash_index_write,
    )
    from feature_store_implementation_spark.streaming.features import (
        streaming_dedup_ingest,
    )

    # synthetic corpus with CONTROLLED duplicate structure: 30 docs of
    # disjoint random word streams (pairwise Jaccard ~ 0 at threshold 0.9)
    import random

    rng = random.Random(7)
    words = [f"w{j}" for j in range(4000)]

    def doc(i):
        return (i, " ".join(rng.sample(words, 60)))

    all_docs = [doc(i) for i in range(30)]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    docs = mk(all_docs)
    base = docs.filter(F.col("doc_id") < 10)              # pre-indexed corpus
    b1 = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    b1_copy = b1.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    b2_fresh = docs.filter(F.col("doc_id") >= 20)
    # batch 1: fresh docs + ONE in-batch duplicate pair (greater id drops);
    # batch 2: exact copies of batch 1 (cross-batch dups) + fresh docs
    in_batch_dup = b1.limit(1).select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    batch1 = b1.union(in_batch_dup)
    batch2 = b1_copy.union(b2_fresh)

    index = str(tmp_path / "index")
    minhash_index_write(base, index)
    n_base = _read_index_signatures(spark, index).count()

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, chunk in enumerate((batch1, batch2)):
        stage = str(tmp_path / f"stage{i}")
        chunk.coalesce(1).write.parquet(stage)
        dest = f"{src}/chunk_{i}.parquet"
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], dest)
        os.utime(dest, (1_700_000_000 + i * 10,) * 2)

    out = str(tmp_path / "out")

    def run(ckpt):
        stream = (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_dedup_ingest(
            stream, index, out, str(tmp_path / ckpt), threshold=0.9
        )
        assert q.awaitTermination(300), "stream did not drain"
        return {
            (r["ingest_batch"], r["doc_id"])
            for r in spark.read.parquet(out).select("ingest_batch", "doc_id").collect()
        }

    got = run("ckpt_a")
    b1_ids = {r["doc_id"] for r in b1.collect()}
    b2_ids = {r["doc_id"] for r in b2_fresh.collect()}
    want = {(0, i) for i in b1_ids} | {(1, i) for i in b2_ids}
    assert got == want  # copies (+100000/+200000 ids) all gated
    n_grown = _read_index_signatures(spark, index).count()
    assert n_grown == n_base + len(b1_ids) + len(b2_ids)

    # REPLAY: fresh checkpoint, same source files → same epochs 0/1
    again = run("ckpt_b")
    assert again == want
    assert _read_index_signatures(spark, index).count() == n_grown  # no re-growth


def test_q_stream_psi_runs_real_stream_and_matches_batch(spark):
    """The streaming drift monitor must (a) run an actual availableNow
    streaming aggregation and (b) equal the batch windowed-histogram PSI
    computed from the same events with the same reference edges."""
    from feature_store_implementation_spark.operators.quality import psi_finalize
    from feature_store_implementation_spark.plans.inventory import q_stream_psi

    got = {tuple(r) for r in q_stream_psi(spark, SF).collect()}

    ev = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    stats = ev.agg(
        F.min(F.col("value").cast("double")).alias("lo"),
        F.max(F.col("value").cast("double")).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    lo = float(stats["lo"])
    w = max((float(stats["hi"]) - lo) / 10, 1e-12)
    b = (
        F.least(
            F.greatest(F.floor((F.col("value").cast("double") - F.lit(lo)) / F.lit(w)), F.lit(0)),
            F.lit(9),
        )
        + 1
    ).cast("long")
    ref = ev.select(b.alias("bin")).groupBy("bin").agg(
        (F.count(F.lit(1)) / F.lit(int(stats["n"]))).alias("ref_frac")
    )
    counts = (
        ev.select(F.window("ts", "1 hour").alias("wd"), b.alias("bin"))
        .groupBy("wd", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("wd.start").alias("window_start"), "bin", "n")
    )
    want = {
        tuple(r)
        for r in psi_finalize(counts, ref, ["window_start"])
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "bin",
            "ref_frac",
            "cur_frac",
            "psi_term",
        )
        .collect()
    }
    assert got == want and got


def test_enrich_stream_scd2_matches_batch_interval_join(spark):
    """Point-in-time SCD2 enrichment: the streaming run equals the batch
    interval join row-for-row (the training/serving-skew guarantee), and
    events before any interval survive with NULL state."""
    from feature_store_implementation_spark.plans.inventory import (
        q_stream_scd2_enrich,
    )
    from feature_store_implementation_spark.streaming.features import (
        enrich_stream_scd2,
    )

    got = {tuple(r) for r in q_stream_scd2_enrich(spark, SF).collect()}
    assert got

    # batch equivalence via the SAME operator on batch frames
    e = load_table(spark, SF, "events")
    from pyspark.sql import Window as W

    nonp = e.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))).cast("int")
    runs = nonp.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(chg).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("run"),
    )
    g = runs.groupBy("user_id", "run").agg(
        F.min("event_type").alias("browse_state"), F.min("ts").alias("vf")
    )
    wr = W.partitionBy("user_id").orderBy("run")
    dim = g.select(
        "user_id",
        "browse_state",
        F.col("vf").alias("valid_from"),
        F.lead("vf").over(wr).alias("valid_to"),
    )
    batch = {
        tuple(r)
        for r in enrich_stream_scd2(e.filter(F.col("event_type") == "purchase"), dim)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "browse_state",
        )
        .collect()
    }
    assert got == batch


def test_sketch_profile_stream_accuracy_and_windows(spark, events_dir, tmp_path):
    """sketch_profile_stream over a real multi-trigger stream: window set
    and exact columns (n_events, sum_value) equal the batch run; the KLL
    quantiles — ORDER STATISTICS under the Datasketches inclusive-rank
    convention (smallest v with rank ≥ q), exact below the sketch's
    k=200 — equal the python order statistic for these small windows;
    the HLL user count lands within 5% of exact distinct."""
    import math
    from collections import defaultdict

    from feature_store_implementation_spark.streaming.features import (
        sketch_profile_stream,
    )

    batch_src = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    stream_src = read_events_stream(spark, events_dir)
    got = {
        r["window_start"]: r
        for r in _run_stream(
            spark,
            sketch_profile_stream(stream_src, watermark=None),
            tmp_path,
            mode="complete",
        ).collect()
    }
    rows = batch_src.select(
        F.date_trunc("hour", "ts").alias("w"), "value", "user_id"
    ).collect()
    vals, users = defaultdict(list), defaultdict(set)
    for r in rows:
        vals[r["w"]].append(float(r["value"]))
        users[r["w"]].add(r["user_id"])
    assert set(got) == set(vals) and len(got) > 0
    for w, v in vals.items():
        g = got[w]
        v = sorted(v)
        assert g["n_events"] == len(v)
        for q, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            want = round(v[max(0, math.ceil(q * len(v)) - 1)], 6)
            assert g[name] == want, (w, name, g[name], want)
        assert abs(g["approx_users"] - len(users[w])) <= max(0.05 * len(users[w]), 2)
        assert g["p50"] <= g["p95"] <= g["p99"]


def test_rate_source_tumbling_dedup_smoke(spark):
    """The stateful operators are not file-trigger-shaped: the SAME
    dedup_windowed_features pipeline (watermarked dropDuplicates → 
    tumbling append-mode aggregation) runs unchanged on a continuous
    `rate` source — the socket/Kafka-shaped source available without
    Kafka — with event time synthesized from the rate counter so
    watermarks advance fast. Every closed 1-minute window holds exactly
    600 raw counter ticks = 300 deduplicated events (each event_id is
    emitted exactly twice), so any emitted row with n_events != 300
    would mean dedup state or window finalization broke off the
    availableNow path."""
    import time
    import uuid

    from feature_store_implementation_spark.streaming.features import (
        dedup_windowed_features,
    )

    name = f"rate_smoke_{uuid.uuid4().hex[:8]}"
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1000)
        .load()
        .select(
            (F.col("value") / 2).cast("long").alias("event_id"),  # every id twice
            F.lit(1).cast("long").alias("user_id"),
            # event time fast-forwarded off the counter: 10 ticks per
            # event-second -> ~100 event-seconds per wall-second
            F.to_timestamp(
                F.lit("2026-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("value") / 10).cast("long"))
            ).alias("ts"),
            F.lit("rate").alias("event_type"),
            F.lit(1.0).alias("value"),
        )
    )
    out = dedup_windowed_features(src, width="1 minute", watermark="30 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql(f"select * from {name}").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)
    assert len(rows) >= 2, "rate stream emitted no closed windows"
    for r in rows:
        assert r["n_events"] == 300 and r["sum_value"] == 300.0
    # windows are distinct and aligned to the minute
    starts = [r["window_start"] for r in rows]
    assert len(set(starts)) == len(starts)
    assert all(s.second == 0 for s in starts)
    spark.catalog.dropTempView(name)


def test_streaming_dedup_ingest_fresh_checkpoint_new_data_no_loss(spark, tmp_path):
    """Restarting ingestion with a NEW checkpoint (old one lost) against
    the same out_path/index_path must not lose data: epoch ids restart at
    0, so without the query-id namespace the new stream's batch 0 would
    overwrite the old stream's batch-0 survivors AND its index append
    would short-circuit on the old segment, admitting all its future
    duplicates."""
    import glob
    import os
    import random

    from feature_store_implementation_spark.operators.dedup import (
        _read_index_signatures,
        minhash_index_query,
        minhash_index_write,
    )
    from feature_store_implementation_spark.streaming.features import (
        streaming_dedup_ingest,
    )

    rng = random.Random(11)
    words = [f"w{j}" for j in range(4000)]

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    first = mk([(i, " ".join(rng.sample(words, 60))) for i in range(8)])
    second = mk([(100 + i, " ".join(rng.sample(words, 60))) for i in range(8)])

    index = str(tmp_path / "index")
    minhash_index_write(mk([]).limit(0), index)  # empty base
    out = str(tmp_path / "out")

    def run(batch, ckpt):
        src = str(tmp_path / f"src_{ckpt}")
        os.makedirs(src)
        stage = str(tmp_path / f"stage_{ckpt}")
        batch.coalesce(1).write.parquet(stage)
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/c.parquet")
        stream = spark.readStream.schema(batch.schema).parquet(src)
        q = streaming_dedup_ingest(stream, index, out, str(tmp_path / ckpt))
        assert q.awaitTermination(300)

    run(first, "ckpt_a")
    run(second, "ckpt_b")  # fresh checkpoint, SAME out/index, NEW docs

    got = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    assert got == {r["doc_id"] for r in first.union(second).collect()}
    assert _read_index_signatures(spark, index).count() == 16
    # the second stream's docs are really IN the gate: their twins drop
    twins = second.select((F.col("doc_id") + 9000).alias("doc_id"), "text")
    hits = minhash_index_query(spark, twins, index, "text", "doc_id")
    assert hits.select("new_id").distinct().count() == 8


def test_streaming_dedup_ingest_refuses_legacy_flat_out_path(spark, tmp_path):
    """An out_path holding the pre-namespace FLAT layout
    (out_path/ingest_batch=N, no stream=<qid> level) is refused at
    stream start with migration instructions: writing the nested layout
    next to it would make spark.read.parquet(out_path) fail with
    'conflicting directory structures', silently bricking reads of
    previously-ingested data (ADVICE r9). A uniform nested out_path —
    including one produced by the documented stream=legacy migration —
    starts normally."""
    import os

    import pytest

    from feature_store_implementation_spark.operators.dedup import (
        minhash_index_write,
    )
    from feature_store_implementation_spark.streaming.features import (
        streaming_dedup_ingest,
    )

    index = str(tmp_path / "index")
    minhash_index_write(
        spark.createDataFrame([], "doc_id long, text string"), index
    )
    out = str(tmp_path / "out")
    legacy_part = os.path.join(out, "ingest_batch=0")
    os.makedirs(legacy_part)
    spark.createDataFrame([(1, "a b c")], "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(legacy_part)

    src = str(tmp_path / "src")
    os.makedirs(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with pytest.raises(RuntimeError, match="conflicting directory structures"):
        streaming_dedup_ingest(stream, index, out, str(tmp_path / "ckpt"))

    # the documented migration restores a startable layout
    os.makedirs(os.path.join(out, "stream=legacy"))
    os.rename(legacy_part, os.path.join(out, "stream=legacy", "ingest_batch=0"))
    q = streaming_dedup_ingest(stream, index, out, str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)
    assert spark.read.parquet(out).count() == 1  # legacy rows still readable


def test_stream_upsert_custom_key_col_and_insert_once(spark, events_dir, tmp_path):
    """key_col != 'entity_id' must work end-to-end (the frame's key column
    is renamed for storage — previously write_values threw on the missing
    entity_id column), and the documented INSERT-ONCE semantics hold: a
    second batch's row for an already-stored key is dropped, the first
    stored value wins."""
    from feature_store_implementation_spark.store.offline import OfflineStore
    from feature_store_implementation_spark.streaming.features import (
        stream_upsert_to_offline_store,
    )

    store = OfflineStore(spark, str(tmp_path / "store"))

    def run(src_rows, src_name, ck):
        import glob
        import os
        import shutil

        src = str(tmp_path / src_name)
        os.makedirs(src)
        stage = str(tmp_path / f"{src_name}_stage")
        spark.createDataFrame(
            src_rows, "user_id string, value string"
        ).coalesce(1).write.parquet(stage)
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/d.parquet")
        stream = spark.readStream.schema("user_id string, value string").parquet(src)
        q = stream_upsert_to_offline_store(
            stream, store, 5, str(tmp_path / ck), key_col="user_id"
        )
        assert q.awaitTermination(120)

    run([("u1", "10.0"), ("u2", "20.0")], "srcA", "ckA")
    run([("u1", "99.0"), ("u3", "30.0")], "srcB", "ckB")  # u1 already stored

    got = {
        (r["entity_id"], r["value"])
        for r in store.values_for_version(5).collect()
    }
    assert got == {("u1", "10.0"), ("u2", "20.0"), ("u3", "30.0")}


def test_streaming_dedup_ingest_collapses_same_id_within_batch(spark, tmp_path):
    """An at-least-once source can redeliver a doc twice INSIDE one
    micro-batch: same-id rows never form an a<b near-dup pair, so without
    an explicit collapse both copies land in the corpus and the index
    (review r10). Survivors must hold each id once."""
    import glob
    import os
    import shutil

    from feature_store_implementation_spark.operators.dedup import (
        _read_index_signatures,
        minhash_index_write,
    )
    from feature_store_implementation_spark.streaming.features import (
        streaming_dedup_ingest,
    )

    import random

    rng = random.Random(5)
    words = [f"w{j}" for j in range(3000)]
    texts = {i: " ".join(rng.sample(words, 60)) for i in range(4)}
    rows = [(i, texts[i]) for i in range(4)]
    rows += [(2, texts[2]), (3, texts[3])]  # exact same-id re-sends, one batch

    index = str(tmp_path / "index")
    minhash_index_write(
        spark.createDataFrame([], "doc_id long, text string"), index
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    stage = str(tmp_path / "stage")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(stage)
    shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], f"{src}/b.parquet")
    out = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = streaming_dedup_ingest(stream, index, out, str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)

    survivors = spark.read.parquet(out)
    assert survivors.count() == 4  # each id exactly once
    assert survivors.select("doc_id").distinct().count() == 4
    # the index holds one signature set per doc, not per delivery
    sigs = _read_index_signatures(spark, index)
    assert sigs.select("doc_id").distinct().count() == 4


def test_stream_snapshot_maintenance_equals_batch(fs, spark, tmp_path):
    """The streaming snapshot sink (foreachBatch: epoch-keyed store append
    + ledger-idempotent maintain): after the stream drains, the snapshot
    content must EQUAL a batch-maintained snapshot over the same rows —
    and a full replay (fresh checkpoint, same data) must change nothing."""
    import os

    from feature_store_implementation_spark.serving.online_snapshot import (
        read_online_snapshot,
    )
    from feature_store_implementation_spark.streaming.features import (
        stream_snapshot_maintenance,
    )

    t = fs.register_raw_table("t_ssm", {"required_columns": ["id", "amount"]})
    f = fs.create_feature("ssm_amt", t.id, "SUM(amount)", "numeric")
    v = fs.compute_version(
        f.id, "v1.0", [{"id": f"s{i:02d}", "amount": float(i)} for i in range(6)]
    )
    snap = str(tmp_path / "snap")
    fs.maintain_online_snapshot(snap, n_shards=2)  # mode=created

    # two micro-batches of new values arriving as files
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate([[("n1", "11.0"), ("n2", "12.0")], [("n3", "13.0")]]):
        spark.createDataFrame(rows, "entity_id string, value string").coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))

    def run(ck):
        stream = spark.readStream.schema("entity_id string, value string").option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        q = stream_snapshot_maintenance(
            stream, fs, v.id, snap, str(tmp_path / ck), available_now=True
        )
        q.awaitTermination(180)

    run("ck1")
    got = {
        (r["entity_id"], r["ssm_amt"])
        for r in read_online_snapshot(spark, snap).collect()
    }
    want = {(r["entity_id"], r["ssm_amt"]) for r in fs.serve_matrix().collect()}
    assert got == want
    assert ("n3", "13.0") in got and len(got) == 9

    n_before = fs.store.values_for_version(v.id).count()
    run("ck2")  # full replay, fresh checkpoint: append idempotent via store
    # content (fresh checkpoint = new query id => new txns, but the rows
    # are the same values; the snapshot must still equal the batch matrix)
    got2 = {
        (r["entity_id"], r["ssm_amt"])
        for r in read_online_snapshot(spark, snap).collect()
    }
    assert got2 == want

    # a replay of the SAME checkpoint is a strict no-op at the store level
    run("ck1")
    assert fs.store.values_for_version(v.id).count() == n_before + 3  # ck2 dup rows exist
