"""The storage-seam conformance suite: every `TableFormat` backend must
pass these six contracts (append-visible, concurrent-append,
kill-during-write, as-of, compaction, row-level delete) IDENTICALLY. Today that is the
manifest-segment backend; a future Delta backend (delta-spark is not
installable in this sandbox — pip is DNS-blocked) plugs into
`available_formats()` and runs this file unchanged. SCALING.md's
"Storage" section points here as the executable form of its
Delta-capability mapping."""

import time

import pytest
from pyspark.sql import functions as F

from feature_store_implementation_spark.store.table_format import available_formats

FORMATS = ["manifest", "delta"]


@pytest.fixture(params=FORMATS)
def fmt(request, spark, tmp_path):
    forms = available_formats(spark)
    if request.param not in forms:
        pytest.skip(f"{request.param} backend not available in this environment")
    return forms[request.param](spark, str(tmp_path / f"tbl-{request.param}"))


def _rows(spark, tag: str, n: int = 20):
    return spark.range(n).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("entity_id"),
        F.concat(F.lit(tag), F.lit(":"), F.col("id").cast("string")).alias("value"),
    )


def _vals(df):
    return sorted((r["entity_id"], r["value"]) for r in df.collect())


def test_contract_append_visible(spark, fmt):
    assert fmt.read(1).count() == 0
    assert fmt.append(1, _rows(spark, "a")) == 20
    assert _vals(fmt.read(1)) == _vals(_rows(spark, "a"))
    # versions are isolated
    fmt.append(2, _rows(spark, "other", 5))
    assert fmt.read(1).count() == 20 and fmt.read(2).count() == 5


def test_contract_concurrent_append_no_lost_update(spark, fmt):
    fmt.append(1, _rows(spark, "base", 5))
    # writer B commits fully INSIDE writer A's stage->commit window
    fmt.append(
        1,
        _rows(spark, "A", 10),
        before_commit=lambda: fmt.append(1, _rows(spark, "B", 10)),
    )
    got = _vals(fmt.read(1))
    want = sorted(
        _vals(_rows(spark, "base", 5)) + _vals(_rows(spark, "A", 10)) + _vals(_rows(spark, "B", 10))
    )
    assert got == want


def test_contract_kill_during_write_invisible_and_retryable(spark, fmt):
    fmt.append(1, _rows(spark, "keep", 5))
    with pytest.raises(RuntimeError, match="simulated crash"):
        fmt.append(1, _rows(spark, "dead", 10), crash_before_commit=True)
    assert _vals(fmt.read(1)) == _vals(_rows(spark, "keep", 5))
    # the retry commits cleanly alongside the invisible wreckage
    fmt.append(1, _rows(spark, "retry", 10))
    assert fmt.read(1).count() == 15


def test_contract_as_of_snapshot_survives_appends_and_compaction(spark, fmt):
    fmt.append(1, _rows(spark, "day0", 10))
    time.sleep(0.05)
    pin = time.time()
    time.sleep(0.05)
    fmt.append(1, _rows(spark, "day1", 10))
    assert _vals(fmt.read_as_of(1, pin)) == _vals(_rows(spark, "day0", 10))
    assert fmt.read(1).count() == 20
    # a LATER compaction must not retire what the snapshot saw
    fmt.compact(1)
    assert _vals(fmt.read_as_of(1, pin)) == _vals(_rows(spark, "day0", 10))
    assert fmt.read(1).count() == 20


def test_contract_compaction_shrinks_files_keeps_rows_spares_late_appends(spark, fmt):
    for i in range(6):
        fmt.append(1, _rows(spark, f"b{i}", 10))
    before = fmt.file_count(1)
    rows_before = _vals(fmt.read(1))
    # an append that lands mid-compaction keeps its own commit
    n_files = fmt.compact(
        1, before_commit=lambda: fmt.append(1, _rows(spark, "late", 10))
    )
    assert fmt.file_count(1) <= before  # late append's files count too
    assert n_files < before
    got = _vals(fmt.read(1))
    assert got == sorted(rows_before + _vals(_rows(spark, "late", 10)))


def test_contract_vacuum_collects_replaced_files_after_retention(spark, fmt):
    for i in range(4):
        fmt.append(1, _rows(spark, f"b{i}", 10))
    fmt.compact(1)
    rows = _vals(fmt.read(1))
    assert fmt.vacuum(min_age_seconds=10 * 3600) == []  # retention shields them
    removed = fmt.vacuum(min_age_seconds=0)
    assert removed  # the compacted-away originals
    assert _vals(fmt.read(1)) == rows  # live read untouched


def test_contract_delete_erases_subjects_and_spares_snapshots(spark, fmt):
    """Sixth contract: row-level delete removes exactly the targeted
    subjects from the live table; everything else — including a
    concurrent version and the pre-delete as-of snapshot — is untouched
    (retention mode: erased rows stay time-travel-resolvable until
    vacuum)."""
    fmt.append(1, _rows(spark, "a"))
    fmt.append(2, _rows(spark, "other", 5))
    before = time.time()
    time.sleep(0.02)

    assert fmt.delete(1, ["e3", "e7", "nope"]) == 2
    live = _vals(fmt.read(1))
    assert live == [
        (e, v) for e, v in _vals(_rows(spark, "a")) if e not in ("e3", "e7")
    ]
    assert fmt.read(2).count() == 5  # other versions untouched
    # pre-delete snapshot still shows the erased subjects
    snap = _vals(fmt.read_as_of(1, before))
    assert snap == _vals(_rows(spark, "a"))
    # idempotent: a second identical delete finds nothing
    assert fmt.delete(1, ["e3", "e7"]) == 0


def _apply_feed(feed_rows):
    """Replay a change feed into a multiset of (entity_id, value)."""
    from collections import Counter

    state = Counter()
    for r in sorted(feed_rows, key=lambda r: (r["_commit_ts"], r["_commit_segment"])):
        key = (r["entity_id"], r["value"])
        if r["_change_type"] == "insert":
            state[key] += 1
        else:
            state[key] -= 1
            if state[key] <= 0:
                del state[key]
    return sorted(state.elements())


def test_contract_change_feed_replays_to_table_state(spark, fmt):
    """Seventh contract: the change data feed over (None, now] — inserts
    from appends, deletes from erasures, nothing from compactions —
    replays to exactly the live table, and a windowed read costs only
    the window's commits."""
    fmt.append(1, _rows(spark, "day0", 10))
    time.sleep(0.02)
    mid = time.time()
    time.sleep(0.02)
    fmt.append(1, _rows(spark, "day1", 10))
    fmt.delete(1, ["e3"])  # removes day0:3 and day1:3
    fmt.compact(1)  # content-neutral: must contribute nothing

    feed = fmt.changes(1).collect()
    assert {r["_change_type"] for r in feed} == {"insert", "delete"}
    assert _apply_feed(feed) == _vals(fmt.read(1))

    # windowed: only commits strictly after `mid` (day1 append + delete)
    windowed = fmt.changes(1, since=mid).collect()
    inserts = [r for r in windowed if r["_change_type"] == "insert"]
    deletes = [r for r in windowed if r["_change_type"] == "delete"]
    assert _vals(spark.createDataFrame(inserts).select("entity_id", "value")) == _vals(
        _rows(spark, "day1", 10)
    )
    assert sorted((r["entity_id"], r["value"]) for r in deletes) == [
        ("e3", "day0:3"),
        ("e3", "day1:3"),
    ]


def test_contract_restore_is_metadata_only_new_commit(spark, fmt):
    """Eighth contract: restore rolls the live table back to any
    snapshot without touching data files, is itself a new commit (the
    rolled-back state stays time-travelable), and appends keep working
    afterwards."""
    fmt.append(1, _rows(spark, "day0", 10))
    time.sleep(0.02)
    pin = time.time()
    time.sleep(0.02)
    fmt.append(1, _rows(spark, "day1", 10))
    pre_restore = time.time()

    rep = fmt.restore(1, pin)
    assert rep["segment"] is not None
    time.sleep(0.02)
    post_restore = time.time()
    assert _vals(fmt.read(1)) == _vals(_rows(spark, "day0", 10))
    # the pre-restore state is still a valid time-travel target
    assert len(_vals(fmt.read_as_of(1, pre_restore))) == 20
    # restore to the current state is a no-op
    assert fmt.restore(1, time.time())["segment"] is None
    # life goes on: appends after a restore commit normally
    fmt.append(1, _rows(spark, "day2", 5))
    assert fmt.read(1).count() == 15
    # a feed window CONTAINING the restore refuses (resync contract) ...
    with pytest.raises(ValueError, match="RESTORE"):
        fmt.changes(1).collect()
    # ... but a window strictly after it streams normally
    after = fmt.changes(1, since=post_restore).collect()
    assert {r["_change_type"] for r in after} == {"insert"}
    assert len(after) == 5
