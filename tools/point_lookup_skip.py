"""Measure manifest-level entity file skipping on the serving point-read.

Builds one feature version from N successive appends (the daily-increment
shape: each append range-partitioned over a disjoint entity slice — here
each covers the full space, so per-append FILES are disjoint slices), then
times `point_lookup` with the recorded entity_ranges versus the same store
with the ranges stripped from every segment (the pre-round-8 read path:
every committed file is opened). Also reports how many files each path
resolves. Usage:

    python tools/point_lookup_skip.py [n_appends] [rows_per_append] [files_per_append]

Prints one JSON line:
    {"metric": "point_lookup_skip", "n_appends": N, "total_files": F,
     "files_opened_skip": a, "files_opened_noskip": F,
     "p50_ms_skip": ..., "p50_ms_noskip": ...}
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from feature_store_implementation_spark.session import get_spark  # noqa: E402
from feature_store_implementation_spark.store.offline import OfflineStore  # noqa: E402


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def time_lookups(store, vid, entities, reps=3):
    ts = []
    for e in entities:
        for _ in range(reps):
            t0 = time.monotonic()
            n = store.point_lookup(vid, e).count()
            ts.append((time.monotonic() - t0) * 1000)
            assert n >= 1
    return ts


def main() -> None:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    files_per = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = get_spark("point_lookup_skip")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="plskip_")
    vid = 1
    try:
        store = OfflineStore(spark, root)
        # the write's range shuffle is AQE-coalesced to data size; pin the
        # advisory small so each synthetic append keeps ~files_per files
        # (at production append sizes this happens naturally)
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(max(1, (rows * 40) // files_per)),
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1kb"
        )
        for day in range(n_appends):
            batch = spark.range(rows).selectExpr(
                f"lpad(cast(id as string), 9, '0') as entity_id",
                f"cast(id * {day + 1} as string) as value",
            ).repartition(files_per)
            store.write_values(vid, batch)

        probes = [f"{i:09d}" for i in (7, rows // 3, rows - 1)]
        total = len(store._manifest_files(vid))
        opened_skip = len(store._manifest_files(vid, entity_ids=[probes[0]]))
        warm = time_lookups(store, vid, probes)  # warm-up + skip timing
        skip_ts = time_lookups(store, vid, probes)

        # strip the recorded ranges -> the pre-skipping read path
        import json as j
        import os

        seg_dir = store._segment_dir(vid)
        for name in os.listdir(seg_dir):
            if name.endswith(".json"):
                p = os.path.join(seg_dir, name)
                with open(p) as f:
                    doc = j.load(f)
                doc.pop("entity_ranges", None)
                with open(p, "w") as f:
                    j.dump(doc, f)
        opened_noskip = len(store._manifest_files(vid, entity_ids=[probes[0]]))
        noskip_ts = time_lookups(store, vid, probes)

        print(
            json.dumps(
                {
                    "metric": "point_lookup_skip",
                    "n_appends": n_appends,
                    "rows_per_append": rows,
                    "total_files": total,
                    "files_opened_skip": opened_skip,
                    "files_opened_noskip": opened_noskip,
                    "p50_ms_skip": round(pct(skip_ts, 50), 1),
                    "p95_ms_skip": round(pct(skip_ts, 95), 1),
                    "p50_ms_noskip": round(pct(noskip_ts, 50), 1),
                    "p95_ms_noskip": round(pct(noskip_ts, 95), 1),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
