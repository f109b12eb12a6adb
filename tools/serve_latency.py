"""Serving-path latency micro-bench: p50/p95 for FeatureStore.serve_vector
cold (one-plan join + decode) vs warm (TTL-cache hit), over ~100 entities
built from the sf0.1 customer table.

The reference's raison d'être is this path (main.py:249-336 + cache.py);
every other surface has recorded numbers (BENCH_r*.json, SCALING.md) — this
records the last one. Usage:

    python tools/serve_latency.py [sf_dir] [n_entities]

Prints one JSON line:
    {"metric": "serve_vector_latency", "sf": ..., "n_entities": N,
     "cold_p50_ms": ..., "cold_p95_ms": ..., "warm_p50_ms": ...,
     "warm_p95_ms": ..., "warm_spark_jobs": 0}
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from feature_store_implementation_spark.serving.vectors import FeatureStore  # noqa: E402
from feature_store_implementation_spark.session import get_spark  # noqa: E402
from feature_store_implementation_spark.sources.tables import load_table  # noqa: E402


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spark = get_spark("serve_latency")
    root = tempfile.mkdtemp(prefix="serve_latency_")
    try:
        fs = FeatureStore(spark, root)
        cust = load_table(spark, sf_dir, "customer")
        t = fs.register_raw_table(
            "customers", {"required_columns": ["id", "amount"]}, "acct balances"
        )
        data = cust.select(
            F.col("c_custkey").cast("string").alias("id"),
            F.col("c_acctbal").cast("double").alias("amount"),
        )
        f1 = fs.create_feature("acctbal_sum", t.id, "SUM(amount)", "numeric")
        f2 = fs.create_feature("acct_count", t.id, "COUNT(*)", "numeric")
        fs.compute_version(f1.id, "v1.0", data)
        fs.compute_version(f2.id, "v1.0", data)

        entities = [str(r["c_custkey"]) for r in cust.limit(n_entities).collect()]

        cold, warm = [], []
        for e in entities:
            t0 = time.perf_counter()
            v = fs.serve_vector(e)
            cold.append((time.perf_counter() - t0) * 1000)
            assert set(v.features) == {"acctbal_sum", "acct_count"}

        # warm pass: every key is in the TTL cache; also prove zero Spark
        # jobs run by scoping a job group around the whole pass
        sc = spark.sparkContext
        sc.setJobGroup("serve-warm-probe", "warm serve_vector pass")
        try:
            before = set(sc.statusTracker().getJobIdsForGroup("serve-warm-probe"))
            for e in entities:
                t0 = time.perf_counter()
                fs.serve_vector(e)
                warm.append((time.perf_counter() - t0) * 1000)
            after = set(sc.statusTracker().getJobIdsForGroup("serve-warm-probe"))
        finally:
            sc.setJobGroup(None, None)
        warm_jobs = len(after - before)

        # stampede: 16 concurrent clients, ONE cold key — single-flight
        # must run the plan once; p95 ≈ the one compute (+ coalescing)
        import threading

        fs.cache.clear()
        stampede_entity = entities[0]
        computes = []
        orig = fs._serve_vector_uncached

        def counting(key, entity_id, feature_names, version):
            computes.append(entity_id)
            return orig(key, entity_id, feature_names, version)

        fs._serve_vector_uncached = counting
        stampede: list[float] = []
        lock = threading.Lock()

        def client():
            t0 = time.perf_counter()
            fs.serve_vector(stampede_entity)
            dt = (time.perf_counter() - t0) * 1000
            with lock:
                stampede.append(dt)

        threads = [threading.Thread(target=client) for _ in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        fs._serve_vector_uncached = orig

        # snapshot tier: one bulk export, then shard-routed point reads
        # with NO Spark job (serving/online_snapshot.py) — the latency
        # floor of the layout a KV store would bulk-ingest
        from feature_store_implementation_spark.serving.online_snapshot import (
            lookup_online_snapshot,
        )

        snap_root = tempfile.mkdtemp(prefix="serve_snap_")
        try:
            import os

            snap_dir = os.path.join(snap_root, "snapshot")  # write-once dir
            fs.export_online_snapshot(snap_dir, n_shards=16)
            snap: list[float] = []
            for e in entities:
                t0 = time.perf_counter()
                v = lookup_online_snapshot(snap_dir, e)
                snap.append((time.perf_counter() - t0) * 1000)
                assert set(v.features) == {"acctbal_sum", "acct_count"}
            snap_p50, snap_p95 = pct(snap, 50), pct(snap, 95)
        finally:
            shutil.rmtree(snap_root, ignore_errors=True)

        print(
            json.dumps(
                {
                    "metric": "serve_vector_latency",
                    "sf": sf_dir,
                    "n_entities": len(entities),
                    "cold_p50_ms": round(pct(cold, 50), 1),
                    "cold_p95_ms": round(pct(cold, 95), 1),
                    "warm_p50_ms": round(pct(warm, 50), 3),
                    "warm_p95_ms": round(pct(warm, 95), 3),
                    "warm_spark_jobs": warm_jobs,
                    "stampede_clients": 16,
                    "stampede_computes": len(computes),
                    "stampede_p50_ms": round(pct(stampede, 50), 1),
                    "stampede_p95_ms": round(pct(stampede, 95), 1),
                    "snapshot_p50_ms": round(snap_p50, 3),
                    "snapshot_p95_ms": round(snap_p95, 3),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
