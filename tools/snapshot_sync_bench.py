"""Incremental snapshot sync vs full re-export: the measured A/B behind
SCALING.md's "Online snapshot freshness" row.

Builds a feature version over the sf customer table, exports the online
snapshot, mutates a small fraction of entities (delete+append — the CDC
upsert shape), then times (a) sync_online_snapshot (change-feed driven,
rewrites only the touched shards) against (b) a full re-export, and
verifies both produce the identical snapshot content.

Usage:  python tools/snapshot_sync_bench.py [sf_dir] [churn_fraction] [table]

``table`` ∈ {customer (15k rows @sf0.1), orders (150k), lineitem (600k)} —
three sizes of the SAME experiment, to show sync cost is flat in snapshot
size while re-export is linear.

Prints one JSON line:
    {"metric": "snapshot_sync_vs_reexport",
                    "table": table, "rows": N, "changed": C,
     "n_shards": S, "shards_rewritten": K, "sync_s": ..., "reexport_s": ...,
     "speedup": ...}
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from feature_store_implementation_spark.serving.online_snapshot import (  # noqa: E402
    read_online_snapshot,
)
from feature_store_implementation_spark.serving.vectors import FeatureStore  # noqa: E402
from feature_store_implementation_spark.session import get_spark  # noqa: E402
from feature_store_implementation_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    churn = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    table = sys.argv[3] if len(sys.argv) > 3 else "orders"
    spark = get_spark("snapshot-sync-bench")
    root = tempfile.mkdtemp(prefix="sync_bench_")
    try:
        fs = FeatureStore(spark, f"{root}/fstore")
        src = load_table(spark, sf_dir, table)
        t = fs.register_raw_table("src", {"required_columns": ["id", "amount"]})
        f = fs.create_feature("balance", t.id, "SUM(amount)", "numeric")
        v = fs.catalog.create_version(f.id, "v1.0")  # born active
        rows = {
            "customer": lambda d: d.select(
                F.col("c_custkey").cast("string").alias("entity_id"),
                F.col("c_acctbal").cast("string").alias("value"),
            ),
            "orders": lambda d: d.select(
                F.col("o_orderkey").cast("string").alias("entity_id"),
                F.col("o_totalprice").cast("string").alias("value"),
            ),
            "lineitem": lambda d: d.select(
                F.concat_ws("-", "l_orderkey", "l_linenumber").alias("entity_id"),
                F.col("l_extendedprice").cast("string").alias("value"),
            ),
        }[table](src)
        fs.store.write_values(v.id, rows)
        n = rows.count()

        n_shards = 64
        snap = f"{root}/snap"
        fs.export_online_snapshot(snap, n_shards=n_shards)

        # mutate churn·n entities: erase + re-append with a new value
        changed_ids = [
            str(r["entity_id"])
            for r in rows.orderBy(F.xxhash64("entity_id"))
            .limit(max(1, int(churn * n)))
            .collect()
        ]
        fs.store.delete_rows(v.id, entity_ids=changed_ids)
        fresh = spark.createDataFrame(
            [(e, "9999.0") for e in changed_ids], "entity_id string, value string"
        )
        fs.store.write_values(v.id, fresh)

        t0 = time.monotonic()
        rep = fs.sync_online_snapshot(snap)
        sync_s = time.monotonic() - t0

        snap2 = f"{root}/snap2"
        t0 = time.monotonic()
        fs.export_online_snapshot(snap2, n_shards=n_shards)
        reexport_s = time.monotonic() - t0

        a = {
            (r["entity_id"], r["balance"])
            for r in read_online_snapshot(spark, snap).collect()
        }
        b = {
            (r["entity_id"], r["balance"])
            for r in read_online_snapshot(spark, snap2).collect()
        }
        assert a == b, f"sync diverged from re-export: {len(a ^ b)} rows differ"

        print(
            json.dumps(
                {
                    "metric": "snapshot_sync_vs_reexport",
                    "table": table,
                    "rows": n,
                    "changed": rep["changed_entities"],
                    "n_shards": n_shards,
                    "shards_rewritten": rep["shards_rewritten"],
                    "sync_s": round(sync_s, 3),
                    "reexport_s": round(reexport_s, 3),
                    "speedup": round(reexport_s / max(sync_s, 1e-9), 2),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
