"""Growth check for merge_changes (the q_cdc_merge operator): a FIXED-size
CDC changeset merged into snapshots of growing size. If the merge is
anti-join-bound the way the plan claims (one shuffle of base on the key, or
zero when AQE broadcasts the small changeset side), wall time grows ~linearly
in the SNAPSHOT scan (the irreducible term) and never in changes × base.

Also times the change-feed window read that FEEDS a real merge:
write_values base → one delete + one append revision → changes_for_version
over just that window, asserting the read is O(window) (rows returned ==
window rows, and wall time is flat in base size).

Usage:  python tools/cdc_merge_scale.py [sf_dir ...]
        (default: /root/testdata/sf0.1 — pass the 10x replica dir too for
         the growth row, e.g. `.sf1`)

Prints one JSON line per sf_dir:
    {"metric": "cdc_merge_scale", "sf_dir": ..., "base_rows": N,
     "changes": C, "merge_s": ..., "merged_rows": M,
     "feed_window_rows": W, "feed_read_s": ...}
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from feature_store_implementation_spark.operators.incremental import (  # noqa: E402
    merge_changes,
)
from feature_store_implementation_spark.session import get_spark  # noqa: E402
from feature_store_implementation_spark.sources.tables import load_table  # noqa: E402
from feature_store_implementation_spark.store.offline import OfflineStore  # noqa: E402

N_CHANGES = 1_000  # fixed: the merge cost must not scale with this × base


def one_dir(spark, sf_dir: str) -> dict:
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    n_base = base.count()

    # fixed-size changeset: updates for N/2 existing keys (md5-stable
    # choice), inserts for N/2 fresh keys, deletes folded into the update
    # half via op D on every 10th
    picked = (
        base.withColumn("__r", F.md5(F.col("o_orderkey").cast("string")))
        .orderBy("__r")
        .limit(N_CHANGES // 2)
        .drop("__r")
    )
    updates = picked.withColumn(
        "op", F.when(F.col("o_orderkey") % 10 == 0, F.lit("D")).otherwise(F.lit("U"))
    ).withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    inserts = (
        spark.range(N_CHANGES // 2)
        .select(
            (F.col("id") + 900_000_000).alias("o_orderkey"),
            F.lit(1).alias("o_custkey"),
            F.lit(1.0).alias("o_totalprice"),
            F.lit("O").alias("o_orderstatus"),
            F.lit("I").alias("op"),
        )
    )
    changes = updates.unionByName(inserts).localCheckpoint(eager=True)
    n_changes = changes.count()

    t0 = time.time()
    merged = merge_changes(base, changes, ["o_orderkey"])
    n_merged = merged.count()
    merge_s = round(time.time() - t0, 3)

    # --- change-feed window read: O(window), not O(table) -----------------
    root = tempfile.mkdtemp(prefix="cdc_scale_")
    try:
        store = OfflineStore(spark, f"{root}/store")
        vals = base.select(
            F.col("o_orderkey").cast("string").alias("entity_id"),
            (F.col("o_totalprice") * 100).cast("long").cast("string").alias("value"),
        )
        store.write_values(1, vals)
        time.sleep(0.05)
        t_since = time.time()  # window opens AFTER the base load
        del_ids = [r["entity_id"] for r in vals.limit(50).collect()]
        store.delete_rows(1, entity_ids=del_ids)
        store.write_values(
            1,
            spark.createDataFrame(
                [(i, "999") for i in del_ids], ["entity_id", "value"]
            ),
        )
        t1 = time.time()
        feed = store.changes_for_version(1, since=t_since)
        w_rows = feed.count()
        feed_s = round(time.time() - t1, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    return {
        "metric": "cdc_merge_scale",
        "sf_dir": sf_dir,
        "base_rows": n_base,
        "changes": n_changes,
        "merge_s": merge_s,
        "merged_rows": n_merged,
        "feed_window_rows": w_rows,
        "feed_read_s": feed_s,
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("cdc-merge-scale")
    for d in dirs:
        print(json.dumps(one_dir(spark, d)))


if __name__ == "__main__":
    main()
