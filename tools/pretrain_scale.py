"""Pretraining-build scale point: run build_pretraining_corpus (the
round-8 end-to-end pipeline, pipelines/pretraining.py) on an arbitrary SF
directory with the driver row's exact configuration (inventory
q_pretraining_corpus) and record per-stage survivor counts + wall time.

Run at sf0.1 and at the 10× replica (tools/build_sf_replica.py --mult 10
--out .sf1) to measure how the WHOLE chain grows — the per-operator growth
sweeps (SCALING.md) cover each stage in isolation; this covers their
composition, including the cross-stage localCheckpoints and the per-split
shard ranks. Usage:

    python tools/pretrain_scale.py [sf_dir]

Prints one JSON line:
    {"metric": "pretrain_build", "sf_dir": ..., "n_docs": N,
     "seconds": ..., "stages": [{"stage": ..., "n_docs": ...}, ...],
     "splits": {...}, "pack_chunks": N}
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from feature_store_implementation_spark.pipelines.pretraining import (  # noqa: E402
    build_pretraining_corpus,
)
from feature_store_implementation_spark.session import get_spark  # noqa: E402
from feature_store_implementation_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pretrain_scale")
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    eval_df = d.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    out = tempfile.mkdtemp(prefix="pretrain_scale_")
    t0 = time.monotonic()
    try:
        m = build_pretraining_corpus(
            d,
            out,
            languages=("en", "fr", "de", "es", "zh"),
            eval_df=eval_df,
            mixture_alpha=0.5,
            mixture_col="lang",
            split_fractions={"train": 0.9, "valid": 0.05, "test": 0.05},
            n_shards=4,
            seed=42,
        )
        secs = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "metric": "pretrain_build",
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "seconds": round(secs, 2),
                    "stages": m["stages"],
                    "splits": {
                        k: v["rows"] for k, v in sorted(m["splits"].items())
                    },
                    "pack_chunks": m["pack"]["n_chunks"],
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
