"""O(increment) proof for update_pretraining_corpus: the same fixed-size
increment folds into a 1× and a 10× corpus; if the update is truly
increment-bound, wall time stays ~flat while the corpus grows 10×.

Builds the base (dedup_index=True) from the SF dir's documents, then times
ONE update with a 500-doc increment (half corpus dups — must drop through
the index — half fresh). Usage:

    python tools/corpus_update_scale.py [sf_dir]

Prints one JSON line:
    {"metric": "corpus_update", "sf_dir": ..., "corpus_docs": N,
     "build_seconds": ..., "increment_docs": 500, "update_seconds": ...,
     "committed": n, "dropped_vs_corpus": n}
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
    update_pretraining_corpus,
)
from feature_store_implementation_spark.session import get_spark  # noqa: E402
from feature_store_implementation_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("corpus_update_scale")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()

    # fixed-size increment regardless of corpus size: 250 corpus dups
    # (re-sent under new ids) + 250 fresh docs synthesized from corpus text
    # by a vocabulary rename (shares no shingles with the original)
    dups = d.orderBy("doc_id").limit(250).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "lang"
    )
    fresh = (
        d.orderBy("doc_id")
        .limit(250)
        .select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), r"(\w+)", r"fresh$1ment"
            ).alias("text"),
            "lang",
        )
    )
    increment = dups.unionByName(fresh).localCheckpoint(eager=True)

    out = tempfile.mkdtemp(prefix="corpus_upd_scale_")
    try:
        t0 = time.monotonic()
        build_pretraining_corpus(
            d,
            out,
            languages=("en", "fr", "de", "es", "zh"),
            semantic=False,
            split_fractions={"train": 0.9, "valid": 0.05, "test": 0.05},
            n_shards=4,
            seed=42,
            dedup_index=True,
        )
        build_s = time.monotonic() - t0
        t0 = time.monotonic()
        rec = update_pretraining_corpus(increment, out)
        update_s = time.monotonic() - t0
        by_stage = {s["stage"]: s["n_docs"] for s in rec["stages"]}
        print(
            json.dumps(
                {
                    "metric": "corpus_update",
                    "sf_dir": sf_dir,
                    "corpus_docs": n_docs,
                    "build_seconds": round(build_s, 2),
                    "increment_docs": increment.count(),
                    "update_seconds": round(update_s, 2),
                    "committed": by_stage.get("split", 0),
                    "dropped_vs_corpus": by_stage.get(
                        "lexical_dedup_within", 0
                    )
                    - by_stage.get("lexical_dedup_vs_corpus", 0),
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
