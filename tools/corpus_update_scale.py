"""O(increment) proof for update_pretraining_corpus: the same fixed-size
increment folds into a 1× and a 10× corpus; if the update is truly
increment-bound, wall time stays ~flat while the corpus grows 10×.

Builds the base (dedup_index=True) from the SF dir's documents, then times
ONE update with a 500-doc increment (half corpus dups — must drop through
the index — half fresh). Usage:

    python tools/corpus_update_scale.py [sf_dir]
    python tools/corpus_update_scale.py [sf_dir] --chain N [--maintain-every K]

Prints one JSON line:
    {"metric": "corpus_update", "sf_dir": ..., "corpus_docs": N,
     "build_seconds": ..., "increment_docs": 500, "update_seconds": ...,
     "committed": n, "dropped_vs_corpus": n}

``--chain N`` runs the PRODUCTION shape instead: N chained daily updates
with ``maintain_corpus`` interleaved every K (default 4) revisions — the
proof that update time stays FLAT in revision count (each update is
index-gated and increment-sized; maintenance keeps the manifest revision
list and the index segment count from growing without bound). Prints:
    {"metric": "corpus_update_chain", "revisions": [{"rev": i,
     "update_seconds": ..., "index_segments": n, "maintained": bool,
     "committed": n}, ...]}
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


def _chain(spark, sf_dir: str, n_rev: int, maintain_every: int) -> None:
    import os

    from feature_store_implementation_spark.pipelines.pretraining import (
        maintain_corpus,
    )

    d = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="corpus_chain_")
    try:
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
        sig_dir = os.path.join(out, "_dedup_index", "signatures")

        def n_segments() -> int:
            return len(
                [x for x in os.listdir(sig_dir) if x.startswith("seg-")]
            )

        base = d.orderBy("doc_id").limit(250)
        rows = []
        for i in range(1, n_rev + 1):
            # per-revision distinct increment: 250 corpus dups (new ids,
            # must drop through the index) + 250 fresh (revision-tagged
            # vocabulary rename — shares no shingles with anything prior)
            inc = base.select(
                (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
                "text",
                "lang",
            ).unionByName(
                base.select(
                    (F.col("doc_id") + 10_000_000 * i + 5_000_000).alias(
                        "doc_id"
                    ),
                    # content words only — see the non-chain synthesis note
                    F.regexp_replace(
                        F.col("text"), r"(\w{6,})", f"c{i}w$1x{i}"
                    ).alias("text"),
                    "lang",
                )
            ).localCheckpoint(eager=True)
            t0 = time.monotonic()
            rec = update_pretraining_corpus(inc, out)
            dt = time.monotonic() - t0
            maintained = i % maintain_every == 0
            if maintained:
                maintain_corpus(spark, out, compact_min_revisions=2)
            rows.append(
                {
                    "rev": i,
                    "update_seconds": round(dt, 2),
                    "index_segments": n_segments(),
                    "maintained": maintained,
                    "committed": sum(
                        v["rows"] for v in rec["splits"].values()
                    ),
                }
            )
        print(
            json.dumps(
                {
                    "metric": "corpus_update_chain",
                    "sf_dir": sf_dir,
                    "maintain_every": maintain_every,
                    "revisions": rows,
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    spark = get_spark("corpus_update_scale")
    if "--chain" in args:
        i = args.index("--chain")
        n_rev = int(args[i + 1])
        k = (
            int(args[args.index("--maintain-every") + 1])
            if "--maintain-every" in args
            else 4
        )
        sf_dir = args[0] if args and not args[0].startswith("--") else "/root/testdata/sf0.1"
        spark.sparkContext.setLogLevel("ERROR")
        _chain(spark, sf_dir, n_rev, k)
        return
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
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
            # rename CONTENT words only (≥6 chars): the short function
            # words the language-ID markers key on survive, so the fresh
            # docs pass the quality/language gates the update re-applies
            # (renaming every word NULLed predicted_lang and gate-dropped
            # the whole fresh half — committed=0, measuring nothing)
            F.regexp_replace(
                F.col("text"), r"(\w{6,})", r"fresh$1ment"
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
