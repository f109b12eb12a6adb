"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
final JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {headline name: sec}, "extras_total": sec, "sf": ...} — kept
under the driver's 2000-char stdout capture window (BENCH_r08/r09 were
unparseable because the old single fat line, with ~110 extras inline,
started before the window). Full per-query detail (headline spreads +
every extra timing) is written to BENCH_DETAIL.json beside this script.

Each query is executed once after a shared warm-up action (JVM + parquet
footer caches), timed end-to-end including the collect of results to the
driver (bounded result sets only — aggregates / top-k)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: one per operator family, weighted toward the
# shuffle-heavy shapes that dominate at scale.
HEADLINE = [
    "q_pricing_summary",
    "q_customer_total_spend",
    "q_join_inner",
    "q_join_left",
    "q_agg_nunique",
    "q_agg_stats",
    "q_window_topk",
    "q_window_rolling",
    "q_latest_per_group",
    "q_top10_global",
    "q_tumbling_window",
    "q_rollup",
    "q_asof_join",
    "q_session_window",
    "q_sliding_window",
    "q_grouping_sets",
    "q_dedup_exact",
    "q_similarity_topk",
    "q_token_count",
    "q_doc_fingerprint",
]

# Newer operators worth timing, reported under "extras" WITHOUT contributing
# to the headline total, so totals stay comparable as coverage grows.
EXTRAS = [
    "q_resample_ffill",
    "q_winsorize",
    "q_fuzzy_pairs",
    "q_array_lambda",
    "q_bigram_counts",
    "q_dedup_components",
    "q_window_cumedist",
    "q_minmax_scale",
    "q_hypertable_rollup",
    "q_shipping_priority",
    "q_copurchase_pairs",
    "q_share_of_total",
    "q_big_orders",
    "q_regional_volume",
    "q_nation_trade",
    "q_market_share",
    "q_product_profit",
    "q_returned_items",
    "q_order_priority",
    "q_small_qty_revenue",
    "q_idle_customers",
    "q_disjunctive_join",
    "q_heavy_hitters",
    "q_pagerank",
    "q_forecast_revenue",
    "q_customer_distribution",
    "q_promo_revenue",
    "q_top_supplier",
    "q_supplier_variety",
    "q_dominant_suppliers",
    "q_scd2_compact",
    "q_triangle_count",
    "q_embedding_quantize",
    "q_spearman",
    "q_user_entropy",
    "q_event_transitions",
    "q_session_paths",
    "q_resample_interpolate",
    "q_weighted_stats",
    "q_dq_report",
    "q_udaf_geomean",
    "q_scalar_pandas_udf",
    "q_media_chunks",
    "q_agg_mode",
    "q_null_safe_join",
    "q_filtered_similarity",
    "q_min_cost_supplier",
    "q_important_stock",
    "q_late_shipment_priority",
    "q_sole_late_supplier",
    "q_lateral_topk",
    "q_safe_casts",
    "q_variant_json",
    "q_pii_redact",
    "q_repetition_stats",
    "q_decontaminate",
    "q_portable_sample",
    "q_weighted_mix",
    "q_pack_sequences",
    "q_line_dedup",
    "q_embedding_neardup_lsh",
    "q_unigram_logprob",
    "q_mixture_weights",
    "q_dedup_canonical",
    "q_graph_bfs",
    "q_media_frames",
    "q_build_vocab",
    "q_inverted_index",
    "q_bm25",
    "q_mad_outliers",
    "q_token_count_bpe",
    "q_dedup_minhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_dedup_simhash_wide",
    "q_similarity_ivf_indexed",
    "q_semantic_dedup",
    "q_chunk_tokens",
    "q_dedup_incremental",
    "q_weighted_sample_wor",
    "q_dsir_weights",
    "q_soft_dedup",
    "q_cross_entropy",
    "q_random_projection",
    "q_pca_project",
    "q_dedup_index_grow",
    "q_stream_dedup_ingest",
    "q_bpe_train_encode",
    "q_hard_negatives",
    "q_drift_psi",
    "q_stream_scd2_enrich",
    "q_similarity_pq_adc",
    "q_leakage_split",
    "q_similarity_ivfpq",
    "q_corpus_shuffle",
    "q_quantile_digest",
    "q_audience_overlap",
    "q_hash_embed",
    "q_stream_sketch_profile",
    "q_warc_ingest",
    "q_text_normalize",
    "q_script_profile",
    "q_repeated_spans",
    "q_source_caps",
    "q_asof_nearest",
    "q_asof_tolerance",
    "q_stratified_quota",
    "q_cdc_merge",
    "q_zorder_key",
    "q_bloom_decontaminate",
    "q_gopher_rules",
    "q_change_feed",
    "q_snapshot_sync",
    "q_stream_snapshot_maint",
    "q_incremental_feature",
    "q_pretraining_corpus",
    "q_corpus_update",
    "q_html_extract",
    "q_url_parts",
    "q_pretrain_weighted",
    "q_ccnet_bins",
    "q_resample_weight",
    "q_domain_filter",
    "q_bigram_cross_entropy",
    "q_quality_classifier",
    "q_outlink_graph",
    "q_resolve_links",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from feature_store_implementation_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n.startswith("q_bench_") and n not in HEADLINE
    ]
    # EXTRAS are timed and reported but excluded from the headline total so
    # round-over-round totals stay comparable as coverage grows.
    extras = [n for n in EXTRAS if n in qs and n not in names]

    # warm-up: touch every table once so JIT/footer caches don't bill query 1
    from feature_store_implementation_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    # ...and one untimed aggregate so whole-stage-codegen/shuffle JIT paths
    # are compiled before the first timed query (same query set either way).
    # METHODOLOGY NOTE: this warm-up was added in round 2; the round-1
    # baseline timed its first query cold (~+1s on query 1). Round-2+ totals
    # are comparable with each other; vs round 1 subtract that cold-start
    # from the r1 number or compare per-query medians excluding query 1.
    if names:
        qs[names[0]](spark, sf_dir).count()

    # Each timed query runs under its own dedup cache_scope: signature /
    # shingle frames it caches release at the end of ITS run instead of
    # accumulating in the session-global window, where storage squatted by
    # earlier extras was measured (r8→r9) to slow later dedup-family
    # queries 1.4-1.6× in-harness while the same queries ran at r7 speed
    # in isolation. Per-query scoping makes every row's number a property
    # of that query's plan, not of the bench ordering.
    from feature_store_implementation_spark.operators.dedup import cache_scope

    # per-stage wall seconds for the two end-to-end pipeline extras, keyed
    # by that run's total — the run kept (the min) gets its OWN stage
    # breakdown recorded, so driver-to-driver pipeline drift is
    # attributable to a stage instead of arguing totals (r10 verdict)
    from feature_store_implementation_spark.pipelines import pretraining as _pt

    stage_samples: dict[str, dict[float, list]] = {}
    # q_corpus_update runs a FULL BASE BUILD inside the query before the
    # incremental update — exporting only the update's stages left ~11s
    # of its wall unattributed (r12 verdict item 3); both halves are
    # recorded now, prefixed so the stage table sums to ~the total
    _STAGE_GLOBALS = {
        "q_pretraining_corpus": (("", "LAST_BUILD_STAGE_SECONDS"),),
        "q_corpus_update": (
            ("build:", "LAST_BUILD_STAGE_SECONDS"),
            ("update:", "LAST_UPDATE_STAGE_SECONDS"),
        ),
    }

    def run(name: str) -> float:
        t0 = time.time()
        with cache_scope():
            df = qs[name](spark, sf_dir)
            if df.isStreaming is False:
                df.count()
        t = round(time.time() - t0, 3)
        if name in _STAGE_GLOBALS:
            entries: list = []
            for prefix, attr in _STAGE_GLOBALS[name]:
                entries += [(prefix + s, sec) for s, sec in getattr(_pt, attr)]
            stage_samples.setdefault(name, {})[t] = entries
        return t

    # Headline queries run REPS times each (interleaved round-robin so a
    # transient machine-load spike doesn't bias one query); per-query value
    # is the MEDIAN, with min/max spread reported so a noisy run is visible
    # in the output instead of being mistaken for a plan regression
    # (observed machine-load variance on identical code is ±25%). Extras run
    # once: they are informational and excluded from the headline total.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(reps):
        for name in names:
            samples[name].append(run(name))

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)

    timings = {name: median(samples[name]) for name in names}
    spread = {name: [min(samples[name]), max(samples[name])] for name in names}
    # Echo the RESOLVED parallelism so the driver can verify $SPARK_GRAFT_CPUS
    # was honored (r12 PERF flagged `suspect_cpus_ignored` because the flat
    # 8-vs-32-core ratios at sf0.1 — every headline query is overhead-bound
    # at 0.2-0.8s — were indistinguishable from an ignored env var without
    # the master/defaultParallelism echoed in the output).
    sc = spark.sparkContext
    resolved_master = sc.master
    default_parallelism = sc.defaultParallelism
    cpus_env = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # The driver's low-core rerun must not overwrite the default-core detail
    # file (r12: the c8 rerun destroyed the 32-core per-extra detail) — a
    # non-default core count writes BENCH_DETAIL_c{N}.json instead.
    detail_name = (
        "BENCH_DETAIL.json" if cpus_env == 32 else f"BENCH_DETAIL_c{cpus_env}.json"
    )
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               detail_name)
    # the COMMITTED prior round's extras (this file is overwritten below,
    # so read before): the drift-vs-noise reference for the min-of-3 rule
    sf_token = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_now = float(sf_token) if sf_token.replace(".", "").isdigit() else sf_token
    try:
        with open(detail_path) as f:
            _prior_doc = json.load(f)
        # priors are only a drift reference at the SAME scale factor — a
        # detail file committed at another SF would mark every extra
        # "regressed" (or mask every real regression) purely by scale
        prior_extras = (
            (_prior_doc.get("extras") or {})
            if _prior_doc.get("sf") == sf_now
            else {}
        )
    except (OSError, ValueError):
        prior_extras = {}
    extra_timings = {name: run(name) for name in extras}
    # Adaptive re-time: extras normally run once, but a single sample on a
    # loaded 32-core box has ±25% noise — r3's three "regressed" extras all
    # re-timed back under their old numbers. Anything slow enough to draw a
    # verdict (>1s) earns a second run; keep the min (load spikes only ever
    # add time). And when the min-of-2 STILL sits >1.5× above the committed
    # prior, a third sample self-adjudicates (r11 verdict task 3: three
    # extras drifted ≥2.5× driver-to-driver on untouched code and stayed
    # `weak` for a round because min-of-2 couldn't rule out back-to-back
    # load spikes) — noise clears on the extra run; a real regression
    # survives min-of-3 and is then worth believing.
    retimed3: list[str] = []
    for name, t in list(extra_timings.items()):
        if t > 1.0:
            extra_timings[name] = min(t, run(name))
        prior = prior_extras.get(name)
        if (
            prior
            and extra_timings[name] > 1.0
            and extra_timings[name] > 1.5 * prior
        ):
            extra_timings[name] = min(extra_timings[name], run(name))
            retimed3.append(name)
    total = round(sum(timings.values()), 3)
    sf_val = sf_now
    # The per-query detail (headline spreads + every extra) is too large
    # for the driver's stdout capture, which keeps only the LAST 2000
    # characters and json-parses the final line — BENCH_r08/r09 recorded
    # "parsed": null because the single fat JSON line started before the
    # capture window. So: full detail goes to BENCH_DETAIL.json next to
    # this script (committed per round → extras history lives in git),
    # and the final stdout line is a COMPACT summary guaranteed to fit
    # the capture window (headline medians only, ~800 chars).
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "spread": spread,
        "extras": extra_timings,
        "extras_total": round(sum(extra_timings.values()), 3),
        # extras that exceeded 1.5x their committed prior after min-of-2
        # and earned the third sample — if a name keeps appearing here
        # across rounds at an elevated number, it is a real regression
        "extras_min3": sorted(retimed3),
        # stage breakdown OF THE RUN THAT WAS KEPT (min total per query)
        "stage_seconds": {
            name: by_t[min(by_t)] for name, by_t in stage_samples.items() if by_t
        },
        "cpus": cpus_env,
        "master": resolved_master,
        "default_parallelism": default_parallelism,
        "sf": sf_val,
    }
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(f"per-query detail ({len(extra_timings)} extras) -> {detail_path}")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "reps": reps,
                "extras_total": detail["extras_total"],
                "n_extras": len(extra_timings),
                "detail": detail_name,
                "cpus": cpus_env,
                "master": resolved_master,
                "default_parallelism": default_parallelism,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
