"""Physical-plan quality guards: the scale properties the engine is designed
around (broadcast dims, parquet pushdown/pruning, top-k pushdown, single-
shuffle as-of) must survive refactors. These assert on the formatted plan,
not timings, so they are stable on any machine."""

import re

from feature_store_implementation_spark.plans import inventory as inv

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = inv.SPECS[name].fn(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_dim_join_is_broadcast(spark):
    plan = _plan(spark, "q_customer_total_spend")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filters_and_columns_pushed_to_scan(spark):
    plan = _plan(spark, "q_proj_filter")
    assert "GreaterThanOrEqual(l_shipdate" in plan  # predicate reached parquet
    read_schema = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "l_tax" not in read_schema and "l_returnflag" not in read_schema


def test_latest_per_group_uses_topk_pushdown(spark):
    assert "WindowGroupLimit" in _plan(spark, "q_latest_per_group")


def test_asof_join_is_single_shuffle(spark):
    plan = _plan(spark, "q_asof_join")
    # formatted output lists each node twice (tree + detail); count headers
    shuffles = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(shuffles) == 1


def test_similarity_avoids_cartesian(spark):
    plan = _plan(spark, "q_similarity_topk")
    assert "CartesianProduct" not in plan


def test_scalar_subquery_broadcasts_aggregate(spark):
    plan = _plan(spark, "q_scalar_subquery")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" in plan


def test_shipping_priority_plan_shape(spark):
    plan = _plan(spark, "q_shipping_priority")
    # every table's filter reached its own parquet scan
    assert "IsNotNull(c_mktsegment)" in plan or "EqualTo(c_mktsegment" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    # filtered customer side broadcasts; top-10 never materializes a global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_copurchase_self_join_extracts_equi_key(spark):
    plan = _plan(spark, "q_copurchase_pairs")
    # the mixed predicate (orderkey equality + partkey inequality) must
    # compile to a hash join keyed on l_orderkey with the inequality as a
    # residual condition — a nested-loop/cartesian here is O(n^2) at scale
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_big_orders_broadcasts_tiny_having_result(spark):
    # the HAVING-filtered aggregate is tiny: it must broadcast into orders,
    # and that result into customer — neither big table may shuffle-join
    plan = _plan(spark, "q_big_orders")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_regional_volume_broadcasts_dim_chain(spark):
    # Q5 shape: region→nation→supplier all broadcast; lineitem and orders
    # are the only shuffle participants; the region filter reaches its scan
    plan = _plan(spark, "q_regional_volume")
    assert "EqualTo(r_name,ASIA)" in plan or "IsNotNull(r_name)" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_nation_trade_pushes_ship_window_to_scan(spark):
    plan = _plan(spark, "q_nation_trade")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan


def test_order_priority_exists_is_semi_join(spark):
    # the correlated EXISTS must compile to ONE semi join keyed on the
    # order key (non-equi ships-late predicate as residual), never a
    # per-order re-scan and never a row-multiplying inner join + distinct
    plan = _plan(spark, "q_order_priority")
    assert "LeftSemi" in plan
    assert "HashAggregate" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_disjunctive_join_extracts_equi_key(spark):
    # Q19 shape: OR'd cross-side predicates must NOT defeat hash-join
    # extraction of the p_partkey = l_partkey conjunct
    plan = _plan(spark, "q_disjunctive_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_small_qty_revenue_single_partkey_shuffle(spark):
    # Q17 shape: per-part average via ONE window shuffle on l_partkey —
    # no self-join of lineitem against a re-aggregated copy of itself
    plan = _plan(spark, "q_small_qty_revenue")
    assert plan.count("Exchange hashpartitioning(l_partkey") <= 1
    assert "Window" in plan


def test_idle_customers_anti_join_and_scalar_broadcast(spark):
    plan = _plan(spark, "q_idle_customers")
    assert "LeftAnti" in plan
    # the one-row stats frame must come in as a broadcast, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    # storage-partitioned fact + selective dim filter: the fact scan must
    # receive a runtime partition filter (DPP), reading 1/10th of the files
    # — at 100 TB this is the difference between scanning one partition and
    # scanning the lake
    from pyspark.sql import functions as F

    fact = spark.range(0, 20000).select(
        "id", (F.col("id") % 10).alias("part_year"), (F.col("id") * 2).alias("v")
    )
    fact.write.partitionBy("part_year").parquet(str(tmp_path / "fact"))
    dim = spark.createDataFrame(
        [(i, "pick" if i == 3 else "skip") for i in range(10)],
        "part_year long, flag string",
    )
    j = (
        spark.read.parquet(str(tmp_path / "fact"))
        .join(dim.filter(F.col("flag") == "pick"), "part_year")
        .agg(F.sum("v").alias("total"))
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruningexpression" in plan
    assert j.collect()[0]["total"] == sum(i * 2 for i in range(20000) if i % 10 == 3)


def test_lateral_topk_decorrelates_to_window(spark):
    # the correlated LATERAL + LIMIT must become a window top-k (one
    # shuffle), never a per-outer-row re-scan of customer
    plan = _plan(spark, "q_lateral_topk")
    assert "WindowGroupLimit" in plan  # top-k pushdown, not a full sort
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2  # each table once


def test_runtime_bloom_filter_protects_smj_fact_scan(spark):
    # when a selective filter sits on one side of a NON-broadcast join (the
    # 100 TB case: both sides too big to broadcast), Spark must inject a
    # runtime bloom filter so the big side's scan drops non-joining rows
    # before the shuffle — the sort-merge-join safety net this engine
    # relies on when dims outgrow the broadcast threshold
    from pyspark.sql import functions as F

    from feature_store_implementation_spark.sources.tables import load_table

    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sf = "/root/testdata/sf0.001"
        o = (
            load_table(spark, sf, "orders")
            .filter(F.col("o_totalprice") > 450000)
            .select("o_orderkey")
        )
        li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
        j = li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.sum("l_quantity").alias("qty")
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan  # the filter is APPLIED on the fact side
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)


def test_ntile_window_is_partitioned_not_global(spark):
    # ntile/percent_rank over a base table must NOT be a single-partition
    # window over the raw scan (a 100×-scale killer). The two-pass rank keeps
    # every base-table window partitioned by the range bin; the only
    # unpartitioned window allowed is over the tiny per-bin counts aggregate.
    plan = _plan(spark, "q_window_ntile")
    assert "width_bucket" in plan  # deterministic range binning present
    assert "hashpartitioning(_bin" in plan  # base-table window is partitioned
    # the raw-table window carries the bin partition key; no window in the
    # plan orders the full table globally (global ntile would show
    # "Window [ntile(4)..." with an empty partition spec over the scan)
    assert "ntile(4)" not in plan


def test_pack_sequences_window_is_bin_partitioned(spark):
    # the corpus-wide cumsum must run per range-bin, never as one
    # unpartitioned window over the scan (same pin as q_window_ntile)
    plan = _plan(spark, "q_pack_sequences")
    assert "width_bucket" in plan
    assert "hashpartitioning(_bin" in plan


def test_embedding_neardup_lsh_no_unbucketed_selfjoin(spark):
    # VERDICT r3 item 3: the default embedding near-dup route must never
    # self-join without a bucket key. Candidates come from the (table,
    # bucket) grouping; the only joins are the hash joins back to vectors.
    plan = _plan(spark, "q_embedding_neardup_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(tbl" in plan  # capped in-bucket pair gen


def test_ngram_jaccard_candidates_join_on_shingle(spark):
    # VERDICT r3 item 6: candidate generation is the inverted-index join
    # keyed on the shingle — never an all-pairs join inside a language
    # block (lang at corpus scale is one giant block).
    plan = _plan(spark, "q_dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "shingle" in plan  # posting-list key present in the join


def test_simhash_pair_gen_is_bucket_grouped(spark):
    # VERDICT r3 item 2: simhash candidates come from the capped
    # collect_set per (band, bucket) — no unbounded band self-join.
    plan = _plan(spark, "q_dedup_simhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(band" in plan


def test_new_text_queries_prune_scan_columns(spark):
    # the documents table carries lang/n_chars the queries never touch;
    # a scan reading them at 100 TB is pure waste — pin the pruning
    for name, banned in (
        ("q_line_dedup", ("lang", "n_chars")),
        ("q_unigram_logprob", ("lang", "source", "n_chars")),
    ):
        plan = _plan(spark, name)
        for rs in re.findall(r"ReadSchema: (\S+)", plan):
            for col in banned:
                assert col not in rs, (name, rs)


def test_chunk_tokens_is_shuffle_free(spark):
    """Token-window chunking must stay a narrow transform of the document
    scan (sequence/slice/explode map-side) — any Exchange would mean the
    chunker started shuffling the corpus for no reason."""
    plan = _plan(spark, "q_chunk_tokens")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode is there, map-side


def test_weighted_sample_wor_is_shuffle_free_topk(spark):
    """A-ES weighted sampling must compile to ONE TakeOrderedAndProject
    (per-partition heaps + driver merge) over the scan — no Exchange, no
    global sort materialized."""
    import re as _re

    plan = _plan(spark, "q_weighted_sample_wor")
    assert "TakeOrderedAndProject" in plan
    assert not _re.findall(r"^\(\d+\) Exchange", plan, flags=_re.M)
    assert "Sort " not in plan  # TakeOrdered subsumes the ordering


def test_hard_negatives_broadcasts_anchors(spark):
    """The anchor side (tiny) broadcasts through the inequality join —
    corpus never shuffles for candidate generation (the only Exchanges
    are the per-anchor window and the final projection lineage)."""
    plan = _plan(spark, "q_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan  # label != label has no equi-key
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_drift_psi_scans_value_column_only(spark):
    """Each PSI side is one aggregation over the value column alone —
    column pruning must reach both scans; the global windows run over
    ≤bins aggregate rows (documented), never the corpus."""
    import re as _re

    plan = _plan(spark, "q_drift_psi")
    for rs in _re.findall(r"ReadSchema: (\S+)", plan):
        assert "value" in rs and "event_type" not in rs and "user_id" not in rs


def test_pq_rerank_broadcasts_survivors_no_cartesian(spark):
    """The PQ rerank join must broadcast the bounded survivor/query sides
    against the streaming raw corpus — never a cartesian/sort-merge — and
    the raw ADC scan must stay a map-side pass + one bounded final window."""
    plan = _plan(spark, "q_similarity_pq")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    adc = _plan(spark, "q_similarity_pq_adc")
    assert "CartesianProduct" not in adc


def test_min_cost_supplier_semijoin_precedes_aggregation(spark):
    """r12's Q2 rewrite (540035e): the part-band predicate semi-joins
    lineitem BEFORE the (partkey, suppkey) aggregation, so the agg
    shuffle carries only qualifying parts — the LeftSemi join must sit
    BELOW the first HashAggregate in the tree (formatted explain prints
    root-first, so the aggregate's line comes first), and the former
    post-agg join back to `part` must not reappear."""
    plan = _plan(spark, "q_min_cost_supplier")
    assert "LeftSemi" in plan
    first_agg = plan.index("HashAggregate")
    first_semi = plan.index("LeftSemi")
    assert first_agg < first_semi, (
        "the part-band semi-join must be below (after, in root-first "
        "order) the aggregation it pre-filters"
    )


def test_minhash_tokenizer_evaluates_once(spark):
    """The token-projection discipline (a0242b0): the shingle pipeline
    tokenizes each document exactly once behind a projection boundary.
    An inline tokens expression re-runs split() per array element under
    interpreted higher-order-function evaluation (O(tokens^2) per doc) —
    pinned here as exactly one split( of the text column in the whole
    signature plan."""
    from feature_store_implementation_spark.operators.dedup import (
        minhash_signatures,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    df = minhash_signatures(d, "text", "doc_id")
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("split(") == 1
