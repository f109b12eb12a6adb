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
