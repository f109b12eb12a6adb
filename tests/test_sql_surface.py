"""The SQL-first surface: registered views + spark.sql must agree with the
DataFrame plans (same Catalyst semantics, two front-ends)."""

from feature_store_implementation_spark.plans import inventory as inv
from feature_store_implementation_spark.sources.tables import register_views

SF = "/root/testdata/sf0.001"


def test_sql_matches_dataframe_plan(spark):
    register_views(spark, SF)
    sql_rows = spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_spend,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        """
    ).collect()
    df_rows = inv.q_customer_total_spend(spark, SF).collect()
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))


def test_views_cover_all_tables(spark):
    register_views(spark, SF)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() >= 0
