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


def test_hash_embed_python_parity_and_composition(spark):
    """hash_embed matches a pure-python md5 oracle vector-for-vector,
    produces unit-norm embeddings, and feeds the similarity stack
    (brute_force_topk consumes its output directly)."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from feature_store_implementation_spark.operators.similarity import (
        brute_force_topk,
    )
    from feature_store_implementation_spark.operators.text import hash_embed
    from feature_store_implementation_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    e = hash_embed(d).cache()
    docs = {r["doc_id"]: r["text"] for r in d.collect()}

    def py_embed(text, dim=64):
        v = [0.0] * dim
        for t in text.lower().split():
            if not t:
                continue
            h = hashlib.md5(t.encode()).hexdigest()
            v[int(h[:8], 16) % dim] += 1 if int(h[8], 16) % 2 == 0 else -1
        n = math.sqrt(sum(x * x for x in v))
        return [x / n if n > 0 else 0.0 for x in v]

    rows = e.collect()
    assert len(rows) == len(docs)
    for r in rows:
        want = py_embed(docs[r["doc_id"]])
        assert all(abs(a - b) < 1e-12 for a, b in zip(r["embedding"], want))
        assert abs(math.sqrt(sum(x * x for x in r["embedding"])) - 1) < 1e-9
    q = e.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    topk = brute_force_topk(e, q, k=5, id_col="doc_id")
    assert topk.count() == 15
    # a doc's nearest neighbor is itself (cosine 1.0)
    self_hits = topk.filter(
        (F.col("rank") == 1) & (F.col("query_id") == F.col("vec_id"))
    )
    assert self_hits.count() == 3


def test_normalize_text_unicode_modes(spark):
    """normalize_text: NFKC folds ligatures/full-width digits, accent
    stripping via NFD-drop-combining, whitespace collapse, None
    passthrough, and NFC composes decomposed accents (len shrinks)."""
    import pytest as _pytest

    from feature_store_implementation_spark.operators.text import normalize_text

    d = spark.createDataFrame(
        [
            (1, "Café and ﬁne １２３"),
            (2, "MIXED   Case\twith\nspace"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    r = {
        x["doc_id"]: x["text"]
        for x in normalize_text(
            d,
            form="NFKC",
            lowercase=True,
            strip_accents=True,
            collapse_whitespace=True,
        ).collect()
    }
    assert r[1] == "cafe and fine 123"
    assert r[2] == "mixed case with space"
    assert r[3] is None
    composed = normalize_text(
        spark.createDataFrame([(1, "Café")], "doc_id long, text string")
    ).collect()[0]["text"]
    assert composed == "Café" and len(composed) == 4
    with _pytest.raises(ValueError, match="NFC"):
        normalize_text(d, form="NFX")


def test_script_profile_classes_and_dominance(spark):
    """script_profile: known multi-script docs get the right ratios and
    dominant script; whitespace-only and punctuation-only docs are
    'none'; ratios over non-space chars sum to <= 1."""
    from feature_store_implementation_spark.operators.text import script_profile

    d = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир hello"),
            (3, "你好 世界 こんにちは 한글"),
            (4, "مرحبا بالعالم"),
            (5, "12345"),
            (6, "   "),
            (7, "!!! ??? ..."),
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in script_profile(d).collect()}
    assert r[1]["dominant_script"] == "latin" and r[1]["latin_ratio"] == 1.0
    assert r[2]["dominant_script"] == "cyrillic"
    assert abs(r[2]["cyrillic_ratio"] - 9 / 14) < 1e-6
    assert r[3]["dominant_script"] == "cjk" and r[3]["cjk_ratio"] == 1.0
    assert r[4]["dominant_script"] == "arabic" and r[4]["arabic_ratio"] == 1.0
    assert r[5]["dominant_script"] == "digit"
    assert r[6]["dominant_script"] == "none" and r[6]["n_chars"] == 0
    assert r[7]["dominant_script"] == "none"  # non-space chars, no script hits
    for x in r.values():
        total = sum(
            x[c]
            for c in (
                "latin_ratio",
                "cyrillic_ratio",
                "greek_ratio",
                "arabic_ratio",
                "cjk_ratio",
                "digit_ratio",
            )
        )
        assert total <= 1.0 + 1e-9
