"""CSV/JSON sources and the partitioned parquet sink round-trip."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_implementation_spark.sources.files import (
    csv_source,
    json_source,
    write_partitioned,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    df = csv_source(spark, p, SCHEMA)
    assert df.schema == SCHEMA
    assert sorted(tuple(r) for r in df.collect()) == [
        (1, "alpha", 0.5),
        (2, "beta", 1.5),
    ]


def test_csv_failfast_on_bad_row(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("id,name,score\n1,alpha,not_a_number\n")
    with pytest.raises(Exception):
        csv_source(spark, p, SCHEMA).collect()


def test_json_lines(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "alpha", "score": 0.5}\n')
        f.write('{"id": 2, "name": "beta", "score": 1.5}\n')
    df = json_source(spark, p, SCHEMA)
    assert df.count() == 2 and df.schema == SCHEMA


def test_write_partitioned_prunes(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(100).select(
        "id", (F.col("id") % 4).cast("string").alias("bucket")
    )
    write_partitioned(df, out, partition_by=["bucket"], max_records_per_file=10)
    assert sorted(
        d for d in os.listdir(out) if d.startswith("bucket=")
    ) == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]
    back = spark.read.parquet(out).filter(F.col("bucket") == "2")
    assert back.count() == 25
    # directory-partition pruning visible in the scan's PartitionFilters
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_orc_round_trip_with_partitions(spark, tmp_path):
    from feature_store_implementation_spark.sources.files import orc_source, write_orc

    df = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i)) for i in range(30)], "id long, grp string, v double"
    )
    write_orc(df, str(tmp_path / "orc"), partition_by=["grp"])
    back = orc_source(spark, str(tmp_path / "orc"))
    assert sorted(r["id"] for r in back.collect()) == list(range(30))
    # partition pruning: a grp filter must turn into a PartitionFilters entry
    plan = spark._jvm.PythonSQLUtils.explainString(
        back.filter(back.grp == "u1")._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "u1" in plan


def test_text_source_line_and_whole_file(spark, tmp_path):
    from feature_store_implementation_spark.sources.files import text_source

    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "a.txt").write_text("line one\nline two\n")
    (tmp_path / "docs" / "b.txt").write_text("solo\n")
    lines = text_source(spark, str(tmp_path / "docs"))
    assert sorted(r["value"] for r in lines.collect()) == ["line one", "line two", "solo"]
    whole = text_source(spark, str(tmp_path / "docs"), whole_file=True)
    assert sorted(r["value"] for r in whole.collect()) == [
        "line one\nline two\n",
        "solo\n",
    ]


def test_records_source_typed_and_inferred(spark):
    """JSON-record ingestion parity with the reference's
    pd.DataFrame(request.data): typed when a schema is declared, inferred
    otherwise."""
    from pyspark.sql import types as T

    from feature_store_implementation_spark.sources.tables import records_source

    recs = [{"id": 1, "amount": 2.5}, {"id": 2, "amount": 3.5}]
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("amount", T.DoubleType())]
    )
    typed = records_source(spark, recs, schema)
    assert [f.dataType.simpleString() for f in typed.schema.fields] == ["bigint", "double"]
    assert typed.count() == 2
    inferred = records_source(spark, recs)
    assert {r["id"] for r in inferred.collect()} == {1, 2}
