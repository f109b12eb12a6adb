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


# ---------------------------------------------------------------------------
# WARC ingest
# ---------------------------------------------------------------------------


def _warc_record(rtype, rid, uri, body: bytes, ctype="text/plain") -> bytes:
    h = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Record-ID: {rid}\r\n"
        f"WARC-Target-URI: {uri}\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: {ctype}\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode()
    return h + body + b"\r\n\r\n"


def test_warc_source_plain_and_gzip_parity(spark, tmp_path):
    """Plain .warc and multi-member .warc.gz parse to identical records;
    response records lose their HTTP header block in the documents view,
    conversion records pass through, warcinfo is dropped, unicode
    survives, and a payload containing 'WARC/' does not split a record
    (Content-Length framing, not delimiter scanning)."""
    import gzip

    from pyspark.sql import functions as F

    from feature_store_implementation_spark.sources.files import (
        warc_source,
        warc_text_documents,
    )

    http_body = b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n<html>hello</html>"
    tricky = "body mentioning WARC/1.0 inline é".encode()
    warc = (
        _warc_record("warcinfo", "0", "", b"software: t")
        + _warc_record("response", "1", "http://a/", http_body,
                       "application/http; msgtype=response")
        + _warc_record("conversion", "2", "http://b/", tricky)
    )
    (tmp_path / "a.warc").write_bytes(warc)
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(warc[: len(warc) // 2]) + gzip.compress(warc[len(warc) // 2 :])
    )
    recs = warc_source(spark, str(tmp_path) + "/*").cache()
    by_file = {
        r["path"].rsplit("/", 1)[-1]: n
        for r, n in [
            (x, x["n"])
            for x in recs.groupBy("path").agg(F.count("*").alias("n")).collect()
        ]
    }
    assert by_file == {"a.warc": 3, "b.warc.gz": 3}
    docs = warc_text_documents(recs).filter(F.col("doc_id") == "2").collect()
    assert all(d["text"] == "body mentioning WARC/1.0 inline é" for d in docs)
    resp = warc_text_documents(recs).filter(F.col("doc_id") == "1").collect()
    assert all(d["text"] == "<html>hello</html>" for d in resp)
    assert recs.filter(F.col("warc_type") == "warcinfo").count() == 2


def test_warc_documents_roundtrip_table(spark, tmp_path):
    """documents → WARC conversion records → warc_source → identical
    (doc_id, text) set — the oracle-checked driver regime."""
    from pyspark.sql import functions as F

    from feature_store_implementation_spark.sources.files import (
        warc_source,
        warc_text_documents,
    )
    from feature_store_implementation_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = d.select("doc_id", "text").collect()
    blobs = [b"", b"", b""]
    for i, r in enumerate(rows):
        blobs[i % 3] += _warc_record(
            "conversion", str(r["doc_id"]), f"http://x/{r['doc_id']}",
            r["text"].encode()
        )
    for i, b in enumerate(blobs):
        (tmp_path / f"part{i}.warc").write_bytes(b)
    got = {
        (int(r["doc_id"]), r["text"])
        for r in warc_text_documents(warc_source(spark, str(tmp_path) + "/*")).collect()
    }
    assert got == {(r["doc_id"], r["text"]) for r in rows}


def test_jsonl_quarantine_salvages_and_preserves_raw(spark, tmp_path):
    """One text scan → (good, quarantine): unparseable lines, type
    clashes, and wrong-shape JSON quarantine WITH their original bytes;
    missing fields are nullable-column semantics; blank lines drop."""
    from pyspark.sql import types as T

    from feature_store_implementation_spark.sources.files import (
        jsonl_quarantine_source,
    )

    lines = [
        '{"doc_id": 1, "text": "good row"}',
        "{broken json!!",
        '{"wrong_shape": true}',
        '{"doc_id": "not_an_int", "text": "type clash"}',
        "",
        '{"doc_id": 3}',
    ]
    (tmp_path / "a.jsonl").write_text("\n".join(lines))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    good, quar = jsonl_quarantine_source(spark, str(tmp_path), schema)
    assert sorted((r["doc_id"], r["text"]) for r in good.collect()) == [
        (1, "good row"),
        (3, None),
    ]
    assert sorted(r["raw"] for r in quar.collect()) == sorted(
        [
            "{broken json!!",
            '{"wrong_shape": true}',
            '{"doc_id": "not_an_int", "text": "type clash"}',
        ]
    )
    assert all(r["path"].endswith("a.jsonl") for r in quar.collect())


def test_warc_documents_lossy_decode_non_utf8(spark, tmp_path):
    """A non-UTF-8 byte in a response payload must cost one replacement
    character, not the job: Spark 4's JVM decode() raises
    MALFORMED_CHARACTER_CODING, so the documents view decodes Python-side
    with errors='replace' (review r10). Common Crawl payloads routinely
    carry latin-1/binary bytes."""
    from feature_store_implementation_spark.sources.files import (
        warc_source,
        warc_text_documents,
    )

    http_body = b"HTTP/1.1 200 OK\r\n\r\ncaf\xe9 latin-1"  # 0xe9 not UTF-8
    warc = _warc_record(
        "response", "9", "http://c/", http_body,
        "application/http; msgtype=response",
    )
    (tmp_path / "c.warc").write_bytes(warc)
    docs = warc_text_documents(warc_source(spark, str(tmp_path) + "/*")).collect()
    assert docs[0]["text"] == "caf� latin-1"  # replaced, job survived


def test_jsonl_quarantine_keeps_legit_all_null_rows(spark, tmp_path):
    """A valid line whose declared fields are PRESENT but null is a
    nullable row, not quarantine — the all-null heuristic alone misrouted
    {"a": null} against a 1-field schema (review r10). A line mentioning
    NO declared field still quarantines as wrong-shape."""
    from pyspark.sql import types as T

    from feature_store_implementation_spark.sources.files import (
        jsonl_quarantine_source,
    )

    lines = ['{"a": null}', '{"a": 1}', '{"x": 1}', "{}"]
    (tmp_path / "n.jsonl").write_text("\n".join(lines))
    schema = T.StructType([T.StructField("a", T.LongType())])
    good, quar = jsonl_quarantine_source(spark, str(tmp_path), schema)
    assert sorted(r["a"] for r in good.collect() if r["a"] is not None) == [1]
    assert good.count() == 2  # {"a": null} is a nullable ROW
    assert sorted(r["raw"] for r in quar.collect()) == sorted(["{}", '{"x": 1}'])


def test_warc_html_extract_mode(spark, tmp_path):
    """extract="html" (round-12): response payloads — which are HTML on
    real Common Crawl — come out as extracted prose lines; conversion
    (WET) records are already text and pass through byte-identically."""
    from pyspark.sql import functions as F

    from feature_store_implementation_spark.sources.files import (
        warc_source,
        warc_text_documents,
    )

    html = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><head><title>Crawl Page</title><script>nav()</script></head>"
        b"<body><p>Real prose here.</p><p>Second paragraph.</p></body></html>"
    )
    wet_text = "already extracted <not a tag to keep>".encode()
    warc = _warc_record(
        "response", "1", "http://a/", html, "application/http; msgtype=response"
    ) + _warc_record("conversion", "2", "http://b/", wet_text)
    (tmp_path / "c.warc").write_bytes(warc)
    recs = warc_source(spark, str(tmp_path / "c.warc"))
    docs = {
        r["doc_id"]: r["text"]
        for r in warc_text_documents(recs, extract="html").collect()
    }
    assert docs["1"] == "Crawl Page\nReal prose here.\nSecond paragraph."
    assert docs["2"] == "already extracted <not a tag to keep>"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        warc_text_documents(recs, extract="xhtml")
