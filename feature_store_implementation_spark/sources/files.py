"""Generic file sources and sinks beyond the canonical parquet tables.

The reference's only ingress is JSON-over-HTTP record lists (reference
main.py:176) and its only egress is rows in SQLite (reference
compute.py:74-88). Here ingestion is declarative readers that keep Catalyst
in charge (pushdown, pruning, partition discovery), and egress is columnar
partitioned parquet — the layout a 1000-executor job can actually write and
re-read in parallel.

Readers take an explicit ``StructType`` whenever the format is untyped
(CSV/JSON): schema inference is a full extra pass over the data at 100 TB
and can silently mis-type columns; declared schemas are both faster and the
moral equivalent of the reference's registered ``schema_definition``
(reference models.py:14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with a declared schema. PERMISSIVE mode + ``_corrupt_record`` is
    deliberately not the default: bad rows should fail loudly in a feature
    pipeline unless the caller opts into salvage."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    reader = reader.option("mode", options.pop("mode", "FAILFAST"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def json_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines with a declared schema (one object per line scales; a
    single giant array does not parallelize)."""
    reader = spark.read.schema(schema)
    reader = reader.option("mode", options.pop("mode", "FAILFAST"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink. ``partition_by`` columns become directory
    partitions (partition pruning on read); ``max_records_per_file`` caps
    file sizes so one skewed partition value can't produce a single giant
    file."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def orc_source(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC reader — self-describing columnar, so no declared schema needed;
    predicate pushdown and column pruning work as for parquet. Supported so
    a user migrating an ORC lake doesn't need a parquet rewrite first."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def text_source(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw text ingestion for document pipelines: one row per line (default)
    or one row per file (``whole_file`` — for document-level dedup/quality
    scoring where line splitting would destroy the unit of analysis). Returns
    a single ``value: string`` column; parsing stays declarative downstream."""
    return spark.read.text(path, wholetext=whole_file)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned ORC sink, mirroring :func:`write_partitioned`."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, payload binary"
)


def _parse_warc_stream(data: bytes):
    """Sequential WARC/1.x record parser (ISO 28500 framing): each record
    is a version line, CRLF header block, exactly Content-Length payload
    bytes, then a CRLF CRLF separator. Pure-python, no warcio — the
    format's framing is simple enough that a dependency buys nothing."""
    pos, n = 0, len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "ignore")] = v.strip().decode(
                    "utf-8", "ignore"
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = hdr_end + 4
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def warc_source(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC archives (the Common Crawl / web-corpus arrival format)
    into (path, record_id, warc_type, target_uri, warc_date,
    content_type, payload). ``.gz`` members are decompressed in-task
    (multi-member streams included — the per-record-gzipped CC layout).

    Scale shape: ``binaryFile`` read + Arrow-batched ``mapInPandas`` —
    ONE task per archive file, which is the right unit because gzipped
    WARCs are not splittable anyway (exactly how CC is processed at
    petabyte scale: parallelism = number of archive files, each ~1 GB).
    No shuffle; compose with `operators/text.py` gates downstream. Pair
    with :func:`warc_text_documents` for the documents-table shape."""
    from collections.abc import Iterator

    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip
        import io

        for pdf in batches:
            for _, row in pdf.iterrows():
                data = row["content"]
                if row["path"].endswith(".gz"):
                    with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
                        data = g.read()  # GzipFile drains multi-member streams
                out = []
                for headers, payload in _parse_warc_stream(bytes(data)):
                    out.append(
                        {
                            "path": row["path"],
                            "record_id": headers.get("warc-record-id", ""),
                            "warc_type": headers.get("warc-type", ""),
                            "target_uri": headers.get("warc-target-uri", ""),
                            "warc_date": headers.get("warc-date", ""),
                            "content_type": headers.get("content-type", ""),
                            "payload": payload,
                        }
                    )
                if out:
                    yield pd.DataFrame(out)

    return binf.select("path", "content").mapInPandas(parse, schema=WARC_SCHEMA)


def warc_text_documents(records: DataFrame, extract: str | None = None) -> DataFrame:
    """WARC records → the ``documents`` shape: keep ``conversion`` (WET
    extracted-text) and ``response`` records, strip the HTTP header block
    from responses (payload after the first CRLF CRLF), decode utf-8
    LOSSILY, emit (doc_id = record id, url, text). Map-only.

    ``extract="html"`` additionally runs
    :func:`~..operators.text.html_extract` over each RESPONSE body —
    real Common Crawl response payloads are HTML, and handing raw markup
    to the C4/Gopher chain scores tag soup, not prose (r11 verdict
    task 1). ``conversion`` (WET) records are already extracted text and
    pass through untouched. Still map-only: the extractor is a fixed
    JVM regexp chain in the same projection.

    The decode is an Arrow-batched pandas UDF with errors='replace':
    Spark 4's JVM ``decode()`` RAISES MALFORMED_CHARACTER_CODING on any
    non-UTF-8 byte, and real Common Crawl response payloads routinely
    carry latin-1/binary bytes — one malformed record must cost one
    replacement character, not the corpus-ingest job. Python-side decode
    is the honest cost here: the records already crossed a Python parser
    (warc_records' mapInPandas), and the decode happens exactly once per
    record (the old plan re-decoded the payload three times)."""
    from pyspark.sql import functions as F

    from ..functions.pandas_udfs import lossy_utf8_decode

    kept = records.filter(
        F.col("warc_type").isin("conversion", "response")
    ).withColumn("_txt", lossy_utf8_decode()(F.col("payload")))
    pos = F.instr(F.col("_txt"), "\r\n\r\n")
    body = F.when(
        (F.col("warc_type") == "response") & (pos > 0),
        F.col("_txt").substr(pos + 4, F.length("_txt")),
    ).otherwise(F.col("_txt"))
    if extract is not None:
        if extract != "html":
            raise ValueError(f"extract must be 'html' or None — got {extract!r}")
        from ..operators.text import html_extract_expr

        body = F.when(
            F.col("warc_type") == "response", html_extract_expr(body)
        ).otherwise(body)
    return kept.select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        body.alias("text"),
    )


def jsonl_quarantine_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """JSONL ingest that SALVAGES instead of failing: returns
    ``(good, quarantine)`` where ``good`` carries schema-conforming rows
    and ``quarantine`` the raw text of every line that failed to parse
    or conform (``(raw, path)``) — the web-scrape reality where a
    petabyte of JSONL always contains truncated lines, stray logs, and
    schema drift, and one bad line must cost one quarantined row, not
    the job (FAILFAST, the pipeline default in :func:`json_source`) or a
    silent null row (plain PERMISSIVE).

    One ``text`` scan feeds both frames — each line goes through
    ``from_json`` against the declared schema; a line is quarantined
    when it fails to parse (null struct) or parses to a row where every
    declared field is null (valid JSON, wrong shape). Quarantine is
    replayable: the ORIGINAL line is preserved byte-for-byte in every
    case (the PERMISSIVE ``_corrupt_record`` route loses the raw text of
    wrong-shape-but-valid-JSON lines, which is why this reads via
    ``text``), so a schema fix reprocesses the quarantine directly."""
    from pyspark.sql import functions as F

    corrupt = "_corrupt_record"
    opts = {"columnNameOfCorruptRecord": corrupt, **options}
    full = T.StructType([*schema.fields, T.StructField(corrupt, T.StringType(), True)])
    raw = (
        spark.read.text(path)
        .withColumn("_src", F.input_file_name())
        .filter(F.trim("value") != "")
    )
    parsed = raw.select(F.from_json("value", full, opts).alias("j"), "value", "_src")
    declared = [f.name for f in schema.fields]
    all_null = F.lit(True)
    for c in declared:
        all_null = all_null & F.col("j").getField(c).isNull()
    # bad = unparseable (null struct), type-violating (corrupt col set by
    # PERMISSIVE from_json), or valid JSON of a completely wrong shape;
    # a MISSING field alone is nullable-column semantics, not quarantine.
    # "Wrong shape" needs the raw line, not just the parsed nulls: a
    # legitimately all-null row ({"a": null} against a 1-field schema)
    # parses identically to {"x": 1} — so an all-null parse is quarantined
    # only when the line's TOP-LEVEL KEYS include no declared field (the
    # row carries zero declared content; a present-but-null field is a
    # nullable row, exactly the semantics the comment above promises).
    # Keys come from a second from_json as map<string,string> — a raw
    # substring match would be fooled by nested keys, field names
    # appearing as string VALUES, and \uXXXX-escaped key spellings.
    top_keys = F.map_keys(
        F.coalesce(
            F.from_json("value", "map<string,string>"),
            F.from_json(F.lit("{}"), "map<string,string>"),
        )
    )
    mentions_declared = F.arrays_overlap(
        top_keys, F.array(*[F.lit(c) for c in declared])
    )
    bad = (
        F.col("j").isNull()
        | F.col("j").getField(corrupt).isNotNull()
        | (all_null & ~mentions_declared)
    )
    good = parsed.filter(~bad).select(*[F.col("j").getField(c).alias(c) for c in declared])
    quarantine = parsed.filter(bad).select(
        F.col("value").alias("raw"), F.col("_src").alias("path")
    )
    return good, quarantine
