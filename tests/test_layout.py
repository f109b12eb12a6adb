"""Z-order layout effectiveness, measured from the actual parquet footers:
files of a z-ordered write must each cover a small bounding box in BOTH
dimensions, where a linear sort only localizes its leading column."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from feature_store_implementation_spark.operators.layout import zorder_write


def _avg_span(path_glob: str, col: str) -> float:
    """Mean (max-min) of ``col`` across files, from footer statistics."""
    spans = []
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        lo = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
        hi = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
        spans.append(hi - lo)
    assert spans
    return sum(spans) / len(spans)


def test_zorder_localizes_both_dimensions(spark, tmp_path):
    # two independent uniform dimensions — the adversarial case for any
    # single-column sort
    df = (
        spark.range(0, 40000)
        .select(
            (F.hash(F.col("id")) % 10000).alias("x"),
            (F.hash(F.col("id") * 7 + 3) % 10000).alias("y"),
            F.col("id").alias("payload"),
        )
    )
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zorder")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(linear)
    zorder_write(df, zordered, ["x", "y"], bits=12, num_files=16)

    # same rows either way
    assert (
        spark.read.parquet(zordered).agg(F.sum("payload")).collect()[0][0]
        == df.agg(F.sum("payload")).collect()[0][0]
    )

    full = 20000.0  # hash%10000 spans ≈ (-10000, 10000)
    lin_x = _avg_span(f"{linear}/*.parquet", "x")
    lin_y = _avg_span(f"{linear}/*.parquet", "y")
    z_x = _avg_span(f"{zordered}/*.parquet", "x")
    z_y = _avg_span(f"{zordered}/*.parquet", "y")
    # linear sort: x tightly local, y useless (spans ~ the whole domain)
    assert lin_x < 0.2 * full
    assert lin_y > 0.8 * full
    # z-order: BOTH dimensions localized — each file covers a fraction of
    # the domain in x AND y, so min/max pruning fires for filters on either.
    # Threshold 0.55, not the ~0.25 ideal: repartitionByRange picks file
    # boundaries from a nondeterministically-seeded sample, so a couple of
    # files can straddle top-level z-quadrant boundaries and contribute
    # half-domain spans to the mean (observed 0.40-0.46 across seeds). The
    # claim under test is the CONTRAST with the linear layout's unsorted
    # dimension (> 0.8 above), which keeps a wide margin.
    assert z_x < 0.55 * full
    assert z_y < 0.55 * full
