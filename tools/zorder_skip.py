"""Measure what the Z-order layout actually buys: file-level min/max
pruning on a 2-D box predicate, vs a linear single-column sort.

Writes the sf0.1 lineitem-scale synthetic (400k rows, two independent
uniform dimensions — the adversarial case for any single-column sort)
twice: range-sorted on x, and z-ordered on (x, y). Then, for a grid of
selective 2-D box predicates, counts the files whose footer min/max
stats overlap the box (= the files any stats-pruning reader MUST open)
and times the actual Spark scan.

Usage: python tools/zorder_skip.py [n_rows] [n_files]
Prints one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import glob
import json
import shutil
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from feature_store_implementation_spark.operators.layout import zorder_write  # noqa: E402
from feature_store_implementation_spark.session import get_spark  # noqa: E402


def file_bounds(path_glob: str, cols: list[str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(path_glob)):
        meta = pq.ParquetFile(f).metadata
        b = {}
        for c in cols:
            idx = meta.schema.names.index(c)
            b[c] = (
                min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups)),
                max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups)),
            )
        out.append(b)
    return out


def files_overlapping(bounds: list[dict], box: dict) -> int:
    n = 0
    for b in bounds:
        if all(b[c][0] <= hi and b[c][1] >= lo for c, (lo, hi) in box.items()):
            n += 1
    return n


def timed_scan(spark, path: str, box: dict) -> tuple[float, int]:
    t0 = time.time()
    df = spark.read.parquet(path)
    for c, (lo, hi) in box.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    cnt = df.count()
    return time.time() - t0, cnt


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("zorder-skip")
    df = spark.range(0, n_rows).select(
        F.pmod(F.hash(F.col("id")), F.lit(100_000)).alias("x"),
        F.pmod(F.hash(F.col("id") * 7 + 3), F.lit(100_000)).alias("y"),
        F.col("id").alias("payload"),
    )
    tmp = tempfile.mkdtemp(prefix="zorder_skip_")
    linear, zordered = f"{tmp}/linear", f"{tmp}/zorder"
    try:
        (
            df.repartitionByRange(n_files, "x")
            .sortWithinPartitions("x")
            .write.parquet(linear)
        )
        zorder_write(df, zordered, ["x", "y"], bits=12, num_files=n_files)

        lb = file_bounds(f"{linear}/*.parquet", ["x", "y"])
        zb = file_bounds(f"{zordered}/*.parquet", ["x", "y"])

        # three predicate classes: the leading-column filter (linear's home
        # turf), the NON-leading-column filter (linear must read everything;
        # the case z-order exists for), and the 2-D box
        boxes = (
            [{"x": (c, c + 10_000)} for c in (10_000, 45_000, 80_000)]
            + [{"y": (c, c + 10_000)} for c in (10_000, 45_000, 80_000)]
            + [
                {"x": (cx, cx + 10_000), "y": (cy, cy + 10_000)}
                for cx in (10_000, 45_000, 80_000)
                for cy in (10_000, 45_000, 80_000)
            ]
        )
        rows = []
        for box in boxes:
            lo_files = files_overlapping(lb, box)
            zo_files = files_overlapping(zb, box)
            lt, lc = timed_scan(spark, linear, box)
            zt, zc = timed_scan(spark, zordered, box)
            assert lc == zc, (lc, zc)
            rows.append(
                {
                    "box": {k: list(v) for k, v in box.items()},
                    "rows": lc,
                    "linear_files": lo_files,
                    "zorder_files": zo_files,
                    "linear_sec": round(lt, 3),
                    "zorder_sec": round(zt, 3),
                }
            )
        def summarize(cls: str, sel) -> dict:
            grp = [r for r in rows if sel(r["box"])]
            avg = lambda k: round(sum(r[k] for r in grp) / len(grp), 3)  # noqa: E731
            return {
                "class": cls,
                "n": len(grp),
                "avg_linear_files": avg("linear_files"),
                "avg_zorder_files": avg("zorder_files"),
                "avg_linear_sec": avg("linear_sec"),
                "avg_zorder_sec": avg("zorder_sec"),
            }

        print(
            json.dumps(
                {
                    "n_rows": n_rows,
                    "n_files": len(lb),
                    "classes": [
                        summarize("x_only", lambda b: set(b) == {"x"}),
                        summarize("y_only", lambda b: set(b) == {"y"}),
                        summarize("xy_box", lambda b: set(b) == {"x", "y"}),
                    ],
                    "boxes": rows,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
