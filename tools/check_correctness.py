"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names, and
an order-insensitive value hash (cells stringified, rows sorted). Strict by
design — if this passes, the driver's hash comparison should too.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "\x00NULL"
        if isinstance(v, bool):
            return str(bool(v))
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(cell)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x01".join(row).encode())
        h.update(b"\x02")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from feature_store_implementation_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            # The driver still canonicalizes no-oracle outputs (sorts every
            # column through pandas) before recording rows — an Array/Map/
            # Struct column crashes it there (`unhashable type: 'list'`,
            # CORRECTNESS_r04 q_media_decode). Mirror that so local green
            # predicts driver green.
            try:
                if len(sdf.columns):
                    # raw-column sort, exactly like the driver's _canon —
                    # normalize() stringifies first and would mask the crash
                    sdf.sort_values(by=list(sdf.columns), kind="mergesort")
                value_hash(normalize(sdf))
            except Exception as e:
                print(f"FAIL  {name}: rows-only canon error: {type(e).__name__}: {e}")
                n_fail += 1
                continue
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"schema spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            ns, no = normalize(sdf), normalize(odf)
            hs, ho = value_hash(ns), value_hash(no)
            if hs != ho:
                diff_mask = (ns != no).any(axis=1)
                ex = pd.concat(
                    [ns[diff_mask].head(3).add_suffix("_spark"), no[diff_mask].head(3).add_suffix("_oracle")],
                    axis=1,
                )
                problems.append(f"value-hash mismatch; first diffs:\n{ex.to_string()}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
