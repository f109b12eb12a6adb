"""Arrow-batched pandas UDFs (scalar + grouped-agg flavors).

Kept in a module WITHOUT ``from __future__ import annotations``: pandas_udf
resolves the pd.Series type hints at decoration time, and postponed
annotations would reduce them to unresolvable strings.

The UDFs are built lazily on first use (Spark 4's ``pandas_udf`` needs an
active SparkSession at decoration time, and this module must stay
importable from a bare interpreter — dependency scanners, doc tooling);
the factories memoize so the UDF object is created once per process.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

_CACHE: dict = {}


def ln_fixed_sum():
    """GROUPED_AGG: Σ round(ln(x), 8) scaled to exact int64 — the group sum
    is order-independent, so a SQL oracle can reproduce it bit-for-bit."""
    if "ln_fixed_sum" not in _CACHE:

        @pandas_udf("long")
        def _ln_fixed_sum(v: pd.Series) -> int:
            scaled = np.round(np.round(np.log(v.to_numpy()), 8) * 1e8)
            return int(scaled.astype("int64").sum())

        _CACHE["ln_fixed_sum"] = _ln_fixed_sum
    return _CACHE["ln_fixed_sum"]


def price_feature():
    """SCALAR: vectorized sqrt + log1p feature, rounded for engine parity."""
    if "price_feature" not in _CACHE:

        @pandas_udf("double")
        def _price_feature(v: pd.Series) -> pd.Series:
            x = v.to_numpy()
            return pd.Series(np.round(np.sqrt(x) + np.log1p(x), 6))

        _CACHE["price_feature"] = _price_feature
    return _CACHE["price_feature"]


def n_rows():
    """GROUPED_AGG row count — grouped-agg pandas UDFs cannot mix with JVM
    aggregates in one aggregation, so the count rides the same Arrow path."""
    if "n_rows" not in _CACHE:

        @pandas_udf("long")
        def _n_rows(v: pd.Series) -> int:
            return int(len(v))

        _CACHE["n_rows"] = _n_rows
    return _CACHE["n_rows"]


def lossy_utf8_decode():
    """SCALAR: binary → string with errors='replace'. Spark 4's JVM
    ``decode()`` RAISES MALFORMED_CHARACTER_CODING on any non-UTF-8 byte;
    web-scrape payloads (WARC responses) need one replacement character
    per bad byte, not a dead job (sources/files.py warc_text_documents)."""
    if "lossy_utf8_decode" not in _CACHE:

        @pandas_udf("string")
        def _lossy_utf8(payload: pd.Series) -> pd.Series:
            return payload.map(
                lambda b: None if b is None else bytes(b).decode("utf-8", "replace")
            )

        _CACHE["lossy_utf8_decode"] = _lossy_utf8
    return _CACHE["lossy_utf8_decode"]
