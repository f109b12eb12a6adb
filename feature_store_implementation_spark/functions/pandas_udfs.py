"""Arrow-batched pandas UDFs (scalar + grouped-agg flavors).

Kept in a module WITHOUT ``from __future__ import annotations``: pandas_udf
resolves the pd.Series type hints at decoration time, and postponed
annotations would reduce them to unresolvable strings.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def ln_fixed_sum(v: pd.Series) -> int:
    """GROUPED_AGG: Σ round(ln(x), 8) scaled to exact int64 — the group sum
    is order-independent, so a SQL oracle can reproduce it bit-for-bit."""
    scaled = np.round(np.round(np.log(v.to_numpy()), 8) * 1e8)
    return int(scaled.astype("int64").sum())


@pandas_udf("double")
def price_feature(v: pd.Series) -> pd.Series:
    """SCALAR: vectorized sqrt + log1p feature, rounded for engine parity."""
    x = v.to_numpy()
    return pd.Series(np.round(np.sqrt(x) + np.log1p(x), 6))


@pandas_udf("long")
def n_rows(v: pd.Series) -> int:
    """GROUPED_AGG row count — grouped-agg pandas UDFs cannot mix with JVM
    aggregates in one aggregation, so the count rides the same Arrow path."""
    return int(len(v))
