"""Grouped-agg pandas UDFs (Arrow UDAFs).

NOTE: deliberately NO `from __future__ import annotations` here —
`pandas_udf` derives the UDF kind from the REAL type hints
(pd.Series -> scalar = grouped agg), and postponed evaluation turns
them into strings it cannot resolve.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median as a grouped-agg pandas UDF. The Arrow UDAF
    extension point: per group, the whole value series arrives as one
    pandas Series (no partial aggregation — see the registry entry's
    honest-placement note) and the scalar return is the aggregate."""
    return float(np.median(v))


@pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    """Row count as a grouped-agg pandas UDF — Spark refuses to mix
    grouped-agg pandas UDFs with native aggregates in one agg()
    (INVALID_PANDAS_UDF_PLACEMENT), so the companion count rides the
    same Arrow pass."""
    return int(len(v))
