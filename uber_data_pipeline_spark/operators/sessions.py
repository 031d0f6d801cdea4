"""Gap-based sessionization (batch).

Assigns a session id per user: a new session starts when the gap
since the previous event exceeds ``gap_seconds``. Classic
lag-compare-cumsum over a per-user window — stays entirely JVM-side.

Scale: partitions by user_id (high cardinality, well distributed);
per-task state is one user's events. For unbounded streams the
streaming variant lives in streaming/ (applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Adds ``session_col``: 1-based session index per user."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    new_session = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new_session", new_session).withColumn(
        session_col, F.sum("_new_session").over(w)
    ).drop("_new_session")
