"""Deterministic, engine-neutral sampling.

``df.sample()`` is seed-and-partitioning dependent — rerun the job
with a different partition layout and you get a different sample,
and no external system can reproduce it. For training-data work the
sample must be a pure function of the row: hash a stable id into
[0, 256) and keep rows under a per-stratum threshold. Re-runs,
backfills, and the DuckDB oracle all agree row-for-row, and the
filter pushes into the scan (no shuffle at all).

The bucket uses md5 hex nibbles so both engines compute the identical
value (no engine-specific hash functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _bucket_sql(id_expr: str, cast_type: str) -> str:
    h = f"md5(CAST({id_expr} AS {cast_type}))"
    return (
        f"(instr('{_HEX}', substring({h}, 1, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substring({h}, 2, 1)) - 1)"
    )


def bucket_spark(id_expr: str) -> str:
    """Spark SQL: first md5 byte of the id as an int in [0, 256)."""
    return _bucket_sql(id_expr, "STRING")


def bucket_duck(id_expr: str) -> str:
    """DuckDB twin of ``bucket_spark`` (VARCHAR cast, same value)."""
    return _bucket_sql(id_expr, "VARCHAR")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash bucket < rate[stratum] * 256.

    Per-stratum rates let a pipeline downsample dominant strata
    (e.g. English) while keeping all of a rare one. Purely row-local:
    scales to any size with zero shuffles."""
    thresholds = F.lit(int(default_rate * 256))
    for value, rate in rates.items():
        thresholds = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * 256))
        ).otherwise(thresholds)
    return (
        df.withColumn("sample_bucket", F.expr(bucket_spark(id_col)))
        .filter(F.col("sample_bucket") < thresholds)
    )
