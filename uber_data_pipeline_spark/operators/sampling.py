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


def domain_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
) -> DataFrame:
    """Rebalance a corpus toward a UNIFORM mixture over ``domain_col``
    (the classic pre-training "domain mixing" step: cap dominant
    sources at their fair share, keep rare sources whole).

    Per-domain keep rate = min(1, (total / n_domains) / domain_count),
    applied with the same row-local md5 bucket as
    ``stratified_sample`` so the kept set is a pure function of the
    data. The comparison stays in INTEGER math
    (bucket * n_domains * cnt < 256 * total) so Spark and the oracle
    agree bit-for-bit with no float thresholds.

    Scale shape: the per-domain count aggregate is tiny (one row per
    domain) and broadcast back onto the fact scan; the total is a
    1-row broadcast. No shuffle touches the wide rows — the filter is
    evaluated row-locally, then one bounded-cardinality groupBy
    produces the report.

    Returns per-domain report: domain, n_docs, n_kept.
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    totals = counts.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_domains")
    )
    kept = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.expr(bucket_spark(id_col)).alias("bucket"),
        )
        .join(F.broadcast(counts), "domain")
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("bucket") * F.col("n_domains") * F.col("n_docs")
            < 256 * F.col("total")
        )
        .groupBy("domain")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        counts.join(kept, "domain", "left")
        .select(
            "domain",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def domain_mixture_oracle(table: str, id_col: str, domain_col: str) -> str:
    """DuckDB twin of :func:`domain_mixture` (same integer-math keep
    rule, same report columns)."""
    return f"""
        WITH counts AS (
            SELECT {domain_col} AS domain, COUNT(*) AS n_docs
            FROM {table} GROUP BY 1
        ), totals AS (
            SELECT SUM(n_docs) AS total, COUNT(*) AS n_domains FROM counts
        ), kept AS (
            SELECT t.{domain_col} AS domain, COUNT(*) AS n_kept
            FROM {table} t
            JOIN counts c ON c.domain = t.{domain_col}
            CROSS JOIN totals
            WHERE ({bucket_duck(f"t.{id_col}")}) * n_domains * c.n_docs
                  < 256 * total
            GROUP BY 1
        )
        SELECT c.domain, c.n_docs, COALESCE(k.n_kept, 0) AS n_kept
        FROM counts c LEFT JOIN kept k ON k.domain = c.domain
    """


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
