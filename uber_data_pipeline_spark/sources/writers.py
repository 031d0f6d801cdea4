"""Sink-side storage layout: the decisions that dominate read cost at
100 TB.

- ``write_partitioned``: date/key-partitioned parquet lake layout —
  readers hit only matching partition directories (PartitionFilters
  in the scan), and dynamic partition overwrite makes daily re-runs
  idempotent per partition instead of truncate-and-reload (the
  reference's Airbyte sync is full-refresh per day; this is the
  incremental equivalent).
- ``write_bucketed``: pre-shuffled table layout. Two tables bucketed
  by the same key into the same bucket count join WITHOUT a shuffle
  on either side — the fact-fact join cost (e.g. orders x lineitem
  on orderkey) is paid once at write time, then every downstream
  join is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Partitioned parquet write; with ``dynamic`` only the partitions
    present in ``df`` are replaced (idempotent incremental loads)."""
    spark = df.sparkSession
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed external parquet table registered in the session
    catalog (bucket metadata lives in the catalog — readers must go
    through ``spark.table``, not ``spark.read.parquet``, to get the
    exchange-free join)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .option("path", path)
        .mode("overwrite")
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (zlib by default) — same layout rules as the parquet
    lake writer; for consumers standardized on ORC (Hive-era
    warehouses)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.orc(path)
