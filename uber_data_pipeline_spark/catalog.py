"""Star-schema catalog: load the test tables and register views.

Mirrors the reference's dbt ``sources.yml`` (3 BigQuery source
tables) generalized to the 10-table star schema the driver generates.
Reference: /root/reference/src/main/uber_transformations/models/udp_trans/sources.yml
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from uber_data_pipeline_spark.session import tune_runtime
from uber_data_pipeline_spark.sources.readers import normalize_events

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dimension tables small enough to broadcast at any SF we target;
# queries hint these explicitly so plans survive stats misestimates.
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    tune_runtime(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as both TIMESTAMP(NANOS) — which
        # Spark's vectorized reader rejects outright without the
        # nanosAsLong escape hatch — and TIMESTAMP(MICROS).
        # normalize_events() reconciles either encoding to plain
        # microsecond TIMESTAMP so oracle comparisons line up.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every table as a DataFrame; optionally register temp views
    so ``spark.sql`` queries see them by name."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
