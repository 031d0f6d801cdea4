"""DAG materialization runner: topo-sorted model builds with
selective refresh — the Dagster-asset-graph role
(/root/reference/Dagster_Files/definitions.py: airbyte assets feed
dbt assets on a @daily schedule).

Each materialized model is written as parquet and registered as a
temp view so downstream models read the MATERIALIZED result (one
build per model per run, dbt semantics), not a re-derived plan.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from uber_data_pipeline_spark.catalog import load_tables
from uber_data_pipeline_spark.plans.model import ModelRegistry


@dataclass(frozen=True)
class BuildResult:
    model: str
    n_rows: int
    seconds: float
    path: str


def run_dag(
    spark: SparkSession,
    registry: ModelRegistry,
    sf_dir: str,
    out_dir: str,
    select: set[str] | None = None,
    materialize: bool = True,
) -> list[BuildResult]:
    """Materialize the selected models (and their upstreams) in
    dependency-level order: levels run sequentially, models WITHIN a
    level concurrently (they are independent by construction — the
    dbt/Dagster thread-pool execution model; Spark's FIFO scheduler
    interleaves the sibling jobs across the executor pool).
    ``materialize=False`` builds views only (a dry run /
    `dbt compile`)."""
    from concurrent.futures import ThreadPoolExecutor

    load_tables(spark, sf_dir, register_views=True)

    def build_one(model) -> BuildResult:
        t0 = time.perf_counter()
        df: DataFrame = model.build(spark)
        path = os.path.join(out_dir, model.name)
        if materialize:
            df.write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
        df.createOrReplaceTempView(model.name)
        return BuildResult(
            model=model.name,
            n_rows=df.count(),
            seconds=round(time.perf_counter() - t0, 3),
            path=path if materialize else "",
        )

    results: list[BuildResult] = []
    for level in registry.topo_levels(select):
        if len(level) == 1:
            results.append(build_one(level[0]))
            continue
        with ThreadPoolExecutor(max_workers=min(8, len(level))) as pool:
            results.extend(pool.map(build_one, level))
    return results
