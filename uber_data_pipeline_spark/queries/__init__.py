"""Named query registry.

Each submodule exports QUERIES (name -> fn(spark, sf_dir) -> DataFrame)
and ORACLES (name -> DuckDB SQL string, omitted for non-SQL ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from uber_data_pipeline_spark.queries import uber, tpch, events


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def _modules():
    from uber_data_pipeline_spark.queries import pipeline, tpch_extra, training

    return [uber, tpch, tpch_extra, events, training, pipeline]
