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


def refresh_incremental(
    spark: SparkSession,
    registry: ModelRegistry,
    name: str,
    sf_dir: str,
    out_dir: str,
    cutoff: str,
) -> DataFrame:
    """Incrementally materialize one model declared with an
    IncrementalSpec: a prior full build over rows BEFORE ``cutoff``
    (on the spec's declared ``event_col`` — the filters are DERIVED
    from the declared watermark column, not free-form, so they can't
    silently cut on a different column) is the stored table (the
    previous scheduled run); the refresh aggregates ONLY the rows at
    or after ``cutoff`` and merges them into the stored partials by
    summing the additive columns per key —
    the dbt-incremental materialization the reference's @daily dbt
    run would use instead of full-refresh.

    Scale shape: the refresh never re-reads history — it scans the
    delta (with the event-time predicate pushed into the scan), and
    the merge is a groupBy over (stored partials ∪ delta partials),
    both already reduced to key cardinality. Valid for commutative-
    monoid aggregates only, which is what IncrementalSpec declares.

    Returns the merged table (also written to ``out_dir/<name>``)."""
    import pyspark.sql.functions as F

    from uber_data_pipeline_spark.catalog import load_tables

    model = registry.models[name]
    spec = model.incremental
    assert spec is not None, f"model {name} is not incremental"
    base_filter = f"{spec.event_col} < TIMESTAMP '{cutoff}'"
    delta_filter = f"{spec.event_col} >= TIMESTAMP '{cutoff}'"
    load_tables(spark, sf_dir, register_views=True)

    stored_path = os.path.join(out_dir, name)
    # 1) the previous scheduled run: full build of the base window
    model.build(spark, incremental_filter=base_filter).write.mode(
        "overwrite"
    ).parquet(stored_path)

    # 2) the refresh: delta partials only + monoid merge
    stored = spark.read.parquet(stored_path)
    delta = model.build(spark, incremental_filter=delta_filter)
    merged = (
        stored.unionByName(delta)
        .groupBy(*spec.keys)
        .agg(*[F.sum(c).alias(c) for c in spec.additive])
    )
    merged_path = os.path.join(out_dir, f"{name}__merged")
    merged.write.mode("overwrite").parquet(merged_path)
    return spark.read.parquet(merged_path)


def due_run(registry: ModelRegistry, as_of) -> list[tuple]:
    """Schedule EXECUTION: which models are due after ``as_of``, in
    what order — the half of ``ScheduleDefinition`` that
    :func:`schedule_report` (pure metadata) doesn't cover (reference:
    Dagster_Files/definitions.py:17-20, a @daily cron trigger over the
    asset graph).

    Returns [(run_order, model, level, next_fire)]: ``next_fire`` is
    the first cron fire STRICTLY AFTER ``as_of``
    (:func:`uber_data_pipeline_spark.plans.cron.next_fire`); ``level``
    is the model's Kahn depth over REGISTRY-INTERNAL dependency edges
    (deps naming raw tables don't order models against each other);
    ``run_order`` ranks by (level, model) — the deterministic
    materialization order a tick at ``next_fire`` would run.
    Unscheduled models (``schedule is None``, model.py's documented
    "None = unscheduled") are not due and are skipped; their levels
    still count, so a scheduled model downstream of an unscheduled
    one keeps its Kahn depth. Control plane: registry-sized metadata,
    no data rows touched."""
    from uber_data_pipeline_spark.plans.cron import next_fire

    level = _kahn_levels(registry)
    ordered = sorted(
        (m for m in registry.models.values() if m.schedule is not None),
        key=lambda m: (level[m.name], m.name),
    )
    return [
        (i + 1, m.name, level[m.name], next_fire(m.schedule, as_of))
        for i, m in enumerate(ordered)
    ]


def _kahn_levels(registry: ModelRegistry) -> dict[str, int]:
    """Kahn depth per model over registry-internal dependency edges,
    with a cycle guard: a dependency cycle raises ValueError naming
    the revisited model (matching topo_order's contract) instead of
    recursing unboundedly."""
    names = set(registry.models)
    level: dict[str, int] = {}

    def depth(name: str, seen: frozenset = frozenset()) -> int:
        if name in seen:
            raise ValueError(f"dependency cycle through model {name!r}")
        if name not in level:
            internal = [d for d in registry.models[name].deps if d in names]
            level[name] = (
                0
                if not internal
                else 1 + max(depth(d, seen | {name}) for d in internal)
            )
        return level[name]

    for n in registry.models:
        depth(n)
    return level


def downstream_closure(registry: ModelRegistry, name: str) -> list[str]:
    """Registry models that (transitively) depend on ``name``, sorted
    by (Kahn level, name) — the set a partition backfill must refresh
    after rebuilding ``name``'s partitions (the Dagster
    backfill-with-downstream shape)."""
    names = set(registry.models)
    out = {name}
    changed = True
    while changed:
        changed = False
        for m in registry.models.values():
            if m.name not in out and any(d in out for d in m.deps if d in names):
                out.add(m.name)
                changed = True
    out.discard(name)
    level = _kahn_levels(registry)
    return sorted(out, key=lambda n: (level[n], n))


def schedule_report(registry: ModelRegistry) -> list[tuple[str, str, int, bool]]:
    """(model, schedule cron, n_deps, is_incremental) rows — the
    Dagster ScheduleDefinition surface ("what runs when"), exposed as
    plain data so the registry query can value-check it."""
    return [
        (
            m.name,
            m.schedule or "",
            len(m.deps),
            m.incremental is not None,
        )
        for m in sorted(registry.models.values(), key=lambda m: m.name)
    ]
