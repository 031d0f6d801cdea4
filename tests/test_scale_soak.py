"""sf1 scale soak (VERDICT r2 items 1+8): the window-heavy entries'
partitioning claims checked EMPIRICALLY at 10x the bench SF, on the
AQE-final executed plan (after an action, so runtime re-planning has
happened), not just the static plan at sf0.001.

The sf1 tables are derived from the driver's sf0.1 set by
tools/gen_sf.py (replication with cohort-preserving key offsets).
Skipped when the derived directory is absent — generate it with
`python tools/gen_sf.py` first. The bench twin of this soak is
BENCH_sf1.json at the repo root.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".artifacts",
    "sf1.0",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF1_DIR),
    reason="sf1 derived tables not generated (python tools/gen_sf.py)",
)

QUERIES = entrymod.queries()


@pytest.mark.parametrize(
    "name",
    [
        "orders_recency_stats",
        "orders_moving_window",
        "scd2_order_history",
    ],
)
def test_sf1_windows_stay_partitioned_after_aqe(spark, name):
    """Run the window-heavy entry at sf1 and assert the FINAL
    (post-AQE) physical plan still partitions every window by its
    key — no runtime re-plan may collapse a window onto a single
    partition when the data is 10x the bench SF."""
    df = QUERIES[name](spark, SF1_DIR)
    assert df.count() > 0
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    window_lines = [
        line
        for line in final_plan.splitlines()
        if "Window" in line and "windowspecdefinition" in line
    ]
    assert window_lines, f"{name}: no window in executed plan?"
    for line in window_lines:
        assert "SinglePartition" not in line, (
            f"{name}: window collapsed to a single partition at sf1\n{line}"
        )


def test_sf1_bounded_window_exchange_has_multiple_partitions(spark):
    """The per-customer recency window's shuffle must actually spread
    at sf1: the partition key (o_custkey) has ~150k distinct values,
    so the exchange feeding the window has to fan out over the full
    shuffle-partition count, not funnel through a handful of tasks."""
    from pyspark.sql import functions as F

    df = QUERIES["orders_recency_stats"](spark, SF1_DIR)
    assert df.count() > 0
    orders = spark.read.parquet(os.path.join(SF1_DIR, "orders.parquet"))
    n_parts = (
        orders.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "o_custkey"
        )
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert n_parts >= 8, f"window exchange funnels into {n_parts} partitions"
