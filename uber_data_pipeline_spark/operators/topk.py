"""Top-k operators.

Reference parity:
- global top-k  → top_3_base_names_by_total_pickups.sql (ORDER BY
  COUNT DESC LIMIT 3)
- top-k per group → top_3_pickup_dates_per_base.sql (RANK() OVER
  (PARTITION BY base ORDER BY COUNT(*) DESC) ... WHERE rank IN (1,2,3))

Scale notes: global top-k is a TakeOrderedAndProject (per-partition
heap + single small merge — no full sort, no global shuffle of the
data). Per-group top-k ranks *pre-aggregated* rows only; the window
partitions by the group key, so state per task is bounded by group
cardinality, never raw-row cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Pass explicit tie-breaker columns in ``order_by``
    so the result set is deterministic."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    method: str = "rank",
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group.

    method='rank' keeps ties (reference semantics: rank IN (1..k));
    method='row_number' returns exactly k rows per group (requires
    order_by to be a total order for determinism).
    """
    fn = {"rank": F.rank, "row_number": F.row_number, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, fn().over(w)).filter(F.col(rank_col) <= k)
