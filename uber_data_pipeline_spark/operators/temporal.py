"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded forward-window (range) join.

Both avoid the naive O(n^2) inequality join:

- as-of join: union both sides tagged, ONE per-key window pass with
  last(ignorenulls) — the classic scalable as-of (no join at all;
  one shuffle on the key, linear scan per partition).
- forward-window join: time is bucketed at the horizon width, so a
  row's matches can only live in its own or the next bucket — the
  inequality join becomes an equality join on (key, bucket) probing
  two buckets, with the exact range predicate applied bucket-locally.
  Candidate fan-out is bounded by per-bucket density, never n^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_attach(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    attach: dict[str, Column] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (inclusive) for the same key.

    Returns the left rows plus:
      - ``asof_ts``: that latest right timestamp (null if none)
      - ``n_prior``: how many right rows were at-or-before left_ts
      - any extra ``attach`` columns: name -> last-non-null expression
        evaluated over right rows (use F.when(F.col("__is_left") == 0,
        <right col>) shapes).

    Right rows sort BEFORE left rows at equal timestamps, so equality
    means "already visible" — the same inclusive semantics as
    ``ASOF JOIN ... ON l.ts >= r.ts``.
    """
    lt = left.withColumn("__is_left", F.lit(1)).withColumn("__t", F.col(left_ts))
    rt = right.select(
        key, F.col(right_ts).alias("__t"), *[c for c in right.columns if c != key and c != right_ts]
    ).withColumn("__is_left", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_t = F.when(F.col("__is_left") == 0, F.col("__t"))
    out = (
        u.withColumn("asof_ts", F.last(right_t, ignorenulls=True).over(w))
        .withColumn(
            "n_prior",
            F.sum(F.when(F.col("__is_left") == 0, 1).otherwise(0)).over(w),
        )
    )
    for name, expr in (attach or {}).items():
        out = out.withColumn(name, F.last(expr, ignorenulls=True).over(w))
    return out.filter(F.col("__is_left") == 1).drop("__is_left", "__t")


def forward_window_counts(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    horizon_seconds: int,
) -> DataFrame:
    """Per row: count of same-key rows strictly after it but within
    ``horizon_seconds`` — (ts, ts + horizon]. Zero-match rows kept.

    Bucket width == horizon, so matches live in bucket b or b+1 of
    the probing row; each probe row is exploded into exactly those
    two bucket keys and joined by equality. At 100 TB this is the
    standard bounded range join: one shuffle on (key, bucket), no
    inequality cross product, skew bounded by bucket density.
    """
    horizon_us = horizon_seconds * 1_000_000
    base = df.select(
        F.col(id_col), F.col(key), F.col(ts), F.unix_micros(F.col(ts)).alias("__us")
    ).withColumn("__bucket", F.floor(F.col("__us") / F.lit(horizon_us)))
    probe = base.select(
        id_col,
        key,
        "__us",
        F.explode(
            F.array(F.col("__bucket"), F.col("__bucket") + 1)
        ).alias("__pb"),
    )
    other = base.select(
        F.col(key).alias("__k2"),
        F.col("__us").alias("__us2"),
        F.col("__bucket").alias("__b2"),
    )
    matches = (
        probe.join(
            other,
            (F.col(key) == F.col("__k2"))
            & (F.col("__pb") == F.col("__b2"))
            & (F.col("__us2") > F.col("__us"))
            & (F.col("__us2") <= F.col("__us") + F.lit(horizon_us)),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("__n"))
    )
    return (
        base.join(matches, id_col, "left")
        .select(
            id_col,
            key,
            ts,
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_within_horizon"),
        )
    )


def interval_point_counts(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    id_col: str,
    bin_days: int,
) -> DataFrame:
    """Variable-length interval join: per interval (``id_col``,
    ``key``, integer day columns ``s_day``..``e_day``), count the
    points (``key``, ``p_day``) with s_day <= p_day <= e_day for the
    same key. Inner semantics — zero-hit intervals drop out.

    Generalizes ``forward_window_counts`` to intervals of ANY length:
    each interval is exploded to the day-bins it overlaps
    (len/bin_days + 1 rows, bounded fan-out), a point lives in
    exactly ONE bin — so every true (interval, point) match is found
    exactly once, no post-join DISTINCT — and the join is pure
    equality on (key, bin) with the exact range applied bucket-local.
    At 100 TB this is the standard binned range join: one shuffle per
    side on (key, bin); bin width trades replication (long intervals)
    against bucket density (short ones) — set it near the p99
    interval length.
    """
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col("s_day") / bin_days),
                F.floor(F.col("e_day") / bin_days),
            )
        ),
    )
    pt = points.select(
        F.col(key).alias("__pk"),
        F.col("p_day"),
        F.floor(F.col("p_day") / bin_days).alias("__pbin"),
    )
    return (
        iv.join(
            pt,
            (F.col(key) == F.col("__pk"))
            & (F.col("__bin") == F.col("__pbin"))
            & (F.col("p_day") >= F.col("s_day"))
            & (F.col("p_day") <= F.col("e_day")),
        )
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_points"))
    )
