"""Oracle-comparison helpers shared by tests/ and tools/.

Replicates the round driver's check: row count, column-name set, and
order-insensitive value equality between a Spark result and the
DuckDB oracle for the same query.
"""

from __future__ import annotations

import datetime

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — the
    order-insensitive frame the hashes are computed over."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            # Spark DATE comes back as object(datetime.date) while
            # DuckDB DATE/TIMESTAMP comes back datetime64 — the driver
            # hashes those equal (r1: orders_daily_gapfill et al were
            # green), so canonicalize temporals to one dtype instead
            # of flagging them.
            non_null = s.dropna()
            if len(non_null) and all(
                isinstance(v, (datetime.date, datetime.datetime))
                for v in non_null
            ):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Empty list == match; else human-readable problem descriptions."""
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = normalize(spark_df), normalize(oracle_df)
    # The driver's value hash is dtype-sensitive: DuckDB SUM(int) comes
    # back HUGEINT -> float64 while Spark's is int64, values equal but
    # hashes differ (r1's tpch_q12). normalize() maps every numeric to
    # int64-or-float64, so any residual dtype difference here is exactly
    # the class the driver would flag — report it even when every cell
    # compares equal.
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            problems.append(
                f"dtype mismatch col={c}: spark={a[c].dtype} oracle={b[c].dtype}"
                " (driver hash is type-sensitive — CAST the oracle column)"
            )
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        for c in bad_cols[:3]:
            i = neq[c].idxmax()
            problems.append(
                f"value mismatch col={c} row={i}: spark={a[c][i]!r} oracle={b[c][i]!r}"
            )
        if not bad_cols and not any(p.startswith("dtype mismatch") for p in problems):
            problems.append(
                "frames not equal but no differing cells or dtypes found "
                "(index/NaN-layout divergence — inspect manually)"
            )
    return problems


def timed_noop_run(spark, fn, sf_dir, clear_all, threshold_s: float = 0.3):
    """THE shared bench measurement kernel (r12 — previously
    copy-pasted in bench.py, tools/rebench_entries.py and
    tools/scale_ladder.py, whose docstrings promise byte-identical
    methodology; one estimator change already had to be applied three
    times in lockstep).

    Times fn(spark, sf_dir) with a full-column noop-sink write +
    observe() row count: up to 4 reps — rep 1 always; sub-threshold
    entries stop there; reps 2-3 otherwise; a 4th only when the first
    three spread > 2x (bimodal host contention — one more draw from
    the fast regime). Estimator = MIN of reps (contention only ever
    ADDS time; see bench.py's comment / VERDICT r11 item 1).
    ``clear_all`` is called between reps (cache + localCheckpoint
    cleanup is the caller's policy). Returns (min_s, reps, rows)."""
    import time

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    reps: list[float] = []
    rows = None
    for i in range(4):
        t0 = time.perf_counter()
        obs = Observation()
        (
            fn(spark, sf_dir)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        rows = obs.get["n"]
        reps.append(round(time.perf_counter() - t0, 3))
        clear_all(spark)
        if i == 0 and reps[0] <= threshold_s:
            break
        if i == 2 and max(reps) <= 2.0 * min(reps):
            break
    return min(reps), reps, rows
