"""Data-layout operators: multi-dimensional clustering for scan
pruning.

At 100 TB the fastest scan is the one that never reads the file:
parquet footers carry per-file min/max stats, and the planner skips
files whose ranges miss the predicate. A table sorted on ONE column
prunes only on that column; Z-ORDERING (interleaving the bits of two
key columns into one sort key) bounds BOTH columns' min/max per file,
so a 2-D predicate (customer range x date range) skips most files —
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

``zorder_layout_audit`` computes the z-value in pure integer
arithmetic (engine-neutral, oracle-replayable), assigns rows to
fixed-width z-range "files", and reports each file's min/max per
dimension plus whether a reference 2-D predicate would scan it — the
exact footer-stats pruning decision, made auditable. The audit plan is
one partial-aggregated groupBy on a derived int key (no shuffle of the
wide rows, no window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # bits per dimension -> 16-bit z-value
ZFILES = 64  # files = z-range buckets of width 2^16 / 64
_ZWIDTH = (1 << (2 * ZBITS)) // ZFILES

# the reference 2-D probe predicate the audit evaluates:
# cust bucket in [32, 47] x day-of-year bucket in [100, 131]
PROBE_CUST = (32, 47)
PROBE_DAY = (100, 131)


def _interleave(cx: str, dx: str, intdiv: str) -> str:
    """Bit-interleaved z-value: cust bit b -> position 2b+1, day bit b
    -> position 2b. ``intdiv`` is the engine's integer-division
    operator ('div' for Spark, '//' for DuckDB); everything else is
    shared integer arithmetic."""
    terms = []
    for b in range(ZBITS):
        terms.append(f"((({cx}) {intdiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"((({dx}) {intdiv} {1 << b}) % 2) * {1 << (2 * b)}")
    return " + ".join(terms)


_CX = f"o_custkey % {1 << ZBITS}"
_DX_SPARK = f"dayofyear(o_orderdate) % {1 << ZBITS}"
_DX_DUCK = f"dayofyear(CAST(o_orderdate AS TIMESTAMP)) % {1 << ZBITS}"

_SCAN = (
    f"(max_cust >= {PROBE_CUST[0]} AND min_cust <= {PROBE_CUST[1]} "
    f"AND max_day >= {PROBE_DAY[0]} AND min_day <= {PROBE_DAY[1]})"
)


def zorder_layout_audit(orders: DataFrame) -> DataFrame:
    """Per-z-file layout stats + the pruning decision for the probe
    predicate. Columns: file_id, n_rows, min/max_cust, min/max_day,
    scanned. With a Z-layout the probe touches the few files whose
    2-D envelope overlaps the probe rectangle; the same audit on a
    1-D-sorted layout marks nearly every file scanned (each file's
    day envelope spans the whole year)."""
    z = _interleave(f"({_CX})", f"({_DX_SPARK})", "div")
    return (
        orders.selectExpr(
            f"CAST(({z}) div {_ZWIDTH} AS INT) AS file_id",
            f"CAST({_CX} AS INT) AS cx",
            f"CAST({_DX_SPARK} AS INT) AS dx",
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("cx").alias("min_cust"),
            F.max("cx").alias("max_cust"),
            F.min("dx").alias("min_day"),
            F.max("dx").alias("max_day"),
        )
        .selectExpr(
            "file_id",
            "n_rows",
            "min_cust",
            "max_cust",
            "min_day",
            "max_day",
            f"{_SCAN} AS scanned",
        )
    )


def sql_zorder_layout_audit(table: str = "orders") -> str:
    z = _interleave(f"({_CX})", f"({_DX_DUCK})", "//")
    return f"""
        WITH keyed AS (
            SELECT CAST(({z}) // {_ZWIDTH} AS INT) AS file_id,
                   CAST({_CX} AS INT) AS cx,
                   CAST({_DX_DUCK} AS INT) AS dx
            FROM {table}
        )
        SELECT file_id, COUNT(*) AS n_rows,
               MIN(cx) AS min_cust, MAX(cx) AS max_cust,
               MIN(dx) AS min_day, MAX(dx) AS max_day,
               {_SCAN} AS scanned
        FROM keyed GROUP BY file_id
    """


RANGE_FILES = 16


def range_layout_audit(
    orders: DataFrame, target: str, n_files: int = RANGE_FILES
) -> DataFrame:
    """PHYSICAL 1-D time-series layout: write the fact
    repartitionByRange(o_orderdate) + sortWithinPartitions (the
    standard date-layout for range-scan pruning), then read the REAL
    parquet footers back (pyarrow, metadata only) and audit the
    contract that makes pruning work: file [min, max] date envelopes
    must be pairwise NON-OVERLAPPING (the range partitioner gives
    each partition a disjoint key range, and equal keys never split).
    A date-range predicate then scans exactly the touched files; the
    same audit on a hash layout reports nearly-all-pairs overlap.

    One row: total_rows (exact), n_files_within_bound (contract:
    1..n_files — the sampler may leave a partition empty), plus the
    deterministic n_overlapping_pairs = 0 and the global date
    min/max — everything the oracle can recompute relationally.
    """
    import pyarrow.parquet as pq

    (
        orders.select("o_orderkey", "o_orderdate")
        .repartitionByRange(n_files, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(target)
    )
    import os

    envelopes = []
    total = 0
    for f in sorted(os.listdir(target)):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(target, f)).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(names["o_orderdate"]).statistics
            if st is None or not st.has_min_max:
                # mirrors sources/snapshots.commit_snapshot: a file
                # without stats can't be audited — skip the row group
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        total += meta.num_rows
        if lo is not None:
            envelopes.append((lo, hi))
    overlaps = sum(
        1
        for i in range(len(envelopes))
        for j in range(i + 1, len(envelopes))
        if not (envelopes[i][1] < envelopes[j][0] or envelopes[j][1] < envelopes[i][0])
    )
    spark = orders.sparkSession
    return spark.createDataFrame(
        [(total, 1 <= len(envelopes) <= n_files, overlaps)],
        "total_rows bigint, n_files_within_bound boolean, n_overlapping_pairs bigint",
    ).crossJoin(
        F.broadcast(
            orders.agg(
                F.min(F.to_date("o_orderdate")).alias("min_date"),
                F.max(F.to_date("o_orderdate")).alias("max_date"),
            )
        )
    )


def sql_range_layout_audit(table: str = "orders") -> str:
    """The audit's relational contract: row count and date bounds are
    exact data properties; non-overlap is the range layout's
    guarantee (0), and the file count stays within the requested
    bound."""
    return f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
               TRUE AS n_files_within_bound,
               CAST(0 AS BIGINT) AS n_overlapping_pairs,
               MIN(CAST(o_orderdate AS DATE)) AS min_date,
               MAX(CAST(o_orderdate AS DATE)) AS max_date
        FROM {table}
    """
