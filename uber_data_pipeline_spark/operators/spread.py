"""Scan-parallelism spreading for compute-dense row-local operators.

Problem (r12, found while profiling documents_gopher_repetition at
sf1): Spark sizes scan splits by BYTES (spark.sql.files.
maxPartitionBytes), and a parquet split can never be finer than a row
group. The bench corpora are written as ONE file with ONE row group
(6 MB compressed at sf1), so every zero-shuffle row-local operator —
exactly the operators praised for having no Exchange — executes its
entire per-document compute on ONE core while 31 idle: the scan is
byte-cheap but the operator is CPU-dense (n-gram sorts cost ~1000x
the bytes read). Measured: gopher repetition 12.0 s serial vs 1.4 s
spread at sf1.

Fix: a GATED round-robin repartition. If the scan already yields at
least one split per core — which a real lake always does (a 100 TB
corpus is millions of row groups; split count >> cores on any
cluster) — this is a NO-OP and the plan keeps zero Exchange. Only
when the input is under-split locally does it add one round-robin
Exchange whose shuffle volume is the (tiny) input relation itself,
traded against a >10x win in compute parallelism. This is the
decision a production job makes with spark.sql.files.maxPartitionBytes
— expressed per-operator because maxPartitionBytes cannot split below
row-group grain.

The factor-of-2 over-split smooths per-document length skew:
round-robin equalizes ROW counts, not token counts, so 2 waves of
smaller partitions let the scheduler rebalance stragglers.

Why PER-OPERATOR and not once in catalog.load_table: measured (r12
A/B over a 15-entry representative slice at sf0.1). A blanket loader
spread is net-NEGATIVE (22.9 -> 23.3 s): compute-dense maps win big
(corr-matrix moments 4.3 -> 1.2 s, tpch_q1 1.9 -> 1.3 s) but
light-map shuffle queries lose consistently (tpch_q9 0.67 -> 1.60 s,
events_distinct_users 0.22 -> 0.80 s — the extra round-robin
exchange costs more than the parallelism returns when the map side
is just decode+project before a keyed exchange). Compute density is
a property of the OPERATOR, so the operator opts in. Rewriting the
bench corpus with more row groups is not available: the driver's
testdata is read-only and its bench runs against that layout.

Cost note: the gate probes df.rdd.getNumPartitions(), one extra
logical->RDD conversion per call (~10-30 ms on a scan-rooted input).
Sixteen opted-in sites pay well under a second across the whole
219-entry bench — noise against the multi-second wins above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SPREAD_FACTOR = 2


def spread_rowlocal(df: DataFrame, factor: int = SPREAD_FACTOR) -> DataFrame:
    """Round-robin repartition ``df`` to ``factor * cores`` partitions
    IFF its current partition count is below the core count; identity
    otherwise (the at-scale path). Call it on the narrowest projection
    the operator needs, BEFORE the compute-dense expressions, so the
    shuffle moves the fewest bytes and the parallelism covers the
    whole compute."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        n_parts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — spreading is an optimization only
        return df
    if n_parts >= cores:
        return df
    return df.repartition(cores * factor)
