"""SparkSession factory tuned for the engine.

Defaults target local[N] testing but every knob is chosen for how it
behaves on a large cluster: AQE on (runtime re-plan, skew-join
handling, partition coalescing), broadcast threshold sized so dim
tables broadcast, Arrow on for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# InferFiltersFromGenerate re-derives `size(arr) > 0 AND isnotnull(arr)`
# below every explode; predicate pushdown then substitutes the FULL
# generator expression into that filter, where it runs as an interpreted
# Predicate — for computed arrays (tokenize+shingle) the inner split()
# is re-evaluated per lambda element, an ~8x slowdown on the shingle
# pipelines. The inferred filter never changes results (explode already
# drops empty/null arrays); excluding the rule is pure win here.
EXCLUDED_OPTIMIZER_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def tune_runtime(spark: SparkSession) -> SparkSession:
    """Runtime (SQLConf-level) tuning that must hold even when the
    caller owns the SparkSession (the round driver builds a vanilla
    one) — applied from catalog.load_table so every query path gets
    it regardless of session factory."""
    spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)
    # deterministic tz so NTZ->TIMESTAMP casts and timestamp math match
    # the oracle even when the caller's session didn't pin it
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _default_driver_mem() -> str:
    """Local-mode driver-heap default: half of the machine's total
    memory, capped at 24g and floored at 2g. In local[N] the driver
    heap IS the executor heap — every task plus every concurrent
    broadcast build shares it — so 24g is right on the 128 GiB bench
    box but would push a small host into swap (ADVICE r3). Explicit
    SPARK_DRIVER_MEM always wins."""
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        page_size = os.sysconf("SC_PAGE_SIZE")
        total_gib = pages * page_size / (1 << 30)
    except (ValueError, OSError, AttributeError):
        return "24g"
    return f"{max(2, min(24, int(total_gib // 2)))}g"


def scheduler_mode() -> str:
    """The scheduler actually used: SPARK_GRAFT_SCHEDULER sanitized to
    FAIR/FIFO (anything else means FIFO). bench.py stamps its output
    with this same function so recorded metadata can't disagree with
    the session config."""
    mode = os.environ.get("SPARK_GRAFT_SCHEDULER", "FIFO").upper()
    return mode if mode in ("FAIR", "FIFO") else "FIFO"


def get_spark(
    app_name: str = "uber-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    scheduler = scheduler_mode()
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting,
        # dynamic join-strategy switch — essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # parallelismFirst stays TRUE (Spark's default) after a full
        # 227-entry A/B (r14): flipping it false — the byte-derived
        # reduce width Spark's tuning doc suggests for pure-ETL
        # shuffles — read 220.2 s vs 180.1 s sequential and 52.2 vs
        # 42.9 s concurrent-8 on this suite, because our reduce
        # stages are COMPUTE-dense at small bytes (LPA/pagerank vote
        # aggregates, shingle self-joins, cell-local gemms): AQE
        # coalesced them to 1-2 tasks and serialized the CPU. Worst:
        # parts_label_propagation 3.4 -> 12.6 s, dedup_lsh_tuning
        # 1.9 -> 8.2 s; the wins it bought elsewhere were < 0.3 s
        # each. Env knob for deployments whose reduce stages are
        # byte-bound (classic ETL at 100 TB), where false is right.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_AQE_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # preferSortMergeJoin stays TRUE (Spark's default) after a
        # full 227-entry A/B (r14): globally allowing planner-picked
        # shuffled-hash joins read 195.2 s vs 180.1 s sequential
        # (worst: parts_pagerank_iterated +0.8 s, dedup_clusters
        # family +0.3-0.5 s — hash builds on the few-but-wide
        # post-aggregate relations lose to the pipelined sorts), plus
        # one StackOverflowError in a streaming thread. The operators
        # that PROFIT from SHJ (the shingle self-joins) already hint
        # SHUFFLE_HASH at the call site — per-join choice beats a
        # session-global flip. Env knob kept for byte-bound ETL
        # deployments.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_PREFER_SMJ", "true"),
        )
        # dims up to 64 MiB broadcast instead of shuffling the fact side
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for the pandas_udf / mapInPandas operators
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deterministic session timezone so timestamp math matches the oracle
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode sizing: half of physical RAM capped at 24g (8g
        # OOM'd broadcast builds under 8-way concurrency at the sf1
        # soak). A cluster deployment sizes executors instead.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", _default_driver_mem()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)
        # Job scheduling: FIFO by default, MEASURED not assumed — the
        # r7 four-cell A/B (SCHED_AB.md; identical snapshot, median-of-3)
        # read FIFO 156.0 s sequential / 30.0 s concurrent-8 vs
        # properly-wired FAIR (allocation file declaring the default
        # pool FAIR + one scheduler pool per submitter thread) at
        # 162.5 s / 70.7 s. FAIR round-robins task slots across all
        # concurrent jobs, which trades MAKESPAN for per-job latency
        # fairness — the right call for interactive multi-tenant
        # serving, the wrong default for throughput. Opt in with
        # SPARK_GRAFT_SCHEDULER=FAIR (the allocation file below then
        # makes same-pool jobs genuinely share, unlike the bare
        # scheduler.mode=FAIR no-op r5/r6 flagged).
        .config("spark.scheduler.mode", scheduler)
    )
    if scheduler == "FAIR":
        # the mode alone is not enough: with no allocation file the
        # implicit default pool schedules its OWN jobs FIFO. Ship a
        # declared default pool with FAIR internal mode so same-pool
        # concurrent jobs actually share task slots.
        builder = builder.config(
            "spark.scheduler.allocation.file",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fairscheduler.xml"),
        )
    return builder.getOrCreate()
