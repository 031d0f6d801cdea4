"""Probabilistic sketches built from first principles so the engine
and the DuckDB oracle agree BIT-FOR-BIT.

Spark's own approx_count_distinct (HLL++) and DuckDB's approx
aggregates use engine-private hash functions, so their estimates can
never be cross-checked value-for-value. These operators rebuild the
sketches from the repo's engine-neutral hash primitives (md5-prefix
base hash + the universal multiply-add-mod family from
operators/dedup.py), which makes the whole estimate deterministic:
every arithmetic step is exact int64 until one final IEEE division.

Why this matters at 100 TB: the sketch registers are the ONLY thing
shuffled. HLL reduces a count-distinct over billions of user ids to
m=256 rows per group (vs the full two-phase distinct expansion);
count-min reduces per-key frequency tracking to a d x w = 4x512
integer grid. Both aggregate map-side (max / sum are algebraic), so
the shuffle volume is O(groups * registers), independent of row
count. Reference counterpart: the BigQuery models run exact
COUNT(DISTINCT ...) (top_3_base_names_by_total_pickups.sql:4); these
are the documented approximate swap-ins for when exact is too
expensive, with the estimate-vs-exact error surfaced in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---- engine-neutral base hash (48-bit md5 prefix) --------------------
# Same construction as operators/dedup.py SHINGLE_HASH_*, generalized
# to any string expression and WITHOUT the mod so HLL keeps all 48
# uniform bits.


def base_hash48_spark(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 12), 16, 10) AS bigint)"


def base_hash48_duck(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 13), "
        f"i -> (instr('0123456789abcdef', substring(md5({expr}), i, 1)) - 1)::BIGINT)), "
        f"(h, c) -> h * 16 + c)"
    )


# ---- HyperLogLog ------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_REST_BITS = 40  # 48-bit hash minus 8 register-index bits
# alpha_256 from Flajolet et al. 2007; a fixed literal so both engines
# fold the identical double constant.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_rho_sql(rest: str) -> str:
    """Leading-zero rank of a 40-bit value: 41 - bitlength(rest), with
    rest=0 -> 41. bin() (no left padding) is bit-identical in Spark
    and DuckDB, so bitlength = length(bin(x)) in BOTH engines."""
    return (
        f"CASE WHEN {rest} = 0 THEN {HLL_REST_BITS + 1} "
        f"ELSE {HLL_REST_BITS} - length(bin({rest})) + 1 END"
    )


_HLL_TWO41 = 1 << (HLL_REST_BITS + 1)


def _hll_raw_sql() -> str:
    """Raw HLL estimate over (n_present, s_present) columns — ONE
    definition for the batch sketch, the union report, the streaming
    maintainer, and every DuckDB twin (the expression is dialect-
    shared), so the estimator can never desynchronize between paths
    that are pinned bit-equal."""
    return (
        f"(CAST({HLL_ALPHA!r} AS double) * {HLL_M} * {HLL_M} * {_HLL_TWO41} "
        f"/ (s_present + ({HLL_M} - n_present) * CAST({_HLL_TWO41} AS bigint)))"
    )


def _hll_est_sql() -> str:
    """Raw estimate + Flajolet small-range (linear counting) switch."""
    raw = _hll_raw_sql()
    return (
        f"(CASE WHEN {raw} <= 2.5 * {HLL_M} AND n_present < {HLL_M} "
        f"THEN {HLL_M} * ln(CAST({HLL_M} AS double) / ({HLL_M} - n_present)) "
        f"ELSE {raw} END)"
    )


def hll_distinct(ev: DataFrame, key: str = "user_id", group: str = "event_type") -> DataFrame:
    """Deterministic HLL distinct-count estimate per group, with the
    exact count and relative error alongside.

    register = h48 % m, rho = leading-zeros(h48 / m) + 1; per group
    the registers aggregate with MAX (algebraic -> map-side combine),
    then E_raw = alpha_m * m^2 / sum(2^-M_j). The harmonic sum is kept
    EXACT: sum(2^-M_j) = S / 2^41 with S = sum(2^(41-M_j)) an int64
    (absent registers contribute M_j=0 -> 2^41 each). One double
    division at the end — IEEE-exact inputs, identical result in both
    engines. The standard small-range correction (linear counting,
    E = m * ln(m / V) when E_raw <= 2.5m and V zero registers remain)
    is applied as in Flajolet et al.; ln() is the one step relying on
    both libms rounding alike — verified value-identical on every
    group at both oracle SFs (inputs are the 256 rationals m/V, far
    from rounding boundaries after round(.,3)).

    Scale: shuffle is (groups x <=256) register rows; the exact
    count-distinct column is only for the error report — drop it in
    production and the whole query is one narrow pass."""
    hashed = ev.selectExpr(
        group,
        key,
        f"{base_hash48_spark(f'CAST({key} AS string)')} AS h48",
    ).selectExpr(
        group,
        key,
        f"h48 % {HLL_M} AS reg",
        f"h48 DIV {HLL_M} AS rest",
    )
    registers = (
        hashed.selectExpr(group, "reg", f"{_hll_rho_sql('rest')} AS rho")
        .groupBy(group, "reg")
        .agg(F.max("rho").alias("m_j"))
    )
    exact = hashed.groupBy(group).agg(F.countDistinct(key).alias("n_exact"))
    return hll_report_from_registers(registers, exact, group)


def hll_report_from_registers(
    registers: DataFrame, exact: DataFrame, group: str = "event_type"
) -> DataFrame:
    """Estimate epilogue over a (group, reg, m_j) register relation —
    shared by the batch sketch and the STREAMING register maintainer
    (the registers are the sketch; where they were accumulated is
    irrelevant to the estimate). ``exact`` supplies (group, n_exact)
    for the error report."""
    sums = registers.groupBy(group).agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr(f"CAST(pow(2, {HLL_REST_BITS + 1} - m_j) AS bigint)")
        ).alias("s_present"),
    )
    raw, est = _hll_raw_sql(), _hll_est_sql()
    return sums.join(exact, group).selectExpr(
        group,
        "n_exact",
        f"{HLL_M} - n_present AS hll_zero_registers",
        f"round({raw}, 3) AS hll_raw",
        f"round({est}, 3) AS hll_estimate",
        f"round(({est} - n_exact) / n_exact, 4) AS hll_rel_err",
    )


def sql_hll_distinct(key: str = "user_id", group: str = "event_type") -> str:
    h48 = base_hash48_duck(f"CAST({key} AS VARCHAR)")
    raw, est = _hll_raw_sql(), _hll_est_sql()
    return f"""
        WITH hashed AS (
            SELECT {group}, {key}, {h48} AS h48 FROM events
        ), regs AS (
            SELECT {group}, h48 % {HLL_M} AS reg,
                   MAX({_hll_rho_sql(f'(h48 // {HLL_M})')}) AS m_j
            FROM hashed GROUP BY 1, 2
        ), sums AS (
            SELECT {group}, COUNT(*) AS n_present,
                   SUM(CAST(pow(2, {HLL_REST_BITS + 1} - m_j) AS BIGINT)) AS s_present
            FROM regs GROUP BY 1
        ), exact AS (
            SELECT {group}, COUNT(DISTINCT {key}) AS n_exact
            FROM hashed GROUP BY 1
        )
        SELECT s.{group}, e.n_exact,
               {HLL_M} - s.n_present AS hll_zero_registers,
               ROUND({raw}, 3) AS hll_raw,
               ROUND({est}, 3) AS hll_estimate,
               ROUND(({est} - e.n_exact) / e.n_exact, 4) AS hll_rel_err
        FROM sums s JOIN exact e USING ({group})
    """


# ---- Count-Min --------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 512
CM_MOD = 1_000_000_007
# Same universal family construction as MINHASH_A/B, offset so the
# two sketches never share a permutation.
CM_A = [(2654435761 * (r + 101)) % CM_MOD for r in range(CM_DEPTH)]
CM_B = [(40503 * (r + 101) * (r + 101) + 12345) % CM_MOD for r in range(CM_DEPTH)]


def _cm_col(r: int, h: str) -> str:
    return f"(({CM_A[r]} * {h} + {CM_B[r]}) % {CM_MOD}) % {CM_WIDTH}"


def countmin_freq(ev: DataFrame, key: str = "user_id") -> DataFrame:
    """Count-min sketch frequency estimates vs exact counts per key.

    The sketch is a d x w (4 x 512) grid: row r increments cell
    hash_r(key) % w; the estimate for a key is MIN over its d cells —
    an overestimate by construction (collisions only add), surfaced
    as cm_overcount. All integer arithmetic; exact in both engines.

    Scale: the grid aggregates to <= d*w = 2048 rows regardless of
    input size (sum is algebraic -> map-side combine), then broadcasts
    back onto the probe side. The exact per-key count here is the
    error-report baseline; the production path keeps only the grid."""
    h = "(" + base_hash48_spark(f"CAST({key} AS string)") + f" % {CM_MOD})"
    col_array = (
        "array(" + ", ".join(_cm_col(r, h) for r in range(CM_DEPTH)) + ") AS cols"
    )
    cells = ev.selectExpr(key, col_array)
    grid = (
        cells.select(F.posexplode("cols").alias("r", "col"))
        .groupBy("r", "col")
        .agg(F.count("*").alias("cell_n"))
    )
    probes = (
        cells.groupBy(key)
        .agg(F.count("*").alias("n_exact"))
        .selectExpr(key, "n_exact", col_array)
        .select(key, "n_exact", F.posexplode("cols").alias("r", "col"))
    )
    return (
        probes.join(F.broadcast(grid), ["r", "col"])
        .groupBy(key, "n_exact")
        .agg(F.min("cell_n").alias("cm_estimate"))
        .selectExpr(
            key,
            "n_exact",
            "cm_estimate",
            "cm_estimate - n_exact AS cm_overcount",
        )
    )


def sql_countmin_freq(key: str = "user_id") -> str:
    h = f"({base_hash48_duck(f'CAST({key} AS VARCHAR)')}) % {CM_MOD}"
    cols = ", ".join(
        f"{_cm_col(r, f'({h})')} AS c{r}" for r in range(CM_DEPTH)
    )
    unions_grid = " UNION ALL ".join(
        f"SELECT {r} AS r, c{r} AS col FROM cells" for r in range(CM_DEPTH)
    )
    unions_probe = " UNION ALL ".join(
        f"SELECT {key}, n_exact, {r} AS r, c{r} AS col FROM probes"
        for r in range(CM_DEPTH)
    )
    return f"""
        WITH cells AS (
            SELECT {key}, {cols} FROM events
        ), grid AS (
            SELECT r, col, COUNT(*) AS cell_n
            FROM ({unions_grid}) GROUP BY 1, 2
        ), probes AS (
            SELECT {key}, COUNT(*) AS n_exact, {cols}
            FROM events GROUP BY 1
        ), probe_cells AS ({unions_probe})
        SELECT p.{key}, p.n_exact, MIN(g.cell_n) AS cm_estimate,
               MIN(g.cell_n) - p.n_exact AS cm_overcount
        FROM probe_cells p JOIN grid g USING (r, col)
        GROUP BY 1, 2
    """


# ---- Bloom filter -----------------------------------------------------

# Bits per build key: m = next power of two >= BLOOM_BITS_PER_KEY * n.
# At 16 bits/key and k = 4 hashes the expected FP rate is
# (1 - e^(-k*n/m))^k <= (1 - e^(-1/4))^4 ~ 0.24% at every scale — the
# filter sizes ITSELF from the build cardinality (exact integer
# next-pow2 via bit length, identical in both engines), so the same
# operator holds its FP budget at sf0.001 and at 100 TB.
BLOOM_BITS_PER_KEY = 16
BLOOM_K = 4

# next_pow2(BITS_PER_KEY * n) as engine-shared integer SQL over a
# 1-row aggregate: bin() has no left padding in either engine, so
# bitlength(x) = length(bin(x)) and 1 << bitlength(x - 1) is the
# smallest power of two >= x (exact — no float log2 boundary risk).
_M_SPARK = (
    f"shiftleft(CAST(1 AS BIGINT), "
    f"length(bin({BLOOM_BITS_PER_KEY} * greatest(n_build, 1) - 1)))"
)
_M_DUCK = (
    f"(CAST(1 AS BIGINT) << "
    f"length(bin({BLOOM_BITS_PER_KEY} * greatest(n_build, 1) - 1)))"
)


def _bloom_pos_spark(key_expr: str, i: int) -> str:
    """Position of hash i for a key, mod the m COLUMN (from the 1-row
    sizing relation crossJoined in)."""
    h = base_hash48_spark(
        f"concat('bloom{i}:', CAST({key_expr} AS STRING))"
    )
    return f"CAST({h} % m AS int)"


def _bloom_pos_duck(key_expr: str, i: int) -> str:
    h = base_hash48_duck(f"'bloom{i}:' || ({key_expr})::VARCHAR")
    return f"CAST({h} % m AS INT)"


def bloom_semi_join_report(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
) -> DataFrame:
    """Broadcast-Bloom semi-join: the 100 TB alternative to shuffling
    a fact table for a semi-join against a filtered key set.

    Build side: the filter sizes itself — m = next_pow2(16 * n_build)
    from a 1-row count aggregate (broadcast scalar) — then each key
    sets BLOOM_K bit positions (engine-neutral md5 hashes mod m); the
    filter is the DISTINCT set-bit relation, <= K * n_build rows
    (production form: Spark's runtime bloom-filter pushdown / a
    broadcast bitmap variable; this relational form has the identical
    plan shape and is oracle-replayable).

    Probe side: a key passes iff ALL K of its positions are set — a
    BroadcastHashJoin probe per position, no shuffle of the probe
    relation against the build fact. The report quantifies the trade:
    the chosen m, exact members, bloom passes, false positives, and
    the realized FP rate among true non-members — the number that
    tells you how much post-filter work the bloom saves downstream
    (1 row, expected FP ~ 0.24% at any scale by construction).
    """
    bkeys = build.select(F.col(build_key).alias("k")).distinct()
    msize = bkeys.agg(F.count("*").alias("n_build")).selectExpr(
        "n_build", f"{_M_SPARK} AS m"
    )
    bits = (
        bkeys.crossJoin(F.broadcast(msize))
        .selectExpr(
            f"explode(array({', '.join(_bloom_pos_spark('k', i) for i in range(BLOOM_K))})) AS pos"
        )
        .distinct()
        .withColumn("bit_set", F.lit(1))
    )
    pkeys = probe.select(F.col(probe_key).alias("k")).distinct()
    probe_pos = pkeys.crossJoin(F.broadcast(msize)).selectExpr(
        "k",
        f"explode(array({', '.join(_bloom_pos_spark('k', i) for i in range(BLOOM_K))})) AS pos",
    )
    per_key = (
        probe_pos.join(F.broadcast(bits), "pos", "left")
        .groupBy("k")
        .agg((F.count("bit_set") == BLOOM_K).alias("bloom_pass"))
    )
    flagged = per_key.join(
        bkeys.withColumn("is_member", F.lit(True)), "k", "left"
    ).select(
        "bloom_pass", F.coalesce("is_member", F.lit(False)).alias("is_member")
    )
    return (
        flagged.agg(
            F.count("*").alias("n_probe_keys"),
            F.sum(F.expr("CAST(bloom_pass AS BIGINT)")).alias("n_pass"),
            F.sum(F.expr("CAST(is_member AS BIGINT)")).alias("n_true"),
            F.sum(
                F.expr("CAST(bloom_pass AND NOT is_member AS BIGINT)")
            ).alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(msize))
        .selectExpr(
            "n_build",
            "m",
            "n_probe_keys",
            "n_pass",
            "n_true",
            "n_false_pos",
            "round(n_false_pos / CAST(nullif(n_probe_keys - n_true, 0) AS DOUBLE), 6)"
            " AS fp_rate",
        )
    )


def sql_bloom_semi_join(
    build_table_sql: str, probe_table_sql: str
) -> str:
    """DuckDB twin of :func:`bloom_semi_join_report`; the two args are
    SELECTs yielding one column ``k`` each (build keys / probe keys)."""
    bpos = ", ".join(
        f"{_bloom_pos_duck('k', i)} AS p{i}" for i in range(BLOOM_K)
    )
    bit_union = " UNION ALL ".join(
        f"SELECT p{i} AS pos FROM build_pos" for i in range(BLOOM_K)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT k, p{i} AS pos FROM probe_pos" for i in range(BLOOM_K)
    )
    return f"""
        WITH bkeys AS (SELECT DISTINCT k FROM ({build_table_sql})),
        msize AS (
            SELECT n_build, {_M_DUCK} AS m
            FROM (SELECT COUNT(*) AS n_build FROM bkeys)
        ),
        build_pos AS (SELECT {bpos} FROM bkeys CROSS JOIN msize),
        bits AS (
            SELECT DISTINCT pos FROM ({bit_union})
        ),
        pkeys AS (SELECT DISTINCT k FROM ({probe_table_sql})),
        probe_pos AS (SELECT k, {bpos} FROM pkeys CROSS JOIN msize),
        per_key AS (
            SELECT p.k,
                   COUNT(b.pos) = {BLOOM_K} AS bloom_pass
            FROM ({probe_union}) p
            LEFT JOIN bits b ON b.pos = p.pos
            GROUP BY p.k
        ),
        flagged AS (
            SELECT per_key.bloom_pass,
                   COALESCE(mm.is_member, FALSE) AS is_member
            FROM per_key
            LEFT JOIN (SELECT k, TRUE AS is_member FROM bkeys) mm
              ON mm.k = per_key.k
        )
        SELECT msize.n_build, msize.m,
               COUNT(*) AS n_probe_keys,
               CAST(SUM(CAST(bloom_pass AS BIGINT)) AS BIGINT) AS n_pass,
               CAST(SUM(CAST(is_member AS BIGINT)) AS BIGINT) AS n_true,
               CAST(SUM(CAST(bloom_pass AND NOT is_member AS BIGINT))
                    AS BIGINT) AS n_false_pos,
               ROUND(SUM(CAST(bloom_pass AND NOT is_member AS BIGINT))
                     / CAST(NULLIF(COUNT(*) - SUM(CAST(is_member AS BIGINT)), 0)
                            AS DOUBLE), 6) AS fp_rate
        FROM flagged CROSS JOIN msize
        GROUP BY msize.n_build, msize.m
    """


# ---- HLL merge (union) ------------------------------------------------


def hll_union(
    ev: DataFrame, key: str = "user_id", group: str = "event_type"
) -> DataFrame:
    """The property that makes sketches a 100 TB primitive:
    MERGEABILITY. Per-group HLL registers are unioned with a
    register-wise MAX, and the merged sketch estimates the DISTINCT
    union — no re-scan of the raw data. This is how a sharded /
    per-day / per-source count-distinct rolls up: keep 256 registers
    per shard, merge in O(m), never touch the rows again.

    The report carries the proof obligations: the merged-sketch
    estimate must EQUAL the direct whole-table sketch (register max is
    associative — bit-equal, not approximately), the sum of per-group
    exact counts shows the overlap a naive SUM would double-count, and
    rel_err scores the estimate against the exact union. 1 row."""
    hashed = ev.selectExpr(
        group,
        key,
        f"{base_hash48_spark(f'CAST({key} AS string)')} AS h48",
    ).selectExpr(
        group,
        key,
        f"h48 % {HLL_M} AS reg",
        f"h48 DIV {HLL_M} AS rest",
    )
    # per-group registers (the shard sketches), then the register-wise
    # MAX merge — identical shape to a cross-day/cross-source rollup
    per_group = (
        hashed.selectExpr(group, "reg", f"{_hll_rho_sql('rest')} AS rho")
        .groupBy(group, "reg")
        .agg(F.max("rho").alias("m_j"))
    )
    merged = per_group.groupBy("reg").agg(F.max("m_j").alias("m_j"))
    # direct whole-table sketch (must equal the merge bit-for-bit)
    direct = (
        hashed.selectExpr("reg", f"{_hll_rho_sql('rest')} AS rho")
        .groupBy("reg")
        .agg(F.max("rho").alias("m_j"))
    )
    def estimate(regs: DataFrame, out: str) -> DataFrame:
        sums = regs.agg(
            F.count("*").alias("n_present"),
            F.sum(
                F.expr(f"CAST(pow(2, {HLL_REST_BITS + 1} - m_j) AS bigint)")
            ).alias("s_present"),
        )
        return sums.selectExpr(f"round({_hll_est_sql()}, 3) AS {out}")

    # r14 (guide §2.2, VERDICT r13 item 8): the exact union count and
    # the per-group exact sum BOTH reduce over the distinct
    # (group, key) pairs — sum of per-group distinct counts is just
    # count(key) of the pair relation — so one distinct aggregate
    # feeds both scalars instead of two raw scans each paying its own
    # distinct machinery. Same values by construction (count(key)
    # skips NULL keys exactly like countDistinct does per group).
    pairs_d = ev.select(group, key).distinct()
    exact = pairs_d.agg(
        F.countDistinct(key).alias("n_exact_union"),
        F.count(key).alias("sum_group_exacts"),
    )
    est_m = estimate(merged, "hll_merged_estimate")
    est_d = estimate(direct, "hll_direct_estimate")
    return (
        exact.crossJoin(F.broadcast(est_m))
        .crossJoin(F.broadcast(est_d))
        .selectExpr(
            "n_exact_union",
            "sum_group_exacts",
            "hll_merged_estimate",
            "hll_direct_estimate",
            "hll_merged_estimate = hll_direct_estimate AS merge_equals_direct",
            "round((hll_merged_estimate - n_exact_union) / n_exact_union, 4)"
            " AS rel_err",
        )
    )


def sql_hll_union(key: str = "user_id", group: str = "event_type") -> str:
    h48 = base_hash48_duck(f"CAST({key} AS VARCHAR)")
    est = _hll_est_sql()
    return f"""
        WITH hashed AS (
            SELECT {group}, {key}, {h48} AS h48 FROM events
        ), split AS (
            SELECT {group}, h48 % {HLL_M} AS reg,
                   {_hll_rho_sql(f'(h48 // {HLL_M})')} AS rho
            FROM hashed
        ), per_group AS (
            SELECT {group}, reg, MAX(rho) AS m_j FROM split GROUP BY 1, 2
        ), merged AS (
            SELECT reg, MAX(m_j) AS m_j FROM per_group GROUP BY 1
        ), direct AS (
            SELECT reg, MAX(rho) AS m_j FROM split GROUP BY 1
        ), est_m AS (
            SELECT ROUND({est}, 3) AS hll_merged_estimate FROM (
                SELECT COUNT(*) AS n_present,
                       SUM(CAST(pow(2, {HLL_REST_BITS + 1} - m_j) AS BIGINT))
                           AS s_present
                FROM merged
            )
        ), est_d AS (
            SELECT ROUND({est}, 3) AS hll_direct_estimate FROM (
                SELECT COUNT(*) AS n_present,
                       SUM(CAST(pow(2, {HLL_REST_BITS + 1} - m_j) AS BIGINT))
                           AS s_present
                FROM direct
            )
        ), exact AS (
            SELECT COUNT(DISTINCT {key}) AS n_exact_union FROM events
        ), gsum AS (
            SELECT CAST(SUM(n) AS BIGINT) AS sum_group_exacts FROM (
                SELECT COUNT(DISTINCT {key}) AS n FROM events GROUP BY {group}
            )
        )
        SELECT n_exact_union, sum_group_exacts,
               hll_merged_estimate, hll_direct_estimate,
               hll_merged_estimate = hll_direct_estimate AS merge_equals_direct,
               ROUND((hll_merged_estimate - n_exact_union) / n_exact_union, 4)
                   AS rel_err
        FROM exact, gsum, est_m, est_d
    """


# ---- histogram quantiles ---------------------------------------------

HIST_BINS = 256
HIST_LO = 0.0
HIST_HI = 512_000.0  # orders span ~[1k, 500k]; width = 2000 exactly
HIST_WIDTH = (HIST_HI - HIST_LO) / HIST_BINS
HIST_QS = (0.5, 0.9, 0.99)


def histogram_quantiles(
    orders: DataFrame, col: str = "o_totalprice", group: str = "o_orderstatus"
) -> DataFrame:
    """Quantile estimates from a FIXED-LAYOUT equi-width histogram —
    the mergeable alternative to exact percentiles: per group only
    HIST_BINS integer counts are shuffled/stored (vs exact percentile
    collecting every value per reducer), bins merge by plain addition
    across shards/days (same rollup property as hll_union), and any
    quantile is answered from the merged counts by in-bin linear
    interpolation. The fixed [lo, hi) layout is what makes sketches
    from different partitions addable; out-of-range values clamp to
    the edge bins.

    Report per group: n, est/exact for p50/p90/p99 and the absolute
    error — the accuracy-for-memory trade quantified (error is
    bounded by one bin width). Exact values use the same
    `percentile()` the exact-quantiles query uses."""
    from pyspark.sql import Window

    binned = orders.selectExpr(
        f"{group} AS grp",
        f"CAST(least(greatest(floor(({col} - {HIST_LO}) / {HIST_WIDTH}), 0), "
        f"{HIST_BINS - 1}) AS int) AS bin",
        f"{col} AS v",
    )
    bins = binned.groupBy("grp", "bin").agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("grp")
    cum = bins.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.lit(q) * F.col("n"),
                F.struct("bin", "cum", "cnt"),
            )
        ).alias(f"pick_{int(q * 100)}")
        for q in HIST_QS
    ]
    est_cols = []
    for q in HIST_QS:
        p = f"pick_{int(q * 100)}"
        # CAST the literals: Spark parses `0.5` / `2000.0` as DECIMAL
        # and the whole interpolation would silently go decimal-typed
        est_cols.append(
            f"round(CAST({HIST_LO} AS DOUBLE) + CAST({HIST_WIDTH} AS DOUBLE)"
            f" * ({p}.bin + "
            f"(CAST({q} AS DOUBLE) * n - ({p}.cum - {p}.cnt)) / {p}.cnt), 4) "
            f"AS est_p{int(q * 100)}"
        )
    agg = cum.groupBy("grp").agg(F.max("n").alias("n"), *picks)
    exact = orders.groupBy(F.expr(f"{group} AS grp")).agg(
        *[
            F.round(F.expr(f"percentile({col}, {q})"), 4).alias(
                f"exact_p{int(q * 100)}"
            )
            for q in HIST_QS
        ]
    )
    return (
        agg.join(exact, "grp")
        .selectExpr(
            "grp AS order_status",
            "n",
            *est_cols,
            *[f"exact_p{int(q * 100)}" for q in HIST_QS],
            *[
                f"round(abs(round(CAST({HIST_LO} AS DOUBLE) + "
                f"CAST({HIST_WIDTH} AS DOUBLE) * (pick_{int(q*100)}.bin + "
                f"(CAST({q} AS DOUBLE) * n - (pick_{int(q*100)}.cum - pick_{int(q*100)}.cnt)) / pick_{int(q*100)}.cnt), 4)"
                f" - exact_p{int(q * 100)}), 4) AS err_p{int(q * 100)}"
                for q in HIST_QS
            ],
        )
    )


def sql_histogram_quantiles(
    table: str = "orders",
    col: str = "o_totalprice",
    group: str = "o_orderstatus",
) -> str:
    qexprs = []
    for q in HIST_QS:
        p = f"p{int(q * 100)}"
        qexprs.append(
            f"""arg_min(struct_pack(bin := bin, cum := cum, cnt := cnt), bin)
                FILTER (WHERE cum >= {q} * n) AS pick_{p}"""
        )
    est = {
        q: (
            f"ROUND(CAST({HIST_LO} AS DOUBLE) + CAST({HIST_WIDTH} AS DOUBLE)"
            f" * (pick_p{int(q*100)}.bin + "
            f"(CAST({q} AS DOUBLE) * n - (pick_p{int(q*100)}.cum - pick_p{int(q*100)}.cnt))"
            f" / pick_p{int(q*100)}.cnt), 4)"
        )
        for q in HIST_QS
    }
    return f"""
        WITH binned AS (
            SELECT {group} AS grp,
                   CAST(least(greatest(floor(({col} - {HIST_LO}) / {HIST_WIDTH}),
                        0), {HIST_BINS - 1}) AS INT) AS bin
            FROM {table}
        ), bins AS (
            SELECT grp, bin, COUNT(*) AS cnt FROM binned GROUP BY 1, 2
        ), cumbins AS (
            SELECT grp, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY grp ORDER BY bin
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cnt) OVER (PARTITION BY grp) AS n
            FROM bins
        ), agg AS (
            SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
                   {', '.join(qexprs)}
            FROM cumbins GROUP BY grp
        ), exact AS (
            SELECT {group} AS grp,
                   {', '.join(
                       f'ROUND(quantile_cont({col}, {q}), 4) AS exact_p{int(q * 100)}'
                       for q in HIST_QS)}
            FROM {table} GROUP BY 1
        )
        SELECT agg.grp AS order_status, agg.n,
               {', '.join(f'{est[q]} AS est_p{int(q * 100)}' for q in HIST_QS)},
               {', '.join(f'exact_p{int(q * 100)}' for q in HIST_QS)},
               {', '.join(
                   f'ROUND(ABS({est[q]} - exact_p{int(q * 100)}), 4) AS err_p{int(q * 100)}'
                   for q in HIST_QS)}
        FROM agg JOIN exact USING (grp)
    """


# ---- KMV (k minimum values) -------------------------------------------

KMV_K = 64
_KMV_DOMAIN = 1 << 48  # base_hash48 range


def kmv_intersection(
    ev: DataFrame,
    type_a: str = "view",
    type_b: str = "purchase",
    k: int = KMV_K,
    key: str = "user_id",
) -> DataFrame:
    """KMV (k-minimum-values) sketch intersection: estimate the
    distinct-key overlap between two event types from two k-value
    sketches — the mergeable-set-sketch complement to HLL (HLL unions
    cheaply but cannot intersect; KMV supports BOTH via the union
    sketch + inclusion rule: J = |S_k(A u B) n S_k(A) n S_k(B)| / k,
    |A n B| = J * |A u B|).

    Mergeable build, the property that matters at 100 TB: level 1
    computes PARTIAL k-minima per (type, salt) group — an aggregate
    with map-side combine, never a global sort — and level 2 merges
    the P*k-value partials with a window over O(P*k) rows. Estimates
    are all-integer: est = (k-1) * 2^48 DIV h_k ((k-1)*2^48 < 2^54,
    no overflow), so the oracle hash is exact. Exact counts ride
    along for the audit columns.

    One row: k, est_a/b/union/intersection, exact_a/b/union/
    intersection.
    """
    h_expr = base_hash48_spark(f"CAST({key} AS STRING)")
    pairs = (
        ev.filter(F.col("event_type").isin([type_a, type_b]))
        .select("event_type", key)
        .distinct()
        .selectExpr("event_type", key, f"{h_expr} AS h")
        .cache()
    )
    # level 1: partial k-minima per salt bucket (mergeable partials)
    partial = (
        pairs.withColumn("salt", (F.col(key) % 8).cast("int"))
        .groupBy("event_type", "salt")
        .agg(F.expr(f"slice(array_sort(collect_list(h)), 1, {k}) AS hs"))
    )
    # level 2: merge partials -> final per-type sketch (O(P*k) rows)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("h")
    sketch = (
        partial.select("event_type", F.explode("hs").alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "h")
        .cache()
    )
    wu = Window.partitionBy(F.lit(1)).orderBy("h")
    union_k = (
        sketch.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= k)
        .select("h")
    )
    # UNDER-FULL RULE: a sketch holding fewer than k values has seen
    # its whole set — the estimate is the exact count, not the
    # kth-minimum extrapolation (which wildly overshoots small sets)
    est = (
        f"CASE WHEN COUNT(*) < {k} THEN COUNT(*) "
        f"ELSE CAST(({k} - 1) * {_KMV_DOMAIN} AS BIGINT) DIV MAX(h) END"
    )
    # ONE conditional aggregate over the (<= 2k)-row sketch for both
    # per-type estimates (r13): COUNT/MAX restricted by CASE are
    # value-identical to the former two filtered aggregates (empty
    # type -> count 0 -> est 0 either way), at half the scalar
    # branches / exchanges in the final cross-join fan-in
    def _est_typed(t: str, alias: str) -> str:
        cnt = f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END)"
        mx = f"MAX(CASE WHEN event_type = '{t}' THEN h END)"
        return (
            f"CASE WHEN {cnt} < {k} THEN {cnt} "
            f"ELSE CAST(({k} - 1) * {_KMV_DOMAIN} AS BIGINT) DIV {mx} END"
            f" AS {alias}"
        )

    est_ab = sketch.agg(
        F.expr(_est_typed(type_a, "est_a")),
        F.expr(_est_typed(type_b, "est_b")),
    )
    est_u = union_k.agg(
        F.expr(f"{est} AS est_union"),
        F.expr(f"LEAST(COUNT(*), {k}) AS n_union_sketch"),
    )
    in_both = (
        union_k.join(
            sketch.filter(F.col("event_type") == type_a).select("h"), "h"
        )
        .join(sketch.filter(F.col("event_type") == type_b).select("h"), "h")
        .agg(F.count("*").cast("long").alias("n_in_both"))
    )
    # exact_a / exact_b fused into the per-user pass (r13): pairs is
    # already (event_type, key)-distinct, so "distinct keys with type
    # t" == "per-key max(type = t) summed" — the two extra flags ride
    # the SAME groupBy(key) aggregate as the union/intersection
    # counts, replacing two more corpus-cache scans + scalar branches
    per_user = pairs.groupBy(key).agg(
        F.countDistinct("event_type").alias("nt"),
        F.max((F.col("event_type") == type_a).cast("int")).alias("ha"),
        F.max((F.col("event_type") == type_b).cast("int")).alias("hb"),
    )
    exact = per_user.agg(
        F.count("*").cast("long").alias("exact_union"),
        F.count(F.when(F.col("nt") == 2, 1)).cast("long").alias(
            "exact_intersection"
        ),
        # coalesce(.., 0): SUM over zero rows is NULL where the former
        # countDistinct returned 0 — only reachable on a fully-empty
        # input, pinned anyway (ADVICE r13)
        F.coalesce(F.sum("ha"), F.lit(0)).cast("long").alias("exact_a"),
        F.coalesce(F.sum("hb"), F.lit(0)).cast("long").alias("exact_b"),
    )
    return (
        est_ab.crossJoin(F.broadcast(est_u))
        .crossJoin(F.broadcast(in_both))
        .crossJoin(F.broadcast(exact))
        .selectExpr(
            f"CAST({k} AS INT) AS k",
            "est_a",
            "est_b",
            "est_union",
            # inclusion rule J = n_in_both / |union sketch|; with an
            # under-full union sketch this reduces to the EXACT
            # intersection count (est_union == n_union_sketch)
            "CASE WHEN n_union_sketch = 0 THEN CAST(0 AS BIGINT) "
            "ELSE n_in_both * est_union DIV n_union_sketch END "
            "AS est_intersection",
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_intersection",
        )
    )


def sql_kmv_intersection(
    type_a: str = "view",
    type_b: str = "purchase",
    k: int = KMV_K,
    key: str = "user_id",
) -> str:
    """DuckDB twin of :func:`kmv_intersection` (flat per-type k-minima
    — the salt levels are a Spark plan shape, not a semantic: the
    k smallest of the union of partial k-minima ARE the k smallest)."""
    h = base_hash48_duck(f"CAST({key} AS VARCHAR)")
    return f"""
        WITH pairs AS (
            SELECT DISTINCT event_type, {key} FROM events
            WHERE event_type IN ('{type_a}', '{type_b}')
        ), hs AS (
            SELECT event_type, {key}, {h} AS h FROM pairs
        ), sketch AS (
            SELECT event_type, h FROM (
                SELECT event_type, h,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY h) AS rn
                FROM hs
            ) WHERE rn <= {k}
        ), union_k AS (
            SELECT h FROM (
                SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                FROM (SELECT DISTINCT h FROM sketch)
            ) WHERE rn <= {k}
        ), est_a AS (
            SELECT CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                   ELSE ({k} - 1) * {_KMV_DOMAIN} // MAX(h) END AS est_a
            FROM sketch WHERE event_type = '{type_a}'
        ), est_b AS (
            SELECT CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                   ELSE ({k} - 1) * {_KMV_DOMAIN} // MAX(h) END AS est_b
            FROM sketch WHERE event_type = '{type_b}'
        ), est_u AS (
            SELECT CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                   ELSE ({k} - 1) * {_KMV_DOMAIN} // MAX(h) END AS est_union,
                   LEAST(COUNT(*), {k}) AS n_union_sketch
            FROM union_k
        ), nb AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_in_both
            FROM union_k u
            JOIN (SELECT h FROM sketch WHERE event_type = '{type_a}') a
              USING (h)
            JOIN (SELECT h FROM sketch WHERE event_type = '{type_b}') b
              USING (h)
        ), per_user AS (
            SELECT {key}, COUNT(DISTINCT event_type) AS nt
            FROM pairs GROUP BY 1
        ), ex AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
                   CAST(COUNT(CASE WHEN nt = 2 THEN 1 END) AS BIGINT)
                       AS exact_intersection
            FROM per_user
        ), ea AS (
            SELECT CAST(COUNT(DISTINCT {key}) AS BIGINT) AS exact_a
            FROM pairs WHERE event_type = '{type_a}'
        ), eb AS (
            SELECT CAST(COUNT(DISTINCT {key}) AS BIGINT) AS exact_b
            FROM pairs WHERE event_type = '{type_b}'
        )
        SELECT CAST({k} AS INT) AS k, est_a, est_b, est_union,
               CASE WHEN n_union_sketch = 0 THEN 0
                    ELSE n_in_both * est_union // n_union_sketch END
                   AS est_intersection,
               exact_a, exact_b, exact_union, exact_intersection
        FROM est_a, est_b, est_u, nb, ex, ea, eb
    """
