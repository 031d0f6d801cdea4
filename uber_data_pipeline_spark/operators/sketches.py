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
    sums = registers.groupBy(group).agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr(f"CAST(pow(2, {HLL_REST_BITS + 1} - m_j) AS bigint)")
        ).alias("s_present"),
    )
    exact = hashed.groupBy(group).agg(F.countDistinct(key).alias("n_exact"))
    two41 = 1 << (HLL_REST_BITS + 1)
    raw = (
        f"(CAST({HLL_ALPHA!r} AS double) * {HLL_M} * {HLL_M} * {two41} "
        f"/ (s_present + ({HLL_M} - n_present) * CAST({two41} AS bigint)))"
    )
    est = (
        f"(CASE WHEN {raw} <= 2.5 * {HLL_M} AND n_present < {HLL_M} "
        f"THEN {HLL_M} * ln(CAST({HLL_M} AS double) / ({HLL_M} - n_present)) "
        f"ELSE {raw} END)"
    )
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
    two41 = 1 << (HLL_REST_BITS + 1)
    raw = (
        f"(CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M} * {two41} "
        f"/ (s_present + ({HLL_M} - n_present) * {two41}))"
    )
    est = (
        f"(CASE WHEN {raw} <= 2.5 * {HLL_M} AND n_present < {HLL_M} "
        f"THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - n_present)) "
        f"ELSE {raw} END)"
    )
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
