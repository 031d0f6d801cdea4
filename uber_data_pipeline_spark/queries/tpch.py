"""OLAP-classic queries (TPC-H shapes adapted to the synthetic SF
tables). These prove the relational core beyond the reference's 6
models: wide aggregation, join-heavy plans with broadcast dims,
pure pushdown scans, rollup, and running windows.

Date constants are shifted to the synthetic data's 1995-2001 range.
All double aggregates go through functions.numeric (exact decimal
sums) so results are order-independent and match the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uber_data_pipeline_spark.catalog import load_table
from uber_data_pipeline_spark.operators import sketches
from uber_data_pipeline_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from uber_data_pipeline_spark.operators.joins import salted_join

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report. Single scan, 8 aggregates,
    filter pushed to parquet; partial (map-side) aggregation reduces
    to |returnflag x linestatus| groups before the shuffle. r12: the
    8-aggregate decimal map is compute-dense, so the under-split
    local scan is spread (operators/spread.py; filter still pushes
    through to the scan) — measured 1.9 -> 1.3 s at sf0.1."""
    from uber_data_pipeline_spark.operators.spread import spread_rowlocal

    li = spread_rowlocal(load_table(spark, sf_dir, "lineitem"))
    charge = _revenue() * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-08-06"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(_revenue()).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top 10 unshipped orders by revenue for one market
    segment. Dim filter reduces customer before the fact join; top-k
    is TakeOrderedAndProject (no global sort)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10)
    )


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue per nation where customer and supplier share
    the nation, one region, one year. Six-way join; nation/region
    broadcast, fact joins shuffle on keys with AQE skew handling."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation_name"))
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + single aggregate — the pushdown
    showcase (all predicates land in the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregate: ROLLUP(status, priority) — count and
    total price at every level plus grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_orderpriority").alias("order_priority"),
            "n_orders",
            "total_price",
        )
    )


def customer_ltv_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running lifetime value per customer: cumulative sum of order
    totals ordered by (date, key) — deterministic total order, window
    partitioned by the high-cardinality customer key. Decimal sum so
    the oracle's segment-tree summation can't diverge."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").alias("order_date"),
        # round in decimal, THEN cast: round(double) is engine-divergent
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w), 2
        ).cast("double").alias("ltv_to_date"),
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders with at least one
    returned lineitem, counted by priority. left_semi keeps the probe
    side unduplicated and shuffles only the join keys of the build
    side."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count("*").alias("order_count"))
        .orderBy("order_priority")
    )


def _cust_with_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer plus one planted ORDERLESS row (c_custkey -1 — order
    keys are non-negative, so no order can ever reference it): the
    organic fixtures have no customer without orders at sf>=0.01, so
    the anti-join entries' driver rows compared empty-vs-empty (the
    r6-verdict evidential weakness class). The oracle twin is
    ``_CUSTX_CTE``; both engines append the identical row."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    sentinel = spark.createDataFrame(
        [(-1, "sentinel-idle", 0, 999999.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    return cust.unionByName(sentinel)


_CUSTX_CTE = """custx AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer
        UNION ALL
        SELECT CAST(-1 AS BIGINT), 'sentinel-idle', 0, 999999.0, 'BUILDING'
    )"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS anti-join: customers that never placed an order,
    per nation. left_anti + broadcast nation dim. Input includes the
    planted orderless sentinel (:func:`_cust_with_sentinel`) so the
    result is non-empty — discriminating — at every SF."""
    cust = _cust_with_sentinel(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("n_idle_customers"))
        .orderBy(F.desc("n_idle_customers"), F.asc("nation_name"))
    )


def salted_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-x-large join (lineitem x orders on orderkey) through the
    explicit salting operator (operators/joins.py): lineitem salted
    by its line number, orders replicated across the salt space —
    the plan-level skew breaker for known-hot keys. Result identical
    to the plain join (the oracle runs unsalted)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(
        li, orders, on=["l_orderkey"], salt_expr=F.col("l_linenumber"), salt_mod=8
    )
    return (
        joined.groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(dsum(_revenue()).alias("revenue"), F.count("*").alias("n_lines"))
        .orderBy("order_priority")
    )


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, including
    zero-order customers — LEFT OUTER join then a two-level
    aggregate (per-customer count, then histogram)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total lineitem quantity exceeds a
    threshold (HAVING over a fact aggregate), joined back to customer
    and orders for the detail — aggregate-then-join keeps the heavy
    HAVING filter before any wide row is built."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 120)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("o_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            "total_qty",
        )
        .orderBy(F.desc("total_price"), F.asc("order_key"))
        .limit(100)
    )


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returned items per customer, one
    quarter — 4-way join (broadcast nation), aggregate on the
    high-cardinality customer key, top 20 by revenue."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("cust_key"))
        .limit(20)
    )


def orders_recency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth on the fact table: per customer, the
    gap to the previous order (lag), the first order date (running
    min), spend quartile within the customer (ntile), and percent
    rank by price — all over ONE per-customer window partition, so a
    single shuffle serves four window functions."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("cust_key"),
        F.col("o_orderkey").alias("order_key"),
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
        F.min("o_orderdate").over(w).alias("first_order_date"),
        F.ntile(4).over(wp).alias("spend_quartile"),
        F.round(F.percent_rank().over(wp), 6).alias("price_pct_rank"),
    )


RFM_QS = (0.2, 0.4, 0.6, 0.8)


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic CRM scoring every
    warehouse eventually runs: per customer, Recency (days since last
    order, against the corpus max date), Frequency (order count), and
    Monetary (decimal-exact revenue sum), each scored 1-5 against
    corpus quintile cutoffs, with a rule-based segment label.

    Determinism: metrics are exact (integer day diff, integer count,
    decimal sum cast to double); cutoffs are the established
    percentile == quantile_cont parity (orders_price_quantiles)
    rounded at 6; scores are integer comparison counts against those
    cutoffs, so every boundary is identical cross-engine.

    Scale shape: one map-side-combined per-customer aggregate reduces
    the fact table; the corpus max date and the 12 quintile cutoffs
    are 1-row broadcasts onto the REDUCED customer relation (exact
    percentile collects per reducer — at 100 TB swap in
    approx_percentile, same call shape). Customers with no orders are
    out of scope (no RFM without a purchase; customers_without_orders
    is the census for them).

    Output: c_custkey, recency_days, frequency, monetary, r_score,
    f_score, m_score, segment."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_dt"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("monetary"),
    )
    maxd = orders.agg(F.max("o_orderdate").alias("max_dt"))
    base = per_cust.join(F.broadcast(maxd)).selectExpr(
        "c_custkey",
        "datediff(CAST(max_dt AS DATE), CAST(last_dt AS DATE))"
        " AS recency_days",
        "frequency",
        "monetary",
    )
    cut_aggs = []
    for col in ("recency_days", "frequency", "monetary"):
        for q in RFM_QS:
            cut_aggs.append(
                F.round(F.expr(f"percentile({col}, {q})"), 6).alias(
                    f"{col[0]}c{int(q * 10)}"
                )
            )
    cuts = base.agg(*cut_aggs)

    def _ups(col: str, p: str) -> str:
        return " + ".join(
            f"CAST({col} > {p}c{int(q * 10)} AS INT)" for q in RFM_QS
        )

    return base.join(F.broadcast(cuts)).selectExpr(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        # recency inverts: fewer days since last order = better
        f"5 - ({_ups('recency_days', 'r')}) AS r_score",
        f"1 + ({_ups('frequency', 'f')}) AS f_score",
        f"1 + ({_ups('monetary', 'm')}) AS m_score",
    ).selectExpr(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        "CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4"
        " THEN 'champion'"
        " WHEN f_score >= 4 THEN 'loyal'"
        " WHEN m_score >= 4 THEN 'big_spender'"
        " WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'"
        " WHEN r_score <= 2 THEN 'hibernating'"
        " ELSE 'regular' END AS segment",
    )


SQL_RFM = """
    WITH per_cust AS (
        SELECT o_custkey AS c_custkey,
               MAX(o_orderdate) AS last_dt,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY 1
    ), maxd AS (
        SELECT MAX(o_orderdate) AS max_dt FROM orders
    ), base AS (
        SELECT c_custkey,
               date_diff('day', CAST(last_dt AS DATE),
                         CAST(max_dt AS DATE)) AS recency_days,
               frequency, monetary
        FROM per_cust, maxd
    ), cuts AS (
        SELECT {cut_cols} FROM base
    ), scored AS (
        SELECT c_custkey, recency_days, frequency, monetary,
               5 - ({r_ups}) AS r_score,
               1 + ({f_ups}) AS f_score,
               1 + ({m_ups}) AS m_score
        FROM base, cuts
    )
    SELECT c_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                THEN 'champion'
                WHEN f_score >= 4 THEN 'loyal'
                WHEN m_score >= 4 THEN 'big_spender'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
"""


def _sql_rfm() -> str:
    cut_cols = ", ".join(
        f"ROUND(quantile_cont({col}, {q}), 6) AS {col[0]}c{int(q * 10)}"
        for col in ("recency_days", "frequency", "monetary")
        for q in RFM_QS
    )

    def ups(col: str, p: str) -> str:
        return " + ".join(
            f"CAST({col} > {p}c{int(q * 10)} AS INT)" for q in RFM_QS
        )

    return SQL_RFM.format(
        cut_cols=cut_cols,
        r_ups=ups("recency_days", "r"),
        f_ups=ups("frequency", "f"),
        m_ups=ups("monetary", "m"),
    )


def orders_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles of order value per status —
    median-class stats the BI layer asks of any fact table. EXACT
    percentile needs the group's values collected per reducer; at
    100 TB swap in approx_percentile (t-digest: mergeable fixed-size
    sketch, one pass) — same call shape, bounded memory."""
    orders = load_table(spark, sf_dir, "orders")
    qs = [0.25, 0.5, 0.75, 0.95]
    return (
        orders.groupBy(F.col("o_orderstatus").alias("order_status"))
        .agg(
            *[
                F.round(
                    F.expr(f"percentile(o_totalprice, {q})"), 4
                ).alias(f"p{int(q * 100)}")
                for q in qs
            ],
            F.count("*").alias("n_orders"),
        )
        .orderBy("order_status")
    )


QUERIES = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q5_local_supplier_volume": tpch_q5_local_supplier_volume,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "orders_rollup": orders_rollup,
    "customer_ltv_window": customer_ltv_window,
    "customer_rfm_segments": customer_rfm_segments,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "customers_without_orders": customers_without_orders,
    "salted_revenue_by_priority": salted_revenue_by_priority,
    "tpch_q13_customer_distribution": tpch_q13_customer_distribution,
    "tpch_q18_large_volume_customers": tpch_q18_large_volume_customers,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "orders_recency_stats": orders_recency_stats,
    "orders_price_quantiles": orders_price_quantiles,
    # mergeable fixed-layout histogram sketch vs those exact values
    "orders_histogram_quantiles": lambda spark, sf: sketches.histogram_quantiles(
        load_table(spark, sf, "orders")
    ),
}

# Entries whose plans legitimately contain a BroadcastNestedLoopJoin:
# every broadcast side is a fixed-cardinality aggregate (usually one
# scalar row), so the nested loop is O(n * constant), not a pair
# blow-up.  tests/test_plans.py::test_no_cartesian_products asserts
# the union of the modules' SCALAR_BROADCAST sets matches the plan
# scan EXACTLY — a new scalar-broadcast entry must tag itself here
# (next to its QUERIES line), and a stale tag fails the suite.
SCALAR_BROADCAST = {
    # 1-row max-orderdate anchor + 1-row quintile-cutoff row, both
    # broadcast onto the per-customer RFM aggregate
    "customer_rfm_segments",
}

ORACLES = {
    "tpch_q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum("l_quantity")} AS sum_qty,
               {sql_dsum("l_extendedprice")} AS sum_base_price,
               {sql_dsum(_REVENUE)} AS sum_disc_price,
               {sql_dsum(_REVENUE + " * (1 + l_tax)")} AS sum_charge,
               {sql_davg("l_quantity")} AS avg_qty,
               {sql_davg("l_extendedprice")} AS avg_price,
               {sql_davg("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "tpch_q3_shipping_priority": f"""
        SELECT l.l_orderkey AS order_key,
               o.o_orderdate AS order_date,
               o.o_orderpriority AS order_priority,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, order_key ASC
        LIMIT 10
    """,
    "tpch_q5_local_supplier_volume": f"""
        SELECT n.n_name AS nation_name,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1
        ORDER BY revenue DESC, nation_name ASC
    """,
    "tpch_q6_forecast_revenue": f"""
        SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "orders_rollup": f"""
        SELECT o_orderstatus AS order_status,
               o_orderpriority AS order_priority,
               COUNT(*) AS n_orders,
               {sql_dsum("o_totalprice")} AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "customer_rfm_segments": _sql_rfm(),
    "customer_ltv_window": """
        SELECT o_custkey AS cust_key,
               o_orderkey AS order_key,
               o_orderdate AS order_date,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS DOUBLE) AS ltv_to_date
        FROM orders
    """,
    "tpch_q4_order_priority": """
        SELECT o_orderpriority AS order_priority,
               COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
          )
        GROUP BY 1
        ORDER BY 1
    """,
    "customers_without_orders": f"""
        WITH {_CUSTX_CTE}
        SELECT n.n_name AS nation_name,
               COUNT(*) AS n_idle_customers
        FROM custx c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
        GROUP BY 1
        ORDER BY n_idle_customers DESC, nation_name ASC
    """,
    "salted_revenue_by_priority": f"""
        SELECT o.o_orderpriority AS order_priority,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        ORDER BY 1
    """,
    "tpch_q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority != '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q18_large_volume_customers": f"""
        WITH big AS (
            SELECT l_orderkey, {sql_dsum("l_quantity")} AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING total_qty > 120
        )
        SELECT c.c_name AS customer_name,
               o.o_custkey AS cust_key,
               o.o_orderkey AS order_key,
               o.o_orderdate AS order_date,
               o.o_totalprice AS total_price,
               b.total_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY total_price DESC, order_key ASC
        LIMIT 100
    """,
    "tpch_q10_returned_items": f"""
        SELECT c.c_custkey AS cust_key,
               c.c_name AS customer_name,
               n.n_name AS nation_name,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, cust_key ASC
        LIMIT 20
    """,
    "orders_recency_stats": """
        SELECT o_custkey AS cust_key,
               o_orderkey AS order_key,
               datediff('day',
                   LAG(o_orderdate) OVER w, o_orderdate)::INT AS days_since_prev,
               MIN(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order_date,
               NTILE(4) OVER wp AS spend_quartile,
               ROUND(PERCENT_RANK() OVER wp, 6) AS price_pct_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wp AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    "orders_histogram_quantiles": sketches.sql_histogram_quantiles(),
    "orders_price_quantiles": """
        SELECT o_orderstatus AS order_status,
               ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
               ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
               ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY 1
        ORDER BY 1
    """,
}
