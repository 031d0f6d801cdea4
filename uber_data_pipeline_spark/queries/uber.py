"""Reference-parity queries: the 6 dbt models of
kimiko-dev/Uber-Data-Pipeline re-based onto the orders x customer x
nation x region star schema (pickup fact = orders, base dim = nation,
borough dim = region).

Each query cites its reference model and keeps its exact relational
shape (joins, grouping, window, filter, top-k semantics), expressed
with the DataFrame API so Catalyst plans it (broadcast dims, partial
aggregation, pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uber_data_pipeline_spark.catalog import load_table
from uber_data_pipeline_spark.functions.datetime import MONTH_NAME_CASE_SQL, month_name
from uber_data_pipeline_spark.operators.shares import (
    with_partition_avg,
    with_share_of_total,
)
from uber_data_pipeline_spark.operators.topk import top_k, top_k_per_group

# "Unter"/"Grun" analog: two nations in the AMERICA region ("Bronx" analog)
_FILTER_NATIONS = ("NATION_1", "NATION_6")
_FILTER_REGION = "AMERICA"


def _orders_with_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact JOIN base-dim, the common prefix of every reference model
    (raw_data_janjune_15 JOIN base_num_and_name)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)


def top3_bases_by_pickups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3 'bases' (nations) by total 'pickups' (orders).

    Reference: models/udp_trans/top_3_base_names_by_total_pickups.sql
    (join + GROUP BY + ORDER BY COUNT DESC LIMIT 3). Tie-broken by
    nation_key so the limit-3 set is deterministic.
    """
    agg = (
        _orders_with_nation(spark, sf_dir)
        .groupBy(F.col("n_nationkey").alias("nation_key"), F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("total_pickups"))
    )
    return top_k(agg, [F.desc("total_pickups"), F.asc("nation_key")], 3)


def pickup_percentile_by_base_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share (%) of each month's orders contributed by each nation.

    Reference: models/udp_trans/pickup_percentile_by_base_per_month.sql.
    The reference computes the per-month denominator with a correlated
    subquery re-scanning the CTE; here it is a window SUM over the
    aggregated rows — one scan of the fact table total.
    """
    counts = (
        _orders_with_nation(spark, sf_dir)
        .withColumn("month_num", F.month("o_orderdate"))
        .groupBy("month_num", F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("pickups"))
    )
    return with_share_of_total(
        counts, ["month_num"], "pickups", "pct_of_month", as_percent=True, round_to=6
    ).select(
        "nation_name",
        "month_num",
        month_name("month_num").alias("month_name"),
        "pickups",
        "pct_of_month",
    )


def top3_pickup_dates_per_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3 most common order dates per nation, RANK ties kept.

    Reference: models/udp_trans/top_3_pickup_dates_per_base.sql
    (RANK() OVER (PARTITION BY base ORDER BY COUNT(*) DESC), rank<=3).
    Rank runs over pre-aggregated (nation, date) rows only.
    """
    counts = (
        _orders_with_nation(spark, sf_dir)
        .withColumn("pickup_date", F.to_date("o_orderdate"))
        .groupBy(
            F.col("n_nationkey").alias("nation_key"),
            F.col("n_name").alias("nation_name"),
            "pickup_date",
        )
        .agg(F.count("*").alias("cnt"))
    )
    ranked = top_k_per_group(
        counts, ["nation_key"], [F.desc("cnt")], 3, method="rank", rank_col="rnk"
    )
    return ranked.select("nation_name", "nation_key", "rnk", "cnt", "pickup_date")


def pickup_count_vs_average_per_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order count per nation vs the average across nations
    for that month, with percentage difference.

    Reference: models/udp_trans/pickup_count_vs_average_per_base.sql
    (GROUP BY + AVG(COUNT(*)) OVER (PARTITION BY month)).
    """
    counts = (
        _orders_with_nation(spark, sf_dir)
        .withColumn("month_num", F.month("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation_name"), "month_num")
        .agg(F.count("*").alias("monthly_count"))
    )
    avg = with_partition_avg(counts, ["month_num"], "monthly_count", "avg_for_month")
    return avg.select(
        "nation_name",
        "month_num",
        month_name("month_num").alias("month_name"),
        "monthly_count",
        "avg_for_month",
        F.round(
            (F.col("monthly_count") / F.col("avg_for_month") - 1) * 100, 6
        ).alias("pct_difference"),
    )


def unter_grun_pickups_in_bronx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level detail: orders whose customer is in nation
    {NATION_1, NATION_6} AND region AMERICA — the reference's
    two-dim filtered detail scan (base_name IN ('Unter','Grun') AND
    borough = 'Bronx').

    Reference: models/udp_trans/unter_grun_pickups_in_bronx.sql
    (3-way join + IN-list + equality filter).
    """
    region = load_table(spark, sf_dir, "region")
    detail = (
        _orders_with_nation(spark, sf_dir)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .filter(
            F.col("n_name").isin(*_FILTER_NATIONS) & (F.col("r_name") == _FILTER_REGION)
        )
    )
    return detail.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").alias("pickup_ts"),
        F.col("n_name").alias("base_name"),
        F.col("r_name").alias("borough"),
        F.col("c_mktsegment").alias("zone"),
    )


def total_pickups_in_may_by_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total orders per nation for calendar month May.

    Reference: models/udp_trans/total_pickups_in_may_by_base.sql
    (EXTRACT(MONTH)=5 filter + join + GROUP BY count).
    """
    return (
        _orders_with_nation(spark, sf_dir)
        .filter(F.month("o_orderdate") == 5)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("pickups_in_may"))
        .orderBy(F.desc("pickups_in_may"), F.asc("nation_name"))
    )


QUERIES = {
    "top3_bases_by_pickups": top3_bases_by_pickups,
    "pickup_percentile_by_base_per_month": pickup_percentile_by_base_per_month,
    "top3_pickup_dates_per_base": top3_pickup_dates_per_base,
    "pickup_count_vs_average_per_base": pickup_count_vs_average_per_base,
    "unter_grun_pickups_in_bronx": unter_grun_pickups_in_bronx,
    "total_pickups_in_may_by_base": total_pickups_in_may_by_base,
}

_MONTH_CASE = MONTH_NAME_CASE_SQL.format(col="month_num")

ORACLES = {
    "top3_bases_by_pickups": """
        SELECT n.n_nationkey AS nation_key,
               n.n_name AS nation_name,
               COUNT(*) AS total_pickups
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
        ORDER BY total_pickups DESC, nation_key ASC
        LIMIT 3
    """,
    "pickup_percentile_by_base_per_month": f"""
        WITH counts AS (
            SELECT EXTRACT(MONTH FROM o.o_orderdate)::INT AS month_num,
                   n.n_name AS nation_name,
                   COUNT(*) AS pickups
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2
        )
        SELECT nation_name,
               month_num,
               {_MONTH_CASE} AS month_name,
               pickups,
               ROUND((pickups / SUM(pickups) OVER (PARTITION BY month_num)) * 100.0, 6)
                   AS pct_of_month
        FROM counts
    """,
    "top3_pickup_dates_per_base": """
        WITH counts AS (
            SELECT n.n_nationkey AS nation_key,
                   n.n_name AS nation_name,
                   CAST(o.o_orderdate AS DATE) AS pickup_date,
                   COUNT(*) AS cnt
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2, 3
        ), ranked AS (
            SELECT nation_name, nation_key,
                   RANK() OVER (PARTITION BY nation_key ORDER BY cnt DESC) AS rnk,
                   cnt, pickup_date
            FROM counts
        )
        SELECT nation_name, nation_key, rnk, cnt, pickup_date
        FROM ranked WHERE rnk <= 3
    """,
    "pickup_count_vs_average_per_base": f"""
        WITH counts AS (
            SELECT n.n_name AS nation_name,
                   EXTRACT(MONTH FROM o.o_orderdate)::INT AS month_num,
                   COUNT(*) AS monthly_count
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2
        )
        SELECT nation_name,
               month_num,
               {_MONTH_CASE} AS month_name,
               monthly_count,
               AVG(monthly_count) OVER (PARTITION BY month_num) AS avg_for_month,
               ROUND((monthly_count / AVG(monthly_count) OVER (PARTITION BY month_num) - 1) * 100, 6)
                   AS pct_difference
        FROM counts
    """,
    "unter_grun_pickups_in_bronx": f"""
        SELECT o.o_orderkey AS order_key,
               o.o_orderdate AS pickup_ts,
               n.n_name AS base_name,
               r.r_name AS borough,
               c.c_mktsegment AS zone
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE n.n_name IN {_FILTER_NATIONS!r} AND r.r_name = '{_FILTER_REGION}'
    """,
    "total_pickups_in_may_by_base": """
        SELECT n.n_name AS nation_name,
               COUNT(*) AS pickups_in_may
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE EXTRACT(MONTH FROM o.o_orderdate) = 5
        GROUP BY 1
        ORDER BY pickups_in_may DESC, nation_name ASC
    """,
}
