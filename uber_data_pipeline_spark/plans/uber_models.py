"""The reference's dbt project as a model DAG: one staging model
(the shared fact->dim join every reference model starts from) feeding
six downstream marts — same shape as
/root/reference/src/main/uber_transformations/models/udp_trans/*.sql,
with ``stg_pickups`` playing the raw_data x base_num join and Spark
SQL views playing the warehouse relations.
"""

from __future__ import annotations

from uber_data_pipeline_spark.functions.datetime import MONTH_NAME_CASE_SQL
from uber_data_pipeline_spark.plans.model import IncrementalSpec, ModelRegistry

_MONTH_CASE = MONTH_NAME_CASE_SQL.format(col="month_num")

# the reference's ScheduleDefinition: every asset materializes on the
# @daily tick (Dagster_Files/definitions.py:17-20, cron "0 0 * * *")
DAILY = "0 0 * * *"


def build_registry() -> ModelRegistry:
    r = ModelRegistry()

    r.sql_model(
        "stg_pickups",
        deps=("orders", "customer", "nation"),
        description="fact JOIN base dim: the shared staging relation",
        schedule=DAILY,
        sql="""
            SELECT o.o_orderkey, o.o_orderdate, o.o_custkey,
                   n.n_nationkey AS nation_key, n.n_name AS nation_name,
                   n.n_regionkey, c.c_mktsegment
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
        """,
    )

    r.sql_model(
        "top_3_bases_by_total_pickups",
        schedule=DAILY,
        deps=("stg_pickups",),
        description="ref model top_3_base_names_by_total_pickups.sql",
        sql="""
            SELECT nation_key, nation_name, COUNT(*) AS total_pickups
            FROM stg_pickups
            GROUP BY 1, 2
            ORDER BY total_pickups DESC, nation_key ASC
            LIMIT 3
        """,
    )

    r.sql_model(
        "pickup_percentile_by_base_per_month",
        schedule=DAILY,
        deps=("stg_pickups",),
        description="ref model pickup_percentile_by_base_per_month.sql",
        sql=f"""
            WITH counts AS (
                SELECT MONTH(o_orderdate) AS month_num, nation_name,
                       COUNT(*) AS pickups
                FROM stg_pickups GROUP BY 1, 2
            )
            SELECT nation_name, month_num, {_MONTH_CASE} AS month_name, pickups,
                   ROUND(pickups / SUM(pickups) OVER (PARTITION BY month_num) * 100.0, 6)
                       AS pct_of_month
            FROM counts
        """,
    )

    r.sql_model(
        "top_3_pickup_dates_per_base",
        schedule=DAILY,
        deps=("stg_pickups",),
        description="ref model top_3_pickup_dates_per_base.sql",
        sql="""
            WITH counts AS (
                SELECT nation_key, nation_name, CAST(o_orderdate AS DATE) AS pickup_date,
                       COUNT(*) AS cnt
                FROM stg_pickups GROUP BY 1, 2, 3
            )
            SELECT * FROM (
                SELECT nation_name, nation_key,
                       RANK() OVER (PARTITION BY nation_key ORDER BY cnt DESC) AS rnk,
                       cnt, pickup_date
                FROM counts
            ) WHERE rnk <= 3
        """,
    )

    r.sql_model(
        "pickup_count_vs_average_per_base",
        schedule=DAILY,
        deps=("stg_pickups",),
        description="ref model pickup_count_vs_average_per_base.sql",
        sql=f"""
            WITH counts AS (
                SELECT nation_name, MONTH(o_orderdate) AS month_num,
                       COUNT(*) AS monthly_count
                FROM stg_pickups GROUP BY 1, 2
            )
            SELECT nation_name, month_num, {_MONTH_CASE} AS month_name, monthly_count,
                   AVG(monthly_count) OVER (PARTITION BY month_num) AS avg_for_month,
                   ROUND((monthly_count / AVG(monthly_count) OVER (PARTITION BY month_num) - 1) * 100, 6)
                       AS pct_difference
            FROM counts
        """,
    )

    r.sql_model(
        "unter_grun_pickups_in_bronx",
        schedule=DAILY,
        deps=("stg_pickups", "region"),
        description="ref model unter_grun_pickups_in_bronx.sql",
        sql="""
            SELECT s.o_orderkey AS order_key, s.o_orderdate AS pickup_ts,
                   s.nation_name AS base_name, r.r_name AS borough,
                   s.c_mktsegment AS zone
            FROM stg_pickups s
            JOIN region r ON r.r_regionkey = s.n_regionkey
            WHERE s.nation_name IN ('NATION_1', 'NATION_6') AND r.r_name = 'AMERICA'
        """,
    )

    r.sql_model(
        "total_pickups_in_may_by_base",
        schedule=DAILY,
        deps=("stg_pickups",),
        description="ref model total_pickups_in_may_by_base.sql",
        sql="""
            SELECT nation_name, COUNT(*) AS pickups_in_may
            FROM stg_pickups
            WHERE MONTH(o_orderdate) = 5
            GROUP BY 1
            ORDER BY pickups_in_may DESC, nation_name ASC
        """,
    )

    # dbt-style INCREMENTAL model: full builds substitute 1=1 for the
    # placeholder; scheduled refreshes aggregate only the delta window
    # and merge by summing the additive part columns per key (the
    # commutative-monoid maintenance proven by
    # incremental_agg_maintenance). The part columns stay DECIMAL so
    # merge order can never change the float result.
    r.sql_model(
        "monthly_status_rollup",
        schedule=DAILY,
        deps=("orders",),
        description="incremental revenue/count rollup per (month, status)",
        incremental=IncrementalSpec(
            keys=("month", "status"),
            additive=("revenue_part", "n_orders"),
            event_col="o_orderdate",
        ),
        sql="""
            SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
                   o_orderstatus AS status,
                   SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS revenue_part,
                   COUNT(*) AS n_orders
            FROM orders
            WHERE {incremental_filter}
            GROUP BY 1, 2
        """,
    )

    return r
