"""Data-quality checks: the dbt-test layer of the reference's build
gate (`dbt build` runs schema tests alongside models; the reference
declares its sources in src/main/uber_transformations/models/
udp_trans/sources.yml). Four check families, mirroring dbt's
built-ins: not_null, unique, accepted_values, relationships.

Each check compiles to ONE aggregate (or one anti-join + aggregate)
returning a single (table, check, n_violations) row; the suite is a
unionByName of reduced one-row frames — nothing wide ever moves.
Checks on the same table could share a scan via a multi-aggregate,
but independent one-row aggregates let the scheduler run them
concurrently and keep each check's plan auditable on its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPORT_SCHEMA = "table_name string, check_name string, n_violations bigint"


def _report(df: DataFrame, table: str, check: str, violations: F.Column) -> DataFrame:
    return df.agg(violations.cast("long").alias("n_violations")).select(
        F.lit(table).alias("table_name"),
        F.lit(check).alias("check_name"),
        "n_violations",
    )


def not_null(df: DataFrame, table: str, col: str) -> DataFrame:
    return _report(
        df, table, f"not_null:{col}",
        F.count(F.when(F.col(col).isNull(), 1)),
    )


def unique(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per key (total - distinct)."""
    return _report(
        df, table, "unique:" + ",".join(cols),
        F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols]),
    )


def accepted_values(
    df: DataFrame, table: str, col: str, values: list[str]
) -> DataFrame:
    return _report(
        df, table, f"accepted_values:{col}",
        F.count(F.when(~F.col(col).isin(values), 1)),
    )


def relationships(
    child: DataFrame, table: str, col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Referential integrity: child rows whose key has no parent.
    left_anti against the (small, distinct) parent key set."""
    orphans = child.select(col).filter(F.col(col).isNotNull()).join(
        parent.select(F.col(parent_col).alias(col)).distinct(), col, "left_anti"
    )
    return _report(
        orphans, table, f"relationships:{col}", F.count(F.lit(1))
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row reports into the suite result, with a pass
    flag — the `dbt test` summary frame."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn("passed", F.col("n_violations") == 0)


def star_schema_checks(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """The suite for the star schema — the analog of the reference's
    sources.yml declared tests, widened to every table our queries
    join through."""
    orders, customer = tables["orders"], tables["customer"]
    lineitem, events = tables["lineitem"], tables["events"]
    nation, documents = tables["nation"], tables["documents"]
    return run_checks([
        not_null(orders, "orders", "o_orderkey"),
        unique(orders, "orders", ["o_orderkey"]),
        not_null(orders, "orders", "o_custkey"),
        accepted_values(
            orders, "orders", "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        ),
        relationships(orders, "orders", "o_custkey", customer, "c_custkey"),
        unique(customer, "customer", ["c_custkey"]),
        relationships(customer, "customer", "c_nationkey", nation, "n_nationkey"),
        unique(lineitem, "lineitem", ["l_orderkey", "l_linenumber"]),
        relationships(lineitem, "lineitem", "l_orderkey", orders, "o_orderkey"),
        accepted_values(
            events, "events", "event_type",
            ["view", "click", "purchase", "signup", "error"],
        ),
        unique(documents, "documents", ["doc_id"]),
        not_null(documents, "documents", "text"),
    ])
