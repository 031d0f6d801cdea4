"""Model-DAG semantics: topological ordering, dbt-style upstream
selection, cycle detection, and — the parity guarantee — the
materialized DAG models produce the same results as the registry's
reference-parity queries."""

from __future__ import annotations

import os
import shutil

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from uber_data_pipeline_spark.plans.dag import run_dag
from uber_data_pipeline_spark.plans.model import Model, ModelRegistry
from uber_data_pipeline_spark.plans.uber_models import build_registry
from uber_data_pipeline_spark.testing import compare

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".artifacts")

# DAG model name -> registry query key with identical output columns
PARITY = {
    "top_3_bases_by_total_pickups": "top3_bases_by_pickups",
    "pickup_percentile_by_base_per_month": "pickup_percentile_by_base_per_month",
    "pickup_count_vs_average_per_base": "pickup_count_vs_average_per_base",
    "total_pickups_in_may_by_base": "total_pickups_in_may_by_base",
}


def test_topo_order_puts_staging_first():
    order = [m.name for m in build_registry().topo_order()]
    # both roots (staging join + the incremental rollup) precede every mart
    assert set(order[:2]) == {"stg_pickups", "monthly_status_rollup"}
    assert len(order) == 8


def test_selection_pulls_upstreams():
    order = [m.name for m in build_registry().topo_order({"total_pickups_in_may_by_base"})]
    assert order == ["stg_pickups", "total_pickups_in_may_by_base"]


def test_cycle_detection():
    r = ModelRegistry()
    r.register(Model(name="a", deps=("b",), sql="SELECT 1"))
    r.register(Model(name="b", deps=("a",), sql="SELECT 1"))
    with pytest.raises(ValueError, match="cycle"):
        r.topo_order()


def test_dag_models_match_reference_queries(spark):
    """Materialized dbt-style models == the DataFrame-API queries the
    driver verifies against DuckDB — one logical plan, two frontends."""
    out_dir = os.path.join(ART, "dag_parity")
    shutil.rmtree(out_dir, ignore_errors=True)
    run_dag(spark, build_registry(), SF_DIR, out_dir)
    queries = entrymod.queries()
    for model_name, query_key in PARITY.items():
        model_df = spark.read.parquet(os.path.join(out_dir, model_name)).toPandas()
        query_df = queries[query_key](spark, SF_DIR).toPandas()
        problems = compare(model_name, model_df, query_df)
        assert not problems, f"{model_name}: " + "; ".join(problems)


def test_cron_next_fire_semantics():
    """5-field cron evaluator: strictly-after boundary, steps, ranges,
    Vixie dom-OR-dow, leap-day termination."""
    import datetime as dt

    from uber_data_pipeline_spark.plans.cron import next_fire

    as_of = dt.datetime(1995, 6, 15, 7, 30)
    assert next_fire("0 0 * * *", as_of) == dt.datetime(1995, 6, 16, 0, 0)
    # strictly after: a fire exactly AT as_of picks the next one
    assert next_fire("30 7 * * *", as_of) == dt.datetime(1995, 6, 16, 7, 30)
    assert next_fire("31 7 * * *", as_of) == dt.datetime(1995, 6, 15, 7, 31)
    assert next_fire("*/15 * * * *", as_of) == dt.datetime(1995, 6, 15, 7, 45)
    # next Monday (1995-06-19)
    assert next_fire("30 6 * * 1", as_of) == dt.datetime(1995, 6, 19, 6, 30)
    assert next_fire("0 12 1 * *", as_of) == dt.datetime(1995, 7, 1, 12, 0)
    # Vixie: dom OR dow when both restricted (1995-06-16 is a Friday)
    assert next_fire("0 0 15 * 5", as_of) == dt.datetime(1995, 6, 16, 0, 0)
    # leap-day spec crosses a year boundary without hanging
    assert next_fire("0 0 29 2 *", dt.datetime(1995, 1, 1)) == dt.datetime(
        1996, 2, 29
    )
    # range + list fields
    assert next_fire("0,30 9-11 * * *", as_of) == dt.datetime(1995, 6, 15, 9, 0)
    with pytest.raises(ValueError):
        next_fire("0 0 * *", as_of)  # 4 fields
    with pytest.raises(ValueError):
        next_fire("61 0 * * *", as_of)  # out of range


def test_cron_century_leap_gap_and_dow7_alias():
    """ADVICE r7: the Feb-29 spec must survive the century non-leap
    boundary (2096-03-01 -> 2104-02-29 is EIGHT years out, 2100 not a
    leap year), and dow 7 must alias to Sunday like every real cron."""
    import datetime as dt

    from uber_data_pipeline_spark.plans.cron import next_fire, parse_cron

    assert next_fire("0 0 29 2 *", dt.datetime(2096, 3, 1)) == dt.datetime(
        2104, 2, 29
    )
    assert parse_cron("0 0 * * 7")[4] == parse_cron("0 0 * * 0")[4]
    # 1995-06-18 is a Sunday
    as_of = dt.datetime(1995, 6, 15, 7, 30)
    assert next_fire("0 9 * * 7", as_of) == dt.datetime(1995, 6, 18, 9, 0)


def test_cron_next_fire_matches_minute_scan_oracle():
    """Property test (VERDICT r7 item 7): next_fire's day-skip +
    hour/minute floor fast-forward must agree with a dumb minute-by-
    minute scan under Vixie dom-OR-dow semantics, over random 5-field
    specs and random instants."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from uber_data_pipeline_spark.plans.cron import next_fire, parse_cron

    def field(lo, hi, star_ok=True):
        explicit = st.sets(
            st.integers(lo, hi), min_size=1, max_size=4
        ).map(lambda s: ",".join(str(v) for v in sorted(s)))
        step = st.tuples(
            st.integers(lo, max(lo, hi - 2)), st.integers(2, 9)
        ).map(lambda t: f"{t[0]}-{hi}/{t[1]}")
        opts = [explicit, step] + ([st.just("*")] if star_ok else [])
        return st.one_of(*opts)

    spec = st.tuples(
        field(0, 59),
        field(0, 23),
        field(1, 28),  # dom <= 28: a fire always exists within a year
        field(1, 12),
        field(0, 6),
    ).map(" ".join)
    instant = st.datetimes(
        min_value=dt.datetime(1994, 1, 1),
        max_value=dt.datetime(1997, 12, 31),
    ).map(lambda t: t.replace(second=0, microsecond=0))

    @settings(max_examples=25, deadline=None)
    @given(spec=spec, after=instant)
    def check(spec, after):
        minutes, hours, doms, months, dows = parse_cron(spec)
        dom_star = doms == frozenset(range(1, 32))
        dow_star = dows == frozenset(range(0, 7))
        t = after + dt.timedelta(minutes=1)
        for _ in range(527040):  # 366 days of minutes
            cron_dow = (t.weekday() + 1) % 7
            day_ok = (
                (t.day in doms)
                if dow_star
                else (cron_dow in dows)
                if dom_star
                else (t.day in doms or cron_dow in dows)
            )
            if (
                day_ok
                and t.month in months
                and t.hour in hours
                and t.minute in minutes
            ):
                assert next_fire(spec, after) == t
                return
            t += dt.timedelta(minutes=1)
        raise AssertionError(f"oracle found no fire in a year: {spec}")

    check()


def test_due_run_skips_unscheduled_models():
    """ADVICE r7: Model.schedule=None is documented as 'unscheduled' —
    due_run must skip those, not crash on next_fire(None), while the
    Kahn level of scheduled models still counts unscheduled upstreams."""
    import datetime as dt

    from uber_data_pipeline_spark.plans.dag import due_run
    from uber_data_pipeline_spark.plans.model import Model, ModelRegistry

    r = ModelRegistry()
    r.register(Model(name="stg", deps=("raw",), sql="SELECT 1"))  # unscheduled
    r.register(
        Model(name="mart", deps=("stg",), sql="SELECT 1", schedule="0 0 * * *")
    )
    rows = due_run(r, dt.datetime(1995, 6, 15))
    assert [r[1] for r in rows] == ["mart"]
    assert rows[0][2] == 1  # level still counts the unscheduled upstream
    assert rows[0][3] == dt.datetime(1995, 6, 16, 0, 0)


def test_due_run_and_closure_raise_on_cycle():
    """ADVICE r7: a cyclic registry must raise the clean 'dependency
    cycle' ValueError (topo_order's contract), not RecursionError."""
    import datetime as dt

    from uber_data_pipeline_spark.plans.dag import (
        downstream_closure,
        due_run,
    )
    from uber_data_pipeline_spark.plans.model import Model, ModelRegistry

    r = ModelRegistry()
    r.register(Model(name="a", deps=("b",), sql="SELECT 1", schedule="0 0 * * *"))
    r.register(Model(name="b", deps=("a",), sql="SELECT 1", schedule="0 0 * * *"))
    with pytest.raises(ValueError, match="cycle"):
        due_run(r, dt.datetime(1995, 6, 15))
    with pytest.raises(ValueError, match="cycle"):
        downstream_closure(r, "a")


def test_due_run_kahn_order():
    """due_run ranks by (registry-internal Kahn level, name): the two
    roots first, the six stg_pickups dependents after."""
    import datetime as dt

    from uber_data_pipeline_spark.plans.dag import due_run

    rows = due_run(build_registry(), dt.datetime(1995, 6, 15, 7, 30))
    assert [r[0] for r in rows] == list(range(1, 9))
    by_name = {r[1]: r for r in rows}
    assert by_name["stg_pickups"][2] == 0
    assert by_name["monthly_status_rollup"][2] == 0
    for m in (
        "pickup_count_vs_average_per_base",
        "unter_grun_pickups_in_bronx",
        "total_pickups_in_may_by_base",
    ):
        assert by_name[m][2] == 1
    assert all(r[3] == dt.datetime(1995, 6, 16, 0, 0) for r in rows)


def test_downstream_closure_transitive_order():
    """Generic closure on a synthetic graph: transitive dependents in
    (level, name) order; raw-table deps never pull models in."""
    from uber_data_pipeline_spark.plans.dag import downstream_closure
    from uber_data_pipeline_spark.plans.model import Model, ModelRegistry

    r = ModelRegistry()
    r.register(Model(name="base", deps=("raw",), sql="SELECT 1"))
    r.register(Model(name="mid", deps=("base",), sql="SELECT 1"))
    r.register(Model(name="leaf_a", deps=("mid", "raw"), sql="SELECT 1"))
    r.register(Model(name="leaf_b", deps=("mid",), sql="SELECT 1"))
    r.register(Model(name="island", deps=("raw",), sql="SELECT 1"))
    assert downstream_closure(r, "base") == ["mid", "leaf_a", "leaf_b"]
    assert downstream_closure(r, "mid") == ["leaf_a", "leaf_b"]
    assert downstream_closure(r, "leaf_a") == []
    assert downstream_closure(r, "island") == []


def test_backfill_plan_pushdown(spark):
    """The backfill month-discovery scan must push the window filter
    to the parquet scan and read only the event column."""
    from uber_data_pipeline_spark.queries.pipeline import dag_backfill_plan

    from tests.conftest import SF_DIR

    plan = dag_backfill_plan(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderdate" in plan.split("PushedFilters: [", 1)[1][:120], plan[:3000]
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "o_totalprice" not in read_schema, read_schema
