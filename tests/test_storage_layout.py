"""Storage-layout behavior at the plan level: bucketed tables join
without exchanges, partitioned lakes prune partitions in the scan —
the two write-side levers that decide read cost at 100 TB."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from uber_data_pipeline_spark.catalog import load_table
from uber_data_pipeline_spark.sources.writers import (
    read_table,
    write_bucketed,
    write_partitioned,
)

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".artifacts")


def test_bucketed_join_is_exchange_free(spark):
    """orders x lineitem bucketed by orderkey into the same bucket
    count: the join plan must contain NO Exchange on either side (the
    shuffle was paid at write time)."""
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "orders_b", os.path.join(ART, "bucketed", "orders"), 8,
        ["o_orderkey"], sort_cols=["o_orderkey"],
    )
    write_bucketed(
        li, "lineitem_b", os.path.join(ART, "bucketed", "lineitem"), 8,
        ["l_orderkey"], sort_cols=["l_orderkey"],
    )
    a, b = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    joined = a.join(b, a.o_orderkey == b.l_orderkey).groupBy("o_orderpriority").count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    join_section = plan.split("HashAggregate", 1)[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:1500]
    assert "Exchange hashpartitioning(o_orderkey" not in join_section
    assert "Exchange hashpartitioning(l_orderkey" not in join_section
    # row parity with the unbucketed join
    plain = (
        load_table(spark, SF_DIR, "orders")
        .join(load_table(spark, SF_DIR, "lineitem"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    assert a.join(b, a.o_orderkey == b.l_orderkey).count() == plain


def test_partitioned_write_prunes(spark):
    """A scan with a partition-key predicate must show the predicate
    under PartitionFilters (directory pruning), not DataFilters."""
    path = os.path.join(ART, "orders_by_status")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, SF_DIR, "orders")
    write_partitioned(orders, path, ["o_orderstatus"])
    statuses = [r[0] for r in orders.select("o_orderstatus").distinct().collect()]
    part_dirs = sorted(d for d in os.listdir(path) if d.startswith("o_orderstatus="))
    assert part_dirs == sorted(f"o_orderstatus={s}" for s in statuses)
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == statuses[0])
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderstatus" in pf, plan[:1500]


def test_dynamic_partition_overwrite_is_incremental(spark):
    """Overwriting with a frame containing ONE partition must leave
    the other partitions untouched."""
    path = os.path.join(ART, "orders_dyn")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, SF_DIR, "orders")
    write_partitioned(orders, path, ["o_orderstatus"])
    before = spark.read.parquet(path).count()
    one = orders.filter(F.col("o_orderstatus") == "F").limit(10)
    write_partitioned(one, path, ["o_orderstatus"])  # dynamic overwrite of F only
    after = spark.read.parquet(path)
    assert after.filter(F.col("o_orderstatus") == "F").count() == 10
    assert after.filter(F.col("o_orderstatus") != "F").count() == (
        orders.filter(F.col("o_orderstatus") != "F").count()
    )
    assert after.count() < before


def test_merge_upsert_touches_only_changed_partitions(spark):
    """The MERGE sink's cost contract: partitions with no change rows
    must not be rewritten — their part files stay byte-identical on
    disk (checked by mtime+inode, not re-reading), while changed
    partitions pick up the upserts with replaced keys gone."""
    from uber_data_pipeline_spark.sources.writers import merge_upsert_partitioned

    path = os.path.join(ART, "merge_upsert_unit")
    shutil.rmtree(path, ignore_errors=True)
    base = spark.range(1000).selectExpr(
        "id AS k", "CAST(id % 8 AS INT) AS part", "'old' AS val"
    )
    base.write.partitionBy("part").parquet(path)

    def files_of(part):
        d = os.path.join(path, f"part={part}")
        return {
            f: (os.stat(os.path.join(d, f)).st_mtime_ns,
                os.stat(os.path.join(d, f)).st_ino)
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    untouched_before = {p: files_of(p) for p in (2, 3, 4, 5, 6, 7)}
    # changes hit partitions 0 and 1 only: update k=0,8 and insert k=2000
    changes = spark.createDataFrame(
        [(0, 0, "new"), (8, 0, "new"), (2001, 1, "new")],
        "k long, part int, val string",
    )
    merge_upsert_partitioned(spark, path, changes, ["k"], "part")

    for p, before in untouched_before.items():
        assert files_of(p) == before, f"partition {p} was rewritten"
    after = spark.read.parquet(path)
    assert after.count() == 1001  # 1000 - 2 replaced + 2 new + 1 insert
    assert after.filter("val = 'new'").count() == 3
    assert after.filter("k = 0 AND val = 'old'").count() == 0
