"""Reader + CDC behavior: schema pinning, PERMISSIVE quarantine, and
the high-watermark/merge primitives."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from uber_data_pipeline_spark.catalog import load_table
from uber_data_pipeline_spark.sources.cdc import (
    high_watermark,
    incremental_rows,
    merge_latest,
)
from uber_data_pipeline_spark.sources.readers import read_csv, read_parquet, quarantine_split

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".artifacts")


def test_read_parquet_pins_schema(spark):
    df = read_parquet(spark, os.path.join(SF_DIR, "orders.parquet"), "orders")
    assert df.schema["o_orderkey"].dataType.simpleString() == "bigint"
    assert df.schema["o_orderdate"].dataType.simpleString() == "timestamp_ntz"


def test_read_parquet_normalizes_event_nanos(spark):
    df = read_parquet(spark, os.path.join(SF_DIR, "events.parquet"), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    assert df.count() > 0


def test_csv_quarantine_split(spark, tmp_path):
    p = str(tmp_path / "rows.csv")
    with open(p, "w") as f:
        f.write("id,qty\n1,10\n2,notanumber\n3,30\n")
    df = read_csv(spark, p, "id int, qty int, _corrupt_record string")
    clean, bad = quarantine_split(df)
    assert clean.count() == 2
    assert bad.count() == 1
    assert bad.filter(F.col("_corrupt_record").contains("notanumber")).count() == 1


def test_high_watermark_and_incremental(spark):
    orders = load_table(spark, SF_DIR, "orders")
    sink = orders.filter(F.col("o_orderdate") < F.lit("1999-01-01"))
    wm = high_watermark(sink, "o_orderdate")
    assert wm is not None
    inc = incremental_rows(orders, "o_orderdate", wm)
    assert inc.count() == orders.filter(F.col("o_orderdate") > F.lit(wm)).count()
    assert high_watermark(None, "o_orderdate") is None


def test_merge_latest_upsert(spark):
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], "k int, v string, ver int"
    )
    delta = spark.createDataFrame(
        [(2, "b2", 1), (3, "c", 1), (2, "b1-stale", 0)], "k int, v string, ver int"
    )
    out = {r["k"]: r["v"] for r in merge_latest(base, delta, ["k"], "ver").collect()}
    # key 2: version 1 wins; version-0 tie (base "b" vs delta stale) never reached
    assert out == {1: "a", 2: "b2", 3: "c"}


def test_merge_latest_tie_prefers_delta(spark):
    base = spark.createDataFrame([(1, "old", 0)], "k int, v string, ver int")
    delta = spark.createDataFrame([(1, "reread", 0)], "k int, v string, ver int")
    out = merge_latest(base, delta, ["k"], "ver").collect()
    assert len(out) == 1 and out[0]["v"] == "reread"


def test_orc_round_trip(spark, tmp_path):
    """write_orc -> read_orc preserves rows, schema pinning, and
    partition pruning (partition filter must reach the scan)."""
    from uber_data_pipeline_spark.sources.readers import read_orc
    from uber_data_pipeline_spark.sources.writers import write_orc

    orders = load_table(spark, SF_DIR, "orders").limit(200)
    p = str(tmp_path / "orders_orc")
    write_orc(orders.withColumn("status", F.col("o_orderstatus")), p, ["status"])
    back = read_orc(spark, p)
    assert back.count() == 200
    one = back.filter(F.col("status") == "F")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(status" in plan, plan
    assert one.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_streaming_parquet_sink_exactly_once(spark, tmp_path):
    """Streaming file sink + checkpoint: an AvailableNow run writes
    each input row exactly once, and RE-RUNNING with the same
    checkpoint writes nothing new (offsets committed — the
    exactly-once file-sink contract a production ingest relies on)."""
    from uber_data_pipeline_spark.sources.cdc import read_stream_events
    from uber_data_pipeline_spark.streaming.events import events_landing_dir

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src = events_landing_dir(SF_DIR)

    def run_once():
        q = (
            read_stream_events(spark, src)
            .select("event_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_expected = load_table(spark, SF_DIR, "events").count()
    assert spark.read.parquet(out).count() == n_expected
    run_once()  # same checkpoint: no new files, no duplicated rows
    assert spark.read.parquet(out).count() == n_expected


def test_jdbc_options_partitioned():
    from uber_data_pipeline_spark.sources.readers import jdbc_read_options

    opts = jdbc_read_options(
        "jdbc:postgresql://db/uber",
        "raw_data_janjune_15",
        partition_column="locationid",
        lower_bound=1,
        upper_bound=265,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "locationid"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "265")
    assert opts["numPartitions"] == "16"
    assert int(opts["fetchsize"]) > 0


def test_jdbc_options_require_full_bounds():
    import pytest as _pytest

    from uber_data_pipeline_spark.sources.readers import jdbc_read_options

    with _pytest.raises(ValueError):
        jdbc_read_options("jdbc:x", "t", partition_column="k")


def test_streaming_merge_resumes_from_checkpoint(spark):
    """Exactly-once lake sink across a RESTART: drain half the change
    files, stop, land the rest, restart with the SAME checkpoint —
    the file-source log must resume at the unprocessed files (no
    replay, no loss) and the final table must equal the one-shot
    relational merge."""
    import os
    import shutil

    from uber_data_pipeline_spark.queries.pipeline import (
        MERGE_SINK_PARTS,
        _cdc_frames,
    )
    from uber_data_pipeline_spark.sources.cdc import merge_latest
    from uber_data_pipeline_spark.streaming.events import merge_sink_stream

    sf_dir = "/root/testdata/sf0.001"
    base, delta = _cdc_frames(spark, sf_dir)
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".artifacts", "test_stream_resume",
    )
    shutil.rmtree(root, ignore_errors=True)
    stage = os.path.join(root, "stage")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    delta.repartition(4).write.mode("overwrite").parquet(stage)
    parts = sorted(
        f for f in os.listdir(stage)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    assert len(parts) == 4

    schema = "o_orderkey bigint, o_orderstatus string, o_totalprice double, version int"
    kwargs = dict(
        delta_schema=schema,
        target_path=os.path.join(root, "target"),
        checkpoint_dir=os.path.join(root, "checkpoint"),
        key_cols=["o_orderkey"],
        part_expr=f"CAST(o_orderkey % {MERGE_SINK_PARTS} AS INT)",
    )

    for f in parts[:2]:
        os.link(os.path.join(stage, f), os.path.join(landing, f))
    partial = merge_sink_stream(spark, base, landing, **kwargs)
    n_partial = partial.count()

    for f in parts[2:]:
        os.link(os.path.join(stage, f), os.path.join(landing, f))
    final = merge_sink_stream(spark, base, landing, **kwargs)

    expected = merge_latest(base, delta, ["o_orderkey"], "version")
    got = sorted(
        (r.o_orderkey, r.o_orderstatus, r.o_totalprice, r.version)
        for r in final.select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "version"
        ).collect()
    )
    want = sorted(
        (r.o_orderkey, r.o_orderstatus, r.o_totalprice, r.version)
        for r in expected.collect()
    )
    assert got == want
    # the restart really was incremental: the half-drained table is a
    # strict subset state, not already-final
    assert n_partial <= len(want)


def test_latest_version_default_on_empty_lake(tmp_path):
    """A stream started before any commit exists must see 'no new
    data' (version -1), not crash; the strict batch path still
    raises a clear error."""
    import pytest

    from uber_data_pipeline_spark.sources.snapshots import latest_version

    empty = str(tmp_path / "lake")
    # missing manifests dir
    assert latest_version(empty, default=-1) == -1
    with pytest.raises(FileNotFoundError):
        latest_version(empty)
    # present but empty manifests dir
    os.makedirs(os.path.join(empty, "manifests"))
    assert latest_version(empty, default=-1) == -1
    with pytest.raises(FileNotFoundError):
        latest_version(empty)


def test_stream_reader_empty_lake_reports_no_data(tmp_path):
    """SnapshotCommitStreamReader.read on an uncommitted lake yields
    an empty batch at offset {"version": -1} (ADVICE r2)."""
    from uber_data_pipeline_spark.sources.pyds import SnapshotCommitStreamReader

    r = SnapshotCommitStreamReader({"root": str(tmp_path / "lake")})
    rows, offset = r.read(r.initialOffset())
    assert list(rows) == []
    assert offset == {"version": -1}


def test_partitioned_and_simple_stream_readers_agree(spark, tmp_path):
    """The partition-based (executor-side) and simple (driver-side)
    commit-stream readers share the offset protocol and must drain
    identical rows from the same lake."""
    from uber_data_pipeline_spark.sources import pyds
    from uber_data_pipeline_spark.sources.snapshots import commit_snapshot

    root = str(tmp_path / "lake")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).limit(200)
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    other = orders.subtract(half)
    commit_snapshot(half, root, 0, mode="append")
    commit_snapshot(other, root, 1, mode="append")

    pyds.register_stream(spark)

    def drain(variant: str) -> set:
        reader = spark.readStream.format("snapshot_commits").option("root", root)
        if variant == "simple":
            reader = reader.option("reader", "simple")
        name = f"pyds_agree_{variant}"
        q = (
            reader.load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{variant}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {tuple(r) for r in spark.table(name).collect()}

    got_part = drain("partitioned")
    got_simple = drain("simple")
    assert got_part == got_simple
    assert len(got_part) == 200


def test_ensure_staged_rebuilds_on_source_change(tmp_path):
    """The staleness contract that the sf1 soak motivated: a staged
    derivative must rebuild when its SOURCE fingerprint changes, and
    must reuse (not rebuild) when nothing changed."""
    import time

    from uber_data_pipeline_spark.sources.staging import (
        ensure_staged,
        source_fingerprint,
    )

    src = tmp_path / "source.parquet"
    src.write_bytes(b"generation-1")
    root = str(tmp_path / "derived")
    builds = []

    def build(tgt):
        builds.append(1)
        (tmp_path / "derived" / "data").write_text("built")

    params = lambda: {"what": "t", "src": source_fingerprint(str(src))}  # noqa: E731
    ensure_staged(root, params(), build)
    ensure_staged(root, params(), build)
    assert len(builds) == 1  # second call reused
    time.sleep(0.01)
    src.write_bytes(b"generation-2!")  # size + mtime change
    ensure_staged(root, params(), build)
    assert len(builds) == 2  # source change forced a rebuild


def test_events_landing_dir_relinks_on_source_change(tmp_path, monkeypatch):
    """The stream landing hardlink must re-stage when the source
    parquet is REPLACED (old hardlink keeps the dead inode alive, so
    an existence check would stream stale data)."""
    import uber_data_pipeline_spark.streaming.events as SE

    sfdir = tmp_path / "sfX"
    sfdir.mkdir()
    src = sfdir / "events.parquet"
    src.write_bytes(b"gen-1")
    monkeypatch.setattr(SE, "_ARTIFACTS", str(tmp_path / "art"))
    d1 = SE.events_landing_dir(str(sfdir))
    staged = os.path.join(d1, "events.parquet")
    assert open(staged, "rb").read() == b"gen-1"
    # replace the source (new inode), as a regenerated SF does
    src.unlink()
    src.write_bytes(b"gen-2-longer")
    d2 = SE.events_landing_dir(str(sfdir))
    assert open(os.path.join(d2, "events.parquet"), "rb").read() == b"gen-2-longer"


def test_expire_snapshots_gc_and_safety(spark):
    """Retention GC: expired manifests + orphaned files go; every file
    a surviving manifest references stays; keep-all is a no-op;
    keep_last < 1 refuses."""
    import shutil

    import pytest as _pytest

    from uber_data_pipeline_spark.sources.snapshots import (
        _manifest_path,
        commit_snapshot,
        expire_snapshots,
        read_snapshot,
    )

    root = os.path.join(ART, "vacuum_unit")
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    for v, mode in ((0, "overwrite"), (1, "append"), (2, "overwrite")):
        commit_snapshot(
            orders.filter(F.col("o_orderkey") % 3 == v).repartition(2),
            root, v, mode=mode,
        )
    with _pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(root, keep_last=0)

    # keep-all: nothing removed
    rep = expire_snapshots(root, keep_last=3)
    assert rep["expired"] == [] and rep["n_deleted_files"] == 0

    before_v2 = sorted(read_snapshot(spark, root, 2).collect())
    rep = expire_snapshots(root, keep_last=1)  # keep only v2
    assert rep["expired"] == [0, 1]
    # v2 overwrote, so commit-0/commit-1 files were orphaned: all gone
    assert rep["n_deleted_files"] == 4
    assert not os.path.exists(os.path.join(root, "data", "commit-0"))
    assert not os.path.exists(_manifest_path(root, 1))
    # the surviving snapshot reads exactly what it read before
    assert sorted(read_snapshot(spark, root, 2).collect()) == before_v2


def test_expire_snapshots_root_spelling_safe(spark):
    """ADVICE r7: a vacuum invoked with a DIFFERENT spelling of root
    than commit_snapshot used (trailing slash, relative path) must
    still recognize live files — never mass-delete them — and a
    manifest entry resolving outside the root must refuse to vacuum."""
    import json
    import shutil

    import pytest as _pytest

    from uber_data_pipeline_spark.sources.snapshots import (
        _manifest_path,
        commit_snapshot,
        expire_snapshots,
        read_snapshot,
    )

    root = os.path.join(ART, "vacuum_spelling")
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    commit_snapshot(orders.limit(10).repartition(2), root, 0, mode="overwrite")
    commit_snapshot(orders.limit(20).repartition(2), root, 1, mode="overwrite")

    # trailing slash + a redundant '.' segment: same lake, odd spelling
    odd = root + os.sep + "." + os.sep
    before = sorted(read_snapshot(spark, root, 1).collect())
    rep = expire_snapshots(odd, keep_last=1)
    assert rep["n_live_files"] == 2 and rep["n_deleted_files"] == 2
    assert sorted(read_snapshot(spark, root, 1).collect()) == before

    # a manifest pointing outside the root is a refuse-to-vacuum error
    mpath = _manifest_path(root, 1)
    man = json.load(open(mpath))
    man["files"] = ["/tmp/elsewhere/part-0.parquet"]
    json.dump(man, open(mpath, "w"))
    with _pytest.raises(ValueError, match="outside"):
        expire_snapshots(root, keep_last=1)


def test_expire_snapshots_keeps_inherited_files(spark):
    """An append chain keeps its PARENT's files live: expiring the
    parent version must not delete files the child still references."""
    import shutil

    from uber_data_pipeline_spark.sources.snapshots import (
        commit_snapshot,
        expire_snapshots,
        read_snapshot,
    )

    root = os.path.join(ART, "vacuum_unit2")
    shutil.rmtree(root, ignore_errors=True)
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey")
    commit_snapshot(
        orders.filter(F.col("o_orderkey") % 2 == 0).repartition(2),
        root, 0, mode="overwrite",
    )
    commit_snapshot(
        orders.filter(F.col("o_orderkey") % 2 == 1).repartition(2),
        root, 1, mode="append",
    )
    full = read_snapshot(spark, root, 1).count()
    rep = expire_snapshots(root, keep_last=1)  # expire v0
    # v1 inherited v0's files: NOTHING is orphaned
    assert rep["expired"] == [0] and rep["n_deleted_files"] == 0
    assert read_snapshot(spark, root, 1).count() == full
