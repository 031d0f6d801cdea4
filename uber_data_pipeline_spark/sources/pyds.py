"""Python DataSource (Spark 4 `pyspark.sql.datasource` API) over the
snapshot-manifest format (sources/snapshots.py) — the extension-point
coverage for lakes whose catalog/commit protocol Spark does not speak
natively: the planner asks THIS class for schema, partitions, and
filter pushdown, and each partition streams Arrow record batches.

Design (the shapes that matter at scale):
- one InputPartition PER DATA FILE from the version's manifest —
  Spark schedules files across executors exactly like a native scan;
- `read()` yields **pyarrow RecordBatches** (zero-copy into Spark's
  columnar pipeline), never Python row tuples;
- `pushFilters()` accepts the comparison filters it can evaluate and
  hands them to pyarrow's parquet reader (row-group statistics
  pruning + batch-level filtering) — returning the rest to Spark, so
  correctness never depends on the pushdown.

The same relation read through the native path (snapshots.read_
snapshot) must be value-identical — that is this source's oracle.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    DataSourceStreamReader,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

FORMAT_NAME = "snapshot_manifest"

_OPS = {
    EqualTo: "==",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SnapshotManifestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        self.version = int(options.get("version", -1))
        self.pushed: list[tuple[str, str, object]] = []
        if self.version < 0:
            from uber_data_pipeline_spark.sources.snapshots import latest_version

            self.version = latest_version(self.root)
        with open(
            os.path.join(self.root, "manifests", f"v{self.version}.json")
        ) as fh:
            self.files = json.load(fh)["files"]

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Keep simple single-column comparisons for pyarrow; return
        everything else to Spark unevaluated."""
        for f in filters:
            op = _OPS.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self.pushed.append((f.attribute[0], op, f.value))
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(
            partition.path, filters=self.pushed or None
        )
        yield from table.to_batches()


class SnapshotManifestSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        import pyarrow.parquet as pq

        reader = SnapshotManifestReader(dict(self.options))
        if not reader.files:
            raise ValueError(
                f"snapshot v{reader.version} at {reader.root} has no data "
                "files; cannot infer a schema from an empty snapshot"
            )
        schema = pq.read_schema(reader.files[0])
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(schema)

    def reader(self, schema) -> DataSourceReader:
        return SnapshotManifestReader(dict(self.options))


def register(spark) -> None:
    # pushFilters is rejected outright unless the runtime flag is on.
    # Set DELIBERATELY without restore: the returned DataFrame is
    # lazy, so the flag must still be on when the caller's ACTION
    # runs — a set/restore window here would break every read.
    # Harnesses that care about conf hygiene snapshot+restore it
    # around their run (bench.py does).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotManifestSource)


# ---- streaming reader over the commit log -----------------------------

STREAM_FORMAT_NAME = "snapshot_commits"


class SnapshotCommitStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader over the snapshot commit log: offset =
    {"version": last-consumed-commit}; each micro-batch drains the
    commits published since — the change-feed role of a table
    format's commit stream, on the plain-parquet manifest lake.

    SimpleDataSourceStreamReader reads on the DRIVER by contract (the
    offset-tracking variant for small control-plane feeds); rows are
    materialized per batch because Spark's prefetch cache replays the
    iterator via copy() — a generator would break failure recovery.
    High-throughput feeds belong on DataSourceStreamReader, where
    `partitions(start, end)` plans one partition per commit FILE and
    executors read in parallel — the offset protocol stays identical.
    ``readBetweenOffsets`` makes recovery deterministic: a restarted
    batch re-reads exactly its commit range.
    """

    def __init__(self, options: dict):
        self.root = options["root"]

    def initialOffset(self) -> dict:
        return {"version": -1}

    def _commit_rows(self, v: int) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        d = os.path.join(self.root, "data", f"commit-{v}")
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                for batch in pq.read_table(os.path.join(d, f)).to_batches():
                    yield from zip(*[c.to_pylist() for c in batch.columns])

    def _latest(self) -> int:
        from uber_data_pipeline_spark.sources.snapshots import latest_version

        # default=-1: a stream started before the first commit yields
        # an empty batch at offset {"version": -1} instead of crashing
        return latest_version(self.root, default=-1)

    def read(self, start: dict):
        latest = self._latest()
        rows: list[tuple] = []
        for v in range(start["version"] + 1, latest + 1):
            rows.extend(self._commit_rows(v))
        return iter(rows), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for v in range(start["version"] + 1, end["version"] + 1):
            yield from self._commit_rows(v)


class _CommitFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SnapshotCommitPartitionedReader(DataSourceStreamReader):
    """Partition-based streaming reader over the commit log — the
    high-throughput form of :class:`SnapshotCommitStreamReader`. The
    OFFSET protocol is identical ({"version": last-consumed-commit});
    what changes is WHERE the data moves: the driver only lists
    commit versions (`latestOffset`) and plans one InputPartition per
    commit FILE (`partitions`), and `read()` runs on EXECUTORS,
    yielding pyarrow RecordBatches straight into Spark's columnar
    pipeline. No row ever materializes on the driver, so the feed is
    no longer bounded by driver memory — this is the 100 TB shape of
    a change-feed source. Recovery is deterministic by construction:
    a restarted batch re-plans exactly the same [start+1, end] commit
    range, and commit files are immutable."""

    def __init__(self, options: dict):
        self.root = options["root"]

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        from uber_data_pipeline_spark.sources.snapshots import latest_version

        # default=-1: before the first commit the stream reports "no
        # new data" instead of crashing (see SnapshotCommitStreamReader)
        return {"version": latest_version(self.root, default=-1)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            d = os.path.join(self.root, "data", f"commit-{v}")
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    parts.append(_CommitFilePartition(os.path.join(d, f)))
        return parts

    def read(self, partition: _CommitFilePartition):
        import pyarrow.parquet as pq

        yield from pq.read_table(partition.path).to_batches()

    def commit(self, end: dict) -> None:
        # commits are immutable and retained; nothing to clean up
        pass


class SnapshotCommitStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return STREAM_FORMAT_NAME

    def schema(self) -> str:
        # the commit stream carries the orders projection the
        # pipeline stages (see queries/pipeline.py)
        return "o_orderkey bigint, o_orderstatus string, o_totalprice double"

    def streamReader(self, schema) -> DataSourceStreamReader:
        # default: the executor-parallel partition-based reader; pass
        # .option("reader", "simple") to exercise the driver-side
        # offset-tracking variant (Spark falls back to
        # simpleStreamReader when this raises NotImplementedError —
        # see pyspark.sql.datasource_internal._streamReader)
        if self.options.get("reader", "").lower() == "simple":
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )
        return SnapshotCommitPartitionedReader(dict(self.options))

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SnapshotCommitStreamReader(dict(self.options))


def register_stream(spark) -> None:
    spark.dataSource.register(SnapshotCommitStreamSource)
