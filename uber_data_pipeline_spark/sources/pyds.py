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
    InputPartition,
    LessThan,
    LessThanOrEqual,
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
        from pyspark.pandas.typedef import as_spark_type  # noqa: F401

        reader = SnapshotManifestReader(dict(self.options))
        schema = pq.read_schema(reader.files[0])
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(schema)

    def reader(self, schema) -> DataSourceReader:
        return SnapshotManifestReader(dict(self.options))


def register(spark) -> None:
    # pushFilters is rejected outright unless the runtime flag is on;
    # set it here so a vanilla (driver) session works too
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotManifestSource)
