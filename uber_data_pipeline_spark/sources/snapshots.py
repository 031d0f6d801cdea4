"""Manifest-based snapshot versioning on a plain parquet lake — the
time-travel role Delta/Iceberg (or BigQuery's table snapshots, the
reference's warehouse) play, built from the two primitives every
object store offers: immutable data files + an atomically-renamed
manifest per commit.

Layout under ``root``:

    data/commit-<v>/part-*.parquet   -- files written by commit v
    manifests/v<v>.json              -- {"version", "parent", "files"}

A commit writes its data files FIRST, then publishes the manifest —
readers resolve a version strictly through its manifest's file list,
so a half-written commit is invisible (the classic write-ahead
publish protocol; on S3/HDFS the final rename/put of the manifest is
the atomic commit point). Appends inherit the parent manifest's
files; overwrites start a fresh list. Time travel = read any old
manifest; nothing is ever mutated in place.

Scale notes: the manifest holds FILE paths, not row data — driver
work is O(files-per-snapshot) metadata only, and the read path hands
Spark an explicit file list so partition pruning and parquet footer
stats work exactly as on a plain directory scan. Production-hardening
(manifest compaction, column stats per file for data skipping,
snapshot expiry/GC of unreferenced files) layers on without changing
this contract.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, "manifests", f"v{version}.json")


def commit_snapshot(
    df: DataFrame,
    root: str,
    version: int,
    mode: str = "append",
) -> dict:
    """Write ``df``'s rows as the data files of commit ``version`` and
    publish its manifest. ``mode='append'`` inherits the parent
    (version-1) manifest's files; ``mode='overwrite'`` starts fresh.
    Returns the published manifest dict."""
    data_dir = os.path.join(root, "data", f"commit-{version}")
    df.write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    parent = version - 1
    if mode == "append" and parent >= 0:
        # a missing parent manifest must FAIL, not silently degrade
        # to overwrite semantics (dropping all prior history): an
        # append commit's contract is parent files + new files
        with open(_manifest_path(root, parent)) as fh:
            files = json.load(fh)["files"] + files
    manifest = {"version": version, "parent": parent, "files": files}
    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    tmp = _manifest_path(root, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(root, version))  # atomic publish
    return manifest


def read_snapshot(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Time-travel read: the table exactly as of commit ``version`` —
    Spark scans the manifest's explicit file list (footer stats,
    column pruning, and pushdown all apply as normal)."""
    with open(_manifest_path(root, version)) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(*manifest["files"])


def latest_version(root: str) -> int:
    versions = [
        int(f[1:-5])
        for f in os.listdir(os.path.join(root, "manifests"))
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions)
