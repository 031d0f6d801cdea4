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
    stats_cols: list[str] | None = None,
) -> dict:
    """Write ``df``'s rows as the data files of commit ``version`` and
    publish its manifest. ``mode='append'`` inherits the parent
    (version-1) manifest's files; ``mode='overwrite'`` starts fresh.
    ``stats_cols`` records per-file [min, max] for those columns in
    the manifest (read from the parquet FOOTERS the write already
    produced — no second data pass), enabling manifest-level data
    skipping in :func:`read_snapshot`. Returns the manifest dict."""
    data_dir = os.path.join(root, "data", f"commit-{version}")
    df.write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    stats: dict[str, dict] = {}
    if stats_cols:
        import pyarrow.parquet as pq

        for path in files:
            meta = pq.ParquetFile(path).metadata
            names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
            col_stats = {}
            for c in stats_cols:
                lo, hi = None, None
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(names[c]).statistics
                    if st is None or not st.has_min_max:
                        lo, hi = None, None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    col_stats[c] = [lo, hi]
            stats[path] = col_stats
    parent = version - 1
    if mode == "append" and parent >= 0:
        # a missing parent manifest must FAIL, not silently degrade
        # to overwrite semantics (dropping all prior history): an
        # append commit's contract is parent files + new files
        with open(_manifest_path(root, parent)) as fh:
            pm = json.load(fh)
        files = pm["files"] + files
        stats = {**pm.get("stats", {}), **stats}
    manifest = {"version": version, "parent": parent, "files": files, "stats": stats}
    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    tmp = _manifest_path(root, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(root, version))  # atomic publish
    return manifest


def read_snapshot(
    spark: SparkSession,
    root: str,
    version: int,
    between: tuple[str, object, object] | None = None,
) -> DataFrame:
    """Time-travel read: the table exactly as of commit ``version`` —
    Spark scans the manifest's explicit file list (footer stats,
    column pruning, and pushdown all apply as normal).

    ``between=(col, lo, hi)`` adds MANIFEST-LEVEL data skipping: files
    whose recorded [min, max] envelope for ``col`` cannot intersect
    [lo, hi] are dropped before Spark ever lists them — the
    Delta/Iceberg file-skipping role, metadata-only on the driver.
    The exact predicate is ALSO applied to the surviving rows, so
    skipping is a pure optimization (pruning correctness is
    unit-tested); files without recorded stats are conservatively
    kept."""
    with open(_manifest_path(root, version)) as fh:
        manifest = json.load(fh)
    files = manifest["files"]
    if between is None:
        return spark.read.parquet(*files)
    from pyspark.sql import functions as F

    col, lo, hi = between
    stats = manifest.get("stats", {})
    kept = [
        f
        for f in files
        if col not in stats.get(f, {})
        or not (stats[f][col][1] < lo or stats[f][col][0] > hi)
    ]
    # every file pruned: scan the full list limit(0) for the schema
    df = spark.read.parquet(*(kept or files))
    if not kept:
        df = df.limit(0)
    return df.filter(F.col(col).between(lo, hi))


def latest_version(root: str, default: int | None = None) -> int:
    """Highest committed manifest version. With ``default`` set, a
    missing/empty manifests dir returns it instead of raising — the
    streaming reader passes -1 so a stream started before the first
    commit reports "no new data" rather than crashing."""
    mdir = os.path.join(root, "manifests")
    try:
        versions = [
            int(f[1:-5])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
    except FileNotFoundError:
        versions = []
    if not versions:
        if default is not None:
            return default
        raise FileNotFoundError(f"no committed manifests under {mdir}")
    return max(versions)
