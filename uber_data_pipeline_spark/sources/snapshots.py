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
    # cross-chain collision guard (r11 review — the commit_to_branch
    # guard was one-sided): versions share one namespace, so a main
    # commit must never clobber a manifest a BRANCH committed (it
    # would rewrite the branch's history AND re-attribute the version
    # to the main chain for retention). Re-committing main's own
    # version stays allowed (idempotent re-publish).
    mpath = _manifest_path(root, version)
    if os.path.exists(mpath):
        with open(mpath) as fh:
            owner = json.load(fh).get("ref")
        if owner is not None:
            raise FileExistsError(
                f"manifest v{version} belongs to branch {owner!r}; "
                "main commits must use a fresh version"
            )
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


def expire_snapshots(root: str, keep_last: int = 2) -> dict:
    """Snapshot retention + orphan-file GC — the Delta ``VACUUM`` /
    Iceberg ``expireSnapshots`` role the module docstring promised as
    the hardening layer. Keeps the ``keep_last`` highest versions,
    removes the older manifests, then deletes every data file under
    ``root/data`` that no SURVIVING manifest references (an append
    chain keeps its inherited files live — only files orphaned by
    overwrites or expiry are touched). Empty ``commit-*`` dirs are
    pruned after their files go.

    Safety order matters on an object store: expired MANIFESTS are
    removed first, so a reader that races the vacuum either resolves a
    surviving manifest (whose files are never deleted) or fails fast
    on the missing manifest — it can never resolve a file list whose
    members are mid-delete. Driver-side metadata work is
    O(files) — the same class as commit itself.

    Returns {"kept", "expired", "n_live_files", "n_deleted_files"}."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    # Normalize both sides of the live-set membership test: a caller
    # spelling ``root`` differently than commit_snapshot did (trailing
    # slash, relative vs absolute, or a SYMLINK alias — ADVICE r8)
    # must not classify every live file as an orphan — this is a
    # DELETING api, so the comparison is on realpath-resolved strings
    # (symlinks followed on both sides), and every live entry must
    # resolve under the resolved root; only then do we refuse.
    root = os.path.realpath(root)
    mdir = os.path.join(root, "manifests")
    versions = sorted(
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    )
    # ref-aware retention (the Iceberg rule: a snapshot a ref points
    # at is never expired): branch refs pin their head manifest (and
    # its files) regardless of age, else expiring by version number
    # alone would leave a branch ref dangling and vacuum its shared
    # files out from under it
    reffed: set[int] = set()
    rdir = os.path.join(root, "refs")
    if os.path.isdir(rdir):
        for f in os.listdir(rdir):
            if f.endswith(".json") and not f.endswith(".tmp"):
                with open(os.path.join(rdir, f)) as fh:
                    reffed.add(json.load(fh)["version"])
    # PER-CHAIN recency (ADVICE r10): branch commits share the version
    # namespace, so a merged versions[-keep_last:] window lets a
    # branch commit with the highest number displace MAIN's head out
    # of retention entirely — deleting the manifest that
    # latest_version/read_snapshot resolve. Manifests record which
    # ref committed them (commit_to_branch stamps "ref"; absent =
    # main), and keep_last applies to EACH chain independently — the
    # main head is thereby implicitly reffed, like Iceberg's main ref.
    chains: dict[str, list[int]] = {}
    for v in versions:
        with open(_manifest_path(root, v)) as fh:
            chain = json.load(fh).get("ref", "main")
        chains.setdefault(chain, []).append(v)
    keep = (reffed & set(versions)) | {
        v for chain_versions in chains.values()
        for v in chain_versions[-keep_last:]
    }
    kept = sorted(keep)
    expired = [v for v in versions if v not in keep]
    live: set[str] = set()
    for v in kept:
        with open(_manifest_path(root, v)) as fh:
            for entry in json.load(fh)["files"]:
                p = os.path.realpath(entry)
                if not p.startswith(root + os.sep):
                    raise ValueError(
                        f"manifest v{v} file {entry!r} resolves outside "
                        f"the snapshot root {root!r}; refusing to vacuum"
                    )
                live.add(p)
    for v in expired:
        os.remove(_manifest_path(root, v))
    n_deleted = 0
    data_dir = os.path.join(root, "data")
    for commit_dir in sorted(os.listdir(data_dir)) if os.path.isdir(data_dir) else []:
        cdir = os.path.join(data_dir, commit_dir)
        for f in os.listdir(cdir):
            p = os.path.join(cdir, f)
            # non-parquet write artifacts (_SUCCESS, .crc) go with
            # their directory once no live file keeps it alive
            if p not in live and (
                f.endswith(".parquet") or not any(
                    q.startswith(cdir + os.sep) for q in live
                )
            ):
                os.remove(p)
                n_deleted += f.endswith(".parquet")
        if not os.listdir(cdir):
            os.rmdir(cdir)
    return {
        "kept": kept,
        "expired": expired,
        "n_live_files": len(live),
        "n_deleted_files": n_deleted,
    }


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


# ---- branches (Iceberg-style refs on the same manifest lake) -----------


def _ref_path(root: str, name: str) -> str:
    return os.path.join(root, "refs", f"{name}.json")


def create_branch(root: str, name: str, at_version: int) -> dict:
    """Create branch ``name`` pointing at committed ``at_version`` —
    the Iceberg branch / Delta shallow-clone role: a branch is ONE
    tiny ref file; no data or manifest is copied, because manifests
    are immutable and commits never mutate in place, so any number of
    refs can share history for free. The ref publishes atomically
    (tmp + rename), same protocol as the manifests. Fails if the
    target manifest does not exist (a ref must never dangle)."""
    with open(_manifest_path(root, at_version)) as fh:
        json.load(fh)  # existence + readability check
    ref = {"name": name, "version": at_version}
    os.makedirs(os.path.join(root, "refs"), exist_ok=True)
    tmp = _ref_path(root, name) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(ref, fh)
    os.replace(tmp, _ref_path(root, name))
    return ref


def branch_head(root: str, name: str) -> int:
    """Version the branch ref currently points at."""
    with open(_ref_path(root, name)) as fh:
        return json.load(fh)["version"]


def commit_to_branch(
    df: "DataFrame",
    root: str,
    name: str,
    version: int,
    mode: str = "append",
) -> dict:
    """Commit ``df`` on branch ``name``: identical write-ahead publish
    protocol as :func:`commit_snapshot`, except the parent is the
    BRANCH HEAD (not version-1), so histories can diverge — ``mode=
    'append'`` inherits the head manifest's files, ``'overwrite'``
    starts the branch's list fresh. ``version`` must be globally
    unique across all refs (manifests share one namespace; Iceberg's
    snapshot-id role). Publish order: data files, then the manifest,
    then the ref — a reader racing the commit sees the old head until
    the ref flips, and the flip is atomic."""
    head = branch_head(root, name)
    # fail fast on a version collision: manifests share one namespace
    # across all refs, and os.replace below would otherwise silently
    # clobber another chain's committed history (ADVICE r10 —
    # create_branch validates its invariant; this one must too)
    if os.path.exists(_manifest_path(root, version)):
        raise FileExistsError(
            f"manifest v{version} already exists; branch commits need a "
            "globally unique version"
        )
    data_dir = os.path.join(root, "data", f"commit-{version}")
    df.write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    stats: dict[str, dict] = {}
    if mode == "append":
        with open(_manifest_path(root, head)) as fh:
            pm = json.load(fh)
        files = pm["files"] + files
        stats = dict(pm.get("stats", {}))
    manifest = {
        "version": version,
        "parent": head,
        # chain tag: expire_snapshots computes keep_last recency per
        # chain, so branch commits can never displace main's head
        "ref": name,
        "files": files,
        "stats": stats,
    }
    tmp = _manifest_path(root, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(root, version))
    ref = {"name": name, "version": version}
    rtmp = _ref_path(root, name) + ".tmp"
    with open(rtmp, "w") as fh:
        json.dump(ref, fh)
    os.replace(rtmp, _ref_path(root, name))
    return manifest


def read_branch(spark: "SparkSession", root: str, name: str) -> "DataFrame":
    """Read the table as of branch ``name``'s current head."""
    return read_snapshot(spark, root, branch_head(root, name))
